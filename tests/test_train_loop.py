"""End-to-end engine tests on synthetic data (single-device CPU)."""
from pathlib import Path

import numpy as np
import pytest

import torchok_tpu  # noqa: F401
from torchok_tpu.constructor import TASKS
from torchok_tpu.constructor.config import ConfigNode
from torchok_tpu.constructor.config_structure import merge_structured
from torchok_tpu.constructor.runner import create_trainer


def make_config(tmp_path, max_epochs=2, extra_callbacks=(), precision=32,
                accumulate=1, optimization=None, trainer_extra=None):
    cfg = {
        "task": {
            "name": "ClassificationTask",
            "params": {
                "backbone_name": "resnet18",
                "backbone_params": {"pretrained": False, "in_channels": 3},
                "pooling_name": "Pooling",
                "head_name": "ClassificationHead",
                "head_params": {"num_classes": 10},
                "inputs": [{"shape": [3, 32, 32], "dtype": "float32"}],
            },
        },
        "joint_loss": {"losses": [
            {"name": "CrossEntropyLoss",
             "mapping": {"input": "prediction", "target": "target"}},
        ]},
        "optimization": optimization or [
            {"optimizer": {"name": "Adam", "params": {"lr": 0.001}},
             "scheduler": {"name": "ExponentialLR", "params": {"gamma": 0.9}}},
        ],
        "data": {
            "TRAIN": [{
                "dataloader": {"batch_size": 32, "num_workers": 2,
                               "drop_last": True, "shuffle": True},
                "dataset": {
                    "name": "SyntheticClassificationDataset",
                    "params": {"num_samples": 128, "num_classes": 10},
                    "transform": [
                        {"name": "Resize", "params": {"height": 32, "width": 32}},
                        {"name": "Normalize"},
                        {"name": "ToTensorV2"},
                    ],
                },
            }],
            "VALID": [{
                "dataloader": {"batch_size": 32, "num_workers": 2},
                "dataset": {
                    "name": "SyntheticClassificationDataset",
                    "params": {"num_samples": 64, "num_classes": 10},
                    "transform": [
                        {"name": "Resize", "params": {"height": 32, "width": 32}},
                        {"name": "Normalize"},
                        {"name": "ToTensorV2"},
                    ],
                },
            }],
        },
        "trainer": {"max_epochs": max_epochs, "precision": precision,
                    "log_every_n_steps": 2,
                    "accumulate_grad_batches": accumulate,
                    **(trainer_extra or {})},
        "logger": {"name": "CSVLogger", "log_dir": str(tmp_path / "logs"),
                   "experiment_name": "t"},
        "metrics": [
            {"name": "Accuracy", "params": {"task": "multiclass", "num_classes": 10},
             "mapping": {"preds": "prediction", "target": "target"}},
        ],
        "callbacks": list(extra_callbacks),
        "seed_params": {"seed": 7},
    }
    return merge_structured(ConfigNode(cfg))


def build(config):
    params = config.task.params.to_dict() if hasattr(config.task.params, "to_dict") \
        else config.task.params
    task = TASKS.get(config.task.name)(config, **params)
    trainer = create_trainer(config)
    return task, trainer


def test_fit_decreases_loss(tmp_path):
    config = make_config(tmp_path, max_epochs=3)
    task, trainer = build(config)
    trainer.fit(task)
    logs = trainer.callback_metrics
    assert "train/loss" in logs and "valid/Accuracy" in logs
    # memorizing 128 random-labeled samples: train accuracy must rise well
    # above chance within 3 epochs
    assert logs["train/Accuracy"] > 0.2


def test_scheduler_decays_lr(tmp_path):
    config = make_config(tmp_path, max_epochs=2)
    task, trainer = build(config)
    trainer.fit(task)
    assert abs(trainer.current_lr() - 0.001 * 0.9 ** 2) < 1e-9


def test_grad_accumulation_runs(tmp_path):
    config = make_config(tmp_path, max_epochs=1, accumulate=2)
    task, trainer = build(config)
    trainer.fit(task)
    assert "train/loss" in trainer.callback_metrics


def test_checkpoint_and_resume(tmp_path):
    ckpt_dir = str(tmp_path / "ckpts")
    config = make_config(tmp_path, max_epochs=2, extra_callbacks=[
        {"name": "ModelCheckpoint",
         "params": {"dirpath": ckpt_dir, "monitor": "valid/Accuracy",
                    "mode": "max", "save_last": True}},
    ])
    task, trainer = build(config)
    trainer.fit(task)
    last = Path(ckpt_dir) / "last.ckpt"
    assert last.exists()

    # resume and verify epoch counter advanced past the saved state
    config2 = make_config(tmp_path, max_epochs=3, extra_callbacks=[])
    task2, trainer2 = build(config2)
    trainer2.fit(task2, ckpt_path=str(last))
    assert trainer2.current_epoch == 2  # only the third epoch ran
    assert trainer2.global_step > 0


def test_freeze_unfreeze_masks_gradients(tmp_path):
    config = make_config(tmp_path, max_epochs=1, extra_callbacks=[
        {"name": "FreezeUnfreeze",
         "params": {"freeze_modules": [{"module_name": "backbone", "epoch": 5}]}},
    ])
    task, trainer = build(config)

    import jax
    initial = None

    class Grab:
        pass

    trainer.fit(task)
    # backbone frozen: its params must equal the re-initialized values' update
    # trajectory -> compare against a fresh init with the same seed
    task_ref, trainer_ref = build(make_config(tmp_path, max_epochs=0))
    trainer_ref._setup_state(task_ref)
    ref_backbone = trainer_ref.state.params["backbone"]
    got_backbone = trainer.state.params["backbone"]
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(abs(np.asarray(a) - np.asarray(b)).max()),
        ref_backbone, got_backbone)
    max_diff = max(jax.tree_util.tree_leaves(diffs))
    assert max_diff == 0.0
    # while the head must have moved
    head_ref = trainer_ref.state.params["head"]
    head_got = trainer.state.params["head"]
    hdiffs = jax.tree_util.tree_map(
        lambda a, b: float(abs(np.asarray(a) - np.asarray(b)).max()),
        head_ref, head_got)
    assert max(jax.tree_util.tree_leaves(hdiffs)) > 0.0


def test_steps_per_execution_parity(tmp_path):
    """Fused-scan training (steps_per_execution=2) must be numerically
    equivalent to the plain per-step loop: same optimizer-step count, same
    final parameters (the scan splits a super-batch into the identical
    micro-batch sequence). SGD keeps parameter differences proportional to
    fp-reassociation noise (Adam's sign-like early steps would amplify ~1e-7
    gradient noise to lr-scale parameter differences)."""
    import jax

    optimization = [{"optimizer": {"name": "SGD", "params": {"lr": 0.01}}}]
    config1 = make_config(tmp_path, max_epochs=2, optimization=optimization)
    task1, trainer1 = build(config1)
    trainer1.fit(task1)

    config2 = make_config(tmp_path, max_epochs=2, optimization=optimization,
                          trainer_extra={"steps_per_execution": 2})
    task2, trainer2 = build(config2)
    trainer2.fit(task2)

    assert trainer2.global_step == trainer1.global_step
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(abs(np.asarray(a) - np.asarray(b)).max()),
        trainer1.state.params, trainer2.state.params)
    assert max(jax.tree_util.tree_leaves(diffs)) < 1e-4
    assert "train/loss" in trainer2.callback_metrics
    assert "valid/Accuracy" in trainer2.callback_metrics


def test_steps_per_execution_with_step_scheduler(tmp_path):
    """Step-interval schedulers must advance once per optimizer step even when
    steps are fused into one execution."""
    optimization = [
        {"optimizer": {"name": "Adam", "params": {"lr": 0.001}},
         "scheduler": {"name": "ExponentialLR", "params": {"gamma": 0.9},
                       "pl_params": {"interval": "step"}}},
    ]
    config = make_config(tmp_path, max_epochs=1, optimization=optimization,
                         trainer_extra={"steps_per_execution": 2})
    task, trainer = build(config)
    trainer.fit(task)
    # 128 samples / bs 32 = 4 optimizer steps -> gamma applied 4 times
    assert trainer.global_step == 4
    assert abs(trainer.current_lr() - 0.001 * 0.9 ** 4) < 1e-12


def test_test_mode(tmp_path):
    config = make_config(tmp_path, max_epochs=1)
    # reuse VALID config as TEST
    config.data["TEST"] = config.data["VALID"]
    task, trainer = build(config)
    trainer.fit(task)
    logs = trainer.test(task)
    assert "test/Accuracy" in logs


def test_predict_mode(tmp_path):
    config = make_config(tmp_path, max_epochs=1)
    config.data["PREDICT"] = config.data["VALID"]
    task, trainer = build(config)
    trainer.fit(task)
    results = trainer.predict(task)
    assert results and "prediction" in results[0]
    assert results[0]["prediction"].shape[-1] == 10


def test_sanity_val_steps(tmp_path):
    """num_sanity_val_steps runs validation before training and discards the
    accumulated metric state (Lightning parity)."""
    config = make_config(tmp_path, max_epochs=1,
                         trainer_extra={"num_sanity_val_steps": 1})
    task, trainer = build(config)
    trainer.fit(task)
    # the post-epoch validation metrics must reflect only the real val pass
    assert "valid/Accuracy" in trainer.callback_metrics


def test_swa_averages_and_runs(tmp_path):
    optimization = [{"optimizer": {"name": "SGD", "params": {"lr": 0.05}}}]
    config = make_config(tmp_path, max_epochs=3, optimization=optimization,
                         extra_callbacks=[
        {"name": "StochasticWeightAveraging",
         "params": {"swa_epoch_start": 0, "bn_update_steps": 2}},
    ])
    task, trainer = build(config)
    trainer.fit(task)
    assert "train/loss" in trainer.callback_metrics
    # averaged weights installed: a fresh eval still works
    logs = trainer._run_eval(task, trainer._make_eval_step(task, False),
                             task.val_dataloader(), __import__(
                                 "torchok_tpu.constructor.config_structure",
                                 fromlist=["Phase"]).Phase.VALID)
    assert "valid/Accuracy" in logs


def test_model_pruning_zeroes_and_freezes(tmp_path):
    import jax
    import numpy as np
    config = make_config(tmp_path, max_epochs=2, extra_callbacks=[
        {"name": "ModelPruning", "params": {"amount": 0.5, "prune_on_epoch": 0}},
    ])
    task, trainer = build(config)
    trainer.fit(task)
    kernel = np.asarray(trainer.state.params["head"]["fc"]["kernel"])
    sparsity = float((kernel == 0).mean())
    # pruned at epoch 0 and 1; second-epoch training must not revive zeros
    assert sparsity >= 0.45, sparsity


def test_steps_per_execution_ragged_tail_step_count(tmp_path):
    """100 samples, bs=32, spe=2, drop_last=False: the loader yields a 64
    super-batch and a 36 tail; the tail must run as one full micro step plus
    a 4-sample remainder -> 4 optimizer steps total, same as non-fused."""
    optimization = [{"optimizer": {"name": "SGD", "params": {"lr": 0.01}}}]

    def cfg(spe):
        c = make_config(tmp_path, max_epochs=1, optimization=optimization,
                        trainer_extra={"steps_per_execution": spe} if spe > 1 else {})
        c.data["TRAIN"][0].dataset.params["num_samples"] = 100
        c.data["TRAIN"][0].dataloader["drop_last"] = False
        return c

    task1, trainer1 = build(cfg(1))
    trainer1.fit(task1)
    task2, trainer2 = build(cfg(2))
    trainer2.fit(task2)
    assert trainer2.global_step == trainer1.global_step == 4


def test_repeated_fit_does_not_compound_batch_size(tmp_path):
    config = make_config(tmp_path, max_epochs=1,
                         trainer_extra={"steps_per_execution": 2})
    task, trainer = build(config)
    trainer.fit(task)
    loader = task.train_dataloader()[0]
    assert loader.batch_size == 32  # restored after fit
    # a second fit must see the same optimizer-step count
    steps_first = trainer.global_step
    trainer.current_epoch = 0
    trainer.fit(task)
    assert trainer.global_step == steps_first * 2


def test_find_lr_returns_suggestion(tmp_path):
    from torchok_tpu.constructor.auto_lr_find import find_lr
    config = make_config(tmp_path, max_epochs=1)
    task, trainer = build(config)
    suggestion = find_lr(trainer, task, min_lr=1e-6, max_lr=1.0,
                         num_training=12)
    assert suggestion is None or (1e-7 < suggestion < 2.0)


def test_loader_early_exit_no_stall(tmp_path):
    """Breaking out of loader iteration (limit_train_batches) must not stall
    on a blocked producer or leak its thread."""
    import threading
    import time as _time
    config = make_config(tmp_path, max_epochs=1,
                         trainer_extra={"limit_train_batches": 1})
    task, trainer = build(config)
    before = threading.active_count()
    t0 = _time.perf_counter()
    trainer.fit(task)
    elapsed = _time.perf_counter() - t0
    _time.sleep(0.5)
    # the 5s join timeout would show up here if the producer were stuck
    assert elapsed < 60
    assert threading.active_count() <= before + 2


def test_loader_propagates_dataset_errors(tmp_path):
    """A crashing __getitem__ must fail the epoch loudly, not truncate it."""
    from torchok_tpu.data.loader import DataLoader

    class Boom:
        def __len__(self):
            return 64

        def __getitem__(self, i):
            if i == 40:
                raise RuntimeError("corrupt sample")
            return {"x": np.float32(i)}

    loader = DataLoader(Boom(), batch_size=8, num_workers=2)
    with pytest.raises(RuntimeError, match="corrupt sample"):
        for _ in loader:
            pass


def test_loader_num_workers_zero_is_synchronous(tmp_path):
    from torchok_tpu.data.loader import DataLoader

    class DS:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            return {"x": np.float32(i)}

    loader = DataLoader(DS(), batch_size=4, num_workers=0)
    assert loader.num_workers == 0
    batches = list(loader)
    assert len(batches) == 2 and batches[0]["x"].shape == (4,)


def test_collate_bools_stay_bool():
    from torchok_tpu.data.loader import default_collate
    batch = default_collate([{"flag": True}, {"flag": False}])
    assert batch["flag"].dtype == np.bool_


def test_weights_only_checkpoint_resume(tmp_path):
    """save_weights_only=True writes opt_state=None; fit(ckpt_path=...) must
    load the weights and reinitialize the optimizer instead of failing on an
    Orbax tree-structure mismatch."""
    import jax
    import jax.numpy as jnp

    ckpt_dir = str(tmp_path / "ckpts_w")
    config = make_config(tmp_path, max_epochs=1, extra_callbacks=[
        {"name": "ModelCheckpoint",
         "params": {"dirpath": ckpt_dir, "save_last": True,
                    "save_weights_only": True}},
    ])
    task, trainer = build(config)
    trainer.fit(task)
    last = Path(ckpt_dir) / "last.ckpt"
    assert last.exists()
    trained = jax.device_get(trainer.state.params)

    config2 = make_config(tmp_path, max_epochs=2, extra_callbacks=[])
    task2, trainer2 = build(config2)
    trainer2.fit(task2, ckpt_path=str(last))
    # weights were actually loaded: epoch-0 state of run 2 equals run 1's
    # final params is unverifiable after an extra epoch, but the restore
    # itself must not have silently re-randomized; check restore directly.
    from torchok_tpu.callbacks.model_checkpoint import restore_train_state
    task3, trainer3 = build(make_config(tmp_path, max_epochs=1))
    trainer3._setup_state(task3)
    restored, meta = restore_train_state(str(last), trainer3.state)
    for a, b in zip(jax.tree_util.tree_leaves(trained),
                    jax.tree_util.tree_leaves(jax.device_get(restored.params))):
        assert jnp.allclose(a, b), "weights-only restore changed params"
    assert restored.opt_state is not None


def _two_train_loader_config(tmp_path, mode, n1=96, n2=32, max_epochs=1):
    config = make_config(tmp_path, max_epochs=max_epochs,
                         trainer_extra={"multiple_trainloader_mode": mode,
                                        "num_sanity_val_steps": 0})
    import copy
    first = config.data.TRAIN[0]
    second = copy.deepcopy(first.to_dict())
    first.dataset.params.num_samples = n1
    second["dataset"]["params"]["num_samples"] = n2
    config.data.TRAIN.append(type(first)(second))
    return config


def test_multiple_train_loaders_sequential(tmp_path):
    """Two TRAIN loaders, 'sequential' (consumed one after another, each
    fully): 96/32 + 32/32 = 3 + 1 = 4 optimizer steps per epoch (reference
    surface: torchok tasks/base.py:60-68 returns a list of dataloaders)."""
    config = _two_train_loader_config(tmp_path, "sequential")
    task, trainer = build(config)
    trainer.fit(task)
    assert trainer.global_step == 4


def test_multiple_train_loaders_max_size_cycle(tmp_path):
    """'max_size_cycle' (Lightning default): shorter loader restarts; steps
    per epoch = n_loaders * max(len) = 2 * 3 = 6."""
    config = _two_train_loader_config(tmp_path, "max_size_cycle")
    task, trainer = build(config)
    trainer.fit(task)
    assert trainer.global_step == 6


def test_multiple_train_loaders_with_steps_per_execution_parity(tmp_path):
    """steps_per_execution=4 over two interleaved TRAIN loaders (round-2 gap:
    this silently degraded to 1 step/execution) must match the unfused run
    optimizer-step-for-step: same step count, same final parameters."""
    import jax

    optimization = [{"optimizer": {"name": "SGD", "params": {"lr": 0.01}}}]

    def run(spe):
        # one epoch: per-execution scan-vs-unrolled divergence is ~1e-7 but
        # BN training dynamics amplify it chaotically over many steps
        config = _two_train_loader_config(tmp_path, "max_size_cycle",
                                          n1=96, n2=32, max_epochs=1)
        config.optimization = make_config(
            tmp_path, optimization=optimization).optimization
        if spe > 1:
            config.trainer.steps_per_execution = spe
        task, trainer = build(config)
        trainer.fit(task)
        return trainer

    t1 = run(1)
    t4 = run(4)
    # 2 loaders x max(3, 1) = 6 interleaved steps/epoch
    assert t1.global_step == 6
    assert t4.global_step == t1.global_step
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(abs(np.asarray(a) - np.asarray(b)).max()),
        t1.state.params, t4.state.params)
    # measured: ~1e-7 per execution from scan-vs-unrolled fp reassociation,
    # chaotically amplified by BN training dynamics to ~2e-4 over 6 steps; a
    # semantic error (skipped/duplicated/reordered micro batch) lands ~1e-1
    assert max(jax.tree_util.tree_leaves(diffs)) < 1e-3


def test_multi_optimizer_groups(tmp_path):
    """Two optimization groups (reference constructor.py:37-83): each batch
    applies both optimizers sequentially (Lightning automatic optimization),
    each group's scheduler steps independently."""
    optimization = [
        {"optimizer": {"name": "SGD", "params": {"lr": 0.1}},
         "scheduler": {"name": "ExponentialLR", "params": {"gamma": 0.5}}},
        {"optimizer": {"name": "Adam", "params": {"lr": 0.001}},
         "scheduler": {"name": "ExponentialLR", "params": {"gamma": 0.9}}},
    ]
    config = make_config(tmp_path, max_epochs=2, optimization=optimization,
                         trainer_extra={"num_sanity_val_steps": 0})
    task, trainer = build(config)
    trainer.fit(task)
    # 128 samples / bs 32 = 4 batches per epoch; one engine step per batch
    assert trainer.global_step == 8
    assert len(trainer.bundles) == 2 and len(trainer.txs) == 2
    assert isinstance(trainer.state.opt_state, tuple)
    # schedulers advanced independently: lr factors differ per bundle
    assert trainer.bundles[0].scheduler.current_lr == pytest.approx(0.1 * 0.5 ** 2)
    assert trainer.bundles[1].scheduler.current_lr == pytest.approx(0.001 * 0.9 ** 2)
    # the injected lr leaves in each bundle's opt_state reflect the factors
    import jax
    leaves = jax.tree_util.tree_flatten(trainer.state.opt_state)[0]
    lr0 = leaves[trainer._lr_positions[0][0]]
    lr1 = leaves[trainer._lr_positions[1][0]]
    assert float(lr0) == pytest.approx(0.1 * 0.25, rel=1e-5)
    assert float(lr1) == pytest.approx(0.001 * 0.81, rel=1e-5)


def test_multi_optimizer_trains(tmp_path):
    """Loss decreases with two groups — both updates actually apply."""
    optimization = [
        {"optimizer": {"name": "SGD", "params": {"lr": 0.01}}},
        {"optimizer": {"name": "SGD", "params": {"lr": 0.01}}},
    ]
    config = make_config(tmp_path, max_epochs=2, optimization=optimization,
                         trainer_extra={"num_sanity_val_steps": 0})
    task, trainer = build(config)
    trainer.fit(task)
    assert trainer.callback_metrics["train/loss"] < 2.5


def test_make_train_step_accepts_bare_transformation(tmp_path):
    """bench.py/auto_lr_find/__graft_entry__ pass trainer.tx (a single optax
    GradientTransformation — itself a NamedTuple); it must not be unpacked
    as a list of transformations."""
    import jax
    import numpy as np

    config = make_config(tmp_path, max_epochs=1)
    task, trainer = build(config)
    trainer._setup_state(task)
    step = trainer._make_train_step(task, trainer.tx)
    host = {"image": np.zeros((8, 32, 32, 3), np.float32),
            "target": np.zeros((8,), np.int64)}
    batch = jax.device_put(host, trainer.data_sharding)
    state, outputs, losses = step(trainer.state, batch)
    assert np.isfinite(float(losses["loss"]))


def test_combined_loader_modes_unit():
    from torchok_tpu.data.loader import CombinedTrainLoader, DataLoader

    class DS:
        def __init__(self, n, tag):
            self.n, self.tag = n, tag
        def __len__(self):
            return self.n
        def __getitem__(self, i):
            import numpy as np
            return {"x": np.asarray([i]), "tag": self.tag}

    a = DataLoader(DS(8, 0), batch_size=2, num_workers=0)   # 4 batches
    b = DataLoader(DS(4, 1), batch_size=2, num_workers=0)   # 2 batches

    seq = CombinedTrainLoader([a, b], mode="sequential")
    assert len(seq) == 6
    batches = list(seq)
    assert len(batches) == 6
    tags = [bb["tag"][0] for bb in batches]
    # Lightning 2.x sequential semantics: consume each loader fully, in order
    assert tags == [0, 0, 0, 0, 1, 1]

    cyc = CombinedTrainLoader([a, b], mode="max_size_cycle")
    assert len(cyc) == 8
    batches = list(cyc)
    assert len(batches) == 8
    tags = [bb["tag"][0] for bb in batches]
    assert tags == [0, 1] * 4  # shorter loader restarted

    cyc.set_epoch(3)
    assert a.epoch == 3 and b.epoch == 3

    # empty loaders are rejected at construction, not mid-epoch
    empty = DataLoader(DS(1, 2), batch_size=2, num_workers=0, drop_last=True)
    import pytest as _pytest
    with _pytest.raises(ValueError, match="zero batches"):
        CombinedTrainLoader([a, empty])


def test_combined_loader_superbatch_len_exact_with_ragged():
    """Ragged constituent batches flush superbatch groups early, so the
    yielded count exceeds ceil(n/k); __len__ must match what __iter__
    actually yields or the engine's `bidx >= n_train` break drops trailing
    batches (and optimizer steps) silently."""
    import numpy as np
    from torchok_tpu.data.loader import CombinedTrainLoader, DataLoader

    class DS:
        def __init__(self, n, tag):
            self.n, self.tag = n, tag
        def __len__(self):
            return self.n
        def __getitem__(self, i):
            return {"x": np.asarray([i], np.float32), "tag": self.tag}

    a = DataLoader(DS(7, 0), batch_size=2, num_workers=0)  # sizes 2,2,2,1
    b = DataLoader(DS(5, 1), batch_size=2, num_workers=0)  # sizes 2,2,1

    for mode, expected in (("sequential", 5), ("max_size_cycle", 6)):
        comb = CombinedTrainLoader([a, b], mode=mode)
        comb.superbatch_k = 2
        batches = list(comb)
        assert len(comb) == len(batches) == expected, mode
        # every underlying sample is served exactly once per base pass
        total = sum(bb["x"].shape[0] for bb in batches)
        base = CombinedTrainLoader([a, b], mode=mode)
        assert total == sum(bb["x"].shape[0] for bb in base)


def test_combined_loader_superbatch_key_mismatch_raises():
    """Structurally different batches across loaders must raise the
    descriptive error, not a bare KeyError (and never silently drop keys)."""
    import numpy as np
    import pytest as _pytest
    from torchok_tpu.data.loader import CombinedTrainLoader

    g1 = {"x": np.zeros((2, 1), np.float32)}
    g2 = {"x": np.zeros((2, 1), np.float32),
          "extra": np.zeros((2,), np.float32)}
    with _pytest.raises(ValueError, match="structurally identical"):
        CombinedTrainLoader._concat_batches([g1, g2])
    with _pytest.raises(ValueError, match="structurally identical"):
        CombinedTrainLoader._concat_batches([g2, g1])


def test_concat_batches_shape_mismatch_gets_curated_error():
    """Same keys but mismatched array shapes (two TRAIN loaders with
    different image sizes under steps_per_execution>1) must raise the
    curated guidance message, not a bare np.concatenate ValueError."""
    from torchok_tpu.data.loader import CombinedTrainLoader
    group = [{"image": np.zeros((2, 8, 8, 3), np.float32)},
             {"image": np.zeros((2, 16, 16, 3), np.float32)}]
    with pytest.raises(ValueError, match="steps_per_execution: 1"):
        CombinedTrainLoader._concat_batches(group)
