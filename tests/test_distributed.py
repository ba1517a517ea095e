"""Multi-device GSPMD tests on a simulated multi-device CPU mesh
(the reference's CPU-DDP equivalence tests, SURVEY.md §4 tier 2:
metric/loss values must match the single-device run)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import torchok_tpu  # noqa: F401
from torchok_tpu.constructor import TASKS
from torchok_tpu.constructor.runner import create_trainer
from torchok_tpu.engine.trainer import Trainer

from tests.test_train_loop import make_config, build


def test_multi_devices_available(multi_devices):
    assert len(multi_devices) >= 2


def test_sharded_batch_metrics_match_replicated(multi_devices):
    """Confusion-matrix accumulation over a sharded batch equals host numpy."""
    from torchok_tpu.constructor import METRICS
    mesh = Mesh(np.array(multi_devices), ("data",))
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(64, 5)).astype(np.float32)
    target = rng.integers(0, 5, size=(64,))

    m = METRICS.get("Accuracy")(task="multiclass", num_classes=5)
    state = m.empty_state()
    sharded_logits = jax.device_put(logits, NamedSharding(mesh, P("data")))
    sharded_target = jax.device_put(target, NamedSharding(mesh, P("data")))
    state = jax.jit(m.update)(state, preds=sharded_logits, target=sharded_target)
    ours = m.compute(state)
    ref = float((logits.argmax(1) == target).mean())
    assert abs(ours - ref) < 1e-6


def test_dp_training_matches_single_device(tmp_path, multi_devices):
    """Same seed, same data: an 8-way data-parallel run must produce the same
    loss trajectory as single-device (GSPMD means math is identical)."""
    config = make_config(tmp_path, max_epochs=1)
    task1, trainer1 = build(config)
    trainer1.mesh = Mesh(np.array(multi_devices[:1]), ("data",))
    trainer1.data_sharding = NamedSharding(trainer1.mesh, P("data"))
    trainer1.replicated = NamedSharding(trainer1.mesh, P())
    trainer1.fit(task1)
    loss1 = trainer1.callback_metrics["train/loss"]

    config2 = make_config(tmp_path, max_epochs=1)
    task2, trainer2 = build(config2)
    trainer2.mesh = Mesh(np.array(multi_devices), ("data",))
    trainer2.data_sharding = NamedSharding(trainer2.mesh, P("data"))
    trainer2.replicated = NamedSharding(trainer2.mesh, P())
    trainer2.fit(task2)
    loss2 = trainer2.callback_metrics["train/loss"]

    assert abs(loss1 - loss2) < 1e-3
    acc1 = trainer1.callback_metrics["valid/Accuracy"]
    acc2 = trainer2.callback_metrics["valid/Accuracy"]
    assert abs(acc1 - acc2) < 1e-6


def test_fsdp_strategy_runs(tmp_path, multi_devices):
    config = make_config(tmp_path, max_epochs=1)
    config.trainer["strategy"] = "fsdp"
    task, trainer = build(config)
    trainer.mesh = Mesh(np.array(multi_devices), ("data",))
    trainer.data_sharding = NamedSharding(trainer.mesh, P("data"))
    trainer.replicated = NamedSharding(trainer.mesh, P())
    trainer.fit(task)
    assert "train/loss" in trainer.callback_metrics


def test_tp_training_matches_single_device(tmp_path, multi_devices):
    """Tensor-parallel head sharding (model_parallel_size=2) must reproduce
    the single-device loss trajectory: GSPMD only changes layout, not math."""
    optimization = [{"optimizer": {"name": "SGD", "params": {"lr": 0.01}}}]
    config = make_config(tmp_path, max_epochs=1, optimization=optimization)
    task1, trainer1 = build(config)
    trainer1.mesh = Mesh(np.array(multi_devices[:1]), ("data",))
    trainer1.data_sharding = NamedSharding(trainer1.mesh, P("data"))
    trainer1.replicated = NamedSharding(trainer1.mesh, P())
    trainer1.fit(task1)
    loss1 = trainer1.callback_metrics["train/loss"]

    config2 = make_config(tmp_path, max_epochs=1, optimization=optimization,
                          trainer_extra={"model_parallel_size": 2,
                                         "devices": 2})
    task2, trainer2 = build(config2)
    assert trainer2.mesh.axis_names == ("data", "model")
    trainer2.fit(task2)
    loss2 = trainer2.callback_metrics["train/loss"]
    assert abs(loss1 - loss2) < 1e-3

    # the head kernel must actually be sharded over the model axis
    kernel = trainer2.state.params["head"]["fc"]["kernel"]
    spec = kernel.sharding.spec
    assert spec[-1] == "model", f"head kernel not tensor-sharded: {spec}"


def test_spatial_partitioning_matches_single_device(tmp_path, multi_devices):
    """strategy='spatial' (MLPerf-style spatial partitioning): images shard
    batch over 'data' AND height over 'model'; XLA inserts the conv halo
    exchanges and pool/BN reduces, so the loss trajectory must equal the
    single-device run exactly (sharding is layout, never numerics)."""
    optimization = [{"optimizer": {"name": "SGD", "params": {"lr": 0.01}}}]
    config = make_config(tmp_path, max_epochs=1, optimization=optimization)
    task1, trainer1 = build(config)
    trainer1.mesh = Mesh(np.array(multi_devices[:1]), ("data",))
    trainer1.fit(task1)
    loss1 = trainer1.callback_metrics["train/loss"]

    sp = 2
    config2 = make_config(tmp_path, max_epochs=1, optimization=optimization,
                          trainer_extra={"model_parallel_size": sp,
                                         "strategy": "spatial",
                                         "devices": len(multi_devices)})
    task2, trainer2 = build(config2)
    assert trainer2.mesh.axis_names == ("data", "model")
    trainer2.fit(task2)
    loss2 = trainer2.callback_metrics["train/loss"]
    assert abs(loss1 - loss2) < 1e-3
    acc1 = trainer1.callback_metrics["valid/Accuracy"]
    acc2 = trainer2.callback_metrics["valid/Accuracy"]
    assert abs(acc1 - acc2) < 1e-6

    # params stay replicated; the batch itself is the sharded thing
    kernel = trainer2.state.params["head"]["fc"]["kernel"]
    assert kernel.sharding.is_fully_replicated

    # images get the (batch, height) sharding; rank-1 targets batch-only
    host = {"image": np.zeros((8, 32, 32, 3), np.float32),
            "target": np.zeros((8,), np.int64)}
    sharded = trainer2._shard_batch(host)
    assert tuple(sharded["image"].sharding.spec)[:2] == ("data", "model")
    tspec = tuple(sharded["target"].sharding.spec)
    assert "model" not in tspec


def test_spatial_strategy_requires_model_axis(tmp_path):
    config = make_config(tmp_path, max_epochs=1,
                         trainer_extra={"strategy": "spatial"})
    with pytest.raises(ValueError, match="model_parallel_size"):
        build(config)


def test_dp_x_tp_2x2_mesh_four_devices(tmp_path):
    """dp x tp on a 2x2 mesh at 4 devices (round-1 review: the 2D mesh was
    only ever exercised at 2 devices in CI). Runs in a subprocess because the
    simulated device count is fixed at jax init."""
    import subprocess
    import sys
    import textwrap

    script = textwrap.dedent("""
        import os
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + " --xla_force_host_platform_device_count=4")
        import jax
        jax.config.update("jax_platforms", "cpu")
        import numpy as np
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
        import __graft_entry__ as g

        assert len(jax.devices()) == 4
        from torchok_tpu.engine.trainer import Trainer
        from torchok_tpu.parallel.mesh import build_mesh

        config, task = g._build({"trainer": {"max_epochs": 1, "precision": 32,
                                             "model_parallel_size": 2}})
        mesh = build_mesh(jax.devices(), model_parallel=2)
        assert mesh.devices.shape == (2, 2), mesh.devices.shape
        trainer = Trainer(config.trainer, mesh=mesh)
        trainer.task = task
        trainer._setup_state(task)
        step = trainer._make_train_step(task, trainer.txs)
        rng = np.random.default_rng(0)
        batch = jax.device_put(
            {"image": rng.normal(size=(8, 32, 32, 3)).astype(np.float32),
             "target": rng.integers(0, 10, size=(8,)).astype(np.int64)},
            NamedSharding(mesh, P("data")))
        state = trainer.state
        for _ in range(2):
            state, outputs, losses = step(state, batch)
        loss = float(losses["loss"])
        assert np.isfinite(loss), loss
        spec = state.params["head"]["fc"]["kernel"].sharding.spec
        assert spec[-1] == "model", spec
        print("2x2 OK", loss)
    """)
    import pathlib
    repo = pathlib.Path(__file__).resolve().parent.parent
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run([sys.executable, "-c", script], cwd=str(repo),
                          env=env, capture_output=True, text=True, timeout=420)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "2x2 OK" in proc.stdout


def test_dp2_x_tp4_at_eight_devices(tmp_path, multi_devices):
    """dp=2 x tp=4 on 8 devices — the shapes the driver dryrun exercises,
    now in the suite (round-2 review: fsdp@8/tp=4 were never run in CI).
    Run with: TORCHOK_TEST_DEVICES=8 pytest tests/test_distributed.py"""
    if len(multi_devices) < 8:
        pytest.skip("needs TORCHOK_TEST_DEVICES=8")
    optimization = [{"optimizer": {"name": "SGD", "params": {"lr": 0.01}}}]

    def twelve_classes(config):
        # 12 classes: the class dim must divide tp=4 for the head to shard
        config.task.params.head_params.num_classes = 12
        config.data.TRAIN[0].dataset.params.num_classes = 12
        config.data.VALID[0].dataset.params.num_classes = 12
        config.metrics[0].params.num_classes = 12
        return config

    config = twelve_classes(make_config(tmp_path, max_epochs=1,
                                        optimization=optimization))
    task1, trainer1 = build(config)
    trainer1.mesh = Mesh(np.array(multi_devices[:1]), ("data",))
    trainer1.data_sharding = NamedSharding(trainer1.mesh, P("data"))
    trainer1.replicated = NamedSharding(trainer1.mesh, P())
    trainer1.fit(task1)
    loss1 = trainer1.callback_metrics["train/loss"]

    config2 = twelve_classes(make_config(
        tmp_path, max_epochs=1, optimization=optimization,
        trainer_extra={"model_parallel_size": 4, "devices": 8}))
    task2, trainer2 = build(config2)
    assert trainer2.mesh.devices.shape == (2, 4)
    trainer2.fit(task2)
    loss2 = trainer2.callback_metrics["train/loss"]
    # sharding is layout, never numerics
    assert abs(loss1 - loss2) < 1e-3
    spec = trainer2.state.params["head"]["fc"]["kernel"].sharding.spec
    assert spec[-1] == "model", f"head kernel not tensor-sharded: {spec}"


def test_multi_optimizer_fsdp_state_shards(tmp_path, multi_devices):
    """Tuple opt_state (two optimization groups) must survive fsdp sharding
    and one training step."""
    optimization = [
        {"optimizer": {"name": "SGD", "params": {"lr": 0.01}}},
        {"optimizer": {"name": "Adam", "params": {"lr": 0.001}}},
    ]
    config = make_config(tmp_path, max_epochs=1, optimization=optimization,
                         trainer_extra={"strategy": "fsdp",
                                        "num_sanity_val_steps": 0,
                                        "limit_train_batches": 2})
    task, trainer = build(config)
    trainer.fit(task)
    assert isinstance(trainer.state.opt_state, tuple)
    assert np.isfinite(trainer.callback_metrics["train/loss"])


def test_process_sharded_loader_partitions_epoch(monkeypatch):
    """Multi-host data feeding (reference: Lightning DistributedSampler
    under num_nodes>1): each rank reads a disjoint 1/world slice of the
    epoch order, wrap-padded so every rank sees the same step count."""
    from torchok_tpu.data.loader import DataLoader

    class _Ds:
        def __len__(self):
            return 11

        def __getitem__(self, i):
            return {"x": np.float32(i)}

    shards = {}
    for rank in (0, 1):
        ld = DataLoader(_Ds(), batch_size=2, shuffle=True, seed=3,
                        process_shard=True, num_workers=0)
        monkeypatch.setattr(DataLoader, "_world",
                            staticmethod(lambda r=rank: (r, 2)))
        ld.set_epoch(0)
        shards[rank] = np.concatenate(ld._index_batches())
        assert len(ld) == 3  # ceil(ceil(11/2)=6 / bs=2)
    # wrap-padded to 12: both ranks see 6 indices, union covers the dataset
    assert len(shards[0]) == len(shards[1]) == 6
    seen = set(shards[0]) | set(shards[1])
    assert seen == set(range(11))
    # per-epoch shards are disjoint except the single wrap-pad duplicate
    overlap = set(shards[0]) & set(shards[1])
    assert len(overlap) <= 1


def test_init_distributed_single_process_noop():
    """num_nodes=1 with no coordinator env: no jax.distributed bring-up,
    process_count stays 1."""
    from torchok_tpu.parallel import init_distributed

    assert init_distributed(1) is False
    assert jax.process_count() == 1


def test_multihost_eval_batch_replicates_not_shards(tmp_path, multi_devices,
                                                    monkeypatch):
    """With process_count>1, eval batches (every process holds the FULL
    batch — eval loaders are not process-sharded) must assemble as a
    replicated global array; sharding them as per-process slices would
    duplicate every sample world× and corrupt retrieval-meter galleries."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    config = make_config(tmp_path, max_epochs=1)
    _, trainer = build(config)
    trainer.mesh = Mesh(np.array(multi_devices[:2]), ("data",))
    trainer.data_sharding = NamedSharding(trainer.mesh, P("data"))
    trainer.replicated = NamedSharding(trainer.mesh, P())
    monkeypatch.setattr(jax, "process_count", lambda: 2)

    batch = {"image": np.zeros((4, 8, 8, 3), np.float32),
             "target": np.arange(4)}
    out_eval = trainer._shard_batch(batch, train=False)
    assert out_eval["image"].sharding.is_fully_replicated
    assert out_eval["image"].shape == (4, 8, 8, 3)

    out_train = trainer._shard_batch(batch, train=True)
    assert not out_train["image"].sharding.is_fully_replicated


def test_multihost_superbatch_interleaves_steps(tmp_path, monkeypatch):
    """steps_per_execution under multi-host: the assembled global
    super-batch is process-major, so each fused step must take every
    process's i-th local micro batch — NOT contiguous global rows (which
    would give each optimizer step one host's data and spe*world steps)."""
    config = make_config(tmp_path)
    _, trainer = build(config)
    monkeypatch.setattr(jax, "process_count", lambda: 2)

    seen = []

    def fake_step(state, batch):
        return state, {"x": batch["x"]}, {"loss": jnp.mean(batch["x"])}

    multi_step = trainer._make_multi_train_step(fake_step, micro_batch=2)
    # world=2, k=2, B_local=2: process-major global rows
    # [h0s0a, h0s0b, h0s1a, h0s1b, h1s0a, h1s0b, h1s1a, h1s1b]
    rows = np.array([0, 1, 2, 3, 100, 101, 102, 103], np.float32)
    _, outputs, losses = multi_step(trainer.state, {"x": rows}, 2)
    # step 0 = both hosts' micro 0; step 1 = both hosts' micro 1
    np.testing.assert_array_equal(
        np.asarray(outputs["x"]),
        np.array([0, 1, 100, 101, 2, 3, 102, 103], np.float32))
