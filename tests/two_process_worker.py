"""Standalone worker for the REAL two-process ``jax.distributed`` test.

Launched by tests/test_two_process_distributed.py as N separate OS
processes (coordinator env vars set by the parent), each holding its own
simulated CPU devices — the reference's real-multiprocess CPU-DDP pattern
(/root/reference/tests/base_tests/metrics/metric_manager/
test_metric_manager_ddp.py:81-86), replacing monkeypatch simulation for
the true multi-host paths: ``jax.distributed.initialize`` bring-up, the
global mesh over all processes' devices, per-process TRAIN loader
sharding, ``make_array_from_process_local_data`` global-batch assembly,
replicated eval batches, and in-step collectives.

Writes a JSON file with the per-epoch train/valid logs so the parent can
assert loss-trajectory parity against a single-process run.
"""
import argparse
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--world", type=int, required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--logdir", required=True)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--samples", type=int, default=32)
    ap.add_argument("--strategy", default=None,
                    help="trainer.strategy (e.g. fsdp); default dp")
    args = ap.parse_args()

    import jax

    # the env var alone is not honored when a TPU plugin is installed
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/torchok_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import torchok_tpu  # noqa: F401  (registers everything)
    from torchok_tpu.parallel import init_distributed

    # must run before any backend use; idempotent, so the Trainer's own
    # call (num_nodes>1) is a no-op afterwards
    init_distributed(args.world)
    assert jax.process_count() == args.world, (
        jax.process_count(), args.world)

    from torchok_tpu.constructor import TASKS
    from torchok_tpu.constructor.config import ConfigNode
    from torchok_tpu.constructor.config_structure import merge_structured
    from torchok_tpu.constructor.runner import create_trainer
    from torchok_tpu.engine.callbacks import Callback

    per_process_bs = args.samples // args.world
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
        "optimization": [
            {"optimizer": {"name": "Adam", "params": {"lr": 0.001}}},
        ],
        "data": {
            # one step per epoch covering the FULL dataset: the global batch
            # is the same sample set whichever process holds which rows, so
            # the loss trajectory must match single-process up to f32
            # reduction ordering
            "TRAIN": [{
                "dataloader": {"batch_size": per_process_bs, "num_workers": 0,
                               "drop_last": True, "shuffle": True},
                "dataset": {
                    "name": "SyntheticClassificationDataset",
                    "params": {"num_samples": args.samples, "num_classes": 10},
                    "transform": [{"name": "Normalize"},
                                  {"name": "ToTensorV2"}],
                },
            }],
            "VALID": [{
                "dataloader": {"batch_size": 16, "num_workers": 0},
                "dataset": {
                    "name": "SyntheticClassificationDataset",
                    "params": {"num_samples": 32, "num_classes": 10,
                               "seed": 5},
                    "transform": [{"name": "Normalize"},
                                  {"name": "ToTensorV2"}],
                },
            }],
        },
        "trainer": {"max_epochs": args.epochs, "precision": 32,
                    "log_every_n_steps": 1, "num_nodes": args.world,
                    "enable_checkpointing": False,
                    **({"strategy": args.strategy} if args.strategy else {})},
        "logger": {"name": "CSVLogger", "log_dir": args.logdir,
                   "experiment_name": f"rank{jax.process_index()}"},
        "metrics": [
            {"name": "Accuracy",
             "params": {"task": "multiclass", "num_classes": 10},
             "mapping": {"preds": "prediction", "target": "target"}},
        ],
        "seed_params": {"seed": 7},
    }
    config = merge_structured(ConfigNode(cfg))

    params = config.task.params.to_dict() \
        if hasattr(config.task.params, "to_dict") else config.task.params
    task = TASKS.get(config.task.name)(config, **params)
    trainer = create_trainer(config)

    records = []

    class _Record(Callback):
        def on_train_epoch_end(self, trainer, task, logs):
            records.append({k: float(v) for k, v in logs.items()})

    trainer.callbacks.append(_Record())
    trainer.fit(task)

    out = {
        "rank": jax.process_index(),
        "world": jax.process_count(),
        "global_devices": len(jax.devices()),
        "local_devices": len(jax.local_devices()),
        "global_step": int(trainer.global_step),
        "epochs": records,
        "final": {k: float(v) for k, v in trainer.callback_metrics.items()},
    }
    Path(args.out).write_text(json.dumps(out))
    print("WORKER_DONE", json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
