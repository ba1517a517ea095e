"""Worker for the REAL two-process jax.distributed test (not a test module).

Run as:  python tests/multiproc_worker.py <out.json>
Env: JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID set by the
parent for the distributed legs; absent for the single-process baseline.
Each process contributes TWO virtual CPU devices, so the 2-process run trains
on a 4-device global mesh and the baseline on a local 4-device mesh.

The recipe is deterministic (shuffle off, synthetic data, fixed seed) and the
global per-step batch is the same SET of rows in both topologies, so the loss
trajectory must match up to f32 reduction ordering.
"""
import json
import os
import sys

n_local = os.environ.get("WORKER_LOCAL_DEVICES", "2")
flags = os.environ.get("XLA_FLAGS", "")
os.environ["XLA_FLAGS"] = (
    flags + f" --xla_force_host_platform_device_count={n_local}")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/torchok_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def main() -> None:
    out_path = sys.argv[1]
    num_nodes = int(os.environ.get("JAX_NUM_PROCESSES", "1"))

    import torchok_tpu  # noqa: F401
    from torchok_tpu.constructor import TASKS
    from torchok_tpu.constructor.config import ConfigNode
    from torchok_tpu.constructor.config_structure import merge_structured
    from torchok_tpu.constructor.runner import create_trainer

    # per-process batch: global batch is 32 in every topology
    per_proc_bs = 32 // num_nodes
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
            {"optimizer": {"name": "SGD",
                           "params": {"lr": 0.05, "momentum": 0.9}}},
        ],
        "data": {
            "TRAIN": [{
                "dataloader": {"batch_size": per_proc_bs, "num_workers": 0,
                               "drop_last": True, "shuffle": False},
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
        },
        "trainer": {"max_epochs": 3, "precision": 32,
                    "num_sanity_val_steps": 0, "num_nodes": num_nodes,
                    "limit_val_batches": 0},
        "logger": {"name": "CSVLogger",
                   "log_dir": out_path + ".logs",
                   "experiment_name": "mp"},
        "metrics": [],
        "seed_params": {"seed": 7},
    }
    config = merge_structured(ConfigNode(cfg))
    task = TASKS.get(config.task.name)(config, **config.task.params.to_dict())
    trainer = create_trainer(config)
    trainer.fit(task)

    # per-epoch train/loss trajectory from the CSV logger artifact
    import csv
    import glob
    losses = []
    for path in sorted(glob.glob(out_path + ".logs/**/metrics.csv",
                                 recursive=True)):
        with open(path) as f:
            for row in csv.DictReader(f):
                if row.get("train/loss"):
                    losses.append(float(row["train/loss"]))
    record = {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "global_devices": len(jax.devices()),
        "final_loss": float(trainer.callback_metrics["train/loss"]),
        "epoch_losses": losses,
        "global_step": int(trainer.global_step),
    }
    with open(out_path, "w") as f:
        json.dump(record, f)


if __name__ == "__main__":
    main()
