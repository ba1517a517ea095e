"""Benchmark harness.

Headline metric (BASELINE.md): train images/sec/chip for ResNet-18 /
CIFAR-10-shaped input, batch 128, mixed precision — the reference's CI
recipe (reference: examples/configs/classification_cifar10.yaml:36,84) runs
the same model/batch at fp16 on a T4.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}

The baseline divisor is a measured-estimate for the reference on its CI GPU
(T4, fp16, Lightning loop) since the reference publishes no numbers
(BASELINE.md): ~1100 img/s. Recorded in BASELINE.md; update when a real
reference measurement lands.
"""
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/torchok_tpu_jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

REFERENCE_T4_IMG_PER_SEC = 1100.0  # see module docstring
BATCH_SIZE = 128
WARMUP, ITERS = 10, 50


def main():
    import torchok_tpu  # noqa: F401
    from torchok_tpu.constructor import TASKS
    from torchok_tpu.constructor.config import ConfigNode
    from torchok_tpu.constructor.config_structure import merge_structured
    from torchok_tpu.engine.trainer import Trainer

    cfg = {
        "task": {
            "name": "ClassificationTask",
            "params": {
                "backbone_name": "resnet18",
                "backbone_params": {"pretrained": False, "in_channels": 3},
                "pooling_name": "Pooling",
                "head_name": "ClassificationHead",
                "head_params": {"num_classes": 10},
                "inputs": [{"shape": [3, 32, 32], "dtype": "float16"}],
            },
        },
        "joint_loss": {"losses": [
            {"name": "CrossEntropyLoss",
             "mapping": {"input": "prediction", "target": "target"}},
        ]},
        "optimization": [
            {"optimizer": {"name": "Adam", "params": {"lr": 1e-4}}},
        ],
        "data": {"TRAIN": [{"dataloader": {"batch_size": BATCH_SIZE},
                            "dataset": {"name": "SyntheticClassificationDataset",
                                        "params": {"num_samples": 256},
                                        "transform": []}}]},
        "trainer": {"max_epochs": 1, "precision": 16},
    }
    config = merge_structured(ConfigNode(cfg))
    task = TASKS.get(config.task.name)(config, **config.task.params.to_dict())
    trainer = Trainer(config.trainer)
    trainer.task = task
    trainer._setup_state(task)
    train_step = trainer._make_train_step(task, trainer.tx)

    rng = np.random.default_rng(0)
    host = {
        "image": rng.normal(size=(BATCH_SIZE, 32, 32, 3)).astype(np.float32),
        "target": rng.integers(0, 10, size=(BATCH_SIZE,)).astype(np.int64),
    }
    batch = jax.device_put(host, trainer.data_sharding)
    batch = {**batch, "image": batch["image"].astype(task.compute_dtype)}

    # Fused-scan measurement: K optimizer steps per dispatch (exactly what
    # trainer.steps_per_execution exposes to users) — measures sustained
    # training throughput rather than per-step host-dispatch latency, which
    # on a tunneled chip varies 2-4x run to run.
    K = 25
    import functools

    @functools.partial(jax.jit, donate_argnums=(0,))
    def multi_step(state, batch):
        def body(s, _):
            s2, _outputs, losses = train_step(s, batch)
            return s2, losses["loss"]
        return jax.lax.scan(body, state, None, length=K)

    state = trainer.state
    for _ in range(max(WARMUP // K, 2)):
        state, losses = multi_step(state, batch)
    jax.block_until_ready(losses)

    reps = max(ITERS // K, 4)
    t0 = time.perf_counter()
    for _ in range(reps):
        state, losses = multi_step(state, batch)
    jax.block_until_ready(losses)
    dt = time.perf_counter() - t0

    imgs_per_sec = reps * K * BATCH_SIZE / dt
    n_chips = trainer.num_devices
    per_chip = imgs_per_sec / n_chips
    result = {
        "metric": "train images/sec/chip (ResNet-18/CIFAR-10 shape, bs=128, bf16, fused 25-step scan)",
        "value": round(per_chip, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(per_chip / REFERENCE_T4_IMG_PER_SEC, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
