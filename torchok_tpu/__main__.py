"""CLI entrypoint (reference: torchok/__main__.py:13-55).

Usage parity with the reference:
    python -m torchok_tpu -cp <config_dir> -cn <config_name> [+mode=train] [a.b=c ...]
"""
from __future__ import annotations

import argparse
import logging
import os
import sys

# Persistent XLA compilation cache: repeated runs of the same recipe skip the
# (minutes-long on TPU) first-compile cost. Partitioned by a host CPU
# fingerprint — XLA:CPU entries embed host-specific AOT code, and loading a
# foreign host's entries floods the log with cpu_aot_loader errors
# (torchok_tpu/utils/compile_cache.py).
from torchok_tpu.utils.compile_cache import cache_dir as _cache_dir

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _cache_dir())

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import torchok_tpu  # noqa: F401 — registers all components
from torchok_tpu.constructor.config import load_config
from torchok_tpu.constructor.config_structure import merge_structured
from torchok_tpu.constructor import TASKS
from torchok_tpu.constructor.runner import create_trainer
from torchok_tpu.utils.seed import seed_everything

logging.basicConfig(level=logging.INFO,
                    format="%(asctime)s %(levelname)s %(name)s: %(message)s")
logger = logging.getLogger("torchok_tpu")


def parse_args(argv):
    parser = argparse.ArgumentParser(prog="torchok_tpu")
    parser.add_argument("-cp", "--config-path", required=True,
                        help="directory containing the config")
    parser.add_argument("-cn", "--config-name", required=True,
                        help="config file name (without .yaml)")
    parser.add_argument("overrides", nargs="*",
                        help="dotted overrides, e.g. trainer.max_epochs=3 +mode=train")
    return parser.parse_args(argv)


def extract_mode(overrides):
    mode = "train"
    rest = []
    for ov in overrides:
        key, _, value = ov.partition("=")
        if key in ("mode", "+mode"):
            mode = value
        else:
            rest.append(ov)
    return mode, rest


def entrypoint(argv=None) -> None:
    args = parse_args(argv if argv is not None else sys.argv[1:])
    mode, overrides = extract_mode(args.overrides)

    raw = load_config(args.config_path, args.config_name, overrides)
    config = merge_structured(raw)

    # trainer.accelerator (reference surface: pl.Trainer accelerator=) picks
    # the JAX platform. This must happen before the first backend touch —
    # and must be config-driven: on tunneled-TPU rigs the JAX_PLATFORMS env
    # var is overridden by the TPU plugin, so `trainer.accelerator=cpu` is
    # the reliable way to run the CLI without claiming the TPU chip.
    accel = (config.get("trainer") or {}).get("accelerator")
    if accel and accel != "auto":
        platform = {"cuda": "gpu"}.get(accel, accel)
        try:
            jax.config.update("jax_platforms", platform)
        except Exception:  # noqa: BLE001 — backend already initialized
            logger.warning("trainer.accelerator=%s requested after jax "
                           "backend init; ignored", accel)
        if platform == "cpu":
            # CPU compiles take seconds, and reloading persisted XLA:CPU
            # executables prints two cpu_aot_loader error lines per load
            # (the `+prefer-no-scatter/gather` pseudo-features can never
            # appear in host cpuid) — the cache only pays off on TPU
            try:
                jax.config.update("jax_compilation_cache_dir", None)
            except Exception:  # noqa: BLE001
                pass

    seed_params = config.get("seed_params")
    if seed_params and seed_params.get("seed") is not None:
        seed_everything(int(seed_params.seed))

    task_params = config.task.get("params") or {}
    if hasattr(task_params, "to_dict"):
        task_params = task_params.to_dict()
    task = TASKS.get(config.task.name)(config, **task_params)

    trainer = create_trainer(config)

    if mode == "train":
        trainer.fit(task, ckpt_path=config.get("resume_path"))
    elif mode == "test":
        trainer.test(task, ckpt_path=config.get("resume_path"))
    elif mode == "predict":
        trainer.predict(task, ckpt_path=config.get("resume_path"))
    elif mode == "find_lr":
        from torchok_tpu.constructor.auto_lr_find import find_lr
        find_lr(trainer, task)
    else:
        raise ValueError(f"Unknown mode {mode!r} (train|test|predict|find_lr)")


if __name__ == "__main__":
    entrypoint()
