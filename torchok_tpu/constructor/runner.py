"""create_trainer (reference: torchok/constructor/runner.py:7-19)."""
from __future__ import annotations

import logging
from typing import Optional

from torchok_tpu.constructor import CALLBACKS
from torchok_tpu.constructor.config import ConfigNode
from torchok_tpu.constructor.logger import create_logger
from torchok_tpu.engine.trainer import Trainer

logger = logging.getLogger(__name__)


def create_trainer(train_config: ConfigNode) -> Trainer:
    tp = train_config.get("trainer") or {}
    barebones = bool(tp.get("barebones"))

    # barebones (Lightning parity, config_structure.py:184): strip every
    # non-essential loop feature — no logger, no checkpointing, no progress
    # bar / summary — for raw-throughput runs
    log_backend = None if barebones else create_logger(train_config.get("logger"))

    callbacks = []
    for cb_cfg in train_config.get("callbacks") or []:
        params = cb_cfg.get("params") or {}
        if hasattr(params, "to_dict"):
            params = params.to_dict()
        callbacks.append(CALLBACKS.get(cb_cfg.name)(**params))

    from torchok_tpu.callbacks.common import ModelSummary, TQDMProgressBar
    from torchok_tpu.callbacks.model_checkpoint import ModelCheckpoint

    if barebones:
        stripped = [cb for cb in callbacks
                    if isinstance(cb, (ModelCheckpoint, ModelSummary,
                                       TQDMProgressBar))]
        if stripped:
            logger.warning(
                "trainer.barebones=true: dropping %s",
                [type(cb).__name__ for cb in stripped])
            callbacks = [cb for cb in callbacks if cb not in stripped]
    else:
        has_ckpt = any(isinstance(cb, ModelCheckpoint) for cb in callbacks)
        enable_ckpt = tp.get("enable_checkpointing")
        if enable_ckpt and not has_ckpt:
            # Lightning: enable_checkpointing=true with no configured
            # ModelCheckpoint installs the default one (saves last epoch
            # under the logger dir)
            callbacks.append(ModelCheckpoint())
        elif enable_ckpt is False and has_ckpt:
            raise ValueError(
                "trainer.enable_checkpointing=false but a ModelCheckpoint "
                "callback is configured — remove one of the two "
                "(Lightning raises the same misconfiguration)")
        if tp.get("enable_model_summary") and \
                not any(isinstance(cb, ModelSummary) for cb in callbacks):
            callbacks.append(ModelSummary())

    seed = 0
    seed_params = train_config.get("seed_params")
    if seed_params and seed_params.get("seed") is not None:
        seed = int(seed_params.seed)
    return Trainer(train_config.trainer, logger_backend=log_backend,
                   callbacks=callbacks, seed=seed)
