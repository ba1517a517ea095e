"""create_trainer (reference: torchok/constructor/runner.py:7-19)."""
from __future__ import annotations

from typing import Optional

from torchok_tpu.constructor import CALLBACKS
from torchok_tpu.constructor.config import ConfigNode
from torchok_tpu.constructor.logger import create_logger
from torchok_tpu.engine.trainer import Trainer


def create_trainer(train_config: ConfigNode) -> Trainer:
    logger = create_logger(train_config.get("logger"))
    callbacks = []
    for cb_cfg in train_config.get("callbacks") or []:
        params = cb_cfg.get("params") or {}
        if hasattr(params, "to_dict"):
            params = params.to_dict()
        callbacks.append(CALLBACKS.get(cb_cfg.name)(**params))
    seed = 0
    seed_params = train_config.get("seed_params")
    if seed_params and seed_params.get("seed") is not None:
        seed = int(seed_params.seed)
    return Trainer(train_config.trainer, logger_backend=logger,
                   callbacks=callbacks, seed=seed)
