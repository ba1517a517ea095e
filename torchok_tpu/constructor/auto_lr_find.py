"""LR finder (reference: torchok/constructor/auto_lr_find.py:5-19).

Exponential sweep between min and max lr over a limited number of steps;
the suggestion is the lr at the steepest loss descent, as in Lightning's
tuner.
"""
from __future__ import annotations

import logging
import math
from typing import Optional

import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


def find_lr(trainer, task, min_lr: float = 1e-8, max_lr: float = 1.0,
            num_training: int = 100) -> Optional[float]:
    train_loaders = task.train_dataloader()
    if not train_loaders:
        raise ValueError("No TRAIN data configured")
    loader = train_loaders[0]

    trainer.task = task
    trainer._setup_state(task)
    trainer._install_device_fns([loader], train=True)
    train_step = trainer._make_train_step(task, trainer.tx)

    lrs = np.exp(np.linspace(math.log(min_lr), math.log(max_lr), num_training))
    losses = []
    it = iter(loader)
    base = trainer._lr_bases[0][0] if trainer._lr_bases and trainer._lr_bases[0] else 1.0
    for i, lr in enumerate(lrs):
        try:
            batch = next(it)
        except StopIteration:
            loader.set_epoch(i)
            it = iter(loader)
            batch = next(it)
        trainer.state = trainer.state.replace(
            opt_state=trainer._apply_lr_factor(trainer.state.opt_state, lr / base))
        trainer.state, _, step_losses = train_step(trainer.state, batch)
        loss = float(step_losses["loss"])
        if not np.isfinite(loss) or (losses and loss > 4 * min(l for _, l in losses)):
            break
        losses.append((lr, loss))

    if len(losses) < 3:
        logger.warning("LR finder collected too few points")
        return None
    arr = np.array([l for _, l in losses])
    # smooth and take steepest descent
    kernel = np.ones(3) / 3
    smooth = np.convolve(arr, kernel, mode="valid")
    grad = np.gradient(smooth)
    idx = int(np.argmin(grad)) + 1
    suggestion = losses[idx][0]
    logger.info("LR finder suggestion: %.3e", suggestion)
    return suggestion
