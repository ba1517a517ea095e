"""Soft Dice loss for binary/multiclass/multilabel segmentation
(reference: torchok/losses/segmentation/dice.py:86-188).

Input layout is channels-last: (N, H, W, C) for multiclass/multilabel and
(N, H, W) for binary; targets are (N, H, W) class maps (multiclass) or match
the input shape (binary/multilabel)."""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from torchok_tpu.constructor import LOSSES

BINARY_MODE = "binary"
MULTICLASS_MODE = "multiclass"
MULTILABEL_MODE = "multilabel"


def soft_dice_score(pred: jnp.ndarray, target: jnp.ndarray, smooth: float,
                    eps: float, dims: Tuple[int, ...]) -> jnp.ndarray:
    intersection = jnp.sum(pred * target, axis=dims)
    cardinality = jnp.sum(pred + target, axis=dims)
    return (2.0 * intersection + smooth) / jnp.clip(cardinality + smooth, eps, None)


@LOSSES.register_class
class DiceLoss:
    def __init__(self, mode: str, classes: Optional[List[int]] = None,
                 log_loss: bool = False, from_logits: bool = True,
                 smooth: float = 0.0, eps: float = 1e-7):
        if mode not in {BINARY_MODE, MULTICLASS_MODE, MULTILABEL_MODE}:
            raise ValueError(f"DiceLoss mode {mode!r} not supported")
        if classes is not None and mode == BINARY_MODE:
            raise ValueError("Masking classes is not supported with mode=binary")
        self.mode = mode
        self.classes = None if classes is None else jnp.asarray(classes, jnp.int32)
        self.log_loss = log_loss
        self.from_logits = from_logits
        self.smooth = smooth
        self.eps = eps

    def __call__(self, input: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        x = input.astype(jnp.float32)
        bs = x.shape[0]

        if self.mode == MULTICLASS_MODE:
            num_classes = x.shape[-1]
            if self.from_logits:
                x = jnp.exp(jax.nn.log_softmax(x, axis=-1))
            x = x.reshape(bs, -1, num_classes).transpose(0, 2, 1)  # N, C, HW
            t = jax.nn.one_hot(target.reshape(bs, -1), num_classes, dtype=x.dtype)
            t = t.transpose(0, 2, 1)  # N, C, HW
        elif self.mode == MULTILABEL_MODE:
            num_classes = x.shape[-1]
            if self.from_logits:
                x = jnp.exp(jax.nn.log_sigmoid(x))
            x = x.reshape(bs, -1, num_classes).transpose(0, 2, 1)
            t = target.reshape(bs, -1, num_classes).transpose(0, 2, 1).astype(x.dtype)
        else:  # binary
            if self.from_logits:
                x = jnp.exp(jax.nn.log_sigmoid(x))
            x = x.reshape(bs, 1, -1)
            t = target.reshape(bs, 1, -1).astype(x.dtype)

        dims = (0, 2)
        scores = soft_dice_score(x, t, self.smooth, self.eps, dims)
        if self.log_loss:
            loss = -jnp.log(jnp.clip(scores, self.eps, None))
        else:
            loss = 1.0 - scores
        # zero out channels with no true pixels (dice undefined there)
        mask = jnp.sum(t, axis=dims) > 0
        loss = loss * mask.astype(loss.dtype)
        if self.classes is not None:
            loss = loss[self.classes]
        return jnp.mean(loss)
