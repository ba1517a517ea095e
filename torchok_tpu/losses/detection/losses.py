"""Detection losses (reference: torchok/losses/detection/mmdet_losses.py
dynamically re-registers every mmdet *Loss as MM<Name>; the ones FCOS/DETR
actually consume are implemented natively here under both names).

All losses take an optional elementwise ``weight`` and an ``avg_factor``
(mmdet semantics: sum(loss * weight) / avg_factor) so detection heads can
normalize by positive counts.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from torchok_tpu.constructor import LOSSES
from torchok_tpu.ops.boxes import giou, box_iou

__all__ = []


def _weighted_reduce(loss, weight, avg_factor, reduction="mean"):
    if weight is not None:
        loss = loss * weight
    if reduction == "none":
        return loss
    if reduction == "sum":
        return jnp.sum(loss)
    if avg_factor is not None:
        return jnp.sum(loss) / jnp.maximum(avg_factor, 1e-6)
    return jnp.mean(loss)


class FocalLoss:
    """Sigmoid focal loss (RetinaNet/FCOS classification)."""

    def __init__(self, use_sigmoid: bool = True, gamma: float = 2.0,
                 alpha: float = 0.25, reduction: str = "mean",
                 loss_weight: float = 1.0):
        self.gamma = gamma
        self.alpha = alpha
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred: jnp.ndarray, target: jnp.ndarray,
                 weight: Optional[jnp.ndarray] = None,
                 avg_factor: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """pred: (N, C) logits; target: (N,) int labels where label == C
        means background (mmdet convention)."""
        logits = pred.astype(jnp.float32)
        num_classes = logits.shape[-1]
        t = jax.nn.one_hot(target, num_classes, dtype=jnp.float32)
        p = jax.nn.sigmoid(logits)
        ce = t * jax.nn.softplus(-logits) + (1 - t) * jax.nn.softplus(logits)
        p_t = p * t + (1 - p) * (1 - t)
        alpha_t = self.alpha * t + (1 - self.alpha) * (1 - t)
        loss = alpha_t * (1 - p_t) ** self.gamma * ce
        loss = jnp.sum(loss, axis=-1)
        return self.loss_weight * _weighted_reduce(loss, weight, avg_factor,
                                                   self.reduction)


class GIoULoss:
    def __init__(self, eps: float = 1e-6, reduction: str = "mean",
                 loss_weight: float = 1.0):
        self.eps = eps
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred: jnp.ndarray, target: jnp.ndarray,
                 weight: Optional[jnp.ndarray] = None,
                 avg_factor: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        loss = 1.0 - giou(pred.astype(jnp.float32), target.astype(jnp.float32),
                          self.eps)
        return self.loss_weight * _weighted_reduce(loss, weight, avg_factor,
                                                   self.reduction)


class IoULoss:
    def __init__(self, eps: float = 1e-6, reduction: str = "mean",
                 loss_weight: float = 1.0, mode: str = "log"):
        self.eps = eps
        self.reduction = reduction
        self.loss_weight = loss_weight
        self.mode = mode

    def __call__(self, pred: jnp.ndarray, target: jnp.ndarray,
                 weight: Optional[jnp.ndarray] = None,
                 avg_factor: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        a = pred.astype(jnp.float32)
        b = target.astype(jnp.float32)
        lt = jnp.maximum(a[..., :2], b[..., :2])
        rb = jnp.minimum(a[..., 2:], b[..., 2:])
        wh = jnp.maximum(rb - lt, 0)
        inter = wh[..., 0] * wh[..., 1]
        area_a = jnp.maximum(a[..., 2] - a[..., 0], 0) * jnp.maximum(a[..., 3] - a[..., 1], 0)
        area_b = jnp.maximum(b[..., 2] - b[..., 0], 0) * jnp.maximum(b[..., 3] - b[..., 1], 0)
        iou = inter / jnp.maximum(area_a + area_b - inter, self.eps)
        if self.mode == "log":
            loss = -jnp.log(jnp.clip(iou, self.eps, 1.0))
        elif self.mode == "square":
            loss = 1.0 - iou ** 2
        else:
            loss = 1.0 - iou
        return self.loss_weight * _weighted_reduce(loss, weight, avg_factor,
                                                   self.reduction)


class CrossEntropySigmoidLoss:
    """mmdet CrossEntropyLoss(use_sigmoid=True) — BCE used for centerness."""

    def __init__(self, use_sigmoid: bool = True, reduction: str = "mean",
                 loss_weight: float = 1.0, class_weight: Optional[float] = None):
        self.use_sigmoid = use_sigmoid
        self.reduction = reduction
        self.loss_weight = loss_weight
        self.class_weight = class_weight  # scalar class weight (mmdet DETR cfg)

    def __call__(self, cls_score: jnp.ndarray, label: jnp.ndarray,
                 weight: Optional[jnp.ndarray] = None,
                 avg_factor: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        x = cls_score.astype(jnp.float32)
        t = label.astype(jnp.float32)
        if self.use_sigmoid:
            loss = t * jax.nn.softplus(-x) + (1 - t) * jax.nn.softplus(x)
        else:
            loss = -jnp.sum(jax.nn.one_hot(label, x.shape[-1]) *
                            jax.nn.log_softmax(x, -1), -1)
        return self.loss_weight * _weighted_reduce(loss, weight, avg_factor,
                                                   self.reduction)


class L1DetLoss:
    def __init__(self, reduction: str = "mean", loss_weight: float = 1.0):
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None):
        loss = jnp.sum(jnp.abs(pred.astype(jnp.float32) - target.astype(jnp.float32)), -1)
        return self.loss_weight * _weighted_reduce(loss, weight, avg_factor,
                                                   self.reduction)


# register under both native and mmdet-parity names
for _name, _cls in [
    ("FocalLoss", FocalLoss), ("MMFocalLoss", FocalLoss),
    ("GIoULoss", GIoULoss), ("MMGIoULoss", GIoULoss),
    ("IoULoss", IoULoss), ("MMIoULoss", IoULoss),
    ("MMCrossEntropyLoss", CrossEntropySigmoidLoss),
    ("MML1Loss", L1DetLoss),
]:
    LOSSES.register_class(_cls, name=_name)
