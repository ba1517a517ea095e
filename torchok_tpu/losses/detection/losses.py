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


def _boxes_cxcywh(b):
    cx = (b[..., 0] + b[..., 2]) * 0.5
    cy = (b[..., 1] + b[..., 3]) * 0.5
    w = jnp.maximum(b[..., 2] - b[..., 0], 0.0)
    h = jnp.maximum(b[..., 3] - b[..., 1], 0.0)
    return cx, cy, w, h


def _iou_and_enclose(a, b, eps):
    lt = jnp.maximum(a[..., :2], b[..., :2])
    rb = jnp.minimum(a[..., 2:], b[..., 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = jnp.maximum(a[..., 2] - a[..., 0], 0) * jnp.maximum(a[..., 3] - a[..., 1], 0)
    area_b = jnp.maximum(b[..., 2] - b[..., 0], 0) * jnp.maximum(b[..., 3] - b[..., 1], 0)
    iou = inter / jnp.maximum(area_a + area_b - inter, eps)
    e_lt = jnp.minimum(a[..., :2], b[..., :2])
    e_rb = jnp.maximum(a[..., 2:], b[..., 2:])
    e_wh = jnp.maximum(e_rb - e_lt, 0.0)
    return iou, e_wh


class DIoULoss:
    """Distance-IoU: IoU penalized by normalized center distance."""

    def __init__(self, eps: float = 1e-6, reduction: str = "mean",
                 loss_weight: float = 1.0):
        self.eps = eps
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None):
        a = pred.astype(jnp.float32)
        b = target.astype(jnp.float32)
        iou, e_wh = _iou_and_enclose(a, b, self.eps)
        acx, acy, _, _ = _boxes_cxcywh(a)
        bcx, bcy, _, _ = _boxes_cxcywh(b)
        rho2 = (acx - bcx) ** 2 + (acy - bcy) ** 2
        c2 = e_wh[..., 0] ** 2 + e_wh[..., 1] ** 2 + self.eps
        loss = 1.0 - iou + rho2 / c2
        return self.loss_weight * _weighted_reduce(loss, weight, avg_factor,
                                                   self.reduction)


class CIoULoss:
    """Complete-IoU: DIoU plus aspect-ratio consistency term."""

    def __init__(self, eps: float = 1e-6, reduction: str = "mean",
                 loss_weight: float = 1.0):
        self.eps = eps
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None):
        a = pred.astype(jnp.float32)
        b = target.astype(jnp.float32)
        iou, e_wh = _iou_and_enclose(a, b, self.eps)
        acx, acy, aw, ah = _boxes_cxcywh(a)
        bcx, bcy, bw, bh = _boxes_cxcywh(b)
        rho2 = (acx - bcx) ** 2 + (acy - bcy) ** 2
        c2 = e_wh[..., 0] ** 2 + e_wh[..., 1] ** 2 + self.eps
        v = (4.0 / jnp.pi ** 2) * (
            jnp.arctan(bw / jnp.maximum(bh, self.eps)) -
            jnp.arctan(aw / jnp.maximum(ah, self.eps))) ** 2
        alpha = jax.lax.stop_gradient(v / jnp.maximum(1.0 - iou + v, self.eps))
        loss = 1.0 - iou + rho2 / c2 + alpha * v
        return self.loss_weight * _weighted_reduce(loss, weight, avg_factor,
                                                   self.reduction)


class BoundedIoULoss:
    """mmdet BoundedIoULoss: smooth-L1 on per-coordinate IoU bounds."""

    def __init__(self, beta: float = 0.2, eps: float = 1e-3,
                 reduction: str = "mean", loss_weight: float = 1.0):
        self.beta = beta
        self.eps = eps
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None):
        a = pred.astype(jnp.float32)
        b = target.astype(jnp.float32)
        acx, acy, aw, ah = _boxes_cxcywh(a)
        bcx, bcy, bw, bh = _boxes_cxcywh(b)
        dx = bcx - acx
        dy = bcy - acy
        loss_dx = 1.0 - jnp.maximum(
            (bw - 2 * jnp.abs(dx)) / jnp.maximum(bw + 2 * jnp.abs(dx), self.eps), 0)
        loss_dy = 1.0 - jnp.maximum(
            (bh - 2 * jnp.abs(dy)) / jnp.maximum(bh + 2 * jnp.abs(dy), self.eps), 0)
        loss_dw = 1.0 - jnp.minimum(bw / jnp.maximum(aw, self.eps),
                                    aw / jnp.maximum(bw, self.eps))
        loss_dh = 1.0 - jnp.minimum(bh / jnp.maximum(ah, self.eps),
                                    ah / jnp.maximum(bh, self.eps))
        comb = jnp.stack([loss_dx, loss_dy, loss_dw, loss_dh], axis=-1)
        loss = jnp.where(comb < self.beta, 0.5 * comb ** 2 / self.beta,
                         comb - 0.5 * self.beta)
        loss = jnp.sum(loss, axis=-1)
        return self.loss_weight * _weighted_reduce(loss, weight, avg_factor,
                                                   self.reduction)


class BalancedL1Loss:
    """Libra R-CNN balanced L1."""

    def __init__(self, alpha: float = 0.5, gamma: float = 1.5, beta: float = 1.0,
                 reduction: str = "mean", loss_weight: float = 1.0):
        self.alpha = alpha
        self.gamma = gamma
        self.beta = beta
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None):
        d = jnp.abs(pred.astype(jnp.float32) - target.astype(jnp.float32))
        b = jnp.e ** (self.gamma / self.alpha) - 1
        small = (self.alpha / b) * (b * d + 1) * jnp.log(b * d / self.beta + 1) \
            - self.alpha * d
        large = self.gamma * d + self.gamma / b - self.alpha * self.beta
        loss = jnp.sum(jnp.where(d < self.beta, small, large), axis=-1)
        return self.loss_weight * _weighted_reduce(loss, weight, avg_factor,
                                                   self.reduction)


class SmoothL1DetLoss:
    def __init__(self, beta: float = 1.0, reduction: str = "mean",
                 loss_weight: float = 1.0):
        self.beta = beta
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None):
        d = jnp.abs(pred.astype(jnp.float32) - target.astype(jnp.float32))
        loss = jnp.sum(jnp.where(d < self.beta, 0.5 * d ** 2 / self.beta,
                                 d - 0.5 * self.beta), axis=-1)
        return self.loss_weight * _weighted_reduce(loss, weight, avg_factor,
                                                   self.reduction)


class MSEDetLoss:
    def __init__(self, reduction: str = "mean", loss_weight: float = 1.0):
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None):
        loss = (pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2
        return self.loss_weight * _weighted_reduce(loss, weight, avg_factor,
                                                   self.reduction)


class DistributionFocalLoss:
    """GFL distribution focal loss: CE against the two integral-neighbour bins
    of a continuous regression target."""

    def __init__(self, reduction: str = "mean", loss_weight: float = 1.0):
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None):
        """pred: (N, n_bins) logits; target: (N,) continuous in [0, n_bins-1]."""
        t = target.astype(jnp.float32)
        left = jnp.floor(t).astype(jnp.int32)
        right = jnp.minimum(left + 1, pred.shape[-1] - 1)
        wl = right.astype(jnp.float32) - t
        wr = t - left.astype(jnp.float32)
        logp = jax.nn.log_softmax(pred.astype(jnp.float32), axis=-1)
        loss = -(jnp.take_along_axis(logp, left[..., None], -1)[..., 0] * wl +
                 jnp.take_along_axis(logp, right[..., None], -1)[..., 0] * wr)
        return self.loss_weight * _weighted_reduce(loss, weight, avg_factor,
                                                   self.reduction)


class QualityFocalLoss:
    """GFL quality focal loss: sigmoid focal weighting against a soft
    IoU-quality target."""

    def __init__(self, use_sigmoid: bool = True, beta: float = 2.0,
                 reduction: str = "mean", loss_weight: float = 1.0):
        self.beta = beta
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None):
        """pred: (N, C) logits; target: tuple-free encoding — a (N, C) soft
        score map (0 for background, IoU quality at the label position)."""
        x = pred.astype(jnp.float32)
        t = target.astype(jnp.float32)
        sig = jax.nn.sigmoid(x)
        ce = t * jax.nn.softplus(-x) + (1 - t) * jax.nn.softplus(x)
        loss = jnp.sum(jnp.abs(sig - t) ** self.beta * ce, axis=-1)
        return self.loss_weight * _weighted_reduce(loss, weight, avg_factor,
                                                   self.reduction)


class GaussianFocalLoss:
    """CornerNet/CenterNet focal loss on gaussian heatmaps."""

    def __init__(self, alpha: float = 2.0, gamma: float = 4.0,
                 reduction: str = "mean", loss_weight: float = 1.0):
        self.alpha = alpha
        self.gamma = gamma
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None):
        p = jnp.clip(pred.astype(jnp.float32), 1e-6, 1 - 1e-6)
        t = target.astype(jnp.float32)
        pos = (t == 1).astype(jnp.float32)
        neg_w = (1 - t) ** self.gamma
        loss = -(pos * (1 - p) ** self.alpha * jnp.log(p) +
                 (1 - pos) * neg_w * p ** self.alpha * jnp.log(1 - p))
        return self.loss_weight * _weighted_reduce(loss, weight, avg_factor,
                                                   self.reduction)


class VarifocalLoss:
    """VarifocalNet loss: asymmetric focal BCE against IACS targets."""

    def __init__(self, use_sigmoid: bool = True, alpha: float = 0.75,
                 gamma: float = 2.0, iou_weighted: bool = True,
                 reduction: str = "mean", loss_weight: float = 1.0):
        self.alpha = alpha
        self.gamma = gamma
        self.iou_weighted = iou_weighted
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None):
        x = pred.astype(jnp.float32)
        t = target.astype(jnp.float32)
        sig = jax.nn.sigmoid(x)
        ce = t * jax.nn.softplus(-x) + (1 - t) * jax.nn.softplus(x)
        pos = (t > 0).astype(jnp.float32)
        if self.iou_weighted:
            focal_w = t * pos + self.alpha * jnp.abs(sig - t) ** self.gamma * (1 - pos)
        else:
            focal_w = pos + self.alpha * jnp.abs(sig - t) ** self.gamma * (1 - pos)
        loss = jnp.sum(focal_w * ce, axis=-1) if ce.ndim > 1 else focal_w * ce
        return self.loss_weight * _weighted_reduce(loss, weight, avg_factor,
                                                   self.reduction)


class GHMC:
    """Gradient-harmonizing classification loss. The mmdet original keeps a
    momentum-EMA of the gradient-density histogram as module state; here the
    histogram is computed per batch inside the jitted step (momentum=0
    semantics) so the loss stays functional."""

    def __init__(self, bins: int = 10, momentum: float = 0.0,
                 use_sigmoid: bool = True, reduction: str = "mean",
                 loss_weight: float = 1.0):
        self.bins = bins
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None):
        x = pred.astype(jnp.float32)
        t = target.astype(jnp.float32)
        g = jax.lax.stop_gradient(jnp.abs(jax.nn.sigmoid(x) - t))
        valid = jnp.ones_like(g) if weight is None else \
            jnp.broadcast_to(weight, g.shape) > 0
        n_valid = jnp.maximum(jnp.sum(valid), 1.0)
        edges = jnp.linspace(0.0, 1.0 + 1e-6, self.bins + 1)
        idx = jnp.clip(jnp.searchsorted(edges, g, side="right") - 1, 0, self.bins - 1)
        counts = jnp.zeros((self.bins,)).at[idx.reshape(-1)].add(
            valid.reshape(-1).astype(jnp.float32))
        density = counts[idx] * jnp.count_nonzero(counts) / n_valid
        w = jnp.where(valid, 1.0 / jnp.maximum(density, 1e-6), 0.0)
        ce = t * jax.nn.softplus(-x) + (1 - t) * jax.nn.softplus(x)
        loss = ce * w
        return self.loss_weight * jnp.sum(loss) / n_valid if \
            self.reduction == "mean" else self.loss_weight * _weighted_reduce(
                loss, None, avg_factor, self.reduction)


class GHMR:
    """Gradient-harmonizing regression loss (authentic smooth-L1 ASL1 form)."""

    def __init__(self, mu: float = 0.02, bins: int = 10, momentum: float = 0.0,
                 reduction: str = "mean", loss_weight: float = 1.0):
        self.mu = mu
        self.bins = bins
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None):
        d = pred.astype(jnp.float32) - target.astype(jnp.float32)
        mu = self.mu
        loss = jnp.sqrt(d ** 2 + mu ** 2) - mu
        g = jax.lax.stop_gradient(jnp.abs(d / jnp.sqrt(d ** 2 + mu ** 2)))
        valid = jnp.ones_like(g) if weight is None else \
            jnp.broadcast_to(weight, g.shape) > 0
        n_valid = jnp.maximum(jnp.sum(valid), 1.0)
        edges = jnp.linspace(0.0, 1.0 + 1e-6, self.bins + 1)
        idx = jnp.clip(jnp.searchsorted(edges, g, side="right") - 1, 0, self.bins - 1)
        counts = jnp.zeros((self.bins,)).at[idx.reshape(-1)].add(
            valid.reshape(-1).astype(jnp.float32))
        density = counts[idx] * jnp.count_nonzero(counts) / n_valid
        w = jnp.where(valid, 1.0 / jnp.maximum(density, 1e-6), 0.0)
        return self.loss_weight * jnp.sum(loss * w) / n_valid


class KnowledgeDistillationKLDivLoss:
    """KL divergence between temperature-softened student/teacher logits."""

    def __init__(self, reduction: str = "mean", loss_weight: float = 1.0,
                 T: int = 10):
        self.T = T
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, soft_label, weight=None, avg_factor=None):
        T = self.T
        logp = jax.nn.log_softmax(pred.astype(jnp.float32) / T, axis=-1)
        q = jax.nn.softmax(soft_label.astype(jnp.float32) / T, axis=-1)
        loss = jnp.sum(q * (jnp.log(jnp.clip(q, 1e-12, None)) - logp), axis=-1) * T * T
        return self.loss_weight * _weighted_reduce(loss, weight, avg_factor,
                                                   self.reduction)


class SeesawLoss:
    """Seesaw loss (LVIS long-tail instance segmentation). The original keeps
    cumulative per-class sample counts as buffers; this functional variant
    takes static class frequencies via ``class_counts`` (YAML list) and falls
    back to plain CE when absent."""

    def __init__(self, p: float = 0.8, q: float = 2.0, num_classes: int = 1203,
                 class_counts=None, eps: float = 1e-2,
                 reduction: str = "mean", loss_weight: float = 1.0):
        self.p = p
        self.q = q
        self.num_classes = num_classes
        self.counts = None if class_counts is None else \
            jnp.asarray(class_counts, jnp.float32)
        self.eps = eps
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None):
        x = pred.astype(jnp.float32)
        num_classes = x.shape[-1]
        onehot = jax.nn.one_hot(target, num_classes, dtype=jnp.float32)
        if self.counts is not None and self.p > 0:
            counts = jnp.maximum(self.counts[:num_classes], 1.0)
            ratio = counts[None, :] / counts[:, None]  # N_j / N_i
            mitigation = jnp.where(ratio < 1.0, ratio ** self.p, 1.0)
            m = mitigation[target]  # (N, C)
            x = x + jnp.log(jnp.maximum(m, self.eps)) * (1 - onehot)
        if self.q > 0:
            sig = jax.nn.softmax(jax.lax.stop_gradient(x), axis=-1)
            score = sig / jnp.take_along_axis(
                sig, target[..., None].astype(jnp.int32), -1)
            compensation = jnp.where(score > 1.0, score ** self.q, 1.0)
            x = x + jnp.log(jnp.maximum(compensation, self.eps)) * (1 - onehot)
        loss = -jnp.sum(onehot * jax.nn.log_softmax(x, axis=-1), axis=-1)
        return self.loss_weight * _weighted_reduce(loss, weight, avg_factor,
                                                   self.reduction)


# register under both native and mmdet-parity names
# (reference: torchok/losses/detection/mmdet_losses.py:7-12 re-registers every
# mmdet *Loss as MM<Name>)
for _name, _cls in [
    ("FocalLoss", FocalLoss), ("MMFocalLoss", FocalLoss),
    ("GIoULoss", GIoULoss), ("MMGIoULoss", GIoULoss),
    ("IoULoss", IoULoss), ("MMIoULoss", IoULoss),
    ("DIoULoss", DIoULoss), ("MMDIoULoss", DIoULoss),
    ("CIoULoss", CIoULoss), ("MMCIoULoss", CIoULoss),
    ("BoundedIoULoss", BoundedIoULoss), ("MMBoundedIoULoss", BoundedIoULoss),
    ("BalancedL1Loss", BalancedL1Loss), ("MMBalancedL1Loss", BalancedL1Loss),
    ("MMSmoothL1Loss", SmoothL1DetLoss),
    ("MMMSELoss", MSEDetLoss),
    ("DistributionFocalLoss", DistributionFocalLoss),
    ("MMDistributionFocalLoss", DistributionFocalLoss),
    ("QualityFocalLoss", QualityFocalLoss),
    ("MMQualityFocalLoss", QualityFocalLoss),
    ("GaussianFocalLoss", GaussianFocalLoss),
    ("MMGaussianFocalLoss", GaussianFocalLoss),
    ("VarifocalLoss", VarifocalLoss), ("MMVarifocalLoss", VarifocalLoss),
    ("GHMC", GHMC), ("MMGHMC", GHMC),
    ("GHMR", GHMR), ("MMGHMR", GHMR),
    ("KnowledgeDistillationKLDivLoss", KnowledgeDistillationKLDivLoss),
    ("MMKnowledgeDistillationKLDivLoss", KnowledgeDistillationKLDivLoss),
    ("SeesawLoss", SeesawLoss), ("MMSeesawLoss", SeesawLoss),
    ("MMCrossEntropyLoss", CrossEntropySigmoidLoss),
    ("MML1Loss", L1DetLoss),
]:
    LOSSES.register_class(_cls, name=_name)
