"""Loss zoo — JAX re-implementations of the torch.nn losses the reference
re-registers (reference: torchok/losses/__init__.py:13-34), matching the
torch reduction semantics ('mean' default).

Each loss is a small callable class configured from YAML params; they carry
no parameters, so they trace cleanly into the jitted step.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp

from torchok_tpu.constructor import LOSSES


def _reduce(x: jnp.ndarray, reduction: str) -> jnp.ndarray:
    if reduction == "mean":
        return jnp.mean(x)
    if reduction == "sum":
        return jnp.sum(x)
    if reduction == "none":
        return x
    raise ValueError(f"Unknown reduction {reduction!r}")


def _as_array(v, dtype=jnp.float32):
    return None if v is None else jnp.asarray(v, dtype)


@LOSSES.register_class
class CrossEntropyLoss:
    """Softmax cross-entropy over logits with torch semantics: integer class
    targets or class-prob targets, optional class weights, ignore_index,
    label smoothing."""

    def __init__(self, weight: Optional[Sequence[float]] = None,
                 ignore_index: int = -100, reduction: str = "mean",
                 label_smoothing: float = 0.0):
        self.weight = _as_array(weight)
        self.ignore_index = ignore_index
        self.reduction = reduction
        self.label_smoothing = label_smoothing

    def __call__(self, input: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        logits = input.astype(jnp.float32)
        num_classes = logits.shape[-1]
        # torch layout is (N, C, d1..) for spatial CE; ours is channels-last
        logp = jax.nn.log_softmax(logits, axis=-1)
        if target.ndim == logits.ndim:  # probability targets
            tprob = target.astype(jnp.float32)
            loss = -jnp.sum(tprob * logp, axis=-1)
            mask = jnp.ones_like(loss, dtype=bool)
        else:
            tgt = target.astype(jnp.int32)
            mask = tgt != self.ignore_index
            safe = jnp.where(mask, tgt, 0)
            onehot = jax.nn.one_hot(safe, num_classes, dtype=jnp.float32)
            if self.label_smoothing > 0.0:
                eps = self.label_smoothing
                onehot = onehot * (1.0 - eps) + eps / num_classes
            loss = -jnp.sum(onehot * logp, axis=-1)
            if self.weight is not None:
                w = self.weight[safe]
                loss = loss * w
                if self.reduction == "mean":
                    denom = jnp.sum(jnp.where(mask, w, 0.0))
                    return jnp.sum(jnp.where(mask, loss, 0.0)) / jnp.maximum(denom, 1e-12)
        loss = jnp.where(mask, loss, 0.0)
        if self.reduction == "mean":
            return jnp.sum(loss) / jnp.maximum(jnp.sum(mask), 1)
        return _reduce(loss, self.reduction)


@LOSSES.register_class
class NLLLoss:
    """Negative log-likelihood over log-probabilities (class dim last).

    Reference registers torch.nn.NLLLoss and its deprecated 4D alias
    NLLLoss2d (torchok/losses/__init__.py:14-15); NLLLoss2d is defined
    below as a subclass, matching torch where it is the same module.
    """
    def __init__(self, weight=None, ignore_index: int = -100, reduction: str = "mean"):
        self.weight = _as_array(weight)
        self.ignore_index = ignore_index
        self.reduction = reduction

    def __call__(self, input: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        tgt = target.astype(jnp.int32)
        mask = tgt != self.ignore_index
        safe = jnp.where(mask, tgt, 0)
        loss = -jnp.take_along_axis(input, safe[..., None], axis=-1)[..., 0]
        if self.weight is not None:
            loss = loss * self.weight[safe]
        loss = jnp.where(mask, loss, 0.0)
        if self.reduction == "mean":
            if self.weight is not None:
                denom = jnp.sum(jnp.where(mask, self.weight[safe], 0.0))
            else:
                denom = jnp.maximum(jnp.sum(mask), 1)
            return jnp.sum(loss) / denom
        return _reduce(loss, self.reduction)


@LOSSES.register_class
class NLLLoss2d(NLLLoss):
    """Deprecated torch alias of NLLLoss for 4D inputs; identical math."""


@LOSSES.register_class
class BCEWithLogitsLoss:
    """Sigmoid BCE on logits with optional pos_weight and ignore_index masking
    (reference: torchok/losses/classification/binary_cross_entropy.py:13-59)."""

    def __init__(self, weight=None, pos_weight=None, ignore_index: Optional[int] = None,
                 reduction: str = "mean"):
        self.weight = _as_array(weight)
        self.pos_weight = _as_array(pos_weight)
        self.ignore_index = ignore_index
        self.reduction = reduction

    def __call__(self, input: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        x = input.astype(jnp.float32)
        t = target.astype(jnp.float32)
        # numerically stable BCE-with-logits via softplus
        loss_pos = jax.nn.softplus(-x)  # -log(sigmoid(x))
        loss_neg = jax.nn.softplus(x)   # -log(1 - sigmoid(x))
        if self.pos_weight is not None:
            loss = self.pos_weight * t * loss_pos + (1.0 - t) * loss_neg
        else:
            loss = t * loss_pos + (1.0 - t) * loss_neg
        if self.weight is not None:
            loss = loss * self.weight
        if self.ignore_index is not None:
            mask = target != self.ignore_index
            loss = jnp.where(mask, loss, 0.0)
            if self.reduction == "mean":
                return jnp.sum(loss) / jnp.maximum(jnp.sum(mask), 1)
        return _reduce(loss, self.reduction)


@LOSSES.register_class
class BCELoss:
    def __init__(self, weight=None, reduction: str = "mean"):
        self.weight = _as_array(weight)
        self.reduction = reduction

    def __call__(self, input: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        p = jnp.clip(input.astype(jnp.float32), 1e-12, 1 - 1e-12)
        t = target.astype(jnp.float32)
        loss = -(t * jnp.log(p) + (1 - t) * jnp.log(1 - p))
        if self.weight is not None:
            loss = loss * self.weight
        return _reduce(loss, self.reduction)


@LOSSES.register_class
class MSELoss:
    def __init__(self, reduction: str = "mean"):
        self.reduction = reduction

    def __call__(self, input: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        return _reduce((input.astype(jnp.float32) - target.astype(jnp.float32)) ** 2, self.reduction)


@LOSSES.register_class
class L1Loss:
    def __init__(self, reduction: str = "mean"):
        self.reduction = reduction

    def __call__(self, input: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        return _reduce(jnp.abs(input.astype(jnp.float32) - target.astype(jnp.float32)), self.reduction)


@LOSSES.register_class
class SmoothL1Loss:
    def __init__(self, reduction: str = "mean", beta: float = 1.0):
        self.reduction = reduction
        self.beta = beta

    def __call__(self, input: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        d = jnp.abs(input.astype(jnp.float32) - target.astype(jnp.float32))
        loss = jnp.where(d < self.beta, 0.5 * d ** 2 / self.beta, d - 0.5 * self.beta)
        return _reduce(loss, self.reduction)


@LOSSES.register_class
class HuberLoss:
    def __init__(self, reduction: str = "mean", delta: float = 1.0):
        self.reduction = reduction
        self.delta = delta

    def __call__(self, input: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        d = jnp.abs(input.astype(jnp.float32) - target.astype(jnp.float32))
        loss = jnp.where(d < self.delta, 0.5 * d ** 2, self.delta * (d - 0.5 * self.delta))
        return _reduce(loss, self.reduction)


@LOSSES.register_class
class KLDivLoss:
    def __init__(self, reduction: str = "mean", log_target: bool = False):
        self.reduction = reduction
        self.log_target = log_target

    def __call__(self, input: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        if self.log_target:
            loss = jnp.exp(target) * (target - input)
        else:
            t = jnp.clip(target, 1e-12, None)
            loss = target * (jnp.log(t) - input)
        if self.reduction == "batchmean":
            return jnp.sum(loss) / input.shape[0]
        return _reduce(loss, self.reduction)


@LOSSES.register_class
class PoissonNLLLoss:
    def __init__(self, log_input: bool = True, full: bool = False,
                 eps: float = 1e-8, reduction: str = "mean"):
        self.log_input = log_input
        self.full = full
        self.eps = eps
        self.reduction = reduction

    def __call__(self, input: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        x = input.astype(jnp.float32)
        t = target.astype(jnp.float32)
        if self.log_input:
            loss = jnp.exp(x) - t * x
        else:
            loss = x - t * jnp.log(x + self.eps)
        if self.full:
            stirling = t * jnp.log(t + self.eps) - t + 0.5 * jnp.log(2 * jnp.pi * (t + self.eps))
            loss = loss + jnp.where(t > 1, stirling, 0.0)
        return _reduce(loss, self.reduction)


@LOSSES.register_class
class GaussianNLLLoss:
    def __init__(self, full: bool = False, eps: float = 1e-6, reduction: str = "mean"):
        self.full = full
        self.eps = eps
        self.reduction = reduction

    def __call__(self, input: jnp.ndarray, target: jnp.ndarray, var: jnp.ndarray) -> jnp.ndarray:
        v = jnp.maximum(var.astype(jnp.float32), self.eps)
        loss = 0.5 * (jnp.log(v) + (input - target) ** 2 / v)
        if self.full:
            loss = loss + 0.5 * jnp.log(2 * jnp.pi)
        return _reduce(loss, self.reduction)


def _pairwise_distance(a: jnp.ndarray, b: jnp.ndarray, p: float = 2.0,
                       eps: float = 1e-6) -> jnp.ndarray:
    d = jnp.abs(a - b) + eps
    return jnp.sum(d ** p, axis=-1) ** (1.0 / p)


@LOSSES.register_class
class TripletMarginLoss:
    def __init__(self, margin: float = 1.0, p: float = 2.0, eps: float = 1e-6,
                 swap: bool = False, reduction: str = "mean"):
        self.margin = margin
        self.p = p
        self.eps = eps
        self.swap = swap
        self.reduction = reduction

    def __call__(self, anchor: jnp.ndarray, positive: jnp.ndarray,
                 negative: jnp.ndarray) -> jnp.ndarray:
        d_ap = _pairwise_distance(anchor, positive, self.p, self.eps)
        d_an = _pairwise_distance(anchor, negative, self.p, self.eps)
        if self.swap:
            d_pn = _pairwise_distance(positive, negative, self.p, self.eps)
            d_an = jnp.minimum(d_an, d_pn)
        loss = jnp.maximum(d_ap - d_an + self.margin, 0.0)
        return _reduce(loss, self.reduction)


@LOSSES.register_class
class CosineEmbeddingLoss:
    def __init__(self, margin: float = 0.0, reduction: str = "mean"):
        self.margin = margin
        self.reduction = reduction

    def __call__(self, input1: jnp.ndarray, input2: jnp.ndarray,
                 target: jnp.ndarray) -> jnp.ndarray:
        cos = jnp.sum(input1 * input2, axis=-1) / (
            jnp.linalg.norm(input1, axis=-1) * jnp.linalg.norm(input2, axis=-1) + 1e-12)
        loss = jnp.where(target == 1, 1.0 - cos, jnp.maximum(cos - self.margin, 0.0))
        return _reduce(loss, self.reduction)


@LOSSES.register_class
class MarginRankingLoss:
    def __init__(self, margin: float = 0.0, reduction: str = "mean"):
        self.margin = margin
        self.reduction = reduction

    def __call__(self, input1: jnp.ndarray, input2: jnp.ndarray,
                 target: jnp.ndarray) -> jnp.ndarray:
        loss = jnp.maximum(-target * (input1 - input2) + self.margin, 0.0)
        return _reduce(loss, self.reduction)


@LOSSES.register_class
class HingeEmbeddingLoss:
    def __init__(self, margin: float = 1.0, reduction: str = "mean"):
        self.margin = margin
        self.reduction = reduction

    def __call__(self, input: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        loss = jnp.where(target == 1, input, jnp.maximum(self.margin - input, 0.0))
        return _reduce(loss, self.reduction)


@LOSSES.register_class
class SoftMarginLoss:
    def __init__(self, reduction: str = "mean"):
        self.reduction = reduction

    def __call__(self, input: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        loss = jnp.log1p(jnp.exp(-target * input))
        return _reduce(loss, self.reduction)


@LOSSES.register_class
class MultiLabelSoftMarginLoss:
    def __init__(self, weight=None, reduction: str = "mean"):
        self.weight = _as_array(weight)
        self.reduction = reduction

    def __call__(self, input: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        t = target.astype(jnp.float32)
        loss = -(t * jax.nn.log_sigmoid(input) + (1 - t) * jax.nn.log_sigmoid(-input))
        if self.weight is not None:
            loss = loss * self.weight
        loss = jnp.mean(loss, axis=-1)
        return _reduce(loss, self.reduction)


@LOSSES.register_class
class MultiMarginLoss:
    """torch.nn.MultiMarginLoss: multi-class hinge over logits."""

    def __init__(self, p: int = 1, margin: float = 1.0, weight=None,
                 reduction: str = "mean"):
        self.p = p
        self.margin = margin
        self.weight = _as_array(weight)
        self.reduction = reduction

    def __call__(self, input: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        x = input.astype(jnp.float32)
        tgt = target.astype(jnp.int32)
        num_classes = x.shape[-1]
        x_t = jnp.take_along_axis(x, tgt[..., None], axis=-1)
        hinge = jnp.maximum(self.margin - x_t + x, 0.0) ** self.p
        if self.weight is not None:
            hinge = hinge * self.weight[tgt][..., None]
        not_target = 1.0 - jax.nn.one_hot(tgt, num_classes, dtype=jnp.float32)
        loss = jnp.sum(hinge * not_target, axis=-1) / num_classes
        return _reduce(loss, self.reduction)


@LOSSES.register_class
class MultiLabelMarginLoss:
    """torch.nn.MultiLabelMarginLoss: target rows list class indices, padded
    with -1 after the first -1 (torch semantics)."""

    def __init__(self, reduction: str = "mean"):
        self.reduction = reduction

    def __call__(self, input: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        x = input.astype(jnp.float32)
        tgt = target.astype(jnp.int32)
        num_classes = x.shape[-1]
        # valid target entries: before the first -1
        valid = jnp.cumprod(tgt >= 0, axis=-1).astype(bool)
        safe = jnp.where(valid, tgt, 0)
        onehots = jax.nn.one_hot(safe, num_classes, dtype=jnp.float32) * \
            valid[..., None].astype(jnp.float32)
        is_target = jnp.sum(onehots, axis=-2) > 0
        x_t = jnp.take_along_axis(x, safe, axis=-1)  # (N, T) target scores
        # hinge of every non-target class j against every valid target y:
        # max(0, 1 - (x[y] - x[j]))
        hinge = jnp.maximum(1.0 - (x_t[..., :, None] - x[..., None, :]), 0.0)
        mask = valid[..., :, None] * (~is_target)[..., None, :]
        loss = jnp.sum(hinge * mask, axis=(-1, -2)) / num_classes
        return _reduce(loss, self.reduction)


@LOSSES.register_class
class TripletMarginWithDistanceLoss:
    """torch.nn.TripletMarginWithDistanceLoss with the distance function
    selected by name ('euclidean' | 'cosine') since YAML cannot carry
    callables."""

    def __init__(self, distance_function: str = "euclidean", margin: float = 1.0,
                 swap: bool = False, reduction: str = "mean"):
        self.distance_function = distance_function
        self.margin = margin
        self.swap = swap
        self.reduction = reduction

    def _dist(self, a, b):
        if self.distance_function == "cosine":
            cos = jnp.sum(a * b, -1) / (
                jnp.linalg.norm(a, axis=-1) * jnp.linalg.norm(b, axis=-1) + 1e-12)
            return 1.0 - cos
        return jnp.linalg.norm(a - b, axis=-1)

    def __call__(self, anchor, positive, negative):
        d_ap = self._dist(anchor, positive)
        d_an = self._dist(anchor, negative)
        if self.swap:
            d_an = jnp.minimum(d_an, self._dist(positive, negative))
        loss = jnp.maximum(d_ap - d_an + self.margin, 0.0)
        return _reduce(loss, self.reduction)


@LOSSES.register_class
class CTCLoss:
    """CTC loss via optax.ctc_loss (log-semiring forward algorithm as a
    lax.scan — TPU-friendly, no host sync). Inputs follow torch layout:
    log_probs (T, N, C), targets (N, S) zero-padded, plus per-sample lengths."""

    def __init__(self, blank: int = 0, reduction: str = "mean",
                 zero_infinity: bool = False):
        self.blank = blank
        self.reduction = reduction
        self.zero_infinity = zero_infinity

    def __call__(self, log_probs: jnp.ndarray, targets: jnp.ndarray,
                 input_lengths: jnp.ndarray, target_lengths: jnp.ndarray) -> jnp.ndarray:
        import optax as _optax
        logits = jnp.transpose(log_probs, (1, 0, 2)).astype(jnp.float32)  # (N, T, C)
        t_steps = logits.shape[1]
        s_len = targets.shape[1]
        logit_pad = (jnp.arange(t_steps)[None, :] >=
                     input_lengths[:, None]).astype(jnp.float32)
        label_pad = (jnp.arange(s_len)[None, :] >=
                     target_lengths[:, None]).astype(jnp.float32)
        loss = _optax.ctc_loss(logits, logit_pad, targets.astype(jnp.int32),
                               label_pad, blank_id=self.blank)
        if self.zero_infinity:
            loss = jnp.where(jnp.isfinite(loss), loss, 0.0)
        if self.reduction == "mean":  # torch: per-sample loss / target_length
            return jnp.mean(loss / jnp.maximum(target_lengths, 1))
        return _reduce(loss, self.reduction)


@LOSSES.register_class
class Identity:
    """Pass-through: forwards a model output already containing a loss value."""

    def __call__(self, input: jnp.ndarray, **kwargs) -> jnp.ndarray:
        return jnp.mean(input)
