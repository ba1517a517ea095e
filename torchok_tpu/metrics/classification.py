"""Classification metrics on confusion-matrix / stat-score states.

Functional equivalents of the torchmetrics classes the reference re-registers
(reference: torchok/metrics/__init__.py:47-64), with matching ``task=``
binary/multiclass/multilabel signatures and wrapper-default averaging.

The accumulated state is a per-class stat-score table [tp, fp, tn, fn]
(plus a full confusion matrix where needed), updated on device.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from torchok_tpu.constructor import METRICS
from torchok_tpu.metrics.base import Metric

__all__ = []


def _binarize_preds(preds: jnp.ndarray, task: str, threshold: float,
                    num_classes: Optional[int]) -> jnp.ndarray:
    """Convert raw predictions (logits/probs/labels) to hard labels."""
    if task == "multiclass":
        if preds.ndim >= 2 and preds.shape[-1] == num_classes:
            return jnp.argmax(preds, axis=-1)
        return preds.astype(jnp.int32)
    # binary / multilabel: floats are scores, ints are labels
    if jnp.issubdtype(preds.dtype, jnp.floating):
        is_prob = jnp.all((preds >= 0) & (preds <= 1))
        probs = jnp.where(is_prob, preds, jax.nn.sigmoid(preds))
        return (probs > threshold).astype(jnp.int32)
    return preds.astype(jnp.int32)


class StatScoresMetric(Metric):
    """Shared machinery: accumulates per-class [tp, fp, tn, fn]."""

    default_average = "micro"

    def __init__(self, task: str = "multiclass", num_classes: Optional[int] = None,
                 num_labels: Optional[int] = None, threshold: float = 0.5,
                 average: Optional[str] = None, ignore_index: Optional[int] = None,
                 top_k: int = 1, **params):
        super().__init__(**params)
        self.task = task
        self.num_classes = num_classes
        self.num_labels = num_labels
        self.threshold = threshold
        self.average = average if average is not None else self.default_average
        self.ignore_index = ignore_index
        self.top_k = top_k

    @property
    def _n(self) -> int:
        if self.task == "multiclass":
            # num_classes omitted (old torchmetrics-style global accuracy):
            # fall back to a single micro bucket; class count is inferred from
            # preds at update time
            return self.num_classes if self.num_classes is not None else 1
        if self.task == "multilabel":
            return self.num_labels
        return 1

    def empty_state(self):
        return {"stats": jnp.zeros((self._n, 4), jnp.float32)}

    def update(self, state, preds: jnp.ndarray, target: jnp.ndarray, **_):
        n = self._n
        if self.task == "multiclass" and self.num_classes is None:
            # global micro accuracy bucket
            hard = jnp.argmax(preds, axis=-1) if preds.ndim >= 2 else preds
            correct = jnp.sum(hard.reshape(-1) == target.reshape(-1)).astype(jnp.float32)
            total = jnp.asarray(target.size, jnp.float32)
            delta = jnp.stack([correct, total - correct,
                               jnp.zeros(()), total - correct])[None]
            return {"stats": state["stats"] + delta}
        if self.task == "multiclass":
            hard = _binarize_preds(preds, self.task, self.threshold, n)
            tgt = target.astype(jnp.int32)
            mask = jnp.ones(tgt.shape, bool) if self.ignore_index is None else tgt != self.ignore_index
            hard, tgt = hard.reshape(-1), tgt.reshape(-1)
            mask = mask.reshape(-1)
            p1 = jax.nn.one_hot(hard, n, dtype=jnp.float32) * mask[:, None]
            t1 = jax.nn.one_hot(jnp.where(mask, tgt, 0), n, dtype=jnp.float32) * mask[:, None]
        else:
            hard = _binarize_preds(preds, self.task, self.threshold, n).reshape(-1, n) \
                if self.task == "multilabel" else \
                _binarize_preds(preds, self.task, self.threshold, n).reshape(-1, 1)
            t = target.reshape(hard.shape).astype(jnp.float32)
            p1, t1 = hard.astype(jnp.float32), t
        tp = jnp.sum(p1 * t1, axis=0)
        fp = jnp.sum(p1 * (1 - t1), axis=0)
        fn = jnp.sum((1 - p1) * t1, axis=0)
        tn = jnp.sum((1 - p1) * (1 - t1), axis=0)
        return {"stats": state["stats"] + jnp.stack([tp, fp, tn, fn], axis=1)}

    def _averaged(self, per_class: jnp.ndarray, stats: jnp.ndarray):
        if self.average in (None, "none"):
            return {str(i): float(v) for i, v in enumerate(per_class)}
        if self.average == "macro":
            return float(jnp.mean(per_class))
        if self.average == "weighted":
            support = stats[:, 0] + stats[:, 3]  # tp + fn
            w = support / jnp.maximum(jnp.sum(support), 1e-12)
            return float(jnp.sum(per_class * w))
        raise ValueError(f"Unknown average {self.average!r}")

    def _score(self, tp, fp, tn, fn):
        raise NotImplementedError

    def compute(self, state):
        stats = state["stats"]
        if self.average == "micro":
            tp, fp, tn, fn = jnp.sum(stats, axis=0)
            return float(self._score(tp, fp, tn, fn))
        per_class = self._score(stats[:, 0], stats[:, 1], stats[:, 2], stats[:, 3])
        return self._averaged(per_class, stats)


def _safe_div(a, b):
    return a / jnp.maximum(b, 1e-12)


@METRICS.register_class(name="Accuracy")
class Accuracy(StatScoresMetric):
    def _score(self, tp, fp, tn, fn):
        if self.task == "multiclass" and self.average == "micro":
            return _safe_div(tp, tp + fn)  # micro accuracy == fraction correct
        if self.task == "multiclass":
            return _safe_div(tp, tp + fn)  # per-class recall (torchmetrics macro acc)
        return _safe_div(tp + tn, tp + fp + tn + fn)


@METRICS.register_class(name="Precision")
class Precision(StatScoresMetric):
    def _score(self, tp, fp, tn, fn):
        return _safe_div(tp, tp + fp)


@METRICS.register_class(name="Recall")
class Recall(StatScoresMetric):
    def _score(self, tp, fp, tn, fn):
        return _safe_div(tp, tp + fn)


@METRICS.register_class(name="Specificity")
class Specificity(StatScoresMetric):
    def _score(self, tp, fp, tn, fn):
        return _safe_div(tn, tn + fp)


@METRICS.register_class(name="F1Score")
class F1Score(StatScoresMetric):
    def _score(self, tp, fp, tn, fn):
        return _safe_div(2 * tp, 2 * tp + fp + fn)


@METRICS.register_class(name="FBetaScore")
class FBetaScore(StatScoresMetric):
    def __init__(self, beta: float = 1.0, **kw):
        super().__init__(**kw)
        self.beta = beta

    def _score(self, tp, fp, tn, fn):
        b2 = self.beta ** 2
        return _safe_div((1 + b2) * tp, (1 + b2) * tp + b2 * fn + fp)


@METRICS.register_class(name="HammingDistance")
class HammingDistance(StatScoresMetric):
    def _score(self, tp, fp, tn, fn):
        return _safe_div(fp + fn, tp + fp + tn + fn)


@METRICS.register_class(name="ExactMatch")
class ExactMatch(Metric):
    """Multilabel exact-match ratio."""

    def __init__(self, task: str = "multilabel", num_labels: Optional[int] = None,
                 threshold: float = 0.5, **params):
        super().__init__(**params)
        self.num_labels = num_labels
        self.threshold = threshold

    def empty_state(self):
        return {"correct": jnp.zeros((), jnp.float32), "count": jnp.zeros((), jnp.float32)}

    def update(self, state, preds, target, **_):
        hard = _binarize_preds(preds, "multilabel", self.threshold, self.num_labels)
        match = jnp.all(hard == target.astype(hard.dtype), axis=-1)
        return {"correct": state["correct"] + jnp.sum(match),
                "count": state["count"] + match.shape[0]}

    def compute(self, state):
        return float(_safe_div(state["correct"], state["count"]))


class ConfusionBased(Metric):
    """Metrics needing the full C x C confusion matrix."""

    def __init__(self, task: str = "multiclass", num_classes: Optional[int] = None,
                 num_labels: Optional[int] = None, threshold: float = 0.5,
                 average: Optional[str] = None, ignore_index: Optional[int] = None,
                 **params):
        super().__init__(**params)
        self.task = task
        self.num_classes = num_classes if task == "multiclass" else (num_labels or 2)
        self.threshold = threshold
        self.average = average
        self.ignore_index = ignore_index

    def empty_state(self):
        n = self.num_classes if self.task == "multiclass" else 2
        return {"cm": jnp.zeros((n, n), jnp.float32)}

    def update(self, state, preds, target, **_):
        n = self.num_classes if self.task == "multiclass" else 2
        hard = _binarize_preds(preds, self.task, self.threshold, self.num_classes).reshape(-1)
        tgt = target.reshape(-1).astype(jnp.int32)
        mask = jnp.ones(tgt.shape, bool) if self.ignore_index is None else tgt != self.ignore_index
        idx = jnp.where(mask, tgt * n + hard, n * n)  # out-of-range bin dropped
        cm = jnp.bincount(idx, length=n * n + 1)[:-1].reshape(n, n).astype(jnp.float32)
        return {"cm": state["cm"] + cm}


@METRICS.register_class(name="ConfusionMatrix")
class ConfusionMatrix(ConfusionBased):
    def compute(self, state):
        cm = state["cm"]
        return {f"{i}_{j}": float(cm[i, j]) for i in range(cm.shape[0]) for j in range(cm.shape[1])}


@METRICS.register_class(name="CohenKappa")
class CohenKappa(ConfusionBased):
    def compute(self, state):
        cm = state["cm"]
        total = jnp.sum(cm)
        po = jnp.trace(cm) / jnp.maximum(total, 1e-12)
        pe = jnp.sum(jnp.sum(cm, 0) * jnp.sum(cm, 1)) / jnp.maximum(total ** 2, 1e-12)
        return float((po - pe) / jnp.maximum(1 - pe, 1e-12))


@METRICS.register_class(name="MatthewsCorrCoef")
class MatthewsCorrCoef(ConfusionBased):
    def compute(self, state):
        cm = state["cm"]
        t = jnp.sum(cm, axis=1)
        p = jnp.sum(cm, axis=0)
        c = jnp.trace(cm)
        s = jnp.sum(cm)
        num = c * s - jnp.sum(t * p)
        den = jnp.sqrt(jnp.maximum((s ** 2 - jnp.sum(p ** 2)) * (s ** 2 - jnp.sum(t ** 2)), 1e-12))
        return float(num / den)


@METRICS.register_class(name="JaccardIndex")
class JaccardIndex(ConfusionBased):
    def compute(self, state):
        cm = state["cm"]
        tp = jnp.diag(cm)
        union = jnp.sum(cm, 0) + jnp.sum(cm, 1) - tp
        iou = _safe_div(tp, union)
        avg = self.average or "macro"
        if avg == "micro":
            return float(_safe_div(jnp.sum(tp), jnp.sum(union)))
        if avg in ("none", None):
            return {str(i): float(v) for i, v in enumerate(iou)}
        return float(jnp.mean(iou))


@METRICS.register_class(name="Dice")
class Dice(ConfusionBased):
    def compute(self, state):
        cm = state["cm"]
        tp = jnp.diag(cm)
        denom = jnp.sum(cm, 0) + jnp.sum(cm, 1)
        dice = _safe_div(2 * tp, denom)
        avg = self.average or "micro"
        if avg == "micro":
            return float(_safe_div(2 * jnp.sum(tp), jnp.sum(denom)))
        return float(jnp.mean(dice))


class _BinnedScoreMetric(Metric):
    """AUROC / AveragePrecision via thresholded stat accumulation (the
    torchmetrics binned formulation; exact enough at 200 bins and O(1) state
    instead of storing every score)."""

    n_bins = 200

    def __init__(self, task: str = "binary", num_classes: Optional[int] = None,
                 num_labels: Optional[int] = None, average: Optional[str] = "macro",
                 **params):
        super().__init__(**params)
        self.task = task
        self.num_classes = num_classes
        self.num_labels = num_labels
        self.average = average

    @property
    def _n(self):
        if self.task == "multiclass":
            return self.num_classes
        if self.task == "multilabel":
            return self.num_labels
        return 1

    def empty_state(self):
        # per class, per threshold: tp, fp, fn, tn
        return {"hist": jnp.zeros((self._n, self.n_bins, 4), jnp.float32)}

    def update(self, state, preds, target, **_):
        n = self._n
        if self.task == "multiclass":
            scores = preds.reshape(-1, n).astype(jnp.float32)
            is_prob = jnp.all((scores >= 0) & (scores <= 1) &
                              (jnp.abs(jnp.sum(scores, -1) - 1) < 1e-3))
            scores = jnp.where(is_prob, scores, jax.nn.softmax(scores, axis=-1))
            t1 = jax.nn.one_hot(target.reshape(-1), n, dtype=jnp.float32)
        else:
            scores = preds.reshape(-1, n).astype(jnp.float32)
            is_prob = jnp.all((scores >= 0) & (scores <= 1))
            scores = jnp.where(is_prob, scores, jax.nn.sigmoid(scores))
            t1 = target.reshape(-1, n).astype(jnp.float32)
        th = jnp.linspace(0.0, 1.0, self.n_bins)
        pred_pos = scores[:, :, None] >= th[None, None, :]  # (B, C, T)
        tpos = t1[:, :, None] > 0
        tp = jnp.sum(pred_pos & tpos, axis=0).astype(jnp.float32)
        fp = jnp.sum(pred_pos & ~tpos, axis=0).astype(jnp.float32)
        fn = jnp.sum(~pred_pos & tpos, axis=0).astype(jnp.float32)
        tn = jnp.sum(~pred_pos & ~tpos, axis=0).astype(jnp.float32)
        return {"hist": state["hist"] + jnp.stack([tp, fp, fn, tn], axis=-1)}

    def _per_class(self, hist: jnp.ndarray) -> jnp.ndarray:
        raise NotImplementedError

    def compute(self, state):
        vals = self._per_class(state["hist"])
        if self.task == "binary" or self._n == 1:
            return float(vals[0])
        if self.average in ("none", None):
            return {str(i): float(v) for i, v in enumerate(vals)}
        return float(jnp.mean(vals))


@METRICS.register_class(name="AUROC")
class AUROC(_BinnedScoreMetric):
    def _per_class(self, hist):
        tp, fp, fn, tn = hist[..., 0], hist[..., 1], hist[..., 2], hist[..., 3]
        tpr = _safe_div(tp, tp + fn)  # (C, T)
        fpr = _safe_div(fp, fp + tn)
        # thresholds ascend -> fpr/tpr descend; integrate via trapezoid
        return -jnp.trapezoid(tpr, fpr, axis=-1)


@METRICS.register_class(name="AveragePrecision")
class AveragePrecision(_BinnedScoreMetric):
    def _per_class(self, hist):
        tp, fp, fn = hist[..., 0], hist[..., 1], hist[..., 2]
        precision = _safe_div(tp, tp + fp)
        recall = _safe_div(tp, tp + fn)
        # sort by descending threshold: recall ascends as threshold decreases
        precision = precision[..., ::-1]
        recall = recall[..., ::-1]
        d_recall = jnp.diff(recall, axis=-1, prepend=jnp.zeros_like(recall[..., :1]))
        return jnp.sum(precision * d_recall, axis=-1)


@METRICS.register_class(name="CalibrationError")
class CalibrationError(Metric):
    def __init__(self, task: str = "multiclass", num_classes: Optional[int] = None,
                 n_bins: int = 15, norm: str = "l1", **params):
        super().__init__(**params)
        self.num_classes = num_classes
        self.n_bins = n_bins
        self.norm = norm

    def empty_state(self):
        return {"conf": jnp.zeros((self.n_bins,), jnp.float32),
                "acc": jnp.zeros((self.n_bins,), jnp.float32),
                "count": jnp.zeros((self.n_bins,), jnp.float32)}

    def update(self, state, preds, target, **_):
        scores = preds.reshape(-1, self.num_classes).astype(jnp.float32)
        is_prob = jnp.all((scores >= 0) & (scores <= 1))
        probs = jnp.where(is_prob, scores, jax.nn.softmax(scores, axis=-1))
        conf = jnp.max(probs, axis=-1)
        correct = (jnp.argmax(probs, -1) == target.reshape(-1)).astype(jnp.float32)
        bins = jnp.clip((conf * self.n_bins).astype(jnp.int32), 0, self.n_bins - 1)
        oh = jax.nn.one_hot(bins, self.n_bins, dtype=jnp.float32)
        return {"conf": state["conf"] + oh.T @ conf,
                "acc": state["acc"] + oh.T @ correct,
                "count": state["count"] + jnp.sum(oh, axis=0)}

    def compute(self, state):
        count = jnp.maximum(state["count"], 1e-12)
        gap = jnp.abs(state["conf"] / count - state["acc"] / count)
        w = state["count"] / jnp.maximum(jnp.sum(state["count"]), 1e-12)
        if self.norm == "max":
            return float(jnp.max(gap))
        if self.norm == "l2":
            return float(jnp.sqrt(jnp.sum(w * gap ** 2)))
        return float(jnp.sum(w * gap))


@METRICS.register_class(name="StatScores")
class StatScores(StatScoresMetric):
    """Raw [tp, fp, tn, fn, support] counts (torchmetrics StatScores)."""

    def compute(self, state):
        stats = state["stats"]
        if self.average in ("micro", None) or self._n == 1:
            tp, fp, tn, fn = [float(jnp.sum(stats[:, i])) for i in range(4)]
            return {"tp": tp, "fp": fp, "tn": tn, "fn": fn, "support": tp + fn}
        out = {}
        for c in range(self._n):
            tp, fp, tn, fn = [float(stats[c, i]) for i in range(4)]
            out.update({f"tp_{c}": tp, f"fp_{c}": fp, f"tn_{c}": tn,
                        f"fn_{c}": fn, f"support_{c}": tp + fn})
        return out


@METRICS.register_class(name="HingeLoss")
class HingeLoss(Metric):
    """Mean multiclass (crammer-singer) or binary hinge loss over batches."""

    def __init__(self, task: str = "multiclass", num_classes: Optional[int] = None,
                 **params):
        super().__init__(**params)
        self.task = task
        self.num_classes = num_classes

    def empty_state(self):
        return {"total": jnp.zeros((), jnp.float32),
                "count": jnp.zeros((), jnp.float32)}

    def update(self, state, preds, target, **_):
        if self.task == "multiclass":
            scores = preds.reshape(-1, self.num_classes).astype(jnp.float32)
            tgt = target.reshape(-1).astype(jnp.int32)
            s_y = jnp.take_along_axis(scores, tgt[:, None], -1)[:, 0]
            masked = scores - 1e30 * jax.nn.one_hot(tgt, self.num_classes)
            margin = s_y - jnp.max(masked, axis=-1)
            loss = jnp.maximum(1.0 - margin, 0.0)
        else:
            t = jnp.where(target.reshape(-1) > 0, 1.0, -1.0)
            loss = jnp.maximum(1.0 - t * preds.reshape(-1).astype(jnp.float32), 0.0)
        return {"total": state["total"] + jnp.sum(loss),
                "count": state["count"] + loss.size}

    def compute(self, state):
        return float(state["total"] / jnp.maximum(state["count"], 1e-12))


@METRICS.register_class(name="ROC")
class ROC(_BinnedScoreMetric):
    """Binned ROC curve. compute() returns the curve arrays (like the
    torchmetrics original it is not loggable as a scalar epoch metric)."""

    def compute(self, state):
        hist = state["hist"]
        tp, fp, fn, tn = hist[..., 0], hist[..., 1], hist[..., 2], hist[..., 3]
        tpr = _safe_div(tp, tp + fn)
        fpr = _safe_div(fp, fp + tn)
        th = jnp.linspace(0.0, 1.0, self.n_bins)
        import numpy as _np
        if self.task == "binary" or self._n == 1:
            return (_np.asarray(fpr[0]), _np.asarray(tpr[0]), _np.asarray(th))
        return (_np.asarray(fpr), _np.asarray(tpr), _np.asarray(th))


@METRICS.register_class(name="PrecisionRecallCurve")
class PrecisionRecallCurve(_BinnedScoreMetric):
    """Binned precision/recall curve; returns the curve arrays."""

    def compute(self, state):
        hist = state["hist"]
        tp, fp, fn = hist[..., 0], hist[..., 1], hist[..., 2]
        precision = _safe_div(tp, tp + fp)
        recall = _safe_div(tp, tp + fn)
        th = jnp.linspace(0.0, 1.0, self.n_bins)
        import numpy as _np
        if self.task == "binary" or self._n == 1:
            return (_np.asarray(precision[0]), _np.asarray(recall[0]),
                    _np.asarray(th))
        return (_np.asarray(precision), _np.asarray(recall), _np.asarray(th))
