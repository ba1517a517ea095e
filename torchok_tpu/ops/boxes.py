"""Box ops: IoU/GIoU, encode/decode, and a static-shape TPU NMS.

Replaces the mmcv CUDA box ops the reference leans on (SURVEY.md §2.9).
Everything is padding/masking based — no data-dependent shapes — so the
whole detection path compiles under jit (SURVEY.md §7 "hard parts").
Boxes are (x1, y1, x2, y2).
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def box_area(boxes: jnp.ndarray) -> jnp.ndarray:
    return jnp.maximum(boxes[..., 2] - boxes[..., 0], 0) * \
        jnp.maximum(boxes[..., 3] - boxes[..., 1], 0)


def box_iou(a: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Pairwise IoU: a (N, 4) x b (M, 4) -> (N, M)."""
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = box_area(a)[:, None] + box_area(b)[None, :] - inter
    return inter / jnp.maximum(union, eps)


def giou(a: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Elementwise GIoU between aligned boxes a, b of shape (..., 4)."""
    lt = jnp.maximum(a[..., :2], b[..., :2])
    rb = jnp.minimum(a[..., 2:], b[..., 2:])
    wh = jnp.maximum(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = box_area(a) + box_area(b) - inter
    iou = inter / jnp.maximum(union, eps)
    # smallest enclosing box
    elt = jnp.minimum(a[..., :2], b[..., :2])
    erb = jnp.maximum(a[..., 2:], b[..., 2:])
    ewh = jnp.maximum(erb - elt, 0)
    enclose = jnp.maximum(ewh[..., 0] * ewh[..., 1], eps)
    return iou - (enclose - union) / enclose


def distance2bbox(points: jnp.ndarray, distances: jnp.ndarray,
                  max_shape: Optional[Tuple[int, int]] = None) -> jnp.ndarray:
    """FCOS decode: points (N, 2) + (l, t, r, b) distances (N, 4) -> boxes."""
    x1 = points[..., 0] - distances[..., 0]
    y1 = points[..., 1] - distances[..., 1]
    x2 = points[..., 0] + distances[..., 2]
    y2 = points[..., 1] + distances[..., 3]
    if max_shape is not None:
        h, w = max_shape
        x1 = jnp.clip(x1, 0, w)
        y1 = jnp.clip(y1, 0, h)
        x2 = jnp.clip(x2, 0, w)
        y2 = jnp.clip(y2, 0, h)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def bbox2distance(points: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
    """(l, t, r, b) distances from points (N, 2) to boxes (N, 4)."""
    left = points[..., 0] - boxes[..., 0]
    top = points[..., 1] - boxes[..., 1]
    right = boxes[..., 2] - points[..., 0]
    bottom = boxes[..., 3] - points[..., 1]
    return jnp.stack([left, top, right, bottom], axis=-1)


@partial(jax.jit, static_argnames=("max_out", "iou_threshold"))
def nms(boxes: jnp.ndarray, scores: jnp.ndarray, iou_threshold: float = 0.5,
        max_out: int = 100) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Static-shape greedy NMS.

    boxes (N, 4), scores (N,) with suppressed/padded entries at score<=0.
    Returns (keep_idxs (max_out,), keep_scores (max_out,)); empty slots have
    idx -1, score 0. O(max_out) sequential steps, each a vectorized IoU row
    against all candidates — the TPU-friendly formulation.
    """
    n = boxes.shape[0]
    ious = box_iou(boxes, boxes)

    def body(state, _):
        alive_scores, = state
        best = jnp.argmax(alive_scores)
        best_score = alive_scores[best]
        valid = best_score > 0
        suppress = ious[best] > iou_threshold
        new_scores = jnp.where(suppress, 0.0, alive_scores)
        new_scores = new_scores.at[best].set(0.0)
        new_scores = jnp.where(valid, new_scores, alive_scores)
        out_idx = jnp.where(valid, best, -1)
        out_score = jnp.where(valid, best_score, 0.0)
        return (new_scores,), (out_idx, out_score)

    (_,), (idxs, kept_scores) = jax.lax.scan(
        body, (scores.astype(jnp.float32),), None, length=max_out)
    return idxs, kept_scores


def batched_nms(boxes: jnp.ndarray, scores: jnp.ndarray, labels: jnp.ndarray,
                iou_threshold: float = 0.5, max_out: int = 100
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Class-aware NMS via the coordinate-offset trick (boxes of different
    classes never overlap)."""
    offsets = labels.astype(jnp.float32)[:, None] * (
        jnp.max(boxes) - jnp.min(boxes) + 1.0)
    return nms(boxes + offsets, scores, iou_threshold, max_out)
