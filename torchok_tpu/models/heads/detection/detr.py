"""DETR detection head (reference: torchok/models/heads/detection/detr.py:22-327
— an mmdet DETRHead subclass; rebuilt natively in Flax; DETR paper
arXiv:2005.12872).

Transformer encoder-decoder over the deepest backbone feature with sine
positional encodings and learned object queries. The Hungarian assignment
(cls + L1 + GIoU costs) runs *in-graph* via optax's jittable
``hungarian_algorithm`` over a padded cost matrix — no host round-trip, no
dynamic shapes. Loss routing matches the reference YAML mappings
(cls_scores/labels/label_weights/cls_avg_factor, bboxes/bboxes_gt/
bbox_weights/num_total_pos, bbox_preds/bbox_targets — the reference
head's loss-mapping keys, matched by the shipped DETR recipes).
"""
from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from optax import assignment as optax_assignment

from torchok_tpu.constructor import HEADS
from torchok_tpu.models.base import BaseModel
from torchok_tpu.ops.boxes import giou


def sine_positional_encoding(h: int, w: int, dim: int, temperature: float = 10000.0):
    """2D sine positional embedding, (H, W, dim)."""
    half = dim // 2
    y = jnp.arange(h, dtype=jnp.float32)[:, None, None] + 0.5
    x = jnp.arange(w, dtype=jnp.float32)[None, :, None] + 0.5
    # standard DETR: scale to 2*pi over normalized coords
    y = y / h * 2 * math.pi
    x = x / w * 2 * math.pi
    freq = temperature ** (2 * (jnp.arange(half // 2, dtype=jnp.float32)) / half)
    pos_x = x / freq
    pos_y = y / freq
    pe_x = jnp.concatenate([jnp.sin(pos_x), jnp.cos(pos_x)], axis=-1)
    pe_y = jnp.concatenate([jnp.sin(pos_y), jnp.cos(pos_y)], axis=-1)
    pe_x = jnp.broadcast_to(pe_x, (h, w, half))
    pe_y = jnp.broadcast_to(pe_y, (h, w, half))
    return jnp.concatenate([pe_y, pe_x], axis=-1)


class TransformerLayer(nn.Module):
    num_heads: int = 8
    ffn_dim: int = 2048
    dropout: float = 0.1
    dtype: Any = None

    @nn.compact
    def __call__(self, q, kv=None, q_pos=None, k_pos=None, train: bool = False):
        """Self-attention when kv is None, cross-attention otherwise
        (post-norm, DETR convention)."""
        if kv is None:  # self attention
            query = q + q_pos if q_pos is not None else q
            attn = nn.MultiHeadDotProductAttention(
                self.num_heads, dropout_rate=self.dropout, dtype=self.dtype,
                name="self_attn")(query, query, q, deterministic=not train)
            q = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(q + attn)
        else:
            query = q + q_pos if q_pos is not None else q
            key = kv + k_pos if k_pos is not None else kv
            attn = nn.MultiHeadDotProductAttention(
                self.num_heads, dropout_rate=self.dropout, dtype=self.dtype,
                name="cross_attn")(query, key, kv, deterministic=not train)
            q = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(q + attn)
        y = nn.Dense(self.ffn_dim, dtype=self.dtype, name="ffn1")(q)
        y = nn.relu(y)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        y = nn.Dense(q.shape[-1], dtype=self.dtype, name="ffn2")(y)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(q + y)


class DecoderLayer(nn.Module):
    num_heads: int = 8
    ffn_dim: int = 2048
    dropout: float = 0.1
    dtype: Any = None

    @nn.compact
    def __call__(self, q, memory, q_pos, mem_pos, train: bool = False):
        query = q + q_pos
        attn = nn.MultiHeadDotProductAttention(
            self.num_heads, dropout_rate=self.dropout, dtype=self.dtype,
            name="self_attn")(query, query, q, deterministic=not train)
        q = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(q + attn)
        attn = nn.MultiHeadDotProductAttention(
            self.num_heads, dropout_rate=self.dropout, dtype=self.dtype,
            name="cross_attn")(q + q_pos, memory + mem_pos, memory,
                               deterministic=not train)
        q = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(q + attn)
        y = nn.Dense(self.ffn_dim, dtype=self.dtype, name="ffn1")(q)
        y = nn.relu(y)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        y = nn.Dense(q.shape[-1], dtype=self.dtype, name="ffn2")(y)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(q + y)


def cxcywh_to_xyxy(b):
    cx, cy, w, h = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)


def xyxy_to_cxcywh(b):
    x1, y1, x2, y2 = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], -1)


@HEADS.register_class
class DETRHead(BaseModel):
    num_classes: int = 80
    in_channels: int = 2048
    embed_dim: int = 256
    num_queries: int = 100
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    num_heads: int = 8
    ffn_dim: int = 2048
    dropout: float = 0.1
    # assigner costs (mmdet HungarianAssigner defaults)
    cls_cost_weight: float = 1.0
    bbox_cost_weight: float = 5.0
    iou_cost_weight: float = 2.0
    bg_cls_weight: float = 0.1
    sync_cls_avg_factor: bool = False  # GSPMD makes avg factors global already
    score_thr: float = 0.0
    max_per_img: int = 100
    # mmdet DetrTransformerDecoder parity: with return_intermediate every
    # decoder layer's output goes through the SHARED cls/reg heads and gets
    # its own Hungarian match + loss terms (deep supervision, the reference
    # config sets true — DETR converges far slower without it)
    return_intermediate: bool = True
    train_cfg: Any = None  # reference-YAML parity (Hungarian costs are fields)
    test_cfg: Any = None
    transformer: Any = None  # mmdet nested cfg accepted; our layout is flat fields
    positional_encoding: Any = None
    dtype: Any = None

    @property
    def out_channels(self) -> int:
        return self.num_classes

    @nn.compact
    def __call__(self, feats: List[jnp.ndarray], train: bool = False):
        x = feats[-1]  # deepest scale
        n, h, w, _ = x.shape
        x = nn.Conv(self.embed_dim, (1, 1), dtype=self.dtype, name="input_proj")(x)
        pos = sine_positional_encoding(h, w, self.embed_dim).astype(x.dtype)
        memory = x.reshape(n, h * w, self.embed_dim)
        mem_pos = jnp.broadcast_to(pos.reshape(1, h * w, self.embed_dim),
                                   memory.shape)

        for i in range(self.num_encoder_layers):
            memory = TransformerLayer(self.num_heads, self.ffn_dim, self.dropout,
                                      dtype=self.dtype, name=f"encoder_{i}")(
                memory, q_pos=mem_pos, train=train)

        query_embed = self.param("query_embed",
                                 nn.initializers.normal(1.0),
                                 (self.num_queries, self.embed_dim))
        q_pos = jnp.broadcast_to(query_embed[None], (n, self.num_queries,
                                                     self.embed_dim)).astype(x.dtype)
        q = jnp.zeros_like(q_pos)
        inter = []
        for i in range(self.num_decoder_layers):
            q = DecoderLayer(self.num_heads, self.ffn_dim, self.dropout,
                             dtype=self.dtype, name=f"decoder_{i}")(
                q, memory, q_pos, mem_pos, train=train)
            inter.append(q)
        # (Lyr, N, Q, E): post-norm layers, so intermediates are ready for
        # the shared heads (Dense maps over leading axes)
        qs = jnp.stack(inter) if self.return_intermediate else q[None]

        cls_scores = nn.Dense(self.num_classes + 1, dtype=self.dtype,
                              name="fc_cls")(qs)  # + background class
        y = qs
        for i in range(2):
            y = nn.relu(nn.Dense(self.embed_dim, dtype=self.dtype,
                                 name=f"reg_ffn_{i}")(y))
        bbox_preds = nn.sigmoid(nn.Dense(4, dtype=self.dtype, name="fc_reg")(y))
        # (Lyr, N, Q, C+1), (Lyr, N, Q, 4) cxcywh in [0,1]; consumers use
        # [-1] for prediction and all layers for the aux-supervised loss
        return cls_scores, bbox_preds

    @staticmethod
    def format_dict(head_output) -> Dict[str, Any]:
        return dict(zip(["cls_scores_raw", "bbox_preds_raw"], head_output))

    # ------------------------------------------------------------------
    def _match(self, cls_scores, bbox_preds, gt_bboxes_norm, gt_labels):
        """Hungarian assignment for one image. Returns per-query assigned gt
        index (-1 = background)."""
        num_q = cls_scores.shape[0]
        m = gt_labels.shape[0]
        valid = gt_labels >= 0
        probs = jax.nn.softmax(cls_scores.astype(jnp.float32), -1)
        safe_labels = jnp.maximum(gt_labels, 0)
        cls_cost = -probs[:, safe_labels]  # (Q, M)
        bbox_cost = jnp.sum(jnp.abs(bbox_preds[:, None] - gt_bboxes_norm[None]), -1)
        iou_cost = -giou(cxcywh_to_xyxy(bbox_preds)[:, None],
                         cxcywh_to_xyxy(gt_bboxes_norm)[None])
        cost = (self.cls_cost_weight * cls_cost +
                self.bbox_cost_weight * bbox_cost +
                self.iou_cost_weight * iou_cost)
        cost = jnp.where(valid[None], cost, 1e6)
        rows, cols = optax_assignment.hungarian_algorithm(cost)
        # rows/cols give min(Q, M) pairs; build per-query assignment
        assign = jnp.full((num_q,), -1, jnp.int32)
        pair_valid = valid[cols]
        assign = assign.at[rows].set(jnp.where(pair_valid, cols, -1))
        return assign

    def loss(self, joint_loss, cls_scores_raw, bbox_preds_raw, gt_bboxes,
             gt_labels, img_shape=None, **kwargs):
        """gt_bboxes (B, M, 4) pixel xyxy; gt_labels (B, M) -1-padded.

        cls/bbox preds are (Lyr, B, Q, .) decoder-layer stacks: every layer
        gets its own Hungarian match and full loss terms (mmdet DETRHead
        with return_intermediate); aux layers' tagged losses carry the
        mmdet-style ``d{i}.`` prefix, the last layer's are unprefixed."""
        if cls_scores_raw.ndim == 3:  # single-layer (return_intermediate off)
            cls_scores_raw = cls_scores_raw[None]
            bbox_preds_raw = bbox_preds_raw[None]
        hgt, wdt = img_shape[0], img_shape[1]
        scale = jnp.asarray([wdt, hgt, wdt, hgt], jnp.float32)
        gt_norm = xyxy_to_cxcywh(gt_bboxes.astype(jnp.float32) / scale)

        n_layers = cls_scores_raw.shape[0]
        total_all = 0.0
        tagged_all = {}
        for li in range(n_layers):
            total, tagged = self._layer_loss(
                joint_loss, cls_scores_raw[li], bbox_preds_raw[li],
                gt_norm, gt_labels, scale)
            total_all = total_all + total
            prefix = "" if li == n_layers - 1 else f"d{li}."
            tagged_all.update({prefix + k: v for k, v in tagged.items()})
        return total_all, tagged_all

    def _layer_loss(self, joint_loss, cls_scores_raw, bbox_preds_raw,
                    gt_norm, gt_labels, scale):
        assign = jax.vmap(self._match)(cls_scores_raw, bbox_preds_raw,
                                       gt_norm, gt_labels)  # (B, Q)

        pos_mask = assign >= 0
        posf = pos_mask.astype(jnp.float32)
        num_total_pos = jnp.maximum(jnp.sum(posf), 1.0)

        safe_assign = jnp.maximum(assign, 0)
        labels = jnp.where(pos_mask,
                           jnp.take_along_axis(gt_labels, safe_assign, 1),
                           self.num_classes)  # background = C
        # per-element class weights: background down-weighted (mmdet detr)
        label_weights = jnp.where(pos_mask, 1.0, self.bg_cls_weight)
        cls_avg_factor = num_total_pos + self.bg_cls_weight * jnp.sum(1.0 - posf)

        matched_gt = jnp.take_along_axis(
            gt_norm, safe_assign[..., None], 1)  # (B, Q, 4) cxcywh norm
        bbox_weights = posf[..., None] * jnp.ones((1, 1, 4))

        pred_xyxy = cxcywh_to_xyxy(bbox_preds_raw.astype(jnp.float32)) * scale
        gt_xyxy = cxcywh_to_xyxy(matched_gt) * scale

        return joint_loss(
            cls_scores=cls_scores_raw.reshape(-1, self.num_classes + 1).astype(jnp.float32),
            labels=labels.reshape(-1),
            label_weights=label_weights.reshape(-1),
            cls_avg_factor=cls_avg_factor,
            bboxes=pred_xyxy.reshape(-1, 4),
            bboxes_gt=jnp.where(pos_mask[..., None], gt_xyxy, pred_xyxy).reshape(-1, 4),
            bbox_weights=bbox_weights.reshape(-1, 4)[:, 0],
            num_total_pos=num_total_pos,
            bbox_preds=bbox_preds_raw.reshape(-1, 4).astype(jnp.float32),
            bbox_targets=jnp.where(pos_mask[..., None], matched_gt,
                                   bbox_preds_raw.astype(jnp.float32)).reshape(-1, 4),
        )

    def _test_cfg(self, key, default):
        cfg = self.test_cfg if isinstance(self.test_cfg, dict) else \
            (self.test_cfg.to_dict() if hasattr(self.test_cfg, "to_dict") else {})
        return cfg.get(key, default)

    def get_bboxes(self, cls_scores_raw, bbox_preds_raw,
                   img_shape: Optional[Tuple[int, int]] = None, **kwargs):
        if cls_scores_raw.ndim == 4:  # (Lyr, B, Q, .): predict from last layer
            cls_scores_raw = cls_scores_raw[-1]
            bbox_preds_raw = bbox_preds_raw[-1]
        hgt, wdt = img_shape
        scale = jnp.asarray([wdt, hgt, wdt, hgt], jnp.float32)
        probs = jax.nn.softmax(cls_scores_raw.astype(jnp.float32), -1)[..., :-1]
        scores = jnp.max(probs, -1)
        labels = jnp.argmax(probs, -1)
        score_thr = self._test_cfg("score_thr", self.score_thr)
        if score_thr:
            scores = jnp.where(scores > score_thr, scores, 0.0)
        boxes = cxcywh_to_xyxy(bbox_preds_raw.astype(jnp.float32)) * scale
        k = min(self._test_cfg("max_per_img", self.max_per_img), scores.shape[1])
        top_scores, idx = jax.lax.top_k(scores, k)
        top_boxes = jnp.take_along_axis(boxes, idx[..., None], 1)
        top_labels = jnp.take_along_axis(labels, idx, 1)
        return {"bboxes": top_boxes, "scores": top_scores, "labels": top_labels}
