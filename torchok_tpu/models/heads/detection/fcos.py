"""FCOS detection head (reference: torchok/models/heads/detection/fcos.py:20-221
— an mmdet FCOSHead subclass; rebuilt natively in Flax; FCOS paper
arXiv:1904.01355).

Control-inversion preserved: the head owns target assignment and routes its
flattened outputs into the task's JointLoss via the same output keys the
reference YAML mappings use (``flatten_cls_scores``, ``flatten_labels``,
``num_pos``, ``pos_decoded_bbox_preds``, ``pos_decoded_target_preds``,
``pos_centerness_targets``, ``centerness_denorm``, ``pos_centerness``).

XLA adaptation of the positive-selection step (SURVEY.md §7 "dynamic shapes
in detection"): instead of gathering positive rows (dynamic shape), arrays
stay full-length with padding constructed so non-positive slots contribute
zero gradient and ~zero loss — masked weights for the IoU loss, logits
pinned to -30 for the centerness BCE. Decoding + class-aware NMS are
static-shape (ops/boxes.py).
"""
from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from torchok_tpu.constructor import HEADS
from torchok_tpu.models.base import BaseModel
from torchok_tpu.ops.boxes import batched_nms, distance2bbox

INF = 1e8


class Scale(nn.Module):
    init_value: float = 1.0

    @nn.compact
    def __call__(self, x):
        s = self.param("scale", nn.initializers.constant(self.init_value), ())
        return x * s


@HEADS.register_class
class FCOSHead(BaseModel):
    num_classes: int = 80
    in_channels: int = 256
    feat_channels: int = 256
    stacked_convs: int = 4
    strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    regress_ranges: Tuple[Tuple[float, float], ...] = (
        (-1, 64), (64, 128), (128, 256), (256, 512), (512, INF))
    center_sampling: bool = False
    center_sample_radius: float = 1.5
    norm_on_bbox: bool = False
    centerness_on_reg: bool = False
    # test cfg (flat fields, or mmdet-style train_cfg/test_cfg dicts)
    score_thr: float = 0.05
    nms_iou_threshold: float = 0.6
    nms_pre: int = 1000
    max_per_img: int = 100
    train_cfg: Any = None  # accepted for reference-YAML parity (assigner cfg
    test_cfg: Any = None   # is implicit in FCOS); test_cfg overrides the flat fields
    dtype: Any = None

    def _test_cfg(self, key, default):
        tc = self.test_cfg or {}
        if hasattr(tc, "to_dict"):
            tc = tc.to_dict()
        if key == "iou_threshold":
            return (tc.get("nms") or {}).get("iou_threshold", default)
        return tc.get(key, default)

    @property
    def out_channels(self) -> int:
        return self.num_classes

    # ------------------------------------------------------------------
    @nn.compact
    def __call__(self, feats: List[jnp.ndarray], train: bool = False
                 ) -> Tuple[List[jnp.ndarray], List[jnp.ndarray], List[jnp.ndarray]]:
        # tower weights (incl. GN) are shared across pyramid levels; only the
        # per-level Scale differs — FCOS-paper design
        cls_convs = [nn.Conv(self.feat_channels, (3, 3), padding=((1, 1), (1, 1)),
                             dtype=self.dtype, name=f"cls_conv_{i}")
                     for i in range(self.stacked_convs)]
        cls_gns = [nn.GroupNorm(num_groups=32, name=f"cls_gn_{i}")
                   for i in range(self.stacked_convs)]
        reg_convs = [nn.Conv(self.feat_channels, (3, 3), padding=((1, 1), (1, 1)),
                             dtype=self.dtype, name=f"reg_conv_{i}")
                     for i in range(self.stacked_convs)]
        reg_gns = [nn.GroupNorm(num_groups=32, name=f"reg_gn_{i}")
                   for i in range(self.stacked_convs)]
        bias_init = float(-math.log((1 - 0.01) / 0.01))
        conv_cls = nn.Conv(self.num_classes, (3, 3), padding=((1, 1), (1, 1)),
                           bias_init=nn.initializers.constant(bias_init),
                           kernel_init=nn.initializers.normal(0.01),
                           dtype=self.dtype, name="conv_cls")
        conv_reg = nn.Conv(4, (3, 3), padding=((1, 1), (1, 1)),
                           kernel_init=nn.initializers.normal(0.01),
                           dtype=self.dtype, name="conv_reg")
        conv_ctr = nn.Conv(1, (3, 3), padding=((1, 1), (1, 1)),
                           kernel_init=nn.initializers.normal(0.01),
                           dtype=self.dtype, name="conv_centerness")

        cls_scores, bbox_preds, centernesses = [], [], []
        for lvl, x in enumerate(feats):
            cls_feat, reg_feat = x, x
            for i in range(self.stacked_convs):
                cls_feat = nn.relu(cls_gns[i](cls_convs[i](cls_feat)))
                reg_feat = nn.relu(reg_gns[i](reg_convs[i](reg_feat)))
            cls_out = conv_cls(cls_feat)
            reg_out = conv_reg(reg_feat)
            ctr_src = reg_feat if self.centerness_on_reg else cls_feat
            ctr_out = conv_ctr(ctr_src)
            reg_out = Scale(name=f"scale_{lvl}")(reg_out)
            if self.norm_on_bbox:
                # stride-normalized distances in BOTH train and eval so the
                # validation loss sees the same units as training (the mmdet
                # original rescales here in eval because it never computes an
                # eval loss; decoding applies the stride in get_bboxes)
                reg_out = nn.relu(reg_out)
            else:
                reg_out = jnp.exp(reg_out)
            cls_scores.append(cls_out)
            bbox_preds.append(reg_out)
            centernesses.append(ctr_out[..., 0])
        return cls_scores, bbox_preds, centernesses

    @staticmethod
    def format_dict(head_output) -> Dict[str, Any]:
        return dict(zip(["cls_scores", "bbox_preds", "centernesses"], head_output))

    # ------------------------------------------------------------------
    def _level_points(self, featmap_sizes) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Static point grid over all levels: (P, 2) centers, (P,) strides,
        (P, 2) regress ranges."""
        if len(featmap_sizes) != len(self.strides):
            raise ValueError(
                f"FCOSHead got {len(featmap_sizes)} feature levels but "
                f"{len(self.strides)} strides")
        if len(self.regress_ranges) < len(self.strides):
            raise ValueError(
                f"regress_ranges ({len(self.regress_ranges)}) must cover every "
                f"stride ({len(self.strides)}); override both together")
        pts, strides, ranges = [], [], []
        for (h, w), s, rr in zip(featmap_sizes, self.strides, self.regress_ranges):
            ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
            p = np.stack([(xs.reshape(-1) + 0.5) * s, (ys.reshape(-1) + 0.5) * s], -1)
            pts.append(p)
            strides.append(np.full((h * w,), s, np.float32))
            ranges.append(np.tile(np.array(rr, np.float32)[None], (h * w, 1)))
        return (np.concatenate(pts).astype(np.float32), np.concatenate(strides),
                np.concatenate(ranges))

    def _assign_targets(self, points, strides, ranges, gt_bboxes, gt_labels):
        """Single image FCOS assignment. points (P,2); gt (M,4)/(M,) with
        label -1 padding. Returns labels (P,), bbox_targets (P,4)."""
        p = points[:, None, :]  # (P,1,2)
        gt = gt_bboxes[None]  # (1,M,4)
        left = p[..., 0] - gt[..., 0]
        top = p[..., 1] - gt[..., 1]
        right = gt[..., 2] - p[..., 0]
        bottom = gt[..., 3] - p[..., 1]
        dists = jnp.stack([left, top, right, bottom], -1)  # (P,M,4)

        if self.center_sampling:
            cx = (gt[..., 0] + gt[..., 2]) / 2
            cy = (gt[..., 1] + gt[..., 3]) / 2
            radius = strides[:, None] * self.center_sample_radius
            inside = ((jnp.abs(p[..., 0] - cx) < radius) &
                      (jnp.abs(p[..., 1] - cy) < radius) &
                      (jnp.min(dists, -1) > 0))
        else:
            inside = jnp.min(dists, -1) > 0
        max_dist = jnp.max(dists, -1)
        in_range = (max_dist >= ranges[:, None, 0]) & (max_dist <= ranges[:, None, 1])
        valid_gt = (gt_labels >= 0)[None, :]
        area = jnp.maximum(gt[..., 2] - gt[..., 0], 0) * \
            jnp.maximum(gt[..., 3] - gt[..., 1], 0)
        cand = inside & in_range & valid_gt
        masked_area = jnp.where(cand, area, INF)
        min_area = jnp.min(masked_area, -1)
        gt_idx = jnp.argmin(masked_area, -1)
        labels = jnp.where(min_area < INF, gt_labels[gt_idx], self.num_classes)
        bbox_targets = jnp.take_along_axis(dists, gt_idx[:, None, None], 1)[:, 0]
        return labels, bbox_targets

    @staticmethod
    def centerness_target(bbox_targets: jnp.ndarray) -> jnp.ndarray:
        lr = bbox_targets[..., [0, 2]]
        tb = bbox_targets[..., [1, 3]]
        c = (jnp.min(lr, -1) / jnp.maximum(jnp.max(lr, -1), 1e-12)) * \
            (jnp.min(tb, -1) / jnp.maximum(jnp.max(tb, -1), 1e-12))
        return jnp.sqrt(jnp.maximum(c, 0))

    def loss(self, joint_loss, cls_scores, bbox_preds, centernesses,
             gt_bboxes, gt_labels, **kwargs):
        """gt_bboxes (B, M, 4), gt_labels (B, M) with -1 padding."""
        featmap_sizes = [(c.shape[1], c.shape[2]) for c in cls_scores]
        pts_np, strides_np, ranges_np = self._level_points(featmap_sizes)
        points = jnp.asarray(pts_np)
        strides = jnp.asarray(strides_np)
        ranges = jnp.asarray(ranges_np)

        labels, bbox_targets = jax.vmap(
            lambda b, l: self._assign_targets(points, strides, ranges, b, l)
        )(gt_bboxes, gt_labels)  # (B,P), (B,P,4)
        if self.norm_on_bbox:
            bbox_targets = bbox_targets / strides[None, :, None]

        num_imgs = cls_scores[0].shape[0]
        flat_cls = jnp.concatenate(
            [c.reshape(num_imgs, -1, self.num_classes) for c in cls_scores], 1
        ).reshape(-1, self.num_classes).astype(jnp.float32)
        flat_reg = jnp.concatenate(
            [b.reshape(num_imgs, -1, 4) for b in bbox_preds], 1
        ).reshape(-1, 4).astype(jnp.float32)
        flat_ctr = jnp.concatenate(
            [c.reshape(num_imgs, -1) for c in centernesses], 1
        ).reshape(-1).astype(jnp.float32)
        flat_labels = labels.reshape(-1)
        flat_targets = bbox_targets.reshape(-1, 4)
        flat_points = jnp.tile(points, (num_imgs, 1))

        pos_mask = (flat_labels >= 0) & (flat_labels < self.num_classes)
        posf = pos_mask.astype(jnp.float32)
        num_pos = jnp.maximum(jnp.sum(posf), 1.0)

        ctr_targets = self.centerness_target(flat_targets)
        pos_ctr_targets = ctr_targets * posf  # zero weight on non-pos slots
        centerness_denorm = jnp.maximum(jnp.sum(pos_ctr_targets), 1e-6)

        decoded_preds = distance2bbox(flat_points, flat_reg)
        safe_targets = jnp.where(pos_mask[:, None], flat_targets, 1.0)
        decoded_targets = distance2bbox(flat_points, safe_targets)

        # centerness BCE: pin non-pos logits to -30 (zero grad, ~zero loss)
        pos_ctr_logits = jnp.where(pos_mask, flat_ctr, -30.0)

        return joint_loss(
            flatten_cls_scores=flat_cls,
            flatten_labels=flat_labels,
            num_pos=num_pos,
            pos_decoded_bbox_preds=decoded_preds,
            pos_decoded_target_preds=decoded_targets,
            pos_centerness_targets=pos_ctr_targets,
            centerness_denorm=centerness_denorm,
            pos_centerness=pos_ctr_logits,
        )

    # ------------------------------------------------------------------
    def get_bboxes(self, cls_scores, bbox_preds, centernesses,
                   img_shape: Optional[Tuple[int, int]] = None, **kwargs):
        """Decode + class-aware NMS. Returns dict of padded per-image arrays:
        bboxes (B, max_per_img, 4), scores (B, max_per_img), labels
        (B, max_per_img) with -1/-0 padding."""
        featmap_sizes = [(c.shape[1], c.shape[2]) for c in cls_scores]
        pts_np, strides_np, _ = self._level_points(featmap_sizes)
        points = jnp.asarray(pts_np)
        num_imgs = cls_scores[0].shape[0]

        flat_cls = jnp.concatenate(
            [c.reshape(num_imgs, -1, self.num_classes) for c in cls_scores], 1)
        flat_reg = jnp.concatenate(
            [b.reshape(num_imgs, -1, 4) for b in bbox_preds], 1)
        flat_ctr = jnp.concatenate(
            [c.reshape(num_imgs, -1) for c in centernesses], 1)
        if self.norm_on_bbox:
            flat_reg = flat_reg * jnp.asarray(strides_np)[None, :, None]

        probs = jax.nn.sigmoid(flat_cls.astype(jnp.float32))
        ctr = jax.nn.sigmoid(flat_ctr.astype(jnp.float32))[..., None]
        scores = probs * ctr  # (B, P, C)

        nms_pre = self._test_cfg("nms_pre", self.nms_pre)
        score_thr = self._test_cfg("score_thr", self.score_thr)
        iou_thr = self._test_cfg("iou_threshold", self.nms_iou_threshold)
        max_per_img = self._test_cfg("max_per_img", self.max_per_img)
        # per-level candidate boundaries (mmdet applies nms_pre per level so
        # dense shallow levels cannot crowd deep levels out)
        level_sizes = [h * w for (h, w) in featmap_sizes]
        level_starts = np.concatenate([[0], np.cumsum(level_sizes)]).astype(int)

        def per_image(score_pc, reg_p):
            cand_scores, cand_pts, cand_cls = [], [], []
            c = score_pc.shape[1]
            for li in range(len(level_sizes)):
                s0, s1 = int(level_starts[li]), int(level_starts[li + 1])
                lvl_flat = score_pc[s0:s1].reshape(-1)
                k = min(nms_pre, lvl_flat.shape[0])
                top_scores, top_idx = jax.lax.top_k(lvl_flat, k)
                cand_scores.append(top_scores)
                cand_pts.append(s0 + top_idx // c)
                cand_cls.append(top_idx % c)
            top_scores = jnp.concatenate(cand_scores)
            pt_idx = jnp.concatenate(cand_pts)
            cls_idx = jnp.concatenate(cand_cls)
            boxes = distance2bbox(points[pt_idx], reg_p[pt_idx], max_shape=img_shape)
            top_scores = jnp.where(top_scores > score_thr, top_scores, 0.0)
            keep_idx, keep_scores = batched_nms(
                boxes, top_scores, cls_idx,
                iou_threshold=iou_thr, max_out=max_per_img)
            valid = keep_idx >= 0
            safe = jnp.maximum(keep_idx, 0)
            out_boxes = jnp.where(valid[:, None], boxes[safe], 0.0)
            out_labels = jnp.where(valid, cls_idx[safe], -1)
            return out_boxes, keep_scores, out_labels

        boxes, scores_out, labels_out = jax.vmap(per_image)(scores, flat_reg)
        return {"bboxes": boxes, "scores": scores_out, "labels": labels_out}
