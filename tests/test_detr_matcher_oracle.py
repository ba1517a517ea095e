"""Pin DETR's Hungarian matcher + loss stack to an mmdet-free torch/scipy
oracle (reference: torchok/models/heads/detection/detr.py:22-327 delegates to
mmdet's HungarianAssigner(ClassificationCost 1.0 / BBoxL1Cost 5.0 xywh /
IoUCost giou 2.0) and DETRHead.loss_single(CE + L1 + GIoU, bg_cls_weight 0.1)
— the formulas below are re-derived from the mmdet semantics, not copied).

The oracle implements those exact semantics with scipy's
linear_sum_assignment (mmdet's own backend) and plain torch tensor math, then
asserts our in-graph optax-Hungarian matcher and the JointLoss-routed layer
loss reproduce them on fixed random inputs, including -1-padded gt rows.
"""
import numpy as np
import pytest
import torch
from scipy.optimize import linear_sum_assignment

import jax.numpy as jnp

import torchok_tpu  # noqa: F401
from torchok_tpu.constructor import HEADS, LOSSES
from torchok_tpu.losses.base import JointLoss

C = 6          # foreground classes
Q = 20         # queries
M_PAD = 8      # padded gt rows
BG_W = 0.1
CLS_W, BBOX_W, IOU_W = 1.0, 5.0, 2.0
IMG = (64, 96)  # (h, w)


def _head():
    return HEADS.get("DETRHead")(
        num_classes=C, in_channels=16, embed_dim=32, num_queries=Q,
        bg_cls_weight=BG_W, cls_cost_weight=CLS_W, bbox_cost_weight=BBOX_W,
        iou_cost_weight=IOU_W)


def _inputs(seed, num_valid):
    gen = np.random.default_rng(seed)
    cls_scores = gen.normal(0, 2, (Q, C + 1)).astype(np.float32)
    # cxcywh in [0,1], kept away from edges so boxes stay proper
    cxcy = gen.uniform(0.2, 0.8, (Q, 2))
    wh = gen.uniform(0.05, 0.3, (Q, 2))
    bbox_preds = np.concatenate([cxcy, wh], -1).astype(np.float32)
    g_cxcy = gen.uniform(0.2, 0.8, (M_PAD, 2))
    g_wh = gen.uniform(0.05, 0.3, (M_PAD, 2))
    g_norm = np.concatenate([g_cxcy, g_wh], -1).astype(np.float32)
    h, w = IMG
    scale = np.asarray([w, h, w, h], np.float32)
    gt_xyxy_px = _cxcywh_to_xyxy(g_norm) * scale
    labels = gen.integers(0, C, (M_PAD,)).astype(np.int32)
    labels[num_valid:] = -1
    gt_xyxy_px[num_valid:] = 0.0
    return cls_scores, bbox_preds, gt_xyxy_px, labels


def _cxcywh_to_xyxy(b):
    cx, cy, w, h = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)


def _giou_np(a, b, eps=1e-7):
    lt = np.maximum(a[..., :2], b[..., :2])
    rb = np.minimum(a[..., 2:], b[..., 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area = lambda x: np.clip(x[..., 2] - x[..., 0], 0, None) * \
        np.clip(x[..., 3] - x[..., 1], 0, None)
    union = area(a) + area(b) - inter
    iou = inter / np.maximum(union, eps)
    elt = np.minimum(a[..., :2], b[..., :2])
    erb = np.maximum(a[..., 2:], b[..., 2:])
    ewh = np.clip(erb - elt, 0, None)
    enclose = np.maximum(ewh[..., 0] * ewh[..., 1], eps)
    return iou - (enclose - union) / enclose


def _oracle_match(cls_scores, bbox_preds, gt_xyxy_px, labels):
    """mmdet HungarianAssigner semantics via scipy (per-query gt id, -1=bg)."""
    h, w = IMG
    scale = np.asarray([w, h, w, h], np.float32)
    valid = labels >= 0
    g_xyxy = gt_xyxy_px / scale
    g_norm = np.stack([(g_xyxy[:, 0] + g_xyxy[:, 2]) / 2,
                       (g_xyxy[:, 1] + g_xyxy[:, 3]) / 2,
                       g_xyxy[:, 2] - g_xyxy[:, 0],
                       g_xyxy[:, 3] - g_xyxy[:, 1]], -1)
    probs = torch.from_numpy(cls_scores).softmax(-1).numpy()
    cls_cost = -probs[:, np.maximum(labels, 0)]                       # (Q, M)
    bbox_cost = np.abs(bbox_preds[:, None] - g_norm[None]).sum(-1)    # L1 cdist
    iou_cost = -_giou_np(_cxcywh_to_xyxy(bbox_preds)[:, None], g_xyxy[None])
    cost = CLS_W * cls_cost + BBOX_W * bbox_cost + IOU_W * iou_cost
    cost = np.where(valid[None], cost, 1e6)
    rows, cols = linear_sum_assignment(cost)
    assign = np.full((Q,), -1, np.int64)
    for r, c in zip(rows, cols):
        if valid[c]:
            assign[r] = c
    return assign


@pytest.mark.parametrize("seed,num_valid", [(0, 5), (1, 8), (2, 1), (3, 3)])
def test_matcher_matches_scipy_oracle(seed, num_valid):
    cls_scores, bbox_preds, gt_xyxy_px, labels = _inputs(seed, num_valid)
    head = _head()
    h, w = IMG
    scale = np.asarray([w, h, w, h], np.float32)
    g_xyxy = gt_xyxy_px / scale
    g_norm = np.stack([(g_xyxy[:, 0] + g_xyxy[:, 2]) / 2,
                       (g_xyxy[:, 1] + g_xyxy[:, 3]) / 2,
                       g_xyxy[:, 2] - g_xyxy[:, 0],
                       g_xyxy[:, 3] - g_xyxy[:, 1]], -1)
    ours = np.asarray(head._match(jnp.asarray(cls_scores),
                                  jnp.asarray(bbox_preds),
                                  jnp.asarray(g_norm), jnp.asarray(labels)))
    theirs = _oracle_match(cls_scores, bbox_preds, gt_xyxy_px, labels)
    # optimal assignments may differ on exact cost ties; assert the cost of
    # both solutions is equal AND (generic random inputs => unique optimum)
    # the assignments themselves coincide
    np.testing.assert_array_equal(ours, theirs)


def _oracle_loss(cls_scores, bbox_preds, gt_xyxy_px, labels, assign):
    """mmdet DETRHead.loss_single in torch: CE(bg weight 0.1) + L1 + GIoU."""
    h, w = IMG
    scale = torch.tensor([w, h, w, h], dtype=torch.float32)
    t_cls = torch.from_numpy(cls_scores)
    t_pred = torch.from_numpy(bbox_preds)
    pos = assign >= 0
    num_pos = max(float(pos.sum()), 1.0)
    num_neg = float((~pos).sum())
    cls_avg = num_pos + BG_W * num_neg

    tgt_labels = torch.full((Q,), C, dtype=torch.long)
    tgt_labels[pos] = torch.from_numpy(labels[assign[pos]].astype(np.int64))
    lw = torch.where(torch.from_numpy(pos), torch.tensor(1.0),
                     torch.tensor(BG_W))
    ce = torch.nn.functional.cross_entropy(t_cls, tgt_labels, reduction="none")
    loss_cls = (ce * lw).sum() / cls_avg

    g_xyxy = torch.from_numpy(gt_xyxy_px) / scale
    g_norm = torch.stack([(g_xyxy[:, 0] + g_xyxy[:, 2]) / 2,
                          (g_xyxy[:, 1] + g_xyxy[:, 3]) / 2,
                          g_xyxy[:, 2] - g_xyxy[:, 0],
                          g_xyxy[:, 3] - g_xyxy[:, 1]], -1)
    matched = g_norm[np.maximum(assign, 0)]
    l1 = (t_pred - matched).abs().sum(-1)
    loss_bbox = (l1 * torch.from_numpy(pos).float()).sum() / num_pos

    cx, cy, bw, bh = t_pred.unbind(-1)
    pred_xyxy = torch.stack([cx - bw / 2, cy - bh / 2,
                             cx + bw / 2, cy + bh / 2], -1) * scale
    m_xyxy = torch.from_numpy(
        _cxcywh_to_xyxy(matched.numpy())) * scale
    gi = torch.from_numpy(_giou_np(pred_xyxy.numpy(), m_xyxy.numpy()))
    loss_iou = ((1 - gi) * torch.from_numpy(pos).float()).sum() / num_pos

    return (CLS_W * loss_cls + BBOX_W * loss_bbox + IOU_W * loss_iou,
            {"loss_cls": loss_cls, "loss_bbox": loss_bbox,
             "loss_iou": loss_iou})


def _detr_joint_loss():
    """The detr recipe's joint_loss (configs/detection/detr_resnet50_coco.yaml)."""
    losses = [
        LOSSES.get("MMCrossEntropyLoss")(use_sigmoid=False, class_weight=1.0),
        LOSSES.get("MMGIoULoss")(),
        LOSSES.get("MML1Loss")(),
    ]
    mappings = [
        {"cls_score": "cls_scores", "label": "labels",
         "weight": "label_weights", "avg_factor": "cls_avg_factor"},
        {"pred": "bboxes", "target": "bboxes_gt", "weight": "bbox_weights",
         "avg_factor": "num_total_pos"},
        {"pred": "bbox_preds", "target": "bbox_targets",
         "weight": "bbox_weights", "avg_factor": "num_total_pos"},
    ]
    return JointLoss(losses, mappings, ["loss_cls", "loss_iou", "loss_bbox"],
                     [CLS_W, IOU_W, BBOX_W], normalize_weights=False)


@pytest.mark.parametrize("seed,num_valid", [(0, 5), (2, 1), (4, 8)])
def test_layer_loss_matches_torch_oracle(seed, num_valid):
    cls_scores, bbox_preds, gt_xyxy_px, labels = _inputs(seed, num_valid)
    head = _head()
    joint = _detr_joint_loss()

    total, tagged = head.loss(
        joint,
        jnp.asarray(cls_scores)[None],            # (B=1, Q, C+1) single layer
        jnp.asarray(bbox_preds)[None],
        jnp.asarray(gt_xyxy_px)[None],
        jnp.asarray(labels)[None],
        img_shape=IMG)

    assign = _oracle_match(cls_scores, bbox_preds, gt_xyxy_px, labels)
    with torch.no_grad():
        o_total, o_tagged = _oracle_loss(cls_scores, bbox_preds, gt_xyxy_px,
                                         labels, assign)

    np.testing.assert_allclose(float(total), float(o_total), rtol=1e-4)
    for k in ("loss_cls", "loss_bbox", "loss_iou"):
        np.testing.assert_allclose(float(tagged[k]), float(o_tagged[k]),
                                   rtol=1e-4, err_msg=k)


def test_deep_supervision_sums_per_layer_losses():
    """The (Lyr, ...) stacked path must equal the sum of per-layer oracles."""
    cls0, bbox0, gt, labels = _inputs(7, 4)
    cls1, bbox1, _, _ = _inputs(8, 4)
    head = _head()
    joint = _detr_joint_loss()
    total, tagged = head.loss(
        joint,
        jnp.stack([jnp.asarray(cls0), jnp.asarray(cls1)])[:, None],
        jnp.stack([jnp.asarray(bbox0), jnp.asarray(bbox1)])[:, None],
        jnp.asarray(gt)[None], jnp.asarray(labels)[None], img_shape=IMG)

    expect = 0.0
    for cls, bbox in ((cls0, bbox0), (cls1, bbox1)):
        assign = _oracle_match(cls, bbox, gt, labels)
        with torch.no_grad():
            t, _ = _oracle_loss(cls, bbox, gt, labels, assign)
        expect += float(t)
    np.testing.assert_allclose(float(total), expect, rtol=1e-4)
    assert "d0.loss_cls" in tagged and "loss_cls" in tagged
