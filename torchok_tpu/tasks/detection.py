"""SingleStageDetectionTask (reference: torchok/tasks/detection.py:13-173).

backbone features[-num_scales:] -> detection neck -> bbox head. Control
inversion preserved: the head owns loss computation via
``bbox_head.loss(joint_loss, **outputs)`` (reference detection.py:130-140)
and box decoding via ``get_bboxes``. Predictions are decoded in the eval
path only (train-time decoding every step is the reference's behavior but a
pure metric cost; our MAP metric consumes padded arrays).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from torchok_tpu.constructor import BACKBONES, DETECTION_NECKS, HEADS, TASKS
from torchok_tpu.constructor.config import ConfigNode
from torchok_tpu.tasks.base import BaseTask


class DetectionModel(nn.Module):
    backbone: nn.Module
    neck: Optional[nn.Module]
    bbox_head: nn.Module
    num_scales: int = 4
    decode_predictions: bool = False

    def _neck_forward(self, x, train: bool):
        features = self.backbone.forward_features(x, train=train)[-self.num_scales:]
        if self.neck is None:
            return features
        if getattr(self.neck, "requires_image", False):
            # recursive necks (RFP) re-run their own backbone on the image
            return self.neck([x] + features, train=train)
        return self.neck(features, train=train)

    @nn.compact
    def __call__(self, batch: Dict[str, Any], train: bool = False) -> Dict[str, Any]:
        x = batch["image"]
        neck_out = self._neck_forward(x, train)
        head_out = self.bbox_head(neck_out, train=train)
        output = self.bbox_head.format_dict(head_out)
        output["img_shape"] = jnp.asarray(x.shape[1:3])
        if "bboxes" in batch:
            output["gt_bboxes"] = batch["bboxes"]
            output["gt_labels"] = batch["label"]
        if not train or self.decode_predictions:
            preds = self.bbox_head.get_bboxes(
                **{k: v for k, v in output.items()
                   if k not in ("img_shape", "gt_bboxes", "gt_labels")},
                img_shape=tuple(x.shape[1:3]))
            output["prediction_bboxes"] = preds["bboxes"]
            output["prediction_scores"] = preds["scores"]
            output["prediction_labels"] = preds["labels"]
            # reference-style dict outputs for the mAP metrics' preds/target
            # mapping (padded arrays instead of ragged per-image lists)
            output["prediction"] = preds
            if "bboxes" in batch:
                output["target"] = {"bboxes": batch["bboxes"],
                                    "labels": batch["label"]}
        return output

    def forward(self, image: jnp.ndarray):
        neck_out = self._neck_forward(image, train=False)
        head_out = self.bbox_head(neck_out, train=False)
        preds = self.bbox_head.get_bboxes(
            **self.bbox_head.format_dict(head_out),
            img_shape=tuple(image.shape[1:3]))
        return preds["bboxes"], preds["scores"], preds["labels"]


@TASKS.register_class
class SingleStageDetectionTask(BaseTask):
    def __init__(self, hparams: ConfigNode, backbone_name: str,
                 head_name: str, neck_name: Optional[str] = None,
                 num_scales: int = 4,
                 backbone_params: Optional[dict] = None,
                 neck_params: Optional[dict] = None,
                 head_params: Optional[dict] = None,
                 inputs: Optional[list] = None, **kwargs):
        super().__init__(hparams, **kwargs)
        dtype = self.compute_dtype

        bp = dict(backbone_params or {})
        self.pretrained_name = backbone_name if bp.get("pretrained") else None
        # reference surface: skip shape-bound rel-pos tables when told to
        self.pretrained_drop_keys = (
            () if bp.get("load_relative_position_bias_table", True)
            else ("relative_position_bias_table",))
        self._backbone = BACKBONES.get(backbone_name)(**{**bp, "dtype": dtype})

        enc = tuple(self._backbone.out_encoder_channels)[-num_scales:]
        if neck_name:
            np_ = dict(neck_params or {})
            neck = DETECTION_NECKS.get(neck_name)(in_channels=enc, dtype=dtype,
                                                  **{k: v for k, v in np_.items()
                                                     if k != "in_channels"})
            head_in = neck.out_channels
        else:
            neck = None
            head_in = enc[-1]

        hp = dict(head_params or {})
        hp.setdefault("in_channels", head_in)
        self.bbox_head = HEADS.get(head_name)(dtype=dtype, **hp)

        self.model = DetectionModel(backbone=self._backbone, neck=neck,
                                    bbox_head=self.bbox_head,
                                    num_scales=num_scales)

    def compute_loss(self, outputs: Dict[str, Any]):
        """Head-owned loss routing (reference detection.py:133)."""
        return self.bbox_head.loss(self.losses, **outputs)

    def as_module(self) -> nn.Module:
        return self.model
