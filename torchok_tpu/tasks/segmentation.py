"""SegmentationTask (reference: torchok/tasks/segmentation.py:12-98).

backbone.forward_features -> neck -> head; outputs {prediction, target}.
When the head emits (out, aux) in train mode (OCR head), the aux logits are
exposed as ``aux_prediction`` so YAML loss mappings can address them
directly (the torch reference passes the raw tuple through, which only
works when no loss consumes it).
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax.numpy as jnp

from torchok_tpu.constructor import BACKBONES, HEADS, NECKS, TASKS
from torchok_tpu.constructor.config import ConfigNode
from torchok_tpu.models.base import BackboneWrapper
from torchok_tpu.tasks.base import BaseTask


class SegmentationModel(nn.Module):
    backbone: nn.Module
    neck: nn.Module
    head: nn.Module

    @nn.compact
    def __call__(self, batch: Dict[str, Any], train: bool = False) -> Dict[str, Any]:
        x = batch["image"]
        target = batch.get("target")
        features = self.backbone.forward_features(x, train=train)
        neck_out = self.neck(features, train=train)
        prediction = self.head(neck_out, train=train)
        output = {}
        if isinstance(prediction, tuple):
            output["prediction"], output["aux_prediction"] = prediction
        else:
            output["prediction"] = prediction
        if target is not None:
            output["target"] = target
        return output

    def forward(self, image: jnp.ndarray) -> jnp.ndarray:
        features = self.backbone.forward_features(image, train=False)
        neck_out = self.neck(features, train=False)
        return self.head(neck_out, train=False)


@TASKS.register_class
class SegmentationTask(BaseTask):
    def __init__(self, hparams: ConfigNode,
                 backbone_name: str,
                 head_name: str,
                 neck_name: str,
                 backbone_params: Optional[dict] = None,
                 neck_params: Optional[dict] = None,
                 head_params: Optional[dict] = None,
                 inputs: Optional[list] = None,
                 **kwargs):
        super().__init__(hparams, **kwargs)
        dtype = self.compute_dtype

        bp = dict(backbone_params or {})
        self.pretrained_name = backbone_name if bp.get("pretrained") else None
        # reference surface: skip shape-bound rel-pos tables when told to
        self.pretrained_drop_keys = (
            () if bp.get("load_relative_position_bias_table", True)
            else ("relative_position_bias_table",))
        self._backbone = BACKBONES.get(backbone_name)(**{**bp, "dtype": dtype})

        np_ = dict(neck_params or {})
        neck = NECKS.get(neck_name)(
            in_channels=tuple(self._backbone.out_encoder_channels), dtype=dtype, **np_)

        hp = dict(head_params or {})
        head = HEADS.get(head_name)(in_channels=neck.out_channels, dtype=dtype, **hp)

        self.model = SegmentationModel(backbone=self._backbone, neck=neck, head=head)

    def as_module(self) -> nn.Module:
        return self.model
