"""ClassificationTask (reference: torchok/tasks/classification.py:12-123).

Assembles backbone -> neck(opt) -> pooling(opt) -> head(opt), auto-wiring
``in_channels`` from the previous stage's static ``out_channels``. The
forward-with-gt outputs mirror the reference: ``embeddings``, ``prediction``
(when a head exists) and ``target`` passthrough.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax.numpy as jnp

from torchok_tpu.constructor import BACKBONES, HEADS, NECKS, POOLINGS, TASKS
from torchok_tpu.constructor.config import ConfigNode
from torchok_tpu.tasks.base import BaseTask


def forward_aux_keys(batch, output):
    """Retrieval-dataset auxiliaries flow through to the index-based meters
    (representation mode); the reference only supported the classification
    mode (group_labels=target) end to end."""
    for key in ("scores", "query_idxs", "group_labels"):
        if batch.get(key) is not None:
            output[key] = batch[key]
    return output


class ClassificationModel(nn.Module):
    backbone: nn.Module
    neck: Optional[nn.Module] = None
    pooling: Optional[nn.Module] = None
    head: Optional[nn.Module] = None

    @nn.compact
    def __call__(self, batch: Dict[str, Any], train: bool = False) -> Dict[str, Any]:
        x = batch["image"]
        target = batch.get("target")
        x = self.backbone(x, train=train)
        if self.neck is not None:
            x = self.neck(x, train=train)
        if self.pooling is not None:
            x = self.pooling(x, train=train)
        output = {"embeddings": x}
        if self.head is not None:
            output["prediction"] = self.head(x, target=target, train=train)
        if target is not None:
            output["target"] = target
        return forward_aux_keys(batch, output)

    def forward(self, image: jnp.ndarray) -> jnp.ndarray:
        """Inference path used for export (reference as_module semantics)."""
        x = self.backbone(image, train=False)
        if self.neck is not None:
            x = self.neck(x, train=False)
        if self.pooling is not None:
            x = self.pooling(x, train=False)
        if self.head is not None:
            x = self.head(x, train=False)
        return x


@TASKS.register_class
class ClassificationTask(BaseTask):
    def __init__(self, hparams: ConfigNode,
                 backbone_name: str,
                 pooling_name: Optional[str] = None,
                 neck_name: Optional[str] = None,
                 head_name: Optional[str] = None,
                 backbone_params: Optional[dict] = None,
                 neck_params: Optional[dict] = None,
                 pooling_params: Optional[dict] = None,
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

        neck = None
        in_channels = self._backbone.out_channels
        if neck_name:
            np_ = dict(neck_params or {})
            neck = NECKS.get(neck_name)(in_channels=in_channels, dtype=dtype, **np_)
            in_channels = neck.out_channels

        pooling = None
        if pooling_name:
            pp = dict(pooling_params or {})
            pooling = POOLINGS.get(pooling_name)(in_channels=in_channels, **pp)
            in_channels = pooling.out_channels

        head = None
        if head_name:
            hp = dict(head_params or {})
            head = HEADS.get(head_name)(in_channels=in_channels, dtype=dtype, **hp)

        self.model = ClassificationModel(backbone=self._backbone, neck=neck,
                                         pooling=pooling, head=head)

    def as_module(self) -> nn.Module:
        return self.model
