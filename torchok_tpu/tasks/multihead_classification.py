"""MultiHeadClassificationTask (reference:
torchok/tasks/multihead_classification.py:12-149).

Shared backbone(+pooling), N named heads. The reference selects batch rows
per head with boolean ``condition_*`` indexing — a dynamic shape, which XLA
cannot compile. TPU-native reformulation: every head runs on the full batch
(static shapes) and rows excluded by the condition get their target replaced
with ``ignore_index`` (-100), which the CrossEntropy/BCE losses and metrics
treat as masked — numerically equivalent to row selection for mean-reduced
losses over the selected rows.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional

import flax.linen as nn
import jax.numpy as jnp

from torchok_tpu.constructor import BACKBONES, HEADS, NECKS, POOLINGS, TASKS
from torchok_tpu.constructor.config import ConfigNode
from torchok_tpu.tasks.base import BaseTask

IGNORE_INDEX = -100


class MultiHeadModel(nn.Module):
    backbone: nn.Module
    pooling: Optional[nn.Module]
    heads: Dict[str, nn.Module]
    target_mapping: Dict[str, str]

    @nn.compact
    def __call__(self, batch: Dict[str, Any], train: bool = False) -> Dict[str, Any]:
        features = self.backbone(batch["image"], train=train)
        if self.pooling is not None:
            features = self.pooling(features, train=train)
        output = {"embeddings": features}
        for head_name, head in self.heads.items():
            target_name = self.target_mapping[head_name]
            head_target = batch.get(f"target_{target_name}")
            condition = batch.get(f"condition_{target_name}")
            if head_target is not None and condition is not None:
                cond = condition.astype(bool)
                if head_target.ndim == 1:
                    head_target = jnp.where(cond, head_target, IGNORE_INDEX)
                else:  # multilabel: zero out excluded rows and mark via mask key
                    head_target = jnp.where(cond[:, None], head_target, IGNORE_INDEX)
                output[f"condition_{target_name}"] = cond
            out = head(features, target=head_target, train=train)
            output[f"prediction_{head_name}"] = out
            if head_target is not None:
                output[f"target_{target_name}"] = head_target
        from torchok_tpu.tasks.classification import forward_aux_keys
        return forward_aux_keys(batch, output)

    def forward(self, image: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        features = self.backbone(image, train=False)
        if self.pooling is not None:
            features = self.pooling(features, train=False)
        return {name: head(features, train=False) for name, head in self.heads.items()}


@TASKS.register_class
class MultiHeadClassificationTask(BaseTask):
    def __init__(self, hparams: ConfigNode, backbone_name: str,
                 heads: List[Dict[str, Any]], neck_name: Optional[str] = None,
                 pooling_name: Optional[str] = None,
                 backbone_params: Optional[dict] = None,
                 neck_params: Optional[dict] = None,
                 pooling_params: Optional[dict] = None,
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

        in_channels = self._backbone.out_channels
        pooling = None
        if pooling_name:
            pp = dict(pooling_params or {})
            pooling = POOLINGS.get(pooling_name)(in_channels=in_channels, **pp)
            in_channels = pooling.out_channels

        head_modules: Dict[str, nn.Module] = {}
        target_mapping: Dict[str, str] = {}
        for head in heads:
            h = dict(head.to_dict() if hasattr(head, "to_dict") else head)
            head_modules[h["name"]] = HEADS.get(h["type"])(
                in_channels=in_channels, dtype=dtype, **dict(h.get("params") or {}))
            target_mapping[h["name"]] = h["target"]

        self.model = MultiHeadModel(backbone=self._backbone, pooling=pooling,
                                    heads=head_modules, target_mapping=target_mapping)

    def example_targets(self, batch_size):
        import jax.numpy as jnp
        return {f"target_{t}": jnp.zeros((batch_size,), jnp.int32)
                for t in self.model.target_mapping.values()}

    def as_module(self) -> nn.Module:
        return self.model
