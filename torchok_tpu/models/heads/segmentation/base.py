"""Segmentation head (reference: torchok/models/heads/segmentation/base.py:12-41):
1x1 conv classifier + bilinear upsample to input size; consumes
``[input_image, features]``; squeezes channel dim for num_classes == 1."""
from __future__ import annotations

from typing import Any, List, Optional

import flax.linen as nn
import jax.numpy as jnp

from torchok_tpu.constructor import HEADS
from torchok_tpu.models.base import BaseModel
from torchok_tpu.ops.image import resize_bilinear


@HEADS.register_class
class SegmentationHead(BaseModel):
    in_channels: int = 0
    num_classes: int = 0
    do_interpolate: bool = True
    dtype: Any = None

    @property
    def out_channels(self) -> int:
        return self.num_classes

    @nn.compact
    def __call__(self, x: List[jnp.ndarray], target: Optional[jnp.ndarray] = None,
                 train: bool = False) -> jnp.ndarray:
        input_image, features = x
        logits = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                         name="classifier")(features)
        if self.do_interpolate:
            logits = resize_bilinear(logits, (input_image.shape[1], input_image.shape[2]))
        if self.num_classes == 1:
            logits = logits[..., 0]
        return logits
