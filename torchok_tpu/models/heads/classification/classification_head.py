"""Classification head (reference:
torchok/models/heads/classification/classification_head.py:10-40).

Returns raw logits; squeezes the channel dim for ``num_classes == 1``
(binary classification)."""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from torchok_tpu.constructor import HEADS
from torchok_tpu.models.base import BaseModel


@HEADS.register_class
class ClassificationHead(BaseModel):
    in_channels: int = 0
    num_classes: int = 0
    drop_rate: float = 0.0
    bias: bool = True
    dtype: Any = None

    @property
    def out_channels(self) -> int:
        return self.num_classes

    @nn.compact
    def __call__(self, x: jnp.ndarray, target: Optional[jnp.ndarray] = None,
                 train: bool = False) -> jnp.ndarray:
        if self.drop_rate > 0.0:
            x = nn.Dropout(self.drop_rate, deterministic=not train)(x)
        x = nn.Dense(self.num_classes, use_bias=self.bias, dtype=self.dtype,
                     name="fc")(x)
        if self.num_classes == 1:
            x = x[..., 0]
        return x
