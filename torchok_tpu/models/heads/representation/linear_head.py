"""Dropout + linear representation head
(reference: torchok/models/heads/representation/linear_head.py:11)."""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from torchok_tpu.constructor import HEADS
from torchok_tpu.models.base import BaseModel


@HEADS.register_class
class LinearHead(BaseModel):
    in_channels: int = 0
    out_channels: int = 0
    drop_rate: float = 0.0
    bias: bool = True
    normalize: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, target: Optional[jnp.ndarray] = None,
                 train: bool = False) -> jnp.ndarray:
        if self.drop_rate > 0.0:
            x = nn.Dropout(self.drop_rate, deterministic=not train)(x)
        x = nn.Dense(self.out_channels, use_bias=self.bias, dtype=self.dtype,
                     name="fc")(x)
        if self.normalize:
            x = x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-12)
        return x
