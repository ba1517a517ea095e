"""Global pooling heads (reference: torchok/models/poolings/classification/pooling.py:7-12).

Adaptive global pooling + flatten over NHWC feature maps. ``pooling_type``
matches the reference names: 'avg', 'max', 'catavgmax', 'avgmax'.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from torchok_tpu.constructor import POOLINGS
from torchok_tpu.models.base import BaseModel


@POOLINGS.register_class
class Pooling(BaseModel):
    in_channels: int = 0
    pooling_type: str = "avg"

    @property
    def out_channels(self) -> int:
        mult = 2 if self.pooling_type == "catavgmax" else 1
        return self.in_channels * mult

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        avg = jnp.mean(x, axis=(1, 2))
        if self.pooling_type == "avg":
            return avg
        mx = jnp.max(x, axis=(1, 2))
        if self.pooling_type == "max":
            return mx
        if self.pooling_type == "avgmax":
            return 0.5 * (avg + mx)
        if self.pooling_type == "catavgmax":
            return jnp.concatenate([avg, mx], axis=-1)
        raise ValueError(f"Unknown pooling_type {self.pooling_type!r}")
