"""Squeeze-excitation attention blocks (channel attention used by SE-ResNet,
EfficientNet, etc.)."""
from __future__ import annotations

from typing import Any, Callable, Optional

import flax.linen as nn
import jax.numpy as jnp


def make_divisible(v: float, divisor: int = 8, min_value: Optional[int] = None,
                   round_limit: float = 0.9) -> int:
    min_value = min_value or divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < round_limit * v:
        new_v += divisor
    return new_v


class SEModule(nn.Module):
    """Channel SE: global-avg-pool -> reduce -> expand -> sigmoid gate."""
    rd_ratio: float = 1.0 / 16
    rd_channels: Optional[int] = None
    rd_divisor: int = 8
    act: Callable = nn.relu
    gate: Callable = nn.sigmoid
    use_bias: bool = True  # timm SEModule(bias=...): gcvit's MbConv SE is bias-free
    round_limit: float = 0.9
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        channels = x.shape[-1]
        rd = self.rd_channels or make_divisible(
            channels * self.rd_ratio, self.rd_divisor,
            round_limit=self.round_limit)
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(rd, (1, 1), use_bias=self.use_bias, dtype=self.dtype, name="fc1")(s)
        s = self.act(s)
        s = nn.Conv(channels, (1, 1), use_bias=self.use_bias, dtype=self.dtype, name="fc2")(s)
        return x * self.gate(s)


class EcaModule(nn.Module):
    """Efficient channel attention: 1D conv over channel descriptor."""
    kernel_size: int = 3
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        s = jnp.mean(x, axis=(1, 2))  # (N, C)
        s = s[:, :, None]  # (N, C, 1): conv over the channel axis
        s = nn.Conv(1, (self.kernel_size,), padding="SAME", use_bias=False,
                    dtype=self.dtype, name="conv")(s)
        s = nn.sigmoid(s[:, :, 0])  # (N, C)
        return x * s[:, None, None, :]
