"""Conv + BatchNorm + activation brick (reference: torchok/models/modules/bricks/convbnact.py:8).

NHWC Flax formulation; BN statistics are computed over (N, H, W) which under
GSPMD batch sharding are global (sync-BN for free).
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp

ModuleDef = Any


def _pair(v: Union[int, Tuple[int, int]]) -> Tuple[int, int]:
    return (v, v) if isinstance(v, int) else tuple(v)


class ConvBnAct(nn.Module):
    out_channels: int
    kernel_size: Union[int, Tuple[int, int]] = 3
    stride: Union[int, Tuple[int, int]] = 1
    padding: Optional[Union[int, str, Tuple[int, int]]] = None
    dilation: Union[int, Tuple[int, int]] = 1
    groups: int = 1
    use_bias: bool = False
    use_norm: bool = True
    act: Optional[Callable] = nn.relu
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        k = _pair(self.kernel_size)
        d = _pair(self.dilation)
        if self.padding is None:
            # 'same'-style padding for odd kernels (torch default k//2 behavior)
            pad = tuple(((kk - 1) // 2 * dd, (kk - 1) // 2 * dd) for kk, dd in zip(k, d))
        elif isinstance(self.padding, str):
            pad = self.padding
        else:
            p = _pair(self.padding)
            pad = tuple((pp, pp) for pp in p)
        x = nn.Conv(
            self.out_channels,
            kernel_size=k,
            strides=_pair(self.stride),
            padding=pad,
            kernel_dilation=d,
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            dtype=self.dtype,
            kernel_init=nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal"),
            name="conv",
        )(x)
        if self.use_norm:
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, name="bn",
            )(x)
        if self.act is not None:
            x = self.act(x)
        return x
