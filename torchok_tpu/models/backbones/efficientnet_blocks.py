"""Building blocks for the EfficientNet / MobileNetV3 / LCNet families
(reference capability: torchok/models/backbones/efficientnet.py,
mobilenetv3.py — timm-derived torch; re-designed here as NHWC Flax with a
compact stage-spec table instead of timm's string codec).
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from torchok_tpu.models.modules.blocks.se import SEModule, make_divisible
from torchok_tpu.ops.common import DropPath

_conv_init = nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal")


def hard_sigmoid(x):
    return nn.relu6(x + 3.0) / 6.0


def hard_swish(x):
    return x * hard_sigmoid(x)


ACTS = {
    "relu": nn.relu,
    "relu6": nn.relu6,
    "swish": nn.swish,
    "silu": nn.swish,
    "hard_swish": hard_swish,
    "hswish": hard_swish,
    "gelu": lambda x: nn.gelu(x, approximate=False),
}


def round_channels(channels: float, multiplier: float = 1.0, divisor: int = 8,
                   channel_min: Optional[int] = None) -> int:
    if not multiplier:
        return int(channels)
    return make_divisible(channels * multiplier, divisor, channel_min)


def _conv(features, kernel, stride=1, groups=1, name="conv", dtype=None):
    pad = (kernel - 1) // 2
    return nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                   padding=((pad, pad), (pad, pad)), feature_group_count=groups,
                   use_bias=False, kernel_init=_conv_init, dtype=dtype, name=name)


def _bn(train, name, dtype=None):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-3, dtype=dtype, name=name)


class ConvBnActBlock(nn.Module):
    """'cn' block: plain conv-bn-act."""
    out_chs: int
    kernel: int = 3
    stride: int = 1
    act: str = "swish"
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = _conv(self.out_chs, self.kernel, self.stride, name="conv", dtype=self.dtype)(x)
        x = _bn(train, "bn", self.dtype)(x)
        return ACTS[self.act](x)


class DepthwiseSeparable(nn.Module):
    """'ds' block: dw conv + SE + pw conv, residual when shapes allow."""
    out_chs: int
    kernel: int = 3
    stride: int = 1
    se_ratio: float = 0.0
    act: str = "swish"
    se_gate: str = "sigmoid"
    drop_path_rate: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_chs = x.shape[-1]
        shortcut = x
        x = _conv(in_chs, self.kernel, self.stride, groups=in_chs,
                  name="conv_dw", dtype=self.dtype)(x)
        x = _bn(train, "bn1", self.dtype)(x)
        x = ACTS[self.act](x)
        if self.se_ratio > 0:
            gate = hard_sigmoid if self.se_gate == "hard_sigmoid" else nn.sigmoid
            x = SEModule(rd_channels=make_divisible(in_chs * self.se_ratio),
                         act=ACTS[self.act], gate=gate, dtype=self.dtype, name="se")(x)
        x = _conv(self.out_chs, 1, name="conv_pw", dtype=self.dtype)(x)
        x = _bn(train, "bn2", self.dtype)(x)
        if self.stride == 1 and in_chs == self.out_chs:
            x = DropPath(self.drop_path_rate, name="drop_path")(x, train)
            x = x + shortcut
        return x


class InvertedResidual(nn.Module):
    """'ir' block (MBConv): pw expand + dw + SE + pw project."""
    out_chs: int
    kernel: int = 3
    stride: int = 1
    exp_ratio: float = 6.0
    se_ratio: float = 0.0
    act: str = "swish"
    se_gate: str = "sigmoid"
    se_from_exp: bool = False  # MNV3 computes rd from expanded chs
    drop_path_rate: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_chs = x.shape[-1]
        shortcut = x
        mid = make_divisible(in_chs * self.exp_ratio)
        if mid != in_chs:
            x = _conv(mid, 1, name="conv_pw", dtype=self.dtype)(x)
            x = _bn(train, "bn1", self.dtype)(x)
            x = ACTS[self.act](x)
        x = _conv(mid, self.kernel, self.stride, groups=mid,
                  name="conv_dw", dtype=self.dtype)(x)
        x = _bn(train, "bn2", self.dtype)(x)
        x = ACTS[self.act](x)
        if self.se_ratio > 0:
            base = mid if self.se_from_exp else in_chs
            gate = hard_sigmoid if self.se_gate == "hard_sigmoid" else nn.sigmoid
            x = SEModule(rd_channels=make_divisible(base * self.se_ratio),
                         act=ACTS[self.act] if not self.se_from_exp else nn.relu,
                         gate=gate, dtype=self.dtype, name="se")(x)
        x = _conv(self.out_chs, 1, name="conv_pwl", dtype=self.dtype)(x)
        x = _bn(train, "bn3", self.dtype)(x)
        if self.stride == 1 and in_chs == self.out_chs:
            x = DropPath(self.drop_path_rate, name="drop_path")(x, train)
            x = x + shortcut
        return x


class EdgeResidual(nn.Module):
    """'er' block (FusedMBConv, EfficientNet-V2/lite edge stages)."""
    out_chs: int
    kernel: int = 3
    stride: int = 1
    exp_ratio: float = 4.0
    se_ratio: float = 0.0
    act: str = "swish"
    drop_path_rate: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_chs = x.shape[-1]
        shortcut = x
        mid = make_divisible(in_chs * self.exp_ratio)
        x = _conv(mid, self.kernel, self.stride, name="conv_exp", dtype=self.dtype)(x)
        x = _bn(train, "bn1", self.dtype)(x)
        x = ACTS[self.act](x)
        if self.se_ratio > 0:
            x = SEModule(rd_channels=make_divisible(in_chs * self.se_ratio),
                         act=ACTS[self.act], dtype=self.dtype, name="se")(x)
        x = _conv(self.out_chs, 1, name="conv_pwl", dtype=self.dtype)(x)
        x = _bn(train, "bn2", self.dtype)(x)
        if self.stride == 1 and in_chs == self.out_chs:
            x = DropPath(self.drop_path_rate, name="drop_path")(x, train)
            x = x + shortcut
        return x


class MixedInvertedResidual(nn.Module):
    """'mx' block (MixNet MixConv): inverted residual whose depthwise stage
    splits channels into groups convolved with different kernel sizes."""
    out_chs: int
    kernel: Tuple[int, ...] = (3, 5, 7)
    stride: int = 1
    exp_ratio: float = 6.0
    se_ratio: float = 0.0
    act: str = "swish"
    se_gate: str = "sigmoid"
    drop_path_rate: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_chs = x.shape[-1]
        shortcut = x
        kernels = self.kernel if isinstance(self.kernel, (tuple, list)) else (self.kernel,)
        mid = make_divisible(in_chs * self.exp_ratio)
        if mid != in_chs:
            x = _conv(mid, 1, name="conv_pw", dtype=self.dtype)(x)
            x = _bn(train, "bn1", self.dtype)(x)
            x = ACTS[self.act](x)
        # split channels across kernel sizes (last chunk takes the remainder)
        n = len(kernels)
        base = mid // n
        splits = [base] * (n - 1) + [mid - base * (n - 1)]
        outs, start = [], 0
        for i, (k, ch) in enumerate(zip(kernels, splits)):
            part = x[..., start:start + ch]
            outs.append(_conv(ch, k, self.stride, groups=ch,
                              name=f"conv_dw_{i}", dtype=self.dtype)(part))
            start += ch
        x = jnp.concatenate(outs, axis=-1)
        x = _bn(train, "bn2", self.dtype)(x)
        x = ACTS[self.act](x)
        if self.se_ratio > 0:
            gate = hard_sigmoid if self.se_gate == "hard_sigmoid" else nn.sigmoid
            x = SEModule(rd_channels=make_divisible(in_chs * self.se_ratio),
                         act=ACTS[self.act], gate=gate, dtype=self.dtype, name="se")(x)
        x = _conv(self.out_chs, 1, name="conv_pwl", dtype=self.dtype)(x)
        x = _bn(train, "bn3", self.dtype)(x)
        if self.stride == 1 and in_chs == self.out_chs:
            x = DropPath(self.drop_path_rate, name="drop_path")(x, train)
            x = x + shortcut
        return x


BLOCKS = {
    "cn": ConvBnActBlock,
    "ds": DepthwiseSeparable,
    "ir": InvertedResidual,
    "er": EdgeResidual,
    "mx": MixedInvertedResidual,
}
