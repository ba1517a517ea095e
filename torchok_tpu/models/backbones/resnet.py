"""ResNet / ResNeXt / SE-ResNet / ECA-ResNet backbone family.

TPU-native Flax implementation covering the variant space of the reference
family (reference: torchok/models/backbones/resnet.py:408 — timm-derived
torch code). Re-designed for NHWC layout and XLA: static shapes, fused
conv+BN+act epilogues left to the compiler, grouped conv via
``feature_group_count``.

Variant entrypoints are registered in BACKBONES; ``pretrained=True`` loads
weights from the local cache dir if present and otherwise falls back to
random init with a warning (this environment has no network egress).
"""
from __future__ import annotations

import logging
import math
from functools import partial
from typing import Any, Callable, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from torchok_tpu.constructor import BACKBONES
from torchok_tpu.models.base import BaseBackbone
from torchok_tpu.models.modules.blocks.se import SEModule, EcaModule
from torchok_tpu.ops.common import DropPath
from torchok_tpu.ops.image import avg_pool, blur_pool, max_pool
from torchok_tpu.utils.pretrained import maybe_load_pretrained

logger = logging.getLogger(__name__)

_conv_init = nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal")


def _bn(train: bool, name: str, zero_init: bool = False, dtype=None) -> nn.BatchNorm:
    return nn.BatchNorm(
        use_running_average=not train, momentum=0.9, epsilon=1e-5,
        scale_init=nn.initializers.zeros if zero_init else nn.initializers.ones,
        dtype=dtype, name=name,
    )


def _norm(kind: str, train: bool, name: str, zero_init: bool = False, dtype=None):
    """'bn' (default) or 'gn' (resnet*_gn variants: GroupNorm(32))."""
    if kind == "gn":
        return nn.GroupNorm(
            num_groups=32,
            scale_init=nn.initializers.zeros if zero_init else nn.initializers.ones,
            dtype=dtype, name=name)
    return _bn(train, name, zero_init, dtype)


def _conv(features: int, kernel: int, stride: int = 1, dilation: int = 1,
          groups: int = 1, name: str = "conv", dtype=None) -> nn.Conv:
    pad = (kernel - 1) // 2 * dilation
    return nn.Conv(
        features, (kernel, kernel), strides=(stride, stride),
        padding=((pad, pad), (pad, pad)), kernel_dilation=(dilation, dilation),
        feature_group_count=groups, use_bias=False,
        kernel_init=_conv_init, dtype=dtype, name=name,
    )


def stem7x7_to_space_to_depth(w7):
    """Transform a [7,7,C,F] HWIO stem kernel into the [4,4,4C,F] kernel the
    ``space_to_depth_stem`` path expects, preserving the conv output EXACTLY.

    The 7x7/s2/pad3 conv at output row i reads original rows r = 2i-3..2i+3.
    In 2x2 space-to-depth coordinates r = 2*(i-2+u) + a with kernel position
    u in 0..3 and block offset a in 0..1, so tap dh = 2u+a-1; (u=0, a=0)
    lands outside the 7-tap kernel and becomes the zero row/col of the padded
    8x8 kernel. Channel packing matches the model's
    reshape(n,h/2,2,w/2,2,c)->transpose->(a*2+b)*c+ch layout.
    """
    w7 = np.asarray(w7)
    if w7.shape[:2] != (7, 7):
        raise ValueError(f"expected a [7,7,C,F] kernel, got {w7.shape}")
    c, f = w7.shape[2], w7.shape[3]
    wp = np.pad(w7, ((1, 0), (1, 0), (0, 0), (0, 0)))
    return np.ascontiguousarray(
        wp.reshape(4, 2, 4, 2, c, f).transpose(0, 2, 1, 3, 4, 5)
          .reshape(4, 4, 4 * c, f))


class Downsample(nn.Module):
    out_channels: int
    stride: int = 1
    dilation: int = 1
    avg_down: bool = False
    kernel_size: int = 1
    norm: str = "bn"
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.avg_down and self.stride > 1:
            x = avg_pool(x, window=self.stride, stride=self.stride, padding=0)
            x = _conv(self.out_channels, 1, 1, name="conv", dtype=self.dtype)(x)
        else:
            x = _conv(self.out_channels, self.kernel_size, self.stride,
                      dilation=self.dilation if self.kernel_size > 1 else 1,
                      name="conv", dtype=self.dtype)(x)
        x = _norm(self.norm, train, "bn", dtype=self.dtype)(x)
        return x


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    aa: bool = False
    norm: str = "bn"
    dilation: int = 1
    first_dilation: Optional[int] = None
    use_downsample: bool = False
    avg_down: bool = False
    down_kernel_size: int = 1
    reduce_first: int = 1
    attn: Optional[str] = None
    drop_path_rate: float = 0.0
    zero_init_last: bool = True
    dtype: Any = None

    expansion: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        shortcut = x
        first_planes = self.planes // self.reduce_first
        out_planes = self.planes * self.expansion
        fd = self.first_dilation or self.dilation

        use_aa = self.aa and self.stride > 1
        out = _conv(first_planes, 3, 1 if use_aa else self.stride, fd,
                    name="conv1", dtype=self.dtype)(x)
        out = _norm(self.norm, train, "bn1", dtype=self.dtype)(out)
        out = nn.relu(out)
        if use_aa:
            out = blur_pool(out, stride=self.stride)
        out = _conv(out_planes, 3, 1, self.dilation, name="conv2", dtype=self.dtype)(out)
        out = _norm(self.norm, train, "bn2", zero_init=self.zero_init_last, dtype=self.dtype)(out)

        if self.attn == "se":
            out = SEModule(dtype=self.dtype, name="se")(out)
        elif self.attn == "eca":
            out = EcaModule(dtype=self.dtype, name="se")(out)

        out = DropPath(self.drop_path_rate, name="drop_path")(out, train)
        if self.use_downsample:
            shortcut = Downsample(out_planes, self.stride, self.dilation,
                                  self.avg_down, self.down_kernel_size,
                                  norm=self.norm, dtype=self.dtype,
                                  name="downsample")(x, train)
        return nn.relu(out + shortcut)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    aa: bool = False
    norm: str = "bn"
    dilation: int = 1
    first_dilation: Optional[int] = None
    use_downsample: bool = False
    avg_down: bool = False
    down_kernel_size: int = 1
    reduce_first: int = 1
    cardinality: int = 1
    base_width: int = 64
    attn: Optional[str] = None
    drop_path_rate: float = 0.0
    zero_init_last: bool = True
    dtype: Any = None

    expansion: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        shortcut = x
        width = int(math.floor(self.planes * (self.base_width / 64)) * self.cardinality)
        first_planes = width // self.reduce_first
        out_planes = self.planes * self.expansion
        fd = self.first_dilation or self.dilation

        use_aa = self.aa and self.stride > 1
        out = _conv(first_planes, 1, name="conv1", dtype=self.dtype)(x)
        out = _norm(self.norm, train, "bn1", dtype=self.dtype)(out)
        out = nn.relu(out)
        out = _conv(width, 3, 1 if use_aa else self.stride, fd,
                    groups=self.cardinality, name="conv2", dtype=self.dtype)(out)
        out = _norm(self.norm, train, "bn2", dtype=self.dtype)(out)
        out = nn.relu(out)
        if use_aa:
            out = blur_pool(out, stride=self.stride)
        out = _conv(out_planes, 1, name="conv3", dtype=self.dtype)(out)
        out = _norm(self.norm, train, "bn3", zero_init=self.zero_init_last, dtype=self.dtype)(out)

        if self.attn == "se":
            out = SEModule(dtype=self.dtype, name="se")(out)
        elif self.attn == "eca":
            out = EcaModule(dtype=self.dtype, name="se")(out)

        out = DropPath(self.drop_path_rate, name="drop_path")(out, train)
        if self.use_downsample:
            shortcut = Downsample(out_planes, self.stride, self.dilation,
                                  self.avg_down, self.down_kernel_size,
                                  norm=self.norm, dtype=self.dtype,
                                  name="downsample")(x, train)
        return nn.relu(out + shortcut)


class ResNet(BaseBackbone):
    """Configurable ResNet-family backbone (NHWC).

    Feature pyramid (``forward_features``): ``[input, act1, layer1..layer4]``
    with strides (1, 2, 4, 8, 16, 32) at ``output_stride=32``.
    """
    block: str = "basic"  # 'basic' | 'bottleneck'
    layers: Tuple[int, ...] = (2, 2, 2, 2)
    in_channels: int = 3
    output_stride: int = 32
    cardinality: int = 1
    base_width: int = 64
    stem_width: int = 64
    stem_type: str = ""  # '' | 'deep' | 'deep_tiered'
    replace_stem_pool: bool = False
    block_reduce_first: int = 1
    down_kernel_size: int = 1
    avg_down: bool = False
    attn: Optional[str] = None  # None | 'se' | 'eca'
    aa: bool = False  # anti-aliased (blur-pool) strided convs (resnetblur/aa)
    norm: str = "bn"  # 'bn' | 'gn' (resnet*_gn variants)
    space_to_depth_stem: bool = False  # TPU: exact 7x7/s2 -> s2d + 4x4/s1
    drop_path_rate: float = 0.0
    zero_init_last: bool = True
    dtype: Any = None

    @property
    def _block_cls(self):
        return BasicBlock if self.block == "basic" else Bottleneck

    @property
    def _expansion(self) -> int:
        return self._block_cls.expansion

    @property
    def _stem_channels(self) -> int:
        return self.stem_width * 2 if "deep" in self.stem_type else self.stem_width

    @property
    def out_encoder_channels(self) -> Tuple[int, ...]:
        exp = self._expansion
        return (self._stem_channels, 64 * exp, 128 * exp, 256 * exp, 512 * exp)

    @property
    def out_channels(self) -> int:
        return 512 * self._expansion

    def _stage_plan(self) -> List[dict]:
        """Static per-stage plan: (planes, stride, dilation, first_dilation)."""
        plan = []
        net_stride, dilation = 4, 1
        prev_dilation = 1
        for i, planes in enumerate((64, 128, 256, 512)):
            stride = 1 if i == 0 else 2
            if net_stride >= self.output_stride and stride > 1:
                dilation *= stride
                stride = 1
            else:
                net_stride *= stride
            plan.append(dict(planes=planes, stride=stride, dilation=dilation,
                             first_dilation=prev_dilation))
            prev_dilation = dilation
        return plan

    def _stem(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        if self.space_to_depth_stem and "deep" in self.stem_type:
            raise ValueError(
                "space_to_depth_stem applies to the plain 7x7 stem only "
                f"(stem_type={self.stem_type!r} uses 3x3 convs)")
        if "deep" in self.stem_type:
            if self.stem_type == "deep_tiered":
                chs = (3 * (self.stem_width // 4), self.stem_width, self.stem_width * 2)
            else:
                chs = (self.stem_width, self.stem_width, self.stem_width * 2)
            x = _conv(chs[0], 3, 2, name="conv1_0", dtype=self.dtype)(x)
            x = _bn(train, "bn1_0", dtype=self.dtype)(x)
            x = nn.relu(x)
            x = _conv(chs[1], 3, 1, name="conv1_1", dtype=self.dtype)(x)
            x = _bn(train, "bn1_1", dtype=self.dtype)(x)
            x = nn.relu(x)
            x = _conv(chs[2], 3, 1, name="conv1_2", dtype=self.dtype)(x)
        elif self.space_to_depth_stem:
            # MLPerf-style TPU stem: 2x2 space-to-depth, then a stride-1 4x4
            # conv — numerically IDENTICAL to the 7x7/s2/pad3 conv when the
            # kernel is `stem7x7_to_space_to_depth`-transformed (the 3-channel
            # 7x7 conv wastes MXU lanes; 12 input channels tile far better).
            n, h, w, c = x.shape
            if h % 2 or w % 2:
                raise ValueError(
                    f"space_to_depth_stem needs even input H/W, got {h}x{w}")
            z = x.reshape(n, h // 2, 2, w // 2, 2, c)
            z = z.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, w // 2, 4 * c)
            x = nn.Conv(self.stem_width, (4, 4), strides=(1, 1),
                        padding=((2, 1), (2, 1)), use_bias=False,
                        kernel_init=_conv_init, dtype=self.dtype, name="conv1")(z)
        else:
            x = nn.Conv(self.stem_width, (7, 7), strides=(2, 2),
                        padding=((3, 3), (3, 3)), use_bias=False,
                        kernel_init=_conv_init, dtype=self.dtype, name="conv1")(x)
        x = _norm(self.norm, train, "bn1", dtype=self.dtype)(x)
        x = nn.relu(x)
        return x

    def _stages(self, x: jnp.ndarray, train: bool,
                rfp_feats: Optional[List] = None) -> List[jnp.ndarray]:
        feats = []
        block_cls = self._block_cls
        in_planes = self._stem_channels
        total_blocks = sum(self.layers)
        block_idx = 0
        n_stages = len(self.layers)
        for stage_idx, (spec, depth) in enumerate(zip(self._stage_plan(), self.layers)):
            for b in range(depth):
                stride = spec["stride"] if b == 0 else 1
                needs_down = b == 0 and (
                    stride != 1 or in_planes != spec["planes"] * self._expansion
                )
                dpr = self.drop_path_rate * block_idx / max(total_blocks - 1, 1)
                kwargs = dict(
                    planes=spec["planes"], stride=stride, dilation=spec["dilation"],
                    first_dilation=spec["first_dilation"] if b == 0 else spec["dilation"],
                    use_downsample=needs_down, avg_down=self.avg_down,
                    down_kernel_size=self.down_kernel_size,
                    reduce_first=self.block_reduce_first,
                    attn=self.attn, aa=self.aa, norm=self.norm,
                    drop_path_rate=dpr,
                    zero_init_last=self.zero_init_last, dtype=self.dtype,
                    name=f"layer{stage_idx + 1}_{b}",
                )
                if block_cls is Bottleneck:
                    kwargs.update(cardinality=self.cardinality, base_width=self.base_width)
                x = block_cls(**kwargs)(x, train)
                block_idx += 1
            in_planes = spec["planes"] * self._expansion
            # DetectoRS-style recursive feedback (reference capability: mmdet
            # RFP re-runs the backbone with per-stage feedback,
            # torchok/models/necks/detection/mmdet_necks.py:6-20): the
            # feedback list aligns with the LAST len(rfp_feats) stages and is
            # injected through a zero-init 1x1 conv, so step 0 of the
            # recursion is exactly the plain backbone.
            if rfp_feats is not None:
                fb_idx = stage_idx - (n_stages - len(rfp_feats))
                if 0 <= fb_idx < len(rfp_feats) and rfp_feats[fb_idx] is not None:
                    fb = nn.Conv(x.shape[-1], (1, 1), use_bias=True,
                                 kernel_init=nn.initializers.zeros,
                                 bias_init=nn.initializers.zeros,
                                 dtype=self.dtype,
                                 name=f"rfp_conv{stage_idx + 1}")(
                        rfp_feats[fb_idx].astype(x.dtype))
                    x = nn.relu(x + fb)
            feats.append(x)
        return feats

    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        # XLA dead-code-eliminates the unused shallow pyramid entries.
        return self.forward_features(x, train)[-1]

    @nn.compact
    def forward_features(self, x: jnp.ndarray, train: bool = False,
                         rfp_feats: Optional[List] = None) -> List[jnp.ndarray]:
        inp = x
        x = self._stem(x, train)
        stem_feat = x
        if self.replace_stem_pool:
            x = _conv(self._stem_channels, 3, 2, name="stem_pool_conv", dtype=self.dtype)(x)
            x = _bn(train, "stem_pool_bn", dtype=self.dtype)(x)
            x = nn.relu(x)
        elif self.aa:
            # anti-aliased stem pool: dense max then blur-subsample
            x = max_pool(x, window=3, stride=1, padding=1)
            x = blur_pool(x, stride=2)
        else:
            x = max_pool(x, window=3, stride=2, padding=1)
        feats = self._stages(x, train, rfp_feats)
        return [inp, stem_feat] + feats

    def get_stages(self, stage: int) -> List[str]:
        prefixes = ["conv1", "bn1", "stem_pool"]
        for i in range(1, min(stage, 4) + 1):
            prefixes.append(f"layer{i}_")
        return prefixes


def _make_entry(name: str, **cfg):
    def entry(pretrained: bool = False, in_channels: int = 3, **kwargs) -> ResNet:
        params = dict(cfg)
        params.update(kwargs)
        model = ResNet(in_channels=in_channels, **params)
        if pretrained:
            maybe_load_pretrained(model, name)
        return model

    entry.__name__ = name
    entry.__doc__ = f"ResNet-family variant '{name}' (config: {cfg})."
    BACKBONES.register_class(entry, name=name)
    return entry


_B, _BT = "basic", "bottleneck"
_VARIANTS = {
    # classic
    "resnet10t": dict(block=_B, layers=(1, 1, 1, 1), stem_width=32, stem_type="deep_tiered", avg_down=True),
    "resnet14t": dict(block=_BT, layers=(1, 1, 1, 1), stem_width=32, stem_type="deep_tiered", avg_down=True),
    "resnet18": dict(block=_B, layers=(2, 2, 2, 2)),
    "resnet18d": dict(block=_B, layers=(2, 2, 2, 2), stem_width=32, stem_type="deep", avg_down=True),
    "resnet26": dict(block=_BT, layers=(2, 2, 2, 2)),
    "resnet26d": dict(block=_BT, layers=(2, 2, 2, 2), stem_width=32, stem_type="deep", avg_down=True),
    "resnet26t": dict(block=_BT, layers=(2, 2, 2, 2), stem_width=32, stem_type="deep_tiered", avg_down=True),
    "resnet34": dict(block=_B, layers=(3, 4, 6, 3)),
    "resnet34d": dict(block=_B, layers=(3, 4, 6, 3), stem_width=32, stem_type="deep", avg_down=True),
    "resnet50": dict(block=_BT, layers=(3, 4, 6, 3)),
    "resnet50d": dict(block=_BT, layers=(3, 4, 6, 3), stem_width=32, stem_type="deep", avg_down=True),
    "resnet101": dict(block=_BT, layers=(3, 4, 23, 3)),
    "resnet101d": dict(block=_BT, layers=(3, 4, 23, 3), stem_width=32, stem_type="deep", avg_down=True),
    "resnet152": dict(block=_BT, layers=(3, 8, 36, 3)),
    "resnet152d": dict(block=_BT, layers=(3, 8, 36, 3), stem_width=32, stem_type="deep", avg_down=True),
    "resnet200d": dict(block=_BT, layers=(3, 24, 36, 3), stem_width=32, stem_type="deep", avg_down=True),
    # wide
    "wide_resnet50_2": dict(block=_BT, layers=(3, 4, 6, 3), base_width=128),
    "wide_resnet101_2": dict(block=_BT, layers=(3, 4, 23, 3), base_width=128),
    # resnext
    "resnext50_32x4d": dict(block=_BT, layers=(3, 4, 6, 3), cardinality=32, base_width=4),
    "resnext50d_32x4d": dict(block=_BT, layers=(3, 4, 6, 3), cardinality=32, base_width=4,
                             stem_width=32, stem_type="deep", avg_down=True),
    "resnext101_32x4d": dict(block=_BT, layers=(3, 4, 23, 3), cardinality=32, base_width=4),
    "resnext101_32x8d": dict(block=_BT, layers=(3, 4, 23, 3), cardinality=32, base_width=8),
    "resnext101_64x4d": dict(block=_BT, layers=(3, 4, 23, 3), cardinality=64, base_width=4),
    # SE
    "seresnet18": dict(block=_B, layers=(2, 2, 2, 2), attn="se"),
    "seresnet34": dict(block=_B, layers=(3, 4, 6, 3), attn="se"),
    "seresnet50": dict(block=_BT, layers=(3, 4, 6, 3), attn="se"),
    "seresnet101": dict(block=_BT, layers=(3, 4, 23, 3), attn="se"),
    "seresnet152": dict(block=_BT, layers=(3, 8, 36, 3), attn="se"),
    "seresnext26d_32x4d": dict(block=_BT, layers=(2, 2, 2, 2), cardinality=32, base_width=4,
                               stem_width=32, stem_type="deep", avg_down=True, attn="se"),
    "seresnext50_32x4d": dict(block=_BT, layers=(3, 4, 6, 3), cardinality=32, base_width=4, attn="se"),
    "seresnext101_32x8d": dict(block=_BT, layers=(3, 4, 23, 3), cardinality=32, base_width=8, attn="se"),
    # ECA
    "ecaresnet26t": dict(block=_BT, layers=(2, 2, 2, 2), stem_width=32,
                         stem_type="deep_tiered", avg_down=True, attn="eca"),
    "ecaresnet50d": dict(block=_BT, layers=(3, 4, 6, 3), stem_width=32, stem_type="deep",
                         avg_down=True, attn="eca"),
    "ecaresnet50t": dict(block=_BT, layers=(3, 4, 6, 3), stem_width=32,
                         stem_type="deep_tiered", avg_down=True, attn="eca"),
    "ecaresnet101d": dict(block=_BT, layers=(3, 4, 23, 3), stem_width=32, stem_type="deep",
                          avg_down=True, attn="eca"),
    # ResNet-RS (replace_stem_pool, se)
    "resnetrs50": dict(block=_BT, layers=(3, 4, 6, 3), stem_width=32, stem_type="deep",
                       replace_stem_pool=True, avg_down=True, attn="se"),
    "resnetrs101": dict(block=_BT, layers=(3, 4, 23, 3), stem_width=32, stem_type="deep",
                        replace_stem_pool=True, avg_down=True, attn="se"),
    "resnetrs152": dict(block=_BT, layers=(3, 8, 36, 3), stem_width=32, stem_type="deep",
                        replace_stem_pool=True, avg_down=True, attn="se"),
    "resnetrs200": dict(block=_BT, layers=(3, 24, 36, 3), stem_width=32, stem_type="deep",
                        replace_stem_pool=True, avg_down=True, attn="se"),
    "resnetrs270": dict(block=_BT, layers=(4, 29, 53, 4), stem_width=32, stem_type="deep",
                        replace_stem_pool=True, avg_down=True, attn="se"),
    "resnetrs350": dict(block=_BT, layers=(4, 36, 72, 4), stem_width=32, stem_type="deep",
                        replace_stem_pool=True, avg_down=True, attn="se"),
    "resnetrs420": dict(block=_BT, layers=(4, 44, 87, 4), stem_width=32, stem_type="deep",
                        replace_stem_pool=True, avg_down=True, attn="se"),
    # remaining classic / tiered / gn
    "resnet200": dict(block=_BT, layers=(3, 24, 36, 3)),
    "resnet50t": dict(block=_BT, layers=(3, 4, 6, 3), stem_width=32,
                      stem_type="deep_tiered", avg_down=True),
    "resnet50_gn": dict(block=_BT, layers=(3, 4, 6, 3), norm="gn"),
    # anti-aliased (blur-pool) variants
    "resnetblur18": dict(block=_B, layers=(2, 2, 2, 2), aa=True),
    "resnetblur50": dict(block=_BT, layers=(3, 4, 6, 3), aa=True),
    "resnetblur50d": dict(block=_BT, layers=(3, 4, 6, 3), stem_width=32,
                          stem_type="deep", avg_down=True, aa=True),
    "resnetblur101d": dict(block=_BT, layers=(3, 4, 23, 3), stem_width=32,
                           stem_type="deep", avg_down=True, aa=True),
    "resnetaa50": dict(block=_BT, layers=(3, 4, 6, 3), aa=True),
    "resnetaa50d": dict(block=_BT, layers=(3, 4, 6, 3), stem_width=32,
                        stem_type="deep", avg_down=True, aa=True),
    "resnetaa101d": dict(block=_BT, layers=(3, 4, 23, 3), stem_width=32,
                         stem_type="deep", avg_down=True, aa=True),
    # SE additions
    "senet154": dict(block=_BT, layers=(3, 8, 36, 3), cardinality=64, base_width=4,
                     stem_type="deep", stem_width=64, down_kernel_size=3,
                     block_reduce_first=2, attn="se"),
    "seresnet50t": dict(block=_BT, layers=(3, 4, 6, 3), stem_width=32,
                        stem_type="deep_tiered", avg_down=True, attn="se"),
    "seresnet152d": dict(block=_BT, layers=(3, 8, 36, 3), stem_width=32,
                         stem_type="deep", avg_down=True, attn="se"),
    "seresnet200d": dict(block=_BT, layers=(3, 24, 36, 3), stem_width=32,
                         stem_type="deep", avg_down=True, attn="se"),
    "seresnet269d": dict(block=_BT, layers=(3, 30, 48, 8), stem_width=32,
                         stem_type="deep", avg_down=True, attn="se"),
    "seresnetaa50d": dict(block=_BT, layers=(3, 4, 6, 3), stem_width=32,
                          stem_type="deep", avg_down=True, attn="se", aa=True),
    "seresnext26t_32x4d": dict(block=_BT, layers=(2, 2, 2, 2), cardinality=32,
                               base_width=4, stem_width=32,
                               stem_type="deep_tiered", avg_down=True, attn="se"),
    "seresnext101_32x4d": dict(block=_BT, layers=(3, 4, 23, 3), cardinality=32,
                               base_width=4, attn="se"),
    "seresnext101d_32x8d": dict(block=_BT, layers=(3, 4, 23, 3), cardinality=32,
                                base_width=8, stem_width=32, stem_type="deep",
                                avg_down=True, attn="se"),
    "seresnextaa101d_32x8d": dict(block=_BT, layers=(3, 4, 23, 3), cardinality=32,
                                  base_width=8, stem_width=32, stem_type="deep",
                                  avg_down=True, attn="se", aa=True),
    # ECA additions
    "ecaresnet200d": dict(block=_BT, layers=(3, 24, 36, 3), stem_width=32,
                          stem_type="deep", avg_down=True, attn="eca"),
    "ecaresnet269d": dict(block=_BT, layers=(3, 30, 48, 8), stem_width=32,
                          stem_type="deep", avg_down=True, attn="eca"),
    "ecaresnetlight": dict(block=_BT, layers=(1, 1, 11, 3), stem_width=32,
                           avg_down=True, attn="eca"),
    "ecaresnext26t_32x4d": dict(block=_BT, layers=(2, 2, 2, 2), cardinality=32,
                                base_width=4, stem_width=32,
                                stem_type="deep_tiered", avg_down=True, attn="eca"),
    "ecaresnext50t_32x4d": dict(block=_BT, layers=(2, 2, 2, 2), cardinality=32,
                                base_width=4, stem_width=32,
                                stem_type="deep_tiered", avg_down=True, attn="eca"),
}

# weight-provenance alias (timm registers 26t and 26tn identically)
_VARIANTS["seresnext26tn_32x4d"] = _VARIANTS["seresnext26t_32x4d"]

for _name, _cfg in _VARIANTS.items():
    _make_entry(_name, **_cfg)


# Weight-variant aliases (reference registers ssl/swsl/ig/tv-prefixed
# entrypoints whose architecture equals a base variant; they differ only in
# pretrained weight provenance, resolved via the local weight cache here).
_WEIGHT_ALIASES = {
    "ssl_resnet18": "resnet18", "swsl_resnet18": "resnet18",
    "ssl_resnet50": "resnet50", "swsl_resnet50": "resnet50",
    "tv_resnet34": "resnet34", "tv_resnet50": "resnet50",
    "tv_resnet101": "resnet101", "tv_resnet152": "resnet152",
    "ssl_resnext50_32x4d": "resnext50_32x4d",
    "swsl_resnext50_32x4d": "resnext50_32x4d",
    "tv_resnext50_32x4d": "resnext50_32x4d",
    "ssl_resnext101_32x4d": "resnext101_32x4d",
    "swsl_resnext101_32x4d": "resnext101_32x4d",
    "ssl_resnext101_32x8d": "resnext101_32x8d",
    "swsl_resnext101_32x8d": "resnext101_32x8d",
    "ig_resnext101_32x8d": "resnext101_32x8d",
    "ssl_resnext101_32x16d": dict(block=_BT, layers=(3, 4, 23, 3), cardinality=32, base_width=16),
    "swsl_resnext101_32x16d": dict(block=_BT, layers=(3, 4, 23, 3), cardinality=32, base_width=16),
    "ig_resnext101_32x16d": dict(block=_BT, layers=(3, 4, 23, 3), cardinality=32, base_width=16),
    "ig_resnext101_32x32d": dict(block=_BT, layers=(3, 4, 23, 3), cardinality=32, base_width=32),
    "ig_resnext101_32x48d": dict(block=_BT, layers=(3, 4, 23, 3), cardinality=32, base_width=48),
}

for _alias, _base in _WEIGHT_ALIASES.items():
    _cfg2 = _VARIANTS[_base] if isinstance(_base, str) else _base
    _make_entry(_alias, **_cfg2)
