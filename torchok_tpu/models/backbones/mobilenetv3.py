"""MobileNetV3 / FBNetV3 / LCNet backbones (reference capability:
torchok/models/backbones/mobilenetv3.py:108 — timm-derived torch).

Same stage-table builder as the EfficientNet family, with hard-swish /
hard-sigmoid gating and the efficient-head layout (final 1x1 conv applied
pre-pooling as the backbone output).
"""
from __future__ import annotations

import math
from typing import Any, List, Tuple

import flax.linen as nn
import jax.numpy as jnp

from torchok_tpu.constructor import BACKBONES
from torchok_tpu.models.base import BaseBackbone
from torchok_tpu.models.backbones.efficientnet_blocks import (
    ACTS, BLOCKS, _bn, _conv, round_channels,
)
from torchok_tpu.utils.pretrained import maybe_load_pretrained

# (block, repeats, kernel, stride, exp_ratio, channels, se_ratio, act)
MOBILENETV3_LARGE_ARCH = (
    ("ds", 1, 3, 1, 1.0, 16, 0.0, "relu"),
    ("ir", 2, 3, 2, 4.0, 24, 0.0, "relu"),
    ("ir", 3, 5, 2, 3.0, 40, 0.25, "relu"),
    ("ir", 4, 3, 2, 6.0, 80, 0.0, "hard_swish"),
    ("ir", 2, 3, 1, 6.0, 112, 0.25, "hard_swish"),
    ("ir", 3, 5, 2, 6.0, 160, 0.25, "hard_swish"),
)

MOBILENETV3_SMALL_ARCH = (
    ("ds", 1, 3, 2, 1.0, 16, 0.25, "relu"),
    ("ir", 2, 3, 2, 4.5, 24, 0.0, "relu"),
    ("ir", 3, 5, 2, 6.0, 40, 0.25, "hard_swish"),
    ("ir", 2, 3, 1, 6.0, 48, 0.25, "hard_swish"),
    ("ir", 3, 5, 2, 6.0, 96, 0.25, "hard_swish"),
)

LCNET_ARCH = (
    ("ds", 1, 3, 1, 1.0, 32, 0.0, "hard_swish"),
    ("ds", 2, 3, 2, 1.0, 64, 0.0, "hard_swish"),
    ("ds", 2, 3, 2, 1.0, 128, 0.0, "hard_swish"),
    ("ds", 1, 3, 2, 1.0, 256, 0.0, "hard_swish"),
    ("ds", 5, 5, 1, 1.0, 256, 0.0, "hard_swish"),
    ("ds", 2, 5, 2, 1.0, 512, 0.25, "hard_swish"),
)


class MobileNetV3(BaseBackbone):
    arch: Tuple = MOBILENETV3_LARGE_ARCH
    width_mult: float = 1.0
    in_channels: int = 3
    stem_size: int = 16
    num_features: int = 960
    act: str = "hard_swish"
    se_gate: str = "hard_sigmoid"
    drop_path_rate: float = 0.0
    dtype: Any = None

    def _scaled_arch(self) -> List[Tuple]:
        return [(b, r, k, s, e, round_channels(c, self.width_mult), se, act)
                for (b, r, k, s, e, c, se, act) in self.arch]

    @property
    def _stem_chs(self) -> int:
        return round_channels(self.stem_size, self.width_mult)

    @property
    def _head_chs(self) -> int:
        return round_channels(self.num_features, self.width_mult) \
            if self.width_mult > 1.0 else self.num_features

    @property
    def out_channels(self) -> int:
        return self._head_chs

    @property
    def out_encoder_channels(self) -> Tuple[int, ...]:
        chans = []
        cur = self._stem_chs
        for (b, r, k, s, e, c, se, act) in self._scaled_arch():
            if s > 1:
                chans.append(cur)
            cur = c
        chans.append(self._head_chs)
        return tuple(chans)

    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        return self.forward_features(x, train)[-1]

    @nn.compact
    def forward_features(self, x: jnp.ndarray, train: bool = False) -> List[jnp.ndarray]:
        inp = x
        scaled = self._scaled_arch()
        total_blocks = sum(r for (_, r, *_rest) in scaled)

        x = _conv(self._stem_chs, 3, 2, name="conv_stem", dtype=self.dtype)(x)
        x = _bn(train, "bn1", self.dtype)(x)
        x = ACTS[self.act](x)

        feats = []
        block_idx = 0
        for stage_idx, (block, repeats, k, s, e, c, se, act) in enumerate(scaled):
            for b in range(repeats):
                stride = s if b == 0 else 1
                if b == 0 and s > 1:
                    feats.append(x)
                dpr = self.drop_path_rate * block_idx / max(total_blocks - 1, 1)
                cls = BLOCKS[block]
                kwargs = dict(out_chs=c, kernel=k, stride=stride, act=act,
                              se_ratio=se, se_gate=self.se_gate,
                              drop_path_rate=dpr, dtype=self.dtype,
                              name=f"blocks_{stage_idx}_{b}")
                if block == "ir":
                    kwargs["exp_ratio"] = e
                    kwargs["se_from_exp"] = True
                x = cls(**kwargs)(x, train)
                block_idx += 1
        x = _conv(self._head_chs, 1, name="conv_head", dtype=self.dtype)(x)
        x = _bn(train, "bn2", self.dtype)(x)
        x = ACTS[self.act](x)
        feats.append(x)
        return [inp] + feats

    def get_stages(self, stage: int) -> List[str]:
        prefixes = ["conv_stem", "bn1"]
        for i in range(stage):
            prefixes.append(f"blocks_{i}_")
        return prefixes


def _entry(name: str, **cfg):
    def fn(pretrained: bool = False, in_channels: int = 3, **kwargs) -> MobileNetV3:
        params = dict(cfg)
        params.update(kwargs)
        model = MobileNetV3(in_channels=in_channels, **params)
        if pretrained:
            maybe_load_pretrained(model, name)
        return model
    fn.__name__ = name
    fn.__doc__ = f"MobileNetV3-family variant '{name}'."
    BACKBONES.register_class(fn, name=name)
    return fn


_VARIANTS = {
    "mobilenetv3_large_075": dict(width_mult=0.75),
    "mobilenetv3_large_100": dict(width_mult=1.0),
    "mobilenetv3_rw": dict(width_mult=1.0),
    "mobilenetv3_small_050": dict(arch=MOBILENETV3_SMALL_ARCH, width_mult=0.5,
                                  num_features=576),
    "mobilenetv3_small_075": dict(arch=MOBILENETV3_SMALL_ARCH, width_mult=0.75,
                                  num_features=576),
    "mobilenetv3_small_100": dict(arch=MOBILENETV3_SMALL_ARCH, width_mult=1.0,
                                  num_features=576),
    "tf_mobilenetv3_large_100": dict(width_mult=1.0),
    "tf_mobilenetv3_small_100": dict(arch=MOBILENETV3_SMALL_ARCH, width_mult=1.0,
                                     num_features=576),
    "lcnet_035": dict(arch=LCNET_ARCH, width_mult=0.35, stem_size=16, num_features=1280),
    "lcnet_050": dict(arch=LCNET_ARCH, width_mult=0.5, stem_size=16, num_features=1280),
    "lcnet_075": dict(arch=LCNET_ARCH, width_mult=0.75, stem_size=16, num_features=1280),
    "lcnet_100": dict(arch=LCNET_ARCH, width_mult=1.0, stem_size=16, num_features=1280),
    "lcnet_150": dict(arch=LCNET_ARCH, width_mult=1.5, stem_size=16, num_features=1280),
}

# "minimal" variants: all-3x3 kernels, no SE, plain relu (the TF minimalistic
# ports); derived mechanically from the base tables
def _minimalize(arch):
    return tuple((b, r, 3, s, e, c, 0.0, "relu")
                 for (b, r, k, s, e, c, _se, _act) in arch)


_VARIANTS.update({
    "tf_mobilenetv3_large_075": dict(width_mult=0.75),
    "tf_mobilenetv3_small_075": dict(arch=MOBILENETV3_SMALL_ARCH, width_mult=0.75,
                                     num_features=576),
    "tf_mobilenetv3_large_minimal_100": dict(
        arch=_minimalize(MOBILENETV3_LARGE_ARCH), width_mult=1.0, act="relu"),
    "tf_mobilenetv3_small_minimal_100": dict(
        arch=_minimalize(MOBILENETV3_SMALL_ARCH), width_mult=1.0, act="relu",
        num_features=576),
    # weight-provenance variants (ImageNet-21k MIIL pretraining)
    "mobilenetv3_large_100_miil": dict(width_mult=1.0),
    "mobilenetv3_large_100_miil_in21k": dict(width_mult=1.0),
})

for _name, _cfg in _VARIANTS.items():
    _entry(_name, **_cfg)
