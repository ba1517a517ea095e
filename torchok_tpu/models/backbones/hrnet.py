"""HRNet backbone (reference: torchok/models/backbones/hrnet.py:49-322 —
timm-derived torch; rebuilt as native Flax).

Contract parity: ``__call__`` returns the LIST of four multi-resolution
branch maps (strides 4/8/16/32); ``forward_features`` prepends the input
(reference hrnet.py:212-238); ``out_channels``/``out_encoder_channels`` are
the stage-4 branch widths. The HRNet necks consume this list.

TPU notes: every fuse layer is expressed with convs + bilinear resize on
NHWC; all branch math stays batched and static so XLA schedules the whole
multi-branch stage as one fused program.
"""
from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from torchok_tpu.constructor import BACKBONES
from torchok_tpu.models.base import BaseBackbone
from torchok_tpu.models.backbones.resnet import BasicBlock, Bottleneck, _bn, _conv
from torchok_tpu.ops.image import resize_bilinear
from torchok_tpu.utils.pretrained import maybe_load_pretrained


def _stage_cfg(modules, branches, block, blocks, channels):
    return dict(NUM_MODULES=modules, NUM_BRANCHES=branches, BLOCK=block,
                NUM_BLOCKS=blocks, NUM_CHANNELS=channels)


def _hrnet_cfg(stem, s1_blocks, s1_ch, s2, s3, s4):
    return dict(STEM_WIDTH=stem,
                STAGE1=_stage_cfg(1, 1, "BOTTLENECK", [s1_blocks], [s1_ch]),
                STAGE2=_stage_cfg(*s2), STAGE3=_stage_cfg(*s3), STAGE4=_stage_cfg(*s4))


def _w_cfg(w, s2_mods=1, s3_mods=4, s4_mods=3, blocks=4, s1_blocks=4):
    b = [blocks] * 4
    return _hrnet_cfg(
        64, s1_blocks, 64,
        (s2_mods, 2, "BASIC", b[:2], [w, 2 * w]),
        (s3_mods, 3, "BASIC", b[:3], [w, 2 * w, 4 * w]),
        (s4_mods, 4, "BASIC", b[:4], [w, 2 * w, 4 * w, 8 * w]),
    )


CFGS: Dict[str, Dict] = {
    "hrnet_w18_small": _hrnet_cfg(
        64, 1, 32,
        (1, 2, "BASIC", [2, 2], [16, 32]),
        (1, 3, "BASIC", [2, 2, 2], [16, 32, 64]),
        (1, 4, "BASIC", [2, 2, 2, 2], [16, 32, 64, 128])),
    "hrnet_w18_small_v2": _hrnet_cfg(
        64, 2, 64,
        (1, 2, "BASIC", [2, 2], [18, 36]),
        (3, 3, "BASIC", [2, 2, 2], [18, 36, 72]),
        (2, 4, "BASIC", [2, 2, 2, 2], [18, 36, 72, 144])),
    "hrnet_w18": _w_cfg(18),
    "hrnet_w30": _w_cfg(30),
    "hrnet_w32": _w_cfg(32),
    "hrnet_w40": _w_cfg(40),
    "hrnet_w44": _w_cfg(44),
    "hrnet_w48": _w_cfg(48),
    "hrnet_w64": _w_cfg(64),
}


class FuseLayer(nn.Module):
    """Multi-resolution fusion: every output branch sums adapted inputs."""
    in_channels: Sequence[int]
    out_channels: Sequence[int]
    dtype: Any = None

    @nn.compact
    def __call__(self, xs: List[jnp.ndarray], train: bool = False) -> List[jnp.ndarray]:
        outs = []
        for i, oc in enumerate(self.out_channels):
            acc = None
            for j, x in enumerate(xs):
                y = x
                if j > i:  # lower res -> upsample + 1x1 conv
                    y = _conv(oc, 1, name=f"fuse_{i}_{j}_conv", dtype=self.dtype)(y)
                    y = _bn(train, f"fuse_{i}_{j}_bn", dtype=self.dtype)(y)
                    y = resize_bilinear(y, (xs[i].shape[1], xs[i].shape[2]))
                elif j < i:  # higher res -> chain of stride-2 3x3 convs
                    for s in range(i - j):
                        last = s == i - j - 1
                        ch = oc if last else self.in_channels[j]
                        y = _conv(ch, 3, 2, name=f"fuse_{i}_{j}_{s}_conv",
                                  dtype=self.dtype)(y)
                        y = _bn(train, f"fuse_{i}_{j}_{s}_bn", dtype=self.dtype)(y)
                        if not last:
                            y = nn.relu(y)
                acc = y if acc is None else acc + y
            outs.append(nn.relu(acc))
        return outs


class HRModule(nn.Module):
    num_branches: int
    block: str
    num_blocks: Sequence[int]
    num_channels: Sequence[int]
    dtype: Any = None

    @nn.compact
    def __call__(self, xs: List[jnp.ndarray], train: bool = False) -> List[jnp.ndarray]:
        blk = BasicBlock if self.block == "BASIC" else Bottleneck
        exp = blk.expansion
        outs = []
        for b in range(self.num_branches):
            x = xs[b]
            for i in range(self.num_blocks[b]):
                planes = self.num_channels[b]
                needs_down = x.shape[-1] != planes * exp
                x = blk(planes=planes, stride=1, use_downsample=needs_down,
                        dtype=self.dtype, name=f"branch_{b}_block_{i}")(x, train)
            outs.append(x)
        if self.num_branches == 1:
            return outs
        widths = [c * exp for c in self.num_channels]
        return FuseLayer(widths, widths, dtype=self.dtype, name="fuse")(outs, train)


class Transition(nn.Module):
    """Adapts branch count/widths between stages."""
    out_channels: Sequence[int]
    dtype: Any = None

    @nn.compact
    def __call__(self, xs: List[jnp.ndarray], train: bool = False) -> List[jnp.ndarray]:
        outs = []
        for i, oc in enumerate(self.out_channels):
            if i < len(xs):
                x = xs[i]
                if x.shape[-1] != oc:
                    x = _conv(oc, 3, name=f"t_{i}_conv", dtype=self.dtype)(x)
                    x = _bn(train, f"t_{i}_bn", dtype=self.dtype)(x)
                    x = nn.relu(x)
                outs.append(x)
            else:  # new lower-resolution branch from the deepest existing one
                x = xs[-1]
                x = _conv(oc, 3, 2, name=f"t_{i}_conv", dtype=self.dtype)(x)
                x = _bn(train, f"t_{i}_bn", dtype=self.dtype)(x)
                outs.append(nn.relu(x))
        return outs


class HighResolutionNet(BaseBackbone):
    cfg: Dict[str, Any] = None
    in_channels: int = 3
    dtype: Any = None

    @property
    def out_channels(self) -> List[int]:
        return list(self.cfg["STAGE4"]["NUM_CHANNELS"])

    @property
    def out_encoder_channels(self) -> Tuple[int, ...]:
        return tuple(self.cfg["STAGE4"]["NUM_CHANNELS"])

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 return_features: bool = False):
        inp = x
        cfg = self.cfg
        stem_w = cfg["STEM_WIDTH"]
        x = _conv(stem_w, 3, 2, name="conv1", dtype=self.dtype)(x)
        x = _bn(train, "bn1", dtype=self.dtype)(x)
        x = nn.relu(x)
        x = _conv(64, 3, 2, name="conv2", dtype=self.dtype)(x)
        x = _bn(train, "bn2", dtype=self.dtype)(x)
        x = nn.relu(x)

        # stage 1: bottleneck stack on a single branch
        s1 = cfg["STAGE1"]
        blk = Bottleneck if s1["BLOCK"] == "BOTTLENECK" else BasicBlock
        planes = s1["NUM_CHANNELS"][0]
        for i in range(s1["NUM_BLOCKS"][0]):
            needs_down = i == 0 and x.shape[-1] != planes * blk.expansion
            x = blk(planes=planes, stride=1, use_downsample=needs_down,
                    dtype=self.dtype, name=f"layer1_{i}")(x, train)
        xs = [x]

        for stage_idx, key in enumerate(("STAGE2", "STAGE3", "STAGE4"), start=2):
            scfg = cfg[key]
            blk_exp = (BasicBlock if scfg["BLOCK"] == "BASIC" else Bottleneck).expansion
            widths = [c * blk_exp for c in scfg["NUM_CHANNELS"]]
            xs = Transition(widths, dtype=self.dtype,
                            name=f"transition{stage_idx - 1}")(xs, train)
            for m in range(scfg["NUM_MODULES"]):
                xs = HRModule(scfg["NUM_BRANCHES"], scfg["BLOCK"],
                              scfg["NUM_BLOCKS"], scfg["NUM_CHANNELS"],
                              dtype=self.dtype,
                              name=f"stage{stage_idx}_{m}")(xs, train)
        if return_features:
            return [inp] + xs
        return xs

    def forward_features(self, x: jnp.ndarray, train: bool = False) -> List[jnp.ndarray]:
        return self(x, train=train, return_features=True)

    def get_stages(self, stage: int) -> List[str]:
        groups = [["conv1", "bn1", "conv2", "bn2"], ["layer1_"],
                  ["transition1", "stage2_"], ["transition2", "stage3_"],
                  ["transition3", "stage4_"]]
        out: List[str] = []
        for g in groups[:stage + 1]:
            out.extend(g)
        return out


def _entry(name: str):
    def fn(pretrained: bool = False, in_channels: int = 3, **kwargs) -> HighResolutionNet:
        model = HighResolutionNet(cfg=CFGS[name], in_channels=in_channels, **kwargs)
        if pretrained:
            maybe_load_pretrained(model, name)
        return model
    fn.__name__ = name
    fn.__doc__ = f"HRNet variant '{name}'."
    BACKBONES.register_class(fn, name=name)
    return fn


for _name in CFGS:
    _entry(_name)
