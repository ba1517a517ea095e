"""HRNet segmentation neck (reference:
torchok/models/necks/segmentation/hrnet.py:17-42): bilinear-upsample all
branches to the highest resolution, concat, ConvBnRelu; returns
``[input_image, feats]``."""
from __future__ import annotations

from typing import Any, List, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp

from torchok_tpu.constructor import NECKS
from torchok_tpu.models.base import BaseModel
from torchok_tpu.models.modules.bricks.convbnact import ConvBnAct
from torchok_tpu.ops.image import resize_bilinear


@NECKS.register_class
class HRNetSegmentationNeck(BaseModel):
    in_channels: Union[List[int], Tuple[int, ...]] = ()
    dtype: Any = None

    @property
    def out_channels(self) -> int:
        return int(sum(self.in_channels))

    @nn.compact
    def __call__(self, features: List[jnp.ndarray], train: bool = False) -> List[jnp.ndarray]:
        input_image, x0, x1, x2, x3 = features
        size = (x0.shape[1], x0.shape[2])
        x1 = resize_bilinear(x1, size)
        x2 = resize_bilinear(x2, size)
        x3 = resize_bilinear(x3, size)
        feats = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        feats = ConvBnAct(self.out_channels, kernel_size=1, dtype=self.dtype,
                          name="convbnact")(feats, train)
        return [input_image, feats]
