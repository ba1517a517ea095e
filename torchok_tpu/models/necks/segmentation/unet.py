"""U-Net decoder neck (reference: torchok/models/necks/segmentation/unet.py:78-131):
upsample x2 + skip concat + 2x ConvBnAct + optional SCSE attention per block;
returns ``[input_image, decoded]``."""
from __future__ import annotations

from typing import Any, List, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from torchok_tpu.constructor import NECKS
from torchok_tpu.models.base import BaseModel
from torchok_tpu.models.modules.blocks.scse import SCSEModule
from torchok_tpu.models.modules.bricks.convbnact import ConvBnAct
from torchok_tpu.ops.image import resize_nearest


class DecoderBlock(nn.Module):
    out_channels: int
    use_attention: bool = False
    use_batchnorm: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, skip: Optional[jnp.ndarray],
                 train: bool = False) -> jnp.ndarray:
        x = resize_nearest(x, (x.shape[1] * 2, x.shape[2] * 2))
        if skip is not None:
            if skip.shape[1] != x.shape[1]:
                skip = resize_nearest(skip, (x.shape[1], x.shape[2]))
            x = jnp.concatenate([x, skip], axis=-1)
            if self.use_attention:
                x = SCSEModule(dtype=self.dtype, name="attention1")(x)
        x = ConvBnAct(self.out_channels, kernel_size=3, use_norm=self.use_batchnorm,
                      dtype=self.dtype, name="conv1")(x, train)
        x = ConvBnAct(self.out_channels, kernel_size=3, use_norm=self.use_batchnorm,
                      dtype=self.dtype, name="conv2")(x, train)
        if self.use_attention:
            x = SCSEModule(dtype=self.dtype, name="attention2")(x)
        return x


@NECKS.register_class
class UnetNeck(BaseModel):
    in_channels: Tuple[int, ...] = ()
    decoder_channels: Tuple[int, ...] = (512, 256, 128, 64, 64)
    use_batchnorm: bool = True
    use_attention: bool = False
    center: bool = True
    dtype: Any = None

    @property
    def out_channels(self) -> int:
        return self.decoder_channels[-1]

    @nn.compact
    def __call__(self, features: List[jnp.ndarray], train: bool = False) -> List[jnp.ndarray]:
        # features = [input] + shallow..deep; reverse to start from the head
        rev = features[::-1]
        head, skips, input_image = rev[0], rev[1:-1], rev[-1]

        x = head
        if self.center:
            c = head.shape[-1]
            x = ConvBnAct(c, kernel_size=3, use_norm=self.use_batchnorm,
                          dtype=self.dtype, name="center_conv1")(x, train)
            x = ConvBnAct(c, kernel_size=3, use_norm=self.use_batchnorm,
                          dtype=self.dtype, name="center_conv2")(x, train)

        for i, out_ch in enumerate(self.decoder_channels):
            skip = skips[i] if i < len(skips) else None
            x = DecoderBlock(out_ch, self.use_attention, self.use_batchnorm,
                             dtype=self.dtype, name=f"block_{i}")(x, skip, train)
        return [input_image, x]
