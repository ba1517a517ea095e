"""HRNet-OCR segmentation head (reference:
torchok/models/heads/segmentation/ocr.py:134-192; HRNet-OCR paper
arXiv:1909.11065).

SpatialGather soft class-region pooling + object attention + aux head;
returns (out, aux) in train mode, out in eval. The gather/attention path is
two batched matmuls — MXU-native."""
from __future__ import annotations

from typing import Any, List, Optional, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from torchok_tpu.constructor import HEADS
from torchok_tpu.models.base import BaseModel
from torchok_tpu.models.modules.bricks.convbnact import ConvBnAct
from torchok_tpu.ops.image import resize_bilinear


def spatial_gather(feats: jnp.ndarray, probs: jnp.ndarray, scale: float = 1.0) -> jnp.ndarray:
    """Soft-weighted class-context aggregation (reference ocr.py:22-45).
    feats: (N, H, W, C); probs: (N, H, W, K) -> context (N, K, C)."""
    n, h, w, c = feats.shape
    k = probs.shape[-1]
    probs2 = jax.nn.softmax(scale * probs.reshape(n, h * w, k), axis=1)  # over pixels
    feats2 = feats.reshape(n, h * w, c)
    return jnp.einsum("npk,npc->nkc", probs2, feats2,
                      preferred_element_type=jnp.float32).astype(feats.dtype)


class ObjectAttentionBlock(nn.Module):
    key_channels: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, proxy: jnp.ndarray,
                 train: bool = False) -> jnp.ndarray:
        """x: (N, H, W, C) pixels; proxy: (N, K, C) object regions."""
        n, h, w, c = x.shape
        kc = self.key_channels

        def f(name, inp):
            y = ConvBnAct(kc, kernel_size=1, dtype=self.dtype, name=f"{name}_0")(inp, train)
            return ConvBnAct(kc, kernel_size=1, dtype=self.dtype, name=f"{name}_1")(y, train)

        query = f("f_pixel", x).reshape(n, h * w, kc)
        proxy4 = proxy[:, :, None, :]  # (N, K, 1, C) so 1x1 convs apply per region
        key = f("f_object", proxy4).reshape(n, -1, kc)
        value = f("f_down", proxy4).reshape(n, -1, kc)

        sim = jnp.einsum("nqc,nkc->nqk", query, key,
                         preferred_element_type=jnp.float32) * (kc ** -0.5)
        sim = jax.nn.softmax(sim, axis=-1).astype(x.dtype)
        context = jnp.einsum("nqk,nkc->nqc", sim, value)
        context = context.reshape(n, h, w, kc)
        context = ConvBnAct(c, kernel_size=1, dtype=self.dtype, name="f_up")(context, train)
        return context


@HEADS.register_class
class OCRSegmentationHead(BaseModel):
    in_channels: int = 0
    num_classes: int = 0
    do_interpolate: bool = True
    ocr_mid_channels: int = 128
    ocr_key_channels: int = 64
    dtype: Any = None

    @property
    def out_channels(self) -> int:
        return self.num_classes

    @nn.compact
    def __call__(self, x: List[jnp.ndarray], target: Optional[jnp.ndarray] = None,
                 train: bool = False) -> Union[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
        input_image, feats = x

        aux = ConvBnAct(self.in_channels, kernel_size=1, dtype=self.dtype,
                        name="aux_conv")(feats, train)
        out_aux = nn.Conv(self.num_classes, (1, 1), use_bias=True,
                          dtype=self.dtype, name="aux_cls")(aux)

        y = ConvBnAct(self.ocr_mid_channels, kernel_size=3, dtype=self.dtype,
                      name="conv3x3_ocr")(feats, train)
        context = spatial_gather(y, out_aux)
        attn = ObjectAttentionBlock(self.ocr_key_channels, dtype=self.dtype,
                                    name="ocr_distri")(y, context, train)
        y = jnp.concatenate([attn, y], axis=-1)
        y = ConvBnAct(self.ocr_mid_channels, kernel_size=1, dtype=self.dtype,
                      name="ocr_fuse")(y, train)
        y = nn.Dropout(0.05, deterministic=not train)(y)
        y = ConvBnAct(self.ocr_mid_channels // 16, kernel_size=1, dtype=self.dtype,
                      name="last_reduction")(y, train)
        out = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype, name="classifier")(y)

        if self.do_interpolate:
            size = (input_image.shape[1], input_image.shape[2])
            out = resize_bilinear(out, size)
            out_aux = resize_bilinear(out_aux, size)
        if self.num_classes == 1:
            out = out[..., 0]
            out_aux = out_aux[..., 0]
        if train:
            return out, out_aux
        return out
