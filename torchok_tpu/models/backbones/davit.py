"""DaViT backbone (reference: torchok/models/backbones/davit.py:378 —
dual-attention ViT, arXiv:2204.03645; rebuilt natively in Flax).

Each stage alternates a SpatialBlock (window self-attention over patches)
and a ChannelBlock (attention transposed over the channel groups — linear
in token count, a TPU-friendly global mixer). Conv position encodings
before each attention/MLP."""
from __future__ import annotations

import math
from typing import Any, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from torchok_tpu.constructor import BACKBONES
from torchok_tpu.models.base import BaseBackbone
from torchok_tpu.models.modules.bricks.mlp import Mlp
from torchok_tpu.ops.common import DropPath
from torchok_tpu.ops.swin_attention import (fused_attention_enabled,
                                            window_attention_spatial,
                                            window_partition, window_reverse)
from torchok_tpu.utils.pretrained import maybe_load_pretrained


class ConvPosEnc(nn.Module):
    """Depthwise conv positional encoding (reference davit.py:88-114)."""
    kernel: int = 3
    act: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, hw: Tuple[int, int]) -> jnp.ndarray:
        n, l, c = x.shape
        h, w = hw
        feat = x.reshape(n, h, w, c)
        pad = self.kernel // 2
        y = nn.Conv(c, (self.kernel, self.kernel), padding=((pad, pad), (pad, pad)),
                    feature_group_count=c, dtype=self.dtype, name="proj")(feat)
        if self.act:
            y = nn.gelu(y, approximate=False)
        return x + y.reshape(n, l, c)


class ChannelAttention(nn.Module):
    """Attention over channel groups (reference davit.py:133-165)."""
    num_heads: int = 8
    qkv_bias: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        n, l, c = x.shape
        h = self.num_heads
        d = c // h
        qkv = nn.Dense(3 * c, use_bias=self.qkv_bias, dtype=self.dtype,
                       name="qkv")(x)
        qkv = qkv.reshape(n, l, 3, h, d).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]  # (n, h, l, d)
        k = k * (d ** -0.5)
        # channel attention: (d x d) similarity over the token dimension
        attn = jnp.einsum("nhld,nhle->nhde", k, v,
                          preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
        out = jnp.einsum("nhld,nhde->nhle", q, attn)
        return nn.Dense(c, dtype=self.dtype, name="proj")(
            out.transpose(0, 2, 1, 3).reshape(n, l, c))


class WindowAttention(nn.Module):
    """Plain window self-attention (reference davit.py:168-208).

    Accepts either pre-partitioned windows (B_, L, C) — the XLA
    formulation — or the full padded spatial map (B, Hp, Wp, C), in which
    case the fused Pallas kernel (``ops/swin_attention.py``, cosine=False
    mode) handles partition/attention/reverse in one pass. Parameters are
    identical either way (the qkv/proj Denses are pointwise over tokens)."""
    num_heads: int
    window_size: int
    qkv_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        h = self.num_heads
        d = c // h
        qkv = nn.Dense(3 * c, use_bias=self.qkv_bias, dtype=self.dtype,
                       name="qkv")(x)
        if x.ndim == 4:
            scale = jnp.full((h,), d ** -0.5, jnp.float32)
            out = window_attention_spatial(qkv, scale, None,
                                           ws=self.window_size, nheads=h)
            return nn.Dense(c, dtype=self.dtype, name="proj")(out)
        b_, l, _ = x.shape
        qkv = qkv.reshape(b_, l, 3, h, d).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = jnp.einsum("bhqd,bhkd->bhqk", q * (d ** -0.5), k,
                          preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        return nn.Dense(c, dtype=self.dtype, name="proj")(
            out.transpose(0, 2, 1, 3).reshape(b_, l, c))


class SpatialBlock(nn.Module):
    num_heads: int
    window_size: int = 7
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_path: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x, hw, train: bool = False):
        n, l, c = x.shape
        hgt, wdt = hw
        x = ConvPosEnc(dtype=self.dtype, name="cpe1")(x, hw)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        sp = y.reshape(n, hgt, wdt, c)
        ws = min(self.window_size, hgt, wdt)
        pad_h = (ws - hgt % ws) % ws
        pad_w = (ws - wdt % ws) % ws
        if pad_h or pad_w:
            sp = jnp.pad(sp, [(0, 0), (0, pad_h), (0, pad_w), (0, 0)])
        attn_mod = WindowAttention(self.num_heads, ws, self.qkv_bias,
                                   dtype=self.dtype, name="attn")
        if fused_attention_enabled(ws, wdt + pad_w, self.num_heads, c):
            # fused Pallas path: partition/attention/reverse in one kernel
            # on the spatial layout (pad tokens attend exactly as in the
            # windowed form — their qkv is the Dense bias)
            sp = attn_mod(sp)
        else:
            windows = window_partition(sp, ws)
            sp = window_reverse(attn_mod(windows), ws,
                                hgt + pad_h, wdt + pad_w)
        if pad_h or pad_w:
            sp = sp[:, :hgt, :wdt]
        x = x + DropPath(self.drop_path, name="dp1")(sp.reshape(n, l, c), train)

        x = ConvPosEnc(dtype=self.dtype, name="cpe2")(x, hw)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        y = Mlp(hidden_features=int(c * self.mlp_ratio), dtype=self.dtype,
                name="mlp")(y, train)
        return x + DropPath(self.drop_path, name="dp2")(y, train)


class ChannelBlock(nn.Module):
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_path: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x, hw, train: bool = False):
        c = x.shape[-1]
        x = ConvPosEnc(dtype=self.dtype, name="cpe1")(x, hw)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        y = ChannelAttention(self.num_heads, self.qkv_bias, dtype=self.dtype,
                             name="attn")(y)
        x = x + DropPath(self.drop_path, name="dp1")(y, train)
        x = ConvPosEnc(dtype=self.dtype, name="cpe2")(x, hw)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        y = Mlp(hidden_features=int(c * self.mlp_ratio), dtype=self.dtype,
                name="mlp")(y, train)
        return x + DropPath(self.drop_path, name="dp2")(y, train)


class DaViT(BaseBackbone):
    in_channels: int = 3
    embed_dims: Tuple[int, ...] = (96, 192, 384, 768)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    depths: Tuple[int, ...] = (1, 1, 3, 1)  # dual blocks per stage
    window_size: int = 7
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_path_rate: float = 0.1
    # nn.remat per dual block (reference surface: timm grad_checkpointing)
    grad_checkpointing: bool = False
    dtype: Any = None

    @property
    def out_channels(self) -> int:
        return self.embed_dims[-1]

    @property
    def out_encoder_channels(self) -> Tuple[int, ...]:
        return tuple(self.embed_dims)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 return_features: bool = False):
        inp = x
        feats = []
        total = sum(self.depths) * 2
        dpr = [self.drop_path_rate * i / max(total - 1, 1) for i in range(total)]
        block_idx = 0
        for stage, (dim, heads, depth) in enumerate(
                zip(self.embed_dims, self.num_heads, self.depths)):
            if stage == 0:  # overlapping 7x7 s4 stem
                x = nn.Conv(dim, (7, 7), strides=(4, 4), padding=((3, 3), (3, 3)),
                            dtype=self.dtype, name="patch_embed_0")(x)
            else:  # 2x2 s2 downsample
                x = nn.Conv(dim, (2, 2), strides=(2, 2), padding="VALID",
                            dtype=self.dtype, name=f"patch_embed_{stage}")(x)
            n, h, w, c = x.shape
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                             name=f"patch_norm_{stage}")(x)
            tokens = x.reshape(n, h * w, c)
            # static_argnums: self=0, x=1, hw=2 (static tuple), train=3
            if self.grad_checkpointing:
                spatial_cls = nn.remat(SpatialBlock, static_argnums=(2, 3))
                channel_cls = nn.remat(ChannelBlock, static_argnums=(2, 3))
            else:
                spatial_cls, channel_cls = SpatialBlock, ChannelBlock
            for blk in range(depth):
                tokens = spatial_cls(heads, self.window_size, self.mlp_ratio,
                                     self.qkv_bias, dpr[block_idx], dtype=self.dtype,
                                     name=f"stage_{stage}_spatial_{blk}")(tokens, (h, w), train)
                block_idx += 1
                tokens = channel_cls(heads, self.mlp_ratio, self.qkv_bias,
                                     dpr[block_idx], dtype=self.dtype,
                                     name=f"stage_{stage}_channel_{blk}")(tokens, (h, w), train)
                block_idx += 1
            x = tokens.reshape(n, h, w, c)
            feats.append(x)
        if return_features:
            return [inp] + feats
        out = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(feats[-1])
        return out

    def forward_features(self, x: jnp.ndarray, train: bool = False) -> List[jnp.ndarray]:
        return self(x, train=train, return_features=True)

    def get_stages(self, stage: int) -> List[str]:
        prefixes = ["patch_embed_0", "patch_norm_0"]
        for i in range(stage):
            prefixes.extend([f"stage_{i}_", f"patch_embed_{i + 1}",
                             f"patch_norm_{i + 1}"])
        return prefixes


def _entry(name: str, **cfg):
    def fn(pretrained: bool = False, in_channels: int = 3, **kwargs) -> DaViT:
        params = dict(cfg)
        params.update(kwargs)
        model = DaViT(in_channels=in_channels, **params)
        if pretrained:
            maybe_load_pretrained(model, name)
        return model
    fn.__name__ = name
    fn.__doc__ = f"DaViT variant '{name}'."
    BACKBONES.register_class(fn, name=name)
    return fn


_VARIANTS = {
    "davit_t": dict(embed_dims=(96, 192, 384, 768), num_heads=(3, 6, 12, 24),
                    depths=(1, 1, 3, 1)),
    "davit_s": dict(embed_dims=(96, 192, 384, 768), num_heads=(3, 6, 12, 24),
                    depths=(1, 1, 9, 1)),
    "davit_b": dict(embed_dims=(128, 256, 512, 1024), num_heads=(4, 8, 16, 32),
                    depths=(1, 1, 9, 1)),
}

for _name, _cfg in _VARIANTS.items():
    _entry(_name, **_cfg)
