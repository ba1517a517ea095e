"""GCViT backbone (reference: torchok/models/backbones/gcvit.py:46-242 —
global-context ViT, arXiv:2206.09959; rebuilt natively in Flax).

Stages alternate local window self-attention and global window attention:
a global query generator downsamples the full stage feature map to one
window's worth of tokens, and those queries attend into each local window's
keys/values — giving every window a global receptive field at window cost.
"""
from __future__ import annotations

import math
from typing import Any, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from torchok_tpu.constructor import BACKBONES
from torchok_tpu.models.base import BaseBackbone
from torchok_tpu.models.modules.blocks.se import SEModule
from torchok_tpu.models.modules.bricks.mlp import Mlp
from torchok_tpu.models.backbones.swin import window_partition, window_reverse
from torchok_tpu.ops.common import DropPath
from torchok_tpu.ops.image import max_pool
from torchok_tpu.utils.pretrained import maybe_load_pretrained


class FusedMBConv(nn.Module):
    """dw3x3 + SE + pw, residual (GCViT feature block)."""
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        y = nn.Conv(c, (3, 3), padding=((1, 1), (1, 1)), feature_group_count=c,
                    dtype=self.dtype, name="conv_dw")(x)
        y = nn.gelu(y, approximate=False)
        y = SEModule(rd_ratio=0.25, dtype=self.dtype, name="se")(y)
        y = nn.Conv(c, (1, 1), dtype=self.dtype, name="conv_pw")(y)
        return x + y


class ReduceSize(nn.Module):
    """FusedMBConv + stride-2 conv (+ channel doubling between stages)."""
    keep_dim: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        out_c = c if self.keep_dim else 2 * c
        x = FusedMBConv(dtype=self.dtype, name="conv_block")(x)
        x = nn.Conv(out_c, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="reduction")(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        return x


class GlobalQueryGen(nn.Module):
    """Downsample the stage map to one window of global query tokens."""
    num_levels: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i in range(self.num_levels):
            x = FusedMBConv(dtype=self.dtype, name=f"block_{i}")(x)
            x = max_pool(x, window=3, stride=2, padding=1)
        return x


class GCAttention(nn.Module):
    """Window attention; with global=True queries come from shared global
    tokens."""
    num_heads: int
    use_global: bool = False
    qkv_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, windows: jnp.ndarray,
                 q_global: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        b_, l, c = windows.shape
        h = self.num_heads
        d = c // h
        if self.use_global:
            kv = nn.Dense(2 * c, use_bias=self.qkv_bias, dtype=self.dtype,
                          name="kv")(windows)
            kv = kv.reshape(b_, l, 2, h, d).transpose(2, 0, 3, 1, 4)
            k, v = kv[0], kv[1]
            # q_global: (B, L, C) -> repeat over each image's windows
            n = q_global.shape[0]
            rep = b_ // n
            q = jnp.repeat(q_global, rep, axis=0)
            q = q.reshape(b_, l, h, d).transpose(0, 2, 1, 3)
        else:
            qkv = nn.Dense(3 * c, use_bias=self.qkv_bias, dtype=self.dtype,
                           name="qkv")(windows)
            qkv = qkv.reshape(b_, l, 3, h, d).transpose(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
        attn = jnp.einsum("bhqd,bhkd->bhqk", q * (d ** -0.5), k,
                          preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn, axis=-1).astype(windows.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        return nn.Dense(c, dtype=self.dtype, name="proj")(
            out.transpose(0, 2, 1, 3).reshape(b_, l, c))


class GCViTBlock(nn.Module):
    num_heads: int
    window_size: int
    use_global: bool = False
    mlp_ratio: float = 3.0
    layer_scale: Optional[float] = None
    drop_path: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x, q_global, train: bool = False):
        n, hgt, wdt, c = x.shape
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        ws = min(self.window_size, hgt, wdt)
        pad_h = (ws - hgt % ws) % ws
        pad_w = (ws - wdt % ws) % ws
        if pad_h or pad_w:
            y = jnp.pad(y, [(0, 0), (0, pad_h), (0, pad_w), (0, 0)])
        windows = window_partition(y, ws)
        attn = GCAttention(self.num_heads, self.use_global, dtype=self.dtype,
                           name="attn")(windows, q_global)
        y = window_reverse(attn, ws, hgt + pad_h, wdt + pad_w)
        if pad_h or pad_w:
            y = y[:, :hgt, :wdt]
        if self.layer_scale is not None:
            g1 = self.param("gamma1", nn.initializers.constant(self.layer_scale), (c,))
            y = y * g1
        x = x + DropPath(self.drop_path, name="dp1")(y, train)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        y = Mlp(hidden_features=int(c * self.mlp_ratio), dtype=self.dtype,
                name="mlp")(y, train)
        if self.layer_scale is not None:
            g2 = self.param("gamma2", nn.initializers.constant(self.layer_scale), (c,))
            y = y * g2
        return x + DropPath(self.drop_path, name="dp2")(y, train)


class GlobalContextVit(BaseBackbone):
    in_channels: int = 3
    embed_dim: int = 64
    depths: Tuple[int, ...] = (3, 4, 19, 5)
    num_heads: Tuple[int, ...] = (2, 4, 8, 16)
    window_size: Tuple[int, ...] = (7, 7, 14, 7)
    mlp_ratio: float = 3.0
    layer_scale: Optional[float] = None
    drop_path_rate: float = 0.0
    # nn.remat per block (reference surface: timm grad_checkpointing flag)
    grad_checkpointing: bool = False
    dtype: Any = None

    @property
    def encoder_channels(self) -> List[int]:
        return [int(self.embed_dim * 2 ** i) for i in range(len(self.depths))]

    @property
    def out_encoder_channels(self) -> Tuple[int, ...]:
        return tuple(self.encoder_channels)

    @property
    def out_channels(self) -> int:
        return self.encoder_channels[-1]

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 return_features: bool = False):
        inp = x
        # stem: 3x3 s2 conv + ReduceSize(keep_dim) -> stride 4
        x = nn.Conv(self.embed_dim, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="stem_conv")(x)
        x = ReduceSize(keep_dim=True, dtype=self.dtype, name="stem_reduce")(x)

        total = sum(self.depths)
        dpr = [self.drop_path_rate * i / max(total - 1, 1) for i in range(total)]
        feats = []
        block_idx = 0
        for stage, (depth, heads, ws) in enumerate(
                zip(self.depths, self.num_heads, self.window_size)):
            n, h, w, c = x.shape
            ws = min(ws, h, w)  # effective window for small feature maps
            # global query tokens: downsample to (ws, ws)
            num_levels = max(int(math.log2(max(h // ws, 1))), 0)
            qg = GlobalQueryGen(num_levels, dtype=self.dtype,
                                name=f"q_global_gen_{stage}")(x)
            # crop/pad q_global to exactly (ws, ws)
            qg = qg[:, :ws, :ws]
            if qg.shape[1] < ws or qg.shape[2] < ws:
                qg = jnp.pad(qg, [(0, 0), (0, ws - qg.shape[1]),
                                  (0, ws - qg.shape[2]), (0, 0)])
            qg = qg.reshape(n, ws * ws, c)
            # static_argnums: self=0, x=1, q_global=2 (array), train=3
            block_cls = nn.remat(GCViTBlock, static_argnums=(3,)) \
                if self.grad_checkpointing else GCViTBlock
            for blk in range(depth):
                x = block_cls(heads, ws, use_global=blk % 2 == 1,
                               mlp_ratio=self.mlp_ratio,
                               layer_scale=self.layer_scale,
                               drop_path=dpr[block_idx], dtype=self.dtype,
                               name=f"level_{stage}_block_{blk}")(x, qg, train)
                block_idx += 1
            feats.append(x)
            if stage < len(self.depths) - 1:
                x = ReduceSize(keep_dim=False, dtype=self.dtype,
                               name=f"level_{stage}_downsample")(x)
        if return_features:
            return [inp] + feats
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(feats[-1])

    def forward_features(self, x: jnp.ndarray, train: bool = False) -> List[jnp.ndarray]:
        return self(x, train=train, return_features=True)

    def get_stages(self, stage: int) -> List[str]:
        prefixes = ["stem_conv", "stem_reduce"]
        for i in range(stage):
            prefixes.extend([f"level_{i}_", f"q_global_gen_{i}"])
        return prefixes


def _entry(name: str, **cfg):
    def fn(pretrained: bool = False, in_channels: int = 3, **kwargs) -> GlobalContextVit:
        params = dict(cfg)
        params.update(kwargs)
        model = GlobalContextVit(in_channels=in_channels, **params)
        if pretrained:
            maybe_load_pretrained(model, name)
        return model
    fn.__name__ = name
    fn.__doc__ = f"GCViT variant '{name}'."
    BACKBONES.register_class(fn, name=name)
    return fn


_VARIANTS = {
    "gcvit_xxtiny": dict(embed_dim=64, depths=(2, 2, 6, 2), num_heads=(2, 4, 8, 16)),
    "gcvit_xtiny": dict(embed_dim=64, depths=(3, 4, 6, 5), num_heads=(2, 4, 8, 16)),
    "gcvit_tiny": dict(embed_dim=64, depths=(3, 4, 19, 5), num_heads=(2, 4, 8, 16)),
    "gcvit_small": dict(embed_dim=96, depths=(3, 4, 19, 5), num_heads=(3, 6, 12, 24),
                        layer_scale=1e-5),
    "gcvit_base": dict(embed_dim=128, depths=(3, 4, 19, 5), num_heads=(4, 8, 16, 32),
                       layer_scale=1e-5),
}

for _name, _cfg in _VARIANTS.items():
    _entry(_name, **_cfg)
