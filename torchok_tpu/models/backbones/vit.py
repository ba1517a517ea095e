"""Vision Transformer backbone (reference: torchok/models/backbones/vit.py:202
— timm-derived torch; rebuilt as native Flax).

Contract parity: ``forward`` (module __call__) returns the cls-token
embedding; ``forward_features`` returns ``[input] + 4x`` the final patch
grid reshaped to NHWC (the ViTDet-style single-scale pyramid the reference
emits, vit.py:316-332). ``no_weight_decay`` covers pos_embed/cls_token.

TPU notes: attention runs as one fused QKV matmul + dot-product attention in
bf16 on the MXU; sequence lengths are static; XLA fuses the softmax chain.
"""
from __future__ import annotations

import math
from typing import Any, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from torchok_tpu.constructor import BACKBONES
from torchok_tpu.models.base import BaseBackbone
from torchok_tpu.models.modules.bricks.mlp import Mlp
from torchok_tpu.ops.common import DropPath, trunc_normal_init
from torchok_tpu.utils.pretrained import maybe_load_pretrained


class PatchEmbed(nn.Module):
    patch_size: int = 16
    embed_dim: int = 768
    bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        p = self.patch_size
        x = nn.Conv(self.embed_dim, (p, p), strides=(p, p), padding="VALID",
                    use_bias=self.bias, dtype=self.dtype,
                    kernel_init=nn.initializers.xavier_uniform(), name="proj")(x)
        n, h, w, c = x.shape
        return x.reshape(n, h * w, c), (h, w)


class Attention(nn.Module):
    num_heads: int = 8
    qkv_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        n, l, c = x.shape
        head_dim = c // self.num_heads
        qkv = nn.Dense(3 * c, use_bias=self.qkv_bias, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(n, l, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (n, l, h, d)
        attn = jnp.einsum("nqhd,nkhd->nhqk", q, k,
                          preferred_element_type=jnp.float32) / math.sqrt(head_dim)
        attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
        attn = nn.Dropout(self.attn_drop, deterministic=not train)(attn)
        out = jnp.einsum("nhqk,nkhd->nqhd", attn, v).reshape(n, l, c)
        out = nn.Dense(c, dtype=self.dtype, name="proj")(out)
        return nn.Dropout(self.proj_drop, deterministic=not train)(out)


class LayerScale(nn.Module):
    init_values: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        gamma = self.param("gamma", nn.initializers.constant(self.init_values),
                           (x.shape[-1],))
        return x * gamma


class Block(nn.Module):
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    init_values: Optional[float] = None
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c = x.shape[-1]
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        y = Attention(self.num_heads, self.qkv_bias, self.attn_drop, self.drop,
                      dtype=self.dtype, name="attn")(y, train)
        if self.init_values is not None:
            y = LayerScale(self.init_values, name="ls1")(y)
        x = x + DropPath(self.drop_path, name="drop_path1")(y, train)
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        y = Mlp(hidden_features=int(c * self.mlp_ratio), drop=self.drop,
                dtype=self.dtype, name="mlp")(y, train)
        if self.init_values is not None:
            y = LayerScale(self.init_values, name="ls2")(y)
        return x + DropPath(self.drop_path, name="drop_path2")(y, train)


class VisionTransformer(BaseBackbone):
    img_size: int = 224
    patch_size: int = 16
    in_channels: int = 3
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    init_values: Optional[float] = None
    class_token: bool = True
    no_embed_class: bool = False
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    # nn.remat per block (reference surface: timm grad_checkpointing flag)
    grad_checkpointing: bool = False
    dtype: Any = None

    @property
    def out_channels(self) -> int:
        return self.embed_dim

    @property
    def out_encoder_channels(self) -> Tuple[int, ...]:
        return (self.embed_dim,) * 4

    def no_weight_decay(self) -> List[str]:
        return ["pos_embed", "cls_token"]

    def _pos_embed(self, x: jnp.ndarray, grid: Tuple[int, int], train: bool):
        n, l, c = x.shape
        base_grid = self.img_size // self.patch_size
        embed_len = base_grid * base_grid
        if not self.no_embed_class and self.class_token:
            embed_len += 1
        pos_embed = self.param("pos_embed", trunc_normal_init(0.02), (1, embed_len, c))

        # interpolate when the input grid differs from the init-time grid
        def _resize_grid(pe_grid_part):
            if grid == (base_grid, base_grid):
                return pe_grid_part
            pe2d = pe_grid_part.reshape(1, base_grid, base_grid, c)
            pe2d = jax.image.resize(pe2d, (1, grid[0], grid[1], c), method="linear")
            return pe2d.reshape(1, grid[0] * grid[1], c)

        if self.class_token:
            cls = self.param("cls_token", nn.initializers.normal(1e-6), (1, 1, c))
            cls = jnp.broadcast_to(cls, (n, 1, c)).astype(x.dtype)
            if self.no_embed_class:
                x = x + _resize_grid(pos_embed).astype(x.dtype)
                x = jnp.concatenate([cls, x], axis=1)
            else:
                pe_cls, pe_grid = pos_embed[:, :1], pos_embed[:, 1:]
                x = jnp.concatenate([cls, x], axis=1)
                pe = jnp.concatenate([pe_cls, _resize_grid(pe_grid)], axis=1)
                x = x + pe.astype(x.dtype)
        else:
            x = x + _resize_grid(pos_embed).astype(x.dtype)
        return nn.Dropout(self.drop_rate, deterministic=not train)(x)

    def _blocks(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        dpr = [self.drop_path_rate * i / max(self.depth - 1, 1)
               for i in range(self.depth)]
        block_cls = nn.remat(Block, static_argnums=(2,)) \
            if self.grad_checkpointing else Block
        for i in range(self.depth):
            x = block_cls(self.num_heads, self.mlp_ratio, self.qkv_bias,
                          self.init_values, self.drop_rate, self.attn_drop_rate,
                          dpr[i], dtype=self.dtype, name=f"blocks_{i}")(x, train)
        return x

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 return_features: bool = False):
        inp = x
        tokens, grid = PatchEmbed(self.patch_size, self.embed_dim,
                                  dtype=self.dtype, name="patch_embed")(x)
        tokens = self._pos_embed(tokens, grid, train)
        tokens = self._blocks(tokens, train)
        if return_features:
            n = tokens.shape[0]
            patches = tokens[:, 1:] if self.class_token else tokens
            fmap = patches.reshape(n, grid[0], grid[1], self.embed_dim)
            # ViTDet-style single-scale map, duplicated for pyramid
            # compatibility (reference vit.py:329-332)
            return [inp] + [fmap] * 4
        tokens = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(tokens)
        if self.class_token:
            return tokens[:, 0]
        return jnp.mean(tokens, axis=1)

    def forward_features(self, x: jnp.ndarray, train: bool = False) -> List[jnp.ndarray]:
        return self(x, train=train, return_features=True)

    def get_stages(self, stage: int) -> List[str]:
        prefixes = ["patch_embed", "pos_embed", "cls_token"]
        for i in range(stage):
            prefixes.append(f"blocks_{i}")
        return prefixes


def _entry(name: str, **cfg):
    def fn(pretrained: bool = False, in_channels: int = 3, **kwargs) -> VisionTransformer:
        params = dict(cfg)
        params.update(kwargs)
        model = VisionTransformer(in_channels=in_channels, **params)
        if pretrained:
            maybe_load_pretrained(model, name)
        return model
    fn.__name__ = name
    fn.__doc__ = f"ViT variant '{name}'."
    BACKBONES.register_class(fn, name=name)
    return fn


def _v(embed_dim, depth, num_heads, patch_size=16, **kw):
    return dict(embed_dim=embed_dim, depth=depth, num_heads=num_heads,
                patch_size=patch_size, **kw)


_VARIANTS = {
    "vit_tiny_patch16_224": _v(192, 12, 3),
    "vit_tiny_patch16_384": _v(192, 12, 3, img_size=384),
    "vit_small_patch16_224": _v(384, 12, 6),
    "vit_small_patch16_384": _v(384, 12, 6, img_size=384),
    "vit_small_patch32_224": _v(384, 12, 6, patch_size=32),
    "vit_base_patch8_224": _v(768, 12, 12, patch_size=8),
    "vit_base_patch16_224": _v(768, 12, 12),
    "vit_base_patch16_384": _v(768, 12, 12, img_size=384),
    "vit_base_patch32_224": _v(768, 12, 12, patch_size=32),
    "vit_base_patch32_384": _v(768, 12, 12, patch_size=32, img_size=384),
    "vit_large_patch14_224": _v(1024, 24, 16, patch_size=14),
    "vit_large_patch16_224": _v(1024, 24, 16),
    "vit_large_patch16_384": _v(1024, 24, 16, img_size=384),
    "vit_large_patch32_384": _v(1024, 24, 16, patch_size=32, img_size=384),
    "vit_huge_patch14_224": _v(1280, 32, 16, patch_size=14),
    "vit_giant_patch14_224": _v(1408, 40, 16, patch_size=14, mlp_ratio=48 / 11),
    "vit_gigantic_patch14_224": _v(1664, 48, 16, patch_size=14, mlp_ratio=64 / 13),
    # architectural additions
    "vit_large_patch32_224": _v(1024, 24, 16, patch_size=32),
    "vit_small_patch32_384": _v(384, 12, 6, patch_size=32, img_size=384),
    "vit_small_patch16_36x1_224": _v(384, 36, 6),
    "vit_small_patch16_18x2_224": _v(384, 18, 6),  # parallel-pair depth folded
    "vit_base_patch16_18x2_224": _v(768, 18, 12),
    "vit_base_patch16_rpn_224": _v(768, 12, 12, class_token=False),
    "vit_base_patch16_plus_240": _v(896, 12, 14, img_size=240),
    "vit_base_patch32_plus_256": _v(896, 12, 14, patch_size=32, img_size=256),
}

# Weight-provenance variants (in21k / dino / sam / miil / clip-laion2b):
# identical architectures; names kept for recipe parity, weights resolve via
# the local cache (reference: torchok/models/backbones/vit.py url cfg dicts).
_WEIGHT_VARIANTS = {
    "vit_tiny_patch16_224_in21k": "vit_tiny_patch16_224",
    "vit_small_patch16_224_in21k": "vit_small_patch16_224",
    "vit_small_patch32_224_in21k": "vit_small_patch32_224",
    "vit_small_patch16_224_dino": "vit_small_patch16_224",
    "vit_small_patch8_224_dino": _v(384, 12, 6, patch_size=8),
    "vit_base_patch16_224_in21k": "vit_base_patch16_224",
    "vit_base_patch32_224_in21k": "vit_base_patch32_224",
    "vit_base_patch8_224_in21k": "vit_base_patch8_224",
    "vit_base_patch8_224_dino": "vit_base_patch8_224",
    "vit_base_patch16_224_dino": "vit_base_patch16_224",
    "vit_base_patch16_224_sam": "vit_base_patch16_224",
    "vit_base_patch32_224_sam": "vit_base_patch32_224",
    "vit_base_patch16_224_miil": "vit_base_patch16_224",
    "vit_base_patch16_224_miil_in21k": "vit_base_patch16_224",
    "vit_base_patch32_224_clip_laion2b": "vit_base_patch32_224",
    "vit_large_patch16_224_in21k": "vit_large_patch16_224",
    "vit_large_patch32_224_in21k": "vit_large_patch32_224",
    "vit_large_patch14_224_clip_laion2b": "vit_large_patch14_224",
    "vit_huge_patch14_224_in21k": "vit_huge_patch14_224",
    "vit_huge_patch14_224_clip_laion2b": "vit_huge_patch14_224",
    "vit_giant_patch14_224_clip_laion2b": "vit_giant_patch14_224",
}
for _alias, _base in _WEIGHT_VARIANTS.items():
    _VARIANTS[_alias] = dict(_VARIANTS[_base]) if isinstance(_base, str) else _base

for _name, _cfg in _VARIANTS.items():
    _entry(_name, **_cfg)
