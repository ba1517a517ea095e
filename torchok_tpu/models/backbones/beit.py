"""BEiT backbone (reference: torchok/models/backbones/beit.py:61-273 —
timm-derived torch; rebuilt natively in Flax; BEiT paper arXiv:2106.08254).

Differences from plain ViT preserved: q/v-only bias, per-block (or shared)
relative position bias over the patch grid, LayerScale with small init,
mean-pooled final representation when no cls pooling, abs pos embed off by
default for the *_pt22k variants.
"""
from __future__ import annotations

import math
from typing import Any, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from torchok_tpu.constructor import BACKBONES
from torchok_tpu.models.base import BaseBackbone
from torchok_tpu.models.modules.bricks.mlp import Mlp
from torchok_tpu.ops.common import DropPath, trunc_normal_init
from torchok_tpu.utils.pretrained import maybe_load_pretrained


def _rel_pos_index(grid: Tuple[int, int]) -> np.ndarray:
    """BEiT relative position index incl. cls-token rows/cols."""
    h, w = grid
    coords = np.stack(np.meshgrid(np.arange(h), np.arange(w), indexing="ij"))
    coords = coords.reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[..., 0] += h - 1
    rel[..., 1] += w - 1
    rel[..., 0] *= 2 * w - 1
    num_rel = (2 * h - 1) * (2 * w - 1)
    l = h * w
    index = np.zeros((l + 1, l + 1), np.int64)
    index[1:, 1:] = rel.sum(-1)
    index[0, 0:] = num_rel
    index[0:, 0] = num_rel + 1
    index[0, 0] = num_rel + 2
    return index


class RelativePositionBias(nn.Module):
    grid: Tuple[int, int]
    num_heads: int

    @nn.compact
    def __call__(self) -> jnp.ndarray:
        h, w = self.grid
        num_rel = (2 * h - 1) * (2 * w - 1) + 3
        table = self.param("relative_position_bias_table",
                           nn.initializers.zeros, (num_rel, self.num_heads))
        index = jnp.asarray(_rel_pos_index(self.grid))
        bias = table[index.reshape(-1)].reshape(
            index.shape[0], index.shape[1], self.num_heads)
        return bias.transpose(2, 0, 1)  # (H, L+1, L+1)


class BeitAttention(nn.Module):
    num_heads: int
    qkv_bias: bool = True
    use_rel_pos_bias: bool = False
    grid: Optional[Tuple[int, int]] = None
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, shared_bias: Optional[jnp.ndarray],
                 train: bool = False) -> jnp.ndarray:
        n, l, c = x.shape
        h = self.num_heads
        d = c // h
        qkv = nn.Dense(3 * c, use_bias=False, dtype=self.dtype, name="qkv")(x)
        if self.qkv_bias:
            q_bias = self.param("q_bias", nn.initializers.zeros, (c,))
            v_bias = self.param("v_bias", nn.initializers.zeros, (c,))
            qkv = qkv + jnp.concatenate(
                [q_bias, jnp.zeros_like(q_bias), v_bias]).astype(qkv.dtype)
        qkv = qkv.reshape(n, l, 3, h, d).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = jnp.einsum("nhqd,nhkd->nhqk", q, k,
                          preferred_element_type=jnp.float32) / math.sqrt(d)
        if self.use_rel_pos_bias and self.grid is not None:
            bias = RelativePositionBias(self.grid, h, name="rel_pos_bias")()
            attn = attn + bias[None].astype(attn.dtype)
        if shared_bias is not None:
            attn = attn + shared_bias[None].astype(attn.dtype)
        attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
        attn = nn.Dropout(self.attn_drop, deterministic=not train)(attn)
        out = jnp.einsum("nhqk,nhkd->nhqd", attn, v).transpose(0, 2, 1, 3)
        out = out.reshape(n, l, c)
        out = nn.Dense(c, dtype=self.dtype, name="proj")(out)
        return nn.Dropout(self.proj_drop, deterministic=not train)(out)


class BeitBlock(nn.Module):
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    init_values: Optional[float] = None
    use_rel_pos_bias: bool = False
    grid: Optional[Tuple[int, int]] = None
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x, shared_bias, train: bool = False):
        c = x.shape[-1]
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        y = BeitAttention(self.num_heads, self.qkv_bias, self.use_rel_pos_bias,
                          self.grid, self.attn_drop, self.drop,
                          dtype=self.dtype, name="attn")(y, shared_bias, train)
        if self.init_values is not None:
            g1 = self.param("gamma_1", nn.initializers.constant(self.init_values), (c,))
            y = y * g1
        x = x + DropPath(self.drop_path, name="drop_path1")(y, train)
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        y = Mlp(hidden_features=int(c * self.mlp_ratio), drop=self.drop,
                dtype=self.dtype, name="mlp")(y, train)
        if self.init_values is not None:
            g2 = self.param("gamma_2", nn.initializers.constant(self.init_values), (c,))
            y = y * g2
        return x + DropPath(self.drop_path, name="drop_path2")(y, train)


class Beit(BaseBackbone):
    img_size: int = 224
    patch_size: int = 16
    in_channels: int = 3
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    init_values: Optional[float] = 0.1
    use_abs_pos_emb: bool = False
    use_rel_pos_bias: bool = True
    use_shared_rel_pos_bias: bool = False
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
        return ["pos_embed", "cls_token", "gamma_1", "gamma_2",
                "relative_position_bias_table"]

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 return_features: bool = False):
        inp = x
        p = self.patch_size
        x = nn.Conv(self.embed_dim, (p, p), strides=(p, p), padding="VALID",
                    dtype=self.dtype, name="patch_embed")(x)
        n, gh, gw, c = x.shape
        x = x.reshape(n, gh * gw, c)
        cls = self.param("cls_token", trunc_normal_init(0.02), (1, 1, c))
        x = jnp.concatenate([jnp.broadcast_to(cls, (n, 1, c)).astype(x.dtype), x], 1)
        if self.use_abs_pos_emb:
            pe = self.param("pos_embed", trunc_normal_init(0.02), (1, gh * gw + 1, c))
            x = x + pe.astype(x.dtype)
        x = nn.Dropout(self.drop_rate, deterministic=not train)(x)

        shared_bias = None
        if self.use_shared_rel_pos_bias:
            shared_bias = RelativePositionBias((gh, gw), self.num_heads,
                                               name="rel_pos_bias")()

        dpr = [self.drop_path_rate * i / max(self.depth - 1, 1)
               for i in range(self.depth)]
        # static_argnums: self=0, x=1, shared_bias=2 (array/None), train=3
        block_cls = nn.remat(BeitBlock, static_argnums=(3,)) \
            if self.grad_checkpointing else BeitBlock
        for i in range(self.depth):
            x = block_cls(self.num_heads, self.mlp_ratio, self.qkv_bias,
                          self.init_values, self.use_rel_pos_bias, (gh, gw),
                          self.drop_rate, self.attn_drop_rate, dpr[i],
                          dtype=self.dtype, name=f"blocks_{i}")(x, shared_bias, train)
        if return_features:
            fmap = x[:, 1:].reshape(n, gh, gw, c)
            return [inp] + [fmap] * 4
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        return x[:, 0]

    def forward_features(self, x: jnp.ndarray, train: bool = False) -> List[jnp.ndarray]:
        return self(x, train=train, return_features=True)

    def get_stages(self, stage: int) -> List[str]:
        prefixes = ["patch_embed", "cls_token", "pos_embed", "rel_pos_bias"]
        for i in range(stage):
            prefixes.append(f"blocks_{i}")
        return prefixes


def _entry(name: str, **cfg):
    def fn(pretrained: bool = False, in_channels: int = 3, **kwargs) -> Beit:
        params = dict(cfg)
        params.update(kwargs)
        model = Beit(in_channels=in_channels, **params)
        if pretrained:
            maybe_load_pretrained(model, name)
        return model
    fn.__name__ = name
    fn.__doc__ = f"BEiT variant '{name}'."
    BACKBONES.register_class(fn, name=name)
    return fn


_VARIANTS = {
    "beit_base_patch16_224": dict(embed_dim=768, depth=12, num_heads=12, init_values=0.1),
    "beit_base_patch16_384": dict(embed_dim=768, depth=12, num_heads=12,
                                  init_values=0.1, img_size=384),
    "beit_base_patch16_224_in22k": dict(embed_dim=768, depth=12, num_heads=12,
                                        init_values=0.1),
    "beit_large_patch16_224": dict(embed_dim=1024, depth=24, num_heads=16,
                                   init_values=1e-5),
    "beit_large_patch16_384": dict(embed_dim=1024, depth=24, num_heads=16,
                                   init_values=1e-5, img_size=384),
    "beit_large_patch16_512": dict(embed_dim=1024, depth=24, num_heads=16,
                                   init_values=1e-5, img_size=512),
    "beit_large_patch16_224_in22k": dict(embed_dim=1024, depth=24, num_heads=16,
                                         init_values=1e-5),
}

for _name, _cfg in _VARIANTS.items():
    _entry(_name, **_cfg)
