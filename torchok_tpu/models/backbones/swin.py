"""Swin Transformer V2 backbone (reference:
torchok/models/backbones/swin.py:84-283 — timm-derived torch; rebuilt as
native Flax over the fused window-attention op in ops/window_attention.py).

SwinV2 specifics preserved: cosine attention with learned per-head log
temperature, continuous relative position bias (2-layer cpb_mlp on
log-spaced coords), post-norm residual blocks, shifted windows with static
additive masks, per-stage feature norms for the pyramid
(reference swin.py:219-249), ``no_weight_decay`` on cpb_mlp/logit_scale
(swin.py:192).

TPU notes: windows are folded into the batch dimension so the attention is
one batched MXU matmul per stage; the shift masks are computed at trace
time with numpy (static shapes) — no data-dependent control flow.
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
from torchok_tpu.ops.swin_attention import (_ShardFallback,
                                            fused_attention_enabled,
                                            fused_swin_attention,
                                            window_partition,  # noqa: F401 — re-export
                                            window_reverse)
from torchok_tpu.ops.window_attention import window_attention
from torchok_tpu.utils.pretrained import maybe_load_pretrained


def _relative_coords_table(ws: int, pretrained_ws: int) -> np.ndarray:
    """Log-spaced relative coordinate table for the cpb MLP, ((2w-1)^2, 2)."""
    coords = np.arange(-(ws - 1), ws, dtype=np.float32)
    table = np.stack(np.meshgrid(coords, coords, indexing="ij"), axis=-1)  # (2w-1,2w-1,2)
    denom = (pretrained_ws - 1) if pretrained_ws > 0 else (ws - 1)
    if denom > 0:
        table = table / denom
    table *= 8.0
    table = np.sign(table) * np.log2(np.abs(table) + 1.0) / np.log2(8.0)
    return table.reshape(-1, 2)


def _relative_position_index(ws: int) -> np.ndarray:
    """(L, L) indices into the (2w-1)^2 bias table."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    coords = coords.reshape(2, -1)  # (2, L)
    rel = coords[:, :, None] - coords[:, None, :]  # (2, L, L)
    rel = rel.transpose(1, 2, 0) + (ws - 1)
    return (rel[..., 0] * (2 * ws - 1) + rel[..., 1]).astype(np.int32)


def _shift_window_region_ids(h: int, w: int, ws: int, shift: int) -> np.ndarray:
    """Region id per window position for shifted-window attention, shape
    (nW, L). The (nW, L, L) additive mask is derived in-graph from this
    small table: embedding the full mask (let alone its batch-tiled form)
    as an HLO literal bloats SwinV2's serialized module by tens of MB."""
    img_mask = np.zeros((1, h, w, 1), np.float32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img_mask[:, hs, wsl, :] = cnt
            cnt += 1
    m = img_mask.reshape(1, h // ws, ws, w // ws, ws, 1)
    return m.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws).astype(np.int32)


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    pretrained_window_size: int = 0
    qkv_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray],
                 train: bool = False) -> jnp.ndarray:
        """x is either pre-partitioned windows (B_, L, C) — the XLA
        formulation — or the full (pre-rolled, padded) spatial map
        (B, Hp, Wp, C), in which case the fused Pallas kernel handles
        partition/attention/reverse in one pass (same parameters either
        way; ``mask`` is always the compact (nW, L, L) additive form).

        ``attn_drop`` is accepted for reference-surface parity but not
        applied to the attention weights (every shipped swinv2 variant uses
        0.0; ``proj_drop`` is applied)."""
        spatial = x.ndim == 4
        c = x.shape[-1]
        h = self.num_heads
        d = c // h
        l = self.window_size * self.window_size if spatial else x.shape[1]

        logit_scale = self.param(
            "logit_scale", nn.initializers.constant(math.log(10.0)), (h,))

        # continuous position bias MLP
        table = jnp.asarray(_relative_coords_table(
            self.window_size, self.pretrained_window_size))
        cpb = nn.Dense(512, use_bias=True, name="cpb_mlp_0")(table)
        cpb = nn.relu(cpb)
        cpb = nn.Dense(h, use_bias=False, name="cpb_mlp_1")(cpb)  # ((2w-1)^2, H)
        idx = jnp.asarray(_relative_position_index(self.window_size))
        bias = cpb[idx.reshape(-1)].reshape(l, l, h).transpose(2, 0, 1)
        bias = 16.0 * nn.sigmoid(bias)

        # qkv with q/v bias only (SwinV2); a Dense is pointwise over
        # positions, so it runs identically on windows or the spatial map
        qkv = nn.Dense(3 * c, use_bias=False, dtype=self.dtype, name="qkv")(x)
        if self.qkv_bias:
            q_bias = self.param("q_bias", nn.initializers.zeros, (c,))
            v_bias = self.param("v_bias", nn.initializers.zeros, (c,))
            qkv = qkv + jnp.concatenate(
                [q_bias, jnp.zeros_like(q_bias), v_bias]).astype(qkv.dtype)

        if spatial:
            b, hp, wp, _ = qkv.shape
            try:
                if not isinstance(b, int):
                    # symbolic batch (jax.export polymorphic dim): a Pallas
                    # grid needs static shapes — use the XLA formulation
                    raise _ShardFallback()
                out = fused_swin_attention(qkv, logit_scale, bias, mask,
                                           ws=self.window_size, nheads=h)
            except _ShardFallback:
                # batch does not divide the active mesh's data axes: run the
                # XLA formulation on explicit windows instead
                win = window_partition(qkv, self.window_size)  # (B*nW, L, 3C)
                q = win[..., :c].reshape(-1, l, h, d)
                k = win[..., c:2 * c].reshape(-1, l, h, d)
                v = win[..., 2 * c:].reshape(-1, l, h, d)
                ow = window_attention(q, k, v, logit_scale, bias, mask,
                                      layout="blhd").reshape(-1, l, c)
                out = window_reverse(ow, self.window_size, hp, wp)
        else:
            b_ = x.shape[0]
            # slice straight into (B_, L, H, D): the 5D reshape+transpose
            # this replaces forced XLA relayout copies worth ~20% of a
            # swinv2_tiny train step (see window_attention "blhd" docstring)
            q = qkv[..., :c].reshape(b_, l, h, d)
            k = qkv[..., c:2 * c].reshape(b_, l, h, d)
            v = qkv[..., 2 * c:].reshape(b_, l, h, d)
            out = window_attention(q, k, v, logit_scale, bias, mask,
                                   layout="blhd").reshape(b_, l, c)
        out = nn.Dense(c, dtype=self.dtype, name="proj")(out)
        return nn.Dropout(self.proj_drop, deterministic=not train)(out)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    shift_size: int = 0
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    pretrained_window_size: int = 0
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, hw: Tuple[int, int],
                 train: bool = False) -> jnp.ndarray:
        hgt, wdt = hw
        b, l, c = x.shape
        x_sp = x.reshape(b, hgt, wdt, c)

        if min(hgt, wdt) <= self.window_size:
            ws, shift = min(hgt, wdt), 0  # window covers the map: no shifting
        else:
            ws, shift = self.window_size, self.shift_size

        pad_h = (ws - hgt % ws) % ws
        pad_w = (ws - wdt % ws) % ws
        if pad_h or pad_w:
            x_sp = jnp.pad(x_sp, [(0, 0), (0, pad_h), (0, pad_w), (0, 0)])
        hp, wp = hgt + pad_h, wdt + pad_w

        if shift > 0:
            # roll the thin C-wide activations once here (roll commutes with
            # the pointwise qkv/proj Denses) instead of rolling partitioned
            # or 3C-wide copies downstream
            x_sp = jnp.roll(x_sp, (-shift, -shift), axis=(1, 2))
            ids = jnp.asarray(_shift_window_region_ids(hp, wp, ws, shift))
            # compact (nW, L, L) additive mask computed in-graph — only the
            # (nW, L) id table lands in the HLO, and the attention op
            # broadcasts over the batch without materializing a tiled copy
            mask = jnp.where(ids[:, :, None] != ids[:, None, :], -100.0, 0.0)
        else:
            mask = None

        attn_mod = WindowAttention(
            self.dim, self.num_heads, ws, self.pretrained_window_size,
            self.qkv_bias, self.attn_drop, self.drop, dtype=self.dtype,
            name="attn")
        if fused_attention_enabled(ws, wp, self.num_heads, c):
            # fused Pallas path: partition/attention/reverse in one kernel
            # on the spatial layout — no window relayout copies in XLA
            x_sp = attn_mod(x_sp, mask, train)
        else:
            windows = window_partition(x_sp, ws)  # (B*nW, L, C)
            attn_out = attn_mod(windows, mask, train)
            x_sp = window_reverse(attn_out, ws, hp, wp)

        if shift > 0:
            x_sp = jnp.roll(x_sp, (shift, shift), axis=(1, 2))
        if pad_h or pad_w:
            x_sp = x_sp[:, :hgt, :wdt]
        y = x_sp.reshape(b, l, c)

        # post-norm residuals (SwinV2)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(y)
        x = x + DropPath(self.drop_path, name="drop_path1")(y, train)

        y = Mlp(hidden_features=int(c * self.mlp_ratio), drop=self.drop,
                dtype=self.dtype, name="mlp")(x, train)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(y)
        x = x + DropPath(self.drop_path, name="drop_path2")(y, train)
        return x


class PatchMerging(nn.Module):
    """2x2 reduction; SwinV2 order: linear then norm."""
    out_dim: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, hw: Tuple[int, int]) -> Tuple[jnp.ndarray, Tuple[int, int]]:
        hgt, wdt = hw
        b, l, c = x.shape
        x = x.reshape(b, hgt, wdt, c)
        pad_h, pad_w = hgt % 2, wdt % 2
        if pad_h or pad_w:
            x = jnp.pad(x, [(0, 0), (0, pad_h), (0, pad_w), (0, 0)])
            hgt, wdt = hgt + pad_h, wdt + pad_w
        x = x.reshape(b, hgt // 2, 2, wdt // 2, 2, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, (hgt // 2) * (wdt // 2), 4 * c)
        x = nn.Dense(self.out_dim, use_bias=False, dtype=self.dtype,
                     name="reduction")(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        return x, (hgt // 2, wdt // 2)


class SwinTransformerV2(BaseBackbone):
    img_size: int = 256
    patch_size: int = 4
    in_channels: int = 3
    embed_dim: int = 96
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.1
    ape: bool = False
    patch_norm: bool = True
    pretrained_window_sizes: Tuple[int, ...] = (0, 0, 0, 0)
    # Per-block activation rematerialization (reference swin.py:77-80 uses
    # torch.utils.checkpoint per block behind `grad_checkpointing`; here the
    # same flag wraps each SwinBlock in nn.remat so XLA recomputes block
    # activations on the backward pass instead of keeping them in HBM).
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

    def no_weight_decay(self) -> List[str]:
        return ["absolute_pos_embed", "cpb_mlp", "logit_scale"]

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 return_features: bool = False):
        inp = x
        p = self.patch_size
        x = nn.Conv(self.embed_dim, (p, p), strides=(p, p), padding="VALID",
                    dtype=self.dtype, name="patch_embed")(x)
        b, gh, gw, c = x.shape
        x = x.reshape(b, gh * gw, c)
        if self.patch_norm:
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="patch_norm")(x)
        if self.ape:
            ape = self.param("absolute_pos_embed", trunc_normal_init(0.02),
                             (1, gh * gw, c))
            x = x + ape.astype(x.dtype)
        x = nn.Dropout(self.drop_rate, deterministic=not train)(x)

        hw = (gh, gw)
        total = sum(self.depths)
        dpr = [self.drop_path_rate * i / max(total - 1, 1) for i in range(total)]
        features = []
        block_idx = 0
        # static_argnums: self=0, x=1, hw=2 (static tuple), train=3
        block_cls = nn.remat(SwinBlock, static_argnums=(2, 3)) \
            if self.grad_checkpointing else SwinBlock
        for stage, (depth, heads) in enumerate(zip(self.depths, self.num_heads)):
            dim = self.encoder_channels[stage]
            for blk in range(depth):
                x = block_cls(
                    dim=dim, num_heads=heads, window_size=self.window_size,
                    shift_size=0 if blk % 2 == 0 else self.window_size // 2,
                    mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
                    drop=self.drop_rate, attn_drop=self.attn_drop_rate,
                    drop_path=dpr[block_idx],
                    pretrained_window_size=self.pretrained_window_sizes[stage],
                    dtype=self.dtype, name=f"layers_{stage}_blocks_{blk}",
                )(x, hw, train)
                block_idx += 1
            # per-stage normed feature (reference swin.py:219-249)
            feat = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                name=f"feature_norms_{stage}")(x)
            features.append(feat.reshape(b, hw[0], hw[1], dim))
            if stage < len(self.depths) - 1:
                x, hw = PatchMerging(self.encoder_channels[stage + 1],
                                     dtype=self.dtype,
                                     name=f"layers_{stage}_downsample")(x, hw)
        if return_features:
            return [inp] + features
        return features[-1]

    def forward_features(self, x: jnp.ndarray, train: bool = False) -> List[jnp.ndarray]:
        return self(x, train=train, return_features=True)

    def get_stages(self, stage: int) -> List[str]:
        prefixes = ["patch_embed", "patch_norm", "absolute_pos_embed"]
        for i in range(stage):
            prefixes.append(f"layers_{i}_")
        return prefixes


def _entry(name: str, **cfg):
    def fn(pretrained: bool = False, in_channels: int = 3, **kwargs) -> SwinTransformerV2:
        params = dict(cfg)
        params.update(kwargs)
        model = SwinTransformerV2(in_channels=in_channels, **params)
        if pretrained:
            maybe_load_pretrained(model, name)
        return model
    fn.__name__ = name
    fn.__doc__ = f"SwinV2 variant '{name}'."
    BACKBONES.register_class(fn, name=name)
    return fn


@BACKBONES.register_class(name="swinv2_custom")
def swinv2_custom(pretrained: bool = False, in_channels: int = 3, **kwargs):
    model = SwinTransformerV2(in_channels=in_channels, **kwargs)
    if pretrained:
        maybe_load_pretrained(model, "swinv2_custom")
    return model


_VARIANTS = {
    "swinv2_tiny_window8_256": dict(window_size=8, embed_dim=96,
                                    depths=(2, 2, 6, 2), num_heads=(3, 6, 12, 24)),
    "swinv2_tiny_window16_256": dict(window_size=16, embed_dim=96,
                                     depths=(2, 2, 6, 2), num_heads=(3, 6, 12, 24)),
    "swinv2_small_window8_256": dict(window_size=8, embed_dim=96,
                                     depths=(2, 2, 18, 2), num_heads=(3, 6, 12, 24)),
    "swinv2_small_window16_256": dict(window_size=16, embed_dim=96,
                                      depths=(2, 2, 18, 2), num_heads=(3, 6, 12, 24)),
    "swinv2_base_window8_256": dict(window_size=8, embed_dim=128,
                                    depths=(2, 2, 18, 2), num_heads=(4, 8, 16, 32)),
    "swinv2_base_window16_256": dict(window_size=16, embed_dim=128,
                                     depths=(2, 2, 18, 2), num_heads=(4, 8, 16, 32)),
    "swinv2_base_window12_192_22k": dict(window_size=12, img_size=192, embed_dim=128,
                                         depths=(2, 2, 18, 2), num_heads=(4, 8, 16, 32)),
    "swinv2_base_window12to16_192to256_22kft1k": dict(
        window_size=16, embed_dim=128, depths=(2, 2, 18, 2),
        num_heads=(4, 8, 16, 32), pretrained_window_sizes=(12, 12, 12, 6)),
    "swinv2_base_window12to24_192to384_22kft1k": dict(
        window_size=24, img_size=384, embed_dim=128, depths=(2, 2, 18, 2),
        num_heads=(4, 8, 16, 32), pretrained_window_sizes=(12, 12, 12, 6)),
    "swinv2_large_window12_192_22k": dict(window_size=12, img_size=192, embed_dim=192,
                                          depths=(2, 2, 18, 2), num_heads=(6, 12, 24, 48)),
    "swinv2_large_window12to16_192to256_22kft1k": dict(
        window_size=16, embed_dim=192, depths=(2, 2, 18, 2),
        num_heads=(6, 12, 24, 48), pretrained_window_sizes=(12, 12, 12, 6)),
    "swinv2_large_window12to24_192to384_22kft1k": dict(
        window_size=24, img_size=384, embed_dim=192, depths=(2, 2, 18, 2),
        num_heads=(6, 12, 24, 48), pretrained_window_sizes=(12, 12, 12, 6)),
}

for _name, _cfg in _VARIANTS.items():
    _entry(_name, **_cfg)
