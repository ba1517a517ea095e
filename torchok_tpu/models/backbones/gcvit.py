"""GCViT backbone (reference: torchok/models/backbones/gcvit.py:46-242 —
global-context ViT, arXiv:2206.09959; rebuilt natively in Flax).

The reference composes timm-0.6's ``timm.models.gcvit`` modules directly
(``Stem``/``GlobalContextVitStage``, reference gcvit.py:18) so its weight
surface IS timm's: ``stem.conv1``, ``stem.down.{norm1,conv_block,reduction,
norm2}``, ``stages.{i}.downsample`` (attached to the FOLLOWING stage),
``stages.{i}.global_block.blocks.conv{j}``, per-block
``attn.{qkv,rel_pos.relative_position_bias_table,proj}`` / ``ls{1,2}.gamma``
and a stage-internal ``norm`` on the last stage only. This file mirrors that
structure (timm itself is absent from this environment, so the layout is
reconstructed from timm 0.6.x; `tests/test_torch_convert_gcvit.py` holds the
hand-written torch oracle).

Stages alternate local window self-attention and global window attention: a
global query generator downsamples the full stage feature map to one
window's worth of tokens, and those queries attend into each local window's
keys/values — giving every window a global receptive field at window cost.

One deliberate divergence, documented: timm repeats the global queries over
windows with torch ``.repeat`` (tiling the image axis) while its windows are
laid out image-major; we pair each image's windows with that image's own
global queries (``jnp.repeat`` interleave) — the semantically consistent
choice, identical for batch size 1.
"""
from __future__ import annotations

import math
from typing import Any, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from torchok_tpu.constructor import BACKBONES
from torchok_tpu.models.base import BaseBackbone
from torchok_tpu.models.modules.blocks.se import SEModule
from torchok_tpu.models.modules.bricks.mlp import Mlp, gelu_exact
from torchok_tpu.ops.common import DropPath
from torchok_tpu.ops.image import max_pool
from torchok_tpu.ops.swin_attention import (fused_attention_enabled,
                                            window_attention_spatial,
                                            window_partition, window_reverse)
from torchok_tpu.utils.pretrained import maybe_load_pretrained


class MbConvBlock(nn.Module):
    """timm gcvit MbConvBlock: dw3x3 + GELU + SE + pw1x1, residual; all convs
    and the SE are bias-free."""
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        y = nn.Conv(c, (3, 3), padding=((1, 1), (1, 1)), feature_group_count=c,
                    use_bias=False, dtype=self.dtype, name="conv_dw")(x)
        y = gelu_exact(y)
        y = SEModule(rd_ratio=0.25, act=gelu_exact, use_bias=False,
                     round_limit=0.0, dtype=self.dtype, name="se")(y)
        y = nn.Conv(c, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv_pw")(y)
        return x + y


class Downsample2d(nn.Module):
    """timm gcvit Downsample2d: norm1 -> MbConv -> stride-2 conv -> norm2."""
    keep_dim: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        out_c = c if self.keep_dim else 2 * c
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        x = MbConvBlock(dtype=self.dtype, name="conv_block")(x)
        x = nn.Conv(out_c, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=self.dtype, name="reduction")(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        return x


class Stem(nn.Module):
    """timm gcvit Stem: 3x3 s2 conv (with bias) + keep-dim Downsample2d."""
    embed_dim: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Conv(self.embed_dim, (3, 3), strides=(2, 2),
                    padding=((1, 1), (1, 1)), dtype=self.dtype,
                    name="conv1")(x)
        return Downsample2d(keep_dim=True, dtype=self.dtype, name="down")(x)


class FeatureBlock(nn.Module):
    """timm gcvit FeatureBlock (the global query generator): ``max(1, levels)``
    MbConv blocks named conv1..convL, each of the first ``levels`` followed by
    a 3x3/s2 max pool."""
    levels: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        reductions = self.levels
        for i in range(max(1, self.levels)):
            x = MbConvBlock(dtype=self.dtype, name=f"conv{i + 1}")(x)
            if reductions > 0:
                x = max_pool(x, window=3, stride=2, padding=1)
                reductions -= 1
        return x


def _rel_pos_index(ws: int) -> np.ndarray:
    """Swin-style relative position index, (L, L) into a (2ws-1)^2 table."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws),
                                  indexing="ij"))          # (2, ws, ws)
    flat = coords.reshape(2, -1)                            # (2, L)
    rel = flat[:, :, None] - flat[:, None, :]               # (2, L, L)
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[..., 0] += ws - 1
    rel[..., 1] += ws - 1
    rel[..., 0] *= 2 * ws - 1
    return rel.sum(-1)


class RelPosBias(nn.Module):
    """Learned relative position bias (timm RelPosBias, prefix_tokens=0):
    param ``relative_position_bias_table`` of shape ((2ws-1)^2, heads)."""
    window_size: int
    num_heads: int

    @nn.compact
    def __call__(self, attn: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """With ``attn`` adds the bias to the logits (XLA formulation);
        with None returns the raw (H, L, L) f32 bias for the fused kernel."""
        ws = self.window_size
        L = ws * ws
        table = self.param("relative_position_bias_table",
                           nn.initializers.zeros,
                           ((2 * ws - 1) ** 2, self.num_heads))
        idx = jnp.asarray(_rel_pos_index(ws).reshape(-1))
        bias = table[idx].reshape(L, L, self.num_heads).transpose(2, 0, 1)
        if attn is None:
            return bias.astype(jnp.float32)
        return attn + bias[None].astype(attn.dtype)


class WindowAttentionGlobal(nn.Module):
    """Window attention with relative position bias; with ``use_global`` the
    queries come from the shared per-image global tokens and the projection
    (still named ``qkv``, timm naming) emits only k/v."""
    num_heads: int
    window_size: int
    use_global: bool = False
    qkv_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, windows: jnp.ndarray,
                 q_global: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        c = windows.shape[-1]
        h = self.num_heads
        d = c // h
        if windows.ndim == 4:
            # full (B, Hp, Wp, C) spatial map: single fused/XLA dispatch
            # (ops/swin_attention.py window_attention_spatial). Local blocks
            # use the plain dot-product kernel; global blocks the global-q
            # kernel (the image's shared queries broadcast in VMEM instead
            # of repeated nW times through HBM). The learned rel-pos bias
            # gradient flows through the kernels' dbias accumulators.
            # Params are identical to the windowed form either way.
            proj_dim = 2 * c if self.use_global else 3 * c
            proj = nn.Dense(proj_dim, use_bias=self.qkv_bias,
                            dtype=self.dtype, name="qkv")(windows)
            bias = RelPosBias(self.window_size, h, name="rel_pos")()
            scale = jnp.full((h,), d ** -0.5, jnp.float32)
            out = window_attention_spatial(
                proj, scale, bias, ws=self.window_size, nheads=h,
                q_global=q_global if self.use_global else None)
            return nn.Dense(c, dtype=self.dtype, name="proj")(out)
        b_, l, c = windows.shape
        if self.use_global:
            kv = nn.Dense(2 * c, use_bias=self.qkv_bias, dtype=self.dtype,
                          name="qkv")(windows)
            kv = kv.reshape(b_, l, 2, h, d).transpose(2, 0, 3, 1, 4)
            k, v = kv[0], kv[1]
            # q_global: (B, L, C); each image's windows (consecutive in b_)
            # share that image's queries — see module docstring on the timm
            # .repeat tiling divergence
            n = q_global.shape[0]
            q = jnp.repeat(q_global, b_ // n, axis=0)
            q = q.reshape(b_, l, h, d).transpose(0, 2, 1, 3)
        else:
            qkv = nn.Dense(3 * c, use_bias=self.qkv_bias, dtype=self.dtype,
                           name="qkv")(windows)
            qkv = qkv.reshape(b_, l, 3, h, d).transpose(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
        attn = jnp.einsum("bhqd,bhkd->bhqk", q * (d ** -0.5), k,
                          preferred_element_type=jnp.float32)
        attn = RelPosBias(self.window_size, h, name="rel_pos")(attn)
        attn = jax.nn.softmax(attn, axis=-1).astype(windows.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        return nn.Dense(c, dtype=self.dtype, name="proj")(
            out.transpose(0, 2, 1, 3).reshape(b_, l, c))


class LayerScale(nn.Module):
    init_value: float

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        gamma = self.param("gamma", nn.initializers.constant(self.init_value),
                           (x.shape[-1],))
        return x * gamma


class GlobalContextVitBlock(nn.Module):
    num_heads: int
    window_size: int
    use_global: bool = False
    mlp_ratio: float = 3.0
    qkv_bias: bool = True
    layer_scale: Optional[float] = None
    drop_path: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x, q_global, train: bool = False):
        n, hgt, wdt, c = x.shape
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        # ws stays the BUILD-time constant (param shapes must not depend on
        # the runtime input); maps smaller than a window are padded up to it
        ws = self.window_size
        pad_h = (ws - hgt % ws) % ws
        pad_w = (ws - wdt % ws) % ws
        if pad_h or pad_w:
            y = jnp.pad(y, [(0, 0), (0, pad_h), (0, pad_w), (0, 0)])
        attn_mod = WindowAttentionGlobal(self.num_heads, ws, self.use_global,
                                         self.qkv_bias, dtype=self.dtype,
                                         name="attn")
        if fused_attention_enabled(ws, wdt + pad_w, self.num_heads, c):
            # local blocks ride the fused Pallas kernel; global blocks the
            # fused global-q kernel (shared queries broadcast in VMEM)
            y = attn_mod(y, q_global if self.use_global else None)
        else:
            windows = window_partition(y, ws)
            attn = attn_mod(windows, q_global)
            y = window_reverse(attn, ws, hgt + pad_h, wdt + pad_w)
        if pad_h or pad_w:
            y = y[:, :hgt, :wdt]
        if self.layer_scale is not None:
            y = LayerScale(self.layer_scale, name="ls1")(y)
        x = x + DropPath(self.drop_path, name="dp1")(y, train)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        y = Mlp(hidden_features=int(c * self.mlp_ratio), dtype=self.dtype,
                name="mlp")(y, train)
        if self.layer_scale is not None:
            y = LayerScale(self.layer_scale, name="ls2")(y)
        return x + DropPath(self.drop_path, name="dp2")(y, train)


class GlobalContextVitStage(nn.Module):
    """One GCViT stage (timm GlobalContextVitStage): optional leading
    downsample, a FeatureBlock generating global query tokens, alternating
    local/global window-attention blocks, and a stage norm (last stage)."""
    depth: int
    num_heads: int
    window_size: int
    # configured per-stage feature size (img_size // stem stride // 2^stage)
    # — a BUILD-time constant like timm's, so FeatureBlock depth and rel-pos
    # tables never depend on the runtime input resolution
    feat_size: int
    downsample: bool
    stage_norm: bool
    mlp_ratio: float
    qkv_bias: bool
    layer_scale: Optional[float]
    drop_path: Sequence[float]
    grad_checkpointing: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.downsample:
            x = Downsample2d(keep_dim=False, dtype=self.dtype,
                             name="downsample")(x)
        n, h, w, c = x.shape
        ws = max(self.window_size, 1)
        levels = max(int(math.log2(max(self.feat_size // ws, 1))), 0)
        qg = FeatureBlock(levels, dtype=self.dtype, name="global_block")(x)
        # crop/pad to exactly (ws, ws) — exact for pow-2 feature/window ratios
        qg = qg[:, :ws, :ws]
        if qg.shape[1] < ws or qg.shape[2] < ws:
            qg = jnp.pad(qg, [(0, 0), (0, ws - qg.shape[1]),
                              (0, ws - qg.shape[2]), (0, 0)])
        qg = qg.reshape(n, ws * ws, c)
        # static_argnums: self=0, x=1, q_global=2 (array), train=3
        block_cls = nn.remat(GlobalContextVitBlock, static_argnums=(3,)) \
            if self.grad_checkpointing else GlobalContextVitBlock
        for blk in range(self.depth):
            x = block_cls(self.num_heads, ws, use_global=blk % 2 == 1,
                          mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
                          layer_scale=self.layer_scale,
                          drop_path=self.drop_path[blk], dtype=self.dtype,
                          name=f"blocks_{blk}")(x, qg, train)
        if self.stage_norm:
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        return x


class GlobalContextVit(BaseBackbone):
    in_channels: int = 3
    embed_dim: int = 64
    depths: Tuple[int, ...] = (3, 4, 19, 5)
    num_heads: Tuple[int, ...] = (2, 4, 8, 16)
    # reference surface (gcvit.py:53-55,82-86): fixed window_size wins over
    # ratio; with window_size None the per-stage window is the CONFIGURED
    # img_size // ratio — a build-time constant, NOT the runtime input size,
    # so parameter shapes stay input-resolution-independent (a 224-built
    # checkpoint applies unchanged at 448). Feature maps smaller than a
    # window are PADDED up to one full window inside the block (a survival
    # divergence for tiny inputs — the reference would crash there); param
    # shapes stay the build-time ones in every regime.
    # int or (h, w) like the reference's to_2tuple surface; windows here are
    # square, sized from min(h, w) (the reference's rectangular windows only
    # differ for non-square inputs — its example configs are square)
    img_size: Any = 224
    window_size: Optional[Tuple[int, ...]] = None
    # reference surface (gcvit.py:68,169-174): when loading pretrained
    # weights at a different resolution, drop the (shape-incompatible)
    # relative-position bias tables and keep their fresh init. Consumed by
    # the task's pretrained load (utils/pretrained.py drop_key_substrings).
    load_relative_position_bias_table: bool = True
    window_ratio: Tuple[int, ...] = (32, 32, 16, 32)
    mlp_ratio: float = 3.0
    qkv_bias: bool = True
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
        x = Stem(self.embed_dim, dtype=self.dtype, name="stem")(x)

        total = sum(self.depths)
        dpr = [self.drop_path_rate * i / max(total - 1, 1)
               for i in range(total)]
        feats = []
        block_idx = 0
        num_stages = len(self.depths)
        img_min = (min(int(v) for v in self.img_size)
                   if isinstance(self.img_size, (tuple, list))
                   else int(self.img_size))
        for stage, (depth, heads) in enumerate(zip(self.depths,
                                                   self.num_heads)):
            if self.window_size is not None:
                ws = self.window_size[stage]
            else:
                ws = max(img_min // self.window_ratio[stage], 1)
            x = GlobalContextVitStage(
                depth=depth, num_heads=heads, window_size=ws,
                feat_size=max(img_min // 4 // (2 ** stage), 1),
                downsample=stage != 0, stage_norm=stage == num_stages - 1,
                mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
                layer_scale=self.layer_scale,
                drop_path=dpr[block_idx:block_idx + depth],
                grad_checkpointing=self.grad_checkpointing,
                dtype=self.dtype, name=f"stages_{stage}")(x, train)
            block_idx += depth
            feats.append(x)
        if return_features:
            return [inp] + feats
        return feats[-1]

    def forward_features(self, x: jnp.ndarray, train: bool = False) -> List[jnp.ndarray]:
        return self(x, train=train, return_features=True)

    def get_stages(self, stage: int) -> List[str]:
        # reference get_stages (gcvit.py:226-234): [stem, *stages[:stage]]
        return ["stem"] + [f"stages_{i}" for i in range(stage)]


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


# reference gcvit.py:196-242 (gcvit_small/base: embed_dim/heads up,
# mlp_ratio=2, layer_scale=1e-5)
_VARIANTS = {
    "gcvit_xxtiny": dict(embed_dim=64, depths=(2, 2, 6, 2), num_heads=(2, 4, 8, 16)),
    "gcvit_xtiny": dict(embed_dim=64, depths=(3, 4, 6, 5), num_heads=(2, 4, 8, 16)),
    "gcvit_tiny": dict(embed_dim=64, depths=(3, 4, 19, 5), num_heads=(2, 4, 8, 16)),
    "gcvit_small": dict(embed_dim=96, depths=(3, 4, 19, 5), num_heads=(3, 6, 12, 24),
                        mlp_ratio=2.0, layer_scale=1e-5),
    "gcvit_base": dict(embed_dim=128, depths=(3, 4, 19, 5), num_heads=(4, 8, 16, 32),
                       mlp_ratio=2.0, layer_scale=1e-5),
}

for _name, _cfg in _VARIANTS.items():
    _entry(_name, **_cfg)
