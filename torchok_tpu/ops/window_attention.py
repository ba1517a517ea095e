"""Fused SwinV2 window attention.

The hot op of the Swin/DaViT family (SURVEY.md §5 "long-context analogs"):
block-diagonal attention over (shifted) spatial windows with cosine
similarity, learned per-head temperature, and continuous relative position
bias.

Two execution paths:

* ``_window_attention_xla`` — batched einsum formulation; windows ride the
  batch dimension so every matmul lands on the MXU.
* ``_window_attention_pallas`` — a Pallas TPU kernel fusing the q/k
  normalization, cosine-logits matmul, bias/mask add, softmax and PV matmul
  in VMEM, one grid step per (window-batch, head). Used on TPU by default;
  numerics are validated against the XLA path in tests (interpret mode on
  CPU).
"""
from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LOG2_100 = math.log(100.0)


def _normalize(x, axis=-1, eps=1e-12):
    return x / (jnp.linalg.norm(x, axis=axis, keepdims=True) + eps)


def _window_attention_xla(q, k, v, logit_scale, bias, mask, layout="bhld"):
    """q/k/v: (B, H, L, D) for layout="bhld" or (B, L, H, D) for "blhd";
    logit_scale: (H,); bias: (H, L, L); mask: (B, L, L) additive or None.

    The "blhd" layout is the fast path for SwinV2: the qkv projection output
    is (B, L, 3*H*D) and slicing straight into (B, L, H, D) avoids the 5D
    transpose whose relayout copies cost ~20% of a swinv2_tiny_256 train
    step (profiled on v5e); the einsums carry the head axis as a non-leading
    batch dim and the output needs no transpose either.
    """
    if layout == "blhd":
        eq_qk, eq_pv = "bqhd,bkhd->bhqk", "bhqk,bkhd->bqhd"
    else:
        eq_qk, eq_pv = "bhqd,bhkd->bhqk", "bhqk,bhkd->bhqd"
    dtype = q.dtype
    # Normalize in f32 (rsqrt stability) but feed the MXU bf16 operands with
    # f32 accumulation: an f32xf32 matmul has no native MXU path on TPU and
    # lowers to a multi-pass decomposition — measured 372 ms of a 661 ms
    # swinv2_tiny_256/bs256 train step before this cast. Unit-norm vectors
    # round to bf16 with relative error ~2^-9, well inside the attention
    # logits' tolerance (reference trains the same math in fp16 autocast).
    qn = _normalize(q.astype(jnp.float32)).astype(dtype)
    kn = _normalize(k.astype(jnp.float32)).astype(dtype)
    scale = jnp.exp(jnp.minimum(logit_scale.astype(jnp.float32), LOG2_100))
    attn = jnp.einsum(eq_qk, qn, kn, preferred_element_type=jnp.float32)
    attn = attn * scale[None, :, None, None]
    attn = attn + bias.astype(jnp.float32)[None]
    if mask is not None:
        if mask.shape[0] == attn.shape[0]:
            attn = attn + mask.astype(jnp.float32)[:, None]
        else:
            # compact per-window-type mask (nW, L, L): broadcast over the
            # batch inside the fusion instead of materializing a tiled
            # (B*nW, L, L) tensor in HBM
            nw = mask.shape[0]
            b = attn.shape[0] // nw
            attn = (attn.reshape(b, nw, *attn.shape[1:])
                    + mask.astype(jnp.float32)[None, :, None]
                    ).reshape(attn.shape)
    attn = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum(eq_pv, attn.astype(dtype), v)
    return out


def _round_up(x, m):
    return (x + m - 1) // m * m


def _wa_kernel(q_ref, k_ref, v_ref, scale_ref, bias_ref, mask_ref, out_ref, *, L):
    """One (window, head) tile: fused cosine attention in VMEM.
    q: (Lq, Dp); k, v: (Lk, Dp); bias/mask: (Lq, Lk); scale: full (H,) SMEM."""
    head = pl.program_id(1)
    q = q_ref[0, 0].astype(jnp.float32)
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0]

    qn = q * jax.lax.rsqrt(jnp.sum(q * q, axis=-1, keepdims=True) + 1e-12)
    kn = k * jax.lax.rsqrt(jnp.sum(k * k, axis=-1, keepdims=True) + 1e-12)
    scale = jnp.exp(jnp.minimum(scale_ref[head], LOG2_100))
    attn = jnp.dot(qn, kn.T, preferred_element_type=jnp.float32) * scale
    attn = attn + bias_ref[0].astype(jnp.float32)
    attn = attn + mask_ref[0].astype(jnp.float32)
    if attn.shape[-1] != L:  # mask out padded key positions
        col = jax.lax.broadcasted_iota(jnp.int32, attn.shape, 1)
        attn = jnp.where(col < L, attn, -1e30)
    attn = jax.nn.softmax(attn, axis=-1)
    out_ref[0, 0] = jnp.dot(attn.astype(jnp.float32), v.astype(jnp.float32),
                            preferred_element_type=jnp.float32).astype(out_ref.dtype)


def _window_attention_pallas(q, k, v, logit_scale, bias, mask):
    B, H, L, D = q.shape
    Lq = _round_up(L, 8)     # sublane-aligned query length
    Lk = _round_up(L, 128)   # lane-aligned key length
    Dp = _round_up(D, 128)

    qp = jnp.pad(q, [(0, 0), (0, 0), (0, Lq - L), (0, Dp - D)])
    kp = jnp.pad(k, [(0, 0), (0, 0), (0, Lk - L), (0, Dp - D)])
    vp = jnp.pad(v, [(0, 0), (0, 0), (0, Lk - L), (0, Dp - D)])
    bias_p = jnp.pad(bias, [(0, 0), (0, Lq - L), (0, Lk - L)])
    if mask is None:
        mask_arr = jnp.zeros((1, Lq, Lk), q.dtype)
        mask_idx = lambda b, h: (0, 0, 0)  # noqa: E731
    else:
        mask_arr = jnp.pad(mask.astype(q.dtype), [(0, 0), (0, Lq - L), (0, Lk - L)])
        mask_idx = lambda b, h: (b, 0, 0)  # noqa: E731

    scale1d = logit_scale.reshape(H).astype(jnp.float32)

    kernel = functools.partial(_wa_kernel, L=L)
    out = pl.pallas_call(
        kernel,
        grid=(B, H),
        in_specs=[
            pl.BlockSpec((1, 1, Lq, Dp), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Lk, Dp), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Lk, Dp), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # full (H,) scale vector
            pl.BlockSpec((1, Lq, Lk), lambda b, h: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lq, Lk), mask_idx, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, Lq, Dp), lambda b, h: (b, h, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, Lq, Dp), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * (Lq * Lk * Dp + Lq * Lk * Dp),
            bytes_accessed=4 * B * H * (Lq * Dp * 2 + Lk * Dp * 2),
            transcendentals=B * H * Lq * Lk,
        ),
    )(qp, kp, vp, scale1d, bias_p, mask_arr)
    return out[:, :, :L, :D]


def window_attention(q, k, v, logit_scale, bias, mask=None,
                     use_pallas: Optional[bool] = None, interpret: bool = False,
                     layout: str = "bhld"):
    """Fused SwinV2 cosine window attention. Shapes:
    q/k/v (B_, H, L, D) — or (B_, L, H, D) with layout="blhd", the
    transpose-free fast path — logit_scale (H,), bias (H, L, L),
    mask (B_, L, L) additive (callers tile the per-window-type mask over
    the batch).

    Backend choice: measured on v5e (B=256,H=4,L=64,D=32) the XLA batched
    formulation runs ~488us vs ~1227us for the per-window Pallas kernel —
    one grid program per (window, head) is too fine and the D->128 lane
    padding wastes 4x MXU occupancy. XLA is therefore the default; the
    Pallas path stays available via TORCHOK_WINDOW_ATTN_PALLAS=1 and for the
    planned multi-window blocked rewrite.
    """
    if use_pallas is None:
        import os
        use_pallas = os.environ.get("TORCHOK_WINDOW_ATTN_PALLAS", "0") == "1" \
            and jax.default_backend() == "tpu"
    if use_pallas:
        if mask is not None and mask.shape[0] != q.shape[0]:
            # kernel indexes the mask per window-batch row; expand compact
            # (nW, L, L) masks (opt-in path: correctness over HBM thrift)
            mask = jnp.tile(mask, (q.shape[0] // mask.shape[0], 1, 1))
        if layout == "blhd":  # pallas kernel expects head-major blocks
            out = _window_attention_pallas(q.transpose(0, 2, 1, 3),
                                           k.transpose(0, 2, 1, 3),
                                           v.transpose(0, 2, 1, 3),
                                           logit_scale, bias, mask)
            return out.transpose(0, 2, 1, 3)
        return _window_attention_pallas(q, k, v, logit_scale, bias, mask)
    return _window_attention_xla(q, k, v, logit_scale, bias, mask, layout)
