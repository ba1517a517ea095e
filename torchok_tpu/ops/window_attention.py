"""Fused SwinV2 window attention.

The hot op of the Swin/DaViT family (SURVEY.md §5 "long-context analogs"):
block-diagonal attention over (shifted) spatial windows with cosine
similarity, learned per-head temperature, and continuous relative position
bias.

Two execution paths:

* ``_window_attention_xla`` — batched einsum formulation; windows ride the
  batch dimension so every matmul lands on the MXU.
* ``_window_attention_pallas_mw`` — a Pallas TPU kernel fusing the q/k
  normalization, cosine-logits matmul, bias add, per-window compact mask
  lookup, softmax and PV matmul in VMEM, G windows x one head per grid
  step; wrapped in ``_window_attention_hybrid`` (custom_vjp) with an XLA
  recompute backward so it is trainable. Opt-in via
  TORCHOK_WINDOW_ATTN_PALLAS=1; numerics validated against the XLA path in
  tests (interpret mode on CPU).
"""
from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# SwinV2 clamps the learned log temperature at ln(100) (natural log): the
# reference's clamp(max=log(100)) caps the effective scale at 100.
LN_100 = math.log(100.0)


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
    scale = jnp.exp(jnp.minimum(logit_scale.astype(jnp.float32), LN_100))
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


def _wa_kernel_mw(q_ref, k_ref, v_ref, scale_ref, bias_ref, mask_ref, out_ref,
                  *, G, n_mask):
    """G windows x one head per program: fused cosine attention in VMEM.
    q/k/v blocks (G, 1, L, D); bias (1, L, L) for this head; mask holds ALL
    n_mask compact window-type masks (n_mask, L, L) — each window g picks
    its row by global window id (grid dim 0 walks window blocks; window
    order is batch-major, so id % nW is the window type)."""
    head = pl.program_id(1)
    blk = pl.program_id(0)
    scale = jnp.exp(jnp.minimum(scale_ref[head], LN_100))
    bias_f = bias_ref[0].astype(jnp.float32)
    for g in range(G):  # static unroll
        q = q_ref[g, 0].astype(jnp.float32)
        k = k_ref[g, 0].astype(jnp.float32)
        v = v_ref[g, 0]
        qn = q * jax.lax.rsqrt(jnp.sum(q * q, axis=-1, keepdims=True) + 1e-12)
        kn = k * jax.lax.rsqrt(jnp.sum(k * k, axis=-1, keepdims=True) + 1e-12)
        attn = jnp.dot(qn, kn.T, preferred_element_type=jnp.float32) * scale
        attn = attn + bias_f
        # unconditional: a (1, L, L) mask may be a genuine caller mask, not
        # just the zeros placeholder — the add is trivial next to the matmuls
        w_idx = jax.lax.rem(blk * G + g, n_mask) if n_mask > 1 else 0
        m = mask_ref[pl.dslice(w_idx, 1), :, :]
        attn = attn + m[0].astype(jnp.float32)
        attn = jax.nn.softmax(attn, axis=-1)
        out_ref[g, 0] = jnp.dot(attn.astype(jnp.float32),
                                v.astype(jnp.float32),
                                preferred_element_type=jnp.float32
                                ).astype(out_ref.dtype)


def _window_attention_pallas_mw(q, k, v, logit_scale, bias, mask_arr,
                                windows_per_block: int = 8,
                                interpret: Optional[bool] = None):
    """Multi-window blocked forward. q/k/v (B, H, L, D) head-major; mask_arr
    is the COMPACT (nW, L, L) per-window-type mask ((1, L, L) zeros when
    unshifted)."""
    B, H, L, D = q.shape
    if interpret is None:  # simulated-CPU runs always interpret
        interpret = jax.default_backend() != "tpu"
    G = windows_per_block
    while B % G:
        G //= 2
    n_mask = mask_arr.shape[0]

    kernel = functools.partial(_wa_kernel_mw, G=G, n_mask=n_mask)
    return pl.pallas_call(
        kernel,
        grid=(B // G, H),
        in_specs=[
            pl.BlockSpec((G, 1, L, D), lambda i, h: (i, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, 1, L, D), lambda i, h: (i, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, 1, L, D), lambda i, h: (i, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # (H,) scales
            pl.BlockSpec((1, L, L), lambda i, h: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_mask, L, L), lambda i, h: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((G, 1, L, D), lambda i, h: (i, h, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, L, D), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * L * L * D,
            bytes_accessed=2 * B * H * L * D * 4,
            transcendentals=B * H * L * L,
        ),
        interpret=interpret,
    )(q, k, v, logit_scale.reshape(H).astype(jnp.float32), bias, mask_arr)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def _window_attention_hybrid(q, k, v, logit_scale, bias, mask_arr,
                             interpret=None):
    """Pallas fused forward + XLA recompute backward (pallas_call has no
    autodiff rule). mask_arr is always an array — (1, L, L) zeros when the
    block is unshifted."""
    return _window_attention_pallas_mw(q, k, v, logit_scale, bias, mask_arr,
                                       interpret=interpret)


def _hybrid_fwd(q, k, v, logit_scale, bias, mask_arr, interpret=None):
    out = _window_attention_pallas_mw(q, k, v, logit_scale, bias, mask_arr,
                                      interpret=interpret)
    return out, (q, k, v, logit_scale, bias, mask_arr)


def _hybrid_bwd(interpret, res, g):
    q, k, v, logit_scale, bias, mask_arr = res
    _, vjp = jax.vjp(
        lambda q_, k_, v_, s_, b_: _window_attention_xla(q_, k_, v_, s_, b_,
                                                         mask_arr),
        q, k, v, logit_scale, bias)
    dq, dk, dv, ds, db = vjp(g)
    return dq, dk, dv, ds, db, jnp.zeros_like(mask_arr)


_window_attention_hybrid.defvjp(_hybrid_fwd, _hybrid_bwd)


def window_attention(q, k, v, logit_scale, bias, mask=None,
                     use_pallas: Optional[bool] = None, interpret: bool = False,
                     layout: str = "bhld"):
    """Fused SwinV2 cosine window attention. Shapes:
    q/k/v (B_, H, L, D) — or (B_, L, H, D) with layout="blhd", the
    transpose-free fast path — logit_scale (H,), bias (H, L, L),
    mask (B_, L, L) additive (callers tile the per-window-type mask over
    the batch).

    Backend choice: XLA by default. ``use_pallas=True`` opts into the
    round-2 multi-window blocked kernel (fused forward, XLA recompute
    backward via custom_vjp) — kept for comparison, but superseded by
    ``ops/swin_attention.fused_swin_attention``, the round-3 fully fused
    forward+backward kernel that also folds window partition/reverse into
    its BlockSpecs and is what SwinV2 dispatches to on TPU (see
    TORCHOK_WINDOW_ATTN_PALLAS there).
    """
    if use_pallas is None:
        use_pallas = False
    if use_pallas:
        L = bias.shape[-1]
        if mask is None:
            mask_arr = jnp.zeros((1, L, L), jnp.float32)
        elif mask.shape[0] != q.shape[0]:
            mask_arr = mask  # compact (nW, L, L): the kernel indexes per window
        else:
            mask_arr = mask  # fully tiled also works (n_mask == B)
        # interpret=True forces interpreter mode even on TPU (kernel numerics
        # validation); False/None keeps the backend-derived default
        interp = True if interpret else None
        if layout == "blhd":  # kernel expects head-major blocks
            out = _window_attention_hybrid(q.transpose(0, 2, 1, 3),
                                           k.transpose(0, 2, 1, 3),
                                           v.transpose(0, 2, 1, 3),
                                           logit_scale, bias, mask_arr, interp)
            return out.transpose(0, 2, 1, 3)
        return _window_attention_hybrid(q, k, v, logit_scale, bias, mask_arr,
                                        interp)
    return _window_attention_xla(q, k, v, logit_scale, bias, mask, layout)
