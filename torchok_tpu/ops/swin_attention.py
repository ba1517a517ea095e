"""Fully fused SwinV2 shifted-window attention (Pallas TPU), forward AND
backward.

Reference semantics: torchok/models/backbones/swin.py:84-283 — cosine
attention with learned per-head log temperature clamped at log(100),
continuous relative position bias, additive -100 mask between regions of a
shifted window. The round-2 xplane profile of the XLA formulation showed
where a swinv2_tiny_256 train step actually goes: ~19% window-partition
relayout copies, ~12% unfused f32 softmax chain, ~22% XLA panic-remat from
the (B*nW, H, L, L) logits tensor living in HBM. This kernel removes all
three at once:

* **No partition/reverse copies.** The qkv projection runs on the
  *unpartitioned* (B, Hp, Wp, 3C) spatial tensor (a Dense is pointwise over
  positions, so it commutes with windowing) and the kernel's BlockSpecs walk
  one row of windows per program — the (ws, Wp) stripe is DMA'd straight
  from HBM, windows are sliced in VMEM.
* **Cyclic shift stays outside but runs on the thin tensor**: roll commutes
  with pointwise ops, so SwinBlock rolls the C-wide activations once before
  qkv and once after proj instead of materializing rolled/partitioned
  copies of the 3C-wide qkv.
* **Logits never touch HBM.** Cosine normalization, the QK^T matmul, bias,
  compact per-window-type mask, f32 softmax and the PV matmul all happen in
  VMEM per window.
* **Fused backward.** A second kernel recomputes attention per window in
  VMEM and emits dqkv in one pass; dbias/dscale accumulate across the
  sequential grid via output revisiting. (Round 2's kernel lost end-to-end
  precisely because its backward was an XLA recompute of the unfused path.)

Multi-chip: when a mesh with >1 device is active
(torchok_tpu.parallel.get_current_mesh), both kernels run under
``shard_map`` over the batch axis with dbias/dscale psummed in-body, so the
op composes with the engine's GSPMD dp/fsdp step.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax import shard_map
from jax.sharding import PartitionSpec as P

from torchok_tpu.ops.window_attention import LN_100  # single source: ln(100) clamp
_EPS = 1e-12

# VMEM budget gate: bias (+dbias in bwd) and the revisited accumulators must
# stay resident for the whole grid. Above this estimate the caller should
# fall back to the XLA formulation (e.g. swinv2_large window-24, L=576).
_VMEM_BUDGET_BYTES = 10 * 1024 * 1024


def fused_attention_vmem_estimate(ws: int, wp: int, nheads: int, c: int) -> int:
    """Rough backward-pass VMEM footprint (the larger of the two kernels)."""
    L = ws * ws
    ngx = max(wp // ws, 1)
    pack = _pick_pack(ngx, L)  # MUST match the dispatch-time rule
    Lp = pack * L
    bias = nheads * Lp * Lp * 4 * 2        # packed bias + dbias accumulator
    blocks = (2 * (3 * c) + 2 * c + 2 * (3 * c)) * ws * wp * 2  # qkv/dout/dqkv, dbl-buffered bf16
    mask = (ngx // pack) * Lp * Lp * 4
    scratch = nheads * Lp * 4 + 4 * Lp * Lp * 4
    return bias + blocks + mask + scratch


def _norm_rows(x):
    return x * jax.lax.rsqrt(jnp.sum(x * x, axis=-1, keepdims=True) + _EPS)


def window_partition(x: jnp.ndarray, ws: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B*nW, ws*ws, C)"""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws * ws, c)


def window_reverse(windows: jnp.ndarray, ws: int, h: int, w: int) -> jnp.ndarray:
    """(B*nW, ws*ws, C) -> (B, H, W, C)"""
    c = windows.shape[-1]
    b = windows.shape[0] // (h * w // ws // ws)
    x = windows.reshape(b, h // ws, w // ws, ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, c)


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------
def _fwd_kernel(scale_ref, qkv_ref, *rest, ws, nheads, ngx,
                has_mask, pack=1, cosine=True, windowed=False,
                has_bias=True):
    """One row of ``ngx`` windows per program. Every matmul is a single
    batched dot_general over the window axis — per-window unrolling issued
    24+ tiny VPU/MXU ops per row and ran ~5x slower (round-3 TPU probe).

    ``pack`` merges that many adjacent windows into one attention group on
    the SUBLANE (token) axis: with L=64 and pack=2 the matmuls become
    128x128 on M/N (full MXU face) at 2x masked FLOPs; ``bias_ref`` /
    ``mask_ref`` arrive pre-packed block-diagonally with -1e9 between
    windows, which makes the packed softmax exactly block-diagonal."""
    if has_bias:
        bias_ref, *rest = rest
    if has_mask:
        mask_ref, out_ref = rest
    else:
        (out_ref,) = rest
    L = ws * ws
    Lp = pack * L
    ng = ngx // pack
    c3 = qkv_ref.shape[-1]
    C = c3 // 3
    D = C // nheads
    if windowed:
        # pre-partitioned (G, L, 3C) block: tokens already window-major, no
        # relayout needed — the mode for sublane-misaligned windows (ws=7
        # DaViT / ws=14 GCViT), where Mosaic rejects the spatial transpose
        row = qkv_ref[0]
    else:
        # (ws, Wp, 3C) -> (ngx, L, 3C): major-dim swap, cheap VMEM relayout
        row = qkv_ref[0].reshape(ws, ngx, ws, c3).transpose(1, 0, 2, 3)
        row = row.reshape(ng, Lp, c3)
    bn = (((2,), (2,)), ((0,), (0,)))  # batched contract-last
    heads = []
    for h in range(nheads):
        v = row[:, :, 2 * C + h * D:2 * C + (h + 1) * D]
        if cosine:
            q = row[:, :, h * D:(h + 1) * D].astype(jnp.float32)
            k = row[:, :, C + h * D:C + (h + 1) * D].astype(jnp.float32)
            # normalize in f32, matmul in the input dtype (f32xf32 has no
            # native MXU path; unit vectors round to bf16 at ~2^-9 relative)
            qn = _norm_rows(q).astype(row.dtype)
            kn = _norm_rows(k).astype(row.dtype)
        else:  # plain scaled dot-product (DaViT / GCViT windows)
            qn = row[:, :, h * D:(h + 1) * D]
            kn = row[:, :, C + h * D:C + (h + 1) * D]
        logits = jax.lax.dot_general(qn, kn, bn,
                                     preferred_element_type=jnp.float32)
        logits = logits * scale_ref[0, h]
        if has_bias:
            logits = logits + bias_ref[h][None]
        if has_mask:
            logits = logits + mask_ref[...]
        a = jax.nn.softmax(logits, axis=-1).astype(row.dtype)
        heads.append(jax.lax.dot_general(
            a, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32))
    o = jnp.concatenate(heads, axis=-1)  # (ng, Lp, C)
    if windowed:
        out_ref[0] = o.astype(out_ref.dtype)
    else:
        o = o.reshape(ngx, ws, ws, C).transpose(1, 0, 2, 3)
        out_ref[0] = o.reshape(ws, ngx * ws, C).astype(out_ref.dtype)


def _bwd_kernel(scale_ref, qkv_ref, *rest,
                ws, nheads, ngx, has_mask, pack=1, cosine=True,
                windowed=False, has_bias=True):
    # inputs: [bias], dout, [mask]; outputs: dqkv, [dbias], [dscale].
    # dbias exists iff the bias input does; dscale only in cosine mode
    # (the plain dot-product callers pass a constant head_dim**-0.5)
    bias_ref = None
    if has_bias:
        bias_ref, *rest = rest
    dout_ref, *rest = rest
    mask_ref = None
    if has_mask:
        mask_ref, *rest = rest
    dqkv_ref, *rest = rest
    dbias_ref = None
    if has_bias:
        dbias_ref, *rest = rest
    dscale_ref = rest[0] if cosine else None
    L = ws * ws
    Lp = pack * L
    ng = ngx // pack
    c3 = qkv_ref.shape[-1]
    C = c3 // 3
    D = C // nheads

    is_first = jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)

    @pl.when(is_first)
    def _():
        if has_bias:
            dbias_ref[...] = jnp.zeros(dbias_ref.shape, dbias_ref.dtype)
        if cosine:
            dscale_ref[...] = jnp.zeros(dscale_ref.shape, dscale_ref.dtype)

    if windowed:
        row = qkv_ref[0]
        drow = dout_ref[0]
    else:
        row = qkv_ref[0].reshape(ws, ngx, ws, c3).transpose(1, 0, 2, 3)
        row = row.reshape(ng, Lp, c3)
        drow = dout_ref[0].reshape(ws, ngx, ws, C).transpose(1, 0, 2, 3)
        drow = drow.reshape(ng, Lp, C)
    dheads = []
    for h in range(nheads):
        v = row[:, :, 2 * C + h * D:2 * C + (h + 1) * D]
        do = drow[:, :, h * D:(h + 1) * D]
        s = scale_ref[0, h]

        if cosine:
            q = row[:, :, h * D:(h + 1) * D].astype(jnp.float32)
            k = row[:, :, C + h * D:C + (h + 1) * D].astype(jnp.float32)
            rq = jax.lax.rsqrt(jnp.sum(q * q, -1, keepdims=True) + _EPS)
            rk = jax.lax.rsqrt(jnp.sum(k * k, -1, keepdims=True) + _EPS)
            qn, kn = (q * rq).astype(row.dtype), (k * rk).astype(row.dtype)
        else:
            qn = row[:, :, h * D:(h + 1) * D]
            kn = row[:, :, C + h * D:C + (h + 1) * D]
        cos = jax.lax.dot_general(qn, kn, (((2,), (2,)), ((0,), (0,))),
                                  preferred_element_type=jnp.float32)
        logits = cos * s
        if has_bias:
            logits = logits + bias_ref[h][None]
        if has_mask:
            logits = logits + mask_ref[...]
        a32 = jax.nn.softmax(logits, axis=-1)
        a = a32.astype(row.dtype)

        # dV[b,k,d] = sum_q A[b,q,k] dO[b,q,d]
        dv = jax.lax.dot_general(a, do, (((1,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        # dA[b,q,k] = sum_d dO[b,q,d] V[b,k,d]
        da = jax.lax.dot_general(do, v, (((2,), (2,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        # softmax backward -> dlogits
        dl = a32 * (da - jnp.sum(da * a32, axis=-1, keepdims=True))

        if has_bias:
            dbias_ref[h] = dbias_ref[h] + jnp.sum(dl, axis=0)
        if cosine:
            dscale_ref[h, :] = dscale_ref[h, :] + jnp.sum(dl * cos,
                                                          axis=(0, 2))

        dls = (dl * s).astype(row.dtype)
        # dqn[b,q,d] = sum_k dls[b,q,k] kn[b,k,d]
        dqn = jax.lax.dot_general(dls, kn, (((2,), (1,)), ((0,), (0,))),
                                  preferred_element_type=jnp.float32)
        # dkn[b,k,d] = sum_q dls[b,q,k] qn[b,q,d]
        dkn = jax.lax.dot_general(dls, qn, (((1,), (1,)), ((0,), (0,))),
                                  preferred_element_type=jnp.float32)
        if cosine:
            # through the f32 row normalization: d(x*r), r=rsqrt(ss+eps)
            dq = rq * dqn - (rq ** 3) * q * jnp.sum(q * dqn, -1, keepdims=True)
            dk = rk * dkn - (rk ** 3) * k * jnp.sum(k * dkn, -1, keepdims=True)
        else:
            dq, dk = dqn, dkn
        dheads.append((dq, dk, dv))

    dq_all = jnp.concatenate([t[0] for t in dheads], axis=-1)
    dk_all = jnp.concatenate([t[1] for t in dheads], axis=-1)
    dv_all = jnp.concatenate([t[2] for t in dheads], axis=-1)
    dtile_out = jnp.concatenate([dq_all, dk_all, dv_all], axis=-1)  # (ngx,L,3C)
    if windowed:
        dqkv_ref[0] = dtile_out.astype(dqkv_ref.dtype)
    else:
        dtile_out = dtile_out.reshape(ngx, ws, ws, c3).transpose(1, 0, 2, 3)
        dqkv_ref[0] = dtile_out.reshape(ws, ngx * ws, c3).astype(dqkv_ref.dtype)


def _fwd_kernel_global(scale_ref, kv_ref, qg_ref, bias_ref, out_ref, *,
                       nheads):
    """GCViT global-query window attention, forward: every window of an
    image attends with that image's shared global queries (reference
    torchok/models/backbones/gcvit.py via timm WindowAttentionGlobal).
    One group of G windows per program; q is broadcast across the group."""
    G, L, c2 = kv_ref.shape[1:]
    C = c2 // 2
    D = C // nheads
    kv = kv_ref[0]              # (G, L, 2C)
    qg = qg_ref[0]              # (L, C) — shared across the image's windows
    bn = (((2,), (2,)), ((0,), (0,)))
    heads = []
    for h in range(nheads):
        q = jnp.broadcast_to(qg[:, h * D:(h + 1) * D][None], (G, L, D))
        k = kv[:, :, h * D:(h + 1) * D]
        v = kv[:, :, C + h * D:C + (h + 1) * D]
        logits = jax.lax.dot_general(q.astype(kv.dtype), k, bn,
                                     preferred_element_type=jnp.float32)
        logits = logits * scale_ref[0, h] + bias_ref[h][None]
        a = jax.nn.softmax(logits, axis=-1).astype(kv.dtype)
        heads.append(jax.lax.dot_general(
            a, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32))
    out_ref[0] = jnp.concatenate(heads, axis=-1).astype(out_ref.dtype)


def _bwd_kernel_global(scale_ref, kv_ref, qg_ref, bias_ref, dout_ref,
                       dkv_ref, dqg_ref, dbias_ref, *, nheads):
    """Backward for the global-query mode. dqg accumulates across the
    image's window groups (output revisited over the minor grid dim);
    dbias accumulates across the whole grid."""
    G, L, c2 = kv_ref.shape[1:]
    C = c2 // 2
    D = C // nheads

    @pl.when(jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0))
    def _():
        dbias_ref[...] = jnp.zeros(dbias_ref.shape, dbias_ref.dtype)

    @pl.when(pl.program_id(1) == 0)
    def _():
        dqg_ref[...] = jnp.zeros(dqg_ref.shape, dqg_ref.dtype)

    kv = kv_ref[0]
    qg = qg_ref[0]
    dout = dout_ref[0]          # (G, L, C)
    dk_parts, dv_parts, dq_parts = [], [], []
    for h in range(nheads):
        s = scale_ref[0, h]
        q = jnp.broadcast_to(qg[:, h * D:(h + 1) * D][None], (G, L, D))
        q = q.astype(kv.dtype)
        k = kv[:, :, h * D:(h + 1) * D]
        v = kv[:, :, C + h * D:C + (h + 1) * D]
        do = dout[:, :, h * D:(h + 1) * D]

        logits = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                                     preferred_element_type=jnp.float32)
        logits = logits * s + bias_ref[h][None]
        a32 = jax.nn.softmax(logits, axis=-1)
        a = a32.astype(kv.dtype)

        dv = jax.lax.dot_general(a, do, (((1,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        da = jax.lax.dot_general(do, v, (((2,), (2,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        dl = a32 * (da - jnp.sum(da * a32, axis=-1, keepdims=True))
        dbias_ref[h] = dbias_ref[h] + jnp.sum(dl, axis=0)
        dls = (dl * s).astype(kv.dtype)
        # dq[g,q,d] = sum_k dls[g,q,k] k[g,k,d]; windows sum into shared q
        dq = jax.lax.dot_general(dls, k, (((2,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        dq_parts.append(jnp.sum(dq, axis=0))
        dk_parts.append(jax.lax.dot_general(
            dls, q, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32))
        dv_parts.append(dv)
    dkv_ref[0] = jnp.concatenate(
        [jnp.concatenate(dk_parts, axis=-1),
         jnp.concatenate(dv_parts, axis=-1)], axis=-1).astype(dkv_ref.dtype)
    dqg_ref[0] = dqg_ref[0] + jnp.concatenate(dq_parts, axis=-1)


# ---------------------------------------------------------------------------
# pallas_call plumbing
# ---------------------------------------------------------------------------
_PACK = 2          # windows merged per attention group when ngx divides
_NEG = -1e9        # cross-window block fill (softmax-exact block diagonality)


def _pick_pack(ngx: int, L: int) -> int:
    # pack only when it helps fill the 128-lane MXU face and divides the row
    return _PACK if ngx % _PACK == 0 and L < 128 else 1


def _pick_group(nW: int) -> int:
    """Windows per program for the windowed-input mode: enough to amortize
    grid overhead, while dividing the window count."""
    for g in (8, 4, 2, 1):
        if nW % g == 0:
            return g
    return 1


def _pack_bias(bias, pack):
    """(H, L, L) -> (H, pL, pL): bias on diagonal blocks, -1e9 elsewhere."""
    if pack == 1:
        return bias
    H, L, _ = bias.shape
    out = jnp.full((H, pack * L, pack * L), _NEG, jnp.float32)
    for i in range(pack):
        out = out.at[:, i * L:(i + 1) * L, i * L:(i + 1) * L].set(bias)
    return out


def _pack_mask(mask, pack):
    """(nW, L, L) -> (nW//pack, pL, pL): per-window masks on the diagonal
    (adjacent windows are consecutive in nW); cross blocks 0 (the packed
    bias already carries -1e9 there)."""
    if pack == 1:
        return mask
    nW, L, _ = mask.shape
    m4 = mask.reshape(nW // pack, pack, L, L)
    out = jnp.zeros((nW // pack, pack * L, pack * L), jnp.float32)
    for i in range(pack):
        out = out.at[:, i * L:(i + 1) * L, i * L:(i + 1) * L].set(m4[:, i])
    return out


def _fwd_pallas(qkv, scale_row, bias, mask, *, ws, nheads, interpret,
                cosine=True, windowed=False):
    C = qkv.shape[-1] // 3
    c3 = qkv.shape[-1]
    L = ws * ws
    if windowed:
        # (B, nW, L, 3C) pre-partitioned input: no in-kernel relayout (the
        # mode for sublane-misaligned window sizes); mask unsupported here
        assert mask is None, "windowed fused mode takes no shift mask"
        B, nW = qkv.shape[0], qkv.shape[1]
        G = _pick_group(nW)
        has_bias = bias is not None
        kernel = functools.partial(_fwd_kernel, ws=ws, nheads=nheads, ngx=G,
                                   has_mask=False, pack=1, cosine=cosine,
                                   windowed=True, has_bias=has_bias)
        in_specs = [
            pl.BlockSpec((1, nheads), lambda b, g: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, G, L, c3), lambda b, g: (b, g, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        args = [scale_row, qkv]
        if has_bias:
            in_specs.append(pl.BlockSpec((nheads, L, L),
                                         lambda b, g: (0, 0, 0),
                                         memory_space=pltpu.VMEM))
            args.append(bias)
        return pl.pallas_call(
            kernel,
            grid=(B, nW // G),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, G, L, C), lambda b, g: (b, g, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, nW, L, C), qkv.dtype),
            cost_estimate=pl.CostEstimate(
                flops=4 * B * nW * L * nheads * L * (C // nheads),
                bytes_accessed=qkv.size * qkv.dtype.itemsize * 2,
                transcendentals=B * nW * L * L,
            ),
            interpret=interpret,
        )(*args)
    B, Hp, Wp, _ = qkv.shape
    ngy, ngx = Hp // ws, Wp // ws
    pack = _pick_pack(ngx, L)
    Lp = pack * L
    has_mask = mask is not None
    # the packed bias doubles as the -1e9 cross-window block mask, so the
    # kernel keeps a (zero) bias input whenever windows share a group even
    # if the caller passed none (its dbias is discarded in _bwd_pallas)
    kernel_bias = bias is not None or pack > 1
    if kernel_bias and bias is None:
        bias = jnp.zeros((nheads, L, L), jnp.float32)
    kernel = functools.partial(_fwd_kernel, ws=ws, nheads=nheads, ngx=ngx,
                               has_mask=has_mask, pack=pack, cosine=cosine,
                               has_bias=kernel_bias)
    in_specs = [
        pl.BlockSpec((1, nheads), lambda b, g: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, ws, Wp, c3), lambda b, g: (b, g, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [scale_row, qkv]
    if kernel_bias:
        in_specs.append(pl.BlockSpec((nheads, Lp, Lp),
                                     lambda b, g: (0, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(_pack_bias(bias, pack))
    if has_mask:
        in_specs.append(pl.BlockSpec((ngx // pack, Lp, Lp),
                                     lambda b, g: (g, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(_pack_mask(mask, pack))
    return pl.pallas_call(
        kernel,
        grid=(B, ngy),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, ws, Wp, C), lambda b, g: (b, g, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Hp, Wp, C), qkv.dtype),
        cost_estimate=pl.CostEstimate(
            # USEFUL flops (unpacked): the packed matmuls burn 2x on masked
            # cross-window blocks, but counting those would inflate the
            # bench's achieved-TFLOPs/MFU numbers
            flops=4 * B * Hp * Wp * nheads * L * (C // nheads),
            bytes_accessed=qkv.size * qkv.dtype.itemsize * 2,
            transcendentals=B * Hp * Wp * Lp,
        ),
        interpret=interpret,
    )(*args)


def _bwd_pallas(qkv, scale_row, bias, mask, dout, *, ws, nheads, interpret,
                cosine=True, windowed=False):
    c3 = qkv.shape[-1]
    C = c3 // 3
    L = ws * ws
    if windowed:
        assert mask is None, "windowed fused mode takes no shift mask"
        B, nW = qkv.shape[0], qkv.shape[1]
        G = _pick_group(nW)
        has_bias = bias is not None
        kernel = functools.partial(_bwd_kernel, ws=ws, nheads=nheads, ngx=G,
                                   has_mask=False, pack=1, cosine=cosine,
                                   windowed=True, has_bias=has_bias)
        in_specs = [
            pl.BlockSpec((1, nheads), lambda b, g: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, G, L, c3), lambda b, g: (b, g, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        args = [scale_row, qkv]
        if has_bias:
            in_specs.append(pl.BlockSpec((nheads, L, L),
                                         lambda b, g: (0, 0, 0),
                                         memory_space=pltpu.VMEM))
            args.append(bias)
        in_specs.append(pl.BlockSpec((1, G, L, C), lambda b, g: (b, g, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(dout)
        out_specs = [pl.BlockSpec((1, G, L, c3), lambda b, g: (b, g, 0, 0),
                                  memory_space=pltpu.VMEM)]
        out_shape = [jax.ShapeDtypeStruct((B, nW, L, c3), qkv.dtype)]
        if has_bias:
            out_specs.append(pl.BlockSpec((nheads, L, L),
                                          lambda b, g: (0, 0, 0),
                                          memory_space=pltpu.VMEM))
            out_shape.append(jax.ShapeDtypeStruct((nheads, L, L),
                                                  jnp.float32))
        if cosine:
            out_specs.append(pl.BlockSpec((nheads, L), lambda b, g: (0, 0),
                                          memory_space=pltpu.VMEM))
            out_shape.append(jax.ShapeDtypeStruct((nheads, L), jnp.float32))
        return pl.pallas_call(
            kernel,
            grid=(B, nW // G),
            in_specs=in_specs,
            out_specs=tuple(out_specs),
            out_shape=tuple(out_shape),
            cost_estimate=pl.CostEstimate(
                flops=12 * B * nW * L * nheads * L * (C // nheads),
                bytes_accessed=qkv.size * qkv.dtype.itemsize * 3,
                transcendentals=B * nW * L * L,
            ),
            interpret=interpret,
        )(*args)
    B, Hp, Wp, _ = qkv.shape
    ngy, ngx = Hp // ws, Wp // ws
    pack = _pick_pack(ngx, L)
    Lp = pack * L
    has_mask = mask is not None
    has_bias = bias is not None
    # see _fwd_pallas: packed groups need the (zero) bias as block mask;
    # the resulting dbias is discarded below when the caller passed none
    kernel_bias = has_bias or pack > 1
    if kernel_bias and bias is None:
        bias = jnp.zeros((nheads, L, L), jnp.float32)
    kernel = functools.partial(_bwd_kernel, ws=ws, nheads=nheads, ngx=ngx,
                               has_mask=has_mask, pack=pack, cosine=cosine,
                               has_bias=kernel_bias)
    in_specs = [
        pl.BlockSpec((1, nheads), lambda b, g: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, ws, Wp, c3), lambda b, g: (b, g, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [scale_row, qkv]
    if kernel_bias:
        in_specs.append(pl.BlockSpec((nheads, Lp, Lp),
                                     lambda b, g: (0, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(_pack_bias(bias, pack))
    in_specs.append(pl.BlockSpec((1, ws, Wp, C), lambda b, g: (b, g, 0, 0),
                                 memory_space=pltpu.VMEM))
    args.append(dout)
    if has_mask:
        in_specs.append(pl.BlockSpec((ngx // pack, Lp, Lp),
                                     lambda b, g: (g, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(_pack_mask(mask, pack))
    out_specs = [pl.BlockSpec((1, ws, Wp, c3), lambda b, g: (b, g, 0, 0),
                              memory_space=pltpu.VMEM)]
    out_shapes = [jax.ShapeDtypeStruct((B, Hp, Wp, c3), qkv.dtype)]
    if kernel_bias:
        out_specs.append(pl.BlockSpec((nheads, Lp, Lp),
                                      lambda b, g: (0, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shapes.append(jax.ShapeDtypeStruct((nheads, Lp, Lp),
                                               jnp.float32))
    if cosine:
        out_specs.append(pl.BlockSpec((nheads, Lp), lambda b, g: (0, 0),
                                      memory_space=pltpu.VMEM))
        out_shapes.append(jax.ShapeDtypeStruct((nheads, Lp), jnp.float32))
    outs = list(pl.pallas_call(
        kernel,
        grid=(B, ngy),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        cost_estimate=pl.CostEstimate(
            # useful flops (see forward): masked cross-window work excluded
            flops=12 * B * Hp * Wp * nheads * L * (C // nheads),
            bytes_accessed=qkv.size * qkv.dtype.itemsize * 3,
            transcendentals=B * Hp * Wp * Lp,
        ),
        interpret=interpret,
    )(*args))
    dqkv = outs.pop(0)
    dbias_p = outs.pop(0) if kernel_bias else None
    dscale_p = outs.pop(0) if cosine else None
    result = [dqkv]
    if has_bias:
        if pack > 1:
            # fold the packed diagonal blocks back: cross blocks carry
            # exactly zero gradient (attention weights softmax(-1e9) = 0)
            dbias_p = sum(dbias_p[:, i * L:(i + 1) * L, i * L:(i + 1) * L]
                          for i in range(pack))
        result.append(dbias_p)
    if cosine:
        if pack > 1:
            dscale_p = sum(dscale_p[:, i * L:(i + 1) * L]
                           for i in range(pack))
        result.append(dscale_p)
    return tuple(result)


def _fwd_pallas_global(kv, qg, scale_row, bias, *, ws, nheads, interpret):
    B, nW, L, c2 = kv.shape
    C = c2 // 2
    G = _pick_group(nW)
    kernel = functools.partial(_fwd_kernel_global, nheads=nheads)
    return pl.pallas_call(
        kernel,
        grid=(B, nW // G),
        in_specs=[
            pl.BlockSpec((1, nheads), lambda b, g: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, G, L, c2), lambda b, g: (b, g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, C), lambda b, g: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nheads, L, L), lambda b, g: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, G, L, C), lambda b, g: (b, g, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, nW, L, C), kv.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * nW * L * nheads * L * (C // nheads),
            bytes_accessed=kv.size * kv.dtype.itemsize * 2,
            transcendentals=B * nW * L * L,
        ),
        interpret=interpret,
    )(scale_row, kv, qg, bias)


def _bwd_pallas_global(kv, qg, scale_row, bias, dout, *, ws, nheads,
                       interpret):
    B, nW, L, c2 = kv.shape
    C = c2 // 2
    G = _pick_group(nW)
    kernel = functools.partial(_bwd_kernel_global, nheads=nheads)
    return pl.pallas_call(
        kernel,
        grid=(B, nW // G),
        in_specs=[
            pl.BlockSpec((1, nheads), lambda b, g: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, G, L, c2), lambda b, g: (b, g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, C), lambda b, g: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nheads, L, L), lambda b, g: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, L, C), lambda b, g: (b, g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, G, L, c2), lambda b, g: (b, g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, C), lambda b, g: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nheads, L, L), lambda b, g: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, nW, L, c2), kv.dtype),     # dkv
            jax.ShapeDtypeStruct((B, L, C), jnp.float32),       # dqg (revisited per b)
            jax.ShapeDtypeStruct((nheads, L, L), jnp.float32),  # dbias (revisited)
        ),
        cost_estimate=pl.CostEstimate(
            flops=12 * B * nW * L * nheads * L * (C // nheads),
            bytes_accessed=kv.size * kv.dtype.itemsize * 3,
            transcendentals=B * nW * L * L,
        ),
        interpret=interpret,
    )(scale_row, kv, qg, bias, dout)


def _maybe_shard(fn, mesh, n_in_batch_sharded, n_out_batch_sharded,
                 n_out_summed, batch):
    """Wrap a pallas caller in shard_map over the mesh's data axes when a
    multi-device mesh is active and the batch divides evenly. Inputs beyond
    the first ``n_in_batch_sharded`` are replicated; outputs beyond the
    first ``n_out_batch_sharded`` are partial sums that the body psums."""
    if mesh is None or mesh.devices.size <= 1:
        return fn
    data_axes = tuple(ax for ax in mesh.axis_names if ax != "model")
    dp = 1
    for ax in data_axes:
        dp *= mesh.shape[ax]
    if dp <= 1 or batch % dp != 0:
        return None  # caller falls back to XLA formulation

    def body(*args):
        outs = fn(*args)
        if not isinstance(outs, tuple):
            return outs
        outs = list(outs)
        for i in range(n_out_batch_sharded, len(outs)):
            outs[i] = jax.lax.psum(outs[i], data_axes)
        return tuple(outs)

    def spec(i, n_sharded):
        return P(data_axes) if i < n_sharded else P()

    n_in = n_in_batch_sharded["n_args"]
    in_specs = tuple(spec(i, n_in_batch_sharded["sharded"]) for i in range(n_in))
    n_out = n_out_batch_sharded + n_out_summed
    if n_out == 1:
        out_specs = P(data_axes)
    else:
        out_specs = tuple(spec(i, n_out_batch_sharded) for i in range(n_out))
    return shard_map(body, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                     check_vma=False)


@functools.lru_cache(maxsize=None)
def _build(ws: int, nheads: int, has_mask: bool, interpret: bool,
           cosine: bool = True, windowed: bool = False,
           has_bias: bool = True):
    """custom_vjp-wrapped fused op for one static (ws, heads, mask?, bias?,
    cosine, layout) config. dbias exists only when a bias is passed; dscale
    only in cosine mode (plain-dot callers use a constant head scale).

    Forward/backward both consult the active mesh at trace time, so the same
    cached op instance works single-chip and under shard_map'd dp/fsdp.
    """
    assert has_bias or not has_mask, "shift masks imply the swin bias path"
    fwd_impl = functools.partial(_fwd_pallas, ws=ws, nheads=nheads,
                                 interpret=interpret, cosine=cosine,
                                 windowed=windowed)
    bwd_impl = functools.partial(_bwd_pallas, ws=ws, nheads=nheads,
                                 interpret=interpret, cosine=cosine,
                                 windowed=windowed)
    nargs = 2 + int(has_bias) + int(has_mask)
    n_summed = int(has_bias) + int(cosine)  # dbias / dscale psums

    def _mesh():
        from torchok_tpu.parallel import get_current_mesh
        return get_current_mesh()

    def _split(rest):
        bias_ = rest[0] if has_bias else None
        mask_ = rest[int(has_bias)] if has_mask else None
        return bias_, mask_

    def _run_fwd(qkv, scale_row, bias, mask):
        def flat(qkv_, scale_, *rest):
            bias_, mask_ = _split(rest)
            return fwd_impl(qkv_, scale_, bias_, mask_)
        args = ((qkv, scale_row) + ((bias,) if has_bias else ())
                + ((mask,) if has_mask else ()))
        wrapped = _maybe_shard(flat, _mesh(),
                               {"n_args": nargs, "sharded": 1}, 1, 0,
                               qkv.shape[0])
        if wrapped is None:
            raise _ShardFallback()
        return wrapped(*args)

    def _run_bwd(qkv, scale_row, bias, mask, g):
        # batch-sharded args (qkv, dout) lead so _maybe_shard's prefix rule
        # shards exactly them and replicates the rest
        def flat(qkv_, dout_, scale_, *rest):
            bias_, mask_ = _split(rest)
            outs = bwd_impl(qkv_, scale_, bias_, mask_, dout_)
            return outs if len(outs) > 1 else outs[0]
        args = ((qkv, g, scale_row) + ((bias,) if has_bias else ())
                + ((mask,) if has_mask else ()))
        wrapped = _maybe_shard(flat, _mesh(),
                               {"n_args": nargs + 1, "sharded": 2}, 1,
                               n_summed, qkv.shape[0])
        if wrapped is None:
            raise _ShardFallback()
        outs = wrapped(*args)
        return outs if isinstance(outs, tuple) else (outs,)

    def _grads(res, g):
        qkv, scale_row, bias, mask = res
        outs = list(_run_bwd(qkv, scale_row, bias, mask, g))
        dqkv = outs.pop(0)
        dbias = outs.pop(0) if has_bias else None
        if cosine:
            dscale = jnp.sum(outs.pop(0), axis=-1).reshape(scale_row.shape)
        else:
            dscale = jnp.zeros_like(scale_row)
        grads = (dqkv, dscale) + ((dbias,) if has_bias else ())
        return grads + ((jnp.zeros_like(mask),) if has_mask else ())

    if has_mask:
        @jax.custom_vjp
        def op(qkv, scale_row, bias, mask):
            return _run_fwd(qkv, scale_row, bias, mask)

        def fwd(qkv, scale_row, bias, mask):
            return op(qkv, scale_row, bias, mask), (qkv, scale_row, bias, mask)

        def bwd(res, g):
            return _grads(res, g)
    elif has_bias:
        @jax.custom_vjp
        def op(qkv, scale_row, bias):
            return _run_fwd(qkv, scale_row, bias, None)

        def fwd(qkv, scale_row, bias):
            return op(qkv, scale_row, bias), (qkv, scale_row, bias, None)

        def bwd(res, g):
            return _grads(res, g)
    else:
        @jax.custom_vjp
        def op(qkv, scale_row):
            return _run_fwd(qkv, scale_row, None, None)

        def fwd(qkv, scale_row):
            return op(qkv, scale_row), (qkv, scale_row, None, None)

        def bwd(res, g):
            return _grads(res, g)

    op.defvjp(fwd, bwd)
    return op


@functools.lru_cache(maxsize=None)
def _build_global(ws: int, nheads: int, interpret: bool):
    """custom_vjp-wrapped fused GLOBAL-query window attention (GCViT):
    kv is per-window, q is the image's shared global-token projection."""
    fwd_impl = functools.partial(_fwd_pallas_global, ws=ws, nheads=nheads,
                                 interpret=interpret)
    bwd_impl = functools.partial(_bwd_pallas_global, ws=ws, nheads=nheads,
                                 interpret=interpret)

    def _mesh():
        from torchok_tpu.parallel import get_current_mesh
        return get_current_mesh()

    @jax.custom_vjp
    def op(kv, qg, scale_row, bias):
        wrapped = _maybe_shard(fwd_impl, _mesh(),
                               {"n_args": 4, "sharded": 2}, 1, 0,
                               kv.shape[0])
        if wrapped is None:
            raise _ShardFallback()
        return wrapped(kv, qg, scale_row, bias)

    def fwd(kv, qg, scale_row, bias):
        return op(kv, qg, scale_row, bias), (kv, qg, scale_row, bias)

    def bwd(res, g):
        kv, qg, scale_row, bias = res

        def flat(kv_, qg_, dout_, scale_, bias_):
            return bwd_impl(kv_, qg_, scale_, bias_, dout_)

        wrapped = _maybe_shard(flat, _mesh(),
                               {"n_args": 5, "sharded": 3}, 2, 1,
                               kv.shape[0])
        if wrapped is None:
            raise _ShardFallback()
        dkv, dqg, dbias = wrapped(kv, qg, g, scale_row, bias)
        return dkv, dqg.astype(qg.dtype), jnp.zeros_like(scale_row), dbias

    op.defvjp(fwd, bwd)
    return op


class _ShardFallback(Exception):
    """Batch does not divide the data axes — caller must use the XLA path."""


# ---------------------------------------------------------------------------
# public entry
# ---------------------------------------------------------------------------
def fused_attention_enabled(ws: int, wp: int, nheads: int, c: int) -> bool:
    """Dispatch policy for the fused kernel.

    TORCHOK_WINDOW_ATTN_PALLAS: "0" disables, "1" forces (interpret mode
    off-TPU — for tests), unset/"auto" enables on TPU when the VMEM
    estimate fits (large-window variants like swinv2_large_window24 fall
    back to the XLA formulation).
    """
    import os
    v = os.environ.get("TORCHOK_WINDOW_ATTN_PALLAS", "auto")
    if v == "0":
        return False
    if v != "1" and jax.default_backend() != "tpu":
        return False
    return fused_attention_vmem_estimate(ws, wp, nheads, c) <= _VMEM_BUDGET_BYTES


def fused_swin_attention(qkv: jnp.ndarray, logit_scale: jnp.ndarray,
                         bias: jnp.ndarray, mask: Optional[jnp.ndarray],
                         ws: int, nheads: int,
                         interpret: Optional[bool] = None) -> jnp.ndarray:
    """Fused shifted-window attention on the unpartitioned spatial layout.

    Args:
        qkv: (B, Hp, Wp, 3C) — qkv projection of the (possibly pre-rolled)
            feature map; Hp, Wp multiples of ``ws``; C = nheads * head_dim.
        logit_scale: (H,) learned log temperatures (clamped at log 100).
        bias: (H, L, L) continuous relative position bias, L = ws*ws.
        mask: compact (nW, L, L) additive window-type mask (row-major window
            order), or None for unshifted blocks.
        ws, nheads: static window size / head count.
        interpret: force Pallas interpreter (defaults to True off-TPU).

    Returns:
        (B, Hp, Wp, C) attention output, same dtype as ``qkv``.

    Raises:
        _ShardFallback if a multi-device mesh is active and the per-call
        batch does not divide its data axes (caller falls back to XLA).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    scale_row = jnp.exp(jnp.minimum(
        logit_scale.astype(jnp.float32), LN_100)).reshape(1, -1)
    bias = bias.astype(jnp.float32)
    if mask is None:
        return _build(ws, nheads, False, interpret)(qkv, scale_row, bias)
    return _build(ws, nheads, True, interpret)(
        qkv, scale_row, bias, mask.astype(jnp.float32))


def fused_window_attention(qkv: jnp.ndarray, scale: jnp.ndarray,
                           bias: Optional[jnp.ndarray],
                           ws: int, nheads: int,
                           interpret: Optional[bool] = None,
                           layout: str = "spatial") -> jnp.ndarray:
    """Fused PLAIN (scaled dot-product) window attention on the
    unpartitioned spatial layout — the non-cosine sibling of
    :func:`fused_swin_attention`, powering DaViT spatial blocks
    (reference torchok/models/backbones/davit.py:168-208) and GCViT local
    window blocks (reference imports timm gcvit; our
    models/backbones/gcvit.py). Same kernels, ``cosine=False``: q/k go to
    the MXU as-is and the backward skips the normalization chain.

    Args:
        qkv: layout="spatial": (B, Hp, Wp, 3C) fused projection, Hp/Wp
            multiples of ``ws`` (requires ws % 8 == 0 — Mosaic's sublane
            relayout); layout="windowed": pre-partitioned (B, nW, L, 3C)
            windows (any ws — the partition copy runs in XLA, attention
            still fuses; the mode for ws=7 DaViT / ws=14 GCViT).
        scale: (H,) per-head logit multipliers (typically head_dim**-0.5).
        bias: (H, L, L) additive bias (GCViT learned relative position
            bias — its gradient flows), or None (DaViT: no bias).
        ws, nheads: static window size / head count.
        interpret: force Pallas interpreter (defaults to True off-TPU).

    Returns:
        Same-layout attention output ((B, Hp, Wp, C) or (B, nW, L, C)),
        same dtype as ``qkv``.

    Raises:
        _ShardFallback under a multi-device mesh whose data axes do not
        divide the batch (caller falls back to the XLA formulation).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    scale_row = scale.astype(jnp.float32).reshape(1, -1)
    op = _build(ws, nheads, False, interpret, cosine=False,
                windowed=layout == "windowed", has_bias=bias is not None)
    if bias is None:
        return op(qkv, scale_row)
    return op(qkv, scale_row, bias.astype(jnp.float32))


def fused_window_attention_global(kv: jnp.ndarray, q_global: jnp.ndarray,
                                  scale: jnp.ndarray, bias: jnp.ndarray,
                                  ws: int, nheads: int,
                                  interpret: Optional[bool] = None
                                  ) -> jnp.ndarray:
    """Fused GCViT global-query window attention: every window of an image
    attends with the image's shared global-token queries (reference imports
    timm gcvit — WindowAttentionGlobal with use_global; our
    models/backbones/gcvit.py). The q broadcast never materializes per
    window in HBM (the XLA formulation repeats q nW times), logits stay in
    VMEM, and the backward fuses dkv/dqg/dbias with dqg accumulated across
    the image's window groups by output revisiting.

    Args:
        kv: (B, nW, L, 2C) pre-partitioned key/value projection windows.
        q_global: (B, L, C) shared global queries per image.
        scale: (H,) per-head logit multipliers (head_dim**-0.5, non-learned).
        bias: (H, L, L) learned relative position bias (gradient flows).
        ws, nheads: static window size / head count.
        interpret: force Pallas interpreter (defaults to True off-TPU).

    Returns:
        (B, nW, L, C) attention output, same dtype as ``kv``.

    Raises:
        _ShardFallback under a multi-device mesh whose data axes do not
        divide the batch (caller falls back to the XLA formulation).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    scale_row = scale.astype(jnp.float32).reshape(1, -1)
    return _build_global(ws, nheads, interpret)(
        kv, q_global, scale_row, bias.astype(jnp.float32))


def window_attention_spatial(proj: jnp.ndarray, scale: jnp.ndarray,
                             bias: Optional[jnp.ndarray],
                             ws: int, nheads: int,
                             q_global: Optional[jnp.ndarray] = None,
                             interpret: Optional[bool] = None) -> jnp.ndarray:
    """Plain window attention on the (B, Hp, Wp, .) spatial layout with one
    fused/XLA dispatch policy for every caller (DaViT spatial blocks, GCViT
    local and global blocks).

    ``proj`` is the fused qkv projection (3C channels) when ``q_global`` is
    None, else the kv projection (2C) with ``q_global`` the image's (B, L, C)
    shared queries. Tries the fused Pallas kernels first — the spatial
    layout when ws is sublane-aligned, the windowed layout otherwise (the
    partition copy runs in XLA, attention still fuses) — and falls back to
    the XLA windowed formulation when the batch is symbolic (jax.export) or
    does not divide an active multi-device mesh.
    """
    b, hp, wp, cd = proj.shape
    c = cd // (2 if q_global is not None else 3)
    l = ws * ws
    try:
        if not isinstance(b, int):
            raise _ShardFallback()  # symbolic batch: no Pallas grid
        if q_global is not None:
            kvw = window_partition(proj, ws).reshape(b, -1, l, 2 * c)
            ow = fused_window_attention_global(kvw, q_global, scale, bias,
                                               ws=ws, nheads=nheads,
                                               interpret=interpret)
            return window_reverse(ow.reshape(-1, l, c), ws, hp, wp)
        if ws % 8 == 0:
            return fused_window_attention(proj, scale, bias, ws=ws,
                                          nheads=nheads, interpret=interpret)
        # sublane-misaligned window (ws=7 DaViT / ws=7|14 GCViT)
        win = window_partition(proj, ws).reshape(b, -1, l, 3 * c)
        ow = fused_window_attention(win, scale, bias, ws=ws, nheads=nheads,
                                    layout="windowed", interpret=interpret)
        return window_reverse(ow.reshape(-1, l, c), ws, hp, wp)
    except _ShardFallback:
        pass
    # XLA windowed formulation (identical math and params)
    h, d = nheads, c // nheads
    win = window_partition(proj, ws)
    if q_global is not None:
        k = win[..., :c].reshape(-1, l, h, d)
        v = win[..., c:].reshape(-1, l, h, d)
        q = jnp.repeat(q_global, win.shape[0] // q_global.shape[0],
                       axis=0).reshape(-1, l, h, d)
    else:
        q = win[..., :c].reshape(-1, l, h, d)
        k = win[..., c:2 * c].reshape(-1, l, h, d)
        v = win[..., 2 * c:].reshape(-1, l, h, d)
    attn = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                      preferred_element_type=jnp.float32)
    attn = attn * scale.astype(jnp.float32)[None, :, None, None]
    if bias is not None:
        attn = attn + bias[None].astype(attn.dtype)
    attn = jax.nn.softmax(attn, axis=-1).astype(proj.dtype)
    ow = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(-1, l, c)
    return window_reverse(ow, ws, hp, wp)
