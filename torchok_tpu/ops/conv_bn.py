"""Fused 1x1-conv + BatchNorm pipeline kernel (Pallas/Mosaic).

ResNet-50's round-3 xplane profile (BASELINE.md): conv busy-occupancy 51.4%
of the train step; the other half is VPU-bound BN work serialized between
convs — an f32 convert-reduce over every conv output for the batch
statistics, plus the normalize+ReLU elementwise pass materialized to HBM
before the next conv reads it. A bottleneck's 1x1 convs are plain matmuls
(M = B*H*W rows), so both sides fold into the matmul kernel:

* **input epilogue**: the *previous* BatchNorm's normalize (+ReLU) applied
  in registers to the raw conv output read from HBM — the normalized tensor
  is never written (saves a full write+read per fused edge);
* **stats epilogue**: sum and sum-of-squares of the (bf16-rounded) output
  accumulated in VMEM across the M grid — the separate convert-reduce pass
  over the output disappears. Flax's BatchNorm computes
  ``var = E[x^2] - E[x]^2`` in f32 from the bf16 activation
  (flax/linen/normalization.py `_compute_stats`), which is exactly
  ``s2/M - (s1/M)^2`` — numerics match the unfused path.

The backward stays in XLA (matmul transposes + elementwise mask chains; a
custom_vjp wires the stats/epilogue gradients). Reference counterpart: the
reference trains these models through cuDNN's fused conv+BN executors
(torch); this is the TPU-native equivalent for the pointwise convs.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_bm(m: int, k: int, n: int) -> int:
    """Row-block size: keep x/y blocks (double-buffered) + w under ~12 MB."""
    for bm in (1024, 512, 256, 128):
        vmem = 2 * (bm * k * 2 + bm * n * 2) + k * n * 2
        if vmem <= 12 * 1024 * 1024 and bm <= max(m, 128):
            return bm
    return 128


def _kernel(x_ref, w_ref, scale_ref, bias_ref, y_ref, s1_ref, s2_ref, *,
            relu_in: bool, with_affine: bool, m_total: int, bm: int,
            out_dtype):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        s1_ref[:] = jnp.zeros_like(s1_ref)
        s2_ref[:] = jnp.zeros_like(s2_ref)

    a = x_ref[:].astype(jnp.float32)
    if with_affine:
        a = a * scale_ref[:] + bias_ref[:]
    if relu_in:
        a = jnp.maximum(a, 0.0)
    # rows past m_total are padding; zero them so the stats stay exact even
    # when the affine epilogue maps 0 -> relu(bias) != 0
    rows = jax.lax.broadcasted_iota(jnp.int32, a.shape, 0) + i * bm
    a = jnp.where(rows < m_total, a, 0.0)

    y = jnp.dot(a.astype(out_dtype), w_ref[:],
                preferred_element_type=jnp.float32)
    y_lp = y.astype(out_dtype)
    y_ref[:] = y_lp
    # statistics over the bf16-rounded activation — what the unfused
    # convert-reduce sees. Padded rows contribute exact zeros.
    yf = y_lp.astype(jnp.float32)
    yrows = jax.lax.broadcasted_iota(jnp.int32, yf.shape, 0) + i * bm
    yf = jnp.where(yrows < m_total, yf, 0.0)
    s1_ref[:] += jnp.sum(yf, axis=0, keepdims=True)
    s2_ref[:] += jnp.sum(yf * yf, axis=0, keepdims=True)


def _interpret() -> bool:
    # Mosaic compiles on TPU only; CPU (tests) runs the kernel interpreted
    return jax.default_backend() != "tpu"


def _matmul_bn_fwd_impl(x, w, scale, bias, relu_in: bool, with_affine: bool):
    m, k = x.shape
    n = w.shape[1]
    bm = _pick_bm(m, k, n)
    grid_m = pl.cdiv(m, bm)
    out_dtype = x.dtype

    kernel = functools.partial(
        _kernel, relu_in=relu_in, with_affine=with_affine, m_total=m, bm=bm,
        out_dtype=out_dtype)

    scale2 = scale.reshape(1, k).astype(jnp.float32)
    bias2 = bias.reshape(1, k).astype(jnp.float32)

    y, s1, s2 = pl.pallas_call(
        kernel,
        grid=(grid_m,),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bm, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, n), out_dtype),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * n,
            bytes_accessed=m * k * 2 + k * n * 2 + m * n * 2,
            transcendentals=0),
        interpret=_interpret(),
    )(x, w, scale2, bias2)
    return y, s1[0], s2[0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def matmul_bn(x, w, scale, bias, relu_in: bool = False,
              with_affine: bool = False):
    """``y = act(x*scale + bias) @ w`` with fused output statistics.

    x (M, K) bf16/f32, w (K, N); scale/bias (K,) f32 (ignored unless
    ``with_affine``); act = ReLU when ``relu_in``. Returns
    (y (M, N) x.dtype, s1 (N,) f32, s2 (N,) f32) where s1/s2 are the
    sum / sum-of-squares of the rounded y over M — feed them to
    :func:`bn_from_stats`.
    """
    return _matmul_bn_fwd_impl(x, w, scale, bias, relu_in, with_affine)


def _matmul_bn_fwd(x, w, scale, bias, relu_in, with_affine):
    y, s1, s2 = _matmul_bn_fwd_impl(x, w, scale, bias, relu_in, with_affine)
    return (y, s1, s2), (x, w, scale, bias, y)


def _matmul_bn_bwd(relu_in, with_affine, res, grads):
    x, w, scale, bias, y = res
    dy, ds1, ds2 = grads
    xf = x.astype(jnp.float32)
    if with_affine:
        pre = xf * scale + bias
    else:
        pre = xf
    a = jnp.maximum(pre, 0.0) if relu_in else pre

    # stats gradients broadcast over rows; the bf16 round is straight-through
    lp = x.dtype  # matmul precision matches the forward's operand dtype
    dy_tot = (dy.astype(jnp.float32) + ds1[None, :]
              + 2.0 * y.astype(jnp.float32) * ds2[None, :])
    da = jnp.dot(dy_tot.astype(lp), w.T.astype(lp),
                 preferred_element_type=jnp.float32)
    dw = jnp.dot(a.astype(lp).T, dy_tot.astype(lp),
                 preferred_element_type=jnp.float32).astype(w.dtype)
    if relu_in:
        da = da * (pre > 0)
    if with_affine:
        dx = (da * scale).astype(x.dtype)
        dscale = jnp.sum(da * xf, axis=0)
        dbias = jnp.sum(da, axis=0)
    else:
        dx = da.astype(x.dtype)
        dscale = jnp.zeros_like(scale)
        dbias = jnp.zeros_like(bias)
    return dx, dw, dscale, dbias


matmul_bn.defvjp(_matmul_bn_fwd, _matmul_bn_bwd)


def bn_from_stats(s1: jnp.ndarray, s2: jnp.ndarray, m: int,
                  gamma: jnp.ndarray, beta: jnp.ndarray,
                  eps: float = 1e-5) -> Tuple[jnp.ndarray, jnp.ndarray,
                                              jnp.ndarray, jnp.ndarray]:
    """Fold fused statistics into the BatchNorm affine.

    Returns (scale, bias, mean, var) with flax semantics
    (``var = E[y^2] - E[y]^2`` in f32): ``y_hat = y * scale + bias`` equals
    ``gamma * (y - mean) / sqrt(var + eps) + beta``. mean/var feed the
    running-average update exactly like the unfused module.
    """
    mean = s1 / m
    var = s2 / m - mean * mean
    inv = gamma * jax.lax.rsqrt(var + eps)
    return inv, beta - mean * inv, mean, var
