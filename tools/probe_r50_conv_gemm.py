"""Probe: ResNet-50's missing in-conv MXU efficiency (VERDICT r4 #5).

Round-3 xplane attribution parked ResNet-50 at 31% MFU with in-conv MXU
efficiency ~60% and no probe of the conv itself. Hypothesis under test:
the 3x3 stride-1 bottleneck convs contract over Cin = 64/128/256/512; at
Cin=64 the 128-deep MXU runs at <=50% K-occupancy, and XLA's conv may not
recover it. An implicit-GEMM Pallas kernel that materializes im2col in
VMEM lifts K to 9*Cin (576+), filling the MXU contraction depth.

Two measurements per bottleneck 3x3 shape (bs 256, bf16 in/out, f32 acc):
  1. XLA lax.conv in isolation  -> TF/s (how bad is each shape really?)
  2. Pallas implicit-GEMM       -> TF/s + speedup

Grid: one image per cell (56^2 im2col = 3.6 MB bf16, fits VMEM).
Run ON TPU:   python tools/probe_r50_conv_gemm.py
CPU numerics: TORCHOK_PROBE_INTERPRET=1 python tools/probe_r50_conv_gemm.py
"""
import functools
import os
import sys
import time

sys.path.insert(0, "/root/repo")
from torchok_tpu.utils.compile_cache import cache_dir as _cache_dir
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _cache_dir())

INTERPRET = os.environ.get("TORCHOK_PROBE_INTERPRET", "0") == "1"
XLA_ONLY = os.environ.get("TORCHOK_PROBE_XLA_ONLY", "0") == "1"  # flag A/Bs

import jax
if INTERPRET:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def xla_conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)


def _kernel(x_ref, w_ref, o_ref, xpad, col, *, g, h, w, cin):
    """``g`` images per grid cell, stacked along the padded ROW axis so the
    scratch stays rank-3 with static slices only (the rank-4 scalar-indexed
    variant wedged the remote Mosaic compile): image i lives at rows
    [i*(h+2)+1, i*(h+2)+1+h) of a (g*(h+2), w+2, cin) scratch, its 9
    im2col taps are static rank-3 windows, and one MXU matmul runs with
    M = g*h*w rows and contraction depth 9*cin."""
    hp = h + 2
    xpad[...] = jnp.zeros((g * hp, w + 2, cin), x_ref.dtype)
    for i in range(g):
        xpad[i * hp + 1:i * hp + 1 + h, 1:1 + w, :] = x_ref[i]
    for i in range(g):
        for dy in range(3):
            for dx in range(3):
                tap = dy * 3 + dx
                col[i * h * w:(i + 1) * h * w,
                    tap * cin:(tap + 1) * cin] = \
                    xpad[i * hp + dy:i * hp + dy + h,
                         dx:dx + w, :].reshape(h * w, cin)
    acc = jnp.dot(col[...], w_ref[...].reshape(9 * cin, -1),
                  preferred_element_type=jnp.float32)
    o_ref[...] = acc.reshape(g, h, w, -1).astype(o_ref.dtype)


def pallas_conv(x, w, g=1):
    n, h, ww, cin = x.shape
    cout = w.shape[-1]
    assert n % g == 0
    return pl.pallas_call(
        functools.partial(_kernel, g=g, h=h, w=ww, cin=cin),
        grid=(n // g,),
        in_specs=[
            pl.BlockSpec((g, h, ww, cin), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((3, 3, cin, cout), lambda i: (0, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((g, h, ww, cout), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, h, ww, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((g * (h + 2), ww + 2, cin), x.dtype),
            pltpu.VMEM((g * h * ww, 9 * cin), x.dtype),
        ],
        interpret=INTERPRET,
    )(x, w)


def bench(fn, *args, iters=30):
    out = fn(*args)
    out.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    out.block_until_ready()
    return (time.perf_counter() - t0) / iters


def main():
    # ResNet-50 bottleneck 3x3 shapes + images-per-grid-cell G (round-5b:
    # G>1 batches M = G*HW rows per matmul — the per-image M=HW cells
    # underutilized the MXU on the small-spatial shapes)
    # 7^2 caps at G=8: the G=16 scratch (col 14.4 MB + operand double
    # buffers) blew the 16 MB scoped-VMEM limit on v5e.
    cases = [(256, 56, 64, 1), (256, 28, 128, 2), (256, 14, 256, 8),
             (256, 7, 512, 8)]
    if INTERPRET:
        cases = [(2, 9, 16, 1), (2, 8, 24, 2)]
    only_hw = os.environ.get("TORCHOK_PROBE_HW")  # e.g. "7" reruns one case
    if only_hw:
        cases = [c for c in cases if c[1] == int(only_hw)]
    rng = np.random.default_rng(0)
    for n, hw, c, g in cases:
        x = jnp.asarray(rng.normal(size=(n, hw, hw, c)) * 0.5, jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(3, 3, c, c)) * 0.05, jnp.bfloat16)
        fx = jax.jit(xla_conv)
        flops = 2 * n * hw * hw * 9 * c * c
        if XLA_ONLY:
            tx = bench(fx, x, w)
            print(f"{hw}x{hw}x{c}: XLA {tx * 1e3:8.3f} ms "
                  f"({flops / tx / 1e12:6.1f} TF/s)", flush=True)
            continue
        fp = jax.jit(functools.partial(pallas_conv, g=g))
        ox = np.asarray(fx(x, w), np.float32)
        op = np.asarray(fp(x, w), np.float32)
        rel = np.abs(ox - op).max() / max(np.abs(ox).max(), 1e-6)
        print(f"{hw}x{hw}x{c} (G={g}): max rel diff {rel:.4f}", flush=True)
        if INTERPRET:
            assert rel < 0.05, "numerics mismatch"
            continue
        tx = bench(fx, x, w)
        tp = bench(fp, x, w)
        print(f"  XLA   : {tx * 1e3:8.3f} ms  ({flops / tx / 1e12:6.1f} TF/s)")
        print(f"  Pallas: {tp * 1e3:8.3f} ms  ({flops / tp / 1e12:6.1f} TF/s)"
              f"   speedup x{tx / tp:.3f}")


if __name__ == "__main__":
    main()
