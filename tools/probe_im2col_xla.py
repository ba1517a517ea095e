"""Probe: 3x3 conv as explicit HBM im2col + one XLA matmul (round 5).

The implicit-GEMM Pallas probe (tools/probe_r50_conv_gemm.py) relocated
ResNet-50's missing MFU into XLA's conv kernels themselves: 19-26% of bf16
peak in isolation on every bottleneck shape, while XLA's *matmul* kernels
reach 60-80%. Hypothesis: materialize im2col in HBM with cheap XLA ops
(pad + 9 static slices + concat) and feed ONE (N*H*W, 9*Cin) @ (9*Cin,
Cout) dot — pay 9x activation traffic to ride the good matmul kernel.

Traffic math (bs 256, bf16, ~800 GB/s HBM): the unfold loses where the
im2col tensor is huge (56^2: 925 MB) and should win where it is small and
the conv kernel is weakest (7^2x512: 115 MB, conv at 19% peak).

Run ON TPU:   python tools/probe_im2col_xla.py
CPU numerics: TORCHOK_PROBE_INTERPRET=1 python tools/probe_im2col_xla.py
"""
import functools
import os
import sys
import time

sys.path.insert(0, "/root/repo")
from torchok_tpu.utils.compile_cache import cache_dir as _cache_dir
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _cache_dir())

INTERPRET = os.environ.get("TORCHOK_PROBE_INTERPRET", "0") == "1"

import jax
if INTERPRET:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np


def xla_conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)


def im2col_conv(x, w):
    """pad + 9 shifted slices -> (N*H*W, 9*Cin) @ (9*Cin, Cout)."""
    n, h, ww, cin = x.shape
    cout = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    taps = [xp[:, dy:dy + h, dx:dx + ww, :]
            for dy in range(3) for dx in range(3)]
    col = jnp.concatenate(taps, axis=-1).reshape(n * h * ww, 9 * cin)
    acc = jnp.dot(col, w.reshape(9 * cin, cout),
                  preferred_element_type=jnp.float32)
    return acc.reshape(n, h, ww, cout).astype(x.dtype)


def bench(fn, *args, iters=30):
    out = fn(*args)
    out.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    out.block_until_ready()
    return (time.perf_counter() - t0) / iters


def main():
    cases = [(256, 56, 64), (256, 28, 128), (256, 14, 256), (256, 7, 512)]
    if INTERPRET:
        cases = [(2, 9, 16), (2, 8, 24)]
    only_hw = os.environ.get("TORCHOK_PROBE_HW")
    if only_hw:
        cases = [c for c in cases if c[1] == int(only_hw)]
    rng = np.random.default_rng(0)
    for n, hw, c in cases:
        x = jnp.asarray(rng.normal(size=(n, hw, hw, c)) * 0.5, jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(3, 3, c, c)) * 0.05, jnp.bfloat16)
        fx = jax.jit(xla_conv)
        fc = jax.jit(im2col_conv)
        flops = 2 * n * hw * hw * 9 * c * c
        ox = np.asarray(fx(x, w), np.float32)
        oc = np.asarray(fc(x, w), np.float32)
        rel = np.abs(ox - oc).max() / max(np.abs(ox).max(), 1e-6)
        print(f"{hw}x{hw}x{c}: max rel diff {rel:.4f}", flush=True)
        if INTERPRET:
            assert rel < 0.05, "numerics mismatch"
            continue
        tx = bench(fx, x, w)
        tc = bench(fc, x, w)
        print(f"  conv  : {tx * 1e3:8.3f} ms  ({flops / tx / 1e12:6.1f} TF/s)")
        print(f"  im2col: {tc * 1e3:8.3f} ms  ({flops / tc / 1e12:6.1f} TF/s)"
              f"   speedup x{tx / tc:.3f}", flush=True)


if __name__ == "__main__":
    main()
