"""Probe: fused-MBConv Pallas kernel vs XLA (VERDICT r4 #4).

Round-4 declared EfficientNet-B0's 6.0% MFU "structural" (depthwise on the
VPU + thin channels padding to 128 lanes) without testing the canonical TPU
lever: fusing the expand-1x1 -> BN -> swish -> depthwise -> BN -> swish ->
SE -> project-1x1 -> BN -> +residual chain of one MBConv block into ONE
Pallas kernel, so the expanded (H, W, 6C) tensor never round-trips HBM
between the ops. This probe measures that lever in isolation:

- kernel: grid over batch, one image per grid cell, whole spatial extent in
  VMEM (B0's biggest expanded activation, 56x56x144 f32 = 1.8 MB, fits the
  ~16 MB VMEM easily); expand/project run as (HW, C) @ (C, M) MXU matmuls,
  the depthwise conv as K^2 shifted VPU multiply-adds from a zero-padded
  VMEM scratch, SE as a spatial mean + two tiny matmuls — all without
  leaving VMEM.
- A/B: inference-mode (BN folded to scale+bias — the memory-traffic
  hypothesis is identical in fwd; train adds batch-stat reduces that XLA
  must split anyway), bf16 in/out, f32 accumulate on both sides.
- shapes: the two xplane-hottest B0 block families (stage-3 56^2 x mid 144
  k3 and stage-5 14^2 x mid 672 k5), bs 256.

Run ON TPU:   python tools/probe_mbconv_fused.py
CPU numerics: TORCHOK_PROBE_INTERPRET=1 python tools/probe_mbconv_fused.py
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_params(rng, cin, mid, rd, k, dtype=jnp.bfloat16):
    def g(*shape):
        return jnp.asarray(rng.normal(size=shape) * 0.05, dtype)
    # per-channel vectors carried as (1, C): Mosaic handles lane-aligned 2D
    # operands much better than rank-1
    return dict(
        w_exp=g(cin, mid), s1=g(1, mid), b1=g(1, mid),
        w_dw=g(k, k, mid), s2=g(1, mid), b2=g(1, mid),
        w_se1=g(mid, rd), b_se1=g(1, rd), w_se2=g(rd, mid), b_se2=g(1, mid),
        w_proj=g(mid, cin), s3=g(1, cin), b3=g(1, cin),
    )


def xla_block(x, p):
    """Reference chain, BN folded (eval), bf16 compute like the bench."""
    h, w = x.shape[1], x.shape[2]
    k = p["w_dw"].shape[0]
    pad = (k - 1) // 2
    a = jnp.dot(x, p["w_exp"])
    a = a * p["s1"] + p["b1"]
    a = a * jax.nn.sigmoid(a)
    a = jax.lax.conv_general_dilated(
        a, p["w_dw"].reshape(k, k, 1, -1), (1, 1),
        [(pad, pad), (pad, pad)], feature_group_count=a.shape[-1],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    a = a * p["s2"] + p["b2"]
    a = a * jax.nn.sigmoid(a)
    se = a.mean(axis=(1, 2))
    r = jnp.dot(se, p["w_se1"]) + p["b_se1"]
    r = r * jax.nn.sigmoid(r)
    gate = jax.nn.sigmoid(jnp.dot(r, p["w_se2"]) + p["b_se2"])
    a = a * gate[:, None, None, :]
    y = jnp.dot(a, p["w_proj"]) * p["s3"] + p["b3"]
    return y + x


def _kernel(x_ref, w_exp, s1, b1, w_dw, s2, b2, w_se1, b_se1, w_se2, b_se2,
            w_proj, s3, b3, o_ref, apad, *, h, w, k):
    pad = (k - 1) // 2
    cin = x_ref.shape[-1]
    mid = w_exp.shape[-1]
    x = x_ref[0].astype(jnp.float32)                      # (h, w, cin)
    a = jnp.dot(x.reshape(h * w, cin), w_exp[...].astype(jnp.float32),
                preferred_element_type=jnp.float32)
    a = a * s1[...].astype(jnp.float32) + b1[...].astype(jnp.float32)
    a = a * jax.nn.sigmoid(a)
    apad[...] = jnp.zeros((h + 2 * pad, w + 2 * pad, mid), jnp.float32)
    apad[pad:pad + h, pad:pad + w, :] = a.reshape(h, w, mid)
    wdw = w_dw[...].astype(jnp.float32)
    acc = jnp.zeros((h, w, mid), jnp.float32)
    for dy in range(k):
        for dx in range(k):
            acc += apad[dy:dy + h, dx:dx + w, :] * wdw[dy, dx, :]
    a = acc * s2[...].astype(jnp.float32).reshape(1, 1, mid) \
        + b2[...].astype(jnp.float32).reshape(1, 1, mid)
    a = a * jax.nn.sigmoid(a)
    se = jnp.mean(a.reshape(h * w, mid), axis=0, keepdims=True)  # (1, mid)
    r = jnp.dot(se, w_se1[...].astype(jnp.float32),
                preferred_element_type=jnp.float32) \
        + b_se1[...].astype(jnp.float32)
    r = r * jax.nn.sigmoid(r)
    gate = jax.nn.sigmoid(
        jnp.dot(r, w_se2[...].astype(jnp.float32),
                preferred_element_type=jnp.float32)
        + b_se2[...].astype(jnp.float32))
    a = a * gate.reshape(1, 1, mid)
    y = jnp.dot(a.reshape(h * w, mid), w_proj[...].astype(jnp.float32),
                preferred_element_type=jnp.float32)
    y = y * s3[...].astype(jnp.float32) + b3[...].astype(jnp.float32)
    o_ref[0] = (y.reshape(h, w, cin) + x).astype(o_ref.dtype)


def pallas_block(x, p):
    n, h, w, cin = x.shape
    k = p["w_dw"].shape[0]
    mid = p["w_exp"].shape[-1]
    pad = (k - 1) // 2
    names = ["w_exp", "s1", "b1", "w_dw", "s2", "b2", "w_se1", "b_se1",
             "w_se2", "b_se2", "w_proj", "s3", "b3"]
    in_specs = [pl.BlockSpec((1, h, w, cin), lambda i: (i, 0, 0, 0))]
    for nm in names:
        r = p[nm].ndim
        in_specs.append(pl.BlockSpec(p[nm].shape,
                                     functools.partial(
                                         lambda i, _r: (0,) * _r, _r=r)))
    return pl.pallas_call(
        functools.partial(_kernel, h=h, w=w, k=k),
        grid=(n,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, h, w, cin), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, h, w, cin), x.dtype),
        scratch_shapes=[pltpu.VMEM((h + 2 * pad, w + 2 * pad, mid),
                                   jnp.float32)],
        interpret=INTERPRET,
    )(x, *[p[nm] for nm in names])


def bench_fn(fn, x, p, iters=30):
    out = fn(x, p)
    out.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(x, p)
    out.block_until_ready()
    return (time.perf_counter() - t0) / iters


def main():
    cases = [
        ("stage3_56x56_mid144_k3", 256, 56, 24, 144, 6, 3),
        ("stage5_14x14_mid672_k5", 256, 14, 112, 672, 28, 5),
    ]
    if INTERPRET:
        cases = [("tiny_8x8_mid48_k3", 2, 8, 16, 48, 8, 3),
                 ("tiny_9x7_mid40_k5", 2, 9, 24, 40, 8, 5)]
    only = os.environ.get("TORCHOK_PROBE_CASES")
    if only:
        cases = [c for c in cases if c[0] in only.split(",")]
    rng = np.random.default_rng(0)
    for name, n, hw, cin, mid, rd, k in cases:
        print(f"--- {name}: tracing/compiling", flush=True)
        x = jnp.asarray(rng.normal(size=(n, hw, hw, cin)) * 0.5, jnp.bfloat16)
        p = make_params(rng, cin, mid, rd, k)
        fx = jax.jit(functools.partial(xla_block))
        fp = jax.jit(functools.partial(pallas_block))
        ox = np.asarray(fx(x, p), np.float32)
        op = np.asarray(fp(x, p), np.float32)
        err = np.abs(ox - op).max()
        rel = err / max(np.abs(ox).max(), 1e-6)
        print(f"{name}: max abs diff {err:.4f} (rel {rel:.4f})", flush=True)
        if INTERPRET:
            assert rel < 0.05, "numerics mismatch"
            continue
        tx = bench_fn(fx, x, p)
        tp = bench_fn(fp, x, p)
        flops = n * hw * hw * (cin * mid + mid * cin) * 2 \
            + n * hw * hw * mid * k * k * 2
        print(f"  XLA   : {tx * 1e3:8.3f} ms  ({flops / tx / 1e12:.2f} TF/s)")
        print(f"  Pallas: {tp * 1e3:8.3f} ms  ({flops / tp / 1e12:.2f} TF/s)"
              f"   speedup x{tx / tp:.3f}")


if __name__ == "__main__":
    main()
