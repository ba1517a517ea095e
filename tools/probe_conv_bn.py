#!/usr/bin/env python
"""A/B probe: fused matmul+BN-stats kernel (ops/conv_bn.py) vs the XLA
formulation, on ResNet-50 bottleneck 1x1 shapes (bs 256).

Chain: L alternating 1x1 "convs" (wide->narrow->wide matmuls over
M = B*H*W rows) with BatchNorm(+ReLU) between — the BN normalize of layer i
feeds layer i+1's input, exactly the bottleneck's conv1->conv3 edge. Both
variants compute identical math (flax stats convention, bf16 activations,
f32 stats); the fused variant folds the normalize into the next matmul's
input epilogue and the stats into the matmul's output epilogue.

Measures fwd+bwd steps/s (jitted k-step scan, value_and_grad over weights
and BN affines) and checks loss/grad parity. Run ON TPU:
    python tools/probe_conv_bn.py [--stage 3] [--layers 8]
"""
import argparse
import functools
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from torchok_tpu.utils.compile_cache import cache_dir as _cache_dir
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _cache_dir())

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

from torchok_tpu.ops.conv_bn import bn_from_stats, matmul_bn  # noqa: E402

# (M, wide, narrow) per ResNet-50 stage at bs 256
STAGES = {
    2: (256 * 56 * 56, 256, 64),
    3: (256 * 28 * 28, 512, 128),
    4: (256 * 14 * 14, 1024, 256),
    5: (256 * 7 * 7, 2048, 512),
}
EPS = 1e-5


def make_params(key, wide, narrow, layers):
    ws, gammas, betas = [], [], []
    dims = []
    for i in range(layers):
        k, n = (wide, narrow) if i % 2 == 0 else (narrow, wide)
        dims.append((k, n))
        key, k1 = jax.random.split(key)
        ws.append(jax.random.normal(k1, (k, n), jnp.float32)
                  * (2.0 / k) ** 0.5)
        gammas.append(jnp.ones((n,), jnp.float32))
        betas.append(jnp.zeros((n,), jnp.float32))
    return {"w": ws, "gamma": gammas, "beta": betas}, dims


def loss_xla(params, x):
    """The XLA formulation: stats = convert-reduce over the bf16 activation,
    normalize+relu materialized before the next matmul."""
    m = x.shape[0]
    scale = jnp.ones((x.shape[1],), jnp.float32)
    bias = jnp.zeros((x.shape[1],), jnp.float32)
    y = x
    aux = 0.0
    for w, gamma, beta in zip(params["w"], params["gamma"], params["beta"]):
        a = jnp.maximum(y.astype(jnp.float32) * scale + bias, 0.0)
        y = jnp.dot(a.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        yf = y.astype(jnp.float32)
        s1 = jnp.sum(yf, 0)
        s2 = jnp.sum(yf * yf, 0)
        scale, bias, mean, var = bn_from_stats(s1, s2, m, gamma, beta, EPS)
        aux = aux + jnp.sum(mean) * 0.0 + jnp.sum(var) * 0.0
    return jnp.sum(y.astype(jnp.float32)) / m + aux


def loss_fused(params, x):
    m = x.shape[0]
    scale = jnp.ones((x.shape[1],), jnp.float32)
    bias = jnp.zeros((x.shape[1],), jnp.float32)
    y = x
    for w, gamma, beta in zip(params["w"], params["gamma"], params["beta"]):
        y, s1, s2 = matmul_bn(y, w.astype(jnp.bfloat16), scale, bias,
                              True, True)
        scale, bias, _mean, _var = bn_from_stats(s1, s2, m, gamma, beta, EPS)
    return jnp.sum(y.astype(jnp.float32)) / m


def bench(loss_fn, params, x, k, reps, tag):
    @functools.partial(jax.jit, donate_argnums=())
    def step_k(params, x):
        def body(carry, _):
            l, g = jax.value_and_grad(loss_fn)(params, x)
            return carry + l + jax.tree_util.tree_reduce(
                lambda a, b: a + jnp.sum(b).astype(jnp.float32), g, 0.0), None
        total, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None,
                                length=k)
        return total

    t = step_k(params, x)
    jax.block_until_ready(t)
    t0 = time.perf_counter()
    for _ in range(reps):
        t = step_k(params, x)
    jax.block_until_ready(t)
    dt = time.perf_counter() - t0
    sps = reps * k / dt
    print(f"{tag}: {sps:.2f} fwd+bwd steps/s "
          f"({dt / (reps * k) * 1e3:.2f} ms/step)", flush=True)
    return sps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", type=int, default=4)
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    m, wide, narrow = STAGES[args.stage]
    print(f"stage {args.stage}: M={m}, {wide}<->{narrow}, "
          f"{args.layers} layers, {jax.devices()[0].device_kind}", flush=True)
    params, dims = make_params(jax.random.PRNGKey(0), wide, narrow,
                               args.layers)
    x = (jax.random.normal(jax.random.PRNGKey(1), (m, wide), jnp.float32)
         .astype(jnp.bfloat16))

    # parity first
    lx, gx = jax.value_and_grad(loss_xla)(params, x)
    lf, gf = jax.value_and_grad(loss_fused)(params, x)
    print(f"loss xla={float(lx):.6f} fused={float(lf):.6f}", flush=True)
    gerr = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), gx, gf)
    werr = max(max(gerr["w"]), max(gerr["gamma"]), max(gerr["beta"]))
    print(f"max grad abs err: {werr:.5f}", flush=True)

    sps_x = bench(loss_xla, params, x, args.k, args.reps, "xla  ")
    sps_f = bench(loss_fused, params, x, args.k, args.reps, "fused")
    print(f"speedup: {sps_f / sps_x:.3f}x", flush=True)


if __name__ == "__main__":
    main()
