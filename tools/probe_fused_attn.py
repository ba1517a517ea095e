"""TPU probe: compile + numerics + microbench of the fused swin attention.

Run on the real chip (serialize with other TPU jobs):
    python tools/probe_fused_attn.py
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from torchok_tpu.models.backbones.swin import (_shift_window_region_ids,
                                               window_partition,
                                               window_reverse)
from torchok_tpu.ops.swin_attention import fused_swin_attention
from torchok_tpu.ops.window_attention import _window_attention_xla

jax.config.update("jax_compilation_cache_dir", "/root/.cache/torchok_tpu/jax")


def ref(qkv, scale, bias, mask, ws, h):
    c = qkv.shape[-1] // 3
    d = c // h
    L = ws * ws
    hp, wp = qkv.shape[1], qkv.shape[2]
    win = window_partition(qkv, ws)
    q = win[..., :c].reshape(-1, L, h, d)
    k = win[..., c:2 * c].reshape(-1, L, h, d)
    v = win[..., 2 * c:].reshape(-1, L, h, d)
    out = _window_attention_xla(q, k, v, scale, bias, mask, layout="blhd")
    return window_reverse(out.reshape(-1, L, c), ws, hp, wp)


def run_case(name, B, HP, WP, ws, H, D, masked, dtype, bench=False):
    C = H * D
    L = ws * ws
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.normal(size=(B, HP, WP, 3 * C)), dtype)
    scale = jnp.asarray(rng.normal(size=(H,)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(H, L, L)), jnp.float32)
    mask = None
    if masked:
        ids = jnp.asarray(_shift_window_region_ids(HP, WP, ws, ws // 2))
        mask = jnp.where(ids[:, :, None] != ids[:, None, :], -100.0, 0.0)

    fused = jax.jit(functools.partial(fused_swin_attention, ws=ws, nheads=H,
                                      interpret=False))
    t0 = time.time()
    got = jax.block_until_ready(fused(qkv, scale, bias, mask))
    t_compile = time.time() - t0
    want = jax.block_until_ready(ref(qkv, scale, bias, mask, ws, H))
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                - want.astype(jnp.float32))))
    print(f"[fwd ] {name}: compile {t_compile:.1f}s  max_abs_err {err:.2e}")

    # backward
    def loss_f(qkv_, s_, b_):
        return jnp.sum(fused_swin_attention(qkv_, s_, b_, mask, ws=ws,
                                            nheads=H, interpret=False) ** 2)

    def loss_r(qkv_, s_, b_):
        return jnp.sum(ref(qkv_, s_, b_, mask, ws, H) ** 2)

    gf = jax.jit(jax.grad(loss_f, argnums=(0, 1, 2)))
    gr = jax.jit(jax.grad(loss_r, argnums=(0, 1, 2)))
    t0 = time.time()
    g_got = jax.block_until_ready(gf(qkv, scale, bias))
    t_compile = time.time() - t0
    g_want = jax.block_until_ready(gr(qkv, scale, bias))
    for nm, a, b in zip(("dqkv", "dscale", "dbias"), g_got, g_want):
        aa = np.asarray(a, np.float32)
        bb = np.asarray(b, np.float32)
        denom = max(1e-6, float(np.abs(bb).max()))
        rel = float(np.abs(aa - bb).max()) / denom
        print(f"[bwd ] {name}/{nm}: compile {t_compile:.1f}s  max_rel_err {rel:.2e}")
        t_compile = 0.0

    if bench:
        def timeit(fn, *a):
            jax.block_until_ready(fn(*a))
            reps = 20
            t0 = time.perf_counter()
            for _ in range(reps):
                out = fn(*a)
            jax.block_until_ready(out)
            return (time.perf_counter() - t0) / reps * 1e3

        refj = jax.jit(functools.partial(ref, ws=ws, h=H))
        ms_f = timeit(fused, qkv, scale, bias, mask)
        ms_r = timeit(refj, qkv, scale, bias, mask)
        grj = jax.jit(jax.grad(loss_r, argnums=(0, 1, 2)))
        ms_gf = timeit(gf, qkv, scale, bias)
        ms_gr = timeit(grj, qkv, scale, bias)
        print(f"[perf] {name}: fwd fused {ms_f:.2f}ms vs xla {ms_r:.2f}ms | "
              f"fwd+bwd fused {ms_gf:.2f}ms vs xla {ms_gr:.2f}ms")


if __name__ == "__main__":
    print("backend:", jax.default_backend(), jax.devices()[0].device_kind)
    # tiny correctness probes (fast compile)
    run_case("tiny-f32", 2, 8, 12, 4, 3, 8, True, jnp.float32)
    run_case("tiny-bf16-nomask", 2, 8, 8, 4, 3, 8, False, jnp.bfloat16)
    # swinv2_tiny_256 stage shapes, bf16 (stage1 + stage3 + stage4)
    run_case("stage1", 32, 64, 64, 8, 3, 32, True, jnp.bfloat16, bench=True)
    run_case("stage3", 32, 16, 16, 8, 12, 32, True, jnp.bfloat16, bench=True)
    run_case("stage4", 32, 8, 8, 8, 24, 32, False, jnp.bfloat16, bench=True)
