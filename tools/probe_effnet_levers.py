"""A/B the top xplane-attributed EfficientNet-B0 cost: continuous small f32
weight copies (depthwise 3x3x1xC kernels, per-channel BN vectors) under
59.8% conv occupancy (tools/analyze_xplane.py /tmp/effnet_trace, round 4).

Lever probed: pre-cast the param tree to bf16 once at step start so every
weight copy moves half the bytes and the per-use f32->bf16 converts
disappear. On ResNet-50 this LOST 7.1% (tools/probe_r50_bf16cast.py: the
hoisted cast breaks cross-iteration weight prefetch overlap) — but
EfficientNet's copies are hundreds of KB-scale depthwise/BN tensors rather
than MB-scale dense convs, so the prefetch-overlap penalty and the
bytes-halved win can land differently. Measure, don't extrapolate.

MEASURED (2026-08-19, tunneled v5e): efficientnet_b0 4353 -> 4045 img/s
(-7.1%), mobilenetv3_large_100 7046 -> 6401 img/s (-9.2%). Same mechanism
as ResNet: the step-start cast fusion depends on the previous scan
iteration's optimizer update, so cross-iteration weight prefetch no longer
overlaps tail compute — and it costs MORE here because these models' many
small weight tensors lean harder on prefetch overlap. The per-module
cast-at-use pattern stays the right default for every CNN family probed.

Run ON TPU:  python tools/probe_effnet_levers.py
"""
import functools
import os
import sys
import time

sys.path.insert(0, "/root/repo")
from torchok_tpu.utils.compile_cache import cache_dir as _cache_dir
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _cache_dir())

import jax
import jax.numpy as jnp
import numpy as np

from bench import build_trainer


def run(backbone: str, precast: bool, bs=256, hw=224, k=10, reps=3):
    trainer, task = build_trainer(backbone, hw, bs)
    model, tx = task.model, trainer.tx
    compute_loss = task.compute_loss
    dropout_key = jax.random.PRNGKey(7)

    def maybe_cast(tree):
        if not precast:
            return tree
        return jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, tree)

    def step(state, batch):
        rngs = {"dropout": jax.random.fold_in(dropout_key, state.step)}

        def loss_fn(params, bstats):
            variables = {"params": maybe_cast(params), "batch_stats": bstats}
            outputs, new_vars = model.apply(
                variables, batch, train=True, rngs=rngs,
                mutable=["batch_stats"])
            total, _ = compute_loss(outputs)
            return total, new_vars

        (loss, new_vars), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        import optax
        params = optax.apply_updates(state.params, updates)
        return state.replace(
            step=state.step + 1, params=params, opt_state=new_opt,
            batch_stats=new_vars["batch_stats"]), loss

    rng = np.random.default_rng(0)
    host = {"image": rng.normal(size=(bs, hw, hw, 3)).astype(np.float32),
            "target": rng.integers(0, 1000, size=(bs,)).astype(np.int64)}
    batch = jax.device_put(host, trainer.data_sharding)
    batch = {**batch, "image": batch["image"].astype(task.compute_dtype)}

    @functools.partial(jax.jit, donate_argnums=(0,))
    def multi(state, b):
        def body(s, _):
            s2, l = step(s, b)
            return s2, l
        return jax.lax.scan(body, state, None, length=k)

    state = trainer.state
    state, l = multi(state, batch)
    jax.block_until_ready(l)
    t0 = time.perf_counter()
    for _ in range(reps):
        state, l = multi(state, batch)
    jax.block_until_ready(l)
    dt = time.perf_counter() - t0
    ips = reps * k * bs / dt
    print(f"[{backbone} precast={precast}] {ips:.0f} img/s "
          f"(final loss {float(l[-1]):.4f})", flush=True)
    del state, batch
    return ips


if __name__ == "__main__":
    for backbone in ("efficientnet_b0", "mobilenetv3_large_100"):
        a = run(backbone, False)
        b = run(backbone, True)
        print(f"{backbone} precast delta: {100.0 * (b - a) / a:+.1f}%",
              flush=True)
