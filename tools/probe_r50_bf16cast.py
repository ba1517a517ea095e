"""A/B: does pre-casting the whole param tree to bf16 once per step beat the
per-module cast-at-use pattern on ResNet-50 224/bs256?

Hypothesis (from the round-3 xplane breakdown, BASELINE.md): the ~49%
non-conv step time runs under continuous async *f32* weight-prefetch copies;
if the f32->bf16 converts are hoisted to one early fusion, the scheduler can
prefetch half the bytes. XLA may or may not re-sink the converts — measure.

MEASURED (2026-08-17, tunneled v5e): precast=False 2561 img/s,
precast=True 2378 img/s — the hoisted cast LOSES 7.1%. The step-start cast
fusion depends on the optimizer update of the previous scan iteration, so
the scheduler can no longer start next-iteration weight prefetches under the
current iteration's tail compute; the per-module cast-at-use pattern keeps
prefetch and compute overlapped. Dead end — kept as a negative result.
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


def run(precast: bool, bs=256, hw=224, k=10):
    trainer, task = build_trainer("resnet50", hw, bs)
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
    reps = 3
    for _ in range(reps):
        state, l = multi(state, batch)
    jax.block_until_ready(l)
    dt = time.perf_counter() - t0
    ips = reps * k * bs / dt
    print(f"[r50 precast={precast}] {ips:.0f} img/s "
          f"(final loss {float(l[-1]):.4f})", flush=True)
    return ips


if __name__ == "__main__":
    a = run(False)
    b = run(True)
    print(f"precast delta: {100.0 * (b - a) / a:+.1f}%")
