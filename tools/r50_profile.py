"""Capture an xplane trace of the ResNet-50 224/bs256 train step (VERDICT
round-2 weak #5: the 69% of non-MFU time was unattributed) and optionally
A/B throughput knobs. Run on the TPU, then:
    python tools/analyze_xplane.py /tmp/r50_trace
"""
import functools
import os
import sys
import time

sys.path.insert(0, "/root/repo")
from torchok_tpu.utils.compile_cache import cache_dir as _cache_dir
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _cache_dir())

import jax
import numpy as np

from bench import build_trainer


def case(bs=256, hw=224, k=10, trace=None, backbone="resnet50"):
    trainer, task = build_trainer(backbone, hw, bs)
    step = trainer._make_train_step(task, trainer.tx)
    rng = np.random.default_rng(0)
    host = {"image": rng.normal(size=(bs, hw, hw, 3)).astype(np.float32),
            "target": rng.integers(0, 1000, size=(bs,)).astype(np.int64)}
    batch = jax.device_put(host, trainer.data_sharding)
    batch = {**batch, "image": batch["image"].astype(task.compute_dtype)}

    @functools.partial(jax.jit, donate_argnums=(0,))
    def multi(state, b):
        def body(s, _):
            s2, _o, l = step(s, b)
            return s2, l["loss"]
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
    print(f"[{backbone} bs={bs} hw={hw}] {ips:.0f} img/s", flush=True)
    if trace:
        with jax.profiler.trace(trace):
            state, l = multi(state, batch)
            jax.block_until_ready(l)
        print(f"trace -> {trace}", flush=True)
    return ips


if __name__ == "__main__":
    case(bs=256, trace="/tmp/r50_trace")
    # throughput knob A/B: larger batch
    case(bs=512)
