"""Attribute EfficientNet-B0's low MFU (6.0% @ bs256, BENCH r4) and probe
the cheap levers. Depthwise convs run on the VPU (no 128x128 MXU tiling)
and B0's channel counts (32/96/144/240...) pad badly to the 128-lane
registers, so low MFU is expected — this probe measures WHERE the step
time actually goes (xplane category breakdown) and A/Bs batch size and
remat so the bound is documented from data, not estimates.

Run ON TPU:  python tools/probe_effnet_profile.py
Then:        python tools/analyze_xplane.py /tmp/effnet_trace
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

from bench import build_trainer, PEAK_BF16_TFLOPS


def case(backbone="efficientnet_b0", bs=256, hw=224, k=10, reps=3,
         trace=None, backbone_extra=None):
    trainer, task = build_trainer(backbone, hw, bs,
                                  backbone_extra=backbone_extra)
    step = trainer._make_train_step(task, trainer.tx)
    rng = np.random.default_rng(0)
    host = {"image": rng.normal(size=(bs, hw, hw, 3)).astype(np.float32),
            "target": rng.integers(0, 1000, size=(bs,)).astype(np.int64)}
    batch = jax.device_put(host, trainer.data_sharding)
    batch = {**batch, "image": batch["image"].astype(task.compute_dtype)}

    step_flops = None
    try:
        cost = step.lower(trainer.state, batch).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        step_flops = float(cost.get("flops", 0.0)) or None
    except Exception:  # noqa: BLE001
        pass

    @functools.partial(jax.jit, donate_argnums=(0,))
    def multi(state, b):
        def body(s, _):
            s2, _o, losses = step(s, b)
            return s2, losses["loss"]
        return jax.lax.scan(body, state, None, length=k)

    state = trainer.state
    state, l = multi(state, batch)
    jax.block_until_ready(l)
    t0 = time.perf_counter()
    for _ in range(reps):
        state, l = multi(state, batch)
    jax.block_until_ready(l)
    dt = time.perf_counter() - t0
    sps = reps * k / dt
    ips = sps * bs
    mfu = ""
    if step_flops:
        kind = jax.devices()[0].device_kind
        peak = next((v for pre, v in PEAK_BF16_TFLOPS.items()
                     if kind.startswith(pre)), 0)
        if peak:
            mfu = f", MFU {sps * step_flops / 1e12 / peak:.1%}"
    extra = f" extra={backbone_extra}" if backbone_extra else ""
    print(f"[{backbone} bs={bs}{extra}] {ips:.0f} img/s{mfu}", flush=True)
    if trace:
        with jax.profiler.trace(trace):
            state, l = multi(state, batch)
            jax.block_until_ready(l)
        print(f"trace -> {trace}", flush=True)
    del state, batch
    return ips


if __name__ == "__main__":
    case(bs=256, trace="/tmp/effnet_trace")
    # batch-size lever: depthwise stages are VPU/HBM-bound, so larger
    # batches may amortize fixed work — or blow HBM into panic-remat
    case(bs=128)
    case(bs=512)
