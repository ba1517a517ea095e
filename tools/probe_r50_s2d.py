"""A/B: space_to_depth_stem on ResNet-50 224/bs256 bf16 train.

The 7x7/s2 stem conv has 3 input channels — the MXU contraction dim is
7*7*3=147 and the im2col relayout of a 3-channel NHWC tensor tiles poorly.
space_to_depth_stem runs the numerically identical s2d + 4x4/s1 conv
(12 input channels, contraction 192). Measures end-to-end train img/s.

MEASURED (2026-08-17, tunneled v5e): plain 2572, s2d 2567 img/s (-0.2%) —
a wash; this generation's conv emitter already handles the 3-channel stem
near its roofline share, so the stem stays opt-in (it can still matter on
MXUs with stricter channel tiling).
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


def case(extra, bs=256, hw=224, k=10, tag=""):
    trainer, task = build_trainer("resnet50", hw, bs, backbone_extra=extra)
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
    print(f"[r50 {tag}] {ips:.0f} img/s (loss {float(l[-1]):.4f})", flush=True)
    return ips


if __name__ == "__main__":
    a = case(None, tag="plain-stem")
    b = case({"space_to_depth_stem": True}, tag="s2d-stem")
    print(f"s2d delta: {100.0 * (b - a) / a:+.1f}%")
