#!/usr/bin/env python
"""A/B the device (batched TPU) vs host (per-sample numpy/cv2) augmentation
path on a realistic train stack (VERDICT r3 #10 tail).

Pipeline: RandomResizedCrop -> HorizontalFlip -> OneOf(ColorJitter,
GaussianBlur) -> GridDropout -> Normalize. Every op is device-capable as of
round 4f, so split_device_suffix moves the WHOLE stack to the device;
the host leg runs the same Compose per sample on CPU.

    python tools/probe_device_aug.py            # TPU (or whatever default)
    python tools/probe_device_aug.py --cpu      # force CPU for a smoke run
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def build_pipe():
    from torchok_tpu.constructor import TRANSFORMS

    mk = TRANSFORMS.get
    return mk("Compose")(transforms=[
        mk("RandomResizedCrop")(height=224, width=224, p=1.0),
        mk("HorizontalFlip")(p=0.5),
        mk("OneOf")(transforms=[
            mk("ColorJitter")(p=1.0),
            mk("GaussianBlur")(blur_limit=(3, 7), p=1.0),
        ], p=0.8),
        mk("GridDropout")(ratio=0.3, holes_number_x=4, holes_number_y=4,
                          random_offset=True, p=0.5),
        mk("Normalize")(),
    ])


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--batch", type=int, default=128)
    parser.add_argument("--iters", type=int, default=20)
    parser.add_argument("--host-samples", type=int, default=256)
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    pipe = build_pipe()
    pipe.seed(0)
    host_prefix, device_suffix = pipe.split_device_suffix(
        bbox_mode=False, uniform_shapes=True)
    print(f"host prefix: {[type(t).__name__ for t in host_prefix.transforms]}")
    print(f"device suffix: {[type(t).__name__ for t in device_suffix]}")

    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (args.batch, 256, 256, 3), dtype=np.uint8)

    # ---- device leg: one jitted closure over the suffix ----
    base_key = jax.random.PRNGKey(0)

    def device_fn(batch, step):
        out = {"image": batch}
        for i, t in enumerate(device_suffix):
            k = jax.random.fold_in(jax.random.fold_in(base_key, step), i)
            out = t.apply_batch(out, k)
        return out["image"]

    jfn = jax.jit(device_fn)
    x = jnp.asarray(imgs)
    jfn(x, 0).block_until_ready()  # compile
    t0 = time.perf_counter()
    for i in range(args.iters):
        y = jfn(x, i)
    y.block_until_ready()
    dev_s = time.perf_counter() - t0
    dev_ips = args.batch * args.iters / dev_s
    print(f"device (per-dispatch): {dev_ips:,.0f} img/s "
          f"({args.iters} x bs{args.batch} in {dev_s:.2f}s) on "
          f"{jax.devices()[0].platform}")

    # ---- fused leg: all iters inside ONE dispatch (lax.scan), the
    # sustained-throughput protocol for this tunneled rig (CLAUDE.md) ----
    def fused(xb):
        def body(carry, step):
            out = device_fn(xb, step)
            return carry + out.astype(jnp.float32).mean(), None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0),
                              jnp.arange(args.iters))
        return acc

    jfused = jax.jit(fused)
    jfused(x).block_until_ready()  # compile
    t0 = time.perf_counter()
    jfused(x).block_until_ready()
    fus_s = time.perf_counter() - t0
    fus_ips = args.batch * args.iters / fus_s
    print(f"device (fused scan):   {fus_ips:,.0f} img/s "
          f"({args.iters} x bs{args.batch} in {fus_s:.2f}s)")
    dev_ips = max(dev_ips, fus_ips)

    # ---- host leg: the same full Compose per sample on CPU ----
    n = args.host_samples
    t0 = time.perf_counter()
    for i in range(n):
        pipe(image=imgs[i % args.batch])
    host_s = time.perf_counter() - t0
    host_ips = n / host_s
    print(f"host:   {host_ips:,.0f} img/s/thread ({n} samples in {host_s:.2f}s)")
    print(f"ratio:  {dev_ips / host_ips:,.1f}x")
    return 0


if __name__ == "__main__":
    sys.exit(main())
