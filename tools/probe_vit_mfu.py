"""Measure ViT / BEiT train-step MFU on the TPU (decides whether the fused
window-attention family needs a full-sequence flash mode for the global-
attention backbones, or whether XLA already keeps them MXU-bound).

Usage: python tools/probe_vit_mfu.py [backbone ...]   (defaults below)
"""
import sys

sys.path.insert(0, "/root/repo")

import bench


if __name__ == "__main__":
    names = sys.argv[1:] or ["vit_small_patch16_224", "beit_base_patch16_224"]
    for name in names:
        # ViT/BEiT forward already emits the pooled cls token (B, C) like the
        # reference (torchok/models/backbones/vit.py:334-341) — no Pooling.
        out = bench.bench_case(name, 224, 128, k=10, reps=3, pooling_name=None)
        print(f"[{name}] {out}", flush=True)
