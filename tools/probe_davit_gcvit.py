"""A/B the DaViT-T / GCViT-T @224 bs128 train step: fused dot-product
Pallas window attention (cosine=False mode) vs the XLA windowed formulation."""
import os
import sys

sys.path.insert(0, "/root/repo")
from torchok_tpu.utils.compile_cache import cache_dir as _cache_dir
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _cache_dir())

import bench


def run(backbone, flag, bs=128):
    os.environ["TORCHOK_WINDOW_ATTN_PALLAS"] = flag
    out = bench.bench_case(backbone, 224, bs, k=10, reps=3)
    print(f"[{backbone} {flag}] {out}", flush=True)
    return out


if __name__ == "__main__":
    names = sys.argv[1:] or ["davit_t", "gcvit_tiny"]
    for name in names:
        xla = run(name, "0")
        fused = run(name, "auto")
        speedup = (fused["images_per_sec_per_chip"]
                   / xla["images_per_sec_per_chip"])
        print(f"{name} speedup fused/xla: {speedup:.3f}", flush=True)
