"""A/B the full swinv2_tiny_256 bs128 train step: fused Pallas window
attention (TORCHOK_WINDOW_ATTN_PALLAS=auto on TPU) vs XLA formulation."""
import os
import sys

sys.path.insert(0, "/root/repo")
from torchok_tpu.utils.compile_cache import cache_dir as _cache_dir
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _cache_dir())

import bench


def run(flag):
    os.environ["TORCHOK_WINDOW_ATTN_PALLAS"] = flag
    out = bench.bench_case("swinv2_tiny_window8_256", 256, 128, k=10, reps=3)
    print(f"[{flag}] {out}", flush=True)
    return out


if __name__ == "__main__":
    xla = run("0")
    fused = run("auto")
    speedup = fused["images_per_sec_per_chip"] / xla["images_per_sec_per_chip"]
    print(f"speedup fused/xla: {speedup:.3f}")
