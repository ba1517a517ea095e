"""Probe: does a larger batch lift MFU on the bench families? (round 5)

Every bench extra fixes one batch size (256 for CNNs, 128 for
transformers). MFU could be batch-bound: bigger M on every matmul, fewer
launches per image. This measures the next batch size up on the families
with headroom and records win/wash/OOM per case — same protocol as
bench.py (fused k-step scan, XLA cost-analysis MFU).

Run ON TPU:  python tools/probe_batch_scaling.py
Filter:      TORCHOK_PROBE_CASES=resnet50_512 python tools/probe_batch_scaling.py
"""
import os
import sys

sys.path.insert(0, "/root/repo")
# library mode: no signal handlers / watchdog threads from bench's import
os.environ["TORCHOK_BENCH_LIB"] = "1"

from bench import bench_case  # noqa: E402

CASES = {
    # baseline rows (BASELINE.md): r50 bs256 31.2% MFU, vit-s bs128 26.2%,
    # beit-b bs128 33.1%, gcvit-t bs128 12.6%, davit-t bs128 17.6%
    "resnet50_512": lambda: bench_case("resnet50", 224, 512, k=10, reps=3),
    "vit_small_256": lambda: bench_case("vit_small_patch16_224", 224, 256,
                                        k=10, reps=3, pooling_name=None),
    "beit_base_256": lambda: bench_case("beit_base_patch16_224", 224, 256,
                                        k=10, reps=3, pooling_name=None),
    "gcvit_tiny_256": lambda: bench_case("gcvit_tiny", 224, 256, k=10, reps=3),
    "davit_t_256": lambda: bench_case("davit_t", 224, 256, k=10, reps=3),
    # bs 256 does not fit without remat (bench.py note); grad_checkpointing
    # trades recompute for batch — does img/s beat the bs-128 no-remat row?
    "swinv2_tiny_256_remat": lambda: bench_case(
        "swinv2_tiny_window8_256", 256, 256, k=10, reps=3,
        backbone_extra={"grad_checkpointing": True}),
}


def main():
    only = os.environ.get("TORCHOK_PROBE_CASES")
    for name, fn in CASES.items():
        if only and name not in only.split(","):
            continue
        print(f"--- {name}: tracing/compiling", flush=True)
        try:
            out = fn()
        except Exception as e:  # noqa: BLE001 — OOM is an expected outcome
            print(f"{name}: FAILED {str(e)[:300]}", flush=True)
            continue
        print(f"{name}: {out}", flush=True)


if __name__ == "__main__":
    main()
