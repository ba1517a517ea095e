#!/usr/bin/env python
"""Production-scale IVF probe (round-4 ask #9).

Builds a >=100k-row gallery, runs it through IvfIndex exactly the way
IndexBasedMeter(exact_index=False) would above ivf_threshold, and records:
  * build time (k-means on device) and search time
  * recall@10 of IVF vs the exact TpuIndex answer on the same data
  * device memory high-water (jax memory_stats) and host RSS
  * cell-size skew (max/mean member count, truncation if any)

Also runs the same gallery through IndexBasedMeter with a forced-low
ivf_threshold so the integration path (chunked queries, -1 padding, metric
computation) is exercised at scale, not just the raw index.

Run: python tools/probe_ivf_scale.py [--rows 200000] [--dim 64] [--cpu]
"""
from __future__ import annotations

import argparse
import json
import os
import resource
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from torchok_tpu.utils.compile_cache import cache_dir as _cache_dir
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _cache_dir())

import numpy as np


def rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def device_mem_mb() -> float:
    import jax
    stats = jax.local_devices()[0].memory_stats() or {}
    peak = stats.get("peak_bytes_in_use") or stats.get("bytes_in_use") or 0
    return peak / 1e6


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=200_000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--queries", type=int, default=2048)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--skip-meter", action="store_true",
                    help="index-only run (the meter leg is O(rows^2/cells) "
                    "and dominates past ~500k rows)")
    ap.add_argument("--nprobe", type=int, default=None,
                    help="override IvfIndex's default (8) — recall/latency "
                    "tradeoff sweeps at large nlist")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    from torchok_tpu.ops.knn import IvfIndex, TpuIndex

    rng = np.random.default_rng(0)
    # clustered data (realistic for embeddings): 256 latent modes + noise
    modes = rng.normal(size=(256, args.dim)).astype(np.float32)
    assign = rng.integers(0, 256, size=args.rows)
    gallery = (modes[assign] + 0.3 * rng.normal(size=(args.rows, args.dim))
               ).astype(np.float32)
    gallery /= np.linalg.norm(gallery, axis=1, keepdims=True)
    queries = gallery[rng.choice(args.rows, args.queries, replace=False)]
    queries = (queries + 0.1 * rng.normal(size=queries.shape)
               ).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)

    print(f"gallery {args.rows}x{args.dim}, {args.queries} queries, "
          f"k={args.k}, device={jax.devices()[0].device_kind}", flush=True)

    t0 = time.perf_counter()
    exact = TpuIndex(gallery, metric="IP")
    _, exact_idx = exact.search(queries, args.k)
    t_exact = time.perf_counter() - t0
    print(f"exact search: {t_exact:.2f}s", flush=True)

    t0 = time.perf_counter()
    kw = {} if args.nprobe is None else {"nprobe": args.nprobe}
    ivf = IvfIndex(gallery, metric="IP", **kw)
    t_build = time.perf_counter() - t0
    counts = np.asarray((ivf.members >= 0).sum(axis=1))
    t0 = time.perf_counter()
    _, ivf_idx = ivf.search(queries, args.k)
    t_search = time.perf_counter() - t0

    # recall@k: fraction of exact top-k ids the IVF result recovered
    hits = sum(len(set(e.tolist()) & set(i.tolist()))
               for e, i in zip(exact_idx, ivf_idx))
    recall = hits / (args.queries * args.k)

    row = {
        "rows": args.rows, "dim": args.dim, "nlist": ivf.nlist,
        "nprobe": ivf.nprobe,
        "build_s": round(t_build, 2), "search_s": round(t_search, 2),
        "exact_search_s": round(t_exact, 2),
        "recall_at_10_vs_exact": round(recall, 4),
        "cell_max": int(counts.max()), "cell_mean": float(counts.mean()),
        "truncated_rows": int(args.rows - counts.sum()),
        "host_rss_mb": round(rss_mb(), 1),
        "device_peak_mb": round(device_mem_mb(), 1),
        "device": jax.devices()[0].device_kind,
    }
    print("IVF_SCALE " + json.dumps(row), flush=True)

    if args.skip_meter:
        return
    # integration path: the real meter with exact_index=False at a gallery
    # size past the production ivf_threshold (classification mode: every row
    # is both query and gallery, self-match removed) — exercises chunked
    # search, -1 padding and metric computation at scale, not just the index
    from torchok_tpu.metrics.representation import HitAtKMeter
    labels = assign  # mode id as group label -> meaningful retrieval targets
    meter = HitAtKMeter(dataset_type="classification", exact_index=False,
                        metric_distance="IP", k=args.k,
                        ivf_threshold=min(50_000, args.rows // 2),
                        search_batch_size=512)
    state = meter.empty_state()
    half = args.rows // 2
    state = meter.update(state, vectors=gallery[:half], group_labels=labels[:half])
    state = meter.update(state, vectors=gallery[half:], group_labels=labels[half:])
    t0 = time.perf_counter()
    value = meter.compute(state)
    t_meter = time.perf_counter() - t0
    print(f"HitAtKMeter(exact_index=False, k={args.k}) over {args.rows} rows: "
          f"value={float(value):.4f} in {t_meter:.1f}s "
          f"(host rss {rss_mb():.0f} MB, device peak {device_mem_mb():.0f} MB)",
          flush=True)


if __name__ == "__main__":
    main()
