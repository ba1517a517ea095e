"""Summarize a jax.profiler xplane trace: self-time by HLO op, grouped into
categories (conv/matmul fusions, elementwise fusions, copies, etc.).

tensorboard_plugin_profile in this image is ABI-incompatible with its
tensorflow, so this parses the XSpace protobuf directly and aggregates
device-plane event durations.

Usage: python tools/analyze_xplane.py /tmp/r50_trace [top_n]
"""
import collections
import glob
import re
import sys


def load_xspace(path):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    return xs


def categorize(name):
    n = name.lower()
    if "conv" in n:
        return "convolution"
    if re.search(r"\bdot\b|matmul|einsum", n):
        return "matmul"
    if "custom-call" in n or "mosaic" in n or "tpu_custom_call" in n:
        return "pallas/custom-call"
    if "all-reduce" in n or "all-gather" in n or "reduce-scatter" in n:
        return "collective"
    if "copy" in n or "transpose" in n or "bitcast-convert" in n:
        return "copy/relayout"
    if "reduce" in n:
        return "reduce"
    if "scatter" in n or "gather" in n or "dynamic-slice" in n or "dynamic-update" in n:
        return "gather/scatter/slice"
    if "fusion" in n or "fused" in n:
        return "elementwise-fusion"
    if "infeed" in n or "outfeed" in n or "send" in n or "recv" in n:
        return "host-io"
    return "other"


_CONTROL = re.compile(r"^%?(while|conditional|call|tuple|get-tuple-element|"
                      r"parameter|constant)")


def _union(intervals):
    """Total covered time of a list of (start, end)."""
    if not intervals:
        return 0
    intervals.sort()
    total = 0
    cur_s, cur_e = intervals[0]
    for s, e in intervals[1:]:
        if s > cur_e:
            total += cur_e - cur_s
            cur_s, cur_e = s, e
        else:
            cur_e = max(cur_e, e)
    return total + (cur_e - cur_s)


def main(trace_dir, top_n=25):
    paths = sorted(glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True))
    if not paths:
        raise SystemExit(f"no xplane.pb under {trace_dir}")
    xs = load_xspace(paths[-1])
    by_op = collections.Counter()           # flat self-duration sums
    cat_intervals = collections.defaultdict(list)
    span_lo, span_hi = None, 0
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        meta = {m_id: m.name for m_id, m in plane.event_metadata.items()}
        for line in plane.lines:
            if "XLA Ops" not in line.name:
                continue
            for ev in line.events:
                name = meta.get(ev.metadata_id, "?")
                if _CONTROL.match(name):
                    continue  # control ops span their whole body
                s = line.timestamp_ns * 1000 + ev.offset_ps
                e = s + ev.duration_ps
                span_lo = s if span_lo is None else min(span_lo, s)
                span_hi = max(span_hi, e)
                by_op[name] += ev.duration_ps
                cat_intervals[categorize(name)].append((s, e))
    span = max(span_hi - (span_lo or 0), 1)
    print(f"# {paths[-1]}\ntrace span (non-control ops): {span / 1e12:.3f} s")
    print("\n== busy occupancy by category (interval union / span; async "
          "copies overlap compute, so columns do not sum to 100%) ==")
    rows = sorted(cat_intervals.items(),
                  key=lambda kv: -_union(list(kv[1])))
    for cat, iv in rows:
        print(f"{_union(list(iv)) / span * 100:6.2f}%  {cat}")
    print(f"\n== top {top_n} ops by summed duration (may overlap) ==")
    total = sum(by_op.values()) or 1
    for name, t in by_op.most_common(top_n):
        print(f"{t / total * 100:6.2f}%  {name[:100]}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/r50_trace",
         int(sys.argv[2]) if len(sys.argv) > 2 else 25)
