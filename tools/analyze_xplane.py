"""Summarize a jax.profiler xplane trace: top self-time HLO categories/ops.

Usage: python tools/analyze_xplane.py /tmp/r50_trace
Finds the newest *.xplane.pb under the directory and prints the op-profile
breakdown via tensorboard_plugin_profile (installed in this image).
"""
import glob
import json
import sys


def main(trace_dir):
    paths = sorted(glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True))
    if not paths:
        raise SystemExit(f"no xplane.pb under {trace_dir}")
    path = paths[-1]
    print(f"# {path}")
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

    data, _ = rtd.xspace_to_tool_data([path], "op_profile", params={})
    tree = json.loads(data)
    by_cat = tree.get("byCategory", {})
    total = by_cat.get("metrics", {}).get("rawTime", 0) or 1

    def walk(node, depth, budget=3):
        m = node.get("metrics", {})
        t = m.get("rawTime", 0)
        frac = t / total
        if frac < 0.005:
            return
        flops = m.get("flops", 0.0)
        name = node.get("name", "?")[:70]
        print(f"{'  ' * depth}{frac * 100:6.2f}%  {name}"
              + (f"  (flop-util {flops:.1f}%)" if flops else ""))
        if depth < budget:
            for ch in sorted(node.get("children", []),
                             key=lambda c: -c.get("metrics", {}).get("rawTime", 0))[:8]:
                walk(ch, depth + 1, budget)

    walk(by_cat, 0)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/r50_trace")
