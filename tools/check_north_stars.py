#!/usr/bin/env python
"""North-star quality-regression gate.

BASELINE.md's measured accuracy north-stars as an enforced contract
(reference analog: .github/workflows/training_test.yml:85-128 runs full
training-regression recipes per push). Runs each quality recipe and FAILS
(exit 1) if the recorded metric drops below baseline - tolerance.

Usage:
    python tools/check_north_stars.py                    # full recipes (TPU, hours)
    python tools/check_north_stars.py --budget short     # short-budget variants
    python tools/check_north_stars.py --only classification,fcos
    python tools/check_north_stars.py --accelerator cpu  # smoke the gate itself

Baselines live in tools/north_star_baselines.json; update it ONLY from a
measured run (this tool prints the JSON row for any run it executes).
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

BASELINES = REPO / "tools" / "north_star_baselines.json"


def run_recipe(name: str, spec: dict, budget: str, accelerator: str | None,
               extra_overrides: list | None = None):
    import jax

    from torchok_tpu.constructor import TASKS
    from torchok_tpu.constructor.config import load_config
    from torchok_tpu.constructor.config_structure import merge_structured
    from torchok_tpu.constructor.runner import create_trainer
    from torchok_tpu.utils.seed import seed_everything

    overrides = list(spec.get("overrides", []))
    if budget == "short":
        overrides += spec["short"]["overrides"]
    overrides += extra_overrides or []
    raw = load_config(str(REPO / "configs"), spec["config"], overrides)
    config = merge_structured(raw)
    if accelerator:
        platform = {"cuda": "gpu"}.get(accelerator, accelerator)
        jax.config.update("jax_platforms", platform)

    seed = (config.get("seed_params") or {}).get("seed")
    if seed is not None:
        seed_everything(int(seed))
    params = config.task.get("params") or {}
    if hasattr(params, "to_dict"):
        params = params.to_dict()
    task = TASKS.get(config.task.name)(config, **params)
    trainer = create_trainer(config)
    t0 = time.time()
    trainer.fit(task)
    elapsed = time.time() - t0
    metric_key = spec["metric"]
    value = float(trainer.callback_metrics[metric_key])
    return value, elapsed


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--budget", choices=["full", "short"], default="full")
    parser.add_argument("--only", default=None,
                        help="comma-separated subset of north-star names")
    parser.add_argument("--accelerator", default=None,
                        help="force a JAX platform (cpu for gate smoke tests)")
    parser.add_argument("--record", action="store_true",
                        help="print measured values as baseline JSON rows "
                             "instead of gating")
    parser.add_argument("--override", action="append", default=[],
                        help="extra dotted config overrides (repeatable; "
                             "for smoke runs of the gate itself)")
    args = parser.parse_args()

    stars = json.loads(BASELINES.read_text())
    names = list(stars)
    if args.only:
        names = [n for n in names if n in set(args.only.split(","))]
        missing = set(args.only.split(",")) - set(stars)
        if missing:
            parser.error(f"unknown north-stars: {sorted(missing)}; "
                         f"available: {list(stars)}")

    failures = []
    results = {}
    for name in names:
        spec = stars[name]
        baseline = spec[args.budget].get("value")
        tol = spec[args.budget].get("tol")
        print(f"== {name}: {spec['config']} ({args.budget} budget) ==",
              flush=True)
        value, elapsed = run_recipe(name, spec, args.budget, args.accelerator,
                                    args.override)
        results[name] = value
        if baseline is None:
            print(f"   {spec['metric']} = {value:.4f} ({elapsed:.0f}s) — "
                  f"no {args.budget} baseline recorded yet", flush=True)
            continue
        floor = baseline - tol
        status = "OK" if value >= floor else "REGRESSION"
        print(f"   {spec['metric']} = {value:.4f} vs baseline {baseline} "
              f"(floor {floor:.4f}) [{status}] ({elapsed:.0f}s)", flush=True)
        if value < floor:
            failures.append((name, value, floor))

    if args.record:
        print(json.dumps(results, indent=2))
        return 0
    if failures:
        print("\nNORTH-STAR REGRESSIONS:")
        for name, value, floor in failures:
            print(f"  {name}: {value:.4f} < floor {floor:.4f}")
        return 1
    print("\nall north-stars within tolerance")
    return 0


if __name__ == "__main__":
    sys.exit(main())
