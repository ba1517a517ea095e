"""Generate docs/registry_reference.md — the full per-registry API surface.

The reference ships per-topic user docs (docs/source/{models,tasks,datasets,
losses,metrics,callbacks,loggers,transforms_augments}.rst) listing every
registered name.  This tool derives the same catalogue directly from the
live registries so the doc can never go stale: run it after adding or
renaming any registered component.

Usage:
    python tools/gen_registry_reference.py          # rewrites the doc
    python tools/gen_registry_reference.py --check  # exit 1 if stale
"""
from __future__ import annotations

import inspect
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))  # python puts tools/ on sys.path, not the root
OUT = REPO / "docs" / "registry_reference.md"

# registry name -> (section title, short intro)
SECTIONS = [
    ("tasks", "Tasks", "Select with `task.name`."),
    ("backbones", "Backbones",
     "Select with `task.params.backbone_name`; every name accepts "
     "`backbone_params` (`pretrained`, `in_channels`, `img_size`, "
     "`grad_checkpointing`, ...). Wildcards work through "
     "`torchok_tpu.list_models('swinv2_*')`."),
    ("necks", "Necks (classification / segmentation)",
     "Select with `task.params.neck_name`."),
    ("detection_necks", "Detection necks",
     "Select with `task.params.neck_name` on `SingleStageDetectionTask`."),
    ("poolings", "Poolings", "Select with `task.params.pooling_name`."),
    ("heads", "Heads", "Select with `task.params.head_name` (or the "
     "`heads:` list on `MultiHeadClassificationTask`)."),
    ("datasets", "Datasets", "Select with `data.<PHASE>[i].dataset.name`."),
    ("samplers", "Samplers", "Select with `data.<PHASE>[i].sampler.name`."),
    ("transforms", "Transforms / augmentations",
     "Usable in both `dataset.transform` (deterministic) and "
     "`dataset.augment` (train-time random) lists; albumentations-parity "
     "names, executed batched on device where supported with per-sample "
     "folded RNG keys, host fallback otherwise."),
    ("losses", "Losses", "Entries of `joint_loss.losses[].name`."),
    ("metrics", "Metrics", "Entries of `metrics[].name`."),
    ("optimizers", "Optimizers",
     "Select with `optimization[i].optimizer.name`."),
    ("schedulers", "Schedulers",
     "Select with `optimization[i].scheduler.name`."),
    ("callbacks", "Callbacks", "Entries of `callbacks[].name`."),
    ("loggers", "Loggers", "Select with `logger.logger`."),
]


def _first_line(obj) -> str:
    doc = inspect.getdoc(obj) or ""
    line = doc.strip().split("\n", 1)[0].strip()
    # flax dataclasses synthesize "<Name>(field: type = default, ..." docs
    name = getattr(obj, "__name__", "")
    if name and line.startswith(name + "("):
        return ""
    if len(line) > 160:
        line = line[:157] + "..."
    return line.replace("|", "\\|")


def build() -> str:
    import torchok_tpu  # noqa: F401 — populates every registry
    from torchok_tpu import constructor as C

    lines = [
        "# Registry reference",
        "",
        "Every name selectable from YAML, by registry. Auto-generated — do",
        "not edit by hand; regenerate with",
        "`python tools/gen_registry_reference.py` (CI-checked with",
        "`--check`). The reference toolkit documents the same surface in",
        "`docs/source/*.rst`.",
        "",
    ]
    for reg_name, title, intro in SECTIONS:
        reg = getattr(C, reg_name.upper())
        # only entries defined inside the package: test modules register
        # helper classes into the live registries, and the doc must not
        # depend on which tests imported first (order-independent build)
        entries = sorted(
            (n, o) for n, o in reg.entries.items()
            if getattr(o, "__module__", "").startswith("torchok_tpu"))
        lines += [f"## {title} ({len(entries)})", "", intro, ""]
        if reg_name == "backbones":
            # 319 variant entrypoints collapse to families for readability
            fams: dict[str, list[str]] = {}
            for name, fn in entries:
                fam = getattr(fn, "__module__", "?").rsplit(".", 1)[-1]
                fams.setdefault(fam, []).append(name)
            lines += ["| family module | variants | names |", "|---|---|---|"]
            for fam, names in sorted(fams.items()):
                shown = ", ".join(f"`{n}`" for n in names[:6])
                if len(names) > 6:
                    shown += f", ... (+{len(names) - 6} more)"
                lines.append(f"| `models/backbones/{fam}.py` | {len(names)} "
                             f"| {shown} |")
            lines.append("")
            continue
        lines += ["| name | summary |", "|---|---|"]
        for name, obj in entries:
            lines.append(f"| `{name}` | {_first_line(obj)} |")
        lines.append("")
    return "\n".join(lines) + "\n"


def main() -> int:
    text = build()
    if "--check" in sys.argv:
        if not OUT.exists() or OUT.read_text() != text:
            print(f"{OUT} is stale; run python tools/gen_registry_reference.py")
            return 1
        print("registry_reference.md up to date")
        return 0
    OUT.write_text(text)
    print(f"wrote {OUT} ({len(text.splitlines())} lines)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
