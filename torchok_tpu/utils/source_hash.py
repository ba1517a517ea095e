"""Content hash over the model-defining sources.

Keys the committed backbone shape table (tests/data/backbone_shapes.json):
when any file that can influence a backbone's traced shapes changes, the
hash changes and the shape sweep falls back to a full abstract re-trace
until the table is regenerated (tools/gen_backbone_shape_table.py).
"""
from __future__ import annotations

import hashlib
import pathlib

_ROOT = pathlib.Path(__file__).resolve().parent.parent


def model_source_hash() -> str:
    h = hashlib.sha256()
    files = sorted(
        list((_ROOT / "models").rglob("*.py"))
        + list((_ROOT / "ops").rglob("*.py")))
    for f in files:
        h.update(str(f.relative_to(_ROOT)).encode())
        h.update(f.read_bytes())
    return h.hexdigest()
