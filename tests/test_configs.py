"""All shipped YAML recipes must parse, schema-merge, and build their task."""
import os
from pathlib import Path

import pytest

import torchok_tpu  # noqa: F401
from torchok_tpu.constructor import TASKS
from torchok_tpu.constructor.config import load_config
from torchok_tpu.constructor.config_structure import merge_structured

CONFIG_DIR = Path(__file__).parent.parent / "configs"
CONFIGS = sorted(p.relative_to(CONFIG_DIR) for p in CONFIG_DIR.rglob("*.yaml"))


@pytest.mark.parametrize("name", [str(c) for c in CONFIGS])
def test_config_parses_and_builds_task(name):
    os.environ.setdefault("HOME", "/tmp")
    cfg = load_config(CONFIG_DIR, name)
    merged = merge_structured(cfg)
    params = merged.task.get("params") or {}
    if hasattr(params, "to_dict"):
        params = params.to_dict()
    if merged.task.name in ("StableHLOTask", "ONNXTask"):
        pytest.skip("needs an exported artifact on disk")
    task = TASKS.get(merged.task.name)(merged, **params)
    assert task.model is not None
