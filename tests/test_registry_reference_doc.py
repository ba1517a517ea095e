"""docs/registry_reference.md must match the live registries.

Regenerate with: python tools/gen_registry_reference.py
"""
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_registry_reference_up_to_date():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "gen_registry_reference", REPO / "tools" / "gen_registry_reference.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    expected = mod.build()
    committed = (REPO / "docs" / "registry_reference.md").read_text()
    assert committed == expected, (
        "docs/registry_reference.md is stale — run "
        "python tools/gen_registry_reference.py")
