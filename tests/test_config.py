import os

import pytest

from torchok_tpu.constructor.config import (
    ConfigNode, apply_override, load_config, resolve,
)
from torchok_tpu.constructor.config_structure import Phase, merge_structured


def test_confignode_access():
    cfg = ConfigNode({"a": {"b": [1, {"c": 2}]}})
    assert cfg.a.b[0] == 1
    assert cfg.a.b[1].c == 2
    assert cfg.get("missing", 5) == 5
    cfg.a.d = 3
    assert cfg["a"]["d"] == 3
    assert cfg.to_dict() == {"a": {"b": [1, {"c": 2}], "d": 3}}


def test_env_interpolation(monkeypatch):
    monkeypatch.setenv("MY_TEST_VAR", "/data")
    tree = {"path": "${oc.env:MY_TEST_VAR}/x", "missing": "${oc.env:NOPE,fallback}"}
    out = resolve(tree)
    assert out["path"] == "/data/x"
    assert out["missing"] == "fallback"


def test_self_reference():
    tree = {"a": {"b": 7}, "c": "${a.b}", "d": "prefix_${a.b}"}
    out = resolve(tree)
    assert out["c"] == 7
    assert out["d"] == "prefix_7"


def test_now_interpolation():
    out = resolve({"t": "${now:%Y}"})
    assert len(str(out["t"])) == 4


def test_overrides():
    tree = {"trainer": {"max_epochs": 10}}
    apply_override(tree, "trainer.max_epochs", "3")
    assert tree["trainer"]["max_epochs"] == 3
    apply_override(tree, "+trainer.new_key", "hello")
    assert tree["trainer"]["new_key"] == "hello"
    with pytest.raises(KeyError):
        apply_override(tree, "trainer.not_there", "1")


def _minimal_cfg():
    return ConfigNode({
        "task": {"name": "ClassificationTask", "params": {}},
        "data": {"TRAIN": [{"dataset": {"name": "D", "params": {}, "transform": []},
                            "dataloader": {"batch_size": 4}}]},
        "trainer": {"max_epochs": 2},
    })


def test_structured_merge_defaults():
    cfg = merge_structured(_minimal_cfg())
    assert cfg.trainer.accumulate_grad_batches == 1
    assert cfg.trainer.precision == 32
    assert cfg.task.compute_loss_on_valid is True
    assert cfg.metrics == []


def test_structured_merge_rejects_unknown():
    bad = _minimal_cfg()
    bad.trainer["max_epocs"] = 3  # typo
    with pytest.raises(KeyError):
        merge_structured(bad)


def test_phase_keys_coerced():
    cfg = merge_structured(_minimal_cfg())
    assert "TRAIN" in cfg.data


def test_load_config_yaml_anchors(tmp_path):
    (tmp_path / "c.yaml").write_text(
        "a: &x {h: 32}\nb: *x\ntrainer: {max_epochs: 1}\n")
    cfg = load_config(tmp_path, "c")
    assert cfg.b.h == 32
