"""Compositional checkpoint loading tests (reference pattern:
tests/base_tests/constructor/test_load_checkpoint.py over
torchok/constructor/load.py:93-227 — base ckpt + per-module overrides in
key-depth order + exclude_keys restored to init)."""
import numpy as np
import pytest
from flax import serialization

from torchok_tpu.constructor.load import (generate_required_state_dict,
                                          load_checkpoint, _flatten)


def _params(scale):
    return {
        "backbone": {"conv1": {"kernel": np.full((2, 2), scale, np.float32)},
                     "bn1": {"scale": np.full((2,), scale, np.float32)}},
        "head": {"fc": {"kernel": np.full((2, 3), scale, np.float32),
                        "bias": np.full((3,), scale, np.float32)}},
    }


def _save(tmp_path, name, params):
    p = tmp_path / name
    with open(p, "wb") as f:
        f.write(serialization.msgpack_serialize({"params": params}))
    return str(p)


def test_base_checkpoint_overlays_everything(tmp_path):
    init = {"params": _params(0.0)}
    base = _save(tmp_path, "base.ckpt", _params(1.0))
    out = load_checkpoint(init, base_ckpt_path=base)
    assert float(out["params"]["head"]["fc"]["bias"][0]) == 1.0
    assert float(out["params"]["backbone"]["conv1"]["kernel"][0, 0]) == 1.0


def test_module_override_wins_over_base(tmp_path):
    init = {"params": _params(0.0)}
    base = _save(tmp_path, "base.ckpt", _params(1.0))
    head_only = _save(tmp_path, "head.ckpt", _params(2.0))
    out = load_checkpoint(init, base_ckpt_path=base,
                          overridden_name2ckpt_path={"head": head_only})
    # head comes from the override, backbone from the base
    assert float(out["params"]["head"]["fc"]["bias"][0]) == 2.0
    assert float(out["params"]["backbone"]["conv1"]["kernel"][0, 0]) == 1.0


def test_deeper_override_wins(tmp_path):
    init = {"params": _params(0.0)}
    head = _save(tmp_path, "head.ckpt", _params(2.0))
    fc = _save(tmp_path, "fc.ckpt", _params(3.0))
    out = load_checkpoint(init,
                          overridden_name2ckpt_path={"head": head,
                                                     "head.fc.bias": fc})
    assert float(out["params"]["head"]["fc"]["bias"][0]) == 3.0   # deeper wins
    assert float(out["params"]["head"]["fc"]["kernel"][0, 0]) == 2.0


def test_exclude_keys_restored_to_init(tmp_path):
    init = {"params": _params(0.0)}
    base = _save(tmp_path, "base.ckpt", _params(1.0))
    out = load_checkpoint(init, base_ckpt_path=base,
                          exclude_keys=["head.fc"])
    assert float(out["params"]["head"]["fc"]["bias"][0]) == 0.0  # back to init
    assert float(out["params"]["backbone"]["bn1"]["scale"][0]) == 1.0


def test_strict_shape_mismatch_raises(tmp_path):
    init = {"params": _params(0.0)}
    bad = _params(1.0)
    bad["head"]["fc"]["kernel"] = np.zeros((4, 5), np.float32)
    base = _save(tmp_path, "bad.ckpt", bad)
    with pytest.raises(ValueError, match="Shape mismatch"):
        load_checkpoint(init, base_ckpt_path=base, strict=True)
    # non-strict: the mismatched leaf is still overlaid, caller beware —
    # reference semantics keep strict=True the default
    out = load_checkpoint(init, base_ckpt_path=base, strict=False)
    assert out["params"]["head"]["fc"]["kernel"].shape == (4, 5)


def test_strict_unknown_key_raises(tmp_path):
    init = {"params": _params(0.0)}
    extra = _params(1.0)
    extra["decoder"] = {"w": np.zeros((1,), np.float32)}
    base = _save(tmp_path, "extra.ckpt", extra)
    with pytest.raises(KeyError):
        load_checkpoint(init, base_ckpt_path=base, strict=True)
    out = load_checkpoint(init, base_ckpt_path=base, strict=False)
    assert "decoder" not in out["params"]


def test_paramwise_cfg_lr_and_decay_groups():
    """mmcv-style paramwise_cfg: custom_keys longest-substring match and
    bias/norm multipliers produce distinct optimizer groups
    (reference: torchok/constructor/constructor.py:85-251)."""
    import jax.numpy as jnp
    from torchok_tpu.constructor.config import ConfigNode
    from torchok_tpu.constructor.constructor import Constructor

    hparams = ConfigNode({
        "optimization": [{
            "optimizer": {
                "name": "SGD",
                "params": {"lr": 1.0, "weight_decay": 0.1},
                "paramwise_cfg": {
                    "custom_keys": {"backbone": {"lr_mult": 0.1}},
                    "bias_lr_mult": 0.5,
                    "norm_decay_mult": 0.0,
                },
            },
        }],
    })
    ctor = Constructor(hparams)
    params = {
        "backbone": {"conv1": {"kernel": jnp.ones((2, 2)),
                               "bias": jnp.ones((2,))},
                     "bn1": {"scale": jnp.ones((2,)), "bias": jnp.ones((2,))}},
        "head": {"fc": {"kernel": jnp.ones((2, 3)), "bias": jnp.ones((3,))}},
    }
    bundles = ctor.configure_optimizers(params)
    assert bundles, "no optimization bundle built"
    tx = bundles[0].tx
    state = tx.init(params)
    import jax
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    # head kernel moves at full lr; backbone kernel at 0.1x
    head_step = abs(float(updates["head"]["fc"]["kernel"][0, 0]))
    bb_step = abs(float(updates["backbone"]["conv1"]["kernel"][0, 0]))
    assert bb_step < head_step * 0.5, (bb_step, head_step)
