"""Weight-decay / paramwise grouping tests (reference:
tests/base_tests/constructor/test_constructor.py:83-175 — bias, 1D tensors
and module-declared no_weight_decay must land in the no-decay group;
paramwise_cfg custom_keys multipliers apply)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import torchok_tpu  # noqa: F401
from torchok_tpu.constructor.config import ConfigNode
from torchok_tpu.constructor.config_structure import merge_structured
from torchok_tpu.constructor import TASKS


def _bundles(optimization, no_decay=()):
    cfg = {
        "task": {
            "name": "ClassificationTask",
            "params": {
                "backbone_name": "resnet10t",
                "backbone_params": {"pretrained": False, "in_channels": 3},
                "pooling_name": "Pooling",
                "head_name": "ClassificationHead",
                "head_params": {"num_classes": 4},
                "inputs": [{"shape": [3, 32, 32], "dtype": "float32"}],
            },
        },
        "joint_loss": {"losses": [
            {"name": "CrossEntropyLoss",
             "mapping": {"input": "prediction", "target": "target"}}]},
        "optimization": optimization,
        "data": {"TRAIN": [{"dataloader": {"batch_size": 4},
                            "dataset": {"name": "SyntheticClassificationDataset",
                                        "params": {"num_samples": 8},
                                        "transform": []}}]},
        "trainer": {"max_epochs": 1},
    }
    config = merge_structured(ConfigNode(cfg))
    task = TASKS.get(config.task.name)(config, **config.task.params.to_dict())
    variables = task.init_variables(jax.random.PRNGKey(0))
    bundles = task.constructor.configure_optimizers(
        variables["params"], list(no_decay))
    return bundles, variables["params"]


def _sgd_decay(lr=0.1, wd=0.01, **extra):
    return [{"optimizer": {"name": "SGD",
                           "params": {"lr": lr, "weight_decay": wd, **extra}}}]


def _decay_applied(bundle, params):
    """Run one zero-gradient update: with SGD decoupled/(coupled) weight
    decay, decayed leaves move, no-decay leaves stay."""
    tx = bundle.tx
    state = tx.init(params)
    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
    updates, _ = tx.update(zeros, state, params)
    return jax.tree_util.tree_map(
        lambda u: bool(np.any(np.abs(np.asarray(u)) > 0)), updates)


def test_bias_and_norm_params_not_decayed():
    bundles, params = _bundles(_sgd_decay())
    moved = _decay_applied(bundles[0], params)
    flat = jax.tree_util.tree_flatten_with_path(moved)[0]
    checked_kernel = checked_small = 0
    for path, m in flat:
        keys = [getattr(p, "key", "") for p in path]
        name = "/".join(keys)
        leaf = params
        for k in keys:
            leaf = leaf[k]
        if leaf.ndim <= 1:  # biases, norm scales — best-practice no decay
            assert not m, f"1D/scalar param {name} was weight-decayed"
            checked_small += 1
        elif leaf.ndim >= 2:
            assert m, f"kernel {name} missed weight decay"
            checked_kernel += 1
    assert checked_kernel > 5 and checked_small > 5


def test_module_no_weight_decay_paths_respected():
    bundles, params = _bundles(_sgd_decay(), no_decay=["head"])
    moved = _decay_applied(bundles[0], params)
    flat = jax.tree_util.tree_flatten_with_path(moved)[0]
    for path, m in flat:
        name = "/".join(getattr(p, "key", "") for p in path)
        if name.startswith("head"):
            assert not m, f"no_weight_decay path {name} was decayed"


def test_custom_keys_lr_mult_scales_group_lr():
    optimization = [{"optimizer": {
        "name": "SGD",
        "params": {"lr": 0.1},
        "paramwise_cfg": {"custom_keys": {"head": {"lr_mult": 0.1}}}}}]
    bundles, params = _bundles(optimization)
    lrs = getattr(bundles[0], "group_base_lrs", None)
    if lrs is None:
        pytest.skip("bundle does not expose group_lrs")
    assert any(abs(v - 0.01) < 1e-9 for v in lrs.values())
    assert any(abs(v - 0.1) < 1e-9 for v in lrs.values())
