"""space_to_depth_stem: the MLPerf-style TPU stem must be numerically
IDENTICAL to the plain 7x7/s2/pad3 stem conv it replaces (reference stem:
/root/reference/torchok/models/backbones/resnet.py conv1), both at the raw
conv level and through a full ResNet forward with transplanted weights.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchok_tpu.constructor import BACKBONES
from torchok_tpu.models.backbones.resnet import stem7x7_to_space_to_depth


def _s2d(x):
    n, h, w, c = x.shape
    z = x.reshape(n, h // 2, 2, w // 2, 2, c)
    return z.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, w // 2, 4 * c)


def test_kernel_transform_conv_equivalence():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    w7 = jnp.asarray(rng.normal(size=(7, 7, 3, 8)).astype(np.float32))

    y_ref = jax.lax.conv_general_dilated(
        x, w7, (2, 2), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    wz = jnp.asarray(stem7x7_to_space_to_depth(w7))
    y_s2d = jax.lax.conv_general_dilated(
        _s2d(x), wz, (1, 1), [(2, 1), (2, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))

    assert y_s2d.shape == y_ref.shape == (2, 16, 16, 8)
    np.testing.assert_allclose(np.asarray(y_s2d), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)


def test_resnet_forward_equivalence_with_transplanted_stem():
    x = jnp.asarray(np.random.default_rng(1).normal(
        size=(1, 64, 64, 3)).astype(np.float32))
    base = BACKBONES.get("resnet18")()
    s2d = BACKBONES.get("resnet18")(space_to_depth_stem=True)
    vars_base = base.init(jax.random.PRNGKey(0), x, False)

    params = jax.tree_util.tree_map(lambda a: a, vars_base["params"])
    params["conv1"]["kernel"] = jnp.asarray(
        stem7x7_to_space_to_depth(params["conv1"]["kernel"]))
    vars_s2d = {**vars_base, "params": params}

    feats_base = base.apply(vars_base, x, False, method=base.forward_features)
    feats_s2d = s2d.apply(vars_s2d, x, False, method=s2d.forward_features)
    assert len(feats_base) == len(feats_s2d)
    for fb, fs in zip(feats_base[1:], feats_s2d[1:]):
        np.testing.assert_allclose(np.asarray(fs), np.asarray(fb),
                                   rtol=1e-4, atol=1e-4)


def test_fit_tensor_repacks_torch_stem_for_s2d_target():
    from torchok_tpu.utils.torch_convert import fit_tensor
    rng = np.random.default_rng(2)
    w_torch = rng.normal(size=(64, 3, 7, 7)).astype(np.float32)  # OIHW
    out = fit_tensor(w_torch, (4, 4, 12, 64), "conv1.kernel", is_kernel=True)
    expected = stem7x7_to_space_to_depth(w_torch.transpose(2, 3, 1, 0))
    np.testing.assert_array_equal(out, expected)


def test_s2d_stem_rejects_bad_configs():
    with pytest.raises(ValueError, match="even input"):
        m = BACKBONES.get("resnet18")(space_to_depth_stem=True)
        m.init(jax.random.PRNGKey(0), jnp.zeros((1, 33, 33, 3)), False)
    with pytest.raises(ValueError, match="plain 7x7 stem"):
        m = BACKBONES.get("resnet50d")(space_to_depth_stem=True)
        m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), False)
    with pytest.raises(ValueError):
        stem7x7_to_space_to_depth(np.zeros((3, 3, 3, 8), np.float32))
