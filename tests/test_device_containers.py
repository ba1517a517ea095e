"""Device paths for the composition containers (OneOf / SomeOf(n=1) /
nested Compose-Sequential).

OneOf runs every child on the whole batch and selects per sample (the
batched equivalent of the host's force_apply on one drawn child); children
must be device-capable, shape/dtype-preserving ops. Reference surface:
albumentations OneOf/SomeOf registrations,
torchok/data/transforms/__init__.py:24-116.
"""
import jax
import jax.numpy as jnp
import numpy as np

from torchok_tpu.constructor import TRANSFORMS


def _img_batch(n=64, h=12, w=10, seed=0):
    return np.random.default_rng(seed).integers(0, 256, (n, h, w, 3),
                                                dtype=np.uint8)


def _mk(name, **kw):
    return TRANSFORMS.get(name)(**kw)


def test_oneof_device_capable_gates():
    assert _mk("OneOf", transforms=[_mk("InvertImg"), _mk("ToGray")]).device_capable
    # round 5 gave CLAHE a device path — it no longer blocks a container
    assert _mk("OneOf", transforms=[_mk("InvertImg"), _mk("CLAHE")]).device_capable
    # ImageCompression is a codec round-trip (libjpeg): can never run on
    # device, so it anchors the host-only case (same guard pattern as
    # tests/test_datasets_behavior.py::test_input_dtype_on_host_path)
    host_only = _mk("ImageCompression")
    assert not getattr(host_only, "device_capable", False)
    assert not _mk("OneOf",
                   transforms=[_mk("InvertImg"), host_only]).device_capable
    # Resize needs uniform shapes / changes shape -> excluded from selection
    assert not _mk("OneOf", transforms=[
        _mk("Resize", height=8, width=8)]).device_capable
    assert not _mk("OneOf", transforms=[]).device_capable


def test_oneof_device_each_sample_matches_one_child():
    t = _mk("OneOf", transforms=[_mk("InvertImg", p=1.0), _mk("ToGray", p=1.0)],
            p=1.0)
    img = _img_batch(n=64, seed=1)
    out = np.asarray(t.apply_batch({"image": jnp.asarray(img)},
                                   jax.random.PRNGKey(2))["image"])
    inv = np.asarray(_mk("InvertImg", p=1.0).apply_batch(
        {"image": jnp.asarray(img)}, jax.random.PRNGKey(0))["image"])
    gray = np.asarray(_mk("ToGray", p=1.0).apply_batch(
        {"image": jnp.asarray(img)}, jax.random.PRNGKey(0))["image"])
    kinds = []
    for i in range(len(img)):
        if np.array_equal(out[i], inv[i]):
            kinds.append("inv")
        elif np.array_equal(out[i], gray[i]):
            kinds.append("gray")
        else:
            raise AssertionError(f"sample {i} matches neither child")
    # with 64 samples both branches should be drawn
    assert "inv" in kinds and "gray" in kinds


def test_oneof_device_respects_own_p():
    t = _mk("OneOf", transforms=[_mk("InvertImg", p=1.0)], p=0.0)
    img = _img_batch(n=8, seed=2)
    out = np.asarray(t.apply_batch({"image": jnp.asarray(img)},
                                   jax.random.PRNGKey(3))["image"])
    np.testing.assert_array_equal(out, img)


def test_oneof_device_forces_children():
    # child p=0 but OneOf force-applies the chosen child, like the host
    t = _mk("OneOf", transforms=[_mk("InvertImg", p=0.0)], p=1.0)
    img = _img_batch(n=8, seed=3)
    out = np.asarray(t.apply_batch({"image": jnp.asarray(img)},
                                   jax.random.PRNGKey(4))["image"])
    np.testing.assert_array_equal(out, 255 - img)
    assert t.transforms[0].p == 0.0  # trace-time force is restored


def test_someof_device_n1_only():
    kids = [_mk("InvertImg", p=1.0), _mk("ToGray", p=1.0)]
    assert _mk("SomeOf", transforms=kids, n=1).device_capable
    assert not _mk("SomeOf", transforms=kids, n=2).device_capable


def test_someof_device_children_keep_own_p():
    # host SomeOf does NOT force children: child p=0 -> identity
    t = _mk("SomeOf", transforms=[_mk("InvertImg", p=0.0)], n=1, p=1.0)
    img = _img_batch(n=8, seed=4)
    out = np.asarray(t.apply_batch({"image": jnp.asarray(img)},
                                   jax.random.PRNGKey(5))["image"])
    np.testing.assert_array_equal(out, img)


def test_nested_compose_device_applies_in_order():
    inner = _mk("Compose", transforms=[
        _mk("InvertImg", p=1.0), _mk("ToGray", p=1.0)])
    assert inner.device_capable
    img = _img_batch(n=4, seed=5)
    out = np.asarray(inner.apply_batch({"image": jnp.asarray(img)},
                                       jax.random.PRNGKey(6))["image"])
    step1 = np.asarray(_mk("InvertImg", p=1.0).apply_batch(
        {"image": jnp.asarray(img)}, jax.random.PRNGKey(0))["image"])
    step2 = np.asarray(_mk("ToGray", p=1.0).apply_batch(
        {"image": jnp.asarray(step1)}, jax.random.PRNGKey(0))["image"])
    np.testing.assert_array_equal(out, step2)


def test_split_device_suffix_includes_containers():
    pipe = _mk("Compose", transforms=[
        _mk("ImageCompression"),  # codec: genuinely host-only
        _mk("OneOf", transforms=[_mk("InvertImg"), _mk("Solarize")]),
        _mk("Normalize"),
    ])
    host, device = pipe.split_device_suffix()
    assert [type(t).__name__ for t in host.transforms] == ["ImageCompression"]
    assert [type(t).__name__ for t in device] == ["OneOf", "Normalize"]


def test_oneof_device_rejects_dtype_changing_child_at_trace():
    import pytest
    t = _mk("OneOf", transforms=[_mk("ToFloat")], p=1.0)  # uint8 -> float32
    img = _img_batch(n=4, seed=6)
    with pytest.raises(TypeError, match="preserve the batch"):
        t.apply_batch({"image": jnp.asarray(img)}, jax.random.PRNGKey(7))
