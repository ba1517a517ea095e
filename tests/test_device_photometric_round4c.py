"""Device-path parity for the round-4c photometric additions
(GridDropout, Superpixels, AdvancedBlur, Defocus, RingingOvershoot, NoOp).

Same method as test_device_photometric.py: collapse the random parameter
ranges to a point so host and device draw the same values, force p=1, and
compare against the host cv2/numpy implementation; uint8 tolerances absorb
kernel-precision (f32 vs f64) and rounding-convention LSBs. Reference
surface: torchok/data/transforms/__init__.py:66-116.
"""
import jax
import jax.numpy as jnp
import numpy as np

from torchok_tpu.constructor import TRANSFORMS


def _img(h=24, w=20, c=3, seed=0):
    return np.random.default_rng(seed).integers(0, 256, (h, w, c), dtype=np.uint8)


def _dev(t, img, seed=0, extra=None):
    batch = {"image": jnp.asarray(img[None])}
    if extra:
        batch.update({k: jnp.asarray(v[None]) for k, v in extra.items()})
    out = t.apply_batch(batch, jax.random.PRNGKey(seed))
    return {k: np.asarray(v)[0] for k, v in out.items()}


def test_noop_device_is_identity():
    t = TRANSFORMS.get("NoOp")()
    assert t.device_capable
    img = _img()
    np.testing.assert_array_equal(_dev(t, img)["image"], img)


def test_grid_dropout_device_matches_host_deterministic():
    t = TRANSFORMS.get("GridDropout")(
        ratio=0.5, holes_number_x=4, holes_number_y=3,
        shift_x=2, shift_y=1, fill_value=7, p=1.0)
    img = _img(seed=1)
    host = t(force_apply=True, image=img)["image"]
    np.testing.assert_array_equal(_dev(t, img)["image"], host)


def test_grid_dropout_device_unit_size_collapsed():
    t = TRANSFORMS.get("GridDropout")(
        ratio=0.4, unit_size_min=6, unit_size_max=6, fill_value=0, p=1.0)
    img = _img(seed=2)
    host = t(force_apply=True, image=img)["image"]
    np.testing.assert_array_equal(_dev(t, img)["image"], host)


def test_grid_dropout_device_mask_fill():
    t = TRANSFORMS.get("GridDropout")(
        ratio=0.5, holes_number_x=4, holes_number_y=4, fill_value=0,
        mask_fill_value=255, p=1.0)
    img = _img(seed=3)
    mask = np.random.default_rng(3).integers(0, 5, (24, 20), dtype=np.uint8)
    host = t(force_apply=True, image=img, mask=mask)
    dev = _dev(t, img, extra={"mask": mask})
    np.testing.assert_array_equal(dev["image"], host["image"])
    np.testing.assert_array_equal(dev["mask"], host["mask"])


def test_grid_dropout_device_random_offset_in_hull():
    t = TRANSFORMS.get("GridDropout")(
        ratio=0.5, unit_size_min=4, unit_size_max=8, random_offset=True,
        fill_value=11, p=1.0)
    img = _img(seed=4)
    dev = _dev(t, img, seed=5)["image"]
    assert dev.dtype == img.dtype and dev.shape == img.shape
    # dropped pixels carry the fill value; some pixels must be dropped
    assert (dev == 11).any()
    changed = dev != img
    assert np.all(dev[changed] == 11) or (img == 11).any()


def test_superpixels_device_matches_host_full_replace():
    t = TRANSFORMS.get("Superpixels")(p_replace=(1.0, 1.0), n_segments=100, p=1.0)
    assert t.device_capable
    img = _img(h=23, w=19, seed=5)  # non-divisible cells
    host = t(force_apply=True, image=img)["image"].astype(int)
    dev = _dev(t, img)["image"].astype(int)
    np.testing.assert_allclose(dev, host, atol=1)


def test_superpixels_device_gated_by_random_segments():
    t = TRANSFORMS.get("Superpixels")(n_segments=(50, 100))
    assert not t.device_capable


def test_superpixels_device_float_image():
    t = TRANSFORMS.get("Superpixels")(p_replace=(1.0, 1.0), n_segments=16, p=1.0)
    img = np.random.default_rng(6).random((16, 16, 3)).astype(np.float32)
    host = t(force_apply=True, image=img)["image"]
    dev = _dev(t, img)["image"]
    np.testing.assert_allclose(dev, host, atol=1e-5)


def test_advanced_blur_device_matches_host_collapsed():
    t = TRANSFORMS.get("AdvancedBlur")(
        blur_limit=(7, 7), sigmaX_limit=(0.6, 0.6), sigmaY_limit=(0.3, 0.3),
        rotate_limit=(30, 30), beta_limit=(2.0, 2.0), noise_limit=(1.0, 1.0),
        p=1.0)
    img = _img(seed=7)
    host = t(force_apply=True, image=img)["image"].astype(int)
    dev = _dev(t, img)["image"].astype(int)
    np.testing.assert_allclose(dev, host, atol=2)


def test_advanced_blur_device_isotropic_beta1_is_gaussian():
    t = TRANSFORMS.get("AdvancedBlur")(
        blur_limit=(5, 5), sigmaX_limit=(1.0, 1.0), sigmaY_limit=(1.0, 1.0),
        rotate_limit=(0, 0), beta_limit=(1.0, 1.0), noise_limit=(1.0, 1.0),
        p=1.0)
    img = _img(seed=8)
    host = t(force_apply=True, image=img)["image"].astype(int)
    np.testing.assert_allclose(_dev(t, img)["image"].astype(int), host, atol=2)


def test_defocus_device_matches_host_collapsed():
    t = TRANSFORMS.get("Defocus")(radius=(4, 4), alias_blur=(0.3, 0.3), p=1.0)
    img = _img(seed=9)
    host = t(force_apply=True, image=img)["image"].astype(int)
    np.testing.assert_allclose(_dev(t, img)["image"].astype(int), host, atol=2)


def test_defocus_device_variable_radius_valid():
    # mixed radii exercise the per-sample subgrid reflection indexing
    t = TRANSFORMS.get("Defocus")(radius=(1, 6), alias_blur=(0.1, 0.5), p=1.0)
    img = np.random.default_rng(10).integers(0, 256, (4, 16, 16, 3), np.uint8)
    out = t.apply_batch({"image": jnp.asarray(img)}, jax.random.PRNGKey(3))
    dev = np.asarray(out["image"])
    assert dev.dtype == np.uint8 and dev.shape == img.shape
    assert np.isfinite(dev.astype(np.float64)).all()
    # defocus averages: output stays inside the input's value hull
    assert int(dev.min()) >= int(img.min()) - 1
    assert int(dev.max()) <= int(img.max()) + 1


def test_ringing_overshoot_device_matches_host_collapsed():
    t = TRANSFORMS.get("RingingOvershoot")(
        blur_limit=(9, 9), cutoff=(1.5, 1.5), p=1.0)
    img = _img(seed=11)
    host = t(force_apply=True, image=img)["image"].astype(int)
    np.testing.assert_allclose(_dev(t, img)["image"].astype(int), host, atol=2)


def test_ringing_overshoot_device_large_cutoff():
    t = TRANSFORMS.get("RingingOvershoot")(
        blur_limit=(15, 15), cutoff=(np.pi, np.pi), p=1.0)
    img = _img(seed=12)
    host = t(force_apply=True, image=img)["image"].astype(int)
    np.testing.assert_allclose(_dev(t, img)["image"].astype(int), host, atol=2)


def test_j1_matches_scipy():
    from torchok_tpu.data.transforms.pixelwise import _j1_jnp
    try:
        from scipy.special import j1
    except Exception:
        import pytest
        pytest.skip("scipy not installed")
    x = np.linspace(0.0, 50.0, 2001)
    # device evaluation is f32: the A&S polynomial's 1e-7 truncation error
    # plus f32 argument rounding in cos(theta1) at x~50 gives ~1e-5 worst-case
    ours = np.asarray(_j1_jnp(jnp.asarray(x, jnp.float32)))
    np.testing.assert_allclose(ours, j1(x), atol=2e-5)
