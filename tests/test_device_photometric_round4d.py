"""Device-path parity for the round-4d photometric additions
(RandomSnow, ISONoise, ZoomBlur) — the HLS-space and multi-frame ops.

Same method as test_device_photometric.py: collapse random ranges to a
point, force p=1, compare to the host cv2/numpy path. The HLS round trip is
pinned against cv2.cvtColor itself (u8 and float paths). Reference surface:
torchok/data/transforms/__init__.py:66-116.
"""
import cv2
import jax
import jax.numpy as jnp
import numpy as np

from torchok_tpu.constructor import TRANSFORMS
from torchok_tpu.data.transforms.pixelwise import _hls_f_to_rgb, _rgb_to_hls_f


def _img(h=24, w=20, c=3, seed=0):
    return np.random.default_rng(seed).integers(0, 256, (h, w, c), dtype=np.uint8)


def _dev(t, img, seed=0):
    out = t.apply_batch({"image": jnp.asarray(img[None])},
                        jax.random.PRNGKey(seed))["image"]
    return np.asarray(out)[0]


def test_rgb_to_hls_matches_cv2_float():
    img = np.random.default_rng(0).random((16, 12, 3)).astype(np.float32)
    ref = cv2.cvtColor(img, cv2.COLOR_RGB2HLS)
    h, ll, s = _rgb_to_hls_f(jnp.asarray(img))
    np.testing.assert_allclose(np.asarray(h), ref[..., 0], atol=1e-3)
    np.testing.assert_allclose(np.asarray(ll), ref[..., 1], atol=1e-5)
    np.testing.assert_allclose(np.asarray(s), ref[..., 2], atol=1e-5)


def test_hls_to_rgb_matches_cv2_float():
    rng = np.random.default_rng(1)
    hls = np.stack([rng.random((16, 12)).astype(np.float32) * 360,
                    rng.random((16, 12)).astype(np.float32),
                    rng.random((16, 12)).astype(np.float32)], axis=-1)
    ref = cv2.cvtColor(hls, cv2.COLOR_HLS2RGB)
    out = _hls_f_to_rgb(jnp.asarray(hls[..., 0]), jnp.asarray(hls[..., 1]),
                        jnp.asarray(hls[..., 2]))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_random_snow_device_matches_host_collapsed():
    t = TRANSFORMS.get("RandomSnow")(
        snow_point_lower=0.2, snow_point_upper=0.2, brightness_coeff=2.5, p=1.0)
    img = _img(seed=2)
    host = t(force_apply=True, image=img)["image"].astype(int)
    dev = _dev(t, img).astype(int)
    # the u8 HLS round trip quantizes H to half-degrees: a 1-step hue
    # difference moves an RGB channel by at most 2 LSB
    close = np.abs(dev - host) <= 2
    assert close.mean() > 0.995
    assert np.abs(dev - host).max() <= 6


def test_random_snow_device_identity_coeff_is_cv2_roundtrip():
    t = TRANSFORMS.get("RandomSnow")(
        snow_point_lower=0.0, snow_point_upper=0.0, brightness_coeff=1.0, p=1.0)
    img = _img(seed=3)
    host = t(force_apply=True, image=img)["image"].astype(int)
    dev = _dev(t, img).astype(int)
    assert (np.abs(dev - host) <= 2).mean() > 0.995


def test_iso_noise_device_zero_intensity_is_roundtrip():
    t = TRANSFORMS.get("ISONoise")(color_shift=(0.0, 0.0), intensity=(0.0, 0.0),
                                   p=1.0)
    img = _img(seed=4)
    host = t(force_apply=True, image=img)["image"].astype(int)
    dev = _dev(t, img).astype(int)
    np.testing.assert_allclose(dev, host, atol=2)


def test_iso_noise_device_statistics():
    t = TRANSFORMS.get("ISONoise")(color_shift=(0.05, 0.05),
                                   intensity=(0.5, 0.5), p=1.0)
    img = np.full((64, 64, 3), 128, np.uint8)
    img[::2] = 100  # non-zero std so the poisson rate is positive
    dev = _dev(t, img, seed=7)
    assert dev.dtype == np.uint8 and dev.shape == img.shape
    # poisson luminance noise only brightens: mean must go up
    assert dev.astype(float).mean() > img.astype(float).mean() + 1


def test_zoom_blur_device_matches_host_collapsed():
    t = TRANSFORMS.get("ZoomBlur")(max_factor=(1.25, 1.25),
                                   step_factor=(0.06, 0.06), p=1.0)
    img = _img(h=32, w=28, seed=5)
    host = t(force_apply=True, image=img)["image"].astype(int)
    dev = _dev(t, img).astype(int)
    np.testing.assert_allclose(dev, host, atol=2)


def test_zoom_blur_device_variable_params_valid():
    t = TRANSFORMS.get("ZoomBlur")(max_factor=(1.05, 1.31),
                                   step_factor=(0.03, 0.05), p=1.0)
    img = np.random.default_rng(8).integers(0, 256, (3, 24, 24, 3), np.uint8)
    out = t.apply_batch({"image": jnp.asarray(img)}, jax.random.PRNGKey(9))
    dev = np.asarray(out["image"])
    assert dev.dtype == np.uint8 and dev.shape == img.shape
    # averaging of zooms stays in the value hull
    assert int(dev.min()) >= int(img.min()) - 1
    assert int(dev.max()) <= int(img.max()) + 1


def test_zoom_blur_device_gated_by_zero_step():
    t = TRANSFORMS.get("ZoomBlur")(step_factor=(0.0, 0.03))
    assert not t.device_capable


def test_spatter_device_full_mask_matches_host():
    # threshold far below the noise support -> mask is all-ones on both
    # paths, making the blend deterministic
    t = TRANSFORMS.get("Spatter")(cutout_threshold=-10.0, mode="mud", p=1.0)
    img = _img(seed=6)
    host = t(force_apply=True, image=img)["image"].astype(int)
    dev = _dev(t, img).astype(int)
    np.testing.assert_allclose(dev, host, atol=1)


def test_spatter_device_empty_mask_is_identity():
    t = TRANSFORMS.get("Spatter")(cutout_threshold=10.0, p=1.0)
    img = _img(seed=7)
    np.testing.assert_array_equal(_dev(t, img), img)


def test_spatter_device_default_rain_statistics():
    t = TRANSFORMS.get("Spatter")(p=1.0)
    img = np.full((48, 48, 3), 60, np.uint8)
    dev = _dev(t, img, seed=11)
    assert dev.dtype == np.uint8
    frac = (dev != img).any(-1).mean()
    # defaults (mean .65, std .3, sigma 2, thr .68) spatter a moderate
    # fraction of pixels — not none, not all
    assert 0.05 < frac < 0.95
