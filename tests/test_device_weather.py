"""Device-path parity for the weather ops (RandomFog, RandomRain,
RandomShadow, RandomSunFlare) — round 5 closes the round-4 blanket
"cv2-rasterization parity is inherent" claim by redesigning the
rasterization itself: disks, star polygons and streak segments are defined
in closed form (_disk_mask/_star_polygon_mask/_segments_mask) and run
identically on numpy (host) and jnp (device). Reference surface:
torchok/data/transforms/__init__.py:66-116.

Method: (a) the shared geometry cores are asserted EXACTLY equal across
backends; (b) e2e cases collapse every collapsible random range so host and
device produce the same deterministic image (up to the documented
GaussianBlur f32 kernel tolerance); (c) non-collapsible cases (random blob
centers) are pinned by structure/statistics + p-gating.
"""
import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchok_tpu.constructor import TRANSFORMS
from torchok_tpu.data.transforms.pixelwise import (
    _disk_mask, _fixed_filter2d, _gaussian_kernel1d, _segments_mask,
    _star_polygon_mask)


def _img(h=32, w=28, c=3, seed=0):
    return np.random.default_rng(seed).integers(0, 256, (h, w, c),
                                                dtype=np.uint8)


def _dev(t, img, seed=0):
    out = t.apply_batch({"image": jnp.asarray(img[None])},
                        jax.random.PRNGKey(seed))["image"]
    return np.asarray(out)[0]


def _host(t, img):
    return t(force_apply=True, image=img)["image"]


# ---------------------------------------------------------------- cores

def test_disk_mask_np_jnp_exact():
    rng = np.random.default_rng(0)
    cy = rng.uniform(-5, 40, (4, 3)).astype(np.float32)
    cx = rng.uniform(-5, 40, (4, 3)).astype(np.float32)
    r = rng.uniform(0, 20, (4, 3)).astype(np.float32)
    a = _disk_mask(np, 33, 29, cy, cx, r)
    b = np.asarray(_disk_mask(jnp, 33, 29, jnp.asarray(cy), jnp.asarray(cx),
                              jnp.asarray(r)))
    assert a.shape == (4, 3, 33, 29)
    np.testing.assert_array_equal(a, b)


def test_star_polygon_mask_np_jnp_exact():
    rng = np.random.default_rng(1)
    pts = rng.uniform(2, 28, (5, 6, 2)).astype(np.float32)
    a = _star_polygon_mask(np, 30, 26, pts)
    b = np.asarray(_star_polygon_mask(jnp, 30, 26, jnp.asarray(pts)))
    assert a.shape == (5, 30, 26)
    np.testing.assert_array_equal(a, b)
    # polygons with nonzero area actually cover pixels
    assert a.any(axis=(1, 2)).all()


def test_star_polygon_mask_matches_convex_fill():
    # a square given as its 4 corners must rasterize to the full square
    pts = np.array([[5.0, 5.0], [20.0, 5.0], [20.0, 18.0], [5.0, 18.0]],
                   np.float32)
    m = _star_polygon_mask(np, 24, 26, pts)
    yy, xx = np.mgrid[0:24, 0:26]
    expect = (xx >= 5) & (xx <= 20) & (yy >= 5) & (yy <= 18)
    np.testing.assert_array_equal(m, expect)


def test_segments_mask_np_jnp_exact():
    rng = np.random.default_rng(2)
    xs = rng.integers(0, 20, (3, 9)).astype(np.float32)
    ys = rng.integers(0, 20, (3, 9)).astype(np.float32)
    slant = rng.integers(-8, 9, (3, 1)).astype(np.float32)
    a = _segments_mask(np, 36, 30, xs, ys, slant, 12, 1)
    b = np.asarray(_segments_mask(jnp, 36, 30, jnp.asarray(xs),
                                  jnp.asarray(ys), jnp.asarray(slant), 12, 1))
    assert a.shape == (3, 36, 30)
    np.testing.assert_array_equal(a, b)
    assert a.any()


def test_segments_mask_vertical_line_geometry():
    # slant 0, width 1: exactly the column x0, rows y0..y0+len
    m = _segments_mask(np, 20, 15, np.array([[4.0]]), np.array([[3.0]]),
                       np.array([[0.0]]), 10, 1)
    yy, xx = np.mgrid[0:20, 0:15]
    expect = (xx == 4) & (yy >= 3) & (yy <= 13)
    np.testing.assert_array_equal(m[0], expect)


def test_gaussian_kernel_matches_cv2():
    for sigma in (1.2, 4.8, 26.0):
        g = _gaussian_kernel1d(sigma)
        k = int(round(sigma * 8 + 1)) | 1
        ref = cv2.getGaussianKernel(k, sigma, cv2.CV_32F)[:, 0]
        np.testing.assert_allclose(g, ref, atol=2e-7)


# ------------------------------------------------------------- RandomFog

def test_fog_blur_device_matches_cv2():
    # the device blur (formula kernel + _fixed_filter2d) must reproduce the
    # host's cv2.GaussianBlur(f32, ksize=0) on the same fog mask
    fog = _disk_mask(np, 40, 36, 13.0, 20.0, 9.0).astype(np.float32)
    sigma = 40 * 0.05
    ref = cv2.GaussianBlur(fog, (0, 0), sigmaX=sigma)
    g1 = _gaussian_kernel1d(sigma)
    out = _fixed_filter2d(jnp.asarray(fog)[None, ..., None], g1[None, :])
    out = np.asarray(_fixed_filter2d(out, g1[:, None]))[0, ..., 0]
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_fog_device_brightens_toward_white_u8():
    t = TRANSFORMS.get("RandomFog")(fog_coef_lower=0.8, fog_coef_upper=0.8,
                                    p=1.0)
    img = np.full((2, 48, 48, 3), 60, np.uint8)
    out = t.apply_batch({"image": jnp.asarray(img)}, jax.random.PRNGKey(0))
    dev = np.asarray(out["image"])
    assert dev.dtype == np.uint8 and dev.shape == img.shape
    assert dev.astype(float).mean() > 61  # fog blends toward 255
    assert dev.min() >= 60  # never darkens


def test_fog_device_float01_domain():
    t = TRANSFORMS.get("RandomFog")(fog_coef_lower=0.5, fog_coef_upper=0.5,
                                    p=1.0)
    img = np.full((1, 32, 32, 3), 0.25, np.float32)
    dev = np.asarray(t.apply_batch({"image": jnp.asarray(img)},
                                   jax.random.PRNGKey(1))["image"])
    assert dev.dtype == np.float32
    assert dev.min() >= 0.25 - 1e-6 and dev.max() <= 1.0 + 1e-6


def test_fog_device_p_zero_identity():
    t = TRANSFORMS.get("RandomFog")(p=0.0)
    img = _img()
    np.testing.assert_array_equal(_dev(t, img), img)


# ---------------------------------------------------------- RandomShadow

def test_shadow_device_matches_host_collapsed():
    # ROI collapsed to a point makes every polygon zero-area; zero-area
    # triangles are defined to contribute nothing (the guard in
    # _star_polygon_mask), so BOTH paths return the image unchanged —
    # numpy's exact-0 cross products and jnp's 1-ulp centroid agree here
    # only because of that guard
    t = TRANSFORMS.get("RandomShadow")(shadow_roi=(0.3, 0.3, 0.3, 0.3),
                                       num_shadows_lower=2,
                                       num_shadows_upper=2, p=1.0)
    img = _img(seed=3)
    np.testing.assert_array_equal(_host(t, img), img)
    np.testing.assert_array_equal(_dev(t, img), img)


def test_shadow_device_factors_are_exact_halvings():
    # sharper than a tolerance test: every device output pixel must be
    # EXACTLY img, trunc(img*0.5) or trunc(img*0.25) — the only values the
    # compounding 0.5^covered semantics can produce with <=2 shadows
    t = TRANSFORMS.get("RandomShadow")(p=1.0)
    img = _img(h=40, w=40, seed=12)
    dev = _dev(t, img, seed=6).astype(np.int32)
    f = img.astype(np.float32)
    allowed = np.stack([img.astype(np.int32),
                        (f * 0.5).astype(np.int32),
                        (f * 0.25).astype(np.int32)])
    assert (dev[None] == allowed).any(axis=0).all()
    assert (dev < img).any()  # at least one shadow actually landed


def test_shadow_device_darkens_only_inside_roi():
    t = TRANSFORMS.get("RandomShadow")(shadow_roi=(0, 0.5, 1, 1), p=1.0)
    img = np.full((1, 40, 40, 3), 200, np.uint8)
    dev = np.asarray(t.apply_batch({"image": jnp.asarray(img)},
                                   jax.random.PRNGKey(2))["image"])[0]
    assert (dev <= 200).all()
    assert (dev < 200).any()  # some shadow landed
    # ROI y in [0.5h, h): vertices all in the bottom half, so the fan (and
    # thus the shadow) cannot reach the top edge row
    assert (dev[0] == 200).all()


def test_shadow_device_float_passthrough_dtype():
    t = TRANSFORMS.get("RandomShadow")(num_shadows_lower=1,
                                       num_shadows_upper=1, p=1.0)
    img = np.random.default_rng(5).uniform(0, 255, (1, 24, 24, 3)) \
        .astype(np.float32)
    dev = np.asarray(t.apply_batch({"image": jnp.asarray(img)},
                                   jax.random.PRNGKey(3))["image"])
    assert dev.dtype == np.float32
    assert (dev <= img + 1e-5).all()


# -------------------------------------------------------- RandomSunFlare

def test_sunflare_device_matches_host_main_flare_only():
    # zero circles + point ROI (integer pixel) -> deterministic main flare;
    # host cv2.GaussianBlur vs device formula-kernel agree to 1 LSB
    t = TRANSFORMS.get("RandomSunFlare")(flare_roi=(0.5, 0.5, 0.5, 0.5),
                                         num_flare_circles_lower=0,
                                         num_flare_circles_upper=0,
                                         src_radius=20, p=1.0)
    img = _img(h=40, w=40, seed=6)
    host = _host(t, img).astype(int)
    dev = _dev(t, img).astype(int)
    assert (np.abs(host - dev) <= 1).all()
    assert (host >= img.astype(int) - 1).all()  # flare only brightens


def test_sunflare_device_circles_brighten():
    t = TRANSFORMS.get("RandomSunFlare")(src_radius=20, p=1.0)
    img = np.full((2, 36, 36, 3), 30, np.uint8)
    out = np.asarray(t.apply_batch({"image": jnp.asarray(img)},
                                   jax.random.PRNGKey(4))["image"])
    assert out.dtype == np.uint8 and out.shape == img.shape
    assert out.astype(float).mean() > 31


# ------------------------------------------------------------ RandomRain

def test_rain_device_structure_and_brightness():
    t = TRANSFORMS.get("RandomRain")(slant_lower=3, slant_upper=3,
                                     drop_length=8, blur_value=3,
                                     brightness_coefficient=0.7, p=1.0)
    img = np.full((2, 48, 44, 3), 100, np.uint8)
    out = np.asarray(t.apply_batch({"image": jnp.asarray(img)},
                                   jax.random.PRNGKey(5))["image"])
    assert out.dtype == np.uint8 and out.shape == img.shape
    # V scaled by 0.7: the non-drop background must sit near 70
    assert abs(np.median(out) - 70) <= 2
    # bright streaks (color 200) survive the box blur
    assert out.max() > 90


def test_rain_device_matches_host_on_drop_free_background():
    # drop_color == background makes the streaks invisible: the remaining
    # chain (box blur -> u8 round -> HSV V-scale -> back) is deterministic
    # and must match the host's cv2 path
    t = TRANSFORMS.get("RandomRain")(drop_color=(90, 120, 160),
                                     brightness_coefficient=0.85,
                                     blur_value=5, p=1.0)
    img = np.empty((20, 22, 3), np.uint8)
    img[...] = (90, 120, 160)
    host = _host(t, img).astype(int)
    dev = _dev(t, img).astype(int)
    assert (np.abs(host - dev) <= 2).mean() > 0.995
    assert np.abs(host - dev).max() <= 6


def test_rain_device_rejects_float():
    t = TRANSFORMS.get("RandomRain")(p=1.0)
    with pytest.raises(TypeError):
        t.apply_batch({"image": jnp.zeros((1, 8, 8, 3), jnp.float32)},
                      jax.random.PRNGKey(0))


def test_rain_device_jits():
    t = TRANSFORMS.get("RandomRain")(drop_length=6, blur_value=3, p=1.0)

    @jax.jit
    def f(img, key):
        return t.apply_batch({"image": img}, key)["image"]

    img = jnp.asarray(_img(h=24, w=24)[None])
    out = f(img, jax.random.PRNGKey(0))
    assert out.shape == img.shape and out.dtype == jnp.uint8


# ------------------------------------------------------------- host parity

def test_host_paths_still_run_all_dtypes():
    for name, kw in [("RandomFog", {}), ("RandomShadow", {}),
                     ("RandomSunFlare", {"src_radius": 16})]:
        t = TRANSFORMS.get(name)(p=1.0, **kw)
        t.seed(11)
        u8 = _host(t, _img(seed=9))
        assert u8.dtype == np.uint8
        t.seed(11)
        f32 = _host(t, _img(seed=9).astype(np.float32))
        assert f32.dtype == np.float32
