"""Device-path parity for the round-4 photometric/filtering transforms.

Each new ``apply_batch`` is pinned to the host cv2/numpy implementation by
collapsing the random parameter ranges to a point (so both paths draw the
same values) and forcing application with p=1; uint8 tolerances absorb the
cvRound half-to-even vs round-half-up LSB. Reference surface:
torchok/data/transforms/__init__.py:66-116 (albumentations registrations).
"""
import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchok_tpu.constructor import TRANSFORMS


def _img(h=24, w=20, c=3, seed=0):
    return np.random.default_rng(seed).integers(0, 256, (h, w, c), dtype=np.uint8)


def _dev(t, img, seed=0):
    out = t.apply_batch({"image": jnp.asarray(img[None])},
                        jax.random.PRNGKey(seed))["image"]
    return np.asarray(out)[0]


def test_blur_device_matches_cv2_fixed_k():
    t = TRANSFORMS.get("Blur")(blur_limit=(7, 7), p=1.0)
    img = _img()
    host = cv2.blur(img, (7, 7))
    dev = _dev(t, img)
    assert dev.dtype == np.uint8
    np.testing.assert_allclose(dev.astype(int), host.astype(int), atol=1)


def test_blur_device_variable_k_stays_in_hull():
    t = TRANSFORMS.get("Blur")(blur_limit=(3, 9), p=1.0)
    img = _img(seed=3)
    dev = _dev(t, img, seed=5)
    assert dev.shape == img.shape and dev.dtype == img.dtype
    assert dev.min() >= img.min() and dev.max() <= img.max()  # averaging


def test_gaussian_blur_device_matches_cv2_table_kernel():
    # sigma<=0 + ksize 5 exercises cv2's hardcoded binomial table
    t = TRANSFORMS.get("GaussianBlur")(blur_limit=(5, 5), sigma_limit=(0, 0), p=1.0)
    img = _img(seed=1)
    host = cv2.GaussianBlur(img, (5, 5), sigmaX=0)
    np.testing.assert_allclose(_dev(t, img).astype(int), host.astype(int), atol=1)


def test_gaussian_blur_device_matches_cv2_formula_kernel():
    t = TRANSFORMS.get("GaussianBlur")(blur_limit=(9, 9), sigma_limit=(1.7, 1.7), p=1.0)
    img = _img(seed=2)
    host = cv2.GaussianBlur(img, (9, 9), sigmaX=1.7)
    np.testing.assert_allclose(_dev(t, img).astype(int), host.astype(int), atol=1)


def test_motion_blur_device_is_an_axis_box():
    t = TRANSFORMS.get("MotionBlur")(blur_limit=(5, 5), p=1.0)
    img = _img(seed=4)
    k = np.zeros((5, 5), np.float32)
    k_h, k_v = k.copy(), k.copy()
    k_h[2, :] = 0.2
    k_v[:, 2] = 0.2
    host_h = cv2.filter2D(img, -1, k_h).astype(int)
    host_v = cv2.filter2D(img, -1, k_v).astype(int)
    dev = _dev(t, img, seed=6).astype(int)
    ok_h = np.abs(dev - host_h).max() <= 1
    ok_v = np.abs(dev - host_v).max() <= 1
    assert ok_h or ok_v


def test_sharpen_device_matches_host():
    t = TRANSFORMS.get("Sharpen")(alpha=(0.3, 0.3), lightness=(1.0, 1.0), p=1.0)
    img = _img(seed=5)
    host = t(force_apply=True, image=img)["image"].astype(int)
    np.testing.assert_allclose(_dev(t, img).astype(int), host, atol=2)


def test_emboss_device_matches_host():
    t = TRANSFORMS.get("Emboss")(alpha=(0.4, 0.4), strength=(0.5, 0.5), p=1.0)
    img = _img(seed=6)
    host = t(force_apply=True, image=img)["image"].astype(int)
    np.testing.assert_allclose(_dev(t, img).astype(int), host, atol=2)


def test_unsharp_mask_device_matches_host():
    t = TRANSFORMS.get("UnsharpMask")(blur_limit=(5, 5), sigma_limit=(1.0, 1.0),
                                      alpha=(0.4, 0.4), threshold=10, p=1.0)
    img = _img(seed=7)
    host = t(force_apply=True, image=img)["image"].astype(int)
    # threshold mask flips on rounding-edge pixels can move a pixel by the
    # full sharpening delta; everything else agrees to the LSB
    dev = _dev(t, img).astype(int)
    close = np.abs(dev - host) <= 2
    assert close.mean() > 0.99


def test_to_sepia_device_matches_host():
    t = TRANSFORMS.get("ToSepia")(p=1.0)
    img = _img(seed=8)
    host = t(force_apply=True, image=img)["image"].astype(int)
    np.testing.assert_allclose(_dev(t, img).astype(int), host, atol=1)


def test_equalize_device_matches_cv2():
    t = TRANSFORMS.get("Equalize")(p=1.0)
    img = _img(seed=9)
    host = t(force_apply=True, image=img)["image"].astype(int)
    np.testing.assert_allclose(_dev(t, img).astype(int), host, atol=1)


def test_equalize_device_constant_channel_passthrough():
    t = TRANSFORMS.get("Equalize")(p=1.0)
    img = np.full((8, 8, 3), 77, np.uint8)
    np.testing.assert_array_equal(_dev(t, img), img)


def test_hue_saturation_value_device_matches_cv2():
    t = TRANSFORMS.get("HueSaturationValue")(
        hue_shift_limit=(10, 10), sat_shift_limit=(20, 20),
        val_shift_limit=(15, 15), p=1.0)
    img = _img(seed=10)
    host = t(force_apply=True, image=img)["image"].astype(int)
    dev = _dev(t, img).astype(int)
    # hue rounding at sector boundaries can step a channel a couple levels
    close = np.abs(dev - host) <= 3
    assert close.mean() > 0.99
    assert np.abs(dev - host).max() <= 12


def test_channel_shuffle_device_permutes():
    t = TRANSFORMS.get("ChannelShuffle")(p=1.0)
    img = _img(seed=11)
    dev = _dev(t, img, seed=3)
    # some permutation of the original channels
    perms = [dev[..., list(p)] for p in
             [(0, 1, 2), (0, 2, 1), (1, 0, 2), (1, 2, 0), (2, 0, 1), (2, 1, 0)]]
    assert any(np.array_equal(p, img) for p in perms)


def test_channel_dropout_device_drops_exactly_n():
    t = TRANSFORMS.get("ChannelDropout")(channel_drop_range=(1, 1),
                                         fill_value=0, p=1.0)
    img = np.clip(_img(seed=12), 1, 255)  # no natural zeros
    dev = _dev(t, img, seed=4)
    dropped = [c for c in range(3) if (dev[..., c] == 0).all()]
    kept = [c for c in range(3) if np.array_equal(dev[..., c], img[..., c])]
    assert len(dropped) == 1 and len(kept) == 2


def test_fancy_pca_device_shifts_colors():
    t = TRANSFORMS.get("FancyPCA")(alpha=0.3, p=1.0)
    img = _img(seed=13)
    dev = _dev(t, img, seed=5)
    assert dev.dtype == np.uint8 and dev.shape == img.shape
    assert not np.array_equal(dev, img)
    # PCA noise is a per-image constant PER-CHANNEL offset (before clipping)
    diff = dev[2:-2, 2:-2].astype(int) - img[2:-2, 2:-2].astype(int)
    for c in range(3):
        dc = diff[..., c][(img[2:-2, 2:-2, c] > 30) & (img[2:-2, 2:-2, c] < 225)]
        assert dc.std() <= 1.0


def test_downscale_device_matches_cv2_nearest():
    t = TRANSFORMS.get("Downscale")(scale_min=0.5, scale_max=0.5, p=1.0)
    img = _img(seed=14)
    host = t(force_apply=True, image=img)["image"]
    np.testing.assert_array_equal(_dev(t, img), host)


def test_downscale_device_capability_follows_interpolation():
    assert TRANSFORMS.get("Downscale")(p=1.0).device_capable
    assert not TRANSFORMS.get("Downscale")(
        interpolation=cv2.INTER_LINEAR, p=1.0).device_capable


@pytest.mark.parametrize("name,kwargs", [
    ("Blur", {"blur_limit": (3, 7)}),
    ("GaussianBlur", {}),
    ("MotionBlur", {}),
    ("Sharpen", {}),
    ("Emboss", {}),
    ("UnsharpMask", {}),
    ("ToSepia", {}),
    ("Equalize", {}),
    ("HueSaturationValue", {}),
    ("ChannelShuffle", {}),
    ("ChannelDropout", {}),
    ("FancyPCA", {}),
    ("Downscale", {}),
])
def test_p_zero_is_identity_on_device(name, kwargs):
    t = TRANSFORMS.get(name)(p=0.0, **kwargs)
    img = _img(seed=15)
    out = t.apply_batch({"image": jnp.asarray(img[None])},
                        jax.random.PRNGKey(7))["image"]
    np.testing.assert_array_equal(np.asarray(out)[0].astype(np.uint8), img)


def test_float_images_supported_by_filter_ops():
    img = np.random.default_rng(16).random((12, 12, 3)).astype(np.float32)
    for name in ("Blur", "GaussianBlur", "Sharpen", "UnsharpMask", "ToSepia",
                 "FancyPCA", "Downscale"):
        t = TRANSFORMS.get(name)(p=1.0)
        out = t.apply_batch({"image": jnp.asarray(img[None])},
                            jax.random.PRNGKey(8))["image"]
        assert np.asarray(out).dtype == np.float32, name


# ------------------- round-4c additions: median/flip/from-float -------------

def test_median_blur_device_matches_cv2_fixed_k():
    t = TRANSFORMS.get("MedianBlur")(blur_limit=(5, 5), p=1.0)
    img = _img(seed=20)
    host = cv2.medianBlur(img, 5)
    np.testing.assert_array_equal(_dev(t, img, seed=9), host)


def test_median_blur_device_variable_k_is_some_exact_median():
    t = TRANSFORMS.get("MedianBlur")(blur_limit=(3, 7), p=1.0)
    imgs = np.stack([_img(seed=21 + i) for i in range(4)])
    out = np.asarray(t.apply_batch({"image": jnp.asarray(imgs)},
                                   jax.random.PRNGKey(10))["image"])
    for i in range(4):
        refs = [cv2.medianBlur(imgs[i], k) for k in (3, 5, 7)]
        assert any(np.array_equal(out[i], r) for r in refs), i


def test_median_blur_device_float_images():
    img = np.random.default_rng(22).random((10, 12, 3)).astype(np.float32)
    t = TRANSFORMS.get("MedianBlur")(blur_limit=(3, 3), p=1.0)
    out = _dev(t, img, seed=11)
    # cv2.medianBlur rejects float32 multi-channel at k>5; pin vs a numpy
    # median over replicate-padded 3x3 windows instead
    pad = np.pad(img, ((1, 1), (1, 1), (0, 0)), mode="edge")
    win = np.stack([pad[dy:dy + 10, dx:dx + 12] for dy in range(3)
                    for dx in range(3)], axis=-1)
    np.testing.assert_allclose(out, np.median(win, axis=-1), atol=1e-6)


def test_flip_device_outputs_are_flip_variants_with_aligned_mask():
    t = TRANSFORMS.get("Flip")(p=1.0)
    assert t.device_capable and not t.device_bbox_safe
    gen = np.random.default_rng(23)
    imgs = gen.integers(0, 256, (16, 9, 11, 3), dtype=np.uint8)
    masks = gen.integers(0, 5, (16, 9, 11)).astype(np.int32)
    out = t.apply_batch({"image": jnp.asarray(imgs),
                         "mask": jnp.asarray(masks)}, jax.random.PRNGKey(12))
    img_out, mask_out = np.asarray(out["image"]), np.asarray(out["mask"])
    variants_seen = set()
    for i in range(16):
        found = None
        for name, fi, fm in [
                ("id", imgs[i], masks[i]),
                ("h", imgs[i, :, ::-1], masks[i, :, ::-1]),
                ("v", imgs[i, ::-1], masks[i, ::-1]),
                ("hv", imgs[i, ::-1, ::-1], masks[i, ::-1, ::-1])]:
            if np.array_equal(img_out[i], fi):
                found = name
                np.testing.assert_array_equal(mask_out[i], fm)
                break
        assert found is not None, f"sample {i} is not a flip variant"
        variants_seen.add(found)
    assert len(variants_seen) > 1  # p=1: codes vary across the batch


def test_flip_device_p_zero_is_identity():
    t = TRANSFORMS.get("Flip")(p=0.0)
    img = _img(seed=24)
    np.testing.assert_array_equal(_dev(t, img, seed=13), img)


def test_from_float_device_matches_host():
    t = TRANSFORMS.get("FromFloat")(dtype="uint16")
    img = np.random.default_rng(25).random((8, 10, 3)).astype(np.float32)
    host = t.apply(img)
    dev = _dev(t, img, seed=14)
    assert dev.dtype == np.uint16
    np.testing.assert_array_equal(dev, host)
