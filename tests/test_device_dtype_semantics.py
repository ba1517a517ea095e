"""Non-uint8 image dtypes through the device transform paths.

The host paths branch on ``dtype == uint8`` (albumentations semantics) while
cv2-backed filtering/warping preserves and saturates to the INPUT dtype —
the device paths must do the same instead of crushing every integer image
to [0, 255]. Also pins the bbox-mode device-suffix rule: a geometric op with
no bbox handler must stay on host (where it raises loudly) rather than
silently warping pixels under untouched GT boxes.
"""
import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchok_tpu.constructor import TRANSFORMS
from torchok_tpu.data.transforms.base import BaseTransform, Compose


def _dev(t, img, seed=0, **extra):
    batch = {"image": jnp.asarray(img[None])}
    for k, v in extra.items():
        batch[k] = jnp.asarray(v[None])
    return {k: np.asarray(v)[0] if v is not None else None
            for k, v in t.apply_batch(batch, jax.random.PRNGKey(seed)).items()}


def _u16(h=20, w=24, c=3, seed=0):
    return np.random.default_rng(seed).integers(
        0, 65536, (h, w, c)).astype(np.uint16)


# ---------------------- cv2-backed ops preserve dtype ----------------------

def test_blur_uint16_matches_cv2_exactly():
    t = TRANSFORMS.get("Blur")(blur_limit=(5, 5), p=1.0)
    img = _u16()
    dev = _dev(t, img)["image"]
    assert dev.dtype == np.uint16
    host = cv2.blur(img, (5, 5))
    assert int(np.abs(dev.astype(np.int64) - host.astype(np.int64)).max()) <= 1


def test_gaussian_blur_uint16_not_crushed_to_255():
    t = TRANSFORMS.get("GaussianBlur")(blur_limit=(5, 5), sigma_limit=(1.5, 1.5), p=1.0)
    img = _u16(seed=1)
    dev = _dev(t, img)["image"]
    host = cv2.GaussianBlur(img, (5, 5), sigmaX=1.5)
    assert dev.dtype == np.uint16 and dev.max() > 255
    assert int(np.abs(dev.astype(np.int64) - host.astype(np.int64)).max()) <= 1


def test_median_blur_int16_negative_values_match_cv2():
    # the low sentinel must sort BELOW genuine negative pixels
    img = np.random.default_rng(2).integers(
        -1000, 1000, (16, 16, 3)).astype(np.int16)
    t = TRANSFORMS.get("MedianBlur")(blur_limit=(3, 3), p=1.0)
    dev = _dev(t, img)["image"]
    host = cv2.medianBlur(img, 3)
    np.testing.assert_array_equal(dev, host)


def test_rotate_uint16_saturates_to_dtype_range():
    t = TRANSFORMS.get("Rotate")(limit=(30, 30), p=1.0)
    img = _u16(seed=3)
    dev = _dev(t, img)["image"]
    assert dev.dtype == np.uint16
    assert dev.max() > 255  # not crushed
    mat = cv2.getRotationMatrix2D(((img.shape[1] - 1) / 2, (img.shape[0] - 1) / 2), 30, 1.0)
    host = cv2.warpAffine(img, mat, (img.shape[1], img.shape[0]),
                          flags=cv2.INTER_LINEAR, borderMode=cv2.BORDER_REFLECT_101)
    assert int(np.abs(dev.astype(np.int64) - host.astype(np.int64)).max()) <= 1


# ------------- uint8-gated photometric ops: non-uint8 stays float -----------

def test_brightness_contrast_uint16_returns_float_like_host():
    t = TRANSFORMS.get("RandomBrightnessContrast")(
        brightness_limit=(0.1, 0.1), contrast_limit=(0.2, 0.2), p=1.0)
    t.seed(0)
    img = _u16(seed=4)
    dev = _dev(t, img)["image"]
    host = t(force_apply=True, image=img)["image"]
    assert dev.dtype == np.float32 and host.dtype == np.float32
    # host max_value for non-uint8 is 1.0, NOT 255
    np.testing.assert_allclose(dev, img.astype(np.float32) * 1.2 + 0.1, rtol=1e-5)


def test_random_gamma_uint16_uses_raw_values_like_host():
    t = TRANSFORMS.get("RandomGamma")(gamma_limit=(120, 120), p=1.0)
    img = _u16(seed=5)
    dev = _dev(t, img)["image"]
    assert dev.dtype == np.float32
    np.testing.assert_allclose(
        dev, np.power(np.maximum(img.astype(np.float32), 1e-12), 1.2),
        rtol=2e-4)


def test_equalize_device_rejects_non_uint8():
    t = TRANSFORMS.get("Equalize")(p=1.0)
    with pytest.raises(TypeError):
        _dev(t, _u16())


def test_hsv_device_rejects_non_uint8():
    t = TRANSFORMS.get("HueSaturationValue")(p=1.0)
    with pytest.raises(TypeError):
        _dev(t, _u16())


# ------------------- blur radius larger than the image ---------------------

def test_blur_radius_larger_than_image_matches_cv2():
    # jnp.pad(mode='reflect') would raise here; the take-based reflect-101
    # keeps cv2's periodic mirror semantics
    img = np.random.default_rng(6).integers(0, 256, (5, 5, 3), dtype=np.uint8)
    t = TRANSFORMS.get("Blur")(blur_limit=(13, 13), p=1.0)
    dev = _dev(t, img)["image"]
    host = cv2.blur(img, (13, 13))
    assert int(np.abs(dev.astype(int) - host.astype(int)).max()) <= 1


# --------------- bbox mode: handler-less geometry stays on host -------------

@pytest.mark.parametrize("name", ["ElasticTransform", "GridDistortion",
                                  "OpticalDistortion"])
def test_handlerless_geometry_never_moves_to_device_in_bbox_mode(name):
    t = TRANSFORMS.get(name)(p=1.0)
    assert t.device_capable  # otherwise this test is vacuous
    pipe = Compose([t])
    host, device = pipe.split_device_suffix(bbox_mode=True, uniform_shapes=True)
    assert device == [] and host.transforms == [t]
    # and the host path raises loudly instead of misaligning GT
    img = np.zeros((16, 16, 3), np.uint8)
    with pytest.raises(NotImplementedError):
        host(image=img, bboxes=np.array([[1.0, 1.0, 5.0, 5.0, 0.0]]))
    # without bboxes it still moves to the device as before
    host2, device2 = pipe.split_device_suffix(bbox_mode=False, uniform_shapes=True)
    assert device2 == [t]


def test_geometric_guard_is_structural_not_flag_based():
    class BadDeviceGeom(BaseTransform):
        geometric = True
        device_capable = True
        # forgot device_bbox_safe=False — the split must still refuse

        def apply_batch(self, batch, rng):  # pragma: no cover
            return batch

    pipe = Compose([BadDeviceGeom(p=1.0)])
    _, device = pipe.split_device_suffix(bbox_mode=True, uniform_shapes=True)
    assert device == []
