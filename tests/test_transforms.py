"""Transform engine tests: host/device split, numerics, compose semantics."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchok_tpu.constructor import TRANSFORMS
from torchok_tpu.data.transforms import Compose, DeviceTransformPipeline


def _img(h=16, w=16, c=3, seed=0):
    return np.random.default_rng(seed).integers(0, 256, (h, w, c), dtype=np.uint8)


def test_normalize_matches_albumentations_formula():
    t = TRANSFORMS.get("Normalize")(mean=[0.5, 0.5, 0.5], std=[0.25, 0.25, 0.25])
    img = _img()
    out = t(image=img)["image"]
    expected = (img.astype(np.float32) - 0.5 * 255) / (0.25 * 255)
    np.testing.assert_allclose(out, expected, atol=1e-5)


def test_normalize_device_matches_host():
    t = TRANSFORMS.get("Normalize")()
    img = _img()
    host = t(image=img)["image"]
    dev = t.apply_batch({"image": jnp.asarray(img[None])}, jax.random.PRNGKey(0))["image"]
    np.testing.assert_allclose(np.asarray(dev)[0], host, atol=1e-5)


def test_resize():
    t = TRANSFORMS.get("Resize")(height=8, width=4)
    out = t(image=_img())["image"]
    assert out.shape == (8, 4, 3)


def test_compose_split_device_suffix():
    c = Compose([
        TRANSFORMS.get("Resize")(height=8, width=8),
        TRANSFORMS.get("Normalize")(),
        TRANSFORMS.get("ToTensorV2")(),
    ])
    host, device = c.split_device_suffix()
    assert len(host.transforms) == 1  # Resize stays on host
    assert len(device) == 2


def test_device_pipeline_applies_in_order():
    pipe = DeviceTransformPipeline([
        TRANSFORMS.get("Normalize")(mean=[0, 0, 0], std=[1, 1, 1], max_pixel_value=1.0),
        TRANSFORMS.get("ToTensorV2")(),
    ])
    batch = {"image": jnp.full((2, 4, 4, 3), 2.0)}
    out = pipe(batch, jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(out["image"]), 2.0)


def test_horizontal_flip_host_and_device_agree_when_forced():
    t = TRANSFORMS.get("HorizontalFlip")(p=1.0)
    img = _img()
    host = t(image=img)["image"]
    dev = t.apply_batch({"image": jnp.asarray(img[None])}, jax.random.PRNGKey(1))["image"]
    np.testing.assert_array_equal(np.asarray(dev)[0], host)


def test_flip_applies_to_mask_consistently():
    t = TRANSFORMS.get("HorizontalFlip")(p=1.0)
    img = _img()
    mask = np.arange(16 * 16).reshape(16, 16)
    out = t(image=img, mask=mask)
    np.testing.assert_array_equal(out["mask"], mask[:, ::-1])


def test_oneof_selects_exactly_one():
    marker_a = TRANSFORMS.get("InvertImg")(p=1.0)
    t = TRANSFORMS.get("OneOf")(transforms=[marker_a], p=1.0)
    img = _img()
    out = t(image=img)["image"]
    np.testing.assert_array_equal(out, 255 - img)


def test_random_transform_determinism_via_seed():
    t1 = TRANSFORMS.get("RandomCrop")(height=8, width=8)
    t2 = TRANSFORMS.get("RandomCrop")(height=8, width=8)
    t1.seed(123)
    t2.seed(123)
    img = _img(32, 32)
    np.testing.assert_array_equal(t1(image=img)["image"], t2(image=img)["image"])


def test_random_resized_crop_shape():
    t = TRANSFORMS.get("RandomResizedCrop")(height=12, width=12)
    out = t(force_apply=True, image=_img(32, 32))["image"]
    assert out.shape == (12, 12, 3)


def test_pad_if_needed():
    t = TRANSFORMS.get("PadIfNeeded")(min_height=20, min_width=24)
    out = t(image=_img(10, 10))["image"]
    assert out.shape == (20, 24, 3)


def test_coarse_dropout_device_fills():
    t = TRANSFORMS.get("CoarseDropout")(max_holes=2, max_height=4, max_width=4,
                                        fill_value=0, p=1.0)
    img = jnp.asarray(np.full((2, 16, 16, 3), 200, np.uint8))
    out = t.apply_batch({"image": img}, jax.random.PRNGKey(0))["image"]
    assert int(jnp.sum(out == 0)) > 0


def test_color_jitter_device_runs():
    t = TRANSFORMS.get("ColorJitter")(p=1.0)
    img = jnp.asarray(_img()[None])
    out = t.apply_batch({"image": img}, jax.random.PRNGKey(0))["image"]
    assert out.shape == img.shape
