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


def test_extended_pixelwise_ops_run():
    """Every extended photometric op must run on a uint8 RGB image and
    preserve shape and dtype."""
    from torchok_tpu.constructor import TRANSFORMS
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(48, 64, 3), dtype=np.uint8)
    ref = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    cases = {
        "AdvancedBlur": {}, "Defocus": {}, "ZoomBlur": {}, "GlassBlur": {},
        "Emboss": {}, "UnsharpMask": {}, "RingingOvershoot": {},
        "FancyPCA": {}, "ISONoise": {}, "MultiplicativeNoise": {},
        "RandomToneCurve": {}, "ChannelDropout": {}, "PixelDropout": {},
        "GridDropout": {"holes_number_x": 4, "holes_number_y": 4},
        "Superpixels": {}, "RandomFog": {}, "RandomRain": {},
        "RandomShadow": {}, "RandomSnow": {}, "RandomSunFlare": {"src_radius": 20},
        "Spatter": {},
        "FDA": {"reference_images": [ref]},
        "HistogramMatching": {"reference_images": [ref]},
        "PixelDistributionAdaptation": {"reference_images": [ref]},
        "TemplateTransform": {"templates": [ref]},
    }
    for name, params in cases.items():
        t = TRANSFORMS.get(name)(p=1.0, **params)
        t.seed(7)
        out = t(force_apply=True, image=img)["image"]
        assert out.shape == img.shape, name
        assert out.dtype == np.uint8, name


def test_extended_crop_ops_geometry():
    from torchok_tpu.constructor import TRANSFORMS
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, size=(60, 80, 3), dtype=np.uint8)
    mask = rng.integers(0, 2, size=(60, 80), dtype=np.uint8)

    t = TRANSFORMS.get("RandomSizedCrop")(min_max_height=(20, 40), height=32, width=32)
    t.seed(1)
    out = t(image=img, mask=mask)
    assert out["image"].shape == (32, 32, 3) and out["mask"].shape == (32, 32)

    t = TRANSFORMS.get("RandomCropFromBorders")()
    t.seed(1)
    out = t(image=img)["image"]
    assert out.shape[0] <= 60 and out.shape[1] <= 80

    t = TRANSFORMS.get("CropAndPad")(px=5)  # pad all sides, keep_size resizes back
    t.seed(1)
    assert t(image=img)["image"].shape == img.shape

    t = TRANSFORMS.get("CropAndPad")(px=-5, keep_size=False)  # crop all sides
    t.seed(1)
    assert t(image=img)["image"].shape == (50, 70, 3)

    t = TRANSFORMS.get("RandomGridShuffle")(grid=(2, 2), p=1.0)
    t.seed(1)
    out = t(force_apply=True, image=img, mask=mask)
    assert out["image"].shape == img.shape
    assert sorted(out["image"].reshape(-1).tolist()) == \
        sorted(img.reshape(-1).tolist())  # permutation preserves pixels

    t = TRANSFORMS.get("SafeRotate")(limit=45, p=1.0)
    t.seed(1)
    assert t(force_apply=True, image=img)["image"].shape == img.shape

    t = TRANSFORMS.get("PiecewiseAffine")(p=1.0)
    t.seed(1)
    assert t(force_apply=True, image=img)["image"].shape == img.shape


def test_bbox_safe_crop_keeps_boxes():
    from torchok_tpu.constructor import TRANSFORMS
    img = np.zeros((100, 100, 3), np.uint8)
    bboxes = np.array([[20, 30, 40, 50], [60, 10, 80, 35]], np.float32)
    t = TRANSFORMS.get("BBoxSafeRandomCrop")()
    t.seed(5)
    out = t(image=img, bboxes=bboxes)
    b = np.asarray(out["bboxes"])
    widths = b[:, 2] - b[:, 0]
    heights = b[:, 3] - b[:, 1]
    # areas preserved: the crop must contain every original box
    assert np.allclose(widths, [20, 20]) and np.allclose(heights, [20, 25])
    h, w = out["image"].shape[:2]
    assert (b[:, [0, 2]] <= w).all() and (b[:, [1, 3]] <= h).all()


def test_mask_dropout_zeroes_objects():
    from torchok_tpu.constructor import TRANSFORMS
    img = np.full((40, 40, 3), 200, np.uint8)
    mask = np.zeros((40, 40), np.uint8)
    mask[5:15, 5:15] = 1
    mask[25:35, 25:35] = 1
    t = TRANSFORMS.get("MaskDropout")(max_objects=2, p=1.0)
    t.seed(2)
    out = t(force_apply=True, image=img, mask=mask)
    assert out["mask"].sum() < mask.sum()
    assert (out["image"] == 0).any()


def test_crop_non_empty_mask_contains_positive():
    from torchok_tpu.constructor import TRANSFORMS
    img = np.zeros((64, 64, 3), np.uint8)
    mask = np.zeros((64, 64), np.uint8)
    mask[50:60, 50:60] = 1
    t = TRANSFORMS.get("CropNonEmptyMaskIfExists")(height=16, width=16, p=1.0)
    hits = 0
    for seed in range(10):
        t.seed(seed)
        out = t(force_apply=True, image=img, mask=mask)
        assert out["image"].shape == (16, 16, 3)
        hits += int(out["mask"].sum() > 0)
    assert hits == 10  # every crop contains mask-positive pixels
