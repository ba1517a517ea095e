"""Device-path parity for the round-4b geometry ports: the deterministic
resize family (FitResize/LongestMaxSize/SmallestMaxSize), static Crop,
PadIfNeeded, Transpose and RandomRotate90.

All of these derive their output geometry from the STATIC batch shape at
trace time, so they need no split-time shape plumbing — square-only ops
(RandomRotate90, per-sample Transpose) raise loudly on non-square inputs,
where the host path would fail at collate anyway. Reference surface:
torchok/data/transforms/__init__.py (albumentations registrations).
"""
import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchok_tpu.constructor import TRANSFORMS


def _img(h=20, w=28, c=3, seed=0):
    return np.random.default_rng(seed).integers(0, 256, (h, w, c), dtype=np.uint8)


def _batch(t, imgs, seed=0, mask=None):
    batch = {"image": jnp.asarray(np.stack(imgs))}
    if mask is not None:
        batch["mask"] = jnp.asarray(np.stack(mask))
    out = t.apply_batch(batch, jax.random.PRNGKey(seed))
    return {k: (np.asarray(v) if v is not None else None) for k, v in out.items()}


@pytest.mark.parametrize("name,kwargs,hw", [
    ("LongestMaxSize", {"max_size": 14}, (10, 14)),
    ("SmallestMaxSize", {"max_size": 40}, (40, 56)),
    ("FitResize", {"max_height": 10, "max_width": 10}, (7, 10)),
])
def test_resize_family_device_matches_host(name, kwargs, hw):
    t = TRANSFORMS.get(name)(**kwargs)
    imgs = [_img(seed=s) for s in range(3)]
    masks = [(_img(seed=10 + s)[..., 0] > 128).astype(np.uint8) for s in range(3)]
    out = _batch(t, imgs, mask=masks)
    assert out["image"].shape[1:3] == hw and out["image"].dtype == np.uint8
    assert out["mask"].shape[1:3] == hw
    for i, im in enumerate(imgs):
        host = t.apply(im)
        assert host.shape[:2] == hw
        # 2-tap bilinear vs cv2's fixed-point arithmetic: tiny LSB drift
        diff = np.abs(out["image"][i].astype(int) - host.astype(int))
        assert np.mean(diff <= 1) > 0.99 and diff.max() <= 3


def test_resize_device_honors_nearest_interpolation():
    t = TRANSFORMS.get("Resize")(height=10, width=14,
                                 interpolation=cv2.INTER_NEAREST)
    assert t.device_capable
    img = _img()
    out = _batch(t, [img])["image"][0]
    # nearest-resampled output contains only source pixel values
    assert set(np.unique(out)) <= set(np.unique(img))
    assert not TRANSFORMS.get("Resize")(
        height=10, width=14, interpolation=cv2.INTER_CUBIC).device_capable


def test_crop_device_matches_host_with_clamping():
    t = TRANSFORMS.get("Crop")(x_min=4, y_min=2, x_max=100, y_max=15)
    imgs = [_img(seed=s) for s in range(2)]
    out = _batch(t, imgs)
    for i, im in enumerate(imgs):
        np.testing.assert_array_equal(out["image"][i], t.apply(im))


@pytest.mark.parametrize("border", [cv2.BORDER_CONSTANT, cv2.BORDER_REPLICATE,
                                    cv2.BORDER_REFLECT_101])
def test_pad_if_needed_device_matches_cv2(border):
    t = TRANSFORMS.get("PadIfNeeded")(min_height=30, min_width=33,
                                      border_mode=border, value=7)
    imgs = [_img(seed=s) for s in range(2)]
    masks = [(_img(seed=20 + s)[..., 0] > 128).astype(np.uint8) for s in range(2)]
    out = _batch(t, imgs, mask=masks)
    assert out["image"].shape[1:3] == (30, 33)
    for i, im in enumerate(imgs):
        np.testing.assert_array_equal(out["image"][i], t.apply(im))
        np.testing.assert_array_equal(out["mask"][i], t.apply_to_mask(masks[i]))


def test_pad_if_needed_noop_when_large_enough():
    t = TRANSFORMS.get("PadIfNeeded")(min_height=8, min_width=8)
    img = _img()
    np.testing.assert_array_equal(_batch(t, [img])["image"][0], img)


def test_transpose_device_p1_any_shape():
    t = TRANSFORMS.get("Transpose")(p=1.0)
    imgs = [_img(seed=s) for s in range(2)]
    masks = [(_img(seed=30 + s)[..., 0] > 128).astype(np.uint8) for s in range(2)]
    out = _batch(t, imgs, mask=masks)
    for i, im in enumerate(imgs):
        np.testing.assert_array_equal(out["image"][i], im.swapaxes(0, 1))
        np.testing.assert_array_equal(out["mask"][i], masks[i].swapaxes(0, 1))


def test_transpose_device_per_sample_square():
    t = TRANSFORMS.get("Transpose")(p=0.5)
    imgs = [_img(16, 16, seed=s) for s in range(64)]
    out = _batch(t, imgs, seed=3)["image"]
    states = {"id": 0, "sw": 0}
    for i, im in enumerate(imgs):
        if np.array_equal(out[i], im):
            states["id"] += 1
        elif np.array_equal(out[i], im.swapaxes(0, 1)):
            states["sw"] += 1
        else:
            raise AssertionError("sample is neither identity nor transpose")
    assert states["id"] > 0 and states["sw"] > 0


def test_transpose_device_per_sample_nonsquare_raises():
    t = TRANSFORMS.get("Transpose")(p=0.5)
    with pytest.raises(ValueError, match="square"):
        _batch(t, [_img()])


def test_random_rotate90_device_square_with_mask_alignment():
    t = TRANSFORMS.get("RandomRotate90")(p=1.0)
    imgs = [_img(16, 16, seed=s) for s in range(64)]
    masks = [np.arange(256, dtype=np.uint8).reshape(16, 16) for _ in range(64)]
    out = _batch(t, imgs, seed=7, mask=masks)
    seen = set()
    for i, im in enumerate(imgs):
        for k in range(4):
            if np.array_equal(out["image"][i], np.rot90(im, k)):
                np.testing.assert_array_equal(out["mask"][i],
                                              np.rot90(masks[i], k))
                seen.add(k)
                break
        else:
            raise AssertionError("sample is not a 90-degree rotation")
    assert seen == {0, 1, 2, 3}  # all four turns drawn across 64 samples


def test_random_rotate90_device_nonsquare_raises():
    t = TRANSFORMS.get("RandomRotate90")(p=1.0)
    with pytest.raises(ValueError, match="square"):
        _batch(t, [_img()])


def test_resize_family_moves_to_device_only_with_uniform_shapes():
    from torchok_tpu.data.transforms.base import Compose
    t = TRANSFORMS.get("LongestMaxSize")(max_size=14)
    pipe = Compose([t])
    _, dev = pipe.split_device_suffix(bbox_mode=False, uniform_shapes=False)
    assert dev == []
    _, dev = pipe.split_device_suffix(bbox_mode=False, uniform_shapes=True)
    assert dev == [t]
    # bbox datasets keep it on host (apply_batch has no bbox co-transform)
    _, dev = pipe.split_device_suffix(bbox_mode=True, uniform_shapes=True)
    assert dev == []
