"""Device-path parity for the round-4e geometry additions
(RandomGridShuffle, CropAndPad static-spec).

RandomGridShuffle's permutation is drawn on device, so parity is asserted
by enumeration: the device output must equal the host ``_shuffle`` under
SOME permutation, identically for image and mask. CropAndPad collapses to
deterministic per-side amounts (scalar / 4-list), so host and device agree
directly. Reference surface: torchok/data/transforms/__init__.py:66-116.
"""
import itertools

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from torchok_tpu.constructor import TRANSFORMS


def _img(h=24, w=20, c=3, seed=0):
    return np.random.default_rng(seed).integers(0, 256, (h, w, c), dtype=np.uint8)


def _dev(t, img, seed=0, mask=None):
    batch = {"image": jnp.asarray(img[None])}
    if mask is not None:
        batch["mask"] = jnp.asarray(mask[None])
    out = t.apply_batch(batch, jax.random.PRNGKey(seed))
    return {k: np.asarray(v)[0] for k, v in out.items()}


def test_random_grid_shuffle_device_is_some_permutation():
    t = TRANSFORMS.get("RandomGridShuffle")(grid=(2, 2), p=1.0)
    img = _img(h=22, w=18, seed=1)  # non-divisible: smallest-cell rule
    mask = np.random.default_rng(1).integers(0, 7, (22, 18), dtype=np.uint8)
    dev = _dev(t, img, seed=4, mask=mask)
    hits = []
    for perm in itertools.permutations(range(4)):
        perm = np.array(perm)
        if np.array_equal(t._shuffle(img, perm), dev["image"]):
            hits.append(perm)
    assert len(hits) == 1, "device output must match exactly one host perm"
    np.testing.assert_array_equal(t._shuffle(mask, hits[0]), dev["mask"])


def test_random_grid_shuffle_device_batch_draws_different_perms():
    t = TRANSFORMS.get("RandomGridShuffle")(grid=(3, 3), p=1.0)
    img = np.random.default_rng(2).integers(0, 256, (6, 24, 24, 3), np.uint8)
    out = t.apply_batch({"image": jnp.asarray(img)}, jax.random.PRNGKey(5))
    dev = np.asarray(out["image"])
    assert dev.dtype == img.dtype and dev.shape == img.shape
    # multiset of pixels is preserved per sample
    for i in range(6):
        np.testing.assert_array_equal(np.sort(dev[i].ravel()),
                                      np.sort(img[i].ravel()))
    # with 9! arrangements, six samples should not all shuffle identically
    rel = [not np.array_equal(dev[i], img[i]) for i in range(6)]
    assert any(rel)


def test_crop_and_pad_device_matches_host_px_list():
    t = TRANSFORMS.get("CropAndPad")(px=[-3, 4, 2, -5], pad_cval=9, p=1.0)
    assert t.device_capable
    img = _img(seed=3)
    mask = np.random.default_rng(3).integers(0, 5, (24, 20), dtype=np.uint8)
    host = t(force_apply=True, image=img, mask=mask)
    dev = _dev(t, img, mask=mask)
    np.testing.assert_allclose(dev["image"].astype(int),
                               host["image"].astype(int), atol=1)
    np.testing.assert_array_equal(dev["mask"], host["mask"])


def test_crop_and_pad_device_matches_host_percent_scalar():
    t = TRANSFORMS.get("CropAndPad")(percent=0.1,
                                     pad_mode=cv2.BORDER_REFLECT_101, p=1.0)
    img = _img(seed=4)
    host = t(force_apply=True, image=img)["image"].astype(int)
    dev = _dev(t, img)["image"].astype(int)
    np.testing.assert_allclose(dev, host, atol=1)


def test_crop_and_pad_device_crop_only_scalar():
    t = TRANSFORMS.get("CropAndPad")(px=-4, p=1.0)
    img = _img(seed=5)
    host = t(force_apply=True, image=img)["image"].astype(int)
    dev = _dev(t, img)["image"].astype(int)
    np.testing.assert_allclose(dev, host, atol=1)


def test_crop_and_pad_device_gated_by_random_spec():
    assert not TRANSFORMS.get("CropAndPad")(px=(-4, 4)).device_capable
    assert not TRANSFORMS.get("CropAndPad")(px=2, keep_size=False).device_capable
