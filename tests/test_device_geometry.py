"""Device (batched TPU) geometric augmentation parity vs the host cv2 path.

The warp kernel (ops/warp.py) follows cv2 conventions exactly; cv2 itself
quantizes warp coordinates to 1/32 px fixed point, so warp comparisons carry
a small tolerance while integer-coordinate paths (crops, shifts) must match
exactly.
"""
import cv2
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import torchok_tpu  # noqa: F401
from torchok_tpu.data.transforms.spatial import (CenterCrop, RandomCrop,
                                                 RandomResizedCrop, Rotate,
                                                 ShiftScaleRotate)
from torchok_tpu.ops.warp import (affine_sample, crop_resize_sample,
                                  invert_affine, rotation_mats)


def _img(gen, n=2, h=24, w=32, c=3):
    return gen.uniform(0, 1, (n, h, w, c)).astype(np.float32)


# --------------------------- kernel conventions ---------------------------

def test_affine_sample_matches_cv2_warp_affine():
    gen = np.random.default_rng(0)
    imgs = _img(gen)
    n, h, w, _ = imgs.shape
    mats = []
    for i in range(n):
        m = cv2.getRotationMatrix2D((w / 2 - 0.5, h / 2 - 0.5),
                                    17.0 + 9 * i, 1.1)
        m[0, 2] += 2.3
        mats.append(m)
    ours = np.asarray(affine_sample(jnp.asarray(imgs),
                                    jnp.asarray(np.stack(mats)), (h, w)))
    for i in range(n):
        ref = cv2.warpAffine(imgs[i], mats[i], (w, h), flags=cv2.INTER_LINEAR,
                             borderMode=cv2.BORDER_REFLECT_101)
        # cv2 quantizes coords to 1/32 px; our f32 coords are more accurate
        np.testing.assert_allclose(ours[i], ref, atol=0.08)
        assert np.abs(ours[i] - ref).mean() < 0.004


def test_affine_sample_constant_border_matches_cv2():
    gen = np.random.default_rng(1)
    imgs = _img(gen, n=1)
    n, h, w, _ = imgs.shape
    m = cv2.getRotationMatrix2D((w / 2 - 0.5, h / 2 - 0.5), 40.0, 0.7)
    ours = np.asarray(affine_sample(jnp.asarray(imgs),
                                    jnp.asarray(m[None]), (h, w),
                                    border="constant", fill=0.25))
    ref = cv2.warpAffine(imgs[0], m, (w, h), flags=cv2.INTER_LINEAR,
                         borderMode=cv2.BORDER_CONSTANT,
                         borderValue=(0.25, 0.25, 0.25))
    np.testing.assert_allclose(ours[0], ref, atol=0.08)


def test_integer_translation_is_exact():
    gen = np.random.default_rng(2)
    imgs = _img(gen, n=1, h=10, w=12)
    m = np.array([[1.0, 0.0, 3.0], [0.0, 1.0, -2.0]], np.float32)
    ours = np.asarray(affine_sample(jnp.asarray(imgs), jnp.asarray(m[None]),
                                    (10, 12), border="constant", fill=0.0))
    ref = cv2.warpAffine(imgs[0], m, (12, 10), flags=cv2.INTER_LINEAR,
                         borderMode=cv2.BORDER_CONSTANT, borderValue=0.0)
    np.testing.assert_allclose(ours[0], ref, atol=1e-6)


def test_crop_resize_matches_cv2_resize():
    gen = np.random.default_rng(3)
    imgs = _img(gen, n=2, h=20, w=26)
    rects = np.array([[2, 3, 14, 18], [0, 0, 20, 26]], np.float32)
    ours = np.asarray(crop_resize_sample(jnp.asarray(imgs),
                                         jnp.asarray(rects), (16, 16)))
    for i, (y0, x0, ch, cw) in enumerate(rects.astype(int)):
        crop = imgs[i, y0:y0 + ch, x0:x0 + cw]
        ref = cv2.resize(crop, (16, 16), interpolation=cv2.INTER_LINEAR)
        np.testing.assert_allclose(ours[i], ref, atol=2e-3)


def test_invert_affine_roundtrip():
    gen = np.random.default_rng(4)
    mats = jnp.asarray(
        rotation_mats(jnp.asarray([33.0, -80.0]), jnp.asarray([1.2, 0.8]),
                      (7.5, 5.5)))
    inv = invert_affine(mats)
    pts = gen.normal(0, 10, (5, 2)).astype(np.float32)
    for i in range(2):
        fwd = np.asarray(mats[i, :, :2]) @ pts.T + np.asarray(mats[i, :, 2:])
        back = np.asarray(inv[i, :, :2]) @ fwd + np.asarray(inv[i, :, 2:])
        np.testing.assert_allclose(back.T, pts, atol=1e-4)


# ------------------------ transform-level parity ---------------------------

def test_rotate_device_matches_host(rng_seed=5):
    gen = np.random.default_rng(rng_seed)
    imgs = _img(gen, n=3, h=24, w=24)
    masks = gen.integers(0, 5, (3, 24, 24)).astype(np.int32)
    t = Rotate(limit=(30.0, 30.0), p=1.0)  # deterministic angle
    assert t.device_capable
    out = t.apply_batch({"image": jnp.asarray(imgs),
                         "mask": jnp.asarray(masks)}, jax.random.PRNGKey(0))
    for i in range(3):
        ref = t.apply(imgs[i], angle=30.0)
        np.testing.assert_allclose(np.asarray(out["image"][i]), ref,
                                   atol=0.08)
        ref_m = t.apply_to_mask(masks[i], angle=30.0)
        # nearest sampling: cv2's 1/32-px coords flip ties at pixel borders
        mismatch = (np.asarray(out["mask"][i]) != ref_m).mean()
        assert mismatch < 0.03, mismatch


def test_shift_scale_rotate_device_matches_host():
    gen = np.random.default_rng(6)
    imgs = _img(gen, n=2, h=20, w=28)
    t = ShiftScaleRotate(shift_limit=(0.1, 0.1), scale_limit=(0.2, 0.2),
                         rotate_limit=(-25.0, -25.0), p=1.0)
    assert t.device_capable
    out = t.apply_batch({"image": jnp.asarray(imgs)}, jax.random.PRNGKey(1))
    for i in range(2):
        ref = t.apply(imgs[i], angle=-25.0, scale=1.2, dx=0.1, dy=0.1)
        np.testing.assert_allclose(np.asarray(out["image"][i]), ref,
                                   atol=0.08)


def test_rotate_p_zero_is_identity():
    gen = np.random.default_rng(7)
    imgs = _img(gen)
    t = Rotate(limit=45, p=0.0)
    out = t.apply_batch({"image": jnp.asarray(imgs)}, jax.random.PRNGKey(2))
    np.testing.assert_allclose(np.asarray(out["image"]), imgs, atol=1e-6)


def test_center_crop_device_exact():
    gen = np.random.default_rng(8)
    imgs = (gen.uniform(0, 255, (2, 20, 24, 3))).astype(np.uint8)
    masks = gen.integers(0, 4, (2, 20, 24)).astype(np.int32)
    t = CenterCrop(12, 16)
    out = t.apply_batch({"image": jnp.asarray(imgs),
                         "mask": jnp.asarray(masks)}, jax.random.PRNGKey(3))
    for i in range(2):
        np.testing.assert_array_equal(np.asarray(out["image"][i]),
                                      t.apply(imgs[i], **t.get_params(
                                          {"image": imgs[i]})))
        np.testing.assert_array_equal(np.asarray(out["mask"][i]),
                                      t.apply_to_mask(masks[i],
                                                      **t.get_params(
                                          {"image": imgs[i]})))
    assert out["image"].dtype == jnp.uint8


def test_random_crop_device_is_an_exact_window_with_aligned_mask():
    gen = np.random.default_rng(9)
    imgs = (gen.uniform(0, 255, (3, 14, 14, 3))).astype(np.uint8)
    masks = gen.integers(0, 100, (3, 14, 14)).astype(np.int32)
    t = RandomCrop(8, 8)
    assert t.device_capable
    out = t.apply_batch({"image": jnp.asarray(imgs),
                         "mask": jnp.asarray(masks)}, jax.random.PRNGKey(4))
    img_out = np.asarray(out["image"])
    mask_out = np.asarray(out["mask"])
    offsets_seen = set()
    for i in range(3):
        found = None
        for y0 in range(14 - 8 + 1):
            for x0 in range(14 - 8 + 1):
                if np.array_equal(img_out[i], imgs[i, y0:y0 + 8, x0:x0 + 8]):
                    found = (y0, x0)
                    break
            if found:
                break
        assert found is not None, f"sample {i}: crop is not an exact window"
        offsets_seen.add((i, found))
        y0, x0 = found
        np.testing.assert_array_equal(mask_out[i],
                                      masks[i, y0:y0 + 8, x0:x0 + 8])


def test_random_resized_crop_full_rect_matches_cv2_resize():
    gen = np.random.default_rng(10)
    imgs = _img(gen, n=2, h=18, w=18)
    # scale/ratio pinned to 1.0: the crop is always the full square image
    t = RandomResizedCrop(12, 12, scale=(1.0, 1.0), ratio=(1.0, 1.0))
    assert t.device_capable
    out = t.apply_batch({"image": jnp.asarray(imgs)}, jax.random.PRNGKey(5))
    for i in range(2):
        ref = cv2.resize(imgs[i], (12, 12), interpolation=cv2.INTER_LINEAR)
        np.testing.assert_allclose(np.asarray(out["image"][i]), ref,
                                   atol=2e-3)


def test_random_resized_crop_distribution_is_in_bounds():
    gen = np.random.default_rng(11)
    imgs = _img(gen, n=16, h=24, w=24)
    t = RandomResizedCrop(8, 8, scale=(0.3, 0.9))
    out = t.apply_batch({"image": jnp.asarray(imgs)}, jax.random.PRNGKey(6))
    assert out["image"].shape == (16, 8, 8, 3)
    assert bool(jnp.all(jnp.isfinite(out["image"])))
    # different samples get different crops
    flat = np.asarray(out["image"]).reshape(16, -1)
    assert len({tuple(np.round(r[:16], 4)) for r in flat}) > 1


# ----------------------- pipeline split integration ------------------------

def test_split_moves_geometry_to_device_for_uniform_datasets():
    from torchok_tpu.data.transforms.base import Compose
    from torchok_tpu.data.transforms.pixelwise import Normalize, ToTensorV2

    chain = Compose([ShiftScaleRotate(p=0.5), Normalize(), ToTensorV2()])
    host, device = chain.split_device_suffix(bbox_mode=False,
                                             uniform_shapes=True)
    assert not host.transforms
    assert len(device) == 3

    # without uniform shapes the batched warp cannot run
    host2, device2 = chain.split_device_suffix(bbox_mode=False,
                                               uniform_shapes=False)
    assert isinstance(host2.transforms[0], ShiftScaleRotate)
    assert len(device2) == 2

    # bbox datasets keep geometry on host (no device bbox co-transform)
    host3, device3 = chain.split_device_suffix(bbox_mode=True,
                                               uniform_shapes=True)
    assert isinstance(host3.transforms[0], ShiftScaleRotate)


def test_unsupported_options_stay_on_host():
    assert not Rotate(interpolation=cv2.INTER_CUBIC).device_capable
    assert not Rotate(border_mode=cv2.BORDER_WRAP).device_capable
    assert not Rotate(value=(1, 2, 3)).device_capable
    assert not RandomCrop(8, 8, p=0.5).device_capable
    assert not RandomResizedCrop(8, 8, interpolation=cv2.INTER_CUBIC).device_capable


# ----------------- round-4 additions: warp/remap device ops -----------------

def test_affine_device_matches_host_pinned_params():
    gen = np.random.default_rng(20)
    from torchok_tpu.data.transforms.spatial import Affine
    imgs = _img(gen, n=2, h=20, w=26)
    masks = gen.integers(0, 5, (2, 20, 26)).astype(np.int32)
    t = Affine(scale=(1.2, 1.2), translate_percent=(0.05, 0.05),
               rotate=(15.0, 15.0), shear=(5.0, 5.0), p=1.0)
    assert t.device_capable
    out = t.apply_batch({"image": jnp.asarray(imgs),
                         "mask": jnp.asarray(masks)}, jax.random.PRNGKey(0))
    for i in range(2):
        ref = t.apply(imgs[i], sc=1.2, tx=0.05, ty=0.05, ang=15.0, sh=5.0)
        np.testing.assert_allclose(np.asarray(out["image"][i]), ref,
                                   atol=0.08)
        ref_m = t.apply_to_mask(masks[i], sc=1.2, tx=0.05, ty=0.05,
                                ang=15.0, sh=5.0)
        mismatch = (np.asarray(out["mask"][i]) != ref_m).mean()
        assert mismatch < 0.03, mismatch


def test_safe_rotate_device_matches_host_pinned_angle():
    gen = np.random.default_rng(21)
    from torchok_tpu.data.transforms.spatial import SafeRotate
    imgs = _img(gen, n=2, h=18, w=30)
    t = SafeRotate(limit=(37.0, 37.0), p=1.0)
    assert t.device_capable
    out = t.apply_batch({"image": jnp.asarray(imgs)}, jax.random.PRNGKey(1))
    for i in range(2):
        ref = t.apply(imgs[i], angle=37.0)
        np.testing.assert_allclose(np.asarray(out["image"][i]), ref,
                                   atol=0.08)


def test_random_sized_crop_device_matches_host_full_rect():
    gen = np.random.default_rng(22)
    from torchok_tpu.data.transforms.spatial import RandomSizedCrop
    # ch == h and cw == w so the (random) offsets are forced to 0 on both
    # paths: the op reduces to a deterministic full-frame resize
    imgs = _img(gen, n=2, h=16, w=20)
    t = RandomSizedCrop(min_max_height=(16, 16), height=12, width=14,
                        w2h_ratio=1.25, p=1.0)
    assert t.device_capable
    out = t.apply_batch({"image": jnp.asarray(imgs)}, jax.random.PRNGKey(2))
    for i in range(2):
        ref = t.apply(imgs[i], y0=0, x0=0, ch=16, cw=20)
        np.testing.assert_allclose(np.asarray(out["image"][i]), ref,
                                   atol=2e-3)


def test_gauss_blur_field_matches_cv2_gaussian_blur():
    gen = np.random.default_rng(23)
    from torchok_tpu.data.transforms.spatial import _gauss_blur_field
    field = gen.uniform(-1, 1, (2, 17, 23)).astype(np.float32)
    ours = np.asarray(_gauss_blur_field(jnp.asarray(field), 9, 3.0))
    for i in range(2):
        ref = cv2.GaussianBlur(field[i], (9, 9), 3.0)
        np.testing.assert_allclose(ours[i], ref, atol=1e-5)


def test_gauss_blur_field_radius_larger_than_field():
    # cv2 mirrors periodically when the kernel exceeds the image; the
    # take-based pad must agree (jnp.pad(mode='reflect') would raise here)
    gen = np.random.default_rng(24)
    from torchok_tpu.data.transforms.spatial import _gauss_blur_field
    field = gen.uniform(-1, 1, (1, 6, 7)).astype(np.float32)
    ours = np.asarray(_gauss_blur_field(jnp.asarray(field), 31, 10.0))
    ref = cv2.GaussianBlur(field[0], (31, 31), 10.0)
    np.testing.assert_allclose(ours[0], ref, atol=1e-5)


def test_elastic_transform_device_zero_alpha_is_identity():
    gen = np.random.default_rng(25)
    from torchok_tpu.data.transforms.spatial import ElasticTransform
    imgs = _img(gen, n=2, h=14, w=18)
    t = ElasticTransform(alpha=0.0, sigma=3.0, p=1.0)
    assert t.device_capable
    out = t.apply_batch({"image": jnp.asarray(imgs)}, jax.random.PRNGKey(3))
    np.testing.assert_allclose(np.asarray(out["image"]), imgs, atol=1e-5)


def test_elastic_transform_device_is_a_bounded_remap():
    gen = np.random.default_rng(26)
    from torchok_tpu.data.transforms.spatial import ElasticTransform
    imgs = _img(gen, n=2, h=20, w=20)
    t = ElasticTransform(alpha=30.0, sigma=3.0, p=1.0)
    out = np.asarray(t.apply_batch({"image": jnp.asarray(imgs)},
                                   jax.random.PRNGKey(4))["image"])
    # it moved pixels ...
    assert np.abs(out - imgs).max() > 1e-3
    # ... but values stay in the source value hull (bilinear interpolation)
    assert out.min() >= imgs.min() - 1e-5 and out.max() <= imgs.max() + 1e-5


def test_grid_distortion_device_matches_host_pinned_limit():
    gen = np.random.default_rng(27)
    from torchok_tpu.data.transforms.spatial import GridDistortion
    # distort_limit pinned to a constant -> host steps are deterministic;
    # h/w chosen indivisible by num_steps to cover the partial tail segment
    imgs = _img(gen, n=2, h=23, w=26)
    masks = gen.integers(0, 7, (2, 23, 26)).astype(np.int32)
    t = GridDistortion(num_steps=5, distort_limit=(0.3, 0.3), p=1.0)
    assert t.device_capable
    out = t.apply_batch({"image": jnp.asarray(imgs),
                         "mask": jnp.asarray(masks)}, jax.random.PRNGKey(5))
    params = t.get_params({"image": imgs[0]})
    for i in range(2):
        ref = t.apply(imgs[i], **params)
        np.testing.assert_allclose(np.asarray(out["image"][i]), ref,
                                   atol=0.08)
        ref_m = t.apply_to_mask(masks[i], **params)
        mismatch = (np.asarray(out["mask"][i]) != ref_m).mean()
        assert mismatch < 0.03, mismatch


def test_optical_distortion_device_matches_host_pinned_params():
    gen = np.random.default_rng(28)
    from torchok_tpu.data.transforms.spatial import OpticalDistortion
    imgs = _img(gen, n=2, h=24, w=32)
    t = OpticalDistortion(distort_limit=(0.08, 0.08),
                          shift_limit=(0.03, 0.03), p=1.0)
    assert t.device_capable
    out = t.apply_batch({"image": jnp.asarray(imgs)}, jax.random.PRNGKey(6))
    params = t.get_params({"image": imgs[0]})
    for i in range(2):
        ref = t.apply(imgs[i], **params)
        np.testing.assert_allclose(np.asarray(out["image"][i]), ref,
                                   atol=0.08)


def test_perspective_device_zero_scale_is_identity():
    gen = np.random.default_rng(29)
    from torchok_tpu.data.transforms.spatial import Perspective
    imgs = _img(gen, n=2, h=15, w=19)
    t = Perspective(scale=(0.0, 0.0), p=1.0)
    assert t.device_capable
    out = t.apply_batch({"image": jnp.asarray(imgs)}, jax.random.PRNGKey(7))
    np.testing.assert_allclose(np.asarray(out["image"]), imgs, atol=1e-4)


def test_perspective_kernel_matches_cv2_warp_perspective():
    gen = np.random.default_rng(30)
    from torchok_tpu.ops.warp import (perspective_from_points,
                                      perspective_sample)
    img = _img(gen, n=1, h=24, w=32)[0]
    src = np.float32([[0, 0], [32, 0], [32, 24], [0, 24]])
    dst = src + gen.uniform(-2.5, 2.5, (4, 2)).astype(np.float32)
    m_cv = cv2.getPerspectiveTransform(src, dst)
    m_j = np.asarray(perspective_from_points(jnp.asarray(src[None]),
                                             jnp.asarray(dst[None])))[0]
    np.testing.assert_allclose(m_j, m_cv, atol=1e-5)
    ref = cv2.warpPerspective(img, m_cv, (32, 24), flags=cv2.INTER_LINEAR)
    ours = np.asarray(perspective_sample(jnp.asarray(img[None]),
                                         jnp.asarray(m_j[None]), (24, 32)))
    np.testing.assert_allclose(ours[0], ref, atol=0.08)


def test_new_geometry_p_zero_is_identity_on_device():
    gen = np.random.default_rng(31)
    from torchok_tpu.data.transforms.spatial import (Affine, ElasticTransform,
                                                     GridDistortion,
                                                     OpticalDistortion,
                                                     Perspective, SafeRotate)
    imgs = _img(gen, n=2, h=12, w=16)
    for t in [Affine(rotate=30, p=0.0), SafeRotate(limit=45, p=0.0),
              ElasticTransform(alpha=30.0, sigma=3.0, p=0.0),
              GridDistortion(p=0.0), OpticalDistortion(p=0.0),
              Perspective(p=0.0)]:
        out = t.apply_batch({"image": jnp.asarray(imgs)},
                            jax.random.PRNGKey(8))
        np.testing.assert_allclose(np.asarray(out["image"]), imgs, atol=1e-5,
                                   err_msg=type(t).__name__)
