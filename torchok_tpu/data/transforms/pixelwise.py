"""Pixelwise transforms — most are device-capable.

The device path (``apply_batch``) operates on an NHWC jnp batch with
per-sample randomness from a folded JAX key; XLA fuses the whole suffix into
a handful of elementwise kernels executed on-TPU ahead of the train step —
this replaces the reference's per-sample CPU Albumentations execution for
the photometric part of the pipeline (SURVEY.md §2.9, §7.4). Each op also
implements the numpy host path so exotic compositions (inside OneOf etc.)
still work per-sample.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from torchok_tpu.constructor import TRANSFORMS
from torchok_tpu.data.transforms.base import BaseTransform

_RGB_WEIGHTS = np.array([0.299, 0.587, 0.114], dtype=np.float32)


def _bernoulli_mask(rng, batch_size: int, p: float):
    m = jax.random.bernoulli(rng, p, (batch_size,))
    return m.reshape((batch_size,) + (1,) * 3)


def _reflect101_pad(x, axis, r, hi=None):
    """Reflect-101 (cv2 BORDER_DEFAULT) padding by ``r`` below / ``hi``
    (default ``r``) above one axis. Take-based periodic mirror, so radii
    larger than the axis keep cv2's wrap-around semantics where
    ``jnp.pad(mode='reflect')`` raises (elastic sigma 50 on small crops,
    big blurs on thumbnails).
    Coordinate-space twin: torchok_tpu/ops/warp.py::_reflect101."""
    hi = r if hi is None else hi
    if r == 0 and hi == 0:
        return x
    n = x.shape[axis]
    idx = np.arange(-r, n + hi)
    period = max(2 * (n - 1), 1)
    idx = np.abs(idx) % period
    idx = np.where(idx >= n, period - idx, idx)
    return jnp.take(x, jnp.asarray(idx), axis=axis)


def _sep_filter_per_sample(img, kh, kw):
    """Separable depthwise filtering with PER-SAMPLE 1D kernels and
    reflect-101 borders (cv2's BORDER_DEFAULT), over an NHWC f32 batch.

    ``kh``/``kw`` are ``(B, K)`` odd-length kernels. Taps beyond a sample's
    chosen radius are zero: they read reflect-padded pixels but contribute
    nothing, so a single max-radius pad serves every per-sample kernel size
    exactly (reflect-101 at offset d returns pixel d for any d <= pad).
    Runs as one grouped conv per axis (one kernel per (sample, channel))."""
    b, h, w, c = img.shape
    out = img
    for axis, k in ((1, kh), (2, kw)):
        r = (k.shape[1] - 1) // 2
        if r == 0:
            continue
        x = _reflect101_pad(out, axis, r)
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(
            1, b * c, x.shape[1], x.shape[2])
        rhs = jnp.broadcast_to(k[:, None, :].astype(jnp.float32),
                               (b, c, k.shape[1])).reshape(b * c, 1, -1)
        rhs = rhs[:, :, :, None] if axis == 1 else rhs[:, :, None, :]
        y = jax.lax.conv_general_dilated(
            x, rhs, window_strides=(1, 1), padding="VALID",
            feature_group_count=b * c,
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        out = jnp.transpose(y.reshape(b, c, h, w), (0, 2, 3, 1))
    return out


def _fixed_filter2d(img, kernel):
    """cv2.filter2D semantics (correlation, reflect-101 border) with one
    shared 2D kernel, depthwise over an NHWC f32 batch."""
    kernel = jnp.asarray(kernel, jnp.float32)
    kh, kw = kernel.shape
    c = img.shape[3]
    x = _reflect101_pad(_reflect101_pad(img, 1, kh // 2), 2, kw // 2)
    x = jnp.transpose(x, (0, 3, 1, 2))
    rhs = jnp.broadcast_to(kernel[None, None], (c, 1, kh, kw))
    y = jax.lax.conv_general_dilated(
        x, rhs, window_strides=(1, 1), padding="VALID",
        feature_group_count=c,
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return jnp.transpose(y, (0, 2, 3, 1))


def _filter2d_per_sample(img, kernels):
    """cv2.filter2D semantics (correlation, reflect-101 border) with a
    PER-SAMPLE non-separable 2D kernel, over an NHWC f32 batch.

    ``kernels`` is ``(B, K, K)`` with K odd; taps beyond a sample's chosen
    radius must already be zero (they read reflect-padded pixels but
    contribute nothing, exactly like :func:`_sep_filter_per_sample`).
    Runs as one grouped conv (one kernel per (sample, channel))."""
    b, h, w, c = img.shape
    k = kernels.shape[1]
    r = (k - 1) // 2
    if r == 0:
        return img * kernels[:, 0, 0][:, None, None, None]
    x = _reflect101_pad(_reflect101_pad(img, 1, r), 2, r)
    x = jnp.transpose(x, (0, 3, 1, 2)).reshape(
        1, b * c, h + 2 * r, w + 2 * r)
    rhs = jnp.broadcast_to(kernels[:, None].astype(jnp.float32),
                           (b, c, k, k)).reshape(b * c, 1, k, k)
    y = jax.lax.conv_general_dilated(
        x, rhs, window_strides=(1, 1), padding="VALID",
        feature_group_count=b * c,
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return jnp.transpose(y.reshape(b, c, h, w), (0, 2, 3, 1))


def _median_filter_per_sample(img, radii, max_r):
    """Median filter with PER-SAMPLE odd kernel sizes (2*radii+1) over an
    NHWC batch, cv2.medianBlur semantics (BORDER_REPLICATE).

    One sort serves every per-sample size: the (2*max_r+1)^2 shifted views
    are stacked, taps outside a sample's radius are replaced by +/- sentinels
    split evenly between the two tails (the invalid ring is centrally
    symmetric, so pairing (dy,dx) with (-dy,-dx) splits it exactly in half),
    which leaves the valid taps' median at the fixed middle index."""
    b, h, w, c = img.shape
    k = 2 * max_r + 1
    if max_r == 0:
        return img
    if jnp.issubdtype(img.dtype, jnp.integer):
        x = img.astype(jnp.int32)
        # sentinels must sit strictly outside ANY image dtype's value range
        # (int16 images carry values below -1) so invalid taps sort to the
        # tails, never into the middle of the valid values
        lo_s, hi_s = jnp.asarray(-(1 << 20)), jnp.asarray(1 << 20)
    else:
        x = img.astype(jnp.float32)
        lo_s, hi_s = jnp.asarray(-jnp.inf), jnp.asarray(jnp.inf)
    xp = jnp.pad(x, ((0, 0), (max_r, max_r), (max_r, max_r), (0, 0)),
                 mode="edge")
    views, offs = [], []
    for dy in range(-max_r, max_r + 1):
        for dx in range(-max_r, max_r + 1):
            views.append(jax.lax.dynamic_slice(
                xp, (0, max_r + dy, max_r + dx, 0), (b, h, w, c)))
            offs.append((dy, dx))
    st = jnp.stack(views, axis=-1)  # (B, H, W, C, K^2)
    offs = np.asarray(offs)  # (K^2, 2)
    ring = np.abs(offs).max(axis=1)  # Chebyshev ring of each tap
    neg_half = (offs[:, 0] < 0) | ((offs[:, 0] == 0) & (offs[:, 1] < 0))
    valid = jnp.asarray(ring)[None, :] <= radii[:, None]  # (B, K^2)
    sentinel = jnp.where(jnp.asarray(neg_half)[None, :], lo_s, hi_s)
    st = jnp.where(valid[:, None, None, None, :], st,
                   sentinel[:, None, None, None, :].astype(st.dtype))
    med = jnp.sort(st, axis=-1)[..., (k * k) // 2]
    return med.astype(img.dtype)


def _box_kernels(radii, max_r):
    """(B,) radii -> (B, 2*max_r+1) normalized box kernels."""
    pos = jnp.abs(jnp.arange(-max_r, max_r + 1))
    mask = (pos[None, :] <= radii[:, None]).astype(jnp.float32)
    return mask / mask.sum(axis=1, keepdims=True)


# cv2.getGaussianKernel uses fixed binomial tables for ksize<=7 when sigma<=0
_CV2_SMALL_GAUSS = {
    0: np.array([1.0], np.float32),
    1: np.array([0.25, 0.5, 0.25], np.float32),
    2: np.array([0.0625, 0.25, 0.375, 0.25, 0.0625], np.float32),
    3: np.array([0.03125, 0.109375, 0.21875, 0.28125,
                 0.21875, 0.109375, 0.03125], np.float32),
}


def _gauss_kernels(radii, sigmas, max_r):
    """(B,) radii + sigmas -> (B, 2*max_r+1) gaussian kernels with cv2
    getGaussianKernel semantics: sigma<=0 derives sigma from ksize, and
    ksize<=7 with sigma<=0 uses cv2's hardcoded binomial tables."""
    pos = jnp.arange(-max_r, max_r + 1).astype(jnp.float32)
    rf = radii.astype(jnp.float32)
    sigma_auto = 0.3 * ((2.0 * rf + 1.0 - 1.0) * 0.5 - 1.0) + 0.8
    sig = jnp.where(sigmas > 0, sigmas, sigma_auto)
    w = jnp.exp(-0.5 * (pos[None, :] / sig[:, None]) ** 2)
    w = w * (jnp.abs(pos)[None, :] <= radii[:, None])
    w = w / w.sum(axis=1, keepdims=True)
    n_tab = min(max_r, 3) + 1
    table = np.zeros((n_tab, 2 * max_r + 1), np.float32)
    for r in range(n_tab):
        table[r, max_r - r:max_r + r + 1] = _CV2_SMALL_GAUSS[r]
    tab = jnp.asarray(table)[jnp.clip(radii, 0, n_tab - 1)]
    w = jnp.where(((sigmas <= 0) & (radii <= 3))[:, None], tab, w)
    return w


def _quantize_u8(x):
    """Float -> uint8-valued float with cv2-style saturate (round-half-up is
    within 1 LSB of cvRound's half-to-even; parity tests use atol 1)."""
    return jnp.floor(jnp.clip(x, 0, 255) + 0.5)


def _saturate_int(x, dtype, round_half_up=False):
    """cv2-style saturate_cast of a float result to an integer image dtype.

    cv2 filtering/warping preserves the input dtype and saturates to ITS
    range (uint16 -> [0, 65535], int16 -> [-32768, 32767]) — clamping to
    [0, 255] is only correct for uint8. ``round_half_up`` matches cvRound
    within 1 LSB; without it the cast truncates (np.clip().astype parity).
    """
    info = np.iinfo(np.dtype(dtype))
    x = jnp.clip(x, info.min, info.max)
    if round_half_up:
        x = jnp.floor(x + 0.5)
    return x.astype(dtype)


@TRANSFORMS.register_class
class Normalize(BaseTransform):
    """Albumentations Normalize: (x - mean*max_pixel) / (std*max_pixel)."""

    device_preserves_dtype = False
    always_apply = True
    device_capable = True

    def __init__(self, mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225),
                 max_pixel_value: float = 255.0, always_apply: bool = False,
                 p: float = 1.0, **_):
        super().__init__(always_apply, p)
        self.mean = np.array(mean, np.float32)
        self.std = np.array(std, np.float32)
        self.max_pixel_value = max_pixel_value

    def apply(self, image, **params):
        img = image.astype(np.float32)
        return (img - self.mean * self.max_pixel_value) / (self.std * self.max_pixel_value)

    def apply_batch(self, batch, rng):
        img = batch["image"].astype(jnp.float32)
        mean = jnp.asarray(self.mean * self.max_pixel_value)
        inv_std = jnp.asarray(1.0 / (self.std * self.max_pixel_value))
        batch = dict(batch)
        batch["image"] = (img - mean) * inv_std
        return batch


@TRANSFORMS.register_class
class ToTensorV2(BaseTransform):
    """Layout/dtype boundary. The torch original moves HWC->CHW; on TPU the
    native layout IS HWC, so this is a dtype cast + mask passthrough only
    (the YAML surface keeps the name)."""

    device_preserves_dtype = False
    always_apply = True
    device_capable = True

    def __init__(self, transpose_mask: bool = False, always_apply: bool = False,
                 p: float = 1.0, **_):
        super().__init__(always_apply, p)
        self.transpose_mask = transpose_mask

    def apply(self, image, **params):
        return image

    def apply_batch(self, batch, rng):
        batch = dict(batch)
        img = batch["image"]
        if not jnp.issubdtype(img.dtype, jnp.floating):
            img = img.astype(jnp.float32)
        batch["image"] = img
        return batch


@TRANSFORMS.register_class
class HorizontalFlip(BaseTransform):
    geometric = True
    device_capable = True
    device_bbox_safe = False

    def apply(self, image, **params):
        return np.ascontiguousarray(image[:, ::-1])

    def apply_to_mask(self, mask, **params):
        return np.ascontiguousarray(mask[:, ::-1])

    def apply_to_bboxes(self, bboxes, image_shape, **params):
        b = np.asarray(bboxes, np.float32).reshape(-1, 4).copy()
        w = image_shape[1]
        b[:, [0, 2]] = w - b[:, [2, 0]]
        return b

    def apply_batch(self, batch, rng):
        batch = dict(batch)
        img = batch["image"]
        m = _bernoulli_mask(rng, img.shape[0], self.p)
        batch["image"] = jnp.where(m, img[:, :, ::-1], img)
        if batch.get("mask") is not None and "mask" in batch:
            mask = batch["mask"]
            mm = m.reshape((img.shape[0],) + (1,) * (mask.ndim - 1))
            batch["mask"] = jnp.where(mm, mask[:, :, ::-1], mask)
        return batch


@TRANSFORMS.register_class
class VerticalFlip(BaseTransform):
    geometric = True
    device_capable = True
    device_bbox_safe = False

    def apply(self, image, **params):
        return np.ascontiguousarray(image[::-1])

    def apply_to_mask(self, mask, **params):
        return np.ascontiguousarray(mask[::-1])

    def apply_to_bboxes(self, bboxes, image_shape, **params):
        b = np.asarray(bboxes, np.float32).reshape(-1, 4).copy()
        h = image_shape[0]
        b[:, [1, 3]] = h - b[:, [3, 1]]
        return b

    def apply_batch(self, batch, rng):
        batch = dict(batch)
        img = batch["image"]
        m = _bernoulli_mask(rng, img.shape[0], self.p)
        batch["image"] = jnp.where(m, img[:, ::-1], img)
        if batch.get("mask") is not None and "mask" in batch:
            mask = batch["mask"]
            mm = m.reshape((img.shape[0],) + (1,) * (mask.ndim - 1))
            batch["mask"] = jnp.where(mm, mask[:, ::-1], mask)
        return batch


@TRANSFORMS.register_class
class Flip(BaseTransform):
    """Random flip: horizontal, vertical or both."""

    geometric = True
    device_capable = True
    device_bbox_safe = False

    def get_params(self, sample):
        return {"code": int(self.rng.integers(-1, 2))}

    def apply_batch(self, batch, rng):
        batch = dict(batch)
        img = batch["image"]
        n = img.shape[0]
        k_apply, k_code = jax.random.split(rng)
        m = jax.random.bernoulli(k_apply, self.p, (n,))
        code = jax.random.randint(k_code, (n,), -1, 2)
        do_h = m & ((code == 1) | (code == -1))
        do_v = m & ((code == 0) | (code == -1))

        def flip(x, do, axis):
            d = do.reshape((n,) + (1,) * (x.ndim - 1))
            return jnp.where(d, jnp.flip(x, axis), x)

        batch["image"] = flip(flip(img, do_h, 2), do_v, 1)
        if batch.get("mask") is not None and "mask" in batch:
            mask = batch["mask"]
            batch["mask"] = flip(flip(mask, do_h, 2), do_v, 1)
        return batch

    def apply(self, image, code=0, **params):
        return np.ascontiguousarray(cv2.flip(image, code))

    def apply_to_mask(self, mask, code=0, **params):
        return np.ascontiguousarray(cv2.flip(mask, code))

    def apply_to_bboxes(self, bboxes, image_shape, code=0, **params):
        b = np.asarray(bboxes, np.float32).reshape(-1, 4).copy()
        h, w = image_shape[:2]
        if code in (1, -1):  # cv2 code 1 = horizontal
            b[:, [0, 2]] = w - b[:, [2, 0]]
        if code in (0, -1):  # cv2 code 0 = vertical
            b[:, [1, 3]] = h - b[:, [3, 1]]
        return b


@TRANSFORMS.register_class
class RandomBrightnessContrast(BaseTransform):
    device_capable = True

    def __init__(self, brightness_limit=0.2, contrast_limit=0.2,
                 brightness_by_max: bool = True, always_apply: bool = False,
                 p: float = 0.5, **_):
        super().__init__(always_apply, p)
        def _pair(v):
            return (-v, v) if isinstance(v, (int, float)) else tuple(v)
        self.brightness_limit = _pair(brightness_limit)
        self.contrast_limit = _pair(contrast_limit)
        self.brightness_by_max = brightness_by_max

    def _transform(self, img, alpha, beta, max_value):
        img = img * alpha
        img = img + beta * (max_value if self.brightness_by_max else img.mean())
        return img

    def apply(self, image, **params):
        alpha = 1.0 + float(self.rng.uniform(*self.contrast_limit))
        beta = float(self.rng.uniform(*self.brightness_limit))
        max_value = 255.0 if image.dtype == np.uint8 else 1.0
        out = self._transform(image.astype(np.float32), alpha, beta, max_value)
        if image.dtype == np.uint8:
            return np.clip(out, 0, 255).astype(np.uint8)
        return out

    def apply_batch(self, batch, rng):
        batch = dict(batch)
        img = batch["image"]
        n = img.shape[0]
        r_apply, r_alpha, r_beta = jax.random.split(rng, 3)
        is_int = img.dtype == jnp.uint8  # host semantics branch on uint8, not any int
        max_value = 255.0 if is_int else 1.0
        x = img.astype(jnp.float32)
        alpha = 1.0 + jax.random.uniform(r_alpha, (n, 1, 1, 1),
                                         minval=self.contrast_limit[0],
                                         maxval=self.contrast_limit[1])
        beta = jax.random.uniform(r_beta, (n, 1, 1, 1),
                                  minval=self.brightness_limit[0],
                                  maxval=self.brightness_limit[1])
        out = x * alpha + beta * max_value
        m = _bernoulli_mask(r_apply, n, self.p)
        out = jnp.where(m, out, x)
        if is_int:
            out = jnp.clip(out, 0, 255).astype(img.dtype)
        batch["image"] = out
        return batch


@TRANSFORMS.register_class
class RandomBrightness(RandomBrightnessContrast):
    def __init__(self, limit=0.2, **kw):
        super().__init__(brightness_limit=limit, contrast_limit=0.0, **kw)


@TRANSFORMS.register_class
class RandomContrast(RandomBrightnessContrast):
    def __init__(self, limit=0.2, **kw):
        super().__init__(brightness_limit=0.0, contrast_limit=limit, **kw)


@TRANSFORMS.register_class
class GaussNoise(BaseTransform):
    device_capable = True

    def __init__(self, var_limit=(10.0, 50.0), mean: float = 0.0,
                 per_channel: bool = True, always_apply: bool = False,
                 p: float = 0.5, **_):
        super().__init__(always_apply, p)
        self.var_limit = (0, var_limit) if isinstance(var_limit, (int, float)) else tuple(var_limit)
        self.mean = mean
        self.per_channel = per_channel

    def apply(self, image, **params):
        var = self.rng.uniform(*self.var_limit)
        sigma = var ** 0.5
        shape = image.shape if self.per_channel else image.shape[:2] + (1,)
        noise = self.rng.normal(self.mean, sigma, shape).astype(np.float32)
        out = image.astype(np.float32) + noise
        if image.dtype == np.uint8:
            return np.clip(out, 0, 255).astype(np.uint8)
        return out

    def apply_batch(self, batch, rng):
        batch = dict(batch)
        img = batch["image"]
        n = img.shape[0]
        r_apply, r_var, r_noise = jax.random.split(rng, 3)
        var = jax.random.uniform(r_var, (n, 1, 1, 1), minval=self.var_limit[0],
                                 maxval=self.var_limit[1])
        noise = jax.random.normal(r_noise, img.shape) * jnp.sqrt(var) + self.mean
        x = img.astype(jnp.float32) + noise
        m = _bernoulli_mask(r_apply, n, self.p)
        out = jnp.where(m, x, img.astype(jnp.float32))
        if img.dtype == jnp.uint8:  # host clips+casts uint8 only; other dtypes stay float
            out = jnp.clip(out, 0, 255).astype(img.dtype)
        batch["image"] = out
        return batch


@TRANSFORMS.register_class
class ColorJitter(BaseTransform):
    """Brightness/contrast/saturation/hue jitter (torchvision-style order)."""

    device_capable = True

    def __init__(self, brightness=0.2, contrast=0.2, saturation=0.2, hue=0.2,
                 always_apply: bool = False, p: float = 0.5, **_):
        super().__init__(always_apply, p)
        def _range(v, center=1.0, bound=None):
            if isinstance(v, (int, float)):
                lo, hi = center - v, center + v
            else:
                lo, hi = v
            if bound is not None:
                lo, hi = max(lo, bound[0]), min(hi, bound[1])
            return (max(lo, 0.0) if center == 1.0 else lo, hi)
        self.brightness = _range(brightness)
        self.contrast = _range(contrast)
        self.saturation = _range(saturation)
        self.hue = _range(hue, center=0.0, bound=(-0.5, 0.5))

    def _jitter(self, x, fb, fc, fs, fh, max_value):
        # brightness
        x = x * fb
        # contrast (around luminance mean)
        gray = jnp.sum(x * jnp.asarray(_RGB_WEIGHTS), axis=-1, keepdims=True)
        mean = jnp.mean(gray, axis=(-3, -2), keepdims=True)
        x = x * fc + mean * (1.0 - fc)
        # saturation
        x = x * fs + gray * (1.0 - fs)
        # hue via YIQ-ish rotation approximation on RGB
        theta = fh * 2.0 * jnp.pi
        cos_h, sin_h = jnp.cos(theta), jnp.sin(theta)
        one_third = 1.0 / 3.0
        sqrt_third = jnp.sqrt(1.0 / 3.0)
        a = cos_h + (1.0 - cos_h) * one_third
        b = one_third * (1.0 - cos_h) - sqrt_third * sin_h
        c = one_third * (1.0 - cos_h) + sqrt_third * sin_h
        r, g, bl = x[..., 0:1], x[..., 1:2], x[..., 2:3]
        x = jnp.concatenate([
            r * a + g * b + bl * c,
            r * c + g * a + bl * b,
            r * b + g * c + bl * a,
        ], axis=-1)
        return jnp.clip(x, 0.0, max_value)

    def apply(self, image, **params):
        fb = float(self.rng.uniform(*self.brightness))
        fc = float(self.rng.uniform(*self.contrast))
        fs = float(self.rng.uniform(*self.saturation))
        fh = float(self.rng.uniform(*self.hue))
        max_value = 255.0 if image.dtype == np.uint8 else 1.0
        out = np.asarray(self._jitter(jnp.asarray(image, jnp.float32), fb, fc, fs, fh, max_value))
        if image.dtype == np.uint8:
            return out.astype(np.uint8)
        return out

    def apply_batch(self, batch, rng):
        batch = dict(batch)
        img = batch["image"]
        n = img.shape[0]
        ra, rb, rc, rs, rh = jax.random.split(rng, 5)
        is_int = img.dtype == jnp.uint8  # host semantics branch on uint8, not any int
        max_value = 255.0 if is_int else 1.0
        shape = (n, 1, 1, 1)
        fb = jax.random.uniform(rb, shape, minval=self.brightness[0], maxval=self.brightness[1])
        fc = jax.random.uniform(rc, shape, minval=self.contrast[0], maxval=self.contrast[1])
        fs = jax.random.uniform(rs, shape, minval=self.saturation[0], maxval=self.saturation[1])
        fh = jax.random.uniform(rh, shape, minval=self.hue[0], maxval=self.hue[1])
        x = img.astype(jnp.float32)
        out = self._jitter(x, fb, fc, fs, fh, max_value)
        m = _bernoulli_mask(ra, n, self.p)
        out = jnp.where(m, out, x)
        if is_int:
            out = out.astype(img.dtype)
        batch["image"] = out
        return batch


@TRANSFORMS.register_class
class CoarseDropout(BaseTransform):
    device_capable = True

    def __init__(self, max_holes: int = 8, max_height: int = 8, max_width: int = 8,
                 min_holes: Optional[int] = None, min_height: Optional[int] = None,
                 min_width: Optional[int] = None, fill_value: float = 0,
                 mask_fill_value: Optional[float] = None,
                 always_apply: bool = False, p: float = 0.5, **_):
        super().__init__(always_apply, p)
        self.max_holes = max_holes
        self.max_height = max_height
        self.max_width = max_width
        self.min_holes = min_holes or max_holes
        self.min_height = min_height or max_height
        self.min_width = min_width or max_width
        self.fill_value = fill_value
        self.mask_fill_value = mask_fill_value

    def apply(self, image, **params):
        h, w = image.shape[:2]
        out = image.copy()
        n_holes = int(self.rng.integers(self.min_holes, self.max_holes + 1))
        for _ in range(n_holes):
            hh = int(self.rng.integers(self.min_height, self.max_height + 1))
            ww = int(self.rng.integers(self.min_width, self.max_width + 1))
            y = int(self.rng.integers(0, max(h - hh, 0) + 1))
            x = int(self.rng.integers(0, max(w - ww, 0) + 1))
            out[y:y + hh, x:x + ww] = self.fill_value
        return out

    def apply_batch(self, batch, rng):
        batch = dict(batch)
        img = batch["image"]
        n, h, w = img.shape[:3]
        r_apply, r_pos, r_size = jax.random.split(rng, 3)
        k = self.max_holes
        ys = jax.random.uniform(r_pos, (n, k, 1))
        xs = jax.random.uniform(jax.random.fold_in(r_pos, 1), (n, k, 1))
        hh = jax.random.randint(r_size, (n, k, 1), self.min_height, self.max_height + 1)
        ww = jax.random.randint(jax.random.fold_in(r_size, 1), (n, k, 1),
                                self.min_width, self.max_width + 1)
        y0 = (ys[..., 0] * (h - hh[..., 0])).astype(jnp.int32)
        x0 = (xs[..., 0] * (w - ww[..., 0])).astype(jnp.int32)
        rows = jnp.arange(h)[None, None, :]
        cols = jnp.arange(w)[None, None, :]
        row_in = (rows >= y0[:, :, None]) & (rows < (y0 + hh[..., 0])[:, :, None])  # (n,k,h)
        col_in = (cols >= x0[:, :, None]) & (cols < (x0 + ww[..., 0])[:, :, None])  # (n,k,w)
        hole = jnp.any(row_in[:, :, :, None] & col_in[:, :, None, :], axis=1)  # (n,h,w)
        m = _bernoulli_mask(r_apply, n, self.p)[..., 0]  # (n,1,1)
        hole = hole & m.astype(bool)
        batch["image"] = jnp.where(hole[..., None], jnp.asarray(self.fill_value, img.dtype), img)
        if "mask" in batch and batch["mask"] is not None and self.mask_fill_value is not None:
            mask = batch["mask"]
            mh = hole if mask.ndim == 3 else hole[..., None]
            batch["mask"] = jnp.where(mh, jnp.asarray(self.mask_fill_value, mask.dtype), mask)
        return batch


@TRANSFORMS.register_class
class Cutout(CoarseDropout):
    def __init__(self, num_holes: int = 8, max_h_size: int = 8, max_w_size: int = 8,
                 fill_value: float = 0, always_apply: bool = False, p: float = 0.5, **_):
        super().__init__(max_holes=num_holes, max_height=max_h_size,
                         max_width=max_w_size, fill_value=fill_value,
                         always_apply=always_apply, p=p)


@TRANSFORMS.register_class
class InvertImg(BaseTransform):
    device_capable = True

    def apply(self, image, **params):
        max_value = 255 if image.dtype == np.uint8 else 1.0
        return (max_value - image).astype(image.dtype)

    def apply_batch(self, batch, rng):
        batch = dict(batch)
        img = batch["image"]
        max_value = 255 if img.dtype == jnp.uint8 else 1.0
        m = _bernoulli_mask(rng, img.shape[0], self.p)
        batch["image"] = jnp.where(m, max_value - img, img)
        return batch


@TRANSFORMS.register_class
class ToGray(BaseTransform):
    device_capable = True

    def apply(self, image, **params):
        gray = cv2.cvtColor(image, cv2.COLOR_RGB2GRAY)
        return cv2.cvtColor(gray, cv2.COLOR_GRAY2RGB)

    def apply_batch(self, batch, rng):
        batch = dict(batch)
        img = batch["image"]
        x = img.astype(jnp.float32)
        gray = jnp.sum(x * jnp.asarray(_RGB_WEIGHTS), axis=-1, keepdims=True)
        gray = jnp.broadcast_to(gray, x.shape)
        m = _bernoulli_mask(rng, img.shape[0], self.p)
        out = jnp.where(m, gray, x)
        batch["image"] = out.astype(img.dtype)
        return batch


@TRANSFORMS.register_class
class RandomGamma(BaseTransform):
    device_capable = True

    def __init__(self, gamma_limit=(80, 120), always_apply: bool = False,
                 p: float = 0.5, **_):
        super().__init__(always_apply, p)
        self.gamma_limit = tuple(gamma_limit)

    def apply(self, image, **params):
        gamma = self.rng.uniform(*self.gamma_limit) / 100.0
        if image.dtype == np.uint8:
            table = ((np.arange(256) / 255.0) ** gamma * 255).astype(np.uint8)
            return table[image]
        return np.power(image, gamma)

    def apply_batch(self, batch, rng):
        batch = dict(batch)
        img = batch["image"]
        n = img.shape[0]
        r_apply, r_gamma = jax.random.split(rng)
        gamma = jax.random.uniform(r_gamma, (n, 1, 1, 1),
                                   minval=self.gamma_limit[0] / 100.0,
                                   maxval=self.gamma_limit[1] / 100.0)
        is_int = img.dtype == jnp.uint8  # host semantics branch on uint8, not any int
        x = img.astype(jnp.float32) / (255.0 if is_int else 1.0)
        out = jnp.power(jnp.maximum(x, 1e-12), gamma)
        m = _bernoulli_mask(r_apply, n, self.p)
        out = jnp.where(m, out, x)
        if is_int:
            out = (out * 255.0).astype(img.dtype)
        batch["image"] = out
        return batch


@TRANSFORMS.register_class
class Solarize(BaseTransform):
    device_capable = True

    def __init__(self, threshold=128, always_apply: bool = False, p: float = 0.5, **_):
        super().__init__(always_apply, p)
        self.threshold = threshold

    def apply(self, image, **params):
        max_value = 255 if image.dtype == np.uint8 else 1.0
        return np.where(image >= self.threshold, max_value - image, image).astype(image.dtype)

    def apply_batch(self, batch, rng):
        batch = dict(batch)
        img = batch["image"]
        max_value = 255 if img.dtype == jnp.uint8 else 1.0
        sol = jnp.where(img >= self.threshold, max_value - img, img)
        m = _bernoulli_mask(rng, img.shape[0], self.p)
        batch["image"] = jnp.where(m, sol, img)
        return batch


@TRANSFORMS.register_class
class Posterize(BaseTransform):
    device_capable = True

    def __init__(self, num_bits: int = 4, always_apply: bool = False, p: float = 0.5, **_):
        super().__init__(always_apply, p)
        self.num_bits = num_bits

    def _mask_value(self):
        return np.uint8(255 ^ (2 ** (8 - self.num_bits) - 1))

    def apply(self, image, **params):
        return (image & self._mask_value()).astype(image.dtype)

    def apply_batch(self, batch, rng):
        batch = dict(batch)
        img = batch["image"]
        if not jnp.issubdtype(img.dtype, jnp.integer):
            return batch
        post = img & int(self._mask_value())
        m = _bernoulli_mask(rng, img.shape[0], self.p)
        batch["image"] = jnp.where(m, post, img)
        return batch


@TRANSFORMS.register_class
class ChannelShuffle(BaseTransform):
    device_capable = True

    def get_params(self, sample):
        c = sample["image"].shape[-1]
        return {"perm": self.rng.permutation(c)}

    def apply(self, image, perm=None, **params):
        return image[..., perm]

    def apply_batch(self, batch, rng):
        batch = dict(batch)
        img = batch["image"]
        n, _, _, c = img.shape
        r_apply, r_perm = jax.random.split(rng)
        # argsort of iid uniforms = a uniformly random permutation per sample
        perm = jnp.argsort(jax.random.uniform(r_perm, (n, c)), axis=1)
        shuffled = jnp.take_along_axis(img, perm[:, None, None, :], axis=3)
        m = _bernoulli_mask(r_apply, n, self.p)
        batch["image"] = jnp.where(m, shuffled, img)
        return batch


@TRANSFORMS.register_class
class RGBShift(BaseTransform):
    device_capable = True

    def __init__(self, r_shift_limit=20, g_shift_limit=20, b_shift_limit=20,
                 always_apply: bool = False, p: float = 0.5, **_):
        super().__init__(always_apply, p)
        def _pair(v):
            return (-v, v) if isinstance(v, (int, float)) else tuple(v)
        self.limits = [_pair(r_shift_limit), _pair(g_shift_limit), _pair(b_shift_limit)]

    def apply(self, image, **params):
        shifts = np.array([self.rng.uniform(*l) for l in self.limits], np.float32)
        out = image.astype(np.float32) + shifts
        if image.dtype == np.uint8:
            return np.clip(out, 0, 255).astype(np.uint8)
        return out

    def apply_batch(self, batch, rng):
        batch = dict(batch)
        img = batch["image"]
        n = img.shape[0]
        r_apply, r_shift = jax.random.split(rng)
        lo = jnp.asarray([l[0] for l in self.limits])
        hi = jnp.asarray([l[1] for l in self.limits])
        shifts = jax.random.uniform(r_shift, (n, 1, 1, 3)) * (hi - lo) + lo
        x = img.astype(jnp.float32) + shifts
        m = _bernoulli_mask(r_apply, n, self.p)
        out = jnp.where(m, x, img.astype(jnp.float32))
        if img.dtype == jnp.uint8:  # host clips+casts uint8 only; other dtypes stay float
            out = jnp.clip(out, 0, 255).astype(img.dtype)
        batch["image"] = out
        return batch


@TRANSFORMS.register_class
class ToFloat(BaseTransform):
    device_preserves_dtype = False
    always_apply = True
    device_capable = True

    def __init__(self, max_value: Optional[float] = None, always_apply: bool = False,
                 p: float = 1.0, **_):
        super().__init__(always_apply, p)
        self.max_value = max_value

    def apply(self, image, **params):
        mv = self.max_value or (255.0 if image.dtype == np.uint8 else 1.0)
        return image.astype(np.float32) / mv

    def apply_batch(self, batch, rng):
        batch = dict(batch)
        img = batch["image"]
        mv = self.max_value or (255.0 if img.dtype == jnp.uint8 else 1.0)
        batch["image"] = img.astype(jnp.float32) / mv
        return batch


@TRANSFORMS.register_class
class FromFloat(BaseTransform):
    device_preserves_dtype = False
    always_apply = True
    device_capable = True

    def __init__(self, dtype: str = "uint16", max_value: Optional[float] = None,
                 always_apply: bool = False, p: float = 1.0, **_):
        super().__init__(always_apply, p)
        self.dtype = np.dtype(dtype)
        self.max_value = max_value

    def apply(self, image, **params):
        mv = self.max_value or np.iinfo(self.dtype).max
        return (image * mv).astype(self.dtype)

    def apply_batch(self, batch, rng):
        del rng  # deterministic (always_apply, like the host path)
        batch = dict(batch)
        mv = self.max_value or np.iinfo(self.dtype).max
        batch["image"] = (batch["image"] * mv).astype(self.dtype)
        return batch


# ---------------- filtering / color ops (host cv2 + device) ----------------

@TRANSFORMS.register_class
class Blur(BaseTransform):
    device_capable = True

    def __init__(self, blur_limit=7, always_apply: bool = False, p: float = 0.5, **_):
        super().__init__(always_apply, p)
        self.blur_limit = (3, blur_limit) if isinstance(blur_limit, int) else tuple(blur_limit)

    def get_params(self, sample):
        k = int(self.rng.integers(self.blur_limit[0] // 2, self.blur_limit[1] // 2 + 1)) * 2 + 1
        return {"ksize": k}

    def apply(self, image, ksize=3, **params):
        return cv2.blur(image, (ksize, ksize))

    def apply_batch(self, batch, rng):
        batch = dict(batch)
        img = batch["image"]
        n = img.shape[0]
        r_apply, r_k = jax.random.split(rng)
        lo, hi = self.blur_limit[0] // 2, self.blur_limit[1] // 2
        radii = jax.random.randint(r_k, (n,), lo, hi + 1)
        k = _box_kernels(radii, hi)
        x = _sep_filter_per_sample(img.astype(jnp.float32), k, k)
        m = _bernoulli_mask(r_apply, n, self.p)
        out = jnp.where(m, x, img.astype(jnp.float32))
        if jnp.issubdtype(img.dtype, jnp.integer):
            out = _saturate_int(out, img.dtype, round_half_up=True)
        batch["image"] = out
        return batch


@TRANSFORMS.register_class
class GaussianBlur(BaseTransform):
    device_capable = True

    def __init__(self, blur_limit=(3, 7), sigma_limit=0, always_apply: bool = False,
                 p: float = 0.5, **_):
        super().__init__(always_apply, p)
        self.blur_limit = (3, blur_limit) if isinstance(blur_limit, int) else tuple(blur_limit)
        self.sigma_limit = (0, sigma_limit) if isinstance(sigma_limit, (int, float)) else tuple(sigma_limit)

    def get_params(self, sample):
        k = int(self.rng.integers(self.blur_limit[0] // 2, self.blur_limit[1] // 2 + 1)) * 2 + 1
        sigma = float(self.rng.uniform(*self.sigma_limit))
        return {"ksize": k, "sigma": sigma}

    def apply(self, image, ksize=3, sigma=0.0, **params):
        return cv2.GaussianBlur(image, (ksize, ksize), sigmaX=sigma)

    def apply_batch(self, batch, rng):
        batch = dict(batch)
        img = batch["image"]
        n = img.shape[0]
        r_apply, r_k, r_sig = jax.random.split(rng, 3)
        lo, hi = self.blur_limit[0] // 2, self.blur_limit[1] // 2
        radii = jax.random.randint(r_k, (n,), lo, hi + 1)
        sigmas = jax.random.uniform(
            r_sig, (n,), minval=self.sigma_limit[0], maxval=self.sigma_limit[1])
        k = _gauss_kernels(radii, sigmas, hi)
        x = _sep_filter_per_sample(img.astype(jnp.float32), k, k)
        m = _bernoulli_mask(r_apply, n, self.p)
        out = jnp.where(m, x, img.astype(jnp.float32))
        if jnp.issubdtype(img.dtype, jnp.integer):
            out = _saturate_int(out, img.dtype, round_half_up=True)
        batch["image"] = out
        return batch


@TRANSFORMS.register_class
class MedianBlur(BaseTransform):
    device_capable = True

    def __init__(self, blur_limit=7, always_apply: bool = False, p: float = 0.5, **_):
        super().__init__(always_apply, p)
        self.blur_limit = (3, blur_limit) if isinstance(blur_limit, int) else tuple(blur_limit)

    def get_params(self, sample):
        k = int(self.rng.integers(self.blur_limit[0] // 2, self.blur_limit[1] // 2 + 1)) * 2 + 1
        return {"ksize": k}

    def apply(self, image, ksize=3, **params):
        return cv2.medianBlur(image, ksize)

    def apply_batch(self, batch, rng):
        batch = dict(batch)
        img = batch["image"]
        n = img.shape[0]
        r_apply, r_k = jax.random.split(rng)
        lo, hi = self.blur_limit[0] // 2, self.blur_limit[1] // 2
        radii = jax.random.randint(r_k, (n,), lo, hi + 1)
        x = _median_filter_per_sample(img, radii, hi)
        m = _bernoulli_mask(r_apply, n, self.p)
        batch["image"] = jnp.where(m, x, img)
        return batch


@TRANSFORMS.register_class
class MotionBlur(BaseTransform):
    device_capable = True

    def __init__(self, blur_limit=7, always_apply: bool = False, p: float = 0.5, **_):
        super().__init__(always_apply, p)
        self.blur_limit = (3, blur_limit) if isinstance(blur_limit, int) else tuple(blur_limit)

    def apply(self, image, **params):
        k = int(self.rng.integers(self.blur_limit[0] // 2, self.blur_limit[1] // 2 + 1)) * 2 + 1
        kernel = np.zeros((k, k), np.float32)
        if self.rng.random() < 0.5:
            kernel[k // 2, :] = 1.0
        else:
            kernel[:, k // 2] = 1.0
        kernel /= kernel.sum()
        return cv2.filter2D(image, -1, kernel)

    def apply_batch(self, batch, rng):
        batch = dict(batch)
        img = batch["image"]
        n = img.shape[0]
        r_apply, r_k, r_dir = jax.random.split(rng, 3)
        lo, hi = self.blur_limit[0] // 2, self.blur_limit[1] // 2
        radii = jax.random.randint(r_k, (n,), lo, hi + 1)
        box = _box_kernels(radii, hi)
        delta = (jnp.arange(-hi, hi + 1) == 0).astype(jnp.float32)
        delta = jnp.broadcast_to(delta, box.shape)
        # host: middle ROW filled -> averaging along width (horizontal smear)
        horiz = jax.random.bernoulli(r_dir, 0.5, (n,))[:, None]
        kh = jnp.where(horiz, delta, box)
        kw = jnp.where(horiz, box, delta)
        x = _sep_filter_per_sample(img.astype(jnp.float32), kh, kw)
        m = _bernoulli_mask(r_apply, n, self.p)
        out = jnp.where(m, x, img.astype(jnp.float32))
        if jnp.issubdtype(img.dtype, jnp.integer):
            out = _saturate_int(out, img.dtype, round_half_up=True)
        batch["image"] = out
        return batch


def _clahe_luts(hist, clip_limit, area):
    """cv2 CLAHE LUT build from per-tile histograms ``(..., 256)``, bit-exact
    (probed against cv2.createCLAHE across grids/claps/paddings): clip at
    max(int(clip*area/256), 1), redistribute the excess (bulk every bin +
    residual at stride max(256//residual, 1)), then
    lut = roundHalfEven(cdf * float32(255/area)). ``clip_limit`` broadcasts
    (per-sample random clip); counts are integer-valued f32 (exact —
    area <= tile pixels << 2^24)."""
    limit = jnp.maximum(jnp.trunc(clip_limit * (area / 256.0)), 1.0)
    hist = hist.astype(jnp.float32)
    clipped = jnp.minimum(hist, limit)
    excess = jnp.sum(hist - clipped, axis=-1, keepdims=True)
    redist = jnp.floor(excess / 256.0)
    residual = excess - redist * 256.0
    hist = clipped + redist
    step = jnp.maximum(jnp.floor(256.0 / jnp.maximum(residual, 1.0)), 1.0)
    i = jnp.arange(256, dtype=jnp.float32)
    bump = ((i % step) == 0) & ((i / step) < residual)
    cdf = jnp.cumsum(hist + bump.astype(jnp.float32), axis=-1)
    return jnp.clip(jnp.round(cdf * np.float32(255.0 / area)), 0, 255)


def _clahe_u8(v, clip_limit, grid):
    """cv2.createCLAHE().apply on a batched u8-valued channel ``v`` (n,h,w),
    bit-exact vs cv2 (f32 LUT scale, f32 interpolation weights, cvRound):
    pads bottom/right with reflect-101 by ``tiles - size%tiles`` — a FULL
    extra tile on a divisible dim when the other is ragged (cv2 quirk) —
    builds per-tile clipped LUTs and blends the 4 neighbouring tile LUTs
    bilinearly. ``grid`` is cv2's tileGridSize (tilesX, tilesY);
    ``clip_limit`` is (n,1,1)-broadcastable."""
    n, h, w = v.shape
    gw, gh = int(grid[0]), int(grid[1])
    if h % gh == 0 and w % gw == 0:
        vp = v
    else:
        vp = _reflect101_pad(v, 1, 0, gh - (h % gh))
        vp = _reflect101_pad(vp, 2, 0, gw - (w % gw))
    hp, wp = vp.shape[1], vp.shape[2]
    th, tw = hp // gh, wp // gw
    area = th * tw
    tiles = jnp.transpose(vp.reshape(n, gh, th, gw, tw), (0, 1, 3, 2, 4))
    flat = tiles.reshape(n * gh * gw, area).astype(jnp.int32)
    hist = jax.vmap(lambda t: jnp.bincount(t, length=256))(flat)
    luts = _clahe_luts(hist.reshape(n, gh, gw, 256),
                       jnp.asarray(clip_limit, jnp.float32).reshape(n, 1, 1, 1),
                       area)
    # interpolation coordinates are static (f32 like cv2's inv_th path)
    tyf = np.arange(h, dtype=np.float32) * np.float32(1.0 / th) \
        - np.float32(0.5)
    txf = np.arange(w, dtype=np.float32) * np.float32(1.0 / tw) \
        - np.float32(0.5)
    ty1 = np.floor(tyf).astype(np.int64)
    tx1 = np.floor(txf).astype(np.int64)
    ya = (tyf - ty1).astype(np.float32)[None, :, None]
    xa = (txf - tx1).astype(np.float32)[None, None, :]
    ty1c, ty2c = np.clip(ty1, 0, gh - 1), np.clip(ty1 + 1, 0, gh - 1)
    tx1c, tx2c = np.clip(tx1, 0, gw - 1), np.clip(tx1 + 1, 0, gw - 1)
    luts_flat = luts.reshape(n, gh * gw * 256)
    vi = v.astype(jnp.int32)

    def gather(tyc, txc):
        base = (tyc[:, None] * gw + txc[None, :]) * 256  # static (h, w)
        idx = jnp.asarray(base, jnp.int32)[None] + vi
        out = jnp.take_along_axis(luts_flat, idx.reshape(n, h * w), axis=1)
        return out.reshape(n, h, w)

    tl, tr = gather(ty1c, tx1c), gather(ty1c, tx2c)
    bl, br = gather(ty2c, tx1c), gather(ty2c, tx2c)
    one = np.float32(1.0)
    res = (tl * (one - xa) + tr * xa) * (one - ya) \
        + (bl * (one - xa) + br * xa) * ya
    return jnp.clip(jnp.round(res), 0, 255)


def _rgb_to_lab_f(imgf):
    """cv2 COLOR_RGB2LAB float semantics on a 0..1 tensor: L in [0,100],
    a/b signed (sRGB linearization — probed: cv2's Lab path gamma-corrects,
    via a spline LUT, hence the ~0.2 parity bound — then XYZ D65)."""
    lin = jnp.where(imgf <= 0.04045, imgf / 12.92,
                    ((imgf + 0.055) / 1.055) ** 2.4)
    m = np.array([[0.412453, 0.357580, 0.180423],
                  [0.212671, 0.715160, 0.072169],
                  [0.019334, 0.119193, 0.950227]], np.float32)
    xyz = lin @ m.T
    x = xyz[..., 0] / np.float32(0.950456)
    y = xyz[..., 1]
    z = xyz[..., 2] / np.float32(1.088754)
    t = 0.008856

    def f(v):
        return jnp.where(v > t, jnp.cbrt(v), 7.787 * v + (16.0 / 116.0))

    fx, fy, fz = f(x), f(y), f(z)
    ll = jnp.where(y > t, 116.0 * jnp.cbrt(y) - 16.0, 903.3 * y)
    return ll, 500.0 * (fx - fy), 200.0 * (fy - fz)


def _lab_f_to_rgb(ll, a, b):
    """cv2 COLOR_LAB2RGB float semantics (inverse of :func:`_rgb_to_lab_f`),
    output clipped to [0, 1]."""
    fy = (ll + 16.0) / 116.0
    fx = fy + a / 500.0
    fz = fy - b / 200.0
    t = 0.008856

    def finv(fv):
        return jnp.where(fv ** 3 > t, fv ** 3, (fv - 16.0 / 116.0) / 7.787)

    y = jnp.where(ll > 903.3 * t, fy ** 3, ll / 903.3)
    x = finv(fx) * np.float32(0.950456)
    z = finv(fz) * np.float32(1.088754)
    minv = np.array([[3.240479, -1.53715, -0.498535],
                     [-0.969256, 1.875991, 0.041556],
                     [0.055648, -0.204043, 1.057311]], np.float32)
    lin = jnp.clip(jnp.stack([x, y, z], axis=-1) @ minv.T, 0.0, 1.0)
    rgb = jnp.where(lin <= 0.0031308, lin * 12.92,
                    1.055 * lin ** (1.0 / 2.4) - 0.055)  # sRGB encode
    return jnp.clip(rgb, 0.0, 1.0)


@TRANSFORMS.register_class
class CLAHE(BaseTransform):
    """Contrast-limited adaptive histogram equalization on the LAB L channel
    (grayscale images equalize directly). The device path's CLAHE core is
    bit-exact vs cv2; the LAB round trip uses cv2's float formulas where the
    host uses cv2's u8 fixed-point tables, so end-to-end parity is
    tolerance-bounded (~2 LSB for 99%+ of pixels; tests pin it)."""

    def __init__(self, clip_limit=4.0, tile_grid_size=(8, 8),
                 always_apply: bool = False, p: float = 0.5, **_):
        super().__init__(always_apply, p)
        self.clip_limit = (1.0, clip_limit) if isinstance(clip_limit, (int, float)) else tuple(clip_limit)
        self.tile_grid_size = tuple(tile_grid_size)

    def apply(self, image, **params):
        clip = float(self.rng.uniform(*self.clip_limit))
        clahe = cv2.createCLAHE(clipLimit=clip, tileGridSize=self.tile_grid_size)
        if image.ndim == 2 or image.shape[-1] == 1:
            out = clahe.apply(image.reshape(image.shape[:2]))
            return out.reshape(image.shape)
        lab = cv2.cvtColor(image, cv2.COLOR_RGB2LAB)
        lab[..., 0] = clahe.apply(lab[..., 0])
        return cv2.cvtColor(lab, cv2.COLOR_LAB2RGB)

    device_capable = True

    def apply_batch(self, batch, rng):
        batch = dict(batch)
        img = batch["image"]
        if img.dtype != jnp.uint8:
            raise TypeError("CLAHE expects uint8 images (cv2 LAB parity); "
                            "place it before ToFloat")
        n, h, w, c = img.shape
        r_apply, r_clip = jax.random.split(rng)
        clip = jax.random.uniform(r_clip, (n,), minval=self.clip_limit[0],
                                  maxval=self.clip_limit[1])
        if c == 1:
            x = _clahe_u8(img[..., 0].astype(jnp.float32), clip,
                          self.tile_grid_size)[..., None]
        else:
            inv255 = np.float32(1.0 / 255.0)
            ll, a, b = _rgb_to_lab_f(img.astype(jnp.float32) * inv255)
            l8 = jnp.round(ll * np.float32(255.0 / 100.0))
            a8 = jnp.clip(jnp.round(a) + 128.0, 0, 255)  # host quantizes a/b
            b8 = jnp.clip(jnp.round(b) + 128.0, 0, 255)
            l8 = _clahe_u8(l8, clip, self.tile_grid_size)
            rgb = _lab_f_to_rgb(l8 * np.float32(100.0 / 255.0),
                                a8 - 128.0, b8 - 128.0)
            x = jnp.round(rgb * 255.0)
        m = _bernoulli_mask(r_apply, n, self.p)
        batch["image"] = jnp.where(m, x, img.astype(jnp.float32)) \
            .astype(jnp.uint8)
        return batch


@TRANSFORMS.register_class
class Equalize(BaseTransform):
    device_capable = True

    def apply(self, image, **params):
        if image.ndim == 2:
            return cv2.equalizeHist(image)
        out = image.copy()
        for c in range(image.shape[-1]):
            out[..., c] = cv2.equalizeHist(image[..., c])
        return out

    def apply_batch(self, batch, rng):
        batch = dict(batch)
        img = batch["image"]
        if img.dtype != jnp.uint8:
            raise TypeError("Equalize expects uint8 images; "
                            "place it before ToFloat")
        n, h, w, c = img.shape
        flat = jnp.transpose(img, (0, 3, 1, 2)).reshape(n, c, h * w)
        hist = jax.vmap(jax.vmap(
            lambda v: jnp.bincount(v, length=256)))(flat)
        cdf = jnp.cumsum(hist, axis=-1)
        total = h * w
        # cv2.equalizeHist: lut(i) = round((cdf(i)-cdf_min)*255/(total-cdf_min))
        # with cdf_min = cdf at the first non-zero bin; constant channels
        # pass through unchanged
        cdf_min = jnp.min(jnp.where(hist > 0, cdf, total + 1),
                          axis=-1, keepdims=True)
        denom = jnp.maximum(total - cdf_min, 1)
        lut = jnp.floor(jnp.clip(cdf - cdf_min, 0, None) * 255.0
                        / denom + 0.5)
        mapped = jnp.take_along_axis(lut, flat, axis=2)
        mapped = jnp.transpose(mapped.reshape(n, c, h, w), (0, 2, 3, 1))
        const_ch = (cdf_min[..., 0] >= total)  # (n, c)
        x = jnp.where(const_ch[:, None, None, :],
                      img.astype(jnp.float32), mapped)
        m = _bernoulli_mask(rng, n, self.p)
        batch["image"] = jnp.where(m, x, img.astype(jnp.float32)).astype(img.dtype)
        return batch


def _rgb_to_hsv_u8(imgf):
    """cv2 COLOR_RGB2HSV uint8 semantics on a float 0..255 tensor:
    H in [0,180) (degrees/2), S/V in [0,255] — all integer-valued floats."""
    r, g, b = imgf[..., 0], imgf[..., 1], imgf[..., 2]
    mx = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    delta = mx - mn
    safe = jnp.where(delta > 0, delta, 1.0)
    h = jnp.where(mx == r, (g - b) / safe,
                  jnp.where(mx == g, 2.0 + (b - r) / safe,
                            4.0 + (r - g) / safe))
    h = (h * 30.0) % 180.0
    h = jnp.where(delta > 0, h, 0.0)
    s = 255.0 * delta / jnp.where(mx > 0, mx, 1.0)
    return (jnp.floor(h + 0.5) % 180.0, jnp.floor(s + 0.5), mx)


def _hsv_u8_to_rgb(h, s, v):
    """cv2 COLOR_HSV2RGB uint8 semantics (H in [0,180))."""
    h60 = (h * 2.0) / 60.0
    i = jnp.floor(h60) % 6
    f = h60 - jnp.floor(h60)
    s01 = s / 255.0
    p = v * (1 - s01)
    q = v * (1 - s01 * f)
    t = v * (1 - s01 * (1 - f))
    sel = [i == 0, i == 1, i == 2, i == 3, i == 4]
    r = jnp.select(sel, [v, q, p, p, t], v)
    g = jnp.select(sel, [t, v, v, q, p], p)
    b = jnp.select(sel, [p, p, t, v, v], q)
    return jnp.stack([r, g, b], axis=-1)


def _rgb_to_hls_f(imgf):
    """cv2 COLOR_RGB2HLS float semantics on a 0..1 tensor: H in degrees
    [0, 360), L/S in [0, 1]."""
    r, g, b = imgf[..., 0], imgf[..., 1], imgf[..., 2]
    mx = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    diff = mx - mn
    ll = (mx + mn) * 0.5
    safe = jnp.where(diff > 0, diff, 1.0)
    s = jnp.where(ll < 0.5, diff / jnp.where(mx + mn > 0, mx + mn, 1.0),
                  diff / jnp.where(2.0 - mx - mn > 0, 2.0 - mx - mn, 1.0))
    h = jnp.where(mx == r, (g - b) / safe,
                  jnp.where(mx == g, 2.0 + (b - r) / safe,
                            4.0 + (r - g) / safe))
    h = (h * 60.0) % 360.0
    h = jnp.where(diff > 0, h, 0.0)
    s = jnp.where(diff > 0, s, 0.0)
    return h, ll, s


def _hls_f_to_rgb(h, ll, s):
    """cv2 COLOR_HLS2RGB float semantics (H in degrees)."""
    m2 = jnp.where(ll < 0.5, ll * (1.0 + s), ll + s - ll * s)
    m1 = 2.0 * ll - m2

    def hue2rgb(hd):
        hd = hd % 360.0
        return jnp.where(hd < 60.0, m1 + (m2 - m1) * hd / 60.0,
                         jnp.where(hd < 180.0, m2,
                                   jnp.where(hd < 240.0,
                                             m1 + (m2 - m1) * (240.0 - hd) / 60.0,
                                             m1)))

    r = hue2rgb(h + 120.0)
    g = hue2rgb(h)
    b = hue2rgb(h - 120.0)
    flat = s <= 0
    r = jnp.where(flat, ll, r)
    g = jnp.where(flat, ll, g)
    b = jnp.where(flat, ll, b)
    return jnp.stack([r, g, b], axis=-1)


@TRANSFORMS.register_class
class HueSaturationValue(BaseTransform):
    device_capable = True

    def __init__(self, hue_shift_limit=20, sat_shift_limit=30, val_shift_limit=20,
                 always_apply: bool = False, p: float = 0.5, **_):
        super().__init__(always_apply, p)
        def _pair(v):
            return (-v, v) if isinstance(v, (int, float)) else tuple(v)
        self.hue_shift_limit = _pair(hue_shift_limit)
        self.sat_shift_limit = _pair(sat_shift_limit)
        self.val_shift_limit = _pair(val_shift_limit)

    def apply(self, image, **params):
        hsv = cv2.cvtColor(image, cv2.COLOR_RGB2HSV).astype(np.int32)
        hsv[..., 0] = (hsv[..., 0] + int(self.rng.uniform(*self.hue_shift_limit))) % 180
        hsv[..., 1] = np.clip(hsv[..., 1] + int(self.rng.uniform(*self.sat_shift_limit)), 0, 255)
        hsv[..., 2] = np.clip(hsv[..., 2] + int(self.rng.uniform(*self.val_shift_limit)), 0, 255)
        return cv2.cvtColor(hsv.astype(np.uint8), cv2.COLOR_HSV2RGB)

    def apply_batch(self, batch, rng):
        batch = dict(batch)
        img = batch["image"]
        if img.dtype != jnp.uint8:
            raise TypeError("HueSaturationValue expects uint8 images "
                            "(cv2 HSV parity); place it before ToFloat")
        n = img.shape[0]
        r_apply, rh, rs, rv = jax.random.split(rng, 4)

        def shift(key, lim):  # host truncates via int()
            u = jax.random.uniform(key, (n, 1, 1),
                                   minval=lim[0], maxval=lim[1])
            return jnp.trunc(u)
        h, s, v = _rgb_to_hsv_u8(img.astype(jnp.float32))
        h = (h + shift(rh, self.hue_shift_limit)) % 180.0
        s = jnp.clip(s + shift(rs, self.sat_shift_limit), 0, 255)
        v = jnp.clip(v + shift(rv, self.val_shift_limit), 0, 255)
        x = _quantize_u8(_hsv_u8_to_rgb(h, s, v))
        m = _bernoulli_mask(r_apply, n, self.p)
        batch["image"] = jnp.where(m, x, img.astype(jnp.float32)).astype(img.dtype)
        return batch


@TRANSFORMS.register_class
class ImageCompression(BaseTransform):
    def __init__(self, quality_lower: int = 99, quality_upper: int = 100,
                 compression_type: int = 0, always_apply: bool = False,
                 p: float = 0.5, **_):
        super().__init__(always_apply, p)
        self.quality_lower = quality_lower
        self.quality_upper = quality_upper

    def apply(self, image, **params):
        q = int(self.rng.integers(self.quality_lower, self.quality_upper + 1))
        _, enc = cv2.imencode(".jpg", image, [cv2.IMWRITE_JPEG_QUALITY, q])
        dec = cv2.imdecode(enc, cv2.IMREAD_UNCHANGED)
        if dec.ndim == 2 and image.ndim == 3:
            dec = dec[..., None]
        return dec


@TRANSFORMS.register_class
class JpegCompression(ImageCompression):
    pass


@TRANSFORMS.register_class
class Downscale(BaseTransform):
    def __init__(self, scale_min: float = 0.25, scale_max: float = 0.25,
                 interpolation: int = cv2.INTER_NEAREST, always_apply: bool = False,
                 p: float = 0.5, **_):
        super().__init__(always_apply, p)
        self.scale_min, self.scale_max = scale_min, scale_max
        self.interpolation = interpolation
        # the device path composes the down+up NEAREST maps into one exact
        # integer gather; other interpolations stay on host
        self.device_capable = interpolation == cv2.INTER_NEAREST

    def apply(self, image, **params):
        s = float(self.rng.uniform(self.scale_min, self.scale_max))
        h, w = image.shape[:2]
        small = cv2.resize(image, (max(1, int(w * s)), max(1, int(h * s))),
                           interpolation=self.interpolation)
        return cv2.resize(small, (w, h), interpolation=self.interpolation)

    def apply_batch(self, batch, rng):
        batch = dict(batch)
        img = batch["image"]
        n, h, w, _ = img.shape
        r_apply, r_s = jax.random.split(rng)
        s = jax.random.uniform(r_s, (n,), minval=self.scale_min,
                               maxval=self.scale_max)
        hs = jnp.maximum(1, jnp.floor(h * s)).astype(jnp.int32)
        ws = jnp.maximum(1, jnp.floor(w * s)).astype(jnp.int32)
        # cv2 NEAREST: src = floor(dst * src/dst); down-then-up composes to
        # exact integer index math (no float rounding drift)
        y = jnp.arange(h, dtype=jnp.int32)
        iy = (((y[None, :] * hs[:, None]) // h) * h) // hs[:, None]
        x_ = jnp.arange(w, dtype=jnp.int32)
        ix = (((x_[None, :] * ws[:, None]) // w) * w) // ws[:, None]
        g = jnp.take_along_axis(img, iy[:, :, None, None], axis=1)
        g = jnp.take_along_axis(g, ix[:, None, :, None], axis=2)
        m = _bernoulli_mask(r_apply, n, self.p)
        batch["image"] = jnp.where(m, g, img)
        return batch


@TRANSFORMS.register_class
class Sharpen(BaseTransform):
    device_capable = True

    def __init__(self, alpha=(0.2, 0.5), lightness=(0.5, 1.0),
                 always_apply: bool = False, p: float = 0.5, **_):
        super().__init__(always_apply, p)
        self.alpha = tuple(alpha)
        self.lightness = tuple(lightness)

    def apply(self, image, **params):
        alpha = float(self.rng.uniform(*self.alpha))
        lightness = float(self.rng.uniform(*self.lightness))
        kernel = np.array([[-1, -1, -1], [-1, 8 + lightness, -1], [-1, -1, -1]], np.float32)
        sharp = cv2.filter2D(image, -1, kernel)
        out = (1 - alpha) * image.astype(np.float32) + alpha * sharp.astype(np.float32)
        if image.dtype == np.uint8:
            return np.clip(out, 0, 255).astype(np.uint8)
        return out

    def apply_batch(self, batch, rng):
        batch = dict(batch)
        img = batch["image"]
        n = img.shape[0]
        is_int = jnp.issubdtype(img.dtype, jnp.integer)
        imgf = img.astype(jnp.float32)
        r_apply, r_a, r_l = jax.random.split(rng, 3)
        alpha = jax.random.uniform(r_a, (n, 1, 1, 1),
                                   minval=self.alpha[0], maxval=self.alpha[1])
        light = jax.random.uniform(r_l, (n, 1, 1, 1),
                                   minval=self.lightness[0],
                                   maxval=self.lightness[1])
        # kernel = A + lightness*E_center: conv once with the shared A, the
        # per-sample center term is lightness * image
        base = np.array([[-1, -1, -1], [-1, 8, -1], [-1, -1, -1]], np.float32)
        sharp = _fixed_filter2d(imgf, base) + light * imgf
        if is_int:
            # host filter2D saturates to the INPUT dtype's range pre-blend
            sharp = _saturate_int(sharp, img.dtype,
                                  round_half_up=True).astype(jnp.float32)
        x = (1 - alpha) * imgf + alpha * sharp
        m = _bernoulli_mask(r_apply, n, self.p)
        out = jnp.where(m, x, imgf)
        if img.dtype == jnp.uint8:
            # host blend ends in np.clip(...).astype(uint8): truncation;
            # non-uint8 dtypes stay float like the host path
            out = jnp.clip(out, 0, 255).astype(img.dtype)
        batch["image"] = out
        return batch


@TRANSFORMS.register_class
class ToSepia(BaseTransform):
    device_capable = True

    _M = np.array([[0.393, 0.769, 0.189],
                   [0.349, 0.686, 0.168],
                   [0.272, 0.534, 0.131]], np.float32)

    def apply(self, image, **params):
        out = image.astype(np.float32) @ self._M.T
        if image.dtype == np.uint8:
            return np.clip(out, 0, 255).astype(np.uint8)
        return np.clip(out, 0, 1.0)

    def apply_batch(self, batch, rng):
        batch = dict(batch)
        img = batch["image"]
        n = img.shape[0]
        imgf = img.astype(jnp.float32)
        x = imgf @ jnp.asarray(self._M.T)
        is_int = img.dtype == jnp.uint8  # host semantics branch on uint8, not any int
        x = jnp.clip(x, 0, 255 if is_int else 1.0)
        m = _bernoulli_mask(rng, n, self.p)
        out = jnp.where(m, x, imgf if not is_int else jnp.clip(imgf, 0, 255))
        batch["image"] = out.astype(img.dtype) if is_int else out
        return batch


# ---------------------- extended photometric/effect ops ----------------------
# (completing the reference's registry surface, reference:
#  torchok/data/transforms/__init__.py:66-116)

def _to_float01(image):
    if image.dtype == np.uint8:
        return image.astype(np.float32) / 255.0, True
    return image.astype(np.float32), False


def _from_float01(img, was_uint8):
    if was_uint8:
        return np.clip(img * 255.0, 0, 255).astype(np.uint8)
    return img


@TRANSFORMS.register_class
class AdvancedBlur(BaseTransform):
    """Generalized-gaussian kernel blur with random anisotropy, rotation and
    multiplicative kernel noise."""

    device_capable = True

    def __init__(self, blur_limit=(3, 7), sigmaX_limit=(0.2, 1.0),
                 sigmaY_limit=(0.2, 1.0), rotate_limit=90,
                 beta_limit=(0.5, 8.0), noise_limit=(0.9, 1.1),
                 always_apply: bool = False, p: float = 0.5, **_):
        super().__init__(always_apply, p)
        self.blur_limit = (3, blur_limit) if isinstance(blur_limit, int) else tuple(blur_limit)
        self.sigmaX_limit = tuple(sigmaX_limit)
        self.sigmaY_limit = tuple(sigmaY_limit)
        self.rotate_limit = (-rotate_limit, rotate_limit) \
            if isinstance(rotate_limit, (int, float)) else tuple(rotate_limit)
        self.beta_limit = tuple(beta_limit)
        self.noise_limit = tuple(noise_limit)

    def apply(self, image, **params):
        k = int(self.rng.integers(self.blur_limit[0] // 2,
                                  self.blur_limit[1] // 2 + 1)) * 2 + 1
        sx = float(self.rng.uniform(*self.sigmaX_limit))
        sy = float(self.rng.uniform(*self.sigmaY_limit))
        angle = np.deg2rad(float(self.rng.uniform(*self.rotate_limit)))
        beta = float(self.rng.uniform(*self.beta_limit))
        ax = np.arange(k) - k // 2
        xx, yy = np.meshgrid(ax, ax)
        rx = xx * np.cos(angle) + yy * np.sin(angle)
        ry = -xx * np.sin(angle) + yy * np.cos(angle)
        d = (rx / sx) ** 2 + (ry / sy) ** 2
        kernel = np.exp(-0.5 * d ** beta)
        kernel *= self.rng.uniform(*self.noise_limit, size=kernel.shape)
        kernel /= kernel.sum()
        return cv2.filter2D(image, -1, kernel.astype(np.float32))

    def apply_batch(self, batch, rng):
        batch = dict(batch)
        img = batch["image"]
        n = img.shape[0]
        keys = jax.random.split(rng, 7)
        r_apply, r_k, r_sx, r_sy, r_ang, r_beta, r_noise = keys
        lo, hi = self.blur_limit[0] // 2, self.blur_limit[1] // 2
        radii = jax.random.randint(r_k, (n,), lo, hi + 1)
        sx = jax.random.uniform(r_sx, (n, 1, 1), minval=self.sigmaX_limit[0],
                                maxval=self.sigmaX_limit[1])
        sy = jax.random.uniform(r_sy, (n, 1, 1), minval=self.sigmaY_limit[0],
                                maxval=self.sigmaY_limit[1])
        ang = jnp.deg2rad(jax.random.uniform(
            r_ang, (n, 1, 1), minval=self.rotate_limit[0],
            maxval=self.rotate_limit[1]))
        beta = jax.random.uniform(r_beta, (n, 1, 1), minval=self.beta_limit[0],
                                  maxval=self.beta_limit[1])
        k = 2 * hi + 1
        ax = jnp.arange(-hi, hi + 1, dtype=jnp.float32)
        xx = jnp.broadcast_to(ax[None, None, :], (n, k, k))
        yy = jnp.broadcast_to(ax[None, :, None], (n, k, k))
        rx = xx * jnp.cos(ang) + yy * jnp.sin(ang)
        ry = -xx * jnp.sin(ang) + yy * jnp.cos(ang)
        d = (rx / sx) ** 2 + (ry / sy) ** 2
        kern = jnp.exp(-0.5 * d ** beta)
        kern = kern * jax.random.uniform(
            r_noise, (n, k, k), minval=self.noise_limit[0],
            maxval=self.noise_limit[1])
        valid = (jnp.abs(ax)[None, None, :] <= radii[:, None, None]) & \
            (jnp.abs(ax)[None, :, None] <= radii[:, None, None])
        kern = jnp.where(valid, kern, 0.0)
        kern = kern / kern.sum(axis=(1, 2), keepdims=True)
        x = _filter2d_per_sample(img.astype(jnp.float32), kern)
        m = _bernoulli_mask(r_apply, n, self.p)
        out = jnp.where(m, x, img.astype(jnp.float32))
        if jnp.issubdtype(img.dtype, jnp.integer):
            out = _saturate_int(out, img.dtype, round_half_up=True)
        batch["image"] = out
        return batch


@TRANSFORMS.register_class
class Defocus(BaseTransform):
    """Disk-kernel (defocus) blur."""

    device_capable = True

    def __init__(self, radius=(3, 10), alias_blur=(0.1, 0.5),
                 always_apply: bool = False, p: float = 0.5, **_):
        super().__init__(always_apply, p)
        self.radius = (1, radius) if isinstance(radius, int) else tuple(radius)
        self.alias_blur = tuple(alias_blur) if not isinstance(alias_blur, (int, float)) \
            else (alias_blur, alias_blur)

    def apply(self, image, **params):
        r = int(self.rng.integers(self.radius[0], self.radius[1] + 1))
        sigma = float(self.rng.uniform(*self.alias_blur))
        ax = np.arange(-r, r + 1)
        xx, yy = np.meshgrid(ax, ax)
        kernel = (xx ** 2 + yy ** 2 <= r ** 2).astype(np.float32)
        kernel = cv2.GaussianBlur(kernel, (3, 3), sigma)
        kernel /= kernel.sum()
        return cv2.filter2D(image, -1, kernel)

    def apply_batch(self, batch, rng):
        batch = dict(batch)
        img = batch["image"]
        n = img.shape[0]
        r_apply, r_r, r_sig = jax.random.split(rng, 3)
        radii = jax.random.randint(r_r, (n,), self.radius[0],
                                   self.radius[1] + 1)
        sigma = jax.random.uniform(r_sig, (n,), minval=self.alias_blur[0],
                                   maxval=self.alias_blur[1])
        big_r = self.radius[1]
        k = 2 * big_r + 1
        ax = jnp.arange(-big_r, big_r + 1, dtype=jnp.float32)
        disc = ((ax[None, None, :] ** 2 + ax[None, :, None] ** 2)
                <= (radii.astype(jnp.float32) ** 2)[:, None, None]
                ).astype(jnp.float32)
        # host blurs the (2r+1)^2 kernel image with cv2.GaussianBlur(.,(3,3),
        # sigma): formula taps [g,1,g]/(1+2g) (sigma>0 so no binomial table),
        # reflect-101 at the SUBGRID's border — emulate the reflection inside
        # each sample's valid (2r+1)^2 region of the max-size grid
        g = jnp.exp(-1.0 / (2.0 * sigma ** 2))
        w_side = (g / (1 + 2 * g))[:, None]
        w_mid = (1 / (1 + 2 * g))[:, None]
        e = jnp.arange(k)[None, :]
        off = big_r - radii[:, None]  # embedded index of local 0

        def blur_rows(kern):
            out = jnp.zeros_like(kern)
            for d in (-1, 0, 1):
                l = jnp.abs(e - off + d)
                l = jnp.where(l > 2 * radii[:, None],
                              4 * radii[:, None] - l, l)
                ee = jnp.clip(l + off, 0, k - 1)
                tap = jnp.take_along_axis(kern, ee[:, :, None], axis=1)
                out = out + (w_mid if d == 0 else w_side)[..., None] * tap
            return out

        kern = blur_rows(disc)
        kern = jnp.swapaxes(blur_rows(jnp.swapaxes(kern, 1, 2)), 1, 2)
        valid = (jnp.abs(ax)[None, None, :] <= radii[:, None, None]) & \
            (jnp.abs(ax)[None, :, None] <= radii[:, None, None])
        kern = jnp.where(valid, kern, 0.0)
        kern = kern / kern.sum(axis=(1, 2), keepdims=True)
        x = _filter2d_per_sample(img.astype(jnp.float32), kern)
        m = _bernoulli_mask(r_apply, n, self.p)
        out = jnp.where(m, x, img.astype(jnp.float32))
        if jnp.issubdtype(img.dtype, jnp.integer):
            out = _saturate_int(out, img.dtype, round_half_up=True)
        batch["image"] = out
        return batch


@TRANSFORMS.register_class
class ZoomBlur(BaseTransform):
    """Average of progressively zoomed-in frames."""

    @property
    def device_capable(self):
        # the frame count is bounded by ceil((max-1)/step_min); a zero/
        # degenerate step would make that bound unbatchable
        return self.step_factor[0] > 0

    def __init__(self, max_factor=1.31, step_factor=(0.01, 0.03),
                 always_apply: bool = False, p: float = 0.5, **_):
        super().__init__(always_apply, p)
        self.max_factor = (1.0, max_factor) if isinstance(max_factor, (int, float)) \
            else tuple(max_factor)
        self.step_factor = (step_factor, step_factor) \
            if isinstance(step_factor, (int, float)) else tuple(step_factor)

    def apply(self, image, **params):
        mf = float(self.rng.uniform(*self.max_factor))
        step = float(self.rng.uniform(*self.step_factor))
        h, w = image.shape[:2]
        img, was_uint8 = _to_float01(image)
        acc = img.copy()
        n = 1
        for factor in np.arange(1.0 + step, mf, step):
            zh, zw = int(round(h * factor)), int(round(w * factor))
            zoomed = cv2.resize(img, (zw, zh), interpolation=cv2.INTER_LINEAR)
            y0, x0 = (zh - h) // 2, (zw - w) // 2
            acc += zoomed[y0:y0 + h, x0:x0 + w]
            n += 1
        return _from_float01(acc / n, was_uint8)

    def apply_batch(self, batch, rng):
        from torchok_tpu.ops.warp import remap_sample

        batch = dict(batch)
        img = batch["image"]
        n, h, w, _ = img.shape
        is_u8 = img.dtype == jnp.uint8
        x = img.astype(jnp.float32) / (255.0 if is_u8 else 1.0)
        r_apply, r_mf, r_st = jax.random.split(rng, 3)
        mf = jax.random.uniform(r_mf, (n,), minval=self.max_factor[0],
                                maxval=self.max_factor[1])
        step = jax.random.uniform(r_st, (n,), minval=self.step_factor[0],
                                  maxval=self.step_factor[1])
        # host frame i (0-based) has factor 1 + step*(i+1), while factor < mf;
        # the worst case bounds the static scan length
        max_frames = int(np.ceil(
            (self.max_factor[1] - 1.0) / self.step_factor[0])) + 1
        ys = jnp.arange(h, dtype=jnp.float32)
        xs = jnp.arange(w, dtype=jnp.float32)

        def frame(carry, i):
            acc, cnt = carry
            f = 1.0 + step * (i + 1.0)
            valid = f < mf
            # cv2.resize INTER_LINEAR to (round(h*f), round(w*f)) then center
            # crop == sampling src at (dst + crop0 + 0.5) * h/zh - 0.5
            zh = jnp.round(h * f)
            zw = jnp.round(w * f)
            y0 = jnp.floor((zh - h) / 2.0)
            x0 = jnp.floor((zw - w) / 2.0)
            my = (ys[None, :] + y0[:, None] + 0.5) * (h / zh)[:, None] - 0.5
            mx = (xs[None, :] + x0[:, None] + 0.5) * (w / zw)[:, None] - 0.5
            my = jnp.broadcast_to(my[:, :, None], (n, h, w))
            mx = jnp.broadcast_to(mx[:, None, :], (n, h, w))
            zoomed = remap_sample(x, mx, my, method="bilinear",
                                  border="replicate")
            v = valid[:, None, None, None]
            return (acc + jnp.where(v, zoomed, 0.0),
                    cnt + valid.astype(jnp.float32)), None

        (acc, cnt), _ = jax.lax.scan(
            frame, (x, jnp.ones((n,), jnp.float32)),
            jnp.arange(max_frames, dtype=jnp.float32))
        y = acc / cnt[:, None, None, None]
        if is_u8:
            y = jnp.clip(y * 255.0, 0, 255)  # host _from_float01: clip+trunc
        m = _bernoulli_mask(r_apply, n, self.p)
        out = jnp.where(m, y, img.astype(jnp.float32) if is_u8 else x)
        batch["image"] = out.astype(jnp.uint8) if is_u8 else out
        return batch


@TRANSFORMS.register_class
class GlassBlur(BaseTransform):
    """Local random pixel swaps followed by gaussian blur (frosted glass)."""

    def __init__(self, sigma: float = 0.7, max_delta: int = 4, iterations: int = 2,
                 always_apply: bool = False, p: float = 0.5, **_):
        super().__init__(always_apply, p)
        self.sigma = sigma
        self.max_delta = max_delta
        self.iterations = iterations

    def apply(self, image, **params):
        img = image.copy()
        h, w = img.shape[:2]
        d = self.max_delta
        for _ in range(self.iterations):
            dy = self.rng.integers(-d, d + 1, size=(h - 2 * d, w - 2 * d))
            dx = self.rng.integers(-d, d + 1, size=(h - 2 * d, w - 2 * d))
            ys, xs = np.mgrid[d:h - d, d:w - d]
            src_y, src_x = ys + dy, xs + dx
            tmp = img[src_y, src_x].copy()
            img[src_y, src_x] = img[ys, xs]
            img[ys, xs] = tmp
        ksize = max(3, int(2 * round(2 * self.sigma) + 1))
        return cv2.GaussianBlur(img, (ksize, ksize), sigmaX=self.sigma)


@TRANSFORMS.register_class
class Emboss(BaseTransform):
    device_capable = True

    # kernel = K0 + strength*K1 — two shared convs + a per-sample blend
    _K0 = np.array([[-1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    _K1 = np.array([[-1, -1, 0], [-1, 0, 1], [0, 1, 1]], np.float32)

    def __init__(self, alpha=(0.2, 0.5), strength=(0.2, 0.7),
                 always_apply: bool = False, p: float = 0.5, **_):
        super().__init__(always_apply, p)
        self.alpha = tuple(alpha)
        self.strength = tuple(strength)

    def apply(self, image, **params):
        alpha = float(self.rng.uniform(*self.alpha))
        strength = float(self.rng.uniform(*self.strength))
        kernel = np.array([[-1 - strength, 0 - strength, 0],
                           [0 - strength, 1, 0 + strength],
                           [0, 0 + strength, 1 + strength]], np.float32)
        embossed = cv2.filter2D(image, -1, kernel)
        out = (1 - alpha) * image.astype(np.float32) + alpha * embossed.astype(np.float32)
        return np.clip(out, 0, 255).astype(np.uint8) if image.dtype == np.uint8 else out

    def apply_batch(self, batch, rng):
        batch = dict(batch)
        img = batch["image"]
        n = img.shape[0]
        is_int = jnp.issubdtype(img.dtype, jnp.integer)
        imgf = img.astype(jnp.float32)
        r_apply, r_a, r_s = jax.random.split(rng, 3)
        alpha = jax.random.uniform(r_a, (n, 1, 1, 1),
                                   minval=self.alpha[0], maxval=self.alpha[1])
        strength = jax.random.uniform(r_s, (n, 1, 1, 1),
                                      minval=self.strength[0],
                                      maxval=self.strength[1])
        emb = _fixed_filter2d(imgf, self._K0) \
            + strength * _fixed_filter2d(imgf, self._K1)
        if is_int:
            # host filter2D saturates to the INPUT dtype's range pre-blend
            emb = _saturate_int(emb, img.dtype,
                                round_half_up=True).astype(jnp.float32)
        x = (1 - alpha) * imgf + alpha * emb
        m = _bernoulli_mask(r_apply, n, self.p)
        out = jnp.where(m, x, imgf)
        if img.dtype == jnp.uint8:
            # non-uint8 dtypes stay float like the host path
            out = jnp.clip(out, 0, 255).astype(img.dtype)
        batch["image"] = out
        return batch


@TRANSFORMS.register_class
class UnsharpMask(BaseTransform):
    device_capable = True

    def __init__(self, blur_limit=(3, 7), sigma_limit=0.0, alpha=(0.2, 0.5),
                 threshold: int = 10, always_apply: bool = False, p: float = 0.5, **_):
        super().__init__(always_apply, p)
        self.blur_limit = (3, blur_limit) if isinstance(blur_limit, int) else tuple(blur_limit)
        self.sigma_limit = (0, sigma_limit) if isinstance(sigma_limit, (int, float)) \
            else tuple(sigma_limit)
        self.alpha = tuple(alpha)
        self.threshold = threshold

    def apply(self, image, **params):
        k = int(self.rng.integers(self.blur_limit[0] // 2,
                                  self.blur_limit[1] // 2 + 1)) * 2 + 1
        sigma = float(self.rng.uniform(*self.sigma_limit))
        alpha = float(self.rng.uniform(*self.alpha))
        img, was_uint8 = _to_float01(image)
        blurred = cv2.GaussianBlur(img, (k, k), sigmaX=sigma)
        residual = img - blurred
        mask = (np.abs(residual) * 255 > self.threshold).astype(np.float32)
        sharpened = np.clip(img + alpha * residual, 0, 1)
        out = img * (1 - mask) + sharpened * mask
        return _from_float01(out, was_uint8)

    def apply_batch(self, batch, rng):
        batch = dict(batch)
        img = batch["image"]
        n = img.shape[0]
        is_int = img.dtype == jnp.uint8  # host semantics branch on uint8, not any int
        x = img.astype(jnp.float32) / (255.0 if is_int else 1.0)
        r_apply, r_k, r_sig, r_a = jax.random.split(rng, 4)
        lo, hi = self.blur_limit[0] // 2, self.blur_limit[1] // 2
        radii = jax.random.randint(r_k, (n,), lo, hi + 1)
        sigmas = jax.random.uniform(
            r_sig, (n,), minval=self.sigma_limit[0], maxval=self.sigma_limit[1])
        alpha = jax.random.uniform(r_a, (n, 1, 1, 1),
                                   minval=self.alpha[0], maxval=self.alpha[1])
        kern = _gauss_kernels(radii, sigmas, hi)
        residual = x - _sep_filter_per_sample(x, kern, kern)
        mask = (jnp.abs(residual) * 255 > self.threshold).astype(jnp.float32)
        sharpened = jnp.clip(x + alpha * residual, 0, 1)
        y = x * (1 - mask) + sharpened * mask
        if is_int:
            # host _from_float01 is clip+trunc; rescale BEFORE the p-select
            # so non-applied samples keep their exact integer values
            y = jnp.clip(y * 255.0, 0, 255)
        m = _bernoulli_mask(r_apply, n, self.p)
        out = jnp.where(m, y, img.astype(jnp.float32) if is_int else x)
        if is_int:
            out = out.astype(img.dtype)
        batch["image"] = out
        return batch


def _j1_jnp(x):
    """Bessel J1 on device (Abramowitz & Stegun 9.4.4 / 9.4.6, |err| ~1e-7
    — far inside the uint8 LSB after kernel normalization)."""
    ax = jnp.abs(x)
    t = jnp.minimum(ax, 3.0) / 3.0
    t2 = t * t
    # small-x: J1(x)/x = polynomial in (x/3)^2
    p = (0.5 + t2 * (-0.56249985 + t2 * (0.21093573 + t2 * (
        -0.03954289 + t2 * (0.00443319 + t2 * (
            -0.00031761 + t2 * 0.00001109))))))
    small = ax * p
    xl = jnp.maximum(ax, 3.0)
    u = 3.0 / xl
    f1 = (0.79788456 + u * (0.00000156 + u * (0.01659667 + u * (
        0.00017105 + u * (-0.00249511 + u * (0.00113653 + u * (
            -0.00020033)))))))
    th1 = (xl - 2.35619449 + u * (0.12499612 + u * (0.00005650 + u * (
        -0.00637879 + u * (0.00074348 + u * (0.00079824 + u * (
            -0.00029166)))))))
    large = f1 * jnp.cos(th1) / jnp.sqrt(xl)
    return jnp.sign(x) * jnp.where(ax < 3.0, small, large)


@TRANSFORMS.register_class
class RingingOvershoot(BaseTransform):
    """2D sinc-filter ringing artifacts."""

    device_capable = True

    def __init__(self, blur_limit=(7, 15), cutoff=(0.7853981633974483, 3.141592653589793),
                 always_apply: bool = False, p: float = 0.5, **_):
        super().__init__(always_apply, p)
        self.blur_limit = (3, blur_limit) if isinstance(blur_limit, int) else tuple(blur_limit)
        self.cutoff = tuple(cutoff)

    def apply(self, image, **params):
        k = int(self.rng.integers(self.blur_limit[0] // 2,
                                  self.blur_limit[1] // 2 + 1)) * 2 + 1
        cutoff = float(self.rng.uniform(*self.cutoff))
        ax = np.arange(k) - k // 2
        xx, yy = np.meshgrid(ax, ax)
        r = np.sqrt(xx ** 2 + yy ** 2)
        with np.errstate(divide="ignore", invalid="ignore"):
            kernel = cutoff * _j1_approx(cutoff * r) / (2 * np.pi * r)
        kernel[k // 2, k // 2] = cutoff ** 2 / (4 * np.pi)
        kernel /= kernel.sum()
        return cv2.filter2D(image, -1, kernel.astype(np.float32))

    def apply_batch(self, batch, rng):
        batch = dict(batch)
        img = batch["image"]
        n = img.shape[0]
        r_apply, r_k, r_c = jax.random.split(rng, 3)
        lo, hi = self.blur_limit[0] // 2, self.blur_limit[1] // 2
        radii = jax.random.randint(r_k, (n,), lo, hi + 1)
        cutoff = jax.random.uniform(r_c, (n, 1, 1), minval=self.cutoff[0],
                                    maxval=self.cutoff[1])
        k = 2 * hi + 1
        ax = jnp.arange(-hi, hi + 1, dtype=jnp.float32)
        rr = jnp.sqrt(ax[None, None, :] ** 2 + ax[None, :, None] ** 2)
        rr = jnp.broadcast_to(rr, (n, k, k))
        center = rr == 0
        safe_r = jnp.where(center, 1.0, rr)
        kern = cutoff * _j1_jnp(cutoff * safe_r) / (2 * np.pi * safe_r)
        kern = jnp.where(center, cutoff ** 2 / (4 * np.pi), kern)
        valid = (jnp.abs(ax)[None, None, :] <= radii[:, None, None]) & \
            (jnp.abs(ax)[None, :, None] <= radii[:, None, None])
        kern = jnp.where(valid, kern, 0.0)
        kern = kern / kern.sum(axis=(1, 2), keepdims=True)
        x = _filter2d_per_sample(img.astype(jnp.float32), kern)
        m = _bernoulli_mask(r_apply, n, self.p)
        out = jnp.where(m, x, img.astype(jnp.float32))
        if jnp.issubdtype(img.dtype, jnp.integer):
            out = _saturate_int(out, img.dtype, round_half_up=True)
        batch["image"] = out
        return batch


def _j1_approx(x):
    """Bessel J1 via scipy when present, else a polynomial/asymptotic
    approximation (Abramowitz & Stegun 9.4)."""
    try:
        from scipy.special import j1
        return j1(x)
    except Exception:
        x = np.asarray(x, np.float64)
        small = np.abs(x) < 3.0
        x_s = np.where(small, x, 3.0)
        # series for small x
        j_small = x_s / 2 - x_s ** 3 / 16 + x_s ** 5 / 384 - x_s ** 7 / 18432
        x_l = np.where(small, 3.0, np.abs(x))
        j_large = np.sqrt(2 / (np.pi * x_l)) * np.cos(x_l - 3 * np.pi / 4)
        return np.where(small, j_small, j_large * np.sign(x))


@TRANSFORMS.register_class
class FancyPCA(BaseTransform):
    """AlexNet-style PCA color augmentation."""

    device_capable = True

    def __init__(self, alpha: float = 0.1, always_apply: bool = False,
                 p: float = 0.5, **_):
        super().__init__(always_apply, p)
        self.alpha = alpha

    def apply(self, image, **params):
        img, was_uint8 = _to_float01(image)
        flat = img.reshape(-1, 3)
        flat_c = flat - flat.mean(axis=0)
        cov = np.cov(flat_c, rowvar=False)
        evals, evecs = np.linalg.eigh(cov)
        noise = evecs @ (self.rng.normal(0, self.alpha, 3) * evals)
        return _from_float01(img + noise[None, None, :], was_uint8)

    def apply_batch(self, batch, rng):
        batch = dict(batch)
        img = batch["image"]
        n, h, w, c = img.shape
        is_int = img.dtype == jnp.uint8  # host semantics branch on uint8, not any int
        x = img.astype(jnp.float32) / (255.0 if is_int else 1.0)
        flat = x.reshape(n, h * w, c)
        xc = flat - flat.mean(axis=1, keepdims=True)
        cov = jnp.einsum("bnc,bnd->bcd", xc, xc) / (h * w - 1)
        evals, evecs = jnp.linalg.eigh(cov)
        r_apply, r_n = jax.random.split(rng)
        coeff = self.alpha * jax.random.normal(r_n, (n, c)) * evals
        noise = jnp.einsum("bij,bj->bi", evecs, coeff)
        y = x + noise[:, None, None, :]
        if is_int:
            y = jnp.clip(y * 255.0, 0, 255)  # host _from_float01: clip+trunc
        m = _bernoulli_mask(r_apply, n, self.p)
        out = jnp.where(m, y, img.astype(jnp.float32) if is_int else x)
        if is_int:
            out = out.astype(img.dtype)
        batch["image"] = out
        return batch


@TRANSFORMS.register_class
class ISONoise(BaseTransform):
    """Sensor noise: poisson-ish luminance noise + hue color shift."""

    device_capable = True

    def __init__(self, color_shift=(0.01, 0.05), intensity=(0.1, 0.5),
                 always_apply: bool = False, p: float = 0.5, **_):
        super().__init__(always_apply, p)
        self.color_shift = tuple(color_shift)
        self.intensity = tuple(intensity)

    def apply(self, image, **params):
        intensity = float(self.rng.uniform(*self.intensity))
        color_shift = float(self.rng.uniform(*self.color_shift))
        img, was_uint8 = _to_float01(image)
        hls = cv2.cvtColor(img, cv2.COLOR_RGB2HLS)
        std = np.std(img)
        luminance_noise = self.rng.poisson(std * intensity * 255, img.shape[:2]) / 255.0
        color_noise = self.rng.normal(0, color_shift * intensity * 180, img.shape[:2])
        hls[..., 0] = (hls[..., 0] + color_noise) % 360
        hls[..., 1] = np.clip(hls[..., 1] + luminance_noise *
                              (1.0 - hls[..., 1]), 0, 1)
        out = cv2.cvtColor(hls, cv2.COLOR_HLS2RGB)
        return _from_float01(out, was_uint8)

    def apply_batch(self, batch, rng):
        batch = dict(batch)
        img = batch["image"]
        n, h, w, _ = img.shape
        is_u8 = img.dtype == jnp.uint8
        x = img.astype(jnp.float32) / (255.0 if is_u8 else 1.0)
        r_apply, r_int, r_cs, r_lum, r_col = jax.random.split(rng, 5)
        intensity = jax.random.uniform(r_int, (n,), minval=self.intensity[0],
                                       maxval=self.intensity[1])
        color_shift = jax.random.uniform(r_cs, (n,), minval=self.color_shift[0],
                                         maxval=self.color_shift[1])
        hh, ll, ss = _rgb_to_hls_f(x)
        std = jnp.std(x, axis=(1, 2, 3))
        lam = std * intensity * 255.0
        lum = jax.random.poisson(r_lum, lam[:, None, None],
                                 (n, h, w)).astype(jnp.float32) / 255.0
        col = jax.random.normal(r_col, (n, h, w)) * \
            (color_shift * intensity * 180.0)[:, None, None]
        hh = (hh + col) % 360.0
        ll = jnp.clip(ll + lum * (1.0 - ll), 0, 1)
        y = _hls_f_to_rgb(hh, ll, ss)
        if is_u8:
            y = jnp.clip(y * 255.0, 0, 255)  # host _from_float01: clip+trunc
        m = _bernoulli_mask(r_apply, n, self.p)
        out = jnp.where(m, y, img.astype(jnp.float32) if is_u8 else x)
        batch["image"] = out.astype(jnp.uint8) if is_u8 else out
        return batch


@TRANSFORMS.register_class
class MultiplicativeNoise(BaseTransform):
    device_capable = True

    def __init__(self, multiplier=(0.9, 1.1), per_channel: bool = False,
                 elementwise: bool = False, always_apply: bool = False,
                 p: float = 0.5, **_):
        super().__init__(always_apply, p)
        self.multiplier = tuple(multiplier)
        self.per_channel = per_channel
        self.elementwise = elementwise

    def apply(self, image, **params):
        if self.elementwise:
            shape = image.shape if self.per_channel else image.shape[:2] + (1,)
        else:
            shape = (image.shape[-1],) if self.per_channel else (1,)
        mult = self.rng.uniform(*self.multiplier, size=shape).astype(np.float32)
        out = image.astype(np.float32) * mult
        return np.clip(out, 0, 255).astype(np.uint8) if image.dtype == np.uint8 else out

    def apply_batch(self, batch, rng):
        batch = dict(batch)
        img = batch["image"]
        n, h, w, c = img.shape
        r_apply, r_mult = jax.random.split(rng)
        if self.elementwise:
            shape = (n, h, w, c) if self.per_channel else (n, h, w, 1)
        else:
            shape = (n, 1, 1, c) if self.per_channel else (n, 1, 1, 1)
        mult = jax.random.uniform(r_mult, shape, minval=self.multiplier[0],
                                  maxval=self.multiplier[1])
        x = img.astype(jnp.float32) * mult
        m = _bernoulli_mask(r_apply, n, self.p)
        out = jnp.where(m, x, img.astype(jnp.float32))
        if img.dtype == jnp.uint8:  # host clips+casts uint8 only; other dtypes stay float
            out = jnp.clip(out, 0, 255).astype(img.dtype)
        batch["image"] = out
        return batch


@TRANSFORMS.register_class
class RandomToneCurve(BaseTransform):
    """Random bezier tone curve on [0,1] intensities."""

    device_capable = True

    def __init__(self, scale: float = 0.1, always_apply: bool = False,
                 p: float = 0.5, **_):
        super().__init__(always_apply, p)
        self.scale = scale

    @staticmethod
    def _curve(x, low, high):
        # quadratic bezier through (0,0), control points from low/high
        t = x
        return np.clip(3 * (1 - t) ** 2 * t * low + 3 * (1 - t) * t ** 2 * high
                       + t ** 3, 0, 1)

    def apply(self, image, **params):
        low = float(np.clip(self.rng.normal(0.25, self.scale), 0, 1))
        high = float(np.clip(self.rng.normal(0.75, self.scale), 0, 1))
        img, was_uint8 = _to_float01(image)
        return _from_float01(self._curve(img, low, high), was_uint8)

    def apply_batch(self, batch, rng):
        batch = dict(batch)
        img = batch["image"]
        n = img.shape[0]
        is_int = img.dtype == jnp.uint8  # host semantics branch on uint8, not any int
        x = img.astype(jnp.float32) / (255.0 if is_int else 1.0)
        r_apply, r_low, r_high = jax.random.split(rng, 3)
        low = jnp.clip(0.25 + self.scale * jax.random.normal(r_low, (n, 1, 1, 1)), 0, 1)
        high = jnp.clip(0.75 + self.scale * jax.random.normal(r_high, (n, 1, 1, 1)), 0, 1)
        t = x
        y = jnp.clip(3 * (1 - t) ** 2 * t * low + 3 * (1 - t) * t ** 2 * high + t ** 3,
                     0, 1)
        m = _bernoulli_mask(r_apply, n, self.p)
        out = jnp.where(m, y, x)
        if is_int:
            out = jnp.clip(out * 255.0 + 0.5, 0, 255).astype(img.dtype)
        batch["image"] = out
        return batch


@TRANSFORMS.register_class
class ChannelDropout(BaseTransform):
    device_capable = True

    def __init__(self, channel_drop_range=(1, 1), fill_value=0,
                 always_apply: bool = False, p: float = 0.5, **_):
        super().__init__(always_apply, p)
        self.channel_drop_range = tuple(channel_drop_range)
        self.fill_value = fill_value

    def apply(self, image, **params):
        c = image.shape[-1]
        n_drop = int(self.rng.integers(self.channel_drop_range[0],
                                       self.channel_drop_range[1] + 1))
        n_drop = min(n_drop, c - 1)
        drop = self.rng.choice(c, size=n_drop, replace=False)
        out = image.copy()
        out[..., drop] = self.fill_value
        return out

    def apply_batch(self, batch, rng):
        batch = dict(batch)
        img = batch["image"]
        n, _, _, c = img.shape
        r_apply, r_n, r_ch = jax.random.split(rng, 3)
        n_drop = jax.random.randint(r_n, (n,), self.channel_drop_range[0],
                                    self.channel_drop_range[1] + 1)
        n_drop = jnp.minimum(n_drop, c - 1)
        # rank of each channel in a random order; the n_drop lowest drop
        rank = jnp.argsort(jnp.argsort(
            jax.random.uniform(r_ch, (n, c)), axis=1), axis=1)
        dropm = rank < n_drop[:, None]
        m = _bernoulli_mask(r_apply, n, self.p)
        dropm = dropm[:, None, None, :] & m.astype(bool)
        batch["image"] = jnp.where(
            dropm, jnp.asarray(self.fill_value, img.dtype), img)
        return batch


@TRANSFORMS.register_class
class PixelDropout(BaseTransform):
    device_capable = True

    def __init__(self, dropout_prob: float = 0.01, per_channel: bool = False,
                 drop_value=0, mask_drop_value=None, always_apply: bool = False,
                 p: float = 0.5, **_):
        super().__init__(always_apply, p)
        self.dropout_prob = dropout_prob
        self.per_channel = per_channel
        self.drop_value = drop_value
        self.mask_drop_value = mask_drop_value

    def apply(self, image, **params):
        shape = image.shape if self.per_channel else image.shape[:2] + (1,)
        drop = self.rng.random(shape) < self.dropout_prob
        drop = np.broadcast_to(drop, image.shape)
        out = image.copy()
        out[drop] = self.drop_value
        return out

    def apply_batch(self, batch, rng):
        batch = dict(batch)
        img = batch["image"]
        n, h, w, c = img.shape
        r_apply, r_drop = jax.random.split(rng)
        shape = (n, h, w, c) if self.per_channel else (n, h, w, 1)
        drop = jax.random.bernoulli(r_drop, self.dropout_prob, shape)
        dropped = jnp.where(drop, jnp.asarray(self.drop_value, img.dtype), img)
        m = _bernoulli_mask(r_apply, n, self.p)
        batch["image"] = jnp.where(m, dropped, img)
        return batch


@TRANSFORMS.register_class
class GridDropout(BaseTransform):
    """Regular grid of dropped square regions."""

    device_capable = True

    def __init__(self, ratio: float = 0.5, unit_size_min=None, unit_size_max=None,
                 holes_number_x=None, holes_number_y=None, shift_x: int = 0,
                 shift_y: int = 0, random_offset: bool = False, fill_value=0,
                 mask_fill_value=None, always_apply: bool = False, p: float = 0.5, **_):
        super().__init__(always_apply, p)
        self.ratio = ratio
        self.unit_size_min = unit_size_min
        self.unit_size_max = unit_size_max
        self.holes_number_x = holes_number_x
        self.holes_number_y = holes_number_y
        self.shift_x, self.shift_y = shift_x, shift_y
        self.random_offset = random_offset
        self.fill_value = fill_value
        self.mask_fill_value = mask_fill_value

    def get_params(self, sample):
        h, w = sample["image"].shape[:2]
        if self.unit_size_min is not None and self.unit_size_max is not None:
            unit = int(self.rng.integers(self.unit_size_min, self.unit_size_max + 1))
            ux = uy = unit
        else:
            ux = w // (self.holes_number_x or 8)
            uy = h // (self.holes_number_y or 8)
        hole_w = max(1, int(ux * self.ratio))
        hole_h = max(1, int(uy * self.ratio))
        if self.random_offset:
            sx = int(self.rng.integers(0, max(ux - hole_w, 0) + 1))
            sy = int(self.rng.integers(0, max(uy - hole_h, 0) + 1))
        else:
            sx, sy = self.shift_x, self.shift_y
        return {"ux": max(ux, 1), "uy": max(uy, 1), "hw": hole_w, "hh": hole_h,
                "sx": sx, "sy": sy}

    def _mask(self, h, w, ux, uy, hw, hh, sx, sy):
        yy, xx = np.mgrid[0:h, 0:w]
        return (((yy - sy) % uy) < hh) & (((xx - sx) % ux) < hw)

    def apply(self, image, ux=8, uy=8, hw=4, hh=4, sx=0, sy=0, **params):
        drop = self._mask(image.shape[0], image.shape[1], ux, uy, hw, hh, sx, sy)
        out = image.copy()
        out[drop] = self.fill_value
        return out

    def apply_to_mask(self, mask, ux=8, uy=8, hw=4, hh=4, sx=0, sy=0, **params):
        if self.mask_fill_value is None:
            return mask
        drop = self._mask(mask.shape[0], mask.shape[1], ux, uy, hw, hh, sx, sy)
        out = mask.copy()
        out[drop] = self.mask_fill_value
        return out

    def apply_batch(self, batch, rng):
        batch = dict(batch)
        img = batch["image"]
        n, h, w = img.shape[:3]
        r_apply, r_unit, r_sy, r_sx = jax.random.split(rng, 4)
        if self.unit_size_min is not None and self.unit_size_max is not None:
            unit = jax.random.randint(r_unit, (n,), self.unit_size_min,
                                      self.unit_size_max + 1)
            ux = uy = jnp.maximum(unit, 1)
        else:
            ux = jnp.full((n,), max(w // (self.holes_number_x or 8), 1))
            uy = jnp.full((n,), max(h // (self.holes_number_y or 8), 1))
        # host: hole = max(1, int(unit * ratio)) — trunc of a non-negative
        hw_ = jnp.maximum(1, (ux * self.ratio).astype(jnp.int32))
        hh_ = jnp.maximum(1, (uy * self.ratio).astype(jnp.int32))
        if self.random_offset:
            sx = jax.random.randint(r_sx, (n,), 0,
                                    jnp.maximum(ux - hw_, 0) + 1)
            sy = jax.random.randint(r_sy, (n,), 0,
                                    jnp.maximum(uy - hh_, 0) + 1)
        else:
            sx = jnp.full((n,), self.shift_x)
            sy = jnp.full((n,), self.shift_y)
        yy = jnp.arange(h)
        xx = jnp.arange(w)
        drop_y = ((yy[None, :] - sy[:, None]) % uy[:, None]) < hh_[:, None]
        drop_x = ((xx[None, :] - sx[:, None]) % ux[:, None]) < hw_[:, None]
        m = _bernoulli_mask(r_apply, n, self.p)
        drop = (drop_y[:, :, None] & drop_x[:, None, :])[..., None] & \
            m.astype(bool)
        batch["image"] = jnp.where(
            drop, jnp.asarray(self.fill_value).astype(img.dtype), img)
        if self.mask_fill_value is not None and batch.get("mask") is not None \
                and "mask" in batch:
            mask = batch["mask"]
            dm = drop[..., 0] if mask.ndim == 3 else drop
            batch["mask"] = jnp.where(
                dm, jnp.asarray(self.mask_fill_value).astype(mask.dtype), mask)
        return batch


@TRANSFORMS.register_class
class Superpixels(BaseTransform):
    """Replace random cells of a grid segmentation with their mean color
    (grid-based approximation of SLIC superpixels — no skimage dependency)."""

    def __init__(self, p_replace=0.1, n_segments=100, max_size: int = 128,
                 always_apply: bool = False, p: float = 0.5, **_):
        super().__init__(always_apply, p)
        self.p_replace = (p_replace, p_replace) if isinstance(p_replace, (int, float)) \
            else tuple(p_replace)
        self.n_segments = (n_segments, n_segments) if isinstance(n_segments, int) \
            else tuple(n_segments)

    @property
    def device_capable(self):
        # a random segment count would make the grid (and every cell
        # boundary) a traced shape; a fixed count keeps them static
        return self.n_segments[0] == self.n_segments[1]

    def apply_batch(self, batch, rng):
        batch = dict(batch)
        img = batch["image"]
        n, h, w, c = img.shape
        grid = max(1, int(np.sqrt(self.n_segments[0])))
        ys = np.linspace(0, h, grid + 1, dtype=int)
        xs = np.linspace(0, w, grid + 1, dtype=int)
        cell_y = np.searchsorted(ys[1:], np.arange(h), side="right")
        cell_x = np.searchsorted(xs[1:], np.arange(w), side="right")
        one_y = jnp.asarray((cell_y[None, :] == np.arange(grid)[:, None])
                            .astype(np.float32))  # (grid, h)
        one_x = jnp.asarray((cell_x[None, :] == np.arange(grid)[:, None])
                            .astype(np.float32))  # (grid, w)
        x = img.astype(jnp.float32)
        # cell-local sums as two matmuls (exact in f32 for uint8 cells)
        sums = jnp.einsum("gy,nyxc->ngxc", one_y, x)
        sums = jnp.einsum("kx,ngxc->ngkc", one_x, sums)
        area = (ys[1:] - ys[:-1])[:, None] * (xs[1:] - xs[:-1])[None, :]
        means = sums / jnp.asarray(np.maximum(area, 1), jnp.float32)[None, :, :, None]
        r_apply, r_p, r_cells = jax.random.split(rng, 3)
        p_rep = jax.random.uniform(r_p, (n, 1, 1), minval=self.p_replace[0],
                                   maxval=self.p_replace[1])
        replace = jax.random.uniform(r_cells, (n, grid, grid)) < p_rep
        per_pix_mean = means[:, cell_y][:, :, cell_x]
        per_pix_rep = replace[:, cell_y][:, :, cell_x]
        m = _bernoulli_mask(r_apply, n, self.p).astype(bool)
        sel = per_pix_rep[..., None] & m
        if jnp.issubdtype(img.dtype, jnp.integer):
            # host: cell.mean().astype(dtype) — truncation of a non-negative
            repl = jnp.floor(per_pix_mean).astype(img.dtype)
            batch["image"] = jnp.where(sel, repl, img)
        else:
            batch["image"] = jnp.where(sel, per_pix_mean, x)
        return batch

    def apply(self, image, **params):
        p_rep = float(self.rng.uniform(*self.p_replace))
        n_seg = int(self.rng.integers(self.n_segments[0], self.n_segments[1] + 1))
        h, w = image.shape[:2]
        grid = max(1, int(np.sqrt(n_seg)))
        out = image.copy()
        ys = np.linspace(0, h, grid + 1, dtype=int)
        xs = np.linspace(0, w, grid + 1, dtype=int)
        for i in range(grid):
            for j in range(grid):
                if self.rng.random() < p_rep:
                    cell = out[ys[i]:ys[i + 1], xs[j]:xs[j + 1]]
                    if cell.size:
                        cell[...] = cell.mean(axis=(0, 1), keepdims=True).astype(out.dtype)
        return out


def _disk_mask(xp, h, w, cy, cx, r):
    """Center-inside disk rasterization shared by the host (numpy) and
    device (jnp) weather paths: pixel (y, x) is inside iff
    (y-cy)^2 + (x-cx)^2 <= r^2. Replaces cv2.circle — whose integer arc
    fill has no closed form — so both paths agree exactly given the same
    geometry. ``cy``/``cx``/``r`` may carry leading batch dims; the result
    is (..., h, w)."""
    yy = xp.arange(h, dtype=xp.float32).reshape(h, 1)
    xx = xp.arange(w, dtype=xp.float32).reshape(1, w)
    cy = xp.asarray(cy, xp.float32)[..., None, None]
    cx = xp.asarray(cx, xp.float32)[..., None, None]
    r = xp.asarray(r, xp.float32)[..., None, None]
    return (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r


def _star_polygon_mask(xp, h, w, pts):
    """Star-shaped polygon rasterization shared by host and device: the
    vertices are ordered by angle around their centroid and the triangle
    fan (centroid, p_i, p_{i+1}) is unioned; a pixel is inside a triangle
    iff its three edge cross products share a sign. Replaces cv2.fillPoly
    (no closed form) with math both backends run identically.
    ``pts`` is (..., D, 2) as (x, y); result (..., h, w)."""
    c = pts.mean(axis=-2, keepdims=True)
    ang = xp.arctan2(pts[..., 1] - c[..., 1], pts[..., 0] - c[..., 0])
    order = xp.argsort(ang, axis=-1)
    p = xp.take_along_axis(pts, order[..., None], axis=-2)
    q = xp.roll(p, -1, axis=-2)
    px = xp.arange(w, dtype=xp.float32).reshape(1, w)
    py = xp.arange(h, dtype=xp.float32).reshape(h, 1)
    ax, ay = p[..., 0][..., None, None], p[..., 1][..., None, None]
    bx, by = q[..., 0][..., None, None], q[..., 1][..., None, None]
    cx, cy = c[..., 0][..., None, None], c[..., 1][..., None, None]
    d1 = (ax - cx) * (py - cy) - (ay - cy) * (px - cx)
    d2 = (bx - ax) * (py - ay) - (by - ay) * (px - ax)
    d3 = (cx - bx) * (py - by) - (cy - by) * (px - bx)
    inside = ((d1 >= 0) & (d2 >= 0) & (d3 >= 0)) \
        | ((d1 <= 0) & (d2 <= 0) & (d3 <= 0))
    # zero-area triangles contribute nothing (degenerate/duplicate vertices
    # would otherwise pass every >=0 AND every <=0 test and flood the mask)
    area2 = (ax - cx) * (by - cy) - (ay - cy) * (bx - cx)
    return (inside & (area2 != 0)).any(axis=-3)


def _segments_mask(xp, h, w, xs, ys, dx, dy, width, chunk=4):
    """Rain-streak rasterization shared by host and device: pixel centers
    within ``width/2`` of the segment (x, y) -> (x+dx, y+dy). Replaces
    cv2.line. ``xs``/``ys`` are (..., D) drop starts; ``dx`` broadcasts
    against them (per-sample slant); ``dy``/``width`` are scalars. Drops
    are processed ``chunk`` at a time to bound the (..., chunk, h, w)
    temporaries."""
    px = xp.arange(w, dtype=xp.float32).reshape(1, w)
    py = xp.arange(h, dtype=xp.float32).reshape(h, 1)
    xs = xp.asarray(xs, xp.float32)
    ys = xp.asarray(ys, xp.float32)
    dxb = xp.broadcast_to(xp.asarray(dx, xp.float32), xs.shape)
    dy = float(dy)
    r2 = (float(width) * 0.5) ** 2
    d = xs.shape[-1]
    mask = None
    for lo in range(0, d, chunk):
        x0 = xs[..., lo:lo + chunk, None, None]
        y0 = ys[..., lo:lo + chunk, None, None]
        vx = dxb[..., lo:lo + chunk, None, None]
        rel_x, rel_y = px - x0, py - y0
        denom = xp.maximum(vx * vx + dy * dy, 1e-12)  # degenerate segment
        t = xp.clip((rel_x * vx + rel_y * dy) / denom, 0.0, 1.0)
        ex = rel_x - t * vx
        ey = rel_y - t * dy
        part = ((ex * ex + ey * ey) <= r2).any(axis=-3)
        mask = part if mask is None else (mask | part)
    return mask


def _gaussian_kernel1d(sigma):
    """cv2.GaussianBlur(f32, ksize=0, sigma) kernel: ksize derived as
    round(sigma*8+1)|1, formula taps, normalized."""
    k = int(round(sigma * 8 + 1)) | 1
    ax = np.arange(k, dtype=np.float32) - k // 2
    g = np.exp(-0.5 * (ax / sigma) ** 2)
    return g / g.sum()


@TRANSFORMS.register_class
class RandomFog(BaseTransform):
    """Fog = union of random disks Gaussian-blurred into an alpha layer that
    blends toward white. Disks are rasterized center-inside (_disk_mask) on
    BOTH paths so host and device agree exactly given the same geometry;
    the blur reproduces cv2.GaussianBlur's ksize-from-sigma rule."""

    device_capable = True

    def __init__(self, fog_coef_lower: float = 0.3, fog_coef_upper: float = 1.0,
                 alpha_coef: float = 0.08, always_apply: bool = False,
                 p: float = 0.5, **_):
        super().__init__(always_apply, p)
        self.fog_coef = (fog_coef_lower, fog_coef_upper)
        self.alpha_coef = alpha_coef

    def _compose(self, xp, img01, fog, coef):
        alpha = xp.clip(fog * coef * (1 + self.alpha_coef), 0.0, 1.0)
        return img01 * (1.0 - alpha) + alpha

    def apply(self, image, **params):
        coef = float(self.rng.uniform(*self.fog_coef))
        img, was_uint8 = _to_float01(image)
        h, w = img.shape[:2]
        fog = np.zeros((h, w), np.float32)
        n_blobs = max(1, int(coef * 10))
        for _ in range(n_blobs):
            cy, cx = self.rng.integers(0, h), self.rng.integers(0, w)
            radius = int(max(h, w) * self.rng.uniform(0.1, 0.3) * coef)
            fog = np.maximum(fog, _disk_mask(np, h, w, cy, cx, radius)
                             .astype(np.float32))
        fog = cv2.GaussianBlur(fog, (0, 0), sigmaX=max(h, w) * 0.05)[..., None]
        out = self._compose(np, img, fog, coef)
        return _from_float01(out, was_uint8)

    def apply_batch(self, batch, rng):
        batch = dict(batch)
        img = batch["image"]
        n, h, w, _ = img.shape
        is_u8 = img.dtype == jnp.uint8
        x = img.astype(jnp.float32) / (255.0 if is_u8 else 1.0)
        kmax = max(1, int(self.fog_coef[1] * 10))
        r_apply, r_coef, r_cy, r_cx, r_rad = jax.random.split(rng, 5)
        coef = jax.random.uniform(r_coef, (n,), minval=self.fog_coef[0],
                                  maxval=self.fog_coef[1])
        n_blobs = jnp.maximum(1.0, jnp.trunc(coef * 10))  # host: max(1,int())
        cy = jax.random.randint(r_cy, (n, kmax), 0, h)
        cx = jax.random.randint(r_cx, (n, kmax), 0, w)
        rad = jnp.trunc(max(h, w)
                        * jax.random.uniform(r_rad, (n, kmax), minval=0.1,
                                             maxval=0.3) * coef[:, None])
        disks = _disk_mask(jnp, h, w, cy, cx, rad)  # (n, kmax, h, w)
        active = jnp.arange(kmax)[None, :] < n_blobs[:, None]
        fog = jnp.max(jnp.where(active[..., None, None], disks, False)
                      .astype(jnp.float32), axis=1)[..., None]
        g1 = _gaussian_kernel1d(max(h, w) * 0.05)
        fog = _fixed_filter2d(fog, g1[None, :])
        fog = _fixed_filter2d(fog, g1[:, None])
        y = self._compose(jnp, x, fog, coef[:, None, None, None])
        if is_u8:
            y = jnp.clip(y * 255.0, 0, 255)  # host _from_float01: clip+trunc
        m = _bernoulli_mask(r_apply, n, self.p)
        out = jnp.where(m, y, x if not is_u8 else img.astype(jnp.float32))
        batch["image"] = out.astype(jnp.uint8) if is_u8 else out
        return batch


@TRANSFORMS.register_class
class RandomRain(BaseTransform):
    def __init__(self, slant_lower: int = -10, slant_upper: int = 10,
                 drop_length: int = 20, drop_width: int = 1,
                 drop_color=(200, 200, 200), blur_value: int = 7,
                 brightness_coefficient: float = 0.7, rain_type=None,
                 always_apply: bool = False, p: float = 0.5, **_):
        super().__init__(always_apply, p)
        self.slant = (slant_lower, slant_upper)
        self.drop_length = drop_length
        self.drop_width = drop_width
        self.drop_color = tuple(drop_color)
        self.blur_value = blur_value
        self.brightness_coefficient = brightness_coefficient
        self.rain_type = rain_type

    def _n_drops(self, h):
        return max({"drizzle": h // 8, "heavy": h // 2, "torrential": h}.get(
            self.rain_type, h // 3), 1)

    def apply(self, image, **params):
        # streaks are distance-to-segment rasterizations (_segments_mask,
        # identical math on the device path, replacing cv2.line); blur is a
        # float box filter rounded half-up; brightness scales HSV-V in the
        # cv2 u8 convention (trunc after clip)
        h, w = image.shape[:2]
        slant = int(self.rng.integers(self.slant[0], self.slant[1] + 1))
        n_drops = self._n_drops(h)
        xs = self.rng.integers(0, max(w - self.drop_length, 1), n_drops)
        ys = self.rng.integers(0, max(h - self.drop_length, 1), n_drops)
        mask = _segments_mask(np, h, w, xs, ys, slant, self.drop_length,
                              self.drop_width)
        color = np.asarray(self.drop_color, np.float32)[:image.shape[-1]]
        overlay = np.where(mask[..., None], color, image.astype(np.float32))
        k = self.blur_value if self.blur_value % 2 else self.blur_value + 1
        blurred = cv2.blur(overlay, (k, k))
        u8 = np.floor(np.clip(blurred, 0, 255) + 0.5).astype(np.uint8)
        hsv = cv2.cvtColor(u8, cv2.COLOR_RGB2HSV).astype(np.float32)
        hsv[..., 2] = np.clip(hsv[..., 2] * self.brightness_coefficient, 0, 255)
        return cv2.cvtColor(hsv.astype(np.uint8), cv2.COLOR_HSV2RGB)

    device_capable = True

    def apply_batch(self, batch, rng):
        batch = dict(batch)
        img = batch["image"]
        if img.dtype != jnp.uint8:
            raise TypeError("RandomRain expects uint8 images (cv2 HSV "
                            "parity); keep it on the host path for floats")
        n, h, w, _ = img.shape
        x = img.astype(jnp.float32)
        n_drops = self._n_drops(h)
        r_apply, r_slant, r_x, r_y = jax.random.split(rng, 4)
        slant = jax.random.randint(r_slant, (n, 1), self.slant[0],
                                   self.slant[1] + 1)
        xs = jax.random.randint(r_x, (n, n_drops), 0,
                                max(w - self.drop_length, 1))
        ys = jax.random.randint(r_y, (n, n_drops), 0,
                                max(h - self.drop_length, 1))
        mask = _segments_mask(jnp, h, w, xs, ys, slant, self.drop_length,
                              self.drop_width)
        color = jnp.asarray(self.drop_color[:img.shape[-1]], jnp.float32)
        overlay = jnp.where(mask[..., None], color, x)
        k = self.blur_value if self.blur_value % 2 else self.blur_value + 1
        box = np.full((k,), 1.0 / k, np.float32)
        blurred = _fixed_filter2d(overlay, box[None, :])
        blurred = _fixed_filter2d(blurred, box[:, None])
        hh, ss, vv = _rgb_to_hsv_u8(_quantize_u8(blurred))
        vv = jnp.trunc(jnp.clip(vv * self.brightness_coefficient, 0, 255))
        y = _quantize_u8(_hsv_u8_to_rgb(hh, ss, vv))
        m = _bernoulli_mask(r_apply, n, self.p)
        batch["image"] = jnp.where(m, y, x).astype(jnp.uint8)
        return batch


@TRANSFORMS.register_class
class RandomShadow(BaseTransform):
    def __init__(self, shadow_roi=(0, 0.5, 1, 1), num_shadows_lower: int = 1,
                 num_shadows_upper: int = 2, shadow_dimension: int = 5,
                 always_apply: bool = False, p: float = 0.5, **_):
        super().__init__(always_apply, p)
        self.shadow_roi = tuple(shadow_roi)
        self.num_shadows = (num_shadows_lower, num_shadows_upper)
        self.shadow_dimension = shadow_dimension

    def apply(self, image, **params):
        # shadows are star-shaped polygons (vertices angle-ordered around
        # their centroid) rasterized by _star_polygon_mask — identical math
        # on the device path, replacing cv2.fillPoly
        h, w = image.shape[:2]
        x0, y0, x1, y1 = self.shadow_roi
        n = int(self.rng.integers(self.num_shadows[0], self.num_shadows[1] + 1))
        img = image.astype(np.float32)
        for _ in range(n):
            pts = np.stack([
                self.rng.uniform(x0 * w, x1 * w, self.shadow_dimension),
                self.rng.uniform(y0 * h, y1 * h, self.shadow_dimension)],
                axis=1).astype(np.float32)
            mask = _star_polygon_mask(np, h, w, pts)
            img = np.where(mask[..., None], img * 0.5, img)
        out = np.clip(img, 0, 255)
        return out.astype(np.uint8) if image.dtype == np.uint8 else out

    device_capable = True

    def apply_batch(self, batch, rng):
        batch = dict(batch)
        img = batch["image"]
        n, h, w, _ = img.shape
        is_int = jnp.issubdtype(img.dtype, jnp.integer)
        x = img.astype(jnp.float32)
        kmax = max(self.num_shadows[1], 1)
        dim = self.shadow_dimension
        x0, y0, x1, y1 = self.shadow_roi
        r_apply, r_n, r_px, r_py = jax.random.split(rng, 4)
        n_sh = jax.random.randint(r_n, (n,), self.num_shadows[0],
                                  self.num_shadows[1] + 1)
        pxs = jax.random.uniform(r_px, (n, kmax, dim), minval=x0 * w,
                                 maxval=x1 * w)
        pys = jax.random.uniform(r_py, (n, kmax, dim), minval=y0 * h,
                                 maxval=y1 * h)
        masks = _star_polygon_mask(jnp, h, w,
                                   jnp.stack([pxs, pys], axis=-1))
        active = jnp.arange(kmax)[None, :] < n_sh[:, None]
        covered = jnp.sum(masks & active[..., None, None], axis=1)  # (n,h,w)
        # host applies *= 0.5 per covering shadow, so the factor compounds
        y = jnp.clip(x * (0.5 ** covered)[..., None], 0, 255)
        m = _bernoulli_mask(r_apply, n, self.p)
        out = jnp.where(m, y, x)
        batch["image"] = out.astype(img.dtype) if is_int else out
        return batch


@TRANSFORMS.register_class
class RandomSnow(BaseTransform):
    device_capable = True

    def __init__(self, snow_point_lower: float = 0.1, snow_point_upper: float = 0.3,
                 brightness_coeff: float = 2.5, always_apply: bool = False,
                 p: float = 0.5, **_):
        super().__init__(always_apply, p)
        self.snow_point = (snow_point_lower, snow_point_upper)
        self.brightness_coeff = brightness_coeff

    def apply(self, image, **params):
        point = float(self.rng.uniform(*self.snow_point)) * 127.5 + 85
        hls = cv2.cvtColor(image, cv2.COLOR_RGB2HLS).astype(np.float32)
        bright = hls[..., 1] < point
        hls[..., 1][bright] = np.clip(hls[..., 1][bright] * self.brightness_coeff,
                                      0, 255)
        return cv2.cvtColor(hls.astype(np.uint8), cv2.COLOR_HLS2RGB)

    def apply_batch(self, batch, rng):
        batch = dict(batch)
        img = batch["image"]
        if img.dtype != jnp.uint8:
            raise TypeError("RandomSnow expects uint8 images; keep it on the "
                            "host path for float inputs")
        n = img.shape[0]
        r_apply, r_pt = jax.random.split(rng)
        point = jax.random.uniform(
            r_pt, (n, 1, 1), minval=self.snow_point[0],
            maxval=self.snow_point[1]) * 127.5 + 85
        # cv2's 8U HLS path is its float path on x*(1/255.f) with cvRound
        # (round-half-even) back to u8 — reproducing the reciprocal-multiply
        # scaling and rint makes L and S EXACT (probed exhaustively; H has a
        # ~0.1% 1-half-degree residual from cv2's hue op ordering)
        inv255 = np.float32(1.0 / 255.0)
        h, ll, s = _rgb_to_hls_f(img.astype(jnp.float32) * inv255)
        h8 = jnp.round(h * 0.5) % 180.0
        l8 = jnp.round(ll * 255.0)
        s8 = jnp.round(s * 255.0)
        brightened = jnp.clip(l8 * self.brightness_coeff, 0, 255)
        l8 = jnp.where(l8 < point, jnp.floor(brightened), l8)  # host trunc
        rgb = _hls_f_to_rgb(h8 * 2.0, l8 * inv255, s8 * inv255)
        x = jnp.round(rgb * 255.0)
        m = _bernoulli_mask(r_apply, n, self.p)
        out = jnp.where(m, x, img.astype(jnp.float32))
        batch["image"] = jnp.clip(out, 0, 255).astype(jnp.uint8)
        return batch


@TRANSFORMS.register_class
class RandomSunFlare(BaseTransform):
    def __init__(self, flare_roi=(0, 0, 1, 0.5), angle_lower: float = 0.0,
                 angle_upper: float = 1.0, num_flare_circles_lower: int = 6,
                 num_flare_circles_upper: int = 10, src_radius: int = 400,
                 src_color=(255, 255, 255), always_apply: bool = False,
                 p: float = 0.5, **_):
        super().__init__(always_apply, p)
        self.flare_roi = tuple(flare_roi)
        self.num_circles = (num_flare_circles_lower, num_flare_circles_upper)
        self.src_radius = src_radius
        self.src_color = tuple(src_color)

    def _rbounds(self):
        lo = self.src_radius // 10
        return lo, max(self.src_radius // 3, lo + 1)

    def apply(self, image, **params):
        # flare circles are center-inside disks (_disk_mask — identical math
        # on the device path, replacing cv2.circle), blended sequentially;
        # the main source is a blurred disk
        h, w = image.shape[:2]
        c = image.shape[-1]
        color = np.asarray(self.src_color, np.float32)[:c]
        x0, y0, x1, y1 = self.flare_roi
        cx = int(self.rng.uniform(x0 * w, max(x1 * w, x0 * w + 1)))
        cy = int(self.rng.uniform(y0 * h, max(y1 * h, y0 * h + 1)))
        overlay = image.astype(np.float32)
        n = int(self.rng.integers(self.num_circles[0], self.num_circles[1] + 1))
        rlo, rhi = self._rbounds()
        for i in range(n):
            r = int(self.rng.integers(rlo, rhi))
            alpha = self.rng.uniform(0.05, 0.2)
            # -(w // 4), NOT -w // 4: python floor-divides the negated value
            # (-30 // 4 = -8) while the device path uses -(w // 4) = -7 —
            # the symmetric range keeps both distributions identical
            ox = cx + int(self.rng.integers(-(w // 4), w // 4 + 1))
            oy = cy + int(self.rng.integers(-(h // 4), h // 4 + 1))
            disk = _disk_mask(np, h, w, oy, ox, r)[..., None]
            overlay = overlay * (1 - alpha) + np.where(disk, color, 0.0) * alpha
        flare = np.where(
            _disk_mask(np, h, w, cy, cx,
                       min(self.src_radius, max(h, w) // 2))[..., None],
            color, 0.0)
        flare = cv2.GaussianBlur(flare, (0, 0), sigmaX=self.src_radius / 4 + 1)
        if flare.ndim == 2:  # cv2 squeezes single-channel
            flare = flare[..., None]
        out = np.clip(overlay + flare * 0.5, 0, 255)
        return out.astype(np.uint8) if image.dtype == np.uint8 else out

    device_capable = True

    def apply_batch(self, batch, rng):
        batch = dict(batch)
        img = batch["image"]
        n, h, w, c = img.shape
        is_int = jnp.issubdtype(img.dtype, jnp.integer)
        x = img.astype(jnp.float32)
        color = jnp.asarray(self.src_color[:c], jnp.float32)
        kmax = max(self.num_circles[1], 1)
        x0, y0, x1, y1 = self.flare_roi
        keys = jax.random.split(rng, 8)
        r_apply, r_cx, r_cy, r_n, r_r, r_a, r_ox, r_oy = keys
        cx = jnp.trunc(jax.random.uniform(r_cx, (n,), minval=x0 * w,
                                          maxval=max(x1 * w, x0 * w + 1)))
        cy = jnp.trunc(jax.random.uniform(r_cy, (n,), minval=y0 * h,
                                          maxval=max(y1 * h, y0 * h + 1)))
        n_circ = jax.random.randint(r_n, (n,), self.num_circles[0],
                                    self.num_circles[1] + 1)
        rlo, rhi = self._rbounds()
        rad = jax.random.randint(r_r, (n, kmax), rlo, rhi)
        alpha = jax.random.uniform(r_a, (n, kmax), minval=0.05, maxval=0.2)
        ox = cx[:, None] + jax.random.randint(r_ox, (n, kmax),
                                              -(w // 4), w // 4 + 1)
        oy = cy[:, None] + jax.random.randint(r_oy, (n, kmax),
                                              -(h // 4), h // 4 + 1)
        active = jnp.arange(kmax)[None, :] < n_circ[:, None]
        a = jnp.where(active, alpha, 0.0)  # inactive circle = no-op blend
        overlay = x
        for i in range(kmax):  # sequential like the host (order matters)
            disk = _disk_mask(jnp, h, w, oy[:, i], ox[:, i], rad[:, i])
            ai = a[:, i][:, None, None, None]
            overlay = overlay * (1 - ai) \
                + jnp.where(disk[..., None], color, 0.0) * ai
        flare = jnp.where(
            _disk_mask(jnp, h, w, cy, cx,
                       min(self.src_radius, max(h, w) // 2))[..., None],
            color, 0.0)
        g1 = _gaussian_kernel1d(self.src_radius / 4 + 1)
        flare = _fixed_filter2d(flare, g1[None, :])
        flare = _fixed_filter2d(flare, g1[:, None])
        y = jnp.clip(overlay + flare * 0.5, 0, 255)
        m = _bernoulli_mask(r_apply, n, self.p)
        out = jnp.where(m, y, x)
        batch["image"] = out.astype(img.dtype) if is_int else out
        return batch


@TRANSFORMS.register_class
class Spatter(BaseTransform):
    """Rain/mud spatter occlusions via thresholded blurred noise."""

    def __init__(self, mean: float = 0.65, std: float = 0.3, gauss_sigma: float = 2.0,
                 cutout_threshold: float = 0.68, intensity: float = 0.6,
                 mode: str = "rain", always_apply: bool = False, p: float = 0.5, **_):
        super().__init__(always_apply, p)
        self.mean, self.std = mean, std
        self.gauss_sigma = gauss_sigma
        self.cutout_threshold = cutout_threshold
        self.intensity = intensity
        self.mode = mode

    def apply(self, image, **params):
        img, was_uint8 = _to_float01(image)
        h, w = img.shape[:2]
        noise = self.rng.normal(self.mean, self.std, (h, w)).astype(np.float32)
        noise = cv2.GaussianBlur(noise, (0, 0), sigmaX=self.gauss_sigma)
        mask = (noise > self.cutout_threshold).astype(np.float32)[..., None]
        if self.mode == "rain":
            color = np.array([0.8, 0.8, 0.9], np.float32)
        else:
            color = np.array([0.36, 0.25, 0.18], np.float32)
        out = img * (1 - mask * self.intensity) + color * mask * self.intensity
        return _from_float01(out, was_uint8)

    device_capable = True

    def apply_batch(self, batch, rng):
        batch = dict(batch)
        img = batch["image"]
        n, h, w, _ = img.shape
        is_u8 = img.dtype == jnp.uint8
        x = img.astype(jnp.float32) / (255.0 if is_u8 else 1.0)
        r_apply, r_noise = jax.random.split(rng)
        noise = jax.random.normal(r_noise, (n, h, w)) * self.std + self.mean
        # host: cv2.GaussianBlur(f32, ksize=0, sigma) derives
        # ksize = round(sigma*8+1)|1 and uses the formula kernel
        k = int(round(self.gauss_sigma * 8 + 1)) | 1
        r = k // 2
        ax = np.arange(-r, r + 1, dtype=np.float32)
        g1 = np.exp(-0.5 * (ax / self.gauss_sigma) ** 2)
        g1 /= g1.sum()
        nf = noise[..., None]
        nf = _fixed_filter2d(nf, g1[None, :])
        nf = _fixed_filter2d(nf, g1[:, None])
        mask = (nf > self.cutout_threshold).astype(jnp.float32)
        color = np.array([0.8, 0.8, 0.9] if self.mode == "rain"
                         else [0.36, 0.25, 0.18], np.float32)
        y = x * (1 - mask * self.intensity) + \
            jnp.asarray(color) * mask * self.intensity
        if is_u8:
            y = jnp.clip(y * 255.0, 0, 255)  # host _from_float01: clip+trunc
        m = _bernoulli_mask(r_apply, n, self.p)
        out = jnp.where(m, y, img.astype(jnp.float32) if is_u8 else x)
        batch["image"] = out.astype(jnp.uint8) if is_u8 else out
        return batch


@TRANSFORMS.register_class
class FDA(BaseTransform):
    """Fourier domain adaptation: swap the low-frequency FFT amplitude with a
    reference image's (Yang & Soatto 2020). ``reference_images`` is a list of
    file paths or arrays."""

    def __init__(self, reference_images, beta_limit: float = 0.1,
                 read_fn=None, always_apply: bool = False, p: float = 0.5, **_):
        super().__init__(always_apply, p)
        self.reference_images = list(reference_images)
        self.beta_limit = (0, beta_limit) if isinstance(beta_limit, (int, float)) \
            else tuple(beta_limit)

    def _load_ref(self):
        ref = self.reference_images[int(self.rng.integers(len(self.reference_images)))]
        if isinstance(ref, str):
            ref = cv2.cvtColor(cv2.imread(ref), cv2.COLOR_BGR2RGB)
        return ref

    def apply(self, image, **params):
        beta = float(self.rng.uniform(*self.beta_limit))
        ref = self._load_ref()
        ref = cv2.resize(ref, (image.shape[1], image.shape[0]))
        src, was_uint8 = _to_float01(image)
        trg, _ = _to_float01(ref)
        out = np.zeros_like(src)
        h, w = src.shape[:2]
        b = max(1, int(min(h, w) * beta))
        for ch in range(src.shape[-1]):
            fs = np.fft.fftshift(np.fft.fft2(src[..., ch]))
            ft = np.fft.fftshift(np.fft.fft2(trg[..., ch]))
            amp_s, pha_s = np.abs(fs), np.angle(fs)
            amp_t = np.abs(ft)
            cy, cx = h // 2, w // 2
            amp_s[cy - b:cy + b, cx - b:cx + b] = amp_t[cy - b:cy + b, cx - b:cx + b]
            out[..., ch] = np.real(np.fft.ifft2(np.fft.ifftshift(amp_s * np.exp(1j * pha_s))))
        return _from_float01(np.clip(out, 0, 1), was_uint8)


@TRANSFORMS.register_class
class HistogramMatching(BaseTransform):
    """Match the image histogram to a random reference image's."""

    def __init__(self, reference_images, blend_ratio=(0.5, 1.0), read_fn=None,
                 always_apply: bool = False, p: float = 0.5, **_):
        super().__init__(always_apply, p)
        self.reference_images = list(reference_images)
        self.blend_ratio = tuple(blend_ratio)

    def _load_ref(self):
        ref = self.reference_images[int(self.rng.integers(len(self.reference_images)))]
        if isinstance(ref, str):
            ref = cv2.cvtColor(cv2.imread(ref), cv2.COLOR_BGR2RGB)
        return ref

    @staticmethod
    def _match_channel(src, ref):
        s_values, s_idx, s_counts = np.unique(src.ravel(), return_inverse=True,
                                              return_counts=True)
        r_values, r_counts = np.unique(ref.ravel(), return_counts=True)
        s_cdf = np.cumsum(s_counts).astype(np.float64) / src.size
        r_cdf = np.cumsum(r_counts).astype(np.float64) / ref.size
        interp = np.interp(s_cdf, r_cdf, r_values)
        return interp[s_idx].reshape(src.shape)

    def apply(self, image, **params):
        ref = self._load_ref()
        blend = float(self.rng.uniform(*self.blend_ratio))
        matched = np.stack([self._match_channel(image[..., c], ref[..., c])
                            for c in range(image.shape[-1])], axis=-1)
        out = blend * matched + (1 - blend) * image.astype(np.float64)
        return np.clip(out, 0, 255).astype(np.uint8) if image.dtype == np.uint8 \
            else out.astype(image.dtype)


@TRANSFORMS.register_class
class PixelDistributionAdaptation(BaseTransform):
    """Per-channel mean/std alignment to a reference image (the 'simple'
    transform_type of the albumentations original)."""

    def __init__(self, reference_images, blend_ratio=(0.25, 1.0), read_fn=None,
                 transform_type: str = "standard", always_apply: bool = False,
                 p: float = 0.5, **_):
        super().__init__(always_apply, p)
        self.reference_images = list(reference_images)
        self.blend_ratio = tuple(blend_ratio)

    def _load_ref(self):
        ref = self.reference_images[int(self.rng.integers(len(self.reference_images)))]
        if isinstance(ref, str):
            ref = cv2.cvtColor(cv2.imread(ref), cv2.COLOR_BGR2RGB)
        return ref

    def apply(self, image, **params):
        ref = self._load_ref()
        blend = float(self.rng.uniform(*self.blend_ratio))
        src, was_uint8 = _to_float01(image)
        trg, _ = _to_float01(ref)
        s_mean, s_std = src.mean((0, 1)), src.std((0, 1)) + 1e-6
        t_mean, t_std = trg.mean((0, 1)), trg.std((0, 1)) + 1e-6
        adapted = (src - s_mean) / s_std * t_std + t_mean
        out = blend * adapted + (1 - blend) * src
        return _from_float01(np.clip(out, 0, 1), was_uint8)


@TRANSFORMS.register_class
class TemplateTransform(BaseTransform):
    """Blend the image with a template image."""

    def __init__(self, templates, img_weight=0.5, template_weight=0.5,
                 template_transform=None, always_apply: bool = False,
                 p: float = 0.5, **_):
        super().__init__(always_apply, p)
        self.templates = list(templates) if isinstance(templates, (list, tuple)) \
            else [templates]
        self.img_weight = (img_weight, img_weight) \
            if isinstance(img_weight, (int, float)) else tuple(img_weight)
        self.template_weight = (template_weight, template_weight) \
            if isinstance(template_weight, (int, float)) else tuple(template_weight)

    def apply(self, image, **params):
        t = self.templates[int(self.rng.integers(len(self.templates)))]
        if isinstance(t, str):
            t = cv2.cvtColor(cv2.imread(t), cv2.COLOR_BGR2RGB)
        t = cv2.resize(t, (image.shape[1], image.shape[0]))
        iw = float(self.rng.uniform(*self.img_weight))
        tw = float(self.rng.uniform(*self.template_weight))
        out = image.astype(np.float32) * iw + t.astype(np.float32) * tw
        return np.clip(out, 0, 255).astype(np.uint8) if image.dtype == np.uint8 else out
