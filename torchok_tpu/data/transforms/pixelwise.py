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


@TRANSFORMS.register_class
class Normalize(BaseTransform):
    """Albumentations Normalize: (x - mean*max_pixel) / (std*max_pixel)."""

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
    device_capable = True
    device_bbox_safe = False

    def apply(self, image, **params):
        return np.ascontiguousarray(image[:, ::-1])

    def apply_to_mask(self, mask, **params):
        return np.ascontiguousarray(mask[:, ::-1])

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
    device_capable = True
    device_bbox_safe = False

    def apply(self, image, **params):
        return np.ascontiguousarray(image[::-1])

    def apply_to_mask(self, mask, **params):
        return np.ascontiguousarray(mask[::-1])

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

    def get_params(self, sample):
        return {"code": int(self.rng.integers(-1, 2))}

    def apply(self, image, code=0, **params):
        return np.ascontiguousarray(cv2.flip(image, code))

    def apply_to_mask(self, mask, code=0, **params):
        return np.ascontiguousarray(cv2.flip(mask, code))


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
        is_int = jnp.issubdtype(img.dtype, jnp.integer)
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
        if jnp.issubdtype(img.dtype, jnp.integer):
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
        is_int = jnp.issubdtype(img.dtype, jnp.integer)
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
        max_value = 255 if jnp.issubdtype(img.dtype, jnp.integer) else 1.0
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
        is_int = jnp.issubdtype(img.dtype, jnp.integer)
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
        max_value = 255 if jnp.issubdtype(img.dtype, jnp.integer) else 1.0
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
    def get_params(self, sample):
        c = sample["image"].shape[-1]
        return {"perm": self.rng.permutation(c)}

    def apply(self, image, perm=None, **params):
        return image[..., perm]


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
        if jnp.issubdtype(img.dtype, jnp.integer):
            out = jnp.clip(out, 0, 255).astype(img.dtype)
        batch["image"] = out
        return batch


@TRANSFORMS.register_class
class ToFloat(BaseTransform):
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
        mv = self.max_value or (255.0 if jnp.issubdtype(img.dtype, jnp.integer) else 1.0)
        batch["image"] = img.astype(jnp.float32) / mv
        return batch


@TRANSFORMS.register_class
class FromFloat(BaseTransform):
    always_apply = True

    def __init__(self, dtype: str = "uint16", max_value: Optional[float] = None,
                 always_apply: bool = False, p: float = 1.0, **_):
        super().__init__(always_apply, p)
        self.dtype = np.dtype(dtype)
        self.max_value = max_value

    def apply(self, image, **params):
        mv = self.max_value or np.iinfo(self.dtype).max
        return (image * mv).astype(self.dtype)


# ------------------------------ host-only ops ------------------------------

@TRANSFORMS.register_class
class Blur(BaseTransform):
    def __init__(self, blur_limit=7, always_apply: bool = False, p: float = 0.5, **_):
        super().__init__(always_apply, p)
        self.blur_limit = (3, blur_limit) if isinstance(blur_limit, int) else tuple(blur_limit)

    def get_params(self, sample):
        k = int(self.rng.integers(self.blur_limit[0] // 2, self.blur_limit[1] // 2 + 1)) * 2 + 1
        return {"ksize": k}

    def apply(self, image, ksize=3, **params):
        return cv2.blur(image, (ksize, ksize))


@TRANSFORMS.register_class
class GaussianBlur(BaseTransform):
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


@TRANSFORMS.register_class
class MedianBlur(BaseTransform):
    def __init__(self, blur_limit=7, always_apply: bool = False, p: float = 0.5, **_):
        super().__init__(always_apply, p)
        self.blur_limit = (3, blur_limit) if isinstance(blur_limit, int) else tuple(blur_limit)

    def get_params(self, sample):
        k = int(self.rng.integers(self.blur_limit[0] // 2, self.blur_limit[1] // 2 + 1)) * 2 + 1
        return {"ksize": k}

    def apply(self, image, ksize=3, **params):
        return cv2.medianBlur(image, ksize)


@TRANSFORMS.register_class
class MotionBlur(BaseTransform):
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


@TRANSFORMS.register_class
class CLAHE(BaseTransform):
    def __init__(self, clip_limit=4.0, tile_grid_size=(8, 8),
                 always_apply: bool = False, p: float = 0.5, **_):
        super().__init__(always_apply, p)
        self.clip_limit = (1.0, clip_limit) if isinstance(clip_limit, (int, float)) else tuple(clip_limit)
        self.tile_grid_size = tuple(tile_grid_size)

    def apply(self, image, **params):
        clip = float(self.rng.uniform(*self.clip_limit))
        clahe = cv2.createCLAHE(clipLimit=clip, tileGridSize=self.tile_grid_size)
        lab = cv2.cvtColor(image, cv2.COLOR_RGB2LAB)
        lab[..., 0] = clahe.apply(lab[..., 0])
        return cv2.cvtColor(lab, cv2.COLOR_LAB2RGB)


@TRANSFORMS.register_class
class Equalize(BaseTransform):
    def apply(self, image, **params):
        if image.ndim == 2:
            return cv2.equalizeHist(image)
        out = image.copy()
        for c in range(image.shape[-1]):
            out[..., c] = cv2.equalizeHist(image[..., c])
        return out


@TRANSFORMS.register_class
class HueSaturationValue(BaseTransform):
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

    def apply(self, image, **params):
        s = float(self.rng.uniform(self.scale_min, self.scale_max))
        h, w = image.shape[:2]
        small = cv2.resize(image, (max(1, int(w * s)), max(1, int(h * s))),
                           interpolation=self.interpolation)
        return cv2.resize(small, (w, h), interpolation=self.interpolation)


@TRANSFORMS.register_class
class Sharpen(BaseTransform):
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


@TRANSFORMS.register_class
class ToSepia(BaseTransform):
    _M = np.array([[0.393, 0.769, 0.189],
                   [0.349, 0.686, 0.168],
                   [0.272, 0.534, 0.131]], np.float32)

    def apply(self, image, **params):
        out = image.astype(np.float32) @ self._M.T
        if image.dtype == np.uint8:
            return np.clip(out, 0, 255).astype(np.uint8)
        return np.clip(out, 0, 1.0)
