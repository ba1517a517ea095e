"""Spatial (geometry) transforms — host path over cv2/numpy.

These run per-sample in loader worker threads (cv2 releases the GIL), since
geometry with per-sample output shapes cannot batch onto the TPU cheaply.
Names/parameters mirror the Albumentations ops the reference registers
(reference: torchok/data/transforms/__init__.py:30-67) plus the custom
FitResize (reference: torchok/data/transforms/spatial.py:13-72).
"""
from __future__ import annotations

from fractions import Fraction
from typing import Any, Dict, Optional, Sequence, Tuple, Union

import cv2
import numpy as np

from torchok_tpu.constructor import TRANSFORMS
from torchok_tpu.data.transforms.base import BaseTransform

_INTERP = cv2.INTER_LINEAR


def _resize(img: np.ndarray, h: int, w: int, interpolation=_INTERP) -> np.ndarray:
    if img.shape[0] == h and img.shape[1] == w:
        return img
    out = cv2.resize(img, (w, h), interpolation=interpolation)
    if out.ndim == 2 and img.ndim == 3:
        out = out[..., None]
    return out


@TRANSFORMS.register_class
class Resize(BaseTransform):
    always_apply = True
    device_capable = True
    device_needs_uniform = True  # batched resize needs one input shape

    def __init__(self, height: int, width: int, interpolation: int = _INTERP,
                 always_apply: bool = False, p: float = 1.0, **_):
        super().__init__(always_apply, p)
        self.height, self.width = height, width
        self.interpolation = interpolation

    def apply(self, image, **params):
        return _resize(image, self.height, self.width, self.interpolation)

    def apply_batch(self, batch, rng):
        import jax
        import jax.numpy as jnp
        batch = dict(batch)
        img = batch["image"]
        n, h, w, c = img.shape
        if (h, w) != (self.height, self.width):
            out = jax.image.resize(img.astype(jnp.float32),
                                   (n, self.height, self.width, c), "linear")
            batch["image"] = out if jnp.issubdtype(img.dtype, jnp.floating) \
                else jnp.clip(out + 0.5, 0, 255).astype(img.dtype)
        if batch.get("mask") is not None and "mask" in batch:
            mask = batch["mask"]
            if mask.shape[1:3] != (self.height, self.width):
                m = mask[..., None] if mask.ndim == 3 else mask
                m = jax.image.resize(m, (n, self.height, self.width, m.shape[-1]),
                                     "nearest")
                batch["mask"] = m[..., 0] if mask.ndim == 3 else m
        return batch

    def apply_to_mask(self, mask, **params):
        return _resize(mask, self.height, self.width, cv2.INTER_NEAREST)

    def apply_to_bboxes(self, bboxes, image_shape, **params):
        # pixel xyxy convention (detection datasets)
        h, w = image_shape[:2]
        scale = np.array([self.width / w, self.height / h] * 2, np.float32)
        return np.asarray(bboxes, np.float32) * scale


@TRANSFORMS.register_class
class FitResize(BaseTransform):
    """Aspect-preserving fit-in-rectangle resize (reference custom op)."""

    always_apply = True

    def __init__(self, max_height: int = 1024, max_width: int = 1024,
                 interpolation: int = _INTERP, always_apply: bool = False,
                 p: float = 1.0, **_):
        super().__init__(always_apply, p)
        self.max_height, self.max_width = max_height, max_width
        self.interpolation = interpolation
        self.aspect_ratio = Fraction(max_height, max_width)

    def _scale(self, h: int, w: int) -> float:
        if Fraction(h, w) >= self.aspect_ratio:
            return self.max_height / h
        return self.max_width / w

    def apply(self, image, **params):
        h, w = image.shape[:2]
        s = self._scale(h, w)
        return _resize(image, max(1, round(h * s)), max(1, round(w * s)), self.interpolation)

    def apply_to_mask(self, mask, **params):
        h, w = mask.shape[:2]
        s = self._scale(h, w)
        return _resize(mask, max(1, round(h * s)), max(1, round(w * s)), cv2.INTER_NEAREST)


@TRANSFORMS.register_class
class LongestMaxSize(BaseTransform):
    always_apply = True

    def __init__(self, max_size: int = 1024, interpolation: int = _INTERP,
                 always_apply: bool = False, p: float = 1.0, **_):
        super().__init__(always_apply, p)
        self.max_size = max_size
        self.interpolation = interpolation

    def apply(self, image, **params):
        h, w = image.shape[:2]
        s = self.max_size / max(h, w)
        return _resize(image, round(h * s), round(w * s), self.interpolation)

    def apply_to_mask(self, mask, **params):
        h, w = mask.shape[:2]
        s = self.max_size / max(h, w)
        return _resize(mask, round(h * s), round(w * s), cv2.INTER_NEAREST)


@TRANSFORMS.register_class
class SmallestMaxSize(BaseTransform):
    always_apply = True

    def __init__(self, max_size: int = 1024, interpolation: int = _INTERP,
                 always_apply: bool = False, p: float = 1.0, **_):
        super().__init__(always_apply, p)
        self.max_size = max_size
        self.interpolation = interpolation

    def apply(self, image, **params):
        h, w = image.shape[:2]
        s = self.max_size / min(h, w)
        return _resize(image, round(h * s), round(w * s), self.interpolation)

    def apply_to_mask(self, mask, **params):
        h, w = mask.shape[:2]
        s = self.max_size / min(h, w)
        return _resize(mask, round(h * s), round(w * s), cv2.INTER_NEAREST)


class _CropBase(BaseTransform):
    def _crop(self, arr, y0, x0, h, w):
        return arr[y0:y0 + h, x0:x0 + w]


@TRANSFORMS.register_class
class CenterCrop(_CropBase):
    always_apply = True

    def __init__(self, height: int, width: int, always_apply: bool = False,
                 p: float = 1.0, **_):
        super().__init__(always_apply, p)
        self.height, self.width = height, width

    def get_params(self, sample):
        h, w = sample["image"].shape[:2]
        return {"y0": max(0, (h - self.height) // 2), "x0": max(0, (w - self.width) // 2)}

    def apply(self, image, y0=0, x0=0, **params):
        return self._crop(image, y0, x0, self.height, self.width)

    def apply_to_mask(self, mask, y0=0, x0=0, **params):
        return self._crop(mask, y0, x0, self.height, self.width)


@TRANSFORMS.register_class
class RandomCrop(_CropBase):
    def __init__(self, height: int, width: int, always_apply: bool = False,
                 p: float = 1.0, **_):
        super().__init__(always_apply, p)
        self.height, self.width = height, width

    def get_params(self, sample):
        h, w = sample["image"].shape[:2]
        y0 = int(self.rng.integers(0, max(h - self.height, 0) + 1))
        x0 = int(self.rng.integers(0, max(w - self.width, 0) + 1))
        return {"y0": y0, "x0": x0}

    def apply(self, image, y0=0, x0=0, **params):
        return self._crop(image, y0, x0, self.height, self.width)

    def apply_to_mask(self, mask, y0=0, x0=0, **params):
        return self._crop(mask, y0, x0, self.height, self.width)


@TRANSFORMS.register_class
class Crop(_CropBase):
    always_apply = True

    def __init__(self, x_min: int = 0, y_min: int = 0, x_max: int = 1024,
                 y_max: int = 1024, always_apply: bool = False, p: float = 1.0, **_):
        super().__init__(always_apply, p)
        self.x_min, self.y_min, self.x_max, self.y_max = x_min, y_min, x_max, y_max

    def apply(self, image, **params):
        return image[self.y_min:self.y_max, self.x_min:self.x_max]

    def apply_to_mask(self, mask, **params):
        return mask[self.y_min:self.y_max, self.x_min:self.x_max]


@TRANSFORMS.register_class
class RandomResizedCrop(BaseTransform):
    def __init__(self, height: int, width: int, scale=(0.08, 1.0),
                 ratio=(3 / 4, 4 / 3), interpolation: int = _INTERP,
                 always_apply: bool = False, p: float = 1.0, **_):
        super().__init__(always_apply, p)
        self.height, self.width = height, width
        self.scale, self.ratio = tuple(scale), tuple(ratio)
        self.interpolation = interpolation

    def get_params(self, sample):
        h, w = sample["image"].shape[:2]
        area = h * w
        for _ in range(10):
            target_area = area * self.rng.uniform(*self.scale)
            log_ratio = (np.log(self.ratio[0]), np.log(self.ratio[1]))
            aspect = np.exp(self.rng.uniform(*log_ratio))
            cw = int(round(np.sqrt(target_area * aspect)))
            ch = int(round(np.sqrt(target_area / aspect)))
            if 0 < cw <= w and 0 < ch <= h:
                y0 = int(self.rng.integers(0, h - ch + 1))
                x0 = int(self.rng.integers(0, w - cw + 1))
                return {"y0": y0, "x0": x0, "ch": ch, "cw": cw}
        # fallback: center crop
        cw, ch = min(w, h), min(w, h)
        return {"y0": (h - ch) // 2, "x0": (w - cw) // 2, "ch": ch, "cw": cw}

    def apply(self, image, y0=0, x0=0, ch=1, cw=1, **params):
        crop = image[y0:y0 + ch, x0:x0 + cw]
        return _resize(crop, self.height, self.width, self.interpolation)

    def apply_to_mask(self, mask, y0=0, x0=0, ch=1, cw=1, **params):
        crop = mask[y0:y0 + ch, x0:x0 + cw]
        return _resize(crop, self.height, self.width, cv2.INTER_NEAREST)


@TRANSFORMS.register_class
class PadIfNeeded(BaseTransform):
    always_apply = True

    def __init__(self, min_height: int = 1024, min_width: int = 1024,
                 border_mode: int = cv2.BORDER_REFLECT_101, value=None,
                 mask_value=None, always_apply: bool = False, p: float = 1.0, **_):
        super().__init__(always_apply, p)
        self.min_height, self.min_width = min_height, min_width
        self.border_mode = border_mode
        self.value = value
        self.mask_value = mask_value

    def _pads(self, h, w):
        ph = max(self.min_height - h, 0)
        pw = max(self.min_width - w, 0)
        return ph // 2, ph - ph // 2, pw // 2, pw - pw // 2

    def apply(self, image, **params):
        t, b, l, r = self._pads(*image.shape[:2])
        return cv2.copyMakeBorder(image, t, b, l, r, self.border_mode,
                                  value=self.value)

    def apply_to_mask(self, mask, **params):
        t, b, l, r = self._pads(*mask.shape[:2])
        return cv2.copyMakeBorder(mask, t, b, l, r, self.border_mode,
                                  value=self.mask_value)


@TRANSFORMS.register_class
class Rotate(BaseTransform):
    def __init__(self, limit: Union[float, Tuple[float, float]] = 90,
                 interpolation: int = _INTERP,
                 border_mode: int = cv2.BORDER_REFLECT_101, value=None,
                 mask_value=None, always_apply: bool = False, p: float = 0.5, **_):
        super().__init__(always_apply, p)
        self.limit = (-limit, limit) if isinstance(limit, (int, float)) else tuple(limit)
        self.interpolation = interpolation
        self.border_mode = border_mode
        self.value = value
        self.mask_value = mask_value

    def get_params(self, sample):
        return {"angle": float(self.rng.uniform(*self.limit))}

    def _rotate(self, img, angle, interp, border, value):
        h, w = img.shape[:2]
        m = cv2.getRotationMatrix2D((w / 2 - 0.5, h / 2 - 0.5), angle, 1.0)
        return cv2.warpAffine(img, m, (w, h), flags=interp, borderMode=border,
                              borderValue=value)

    def apply(self, image, angle=0.0, **params):
        return self._rotate(image, angle, self.interpolation, self.border_mode, self.value)

    def apply_to_mask(self, mask, angle=0.0, **params):
        return self._rotate(mask, angle, cv2.INTER_NEAREST, self.border_mode, self.mask_value)


@TRANSFORMS.register_class
class RandomRotate90(BaseTransform):
    def get_params(self, sample):
        return {"k": int(self.rng.integers(0, 4))}

    def apply(self, image, k=0, **params):
        return np.ascontiguousarray(np.rot90(image, k))

    def apply_to_mask(self, mask, k=0, **params):
        return np.ascontiguousarray(np.rot90(mask, k))


@TRANSFORMS.register_class
class Transpose(BaseTransform):
    def apply(self, image, **params):
        return np.ascontiguousarray(image.swapaxes(0, 1))

    def apply_to_mask(self, mask, **params):
        return np.ascontiguousarray(mask.swapaxes(0, 1))


@TRANSFORMS.register_class
class ShiftScaleRotate(BaseTransform):
    def __init__(self, shift_limit=0.0625, scale_limit=0.1, rotate_limit=45,
                 interpolation: int = _INTERP,
                 border_mode: int = cv2.BORDER_REFLECT_101, value=None,
                 mask_value=None, always_apply: bool = False, p: float = 0.5, **_):
        super().__init__(always_apply, p)
        def _pair(v):
            return (-v, v) if isinstance(v, (int, float)) else tuple(v)
        self.shift_limit = _pair(shift_limit)
        self.scale_limit = _pair(scale_limit)
        self.rotate_limit = _pair(rotate_limit)
        self.interpolation = interpolation
        self.border_mode = border_mode
        self.value = value
        self.mask_value = mask_value

    def get_params(self, sample):
        return {
            "angle": float(self.rng.uniform(*self.rotate_limit)),
            "scale": 1.0 + float(self.rng.uniform(*self.scale_limit)),
            "dx": float(self.rng.uniform(*self.shift_limit)),
            "dy": float(self.rng.uniform(*self.shift_limit)),
        }

    def _warp(self, img, angle, scale, dx, dy, interp, value):
        h, w = img.shape[:2]
        m = cv2.getRotationMatrix2D((w / 2 - 0.5, h / 2 - 0.5), angle, scale)
        m[0, 2] += dx * w
        m[1, 2] += dy * h
        return cv2.warpAffine(img, m, (w, h), flags=interp,
                              borderMode=self.border_mode, borderValue=value)

    def apply(self, image, angle=0.0, scale=1.0, dx=0.0, dy=0.0, **params):
        return self._warp(image, angle, scale, dx, dy, self.interpolation, self.value)

    def apply_to_mask(self, mask, angle=0.0, scale=1.0, dx=0.0, dy=0.0, **params):
        return self._warp(mask, angle, scale, dx, dy, cv2.INTER_NEAREST, self.mask_value)


@TRANSFORMS.register_class
class RandomScale(BaseTransform):
    def __init__(self, scale_limit=0.1, interpolation: int = _INTERP,
                 always_apply: bool = False, p: float = 0.5, **_):
        super().__init__(always_apply, p)
        self.scale_limit = (-scale_limit, scale_limit) if isinstance(scale_limit, (int, float)) \
            else tuple(scale_limit)
        self.interpolation = interpolation

    def get_params(self, sample):
        return {"scale": 1.0 + float(self.rng.uniform(*self.scale_limit))}

    def apply(self, image, scale=1.0, **params):
        h, w = image.shape[:2]
        return _resize(image, round(h * scale), round(w * scale), self.interpolation)

    def apply_to_mask(self, mask, scale=1.0, **params):
        h, w = mask.shape[:2]
        return _resize(mask, round(h * scale), round(w * scale), cv2.INTER_NEAREST)


def _remap(img: np.ndarray, map_x: np.ndarray, map_y: np.ndarray,
           interpolation=_INTERP, border_mode=cv2.BORDER_REFLECT_101) -> np.ndarray:
    out = cv2.remap(img, map_x, map_y, interpolation=interpolation,
                    borderMode=border_mode)
    if out.ndim == 2 and img.ndim == 3:
        out = out[..., None]
    return out


@TRANSFORMS.register_class
class ElasticTransform(BaseTransform):
    """Elastic deformation via a gaussian-smoothed random displacement field."""

    def __init__(self, alpha: float = 1.0, sigma: float = 50.0,
                 alpha_affine: float = 50.0, interpolation: int = _INTERP,
                 border_mode: int = cv2.BORDER_REFLECT_101, value=None,
                 always_apply: bool = False, p: float = 0.5, **_):
        super().__init__(always_apply, p)
        self.alpha = alpha
        self.sigma = sigma
        self.interpolation = interpolation
        self.border_mode = border_mode

    def get_params(self, sample):
        h, w = sample["image"].shape[:2]
        dx = self.rng.uniform(-1, 1, (h, w)).astype(np.float32)
        dy = self.rng.uniform(-1, 1, (h, w)).astype(np.float32)
        k = int(3 * self.sigma) | 1
        dx = cv2.GaussianBlur(dx, (k, k), self.sigma) * self.alpha
        dy = cv2.GaussianBlur(dy, (k, k), self.sigma) * self.alpha
        xs, ys = np.meshgrid(np.arange(w), np.arange(h))
        return {"map_x": (xs + dx).astype(np.float32),
                "map_y": (ys + dy).astype(np.float32)}

    def apply(self, image, map_x=None, map_y=None, **params):
        return _remap(image, map_x, map_y, self.interpolation, self.border_mode)

    def apply_to_mask(self, mask, map_x=None, map_y=None, **params):
        return _remap(mask, map_x, map_y, cv2.INTER_NEAREST, self.border_mode)


@TRANSFORMS.register_class
class GridDistortion(BaseTransform):
    """Per-grid-cell random stretch of the coordinate grid."""

    def __init__(self, num_steps: int = 5, distort_limit: float = 0.3,
                 interpolation: int = _INTERP,
                 border_mode: int = cv2.BORDER_REFLECT_101, value=None,
                 always_apply: bool = False, p: float = 0.5, **_):
        super().__init__(always_apply, p)
        self.num_steps = num_steps
        self.distort_limit = (-distort_limit, distort_limit) \
            if isinstance(distort_limit, (int, float)) else tuple(distort_limit)
        self.interpolation = interpolation
        self.border_mode = border_mode

    def _axis_map(self, size: int) -> np.ndarray:
        steps = 1 + self.rng.uniform(*self.distort_limit, self.num_steps + 1)
        step = size // self.num_steps
        coords = np.zeros(size, np.float32)
        prev, x = 0.0, 0
        for i in range(self.num_steps + 1):
            start = x
            end = min(x + step, size)
            cur = prev + step * steps[i]
            coords[start:end] = np.linspace(prev, cur, end - start, endpoint=False)
            prev = cur
            x = end
        if x < size:
            coords[x:] = prev
        return coords

    def get_params(self, sample):
        h, w = sample["image"].shape[:2]
        xs = self._axis_map(w)
        ys = self._axis_map(h)
        map_x, map_y = np.meshgrid(xs, ys)
        return {"map_x": map_x.astype(np.float32), "map_y": map_y.astype(np.float32)}

    def apply(self, image, map_x=None, map_y=None, **params):
        return _remap(image, map_x, map_y, self.interpolation, self.border_mode)

    def apply_to_mask(self, mask, map_x=None, map_y=None, **params):
        return _remap(mask, map_x, map_y, cv2.INTER_NEAREST, self.border_mode)


@TRANSFORMS.register_class
class OpticalDistortion(BaseTransform):
    """Barrel/pincushion distortion via cv2 undistort maps."""

    def __init__(self, distort_limit: float = 0.05, shift_limit: float = 0.05,
                 interpolation: int = _INTERP,
                 border_mode: int = cv2.BORDER_REFLECT_101, value=None,
                 always_apply: bool = False, p: float = 0.5, **_):
        super().__init__(always_apply, p)
        def _pair(v):
            return (-v, v) if isinstance(v, (int, float)) else tuple(v)
        self.distort_limit = _pair(distort_limit)
        self.shift_limit = _pair(shift_limit)
        self.interpolation = interpolation
        self.border_mode = border_mode

    def get_params(self, sample):
        h, w = sample["image"].shape[:2]
        k = float(self.rng.uniform(*self.distort_limit))
        dx = float(self.rng.uniform(*self.shift_limit)) * w
        dy = float(self.rng.uniform(*self.shift_limit)) * h
        cam = np.array([[w, 0, w / 2 + dx], [0, h, h / 2 + dy], [0, 0, 1]], np.float32)
        dist = np.array([k, k, 0, 0, 0], np.float32)
        map_x, map_y = cv2.initUndistortRectifyMap(cam, dist, None, None, (w, h),
                                                   cv2.CV_32FC1)
        return {"map_x": map_x, "map_y": map_y}

    def apply(self, image, map_x=None, map_y=None, **params):
        return _remap(image, map_x, map_y, self.interpolation, self.border_mode)

    def apply_to_mask(self, mask, map_x=None, map_y=None, **params):
        return _remap(mask, map_x, map_y, cv2.INTER_NEAREST, self.border_mode)


@TRANSFORMS.register_class
class Perspective(BaseTransform):
    def __init__(self, scale=(0.05, 0.1), interpolation: int = _INTERP,
                 always_apply: bool = False, p: float = 0.5, **_):
        super().__init__(always_apply, p)
        self.scale = (0, scale) if isinstance(scale, (int, float)) else tuple(scale)
        self.interpolation = interpolation

    def get_params(self, sample):
        h, w = sample["image"].shape[:2]
        s = self.rng.uniform(*self.scale)
        src = np.float32([[0, 0], [w, 0], [w, h], [0, h]])
        jitter = self.rng.uniform(-s, s, (4, 2)).astype(np.float32) * [w, h]
        dst = src + jitter
        return {"matrix": cv2.getPerspectiveTransform(src, dst.astype(np.float32))}

    def apply(self, image, matrix=None, **params):
        h, w = image.shape[:2]
        return cv2.warpPerspective(image, matrix, (w, h), flags=self.interpolation)

    def apply_to_mask(self, mask, matrix=None, **params):
        h, w = mask.shape[:2]
        return cv2.warpPerspective(mask, matrix, (w, h), flags=cv2.INTER_NEAREST)


@TRANSFORMS.register_class
class Affine(BaseTransform):
    def __init__(self, scale=None, translate_percent=None, rotate=None, shear=None,
                 interpolation: int = _INTERP, always_apply: bool = False,
                 p: float = 0.5, **_):
        super().__init__(always_apply, p)
        def _pair(v, default):
            if v is None:
                return default
            if isinstance(v, (int, float)):
                return (-v, v) if default[0] < 0 else (1 - v, 1 + v)
            if isinstance(v, dict):
                return tuple(v.get("x", default))
            return tuple(v)
        self.scale = _pair(scale, (1.0, 1.0))
        self.translate = _pair(translate_percent, (0.0, 0.0))
        self.rotate = _pair(rotate, (-0.0, 0.0))
        self.shear = _pair(shear, (-0.0, 0.0))
        self.interpolation = interpolation

    def get_params(self, sample):
        return {
            "sc": float(self.rng.uniform(*self.scale)) if self.scale != (1.0, 1.0) else 1.0,
            "tx": float(self.rng.uniform(*self.translate)),
            "ty": float(self.rng.uniform(*self.translate)),
            "ang": float(self.rng.uniform(*self.rotate)),
            "sh": float(self.rng.uniform(*self.shear)),
        }

    def _matrix(self, h, w, sc, tx, ty, ang, sh):
        m = cv2.getRotationMatrix2D((w / 2, h / 2), ang, sc)
        m[0, 2] += tx * w
        m[1, 2] += ty * h
        m[0, 1] += np.tan(np.deg2rad(sh))
        return m

    def apply(self, image, sc=1.0, tx=0.0, ty=0.0, ang=0.0, sh=0.0, **params):
        h, w = image.shape[:2]
        return cv2.warpAffine(image, self._matrix(h, w, sc, tx, ty, ang, sh),
                              (w, h), flags=self.interpolation)

    def apply_to_mask(self, mask, sc=1.0, tx=0.0, ty=0.0, ang=0.0, sh=0.0, **params):
        h, w = mask.shape[:2]
        return cv2.warpAffine(mask, self._matrix(h, w, sc, tx, ty, ang, sh),
                              (w, h), flags=cv2.INTER_NEAREST)
