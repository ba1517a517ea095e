"""Spatial (geometry) transforms — host path over cv2/numpy, plus batched
device paths for the high-traffic fixed-output-shape geometry.

Host: per-sample in loader worker threads (cv2 releases the GIL).
Device: ops whose OUTPUT shape is static (RandomResizedCrop / crops at a
configured size, same-size warps like Rotate / ShiftScaleRotate) additionally
implement ``apply_batch`` over the NHWC batch via the vmapped
gather-interpolate kernel in :mod:`torchok_tpu.ops.warp` — per-sample random
parameters from folded JAX keys, mask co-transforms with nearest sampling,
cv2 conventions so host/device paths agree. Geometry with data-dependent
output shapes (RandomScale, LongestMaxSize, ...) stays host-only.
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
from torchok_tpu.data.transforms.pixelwise import _saturate_int

_INTERP = cv2.INTER_LINEAR


def _resize(img: np.ndarray, h: int, w: int, interpolation=_INTERP) -> np.ndarray:
    if img.shape[0] == h and img.shape[1] == w:
        return img
    out = cv2.resize(img, (w, h), interpolation=interpolation)
    if out.ndim == 2 and img.ndim == 3:
        out = out[..., None]
    return out


# --------------------- device (batched TPU) geometry ----------------------

_DEVICE_BORDERS = {cv2.BORDER_CONSTANT: "constant",
                   cv2.BORDER_REPLICATE: "replicate",
                   cv2.BORDER_REFLECT_101: "reflect101"}
_DEVICE_INTERPS = (cv2.INTER_LINEAR, cv2.INTER_NEAREST)


def _scalar_or_none(v) -> bool:
    return v is None or isinstance(v, (int, float))


def _device_warp_batch(batch, inv_mats, out_hw, applied, interpolation,
                       border_mode, value, mask_value):
    """Warp image (+mask) with per-sample DST->SRC affines on device.

    ``applied`` (N,) bool selects identity per sample (requires
    out_hw == input hw); image samples bilinear/nearest per
    ``interpolation``, the mask always nearest with ``mask_value`` fill.
    """
    import jax.numpy as jnp

    from torchok_tpu.ops.warp import inverse_affine_sample

    batch = dict(batch)
    img = batch["image"]
    border = _DEVICE_BORDERS[border_mode]
    method = "nearest" if interpolation == cv2.INTER_NEAREST else "bilinear"
    fill = 0.0 if value is None else float(value)
    x = img.astype(jnp.float32)
    out = inverse_affine_sample(x, inv_mats, out_hw, method, border, fill)
    if applied is not None:
        out = jnp.where(applied.reshape(-1, 1, 1, 1), out, x)
    if not jnp.issubdtype(img.dtype, jnp.floating):
        out = _saturate_int(out, img.dtype, round_half_up=True)
    batch["image"] = out

    if batch.get("mask") is not None and "mask" in batch:
        mask = batch["mask"]
        m = mask[..., None] if mask.ndim == 3 else mask
        mfill = 0.0 if mask_value is None else float(mask_value)
        mo = inverse_affine_sample(m, inv_mats, out_hw, "nearest", border,
                                   mfill)
        if applied is not None:
            mo = jnp.where(applied.reshape(-1, 1, 1, 1), mo, m)
        batch["mask"] = mo[..., 0] if mask.ndim == 3 else mo
    return batch


def _device_crop_batch(batch, rects, out_hw):
    """Per-sample integer crop-resize on device (image bilinear if resampling
    is real, exact nearest when the rect size equals the output; mask
    nearest)."""
    import jax.numpy as jnp

    from torchok_tpu.ops.warp import crop_resize_sample

    batch = dict(batch)
    img = batch["image"]
    x = img.astype(jnp.float32)
    out = crop_resize_sample(x, rects, out_hw, "bilinear", "replicate")
    if not jnp.issubdtype(img.dtype, jnp.floating):
        out = _saturate_int(out, img.dtype, round_half_up=True)
    batch["image"] = out
    if batch.get("mask") is not None and "mask" in batch:
        mask = batch["mask"]
        m = mask[..., None] if mask.ndim == 3 else mask
        mo = crop_resize_sample(m, rects, out_hw, "nearest", "replicate")
        batch["mask"] = mo[..., 0] if mask.ndim == 3 else mo
    return batch


def _device_remap_batch(batch, map_x, map_y, applied, interpolation,
                        border_mode, value=None, mask_value=None):
    """Remap image (+mask) with per-sample dense coordinate maps on device
    (the cv2.remap analogue of :func:`_device_warp_batch`). ``map_x``/
    ``map_y`` are (N, H, W); ``applied`` (N,) bool selects identity."""
    import jax.numpy as jnp

    from torchok_tpu.ops.warp import remap_sample

    batch = dict(batch)
    img = batch["image"]
    border = _DEVICE_BORDERS[border_mode]
    # cv2.remap's nearest is cvRound (half to even), unlike warpAffine
    method = "nearest_even" if interpolation == cv2.INTER_NEAREST \
        else "bilinear"
    fill = 0.0 if value is None else float(value)
    x = img.astype(jnp.float32)
    out = remap_sample(x, map_x, map_y, method, border, fill)
    if applied is not None:
        out = jnp.where(applied.reshape(-1, 1, 1, 1), out, x)
    if not jnp.issubdtype(img.dtype, jnp.floating):
        out = _saturate_int(out, img.dtype, round_half_up=True)
    batch["image"] = out

    if batch.get("mask") is not None and "mask" in batch:
        mask = batch["mask"]
        m = mask[..., None] if mask.ndim == 3 else mask
        mfill = 0.0 if mask_value is None else float(mask_value)
        mo = remap_sample(m, map_x, map_y, "nearest_even", border, mfill)
        if applied is not None:
            mo = jnp.where(applied.reshape(-1, 1, 1, 1), mo, m)
        batch["mask"] = mo[..., 0] if mask.ndim == 3 else mo
    return batch


def _gauss_blur_field(field, ksize: int, sigma: float):
    """cv2.GaussianBlur of a (N, H, W) float field with a STATIC
    ksize/sigma kernel and reflect-101 borders. Padding is take-based so a
    radius larger than the field (elastic sigma 50 on small crops) keeps
    cv2's periodic mirror semantics where ``jnp.pad(mode='reflect')`` would
    fail."""
    import jax
    import jax.numpy as jnp

    from torchok_tpu.data.transforms.pixelwise import _reflect101_pad

    r = ksize // 2
    if r == 0 or sigma <= 0:
        return field
    xs = np.arange(ksize, dtype=np.float64) - r
    k = np.exp(-(xs ** 2) / (2.0 * sigma * sigma))
    k = jnp.asarray(k / k.sum(), jnp.float32)

    x = field[:, None]  # (N, 1, H, W)
    x = _reflect101_pad(x, 2, r)
    x = jax.lax.conv_general_dilated(x, k.reshape(1, 1, -1, 1), (1, 1),
                                     "VALID")
    x = _reflect101_pad(x, 3, r)
    x = jax.lax.conv_general_dilated(x, k.reshape(1, 1, 1, -1), (1, 1),
                                     "VALID")
    return x[:, 0]


def _device_resize_to(batch, th, tw, interpolation=cv2.INTER_LINEAR):
    """Batched deterministic resize of image (+mask) to a STATIC (th, tw).

    Image resampling is cv2-parity 2-tap bilinear
    (:func:`torchok_tpu.ops.image.resize_bilinear` — ``jax.image.resize``
    would antialias on downscale and diverge from the host cv2 path) or
    nearest; masks always nearest. Shared by Resize / FitResize /
    LongestMaxSize / SmallestMaxSize."""
    import jax.numpy as jnp

    from torchok_tpu.ops.image import resize_bilinear, resize_nearest_cv2

    batch = dict(batch)
    img = batch["image"]
    if img.shape[1:3] != (th, tw):
        x = img.astype(jnp.float32)
        out = resize_nearest_cv2(x, (th, tw)) \
            if interpolation == cv2.INTER_NEAREST \
            else resize_bilinear(x, (th, tw))
        batch["image"] = out if jnp.issubdtype(img.dtype, jnp.floating) \
            else _saturate_int(out, img.dtype, round_half_up=True)
    if batch.get("mask") is not None and "mask" in batch:
        mask = batch["mask"]
        if mask.shape[1:3] != (th, tw):
            m = mask[..., None] if mask.ndim == 3 else mask
            m = resize_nearest_cv2(m, (th, tw))
            batch["mask"] = m[..., 0] if mask.ndim == 3 else m
    return batch


def _device_pad_batch(arr, t, b, l, r, border_mode, value):
    """cv2.copyMakeBorder of an NHWC batch with STATIC asymmetric pads."""
    import jax.numpy as jnp

    from torchok_tpu.data.transforms.pixelwise import _reflect101_pad

    if border_mode == cv2.BORDER_CONSTANT:
        fill = 0 if value is None else value
        out = jnp.pad(arr, ((0, 0), (t, b), (l, r)) + ((0, 0),) * (arr.ndim - 3),
                      mode="constant", constant_values=0)
        if fill:
            # cv2 scalar value is Scalar(v, 0, 0, 0): only channel 0 is
            # filled on multi-channel images
            h, w = arr.shape[1:3]
            ind = np.ones((h + t + b, w + l + r), bool)
            ind[t:t + h, l:l + w] = False
            ind = jnp.asarray(ind)[None, :, :]
            if arr.ndim == 4:
                vec = np.zeros(arr.shape[3])
                vec[0] = fill
                out = out + (ind[..., None]
                             * jnp.asarray(vec)[None, None, None, :]).astype(out.dtype)
            else:
                out = out + (ind * fill).astype(out.dtype)
        return out
    if border_mode == cv2.BORDER_REPLICATE:
        return jnp.pad(arr, ((0, 0), (t, b), (l, r)) + ((0, 0),) * (arr.ndim - 3),
                       mode="edge")
    return _reflect101_pad(_reflect101_pad(arr, 1, t, b), 2, l, r)


def _device_perspective_batch(batch, mats, out_hw, applied, interpolation):
    """Projective warp of image (+mask) with per-sample SRC->DST 3x3 mats
    (cv2.warpPerspective defaults: constant-0 border)."""
    import jax.numpy as jnp

    from torchok_tpu.ops.warp import perspective_sample

    batch = dict(batch)
    img = batch["image"]
    method = "nearest" if interpolation == cv2.INTER_NEAREST else "bilinear"
    x = img.astype(jnp.float32)
    out = perspective_sample(x, mats, out_hw, method, "constant", 0.0)
    if applied is not None:
        out = jnp.where(applied.reshape(-1, 1, 1, 1), out, x)
    if not jnp.issubdtype(img.dtype, jnp.floating):
        out = _saturate_int(out, img.dtype, round_half_up=True)
    batch["image"] = out
    if batch.get("mask") is not None and "mask" in batch:
        mask = batch["mask"]
        m = mask[..., None] if mask.ndim == 3 else mask
        mo = perspective_sample(m, mats, out_hw, "nearest", "constant", 0.0)
        if applied is not None:
            mo = jnp.where(applied.reshape(-1, 1, 1, 1), mo, m)
        batch["mask"] = mo[..., 0] if mask.ndim == 3 else mo
    return batch


# ------------------------------ bbox helpers ------------------------------
# Boxes are pixel pascal_voc xyxy rows; transforms keep row alignment with
# the labels (clip, never drop) — degenerate boxes are filtered by the
# dataset after the pipeline (DetectionDataset.__getitem__).

def _as_boxes(bboxes) -> np.ndarray:
    return np.asarray(bboxes, np.float32).reshape(-1, 4)


def _scale_bboxes(bboxes, sx: float, sy: float) -> np.ndarray:
    b = _as_boxes(bboxes).copy()
    b[:, [0, 2]] *= sx
    b[:, [1, 3]] *= sy
    return b


def _shift_clip_bboxes(bboxes, x0, y0, crop_w, crop_h):
    b = _as_boxes(bboxes).copy()
    b[:, [0, 2]] -= x0
    b[:, [1, 3]] -= y0
    b[:, [0, 2]] = np.clip(b[:, [0, 2]], 0, crop_w)
    b[:, [1, 3]] = np.clip(b[:, [1, 3]], 0, crop_h)
    return b


def _affine_bboxes(bboxes, m, out_w: int, out_h: int) -> np.ndarray:
    """Map each box's 4 corners through a 2x3 affine (or 3x3 projective)
    matrix, take the axis-aligned envelope, clip to the output frame."""
    b = _as_boxes(bboxes)
    if len(b) == 0:
        return b
    corners = np.stack([b[:, [0, 1]], b[:, [2, 1]],
                        b[:, [0, 3]], b[:, [2, 3]]], axis=1)  # (N, 4, 2)
    ones = np.ones(corners.shape[:2] + (1,), np.float32)
    pts = np.concatenate([corners, ones], axis=-1) @ np.asarray(m, np.float32).T
    if pts.shape[-1] == 3:  # projective: de-homogenize
        pts = pts[..., :2] / np.clip(pts[..., 2:3], 1e-9, None)
    out = np.stack([pts[..., 0].min(1), pts[..., 1].min(1),
                    pts[..., 0].max(1), pts[..., 1].max(1)], axis=1)
    out[:, [0, 2]] = np.clip(out[:, [0, 2]], 0, out_w)
    out[:, [1, 3]] = np.clip(out[:, [1, 3]], 0, out_h)
    return out


@TRANSFORMS.register_class
class Resize(BaseTransform):
    always_apply = True
    geometric = True
    device_needs_uniform = True  # batched resize needs one input shape
    device_bbox_safe = False  # apply_batch does not rescale bboxes

    def __init__(self, height: int, width: int, interpolation: int = _INTERP,
                 always_apply: bool = False, p: float = 1.0, **_):
        super().__init__(always_apply, p)
        self.height, self.width = height, width
        self.interpolation = interpolation

    @property
    def device_capable(self):
        return self.interpolation in _DEVICE_INTERPS

    def apply(self, image, **params):
        return _resize(image, self.height, self.width, self.interpolation)

    def apply_batch(self, batch, rng):
        return _device_resize_to(batch, self.height, self.width,
                                 self.interpolation)

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
    geometric = True
    device_needs_uniform = True  # target size derives from the static shape
    device_bbox_safe = False

    def __init__(self, max_height: int = 1024, max_width: int = 1024,
                 interpolation: int = _INTERP, always_apply: bool = False,
                 p: float = 1.0, **_):
        super().__init__(always_apply, p)
        self.max_height, self.max_width = max_height, max_width
        self.interpolation = interpolation
        self.aspect_ratio = Fraction(max_height, max_width)

    @property
    def device_capable(self):
        return self.interpolation in _DEVICE_INTERPS

    def _scale(self, h: int, w: int) -> float:
        if Fraction(h, w) >= self.aspect_ratio:
            return self.max_height / h
        return self.max_width / w

    def apply_batch(self, batch, rng):
        h, w = batch["image"].shape[1:3]
        s = self._scale(h, w)
        return _device_resize_to(batch, max(1, round(h * s)),
                                 max(1, round(w * s)), self.interpolation)

    def apply(self, image, **params):
        h, w = image.shape[:2]
        s = self._scale(h, w)
        return _resize(image, max(1, round(h * s)), max(1, round(w * s)), self.interpolation)

    def apply_to_mask(self, mask, **params):
        h, w = mask.shape[:2]
        s = self._scale(h, w)
        return _resize(mask, max(1, round(h * s)), max(1, round(w * s)), cv2.INTER_NEAREST)

    def apply_to_bboxes(self, bboxes, image_shape, **params):
        h, w = image_shape[:2]
        s = self._scale(h, w)
        nh, nw = max(1, round(h * s)), max(1, round(w * s))
        return _scale_bboxes(bboxes, nw / w, nh / h)


@TRANSFORMS.register_class
class LongestMaxSize(BaseTransform):
    always_apply = True
    geometric = True
    device_needs_uniform = True
    device_bbox_safe = False

    def __init__(self, max_size: int = 1024, interpolation: int = _INTERP,
                 always_apply: bool = False, p: float = 1.0, **_):
        super().__init__(always_apply, p)
        self.max_size = max_size
        self.interpolation = interpolation

    @property
    def device_capable(self):
        return self.interpolation in _DEVICE_INTERPS

    def apply_batch(self, batch, rng):
        h, w = batch["image"].shape[1:3]
        s = self.max_size / max(h, w)
        return _device_resize_to(batch, round(h * s), round(w * s),
                                 self.interpolation)

    def apply(self, image, **params):
        h, w = image.shape[:2]
        s = self.max_size / max(h, w)
        return _resize(image, round(h * s), round(w * s), self.interpolation)

    def apply_to_mask(self, mask, **params):
        h, w = mask.shape[:2]
        s = self.max_size / max(h, w)
        return _resize(mask, round(h * s), round(w * s), cv2.INTER_NEAREST)

    def apply_to_bboxes(self, bboxes, image_shape, **params):
        h, w = image_shape[:2]
        s = self.max_size / max(h, w)
        return _scale_bboxes(bboxes, round(w * s) / w, round(h * s) / h)


@TRANSFORMS.register_class
class SmallestMaxSize(BaseTransform):
    always_apply = True
    geometric = True
    device_needs_uniform = True
    device_bbox_safe = False

    def __init__(self, max_size: int = 1024, interpolation: int = _INTERP,
                 always_apply: bool = False, p: float = 1.0, **_):
        super().__init__(always_apply, p)
        self.max_size = max_size
        self.interpolation = interpolation

    @property
    def device_capable(self):
        return self.interpolation in _DEVICE_INTERPS

    def apply_batch(self, batch, rng):
        h, w = batch["image"].shape[1:3]
        s = self.max_size / min(h, w)
        return _device_resize_to(batch, round(h * s), round(w * s),
                                 self.interpolation)

    def apply(self, image, **params):
        h, w = image.shape[:2]
        s = self.max_size / min(h, w)
        return _resize(image, round(h * s), round(w * s), self.interpolation)

    def apply_to_mask(self, mask, **params):
        h, w = mask.shape[:2]
        s = self.max_size / min(h, w)
        return _resize(mask, round(h * s), round(w * s), cv2.INTER_NEAREST)

    def apply_to_bboxes(self, bboxes, image_shape, **params):
        h, w = image_shape[:2]
        s = self.max_size / min(h, w)
        return _scale_bboxes(bboxes, round(w * s) / w, round(h * s) / h)


class _CropBase(BaseTransform):
    geometric = True

    def _crop(self, arr, y0, x0, h, w):
        return arr[y0:y0 + h, x0:x0 + w]


@TRANSFORMS.register_class
class CenterCrop(_CropBase):
    always_apply = True
    device_capable = True
    device_needs_uniform = True
    device_bbox_safe = False

    def __init__(self, height: int, width: int, always_apply: bool = False,
                 p: float = 1.0, **_):
        super().__init__(always_apply, p)
        self.height, self.width = height, width

    def apply_batch(self, batch, rng):
        batch = dict(batch)
        img = batch["image"]
        h, w = img.shape[1:3]
        if h < self.height or w < self.width:
            raise ValueError(
                f"device CenterCrop needs inputs >= ({self.height}, "
                f"{self.width}); got ({h}, {w}) — keep the crop on host")
        y0 = (h - self.height) // 2
        x0 = (w - self.width) // 2
        batch["image"] = img[:, y0:y0 + self.height, x0:x0 + self.width]
        if batch.get("mask") is not None and "mask" in batch:
            batch["mask"] = batch["mask"][:, y0:y0 + self.height,
                                          x0:x0 + self.width]
        return batch

    def get_params(self, sample):
        h, w = sample["image"].shape[:2]
        return {"y0": max(0, (h - self.height) // 2), "x0": max(0, (w - self.width) // 2)}

    def apply(self, image, y0=0, x0=0, **params):
        return self._crop(image, y0, x0, self.height, self.width)

    def apply_to_mask(self, mask, y0=0, x0=0, **params):
        return self._crop(mask, y0, x0, self.height, self.width)

    def apply_to_bboxes(self, bboxes, image_shape, y0=0, x0=0, **params):
        h, w = image_shape[:2]
        return _shift_clip_bboxes(bboxes, x0, y0,
                                  min(self.width, w - x0), min(self.height, h - y0))


@TRANSFORMS.register_class
class RandomCrop(_CropBase):
    device_needs_uniform = True
    device_bbox_safe = False

    def __init__(self, height: int, width: int, always_apply: bool = False,
                 p: float = 1.0, **_):
        super().__init__(always_apply, p)
        self.height, self.width = height, width

    @property
    def device_capable(self):
        # p < 1 would need an identity branch at a different output shape
        return self.p >= 1.0

    def apply_batch(self, batch, rng):
        import jax
        import jax.numpy as jnp
        img = batch["image"]
        n, h, w = img.shape[:3]
        if h < self.height or w < self.width:
            raise ValueError(
                f"device RandomCrop needs inputs >= ({self.height}, "
                f"{self.width}); got ({h}, {w}) — keep the crop on host")
        ky, kx = jax.random.split(rng)
        y0 = jax.random.randint(ky, (n,), 0, h - self.height + 1)
        x0 = jax.random.randint(kx, (n,), 0, w - self.width + 1)
        size = jnp.stack([jnp.full((n,), self.height),
                          jnp.full((n,), self.width)], -1)
        rects = jnp.concatenate([jnp.stack([y0, x0], -1), size], -1)
        return _device_crop_batch(batch, rects, (self.height, self.width))

    def get_params(self, sample):
        h, w = sample["image"].shape[:2]
        y0 = int(self.rng.integers(0, max(h - self.height, 0) + 1))
        x0 = int(self.rng.integers(0, max(w - self.width, 0) + 1))
        return {"y0": y0, "x0": x0}

    def apply(self, image, y0=0, x0=0, **params):
        return self._crop(image, y0, x0, self.height, self.width)

    def apply_to_mask(self, mask, y0=0, x0=0, **params):
        return self._crop(mask, y0, x0, self.height, self.width)

    def apply_to_bboxes(self, bboxes, image_shape, y0=0, x0=0, **params):
        h, w = image_shape[:2]
        return _shift_clip_bboxes(bboxes, x0, y0,
                                  min(self.width, w - x0), min(self.height, h - y0))


@TRANSFORMS.register_class
class Crop(_CropBase):
    always_apply = True
    device_capable = True
    device_needs_uniform = True
    device_bbox_safe = False

    def __init__(self, x_min: int = 0, y_min: int = 0, x_max: int = 1024,
                 y_max: int = 1024, always_apply: bool = False, p: float = 1.0, **_):
        super().__init__(always_apply, p)
        self.x_min, self.y_min, self.x_max, self.y_max = x_min, y_min, x_max, y_max

    def apply_batch(self, batch, rng):
        # static slice; jnp slicing clamps to bounds exactly like the host
        batch = dict(batch)
        batch["image"] = batch["image"][:, self.y_min:self.y_max,
                                        self.x_min:self.x_max]
        if batch.get("mask") is not None and "mask" in batch:
            batch["mask"] = batch["mask"][:, self.y_min:self.y_max,
                                          self.x_min:self.x_max]
        return batch

    def apply(self, image, **params):
        return image[self.y_min:self.y_max, self.x_min:self.x_max]

    def apply_to_mask(self, mask, **params):
        return mask[self.y_min:self.y_max, self.x_min:self.x_max]

    def apply_to_bboxes(self, bboxes, image_shape, **params):
        h, w = image_shape[:2]
        return _shift_clip_bboxes(bboxes, self.x_min, self.y_min,
                                  max(min(self.x_max, w) - self.x_min, 1),
                                  max(min(self.y_max, h) - self.y_min, 1))


@TRANSFORMS.register_class
class RandomResizedCrop(BaseTransform):
    geometric = True
    device_needs_uniform = True
    device_bbox_safe = False

    def __init__(self, height: int, width: int, scale=(0.08, 1.0),
                 ratio=(3 / 4, 4 / 3), interpolation: int = _INTERP,
                 always_apply: bool = False, p: float = 1.0, **_):
        super().__init__(always_apply, p)
        self.height, self.width = height, width
        self.scale, self.ratio = tuple(scale), tuple(ratio)
        self.interpolation = interpolation

    @property
    def device_capable(self):
        return self.p >= 1.0 and self.interpolation == cv2.INTER_LINEAR

    def apply_batch(self, batch, rng):
        """Vectorized torchvision-style rejection sampling: 10 (area, aspect)
        candidates per sample, first in-bounds one wins, center-crop
        fallback; then one batched crop-resize."""
        import jax
        import jax.numpy as jnp
        img = batch["image"]
        n, h, w = img.shape[:3]
        k_area, k_asp, k_y, k_x = jax.random.split(rng, 4)
        area = float(h * w)
        ta = area * jax.random.uniform(k_area, (n, 10),
                                       minval=self.scale[0],
                                       maxval=self.scale[1])
        aspect = jnp.exp(jax.random.uniform(
            k_asp, (n, 10), minval=np.log(self.ratio[0]),
            maxval=np.log(self.ratio[1])))
        cw = jnp.round(jnp.sqrt(ta * aspect))
        ch = jnp.round(jnp.sqrt(ta / aspect))
        valid = (cw > 0) & (cw <= w) & (ch > 0) & (ch <= h)
        first = jnp.argmax(valid, axis=1)
        rows = jnp.arange(n)
        any_valid = jnp.any(valid, axis=1)
        side = float(min(h, w))
        chs = jnp.where(any_valid, ch[rows, first], side)
        cws = jnp.where(any_valid, cw[rows, first], side)
        # uniform integer offset in [0, h - ch]; center for the fallback
        uy = jax.random.uniform(k_y, (n,))
        ux = jax.random.uniform(k_x, (n,))
        y0 = jnp.where(any_valid, jnp.floor(uy * (h - chs + 1)),
                       jnp.floor((h - chs) / 2))
        x0 = jnp.where(any_valid, jnp.floor(ux * (w - cws + 1)),
                       jnp.floor((w - cws) / 2))
        rects = jnp.stack([y0, x0, chs, cws], -1)
        return _device_crop_batch(batch, rects, (self.height, self.width))

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

    def apply_to_bboxes(self, bboxes, image_shape, y0=0, x0=0, ch=1, cw=1, **params):
        b = _shift_clip_bboxes(bboxes, x0, y0, cw, ch)
        return _scale_bboxes(b, self.width / cw, self.height / ch)


@TRANSFORMS.register_class
class PadIfNeeded(BaseTransform):
    always_apply = True
    geometric = True
    device_needs_uniform = True  # pads derive from the static shape
    device_bbox_safe = False

    def __init__(self, min_height: int = 1024, min_width: int = 1024,
                 border_mode: int = cv2.BORDER_REFLECT_101, value=None,
                 mask_value=None, always_apply: bool = False, p: float = 1.0, **_):
        super().__init__(always_apply, p)
        self.min_height, self.min_width = min_height, min_width
        self.border_mode = border_mode
        self.value = value
        self.mask_value = mask_value

    @property
    def device_capable(self):
        return (self.border_mode in _DEVICE_BORDERS
                and _scalar_or_none(self.value)
                and _scalar_or_none(self.mask_value))

    def apply_batch(self, batch, rng):
        batch = dict(batch)
        img = batch["image"]
        t, b, l, r = self._pads(*img.shape[1:3])
        if t or b or l or r:
            batch["image"] = _device_pad_batch(img, t, b, l, r,
                                               self.border_mode, self.value)
        if batch.get("mask") is not None and "mask" in batch:
            mask = batch["mask"]
            t, b, l, r = self._pads(*mask.shape[1:3])
            if t or b or l or r:
                batch["mask"] = _device_pad_batch(
                    mask, t, b, l, r, self.border_mode, self.mask_value)
        return batch

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

    def apply_to_bboxes(self, bboxes, image_shape, **params):
        t, _, l, _ = self._pads(*image_shape[:2])
        b = _as_boxes(bboxes).copy()
        b[:, [0, 2]] += l
        b[:, [1, 3]] += t
        return b


@TRANSFORMS.register_class
class Rotate(BaseTransform):
    geometric = True
    device_needs_uniform = True
    device_bbox_safe = False

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

    @property
    def device_capable(self):
        return (self.interpolation in _DEVICE_INTERPS
                and self.border_mode in _DEVICE_BORDERS
                and _scalar_or_none(self.value)
                and _scalar_or_none(self.mask_value))

    def apply_batch(self, batch, rng):
        import jax
        import jax.numpy as jnp

        from torchok_tpu.ops.warp import invert_affine, rotation_mats
        img = batch["image"]
        n, h, w = img.shape[:3]
        k_ang, k_p = jax.random.split(rng)
        angles = jax.random.uniform(k_ang, (n,), minval=self.limit[0],
                                    maxval=self.limit[1])
        applied = jax.random.uniform(k_p, (n,)) < self.p
        mats = rotation_mats(angles, jnp.ones((n,), jnp.float32),
                             (w / 2 - 0.5, h / 2 - 0.5))
        return _device_warp_batch(batch, invert_affine(mats), (h, w),
                                  applied, self.interpolation,
                                  self.border_mode, self.value,
                                  self.mask_value)

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

    def apply_to_bboxes(self, bboxes, image_shape, angle=0.0, **params):
        h, w = image_shape[:2]
        m = cv2.getRotationMatrix2D((w / 2 - 0.5, h / 2 - 0.5), angle, 1.0)
        return _affine_bboxes(bboxes, m, w, h)


@TRANSFORMS.register_class
class RandomRotate90(BaseTransform):
    geometric = True
    device_capable = True
    device_needs_uniform = True
    device_bbox_safe = False

    def apply_batch(self, batch, rng):
        import jax
        import jax.numpy as jnp
        batch = dict(batch)
        img = batch["image"]
        n, h, w = img.shape[:3]
        if h != w:
            # per-sample 90-degree turns of non-square images produce mixed
            # shapes — the host path would fail at collate too
            raise ValueError(
                f"device RandomRotate90 needs square images, got ({h}, {w}); "
                f"resize/crop to a square first or keep it on host")
        rk, rp = jax.random.split(rng)
        k = jax.random.randint(rk, (n,), 0, 4)
        applied = jax.random.uniform(rp, (n,)) < self.p
        k = jnp.where(applied, k, 0)

        def rot(x, kk):
            return jax.lax.switch(kk, [lambda a: a,
                                       lambda a: jnp.rot90(a, 1),
                                       lambda a: jnp.rot90(a, 2),
                                       lambda a: jnp.rot90(a, 3)], x)

        batch["image"] = jax.vmap(rot)(img, k)
        if batch.get("mask") is not None and "mask" in batch:
            batch["mask"] = jax.vmap(rot)(batch["mask"], k)
        return batch

    def get_params(self, sample):
        return {"k": int(self.rng.integers(0, 4))}

    def apply(self, image, k=0, **params):
        return np.ascontiguousarray(np.rot90(image, k))

    def apply_to_mask(self, mask, k=0, **params):
        return np.ascontiguousarray(np.rot90(mask, k))

    def apply_to_bboxes(self, bboxes, image_shape, k=0, **params):
        # np.rot90 is counter-clockwise: (x, y) -> (y, w - x) per turn
        b = _as_boxes(bboxes).copy()
        h, w = image_shape[:2]
        for _ in range(k % 4):
            x0, y0 = b[:, 0].copy(), b[:, 1].copy()
            x1, y1 = b[:, 2].copy(), b[:, 3].copy()
            b = np.stack([y0, w - x1, y1, w - x0], axis=1)
            h, w = w, h
        return b


@TRANSFORMS.register_class
class Transpose(BaseTransform):
    geometric = True
    device_capable = True
    device_needs_uniform = True
    device_bbox_safe = False

    def apply_batch(self, batch, rng):
        import jax
        import jax.numpy as jnp
        batch = dict(batch)
        img = batch["image"]
        n, h, w = img.shape[:3]
        swapped = jnp.swapaxes(img, 1, 2)
        mask = batch.get("mask") if "mask" in batch else None
        if self.p >= 1.0:
            batch["image"] = swapped
            if mask is not None:
                batch["mask"] = jnp.swapaxes(mask, 1, 2)
            return batch
        if h != w:
            # per-sample transposes of non-square images produce mixed
            # shapes — the host path would fail at collate too
            raise ValueError(
                f"device Transpose with p<1 needs square images, got "
                f"({h}, {w}); use p=1, square inputs, or keep it on host")
        applied = jax.random.uniform(rng, (n,)) < self.p
        batch["image"] = jnp.where(applied.reshape(-1, 1, 1, 1), swapped, img)
        if mask is not None:
            sel = applied.reshape((-1,) + (1,) * (mask.ndim - 1))
            batch["mask"] = jnp.where(sel, jnp.swapaxes(mask, 1, 2), mask)
        return batch

    def apply(self, image, **params):
        return np.ascontiguousarray(image.swapaxes(0, 1))

    def apply_to_mask(self, mask, **params):
        return np.ascontiguousarray(mask.swapaxes(0, 1))

    def apply_to_bboxes(self, bboxes, image_shape, **params):
        return _as_boxes(bboxes)[:, [1, 0, 3, 2]]


@TRANSFORMS.register_class
class ShiftScaleRotate(BaseTransform):
    geometric = True
    device_needs_uniform = True
    device_bbox_safe = False

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

    @property
    def device_capable(self):
        return (self.interpolation in _DEVICE_INTERPS
                and self.border_mode in _DEVICE_BORDERS
                and _scalar_or_none(self.value)
                and _scalar_or_none(self.mask_value))

    def apply_batch(self, batch, rng):
        import jax
        import jax.numpy as jnp

        from torchok_tpu.ops.warp import invert_affine, rotation_mats
        img = batch["image"]
        n, h, w = img.shape[:3]
        k_ang, k_sc, k_dx, k_dy, k_p = jax.random.split(rng, 5)
        angles = jax.random.uniform(k_ang, (n,), minval=self.rotate_limit[0],
                                    maxval=self.rotate_limit[1])
        scales = 1.0 + jax.random.uniform(k_sc, (n,),
                                          minval=self.scale_limit[0],
                                          maxval=self.scale_limit[1])
        dx = jax.random.uniform(k_dx, (n,), minval=self.shift_limit[0],
                                maxval=self.shift_limit[1])
        dy = jax.random.uniform(k_dy, (n,), minval=self.shift_limit[0],
                                maxval=self.shift_limit[1])
        applied = jax.random.uniform(k_p, (n,)) < self.p
        mats = rotation_mats(angles, scales, (w / 2 - 0.5, h / 2 - 0.5))
        mats = mats.at[:, 0, 2].add(dx * w)
        mats = mats.at[:, 1, 2].add(dy * h)
        return _device_warp_batch(batch, invert_affine(mats), (h, w),
                                  applied, self.interpolation,
                                  self.border_mode, self.value,
                                  self.mask_value)

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

    def apply_to_bboxes(self, bboxes, image_shape, angle=0.0, scale=1.0,
                        dx=0.0, dy=0.0, **params):
        h, w = image_shape[:2]
        m = cv2.getRotationMatrix2D((w / 2 - 0.5, h / 2 - 0.5), angle, scale)
        m[0, 2] += dx * w
        m[1, 2] += dy * h
        return _affine_bboxes(bboxes, m, w, h)


@TRANSFORMS.register_class
class RandomScale(BaseTransform):
    geometric = True

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

    def apply_to_bboxes(self, bboxes, image_shape, scale=1.0, **params):
        h, w = image_shape[:2]
        return _scale_bboxes(bboxes, round(w * scale) / w, round(h * scale) / h)


def _remap(img: np.ndarray, map_x: np.ndarray, map_y: np.ndarray,
           interpolation=_INTERP, border_mode=cv2.BORDER_REFLECT_101) -> np.ndarray:
    out = cv2.remap(img, map_x, map_y, interpolation=interpolation,
                    borderMode=border_mode)
    if out.ndim == 2 and img.ndim == 3:
        out = out[..., None]
    return out


@TRANSFORMS.register_class
class ElasticTransform(BaseTransform):
    """Elastic deformation via a gaussian-smoothed random displacement field.

    No bbox handler (matching albumentations): using it in a bbox pipeline
    raises via the BaseTransform geometric guard."""

    geometric = True
    device_bbox_safe = False  # no bbox handler: host path raises in bbox mode

    def __init__(self, alpha: float = 1.0, sigma: float = 50.0,
                 alpha_affine: float = 50.0, interpolation: int = _INTERP,
                 border_mode: int = cv2.BORDER_REFLECT_101, value=None,
                 always_apply: bool = False, p: float = 0.5, **_):
        super().__init__(always_apply, p)
        self.alpha = alpha
        self.sigma = sigma
        self.interpolation = interpolation
        self.border_mode = border_mode

    device_needs_uniform = True

    @property
    def device_capable(self):
        return (self.interpolation in _DEVICE_INTERPS
                and self.border_mode in _DEVICE_BORDERS)

    def apply_batch(self, batch, rng):
        import jax
        import jax.numpy as jnp
        img = batch["image"]
        n, h, w = img.shape[:3]
        k_dx, k_dy, k_p = jax.random.split(rng, 3)
        dx = jax.random.uniform(k_dx, (n, h, w), minval=-1.0, maxval=1.0)
        dy = jax.random.uniform(k_dy, (n, h, w), minval=-1.0, maxval=1.0)
        applied = jax.random.uniform(k_p, (n,)) < self.p
        ksize = int(3 * self.sigma) | 1
        dx = _gauss_blur_field(dx, ksize, self.sigma) * self.alpha
        dy = _gauss_blur_field(dy, ksize, self.sigma) * self.alpha
        xs, ys = jnp.meshgrid(jnp.arange(w, dtype=jnp.float32),
                              jnp.arange(h, dtype=jnp.float32))
        return _device_remap_batch(batch, xs + dx, ys + dy, applied,
                                   self.interpolation, self.border_mode)

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
    """Per-grid-cell random stretch of the coordinate grid. No bbox handler
    (matching albumentations) — raises in bbox pipelines."""

    geometric = True
    device_bbox_safe = False  # no bbox handler: host path raises in bbox mode

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

    device_needs_uniform = True

    @property
    def device_capable(self):
        return (self.interpolation in _DEVICE_INTERPS
                and self.border_mode in _DEVICE_BORDERS
                and self.num_steps >= 1)

    def _device_axis_maps(self, rng, n: int, size: int):
        """Vectorized :meth:`_axis_map`: per-sample (N, size) coordinate
        rows. Segment i spans [i*step, min((i+1)*step, size)); within it the
        host linspace is prev_i + step*steps[i] * offset/len(segment)."""
        import jax
        import jax.numpy as jnp
        s = self.num_steps
        steps = 1 + jax.random.uniform(rng, (n, s + 1),
                                       minval=self.distort_limit[0],
                                       maxval=self.distort_limit[1])
        step = size // s
        if step == 0:  # degenerate (size < num_steps); identity like host
            return jnp.broadcast_to(jnp.arange(size, dtype=jnp.float32),
                                    (n, size))
        j = np.arange(size)
        i = np.minimum(j // step, s)
        off = (j - i * step).astype(np.float32)
        seg_len = np.maximum(np.minimum((i + 1) * step, size) - i * step,
                             1).astype(np.float32)
        prev = step * jnp.cumsum(steps, axis=1)
        prev = jnp.concatenate([jnp.zeros((n, 1), prev.dtype),
                                prev[:, :-1]], axis=1)
        i = jnp.asarray(i)
        return prev[:, i] + step * steps[:, i] * jnp.asarray(off / seg_len)

    def apply_batch(self, batch, rng):
        import jax
        import jax.numpy as jnp
        img = batch["image"]
        n, h, w = img.shape[:3]
        k_x, k_y, k_p = jax.random.split(rng, 3)
        xs = self._device_axis_maps(k_x, n, w)  # (N, W)
        ys = self._device_axis_maps(k_y, n, h)  # (N, H)
        applied = jax.random.uniform(k_p, (n,)) < self.p
        map_x = jnp.broadcast_to(xs[:, None, :], (n, h, w))
        map_y = jnp.broadcast_to(ys[:, :, None], (n, h, w))
        return _device_remap_batch(batch, map_x, map_y, applied,
                                   self.interpolation, self.border_mode)

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
    """Barrel/pincushion distortion via cv2 undistort maps. No bbox handler
    (matching albumentations) — raises in bbox pipelines."""

    geometric = True
    device_bbox_safe = False  # no bbox handler: host path raises in bbox mode

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

    device_needs_uniform = True

    @property
    def device_capable(self):
        return (self.interpolation in _DEVICE_INTERPS
                and self.border_mode in _DEVICE_BORDERS)

    def apply_batch(self, batch, rng):
        """Closed-form cv2.initUndistortRectifyMap for the (k, k, 0, 0, 0)
        radial model the host path uses: normalize dest pixel by the camera
        matrix, apply forward distortion, project back."""
        import jax
        import jax.numpy as jnp
        img = batch["image"]
        n, h, w = img.shape[:3]
        k_k, k_dx, k_dy, k_p = jax.random.split(rng, 4)
        k = jax.random.uniform(k_k, (n, 1, 1), minval=self.distort_limit[0],
                               maxval=self.distort_limit[1])
        dx = jax.random.uniform(k_dx, (n, 1, 1), minval=self.shift_limit[0],
                                maxval=self.shift_limit[1]) * w
        dy = jax.random.uniform(k_dy, (n, 1, 1), minval=self.shift_limit[0],
                                maxval=self.shift_limit[1]) * h
        applied = jax.random.uniform(k_p, (n,)) < self.p
        cx, cy = w / 2 + dx, h / 2 + dy
        gx, gy = jnp.meshgrid(jnp.arange(w, dtype=jnp.float32),
                              jnp.arange(h, dtype=jnp.float32))
        # initUndistortRectifyMap with newCameraMatrix=None rectifies
        # through getDefaultNewCameraMatrix(cam, size, True): fx'=w, fy'=h,
        # principal point recentred to ((w-1)/2, (h-1)/2); the distorted
        # projection then goes back through the ORIGINAL (shifted) center.
        x = (gx[None] - (w - 1) * 0.5) / w
        y = (gy[None] - (h - 1) * 0.5) / h
        r2 = x * x + y * y
        radial = 1.0 + k * r2 + k * r2 * r2
        map_x = x * radial * w + cx
        map_y = y * radial * h + cy
        return _device_remap_batch(batch, map_x, map_y, applied,
                                   self.interpolation, self.border_mode)

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
    geometric = True

    def __init__(self, scale=(0.05, 0.1), interpolation: int = _INTERP,
                 always_apply: bool = False, p: float = 0.5, **_):
        super().__init__(always_apply, p)
        self.scale = (0, scale) if isinstance(scale, (int, float)) else tuple(scale)
        self.interpolation = interpolation

    device_needs_uniform = True
    device_bbox_safe = False

    @property
    def device_capable(self):
        return self.interpolation in _DEVICE_INTERPS

    def apply_batch(self, batch, rng):
        import jax
        import jax.numpy as jnp

        from torchok_tpu.ops.warp import perspective_from_points
        img = batch["image"]
        n, h, w = img.shape[:3]
        k_s, k_j, k_p = jax.random.split(rng, 3)
        s = jax.random.uniform(k_s, (n, 1, 1), minval=self.scale[0],
                               maxval=self.scale[1])
        jitter = jax.random.uniform(k_j, (n, 4, 2), minval=-1.0,
                                    maxval=1.0) * s
        jitter = jitter * jnp.asarray([w, h], jnp.float32)
        src = jnp.broadcast_to(
            jnp.asarray([[0, 0], [w, 0], [w, h], [0, h]], jnp.float32),
            (n, 4, 2))
        mats = perspective_from_points(src, src + jitter)
        applied = jax.random.uniform(k_p, (n,)) < self.p
        return _device_perspective_batch(batch, mats, (h, w), applied,
                                         self.interpolation)

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

    def apply_to_bboxes(self, bboxes, image_shape, matrix=None, **params):
        h, w = image_shape[:2]
        return _affine_bboxes(bboxes, matrix, w, h)


@TRANSFORMS.register_class
class Affine(BaseTransform):
    geometric = True

    def __init__(self, scale=None, translate_percent=None, rotate=None, shear=None,
                 interpolation: int = _INTERP, always_apply: bool = False,
                 p: float = 0.5, **_):
        super().__init__(always_apply, p)
        def _pair(v, default, around_one=False):
            # scalar scale v means (1-v, 1+v); scalar rotate/shear/translate
            # means the symmetric range (-v, v)
            if v is None:
                return default
            if isinstance(v, (int, float)):
                return (1 - v, 1 + v) if around_one else (-v, v)
            if isinstance(v, dict):
                return tuple(v.get("x", default))
            return tuple(v)
        self.scale = _pair(scale, (1.0, 1.0), around_one=True)
        self.translate = _pair(translate_percent, (0.0, 0.0))
        self.rotate = _pair(rotate, (0.0, 0.0))
        self.shear = _pair(shear, (0.0, 0.0))
        self.interpolation = interpolation

    device_needs_uniform = True
    device_bbox_safe = False

    @property
    def device_capable(self):
        return self.interpolation in _DEVICE_INTERPS

    def apply_batch(self, batch, rng):
        import jax
        import jax.numpy as jnp

        from torchok_tpu.ops.warp import invert_affine, rotation_mats
        img = batch["image"]
        n, h, w = img.shape[:3]
        k_sc, k_tx, k_ty, k_ang, k_sh, k_p = jax.random.split(rng, 6)
        sc = jax.random.uniform(k_sc, (n,), minval=self.scale[0],
                                maxval=self.scale[1])
        tx = jax.random.uniform(k_tx, (n,), minval=self.translate[0],
                                maxval=self.translate[1])
        ty = jax.random.uniform(k_ty, (n,), minval=self.translate[0],
                                maxval=self.translate[1])
        ang = jax.random.uniform(k_ang, (n,), minval=self.rotate[0],
                                 maxval=self.rotate[1])
        sh = jax.random.uniform(k_sh, (n,), minval=self.shear[0],
                                maxval=self.shear[1])
        applied = jax.random.uniform(k_p, (n,)) < self.p
        mats = rotation_mats(ang, sc, (w / 2, h / 2))
        # host _matrix: translation adds to m[:, 2], shear adds to m[0, 1]
        shear_col = jnp.stack([jnp.tan(jnp.deg2rad(sh)),
                               jnp.zeros_like(sh)], -1)
        mats = mats.at[:, :, 1].add(shear_col)
        trans = jnp.stack([tx * w, ty * h], -1)
        mats = mats.at[:, :, 2].add(trans)
        # cv2.warpAffine default border: constant 0 (host apply passes none)
        return _device_warp_batch(batch, invert_affine(mats), (h, w),
                                  applied, self.interpolation,
                                  cv2.BORDER_CONSTANT, None, None)

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

    def apply_to_bboxes(self, bboxes, image_shape, sc=1.0, tx=0.0, ty=0.0,
                        ang=0.0, sh=0.0, **params):
        h, w = image_shape[:2]
        return _affine_bboxes(bboxes, self._matrix(h, w, sc, tx, ty, ang, sh), w, h)


# ----------------------- extended crop / geometry ops -----------------------
# (completing the reference's registry surface, reference:
#  torchok/data/transforms/__init__.py:28-64)


@TRANSFORMS.register_class
class RandomSizedCrop(BaseTransform):
    """Crop a random-sized window and resize to (height, width)."""

    geometric = True

    def __init__(self, min_max_height, height: int, width: int,
                 w2h_ratio: float = 1.0, interpolation: int = _INTERP,
                 always_apply: bool = False, p: float = 1.0, **_):
        super().__init__(always_apply, p)
        self.min_max_height = tuple(min_max_height)
        self.height, self.width = height, width
        self.w2h_ratio = w2h_ratio
        self.interpolation = interpolation

    device_needs_uniform = True
    device_bbox_safe = False

    @property
    def device_capable(self):
        # mirrors RandomResizedCrop: unconditional application and the
        # bilinear crop-resize kernel only
        return self.p >= 1.0 and self.interpolation == cv2.INTER_LINEAR

    def apply_batch(self, batch, rng):
        import jax
        import jax.numpy as jnp
        img = batch["image"]
        n, h, w = img.shape[:3]
        k_h, k_y, k_x = jax.random.split(rng, 3)
        ch = jax.random.randint(k_h, (n,), self.min_max_height[0],
                                self.min_max_height[1] + 1)
        cw = jnp.minimum(jnp.round(ch * self.w2h_ratio), w)
        ch = jnp.minimum(ch, h).astype(jnp.float32)
        cw = cw.astype(jnp.float32)
        uy = jax.random.uniform(k_y, (n,))
        ux = jax.random.uniform(k_x, (n,))
        y0 = jnp.floor(uy * (h - ch + 1))
        x0 = jnp.floor(ux * (w - cw + 1))
        rects = jnp.stack([y0, x0, ch, cw], -1)
        return _device_crop_batch(batch, rects, (self.height, self.width))

    def get_params(self, sample):
        h, w = sample["image"].shape[:2]
        crop_h = int(self.rng.integers(self.min_max_height[0],
                                       self.min_max_height[1] + 1))
        crop_w = min(int(round(crop_h * self.w2h_ratio)), w)
        crop_h = min(crop_h, h)
        y0 = int(self.rng.integers(0, h - crop_h + 1))
        x0 = int(self.rng.integers(0, w - crop_w + 1))
        return {"y0": y0, "x0": x0, "ch": crop_h, "cw": crop_w}

    def apply(self, image, y0=0, x0=0, ch=1, cw=1, **params):
        crop = image[y0:y0 + ch, x0:x0 + cw]
        return _resize(crop, self.height, self.width, self.interpolation)

    def apply_to_mask(self, mask, y0=0, x0=0, ch=1, cw=1, **params):
        crop = mask[y0:y0 + ch, x0:x0 + cw]
        return _resize(crop, self.height, self.width, cv2.INTER_NEAREST)

    def apply_to_bboxes(self, bboxes, image_shape, y0=0, x0=0, ch=1, cw=1, **params):
        b = _shift_clip_bboxes(bboxes, x0, y0, cw, ch)
        scale = np.array([self.width / cw, self.height / ch] * 2, np.float32)
        return b * scale


@TRANSFORMS.register_class
class BBoxSafeRandomCrop(BaseTransform):
    """Random crop that always contains every bbox (albumentations
    semantics: the crop window is the bbox union, optionally eroded)."""

    geometric = True

    def __init__(self, erosion_rate: float = 0.0, always_apply: bool = False,
                 p: float = 1.0, **_):
        super().__init__(always_apply, p)
        self.erosion_rate = erosion_rate

    def get_params(self, sample):
        h, w = sample["image"].shape[:2]
        bboxes = sample.get("bboxes")
        if bboxes is None or len(bboxes) == 0:
            # no boxes: behave like a random-size crop of the full frame
            ch = int(h * (1 - self.erosion_rate * self.rng.random()))
            cw = int(w * (1 - self.erosion_rate * self.rng.random()))
            y0 = int(self.rng.integers(0, h - ch + 1))
            x0 = int(self.rng.integers(0, w - cw + 1))
            return {"y0": y0, "x0": x0, "ch": max(ch, 1), "cw": max(cw, 1)}
        b = np.asarray(bboxes, np.float32).reshape(-1, 4)
        ux0, uy0 = float(b[:, 0].min()), float(b[:, 1].min())
        ux1, uy1 = float(b[:, 2].max()), float(b[:, 3].max())
        x0 = int(self.rng.uniform(0, ux0)) if ux0 > 0 else 0
        y0 = int(self.rng.uniform(0, uy0)) if uy0 > 0 else 0
        x1 = int(self.rng.uniform(ux1, w)) if ux1 < w else w
        y1 = int(self.rng.uniform(uy1, h)) if uy1 < h else h
        return {"y0": y0, "x0": x0, "ch": max(y1 - y0, 1), "cw": max(x1 - x0, 1)}

    def apply(self, image, y0=0, x0=0, ch=1, cw=1, **params):
        return image[y0:y0 + ch, x0:x0 + cw]

    def apply_to_mask(self, mask, y0=0, x0=0, ch=1, cw=1, **params):
        return mask[y0:y0 + ch, x0:x0 + cw]

    def apply_to_bboxes(self, bboxes, image_shape, y0=0, x0=0, ch=1, cw=1, **params):
        return _shift_clip_bboxes(bboxes, x0, y0, cw, ch)


@TRANSFORMS.register_class
class RandomSizedBBoxSafeCrop(BBoxSafeRandomCrop):
    """BBox-safe crop followed by resize to (height, width)."""

    def __init__(self, height: int, width: int, erosion_rate: float = 0.0,
                 interpolation: int = _INTERP, always_apply: bool = False,
                 p: float = 1.0, **_):
        super().__init__(erosion_rate, always_apply, p)
        self.height, self.width = height, width
        self.interpolation = interpolation

    def apply(self, image, y0=0, x0=0, ch=1, cw=1, **params):
        crop = image[y0:y0 + ch, x0:x0 + cw]
        return _resize(crop, self.height, self.width, self.interpolation)

    def apply_to_mask(self, mask, y0=0, x0=0, ch=1, cw=1, **params):
        crop = mask[y0:y0 + ch, x0:x0 + cw]
        return _resize(crop, self.height, self.width, cv2.INTER_NEAREST)

    def apply_to_bboxes(self, bboxes, image_shape, y0=0, x0=0, ch=1, cw=1, **params):
        b = _shift_clip_bboxes(bboxes, x0, y0, cw, ch)
        scale = np.array([self.width / cw, self.height / ch] * 2, np.float32)
        return b * scale


@TRANSFORMS.register_class
class RandomCropFromBorders(BaseTransform):
    geometric = True

    def __init__(self, crop_left: float = 0.1, crop_right: float = 0.1,
                 crop_top: float = 0.1, crop_bottom: float = 0.1,
                 always_apply: bool = False, p: float = 1.0, **_):
        super().__init__(always_apply, p)
        self.crop_left, self.crop_right = crop_left, crop_right
        self.crop_top, self.crop_bottom = crop_top, crop_bottom

    def get_params(self, sample):
        h, w = sample["image"].shape[:2]
        x0 = int(self.rng.integers(0, max(int(w * self.crop_left), 0) + 1))
        x1 = w - int(self.rng.integers(0, max(int(w * self.crop_right), 0) + 1))
        y0 = int(self.rng.integers(0, max(int(h * self.crop_top), 0) + 1))
        y1 = h - int(self.rng.integers(0, max(int(h * self.crop_bottom), 0) + 1))
        return {"y0": y0, "x0": x0, "ch": max(y1 - y0, 1), "cw": max(x1 - x0, 1)}

    def apply(self, image, y0=0, x0=0, ch=1, cw=1, **params):
        return image[y0:y0 + ch, x0:x0 + cw]

    def apply_to_mask(self, mask, y0=0, x0=0, ch=1, cw=1, **params):
        return mask[y0:y0 + ch, x0:x0 + cw]

    def apply_to_bboxes(self, bboxes, image_shape, y0=0, x0=0, ch=1, cw=1, **params):
        return _shift_clip_bboxes(bboxes, x0, y0, cw, ch)


@TRANSFORMS.register_class
class RandomCropNearBBox(BaseTransform):
    """Crop around the sample's ``cropping_bbox`` with random jitter."""

    geometric = True

    def __init__(self, max_part_shift=(0.3, 0.3), cropping_box_key: str = "cropping_bbox",
                 always_apply: bool = False, p: float = 1.0, **_):
        super().__init__(always_apply, p)
        self.max_part_shift = (max_part_shift, max_part_shift) \
            if isinstance(max_part_shift, (int, float)) else tuple(max_part_shift)
        self.cropping_box_key = cropping_box_key

    def get_params(self, sample):
        h, w = sample["image"].shape[:2]
        box = sample.get(self.cropping_box_key)
        if box is None:
            return {"y0": 0, "x0": 0, "ch": h, "cw": w}
        bx0, by0, bx1, by1 = [float(v) for v in box]
        sx = (bx1 - bx0) * self.max_part_shift[1]
        sy = (by1 - by0) * self.max_part_shift[0]
        x0 = int(np.clip(bx0 - self.rng.uniform(0, sx), 0, w - 1))
        y0 = int(np.clip(by0 - self.rng.uniform(0, sy), 0, h - 1))
        x1 = int(np.clip(bx1 + self.rng.uniform(0, sx), x0 + 1, w))
        y1 = int(np.clip(by1 + self.rng.uniform(0, sy), y0 + 1, h))
        return {"y0": y0, "x0": x0, "ch": y1 - y0, "cw": x1 - x0}

    def apply(self, image, y0=0, x0=0, ch=1, cw=1, **params):
        return image[y0:y0 + ch, x0:x0 + cw]

    def apply_to_mask(self, mask, y0=0, x0=0, ch=1, cw=1, **params):
        return mask[y0:y0 + ch, x0:x0 + cw]

    def apply_to_bboxes(self, bboxes, image_shape, y0=0, x0=0, ch=1, cw=1, **params):
        return _shift_clip_bboxes(bboxes, x0, y0, cw, ch)


@TRANSFORMS.register_class
class CropAndPad(BaseTransform):
    """Crop (negative) or pad (positive) each side by px or percent."""

    geometric = True
    device_needs_uniform = True
    device_bbox_safe = False

    @property
    def device_capable(self):
        # only deterministic per-side amounts (scalar or explicit 4-list)
        # keep the intermediate crop/pad geometry static; random 2-range
        # specs and keep_size=False (shape-changing) stay on host
        spec = self.px if self.px is not None else self.percent
        det = isinstance(spec, (int, float)) or \
            (spec is not None and len(spec) == 4)
        return (self.keep_size and det
                and self.interpolation in _DEVICE_INTERPS
                and self.pad_mode in _DEVICE_BORDERS
                and _scalar_or_none(self.pad_cval)
                and _scalar_or_none(self.pad_cval_mask))

    def apply_batch(self, batch, rng):
        import jax
        import jax.numpy as jnp
        batch = dict(batch)
        img = batch["image"]
        n, h, w = img.shape[:3]
        top, right, bottom, left = self._amounts(h, w)
        applied = jax.random.uniform(rng, (n,)) < self.p
        y0, y1 = max(-top, 0), h - max(-bottom, 0)
        x0, x1 = max(-left, 0), w - max(-right, 0)
        pt, pb = max(top, 0), max(bottom, 0)
        pl, pr = max(left, 0), max(right, 0)

        def crop_pad(arr, cval):
            out = arr[:, y0:max(y1, y0 + 1), x0:max(x1, x0 + 1)]
            if pt or pb or pl or pr:
                out = _device_pad_batch(out, pt, pb, pl, pr,
                                        self.pad_mode, cval)
            return out

        tmp = {"image": crop_pad(img, self.pad_cval)}
        mask = batch.get("mask") if "mask" in batch else None
        if mask is not None:
            tmp["mask"] = crop_pad(mask, self.pad_cval_mask)
        tmp = _device_resize_to(tmp, h, w, self.interpolation)
        sel = applied[:, None, None, None]
        batch["image"] = jnp.where(sel, tmp["image"].astype(img.dtype), img)
        if mask is not None:
            ms = sel[..., 0] if mask.ndim == 3 else sel
            batch["mask"] = jnp.where(ms, tmp["mask"].astype(mask.dtype), mask)
        return batch

    def __init__(self, px=None, percent=None, pad_mode: int = cv2.BORDER_CONSTANT,
                 pad_cval=0, pad_cval_mask=0, keep_size: bool = True,
                 sample_independently: bool = True, interpolation: int = _INTERP,
                 always_apply: bool = False, p: float = 1.0, **_):
        super().__init__(always_apply, p)
        self.px = px
        self.percent = percent
        self.pad_mode = pad_mode
        self.pad_cval = pad_cval
        self.pad_cval_mask = pad_cval_mask
        self.keep_size = keep_size
        self.interpolation = interpolation

    def _amounts(self, h, w):
        def draw(spec):
            if isinstance(spec, (int, float)):
                return [spec] * 4
            if len(spec) == 2:
                return [float(self.rng.uniform(spec[0], spec[1])) for _ in range(4)]
            return list(spec)
        if self.px is not None:
            return [int(v) for v in draw(self.px)]
        amounts = draw(self.percent if self.percent is not None else 0)
        return [int(amounts[0] * h), int(amounts[1] * w),
                int(amounts[2] * h), int(amounts[3] * w)]

    def get_params(self, sample):
        h, w = sample["image"].shape[:2]
        top, right, bottom, left = self._amounts(h, w)
        return {"top": top, "right": right, "bottom": bottom, "left": left,
                "orig_h": h, "orig_w": w}

    def _crop_pad(self, arr, top, right, bottom, left, cval, interp):
        h, w = arr.shape[:2]
        # negative = crop, positive = pad
        y0, y1 = max(-top, 0), h - max(-bottom, 0)
        x0, x1 = max(-left, 0), w - max(-right, 0)
        out = arr[y0:max(y1, y0 + 1), x0:max(x1, x0 + 1)]
        pt, pb = max(top, 0), max(bottom, 0)
        pl, pr = max(left, 0), max(right, 0)
        if pt or pb or pl or pr:
            out = cv2.copyMakeBorder(out, pt, pb, pl, pr, self.pad_mode, value=cval)
        if self.keep_size and out.shape[:2] != (h, w):
            out = _resize(out, h, w, interp)
        return out

    def apply(self, image, top=0, right=0, bottom=0, left=0, **params):
        return self._crop_pad(image, top, right, bottom, left, self.pad_cval,
                              self.interpolation)

    def apply_to_mask(self, mask, top=0, right=0, bottom=0, left=0, **params):
        return self._crop_pad(mask, top, right, bottom, left, self.pad_cval_mask,
                              cv2.INTER_NEAREST)

    def apply_to_bboxes(self, bboxes, image_shape, top=0, right=0, bottom=0,
                        left=0, **params):
        h, w = image_shape[:2]
        b = _as_boxes(bboxes).copy()
        b[:, [0, 2]] += left
        b[:, [1, 3]] += top
        new_h = max(h + top + bottom, 1)
        new_w = max(w + left + right, 1)
        b[:, [0, 2]] = np.clip(b[:, [0, 2]], 0, new_w)
        b[:, [1, 3]] = np.clip(b[:, [1, 3]], 0, new_h)
        if self.keep_size and (new_h, new_w) != (h, w):
            b = _scale_bboxes(b, w / new_w, h / new_h)
        return b


@TRANSFORMS.register_class
class CropNonEmptyMaskIfExists(BaseTransform):
    """Crop a window containing mask-positive pixels when the mask is
    non-empty; plain random crop otherwise."""

    geometric = True

    def __init__(self, height: int, width: int, ignore_values=None,
                 ignore_channels=None, always_apply: bool = False,
                 p: float = 1.0, **_):
        super().__init__(always_apply, p)
        self.height, self.width = height, width
        self.ignore_values = ignore_values

    def get_params(self, sample):
        h, w = sample["image"].shape[:2]
        ch, cw = min(self.height, h), min(self.width, w)
        mask = sample.get("mask")
        if mask is not None:
            m = np.asarray(mask)
            if self.ignore_values is not None:
                m = np.where(np.isin(m, self.ignore_values), 0, m)
            ys, xs = np.nonzero(m if m.ndim == 2 else m.any(-1))
            if len(ys):
                i = int(self.rng.integers(len(ys)))
                cy, cx = int(ys[i]), int(xs[i])
                y0 = int(np.clip(cy - self.rng.integers(0, ch), 0, h - ch))
                x0 = int(np.clip(cx - self.rng.integers(0, cw), 0, w - cw))
                return {"y0": y0, "x0": x0, "ch": ch, "cw": cw}
        y0 = int(self.rng.integers(0, h - ch + 1))
        x0 = int(self.rng.integers(0, w - cw + 1))
        return {"y0": y0, "x0": x0, "ch": ch, "cw": cw}

    def apply(self, image, y0=0, x0=0, ch=1, cw=1, **params):
        return image[y0:y0 + ch, x0:x0 + cw]

    def apply_to_mask(self, mask, y0=0, x0=0, ch=1, cw=1, **params):
        return mask[y0:y0 + ch, x0:x0 + cw]

    def apply_to_bboxes(self, bboxes, image_shape, y0=0, x0=0, ch=1, cw=1, **params):
        return _shift_clip_bboxes(bboxes, x0, y0, cw, ch)


@TRANSFORMS.register_class
class RandomGridShuffle(BaseTransform):
    """Shuffle the cells of an (n, m) grid; image and mask share the
    permutation. No bbox handler (matching albumentations) — raises in
    bbox pipelines."""

    geometric = True
    device_capable = True
    device_needs_uniform = True  # static cell geometry
    device_bbox_safe = False

    def __init__(self, grid=(3, 3), always_apply: bool = False, p: float = 0.5, **_):
        super().__init__(always_apply, p)
        self.grid = tuple(grid)

    def apply_batch(self, batch, rng):
        import jax
        import jax.numpy as jnp
        batch = dict(batch)
        img = batch["image"]
        n, h, w = img.shape[:3]
        gh, gw = self.grid
        ys = np.linspace(0, h, gh + 1, dtype=int)
        xs = np.linspace(0, w, gw + 1, dtype=int)
        ch = int(np.diff(ys).min()) if gh > 1 else h
        cw = int(np.diff(xs).min()) if gw > 1 else w
        cells = np.array([(ys[i], xs[j]) for i in range(gh) for j in range(gw)])
        k_perm, k_p = jax.random.split(rng)
        g = gh * gw
        perm = jax.random.permutation(
            k_perm, jnp.broadcast_to(jnp.arange(g), (n, g)), axis=1,
            independent=True)
        applied = jax.random.uniform(k_p, (n,)) < self.p
        yy = jnp.arange(h)[None, :, None]
        xx = jnp.arange(w)[None, None, :]
        map_y = jnp.broadcast_to(yy, (n, h, w))
        map_x = jnp.broadcast_to(xx, (n, h, w))
        cell_y = jnp.asarray(cells[:, 0])
        cell_x = jnp.asarray(cells[:, 1])
        for dst in range(g):
            dy, dx = int(cells[dst, 0]), int(cells[dst, 1])
            in_dst = ((yy >= dy) & (yy < dy + ch) &
                      (xx >= dx) & (xx < dx + cw))
            sy = cell_y[perm[:, dst]][:, None, None]
            sx = cell_x[perm[:, dst]][:, None, None]
            map_y = jnp.where(in_dst, yy - dy + sy, map_y)
            map_x = jnp.where(in_dst, xx - dx + sx, map_x)
        flat = (map_y * w + map_x).reshape(n, h * w)

        def shuffle(arr):
            squeeze = arr.ndim == 3
            a = arr[..., None] if squeeze else arr
            out = jnp.take_along_axis(a.reshape(n, h * w, a.shape[-1]),
                                      flat[:, :, None], axis=1)
            out = out.reshape(a.shape)
            out = jnp.where(applied[:, None, None, None], out, a)
            return out[..., 0] if squeeze else out

        batch["image"] = shuffle(img)
        if batch.get("mask") is not None and "mask" in batch:
            batch["mask"] = shuffle(batch["mask"])
        return batch

    def get_params(self, sample):
        n = self.grid[0] * self.grid[1]
        return {"perm": self.rng.permutation(n)}

    def _shuffle(self, arr, perm):
        gh, gw = self.grid
        h, w = arr.shape[:2]
        ys = np.linspace(0, h, gh + 1, dtype=int)
        xs = np.linspace(0, w, gw + 1, dtype=int)
        # equal-size cells required for swapping: use the smallest cell size
        ch = min(np.diff(ys)) if gh > 1 else h
        cw = min(np.diff(xs)) if gw > 1 else w
        out = arr.copy()
        cells = [(ys[i], xs[j]) for i in range(gh) for j in range(gw)]
        for dst_idx, src_idx in enumerate(perm):
            dy, dx = cells[dst_idx]
            sy, sx = cells[src_idx]
            out[dy:dy + ch, dx:dx + cw] = arr[sy:sy + ch, sx:sx + cw]
        return out

    def apply(self, image, perm=None, **params):
        return image if perm is None else self._shuffle(image, perm)

    def apply_to_mask(self, mask, perm=None, **params):
        return mask if perm is None else self._shuffle(mask, perm)


@TRANSFORMS.register_class
class SafeRotate(BaseTransform):
    """Rotate without cutting corners: the frame is scaled so the rotated
    image fits, output size preserved."""

    geometric = True

    def __init__(self, limit=90, interpolation: int = _INTERP,
                 border_mode: int = cv2.BORDER_REFLECT_101, value=None,
                 mask_value=None, always_apply: bool = False, p: float = 0.5, **_):
        super().__init__(always_apply, p)
        self.limit = (-limit, limit) if isinstance(limit, (int, float)) else tuple(limit)
        self.interpolation = interpolation
        self.border_mode = border_mode
        self.value = value
        self.mask_value = mask_value

    device_needs_uniform = True
    device_bbox_safe = False

    @property
    def device_capable(self):
        return (self.interpolation in _DEVICE_INTERPS
                and self.border_mode in _DEVICE_BORDERS
                and _scalar_or_none(self.value)
                and _scalar_or_none(self.mask_value))

    def apply_batch(self, batch, rng):
        import jax
        import jax.numpy as jnp

        from torchok_tpu.ops.warp import invert_affine, rotation_mats
        img = batch["image"]
        n, h, w = img.shape[:3]
        k_ang, k_p = jax.random.split(rng)
        angles = jax.random.uniform(k_ang, (n,), minval=self.limit[0],
                                    maxval=self.limit[1])
        applied = jax.random.uniform(k_p, (n,)) < self.p
        rad = jnp.deg2rad(angles)
        new_w = jnp.abs(w * jnp.cos(rad)) + jnp.abs(h * jnp.sin(rad))
        new_h = jnp.abs(w * jnp.sin(rad)) + jnp.abs(h * jnp.cos(rad))
        scales = jnp.minimum(w / new_w, h / new_h)
        mats = rotation_mats(angles, scales, (w / 2 - 0.5, h / 2 - 0.5))
        return _device_warp_batch(batch, invert_affine(mats), (h, w),
                                  applied, self.interpolation,
                                  self.border_mode, self.value,
                                  self.mask_value)

    def get_params(self, sample):
        return {"angle": float(self.rng.uniform(*self.limit))}

    def _rotate(self, img, angle, interp, value):
        h, w = img.shape[:2]
        rad = np.deg2rad(angle)
        new_w = abs(w * np.cos(rad)) + abs(h * np.sin(rad))
        new_h = abs(w * np.sin(rad)) + abs(h * np.cos(rad))
        scale = min(w / new_w, h / new_h)
        m = cv2.getRotationMatrix2D((w / 2 - 0.5, h / 2 - 0.5), angle, scale)
        return cv2.warpAffine(img, m, (w, h), flags=interp,
                              borderMode=self.border_mode, borderValue=value)

    def apply(self, image, angle=0.0, **params):
        return self._rotate(image, angle, self.interpolation, self.value)

    def apply_to_mask(self, mask, angle=0.0, **params):
        return self._rotate(mask, angle, cv2.INTER_NEAREST, self.mask_value)

    def apply_to_bboxes(self, bboxes, image_shape, angle=0.0, **params):
        h, w = image_shape[:2]
        rad = np.deg2rad(angle)
        new_w = abs(w * np.cos(rad)) + abs(h * np.sin(rad))
        new_h = abs(w * np.sin(rad)) + abs(h * np.cos(rad))
        scale = min(w / new_w, h / new_h)
        m = cv2.getRotationMatrix2D((w / 2 - 0.5, h / 2 - 0.5), angle, scale)
        return _affine_bboxes(bboxes, m, w, h)


@TRANSFORMS.register_class
class PiecewiseAffine(BaseTransform):
    """Local distortions from random displacement of a coarse control grid
    (smooth remap approximation of the skimage PiecewiseAffine original).
    No bbox handler (matching albumentations) — raises in bbox pipelines."""

    geometric = True

    def __init__(self, scale=(0.03, 0.05), nb_rows: int = 4, nb_cols: int = 4,
                 interpolation: int = _INTERP, mask_interpolation: int = 0,
                 cval: int = 0, always_apply: bool = False, p: float = 0.5, **_):
        super().__init__(always_apply, p)
        self.scale = (scale, scale) if isinstance(scale, (int, float)) else tuple(scale)
        self.nb_rows = nb_rows
        self.nb_cols = nb_cols
        self.interpolation = interpolation

    def get_params(self, sample):
        h, w = sample["image"].shape[:2]
        scale = float(self.rng.uniform(*self.scale))
        dgrid = self.rng.normal(0, scale * min(h, w),
                                (self.nb_rows, self.nb_cols, 2)).astype(np.float32)
        return {"dgrid": dgrid}

    def _maps(self, h, w, dgrid):
        dy = cv2.resize(dgrid[..., 0], (w, h), interpolation=cv2.INTER_CUBIC)
        dx = cv2.resize(dgrid[..., 1], (w, h), interpolation=cv2.INTER_CUBIC)
        xx, yy = np.meshgrid(np.arange(w, dtype=np.float32),
                             np.arange(h, dtype=np.float32))
        return xx + dx, yy + dy

    def apply(self, image, dgrid=None, **params):
        if dgrid is None:
            return image
        mx, my = self._maps(image.shape[0], image.shape[1], dgrid)
        return cv2.remap(image, mx, my, self.interpolation,
                         borderMode=cv2.BORDER_REFLECT_101)

    def apply_to_mask(self, mask, dgrid=None, **params):
        if dgrid is None:
            return mask
        mx, my = self._maps(mask.shape[0], mask.shape[1], dgrid)
        return cv2.remap(mask, mx, my, cv2.INTER_NEAREST,
                         borderMode=cv2.BORDER_REFLECT_101)


@TRANSFORMS.register_class
class MaskDropout(BaseTransform):
    """Zero out up to ``max_objects`` connected components of the mask in both
    image and mask."""

    def __init__(self, max_objects: int = 1, image_fill_value=0, mask_fill_value=0,
                 always_apply: bool = False, p: float = 0.5, **_):
        super().__init__(always_apply, p)
        self.max_objects = max_objects
        self.image_fill_value = image_fill_value
        self.mask_fill_value = mask_fill_value

    def get_params(self, sample):
        mask = sample.get("mask")
        if mask is None:
            return {"drop": None}
        m = np.asarray(mask)
        bin_mask = (m if m.ndim == 2 else m.any(-1)).astype(np.uint8)
        n_labels, labels = cv2.connectedComponents(bin_mask)
        if n_labels <= 1:
            return {"drop": None}
        k = int(self.rng.integers(1, self.max_objects + 1))
        chosen = self.rng.choice(np.arange(1, n_labels),
                                 size=min(k, n_labels - 1), replace=False)
        return {"drop": np.isin(labels, chosen)}

    def apply(self, image, drop=None, **params):
        if drop is None:
            return image
        out = image.copy()
        out[drop] = self.image_fill_value
        return out

    def apply_to_mask(self, mask, drop=None, **params):
        if drop is None:
            return mask
        out = mask.copy()
        out[drop] = self.mask_fill_value
        return out


@TRANSFORMS.register_class
class Lambda(BaseTransform):
    """User-supplied callables (albumentations Lambda). YAML cannot carry
    callables, so this is constructable only from python code — registered
    for API parity."""

    def __init__(self, image=None, mask=None, bboxes=None, name=None,
                 always_apply: bool = False, p: float = 1.0, **_):
        super().__init__(always_apply, p)
        self.image_fn = image
        self.mask_fn = mask
        self.bboxes_fn = bboxes
        self.name = name

    def apply(self, image, **params):
        return self.image_fn(image) if self.image_fn else image

    def apply_to_mask(self, mask, **params):
        return self.mask_fn(mask) if self.mask_fn else mask

    def apply_to_bboxes(self, bboxes, image_shape, **params):
        return self.bboxes_fn(bboxes) if self.bboxes_fn else bboxes
