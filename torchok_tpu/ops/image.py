"""On-device image ops used by necks/heads and the data pipeline."""
from __future__ import annotations

from functools import lru_cache
from typing import Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np


def _lerp_matrix(pos: np.ndarray, src: int) -> np.ndarray:
    """(len(pos), src) 2-tap linear interpolation matrix at source
    coordinates ``pos`` (already in source-index space)."""
    m = np.zeros((len(pos), src), np.float32)
    pos = np.clip(pos, 0.0, src - 1)
    lo = np.floor(pos).astype(np.int64)
    hi = np.minimum(lo + 1, src - 1)
    frac = (pos - lo).astype(np.float32)
    m[np.arange(len(pos)), lo] += 1.0 - frac
    m[np.arange(len(pos)), hi] += frac
    return m


@lru_cache(maxsize=None)
def _align_corners_matrix(src: int, dst: int) -> np.ndarray:
    """align_corners=True convention: sample at i*(src-1)/(dst-1)."""
    if dst == 1 or src == 1:
        m = np.zeros((dst, src), np.float32)
        m[:, 0] = 1.0
        return m
    return _lerp_matrix(np.arange(dst) * (src - 1) / (dst - 1), src)


@lru_cache(maxsize=None)
def _half_pixel_matrix(src: int, dst: int) -> np.ndarray:
    """torch/cv2 half-pixel convention: sample at (i+0.5)*src/dst - 0.5.
    Pure 2-tap (NO antialias), matching torch F.interpolate(bilinear) for
    downscaling too — jax.image.resize widens the kernel when downscaling
    and diverges from the reference there."""
    return _lerp_matrix((np.arange(dst) + 0.5) * src / dst - 0.5, src)


def _apply_separable(x: jnp.ndarray, mh: np.ndarray, mw: np.ndarray) -> jnp.ndarray:
    """Apply per-axis (OH, H) / (OW, W) mixing matrices to NHWC images —
    two matmuls, which is how resampling wants to run on the MXU anyway."""
    a = jnp.asarray(mh, x.dtype)
    b = jnp.asarray(mw, x.dtype)
    x = jnp.einsum("ih,nhwc->niwc", a, x)
    return jnp.einsum("jw,niwc->nijc", b, x)


def resize_bilinear(x: jnp.ndarray, size: Tuple[int, int],
                    align_corners: bool = False) -> jnp.ndarray:
    """Bilinear resize of NHWC (or HWC) images to ``size=(H, W)``.

    Both conventions reproduce torch F.interpolate(mode='bilinear') exactly
    (2-tap, no antialias — including downscaling, where jax.image.resize
    would antialias and diverge): ``align_corners=False`` is the half-pixel
    convention the reference's upsampling uses, ``align_corners=True`` the
    corner-aligned sampling mmseg-style heads set. Implemented as two
    separable interpolation matmuls, which is also the MXU-friendly form.
    """
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    n, h, w, c = x.shape
    mk = _align_corners_matrix if align_corners else _half_pixel_matrix
    out = _apply_separable(x, mk(h, size[0]), mk(w, size[1]))
    return out[0] if squeeze else out


def resize_nearest(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    if x.ndim == 3:
        return jax.image.resize(x, (size[0], size[1], x.shape[2]), method="nearest")
    n, _, _, c = x.shape
    return jax.image.resize(x, (n, size[0], size[1], c), method="nearest")


def resize_nearest_cv2(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """cv2.resize INTER_NEAREST semantics: ``src = floor(dst * src/dst)``,
    top-left anchored (cv2's historical bias — differs from the pixel-center
    rule jax.image uses whenever the scale is non-integer). Used by the
    device transform paths that must reproduce the host cv2 pipeline."""
    sh, sw = x.shape[-3], x.shape[-2]
    iy = np.minimum(np.floor(np.arange(size[0]) * (sh / size[0])), sh - 1)
    ix = np.minimum(np.floor(np.arange(size[1]) * (sw / size[1])), sw - 1)
    iy = jnp.asarray(iy.astype(np.int32))
    ix = jnp.asarray(ix.astype(np.int32))
    axis_h = x.ndim - 3
    out = jnp.take(x, iy, axis=axis_h)
    return jnp.take(out, ix, axis=axis_h + 1)


@lru_cache(maxsize=None)
def _adaptive_avg_matrix(src: int, dst: int) -> np.ndarray:
    """(dst, src) averaging matrix with torch AdaptiveAvgPool window
    boundaries: window i covers [floor(i*src/dst), ceil((i+1)*src/dst))."""
    m = np.zeros((dst, src), np.float32)
    for i in range(dst):
        lo = (i * src) // dst
        hi = -((-(i + 1) * src) // dst)  # ceil((i+1)*src/dst)
        m[i, lo:hi] = 1.0 / (hi - lo)
    return m


def adaptive_avg_pool(x: jnp.ndarray, output_size: Union[int, Tuple[int, int]] = 1) -> jnp.ndarray:
    """NHWC adaptive average pooling (torch AdaptiveAvgPool2d semantics,
    including non-divisible sizes via torch's overlapping window rule)."""
    if isinstance(output_size, int):
        output_size = (output_size, output_size)
    if output_size == (1, 1):
        return jnp.mean(x, axis=(1, 2), keepdims=True)
    n, h, w, c = x.shape
    oh, ow = output_size
    if h % oh == 0 and w % ow == 0:
        x = x.reshape(n, oh, h // oh, ow, w // ow, c)
        return x.mean(axis=(2, 4))
    return _apply_separable(x, _adaptive_avg_matrix(h, oh),
                            _adaptive_avg_matrix(w, ow))


def adaptive_max_pool(x: jnp.ndarray, output_size: Union[int, Tuple[int, int]] = 1) -> jnp.ndarray:
    if isinstance(output_size, int):
        output_size = (output_size, output_size)
    if output_size == (1, 1):
        return jnp.max(x, axis=(1, 2), keepdims=True)
    n, h, w, c = x.shape
    oh, ow = output_size
    assert h % oh == 0 and w % ow == 0, "adaptive_max_pool requires divisible sizes"
    x = x.reshape(n, oh, h // oh, ow, w // ow, c)
    return x.max(axis=(2, 4))


def max_pool(x: jnp.ndarray, window: int = 3, stride: int = 2,
             padding: Union[str, int] = 1) -> jnp.ndarray:
    """Torch-style max pool on NHWC."""
    if isinstance(padding, int):
        pads = ((0, 0), (padding, padding), (padding, padding), (0, 0))
    else:
        pads = padding
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding=pads,
    )


def avg_pool(x: jnp.ndarray, window: int = 2, stride: int = 2,
             padding: Union[str, int] = 0, count_include_pad: bool = True) -> jnp.ndarray:
    if isinstance(padding, int):
        pads = ((0, 0), (padding, padding), (padding, padding), (0, 0))
    else:
        pads = padding
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding=pads,
    )
    if count_include_pad or padding == 0:
        return summed / (window * window)
    ones = jnp.ones_like(x)
    counts = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding=pads,
    )
    return summed / counts


def blur_pool(x: jnp.ndarray, stride: int = 2, kernel: int = 3) -> jnp.ndarray:
    """Anti-aliased downsampling (Zhang 2019 "Making Convolutions
    Shift-Invariant Again"): fixed binomial low-pass depthwise filter before
    subsampling. NHWC; kernel 3 -> [1,2,1] outer product. Reflect padding,
    matching timm's BlurPool2d (the op behind resnetblur/seresnetaa
    variants) — zero padding would attenuate every border output."""
    from jax import lax
    c = x.shape[-1]
    if kernel == 3:
        k1 = np.array([1.0, 2.0, 1.0])
    elif kernel == 5:
        k1 = np.array([1.0, 4.0, 6.0, 4.0, 1.0])
    else:
        k1 = np.ones((kernel,))
    k2 = np.outer(k1, k1)
    k2 = (k2 / k2.sum()).astype(np.float32)
    filt = jnp.asarray(k2)[:, :, None, None]          # (H, W, 1, 1)
    filt = jnp.tile(filt, (1, 1, 1, c)).astype(x.dtype)  # (H, W, 1, C) HWIO grouped
    pad = (kernel - 1) // 2
    x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
    return lax.conv_general_dilated(
        x, filt, window_strides=(stride, stride),
        padding=((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c)
