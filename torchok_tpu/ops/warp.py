"""Batched geometric warps for the on-device augmentation pipeline.

The reference runs all geometry per-sample on CPU workers through
cv2.warpAffine / cv2.resize (via Albumentations; reference:
torchok/data/transforms/__init__.py registers the albumentations spatial
ops). On a TPU host the CPU is the bottleneck, so the high-traffic geometry
(RandomResizedCrop / ShiftScaleRotate / Rotate / crops) runs here as ONE
batched gather-interpolate over the NHWC batch with per-sample parameters —
vmapped bilinear sampling, fused by XLA with the rest of the device pipeline.

Conventions are cv2's, so the device path reproduces the host path:

* an affine matrix M (2x3) maps SOURCE -> DESTINATION pixel coordinates
  (cv2.getRotationMatrix2D / cv2.warpAffine convention; warpAffine inverts
  internally — :func:`affine_sample` does the same);
* pixel centers sit on integer coordinates; cv2.resize's align_corners=False
  mapping ``src = (dst + 0.5) * (in/out) - 0.5`` is what
  :func:`crop_resize_sample` uses;
* ``border='reflect101'`` mirrors about edge pixels without repeating them
  (cv2.BORDER_REFLECT_101, the Albumentations default), ``'constant'``
  fills with ``fill``, ``'replicate'`` clamps.

cv2 quantizes warp coordinates to 1/32 px fixed point; this implementation
keeps them in f32 (strictly more accurate), so warp parity tests use a small
tolerance while pure-integer warps (crops, flips, 90° rotations) match
exactly.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _reflect101(idx, n):
    """Mirror an integer index into [0, n-1] without repeating the edge."""
    if n == 1:
        return jnp.zeros_like(idx)
    period = 2 * (n - 1)
    idx = jnp.abs(idx) % period
    return jnp.where(idx >= n, period - idx, idx)


def _border_index(idx, n, border):
    if border == "reflect101":
        return _reflect101(idx, n), None
    if border == "replicate":
        return jnp.clip(idx, 0, n - 1), None
    # constant: clamp for the gather, return validity for the fill
    return jnp.clip(idx, 0, n - 1), (idx >= 0) & (idx <= n - 1)


def _gather2d(img, iy, ix, border, fill):
    """img (H, W, C); iy/ix int32 (...,) -> (..., C) with border handling."""
    h, w = img.shape[0], img.shape[1]
    gy, vy = _border_index(iy, h, border)
    gx, vx = _border_index(ix, w, border)
    vals = img[gy, gx]
    if vy is not None:
        valid = (vy & vx)[..., None]
        vals = jnp.where(valid, vals, jnp.asarray(fill, vals.dtype))
    return vals


def _sample_one(img, src_x, src_y, method, border, fill):
    """img (H, W, C); src_x/src_y f32 (Ho, Wo) -> (Ho, Wo, C).

    Two nearest conventions, matching cv2's own split: ``nearest`` rounds
    half-up in the sampling direction (warpAffine's fixed-point
    ``floor(x+0.5)``), ``nearest_even`` rounds half to even (remap's
    ``cvRound``) — coordinate maps with exact .5 values (GridDistortion)
    need the latter for mask parity."""
    if method in ("nearest", "nearest_even"):
        if method == "nearest":
            ix = jnp.floor(src_x + 0.5).astype(jnp.int32)
            iy = jnp.floor(src_y + 0.5).astype(jnp.int32)
        else:
            ix = jnp.round(src_x).astype(jnp.int32)
            iy = jnp.round(src_y).astype(jnp.int32)
        return _gather2d(img, iy, ix, border, fill)
    x0 = jnp.floor(src_x)
    y0 = jnp.floor(src_y)
    dx = (src_x - x0)[..., None]
    dy = (src_y - y0)[..., None]
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    p00 = _gather2d(img, y0, x0, border, fill)
    p01 = _gather2d(img, y0, x0 + 1, border, fill)
    p10 = _gather2d(img, y0 + 1, x0, border, fill)
    p11 = _gather2d(img, y0 + 1, x0 + 1, border, fill)
    top = p00 * (1 - dx) + p01 * dx
    bot = p10 * (1 - dx) + p11 * dx
    return top * (1 - dy) + bot * dy


def inverse_affine_sample(images: jnp.ndarray, inv_mats: jnp.ndarray,
                          out_hw: Tuple[int, int], method: str = "bilinear",
                          border: str = "reflect101",
                          fill: float = 0.0) -> jnp.ndarray:
    """Sample with per-sample DST->SRC maps.

    images (N, H, W, C) floating; inv_mats (N, 2, 3) mapping output pixel
    (x, y) to source coordinates; returns (N, Ho, Wo, C).
    """
    ho, wo = out_hw
    xs = jnp.arange(wo, dtype=jnp.float32)
    ys = jnp.arange(ho, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)  # (Ho, Wo)

    def one(img, m):
        src_x = m[0, 0] * gx + m[0, 1] * gy + m[0, 2]
        src_y = m[1, 0] * gx + m[1, 1] * gy + m[1, 2]
        return _sample_one(img, src_x, src_y, method, border, fill)

    return jax.vmap(one)(images, inv_mats)


def invert_affine(mats: jnp.ndarray) -> jnp.ndarray:
    """Invert (N, 2, 3) SRC->DST affines into DST->SRC maps."""
    a, b, tx = mats[:, 0, 0], mats[:, 0, 1], mats[:, 0, 2]
    c, d, ty = mats[:, 1, 0], mats[:, 1, 1], mats[:, 1, 2]
    det = a * d - b * c
    ia, ib = d / det, -b / det
    ic, id_ = -c / det, a / det
    itx = -(ia * tx + ib * ty)
    ity = -(ic * tx + id_ * ty)
    return jnp.stack([jnp.stack([ia, ib, itx], -1),
                      jnp.stack([ic, id_, ity], -1)], 1)


def affine_sample(images: jnp.ndarray, mats: jnp.ndarray,
                  out_hw: Tuple[int, int], method: str = "bilinear",
                  border: str = "reflect101", fill: float = 0.0) -> jnp.ndarray:
    """cv2.warpAffine semantics: ``mats`` (N, 2, 3) map SRC->DST; inverted
    internally for sampling (cv2's default, no WARP_INVERSE_MAP)."""
    return inverse_affine_sample(images, invert_affine(mats), out_hw,
                                 method, border, fill)


def rotation_mats(angles_deg: jnp.ndarray, scales: jnp.ndarray,
                  center_xy: Tuple[float, float]) -> jnp.ndarray:
    """Per-sample cv2.getRotationMatrix2D: positive angle rotates
    counter-clockwise about ``center_xy``; (N,) angles/scales -> (N, 2, 3)."""
    rad = angles_deg * (jnp.pi / 180.0)
    alpha = scales * jnp.cos(rad)
    beta = scales * jnp.sin(rad)
    cx, cy = center_xy
    tx = (1 - alpha) * cx - beta * cy
    ty = beta * cx + (1 - alpha) * cy
    return jnp.stack([jnp.stack([alpha, beta, tx], -1),
                      jnp.stack([-beta, alpha, ty], -1)], 1)


def crop_resize_sample(images: jnp.ndarray, rects: jnp.ndarray,
                       out_hw: Tuple[int, int],
                       method: str = "bilinear",
                       border: str = "replicate") -> jnp.ndarray:
    """Per-sample crop-and-resize (the RandomResizedCrop device kernel).

    rects (N, 4) = (y0, x0, ch, cw) in source pixels (float or int); each
    crop resizes to ``out_hw`` with cv2.resize's align_corners=False
    mapping. Sampling coordinates clamp to the CROP rectangle (cv2 resizes
    the cropped view, so its edge replication happens at the crop edge, not
    the image edge). Integer rects with ch==Ho/cw==Wo reduce to an exact
    crop. ``border`` is accepted for API symmetry; the rect clamp already
    keeps every sample in bounds.
    """
    del border
    ho, wo = out_hw
    rects = rects.astype(jnp.float32)
    xs = jnp.arange(wo, dtype=jnp.float32)
    ys = jnp.arange(ho, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)  # (Ho, Wo)

    def one(img, rect):
        y0, x0, ch, cw = rect[0], rect[1], rect[2], rect[3]
        src_x = x0 + (gx + 0.5) * (cw / wo) - 0.5
        src_y = y0 + (gy + 0.5) * (ch / ho) - 0.5
        src_x = jnp.clip(src_x, x0, x0 + cw - 1)
        src_y = jnp.clip(src_y, y0, y0 + ch - 1)
        return _sample_one(img, src_x, src_y, method, "replicate", 0.0)

    return jax.vmap(one)(images, rects)


def remap_sample(images: jnp.ndarray, map_x: jnp.ndarray, map_y: jnp.ndarray,
                 method: str = "bilinear", border: str = "reflect101",
                 fill: float = 0.0) -> jnp.ndarray:
    """cv2.remap semantics with per-sample dense maps.

    images (N, H, W, C); map_x/map_y (N, Ho, Wo) give, for every output
    pixel, the source coordinate to sample: out[n, v, u] =
    images[n, map_y[n, v, u], map_x[n, v, u]] (bilinear or nearest). This is
    the device kernel behind ElasticTransform / GridDistortion /
    OpticalDistortion (host path: cv2.remap, reference surface
    torchok/data/transforms/__init__.py)."""

    def one(img, mx, my):
        return _sample_one(img, mx, my, method, border, fill)

    return jax.vmap(one)(images, map_x, map_y)


def perspective_from_points(src: jnp.ndarray, dst: jnp.ndarray) -> jnp.ndarray:
    """Per-sample cv2.getPerspectiveTransform: 4 point pairs -> (N, 3, 3)
    homographies M with dst ~ M @ src (homogeneous).

    src/dst are (N, 4, 2) corner coordinates. Solves the standard 8x8
    linear system per sample (f32; adequate for augmentation-scale jitter).
    """
    n = src.shape[0]
    x, y = src[..., 0], src[..., 1]          # (N, 4)
    u, v = dst[..., 0], dst[..., 1]
    zeros = jnp.zeros_like(x)
    ones = jnp.ones_like(x)
    # rows for u: [x y 1 0 0 0 -x*u -y*u] ; rows for v: [0 0 0 x y 1 -x*v -y*v]
    ru = jnp.stack([x, y, ones, zeros, zeros, zeros, -x * u, -y * u], -1)
    rv = jnp.stack([zeros, zeros, zeros, x, y, ones, -x * v, -y * v], -1)
    a = jnp.concatenate([ru, rv], axis=1)    # (N, 8, 8)
    b = jnp.concatenate([u, v], axis=1)      # (N, 8)
    h = jnp.linalg.solve(a, b[..., None])[..., 0]
    h = jnp.concatenate([h, jnp.ones((n, 1), h.dtype)], axis=1)
    return h.reshape(n, 3, 3)


def perspective_sample(images: jnp.ndarray, mats: jnp.ndarray,
                       out_hw: Tuple[int, int], method: str = "bilinear",
                       border: str = "constant",
                       fill: float = 0.0) -> jnp.ndarray:
    """cv2.warpPerspective semantics: ``mats`` (N, 3, 3) map SRC->DST and are
    inverted internally for sampling (cv2's default, no WARP_INVERSE_MAP).
    cv2's default border for warpPerspective is constant-0."""
    ho, wo = out_hw
    xs = jnp.arange(wo, dtype=jnp.float32)
    ys = jnp.arange(ho, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)  # (Ho, Wo)
    inv = jnp.linalg.inv(mats.astype(jnp.float32))

    def one(img, m):
        denom = m[2, 0] * gx + m[2, 1] * gy + m[2, 2]
        src_x = (m[0, 0] * gx + m[0, 1] * gy + m[0, 2]) / denom
        src_y = (m[1, 0] * gx + m[1, 1] * gy + m[1, 2]) / denom
        return _sample_one(img, src_x, src_y, method, border, fill)

    return jax.vmap(one)(images, inv)
