"""Modulated deformable convolution (DCNv2) for TPU.

The reference's NASFCOS_FPN / DyHead / CTResNetNeck use mmcv's CUDA
ModulatedDeformConv2d (reference: torchok's mmdet necks via
mmdet/models/necks/*). There is no CUDA kernel here; instead the sampling
step is expressed as four corner gathers + bilinear weights, and the
contraction over (kernel-tap, in-channel) runs as one einsum — the FLOPs
land on the MXU, the gathers vectorize on the VPU. Zero-padding semantics
(samples outside the feature map read 0) match mmcv/torchvision.

Layout: NHWC. Offsets follow the mmcv channel convention
(per-tap [dy, dx] pairs, tap order row-major over the kernel window).
"""
from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp


def deform_conv2d(feat: jnp.ndarray, offsets: jnp.ndarray, mask: jnp.ndarray,
                  kernel: jnp.ndarray, stride: int = 1, dilation: int = 1
                  ) -> jnp.ndarray:
    """Apply a modulated deformable 2D convolution.

    Args:
        feat: (B, H, W, Cin) input features.
        offsets: (B, Ho, Wo, K*2) per-output-position per-tap [dy, dx].
        mask: (B, Ho, Wo, K) modulation in [0, 1] (post-sigmoid).
        kernel: (kh, kw, Cin, Cout) weights; K = kh*kw.
        stride/dilation: conv geometry; padding is SAME-style (kh//2).

    Returns:
        (B, Ho, Wo, Cout) with Ho = H // stride (SAME padding).
    """
    b, h, w, cin = feat.shape
    kh, kw, _, cout = kernel.shape
    k = kh * kw
    ho, wo = offsets.shape[1], offsets.shape[2]

    # base sampling grid: output position * stride + dilated tap offset - pad
    ys = jnp.arange(ho) * stride
    xs = jnp.arange(wo) * stride
    tap_y = (jnp.arange(kh) - kh // 2) * dilation
    tap_x = (jnp.arange(kw) - kw // 2) * dilation
    grid_y = ys[:, None, None] + tap_y[None, :, None]      # (Ho, kh, kw)
    grid_x = xs[:, None, None] + tap_x[None, None, :]      # (Wo, kh, kw)
    base_y = jnp.broadcast_to(grid_y[:, None], (ho, wo, kh, kw)).reshape(ho, wo, k)
    base_x = jnp.broadcast_to(grid_x[None, :], (ho, wo, kh, kw)).reshape(ho, wo, k)

    # Coordinate math must run in f32 regardless of compute dtype: under
    # precision:16 the offsets arrive as bf16, and int base + bf16 offset
    # promotes to bf16 where coordinates >= 64 have ULP >= 0.5 — fractional
    # offsets would quantize away and offset gradients die. Only the gathered
    # patch values / einsum operands belong in the compute dtype.
    off = offsets.astype(jnp.float32).reshape(b, ho, wo, k, 2)
    py = base_y[None].astype(jnp.float32) + off[..., 0]    # (B, Ho, Wo, K)
    px = base_x[None].astype(jnp.float32) + off[..., 1]

    patches = _bilinear_gather(feat, py, px)               # (B, Ho, Wo, K, Cin)
    patches = patches * mask[..., None].astype(patches.dtype)
    return jnp.einsum("bhwkc,kco->bhwo", patches,
                      kernel.reshape(k, cin, cout),
                      preferred_element_type=jnp.float32).astype(feat.dtype)


def _bilinear_gather(feat: jnp.ndarray, py: jnp.ndarray, px: jnp.ndarray
                     ) -> jnp.ndarray:
    """Bilinearly sample feat (B,H,W,C) at f32 coords (B,Ho,Wo,K) with
    zero padding outside the map.  Coordinates and the four bilinear weights
    stay in float32 (see deform_conv2d); only the gathered values use the
    compute dtype so the patch tensor stays MXU-friendly."""
    b, h, w, c = feat.shape
    bo, ho, wo, k = py.shape
    y0 = jnp.floor(py)   # f32
    x0 = jnp.floor(px)
    wy1 = py - y0        # weight of y0+1, f32
    wx1 = px - x0
    flat = feat.reshape(b, h * w, c)

    def corner(yi, xi, wgt):
        valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        idx = (yc * w + xc).reshape(b, -1)                 # (B, Ho*Wo*K)
        g = jnp.take_along_axis(flat, idx[..., None], axis=1)
        g = g.reshape(b, ho, wo, k, c)
        # weight computed in f32, cast once for the multiply — the fraction
        # is in [0,1] so a bf16 cast here costs ~2^-8 relative, while the
        # coordinate quantization the f32 path avoids costed the whole
        # fractional part.
        w_cast = (wgt * valid.astype(wgt.dtype)).astype(feat.dtype)
        return g * w_cast[..., None]

    out = corner(y0, x0, (1 - wy1) * (1 - wx1))
    out += corner(y0, x0 + 1, (1 - wy1) * wx1)
    out += corner(y0 + 1, x0, wy1 * (1 - wx1))
    out += corner(y0 + 1, x0 + 1, wy1 * wx1)
    return out


class ModulatedDeformConv(nn.Module):
    """DCNv2 layer: a zero-initialized regular conv predicts per-tap offsets
    and modulation masks (mmcv init convention — starts as an ordinary conv
    scaled by sigmoid(0)=0.5), then :func:`deform_conv2d` samples and
    contracts on the MXU."""
    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    stride: int = 1
    dilation: int = 1
    use_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kh, kw = self.kernel_size
        k = kh * kw
        pad = ((kh // 2 * self.dilation,) * 2, (kw // 2 * self.dilation,) * 2)
        om = nn.Conv(3 * k, (kh, kw), strides=(self.stride,) * 2,
                     padding=pad, kernel_dilation=(self.dilation,) * 2,
                     kernel_init=nn.initializers.zeros,
                     bias_init=nn.initializers.zeros,
                     dtype=self.dtype, name="offset_mask")(x)
        offsets, mask_logits = om[..., :2 * k], om[..., 2 * k:]
        mask = nn.sigmoid(mask_logits)
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (kh, kw, cin, self.features))
        # flax promote_dtype convention: params stay f32, compute runs in
        # self.dtype (bf16 under precision:16) so the gathers, the big
        # (B,Ho,Wo,K,Cin) patch tensor and the einsum stay on the MXU fast
        # path; the einsum accumulates in f32 via preferred_element_type.
        compute_dtype = self.dtype or x.dtype
        y = deform_conv2d(x.astype(compute_dtype), offsets.astype(compute_dtype),
                          mask.astype(compute_dtype),
                          kernel.astype(compute_dtype),
                          stride=self.stride, dilation=self.dilation)
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros,
                               (self.features,)).astype(y.dtype)
        return y
