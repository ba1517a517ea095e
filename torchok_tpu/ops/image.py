"""On-device image ops used by necks/heads and the data pipeline."""
from __future__ import annotations

from typing import Sequence, Tuple, Union

import jax
import jax.numpy as jnp


def resize_bilinear(x: jnp.ndarray, size: Tuple[int, int],
                    align_corners: bool = False) -> jnp.ndarray:
    """Bilinear resize of NHWC (or HWC) images to ``size=(H, W)``.

    ``align_corners=False`` matches the torch/cv2 half-pixel convention that
    the reference uses for upsampling (jax.image 'linear' is half-pixel).
    """
    if x.ndim == 3:
        return jax.image.resize(x, (size[0], size[1], x.shape[2]), method="linear")
    n, _, _, c = x.shape
    return jax.image.resize(x, (n, size[0], size[1], c), method="linear")


def resize_nearest(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    if x.ndim == 3:
        return jax.image.resize(x, (size[0], size[1], x.shape[2]), method="nearest")
    n, _, _, c = x.shape
    return jax.image.resize(x, (n, size[0], size[1], c), method="nearest")


def adaptive_avg_pool(x: jnp.ndarray, output_size: Union[int, Tuple[int, int]] = 1) -> jnp.ndarray:
    """NHWC adaptive average pooling (torch AdaptiveAvgPool2d semantics)."""
    if isinstance(output_size, int):
        output_size = (output_size, output_size)
    if output_size == (1, 1):
        return jnp.mean(x, axis=(1, 2), keepdims=True)
    n, h, w, c = x.shape
    oh, ow = output_size
    if h % oh == 0 and w % ow == 0:
        x = x.reshape(n, oh, h // oh, ow, w // ow, c)
        return x.mean(axis=(2, 4))
    # general case via resize-style area pooling
    return jax.image.resize(x, (n, oh, ow, c), method="linear")


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
        padding=pads if isinstance(pads, str) else pads,
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
        padding=pads if isinstance(pads, str) else pads,
    )
    if count_include_pad or padding == 0:
        return summed / (window * window)
    ones = jnp.ones_like(x)
    counts = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding=pads if isinstance(pads, str) else pads,
    )
    return summed / counts


def blur_pool(x: jnp.ndarray, stride: int = 2, kernel: int = 3) -> jnp.ndarray:
    """Anti-aliased downsampling (Zhang 2019 "Making Convolutions
    Shift-Invariant Again"): fixed binomial low-pass depthwise filter before
    subsampling. NHWC; kernel 3 -> [1,2,1] outer product."""
    import numpy as _np
    from jax import lax
    c = x.shape[-1]
    if kernel == 3:
        k1 = _np.array([1.0, 2.0, 1.0])
    elif kernel == 5:
        k1 = _np.array([1.0, 4.0, 6.0, 4.0, 1.0])
    else:
        k1 = _np.ones((kernel,))
    k2 = _np.outer(k1, k1)
    k2 = (k2 / k2.sum()).astype(_np.float32)
    filt = jnp.asarray(k2)[:, :, None, None]          # (H, W, 1, 1)
    filt = jnp.tile(filt, (1, 1, 1, c)).astype(x.dtype)  # (H, W, 1, C) HWIO grouped
    pad = (kernel - 1) // 2
    return lax.conv_general_dilated(
        x, filt, window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c)
