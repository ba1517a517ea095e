"""Torch-oracle tests for ops/image.py (the ops behind necks/heads and the
blur/adaptive-pool backbone variants). Each op is checked against the exact
torch/timm formulation the reference relies on."""
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from torchok_tpu.ops.image import (adaptive_avg_pool, blur_pool,
                                   resize_bilinear)


def _nhwc(t):  # torch NCHW tensor -> numpy NHWC
    return t.detach().numpy().transpose(0, 2, 3, 1)


@pytest.mark.parametrize("hw,out", [((7, 7), (3, 3)), ((10, 6), (4, 5)),
                                    ((8, 8), (4, 4))])
def test_adaptive_avg_pool_matches_torch(hw, out):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, *hw, 5)).astype(np.float32)
    ours = np.asarray(adaptive_avg_pool(jnp.asarray(x), out))
    ref = _nhwc(F.adaptive_avg_pool2d(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), out))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("kernel", [3, 5])
def test_blur_pool_matches_timm_reflect_padding(kernel):
    """timm BlurPool2d pads with mode='reflect' before the binomial
    depthwise conv; zero padding attenuates every border output."""
    rng = np.random.default_rng(1)
    c = 4
    x = rng.normal(size=(2, 9, 9, c)).astype(np.float32)
    ours = np.asarray(blur_pool(jnp.asarray(x), stride=2, kernel=kernel))

    k1 = {3: [1.0, 2.0, 1.0], 5: [1.0, 4.0, 6.0, 4.0, 1.0]}[kernel]
    k2 = np.outer(k1, k1)
    k2 = (k2 / k2.sum()).astype(np.float32)
    filt = torch.from_numpy(np.tile(k2[None, None], (c, 1, 1, 1)))
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    pad = (kernel - 1) // 2
    xt = F.pad(xt, [pad] * 4, mode="reflect")
    ref = _nhwc(F.conv2d(xt, filt, stride=2, groups=c))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)

    # an all-ones image must stay all-ones after a normalized blur (the
    # zero-padding bug attenuated borders to 0.5625)
    ones = jnp.ones((1, 6, 6, 1), jnp.float32)
    np.testing.assert_allclose(np.asarray(blur_pool(ones, kernel=kernel)),
                               1.0, rtol=1e-6)


@pytest.mark.parametrize("size", [(7, 9), (16, 16), (3, 5)])
@pytest.mark.parametrize("align", [False, True])
def test_resize_bilinear_matches_torch(size, align):
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 5, 6, 3)).astype(np.float32)
    ours = np.asarray(resize_bilinear(jnp.asarray(x), size,
                                      align_corners=align))
    ref = _nhwc(F.interpolate(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                              size=size, mode="bilinear",
                              align_corners=align))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_resize_bilinear_hwc_rank3():
    x = np.arange(24, dtype=np.float32).reshape(4, 3, 2)
    out = resize_bilinear(jnp.asarray(x), (8, 6), align_corners=True)
    assert out.shape == (8, 6, 2)
