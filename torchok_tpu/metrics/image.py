"""Image-quality metrics (reference: torchok/metrics/__init__.py:66-72 —
torchmetrics image metrics re-registered; implemented natively here)."""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from torchok_tpu.constructor import METRICS
from torchok_tpu.metrics.base import MeanState, Metric

__all__ = []


@METRICS.register_class(name="PeakSignalNoiseRatio")
class PeakSignalNoiseRatio(Metric):
    def __init__(self, data_range: Optional[float] = None, **params):
        super().__init__(**params)
        self.data_range = data_range

    def empty_state(self):
        return {"sse": jnp.zeros((), jnp.float32), "n": jnp.zeros((), jnp.float32),
                "max": jnp.zeros((), jnp.float32), "min": jnp.zeros((), jnp.float32)}

    def update(self, state, preds, target, **_):
        p = preds.astype(jnp.float32)
        t = target.astype(jnp.float32)
        return {"sse": state["sse"] + jnp.sum((p - t) ** 2),
                "n": state["n"] + p.size,
                "max": jnp.maximum(state["max"], jnp.max(t)),
                "min": jnp.minimum(state["min"], jnp.min(t))}

    def compute(self, state):
        data_range = self.data_range or float(state["max"] - state["min"])
        mse = state["sse"] / jnp.maximum(state["n"], 1.0)
        return float(10.0 * jnp.log10(data_range ** 2 / jnp.maximum(mse, 1e-12)))


def _gaussian_kernel(size: int, sigma: float) -> jnp.ndarray:
    coords = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(coords ** 2) / (2 * sigma ** 2))
    g = g / jnp.sum(g)
    return jnp.outer(g, g)


def _ssim_map(p, t, kernel, c1, c2):
    """p, t: NHWC float; kernel: (k, k)."""
    k = kernel[:, :, None, None]
    c = p.shape[-1]
    kc = jnp.tile(k, (1, 1, 1, 1))

    def filt(x):
        # depthwise gaussian filter
        x_ = x.transpose(0, 3, 1, 2).reshape(-1, x.shape[1], x.shape[2], 1)
        y = jax.lax.conv_general_dilated(
            x_, kc, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y.reshape(x.shape[0], c, y.shape[1], y.shape[2]).transpose(0, 2, 3, 1)

    mu_p, mu_t = filt(p), filt(t)
    mu_p2, mu_t2, mu_pt = mu_p ** 2, mu_t ** 2, mu_p * mu_t
    sigma_p = filt(p * p) - mu_p2
    sigma_t = filt(t * t) - mu_t2
    sigma_pt = filt(p * t) - mu_pt
    num = (2 * mu_pt + c1) * (2 * sigma_pt + c2)
    den = (mu_p2 + mu_t2 + c1) * (sigma_p + sigma_t + c2)
    return num / den


@METRICS.register_class(name="StructuralSimilarityIndexMeasure")
class StructuralSimilarityIndexMeasure(MeanState):
    def __init__(self, data_range: float = 1.0, kernel_size: int = 11,
                 sigma: float = 1.5, k1: float = 0.01, k2: float = 0.03, **params):
        super().__init__(**params)
        self.data_range = data_range
        self.kernel_size = kernel_size
        self.sigma = sigma
        self.c1 = (k1 * data_range) ** 2
        self.c2 = (k2 * data_range) ** 2

    def update(self, state, preds, target, **_):
        p = preds.astype(jnp.float32)
        t = target.astype(jnp.float32)
        if p.ndim == 3:
            p, t = p[..., None], t[..., None]
        kernel = _gaussian_kernel(self.kernel_size, self.sigma)
        ssim = _ssim_map(p, t, kernel, self.c1, self.c2)
        per_image = jnp.mean(ssim, axis=(1, 2, 3))
        return self._accumulate(state, per_image)


@METRICS.register_class(name="MultiScaleStructuralSimilarityIndexMeasure")
class MultiScaleStructuralSimilarityIndexMeasure(MeanState):
    _WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)

    def __init__(self, data_range: float = 1.0, kernel_size: int = 11,
                 sigma: float = 1.5, k1: float = 0.01, k2: float = 0.03, **params):
        super().__init__(**params)
        self.data_range = data_range
        self.kernel_size = kernel_size
        self.sigma = sigma
        self.c1 = (k1 * data_range) ** 2
        self.c2 = (k2 * data_range) ** 2

    def update(self, state, preds, target, **_):
        p = preds.astype(jnp.float32)
        t = target.astype(jnp.float32)
        if p.ndim == 3:
            p, t = p[..., None], t[..., None]
        kernel = _gaussian_kernel(self.kernel_size, self.sigma)
        vals = []
        for i, w in enumerate(self._WEIGHTS):
            ssim = _ssim_map(p, t, kernel, self.c1, self.c2)
            # contrast-structure term except at the last scale
            vals.append(jnp.mean(ssim, axis=(1, 2, 3)) ** w)
            if i < len(self._WEIGHTS) - 1:
                if min(p.shape[1] // 2, p.shape[2] // 2) < self.kernel_size:
                    break
                p = jax.image.resize(p, (p.shape[0], p.shape[1] // 2,
                                         p.shape[2] // 2, p.shape[3]), "linear")
                t = jax.image.resize(t, (t.shape[0], t.shape[1] // 2,
                                         t.shape[2] // 2, t.shape[3]), "linear")
        per_image = jnp.prod(jnp.stack(vals), axis=0)
        return self._accumulate(state, per_image)


@METRICS.register_class(name="UniversalImageQualityIndex")
class UniversalImageQualityIndex(MeanState):
    """UQI = SSIM with c1 = c2 = 0."""

    def __init__(self, kernel_size: int = 8, **params):
        super().__init__(**params)
        self.kernel_size = kernel_size

    def update(self, state, preds, target, **_):
        p = preds.astype(jnp.float32)
        t = target.astype(jnp.float32)
        if p.ndim == 3:
            p, t = p[..., None], t[..., None]
        kernel = jnp.full((self.kernel_size, self.kernel_size),
                          1.0 / self.kernel_size ** 2)
        uqi = _ssim_map(p, t, kernel, 1e-12, 1e-12)
        return self._accumulate(state, jnp.mean(uqi, axis=(1, 2, 3)))


@METRICS.register_class(name="SpectralAngleMapper")
class SpectralAngleMapper(MeanState):
    def update(self, state, preds, target, **_):
        p = preds.astype(jnp.float32)
        t = target.astype(jnp.float32)
        dot = jnp.sum(p * t, axis=-1)
        denom = jnp.linalg.norm(p, axis=-1) * jnp.linalg.norm(t, axis=-1)
        sam = jnp.arccos(jnp.clip(dot / jnp.maximum(denom, 1e-12), -1.0, 1.0))
        return self._accumulate(state, sam)


@METRICS.register_class(name="ErrorRelativeGlobalDimensionlessSynthesis")
class ErrorRelativeGlobalDimensionlessSynthesis(MeanState):
    def __init__(self, ratio: float = 4.0, **params):
        super().__init__(**params)
        self.ratio = ratio

    def update(self, state, preds, target, **_):
        p = preds.astype(jnp.float32)
        t = target.astype(jnp.float32)
        if p.ndim == 3:
            p, t = p[..., None], t[..., None]
        rmse = jnp.sqrt(jnp.mean((p - t) ** 2, axis=(1, 2)))
        mean_t = jnp.maximum(jnp.abs(jnp.mean(t, axis=(1, 2))), 1e-12)
        ergas = 100.0 / self.ratio * jnp.sqrt(jnp.mean((rmse / mean_t) ** 2, axis=-1))
        return self._accumulate(state, ergas)


@METRICS.register_class(name="SpectralDistortionIndex")
class SpectralDistortionIndex(MeanState):
    """D_lambda spectral distortion: p-norm of the difference between
    cross-band UIQI matrices of the fused and reference images."""

    def __init__(self, p: int = 1, **params):
        super().__init__(**params)
        self.p = p

    @staticmethod
    def _uiqi_pair(a, b):
        mu_a, mu_b = jnp.mean(a), jnp.mean(b)
        var_a, var_b = jnp.var(a), jnp.var(b)
        cov = jnp.mean((a - mu_a) * (b - mu_b))
        return (4 * cov * mu_a * mu_b) / jnp.maximum(
            (var_a + var_b) * (mu_a ** 2 + mu_b ** 2), 1e-8)

    def update(self, state, preds, target, **_):
        # NHWC batches: compare per-sample cross-band quality matrices
        p = preds.astype(jnp.float32)
        t = target.astype(jnp.float32)
        c = p.shape[-1]

        def per_sample(ps, ts):
            vals = []
            for i in range(c):
                for j in range(c):
                    if i == j:
                        continue
                    q_f = self._uiqi_pair(ps[..., i], ps[..., j])
                    q_r = self._uiqi_pair(ts[..., i], ts[..., j])
                    vals.append(jnp.abs(q_f - q_r) ** self.p)
            return (jnp.mean(jnp.stack(vals)) if vals else jnp.zeros(())) ** (1 / self.p)

        scores = jax.vmap(per_sample)(p, t)
        return self._accumulate(state, scores)
