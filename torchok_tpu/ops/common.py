"""Small shared compute ops (stochastic depth, initializers)."""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


def drop_path(rng: jax.Array, x: jnp.ndarray, rate: float) -> jnp.ndarray:
    """Stochastic depth: drop the entire residual branch per sample."""
    if rate <= 0.0:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))


class DropPath(nn.Module):
    """Per-sample stochastic depth as a linen module."""
    rate: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.rate <= 0.0 or not train:
            return x
        rng = self.make_rng("dropout")
        return drop_path(rng, x, self.rate)


def trunc_normal_init(stddev: float = 0.02):
    return nn.initializers.truncated_normal(stddev=stddev)
