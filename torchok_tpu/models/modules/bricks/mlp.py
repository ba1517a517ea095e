"""Transformer MLP brick (reference: torchok/models/modules/bricks/mlp.py)."""
from __future__ import annotations

from typing import Any, Callable, Optional

import flax.linen as nn
import jax.numpy as jnp


def gelu_exact(x: jnp.ndarray) -> jnp.ndarray:
    """Exact (erf) GELU — torch nn.GELU's default, which the reference's timm
    models use; flax nn.gelu defaults to the tanh approximation."""
    return nn.gelu(x, approximate=False)


class Mlp(nn.Module):
    hidden_features: Optional[int] = None
    out_features: Optional[int] = None
    act: Callable = gelu_exact
    drop: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        in_features = x.shape[-1]
        hidden = self.hidden_features or in_features
        out = self.out_features or in_features
        x = nn.Dense(hidden, dtype=self.dtype, name="fc1")(x)
        x = self.act(x)
        x = nn.Dropout(self.drop, deterministic=not train)(x)
        x = nn.Dense(out, dtype=self.dtype, name="fc2")(x)
        x = nn.Dropout(self.drop, deterministic=not train)(x)
        return x
