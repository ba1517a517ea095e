"""SimCLR v2 NT-Xent loss (reference:
torchok/losses/representation/unsupervised.py:7-54; arXiv:2006.10029)."""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from torchok_tpu.constructor import LOSSES


@LOSSES.register_class
class NT_XentLoss:
    def __init__(self, reduction: str = "mean", temperature: float = 1.0):
        self.reduction = reduction
        self.temperature = temperature

    def __call__(self, emb1: jnp.ndarray, emb2: jnp.ndarray,
                 emb_m: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        batch_size = emb1.shape[0]
        emb_left = jnp.concatenate([emb1, emb2]).astype(jnp.float32)
        if emb_m is None:
            emb_right = emb_left
        else:
            emb_right = jnp.concatenate([emb1, emb2, emb_m]).astype(jnp.float32)

        sim = emb_left @ emb_right.T / self.temperature
        # mask self-similarity in the 2B x 2B block
        n2 = 2 * batch_size
        eye = jnp.eye(n2, M=sim.shape[1], dtype=bool)
        sim = jnp.where(eye, -1e9, sim)

        labels = jnp.concatenate([
            jnp.arange(batch_size, n2), jnp.arange(batch_size)
        ])
        logp = jax.nn.log_softmax(sim, axis=-1)
        loss = -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
        if self.reduction == "mean":
            return jnp.mean(loss)
        if self.reduction == "sum":
            return jnp.sum(loss)
        return loss
