"""General Pair Weighting losses over a relevance matrix
(reference: torchok/losses/representation/pairwise.py:9-136; GPW paper
arXiv:1912.06798). The cdist + elementwise formulation maps directly onto
MXU matmuls: ||a-b||^2 = ||a||^2 + ||b||^2 - 2 a.b."""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from torchok_tpu.constructor import LOSSES


def cdist_l2(a: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Pairwise Euclidean distances computed as one matmul (MXU-friendly)."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    sq = (jnp.sum(a * a, axis=1)[:, None] + jnp.sum(b * b, axis=1)[None, :]
          - 2.0 * a @ b.T)
    return jnp.sqrt(jnp.maximum(sq, eps))


class BasePairwiseLoss:
    """Regularization and reduction shared by pairwise losses."""

    def __init__(self, reg: Optional[str] = None, reduction: Optional[str] = "mean",
                 eps: float = 1e-3):
        self.reg = reg
        self.reduction = reduction
        self.eps = eps

    def regularize(self, L: jnp.ndarray, emb: jnp.ndarray) -> jnp.ndarray:
        if self.reg is None:
            return L
        if self.reg == "L1":
            return L + self.eps * jnp.sum(jnp.abs(emb), axis=1)
        if self.reg == "L2":
            return L + self.eps * jnp.linalg.norm(emb, axis=1)
        raise ValueError(f"Unknown regularization type: {self.reg}")

    def apply_reduction(self, L: jnp.ndarray) -> jnp.ndarray:
        if self.reduction == "mean":
            return jnp.mean(L)
        if self.reduction == "sum":
            return jnp.sum(L)
        raise ValueError(f"Unknown reduction type: {self.reduction}")


class GeneralPairWeightingLoss(BasePairwiseLoss):
    def __init__(self, margin: float, reg: Optional[str] = None,
                 reduction: Optional[str] = "mean", eps: float = 1e-3):
        super().__init__(reg=reg, reduction=reduction, eps=eps)
        self.margin = margin

    def __call__(self, emb1: jnp.ndarray, emb2: jnp.ndarray, R: jnp.ndarray) -> jnp.ndarray:
        L = self.calc_loss(emb1, emb2, R)
        L = self.regularize(L, emb1)
        return self.apply_reduction(L)

    def calc_loss(self, emb1: jnp.ndarray, emb2: jnp.ndarray, R: jnp.ndarray) -> jnp.ndarray:
        raise NotImplementedError


@LOSSES.register_class
class ContrastiveLoss(GeneralPairWeightingLoss):
    def calc_loss(self, emb1: jnp.ndarray, emb2: jnp.ndarray, R: jnp.ndarray) -> jnp.ndarray:
        S = cdist_l2(emb1, emb2)
        R = R.astype(jnp.float32)
        L = (1.0 - R) * jnp.maximum(self.margin - S, 0.0) ** 2 + R * S ** 2
        return jnp.sum(L, axis=1)
