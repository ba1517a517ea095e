"""On-TPU brute-force k-NN index.

Replaces FAISS IndexFlatIP / IndexFlatL2 / IndexIVFFlat for the retrieval
metrics (reference: torchok/metrics/index_base_metric.py:523-545 builds
FAISS indexes on CPU; SURVEY.md §2.9). Design follows the TPU-KNN insight
(PAPERS.md, arXiv:2206.14286): on TPU, exact search via one MXU matmul +
``lax.top_k`` saturates the chip and beats approximate CPU indexes at these
gallery sizes, so the "approximate" mode also returns exact results (a valid
superset of IVF's recall contract, and deterministic).

Semantics parity with faiss IndexFlat:
* IP: scores are inner products, descending.
* L2: scores are SQUARED Euclidean distances, ascending.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("k", "metric"))
def _search_block(gallery: jnp.ndarray, queries: jnp.ndarray, k: int,
                  metric: str) -> Tuple[jnp.ndarray, jnp.ndarray]:
    q = queries.astype(jnp.float32)
    g = gallery.astype(jnp.float32)
    sim = q @ g.T  # MXU
    if metric == "IP":
        scores, idxs = jax.lax.top_k(sim, k)
    else:  # L2: ||q-g||^2 = ||q||^2 + ||g||^2 - 2 q.g ; pick smallest
        d2 = (jnp.sum(q * q, axis=1, keepdims=True)
              + jnp.sum(g * g, axis=1)[None, :] - 2.0 * sim)
        neg_scores, idxs = jax.lax.top_k(-d2, k)
        scores = jnp.maximum(-neg_scores, 0.0)
    return scores, idxs


class TpuIndex:
    """Exact flat index over a device-resident gallery.

    Large galleries (reference-realistic SOP scale, ~1.2e5 x 512) are
    searched in ``gallery_block``-row chunks so the (Q_block, G) similarity
    tile never exceeds a bounded footprint; per-chunk top-k results merge on
    the host (k*n_chunks columns — tiny). At most two compiled shapes exist
    per (k, metric): the full chunk and the ragged tail.
    """

    def __init__(self, vectors: np.ndarray, metric: str = "IP",
                 query_block: int = 1024, gallery_block: int = 32768):
        assert metric in ("IP", "L2")
        self.metric = metric
        self.query_block = query_block
        self.gallery_block = gallery_block
        self.gallery = jnp.asarray(np.ascontiguousarray(vectors, np.float32))
        self.ntotal = self.gallery.shape[0]

    def _search_queries(self, q: jnp.ndarray, k_eff: int
                        ) -> Tuple[np.ndarray, np.ndarray]:
        if self.ntotal <= self.gallery_block:
            s, ix = _search_block(self.gallery, q, k_eff, self.metric)
            return np.asarray(s), np.asarray(ix)
        parts_s, parts_i = [], []
        for g0 in range(0, self.ntotal, self.gallery_block):
            gal = self.gallery[g0:g0 + self.gallery_block]
            kk = min(k_eff, gal.shape[0])
            s, ix = _search_block(gal, q, kk, self.metric)
            parts_s.append(np.asarray(s))
            parts_i.append(np.asarray(ix, np.int64) + g0)
        S = np.concatenate(parts_s, axis=1)
        Ix = np.concatenate(parts_i, axis=1)
        key = -S if self.metric == "IP" else S
        order = np.argsort(key, axis=1, kind="stable")[:, :k_eff]
        return (np.take_along_axis(S, order, axis=1),
                np.take_along_axis(Ix, order, axis=1))

    def search(self, queries: np.ndarray, k: int) -> Tuple[np.ndarray, np.ndarray]:
        """faiss parity: when k > ntotal the extra columns are padded with
        index -1 and the worst possible score."""
        k_eff = min(k, self.ntotal)
        queries = np.ascontiguousarray(queries, np.float32)
        n = queries.shape[0]
        pad_score = -np.inf if self.metric == "IP" else np.inf
        out_scores = np.full((n, k), pad_score, np.float32)
        out_idxs = np.full((n, k), -1, np.int64)
        block = self.query_block
        for i in range(0, n, block):
            q = jnp.asarray(queries[i:i + block])
            s, ix = self._search_queries(q, k_eff)
            out_scores[i:i + block, :k_eff] = s
            out_idxs[i:i + block, :k_eff] = ix
        return out_scores, out_idxs
