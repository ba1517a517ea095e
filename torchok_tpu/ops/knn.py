"""On-TPU k-NN indexes: exact flat and IVF.

Replaces FAISS IndexFlatIP / IndexFlatL2 / IndexIVFFlat for the retrieval
metrics (reference: torchok/metrics/index_base_metric.py:523-545 builds
FAISS indexes on CPU; SURVEY.md §2.9). Design follows the TPU-KNN insight
(PAPERS.md, arXiv:2206.14286): on TPU, exact search via one MXU matmul +
``lax.top_k`` saturates the chip and beats approximate CPU indexes at the
reference's gallery sizes, so "approximate" configs get exact results by
default (a valid superset of IVF's recall contract, and deterministic).
For galleries where the dense matmul genuinely dominates (10^6+ rows),
:class:`IvfIndex` is a true inverted-file index built ON the TPU: k-means
via MXU one-hot-matmul Lloyd iterations, static-shape probed search.

Semantics parity with faiss IndexFlat/IndexIVFFlat:
* IP: scores are inner products, descending.
* L2: scores are SQUARED Euclidean distances, ascending.
* k > results found: padded with index -1 and the worst possible score.
"""
from __future__ import annotations

import functools
import logging
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


# ---------------------------------------------------------------------------
# IVF (inverted file) index — faiss.IndexIVFFlat equivalent, built on-device
# ---------------------------------------------------------------------------
@functools.partial(jax.jit, static_argnames=("nlist", "metric"))
def _kmeans_assign_accumulate(x: jnp.ndarray, cent: jnp.ndarray, nlist: int,
                              metric: str):
    """One gallery chunk of a Lloyd iteration: assign rows to their nearest
    centroid, return (per-cell sums, per-cell counts, assignments). The
    cell-mean update is an MXU matmul: onehot(assign).T @ x."""
    x32 = x.astype(jnp.float32)
    sim = x32 @ cent.T  # (n, nlist)
    if metric == "IP":
        assign = jnp.argmax(sim, axis=1)
    else:
        d2 = jnp.sum(cent * cent, axis=1)[None, :] - 2.0 * sim
        assign = jnp.argmin(d2, axis=1)  # ||x||^2 constant per row
    onehot = jax.nn.one_hot(assign, nlist, dtype=jnp.float32)
    return onehot.T @ x32, jnp.sum(onehot, axis=0), assign


def kmeans(vectors: np.ndarray, nlist: int, n_iter: int = 10,
           metric: str = "IP", chunk: int = 16384, seed: int = 0
           ) -> Tuple[np.ndarray, np.ndarray]:
    """Lloyd's k-means on device (chunked). Returns (centroids, assignment).

    Assignment uses the index metric (faiss quantizer semantics: IP cells
    by max inner product, L2 by min distance); the update is the cell mean
    either way. Empty cells keep their previous centroid (faiss reassigns;
    for an inverted file an empty cell is merely never probed)."""
    vectors = np.ascontiguousarray(vectors, np.float32)
    n, d = vectors.shape
    rng = np.random.default_rng(seed)
    cent = jnp.asarray(vectors[rng.choice(n, size=nlist, replace=False)])
    for _ in range(n_iter):
        sums = jnp.zeros((nlist, d), jnp.float32)
        counts = jnp.zeros((nlist,), jnp.float32)
        for i in range(0, n, chunk):
            s, c, _ = _kmeans_assign_accumulate(
                jnp.asarray(vectors[i:i + chunk]), cent, nlist, metric)
            sums, counts = sums + s, counts + c
        cent = jnp.where(counts[:, None] > 0, sums / counts[:, None], cent)
    # final assignment pass against the TRAINED centroids — building lists
    # from the last in-loop assignment would leave them one iteration stale
    # relative to the quantizer the search probes with (faiss assigns with
    # the final quantizer too)
    parts = []
    for i in range(0, n, chunk):
        _, _, a = _kmeans_assign_accumulate(
            jnp.asarray(vectors[i:i + chunk]), cent, nlist, metric)
        parts.append(np.asarray(a))
    return np.asarray(cent), np.concatenate(parts)


@functools.partial(jax.jit, static_argnames=("k", "nprobe", "metric"))
def _ivf_search_block(gallery: jnp.ndarray, cent: jnp.ndarray,
                      members: jnp.ndarray, queries: jnp.ndarray,
                      k: int, nprobe: int, metric: str):
    """Probed search, fully static shapes: top-``nprobe`` cells per query,
    gather their padded member lists, exact distances on the candidates."""
    q = queries.astype(jnp.float32)                       # (B, D)
    csim = q @ cent.T                                     # (B, nlist)
    if metric == "IP":
        _, cells = jax.lax.top_k(csim, nprobe)
    else:
        cd2 = jnp.sum(cent * cent, axis=1)[None, :] - 2.0 * csim
        _, cells = jax.lax.top_k(-cd2, nprobe)
    cand = members[cells].reshape(q.shape[0], -1)         # (B, M) int32, -1 pad
    valid = cand >= 0
    gvec = gallery[jnp.maximum(cand, 0)]                  # (B, M, D)
    sim = jnp.einsum("bd,bmd->bm", q, gvec,
                     preferred_element_type=jnp.float32)
    if metric == "IP":
        key = jnp.where(valid, sim, -jnp.inf)
        scores, pos = jax.lax.top_k(key, k)
    else:
        d2 = (jnp.sum(q * q, axis=1, keepdims=True)
              + jnp.einsum("bmd,bmd->bm", gvec, gvec) - 2.0 * sim)
        key = jnp.where(valid, -d2, -jnp.inf)
        negs, pos = jax.lax.top_k(key, k)
        scores = jnp.maximum(-negs, 0.0)
    idxs = jnp.take_along_axis(cand, pos, axis=1)
    found = jnp.take_along_axis(valid, pos, axis=1)
    pad = jnp.float32(-jnp.inf if metric == "IP" else jnp.inf)
    return (jnp.where(found, scores, pad),
            jnp.where(found, idxs, -1))


class IvfIndex:
    """faiss.IndexIVFFlat equivalent, trained and searched on the TPU.

    The coarse quantizer is k-means run as chunked MXU matmuls; each cell's
    member list is padded to the max cell size so the probed search is one
    static-shape gather + batched dot + ``top_k`` per query block. Returns
    are approximate exactly as faiss's are: only the probed cells' members
    are scored; misses are padded with index -1 / worst score.

    Note one deliberate divergence: ``nprobe`` defaults to 8, not faiss's 1
    — on TPU the probe matmul is cheap and recall at nprobe=1 is poor.
    Past ~200k rows the default scales as ``max(8, round(nlist / 224))`` so
    the probed mass fraction (and hence recall) stays roughly constant:
    measured at 1M×64 on v5e, nprobe 8 → recall@10 0.82 while the scaled 18
    ≈ the 200k fraction and 32 recovers 0.978 at 6.5 s for 2048 queries
    (`tools/probe_ivf_scale.py`).
    """

    # per-search-block candidate-gather budget: bounds the (B, nprobe*cap, D)
    # f32 gather that scores probed members
    _GATHER_BUDGET_BYTES = 256 * 1024 * 1024

    def __init__(self, vectors: np.ndarray, metric: str = "IP",
                 nlist: Optional[int] = None, nprobe: Optional[int] = None,
                 n_iter: int = 10, query_block: int = 256, seed: int = 0,
                 cell_cap_factor: float = 8.0):
        assert metric in ("IP", "L2")
        self.metric = metric
        vectors = np.ascontiguousarray(vectors, np.float32)
        n = vectors.shape[0]
        # reference formula: nlist = 4 * ceil(sqrt(n))
        # (torchok/metrics/index_base_metric.py:539)
        self.nlist = int(nlist) if nlist else max(1, 4 * int(np.ceil(n ** 0.5)))
        self.nlist = min(self.nlist, n)
        if nprobe is None:
            # constant probed mass fraction: 8/1792 at the 200k production
            # threshold; identical to the old fixed 8 for nlist <= 1792
            nprobe = max(8, round(self.nlist / 224))
        self.nprobe = max(1, min(nprobe, self.nlist))
        self.query_block = query_block
        self.gallery = jnp.asarray(vectors)
        self.ntotal = n
        cent, assign = kmeans(vectors, self.nlist, n_iter=n_iter,
                              metric=metric, seed=seed)
        self.centroids = jnp.asarray(cent)
        counts = np.bincount(assign, minlength=self.nlist)
        # cells are padded to a common capacity so search shapes are static;
        # a collapsed clustering (near-duplicate embeddings) would otherwise
        # blow cap up to ~n and the search gather to device OOM. Oversized
        # cells are truncated — an approximate-recall tradeoff, warned about.
        cap = max(1, int(counts.max()))
        cap_limit = max(64, int(np.ceil(cell_cap_factor * n / self.nlist)))
        if cap > cap_limit:
            dropped = int(np.sum(np.maximum(counts - cap_limit, 0)))
            logging.getLogger(__name__).warning(
                "IvfIndex: skewed clustering (max cell %d > cap %d); "
                "truncating %d of %d members (%.2f%%) — recall on those "
                "rows is lost; consider exact search or more k-means iters",
                cap, cap_limit, dropped, n, 100.0 * dropped / n)
            cap = cap_limit
        members = np.full((self.nlist, cap), -1, np.int32)
        fill = np.zeros(self.nlist, np.int64)
        for row, cell in enumerate(assign):
            if fill[cell] < cap:
                members[cell, fill[cell]] = row
                fill[cell] += 1
        self.members = jnp.asarray(members)

    def search(self, queries: np.ndarray, k: int
               ) -> Tuple[np.ndarray, np.ndarray]:
        queries = np.ascontiguousarray(queries, np.float32)
        n, d = queries.shape
        cap = self.members.shape[1]
        k_eff = min(k, self.nprobe * cap)
        pad_score = -np.inf if self.metric == "IP" else np.inf
        out_scores = np.full((n, k), pad_score, np.float32)
        out_idxs = np.full((n, k), -1, np.int64)
        # keep the (B, nprobe*cap, D) candidate gather under budget
        block = max(1, min(self.query_block,
                           self._GATHER_BUDGET_BYTES
                           // max(1, self.nprobe * cap * d * 4)))
        for i in range(0, n, block):
            q = jnp.asarray(queries[i:i + block])
            s, ix = _ivf_search_block(self.gallery, self.centroids,
                                      self.members, q, k_eff, self.nprobe,
                                      self.metric)
            out_scores[i:i + block, :k_eff] = np.asarray(s)
            out_idxs[i:i + block, :k_eff] = np.asarray(ix, np.int64)
        return out_scores, out_idxs
