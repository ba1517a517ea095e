"""Retrieval metric engine tests: on-TPU(-simulated) k-NN index parity with
numpy brute force, plus hand-computed answer tables for classification and
representation modes (the reference's answer-table pattern,
tests/base_tests/metrics/representation — fixtures designed independently).
"""
import numpy as np
import pytest

import torchok_tpu  # noqa: F401
from torchok_tpu.constructor import METRICS
from torchok_tpu.ops.knn import TpuIndex


def test_knn_index_matches_numpy_ip():
    rng = np.random.default_rng(0)
    gallery = rng.normal(size=(50, 16)).astype(np.float32)
    queries = rng.normal(size=(7, 16)).astype(np.float32)
    index = TpuIndex(gallery, metric="IP")
    scores, idxs = index.search(queries, k=5)
    ref = queries @ gallery.T
    ref_idxs = np.argsort(-ref, axis=1)[:, :5]
    np.testing.assert_array_equal(idxs, ref_idxs)
    np.testing.assert_allclose(scores, np.take_along_axis(ref, ref_idxs, 1), rtol=1e-5)


def test_knn_index_matches_numpy_l2():
    rng = np.random.default_rng(1)
    gallery = rng.normal(size=(40, 8)).astype(np.float32)
    queries = rng.normal(size=(5, 8)).astype(np.float32)
    index = TpuIndex(gallery, metric="L2")
    scores, idxs = index.search(queries, k=3)
    d2 = ((queries[:, None] - gallery[None]) ** 2).sum(-1)
    ref_idxs = np.argsort(d2, axis=1)[:, :3]
    np.testing.assert_array_equal(idxs, ref_idxs)
    np.testing.assert_allclose(scores, np.take_along_axis(d2, ref_idxs, 1),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("metric", ["IP", "L2"])
def test_knn_gallery_chunking_matches_monolithic(metric):
    """Forcing tiny gallery blocks (chunked matmul + host top-k merge) must
    reproduce the monolithic search exactly, including the ragged tail."""
    rng = np.random.default_rng(2)
    gallery = rng.normal(size=(101, 16)).astype(np.float32)
    queries = rng.normal(size=(9, 16)).astype(np.float32)
    mono = TpuIndex(gallery, metric=metric)
    chunked = TpuIndex(gallery, metric=metric, gallery_block=17)
    s1, i1 = mono.search(queries, k=7)
    s2, i2 = chunked.search(queries, k=7)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, rtol=1e-5, atol=1e-5)


def test_knn_sop_scale_memory_bounded():
    """Reference-realistic SOP scale (1e5 gallery x 512 dims, reference
    index_base_metric.py:523-545 used FAISS IVF here): the blocked search
    must complete under the CPU sim without materializing the full (Q, G)
    similarity matrix, and top-1 self-retrieval must be exact."""
    rng = np.random.default_rng(3)
    n, d = 100_000, 512
    gallery = rng.normal(size=(n, d)).astype(np.float32)
    gallery /= np.linalg.norm(gallery, axis=1, keepdims=True)
    index = TpuIndex(gallery, metric="IP", query_block=256,
                     gallery_block=16384)
    probe_ids = rng.choice(n, size=64, replace=False)
    scores, idxs = index.search(gallery[probe_ids], k=5)
    # a unit vector's best IP match in a gallery containing itself is itself
    np.testing.assert_array_equal(idxs[:, 0], probe_ids)
    np.testing.assert_allclose(scores[:, 0], 1.0, atol=1e-4)
    assert np.all(scores[:, 0] >= scores[:, 1])


def _clustered(rng, n_clusters, per_cluster, d, spread=0.05):
    centers = rng.normal(size=(n_clusters, d)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    pts = np.repeat(centers, per_cluster, axis=0)
    pts = pts + rng.normal(scale=spread, size=pts.shape).astype(np.float32)
    return pts.astype(np.float32)


@pytest.mark.parametrize("metric", ["IP", "L2"])
def test_ivf_index_high_recall_on_clustered_data(metric):
    """The on-TPU IVF (faiss.IndexIVFFlat equivalent): with enough probes,
    top-1 on clustered data matches the exact index almost everywhere."""
    from torchok_tpu.ops.knn import IvfIndex

    rng = np.random.default_rng(10)
    gallery = _clustered(rng, n_clusters=32, per_cluster=64, d=32)
    queries = gallery[rng.choice(len(gallery), size=128, replace=False)]
    exact = TpuIndex(gallery, metric=metric)
    ivf = IvfIndex(gallery, metric=metric, nlist=32, nprobe=8, seed=0)
    s_e, i_e = exact.search(queries, k=1)
    s_a, i_a = ivf.search(queries, k=1)
    recall = float(np.mean(i_a[:, 0] == i_e[:, 0]))
    assert recall >= 0.95, recall
    hit = i_a[:, 0] == i_e[:, 0]
    np.testing.assert_allclose(s_a[hit, 0], s_e[hit, 0], rtol=1e-4, atol=1e-4)


def test_ivf_nprobe_default_scales_with_nlist():
    """The default nprobe holds the probed mass fraction constant: exactly
    the historical 8 for nlist <= 1792 (so behavior at the 200k production
    threshold is unchanged), scaling as round(nlist/224) above it —
    measured at 1M rows this keeps recall@10 ~0.97 (BASELINE.md round-5)."""
    from torchok_tpu.ops.knn import IvfIndex

    rng = np.random.default_rng(12)
    gallery = rng.normal(size=(4000, 8)).astype(np.float32)
    # small nlist: default must equal the historical fixed 8
    assert IvfIndex(gallery, metric="IP", nlist=64, n_iter=1).nprobe == 8
    assert IvfIndex(gallery, metric="IP", nlist=1792, n_iter=1).nprobe == 8
    # large nlist: constant-fraction scaling (3584/224 = 16)
    assert IvfIndex(gallery, metric="IP", nlist=3584, n_iter=1).nprobe == 16
    # explicit nprobe always wins
    assert IvfIndex(gallery, metric="IP", nlist=3584, nprobe=4,
                    n_iter=1).nprobe == 4


def test_ivf_index_padding_semantics():
    """faiss parity: slots beyond the probed cells' members come back as
    index -1 with the worst score."""
    from torchok_tpu.ops.knn import IvfIndex

    rng = np.random.default_rng(11)
    gallery = _clustered(rng, n_clusters=4, per_cluster=8, d=8)
    ivf = IvfIndex(gallery, metric="IP", nlist=4, nprobe=1, seed=0)
    queries = gallery[:3]
    scores, idxs = ivf.search(queries, k=31)
    assert idxs.shape == (3, 31)
    # one probed cell holds ~8 members; the tail must be -1 / -inf
    assert np.all(idxs[:, -1] == -1)
    assert np.all(np.isneginf(scores[:, -1]))
    # returned real hits are sorted descending
    for r in range(3):
        real = scores[r][idxs[r] >= 0]
        assert np.all(np.diff(real) <= 1e-6)


def test_ivf_collapsed_embeddings_stay_bounded():
    """Near-duplicate embeddings (collapsed model mid-training) skew k-means
    into one giant cell; the index must truncate to the cap instead of
    padding every cell to ~n (device OOM on real galleries) and still
    search without error."""
    from torchok_tpu.ops.knn import IvfIndex

    rng = np.random.default_rng(14)
    base = rng.normal(size=(1, 16)).astype(np.float32)
    gallery = base + rng.normal(scale=1e-4, size=(512, 16)).astype(np.float32)
    ivf = IvfIndex(gallery, metric="IP", nlist=16, nprobe=2, seed=0,
                   cell_cap_factor=2.0)
    assert ivf.members.shape[1] <= max(64, int(np.ceil(2.0 * 512 / 16)))
    scores, idxs = ivf.search(gallery[:8], k=4)
    assert idxs.shape == (8, 4)
    assert np.all(idxs[:, 0] >= 0)


def test_ivf_kmeans_partitions_clusters():
    """Lloyd's on-device k-means recovers well-separated clusters: members
    of one true cluster land in the same cell."""
    from torchok_tpu.ops.knn import kmeans

    rng = np.random.default_rng(12)
    pts = _clustered(rng, n_clusters=8, per_cluster=32, d=16, spread=0.01)
    _, assign = kmeans(pts, nlist=8, n_iter=15, metric="L2", seed=1)
    purity = 0
    for c in range(8):
        cells = assign[c * 32:(c + 1) * 32]
        purity += np.max(np.bincount(cells, minlength=8))
    assert purity / len(pts) >= 0.9


def test_meter_uses_ivf_above_threshold():
    """IndexBasedMeter with exact_index=False and a low ivf_threshold runs
    the IVF path end to end and still recovers classmates on easy data."""
    from torchok_tpu.metrics.representation import HitAtKMeter

    rng = np.random.default_rng(13)
    n_classes, per_class = 16, 16
    vectors = _clustered(rng, n_classes, per_class, d=16, spread=0.02)
    labels = np.repeat(np.arange(n_classes), per_class)
    meter = HitAtKMeter(dataset_type="classification", exact_index=False,
                        metric_distance="IP", k=1, normalize_vectors=True,
                        ivf_threshold=64, ivf_nlist=16, ivf_nprobe=4)
    state = meter.empty_state()
    meter.update(state, vectors=vectors, group_labels=labels)
    value = float(meter.compute(state))
    assert value >= 0.95, value


def _embed(angle):
    return [np.cos(angle), np.sin(angle)]


@pytest.fixture
def classification_state():
    """Six unit vectors on a circle; classes = {0: a,b}, {1: c,d}, {2: e,f}.
    Angles chosen so nearest (IP) neighbor of each vector is its classmate."""
    angles = {
        "a": 0.00, "b": 0.10,       # class 0
        "c": 1.50, "d": 1.60,       # class 1
        "e": 3.00, "f": 3.10,       # class 2
    }
    vectors = np.array([_embed(a) for a in angles.values()], np.float32)
    labels = np.array([0, 0, 1, 1, 2, 2])
    return vectors, labels


def _run_classification(name, k, vectors, labels, **params):
    m = METRICS.get(name)(dataset_type="classification", k=k, **params)
    state = m.empty_state()
    # two chunks to exercise accumulation
    state = m.update(state, vectors=vectors[:3], group_labels=labels[:3])
    state = m.update(state, vectors=vectors[3:], group_labels=labels[3:])
    return m.compute(state)


def test_classification_hit_at_1(classification_state):
    vectors, labels = classification_state
    # every vector's top-1 (self removed) is its classmate -> hit rate 1.0
    assert _run_classification("HitAtKMeter", 1, vectors, labels) == 1.0


def test_classification_precision_recall(classification_state):
    vectors, labels = classification_state
    # with k=2 each query has exactly 1 relevant among 2 retrieved
    p = _run_classification("PrecisionAtKMeter", 2, vectors, labels)
    r = _run_classification("RecallAtKMeter", 2, vectors, labels)
    assert abs(p - 0.5) < 1e-6
    assert abs(r - 1.0) < 1e-6


def test_classification_map(classification_state):
    vectors, labels = classification_state
    # single relevant at rank 1 -> AP = 1 for all queries
    assert abs(_run_classification("MeanAveragePrecisionAtKMeter", 1,
                                   vectors, labels) - 1.0) < 1e-6


@pytest.fixture
def representation_state():
    """2 queries + 4 gallery items with known relevance scores.

    Layout (storage order): [q0, q1, g0, g1, g2, g3]
    q0 relevant: g0 (score 2), g1 (score 1); q1 relevant: g3 (score 1).
    Embeddings arranged so the ranking for q0 is [g0, g1, ...] and for q1 is
    [g3, ...].
    """
    vectors = np.array([
        _embed(0.0),    # q0
        _embed(2.0),    # q1
        _embed(0.05),   # g0 - closest to q0
        _embed(0.40),   # g1 - second for q0
        _embed(1.0),    # g2 - irrelevant
        _embed(2.05),   # g3 - closest to q1
    ], np.float32)
    query_idxs = np.array([0, 1, -1, -1, -1, -1], np.int32)
    scores = np.zeros((6, 2), np.float32)
    scores[2, 0] = 2.0  # g0 relevant to q0
    scores[3, 0] = 1.0  # g1 relevant to q0
    scores[5, 1] = 1.0  # g3 relevant to q1
    return vectors, query_idxs, scores


def _run_representation(name, k, vectors, query_idxs, scores, **params):
    m = METRICS.get(name)(dataset_type="representation", k=k, **params)
    state = m.empty_state()
    state = m.update(state, vectors=vectors[:4], query_idxs=query_idxs[:4],
                     scores=scores[:4], group_labels=np.zeros(4, np.int64))
    state = m.update(state, vectors=vectors[4:], query_idxs=query_idxs[4:],
                     scores=scores[4:], group_labels=np.zeros(2, np.int64))
    return m.compute(state)


def test_representation_precision_at_2(representation_state):
    vectors, query_idxs, scores = representation_state
    # q0: both top-2 relevant (p=1); q1: one of top-2 relevant (p=0.5)
    p = _run_representation("PrecisionAtKMeter", 2, vectors, query_idxs, scores)
    assert abs(p - 0.75) < 1e-6


def test_representation_recall(representation_state):
    vectors, query_idxs, scores = representation_state
    r = _run_representation("RecallAtKMeter", 2, vectors, query_idxs, scores)
    assert abs(r - 1.0) < 1e-6


def test_representation_ndcg(representation_state):
    vectors, query_idxs, scores = representation_state
    # q0 retrieves [g0(rel 2), g1(rel 1)] in ideal order -> ndcg 1; same q1
    n = _run_representation("NDCGAtKMeter", 2, vectors, query_idxs, scores)
    assert abs(n - 1.0) < 1e-6


def test_representation_ndcg_penalizes_wrong_order():
    # one query; relevant g_hi (score 4) ranked second, g_lo (score 1) first
    vectors = np.array([
        _embed(0.0),   # q
        _embed(0.05),  # g_lo: closest but low relevance
        _embed(0.30),  # g_hi: high relevance, second
    ], np.float32)
    query_idxs = np.array([0, -1, -1], np.int32)
    scores = np.zeros((3, 1), np.float32)
    scores[1, 0] = 1.0
    scores[2, 0] = 4.0
    n = _run_representation("NDCGAtKMeter", 2, vectors, query_idxs, scores)
    dcg = 1.0 / np.log2(2) + 4.0 / np.log2(3)
    idcg = 4.0 / np.log2(2) + 1.0 / np.log2(3)
    assert abs(n - dcg / idcg) < 1e-6


def test_group_averaging(classification_state):
    vectors, labels = classification_state
    val = _run_classification("PrecisionAtKMeter", 2, vectors, labels,
                              group_averaging=True)
    assert abs(val - 0.5) < 1e-6  # symmetric groups -> same value


def test_k_as_target_len(classification_state):
    vectors, labels = classification_state
    val = _run_classification("RecallAtKMeter", 1, vectors, labels,
                              k_as_target_len=True, group_averaging=True)
    assert abs(val - 1.0) < 1e-6
