"""Retrieval-meter parity against the reference's committed answer tables.

Fixture data and expected values are ported from
/root/reference/tests/base_tests/metrics/representation/data.py:1-330 (the
reference's own oracle: 3 queries + 6 gallery vectors with hand-traced
rankings, evaluated at k=1..6). These are numeric test fixtures, not code.
"""
import numpy as np
import pytest

import torchok_tpu  # noqa: F401
from torchok_tpu.constructor import METRICS

QUERIES = [[0.3281, 0.3934, 0.3079, 0.3238],
           [0.0344, 0.8396, 0.1414, 0.7388],
           [0.5870, 0.1184, 0.1509, 0.3035]]

DATABASE = [[0.0256, 0.2660, 0.5239, 0.0042],
            [0.0513, 0.0375, 0.0321, 0.8175],
            [0.8611, 0.8352, 0.3209, 0.8839],
            [0.8433, 0.3853, 0.3332, 0.5728],
            [0.6903, 0.2962, 0.7524, 0.0826],
            [0.1255, 0.0154, 0.8745, 0.2216]]

VECTORS = np.array([
    QUERIES[0], DATABASE[4], QUERIES[1], QUERIES[2], DATABASE[0],
    DATABASE[2], DATABASE[3], DATABASE[5], DATABASE[1]], np.float32)

TARGETS = np.array([0, 0, 1, 2, 1, 2, 2, 2, 1])
GROUP_LABELS = np.array([0, 0, 0, 1, 1, 1, 1, 0, 1])
QUERIES_IDX = np.array([0, -1, 1, 2, -1, -1, -1, -1, -1])

SCORES = np.array([
    [0, 0, 0], [1, 0, 0], [0, 0, 0], [0, 0, 0], [0, 2, 0],
    [0, 0, 1], [0, 0, 2], [0, 0, 4], [0, 4, 0]], np.float32)

SCORES_QUERY_AS_RELEVANT = np.array([
    [0, 0, 0], [1, 0, 0], [0, 0, 3], [0, 1, 0], [0, 2, 0],
    [0, 0, 1], [0, 0, 2], [0, 0, 4], [0, 4, 0]], np.float32)

MAX_K = 6

CLASSIFICATION_ANSWERS = {
    "PrecisionAtKMeter": {1: 4 / 9, 2: 7 / 18, 3: 10 / 27, 4: 11 / 36,
                          5: 13 / 45, 6: 15 / 54},
    "RecallAtKMeter": {1: 13 / 54, 2: 19 / 54, 3: 5 / 9, 4: 16 / 27,
                       5: 37 / 54, 6: 7 / 9},
    "MeanAveragePrecisionAtKMeter": {1: 13 / 54, 2: 1 / 3, 3: 67 / 162,
                                     4: 137 / 324, 5: 727 / 1620,
                                     6: 787 / 1620},
}

REPRESENTATION_ANSWERS = {
    "PrecisionAtKMeter": {1: 1 / 3, 2: 1 / 3, 3: 4 / 9, 4: 1 / 3,
                          5: 1 / 3, 6: 1 / 3},
    "RecallAtKMeter": {1: 1 / 9, 2: 2 / 9, 3: 13 / 18, 4: 13 / 18,
                       5: 5 / 6, 6: 1.0},
    "MeanAveragePrecisionAtKMeter": {1: 1 / 9, 2: 2 / 9, 3: 7 / 18,
                                     4: 7 / 18, 5: 41 / 90, 6: 46 / 90},
    "NDCGAtKMeter": {1: 0.08333333, 2: 0.14328645, 3: 0.42421699,
                     4: 0.42421699, 5: 0.51373735, 6: 0.55886806},
}

REPRESENTATION_QUERY_AS_RELEVANT_ANSWERS = {
    "PrecisionAtKMeter": {1: 1 / 3, 2: 1 / 2, 3: 4 / 9, 4: 5 / 12,
                          5: 7 / 15, 6: 4 / 9},
    "RecallAtKMeter": {1: 1 / 12, 2: 5 / 18, 3: 11 / 18, 4: 13 / 18,
                       5: 11 / 12, 6: 1.0},
}


def _run(name, k, dataset_type, scores=SCORES, chunks=3, **params):
    m = METRICS.get(name)(dataset_type=dataset_type, k=k, **params)
    state = m.empty_state()
    # feed in several chunks like the reference's per-batch updates
    bounds = np.array_split(np.arange(len(VECTORS)), chunks)
    for b in bounds:
        if dataset_type == "classification":
            state = m.update(state, vectors=VECTORS[b], group_labels=TARGETS[b])
        else:
            state = m.update(state, vectors=VECTORS[b], query_idxs=QUERIES_IDX[b],
                             scores=scores[b], group_labels=GROUP_LABELS[b])
    return m.compute(state)


@pytest.mark.parametrize("meter", sorted(CLASSIFICATION_ANSWERS))
@pytest.mark.parametrize("k", range(1, MAX_K + 1))
def test_classification_answers(meter, k):
    got = _run(meter, k, "classification", normalize_vectors=True)
    assert got == pytest.approx(CLASSIFICATION_ANSWERS[meter][k], abs=1e-6)


@pytest.mark.parametrize("meter", sorted(REPRESENTATION_ANSWERS))
@pytest.mark.parametrize("k", range(1, MAX_K + 1))
def test_representation_answers(meter, k):
    got = _run(meter, k, "representation")
    assert got == pytest.approx(REPRESENTATION_ANSWERS[meter][k], abs=1e-6)


@pytest.mark.parametrize("meter", sorted(REPRESENTATION_QUERY_AS_RELEVANT_ANSWERS))
@pytest.mark.parametrize("k", range(1, MAX_K + 1))
def test_representation_query_as_relevant_answers(meter, k):
    """Queries that are themselves relevant items stay in the gallery; our
    meter derives that from the scores matrix (the reference's
    score_type='query_as_relevant' + normalize_vectors=True run)."""
    got = _run(meter, k, "representation", scores=SCORES_QUERY_AS_RELEVANT,
               normalize_vectors=True)
    assert got == pytest.approx(
        REPRESENTATION_QUERY_AS_RELEVANT_ANSWERS[meter][k], abs=1e-6)
