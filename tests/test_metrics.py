"""Metric numerics cross-checked against sklearn."""
import jax.numpy as jnp
import numpy as np
import pytest
from sklearn import metrics as skm

from torchok_tpu.constructor import METRICS
from torchok_tpu.constructor.config_structure import Phase
from torchok_tpu.metrics.metrics_manager import MetricsManager


@pytest.fixture
def data():
    rng = np.random.default_rng(3)
    logits = rng.normal(size=(64, 5)).astype(np.float32)
    target = rng.integers(0, 5, size=(64,))
    return logits, target


def _run(metric, chunks):
    state = metric.empty_state()
    for preds, target in chunks:
        state = metric.update(state, preds=jnp.asarray(preds), target=jnp.asarray(target))
    return metric.compute(state)


def _chunks(logits, target, n=4):
    return [(logits[i::n], target[i::n]) for i in range(n)]


def test_accuracy_micro(data):
    logits, target = data
    m = METRICS.get("Accuracy")(task="multiclass", num_classes=5)
    ours = _run(m, _chunks(logits, target))
    ref = skm.accuracy_score(target, logits.argmax(1))
    assert abs(ours - ref) < 1e-6


def test_f1_macro(data):
    logits, target = data
    m = METRICS.get("F1Score")(task="multiclass", num_classes=5, average="macro")
    ours = _run(m, _chunks(logits, target))
    ref = skm.f1_score(target, logits.argmax(1), average="macro")
    assert abs(ours - ref) < 1e-6


def test_precision_recall_weighted(data):
    logits, target = data
    preds = logits.argmax(1)
    p = _run(METRICS.get("Precision")(task="multiclass", num_classes=5, average="weighted"),
             _chunks(logits, target))
    r = _run(METRICS.get("Recall")(task="multiclass", num_classes=5, average="weighted"),
             _chunks(logits, target))
    assert abs(p - skm.precision_score(target, preds, average="weighted")) < 1e-6
    assert abs(r - skm.recall_score(target, preds, average="weighted")) < 1e-6


def test_confusion_matrix(data):
    logits, target = data
    m = METRICS.get("ConfusionMatrix")(task="multiclass", num_classes=5)
    out = _run(m, _chunks(logits, target))
    ref = skm.confusion_matrix(target, logits.argmax(1), labels=range(5))
    for i in range(5):
        for j in range(5):
            assert out[f"{i}_{j}"] == ref[i, j]


def test_cohen_kappa_and_mcc(data):
    logits, target = data
    preds = logits.argmax(1)
    ck = _run(METRICS.get("CohenKappa")(task="multiclass", num_classes=5),
              _chunks(logits, target))
    mcc = _run(METRICS.get("MatthewsCorrCoef")(task="multiclass", num_classes=5),
               _chunks(logits, target))
    assert abs(ck - skm.cohen_kappa_score(target, preds)) < 1e-5
    assert abs(mcc - skm.matthews_corrcoef(target, preds)) < 1e-5


def test_auroc_binary():
    rng = np.random.default_rng(5)
    scores = rng.random(512).astype(np.float32)
    target = (scores + rng.normal(0, 0.3, 512) > 0.5).astype(np.int32)
    m = METRICS.get("AUROC")(task="binary")
    state = m.empty_state()
    state = m.update(state, preds=jnp.asarray(scores[:, None]),
                     target=jnp.asarray(target[:, None]))
    ours = m.compute(state)
    ref = skm.roc_auc_score(target, scores)
    assert abs(ours - ref) < 0.01  # binned approximation


def test_regression_metrics():
    rng = np.random.default_rng(7)
    preds = rng.normal(size=(100,)).astype(np.float32)
    target = preds + rng.normal(0, 0.1, 100).astype(np.float32)
    mse = METRICS.get("MeanSquaredError")()
    state = mse.update(mse.empty_state(), preds=jnp.asarray(preds), target=jnp.asarray(target))
    assert abs(mse.compute(state) - skm.mean_squared_error(target, preds)) < 1e-6
    r2 = METRICS.get("R2Score")()
    state = r2.update(r2.empty_state(), preds=jnp.asarray(preds), target=jnp.asarray(target))
    assert abs(r2.compute(state) - skm.r2_score(target, preds)) < 1e-5


def test_metrics_manager_routing(data):
    logits, target = data
    params = [
        {"name": "Accuracy", "params": {"task": "multiclass", "num_classes": 5},
         "mapping": {"preds": "prediction", "target": "target"}},
        {"name": "F1Score", "params": {"task": "multiclass", "num_classes": 5},
         "mapping": {"preds": "prediction", "target": "target"},
         "phases": ["VALID"], "tag": "f1"},
    ]
    mm = MetricsManager(params)
    mm.update(Phase.TRAIN, 0, prediction=jnp.asarray(logits), target=jnp.asarray(target))
    log = mm.on_epoch_end(Phase.TRAIN)
    assert "train/Accuracy" in log
    assert not any("f1" in k for k in log)  # f1 routed to VALID only
    mm.update(Phase.VALID, 0, prediction=jnp.asarray(logits), target=jnp.asarray(target))
    vlog = mm.on_epoch_end(Phase.VALID)
    assert "valid/f1" in vlog


def test_metrics_manager_duplicate_names_rejected():
    params = [
        {"name": "Accuracy", "params": {"task": "multiclass", "num_classes": 5},
         "mapping": {"preds": "p", "target": "t"}},
        {"name": "Accuracy", "params": {"task": "multiclass", "num_classes": 5},
         "mapping": {"preds": "p", "target": "t"}},
    ]
    with pytest.raises(ValueError, match="identical names"):
        MetricsManager(params)


def test_metrics_manager_multi_dataloader(data):
    logits, target = data
    params = [{
        "name": "Accuracy", "params": {"task": "multiclass", "num_classes": 5},
        "mapping": {"preds": "prediction", "target": "target"},
        "phases": ["VALID"], "val_dataloader_idxs": [0, 1],
    }]
    mm = MetricsManager(params)
    mm.update(Phase.VALID, 0, prediction=jnp.asarray(logits), target=jnp.asarray(target))
    mm.update(Phase.VALID, 1, prediction=jnp.asarray(logits),
              target=jnp.asarray((target + 1) % 5))
    log = mm.on_epoch_end(Phase.VALID)
    assert "valid/Accuracy_dataloader_0" in log
    assert "valid/Accuracy_dataloader_1" in log
    assert log["valid/Accuracy_dataloader_0"] != log["valid/Accuracy_dataloader_1"]


def test_stat_scores_counts():
    from torchok_tpu.constructor import METRICS
    m = METRICS.get("StatScores")(task="multiclass", num_classes=3, average="micro")
    state = m.empty_state()
    preds = jnp.asarray(np.array([[5, 0, 0], [0, 5, 0], [5, 0, 0], [0, 0, 5]],
                                 np.float32))
    target = jnp.asarray(np.array([0, 1, 1, 2]))
    state = m.update(state, preds=preds, target=target)
    out = m.compute(state)
    assert out["tp"] == 3 and out["support"] == 4
    # micro multiclass: fp == fn == number of misclassified samples
    assert out["fp"] == 1 and out["fn"] == 1


def test_hinge_loss_perfect_predictions_zero():
    from torchok_tpu.constructor import METRICS
    m = METRICS.get("HingeLoss")(task="multiclass", num_classes=3)
    state = m.empty_state()
    preds = jnp.asarray(np.array([[9, 0, 0], [0, 9, 0]], np.float32))
    target = jnp.asarray(np.array([0, 1]))
    state = m.update(state, preds=preds, target=target)
    assert m.compute(state) == 0.0
    # margin 0 (tie) -> hinge 1
    state2 = m.empty_state()
    state2 = m.update(state2, preds=jnp.asarray(np.array([[1., 1., 0.]])),
                      target=jnp.asarray(np.array([0])))
    assert abs(m.compute(state2) - 1.0) < 1e-6


def test_roc_and_pr_curve_shapes():
    from torchok_tpu.constructor import METRICS
    rng = np.random.default_rng(0)
    scores = rng.uniform(0, 1, size=(64, 1)).astype(np.float32)
    labels = (scores[:, 0] > 0.5).astype(np.int64)[:, None]
    for name, first_is_decreasing in [("ROC", False), ("PrecisionRecallCurve", None)]:
        m = METRICS.get(name)(task="binary")
        state = m.empty_state()
        state = m.update(state, preds=jnp.asarray(scores), target=jnp.asarray(labels))
        a, b, th = m.compute(state)
        assert a.shape == th.shape and b.shape == th.shape


def test_smape_wmape_tweedie():
    from torchok_tpu.constructor import METRICS
    p = jnp.asarray(np.array([1.0, 2.0, 3.0], np.float32))
    t = jnp.asarray(np.array([1.0, 2.0, 3.0], np.float32))
    for name in ["SymmetricMeanAbsolutePercentageError",
                 "WeightedMeanAbsolutePercentageError"]:
        m = METRICS.get(name)()
        s = m.update(m.empty_state(), preds=p, target=t)
        assert abs(m.compute(s)) < 1e-7, name
    m = METRICS.get("TweedieDevianceScore")(power=0)
    s = m.update(m.empty_state(), preds=p, target=t + 1.0)
    assert abs(m.compute(s) - 1.0) < 1e-6  # MSE form: mean((t-p)^2) == 1


def test_spectral_distortion_index_zero_for_identical():
    from torchok_tpu.constructor import METRICS
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.uniform(0, 1, size=(2, 16, 16, 3)).astype(np.float32))
    m = METRICS.get("SpectralDistortionIndex")()
    s = m.update(m.empty_state(), preds=img, target=img)
    assert abs(m.compute(s)) < 1e-6
