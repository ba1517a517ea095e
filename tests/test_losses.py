"""Loss numerics cross-checked against torch (CPU) where available —
the reference is torch-based, so matching torch.nn losses at fp32 tolerance
is the parity criterion (SURVEY.md §6)."""
import jax.numpy as jnp
import numpy as np
import pytest

from torchok_tpu.constructor import LOSSES
from torchok_tpu.losses.base import JointLoss

torch = pytest.importorskip("torch")


def _np(x):
    return np.asarray(x, np.float32)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_cross_entropy_matches_torch(rng):
    logits = rng.normal(size=(8, 5)).astype(np.float32)
    target = rng.integers(0, 5, size=(8,))
    ours = LOSSES.get("CrossEntropyLoss")()(input=jnp.asarray(logits),
                                            target=jnp.asarray(target))
    theirs = torch.nn.CrossEntropyLoss()(torch.tensor(logits),
                                         torch.tensor(target)).item()
    assert abs(float(ours) - theirs) < 1e-5


def test_cross_entropy_ignore_index(rng):
    logits = rng.normal(size=(6, 4)).astype(np.float32)
    target = np.array([0, 1, -100, 3, -100, 2])
    ours = LOSSES.get("CrossEntropyLoss")()(input=jnp.asarray(logits),
                                            target=jnp.asarray(target))
    theirs = torch.nn.CrossEntropyLoss(ignore_index=-100)(
        torch.tensor(logits), torch.tensor(target)).item()
    assert abs(float(ours) - theirs) < 1e-5


def test_cross_entropy_label_smoothing(rng):
    logits = rng.normal(size=(8, 5)).astype(np.float32)
    target = rng.integers(0, 5, size=(8,))
    ours = LOSSES.get("CrossEntropyLoss")(label_smoothing=0.1)(
        input=jnp.asarray(logits), target=jnp.asarray(target))
    theirs = torch.nn.CrossEntropyLoss(label_smoothing=0.1)(
        torch.tensor(logits), torch.tensor(target)).item()
    assert abs(float(ours) - theirs) < 1e-5


def test_bce_with_logits_matches_torch(rng):
    logits = rng.normal(size=(8, 3)).astype(np.float32)
    target = rng.integers(0, 2, size=(8, 3)).astype(np.float32)
    pos_weight = np.array([1.0, 2.0, 0.5], np.float32)
    ours = LOSSES.get("BCEWithLogitsLoss")(pos_weight=pos_weight.tolist())(
        input=jnp.asarray(logits), target=jnp.asarray(target))
    theirs = torch.nn.BCEWithLogitsLoss(pos_weight=torch.tensor(pos_weight))(
        torch.tensor(logits), torch.tensor(target)).item()
    assert abs(float(ours) - theirs) < 1e-5


def test_mse_l1_smoothl1(rng):
    a = rng.normal(size=(10,)).astype(np.float32)
    b = rng.normal(size=(10,)).astype(np.float32)
    for name, tcls in [("MSELoss", torch.nn.MSELoss), ("L1Loss", torch.nn.L1Loss),
                       ("SmoothL1Loss", torch.nn.SmoothL1Loss),
                       ("HuberLoss", torch.nn.HuberLoss)]:
        ours = LOSSES.get(name)()(input=jnp.asarray(a), target=jnp.asarray(b))
        theirs = tcls()(torch.tensor(a), torch.tensor(b)).item()
        assert abs(float(ours) - theirs) < 1e-5, name


def test_triplet_margin_matches_torch(rng):
    a, p, n = (rng.normal(size=(4, 8)).astype(np.float32) for _ in range(3))
    ours = LOSSES.get("TripletMarginLoss")(margin=0.5)(
        anchor=jnp.asarray(a), positive=jnp.asarray(p), negative=jnp.asarray(n))
    theirs = torch.nn.TripletMarginLoss(margin=0.5)(
        torch.tensor(a), torch.tensor(p), torch.tensor(n)).item()
    assert abs(float(ours) - theirs) < 1e-4


def test_joint_loss_weights_and_mapping(rng):
    logits = rng.normal(size=(8, 5)).astype(np.float32)
    target = rng.integers(0, 5, size=(8,))
    ce = LOSSES.get("CrossEntropyLoss")()
    mse = LOSSES.get("MSELoss")()
    jl = JointLoss(
        losses=[ce, mse],
        mappings=[{"input": "prediction", "target": "target"},
                  {"input": "embeddings", "target": "embeddings_gt"}],
        tags=["ce", "mse"],
        weights=[3.0, 1.0],
        normalize_weights=True,
    )
    emb = rng.normal(size=(8, 4)).astype(np.float32)
    emb_gt = rng.normal(size=(8, 4)).astype(np.float32)
    total, tagged = jl(prediction=jnp.asarray(logits), target=jnp.asarray(target),
                       embeddings=jnp.asarray(emb), embeddings_gt=jnp.asarray(emb_gt))
    expected = 0.75 * float(tagged["ce"]) + 0.25 * float(tagged["mse"])
    assert abs(float(total) - expected) < 1e-6
    assert jl["ce"] is ce
    with pytest.raises(KeyError):
        jl["nope"]


def test_joint_loss_partial_weights_rejected():
    ce = LOSSES.get("CrossEntropyLoss")()
    with pytest.raises(ValueError):
        JointLoss([ce, ce], [{}, {}], [None, None], [1.0, None])


def test_joint_loss_missing_mapping_key():
    ce = LOSSES.get("CrossEntropyLoss")()
    jl = JointLoss([ce], [{"input": "prediction", "target": "target"}], [None], [None])
    with pytest.raises(ValueError, match="prediction"):
        jl(target=jnp.zeros(3))


def test_dice_loss_multiclass():
    # perfect prediction -> loss ~ 0
    logits = np.full((2, 4, 4, 3), -20.0, np.float32)
    target = np.zeros((2, 4, 4), np.int64)
    target[:, :2] = 1
    for n in range(2):
        for i in range(4):
            for j in range(4):
                logits[n, i, j, target[n, i, j]] = 20.0
    loss = LOSSES.get("DiceLoss")(mode="multiclass")(
        input=jnp.asarray(logits), target=jnp.asarray(target))
    assert float(loss) < 1e-3


def test_nt_xent_positive_pairs_low_loss(rng):
    emb = rng.normal(size=(6, 16)).astype(np.float32)
    emb = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    loss_same = LOSSES.get("NT_XentLoss")(temperature=0.1)(
        emb1=jnp.asarray(emb), emb2=jnp.asarray(emb))
    other = rng.normal(size=(6, 16)).astype(np.float32)
    other = other / np.linalg.norm(other, axis=1, keepdims=True)
    loss_diff = LOSSES.get("NT_XentLoss")(temperature=0.1)(
        emb1=jnp.asarray(emb), emb2=jnp.asarray(other))
    assert float(loss_same) < float(loss_diff)


def test_contrastive_loss_semantics():
    e = jnp.asarray(np.eye(4, 8, dtype=np.float32))
    R = jnp.eye(4)
    loss = LOSSES.get("ContrastiveLoss")(margin=1.0)(emb1=e, emb2=e, R=R)
    # identical embeddings, relevant pairs at distance 0; irrelevant at sqrt(2)>margin
    assert float(loss) < 1e-5


def test_multi_margin_matches_torch(rng):
    logits = rng.normal(size=(8, 5)).astype(np.float32)
    target = rng.integers(0, 5, size=(8,))
    ours = LOSSES.get("MultiMarginLoss")(margin=0.7)(
        input=jnp.asarray(logits), target=jnp.asarray(target))
    theirs = torch.nn.MultiMarginLoss(margin=0.7)(
        torch.tensor(logits), torch.tensor(target)).item()
    assert abs(float(ours) - theirs) < 1e-5


def test_multi_label_margin_matches_torch(rng):
    logits = rng.normal(size=(4, 6)).astype(np.float32)
    target = np.array([[1, 3, -1, -1, -1, -1],
                       [0, -1, -1, -1, -1, -1],
                       [2, 4, 5, -1, -1, -1],
                       [1, -1, 3, -1, -1, -1]], np.int64)  # 3rd row: -1 stops parsing
    ours = LOSSES.get("MultiLabelMarginLoss")()(
        input=jnp.asarray(logits), target=jnp.asarray(target))
    theirs = torch.nn.MultiLabelMarginLoss()(
        torch.tensor(logits), torch.tensor(target)).item()
    assert abs(float(ours) - theirs) < 1e-5


def test_triplet_with_distance_matches_torch(rng):
    a, p, n = (rng.normal(size=(4, 8)).astype(np.float32) for _ in range(3))
    ours = LOSSES.get("TripletMarginWithDistanceLoss")(
        distance_function="cosine", margin=0.3)(
        anchor=jnp.asarray(a), positive=jnp.asarray(p), negative=jnp.asarray(n))
    dist = lambda x, y: 1.0 - torch.nn.functional.cosine_similarity(x, y)
    theirs = torch.nn.TripletMarginWithDistanceLoss(
        distance_function=dist, margin=0.3)(
        torch.tensor(a), torch.tensor(p), torch.tensor(n)).item()
    assert abs(float(ours) - theirs) < 1e-5


def test_ctc_matches_torch(rng):
    T, N, C, S = 12, 3, 6, 4
    logits = rng.normal(size=(T, N, C)).astype(np.float32)
    log_probs = torch.log_softmax(torch.tensor(logits), dim=-1)
    targets = rng.integers(1, C, size=(N, S)).astype(np.int64)
    input_lengths = np.array([12, 10, 8], np.int64)
    target_lengths = np.array([4, 3, 2], np.int64)
    ours = LOSSES.get("CTCLoss")()(
        log_probs=jnp.asarray(log_probs.numpy()), targets=jnp.asarray(targets),
        input_lengths=jnp.asarray(input_lengths),
        target_lengths=jnp.asarray(target_lengths))
    theirs = torch.nn.CTCLoss(blank=0)(
        log_probs, torch.tensor(targets), torch.tensor(input_lengths),
        torch.tensor(target_lengths)).item()
    assert abs(float(ours) - theirs) < 1e-4


def test_iou_family_perfect_boxes_zero_loss():
    boxes = jnp.asarray(np.array([[0, 0, 10, 10], [5, 5, 20, 30]], np.float32))
    for name in ["GIoULoss", "DIoULoss", "CIoULoss", "BoundedIoULoss"]:
        loss = LOSSES.get(name)()(pred=boxes, target=boxes)
        assert abs(float(loss)) < 1e-4, name


def test_iou_family_orders_by_overlap():
    target = jnp.asarray(np.array([[0, 0, 10, 10]], np.float32))
    near = jnp.asarray(np.array([[1, 1, 11, 11]], np.float32))
    far = jnp.asarray(np.array([[20, 20, 30, 30]], np.float32))
    for name in ["GIoULoss", "DIoULoss", "CIoULoss"]:
        ln = float(LOSSES.get(name)()(pred=near, target=target))
        lf = float(LOSSES.get(name)()(pred=far, target=target))
        assert ln < lf, name


def test_distribution_focal_loss_prefers_correct_bins():
    # target 2.3 -> bins 2 (w 0.7) and 3 (w 0.3)
    good = np.full((1, 8), -10.0, np.float32)
    good[0, 2] = 10.0
    bad = np.full((1, 8), -10.0, np.float32)
    bad[0, 6] = 10.0
    t = jnp.asarray(np.array([2.3], np.float32))
    dfl = LOSSES.get("DistributionFocalLoss")()
    assert float(dfl(pred=jnp.asarray(good), target=t)) < \
        float(dfl(pred=jnp.asarray(bad), target=t))


def test_quality_varifocal_gaussian_losses_finite(rng):
    pred = jnp.asarray(rng.normal(size=(6, 4)).astype(np.float32))
    soft = jnp.asarray(rng.uniform(0, 1, size=(6, 4)).astype(np.float32))
    for name in ["QualityFocalLoss", "VarifocalLoss"]:
        v = float(LOSSES.get(name)()(pred=pred, target=soft))
        assert np.isfinite(v) and v > 0, name
    heat = jnp.asarray(rng.uniform(0, 0.99, size=(2, 8, 8)).astype(np.float32))
    p = jnp.asarray(rng.uniform(0.01, 0.99, size=(2, 8, 8)).astype(np.float32))
    v = float(LOSSES.get("GaussianFocalLoss")()(pred=p, target=heat))
    assert np.isfinite(v)


def test_ghm_and_seesaw_finite(rng):
    pred = jnp.asarray(rng.normal(size=(16, 3)).astype(np.float32))
    tgt = jnp.asarray(rng.integers(0, 2, size=(16, 3)).astype(np.float32))
    assert np.isfinite(float(LOSSES.get("GHMC")()(pred=pred, target=tgt)))
    reg_p = jnp.asarray(rng.normal(size=(16, 4)).astype(np.float32))
    reg_t = jnp.asarray(rng.normal(size=(16, 4)).astype(np.float32))
    assert np.isfinite(float(LOSSES.get("GHMR")()(pred=reg_p, target=reg_t)))
    logits = jnp.asarray(rng.normal(size=(8, 5)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 5, size=(8,)))
    seesaw = LOSSES.get("SeesawLoss")(
        num_classes=5, class_counts=[100, 50, 10, 5, 1])
    assert np.isfinite(float(seesaw(pred=logits, target=labels)))


def test_kd_kldiv_zero_for_identical_logits(rng):
    logits = jnp.asarray(rng.normal(size=(4, 7)).astype(np.float32))
    loss = LOSSES.get("KnowledgeDistillationKLDivLoss")(T=4)(
        pred=logits, soft_label=logits)
    assert abs(float(loss)) < 1e-6
