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
