"""Shape tests for the detection neck zoo (mirrors the reference's neck
shape tests, reference: tests/additional_tests/models/necks/)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import torchok_tpu  # noqa: F401
from torchok_tpu.constructor import DETECTION_NECKS

IN_CHANNELS = (64, 128, 256)


@pytest.fixture(scope="module")
def pyramid():
    rng = np.random.default_rng(0)
    return [jnp.asarray(rng.normal(size=(2, s, s, c)).astype(np.float32))
            for s, c in zip((32, 16, 8), IN_CHANNELS)]


def _run(name, inputs, **params):
    params.setdefault("in_channels", IN_CHANNELS)
    neck = DETECTION_NECKS.get(name)(**params)
    variables = neck.init(jax.random.PRNGKey(0), inputs)
    return neck.apply(variables, inputs)


def test_channel_mapper(pyramid):
    outs = _run("ChannelMapper", pyramid, out_channels=96)
    assert len(outs) == 3
    for o, x in zip(outs, pyramid):
        assert o.shape == x.shape[:3] + (96,)


def test_bfp():
    # BFP (like the mmdet original) requires uniform channels across levels
    rng = np.random.default_rng(1)
    uniform = [jnp.asarray(rng.normal(size=(2, s, s, 128)).astype(np.float32))
               for s in (32, 16, 8)]
    outs = _run("BFP", uniform, in_channels=(128, 128, 128),
                out_channels=128, refine_level=1)
    assert len(outs) == 3
    for o, x in zip(outs, uniform):
        assert o.shape == x.shape  # residual refinement keeps shapes


def test_hrfpn(pyramid):
    outs = _run("HRFPN", pyramid, out_channels=128, num_outs=5)
    assert len(outs) == 5
    assert outs[0].shape == (2, 32, 32, 128)
    assert outs[4].shape == (2, 2, 2, 128)


def test_pafpn(pyramid):
    outs = _run("PAFPN", pyramid, out_channels=128, num_outs=5)
    assert len(outs) == 5
    assert outs[0].shape == (2, 32, 32, 128)
    assert outs[2].shape == (2, 8, 8, 128)
    assert outs[4].shape == (2, 2, 2, 128)


def test_nasfpn(pyramid):
    outs = _run("NASFPN", pyramid, out_channels=128, num_outs=5, stack_times=1)
    assert len(outs) == 5
    assert outs[0].shape == (2, 32, 32, 128)
    assert outs[4].shape == (2, 2, 2, 128)


def test_nasfcos_fpn(pyramid):
    outs = _run("NASFCOS_FPN", pyramid, out_channels=128, num_outs=5)
    assert len(outs) == 5
    assert outs[0].shape == (2, 32, 32, 128)


def test_fpn_carafe(pyramid):
    outs = _run("FPN_CARAFE", pyramid, out_channels=128, num_outs=5)
    assert len(outs) == 5
    assert outs[0].shape == (2, 32, 32, 128)
    assert outs[1].shape == (2, 16, 16, 128)


def test_yolov3_neck(pyramid):
    outs = _run("YOLOV3Neck", pyramid, out_channels=(32, 64, 128))
    assert len(outs) == 3
    # shallow -> deep ordering with the configured output channels
    assert outs[0].shape == (2, 32, 32, 32)
    assert outs[2].shape == (2, 8, 8, 128)


def test_dilated_encoder(pyramid):
    outs = _run("DilatedEncoder", pyramid, out_channels=128)
    assert len(outs) == 1
    assert outs[0].shape == (2, 8, 8, 128)


def test_ct_resnet_neck(pyramid):
    outs = _run("CTResNetNeck", pyramid, num_deconv_filters=(128, 64, 32))
    assert len(outs) == 1
    assert outs[0].shape == (2, 64, 64, 32)  # 8 * 2^3


def test_ssd_neck(pyramid):
    outs = _run("SSDNeck", pyramid,
                in_channels=IN_CHANNELS[-2:],
                out_channels=(128, 256, 128, 64),
                level_strides=(2, 2), level_paddings=(1, 1))
    assert len(outs) == 4
    assert outs[0].shape == (2, 16, 16, 128)   # l2-normed input level
    assert outs[2].shape == (2, 4, 4, 128)
    assert outs[3].shape == (2, 2, 2, 64)


def test_yolox_pafpn(pyramid):
    outs = _run("YOLOXPAFPN", pyramid, out_channels=96, num_csp_blocks=1)
    assert len(outs) == 3
    for o, x in zip(outs, pyramid):
        assert o.shape == x.shape[:3] + (96,)


def test_fpg(pyramid):
    outs = _run("FPG", pyramid, out_channels=128, num_outs=5, stack_times=2)
    assert len(outs) == 5
    assert outs[0].shape == (2, 32, 32, 128)


def test_rfp(pyramid):
    outs = _run("RFP", pyramid, out_channels=128, num_outs=5, rfp_steps=2)
    assert len(outs) == 5
    assert outs[0].shape == (2, 32, 32, 128)


def test_rfp_backbone_recursion():
    """True DetectoRS recursion: the neck re-runs its own backbone on the
    image with per-stage ASPP feedback. At init the zero-init rfp_weight
    gate mixes refined/previous 50/50 (mmdet constant_init(rfp_weight, 0));
    the feedback path must carry gradient end to end."""
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
    # feature channels of resnet10t stages 2..4
    from torchok_tpu.constructor import BACKBONES
    bb = BACKBONES.get("resnet10t")()
    bvars = bb.init(jax.random.PRNGKey(1), img, False)
    feats = bb.apply(bvars, img, False, method=bb.forward_features)[-3:]
    in_ch = tuple(f.shape[-1] for f in feats)

    neck = DETECTION_NECKS.get("RFP")(
        in_channels=in_ch, out_channels=32, num_outs=3, rfp_steps=2,
        rfp_backbone_name="resnet10t")
    assert neck.requires_image
    inputs = [img] + list(feats)
    variables = neck.init(jax.random.PRNGKey(0), inputs)
    assert "rfp_backbone" in variables["params"]
    # the internal backbone got its per-stage feedback injection convs
    bb_params = variables["params"]["rfp_backbone"]
    assert any(k.startswith("rfp_conv") for k in bb_params), list(bb_params)[:8]
    outs = neck.apply(variables, inputs,
                      mutable=["batch_stats"])[0]
    assert len(outs) == 3 and outs[0].shape == (1, 8, 8, 32)
    for o in outs:
        assert bool(jnp.all(jnp.isfinite(o)))

    def loss(params):
        o = neck.apply({"params": params,
                        "batch_stats": variables.get("batch_stats", {})},
                       inputs, mutable=["batch_stats"])[0]
        return sum(jnp.sum(x ** 2) for x in o)

    g = jax.grad(loss)(variables["params"])
    gb = g["rfp_backbone"]
    total = sum(float(jnp.abs(x).sum())
                for x in jax.tree_util.tree_leaves(gb))
    assert np.isfinite(total) and total > 0
    # the zero-init injection convs must receive gradient (dL/dW is upstream
    # x aspp activations, nonzero even though the kernels start at 0 — ASPP
    # params themselves only start learning once these kernels move)
    g_inject = sum(float(jnp.abs(jax.tree_util.tree_leaves(v)[0]).sum())
                   for k, v in gb.items() if k.startswith("rfp_conv"))
    assert g_inject > 0


def test_dyhead(pyramid):
    outs = _run("DyHead", pyramid, out_channels=128, num_blocks=2)
    assert len(outs) == 3
    for o, x in zip(outs, pyramid):
        assert o.shape == x.shape[:3] + (128,)


def test_all_reference_neck_names_registered():
    ref_names = ["FPN", "BFP", "ChannelMapper", "HRFPN", "NASFPN",
                 "FPN_CARAFE", "PAFPN", "NASFCOS_FPN", "YOLOV3Neck",
                 "DilatedEncoder", "CTResNetNeck", "RFP", "FPG", "SSDNeck",
                 "YOLOXPAFPN", "DyHead"]
    registered = set(DETECTION_NECKS.list_models())
    missing = [n for n in ref_names if n not in registered]
    assert not missing, f"missing detection necks: {missing}"


def test_necks_jit_clean(pyramid):
    """Necks must trace under jit (static shapes, no host sync)."""
    neck = DETECTION_NECKS.get("PAFPN")(in_channels=IN_CHANNELS,
                                        out_channels=64, num_outs=5)
    variables = neck.init(jax.random.PRNGKey(0), pyramid)
    jitted = jax.jit(lambda v, xs: neck.apply(v, xs))
    outs = jitted(variables, pyramid)
    assert len(outs) == 5


def test_rfp_rejects_backbones_without_feedback_support():
    """DetectoRS recursion needs rfp_feats injection (resnet-only, like
    mmdet's RFP): a clear error instead of a TypeError from deep inside a
    Flax trace."""
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
    feats = [jnp.zeros((1, 16, 16, 8)), jnp.zeros((1, 8, 8, 16)),
             jnp.zeros((1, 4, 4, 32))]
    neck = DETECTION_NECKS.get("RFP")(
        in_channels=(8, 16, 32), out_channels=16, num_outs=3, rfp_steps=2,
        rfp_backbone_name="vit_tiny_patch16_224")
    with pytest.raises(ValueError, match="resnet-family"):
        neck.init(jax.random.PRNGKey(0), [img] + feats)
