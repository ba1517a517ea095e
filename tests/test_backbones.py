"""Backbone shape-parity tests (reference pattern:
tests/additional_tests/models/backbones/test_backbone.py:10-67 — forward
shape + full forward_features pyramid + traceability, here jit-ability)."""
import jax
import jax.numpy as jnp
import pytest

from torchok_tpu.constructor import BACKBONES

VARIANTS = [
    ("resnet18", 512, 5),
    ("resnet50", 2048, 5),
    ("resnet50d", 2048, 5),
    ("resnext50_32x4d", 2048, 5),
    ("seresnet18", 512, 5),
]


@pytest.mark.parametrize("name,out_ch,n_stages", VARIANTS)
def test_backbone_shapes(name, out_ch, n_stages):
    model = BACKBONES.get(name)()
    x = jnp.zeros((2, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x, False)
    out = model.apply(variables, x, False)
    assert out.shape == (2, 2, 2, out_ch)
    assert model.out_channels == out_ch

    feats = model.apply(variables, x, False, method=model.forward_features)
    assert len(feats) == n_stages + 1  # [input] + stem + 4 stages
    assert feats[0].shape == (2, 64, 64, 3)
    strides = [1, 2, 4, 8, 16, 32]
    for f, s in zip(feats, strides):
        assert f.shape[1] == 64 // s
    assert tuple(f.shape[-1] for f in feats[1:]) == model.out_encoder_channels


def test_backbone_jittable():
    model = BACKBONES.get("resnet18")()
    x = jnp.zeros((1, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x, False)
    fn = jax.jit(lambda v, x: model.apply(v, x, False))
    out = fn(variables, x)
    assert out.shape == (1, 1, 1, 512)


def test_backbone_train_mode_updates_bn():
    model = BACKBONES.get("resnet18")()
    x = jnp.ones((2, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x, False)
    _, new_vars = model.apply(variables, x, True, mutable=["batch_stats"])
    # running stats must move away from init
    leaves_old = jax.tree_util.tree_leaves(variables["batch_stats"])
    leaves_new = jax.tree_util.tree_leaves(new_vars["batch_stats"])
    changed = any(bool(jnp.any(a != b)) for a, b in zip(leaves_old, leaves_new))
    assert changed


def test_get_stages_prefixes():
    model = BACKBONES.get("resnet18")()
    p0 = model.get_stages(0)
    p2 = model.get_stages(2)
    assert "conv1" in p0 and not any("layer" in p for p in p0)
    assert any(p.startswith("layer1") for p in p2)
    assert any(p.startswith("layer2") for p in p2)
    assert not any(p.startswith("layer3") for p in p2)


def test_output_stride_dilation():
    model = BACKBONES.get("resnet18")(output_stride=8)
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x, False)
    out = model.apply(variables, x, False)
    assert out.shape == (1, 8, 8, 512)  # stride 8 instead of 32


def test_registry_list_models():
    names = BACKBONES.list_models("resnet*")
    assert "resnet18" in names and "resnet50" in names


NEW_FAMILY_VARIANTS = [
    # name, out_channels at 64x64 input
    "resnetblur18", "resnet50_gn", "seresnetaa50d", "ecaresnetlight",
    "senet154", "mixnet_s", "fbnetv3_b", "tf_efficientnetv2_b0",
    "efficientnet_es", "spnasnet_100", "tf_mobilenetv3_large_minimal_100",
]


@pytest.mark.parametrize("name", NEW_FAMILY_VARIANTS)
def test_extended_variants_forward(name):
    model = BACKBONES.get(name)()
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x, False)
    out = model.apply(variables, x, False)
    assert out.shape[1] == 2 and out.shape[2] == 2  # stride 32
    assert out.shape[-1] == model.out_channels
    feats = model.apply(variables, x, False, method=model.forward_features)
    assert tuple(f.shape[-1] for f in feats[1:]) == model.out_encoder_channels


def test_backbone_registry_covers_reference_names():
    """Every backbone entrypoint the reference registers must exist here."""
    import re, glob, os
    ref = set()
    ref_dir = "/root/reference/torchok/models/backbones"
    if not os.path.isdir(ref_dir):
        pytest.skip("reference checkout unavailable")
    for f in glob.glob(ref_dir + "/*.py"):
        for m in re.finditer(r"@BACKBONES\.register_class\s*\ndef\s+(\w+)",
                             open(f).read()):
            ref.add(m.group(1))
    ours = set(BACKBONES.list_models())
    missing = sorted(ref - ours)
    assert not missing, f"missing backbone variants: {missing[:20]} (+{len(missing)})"


FAMILY_REPRESENTATIVES = [
    # (name, input_hw) — one representative per family, mirroring the
    # reference's per-family shape tests (test_backbone.py:10-67)
    ("efficientnet_b0", 64),
    ("efficientnetv2_s", 64),
    ("mobilenetv3_large_100", 64),
    ("lcnet_100", 64),
    ("hrnet_w18_small", 64),
    ("vit_tiny_patch16_224", 224),
    ("beit_base_patch16_224", 224),
    ("davit_t", 64),
    ("gcvit_xxtiny", 64),
    ("swinv2_tiny_window8_256", 256),
]


@pytest.mark.parametrize("name,hw", FAMILY_REPRESENTATIVES)
def test_family_forward_features_pyramid(name, hw):
    model = BACKBONES.get(name)()
    x = jnp.zeros((1, hw, hw, 3))
    variables = model.init(jax.random.PRNGKey(0), x, False)

    def apply(method=None):
        kwargs = {"method": method} if method else {}
        out = model.apply(variables, x, False,
                          mutable=["batch_stats", "buffers"], **kwargs)
        return out[0]

    out = apply()
    if isinstance(out, (list, tuple)):  # HRNet: multi-branch output
        assert [o.shape[-1] for o in out] == list(model.out_channels)
    else:
        assert out.shape[-1] == model.out_channels
    feats = apply(method=model.forward_features)
    assert feats[0].shape == (1, hw, hw, 3)  # [input] + stages
    got = tuple(f[-1].shape[-1] if isinstance(f, (list, tuple)) else f.shape[-1]
                for f in feats[1:])
    want = tuple(c[-1] if isinstance(c, (list, tuple)) else c
                 for c in model.out_encoder_channels)
    assert got == want, (got, want)


def test_gcvit_params_are_input_resolution_independent():
    """Reference gcvit derives window sizes from the CONFIGURED img_size at
    build time (gcvit.py:82-86), not from the runtime input — a 224-built
    checkpoint (rel-pos tables sized by ws=(7,7,14,7)) must apply unchanged
    at 448. Guards a regression where ws came from x.shape."""
    model = BACKBONES.get("gcvit_xxtiny")()
    shapes_224 = jax.eval_shape(
        lambda x: model.init(jax.random.PRNGKey(0), x, False),
        jnp.zeros((1, 224, 224, 3), jnp.float32))
    shapes_448 = jax.eval_shape(
        lambda x: model.init(jax.random.PRNGKey(0), x, False),
        jnp.zeros((1, 448, 448, 3), jnp.float32))
    t224 = jax.tree_util.tree_map(lambda s: s.shape, shapes_224)
    t448 = jax.tree_util.tree_map(lambda s: s.shape, shapes_448)
    assert t224 == t448
