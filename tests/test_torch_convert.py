"""torch->Flax weight converter tests.

The oracle is NOT the converter's own mapping: the torch side of each
equivalence test is an independent functional re-implementation of the
architecture using torch.nn.functional with timm-style state_dict keys
(the key naming the reference's checkpoints use — reference:
torchok/models/backbones/resnet.py:566-569). If the converter maps a key
to the wrong place or with the wrong layout, the outputs diverge.
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from torchok_tpu.constructor import BACKBONES
from torchok_tpu.utils.torch_convert import (
    convert_state_dict, fit_tensor, mapper_for)


def _rand(shape, gen):
    return torch.from_numpy(gen.normal(0, 0.05, shape).astype(np.float32))


def _bn_entries(sd, prefix, ch, gen):
    sd[f"{prefix}.weight"] = _rand((ch,), gen) + 1.0
    sd[f"{prefix}.bias"] = _rand((ch,), gen)
    sd[f"{prefix}.running_mean"] = _rand((ch,), gen)
    sd[f"{prefix}.running_var"] = torch.abs(_rand((ch,), gen)) + 1.0
    sd[f"{prefix}.num_batches_tracked"] = torch.tensor(0)


# --------------------------------------------------------------------------
# resnet18 full-network equivalence


def _make_resnet18_state_dict(gen):
    sd = {}
    sd["conv1.weight"] = _rand((64, 3, 7, 7), gen)
    _bn_entries(sd, "bn1", 64, gen)
    chans = [64, 64, 128, 256, 512]
    for li, (cin, cout) in enumerate(zip(chans[:-1], chans[1:]), start=1):
        for b in range(2):
            p = f"layer{li}.{b}"
            c_in = cin if b == 0 else cout
            sd[f"{p}.conv1.weight"] = _rand((cout, c_in, 3, 3), gen)
            _bn_entries(sd, f"{p}.bn1", cout, gen)
            sd[f"{p}.conv2.weight"] = _rand((cout, cout, 3, 3), gen)
            _bn_entries(sd, f"{p}.bn2", cout, gen)
            if b == 0 and (li > 1):
                sd[f"{p}.downsample.0.weight"] = _rand((cout, c_in, 1, 1), gen)
                _bn_entries(sd, f"{p}.downsample.1", cout, gen)
    sd["fc.weight"] = _rand((1000, 512), gen)  # classifier: must be skipped
    sd["fc.bias"] = _rand((1000,), gen)
    return sd


def _torch_resnet18_features(sd, x):
    def bn(x, p):
        return F.batch_norm(x, sd[f"{p}.running_mean"], sd[f"{p}.running_var"],
                            sd[f"{p}.weight"], sd[f"{p}.bias"],
                            training=False, eps=1e-5)

    x = F.conv2d(x, sd["conv1.weight"], stride=2, padding=3)
    x = F.relu(bn(x, "bn1"))
    x = F.max_pool2d(x, 3, 2, 1)
    for li in range(1, 5):
        for b in range(2):
            p = f"layer{li}.{b}"
            stride = 2 if (b == 0 and li > 1) else 1
            identity = x
            out = F.conv2d(x, sd[f"{p}.conv1.weight"], stride=stride, padding=1)
            out = F.relu(bn(out, f"{p}.bn1"))
            out = F.conv2d(out, sd[f"{p}.conv2.weight"], stride=1, padding=1)
            out = bn(out, f"{p}.bn2")
            if f"{p}.downsample.0.weight" in sd:
                identity = bn(F.conv2d(x, sd[f"{p}.downsample.0.weight"],
                                       stride=stride), f"{p}.downsample.1")
            x = F.relu(out + identity)
    return x


def test_resnet18_forward_matches_torch():
    gen = np.random.default_rng(0)
    sd = _make_resnet18_state_dict(gen)

    model = BACKBONES.get("resnet18")()
    x_np = gen.normal(0, 1, (2, 3, 64, 64)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.asarray(x_np.transpose(0, 2, 3, 1)), False)
    converted, report = convert_state_dict("resnet18", sd, variables)
    assert not report.missing, report.missing
    assert not report.unused, report.unused

    theirs = _torch_resnet18_features(sd, torch.from_numpy(x_np)).numpy()
    ours = np.asarray(model.apply(converted,
                                  jnp.asarray(x_np.transpose(0, 2, 3, 1)), False))
    np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), theirs,
                               rtol=1e-4, atol=1e-4)


# --------------------------------------------------------------------------
# vit patch-embed + transformer block equivalence


def _make_vit_tiny_state_dict(gen, depth=12, dim=192, heads=3):
    sd = {}
    sd["cls_token"] = _rand((1, 1, dim), gen)
    sd["pos_embed"] = _rand((1, 197, dim), gen)
    sd["patch_embed.proj.weight"] = _rand((dim, 3, 16, 16), gen)
    sd["patch_embed.proj.bias"] = _rand((dim,), gen)
    for i in range(depth):
        p = f"blocks.{i}"
        for n in ("norm1", "norm2"):
            sd[f"{p}.{n}.weight"] = _rand((dim,), gen) + 1.0
            sd[f"{p}.{n}.bias"] = _rand((dim,), gen)
        sd[f"{p}.attn.qkv.weight"] = _rand((dim * 3, dim), gen)
        sd[f"{p}.attn.qkv.bias"] = _rand((dim * 3,), gen)
        sd[f"{p}.attn.proj.weight"] = _rand((dim, dim), gen)
        sd[f"{p}.attn.proj.bias"] = _rand((dim,), gen)
        sd[f"{p}.mlp.fc1.weight"] = _rand((dim * 4, dim), gen)
        sd[f"{p}.mlp.fc1.bias"] = _rand((dim * 4,), gen)
        sd[f"{p}.mlp.fc2.weight"] = _rand((dim, dim * 4), gen)
        sd[f"{p}.mlp.fc2.bias"] = _rand((dim,), gen)
    sd["norm.weight"] = _rand((dim,), gen) + 1.0
    sd["norm.bias"] = _rand((dim,), gen)
    return sd


def test_vit_tiny_converts_completely():
    gen = np.random.default_rng(1)
    sd = _make_vit_tiny_state_dict(gen)
    model = BACKBONES.get("vit_tiny_patch16_224")()
    x = jnp.zeros((1, 224, 224, 3))
    variables = model.init(jax.random.PRNGKey(0), x, False)
    converted, report = convert_state_dict("vit_tiny_patch16_224", sd, variables)
    assert not report.missing, report.missing
    assert not report.unused, report.unused
    # layout spot-checks: qkv kernel transposed, patch conv OIHW->HWIO
    qkv = converted["params"]["blocks_0"]["attn"]["qkv"]["kernel"]
    np.testing.assert_allclose(np.asarray(qkv),
                               sd["blocks.0.attn.qkv.weight"].numpy().T)
    pe = converted["params"]["patch_embed"]["proj"]["kernel"]
    np.testing.assert_allclose(
        np.asarray(pe), sd["patch_embed.proj.weight"].numpy().transpose(2, 3, 1, 0))


def test_vit_tiny_forward_matches_torch():
    """Full ViT-tiny forward equivalence: converted weights must reproduce the
    torch functional network (patch embed -> cls+pos -> 12 blocks -> norm ->
    cls embedding)."""
    gen = np.random.default_rng(2)
    dim, heads, depth = 192, 3, 12
    sd = _make_vit_tiny_state_dict(gen, depth=depth, dim=dim, heads=heads)

    model = BACKBONES.get("vit_tiny_patch16_224")()
    x_np = gen.normal(0, 1, (1, 3, 224, 224)).astype(np.float32)
    xin = jnp.asarray(x_np.transpose(0, 2, 3, 1))
    variables = model.init(jax.random.PRNGKey(0), xin, False)
    converted, report = convert_state_dict("vit_tiny_patch16_224", sd, variables)
    assert not report.missing and not report.unused

    def torch_forward(x):
        t = F.conv2d(x, sd["patch_embed.proj.weight"],
                     sd["patch_embed.proj.bias"], stride=16)
        t = t.flatten(2).transpose(1, 2)  # (1, 196, dim)
        cls = sd["cls_token"].expand(1, -1, -1)
        t = torch.cat([cls, t], dim=1) + sd["pos_embed"]
        L = t.shape[1]
        for i in range(depth):
            p = f"blocks.{i}"
            def ln(y, n):
                return F.layer_norm(y, (dim,), sd[f"{p}.{n}.weight"],
                                    sd[f"{p}.{n}.bias"], eps=1e-6)
            h = ln(t, "norm1")
            qkv = F.linear(h, sd[f"{p}.attn.qkv.weight"], sd[f"{p}.attn.qkv.bias"])
            q, k, v = qkv.reshape(1, L, 3, heads, dim // heads) \
                .permute(2, 0, 3, 1, 4).unbind(0)
            a = F.scaled_dot_product_attention(q, k, v)
            a = a.transpose(1, 2).reshape(1, L, dim)
            t = t + F.linear(a, sd[f"{p}.attn.proj.weight"],
                             sd[f"{p}.attn.proj.bias"])
            h = ln(t, "norm2")
            h = F.gelu(F.linear(h, sd[f"{p}.mlp.fc1.weight"],
                                sd[f"{p}.mlp.fc1.bias"]))
            t = t + F.linear(h, sd[f"{p}.mlp.fc2.weight"], sd[f"{p}.mlp.fc2.bias"])
        t = F.layer_norm(t, (dim,), sd["norm.weight"], sd["norm.bias"], eps=1e-6)
        return t[:, 0]

    with torch.no_grad():
        theirs = torch_forward(torch.from_numpy(x_np)).numpy()
    ours = np.asarray(model.apply(converted, xin, False))
    np.testing.assert_allclose(ours, theirs, rtol=5e-3, atol=5e-4)


# --------------------------------------------------------------------------
# structural coverage across families


@pytest.mark.parametrize("name,hw", [
    ("resnet50", 64),
    ("seresnet50", 64),
    ("resnet50d", 64),       # deep stem + avgpool downsample
    ("efficientnet_b0", 64),
    ("mobilenetv3_large_100", 64),
    ("hrnet_w18", 64),
    ("swinv2_tiny_window8_256", 256),
    ("vit_tiny_patch16_224", 224),
])
def test_every_flax_leaf_has_a_torch_key(name, hw):
    """Mapper must produce a syntactically valid candidate for every leaf;
    converting a state_dict built FROM those candidates fills the tree."""
    from jax.tree_util import tree_flatten_with_path

    model = BACKBONES.get(name)()
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, hw, hw, 3)), False))
    mapper = mapper_for(name)
    flat, _ = tree_flatten_with_path(variables)

    gen = np.random.default_rng(0)
    sd = {}
    real_vars = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), variables)
    for path, leaf in flat:
        tokens = [str(getattr(q, "key", getattr(q, "idx", q))) for q in path]
        if tokens[0] not in ("params", "batch_stats"):
            continue
        candidates = mapper(tokens[1:])
        assert candidates, f"no candidates for {tokens}"
        # synthesize the torch tensor in torch layout for the first candidate
        shape = leaf.shape
        if tokens[-1] == "kernel" and len(shape) == 4:
            tshape = (shape[3], shape[2], shape[0], shape[1])
        elif tokens[-1] == "kernel" and len(shape) == 2:
            tshape = (shape[1], shape[0])
        elif tokens[-1] == "kernel" and len(shape) == 3:
            tshape = (shape[2], shape[1], shape[0])
        else:
            tshape = shape
        sd[candidates[0]] = torch.from_numpy(
            gen.normal(0, 1, tshape).astype(np.float32))
    converted, report = convert_state_dict(name, sd, real_vars)
    assert not report.missing, f"{name}: {report.missing[:10]}"


def test_fit_tensor_layouts():
    t = np.arange(24, dtype=np.float32).reshape(4, 3, 1, 2)  # OIHW
    out = fit_tensor(t, (1, 2, 3, 4), "conv", is_kernel=True)
    assert out.shape == (1, 2, 3, 4)
    assert out[0, 1, 2, 3] == t[3, 2, 0, 1]
    lin = np.arange(6, dtype=np.float32).reshape(2, 3)
    np.testing.assert_array_equal(fit_tensor(lin, (3, 2), "lin", is_kernel=True), lin.T)
    # square dense kernels still transpose (shape equality is not identity)
    sq = np.arange(9, dtype=np.float32).reshape(3, 3)
    np.testing.assert_array_equal(fit_tensor(sq, (3, 3), "sq", is_kernel=True), sq.T)
    one = np.arange(12, dtype=np.float32).reshape(4, 3, 1, 1)
    np.testing.assert_array_equal(
        fit_tensor(one, (3, 4), "pw", is_kernel=True), one[:, :, 0, 0].T)
    # non-kernel leaves pass through untouched
    bias = np.arange(4, dtype=np.float32)
    np.testing.assert_array_equal(fit_tensor(bias, (4,), "b"), bias)
    with pytest.raises(ValueError):
        fit_tensor(np.zeros((2, 3)), (4, 5), "bad")


def test_pretrained_cache_roundtrip(tmp_path, monkeypatch):
    """convert -> msgpack -> load_pretrained_variables restores both params
    and batch_stats."""
    monkeypatch.setenv("TORCHOK_TPU_WEIGHTS", str(tmp_path))
    from flax import serialization
    from torchok_tpu.utils.pretrained import load_pretrained_variables

    gen = np.random.default_rng(3)
    sd = _make_resnet18_state_dict(gen)
    model = BACKBONES.get("resnet18")()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), False)
    converted, _ = convert_state_dict("resnet18", sd, variables)
    with open(tmp_path / "resnet18.msgpack", "wb") as f:
        f.write(serialization.to_bytes(converted))

    fresh = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 3)), False)
    restored = load_pretrained_variables("resnet18", dict(fresh))
    np.testing.assert_allclose(
        np.asarray(restored["params"]["conv1"]["kernel"]),
        sd["conv1.weight"].numpy().transpose(2, 3, 1, 0))
    np.testing.assert_allclose(
        np.asarray(restored["batch_stats"]["bn1"]["mean"]),
        sd["bn1.running_mean"].numpy())


def test_pretrained_drop_key_substrings(tmp_path, monkeypatch):
    """load_relative_position_bias_table=False (reference gcvit.py:169-174):
    matching leaves keep their fresh init while everything else restores."""
    monkeypatch.setenv("TORCHOK_TPU_WEIGHTS", str(tmp_path))
    from flax import serialization
    from torchok_tpu.utils.pretrained import load_pretrained_variables

    cached = {"params": {
        "block": {"relative_position_bias_table": np.ones((5, 2), np.float32),
                  "kernel": np.full((3, 3), 7.0, np.float32)}}}
    with open(tmp_path / "fake.msgpack", "wb") as f:
        f.write(serialization.to_bytes(cached))

    fresh = {"params": {
        "block": {"relative_position_bias_table": np.zeros((5, 2), np.float32),
                  "kernel": np.zeros((3, 3), np.float32)}}}
    restored = load_pretrained_variables(
        "fake", fresh, drop_key_substrings=("relative_position_bias_table",))
    np.testing.assert_array_equal(
        restored["params"]["block"]["relative_position_bias_table"],
        np.zeros((5, 2)))  # kept init
    np.testing.assert_array_equal(
        restored["params"]["block"]["kernel"], np.full((3, 3), 7.0))


def test_gcvit_accepts_reference_detection_surface():
    """The reference's detection recipes pass img_size as an (h, w) pair and
    load_relative_position_bias_table; construction + eval_shape must work."""
    model = BACKBONES.get("gcvit_tiny")(
        img_size=[256, 256], load_relative_position_bias_table=False)
    out = jax.eval_shape(
        lambda v, x: model.apply(v, x, train=False),
        jax.eval_shape(lambda k, x: model.init(k, x, False),
                       jax.random.PRNGKey(0),
                       jnp.zeros((1, 256, 256, 3))),
        jax.ShapeDtypeStruct((1, 256, 256, 3), jnp.float32))
    assert out.shape == (1, 8, 8, 512)
