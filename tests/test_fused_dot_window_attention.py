"""Fused PLAIN (dot-product) window attention — the cosine=False mode of
ops/swin_attention.py that powers DaViT spatial blocks and GCViT local
window blocks (reference: torchok/models/backbones/davit.py:168-208,
torchok/models/backbones/gcvit.py:46-242 via timm).

Interpret-mode Pallas vs a plain-XLA windowed formulation: forward and
gradients (qkv and the learned additive bias), both the two-window packed
shape (ngx even, L < 128) and the unpacked shape (ngx odd).
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchok_tpu.ops.swin_attention import (fused_window_attention,
                                            fused_window_attention_global)
from torchok_tpu.models.backbones.swin import window_partition, window_reverse


def _xla_reference(qkv, scale, bias, ws, nheads):
    b, hp, wp, c3 = qkv.shape
    c = c3 // 3
    d = c // nheads
    l = ws * ws
    win = window_partition(qkv, ws)
    q = win[..., :c].reshape(-1, l, nheads, d)
    k = win[..., c:2 * c].reshape(-1, l, nheads, d)
    v = win[..., 2 * c:].reshape(-1, l, nheads, d)
    attn = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                      preferred_element_type=jnp.float32)
    attn = attn * scale[None, :, None, None]
    if bias is not None:
        attn = attn + bias[None].astype(attn.dtype)
    attn = jax.nn.softmax(attn, axis=-1).astype(qkv.dtype)
    ow = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(-1, l, c)
    return window_reverse(ow, ws, hp, wp)


CASES = [
    # (hp, wp, ws, nheads, c, with_bias)  — ngx=4 packs two windows; ngx=3
    # exercises the unpacked path; ws=7/L=49 is the DaViT/GCViT shape
    (8, 16, 4, 2, 16, False),
    (8, 16, 4, 2, 16, True),
    (12, 12, 4, 2, 16, True),
    (14, 14, 7, 3, 24, True),
]


def _to_windowed(qkv, ws):
    b = qkv.shape[0]
    l = ws * ws
    win = window_partition(qkv, ws)
    return win.reshape(b, win.shape[0] // b, l, win.shape[-1])


@pytest.mark.parametrize("hp,wp,ws,nheads,c,with_bias", CASES)
def test_windowed_layout_matches_xla(hp, wp, ws, nheads, c, with_bias):
    """The windowed-input kernel mode (caller partitions in XLA — the path
    for sublane-misaligned ws like DaViT's 7) matches the reference."""
    rng = np.random.default_rng(3)
    qkv = jnp.asarray(rng.normal(size=(2, hp, wp, 3 * c)), jnp.float32)
    scale = jnp.full((nheads,), (c // nheads) ** -0.5, jnp.float32)
    l = ws * ws
    bias = (jnp.asarray(rng.normal(size=(nheads, l, l)), jnp.float32)
            if with_bias else None)
    win = _to_windowed(qkv, ws)
    got_w = fused_window_attention(win, scale, bias, ws=ws, nheads=nheads,
                                   interpret=True, layout="windowed")
    got = window_reverse(got_w.reshape(-1, l, c), ws, hp, wp)
    want = _xla_reference(qkv, scale, bias, ws, nheads)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_windowed_layout_grads_match_xla():
    hp, wp, ws, nheads, c = 14, 14, 7, 3, 24
    rng = np.random.default_rng(4)
    qkv = jnp.asarray(rng.normal(size=(2, hp, wp, 3 * c)), jnp.float32)
    scale = jnp.full((nheads,), (c // nheads) ** -0.5, jnp.float32)
    l = ws * ws
    bias = jnp.asarray(rng.normal(size=(nheads, l, l)), jnp.float32)
    tgt = jnp.asarray(rng.normal(size=(2, hp, wp, c)), jnp.float32)

    def loss_fused(qkv_, bias_):
        win = _to_windowed(qkv_, ws)
        ow = fused_window_attention(win, scale, bias_, ws=ws, nheads=nheads,
                                    interpret=True, layout="windowed")
        out = window_reverse(ow.reshape(-1, l, c), ws, hp, wp)
        return jnp.sum((out - tgt) ** 2)

    def loss_xla(qkv_, bias_):
        return jnp.sum((_xla_reference(qkv_, scale, bias_, ws, nheads)
                        - tgt) ** 2)

    gq_f, gb_f = jax.grad(loss_fused, argnums=(0, 1))(qkv, bias)
    gq_x, gb_x = jax.grad(loss_xla, argnums=(0, 1))(qkv, bias)
    np.testing.assert_allclose(np.asarray(gq_f), np.asarray(gq_x),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gb_f), np.asarray(gb_x),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("hp,wp,ws,nheads,c,with_bias", CASES)
def test_forward_matches_xla(hp, wp, ws, nheads, c, with_bias):
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.normal(size=(2, hp, wp, 3 * c)), jnp.float32)
    scale = jnp.full((nheads,), (c // nheads) ** -0.5, jnp.float32)
    l = ws * ws
    bias = (jnp.asarray(rng.normal(size=(nheads, l, l)), jnp.float32)
            if with_bias else None)
    got = fused_window_attention(qkv, scale, bias, ws=ws, nheads=nheads,
                                 interpret=True)
    want = _xla_reference(qkv, scale, bias, ws, nheads)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("hp,wp,ws,nheads,c,with_bias", CASES[1:3])
def test_grads_match_xla(hp, wp, ws, nheads, c, with_bias):
    rng = np.random.default_rng(1)
    qkv = jnp.asarray(rng.normal(size=(2, hp, wp, 3 * c)), jnp.float32)
    scale = jnp.full((nheads,), (c // nheads) ** -0.5, jnp.float32)
    l = ws * ws
    bias = jnp.asarray(rng.normal(size=(nheads, l, l)), jnp.float32)
    tgt = jnp.asarray(rng.normal(size=(2, hp, wp, c)), jnp.float32)

    def loss_fused(qkv_, bias_):
        out = fused_window_attention(qkv_, scale, bias_, ws=ws,
                                     nheads=nheads, interpret=True)
        return jnp.sum((out - tgt) ** 2)

    def loss_xla(qkv_, bias_):
        return jnp.sum((_xla_reference(qkv_, scale, bias_, ws, nheads)
                        - tgt) ** 2)

    gq_f, gb_f = jax.grad(loss_fused, argnums=(0, 1))(qkv, bias)
    gq_x, gb_x = jax.grad(loss_xla, argnums=(0, 1))(qkv, bias)
    np.testing.assert_allclose(np.asarray(gq_f), np.asarray(gq_x),
                               rtol=1e-4, atol=1e-4)
    # the learned rel-pos bias gradient rides the kernel's revisited
    # dbias accumulator — the GCViT training path
    np.testing.assert_allclose(np.asarray(gb_f), np.asarray(gb_x),
                               rtol=1e-4, atol=1e-4)


def _xla_reference_global(kv, qg, scale, bias, ws, nheads):
    """q_global repeated per window — the GCViT WindowAttentionGlobal math."""
    b, nw, l, c2 = kv.shape
    c = c2 // 2
    d = c // nheads
    k = kv[..., :c].reshape(-1, l, nheads, d)
    v = kv[..., c:].reshape(-1, l, nheads, d)
    q = jnp.repeat(qg, nw, axis=0).reshape(-1, l, nheads, d)
    attn = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                      preferred_element_type=jnp.float32)
    attn = attn * scale[None, :, None, None] + bias[None].astype(attn.dtype)
    attn = jax.nn.softmax(attn, axis=-1).astype(kv.dtype)
    ow = jnp.einsum("bhqk,bkhd->bqhd", attn, v)
    return ow.reshape(b, nw, l, c)


@pytest.mark.parametrize("nw,ws,nheads,c", [(8, 7, 3, 24), (6, 4, 2, 16)])
def test_global_q_matches_xla(nw, ws, nheads, c):
    """Fused global-query mode (GCViT use_global blocks): q shared across
    an image's windows, broadcast inside the kernel."""
    rng = np.random.default_rng(5)
    l = ws * ws
    kv = jnp.asarray(rng.normal(size=(2, nw, l, 2 * c)), jnp.float32)
    qg = jnp.asarray(rng.normal(size=(2, l, c)), jnp.float32)
    scale = jnp.full((nheads,), (c // nheads) ** -0.5, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(nheads, l, l)), jnp.float32)
    got = fused_window_attention_global(kv, qg, scale, bias, ws=ws,
                                        nheads=nheads, interpret=True)
    want = _xla_reference_global(kv, qg, scale, bias, ws, nheads)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_global_q_grads_match_xla():
    """dkv per window, dqg summed over the image's windows (the kernel's
    revisited per-image accumulator), dbias over the whole grid."""
    nw, ws, nheads, c = 8, 7, 3, 24
    rng = np.random.default_rng(6)
    l = ws * ws
    kv = jnp.asarray(rng.normal(size=(2, nw, l, 2 * c)), jnp.float32)
    qg = jnp.asarray(rng.normal(size=(2, l, c)), jnp.float32)
    scale = jnp.full((nheads,), (c // nheads) ** -0.5, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(nheads, l, l)), jnp.float32)
    tgt = jnp.asarray(rng.normal(size=(2, nw, l, c)), jnp.float32)

    def loss_fused(kv_, qg_, bias_):
        out = fused_window_attention_global(kv_, qg_, scale, bias_, ws=ws,
                                            nheads=nheads, interpret=True)
        return jnp.sum((out - tgt) ** 2)

    def loss_xla(kv_, qg_, bias_):
        return jnp.sum((_xla_reference_global(kv_, qg_, scale, bias_, ws,
                                              nheads) - tgt) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(kv, qg, bias)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(kv, qg, bias)
    for f, x, name in zip(gf, gx, ("dkv", "dqg", "dbias")):
        np.testing.assert_allclose(np.asarray(f), np.asarray(x),
                                   rtol=1e-4, atol=1e-4, err_msg=name)


def test_windowed_mode_shard_map_composition(multi_devices):
    """Under a live 2-device mesh the windowed dot-product op shard_maps
    over the batch and psums dbias — values and grads match meshless."""
    from torchok_tpu.parallel import build_mesh, set_current_mesh

    nw, ws, nheads, c = 4, 7, 3, 24
    rng = np.random.default_rng(8)
    l = ws * ws
    qkv = jnp.asarray(rng.normal(size=(2, nw, l, 3 * c)), jnp.float32)
    scale = jnp.full((nheads,), (c // nheads) ** -0.5, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(nheads, l, l)), jnp.float32)

    def loss(qkv_, bias_):
        out = fused_window_attention(qkv_, scale, bias_, ws=ws,
                                     nheads=nheads, interpret=True,
                                     layout="windowed")
        return jnp.sum(out ** 2)

    base = fused_window_attention(qkv, scale, bias, ws=ws, nheads=nheads,
                                  interpret=True, layout="windowed")
    g_base = jax.grad(loss, argnums=(0, 1))(qkv, bias)
    set_current_mesh(build_mesh(jax.devices()[:2]))
    try:
        got = fused_window_attention(qkv, scale, bias, ws=ws, nheads=nheads,
                                     interpret=True, layout="windowed")
        g_got = jax.grad(loss, argnums=(0, 1))(qkv, bias)
    finally:
        set_current_mesh(None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(base),
                               rtol=2e-4, atol=2e-4)
    for a, b in zip(g_got, g_base):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)


def test_global_q_shard_map_composition(multi_devices):
    """Global-q mode under a live mesh: kv/qg/dout batch-sharded, dbias
    psummed, dqg stays per-image sharded."""
    from torchok_tpu.parallel import build_mesh, set_current_mesh

    nw, ws, nheads, c = 4, 4, 2, 16
    rng = np.random.default_rng(9)
    l = ws * ws
    kv = jnp.asarray(rng.normal(size=(2, nw, l, 2 * c)), jnp.float32)
    qg = jnp.asarray(rng.normal(size=(2, l, c)), jnp.float32)
    scale = jnp.full((nheads,), (c // nheads) ** -0.5, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(nheads, l, l)), jnp.float32)

    def loss(kv_, qg_, bias_):
        out = fused_window_attention_global(kv_, qg_, scale, bias_, ws=ws,
                                            nheads=nheads, interpret=True)
        return jnp.sum(out ** 2)

    base = fused_window_attention_global(kv, qg, scale, bias, ws=ws,
                                         nheads=nheads, interpret=True)
    g_base = jax.grad(loss, argnums=(0, 1, 2))(kv, qg, bias)
    set_current_mesh(build_mesh(jax.devices()[:2]))
    try:
        got = fused_window_attention_global(kv, qg, scale, bias, ws=ws,
                                            nheads=nheads, interpret=True)
        g_got = jax.grad(loss, argnums=(0, 1, 2))(kv, qg, bias)
    finally:
        set_current_mesh(None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(base),
                               rtol=2e-4, atol=2e-4)
    for a, b in zip(g_got, g_base):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)


def test_spatial_dispatch_falls_back_when_batch_does_not_divide(multi_devices):
    """window_attention_spatial under a 2-device mesh with batch 3: the
    fused path cannot shard — the XLA windowed formulation must run and
    match the meshless result."""
    from torchok_tpu.ops.swin_attention import window_attention_spatial
    from torchok_tpu.parallel import build_mesh, set_current_mesh

    rng = np.random.default_rng(15)
    hp = wp = 8
    ws, nheads, c = 4, 2, 16
    qkv = jnp.asarray(rng.normal(size=(3, hp, wp, 3 * c)), jnp.float32)
    scale = jnp.full((nheads,), (c // nheads) ** -0.5, jnp.float32)
    base = window_attention_spatial(qkv, scale, None, ws=ws, nheads=nheads,
                                    interpret=True)
    set_current_mesh(build_mesh(jax.devices()[:2]))
    try:
        got = window_attention_spatial(qkv, scale, None, ws=ws,
                                       nheads=nheads, interpret=True)
    finally:
        set_current_mesh(None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(base),
                               rtol=1e-5, atol=1e-5)


def test_davit_gcvit_fused_forward_matches_xla_path():
    """Whole-backbone check: forcing the fused kernels (interpret on CPU)
    reproduces the windowed XLA formulation with the same params. GCViT
    exercises both the plain windowed mode (local blocks) and the
    global-query mode (use_global blocks). Params are random leaves built
    from eval_shape — a real eager init costs ~60s/model on CPU and the
    init distribution is irrelevant for path parity."""
    from torchok_tpu.constructor import BACKBONES

    for name, hw, tol in (("davit_t", 56, 2e-5), ("gcvit_xxtiny", 56, 2e-5)):
        x = jnp.asarray(
            np.random.default_rng(2).normal(size=(2, hw, hw, 3)), jnp.float32)
        model = BACKBONES.get(name)(pretrained=False)
        shapes = jax.eval_shape(
            lambda xx: model.init(jax.random.PRNGKey(0), xx, train=False), x)
        leaf_rng = np.random.default_rng(7)
        variables = jax.tree_util.tree_map(
            lambda s: jnp.asarray(
                leaf_rng.normal(scale=0.05, size=s.shape), s.dtype),
            shapes)
        outs = {}
        for force in (False, True):
            os.environ["TORCHOK_WINDOW_ATTN_PALLAS"] = "1" if force else "0"
            try:
                outs[force] = model.apply(variables, x, train=False)
            finally:
                os.environ.pop("TORCHOK_WINDOW_ATTN_PALLAS", None)
        np.testing.assert_allclose(np.asarray(outs[True]),
                                   np.asarray(outs[False]),
                                   rtol=tol, atol=tol)
