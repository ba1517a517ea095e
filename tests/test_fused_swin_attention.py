"""Fully fused Pallas window attention (forward + backward kernels) vs the
XLA formulation, in interpret mode on CPU; plus shard_map composition on the
simulated multi-device mesh and full-SwinBlock path equivalence."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchok_tpu.models.backbones.swin import (_shift_window_region_ids,
                                               window_partition,
                                               window_reverse)
from torchok_tpu.ops.swin_attention import (fused_attention_enabled,
                                            fused_swin_attention)
from torchok_tpu.ops.window_attention import _window_attention_xla

B, HP, WP, WS, H, D = 2, 8, 12, 4, 3, 8
C = H * D
L = WS * WS
NW = (HP // WS) * (WP // WS)


def _ref(qkv, scale, bias, mask):
    """window_partition + XLA attention + window_reverse."""
    win = window_partition(qkv, WS)
    q = win[..., :C].reshape(-1, L, H, D)
    k = win[..., C:2 * C].reshape(-1, L, H, D)
    v = win[..., 2 * C:].reshape(-1, L, H, D)
    out = _window_attention_xla(q, k, v, scale, bias, mask, layout="blhd")
    return window_reverse(out.reshape(-1, L, C), WS, HP, WP)


@pytest.fixture
def data():
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.normal(size=(B, HP, WP, 3 * C)), jnp.float32)
    scale = jnp.asarray(rng.normal(size=(H,)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(H, L, L)), jnp.float32)
    ids = jnp.asarray(_shift_window_region_ids(HP, WP, WS, WS // 2))
    mask = jnp.where(ids[:, :, None] != ids[:, None, :], -100.0, 0.0)
    return qkv, scale, bias, mask


@pytest.mark.parametrize("masked", [False, True])
def test_forward_matches_xla(data, masked):
    qkv, scale, bias, mask = data
    m = mask if masked else None
    ref = _ref(qkv, scale, bias, m)
    got = fused_swin_attention(qkv, scale, bias, m, ws=WS, nheads=H,
                               interpret=True)
    assert got.shape == (B, HP, WP, C)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("masked", [False, True])
def test_backward_matches_xla(data, masked):
    """The fused backward kernel's dqkv/dscale/dbias vs autodiff through the
    XLA formulation."""
    qkv, scale, bias, mask = data
    m = mask if masked else None

    def loss_ref(qkv_, s_, b_):
        return jnp.sum(_ref(qkv_, s_, b_, m) ** 2)

    def loss_fused(qkv_, s_, b_):
        return jnp.sum(fused_swin_attention(qkv_, s_, b_, m, ws=WS, nheads=H,
                                            interpret=True) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(qkv, scale, bias)
    g_got = jax.grad(loss_fused, argnums=(0, 1, 2))(qkv, scale, bias)
    for a, b_, name in zip(g_got, g_ref, ("dqkv", "dscale", "dbias")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=5e-4, atol=5e-4,
            err_msg=f"gradient mismatch for {name}")


@pytest.mark.parametrize("masked", [False, True])
def test_packed_geometry_matches_xla(masked):
    """Even window count per row triggers two-window packing (block-diagonal
    -1e9 bias between windows): forward AND gradients must still match the
    unpacked XLA reference exactly."""
    hp, wp, ws, h, d = 4, 16, 4, 2, 8
    c = h * d
    L = ws * ws
    rng = np.random.default_rng(7)
    qkv = jnp.asarray(rng.normal(size=(2, hp, wp, 3 * c)), jnp.float32)
    scale = jnp.asarray(rng.normal(size=(h,)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(h, L, L)), jnp.float32)
    m = None
    if masked:
        ids = jnp.asarray(_shift_window_region_ids(hp, wp, ws, ws // 2))
        m = jnp.where(ids[:, :, None] != ids[:, None, :], -100.0, 0.0)

    def ref_fn(qkv_, s_, b_):
        win = window_partition(qkv_, ws)
        q = win[..., :c].reshape(-1, L, h, d)
        k = win[..., c:2 * c].reshape(-1, L, h, d)
        v = win[..., 2 * c:].reshape(-1, L, h, d)
        out = _window_attention_xla(q, k, v, s_, b_, m, layout="blhd")
        return window_reverse(out.reshape(-1, L, c), ws, hp, wp)

    def fused_fn(qkv_, s_, b_):
        return fused_swin_attention(qkv_, s_, b_, m, ws=ws, nheads=h,
                                    interpret=True)

    np.testing.assert_allclose(
        np.asarray(fused_fn(qkv, scale, bias)),
        np.asarray(ref_fn(qkv, scale, bias)), rtol=2e-4, atol=2e-4)
    g_ref = jax.grad(lambda *a: jnp.sum(ref_fn(*a) ** 2),
                     argnums=(0, 1, 2))(qkv, scale, bias)
    g_got = jax.grad(lambda *a: jnp.sum(fused_fn(*a) ** 2),
                     argnums=(0, 1, 2))(qkv, scale, bias)
    for a, b_, name in zip(g_got, g_ref, ("dqkv", "dscale", "dbias")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=5e-4, atol=5e-4,
                                   err_msg=f"packed gradient mismatch {name}")


def test_bf16_forward_close_to_f32(data):
    qkv, scale, bias, mask = data
    ref = _ref(qkv, scale, bias, mask)
    got = fused_swin_attention(qkv.astype(jnp.bfloat16), scale, bias, mask,
                               ws=WS, nheads=H, interpret=True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32), np.asarray(ref),
                               rtol=5e-2, atol=5e-2)


def test_shard_map_composition_and_grads(data, multi_devices):
    """With a live mesh the op must shard_map over the data axis and psum
    dbias/dscale — outputs and gradients must match the meshless run."""
    from torchok_tpu.parallel import build_mesh, set_current_mesh
    qkv, scale, bias, mask = data

    def loss(qkv_, s_, b_):
        return jnp.sum(fused_swin_attention(qkv_, s_, b_, mask, ws=WS,
                                            nheads=H, interpret=True) ** 2)

    base = fused_swin_attention(qkv, scale, bias, mask, ws=WS, nheads=H,
                                interpret=True)
    g_base = jax.grad(loss, argnums=(0, 1, 2))(qkv, scale, bias)
    mesh = build_mesh(jax.devices()[:2])
    set_current_mesh(mesh)
    try:
        got = fused_swin_attention(qkv, scale, bias, mask, ws=WS, nheads=H,
                                   interpret=True)
        g_got = jax.grad(loss, argnums=(0, 1, 2))(qkv, scale, bias)
    finally:
        set_current_mesh(None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(base),
                               rtol=2e-4, atol=2e-4)
    for a, b_ in zip(g_got, g_base):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=5e-4, atol=5e-4)


def test_swinblock_fused_path_matches_xla_path(monkeypatch):
    """Full SwinBlock (roll + fused attention + residuals) forced onto the
    Pallas path must reproduce the XLA-path output bit-for-tolerance."""
    from torchok_tpu.models.backbones.swin import SwinBlock
    rng = np.random.default_rng(1)
    b, hgt, wdt, cdim = 2, 8, 8, 24
    x = jnp.asarray(rng.normal(size=(b, hgt * wdt, cdim)), jnp.float32)
    blk = SwinBlock(dim=cdim, num_heads=3, window_size=4, shift_size=2)
    monkeypatch.setenv("TORCHOK_WINDOW_ATTN_PALLAS", "0")
    v = blk.init(jax.random.PRNGKey(0), x, (hgt, wdt))
    ref = blk.apply(v, x, (hgt, wdt))
    monkeypatch.setenv("TORCHOK_WINDOW_ATTN_PALLAS", "1")
    got = blk.apply(v, x, (hgt, wdt))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_grad_checkpointing_composes_with_fused_path(monkeypatch):
    """nn.remat around SwinBlock must compose with the custom_vjp Pallas op
    (forward recomputed, fused backward kernel invoked once)."""
    from torchok_tpu.models.backbones.swin import SwinTransformerV2
    monkeypatch.setenv("TORCHOK_WINDOW_ATTN_PALLAS", "1")
    model = SwinTransformerV2(img_size=16, patch_size=4, window_size=2,
                              embed_dim=8, depths=(2,), num_heads=(2,),
                              drop_path_rate=0.0, grad_checkpointing=True)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 3)), jnp.float32)
    v = model.init(jax.random.PRNGKey(0), x, False)

    def loss(params):
        return jnp.sum(model.apply({"params": params}, x, False) ** 2)

    g = jax.grad(loss)(v["params"])
    total = sum(float(jnp.abs(t).sum()) for t in jax.tree_util.tree_leaves(g))
    assert np.isfinite(total) and total > 0
    # gradients must match the XLA path's
    monkeypatch.setenv("TORCHOK_WINDOW_ATTN_PALLAS", "0")
    g_ref = jax.grad(loss)(v["params"])
    for a, b in zip(jax.tree_util.tree_leaves(g),
                    jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)


def test_polymorphic_batch_export_falls_back_to_xla(monkeypatch):
    """jax.export with a symbolic batch dim cannot stage a Pallas grid; the
    spatial path must fall back to the XLA formulation so StableHLO export
    of SwinV2 keeps working with the fused kernel enabled."""
    from torchok_tpu.models.backbones.swin import SwinTransformerV2
    monkeypatch.setenv("TORCHOK_WINDOW_ATTN_PALLAS", "1")
    model = SwinTransformerV2(img_size=16, patch_size=4, window_size=2,
                              embed_dim=8, depths=(2,), num_heads=(2,),
                              drop_path_rate=0.0)
    x = jnp.zeros((2, 16, 16, 3), jnp.float32)
    v = model.init(jax.random.PRNGKey(0), x, False)

    b = jax.export.symbolic_shape("b")
    spec = jax.ShapeDtypeStruct((b[0], 16, 16, 3), jnp.float32)
    vspec = jax.tree_util.tree_map(
        lambda t: jax.ShapeDtypeStruct(jnp.shape(t), t.dtype), v)
    exported = jax.export.export(
        jax.jit(lambda vv, xx: model.apply(vv, xx, False)))(vspec, spec)
    out = exported.call(v, jnp.zeros((3, 16, 16, 3), jnp.float32))
    assert out.shape[0] == 3


def test_enabled_gate_respects_vmem_budget(monkeypatch):
    monkeypatch.setenv("TORCHOK_WINDOW_ATTN_PALLAS", "1")
    assert fused_attention_enabled(8, 64, 3, 96)
    monkeypatch.setenv("TORCHOK_WINDOW_ATTN_PALLAS", "0")
    assert not fused_attention_enabled(8, 64, 3, 96)
    monkeypatch.setenv("TORCHOK_WINDOW_ATTN_PALLAS", "1")
    # swinv2_large window-24 L=576 at stage 4 blows the VMEM budget
    assert not fused_attention_enabled(24, 24, 48, 1536)
