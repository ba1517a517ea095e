"""window_attention op equivalences: layouts, compact vs tiled masks, and
the opt-in Pallas kernel (interpret mode) vs the XLA formulation."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchok_tpu.ops.window_attention import (_window_attention_pallas_mw,
                                              _window_attention_xla,
                                              window_attention)

B, NW, H, L, D = 2, 4, 3, 16, 8


@pytest.fixture
def data():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B * NW, H, L, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B * NW, H, L, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B * NW, H, L, D)), jnp.float32)
    scale = jnp.asarray(rng.normal(size=(H,)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(H, L, L)), jnp.float32)
    ids = rng.integers(0, 3, size=(NW, L))
    mask = jnp.where(jnp.asarray(ids)[:, :, None] != jnp.asarray(ids)[:, None, :],
                     -100.0, 0.0)
    return q, k, v, scale, bias, mask


def test_blhd_layout_matches_bhld(data):
    q, k, v, scale, bias, mask = data
    ref = _window_attention_xla(q, k, v, scale, bias, None)
    got = _window_attention_xla(q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                                v.transpose(0, 2, 1, 3), scale, bias, None,
                                layout="blhd")
    np.testing.assert_allclose(np.asarray(got.transpose(0, 2, 1, 3)),
                               np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_compact_mask_matches_tiled(data):
    q, k, v, scale, bias, mask = data
    tiled = jnp.tile(mask, (B, 1, 1))
    ref = _window_attention_xla(q, k, v, scale, bias, tiled)
    got = _window_attention_xla(q, k, v, scale, bias, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_masked_windows_attend_only_within_region(data):
    q, k, v, scale, bias, mask = data
    out_masked = _window_attention_xla(q, k, v, scale, jnp.zeros_like(bias),
                                       jnp.tile(mask, (B, 1, 1)))
    # query position p in window w must be unaffected by values at positions
    # whose region differs: perturb a cross-region value, output unchanged
    w = 0
    m = np.asarray(mask[w])
    qpos = 0
    cross = np.where(m[qpos] < 0)[0]
    if len(cross):
        v2 = v.at[w, :, cross[0], :].add(100.0)
        out2 = _window_attention_xla(q, k, v2, scale, jnp.zeros_like(bias),
                                     jnp.tile(mask, (B, 1, 1)))
        np.testing.assert_allclose(np.asarray(out2[w, :, qpos]),
                                   np.asarray(out_masked[w, :, qpos]),
                                   rtol=1e-4, atol=1e-4)


def test_pallas_interpret_matches_xla(data):
    """Multi-window kernel (compact mask indexed per window) vs XLA."""
    q, k, v, scale, bias, mask = data
    ref = _window_attention_xla(q, k, v, scale, bias, mask)
    got = _window_attention_pallas_mw(q, k, v, scale, bias, mask,
                                      interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_pallas_interpret_no_mask_and_grouping(data):
    q, k, v, scale, bias, mask = data
    zeros = jnp.zeros((1, L, L), jnp.float32)
    ref = _window_attention_xla(q, k, v, scale, bias, None)
    for g in (1, 2, 8):
        got = _window_attention_pallas_mw(q, k, v, scale, bias, zeros,
                                          windows_per_block=g, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)


def test_hybrid_backward_matches_xla_grads(data):
    """custom_vjp: pallas forward (interpret) + XLA recompute backward must
    produce the XLA formulation's gradients."""
    import functools
    import torchok_tpu.ops.window_attention as wa
    q, k, v, scale, bias, mask = data

    def loss_ref(q_, k_, v_, s_, b_):
        return jnp.sum(_window_attention_xla(q_, k_, v_, s_, b_, mask) ** 2)

    def loss_hyb(q_, k_, v_, s_, b_):
        return jnp.sum(wa._window_attention_hybrid(q_, k_, v_, s_, b_, mask) ** 2)

    orig = wa.pl.pallas_call
    wa.pl.pallas_call = functools.partial(orig, interpret=True)
    try:
        g_h = jax.grad(loss_hyb, argnums=(0, 1, 2, 3, 4))(q, k, v, scale, bias)
    finally:
        wa.pl.pallas_call = orig
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(q, k, v, scale, bias)
    for a, b_ in zip(g_h, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=5e-4, atol=5e-4)


def test_dispatch_accepts_compact_mask_blhd(data):
    q, k, v, scale, bias, mask = data
    out = window_attention(q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                           v.transpose(0, 2, 1, 3), scale, bias, mask,
                           use_pallas=False, layout="blhd")
    assert out.shape == (B * NW, L, H, D)
    assert bool(jnp.all(jnp.isfinite(out)))
