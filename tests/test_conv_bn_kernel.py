"""Fused matmul+BN-stats kernel (ops/conv_bn.py) vs the unfused reference
chain: relu(x*scale+bias) @ w with flax-convention statistics
(var = E[y^2] - E[y]^2 over the rounded output). CPU runs the kernel in
interpret mode."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from torchok_tpu.ops.conv_bn import bn_from_stats, matmul_bn


def _ref(x, w, scale, bias, relu_in, with_affine):
    a = x.astype(jnp.float32)
    if with_affine:
        a = a * scale + bias
    if relu_in:
        a = jnp.maximum(a, 0.0)
    y = jnp.dot(a.astype(x.dtype), w,
                preferred_element_type=jnp.float32).astype(x.dtype)
    yf = y.astype(jnp.float32)
    return y, jnp.sum(yf, 0), jnp.sum(yf * yf, 0)


@pytest.mark.parametrize("m,k,n", [(256, 128, 128), (200, 64, 256),
                                   (640, 256, 64)])
@pytest.mark.parametrize("relu_in,with_affine", [(False, False),
                                                 (True, True)])
def test_forward_matches_reference(m, k, n, relu_in, with_affine):
    gen = np.random.default_rng(0)
    x = jnp.asarray(gen.normal(0, 1, (m, k)), jnp.float32)
    w = jnp.asarray(gen.normal(0, 0.05, (k, n)), jnp.float32)
    scale = jnp.asarray(gen.uniform(0.5, 1.5, (k,)), jnp.float32)
    bias = jnp.asarray(gen.normal(0, 0.2, (k,)), jnp.float32)

    y, s1, s2 = matmul_bn(x, w, scale, bias, relu_in, with_affine)
    yr, s1r, s2r = _ref(x, w, scale, bias, relu_in, with_affine)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yr),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s1r),
                               rtol=1e-4, atol=1e-2)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s2r),
                               rtol=1e-4, atol=1e-2)


def test_gradients_match_reference():
    gen = np.random.default_rng(1)
    m, k, n = 192, 64, 128
    x = jnp.asarray(gen.normal(0, 1, (m, k)), jnp.float32)
    w = jnp.asarray(gen.normal(0, 0.05, (k, n)), jnp.float32)
    scale = jnp.asarray(gen.uniform(0.5, 1.5, (k,)), jnp.float32)
    bias = jnp.asarray(gen.normal(0, 0.2, (k,)), jnp.float32)
    # downstream consumes y AND the statistics (like BN's normalize does)
    cw = jnp.asarray(gen.normal(0, 1, (n,)), jnp.float32)

    def loss_fused(x, w, scale, bias):
        y, s1, s2 = matmul_bn(x, w, scale, bias, True, True)
        sc, bi, mean, var = bn_from_stats(s1, s2, m, jnp.ones((n,)),
                                          jnp.zeros((n,)))
        yhat = y.astype(jnp.float32) * sc + bi
        return jnp.sum(yhat * cw) + jnp.sum(mean) + 0.1 * jnp.sum(var)

    def loss_ref(x, w, scale, bias):
        y, s1, s2 = _ref(x, w, scale, bias, True, True)
        sc, bi, mean, var = bn_from_stats(s1, s2, m, jnp.ones((n,)),
                                          jnp.zeros((n,)))
        yhat = y.astype(jnp.float32) * sc + bi
        return jnp.sum(yhat * cw) + jnp.sum(mean) + 0.1 * jnp.sum(var)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(x, w, scale, bias)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, w, scale, bias)
    for a, b, name in zip(gf, gr, ["dx", "dw", "dscale", "dbias"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3, err_msg=name)


def test_ragged_m_rows_masked():
    """M not a multiple of the row block: padded rows must not leak into the
    stats (the affine epilogue maps 0 -> relu(bias) != 0)."""
    gen = np.random.default_rng(2)
    m, k, n = 130, 128, 128
    x = jnp.asarray(gen.normal(0, 1, (m, k)), jnp.float32)
    w = jnp.asarray(gen.normal(0, 0.05, (k, n)), jnp.float32)
    scale = jnp.ones((k,), jnp.float32)
    bias = jnp.full((k,), 0.7, jnp.float32)  # nonzero: exposes pad leakage
    y, s1, s2 = matmul_bn(x, w, scale, bias, True, True)
    yr, s1r, s2r = _ref(x, w, scale, bias, True, True)
    assert y.shape == (m, n)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s1r),
                               rtol=1e-4, atol=1e-2)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s2r),
                               rtol=1e-4, atol=1e-2)


def test_bn_from_stats_matches_flax_batchnorm():
    import flax.linen as nn
    gen = np.random.default_rng(3)
    m, n = 512, 64
    y = jnp.asarray(gen.normal(1.5, 2.0, (m, n)), jnp.float32)
    gamma = jnp.asarray(gen.uniform(0.5, 1.5, (n,)), jnp.float32)
    beta = jnp.asarray(gen.normal(0, 0.3, (n,)), jnp.float32)

    bn = nn.BatchNorm(use_running_average=False, momentum=0.9, epsilon=1e-5)
    variables = bn.init(jax.random.PRNGKey(0), y)
    variables = {"params": {"scale": gamma, "bias": beta},
                 "batch_stats": variables["batch_stats"]}
    ref, _ = bn.apply(variables, y, mutable=["batch_stats"])

    s1 = jnp.sum(y, 0)
    s2 = jnp.sum(y * y, 0)
    sc, bi, mean, var = bn_from_stats(s1, s2, m, gamma, beta, eps=1e-5)
    np.testing.assert_allclose(np.asarray(y * sc + bi), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(jnp.mean(y, 0)),
                               rtol=1e-5, atol=1e-6)
