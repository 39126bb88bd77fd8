"""Layer primitives: shapes, masking semantics, init statistics."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from digat_tpu import layers as L


def test_masked_softmax_all_masked_is_uniform():
    """-1e9 fill (not -inf): fully masked rows degrade to uniform, matching
    the reference's masked_fill semantics."""
    s = jnp.array([[1.0, 2.0, 3.0]])
    m = jnp.zeros((1, 3))
    out = np.asarray(L.masked_softmax(s, m))
    np.testing.assert_allclose(out, np.full((1, 3), 1 / 3), rtol=1e-6)


def test_attn_pool_respects_mask():
    params = L.attn_pool_init(jax.random.PRNGKey(0), 4, 8)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 4))
    mask = jnp.array([[1, 1, 0, 0, 0], [1, 1, 1, 1, 1]])
    out = L.attn_pool(params, x, mask)
    # masked positions have ~zero weight: perturbing them leaves output fixed
    x2 = x.at[0, 3].set(100.0)
    out2 = L.attn_pool(params, x2, mask)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(out2[0]), atol=1e-4)


def test_mha_shape_and_heads():
    heads, d_model, d_k = 4, 12, 3
    params = L.mha_init(jax.random.PRNGKey(0), heads, d_model, d_k, d_k)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 7, d_model))
    out = L.mha(params, x, heads)
    assert out.shape == (2, 7, heads * d_k)


def test_conv_bank_naive_matches_manual():
    params = L.conv1d_bank_init(jax.random.PRNGKey(0), "naive", 4, 6, 3)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 4))
    out = np.asarray(L.conv1d_bank(params, x, "naive", 3))
    w = np.asarray(params["convs"][0]["w"])  # [3, 4, 6]
    b = np.asarray(params["convs"][0]["b"])
    xp = np.pad(np.asarray(x), ((0, 0), (1, 1), (0, 0)))
    ref = np.zeros((2, 5, 6), np.float32)
    for t in range(5):
        acc = sum(xp[:, t + k] @ w[k] for k in range(3)) + b
        ref[:, t] = np.maximum(acc, 0)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("method,n", [("group3", 3), ("group5", 5)])
def test_conv_bank_groups_shape(method, n):
    params = L.conv1d_bank_init(jax.random.PRNGKey(0), method, 4, 5 * n, 3)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 9, 4))
    out = L.conv1d_bank(params, x, method, 3)
    assert out.shape == (2, 9, 5 * n)


def test_dropout_train_eval():
    x = jnp.ones((1000,))
    key = jax.random.PRNGKey(0)
    assert np.all(np.asarray(L.dropout(key, x, 0.5, False)) == 1.0)
    y = np.asarray(L.dropout(key, x, 0.5, True))
    assert set(np.unique(y)) <= {0.0, 2.0}
    assert 0.3 < (y == 0).mean() < 0.7


def test_init_distributions():
    # torch-default linear: U(+-1/sqrt(fan_in))
    p = L.linear_init(jax.random.PRNGKey(0), 100, 50)
    w = np.asarray(p["w"])
    assert np.abs(w).max() <= 0.1 + 1e-6
    assert np.abs(w).max() > 0.09
    # xavier with relu gain
    p = L.linear_init(jax.random.PRNGKey(1), 100, 100, init="xavier", gain=L.GAIN_RELU)
    bound = math.sqrt(2.0) * math.sqrt(6.0 / 200)
    w = np.asarray(p["w"])
    assert np.abs(w).max() <= bound + 1e-6
    assert np.abs(w).max() > 0.9 * bound


def test_stacked_linear_indexing():
    p = L.stacked_linear_init(jax.random.PRNGKey(0), 3, 4, 4)
    x = jnp.ones((2, 4))
    outs = [np.asarray(L.stacked_linear(p, i, x)) for i in range(3)]
    assert not np.allclose(outs[0], outs[1])
    np.testing.assert_allclose(outs[2], np.asarray(x @ p["w"][2] + p["b"][2]))
