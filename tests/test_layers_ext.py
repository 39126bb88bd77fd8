"""Extended layer library: shapes, masking, and structural semantics."""

import jax
import jax.numpy as jnp
import numpy as np

from digat_tpu import layers_ext as X

B, N, D = 2, 5, 8


def rnd(key, *shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape)


def test_candidate_attention_mask():
    p = X.candidate_attention_init(jax.random.PRNGKey(0), D, D, 6)
    f, q = rnd(1, B, N, D), rnd(2, B, D)
    mask = jnp.asarray([[1, 1, 0, 0, 0], [1, 1, 1, 1, 1]])
    out = X.candidate_attention(p, f, q, mask)
    assert out.shape == (B, D)
    out2 = X.candidate_attention(p, f.at[0, 4].set(99.0), q, mask)
    np.testing.assert_allclose(out[0], out2[0], atol=1e-4)


def test_multi_candidate_attention_shape():
    p = X.candidate_attention_init(jax.random.PRNGKey(0), D, D, 6)
    out = X.multi_candidate_attention(p, rnd(1, B, N, D), rnd(2, B, 3, D))
    assert out.shape == (B, 3, D)


def test_multi_sdp_attention_uniform_when_masked():
    p = X.multi_sdp_attention_init(jax.random.PRNGKey(0), D, D, D)
    f, q = rnd(1, B, N, D), rnd(2, B, 3, D)
    mask = jnp.zeros((B, 3, N))
    out = X.multi_sdp_attention(p, f, q, mask)
    expect = jnp.broadcast_to(f.mean(axis=1, keepdims=True), (B, 3, D))
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect), atol=1e-5)


def test_dual_sdp_attention_shapes_and_consistency():
    p = X.dual_sdp_attention_init(jax.random.PRNGKey(0), D, D, D)
    f1, f2 = rnd(1, B, N, D), rnd(2, B, 3, D)
    out1, out2 = X.dual_sdp_attention(p, f1, f2)
    assert out1.shape == (B, 3, D) and out2.shape == (B, N, D)
    # parameter-free variant with orthogonal inputs stays finite
    o1, o2 = X.dual_sdp_attention_free(f1, f2)
    assert np.isfinite(np.asarray(o1)).all() and np.isfinite(np.asarray(o2)).all()


def graph(batch=B, n=N, p=0.5, seed=3):
    rng = np.random.default_rng(seed)
    g = (rng.random((batch, n, n)) < p) | np.eye(n, dtype=bool)[None]
    return jnp.asarray(g)


def test_gcn_stack():
    p = X.gcn_init(jax.random.PRNGKey(0), D, D, hidden_dim=D, num_layers=3,
                   layer_norm=True)
    out = X.gcn(p, rnd(1, B, N, D), graph(), residual=True)
    assert out.shape == (B, N, D)
    assert np.isfinite(np.asarray(out)).all()


def test_gcn_isolated_node_sees_only_itself():
    g = jnp.asarray(np.eye(N, dtype=bool)[None].repeat(B, 0))
    p = X.gcn_init(jax.random.PRNGKey(0), D, D)
    f = rnd(1, B, N, D)
    out1 = X.gcn(p, f, g)
    out2 = X.gcn(p, f.at[:, 1].set(7.0), g)
    np.testing.assert_allclose(out1[:, 0], out2[:, 0], atol=1e-5)


def test_gated_rgcn():
    p = X.gated_rgcn_init(jax.random.PRNGKey(0), D, num_layers=2)
    out = X.gated_rgcn(p, rnd(1, B, N, D), graph())
    assert out.shape == (B, N, D)
    # zero-init behavior: gates near 0.5 at init keep output bounded
    assert np.abs(np.asarray(out)).max() < 100


def test_gat_respects_adjacency():
    g = np.zeros((1, 3, 3), bool)
    g[0, 0, 0] = g[0, 1, 1] = g[0, 2, 2] = True
    g[0, 0, 1] = True  # node 0 attends {0, 1}
    p = X.gat_init(jax.random.PRNGKey(0), D)
    f = rnd(1, 1, 3, D)
    out1 = X.gat(p, f, jnp.asarray(g))
    out2 = X.gat(p, f.at[0, 2].set(9.0), jnp.asarray(g))  # node 2 changes
    np.testing.assert_allclose(out1[0, 0], out2[0, 0], atol=1e-5)
    assert not np.allclose(out1[0, 2], out2[0, 2])


def test_multihead_gat():
    p = X.multihead_gat_init(jax.random.PRNGKey(0), D, head_num=3, num_layers=2)
    out = X.multihead_gat(p, rnd(1, B, N, D), graph(), 3, residual=True)
    assert out.shape == (B, N, D)
    assert np.isfinite(np.asarray(out)).all()
