"""Graph encoders vs the independent NumPy oracle (eval mode, fp32)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from digat_tpu.models import graph_encoders as G
from tests import oracle

B, Gn, H, C, D, DEPTH = 3, 7, 6, 4, 16, 2
Gu = H + C


def make_inputs(seed=0):
    rng = np.random.default_rng(seed)
    news_x = rng.normal(size=(B, Gn, D)).astype(np.float32)
    news_graph = rng.random((B, Gn, Gn)) < 0.4
    news_graph |= np.eye(Gn, dtype=bool)[None]
    news_graph = news_graph | news_graph.transpose(0, 2, 1)
    news_graph_mask = rng.random((B, Gn)) < 0.7
    news_graph_mask[:, 0] = 0  # candidate excluded (MIND_corpus.py:210)
    user_news = rng.normal(size=(B, H, D)).astype(np.float32)
    cat_idx = rng.integers(0, C + 1, size=(B, H))
    from tests.oracle import user_graph_np

    user_graph = np.zeros((B, Gu, Gu), dtype=bool)
    cat_mask = np.zeros((B, C + 1), dtype=bool)
    for b in range(B):
        user_graph[b], cat_mask[b] = user_graph_np(cat_idx[b], H, C)
    return news_x, news_graph, news_graph_mask, user_news, user_graph, cat_mask, cat_idx


@pytest.mark.parametrize("variant", G.VARIANTS)
def test_forward_matches_oracle(variant):
    st = G.GraphStatic(
        variant=variant, depth=DEPTH, max_history_num=H, category_num=C,
        dim=D, dropout_rate=0.2,
    )
    params = G.init(jax.random.PRNGKey(1), st)
    # randomize the zero-init topic embedding so it participates
    params["topic_node_embedding"] = (
        0.1 * jax.random.normal(jax.random.PRNGKey(2), (C, D))
    )
    inputs = make_inputs()
    news_x, news_graph, news_graph_mask, user_news, user_graph, cat_mask, cat_idx = inputs

    c_n, c_u = jax.jit(G.forward, static_argnums=(1, 3))(
        params, st, jax.random.PRNGKey(0), False,
        jnp.asarray(news_x), jnp.asarray(news_graph), jnp.asarray(news_graph_mask),
        jnp.asarray(user_news), jnp.asarray(user_graph), jnp.asarray(cat_mask),
        jnp.asarray(cat_idx),
    )
    params_np = jax.tree.map(np.asarray, params)
    c_n_ref, c_u_ref = oracle.graph_forward(
        params_np, variant, DEPTH, H, C,
        news_x, news_graph, news_graph_mask, user_news, user_graph, cat_mask, cat_idx,
    )
    np.testing.assert_allclose(np.asarray(c_n), c_n_ref, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(c_u), c_u_ref, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("variant", G.VARIANTS)
def test_inference_consistent_with_forward(variant):
    """Eval-mode forward == inference fed with the cached c_n0 — the
    correctness contract of the two-stage cached scorer (util.py:37-50)."""
    st = G.GraphStatic(
        variant=variant, depth=DEPTH, max_history_num=H, category_num=C,
        dim=D, dropout_rate=0.2,
    )
    params = G.init(jax.random.PRNGKey(3), st)
    inputs = make_inputs(7)
    news_x, news_graph, news_graph_mask, user_news, user_graph, cat_mask, cat_idx = map(
        jnp.asarray, inputs
    )
    rng = jax.random.PRNGKey(0)
    ref = G.forward(
        params, st, rng, False, news_x, news_graph, news_graph_mask,
        user_news, user_graph, cat_mask, cat_idx,
    )
    c_n0 = G.initial_news_context(params, st, news_x, news_graph_mask)
    cached = G.forward(
        params, st, rng, False, news_x, news_graph, news_graph_mask,
        user_news, user_graph, cat_mask, cat_idx, c_n0=c_n0,
    )
    for a, b in zip(ref, cached):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)
