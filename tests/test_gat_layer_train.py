"""Fused training-mode GAT layer (ops/pallas/gat_layer_train.py):
interpret-mode parity of the forward and every gradient against the XLA
composition. The kernel is off by default (measured slower on v5e — see
the module docstring); these tests keep it correct for re-evaluation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from digat_tpu.ops.pallas.gat_layer_train import (
    _layer_xla,
    interactive_gat_layer_train,
)


def _inputs(B, G, D, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((B, G, D)) * 0.3, jnp.float32)
    adj = jnp.asarray((rng.random((B, G, G)) < 0.3) | np.eye(G, dtype=bool))
    q = jnp.asarray(rng.standard_normal((B, D)) * 0.3, jnp.float32)
    m1 = jnp.asarray(rng.random((B, G, D)) < 0.9)
    m2 = jnp.asarray(rng.random((B, G, G)) < 0.8)
    W, W1, W2, W3 = (
        jnp.asarray(rng.standard_normal((D, D)) * 0.1, jnp.float32)
        for _ in range(4)
    )
    bW, b3, a = (
        jnp.asarray(rng.standard_normal(D) * 0.05, jnp.float32)
        for _ in range(3)
    )
    cv = jnp.asarray(rng.standard_normal((B, G, D)) * 0.1, jnp.float32)
    return x, adj, q, m1, m2, W, bW, W1, W2, W3, b3, a, cv


@pytest.mark.parametrize("B,G,D", [(13, 18, 40), (8, 11, 24)])
def test_fused_train_layer_matches_xla(B, G, D):
    x, adj, q, m1, m2, W, bW, W1, W2, W3, b3, a, cv = _inputs(B, G, D)
    wrt = (x, q, W, bW, W1, W2, W3, b3, a)

    def lf(t):
        o = interactive_gat_layer_train(
            t[0], adj, t[1], m1, m2, *t[2:],
            input_rate=0.1, attn_rate=0.2, interpret=True,
        )
        return jnp.sum(o * cv)

    def lx(t):
        o = _layer_xla(t[0], adj, t[1], m1, m2, *t[2:],
                       scale1=1 / 0.9, scale2=1 / 0.8, slope=0.2)
        return jnp.sum(o * cv)

    of = interactive_gat_layer_train(
        x, adj, q, m1, m2, W, bW, W1, W2, W3, b3, a,
        input_rate=0.1, attn_rate=0.2, interpret=True,
    )
    ox = _layer_xla(x, adj, q, m1, m2, W, bW, W1, W2, W3, b3, a,
                    1 / 0.9, 1 / 0.8, 0.2)
    assert float(jnp.abs(of - ox).max()) < 1e-5

    gf = jax.grad(lf)(wrt)
    gx = jax.grad(lx)(wrt)
    for a_, b_ in zip(gf, gx):
        scale = float(jnp.abs(b_).max()) + 1e-9
        assert float(jnp.abs(a_ - b_).max()) / scale < 1e-5


def test_zero_rate_masks_are_identity():
    x, adj, q, m1, m2, W, bW, W1, W2, W3, b3, a, _ = _inputs(5, 9, 16)
    ones1 = jnp.ones_like(m1, bool)
    ones2 = jnp.ones_like(m2, bool)
    o = interactive_gat_layer_train(
        x, adj, q, ones1, ones2, W, bW, W1, W2, W3, b3, a,
        input_rate=0.0, attn_rate=0.0, interpret=True,
    )
    ox = _layer_xla(x, adj, q, ones1, ones2, W, bW, W1, W2, W3, b3, a,
                    1.0, 1.0, 0.2)
    assert float(jnp.abs(o - ox).max()) < 1e-5
