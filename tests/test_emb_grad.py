"""Sorted embedding-gradient kernel (ops/pallas/emb_grad.py): forward and
backward parity against the plain gather / scatter-add, in interpret mode
(the TPU hardware run lives in test_kernels_tpu.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from digat_tpu.ops.pallas.emb_grad import (
    EmbGradMeta,
    build_sorted_emb_meta,
    embedding_lookup,
    meta_shape,
)


def scatter_ref(tok, g, V):
    ref = np.zeros((V, g.shape[-1]), np.float32)
    np.add.at(ref, np.asarray(tok).ravel(), g.reshape(-1, g.shape[-1]))
    return ref


@pytest.mark.parametrize(
    "V,shape,C,R",
    [
        (50, (7, 5), 8, 16),  # tiny, uneven, pads a partial chunk
        (300, (31,), 16, 128),  # 1-D tokens, vocab pad
        (1000, (40, 32), 512, 128),  # production-like chunk/tile geometry
    ],
)
def test_lookup_grad_matches_scatter(V, shape, C, R):
    rng = np.random.default_rng(0)
    tok = rng.integers(0, V, shape).astype(np.int32)
    D = 36 if V < 500 else 300
    g = rng.standard_normal(shape + (D,)).astype(np.float32)
    meta = build_sorted_emb_meta(tok, V, chunk=C, tile=R)
    table = jnp.asarray(rng.standard_normal((V, D)), jnp.float32)

    out = embedding_lookup(table, jnp.asarray(tok), meta, tile=R, interpret=True)
    assert np.allclose(np.asarray(out), np.asarray(table)[tok])

    f = lambda t: jnp.sum(
        embedding_lookup(t, jnp.asarray(tok), meta, tile=R, interpret=True)
        * jnp.asarray(g)
    )
    dW = np.asarray(jax.grad(f)(table))
    assert np.abs(dW - scatter_ref(tok, g, V)).max() < 1e-4


def test_skewed_tokens():
    """Zipf-like duplication (the real MIND title distribution): many
    repeats of a few ids must still sum exactly."""
    rng = np.random.default_rng(1)
    V, D = 120, 20
    tok = np.minimum(rng.zipf(1.3, (50, 8)) - 1, V - 1).astype(np.int32)
    g = rng.standard_normal(tok.shape + (D,)).astype(np.float32)
    meta = build_sorted_emb_meta(tok, V, chunk=16, tile=16)
    table = jnp.asarray(rng.standard_normal((V, D)), jnp.float32)
    f = lambda t: jnp.sum(
        embedding_lookup(t, jnp.asarray(tok), meta, tile=16, interpret=True)
        * jnp.asarray(g)
    )
    dW = np.asarray(jax.grad(f)(table))
    assert np.abs(dW - scatter_ref(tok, g, V)).max() < 1e-4


def test_meta_shapes_static():
    """Meta array shapes depend only on (ntok, vocab, chunk, tile) — the
    jit-stability contract (one program per config)."""
    V, C, R = 777, 32, 64
    shapes = []
    for seed in range(3):
        tok = np.random.default_rng(seed).integers(0, V, (13, 9))
        m = build_sorted_emb_meta(tok, V, chunk=C, tile=R)
        shapes.append(jax.tree.map(lambda a: a.shape, m))
    assert shapes[0] == shapes[1] == shapes[2]
    ntok_p, nchunks, ntiles, W = meta_shape(13 * 9, V, C, R)
    assert shapes[0].perm == (ntok_p,)
    assert shapes[0].wt_tile == (W,)


def test_cpu_fallback_without_interpret():
    """Off-TPU the custom VJP silently uses the scatter path (same math)."""
    rng = np.random.default_rng(2)
    V, D = 64, 12
    tok = rng.integers(0, V, (9, 4)).astype(np.int32)
    g = rng.standard_normal(tok.shape + (D,)).astype(np.float32)
    meta = build_sorted_emb_meta(tok, V, chunk=8, tile=8)
    table = jnp.asarray(rng.standard_normal((V, D)), jnp.float32)
    f = lambda t: jnp.sum(
        embedding_lookup(t, jnp.asarray(tok), meta) * jnp.asarray(g)
    )
    dW = np.asarray(jax.jit(jax.grad(f))(table))
    assert np.abs(dW - scatter_ref(tok, g, V)).max() < 1e-4


@pytest.mark.parametrize("V,shape,C,R", [(300, (31,), 16, 128),
                                         (1000, (40, 32), 512, 128)])
def test_device_reconstructed_meta_matches_host(V, shape, C, R):
    """ship_sort_arrays=False: the backward reconstructs perm/sid on
    device with a stable argsort; gradients must equal the host-meta path
    bit-for-bit (stable sorts are unique)."""
    rng = np.random.default_rng(3)
    tok = rng.integers(0, V, shape).astype(np.int32)
    D = 36 if V < 500 else 300
    table = jnp.asarray(rng.standard_normal((V, D)), jnp.float32)
    cvec = jnp.asarray(rng.standard_normal(shape + (D,)), jnp.float32)

    def loss(table, meta):
        out = embedding_lookup(table, jnp.asarray(tok), meta, tile=R,
                               interpret=True, chunk=C)
        return jnp.sum(out * cvec)

    host_meta = build_sorted_emb_meta(tok, V, chunk=C, tile=R)
    dev_meta = build_sorted_emb_meta(tok, V, chunk=C, tile=R,
                                     ship_sort_arrays=False)
    assert dev_meta.perm is None and dev_meta.sid is None
    g_host = jax.grad(loss)(table, host_meta)
    g_dev = jax.grad(loss)(table, dev_meta)
    np.testing.assert_array_equal(np.asarray(g_host), np.asarray(g_dev))
