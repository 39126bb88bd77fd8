"""Mixed-precision (bfloat16 compute) path: numerical closeness to fp32,
fp32 master gradients, finite losses."""

import jax
import jax.numpy as jnp
import numpy as np

import __graft_entry__ as graft
from digat_tpu.models.model import Model


def setup(compute_dtype):
    cfg = graft._tiny_config()
    cfg.compute_dtype = compute_dtype
    model = Model(cfg)
    tables, batch = graft._tiny_data(cfg)
    return model, tables, batch


def test_bf16_logits_close_to_fp32():
    m32, tables, batch = setup("float32")
    m16, _, _ = setup("bfloat16")
    params = m32.init(jax.random.PRNGKey(0))
    rng = jax.random.PRNGKey(1)
    l32 = m32.forward_indexed(params, tables, batch, rng, train=False)
    l16 = m16.forward_indexed(
        m16.cast_params(params), tables, batch, rng, train=False
    )
    assert l16.dtype == jnp.float32  # final dot accumulates in fp32
    # relative closeness on the logits scale
    denom = np.maximum(np.abs(np.asarray(l32)), 1.0)
    rel = np.abs(np.asarray(l16) - np.asarray(l32)) / denom
    assert rel.max() < 0.05, rel.max()


def test_bf16_loss_and_grads():
    m16, tables, batch = setup("bfloat16")
    params = m16.init(jax.random.PRNGKey(0))
    loss, grads = jax.jit(jax.value_and_grad(m16.loss))(
        params, tables, batch, jax.random.PRNGKey(1)
    )
    assert np.isfinite(float(loss))
    for g in jax.tree.leaves(grads):
        assert g.dtype == jnp.float32  # master grads stay fp32
    gnorm = float(jnp.sqrt(sum(jnp.sum(g**2) for g in jax.tree.leaves(grads))))
    assert gnorm > 0 and np.isfinite(gnorm)


def test_bf16_ranking_agrees_with_fp32():
    """bf16 noise must not scramble candidate rankings at init scale."""
    m32, tables, batch = setup("float32")
    m16, _, _ = setup("bfloat16")
    params = m32.init(jax.random.PRNGKey(3))
    rng = jax.random.PRNGKey(4)
    l32 = np.asarray(m32.forward_indexed(params, tables, batch, rng, False))
    l16 = np.asarray(
        m16.forward_indexed(m16.cast_params(params), tables, batch, rng, False)
    )
    agree = np.mean(np.argmax(l32, 1) == np.argmax(l16, 1))
    assert agree >= 0.75
