"""Unit tests for the TPU-native ops (segment softmax/sum, GAT scores)."""

import jax
import jax.numpy as jnp
import numpy as np

from digat_tpu.ops import (
    interactive_gat_scores,
    segment_softmax_sum,
    vanilla_gat_scores,
)
from tests.oracle import softmax


def test_segment_softmax_sum_matches_loop():
    rng = np.random.default_rng(0)
    B, H, D, S = 4, 10, 8, 5
    scores = rng.normal(size=(B, H)).astype(np.float32)
    values = rng.normal(size=(B, H, D)).astype(np.float32)
    seg = rng.integers(0, S, size=(B, H))

    alpha, segsum = jax.jit(segment_softmax_sum, static_argnums=3)(
        scores, values, seg, S
    )
    alpha, segsum = np.asarray(alpha), np.asarray(segsum)

    for b in range(B):
        for s in range(S):
            sel = np.where(seg[b] == s)[0]
            if len(sel) == 0:
                np.testing.assert_allclose(segsum[b, s], 0.0, atol=1e-6)
                continue
            a_ref = softmax(scores[b, sel])
            np.testing.assert_allclose(alpha[b, sel], a_ref, rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(
                segsum[b, s], a_ref @ values[b, sel], rtol=1e-5, atol=1e-5
            )


def test_segment_softmax_extreme_scores():
    """Stability: large positive/negative logits within a segment."""
    scores = jnp.array([[1000.0, 999.0, -1000.0, 5.0]])
    values = jnp.ones((1, 4, 2))
    seg = jnp.array([[0, 0, 1, 1]])
    alpha, segsum = segment_softmax_sum(scores, values, seg, 2)
    assert np.all(np.isfinite(np.asarray(alpha)))
    np.testing.assert_allclose(np.asarray(segsum[0, 0]), [1.0, 1.0], rtol=1e-5)


def test_interactive_gat_scores():
    rng = np.random.default_rng(1)
    B, G, D = 3, 6, 8
    k1 = rng.normal(size=(B, G, D)).astype(np.float32)
    k2 = rng.normal(size=(B, G, D)).astype(np.float32)
    k3 = rng.normal(size=(B, D)).astype(np.float32)
    a = rng.normal(size=(D,)).astype(np.float32)
    out = np.asarray(interactive_gat_scores(k1, k2, k3, a))
    ref = np.einsum(
        "bijd,d->bij",
        np.maximum(k1[:, None, :, :] + k2[:, :, None, :] + k3[:, None, None, :], 0),
        a,
    )
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_vanilla_gat_scores_orientation():
    """a1 contributes along the neighbor (j/softmax) axis, a2 along i —
    orientation defined by reference graphEncoders.py:498-500."""
    B, G, D = 2, 4, 3
    h = np.zeros((B, G, D), np.float32)
    h[:, 2, 0] = 1.0  # only node 2 has signal in dim 0
    a1 = np.array([1.0, 0, 0], np.float32)
    a2 = np.zeros(3, np.float32)
    s = np.asarray(vanilla_gat_scores(h, a1, a2))
    # score[b, i, j=2] == 1 for every i; all else 0
    assert np.all(s[:, :, 2] == 1.0)
    s[:, :, 2] = 0
    assert np.all(s == 0)


def test_fused_y_scores_match_sliced(monkeypatch):
    """The fused-y entry point (kernel block-indexes k1/k2 out of
    y = x @ [W|ffn1|ffn2]) must equal the sliced path exactly — fwd and
    grads — in interpret mode (the hardware twin lives in
    tests/test_kernels_tpu.py)."""
    import jax
    import jax.numpy as jnp

    from digat_tpu.ops.gat import (
        interactive_gat_scores,
        interactive_gat_scores_fused_y,
    )
    from digat_tpu.ops.pallas import runtime as plrt

    rng = np.random.default_rng(3)
    B, G, D = 12, 10, 128
    y = jnp.asarray(rng.normal(size=(B, G, 3 * D)), jnp.float32)
    k3 = jnp.asarray(rng.normal(size=(B, D)), jnp.float32)
    a = jnp.asarray(rng.normal(size=(D,)), jnp.float32)

    def f_sliced(y, k3, a):
        return jnp.sum(
            interactive_gat_scores(
                y[..., D:2 * D], y[..., 2 * D:], k3, a, use_pallas=True
            ) ** 2
        )

    def f_fused(y, k3, a):
        return jnp.sum(
            interactive_gat_scores_fused_y(y, k3, a, use_pallas=True) ** 2
        )

    plrt.set_interpret(True)
    try:
        v1, g1 = jax.value_and_grad(f_sliced, argnums=(0, 1, 2))(y, k3, a)
        v2, g2 = jax.value_and_grad(f_fused, argnums=(0, 1, 2))(y, k3, a)
    finally:
        plrt.set_interpret(False)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-6)
    for a1, a2 in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a1), np.asarray(a2),
                                   rtol=1e-5, atol=1e-5)
