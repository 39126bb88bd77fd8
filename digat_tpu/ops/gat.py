"""Graph-attention score ops.

`interactive_gat_scores` is the Eq.(8) hot spot of the reference
(graphEncoders.py:147-153): attention logits

    score[b, i, j] = a . relu(K1[b, j] + K2[b, i] + K3[b])

where K1/K2 are per-node projections, K3 is the cross-graph query projection
and `a` is the scoring vector. A naive evaluation materializes
[B, G, G, D]; the reference flags this as its #1 cost (README.md:62-66).

On TPU we provide two paths:
  * an XLA expression written so the broadcast-add + relu + contraction forms
    a single reduce-fusion (the [B,G,G,D] intermediate lives only in
    registers/VMEM tiles, never in HBM);
  * a Pallas kernel (ops/pallas/gat_scores.py) with a custom VJP that
    recomputes the relu mask in the backward pass, for the largest shapes.

`vanilla_gat_scores` is the non-interactive ablation score
(graphEncoders.py:498-500): score[b,i,j] = a1 . h[b,j] + a2 . h[b,i], which
factorizes exactly and never needs the quartic intermediate.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def interactive_gat_scores_xla(k1, k2, k3, a_vec):
    """Fused-by-XLA evaluation.

    Args:
      k1: [B, G, D] neighbor-side projection (ffn1; varies along j).
      k2: [B, G, D] center-side projection (ffn2; varies along i).
      k3: [B, D]    cross-graph query projection (ffn3).
      a_vec: [D]    scoring vector.
    Returns:
      [B, G, G] attention logits (pre leaky-relu, pre mask).
    """
    x = k1[:, None, :, :] + k2[:, :, None, :] + k3[:, None, None, :]
    return jnp.einsum("bijd,d->bij", jax.nn.relu(x), a_vec)


def interactive_gat_scores(k1, k2, k3, a_vec, *, use_pallas: bool = False):
    if use_pallas:
        from digat_tpu.ops.pallas.gat_scores import interactive_gat_scores_pallas

        return interactive_gat_scores_pallas(k1, k2, k3, a_vec)
    return interactive_gat_scores_xla(k1, k2, k3, a_vec)


def interactive_gat_scores_fused_y(y, k3, a_vec, *, use_pallas: bool = False):
    """Eq.(8) scores straight from the fused projection y = x @ [W|ffn1|ffn2]
    ([B, G, 3D]): on the Pallas path the kernel block-indexes the k1/k2
    column blocks of y itself, avoiding the non-lane-aligned slice
    relayouts (D=400 is not a multiple of 128) that feeding the custom
    call with y[..., D:2D] / y[..., 2D:] would cost."""
    if use_pallas:
        from digat_tpu.ops.pallas.gat_scores import (
            interactive_gat_scores_fused_y_pallas,
        )

        return interactive_gat_scores_fused_y_pallas(y, k3, a_vec)
    D = y.shape[-1] // 3
    return interactive_gat_scores_xla(y[..., D:2 * D], y[..., 2 * D:], k3, a_vec)


def vanilla_gat_scores(h, a1_vec, a2_vec):
    """Additive GAT logits: score[b,i,j] = a1.h[b,j] + a2.h[b,i].

    h: [B, G, D]; a1_vec, a2_vec: [D]. Returns [B, G, G].
    """
    s1 = h @ a1_vec  # [B, G] (j term)
    s2 = h @ a2_vec  # [B, G] (i term)
    return s1[:, None, :] + s2[:, :, None]
