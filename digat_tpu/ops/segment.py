"""Segmented softmax + weighted-sum over category indices.

TPU-native replacement for the reference's torch_scatter
`scatter_softmax` / `scatter_sum` pair (reference: graphEncoders.py:129-130).
Instead of CUDA gather/scatter kernels we build a one-hot membership tensor
and express both the per-segment softmax and the weighted aggregation as
dense einsums that map onto the MXU — the number of segments (news
categories, ~18 + 1 pad) is tiny, so the dense form is both faster and
fusion-friendly on TPU.

Semantics match torch_scatter with static `dim_size=num_segments`:
  * the softmax normalizes within each segment independently;
  * empty segments produce all-zero output rows;
  * every position contributes to exactly one segment (indices in
    [0, num_segments)); the pad segment collects padded history items and is
    masked out downstream, exactly like the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -3.0e38  # finite stand-in for -inf that survives bf16 casts


def segment_softmax_sum(scores, values, segment_ids, num_segments: int):
    """Per-segment softmax of `scores` then weighted sum of `values`.

    Args:
      scores:      [..., H]     attention logits per position.
      values:      [..., H, D]  vectors to aggregate.
      segment_ids: [..., H]     int segment id per position, in [0, S).
      num_segments: S (static).

    Returns:
      (alpha, segsum): alpha [..., H] softmax weights normalized within each
      segment; segsum [..., S, D] = sum_h alpha[h] * values[h] over positions
      of each segment (zeros for empty segments).
    """
    out_dtype = values.dtype
    # per-segment softmax in >= fp32 (f64 inputs stay f64: the weight-
    # transplant parity leg runs the whole model in double precision)
    acc = jnp.promote_types(scores.dtype, jnp.float32)
    scores = scores.astype(acc)
    onehot = jax.nn.one_hot(segment_ids, num_segments, dtype=acc)
    # max per segment (for numerical stability), gathered back per position
    masked = jnp.where(onehot > 0, scores[..., None], NEG_INF)  # [...,H,S]
    seg_max = jnp.max(masked, axis=-2)  # [...,S]
    pos_max = jnp.einsum("...hs,...s->...h", onehot, seg_max)
    ex = jnp.exp(scores - pos_max)  # [...,H]
    seg_den = jnp.einsum("...h,...hs->...s", ex, onehot)  # [...,S]
    pos_den = jnp.einsum("...hs,...s->...h", onehot, seg_den)
    alpha = (ex / pos_den).astype(out_dtype)  # positions always have a segment
    onehot = onehot.astype(out_dtype)
    weighted = onehot * alpha[..., None]  # [...,H,S]
    segsum = jnp.einsum("...hs,...hd->...sd", weighted, values)  # [...,S,D]
    return alpha, segsum
