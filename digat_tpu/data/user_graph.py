"""User history-graph construction.

The reference materializes a dense [num_behaviors, Gu, Gu] bool adjacency
pickle per split (reference: MIND_corpus.py:146-186) — tens of GB on
MIND-large. The graph is fully determined by the per-slot category index
vector (padded slots carry index C), so we store only that compact vector
(~100 bytes/row instead of ~4.6 KB) and reconstruct the adjacency *on
device* inside the jitted step with a few outer-product masks.

Edge rules replicated exactly (MIND_corpus.py:153-176):
  * self-loops on every node (identity, including absent ones);
  * News-Topic edge between each valid history item and its category node;
  * News-News edge between two valid items of the same category;
  * Topic-Topic edge between the category nodes of two valid items with
    different categories (equivalently: both categories present).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def build_user_graph(cat_idx, max_history_num: int, category_num: int):
    """Reconstruct the dense adjacency from category indices.

    Args:
      cat_idx: [..., H] int, category per history slot; padded slots == C.
      max_history_num: H. category_num: C.
    Returns:
      (user_graph [..., H+C, H+C] bool, category_mask [..., C+1] bool)
    """
    H, C = max_history_num, category_num
    cat_idx = cat_idx.astype(jnp.int32)
    valid = cat_idx < C  # [..., H]
    onehot = jax.nn.one_hot(cat_idx, C, dtype=bool) & valid[..., None]  # [...,H,C]
    present = jnp.any(onehot, axis=-2)  # [..., C]

    nn = (
        valid[..., :, None]
        & valid[..., None, :]
        & (cat_idx[..., :, None] == cat_idx[..., None, :])
    )  # [..., H, H]
    nt = onehot  # [..., H, C]
    tt = present[..., :, None] & present[..., None, :]  # [..., C, C]

    top = jnp.concatenate([nn, nt], axis=-1)  # [..., H, H+C]
    bottom = jnp.concatenate(
        [jnp.swapaxes(nt, -1, -2), tt], axis=-1
    )  # [..., C, H+C]
    graph = jnp.concatenate([top, bottom], axis=-2)  # [..., H+C, H+C]
    graph = graph | jnp.eye(H + C, dtype=bool)

    category_mask = jnp.concatenate(
        [present, jnp.zeros((*present.shape[:-1], 1), bool)], axis=-1
    )  # [..., C+1]
    return graph, category_mask


def build_user_graph_np(cat_idx, max_history_num: int, category_num: int):
    """NumPy twin for offline/eval-side use; same semantics."""
    g, m = jax.jit(
        build_user_graph, static_argnums=(1, 2), backend="cpu"
    )(np.asarray(cat_idx), max_history_num, category_num)
    return np.asarray(g), np.asarray(m)
