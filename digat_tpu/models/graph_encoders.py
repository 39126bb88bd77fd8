"""Dual-graph encoders: DIGAT and its five ablations.

Functional re-design of the reference's six graph-encoder classes
(reference: graphEncoders.py:48-843). All variants share four building
blocks, composed per-variant:

  * news_graph_context  — gated fusion of the candidate node with a
    query-conditioned global attention over the SAG
    (graphEncoders.py:109-114);
  * user_graph_context  — topic-level segmented attention (the
    torch_scatter site, graphEncoders.py:123-134) followed by user-level
    candidate attention;
  * interactive GAT layer — Eq.(8) query-conditioned attention
    (graphEncoders.py:143-154);
  * vanilla GAT layer — additive a1+a2 attention, no cross-graph query
    (graphEncoders.py:494-520).

The depth loop alternates news-graph and user-graph updates and
*accumulates* both contexts additively (graphEncoders.py:177-187). The
`inference` path consumes a cached initial news context `c_n0`
(graphEncoders.py:189-198) enabling the two-stage cached scorer.

Per-depth parameters are stacked on a leading axis and indexed with the
static loop counter, keeping the pytree flat and scan-able.

Dropout streams mirror the reference's three rates: `p` (topic embeddings,
attention weights), `p/2` (gate logits, GAT layer inputs, topic-node
broadcast) — see graphEncoders.py:22-24.
"""

from __future__ import annotations

import math
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp

from digat_tpu import layers as L
from digat_tpu.ops import (
    interactive_gat_scores,
    segment_softmax_sum,
    vanilla_gat_scores,
)
from digat_tpu.ops.gat import interactive_gat_scores_fused_y

VARIANTS = (
    "DIGAT",
    "wo_SA",
    "Seq_SA",
    "wo_interaction",
    "news_graph_wo_inter",
    "user_graph_wo_inter",
)

# Node-count gate for the fused eval GAT-layer kernel, overridable via
# DIGAT_FUSED_MIN_NODES. Interleaved A/B on v5e (B=1024, D=400, depth 3,
# G=26 SAG / G=68 user graph): measured in isolation the XLA composition +
# the Pallas Eq.(8) score kernel runs the eval graph encoder faster
# (18.6 ms vs 22.2 ms fused), but in the full inference step the fused
# layer wins (23.6 ms vs 25.5 ms) — one VMEM-resident kernel per layer
# leaves HBM bandwidth free for the concurrent news-rep/SAG gathers
# (full-minus-encoder overhead: 1.4 ms fused vs 6.9 ms unfused). End-to-end
# is what ships, so the fused kernel is on by default.
_FUSED_LAYER_MIN_NODES = int(os.environ.get("DIGAT_FUSED_MIN_NODES", "0"))

# Feed the Eq.(8) score kernel the fused projection y directly (the kernel
# slices the k1/k2 columns in VMEM) instead of XLA-sliced k1/k2 operands.
# Round-4 A/B verdict: OFF. In the full train step the fused-y forward
# blows the 16M scoped-VMEM stack (18.8M, TB-independent — Mosaic
# materializes the lane-offset slices on the stack), so the XLA slice
# relayouts stay (round-3's split-projection A/B already bounded them as
# cheaper than the alternatives). Kept as an env-gated variant with
# interpret + hardware parity tests.
_FUSED_Y = os.environ.get("DIGAT_FUSED_Y", "0") not in ("0", "false")


class GraphStatic(NamedTuple):
    """Static (trace-time) configuration of a graph encoder."""

    variant: str
    depth: int
    max_history_num: int
    category_num: int  # number of real categories (pad segment is +1)
    dim: int
    dropout_rate: float
    use_pallas: bool = False


# ---------------------------------------------------------------------------
# Parameter initialization
# ---------------------------------------------------------------------------


def _ctx_news_init(key, dim):
    k1, k2 = jax.random.split(key)
    return {
        "cand_attn": L.sdp_attn_init(k1, dim, dim, dim),
        "gate": L.linear_init(k2, 2 * dim, dim, init="xavier", bias_init="zeros"),
    }


def _ctx_user_init(key, dim):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "K": L.linear_init(k1, dim, dim, bias=False, init="xavier"),
        "Q": L.linear_init(k2, dim, dim, init="xavier", bias_init="zeros"),
        "affine": L.linear_init(
            k3, dim, dim, init="xavier", gain=L.GAIN_RELU, bias_init="zeros"
        ),
        "attn": L.sdp_attn_init(k4, dim, dim, dim),
    }


def _gat_interactive_init(key, depth, dim):
    kW, k1, k2, k3, ka = jax.random.split(key, 5)
    glr = L.gain_leaky_relu(0.2)
    return {
        "W": L.stacked_linear_init(kW, depth, dim, dim, init="xavier", bias_init="zeros"),
        "ffn1": L.stacked_linear_init(k1, depth, dim, dim, bias=False, init="xavier", gain=L.GAIN_RELU),
        "ffn2": L.stacked_linear_init(k2, depth, dim, dim, bias=False, init="xavier", gain=L.GAIN_RELU),
        "ffn3": L.stacked_linear_init(k3, depth, dim, dim, init="xavier", gain=L.GAIN_RELU, bias_init="zeros"),
        "a": L.stacked_linear_init(ka, depth, dim, 1, bias=False, init="xavier", gain=glr),
    }


def _gat_vanilla_init(key, depth, dim):
    kW, ka1, ka2 = jax.random.split(key, 3)
    glr = L.gain_leaky_relu(0.2)
    return {
        "W": L.stacked_linear_init(kW, depth, dim, dim, init="xavier", bias_init="zeros"),
        "a1": L.stacked_linear_init(ka1, depth, dim, 1, bias=False, init="xavier", gain=glr),
        "a2": L.stacked_linear_init(ka2, depth, dim, 1, bias=False, init="xavier", gain=glr),
    }


def init(key, st: GraphStatic):
    """Initialize parameters for the given variant."""
    keys = jax.random.split(key, 8)
    dim, depth = st.dim, st.depth
    params = {"topic_node_embedding": jnp.zeros((st.category_num, dim))}
    v = st.variant
    if v in ("DIGAT", "Seq_SA", "wo_interaction", "news_graph_wo_inter", "user_graph_wo_inter"):
        params["news_ctx"] = _ctx_news_init(keys[0], dim)
    params["user_ctx"] = _ctx_user_init(keys[1], dim)
    if v in ("DIGAT", "user_graph_wo_inter"):
        params["news_gat"] = _gat_interactive_init(keys[2], depth, dim)
    elif v in ("wo_interaction", "news_graph_wo_inter"):
        params["news_gat"] = _gat_vanilla_init(keys[2], depth, dim)
    if v in ("DIGAT", "wo_SA", "Seq_SA", "news_graph_wo_inter"):
        params["user_gat"] = _gat_interactive_init(keys[3], depth, dim)
    else:  # wo_interaction, user_graph_wo_inter
        params["user_gat"] = _gat_vanilla_init(keys[3], depth, dim)
    return params


# ---------------------------------------------------------------------------
# Building blocks
# ---------------------------------------------------------------------------


def news_graph_context(params, st, rng, train, x, node_mask):
    """Gated fusion of candidate (node 0) and global SAG attention.

    x: [B, G, D]; node_mask: [B, G] (candidate slot pre-zeroed by the corpus
    loader, reference MIND_corpus.py:210). Returns [B, D].
    """
    local = x[:, 0, :]
    global_ = L.sdp_attn(params["cand_attn"], x, local, mask=node_mask)
    gate_logits = L.linear(params["gate"], jnp.concatenate([local, global_], axis=-1))
    gate_logits = L.dropout(rng, gate_logits, st.dropout_rate / 2, train)
    gate = jax.nn.sigmoid(gate_logits)
    return gate * local + (1.0 - gate) * global_


def user_graph_context(params, st, rng, train, user_x, cat_mask, cat_idx, query):
    """Topic-level segmented attention + user-level candidate attention.

    user_x: [B, Gu, D] (history news nodes then topic nodes);
    cat_mask: [B, C+1]; cat_idx: [B, H] in [0, C]; query: [B, D].
    """
    hist = user_x[:, : st.max_history_num, :]  # [B, H, D]
    k = L.linear(params["K"], hist)
    q = L.linear(params["Q"], query)
    a = jnp.einsum("bhd,bd->bh", k, q) / math.sqrt(float(st.dim))
    _, topic = segment_softmax_sum(a, hist, cat_idx, st.category_num + 1)  # [B,C+1,D]
    topic = jax.nn.relu(L.linear(params["affine"], topic)) + topic
    topic = L.dropout(rng, topic, st.dropout_rate, train)
    return L.sdp_attn(params["attn"], topic, query, mask=cat_mask)


def _gat_layer(gat, i, st, rng, train, x, adj, query):
    """One GAT update (interactive when `query` is not None).

    x: [B, G, D]; adj: [B, G, G] bool; query: [B, D] or None.
    out[i] = relu(sum_j alpha[i,j] h[j]) + x[i], softmax over neighbors j.
    """
    from digat_tpu.ops.pallas.runtime import pallas_available

    if (
        not train
        and query is not None
        and st.use_pallas
        and x.shape[1] >= _FUSED_LAYER_MIN_NODES
        and pallas_available()
    ):
        # fp32 and bf16 both take this path: the kernel upcasts to fp32 at
        # load, so bf16 only halves the HBM traffic (measured B=1024 G=68:
        # fused bf16 5.35 ms vs fused fp32 5.45 ms vs unfused bf16 6.99 ms)
        # inference: the whole layer (projections, Eq.(8) scores, masked
        # softmax, aggregation, residual) runs as one VMEM-resident kernel
        from digat_tpu.ops.pallas.gat_layer import interactive_gat_layer_fused

        return interactive_gat_layer_fused(
            x, adj, query,
            gat["W"]["w"][i], gat["W"]["b"][i],
            gat["ffn1"]["w"][i], gat["ffn2"]["w"][i],
            gat["ffn3"]["w"][i], gat["ffn3"]["b"][i],
            gat["a"]["w"][i, :, 0],
        )
    # NOTE: a fully-fused TRAINING-mode layer kernel (fwd+bwd pair) was
    # built, validated, and deleted after losing to this composed path on
    # v5e twice (round 2: 36.9 vs 22.1 ms graph fwd+bwd at B=320; round-3
    # re-analysis with fresh traces in docs/PERF.md). Its bwd recompute
    # fits the 16M scoped-VMEM limit only at tiny batch tiles (TB=2 on the
    # user graph), serializing the MXU projections XLA runs at full batch,
    # and a store-residuals variant trades ~3 ms of VPU recompute for
    # ~3 ms of HBM probs/activation round-trip — structurally a wash. The
    # composed path with the custom-VJP score kernel is the production
    # train path; see git history (ops/pallas/gat_layer_train.py) for the
    # kernel.
    r_in, r_alpha = jax.random.split(rng)
    x = L.dropout(r_in, x, st.dropout_rate / 2, train)
    if query is not None:
        # one [D, 3D] matmul for the three per-node projections: at the
        # training batch (320 rows) three separate [*, 400]x[400, 400]
        # products leave the MXU badly underutilized — the fused product
        # is mathematically identical (bias added to the W slice only).
        # A/B-measured (round 3): splitting back into three dense matmuls
        # to remove the minor-dim slices feeding the score custom-call is
        # SLOWER (56.6 vs 55.8 ms/step at B=64) — the slice relayouts cost
        # less than the lost matmul fusion.
        D = x.shape[-1]
        wcat = jnp.concatenate(
            [gat["W"]["w"][i], gat["ffn1"]["w"][i], gat["ffn2"]["w"][i]],
            axis=1,
        )
        y = x @ wcat
        h = y[..., :D] + gat["W"]["b"][i]
        k3 = L.stacked_linear(gat["ffn3"], i, query)
        a_vec = gat["a"]["w"][i, :, 0]
        if st.use_pallas and _FUSED_Y:
            # the kernel block-indexes k1/k2 out of y itself — no
            # non-lane-aligned slice relayouts feeding the custom call
            scores = interactive_gat_scores_fused_y(
                y, k3, a_vec, use_pallas=True
            )
        else:
            k1 = y[..., D : 2 * D]
            k2 = y[..., 2 * D :]
            scores = interactive_gat_scores(
                k1, k2, k3, a_vec, use_pallas=st.use_pallas
            )
    else:
        h = L.stacked_linear(gat["W"], i, x)
        scores = vanilla_gat_scores(h, gat["a1"]["w"][i, :, 0], gat["a2"]["w"][i, :, 0])
    e = jax.nn.leaky_relu(scores, negative_slope=0.2)
    alpha = L.masked_softmax(e, adj, axis=2)
    alpha = L.dropout(r_alpha, alpha, st.dropout_rate, train)
    return jax.nn.relu(jnp.einsum("bij,bjd->bid", alpha, h)) + x


def _user_graph_nodes(params, st, rng, train, user_news_embedding):
    """Concatenate history-news nodes with the (broadcast) topic nodes."""
    B = user_news_embedding.shape[0]
    topic = jnp.broadcast_to(
        params["topic_node_embedding"][None], (B, st.category_num, st.dim)
    )
    topic = L.dropout(rng, topic, st.dropout_rate / 2, train)
    return jnp.concatenate([user_news_embedding, topic], axis=1)


# ---------------------------------------------------------------------------
# Forward / inference per variant
# ---------------------------------------------------------------------------


def forward(
    params,
    st: GraphStatic,
    rng,
    train: bool,
    news_graph_embeddings,  # [B, Gn, D]
    news_graph,  # [B, Gn, Gn] bool
    news_graph_mask,  # [B, Gn]
    user_news_embedding,  # [B, H, D]
    user_graph,  # [B, Gu, Gu] bool
    user_category_mask,  # [B, C+1]
    user_category_indices,  # [B, H]
    c_n0=None,  # [B, D] cached initial news context (inference path)
):
    """Returns (news_representation, user_representation), both [B, D].

    When `c_n0` is given the initial news-graph context is not recomputed —
    this is the reference's `.inference()` (graphEncoders.py:189-198)."""
    v = st.variant
    rngs = iter(jax.random.split(rng, 6 + 4 * st.depth))

    user_x = _user_graph_nodes(
        params, st, next(rngs), train and c_n0 is None, user_news_embedding
    )

    if v == "wo_SA":
        # No news graph at all: candidate = node 0; user GAT conditioned on it.
        cand = news_graph_embeddings[:, 0, :]
        for i in range(st.depth):
            user_x = _gat_layer(
                params["user_gat"], i, st, next(rngs), train, user_x, user_graph, cand
            )
        c_u = user_graph_context(
            params["user_ctx"], st, next(rngs), train, user_x,
            user_category_mask, user_category_indices, cand,
        )
        return cand, c_u

    # Initial contexts
    if c_n0 is None:
        c_n = news_graph_context(
            params["news_ctx"], st, next(rngs), train, news_graph_embeddings,
            news_graph_mask,
        )
    else:
        c_n = c_n0
    c_u = user_graph_context(
        params["user_ctx"], st, next(rngs), train, user_x,
        user_category_mask, user_category_indices, c_n,
    )

    if v == "Seq_SA":
        # SA news as a sequence: only the user graph is iterated; the news
        # context stays fixed (graphEncoders.py:390-407).
        for i in range(st.depth):
            user_x = _gat_layer(
                params["user_gat"], i, st, next(rngs), train, user_x, user_graph, c_n
            )
            c_u = c_u + user_graph_context(
                params["user_ctx"], st, next(rngs), train, user_x,
                user_category_mask, user_category_indices, c_n,
            )
        return c_n, c_u

    news_interactive = v in ("DIGAT", "user_graph_wo_inter")
    user_interactive = v in ("DIGAT", "news_graph_wo_inter")
    news_x = news_graph_embeddings
    for i in range(st.depth):
        news_x = _gat_layer(
            params["news_gat"], i, st, next(rngs), train, news_x, news_graph,
            c_u if news_interactive else None,
        )
        user_x = _gat_layer(
            params["user_gat"], i, st, next(rngs), train, user_x, user_graph,
            c_n if user_interactive else None,
        )
        c_n = c_n + news_graph_context(
            params["news_ctx"], st, next(rngs), train, news_x, news_graph_mask
        )
        c_u = c_u + user_graph_context(
            params["user_ctx"], st, next(rngs), train, user_x,
            user_category_mask, user_category_indices, c_n,
        )
    return c_n, c_u


def initial_news_context(params, st: GraphStatic, news_graph_embeddings, news_graph_mask):
    """Stage-1 cache: the initial news context c_n0 for every unique news
    (reference: util.py:38-50). Eval-mode (no dropout)."""
    if st.variant == "wo_SA":
        return news_graph_embeddings[:, 0, :]
    rng = jax.random.PRNGKey(0)  # unused: train=False
    return news_graph_context(
        params["news_ctx"], st, rng, False, news_graph_embeddings, news_graph_mask
    )
