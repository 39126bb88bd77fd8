"""Model assembly: news encoder ∘ graph encoder ∘ dot-product scorer.

Functional equivalent of the reference's Model (model.py:7-90), with a
TPU-first data path: the training step takes *index* batches plus
device-resident corpus tables (tokenized titles, SAG node ids / adjacency)
and performs every gather on device inside jit — replacing the reference's
multiprocess DataLoader host gathers. The dense-tensor entry point
(`forward`) matching the reference signature is kept for oracle tests and
for callers that already hold gathered tensors.

Two-stage cached inference (`inference`) mirrors model.py:87-90: it consumes
pre-encoded news representations and a cached initial news context c_n0.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from digat_tpu.config import Config
from digat_tpu.data.user_graph import build_user_graph
from digat_tpu.models import graph_encoders as G
from digat_tpu.models import news_encoders as N


class CorpusTables(NamedTuple):
    """Device-resident corpus arrays shared by every step."""

    news_title_text: jnp.ndarray  # [news_num, L] int32
    news_title_mask: jnp.ndarray  # [news_num, L] bool
    news_node_id: jnp.ndarray  # [news_num, Gn] int32 (SAG node ids)
    news_graph: jnp.ndarray  # [news_num, Gn, Gn] bool (self-loops added)
    news_graph_mask: jnp.ndarray  # [news_num, Gn] bool (slot 0 zeroed)


class TrainBatch(NamedTuple):
    """Index-only training batch (host->device traffic is a few KB/sample)."""

    history_idx: jnp.ndarray  # [B, H] int32 news ids (0 = pad)
    cat_idx: jnp.ndarray  # [B, H] int32 category per slot (C = pad)
    sample_idx: jnp.ndarray  # [B, 1+K] int32 candidate news ids (pos first)
    weight: jnp.ndarray  # [B] float32 (0 for padding rows of last batch)


class DedupTrainBatch(NamedTuple):
    """Training batch with host-side title deduplication: every unique news
    in the batch (candidate-graph nodes + histories) is listed once in
    `uniq_ids`; the encoder runs once per unique title and inverse-index
    gathers fan the representations out. Mathematically identical to
    TrainBatch (the gather VJP scatter-adds the gradients), but the
    HBM-bound encoder work drops by the duplication factor.

    `emb` optionally carries host-computed sort metadata
    (ops.pallas.emb_grad.EmbGradMeta) for the batch's token stream
    `news_title_text[uniq_ids]`; when present, the word-embedding gradient
    runs through the sorted row-sum kernel instead of an XLA scatter."""

    uniq_ids: jnp.ndarray  # [U] int32 news ids (0-padded)
    cand_inv: jnp.ndarray  # [B, 1+K, Gn] int32 indices into uniq
    hist_inv: jnp.ndarray  # [B, H] int32 indices into uniq
    cat_idx: jnp.ndarray  # [B, H] int32
    sample_idx: jnp.ndarray  # [B, 1+K] int32 (graphs/masks gather)
    weight: jnp.ndarray  # [B] float32
    emb: Optional[tuple] = None  # EmbGradMeta or None


class ShardedDedupBatch(NamedTuple):
    """Per-shard unique-title dedup for the shard_map data-parallel step:
    every leaf of a DedupTrainBatch stacked on a leading shard axis [S, ...]
    (shard i's rows are batch rows [i*B/S, (i+1)*B/S)). Sharding the leading
    axis along `data` hands each device its own batch-local unique-title
    table, so the multi-device step keeps the encode-once dedup win and the
    sorted embedding gradient without any cross-shard title exchange."""

    uniq_ids: jnp.ndarray  # [S, cap]
    cand_inv: jnp.ndarray  # [S, B/S, 1+K, Gn]
    hist_inv: jnp.ndarray  # [S, B/S, H]
    cat_idx: jnp.ndarray  # [S, B/S, H]
    sample_idx: jnp.ndarray  # [S, B/S, 1+K]
    weight: jnp.ndarray  # [S, B/S]
    emb: Optional[tuple] = None  # EmbGradMeta leaves stacked [S, ...]

    def local(self):
        """The shard-local DedupTrainBatch (inside shard_map, S == 1)."""
        take = lambda x: x[0]
        emb = None if self.emb is None else jax.tree.map(take, self.emb)
        return DedupTrainBatch(
            uniq_ids=take(self.uniq_ids), cand_inv=take(self.cand_inv),
            hist_inv=take(self.hist_inv), cat_idx=take(self.cat_idx),
            sample_idx=take(self.sample_idx), weight=take(self.weight),
            emb=emb,
        )


class EvalBatch(NamedTuple):
    """Stage-2 eval batch: one impression item per row."""

    history_idx: jnp.ndarray  # [B, H] int32
    cat_idx: jnp.ndarray  # [B, H] int32
    cand_idx: jnp.ndarray  # [B] int32 candidate news id


class Model:
    """Bundles static configuration; all apply methods are pure functions."""

    family = "digat"

    def __init__(self, config: Config):
        config.validate()
        self.config = config
        self.news_st = N.NewsStatic(
            encoder=config.news_encoder,
            vocab_size=config.vocabulary_size,
            word_dim=config.word_embedding_dim,
            dim=config.news_embedding_dim,
            max_title_length=config.max_title_length,
            dropout_rate=config.dropout_rate,
            cnn_method=config.cnn_method,
            cnn_window_size=config.cnn_window_size,
            msa_heads=config.MSA_head_num,
            attention_dim=config.attention_dim,
            compute_dtype=config.compute_dtype,
            use_pallas=config.use_pallas,
        )
        self.graph_st = G.GraphStatic(
            variant=config.graph_encoder,
            depth=config.graph_depth,
            max_history_num=config.max_history_num,
            category_num=config.category_num,
            dim=config.news_embedding_dim,
            dropout_rate=config.dropout_rate,
            use_pallas=config.use_pallas,
        )
        self.model_name = config.model_name

    # ------------------------------------------------------------------
    def init(self, key, word_embedding=None):
        k_news, k_graph = jax.random.split(key)
        return {
            "news_encoder": N.init(k_news, self.news_st, word_embedding),
            "graph_encoder": G.init(k_graph, self.graph_st),
        }

    def param_template(self):
        """Abstract param pytree (structure only) for checkpoint restore."""
        return jax.eval_shape(lambda k: self.init(k), jax.random.PRNGKey(0))

    # ------------------------------------------------------------------
    def forward(
        self,
        params,
        rng,
        train: bool,
        user_title_text,  # [B, H, L]
        user_title_mask,  # [B, H, L]
        user_graph,  # [B, Gu, Gu]
        user_category_mask,  # [B, C+1]
        user_category_indices,  # [B, H]
        news_title_text,  # [B, N, Gn, L]
        news_title_mask,  # [B, N, Gn, L]
        news_graph,  # [B, N, Gn, Gn]
        news_graph_mask,  # [B, N, Gn]
    ):
        """Dense-tensor forward -> logits [B, N] (reference model.py:54-77)."""
        r_news, r_user, r_graph = jax.random.split(rng, 3)

        cand = N.encode(
            params["news_encoder"], self.news_st, r_news, train,
            news_title_text, news_title_mask,
        )  # [B, N, Gn, D]
        hist = N.encode(
            params["news_encoder"], self.news_st, r_user, train,
            user_title_text, user_title_mask,
        )  # [B, H, D]
        return self.forward_encoded(
            params, r_graph, train, cand, hist, user_graph,
            user_category_mask, user_category_indices, news_graph,
            news_graph_mask,
        )

    def forward_encoded(
        self,
        params,
        r_graph,
        train: bool,
        cand,  # [B, N, Gn, D] encoded candidate-graph nodes
        hist,  # [B, H, D] encoded history
        user_graph,
        user_category_mask,
        user_category_indices,
        news_graph,
        news_graph_mask,
    ):
        B, Nn = cand.shape[:2]
        flat = lambda x: x.reshape((B * Nn,) + x.shape[2:])
        rep = lambda x: jnp.broadcast_to(
            x[:, None], (B, Nn) + x.shape[1:]
        ).reshape((B * Nn,) + x.shape[1:])

        news_rep, user_rep = G.forward(
            params["graph_encoder"], self.graph_st, r_graph, train,
            flat(cand), flat(news_graph), flat(news_graph_mask),
            rep(hist), rep(user_graph), rep(user_category_mask),
            rep(user_category_indices),
        )
        acc = jnp.promote_types(news_rep.dtype, jnp.float32)
        logits = jnp.sum(
            news_rep.reshape(B, Nn, -1).astype(acc)
            * user_rep.reshape(B, Nn, -1).astype(acc),
            axis=-1,
        )
        return logits

    # ------------------------------------------------------------------
    def forward_indexed(self, params, tables: CorpusTables, batch,
                        rng, train: bool):
        """Index-batch forward: gathers titles/graphs on device, rebuilds the
        user graph from compact category indices, then runs `forward`.
        Accepts TrainBatch or DedupTrainBatch (unique-title encoding)."""
        cfg = self.config
        news_graph = tables.news_graph[batch.sample_idx]  # [B, N, Gn, Gn]
        news_graph_mask = tables.news_graph_mask[batch.sample_idx]
        user_graph, user_category_mask = build_user_graph(
            batch.cat_idx, cfg.max_history_num, cfg.category_num
        )
        if isinstance(batch, DedupTrainBatch):
            # NOTE: dropout masks inside the encoder are shared across
            # occurrences of the same title (the reference re-draws per
            # occurrence); eval math is identical, training noise marginally
            # more correlated.
            r_enc, r_graph = jax.random.split(rng)
            uniq_reps = N.encode(
                params["news_encoder"], self.news_st, r_enc, train,
                tables.news_title_text[batch.uniq_ids],
                tables.news_title_mask[batch.uniq_ids],
                emb_meta=batch.emb,
            )  # [U, D]
            cand = uniq_reps[batch.cand_inv]  # [B, N, Gn, D]
            hist = uniq_reps[batch.hist_inv]  # [B, H, D]
            return self.forward_encoded(
                params, r_graph, train, cand, hist, user_graph,
                user_category_mask, batch.cat_idx, news_graph, news_graph_mask,
            )
        node_ids = tables.news_node_id[batch.sample_idx]  # [B, N, Gn]
        return self.forward(
            params, rng, train,
            tables.news_title_text[batch.history_idx],
            tables.news_title_mask[batch.history_idx],
            user_graph, user_category_mask, batch.cat_idx,
            tables.news_title_text[node_ids], tables.news_title_mask[node_ids],
            news_graph, news_graph_mask,
        )

    # ------------------------------------------------------------------
    def inference(
        self,
        params,
        user_news_embedding,  # [B, H, D] cached
        user_graph,  # [B, Gu, Gu]
        user_category_mask,  # [B, C+1]
        user_category_indices,  # [B, H]
        candidate_news_embedding,  # [B, Gn, D] cached SAG node reps
        news_graph,  # [B, Gn, Gn]
        news_graph_mask,  # [B, Gn]
        c_n0,  # [B, D] cached initial news context
    ):
        """Two-stage cached scoring -> logits [B] (reference model.py:87-90)."""
        rng = jax.random.PRNGKey(0)  # eval: dropout disabled
        news_rep, user_rep = G.forward(
            params["graph_encoder"], self.graph_st, rng, False,
            candidate_news_embedding, news_graph, news_graph_mask,
            user_news_embedding, user_graph, user_category_mask,
            user_category_indices, c_n0=c_n0,
        )
        acc = jnp.promote_types(news_rep.dtype, jnp.float32)
        return jnp.sum(news_rep.astype(acc) * user_rep.astype(acc), axis=-1)

    # ------------------------------------------------------------------
    def encode_news(self, params, title_text, title_mask):
        """Stage-1 cache: encode unique news titles (eval mode)."""
        rng = jax.random.PRNGKey(0)
        return N.encode(
            params["news_encoder"], self.news_st, rng, False, title_text, title_mask
        )

    def initial_news_context(self, params, sag_embeddings, news_graph_mask):
        return G.initial_news_context(
            params["graph_encoder"], self.graph_st, sag_embeddings, news_graph_mask
        )

    # ------------------------------------------------------------------
    def cast_params(self, params):
        """Mixed precision: compute-copy of the params in bfloat16 (master
        weights stay fp32 in the optimizer; the cast is differentiable so
        gradients flow back in fp32)."""
        if self.config.compute_dtype != "bfloat16":
            return params
        return jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32
            else x,
            params,
        )

    def loss_parts(self, params, tables: CorpusTables, batch: TrainBatch, rng):
        """(weighted NLL sum, weight sum) — the two reduction terms of the
        listwise loss, separated so a data-parallel shard_map step can psum
        each across shards before dividing."""
        logits = self.forward_indexed(
            self.cast_params(params), tables, batch, rng, train=True
        )
        acc = jnp.promote_types(logits.dtype, jnp.float32)
        nll = -jax.nn.log_softmax(logits.astype(acc), axis=1)[:, 0]
        w = batch.weight.astype(acc)
        return jnp.sum(nll * w), jnp.sum(w)

    def loss(self, params, tables: CorpusTables, batch: TrainBatch, rng):
        """Listwise sampled-softmax NLL (reference trainer.py:100), with
        per-row weights so padded tail batches contribute nothing."""
        num, den = self.loss_parts(params, tables, batch, rng)
        return num / jnp.maximum(den, 1.0)
