"""NRMS / NRMS-SA model family (the reference's Appendix-B capability).

The semantic-augmentation (SA) strategy applied to a pure sequence model —
no graphs. Functional equivalents of Appendix-B/newsEncoders.py:34-103,
Appendix-B/userEncoders.py:34-52, Appendix-B/model.py:7-31:

  * NRMS news encoder: GloVe words -> dropout -> *masked* multi-head
    self-attention -> dropout -> masked tanh-MLP attention pooling;
  * SA_NRMS news encoder: the same tower also encodes the top-M
    semantically-augmented neighbor titles, attends over them with the
    original rep as query, and fuses via a sigmoid gate (dropout p/2 on
    the gate logits);
  * NRMS user encoder: masked MHA over the 50 history reps, then an
    *unmasked* attention pool (the reference pools without the mask,
    Appendix-B/userEncoders.py:46);
  * dot-product scoring with the same listwise loss.

Eval uses dual caches (plain reps for history, SA-fused reps for
candidates), mirroring Appendix-B/util.py:20-55.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from digat_tpu import layers as L
from digat_tpu.config import Config


class NRMSStatic(NamedTuple):
    sa: bool  # NRMS-SA vs plain NRMS
    vocab_size: int
    word_dim: int
    heads: int
    dim: int  # heads * head_dim
    max_title_length: int
    max_history_num: int
    augmented_news_num: int
    attention_dim: int
    dropout_rate: float
    use_pallas: bool = False


class NRMSModel:
    """Duck-type compatible with models.Model for the trainer; family-
    specific tables/eval handled by eval.scorer.compute_scores."""

    family = "nrms"

    def __init__(self, config: Config):
        self.config = config
        self.st = NRMSStatic(
            sa=config.nrms_model == "NRMS-SA",
            vocab_size=config.vocabulary_size,
            word_dim=config.word_embedding_dim,
            heads=config.nrms_head_num,
            dim=config.nrms_head_num * config.nrms_head_dim,
            max_title_length=config.max_title_length,
            max_history_num=config.max_history_num,
            augmented_news_num=config.augmented_news_num,
            attention_dim=config.nrms_attention_dim,
            dropout_rate=config.dropout_rate,
            use_pallas=config.use_pallas,
        )
        self.model_name = "NRMS-SA" if self.st.sa else "NRMS"

    # ------------------------------------------------------------------
    def init(self, key, word_embedding=None):
        st = self.st
        keys = jax.random.split(key, 6)
        if word_embedding is None:
            word_embedding = jax.random.normal(keys[0], (st.vocab_size, st.word_dim))
        head_dim = st.dim // st.heads
        params = {
            "word_embedding": jnp.asarray(word_embedding, jnp.float32),
            "news_msa": L.mha_init(keys[1], st.heads, st.word_dim, head_dim, head_dim),
            "news_pool": L.attn_pool_init(keys[2], st.dim, st.attention_dim),
            "user_msa": L.mha_init(keys[3], st.heads, st.dim, head_dim, head_dim),
            "user_pool": L.attn_pool_init(keys[4], st.dim, st.attention_dim),
        }
        if st.sa:
            k_a, k_g = jax.random.split(keys[5])
            params["sa_attn"] = L.sdp_attn_init(k_a, st.dim, st.dim, st.dim)
            params["sa_gate"] = L.linear_init(
                k_g, 2 * st.dim, st.dim, init="xavier", bias_init="zeros"
            )
        return params

    def param_template(self):
        return jax.eval_shape(lambda k: self.init(k), jax.random.PRNGKey(0))

    def cast_params(self, params):
        """Mixed precision compute-copy (see Model.cast_params)."""
        if self.config.compute_dtype != "bfloat16":
            return params
        return jax.tree.map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
            params,
        )

    # ------------------------------------------------------------------
    def _encode_titles(self, params, st, rng, train, title_text, title_mask):
        """Shared NRMS title tower -> [..., dim]."""
        r1, r2 = jax.random.split(rng)
        w = params["word_embedding"][title_text]
        w = L.dropout(r1, w, st.dropout_rate, train)
        lead = w.shape[:-2]
        w2 = w.reshape((-1, st.max_title_length, st.word_dim))
        m2 = title_mask.reshape((-1, st.max_title_length))
        c = L.mha(params["news_msa"], w2, st.heads, key_mask=m2,
                  use_pallas=st.use_pallas)
        c = L.dropout(r2, c, st.dropout_rate, train)
        return L.attn_pool(params["news_pool"], c, mask=m2).reshape(*lead, st.dim)

    def _fuse_sa(self, params, st, rng, train, original, augmented):
        """original: [..., D]; augmented: [..., M, D] -> gated fusion."""
        att = L.sdp_attn(params["sa_attn"], augmented, original, mask=None)
        gate_logits = L.linear(
            params["sa_gate"], jnp.concatenate([original, att], axis=-1)
        )
        gate_logits = L.dropout(rng, gate_logits, st.dropout_rate / 2, train)
        gate = jax.nn.sigmoid(gate_logits)
        return gate * original + (1.0 - gate) * att

    def encode_news(self, params, rng, train, title_text, title_mask,
                    aug_title_text=None, aug_title_mask=None):
        """[..., L] titles (+ optional [..., M, L] augmented) -> [..., D]."""
        st = self.st
        r1, r2, r3 = jax.random.split(rng, 3)
        rep = self._encode_titles(params, st, r1, train, title_text, title_mask)
        if st.sa and aug_title_text is not None:
            aug = self._encode_titles(
                params, st, r2, train, aug_title_text, aug_title_mask
            )
            rep = self._fuse_sa(params, st, r3, train, rep, aug)
        return rep

    def encode_user(self, params, history_reps, history_mask):
        """[B, H, D] cached/fresh history reps -> [B, D]. Masked MHA, then
        the reference's unmasked pooling."""
        h = L.mha(
            params["user_msa"], history_reps, self.st.heads,
            key_mask=history_mask, use_pallas=self.st.use_pallas,
        )
        return L.attn_pool(params["user_pool"], h, mask=None)

    # ------------------------------------------------------------------
    def forward_indexed(self, params, tables, batch, rng, train: bool):
        """tables: NRMSTables; batch: models.model.TrainBatch (cat_idx
        unused by this family). Returns logits [B, 1+K]."""
        st = self.st
        r_news, r_user = jax.random.split(rng)
        cand_text = tables.news_title_text[batch.sample_idx]  # [B, N, L]
        cand_mask = tables.news_title_mask[batch.sample_idx]
        aug_text = aug_mask = None
        if st.sa:
            aug_ids = tables.augmented_news[batch.sample_idx]  # [B, N, M]
            aug_text = tables.news_title_text[aug_ids]  # [B, N, M, L]
            aug_mask = tables.news_title_mask[aug_ids]
        news_rep = self.encode_news(
            params, r_news, train, cand_text, cand_mask, aug_text, aug_mask
        )  # [B, N, D]
        hist_text = tables.news_title_text[batch.history_idx]  # [B, H, L]
        hist_mask = tables.news_title_mask[batch.history_idx]
        hist_rep = self._encode_titles(
            params, st, r_user, train, hist_text, hist_mask
        )
        history_mask = batch.history_idx != 0  # pad news id 0
        user_rep = self.encode_user(params, hist_rep, history_mask)
        return jnp.einsum(
            "bnd,bd->bn",
            news_rep.astype(jnp.float32),
            user_rep.astype(jnp.float32),
        )

    def loss_parts(self, params, tables, batch, rng):
        """(weighted NLL sum, weight sum) for data-parallel psum reduction."""
        logits = self.forward_indexed(
            self.cast_params(params), tables, batch, rng, train=True
        )
        nll = -jax.nn.log_softmax(logits.astype(jnp.float32), axis=1)[:, 0]
        w = batch.weight
        return jnp.sum(nll * w), jnp.sum(w)

    def loss(self, params, tables, batch, rng):
        num, den = self.loss_parts(params, tables, batch, rng)
        return num / jnp.maximum(den, 1.0)


class NRMSTables(NamedTuple):
    news_title_text: jnp.ndarray  # [news_num, L] int32
    news_title_mask: jnp.ndarray  # [news_num, L] bool
    augmented_news: jnp.ndarray  # [news_num, M] int32 (0-padded)
