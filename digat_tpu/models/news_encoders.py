"""News title encoders: CNN and multi-head self-attention (MSA).

Functional equivalents of the reference's newsEncoders.py:29-82. Both embed
title tokens from a GloVe-initialized table, apply dropout on the word
embeddings, encode (conv bank + relu or MSA + relu), and aggregate with a
masked tanh-MLP attention pool. The MSA softmax is *unmasked* (pads attend),
matching the reference's main-variant MultiHeadAttention (layers.py:75-88);
only the pooling step masks pads.

The word-embedding table is a single [V, 300] parameter suitable for
row-sharding across a `model` mesh axis (XLA SPMD inserts the gather
collectives automatically).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from digat_tpu import layers as L


class NewsStatic(NamedTuple):
    encoder: str  # CNN | MSA
    vocab_size: int
    word_dim: int
    dim: int  # news embedding dim (cnn_kernel_num or heads*head_dim)
    max_title_length: int
    dropout_rate: float
    cnn_method: str = "naive"
    cnn_window_size: int = 3
    msa_heads: int = 16
    attention_dim: int = 256
    compute_dtype: str = "float32"
    use_pallas: bool = False


def init(key, st: NewsStatic, word_embedding=None):
    """`word_embedding`: optional [V, word_dim] GloVe-initialized matrix."""
    k_emb, k_enc, k_pool = jax.random.split(key, 3)
    if word_embedding is None:
        word_embedding = jax.random.normal(k_emb, (st.vocab_size, st.word_dim))
    params = {
        "word_embedding": jnp.asarray(word_embedding, jnp.float32),
        "pool": L.attn_pool_init(k_pool, st.dim, st.attention_dim),
    }
    if st.encoder == "CNN":
        params["conv"] = L.conv1d_bank_init(
            k_enc, st.cnn_method, st.word_dim, st.dim, st.cnn_window_size
        )
    else:
        head_dim = st.dim // st.msa_heads
        params["msa"] = L.mha_init(k_enc, st.msa_heads, st.word_dim, head_dim, head_dim)
    return params


def encode(params, st: NewsStatic, rng, train: bool, title_text, title_mask,
           emb_meta=None):
    """title_text: [..., L] int32, title_mask: [..., L] -> [..., dim].

    Works for any leading batch shape ([B, N, L], [B, N, G, L], ...).
    `emb_meta`: optional sorted-gradient metadata for exactly this
    title_text (ops.pallas.emb_grad) — same forward, scatter-free backward."""
    r_emb, r_enc = jax.random.split(rng)
    if emb_meta is not None:
        from digat_tpu.ops.pallas.emb_grad import embedding_lookup

        w = embedding_lookup(params["word_embedding"], title_text, emb_meta)
    else:
        w = params["word_embedding"][title_text]  # [..., L, word_dim]
    # the fused MSA path applies the word-embedding dropout inside the
    # kernel (on-core PRNG; the mask never round-trips HBM) — skip the XLA
    # dropout there and pass the rate + a seed derived from the same key
    fused_msa = False
    from digat_tpu.ops.pallas.runtime import pallas_available

    if st.encoder != "CNN" and st.use_pallas and pallas_available():
        from digat_tpu.ops.pallas.msa_attention_grouped import group_size

        fused_msa = group_size(
            st.msa_heads, st.max_title_length, st.dim // st.msa_heads
        ) > 0
    # in-kernel dropout draws from the on-core PRNG (pltpu.prng_seed),
    # which has no interpret-mode lowering — off-TPU (interpret validation)
    # the word-embedding dropout stays in XLA and the kernel runs rate 0
    fused_drop = (fused_msa and train and st.dropout_rate > 0.0
                  and jax.default_backend() == "tpu")
    if not fused_drop:
        w = L.dropout(r_emb, w, st.dropout_rate, train)
    lead = w.shape[:-2]
    w2 = w.reshape((-1, st.max_title_length, st.word_dim))
    mask2 = title_mask.reshape((-1, st.max_title_length))
    if st.encoder == "CNN":
        h = L.conv1d_bank(params["conv"], w2, st.cnn_method, st.cnn_window_size)
        h = L.dropout(r_enc, h, st.dropout_rate, train)
        pooled = L.attn_pool(params["pool"], h, mask=mask2)
        return pooled.reshape(*lead, st.dim)
    cd = jnp.bfloat16 if st.compute_dtype == "bfloat16" else None
    dv = st.dim // st.msa_heads
    if fused_msa:
        from digat_tpu.ops.pallas.msa_attention_grouped import unpad_heads

        # whole post-embedding pipeline (dropout, projections, attention,
        # relu, masked pool) as one fused VMEM-resident kernel
        from digat_tpu.ops.pallas.msa_encoder import msa_encoder_pooled

        seed = None
        if fused_drop:
            seed = jax.random.randint(
                r_emb, (1,), 0, jnp.iinfo(jnp.int32).max, jnp.int32
            )
        # train: DEFAULT-precision attention products (the unfused XLA
        # fp32 path's accuracy class, 1.5x faster); eval: auto (exact
        # fp32 class) so cached representations don't drift
        pooled, _ = msa_encoder_pooled(
            w2, mask2, params["msa"], params["pool"], st.msa_heads, dv,
            precision="default" if train else "auto",
            dropout_rate=st.dropout_rate if fused_drop else 0.0,
            dropout_seed=seed,
        )
        pooled = unpad_heads(pooled, st.msa_heads, dv)
        return pooled.reshape(*lead, st.dim)
    h, dv_stride = L.mha(params["msa"], w2, st.msa_heads, compute_dtype=cd,
                         use_pallas=st.use_pallas, return_padded=True)
    h = jax.nn.relu(h)
    dv = st.dim // st.msa_heads
    if dv_stride == dv:
        pooled = L.attn_pool(params["pool"], h, mask=mask2)
        return pooled.reshape(*lead, st.dim)
    # head-padded layout from the grouped kernel: relu and pooling run on
    # the padded lanes (zero-padding the pool's first affine row-wise makes
    # the attention logits identical), and the unpad relayout happens on the
    # pooled [N, dim] tensor — L x smaller than unpadding h itself.
    from digat_tpu.ops.pallas.msa_attention_grouped import unpad_heads

    pool_p = dict(params["pool"])
    w1 = pool_p["affine1"]["w"]  # [dim, attention_dim]
    w1p = jnp.pad(
        w1.reshape(st.msa_heads, dv, -1),
        ((0, 0), (0, dv_stride - dv), (0, 0)),
    ).reshape(st.msa_heads * dv_stride, -1)
    pool_p["affine1"] = {**params["pool"]["affine1"], "w": w1p}
    pooled = L.attn_pool(pool_p, h, mask=mask2)
    pooled = unpad_heads(pooled, st.msa_heads, dv)
    return pooled.reshape(*lead, st.dim)
