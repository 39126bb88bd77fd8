"""TPU-native MPNet sentence encoder (JAX) for SAG mining.

The reference mines SAG neighbors with a frozen `all-mpnet-base-v2`
SentenceTransformer on GPU (reference: construct_SAG.py:97-99). This module
re-hosts that encoder on TPU: a pure-JAX MPNet forward over a param pytree,
a converter from the HuggingFace torch checkpoint, and the
sentence-transformers pooling recipe (attention-mask mean pooling + L2
normalize). Everything jits; batches pad to a static sequence length so one
compiled program serves the whole corpus sweep.

Architecture notes (behavior-matched to transformers' modeling_mpnet.py,
verified by tests/test_mpnet.py against a randomly-initialized torch model):

  * RoBERTa-style absolute position ids: pad_token_id=1, real tokens get
    cumsum(mask)+1;
  * a single relative-attention-bias embedding [32 buckets, heads] shared
    by every layer, T5-style bidirectional bucketing (max_distance 128),
    added to the pre-softmax scores;
  * post-LayerNorm residual blocks (attention -> LN, GELU FFN -> LN);
  * additive key mask (1-mask)*finfo.min.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

PADDING_IDX = 1  # MPNet pad_token_id (modeling_mpnet.py MPNetEmbeddings)
NUM_BUCKETS = 32
MAX_DISTANCE = 128


@dataclass(frozen=True)
class MPNetConfig:
    vocab_size: int = 30527
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 514
    layer_norm_eps: float = 1e-5


# ---------------------------------------------------------------------------
# Weight conversion
# ---------------------------------------------------------------------------


def convert_hf_state_dict(state: Dict[str, "np.ndarray"]) -> dict:
    """HF torch `MPNetModel.state_dict()` -> JAX param pytree.

    Accepts tensors or numpy arrays. Linear weights transpose to the
    [d_in, d_out] convention (apply is x @ W + b). Per-layer tensors stack
    on a leading depth axis so the layer loop is a compact indexed sweep.
    """
    g = {k: np.asarray(v) for k, v in state.items()}

    def lin(prefix):
        return {"w": g[f"{prefix}.weight"].T.copy(),
                "b": g[f"{prefix}.bias"].copy()}

    def ln(prefix):
        return {"scale": g[f"{prefix}.weight"].copy(),
                "bias": g[f"{prefix}.bias"].copy()}

    n_layers = 0
    while f"encoder.layer.{n_layers}.attention.attn.q.weight" in g:
        n_layers += 1

    def stack(make):
        leaves = [make(i) for i in range(n_layers)]
        return jax.tree.map(lambda *xs: np.stack(xs), *leaves)

    return {
        "word_embeddings": g["embeddings.word_embeddings.weight"].copy(),
        "position_embeddings": g["embeddings.position_embeddings.weight"].copy(),
        "emb_ln": ln("embeddings.LayerNorm"),
        "rel_bias": g["encoder.relative_attention_bias.weight"].copy(),
        "layers": {
            "q": stack(lambda i: lin(f"encoder.layer.{i}.attention.attn.q")),
            "k": stack(lambda i: lin(f"encoder.layer.{i}.attention.attn.k")),
            "v": stack(lambda i: lin(f"encoder.layer.{i}.attention.attn.v")),
            "o": stack(lambda i: lin(f"encoder.layer.{i}.attention.attn.o")),
            "attn_ln": stack(lambda i: ln(f"encoder.layer.{i}.attention.LayerNorm")),
            "ffn1": stack(lambda i: lin(f"encoder.layer.{i}.intermediate.dense")),
            "ffn2": stack(lambda i: lin(f"encoder.layer.{i}.output.dense")),
            "out_ln": stack(lambda i: ln(f"encoder.layer.{i}.output.LayerNorm")),
        },
    }


def config_from_params(params: dict) -> MPNetConfig:
    V, D = params["word_embeddings"].shape
    depth, _, HD = np.shape(params["layers"]["q"]["w"])
    heads = np.shape(params["rel_bias"])[1]
    return MPNetConfig(
        vocab_size=V, hidden_size=D, num_layers=depth, num_heads=heads,
        intermediate_size=np.shape(params["layers"]["ffn1"]["w"])[2],
        max_position_embeddings=params["position_embeddings"].shape[0],
    )


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _layer_norm(p, x, eps):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def relative_position_bucket(relative_position, num_buckets=NUM_BUCKETS,
                             max_distance=MAX_DISTANCE):
    """T5-style bidirectional bucketing (modeling_mpnet.py
    MPNetEncoder.relative_position_bucket)."""
    n = -relative_position
    num_buckets //= 2
    ret = (n < 0).astype(jnp.int32) * num_buckets
    n = jnp.abs(n)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact)
        / math.log(max_distance / max_exact) * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_if_large)


def _position_bias(rel_bias, L):
    pos = jnp.arange(L)
    rel = pos[None, :] - pos[:, None]  # memory - context
    bucket = relative_position_bucket(rel)
    return rel_bias[bucket].transpose(2, 0, 1)  # [heads, L, L]


def encode(params, input_ids, attention_mask, cfg: MPNetConfig = None,
           compute_dtype=jnp.float32):
    """input_ids [B, L] int32, attention_mask [B, L] {0,1} ->
    L2-normalized sentence embeddings [B, hidden] (the
    sentence-transformers mean-pool + normalize recipe)."""
    if cfg is None:
        cfg = config_from_params(params)
    eps = cfg.layer_norm_eps
    H = cfg.num_heads
    Dh = cfg.hidden_size // H
    B, L = input_ids.shape
    mask = attention_mask.astype(jnp.float32)

    # RoBERTa-style position ids: pads stay at padding_idx
    m = (input_ids != PADDING_IDX).astype(jnp.int32)
    pos_ids = jnp.cumsum(m, axis=1) * m + PADDING_IDX

    x = params["word_embeddings"][input_ids] + \
        params["position_embeddings"][pos_ids]
    x = _layer_norm(params["emb_ln"], x, eps)
    x = x.astype(compute_dtype)

    bias = _position_bias(params["rel_bias"], L)  # [H, L, L]
    # additive key mask, HF convention (1 - mask) * finfo.min
    neg = jnp.finfo(jnp.float32).min
    amask = (1.0 - mask)[:, None, None, :] * neg  # [B, 1, 1, L]
    scores_extra = (bias[None] + amask).astype(jnp.float32)  # [B, H, L, L]

    lp = params["layers"]

    def layer(x, i):
        q = (x @ lp["q"]["w"][i].astype(compute_dtype)
             + lp["q"]["b"][i]).reshape(B, L, H, Dh)
        k = (x @ lp["k"]["w"][i].astype(compute_dtype)
             + lp["k"]["b"][i]).reshape(B, L, H, Dh)
        v = (x @ lp["v"]["w"][i].astype(compute_dtype)
             + lp["v"]["b"][i]).reshape(B, L, H, Dh)
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(Dh)
        s = s.astype(jnp.float32) + scores_extra
        a = jax.nn.softmax(s, axis=-1).astype(compute_dtype)
        c = jnp.einsum("bhqk,bkhd->bqhd", a, v).reshape(B, L, H * Dh)
        o = c @ lp["o"]["w"][i].astype(compute_dtype) + lp["o"]["b"][i]
        x = _layer_norm(
            jax.tree.map(lambda t: t[i], lp["attn_ln"]),
            (o + x).astype(jnp.float32), eps,
        ).astype(compute_dtype)
        h = jax.nn.gelu(
            x @ lp["ffn1"]["w"][i].astype(compute_dtype) + lp["ffn1"]["b"][i],
            approximate=False,
        )
        y = h @ lp["ffn2"]["w"][i].astype(compute_dtype) + lp["ffn2"]["b"][i]
        x = _layer_norm(
            jax.tree.map(lambda t: t[i], lp["out_ln"]),
            (y + x).astype(jnp.float32), eps,
        ).astype(compute_dtype)
        return x

    for i in range(cfg.num_layers):
        x = layer(x, i)

    x = x.astype(jnp.float32)
    # sentence-transformers mean pooling over real tokens, then L2 normalize
    summed = jnp.einsum("bld,bl->bd", x, mask)
    counts = jnp.maximum(jnp.sum(mask, axis=1, keepdims=True), 1e-9)
    emb = summed / counts
    return emb / jnp.maximum(jnp.linalg.norm(emb, axis=1, keepdims=True), 1e-12)


# ---------------------------------------------------------------------------
# Corpus-sweep embedder (the SAG-mining entry point)
# ---------------------------------------------------------------------------


def jax_mpnet_embedder(model_path: str, max_length: int = 128,
                       batch_size: int = 256, compute_dtype=jnp.float32):
    """Embedder backed by the JAX MPNet forward on the default backend
    (TPU when present). `model_path` is a local HuggingFace checkpoint
    directory (config + weights + tokenizer). The torch dependency is used
    only to deserialize the checkpoint; all compute is JAX."""
    from transformers import AutoTokenizer, MPNetModel

    tokenizer = AutoTokenizer.from_pretrained(model_path)
    torch_model = MPNetModel.from_pretrained(model_path)
    params = jax.device_put(jax.tree.map(
        jnp.asarray,
        convert_hf_state_dict(
            {k: v.numpy() for k, v in torch_model.state_dict().items()}
        ),
    ))
    cfg = config_from_params(params)
    del torch_model

    @jax.jit
    def run(ids, mask):
        return encode(params, ids, mask, cfg, compute_dtype=compute_dtype)

    def embed(texts: Sequence[str], dim: int = 0) -> np.ndarray:
        out = []
        texts = list(texts)
        for lo in range(0, len(texts), batch_size):
            chunk = texts[lo:lo + batch_size]
            toks = tokenizer(
                chunk, padding="max_length", truncation=True,
                max_length=max_length, return_tensors="np",
            )
            n = len(chunk)
            if n < batch_size:  # pad to the static batch for one program
                pad = batch_size - n
                toks = {
                    k: np.concatenate(
                        [v, np.repeat(v[-1:], pad, axis=0)], axis=0
                    ) for k, v in toks.items()
                }
            emb = run(
                jnp.asarray(toks["input_ids"], jnp.int32),
                jnp.asarray(toks["attention_mask"], jnp.int32),
            )
            out.append(np.asarray(emb[:n]))
        return np.concatenate(out, axis=0)

    return embed
