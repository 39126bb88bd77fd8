"""Extended NN layer library.

The reference ships a broader library of attention and graph modules beyond
what the shipped models consume (reference layers.py:118-531:
CandidateAttention, MultipleCandidateAttention, MultipleScaledDotProduct-
Attention, DualScaledDotProductAttention(+parameter-free variant), GCN,
GatedRGCN, GAT, MultiheadGAT). These are part of the framework's public
surface for building model variants, so they are provided here with the
same math, masking semantics (-1e9 fill) and initializer gains, in the
functional init/apply style of digat_tpu.layers.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from digat_tpu import layers as L


# ---------------------------------------------------------------------------
# Candidate attentions (tanh-additive; reference layers.py:118-178)
# ---------------------------------------------------------------------------


def candidate_attention_init(key, feature_dim, query_dim, attention_dim):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "feature": L.linear_init(k1, feature_dim, attention_dim, bias=False,
                                 init="xavier", gain=L.GAIN_TANH),
        "query": L.linear_init(k2, query_dim, attention_dim, init="xavier",
                               gain=L.GAIN_TANH, bias_init="zeros"),
        "attn": L.linear_init(k3, attention_dim, 1, bias=False, init="xavier"),
    }


def candidate_attention(params, feature, query, mask=None):
    """feature [B,N,Df], query [B,Dq] -> [B,Df]."""
    a = L.linear(
        params["attn"],
        jnp.tanh(L.linear(params["feature"], feature)
                 + L.linear(params["query"], query)[..., None, :]),
    ).squeeze(-1)
    alpha = L.masked_softmax(a, mask, axis=-1)
    return jnp.einsum("...n,...nd->...d", alpha, feature)


def multi_candidate_attention(params, feature, query, mask=None):
    """feature [B,N,Df], query [B,Q,Dq] -> [B,Q,Df]; same params as
    candidate_attention."""
    a = L.linear(
        params["attn"],
        jnp.tanh(L.linear(params["feature"], feature)[..., None, :, :]
                 + L.linear(params["query"], query)[..., :, None, :]),
    ).squeeze(-1)  # [B, Q, N]
    m = None if mask is None else mask[..., None, :]
    alpha = L.masked_softmax(a, m, axis=-1)
    return jnp.einsum("...qn,...nd->...qd", alpha, feature)


# ---------------------------------------------------------------------------
# Multi-query / dual scaled-dot attentions (layers.py:209-299)
# ---------------------------------------------------------------------------


def multi_sdp_attention_init(key, feature_dim, query_dim, attention_dim):
    k1, k2 = jax.random.split(key)
    return {
        "K": L.linear_init(k1, feature_dim, attention_dim, init="xavier",
                           bias_init="zeros"),
        "Q": L.linear_init(k2, query_dim, attention_dim, init="xavier",
                           bias_init="zeros"),
    }


def multi_sdp_attention(params, feature, query, mask=None):
    """feature [B,N,Df], query [B,Q,Dq], mask [B,Q,N] -> [B,Q,Df]."""
    d = params["K"]["w"].shape[-1]
    a = jnp.einsum(
        "...qd,...nd->...qn", L.linear(params["Q"], query),
        L.linear(params["K"], feature),
    ) / math.sqrt(float(d))
    alpha = L.masked_softmax(a, mask, axis=-1)
    return jnp.einsum("...qn,...nd->...qd", alpha, feature)


def dual_sdp_attention_init(key, feature_dim1, feature_dim2, attention_dim):
    k1, k2 = jax.random.split(key)
    return {
        "f1": L.linear_init(k1, feature_dim1, attention_dim, init="xavier",
                            bias_init="zeros"),
        "f2": L.linear_init(k2, feature_dim2, attention_dim, init="xavier",
                            bias_init="zeros"),
    }


def dual_sdp_attention(params, feature1, feature2, mask=None):
    """Bidirectional co-attention: returns (out1 [B,N2,Df1], out2 [B,N1,Df2])
    — reference layers.py:238-270 (note the reference's doc comment swaps
    the output names; the math here matches its code)."""
    d = params["f1"]["w"].shape[-1]
    a = jnp.einsum(
        "...id,...jd->...ij", L.linear(params["f1"], feature1),
        L.linear(params["f2"], feature2),
    ) / math.sqrt(float(d))
    alpha1 = L.masked_softmax(a, mask, axis=-1)  # over feature2
    alpha2 = L.masked_softmax(a, mask, axis=-2)  # over feature1
    out1 = jnp.einsum("...ij,...id->...jd", alpha2, feature1)
    out2 = jnp.einsum("...ij,...jd->...id", alpha1, feature2)
    return out1, out2


def dual_sdp_attention_free(feature1, feature2, mask=None):
    """Parameter-free variant (layers.py:272-299)."""
    d = feature1.shape[-1]
    a = jnp.einsum("...id,...jd->...ij", feature1, feature2) / math.sqrt(float(d))
    alpha1 = L.masked_softmax(a, mask, axis=-1)
    alpha2 = L.masked_softmax(a, mask, axis=-2)
    out1 = jnp.einsum("...ij,...id->...jd", alpha2, feature1)
    out2 = jnp.einsum("...ij,...jd->...id", alpha1, feature2)
    return out1, out2


# ---------------------------------------------------------------------------
# Graph convolution stacks (layers.py:301-413)
# ---------------------------------------------------------------------------


def gcn_init(key, in_dim, out_dim, hidden_dim=0, num_layers=1,
             layer_norm=False):
    dims = (
        [(in_dim, out_dim)]
        if num_layers == 1
        else [(in_dim, hidden_dim)]
        + [(hidden_dim, hidden_dim)] * (num_layers - 2)
        + [(hidden_dim, out_dim)]
    )
    keys = jax.random.split(key, len(dims))
    layers = []
    for k, (di, do) in zip(keys, dims):
        p = {"W": L.linear_init(k, di, do, init="xavier", gain=L.GAIN_RELU,
                                bias_init="zeros")}
        if layer_norm:
            p["ln_scale"] = jnp.ones((do,))
            p["ln_bias"] = jnp.zeros((do,))
        layers.append(p)
    return {"layers": layers}


def _layer_norm(x, scale, bias, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * scale + bias


def gcn(params, feature, graph, *, rng=None, dropout=0.0, train=False,
        residual=False):
    """Stacked GCN: out = relu(W(A @ x)) per layer, inter-layer dropout."""
    layers = params["layers"]
    out = feature
    for i, p in enumerate(layers):
        h = L.linear(p["W"], jnp.einsum("...ij,...jd->...id",
                                        graph.astype(out.dtype), out))
        if "ln_scale" in p:
            h = _layer_norm(h, p["ln_scale"], p["ln_bias"])
        h = jax.nn.relu(h)
        if residual:
            h = h + out
        out = h
        if train and dropout > 0 and i < len(layers) - 1 and rng is not None:
            rng, sub = jax.random.split(rng)
            out = L.dropout(sub, out, dropout, train)
    return out


def gated_rgcn_init(key, feature_dim, num_layers=1):
    keys = jax.random.split(key, num_layers)
    gs = math.sqrt(1.0)  # calculate_gain('sigmoid') == 1.0
    layers = []
    for k in keys:
        ks, kr, ka = jax.random.split(k, 3)
        layers.append({
            "fs": L.linear_init(ks, feature_dim, feature_dim, init="xavier",
                                gain=gs, bias_init="zeros"),
            "fr": L.linear_init(kr, feature_dim, feature_dim, init="xavier",
                                gain=gs, bias_init="zeros"),
            "fa": L.linear_init(ka, feature_dim * 2, feature_dim,
                                init="xavier", gain=gs, bias_init="zeros"),
        })
    return {"layers": layers}


def gated_rgcn(params, feature, graph, *, rng=None, dropout=0.0, train=False):
    """Gated relational GCN (layers.py:363-388)."""
    out = feature
    layers = params["layers"]
    for i, p in enumerate(layers):
        agg = jnp.einsum("...ij,...jd->...id", graph.astype(out.dtype), out)
        h = L.linear(p["fs"], out) + L.linear(p["fr"], agg)
        gate = jax.nn.sigmoid(
            L.linear(p["fa"], jnp.concatenate([h, out], axis=-1))
        )
        out_new = jax.nn.relu(h) * gate + out * (1.0 - gate)
        out = out_new
        if train and dropout > 0 and i < len(layers) - 1 and rng is not None:
            rng, sub = jax.random.split(rng)
            out = L.dropout(sub, out, dropout, train)
    return out


def gat_init(key, feature_dim, num_layers=1):
    """Library GAT (scaled-dot scores; layers.py:415-442). Torch-default
    inits (the reference's initialize() is a no-op here)."""
    keys = jax.random.split(key, num_layers)
    layers = []
    for k in keys:
        kw, kq, kk = jax.random.split(k, 3)
        layers.append({
            "W": L.linear_init(kw, feature_dim, feature_dim),
            "Q": L.linear_init(kq, feature_dim, feature_dim),
            "K": L.linear_init(kk, feature_dim, feature_dim),
        })
    return {"layers": layers}


def gat(params, feature, graph, *, rng=None, dropout=0.0, train=False,
        residual=False):
    out = feature
    d = feature.shape[-1]
    for i, p in enumerate(params["layers"]):
        h = L.linear(p["W"], out)
        e = jax.nn.leaky_relu(
            jnp.einsum("...id,...jd->...ij", L.linear(p["Q"], h),
                       L.linear(p["K"], h)) / math.sqrt(float(d)),
            negative_slope=0.2,
        )
        alpha = L.masked_softmax(e, graph, axis=-1)
        if train and dropout > 0 and rng is not None:
            rng, sub = jax.random.split(rng)
            alpha = L.dropout(sub, alpha, dropout, train)
        new = jax.nn.relu(jnp.einsum("...ij,...jd->...id", alpha, h))
        if residual:
            new = new + out
        out = new
        if train and dropout > 0 and i < len(params["layers"]) - 1 and rng is not None:
            rng, sub = jax.random.split(rng)
            out = L.dropout(sub, out, dropout, train)
    return out


def multihead_gat_init(key, feature_dim, head_num, num_layers=1):
    keys = jax.random.split(key, num_layers)
    layers = []
    for k in keys:
        kv, kq, kk = jax.random.split(k, 3)
        layers.append({
            "V": L.linear_init(kv, feature_dim, head_num * feature_dim),
            "Q": L.linear_init(kq, feature_dim, feature_dim, init="xavier",
                               bias_init="zeros"),
            "K": L.linear_init(kk, feature_dim, feature_dim, init="xavier",
                               bias_init="zeros"),
        })
    return {"layers": layers}


def multihead_gat(params, feature, graph, head_num: int, *, rng=None,
                  dropout=0.0, train=False, residual=False):
    """Head-averaged GAT (layers.py:470-506)."""
    out = feature
    d = feature.shape[-1]
    for i, p in enumerate(params["layers"]):
        B_shape = out.shape[:-2]
        n = out.shape[-2]
        h = L.linear(p["V"], out).reshape(*B_shape, n, head_num, d)
        h = jnp.moveaxis(h, -2, -3)  # [..., head, n, d]
        e = jax.nn.leaky_relu(
            jnp.einsum("...id,...jd->...ij", L.linear(p["Q"], h),
                       L.linear(p["K"], h)) / math.sqrt(float(d)),
            negative_slope=0.2,
        )
        alpha = L.masked_softmax(e, graph[..., None, :, :], axis=-1)
        if train and dropout > 0 and rng is not None:
            rng, sub = jax.random.split(rng)
            alpha = L.dropout(sub, alpha, dropout, train)
        new = jax.nn.relu(
            jnp.einsum("...ij,...jd->...id", alpha, h).mean(axis=-3)
        )
        if residual:
            new = new + out
        out = new
        if train and dropout > 0 and i < len(params["layers"]) - 1 and rng is not None:
            rng, sub = jax.random.split(rng)
            out = L.dropout(sub, out, dropout, train)
    return out
