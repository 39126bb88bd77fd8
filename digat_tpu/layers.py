"""Core NN primitives as pure init/apply functions over pytree params.

Replicates the initializer semantics the reference relies on (torch-default
kaiming-uniform Linears where `.initialize()` is a no-op, xavier-uniform with
activation gains elsewhere; reference: layers.py:65-67,97-100,188-191) so a
freshly initialized model is drawn from the same distribution, while the
apply functions are plain jax.numpy suitable for jit/pjit.

Masked softmax uses the same -1e9 fill as the reference (layers.py:111,202)
rather than -inf, so fully-masked rows degrade to a uniform distribution in
the identical way.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

MASK_FILL = -1e9

# Activation gains (values of torch.nn.init.calculate_gain).
GAIN_LINEAR = 1.0
GAIN_RELU = math.sqrt(2.0)
GAIN_TANH = 5.0 / 3.0


def gain_leaky_relu(negative_slope: float = 0.2) -> float:
    return math.sqrt(2.0 / (1.0 + negative_slope**2))


# ---------------------------------------------------------------------------
# Initializers. Weights are stored [d_in, d_out] (apply is x @ W + b).
# ---------------------------------------------------------------------------


def uniform_fan_in(key, d_in: int, d_out: int, dtype=jnp.float32):
    """torch.nn.Linear default weight init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / math.sqrt(d_in)
    return jax.random.uniform(key, (d_in, d_out), dtype, -bound, bound)


def xavier_uniform(key, d_in: int, d_out: int, gain: float = 1.0, dtype=jnp.float32):
    bound = gain * math.sqrt(6.0 / (d_in + d_out))
    return jax.random.uniform(key, (d_in, d_out), dtype, -bound, bound)


def linear_init(
    key,
    d_in: int,
    d_out: int,
    *,
    bias: bool = True,
    init: str = "torch",  # torch | xavier
    gain: float = 1.0,
    bias_init: str = "torch",  # torch | zeros
    dtype=jnp.float32,
):
    wkey, bkey = jax.random.split(key)
    if init == "torch":
        w = uniform_fan_in(wkey, d_in, d_out, dtype)
    else:
        w = xavier_uniform(wkey, d_in, d_out, gain, dtype)
    params = {"w": w}
    if bias:
        if bias_init == "zeros":
            b = jnp.zeros((d_out,), dtype)
        else:
            bound = 1.0 / math.sqrt(d_in)
            b = jax.random.uniform(bkey, (d_out,), dtype, -bound, bound)
        params["b"] = b
    return params


def linear(params, x):
    y = x @ params["w"]
    if "b" in params:
        y = y + params["b"]
    return y


def stacked_linear_init(key, depth: int, d_in: int, d_out: int, **kw):
    """`depth` independent linears stacked on a leading axis (per-GAT-layer
    parameter lists; indexed with a static loop counter)."""
    keys = jax.random.split(key, depth)
    leaves = [linear_init(k, d_in, d_out, **kw) for k in keys]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *leaves)


def stacked_linear(params, i: int, x):
    return linear(jax.tree.map(lambda p: p[i], params), x)


# ---------------------------------------------------------------------------
# Dropout / masking helpers
# ---------------------------------------------------------------------------


def dropout(key, x, rate: float, train: bool):
    """Inverted dropout. No-op when not training or rate == 0.

    The mask is drawn on the 2D-flattened shape: XLA's TPU
    rng-bit-generator picks a transposed layout for >2D outputs, which
    inserts relayout copies of the bits before downstream fusions. The
    2D draw yields the identical row-major bit stream (the reshape is a
    bitcast) without those copies."""
    if not train or rate <= 0.0:
        return x
    keep = 1.0 - rate
    if x.ndim > 2:
        import math

        flat = (math.prod(x.shape[:-1]), x.shape[-1])
    else:
        flat = x.shape
    mask = jax.random.bernoulli(key, keep, flat).reshape(x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


def masked_softmax(scores, mask, axis: int = -1):
    """softmax(where(mask, scores, -1e9)). `mask` is broadcastable, bool/0-1.
    The softmax itself always runs in fp32 (bf16 exp/normalize loses too
    much precision); the result returns in the input dtype so downstream
    matmuls stay on the fast path."""
    dtype = scores.dtype
    if mask is not None:
        scores = jnp.where(mask.astype(bool), scores, MASK_FILL)
    acc = jnp.promote_types(dtype, jnp.float32)  # f64 stays f64 (parity leg)
    return jax.nn.softmax(scores.astype(acc), axis=axis).astype(dtype)


# ---------------------------------------------------------------------------
# Attention pooling (tanh-MLP; reference layers.py:91-115 "Attention")
# ---------------------------------------------------------------------------


def attn_pool_init(key, feature_dim: int, attention_dim: int):
    k1, k2 = jax.random.split(key)
    return {
        "affine1": linear_init(
            k1, feature_dim, attention_dim, init="xavier", gain=GAIN_TANH,
            bias_init="zeros",
        ),
        "affine2": linear_init(k2, attention_dim, 1, bias=False, init="xavier"),
    }


def attn_pool(params, feature, mask=None):
    """feature: [..., L, D], mask: [..., L] -> [..., D]."""
    a = linear(params["affine2"], jnp.tanh(linear(params["affine1"], feature)))
    alpha = masked_softmax(a.squeeze(-1), mask, axis=-1)
    return jnp.einsum("...l,...ld->...d", alpha, feature)


# ---------------------------------------------------------------------------
# Scaled dot-product attention with a single query vector
# (reference layers.py:181-206 "ScaledDotProductAttention")
# ---------------------------------------------------------------------------


def sdp_attn_init(key, feature_dim: int, query_dim: int, attention_dim: int):
    k1, k2 = jax.random.split(key)
    return {
        "K": linear_init(k1, feature_dim, attention_dim, bias=False, init="xavier"),
        "Q": linear_init(k2, query_dim, attention_dim, init="xavier", bias_init="zeros"),
    }


def sdp_attn(params, feature, query, mask=None):
    """feature: [..., L, Df], query: [..., Dq], mask: [..., L] -> [..., Df]."""
    k = linear(params["K"], feature)
    q = linear(params["Q"], query)
    scale = params["K"]["w"].shape[-1]  # attention_dim, static at trace time
    a = jnp.einsum("...ld,...d->...l", k, q) / math.sqrt(float(scale))
    alpha = masked_softmax(a, mask, axis=-1)
    return jnp.einsum("...l,...ld->...d", alpha, feature)


# ---------------------------------------------------------------------------
# Multi-head self-attention (reference layers.py:50-88; NO key mask, matching
# the main-variant semantics where pads participate in the softmax)
# ---------------------------------------------------------------------------


def mha_init(key, heads: int, d_model: int, d_k: int, d_v: int):
    kk, kq, kv = jax.random.split(key, 3)
    return {
        "W_K": linear_init(kk, d_model, heads * d_k, bias=False),
        "W_Q": linear_init(kq, d_model, heads * d_k, bias_init="zeros"),
        "W_V": linear_init(kv, d_model, heads * d_v, bias_init="zeros"),
    }


def mha(params, x, heads: int, compute_dtype=None, key_mask=None,
        use_pallas: bool = False, return_padded: bool = False):
    """Self-attention. x: [..., L, d_model] -> [..., L, heads*d_v].

    `key_mask` [..., L] masks keys with the -1e9 fill (the Appendix-B
    masked variant, Appendix-B/layers.py:85-96); None reproduces the main
    reference's unmasked softmax where pads attend (layers.py:75-88).

    `use_pallas` routes the attention core through a fused VMEM-resident
    kernel on TPU: the grouped block-diagonal kernel
    (ops/pallas/msa_attention_grouped.py) when the head geometry admits a
    128-lane grouping — the projections are then emitted head-padded by
    zero-padded weights, so no relayout ever materializes — else the
    packed per-head kernel (ops/pallas/msa_attention.py).

    With `return_padded=True` the function returns `(out, dv_stride)`
    instead: when the grouped kernel ran, `out` keeps the head-padded
    layout [..., L, heads*dv_stride] (each head occupies dv_stride lanes,
    the first d_v of them real) and the caller is responsible for slicing
    — this lets downstream elementwise+pooling ops run on the padded
    layout and defers the unpad relayout to a far smaller tensor."""
    h = heads
    d_k = params["W_K"]["w"].shape[-1] // h
    d_v = params["W_V"]["w"].shape[-1] // h
    lead, L2 = x.shape[:-2], x.shape[-2]
    from digat_tpu.ops.pallas.runtime import pallas_available

    if use_pallas and d_k == d_v and pallas_available():
        from digat_tpu.ops.pallas.msa_attention_grouped import group_size

        g = group_size(h, L2, d_k)
    else:
        g = 0
    if g > 0:
        from digat_tpu.ops.pallas.msa_attention_grouped import (
            msa_attention_grouped, pad_head_projection, unpad_heads)

        dkp = 128 // g
        qkv = []
        for name in ("W_Q", "W_K", "W_V"):
            w, b = pad_head_projection(
                params[name]["w"], params[name].get("b"), h, dkp
            )
            t = x @ w if b is None else x @ w + b
            qkv.append(t if compute_dtype is None else t.astype(compute_dtype))
        q, k, v = qkv
        Dp = h * dkp
        out = msa_attention_grouped(
            q.reshape(-1, L2, Dp), k.reshape(-1, L2, Dp),
            v.reshape(-1, L2, Dp), h, d_k,
            mask=None if key_mask is None else key_mask.reshape(-1, L2),
        )
        if return_padded:
            return out.reshape(*lead, L2, Dp).astype(jnp.float32), dkp
        out = unpad_heads(out, h, d_v)
        return out.reshape(*lead, L2, h * d_v).astype(jnp.float32)
    q = linear(params["W_Q"], x)
    k = linear(params["W_K"], x)
    v = linear(params["W_V"], x)
    if compute_dtype is not None:
        q, k, v = (t.astype(compute_dtype) for t in (q, k, v))
    if use_pallas and d_k == d_v:
        from digat_tpu.ops.pallas.msa_attention import msa_attention

        D2 = h * d_v
        out = msa_attention(
            q.reshape(-1, L2, D2), k.reshape(-1, L2, D2),
            v.reshape(-1, L2, D2), h,
            mask=None if key_mask is None else key_mask.reshape(-1, L2),
        )
        out = out.reshape(*lead, L2, D2).astype(jnp.float32)
        return (out, d_v) if return_padded else out
    q = q.reshape(*x.shape[:-1], h, d_k)
    k = k.reshape(*x.shape[:-1], h, d_k)
    v = v.reshape(*x.shape[:-1], h, d_v)
    a = jnp.einsum("...qhd,...khd->...hqk", q, k) / math.sqrt(float(d_k))
    if key_mask is not None:
        a = jnp.where(
            key_mask[..., None, None, :].astype(bool), a, MASK_FILL
        )
    acc = jnp.promote_types(v.dtype, jnp.float32)
    alpha = jax.nn.softmax(a.astype(acc), axis=-1).astype(v.dtype)
    out = jnp.einsum("...hqk,...khd->...qhd", alpha, v)
    out = out.reshape(*x.shape[:-1], h * d_v).astype(acc)
    return (out, d_v) if return_padded else out


# ---------------------------------------------------------------------------
# 1-D convolution bank (reference layers.py:7-47 "Conv1D")
# ---------------------------------------------------------------------------


def _conv_init(key, in_ch: int, out_ch: int, width: int):
    """torch.nn.Conv1d default init: U(+-1/sqrt(in_ch*width)). Kernel stored
    [width, in_ch, out_ch] for lax.conv_general_dilated with ('NWC','WIO','NWC')."""
    wkey, bkey = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_ch * width)
    w = jax.random.uniform(wkey, (width, in_ch, out_ch), jnp.float32, -bound, bound)
    b = jax.random.uniform(bkey, (out_ch,), jnp.float32, -bound, bound)
    return {"w": w, "b": b}


def conv_bank_widths(method: str, window: int):
    if method == "naive":
        return (window,)
    if method == "group3":
        return (1, 3, 5)
    return (1, 2, 3, 4, 5)  # group5


def conv1d_bank_init(key, method: str, in_ch: int, kernel_num: int, window: int):
    widths = conv_bank_widths(method, window)
    per = kernel_num // len(widths)
    keys = jax.random.split(key, len(widths))
    return {"convs": [_conv_init(k, in_ch, per, w) for k, w in zip(keys, widths)]}


def _conv1d_same(params, x, width: int):
    """x: [B, L, C_in] -> [B, L, C_out]. Odd widths match torch
    padding=(width-1)//2 exactly; even widths add one extra zero frame on the
    right (the intent of the reference's manual length-pad for its even
    kernels; reference layers.py:22-26,42-47)."""
    pad = (width - 1) // 2
    padding = [(pad, pad if width % 2 == 1 else pad + 1)]
    out = jax.lax.conv_general_dilated(
        x,
        params["w"],
        window_strides=(1,),
        padding=padding,
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    return out + params["b"]


def conv1d_bank(params, x, method: str, window: int):
    """x: [B, L, C_in] -> relu(concat of convs) [B, L, kernel_num]."""
    widths = conv_bank_widths(method, window)
    outs = [_conv1d_same(p, x, w) for p, w in zip(params["convs"], widths)]
    return jax.nn.relu(jnp.concatenate(outs, axis=-1))
