"""Fused MSA news-encoder kernel: projections -> grouped attention -> ReLU
-> masked tanh-MLP attention pooling, one VMEM-resident pass per title tile.

Replaces the XLA composition of the MSA news encoder's post-embedding
pipeline (reference newsEncoders.py:57-82: 16-head self-attention, ReLU,
attention pooling). The unfused path materializes q/k/v [N, L, Dp], the
attention output, the ReLU output, and the pool activations in HBM — at
the training shapes (N ~ 10k deduped titles per step) that is ~6 GB of
round trips for ~0.3 TFLOP of matmul, i.e. purely bandwidth-bound. This
kernel streams the embedded titles from HBM exactly once forward (plus
once more in the backward recompute) and keeps every intermediate in VMEM.

Layout/semantics shared with the grouped attention kernel
(msa_attention_grouped.py): heads are zero-padded dk -> dkp = 128//g lanes
by padding the projection *weights*, g heads form one 128-lane MXU group,
and the attention softmax is UNMASKED (pads attend), matching the
reference's main-variant MultiHeadAttention (layers.py:75-88). Only the
pooling softmax is masked (layers.py:91-115 semantics: -1e9 fill, fp32
softmax). Padded head lanes carry zeros end-to-end (zero V columns ->
zero context -> relu 0 -> zero pool weight rows), so the pooled output is
the head-padded layout of the exact unfused result.

Backward is a single recompute kernel: per title tile it re-runs the
forward in VMEM, backpropagates pool -> ReLU -> attention -> projections,
writes dx, and accumulates the nine weight/bias gradients in revisited
output blocks across the (sequential) grid.

Precision: inputs are loaded as fp32; projection/pool matmuls run at
DEFAULT precision and attention contractions at HIGHEST for fp32 inputs /
DEFAULT for bf16, matching the unfused path's dtype behavior.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from digat_tpu.ops.pallas import runtime as _rt

from digat_tpu.layers import MASK_FILL
from digat_tpu.ops.pallas.msa_attention_grouped import (
    _bseg,
    _dot,
    _expand_S,
    _expand_T,
    _lane_head,
    _pad_batch,
    _seg_sum,
    _softmax_grouped,
    group_size,
    pad_head_projection,
)


def _keep_mask(seed_ref, tile, L, Din, rate):
    """Inverted-dropout keep mask [tile*L, Din] from the on-core PRNG.

    Bits are generated in 8-title sub-blocks seeded by (seed, absolute
    title offset), so the mask for a given title is invariant to the tile
    size — the forward (tile 32) and backward (tile 16) kernels regenerate
    identical masks without ever materializing them in HBM. Replaces the
    XLA dropout on the embedded titles, whose rng-bit-generator + relayout
    copy + select/multiply fusions cost ~7 ms/step at training shapes."""
    # bits are int32: shift the uint threshold into the signed domain so
    # P(bits >= thresh) = 1 - rate over the full two's-complement range
    thresh = np.int32(min(int(rate * 2**32), 2**32 - 1) - 2**31)
    base = pl.program_id(0) * tile
    parts = []
    for j in range(tile // 8):
        pltpu.prng_seed(seed_ref[0], base + j * 8)
        parts.append(pltpu.prng_random_bits((8 * L, Din)))
    bits = jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]
    return bits >= thresh


def _apply_drop(x2, keep, rate):
    return jnp.where(keep, x2 * (1.0 / (1.0 - rate)), 0.0)


def dropout_keep_mask(seed, n, L, Din, rate, interpret: bool = False):
    """Materialize the exact keep mask the fused encoder generates for
    titles [0, n) (test/debug helper — production never materializes it).
    seed: [1] int32. Returns [n, L, Din] bool."""
    n8 = -(-n // 8) * 8

    def kern(seed_ref, o_ref):
        o_ref[:, :] = _keep_mask(seed_ref, 8, L, Din, rate)

    out = pl.pallas_call(
        kern,
        grid=(n8 // 8,),
        in_specs=[pl.BlockSpec((1,), lambda i: (0,),
                               memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((8 * L, Din), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n8 * L, Din), jnp.bool_),
        interpret=interpret,
    )(seed)
    return out.reshape(n8, L, Din)[:n]


def _proj(x2, w_ref, sl, b_ref):
    """[TN*L, Din] @ w[:, sl] (+ bias) at DEFAULT precision, fp32 out."""
    t = jax.lax.dot(
        x2, w_ref[:, sl],
        precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32,
    )
    if b_ref is not None:
        t = t + b_ref[0, sl].astype(jnp.float32)
    return t


def _pool_logits(h2, m, w1_ref, b1_ref, vv_ref, TN, L):
    """tanh-MLP pool logits + masked fp32 softmax -> (u [TN*L, A],
    alpha [TN, L]). `m`: [TN, L] bool."""
    u = jnp.tanh(
        jax.lax.dot(
            h2, w1_ref[:, :],
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32,
        )
        + b1_ref[0, :].astype(jnp.float32)
    )  # [TN*L, A]
    lg = jnp.sum(u * vv_ref[0, :].astype(jnp.float32), axis=-1).reshape(TN, L)
    lg = jnp.where(m, lg, MASK_FILL)
    alpha = jax.nn.softmax(lg, axis=-1)  # fp32 (layers.masked_softmax)
    return u, alpha


def _attn_fwd(qg, kg, vg, g, dkp, L, scale, bseg, att_prec):
    kexp = _expand_T(kg, g, dkp)  # [TN, GD, g*L]
    s = _dot(qg, kexp, att_prec) * scale  # [TN, L, g*L]
    a = _softmax_grouped(s, bseg, att_prec)
    vexp = _expand_S(vg, g, dkp, L)  # [TN, g*L, GD]
    return a, _dot(a, vexp, att_prec)  # a, og [TN, L, GD]


def _fwd_kernel(G, g, L, dkp, A, Din, scale, att_prec, rate, *refs):
    (x_ref, m_ref, wq_ref, bq_ref, wk_ref, wv_ref, bv_ref, w1_ref, b1_ref,
     vv_ref, bseg_ref, seed_ref, o_ref, h_ref) = refs
    TN = x_ref.shape[0]
    GD = g * dkp
    x2 = x_ref[:, :, :].astype(jnp.float32).reshape(TN * L, Din)
    if rate > 0.0:
        x2 = _apply_drop(x2, _keep_mask(seed_ref, TN, L, Din, rate), rate)
    bseg = bseg_ref[:, :]
    for grp in range(G):
        sl = slice(grp * GD, (grp + 1) * GD)
        qg = _proj(x2, wq_ref, sl, bq_ref).reshape(TN, L, GD)
        kg = _proj(x2, wk_ref, sl, None).reshape(TN, L, GD)
        vg = _proj(x2, wv_ref, sl, bv_ref).reshape(TN, L, GD)
        _, og = _attn_fwd(qg, kg, vg, g, dkp, L, scale, bseg, att_prec)
        h_ref[:, :, sl] = jax.nn.relu(og)
    h = h_ref[:, :, :]
    u, alpha = _pool_logits(
        h.reshape(TN * L, G * GD), m_ref[:, :], w1_ref, b1_ref, vv_ref, TN, L,
    )
    o_ref[:, :] = jnp.sum(alpha[:, :, None] * h, axis=1).astype(o_ref.dtype)


def _bwd_kernel(G, g, L, dkp, A, Din, scale, att_prec, rate, *refs):
    (x_ref, m_ref, wq_ref, bq_ref, wk_ref, wv_ref, bv_ref, w1_ref, b1_ref,
     vv_ref, bseg_ref, seed_ref, dp_ref,
     dx_ref, dwq_ref, dbq_ref, dwk_ref, dwv_ref, dbv_ref, dw1_ref, db1_ref,
     dvv_ref, h_ref, qkv_ref, att_ref) = refs
    TN = x_ref.shape[0]
    GD = g * dkp
    Dp = G * GD
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        dwq_ref[:, :] = jnp.zeros_like(dwq_ref)
        dbq_ref[:, :] = jnp.zeros_like(dbq_ref)
        dwk_ref[:, :] = jnp.zeros_like(dwk_ref)
        dwv_ref[:, :] = jnp.zeros_like(dwv_ref)
        dbv_ref[:, :] = jnp.zeros_like(dbv_ref)
        dw1_ref[:, :] = jnp.zeros_like(dw1_ref)
        db1_ref[:, :] = jnp.zeros_like(db1_ref)
        dvv_ref[:, :] = jnp.zeros_like(dvv_ref)

    x2 = x_ref[:, :, :].astype(jnp.float32).reshape(TN * L, Din)
    if rate > 0.0:
        keep = _keep_mask(seed_ref, TN, L, Din, rate)
        x2 = _apply_drop(x2, keep, rate)
    bseg = bseg_ref[:, :]

    # ---- recompute forward, stashing q/k/v and attention probs ----
    for grp in range(G):
        sl = slice(grp * GD, (grp + 1) * GD)
        qg = _proj(x2, wq_ref, sl, bq_ref).reshape(TN, L, GD)
        kg = _proj(x2, wk_ref, sl, None).reshape(TN, L, GD)
        vg = _proj(x2, wv_ref, sl, bv_ref).reshape(TN, L, GD)
        qkv_ref[:, :, sl] = qg
        qkv_ref[:, :, Dp + grp * GD : Dp + (grp + 1) * GD] = kg
        qkv_ref[:, :, 2 * Dp + grp * GD : 2 * Dp + (grp + 1) * GD] = vg
        a, og = _attn_fwd(qg, kg, vg, g, dkp, L, scale, bseg, att_prec)
        att_ref[:, :, grp * g * L : (grp + 1) * g * L] = a
        h_ref[:, :, sl] = jax.nn.relu(og)

    # ---- pool backward ----
    h = h_ref[:, :, :]
    h2 = h.reshape(TN * L, Dp)
    u, alpha = _pool_logits(h2, m_ref[:, :], w1_ref, b1_ref, vv_ref, TN, L)
    dp = dp_ref[:, :].astype(jnp.float32)  # [TN, Dp]
    dalpha = jnp.sum(dp[:, None, :] * h, axis=2)  # [TN, L]
    dh = alpha[:, :, None] * dp[:, None, :]  # [TN, L, Dp]
    dlg = (dalpha - jnp.sum(alpha * dalpha, axis=1, keepdims=True)) * alpha
    # where(mask, lg, FILL) passes no gradient at masked positions — matters
    # for all-masked rows, where alpha is uniform rather than ~0
    dlg = jnp.where(m_ref[:, :], dlg, 0.0)[:, :, None]  # [TN, L, 1]
    A_ = u.shape[1]
    u3 = u.reshape(TN, L, A_)
    dvv_ref[0, :] += jnp.sum(u3 * dlg, axis=(0, 1))
    du = dlg * vv_ref[0, :].astype(jnp.float32)
    dpre = (du * (1.0 - u3 * u3)).reshape(TN * L, A_)  # [TN*L, A]
    dw1_ref[:, :] += jax.lax.dot_general(
        h2, dpre, (((0,), (0,)), ((), ())),
        precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32,
    )
    db1_ref[0, :] += jnp.sum(dpre, axis=0)
    dh = dh + jax.lax.dot_general(
        dpre, w1_ref[:, :], (((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32,
    ).reshape(TN, L, Dp)

    # ---- ReLU + attention + projection backward, per group ----
    dx2 = jnp.zeros((TN * L, Din), jnp.float32)
    head_of_lane = _lane_head((TN, L, GD), dkp, 2)
    for grp in range(G):
        sl = slice(grp * GD, (grp + 1) * GD)
        og_pos = h_ref[:, :, sl] > 0.0
        dog = jnp.where(og_pos, dh[:, :, grp * GD : (grp + 1) * GD], 0.0)
        qg = qkv_ref[:, :, sl]
        kg = qkv_ref[:, :, Dp + grp * GD : Dp + (grp + 1) * GD]
        vg = qkv_ref[:, :, 2 * Dp + grp * GD : 2 * Dp + (grp + 1) * GD]
        a = att_ref[:, :, grp * g * L : (grp + 1) * g * L]
        # (same contractions as msa_attention_grouped._bwd_kernel)
        vexpT = _expand_T(vg, g, dkp)
        da = _dot(dog, vexpT, att_prec)
        tsum = _seg_sum(da * a, bseg, att_prec)
        ds = (da - tsum) * a * scale  # [TN, L, g*L]
        kexp2 = _expand_S(kg, g, dkp, L)
        dqg = _dot(ds, kexp2, att_prec)  # [TN, L, GD]
        dsT = jnp.swapaxes(ds, 1, 2)
        p = _dot(dsT, qg, att_prec)  # [TN, g*L, GD]
        dkg = jnp.zeros((TN, L, GD), jnp.float32)
        for h_i in range(g):
            blk = p[:, h_i * L : (h_i + 1) * L, :]
            dkg = dkg + jnp.where(head_of_lane == h_i, blk, 0.0)
        aT = jnp.swapaxes(a, 1, 2)
        p2 = _dot(aT, dog, att_prec)
        dvg = jnp.zeros((TN, L, GD), jnp.float32)
        for h_i in range(g):
            blk = p2[:, h_i * L : (h_i + 1) * L, :]
            dvg = dvg + jnp.where(head_of_lane == h_i, blk, 0.0)
        # projections
        for dg, w_ref, dw_ref, db_ref in (
            (dqg, wq_ref, dwq_ref, dbq_ref),
            (dkg, wk_ref, dwk_ref, None),
            (dvg, wv_ref, dwv_ref, dbv_ref),
        ):
            dg2 = dg.reshape(TN * L, GD)
            dx2 = dx2 + jax.lax.dot_general(
                dg2, w_ref[:, sl], (((1,), (1,)), ((), ())),
                precision=jax.lax.Precision.DEFAULT,
                preferred_element_type=jnp.float32,
            )
            dw_ref[:, sl] += jax.lax.dot_general(
                x2, dg2, (((0,), (0,)), ((), ())),
                precision=jax.lax.Precision.DEFAULT,
                preferred_element_type=jnp.float32,
            )
            if db_ref is not None:
                db_ref[0, sl] += jnp.sum(dg2, axis=0)

    if rate > 0.0:
        # chain through the in-kernel dropout: d x_d / d x = keep / (1 - p)
        dx2 = _apply_drop(dx2, keep, rate)
    dx_ref[:, :, :] = dx2.reshape(TN, L, Din).astype(dx_ref.dtype)


def _bwd_kernel_v2(G, g, L, dkp, A, Din, scale, att_prec, rate, *refs):
    """Round-5 pipelining restructure of the recompute backward.

    v1 issues 12 narrow [TN*L, Din] x [Din, GD=128] projection matmuls (3
    per group, forward recompute) and 12 more on the gradient side, each
    serialized against that group's VPU work (expansions, grouped softmax)
    by the per-group dataflow. v2 hoists ALL projection work to full-width
    [TN*L, Din] x [Din, Dp] dots outside the group loop — forward qkv in 3
    dots into the stash, gradient dx/dw in 3+3 dots from dq/dk/dv written
    back into the stash slices after each group consumes its own — so the
    only per-group work left is the attention core, whose (independent)
    group iterations give the VLIW scheduler MXU/VPU overlap windows no
    longer pinned by the projection chain. Same math, same VMEM budget
    (the stash is reused for gradients), same tile size."""
    (x_ref, m_ref, wq_ref, bq_ref, wk_ref, wv_ref, bv_ref, w1_ref, b1_ref,
     vv_ref, bseg_ref, seed_ref, dp_ref,
     dx_ref, dwq_ref, dbq_ref, dwk_ref, dwv_ref, dbv_ref, dw1_ref, db1_ref,
     dvv_ref, h_ref, qkv_ref, att_ref) = refs
    TN = x_ref.shape[0]
    GD = g * dkp
    Dp = G * GD
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        dwq_ref[:, :] = jnp.zeros_like(dwq_ref)
        dbq_ref[:, :] = jnp.zeros_like(dbq_ref)
        dwk_ref[:, :] = jnp.zeros_like(dwk_ref)
        dwv_ref[:, :] = jnp.zeros_like(dwv_ref)
        dbv_ref[:, :] = jnp.zeros_like(dbv_ref)
        dw1_ref[:, :] = jnp.zeros_like(dw1_ref)
        db1_ref[:, :] = jnp.zeros_like(db1_ref)
        dvv_ref[:, :] = jnp.zeros_like(dvv_ref)

    x2 = x_ref[:, :, :].astype(jnp.float32).reshape(TN * L, Din)
    if rate > 0.0:
        keep = _keep_mask(seed_ref, TN, L, Din, rate)
        x2 = _apply_drop(x2, keep, rate)
    bseg = bseg_ref[:, :]

    # ---- recompute forward: full-width projections, then attention ----
    qkv_ref[:, :, :Dp] = _proj(x2, wq_ref, slice(None), bq_ref).reshape(
        TN, L, Dp)
    qkv_ref[:, :, Dp:2 * Dp] = _proj(x2, wk_ref, slice(None), None).reshape(
        TN, L, Dp)
    qkv_ref[:, :, 2 * Dp:] = _proj(x2, wv_ref, slice(None), bv_ref).reshape(
        TN, L, Dp)
    for grp in range(G):
        sl = slice(grp * GD, (grp + 1) * GD)
        qg = qkv_ref[:, :, sl]
        kg = qkv_ref[:, :, Dp + grp * GD : Dp + (grp + 1) * GD]
        vg = qkv_ref[:, :, 2 * Dp + grp * GD : 2 * Dp + (grp + 1) * GD]
        a, og = _attn_fwd(qg, kg, vg, g, dkp, L, scale, bseg, att_prec)
        att_ref[:, :, grp * g * L : (grp + 1) * g * L] = a
        h_ref[:, :, sl] = jax.nn.relu(og)

    # ---- pool backward (identical to v1) ----
    h = h_ref[:, :, :]
    h2 = h.reshape(TN * L, Dp)
    u, alpha = _pool_logits(h2, m_ref[:, :], w1_ref, b1_ref, vv_ref, TN, L)
    dp = dp_ref[:, :].astype(jnp.float32)  # [TN, Dp]
    dalpha = jnp.sum(dp[:, None, :] * h, axis=2)  # [TN, L]
    dh = alpha[:, :, None] * dp[:, None, :]  # [TN, L, Dp]
    dlg = (dalpha - jnp.sum(alpha * dalpha, axis=1, keepdims=True)) * alpha
    dlg = jnp.where(m_ref[:, :], dlg, 0.0)[:, :, None]  # [TN, L, 1]
    A_ = u.shape[1]
    u3 = u.reshape(TN, L, A_)
    dvv_ref[0, :] += jnp.sum(u3 * dlg, axis=(0, 1))
    du = dlg * vv_ref[0, :].astype(jnp.float32)
    dpre = (du * (1.0 - u3 * u3)).reshape(TN * L, A_)  # [TN*L, A]
    dw1_ref[:, :] += jax.lax.dot_general(
        h2, dpre, (((0,), (0,)), ((), ())),
        precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32,
    )
    db1_ref[0, :] += jnp.sum(dpre, axis=0)
    dh = dh + jax.lax.dot_general(
        dpre, w1_ref[:, :], (((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32,
    ).reshape(TN, L, Dp)

    # ---- attention backward per group; dq/dk/dv overwrite the stash ----
    head_of_lane = _lane_head((TN, L, GD), dkp, 2)
    for grp in range(G):
        sl = slice(grp * GD, (grp + 1) * GD)
        og_pos = h_ref[:, :, sl] > 0.0
        dog = jnp.where(og_pos, dh[:, :, grp * GD : (grp + 1) * GD], 0.0)
        qg = qkv_ref[:, :, sl]
        kg = qkv_ref[:, :, Dp + grp * GD : Dp + (grp + 1) * GD]
        vg = qkv_ref[:, :, 2 * Dp + grp * GD : 2 * Dp + (grp + 1) * GD]
        a = att_ref[:, :, grp * g * L : (grp + 1) * g * L]
        vexpT = _expand_T(vg, g, dkp)
        da = _dot(dog, vexpT, att_prec)
        tsum = _seg_sum(da * a, bseg, att_prec)
        ds = (da - tsum) * a * scale  # [TN, L, g*L]
        kexp2 = _expand_S(kg, g, dkp, L)
        dqg = _dot(ds, kexp2, att_prec)  # [TN, L, GD]
        dsT = jnp.swapaxes(ds, 1, 2)
        p = _dot(dsT, qg, att_prec)  # [TN, g*L, GD]
        dkg = jnp.zeros((TN, L, GD), jnp.float32)
        for h_i in range(g):
            blk = p[:, h_i * L : (h_i + 1) * L, :]
            dkg = dkg + jnp.where(head_of_lane == h_i, blk, 0.0)
        aT = jnp.swapaxes(a, 1, 2)
        p2 = _dot(aT, dog, att_prec)
        dvg = jnp.zeros((TN, L, GD), jnp.float32)
        for h_i in range(g):
            blk = p2[:, h_i * L : (h_i + 1) * L, :]
            dvg = dvg + jnp.where(head_of_lane == h_i, blk, 0.0)
        qkv_ref[:, :, sl] = dqg
        qkv_ref[:, :, Dp + grp * GD : Dp + (grp + 1) * GD] = dkg
        qkv_ref[:, :, 2 * Dp + grp * GD : 2 * Dp + (grp + 1) * GD] = dvg

    # ---- full-width projection gradients ----
    dq2 = qkv_ref[:, :, :Dp].reshape(TN * L, Dp)
    dk2 = qkv_ref[:, :, Dp:2 * Dp].reshape(TN * L, Dp)
    dv2 = qkv_ref[:, :, 2 * Dp:].reshape(TN * L, Dp)
    dx2 = jnp.zeros((TN * L, Din), jnp.float32)
    for dg2, w_ref, dw_ref, db_ref in (
        (dq2, wq_ref, dwq_ref, dbq_ref),
        (dk2, wk_ref, dwk_ref, None),
        (dv2, wv_ref, dwv_ref, dbv_ref),
    ):
        dx2 = dx2 + jax.lax.dot_general(
            dg2, w_ref[:, :], (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32,
        )
        dw_ref[:, :] += jax.lax.dot_general(
            x2, dg2, (((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32,
        )
        if db_ref is not None:
            db_ref[0, :] += jnp.sum(dg2, axis=0)

    if rate > 0.0:
        dx2 = _apply_drop(dx2, keep, rate)
    dx_ref[:, :, :] = dx2.reshape(TN, L, Din).astype(dx_ref.dtype)


# backward-kernel variant switch for the hardware A/B (docs/PERF.md
# round 5); the default follows the measured verdict recorded there
_BWD_VARIANT = os.environ.get("DIGAT_MSA_BWD", "v1")


def _vmem_tile(L, Din, Dp, A, g, is_bwd):
    """Largest title tile (multiple of 8) whose per-tile buffers fit (x/h/dx
    blocks, attention expansion temporaries [*, 128, g*L], weight (+grad)
    blocks). The backward budget is calibrated against the v5e 16 MB scoped
    VMEM limit (tile 16 compiles at the training shapes, tile 24 does not);
    the forward keeps a conservative budget since its per-title footprint
    estimate is less exact (tile 64 overflows by ~3%)."""
    gL = g * L
    per_title = (L * (Din + Dp) + (128 * gL + L * gL) * 2) * 4
    fixed = (3 * Din * Dp + Dp * A) * 4
    budget = 11 * 1024 * 1024
    if is_bwd:
        per_title += (L * (Din + 3 * Dp + Dp + A) + 128 * gL) * 4
        fixed *= 2
        budget = 15_400_000
    t = max((budget - fixed) // per_title, 8)
    if not is_bwd:
        return 1 << (int(t).bit_length() - 1)
    return max(int(t) // 8 * 8, 8)


def _call(is_bwd, x, mask, wq, bq, wk, wv, bv, w1, b1, vv, seed, dp,
          heads, dk, g, tile, interpret, prec="auto", rate=0.0):
    N, L, Din = x.shape
    Dp = wq.shape[1]
    dkp = Dp // heads
    G = heads // g
    A = w1.shape[1]
    scale = 1.0 / math.sqrt(float(dk))
    if prec == "default":
        att_prec = jax.lax.Precision.DEFAULT
    elif prec == "highest":
        att_prec = jax.lax.Precision.HIGHEST
    else:  # auto: exact-class attention for fp32, bf16 products for bf16
        att_prec = (
            jax.lax.Precision.HIGHEST
            if x.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT
        )
    if tile <= 0:
        tile = _vmem_tile(L, Din, Dp, A, g, is_bwd)
    bseg = jnp.asarray(_bseg(g, L))

    main = [x, mask] + ([dp] if is_bwd else [])
    main, n, npad = _pad_batch(main, tile)
    x_p, mask_p = main[0], main[1]

    xspec = pl.BlockSpec((tile, L, Din), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    mspec = pl.BlockSpec((tile, L), lambda i: (i, 0), memory_space=pltpu.VMEM)
    pooled_spec = pl.BlockSpec((tile, Dp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                                  memory_space=pltpu.VMEM)
    bq2, bv2, b12, vv2 = (t.reshape(1, -1) for t in (bq, bv, b1, vv))
    weights = [wq, bq2, wk, wv, bv2, w1, b12, vv2, bseg]

    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    seed_spec = pl.BlockSpec((1,), lambda i: (0,), memory_space=pltpu.SMEM)
    ins = [x_p, mask_p] + weights + [seed]
    specs = [xspec, mspec] + [full(a) for a in weights] + [seed_spec]
    if is_bwd:
        kernel = _bwd_kernel_v2 if _BWD_VARIANT == "v2" else _bwd_kernel
    else:
        kernel = _fwd_kernel
    f32 = jnp.float32
    flops_mm = 2 * npad * L * Din * 3 * Dp + 2 * npad * L * Dp * A
    cost = pl.CostEstimate(
        flops=(3 if is_bwd else 1) * flops_mm,
        bytes_accessed=(3 if is_bwd else 1) * npad * L * Din * x.dtype.itemsize,
        transcendentals=npad * L * (g * L * G + A),
    )
    if is_bwd:
        ins.append(main[2])
        specs.append(pooled_spec)
        wg = lambda a: jax.ShapeDtypeStruct(a.shape, f32)
        out_shape = (
            jax.ShapeDtypeStruct((npad, L, Din), x.dtype),  # dx
            wg(wq), wg(bq2), wg(wk), wg(wv), wg(bv2), wg(w1), wg(b12), wg(vv2),
        )
        out_specs = (xspec,) + tuple(full(a) for a in
                                     (wq, bq2, wk, wv, bv2, w1, b12, vv2))
        scratch = [
            pltpu.VMEM((tile, L, Dp), f32),  # h
            pltpu.VMEM((tile, L, 3 * Dp), f32),  # qkv
            pltpu.VMEM((tile, L, G * g * L), f32),  # attention probs
        ]
    else:
        out_shape = jax.ShapeDtypeStruct((npad, Dp), f32)
        out_specs = pooled_spec
        scratch = [pltpu.VMEM((tile, L, Dp), f32)]  # h

    out = pl.pallas_call(
        functools.partial(kernel, G, g, L, dkp, A, Din, scale, att_prec, rate),
        grid=(npad // tile,),
        in_specs=specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        cost_estimate=cost,
        interpret=interpret,
    )(*ins)
    if is_bwd:
        dx = out[0][:n]
        dwq, dbq, dwk, dwv, dbv, dw1, db1, dvv = out[1:]
        return (dx, dwq, dbq.reshape(bq.shape), dwk, dwv, dbv.reshape(bv.shape),
                dw1, db1.reshape(b1.shape), dvv.reshape(vv.shape))
    return out[:n]


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(11, 12, 13, 14, 15, 16, 17))
def _encoder(x, mask, wq, bq, wk, wv, bv, w1, b1, vv, seed,
             heads, dk, g, tile, interpret, prec, rate):
    return _call(False, x, mask, wq, bq, wk, wv, bv, w1, b1, vv, seed, None,
                 heads, dk, g, tile, interpret, prec, rate)


def _encoder_fwd(x, mask, wq, bq, wk, wv, bv, w1, b1, vv, seed,
                 heads, dk, g, tile, interpret, prec, rate):
    out = _call(False, x, mask, wq, bq, wk, wv, bv, w1, b1, vv, seed, None,
                heads, dk, g, tile, interpret, prec, rate)
    return out, (x, mask, wq, bq, wk, wv, bv, w1, b1, vv, seed)


def _encoder_bwd(heads, dk, g, tile, interpret, prec, rate, res, grad):
    x, mask, wq, bq, wk, wv, bv, w1, b1, vv, seed = res
    outs = _call(True, x, mask, wq, bq, wk, wv, bv, w1, b1, vv, seed, grad,
                 heads, dk, g, tile, interpret, prec, rate)
    dx, dwq, dbq, dwk, dwv, dbv, dw1, db1, dvv = outs
    cast = lambda gk, p: gk.astype(p.dtype)
    return (dx, None, cast(dwq, wq), cast(dbq, bq), cast(dwk, wk),
            cast(dwv, wv), cast(dbv, bv), cast(dw1, w1), cast(db1, b1),
            cast(dvv, vv), None)


_encoder.defvjp(_encoder_fwd, _encoder_bwd)


def _encoder_xla(x, mask, wq, bq, wk, wv, bv, w1, b1, vv, heads, dk):
    """Reference composition (CPU fallback / parity oracle)."""
    from digat_tpu.ops.pallas.msa_attention_grouped import msa_attention_grouped

    N, L, Din = x.shape
    Dp = wq.shape[1]
    q = x @ wq + bq
    k = x @ wk
    v = x @ wv + bv
    out = msa_attention_grouped(q, k, v, heads, dk)
    h = jax.nn.relu(out.astype(jnp.float32))
    u = jnp.tanh(h @ w1 + b1)
    lg = jnp.where(mask, jnp.sum(u * vv, axis=-1), MASK_FILL)
    alpha = jax.nn.softmax(lg.astype(jnp.float32), axis=-1)
    return jnp.einsum("nl,nld->nd", alpha, h)


def msa_encoder_pooled(x, mask, msa_params, pool_params, heads: int, dk: int,
                       tile: int = 0, interpret: bool = False,
                       precision: str = "auto", dropout_rate: float = 0.0,
                       dropout_seed=None):
    """Fused MSA encoder on embedded titles (optionally with fused dropout).

    x: [N, L, Din] (fp32 or bf16), mask: [N, L] bool title mask.
    msa_params / pool_params: the unfused parameter dicts (layers.mha_init /
    layers.attn_pool_init layouts). Returns (pooled [N, heads*dkp] fp32 in
    the HEAD-PADDED layout, dkp) — callers unpad with
    msa_attention_grouped.unpad_heads.

    `precision` sets the attention-contraction MXU precision: "auto"
    (HIGHEST for fp32, DEFAULT for bf16), "default", or "highest". The
    training path passes "default" for fp32 — single-pass bf16 products
    with fp32 accumulation, the same accuracy class as XLA's own fp32
    attention lowering (1.4e-2 abs vs float64) and 1.5x faster fwd+bwd
    (60.5 -> 39.9 ms at the 10k-title training shapes); eval keeps "auto"
    so cached representations stay at exact-fp32 class.

    `dropout_rate` > 0 applies inverted dropout to x *inside* the kernel
    using the on-core PRNG seeded by (`dropout_seed` [1] int32, absolute
    title offset): the mask never touches HBM, and the backward regenerates
    it bit-exactly (replaces the reference's word-embedding dropout,
    newsEncoders.py:23-25, semantically — Bernoulli(rate) per element, a
    different random stream). TPU/interpret path only.
    """
    N, L, Din = x.shape
    g = group_size(heads, L, dk)
    assert g > 0, f"no valid group size for heads={heads} L={L} dk={dk}"
    dkp = 128 // g
    Dp = heads * dkp
    wq, bq = pad_head_projection(
        msa_params["W_Q"]["w"], msa_params["W_Q"].get("b"), heads, dkp
    )
    wk, _ = pad_head_projection(msa_params["W_K"]["w"], None, heads, dkp)
    wv, bv = pad_head_projection(
        msa_params["W_V"]["w"], msa_params["W_V"].get("b"), heads, dkp
    )
    # pool affine1 rows zero-padded to the head-padded layout
    w1 = pool_params["affine1"]["w"]  # [heads*dk, A]
    A = w1.shape[1]
    w1p = jnp.pad(
        w1.reshape(heads, dk, A), ((0, 0), (0, dkp - dk), (0, 0))
    ).reshape(Dp, A)
    b1 = pool_params["affine1"]["b"]
    vv = pool_params["affine2"]["w"][:, 0]  # [A]
    interpret = interpret or _rt.INTERPRET
    if jax.default_backend() != "tpu" and not interpret:
        assert dropout_rate == 0.0, "fused dropout requires the TPU kernel"
        return (
            _encoder_xla(x, mask, wq, bq, wk, wv, bv, w1p, b1, vv, heads, dk),
            dkp,
        )
    return (
        _encoder(x, mask.astype(jnp.bool_), wq, bq, wk, wv, bv, w1p, b1, vv,
                 dropout_seed, heads, dk, g, tile, interpret, precision,
                 float(dropout_rate)),
        dkp,
    )
