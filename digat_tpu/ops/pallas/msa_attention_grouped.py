"""Grouped block-diagonal MSA attention kernel.

The packed MSA kernel (msa_attention.py) loops over H heads and feeds the
MXU [L, dk] x [dk, L] matmuls (L=32, dk=25) — ~1% utilization, and every
25-lane slice of the packed [TN, L, H*dk] block costs a Mosaic relayout.
This kernel restructures the computation so every matmul is a dense
[L, g*dkp] x [g*dkp, g*L] contraction with g heads processed per MXU pass:

  * heads are padded dk -> dkp = 128//g lanes *by the caller* (zero-padded
    projection weights emit [N, L, H*dkp] directly, so no relayout ever
    happens — see `pad_head_projection`);
  * g heads form one 128-lane group; within a group the scores for all g
    heads are one matmul against a block-diagonal expansion of K:

        s[i, (h, j)] = sum_c q[i, (h', c)] * KexpT[(h', c), (h, j)]
        KexpT[(h', c), (h, j)] = k[j, (h, c)] * [h' == h]

    KexpT is built in VMEM from K^T with g masked lane-block copies; the
    zero off-diagonal blocks make the single dense contraction exactly the
    per-head dot products;
  * softmax normalizes per head segment: the max subtraction uses the
    cross-head row max (any upper bound is valid for stability; the
    normalized result is identical), and the per-segment sum is one matmul
    with the 0/1 block matrix Bseg[(h, j'), (h', j)] = [h == h'] — with
    HIGHEST precision a 0/1 right operand reconstructs fp32 products
    exactly;
  * the context is one matmul against the block-diagonal expansion of V
    (stacked on sublanes, no transpose needed).

The backward recomputes the softmax (flash-style) and evaluates all six
gradient contractions in the same grouped form; dk/dv come out of full
[g*L, g*L] x [g*L, g*dkp] products with the diagonal blocks extracted by
g masked sublane slices.

Group size g is the largest divisor of H with g*L <= 128 and dk <= 128//g
(H=16, dk=25, L=32 -> g=4, dkp=32; the NRMS user encoder's L=50 -> g=2).

Replaces the same reference semantics as msa_attention.py (the MSA news
encoder, reference newsEncoders.py:57-82, and the masked Appendix-B
variant, Appendix-B/layers.py:76-96).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from digat_tpu.ops.pallas import runtime as _rt

from digat_tpu.layers import MASK_FILL


def group_size(heads: int, L: int, dk: int) -> int:
    """Largest divisor g of `heads` with g*L <= 128 and dk <= 128//g;
    0 if none works (caller falls back to the packed kernel)."""
    for g in range(min(128 // L, heads), 0, -1):
        if heads % g == 0 and dk <= 128 // g:
            return g
    return 0


def pad_head_projection(w, b, heads: int, dkp: int):
    """Zero-pad packed projection weights [D_in, H*dk] (+bias) so the
    projection emits head-padded activations [.., H*dkp] directly."""
    d_in, hd = w.shape
    dk = hd // heads
    wp = jnp.pad(
        w.reshape(d_in, heads, dk), ((0, 0), (0, 0), (0, dkp - dk))
    ).reshape(d_in, heads * dkp)
    bp = None
    if b is not None:
        bp = jnp.pad(b.reshape(heads, dk), ((0, 0), (0, dkp - dk))).reshape(-1)
    return wp, bp


def unpad_heads(x, heads: int, dk: int):
    """[.., H*dkp] -> packed [.., H*dk]."""
    dkp = x.shape[-1] // heads
    return x.reshape(*x.shape[:-1], heads, dkp)[..., :dk].reshape(
        *x.shape[:-1], heads * dk
    )


def _bseg(g: int, L: int) -> np.ndarray:
    """[g*L, g*L] 0/1 segment-sum matrix: Bseg[(h,j'),(h',j)] = [h==h']."""
    eye = np.eye(g, dtype=np.float32)
    return np.kron(eye, np.ones((L, L), np.float32))


def _lane_head(shape, dkp, axis):
    """iota // dkp along `axis` — the head id of each (head, c) lane."""
    return jax.lax.broadcasted_iota(jnp.int32, shape, axis) // dkp


def _dot(x, y, precision):
    """[TN, M, K] x [TN, K, N] -> [TN, M, N], fp32 accumulation."""
    return jax.lax.dot_general(
        x, y, (((2,), (1,)), ((0,), (0,))),
        precision=precision, preferred_element_type=jnp.float32,
    )


def _expand_T(xg, g, dkp, precision_dtype=jnp.float32):
    """xg: [TN, L, g*dkp] -> block-diag K-side operand [TN, g*dkp, g*L]:
    out[(h', c), (h, j)] = xg[j, (h, c)] * [h' == h]."""
    xT = jnp.swapaxes(xg.astype(precision_dtype), 1, 2)  # [TN, g*dkp, L]
    head_of_subl = _lane_head(xT.shape, dkp, 1)  # axis 1 = (h, c)
    parts = [
        jnp.where(head_of_subl == h, xT, 0.0) for h in range(g)
    ]
    return jnp.concatenate(parts, axis=2)  # [TN, g*dkp, g*L]


def _expand_S(xg, g, dkp, L, precision_dtype=jnp.float32):
    """xg: [TN, L, g*dkp] -> block-diag V-side operand [TN, g*L, g*dkp]:
    out[(h, j), (h', c)] = xg[j, (h', c)] * [h == h']."""
    x = xg.astype(precision_dtype)
    head_of_lane = _lane_head(x.shape, dkp, 2)
    parts = [jnp.where(head_of_lane == h, x, 0.0) for h in range(g)]
    return jnp.concatenate(parts, axis=1)  # [TN, g*L, g*dkp]


def _seg_sum(x, bseg, precision):
    """x: [TN, L, GL] -> per-head-segment row sums broadcast back over the
    segment lanes, as one [TN*L, GL] x [GL, GL] matmul (full M-dim tiles)."""
    TN, L, GL = x.shape
    return jax.lax.dot(
        x.reshape(TN * L, GL), bseg,
        precision=precision, preferred_element_type=jnp.float32,
    ).reshape(TN, L, GL)


def _softmax_grouped(s, bseg, precision):
    """Per-head-segment softmax over the (h, j) lane axis of s [TN, L, GL]."""
    m = jnp.max(s, axis=2, keepdims=True)  # cross-head max: valid bound
    e = jnp.exp(s - m)
    return e / _seg_sum(e, bseg, precision)


def _fwd_kernel(G, g, L, dkp, scale, masked, mm_prec, seg_prec, *refs):
    if masked:
        q_ref, k_ref, v_ref, m_ref, bseg_ref, o_ref = refs
        # [TN, 1, L] -> per-lane fill over (h, j): tile across heads (the
        # singleton axis lets the block's last two dims match the array,
        # freeing the batch tile from the 8-sublane divisibility rule)
        neg = jnp.where(m_ref[:, 0, :], 0.0, MASK_FILL)  # [TN, L]
        neg = jnp.tile(neg, (1, g))[:, None, :]  # [TN, 1, g*L]
    else:
        q_ref, k_ref, v_ref, bseg_ref, o_ref = refs
        neg = None
    bseg = bseg_ref[:, :]
    GD = g * dkp
    for grp in range(G):
        sl = slice(grp * GD, (grp + 1) * GD)
        qg = q_ref[:, :, sl].astype(jnp.float32)
        kg = k_ref[:, :, sl].astype(jnp.float32)
        vg = v_ref[:, :, sl].astype(jnp.float32)
        kexp = _expand_T(kg, g, dkp)  # [TN, GD, g*L]
        s = _dot(qg, kexp, mm_prec) * scale  # [TN, L, g*L]
        if neg is not None:
            s = s + neg
        a = _softmax_grouped(s, bseg, seg_prec)
        vexp = _expand_S(vg, g, dkp, L)  # [TN, g*L, GD]
        o_ref[:, :, sl] = _dot(a, vexp, mm_prec).astype(o_ref.dtype)


def _bwd_kernel(G, g, L, dkp, scale, masked, mm_prec, seg_prec, *refs):
    if masked:
        (q_ref, k_ref, v_ref, m_ref, bseg_ref, do_ref,
         dq_ref, dk_ref, dv_ref) = refs
        neg = jnp.where(m_ref[:, 0, :], 0.0, MASK_FILL)
        neg = jnp.tile(neg, (1, g))[:, None, :]
    else:
        q_ref, k_ref, v_ref, bseg_ref, do_ref, dq_ref, dk_ref, dv_ref = refs
        neg = None
    bseg = bseg_ref[:, :]
    GD = g * dkp
    for grp in range(G):
        sl = slice(grp * GD, (grp + 1) * GD)
        qg = q_ref[:, :, sl].astype(jnp.float32)
        kg = k_ref[:, :, sl].astype(jnp.float32)
        vg = v_ref[:, :, sl].astype(jnp.float32)
        dog = do_ref[:, :, sl].astype(jnp.float32)
        kexp = _expand_T(kg, g, dkp)
        s = _dot(qg, kexp, mm_prec) * scale
        if neg is not None:
            s = s + neg
        a = _softmax_grouped(s, bseg, seg_prec)  # [TN, L, g*L]
        # da[i,(h,j)] = sum_c do[i,(h,c)] v[j,(h,c)]
        vexpT = _expand_T(vg, g, dkp)  # [TN, GD, g*L]
        da = _dot(dog, vexpT, mm_prec)
        tsum = _seg_sum(da * a, bseg, seg_prec)
        ds = (da - tsum) * a * scale  # [TN, L, g*L]
        # dq[i,(h,c)] = sum_j ds[i,(h,j)] k[j,(h,c)]
        kexp2 = _expand_S(kg, g, dkp, L)  # [TN, g*L, GD]
        dq_ref[:, :, sl] = _dot(ds, kexp2, mm_prec).astype(dq_ref.dtype)
        # dk[j,(h,c)] = sum_i ds[i,(h,j)] q[i,(h,c)]: full product then
        # extract the diagonal (h == h') blocks
        dsT = jnp.swapaxes(ds, 1, 2)  # [TN, g*L, L]
        p = _dot(dsT, qg, mm_prec)  # [TN, g*L(h,j), GD(h',c)]
        head_of_lane = _lane_head((p.shape[0], L, GD), dkp, 2)
        dk_acc = jnp.zeros((p.shape[0], L, GD), jnp.float32)
        for h in range(g):
            blk = p[:, h * L : (h + 1) * L, :]
            dk_acc = dk_acc + jnp.where(head_of_lane == h, blk, 0.0)
        dk_ref[:, :, sl] = dk_acc.astype(dk_ref.dtype)
        # dv[j,(h,c)] = sum_i a[i,(h,j)] do[i,(h,c)]: same extraction
        aT = jnp.swapaxes(a, 1, 2)  # [TN, g*L, L]
        p2 = _dot(aT, dog, mm_prec)
        dv_acc = jnp.zeros((p2.shape[0], L, GD), jnp.float32)
        for h in range(g):
            blk = p2[:, h * L : (h + 1) * L, :]
            dv_acc = dv_acc + jnp.where(head_of_lane == h, blk, 0.0)
        dv_ref[:, :, sl] = dv_acc.astype(dv_ref.dtype)


def _auto_tile(L, Dp, itemsize, nbuf, budget=10 * 1024 * 1024):
    """Largest power-of-two batch tile whose double-buffered windows fit
    the scoped-VMEM budget, capped at 8. The batch axis is a leading
    (untiled) block dim, so tiles below 8 are legal — required at e.g.
    the NRMS user encoder's eval shape [B, 50, 1280], where tile=8 blew
    the 16M scoped limit (measured on v5e: 17.54M requested). The cap
    exists because the IO-window model here does not account for the
    kernel's stack temporaries, which also scale with the tile: the
    NRMS-SA TRAIN shape (L=16, Dp=250, g=5) chose tile=32 and overflowed
    the stack (16.62M > 16M measured on v5e); every production shape
    selects tile <= 8, so the cap only affects small-window shapes where
    extra grid steps are cheap."""
    t = budget // (nbuf * 2 * L * Dp * itemsize)
    t = max(int(t), 1)
    return min(1 << (t.bit_length() - 1), 8)


def _pad_batch(arrs, tile):
    n = arrs[0].shape[0]
    pad = (-n) % tile
    if pad:
        arrs = [jnp.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1)) for a in arrs]
    return arrs, n, n + pad


def _call(is_bwd, q, k, v, mask, do, heads, dk, g, tile, interpret):
    N, L, Dp = q.shape
    dkp = Dp // heads
    G = heads // g
    scale = 1.0 / math.sqrt(float(dk))
    masked = mask is not None
    if tile <= 0:
        nbuf = (7 if is_bwd else 4) + (1 if masked else 0)
        tile = _auto_tile(L, Dp, q.dtype.itemsize, nbuf)
    bseg = jnp.asarray(_bseg(g, L))

    if masked:
        mask = mask[:, None, :]  # [N, 1, L]: see _fwd_kernel mask note
    main = [q, k, v] + ([mask] if masked else []) + ([do] if is_bwd else [])
    main, n, npad = _pad_batch(main, tile)

    bld = pl.BlockSpec((tile, L, Dp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    mask_spec = pl.BlockSpec((tile, 1, L), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    bseg_spec = pl.BlockSpec(
        (g * L, g * L), lambda i: (0, 0), memory_space=pltpu.VMEM
    )

    # fp32 inputs contract at HIGHEST (multi-pass bf16 reconstructs fp32
    # products); bf16 inputs run single-pass.
    if q.dtype == jnp.float32:
        mm_prec = seg_prec = jax.lax.Precision.HIGHEST
    else:
        mm_prec = seg_prec = jax.lax.Precision.DEFAULT

    ins = main[:3]
    specs = [bld, bld, bld]
    if masked:
        ins.append(main[3])
        specs.append(mask_spec)
    ins.append(bseg)
    specs.append(bseg_spec)
    if is_bwd:
        ins.append(main[-1])
        specs.append(bld)

    kernel = _bwd_kernel if is_bwd else _fwd_kernel
    nout = 3 if is_bwd else 1
    shape = jax.ShapeDtypeStruct((npad, L, Dp), q.dtype)
    flops_mm = 2 * npad * L * (g * L) * (g * dkp) * G
    out = pl.pallas_call(
        functools.partial(kernel, G, g, L, dkp, scale, masked, mm_prec, seg_prec),
        grid=(npad // tile,),
        in_specs=specs,
        out_specs=(bld,) * nout if is_bwd else bld,
        out_shape=(shape,) * nout if is_bwd else shape,
        cost_estimate=pl.CostEstimate(
            flops=(7 if is_bwd else 3) * flops_mm,
            bytes_accessed=(7 if is_bwd else 4)
            * npad * L * Dp * q.dtype.itemsize,
            transcendentals=npad * L * g * L * G,
        ),
        interpret=interpret,
    )(*ins)
    if is_bwd:
        return tuple(o[:n] for o in out)
    return out[:n]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _attention(q, k, v, mask, heads, dk, g, tile, interpret):
    return _call(False, q, k, v, mask, None, heads, dk, g, tile, interpret)


def _attention_fwd(q, k, v, mask, heads, dk, g, tile, interpret):
    out = _call(False, q, k, v, mask, None, heads, dk, g, tile, interpret)
    return out, (q, k, v, mask)


def _attention_bwd(heads, dk, g, tile, interpret, res, grad):
    q, k, v, mask = res
    dq, dkk, dv = _call(True, q, k, v, mask, grad, heads, dk, g, tile, interpret)
    return dq, dkk, dv, None


_attention.defvjp(_attention_fwd, _attention_bwd)


def msa_attention_grouped(
    q, k, v, heads: int, dk: int, mask=None, tile: int = 0,
    interpret: bool = False,
):
    """Grouped block-diagonal MSA attention over HEAD-PADDED projections
    [N, L, heads * dkp] (see `pad_head_projection`); `dk` is the true head
    width (sets the softmax scale). Returns head-padded output; use
    `unpad_heads` for the packed layout. Optional [N, L] key mask."""
    N, L, Dp = q.shape
    g = group_size(heads, L, dk)
    assert g > 0, f"no valid group size for heads={heads} L={L} dk={dk}"
    assert Dp % heads == 0 and Dp // heads >= dk
    interpret = interpret or _rt.INTERPRET
    if jax.default_backend() != "tpu" and not interpret:
        from digat_tpu.ops.pallas.msa_attention import _attention_xla

        out = _attention_xla(
            unpad_heads(q, heads, dk), unpad_heads(k, heads, dk),
            unpad_heads(v, heads, dk), mask, heads,
        )
        dkp = Dp // heads
        return jnp.pad(
            out.reshape(N, L, heads, dk), ((0, 0), (0, 0), (0, 0), (0, dkp - dk))
        ).reshape(N, L, Dp)
    return _attention(q, k, v, mask, heads, dk, g, tile, interpret)
