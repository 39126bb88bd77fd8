"""Fused interactive-GAT layer for TRAINING (forward + backward).

The training-mode GAT layer (reference graphEncoders.py:143-154, train
path) composed from XLA ops is ~15 small kernels per layer per direction
— dropout, three projections, the Eq.(8) score kernel, leaky-relu, masked
softmax, attention dropout, the aggregation bmm, residual relu — each
round-tripping [B, G, D]/[B, G, G] intermediates through HBM, twice more
in the backward. This runs the whole layer per batch tile out of VMEM:

    xd    = x * m1 / (1 - p/2)                      (input dropout)
    h     = xd @ W + bW
    k1    = xd @ W1      k2 = xd @ W2      k3 = q @ W3 + b3
    s     = a . relu(k1[j] + k2[i] + k3)            (Eq.(8) scores)
    e     = leaky_relu(s, slope)
    alpha = softmax_j(where(adj, e, -1e9))
    ad    = alpha * m2 / (1 - p)                    (attention dropout)
    out   = relu(ad @ h) + xd                       (residual on xd)

Dropout masks m1 [B, G, D] and m2 [B, G, G] are generated OUTSIDE the
kernel (plain jax.random against the same per-layer streams as the
unfused path) and passed in as bool arrays: the fwd and the
recompute-backward then see bit-identical masks by construction, and the
mask bandwidth (~10 MB/layer) is noise next to the saved intermediate
round trips.

Backward is one recompute kernel per batch tile (the msa_encoder.py
pattern): re-runs the forward in VMEM, then backpropagates through the
residual/relu, the aggregation, the attention dropout + masked softmax +
leaky-relu, the Eq.(8) score sweep (the same unrolled center-row walk as
gat_scores._bwd_kernel), and the projections; dx/dq stream out per tile
while the eight weight/bias gradients accumulate in revisited output
blocks across the sequential grid.

STATUS — measured NEGATIVE on v5e, off by default. Exact vs the XLA
composition (grads <= 7e-7 relative, hardware-tested), but the backward
recompute only fits the 16M scoped-VMEM limit at tiny batch tiles (TB=2
on the 68-node user graph), which serializes the projection/weight-grad
matmuls XLA otherwise runs at full batch: graph-encoder fwd+bwd measured
36.9 ms fused vs 22.1 ms composed (B=320, D=400, depth 3). The training
path therefore defaults to the composed ops + the custom-VJP score kernel
(gat_scores.py); enable this layer with DIGAT_FUSED_TRAIN_LAYER=1 to
re-evaluate on hardware with a different VMEM/compute balance.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from digat_tpu.ops.pallas import runtime as _rt

from digat_tpu.layers import MASK_FILL

IB = 8  # center-row unroll of the score sweep (Mosaic sublane alignment)


def _fwd_body(x_ref, adj_ref, q_ref, m1_ref, m2_ref, W_ref, bW_ref, W1_ref,
              W2_ref, W3_ref, b3_ref, a_ref, scale1, scale2, slope,
              k2_scr, s_scr):
    """Shared forward math on one batch tile; returns (xd, h2, alpha_d)."""
    TB, G, D = x_ref.shape
    prec = jax.lax.Precision.DEFAULT
    dot = functools.partial(
        jax.lax.dot, precision=prec, preferred_element_type=jnp.float32
    )
    xd = x_ref[:, :, :].astype(jnp.float32) * (
        m1_ref[:, :, :].astype(jnp.float32) * scale1
    )
    x2 = xd.reshape(TB * G, D)
    h2 = dot(x2, W_ref[:, :].astype(jnp.float32)) + bW_ref[0, :]
    k1 = dot(x2, W1_ref[:, :].astype(jnp.float32)).reshape(TB, G, D)
    k2_scr[:, :, :] = dot(x2, W2_ref[:, :].astype(jnp.float32)).reshape(TB, G, D)
    k3 = dot(q_ref[:, 0, :].astype(jnp.float32), W3_ref[:, :].astype(jnp.float32))
    k3 = k3 + b3_ref[0, :]
    a = a_ref[0, :].astype(jnp.float32)
    base = k1 + k3[:, None, :]

    def block(i0, width):
        rows = k2_scr[:, pl.ds(i0, width), :]
        t = jax.nn.relu(base[:, None, :, :] + rows[:, :, None, :])
        s_scr[:, pl.ds(i0, width), :] = jnp.sum(
            t * a[None, None, None, :], axis=-1
        )

    def body(i, _):
        block(i * IB, IB)
        return 0

    jax.lax.fori_loop(0, G // IB, body, 0)
    if G % IB:
        block((G // IB) * IB, G % IB)

    s = s_scr[:, :, :]
    e = jnp.where(s > 0, s, slope * s)
    e = jnp.where(adj_ref[:, :, :], e, MASK_FILL)
    e = e - jnp.max(e, axis=2, keepdims=True)
    p = jnp.exp(e)
    alpha = p / jnp.sum(p, axis=2, keepdims=True)
    alpha_d = alpha * (m2_ref[:, :, :].astype(jnp.float32) * scale2)
    return xd, h2, alpha, alpha_d, base, a


def _fwd_kernel(scale1, scale2, slope, x_ref, adj_ref, q_ref, m1_ref, m2_ref,
                W_ref, bW_ref, W1_ref, W2_ref, W3_ref, b3_ref, a_ref,
                out_ref, k2_scr, s_scr):
    TB, G, D = x_ref.shape
    xd, h2, _, alpha_d, _, _ = _fwd_body(
        x_ref, adj_ref, q_ref, m1_ref, m2_ref, W_ref, bW_ref, W1_ref, W2_ref,
        W3_ref, b3_ref, a_ref, scale1, scale2, slope, k2_scr, s_scr,
    )
    y = jax.lax.dot_general(
        alpha_d, h2.reshape(TB, G, D), (((2,), (1,)), ((0,), (0,))),
        precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32,
    )
    out_ref[:, :, :] = (jax.nn.relu(y) + xd).astype(out_ref.dtype)


def _bwd_kernel(scale1, scale2, slope, x_ref, adj_ref, q_ref, m1_ref, m2_ref,
                W_ref, bW_ref, W1_ref, W2_ref, W3_ref, b3_ref, a_ref, g_ref,
                dx_ref, dq_ref, dW_ref, dbW_ref, dW1_ref, dW2_ref, dW3_ref,
                db3_ref, da_ref, k2_scr, s_scr, dk1_scr, dk2_scr, dk3_scr):
    TB, G, D = x_ref.shape
    prec = jax.lax.Precision.DEFAULT
    dot = functools.partial(
        jax.lax.dot, precision=prec, preferred_element_type=jnp.float32
    )
    w = pl.program_id(0)

    @pl.when(w == 0)
    def _init():
        dW_ref[:, :] = jnp.zeros_like(dW_ref)
        dbW_ref[:, :] = jnp.zeros_like(dbW_ref)
        dW1_ref[:, :] = jnp.zeros_like(dW1_ref)
        dW2_ref[:, :] = jnp.zeros_like(dW2_ref)
        dW3_ref[:, :] = jnp.zeros_like(dW3_ref)
        db3_ref[:, :] = jnp.zeros_like(db3_ref)

    # ---- recompute forward ----
    xd, h2, alpha, alpha_d, base, a = _fwd_body(
        x_ref, adj_ref, q_ref, m1_ref, m2_ref, W_ref, bW_ref, W1_ref, W2_ref,
        W3_ref, b3_ref, a_ref, scale1, scale2, slope, k2_scr, s_scr,
    )
    h = h2.reshape(TB, G, D)
    y = jax.lax.dot_general(
        alpha_d, h, (((2,), (1,)), ((0,), (0,))),
        precision=prec, preferred_element_type=jnp.float32,
    )

    # ---- residual + relu ----
    g = g_ref[:, :, :].astype(jnp.float32)
    dy = jnp.where(y > 0, g, 0.0)  # [TB, G, G->D]? y: [TB, G, D]
    dxd = g  # residual path

    # ---- aggregation bmm ----
    # dalpha_d[b,i,j] = sum_d dy[b,i,d] h[b,j,d]
    dalpha_d = jax.lax.dot_general(
        dy, h, (((2,), (2,)), ((0,), (0,))),
        precision=prec, preferred_element_type=jnp.float32,
    )  # [TB, G, G]
    # dh[b,j,d] = sum_i alpha_d[b,i,j] dy[b,i,d]
    dh = jax.lax.dot_general(
        alpha_d, dy, (((1,), (1,)), ((0,), (0,))),
        precision=prec, preferred_element_type=jnp.float32,
    )  # [TB, G, D]

    # ---- attention dropout + masked softmax + leaky ----
    dalpha = dalpha_d * (m2_ref[:, :, :].astype(jnp.float32) * scale2)
    de = (dalpha - jnp.sum(dalpha * alpha, axis=2, keepdims=True)) * alpha
    # where(adj, e, FILL): no gradient to masked lanes (alpha there is ~0
    # already except all-masked rows, where uniform alpha must get zero)
    de = jnp.where(adj_ref[:, :, :], de, 0.0)
    s = s_scr[:, :, :]
    # stash ds back into the s scratch: the sweep below reads its rows with
    # dynamic indices, which Mosaic only supports on refs
    s_scr[:, :, :] = jnp.where(s > 0, de, slope * de)  # ds [TB, G, G]

    # ---- Eq.(8) score backward (unrolled center-row walk) ----
    # accumulators live in VMEM scratch refs (value-carried accumulators
    # initialized from jnp.zeros hit a Mosaic replicated-layout relayout
    # error when added to computed tiles)
    dk1_scr[:, :, :] = jnp.zeros(dk1_scr.shape, jnp.float32)
    dk3_scr[:, :, :] = jnp.zeros(dk3_scr.shape, jnp.float32)

    @pl.when(w == 0)
    def _init_da():
        da_ref[:, :] = jnp.zeros_like(da_ref)

    def sblock(i0, width):
        rows = k2_scr[:, pl.ds(i0, width), :]
        t = base[:, None, :, :] + rows[:, :, None, :]  # [TB, IBw, G, D]
        relu_t = jax.nn.relu(t)
        m = (t > 0).astype(jnp.float32)
        gi = s_scr[:, pl.ds(i0, width), :]  # ds rows [TB, IBw, G]
        wgt = gi[:, :, :, None] * m * a[None, None, None, :]
        dk1_scr[:, :, :] += sum(wgt[:, d] for d in range(width))
        srows = jnp.sum(wgt, axis=2)  # [TB, IBw, D]
        dk2_scr[:, pl.ds(i0, width), :] = srows
        dk3_scr[:, 0, :] += sum(srows[:, d] for d in range(width))

        def da_term(d):
            gi_d = gi[:, d, :]
            return jnp.sum(
                (gi_d[:, :, None] * relu_t[:, d]).astype(jnp.float32),
                axis=(0, 1),
            )

        da_ref[0, :] += sum(da_term(d) for d in range(width))

    # sequential loop (NOT a static Python unroll: the compiler stacks the
    # unrolled chunks' [TB, IB, G, D] temporaries instead of reusing one
    # buffer and blows the 16M scoped-VMEM limit)
    def sweep(i, _):
        sblock(i * IB, IB)
        return 0

    jax.lax.fori_loop(0, G // IB, sweep, 0)
    if G % IB:
        sblock((G // IB) * IB, G % IB)
    dk1 = dk1_scr[:, :, :]
    dk2 = dk2_scr[:, :, :]
    dk3 = dk3_scr[:, 0, :]

    # ---- projections ----
    x2 = xd.reshape(TB * G, D)
    dh2 = dh.reshape(TB * G, D)
    dk12 = dk1.reshape(TB * G, D)
    dk22 = dk2.reshape(TB * G, D)
    dT = lambda A, Bm: jax.lax.dot_general(
        A, Bm, (((0,), (0,)), ((), ())),
        precision=prec, preferred_element_type=jnp.float32,
    )
    dW_ref[:, :] += dT(x2, dh2)
    dbW_ref[0, :] += jnp.sum(dh2, axis=0)
    dW1_ref[:, :] += dT(x2, dk12)
    dW2_ref[:, :] += dT(x2, dk22)
    q32 = q_ref[:, 0, :].astype(jnp.float32)
    dW3_ref[:, :] += dT(q32, dk3)
    db3_ref[0, :] += jnp.sum(dk3, axis=0)

    wT = lambda dg, W: jax.lax.dot_general(
        dg, W[:, :], (((1,), (1,)), ((), ())),
        precision=prec, preferred_element_type=jnp.float32,
    )
    dx2 = wT(dh2, W_ref) + wT(dk12, W1_ref) + wT(dk22, W2_ref)
    dxd = dxd + dx2.reshape(TB, G, D)
    dq_ref[:, 0, :] = wT(dk3, W3_ref).astype(dq_ref.dtype)
    dx_ref[:, :, :] = (
        dxd * (m1_ref[:, :, :].astype(jnp.float32) * scale1)
    ).astype(dx_ref.dtype)


def _specs(TB, G, D, Bp):
    bgd = pl.BlockSpec((TB, G, D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    bgg = pl.BlockSpec((TB, G, G), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    # per-batch vectors ride as [Bp, 1, D] so TB may drop below 8 (a 2-D
    # (TB, D) block would violate Mosaic's sublane-divisibility rule)
    b1d = pl.BlockSpec((TB, 1, D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec((D, D), lambda b: (0, 0), memory_space=pltpu.VMEM)
    vspec = pl.BlockSpec((1, D), lambda b: (0, 0), memory_space=pltpu.VMEM)
    return bgd, bgg, b1d, wspec, vspec


def _pad_args(x, adj, q, m1, m2, g, TB):
    B = x.shape[0]
    pad = (-B) % TB
    if pad:
        pad3 = lambda t, cv=0: jnp.pad(t, ((0, pad), (0, 0), (0, 0)),
                                       constant_values=cv)
        x = pad3(x)
        adj = pad3(adj, True)
        m1 = pad3(m1, True)
        m2 = pad3(m2, True)
        q = jnp.pad(q, ((0, pad), (0, 0)))
        if g is not None:
            g = pad3(g)
    return x, adj, q, m1, m2, g, B + pad


def _tile_for(G, D, is_bwd):
    """Batch tile under the 16M scoped-VMEM limit: the unrolled sweep holds
    ~2 (fwd) / ~4.5 (bwd) live [TB, 8, G, D] fp32 temporaries."""
    TB = 8
    k = 7 if is_bwd else 2  # G=26 at TB=8 measures 17.6M in-context
    while TB > 1 and TB * IB * G * D * 4 * k > 13_000_000:
        TB //= 2
    return TB


def _fwd_call(x, adj, q, m1, m2, W, bW, W1, W2, W3, b3, a_vec,
              scale1, scale2, slope, interpret):
    B, G, D = x.shape
    TB = _tile_for(G, D, False)
    x, adj, q, m1, m2, _, Bp = _pad_args(x, adj, q, m1, m2, None, TB)
    bgd, bgg, b1d, wspec, vspec = _specs(TB, G, D, Bp)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, scale1, scale2, slope),
        grid=(Bp // TB,),
        in_specs=[bgd, bgg, b1d, bgd, bgg,
                  wspec, vspec, wspec, wspec, wspec, vspec, vspec],
        out_specs=bgd,
        out_shape=jax.ShapeDtypeStruct((Bp, G, D), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((TB, G, D), jnp.float32),
            pltpu.VMEM((TB, G, G), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * Bp * G * D * (4 * D + 2 * G) + 2 * Bp * G * G * D,
            bytes_accessed=(3 * Bp * G * D + 3 * Bp * G * G + Bp * D) * 4,
            transcendentals=Bp * G * G,
        ),
        interpret=interpret,
    )(x, adj, q[:, None, :], m1, m2, W, bW[None, :], W1, W2, W3,
      b3[None, :], a_vec[None, :])
    return out[:B]


def _bwd_call(x, adj, q, m1, m2, g, W, bW, W1, W2, W3, b3, a_vec,
              scale1, scale2, slope, interpret):
    B, G, D = x.shape
    TB = _tile_for(G, D, True)
    x, adj, q, m1, m2, g, Bp = _pad_args(x, adj, q, m1, m2, g, TB)
    bgd, bgg, b1d, wspec, vspec = _specs(TB, G, D, Bp)
    f32 = jnp.float32
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, scale1, scale2, slope),
        grid=(Bp // TB,),
        in_specs=[bgd, bgg, b1d, bgd, bgg,
                  wspec, vspec, wspec, wspec, wspec, vspec, vspec, bgd],
        out_specs=(bgd, b1d, wspec, vspec, wspec, wspec, wspec, vspec, vspec),
        out_shape=(
            jax.ShapeDtypeStruct((Bp, G, D), x.dtype),   # dx
            jax.ShapeDtypeStruct((Bp, 1, D), jnp.float32),  # dq
            jax.ShapeDtypeStruct((D, D), f32),           # dW
            jax.ShapeDtypeStruct((1, D), f32),           # dbW
            jax.ShapeDtypeStruct((D, D), f32),           # dW1
            jax.ShapeDtypeStruct((D, D), f32),           # dW2
            jax.ShapeDtypeStruct((D, D), f32),           # dW3
            jax.ShapeDtypeStruct((1, D), f32),           # db3
            jax.ShapeDtypeStruct((1, D), f32),           # da
        ),
        scratch_shapes=[
            pltpu.VMEM((TB, G, D), jnp.float32),
            pltpu.VMEM((TB, G, G), jnp.float32),
            pltpu.VMEM((TB, G, D), jnp.float32),
            pltpu.VMEM((TB, G, D), jnp.float32),
            pltpu.VMEM((TB, 1, D), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=3 * (2 * Bp * G * D * (4 * D + 2 * G) + 2 * Bp * G * G * D),
            bytes_accessed=(5 * Bp * G * D + 4 * Bp * G * G + Bp * D) * 4,
            transcendentals=Bp * G * G,
        ),
        interpret=interpret,
    )(x, adj, q[:, None, :], m1, m2, W, bW[None, :], W1, W2, W3,
      b3[None, :], a_vec[None, :], g)
    dx, dq, dW, dbW, dW1, dW2, dW3, db3, da = outs
    return (dx[:B], dq[:B, 0, :], dW, dbW[0], dW1, dW2, dW3, db3[0], da[0])


# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(12, 13, 14, 15))
def _layer(x, adj, q, m1, m2, W, bW, W1, W2, W3, b3, a_vec,
           scale1, scale2, slope, interpret):
    return _fwd_call(x, adj, q, m1, m2, W, bW, W1, W2, W3, b3, a_vec,
                     scale1, scale2, slope, interpret)


def _layer_fwd(x, adj, q, m1, m2, W, bW, W1, W2, W3, b3, a_vec,
               scale1, scale2, slope, interpret):
    out = _fwd_call(x, adj, q, m1, m2, W, bW, W1, W2, W3, b3, a_vec,
                    scale1, scale2, slope, interpret)
    return out, (x, adj, q, m1, m2, W, bW, W1, W2, W3, b3, a_vec)


def _layer_bwd(scale1, scale2, slope, interpret, res, g):
    x, adj, q, m1, m2, W, bW, W1, W2, W3, b3, a_vec = res
    dx, dq, dW, dbW, dW1, dW2, dW3, db3, da = _bwd_call(
        x, adj, q, m1, m2, g, W, bW, W1, W2, W3, b3, a_vec,
        scale1, scale2, slope, interpret,
    )
    cast = lambda t, p: t.astype(p.dtype)
    return (dx, None, cast(dq, q), None, None, cast(dW, W), cast(dbW, bW),
            cast(dW1, W1), cast(dW2, W2), cast(dW3, W3), cast(db3, b3),
            cast(da, a_vec))


_layer.defvjp(_layer_fwd, _layer_bwd)


def _layer_xla(x, adj, q, m1, m2, W, bW, W1, W2, W3, b3, a_vec,
               scale1, scale2, slope):
    """Reference composition (off-TPU fallback; identical math)."""
    xd = x.astype(jnp.float32) * (m1.astype(jnp.float32) * scale1)
    h = xd @ W + bW
    k1 = xd @ W1
    k2 = xd @ W2
    k3 = q.astype(jnp.float32) @ W3 + b3
    t = jax.nn.relu(k1[:, None, :, :] + k2[:, :, None, :] + k3[:, None, None, :])
    s = jnp.einsum("bijd,d->bij", t, a_vec)
    e = jnp.where(s > 0, s, slope * s)
    e = jnp.where(adj.astype(bool), e, MASK_FILL)
    alpha = jax.nn.softmax(e, axis=2)
    ad = alpha * (m2.astype(jnp.float32) * scale2)
    return (jax.nn.relu(jnp.einsum("bij,bjd->bid", ad, h)) + xd).astype(x.dtype)


def interactive_gat_layer_train(
    x, adj, query, m1, m2, W, bW, W1, W2, W3, b3, a_vec,
    *, input_rate: float, attn_rate: float, negative_slope: float = 0.2,
    interpret: bool = False,
):
    """One training-mode interactive GAT layer, fused fwd+bwd.

    x: [B, G, D]; adj/m2: [B, G, G] bool; query: [B, D]; m1: [B, G, D]
    bool keep-masks (True = keep) drawn by the caller from the same
    dropout streams as the unfused path. Differentiable in x, query and
    all weights. Falls back to the XLA composition off-TPU."""
    scale1 = 1.0 / (1.0 - input_rate) if input_rate > 0 else 1.0
    scale2 = 1.0 / (1.0 - attn_rate) if attn_rate > 0 else 1.0
    interpret = interpret or _rt.INTERPRET
    if jax.default_backend() != "tpu" and not interpret:
        return _layer_xla(x, adj, query, m1, m2, W, bW, W1, W2, W3, b3,
                          a_vec, scale1, scale2, negative_slope)
    return _layer(x, adj, query, m1, m2, W, bW, W1, W2, W3, b3, a_vec,
                  scale1, scale2, negative_slope, interpret)
