"""Pallas TPU kernel for the Eq.(8) interactive-GAT score.

    score[b, i, j] = a . relu(K1[b, j] + K2[b, i] + K3[b])

The reference evaluates this by materializing [B, G, G, D] in HBM
(graphEncoders.py:147-153) and flags it as the dominant cost
(README.md:62-66). This kernel tiles over batch, keeps a [TB, G, D]
working set in VMEM, and sweeps the center axis i with a fori_loop, so the
quartic intermediate never exists: per step it forms relu(K1 + K2[:, i] +
K3) in VMEM and contracts with `a` on the spot.

The backward pass recomputes the relu mask from the same inputs via the
fused XLA expression (cheap; no residuals besides the inputs), wired up with
jax.custom_vjp.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from digat_tpu.ops.pallas import runtime as _rt

DEFAULT_BATCH_TILE = 8

# i-sweep unroll width; 1 restores the row-at-a-time sweep
import os as _os

UNROLL = max(int(_os.environ.get("DIGAT_GAT_UNROLL", "8")), 1)


def _scores_kernel(k1_ref, k2_ref, k3_ref, a_ref, out_ref):
    """k1,k2: [TB,G,D]; k3: [TB,D]; a: [1,D]; out: [TB,G,G]."""
    G = k1_ref.shape[1]
    # upcast at read: bf16 inputs stream from HBM at half the bytes, the
    # VPU math runs fp32 (also sidesteps Mosaic's bf16 broadcast-reshape
    # limitations)
    k3 = k3_ref[:, :].astype(jnp.float32)  # [TB, D]
    base = k1_ref[:, :, :].astype(jnp.float32) + k3[:, None, :]  # [TB, G, D]
    a = a_ref[0, :].astype(jnp.float32)  # [D]

    # i-sweep unrolled UNROLL center rows per step (same trick as
    # gat_layer._layer_kernel: one [TB, IB, G, D] relu sweep amortizes loop
    # and layout overhead; the VPU multiply-reduce accumulates in fp32 — a
    # matvec gains nothing from the MXU)
    IB = UNROLL

    def block(i0, width):
        rows = k2_ref[:, pl.ds(i0, width), :].astype(jnp.float32)
        t = jax.nn.relu(base[:, None, :, :] + rows[:, :, None, :])
        out_ref[:, pl.ds(i0, width), :] = jnp.sum(
            t * a[None, None, None, :], axis=-1
        ).astype(out_ref.dtype)

    def body(i, _):
        block(i * IB, IB)
        return 0

    jax.lax.fori_loop(0, G // IB, body, 0)
    if G % IB:
        block((G // IB) * IB, G % IB)


def _scores_fwd_pallas(k1, k2, k3, a_vec, batch_tile: int):
    B, G, D = k1.shape
    TB = batch_tile
    pad = (-B) % TB
    if pad:
        k1 = jnp.pad(k1, ((0, pad), (0, 0), (0, 0)))
        k2 = jnp.pad(k2, ((0, pad), (0, 0), (0, 0)))
        k3 = jnp.pad(k3, ((0, pad), (0, 0)))
    Bp = B + pad
    out = pl.pallas_call(
        _scores_kernel,
        grid=(Bp // TB,),
        in_specs=[
            pl.BlockSpec((TB, G, D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, G, D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, D), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TB, G, G), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, G, G), k1.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * Bp * G * G * D,
            bytes_accessed=(2 * Bp * G * D + Bp * D + D + Bp * G * G) * 4,
            transcendentals=0,
        ),
        interpret=_rt.INTERPRET,
    )(k1, k2, k3, a_vec[None, :])
    return out[:B] if pad else out


def _scores_xla(k1, k2, k3, a_vec):
    x = k1[:, None, :, :] + k2[:, :, None, :] + k3[:, None, None, :]
    return jnp.einsum("bijd,d->bij", jax.nn.relu(x), a_vec)


def _bwd_kernel(k1_ref, k2_ref, k3_ref, a_ref, g_ref,
                gk1_ref, gk2_ref, gk3_ref, ga_ref):
    """Per batch-tile backward: recomputes the relu mask row-by-row over the
    center axis i, so the [B, G, G, D] intermediate of the XLA backward
    (the gt/select/reduce chain in the profile) never exists.

    gk1[b,j,d] = sum_i g[b,i,j] m[b,i,j,d] a_d      (j = neighbor axis)
    gk2[b,i,d] = sum_j g[b,i,j] m[b,i,j,d] a_d
    gk3[b,d]   = sum_ij ...
    ga[d]      = sum_bij g[b,i,j] relu(x)[b,i,j,d]   (per-tile partial)
    """
    G = k1_ref.shape[1]
    # k3/gk3/ga ride as [TB, 1, D] blocks so the batch tile can shrink below
    # 8 (2-D (TB, D) blocks would violate the sublane-divisibility rule)
    k3 = k3_ref[:, 0, :].astype(jnp.float32)
    base = k1_ref[:, :, :].astype(jnp.float32) + k3[:, None, :]  # [TB, G, D]
    a = a_ref[0, :].astype(jnp.float32)  # [D]
    gk1_ref[:, :, :] = jnp.zeros(gk1_ref.shape, gk1_ref.dtype)
    gk3_ref[:, :, :] = jnp.zeros(gk3_ref.shape, gk3_ref.dtype)
    ga_ref[:, :, :] = jnp.zeros(ga_ref.shape, ga_ref.dtype)

    # center-axis sweep unrolled; Mosaic requires dynamic sublane store
    # offsets provably divisible by 8, so the width is 8 (or the aligned
    # remainder), not a free knob
    IB = 8 if UNROLL > 1 else 1

    def block(i0, width):
        rows = k2_ref[:, pl.ds(i0, width), :].astype(jnp.float32)
        t = base[:, None, :, :] + rows[:, :, None, :]  # [TB, IB, G, D]
        relu_t = jax.nn.relu(t)
        m = (t > 0).astype(jnp.float32)
        gi = g_ref[:, pl.ds(i0, width), :]  # [TB, IB, G]
        w = gi[:, :, :, None] * m * a[None, None, None, :]  # [TB, IB, G, D]
        # middle-axis reductions statically unrolled: Mosaic cannot relayout
        # a reduce over a non-minor dimension of these tiles
        gk1_ref[:, :, :] += sum(w[:, d] for d in range(width))
        s = jnp.sum(w, axis=2)  # [TB, IB, D] (j-axis reduce is supported)
        gk2_ref[:, pl.ds(i0, width), :] = s
        gk3_ref[:, 0, :] += sum(s[:, d] for d in range(width))
        # (plain slice then broadcast: int-index mixed with None hits the
        # unsupported >2D gather path in Mosaic)
        def ga_term(d):
            gi_d = gi[:, d, :]  # [TB, G]
            return jnp.sum(
                (gi_d[:, :, None] * relu_t[:, d]).astype(jnp.float32),
                axis=(0, 1),
            )

        ga_ref[0, 0, :] = ga_ref[0, 0, :] + sum(
            ga_term(d) for d in range(width)
        )

    def body(i, _):
        block(i * IB, IB)
        return 0

    jax.lax.fori_loop(0, G // IB, body, 0)
    if G % IB:
        block((G // IB) * IB, G % IB)


def _scores_bwd_pallas(k1, k2, k3, a_vec, g, batch_tile: int):
    B, G, D = k1.shape
    TB = batch_tile
    # the unrolled sweep holds ~3 [TB, 8, G, D] fp32 temporaries on the
    # VMEM stack; shrink the batch tile until they fit the 16M scoped limit
    # (G=68 at TB=8 measures 18.2M -> TB=4)
    if UNROLL > 1:
        while TB > 1 and TB * 8 * G * D * 4 * 3 > 14_000_000:
            TB //= 2
    pad = (-B) % TB
    if pad:
        k1 = jnp.pad(k1, ((0, pad), (0, 0), (0, 0)))
        k2 = jnp.pad(k2, ((0, pad), (0, 0), (0, 0)))
        k3 = jnp.pad(k3, ((0, pad), (0, 0)))
        g = jnp.pad(g, ((0, pad), (0, 0), (0, 0)))
    Bp = B + pad
    bgd = pl.BlockSpec((TB, G, D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    b1d = pl.BlockSpec((TB, 1, D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    gk1, gk2, gk3, ga_t = pl.pallas_call(
        _bwd_kernel,
        grid=(Bp // TB,),
        in_specs=[
            bgd, bgd, b1d,
            pl.BlockSpec((1, D), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, G, G), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(bgd, bgd, b1d, b1d),
        out_shape=(
            jax.ShapeDtypeStruct((Bp, G, D), jnp.float32),
            jax.ShapeDtypeStruct((Bp, G, D), jnp.float32),
            jax.ShapeDtypeStruct((Bp, 1, D), jnp.float32),
            jax.ShapeDtypeStruct((Bp, 1, D), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=6 * Bp * G * G * D,
            bytes_accessed=(4 * Bp * G * D + Bp * G * G + D) * 4,
            transcendentals=0,
        ),
        interpret=_rt.INTERPRET,
    )(k1, k2, k3[:, None, :], a_vec[None, :], g)
    gk3 = gk3[:, 0, :]
    ga = jnp.sum(ga_t, axis=(0, 1))
    if pad:
        gk1, gk2, gk3 = gk1[:B], gk2[:B], gk3[:B]
    return gk1, gk2, gk3, ga


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _scores(k1, k2, k3, a_vec, batch_tile):
    return _scores_fwd_pallas(k1, k2, k3, a_vec, batch_tile)


def _scores_fwd(k1, k2, k3, a_vec, batch_tile):
    return _scores_fwd_pallas(k1, k2, k3, a_vec, batch_tile), (k1, k2, k3, a_vec)


def _scores_bwd(batch_tile, res, g):
    k1, k2, k3, a_vec = res
    out_dtype = k1.dtype
    gk1, gk2, gk3, ga = _scores_bwd_pallas(
        k1.astype(jnp.float32), k2.astype(jnp.float32),
        k3.astype(jnp.float32), a_vec.astype(jnp.float32),
        g.astype(jnp.float32), batch_tile,
    )
    return (gk1.astype(out_dtype), gk2.astype(out_dtype),
            gk3.astype(out_dtype), ga.astype(a_vec.dtype))


_scores.defvjp(_scores_fwd, _scores_bwd)


# ---------------------------------------------------------------------------
# Fused-y entry point: consume the [B, G, 3D] projection product directly
# ---------------------------------------------------------------------------
# The train path computes one fused [D, 3D] matmul y = x @ [W|ffn1|ffn2]
# (graph_encoders._gat_layer); slicing k1 = y[..., D:2D] / k2 = y[..., 2D:]
# to feed this custom call costs relayout copies because D=400 is not a
# multiple of the 128-lane tile. These wrappers instead pass y ONCE as a
# full-width [TB, G, 3D] block and take the k1/k2 column slices inside the
# kernel with pl.ds, so XLA never materializes them — the cost is that
# Mosaic materializes those lane-offset slices on the scoped-VMEM stack,
# which is exactly why the round-4 A/B left this variant off by default
# (the stack overflows at the user-graph shape; see _scores_y_fwd_pallas).
# The backward still produces separate gk1/gk2 and assembles dy with a
# zero-block concat, which XLA fuses with the h-path pad-add.


def _scores_y_kernel(y_ref, k3_ref, a_ref, out_ref):
    """y: [TB, G, 3D] (columns h|k1|k2); k3: [TB, D]; a: [1, D];
    out: [TB, G, G]. Same math as _scores_kernel with the k1/k2 column
    slices taken in VMEM (static lane-offset slices)."""
    G = y_ref.shape[1]
    D = y_ref.shape[2] // 3
    k3 = k3_ref[:, :].astype(jnp.float32)
    k1 = y_ref[:, :, pl.ds(D, D)].astype(jnp.float32)
    base = k1 + k3[:, None, :]
    a = a_ref[0, :].astype(jnp.float32)
    IB = UNROLL

    def block(i0, width):
        rows = y_ref[:, pl.ds(i0, width), pl.ds(2 * D, D)].astype(jnp.float32)
        t = jax.nn.relu(base[:, None, :, :] + rows[:, :, None, :])
        out_ref[:, pl.ds(i0, width), :] = jnp.sum(
            t * a[None, None, None, :], axis=-1
        ).astype(out_ref.dtype)

    def body(i, _):
        block(i * IB, IB)
        return 0

    jax.lax.fori_loop(0, G // IB, body, 0)
    if G % IB:
        block((G // IB) * IB, G % IB)


def _scores_y_fwd_pallas(y, k3, a_vec, batch_tile: int):
    B, G, D3 = y.shape
    D = D3 // 3
    TB = batch_tile
    # NOTE: at the user-graph shape (G=68, D=400) Mosaic materializes the
    # in-kernel lane-offset slices of y on the scoped-VMEM stack and
    # overflows the 16M limit (measured 18.8M) REGARDLESS of TB — the
    # dominant term is the [*, G, D] slice temporaries, not the batch
    # tile — so no tile-shrinking loop can save it. That is the round-4
    # verdict for keeping this variant env-gated off (DIGAT_FUSED_Y); it
    # remains valid for the news graph (G=26), where the stack fits.
    pad = (-B) % TB
    if pad:
        y = jnp.pad(y, ((0, pad), (0, 0), (0, 0)))
        k3 = jnp.pad(k3, ((0, pad), (0, 0)))
    Bp = B + pad
    out = pl.pallas_call(
        _scores_y_kernel,
        grid=(Bp // TB,),
        in_specs=[
            pl.BlockSpec((TB, G, D3), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, D), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TB, G, G), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, G, G), y.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * Bp * G * G * D,
            bytes_accessed=(Bp * G * D3 + Bp * D + D + Bp * G * G) * 4,
            transcendentals=0,
        ),
        interpret=_rt.INTERPRET,
    )(y, k3, a_vec[None, :])
    return out[:B] if pad else out


def _scores_y_bwd_pallas(y, k3, a_vec, g, batch_tile: int):
    D = y.shape[-1] // 3
    return _scores_bwd_pallas(
        y[..., D:2 * D], y[..., 2 * D:], k3, a_vec, g, batch_tile
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _scores_y(y, k3, a_vec, batch_tile):
    return _scores_y_fwd_pallas(y, k3, a_vec, batch_tile)


def _scores_y_fwd(y, k3, a_vec, batch_tile):
    return _scores_y_fwd_pallas(y, k3, a_vec, batch_tile), (y, k3, a_vec)


def _scores_y_bwd(batch_tile, res, g):
    y, k3, a_vec = res
    gk1, gk2, gk3, ga = _scores_y_bwd_pallas(
        y.astype(jnp.float32), k3.astype(jnp.float32),
        a_vec.astype(jnp.float32), g.astype(jnp.float32), batch_tile,
    )
    gy = jnp.concatenate(
        [jnp.zeros_like(gk1), gk1, gk2], axis=-1
    ).astype(y.dtype)
    return gy, gk3.astype(k3.dtype), ga.astype(a_vec.dtype)


_scores_y.defvjp(_scores_y_fwd, _scores_y_bwd)


def interactive_gat_scores_fused_y_pallas(
    y, k3, a_vec, batch_tile: int = DEFAULT_BATCH_TILE
):
    """Eq.(8) scores from the fused projection y = x @ [W|ffn1|ffn2]
    ([B, G, 3D]; k1 = middle block, k2 = last block). Off-TPU falls back
    to slicing + the XLA expression."""
    if not _rt.pallas_available():
        D = y.shape[-1] // 3
        return _scores_xla(y[..., D:2 * D], y[..., 2 * D:], k3, a_vec)
    if y.dtype != jnp.float32:
        out = _scores_y(
            y.astype(jnp.float32), k3.astype(jnp.float32),
            a_vec.astype(jnp.float32), batch_tile,
        )
        return out.astype(y.dtype)
    return _scores_y(y, k3, a_vec, batch_tile)


def interactive_gat_scores_pallas(k1, k2, k3, a_vec, batch_tile: int = DEFAULT_BATCH_TILE):
    """Fused Eq.(8) scores. Falls back to the XLA expression off-TPU.

    bf16 inputs upcast to fp32 before the kernel: Mosaic cannot
    dynamically row-index bf16 VMEM refs (16-sublane tiles), and the
    kernel is VPU-bound in fp32 regardless; the score dtype follows the
    inputs."""
    if not _rt.pallas_available():
        return _scores_xla(k1, k2, k3, a_vec)
    if k1.dtype != jnp.float32:
        out = _scores(
            k1.astype(jnp.float32), k2.astype(jnp.float32),
            k3.astype(jnp.float32), a_vec.astype(jnp.float32), batch_tile,
        )
        return out.astype(k1.dtype)
    return _scores(k1, k2, k3, a_vec, batch_tile)
