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

DEFAULT_BATCH_TILE = 8


def _scores_kernel(k1_ref, k2_ref, k3_ref, a_ref, out_ref):
    """k1,k2: [TB,G,D]; k3: [TB,D]; a: [1,D]; out: [TB,G,G]."""
    G = k1_ref.shape[1]
    # upcast at read: bf16 inputs stream from HBM at half the bytes, the
    # VPU math runs fp32 (also sidesteps Mosaic's bf16 broadcast-reshape
    # limitations)
    k3 = k3_ref[:, :].astype(jnp.float32)  # [TB, D]
    base = k1_ref[:, :, :].astype(jnp.float32) + k3[:, None, :]  # [TB, G, D]
    a = a_ref[0, :].astype(jnp.float32)  # [D]

    def body(i, _):
        row = k2_ref[:, i, :].astype(jnp.float32)  # [TB, D]
        t = jax.nn.relu(base + row[:, None, :])  # [TB, G, D]
        # VPU multiply-reduce accumulating in fp32: a matvec gains nothing
        # from the MXU, and the reduce over D=400 needs fp32 accumulation.
        out_ref[:, i, :] = jnp.sum(t * a[None, None, :], axis=-1).astype(
            out_ref.dtype
        )
        return 0

    jax.lax.fori_loop(0, G, body, 0)


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
    k3 = k3_ref[:, :].astype(jnp.float32)
    base = k1_ref[:, :, :].astype(jnp.float32) + k3[:, None, :]  # [TB, G, D]
    a = a_ref[0, :].astype(jnp.float32)  # [D]
    gk1_ref[:, :, :] = jnp.zeros(gk1_ref.shape, gk1_ref.dtype)
    gk3_ref[:, :] = jnp.zeros(gk3_ref.shape, gk3_ref.dtype)
    ga_ref[:, :] = jnp.zeros(ga_ref.shape, ga_ref.dtype)

    def body(i, _):
        row = k2_ref[:, i, :].astype(jnp.float32)
        t = base + row[:, None, :]  # [TB, G, D]
        relu_t = jax.nn.relu(t)
        m = (t > 0).astype(jnp.float32)
        gi = g_ref[:, i, :]  # [TB, G]
        w = gi[:, :, None] * m * a[None, None, :]  # [TB, G, D]
        gk1_ref[:, :, :] += w
        s = jnp.sum(w, axis=1)  # [TB, D]
        gk2_ref[:, i, :] = s
        gk3_ref[:, :] += s
        ga_ref[0, :] = ga_ref[0, :] + jnp.sum(
            (gi[:, :, None] * relu_t).astype(jnp.float32), axis=(0, 1)
        )
        return 0

    jax.lax.fori_loop(0, G, body, 0)


def _scores_bwd_pallas(k1, k2, k3, a_vec, g, batch_tile: int):
    B, G, D = k1.shape
    TB = batch_tile
    pad = (-B) % TB
    if pad:
        k1 = jnp.pad(k1, ((0, pad), (0, 0), (0, 0)))
        k2 = jnp.pad(k2, ((0, pad), (0, 0), (0, 0)))
        k3 = jnp.pad(k3, ((0, pad), (0, 0)))
        g = jnp.pad(g, ((0, pad), (0, 0), (0, 0)))
    Bp = B + pad
    bgd = pl.BlockSpec((TB, G, D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    bd = pl.BlockSpec((TB, D), lambda b: (b, 0), memory_space=pltpu.VMEM)
    gk1, gk2, gk3, ga_t = pl.pallas_call(
        _bwd_kernel,
        grid=(Bp // TB,),
        in_specs=[
            bgd, bgd, bd,
            pl.BlockSpec((1, D), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, G, G), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(bgd, bgd, bd, bd),
        out_shape=(
            jax.ShapeDtypeStruct((Bp, G, D), jnp.float32),
            jax.ShapeDtypeStruct((Bp, G, D), jnp.float32),
            jax.ShapeDtypeStruct((Bp, D), jnp.float32),
            jax.ShapeDtypeStruct((Bp, D), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=6 * Bp * G * G * D,
            bytes_accessed=(4 * Bp * G * D + Bp * G * G + D) * 4,
            transcendentals=0,
        ),
    )(k1, k2, k3, a_vec[None, :], g)
    ga = jnp.sum(ga_t, axis=0)
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


def interactive_gat_scores_pallas(k1, k2, k3, a_vec, batch_tile: int = DEFAULT_BATCH_TILE):
    """Fused Eq.(8) scores. Falls back to the XLA expression off-TPU.

    bf16 inputs upcast to fp32 before the kernel: Mosaic cannot
    dynamically row-index bf16 VMEM refs (16-sublane tiles), and the
    kernel is VPU-bound in fp32 regardless; the score dtype follows the
    inputs."""
    if jax.default_backend() != "tpu":
        return _scores_xla(k1, k2, k3, a_vec)
    if k1.dtype != jnp.float32:
        out = _scores(
            k1.astype(jnp.float32), k2.astype(jnp.float32),
            k3.astype(jnp.float32), a_vec.astype(jnp.float32), batch_tile,
        )
        return out.astype(k1.dtype)
    return _scores(k1, k2, k3, a_vec, batch_tile)
