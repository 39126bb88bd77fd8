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
    k3 = k3_ref[:, :]  # [TB, D]
    base = k1_ref[:, :, :] + k3[:, None, :]  # [TB, G, D] (j-varying + query)
    a = a_ref[0, :]  # [D]

    def body(i, _):
        row = k2_ref[:, i, :]  # [TB, D]
        t = jax.nn.relu(base + row[:, None, :])  # [TB, G, D]
        # VPU multiply-reduce accumulating in fp32: a matvec gains nothing
        # from the MXU, and the reduce over D=400 needs fp32 accumulation
        # even for bf16 inputs.
        prod = (t * a[None, None, :]).astype(jnp.float32)
        out_ref[:, i, :] = jnp.sum(prod, axis=-1).astype(out_ref.dtype)
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _scores(k1, k2, k3, a_vec, batch_tile):
    return _scores_fwd_pallas(k1, k2, k3, a_vec, batch_tile)


def _scores_fwd(k1, k2, k3, a_vec, batch_tile):
    return _scores_fwd_pallas(k1, k2, k3, a_vec, batch_tile), (k1, k2, k3, a_vec)


def _scores_bwd(batch_tile, res, g):
    k1, k2, k3, a_vec = res
    # Recompute the relu mask; XLA fuses the [B,G,G,D] intermediates.
    x = k1[:, None, :, :] + k2[:, :, None, :] + k3[:, None, None, :]
    m = (x > 0).astype(g.dtype)  # [B, i, j, D]
    ga = jnp.einsum("bij,bijd->d", g, jax.nn.relu(x))
    w = g[..., None] * m * a_vec  # [B, i, j, D]
    gk1 = jnp.sum(w, axis=1)  # sum over i -> [B, j(G), D]
    gk2 = jnp.sum(w, axis=2)  # sum over j -> [B, i(G), D]
    gk3 = jnp.sum(w, axis=(1, 2))  # [B, D]
    return gk1, gk2, gk3, ga


_scores.defvjp(_scores_fwd, _scores_bwd)


def interactive_gat_scores_pallas(k1, k2, k3, a_vec, batch_tile: int = DEFAULT_BATCH_TILE):
    """Fused Eq.(8) scores. Falls back to the XLA expression off-TPU."""
    if jax.default_backend() != "tpu":
        return _scores_xla(k1, k2, k3, a_vec)
    return _scores(k1, k2, k3, a_vec, batch_tile)
