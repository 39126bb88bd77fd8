"""Fused interactive-GAT layer (inference) Pallas TPU kernel.

One eval-mode GAT layer of the dual-graph encoder (reference
graphEncoders.py:143-154 / 163-174, eval path util.py:51-69) is, composed
from XLA ops, five matmuls plus six elementwise passes with every
intermediate ([B,G,D] h/k1/k2, [B,G,G] scores/leaky/masked/softmax)
round-tripping HBM. This kernel runs the whole layer per batch-tile out of
VMEM:

    h  = x @ W + bW
    k1 = x @ Wf1          k2 = x @ Wf2          k3 = query @ Wf3 + bf3
    s[i, j]  = a . relu(k1[j] + k2[i] + k3)     (Eq.(8) scores)
    e        = leaky_relu(s, 0.2)
    alpha    = softmax_j(where(adj, e, -1e9))
    out      = relu(alpha @ h) + x

The projections and the alpha @ h contraction hit the MXU at
[TB*G, D] x [D, D] / batched [G, G] x [G, D]; the score sweep is the same
VPU i-loop as ops/pallas/gat_scores.py. Inference-only (the training path
keeps the composable ops + custom-VJP score kernel): no dropout, no
backward. Matmul precision is DEFAULT, matching what XLA uses for the
composed fp32 eval path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from digat_tpu.ops.pallas import runtime as _rt

from digat_tpu.layers import MASK_FILL

DEFAULT_BATCH_TILE = 8

# i-sweep unroll width (see _layer_kernel); 1 restores the row-at-a-time
# sweep. Overridable for A/B: DIGAT_GAT_UNROLL.
import os as _os

_UNROLL = max(int(_os.environ.get("DIGAT_GAT_UNROLL", "8")), 1)


def _layer_kernel(slope, x_ref, adj_ref, q_ref, W_ref, bW_ref, W1_ref,
                  W2_ref, W3_ref, b3_ref, a_ref, out_ref, s_ref, k2_ref):
    TB, G, D = x_ref.shape
    prec = jax.lax.Precision.DEFAULT
    x = x_ref[:, :, :].astype(jnp.float32)
    x2 = x.reshape(TB * G, D)
    dot = functools.partial(
        jax.lax.dot, precision=prec, preferred_element_type=jnp.float32
    )
    h = dot(x2, W_ref[:, :].astype(jnp.float32)) + bW_ref[0, :]
    k1 = dot(x2, W1_ref[:, :].astype(jnp.float32)).reshape(TB, G, D)
    # staged through VMEM scratch: Mosaic only supports dynamic row
    # indexing (the i-sweep below) on refs, not on traced values
    k2_ref[:, :, :] = dot(x2, W2_ref[:, :].astype(jnp.float32)).reshape(TB, G, D)
    k3 = dot(q_ref[:, :].astype(jnp.float32), W3_ref[:, :].astype(jnp.float32))
    k3 = k3 + b3_ref[0, :]
    a = a_ref[0, :].astype(jnp.float32)
    base = k1 + k3[:, None, :]  # [TB, G, D], j-indexed

    # i-sweep unrolled IB center rows per step: one [TB, IB, G, D] relu
    # sweep amortizes the loop and layout overhead (measured 5.40 -> 4.84 ms
    # at B=1024 G=68 fp32, bit-identical output)
    IB = _UNROLL

    def block(i0, width):
        rows = k2_ref[:, pl.ds(i0, width), :]  # [TB, width, D]
        t = jax.nn.relu(base[:, None, :, :] + rows[:, :, None, :])
        s_ref[:, pl.ds(i0, width), :] = jnp.sum(
            t * a[None, None, None, :], axis=-1
        )

    def body(i, _):
        block(i * IB, IB)
        return 0

    jax.lax.fori_loop(0, G // IB, body, 0)
    if G % IB:
        block((G // IB) * IB, G % IB)
    s = s_ref[:, :, :]
    e = jnp.where(s > 0, s, slope * s)
    e = jnp.where(adj_ref[:, :, :], e, MASK_FILL)
    e = e - jnp.max(e, axis=2, keepdims=True)
    p = jnp.exp(e)
    alpha = p / jnp.sum(p, axis=2, keepdims=True)
    out = jax.lax.dot_general(
        alpha, h.reshape(TB, G, D), (((2,), (1,)), ((0,), (0,))),
        precision=prec, preferred_element_type=jnp.float32,
    )
    out_ref[:, :, :] = (jax.nn.relu(out) + x).astype(out_ref.dtype)


def _fused_xla(x, adj, query, W, bW, W1, W2, W3, b3, a_vec, slope):
    """Reference composition (off-TPU fallback; same math)."""
    xf = x.astype(jnp.float32)
    h = xf @ W + bW
    k1 = xf @ W1
    k2 = xf @ W2
    k3 = query.astype(jnp.float32) @ W3 + b3
    t = jax.nn.relu(k1[:, None, :, :] + k2[:, :, None, :] + k3[:, None, None, :])
    s = jnp.einsum("bijd,d->bij", t, a_vec)
    e = jnp.where(s > 0, s, slope * s)
    e = jnp.where(adj.astype(bool), e, MASK_FILL)
    alpha = jax.nn.softmax(e, axis=2)
    return (jax.nn.relu(jnp.einsum("bij,bjd->bid", alpha, h)) + xf).astype(x.dtype)


def interactive_gat_layer_fused(
    x, adj, query, W, bW, W1, W2, W3, b3, a_vec,
    *, negative_slope: float = 0.2, batch_tile: int = DEFAULT_BATCH_TILE,
    interpret: bool = False,
):
    """x: [B, G, D]; adj: [B, G, G] bool; query: [B, D]; weight matrices
    [D, D]; biases [D]; a_vec [D]. Returns the updated node states [B, G, D]
    (see module docstring). Inference only — not differentiable."""
    interpret = interpret or _rt.INTERPRET
    if jax.default_backend() != "tpu" and not interpret:
        return _fused_xla(x, adj, query, W, bW, W1, W2, W3, b3, a_vec,
                          negative_slope)
    B, G, D = x.shape
    TB = batch_tile
    pad = (-B) % TB
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0), (0, 0)))
        adj = jnp.pad(adj, ((0, pad), (0, 0), (0, 0)), constant_values=True)
        query = jnp.pad(query, ((0, pad), (0, 0)))
    Bp = B + pad
    wspec = pl.BlockSpec((D, D), lambda b: (0, 0), memory_space=pltpu.VMEM)
    vspec = pl.BlockSpec((1, D), lambda b: (0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_layer_kernel, negative_slope),
        grid=(Bp // TB,),
        in_specs=[
            pl.BlockSpec((TB, G, D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, G, G), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, D), lambda b: (b, 0), memory_space=pltpu.VMEM),
            wspec, vspec, wspec, wspec, wspec, vspec, vspec,
        ],
        out_specs=pl.BlockSpec((TB, G, D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, G, D), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((TB, G, G), jnp.float32),
            pltpu.VMEM((TB, G, D), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * Bp * G * D * (3 * D + G) + 2 * Bp * G * G * D,
            bytes_accessed=(2 * Bp * G * D + Bp * G * G + Bp * D) * 4,
            transcendentals=Bp * G * G,
        ),
        interpret=interpret,
    )(x, adj, query, W, bW[None, :], W1, W2, W3, b3[None, :], a_vec[None, :])
    return out[:B]
