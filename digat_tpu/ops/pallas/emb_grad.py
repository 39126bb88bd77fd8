"""Sorted embedding-gradient accumulation: a Pallas TPU replacement for the
word-embedding backward scatter-add.

The VJP of `table[tok]` is a scatter-add of ~|tok| gradient rows into the
[V, D] table. XLA's TPU scatter lowering costs ~25 ms for the training
step's 327k-row embedding gradient (B=64, 10k-title dedup capacity, L=32) —
about 30% of the whole step. The reference never sees this cost because
cuDNN embedding backward uses HBM atomics (SURVEY.md §2.4); TPUs have no
scatter atomics, so the TPU-native answer is to *sort* instead:

  1. host (in the prefetch thread, while the device computes): argsort the
     batch's flat token stream once per batch — the tokens are known when
     the batch is assembled (`build_sorted_emb_meta`);
  2. device: permute the incoming gradient rows into token order (one fast
     XLA gather), then run this kernel: a work-list walk over (table-tile,
     sorted-chunk) pairs where each step builds the tile-local one-hot
     indicator [R, C] on the VPU and accumulates `one_hot @ grad_chunk` on
     the MXU into a VMEM-resident [R, D] table tile.

Because the ids are sorted, each gradient chunk touches only the few table
tiles its id range spans, so the total work is O(Ntok·R·D) MXU flops
(~25 GFLOP at the training shapes — ~1 ms) instead of a serialized scatter.
The work list is data-dependent, so it is computed on the host per batch
and fed through scalar prefetch; every table tile appears as one contiguous
run of work items (sorted order guarantees it), which makes the
revisited-output-block accumulation pattern valid, and tiles with no tokens
get a sentinel item so every output block is initialized.

One-hot rows are exact {0,1}, so with HIGHEST-precision fp32 the result
matches the scatter-add up to fp32 summation order.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Default geometry: C = sorted-gradient chunk rows, R = table tile rows.
# FLOPs scale as Ntok*R*D + Ntiles*R*C*D; R=128 minimizes the first term
# while keeping full MXU sublane occupancy, C=512 amortizes the per-item
# grid overhead.
DEFAULT_CHUNK = 512
DEFAULT_TILE = 128


class EmbGradMeta(NamedTuple):
    """Per-batch host-computed sort metadata (all int32).

    perm:     [Ntok_p]        token-slot permutation into sorted-id order.
                              Pad slots (sorted past Ntok) are clamped to 0:
                              their sorted id is the sentinel, whose one-hot
                              row is all-zero, so the gathered row value is
                              irrelevant — no zero-padding of the gradient
                              rows is ever materialized.
    sid:      [Nchunks+1, C]  sorted token ids by chunk; the last chunk is
                              an all-sentinel (= V_pad) row used by no-op
                              work items
    wt_tile:  [W]             output table-tile index per work item
    wt_chunk: [W]             sorted-chunk index per work item (sid lookup)
    wt_gp:    [W]             gradient-chunk index per work item — equals
                              wt_chunk except sentinel items read chunk 0
                              (any valid block; the sentinel sid row zeroes
                              the contribution)
    """

    perm: np.ndarray
    sid: np.ndarray
    wt_tile: np.ndarray
    wt_chunk: np.ndarray
    wt_gp: np.ndarray


def meta_shape(ntok: int, vocab_size: int, chunk: int = DEFAULT_CHUNK,
               tile: int = DEFAULT_TILE):
    """(Ntok_p, Nchunks, Ntiles, W): the static shapes of EmbGradMeta."""
    ntok_p = -(-ntok // chunk) * chunk
    nchunks = ntok_p // chunk
    ntiles = -(-vocab_size // tile)
    return ntok_p, nchunks, ntiles, nchunks + ntiles


def build_sorted_emb_meta(tok: np.ndarray, vocab_size: int,
                          chunk: int = DEFAULT_CHUNK,
                          tile: int = DEFAULT_TILE,
                          ship_sort_arrays: bool = True) -> EmbGradMeta:
    """Host-side: sort the batch's token stream and build the kernel work
    list. `tok`: any-int array of token ids in [0, vocab_size).

    `ship_sort_arrays=False` returns perm=None / sid=None: the backward
    reconstructs both ON DEVICE from `tok` with an identical stable
    argsort (stable sorts are unique, so host np.argsort and device
    jnp.argsort agree bit-for-bit). Only the ~KB work list — which MUST be
    host-built because it feeds Pallas scalar prefetch — is shipped. This
    cuts the per-step host->device traffic ~20x, which matters doubly on
    tunnel-attached TPUs where the axon client leaks host staging for
    every transferred byte (docs/PERF.md round-5 leak study)."""
    flat = np.asarray(tok).ravel().astype(np.int32)
    ntok = flat.size
    ntok_p, nchunks, ntiles, W = meta_shape(ntok, vocab_size, chunk, tile)
    v_pad = ntiles * tile
    ids = np.full(ntok_p, v_pad, np.int32)
    ids[:ntok] = flat
    perm = np.argsort(ids, kind="stable").astype(np.int32)
    sid_flat = ids[perm]
    # sentinel chunk appended, then rows padded to a multiple of 8 so the
    # kernel can read aligned 8-row sid blocks
    rows8 = -(-(nchunks + 1) // 8) * 8
    sid = np.full((rows8, chunk), v_pad, np.int32)
    sid[:nchunks] = sid_flat.reshape(nchunks, chunk)
    sent = nchunks  # the all-sentinel chunk
    # chunk c covers table tiles [lo_c, hi_c] (sentinel ids excluded by the
    # Ntiles-1 clamp: their tile index is Ntiles and they match no out row)
    lo = sid_flat[::chunk] // tile
    hi = np.minimum(sid_flat[chunk - 1 :: chunk] // tile, ntiles - 1)
    wt_tile = np.full(W, ntiles - 1, np.int32)
    wt_chunk = np.full(W, sent, np.int32)
    w = 0
    next_tile = 0
    for c in range(nchunks):
        if lo[c] >= ntiles:  # all-sentinel chunk (pure padding)
            continue
        for t in range(lo[c], hi[c] + 1):
            while next_tile < t:  # tiles with no tokens: sentinel visit
                wt_tile[w], wt_chunk[w] = next_tile, sent
                w += 1
                next_tile += 1
            wt_tile[w], wt_chunk[w] = t, c
            w += 1
            next_tile = t + 1
    while next_tile < ntiles:
        wt_tile[w], wt_chunk[w] = next_tile, sent
        w += 1
        next_tile += 1
    assert w <= W, (w, W)
    perm = np.where(perm < ntok, perm, 0).astype(np.int32)
    wt_gp = np.where(wt_chunk == sent, 0, wt_chunk).astype(np.int32)
    if not ship_sort_arrays:
        return EmbGradMeta(perm=None, sid=None, wt_tile=wt_tile,
                           wt_chunk=wt_chunk, wt_gp=wt_gp)
    return EmbGradMeta(perm=perm, sid=sid, wt_tile=wt_tile, wt_chunk=wt_chunk,
                       wt_gp=wt_gp)


def _device_sort_arrays(tok, vocab_size: int, chunk: int, tile: int):
    """In-jit reconstruction of (perm, sid) — the device-side mirror of
    build_sorted_emb_meta's sorting prologue."""
    ntok = tok.size
    ntok_p, nchunks, ntiles, _ = meta_shape(ntok, vocab_size, chunk, tile)
    v_pad = ntiles * tile
    ids = jnp.full((ntok_p,), v_pad, jnp.int32)
    ids = ids.at[:ntok].set(tok.ravel().astype(jnp.int32))
    perm_full = jnp.argsort(ids, stable=True).astype(jnp.int32)
    sid_flat = ids[perm_full]
    rows8 = -(-(nchunks + 1) // 8) * 8
    sid = jnp.full((rows8, chunk), v_pad, jnp.int32)
    sid = sid.at[:nchunks].set(sid_flat.reshape(nchunks, chunk))
    perm = jnp.where(perm_full < ntok, perm_full, 0)
    return perm, sid


def _rowsum_kernel(tile_rows, wt_tile_ref, wt_chunk_ref, wt_gp_ref, gp_ref,
                   sid_ref, out_ref):
    w = pl.program_id(0)
    t = wt_tile_ref[w]
    first = jnp.logical_or(w == 0, t != wt_tile_ref[jnp.maximum(w - 1, 0)])
    R, C = tile_rows, sid_ref.shape[1]
    # sid arrives as an 8-row block (Mosaic needs sublane-divisible blocks);
    # the row for this work item is chunk mod 8
    sid_row = sid_ref[wt_chunk_ref[w] % 8, :]
    rows = t * R + jax.lax.broadcasted_iota(jnp.int32, (R, C), 0)
    one_hot = (rows == sid_row[None, :]).astype(jnp.float32)
    contrib = jax.lax.dot(
        one_hot, gp_ref[:, :].astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )

    @pl.when(first)
    def _():
        out_ref[:, :] = contrib

    @pl.when(jnp.logical_not(first))
    def _():
        out_ref[:, :] += contrib


def sorted_rowsum(gp, sid, wt_tile, wt_chunk, wt_gp, vocab_size: int,
                  tile: int = DEFAULT_TILE, interpret: bool = False):
    """gp: [Ntok_p, D] gradient rows in sorted-id order; sid/wt_*: from
    build_sorted_emb_meta. Returns [vocab_size, D] fp32 row sums.

    Sentinel work items (tiles with no tokens) read gp chunk 0 via wt_gp —
    the sentinel sid row zeroes their one-hot, so no zero chunk is ever
    appended to gp (the old pad copied the whole gradient array once)."""
    ntok_p, D = gp.shape
    nchunks_p, C = sid.shape
    ntiles = -(-vocab_size // tile)
    W = wt_tile.shape[0]
    out = pl.pallas_call(
        functools.partial(_rowsum_kernel, tile),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(W,),
            in_specs=[
                pl.BlockSpec((C, D), lambda w, tt, tc, tg: (tg[w], 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, C), lambda w, tt, tc, tg: (tc[w] // 8, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tile, D), lambda w, tt, tc, tg: (tt[w], 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((ntiles * tile, D), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * W * tile * C * D,
            bytes_accessed=(ntok_p * D + ntiles * tile * D + W * C) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(wt_tile, wt_chunk, wt_gp, gp, sid)
    return out[:vocab_size]


# ---------------------------------------------------------------------------
# custom-VJP embedding lookup
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def _lookup(table, tok, perm, sid, wt_tile, wt_chunk, wt_gp, tile, interpret,
            chunk):
    return table[tok]


def _lookup_fwd(table, tok, perm, sid, wt_tile, wt_chunk, wt_gp, tile,
                interpret, chunk):
    return table[tok], (tok, perm, sid, wt_tile, wt_chunk, wt_gp,
                        table.shape[0])


def _lookup_bwd(tile, interpret, chunk, res, g):
    tok, perm, sid, wt_tile, wt_chunk, wt_gp, V = res
    D = g.shape[-1]
    g2 = g.reshape(-1, D).astype(jnp.float32)
    if jax.default_backend() == "tpu" or interpret:
        if perm is None:
            # device-side sort-array reconstruction (see
            # build_sorted_emb_meta ship_sort_arrays=False)
            perm, sid = _device_sort_arrays(tok, V, chunk, tile)
        # perm entries are clamped into [0, Ntok): pad slots gather row 0,
        # whose contribution the sentinel sid zeroes — no pad copy needed
        gp = g2[perm]  # [Ntok_p, D] rows in sorted-id order
        dW = sorted_rowsum(gp, sid, wt_tile, wt_chunk, wt_gp, V, tile,
                           interpret)
    else:  # CPU/GPU: plain scatter-add (same math)
        dW = jnp.zeros((V, D), jnp.float32).at[tok.ravel()].add(g2)
    return (dW, None, None, None, None, None, None)


_lookup.defvjp(_lookup_fwd, _lookup_bwd)


def embedding_lookup(table, tok, meta: EmbGradMeta | None,
                     tile: int = DEFAULT_TILE, interpret: bool = False,
                     chunk: int = DEFAULT_CHUNK):
    from digat_tpu.ops.pallas.runtime import INTERPRET

    interpret = interpret or INTERPRET
    """`table[tok]` whose backward uses the sorted row-sum kernel when
    `meta` (built from this exact `tok` array) is provided."""
    if meta is None:
        return table[tok]
    return _lookup(table, tok, meta.perm, meta.sid, meta.wt_tile,
                   meta.wt_chunk, meta.wt_gp, tile, interpret, chunk)
