"""Two-stage cached evaluation.

Mirrors the reference's compute_scores (util.py:10-85) — the capability that
makes full-corpus evaluation O(unique news), not O(impressions x graph):

  stage 1: encode every unique news once -> news_reps [news_num, D]; then
           the initial news-graph context c_n0 [news_num, D] in chunks;
  stage 2: per impression item, gather cached reps + run the graph encoder
           inference path; dot-product score.

TPU redesign: the reference materializes the gathered SAG representations
[news_num, Gn, D] on device (2.7 GB fp32 on MIND-small; util.py:36). Here
only the [news_num, D] tables stay resident and SAG node reps are gathered
per chunk/batch inside jit — same math, ~26x less HBM."""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from digat_tpu.data.batching import Prefetcher, eval_batches
from digat_tpu.data.user_graph import build_user_graph
from digat_tpu.eval import metrics as M
from digat_tpu.models.model import CorpusTables, EvalBatch, Model


def _pad_to(x: np.ndarray, n: int):
    if x.shape[0] == n:
        return x
    pad = [(0, n - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
    return np.pad(x, pad)


def _host_value(x) -> np.ndarray:
    """Full host value of a (possibly multi-process global) jax.Array."""
    if not isinstance(x, jax.Array) or x.is_fully_addressable:
        return np.asarray(x)
    if x.sharding.is_fully_replicated:
        return np.asarray(x.addressable_data(0))
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=True))


def _local_eval_mesh():
    """1-axis mesh over this process's devices for sharded eval stages.
    None on a single device (the plain-jit path serves it)."""
    devs = jax.local_devices()
    if len(devs) < 2:
        return None
    from jax.sharding import Mesh

    return Mesh(np.asarray(devs), ("data",))


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _specs_like(tree, spec):
    return jax.tree.map(lambda _: spec, tree)


def _shard_chunk_fn(mesh, per_dev: int, fn):
    """shard_map a stage-1 chunk function `fn(params, *tables, start)` over
    the local `data` axis: every device processes its own `per_dev`-row
    sub-chunk of the replicated tables (offset by axis index), outputs
    concatenate along the chunk axis. Under plain jit the Pallas stage
    kernels would be opaque custom calls and REPLICATE onto every device —
    the same wart the train step solved (train/train_step.py:37-56)."""
    from jax.sharding import PartitionSpec as P

    def offset(params, *args):
        *tables, start = args
        start = start + jax.lax.axis_index("data") * per_dev
        return fn(params, *tables, start)

    def wrapped(params, *args):
        return jax.shard_map(
            offset, mesh=mesh,
            in_specs=(_specs_like(params, P()),) + (P(),) * len(args),
            out_specs=P("data"),
            check_vma=False,
        )(params, *args)

    return jax.jit(wrapped)


def _shard_score_fn(mesh, fn):
    """shard_map the stage-2 scorer `fn(params, *caches, batch)`: batch
    split along items, params/tables/caches replicated. This closes the
    per-device version of the reference's idle-non-main-ranks eval wart
    (trainer.py:109-114) one level down: all local chips score."""
    from jax.sharding import PartitionSpec as P

    def wrapped(params, *args):
        *rep, batch = args
        return jax.shard_map(
            fn, mesh=mesh,
            in_specs=(_specs_like(params, P()),)
            + tuple(_specs_like(t, P()) for t in rep)
            + (_specs_like(batch, P("data")),),
            out_specs=P("data"),
            check_vma=False,
        )(params, *rep, batch)

    return jax.jit(wrapped)


class CachedScorer:
    """Holds the jitted stage functions for one model.

    With >1 local device the three stages run under `shard_map` over a
    local `data` mesh: stage-1 chunks are split n_dev ways (each device
    encodes / contextifies 1/n of the news chunk) and stage-2 batches are
    split along the item axis; tables and caches stay replicated. One
    device falls back to the measured plain-jit path."""

    def __init__(self, model: Model, batch_size: int = 1024, mesh=None):
        self.model = model
        self.mesh = _local_eval_mesh() if mesh is None else (mesh or None)
        n_dev = int(self.mesh.devices.size) if self.mesh is not None else 1
        self.batch_size = batch_size = _round_up(batch_size, n_dev)
        per_dev = batch_size // n_dev
        chunk = per_dev if self.mesh is not None else batch_size
        cfg = model.config

        def encode_chunk(params, text, mask, start):
            text = jax.lax.dynamic_slice_in_dim(text, start, chunk)
            mask = jax.lax.dynamic_slice_in_dim(mask, start, chunk)
            return model.encode_news(params, text, mask)

        def c_n0_chunk(params, node_id, gmask, news_reps, start):
            node_id = jax.lax.dynamic_slice_in_dim(node_id, start, chunk)
            gmask = jax.lax.dynamic_slice_in_dim(gmask, start, chunk)
            sag = news_reps[node_id]  # [b, Gn, D]
            return model.initial_news_context(params, sag, gmask)

        def score_batch(params, tables: CorpusTables, news_reps, c_n0,
                        batch: EvalBatch):
            user_reps = news_reps[batch.history_idx]  # [b, H, D]
            sag = news_reps[tables.news_node_id[batch.cand_idx]]  # [b, Gn, D]
            graph = tables.news_graph[batch.cand_idx]
            gmask = tables.news_graph_mask[batch.cand_idx]
            user_graph, cat_mask = build_user_graph(
                batch.cat_idx, cfg.max_history_num, cfg.category_num
            )
            return model.inference(
                params, user_reps, user_graph, cat_mask, batch.cat_idx,
                sag, graph, gmask, c_n0[batch.cand_idx],
            )

        if self.mesh is not None:
            self._encode_chunk = _shard_chunk_fn(self.mesh, per_dev, encode_chunk)
            self._c_n0_chunk = _shard_chunk_fn(self.mesh, per_dev, c_n0_chunk)
            self._score_batch = _shard_score_fn(self.mesh, score_batch)
        else:
            self._encode_chunk = jax.jit(encode_chunk)
            self._c_n0_chunk = jax.jit(c_n0_chunk)
            self._score_batch = jax.jit(score_batch)

    # ------------------------------------------------------------------
    def _commit(self, tree):
        """Device-commit a pytree once (replicated over the eval mesh when
        sharded). Host-numpy leaves — e.g. params loaded from a checkpoint
        or gathered back from a multi-process train mesh — would otherwise
        re-upload on EVERY stage dispatch; on a remote-attached TPU that
        is ~0.5 s/batch of pure transfer (measured), drowning the 10 ms
        compute."""
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            return jax.device_put(tree, NamedSharding(self.mesh, P()))
        return jax.device_put(tree)

    def cache_news(self, params, tables: CorpusTables):
        """Stage 1: (news_reps [N, D], c_n0 [N, D]) device arrays. Tables
        are zero-padded to a chunk multiple so every chunk shares one
        compiled program."""
        params = self._commit(params)
        n = tables.news_title_text.shape[0]
        bs = self.batch_size
        pad = (-n) % bs
        padded = lambda x: jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1))
        text, mask = padded(tables.news_title_text), padded(tables.news_title_mask)
        reps = [
            self._encode_chunk(params, text, mask, s) for s in range(0, n + pad, bs)
        ]
        news_reps = jnp.concatenate(reps)[:n]
        node_id = padded(tables.news_node_id)
        gmask = padded(tables.news_graph_mask)
        c0 = [
            self._c_n0_chunk(params, node_id, gmask, news_reps, s)
            for s in range(0, n + pad, bs)
        ]
        c_n0 = jnp.concatenate(c0)[:n]
        return news_reps, c_n0

    # ------------------------------------------------------------------
    def score_items(
        self,
        params,
        tables: CorpusTables,
        history_idx: np.ndarray,
        cat_idx: np.ndarray,
        imp_index: np.ndarray,
        cand: np.ndarray,
        *,
        shard_index: int = 0,
        shard_count: int = 1,
    ) -> np.ndarray:
        """Stage 2: scores for every impression item (this shard's slice
        filled; other positions zero)."""
        params = self._commit(self.model.cast_params(params))  # bf16 opt-in
        news_reps, c_n0 = self.cache_news(params, tables)
        scores = np.zeros(len(cand), np.float32)
        item_ids = np.arange(len(cand))[shard_index::shard_count]
        it = eval_batches(
            history_idx, cat_idx, imp_index, cand, self.batch_size,
            shard_index=shard_index, shard_count=shard_count,
        )
        # keep outputs as device arrays and materialize once after the
        # loop: a per-batch np.asarray would force a host sync between
        # dispatches (each one a full RPC round-trip on remote-attached
        # TPUs), serializing the eval stream
        pending = []
        for batch, valid in Prefetcher(it, depth=2):
            pending.append(
                (self._score_batch(params, tables, news_reps, c_n0, batch),
                 valid)
            )
        pos = 0
        for s, valid in pending:
            scores[item_ids[pos : pos + valid]] = np.asarray(s[:valid])
            pos += valid
        return scores


class NRMSCachedScorer:
    """Dual-cache eval for the NRMS family (Appendix-B/util.py:20-55):
    plain reps feed the user encoder; SA-fused reps (computed *from* the
    cached plain reps — the fusion attends over neighbor reps produced by
    the same tower) score candidates."""

    def __init__(self, model, batch_size: int = 1024, mesh=None):
        self.model = model
        self.mesh = _local_eval_mesh() if mesh is None else (mesh or None)
        n_dev = int(self.mesh.devices.size) if self.mesh is not None else 1
        self.batch_size = batch_size = _round_up(batch_size, n_dev)
        per_dev = batch_size // n_dev
        chunk = per_dev if self.mesh is not None else batch_size
        st = model.st

        def encode_chunk(params, text, mask, start):
            import jax.random as jr

            text = jax.lax.dynamic_slice_in_dim(text, start, chunk)
            mask = jax.lax.dynamic_slice_in_dim(mask, start, chunk)
            return model._encode_titles(
                params, st, jr.PRNGKey(0), False, text, mask
            )

        def fuse_chunk(params, plain_reps, aug_ids, start):
            import jax.random as jr

            ids = jax.lax.dynamic_slice_in_dim(aug_ids, start, chunk)
            own = jax.lax.dynamic_slice_in_dim(plain_reps, start, chunk)
            aug = plain_reps[ids]  # [b, M, D]
            return model._fuse_sa(params, st, jr.PRNGKey(0), False, own, aug)

        def score_batch(params, plain_reps, cand_reps, batch: EvalBatch):
            hist = plain_reps[batch.history_idx]
            user = model.encode_user(params, hist, batch.history_idx != 0)
            return jnp.einsum("bd,bd->b", cand_reps[batch.cand_idx], user)

        if self.mesh is not None:
            self._encode_chunk = _shard_chunk_fn(self.mesh, per_dev, encode_chunk)
            self._fuse_chunk = _shard_chunk_fn(self.mesh, per_dev, fuse_chunk)
            self._score_batch = _shard_score_fn(self.mesh, score_batch)
        else:
            self._encode_chunk = jax.jit(encode_chunk)
            self._fuse_chunk = jax.jit(fuse_chunk)
            self._score_batch = jax.jit(score_batch)

    _commit = CachedScorer._commit

    def cache_news(self, params, tables):
        params = self._commit(params)
        n = tables.news_title_text.shape[0]
        bs = self.batch_size
        pad = (-n) % bs
        padded = lambda x: jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1))
        text, mask = padded(tables.news_title_text), padded(tables.news_title_mask)
        reps = [
            self._encode_chunk(params, text, mask, s) for s in range(0, n + pad, bs)
        ]
        plain = jnp.concatenate(reps)[:n]
        if not self.model.st.sa:
            return plain, plain
        aug_ids = padded(tables.augmented_news)
        plain_padded = jnp.pad(plain, [(0, pad), (0, 0)])
        fused = [
            self._fuse_chunk(params, plain_padded, aug_ids, s)
            for s in range(0, n + pad, bs)
        ]
        return plain, jnp.concatenate(fused)[:n]

    def score_items(self, params, tables, history_idx, cat_idx, imp_index,
                    cand, *, shard_index: int = 0, shard_count: int = 1):
        # bf16 opt-in, same as CachedScorer (the reference's Appendix-B
        # eval runs whatever dtype the model holds, util.py:20-55)
        params = self._commit(self.model.cast_params(params))
        plain, fused = self.cache_news(params, tables)
        scores = np.zeros(len(cand), np.float32)
        item_ids = np.arange(len(cand))[shard_index::shard_count]
        it = eval_batches(
            history_idx, cat_idx, imp_index, cand, self.batch_size,
            shard_index=shard_index, shard_count=shard_count,
        )
        pending = []  # no per-batch host sync (see CachedScorer)
        for batch, valid in Prefetcher(it, depth=2):
            pending.append(
                (self._score_batch(params, plain, fused, batch), valid)
            )
        pos = 0
        for s, valid in pending:
            scores[item_ids[pos : pos + valid]] = np.asarray(s[:valid])
            pos += valid
        return scores


_SCORER_CACHE: dict = {}


def _get_scorer(model, bs: int):
    """One scorer (= one set of jitted stage closures) per live model.
    Rebuilding the scorer per call would re-trace and re-compile all three
    stages on EVERY eval — measured at ~26 s extra per dev epoch on the
    remote-attached chip vs 1.5 s with the cached closures."""
    import weakref

    key = id(model)
    entry = _SCORER_CACHE.get(key)
    if entry is not None and entry[0]() is model and entry[1] == bs:
        return entry[2]
    cls = (
        NRMSCachedScorer
        if getattr(model, "family", "digat") == "nrms" else CachedScorer
    )
    scorer = cls(model, bs)
    _SCORER_CACHE[key] = (weakref.ref(model), bs, scorer)
    return scorer


def compute_scores(
    model,
    params,
    corpus,
    mode: str,
    batch_size: Optional[int] = None,
    result_file: Optional[str] = None,
) -> Tuple[float, float, float, float]:
    """End-to-end dev/test scoring -> (auc, mrr, ndcg5, ndcg10). Dispatches
    on the model family (DIGAT two-stage graph cache vs NRMS dual cache)."""
    assert mode in ("dev", "test")
    if jax.process_count() > 1:
        # the scorer's jits are process-local (each process scores its own
        # item shard); params living on the global train mesh must come
        # back to host first, or local and global device assignments mix
        params = jax.tree.map(_host_value, params)
    bs = batch_size or model.config.effective_eval_batch_size()
    scorer = _get_scorer(model, bs)
    tables = (
        corpus.nrms_tables()
        if getattr(model, "family", "digat") == "nrms" else corpus.tables()
    )
    split = corpus.splits[mode]
    imp_index = getattr(corpus, f"{mode}_imp_index")
    cand = getattr(corpus, f"{mode}_cand")
    labels = getattr(corpus, f"{mode}_labels")
    # multi-host: each process scores a strided shard; non-shard slots stay
    # zero, so a cross-process sum reassembles the full vector (the
    # reference instead idles all non-main ranks during eval,
    # trainer.py:109-114)
    scores = scorer.score_items(
        params, tables, split.history_idx, split.cat_idx, imp_index, cand,
        shard_index=jax.process_index(), shard_count=jax.process_count(),
    )
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        scores = np.asarray(
            multihost_utils.process_allgather(scores)
        ).sum(axis=0)
    if result_file:
        M.write_rank_file(result_file, M.group_by_impression(imp_index, scores))
    if getattr(corpus, f"{mode}_unlabeled", np.asarray(labels).sum() == 0):
        # unlabeled split (MIND-large test): rank file is the deliverable,
        # metrics come from the leaderboard (reference util.py:81-82). The
        # corpus preserves the -1 sentinel pre-clamp, so a labeled split
        # with zero positives still gets a metrics row.
        return (float("nan"),) * 4
    return M.score_impressions_flat(imp_index, labels, scores)
