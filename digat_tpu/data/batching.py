"""Host-side batch iterators with device prefetch.

Replaces the reference's multiprocess DataLoader (trainer.py:75-80): since
batches are index-only (a few KB), a single background thread assembling
numpy index blocks and double-buffering them onto the device keeps the TPU
fed with no worker processes, no pinned-memory pools.

Training order shuffles per epoch with a seeded generator; under data
parallelism every host computes the same permutation (same seed) and takes
its own strided slice — the DistributedSampler equivalent
(trainer.py:78-80) without inter-host communication.

Tail batches are padded to the static batch size with weight-0 rows so every
step has identical shapes (one XLA program)."""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional

import jax
import numpy as np

from digat_tpu.models.model import DedupTrainBatch, EvalBatch, TrainBatch


def dedup_batch(batch: TrainBatch, news_node_id, capacity: int,
                news_title_text=None, vocab_size: int = 0) -> DedupTrainBatch:
    """Convert a TrainBatch to its unique-title form (asserts capacity).

    When `news_title_text` + `vocab_size` are given, also builds the
    sorted word-embedding-gradient metadata (ops.pallas.emb_grad) for the
    batch's token stream, enabling the scatter-free embedding backward."""
    node_ids = np.asarray(news_node_id)[np.asarray(batch.sample_idx)]
    hist = np.asarray(batch.history_idx)
    flat = np.concatenate([node_ids.ravel(), hist.ravel()])
    uniq, inv = np.unique(flat, return_inverse=True)
    assert len(uniq) <= capacity, (len(uniq), capacity)
    uniq_ids = np.zeros(capacity, np.int32)
    uniq_ids[: len(uniq)] = uniq
    split = node_ids.size
    emb = None
    if news_title_text is not None and vocab_size > 0:
        from digat_tpu.ops.pallas.emb_grad import build_sorted_emb_meta

        emb = build_sorted_emb_meta(
            np.asarray(news_title_text)[uniq_ids], vocab_size,
            ship_sort_arrays=False,  # device reconstructs perm/sid
        )
    return DedupTrainBatch(
        uniq_ids=uniq_ids,
        cand_inv=inv[:split].reshape(node_ids.shape).astype(np.int32),
        hist_inv=inv[split:].reshape(hist.shape).astype(np.int32),
        cat_idx=np.asarray(batch.cat_idx),
        sample_idx=np.asarray(batch.sample_idx),
        weight=np.asarray(batch.weight),
        emb=emb,
    )


def dedup_shards(batch: TrainBatch, news_node_id, capacity: int,
                 n_shards: int, news_title_text=None, vocab_size: int = 0):
    """Per-shard dedup for the shard_map data-parallel step: split the
    batch rows into `n_shards` contiguous groups (the layout jnp sharding
    of the leading axis produces), dedup each group independently, and
    stack to a ShardedDedupBatch. Returns None when any shard's unique
    count exceeds `capacity` (caller falls back to the plain batch) or the
    batch doesn't divide evenly."""
    from digat_tpu.models.model import ShardedDedupBatch

    B = batch.weight.shape[0]
    if B % n_shards:
        return None
    rows = B // n_shards
    parts = []
    for s in range(n_shards):
        sl = slice(s * rows, (s + 1) * rows)
        sub = TrainBatch(
            history_idx=np.asarray(batch.history_idx)[sl],
            cat_idx=np.asarray(batch.cat_idx)[sl],
            sample_idx=np.asarray(batch.sample_idx)[sl],
            weight=np.asarray(batch.weight)[sl],
        )
        node_ids = np.asarray(news_node_id)[sub.sample_idx]
        flat = np.concatenate([node_ids.ravel(), sub.history_idx.ravel()])
        if len(np.unique(flat)) > capacity:
            return None
        parts.append(dedup_batch(sub, news_node_id, capacity,
                                 news_title_text=news_title_text,
                                 vocab_size=vocab_size))
    stack = lambda *xs: np.stack(xs)
    emb = None
    if parts[0].emb is not None:
        emb = jax.tree.map(stack, *[p.emb for p in parts])
    return ShardedDedupBatch(
        uniq_ids=np.stack([p.uniq_ids for p in parts]),
        cand_inv=np.stack([p.cand_inv for p in parts]),
        hist_inv=np.stack([p.hist_inv for p in parts]),
        cat_idx=np.stack([p.cat_idx for p in parts]),
        sample_idx=np.stack([p.sample_idx for p in parts]),
        weight=np.stack([p.weight for p in parts]),
        emb=emb,
    )


def estimate_dedup_capacity(
    history_idx: np.ndarray,
    behavior_row: np.ndarray,
    pos: np.ndarray,
    negatives: np.ndarray,
    news_node_id: np.ndarray,
    batch_size: int,
    sample_batches: int = 32,
    headroom: float = 1.15,
    seed: int = 0,
) -> int:
    """Pick a static unique-title capacity: max unique count over sampled
    batches, with headroom, rounded up to 256. Batches that still overflow
    at runtime fall back to the non-dedup path (a second cached program)."""
    rng = np.random.default_rng(seed)
    num = len(pos)
    worst = 0
    for _ in range(sample_batches):
        sel = rng.choice(num, size=min(batch_size, num), replace=False)
        samples = np.concatenate([pos[sel, None], negatives[sel]], axis=1)
        flat = np.concatenate([
            news_node_id[samples].ravel(),
            history_idx[behavior_row[sel]].ravel(),
        ])
        worst = max(worst, len(np.unique(flat)))
    cap = int(np.ceil(worst * headroom / 256.0) * 256)
    worst_case = batch_size * (samples.shape[1] * news_node_id.shape[1]
                               + history_idx.shape[1])
    return min(cap, worst_case)


def train_batches(
    history_idx: np.ndarray,  # [rows, H] per behavior row
    cat_idx: np.ndarray,  # [rows, H]
    behavior_row: np.ndarray,  # [num_samples] -> row
    pos: np.ndarray,  # [num_samples]
    negatives: np.ndarray,  # [num_samples, K] (this epoch's draw)
    batch_size: int,
    *,
    epoch_seed: int,
    shard_index: int = 0,
    shard_count: int = 1,
    drop_remainder: bool = False,
    news_node_id: Optional[np.ndarray] = None,
    dedup_titles: int = 0,
    news_title_text: Optional[np.ndarray] = None,
    vocab_size: int = 0,
) -> Iterator[TrainBatch]:
    """When `dedup_titles` > 0 (and `news_node_id` is given) yields
    DedupTrainBatch with per-batch unique-title indices padded to that
    static capacity; batches that exceed it fall back to plain TrainBatch.
    `news_title_text` + `vocab_size` additionally attach sorted
    embedding-gradient metadata (see dedup_batch)."""
    num = len(pos)
    order = np.random.default_rng(epoch_seed).permutation(num)
    order = order[shard_index::shard_count]
    n = len(order)
    if drop_remainder:
        n = (n // batch_size) * batch_size
        order = order[:n]
    for s in range(0, len(order), batch_size):
        sel = order[s : s + batch_size]
        b = len(sel)
        samples = np.concatenate([pos[sel, None], negatives[sel]], axis=1)
        weight = np.ones(batch_size, np.float32)
        if b < batch_size:
            pad = batch_size - b
            sel = np.concatenate([sel, np.zeros(pad, np.int64)])
            samples = np.concatenate(
                [samples, np.zeros((pad, samples.shape[1]), samples.dtype)]
            )
            weight[b:] = 0.0
        rows = behavior_row[sel]
        hist = history_idx[rows]
        samples = samples.astype(np.int32)
        if dedup_titles > 0 and news_node_id is not None:
            node_ids = news_node_id[samples]  # [B, 1+K, Gn]
            flat = np.concatenate([node_ids.ravel(), hist.ravel()])
            uniq, inv = np.unique(flat, return_inverse=True)
            if len(uniq) > dedup_titles:
                # rare overflow: fall back to the plain path for this batch
                yield TrainBatch(
                    history_idx=hist,
                    cat_idx=cat_idx[rows].astype(np.int32),
                    sample_idx=samples,
                    weight=weight,
                )
                continue
            uniq_ids = np.zeros(dedup_titles, np.int32)
            uniq_ids[: len(uniq)] = uniq
            split = node_ids.size
            emb = None
            if news_title_text is not None and vocab_size > 0:
                from digat_tpu.ops.pallas.emb_grad import build_sorted_emb_meta

                emb = build_sorted_emb_meta(
                    news_title_text[uniq_ids], vocab_size,
                    ship_sort_arrays=False,  # device reconstructs perm/sid
                )
            yield DedupTrainBatch(
                uniq_ids=uniq_ids,
                cand_inv=inv[:split].reshape(node_ids.shape).astype(np.int32),
                hist_inv=inv[split:].reshape(hist.shape).astype(np.int32),
                cat_idx=cat_idx[rows].astype(np.int32),
                sample_idx=samples,
                weight=weight,
                emb=emb,
            )
        else:
            yield TrainBatch(
                history_idx=hist,
                cat_idx=cat_idx[rows].astype(np.int32),
                sample_idx=samples,
                weight=weight,
            )


def eval_batches(
    history_idx: np.ndarray,
    cat_idx: np.ndarray,
    imp_index: np.ndarray,  # [items] -> behavior row
    cand: np.ndarray,  # [items]
    batch_size: int,
    *,
    shard_index: int = 0,
    shard_count: int = 1,
) -> Iterator[tuple]:
    """Yields (EvalBatch, valid_count). Items keep file order; sharding is
    strided so hosts can score disjoint slices and allgather."""
    items = np.arange(len(cand))[shard_index::shard_count]
    for s in range(0, len(items), batch_size):
        sel = items[s : s + batch_size]
        b = len(sel)
        if b < batch_size:
            sel = np.concatenate([sel, np.zeros(batch_size - b, np.int64)])
        rows = imp_index[sel]
        yield (
            EvalBatch(
                history_idx=history_idx[rows],
                cat_idx=cat_idx[rows].astype(np.int32),
                cand_idx=cand[sel].astype(np.int32),
            ),
            b,
        )


class Prefetcher:
    """Runs an iterator in a background thread, keeping `depth` batches
    ready; optionally maps each element (e.g. jax.device_put) in the
    consumer thread to overlap host assembly with device compute."""

    _DONE = object()

    def __init__(self, it: Iterator, depth: int = 2, transform=None):
        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._transform = transform
        self._err: Optional[BaseException] = None

        def run():
            try:
                for item in it:
                    self._q.put(item)
            except BaseException as e:  # surfaced on next()
                self._err = e
            finally:
                self._q.put(self._DONE)

        self._thread = threading.Thread(target=run, daemon=True)
        self._thread.start()

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._DONE:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return self._transform(item) if self._transform else item
