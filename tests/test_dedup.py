"""Unique-title dedup: exact numerical parity with the plain path."""

import jax
import jax.numpy as jnp
import numpy as np

import __graft_entry__ as graft
from digat_tpu.data import batching
from digat_tpu.models.model import DedupTrainBatch, Model, TrainBatch


def make_dedup(batch: TrainBatch, news_node_id, capacity: int):
    node_ids = np.asarray(news_node_id)[np.asarray(batch.sample_idx)]
    hist = np.asarray(batch.history_idx)
    flat = np.concatenate([node_ids.ravel(), hist.ravel()])
    uniq, inv = np.unique(flat, return_inverse=True)
    assert len(uniq) <= capacity
    uniq_ids = np.zeros(capacity, np.int32)
    uniq_ids[: len(uniq)] = uniq
    split = node_ids.size
    return DedupTrainBatch(
        uniq_ids=jnp.asarray(uniq_ids),
        cand_inv=jnp.asarray(inv[:split].reshape(node_ids.shape), jnp.int32),
        hist_inv=jnp.asarray(inv[split:].reshape(hist.shape), jnp.int32),
        cat_idx=batch.cat_idx,
        sample_idx=batch.sample_idx,
        weight=batch.weight,
    )


def test_dedup_forward_matches_plain():
    cfg = graft._tiny_config()
    model = Model(cfg)
    tables, batch = graft._tiny_data(cfg)
    params = model.init(jax.random.PRNGKey(0))
    rng = jax.random.PRNGKey(1)
    plain = model.forward_indexed(params, tables, batch, rng, train=False)
    dedup = make_dedup(batch, tables.news_node_id, 512)
    deduped = model.forward_indexed(params, tables, dedup, rng, train=False)
    np.testing.assert_allclose(
        np.asarray(plain), np.asarray(deduped), rtol=1e-5, atol=1e-5
    )


def test_dedup_grads_match_plain():
    cfg = graft._tiny_config()
    model = Model(cfg)
    tables, batch = graft._tiny_data(cfg)
    params = model.init(jax.random.PRNGKey(2))
    dedup = make_dedup(batch, tables.news_node_id, 512)

    # eval-mode loss (dropout off) so rng stream differences vanish
    def loss_of(b):
        def f(p):
            logits = model.forward_indexed(
                p, tables, b, jax.random.PRNGKey(0), train=False
            )
            return -jnp.mean(jax.nn.log_softmax(logits, 1)[:, 0])
        return jax.grad(f)(params)

    g1 = loss_of(batch)
    g2 = loss_of(dedup)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-5
        )


def test_batching_emits_dedup_and_fallback():
    rng = np.random.default_rng(0)
    rows, H, Gn, news = 40, 6, 4, 30
    history_idx = rng.integers(0, news, (rows, H)).astype(np.int32)
    cat_idx = rng.integers(0, 4, (rows, H)).astype(np.int16)
    behavior_row = np.arange(rows, dtype=np.int32)
    pos = rng.integers(1, news, rows).astype(np.int32)
    negatives = rng.integers(1, news, (rows, 4)).astype(np.int32)
    node_id = rng.integers(0, news, (news, Gn)).astype(np.int32)

    batches = list(batching.train_batches(
        history_idx, cat_idx, behavior_row, pos, negatives, 8,
        epoch_seed=0, news_node_id=node_id, dedup_titles=256,
    ))
    assert all(isinstance(b, DedupTrainBatch) for b in batches)
    # inverse mapping reconstructs the original ids
    b = batches[0]
    samples = np.asarray(b.sample_idx)
    np.testing.assert_array_equal(
        np.asarray(b.uniq_ids)[np.asarray(b.cand_inv)], node_id[samples]
    )

    # capacity 1: every batch overflows -> plain fallback
    batches = list(batching.train_batches(
        history_idx, cat_idx, behavior_row, pos, negatives, 8,
        epoch_seed=0, news_node_id=node_id, dedup_titles=1,
    ))
    assert all(isinstance(b, TrainBatch) for b in batches)


def test_estimate_capacity_bounds():
    rng = np.random.default_rng(1)
    rows, H, Gn, news = 64, 6, 4, 1000
    history_idx = rng.integers(0, news, (rows, H)).astype(np.int32)
    behavior_row = np.arange(rows, dtype=np.int32)
    pos = rng.integers(1, news, rows).astype(np.int32)
    negatives = rng.integers(1, news, (rows, 4)).astype(np.int32)
    node_id = rng.integers(0, news, (news, Gn)).astype(np.int32)
    cap = batching.estimate_dedup_capacity(
        history_idx, behavior_row, pos, negatives, node_id, 16
    )
    assert cap % 256 == 0 or cap == 16 * (5 * Gn + H)
    assert 0 < cap <= 16 * (5 * Gn + H)
