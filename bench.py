"""Benchmark: MSA-DIGAT inference + train throughput on one chip.

Measures the two-stage cached-inference scoring rate (impression items/s)
at the reference configuration (MSA news encoder, DIGAT graph encoder,
D=400, depth 3, 26-node SAG graphs, 50-news history + 18 topic nodes) on
MIND-small-shaped synthetic tables, plus the training-step rate.

Baseline: the reference reports ~600 s to score the full MIND-small test
split (73,152 impressions x ~37 candidates ~= 2.71M items) in fp32 on an
RTX 3090 (reference README.md:64) => ~4,500 items/s. `vs_baseline` is
ours / 4500.

Prints ONE JSON line on stdout; diagnostics go to stderr.

Timing note: through the axon tunnel `block_until_ready` does not wait for
device completion, so every measurement here dispatches two run lengths
(N1 < N2 batches), forces completion with a host readback of the last
output, and reports the marginal (t2 - t1) / (N2 - N1) — in-order device
execution makes that the true steady-state per-batch time, with RPC
overhead cancelled.
"""

from __future__ import annotations

import functools
import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def marginal_time(run, n1: int, n2: int, readback, trials: int = 3) -> float:
    """Per-iteration seconds via two-point marginal timing, median of
    `trials` (readback RPC latency through the tunnel is noisy, so n2 - n1
    must be large enough that the marginal compute dominates)."""
    run(n1)  # warm any remaining compile/caches
    estimates = []
    for _ in range(trials):
        t0 = time.time()
        readback(run(n1))
        t1 = time.time() - t0
        t0 = time.time()
        readback(run(n2))
        t2 = time.time() - t0
        estimates.append(max(t2 - t1, 1e-9) / (n2 - n1))
    return float(np.median(estimates))


def main():
    import jax
    import jax.numpy as jnp

    from digat_tpu.config import Config
    from digat_tpu.data.user_graph import build_user_graph
    from digat_tpu.eval.scorer import CachedScorer
    from digat_tpu.models.model import CorpusTables, EvalBatch, Model, TrainBatch
    from digat_tpu.train.optimizer import make_optimizer

    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    log(f"backend={backend} devices={jax.devices()}")

    cfg = Config(
        dataset="synthetic",
        vocabulary_size=40_000,
        category_num=18,
        use_pallas=on_tpu,
    )
    from digat_tpu.cli import apply_runtime_config

    apply_runtime_config(cfg)
    model = Model(cfg)
    Gn, L, H = cfg.news_graph_size, cfg.max_title_length, cfg.max_history_num
    news_num = 20_000
    rng = np.random.default_rng(0)
    tables = CorpusTables(
        news_title_text=jnp.asarray(
            rng.integers(0, cfg.vocabulary_size, (news_num, L)), jnp.int32
        ),
        news_title_mask=jnp.asarray(rng.random((news_num, L)) < 0.8),
        news_node_id=jnp.asarray(rng.integers(0, news_num, (news_num, Gn)), jnp.int32),
        news_graph=jnp.asarray(
            (rng.random((news_num, Gn, Gn)) < 0.25) | np.eye(Gn, dtype=bool)
        ),
        news_graph_mask=jnp.asarray(
            np.concatenate(
                [np.zeros((news_num, 1), bool), rng.random((news_num, Gn - 1)) < 0.9],
                axis=1,
            )
        ),
    )
    params = model.init(jax.random.PRNGKey(0))

    # ---------------- inference (two-stage cached) ----------------
    # 512 is the measured single-chip sweet spot (52.5k items/s fp32 vs
    # 48.0k at 1024, 43.1k at 4096): smaller blocks pipeline better through
    # the fused-kernel grid and the stage-2 gathers
    eval_bs = 512
    scorer = CachedScorer(model, eval_bs)
    # first call pays the (remote) compile; a second full pass over the
    # same jitted stages is the steady-state cost users see per eval epoch
    # — the two are reported separately (r01->r02 the combined number
    # drifted 20.1->26.5 s purely from compile variance)
    t0 = time.time()
    news_reps, c_n0 = scorer.cache_news(params, tables)
    float(jnp.sum(c_n0))  # tunnel-proof completion barrier
    stage1_first_s = time.time() - t0
    t0 = time.time()
    news_reps, c_n0 = scorer.cache_news(params, tables)
    float(jnp.sum(c_n0))
    stage1_steady_s = time.time() - t0
    log(f"stage1 (cache {news_num} news): first {stage1_first_s:.2f}s "
        f"(incl. compile), steady {stage1_steady_s:.2f}s")

    def make_eval_batch(seed):
        r = np.random.default_rng(seed)
        cat = r.integers(0, cfg.category_num, (eval_bs, H)).astype(np.int32)
        nvalid = r.integers(5, H + 1, eval_bs)
        for i, n in enumerate(nvalid):
            cat[i, n:] = cfg.category_num
        return EvalBatch(
            history_idx=jnp.asarray(r.integers(0, news_num, (eval_bs, H)), jnp.int32),
            cat_idx=jnp.asarray(cat),
            cand_idx=jnp.asarray(r.integers(0, news_num, eval_bs), jnp.int32),
        )

    pool = jax.tree.map(
        lambda *xs: jnp.stack(xs), *[make_eval_batch(s) for s in range(8)]
    )
    from digat_tpu.data.user_graph import build_user_graph as bug

    # Device-side iteration loop: one dispatch covers n batches (per-call
    # RPC latency through the tunnel would otherwise swamp the signal), and
    # the carry chains iterations so nothing overlaps or elides.
    @functools.partial(jax.jit, static_argnums=5)
    def run_eval_device(params, tables, news_reps, c_n0, pool, n):
        def body(i, carry):
            b = jax.tree.map(lambda x: x[i % 8], pool)
            cand = b.cand_idx + (carry * 0.0).astype(jnp.int32)
            user_reps = news_reps[b.history_idx]
            sag = news_reps[tables.news_node_id[cand]]
            user_graph, cat_mask = bug(
                b.cat_idx, cfg.max_history_num, cfg.category_num
            )
            out = model.inference(
                params, user_reps, user_graph, cat_mask, b.cat_idx, sag,
                tables.news_graph[cand], tables.news_graph_mask[cand],
                c_n0[cand],
            )
            return jnp.sum(out)

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    per_batch = marginal_time(
        lambda n: run_eval_device(params, tables, news_reps, c_n0, pool, n),
        16, 216, float,
    )
    items_per_s = eval_bs / per_batch
    log(f"stage2: {items_per_s:,.0f} items/s ({per_batch * 1e3:.2f} ms/batch of {eval_bs})")

    # bf16 eval (mixed-precision scoring; fp32 stays the parity default)
    bf = lambda t: jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, t
    )
    params16, reps16, c16 = bf(params), bf(news_reps), bf(c_n0)
    per_batch16 = marginal_time(
        lambda n: run_eval_device(params16, tables, reps16, c16, pool, n),
        16, 216, float,
    )
    items16 = eval_bs / per_batch16
    log(f"stage2 bf16: {items16:,.0f} items/s ({per_batch16 * 1e3:.2f} ms/batch)")

    # ---------------- training step ----------------
    tx = make_optimizer(cfg.weight_decay, cfg.gradient_clip_norm, params)
    opt_state = tx.init(params)
    B, K = cfg.batch_size, cfg.negative_sample_num

    def make_train_batch(seed):
        r = np.random.default_rng(seed)
        cat = r.integers(0, cfg.category_num + 1, (B, H)).astype(np.int32)
        return TrainBatch(
            history_idx=jnp.asarray(r.integers(0, news_num, (B, H)), jnp.int32),
            cat_idx=jnp.asarray(cat),
            sample_idx=jnp.asarray(r.integers(0, news_num, (B, 1 + K)), jnp.int32),
            weight=jnp.ones((B,), jnp.float32),
        )

    # unique-title dedup, as the trainer runs it (models/model.py)
    from digat_tpu.data.batching import dedup_batch

    raw_batches = [make_train_batch(s) for s in range(4)]
    node_np = np.asarray(tables.news_node_id)
    ucount = max(
        len(np.unique(np.concatenate([
            node_np[np.asarray(b.sample_idx)].ravel(),
            np.asarray(b.history_idx).ravel(),
        ])))
        for b in raw_batches
    )
    cap = int(np.ceil(ucount * 1.15 / 256.0) * 256)
    log(f"dedup: ~{ucount} unique titles/batch of "
        f"{B * (1 + K) * Gn + B * H} slots, capacity {cap}")
    tpool = jax.tree.map(
        lambda *xs: jnp.asarray(np.stack(xs)),
        *[
            dedup_batch(
                b, tables.news_node_id, cap,
                news_title_text=np.asarray(tables.news_title_text)
                if on_tpu else None,
                vocab_size=cfg.vocabulary_size if on_tpu else 0,
            )
            for b in raw_batches
        ],
    )

    @functools.partial(jax.jit, static_argnums=3)
    def run_train_device(params, opt_state, tables, n):
        def body(i, carry):
            p, o, _ = carry
            b = jax.tree.map(lambda x: x[i % 4], tpool)
            loss, grads = jax.value_and_grad(model.loss)(
                p, tables, b, jax.random.fold_in(jax.random.PRNGKey(0), i)
            )
            updates, o = tx.update(grads, o, p)
            updates = jax.tree.map(lambda u: -1e-4 * u, updates)
            import optax

            return optax.apply_updates(p, updates), o, loss

        _, _, loss = jax.lax.fori_loop(
            0, n, body, (params, opt_state, jnp.float32(0.0))
        )
        return loss

    per_step = marginal_time(
        lambda n: run_train_device(params, opt_state, tables, n),
        4, 54, lambda o: float(o),
    )
    train_samples_per_s = B / per_step
    log(f"train: {train_samples_per_s:,.0f} samples/s ({per_step * 1e3:.2f} ms/step of {B})")

    # ---------------- bf16 training step (mixed precision) ----------------
    import dataclasses

    cfg16 = dataclasses.replace(cfg, compute_dtype="bfloat16")
    model16 = Model(cfg16)

    @functools.partial(jax.jit, static_argnums=3)
    def run_train16(params, opt_state, tables, n):
        def body(i, carry):
            p, o, _ = carry
            b = jax.tree.map(lambda x: x[i % 4], tpool)
            loss, grads = jax.value_and_grad(model16.loss)(
                p, tables, b, jax.random.fold_in(jax.random.PRNGKey(0), i)
            )
            updates, o = tx.update(grads, o, p)
            updates = jax.tree.map(lambda u: -1e-4 * u, updates)
            import optax

            return optax.apply_updates(p, updates), o, loss

        _, _, loss = jax.lax.fori_loop(
            0, n, body, (params, opt_state, jnp.float32(0.0))
        )
        return loss

    per_step16 = marginal_time(
        lambda n: run_train16(params, opt_state, tables, n),
        4, 54, lambda o: float(o),
    )
    train16 = B / per_step16
    log(f"train bf16: {train16:,.0f} samples/s ({per_step16 * 1e3:.2f} ms/step)")

    # ------------- large-batch training step (production scale) -------------
    # the reference trains at B=64 (config.py:31) — that stays the parity
    # number above; this measures the same step at B=256 to show the
    # single-chip throughput ceiling when batch size is free to grow
    B_big = 256
    big_batches = []
    for s in range(2):
        r = np.random.default_rng(100 + s)
        cat = r.integers(0, cfg.category_num + 1, (B_big, H)).astype(np.int32)
        big_batches.append(TrainBatch(
            history_idx=jnp.asarray(r.integers(0, news_num, (B_big, H)), jnp.int32),
            cat_idx=jnp.asarray(cat),
            sample_idx=jnp.asarray(r.integers(0, news_num, (B_big, 1 + K)), jnp.int32),
            weight=jnp.ones((B_big,), jnp.float32),
        ))
    ucount_big = max(
        len(np.unique(np.concatenate([
            node_np[np.asarray(b.sample_idx)].ravel(),
            np.asarray(b.history_idx).ravel(),
        ])))
        for b in big_batches
    )
    cap_big = int(np.ceil(ucount_big * 1.1 / 256.0) * 256)
    bpool = jax.tree.map(
        lambda *xs: jnp.asarray(np.stack(xs)),
        *[
            dedup_batch(
                b, tables.news_node_id, cap_big,
                news_title_text=np.asarray(tables.news_title_text)
                if on_tpu else None,
                vocab_size=cfg.vocabulary_size if on_tpu else 0,
            )
            for b in big_batches
        ],
    )

    @functools.partial(jax.jit, static_argnums=3)
    def run_train_big(params, opt_state, tables, n):
        def body(i, carry):
            p, o, _ = carry
            b = jax.tree.map(lambda x: x[i % 2], bpool)
            loss, grads = jax.value_and_grad(model.loss)(
                p, tables, b, jax.random.fold_in(jax.random.PRNGKey(0), i)
            )
            updates, o = tx.update(grads, o, p)
            updates = jax.tree.map(lambda u: -1e-4 * u, updates)
            import optax

            return optax.apply_updates(p, updates), o, loss

        _, _, loss = jax.lax.fori_loop(
            0, n, body, (params, opt_state, jnp.float32(0.0))
        )
        return loss

    per_step_big = marginal_time(
        lambda n: run_train_big(params, opt_state, tables, n),
        2, 22, lambda o: float(o),
    )
    train_big = B_big / per_step_big
    log(f"train B={B_big}: {train_big:,.0f} samples/s "
        f"({per_step_big * 1e3:.2f} ms/step, capacity {cap_big})")

    baseline_items_per_s = 4500.0  # RTX 3090 fp32, reference README.md:64
    print(
        json.dumps(
            {
                "metric": "inference_items_per_s",
                "value": round(items_per_s, 1),
                "unit": "impression-items/s/chip",
                "vs_baseline": round(items_per_s / baseline_items_per_s, 3),
                "extra": {
                    "train_samples_per_s": round(train_samples_per_s, 1),
                    "train_samples_per_s_bf16": round(train16, 1),
                    "train_samples_per_s_b256": round(train_big, 1),
                    "inference_items_per_s_bf16": round(items16, 1),
                    # first-call time is dominated by the REMOTE compile
                    # through the tunnel (20s..240s observed across rounds
                    # for identical code) — compare stage1_steady_s across
                    # rounds, never stage1_first_s
                    "stage1_first_s": round(stage1_first_s, 2),
                    "stage1_first_s_note": "remote-compile variance; not comparable across rounds",
                    "stage1_steady_s": round(stage1_steady_s, 2),
                    "backend": backend,
                    "baseline": "RTX3090 fp32 ~600s MIND-small test ~= 4500 items/s",
                },
            }
        )
    )


if __name__ == "__main__":
    main()
