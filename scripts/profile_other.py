"""Micro-profile of the train step's non-encoder non-graph time:
fan-out gathers (fwd+bwd), optimizer, user-graph build, loss tail.

Run: python scripts/profile_other.py
"""

from __future__ import annotations

import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def marginal(run, n1, n2, trials=3):
    run(n1)
    est = []
    for _ in range(trials):
        t0 = time.time(); float(run(n1)); t1 = time.time() - t0
        t0 = time.time(); float(run(n2)); t2 = time.time() - t0
        est.append(max(t2 - t1, 1e-9) / (n2 - n1))
    return float(np.median(est))


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from digat_tpu.cli import apply_runtime_config
    from digat_tpu.config import Config
    from digat_tpu.data.batching import dedup_batch
    from digat_tpu.data.user_graph import build_user_graph
    from digat_tpu.models.model import CorpusTables, Model, TrainBatch
    from digat_tpu.train.optimizer import make_optimizer

    on_tpu = jax.default_backend() == "tpu"
    news_num = 20_000
    B = 64
    cfg = Config(dataset="synthetic", vocabulary_size=40_000,
                 category_num=18, use_pallas=on_tpu, batch_size=B)
    apply_runtime_config(cfg)
    model = Model(cfg)
    Gn, L, H, K = (cfg.news_graph_size, cfg.max_title_length,
                   cfg.max_history_num, cfg.negative_sample_num)
    r = np.random.default_rng(0)
    tables = CorpusTables(
        news_title_text=jnp.asarray(
            r.integers(0, cfg.vocabulary_size, (news_num, L)), jnp.int32),
        news_title_mask=jnp.asarray(r.random((news_num, L)) < 0.8),
        news_node_id=jnp.asarray(
            r.integers(0, news_num, (news_num, Gn)), jnp.int32),
        news_graph=jnp.asarray(
            (r.random((news_num, Gn, Gn)) < 0.25) | np.eye(Gn, dtype=bool)),
        news_graph_mask=jnp.asarray(np.concatenate(
            [np.zeros((news_num, 1), bool),
             r.random((news_num, Gn - 1)) < 0.9], 1)),
    )
    params = model.init(jax.random.PRNGKey(0))
    tx = make_optimizer(cfg.weight_decay, cfg.gradient_clip_norm, params)
    opt_state = tx.init(params)
    cat = r.integers(0, cfg.category_num + 1, (B, H)).astype(np.int32)
    raw = TrainBatch(
        history_idx=jnp.asarray(r.integers(0, news_num, (B, H)), jnp.int32),
        cat_idx=jnp.asarray(cat),
        sample_idx=jnp.asarray(r.integers(0, news_num, (B, 1 + K)), jnp.int32),
        weight=jnp.ones((B,), jnp.float32),
    )
    node_np = np.asarray(tables.news_node_id)
    u = len(np.unique(np.concatenate([
        node_np[np.asarray(raw.sample_idx)].ravel(),
        np.asarray(raw.history_idx).ravel()])))
    cap = int(np.ceil(u * 1.15 / 256) * 256)
    db = dedup_batch(raw, tables.news_node_id, cap,
                     news_title_text=np.asarray(tables.news_title_text)
                     if on_tpu else None,
                     vocab_size=cfg.vocabulary_size if on_tpu else 0)
    db = jax.tree.map(jnp.asarray, db)
    U = cap
    D = cfg.news_embedding_dim
    uniq_reps = jnp.asarray(r.normal(size=(U, D)), jnp.float32)

    # ---- 1. fan-out gather fwd+bwd ----
    def fan_loss(reps):
        cand = reps[db.cand_inv]
        hist = reps[db.hist_inv]
        # nonlinear so the gradient depends on reps (no constant folding)
        return (jnp.sum(jnp.square(cand)) + jnp.sum(jnp.square(hist))) * 1e-6

    @functools.partial(jax.jit, static_argnums=1)
    def run_fan(reps, n):
        def body(i, acc):
            g = jax.grad(fan_loss)(reps * (1.0 + acc * 1e-20))
            return acc + g[0, 0]
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    t_fan = marginal(lambda n: run_fan(uniq_reps, n), 8, 88)
    log(f"fan-out gather fwd+bwd: {t_fan*1e3:.2f} ms")

    # ---- 2. optimizer (clip + adam) alone ----
    grads = jax.tree.map(lambda x: x * 1e-3, params)

    @functools.partial(jax.jit, static_argnums=3)
    def run_opt(params, opt_state, grads, n):
        def body(i, carry):
            p, o = carry
            g = jax.tree.map(lambda x: x * 1e-3, p)  # depends on the carry
            up, o = tx.update(g, o, p)
            up = jax.tree.map(lambda x: -1e-4 * x, up)
            return optax.apply_updates(p, up), o
        p, o = jax.lax.fori_loop(0, n, body, (params, opt_state))
        return p["graph_encoder"]["topic_node_embedding"][0, 0]

    t_opt = marginal(lambda n: run_opt(params, opt_state, grads, n), 8, 88)
    log(f"clip+adam update: {t_opt*1e3:.2f} ms")

    # ---- 3. table gathers + user graph + logits/loss tail ----
    news_rep = jnp.asarray(r.normal(size=(B * (1 + K), D)), jnp.float32)
    user_rep = jnp.asarray(r.normal(size=(B * (1 + K), D)), jnp.float32)

    def tail_loss(nr):
        ng = tables.news_graph[db.sample_idx]
        nm = tables.news_graph_mask[db.sample_idx]
        ug, cm = build_user_graph(db.cat_idx, H, cfg.category_num)
        masked = jnp.sum(ng, (2, 3)).astype(jnp.float32) + jnp.sum(
            nm, 2).astype(jnp.float32) + jnp.sum(ug, (1, 2))[:, None] + \
            jnp.sum(cm, 1)[:, None]
        logits = jnp.sum(
            nr.reshape(B, 1 + K, D) * user_rep.reshape(B, 1 + K, D), -1)
        nll = -jax.nn.log_softmax(logits + masked * 1e-9, 1)[:, 0]
        return jnp.mean(nll)

    @functools.partial(jax.jit, static_argnums=1)
    def run_tail(nr, n):
        def body(i, acc):
            return acc + jax.grad(tail_loss)(nr * (1.0 + acc * 1e-20))[0, 0]
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    t_tail = marginal(lambda n: run_tail(news_rep, n), 8, 88)
    log(f"table gathers + user-graph build + loss tail: {t_tail*1e3:.2f} ms")


if __name__ == "__main__":
    main()
