"""Training-step profile: fp32 vs bf16, component breakdown.

Times the full train step and its two big phases (news encoder fwd+bwd,
graph encoder fwd+bwd) at B=64 and B=256, in fp32 and mixed-precision
bf16, on the real chip. Uses the same two-point marginal timing as
bench.py (the axon tunnel's block_until_ready does not wait, so marginal
time between two run lengths is the only trustworthy clock).

Run: python scripts/profile_train.py
"""

from __future__ import annotations

import dataclasses
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
    from digat_tpu.models import news_encoders as N
    from digat_tpu.models import graph_encoders as G
    from digat_tpu.models.model import CorpusTables, Model, TrainBatch
    from digat_tpu.train.optimizer import make_optimizer

    on_tpu = jax.default_backend() == "tpu"
    log(f"backend={jax.default_backend()}")
    news_num = 20_000

    import os

    bs = tuple(int(x) for x in os.environ.get("PROF_B", "64,256").split(","))
    dts = tuple(os.environ.get("PROF_DTYPES", "float32,bfloat16").split(","))
    for B in bs:
        for dtype in dts:
            cfg = Config(dataset="synthetic", vocabulary_size=40_000,
                         category_num=18, use_pallas=on_tpu,
                         compute_dtype=dtype, batch_size=B)
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
                    (r.random((news_num, Gn, Gn)) < 0.25)
                    | np.eye(Gn, dtype=bool)),
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

            # ---- full step ----
            @functools.partial(jax.jit, static_argnums=3)
            def run_full(params, opt_state, db, n):
                def body(i, carry):
                    p, o, _ = carry
                    loss, grads = jax.value_and_grad(model.loss)(
                        p, tables, db, jax.random.fold_in(jax.random.PRNGKey(0), i))
                    up, o = tx.update(grads, o, p)
                    up = jax.tree.map(lambda x: -1e-4 * x, up)
                    return optax.apply_updates(p, up), o, loss
                _, _, loss = jax.lax.fori_loop(0, n, body,
                                               (params, opt_state, jnp.float32(0)))
                return loss

            t_full = marginal(lambda n: run_full(params, opt_state, db, n), 4, 44)

            # ---- encoder-only fwd+bwd (same dedup token set) ----
            def enc_loss(p, i):
                pc = model.cast_params(p)
                reps = N.encode(pc["news_encoder"], model.news_st,
                                jax.random.fold_in(jax.random.PRNGKey(1), i),
                                True, tables.news_title_text[db.uniq_ids],
                                tables.news_title_mask[db.uniq_ids],
                                emb_meta=db.emb)
                return jnp.sum(reps.astype(jnp.float32) ** 2) * 1e-6

            @functools.partial(jax.jit, static_argnums=1)
            def run_enc(params, n):
                def body(i, acc):
                    g = jax.grad(enc_loss)(params, i)
                    return acc + g["news_encoder"]["pool"]["affine2"]["w"][0, 0]
                return jax.lax.fori_loop(0, n, body, jnp.float32(0))

            t_enc = marginal(lambda n: run_enc(params, n), 4, 44)

            # ---- graph-only fwd+bwd (encoded reps as constants) ----
            pc = model.cast_params(params)
            reps = jax.jit(lambda p: N.encode(
                p["news_encoder"], model.news_st, jax.random.PRNGKey(1),
                False, tables.news_title_text[db.uniq_ids],
                tables.news_title_mask[db.uniq_ids]))(pc)
            cand = reps[db.cand_inv]
            hist = reps[db.hist_inv]
            ngraph = tables.news_graph[db.sample_idx]
            nmask = tables.news_graph_mask[db.sample_idx]
            ugraph, cmask = build_user_graph(db.cat_idx, H, cfg.category_num)

            def graph_loss(p, i):
                pc = model.cast_params(p)
                logits = model.forward_encoded(
                    pc, jax.random.fold_in(jax.random.PRNGKey(2), i), True,
                    cand, hist, ugraph, cmask, db.cat_idx, ngraph, nmask)
                return jnp.mean(-jax.nn.log_softmax(logits, 1)[:, 0])

            @functools.partial(jax.jit, static_argnums=1)
            def run_graph(params, n):
                def body(i, acc):
                    g = jax.grad(graph_loss)(params, i)
                    return acc + g["graph_encoder"]["user_gat"]["W"]["w"][0, 0, 0]
                return jax.lax.fori_loop(0, n, body, jnp.float32(0))

            t_graph = marginal(lambda n: run_graph(params, n), 4, 44)

            log(f"B={B:3d} {dtype:9s}: full {t_full*1e3:7.2f} ms "
                f"({B / t_full:7,.0f} samples/s) | enc {t_enc*1e3:6.2f} ms | "
                f"graph {t_graph*1e3:6.2f} ms | other "
                f"{(t_full - t_enc - t_graph)*1e3:6.2f} ms (cap={cap})")


if __name__ == "__main__":
    main()
