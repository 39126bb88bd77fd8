"""Component-isolation profile of the train step's ~14 ms XLA tail
(round-3 trace: graph-encoder contexts/projections/segment ops ~9.3 ms +
relayout copies ~4.7 ms at B=64 -> 320 flattened rows).

Times each context building block fwd+bwd in isolation at the production
shapes, so the tail can be attributed component-by-component and any
structural change A/B-measured.

Run on the chip: python scripts/profile_tail.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def log(*a):
    print(*a, flush=True)


def marginal(run, n1=2, n2=22, trials=5):
    float(run(n1))
    est = []
    for _ in range(trials):
        t0 = time.time(); float(run(n1)); t1 = time.time() - t0
        t0 = time.time(); float(run(n2)); t2 = time.time() - t0
        est.append(max(t2 - t1, 1e-9) / (n2 - n1))
    return float(np.median(est))


def main():
    import jax
    import jax.numpy as jnp

    from digat_tpu.cli import apply_runtime_config
    from digat_tpu.config import Config
    from digat_tpu.models import graph_encoders as GE
    from digat_tpu.ops import segment_softmax_sum

    on_tpu = jax.default_backend() == "tpu"
    cfg = Config(dataset="synthetic", vocabulary_size=1000, category_num=18,
                 use_pallas=on_tpu)
    apply_runtime_config(cfg)
    st = GE.GraphStatic(
        variant="DIGAT", depth=cfg.graph_depth,
        max_history_num=cfg.max_history_num, category_num=cfg.category_num,
        dim=cfg.news_embedding_dim, dropout_rate=cfg.dropout_rate,
        use_pallas=cfg.use_pallas,
    )
    B = cfg.batch_size * (1 + cfg.negative_sample_num)  # 320 flattened
    D, H, C = st.dim, st.max_history_num, st.category_num
    Gn, Gu = cfg.news_graph_size, cfg.user_graph_size
    r = np.random.default_rng(0)
    params = GE.init(jax.random.PRNGKey(0), st)
    key = jax.random.PRNGKey(1)

    news_x = jnp.asarray(r.standard_normal((B, Gn, D)), jnp.float32)
    news_adj = jnp.asarray((r.random((B, Gn, Gn)) < 0.3) | np.eye(Gn, dtype=bool))
    news_mask = jnp.asarray(
        np.concatenate([np.zeros((B, 1), bool), r.random((B, Gn - 1)) < 0.8], 1))
    user_x = jnp.asarray(r.standard_normal((B, Gu, D)), jnp.float32)
    user_adj = jnp.asarray((r.random((B, Gu, Gu)) < 0.3) | np.eye(Gu, dtype=bool))
    cat_idx = jnp.asarray(r.integers(0, C + 1, (B, H)), jnp.int32)
    cat_mask = jnp.asarray(r.random((B, C + 1)) < 0.8)
    query = jnp.asarray(r.standard_normal((B, D)), jnp.float32)
    hist = user_x[:, :H, :]
    scores = jnp.asarray(r.standard_normal((B, H)), jnp.float32)

    import functools

    def timed(name, fn, *args):
        # Device-side repeat loop (bench.py house pattern): through the
        # tunnel, repeated host dispatches overlap/wedge — a single
        # dispatch of a fori_loop with a carry measures honestly. The
        # first floating leaf is perturbed by the carry so XLA cannot
        # hoist the loop-invariant computation.
        leaves, treedef = jax.tree.flatten(args)
        fidx = next(i for i, x in enumerate(leaves)
                    if hasattr(x, "dtype")
                    and jnp.issubdtype(x.dtype, jnp.floating))

        @functools.partial(jax.jit, static_argnums=0)
        def run_n(n, *a):
            def body(i, acc):
                lv = list(leaves)
                lv2 = list(a)
                lv2[fidx] = lv2[fidx] + (acc * 1e-38).astype(lv2[fidx].dtype)
                out = fn(*jax.tree.unflatten(treedef, lv2))
                return acc + jnp.sum(out).astype(jnp.float32)
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        log(f"[compile] {name}")
        t0 = time.time()
        float(run_n(2, *leaves))
        log(f"[compiled {time.time() - t0:.1f}s] {name}")
        ms = marginal(lambda n: run_n(n, *leaves)) * 1e3
        log(f"{name:55s} {ms:8.3f} ms")
        return ms

    def grad_of(fn):
        def loss(*args):
            return jnp.sum(fn(*args) ** 2)

        g = jax.grad(loss, argnums=0)

        def both(p, *args):
            gr = g(p, *args)
            return sum(jnp.sum(x) for x in jax.tree.leaves(gr))

        return both

    log(f"backend={jax.default_backend()} B={B} D={D} Gn={Gn} Gu={Gu} "
        f"H={H} C={C} depth={st.depth}")

    # --- segment op alone -------------------------------------------------
    def seg(s, v, ids):
        a, ss = segment_softmax_sum(s, v, ids, C + 1)
        return jnp.sum(ss) + jnp.sum(a)

    timed("segment_softmax_sum fwd", seg, scores, hist, cat_idx)
    timed("segment_softmax_sum fwd+bwd",
          lambda s, v, ids: jax.grad(
              lambda s2, v2: seg(s2, v2, ids), argnums=(0, 1)
          )(s, v)[0].sum() + 0.0, scores, hist, cat_idx)

    # --- contexts ---------------------------------------------------------
    def news_ctx(p, x, m):
        return GE.news_graph_context(p["news_ctx"], st, key, True, x, m)

    def user_ctx(p, ux, cm, ci, q):
        return GE.user_graph_context(p["user_ctx"], st, key, True, ux, cm, ci, q)

    timed("news_graph_context fwd", news_ctx, params, news_x, news_mask)
    timed("news_graph_context fwd+bwd", grad_of(news_ctx),
          params, news_x, news_mask)
    timed("user_graph_context fwd", user_ctx,
          params, user_x, cat_mask, cat_idx, query)
    timed("user_graph_context fwd+bwd", grad_of(user_ctx),
          params, user_x, cat_mask, cat_idx, query)

    # --- one GAT layer (train path) for scale -----------------------------
    def news_layer(p, x, adj, q):
        return GE._gat_layer(p["news_gat"], 0, st, key, True, x, adj, q)

    def user_layer(p, x, adj, q):
        return GE._gat_layer(p["user_gat"], 0, st, key, True, x, adj, q)

    timed("news GAT layer fwd+bwd (1 depth)", grad_of(news_layer),
          params, news_x, news_adj, query)
    timed("user GAT layer fwd+bwd (1 depth)", grad_of(user_layer),
          params, user_x, user_adj, query)

    # --- whole graph encoder ----------------------------------------------
    def whole(p, nx, na, nm, ux, ua, cm, ci):
        c_n, c_u = GE.forward(p, st, key, True, nx, na, nm, ux[:, :H], ua,
                              cm, ci)
        return c_n + c_u

    timed("graph_encoder forward fwd", whole,
          params, news_x, news_adj, news_mask, user_x, user_adj,
          cat_mask, cat_idx)
    timed("graph_encoder forward fwd+bwd", grad_of(whole),
          params, news_x, news_adj, news_mask, user_x, user_adj,
          cat_mask, cat_idx)

    # --- dropout draw cost ------------------------------------------------
    from digat_tpu import layers as L

    def drops(x):
        out = x
        for i in range(8):
            out = L.dropout(jax.random.fold_in(key, i), out,
                            st.dropout_rate, True)
        return out

    timed("8x dropout on [B,Gu,D]", drops, user_x)


if __name__ == "__main__":
    main()
