"""Empirically decompose the composed graph-encoder cost (round-5 item 5).

Round 3/4 claimed the graph-encoder's composed fwd+bwd (22.3 ms at the
B=64 training shapes, where isolated parts sum to ~4 ms) is critical-path
latency of the model's own serial recurrence (reference
graphEncoders.py:177-187: news layer -> user layer -> news ctx -> user
ctx, chained through contexts across depth). Device traces don't survive
the axon tunnel, so this measures the claim directly:

  1. depth scaling: composed fwd+bwd at graph_depth 0..3 — if the chain
     story holds, the cost is ~linear in depth with a slope equal to the
     marginal depth cost, and extrapolates to the measured total;
  2. dependency counterfactual: an "unchained" variant that runs the SAME
     ops per depth but feeds every depth the depth-0 inputs (all depths
     mutually independent, contexts accumulated at the end). Identical op
     count and shapes; the difference to the chained variant is purely
     what the dependence structure costs (lost overlap + serialization);
  3. chain-link calibration: K chained [B*N, D] x [D, D] relu matmuls vs
     K independent ones — the per-fusion serialization cost at these
     shapes, to convert (2) into "n links x cost/link".

Usage (chip): python scripts/critical_path.py [--b 64]
Writes docs/critical_path_r05.json.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def marginal_time(run, n_small=4, n_big=24, reps=5):
    """bench.py house pattern: device-side loop, two run lengths."""
    est = []
    for _ in range(reps):
        t0 = time.time(); run(n_small); t1 = time.time() - t0
        t0 = time.time(); run(n_big); t2 = time.time() - t0
        est.append((t2 - t1) / (n_big - n_small))
    return float(np.median(est))


def device_loop(step_fn, args):
    """fori_loop carrying a perturbed input; host readback forces sync."""

    @functools.partial(jax.jit, static_argnums=0)
    def run_n(n, *a):
        def body(i, carry):
            out = step_fn(*carry)
            first = carry[0] + 0.0 * out
            return (first * (1.0 + 1e-9 * i),) + carry[1:]

        return jax.lax.fori_loop(0, n, body, a)[0]

    def run(n):
        return float(jnp.sum(run_n(n, *args)))

    return run


def build_graph_encoder_probe(B, depth, chained, use_pallas=True):
    """fwd+bwd of the DIGAT graph encoder at training shapes.

    chained=False runs the same per-depth ops on the depth-0 inputs, so
    depths are independent — same FLOPs/op count, no serial recurrence."""
    from digat_tpu.models import graph_encoders as G

    D, Gn, H, C = 400, 26, 50, 17
    st = G.GraphStatic(
        variant="DIGAT", depth=depth, max_history_num=H, category_num=C,
        dim=D, dropout_rate=0.2, use_pallas=use_pallas,
    )
    key = jax.random.PRNGKey(0)
    params = G.init(key, G.GraphStatic(
        variant="DIGAT", depth=max(depth, 1), max_history_num=H,
        category_num=C, dim=D, dropout_rate=0.2, use_pallas=use_pallas,
    ))
    ks = jax.random.split(key, 8)
    Gu = H + C
    news_x = jax.random.normal(ks[0], (B, Gn, D))
    news_graph = jax.random.uniform(ks[1], (B, Gn, Gn)) < 0.4
    news_mask = jax.random.uniform(ks[2], (B, Gn)) < 0.8
    hist = jax.random.normal(ks[3], (B, H, D))
    user_graph = jax.random.uniform(ks[4], (B, Gu, Gu)) < 0.3
    cat_mask = jax.random.uniform(ks[5], (B, C + 1)) < 0.7
    cat_idx = jax.random.randint(ks[6], (B, H), 0, C + 1)

    def fwd(params, news_x, hist, rng):
        if chained:
            n, u = G.forward(
                params, st, rng, True, news_x, news_graph, news_mask,
                hist, user_graph, cat_mask, cat_idx,
            )
            return jnp.sum(n * u)
        # unchained: the same blocks per depth, every depth fed the
        # depth-0 state; contributions summed at the end. Identical op
        # count/shapes, zero cross-depth dependence.
        rngs = iter(jax.random.split(rng, 6 + 4 * max(depth, 1)))
        user_x = G._user_graph_nodes(params, st, next(rngs), True, hist)
        c_n0 = G.news_graph_context(
            params["news_ctx"], st, next(rngs), True, news_x, news_mask)
        c_u0 = G.user_graph_context(
            params["user_ctx"], st, next(rngs), True, user_x, cat_mask,
            cat_idx, c_n0)
        c_n, c_u = c_n0, c_u0
        for i in range(depth):
            nx = G._gat_layer(params["news_gat"], i, st, next(rngs), True,
                              news_x, news_graph, c_u0)
            ux = G._gat_layer(params["user_gat"], i, st, next(rngs), True,
                              user_x, user_graph, c_n0)
            c_n = c_n + G.news_graph_context(
                params["news_ctx"], st, next(rngs), True, nx, news_mask)
            c_u = c_u + G.user_graph_context(
                params["user_ctx"], st, next(rngs), True, ux, cat_mask,
                cat_idx, c_n0)
        return jnp.sum(c_n * c_u)

    def step(news_x, params, hist):
        rng = jax.random.PRNGKey(1)
        g = jax.grad(fwd, argnums=(0, 1, 2))(params, news_x, hist, rng)
        return sum(jnp.sum(jnp.abs(t)) for t in jax.tree.leaves(g))

    return device_loop(step, (news_x, params, hist))


def build_chain_probe(B, K, chained):
    """K relu-matmul links at graph-encoder row counts ([B, D] x [D, D])."""
    D = 400
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, D))
    W = jax.random.normal(jax.random.PRNGKey(1), (K, D, D)) / np.sqrt(D)

    def step(x, W):
        if chained:
            y = x
            for k in range(K):
                y = jax.nn.relu(y @ W[k])
            return jnp.sum(y)
        outs = 0.0
        for k in range(K):
            outs = outs + jnp.sum(jax.nn.relu(x @ W[k]))
        return outs

    return device_loop(step, (x, W))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=64)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", "critical_path_r05.json"))
    args = ap.parse_args()
    B = args.b * 5  # batch_news_num at 1+4 sampled candidates

    report = {"batch_rows": B, "backend": jax.default_backend(),
              "depth_scaling": [], "counterfactual": {}, "chain_links": {}}

    for depth in (0, 1, 2, 3):
        run = build_graph_encoder_probe(B, depth, chained=True)
        ms = marginal_time(run) * 1e3
        report["depth_scaling"].append({"depth": depth, "ms": round(ms, 3)})
        print(f"[cp] chained depth={depth}: {ms:.2f} ms", flush=True)

    for chained in (True, False):
        run = build_graph_encoder_probe(B, 3, chained=chained)
        ms = marginal_time(run) * 1e3
        report["counterfactual"]["chained" if chained else "unchained"] = (
            round(ms, 3))
        print(f"[cp] depth=3 {'chained' if chained else 'UNCHAINED'}: "
              f"{ms:.2f} ms", flush=True)

    for K in (8, 32):
        row = {}
        for chained in (True, False):
            run = build_chain_probe(B, K, chained)
            ms = marginal_time(run) * 1e3
            row["chained" if chained else "independent"] = round(ms, 3)
        row["per_link_serialization_us"] = round(
            (row["chained"] - row["independent"]) / K * 1e3, 2)
        report["chain_links"][f"K={K}"] = row
        print(f"[cp] {K} links: chained {row['chained']:.2f} ms vs "
              f"independent {row['independent']:.2f} ms -> "
              f"{row['per_link_serialization_us']:.1f} us/link", flush=True)

    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(f"[cp] wrote {args.out}")


if __name__ == "__main__":
    main()
