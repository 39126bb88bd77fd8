"""Capture a jax.profiler trace of the B=64 train step on the real chip
and aggregate device-op time by HLO category and source line.

The trace's device ops live on the "XLA Ops" track (pid=3/tid=3 in the
chrome trace); each event carries `args.source` (python source line) and
`args.hlo_category`; durations are microseconds. Aggregating by those two
keys turns the 56 ms step into a ranked work-list of fusions.

Run: python scripts/profile_trace.py [trace_dir]
"""

from __future__ import annotations

import collections
import functools
import glob
import gzip
import json
import os
import sys

import numpy as np

sys.path.insert(0, ".")


def build_step(B: int = 64):
    import jax
    import jax.numpy as jnp
    import optax

    from digat_tpu.cli import apply_runtime_config
    from digat_tpu.config import Config
    from digat_tpu.data.batching import dedup_batch
    from digat_tpu.models.model import CorpusTables, Model, TrainBatch
    from digat_tpu.train.optimizer import make_optimizer

    on_tpu = jax.default_backend() == "tpu"
    news_num = 20_000
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
    raw = TrainBatch(
        history_idx=jnp.asarray(r.integers(0, news_num, (B, H)), jnp.int32),
        cat_idx=jnp.asarray(
            r.integers(0, cfg.category_num + 1, (B, H)).astype(np.int32)),
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

    return lambda n: float(run_full(params, opt_state, db, n))


def capture(trace_dir: str, steps: int = 8):
    import jax

    run = build_step()
    run(2)  # compile + warm
    with jax.profiler.trace(trace_dir):
        run(steps)
    return steps


def parse(trace_dir: str, steps: int):
    paths = glob.glob(os.path.join(
        trace_dir, "**", "*.trace.json.gz"), recursive=True)
    assert paths, f"no trace under {trace_dir}"
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data["traceEvents"]
    # find the "XLA Ops" track
    op_pids = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            if e["args"].get("name") == "XLA Ops":
                op_pids[(e["pid"], e["tid"])] = True
    by_src = collections.Counter()
    by_cat = collections.Counter()
    by_op = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or (e.get("pid"), e.get("tid")) not in op_pids:
            continue
        dur = e.get("dur", 0) / 1e3 / steps  # ms per step
        args = e.get("args", {})
        total += dur
        by_cat[args.get("hlo_category", "?")] += dur
        src = args.get("source", "?")
        by_src[(src.split("/")[-1], args.get("hlo_category", "?"))] += dur
        name = e["name"]
        base = name.split(".")[0]
        by_op[base] += dur
    print(f"device total: {total:.2f} ms/step  (trace {os.path.basename(path)})")
    print("\n-- by HLO category --")
    for k, v in by_cat.most_common(15):
        print(f"  {v:7.3f} ms  {k}")
    print("\n-- by (source line, category), top 45 --")
    for (src, cat), v in by_src.most_common(45):
        print(f"  {v:7.3f} ms  {cat:<12} {src}")
    print("\n-- by op-name prefix, top 30 --")
    for k, v in by_op.most_common(30):
        print(f"  {v:7.3f} ms  {k}")


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/digat_trace"
    steps = capture(out)
    parse(out, steps)
