#!/usr/bin/env python
"""Production-path head-to-head parity cell.

Runs digat_tpu ON THE TPU with the full production configuration —
`use_pallas=true` (fused MSA encoder with in-kernel rbg dropout, Eq.(8)
custom-VJP GAT scores, sorted embedding gradient), `rng_impl=rbg`,
unique-title dedup ON — at the REFERENCE's geometry (D=400 via 16x25 MSA,
G=26 news graphs from SAG 5 neighbors x 2 hops, history 50, titles 32,
batch 64; reference config.py:29-53), head-to-head against the reference
PyTorch DIGAT on CPU, both sides sharing one synthetic corpus, one initial
word-vector file and one SAG artifact.

This is the one end-to-end claim the reduced-geometry matrix
(scripts/parity/run_parity.py) cannot make: every kernel that engages in
production engages here, through full training runs, and final metrics are
compared with the reference's own acceptance style (README.md:64 —
end-to-end metric parity).

Results merge into docs/PARITY_RESULTS.json under the
`digat_tpu-TPU/MSA-DIGAT` and `reference-prod/MSA-DIGAT` summary keys.

Usage:
    python scripts/parity/run_parity_prod.py --seeds 0 1 2 \
        [--frameworks digat_tpu reference] [--workdir .../parity_runs_prod]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import run_parity as RP  # noqa: E402

# Reference production geometry (reference config.py:29-53): D = 16x25 =
# 400, news_graph_size = 1+5+20 = 26, Gu = 50 + category_num. Protocol
# knobs (optimizer, loss, clip, criterion) at reference defaults; lr,
# batch and epoch sized for tiny-corpus convergence on 4 CPU cores (the
# reference side costs ~0.35 s/sample here — probe_ref_step.py): batch 32
# doubles updates/epoch at identical per-sample cost, which the 30-step
# epochs of a first batch-64 attempt needed (dev AUC still climbing at
# epoch 14).
GEOMETRY = dict(
    word_embedding_dim=300,
    MSA_head_num=16, MSA_head_dim=25,   # news_embedding_dim = 400
    cnn_kernel_num=400,
    attention_dim=256,
    max_title_length=32,
    max_history_num=50,
    SAG_neighbors=5, SAG_hops=2,        # news_graph_size = 26
    graph_depth=3,
    negative_sample_num=4,
    batch_size=32,
    lr=1e-3,
    epoch=6,
    early_stopping_epoch=5,
    word_threshold=3,
    dev_criterion="avg",
)

DATASET = dict(
    news_num=3000, categories=10, train_behaviors=1500, dev_behaviors=500,
    test_behaviors=500, users=300, max_impressions=10, seed=11,
    pref_alpha=0.10, click_base=0.03, click_scale=0.95,  # sharp signal
    min_history=8, max_history=60,      # truncates at max_history_num=50
)


def our_prod_config(workdir: str, seed: int, **over):
    """digat_tpu config at production geometry with the TPU path ON."""
    kw = dict(
        use_pallas=True,
        dedup_titles=-1,                 # production dedup (auto capacity)
        rng_impl="rbg",                  # TPU hardware PRNG
        compilation_cache_dir=os.path.join(workdir, "xla_cache"),
    )
    kw.update(over)
    return RP.our_config(workdir, seed, **kw)


def run_ours_tpu(workdir: str, seed: int) -> dict:
    """Train digat_tpu on the real TPU chip; collect run artifacts."""
    out = os.path.join(workdir, f"ours_tpu-MSA-DIGAT-seed{seed}.json")
    if not os.path.exists(out):
        cfg = our_prod_config(workdir, seed)
        flags = []
        for k, v in vars(cfg).items():
            if k in ("vocabulary_size", "category_num", "user_num"):
                continue
            flags += [f"--{k}", str(v)]
        cmd = [sys.executable, "-m", "digat_tpu.cli"] + flags
        env = dict(os.environ)
        env.pop("JAX_PLATFORMS", None)  # let the axon TPU plugin attach
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        log = out.replace(".json", ".stdout")
        with open(log, "w") as lf:
            subprocess.run(cmd, check=True, env=env, cwd=REPO,
                           stdout=lf, stderr=subprocess.STDOUT)
        result = RP.collect_ours(workdir, cfg, log)
        result["framework"] = "digat_tpu-TPU"
        with open(out, "w") as f:
            json.dump(result, f, indent=2)
    with open(out) as f:
        return json.load(f)


def run_reference_prod(workdir: str, seed: int) -> dict:
    row = RP.run_reference(workdir, seed, "DIGAT", "MSA")
    row["framework"] = "reference-prod"
    return row


def merge_results(rows: list) -> None:
    out = os.path.join(REPO, "docs", "PARITY_RESULTS.json")
    doc = {}
    if os.path.exists(out):
        with open(out) as f:
            doc = json.load(f)
    prior = doc.get("runs", [])
    seen = {(r["framework"], r["model"], r["seed"]) for r in rows}
    rows = rows + [
        r for r in prior
        if (r["framework"], r["model"], r["seed"]) not in seen
    ]
    doc["prod_geometry"] = GEOMETRY
    doc["prod_dataset"] = DATASET
    doc["summary"] = RP.summarize(rows)
    doc["runs"] = rows
    with open(out, "w") as f:
        json.dump(doc, f, indent=2)
    print(f"[parity-prod] wrote {out}")
    for key in ("digat_tpu-TPU/MSA-DIGAT", "reference-prod/MSA-DIGAT"):
        entry = doc["summary"].get(key)
        if entry and "dev" in entry:
            d = entry["dev"]
            print(f"  {key}: dev AUC {d['auc']['mean']:.4f}±{d['auc']['std']:.4f}"
                  f" MRR {d['mrr']['mean']:.4f}±{d['mrr']['std']:.4f}"
                  f" nDCG@5 {d['ndcg5']['mean']:.4f}±{d['ndcg5']['std']:.4f}"
                  f" nDCG@10 {d['ndcg10']['mean']:.4f}±{d['ndcg10']['std']:.4f}"
                  f" (n={entry['n_seeds']})")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir",
                    default=os.path.join(REPO, "parity_runs_prod"))
    ap.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2])
    ap.add_argument("--frameworks", nargs="+",
                    default=["digat_tpu", "reference"])
    args = ap.parse_args(argv)

    # The PARENT must never attach the axon TPU backend: the tunnel serves
    # one client, and a parent holding it starves the per-seed CLI
    # subprocesses (which are the ones meant to run on the chip). Pin CPU
    # before anything imports jax.
    RP.pin_cpu()

    # Production geometry/dataset for every helper reused from run_parity
    # (their module globals drive our_config / ref_overrides / gen_*).
    RP.GEOMETRY = GEOMETRY
    RP.DATASET = DATASET

    wd = args.workdir
    os.makedirs(os.path.join(wd, "ref", "run"), exist_ok=True)
    data_root = os.path.join(wd, "data")
    RP.gen_dataset(os.path.join(data_root, "MIND-small"))
    link = os.path.join(wd, "ref", "MIND-small")
    if not os.path.exists(link):
        os.symlink(os.path.join(data_root, "MIND-small"), link)
    RP.gen_glove(os.path.join(data_root, "MIND-small"),
                 os.path.join(wd, "glove.txt"),
                 GEOMETRY["word_embedding_dim"])
    # preprocessing (SAG artifact both sides share) runs on CPU
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    cache_dir = RP.build_our_cache(wd, os.path.join(wd, "glove.txt"))
    RP.convert_sag_to_reference(cache_dir, os.path.join(wd, "ref", "run"),
                                RP.our_config(wd, seed=0))

    rows = []
    for seed in args.seeds:
        if "digat_tpu" in args.frameworks:
            print(f"[parity-prod] digat_tpu TPU DIGAT seed {seed}", flush=True)
            rows.append(run_ours_tpu(wd, seed))
        if "reference" in args.frameworks:
            print(f"[parity-prod] reference DIGAT seed {seed}", flush=True)
            rows.append(run_reference_prod(wd, seed))
            RP.check_dict_consistency(wd, cache_dir)
    merge_results(rows)


if __name__ == "__main__":
    main()
