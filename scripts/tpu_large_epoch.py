"""MIND-large-magnitude CLI training on the real TPU (round-4 item 3).

Generates a synthetic dataset at the reference's MIND-large scale hazard
point (~100k news, 500k+ train behaviors — reference config.py:65-67,
MIND_corpus.py:146's materialized user-graph RAM bomb this design removes)
and drives the production CLI train path for one or more epochs: full
preprocessing (native behaviors parse + SAG mining + BFS), dedup capacity
estimation, Pallas-kernel training, per-epoch sharded dev eval, best
checkpoint, auto-test — everything the MIND-large protocol touches, on
one chip.

Records wall time per phase and peak RSS; the numbers land in
docs/PERF.md.

Run: python scripts/tpu_large_epoch.py [--epochs 1]
"""

from __future__ import annotations

import argparse
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DATA = dict(
    news_num=100_000, categories=18, train_behaviors=500_000,
    dev_behaviors=25_000, test_behaviors=25_000, users=50_000,
    max_impressions=12, seed=17,
    pref_alpha=0.12, click_base=0.05, click_scale=0.9,
    min_history=4, max_history=60,
)


def rss_gb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=1)
    ap.add_argument("--data-root", default="data-tpu-large")
    ap.add_argument("--run-root", default="runs-tpu-large")
    args = ap.parse_args()

    from digat_tpu.data import synthetic

    root = os.path.join(args.data_root, "synthetic")
    if not os.path.exists(os.path.join(root, "train", "behaviors.tsv")):
        print(f"[large] generating {DATA['news_num']}-news / "
              f"{DATA['train_behaviors']}-behavior dataset", flush=True)
        t0 = time.time()
        synthetic.generate(root, **DATA)
        print(f"[large] generated in {time.time() - t0:.0f}s "
              f"(rss {rss_gb():.1f} GB)", flush=True)

    from digat_tpu.cli import main as cli_main

    t0 = time.time()
    cli_main([
        "--dataset", "synthetic",
        "--data_root", args.data_root,
        "--run_root", args.run_root,
        "--epoch", str(args.epochs),
        "--seed", "0",
        # MIND-large protocol dropout (reference config.py:66)
        "--dropout_rate", "0.1",
    ])
    print(f"[large] total wall {time.time() - t0:.0f}s, peak rss "
          f"{rss_gb():.1f} GB", flush=True)


if __name__ == "__main__":
    main()
