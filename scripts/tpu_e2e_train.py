"""End-to-end CLI training on the real TPU at reference geometry.

Generates a MIND-small-magnitude synthetic dataset (65k news, 60k train
behaviors, sharp click signal), then drives the production CLI train path
(preprocess -> SAG -> dedup train with Pallas kernels -> per-epoch sharded
eval -> best-checkpoint auto-test) on the TPU with the reference's model
geometry (MSA-DIGAT, D=400, depth 3, G=26, history 50, B=64, lr 1e-4).

This is the hardware integration proof the unit benches don't give:
the full trainer loop, dedup capacity estimation, eval caches and the
official scorer all running together on the chip at production shapes.

Run: python scripts/tpu_e2e_train.py [--epochs 6]
Results land under runs-tpu-e2e/ and are summarized on stdout.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DATA = dict(
    news_num=65_000, categories=18, train_behaviors=60_000,
    dev_behaviors=6_000, test_behaviors=6_000, users=5_000,
    max_impressions=12, seed=11,
    pref_alpha=0.12, click_base=0.05, click_scale=0.9,
    min_history=4, max_history=60,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--data-root", default="data-tpu-e2e")
    ap.add_argument("--run-root", default="runs-tpu-e2e")
    args = ap.parse_args()

    from digat_tpu.data import synthetic

    # dataset name stays 'synthetic' (the CLI's hermetic path) but under a
    # dedicated data_root, pre-generated here at MIND-small magnitude so
    # cli.prepare skips its default-size generation
    root = os.path.join(args.data_root, "synthetic")
    if not os.path.exists(os.path.join(root, "train", "behaviors.tsv")):
        print(f"[e2e] generating {DATA['news_num']}-news dataset", flush=True)
        t0 = time.time()
        synthetic.generate(root, **DATA)
        print(f"[e2e] generated in {time.time() - t0:.0f}s", flush=True)

    from digat_tpu.cli import main as cli_main

    t0 = time.time()
    cli_main([
        "--dataset", "synthetic",
        "--data_root", args.data_root,
        "--run_root", args.run_root,
        "--epoch", str(args.epochs),
        "--seed", "0",
    ])
    print(f"[e2e] total wall {time.time() - t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
