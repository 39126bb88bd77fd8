#!/usr/bin/env python
"""B=256 protocol-extension parity cell (round-5 item 7).

The reference pins batch_size=64 (reference config.py:31); digat_tpu's
bench shows +29% train throughput at B=256. This cell provides the metric
evidence that relaxing the pin is safe: digat_tpu trained at B=64 vs
B=256 on the shared parity corpus, 3 seeds each, reduced geometry
(scripts/parity/run_parity.py GEOMETRY/DATASET).

LR scaling choice: sqrt scaling (lr *= sqrt(B_new/B_old) = 2.0) with the
epoch count doubled so both arms see a comparable optimizer-update count
(~230 vs ~115 updates on the 1.9k-sample corpus). Sqrt scaling is the
conservative choice for Adam (linear scaling is derived for SGD; for
adaptive optimizers the gradient-noise argument gives ~sqrt), and the
doubled epochs keep the small-corpus convergence point comparable.

Merges summary keys `digat_tpu/MSA-DIGAT+b64` / `+b256` into
docs/PARITY_RESULTS.json.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import run_parity as RP  # noqa: E402

ARMS = {
    "b64": dict(batch_size=64, lr=1e-3, epoch_override=8),
    "b256": dict(batch_size=256, lr=2e-3, epoch_override=16),  # sqrt lr
}


def run_arm(wd: str, seed: int, arm: str) -> dict:
    out = os.path.join(wd, f"ours-MSA-DIGAT+{arm}-seed{seed}.json")
    if not os.path.exists(out):
        cfg = RP.our_config(wd, seed, graph_encoder="DIGAT",
                            news_encoder="MSA", **ARMS[arm])
        flags = []
        for k, v in vars(cfg).items():
            if k in ("vocabulary_size", "category_num", "user_num"):
                continue
            flags += [f"--{k}", str(v)]
        runner = (
            "import jax; jax.config.update('jax_platforms', 'cpu'); "
            "import sys; from digat_tpu.cli import main; main(sys.argv[1:])"
        )
        env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
        log = out.replace(".json", ".stdout")
        with open(log, "w") as lf:
            subprocess.run([sys.executable, "-c", runner] + flags,
                           check=True, env=env, cwd=REPO,
                           stdout=lf, stderr=subprocess.STDOUT)
        result = RP.collect_ours(wd, cfg, log)
        result["model"] += f"+{arm}"
        result["protocol"] = ARMS[arm]
        with open(out, "w") as f:
            json.dump(result, f, indent=2)
    with open(out) as f:
        return json.load(f)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default=os.path.join(REPO, "parity_runs"))
    ap.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2])
    args = ap.parse_args(argv)
    RP.pin_cpu()

    wd = args.workdir
    RP.gen_dataset(os.path.join(wd, "data", "MIND-small"))
    RP.build_our_cache(wd, os.path.join(wd, "glove.txt"))

    rows = []
    for arm in ARMS:
        for seed in args.seeds:
            print(f"[b256-cell] arm {arm} seed {seed}", flush=True)
            rows.append(run_arm(wd, seed, arm))

    out = os.path.join(REPO, "docs", "PARITY_RESULTS.json")
    doc = json.load(open(out)) if os.path.exists(out) else {}
    prior = doc.get("runs", [])
    seen = {(r["framework"], r["model"], r["seed"]) for r in rows}
    doc["runs"] = rows + [
        r for r in prior
        if (r["framework"], r["model"], r["seed"]) not in seen
    ]
    doc["b256_protocols"] = ARMS
    doc["summary"] = RP.summarize(doc["runs"])
    with open(out, "w") as f:
        json.dump(doc, f, indent=2)
    for key in ("digat_tpu/MSA-DIGAT+b64", "digat_tpu/MSA-DIGAT+b256"):
        e = doc["summary"].get(key, {})
        if "dev" in e:
            d = e["dev"]
            print(f"  {key}: dev AUC {d['auc']['mean']:.4f}"
                  f"±{d['auc']['std']:.4f} (n={e['n_seeds']})")


if __name__ == "__main__":
    main()
