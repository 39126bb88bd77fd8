#!/usr/bin/env python
"""NRMS-family production-path parity: train NRMS / NRMS-SA on the TPU
with the Pallas kernels ON (grouped/masked MSA attention, fused encoder
paths) against the round-3 CPU cells of the reference's Appendix-B
pipeline, on the SAME parity_runs dataset and augmented-news artifact.

The CPU matrix (docs/PARITY.md) already shows digat_tpu == reference for
NRMS and NRMS-SA with XLA fallbacks; this adds the cell where the NRMS
kernels that ship actually engage, through full training runs.

Usage: python scripts/parity/run_parity_nrms_tpu.py --seeds 0 1 2 \
           --nrms-models NRMS-SA
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import run_parity as RP  # noqa: E402


def run_ours_nrms_tpu(workdir: str, seed: int, nrms_model: str) -> dict:
    out = os.path.join(workdir, f"ours_tpu-{nrms_model}-seed{seed}.json")
    if not os.path.exists(out):
        cfg = RP.our_nrms_config(workdir, seed, nrms_model)
        cfg.use_pallas = True
        cfg.rng_impl = "rbg"
        cfg.compilation_cache_dir = os.path.join(workdir, "xla_cache_nrms")
        flags = []
        for k, v in vars(cfg).items():
            if k in ("vocabulary_size", "category_num", "user_num"):
                continue
            flags += [f"--{k}", str(v)]
        cmd = [sys.executable, "-m", "digat_tpu.cli"] + flags
        env = dict(os.environ)
        env.pop("JAX_PLATFORMS", None)  # attach the axon TPU plugin
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        log = out.replace(".json", ".stdout")
        with open(log, "w") as lf:
            subprocess.run(cmd, check=True, env=env, cwd=REPO,
                           stdout=lf, stderr=subprocess.STDOUT)
        result = RP.collect_ours(workdir, cfg, log, model_name=nrms_model)
        result["framework"] = "digat_tpu-TPU"
        with open(out, "w") as f:
            json.dump(result, f, indent=2)
    with open(out) as f:
        return json.load(f)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default=os.path.join(REPO, "parity_runs"))
    ap.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2])
    ap.add_argument("--nrms-models", nargs="+", default=["NRMS-SA"])
    args = ap.parse_args(argv)
    RP.pin_cpu()  # the PARENT must not hold the TPU tunnel

    rows = []
    for m in args.nrms_models:
        for seed in args.seeds:
            print(f"[nrms-tpu] {m} seed {seed}", flush=True)
            rows.append(run_ours_nrms_tpu(args.workdir, seed, m))

    out = os.path.join(REPO, "docs", "PARITY_RESULTS.json")
    doc = json.load(open(out)) if os.path.exists(out) else {}
    prior = doc.get("runs", [])
    seen = {(r["framework"], r["model"], r["seed"]) for r in rows}
    rows = rows + [r for r in prior
                   if (r["framework"], r["model"], r["seed"]) not in seen]
    doc["summary"] = RP.summarize(rows)
    doc["runs"] = rows
    with open(out, "w") as f:
        json.dump(doc, f, indent=2)
    print(f"[nrms-tpu] wrote {out}")
    for m in args.nrms_models:
        for key in (f"digat_tpu-TPU/{m}", f"reference/{m}", f"digat_tpu/{m}"):
            e = doc["summary"].get(key)
            if e and "dev" in e:
                d = e["dev"]
                print(f"  {key}: dev AUC {d['auc']['mean']:.4f}±{d['auc']['std']:.4f}"
                      f" MRR {d['mrr']['mean']:.4f}±{d['mrr']['std']:.4f}"
                      f" (n={e['n_seeds']})")


if __name__ == "__main__":
    main()
