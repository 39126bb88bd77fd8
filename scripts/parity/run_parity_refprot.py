#!/usr/bin/env python
"""Production-geometry parity cell at the REFERENCE protocol point
(round-5 item 3): batch_size=64, lr=1e-4, dropout 0.2, epoch=16 — the
reference's own MIND-small defaults (reference config.py:31-35,62-64) —
instead of the tiny-corpus convergence protocol (B=32, lr=1e-3) the
round-4 prod cell used.

digat_tpu trains ON THE CHIP with the full production path (Pallas
kernels, rbg PRNG, dedup) at reference geometry (D=400, G=26, history
50); the reference trains on CPU; both share one synthetic corpus, one
GloVe file, one SAG. At lr=1e-4 the 1.9k-sample corpus yields ~29
updates/epoch x 16 epochs ~= 470 updates; learning is slower than the
lr=1e-3 cell, which is the point — the protocol column of this cell reads
"reference defaults".

Summary keys: `digat_tpu-TPU-refprot/MSA-DIGAT`,
`reference-refprot/MSA-DIGAT` in docs/PARITY_RESULTS.json.
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
import run_parity_prod as RPP  # noqa: E402

PROTOCOL = dict(batch_size=64, lr=1e-4, epoch=16, dropout_rate=0.2)

GEOMETRY = dict(RPP.GEOMETRY)
GEOMETRY.update(PROTOCOL)


def run_ours_tpu(wd: str, seed: int) -> dict:
    out = os.path.join(wd, f"ours_tpu_refprot-MSA-DIGAT-seed{seed}.json")
    if not os.path.exists(out):
        cfg = RPP.our_prod_config(wd, seed, epoch_override=PROTOCOL["epoch"])
        flags = []
        for k, v in vars(cfg).items():
            if k in ("vocabulary_size", "category_num", "user_num"):
                continue
            flags += [f"--{k}", str(v)]
        cmd = [sys.executable, "-m", "digat_tpu.cli"] + flags
        env = dict(os.environ)
        env.pop("JAX_PLATFORMS", None)  # the CLI subprocess gets the chip
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        log = out.replace(".json", ".stdout")
        with open(log, "w") as lf:
            subprocess.run(cmd, check=True, env=env, cwd=REPO,
                           stdout=lf, stderr=subprocess.STDOUT)
        result = RP.collect_ours(wd, cfg, log)
        result["framework"] = "digat_tpu-TPU-refprot"
        result["protocol"] = PROTOCOL
        with open(out, "w") as f:
            json.dump(result, f, indent=2)
    with open(out) as f:
        return json.load(f)


def run_reference(wd: str, seed: int) -> dict:
    row = RP.run_reference(wd, seed, "DIGAT", "MSA")
    row["framework"] = "reference-refprot"
    row["protocol"] = PROTOCOL
    return row


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir",
                    default=os.path.join(REPO, "parity_runs_refprot"))
    ap.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2])
    ap.add_argument("--frameworks", nargs="+",
                    default=["digat_tpu", "reference"])
    args = ap.parse_args(argv)
    RP.pin_cpu()

    RP.GEOMETRY = GEOMETRY
    RP.DATASET = RPP.DATASET
    RPP.GEOMETRY = GEOMETRY

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
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    cache_dir = RP.build_our_cache(wd, os.path.join(wd, "glove.txt"))
    RP.convert_sag_to_reference(cache_dir, os.path.join(wd, "ref", "run"),
                                RP.our_config(wd, seed=0))

    rows = []
    for seed in args.seeds:
        if "digat_tpu" in args.frameworks:
            print(f"[refprot] digat_tpu TPU seed {seed}", flush=True)
            rows.append(run_ours_tpu(wd, seed))
        if "reference" in args.frameworks:
            print(f"[refprot] reference seed {seed}", flush=True)
            rows.append(run_reference(wd, seed))
    RPP.merge_results(rows)
    out = json.load(open(os.path.join(REPO, "docs", "PARITY_RESULTS.json")))
    for key in ("digat_tpu-TPU-refprot/MSA-DIGAT",
                "reference-refprot/MSA-DIGAT"):
        e = out["summary"].get(key, {})
        if "dev" in e:
            d = e["dev"]
            print(f"  {key}: dev AUC {d['auc']['mean']:.4f}"
                  f"±{d['auc']['std']:.4f} (n={e['n_seeds']})")


if __name__ == "__main__":
    main()
