#!/usr/bin/env python
"""Vanilla-GAT deficit analysis (round-5 item 2).

Round 4's verdict observed that every parity cell containing a vanilla
(non-interactive) GAT sat below the reference on all four dev metrics
(12/12 negative signs at n=3). Round 5 (a) proved the vanilla variants
functionally IDENTICAL to the executable reference via weight transplant
(docs/TRANSPLANT.json: fp64 logits to 1e-14, fp32 eval rank files
byte-identical), which eliminates model math; (b) extended the three
cells to n=8 seeds per framework. This script computes the pooled
per-seed deltas and an exact two-sided sign test over the per-cell AUC
deltas, writing docs/VANILLA_DEFICIT.json.

Statistical note: metrics within a cell are correlated (same runs), so
the sign test uses ONE statistic per cell x seed (dev AUC of matching
seeds, ours - reference); cells are independent training populations.
"""

from __future__ import annotations

import json
import math
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CELLS = ("MSA-wo_interaction", "MSA-news_graph_wo_inter",
         "MSA-user_graph_wo_inter")
METRICS = ("auc", "mrr", "ndcg5", "ndcg10")


def main():
    doc = json.load(open(os.path.join(REPO, "docs", "PARITY_RESULTS.json")))
    runs = doc["runs"]
    by = {}
    for r in runs:
        by[(r["framework"], r["model"], r["seed"])] = r

    out = {"cells": {}, "pooled": {}}
    all_deltas = []  # per (cell, seed) AUC deltas
    pooled_by_metric = {m: [] for m in METRICS}
    for cell in CELLS:
        seeds = sorted(
            s for (fw, m, s) in by if fw == "digat_tpu" and m == cell
            if ("reference", cell, s) in by
        )
        deltas = {m: [] for m in METRICS}
        for s in seeds:
            ours = by[("digat_tpu", cell, s)]["dev"]
            ref = by[("reference", cell, s)]["dev"]
            for m in METRICS:
                deltas[m].append(ours[m] - ref[m])
                pooled_by_metric[m].append(ours[m] - ref[m])
        all_deltas.extend(deltas["auc"])
        out["cells"][cell] = {
            "n": len(seeds), "seeds": seeds,
            "mean_delta": {m: float(np.mean(deltas[m])) for m in METRICS},
            "std_delta": {m: float(np.std(deltas[m], ddof=1)) for m in METRICS},
            "auc_deltas": [round(d, 4) for d in deltas["auc"]],
        }

    # exact two-sided sign test on per-seed AUC deltas pooled across cells
    n = len(all_deltas)
    k = sum(1 for d in all_deltas if d < 0)
    p_two = sum(math.comb(n, i) for i in range(min(k, n - k) + 1)) * 2 / 2**n
    # paired t on pooled AUC deltas
    arr = np.asarray(all_deltas)
    t = float(arr.mean() / (arr.std(ddof=1) / math.sqrt(n))) if n > 1 else 0.0
    out["pooled"] = {
        "n_pairs": n, "negative": k,
        "sign_test_p_two_sided": float(min(p_two, 1.0)),
        "mean_auc_delta": float(arr.mean()),
        "t_statistic": t,
        "per_metric_mean_delta": {
            m: float(np.mean(pooled_by_metric[m])) for m in METRICS
        },
    }
    path = os.path.join(REPO, "docs", "VANILLA_DEFICIT.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out["pooled"], indent=2))
    for cell, e in out["cells"].items():
        print(f"{cell}: n={e['n']} mean dAUC {e['mean_delta']['auc']:+.4f} "
              f"± {e['std_delta']['auc']:.4f}  deltas {e['auc_deltas']}")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
