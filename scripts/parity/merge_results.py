#!/usr/bin/env python
"""Collection-only rebuild of docs/PARITY_RESULTS.json from every per-seed
record on disk (parity_runs*/ *.json), keeping prior aggregated rows whose
per-seed files no longer exist (round-2 cells). Safe to run any time; no
training happens here."""

from __future__ import annotations

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import run_parity as RP

    rows = []
    for d in ("parity_runs", "parity_runs_prod", "parity_runs_refprot"):
        for path in sorted(glob.glob(os.path.join(REPO, d, "*.json"))):
            with open(path) as f:
                try:
                    r = json.load(f)
                except json.JSONDecodeError:
                    continue
            if isinstance(r, dict) and {"framework", "model", "seed"} <= set(r):
                rows.append(r)
    out = os.path.join(REPO, "docs", "PARITY_RESULTS.json")
    doc = json.load(open(out)) if os.path.exists(out) else {}
    seen = {(r["framework"], r["model"], r["seed"]) for r in rows}
    rows += [r for r in doc.get("runs", [])
             if (r["framework"], r["model"], r["seed"]) not in seen]
    doc["runs"] = rows
    doc["summary"] = RP.summarize(rows)
    with open(out, "w") as f:
        json.dump(doc, f, indent=2)
    print(f"[merge] {len(rows)} rows -> {out}")
    for key in sorted(doc["summary"]):
        e = doc["summary"][key]
        if "dev" in e:
            d = e["dev"]
            print(f"  {key}: dev AUC {d['auc']['mean']:.4f}"
                  f"±{d['auc']['std']:.4f} (n={e['n_seeds']})")


if __name__ == "__main__":
    main()
