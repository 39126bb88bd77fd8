"""Child process for the MIND-large scale test (run via subprocess so peak
RSS is attributable to exactly this workload).

Synthesizes a behaviors.tsv at MIND-large scale (~2M rows), then times the
scale-sensitive preprocessing stages end to end:

  * behaviors parsing (native C++ when available, else Python),
  * vectorized split assembly (train sample expansion / eval flattening),
  * official-scorer truth.txt generation,
  * flat impression scoring at ~24M eval items.

Prints one JSON line with wall-clock per stage and the process's peak RSS.
The reference materializes [rows, 68, 68] bool user graphs at this stage
(MIND_corpus.py:146) — ~2M rows x 4.6 KB = ~9.2 GB for the adjacency alone;
this pipeline stores only the compact per-slot category encoding.
"""

from __future__ import annotations

import json
import os
import resource
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROWS = int(os.environ.get("SCALE_ROWS", 2_000_000))
NEWS_NUM = 100_000


def synthesize_tsv(path: str, rng: np.random.Generator) -> int:
    """Write ROWS behavior lines; returns total candidate items."""
    names = np.array([f"N{i}" for i in range(1, NEWS_NUM)])
    total_items = 0
    with open(path, "w", encoding="utf-8") as f:
        chunk = 50_000
        for lo in range(0, ROWS, chunk):
            n = min(chunk, ROWS - lo)
            hist_len = rng.integers(0, 30, n)
            cand_len = rng.integers(2, 22, n)
            total_items += int(cand_len.sum())
            hist_ids = names[rng.integers(0, NEWS_NUM - 1, int(hist_len.sum()))]
            cand_ids = names[rng.integers(0, NEWS_NUM - 1, int(cand_len.sum()))]
            labels = rng.random(int(cand_len.sum())) < 0.15
            lines = []
            ho = co = 0
            for i in range(n):
                h = " ".join(hist_ids[ho:ho + hist_len[i]])
                ho += hist_len[i]
                cl = cand_len[i]
                # every impression carries >=1 click and >=1 non-click, like
                # real MIND dev rows (AUC is undefined on single-class rows
                # and the official scorer rejects them)
                labels[co], labels[co + 1] = True, False
                imp = " ".join(
                    f"{c}-{1 if l else 0}"
                    for c, l in zip(cand_ids[co:co + cl], labels[co:co + cl])
                )
                co += cl
                lines.append(f"{lo + i + 1}\tU{rng.integers(1, 500000)}\t"
                             f"11/11/2019 9:05:58 AM\t{h}\t{imp}\n")
            f.writelines(lines)
    return total_items


def main() -> None:
    from digat_tpu.config import Config
    from digat_tpu.data.corpus import _assemble_split, _parse_behaviors
    from digat_tpu.eval import metrics

    rng = np.random.default_rng(0)
    out: dict = {"rows": ROWS}
    with tempfile.TemporaryDirectory() as td:
        tsv = os.path.join(td, "behaviors.tsv")
        t0 = time.time()
        total_items = synthesize_tsv(tsv, rng)
        out["synthesize_s"] = round(time.time() - t0, 2)
        out["items"] = total_items
        news_dict = {"<PAD>": 0}
        news_dict.update({f"N{i}": i for i in range(1, NEWS_NUM)})

        t0 = time.time()
        ragged = _parse_behaviors(tsv, news_dict)
        out["parse_s"] = round(time.time() - t0, 2)
        from digat_tpu import native

        out["native_parser"] = bool(native.available())

        cfg = Config(dataset="synthetic", category_num=18)
        news_category = rng.integers(0, 18, NEWS_NUM).astype(np.int16)
        t0 = time.time()
        train = _assemble_split(cfg, "train", ragged, news_category, 18)
        out["assemble_train_s"] = round(time.time() - t0, 2)
        out["train_samples"] = int(len(train["train_pos"]))
        t0 = time.time()
        dev = _assemble_split(cfg, "dev", ragged, news_category, 18)
        out["assemble_dev_s"] = round(time.time() - t0, 2)

        t0 = time.time()
        truth = os.path.join(td, "truth.txt")
        metrics.write_truth_file(tsv, truth)
        out["truth_s"] = round(time.time() - t0, 2)

        imp_index = dev["dev_imp_index"]
        labels = dev["dev_labels"]
        scores = rng.random(len(labels)).astype(np.float32)
        t0 = time.time()
        auc, mrr, n5, n10 = metrics.score_impressions_flat(
            imp_index, labels, scores
        )
        out["score_s"] = round(time.time() - t0, 2)
        out["auc_random"] = round(float(auc), 4)

    out["peak_rss_gb"] = round(
        resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6, 2
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
