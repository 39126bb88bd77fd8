"""MIND official ranking metrics in pure NumPy.

Same math as the reference scorer (evaluate.py:7-89) — AUC, MRR, nDCG@5,
nDCG@10, averaged over impressions — without the sklearn dependency: AUC is
the rank-statistic form with midrank tie handling, which matches
roc_auc_score exactly.

Also provides the rank-file writer/reader pair so outputs stay
leaderboard-compatible (prediction.txt format, evaluate.py:27-30 and
util.py:70-80)."""

from __future__ import annotations

import json
from typing import Dict, Iterable, List, Sequence, Tuple

import numpy as np


def auc_score(y_true: np.ndarray, y_score: np.ndarray) -> float:
    """Rank-based ROC-AUC with midrank ties (== sklearn.roc_auc_score)."""
    y_true = np.asarray(y_true, np.float64)
    y_score = np.asarray(y_score, np.float64)
    n_pos = y_true.sum()
    n_neg = len(y_true) - n_pos
    if n_pos == 0 or n_neg == 0:
        return float("nan")
    order = np.argsort(y_score, kind="mergesort")
    ranks = np.empty(len(y_score), np.float64)
    sorted_scores = y_score[order]
    i = 0
    r = 1.0
    while i < len(sorted_scores):
        j = i
        while j + 1 < len(sorted_scores) and sorted_scores[j + 1] == sorted_scores[i]:
            j += 1
        mid = (r + r + (j - i)) / 2.0
        ranks[order[i : j + 1]] = mid
        r += j - i + 1
        i = j + 1
    pos_rank_sum = ranks[y_true > 0].sum()
    return float((pos_rank_sum - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg))


def dcg_score(y_true, y_score, k: int = 10) -> float:
    order = np.argsort(y_score)[::-1]
    taken = np.take(np.asarray(y_true, np.float64), order[:k])
    gains = 2**taken - 1
    discounts = np.log2(np.arange(len(taken)) + 2)
    return float(np.sum(gains / discounts))


def ndcg_score(y_true, y_score, k: int = 10) -> float:
    best = dcg_score(y_true, y_true, k)
    return dcg_score(y_true, y_score, k) / best


def mrr_score(y_true, y_score) -> float:
    order = np.argsort(y_score)[::-1]
    taken = np.take(np.asarray(y_true, np.float64), order)
    rr = taken / (np.arange(len(taken)) + 1)
    return float(np.sum(rr) / np.sum(taken))


def score_impressions(
    labels: Sequence[np.ndarray], scores: Sequence[np.ndarray]
) -> Tuple[float, float, float, float]:
    """Mean AUC/MRR/nDCG@5/nDCG@10 over impressions; impressions with no
    labels (masked) are skipped, matching evaluate.py:43-45."""
    aucs, mrrs, n5s, n10s = [], [], [], []
    for y, s in zip(labels, scores):
        if len(y) == 0:
            continue
        aucs.append(auc_score(y, s))
        mrrs.append(mrr_score(y, s))
        n5s.append(ndcg_score(y, s, 5))
        n10s.append(ndcg_score(y, s, 10))
    return (
        float(np.mean(aucs)),
        float(np.mean(mrrs)),
        float(np.mean(n5s)),
        float(np.mean(n10s)),
    )


def group_by_impression(
    imp_index: np.ndarray, values: np.ndarray
) -> List[np.ndarray]:
    """Split item-level values into per-impression arrays (file order)."""
    n_imp = int(imp_index.max()) + 1 if len(imp_index) else 0
    out: List[List] = [[] for _ in range(n_imp)]
    for idx, v in zip(imp_index, values):
        out[idx].append(v)
    return [np.asarray(x) for x in out]


# ---------------------------------------------------------------------------
# Rank files (leaderboard format)
# ---------------------------------------------------------------------------


def write_rank_file(path: str, scores_by_impression: Sequence[np.ndarray]) -> None:
    """`<imp_id> [r1,r2,...]` where r_j is the rank of candidate j by
    descending score (util.py:70-80)."""
    with open(path, "w", encoding="utf-8") as f:
        for i, s in enumerate(scores_by_impression):
            order = np.argsort(-np.asarray(s), kind="stable")
            ranks = np.empty(len(s), np.int64)
            ranks[order] = np.arange(1, len(s) + 1)
            f.write(("" if i == 0 else "\n") + f"{i + 1} " + json.dumps(ranks.tolist(), separators=(",", ":")))


def read_rank_or_truth_file(path: str) -> List[np.ndarray]:
    out = []
    with open(path, "r", encoding="utf-8") as f:
        for line in f:
            if not line.strip():
                continue
            _, payload = line.strip().split(" ", 1)
            out.append(np.asarray(json.loads(payload)))
    return out


def scoring_from_files(truth_path: str, rank_path: str):
    """Official-scorer entry: metrics from a truth file + rank file, scoring
    1/rank like evaluate.py:68-75."""
    truth = read_rank_or_truth_file(truth_path)
    ranks = read_rank_or_truth_file(rank_path)
    labels = [t for t in truth if len(t)]
    scores = [1.0 / r for t, r in zip(truth, ranks) if len(t)]
    return score_impressions(labels, scores)


def avg_metric(auc: float, mrr: float, ndcg5: float, ndcg10: float) -> float:
    """Composite dev criterion (util.py:100-106)."""
    return (auc + mrr + (ndcg5 + ndcg10) / 2.0) / 3.0


def main(argv=None) -> None:
    """Official-scorer CLI (evaluate.py:92-115 convention):
    `python -m digat_tpu.eval.metrics <input_dir> <output_dir>` where
    input_dir holds res/prediction.txt and ref/truth.txt; writes
    scores.txt into output_dir."""
    import os
    import sys

    args = argv if argv is not None else sys.argv[1:]
    input_dir, output_dir = args[0], args[1]
    truth = os.path.join(input_dir, "ref", "truth.txt")
    pred = os.path.join(input_dir, "res", "prediction.txt")
    os.makedirs(output_dir, exist_ok=True)
    auc, mrr, ndcg5, ndcg10 = scoring_from_files(truth, pred)
    out = os.path.join(output_dir, "scores.txt")
    with open(out, "w", encoding="utf-8") as f:
        f.write(
            "AUC:%.4f\nMRR:%.4f\nnDCG@5:%.4f\nnDCG@10:%.4f"
            % (auc, mrr, ndcg5, ndcg10)
        )
    print(open(out).read())


if __name__ == "__main__":
    main()
