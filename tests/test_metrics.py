"""Metric parity: NumPy AUC vs sklearn; nDCG/MRR hand-checked; rank-file
round trip (the MIND official-scorer contract, evaluate.py)."""

import numpy as np
import pytest

from digat_tpu.eval import metrics as M


def test_auc_matches_sklearn():
    sklearn = pytest.importorskip("sklearn.metrics")
    rng = np.random.default_rng(0)
    for _ in range(20):
        n = rng.integers(4, 40)
        y = rng.integers(0, 2, n)
        if y.sum() in (0, n):
            y[0] = 1 - y[0]
        s = rng.normal(size=n)
        if rng.random() < 0.5:  # inject ties
            s = np.round(s, 1)
        np.testing.assert_allclose(
            M.auc_score(y, s), sklearn.roc_auc_score(y, s), rtol=1e-12
        )


def test_mrr_simple():
    y = np.array([0, 1, 0, 0])
    s = np.array([0.9, 0.8, 0.1, 0.0])  # positive ranked 2nd
    assert M.mrr_score(y, s) == pytest.approx(0.5)


def test_ndcg_perfect_and_worst():
    y = np.array([1, 0, 0, 0])
    assert M.ndcg_score(y, np.array([4.0, 3, 2, 1]), 10) == pytest.approx(1.0)
    worst = M.ndcg_score(y, np.array([1.0, 2, 3, 4]), 10)
    assert worst == pytest.approx(1 / np.log2(5) / 1.0)


def test_rank_file_roundtrip(tmp_path):
    scores = [np.array([0.1, 0.9, 0.5]), np.array([0.3, 0.2])]
    labels = [np.array([0, 1, 0]), np.array([1, 0])]
    path = str(tmp_path / "pred.txt")
    truth = str(tmp_path / "truth.txt")
    M.write_rank_file(path, scores)
    with open(truth, "w") as f:
        f.write("1 [0,1,0]\n2 [1,0]")
    direct = M.score_impressions(labels, scores)
    via_files = M.scoring_from_files(truth, path)
    np.testing.assert_allclose(direct, via_files, rtol=1e-12)


def test_rank_file_format(tmp_path):
    path = str(tmp_path / "pred.txt")
    M.write_rank_file(path, [np.array([0.1, 0.9, 0.5])])
    assert open(path).read() == "1 [3,1,2]"


def test_masked_impressions_skipped():
    out = M.score_impressions(
        [np.array([]), np.array([1, 0])], [np.array([]), np.array([0.9, 0.1])]
    )
    assert out[0] == pytest.approx(1.0)


def test_avg_metric():
    assert M.avg_metric(0.6, 0.3, 0.4, 0.2) == pytest.approx(
        (0.6 + 0.3 + 0.3) / 3
    )


def test_flat_scoring_matches_list_path():
    rng = np.random.default_rng(3)
    sizes = rng.integers(2, 30, size=200)
    imp_index = np.repeat(np.arange(len(sizes)), sizes)
    n = len(imp_index)
    labels = (rng.random(n) < 0.2).astype(np.int8)
    # every impression gets >=1 positive and >=1 negative so AUC is defined
    first = np.cumsum(sizes) - sizes
    labels[first] = 1
    labels[first + 1] = 0
    scores = rng.normal(size=n)  # continuous: no ties, orders agree
    flat = M.score_impressions_flat(imp_index, labels, scores)
    listy = M.score_impressions(
        M.group_by_impression(imp_index, labels),
        M.group_by_impression(imp_index, scores),
    )
    np.testing.assert_allclose(flat, listy, rtol=1e-12)


def test_flat_scoring_single_class_propagates_nan():
    imp_index = np.array([0, 0, 1, 1])
    labels = np.array([1, 1, 1, 0])  # impression 0 has no negative
    scores = np.array([0.3, 0.2, 0.9, 0.1])
    auc, mrr, n5, n10 = M.score_impressions_flat(imp_index, labels, scores)
    assert np.isnan(auc)
    assert not np.isnan(mrr)


def test_group_by_impression_keeps_file_order():
    imp = np.array([0, 0, 2, 1, 1])
    vals = np.array([10, 11, 30, 20, 21])
    groups = M.group_by_impression(imp, vals)
    assert [g.tolist() for g in groups] == [[10, 11], [20, 21], [30]]


def test_write_truth_file(tmp_path):
    behaviors = tmp_path / "behaviors.tsv"
    behaviors.write_text(
        "1\tU1\tt\tN1 N2\tN3-1 N4-0\n"
        "2\tU2\tt\t\tN5-0 N6-0 N7-1\n"
    )
    out = tmp_path / "truth.txt"
    M.write_truth_file(str(behaviors), str(out))
    assert out.read_text() == "1 [1,0]\n2 [0,0,1]"
    parsed = M.read_rank_or_truth_file(str(out))
    assert [p.tolist() for p in parsed] == [[1, 0], [0, 0, 1]]
