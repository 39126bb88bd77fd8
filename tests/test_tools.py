"""Dataset preparation split rules, result aggregation, sweep driver."""

import os

import numpy as np
import pytest

from digat_tpu.config import Config
from digat_tpu.data.prepare import split_behaviors
from digat_tpu.eval.aggregate import aggregate
from digat_tpu.sweep import parse_axis, sweep_points


def test_split_behaviors_95_5():
    lines = [f"{i}\tU{i}\tt\th\timps\n" for i in range(1000)]
    train, dev = split_behaviors(lines, seed=0)
    assert len(train) == 950 and len(dev) == 50
    assert sorted(train + dev) == sorted(lines)  # partition, no dupes
    # deterministic
    train2, dev2 = split_behaviors(lines, seed=0)
    assert train == train2 and dev == dev2
    train3, _ = split_behaviors(lines, seed=1)
    assert train != train3


def _write_result(root, dataset, model, run, mode, metrics):
    d = os.path.join(root, "results", dataset, model)
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, f"#{run}-{mode}"), "w") as f:
        f.write(f"#{run}\t" + "\t".join(str(m) for m in metrics) + "\n")


def test_aggregate(tmp_path):
    root = str(tmp_path)
    _write_result(root, "d", "MSA-DIGAT", 1, "dev", [0.6, 0.3, 0.3, 0.4])
    _write_result(root, "d", "MSA-DIGAT", 2, "dev", [0.7, 0.4, 0.4, 0.5])
    _write_result(root, "d", "CNN-DIGAT", 1, "dev", [0.5, 0.2, 0.2, 0.3])
    # allocated-but-empty run marker must be ignored
    open(os.path.join(root, "results", "d", "MSA-DIGAT", "#3-dev"), "w").close()
    overall = aggregate(root, "d", "dev")
    np.testing.assert_allclose(overall["MSA-DIGAT"], [0.65, 0.35, 0.35, 0.45])
    exp = os.path.join(root, "results", "d", "MSA-DIGAT", "experiment_results-dev.tsv")
    lines = open(exp).read().strip().split("\n")
    assert lines[-2].startswith("mean\t0.6500")
    assert lines[-1].startswith("std\t0.0500")
    assert os.path.exists(os.path.join(root, "results", "d", "overall-dev.tsv"))


def test_sweep_points():
    base = Config(dataset="synthetic", vocabulary_size=10, category_num=2)
    axes = [parse_axis("graph_encoder=DIGAT,wo_SA"), parse_axis("graph_depth=1,3")]
    points = list(sweep_points(base, axes))
    assert len(points) == 4
    combos = [p[0] for p in points]
    assert {"graph_encoder": "wo_SA", "graph_depth": "3"} in combos
    for combo, cfg in points:
        assert isinstance(cfg.graph_depth, int)
        assert cfg.graph_encoder == combo["graph_encoder"]
    # base is not mutated
    assert base.graph_depth == 3 and base.graph_encoder == "DIGAT"


def test_sweep_invalid_axis():
    with pytest.raises(AssertionError):
        parse_axis("nonsense")
