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


def _fixture_zip(tmp, name, files):
    import zipfile

    path = os.path.join(tmp, name)
    with zipfile.ZipFile(path, "w") as z:
        for fname, content in files.items():
            z.writestr(fname, content)
    return path


def _behaviors(n, start=1):
    return "".join(
        f"{start + i}\tU{i % 7}\t11/11/2019 9:00:00 AM\tN1 N2\tN3-1 N4-0\n"
        for i in range(n)
    )


NEWS = "N1\tnews\tsubnews\ttitle one\tabs\turl\t[]\t[]\n" \
       "N2\tsports\tsubsports\ttitle two\tabs\turl\t[]\t[]\n"


def test_prepare_mind_small_hermetic(tmp_path, monkeypatch):
    """Drive the full acquisition path (download -> unzip -> 95/5 re-split
    -> official-dev-becomes-test) against file:// fixture archives
    (reference prepare_MIND_dataset.py:12-28,80-126)."""
    from digat_tpu.data import prepare as P

    tmp = str(tmp_path)
    train_zip = _fixture_zip(tmp, "small_train.zip", {
        "behaviors.tsv": _behaviors(40),
        "news.tsv": NEWS,
        "entity_embedding.vec": "N1 0.1 0.2\n",
    })
    dev_zip = _fixture_zip(tmp, "small_dev.zip", {
        "behaviors.tsv": _behaviors(10, start=1000),
        "news.tsv": NEWS,
    })
    monkeypatch.setitem(P.MIND_URLS, "MIND-small", {
        "train": "file://" + train_zip, "dev": "file://" + dev_zip,
    })
    data_root = os.path.join(tmp, "data")
    P.prepare("MIND-small", data_root, seed=0)

    root = os.path.join(data_root, "MIND-small")
    for split in ("train", "dev", "test"):
        assert os.path.exists(os.path.join(root, split, "behaviors.tsv"))
        assert os.path.exists(os.path.join(root, split, "news.tsv"))
    with open(os.path.join(root, "train", "behaviors.tsv")) as f:
        train_lines = f.readlines()
    with open(os.path.join(root, "dev", "behaviors.tsv")) as f:
        dev_lines = f.readlines()
    # 95/5 partition of the official train behaviors, nothing lost
    assert len(train_lines) == 38 and len(dev_lines) == 2
    assert sorted(train_lines + dev_lines) == sorted(
        _behaviors(40).splitlines(keepends=True))
    # the official dev split becomes the local test split verbatim
    with open(os.path.join(root, "test", "behaviors.tsv")) as f:
        assert f.read() == _behaviors(10, start=1000)
    # train-side extras ride along
    assert os.path.exists(os.path.join(root, "train", "entity_embedding.vec"))
    # idempotent: a second call is a no-op, not a re-download
    monkeypatch.setitem(P.MIND_URLS, "MIND-small", {})
    P.prepare("MIND-small", data_root, seed=0)


def test_prepare_mind_large_hermetic(tmp_path, monkeypatch):
    from digat_tpu.data import prepare as P

    tmp = str(tmp_path)
    urls = {}
    for split, start in (("train", 1), ("dev", 500), ("test", 900)):
        z = _fixture_zip(tmp, f"large_{split}.zip", {
            "behaviors.tsv": _behaviors(5, start=start),
            "news.tsv": NEWS,
        })
        urls[split] = "file://" + z
    monkeypatch.setitem(P.MIND_URLS, "MIND-large", urls)
    data_root = os.path.join(tmp, "data")
    P.prepare("MIND-large", data_root)
    root = os.path.join(data_root, "MIND-large")
    for split, start in (("train", 1), ("dev", 500), ("test", 900)):
        with open(os.path.join(root, split, "behaviors.tsv")) as f:
            assert f.read() == _behaviors(5, start=start)
        assert os.path.exists(os.path.join(root, split, "news.tsv"))


def test_compilation_cache_flag(tmp_path, monkeypatch):
    """--compilation_cache_dir flows into the persistent XLA cache config
    so repeat CLI invocations skip the remote TPU compile."""
    import jax

    from digat_tpu.cli import apply_runtime_config

    cache = str(tmp_path / "xla_cache")
    cfg = Config.from_args(
        ["--dataset", "synthetic", "--compilation_cache_dir", cache]
    )
    prior = jax.config.jax_compilation_cache_dir
    try:
        apply_runtime_config(cfg)
        assert jax.config.jax_compilation_cache_dir == cache
        assert jax.config.jax_persistent_cache_min_compile_time_secs == 1.0
    finally:
        jax.config.update("jax_compilation_cache_dir", prior)
