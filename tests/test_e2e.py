"""End-to-end smoke: CLI train on tiny synthetic data, then checkpoint
re-evaluation — the full preprocessing + training + cached-eval stack."""

import os

import numpy as np
import pytest

from digat_tpu import cli
from digat_tpu.config import Config
from digat_tpu.data import corpus as corpus_lib
from digat_tpu.data import synthetic


@pytest.fixture(scope="module")
def run_root(tmp_path_factory):
    return str(tmp_path_factory.mktemp("e2e"))


def tiny_cfg(run_root, **kw):
    cfg = Config(
        dataset="synthetic",
        data_root=os.path.join(run_root, "data"),
        run_root=os.path.join(run_root, "runs"),
        epoch=1, batch_size=8, max_history_num=8, max_title_length=10,
        SAG_neighbors=2, SAG_hops=2, graph_depth=1,
        MSA_head_num=4, MSA_head_dim=10, cnn_kernel_num=40,
        attention_dim=32, eval_batch_size=32, use_pallas=False,
        **kw,
    )
    return cfg


@pytest.fixture(scope="module")
def trained(run_root):
    root = os.path.join(run_root, "data", "synthetic")
    synthetic.generate(
        root, news_num=100, categories=4, train_behaviors=40,
        dev_behaviors=15, test_behaviors=15, users=15,
    )
    cfg = tiny_cfg(run_root)
    cli.run_train(cfg)
    return cfg


def test_train_produces_artifacts(trained, run_root):
    cfg = trained
    run_dir = os.path.join(
        cfg.run_root, cfg.dataset, cfg.model_name, f"#{cfg.run_index}"
    )
    assert os.path.exists(os.path.join(run_dir, "best.ckpt"))
    assert os.path.exists(os.path.join(run_dir, "config.json"))
    assert os.path.exists(os.path.join(run_dir, "dev_log.txt"))
    assert os.path.exists(os.path.join(run_dir, "test-prediction.txt"))
    res = os.path.join(
        cfg.run_root, "results", cfg.dataset, cfg.model_name,
        f"#{cfg.run_index}-dev",
    )
    content = open(res).read().strip().split("\t")
    assert len(content) == 5
    metrics = [float(x) for x in content[1:]]
    assert all(0.0 <= m <= 1.0 for m in metrics)


def test_eval_mode_reproduces(trained, run_root, capsys):
    cfg = trained
    run_dir = os.path.join(
        cfg.run_root, cfg.dataset, cfg.model_name, f"#{cfg.run_index}"
    )
    cfg2 = tiny_cfg(run_root)
    cfg2.dev_model_path = os.path.join(run_dir, "best.ckpt")
    cli.run_eval(cfg2, "dev")
    out = capsys.readouterr().out
    assert "[dev]" in out and "AUC=" in out
    # dev metrics from the reloaded checkpoint match the training run's best
    res = os.path.join(
        cfg.run_root, "results", cfg.dataset, cfg.model_name,
        f"#{cfg.run_index}-dev",
    )
    best_auc = float(open(res).read().split("\t")[1])
    reloaded_auc = float(out.split("AUC=")[1].split(" ")[0])
    np.testing.assert_allclose(reloaded_auc, best_auc, atol=2e-4)


def test_cnn_encoder_trains(trained, run_root):
    """The CNN news-encoder variant trains end-to-end (same data cache)."""
    cfg = tiny_cfg(run_root, news_encoder="CNN", graph_encoder="wo_SA")
    cli.run_train(cfg)
    run_dir = os.path.join(
        cfg.run_root, cfg.dataset, "CNN-wo_SA", f"#{cfg.run_index}"
    )
    assert os.path.exists(os.path.join(run_dir, "best.ckpt"))


def test_unlabeled_split_yields_rank_file_only(trained, run_root, tmp_path):
    """MIND-large-style unlabeled test: scorer returns NaN metrics but
    writes the leaderboard rank file (reference util.py:81-82)."""
    import numpy as np

    from digat_tpu.eval.scorer import compute_scores
    from digat_tpu.models.model import Model
    from digat_tpu.train import checkpoint as ck

    cfg = tiny_cfg(run_root)
    corpus = corpus_lib.Corpus(cfg)
    corpus.test_labels = np.zeros_like(corpus.test_labels)  # unlabeled
    model = Model(cfg)
    run_dir = os.path.join(
        cfg.run_root, cfg.dataset, cfg.model_name, "#1"
    )
    params, _, _ = ck.load(
        os.path.join(run_dir, "best.ckpt"), model.param_template(), None
    )
    out = str(tmp_path / "prediction.txt")
    metrics = compute_scores(model, params, corpus, "test", result_file=out)
    assert all(np.isnan(m) for m in metrics)
    assert os.path.exists(out) and open(out).read().startswith("1 [")


def test_rank_file_is_leaderboard_format(trained, run_root):
    cfg = trained
    run_dir = os.path.join(
        cfg.run_root, cfg.dataset, cfg.model_name, f"#{cfg.run_index}"
    )
    lines = open(os.path.join(run_dir, "test-prediction.txt")).read().split("\n")
    corpus = corpus_lib.Corpus(tiny_cfg(run_root))
    n_imp = int(corpus.test_imp_index.max()) + 1
    assert len(lines) == n_imp
    first = lines[0].split(" ")
    assert first[0] == "1"
    assert first[1].startswith("[") and first[1].endswith("]")


def test_scorer_closures_cached_across_compute_scores():
    """compute_scores must reuse one scorer (jitted stage closures) per
    model — rebuilding per call re-traces and re-compiles all three eval
    stages every epoch (measured ~26 s/eval on a remote-attached chip)."""
    from digat_tpu.eval import scorer as S
    from digat_tpu.models.model import Model

    import __graft_entry__ as graft

    cfg = graft._tiny_config()
    model = Model(cfg)
    a = S._get_scorer(model, 64)
    b = S._get_scorer(model, 64)
    assert a is b
    c = S._get_scorer(model, 128)  # new batch size -> new closures
    assert c is not b
    other = Model(cfg)
    assert S._get_scorer(other, 64) is not c


def test_train_autotest_unlabeled_writes_submission_zip(tmp_path):
    """run_train on a dataset whose test split is unlabeled (MIND-large
    style) must hand off to the submission-zip path — prediction.txt +
    prediction.zip — instead of writing NaN metrics to #N-test
    (reference main.py:47-51,59-62)."""
    import re
    import zipfile

    root = str(tmp_path)
    data_dir = os.path.join(root, "data", "synthetic")
    synthetic.generate(
        data_dir, news_num=80, categories=4, train_behaviors=30,
        dev_behaviors=12, test_behaviors=12, users=12,
    )
    # strip labels from the test split: "N12-1 N5-0" -> "N12 N5"
    tb = os.path.join(data_dir, "test", "behaviors.tsv")
    rows = []
    for line in open(tb, encoding="utf-8"):
        parts = line.rstrip("\n").split("\t")
        parts[4] = " ".join(re.sub(r"-[01]$", "", x)
                            for x in parts[4].split(" "))
        rows.append("\t".join(parts))
    open(tb, "w", encoding="utf-8").write("\n".join(rows) + "\n")

    cfg = tiny_cfg(root)
    cli.run_train(cfg)
    pred_dir = os.path.join(
        cfg.run_root, "prediction", cfg.dataset, cfg.model_name, "#1"
    )
    ptxt = os.path.join(pred_dir, "prediction.txt")
    pzip = os.path.join(pred_dir, "prediction.zip")
    assert os.path.exists(ptxt) and os.path.exists(pzip)
    with zipfile.ZipFile(pzip) as z:
        assert z.namelist() == ["prediction.txt"]
    assert open(ptxt).read().startswith("1 [")
    # no NaN metrics row
    res = os.path.join(
        cfg.run_root, "results", cfg.dataset, cfg.model_name,
        f"#{cfg.run_index}-test",
    )
    assert not os.path.exists(res)
    # and no garbage truth file for the unlabeled split
    assert not os.path.exists(os.path.join(
        cfg.run_root, "test", cfg.dataset, "ref", "truth.txt"
    ))
