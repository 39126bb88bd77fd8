"""Corpus preprocessing on a synthetic dataset: artifact integrity,
behavior encoding rules, checkpoint round trip, trainer smoke."""

import os

import numpy as np
import pytest

from digat_tpu.config import Config
from digat_tpu.data import corpus as corpus_lib
from digat_tpu.data import synthetic


@pytest.fixture(scope="module")
def tiny_corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    cfg = Config(
        dataset="synthetic", data_root=str(root), max_history_num=10,
        max_title_length=12, SAG_neighbors=3, SAG_hops=2, batch_size=8,
        use_pallas=False,
    )
    synthetic.generate(
        os.path.join(str(root), "synthetic"), news_num=120, categories=4,
        train_behaviors=60, dev_behaviors=20, test_behaviors=20, users=20,
    )
    corpus_lib.preprocess(cfg)
    return cfg, corpus_lib.Corpus(cfg)


def test_artifact_shapes(tiny_corpus):
    cfg, c = tiny_corpus
    assert c.news_title_text.shape == (c.news_num, cfg.max_title_length)
    assert c.news_node_id.shape == (c.news_num, cfg.news_graph_size)
    assert c.news_graph.shape == (
        c.news_num, cfg.news_graph_size, cfg.news_graph_size
    )
    assert cfg.vocabulary_size == len(c.vocab)
    assert cfg.category_num > 0
    assert c.word_embedding.shape == (len(c.vocab), cfg.word_embedding_dim)


def test_self_loops_added(tiny_corpus):
    _, c = tiny_corpus
    diag = c.news_graph[:, np.arange(c.news_graph.shape[1]),
                        np.arange(c.news_graph.shape[1])]
    assert diag.all()


def test_candidate_mask_slot_zeroed(tiny_corpus):
    _, c = tiny_corpus
    assert not c.news_graph_mask[:, 0].any()


def test_behavior_encoding_rules(tiny_corpus):
    cfg, c = tiny_corpus
    # every train sample's positive is a real news id
    assert (c.train_pos > 0).all()
    assert (c.train_pos < c.news_num).all()
    # ragged offsets well-formed
    assert c.train_neg_offsets[0] == 0
    assert c.train_neg_offsets[-1] == len(c.train_neg_flat)
    assert (np.diff(c.train_neg_offsets) >= 0).all()
    # per-slot categories: pad slots carry category_num
    split = c.splits["train"]
    pad_slots = split.history_idx == 0
    # pad news id 0 must map to the pad category everywhere
    assert (split.cat_idx[pad_slots] == cfg.category_num).all()
    valid = split.cat_idx < cfg.category_num
    assert (split.cat_idx[valid] >= 0).all()
    # dev labels binary with at least one positive overall
    assert set(np.unique(c.dev_labels)) <= {0, 1}
    assert c.dev_labels.sum() > 0


def test_history_tail_truncation(tiny_corpus):
    cfg, c = tiny_corpus
    # find the raw behaviors file and cross-check one long-history row
    root = os.path.join(cfg.data_root, cfg.dataset, "train", "behaviors.tsv")
    with open(root) as f:
        for row, line in enumerate(f):
            hist = line.split("\t")[3].strip()
            if hist and len(hist.split(" ")) > cfg.max_history_num:
                ids = [c.news_dict[x] for x in hist.split(" ")]
                expect = ids[-cfg.max_history_num:]
                got = c.splits["train"].history_idx[row]
                assert got.tolist() == expect
                return
    pytest.skip("no long history in synthetic sample")


def test_preprocess_idempotent(tiny_corpus):
    cfg, c = tiny_corpus
    corpus_lib.preprocess(cfg)  # all artifacts exist: must be a no-op
    c2 = corpus_lib.Corpus(cfg)
    np.testing.assert_array_equal(c.news_title_text, c2.news_title_text)


def test_checkpoint_roundtrip(tiny_corpus, tmp_path):
    import jax

    from digat_tpu.models.model import Model
    from digat_tpu.train import checkpoint as ck
    from digat_tpu.train.optimizer import make_optimizer

    cfg, c = tiny_corpus
    model = Model(cfg)
    params = model.init(jax.random.PRNGKey(0), word_embedding=c.word_embedding)
    tx = make_optimizer(0.01, 1.0, params)
    opt_state = tx.init(params)
    path = str(tmp_path / "x.ckpt")
    ck.save(path, params, opt_state, 3)
    p2, o2, e = ck.load(path, model.param_template(), opt_state)
    assert e == 3
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert jax.tree.structure(opt_state) == jax.tree.structure(o2)


def test_unlabeled_sentinel_distinguishes_zero_positive_split(
    tmp_path_factory,
):
    """A labeled test split that happens to contain zero positives must NOT
    be flagged unlabeled (the -1 sentinel is preserved pre-clamp); a
    genuinely label-stripped split must be (ADVICE round 4: cli.py:124)."""
    import re

    root = tmp_path_factory.mktemp("data-unlab")
    data_dir = os.path.join(str(root), "synthetic")
    synthetic.generate(
        data_dir, news_num=80, categories=4, train_behaviors=30,
        dev_behaviors=10, test_behaviors=10, users=10,
    )
    import shutil

    base = open(os.path.join(data_dir, "test", "behaviors.tsv"),
                encoding="utf-8").read()

    def rebuild(transform, tag):
        sub_root = os.path.join(str(root), tag)
        shutil.copytree(data_dir, os.path.join(sub_root, "synthetic"))
        tb = os.path.join(sub_root, "synthetic", "test", "behaviors.tsv")
        rows = []
        for line in base.rstrip("\n").split("\n"):
            parts = line.split("\t")
            parts[4] = " ".join(transform(x) for x in parts[4].split(" "))
            rows.append("\t".join(parts))
        open(tb, "w", encoding="utf-8").write("\n".join(rows) + "\n")
        cfg = Config(
            dataset="synthetic", data_root=sub_root, max_history_num=10,
            max_title_length=12, SAG_neighbors=3, SAG_hops=2,
            use_pallas=False,
        )
        corpus_lib.preprocess(cfg)
        return corpus_lib.Corpus(cfg)

    # all-negative but LABELED: sentinel false, labels all zero
    c = rebuild(lambda x: re.sub(r"-1$", "-0", x), "zeroneg")
    assert not c.test_unlabeled
    assert np.asarray(c.test_labels).sum() == 0
    # stripped labels: sentinel true
    c = rebuild(lambda x: re.sub(r"-[01]$", "", x), "stripped")
    assert c.test_unlabeled
