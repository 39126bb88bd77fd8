"""Real-data quality-path wiring: --glove_path and --sag_embedder must flow
from the CLI config through corpus.preprocess into the artifact builders.

The environment has no network access, no MIND download and no pretrained
SentenceTransformer weights, so these tests inject a fake GloVe file and a
stubbed ``sentence_transformers`` module; what they prove is that a user who
*does* have those assets gets the reference's quality path (GloVe init per
MIND_corpus.py:89-108, PLM SAG mining per construct_SAG.py:97-99) without
touching library code. docs/PARITY.md records the environment blocker.
"""

import os
import sys
import types

import numpy as np
import pytest

from digat_tpu.config import Config
from digat_tpu.data import corpus as corpus_lib
from digat_tpu.data import sag as sag_mod
from digat_tpu.data import synthetic


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    synthetic.generate(
        os.path.join(str(root), "synthetic"), news_num=80, categories=3,
        train_behaviors=40, dev_behaviors=15, test_behaviors=15, users=15,
    )
    return str(root)


def _cfg(data_root, **kw):
    return Config(
        dataset="synthetic", data_root=data_root, max_history_num=10,
        max_title_length=12, SAG_neighbors=3, SAG_hops=1, batch_size=8,
        use_pallas=False, **kw,
    ).validate()


def test_glove_path_flows_into_embedding(data_root, tmp_path):
    # first build the vocabulary with the default (hash) path
    base = _cfg(data_root)
    corpus_lib.preprocess(base)
    vocab_path = corpus_lib._paths(base)["vocab"]
    import json

    with open(vocab_path) as f:
        vocab = json.load(f)
    # fake GloVe covering a few real vocabulary words
    dim = base.word_embedding_dim
    words = [w for w in vocab if w not in ("<PAD>", "<UNK>")][:5]
    assert words, "synthetic vocab unexpectedly empty"
    rng = np.random.default_rng(7)
    table = {w: rng.standard_normal(dim).astype(np.float32) for w in words}
    table["unrelatedword"] = rng.standard_normal(dim).astype(np.float32)
    glove = tmp_path / "glove.txt"
    with open(glove, "w") as f:
        for w, v in table.items():
            f.write(w + " " + " ".join(f"{x:.8e}" for x in v) + "\n")

    cfg = _cfg(data_root, glove_path=str(glove))
    corpus_lib.preprocess(cfg)
    emb_path = corpus_lib._paths(cfg)["embedding"]
    assert emb_path != corpus_lib._paths(base)["embedding"], (
        "glove and hash embeddings must not share a cache key"
    )
    emb = np.load(emb_path)
    for w in words:
        np.testing.assert_allclose(emb[vocab[w]], table[w], rtol=1e-5)
    # pad row is the GloVe mean (MIND_corpus.py:96-106)
    mean = np.stack(list(table.values())).mean(0)
    np.testing.assert_allclose(emb[0], mean, rtol=1e-5)


def test_sentence_transformer_embedder_flows_into_sag(data_root, monkeypatch):
    calls = {}

    class FakeST:
        def __init__(self, model_name):
            calls["model"] = model_name

        def encode(self, texts):
            calls["n"] = calls.get("n", 0) + len(texts)
            return sag_mod.hash_embedder(texts, dim=32)

    fake = types.ModuleType("sentence_transformers")
    fake.SentenceTransformer = FakeST
    monkeypatch.setitem(sys.modules, "sentence_transformers", fake)

    cfg = _cfg(data_root, sag_embedder="sentence_transformer",
               sag_embedder_model="fake/model")
    corpus_lib.preprocess(cfg)
    p = corpus_lib._paths(cfg)
    assert "sentence_transformer" in os.path.basename(p["graph"])
    assert os.path.exists(p["graph"])
    assert calls["model"] == "fake/model"
    assert calls["n"] > 0, "PLM embedder was never invoked"
    # the artifact is structurally valid and distinct from the hash one
    g = np.load(p["graph"])
    assert g["news_node_id"].shape[1] == cfg.news_graph_size


def test_st_embedder_missing_dependency_is_loud(monkeypatch):
    monkeypatch.setitem(sys.modules, "sentence_transformers", None)
    with pytest.raises(ImportError, match="sentence-transformers"):
        sag_mod.get_embedder("sentence_transformer")


def test_cli_flags_parse():
    cfg = Config.from_args([
        "--glove_path", "/x/glove.840B.300d.txt",
        "--sag_embedder", "sentence_transformer",
        "--sag_embedder_model", "sentence-transformers/all-mpnet-base-v2",
    ])
    assert cfg.glove_path == "/x/glove.840B.300d.txt"
    assert cfg.sag_embedder == "sentence_transformer"


def test_invalid_embedder_rejected():
    with pytest.raises(AssertionError):
        Config(sag_embedder="word2vec").validate()
