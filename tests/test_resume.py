"""Mid-run resume: a killed run restarts from its best checkpoint with
optimizer state and epoch counter intact (capability absent in the
reference, trainer.py:170)."""

import os

import numpy as np
import pytest

from digat_tpu import cli
from digat_tpu.config import Config
from digat_tpu.data import corpus as corpus_lib
from digat_tpu.data import synthetic
from digat_tpu.models.model import Model
from digat_tpu.train.trainer import Trainer


def test_resume_continues_epochs(tmp_path):
    root = str(tmp_path)
    synthetic.generate(
        os.path.join(root, "data", "synthetic"), news_num=80, categories=3,
        train_behaviors=30, dev_behaviors=10, test_behaviors=10, users=10,
    )
    kw = dict(
        dataset="synthetic", data_root=os.path.join(root, "data"),
        run_root=os.path.join(root, "runs"), batch_size=8,
        max_history_num=6, max_title_length=8, SAG_neighbors=2,
        graph_depth=1, MSA_head_num=4, MSA_head_dim=10, cnn_kernel_num=40,
        attention_dim=32, eval_batch_size=32, use_pallas=False,
    )
    cfg = Config(epoch=1, **kw)
    corpus = corpus_lib.Corpus(cfg) if os.path.exists(
        os.path.join(root, "data", "synthetic-cache")
    ) else cli.prepare(cfg)
    model = Model(cfg)
    t1 = Trainer(model, cfg, corpus, verbose=False)
    t1.train()
    ckpt = os.path.join(t1.run_dir, "best.ckpt")
    assert os.path.exists(ckpt)

    cfg2 = Config(epoch=2, resume=ckpt, **kw)
    corpus2 = cli.prepare(cfg2)
    model2 = Model(cfg2)
    t2 = Trainer(model2, cfg2, corpus2, verbose=False)
    t2.train()
    # only epoch 2 ran in the resumed trainer
    assert [h["epoch"] for h in t2.history] == [2]
    assert np.isfinite(t2.history[0]["auc"])
