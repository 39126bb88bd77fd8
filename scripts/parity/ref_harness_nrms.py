#!/usr/bin/env python
"""Head-to-head harness for the reference's Appendix-B NRMS / NRMS-SA
pipeline (the SA strategy on a sequence model, no graphs) — CPU run of the
upstream code as-is, mirroring ref_harness.py. Shims: torchtext GloVe ->
shared plain-text vectors; CUDA -> no-ops; DataLoader -> workers=0.
The semantic-augmented-news pkl is injected (built by digat_tpu's
construct_sa_sequence from the same TSVs; the upstream build needs a
SentenceTransformer download this environment cannot perform,
Appendix-B/build_SA_news_sequence.py).

Reference layout notes: Appendix-B resolves data at ../../<dataset> from
its run cwd (Appendix-B/config.py:48-50) and its Trainer is single-GPU
(no local_rank / DDP)."""

from __future__ import annotations

import argparse
import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

from ref_harness import (  # noqa: E402
    install_cpu_shims,
    install_torchtext_shim,
    seed_everything,
    force_cpu_device,
)

REFERENCE_B = os.path.join(
    os.environ.get("DIGAT_REFERENCE_DIR", "/root/reference"), "Appendix-B"
)

REF_B_DEFAULTS = dict(
    mode="train", model="NRMS-SA", dev_model_path="", test_model_path="",
    test_output_file="", device_id=0, seed=0,
    dataset="MIND-small", word_threshold=3, max_title_length=32,
    negative_sample_num=4, max_history_num=50, epoch=16, batch_size=64,
    lr=1e-4, gradient_clip_norm=1.0,
    dev_criterion="avg", early_stopping_epoch=4,
    word_embedding_dim=300, head_num=20, head_dim=20, attention_dim=200,
    dropout_rate=0.2, augmented_news_num=10,
)


def build_config(overrides: dict):
    from config import Config  # Appendix-B module

    cfg = Config.__new__(Config)
    attrs = dict(REF_B_DEFAULTS)
    attrs.update(overrides)
    cfg.attribute_dict = dict(attrs)
    for k, v in attrs.items():
        setattr(cfg, k, v)
    cfg.train_root = "../../%s/train" % cfg.dataset
    cfg.dev_root = "../../%s/dev" % cfg.dataset
    cfg.test_root = "../../%s/test" % cfg.dataset
    return cfg


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True,
                    help="run cwd; ../../<dataset>/ must hold the TSVs")
    ap.add_argument("--glove-txt", required=True)
    ap.add_argument("--config-json", required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args(argv)

    overrides = json.loads(args.config_json)
    os.makedirs(args.workdir, exist_ok=True)
    os.chdir(args.workdir)

    install_torchtext_shim(os.path.abspath(args.glove_txt))
    install_cpu_shims()
    sys.path.insert(0, REFERENCE_B)

    cfg = build_config(overrides)
    seed_everything(cfg.seed)
    cfg.preliminary_setup()
    from MIND_corpus import MIND_Corpus

    MIND_Corpus.preprocess(cfg)
    corpus = MIND_Corpus(cfg)

    from model import Model
    import main as ref_main

    model = Model(cfg)
    model.initialize()
    force_cpu_device(model)
    from trainer import Trainer

    trainer = Trainer(model, cfg, corpus)
    trainer.train()

    result = {
        "framework": "reference",
        "model": model.model_name,
        "seed": cfg.seed,
        "run_index": trainer.run_index,
        "best_dev_epoch": trainer.best_dev_epoch,
        "per_epoch": [
            {"epoch": i + 1, "auc": trainer.auc[i], "mrr": trainer.mrr[i],
             "ndcg5": trainer.ndcg5[i], "ndcg10": trainer.ndcg10[i]}
            for i in range(len(trainer.auc))
        ],
        "dev": {
            "auc": trainer.auc[trainer.best_dev_epoch - 1],
            "mrr": trainer.mrr[trainer.best_dev_epoch - 1],
            "ndcg5": trainer.ndcg5[trainer.best_dev_epoch - 1],
            "ndcg10": trainer.ndcg10[trainer.best_dev_epoch - 1],
        },
    }

    cfg.test_model_path = (
        "best_model/%s/%s/#%d/%s"
        % (cfg.dataset, model.model_name, trainer.run_index, model.model_name)
    )
    cfg.test_output_file = (
        "results/%s/%s/#%d-test"
        % (cfg.dataset, model.model_name, trainer.run_index)
    )
    cfg.run_index = trainer.run_index
    ref_main.test(cfg, corpus)
    with open(cfg.test_output_file, "r") as f:
        parts = f.read().strip().split("\t")
    result["test"] = {
        "auc": float(parts[1]), "mrr": float(parts[2]),
        "ndcg5": float(parts[3]), "ndcg10": float(parts[4]),
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print("[ref_harness_nrms] " + json.dumps(result["dev"]))


if __name__ == "__main__":
    main()
