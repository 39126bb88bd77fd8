#!/usr/bin/env python
"""Head-to-head harness: run the ACTUAL reference PyTorch DIGAT
(/root/reference — CUDA/torch_scatter research code) on CPU against
synthetic MIND-format data, so digat_tpu's accuracy parity can be measured
against the reference's *executable behavior*, not only against re-derived
oracles.

The reference is imported as-is from its own directory; the only
adaptations are runtime shims installed before import:

  * ``torch_scatter`` -> pure-torch ``scatter_softmax`` / ``scatter_sum``
    (semantics of the two call sites at reference graphEncoders.py:129-130,
    where ``self.category_num = config.category_num + 1`` keeps every index
    in range — graphEncoders.py:16);
  * ``torchtext.vocab.GloVe`` -> loader for a plain-text vector file (the
    same file digat_tpu consumes via --glove_path, so both frameworks share
    initial in-vocabulary word embeddings; reference MIND_corpus.py:89-108);
  * ``Tensor.cuda`` / ``Module.cuda`` / ``torch.cuda.*`` -> CPU no-ops (the
    reference hardcodes CUDA, config.py:84-89);
  * ``DataLoader`` forced to ``num_workers=0, pin_memory=False`` (the
    reference pins + forks workers for GPU feeding, trainer.py:76).

No reference code is modified or copied. The reference's own Config class
is instantiated without its argparse/CUDA constructor; every attribute of
config.py:14-75 is set explicitly, including the derived news_graph_size.
"""

from __future__ import annotations

import argparse
import json
import os
import random
import sys
import types

REFERENCE_DIR = os.environ.get("DIGAT_REFERENCE_DIR", "/root/reference")


# --------------------------------------------------------------------------
# shims
# --------------------------------------------------------------------------

def _expand_index(index, src, dim):
    if index.dim() < src.dim():
        shape = list(index.shape) + [1] * (src.dim() - index.dim())
        index = index.view(shape).expand_as(src)
    return index


def install_torch_scatter_shim():
    """Register a pure-torch `torch_scatter` with the two ops the reference
    uses. Group-wise softmax/sum along `dim`, groups given by `index`."""
    import torch

    def scatter_sum(src, index, dim=-1, dim_size=None):
        if dim < 0:
            dim += src.dim()
        index = _expand_index(index, src, dim)
        if dim_size is None:
            dim_size = int(index.max()) + 1
        shape = list(src.shape)
        shape[dim] = dim_size
        out = torch.zeros(shape, dtype=src.dtype, device=src.device)
        return out.scatter_add_(dim, index, src)

    def scatter_softmax(src, index, dim=-1):
        if dim < 0:
            dim += src.dim()
        index = _expand_index(index, src, dim)
        dim_size = int(index.max()) + 1
        shape = list(src.shape)
        shape[dim] = dim_size
        seg_max = torch.full(
            shape, float("-inf"), dtype=src.dtype, device=src.device
        ).scatter_reduce_(dim, index, src, reduce="amax", include_self=True)
        ex = (src - seg_max.gather(dim, index)).exp()
        seg_den = torch.zeros(
            shape, dtype=src.dtype, device=src.device
        ).scatter_add_(dim, index, ex)
        return ex / seg_den.gather(dim, index)

    mod = types.ModuleType("torch_scatter")
    mod.scatter_sum = scatter_sum
    mod.scatter_softmax = scatter_softmax
    sys.modules["torch_scatter"] = mod
    return mod


def install_torchtext_shim(glove_txt: str):
    """Register a `torchtext.vocab.GloVe` stand-in backed by a plain-text
    `word v1 .. vd` file — the same file digat_tpu loads via --glove_path,
    so both frameworks see identical in-vocabulary initial embeddings."""
    import torch

    class GloVe:
        def __init__(self, name=None, dim=300, cache=None, max_vectors=None):
            stoi = {}
            rows = []
            with open(glove_txt, "r", encoding="utf-8") as f:
                for line in f:
                    parts = line.rstrip("\n").split(" ")
                    word, vec = parts[0], [float(x) for x in parts[1:]]
                    assert len(vec) == dim, (
                        f"glove file dim {len(vec)} != requested {dim}"
                    )
                    stoi[word] = len(rows)
                    rows.append(vec)
            self.stoi = stoi
            self.vectors = torch.tensor(rows, dtype=torch.float32)

    vocab_mod = types.ModuleType("torchtext.vocab")
    vocab_mod.GloVe = GloVe
    root_mod = types.ModuleType("torchtext")
    root_mod.vocab = vocab_mod
    sys.modules["torchtext"] = root_mod
    sys.modules["torchtext.vocab"] = vocab_mod


def install_cpu_shims():
    """No-op every CUDA touchpoint the reference exercises, and force
    single-process non-pinned data loading."""
    import torch
    import torch.utils.data as tud

    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    torch.cuda.is_available = lambda: True
    torch.cuda.set_device = lambda *a, **k: None
    torch.cuda.manual_seed = lambda *a, **k: None
    torch.cuda.empty_cache = lambda *a, **k: None

    real_loader = tud.DataLoader

    class CPUDataLoader(real_loader):
        def __init__(self, *a, **k):
            k["pin_memory"] = False
            k["num_workers"] = 0
            super().__init__(*a, **k)

    tud.DataLoader = CPUDataLoader


def force_cpu_device(model):
    """The reference stores `self.device = torch.device('cuda')` on layer
    instances (layers.py:27, graphEncoders.py:25) and uses it to allocate
    padding buffers in Conv1D.forward (layers.py:42).

    Also disables in-place dropout: the reference's CNN encoder applies
    `nn.Dropout(inplace=True)` to the Conv1D ReLU output
    (newsEncoders.py:51), whose autograd needs that output — under the
    pinned torch 1.x/CUDA this passed, under torch 2.13 CPU it raises the
    in-place-modification error. `inplace=False` computes identical math
    (same mask, same scaling), just without mutating the buffer."""
    import torch

    cpu = torch.device("cpu")
    for module in model.modules():
        if hasattr(module, "device"):
            module.device = cpu
        if isinstance(module, torch.nn.Dropout):
            module.inplace = False


# --------------------------------------------------------------------------
# runner
# --------------------------------------------------------------------------

REF_DEFAULTS = dict(
    mode="train", news_encoder="MSA", graph_encoder="DIGAT",
    dev_model_path="", test_model_path="", test_output_file="",
    device_id=0, seed=0, local_rank=-1,
    dataset="MIND-small", word_threshold=3, max_title_length=32,
    negative_sample_num=4, max_history_num=50, epoch=16, batch_size=64,
    lr=1e-4, weight_decay=0.0, gradient_clip_norm=1.0,
    dev_criterion="avg", early_stopping_epoch=5,
    word_embedding_dim=300, cnn_method="naive", cnn_kernel_num=400,
    cnn_window_size=3, MSA_head_num=16, MSA_head_dim=25, attention_dim=256,
    dropout_rate=0.2, graph_depth=3, SAG_hops=2, SAG_neighbors=5,
)


def build_reference_config(overrides: dict):
    """Instantiate the reference Config without its side-effectful
    constructor (argparse + CUDA + preprocessing; config.py:141-144),
    replicating every derived field of parse_argument (config.py:55-75)."""
    from config import Config  # reference module

    cfg = Config.__new__(Config)
    attrs = dict(REF_DEFAULTS)
    attrs.update(overrides)
    cfg.attribute_dict = dict(attrs)
    for k, v in attrs.items():
        setattr(cfg, k, v)
    cfg.train_root = "../%s/train" % cfg.dataset
    cfg.dev_root = "../%s/dev" % cfg.dataset
    cfg.test_root = "../%s/test" % cfg.dataset
    size, frontier = 1, 1
    for i in range(cfg.SAG_hops):
        frontier *= cfg.SAG_neighbors if i == 0 else cfg.SAG_neighbors - 1
        size += frontier
    cfg.news_graph_size = size
    return cfg


def seed_everything(seed: int):
    """set_cuda's seeding block minus the CUDA parts (config.py:90-95)."""
    import numpy as np
    import torch

    torch.manual_seed(seed)
    random.seed(seed)
    np.random.seed(seed)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--workdir", required=True,
                    help="reference cwd; ../<dataset>/ must hold the TSVs")
    ap.add_argument("--glove-txt", required=True)
    ap.add_argument("--config-json", required=True,
                    help="JSON dict of reference Config attribute overrides")
    ap.add_argument("--out", required=True, help="result JSON path")
    args = ap.parse_args(argv)

    overrides = json.loads(args.config_json)
    os.makedirs(args.workdir, exist_ok=True)
    os.chdir(args.workdir)

    install_torch_scatter_shim()
    install_torchtext_shim(os.path.abspath(args.glove_txt))
    install_cpu_shims()
    sys.path.insert(0, REFERENCE_DIR)

    cfg = build_reference_config(overrides)
    seed_everything(cfg.seed)
    cfg.preliminary_setup()  # dirs + truth.txt + MIND_Corpus.preprocess

    from MIND_corpus import MIND_Corpus
    import main as ref_main

    corpus = MIND_Corpus(cfg)
    from model import Model

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

    # auto-test on the best checkpoint (reference main.py:59-62)
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
    print("[ref_harness] " + json.dumps(result["dev"]))


if __name__ == "__main__":
    main()
