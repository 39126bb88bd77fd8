#!/usr/bin/env python
"""Time one reference train step (fwd+bwd+Adam) at a given geometry on CPU.

Used to budget the production-geometry head-to-head parity cell: the
reference side runs on this host's 4 cores, so corpus size / epoch count
must be sized from the measured per-step cost, not guessed.

Usage: python scripts/parity/probe_ref_step.py [--batch 64] [--steps 3]
       [--threads 4] [--config-json '{"word_embedding_dim":300,...}']
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

import ref_harness as RH  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--threads", type=int, default=4)
    ap.add_argument("--category-num", type=int, default=10)
    ap.add_argument("--vocab", type=int, default=20000)
    ap.add_argument("--config-json", default="{}")
    args = ap.parse_args(argv)

    import torch

    torch.set_num_threads(args.threads)
    RH.install_torch_scatter_shim()
    RH.install_torchtext_shim("/dev/null")  # never read: no preprocess here
    RH.install_cpu_shims()
    sys.path.insert(0, RH.REFERENCE_DIR)

    cfg = RH.build_reference_config(json.loads(args.config_json))
    cfg.category_num = args.category_num
    cfg.vocabulary_size = args.vocab
    cfg.user_graph_size = cfg.max_history_num + cfg.category_num
    RH.seed_everything(cfg.seed)

    # the news-encoder base loads a GloVe pkl at construction; fabricate it
    import numpy as np
    import pickle

    emb = np.random.default_rng(0).standard_normal(
        (cfg.vocabulary_size, cfg.word_embedding_dim)
    ).astype(np.float32)
    with open(
        f"word_embedding-{cfg.word_threshold}-{cfg.word_embedding_dim}-"
        f"{cfg.max_title_length}-{cfg.dataset}.pkl", "wb"
    ) as f:
        pickle.dump(torch.from_numpy(emb), f)

    from model import Model

    model = Model(cfg)
    model.initialize()
    RH.force_cpu_device(model)
    opt = torch.optim.Adam(model.parameters(), lr=1e-4)

    B, N = args.batch, 1 + cfg.negative_sample_num
    Gn, Gu = cfg.news_graph_size, cfg.user_graph_size
    H, L = cfg.max_history_num, cfg.max_title_length
    g = torch.Generator().manual_seed(0)
    ut = torch.randint(0, cfg.vocabulary_size, (B, H, L), generator=g)
    um = torch.ones(B, H, L)
    ug = torch.rand(B, Gu, Gu, generator=g).round()
    ucm = torch.ones(B, cfg.category_num + 1)
    uci = torch.randint(0, cfg.category_num, (B, H), generator=g)
    nt = torch.randint(0, cfg.vocabulary_size, (B, N, Gn, L), generator=g)
    nm = torch.ones(B, N, Gn, L)
    ng = torch.rand(B, N, Gn, Gn, generator=g).round()
    ngm = torch.ones(B, N, Gn)

    times = []
    for i in range(args.steps):
        t0 = time.time()
        logits = model(ut, um, ug, ucm, uci, nt, nm, ng, ngm)
        loss = -torch.log_softmax(logits, dim=1)[:, 0].mean()
        opt.zero_grad()
        loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), 1.0)
        opt.step()
        times.append(time.time() - t0)
        print(f"step {i}: {times[-1]:.2f}s loss={float(loss):.4f}",
              flush=True)
    print(json.dumps({
        "median_step_s": sorted(times)[len(times) // 2],
        "batch": B, "geometry": {
            "D": cfg.MSA_head_num * cfg.MSA_head_dim, "Gn": Gn, "Gu": Gu,
            "H": H, "L": L,
        },
    }))


if __name__ == "__main__":
    main()
