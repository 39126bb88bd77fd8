#!/usr/bin/env python
"""Weight-transplant equivalence: the reference PyTorch DIGAT vs digat_tpu
with IDENTICAL weights.

Every other parity cell in this repo is distributional (independent inits,
trained runs, +-1 sigma overlap). This harness is deterministic: it
initializes the ACTUAL reference model (/root/reference), randomizes every
parameter (so zero-initialized biases/topic embeddings can't mask mapping
bugs), converts the ``state_dict`` into digat_tpu params
(digat_tpu/interop.py), and asserts on identical inputs:

  A. fp64 logits equality of the training ``forward`` path
     (reference model.py:54-77) for all 6 graph variants x {MSA, CNN},
     plus NRMS / NRMS-SA (Appendix-B/model.py:24-31);
  B. fp64 equality of the cached-inference path: the c_n0 stage
     (util.py:38-50) and ``model.inference`` (model.py:87-90);
  C. a full fp32 dev-split eval on the shared synthetic MIND corpus:
     reference util.compute_scores vs digat_tpu eval.scorer.compute_scores
     must produce identical rank files and metrics to 6 decimals.

A shared misreading of the paper cannot pass this: the reference side is
the executable reference itself (imported via ref_harness shims, not
re-derived).

Usage:
    python scripts/parity/transplant.py --all        # orchestrate + report
    python scripts/parity/transplant.py --family digat --out r.json
    python scripts/parity/transplant.py --family nrms --out r.json
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))
sys.path.insert(0, HERE)
sys.path.insert(0, REPO)

VARIANTS = ("DIGAT", "wo_SA", "Seq_SA", "wo_interaction",
            "news_graph_wo_inter", "user_graph_wo_inter")

# tiny geometry (matches scripts/parity/run_parity.py GEOMETRY so the
# metrics leg can reuse the parity corpus artifacts)
GEO = dict(
    word_embedding_dim=100, MSA_head_num=10, MSA_head_dim=20,
    cnn_kernel_num=200, attention_dim=64, max_title_length=16,
    max_history_num=16, SAG_neighbors=3, SAG_hops=2, graph_depth=3,
    negative_sample_num=4, dropout_rate=0.2,
)
VOCAB, CATS = 500, 6
DIM = GEO["MSA_head_num"] * GEO["MSA_head_dim"]


def pin_cpu_x64():
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)


def randomize_(model, seed: int):
    """Overwrite EVERY parameter with nonzero random draws so that weights
    the reference zero-initializes (biases, topic embeddings) still exercise
    the transplant mapping. Matrix draws are fan-in scaled (torch-default
    magnitude) so activations stay O(1) through the depth-3 residual stack —
    otherwise fp64 rounding noise amplifies past any crisp tolerance."""
    import math

    import torch

    gen = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            if p.dim() >= 2:
                bound = 1.0 / math.sqrt(math.prod(p.shape[1:]))
            else:
                bound = 0.1
            p.copy_(torch.empty_like(p).uniform_(-bound, bound, generator=gen))


def make_inputs(rng, *, B, N, Gn, H, C, L):
    """Shared random batch. Masks include fully-padded rows (degenerate
    softmax path) and slot 0 of news_graph_mask is zeroed like the corpus
    loader does (reference MIND_corpus.py:210)."""
    import numpy as np

    def titles(shape):
        text = rng.integers(1, VOCAB, shape)
        lengths = rng.integers(0, L + 1, shape[:-1])
        mask = np.arange(L) < lengths[..., None]
        return text * mask, mask.astype(np.float64)

    user_title_text, user_title_mask = titles((B, H, L))
    news_title_text, news_title_mask = titles((B, N, Gn, L))
    news_graph = rng.random((B, N, Gn, Gn)) < 0.45
    news_graph |= np.eye(Gn, dtype=bool)
    news_graph_mask = (rng.random((B, N, Gn)) < 0.8).astype(np.float64)
    news_graph_mask[:, :, 0] = 0.0
    Gu = H + C
    ug = rng.random((B, Gu, Gu)) < 0.35
    user_graph = (ug | ug.transpose(0, 2, 1) | np.eye(Gu, dtype=bool))
    user_category_mask = (rng.random((B, C + 1)) < 0.7).astype(np.float64)
    user_category_mask[:, 0] = 1.0  # at least one live topic segment
    user_category_indices = rng.integers(0, C + 1, (B, H))
    return dict(
        user_title_text=user_title_text, user_title_mask=user_title_mask,
        user_graph=user_graph.astype(np.float64),
        user_category_mask=user_category_mask,
        user_category_indices=user_category_indices,
        news_title_text=news_title_text, news_title_mask=news_title_mask,
        news_graph=news_graph.astype(np.float64),
        news_graph_mask=news_graph_mask,
    )


def to_torch(inp):
    import torch

    out = {}
    for k, v in inp.items():
        if v.dtype.kind in "iu":
            out[k] = torch.from_numpy(v).long()
        else:
            out[k] = torch.from_numpy(v).double()
    return out


def our_config(variant: str, news_encoder: str):
    from digat_tpu.config import Config

    return Config(
        news_encoder=news_encoder, graph_encoder=variant,
        vocabulary_size=VOCAB, category_num=CATS, user_num=10,
        use_pallas=False, compute_dtype="float32", dedup_titles=0,
        **GEO,
    ).validate()


# ---------------------------------------------------------------------------
# Family: digat — logits legs (A, B)
# ---------------------------------------------------------------------------


def run_digat_logits(workdir: str) -> list:
    import numpy as np
    import torch

    import jax
    import jax.numpy as jnp

    from ref_harness import (build_reference_config, force_cpu_device,
                             install_cpu_shims, install_torch_scatter_shim,
                             install_torchtext_shim)
    from digat_tpu import interop
    from digat_tpu.models.model import Model

    install_torch_scatter_shim()
    # config.py imports MIND_corpus -> torchtext at module load; the GloVe
    # class itself is never instantiated on this leg
    install_torchtext_shim("/dev/null")
    install_cpu_shims()
    sys.path.insert(0, os.environ.get("DIGAT_REFERENCE_DIR", "/root/reference"))
    os.makedirs(workdir, exist_ok=True)
    os.chdir(workdir)

    # the reference NewsEncoder constructor loads this pkl from cwd
    # (newsEncoders.py:13-14); contents are immediately overwritten by
    # randomize_, so any table of the right shape works
    import pickle

    emb_pkl = (f"word_embedding-3-{GEO['word_embedding_dim']}-"
               f"{GEO['max_title_length']}-MIND-small.pkl")
    if not os.path.exists(emb_pkl):
        with open(emb_pkl, "wb") as f:
            pickle.dump(torch.zeros(VOCAB, GEO["word_embedding_dim"]), f)

    rows = []
    B, N, H, C, L = 3, 5, GEO["max_history_num"], CATS, GEO["max_title_length"]
    for news_encoder in ("MSA", "CNN"):
        for variant in VARIANTS:
            cfg_ref = build_reference_config(dict(
                GEO, news_encoder=news_encoder, graph_encoder=variant,
                batch_size=32, seed=0,
            ))
            cfg_ref.vocabulary_size = VOCAB
            cfg_ref.category_num = CATS
            from model import Model as RefModel  # reference module

            torch.manual_seed(0)
            ref = RefModel(cfg_ref)
            ref.initialize()
            randomize_(ref, seed=hash((news_encoder, variant)) % (2**31))
            force_cpu_device(ref)
            ref = ref.double().eval()

            Gn = cfg_ref.news_graph_size
            rng = np.random.default_rng(42)
            inp = make_inputs(rng, B=B, N=N, Gn=Gn, H=H, C=C, L=L)
            t = to_torch(inp)
            with torch.no_grad():
                ref_logits = ref(
                    t["user_title_text"], t["user_title_mask"],
                    t["user_graph"], t["user_category_mask"],
                    t["user_category_indices"].long(),
                    t["news_title_text"], t["news_title_mask"],
                    t["news_graph"], t["news_graph_mask"],
                ).numpy()

            cfg = our_config(variant, news_encoder)
            ours = Model(cfg)
            params = jax.tree.map(
                lambda x: jnp.asarray(x, jnp.float64),
                interop.torch_to_params(ref.state_dict(), cfg),
            )
            j = {k: jnp.asarray(v) for k, v in inp.items()}
            our_logits = np.asarray(ours.forward(
                params, jax.random.PRNGKey(0), False,
                j["user_title_text"], j["user_title_mask"], j["user_graph"],
                j["user_category_mask"], j["user_category_indices"],
                j["news_title_text"], j["news_title_mask"], j["news_graph"],
                j["news_graph_mask"],
            ))
            fwd_diff = float(np.max(np.abs(ref_logits - our_logits)))

            # --- leg B: c_n0 stage + cached inference path -------------
            cand_emb = rng.normal(size=(B, Gn, DIM if news_encoder == "MSA"
                                        else GEO["cnn_kernel_num"]))
            hist_emb = rng.normal(size=(B, H, cand_emb.shape[-1]))
            gmask2 = inp["news_graph_mask"][:, 0]  # [B, Gn]
            graph2 = inp["news_graph"][:, 0]  # [B, Gn, Gn]
            tc = torch.from_numpy(cand_emb).double()
            th = torch.from_numpy(hist_emb).double()
            tg2 = torch.from_numpy(gmask2).double()
            with torch.no_grad():
                ge = ref.graph_encoder
                if variant == "wo_SA":
                    ref_c0 = tc[:, 0, :]
                elif variant == "Seq_SA":
                    ref_c0 = ge.compute_news_sequence_context(tc, tg2)
                else:
                    ref_c0 = ge.compute_news_graph_context(tc, tg2)
                ref_inf = ref.inference(
                    th, t["user_graph"], t["user_category_mask"],
                    t["user_category_indices"].long(), tc,
                    torch.from_numpy(graph2).double(), tg2, ref_c0,
                ).numpy()
            our_c0 = ours.initial_news_context(
                params, jnp.asarray(cand_emb), jnp.asarray(gmask2)
            )
            c0_diff = float(np.max(np.abs(ref_c0.numpy() - np.asarray(our_c0))))
            our_inf = np.asarray(ours.inference(
                params, jnp.asarray(hist_emb), j["user_graph"],
                j["user_category_mask"], j["user_category_indices"],
                jnp.asarray(cand_emb), jnp.asarray(graph2),
                jnp.asarray(gmask2), our_c0,
            ))
            inf_diff = float(np.max(np.abs(ref_inf - our_inf)))

            scale = float(np.max(np.abs(ref_logits)))
            inf_scale = float(np.max(np.abs(ref_inf)))
            row = dict(
                model=f"{news_encoder}-{variant}", dtype="float64",
                forward_max_abs_diff=fwd_diff, c_n0_max_abs_diff=c0_diff,
                inference_max_abs_diff=inf_diff, logit_scale=scale,
                inference_scale=inf_scale,
                ok=bool(fwd_diff <= 1e-9 * max(scale, 1.0)
                        and c0_diff <= 1e-9
                        and inf_diff <= 1e-9 * max(inf_scale, 1.0)),
            )
            rows.append(row)
            print(f"[transplant] {row['model']:>28}: fwd {fwd_diff:.2e} "
                  f"c_n0 {c0_diff:.2e} inf {inf_diff:.2e} "
                  f"{'OK' if row['ok'] else 'MISMATCH'}", flush=True)
    return rows


# ---------------------------------------------------------------------------
# Family: digat — full-eval metrics leg (C)
# ---------------------------------------------------------------------------


def run_digat_metrics(parity_dir: str) -> list:
    """Transplant a randomized reference model, then run BOTH frameworks'
    full dev evals on the shared synthetic corpus (the round-2 parity
    workdir artifacts) and require identical rank files + metrics."""
    import numpy as np
    import torch

    import jax
    import jax.numpy as jnp

    from ref_harness import (build_reference_config, force_cpu_device,
                             install_cpu_shims, install_torch_scatter_shim,
                             install_torchtext_shim)
    import run_parity
    from digat_tpu import interop
    from digat_tpu.data import corpus as corpus_lib
    from digat_tpu.eval import scorer as scorer_lib
    from digat_tpu.models.model import Model

    install_torch_scatter_shim()
    install_torchtext_shim(os.path.join(parity_dir, "glove.txt"))
    install_cpu_shims()
    sys.path.insert(0, os.environ.get("DIGAT_REFERENCE_DIR", "/root/reference"))
    rundir = os.path.join(parity_dir, "ref", "run")
    os.chdir(rundir)

    rows = []
    combos = [("MSA", v) for v in VARIANTS] + [("CNN", "DIGAT")]
    for news_encoder, variant in combos:
        cfg_ref = build_reference_config(dict(
            run_parity.GEOMETRY, news_encoder=news_encoder,
            graph_encoder=variant, seed=0,
        ))
        cfg_ref.preliminary_setup()  # cached artifacts -> fast
        from MIND_corpus import MIND_Corpus
        from model import Model as RefModel
        from util import compute_scores as ref_compute_scores

        ref_corpus = MIND_Corpus(cfg_ref)
        torch.manual_seed(0)
        ref = RefModel(cfg_ref)
        ref.initialize()
        randomize_(ref, seed=hash((news_encoder, variant, "metrics")) % (2**31))
        force_cpu_device(ref)
        ref.eval()
        ref_result = os.path.join(rundir, f"transplant-{news_encoder}-{variant}-ref.txt")
        ref_metrics = ref_compute_scores(
            ref, ref_corpus, cfg_ref.batch_size * 16, "MIND-small", "dev",
            ref_result,
        )

        cfg = run_parity.our_config(
            parity_dir, seed=0, graph_encoder=variant,
            news_encoder=news_encoder,
        )
        corpus = corpus_lib.Corpus(cfg)  # populates vocab/category counts
        ours = Model(cfg)
        params = jax.tree.map(
            lambda x: jnp.asarray(x),
            interop.torch_to_params(ref.state_dict(), cfg),
        )
        our_result = os.path.join(rundir, f"transplant-{news_encoder}-{variant}-ours.txt")
        our_metrics = scorer_lib.compute_scores(
            ours, params, corpus, "dev", result_file=our_result
        )
        with open(ref_result) as f1, open(our_result) as f2:
            ranks_equal = f1.read() == f2.read()
        diffs = [abs(a - b) for a, b in zip(ref_metrics, our_metrics)]
        row = dict(
            model=f"{news_encoder}-{variant}", split="dev", dtype="float32",
            ref=dict(zip(("auc", "mrr", "ndcg5", "ndcg10"), ref_metrics)),
            ours=dict(zip(("auc", "mrr", "ndcg5", "ndcg10"), our_metrics)),
            rank_files_identical=bool(ranks_equal),
            max_metric_diff=float(max(diffs)),
            ok=bool(ranks_equal and max(diffs) < 5e-7),
        )
        rows.append(row)
        print(f"[transplant:eval] {row['model']:>12}: ranks "
              f"{'identical' if ranks_equal else 'DIFFER'}, max metric diff "
              f"{row['max_metric_diff']:.2e} "
              f"(AUC {row['ref']['auc']:.6f} vs {row['ours']['auc']:.6f})",
              flush=True)
    return rows


# ---------------------------------------------------------------------------
# Family: digat — deterministic training-protocol leg (D)
# ---------------------------------------------------------------------------


def run_train_check(workdir: str, steps: int = 30, B: int = 64,
                    lr: float = 1e-4) -> dict:
    """Train BOTH frameworks from transplanted identical weights at the
    reference protocol point (B=64, lr=1e-4 — reference config.py:31-35)
    for `steps` Adam updates on identical batches, dropout off, fp64.

    This deterministically validates the pieces the logits legs cannot:
    the listwise NLL (trainer.py:100), clip-then-Adam order
    (trainer.py:102-105), the no-decay parameter groups (trainer.py:25-30)
    and Adam's bias-corrected moments — any divergence compounds over 30
    steps and cannot hide inside a +-1 sigma interval."""
    import numpy as np
    import torch

    import jax
    import jax.numpy as jnp
    import optax

    from ref_harness import (build_reference_config, force_cpu_device,
                             install_cpu_shims, install_torch_scatter_shim,
                             install_torchtext_shim)
    from digat_tpu import interop
    from digat_tpu.models.model import Model
    from digat_tpu.train.optimizer import make_optimizer

    install_torch_scatter_shim()
    install_torchtext_shim("/dev/null")
    install_cpu_shims()
    sys.path.insert(0, os.environ.get("DIGAT_REFERENCE_DIR", "/root/reference"))
    os.makedirs(workdir, exist_ok=True)
    os.chdir(workdir)
    import pickle

    emb_pkl = (f"word_embedding-3-{GEO['word_embedding_dim']}-"
               f"{GEO['max_title_length']}-MIND-small.pkl")
    if not os.path.exists(emb_pkl):
        with open(emb_pkl, "wb") as f:
            pickle.dump(torch.zeros(VOCAB, GEO["word_embedding_dim"]), f)

    geo0 = dict(GEO, dropout_rate=0.0)  # deterministic: dropout off
    cfg_ref = build_reference_config(dict(
        geo0, news_encoder="MSA", graph_encoder="DIGAT",
        batch_size=B, lr=lr, seed=0,
    ))
    cfg_ref.vocabulary_size = VOCAB
    cfg_ref.category_num = CATS
    from model import Model as RefModel

    torch.manual_seed(0)
    ref = RefModel(cfg_ref)
    ref.initialize()
    randomize_(ref, seed=321)
    force_cpu_device(ref)
    ref = ref.double()
    ref.train()
    # the reference's exact optimizer construction (trainer.py:25-30)
    no_decay = [".bias", "embed", "graph_encoder."]
    groups = [
        {"params": [p for n, p in ref.named_parameters()
                    if not any(nd in n.lower() for nd in no_decay)],
         "weight_decay": 0.0},
        {"params": [p for n, p in ref.named_parameters()
                    if any(nd in n.lower() for nd in no_decay)],
         "weight_decay": 0.0},
    ]
    opt_ref = torch.optim.Adam(groups, lr=lr)

    from digat_tpu.config import Config

    # dataset='synthetic': MIND-small would force dropout_rate back to 0.2
    # (Config.__post_init__ mirrors reference config.py:62-64), silently
    # re-enabling dropout on this side only — the first run of this leg
    # caught exactly that as a loss divergence
    cfg = Config(
        dataset="synthetic", news_encoder="MSA", graph_encoder="DIGAT",
        vocabulary_size=VOCAB, category_num=CATS, user_num=10,
        use_pallas=False, compute_dtype="float32", dedup_titles=0,
        batch_size=B, lr=lr, **geo0,
    ).validate()
    ours = Model(cfg)
    params0 = jax.tree.map(
        lambda x: jnp.asarray(x, jnp.float64),
        interop.torch_to_params(ref.state_dict(), cfg),
    )
    # two arms: the production optax clip, and a torch-exact clip
    # (max_norm/(norm+1e-6)) that removes the one known semantic epsilon —
    # the torch_clip arm must then track the reference's fp64 trajectory
    # essentially exactly for all `steps` updates
    arms = {}
    for arm, compat in (("optax_clip", False), ("torch_clip", True)):
        tx = make_optimizer(0.0, cfg_ref.gradient_clip_norm, params0,
                            torch_compat_clip=compat)
        arms[arm] = {"tx": tx, "opt_state": tx.init(params0),
                     "params": params0, "losses": [], "step1_pdiff": None}

    def loss_fn(params, j):
        logits = ours.forward(
            params, jax.random.PRNGKey(0), True,
            j["user_title_text"], j["user_title_mask"], j["user_graph"],
            j["user_category_mask"], j["user_category_indices"],
            j["news_title_text"], j["news_title_mask"], j["news_graph"],
            j["news_graph_mask"],
        )
        return -jnp.mean(jax.nn.log_softmax(logits, axis=1)[:, 0])

    grad_fn = jax.jit(jax.value_and_grad(loss_fn))
    rng = np.random.default_rng(99)
    N, H, C, L = 1 + geo0["negative_sample_num"], geo0["max_history_num"], \
        CATS, geo0["max_title_length"]
    Gn = cfg_ref.news_graph_size
    losses_ref = []
    for step in range(steps):
        inp = make_inputs(rng, B=B, N=N, Gn=Gn, H=H, C=C, L=L)
        t = to_torch(inp)
        logits = ref(
            t["user_title_text"], t["user_title_mask"], t["user_graph"],
            t["user_category_mask"], t["user_category_indices"].long(),
            t["news_title_text"], t["news_title_mask"], t["news_graph"],
            t["news_graph_mask"],
        )
        loss_t = (-torch.log_softmax(logits, dim=1).select(1, 0)).mean()
        opt_ref.zero_grad()
        loss_t.backward()
        torch.nn.utils.clip_grad_norm_(
            ref.parameters(), cfg_ref.gradient_clip_norm)
        opt_ref.step()
        losses_ref.append(float(loss_t))

        j = {k: jnp.asarray(v) for k, v in inp.items()}
        rf1 = (interop.torch_to_params(ref.state_dict(), cfg)
               if step == 0 else None)
        for arm in arms.values():
            loss_j, g = grad_fn(arm["params"], j)
            updates, arm["opt_state"] = arm["tx"].update(
                g, arm["opt_state"], arm["params"])
            updates = jax.tree.map(lambda u: -lr * u, updates)
            arm["params"] = optax.apply_updates(arm["params"], updates)
            arm["losses"].append(float(loss_j))
            if step == 0:
                arm["step1_pdiff"] = max(
                    float(np.max(np.abs(np.asarray(a) - b)))
                    for a, b in zip(jax.tree.leaves(arm["params"]),
                                    jax.tree.leaves(rf1))
                )

    # final-state agreement: transplant the reference's trained weights
    # again and diff each arm against them
    ref_final = jax.tree.map(
        lambda x: np.asarray(x, np.float64),
        interop.torch_to_params(ref.state_dict(), cfg),
    )
    report_arms = {}
    for name, arm in arms.items():
        pdiff = jax.tree.reduce(
            max,
            jax.tree.map(
                lambda a, b: float(np.max(np.abs(np.asarray(a) - b))),
                arm["params"], ref_final,
            ),
        )
        ldiff = max(abs(a - b) for a, b in zip(losses_ref, arm["losses"]))
        report_arms[name] = dict(
            max_loss_diff=ldiff, final_param_max_diff=pdiff,
            step1_param_max_diff=arm["step1_pdiff"],
        )
        print(f"[transplant:train] arm {name:>10}: step-1 param diff "
              f"{arm['step1_pdiff']:.2e}, max loss diff {ldiff:.2e}, "
              f"final param diff {pdiff:.2e}", flush=True)
    # the torch_clip arm removes the ONE semantic epsilon (torch's 1e-6
    # clip denominator) and must track the reference exactly; the
    # optax_clip arm documents how far that epsilon compounds through
    # Adam's flat directions over `steps` updates (loss-level agreement
    # stays tight; param-level wanders on near-zero-gradient elements)
    tc, oc = report_arms["torch_clip"], report_arms["optax_clip"]
    row = dict(
        model="MSA-DIGAT", steps=steps, batch_size=B, lr=lr, dtype="float64",
        protocol="reference defaults (B=64, lr=1e-4, Adam no-decay groups, "
                 "clip 1.0, listwise NLL)",
        arms=report_arms,
        known_seed="torch clip_grad_norm_ 1e-6 epsilon vs optax exact clip",
        loss_first=losses_ref[0], loss_last=losses_ref[-1],
        losses_ref=[round(x, 9) for x in losses_ref],
        ok=bool(tc["step1_param_max_diff"] <= 1e-9
                and tc["max_loss_diff"] <= 1e-8
                and tc["final_param_max_diff"] <= 1e-7
                and oc["max_loss_diff"] <= 1e-4),
    )
    print(f"[transplant:train] loss {row['loss_first']:.6f} -> "
          f"{row['loss_last']:.6f} over {steps} steps: "
          f"{'OK' if row['ok'] else 'MISMATCH'}", flush=True)
    return row


# ---------------------------------------------------------------------------
# Family: nrms (Appendix-B)
# ---------------------------------------------------------------------------


def run_nrms_logits(workdir: str) -> list:
    import numpy as np
    import torch

    import jax
    import jax.numpy as jnp

    from ref_harness import force_cpu_device, install_cpu_shims
    from ref_harness_nrms import build_config
    from digat_tpu import interop
    from digat_tpu.models.nrms import NRMSModel
    from digat_tpu.config import Config

    install_cpu_shims()
    sys.path.insert(0, os.path.join(
        os.environ.get("DIGAT_REFERENCE_DIR", "/root/reference"), "Appendix-B"
    ))
    os.makedirs(workdir, exist_ok=True)
    os.chdir(workdir)

    import pickle

    L = GEO["max_title_length"]
    emb_pkl = f"word_embedding-3-{GEO['word_embedding_dim']}-{L}-MIND-small.pkl"
    if not os.path.exists(emb_pkl):
        with open(emb_pkl, "wb") as f:
            pickle.dump(torch.zeros(VOCAB, GEO["word_embedding_dim"]), f)

    rows = []
    B, N, H, M = 3, 5, GEO["max_history_num"], 10
    for nrms_model in ("NRMS", "NRMS-SA"):
        cfg_ref = build_config(dict(
            model=nrms_model, word_embedding_dim=GEO["word_embedding_dim"],
            head_num=10, head_dim=20, attention_dim=GEO["attention_dim"],
            max_title_length=L, max_history_num=H, augmented_news_num=M,
            seed=0,
        ))
        cfg_ref.vocabulary_size = VOCAB
        from model import Model as RefModel  # Appendix-B module

        torch.manual_seed(0)
        ref = RefModel(cfg_ref)
        ref.initialize()
        randomize_(ref, seed=hash(nrms_model) % (2**31))
        force_cpu_device(ref)
        ref = ref.double().eval()

        rng = np.random.default_rng(7)

        def titles(shape):
            text = rng.integers(1, VOCAB, shape)
            lengths = rng.integers(1, L + 1, shape[:-1])
            mask = (np.arange(L) < lengths[..., None])
            return text * mask, mask.astype(np.float64)

        user_text, user_mask = titles((B, H, L))
        news_text, news_mask = titles((B, N, L))
        aug_text, aug_mask = titles((B, N, M, L))
        hist_mask = (rng.random((B, H)) < 0.8).astype(np.float64)
        hist_mask[:, 0] = 1.0

        tt = lambda x: torch.from_numpy(x).long()
        tf = lambda x: torch.from_numpy(x).double()
        with torch.no_grad():
            ref_logits = ref(
                tt(user_text), tf(user_mask), tf(hist_mask),
                tt(news_text), tf(news_mask),
                tt(aug_text) if nrms_model == "NRMS-SA" else None,
                tf(aug_mask) if nrms_model == "NRMS-SA" else None,
            ).numpy()

        cfg = Config(
            model_family="nrms", nrms_model=nrms_model,
            vocabulary_size=VOCAB, category_num=CATS, user_num=10,
            nrms_head_num=10, nrms_head_dim=20,
            nrms_attention_dim=GEO["attention_dim"], augmented_news_num=M,
            word_embedding_dim=GEO["word_embedding_dim"],
            max_title_length=L, max_history_num=H,
            use_pallas=False, compute_dtype="float32",
        ).validate()
        ours = NRMSModel(cfg)
        params = jax.tree.map(
            lambda x: jnp.asarray(x, jnp.float64),
            interop.torch_to_nrms_params(ref.state_dict(), cfg),
        )
        key = jax.random.PRNGKey(0)
        news_rep = ours.encode_news(
            params, key, False, jnp.asarray(news_text), jnp.asarray(news_mask),
            jnp.asarray(aug_text) if nrms_model == "NRMS-SA" else None,
            jnp.asarray(aug_mask) if nrms_model == "NRMS-SA" else None,
        )
        hist_rep = ours._encode_titles(
            params, ours.st, key, False, jnp.asarray(user_text),
            jnp.asarray(user_mask),
        )
        user_rep = ours.encode_user(params, hist_rep, jnp.asarray(hist_mask))
        our_logits = np.asarray(jnp.einsum("bnd,bd->bn", news_rep, user_rep))
        diff = float(np.max(np.abs(ref_logits - our_logits)))
        scale = float(np.max(np.abs(ref_logits)))
        row = dict(model=nrms_model, dtype="float64",
                   forward_max_abs_diff=diff, logit_scale=scale,
                   ok=bool(diff <= 1e-9 * max(scale, 1.0)))
        rows.append(row)
        print(f"[transplant] {nrms_model:>28}: fwd {diff:.2e} "
              f"{'OK' if row['ok'] else 'MISMATCH'}", flush=True)
    return rows


# ---------------------------------------------------------------------------


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--all", action="store_true",
                    help="run both families in subprocesses, write "
                         "docs/TRANSPLANT.json")
    ap.add_argument("--family", choices=("digat", "nrms"))
    ap.add_argument("--skip-metrics", action="store_true")
    ap.add_argument("--skip-train", action="store_true",
                    help="skip the 30-step fp64 training-trajectory leg "
                         "(the slowest leg, ~1-2 h on a shared host)")
    ap.add_argument("--workdir", default=os.path.join(REPO, "parity_runs",
                                                      "transplant"))
    ap.add_argument("--parity-dir", default=os.path.join(REPO, "parity_runs"))
    ap.add_argument("--out", default="")
    args = ap.parse_args(argv)

    if args.all:
        merged = {"legs": {}}
        for fam in ("digat", "nrms"):
            out = os.path.join(args.workdir, f"transplant-{fam}.json")
            os.makedirs(args.workdir, exist_ok=True)
            cmd = [sys.executable, os.path.abspath(__file__),
                   "--family", fam, "--out", out,
                   "--workdir", args.workdir, "--parity-dir", args.parity_dir]
            if args.skip_metrics:
                cmd.append("--skip-metrics")
            if args.skip_train:
                cmd.append("--skip-train")
            env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
            subprocess.run(cmd, check=True, env=env)
            with open(out) as f:
                merged["legs"][fam] = json.load(f)
        rows = (merged["legs"]["digat"]["logits"]
                + merged["legs"]["nrms"]["logits"]
                + merged["legs"]["digat"].get("train", [])
                + merged["legs"]["digat"].get("metrics", []))
        merged["all_ok"] = all(r["ok"] for r in rows)
        final = os.path.join(REPO, "docs", "TRANSPLANT.json")
        with open(final, "w") as f:
            json.dump(merged, f, indent=2)
        print(f"[transplant] wrote {final}; all_ok={merged['all_ok']}")
        if not merged["all_ok"]:
            sys.exit(1)
        return

    pin_cpu_x64()
    if args.family == "digat":
        result = {"logits": run_digat_logits(args.workdir)}
        if not args.skip_train:
            result["train"] = [run_train_check(args.workdir)]
        if not args.skip_metrics:
            result["metrics"] = run_digat_metrics(args.parity_dir)
    else:
        result = {"logits": run_nrms_logits(args.workdir)}
    with open(args.out or "/dev/stdout", "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
