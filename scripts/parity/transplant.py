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
            env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
            subprocess.run(cmd, check=True, env=env)
            with open(out) as f:
                merged["legs"][fam] = json.load(f)
        rows = (merged["legs"]["digat"]["logits"]
                + merged["legs"]["nrms"]["logits"]
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
        if not args.skip_metrics:
            result["metrics"] = run_digat_metrics(args.parity_dir)
    else:
        result = {"logits": run_nrms_logits(args.workdir)}
    with open(args.out or "/dev/stdout", "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
