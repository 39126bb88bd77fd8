#!/usr/bin/env python
"""Orchestrate the head-to-head accuracy-parity experiment:

    reference PyTorch DIGAT (CPU, via ref_harness.py)
        vs
    digat_tpu (JAX CPU, via its own CLI)

on the SAME synthetic MIND-format dataset, the SAME initial word vectors
(a generated GloVe-format txt both sides load), and the SAME semantic news
graph (digat_tpu's SAG artifact converted to the reference's pkl format),
for N seeds each. Records per-seed best-epoch dev metrics + auto-test
metrics and writes a side-by-side summary (mean ± std) to
docs/PARITY_RESULTS.json.

The training protocols are the reference's own: listwise NLL over 1+K
sampled candidates, Adam with no-decay groups, lr/10 late decay, per-epoch
negative resampling, best-checkpoint by dev avg metric, auto-test
(reference trainer.py:17-188, main.py:54-62).

Usage:
    python scripts/parity/run_parity.py --workdir /root/repo/parity_runs \
        --seeds 0 1 2 --models DIGAT wo_interaction
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import shutil
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)


def pin_cpu() -> None:
    """Force the CPU backend. The axon TPU plugin pins jax_platforms
    programmatically, so the env var alone is not enough (see
    tests/conftest.py) — and the parity study wants CPU anyway so it can
    run alongside TPU benching."""
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")

# CPU-feasible geometry shared by BOTH frameworks. Protocol knobs
# (optimizer, loss, decay, criterion) stay at reference defaults; size
# knobs are shrunk so a full reference train run fits in CPU minutes.
GEOMETRY = dict(
    word_embedding_dim=100,
    MSA_head_num=10, MSA_head_dim=20,   # news_embedding_dim = 200
    cnn_kernel_num=200,                 # CNN cells match the MSA dim
    attention_dim=64,
    max_title_length=16,
    max_history_num=16,
    SAG_neighbors=3, SAG_hops=2,        # news_graph_size = 10
    graph_depth=3,
    negative_sample_num=4,
    batch_size=32,
    lr=1e-3,                            # tiny-corpus convergence (same both sides)
    epoch=8,
    early_stopping_epoch=5,
    word_threshold=3,
    dev_criterion="avg",
)

DATASET = dict(
    news_num=600, categories=6, train_behaviors=1500, dev_behaviors=400,
    test_behaviors=400, users=150, max_impressions=10, seed=7,
    # sharp learnable click signal (both frameworks see the same data)
    pref_alpha=0.12, click_base=0.05, click_scale=0.9,
    min_history=4, max_history=24,
)


def gen_dataset(root: str) -> None:
    from digat_tpu.data import synthetic

    if not os.path.exists(os.path.join(root, "train", "behaviors.tsv")):
        synthetic.generate(root, **DATASET)


def gen_glove(data_root: str, path: str, dim: int, seed: int = 123) -> None:
    """Random-but-shared initial word vectors for every word in the corpus
    (both frameworks resolve in-vocabulary words from this file; OOV rows
    are per-framework random draws, like real GloVe usage)."""
    if os.path.exists(path):
        return
    from digat_tpu.data import tokenize as tok

    words = []
    seen = set()
    for split in ("train", "dev", "test"):
        with open(os.path.join(data_root, split, "news.tsv"), encoding="utf-8") as f:
            for line in f:
                title = line.split("\t")[3]
                for w in tok.tokenize(title.lower()):
                    if w not in seen and not tok.is_number(w):
                        seen.add(w)
                        words.append(w)
    rng = np.random.default_rng(seed)
    with open(path, "w", encoding="utf-8") as f:
        for w in words:
            vec = rng.normal(0.0, 0.3, size=dim)
            f.write(w + " " + " ".join(f"{x:.5f}" for x in vec) + "\n")


def build_our_cache(workdir: str, glove_txt: str) -> str:
    """Run digat_tpu preprocessing once (it builds the SAG artifact all
    runs share); returns the cache dir."""
    from digat_tpu.config import Config
    from digat_tpu.data import corpus as corpus_lib

    cfg = our_config(workdir, seed=0)
    corpus_lib.preprocess(cfg, glove_path=glove_txt, verbose=True)
    return os.path.join(cfg.data_root, f"{cfg.dataset}-cache")


def our_config(workdir: str, seed: int, **over):
    from digat_tpu.config import Config

    kw = dict(
        dataset="MIND-small",
        data_root=os.path.join(workdir, "data"),
        run_root=os.path.join(workdir, "ours"),
        glove_path=os.path.join(workdir, "glove.txt"),
        seed=seed,
        use_pallas=False,
        dedup_titles=0,       # avoid the shared-dropout-mask dedup deviation
        rng_impl="threefry",
        # __post_init__ force-resets epoch for MIND-small exactly like the
        # reference's parse_argument (config.py:62-64); epoch_override is
        # the explicit escape, and it survives the CLI flag round-trip
        epoch_override=GEOMETRY["epoch"],
        **{k: v for k, v in GEOMETRY.items()},
    )
    kw.update(over)
    return Config(**kw).validate()


def convert_sag_to_reference(cache_dir: str, ref_rundir: str, cfg) -> None:
    """digat_tpu news_graph npz -> the reference's pkl cache format
    (MIND_corpus.py:110-124: graph already has self-loops when pickled;
    mask[:,0] stays 1 in the artifact and is zeroed at load)."""
    key = f"{cfg.SAG_hops}-{cfg.SAG_neighbors}"
    src = os.path.join(cache_dir, f"news_graph-{key}.npz")
    dst = os.path.join(ref_rundir, f"news_graph-{key}-MIND-small.pkl")
    if os.path.exists(dst):
        return
    art = np.load(src)
    with open(dst, "wb") as f:
        pickle.dump({
            "news_node_ID": art["news_node_id"].astype(np.int64),
            "news_graph": art["news_graph"].astype(bool),
            "news_graph_mask": art["news_graph_mask"].astype(bool),
        }, f, protocol=4)


def ref_overrides(seed: int, graph_encoder: str, news_encoder: str) -> dict:
    over = dict(GEOMETRY)
    over.update(seed=seed, graph_encoder=graph_encoder,
                news_encoder=news_encoder)
    return over


def run_reference(workdir: str, seed: int, graph_encoder: str,
                  news_encoder: str) -> dict:
    rundir = os.path.join(workdir, "ref", "run")
    out = os.path.join(
        workdir, f"ref-{news_encoder}-{graph_encoder}-seed{seed}.json"
    )
    if not os.path.exists(out):
        cmd = [
            sys.executable, os.path.join(REPO, "scripts/parity/ref_harness.py"),
            "--workdir", rundir,
            "--glove-txt", os.path.join(workdir, "glove.txt"),
            "--config-json", json.dumps(
                ref_overrides(seed, graph_encoder, news_encoder)
            ),
            "--out", out,
        ]
        env = dict(os.environ)
        env.setdefault("OMP_NUM_THREADS", str(os.cpu_count() or 8))
        subprocess.run(cmd, check=True, env=env)
    with open(out) as f:
        return json.load(f)


def run_ours(workdir: str, seed: int, graph_encoder: str,
             news_encoder: str, variant: str = "") -> dict:
    """variant='dedup' re-runs digat_tpu with unique-title dedup ON
    (dedup_titles=-1): identical titles in a batch then share dropout
    masks — the one documented semantic deviation from the reference.
    Comparing this cell against the dedup-off cell (and the reference)
    bounds that deviation's effect on final metrics."""
    tag = f"+{variant}" if variant else ""
    out = os.path.join(
        workdir, f"ours-{news_encoder}-{graph_encoder}{tag}-seed{seed}.json"
    )
    if not os.path.exists(out):
        over = {"dedup_titles": -1} if variant == "dedup" else {}
        cfg = our_config(workdir, seed, graph_encoder=graph_encoder,
                         news_encoder=news_encoder, **over)
        flags = []
        for k, v in vars(cfg).items():
            if k in ("vocabulary_size", "category_num", "user_num"):
                continue
            flags += [f"--{k}", str(v)]
        runner = (
            "import jax; jax.config.update('jax_platforms', 'cpu'); "
            "import sys; from digat_tpu.cli import main; main(sys.argv[1:])"
        )
        cmd = [sys.executable, "-c", runner] + flags
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["PYTHONPATH"] = REPO
        log = out.replace(".json", ".stdout")
        with open(log, "w") as lf:
            subprocess.run(cmd, check=True, env=env, cwd=REPO,
                           stdout=lf, stderr=subprocess.STDOUT)
        result = collect_ours(workdir, cfg, log)
        result["model"] += tag
        with open(out, "w") as f:
            json.dump(result, f, indent=2)
    with open(out) as f:
        return json.load(f)


def collect_ours(workdir: str, cfg, log: str, model_name: str = "") -> dict:
    """Parse digat_tpu's run artifacts (dev_log.txt + #N-test) for the
    freshest run index of this model."""
    model_name = model_name or cfg.model_name
    results_dir = os.path.join(cfg.run_root, "results", cfg.dataset,
                               model_name)
    indices = [
        int(n[1:-4]) for n in os.listdir(results_dir)
        if n.startswith("#") and n.endswith("-dev")
    ]
    run_index = max(indices)
    run_dir = os.path.join(cfg.run_root, cfg.dataset, model_name,
                           f"#{run_index}")
    per_epoch = []
    with open(os.path.join(run_dir, "dev_log.txt")) as f:
        lines = [l.strip() for l in f if l.strip()]
    best_epoch = None
    for line in lines[1:]:
        if line.startswith("Best"):
            best_epoch = int(line.split(":")[-1].strip())
            continue
        e, auc, mrr, n5, n10 = line.split("\t")
        per_epoch.append({"epoch": int(e), "auc": float(auc),
                          "mrr": float(mrr), "ndcg5": float(n5),
                          "ndcg10": float(n10)})
    assert best_epoch is not None, f"no best epoch in {run_dir}/dev_log.txt"
    test = {}
    test_path = os.path.join(results_dir, f"#{run_index}-test")
    if os.path.exists(test_path):
        with open(test_path) as f:
            parts = f.read().strip().split("\t")
        test = {"auc": float(parts[1]), "mrr": float(parts[2]),
                "ndcg5": float(parts[3]), "ndcg10": float(parts[4])}
    best = per_epoch[best_epoch - 1]
    return {
        "framework": "digat_tpu", "model": model_name, "seed": cfg.seed,
        "run_index": run_index, "best_dev_epoch": best_epoch,
        "per_epoch": per_epoch,
        "dev": {k: best[k] for k in ("auc", "mrr", "ndcg5", "ndcg10")},
        "test": test,
    }


# ---------------------------------------------------------------------------
# Appendix-B NRMS / NRMS-SA leg
# ---------------------------------------------------------------------------

NRMS_GEOMETRY = dict(  # reference Appendix-B names
    word_embedding_dim=100, head_num=10, head_dim=20, attention_dim=64,
    max_title_length=16, max_history_num=16, negative_sample_num=4,
    batch_size=32, lr=1e-3, epoch=8, early_stopping_epoch=5,
    word_threshold=3, dev_criterion="avg", augmented_news_num=10,
)


def our_nrms_config(workdir: str, seed: int, nrms_model: str = "NRMS-SA"):
    over = dict(
        model_family="nrms", nrms_model=nrms_model,
        nrms_head_num=NRMS_GEOMETRY["head_num"],
        nrms_head_dim=NRMS_GEOMETRY["head_dim"],
        nrms_attention_dim=NRMS_GEOMETRY["attention_dim"],
        augmented_news_num=NRMS_GEOMETRY["augmented_news_num"],
    )
    return our_config(workdir, seed, **over)


def build_our_nrms_cache(workdir: str) -> None:
    """Build the augmented-news artifact (construct_sa_sequence) once."""
    from digat_tpu.data import corpus as corpus_lib

    cfg = our_nrms_config(workdir, seed=0)
    corpus_lib.preprocess(cfg, glove_path=os.path.join(workdir, "glove.txt"),
                          verbose=True)


def convert_augmented_to_reference(workdir: str, refb_rundir: str) -> None:
    """digat_tpu augmented_news npz -> Appendix-B's
    semantic_augmented_news pkl (int32 [news_num, M];
    Appendix-B/MIND_corpus.py:112-121)."""
    cfg = our_nrms_config(workdir, seed=0)
    cache = os.path.join(cfg.data_root, f"{cfg.dataset}-cache")
    src = os.path.join(cache, f"augmented_news-{cfg.augmented_news_num}.npz")
    dst = os.path.join(
        refb_rundir,
        f"semantic_augmented_news-{cfg.augmented_news_num}-MIND-small.pkl",
    )
    if os.path.exists(dst):
        return
    aug = np.load(src)["augmented_news"].astype(np.int32)
    with open(dst, "wb") as f:
        pickle.dump(aug, f, protocol=4)


def run_reference_nrms(workdir: str, seed: int, nrms_model: str) -> dict:
    rundir = os.path.join(workdir, "refb", "appendix", "run")
    out = os.path.join(workdir, f"refb-{nrms_model}-seed{seed}.json")
    if not os.path.exists(out):
        over = dict(NRMS_GEOMETRY)
        over.update(seed=seed, model=nrms_model)
        cmd = [
            sys.executable,
            os.path.join(REPO, "scripts/parity/ref_harness_nrms.py"),
            "--workdir", rundir,
            "--glove-txt", os.path.join(workdir, "glove.txt"),
            "--config-json", json.dumps(over),
            "--out", out,
        ]
        subprocess.run(cmd, check=True)
    with open(out) as f:
        return json.load(f)


def run_ours_nrms(workdir: str, seed: int, nrms_model: str) -> dict:
    out = os.path.join(workdir, f"ours-{nrms_model}-seed{seed}.json")
    if not os.path.exists(out):
        cfg = our_nrms_config(workdir, seed, nrms_model)
        flags = []
        for k, v in vars(cfg).items():
            if k in ("vocabulary_size", "category_num", "user_num"):
                continue
            flags += [f"--{k}", str(v)]
        runner = (
            "import jax; jax.config.update('jax_platforms', 'cpu'); "
            "import sys; from digat_tpu.cli import main; main(sys.argv[1:])"
        )
        cmd = [sys.executable, "-c", runner] + flags
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["PYTHONPATH"] = REPO
        log = out.replace(".json", ".stdout")
        with open(log, "w") as lf:
            subprocess.run(cmd, check=True, env=env, cwd=REPO,
                           stdout=lf, stderr=subprocess.STDOUT)
        result = collect_ours(workdir, cfg, log, model_name=nrms_model)
        with open(out, "w") as f:
            json.dump(result, f, indent=2)
    with open(out) as f:
        return json.load(f)


def run_nrms_matrix(wd: str, seeds, nrms_models) -> list:
    refb_run = os.path.join(wd, "refb", "appendix", "run")
    os.makedirs(refb_run, exist_ok=True)
    link = os.path.join(wd, "refb", "MIND-small")
    if not os.path.exists(link):
        os.symlink(os.path.join(wd, "data", "MIND-small"), link)
    build_our_nrms_cache(wd)
    convert_augmented_to_reference(wd, refb_run)
    rows = []
    for nrms_model in nrms_models:
        for seed in seeds:
            print(f"[parity] digat_tpu {nrms_model} seed {seed}", flush=True)
            rows.append(run_ours_nrms(wd, seed, nrms_model))
            print(f"[parity] reference {nrms_model} seed {seed}", flush=True)
            rows.append(run_reference_nrms(wd, seed, nrms_model))
    return rows


def summarize(rows: list) -> dict:
    """mean/std of best-epoch dev + test metrics per (framework, model)."""
    out = {}
    for row in rows:
        key = f"{row['framework']}/{row['model']}"
        out.setdefault(key, {"dev": [], "test": [], "seeds": []})
        out[key]["dev"].append(row["dev"])
        if row.get("test"):
            out[key]["test"].append(row["test"])
        out[key]["seeds"].append(row["seed"])
    summary = {}
    for key, acc in out.items():
        entry = {"n_seeds": len(acc["seeds"]), "seeds": acc["seeds"]}
        for split in ("dev", "test"):
            vals = acc[split]
            if not vals:
                continue
            entry[split] = {
                m: {
                    "mean": float(np.mean([v[m] for v in vals])),
                    "std": float(np.std([v[m] for v in vals], ddof=1))
                    if len(vals) > 1 else 0.0,
                }
                for m in ("auc", "mrr", "ndcg5", "ndcg10")
            }
        summary[key] = entry
    return summary


def check_dict_consistency(workdir: str, cache_dir: str) -> None:
    """Both frameworks must agree on the news-ID space, or the shared SAG
    pkl indexes the wrong rows."""
    ref_json = os.path.join(workdir, "ref", "run", "news_ID-MIND-small.json")
    if not os.path.exists(ref_json):
        return
    with open(ref_json) as f:
        ref_news = json.load(f)
    with open(os.path.join(cache_dir, "dicts.json")) as f:
        ours = json.load(f)["news"]
    assert ref_news == ours, "news-ID dictionaries diverge between frameworks"
    print(f"[parity] news-ID dictionaries identical ({len(ours)} entries)")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default=os.path.join(REPO, "parity_runs"))
    ap.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2])
    ap.add_argument("--models", nargs="+", default=["DIGAT"],
                    help="graph encoders to compare (reference choices)")
    ap.add_argument("--news-encoder", default="MSA")
    ap.add_argument("--frameworks", nargs="+",
                    default=["reference", "digat_tpu"])
    ap.add_argument("--nrms-models", nargs="+", default=[],
                    help="Appendix-B leg: e.g. NRMS-SA NRMS")
    ap.add_argument("--ours-variant", default="",
                    help="'dedup': extra digat_tpu-only cells with "
                         "unique-title dedup ON (deviation-bounding)")
    args = ap.parse_args(argv)
    pin_cpu()

    wd = args.workdir
    os.makedirs(os.path.join(wd, "ref", "run"), exist_ok=True)
    data_root = os.path.join(wd, "data")
    gen_dataset(os.path.join(data_root, "MIND-small"))
    # the reference resolves ../MIND-small relative to its run dir
    link = os.path.join(wd, "ref", "MIND-small")
    if not os.path.exists(link):
        os.symlink(os.path.join(data_root, "MIND-small"), link)
    gen_glove(os.path.join(data_root, "MIND-small"),
              os.path.join(wd, "glove.txt"), GEOMETRY["word_embedding_dim"])
    cache_dir = build_our_cache(wd, os.path.join(wd, "glove.txt"))
    convert_sag_to_reference(cache_dir, os.path.join(wd, "ref", "run"),
                             our_config(wd, seed=0))

    rows = []
    for graph_encoder in args.models:
        for seed in args.seeds:
            if "digat_tpu" in args.frameworks:
                print(f"[parity] digat_tpu {graph_encoder} seed {seed}", flush=True)
                rows.append(run_ours(wd, seed, graph_encoder,
                                     args.news_encoder))
                if args.ours_variant:
                    print(f"[parity] digat_tpu {graph_encoder}"
                          f"+{args.ours_variant} seed {seed}", flush=True)
                    rows.append(run_ours(wd, seed, graph_encoder,
                                         args.news_encoder,
                                         variant=args.ours_variant))
            if "reference" in args.frameworks:
                print(f"[parity] reference {graph_encoder} seed {seed}", flush=True)
                rows.append(run_reference(wd, seed, graph_encoder,
                                          args.news_encoder))
                check_dict_consistency(wd, cache_dir)
    rows += run_nrms_matrix(wd, args.seeds, args.nrms_models)

    # merge with prior runs (the matrix is built up across invocations)
    out = os.path.join(REPO, "docs", "PARITY_RESULTS.json")
    if os.path.exists(out):
        with open(out) as f:
            prior = json.load(f).get("runs", [])
        seen = {(r["framework"], r["model"], r["seed"]) for r in rows}
        rows += [
            r for r in prior
            if (r["framework"], r["model"], r["seed"]) not in seen
        ]
    summary = {
        "geometry": GEOMETRY, "nrms_geometry": NRMS_GEOMETRY,
        "dataset": DATASET,
        "summary": summarize(rows), "runs": rows,
    }
    with open(out, "w") as f:
        json.dump(summary, f, indent=2)
    print(f"[parity] wrote {out}")
    for key, entry in summary["summary"].items():
        if "dev" in entry:
            d = entry["dev"]
            print(f"  {key}: dev AUC {d['auc']['mean']:.4f}±{d['auc']['std']:.4f}"
                  f" MRR {d['mrr']['mean']:.4f}±{d['mrr']['std']:.4f}"
                  f" nDCG@5 {d['ndcg5']['mean']:.4f}±{d['ndcg5']['std']:.4f}"
                  f" nDCG@10 {d['ndcg10']['mean']:.4f}±{d['ndcg10']['std']:.4f}"
                  f" (n={entry['n_seeds']})")


if __name__ == "__main__":
    main()
