"""Experiment driver: train / dev / test modes.

Equivalent of the reference's main.py:12-72 — `train` runs the full loop
then automatically evaluates the best checkpoint on the test split; `dev` /
`test` score an existing checkpoint. The `synthetic` dataset generates
itself on first use, so the whole stack runs hermetically.
"""

from __future__ import annotations

import os
import sys
import time
from typing import Optional

from digat_tpu.config import Config
from digat_tpu.data import corpus as corpus_lib
from digat_tpu.data import synthetic
from digat_tpu.eval.scorer import compute_scores
from digat_tpu.models.model import Model
from digat_tpu.train import checkpoint as ckpt_lib
from digat_tpu.train.trainer import Trainer


def build_model(cfg: Config):
    """Model-family dispatch: the DIGAT dual-graph stack or the Appendix-B
    NRMS / NRMS-SA sequence stack."""
    if cfg.model_family == "nrms":
        from digat_tpu.models.nrms import NRMSModel

        return NRMSModel(cfg)
    return Model(cfg)


def prepare(cfg: Config, glove_path: Optional[str] = None) -> corpus_lib.Corpus:
    """Acquire + preprocess on process 0 only, then barrier so every
    process loads the same finished artifacts (the reference runs its
    whole preliminary_setup on rank 0, config.py:99, while other ranks
    ride the 12h NCCL timeout)."""
    import jax

    if jax.process_index() == 0:
        root = os.path.join(cfg.data_root, cfg.dataset)
        if cfg.dataset == "synthetic":
            if not os.path.exists(os.path.join(root, "train", "behaviors.tsv")):
                print(f"[prepare] generating synthetic dataset under {root}")
                synthetic.generate(root)
        else:
            from digat_tpu.data import prepare as prepare_lib

            prepare_lib.prepare(cfg.dataset, cfg.data_root, cfg.seed)
        corpus_lib.preprocess(cfg, glove_path=glove_path, verbose=True)
        write_truth_files(cfg)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("digat_tpu.prepare")
    return corpus_lib.Corpus(cfg)


def write_truth_files(cfg: Config) -> None:
    """Official-scorer ground truth under <run_root>/<split>/<dataset>/ref/
    (reference config.py:119-135: dev always; test only when labeled —
    MIND-large test labels live on the leaderboard). Process 0 only."""
    import jax

    if jax.process_index() != 0:
        return
    from digat_tpu.eval import metrics as metrics_lib

    for split in ("dev", "test"):
        if cfg.dataset == "MIND-large" and split == "test":
            continue
        behaviors = os.path.join(
            cfg.data_root, cfg.dataset, split, "behaviors.tsv"
        )
        ref_dir = os.path.join(cfg.run_root, split, cfg.dataset, "ref")
        path = os.path.join(ref_dir, "truth.txt")
        if os.path.exists(path) or not os.path.exists(behaviors):
            continue
        os.makedirs(ref_dir, exist_ok=True)
        metrics_lib.write_truth_file(behaviors, path)


def run_train(cfg: Config) -> None:
    import jax
    import numpy as np

    corpus = prepare(cfg)
    model = build_model(cfg)
    trainer = Trainer(model, cfg, corpus)
    params, _ = trainer.train()
    # auto-test on the best checkpoint (main.py:59-62). Only process 0 has
    # the run dir, so the checkpoint decision and weights broadcast — every
    # process must join the sharded test eval or the allgather deadlocks
    # (the wart the reference has at trainer.py:171-172).
    best = os.path.join(trainer.run_dir, "best.ckpt") if trainer.is_main else ""
    have_best = trainer.is_main and os.path.exists(best)
    multi = jax.process_count() > 1
    if multi:
        from jax.experimental import multihost_utils

        have_best = bool(
            multihost_utils.broadcast_one_to_all(np.asarray(have_best))
        )
    if have_best:
        if trainer.is_main:
            raw_params, _, epoch = ckpt_lib.load(
                best, model.param_template(), None
            )
        else:
            raw_params = jax.tree.map(
                lambda s: np.zeros(s.shape, s.dtype), model.param_template()
            )
            epoch = 0
        if multi:
            raw_params = multihost_utils.broadcast_one_to_all(raw_params)
            epoch = int(multihost_utils.broadcast_one_to_all(np.asarray(epoch)))
        t0 = time.time()
        # Unlabeled test split (MIND-large): the deliverable is the
        # leaderboard submission zip, not a metrics row (the reference's
        # train flow hands off to test() which writes prediction.zip,
        # main.py:47-51,59-62). Detection uses the pre-clamp -1 sentinel
        # the corpus preserves, not the clamped label sum.
        unlabeled = corpus.test_unlabeled
        if trainer.is_main:
            if unlabeled:
                # per-run submission dir (reference main.py:48-50 layout);
                # without #run_index a second run would overwrite the
                # previous run's leaderboard zip
                pred_dir = os.path.join(
                    cfg.run_root, "prediction", cfg.dataset, model.model_name,
                    f"#{trainer.run_index}",
                )
                os.makedirs(pred_dir, exist_ok=True)
                result_file = os.path.join(pred_dir, "prediction.txt")
            else:
                result_file = os.path.join(trainer.run_dir, "test-prediction.txt")
        else:
            result_file = None
        auc, mrr, ndcg5, ndcg10 = compute_scores(
            model, raw_params, corpus, "test", result_file=result_file
        )
        if trainer.is_main:
            if unlabeled:
                import zipfile

                zip_path = os.path.join(
                    os.path.dirname(result_file), "prediction.zip"
                )
                with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as z:
                    z.write(result_file, "prediction.txt")
                print(f"[test] epoch {epoch}: unlabeled split — wrote "
                      f"leaderboard submission {zip_path} "
                      f"({time.time() - t0:.1f}s)")
            else:
                print(f"[test] epoch {epoch}: AUC={auc:.4f} MRR={mrr:.4f} "
                      f"nDCG@5={ndcg5:.4f} nDCG@10={ndcg10:.4f} "
                      f"({time.time() - t0:.1f}s)")
                res = os.path.join(
                    trainer.results_dir, f"#{trainer.run_index}-test"
                )
                with open(res, "w") as f:
                    f.write(f"#{trainer.run_index}\t{auc}\t{mrr}\t"
                            f"{ndcg5}\t{ndcg10}\n")


def run_eval(cfg: Config, mode: str) -> None:
    path = cfg.dev_model_path if mode == "dev" else cfg.test_model_path
    assert path, f"--{mode}_model_path required"
    corpus = prepare(cfg)
    model = build_model(cfg)
    params, _, epoch = ckpt_lib.load(path, model.param_template(), None)
    t0 = time.time()
    out = cfg.test_output_file or None
    if cfg.dataset == "MIND-large" and mode == "test" and not out:
        # standalone test mode scores run_index 0 like the reference
        # (main.py:68); per-run dirs keep submissions from colliding
        out = os.path.join(
            cfg.run_root, "prediction", cfg.dataset, model.model_name,
            f"#{cfg.run_index}", "prediction.txt",
        )
        os.makedirs(os.path.dirname(out), exist_ok=True)
    auc, mrr, ndcg5, ndcg10 = compute_scores(
        model, params, corpus, mode, result_file=out
    )
    if cfg.dataset == "MIND-large" and mode == "test":
        # leaderboard submission artifact (reference main.py:47-51)
        import zipfile

        zip_path = os.path.join(os.path.dirname(out), "prediction.zip")
        with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as z:
            z.write(out, "prediction.txt")
        print(f"[test] wrote leaderboard submission {zip_path} "
              f"({time.time() - t0:.1f}s)")
        return
    print(f"[{mode}] epoch {epoch}: AUC={auc:.4f} MRR={mrr:.4f} "
          f"nDCG@5={ndcg5:.4f} nDCG@10={ndcg10:.4f} "
          f"({time.time() - t0:.1f}s)")


def apply_runtime_config(cfg: Config) -> None:
    import jax

    if cfg.rng_impl and cfg.rng_impl != "threefry":
        jax.config.update("jax_default_prng_impl", cfg.rng_impl)
    if cfg.compilation_cache_dir:
        # persistent across processes: repeat train/dev/test invocations
        # skip the remote TPU compile of unchanged programs
        jax.config.update("jax_compilation_cache_dir",
                          cfg.compilation_cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main(argv=None) -> None:
    cfg = Config.from_args(argv)
    # multi-host bootstrap before any device use (reference config.py:89);
    # no-op when single-process with no coordinator configured
    from digat_tpu.parallel import mesh as mesh_lib

    mesh_lib.initialize_distributed(
        coordinator_address=cfg.coordinator_address or None,
        num_processes=cfg.num_processes or None,
        process_id=cfg.process_id if cfg.process_id >= 0 else None,
    )
    apply_runtime_config(cfg)
    if cfg.mode == "train":
        run_train(cfg)
    else:
        run_eval(cfg, cfg.mode)


if __name__ == "__main__":
    main(sys.argv[1:])
