"""Training orchestration.

Epoch loop with the reference's training protocol (trainer.py:71-188):
per-epoch negative re-sampling, shuffled batches, late lr/10 decay,
listwise loss, per-epoch dev scoring, best-checkpoint selection by the
configured criterion with early stopping after `early_stopping_epoch` stale
epochs — plus the fixes the TPU/multi-host world demands:

  * the early-stop decision is computed from metrics on process 0 and
    broadcast, never a main-rank-only `break` (the reference's DDP deadlock
    hazard, trainer.py:171-172);
  * checkpoints carry params AND optimizer state + epoch, so runs resume
    (the reference saves model weights only, trainer.py:170);
  * batches prefetch on a host thread straight into sharded device memory.

Run layout: <run_root>/<dataset>/<model_name>/#<run>/ holding config.json,
checkpoints, per-epoch rank files and a dev log; plus the flat
results/<dataset>/<model>/#N-dev files the aggregation tooling consumes."""

from __future__ import annotations

import json
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from digat_tpu.config import Config
from digat_tpu.data import batching, sampling
from digat_tpu.data.corpus import Corpus
from digat_tpu.eval import metrics as M
from digat_tpu.eval.scorer import compute_scores
from digat_tpu.models.model import Model
from digat_tpu.parallel import mesh as mesh_lib
from digat_tpu.train import checkpoint as ckpt_lib
from digat_tpu.train.optimizer import lr_at_epoch, make_optimizer
from digat_tpu.train.train_step import make_shardmap_train_step, make_train_step
from digat_tpu.utils import profiling


def get_run_index(results_dir: str) -> int:
    """Monotonic #N allocation by scanning existing result files
    (util.py:88-97)."""
    os.makedirs(results_dir, exist_ok=True)
    max_index = 0
    for name in os.listdir(results_dir):
        name = name.strip()
        if name.startswith("#") and name.endswith("-dev"):
            try:
                max_index = max(max_index, int(name[1:-4]))
            except ValueError:
                pass
    open(os.path.join(results_dir, f"#{max_index + 1}-dev"), "w").close()
    return max_index + 1


class Trainer:
    def __init__(self, model: Model, config: Config, corpus: Corpus,
                 mesh=None, verbose: bool = True):
        self.model = model
        self.config = config
        self.corpus = corpus
        self.mesh = mesh if mesh is not None else mesh_lib.make_mesh(
            config.mesh_data, config.mesh_model
        )
        self.verbose = verbose
        self.process_index = jax.process_index()
        self.is_main = self.process_index == 0

        self.results_dir = os.path.join(
            config.run_root, "results", config.dataset, model.model_name
        )
        if self.is_main:
            self.run_index = get_run_index(self.results_dir)
            config.run_index = self.run_index
            self.run_dir = os.path.join(
                config.run_root, config.dataset, model.model_name,
                f"#{self.run_index}",
            )
            os.makedirs(self.run_dir, exist_ok=True)
            with open(os.path.join(self.run_dir, "config.json"), "w") as f:
                f.write(config.to_json())
        else:
            self.run_index = 0
            self.run_dir = ""

        self.tx = None
        self.history = []

    # ------------------------------------------------------------------
    def _log(self, *args):
        if self.verbose and self.is_main:
            print(*args, flush=True)

    def _criterion_value(self, auc, mrr, ndcg5, ndcg10) -> float:
        c = self.config.dev_criterion
        return {
            "auc": auc, "mrr": mrr, "ndcg5": ndcg5, "ndcg10": ndcg10,
            "avg": M.avg_metric(auc, mrr, ndcg5, ndcg10),
        }[c]

    # ------------------------------------------------------------------
    def train(self, init_params=None):
        cfg = self.config
        corpus = self.corpus
        model = self.model
        mesh = self.mesh

        params = init_params
        if params is None:
            params = model.init(
                jax.random.PRNGKey(cfg.seed), word_embedding=corpus.word_embedding
            )
        self.tx = make_optimizer(cfg.weight_decay, cfg.gradient_clip_norm, params)
        opt_state = self.tx.init(params)
        start_epoch = 1
        if cfg.resume:
            params, opt_state, done_epoch = ckpt_lib.load(
                cfg.resume, params, opt_state
            )
            start_epoch = done_epoch + 1
            self._log(f"[resume] {cfg.resume} -> continuing at epoch {start_epoch}")

        # place state on the mesh (replicated / embedding-row-sharded)
        p_sh = mesh_lib.param_shardings(mesh, params, cfg.mesh_model > 1)
        params = jax.device_put(params, p_sh)
        opt_state = jax.device_put(opt_state, mesh_lib.replicated(mesh))
        raw_tables = (
            corpus.nrms_tables()
            if getattr(model, "family", "digat") == "nrms"
            else corpus.tables()
        )
        tables = jax.device_put(raw_tables, mesh_lib.replicated(mesh))
        # multi-device pure-DP runs step through an explicit shard_map so
        # the Pallas kernels partition along `data` (under plain jit the
        # SPMD partitioner would replicate the custom calls); the TP
        # (mesh_model>1) path keeps jit propagation, whose collectives are
        # emitted around the XLA-expressed ops
        data_parallel = (
            mesh.shape[mesh_lib.DATA_AXIS] > 1 and cfg.mesh_model == 1
        )
        if data_parallel:
            step_fn = make_shardmap_train_step(model, self.tx, mesh)
        else:
            step_fn = make_train_step(model, self.tx)

        rng = np.random.default_rng(cfg.seed)
        best = -1.0
        best_epoch = 0
        stale = 0
        shard_count = jax.process_count()
        shard_index = self.process_index
        split = corpus.splits["train"]

        # unique-title dedup (digat family only; see DedupTrainBatch).
        # Under multi-device DP the dedup is PER SHARD (ShardedDedupBatch):
        # each device gets its own batch-local unique-title table inside
        # shard_map, so the encode-once win and the sorted embedding
        # gradient survive scale-out with no cross-shard title exchange.
        dedup = 0
        dp_shards = 0
        if (
            getattr(model, "family", "digat") == "digat"
            and cfg.dedup_titles != 0
        ):
            dedup_rows = cfg.batch_size
            if data_parallel:
                dp_shards = jax.local_device_count() // max(cfg.mesh_model, 1)
                if dp_shards < 1 or cfg.batch_size % dp_shards:
                    dp_shards = 0  # indivisible batch: plain DP batches
                else:
                    dedup_rows = cfg.batch_size // dp_shards
            if not data_parallel or dp_shards:
                if cfg.dedup_titles > 0:
                    dedup = cfg.dedup_titles
                else:  # auto-size from a sample of batches
                    probe_negatives = sampling.sample_negatives(
                        corpus.train_neg_flat, corpus.train_neg_offsets,
                        cfg.negative_sample_num, np.random.default_rng(cfg.seed),
                    )
                    dedup = batching.estimate_dedup_capacity(
                        split.history_idx, corpus.train_behavior_row,
                        corpus.train_pos, probe_negatives, corpus.news_node_id,
                        dedup_rows, seed=cfg.seed,
                    )
                    self._log(
                        f"[dedup] unique-title capacity = {dedup}"
                        + (f" per shard x{dp_shards}" if dp_shards else "")
                    )
        # sorted embedding-grad kernel: TPU-only (CPU falls back to scatter
        # in the custom VJP anyway; skip the host-side sort work there)
        from digat_tpu.ops.pallas.runtime import pallas_available

        sorted_emb = (
            cfg.sorted_emb_grad and dedup > 0 and pallas_available()
        )

        for epoch in range(start_epoch, cfg.epoch + 1):
            t0 = time.time()
            negatives = sampling.sample_negatives(
                corpus.train_neg_flat, corpus.train_neg_offsets,
                cfg.negative_sample_num,
                np.random.default_rng(cfg.seed * 1_000_003 + epoch),
            )
            lr = lr_at_epoch(cfg.lr, epoch, cfg.lr_decay_epoch)
            in_iter_dedup = dedup if not dp_shards else 0
            it = batching.train_batches(
                split.history_idx, split.cat_idx, corpus.train_behavior_row,
                corpus.train_pos, negatives, cfg.batch_size,
                epoch_seed=cfg.seed * 7_000_003 + epoch,
                shard_index=shard_index, shard_count=shard_count,
                news_node_id=corpus.news_node_id if in_iter_dedup else None,
                dedup_titles=in_iter_dedup,
                news_title_text=(
                    corpus.news_title_text
                    if in_iter_dedup and sorted_emb else None
                ),
                vocab_size=(
                    cfg.vocabulary_size if in_iter_dedup and sorted_emb else 0
                ),
            )
            if dp_shards and dedup:
                # per-shard dedup happens in the prefetch thread, overlapped
                # with the device step; overflowing batches fall back plain
                def put(b):
                    sb = batching.dedup_shards(
                        b, corpus.news_node_id, dedup, dp_shards,
                        news_title_text=(
                            corpus.news_title_text if sorted_emb else None
                        ),
                        vocab_size=cfg.vocabulary_size if sorted_emb else 0,
                    )
                    return mesh_lib.shard_batch_arrays(
                        mesh, b if sb is None else sb
                    )
            else:
                put = lambda b: mesh_lib.shard_batch_arrays(mesh, b)
            losses = []
            nsteps = 0
            timer = profiling.StepTimer(warmup=2)
            profile_span = (10, 20) if (cfg.profile_dir and epoch == 1) else None
            for batch in batching.Prefetcher(it, depth=3, transform=put):
                if profile_span and nsteps == profile_span[0]:
                    jax.profiler.start_trace(cfg.profile_dir)
                with timer.step():
                    step_rng = jax.random.fold_in(
                        jax.random.PRNGKey(cfg.seed), epoch * 1_000_000 + nsteps
                    )
                    params, opt_state, loss = step_fn(
                        params, opt_state, tables, batch, step_rng,
                        jnp.float32(lr),
                    )
                losses.append(loss)
                nsteps += 1
                if profile_span and nsteps == profile_span[1]:
                    jax.profiler.stop_trace()
                    profile_span = None
            if profile_span and nsteps > profile_span[0]:
                jax.profiler.stop_trace()
            epoch_loss = float(jnp.mean(jnp.stack(losses))) if losses else 0.0
            wall = time.time() - t0
            # wall-derived rate: on remote-attached TPUs dispatches return
            # before the device finishes, so the per-step dispatch timer
            # overstates throughput wildly (measured 11k "samples/s" on an
            # epoch whose wall time implies 351). The epoch loss readback
            # above has synced the device, making wall the honest number.
            rate = (
                f"{nsteps * cfg.batch_size / wall:,.0f} samples/s"
                if nsteps and wall > 0 else "n/a"
            )
            self._log(
                f"Epoch {epoch}: train done | loss={epoch_loss:.4f} "
                f"| steps={nsteps} | {wall:.1f}s | lr={lr:g} "
                f"| {rate}"
            )

            # ---- dev scoring (every process scores; cheap eval sharding
            # lands in eval/scorer via shard args when multi-host) ----
            rank_file = (
                os.path.join(self.run_dir, f"dev-epoch{epoch}.txt")
                if self.is_main else None
            )
            auc, mrr, ndcg5, ndcg10 = compute_scores(
                model, params, corpus, "dev", result_file=rank_file
            )
            self.history.append(
                {"epoch": epoch, "loss": epoch_loss, "auc": auc, "mrr": mrr,
                 "ndcg5": ndcg5, "ndcg10": ndcg10}
            )
            self._log(
                f"Epoch {epoch}: dev AUC={auc:.4f} MRR={mrr:.4f} "
                f"nDCG@5={ndcg5:.4f} nDCG@10={ndcg10:.4f}"
            )

            crit = self._criterion_value(auc, mrr, ndcg5, ndcg10)
            improved = crit >= best
            if improved:
                best = crit
                best_epoch = epoch
                stale = 0
                if self.is_main:
                    with open(
                        os.path.join(self.results_dir, f"#{self.run_index}-dev"),
                        "w",
                    ) as f:
                        f.write(
                            f"#{self.run_index}\t{auc}\t{mrr}\t{ndcg5}\t{ndcg10}\n"
                        )
                    ckpt_lib.save(
                        os.path.join(self.run_dir, "best.ckpt"),
                        params, opt_state, epoch,
                    )
            else:
                stale += 1
            # broadcast the stop decision across hosts (fixes the
            # reference's main-rank-only break)
            stop = stale > cfg.early_stopping_epoch
            if jax.process_count() > 1:
                from jax.experimental import multihost_utils

                stop = bool(
                    multihost_utils.broadcast_one_to_all(np.asarray(stop))
                )
            if stop:
                self._log(f"Early stop at epoch {epoch} (best {best_epoch})")
                break

        if self.is_main:
            with open(os.path.join(self.run_dir, "dev_log.txt"), "w") as f:
                f.write("Epoch\tAUC\tMRR\tnDCG@5\tnDCG@10\n")
                for h in self.history:
                    f.write(
                        "%d\t%.4f\t%.4f\t%.4f\t%.4f\n"
                        % (h["epoch"], h["auc"], h["mrr"], h["ndcg5"], h["ndcg10"])
                    )
                f.write(f"Best dev epoch : {best_epoch}\n")
        self.best_epoch = best_epoch
        return params, opt_state
