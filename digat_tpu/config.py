"""Experiment configuration.

Mirrors every flag of the reference CLI (reference: config.py:14-54) with the
same names, defaults and per-dataset overrides, plus TPU-specific knobs
(mesh shape, compute dtype, Pallas on/off). Unlike the reference's
side-effectful argparse class, this is a plain dataclass: constructing a
Config performs no IO, no device setup and no seeding, so configs are cheap
to build in tests and safe to ship across processes.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
from typing import Optional

NEWS_ENCODERS = ("MSA", "CNN")
GRAPH_ENCODERS = (
    "DIGAT",
    "wo_SA",
    "Seq_SA",
    "wo_interaction",
    "news_graph_wo_inter",
    "user_graph_wo_inter",
)
DEV_CRITERIA = ("auc", "mrr", "ndcg5", "ndcg10", "avg")


def news_graph_size(sag_neighbors: int, sag_hops: int) -> int:
    """Number of nodes in a SAG news graph.

    Hop 0 contributes M neighbors, each deeper hop branches into M-1 new
    nodes (the BFS stops one early at depth>0; reference: config.py:68-75).
    """
    size = 1
    frontier = 1
    for hop in range(sag_hops):
        frontier *= sag_neighbors if hop == 0 else (sag_neighbors - 1)
        size += frontier
    return size


@dataclasses.dataclass
class Config:
    # General
    mode: str = "train"  # train | dev | test
    news_encoder: str = "MSA"
    graph_encoder: str = "DIGAT"
    dev_model_path: str = ""
    test_model_path: str = ""
    test_output_file: str = ""
    seed: int = 0
    # Dataset
    dataset: str = "MIND-small"  # MIND-small | MIND-large | synthetic
    data_root: str = "data"
    word_threshold: int = 3
    max_title_length: int = 32
    # Training
    negative_sample_num: int = 4
    max_history_num: int = 50
    epoch: int = 16
    # >0: wins over the forced per-dataset epoch count (harness escape;
    # see __post_init__). 0 = reference protocol.
    epoch_override: int = 0
    batch_size: int = 64
    lr: float = 1e-4
    weight_decay: float = 0.0
    gradient_clip_norm: float = 1.0
    # Dev
    dev_criterion: str = "avg"
    early_stopping_epoch: int = 5
    # Model
    word_embedding_dim: int = 300
    cnn_method: str = "naive"  # naive | group3 | group5
    cnn_kernel_num: int = 400
    cnn_window_size: int = 3
    MSA_head_num: int = 16
    MSA_head_dim: int = 25
    attention_dim: int = 256
    dropout_rate: float = 0.2
    graph_depth: int = 3
    # SAG
    SAG_hops: int = 2
    SAG_neighbors: int = 5
    # Real-data quality path (reference: construct_SAG.py:97-99 uses a frozen
    # all-mpnet-base-v2 SentenceTransformer for SAG mining; MIND_corpus.py:89-108
    # initializes word embeddings from GloVe). Empty glove_path / 'hash'
    # embedder fall back to deterministic hash embeddings (hermetic CI mode).
    glove_path: str = ""  # GloVe .txt (word + floats per line); '' = pseudo-GloVe
    sag_embedder: str = "hash"  # hash | sentence_transformer | jax_mpnet
    sag_embedder_model: str = "sentence-transformers/all-mpnet-base-v2"
    # Model family: 'digat' (main experiment) or 'nrms' (Appendix-B SA
    # strategy on a sequence model)
    model_family: str = "digat"
    nrms_model: str = "NRMS-SA"  # NRMS-SA | NRMS
    nrms_head_num: int = 20
    nrms_head_dim: int = 20
    nrms_attention_dim: int = 200
    augmented_news_num: int = 10
    # Populated from the corpus at load time
    vocabulary_size: int = 0
    category_num: int = 0
    user_num: int = 0
    # TPU / runtime
    compute_dtype: str = "float32"  # float32 | bfloat16 (matmul inputs)
    use_pallas: bool = True  # fused Eq.(8) kernel on TPU
    mesh_data: int = 0  # 0 = all available devices on the data axis
    mesh_model: int = 1  # model axis size (embedding row-sharding)
    # Multi-host bootstrap (reference: dist.init_process_group,
    # config.py:89). Empty/zero/-1 = auto-detect (TPU pod env vars) or
    # single-process.
    coordinator_address: str = ""
    num_processes: int = 0
    process_id: int = -1
    eval_batch_size: int = 0  # 0 = batch_size * 16 (reference: trainer.py:114)
    run_root: str = "runs"
    run_index: int = 0
    profile_dir: str = ""  # jax.profiler trace output (empty = off)
    # Unique-title batch dedup capacity: -1 auto-size, 0 off, >0 fixed.
    # Each unique news in a training batch is encoded once and gathered.
    dedup_titles: int = -1
    # Sorted word-embedding gradient (Pallas row-sum kernel instead of the
    # XLA scatter-add). Needs the dedup path; auto-disabled off-TPU.
    sorted_emb_grad: bool = True
    resume: str = ""  # checkpoint path to resume training from
    # PRNG implementation for dropout streams: 'rbg' uses the TPU hardware
    # generator (fast); 'threefry' is JAX's default counter-based PRNG.
    rng_impl: str = "rbg"
    # Persistent XLA compilation cache directory. Repeat CLI invocations
    # reuse compiled programs instead of paying the remote TPU compile
    # (~24 s for the eval stage-1 program through the tunnel; measured in
    # bench.py as stage1_first_s). Empty = disabled.
    compilation_cache_dir: str = ""

    def __post_init__(self) -> None:
        # Per-dataset protocol overrides, forced exactly like the
        # reference's parse_argument (config.py:62-67): MIND-small trains
        # 16 epochs at dropout 0.2, MIND-large 7 at 0.1, regardless of the
        # --epoch flag. `epoch_override` (no reference counterpart) is the
        # explicit escape for harnesses that need a different budget (the
        # parity study trains both frameworks for the same reduced count).
        if self.dataset == "MIND-small":
            self.dropout_rate = 0.2
            self.epoch = 16
        elif self.dataset == "MIND-large":
            self.dropout_rate = 0.1
            self.epoch = 7
        if self.epoch_override > 0:
            self.epoch = self.epoch_override

    # ----- derived quantities -----
    @property
    def news_graph_size(self) -> int:
        return news_graph_size(self.SAG_neighbors, self.SAG_hops)

    @property
    def user_graph_size(self) -> int:
        return self.max_history_num + self.category_num

    @property
    def news_embedding_dim(self) -> int:
        if self.news_encoder == "CNN":
            return self.cnn_kernel_num
        return self.MSA_head_num * self.MSA_head_dim

    @property
    def model_name(self) -> str:
        return f"{self.news_encoder}-{self.graph_encoder}"

    @property
    def lr_decay_epoch(self) -> int:
        """Epoch at which lr is divided by 10 (reference: trainer.py:32,81)."""
        return self.epoch - ((self.epoch - 1) // 10 + 1) + 1

    def effective_eval_batch_size(self) -> int:
        return self.eval_batch_size or self.batch_size * 16

    def validate(self) -> "Config":
        assert self.news_encoder in NEWS_ENCODERS, self.news_encoder
        assert self.graph_encoder in GRAPH_ENCODERS, self.graph_encoder
        assert self.dev_criterion in DEV_CRITERIA, self.dev_criterion
        assert self.cnn_method in ("naive", "group3", "group5"), self.cnn_method
        if self.cnn_method == "group3":
            assert self.cnn_kernel_num % 3 == 0
        if self.cnn_method == "group5":
            assert self.cnn_kernel_num % 5 == 0
        assert self.compute_dtype in ("float32", "bfloat16")
        assert self.sag_embedder in ("hash", "sentence_transformer", "jax_mpnet"), self.sag_embedder
        assert self.model_family in ("digat", "nrms")
        assert self.nrms_model in ("NRMS-SA", "NRMS")
        return self

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2, sort_keys=True)

    @classmethod
    def from_args(cls, argv: Optional[list] = None) -> "Config":
        parser = argparse.ArgumentParser(description="digat_tpu experiments")
        for field in dataclasses.fields(cls):
            kind = field.type if isinstance(field.type, type) else None
            default = field.default
            if isinstance(default, bool):
                parser.add_argument(
                    f"--{field.name}",
                    type=lambda s: s.lower() in ("1", "true", "yes"),
                    default=default,
                )
            elif isinstance(default, (int, float, str)):
                parser.add_argument(
                    f"--{field.name}", type=type(default), default=default
                )
            del kind
        ns = parser.parse_args(argv)
        return cls(**vars(ns)).validate()
