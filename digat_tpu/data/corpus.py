"""MIND corpus preprocessing and runtime store.

Offline stage (`preprocess`) turns raw MIND TSVs into versioned npz/json
artifacts; the runtime `Corpus` mmap-loads them and exposes device tables.
Mirrors the reference's artifacts (MIND_corpus.py:23-186) with two
deliberate redesigns for TPU/multi-host scale:

  * behaviors are stored as *index* arrays (history ids + per-slot category
    ids); the [rows, Gu, Gu] user-graph adjacency is never materialized —
    it is reconstructed on device (data/user_graph.py);
  * train negatives are stored as a ragged (flat, offsets) pair consumed by
    the vectorized per-epoch sampler (data/sampling.py).

Artifact cache keys include every config knob that shapes them, so sweeps
over SAG geometry reuse what they can, like the reference's file-name
keying (MIND_corpus.py:25-32).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import numpy as np

from digat_tpu.config import Config
from digat_tpu.data import sag as sag_mod
from digat_tpu.data import tokenize as tok

SPLITS = ("train", "dev", "test")


def _paths(cfg: Config) -> Dict[str, str]:
    cache = os.path.join(cfg.data_root, f"{cfg.dataset}-cache")
    key_vocab = f"{cfg.word_threshold}-{cfg.max_title_length}"
    key_emb = f"{cfg.word_threshold}-{cfg.word_embedding_dim}-{cfg.max_title_length}"
    if cfg.glove_path:
        key_emb += "-glove"
    key_graph = f"{cfg.SAG_hops}-{cfg.SAG_neighbors}"
    # embedder choice shapes the mined similarities, so it keys the graph
    # artifacts (hash mode keeps the round-1 names for cache continuity)
    key_embed = "" if cfg.sag_embedder == "hash" else f"-{cfg.sag_embedder}"
    return {
        "cache": cache,
        "dicts": os.path.join(cache, "dicts.json"),
        "vocab": os.path.join(cache, f"vocabulary-{key_vocab}.json"),
        "embedding": os.path.join(cache, f"word_embedding-{key_emb}.npy"),
        "news": os.path.join(cache, f"news-{key_vocab}.npz"),
        "graph": os.path.join(cache, f"news_graph-{key_graph}{key_embed}.npz"),
        "behaviors": os.path.join(cache, f"behaviors-{cfg.max_history_num}.npz"),
        "augmented": os.path.join(
            cache, f"augmented_news-{cfg.augmented_news_num}{key_embed}.npz"
        ),
    }


def _read_news_tsv(path: str):
    with open(path, "r", encoding="utf-8") as f:
        for line in f:
            if not line.strip():
                continue
            parts = line.split("\t")
            news_id, category, sub_category, title, abstract = parts[:5]
            yield news_id, category, sub_category, title, abstract


def _read_behaviors_tsv(path: str):
    with open(path, "r", encoding="utf-8") as f:
        for line in f:
            if not line.strip():
                continue
            imp_id, user_id, time, history, impressions = line.split("\t")
            yield imp_id, user_id, history.strip(), impressions.strip()


def preprocess(cfg: Config, glove_path: Optional[str] = None, verbose: bool = False):
    """Build every cached artifact that is missing. Idempotent and
    resumable: each artifact is existence-checked independently, like the
    reference's crashed-preprocess resume story."""
    p = _paths(cfg)
    os.makedirs(p["cache"], exist_ok=True)
    roots = {s: os.path.join(cfg.data_root, cfg.dataset, s) for s in SPLITS}

    # ---- 1. dictionaries (user/news/category/subCategory) ----
    if not os.path.exists(p["dicts"]):
        user_dict: Dict[str, int] = {"<UNK>": 0}
        news_dict: Dict[str, int] = {"<PAD>": 0}
        cat_dict: Dict[str, int] = {}
        subcat_dict: Dict[str, int] = {}
        for _, user_id, _, _ in _read_behaviors_tsv(
            os.path.join(roots["train"], "behaviors.tsv")
        ):
            if user_id not in user_dict:
                user_dict[user_id] = len(user_dict)
        for split in SPLITS:
            for news_id, cat, subcat, _, _ in _read_news_tsv(
                os.path.join(roots[split], "news.tsv")
            ):
                if news_id not in news_dict:
                    news_dict[news_id] = len(news_dict)
                    if cat not in cat_dict:
                        cat_dict[cat] = len(cat_dict)
                    if subcat not in subcat_dict:
                        subcat_dict[subcat] = len(subcat_dict)
        with open(p["dicts"], "w", encoding="utf-8") as f:
            json.dump(
                {"user": user_dict, "news": news_dict, "category": cat_dict,
                 "subCategory": subcat_dict}, f,
            )
    with open(p["dicts"], "r", encoding="utf-8") as f:
        dicts = json.load(f)
    news_dict, cat_dict = dicts["news"], dicts["category"]

    # ---- 2. vocabulary ----
    if not os.path.exists(p["vocab"]):
        def streams():
            seen = set()
            for i, split in enumerate(SPLITS):
                titles = []
                for news_id, _, _, title, _ in _read_news_tsv(
                    os.path.join(roots[split], "news.tsv")
                ):
                    if news_id not in seen:
                        seen.add(news_id)
                        titles.append(title)
                yield i, titles

        vocab = tok.build_vocabulary(streams(), cfg.word_threshold)
        with open(p["vocab"], "w", encoding="utf-8") as f:
            json.dump(vocab, f)
    with open(p["vocab"], "r", encoding="utf-8") as f:
        vocab = json.load(f)

    # ---- 3. word embedding ----
    if not os.path.exists(p["embedding"]):
        emb = tok.build_word_embedding(
            vocab, cfg.word_embedding_dim, glove_path or cfg.glove_path or None,
            seed=cfg.seed,
        )
        np.save(p["embedding"], emb)

    # ---- 4. tokenized titles + per-news category ----
    if not os.path.exists(p["news"]):
        n = len(news_dict)
        title_text = np.zeros((n, cfg.max_title_length), np.int32)
        title_mask = np.zeros((n, cfg.max_title_length), bool)
        news_category = np.zeros((n,), np.int16)
        seen = set()
        for split in SPLITS:
            for news_id, cat, _, title, _ in _read_news_tsv(
                os.path.join(roots[split], "news.tsv")
            ):
                if news_id in seen:
                    continue
                seen.add(news_id)
                idx = news_dict[news_id]
                title_text[idx], title_mask[idx] = tok.encode_title(
                    title, vocab, cfg.max_title_length
                )
                news_category[idx] = cat_dict[cat]
        np.savez_compressed(
            p["news"], title_text=title_text, title_mask=title_mask,
            news_category=news_category,
        )

    # ---- 5. SAG news graph ----
    if not os.path.exists(p["graph"]):
        rows_by_cat: Dict[str, List[Tuple[str, str, str, str]]] = {
            c: [] for c in cat_dict
        }
        seen = set()
        for i, split in enumerate(SPLITS):
            domain = "train_dev" if i < 2 else "test"
            for news_id, cat, _, title, abstract in _read_news_tsv(
                os.path.join(roots[split], "news.tsv")
            ):
                if news_id not in seen:
                    seen.add(news_id)
                    rows_by_cat[cat].append((domain, news_id, title, abstract))
        node_id, graph, mask = sag_mod.construct_sag(
            rows_by_cat, news_dict, cfg.SAG_neighbors, cfg.SAG_hops,
            cfg.news_graph_size,
            embedder=sag_mod.get_embedder(cfg.sag_embedder, cfg.sag_embedder_model),
            exclude_test_from_corpus=cfg.dataset != "MIND-large",
            seed=cfg.seed,
        )
        # self-loops added at artifact build (reference adds them at load,
        # MIND_corpus.py:117-118; same result, done once here)
        graph |= np.eye(cfg.news_graph_size, dtype=bool)[None]
        np.savez_compressed(
            p["graph"], news_node_id=node_id, news_graph=graph,
            news_graph_mask=mask,
        )

    # ---- 5b. SA news sequence (NRMS family; Appendix-B strategy) ----
    if cfg.model_family == "nrms" and not os.path.exists(p["augmented"]):
        rows_by_cat = {c: [] for c in cat_dict}
        seen = set()
        for i, split in enumerate(SPLITS):
            domain = "train_dev" if i < 2 else "test"
            for news_id, cat, _, title, abstract in _read_news_tsv(
                os.path.join(roots[split], "news.tsv")
            ):
                if news_id not in seen:
                    seen.add(news_id)
                    rows_by_cat[cat].append((domain, news_id, title, abstract))
        aug = sag_mod.construct_sa_sequence(
            rows_by_cat, news_dict, cfg.augmented_news_num,
            embedder=sag_mod.get_embedder(cfg.sag_embedder, cfg.sag_embedder_model),
            exclude_test_from_corpus=cfg.dataset != "MIND-large",
            seed=cfg.seed,
        )
        np.savez_compressed(p["augmented"], augmented_news=aug)

    # ---- 6. behaviors (compact index encoding) ----
    if not os.path.exists(p["behaviors"]):
        news_category = np.load(p["news"])["news_category"]
        out: Dict[str, np.ndarray] = {}
        for split in SPLITS:
            ragged = _parse_behaviors(
                os.path.join(roots[split], "behaviors.tsv"), news_dict
            )
            out.update(_assemble_split(cfg, split, ragged, news_category,
                                       len(cat_dict)))
        np.savez_compressed(p["behaviors"], **out)
    if verbose:
        print(f"[corpus] artifacts ready under {p['cache']}")


def _parse_behaviors(path: str, news_dict: Dict[str, int]) -> Dict[str, np.ndarray]:
    """behaviors.tsv -> ragged (flat, offsets) arrays. Native C++ parser
    when the toolchain is available (digat_tpu/native), else pure Python
    with the identical contract."""
    try:
        from digat_tpu import native

        if native.available():
            return native.parse_behaviors_native(path, news_dict)
    except ImportError:
        pass
    out = {
        "history_flat": [], "history_offsets": [0],
        "clicks_flat": [], "clicks_offsets": [0],
        "nonclicks_flat": [], "nonclicks_offsets": [0],
        "cand_flat": [], "label_flat": [], "cand_offsets": [0],
    }
    for _, _, history, impressions in _read_behaviors_tsv(path):
        if history:
            out["history_flat"].extend(news_dict[x] for x in history.split(" "))
        out["history_offsets"].append(len(out["history_flat"]))
        for imp in impressions.split(" "):
            if imp.endswith("-1"):
                idx, label = news_dict[imp[:-2]], 1
                out["clicks_flat"].append(idx)
            elif imp.endswith("-0"):
                idx, label = news_dict[imp[:-2]], 0
                out["nonclicks_flat"].append(idx)
            else:  # unlabeled (MIND-large test)
                idx, label = news_dict[imp], -1
            out["cand_flat"].append(idx)
            out["label_flat"].append(label)
        out["cand_offsets"].append(len(out["cand_flat"]))
        out["clicks_offsets"].append(len(out["clicks_flat"]))
        out["nonclicks_offsets"].append(len(out["nonclicks_flat"]))
    dtypes = {"label_flat": np.int8}
    return {
        k: np.asarray(v, dtypes.get(k, np.int64 if "offsets" in k else np.int32))
        for k, v in out.items()
    }


def _assemble_split(
    cfg: Config, split: str, ragged: Dict[str, np.ndarray],
    news_category: np.ndarray, category_num: int,
) -> Dict[str, np.ndarray]:
    """Vectorized assembly of the per-split artifacts from ragged arrays:
    tail-truncated padded histories + per-slot categories, and either
    per-positive train samples or per-item eval rows."""
    H, C = cfg.max_history_num, category_num
    h_off = ragged["history_offsets"]
    rows = len(h_off) - 1
    lengths = np.diff(h_off)
    take = np.minimum(lengths, H)
    starts = h_off[1:] - take  # tail truncation (MIND_corpus.py:282)
    slot = np.arange(H)[None, :]
    valid = slot < take[:, None]
    gather = np.minimum(starts[:, None] + slot, len(ragged["history_flat"]) - 1)
    history_idx = np.where(
        valid, ragged["history_flat"][gather] if len(ragged["history_flat"]) else 0, 0
    ).astype(np.int32)
    cat_idx = np.where(
        valid, news_category[history_idx], C
    ).astype(np.int16)
    out = {
        f"{split}_history_idx": history_idx,
        f"{split}_cat_idx": cat_idx,
    }
    if split == "train":
        clicks_per_row = np.diff(ragged["clicks_offsets"])
        nonclicks_per_row = np.diff(ragged["nonclicks_offsets"])
        out["train_pos"] = ragged["clicks_flat"].astype(np.int32)
        out["train_behavior_row"] = np.repeat(
            np.arange(rows, dtype=np.int32), clicks_per_row
        )
        # per-sample negative pool = the row's non-clicks (duplicated per
        # positive, matching the reference's per-sample lists)
        n_samples = len(out["train_pos"])
        sample_rows = out["train_behavior_row"]
        sizes = nonclicks_per_row[sample_rows]
        neg_off = np.zeros(n_samples + 1, np.int64)
        np.cumsum(sizes, out=neg_off[1:])
        row_start = ragged["nonclicks_offsets"][:-1]
        flat_idx = (
            np.repeat(row_start[sample_rows], sizes)
            + _ragged_arange(sizes)
        )
        out["train_neg_flat"] = ragged["nonclicks_flat"][flat_idx].astype(np.int32)
        out["train_neg_offsets"] = neg_off
    else:
        items_per_row = np.diff(ragged["cand_offsets"])
        out[f"{split}_cand"] = ragged["cand_flat"].astype(np.int32)
        out[f"{split}_imp_index"] = np.repeat(
            np.arange(rows, dtype=np.int32), items_per_row
        )
        # unlabeled sentinel preserved BEFORE the clamp: a genuinely
        # unlabeled split (MIND-large test) must be distinguishable from a
        # labeled split that happens to contain zero positives
        out[f"{split}_unlabeled"] = np.any(ragged["label_flat"] < 0)
        out[f"{split}_labels"] = np.maximum(
            ragged["label_flat"], 0
        ).astype(np.int8)  # unlabeled -> 0, as the reference treats them
    return out


def _ragged_arange(sizes: np.ndarray) -> np.ndarray:
    """[0..s0-1, 0..s1-1, ...] for a vector of segment sizes."""
    total = int(sizes.sum())
    ids = np.arange(total)
    seg_starts = np.repeat(np.cumsum(sizes) - sizes, sizes)
    return ids - seg_starts


@dataclass
class Split:
    history_idx: np.ndarray  # [rows, H]
    cat_idx: np.ndarray  # [rows, H]


class Corpus:
    """Runtime store: loads cached artifacts, exposes device tables."""

    def __init__(self, cfg: Config):
        p = _paths(cfg)
        with open(p["dicts"], "r", encoding="utf-8") as f:
            dicts = json.load(f)
        with open(p["vocab"], "r", encoding="utf-8") as f:
            self.vocab = json.load(f)
        cfg.vocabulary_size = len(self.vocab)
        cfg.category_num = len(dicts["category"])
        cfg.user_num = len(dicts["user"])
        self.news_dict = dicts["news"]
        self.news_num = len(self.news_dict)

        news = np.load(p["news"])
        self.news_title_text = news["title_text"]
        self.news_title_mask = news["title_mask"]
        self.news_category = news["news_category"]
        self.word_embedding = np.load(p["embedding"])

        graph = np.load(p["graph"])
        self.news_node_id = graph["news_node_id"]
        self.news_graph = graph["news_graph"]
        self.news_graph_mask = graph["news_graph_mask"].copy()
        # the candidate's own slot never joins the global attention
        # (reference mutates this at load: MIND_corpus.py:210)
        self.news_graph_mask[:, 0] = 0

        self.augmented_news = None
        if os.path.exists(p["augmented"]):
            self.augmented_news = np.load(p["augmented"])["augmented_news"]

        b = np.load(p["behaviors"])
        self.splits = {
            s: Split(b[f"{s}_history_idx"], b[f"{s}_cat_idx"]) for s in SPLITS
        }
        self.train_pos = b["train_pos"]
        self.train_neg_flat = b["train_neg_flat"]
        self.train_neg_offsets = b["train_neg_offsets"]
        self.train_behavior_row = b["train_behavior_row"]
        for s in ("dev", "test"):
            setattr(self, f"{s}_cand", b[f"{s}_cand"])
            setattr(self, f"{s}_imp_index", b[f"{s}_imp_index"])
            setattr(self, f"{s}_labels", b[f"{s}_labels"])
            # pre-round-5 caches lack the sentinel flag; fall back to the
            # old all-zero-labels inference for them
            setattr(
                self, f"{s}_unlabeled",
                bool(b[f"{s}_unlabeled"]) if f"{s}_unlabeled" in b
                else b[f"{s}_labels"].sum() == 0,
            )
        self.cfg = cfg

    # -- device tables -----------------------------------------------------
    # memoized: re-uploading the [news_num, Gn, Gn] graph + title tables on
    # every eval call costs ~0.4 s on a remote-attached chip
    def tables(self):
        import jax.numpy as jnp

        from digat_tpu.models.model import CorpusTables

        if getattr(self, "_tables", None) is None:
            self._tables = CorpusTables(
                news_title_text=jnp.asarray(self.news_title_text),
                news_title_mask=jnp.asarray(self.news_title_mask),
                news_node_id=jnp.asarray(self.news_node_id),
                news_graph=jnp.asarray(self.news_graph),
                news_graph_mask=jnp.asarray(self.news_graph_mask),
            )
        return self._tables

    def nrms_tables(self):
        import jax.numpy as jnp

        from digat_tpu.models.nrms import NRMSTables

        assert self.augmented_news is not None, (
            "augmented-news artifact missing; preprocess with "
            "model_family='nrms'"
        )
        if getattr(self, "_nrms_tables", None) is None:
            self._nrms_tables = NRMSTables(
                news_title_text=jnp.asarray(self.news_title_text),
                news_title_mask=jnp.asarray(self.news_title_mask),
                augmented_news=jnp.asarray(self.augmented_news),
            )
        return self._nrms_tables

    def num_train_samples(self) -> int:
        return len(self.train_pos)


def _smoke(argv=None) -> None:
    """Data-pipeline smoke test: corpus stats + one batch of shapes per
    loader (equivalent of the reference's MIND_dataset __main__ block,
    MIND_dataset.py:123-188)."""
    from digat_tpu.cli import prepare
    from digat_tpu.config import Config
    from digat_tpu.data import batching, sampling

    cfg = Config.from_args(argv)
    corpus = prepare(cfg)
    print(f"news_num: {corpus.news_num}")
    print(f"vocabulary: {cfg.vocabulary_size}  categories: {cfg.category_num}"
          f"  users: {cfg.user_num}")
    print(f"train samples: {corpus.num_train_samples()}  "
          f"dev items: {len(corpus.dev_cand)}  test items: {len(corpus.test_cand)}")
    negatives = sampling.sample_negatives(
        corpus.train_neg_flat, corpus.train_neg_offsets,
        cfg.negative_sample_num, np.random.default_rng(0),
    )
    split = corpus.splits["train"]
    batch = next(iter(batching.train_batches(
        split.history_idx, split.cat_idx, corpus.train_behavior_row,
        corpus.train_pos, negatives, cfg.batch_size, epoch_seed=0,
        news_node_id=corpus.news_node_id,
        dedup_titles=0 if cfg.dedup_titles == 0 else 2048,
    )))
    for name, arr in batch._asdict().items():
        print(f"train batch {name}: {arr.shape} {arr.dtype}")
    ebatch, valid = next(iter(batching.eval_batches(
        corpus.splits["dev"].history_idx, corpus.splits["dev"].cat_idx,
        corpus.dev_imp_index, corpus.dev_cand, cfg.batch_size,
    )))
    for name, arr in ebatch._asdict().items():
        print(f"dev batch {name}: {arr.shape} {arr.dtype} (valid={valid})")


if __name__ == "__main__":
    _smoke()
