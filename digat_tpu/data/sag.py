"""Semantic-augmented news graph (SAG) construction.

Re-implements the reference's offline SAG pipeline (construct_SAG.py) with a
TPU-native similarity stage: instead of a per-row GPU cosine loop
(construct_SAG.py:142-162), all four channel similarities (title-title,
content-content, title-content, content-title) are computed as batched
normalized matmuls + top-k on the accelerator in one shot per category.

Pipeline per category (semantics preserved):
  1. dedup news by title; empty-text fallbacks (title<->content swaps,
     construct_SAG.py:36-44); duplicated contents get title-prefixed
     (construct_SAG.py:68-76);
  2. embed titles and contents (pluggable embedder; `hash` mode builds
     deterministic bag-of-token vectors so CI needs no pretrained model);
  3. average the four cosine channels, take top-(M+1) against the *corpus*
     side (train+dev only on MIND-small: test-only news can have inbound
     but not outbound corpus membership, construct_SAG.py:32-33);
  4. per-news neighbor list: walk the top list, skip any group containing
     the news itself, keep the group's first ID, stop at M
     (construct_SAG.py:304-320); empty news get M random neighbors with
     cos 0 (construct_SAG.py:386-400).

Only the `average` channel feeds the graph in the reference (aggregate,
construct_SAG.py:429-435); the four per-channel neighbor lists it also
writes are dead artifacts and are deliberately not persisted here.

Graph expansion (`expand_graph`) replicates the BFS rules exactly
(construct_SAG.py:449-485): hop 0 takes all M neighbors unconditionally;
deeper hops stop at cos < 0.5 or after M-1 neighbors; revisited nodes gain
edges without re-enqueueing.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Dict, List, Sequence, Tuple

import numpy as np

SIMILARITY_THRESHOLD = 0.5  # construct_SAG.py:10


# ---------------------------------------------------------------------------
# Embedders
# ---------------------------------------------------------------------------


def hash_embedder(texts: Sequence[str], dim: int = 128) -> np.ndarray:
    """Deterministic bag-of-token embeddings: each token hashes to a fixed
    pseudo-random vector; a text embeds as the normalized token sum. Texts
    sharing vocabulary land close in cosine space, giving the SAG genuine
    structure without a pretrained model."""
    out = np.zeros((len(texts), dim), np.float32)
    cache: Dict[str, np.ndarray] = {}
    for i, text in enumerate(texts):
        acc = np.zeros(dim, np.float32)
        for tok in text.lower().split():
            v = cache.get(tok)
            if v is None:
                h = hashlib.blake2b(tok.encode("utf-8"), digest_size=8).digest()
                rng = np.random.default_rng(int.from_bytes(h, "little"))
                v = rng.standard_normal(dim).astype(np.float32)
                cache[tok] = v
            acc += v
        n = np.linalg.norm(acc)
        out[i] = acc / n if n > 0 else acc
    return out


DEFAULT_ST_MODEL = "sentence-transformers/all-mpnet-base-v2"


def sentence_transformer_embedder(model_name: str = DEFAULT_ST_MODEL):
    """Returns an embedder backed by a pretrained sentence encoder (the
    reference's frozen PLM, construct_SAG.py:97-99); only importable when
    the optional dependency is present."""
    from sentence_transformers import SentenceTransformer

    model = SentenceTransformer(model_name)

    def embed(texts: Sequence[str], dim: int = 0) -> np.ndarray:
        return np.asarray(model.encode(list(texts)))

    return embed


def get_embedder(name: str, model_name: str = DEFAULT_ST_MODEL):
    """Embedder dispatch for the config knob ``sag_embedder``.

    'hash' is the hermetic CI mode; 'sentence_transformer' reproduces the
    reference's PLM mining through the torch package; 'jax_mpnet' runs the
    same frozen MPNet re-hosted in JAX on the default backend (TPU) — torch
    is used only to deserialize the checkpoint (digat_tpu/plm/mpnet.py,
    parity-tested against the HF model). Raises ImportError with a clear
    message when the optional dependency is missing rather than silently
    degrading quality."""
    if name == "hash":
        return hash_embedder
    if name == "sentence_transformer":
        try:
            return sentence_transformer_embedder(model_name)
        except ImportError as e:
            raise ImportError(
                f"sag_embedder='sentence_transformer' needs the "
                f"sentence-transformers package (model {model_name}); "
                f"install it or use sag_embedder='hash'"
            ) from e
    if name == "jax_mpnet":
        from digat_tpu.plm.mpnet import jax_mpnet_embedder

        return jax_mpnet_embedder(model_name)
    raise ValueError(f"unknown sag_embedder {name!r}")


# ---------------------------------------------------------------------------
# Per-category similarity mining
# ---------------------------------------------------------------------------


def dedup_category_news(
    rows: Sequence[Tuple[str, str, str, str]],
) -> Tuple[Dict[str, int], Dict[int, List[str]], List[str], List[str], List[str]]:
    """`rows`: (domain, news_ID, title, content) for one category, in file
    order. Returns (news->group, group->news list, titles, contents,
    empty_news_IDs). Replicates construct_SAG.py:13-76."""
    title_of: Dict[str, str] = {}
    content_of: Dict[str, str] = {}
    by_title: Dict[str, List[str]] = {}
    empty: List[str] = []
    seen = set()
    for _, news_id, title, content in rows:
        if news_id in seen:
            continue
        seen.add(news_id)
        title = title.lower().replace("é", "e")
        content = content.lower().replace("é", "e")
        if title == "" and content != "":
            title = content
        elif title != "" and content == "":
            content = title
        elif title == "" and content == "":
            empty.append(news_id)
            continue
        title_of[news_id] = title
        content_of[news_id] = content
        by_title.setdefault(title, []).append(news_id)

    news_to_group: Dict[str, int] = {}
    group_news: Dict[int, List[str]] = {}
    titles: List[str] = []
    contents: List[str] = []
    for i, title in enumerate(by_title):
        titles.append(title)
        group_news[i] = []
        chosen = ""
        for news_id in by_title[title]:
            c = content_of[news_id]
            if c != "" and chosen == "":
                chosen = c
            news_to_group[news_id] = i
            group_news[i].append(news_id)
        contents.append(chosen if chosen else title)
    # duplicated contents get disambiguated with a title prefix
    from collections import Counter

    dup = {c for c, n in Counter(contents).items() if n > 1}
    for i in range(len(contents)):
        if contents[i] in dup:
            contents[i] = titles[i] + " " + contents[i]
    return news_to_group, group_news, titles, contents, empty


def average_topk(
    full_title_emb: np.ndarray,
    full_content_emb: np.ndarray,
    corpus_title_emb: np.ndarray,
    corpus_content_emb: np.ndarray,
    top_m: int,
    batch: int = 2048,
) -> Tuple[np.ndarray, np.ndarray]:
    """Average of the four cosine channels, top-(M+1) per full-side row
    against the corpus side. Batched matmuls; runs on whatever backend JAX
    selected (TPU in production, CPU in tests)."""
    import jax
    import jax.numpy as jnp

    def norm(x):
        n = np.linalg.norm(x, axis=1, keepdims=True)
        return (x / np.maximum(n, 1e-12)).astype(np.float32)

    ft, fc = norm(full_title_emb), norm(full_content_emb)
    ct, cc = norm(corpus_title_emb), norm(corpus_content_emb)
    k = min(top_m + 1, ct.shape[0])

    @jax.jit
    def chunk_topk(ft_b, fc_b):
        sims = (ft_b @ ct.T + fc_b @ cc.T + ft_b @ cc.T + fc_b @ ct.T) / 4.0
        return jax.lax.top_k(sims, k)

    vals, idxs = [], []
    for s in range(0, ft.shape[0], batch):
        v, i = chunk_topk(ft[s : s + batch], fc[s : s + batch])
        vals.append(np.asarray(v))
        idxs.append(np.asarray(i))
    return np.concatenate(vals), np.concatenate(idxs)


def neighbor_lists(
    full_group_news: Dict[int, List[str]],
    corpus_group_news: Dict[int, List[str]],
    top_vals: np.ndarray,
    top_idx: np.ndarray,
    top_m: int,
    empty_news: Sequence[str],
    category_news_ids: Sequence[str],
    rng: np.random.Generator,
) -> Dict[str, List[Tuple[str, float]]]:
    """Per-news neighbor lists from the top-k of its dedup group."""
    result: Dict[str, List[Tuple[str, float]]] = {}
    m = min(top_m, max(len(corpus_group_news) - 1, 0))
    for gi, members in full_group_news.items():
        vals, idx = top_vals[gi], top_idx[gi]
        for news_id in members:
            lst: List[Tuple[str, float]] = []
            for j in range(len(idx)):
                group = corpus_group_news[int(idx[j])]
                if news_id in group:
                    continue
                lst.append((group[0], float(vals[j])))
                if len(lst) == m:
                    break
            result[news_id] = lst
    cand = list(category_news_ids)
    for news_id in empty_news:
        picks = rng.choice(len(cand), size=min(m + 1, len(cand)), replace=False)
        lst = []
        for p in picks:
            if cand[p] != news_id:
                lst.append((cand[p], 0.0))
                if len(lst) == m:
                    break
        result[news_id] = lst
    return result


# ---------------------------------------------------------------------------
# BFS graph expansion (construct_SAG.py:449-485)
# ---------------------------------------------------------------------------


def expand_graph(
    similarity: Dict[str, List[Tuple[str, float]]],
    news_id_dict: Dict[str, int],
    top_m: int,
    hops: int,
    node_num: int,
    use_native: bool = True,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-news BFS expansion to `hops` with the 0.5-threshold pruning.

    Returns (news_node_ID [N, G] int32, news_graph [N, G, G] bool,
    news_graph_mask [N, G] bool). Row 0 (the <PAD> news) stays empty.
    Self-loops are NOT added here (the corpus loader adds them, matching
    MIND_corpus.py:117-118).

    Dispatches to the native C++ BFS (digat_tpu/native) when available;
    this Python body is the reference implementation and fallback."""
    try:
        from digat_tpu import native

        if use_native and native.available():
            inv_order = sorted(news_id_dict.items(), key=lambda kv: kv[1])
            idx, cos, off = [], [], [0]
            for news_id, _ in inv_order:
                for nbr, c in similarity[news_id]:
                    idx.append(news_id_dict[nbr])
                    cos.append(c)
                off.append(len(idx))
            return native.expand_graph_native(
                np.asarray(idx, np.int32), np.asarray(cos, np.float32),
                np.asarray(off, np.int64), top_m, hops, node_num,
                SIMILARITY_THRESHOLD,
            )
    except ImportError:
        pass
    news_num = len(news_id_dict)
    inv = {v: k for k, v in news_id_dict.items()}
    node_id = np.zeros((news_num, node_num), np.int32)
    graph = np.zeros((news_num, node_num, node_num), bool)
    mask = np.zeros((news_num, node_num), bool)
    mask[:, 0] = 1
    for i in range(1, news_num):
        node_id[i, 0] = i
        pos = {i: 0}
        depths = [0] * node_num
        head, rear = 0, 1
        while head < rear:
            if depths[head] == hops:
                head += 1
                continue
            nbrs = similarity[inv[node_id[i, head]]]
            for index, (nbr_id, cos) in enumerate(nbrs):
                if depths[head] > 0 and (
                    cos < SIMILARITY_THRESHOLD or index == top_m - 1
                ):
                    break
                j = news_id_dict[nbr_id]
                if j not in pos:
                    node_id[i, rear] = j
                    mask[i, rear] = 1
                    pos[j] = rear
                    graph[i, head, rear] = True
                    graph[i, rear, head] = True
                    depths[rear] = depths[head] + 1
                    rear += 1
                else:
                    p = pos[j]
                    graph[i, head, p] = True
                    graph[i, p, head] = True
            head += 1
    return node_id, graph, mask


def visualize_graph(
    path: str,
    news_index: int,
    node_id: np.ndarray,
    graph: np.ndarray,
    titles: Dict[int, str],
) -> None:
    """Human-readable dump of one news graph: edge list with titles plus the
    adjacency matrix (the reference's debugging helper,
    construct_SAG.py:488-512)."""
    n = node_id.shape[1]
    with open(path, "w", encoding="utf-8") as f:
        f.write("Node1\tNode2\tTitle1\tTitle2\n")
        for i in range(n):
            for j in range(n):
                if graph[news_index, i, j]:
                    t1 = titles.get(int(node_id[news_index, i]), "")
                    t2 = titles.get(int(node_id[news_index, j]), "")
                    f.write(f"{i}\t{j}\t{t1}\t{t2}\n")
        f.write("\nnews graph\n")
        for i in range(n):
            f.write("\t".join(str(int(graph[news_index, i, j])) for j in range(n)))
            f.write("\n")


# ---------------------------------------------------------------------------
# End-to-end driver
# ---------------------------------------------------------------------------


def mine_similarity(
    news_rows_by_category: Dict[str, List[Tuple[str, str, str, str]]],
    news_id_dict: Dict[str, int],
    top_m: int,
    embedder: Callable[[Sequence[str]], np.ndarray] = hash_embedder,
    exclude_test_from_corpus: bool = True,
    seed: int = 0,
) -> Dict[str, List[Tuple[str, float]]]:
    """Per-news top-M neighbor lists across all categories (the 'average'
    channel aggregate, construct_SAG.py:425-446).

    `news_rows_by_category`: per category, rows (domain, news_ID, title,
    content) where domain is 'train_dev' or 'test'. The corpus (neighbor
    candidate) side excludes test-domain news when
    `exclude_test_from_corpus` (MIND-small semantics)."""
    rng = np.random.default_rng(seed)
    similarity: Dict[str, List[Tuple[str, float]]] = {}
    for category, rows in news_rows_by_category.items():
        if not rows:
            continue
        corpus_rows = (
            [r for r in rows if r[0] != "test"] if exclude_test_from_corpus else rows
        )
        if not corpus_rows:
            continue
        _, full_groups, f_titles, f_contents, f_empty = dedup_category_news(rows)
        _, corp_groups, c_titles, c_contents, _ = dedup_category_news(corpus_rows)
        if not c_titles:
            continue
        if f_titles:
            vals, idx = average_topk(
                embedder(f_titles), embedder(f_contents),
                embedder(c_titles), embedder(c_contents), top_m,
            )
        else:
            vals = np.zeros((0, 1), np.float32)
            idx = np.zeros((0, 1), np.int64)
        cat_ids = [r[1] for r in rows]
        similarity.update(
            neighbor_lists(
                full_groups, corp_groups, vals, idx, top_m, f_empty, cat_ids, rng
            )
        )
    for news_id in news_id_dict:
        similarity.setdefault(news_id, [])
    return similarity


def construct_sag(
    news_rows_by_category: Dict[str, List[Tuple[str, str, str, str]]],
    news_id_dict: Dict[str, int],
    top_m: int,
    hops: int,
    node_num: int,
    embedder: Callable[[Sequence[str]], np.ndarray] = hash_embedder,
    exclude_test_from_corpus: bool = True,
    seed: int = 0,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Build the per-news SAG graphs for the whole corpus."""
    similarity = mine_similarity(
        news_rows_by_category, news_id_dict, top_m, embedder,
        exclude_test_from_corpus, seed,
    )
    return expand_graph(similarity, news_id_dict, top_m, hops, node_num)


def construct_sa_sequence(
    news_rows_by_category: Dict[str, List[Tuple[str, str, str, str]]],
    news_id_dict: Dict[str, int],
    top_m: int,
    embedder: Callable[[Sequence[str]], np.ndarray] = hash_embedder,
    exclude_test_from_corpus: bool = True,
    seed: int = 0,
) -> np.ndarray:
    """Flat semantic-augmentation matrix [news_num, top_m] int32 of neighbor
    news ids (0-padded) — the Appendix-B SA strategy artifact (no BFS,
    Appendix-B/MIND_corpus.py:110-121)."""
    similarity = mine_similarity(
        news_rows_by_category, news_id_dict, top_m, embedder,
        exclude_test_from_corpus, seed,
    )
    out = np.zeros((len(news_id_dict), top_m), np.int32)
    for news_id, idx in news_id_dict.items():
        if idx == 0:
            continue
        for j, (nbr, _) in enumerate(similarity[news_id][:top_m]):
            out[idx, j] = news_id_dict[nbr]
    return out
