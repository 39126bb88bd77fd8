"""Child process: the two previously-unmeasured preprocessing stages at
reference-real magnitude (VERDICT round-2 missing #2 / weak #5):

  * `load_glove_txt` over a GloVe-840B-shaped file (2.2M lines x 300 dims,
    ~4.6 GB — reference MIND_corpus.py:89-108 feeds the real 5.3 GB file
    through torchtext);
  * `construct_sag` over a MIND-large-shaped news corpus (~104k news,
    18 categories with a realistically skewed size distribution, hash
    embedder — reference construct_SAG.py:126-162 runs per-category
    all-pairs cosine top-k on GPU).

Prints one JSON line of timings + peak RSS. Run via test_scale.py.
"""

from __future__ import annotations

import json
import os
import resource
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rss_gb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def glove_leg(tmp: str, lines: int = 2_200_000, dim: int = 300):
    from digat_tpu.data.tokenize import load_glove_txt

    path = os.path.join(tmp, "glove_big.txt")
    t0 = time.time()
    rng = np.random.default_rng(0)
    with open(path, "w", encoding="utf-8") as f:
        buf = []
        for i in range(lines):
            vec = rng.standard_normal(dim)
            buf.append("w%d " % i + " ".join("%.3f" % x for x in vec))
            if len(buf) == 2000:
                f.write("\n".join(buf) + "\n")
                buf.clear()
        if buf:
            f.write("\n".join(buf) + "\n")
    gen_s = time.time() - t0
    size_gb = os.path.getsize(path) / 1e9

    t0 = time.time()
    stoi, vecs = load_glove_txt(path, dim)
    parse_s = time.time() - t0
    assert len(stoi) == lines and vecs.shape == (lines, dim)
    os.remove(path)
    return {"glove_gen_s": round(gen_s, 1), "glove_size_gb": round(size_gb, 2),
            "glove_parse_s": round(parse_s, 1)}


def sag_leg(news_total: int = 104_000, categories: int = 18,
            top_m: int = 5, hops: int = 2):
    from digat_tpu.data import sag as sag_mod
    from digat_tpu.config import news_graph_size

    rng = np.random.default_rng(1)
    # realistic skew: a few huge categories (MIND-large 'news'/'sports')
    # dominate the all-pairs similarity cost
    weights = np.array([2.0 ** (-0.35 * c) for c in range(categories)])
    sizes = np.maximum((weights / weights.sum() * news_total).astype(int), 50)
    vocab = [f"tok{i}" for i in range(30_000)]
    news_dict = {"<PAD>": 0}
    rows_by_cat = {}
    for c in range(categories):
        rows = []
        for i in range(sizes[c]):
            nid = f"N{c}_{i}"
            news_dict[nid] = len(news_dict)
            words = rng.integers(0, len(vocab), rng.integers(5, 14))
            title = " ".join(vocab[w] for w in words)
            abstract = title if rng.random() < 0.8 else ""
            domain = "train_dev" if rng.random() < 0.9 else "test"
            rows.append((domain, nid, title, abstract))
        rows_by_cat[f"cat{c}"] = rows
    node_num = news_graph_size(top_m, hops)

    t0 = time.time()
    node_id, graph, mask = sag_mod.construct_sag(
        rows_by_cat, news_dict, top_m, hops, node_num,
        embedder=sag_mod.get_embedder("hash", ""),
        exclude_test_from_corpus=True, seed=0,
    )
    sag_s = time.time() - t0
    assert node_id.shape == (len(news_dict), node_num)
    assert graph.shape == (len(news_dict), node_num, node_num)
    return {"sag_news": len(news_dict), "sag_biggest_cat": int(sizes.max()),
            "sag_s": round(sag_s, 1)}


def main():
    import tempfile

    # the SAG top-k stage runs through jax; force CPU (the axon TPU plugin
    # pins jax_platforms programmatically — see tests/conftest.py)
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")

    stats = {}
    with tempfile.TemporaryDirectory() as tmp:
        stats.update(glove_leg(tmp))
    stats["rss_after_glove_gb"] = round(rss_gb(), 2)
    stats.update(sag_leg())
    stats["peak_rss_gb"] = round(rss_gb(), 2)
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
