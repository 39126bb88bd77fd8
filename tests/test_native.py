"""Native C++ loader vs the pure-Python reference implementations."""

import numpy as np
import pytest

from digat_tpu.data import sag

native = pytest.importorskip("digat_tpu.native")
if not native.available():  # toolchain missing
    pytest.skip("native toolchain unavailable", allow_module_level=True)


def similarity_to_flat(similarity, news_id_dict):
    """Convert the {news_id: [(nbr_id, cos)]} dict into index form."""
    inv = sorted(news_id_dict.items(), key=lambda kv: kv[1])
    idx, cos, off = [], [], [0]
    for news_id, _ in inv:
        for nbr, c in similarity[news_id]:
            idx.append(news_id_dict[nbr])
            cos.append(c)
        off.append(len(idx))
    return (
        np.asarray(idx, np.int32),
        np.asarray(cos, np.float32),
        np.asarray(off, np.int64),
    )


def test_expand_graph_matches_python():
    rng = np.random.default_rng(0)
    n = 40
    news_id_dict = {"<PAD>": 0, **{f"N{i}": i for i in range(1, n)}}
    inv = {v: k for k, v in news_id_dict.items()}
    top_m, hops = 4, 2
    similarity = {"<PAD>": []}
    for i in range(1, n):
        nbrs = rng.choice(np.arange(1, n), size=top_m, replace=False)
        cos = np.sort(rng.random(top_m).astype(np.float32))[::-1]
        similarity[inv[i]] = [(inv[j], float(c)) for j, c in zip(nbrs, cos)]
    node_num = 1 + top_m + top_m * (top_m - 1)

    ref = sag.expand_graph(similarity, news_id_dict, top_m, hops, node_num)
    flat = similarity_to_flat(similarity, news_id_dict)
    got = native.expand_graph_native(
        *flat, top_m, hops, node_num, sag.SIMILARITY_THRESHOLD
    )
    for a, b in zip(ref, got):
        np.testing.assert_array_equal(a, b)


def test_parse_behaviors_matches_python(tmp_path):
    news_dict = {"<PAD>": 0, "N1": 1, "N2": 2, "N3": 3, "N44": 4}
    path = str(tmp_path / "behaviors.tsv")
    lines = [
        "1\tU1\ttime\tN1 N2\tN3-1 N44-0 N1-0",
        "2\tU2\ttime\t\tN2-1 N3-0",  # empty history
        "3\tU3\ttime\tN44\tN1 N2",  # unlabeled (MIND-large test style)
    ]
    with open(path, "w") as f:
        f.write("\r\n".join(lines) + "\n")  # CRLF robustness
    out = native.parse_behaviors_native(path, news_dict)
    assert out["history_offsets"].tolist() == [0, 2, 2, 3]
    assert out["history_flat"].tolist() == [1, 2, 4]
    assert out["clicks_flat"].tolist() == [3, 2]
    assert out["clicks_offsets"].tolist() == [0, 1, 2, 2]
    assert out["nonclicks_flat"].tolist() == [4, 1, 3]
    assert out["cand_flat"].tolist() == [3, 4, 1, 2, 3, 1, 2]
    assert out["label_flat"].tolist() == [1, 0, 0, 1, 0, -1, -1]
    assert out["cand_offsets"].tolist() == [0, 3, 5, 7]


def test_parse_behaviors_scales(tmp_path):
    """Smoke a larger file and cross-check totals."""
    rng = np.random.default_rng(1)
    news_dict = {"<PAD>": 0, **{f"N{i}": i for i in range(1, 500)}}
    ids = list(news_dict)[1:]
    path = str(tmp_path / "behaviors.tsv")
    n_rows = 2000
    with open(path, "w") as f:
        for r in range(n_rows):
            hist = " ".join(rng.choice(ids, rng.integers(0, 10), replace=False))
            imps = " ".join(
                f"{x}-{rng.integers(0, 2)}"
                for x in rng.choice(ids, rng.integers(1, 8), replace=False)
            )
            f.write(f"{r}\tU{r}\tt\t{hist}\t{imps}\n")
    out = native.parse_behaviors_native(path, news_dict)
    assert len(out["cand_offsets"]) == n_rows + 1
    assert (out["label_flat"] >= 0).all()
    assert out["cand_offsets"][-1] == len(out["cand_flat"])
    assert (
        len(out["clicks_flat"]) + len(out["nonclicks_flat"])
        == len(out["cand_flat"])
    )


def test_parse_glove_matches_python(tmp_path):
    """Native multithreaded GloVe parser == the pure-Python loop, including
    the exactly-(dim+1)-fields skip rule, rstrip, duplicate-word overwrite,
    unicode words, and exact float32 values."""
    from digat_tpu.data.tokenize import _load_glove_txt_py
    from digat_tpu.native.bindings import parse_glove_native

    dim = 4
    rng = np.random.default_rng(7)
    lines = []
    for i in range(500):
        vec = rng.standard_normal(dim)
        lines.append(f"w{i} " + " ".join("%.6g" % x for x in vec))
    lines.append("café -1.5 2e-3 0.25 3")          # unicode word
    lines.append("w3 9 8 7 6")                      # duplicate word -> last wins
    lines.append("short 1.0 2.0")                   # too few fields -> skipped
    lines.append("long 1 2 3 4 5")                  # too many fields -> skipped
    lines.append("trail 1 2 3 4   ")                # rstrip then accept
    lines.append("")                                # empty line -> skipped
    lines.append(". . . 1 2 3 4")                   # token w/ spaces -> skipped
    path = tmp_path / "glove.txt"
    path.write_text("\n".join(lines) + "\n", encoding="utf-8")

    stoi_py, vecs_py = _load_glove_txt_py(str(path), dim)
    stoi_nat, vecs_nat = parse_glove_native(str(path), dim)
    assert stoi_nat == stoi_py
    assert vecs_nat.dtype == vecs_py.dtype == np.float32
    assert np.array_equal(vecs_nat, vecs_py)
    assert "short" not in stoi_nat and "long" not in stoi_nat
    assert stoi_nat["trail"] is not None and "café" in stoi_nat
    assert np.array_equal(vecs_nat[stoi_nat["w3"]], [9, 8, 7, 6])


def test_parse_glove_overflow_and_underflow(tmp_path):
    """Out-of-range literals match numpy semantics: 1e999 -> +/-inf,
    1e-999 -> 0 (ADVICE round-3: native silently dropped them)."""
    from digat_tpu.data.tokenize import _load_glove_txt_py
    from digat_tpu.native.bindings import parse_glove_native

    dim = 2
    path = tmp_path / "glove.txt"
    path.write_text(
        "big 1e999 -1e999\n"
        "tiny 1e-999 -1e-999\n"
        "ok 1.5 -2.5\n",
        encoding="utf-8",
    )
    stoi_py, vecs_py = _load_glove_txt_py(str(path), dim)
    stoi_nat, vecs_nat = parse_glove_native(str(path), dim)
    assert stoi_nat == stoi_py
    assert np.array_equal(vecs_nat, vecs_py)
    assert np.isposinf(vecs_nat[stoi_nat["big"]][0])
    assert np.isneginf(vecs_nat[stoi_nat["big"]][1])
    assert vecs_nat[stoi_nat["tiny"]][0] == 0.0


def test_load_glove_empty_file_raises(tmp_path):
    """Zero parsed rows must be a loud error, not a (0, dim) matrix that
    propagates NaN mean/std through build_word_embedding."""
    from digat_tpu.data.tokenize import load_glove_txt

    empty = tmp_path / "empty.txt"
    empty.write_text("", encoding="utf-8")
    with pytest.raises(ValueError, match="no valid GloVe rows"):
        load_glove_txt(str(empty), 4)
    malformed = tmp_path / "malformed.txt"
    malformed.write_text("a 1 2\nb 3\n", encoding="utf-8")  # all wrong arity
    with pytest.raises(ValueError, match="no valid GloVe rows"):
        load_glove_txt(str(malformed), 4)


def test_native_parse_error_is_exception_not_assert(tmp_path):
    """Failure signalling survives `python -O`: a dedicated exception,
    which load_glove_txt turns into the Python path's real error."""
    from digat_tpu.data.tokenize import load_glove_txt
    from digat_tpu.native.bindings import NativeParseError, parse_glove_native

    missing = str(tmp_path / "does_not_exist.txt")
    with pytest.raises(NativeParseError):
        parse_glove_native(missing, 4)
    with pytest.raises(FileNotFoundError):
        load_glove_txt(missing, 4)
