"""ctypes bindings + on-demand build of the native loader library."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Dict, List, Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "loader.cpp")
_LIB = os.path.join(_DIR, "_native.so")
_lock = threading.Lock()


class NativeParseError(RuntimeError):
    """Native loader failed (library unavailable or parse error).

    A dedicated exception (not `assert`) so failure handling survives
    `python -O`: callers with a pure-Python fallback catch this; callers
    without one propagate a loud error instead of consuming zero-filled
    buffers."""

_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    cmd = [
        "g++", "-O2", "-std=c++17", "-pthread", "-shared", "-fPIC",
        "-o", _LIB, _SRC,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        fresh = os.path.exists(_LIB) and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC)
        if not fresh and not _build():
            _build_failed = True
            return None
        lib = ctypes.CDLL(_LIB)
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        i8p = np.ctypeslib.ndpointer(np.int8, flags="C_CONTIGUOUS")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        lib.expand_graph.argtypes = [
            i32p, f32p, i64p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_float, i32p, u8p, u8p,
        ]
        lib.parse_behaviors.restype = ctypes.c_void_p
        lib.parse_behaviors.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
        ]
        lib.behaviors_sizes.argtypes = [ctypes.c_void_p, i64p]
        lib.behaviors_fill.argtypes = [
            ctypes.c_void_p, i32p, i64p, i32p, i64p, i32p, i64p, i32p, i8p, i64p,
        ]
        lib.behaviors_free.argtypes = [ctypes.c_void_p]
        lib.parse_glove.restype = ctypes.c_void_p
        lib.parse_glove.argtypes = [ctypes.c_char_p, ctypes.c_int32]
        lib.glove_sizes.argtypes = [ctypes.c_void_p, i64p]
        lib.glove_fill.argtypes = [ctypes.c_void_p, u8p, f32p]
        lib.glove_free.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def expand_graph_native(
    similarity_flat_idx: np.ndarray,  # [total] int32 neighbor news indices
    similarity_flat_cos: np.ndarray,  # [total] float32
    offsets: np.ndarray,  # [news_num + 1] int64
    top_m: int,
    hops: int,
    node_num: int,
    threshold: float,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Native BFS expansion; same contract as data.sag.expand_graph but over
    index-form neighbor lists."""
    lib = _load()
    if lib is None:
        raise NativeParseError("native library unavailable")
    news_num = len(offsets) - 1
    node_id = np.zeros((news_num, node_num), np.int32)
    graph = np.zeros((news_num, node_num, node_num), np.uint8)
    mask = np.zeros((news_num, node_num), np.uint8)
    lib.expand_graph(
        np.ascontiguousarray(similarity_flat_idx, np.int32),
        np.ascontiguousarray(similarity_flat_cos, np.float32),
        np.ascontiguousarray(offsets, np.int64),
        news_num, top_m, hops, node_num, threshold,
        node_id, graph, mask,
    )
    return node_id, graph.astype(bool), mask.astype(bool)


def parse_glove_native(path: str, dim: int) -> Tuple[Dict[str, int], np.ndarray]:
    """Multithreaded native parse of a GloVe text file; same contract as
    data.tokenize.load_glove_txt (stoi keeps the LAST index of a duplicate
    word, matching the Python dict-overwrite behavior)."""
    lib = _load()
    if lib is None:
        raise NativeParseError("native library unavailable")
    handle = lib.parse_glove(path.encode("utf-8"), dim)
    try:
        sizes = np.zeros(3, np.int64)
        lib.glove_sizes(handle, sizes)
        rows, word_bytes, ok = (int(x) for x in sizes)
        if not ok:
            raise NativeParseError(f"native glove parse failed for {path}")
        words_buf = np.zeros(word_bytes, np.uint8)
        vecs = np.zeros((rows, dim), np.float32)
        lib.glove_fill(handle, words_buf, vecs)
    finally:
        lib.glove_free(handle)
    words = words_buf.tobytes().decode("utf-8").split("\n")[:-1] if word_bytes else []
    stoi = {w: i for i, w in enumerate(words)}
    return stoi, vecs


def parse_behaviors_native(path: str, news_dict: Dict[str, int]):
    """Parse behaviors.tsv natively. Returns a dict of ragged arrays:
    history/clicks/nonclicks/cand (+labels) as (flat, offsets) pairs.
    Keys are matched exactly; unknown ids are dropped (never present in
    well-formed MIND data)."""
    lib = _load()
    if lib is None:
        raise NativeParseError("native library unavailable")
    items = sorted(news_dict.items(), key=lambda kv: kv[1])
    keys = "\n".join(k for k, _ in items).encode("utf-8")
    handle = lib.parse_behaviors(
        path.encode("utf-8"), keys, len(keys), len(items)
    )
    try:
        sizes = np.zeros(6, np.int64)
        lib.behaviors_sizes(handle, sizes)
        rows, n_hist, n_clk, n_nclk, n_cand, ok = (int(x) for x in sizes)
        if not ok:
            raise NativeParseError(f"native parse failed for {path}")
        out = {
            "history_flat": np.zeros(n_hist, np.int32),
            "history_offsets": np.zeros(rows + 1, np.int64),
            "clicks_flat": np.zeros(n_clk, np.int32),
            "clicks_offsets": np.zeros(rows + 1, np.int64),
            "nonclicks_flat": np.zeros(n_nclk, np.int32),
            "nonclicks_offsets": np.zeros(rows + 1, np.int64),
            "cand_flat": np.zeros(n_cand, np.int32),
            "label_flat": np.zeros(n_cand, np.int8),
            "cand_offsets": np.zeros(rows + 1, np.int64),
        }
        lib.behaviors_fill(
            handle, out["history_flat"], out["history_offsets"],
            out["clicks_flat"], out["clicks_offsets"], out["nonclicks_flat"],
            out["nonclicks_offsets"], out["cand_flat"], out["label_flat"],
            out["cand_offsets"],
        )
        return out
    finally:
        lib.behaviors_free(handle)
