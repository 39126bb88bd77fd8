"""MIND-large scale hardening (VERDICT round-1 item 6).

Runs the scale-sensitive preprocessing + scoring stages at MIND-large
magnitude (~2M behavior rows, ~24M eval items) in a subprocess and bounds
wall-clock and peak RSS. The reference at this scale materializes
[rows, 68, 68] bool user-graph pickles (~9+ GB RAM for adjacency alone,
MIND_corpus.py:146) and scores impressions in a Python loop; this pipeline
must stay flat-array + vectorized.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest


@pytest.mark.slow
def test_mind_large_scale_preprocess_and_scoring():
    env = dict(os.environ)
    env.setdefault("JAX_PLATFORMS", "cpu")
    proc = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "scale_child.py")],
        capture_output=True, text=True, timeout=1800, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    stats = json.loads(proc.stdout.strip().splitlines()[-1])
    print(f"scale stats: {stats}")

    assert stats["rows"] == 2_000_000
    assert stats["items"] > 20_000_000
    # random scores -> AUC ~= 0.5 sanity-checks the flat scorer at scale
    assert abs(stats["auc_random"] - 0.5) < 0.01
    # wall-clock bounds (4-core CI machine; measured: parse 22s via the
    # native C++ parser, assemble 54s+16s, truth 14s, score 14s for 23M
    # items — ~3x headroom against machine noise)
    assert stats["parse_s"] < 120, stats
    assert stats["assemble_train_s"] + stats["assemble_dev_s"] < 240, stats
    assert stats["truth_s"] < 60, stats
    assert stats["score_s"] < 60, stats
    # peak RSS: compact encodings must stay far under the reference's
    # materialized-adjacency blow-up (~9 GB adjacency + pickle overhead)
    assert stats["peak_rss_gb"] < 12.0, stats


@pytest.mark.slow
def test_glove_and_sag_at_reference_magnitude():
    """The two preprocessing stages the reference feeds its largest single
    artifacts through: GloVe-840B-shaped parsing (2.2M lines x 300d,
    MIND_corpus.py:89-108) and per-category SAG mining over ~104k news
    (construct_SAG.py:126-162). Bounds wall-clock + RSS so a multi-hour
    surprise on first real-data use is impossible."""
    env = dict(os.environ)
    env.setdefault("JAX_PLATFORMS", "cpu")
    proc = subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(__file__), "scale_sag_child.py")],
        capture_output=True, text=True, timeout=2400, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    stats = json.loads(proc.stdout.strip().splitlines()[-1])
    print(f"sag/glove scale stats: {stats}")
    assert stats["sag_news"] > 100_000
    # measured on the 4-core CI machine: glove parse 253 s (4.3 GB file),
    # SAG mining 63 s (biggest category 22.7k news), peak RSS 6.6 GB —
    # bounds carry ~2.5x headroom against machine noise
    # native multithreaded parser (loader.cpp::parse_glove): 26.6 s on the
    # 4-core machine; the 600 s bound still admits the pure-Python fallback
    assert stats["glove_parse_s"] < 600, stats
    assert stats["sag_s"] < 300, stats
    assert stats["peak_rss_gb"] < 16.0, stats
