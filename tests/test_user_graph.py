"""On-device user-graph reconstruction vs the reference edge-rule oracle."""

import numpy as np

from digat_tpu.data.user_graph import build_user_graph_np
from tests.oracle import user_graph_np

H, C = 8, 5


def check(cat_idx):
    cat_idx = np.asarray(cat_idx)
    graphs, masks = build_user_graph_np(cat_idx, H, C)
    for b in range(cat_idx.shape[0]):
        g_ref, m_ref = user_graph_np(cat_idx[b], H, C)
        np.testing.assert_array_equal(graphs[b], g_ref)
        np.testing.assert_array_equal(masks[b], m_ref)


def test_random_histories():
    rng = np.random.default_rng(0)
    cat = rng.integers(0, C + 1, size=(16, H))
    # force contiguity like real data: pads at the tail
    for row in cat:
        n = rng.integers(0, H + 1)
        row[n:] = C
    check(cat)


def test_empty_history():
    check(np.full((1, H), C))


def test_single_item():
    cat = np.full((1, H), C)
    cat[0, 0] = 2
    check(cat)


def test_all_same_category():
    cat = np.full((1, H), 1)
    check(cat)


def test_all_distinct_categories():
    cat = np.full((1, H), C)
    cat[0, :C] = np.arange(C)
    check(cat)
