"""Negative-sampling semantics (reference MIND_dataset.py:26-48)."""

import numpy as np

from digat_tpu.data.sampling import sample_negatives


def make_ragged(lists):
    flat = np.asarray([x for l in lists for x in l], np.int32)
    off = np.cumsum([0] + [len(l) for l in lists]).astype(np.int64)
    return flat, off


def test_wrap_when_few_negatives():
    flat, off = make_ragged([[7], [5, 9]])
    out = sample_negatives(flat, off, 4, np.random.default_rng(0))
    np.testing.assert_array_equal(out[0], [7, 7, 7, 7])
    np.testing.assert_array_equal(out[1], [5, 9, 5, 9])


def test_without_replacement():
    lists = [list(range(100, 120))] * 50
    flat, off = make_ragged(lists)
    out = sample_negatives(flat, off, 4, np.random.default_rng(1))
    for row in out:
        assert len(set(row.tolist())) == 4
        assert all(100 <= x < 120 for x in row)


def test_uniform_coverage():
    """Every negative should be drawn with roughly equal frequency."""
    lists = [list(range(10))] * 4000
    flat, off = make_ragged(lists)
    out = sample_negatives(flat, off, 4, np.random.default_rng(2))
    counts = np.bincount(out.ravel(), minlength=10)
    expected = 4000 * 4 / 10
    assert np.all(np.abs(counts - expected) < 0.15 * expected)


def test_epoch_resample_differs():
    lists = [list(range(30))] * 10
    flat, off = make_ragged(lists)
    a = sample_negatives(flat, off, 4, np.random.default_rng(3))
    b = sample_negatives(flat, off, 4, np.random.default_rng(4))
    assert not np.array_equal(a, b)


def test_empty_negatives_row():
    flat, off = make_ragged([[], [3, 4, 5, 6, 7, 8]])
    out = sample_negatives(flat, off, 4, np.random.default_rng(5))
    np.testing.assert_array_equal(out[0], [0, 0, 0, 0])  # <PAD>
    assert len(set(out[1].tolist())) == 4
