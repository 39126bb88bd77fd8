"""SAG construction: BFS expansion rules against hand-built fixtures
(reference construct_SAG.py:449-485) and the dedup/neighbor-list rules."""

import numpy as np
import pytest

from digat_tpu.data import sag

pytestmark = pytest.mark.parametrize("use_native", [False, True])

def expand(*args, use_native=False, **kw):
    return sag.expand_graph(*args, use_native=use_native, **kw)


def ids(*names):
    return {"<PAD>": 0, **{n: i + 1 for i, n in enumerate(names)}}


def test_bfs_hop0_takes_all_m_unconditionally(use_native):
    # M=2, hops=1: node A with neighbors below threshold still expands at hop 0
    d = ids("A", "B", "C")
    sim = {"A": [("B", 0.1), ("C", 0.05)], "B": [], "C": [], "<PAD>": []}
    node_id, graph, mask = expand(sim, d, 2, 1, 3, use_native=use_native)
    a = d["A"]
    assert node_id[a].tolist() == [d["A"], d["B"], d["C"]]
    assert mask[a].tolist() == [True, True, True]
    assert graph[a, 0, 1] and graph[a, 1, 0] and graph[a, 0, 2]


def test_bfs_deeper_hop_threshold_pruning(use_native):
    # M=3, hops=2: at depth 1, neighbors below 0.5 cos stop the walk
    d = ids("A", "B", "C", "D", "E")
    sim = {
        "A": [("B", 0.9), ("C", 0.8), ("D", 0.7)],
        "B": [("E", 0.4)],  # below threshold -> no expansion
        "C": [], "D": [], "E": [], "<PAD>": [],
    }
    size = 1 + 3 + 3 * 2
    node_id, graph, mask = expand(sim, d, 3, 2, size, use_native=use_native)
    a = d["A"]
    got = [x for x in node_id[a].tolist() if x != 0]
    assert d["E"] not in got  # pruned by threshold
    assert set(got) == {d["A"], d["B"], d["C"], d["D"]}


def test_bfs_deeper_hop_takes_at_most_m_minus_1(use_native):
    # M=3: deeper hops stop at index == M-1 (take at most 2 neighbors)
    d = ids("A", "B", "C", "D", "E", "F", "G")
    sim = {
        "A": [("B", 0.9), ("C", 0.8), ("D", 0.7)],
        "B": [("E", 0.9), ("F", 0.9), ("G", 0.9)],  # only E, F taken
        "C": [], "D": [], "E": [], "F": [], "G": [], "<PAD>": [],
    }
    size = 1 + 3 + 3 * 2
    node_id, graph, mask = expand(sim, d, 3, 2, size, use_native=use_native)
    a = d["A"]
    got = set(x for x in node_id[a].tolist() if x != 0)
    assert d["G"] not in got
    assert {d["E"], d["F"]} <= got


def test_bfs_revisited_node_gains_edge_not_slot(use_native):
    d = ids("A", "B", "C")
    sim = {
        "A": [("B", 0.9), ("C", 0.9)],
        "B": [("C", 0.9), ("A", 0.9)],  # C already placed -> edge only
        "C": [], "<PAD>": [],
    }
    node_id, graph, mask = expand(sim, d, 2, 2, 4, use_native=use_native)
    a = d["A"]
    nodes = [x for x in node_id[a].tolist() if x != 0]
    assert sorted(nodes) == sorted([d["A"], d["B"], d["C"]])
    # B (slot 1) gained an edge to C (slot 2)
    assert graph[a, 1, 2] and graph[a, 2, 1]


def test_pad_row_empty(use_native):
    d = ids("A")
    sim = {"A": [], "<PAD>": []}
    node_id, graph, mask = expand(sim, d, 2, 2, 4, use_native=use_native)
    assert node_id[0].tolist() == [0, 0, 0, 0]
    assert not graph[0].any()
    assert mask[0].tolist() == [True, False, False, False]


def test_dedup_and_fallbacks(use_native):
    rows = [
        ("train_dev", "N1", "Shared Title", "content one"),
        ("train_dev", "N2", "Shared Title", "content two"),
        ("train_dev", "N3", "", "only content"),
        ("train_dev", "N4", "only title", ""),
        ("train_dev", "N5", "", ""),
    ]
    n2g, groups, titles, contents, empty = sag.dedup_category_news(rows)
    assert n2g["N1"] == n2g["N2"]  # same title -> same group
    assert empty == ["N5"]
    gi = n2g["N3"]
    assert titles[gi] == "only content"  # title fell back to content
    gi4 = n2g["N4"]
    assert contents[gi4] == "only title"  # content fell back to title


def test_neighbor_lists_exclude_self(use_native):
    groups = {0: ["N1"], 1: ["N2"], 2: ["N3"]}
    vals = np.asarray([[0.99, 0.9, 0.8]], np.float32)
    idx = np.asarray([[0, 1, 2]])
    # group 0 contains N1 itself -> skipped; take next two
    out = sag.neighbor_lists(
        {0: ["N1"]}, groups, vals, idx, 2, [], ["N1", "N2", "N3"],
        np.random.default_rng(0),
    )
    assert [n for n, _ in out["N1"]] == ["N2", "N3"]


def test_hash_embedder_structure(use_native):
    texts = ["alpha beta gamma", "alpha beta delta", "zzz qqq www"]
    e = sag.hash_embedder(texts)
    sim_close = float(e[0] @ e[1])
    sim_far = float(e[0] @ e[2])
    assert sim_close > sim_far + 0.2


def test_construct_sag_end_to_end(use_native):
    rows = {
        "sports": [
            ("train_dev", "N1", "football match result", "a"),
            ("train_dev", "N2", "football match report", "b"),
            ("train_dev", "N3", "tennis open final", "c"),
            ("test", "N4", "football match preview", "d"),
        ],
        "finance": [("train_dev", "N5", "stocks rally today", "e")],
    }
    d = ids("N1", "N2", "N3", "N4", "N5")
    node_id, graph, mask = sag.construct_sag(rows, d, 2, 2, 5)
    assert node_id.shape == (6, 5)
    # every row's slot 0 is itself
    for n, i in d.items():
        if i:
            assert node_id[i, 0] == i
    # test-domain news N4 can have neighbors (full side) ...
    assert mask[d["N4"]].sum() >= 2
    # ... but never appears as anyone's neighbor (corpus side excludes test)
    for i in range(1, 6):
        if i != d["N4"]:
            assert d["N4"] not in node_id[i, 1:].tolist()


def test_visualize_graph_dump(use_native, tmp_path):
    """The debugging helper writes the edge list (with titles) and the
    adjacency matrix of one news graph (reference construct_SAG.py:488-512)."""
    d = ids("A", "B", "C")
    sim = {"A": [("B", 0.9), ("C", 0.8)], "B": [], "C": [], "<PAD>": []}
    node_id, graph, mask = expand(sim, d, 2, 1, 3, use_native=use_native)
    out = tmp_path / "graph.tsv"
    sag.visualize_graph(
        str(out), d["A"], node_id, graph,
        {d["A"]: "title a", d["B"]: "title b", d["C"]: "title c"},
    )
    text = out.read_text(encoding="utf-8")
    lines = text.splitlines()
    assert lines[0] == "Node1\tNode2\tTitle1\tTitle2"
    assert "0\t1\ttitle a\ttitle b" in lines
    # adjacency block: one row per node, matching the boolean matrix
    adj_rows = lines[lines.index("news graph") + 1:]
    got = np.array([[int(x) for x in r.split("\t")] for r in adj_rows[:3]])
    assert np.array_equal(got, graph[d["A"]].astype(int))
