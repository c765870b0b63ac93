"""Graph traversal streams (io/graph/GatherNodesStream.java:63,
ShortestPathStream.java:52) — brute-force BFS parity over a synthetic
edge table, plus a real-table walk."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.relational.graph import gather_nodes, shortest_path

EDGES = [  # small directed graph
    (0, 1), (0, 2), (1, 3), (2, 3), (3, 4), (4, 5), (2, 6), (6, 5),
    (5, 7), (7, 0),  # cycle back
    (8, 9),          # disconnected component
]


@pytest.fixture(scope="module")
def edge_path(tmp_path_factory, ray_session):
    p = str(tmp_path_factory.mktemp("graph") / "edges.parquet")
    pq.write_table(pa.table({
        "src": pa.array([a for a, _ in EDGES], pa.int64()),
        "dst": pa.array([b for _, b in EDGES], pa.int64()),
    }), p)
    return p


def bfs_levels(roots, depth):
    adj: dict[int, list[int]] = {}
    for a, b in EDGES:
        adj.setdefault(a, []).append(b)
    seen = set(roots)
    lvl = {r: 0 for r in roots}
    frontier = list(roots)
    for d in range(1, depth + 1):
        nxt = []
        for n in frontier:
            for m in adj.get(n, []):
                if m not in seen:
                    seen.add(m)
                    lvl[m] = d
                    nxt.append(m)
        frontier = nxt
    return lvl


def test_gather_nodes_levels(edge_path):
    out = gather_nodes(edge_path, "src", "dst", [0], depth=3)
    got = dict(zip(out["node"].to_pylist(), out["level"].to_pylist()))
    assert got == bfs_levels([0], 3)


def test_gather_nodes_ancestor_counts(edge_path):
    out = gather_nodes(edge_path, "src", "dst", [0], depth=2)
    rows = {n: (l, a) for n, l, a in zip(out["node"].to_pylist(),
                                         out["level"].to_pylist(),
                                         out["ancestors"].to_pylist())}
    # node 3 reached from BOTH 1 and 2 at level 2
    assert rows[3] == (2, 2)
    assert rows[6] == (2, 1)


def test_gather_nodes_multi_roots_dedup(edge_path):
    out = gather_nodes(edge_path, "src", "dst", [1, 2], depth=1)
    got = dict(zip(out["node"].to_pylist(), out["level"].to_pylist()))
    assert got == {1: 0, 2: 0, 3: 1, 6: 1}


def test_shortest_path(edge_path):
    p = shortest_path(edge_path, "src", "dst", 0, 5, max_depth=6)
    assert p is not None and p[0] == 0 and p[-1] == 5
    assert len(p) == 4  # 0->2->6->5 (tie with 0->..->4->5? that is len 5)
    # every hop is a real edge
    assert all((a, b) in EDGES for a, b in zip(p, p[1:]))


def test_shortest_path_unreachable(edge_path):
    assert shortest_path(edge_path, "src", "dst", 0, 9, max_depth=8) is None
    assert shortest_path(edge_path, "src", "dst", 8, 9) == [8, 9]
    assert shortest_path(edge_path, "src", "dst", 4, 4) == [4]


def test_gather_nodes_real_tables(ray_session):
    # customers -> their orders (bipartite walk over the TPC-H-ish tables)
    out = gather_nodes("/root/testdata/sf0.001/orders.parquet",
                       "o_custkey", "o_orderkey", [1, 2, 4], depth=1)
    t = pq.read_table("/root/testdata/sf0.001/orders.parquet",
                      columns=["o_custkey", "o_orderkey"])
    want = {int(ok) for ck, ok in zip(t["o_custkey"].to_pylist(),
                                      t["o_orderkey"].to_pylist())
            if ck in (1, 2, 4)}
    got = {n for n, l in zip(out["node"].to_pylist(),
                             out["level"].to_pylist()) if l == 1}
    assert got == want
