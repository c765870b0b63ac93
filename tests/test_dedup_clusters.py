"""Connected-components duplicate clustering (dedup/components.py) vs a
driver-side union-find model."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from lucene_solr_ray.dedup.components import (
    connected_components,
    dedup_clusters,
    star_edges,
)


def _union_find(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min-id labels
    return {i: find(i) for i in range(n_nodes)}


def _edges_ds(edges):
    return ray.data.from_arrow(pa.table({
        "src": pa.array([e[0] for e in edges], pa.int64()),
        "dst": pa.array([e[1] for e in edges], pa.int64()),
    }))


@pytest.mark.parametrize("driver_gate", [2_000_000, 0],
                         ids=["driver-path", "distributed-path"])
def test_cc_random_graph_matches_union_find(ray_session, driver_gate):
    rng = np.random.default_rng(42)
    n = 120
    edges = [tuple(sorted(rng.integers(0, n, 2).tolist()))
             for _ in range(90)]
    edges = [e for e in edges if e[0] != e[1]]
    model = _union_find(n, edges)
    out = connected_components(_edges_ds(edges), num_partitions=4,
                               driver_gate=driver_gate).to_pandas()
    got = dict(zip(out["node"], out["cluster_id"]))
    nodes_in_graph = {v for e in edges for v in e}
    assert set(got) == nodes_in_graph
    for v in nodes_in_graph:
        assert got[v] == model[v], (v, got[v], model[v])


def test_cc_long_chain_converges_distributed(ray_session):
    # a 17-node path through the DISTRIBUTED plan: plain min-label needs
    # 16 rounds; pointer jumping must get there within a tight budget
    edges = [(i, i + 1) for i in range(16)]
    out = connected_components(_edges_ds(edges), num_partitions=4,
                               max_iters=10, driver_gate=0).to_pandas()
    assert set(out["cluster_id"]) == {0}
    assert len(out) == 17


def test_star_edges_per_group(ray_session):
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([5, 3, 9, 7, 1], pa.int64()),
        "k": pa.array([10, 10, 10, 20, 30], pa.int64()),
    }))
    out = star_edges(docs, "doc_id", "k", num_partitions=4).to_pandas()
    got = set(zip(out["src"], out["dst"]))
    assert got == {(3, 5), (3, 9)}  # group 10 stars to min id 3; singles none


def test_dedup_clusters_bridging_rules_and_singletons(ray_session):
    # k1 groups {0,1} {2,3}; k2 groups {1,2} {3,4}: transitive closure
    # merges 0..4; 5 and 6 stay singleton canonical docs
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 4, 5, 6], pa.int64()),
        "k1": pa.array([10, 10, 20, 20, 30, 40, 50], pa.int64()),
        "k2": pa.array([7, 8, 8, 9, 9, 11, 12], pa.int64()),
    }))
    res = dedup_clusters(docs, "doc_id", ["k1", "k2"],
                         num_partitions=4).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert list(res["cluster_id"]) == [0, 0, 0, 0, 0, 5, 6]
    assert list(res["is_canonical"]) == [True, False, False, False, False,
                                         True, True]
