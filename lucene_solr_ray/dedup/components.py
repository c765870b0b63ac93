"""Distributed connected components over duplicate-pair graphs.

Near-duplicate detection (MinHash-LSH, SimHash, embedding buckets) emits
PAIRS; turning pairs into deletion decisions needs duplicate CLUSTERS —
the connected components of the pair graph — with one canonical document
kept per cluster (SlimPajama / RefinedWeb both do exactly this step after
LSH). The reference's SignatureUpdateProcessorFactory
(solr/core/.../processor/SignatureUpdateProcessorFactory.java:42) only
handles the transitive-closure-free exact-signature case; components are
the generalization the near-dup rules require.

Two cost-based plans (the same split dedup_minhash_lsh uses):

* <= _DRIVER_UNIONFIND_GATE edges: exact union-find over the streamed
  edge list on the driver — edges are (int64, int64) pairs only, so 2M
  edges is ~32 MB; flat latency, no shuffle rounds.
* above the gate (the 10^12-doc plan): iterative min-label propagation
  with pointer jumping (label(v) <- label(label(v)) each round), the
  classic MapReduce CC formulation. Every round is two hash-partitioned
  joins + one groupby over (node, label) id pairs only — document text
  never shuffles. Pointer jumping makes chains converge in
  O(log diameter) rounds; duplicate graphs are star-like (LSH buckets),
  so in practice 2-4 rounds. Per-round state is one id pair per node,
  repartitioned + materialized each round (flat lineage, and empty
  map_groups blocks must not accumulate — measured planning degradation
  otherwise).

Convergence is detected exactly: the previous label rides through the
round's groupby as a Min-folded sentinel column, and the round counts
strict decreases (labels are monotone non-increasing, so zero decreases
== fixpoint) — no extra join.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset
from ray.data.aggregate import Min

from ..relational.ops import safe_join


# static join-side schemas for safe_join (avoids lazy .schema() executions)
_NODE_NBR = pa.schema([("node", pa.int64()), ("nbr", pa.int64())])
_NODE_LBL = pa.schema([("node", pa.int64()), ("lbl", pa.int64())])
_NODE_LBL_PREV = pa.schema([("node", pa.int64()), ("lbl", pa.int64()),
                            ("prev", pa.int64())])
_LBL_JLBL = pa.schema([("lbl", pa.int64()), ("jlbl", pa.int64())])


def _rename(ds: Dataset, mapping: dict) -> Dataset:
    def fn(t: pa.Table) -> pa.Table:
        return pa.table({mapping.get(c, c): t[c] for c in t.column_names
                         if mapping.get(c, c) is not None})
    return ds.map_batches(fn, batch_format="pyarrow")


# below this many edges a driver union-find (two int64 columns + a parent
# array) beats the iterative shuffle rounds' scheduling latency — the same
# cost-based split dedup_minhash_lsh uses (_DRIVER_LEXSORT_GATE); the
# distributed loop below is the 10^12-doc plan
_DRIVER_UNIONFIND_GATE = 2_000_000


def connected_components(
    edges: Dataset, src: str = "src", dst: str = "dst",
    num_partitions: int = 16, max_iters: int = 64,
    driver_gate: int = _DRIVER_UNIONFIND_GATE,
) -> Dataset:
    """(src, dst) int64 edge Dataset -> (node, cluster_id) with
    cluster_id = min node id reachable in the undirected graph.

    Nodes are the edge endpoints; callers union isolated nodes back in
    afterwards (their cluster is themselves, no iteration needed)."""
    if edges.count() <= driver_gate:
        return _driver_union_find(edges, src, dst)
    return _distributed_components(edges, src, dst, num_partitions,
                                   max_iters)


def _driver_union_find(edges: Dataset, src: str, dst: str) -> Dataset:
    """Exact union-find over the streamed edge list (ids only — never the
    documents). Path-halving + union-by-min keeps it near-linear."""
    import ray

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent[r] != r:
            parent[r] = parent[parent[r]]
            r = parent[r]
        return r

    for b in edges.select_columns([src, dst]).iter_batches(
            batch_format="pyarrow", batch_size=65536):
        a = b[src].to_numpy(zero_copy_only=False).astype(np.int64)
        c = b[dst].to_numpy(zero_copy_only=False).astype(np.int64)
        for x, y in zip(a.tolist(), c.tolist()):
            if x not in parent:
                parent[x] = x
            if y not in parent:
                parent[y] = y
            rx, ry = find(x), find(y)
            if rx != ry:
                if rx < ry:
                    parent[ry] = rx
                else:
                    parent[rx] = ry
    nodes = np.fromiter(parent.keys(), np.int64, len(parent))
    lbls = np.fromiter((find(int(x)) for x in nodes), np.int64, len(nodes))
    order = np.argsort(nodes)
    table = pa.table({"node": pa.array(nodes[order], pa.int64()),
                      "cluster_id": pa.array(lbls[order], pa.int64())})
    return ray.data.from_arrow(table)


def _distributed_components(
    edges: Dataset, src: str, dst: str,
    num_partitions: int, max_iters: int,
) -> Dataset:
    """The at-scale path: min-label propagation with pointer jumping."""
    # symmetrize once; labels flood along both directions. Both halves emit
    # the SAME column order — union blocks must share one schema.
    def fwd_fn(t: pa.Table) -> pa.Table:
        return pa.table({"node": t[src], "nbr": t[dst]})

    def rev_fn(t: pa.Table) -> pa.Table:
        return pa.table({"node": t[dst], "nbr": t[src]})

    e = edges.select_columns([src, dst])
    sym = (e.map_batches(fwd_fn, batch_format="pyarrow")
           .union(e.map_batches(rev_fn, batch_format="pyarrow"))
           .materialize())

    _SENT = np.int64(1) << 62  # survives a float64 round-trip (2^63 does not)

    def init_labels(t: pa.Table) -> pa.Table:
        return pa.table({"node": t["node"], "lbl": t["node"]})

    labels = (
        sym.select_columns(["node"]).map_batches(
            init_labels, batch_format="pyarrow")
        .groupby("node").aggregate(Min("lbl", alias_name="lbl"))
        .materialize()
    )

    for _ in range(max_iters):
        # propagate: each node offers its label to every neighbor.
        # safe_join = native hash join + sentinel guard (empty hash
        # PARTITIONS are fine in Ray 2.49; only a zero-row SIDE crashes,
        # which the sentinel rows prevent). The previous label rides along
        # as `prev` (sentinel on offered rows), so convergence falls out
        # of the SAME groupby — no extra join per round.
        def offer(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            return pa.table({
                "node": pc.cast(t["nbr"], pa.int64()),
                "lbl": pc.cast(t["lbl"], pa.int64()),
                "prev": pa.array(
                    np.full(len(t), _SENT, np.int64), pa.int64()),
            })

        offered = safe_join(
            sym, labels, on="node", num_partitions=num_partitions,
            l_schema=_NODE_NBR, r_schema=_NODE_LBL,
        ).map_batches(offer, batch_format="pyarrow")

        def carry(t: pa.Table) -> pa.Table:
            return pa.table({"node": t["node"], "lbl": t["lbl"],
                             "prev": t["lbl"]})

        cand = labels.map_batches(
            carry, batch_format="pyarrow").union(offered)
        # materialize: the jump join consumes newl TWICE (as rows and as
        # the node->label mapping); unmaterialized it would re-execute the
        # whole propagate pipeline per consumer
        newl = cand.groupby("node").aggregate(
            Min("lbl", alias_name="lbl"),
            Min("prev", alias_name="prev")).materialize()
        # pointer jumping through the FRESH labels (label(v) <- newl's
        # label of label(v)): true distance doubling, O(log diameter)
        jump = safe_join(
            newl,
            _rename(newl, {"node": "lbl", "lbl": "jlbl", "prev": None}),
            on="lbl", how="left", num_partitions=num_partitions,
            l_schema=_NODE_LBL_PREV, r_schema=_LBL_JLBL)

        def take_min(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            hop = pc.coalesce(t["jlbl"], t["lbl"])
            return pa.table({
                "node": pc.cast(t["node"], pa.int64()),
                "lbl": pc.cast(pc.min_element_wise(t["lbl"], hop),
                               pa.int64()),
                "prev": pc.cast(t["prev"], pa.int64()),
            })

        check = jump.map_batches(
            take_min, batch_format="pyarrow").materialize()

        def decreases(t: pa.Table) -> pa.Table:
            d = (t["lbl"].to_numpy(zero_copy_only=False)
                 < t["prev"].to_numpy(zero_copy_only=False))
            return pa.table({"changed": pa.array([int(d.sum())], pa.int64())})

        changed = check.map_batches(
            decreases, batch_format="pyarrow").sum("changed")
        # repartition each round: map_groups emits schema-less empty
        # blocks for empty buckets, and carrying them across rounds makes
        # per-round planning degrade geometrically (measured locally)
        labels = check.map_batches(
            lambda t: t.select(["node", "lbl"]),
            batch_format="pyarrow").repartition(num_partitions) \
            .materialize()
        if not changed:
            break

    return _rename(labels, {"lbl": "cluster_id"})


def star_edges(ds: Dataset, id_col: str, key_col: str,
               num_partitions: int = 16) -> Dataset:
    """Star edges for one grouping rule: every member of a key group gets
    an edge to the group's min id (src=min, dst=member, src != dst).
    The shuffle carries (key, id) pairs only."""
    pairs = ds.select_columns([key_col, id_col])
    mins = pairs.groupby(key_col).aggregate(
        Min(id_col, alias_name="__grp_min"))
    joined = safe_join(pairs, mins, on=key_col,
                       num_partitions=num_partitions)

    def emit(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        m = t["__grp_min"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = ids != m
        return pa.table({
            "src": pa.array(m[keep], pa.int64()),
            "dst": pa.array(ids[keep], pa.int64()),
        })

    return joined.map_batches(emit, batch_format="pyarrow")


def dedup_clusters(
    docs: Dataset, id_col: str, rule_keys: list[str],
    num_partitions: int = 16,
    driver_gate: int = _DRIVER_UNIONFIND_GATE,
) -> Dataset:
    """Cluster documents that match on ANY of several grouping rules
    (transitive closure across rules), returning (doc_id, cluster_id,
    is_canonical). Each rule contributes star edges per key group; docs
    matching no other doc stay their own singleton cluster."""
    edge_sets = [star_edges(docs, id_col, k, num_partitions)
                 for k in rule_keys]
    edges = edge_sets[0]
    for e in edge_sets[1:]:
        edges = edges.union(e)
    comp = connected_components(edges, num_partitions=num_partitions,
                                driver_gate=driver_gate)

    # bring singletons back: left-join all ids against component labels
    all_ids = docs.select_columns([id_col])
    joined = safe_join(
        all_ids, _rename(comp, {"node": id_col}),
        on=id_col, how="left", num_partitions=num_partitions,
        r_schema=pa.schema([(id_col, pa.int64()),
                            ("cluster_id", pa.int64())]))

    def finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        ids = pc.cast(t[id_col], pa.int64())
        c = pc.cast(pc.coalesce(t["cluster_id"], ids), pa.int64())
        return pa.table({
            id_col: ids,
            "cluster_id": c,
            "is_canonical": pc.equal(ids, c),
        })

    return joined.map_batches(finish, batch_format="pyarrow")
