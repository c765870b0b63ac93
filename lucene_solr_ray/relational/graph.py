"""Graph traversal streams: gatherNodes / shortestPath
(solr/solrj/.../io/graph/GatherNodesStream.java:63,
ShortestPathStream.java:52, Traversal.java:28).

The reference walks a graph stored as documents (edge per doc: fromField ->
toField) with one distributed join per level. The Ray shape is identical:
each BFS level broadcasts the (small) frontier id set into a pruned
columnar scan of the edge table — `ray.put` once per level, never a
shuffle — and only distinct new node ids return to the driver. Per-level
driver state is O(frontier), the edge table itself is never materialized.

For 100-TB edge tables the frontier broadcast stays the right plan while
frontiers fit in memory (the reference has the same assumption: its
joinBatchSize pages the frontier through /export queries); a giant
frontier degrades to a hash-join per level — swap `_level_expand`'s filter
for `ops.hash_join` at that point.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _level_expand(edge_paths, from_field: str, to_field: str,
                  frontier: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """One traversal level: distinct (from, to) pairs whose `from` is in
    the frontier. Columnar pruned read + broadcast id-set filter."""
    import ray
    import ray.data

    ref = ray.put(np.unique(frontier))

    def hit(t: pa.Table) -> pa.Table:
        ids = ray.get(ref)
        m = pc.is_in(t[from_field], pa.array(ids))
        t = t.filter(m)
        return t.group_by([from_field, to_field]).aggregate([])

    ds = ray.data.read_parquet(edge_paths, columns=[from_field, to_field])
    out = ds.map_batches(hit, batch_format="pyarrow") \
            .groupby([from_field, to_field]).count()
    tbl = pa.concat_tables(
        b for b in out.iter_batches(batch_format="pyarrow", batch_size=65536))
    if not tbl.num_rows:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    return (tbl[from_field].to_numpy(zero_copy_only=False).astype(np.int64),
            tbl[to_field].to_numpy(zero_copy_only=False).astype(np.int64))


def gather_nodes(edge_paths, from_field: str, to_field: str,
                 roots, depth: int = 1) -> pa.Table:
    """GatherNodesStream: breadth-first node gathering to `depth` levels.

    Returns (node, level, ancestor_count) — level 0 rows are the roots;
    each deeper level holds the DISTINCT nodes first reached there (the
    reference's Traversal dedups across levels), with ancestor_count =
    number of distinct frontier parents that reached the node.
    """
    roots = np.unique(np.asarray(list(roots), dtype=np.int64))
    rows_node = [roots]
    rows_level = [np.zeros(len(roots), np.int64)]
    rows_anc = [np.zeros(len(roots), np.int64)]
    visited = set(roots.tolist())
    frontier = roots
    for lvl in range(1, depth + 1):
        if not len(frontier):
            break
        f, t = _level_expand(edge_paths, from_field, to_field, frontier)
        if not len(t):
            break
        new_mask = np.array([x not in visited for x in t.tolist()])
        # ancestor counts over distinct (from, to) pairs of NEW nodes
        tn = t[new_mask]
        uniq, cnt = np.unique(tn, return_counts=True)
        visited.update(uniq.tolist())
        rows_node.append(uniq)
        rows_level.append(np.full(len(uniq), lvl, np.int64))
        rows_anc.append(cnt.astype(np.int64))
        frontier = uniq
    return pa.table({
        "node": pa.array(np.concatenate(rows_node), pa.int64()),
        "level": pa.array(np.concatenate(rows_level), pa.int64()),
        "ancestors": pa.array(np.concatenate(rows_anc), pa.int64()),
    })


def shortest_path(edge_paths, from_field: str, to_field: str,
                  src: int, dst: int, max_depth: int = 6) -> list[int] | None:
    """ShortestPathStream: BFS from src until dst is reached (or max_depth
    exhausted); returns ONE shortest path as a node list (ties resolved by
    smallest parent id, deterministically), or None.

    Per level the driver keeps a parent pointer per newly-visited node —
    O(visited) driver state, the reference's Traversal keeps the same.
    """
    src, dst = int(src), int(dst)
    if src == dst:
        return [src]
    parent: dict[int, int] = {src: src}
    frontier = np.asarray([src], dtype=np.int64)
    for _ in range(max_depth):
        if not len(frontier):
            break
        f, t = _level_expand(edge_paths, from_field, to_field, frontier)
        order = np.lexsort((f, t))  # smallest parent wins per target
        f, t = f[order], t[order]
        first = np.concatenate([[True], t[1:] != t[:-1]])
        f, t = f[first], t[first]
        new = [i for i, x in enumerate(t.tolist()) if x not in parent]
        for i in new:
            parent[int(t[i])] = int(f[i])
        if dst in parent:
            path = [dst]
            while path[-1] != src:
                path.append(parent[path[-1]])
            return path[::-1]
        frontier = t[new] if new else np.zeros(0, np.int64)
    return None
