"""Points index: the BKD-tree substitute for numeric range queries.

The reference indexes numeric fields in a per-segment BKD tree
(util/bkd/BKDWriter.java:59-90, leaf size DEFAULT_MAX_POINTS_IN_LEAF_NODE =
1024 at line 90) so a PointRangeQuery (search/PointRangeQuery.java:47) visits
only the leaves whose [min,max] intersects the range. The Ray-native
re-expression keeps the two properties that matter — values sorted per
segment, range reads touch only overlapping leaves — with Parquet doing the
tree's job:

* per shard, per field, one parquet file of (value float64, doc_id int64)
  rows sorted by value, written with row_group_size = 1024 (the leaf);
* Parquet stores min/max statistics per row group, so a range query reads
  ONLY the row groups whose stats overlap [lower, upper] — the exact I/O
  shape of a BKD leaf walk, including for an index far larger than RAM;
* the 1-D "tree" above the leaves is the row-group stats array itself
  (a few hundred bytes per 1024 docs), scanned vectorized.

Scale notes: the sort is per shard (the segment — Lucene sorts per segment
too) and runs as one Ray task per (shard, field); a shard's (value, doc_id)
pairs cost 16 bytes/doc, so shard count is the memory knob exactly as it is
for postings. Merges rebuild points for the new shards from the merged docs
tables (SegmentMerger merges BKD trees the same way: re-sort per new
segment).

NaN semantics: rows with NaN values sort to the tail and never match a
range (both numpy comparisons and the reference's encoded-bytes ordering
exclude them); parquet stats ignore NaNs, so pruning stays correct.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

LEAF_SIZE = 1024  # BKDWriter.java:90 DEFAULT_MAX_POINTS_IN_LEAF_NODE


def _points_path(index_dir: str, shard: int, field: str) -> str:
    return os.path.join(index_dir, "points", f"shard={shard}", f"{field}.parquet")


def build_points(index_dir: str, shard_ids, fields) -> None:
    """Write sorted (value, doc_id) leaf files for each (shard, field).

    Values come from the docs table's dv_<field> columns (points fields are
    forced into docvalues_fields at config time). One Ray task per shard —
    the per-segment sort unit, fanned across the cluster like the
    reference's per-segment BKD builds under ConcurrentMergeScheduler."""
    fields = tuple(fields)
    if not fields:
        return
    import ray

    @ray.remote(num_cpus=1)
    def _one_shard(idx_dir: str, shard: int, flds: tuple) -> None:
        ddir = os.path.join(idx_dir, "docs", f"shard={shard}")
        if not os.path.isdir(ddir):
            return
        cols = ["doc_id"] + [f"dv_{f}" for f in flds]
        t = pq.read_table(ddir, columns=cols)
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        for f in flds:
            vals = t[f"dv_{f}"].to_numpy(zero_copy_only=False).astype(np.float64)
            order = np.argsort(vals, kind="stable")  # NaNs sort to the tail
            out = pa.table({
                "value": pa.array(vals[order], pa.float64()),
                "doc_id": pa.array(ids[order], pa.int64()),
            })
            path = _points_path(idx_dir, shard, f)
            os.makedirs(os.path.dirname(path), exist_ok=True)
            tmp = path + ".tmp"
            pq.write_table(out, tmp, row_group_size=LEAF_SIZE)
            os.replace(tmp, path)

    ray.get([_one_shard.remote(index_dir, int(s), fields) for s in shard_ids])


def drop_points(index_dir: str, shard_ids) -> None:
    import shutil

    for s in shard_ids:
        shutil.rmtree(os.path.join(index_dir, "points", f"shard={s}"),
                      ignore_errors=True)


class ShardPoints:
    """Per-shard lazy points reader (the BKD leaf walk).

    Nothing is read until the first range; after that only the file's
    row-group statistics (metadata) stay resident per field. Each range
    query reads the overlapping row groups only; `last_groups_read` exposes
    the pruning for tests/ds.stats-style introspection."""

    def __init__(self, index_dir: str, shard: int):
        self._dir = index_dir
        self._shard = shard
        self._meta: dict[str, tuple] = {}  # field -> (path, mins, maxs, pf)
        self.last_groups_read = 0

    def __getstate__(self):
        # open ParquetFile handles don't pickle; a shipped reader re-opens
        # lazily on first use (readers are serialized into search actors)
        return {"_dir": self._dir, "_shard": self._shard, "_meta": {},
                "last_groups_read": 0}

    def has_field(self, field: str) -> bool:
        if field in self._meta:
            return True
        return os.path.exists(_points_path(self._dir, self._shard, field))

    def _stats(self, field: str):
        got = self._meta.get(field)
        if got is not None:
            return got
        path = _points_path(self._dir, self._shard, field)
        pf = pq.ParquetFile(path)
        md = pf.metadata
        mins = np.empty(md.num_row_groups, np.float64)
        maxs = np.empty(md.num_row_groups, np.float64)
        for g in range(md.num_row_groups):
            st = md.row_group(g).column(0).statistics
            if st is None or not st.has_min_max:
                # all-NaN leaf (values sort NaN-last, stats skip NaNs):
                # never overlaps any range
                mins[g], maxs[g] = np.inf, -np.inf
            else:
                mins[g] = st.min
                maxs[g] = st.max
        self._meta[field] = (path, mins, maxs, pf)
        return self._meta[field]

    def range(self, field: str, lower: float | None,
              upper: float | None) -> np.ndarray:
        """Doc ids (sorted asc, raw — caller applies liveness) with
        lower <= value <= upper; None = open bound."""
        _, mins, maxs, pf = self._stats(field)
        lo = -np.inf if lower is None else float(lower)
        hi = np.inf if upper is None else float(upper)
        hit = (maxs >= lo) & (mins <= hi)
        groups = np.flatnonzero(hit)
        self.last_groups_read = int(len(groups))
        if not len(groups):
            return np.zeros(0, np.int64)
        t = pf.read_row_groups(groups.tolist())
        vals = t["value"].to_numpy(zero_copy_only=False)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        # values are globally sorted: only the two boundary leaves need a
        # mask; searchsorted keeps the middle zero-compare
        a = int(np.searchsorted(vals, lo, side="left"))
        b = int(np.searchsorted(vals, hi, side="right"))
        return np.sort(ids[a:b].astype(np.int64))
