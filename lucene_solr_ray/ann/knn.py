"""Similarity search over an embedding column (KnnStream analog).

Baseline: exact brute-force cosine top-k — the query matrix is broadcast
once (ray.put; each task's ray.get is a local zero-copy plasma read) and
every batch does one numpy matmul against it; per-batch top-k partials are
merged on the driver (the same scatter/gather shape as BM25 search).
Scale path: LSH-bucketed variant that prunes each batch to candidate
buckets before the matmul.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset

from ..util.vectors import vec_matrix


def _topk_table(qid: np.ndarray, key: np.ndarray, sim: np.ndarray, k: int):
    """Per-query top-k over flat (qid, key, sim) rows — one lexsort, no
    per-query Python loop; rank restarts at 1 within each query."""
    order = np.lexsort((key, -sim, qid))
    qid, key, sim = qid[order], key[order], sim[order]
    if len(qid):
        new_q = np.empty(len(qid), dtype=bool)
        new_q[0] = True
        new_q[1:] = qid[1:] != qid[:-1]
        starts = np.flatnonzero(new_q)
        rank = (np.arange(len(qid)) - np.repeat(starts, np.diff(
            np.append(starts, len(qid))))).astype(np.int64) + 1
        keep = rank <= k
        qid, key, sim, rank = qid[keep], key[keep], sim[keep], rank[keep]
    else:
        rank = np.zeros(0, np.int64)
    return pa.table(
        {
            "query_id": pa.array(qid.astype(np.int64), pa.int64()),
            "key": pa.array(key.astype(np.int64), pa.int64()),
            "cosine": pa.array(sim.astype(np.float64), pa.float64()),
            "rank": pa.array(rank.astype(np.int32), pa.int32()),
        }
    )


def _topk_merge(parts: list[tuple[np.ndarray, np.ndarray, np.ndarray]], k: int, nq: int):
    """Merge per-batch (qid, key, sim) partials into per-query top-k."""
    qid = np.concatenate([p[0] for p in parts]) if parts else np.zeros(0, np.int64)
    key = np.concatenate([p[1] for p in parts]) if parts else np.zeros(0, np.int64)
    sim = np.concatenate([p[2] for p in parts]) if parts else np.zeros(0, np.float64)
    return _topk_table(qid, key, sim, k)


def brute_force_knn(
    ds: Dataset, key_col: str, vec_col: str, queries: np.ndarray, k: int = 10,
) -> pa.Table:
    """Exact cosine top-k for each query row (queries: (nq, dim) float)."""
    qm = np.asarray(queries, dtype=np.float64)
    qm = qm / np.maximum(np.linalg.norm(qm, axis=1, keepdims=True), 1e-12)
    q_ref = ray.put(qm)
    nq = len(qm)

    def scan(t: pa.Table) -> pa.Table:
        q = ray.get(q_ref)  # local zero-copy plasma read (broadcast once)
        m = vec_matrix(t[vec_col])
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        sims = q @ m.T  # (nq, batch)
        keys = t[key_col].to_numpy(zero_copy_only=False)
        kk = min(k, sims.shape[1])
        idx = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        qid = np.repeat(np.arange(nq, dtype=np.int64), kk)
        key = keys[idx.ravel()]
        sim = np.take_along_axis(sims, idx, axis=1).ravel()
        return pa.table(
            {
                "query_id": pa.array(qid),
                "key": pa.array(key, pa.int64()),
                "cosine": pa.array(sim, pa.float64()),
            }
        )

    partial = ds.select_columns([key_col, vec_col]).map_batches(
        scan, batch_format="pyarrow", batch_size=4096
    )
    parts = []
    for t in partial.iter_batches(batch_format="pyarrow", batch_size=65536):
        parts.append(
            (
                t["query_id"].to_numpy(zero_copy_only=False),
                t["key"].to_numpy(zero_copy_only=False),
                t["cosine"].to_numpy(zero_copy_only=False),
            )
        )
    return _topk_merge(parts, k, nq)


def lsh_knn(
    ds: Dataset, key_col: str, vec_col: str, queries: np.ndarray, k: int = 10,
    num_planes: int = 12, probes: int = 2, seed: int = 42,
) -> pa.Table:
    """Approximate top-k: random-hyperplane LSH buckets prune each batch to
    vectors whose signature is within `probes` bit flips of the query's.

    At 10^12 scale the bucket id becomes a partition key (write the corpus
    bucketed once, then touch only candidate partitions per query)."""
    rng = np.random.default_rng(seed)
    qm = np.asarray(queries, dtype=np.float64)
    qm = qm / np.maximum(np.linalg.norm(qm, axis=1, keepdims=True), 1e-12)
    planes = rng.standard_normal((qm.shape[1], num_planes))
    q_sig = (qm @ planes > 0).astype(np.uint32)
    q_bits = (q_sig * (1 << np.arange(num_planes, dtype=np.uint32))).sum(axis=1)
    ref = ray.put((qm, planes, q_bits))
    nq = len(qm)

    def scan(t: pa.Table) -> pa.Table:
        qm2, planes2, q_bits2 = ray.get(ref)
        m = vec_matrix(t[vec_col])
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        sig = (m @ planes2 > 0).astype(np.uint32)
        bits = (sig * (1 << np.arange(sig.shape[1], dtype=np.uint32))).sum(axis=1)
        keys = t[key_col].to_numpy(zero_copy_only=False)
        rows = {"query_id": [], "key": [], "cosine": []}
        for q in range(len(qm2)):
            x = (bits ^ q_bits2[q]).astype(np.uint32)
            ham = np.unpackbits(x.view(np.uint8).reshape(-1, 4), axis=1).sum(axis=1)
            cand = np.flatnonzero(ham <= probes)
            if not len(cand):
                continue
            sims = m[cand] @ qm2[q]
            if len(cand) > k:
                # per-batch top-k cut (same (-sim, key) tiebreak as
                # _topk_table): the driver merge sees O(batches * k) rows,
                # not O(all probe-radius candidates)
                o = np.lexsort((keys[cand], -sims))[:k]
                cand, sims = cand[o], sims[o]
            rows["query_id"].extend([q] * len(cand))
            rows["key"].extend(keys[cand].tolist())
            rows["cosine"].extend(sims.tolist())
        return pa.table(
            {
                "query_id": pa.array(rows["query_id"], pa.int64()),
                "key": pa.array(rows["key"], pa.int64()),
                "cosine": pa.array(rows["cosine"], pa.float64()),
            }
        )

    partial = ds.select_columns([key_col, vec_col]).map_batches(
        scan, batch_format="pyarrow", batch_size=4096
    )
    parts = []
    for t in partial.iter_batches(batch_format="pyarrow", batch_size=65536):
        parts.append(
            (
                t["query_id"].to_numpy(zero_copy_only=False),
                t["key"].to_numpy(zero_copy_only=False),
                t["cosine"].to_numpy(zero_copy_only=False),
            )
        )
    return _topk_merge(parts, k, nq)


# --- bucketed LSH index: the 10^12-scale layout ---------------------------

def build_lsh_index(
    ds: Dataset, index_dir: str, key_col: str, vec_col: str,
    num_planes: int = 8, seed: int = 42,
) -> dict:
    """Write the corpus partitioned by LSH bucket (one parquet dir per
    bucket) so a query touches only its probe buckets' partitions — the
    scale path where brute_force_knn's full scan stops being viable. One
    pass, one write, no shuffle (partitioned write groups by bucket)."""
    import json
    import os

    rng = np.random.default_rng(seed)
    meta = {"num_planes": num_planes, "seed": seed,
            "key_col": key_col, "vec_col": vec_col}

    def tag(t: pa.Table) -> pa.Table:
        m = vec_matrix(t[vec_col])
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        r = np.random.default_rng(seed)
        planes = r.standard_normal((m.shape[1], num_planes))
        bits = (mn @ planes > 0).astype(np.uint32)
        bucket = (bits * (1 << np.arange(num_planes, dtype=np.uint32))).sum(axis=1)
        return pa.table({
            key_col: t[key_col],
            vec_col: t[vec_col],
            "bucket": pa.array(bucket.astype(np.int32), pa.int32()),
        })

    ds.select_columns([key_col, vec_col]).map_batches(
        tag, batch_format="pyarrow"
    ).write_parquet(index_dir, partition_cols=["bucket"], mode="overwrite")
    with open(os.path.join(index_dir, "lsh_meta.json"), "w") as f:
        json.dump(meta, f)
    return meta


def lsh_index_search(
    index_dir: str, queries: np.ndarray, k: int = 10, probes: int = 2,
) -> pa.Table:
    """ANN over the bucketed layout: compute each query's bucket, expand to
    every bucket within `probes` bit flips, and scan ONLY those partitions
    (multiprobe LSH; the reference-scale win is the partition pruning)."""
    import itertools
    import json
    import os

    import ray.data

    with open(os.path.join(index_dir, "lsh_meta.json")) as f:
        meta = json.load(f)
    num_planes = meta["num_planes"]
    key_col, vec_col = meta["key_col"], meta["vec_col"]
    qm = np.asarray(queries, dtype=np.float64)
    qm = qm / np.maximum(np.linalg.norm(qm, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(meta["seed"])
    planes = rng.standard_normal((qm.shape[1], num_planes))
    q_bits = ((qm @ planes > 0).astype(np.uint32)
              * (1 << np.arange(num_planes, dtype=np.uint32))).sum(axis=1)

    wanted: set[int] = set()
    for qb in q_bits.tolist():
        for r in range(probes + 1):
            for flips in itertools.combinations(range(num_planes), r):
                b = qb
                for f in flips:
                    b ^= 1 << f
                wanted.add(int(b))
    dirs = [os.path.join(index_dir, f"bucket={b}") for b in sorted(wanted)]
    dirs = [d for d in dirs if os.path.exists(d)]
    if not dirs:
        return _topk_merge([], k, len(qm))
    from ..index.build import expand_parquet_dirs

    ds = ray.data.read_parquet(expand_parquet_dirs(dirs))
    q_ref = ray.put(qm)
    nq = len(qm)

    def scan(t: pa.Table) -> pa.Table:
        q = ray.get(q_ref)
        m = vec_matrix(t[vec_col])
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        sims = q @ m.T
        keys = t[key_col].to_numpy(zero_copy_only=False)
        kk = min(k, sims.shape[1])
        idx = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        return pa.table({
            "query_id": pa.array(np.repeat(np.arange(nq, dtype=np.int64), kk)),
            "key": pa.array(keys[idx.ravel()], pa.int64()),
            "cosine": pa.array(np.take_along_axis(sims, idx, axis=1).ravel(),
                               pa.float64()),
        })

    partial = ds.map_batches(scan, batch_format="pyarrow", batch_size=4096)
    parts = [
        (t["query_id"].to_numpy(zero_copy_only=False),
         t["key"].to_numpy(zero_copy_only=False),
         t["cosine"].to_numpy(zero_copy_only=False))
        for t in partial.iter_batches(batch_format="pyarrow", batch_size=65536)
    ]
    return _topk_merge(parts, k, nq)
