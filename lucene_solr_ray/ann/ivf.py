"""IVF (inverted-file) ANN index — the k-means scale path.

Complements the LSH-bucketed layout (knn.py): vectors are assigned to their
nearest spherical-k-means centroid and written partitioned by list id, so a
query scans only its `nprobe` closest lists' partitions. This is the
standard IVF-Flat layout (Jégou et al., "Product Quantization for Nearest
Neighbor Search", TPAMI 2011, §IV-A — the coarse quantizer without the PQ
codes; the reference's KnnStream is brute-force only, so this is a
beyond-reference scale component).

Scale design: training samples a BOUNDED number of vectors to the driver
(k-means over millions of centroids is not needed — lists ~ sqrt(N)); the
assignment pass is one map_batches with the centroid matrix in the closure
(kilobytes); the partitioned write is the only wide step (grouping by list
id at write time); search reads only nprobe/num_lists of the data.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset

from ..util.vectors import vec_matrix
from .knn import _topk_merge

META = "ivf_meta.json"
CENTROIDS = "centroids.npy"


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def train_centroids(ds: Dataset, vec_col: str, n_lists: int,
                    sample_size: int = 65536, iters: int = 10,
                    seed: int = 42) -> np.ndarray:
    """Spherical k-means over a bounded driver-side sample: assign by max
    dot product on unit vectors, recenter as the renormalized mean. Empty
    lists are re-seeded from the farthest points (standard k-means++-ish
    repair)."""
    n_total = ds.count()
    frac = min(1.0, sample_size / max(1, n_total))
    sample = ds.select_columns([vec_col]) if frac >= 1.0 else \
        ds.select_columns([vec_col]).random_sample(frac, seed=seed)
    df = sample.to_pandas()  # bounded by sample_size rows
    m = _normalize(np.asarray(df[vec_col].tolist(), dtype=np.float64))
    rng = np.random.default_rng(seed)
    n_lists = min(n_lists, len(m))
    cents = m[rng.choice(len(m), size=n_lists, replace=False)]
    for _ in range(iters):
        sims = m @ cents.T                      # (n, k)
        assign = np.argmax(sims, axis=1)
        new = np.zeros_like(cents)
        np.add.at(new, assign, m)
        counts = np.bincount(assign, minlength=n_lists)
        empty = counts == 0
        if empty.any():
            # re-seed empty lists from the worst-assigned points
            worst = np.argsort(sims[np.arange(len(m)), assign])
            new[empty] = m[worst[: int(empty.sum())]]
            counts[empty] = 1
        cents = _normalize(new / counts[:, None])
    return cents


def build_ivf_index(ds: Dataset, index_dir: str, key_col: str, vec_col: str,
                    n_lists: int = 64, sample_size: int = 65536,
                    iters: int = 10, seed: int = 42) -> dict:
    """Assign every vector to its nearest centroid and write the corpus
    partitioned by list id (one parquet dir per list). The centroid matrix
    rides in the task closure — it is tiny (n_lists x dim floats), so no
    broadcast machinery is needed."""
    cents = train_centroids(ds, vec_col, n_lists, sample_size, iters, seed)

    def tag(t: pa.Table) -> pa.Table:
        m = _normalize(vec_matrix(t[vec_col]))
        assign = np.argmax(m @ cents.T, axis=1)
        # list_id duplicates the partition column: partitioned writes move
        # "list" into the directory path, and explicit-dir reads need the
        # id back as a data column for the per-query probe mask
        return pa.table({
            key_col: t[key_col],
            vec_col: t[vec_col],
            "list": pa.array(assign.astype(np.int32), pa.int32()),
            "list_id": pa.array(assign.astype(np.int32), pa.int32()),
        })

    ds.select_columns([key_col, vec_col]).map_batches(
        tag, batch_format="pyarrow"
    ).write_parquet(index_dir, partition_cols=["list"], mode="overwrite")
    os.makedirs(index_dir, exist_ok=True)
    np.save(os.path.join(index_dir, CENTROIDS), cents)
    meta = {"n_lists": int(len(cents)), "key_col": key_col,
            "vec_col": vec_col, "seed": seed}
    with open(os.path.join(index_dir, META), "w") as f:
        json.dump(meta, f)
    return meta


def ivf_index_search(index_dir: str, queries: np.ndarray, k: int = 10,
                     nprobe: int = 4) -> pa.Table:
    """Scan only the union of each query's nprobe nearest lists; within the
    scan, a query scores ONLY rows from its own probed lists (the per-row
    list id is masked against the per-query probe set — IVF semantics, not
    a free recall bonus from co-probed queries). nprobe == n_lists is an
    exact search (the brute-force parity path)."""
    import ray.data

    with open(os.path.join(index_dir, META)) as f:
        meta = json.load(f)
    cents = np.load(os.path.join(index_dir, CENTROIDS))
    key_col, vec_col = meta["key_col"], meta["vec_col"]
    n_lists = meta["n_lists"]
    nprobe = min(nprobe, n_lists)
    qm = _normalize(np.asarray(queries, dtype=np.float64))
    nq = len(qm)

    order = np.argsort(-(qm @ cents.T), axis=1)[:, :nprobe]   # (nq, nprobe)
    probe = np.zeros((nq, n_lists), dtype=bool)
    probe[np.repeat(np.arange(nq), nprobe), order.ravel()] = True
    wanted = sorted({int(b) for b in order.ravel()})

    dirs = [os.path.join(index_dir, f"list={b}") for b in wanted]
    dirs = [d for d in dirs if os.path.exists(d)]
    if not dirs:
        return _topk_merge([], k, nq)
    from ..index.build import expand_parquet_dirs

    ds = ray.data.read_parquet(expand_parquet_dirs(dirs))
    q_ref = ray.put(qm)
    probe_ref = ray.put(probe)

    def scan(t: pa.Table) -> pa.Table:
        q = ray.get(q_ref)
        pr = ray.get(probe_ref)
        m = _normalize(vec_matrix(t[vec_col]))
        sims = q @ m.T                                    # (nq, rows)
        lists = t["list_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        sims = np.where(pr[:, lists], sims, -np.inf)
        keys = t[key_col].to_numpy(zero_copy_only=False)
        kk = min(k, sims.shape[1])
        idx = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        top = np.take_along_axis(sims, idx, axis=1)
        qid = np.repeat(np.arange(nq, dtype=np.int64), kk)
        keep = np.isfinite(top.ravel())
        return pa.table({
            "query_id": pa.array(qid[keep]),
            "key": pa.array(keys[idx.ravel()][keep], pa.int64()),
            "cosine": pa.array(top.ravel()[keep], pa.float64()),
        })

    partial = ds.map_batches(scan, batch_format="pyarrow", batch_size=4096)
    parts = [
        (t["query_id"].to_numpy(zero_copy_only=False),
         t["key"].to_numpy(zero_copy_only=False),
         t["cosine"].to_numpy(zero_copy_only=False))
        for t in partial.iter_batches(batch_format="pyarrow")
    ]
    return _topk_merge(parts, k, nq)
