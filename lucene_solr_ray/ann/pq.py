"""Product quantization for ANN at scale (Jégou, Douze, Schmid 2011,
"Product Quantization for Nearest Neighbor Search" — public paper; the
composition with the coarse IVF quantizer is that paper's IVFADC).

A D-dim vector splits into M subvectors; each subspace trains its own
256-centroid codebook on a BOUNDED driver-side sample, so a vector stores
as M uint8 codes — 4-16x memory compression, the difference between an
embedding corpus fitting in cluster RAM or not at 100 TB. Query-time
scoring is ADC (asymmetric distance computation): one (M x 256) table of
query-subvector-to-centroid dot products per query, then a vectorized
table-gather sum per encoded batch — no float vector is ever touched
after encoding.

Pipeline shape: training samples to the driver once (like ivf.py);
encoding is a stateless map_batches (codebooks broadcast via ray.put);
search is a map_batches partial top-k merge, the brute_force_knn pattern
over codes instead of floats.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset

from ..util.vectors import vec_matrix


def _kmeans(x: np.ndarray, k: int, iters: int, seed: int) -> np.ndarray:
    """Plain deterministic k-means (L2) for one subspace.

    Distances use the ||x||^2 - 2 x.c + ||c||^2 identity (one n x k
    matmul) instead of broadcasting an (n, k, d) tensor — at the default
    sample 65536 with k=256 the tensor form is a multi-GB driver
    temporary per iteration; the matmul form peaks at n x k float64."""
    rng = np.random.RandomState(seed)
    k = min(k, len(x))
    cents = x[rng.choice(len(x), size=k, replace=False)].copy()
    xsq = (x ** 2).sum(axis=1)
    chunk = 16384  # bounds the distance matrix at chunk x k float64
    assign = np.empty(len(x), np.int64)
    dmin = np.empty(len(x))
    for _ in range(iters):
        csq = (cents ** 2).sum(axis=1)
        for s in range(0, len(x), chunk):
            e = min(s + chunk, len(x))
            d = xsq[s:e, None] - 2.0 * (x[s:e] @ cents.T) + csq[None, :]
            assign[s:e] = d.argmin(axis=1)
            dmin[s:e] = d.min(axis=1)
        for j in range(k):
            m = assign == j
            if m.any():
                cents[j] = x[m].mean(axis=0)
            else:  # dead centroid: reseed to the farthest point
                cents[j] = x[dmin.argmax()]
    return cents


def train_pq(ds: Dataset, vec_col: str, m: int = 8, k: int = 256,
             sample_size: int = 65536, iters: int = 8,
             seed: int = 42) -> np.ndarray:
    """Codebooks (m, k, d/m) from a bounded sample. D must divide by m."""
    n_total = ds.count()
    frac = min(1.0, sample_size / max(1, n_total))
    sample = ds.select_columns([vec_col]) if frac >= 1.0 else \
        ds.select_columns([vec_col]).random_sample(frac, seed=seed)
    x = np.asarray(sample.to_pandas()[vec_col].tolist(), dtype=np.float64)
    d = x.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    sub = d // m
    books = np.stack([
        _kmeans(np.ascontiguousarray(x[:, i * sub:(i + 1) * sub]),
                k, iters, seed + i)
        for i in range(m)
    ])
    return books  # (m, k, sub)


def pq_encode(ds: Dataset, key_col: str, vec_col: str,
              books: np.ndarray) -> Dataset:
    """-> Dataset of (key, codes list<uint8>[m]); codebooks broadcast."""
    ref = ray.put(np.asarray(books, dtype=np.float64))

    def enc(t: pa.Table) -> pa.Table:
        bk = ray.get(ref)
        m, k, sub = bk.shape
        x = vec_matrix(t[vec_col])
        codes = np.empty((len(x), m), dtype=np.uint8)
        for i in range(m):
            xs = x[:, i * sub:(i + 1) * sub]
            # ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2 ; argmin over c
            d = -2.0 * (xs @ bk[i].T) + (bk[i] ** 2).sum(axis=1)[None, :]
            codes[:, i] = d.argmin(axis=1).astype(np.uint8)
        flat = pa.array(codes.ravel(), pa.uint8())
        offs = pa.array(np.arange(len(x) + 1, dtype=np.int32) * m)
        return pa.table({
            key_col: t[key_col],
            "codes": pa.ListArray.from_arrays(offs, flat),
        })

    return ds.select_columns([key_col, vec_col]).map_batches(
        enc, batch_format="pyarrow")


def pq_decode(codes: np.ndarray, books: np.ndarray) -> np.ndarray:
    """Reconstructed vectors (the quantization the ADC scores against)."""
    m, _, sub = books.shape
    out = np.empty((len(codes), m * sub), dtype=np.float64)
    for i in range(m):
        out[:, i * sub:(i + 1) * sub] = books[i][codes[:, i]]
    return out


def pq_search(codes_ds: Dataset, key_col: str, books: np.ndarray,
              queries: np.ndarray, k: int = 10,
              metric: str = "ip") -> pa.Table:
    """ADC top-k: per query one (m x 256) lookup table; each batch scores
    as a table-gather sum over its uint8 codes. metric 'ip' (dot product,
    table = q_sub . centroids) or 'l2' (table = ||q_sub - c||^2, summed
    subspace-wise — exact for the quantized vectors)."""
    q = np.asarray(queries, dtype=np.float64)
    books = np.asarray(books, dtype=np.float64)
    m, kk, sub = books.shape
    tables = np.empty((len(q), m, kk))
    for i in range(m):
        qs = q[:, i * sub:(i + 1) * sub]
        if metric == "ip":
            tables[:, i, :] = qs @ books[i].T
        elif metric == "l2":
            tables[:, i, :] = (-2.0 * (qs @ books[i].T)
                               + (books[i] ** 2).sum(axis=1)[None, :]
                               + (qs ** 2).sum(axis=1)[:, None])
        else:
            raise ValueError(f"unknown metric {metric!r}")
    t_ref = ray.put(tables)
    sign = 1.0 if metric == "ip" else -1.0  # ip: larger better; l2: smaller
    nq = len(q)

    def scan(t: pa.Table) -> pa.Table:
        tab = ray.get(t_ref)
        lst = t["codes"].combine_chunks()
        codes = np.asarray(lst.values.to_numpy(zero_copy_only=False),
                           dtype=np.int64).reshape(-1, m)
        keys = t[key_col].to_numpy(zero_copy_only=False)
        # scores[q, n] = sum_i tab[q, i, codes[n, i]]
        scores = np.zeros((len(tab), len(codes)))
        for i in range(m):
            scores += tab[:, i, codes[:, i]]
        scores *= sign
        kk2 = min(k, scores.shape[1])
        idx = np.argpartition(-scores, kk2 - 1, axis=1)[:, :kk2]
        return pa.table({
            "query_id": pa.array(
                np.repeat(np.arange(len(tab), dtype=np.int64), kk2)),
            key_col: pa.array(keys[idx.ravel()]),
            "score": pa.array(
                np.take_along_axis(scores, idx, axis=1).ravel(),
                pa.float64()),
        })

    parts = [b for b in codes_ds.map_batches(
        scan, batch_format="pyarrow").iter_batches(batch_format="pyarrow")]
    cat = pa.concat_tables([p for p in parts if p.num_rows])
    out_q, out_k, out_s = [], [], []
    qid = cat["query_id"].to_numpy()
    ks = cat[key_col].to_numpy(zero_copy_only=False)
    sc = cat["score"].to_numpy()
    for qi in range(nq):
        mq = qid == qi
        order = np.lexsort((ks[mq], -sc[mq]))[:k]
        out_q.extend([qi] * len(order))
        out_k.extend(ks[mq][order])
        out_s.extend(sc[mq][order])
    # carry the key column's original Arrow type through (string or other
    # non-int keys encode fine; hardcoding int64 here would raise)
    key_type = cat.schema.field(key_col).type
    return pa.table({
        "query_id": pa.array(out_q, pa.int64()),
        key_col: pa.array(out_k, key_type),
        "score": pa.array(out_s, pa.float64()),
    })
