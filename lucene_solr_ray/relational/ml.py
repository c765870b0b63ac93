"""Distributed model training / scoring (TextLogitStream role).

The reference's TextLogitStream trains logistic regression across shards by
shipping per-shard gradient partials to the coordinator each iteration
(solrj io/stream/TextLogitStream.java). Here each iteration is one
map_batches pass emitting a per-batch (gradient, loss, count) partial; the
driver sums partials and takes the step — weights are broadcast per
iteration via ray.put, read zero-copy in every task.

KnnStream-style scoring of a trained model is `score()` below (one
vectorized matmul per batch).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset

from ..util.vectors import vec_matrix


def _sigmoid(z: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-np.clip(z, -30, 30)))


def train_logistic(
    ds: Dataset, vec_col: str, label_col: str,
    iterations: int = 20, lr: float = 0.5, l2: float = 1e-4,
    dim: int | None = None,
) -> dict:
    """Full-batch gradient descent; returns weights/bias + loss history."""
    if dim is None:
        first = ds.take(1)[0]
        dim = len(first[vec_col])
    w = np.zeros(dim + 1, dtype=np.float64)  # [bias, weights]
    history = []
    for it in range(iterations):
        w_ref = ray.put(w)

        def grad_partial(t: pa.Table) -> pa.Table:
            wt = ray.get(w_ref)
            X = vec_matrix(t[vec_col])
            y = t[label_col].to_numpy(zero_copy_only=False).astype(np.float64)
            z = X @ wt[1:] + wt[0]
            p = _sigmoid(z)
            err = p - y
            g = np.concatenate([[err.sum()], X.T @ err])
            eps = 1e-12
            loss = -(y * np.log(p + eps) + (1 - y) * np.log(1 - p + eps)).sum()
            return pa.table({
                "g": pa.array([g.tobytes()], pa.large_binary()),
                "loss": pa.array([loss], pa.float64()),
                "n": pa.array([len(y)], pa.int64()),
            })

        total_g = np.zeros(dim + 1)
        total_loss = 0.0
        total_n = 0
        for b in ds.map_batches(grad_partial, batch_format="pyarrow",
                                batch_size=4096).iter_batches(batch_format="pyarrow"):
            for gb, lo, n in zip(b["g"].to_pylist(), b["loss"].to_pylist(), b["n"].to_pylist()):
                total_g += np.frombuffer(gb, dtype=np.float64)
                total_loss += lo
                total_n += n
        total_g /= total_n
        total_g[1:] += l2 * w[1:]
        w = w - lr * total_g
        history.append(total_loss / total_n)
    return {"bias": float(w[0]), "weights": w[1:], "loss_history": history}


def score_logistic(ds: Dataset, vec_col: str, key_col: str, model: dict) -> Dataset:
    """ModelStream/KnnStream scoring: broadcast model, one matmul per batch."""
    ref = ray.put((model["bias"], np.asarray(model["weights"], dtype=np.float64)))

    def sc(t: pa.Table) -> pa.Table:
        b, wt = ray.get(ref)
        X = vec_matrix(t[vec_col])
        p = _sigmoid(X @ wt + b)
        return pa.table({
            key_col: t[key_col],
            "prob": pa.array(p, pa.float64()),
            "pred": pa.array((p >= 0.5).astype(np.int32), pa.int32()),
        })

    return ds.map_batches(sc, batch_format="pyarrow", batch_size=4096)


def knn_classify(
    train_ds: Dataset, queries: np.ndarray, vec_col: str, label_col: str,
    k: int = 5,
) -> pa.Table:
    """kNN classifier (classification/KNearestNeighborClassifier.java:51):
    majority label among the k cosine-nearest training vectors; ties break
    to the smallest label. Distributed exactly like brute_force_knn — the
    query matrix broadcasts once, per-batch top-k partials merge on the
    driver."""
    qm = np.asarray(queries, dtype=np.float64)
    qm = qm / np.maximum(np.linalg.norm(qm, axis=1, keepdims=True), 1e-12)
    q_ref = ray.put(qm)
    nq = len(qm)

    def scan(t: pa.Table) -> pa.Table:
        q = ray.get(q_ref)
        m = vec_matrix(t[vec_col])
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        sims = q @ m.T
        labels = t[label_col].to_numpy(zero_copy_only=False)
        kk = min(k, sims.shape[1])
        idx = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        return pa.table({
            "query_id": pa.array(np.repeat(np.arange(nq, dtype=np.int64), kk)),
            "label": pa.array(labels[idx.ravel()].astype(np.int64), pa.int64()),
            "cosine": pa.array(np.take_along_axis(sims, idx, axis=1).ravel(),
                               pa.float64()),
        })

    partial = train_ds.select_columns([vec_col, label_col]).map_batches(
        scan, batch_format="pyarrow", batch_size=4096
    )
    parts = [b for b in partial.iter_batches(batch_format="pyarrow",
                                             batch_size=65536)]
    cat = pa.concat_tables(parts) if parts else None
    out_q, out_l = [], []
    for qi in range(nq):
        if cat is None:
            break
        mask = pa.compute.equal(cat["query_id"], qi)
        sub = cat.filter(mask)
        sims = sub["cosine"].to_numpy(zero_copy_only=False)
        labs = sub["label"].to_numpy(zero_copy_only=False)
        order = np.argsort(-sims, kind="stable")[:k]
        top_labs = labs[order]
        vals, counts = np.unique(top_labs, return_counts=True)
        best = vals[np.lexsort((vals, -counts))][0]
        out_q.append(qi)
        out_l.append(int(best))
    return pa.table({"query_id": pa.array(out_q, pa.int64()),
                     "label": pa.array(out_l, pa.int64())})


def select_features(ds: Dataset, vec_col: str, label_col: str,
                    top_k: int = 10, positive_label: int = 0) -> pa.Table:
    """Feature selection over a vector column (FeaturesSelectionStream role,
    solrj io/stream/FeaturesSelectionStream.java — the reference ranks
    boolean term features by information gain; continuous embedding
    dimensions are ranked by the two-sample t-score instead, a documented
    substitution). One map_batches pass emits per-class (count, sum, sum-of-
    squares) partials per dimension; the driver merges partials and ranks.

    Returns (dim 1-based, score) sorted score desc, dim asc, top_k rows."""

    def partial(t: pa.Table) -> pa.Table:
        X = vec_matrix(t[vec_col])
        y = (t[label_col].to_numpy(zero_copy_only=False) == positive_label)
        rows = []
        for cls in (0, 1):
            m = y if cls == 1 else ~y
            sub = X[m]
            rows.append((cls, len(sub), sub.sum(axis=0),
                         (sub * sub).sum(axis=0)))
        dim = X.shape[1]
        return pa.table({
            "cls": pa.array([r[0] for r in rows], pa.int32()),
            "n": pa.array([r[1] for r in rows], pa.int64()),
            "s": pa.FixedSizeListArray.from_arrays(
                pa.array(np.concatenate([np.asarray(r[2], np.float64)
                                         for r in rows]), pa.float64()), dim),
            "q": pa.FixedSizeListArray.from_arrays(
                pa.array(np.concatenate([np.asarray(r[3], np.float64)
                                         for r in rows]), pa.float64()), dim),
        })

    parts = ds.select_columns([vec_col, label_col]).map_batches(
        partial, batch_format="pyarrow", batch_size=4096
    )
    n = {0: 0, 1: 0}
    s: dict[int, np.ndarray] = {}
    q: dict[int, np.ndarray] = {}
    for b in parts.iter_batches(batch_format="pyarrow", batch_size=4096):
        cls = b["cls"].to_numpy(zero_copy_only=False)
        ns = b["n"].to_numpy(zero_copy_only=False)
        sm = vec_matrix(b["s"])
        qm = vec_matrix(b["q"])
        for i, c in enumerate(cls.tolist()):
            n[c] += int(ns[i])
            s[c] = s.get(c, 0) + sm[i]
            q[c] = q.get(c, 0) + qm[i]
    m1 = s[1] / n[1]
    m0 = s[0] / n[0]
    pooled = ((q[1] - s[1] * s[1] / n[1]) + (q[0] - s[0] * s[0] / n[0])) / (
        n[1] + n[0] - 2
    ) * (1.0 / n[1] + 1.0 / n[0])
    score = np.abs(m1 - m0) / np.sqrt(pooled)
    dims = np.arange(1, len(score) + 1)
    order = np.lexsort((dims, -score))[:top_k]
    return pa.table({
        "dim": pa.array(dims[order], pa.int64()),
        "score": pa.array(score[order], pa.float64()),
    })
