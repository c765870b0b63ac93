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
