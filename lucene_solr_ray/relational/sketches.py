"""Mergeable sketches: HyperLogLog and t-digest.

The reference's distributed facet aggregations ship sketch partials from
shards and merge at the coordinator (HLLAgg.java:32 approx-distinct,
PercentileAgg.java:43 t-digest percentiles). Here each map_batches task
emits one serialized sketch per batch and a tiny driver/groupby stage
merges them — the partial+final pattern that keeps the shuffle at one row
per batch regardless of input size.

Implementations are small, standard, from the published algorithms
(Flajolet et al. 2007 HLL; Dunning & Ertl t-digest, simplified cluster
merge); accuracy is property-tested against exact answers.
"""

from __future__ import annotations

import hashlib
import pickle

import numpy as np
import pyarrow as pa

from ray.data import Dataset


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------

class HLL:
    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.regs = np.zeros(self.m, dtype=np.uint8)

    def add_hashes(self, h: np.ndarray) -> None:
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = h << np.uint64(self.p)
        # leading zeros via the float64 exponent (exact for the top bits)
        lz = np.full(len(h), 64 - self.p, dtype=np.int64)
        nz = rest != 0
        if nz.any():
            exp = np.frexp(rest[nz].astype(np.float64))[1]  # bit length
            lz[nz] = np.clip(64 - exp, 0, 64 - self.p)
        rank = (lz + 1).astype(np.uint8)
        np.maximum.at(self.regs, idx, rank)

    def add_values(self, values) -> None:
        h = np.array(
            [int.from_bytes(hashlib.blake2b(str(v).encode(), digest_size=8).digest(), "big")
             for v in values],
            dtype=np.uint64,
        )
        if len(h):
            self.add_hashes(h)

    def merge(self, other: "HLL") -> "HLL":
        assert self.p == other.p
        out = HLL(self.p)
        out.regs = np.maximum(self.regs, other.regs)
        return out

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        inv = np.power(2.0, -self.regs.astype(np.float64))
        e = alpha * m * m / inv.sum()
        if e <= 2.5 * m:
            zeros = int((self.regs == 0).sum())
            if zeros:
                e = m * np.log(m / zeros)
        return float(e)

    def dumps(self) -> bytes:
        return pickle.dumps((self.p, self.regs))

    @staticmethod
    def loads(b: bytes) -> "HLL":
        p, regs = pickle.loads(b)
        h = HLL(p)
        h.regs = regs
        return h


def approx_count_distinct(ds: Dataset, col: str, p: int = 12) -> float:
    """HLLAgg: approximate distinct count, one sketch row per batch."""

    def partial(t: pa.Table) -> pa.Table:
        h = HLL(p)
        h.add_values(t[col].to_pylist())
        return pa.table({"sketch": pa.array([h.dumps()], pa.large_binary())})

    parts = ds.select_columns([col]).map_batches(partial, batch_format="pyarrow")
    acc: HLL | None = None
    for b in parts.iter_batches(batch_format="pyarrow", batch_size=256):
        for s in b["sketch"].to_pylist():
            h = HLL.loads(s)
            acc = h if acc is None else acc.merge(h)
    return acc.estimate() if acc else 0.0


# ---------------------------------------------------------------------------
# t-digest (simplified: weighted centroid compression)
# ---------------------------------------------------------------------------

class TDigest:
    def __init__(self, compression: int = 200):
        self.compression = compression
        self.means = np.zeros(0, dtype=np.float64)
        self.weights = np.zeros(0, dtype=np.float64)

    def add(self, values: np.ndarray, weights: np.ndarray | None = None) -> None:
        v = np.asarray(values, dtype=np.float64)
        w = np.ones(len(v)) if weights is None else np.asarray(weights, dtype=np.float64)
        self.means = np.concatenate([self.means, v])
        self.weights = np.concatenate([self.weights, w])
        if len(self.means) > 8 * self.compression:
            self._compress()

    def _compress(self) -> None:
        if not len(self.means):
            return
        order = np.argsort(self.means)
        m, w = self.means[order], self.weights[order]
        total = w.sum()
        q = (np.cumsum(w) - w / 2) / total
        # k-scale function (Dunning): bucket by arcsine scale
        k = (self.compression / np.pi) * np.arcsin(2 * q - 1)
        bucket = np.floor(k).astype(np.int64)
        # merge runs with equal bucket
        brk = np.empty(len(bucket), dtype=bool)
        brk[0] = True
        brk[1:] = bucket[1:] != bucket[:-1]
        starts = np.flatnonzero(brk)
        sw = np.add.reduceat(w, starts)
        sm = np.add.reduceat(m * w, starts) / sw
        self.means, self.weights = sm, sw

    def merge(self, other: "TDigest") -> "TDigest":
        out = TDigest(self.compression)
        out.add(self.means, self.weights)
        out.add(other.means, other.weights)
        out._compress()
        return out

    def quantile(self, q: float) -> float:
        self._compress()
        if not len(self.means):
            return float("nan")
        order = np.argsort(self.means)
        m, w = self.means[order], self.weights[order]
        cum = np.cumsum(w) - w / 2
        target = q * w.sum()
        return float(np.interp(target, cum, m))

    def dumps(self) -> bytes:
        return pickle.dumps((self.compression, self.means, self.weights))

    @staticmethod
    def loads(b: bytes) -> "TDigest":
        c, m, w = pickle.loads(b)
        t = TDigest(c)
        t.means, t.weights = m, w
        return t


def approx_quantiles(ds: Dataset, col: str, qs: list[float],
                     compression: int = 200) -> list[float]:
    """PercentileAgg: t-digest partial per batch, merged on the driver."""

    def partial(t: pa.Table) -> pa.Table:
        td = TDigest(compression)
        td.add(t[col].to_numpy(zero_copy_only=False))
        return pa.table({"sketch": pa.array([td.dumps()], pa.large_binary())})

    parts = ds.select_columns([col]).map_batches(partial, batch_format="pyarrow")
    acc: TDigest | None = None
    for b in parts.iter_batches(batch_format="pyarrow", batch_size=256):
        for s in b["sketch"].to_pylist():
            td = TDigest.loads(s)
            acc = td if acc is None else acc.merge(td)
    return [acc.quantile(q) for q in qs] if acc else [float("nan")] * len(qs)
