"""BM25 scoring, float-exact to the reference's operation order.

Reference semantics (search/similarities/BM25Similarity.java:69-82,183-235):

  idf        = (float) ln(1 + (N - df + 0.5) / (df + 0.5))        [double -> f32]
  avgdl      = (float) (sumTotalTermFreq / (double) docCount)
  cache[i]   = 1f / (k1 * ((1 - b) + b * LENGTH_TABLE[i] / avgdl)) [all f32 ops]
  weight     = boost * idf                                         [f32]
  score      = weight - weight / (1f + freq * cache[norm])         [f32]

``dtype=float32`` replicates each rounding step with numpy float32 ops
(IEEE-754 binary32 round-to-nearest-even, identical to the JVM).
``dtype=float64`` is the oracle mode used for the DuckDB SQL cross-checks
(same formula, double precision end to end).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

from ..util.smallfloat import LENGTH_TABLE


@dataclass(frozen=True)
class BM25Params:
    k1: float = 1.2
    b: float = 0.75


@dataclass
class TermWeight:
    """BM25 per-term weight; subclasses (search/similarity.py) override
    ``score`` to plug alternative similarities into every execution path —
    the kernels all score through ``score_postings``, which delegates here
    (the reference's SimScorer polymorphism, Similarity.java:150)."""

    weight: float          # boost * idf, in scoring dtype
    cache: np.ndarray      # 256-entry per-norm table, scoring dtype
    df: int
    max_score: float       # upper bound: score at freq=+inf == weight
    # analyzed-field terms score against THEIR field's norms; None = the
    # main text field (set by resolve_weights, read by the norm lookups)
    norm_field: str | None = None

    def score(self, freqs: np.ndarray, norms: np.ndarray, dtype=np.float32) -> np.ndarray:
        inv = self.cache[norms.astype(np.int64)]
        if dtype == np.float32:
            one = np.float32(1.0)
            w = np.float32(self.weight)
            f = freqs.astype(np.float32)
            return (w - w / (one + f * inv)).astype(np.float32)
        w = float(self.weight)
        return w - w / (1.0 + freqs.astype(np.float64) * inv)


def _cache_f32(k1: float, b: float, avgdl: np.float32) -> np.ndarray:
    one = np.float32(1.0)
    k1f = np.float32(k1)
    bf = np.float32(b)
    lt = LENGTH_TABLE  # float32 already
    return (one / (k1f * ((one - bf) + (bf * lt) / avgdl))).astype(np.float32)


def _cache_f64(k1: float, b: float, avgdl: float) -> np.ndarray:
    lt = LENGTH_TABLE.astype(np.float64)
    return 1.0 / (k1 * ((1.0 - b) + b * lt / avgdl))


def term_weight(
    df: int,
    doc_count: int,
    sum_total_term_freq: int,
    params: BM25Params = BM25Params(),
    boost: float = 1.0,
    dtype=np.float32,
) -> TermWeight:
    idf64 = math.log(1 + (doc_count - df + 0.5) / (df + 0.5))
    if dtype == np.float32:
        idf = np.float32(idf64)
        avgdl = np.float32(np.float64(sum_total_term_freq) / np.float64(doc_count))
        cache = _cache_f32(params.k1, params.b, avgdl)
        weight = np.float32(np.float32(boost) * idf)
    else:
        idf = idf64
        avgdl = sum_total_term_freq / doc_count
        cache = _cache_f64(params.k1, params.b, avgdl)
        weight = boost * idf
    return TermWeight(weight=weight, cache=cache, df=df, max_score=float(weight))


def multi_term_weight(dfs, doc_count, sum_ttf, params=BM25Params(), boost=1.0, dtype=np.float32) -> TermWeight:
    """Summed-idf weight for phrase queries (reference: idfExplain over an
    array of TermStatistics sums the per-term idfs, BM25Similarity.java:170-181)."""
    idf64 = 0.0
    for df in dfs:
        idf64 += float(np.float32(math.log(1 + (doc_count - df + 0.5) / (df + 0.5))))
    if dtype == np.float32:
        idf = np.float32(idf64)
        avgdl = np.float32(np.float64(sum_ttf) / np.float64(doc_count))
        cache = _cache_f32(params.k1, params.b, avgdl)
        weight = np.float32(np.float32(boost) * idf)
    else:
        idf = idf64
        avgdl = sum_ttf / doc_count
        cache = _cache_f64(params.k1, params.b, avgdl)
        weight = boost * idf
    return TermWeight(weight=weight, cache=cache, df=min(dfs) if len(dfs) else 0, max_score=float(weight))


def score_postings(tw: TermWeight, freqs: np.ndarray, norms: np.ndarray, dtype=np.float32) -> np.ndarray:
    """Vectorized SimScorer.score(freq, norm) over posting arrays
    (polymorphic on the weight's similarity)."""
    return tw.score(freqs, norms, dtype)


def block_upper_bound(tw: TermWeight, max_freq: int, min_norm: int, dtype=np.float32) -> float:
    """Block-max score bound: score is monotone up in freq and down in
    (decoded) norm length, so score(max_freq, min_norm) dominates the block
    (the reduced form of the reference's impact frontier,
    CompetitiveImpactAccumulator.java:33-80)."""
    return float(
        score_postings(
            tw,
            np.asarray([max_freq]),
            np.asarray([min_norm]),
            dtype,
        )[0]
    )
