"""Pluggable similarities: BM25 (default), classic TF-IDF, LM Dirichlet,
Boolean.

The reference exposes scoring as a Similarity SPI
(search/similarities/Similarity.java:88, ClassicSimilarity.java:29,
LMDirichletSimilarity.java:59, BooleanSimilarity.java:29). Here a
Similarity builds per-term weight objects whose ``score(freqs, norms,
dtype)`` method is the vectorized SimScorer; every execution kernel
(term/phrase/WAND/block-max/spans/intervals) scores through
``score_postings`` which delegates to the weight, so any similarity rides
the whole pruned-search machinery unchanged.

Block-max safety: WAND/BMW bounds are computed by scoring each block's
(max_freq, min_norm) impact through the SAME weight object, so pruning
stays correct for any similarity that is monotone non-decreasing in freq
and non-increasing in doc length — true for all four here.

``dtype=float32`` mirrors the reference's float rounding; ``float64`` is
the oracle mode for the DuckDB SQL cross-checks.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

from ..util.smallfloat import LENGTH_TABLE
from .bm25 import BM25Params, TermWeight, multi_term_weight, term_weight


@dataclass
class ClassicWeight(TermWeight):
    """TF-IDF: score = weight * sqrt(freq) * 1/sqrt(doclen)
    (TFIDFSimilarity.java:390-436, ClassicSimilarity.java:40-57);
    ``cache`` holds the 256-entry lengthNorm table."""

    def score(self, freqs, norms, dtype=np.float32):
        inv = self.cache[norms.astype(np.int64)]
        if dtype == np.float32:
            w = np.float32(self.weight)
            return (w * np.sqrt(freqs.astype(np.float32)) * inv).astype(np.float32)
        return float(self.weight) * np.sqrt(freqs.astype(np.float64)) * inv


@dataclass
class LMDirichletWeight(TermWeight):
    """score = boost * max(0, ln(1 + freq/(mu*p)) + ln(mu/(dl + mu)))
    with p = (ttf+1)/(sum_ttf+1) (LMDirichletSimilarity.java:59-77,
    LMSimilarity.java collection model). ``cache`` holds the per-norm
    ln(mu/(dl+mu)) addend; ``weight`` is the boost."""

    inv_mup: float = 0.0   # 1 / (mu * collection_probability)

    def score(self, freqs, norms, dtype=np.float32):
        # ln(1 + x), not log1p: matches the reference's Math.log(1 + ...)
        # and the SQL oracle's ln(1 + ...) bit-for-bit in double
        add = self.cache[norms.astype(np.int64)]
        if dtype == np.float32:
            s = (np.float32(self.weight)
                 * (np.log(np.float32(1.0)
                           + freqs.astype(np.float32) * np.float32(self.inv_mup))
                    + add)).astype(np.float32)
        else:
            s = float(self.weight) * (
                np.log(1.0 + freqs.astype(np.float64) * float(self.inv_mup)) + add)
        return np.maximum(s, 0, out=s)


@dataclass
class BooleanWeight(TermWeight):
    """score = boost, independent of freq/norm (BooleanSimilarity.java:29)."""

    def score(self, freqs, norms, dtype=np.float32):
        return np.full(len(freqs), self.weight, dtype=dtype)


class Similarity:
    """Base SPI: builds weight objects from global stats. Subclass and
    override ``weight``/``multi_weight`` (the createWeight step); pass the
    instance as ``IndexSearcher(..., params=sim)``."""

    def weight(self, df: int, ttf: int, doc_count: int, sum_ttf: int,
               boost: float, dtype) -> TermWeight:
        raise NotImplementedError

    def multi_weight(self, dfs, ttfs, doc_count: int, sum_ttf: int,
                     boost: float, dtype) -> TermWeight:
        """Phrase/span pseudo-term: blended stats (df=min, ttf summed —
        the reference's idfExplain over a TermStatistics array)."""
        return self.weight(min(dfs) if len(dfs) else 0, int(sum(ttfs)),
                           doc_count, sum_ttf, boost, dtype)


class BM25Similarity(Similarity):
    def __init__(self, params: BM25Params = BM25Params()):
        self.params = params

    def weight(self, df, ttf, doc_count, sum_ttf, boost, dtype):
        return term_weight(df, doc_count, sum_ttf, self.params, boost, dtype)

    def multi_weight(self, dfs, ttfs, doc_count, sum_ttf, boost, dtype):
        return multi_term_weight(dfs, doc_count, sum_ttf, self.params, boost,
                                 dtype)


def _length_norm_table(dtype) -> np.ndarray:
    lt = np.maximum(LENGTH_TABLE.astype(np.float64), 1.0)
    tab = 1.0 / np.sqrt(lt)
    return tab.astype(np.float32) if dtype == np.float32 else tab


class ClassicSimilarity(Similarity):
    """idf = ln((N+1)/(df+1)) + 1, summed across phrase terms."""

    def _idf(self, df, doc_count, dtype):
        v = math.log((doc_count + 1) / (df + 1)) + 1.0
        return float(np.float32(v)) if dtype == np.float32 else v

    def weight(self, df, ttf, doc_count, sum_ttf, boost, dtype):
        w = boost * self._idf(df, doc_count, dtype)
        return ClassicWeight(weight=w, cache=_length_norm_table(dtype),
                             df=df, max_score=math.inf)

    def multi_weight(self, dfs, ttfs, doc_count, sum_ttf, boost, dtype):
        idf = sum(self._idf(d, doc_count, dtype) for d in dfs)
        return ClassicWeight(weight=boost * idf,
                             cache=_length_norm_table(dtype),
                             df=min(dfs) if len(dfs) else 0,
                             max_score=math.inf)


@dataclass
class SweetSpotWeight(TermWeight):
    """score = weight * baselineTf(freq) * lengthNorm(dl)
    (lucene/misc/.../SweetSpotSimilarity.java:117-133 lengthNorm plateau,
    :158-165 baselineTf); ``cache`` holds the plateau lengthNorm table."""
    tf_base: float = 0.0
    tf_min: float = 0.0

    def score(self, freqs, norms, dtype=np.float32):
        inv = self.cache[norms.astype(np.int64)]
        f = freqs.astype(np.float64)
        tf = np.where(
            f <= 0.0, 0.0,
            np.where(f <= self.tf_min, self.tf_base,
                     np.sqrt(f + self.tf_base * self.tf_base
                             - self.tf_min)))
        out = float(self.weight) * tf * inv.astype(np.float64)
        return out.astype(np.float32) if dtype == np.float32 else out


class SweetSpotSimilarity(ClassicSimilarity):
    """SweetSpotSimilarity (lucene/misc/.../SweetSpotSimilarity.java:23):
    TF-IDF with a lengthNorm PLATEAU — 1.0 for doc lengths in
    [ln_min, ln_max], degrading as
    1/sqrt(steepness*(|dl-min| + |dl-max| - (max-min)) + 1) outside —
    and a baseline tf floor: tf(f) = tf_base for 0 < f <= tf_min, else
    sqrt(f + tf_base^2 - tf_min). Defaults degrade to ClassicSimilarity."""

    def __init__(self, ln_min: int = 1, ln_max: int = 1,
                 steepness: float = 0.5, tf_base: float = 0.0,
                 tf_min: float = 0.0):
        self.ln_min = int(ln_min)
        self.ln_max = int(ln_max)
        self.steepness = float(steepness)
        self.tf_base = float(tf_base)
        self.tf_min = float(tf_min)

    def _table(self, dtype) -> np.ndarray:
        dl = LENGTH_TABLE.astype(np.float64)
        tab = 1.0 / np.sqrt(
            self.steepness * (np.abs(dl - self.ln_min)
                              + np.abs(dl - self.ln_max)
                              - (self.ln_max - self.ln_min)) + 1.0)
        return tab.astype(np.float32) if dtype == np.float32 else tab

    def weight(self, df, ttf, doc_count, sum_ttf, boost, dtype):
        w = boost * self._idf(df, doc_count, dtype)
        return SweetSpotWeight(weight=w, cache=self._table(dtype), df=df,
                               max_score=math.inf, tf_base=self.tf_base,
                               tf_min=self.tf_min)

    def multi_weight(self, dfs, ttfs, doc_count, sum_ttf, boost, dtype):
        idf = sum(self._idf(d, doc_count, dtype) for d in dfs)
        return SweetSpotWeight(weight=boost * idf, cache=self._table(dtype),
                               df=min(dfs) if len(dfs) else 0,
                               max_score=math.inf, tf_base=self.tf_base,
                               tf_min=self.tf_min)


class LMDirichletSimilarity(Similarity):
    def __init__(self, mu: float = 2000.0):
        self.mu = float(mu)

    def weight(self, df, ttf, doc_count, sum_ttf, boost, dtype):
        p = (ttf + 1.0) / (sum_ttf + 1.0)
        dl = np.maximum(LENGTH_TABLE.astype(np.float64), 0.0)
        cache = np.log(self.mu / (dl + self.mu))
        if dtype == np.float32:
            cache = cache.astype(np.float32)
        # max over norms of the addend is cache[0] (shortest doc); freq is
        # bounded by dl, but inf keeps the bound conservative — block-max
        # pruning uses per-block impacts, not this scalar
        return LMDirichletWeight(weight=boost, cache=cache, df=df,
                                 max_score=math.inf,
                                 inv_mup=1.0 / (self.mu * p))

    def multi_weight(self, dfs, ttfs, doc_count, sum_ttf, boost, dtype):
        return self.weight(min(dfs) if len(dfs) else 0, int(sum(ttfs)),
                           doc_count, sum_ttf, boost, dtype)


@dataclass
class LMJelinekMercerWeight(TermWeight):
    """score = boost * ln(1 + ((1-lambda) * freq / dl) / (lambda * p))
    with p = (ttf+1)/(sum_ttf+1) (LMJelinekMercerSimilarity.java:60-71).
    ``cache`` holds 1/dl per norm byte; ``ratio`` = (1-lambda)/(lambda*p)."""

    ratio: float = 0.0

    def score(self, freqs, norms, dtype=np.float32):
        inv_dl = self.cache[norms.astype(np.int64)]
        if dtype == np.float32:
            return np.log(np.float32(1.0)
                          + np.float32(self.ratio)
                          * freqs.astype(np.float32) * inv_dl
                          ).astype(np.float32) * np.float32(self.weight)
        return float(self.weight) * np.log(
            1.0 + float(self.ratio) * freqs.astype(np.float64) * inv_dl)


class LMJelinekMercerSimilarity(Similarity):
    """Jelinek-Mercer smoothed language model
    (LMJelinekMercerSimilarity.java:47)."""

    def __init__(self, lam: float = 0.7):
        assert 0.0 < lam < 1.0
        self.lam = float(lam)

    def weight(self, df, ttf, doc_count, sum_ttf, boost, dtype):
        p = (ttf + 1.0) / (sum_ttf + 1.0)
        dl = np.maximum(LENGTH_TABLE.astype(np.float64), 1.0)
        cache = 1.0 / dl
        if dtype == np.float32:
            cache = cache.astype(np.float32)
        return LMJelinekMercerWeight(
            weight=float(boost), cache=cache, df=df, max_score=math.inf,
            ratio=(1.0 - self.lam) / (self.lam * p))

    def multi_weight(self, dfs, ttfs, doc_count, sum_ttf, boost, dtype):
        return self.weight(min(dfs) if len(dfs) else 0, int(sum(ttfs)),
                           doc_count, sum_ttf, boost, dtype)


@dataclass
class DFRWeight(TermWeight):
    """DFR I(F)·B·H2 (DFRSimilarity.java:115, BasicModelIF.java:36,
    AfterEffectB.java:32, NormalizationH2.java:39):

      tfn   = freq * log2(1 + c * avgdl / dl)
      gain  = tf-normalized information: (F+1)/(df*(tfn+1))  [after-effect B]
      score = boost * gain * tfn * log2(1 + (N+1)/(F+0.5))   [basic model IF]

    ``cache`` holds log2(1 + c*avgdl/dl) per norm byte."""

    F: int = 0          # total term freq + 1 smoothing applied at use
    n_docs: int = 0

    def score(self, freqs, norms, dtype=np.float32):
        f64 = freqs.astype(np.float64)
        tfn = f64 * self.cache[norms.astype(np.int64)]
        gain = (self.F + 1.0) / (max(self.df, 1) * (tfn + 1.0))
        il = np.log2(1.0 + (self.n_docs + 1.0) / (self.F + 0.5))
        s = float(self.weight) * gain * tfn * il
        if dtype == np.float32:
            return s.astype(np.float32)
        return s


class DFRSimilarity(Similarity):
    """Divergence-from-randomness: basic model I(F), after-effect B,
    normalization H2 with parameter c."""

    def __init__(self, c: float = 1.0):
        self.c = float(c)

    def weight(self, df, ttf, doc_count, sum_ttf, boost, dtype):
        avgdl = sum_ttf / max(doc_count, 1)
        dl = np.maximum(LENGTH_TABLE.astype(np.float64), 1.0)
        cache = np.log2(1.0 + self.c * avgdl / dl)
        return DFRWeight(weight=float(boost), cache=cache, df=max(df, 1),
                         max_score=math.inf, F=int(ttf), n_docs=doc_count)

    def multi_weight(self, dfs, ttfs, doc_count, sum_ttf, boost, dtype):
        return self.weight(min(dfs) if len(dfs) else 0, int(sum(ttfs)),
                           doc_count, sum_ttf, boost, dtype)


class BooleanSimilarity(Similarity):
    def weight(self, df, ttf, doc_count, sum_ttf, boost, dtype):
        zeros = np.zeros(256, np.float32 if dtype == np.float32 else np.float64)
        return BooleanWeight(weight=float(boost), cache=zeros, df=df,
                             max_score=float(boost))

    def multi_weight(self, dfs, ttfs, doc_count, sum_ttf, boost, dtype):
        return self.weight(min(dfs) if len(dfs) else 0, 0, doc_count,
                           sum_ttf, boost, dtype)


def as_similarity(params) -> Similarity:
    """Normalize the searcher's ``params`` argument: BM25Params (legacy)
    or a Similarity instance."""
    if isinstance(params, Similarity):
        return params
    return BM25Similarity(params if isinstance(params, BM25Params) else BM25Params())


@dataclass
class AxiomaticF2EXPWeight(TermWeight):
    """F2EXP: score = boost * idf * freq/(freq + s + s*dl/avgdl) with
    idf = ((N+1)/df)^k (AxiomaticF2EXP.java tfln/idf, Axiomatic.java:89
    score composition; defaults s=0.25, k=0.35 from Axiomatic():45).
    ``cache`` holds (s + s*dl/avgdl) per norm byte; ``weight`` = boost*idf."""

    def score(self, freqs, norms, dtype=np.float32):
        f64 = freqs.astype(np.float64)
        s = float(self.weight) * f64 / (f64 + self.cache[norms.astype(np.int64)])
        if dtype == np.float32:
            return s.astype(np.float32)
        return s


class AxiomaticF2EXP(Similarity):
    """Axiomatic retrieval F2EXP (AxiomaticF2EXP.java:33)."""

    def __init__(self, s: float = 0.25, k: float = 0.35):
        self.s = float(s)
        self.k = float(k)

    def weight(self, df, ttf, doc_count, sum_ttf, boost, dtype):
        avgdl = sum_ttf / max(doc_count, 1)
        idf = (doc_count + 1.0) / max(df, 1)
        dl = np.maximum(LENGTH_TABLE.astype(np.float64), 0.0)
        cache = self.s + self.s * dl / avgdl
        return AxiomaticF2EXPWeight(weight=float(boost) * idf ** self.k,
                                    cache=cache, df=df, max_score=math.inf)

    def multi_weight(self, dfs, ttfs, doc_count, sum_ttf, boost, dtype):
        return self.weight(min(dfs) if len(dfs) else 0, int(sum(ttfs)),
                           doc_count, sum_ttf, boost, dtype)


@dataclass
class DFIWeight(TermWeight):
    """DFI with the standardized independence measure
    (DFISimilarity.java:63: expected = (F+1)*dl/(sum_dl+1); 0 when
    freq <= expected, else boost * log2((freq-expected)/sqrt(expected)+1);
    IndependenceStandardized.java:28). ``cache`` holds expected/dl factor
    (F+1)/(sum_dl+1) applied to the per-norm dl."""

    def score(self, freqs, norms, dtype=np.float32):
        f64 = freqs.astype(np.float64)
        expected = self.cache[norms.astype(np.int64)]
        measure = (f64 - expected) / np.sqrt(np.maximum(expected, 1e-300))
        # clamp keeps log2's domain valid for the masked (freq <= expected)
        # lanes; the where() zeroes them regardless
        s = float(self.weight) * np.log2(np.maximum(measure, 0.0) + 1.0)
        s = np.where(f64 <= expected, 0.0, s)
        if dtype == np.float32:
            return s.astype(np.float32)
        return s


class DFISimilarity(Similarity):
    """Divergence from independence (DFISimilarity.java:42)."""

    def weight(self, df, ttf, doc_count, sum_ttf, boost, dtype):
        dl = np.maximum(LENGTH_TABLE.astype(np.float64), 0.0)
        cache = (ttf + 1.0) * dl / (sum_ttf + 1.0)
        return DFIWeight(weight=float(boost), cache=cache, df=df,
                         max_score=math.inf)

    def multi_weight(self, dfs, ttfs, doc_count, sum_ttf, boost, dtype):
        return self.weight(min(dfs) if len(dfs) else 0, int(sum(ttfs)),
                           doc_count, sum_ttf, boost, dtype)


@dataclass
class IBWeight(TermWeight):
    """IB LL-D(F)-H2 (IBSimilarity.java:109 score = boost *
    distribution(normalization.tfn, lambda); DistributionLL.java:30
    -ln(lambda/(tfn+lambda)); LambdaDF.java:33 lambda = float((df+1)/(N+1));
    NormalizationH2 tfn = freq * log2(1 + c*avgdl/dl)). ``cache`` holds the
    per-norm log2 factor; ``lam`` keeps the reference's float cast."""

    lam: float = 0.5

    def score(self, freqs, norms, dtype=np.float32):
        tfn = freqs.astype(np.float64) * self.cache[norms.astype(np.int64)]
        s = float(self.weight) * np.log((tfn + self.lam) / self.lam)
        if dtype == np.float32:
            return s.astype(np.float32)
        return s


class IBSimilarity(Similarity):
    """Information-based similarity, LL distribution, DF lambda, H2
    normalization (IBSimilarity.java:70)."""

    def __init__(self, c: float = 1.0):
        self.c = float(c)

    def weight(self, df, ttf, doc_count, sum_ttf, boost, dtype):
        avgdl = sum_ttf / max(doc_count, 1)
        dl = np.maximum(LENGTH_TABLE.astype(np.float64), 1.0)
        cache = np.log2(1.0 + self.c * avgdl / dl)
        lam = float(np.float32((df + 1.0) / (doc_count + 1.0)))
        return IBWeight(weight=float(boost), cache=cache, df=df,
                        max_score=math.inf, lam=lam)

    def multi_weight(self, dfs, ttfs, doc_count, sum_ttf, boost, dtype):
        return self.weight(min(dfs) if len(dfs) else 0, int(sum(ttfs)),
                           doc_count, sum_ttf, boost, dtype)


@dataclass
class MultiWeight(TermWeight):
    """Sum of the sub-similarities' scores (MultiSimilarity.java:59
    SimScorer.score sums subScorers)."""

    subs: tuple = ()

    def score(self, freqs, norms, dtype=np.float32):
        s = self.subs[0].score(freqs, norms, dtype)
        for w in self.subs[1:]:
            s = s + w.score(freqs, norms, dtype)
        return s


class MultiSimilarity(Similarity):
    """MultiSimilarity (MultiSimilarity.java:31): delegates stats to every
    sub-similarity and sums their scores."""

    def __init__(self, sims):
        self.sims = tuple(sims)
        if not self.sims:
            raise ValueError("MultiSimilarity needs at least one sub")

    def weight(self, df, ttf, doc_count, sum_ttf, boost, dtype):
        subs = tuple(s.weight(df, ttf, doc_count, sum_ttf, boost, dtype)
                     for s in self.sims)
        return MultiWeight(weight=float(boost), cache=subs[0].cache, df=df,
                           max_score=sum(w.max_score for w in subs),
                           subs=subs)

    def multi_weight(self, dfs, ttfs, doc_count, sum_ttf, boost, dtype):
        subs = tuple(s.multi_weight(dfs, ttfs, doc_count, sum_ttf, boost,
                                    dtype) for s in self.sims)
        return MultiWeight(weight=float(boost), cache=subs[0].cache,
                           df=min(dfs) if len(dfs) else 0,
                           max_score=sum(w.max_score for w in subs),
                           subs=subs)


class PerFieldSimilarityWrapper(Similarity):
    """PerFieldSimilarityWrapper (similarities/PerFieldSimilarityWrapper.
    java:29): route each ANALYZED FIELD's namespaced terms to its own
    similarity. Resolution happens at weight-build time via the
    field-aware resolve_weights hook (set_field); the default similarity
    scores the main text field."""

    def __init__(self, default: Similarity, per_field: dict | None = None):
        self.default = default
        self.per_field = dict(per_field or {})
        self._current = default

    def set_field(self, field: str | None):
        self._current = self.per_field.get(field, self.default)

    def weight(self, df, ttf, doc_count, sum_ttf, boost, dtype):
        return self._current.weight(df, ttf, doc_count, sum_ttf, boost,
                                    dtype)

    def multi_weight(self, dfs, ttfs, doc_count, sum_ttf, boost, dtype):
        return self._current.multi_weight(dfs, ttfs, doc_count, sum_ttf,
                                          boost, dtype)
