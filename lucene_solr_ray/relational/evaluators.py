"""Extended evaluator families for the streaming-expression language.

The reference ships 249 evaluator classes under
solr/solrj/src/java/org/apache/solr/client/solrj/io/eval/ registered by
name in Lang.java:117-361; streams.py carries the arithmetic / boolean /
string / temporal core. This module adds the math-heavy families —
matrices, sequences, time series, statistics (with real t/F p-values),
probability distributions, model-fit + predict, clustering, FFT — as pure
numpy kernels. They are merged into the same registry, so
`let(a=array(...), m=movingAvg(a, 3), ...)` works exactly like the
reference's /stream math expressions.

Design note (scale): like the reference — where every math evaluator runs
on the coordinator over arrays materialized with col()/let() — these
operate on driver-scale vectors and matrices, NOT on the distributed
Dataset path. The distributed analogs live in relational.ops /
relational.ml (rollup, stats, train, significantTerms, ...). Anything
random (sample(), kmeans init) uses a fixed seed so results are
reproducible under the driver's repeated runs; the reference draws from
commons-math's default RandomGenerator instead (documented divergence).

Numerical notes: the regularized incomplete beta function is implemented
with the standard continued-fraction expansion (Lentz's method, as in any
numerical-methods text); Student-t and F tail probabilities derive from it
analytically, so ttest()/pairedTtest()/anova()/corrPValues() return real
p-values without scipy. commons-math's Percentile/variance conventions
(sample variance, R-6-ish percentile) are matched where the core registry
already matches them.
"""

from __future__ import annotations

import math

import numpy as np

__all__ = ["EXTENDED_EVALUATORS"]


# ---------------------------------------------------------------------------
# coercion helpers
# ---------------------------------------------------------------------------

def _arr(x) -> np.ndarray:
    """1-D float array from list/ndarray/scalar-ish."""
    a = np.asarray(x)
    if a.dtype == object or a.dtype.kind in "US":
        a = a.astype(np.float64)
    if a.dtype.kind in "iub":
        a = a.astype(np.float64)
    return np.atleast_1d(a)


def _mat(x) -> np.ndarray:
    m = np.asarray(x, dtype=np.float64)
    return np.atleast_2d(m)


def _int(x) -> int:
    return int(float(x))


# ---------------------------------------------------------------------------
# special functions (no scipy in the container)
# ---------------------------------------------------------------------------

def _betainc(a: float, b: float, x: float) -> float:
    """Regularized incomplete beta I_x(a, b), continued fraction (Lentz)."""
    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    lbeta = math.lgamma(a + b) - math.lgamma(a) - math.lgamma(b)
    front = math.exp(lbeta + a * math.log(x) + b * math.log1p(-x))
    # symmetry: converges fast when x < (a+1)/(a+b+2)
    if x > (a + 1.0) / (a + b + 2.0):
        return 1.0 - _betainc(b, a, 1.0 - x)
    tiny = 1e-300
    f, c, d = 1.0, 1.0, 0.0
    for i in range(0, 400):
        m = i // 2
        if i == 0:
            num = 1.0
        elif i % 2 == 0:
            num = (m * (b - m) * x) / ((a + 2 * m - 1) * (a + 2 * m))
        else:
            num = -((a + m) * (a + b + m) * x) / ((a + 2 * m) * (a + 2 * m + 1))
        d = 1.0 + num * d
        if abs(d) < tiny:
            d = tiny
        d = 1.0 / d
        c = 1.0 + num / c
        if abs(c) < tiny:
            c = tiny
        f *= c * d
        if abs(1.0 - c * d) < 1e-14:
            break
    return front * (f - 1.0) / a


def _t_sf2(t: float, df: float) -> float:
    """Two-sided Student-t tail probability P(|T| >= |t|)."""
    t = abs(float(t))
    if df <= 0:
        return float("nan")
    return _betainc(df / 2.0, 0.5, df / (df + t * t))


def _f_sf(f: float, d1: float, d2: float) -> float:
    """Upper tail P(F >= f) for an F(d1, d2) statistic."""
    if f <= 0:
        return 1.0
    return _betainc(d2 / 2.0, d1 / 2.0, d2 / (d2 + d1 * f))


def _norm_cdf(x: float, mu: float = 0.0, sd: float = 1.0) -> float:
    return 0.5 * (1.0 + math.erf((x - mu) / (sd * math.sqrt(2.0))))


# ---------------------------------------------------------------------------
# matrices (eval/MatrixEvaluator.java and friends)
# ---------------------------------------------------------------------------

def _matrix(*rows):
    return np.vstack([_arr(r) for r in rows])


def _scalar_op(op):
    def apply(s, m):
        return op(np.asarray(m, dtype=np.float64), float(s))
    return apply


def _unitize(m):
    m = np.asarray(m, dtype=np.float64)
    if m.ndim == 1:
        n = np.linalg.norm(m)
        return m / n if n else m
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def _pair_sort(a, b):
    a, b = _arr(a), _arr(b)
    idx = np.argsort(a, kind="stable")
    return np.vstack([a[idx], b[idx]])


_MATRIX = {
    "matrix": _matrix,
    "transpose": lambda m: _mat(m).T,
    "rowAt": lambda m, i: _mat(m)[_int(i)],
    "colAt": lambda m, i: _mat(m)[:, _int(i)],
    "rowCount": lambda m: int(_mat(m).shape[0]),
    "columnCount": lambda m: int(_mat(m).shape[1]),
    "matrixMult": lambda a, b: _mat(a) @ _mat(b),
    "sumRows": lambda m: _mat(m).sum(axis=1),
    "sumColumns": lambda m: _mat(m).sum(axis=0),
    "grandSum": lambda m: float(_mat(m).sum()),
    "scalarAdd": _scalar_op(lambda m, s: m + s),
    "scalarSubtract": _scalar_op(lambda m, s: m - s),
    "scalarMultiply": _scalar_op(lambda m, s: m * s),
    "scalarDivide": _scalar_op(lambda m, s: m / s),
    "ebeAdd": lambda a, b: _arr(a) + _arr(b),
    "ebeSubtract": lambda a, b: _arr(a) - _arr(b),
    "ebeMultiply": lambda a, b: _arr(a) * _arr(b),
    "ebeDivide": lambda a, b: _arr(a) / _arr(b),
    "dotProduct": lambda a, b: float(np.dot(_arr(a), _arr(b))),
    "cosineSimilarity": lambda a, b: float(
        np.dot(_arr(a), _arr(b))
        / (np.linalg.norm(_arr(a)) * np.linalg.norm(_arr(b)))),
    "ones": lambda n: np.ones(_int(n)),
    "zeros": lambda n: np.zeros(_int(n)),
    "unitize": _unitize,
    "copyOf": lambda a, n=None: np.array(
        _arr(a)[: _int(n)] if n is not None else _arr(a)),
    "copyOfRange": lambda a, lo, hi: np.array(_arr(a)[_int(lo):_int(hi)]),
    "addAll": lambda *xs: np.concatenate([_arr(x) for x in xs]),
    "append": lambda a, v: np.append(_arr(a), float(v)),
    "pairSort": _pair_sort,
    "recip": lambda a: 1.0 / _arr(a),
    "scale": lambda s, a: float(s) * _arr(a),
    "indexOf": lambda a, v: int(np.nonzero(_arr(a) == float(v))[0][0])
        if np.any(_arr(a) == float(v)) else -1,
}


# ---------------------------------------------------------------------------
# sequences / combinatorics
# ---------------------------------------------------------------------------

def _primes(n, start=0):
    n, start = _int(n), _int(start)
    out: list[int] = []
    c = max(2, start)
    while len(out) < n:
        if all(c % p for p in range(2, int(math.isqrt(c)) + 1)):
            out.append(c)
        c += 1
    return np.asarray(out, dtype=np.float64)


_SEQ = {
    "sequence": lambda length, start, stride: (
        float(start) + float(stride) * np.arange(_int(length))),
    "natural": lambda n: np.arange(_int(n), dtype=np.float64),
    "repeat": lambda v, n: np.full(_int(n), float(v)),
    "primes": _primes,
    "factorial": lambda n: float(math.factorial(_int(n))),
    "binomialCoefficient": lambda n, k: float(math.comb(_int(n), _int(k))),
}


# ---------------------------------------------------------------------------
# time series (MovingAverageEvaluator.java etc.)
# ---------------------------------------------------------------------------

def _moving_windows(a, w):
    a, w = _arr(a), _int(w)
    if w > len(a):
        raise ValueError("window larger than array")
    return np.lib.stride_tricks.sliding_window_view(a, w)


def _exp_moving_avg(a, w, alpha=None):
    """First output = SMA of the first window; then standard EMA with
    alpha = 2/(window+1) (or the explicit third arg) over the remaining
    values (eval/ExponentialMovingAverageEvaluator.java:73-97 semantics)."""
    a, w = _arr(a), _int(w)
    alpha = 2.0 / (w + 1.0) if alpha is None else float(alpha)
    out = [float(np.mean(a[:w]))]
    for v in a[w:]:
        out.append((float(v) - out[-1]) * alpha + out[-1])
    return np.asarray(out)


def _find_delay(a, b):
    """Delay of b relative to a via cross-correlation
    (eval/FindDelayEvaluator.java:62-75: convolve a with reversed b, take
    the first index of max |value|; delay = index + 1 - len(b))."""
    a, b = _arr(a), _arr(b)
    conv = np.abs(np.convolve(a, b[::-1], mode="full"))
    return int(int(np.argmax(conv)) + 1 - len(b))


_TS = {
    "movingAvg": lambda a, w: _moving_windows(a, w).mean(axis=1),
    "movingMedian": lambda a, w: np.median(_moving_windows(a, w), axis=1),
    "movingMAD": lambda a, w: np.abs(
        _moving_windows(a, w)
        - _moving_windows(a, w).mean(axis=1, keepdims=True)).mean(axis=1),
    "expMovingAvg": _exp_moving_avg,
    "diff": lambda a, lag=1: _arr(a)[_int(lag):] - _arr(a)[:-_int(lag)],
    "conv": lambda a, b: np.convolve(_arr(a), _arr(b), mode="full"),
    "finddelay": _find_delay,
    "standardize": lambda a: (_arr(a) - np.mean(_arr(a)))
        / np.std(_arr(a), ddof=1),
}


# ---------------------------------------------------------------------------
# statistics (DescribeEvaluator.java, TTestEvaluator.java, ...)
# ---------------------------------------------------------------------------

def _describe(a):
    a = _arr(a)
    n = len(a)
    var = float(np.var(a, ddof=1)) if n > 1 else 0.0
    pos = a[a > 0]
    return {
        "N": float(n), "min": float(np.min(a)), "max": float(np.max(a)),
        "mean": float(np.mean(a)), "sum": float(np.sum(a)),
        "sumsq": float(np.sum(a * a)), "var": var,
        "stdev": math.sqrt(var), "popVar": float(np.var(a, ddof=0)),
        "geometricMean": float(np.exp(np.mean(np.log(pos))))
            if len(pos) == n else float("nan"),
    }


def _mode(a):
    vals, counts = np.unique(_arr(a), return_counts=True)
    return np.asarray(sorted(vals[counts == counts.max()].tolist()))


def _freq_table(a):
    a = _arr(a)
    vals, counts = np.unique(a, return_counts=True)
    total = counts.sum()
    cum = np.cumsum(counts)
    return [
        {"value": float(v), "count": int(c), "pct": float(c / total),
         "cumFreq": int(cf), "cumPct": float(cf / total)}
        for v, c, cf in zip(vals, counts, cum)
    ]


def _hist(a, bins=10):
    a = _arr(a)
    counts, edges = np.histogram(a, bins=_int(bins))
    out = []
    cum = 0
    for i, c in enumerate(counts):
        lo, hi = edges[i], edges[i + 1]
        inb = a[(a >= lo) & (a < hi if i < len(counts) - 1 else a <= hi)]
        cum += int(c)
        out.append({
            "min": float(lo), "max": float(hi), "N": int(c),
            "mean": float(np.mean(inb)) if len(inb) else 0.0,
            "cumFreq": cum,
        })
    return out


def _rank(a):
    """Average-tie natural ranking (commons-math NaturalRanking default,
    used by eval/RankEvaluator.java:35)."""
    a = _arr(a)
    order = np.argsort(a, kind="stable")
    ranks = np.empty(len(a))
    ranks[order] = np.arange(1, len(a) + 1)
    # average ties
    vals, inv, counts = np.unique(a, return_inverse=True, return_counts=True)
    sums = np.bincount(inv, weights=ranks)
    return (sums / counts)[inv]


class RegressModel(dict):
    """regress(x, y) result: dict of fit stats that also predicts."""

    def predict(self, x):
        x = np.asarray(x, dtype=np.float64)
        return self["intercept"] + self["slope"] * x


def _regress(x, y):
    x, y = _arr(x), _arr(y)
    n = len(x)
    slope, intercept = np.polyfit(x, y, 1)
    r = float(np.corrcoef(x, y)[0, 1])
    resid = y - (intercept + slope * x)
    rss = float(np.sum(resid**2))
    return RegressModel(
        slope=float(slope), intercept=float(intercept), R=r,
        RSquared=r * r, N=float(n), RSS=rss,
        SSE=rss, meanSquareError=rss / n,
    )


class OLSModel(dict):
    def predict(self, x):
        X = _mat(x)
        return self["intercept"] + X @ np.asarray(self["coefficients"])


def _ols_regress(X, y):
    X, y = _mat(X), _arr(y)
    A = np.column_stack([np.ones(len(y)), X])
    beta, *_ = np.linalg.lstsq(A, y, rcond=None)
    pred = A @ beta
    ss_res = float(np.sum((y - pred) ** 2))
    ss_tot = float(np.sum((y - y.mean()) ** 2))
    return OLSModel(
        intercept=float(beta[0]), coefficients=beta[1:],
        regressionParameters=beta, RSquared=1.0 - ss_res / ss_tot
            if ss_tot else float("nan"),
        residuals=y - pred,
    )


class PolyfitModel(np.ndarray):
    """polyfit returns the fitted curve (reference PolyFitEvaluator returns
    the smoothed values); the coefficients ride along for predict()."""

    coeffs: np.ndarray

    def predict(self, x):
        return np.polyval(self.coeffs, np.asarray(x, dtype=np.float64))


def _polyfit(*args):
    if len(args) == 1:
        y, deg = _arr(args[0]), 3
        x = np.arange(len(y), dtype=np.float64)
    elif len(args) == 2:
        y, deg = _arr(args[0]), _int(args[1])
        x = np.arange(len(y), dtype=np.float64)
    else:
        x, y, deg = _arr(args[0]), _arr(args[1]), _int(args[2])
    coeffs = np.polyfit(x, y, deg)
    fitted = np.polyval(coeffs, x).view(PolyfitModel)
    fitted.coeffs = coeffs
    return fitted


class LerpModel:
    """lerp(x, y): linear interpolator for predict()
    (eval/LerpEvaluator.java:36 over commons-math LinearInterpolator)."""

    def __init__(self, x, y):
        idx = np.argsort(_arr(x), kind="stable")
        self.x, self.y = _arr(x)[idx], _arr(y)[idx]

    def predict(self, x):
        return np.interp(np.asarray(x, dtype=np.float64), self.x, self.y)


def _predict(model, x):
    if hasattr(model, "predict"):
        out = model.predict(x)
        return float(out) if np.ndim(out) == 0 else out
    raise ValueError(f"predict: unsupported model {type(model).__name__}")


def _ttest(a, b):
    """Welch two-sample t-test (eval/TTestEvaluator.java:40 →
    commons-math TTest.tTest): returns t statistic and two-sided p."""
    a, b = _arr(a), _arr(b)
    na, nb = len(a), len(b)
    va, vb = np.var(a, ddof=1), np.var(b, ddof=1)
    se2 = va / na + vb / nb
    t = float((np.mean(a) - np.mean(b)) / math.sqrt(se2))
    df = se2**2 / ((va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1))
    return {"t-statistic": t, "p-value": _t_sf2(t, df)}


def _paired_ttest(a, b):
    d = _arr(a) - _arr(b)
    n = len(d)
    t = float(np.mean(d) / (np.std(d, ddof=1) / math.sqrt(n)))
    return {"t-statistic": t, "p-value": _t_sf2(t, n - 1)}


def _anova(*groups):
    """One-way ANOVA F statistic + p (eval/AnovaEvaluator.java:38)."""
    gs = [_arr(g) for g in groups]
    all_v = np.concatenate(gs)
    grand = all_v.mean()
    k, n = len(gs), len(all_v)
    ss_between = sum(len(g) * (g.mean() - grand) ** 2 for g in gs)
    ss_within = sum(float(np.sum((g - g.mean()) ** 2)) for g in gs)
    d1, d2 = k - 1, n - k
    f = (ss_between / d1) / (ss_within / d2)
    return {"f-ratio": float(f), "p-value": _f_sf(f, d1, d2)}


def _corr_p_values(m):
    """p-value matrix for a Pearson correlation matrix of the COLUMN
    vectors of m (eval/CorrelationSignificanceEvaluator.java:35)."""
    m = _mat(m)
    n, cols = m.shape
    r = np.corrcoef(m, rowvar=False)
    p = np.zeros_like(r)
    for i in range(cols):
        for j in range(cols):
            if i == j:
                continue
            rv = min(1.0 - 1e-15, max(-1.0 + 1e-15, r[i, j]))
            t = rv * math.sqrt((n - 2) / (1.0 - rv * rv))
            p[i, j] = _t_sf2(t, n - 2)
    return p


def _mann_whitney(a, b):
    """Mann-Whitney U with normal approximation (commons-math
    MannWhitneyUTest semantics, eval/MannWhitneyUEvaluator.java:38)."""
    a, b = _arr(a), _arr(b)
    na, nb = len(a), len(b)
    ranks = _rank(np.concatenate([a, b]))
    u1 = float(np.sum(ranks[:na])) - na * (na + 1) / 2.0
    u2 = na * nb - u1
    u = min(u1, u2)
    mu = na * nb / 2.0
    sigma = math.sqrt(na * nb * (na + nb + 1) / 12.0)
    z = (u - mu) / sigma if sigma else 0.0
    return {"u-statistic": max(u1, u2),
            "p-value": 2.0 * _norm_cdf(-abs(z))}


def _ks(a, dist_or_b):
    """Kolmogorov-Smirnov statistic + asymptotic p
    (eval/KolmogorovSmirnovEvaluator.java:43). Second arg: a distribution
    object (one-sample) or an array (two-sample)."""
    a = np.sort(_arr(a))
    n = len(a)
    if isinstance(dist_or_b, _Dist):
        cdf = np.asarray([dist_or_b.cdf(v) for v in a])
        d = float(np.max(np.maximum(
            np.arange(1, n + 1) / n - cdf, cdf - np.arange(n) / n)))
        ne = float(n)
    else:
        b = np.sort(_arr(dist_or_b))
        m = len(b)
        allv = np.concatenate([a, b])
        cdf_a = np.searchsorted(a, allv, side="right") / n
        cdf_b = np.searchsorted(b, allv, side="right") / m
        d = float(np.max(np.abs(cdf_a - cdf_b)))
        ne = n * m / (n + m)
    lam = (math.sqrt(ne) + 0.12 + 0.11 / math.sqrt(ne)) * d
    p = 2.0 * sum((-1) ** (k - 1) * math.exp(-2.0 * k * k * lam * lam)
                  for k in range(1, 101))
    return {"d-statistic": d, "p-value": max(0.0, min(1.0, p))}


_STATS = {
    "describe": _describe,
    "mode": _mode,
    "freqTable": _freq_table,
    "hist": _hist,
    "rank": _rank,
    "regress": _regress,
    "olsRegress": _ols_regress,
    "polyfit": _polyfit,
    "lerp": lambda x, y: LerpModel(x, y),
    "predict": _predict,
    "ttest": _ttest,
    "pairedTtest": _paired_ttest,
    "anova": _anova,
    "corrPValues": _corr_p_values,
    "mannWhitney": _mann_whitney,
    "ks": _ks,
    "kolmogorovSmirnov": _ks,
    "sumDifference": lambda a, b: float(np.sum(_arr(a) - _arr(b))),
    "meanDifference": lambda a, b: float(np.mean(_arr(a) - _arr(b))),
}


# ---------------------------------------------------------------------------
# probability distributions (eval/NormalDistributionEvaluator.java, ...)
# ---------------------------------------------------------------------------

class _Dist:
    """Base: subclasses define cdf(x); discrete ones also pmf(k)."""

    discrete = False

    def cdf(self, x) -> float:  # pragma: no cover - abstract
        raise NotImplementedError

    def sample(self, rng: np.random.Generator, n: int) -> np.ndarray:
        raise NotImplementedError


class NormalDist(_Dist):
    def __init__(self, mean, sd):
        self.mean, self.sd = float(mean), float(sd)

    def cdf(self, x):
        return _norm_cdf(float(x), self.mean, self.sd)

    def sample(self, rng, n):
        return rng.normal(self.mean, self.sd, n)


class UniformDist(_Dist):
    def __init__(self, lo, hi):
        self.lo, self.hi = float(lo), float(hi)

    def cdf(self, x):
        x = float(x)
        if x <= self.lo:
            return 0.0
        if x >= self.hi:
            return 1.0
        return (x - self.lo) / (self.hi - self.lo)

    def sample(self, rng, n):
        return rng.uniform(self.lo, self.hi, n)


class UniformIntDist(_Dist):
    discrete = True

    def __init__(self, lo, hi):
        self.lo, self.hi = _int(lo), _int(hi)  # inclusive, like commons-math

    def pmf(self, k):
        k = _int(k)
        if self.lo <= k <= self.hi:
            return 1.0 / (self.hi - self.lo + 1)
        return 0.0

    def cdf(self, x):
        k = math.floor(float(x))
        if k < self.lo:
            return 0.0
        return min(1.0, (k - self.lo + 1) / (self.hi - self.lo + 1))

    def sample(self, rng, n):
        return rng.integers(self.lo, self.hi + 1, n).astype(np.float64)


class BinomialDist(_Dist):
    discrete = True

    def __init__(self, trials, p):
        self.n, self.p = _int(trials), float(p)

    def pmf(self, k):
        k = _int(k)
        if not 0 <= k <= self.n:
            return 0.0
        return math.comb(self.n, k) * self.p**k * (1 - self.p) ** (self.n - k)

    def cdf(self, x):
        k = math.floor(float(x))
        return float(sum(self.pmf(i) for i in range(0, min(k, self.n) + 1)))

    def sample(self, rng, n):
        return rng.binomial(self.n, self.p, n).astype(np.float64)


class PoissonDist(_Dist):
    discrete = True

    def __init__(self, lam):
        self.lam = float(lam)

    def pmf(self, k):
        k = _int(k)
        if k < 0:
            return 0.0
        return math.exp(k * math.log(self.lam) - self.lam
                        - math.lgamma(k + 1))

    def cdf(self, x):
        k = math.floor(float(x))
        return float(sum(self.pmf(i) for i in range(0, _int(k) + 1)))

    def sample(self, rng, n):
        return rng.poisson(self.lam, n).astype(np.float64)


class ConstantDist(_Dist):
    discrete = True

    def __init__(self, v):
        self.v = float(v)

    def pmf(self, k):
        return 1.0 if float(k) == self.v else 0.0

    def cdf(self, x):
        return 1.0 if float(x) >= self.v else 0.0

    def sample(self, rng, n):
        return np.full(n, self.v)


class EmpiricalDist(_Dist):
    def __init__(self, data):
        self.data = np.sort(_arr(data))

    def cdf(self, x):
        return float(np.searchsorted(self.data, float(x), side="right")
                     / len(self.data))

    def sample(self, rng, n):
        return rng.choice(self.data, n, replace=True)


class EnumeratedDist(_Dist):
    discrete = True

    def __init__(self, values, probs=None):
        self.values = _arr(values)
        if probs is None:
            vals, counts = np.unique(self.values, return_counts=True)
            self.vals, self.probs = vals, counts / counts.sum()
        else:
            self.vals = self.values
            p = _arr(probs)
            self.probs = p / p.sum()

    def pmf(self, k):
        m = self.vals == float(k)
        return float(self.probs[m].sum())

    def cdf(self, x):
        return float(self.probs[self.vals <= float(x)].sum())

    def sample(self, rng, n):
        return rng.choice(self.vals, n, replace=True, p=self.probs)


_SAMPLE_SEED = 7  # deterministic draws (documented divergence from ref)


def _sample(dist, n=1):
    rng = np.random.default_rng(_SAMPLE_SEED)
    out = dist.sample(rng, _int(n))
    return float(out[0]) if _int(n) == 1 else out


def _cumulative_probability(dist, x):
    return float(dist.cdf(x))


def _probability(dist, x, x2=None):
    if x2 is not None:  # P(lo < X <= hi), continuous two-arg form
        return float(dist.cdf(x2) - dist.cdf(x))
    if dist.discrete:
        return float(dist.pmf(x))
    return 0.0  # point probability of a continuous dist (reference behavior)


_DISTS = {
    "normalDistribution": lambda mean, sd: NormalDist(mean, sd),
    "uniformDistribution": lambda lo, hi: UniformDist(lo, hi),
    "uniformIntegerDistribution": lambda lo, hi: UniformIntDist(lo, hi),
    "binomialDistribution": lambda n, p: BinomialDist(n, p),
    "poissonDistribution": lambda lam: PoissonDist(lam),
    "constantDistribution": lambda v: ConstantDist(v),
    "empiricalDistribution": lambda a: EmpiricalDist(a),
    "enumeratedDistribution": lambda a, p=None: EnumeratedDist(a, p),
    "sample": _sample,
    "cumulativeProbability": _cumulative_probability,
    "probability": _probability,
}


# ---------------------------------------------------------------------------
# clustering + spectral (KmeansEvaluator.java, FFTEvaluator.java)
# ---------------------------------------------------------------------------

class KmeansModel:
    def __init__(self, centroids, labels, data):
        self.centroids, self.labels, self.data = centroids, labels, data


def _kmeans(m, k, maxIterations=50):
    """Lloyd's k-means with deterministic seeded init
    (eval/KmeansEvaluator.java:44; the reference delegates to commons-math
    KMeansPlusPlusClusterer with a random generator — here the init draw is
    seeded for reproducible driver runs)."""
    X = _mat(m)
    k = _int(k)
    rng = np.random.default_rng(_SAMPLE_SEED)
    cents = X[rng.choice(len(X), size=k, replace=False)].copy()
    labels = np.zeros(len(X), dtype=np.int64)
    for _ in range(_int(maxIterations)):
        d = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        new_labels = d.argmin(axis=1)
        if np.array_equal(new_labels, labels) and _ > 0:
            break
        labels = new_labels
        for j in range(k):
            pts = X[labels == j]
            if len(pts):
                cents[j] = pts.mean(axis=0)
    return KmeansModel(cents, labels, X)


def _fft(a):
    """Returns a 2xN matrix [real; imag] like eval/FFTEvaluator.java:40."""
    f = np.fft.fft(_arr(a))
    return np.vstack([f.real, f.imag])


def _ifft(m):
    m = _mat(m)
    return np.fft.ifft(m[0] + 1j * m[1]).real


_CLUSTER = {
    "kmeans": _kmeans,
    "getCentroids": lambda model: model.centroids,
    "getCluster": lambda model, i: model.data[model.labels == _int(i)],
    "fft": _fft,
    "ifft": _ifft,
}


# ---------------------------------------------------------------------------
# string / null utilities missing from the core registry
# ---------------------------------------------------------------------------

def _matches(a, pattern):
    import re as _re

    rx = _re.compile(str(pattern))
    a = np.asarray(a)
    if a.ndim == 0:
        return rx.search(str(a)) is not None
    return np.asarray([rx.search(str(v)) is not None for v in a])


_STRINGS = {
    "ltrim": lambda x: np.char.lstrip(np.asarray(x, dtype=str)),
    "rtrim": lambda x: np.char.rstrip(np.asarray(x, dtype=str)),
    "split": lambda x, d: np.char.split(np.asarray(x, dtype=str), str(d)),
    "matches": _matches,
    "isNull": lambda x: np.asarray([v is None or (isinstance(v, float)
                                    and math.isnan(v)) for v in np.atleast_1d(
                                        np.asarray(x, dtype=object))]),
    "notNull": lambda x: ~np.asarray([v is None or (isinstance(v, float)
                                      and math.isnan(v)) for v in
                                      np.atleast_1d(
                                          np.asarray(x, dtype=object))]),
    "double": lambda x: _arr(x) if np.ndim(x) else float(x),
    "long": lambda x: _arr(x).astype(np.int64) if np.ndim(x) else _int(x),
}


EXTENDED_EVALUATORS: dict = {}
for fam in (_MATRIX, _SEQ, _TS, _STATS, _DISTS, _CLUSTER, _STRINGS):
    EXTENDED_EVALUATORS.update(fam)
