"""Extended evaluator families (relational/evaluators.py) vs closed forms.

Mirrors the reference's eval test role (solr/solrj/src/test/.../io/stream/
MathExpressionTest.java): every family checked against brute force or an
analytically known value, plus end-to-end runs through the expression
language (let/get bindings)."""

import math

import numpy as np
import pytest

from lucene_solr_ray.relational.evaluators import (
    EXTENDED_EVALUATORS as E,
    _betainc,
    _f_sf,
    _t_sf2,
)
from lucene_solr_ray.relational.streams import StreamContext, run_expression


# ---------------------------------------------------------------------------
# special functions
# ---------------------------------------------------------------------------

def test_betainc_identities():
    for x in (0.01, 0.25, 0.5, 0.75, 0.99):
        # I_x(1,1) = x
        assert _betainc(1, 1, x) == pytest.approx(x, abs=1e-12)
        # I_x(1/2,1/2) = (2/pi) asin(sqrt x)
        assert _betainc(0.5, 0.5, x) == pytest.approx(
            2 / math.pi * math.asin(math.sqrt(x)), abs=1e-12)
        # symmetry I_x(a,b) + I_{1-x}(b,a) = 1
        assert _betainc(3.2, 5.7, x) + _betainc(5.7, 3.2, 1 - x) == (
            pytest.approx(1.0, abs=1e-12))


def test_t_and_f_tails_match_tables():
    # classic critical values: t(0.025, df=10) = 2.228, F(0.05; 1, 10) = 4.965
    assert _t_sf2(2.228, 10) == pytest.approx(0.05, abs=2e-4)
    assert _t_sf2(1.0, 10) == pytest.approx(0.34089, abs=1e-4)
    assert _f_sf(4.965, 1, 10) == pytest.approx(0.05, abs=2e-4)
    # F(1, n) tail == two-sided t(n) tail at f = t^2
    assert _f_sf(2.5**2, 1, 7) == pytest.approx(_t_sf2(2.5, 7), abs=1e-12)


# ---------------------------------------------------------------------------
# matrices
# ---------------------------------------------------------------------------

def test_matrix_family():
    m = E["matrix"]([1, 2, 3], [4, 5, 6])
    assert m.shape == (2, 3)
    assert E["rowCount"](m) == 2 and E["columnCount"](m) == 3
    np.testing.assert_allclose(E["transpose"](m)[0], [1, 4])
    np.testing.assert_allclose(E["rowAt"](m, 1), [4, 5, 6])
    np.testing.assert_allclose(E["colAt"](m, 2), [3, 6])
    np.testing.assert_allclose(E["sumRows"](m), [6, 15])
    np.testing.assert_allclose(E["sumColumns"](m), [5, 7, 9])
    assert E["grandSum"](m) == 21
    np.testing.assert_allclose(
        E["matrixMult"](m, E["transpose"](m)), m @ m.T)
    np.testing.assert_allclose(E["scalarMultiply"](2, m), m * 2)
    np.testing.assert_allclose(E["scalarAdd"](1, m), m + 1)
    u = E["unitize"](m)
    np.testing.assert_allclose(np.linalg.norm(u, axis=1), [1, 1])


def test_elementwise_and_vectors():
    a, b = [1.0, 2, 3], [4.0, 5, 6]
    np.testing.assert_allclose(E["ebeAdd"](a, b), [5, 7, 9])
    np.testing.assert_allclose(E["ebeMultiply"](a, b), [4, 10, 18])
    np.testing.assert_allclose(E["ebeDivide"](b, a), [4, 2.5, 2])
    assert E["dotProduct"](a, b) == 32
    assert E["cosineSimilarity"](a, a) == pytest.approx(1.0)
    np.testing.assert_allclose(E["addAll"](a, b), [1, 2, 3, 4, 5, 6])
    np.testing.assert_allclose(E["append"](a, 9), [1, 2, 3, 9])
    np.testing.assert_allclose(E["copyOfRange"](b, 1, 3), [5, 6])
    np.testing.assert_allclose(E["recip"]([2.0, 4]), [0.5, 0.25])
    np.testing.assert_allclose(E["scale"](3, a), [3, 6, 9])
    ps = E["pairSort"]([3.0, 1, 2], [30.0, 10, 20])
    np.testing.assert_allclose(ps, [[1, 2, 3], [10, 20, 30]])
    assert E["indexOf"]([5.0, 7, 9], 7) == 1
    assert E["indexOf"]([5.0, 7, 9], 8) == -1


def test_sequences():
    np.testing.assert_allclose(E["sequence"](5, 10, 3), [10, 13, 16, 19, 22])
    np.testing.assert_allclose(E["natural"](4), [0, 1, 2, 3])
    np.testing.assert_allclose(E["repeat"](2.5, 3), [2.5, 2.5, 2.5])
    np.testing.assert_allclose(E["primes"](5, 0), [2, 3, 5, 7, 11])
    np.testing.assert_allclose(E["primes"](3, 10), [11, 13, 17])
    assert E["factorial"](6) == 720
    assert E["binomialCoefficient"](8, 3) == 56


# ---------------------------------------------------------------------------
# time series
# ---------------------------------------------------------------------------

def test_moving_windows_against_brute_force():
    rng = np.random.default_rng(3)
    a = rng.normal(size=40)
    w = 5
    ma = E["movingAvg"](a, w)
    md = E["movingMedian"](a, w)
    mm = E["movingMAD"](a, w)
    assert len(ma) == len(a) - w + 1
    for i in range(len(ma)):
        win = a[i:i + w]
        assert ma[i] == pytest.approx(win.mean())
        assert md[i] == pytest.approx(np.median(win))
        assert mm[i] == pytest.approx(np.abs(win - win.mean()).mean())


def test_exp_moving_avg():
    a = [1.0, 2, 3, 4, 5, 6]
    out = E["expMovingAvg"](a, 3)
    alpha = 2 / 4
    exp = [2.0]  # SMA of first window
    for v in a[3:]:
        exp.append((v - exp[-1]) * alpha + exp[-1])
    np.testing.assert_allclose(out, exp)


def test_diff_conv_finddelay():
    a = [1.0, 4, 9, 16, 25]
    np.testing.assert_allclose(E["diff"](a), [3, 5, 7, 9])
    np.testing.assert_allclose(E["diff"](a, 2), [8, 12, 16])
    np.testing.assert_allclose(E["conv"]([1, 2], [1, 1]), [1, 3, 2])
    rng = np.random.default_rng(7)
    base = rng.normal(size=50)
    shifted = np.concatenate([np.zeros(7), base])[:50]
    assert E["finddelay"](shifted, base) == 7
    assert E["finddelay"](base, base) == 0


def test_standardize():
    a = [2.0, 4, 6, 8]
    z = E["standardize"](a)
    assert np.mean(z) == pytest.approx(0, abs=1e-12)
    assert np.std(z, ddof=1) == pytest.approx(1)


# ---------------------------------------------------------------------------
# statistics
# ---------------------------------------------------------------------------

def test_describe_mode_freq_hist_rank():
    a = [1.0, 2, 2, 3, 3, 3]
    d = E["describe"](a)
    assert d["N"] == 6 and d["min"] == 1 and d["max"] == 3
    assert d["mean"] == pytest.approx(np.mean(a))
    assert d["stdev"] == pytest.approx(np.std(a, ddof=1))
    assert d["geometricMean"] == pytest.approx(
        float(np.exp(np.mean(np.log(a)))))
    np.testing.assert_allclose(E["mode"](a), [3])
    ft = E["freqTable"](a)
    assert [r["count"] for r in ft] == [1, 2, 3]
    assert ft[-1]["cumPct"] == pytest.approx(1.0)
    h = E["hist"](np.arange(10.0), 5)
    assert sum(r["N"] for r in h) == 10
    # average ranks on ties (commons-math NaturalRanking default)
    np.testing.assert_allclose(E["rank"]([10.0, 20, 20, 30]),
                               [1, 2.5, 2.5, 4])


def test_regress_predict_exact_line():
    x = np.arange(10.0)
    y = 2 * x + 1
    m = E["regress"](x, y)
    assert m["slope"] == pytest.approx(2) and m["intercept"] == pytest.approx(1)
    assert m["RSquared"] == pytest.approx(1)
    assert E["predict"](m, 100) == pytest.approx(201)
    np.testing.assert_allclose(E["predict"](m, [0, 1]), [1, 3])


def test_ols_regress_multivariate():
    rng = np.random.default_rng(0)
    X = rng.normal(size=(50, 3))
    beta = np.array([1.5, -2.0, 0.5])
    y = 4.0 + X @ beta
    m = E["olsRegress"](X, y)
    assert m["intercept"] == pytest.approx(4.0, abs=1e-9)
    np.testing.assert_allclose(m["coefficients"], beta, atol=1e-9)
    assert m["RSquared"] == pytest.approx(1.0)
    np.testing.assert_allclose(E["predict"](m, X), y, atol=1e-9)


def test_polyfit_and_lerp():
    x = np.arange(8.0)
    y = 3 * x**2 - x + 2
    fitted = E["polyfit"](x, y, 2)
    np.testing.assert_allclose(fitted, y, atol=1e-8)
    assert E["predict"](fitted, 10.0) == pytest.approx(3 * 100 - 10 + 2)
    lp = E["lerp"]([0.0, 10], [0.0, 100])
    assert E["predict"](lp, 2.5) == pytest.approx(25)


def test_ttest_families():
    rng = np.random.default_rng(1)
    same = rng.normal(0, 1, 200)
    other = rng.normal(0, 1, 200)
    far = rng.normal(5, 1, 200)
    assert E["ttest"](same, other)["p-value"] > 0.05
    assert E["ttest"](same, far)["p-value"] < 1e-6
    pt = E["pairedTtest"](same, same + 0.001)
    assert pt["p-value"] < 0.05  # tiny but perfectly consistent shift
    # hand-checked Welch t on a small fixture
    a, b = [1.0, 2, 3, 4], [3.0, 4, 5, 6]
    res = E["ttest"](a, b)
    va = np.var(a, ddof=1) / 4 + np.var(b, ddof=1) / 4
    assert res["t-statistic"] == pytest.approx(-2 / math.sqrt(va))


def test_anova_matches_f_tail():
    g1, g2, g3 = [1.0, 2, 3], [2.0, 3, 4], [5.0, 6, 7]
    res = E["anova"](g1, g2, g3)
    # brute-force F
    allv = np.concatenate([g1, g2, g3])
    grand = allv.mean()
    ssb = sum(3 * (np.mean(g) - grand) ** 2 for g in (g1, g2, g3))
    ssw = sum(np.sum((np.asarray(g) - np.mean(g)) ** 2) for g in (g1, g2, g3))
    f = (ssb / 2) / (ssw / 6)
    assert res["f-ratio"] == pytest.approx(f)
    assert res["p-value"] == pytest.approx(_f_sf(f, 2, 6), abs=1e-12)


def test_corr_p_values_and_mann_whitney_and_ks():
    rng = np.random.default_rng(2)
    x = rng.normal(size=100)
    m = np.column_stack([x, x + rng.normal(scale=0.01, size=100),
                         rng.normal(size=100)])
    p = E["corrPValues"](m)
    assert p[0, 1] < 1e-10        # strongly correlated
    assert p[0, 2] > 0.001        # independent
    mw = E["mannWhitney"](rng.normal(0, 1, 80), rng.normal(3, 1, 80))
    assert mw["p-value"] < 1e-6
    mw2 = E["mannWhitney"](x, x)
    assert mw2["p-value"] > 0.9
    d = E["uniformDistribution"](0, 1)
    ks = E["ks"](np.linspace(0.001, 0.999, 500), d)
    assert ks["d-statistic"] < 0.01
    two = E["kolmogorovSmirnov"](rng.normal(0, 1, 300),
                                 rng.normal(2, 1, 300))
    assert two["p-value"] < 1e-6


def test_sum_and_mean_difference():
    assert E["sumDifference"]([5.0, 7], [1.0, 2]) == 9
    assert E["meanDifference"]([5.0, 7], [1.0, 2]) == 4.5


# ---------------------------------------------------------------------------
# distributions
# ---------------------------------------------------------------------------

def test_normal_uniform_cdfs():
    n = E["normalDistribution"](0, 1)
    assert E["cumulativeProbability"](n, 0) == pytest.approx(0.5)
    assert E["cumulativeProbability"](n, 1.959964) == pytest.approx(
        0.975, abs=1e-5)
    u = E["uniformDistribution"](10, 20)
    assert E["cumulativeProbability"](u, 15) == pytest.approx(0.5)
    assert E["probability"](u, 12, 14) == pytest.approx(0.2)


def test_discrete_distributions():
    b = E["binomialDistribution"](10, 0.5)
    assert E["probability"](b, 5) == pytest.approx(
        math.comb(10, 5) * 0.5**10)
    assert E["cumulativeProbability"](b, 10) == pytest.approx(1.0)
    p = E["poissonDistribution"](3)
    assert E["probability"](p, 0) == pytest.approx(math.exp(-3))
    assert E["cumulativeProbability"](p, 200) == pytest.approx(1.0)
    ui = E["uniformIntegerDistribution"](1, 6)
    assert E["probability"](ui, 3) == pytest.approx(1 / 6)
    assert E["cumulativeProbability"](ui, 3) == pytest.approx(0.5)
    c = E["constantDistribution"](4)
    assert E["probability"](c, 4) == 1.0 and E["probability"](c, 5) == 0.0
    en = E["enumeratedDistribution"]([1.0, 1, 2, 2, 2])
    assert E["probability"](en, 2) == pytest.approx(0.6)


def test_empirical_and_sampling_determinism():
    data = np.arange(100.0)
    e = E["empiricalDistribution"](data)
    assert E["cumulativeProbability"](e, 49) == pytest.approx(0.5)
    s1 = E["sample"](E["normalDistribution"](0, 1), 10)
    s2 = E["sample"](E["normalDistribution"](0, 1), 10)
    np.testing.assert_array_equal(s1, s2)  # seeded -> reproducible
    assert isinstance(E["sample"](e), float)
    big = E["sample"](E["normalDistribution"](7, 2), 20000)
    assert np.mean(big) == pytest.approx(7, abs=0.1)
    assert np.std(big) == pytest.approx(2, abs=0.1)


# ---------------------------------------------------------------------------
# clustering + FFT
# ---------------------------------------------------------------------------

def test_kmeans_two_blobs():
    rng = np.random.default_rng(5)
    a = rng.normal(0, 0.3, size=(40, 2))
    b = rng.normal(10, 0.3, size=(40, 2))
    model = E["kmeans"](np.vstack([a, b]), 2)
    cents = np.sort(E["getCentroids"](model)[:, 0])
    assert cents[0] == pytest.approx(0, abs=0.5)
    assert cents[1] == pytest.approx(10, abs=0.5)
    c0 = E["getCluster"](model, 0)
    c1 = E["getCluster"](model, 1)
    assert len(c0) + len(c1) == 80
    assert {len(c0), len(c1)} == {40}


def test_fft_roundtrip_and_known_tone():
    t = np.arange(64)
    sig = np.cos(2 * np.pi * 8 * t / 64)
    m = E["fft"](sig)
    assert m.shape == (2, 64)
    mag = np.hypot(m[0], m[1])
    assert int(np.argmax(mag[:32])) == 8
    np.testing.assert_allclose(E["ifft"](m), sig, atol=1e-12)


# ---------------------------------------------------------------------------
# strings / null
# ---------------------------------------------------------------------------

def test_string_and_null_helpers():
    np.testing.assert_array_equal(E["ltrim"](["  a", " b "]), ["a", "b "])
    np.testing.assert_array_equal(E["rtrim"](["  a", " b "]), ["  a", " b"])
    assert E["matches"](["cat", "dog"], "^c").tolist() == [True, False]
    assert E["isNull"]([None, 1.0, float("nan")]).tolist() == [
        True, False, True]
    assert E["notNull"]([None, 1.0]).tolist() == [False, True]
    assert E["long"]("7") == 7 and E["double"]("2.5") == 2.5


# ---------------------------------------------------------------------------
# end-to-end through the expression language
# ---------------------------------------------------------------------------

def _one(expr: str) -> dict:
    ctx = StreamContext()
    return run_expression(expr, ctx).to_pandas().to_dict("records")[0]


def test_let_pipeline_moving_avg():
    row = _one("let(a=array(1,2,3,4,5,6), m=movingAvg(a, 3), get(m))")
    np.testing.assert_allclose(list(row["m"]), [2.0, 3.0, 4.0, 5.0])


def test_let_pipeline_regress_predict():
    row = _one(
        "let(x=array(0,1,2,3,4), y=array(1,3,5,7,9),"
        " r=regress(x, y), p=predict(r, 10), get(p))")
    assert row["p"] == pytest.approx(21.0)


def test_let_pipeline_matrix_and_stats():
    row = _one(
        "let(m=matrix(array(1,2), array(3,4)), s=grandSum(m), get(s))")
    assert row["s"] == 10.0
    row = _one(
        "let(a=array(1,2,3,4,100), d=describe(a), tuple(mx=valueAt("
        "array(1), 0)))")  # describe binds without error; tuple is a probe
    assert row["mx"] == 1.0


def test_let_pipeline_distribution():
    row = _one(
        "let(d=normalDistribution(0, 1), c=cumulativeProbability(d, 0),"
        " get(c))")
    assert row["c"] == pytest.approx(0.5)


def test_rank_dual_registration():
    # evaluator context: plain array -> average-tie ranks
    row = _one("let(a=array(10,30,20), r=rank(a), get(r))")
    np.testing.assert_allclose(list(row["r"]), [1.0, 3.0, 2.0])
