"""Pluggable similarities (reference: search/similarities/ SPI —
ClassicSimilarity.java, LMDirichletSimilarity.java, BooleanSimilarity.java):
hand-formula parity, WAND == exhaustive under every similarity, and the
whole query algebra scoring through the plugged SimScorer."""

import math
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.index import IndexBuildConfig, build_index
from lucene_solr_ray.search import (
    BooleanSimilarity,
    ClassicSimilarity,
    DFRSimilarity,
    IndexSearcher,
    LMDirichletSimilarity,
    LMJelinekMercerSimilarity,
)
from lucene_solr_ray.util.smallfloat import byte4_to_int, int_to_byte4

SIMS = [ClassicSimilarity(), LMDirichletSimilarity(), BooleanSimilarity(),
        DFRSimilarity(), LMJelinekMercerSimilarity()]


@pytest.fixture(scope="module")
def idx(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("sim")
    rng = np.random.default_rng(7)
    vocab = ["fast", "slow", "query", "table", "index", "merge", "shard"]
    texts = [
        " ".join(rng.choice(vocab, size=int(rng.integers(3, 12))))
        for _ in range(300)
    ]
    p = str(tmp / "c.parquet")
    pq.write_table(pa.table({"doc_id": pa.array(np.arange(300), pa.int64()),
                             "text": pa.array(texts, pa.string())}), p)
    d = str(tmp / "idx")
    build_index(p, d, cfg=IndexBuildConfig(num_shards=2, num_buckets=4))
    return d, texts


def _stats(texts):
    dl = [len(t.split()) for t in texts]
    n = len(texts)
    sum_ttf = sum(dl)
    return dl, n, sum_ttf


def _qlen(length):
    return byte4_to_int(int_to_byte4(length))


def test_classic_hand_formula(idx):
    d, texts = idx
    dl, n, sum_ttf = _stats(texts)
    s = IndexSearcher(d, params=ClassicSimilarity(), dtype=np.float64)
    res = s.match_all("fast")
    df = sum(1 for t in texts if "fast" in t.split())
    idf = math.log((n + 1) / (df + 1)) + 1.0
    for doc, sc in zip(res["doc_id"].to_pylist(), res["score"].to_pylist()):
        freq = texts[doc].split().count("fast")
        exp = idf * math.sqrt(freq) / math.sqrt(_qlen(dl[doc]))
        assert sc == pytest.approx(exp, rel=1e-9)


def test_lm_dirichlet_hand_formula(idx):
    d, texts = idx
    dl, n, sum_ttf = _stats(texts)
    mu = 2000.0
    s = IndexSearcher(d, params=LMDirichletSimilarity(mu=mu), dtype=np.float64)
    res = s.match_all("query")
    ttf = sum(t.split().count("query") for t in texts)
    p = (ttf + 1.0) / (sum_ttf + 1.0)
    for doc, sc in zip(res["doc_id"].to_pylist(), res["score"].to_pylist()):
        freq = texts[doc].split().count("query")
        exp = max(0.0, math.log(1 + freq / (mu * p))
                  + math.log(mu / (_qlen(dl[doc]) + mu)))
        assert sc == pytest.approx(exp, rel=1e-9)


def test_dfr_hand_formula(idx):
    d, texts = idx
    dl, n, sum_ttf = _stats(texts)
    c = 1.0
    s = IndexSearcher(d, params=DFRSimilarity(c=c), dtype=np.float64)
    res = s.match_all("slow")
    df = sum(1 for t in texts if "slow" in t.split())
    F = sum(t.split().count("slow") for t in texts)
    avgdl = sum_ttf / n
    for doc, sc in zip(res["doc_id"].to_pylist(), res["score"].to_pylist()):
        freq = texts[doc].split().count("slow")
        tfn = freq * math.log2(1 + c * avgdl / _qlen(dl[doc]))
        gain = (F + 1.0) / (df * (tfn + 1.0))
        exp = gain * tfn * math.log2(1 + (n + 1.0) / (F + 0.5))
        assert sc == pytest.approx(exp, rel=1e-9)
        assert sc > 0


def test_boolean_scores_are_boost(idx):
    d, texts = idx
    s = IndexSearcher(d, params=BooleanSimilarity())
    res = s.match_all("fast^2.5")
    assert res.num_rows > 0
    assert res["score"].to_pylist() == pytest.approx([2.5] * res.num_rows)


@pytest.mark.parametrize("sim", SIMS, ids=lambda s: type(s).__name__)
@pytest.mark.parametrize("q", [
    "fast", "fast OR slow", "fast AND table", '"fast query"',
    "fast OR (slow AND table)", "fa*",
])
def test_wand_parity_per_similarity(idx, sim, q):
    """Block-max pruning scores impacts through the plugged weight, so
    WAND results must equal exhaustive results under ANY similarity."""
    d, _ = idx
    s = IndexSearcher(d, params=sim)
    a = s.search(q, k=10, use_wand=True)
    b = s.search(q, k=10, use_wand=False)
    assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist()
    assert a["score"].to_pylist() == b["score"].to_pylist()


def test_distributed_matches_local(idx, ray_session):
    from lucene_solr_ray.search import DistributedSearcher

    d, _ = idx
    sim = ClassicSimilarity()
    loc = IndexSearcher(d, params=sim).search("fast OR slow", k=5)
    dist = DistributedSearcher(d, num_actors=2, params=sim).search(
        "fast OR slow", k=5)
    assert loc["doc_id"].to_pylist() == dist["doc_id"].to_pylist()
    assert loc["score"].to_pylist() == pytest.approx(dist["score"].to_pylist())


def test_phrase_summed_idf_classic(idx):
    d, texts = idx
    dl, n, _ = _stats(texts)
    s = IndexSearcher(d, params=ClassicSimilarity(), dtype=np.float64)
    res = s.match_all('"fast query"')
    dff = sum(1 for t in texts if "fast" in t.split())
    dfq = sum(1 for t in texts if "query" in t.split())
    idf = (math.log((n + 1) / (dff + 1)) + 1.0) + (math.log((n + 1) / (dfq + 1)) + 1.0)
    for doc, sc in zip(res["doc_id"].to_pylist(), res["score"].to_pylist()):
        words = texts[doc].split()
        freq = sum(1 for i in range(len(words) - 1)
                   if words[i] == "fast" and words[i + 1] == "query")
        assert freq > 0
        exp = idf * math.sqrt(freq) / math.sqrt(_qlen(dl[doc]))
        assert sc == pytest.approx(exp, rel=1e-9)


def test_lm_jelinek_mercer_hand_formula(idx):
    d, texts = idx
    dl, n, sum_ttf = _stats(texts)
    lam = 0.7
    s = IndexSearcher(d, params=LMJelinekMercerSimilarity(lam=lam),
                      dtype=np.float64)
    res = s.match_all("query")
    ttf = sum(t.split().count("query") for t in texts)
    p = (ttf + 1.0) / (sum_ttf + 1.0)
    assert res.num_rows > 0
    for doc, sc in zip(res["doc_id"].to_pylist(), res["score"].to_pylist()):
        freq = texts[doc].split().count("query")
        exp = math.log(1.0 + ((1.0 - lam) * freq / _qlen(dl[doc]))
                       / (lam * p))
        assert sc == pytest.approx(exp, rel=1e-9)


def test_axiomatic_f2exp_hand_formula(idx):
    from lucene_solr_ray.search import AxiomaticF2EXP

    d, texts = idx
    dl, n, sum_ttf = _stats(texts)
    s_p, k_p = 0.25, 0.35
    s = IndexSearcher(d, params=AxiomaticF2EXP(), dtype=np.float64)
    res = s.match_all("merge")
    df = sum(1 for t in texts if "merge" in t.split())
    avgdl = sum_ttf / n
    for doc, sc in zip(res["doc_id"].to_pylist(), res["score"].to_pylist()):
        freq = texts[doc].split().count("merge")
        tfln = freq / (freq + s_p + s_p * _qlen(dl[doc]) / avgdl)
        exp = tfln * ((n + 1.0) / df) ** k_p
        assert sc == pytest.approx(exp, rel=1e-9)
        assert sc > 0


def test_dfi_hand_formula(idx):
    from lucene_solr_ray.search import DFISimilarity

    d, texts = idx
    dl, n, sum_ttf = _stats(texts)
    s = IndexSearcher(d, params=DFISimilarity(), dtype=np.float64)
    res = s.match_all("index")
    F = sum(t.split().count("index") for t in texts)
    seen_zero = seen_pos = False
    for doc, sc in zip(res["doc_id"].to_pylist(), res["score"].to_pylist()):
        freq = texts[doc].split().count("index")
        expected = (F + 1.0) * _qlen(dl[doc]) / (sum_ttf + 1.0)
        if freq <= expected:
            assert sc == 0.0
            seen_zero = True
        else:
            measure = (freq - expected) / math.sqrt(expected)
            assert sc == pytest.approx(math.log2(measure + 1.0), rel=1e-9)
            seen_pos = True
    assert seen_pos  # the corpus must exercise the scoring branch


def test_wand_parity_axiomatic_dfi(idx):
    from lucene_solr_ray.search import AxiomaticF2EXP, DFISimilarity

    d, _ = idx
    for sim in (AxiomaticF2EXP(), DFISimilarity()):
        s = IndexSearcher(d, params=sim)
        for q in ("fast", "fast OR slow", '"fast query"'):
            a = s.search(q, k=10, use_wand=True)
            b = s.search(q, k=10, use_wand=False)
            assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist()
            assert a["score"].to_pylist() == b["score"].to_pylist()


def test_ib_ll_hand_formula(idx):
    from lucene_solr_ray.search import IBSimilarity

    d, texts = idx
    dl, n, sum_ttf = _stats(texts)
    c = 1.0
    s = IndexSearcher(d, params=IBSimilarity(), dtype=np.float64)
    res = s.match_all("shard")
    df = sum(1 for t in texts if "shard" in t.split())
    lam = float(np.float32((df + 1.0) / (n + 1.0)))
    avgdl = sum_ttf / n
    for doc, sc in zip(res["doc_id"].to_pylist(), res["score"].to_pylist()):
        freq = texts[doc].split().count("shard")
        tfn = freq * math.log2(1 + c * avgdl / _qlen(dl[doc]))
        exp = -math.log(lam / (tfn + lam))
        assert sc == pytest.approx(exp, rel=1e-9)
        assert sc > 0


def test_wand_parity_ib(idx):
    from lucene_solr_ray.search import IBSimilarity

    d, _ = idx
    s = IndexSearcher(d, params=IBSimilarity())
    for q in ("fast", "fast OR slow", '"fast query"'):
        a = s.search(q, k=10, use_wand=True)
        b = s.search(q, k=10, use_wand=False)
        assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist()
        assert a["score"].to_pylist() == b["score"].to_pylist()


def test_multi_similarity_sums(idx):
    from lucene_solr_ray.search import (BM25Similarity, ClassicSimilarity,
                                        MultiSimilarity)

    d, _ = idx
    a = IndexSearcher(d, params=BM25Similarity(), dtype=np.float64).match_all("fast")
    b = IndexSearcher(d, params=ClassicSimilarity(), dtype=np.float64).match_all("fast")
    m = IndexSearcher(
        d, params=MultiSimilarity([BM25Similarity(), ClassicSimilarity()]),
        dtype=np.float64).match_all("fast")
    assert m["doc_id"].to_pylist() == a["doc_id"].to_pylist()
    want = [x + y for x, y in zip(a["score"].to_pylist(), b["score"].to_pylist())]
    assert m["score"].to_pylist() == pytest.approx(want, rel=1e-12)


def test_per_field_similarity_routes(tmp_path_factory, ray_session):
    """Main text scores BM25; the analyzed field 'title' scores Boolean
    (PerFieldSimilarityWrapper.java:29)."""
    from lucene_solr_ray.search import (BM25Similarity, BooleanSimilarity,
                                        PerFieldSimilarityWrapper)

    tmp = tmp_path_factory.mktemp("pfsim")
    texts = ["fast query merge", "fast fast slow", "query table"]
    titles = ["alpha fast", "beta", "alpha slow"]
    p = str(tmp / "c.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(3), pa.int64()),
        "text": pa.array(texts), "title": pa.array(titles)}), p)
    d = str(tmp / "idx")
    build_index(p, d, cfg=IndexBuildConfig(
        num_shards=2, num_buckets=4, analyzed_fields=(("title",),)))
    wrap = PerFieldSimilarityWrapper(BM25Similarity(),
                                     {"title": BooleanSimilarity()})
    s = IndexSearcher(d, params=wrap, dtype=np.float64)
    # field term scores = boost (Boolean)
    r = s.match_all("title:alpha")
    assert r["score"].to_pylist() == pytest.approx([1.0, 1.0])
    # text term scores = BM25 (matches a pure-BM25 searcher)
    bm = IndexSearcher(d, params=BM25Similarity(), dtype=np.float64)
    assert s.match_all("fast").equals(bm.match_all("fast"))


def test_sweetspot_hand_formula(idx):
    import math

    from lucene_solr_ray.search import SweetSpotSimilarity

    d, texts = idx
    sim = SweetSpotSimilarity(ln_min=5, ln_max=8, steepness=0.5,
                              tf_base=1.5, tf_min=2)
    s = IndexSearcher(d, params=sim, dtype=np.float64)
    got_t = s.match_all("fast")
    got = dict(zip(got_t["doc_id"].to_pylist(), got_t["score"].to_pylist()))
    toks = [t.split() for t in texts]
    n = len(toks)
    df = sum(1 for tk in toks if "fast" in tk)
    idf = math.log((n + 1) / (df + 1)) + 1.0
    exp = {}
    for i, tk in enumerate(toks):
        f = tk.count("fast")
        if not f:
            continue
        dl = _qlen(len(tk))
        norm = 1.0 / math.sqrt(
            0.5 * (abs(dl - 5) + abs(dl - 8) - 3) + 1.0)
        tf = 1.5 if f <= 2 else math.sqrt(f + 2.25 - 2)
        exp[i] = idf * tf * norm
    assert sorted(got) == sorted(exp)
    for i in exp:
        assert got[i] == pytest.approx(exp[i], rel=1e-12), i


def test_sweetspot_defaults_degrade_to_classic(idx):
    from lucene_solr_ray.search import SweetSpotSimilarity

    d, _ = idx
    a = IndexSearcher(d, params=SweetSpotSimilarity(),
                      dtype=np.float64).match_all("fast")
    b = IndexSearcher(d, params=ClassicSimilarity(),
                      dtype=np.float64).match_all("fast")
    assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist()
    np.testing.assert_allclose(a["score"].to_pylist(),
                               b["score"].to_pylist(), rtol=1e-12)
