"""Randomized parity fuzz for the module queries added this session:
CommonTerms, Covering, PhraseWildcard, BlendedTerm, CombinedField — each
checked against a brute-force model or a composed-equivalent query over
random corpora and random shard layouts."""

import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.index import IndexBuildConfig, build_index
from lucene_solr_ray.search import IndexSearcher
from lucene_solr_ray.search.query import (
    BlendedTerm,
    Bool,
    CombinedField,
    CommonTerms,
    Covering,
    MultiPhrase,
    PhraseWildcard,
    Prefix,
    Term,
)

VOCAB = ["apple", "apric", "banana", "cherry", "chili", "date", "fig"]


def _corpus(tmp, rng, n=70, extra=None):
    texts = [" ".join(rng.choice(VOCAB, size=int(rng.integers(2, 14))))
             for _ in range(n)]
    p = str(tmp / "c.parquet")
    cols = {"doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(texts)}
    cols.update(extra or {})
    pq.write_table(pa.table(cols), p)
    return p, texts


@pytest.mark.parametrize("seed", [2, 29, 53])
def test_common_terms_fuzz_equals_manual_bool(tmp_path, ray_session, seed):
    rng = np.random.default_rng(seed)
    p, texts = _corpus(tmp_path, rng)
    idx = str(tmp_path / "idx")
    build_index(p, idx, cfg=IndexBuildConfig(
        num_shards=int(rng.integers(1, 4)), num_buckets=4))
    s = IndexSearcher(idx, dtype=np.float64)
    from collections import Counter

    dfc = Counter()
    for t in texts:
        dfc.update(set(t.split()))
    n = len(texts)
    qterms = tuple(rng.choice(VOCAB, size=3, replace=False))
    mtf = float(rng.uniform(0.05, 0.9))
    cut = int(math.ceil(mtf * n))
    low = [t for t in qterms if dfc.get(t, 0) <= cut]
    high = [t for t in qterms if dfc.get(t, 0) > cut]
    if low:
        want_q = Bool(must=[Bool(should=[Term(t) for t in low])])
        if high:
            want_q.should.append(Bool(should=[Term(t) for t in high]))
    else:
        want_q = Bool(must=[Term(t) for t in high])
    got = s.match_all(CommonTerms(terms=qterms, max_term_frequency=mtf))
    want = s.match_all(want_q)
    assert got["doc_id"].to_pylist() == want["doc_id"].to_pylist(), seed
    np.testing.assert_allclose(got["score"].to_pylist(),
                               want["score"].to_pylist())


@pytest.mark.parametrize("seed", [7, 31])
def test_covering_fuzz_brute_force(tmp_path, ray_session, seed):
    rng = np.random.default_rng(seed)
    n = 80
    minm = [None if rng.random() < 0.15 else float(rng.integers(0, 4))
            for _ in range(n)]
    p, texts = _corpus(tmp_path, rng, n=n, extra={
        "minm": pa.array(minm, pa.float64())})
    idx = str(tmp_path / "idx")
    build_index(p, idx, cfg=IndexBuildConfig(
        num_shards=2, num_buckets=4, docvalues_fields=("minm",)))
    s = IndexSearcher(idx, dtype=np.float64)
    clauses = tuple(Term(t) for t in rng.choice(VOCAB, size=4, replace=False))
    got = s.match_all(Covering(clauses, "minm"))
    per = {c.text: dict(zip(s.match_all(c)["doc_id"].to_pylist(),
                            s.match_all(c)["score"].to_pylist()))
           for c in clauses}
    exp = {}
    for i, t in enumerate(texts):
        if minm[i] is None:
            continue
        toks = t.split()
        hit = [c.text for c in clauses if c.text in toks]
        if hit and len(hit) >= max(1.0, minm[i]):
            exp[i] = sum(per[w][i] for w in hit)
    assert sorted(got["doc_id"].to_pylist()) == sorted(exp), seed
    gm = dict(zip(got["doc_id"].to_pylist(), got["score"].to_pylist()))
    for i in exp:
        assert gm[i] == pytest.approx(exp[i]), (seed, i)


@pytest.mark.parametrize("seed", [11, 41])
def test_phrase_wildcard_fuzz_brute_force(tmp_path, ray_session, seed):
    rng = np.random.default_rng(seed)
    p, texts = _corpus(tmp_path, rng, n=90)
    idx = str(tmp_path / "idx")
    build_index(p, idx, cfg=IndexBuildConfig(num_shards=3, num_buckets=4))
    s = IndexSearcher(idx, dtype=np.float64)
    lead = str(rng.choice(VOCAB))
    pre = str(rng.choice(["a", "c", "ch", "b", "f"]))
    got = s.match_all(PhraseWildcard((lead, Prefix(pre))))
    exp = sorted(
        i for i, t in enumerate(texts)
        if any(x == lead and y.startswith(pre)
               for x, y in zip(t.split(), t.split()[1:])))
    assert got["doc_id"].to_pylist() == exp, (seed, lead, pre)
    # equal to the explicit MultiPhrase over the full dictionary expansion
    vocab = tuple(sorted({w for t in texts for w in t.split()
                          if w.startswith(pre)}))
    if vocab:
        want = s.match_all(MultiPhrase(((lead,), vocab)))
        np.testing.assert_allclose(got["score"].to_pylist(),
                                   want["score"].to_pylist())


@pytest.mark.parametrize("seed", [13, 43])
def test_blended_term_fuzz_hand_model(tmp_path, ray_session, seed):
    from lucene_solr_ray.util.smallfloat import byte4_to_int, int_to_byte4

    rng = np.random.default_rng(seed)
    p, texts = _corpus(tmp_path, rng, n=60)
    idx = str(tmp_path / "idx")
    build_index(p, idx, cfg=IndexBuildConfig(num_shards=2, num_buckets=4))
    s = IndexSearcher(idx, dtype=np.float64)
    pair = rng.choice(VOCAB, size=2, replace=False)
    boosts = (float(rng.uniform(0.5, 2)), float(rng.uniform(0.5, 2)))
    tie = float(rng.uniform(0, 1))
    q = BlendedTerm(((str(pair[0]), boosts[0]), (str(pair[1]), boosts[1])),
                    tiebreak=tie)
    got_t = s.match_all(q)
    got = dict(zip(got_t["doc_id"].to_pylist(), got_t["score"].to_pylist()))

    from collections import Counter

    dfc = Counter()
    for t in texts:
        dfc.update(set(t.split()))
    n, sum_dl = len(texts), sum(len(t.split()) for t in texts)
    bdf = max(dfc.get(str(pair[0]), 0), dfc.get(str(pair[1]), 0))
    idf = math.log(1 + (n - bdf + 0.5) / (bdf + 0.5))
    avgdl = sum_dl / n
    k1, b = 1.2, 0.75
    exp = {}
    for i, t in enumerate(texts):
        toks = t.split()
        dlq = byte4_to_int(int_to_byte4(len(toks)))
        inv = 1.0 / (k1 * ((1 - b) + b * dlq / avgdl))
        mem = []
        for w, bo in zip(pair, boosts):
            f = toks.count(str(w))
            if f:
                wt = bo * idf
                mem.append(wt - wt / (1.0 + f * inv))
        if mem:
            mx, sm = max(mem), sum(mem)
            exp[i] = mx + tie * (sm - mx)
    assert sorted(got) == sorted(exp), seed
    for i in exp:
        assert got[i] == pytest.approx(exp[i], rel=1e-9), (seed, i)


@pytest.mark.parametrize("seed", [19, 47])
def test_combined_field_fuzz_hand_model(tmp_path, ray_session, seed):
    from lucene_solr_ray.util.smallfloat import byte4_to_int, int_to_byte4

    rng = np.random.default_rng(seed)
    n = 50
    f1 = [" ".join(rng.choice(VOCAB, size=int(rng.integers(0, 6))))
          for _ in range(n)]
    f2 = [" ".join(rng.choice(VOCAB, size=int(rng.integers(1, 10))))
          for _ in range(n)]
    p = str(tmp_path / "c.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(["x"] * n),
        "t1": pa.array(f1),
        "t2": pa.array(f2),
    }), p)
    idx = str(tmp_path / "idx")
    build_index(p, idx, cfg=IndexBuildConfig(
        num_shards=2, num_buckets=4,
        analyzed_fields=(("t1", "", ""), ("t2", "", ""))))
    s = IndexSearcher(idx, dtype=np.float64)
    term = str(rng.choice(VOCAB))
    w1, w2 = 1.0, float(rng.integers(1, 4))
    got_t = s.match_all(CombinedField((("t1", w1), ("t2", w2)), (term,)))
    got = dict(zip(got_t["doc_id"].to_pylist(), got_t["score"].to_pylist()))

    t1 = [x.split() if x else [] for x in f1]
    t2 = [x.split() if x else [] for x in f2]
    df = max(sum(1 for x in t1 if term in x), sum(1 for x in t2 if term in x))
    dc = max(sum(1 for x in t1 if x), sum(1 for x in t2 if x))
    sttf = int(w1 * sum(len(x) for x in t1) + w2 * sum(len(x) for x in t2))
    if df == 0:
        assert not got
        return
    avgdl = sttf / dc
    k1, b = 1.2, 0.75
    idf = math.log(1 + (dc - df + 0.5) / (df + 0.5))
    exp = {}
    for i in range(n):
        freq = w1 * t1[i].count(term) + w2 * t2[i].count(term)
        if freq == 0:
            continue
        nv = (w1 * byte4_to_int(int_to_byte4(len(t1[i])))
              + w2 * byte4_to_int(int_to_byte4(len(t2[i]))))
        dlq = byte4_to_int(int_to_byte4(int(math.floor(nv + 0.5))))
        inv = 1.0 / (k1 * ((1 - b) + b * dlq / avgdl))
        exp[i] = idf - idf / (1.0 + freq * inv)
    assert sorted(got) == sorted(exp), seed
    for i in exp:
        assert got[i] == pytest.approx(exp[i], rel=1e-9), (seed, i)
