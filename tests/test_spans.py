"""Span proximity algebra vs a brute-force reference."""

import itertools

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.index import IndexBuildConfig, build_index
from lucene_solr_ray.search import IndexSearcher
from lucene_solr_ray.search.query import SpanFirst, SpanNear, SpanOrQ, SpanTerm


TEXTS = [
    "a b c d e",            # 0
    "a x x b c",            # 1
    "c b a x x",            # 2
    "a x x x b",            # 3
    "b a c a b",            # 4
    "x a b x c",            # 5
    "e d c b a",            # 6
    "a c b x e",            # 7
]


@pytest.fixture(scope="module")
def span_index(tmp_path_factory, ray_session):
    tmp = tmp_path_factory.mktemp("spans")
    p = str(tmp / "c.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(len(TEXTS), dtype=np.int64)),
        "text": pa.array(TEXTS, pa.string()),
    }), p)
    idx = str(tmp / "idx")
    build_index(p, idx, cfg=IndexBuildConfig(num_shards=2, num_buckets=4))
    return idx


def brute_ordered(tokens, terms, slop):
    """Reference: exists positions p1<p2<...<pk (strictly increasing) with
    tokens[pi] in terms[i] and (pk - p1 + 1) - k <= slop, anchored per p1."""
    k = len(terms)
    hits = 0
    pos_lists = [[i for i, t in enumerate(tokens) if t in alt] for alt in terms]
    for p1 in pos_lists[0]:
        cur = p1
        ok = True
        for pl in pos_lists[1:]:
            nxt = [p for p in pl if p > cur]
            if not nxt:
                ok = False
                break
            cur = min(nxt)
        if ok and (cur - p1 + 1) - k <= slop:
            hits += 1
    return hits


def brute_unordered(tokens, terms, slop):
    k = len(terms)
    pos_lists = [[i for i, t in enumerate(tokens) if t in alt] for alt in terms]
    if any(not pl for pl in pos_lists):
        return 0
    best = 0
    for combo in itertools.product(*pos_lists):
        width = max(combo) - min(combo) + 1
        if len(set(combo)) == k and width - k <= slop:
            best += 1
    return 1 if best else 0  # existence only (enumeration differs)


def test_span_near_ordered(span_index):
    s = IndexSearcher(span_index)
    for slop in (0, 1, 2, 3):
        node = SpanNear((SpanTerm("a"), SpanTerm("b")), slop=slop, in_order=True)
        got = s.match_all(node)["doc_id"].to_pylist()
        exp = [i for i, t in enumerate(TEXTS)
               if brute_ordered(t.split(), [{"a"}, {"b"}], slop)]
        assert got == exp, (slop, got, exp)


def test_span_near_ordered_three_clause(span_index):
    s = IndexSearcher(span_index)
    for slop in (0, 2):
        node = SpanNear((SpanTerm("a"), SpanTerm("b"), SpanTerm("c")),
                        slop=slop, in_order=True)
        got = s.match_all(node)["doc_id"].to_pylist()
        exp = [i for i, t in enumerate(TEXTS)
               if brute_ordered(t.split(), [{"a"}, {"b"}, {"c"}], slop)]
        assert got == exp, (slop, got, exp)


def test_span_near_unordered(span_index):
    s = IndexSearcher(span_index)
    for slop in (0, 1, 3):
        node = SpanNear((SpanTerm("a"), SpanTerm("b")), slop=slop, in_order=False)
        got = s.match_all(node)["doc_id"].to_pylist()
        exp = [i for i, t in enumerate(TEXTS)
               if brute_unordered(t.split(), [{"a"}, {"b"}], slop)]
        assert got == exp, (slop, got, exp)


def test_span_or_inside_near(span_index):
    s = IndexSearcher(span_index)
    node = SpanNear((SpanOrQ((SpanTerm("d"), SpanTerm("x"))), SpanTerm("e")),
                    slop=0, in_order=True)
    got = s.match_all(node)["doc_id"].to_pylist()
    exp = [i for i, t in enumerate(TEXTS)
           if brute_ordered(t.split(), [{"d", "x"}, {"e"}], 0)]
    assert got == exp


def test_span_first(span_index):
    s = IndexSearcher(span_index)
    node = SpanFirst(SpanTerm("b"), end=2)
    got = s.match_all(node)["doc_id"].to_pylist()
    exp = [i for i, t in enumerate(TEXTS) if "b" in t.split()[:2]]
    assert got == exp


def brute_sloppy_freq_ordered(tokens, terms, slop):
    """Reference SpanScorer.setFreqCurrentDoc: each ordered match (one per
    viable first-clause anchor) adds 1/(1+matchLength), matchLength = gap
    sum = range width - n_clauses."""
    k = len(terms)
    pos_lists = [[i for i, t in enumerate(tokens) if t in alt] for alt in terms]
    freq = 0.0
    for p1 in pos_lists[0]:
        cur = p1
        ok = True
        for pl in pos_lists[1:]:
            nxt = [p for p in pl if p > cur]
            if not nxt:
                ok = False
                break
            cur = min(nxt)
        if ok:
            ml = (cur - p1 + 1) - k
            if ml <= slop:
                freq += 1.0 / (1.0 + ml)
    return freq


def test_span_sloppy_freq_units():
    from lucene_solr_ray.search.spans import (_ordered_sloppy_freq,
                                              _unordered_sloppy_freq)

    for tokens, slop in [("a b c d e", 2), ("a x x b c", 2), ("b a c a b", 3),
                         ("a b a b a b", 4)]:
        toks = tokens.split()
        pls = [np.asarray([i for i, t in enumerate(toks) if t == w])
               for w in ("a", "b")]
        got = _ordered_sloppy_freq(pls, slop)
        exp = brute_sloppy_freq_ordered(toks, [{"a"}, {"b"}], slop)
        assert got == pytest.approx(exp), (tokens, slop, got, exp)
    # unordered: adjacent pair in either order adds 1.0
    assert _unordered_sloppy_freq(
        [np.asarray([1]), np.asarray([0])], 0) == pytest.approx(1.0)


def test_span_near_scores_reflect_match_tightness(span_index):
    """sloppyFreq ranks tighter windows above looser ones at equal doclen:
    doc 4 ("b a c a b": matches 1.0 + 1/3) > doc 0 ("a b ...": 1.0)
    > doc 1 ("a x x b c": 1/3)."""
    s = IndexSearcher(span_index)
    node = SpanNear((SpanTerm("a"), SpanTerm("b")), slop=2, in_order=True)
    t = s.match_all(node)
    by_doc = dict(zip(t["doc_id"].to_pylist(), t["score"].to_pylist()))
    assert by_doc[4] > by_doc[0] > by_doc[1]


def test_span_not(span_index):
    """SpanNotQuery: include spans survive only when no exclude span sits
    within [p - pre, p + post] (SpanNotQuery.java semantics on
    one-position spans)."""
    from lucene_solr_ray.search import IndexSearcher
    from lucene_solr_ray.search.query import SpanNot, SpanTerm

    texts = TEXTS
    s = IndexSearcher(span_index)

    def brute(inc, exc, pre, post):
        out = []
        for i, t in enumerate(texts):
            toks = t.split()
            incs = [p for p, w in enumerate(toks) if w == inc]
            excs = [p for p, w in enumerate(toks) if w == exc]
            k = sum(1 for p in incs
                    if not any(p - pre <= e <= p + post for e in excs))
            if k:
                out.append(i)
        return sorted(out)

    for inc, exc, pre, post in (("a", "b", 0, 1), ("a", "b", 1, 1),
                                ("c", "x", 0, 0), ("b", "zz", 0, 5),
                                ("a", "c", 2, 0)):
        got = sorted(s.search(
            SpanNot(SpanTerm(inc), SpanTerm(exc), pre=pre, post=post),
            k=50)["doc_id"].to_pylist())
        assert got == brute(inc, exc, pre, post), (inc, exc, pre, post)
