"""ComplexPhraseQueryParser (queryparser/complexPhrase/
ComplexPhraseQueryParser.java:70) — wildcards/fuzzy/ranges/groups inside
phrases, brute-force position parity."""

import re

import numpy as np
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.index import IndexBuildConfig, build_index
from lucene_solr_ray.search import IndexSearcher
from lucene_solr_ray.search.complex_phrase import parse_complex_phrase
from lucene_solr_ray.search.query import (Bool, SpanNear, SpanOrQ, SpanTerm,
                                          Term)

DOCS = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture(scope="module")
def searcher(tmp_path_factory, ray_session):
    d = str(tmp_path_factory.mktemp("cpx_idx"))
    build_index(DOCS, d, key_col="doc_id", text_col="text",
                cfg=IndexBuildConfig(num_shards=3, num_buckets=4))
    return IndexSearcher(d, dtype=np.float64)


@pytest.fixture(scope="module")
def toks():
    t = pq.read_table(DOCS, columns=["doc_id", "text"])
    return {d: s.split(" ") for d, s in
            zip(t["doc_id"].to_pylist(), t["text"].to_pylist())}


def brute_ordered(toks, matchers, slop):
    """Docs with an ordered chain of matcher hits within slop total gaps."""
    out = set()
    for d, ts in toks.items():
        anchors = [i for i, w in enumerate(ts) if matchers[0](w)]
        for a in anchors:
            cur = a
            ok = True
            for m in matchers[1:]:
                nxt = next((j for j in range(cur + 1, len(ts)) if m(ts[j])),
                           None)
                if nxt is None:
                    ok = False
                    break
                cur = nxt
            if ok and (cur - a + 1) - len(matchers) <= slop:
                out.add(d)
                break
    return out


def got_docs(searcher, q, in_order=True):
    t = searcher.match_all(parse_complex_phrase(q, in_order=in_order))
    return set(t["doc_id"].to_pylist())


def test_wildcard_in_phrase(searcher, toks):
    want = brute_ordered(
        toks, [lambda w: w.startswith("fa"), lambda w: w == "query"], 0)
    assert got_docs(searcher, '"fa* query"') == want
    assert want  # non-trivial


def test_slop_in_phrase(searcher, toks):
    want = brute_ordered(
        toks, [lambda w: w == "fast", lambda w: w == "query"], 2)
    assert got_docs(searcher, '"fast query"~2') == want


def test_group_in_phrase(searcher, toks):
    want = brute_ordered(
        toks, [lambda w: w in ("fast", "slow"), lambda w: w == "query"], 0)
    assert got_docs(searcher, '"(fast slow) query"') == want


def test_range_in_phrase(searcher, toks):
    want = brute_ordered(
        toks, [lambda w: w == "fast", lambda w: "q" <= w <= "r"], 0)
    assert got_docs(searcher, '"fast [q TO r]"') == want


def test_fuzzy_in_phrase(searcher, toks):
    # quer~1 expands the dictionary within 1 edit of 'quer'; on this corpus
    # that includes 'query'
    got = got_docs(searcher, '"fast quer~1"')
    adj = brute_ordered(
        toks, [lambda w: w == "fast", lambda w: w == "query"], 0)
    assert adj <= got


def test_unordered(searcher, toks):
    got = got_docs(searcher, '"query fast"~3', in_order=False)
    # unordered: both orders within the window match
    fwd = brute_ordered(
        toks, [lambda w: w == "fast", lambda w: w == "query"], 3)
    rev = brute_ordered(
        toks, [lambda w: w == "query", lambda w: w == "fast"], 3)
    assert fwd | rev == got


def test_boolean_composition(searcher):
    a = got_docs(searcher, 'merge AND "fa* query"')
    b = got_docs(searcher, "merge")
    c = got_docs(searcher, '"fa* query"')
    assert a == b & c


def test_ast_shape():
    node = parse_complex_phrase('"fa* query"~1')
    assert isinstance(node, SpanNear)
    assert node.slop == 1 and node.in_order
    # single plain word collapses to a Term, not a 1-clause span
    assert isinstance(parse_complex_phrase('"fast"'), Term)


def test_garbage_and_dead_clauses(searcher):
    assert got_docs(searcher, '""') == set()
    assert got_docs(searcher, '"zzzqx* query"') == set()
    node = parse_complex_phrase('"( ) query"')
    assert isinstance(node, Bool)  # empty group kills the phrase


def test_boost_applies(searcher):
    t1 = searcher.match_all(parse_complex_phrase('"fast query"'))
    t2 = searcher.match_all(parse_complex_phrase('"fast query"^2'))
    d1 = dict(zip(t1["doc_id"].to_pylist(), t1["score"].to_pylist()))
    d2 = dict(zip(t2["doc_id"].to_pylist(), t2["score"].to_pylist()))
    assert set(d1) == set(d2)
    for k in d1:
        assert d2[k] == pytest.approx(2 * d1[k])


def test_span_rewrite_multiterm_not_first(searcher, toks):
    """multiterm.rewrite span support beyond SpanNear: SpanNot with a
    multi-term exclude (incl. one matching NOTHING) and SpanFirst with a
    prefix clause."""
    from lucene_solr_ray.search.query import (Prefix, SpanFirst, SpanNot,
                                              SpanTerm)

    # exclude expands to nothing -> include spans stand
    t1 = searcher.match_all(SpanNot(SpanTerm("fast"), Prefix("zzzqx")))
    t2 = searcher.match_all("fast")
    assert t1["doc_id"].to_pylist() == t2["doc_id"].to_pylist()
    # exclude expands to a real prefix: docs where every 'fast' occurrence
    # sits adjacent to a 'quer*' token are excluded
    t3 = searcher.match_all(SpanNot(SpanTerm("fast"), Prefix("quer"),
                                    pre=1, post=1))
    assert set(t3["doc_id"].to_pylist()) <= set(t2["doc_id"].to_pylist())
    # SpanFirst with a prefix clause: a 'fa*' token wholly before pos 3
    t4 = searcher.match_all(SpanFirst(Prefix("fa"), end=3))
    want = {d for d, ts in toks.items()
            if any(w.startswith("fa") for w in ts[:3])}
    assert set(t4["doc_id"].to_pylist()) == want
