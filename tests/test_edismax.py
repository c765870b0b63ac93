"""edismax parser (ExtendedDismaxQParser.java:106): per-term DisMax over
query fields + minimum-should-match, brute-force parity against the
component queries."""

import numpy as np
import pytest

from lucene_solr_ray.index import IndexBuildConfig, build_index
from lucene_solr_ray.search import IndexSearcher
from lucene_solr_ray.search.query import edismax

DOCS = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture(scope="module")
def searcher(tmp_path_factory, ray_session):
    d = str(tmp_path_factory.mktemp("edismax_idx"))
    build_index(DOCS, d, key_col="doc_id", text_col="text",
                cfg=IndexBuildConfig(
                    num_shards=2, num_buckets=4,
                    analyzed_fields=(("text", "minimal_english", ""),)))
    return IndexSearcher(d, dtype=np.float64)


def _scores(searcher, q):
    t = searcher.match_all(q)
    return dict(zip(t["doc_id"].to_pylist(), t["score"].to_pylist()))


@pytest.mark.parametrize("term", ["fast", "tables"])
def test_dismax_per_term_with_tie(searcher, term):
    # 'fast' matches BOTH fields (tie path); 'tables' only the stemmed
    # analyzed field (single-clause path)
    tie, boost = 0.1, 1.5
    node = edismax(term, ["", "text^1.5"], tie=tie, mm=1)
    got = _scores(searcher, node)
    a = _scores(searcher, term)                  # main field
    b = _scores(searcher, f"text:{term}")        # stemmed field
    b = {d: boost * s for d, s in b.items()}
    want = {}
    for d in set(a) | set(b):
        va, vb = a.get(d), b.get(d)
        if va is not None and vb is not None:
            want[d] = max(va, vb) + tie * min(va, vb)
        else:
            want[d] = va if va is not None else vb
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], rel=1e-12)


def test_mm_requires_both_terms(searcher):
    node = edismax("fast query", ["", "text^2"], tie=0.0, mm=2)
    got = _scores(searcher, node)
    fast = set(_scores(searcher, "fast")) | set(_scores(searcher, "text:fast"))
    query = set(_scores(searcher, "query")) | set(_scores(searcher, "text:query"))
    assert set(got) == (fast & query)


def test_single_field_degenerates_to_terms(searcher):
    node = edismax("fast query", [""], mm=1)
    got = _scores(searcher, node)
    want = _scores(searcher, "fast OR query")
    assert got == pytest.approx(want)


def test_empty_query(searcher):
    node = edismax("", ["", "text"])
    assert searcher.match_all(node).num_rows == 0


def test_pf_phrase_boost(searcher):
    node = edismax("fast query", [""], mm=1, pf=[""])
    got = _scores(searcher, node)
    base = _scores(searcher, "fast OR query")
    phrase = _scores(searcher, '"fast query"')
    want = {d: base[d] + phrase.get(d, 0.0) for d in base}
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], rel=1e-12)
    # phrase-matching docs are boosted above term-only peers
    boosted = [d for d in phrase if d in base]
    assert boosted and all(got[d] > base[d] for d in boosted)


def test_pf_does_not_relax_mm(searcher):
    with_pf = edismax("fast query", [""], mm=2, pf=[""])
    without = edismax("fast query", [""], mm=2)
    assert set(_scores(searcher, with_pf)) == set(_scores(searcher, without))
