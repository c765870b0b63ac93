"""Per-field analyzed fields (PerFieldAnalyzerWrapper + multi-field
Document): field-namespaced terms, per-field norms, per-field BM25 stats,
per-field analyzer chains, and check_index invariants."""

import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.index import IndexBuildConfig, build_index
from lucene_solr_ray.index.maintenance import check_index
from lucene_solr_ray.search import IndexSearcher
from lucene_solr_ray.search.query import Phrase

DOCS = [
    # (text, title)
    ("ka to mi ne bo", "ray data engine"),          # 0
    ("ka ka zu ra to", "deep learning"),            # 1
    ("mi mi mi to to", "ray tracing deep dive"),    # 2
    ("bo ne zu ka ra", ""),                         # 3: no title
    ("to to to to to", "data systems"),             # 4
    ("ra zu ne bo mi", ""),                         # 5: no title
]


def _write(tmp, texts_titles):
    p = str(tmp / "c.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(len(texts_titles), dtype=np.int64)),
        "text": pa.array([t for t, _ in texts_titles], pa.string()),
        "title": pa.array([h for _, h in texts_titles], pa.string()),
    }), p)
    return p


@pytest.fixture(scope="module")
def af_index(tmp_path_factory, ray_session):
    tmp = tmp_path_factory.mktemp("af")
    p = _write(tmp, DOCS)
    idx = str(tmp / "idx")
    build_index(p, idx, cfg=IndexBuildConfig(
        num_shards=2, num_buckets=4,
        analyzed_fields=(("title", "", ""),),
    ))
    return idx


def test_field_search_matches_only_the_field(af_index):
    s = IndexSearcher(af_index)
    hits = s.search("title:ray", k=10)["doc_id"].to_pylist()
    assert sorted(hits) == [0, 2]
    # "data" in title of 0 and 4; "to" is text-only, never a title match
    assert sorted(s.search("title:data", k=10)["doc_id"].to_pylist()) == [0, 4]
    assert s.search("title:to", k=10).num_rows == 0


def test_field_bm25_uses_field_stats_and_norms(af_index):
    s = IndexSearcher(af_index, dtype=np.float64)
    t = s.search("title:ray", k=10)
    got = dict(zip(t["doc_id"].to_pylist(), t["score"].to_pylist()))
    # field stats: docCount(title)=4 (two docs have no title),
    # sumTotalTermFreq(title)=3+2+4+2=11, df(title:ray)=2
    N, sum_dl, df, k1, b = 4, 11, 2, 1.2, 0.75
    idf = math.log(1 + (N - df + 0.5) / (df + 0.5))
    avgdl = sum_dl / N
    for d, dl in ((0, 3), (2, 4)):
        inv = 1.0 / (k1 * ((1 - b) + b * dl / avgdl))
        exp = idf - idf / (1.0 + 1.0 * inv)
        assert got[d] == pytest.approx(exp, rel=1e-9), d


def test_field_phrase_positions_are_field_local(af_index):
    s = IndexSearcher(af_index)
    hits = s.search(Phrase(("title:deep", "title:learning")), k=10)
    assert hits["doc_id"].to_pylist() == [1]
    # "ray tracing" adjacent in title 2 only
    hits = s.search(Phrase(("title:ray", "title:tracing")), k=10)
    assert hits["doc_id"].to_pylist() == [2]


def test_per_field_stemmer_chain(tmp_path_factory, ray_session):
    tmp = tmp_path_factory.mktemp("af_stem")
    p = _write(tmp, [("ka to", "running fast"), ("mi ne", "runs slowly"),
                     ("zu ra", "walked away")])
    idx = str(tmp / "idx")
    build_index(p, idx, cfg=IndexBuildConfig(
        num_shards=2, num_buckets=4,
        analyzed_fields=(("title", "porter", ""),),
    ))
    s = IndexSearcher(idx)
    # query-side chain mirrors the index-side porter stem: running/runs->run
    assert sorted(s.search("title:running", k=10)["doc_id"].to_pylist()) == [0, 1]
    assert sorted(s.search("title:runs", k=10)["doc_id"].to_pylist()) == [0, 1]
    # the TEXT field sees no stemmer
    assert s.search("ka", k=10)["doc_id"].to_pylist() == [0]


def test_text_field_scores_unchanged_by_analyzed_fields(
        af_index, tmp_path_factory, ray_session):
    tmp = tmp_path_factory.mktemp("af_plain")
    p = _write(tmp, DOCS)
    plain = str(tmp / "idx")
    build_index(p, plain, cfg=IndexBuildConfig(num_shards=2, num_buckets=4))
    sa = IndexSearcher(af_index)
    sp = IndexSearcher(plain)
    for q in ("ka", "to AND mi", '"ka to"', "mi OR bo"):
        ta, tp = sa.search(q, k=10), sp.search(q, k=10)
        assert ta["doc_id"].to_pylist() == tp["doc_id"].to_pylist(), q
        assert ta["score"].to_pylist() == tp["score"].to_pylist(), q


def test_check_index_with_analyzed_fields(af_index):
    rep = check_index(af_index)
    assert rep["ok"] and rep["terms_checked"] > 0


def test_field_phrase_parser_syntax(af_index):
    s = IndexSearcher(af_index)
    assert s.search('title:"deep learning"', k=10)["doc_id"].to_pylist() == [1]
    assert s.search('title:"ray tracing"', k=10)["doc_id"].to_pylist() == [2]
    # slop: "ray ... deep" within 2 in title of doc 2 ("ray tracing deep dive")
    assert s.search('title:"ray deep"~2', k=10)["doc_id"].to_pylist() == [2]
    assert s.search('title:"ray deep"', k=10).num_rows == 0
    # composes with boolean syntax; scores are real BM25 (phrase weight)
    t = s.search('title:"deep learning" OR ka', k=10)
    assert 1 in t["doc_id"].to_pylist()


def test_field_spans(af_index):
    """SpanNear over analyzed-field terms: field-local positions drive the
    window logic (spans are per-field in the reference too —
    SpanTermQuery.java's field comes from its term; SpanNearQuery requires
    all clauses share one field)."""
    from lucene_solr_ray.search.query import SpanNear, SpanTerm

    s = IndexSearcher(af_index)
    # "ray tracing deep dive" (doc 2): ordered ray->deep within slop 1
    q = SpanNear((SpanTerm("title:ray"), SpanTerm("title:deep")),
                 slop=1, in_order=True)
    assert s.search(q, k=10)["doc_id"].to_pylist() == [2]
    # slop 0 excludes it (one intervening position)
    q0 = SpanNear((SpanTerm("title:ray"), SpanTerm("title:deep")),
                  slop=0, in_order=True)
    assert s.search(q0, k=10).num_rows == 0
    # unordered: "deep learning" (doc 1) matches deep..learning either way
    qu = SpanNear((SpanTerm("title:learning"), SpanTerm("title:deep")),
                  slop=0, in_order=False)
    assert s.search(qu, k=10)["doc_id"].to_pylist() == [1]


def test_append_index_with_analyzed_fields(tmp_path_factory, ray_session):
    """Incremental paths must read the analyzed SOURCE columns, never the
    synthesized fdl_<col> docvalues (regression: append_index crashed on
    any analyzed-field index)."""
    from lucene_solr_ray.index.maintenance import append_index, check_index

    tmp = tmp_path_factory.mktemp("af_append")
    p = _write(tmp, DOCS)
    idx = str(tmp / "idx")
    build_index(p, idx, cfg=IndexBuildConfig(
        num_shards=2, num_buckets=4,
        analyzed_fields=(("title", "", ""),),
    ))
    p2 = str(tmp / "c2.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array([100, 101], pa.int64()),
        "text": pa.array(["ka mi", "zu bo"], pa.string()),
        "title": pa.array(["ray cluster", "fresh data"], pa.string()),
    }), p2)
    append_index(idx, p2)
    s = IndexSearcher(idx)
    hits = sorted(s.search("title:ray", k=10)["doc_id"].to_pylist())
    assert hits == [0, 2, 100]
    assert check_index(idx)["ok"]


def test_global_stemmer_leaves_field_phrases_alone(tmp_path_factory,
                                                   ray_session):
    """The TEXT field's stemmer must not rewrite namespaced 'field:term'
    phrase/synonym texts (regression: porter('title:tracing') mangled
    field phrases into terms that exist nowhere)."""
    tmp = tmp_path_factory.mktemp("af_gstem")
    p = _write(tmp, [("running runs", "ray tracing deep"),
                     ("walked walking", "data systems")])
    idx = str(tmp / "idx")
    build_index(p, idx, cfg=IndexBuildConfig(
        num_shards=2, num_buckets=4, stemmer="porter",
        analyzed_fields=(("title", "", ""),),
    ))
    s = IndexSearcher(idx)
    assert s.search('title:"ray tracing"', k=10)["doc_id"].to_pylist() == [0]
    # the TEXT field still stems: running/runs -> run
    assert s.search("run", k=10)["doc_id"].to_pylist() == [0]


def test_function_score_boost_survives_analyzed_rewrite(af_index):
    """FunctionScore.boost must ride through _rewrite_analyzed_fields
    (regression: the rewrite rebuilt the node with default boost=1)."""
    from lucene_solr_ray.search.query import FunctionScore, Term

    s = IndexSearcher(af_index, dtype=np.float64)
    base = s.match_all(FunctionScore(Term("ka"), "score", 1.0))
    doubled = s.match_all(FunctionScore(Term("ka"), "score", 2.0))
    b = dict(zip(base["doc_id"].to_pylist(), base["score"].to_pylist()))
    d = dict(zip(doubled["doc_id"].to_pylist(), doubled["score"].to_pylist()))
    assert set(b) == set(d) and len(b) > 0
    for k, v in d.items():
        assert v == pytest.approx(2.0 * b[k], rel=1e-12)


def test_distributed_matches_local_on_analyzed_fields(af_index, ray_session):
    """DistributedSearcher must run the analyzed-field rewrite and score
    namespaced terms with field stats + field norms, identically to
    IndexSearcher (it previously skipped both)."""
    from lucene_solr_ray.search import DistributedSearcher

    local = IndexSearcher(af_index, dtype=np.float64)
    dist = DistributedSearcher(af_index, num_actors=2, dtype=np.float64)
    for q in ["title:ray", "title:data", 'title:"ray data"',
              "title:ray AND ka", "title:learning OR mi"]:
        a = local.search(q, k=10)
        b = dist.search(q, k=10)
        assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist(), q
        np.testing.assert_allclose(
            a["score"].to_numpy(zero_copy_only=False),
            b["score"].to_numpy(zero_copy_only=False), rtol=0, atol=0,
            err_msg=q)


def test_phrase_rewrite_drops_field_stopwords(tmp_path_factory, ray_session):
    """title:"the cat" with 'the' in the field's stopword set must match
    docs whose title contains cat — the stopword never reached the index,
    so keeping it would make the phrase unmatchable."""
    tmp = tmp_path_factory.mktemp("afstop")
    p = _write(tmp, [("aa bb", "the cat sat"), ("cc dd", "a dog ran"),
                     ("ee ff", "cat nap time")])
    idx = str(tmp / "idx")
    build_index(p, idx, cfg=IndexBuildConfig(
        num_shards=1, num_buckets=4,
        analyzed_fields=(("title", "", "the,a"),),
    ))
    s = IndexSearcher(idx)
    hits = s.search('title:"the cat"', k=10)["doc_id"].to_pylist()
    assert sorted(hits) == [0, 2]
    # all-stopword phrase: matches nothing, no crash
    assert s.search('title:"the a"', k=10).num_rows == 0
