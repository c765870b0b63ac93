import pytest

from lucene_solr_ray.index import IndexBuildConfig, build_index
from lucene_solr_ray.search import IndexSearcher
from lucene_solr_ray.search.services import (
    fetch_stored,
    highlight,
    highlight_results,
    more_like_this,
    significant_terms,
)

DOCS = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture(scope="module")
def idx(tmp_path_factory, ray_session):
    d = str(tmp_path_factory.mktemp("svc_idx"))
    build_index(DOCS, d, key_col="doc_id", text_col="text",
                cfg=IndexBuildConfig(num_shards=2, num_buckets=4))
    return d


def test_fetch_stored(idx, ray_session):
    t = fetch_stored(DOCS, "doc_id", [1, 5, 9], columns=["doc_id", "lang"])
    assert sorted(t["doc_id"].to_pylist()) == [1, 5, 9]
    assert "lang" in t.column_names


def test_highlight_basic():
    s = highlight("the quick brown fox jumps over the lazy dog", {"fox", "lazy"},
                  window=5)
    assert "<b>fox</b>" in s or "<b>lazy</b>" in s


def test_highlight_results(idx):
    s = IndexSearcher(idx)
    out = highlight_results(s, DOCS, "doc_id", "text", "fast AND query", k=5)
    assert "snippet" in out.column_names
    assert all("<b>" in x for x in out["snippet"].to_pylist())


def test_more_like_this(idx):
    import pyarrow.parquet as pq

    s = IndexSearcher(idx)
    text = pq.read_table(DOCS, columns=["text"])["text"][0].as_py()
    res = more_like_this(s, text, k=5)
    assert res.num_rows == 5


def test_significant_terms(idx):
    s = IndexSearcher(idx)
    out = significant_terms(s, "fast", top_n=5)
    assert out.num_rows > 0
    # "fast" itself is maximally over-represented in its own result set
    assert "fast" in out["term"].to_pylist()


def test_monitor_presearcher_correct_and_selective(ray_session):
    """TermFilteredPresearcher: term-anchored queries run only on batches
    touching their terms; non-anchored queries (pure negation, prefix)
    stay always-checked so results never change vs brute force."""
    import pyarrow as pa

    from lucene_solr_ray.search.services import Monitor

    from lucene_solr_ray.search.query import parse_query, requires_positive_term

    # multi-term patterns are not term-anchored (classification only:
    # MemoryIndex does not execute Prefix nodes)
    assert not requires_positive_term(parse_query("bana*"))
    queries = {
        "q_apple": "apple",
        "q_pear": "pear AND tart",
        "q_neg": "NOT apple",            # must stay always-checked
        "q_both": "apple OR pear",
    }
    mon = Monitor(queries)
    assert "q_neg" in mon.always_check
    assert "q_apple" not in mon.always_check
    batch = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["apple pie", "banana split", "pear tart now"]),
    })
    out = mon(batch).to_pandas()
    got = set(zip(out["doc_id"], out["query_id"]))
    # pure negation matches nothing (reference BooleanQuery semantics:
    # no implicit MatchAll beside must_not)
    assert got == {
        (0, "q_apple"), (2, "q_pear"), (0, "q_both"), (2, "q_both"),
    }
    # selectivity structure: anchored queries are keyed by their terms,
    # non-anchored ones always run
    assert set(mon.term_to_qids.get("apple", [])) == {"q_apple", "q_both"}
    assert set(mon.term_to_qids.get("pear", [])) == {"q_pear", "q_both"}
    batch2 = pa.table({
        "doc_id": pa.array([7], pa.int64()),
        "text": pa.array(["unrelated words only"]),
    })
    assert mon(batch2).num_rows == 0


def test_monitor_multi_term_queries(ray_session):
    """Registered multi-term queries (prefix/wildcard/fuzzy) percolate by
    expanding against each batch's own vocabulary — they live in the
    always-check set since their concrete terms are batch-dependent."""
    import pyarrow as pa

    from lucene_solr_ray.search.services import Monitor

    mon = Monitor({"q_pre": "bana*", "q_fuz": "aple~1", "q_t": "pie"})
    assert {"q_pre", "q_fuz"} <= set(mon.always_check)
    batch = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["apple pie", "banana split", "bananas here"]),
    })
    out = mon(batch).to_pandas()
    got = set(zip(out["doc_id"], out["query_id"]))
    assert got == {(1, "q_pre"), (2, "q_pre"), (0, "q_fuz"), (0, "q_t")}
