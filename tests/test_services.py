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
