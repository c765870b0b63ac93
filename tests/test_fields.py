import numpy as np
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.index import IndexBuildConfig, IndexReader, build_index
from lucene_solr_ray.search import IndexSearcher, parse_query
from tests.oracle import BruteForceIndex

DOCS = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture(scope="module")
def idx(tmp_path_factory, ray_session):
    d = str(tmp_path_factory.mktemp("field_idx"))
    cfg = IndexBuildConfig(num_shards=2, num_buckets=4,
                           keyword_fields=("lang", "source"))
    build_index(DOCS, d, key_col="doc_id", text_col="text", cfg=cfg)
    return d


@pytest.fixture(scope="module")
def raw():
    return pq.read_table(DOCS, columns=["doc_id", "text", "lang", "source"]).to_pandas()


def test_keyword_field_filter(idx, raw):
    s = IndexSearcher(idx)
    got = s.match_all(parse_query("lang:en"))
    exp = sorted(raw[raw.lang == "en"]["doc_id"])
    assert got["doc_id"].to_pylist() == exp
    got2 = s.match_all(parse_query("fast AND lang:en"))
    exp2 = sorted(
        raw[(raw.lang == "en") & raw.text.str.split(" ").map(lambda w: "fast" in w)]["doc_id"]
    )
    assert got2["doc_id"].to_pylist() == exp2


def test_keyword_fields_do_not_affect_norms(idx, raw):
    # text-field BM25 scores must be identical to a text-only index
    brute = BruteForceIndex(raw["doc_id"].tolist(), raw["text"].tolist())
    s = IndexSearcher(idx)
    for q in ["fast", "fast OR query", '"fast query"']:
        node = parse_query(q)
        exp_docs, exp_scores = brute.top_k(node, 10)
        got = s.search(q, k=10)
        assert got["doc_id"].to_pylist() == exp_docs, q
        np.testing.assert_array_equal(
            np.asarray(got["score"].to_pylist(), dtype=np.float32),
            np.asarray(exp_scores, dtype=np.float32),
        )
    # doc_count / sum_ttf unchanged by keyword fields
    r = IndexReader(idx)
    assert r.sum_total_term_freq == brute.sum_dl


def test_two_keyword_fields_combined(idx, raw):
    s = IndexSearcher(idx)
    got = s.match_all(parse_query("lang:en AND source:src1"))
    exp = sorted(raw[(raw.lang == "en") & (raw.source == "src1")]["doc_id"])
    assert got["doc_id"].to_pylist() == exp


def test_field_value_is_exact_not_analyzed(idx):
    s = IndexSearcher(idx)
    # "EN" does not match the stored value "en" (StringField is untokenized)
    assert s.count(parse_query("lang:EN")) == 0
