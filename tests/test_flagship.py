import os

import pytest

from lucene_solr_ray.index import IndexBuildConfig
from lucene_solr_ray.pipelines import synthesize_corpus
from lucene_solr_ray.pipelines.flagship import (
    DEFAULT_QUERIES,
    build_corpus_index,
    run_queries,
)
from lucene_solr_ray.search import IndexSearcher, parse_query
from tests.oracle import BruteForceIndex


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    p = tmp_path_factory.mktemp("corpus") / "corpus.parquet"
    return synthesize_corpus(800, str(p))


@pytest.fixture(scope="module")
def flagship_index(corpus, tmp_path_factory, ray_session):
    index_dir = str(tmp_path_factory.mktemp("fidx"))
    cfg = IndexBuildConfig(num_shards=4, num_buckets=8, batch_size=200,
                           head_sub_span=128)  # tiny sub-span to exercise salting
    manifest = build_corpus_index(corpus, index_dir, cfg=cfg, from_html=True)
    return index_dir, manifest


def test_flagship_build_from_html(flagship_index):
    index_dir, manifest = flagship_index
    assert manifest["committed"]
    assert manifest["stats"]["doc_count"] == 800
    assert manifest["head_terms"]  # Zipf head detected -> salting active


def test_flagship_rank_identity(flagship_index, corpus):
    import pyarrow.parquet as pq

    index_dir, _ = flagship_index
    t = pq.read_table(corpus, columns=["doc_id", "text"])
    brute = BruteForceIndex(t["doc_id"].to_pylist(), t["text"].to_pylist())
    searcher = IndexSearcher(index_dir)
    import numpy as np

    for q in DEFAULT_QUERIES:
        node = parse_query(q)
        exp_docs, exp_scores = brute.top_k(node, 10)
        got = searcher.search(q, k=10)
        assert got["doc_id"].to_pylist() == exp_docs, q
        np.testing.assert_array_equal(
            np.asarray(got["score"].to_pylist(), dtype=np.float32),
            np.asarray(exp_scores, dtype=np.float32),
        )


def test_run_queries_table(flagship_index):
    index_dir, _ = flagship_index
    res = run_queries(index_dir, k=5)
    assert res.num_rows > 0
    assert res.column_names == ["query", "rank", "doc_id", "score"]


def test_distributed_searcher_matches_local(flagship_index):
    from lucene_solr_ray.search import DistributedSearcher

    index_dir, _ = flagship_index
    local = IndexSearcher(index_dir)
    dist = DistributedSearcher(index_dir, num_actors=2)
    for q in ["ka", "kato OR mito", '"ka to"']:
        a = local.search(q, k=10)
        b = dist.search(q, k=10)
        assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist(), q
        assert a["score"].to_pylist() == b["score"].to_pylist(), q
