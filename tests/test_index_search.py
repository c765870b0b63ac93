import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.index import IndexBuildConfig, IndexReader, build_index
from lucene_solr_ray.search import IndexSearcher, parse_query
from lucene_solr_ray.search.executor import eval_node, resolve_weights
from tests.oracle import BruteForceIndex

DOCS = "/root/testdata/sf0.001/documents.parquet"

QUERIES = [
    "the",
    "fast",
    "fast query",
    "fast OR query",
    "fast AND query",
    "merge AND sort AND fast",
    "(fast AND query) OR merge",
    "fast AND NOT slow",
    '"fast query"',
    '"the fast"',
    "zzzznotfound",
    "fast OR zzzznotfound",
]


@pytest.fixture(scope="module")
def built(tmp_path_factory, ray_session):
    index_dir = str(tmp_path_factory.mktemp("idx"))
    cfg = IndexBuildConfig(num_shards=4, num_buckets=8, batch_size=128)
    manifest = build_index(DOCS, index_dir, key_col="doc_id", text_col="text", cfg=cfg)
    return index_dir, manifest


@pytest.fixture(scope="module")
def brute():
    t = pq.read_table(DOCS, columns=["doc_id", "text"])
    return BruteForceIndex(t["doc_id"].to_pylist(), t["text"].to_pylist())


def test_manifest_and_stats(built, brute):
    index_dir, manifest = built
    assert manifest["committed"]
    assert manifest["stats"]["doc_count"] == brute.N
    assert manifest["stats"]["sum_total_term_freq"] == brute.sum_dl


def test_postings_invariants(built, brute):
    index_dir, _ = built
    reader = IndexReader(index_dir)
    # df/ttf across shards match brute force for a sample of terms
    sample = ["the", "fast", "query", "merge", "a", "customer"]
    for term in sample:
        df, ttf = reader.term_stats(term)
        plist = brute.postings.get(term, {})
        assert df == len(plist), term
        assert ttf == sum(plist.values()), term
    # decoded postings equal brute-force postings per shard
    for s in reader.shards:
        for term in sample:
            docs, freqs = s.postings(term)
            assert len(docs) == len(set(docs.tolist()))
            assert np.all(np.diff(docs) > 0) or len(docs) <= 1
            for d, f in zip(docs.tolist(), freqs.tolist()):
                assert brute.postings[term][d] == f


@pytest.mark.parametrize("q", QUERIES)
def test_rank_identity_vs_bruteforce(built, brute, q):
    index_dir, _ = built
    searcher = IndexSearcher(index_dir)
    node = parse_query(q)
    exp_docs, exp_scores = brute.top_k(node, 10)
    got = searcher.search(q, k=10)
    assert got["doc_id"].to_pylist() == exp_docs, q
    np.testing.assert_array_equal(
        np.asarray(got["score"].to_pylist(), dtype=np.float32),
        np.asarray(exp_scores, dtype=np.float32),
    )


@pytest.mark.parametrize("q", ["the", "fast OR query OR merge", "fast OR slow OR big OR data"])
def test_wand_equals_exhaustive(built, q):
    index_dir, _ = built
    searcher = IndexSearcher(index_dir)
    # "force" bypasses the cost-based plan choice so the block-max pruning
    # path itself is what gets compared against the exhaustive scorer
    a = searcher.search(q, k=10, use_wand="force")
    b = searcher.search(q, k=10, use_wand=False)
    assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist()
    assert a["score"].to_pylist() == b["score"].to_pylist()


def test_shard_count_invariance(built, tmp_path_factory, brute):
    index_dir, _ = built
    one = str(tmp_path_factory.mktemp("idx1"))
    cfg = IndexBuildConfig(num_shards=1, num_buckets=4, batch_size=512)
    build_index(DOCS, one, key_col="doc_id", text_col="text", cfg=cfg)
    s_multi = IndexSearcher(index_dir)
    s_one = IndexSearcher(one)
    for q in QUERIES:
        a = s_multi.search(q, k=10)
        b = s_one.search(q, k=10)
        assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist(), q
        assert a["score"].to_pylist() == b["score"].to_pylist(), q


def test_count(built, brute):
    index_dir, _ = built
    searcher = IndexSearcher(index_dir)
    for q in QUERIES:
        node = parse_query(q)
        assert searcher.count(q) == len(brute.eval(node)), q


def test_resume_equals_fresh(tmp_path_factory, built):
    # build the same corpus via an interrupted-then-resumed build: chunking
    # with 1 file means the only chunk is checkpointed; a resumed call must
    # reuse lineage and produce an identical committed index
    index_dir, _ = built
    resumed = str(tmp_path_factory.mktemp("idx_resume"))
    cfg = IndexBuildConfig(num_shards=4, num_buckets=8, batch_size=128)
    m1 = build_index(DOCS, resumed, key_col="doc_id", text_col="text", cfg=cfg)
    # second call: committed manifest short-circuits (no rebuild)
    m2 = build_index(DOCS, resumed, key_col="doc_id", text_col="text", cfg=cfg)
    assert m2["lineage"] == m1["lineage"]
    a = IndexSearcher(index_dir).search("fast OR query", k=10)
    b = IndexSearcher(resumed).search("fast OR query", k=10)
    assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist()


def test_match_all_exhaustive(built, brute):
    index_dir, _ = built
    searcher = IndexSearcher(index_dir)
    node = parse_query("fast AND query")
    exp = brute.eval(node)
    got = searcher.match_all(node)
    assert sorted(got["doc_id"].to_pylist()) == sorted(exp)
