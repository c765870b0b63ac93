import glob
import os

import pytest

from lucene_solr_ray.index import IndexBuildConfig, build_index
from lucene_solr_ray.index.maintenance import append_index, check_index, force_merge
from lucene_solr_ray.pipelines import synthesize_corpus
from lucene_solr_ray.search import IndexSearcher

QUERIES = ["ka", "kato OR mito", "kato AND ne", '"ka to"', "fa*"]


@pytest.fixture(scope="module")
def corpus2(tmp_path_factory):
    d = tmp_path_factory.mktemp("nrt_corpus")
    p = synthesize_corpus(600, str(d / "c"), n_files=2)
    return sorted(glob.glob(os.path.join(p, "*.parquet")))


@pytest.fixture(scope="module")
def cfg():
    return IndexBuildConfig(num_shards=2, num_buckets=4, batch_size=128)


@pytest.fixture(scope="module")
def full_idx(corpus2, cfg, tmp_path_factory, ray_session):
    d = str(tmp_path_factory.mktemp("full"))
    build_index(corpus2, d, key_col="doc_id", text_col="text", cfg=cfg)
    return d


def _results(idx, queries=QUERIES, k=10):
    s = IndexSearcher(idx)
    return {q: (s.search(q, k)["doc_id"].to_pylist(),
                s.search(q, k)["score"].to_pylist()) for q in queries}


def test_check_index_full(full_idx):
    rep = check_index(full_idx)
    assert rep["ok"] and rep["terms_checked"] > 0


def test_append_matches_full_rebuild(corpus2, cfg, full_idx, tmp_path_factory):
    base_dir = str(tmp_path_factory.mktemp("base"))
    build_index(corpus2[:1], base_dir, key_col="doc_id", text_col="text", cfg=cfg)
    m = append_index(base_dir, corpus2[1:])
    assert m["num_shards"] == 2 * cfg.num_shards
    exp = _results(full_idx)
    got = _results(base_dir)
    for q in QUERIES:
        assert got[q][0] == exp[q][0], q
        assert got[q][1] == exp[q][1], q
    # integrity holds across generations
    assert check_index(base_dir)["ok"]

    # force_merge collapses generations back to the base layout with
    # identical results
    m2 = force_merge(base_dir)
    assert m2["num_shards"] == cfg.num_shards
    got2 = _results(base_dir)
    for q in QUERIES:
        assert got2[q][0] == exp[q][0], q
        assert got2[q][1] == exp[q][1], q
    assert check_index(base_dir)["ok"]


def test_check_index_detects_corruption(corpus2, cfg, tmp_path_factory):
    import pyarrow.parquet as pq
    import pyarrow as pa

    d = str(tmp_path_factory.mktemp("corrupt"))
    build_index(corpus2[:1], d, key_col="doc_id", text_col="text", cfg=cfg)
    # corrupt one shard's docs table (drop half the rows)
    shard_dir = os.path.join(d, "docs", "shard=0")
    f = glob.glob(os.path.join(shard_dir, "*.parquet"))[0]
    t = pq.read_table(f)
    pq.write_table(t.slice(0, max(1, t.num_rows // 2)), f)
    with pytest.raises(AssertionError):
        check_index(d)


def test_add_indexes_matches_combined_build(corpus2, cfg, full_idx, tmp_path_factory):
    from lucene_solr_ray.index.maintenance import add_indexes

    a_dir = str(tmp_path_factory.mktemp("ax_a"))
    b_dir = str(tmp_path_factory.mktemp("ax_b"))
    build_index(corpus2[:1], a_dir, key_col="doc_id", text_col="text", cfg=cfg)
    build_index(corpus2[1:], b_dir, key_col="doc_id", text_col="text", cfg=cfg)
    m = add_indexes(a_dir, b_dir)
    assert m["num_shards"] == 2 * cfg.num_shards
    exp = _results(full_idx)
    got = _results(a_dir)
    for q in QUERIES:
        assert got[q][0] == exp[q][0], q
        assert got[q][1] == exp[q][1], q
    assert check_index(a_dir)["ok"]
    # and force_merge still collapses correctly after an import
    force_merge(a_dir)
    got2 = _results(a_dir)
    for q in QUERIES:
        assert got2[q][0] == exp[q][0], q
