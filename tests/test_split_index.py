"""split_index (SolrIndexSplitter.java:80 / MultiPassIndexSplitter.java:44):
each output part is a self-contained committed index holding exactly its
routed docs, with scores matching a fresh build over the same subset."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.index import IndexBuildConfig, build_index
from lucene_solr_ray.index.maintenance import (
    check_index,
    delete_by_ids,
    split_index,
)
from lucene_solr_ray.search import IndexSearcher

DOCS = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture(scope="module")
def src(tmp_path_factory, ray_session):
    d = str(tmp_path_factory.mktemp("split_src"))
    build_index(DOCS, d, key_col="doc_id", text_col="text",
                cfg=IndexBuildConfig(num_shards=3, num_buckets=4))
    return d


def test_split_by_parity(src, tmp_path):
    outs = [str(tmp_path / "even"), str(tmp_path / "odd")]
    manifests = split_index(src, outs, lambda ids: ids % 2)
    all_ids = pq.read_table(DOCS, columns=["doc_id"])["doc_id"].to_numpy()
    for p, out in enumerate(outs):
        assert manifests[p]["committed"]
        assert check_index(out, sample_terms=20)["ok"]
        s = IndexSearcher(out)
        got = s.match_all("*:*" if False else "fast OR query OR merge")
        ids = np.asarray(got["doc_id"].to_pylist())
        assert np.all(ids % 2 == p)
    # completeness: doc counts add up
    n = sum(m["stats"]["doc_count"] for m in manifests)
    assert n == len(all_ids)


def test_split_part_matches_fresh_subset(src, tmp_path):
    import pyarrow as pa

    outs = [str(tmp_path / "lo"), str(tmp_path / "hi")]
    cut = 100
    split_index(src, outs, lambda ids: (ids >= cut).astype(np.int64))
    # fresh index over only the lo-subset corpus
    t = pq.read_table(DOCS)
    lo_corpus = str(tmp_path / "lo_docs.parquet")
    pq.write_table(t.filter(pa.compute.less(t["doc_id"], cut)), lo_corpus)
    fresh_dir = str(tmp_path / "fresh_lo")
    build_index(lo_corpus, fresh_dir, key_col="doc_id", text_col="text",
                cfg=IndexBuildConfig(num_shards=3, num_buckets=4))
    a = IndexSearcher(outs[0], dtype=np.float64).match_all("fast")
    b = IndexSearcher(fresh_dir, dtype=np.float64).match_all("fast")
    assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist()
    assert a["score"].to_pylist() == pytest.approx(b["score"].to_pylist(),
                                                   rel=1e-12)


def test_split_respects_prior_deletes(src, tmp_path):
    # tombstone a doc in a COPY of the source, then split the copy
    from lucene_solr_ray.index.replicator import pull_revision, publish_revision

    copy = str(tmp_path / "copy")
    publish_revision(src)
    pull_revision(src, copy)
    delete_by_ids(copy, [4, 5])
    outs = [str(tmp_path / "a"), str(tmp_path / "b")]
    split_index(copy, outs, lambda ids: ids % 2)
    for p, out in enumerate(outs):
        ids = IndexSearcher(out).match_all(
            "fast OR query OR merge")["doc_id"].to_pylist()
        assert (4 + p) not in ids  # 4 is even -> part 0; 5 odd -> part 1
        assert all(i % 2 == p for i in ids)


def test_route_out_of_range(src, tmp_path):
    with pytest.raises(ValueError, match="out of range"):
        split_index(src, [str(tmp_path / "x")], lambda ids: ids % 2)
