"""Delete / update lifecycle: tombstone overlay, update-by-key, physical
purge on force_merge, and no-resurrection after stage-1 normalization."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from lucene_solr_ray.index import IndexBuildConfig, build_index
from lucene_solr_ray.index.maintenance import (
    check_index,
    delete_by_ids,
    delete_by_query,
    delete_by_term,
    force_merge,
    update_documents,
)
from lucene_solr_ray.search import IndexSearcher


def _corpus(path, ids, texts):
    pq.write_table(pa.table({"doc_id": pa.array(ids, pa.int64()),
                             "text": pa.array(texts, pa.string())}), path)


def _build(tmp_path, n=60):
    p = str(tmp_path / "c.parquet")
    texts = [("apple banana doc%d" % i) if i % 3 else ("cherry banana doc%d" % i)
             for i in range(n)]
    _corpus(p, np.arange(n, dtype=np.int64), texts)
    idx = str(tmp_path / "idx")
    build_index(p, idx, cfg=IndexBuildConfig(num_shards=2, num_buckets=4))
    return idx, texts


def test_delete_masks_immediately(tmp_path):
    idx, texts = _build(tmp_path)
    s = IndexSearcher(idx)
    before = s.count("banana")
    assert before == 60
    delete_by_ids(idx, [0, 3, 6, 9])
    s2 = IndexSearcher(idx)  # fresh reader sees the tombstones
    assert s2.count("banana") == 56
    # cherry docs are ids % 3 == 0; four deleted
    assert s2.count("cherry") == 16
    got = s2.match_all("banana")["doc_id"].to_pylist()
    assert not ({0, 3, 6, 9} & set(got))
    # term stats stay RAW until merge (reference docFreq semantics)
    assert s2.reader.term_stats("banana")[0] == 60
    # storage invariants still hold in raw mode
    check_index(idx)


def test_delete_by_term_and_query(tmp_path):
    idx, _ = _build(tmp_path)
    _, n = delete_by_term(idx, "cherry")
    assert n == 20
    s = IndexSearcher(idx)
    assert s.count("cherry") == 0
    assert s.count("banana") == 40
    _, n2 = delete_by_query(idx, "apple AND banana")
    assert n2 == 40
    assert IndexSearcher(idx).count("banana") == 0
    # repeat delete is a no-op
    _, n3 = delete_by_term(idx, "cherry")
    assert n3 == 0


def test_force_merge_purges_and_stats(tmp_path):
    idx, _ = _build(tmp_path)
    delete_by_term(idx, "cherry")
    m = force_merge(idx)
    assert m["deletes"] == []
    assert m["stats"]["doc_count"] == 40
    s = IndexSearcher(idx)
    # stats now physically exclude the purged docs
    assert s.reader.term_stats("banana")[0] == 40
    assert s.reader.term_stats("cherry")[0] == 0
    assert s.count("banana") == 40
    check_index(idx)
    # no resurrection: another force_merge keeps the purge
    force_merge(idx)
    assert IndexSearcher(idx).reader.term_stats("cherry")[0] == 0


def test_update_documents_by_key(tmp_path):
    idx, _ = _build(tmp_path, n=30)
    upd = str(tmp_path / "upd.parquet")
    # docs 5 and 7 get new content; doc 100 is new
    _corpus(upd, np.array([5, 7, 100], dtype=np.int64),
            ["grape melon", "grape kiwi", "grape pear"])
    m = update_documents(idx, upd)
    assert m["stats"]["doc_count"] == 33  # 30 raw + 3 appended (2 masked)
    s = IndexSearcher(idx)
    assert sorted(s.match_all("grape")["doc_id"].to_pylist()) == [5, 7, 100]
    # old copies of 5/7 are masked
    banana_ids = s.match_all("banana")["doc_id"].to_pylist()
    assert 5 not in banana_ids and 7 not in banana_ids
    # physical purge collapses generations; updated docs survive
    m2 = force_merge(idx)
    assert m2["stats"]["doc_count"] == 31  # 28 originals + 3 updated/new
    s3 = IndexSearcher(idx)
    assert sorted(s3.match_all("grape")["doc_id"].to_pylist()) == [5, 7, 100]
    assert 5 not in s3.match_all("banana")["doc_id"].to_pylist()
    check_index(idx)


def test_delete_then_scores_match_fresh_build(tmp_path):
    # after delete + force_merge, BM25 scores equal a fresh build over the
    # surviving docs (rank- and value-identical)
    idx, texts = _build(tmp_path)
    delete_by_term(idx, "cherry")
    force_merge(idx)
    s = IndexSearcher(idx, dtype=np.float64)
    got = s.match_all("banana")

    keep_ids = [i for i in range(60) if i % 3]
    p2 = str(tmp_path / "c2.parquet")
    _corpus(p2, np.array(keep_ids, dtype=np.int64),
            [texts[i] for i in keep_ids])
    idx2 = str(tmp_path / "idx2")
    build_index(p2, idx2, cfg=IndexBuildConfig(num_shards=2, num_buckets=4))
    exp = IndexSearcher(idx2, dtype=np.float64).match_all("banana")
    assert got["doc_id"].to_pylist() == exp["doc_id"].to_pylist()
    assert got["score"].to_pylist() == exp["score"].to_pylist()
