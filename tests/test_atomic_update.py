"""Atomic (partial) document updates (AtomicUpdateDocumentMerger.java:59
semantics + update-by-key reindex)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.index import IndexBuildConfig, build_index
from lucene_solr_ray.index.maintenance import (atomic_update,
                                               delete_by_ids,
                                               merge_atomic_ops)
from lucene_solr_ray.search import IndexSearcher


def test_merge_ops_semantics():
    docs = pa.table({
        "doc_id": [0, 1, 2],
        "text": ["a b", "c d", "e f"],
        "views": [10, 20, None],
        "tags": pa.array([["x", "y"], None, ["z"]],
                         pa.list_(pa.string())),
    })
    out = merge_atomic_ops(docs, {
        0: {"text": {"set": "new words"}, "views": {"inc": 5},
            "tags": {"add": "w"}},
        1: {"views": {"inc": 3}, "tags": {"add": ["p", "q"]}},
        2: {"tags": {"remove": "z"}, "views": 7},  # bare value == set
    })
    assert out["text"].to_pylist() == ["new words", "c d", "e f"]
    assert out["views"].to_pylist() == [15, 23, 7]
    assert out["tags"].to_pylist() == [["x", "y", "w"], ["p", "q"], []]
    # removeregex
    out2 = merge_atomic_ops(docs, {0: {"tags": {"removeregex": "[xy]"}}})
    assert out2["tags"].to_pylist()[0] == []
    with pytest.raises(ValueError):
        merge_atomic_ops(docs, {0: {"views": {"bogus": 1}}})
    with pytest.raises(KeyError):
        merge_atomic_ops(docs, {0: {"nope": {"set": 1}}})


def test_atomic_update_reindexes(tmp_path, ray_session):
    src = "/root/testdata/sf0.001/documents.parquet"
    d = str(tmp_path / "idx")
    build_index(src, d, key_col="doc_id", text_col="text",
                cfg=IndexBuildConfig(num_shards=2, num_buckets=2))
    s0 = IndexSearcher(d, dtype=np.float64)
    target = int(s0.search("fast", k=1)["doc_id"][0].as_py())
    # replace the doc's text: the old terms must stop matching it,
    # the new marker term must hit exactly this doc
    res = atomic_update(d, src, {
        target: {"text": {"set": "zzmarker aa bb"}}})
    assert res["updated"] == 1 and res["skipped_deleted"] == 0
    s1 = IndexSearcher(d, dtype=np.float64)
    hits = s1.match_all("zzmarker")
    assert hits["doc_id"].to_pylist() == [target]
    assert target not in set(s1.match_all("fast")["doc_id"].to_pylist())
    # CHAINED update: pass the previous update's source for this key
    res2 = atomic_update(d, [res["source"]], {
        target: {"text": {"set": "zzmarker2 only"}}})
    s2 = IndexSearcher(d, dtype=np.float64)
    assert s2.match_all("zzmarker2")["doc_id"].to_pylist() == [target]
    assert len(s2.match_all("zzmarker")) == 0
    # deleted keys are skipped, not resurrected
    delete_by_ids(d, [target])
    res3 = atomic_update(d, [res2["source"]], {
        target: {"text": {"set": "zombie"}}})
    assert res3["updated"] == 0 and res3["skipped_deleted"] == 1
    s3 = IndexSearcher(d, dtype=np.float64)
    assert len(s3.match_all("zombie")) == 0
