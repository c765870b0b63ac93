"""BINARY docvalues (DocValuesType.BINARY, BinaryDocValuesField.java:33):
per-doc opaque bytes beside the docs table, surviving append and merge."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.index import IndexBuildConfig, build_index
from lucene_solr_ray.search import IndexSearcher


@pytest.fixture(scope="module")
def idx(tmp_path_factory, ray_session):
    root = tmp_path_factory.mktemp("bdv")
    corpus = str(root / "c.parquet")
    blobs = [b"\x00\x01\xff", b"", None, b"abc", bytes(range(16))]
    pq.write_table(pa.table({
        "doc_id": pa.array(range(5), pa.int64()),
        "text": pa.array(["fast query", "slow merge", "fast fast",
                          "query", "merge fast"]),
        "blob": pa.array(blobs, pa.large_binary()),
    }), corpus)
    d = str(root / "idx")
    build_index(corpus, d, key_col="doc_id", text_col="text",
                cfg=IndexBuildConfig(num_shards=2, num_buckets=4,
                                     binary_docvalues_fields=("blob",)))
    return d, blobs


def test_roundtrip_including_empty_and_null(idx):
    d, blobs = idx
    s = IndexSearcher(d)
    got: dict[int, bytes | None] = {}
    for sh in s.reader.shards:
        for doc, val in zip(sh.doc_ids.tolist(),
                            sh.binary_dv["blob"].tolist()):
            got[doc] = val
    assert got == {i: b for i, b in enumerate(blobs)}


def test_bytes_for_matching_docs(idx):
    d, blobs = idx
    s = IndexSearcher(d)
    res = s.match_all("fast")
    for sh in s.reader.shards:
        docs = np.asarray([x for x in res["doc_id"].to_pylist()
                           if x % 2 == sh.shard % 2], dtype=np.int64)
        docs = docs[np.isin(docs, sh.doc_ids)]
        if not len(docs):
            continue
        vals = sh.bytes_for("blob", docs)
        for doc, v in zip(docs.tolist(), vals.tolist()):
            assert v == blobs[doc]


def test_survives_append_and_force_merge(idx, tmp_path):
    from lucene_solr_ray.index.maintenance import append_index, force_merge
    from lucene_solr_ray.index.replicator import (pull_revision,
                                                  publish_revision)

    d, blobs = idx
    work = str(tmp_path / "work")
    publish_revision(d)
    pull_revision(d, work)
    extra = str(tmp_path / "extra.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array([100, 101], pa.int64()),
        "text": pa.array(["fast new", "merge new"]),
        "blob": pa.array([b"new0", None], pa.large_binary()),
    }), extra)
    append_index(work, extra, key_col="doc_id", text_col="text")
    force_merge(work)
    s = IndexSearcher(work)
    got: dict[int, bytes | None] = {}
    for sh in s.reader.shards:
        for doc, val in zip(sh.doc_ids.tolist(),
                            sh.binary_dv["blob"].tolist()):
            got[doc] = val
    want = {i: b for i, b in enumerate(blobs)}
    want.update({100: b"new0", 101: None})
    assert got == want


def test_field_exists_query(idx, tmp_path_factory, ray_session):
    from lucene_solr_ray.search.query import Bool, FieldExists, Term

    d, blobs = idx
    s = IndexSearcher(d)
    # BINARY presence: doc 2 carries None
    got = sorted(s.match_all(FieldExists("blob"))["doc_id"].to_pylist())
    assert got == [i for i, b in enumerate(blobs) if b is not None]
    # scored must + exists filter
    res = s.match_all(Bool(must=[Term("fast")],
                           filter=[FieldExists("blob")]))
    assert 2 not in res["doc_id"].to_pylist()
    # unknown field matches nothing
    assert s.match_all(FieldExists("nope")).num_rows == 0
