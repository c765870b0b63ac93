"""Versioned (max-wins) update-by-key: out-of-order re-crawl batches
converge to the same index as sorted-order application
(DistributedUpdateProcessor.java:75 / UpdateLog.java:96 semantics)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.index import IndexBuildConfig, build_index
from lucene_solr_ray.index.maintenance import (
    check_index,
    force_merge,
    update_documents_versioned,
)
from lucene_solr_ray.search import IndexSearcher


def _write(path, rows):
    ids, texts, ts = zip(*rows)
    pq.write_table(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
        "warc_ts": pa.array(ts, pa.float64()),
    }), path)


def _base(tmp_path, name):
    p = str(tmp_path / f"{name}_base.parquet")
    _write(p, [(i, f"alpha crawl%d doc%d" % (0, i), 100.0) for i in range(20)])
    idx = str(tmp_path / name)
    cfg = IndexBuildConfig(num_shards=2, num_buckets=4,
                           docvalues_fields=("warc_ts",))
    build_index(p, idx, cfg=cfg)
    return idx


def _state(idx):
    s = IndexSearcher(idx)
    out = {}
    for t in ("alpha", "beta", "gamma", "delta"):
        out[t] = sorted(s.match_all(t)["doc_id"].to_pylist())
    versions = {}
    for sh in s.reader.reader_shards if hasattr(s.reader, "reader_shards") else s.reader.shards:
        if sh._live_mask is not None:
            live = sh.doc_ids[sh._live_mask]
            vals = sh.docvalues["warc_ts"][sh._live_mask]
        else:
            live = sh.doc_ids
            vals = sh.docvalues.get("warc_ts", np.zeros(0))
        for d, v in zip(live.tolist(), np.asarray(vals).tolist()):
            versions[d] = v
    return out, versions


def test_out_of_order_batches_converge(tmp_path, ray_session):
    # three re-crawl batches touching overlapping keys at different versions
    b1 = str(tmp_path / "b1.parquet")  # ts 200: keys 0-9 -> beta
    b2 = str(tmp_path / "b2.parquet")  # ts 300: keys 5-14 -> gamma
    b3 = str(tmp_path / "b3.parquet")  # ts 150: keys 0-4, 30 -> delta (stale except new key 30)
    _write(b1, [(i, f"beta doc%d" % i, 200.0) for i in range(10)])
    _write(b2, [(i, f"gamma doc%d" % i, 300.0) for i in range(5, 15)])
    _write(b3, [(i, f"delta doc%d" % i, 150.0) for i in list(range(5)) + [30]])

    idx_a = _base(tmp_path, "a")
    for b in (b1, b2, b3):  # chronological-ish order
        update_documents_versioned(idx_a, b)
    idx_b = _base(tmp_path, "b")
    for b in (b3, b2, b1):  # reversed order
        update_documents_versioned(idx_b, b)

    sa, va = _state(idx_a)
    sb, vb = _state(idx_b)
    assert sa == sb
    assert va == vb
    # the expected winners: 0-4 beta(200), 5-14 gamma(300), 15-19 alpha(100),
    # 30 delta(150)
    assert sa["beta"] == list(range(5))
    assert sa["gamma"] == list(range(5, 15))
    assert sa["alpha"] == list(range(15, 20))
    assert sa["delta"] == [30]

    # physical purge keeps the same winners
    force_merge(idx_a)
    force_merge(idx_b)
    sa2, va2 = _state(idx_a)
    sb2, vb2 = _state(idx_b)
    assert sa2 == sa and sb2 == sa
    assert va2 == va and vb2 == va
    check_index(idx_a)
    check_index(idx_b)


def test_stale_and_equal_versions_skip(tmp_path, ray_session):
    idx = _base(tmp_path, "c")
    stale = str(tmp_path / "stale.parquet")
    _write(stale, [(3, "beta doc3", 100.0),   # equal version: stored wins
                   (4, "beta doc4", 50.0)])   # lower version: stored wins
    m0 = IndexSearcher(idx).reader.manifest["generation"]
    m = update_documents_versioned(idx, stale)
    assert m["generation"] == m0  # early return, nothing applied
    s = IndexSearcher(idx)
    assert s.match_all("beta")["doc_id"].to_pylist() == []
    assert len(s.match_all("alpha")) == 20


def test_in_batch_duplicate_keys_keep_max(tmp_path, ray_session):
    idx = _base(tmp_path, "d")
    dup = str(tmp_path / "dup.parquet")
    _write(dup, [(2, "beta doc2", 500.0), (2, "gamma doc2", 900.0),
                 (2, "delta doc2", 700.0)])
    update_documents_versioned(idx, dup)
    s = IndexSearcher(idx)
    assert s.match_all("gamma")["doc_id"].to_pylist() == [2]
    assert s.match_all("beta")["doc_id"].to_pylist() == []
    assert s.match_all("delta")["doc_id"].to_pylist() == []


def test_requires_version_docvalues(tmp_path, ray_session):
    p = str(tmp_path / "nv.parquet")
    _write(p, [(0, "alpha", 1.0)])
    idx = str(tmp_path / "nv_idx")
    build_index(p, idx, cfg=IndexBuildConfig(num_shards=2, num_buckets=4))
    with pytest.raises(ValueError, match="docvalues_fields"):
        update_documents_versioned(idx, p)
