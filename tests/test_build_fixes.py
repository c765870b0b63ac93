"""Regression tests for round-2 build fixes.

1. Head-term salting uses contiguous doc-range subkeys: postings of a salted
   term must decode globally doc-sorted even when the corpus is NOT sorted by
   doc_id (the round-1 hash-salt layout interleaved sub-ranges and broke
   check_index / WAND on unsorted corpora).
2. Resume with a regrouped file list must not double-index documents (the
   round-1 _from_disk globbed every stage-1 part dir, so old chunk groupings
   were merged alongside the new ones).
"""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.index import IndexBuildConfig, build_index
from lucene_solr_ray.index.maintenance import check_index
from lucene_solr_ray.search import IndexSearcher


def _write_corpus(path: str, doc_ids, texts):
    pq.write_table(
        pa.table({"doc_id": pa.array(doc_ids, pa.int64()),
                  "text": pa.array(texts, pa.string())}),
        path,
    )


def test_salted_head_term_postings_sorted_on_unsorted_corpus(tmp_path):
    # corpus deliberately NOT sorted by doc_id; 'the' appears in every doc so
    # the sampling pre-pass marks it head; tiny sub_span forces many subkeys
    rng = np.random.default_rng(7)
    n = 400
    ids = rng.permutation(n * 3)[:n].astype(np.int64)  # sparse, shuffled
    texts = [
        "the quick doc%d word%d the end" % (i % 17, i % 5) for i in range(n)
    ]
    corpus = str(tmp_path / "c.parquet")
    _write_corpus(corpus, ids, texts)
    idx = str(tmp_path / "idx")
    cfg = IndexBuildConfig(
        num_shards=2, num_buckets=4, batch_size=64,
        head_df_ratio=0.01, head_sample_docs=200, head_sub_span=64,
    )
    build_index(corpus, idx, cfg=cfg)
    # the head term must span several encoded rows (salting actually engaged)
    s = IndexSearcher(idx)
    multi = [sh for sh in s.reader.shards if len(sh.term_rows("the")) > 1]
    assert multi, "expected 'the' to be salted into multiple rows"
    # full integrity check: docs sorted per term, stats consistent
    check_index(idx)
    # WAND parity on a disjunction including the salted head term
    r_wand = s.search("the OR quick", k=10, use_wand="force")
    r_full = s.search("the OR quick", k=10, use_wand=False)
    assert r_wand["doc_id"].to_pylist() == r_full["doc_id"].to_pylist()
    assert r_wand["score"].to_pylist() == pytest.approx(
        r_full["score"].to_pylist()
    )


def test_resume_regrouped_chunks_no_double_index(tmp_path):
    # build over [f0] with files_per_chunk=2, then resume over [f0, f1]: the
    # regrouped chunk covers BOTH files, so the old single-file part dir must
    # be dropped — doc_count is 300, not 500
    f0 = str(tmp_path / "f0.parquet")
    f1 = str(tmp_path / "f1.parquet")
    _write_corpus(f0, np.arange(200, dtype=np.int64),
                  ["alpha beta doc%d" % i for i in range(200)])
    _write_corpus(f1, np.arange(200, 300, dtype=np.int64),
                  ["gamma delta doc%d" % i for i in range(100)])
    idx = str(tmp_path / "idx")
    cfg = IndexBuildConfig(num_shards=2, num_buckets=4, files_per_chunk=2)
    m1 = build_index([f0], idx, cfg=cfg)
    assert m1["stats"]["doc_count"] == 200
    m2 = build_index([f0, f1], idx, cfg=cfg, resume=True)
    assert m2["stats"]["doc_count"] == 300
    check_index(idx)
    # postings must not double-count either: 'alpha' df == 200
    s = IndexSearcher(idx)
    df, ttf = s.reader.term_stats("alpha")
    assert df == 200 and ttf == 200


@pytest.mark.parametrize("mode", ["sync", "overlap", "off"])
def test_stage1_checkpoint_modes_identical(tmp_path, ray_session, mode):
    """All three checkpoint modes must produce an identical index: same
    stats, same postings (term_stats), same top-k results."""
    f0 = str(tmp_path / "c.parquet")
    _write_corpus(f0, np.arange(300, dtype=np.int64),
                  ["alpha beta gamma doc%d" % i for i in range(300)])
    idx = str(tmp_path / f"idx_{mode}")
    cfg = IndexBuildConfig(num_shards=2, num_buckets=4,
                           stage1_checkpoint=mode)
    m = build_index([f0], idx, cfg=cfg)
    assert m["stats"]["doc_count"] == 300
    check_index(idx)
    s = IndexSearcher(idx)
    df, ttf = s.reader.term_stats("alpha")
    assert df == 300 and ttf == 300
    r = s.search("beta AND gamma", k=5)
    assert len(r) == 5


def test_overlap_checkpoint_supports_resume(tmp_path, ray_session):
    """An overlap-mode build leaves the same resumable stage-1 layout as a
    sync build: a second resumed build over a grown file list reuses the
    first chunk's checkpoint (lineage hit) and never double-indexes."""
    f0 = str(tmp_path / "f0.parquet")
    f1 = str(tmp_path / "f1.parquet")
    _write_corpus(f0, np.arange(200, dtype=np.int64),
                  ["alpha beta doc%d" % i for i in range(200)])
    _write_corpus(f1, np.arange(200, 300, dtype=np.int64),
                  ["gamma delta doc%d" % i for i in range(100)])
    idx = str(tmp_path / "idx")
    cfg = IndexBuildConfig(num_shards=2, num_buckets=4, files_per_chunk=1,
                           stage1_checkpoint="overlap", retain_stage1=True)
    m1 = build_index([f0], idx, cfg=cfg)
    assert m1["stats"]["doc_count"] == 200
    # the background checkpoint landed: part dir exists, no .tmp remains
    stage1 = os.path.join(idx, "stage1")
    parts = sorted(os.listdir(stage1))
    assert len(parts) == 1 and not parts[0].endswith(".tmp")
    m2 = build_index([f0, f1], idx, cfg=cfg, resume=True)
    assert m2["stats"]["doc_count"] == 300
    check_index(idx)
    s = IndexSearcher(idx)
    df, ttf = s.reader.term_stats("alpha")
    assert df == 200 and ttf == 200
