"""Round-3 merge semantics: stage-1 is GC'd at commit, all maintenance ops
merge the ENCODED segment tables, the resume guard refuses destructive
rebuilds, and empty shards tolerate tombstones."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.index import IndexBuildConfig, build_index
from lucene_solr_ray.index.maintenance import (
    add_indexes,
    append_index,
    check_index,
    delete_by_ids,
    delete_by_term,
    force_merge,
    update_documents,
)
from lucene_solr_ray.search import IndexSearcher


def _corpus(path, ids, texts):
    pq.write_table(pa.table({"doc_id": pa.array(ids, pa.int64()),
                             "text": pa.array(texts, pa.string())}), path)


def _build(tmp_path, n=60, name="idx", **cfg_kw):
    p = str(tmp_path / f"{name}.parquet")
    texts = [("apple banana doc%d" % i) if i % 3 else ("cherry banana doc%d" % i)
             for i in range(n)]
    _corpus(p, np.arange(n, dtype=np.int64), texts)
    idx = str(tmp_path / name)
    kw = dict(num_shards=2, num_buckets=4)
    kw.update(cfg_kw)
    build_index(p, idx, cfg=IndexBuildConfig(**kw))
    return idx, p


def test_stage1_gc_on_commit_and_merge_without_stage1(tmp_path):
    idx, _ = _build(tmp_path)
    # commit GC'd the checkpoint layer
    assert not os.path.isdir(os.path.join(idx, "stage1"))
    # delete + force_merge runs purely off the encoded tables
    delete_by_term(idx, "cherry")
    m = force_merge(idx)
    assert m["deletes"] == []
    assert m["stats"]["doc_count"] == 40
    s = IndexSearcher(idx)
    assert s.reader.term_stats("cherry")[0] == 0
    assert s.count("banana") == 40
    check_index(idx)


def test_retain_stage1_flag(tmp_path):
    idx, _ = _build(tmp_path, name="keep", retain_stage1=True)
    assert os.path.isdir(os.path.join(idx, "stage1"))


def test_force_merge_noop_on_clean_single_generation(tmp_path):
    idx, _ = _build(tmp_path)
    m1 = IndexSearcher(idx).reader.manifest
    m2 = force_merge(idx)
    assert m2["generation"] == m1["generation"]  # untouched


def test_resume_guard_refuses_rebuild_over_generations(tmp_path):
    idx, p = _build(tmp_path, n=30)
    upd = str(tmp_path / "upd.parquet")
    _corpus(upd, np.array([100], dtype=np.int64), ["grape melon"])
    append_index(idx, upd)
    with pytest.raises(ValueError, match="appended generations or pending"):
        build_index(p, idx, cfg=IndexBuildConfig(num_shards=2, num_buckets=4))


def test_resume_guard_refuses_rebuild_over_deletes(tmp_path):
    idx, p = _build(tmp_path, n=30)
    delete_by_ids(idx, [1, 2])
    with pytest.raises(ValueError, match="pending deletes"):
        build_index([p, p], idx, cfg=IndexBuildConfig(num_shards=2, num_buckets=4))


def test_empty_shard_with_tombstones(tmp_path):
    # more shards than occupied hash buckets: even-only doc ids with
    # num_shards=4 leave shards 1 and 3 empty; a delete must not crash reads
    p = str(tmp_path / "even.parquet")
    ids = np.arange(0, 40, 2, dtype=np.int64)
    _corpus(p, ids, ["apple banana doc%d" % i for i in ids])
    idx = str(tmp_path / "even_idx")
    build_index(p, idx, cfg=IndexBuildConfig(num_shards=4, num_buckets=4))
    delete_by_ids(idx, [0, 2])
    s = IndexSearcher(idx)
    assert s.count("banana") == 18
    force_merge(idx)
    assert IndexSearcher(idx).count("banana") == 18
    check_index(idx)


def test_add_indexes_encoded_and_guards(tmp_path):
    a, _ = _build(tmp_path, n=30, name="a")
    pb = str(tmp_path / "b.parquet")
    _corpus(pb, np.arange(1000, 1030, dtype=np.int64),
            ["grape kiwi doc%d" % i for i in range(30)])
    b = str(tmp_path / "b_idx")
    build_index(pb, b, cfg=IndexBuildConfig(num_shards=2, num_buckets=4))
    # src with pending deletes is refused
    delete_by_ids(b, [1000])
    with pytest.raises(ValueError, match="pending deletes"):
        add_indexes(a, b)
    force_merge(b)
    m = add_indexes(a, b)
    assert m["stats"]["doc_count"] == 59  # 30 + 29 (one purged in b)
    s = IndexSearcher(a)
    assert s.count("banana") == 30
    assert s.count("grape") == 29
    check_index(a)
    # a further force_merge collapses the import too
    force_merge(a)
    s2 = IndexSearcher(a)
    assert s2.count("grape") == 29 and s2.count("banana") == 30
    check_index(a)


def test_update_after_merge_chain(tmp_path):
    # delete -> merge -> update -> merge: no resurrection at any step
    idx, _ = _build(tmp_path, n=30)
    delete_by_term(idx, "cherry")  # removes ids % 3 == 0 (10 docs)
    force_merge(idx)
    upd = str(tmp_path / "u.parquet")
    _corpus(upd, np.array([4, 500], dtype=np.int64), ["grape one", "grape two"])
    update_documents(idx, upd)
    m = force_merge(idx)
    assert m["stats"]["doc_count"] == 21  # 20 survivors - 1 updated + 2
    s = IndexSearcher(idx)
    assert sorted(s.match_all("grape")["doc_id"].to_pylist()) == [4, 500]
    assert 4 not in s.match_all("banana")["doc_id"].to_pylist()
    check_index(idx)


def test_single_source_purge_passthrough(tmp_path):
    """forceMerge of a single generation takes the shuffle-free purge path:
    untouched postings rows pass through BYTE-IDENTICAL (only the shard
    label moves), and only rows containing tombstoned docs re-encode."""
    idx, _ = _build(tmp_path, n=400, name="pp", num_shards=2, num_buckets=4)

    def rows(d):
        import glob
        return pq.read_table(sorted(glob.glob(
            os.path.join(d, "postings", "shard=*", "*.parquet")))).to_pylist()

    def df_map(rs):
        # a term's postings can span shards: aggregate df across rows
        out = {}
        for r in rs:
            out[r["term"]] = out.get(r["term"], 0) + r["df"]
        return out

    before = rows(idx)
    # delete docs 0, 3, 6 (all i%3==0 -> 'cherry banana doc%d' docs)
    delete_by_ids(idx, [0, 3, 6])
    m = force_merge(idx)
    assert m["stats"]["doc_count"] == 397
    after = rows(idx)
    bdf, adf = df_map(before), df_map(after)
    # doc-specific singleton terms of untouched docs survive BYTE-IDENTICAL
    bsingle = {r["term"]: r for r in before if r["df"] == 1}
    asingle = {r["term"]: r for r in after if r["df"] == 1}
    assert asingle["doc5"]["short_bin"] == bsingle["doc5"]["short_bin"]
    # terms of deleted docs are gone or shrunk
    assert "doc3" not in adf and "doc0" not in adf and "doc6" not in adf
    assert adf["cherry"] == bdf["cherry"] - 3
    assert adf["banana"] == bdf["banana"] - 3
    assert adf["apple"] == bdf["apple"]
    s = IndexSearcher(idx)
    assert s.count("banana") == 397
    check_index(idx)


@pytest.mark.parametrize("seed", [3, 17])
def test_randomized_merge_chain_equals_fresh_build(tmp_path, seed):
    """Randomized equivalence property: build(A) -> append(B) -> random
    deletes -> force_merge must produce the SAME search results and global
    stats as a fresh single-generation build over the surviving docs (the
    reference's invariant: merging never changes what a reader sees —
    SegmentMerger.java:97).
    """
    rng = np.random.default_rng(seed)
    vocab = ["apple", "banana", "cherry", "date", "elder", "fig", "grape"]

    def texts(ids):
        return [" ".join(rng.choice(vocab, size=rng.integers(3, 9)))
                + f" doc{i}" for i in ids]

    ids_a = np.arange(0, 120, dtype=np.int64)
    ids_b = np.arange(200, 280, dtype=np.int64)
    ta, tb = texts(ids_a), texts(ids_b)
    pa_, pb = str(tmp_path / "a.parquet"), str(tmp_path / "b.parquet")
    _corpus(pa_, ids_a, ta)
    _corpus(pb, ids_b, tb)

    idx = str(tmp_path / "merged")
    build_index(pa_, idx, cfg=IndexBuildConfig(num_shards=2, num_buckets=4))
    append_index(idx, pb)
    all_ids = np.concatenate([ids_a, ids_b])
    all_texts = ta + tb
    dead = rng.choice(all_ids, size=30, replace=False)
    delete_by_ids(idx, dead.tolist())
    force_merge(idx)
    assert check_index(idx)["ok"]

    keep = ~np.isin(all_ids, dead)
    pf = str(tmp_path / "fresh.parquet")
    _corpus(pf, all_ids[keep], [t for t, k in zip(all_texts, keep) if k])
    fresh = str(tmp_path / "fresh")
    build_index(pf, fresh, cfg=IndexBuildConfig(num_shards=2, num_buckets=4))

    sm, sf = IndexSearcher(idx), IndexSearcher(fresh)
    assert sm.reader.doc_count == sf.reader.doc_count
    assert sm.reader.sum_total_term_freq == sf.reader.sum_total_term_freq
    for q in ("banana", "apple OR fig", "cherry AND banana",
              '"apple banana"', "grape OR date OR elder", "ap*"):
        rm, rf = sm.search(q, k=15), sf.search(q, k=15)
        assert rm["doc_id"].to_pylist() == rf["doc_id"].to_pylist(), q
        assert rm["score"].to_pylist() == pytest.approx(
            rf["score"].to_pylist(), rel=1e-6), q


def test_force_merge_crash_before_gc_leaves_readable_index(tmp_path, monkeypatch):
    """force_merge claims crash safety by ordering: write new shards ->
    commit manifest -> GC old dirs LAST. Simulate a crash between commit
    and GC (rmtree never runs): stray old shard dirs must be invisible to
    manifest-driven readers, and a re-run of force_merge must converge."""
    import shutil as _shutil

    idx, p = _build(tmp_path, n=80)
    delete_by_ids(idx, [1, 4, 7])

    calls = []
    real_rmtree = _shutil.rmtree
    # force_merge does `import shutil` locally; patch the stdlib function
    monkeypatch.setattr("shutil.rmtree", lambda *a, **k: calls.append(a))
    force_merge(idx)  # GC suppressed: stray dirs remain
    assert calls, "expected suppressed GC calls"
    monkeypatch.setattr("shutil.rmtree", real_rmtree)

    s = IndexSearcher(idx)
    res = s.search("banana", k=20)
    assert 1 not in res["doc_id"].to_pylist()
    assert check_index(idx)["ok"]
    expect = (res["doc_id"].to_pylist(), res["score"].to_pylist())

    # idempotent recovery: another force_merge (no deletes pending, single
    # generation) is a no-op and results are unchanged
    force_merge(idx)
    res2 = IndexSearcher(idx).search("banana", k=20)
    assert (res2["doc_id"].to_pylist(), res2["score"].to_pylist()) == expect


def test_force_merge_retry_after_midway_crash(tmp_path, monkeypatch):
    """Crash AFTER the merged shards are written but BEFORE the manifest
    commit, then retry: the retry reuses the same target shard ids, and
    parquet writes append into existing partition dirs — without clearing
    the debris first the retry would publish doubled postings/docs."""
    from lucene_solr_ray.index import maintenance as mnt

    idx, p = _build(tmp_path, n=80)
    delete_by_ids(idx, [1, 4, 7])

    real = mnt._atomic_write_json
    calls = {"n": 0}

    def boom(path, obj):
        if path.endswith("manifest.json") and obj.get("deletes") == []:
            calls["n"] += 1
            raise RuntimeError("simulated crash before manifest commit")
        return real(path, obj)

    monkeypatch.setattr(mnt, "_atomic_write_json", boom)
    with pytest.raises(RuntimeError):
        force_merge(idx)
    assert calls["n"] == 1
    monkeypatch.setattr(mnt, "_atomic_write_json", real)

    # the crashed attempt is invisible: old manifest still governs
    assert IndexSearcher(idx).count("banana") == 77

    m = force_merge(idx)  # retry must clear the debris, not append to it
    assert m["stats"]["doc_count"] == 77
    assert check_index(idx)["ok"]
    res = IndexSearcher(idx).search("banana", k=10)
    assert res.num_rows == 10
    assert 1 not in res["doc_id"].to_pylist()


def test_versioned_update_empty_batch_is_noop(tmp_path):
    from lucene_solr_ray.index.maintenance import update_documents_versioned

    p = str(tmp_path / "c.parquet")
    ids = np.arange(10, dtype=np.int64)
    pq.write_table(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array([f"apple doc{i}" for i in ids], pa.string()),
        "warc_ts": pa.array(ids.astype(np.float64), pa.float64()),
    }), p)
    idx = str(tmp_path / "idx")
    build_index(p, idx, cfg=IndexBuildConfig(
        num_shards=1, num_buckets=4, docvalues_fields=("warc_ts",)))

    empty = str(tmp_path / "empty.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string()),
        "warc_ts": pa.array([], pa.float64()),
    }), empty)
    m = update_documents_versioned(idx, empty)
    assert m["stats"]["doc_count"] == 10
    assert IndexSearcher(idx).count("apple") == 10
