"""Index maintenance: integrity checking, incremental append, force-merge.

* check_index — the reference's CheckIndex (index/CheckIndex.java:496,1843)
  as an executable spec: re-derives every invariant from the segment tables.
* append_index — NRT-style generation append (SURVEY.md §2.14): new docs
  become NEW shards (the Lucene model: new segments appended, old ones
  untouched); searchers see base+delta through the manifest; scores stay
  rank-identical to a full rebuild because BM25 stats are resolved globally
  at query time.
* force_merge — IndexWriter.forceMerge/TieredMergePolicy role: re-merge all
  generations' stage-1 postings back into the base shard layout. Valid
  because every generation shards by doc_id %% num_shards (shard id =
  offset + doc %% K, so shard %% K recovers the base assignment).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

import ray.data

from .build import (
    IndexBuildConfig,
    _atomic_write_json,
    docs_explode,
    encode_merge_group,
    expand_parquet_dirs,
    load_manifest,
)
from .reader import IndexReader


def check_index(index_dir: str, sample_terms: int | None = None) -> dict:
    """Verify index integrity; returns a report dict, raises on corruption.

    Checks per shard: term dictionary sorted; df == decoded posting count;
    docs strictly increasing; ttf == sum(freqs); block metadata dominates
    its block (max_freq, min_norm); every posting doc exists in the docs
    table. Globally: sum(ttf) == sum(doclen) == manifest stats.
    `sample_terms` bounds the per-shard decode work (None = all terms — the
    sampling mode is the 10^12-doc path)."""
    reader = IndexReader(index_dir)
    report = {"shards": reader.num_shards, "terms_checked": 0, "postings_checked": 0}
    total_ttf = 0
    total_docs = 0
    for s in reader.shards:
        terms = s.terms
        uniq = np.unique(terms)
        assert np.all(terms[:-1] <= terms[1:]), "term dictionary not sorted"
        total_docs += len(s.doc_ids)
        assert np.all(np.diff(s.doc_ids) > 0) or len(s.doc_ids) <= 1, "docs table not unique-sorted"
        check = uniq if sample_terms is None else uniq[:: max(1, len(uniq) // sample_terms)]
        for term in check.tolist():
            # raw storage view: df/ttf invariants include tombstoned docs
            # until forceMerge (the reference's CheckIndex likewise ignores
            # liveDocs when validating postings)
            docs, freqs = s.postings(term, live_only=False)
            df, ttf = s.term_stats(term)
            assert df == len(docs), f"df mismatch for {term!r}"
            assert ttf == int(freqs.sum()), f"ttf mismatch for {term!r}"
            assert len(docs) <= 1 or np.all(np.diff(docs) > 0), f"docs not sorted for {term!r}"
            idx = np.searchsorted(s.doc_ids, docs)
            assert np.all(idx < len(s.doc_ids)) and np.all(s.doc_ids[idx] == docs), \
                f"posting doc missing from docs table for {term!r}"
            firsts, maxf, minn = s.block_metadata(term)
            assert len(firsts) >= 1 and firsts[0] == docs[0], f"block firsts broken for {term!r}"
            assert int(freqs.max()) <= int(maxf.max()), f"impact max_freq violated for {term!r}"
            norms = s.norms_for(docs)
            assert int(norms.min()) >= int(minn.min()), f"impact min_norm violated for {term!r}"
            report["terms_checked"] += 1
            report["postings_checked"] += len(docs)
        if sample_terms is None:
            # full mode: per-shard sum(ttf) over unique terms == sum(doclen).
            # Index-time synonym insertions add postings without adding to
            # doclen (documented), so the invariant relaxes to >= there.
            has_syn = bool((reader.manifest.get("config") or {}).get("synonyms"))
            shard_ttf = sum(s.term_stats(t)[0:2][1] for t in uniq.tolist())
            if has_syn:
                assert shard_ttf >= int(s.doclens.sum()), "shard ttf < sum(doclen)"
            else:
                assert shard_ttf == int(s.doclens.sum()), "shard ttf != sum(doclen)"
            total_ttf += shard_ttf
    assert total_docs == reader.doc_count, "manifest doc_count mismatch"
    if sample_terms is None:
        if (reader.manifest.get("config") or {}).get("synonyms"):
            assert total_ttf >= reader.sum_total_term_freq, "manifest sum_ttf mismatch"
        else:
            assert total_ttf == reader.sum_total_term_freq, "manifest sum_ttf mismatch"
    report["ok"] = True
    return report


def delete_by_ids(index_dir: str, ids) -> dict:
    """Delete documents by key: tombstone sidecar + manifest bump (the
    reference's deleteDocuments -> liveDocs overlay,
    IndexWriter.java:1518 / Lucene50LiveDocsFormat). Searchers mask the
    tombstoned docs immediately; term statistics stay raw until force_merge
    physically drops them (Lucene's docFreq-includes-deleted semantics)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    manifest = load_manifest(index_dir)
    if not manifest or not manifest.get("committed"):
        raise ValueError("delete_by_ids requires a committed index")
    ids = np.unique(np.asarray(list(ids), dtype=np.int64))
    if not len(ids):
        return manifest
    dels = manifest.get("deletes") or []
    rel = os.path.join("deletes", f"del_{len(dels)}_{int(time.time() * 1000)}.parquet")
    os.makedirs(os.path.join(index_dir, "deletes"), exist_ok=True)
    pq.write_table(pa.table({"doc_id": pa.array(ids, pa.int64())}),
                   os.path.join(index_dir, rel))
    dels.append({"file": rel,
                 "max_shard": manifest.get("next_shard_offset",
                                           manifest["num_shards"]),
                 "count": int(len(ids))})
    manifest["deletes"] = dels
    manifest["generation"] = int(time.time() * 1000)
    _atomic_write_json(os.path.join(index_dir, "manifest.json"), manifest)
    return manifest


def delete_by_term(index_dir: str, term: str) -> tuple[dict, int]:
    """deleteDocuments(Term): collect the term's live postings docs across
    shards, tombstone them. Returns (manifest, n_deleted)."""
    import numpy as np

    reader = IndexReader(index_dir)
    parts = [s.postings(term)[0] for s in reader.shards]
    ids = np.concatenate(parts) if parts else np.zeros(0, np.int64)
    if not len(ids):
        return load_manifest(index_dir), 0
    return delete_by_ids(index_dir, ids), int(len(ids))


def delete_by_query(index_dir: str, query) -> tuple[dict, int]:
    """deleteDocuments(Query): matching live docs -> tombstones."""
    from ..search.searcher import IndexSearcher

    res = IndexSearcher(index_dir).match_all(query)
    ids = res["doc_id"].to_numpy(zero_copy_only=False)
    if not len(ids):
        return load_manifest(index_dir), 0
    return delete_by_ids(index_dir, ids), int(len(ids))


def update_documents(index_dir: str, new_paths, key_col: str = "doc_id",
                     text_col: str = "text") -> dict:
    """updateDocument semantics (IndexWriter.java:1276): delete-by-key then
    append the new versions as a fresh generation. Old copies are masked by
    the tombstone (scoped to pre-update shards), the new generation's shards
    carry the reindexed docs."""
    import numpy as np
    import pyarrow.parquet as pq

    if isinstance(new_paths, str):
        new_paths = [new_paths]
    keys = np.concatenate([
        pq.read_table(p, columns=[key_col])[key_col].to_numpy(zero_copy_only=False)
        for p in new_paths
    ])
    delete_by_ids(index_dir, keys)
    return append_index(index_dir, new_paths, key_col=key_col, text_col=text_col)


def append_index(
    index_dir: str,
    new_paths: str | list[str],
    key_col: str = "doc_id",
    text_col: str = "text",
) -> dict:
    """Append a new generation of documents as fresh shards.

    Requires a committed manifest; the new docs' keys must be distinct from
    existing ones (append-only contract, SURVEY.md §2.14 — updates by key
    are a max(warc_ts) dedup upstream)."""
    from .build import TokenizeExplode, detect_head_terms
    from dataclasses import asdict
    from zlib import crc32

    manifest = load_manifest(index_dir)
    if not manifest or not manifest.get("committed"):
        raise ValueError("append_index requires a committed base index")
    if isinstance(new_paths, str):
        new_paths = [new_paths]
    new_paths = sorted(new_paths)
    cfg = IndexBuildConfig(**manifest["config"])
    shard_offset = manifest.get("next_shard_offset", manifest["num_shards"])
    lineage = dict(manifest["lineage"])
    head_terms = manifest["head_terms"]
    cfg_dict = asdict(cfg)
    stage1_dir = os.path.join(index_dir, "stage1")

    new_chunk_dirs = []
    chunks = [new_paths[i:i + cfg.files_per_chunk]
              for i in range(0, len(new_paths), cfg.files_per_chunk)]
    for ci, chunk in enumerate(chunks):
        chunk_id = f"g{shard_offset}_c{ci:05d}_{crc32('|'.join(chunk).encode()):08x}"
        out_dir = os.path.join(stage1_dir, f"part={chunk_id}")
        if chunk_id in lineage:
            new_chunk_dirs.append(out_dir)
            continue
        cols = [key_col, text_col] if not cfg.html_col else [key_col, text_col, cfg.html_col]
        cols += [c for c in (cfg.keyword_fields or ()) if c not in cols]
        cols += [c for c in (cfg.docvalues_fields or ()) if c not in cols]
        ds = ray.data.read_parquet(chunk, columns=cols)
        fn = TokenizeExplode(
            key_col=key_col, text_col=text_col, cfg=cfg_dict, head_terms=head_terms
        )
        # offset the shard ids: this generation's docs form new segments
        base_call = fn.__call__

        def offset_call(batch, _fn=fn, _off=shard_offset):
            t = _fn(batch)
            import pyarrow as pa

            sh = t["shard"].to_numpy(zero_copy_only=False) + _off
            return t.set_column(t.column_names.index("shard"), "shard",
                                pa.array(sh.astype(np.int32)))

        from .build import effective_batch_size

        stage1 = ds.map_batches(offset_call, batch_format="pyarrow",
                                batch_size=effective_batch_size(cfg, chunk))
        tmp = out_dir + ".tmp"
        stage1.write_parquet(tmp, partition_cols=["kind"])
        os.replace(tmp, out_dir)
        lineage[chunk_id] = {"files": chunk, "ts": time.time(), "generation": shard_offset}
        new_chunk_dirs.append(out_dir)

    import ray as _ray

    ncpu = int(_ray.cluster_resources().get("CPU", 4))
    postings_in = [os.path.join(d, "kind=0") for d in new_chunk_dirs
                   if os.path.exists(os.path.join(d, "kind=0"))]
    docs_in = [os.path.join(d, "kind=1") for d in new_chunk_dirs
               if os.path.exists(os.path.join(d, "kind=1"))]
    merged = ray.data.read_parquet(expand_parquet_dirs(postings_in)).groupby(
        ["shard", "bucket", "sub"], num_partitions=max(16, 2 * ncpu)
    ).map_groups(encode_merge_group, batch_format="pyarrow")
    merged.write_parquet(os.path.join(index_dir, "postings"), partition_cols=["shard"])
    dvf = tuple(cfg.docvalues_fields or ())
    dds = ray.data.read_parquet(expand_parquet_dirs(docs_in)).map_batches(
        lambda t: docs_explode(t, dvf), batch_format="pyarrow")
    dds.write_parquet(os.path.join(index_dir, "docs"), partition_cols=["shard"])

    from ray.data.aggregate import Count, Sum

    delta = ray.data.read_parquet(expand_parquet_dirs(docs_in)).map_batches(
        lambda t: docs_explode(t, dvf), batch_format="pyarrow"
    ).aggregate(Count(), Sum("doclen", alias_name="sum_dl"))

    prev_ids = manifest.get("shard_ids") or list(range(manifest["num_shards"]))
    manifest["shard_ids"] = prev_ids + list(
        range(shard_offset, shard_offset + cfg.num_shards))
    manifest["next_shard_offset"] = shard_offset + cfg.num_shards
    manifest["num_shards"] = len(manifest["shard_ids"])
    manifest["stats"]["doc_count"] += int(delta["count()"])
    manifest["stats"]["sum_total_term_freq"] += int(delta["sum_dl"])
    manifest["lineage"] = lineage
    manifest["generation"] = int(time.time() * 1000)
    manifest["sources"] = manifest["sources"] + new_paths
    _atomic_write_json(os.path.join(index_dir, "manifest.json"), manifest)
    return manifest


def add_indexes(dst_index_dir: str, src_index_dir: str) -> dict:
    """IndexWriter.addIndexes (index/IndexWriter.java:2750): import another
    committed index's segments into this one as new generations.

    The source's stage-1 segments are re-sharded (shard id += destination
    shard count — the docID-rebase analog) and merged as fresh shards; the
    source index is untouched. Doc keys must be disjoint (same append-only
    contract as append_index)."""
    import pyarrow as pa

    dst = load_manifest(dst_index_dir)
    src = load_manifest(src_index_dir)
    if not (dst and dst.get("committed") and src and src.get("committed")):
        raise ValueError("add_indexes requires two committed indexes")
    offset = dst.get("next_shard_offset", dst["num_shards"])
    src_stage1 = os.path.join(src_index_dir, "stage1")
    part_dirs = sorted(
        os.path.join(src_stage1, d) for d in os.listdir(src_stage1)
        if d.startswith("part=") and not d.endswith(".tmp")
    )

    def reshard(t: pa.Table) -> pa.Table:
        sh = t["shard"].to_numpy(zero_copy_only=False) + offset
        return t.set_column(t.column_names.index("shard"), "shard",
                            pa.array(sh.astype(np.int32)))

    import ray as _ray

    ncpu = int(_ray.cluster_resources().get("CPU", 4))
    postings_in = [os.path.join(d, "kind=0") for d in part_dirs
                   if os.path.exists(os.path.join(d, "kind=0"))]
    docs_in = [os.path.join(d, "kind=1") for d in part_dirs
               if os.path.exists(os.path.join(d, "kind=1"))]
    merged = ray.data.read_parquet(expand_parquet_dirs(postings_in)).map_batches(
        reshard, batch_format="pyarrow"
    ).groupby(["shard", "bucket", "sub"], num_partitions=max(16, 2 * ncpu)).map_groups(
        encode_merge_group, batch_format="pyarrow"
    )
    merged.write_parquet(os.path.join(dst_index_dir, "postings"), partition_cols=["shard"])
    dvf_dst = tuple(IndexBuildConfig(**dst["config"]).docvalues_fields or ())
    dds = ray.data.read_parquet(expand_parquet_dirs(docs_in)).map_batches(
        reshard, batch_format="pyarrow"
    ).map_batches(lambda t: docs_explode(t, dvf_dst), batch_format="pyarrow")
    dds.write_parquet(os.path.join(dst_index_dir, "docs"), partition_cols=["shard"])

    # also import the source stage-1 parts (resharded) so force_merge and
    # future lineage operations see the full corpus
    dst_stage1 = os.path.join(dst_index_dir, "stage1")
    for d in part_dirs:
        pid = os.path.basename(d)[len("part="):]
        out_dir = os.path.join(dst_stage1, f"part=ax{offset}_{pid}")
        if os.path.exists(out_dir):
            continue
        tmp = out_dir + ".tmp"
        for kind in (0, 1):
            sub = os.path.join(d, f"kind={kind}")
            if not os.path.exists(sub):
                continue
            ds_k = ray.data.read_parquet(expand_parquet_dirs([sub])).map_batches(
                reshard, batch_format="pyarrow"
            )
            ds_k.write_parquet(os.path.join(tmp, f"kind={kind}"))
        os.replace(tmp, out_dir)
        dst["lineage"][f"ax{offset}_{pid}"] = {
            "imported_from": src_index_dir, "ts": time.time(),
        }

    prev_ids = dst.get("shard_ids") or list(range(dst["num_shards"]))
    src_ids = src.get("shard_ids") or list(range(src["num_shards"]))
    dst["shard_ids"] = prev_ids + [offset + i for i in src_ids]
    dst["next_shard_offset"] = offset + (
        src.get("next_shard_offset", src["num_shards"]))
    dst["num_shards"] = len(dst["shard_ids"])
    dst["stats"]["doc_count"] += src["stats"]["doc_count"]
    dst["stats"]["sum_total_term_freq"] += src["stats"]["sum_total_term_freq"]
    dst["generation"] = int(time.time() * 1000)
    dst["sources"] = dst["sources"] + src["sources"]
    _atomic_write_json(os.path.join(dst_index_dir, "manifest.json"), dst)
    return dst


def _tombstone_gens(index_dir: str, manifest: dict):
    """[(sorted ids, max_shard)] for every tombstone generation."""
    import pyarrow.parquet as pq

    gens = []
    for d in manifest.get("deletes") or []:
        t = pq.read_table(os.path.join(index_dir, d["file"]), columns=["doc_id"])
        gens.append((np.sort(t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)),
                     int(d["max_shard"])))
    return gens


def _dead_mask(flat_docs: np.ndarray, shard_rep: np.ndarray, gens) -> np.ndarray:
    dead = np.zeros(len(flat_docs), dtype=bool)
    for ids, ms in gens:
        if not len(ids):
            continue
        idx = np.minimum(np.searchsorted(ids, flat_docs), len(ids) - 1)
        dead |= (ids[idx] == flat_docs) & (shard_rep < ms)
    return dead


def _purge_stage1_postings(t, gens):
    """Drop tombstoned docs from stage-1 postings rows (list payloads)."""
    import pyarrow as pa

    docs_ch = t["docs"].combine_chunks()
    offs = docs_ch.offsets.to_numpy()
    row_lens = np.diff(offs).astype(np.int64)
    flat_docs = docs_ch.values.to_numpy(zero_copy_only=False).astype(np.int64)
    shard_rep = np.repeat(t["shard"].to_numpy(zero_copy_only=False), row_lens)
    dead = _dead_mask(flat_docs, shard_rep, gens)
    if not dead.any():
        return t
    keep = ~dead
    flat_freqs = t["freqs"].combine_chunks().values.to_numpy(zero_copy_only=False).astype(np.int64)
    flat_norms = t["norms"].combine_chunks().values.to_numpy(zero_copy_only=False)
    new_lens = np.add.reduceat(keep.astype(np.int64), offs[:-1]) if len(row_lens) else row_lens
    new_lens[row_lens == 0] = 0
    pos_list = t["positions"].combine_chunks()
    has_pos = pos_list.null_count < len(pos_list)
    cols = {}
    row_keep = new_lens > 0
    new_offs = np.concatenate([[0], np.cumsum(new_lens[row_keep])]).astype(np.int64)
    for name in ("shard", "bucket", "sub", "term"):
        cols[name] = t[name].combine_chunks().filter(pa.array(row_keep))
    cols["docs"] = pa.LargeListArray.from_arrays(
        new_offs, pa.array(flat_docs[keep], pa.int64()))
    cols["freqs"] = pa.LargeListArray.from_arrays(
        new_offs, pa.array(flat_freqs[keep].astype(np.int32), pa.int32()))
    cols["norms"] = pa.LargeListArray.from_arrays(
        new_offs, pa.array(flat_norms[keep].astype(np.int32), pa.int32()))
    if has_pos:
        flat_pos = pos_list.values.to_numpy(zero_copy_only=False)
        pos_keep = np.repeat(keep, flat_freqs)
        pos_lens = np.add.reduceat((flat_freqs * keep).astype(np.int64), offs[:-1]) \
            if len(row_lens) else row_lens
        pos_offs = np.concatenate([[0], np.cumsum(pos_lens[row_keep])]).astype(np.int64)
        cols["positions"] = pa.LargeListArray.from_arrays(
            pos_offs, pa.array(flat_pos[pos_keep], pa.int32()))
    else:
        cols["positions"] = pa.array([None] * int(row_keep.sum()),
                                     pa.large_list(pa.int32()))
    cols["dv"] = pa.array([None] * int(row_keep.sum()), pa.large_list(pa.float64()))
    return pa.table(cols)


def _purge_stage1_docs(t, gens, n_dv: int):
    """Drop tombstoned docs from stage-1 doc rows (doclen/norm/dv lists)."""
    import pyarrow as pa

    docs_ch = t["docs"].combine_chunks()
    offs = docs_ch.offsets.to_numpy()
    row_lens = np.diff(offs).astype(np.int64)
    flat_docs = docs_ch.values.to_numpy(zero_copy_only=False).astype(np.int64)
    shard_rep = np.repeat(t["shard"].to_numpy(zero_copy_only=False), row_lens)
    dead = _dead_mask(flat_docs, shard_rep, gens)
    if not dead.any():
        return t
    keep = ~dead
    flat_dl = t["freqs"].combine_chunks().values.to_numpy(zero_copy_only=False)
    flat_nm = t["norms"].combine_chunks().values.to_numpy(zero_copy_only=False)
    new_lens = np.add.reduceat(keep.astype(np.int64), offs[:-1]) if len(row_lens) else row_lens
    new_lens[row_lens == 0] = 0
    row_keep = new_lens > 0
    new_offs = np.concatenate([[0], np.cumsum(new_lens[row_keep])]).astype(np.int64)
    cols = {}
    for name in ("shard", "bucket", "sub", "term"):
        cols[name] = t[name].combine_chunks().filter(pa.array(row_keep))
    cols["docs"] = pa.LargeListArray.from_arrays(
        new_offs, pa.array(flat_docs[keep], pa.int64()))
    cols["freqs"] = pa.LargeListArray.from_arrays(
        new_offs, pa.array(flat_dl[keep].astype(np.int32), pa.int32()))
    cols["norms"] = pa.LargeListArray.from_arrays(
        new_offs, pa.array(flat_nm[keep].astype(np.int32), pa.int32()))
    cols["positions"] = pa.array([None] * int(row_keep.sum()),
                                 pa.large_list(pa.int32()))
    dv_list = t["dv"].combine_chunks()
    if n_dv and dv_list.null_count < len(dv_list):
        flat_dv = dv_list.values.to_numpy(zero_copy_only=False)
        dv_keep = np.repeat(keep, n_dv)
        dv_offs = (new_offs * n_dv).astype(np.int64)
        cols["dv"] = pa.LargeListArray.from_arrays(
            dv_offs, pa.array(flat_dv[dv_keep], pa.float64()))
    else:
        cols["dv"] = pa.array([None] * int(row_keep.sum()), pa.large_list(pa.float64()))
    return pa.table(cols)


def _gen_offsets(manifest: dict, K: int) -> list[int]:
    ids = manifest.get("shard_ids") or list(range(manifest["num_shards"]))
    return sorted({i - (i % K) for i in ids})


def _docs_rows_in(index_dir: str, shard_ids) -> int:
    import glob

    import pyarrow.parquet as pq

    total = 0
    for s in shard_ids:
        for f in glob.glob(os.path.join(index_dir, "docs", f"shard={s}", "*.parquet")):
            total += pq.ParquetFile(f).metadata.num_rows
    return total


def merge_generations(index_dir: str, offsets: list[int]) -> dict:
    """Selective (tiered) merge: collapse the given generations into ONE new
    generation, leaving every other generation untouched (the incremental
    TieredMergePolicy step, index/TieredMergePolicy.java:88-101 — force_merge
    is the full forceMerge(1) collapse). Tombstoned docs of the merged
    generations are physically dropped on the way."""
    import shutil

    import pyarrow as pa

    manifest = load_manifest(index_dir)
    if not manifest or not manifest.get("committed"):
        raise ValueError("merge_generations requires a committed index")
    cfg = IndexBuildConfig(**manifest["config"])
    K = cfg.num_shards
    merged_ids = sorted(i for off in offsets for i in range(off, off + K))
    shard_ids = manifest.get("shard_ids") or list(range(manifest["num_shards"]))
    missing = set(merged_ids) - set(shard_ids)
    if missing:
        raise ValueError(f"generations reference absent shards {sorted(missing)}")
    new_off = manifest.get("next_shard_offset", manifest["num_shards"])
    gens = _tombstone_gens(index_dir, manifest)
    dvf = tuple(cfg.docvalues_fields or ())
    merged_arr = np.asarray(merged_ids, dtype=np.int64)

    def sel_mask(t: pa.Table) -> np.ndarray:
        sh = t["shard"].to_numpy(zero_copy_only=False).astype(np.int64)
        idx = np.minimum(np.searchsorted(merged_arr, sh), len(merged_arr) - 1)
        return merged_arr[idx] == sh

    def reshard_new(t: pa.Table) -> pa.Table:
        sh = t["shard"].to_numpy(zero_copy_only=False)
        return t.set_column(
            t.column_names.index("shard"), "shard",
            pa.array((new_off + (sh % K)).astype(np.int32)),
        )

    stage1_dir = os.path.join(index_dir, "stage1")
    part_dirs = sorted(
        os.path.join(stage1_dir, d) for d in os.listdir(stage1_dir)
        if d.startswith("part=") and not d.endswith(".tmp")
    )

    import ray as _ray

    ncpu = int(_ray.cluster_resources().get("CPU", 4))

    def _selected(kind: int):
        subs = [os.path.join(d, f"kind={kind}") for d in part_dirs
                if os.path.exists(os.path.join(d, f"kind={kind}"))]
        ds = ray.data.read_parquet(expand_parquet_dirs(subs))
        ds = ds.map_batches(
            lambda t: t.filter(pa.array(sel_mask(t))), batch_format="pyarrow")
        if gens:
            purge = (
                (lambda t: _purge_stage1_postings(t, gens)) if kind == 0
                else (lambda t: _purge_stage1_docs(t, gens, len(dvf)))
            )
            ds = ds.map_batches(purge, batch_format="pyarrow")
        return ds.map_batches(reshard_new, batch_format="pyarrow")

    merged = _selected(0).groupby(
        ["shard", "bucket", "sub"], num_partitions=max(16, 2 * ncpu)
    ).map_groups(encode_merge_group, batch_format="pyarrow")
    merged.write_parquet(os.path.join(index_dir, "postings"),
                         partition_cols=["shard"])
    _selected(1).map_batches(
        lambda t: docs_explode(t, dvf), batch_format="pyarrow"
    ).write_parquet(os.path.join(index_dir, "docs"), partition_cols=["shard"])

    # rewrite stage-1 parts: merged-generation rows move to the new shard
    # range (purged); everything else is byte-identical
    for d in part_dirs:
        touched = False
        tmp = d + ".rewrite"
        shutil.rmtree(tmp, ignore_errors=True)
        for kind in (0, 1):
            sub = os.path.join(d, f"kind={kind}")
            if not os.path.exists(sub):
                continue
            k_ds = ray.data.read_parquet(expand_parquet_dirs([sub]))

            def transform(t: pa.Table, _kind=kind) -> pa.Table:
                m = sel_mask(t)
                if not m.any():
                    return t
                keep = t.filter(pa.array(~m))
                moved = t.filter(pa.array(m))
                if gens:
                    moved = (_purge_stage1_postings(moved, gens) if _kind == 0
                             else _purge_stage1_docs(moved, gens, len(dvf)))
                moved = reshard_new(moved)
                return pa.concat_tables([keep, moved], promote_options="default")

            # probe: does this part contain merged rows at all?
            any_sel = False
            for b in k_ds.iter_batches(batch_format="pyarrow", batch_size=4096):
                if sel_mask(b).any():
                    any_sel = True
                    break
            if not any_sel:
                continue
            touched = True
            ray.data.read_parquet(expand_parquet_dirs([sub])).map_batches(
                transform, batch_format="pyarrow"
            ).write_parquet(os.path.join(tmp, f"kind={kind}"))
        if touched:
            # kinds not rewritten (no merged rows) are copied over
            for kind in (0, 1):
                src = os.path.join(d, f"kind={kind}")
                dst = os.path.join(tmp, f"kind={kind}")
                if os.path.exists(src) and not os.path.exists(dst):
                    shutil.copytree(src, dst)
            shutil.rmtree(d)
            os.replace(tmp, d)
        else:
            shutil.rmtree(tmp, ignore_errors=True)

    for s in merged_ids:
        shutil.rmtree(os.path.join(index_dir, "postings", f"shard={s}"),
                      ignore_errors=True)
        shutil.rmtree(os.path.join(index_dir, "docs", f"shard={s}"),
                      ignore_errors=True)

    from ray.data.aggregate import Count, Sum

    stats_row = (
        ray.data.read_parquet(os.path.join(index_dir, "docs"), columns=["doclen"])
        .aggregate(Count(), Sum("doclen", alias_name="sum_dl"))
    )
    manifest["shard_ids"] = sorted(
        [i for i in shard_ids if i not in set(merged_ids)]
        + list(range(new_off, new_off + K))
    )
    manifest["next_shard_offset"] = new_off + K
    manifest["num_shards"] = len(manifest["shard_ids"])
    manifest["stats"] = {"doc_count": int(stats_row["count()"]),
                         "sum_total_term_freq": int(stats_row["sum_dl"])}
    manifest["generation"] = int(time.time() * 1000)
    _atomic_write_json(os.path.join(index_dir, "manifest.json"), manifest)
    return manifest


def maybe_tiered_merge(index_dir: str, max_generations: int = 4) -> dict | None:
    """TieredMergePolicy planner: when the generation count exceeds
    max_generations, merge the SMALLEST generations (by doc count) down to
    the budget in one selective merge — the incremental alternative to a
    full force_merge at 10^12-doc scale."""
    manifest = load_manifest(index_dir)
    if not manifest or not manifest.get("committed"):
        raise ValueError("maybe_tiered_merge requires a committed index")
    K = IndexBuildConfig(**manifest["config"]).num_shards
    offsets = _gen_offsets(manifest, K)
    if len(offsets) <= max_generations:
        return None
    sizes = {
        off: _docs_rows_in(index_dir, range(off, off + K)) for off in offsets
    }
    n_merge = len(offsets) - max_generations + 1
    pick = sorted(offsets, key=lambda o: (sizes[o], o))[:n_merge]
    return merge_generations(index_dir, pick)


def force_merge(index_dir: str) -> dict:
    """Re-merge all generations into the base shard layout (forceMerge(1)),
    physically dropping tombstoned documents and clearing the tombstones
    (the reference's forceMerge purging deleted docs)."""
    import pyarrow as pa
    import shutil

    manifest = load_manifest(index_dir)
    if not manifest or not manifest.get("committed"):
        raise ValueError("force_merge requires a committed index")
    cfg = IndexBuildConfig(**manifest["config"])
    K = cfg.num_shards
    stage1_dir = os.path.join(index_dir, "stage1")
    part_dirs = sorted(
        os.path.join(stage1_dir, d) for d in os.listdir(stage1_dir)
        if d.startswith("part=") and not d.endswith(".tmp")
    )
    postings_in = [os.path.join(d, "kind=0") for d in part_dirs
                   if os.path.exists(os.path.join(d, "kind=0"))]
    docs_in = [os.path.join(d, "kind=1") for d in part_dirs
               if os.path.exists(os.path.join(d, "kind=1"))]

    def reshard(t: pa.Table) -> pa.Table:
        sh = t["shard"].to_numpy(zero_copy_only=False) % K
        return t.set_column(t.column_names.index("shard"), "shard",
                            pa.array(sh.astype(np.int32)))

    # tombstone purge: filter the list payloads BEFORE resharding (the
    # max_shard scoping refers to pre-merge shard ids). `gens` rides in the
    # task closure — serialized once into the task spec, not per batch.
    gens = _tombstone_gens(index_dir, manifest)
    dvf_fm = tuple(cfg.docvalues_fields or ())

    import ray as _ray

    ncpu = int(_ray.cluster_resources().get("CPU", 4))
    tmp_post = os.path.join(index_dir, "postings.merged")
    shutil.rmtree(tmp_post, ignore_errors=True)
    post_ds = ray.data.read_parquet(expand_parquet_dirs(postings_in))
    if gens:
        post_ds = post_ds.map_batches(
            lambda t: _purge_stage1_postings(t, gens), batch_format="pyarrow")
    merged = post_ds.map_batches(
        reshard, batch_format="pyarrow"
    ).groupby(["shard", "bucket", "sub"], num_partitions=max(16, 2 * ncpu)).map_groups(
        encode_merge_group, batch_format="pyarrow"
    )
    merged.write_parquet(tmp_post, partition_cols=["shard"])
    tmp_docs = os.path.join(index_dir, "docs.merged")
    shutil.rmtree(tmp_docs, ignore_errors=True)
    doc_ds = ray.data.read_parquet(expand_parquet_dirs(docs_in))
    if gens:
        doc_ds = doc_ds.map_batches(
            lambda t: _purge_stage1_docs(t, gens, len(dvf_fm)),
            batch_format="pyarrow")
    dds = doc_ds.map_batches(
        reshard, batch_format="pyarrow"
    ).map_batches(lambda t: docs_explode(t, dvf_fm), batch_format="pyarrow")
    dds.write_parquet(tmp_docs, partition_cols=["shard"])

    # Normalize stage-1 to the merged layout whenever tombstones were purged
    # or generations collapsed: purge dead docs from the checkpointed parts
    # and renumber their shards % K, so no later append/force_merge can
    # resurrect a deleted doc or mis-scope a future tombstone against stale
    # generation shard ids.
    needs_stage1_rewrite = bool(gens) or manifest.get("next_shard_offset", manifest["num_shards"]) != K
    if needs_stage1_rewrite:
        for d in part_dirs:
            tmp = d + ".rewrite"
            shutil.rmtree(tmp, ignore_errors=True)
            for kind in (0, 1):
                sub = os.path.join(d, f"kind={kind}")
                if not os.path.exists(sub):
                    continue
                k_ds = ray.data.read_parquet(expand_parquet_dirs([sub]))
                if gens:
                    purge = (
                        (lambda t: _purge_stage1_postings(t, gens)) if kind == 0
                        else (lambda t: _purge_stage1_docs(t, gens, len(dvf_fm)))
                    )
                    k_ds = k_ds.map_batches(purge, batch_format="pyarrow")
                k_ds = k_ds.map_batches(reshard, batch_format="pyarrow")
                k_ds.write_parquet(os.path.join(tmp, f"kind={kind}"))
            shutil.rmtree(d)
            os.replace(tmp, d)

    # two-phase commit: swap dirs, then write the manifest last
    shutil.rmtree(os.path.join(index_dir, "postings"))
    os.replace(tmp_post, os.path.join(index_dir, "postings"))
    shutil.rmtree(os.path.join(index_dir, "docs"))
    os.replace(tmp_docs, os.path.join(index_dir, "docs"))
    if gens:
        from ray.data.aggregate import Count, Sum

        stats_row = (
            ray.data.read_parquet(os.path.join(index_dir, "docs"), columns=["doclen"])
            .aggregate(Count(), Sum("doclen", alias_name="sum_dl"))
        )
        manifest["stats"] = {
            "doc_count": int(stats_row["count()"]),
            "sum_total_term_freq": int(stats_row["sum_dl"]),
        }
        for d in manifest.get("deletes") or []:
            try:
                os.remove(os.path.join(index_dir, d["file"]))
            except OSError:
                pass
        manifest["deletes"] = []
    manifest["num_shards"] = K
    manifest["shard_ids"] = list(range(K))
    manifest["next_shard_offset"] = K
    manifest["generation"] = int(time.time() * 1000)
    _atomic_write_json(os.path.join(index_dir, "manifest.json"), manifest)
    return manifest
