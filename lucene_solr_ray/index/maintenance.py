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
            docs, freqs = s.postings(term)
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
            # full mode: per-shard sum(ttf) over unique terms == sum(doclen)
            shard_ttf = sum(s.term_stats(t)[0:2][1] for t in uniq.tolist())
            assert shard_ttf == int(s.doclens.sum()), "shard ttf != sum(doclen)"
            total_ttf += shard_ttf
    assert total_docs == reader.doc_count, "manifest doc_count mismatch"
    if sample_terms is None:
        assert total_ttf == reader.sum_total_term_freq, "manifest sum_ttf mismatch"
    report["ok"] = True
    return report


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
    shard_offset = manifest["num_shards"]
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

        stage1 = ds.map_batches(offset_call, batch_format="pyarrow", batch_size=cfg.batch_size)
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

    manifest["num_shards"] = shard_offset + cfg.num_shards
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
    offset = dst["num_shards"]
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

    dst["num_shards"] = offset + src["num_shards"]
    dst["stats"]["doc_count"] += src["stats"]["doc_count"]
    dst["stats"]["sum_total_term_freq"] += src["stats"]["sum_total_term_freq"]
    dst["generation"] = int(time.time() * 1000)
    dst["sources"] = dst["sources"] + src["sources"]
    _atomic_write_json(os.path.join(dst_index_dir, "manifest.json"), dst)
    return dst


def force_merge(index_dir: str) -> dict:
    """Re-merge all generations into the base shard layout (forceMerge(1))."""
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

    import ray as _ray

    ncpu = int(_ray.cluster_resources().get("CPU", 4))
    tmp_post = os.path.join(index_dir, "postings.merged")
    shutil.rmtree(tmp_post, ignore_errors=True)
    merged = ray.data.read_parquet(expand_parquet_dirs(postings_in)).map_batches(
        reshard, batch_format="pyarrow"
    ).groupby(["shard", "bucket", "sub"], num_partitions=max(16, 2 * ncpu)).map_groups(
        encode_merge_group, batch_format="pyarrow"
    )
    merged.write_parquet(tmp_post, partition_cols=["shard"])
    tmp_docs = os.path.join(index_dir, "docs.merged")
    shutil.rmtree(tmp_docs, ignore_errors=True)
    dvf_fm = tuple(cfg.docvalues_fields or ())
    dds = ray.data.read_parquet(expand_parquet_dirs(docs_in)).map_batches(
        reshard, batch_format="pyarrow"
    ).map_batches(lambda t: docs_explode(t, dvf_fm), batch_format="pyarrow")
    dds.write_parquet(tmp_docs, partition_cols=["shard"])

    # two-phase commit: swap dirs, then write the manifest last
    shutil.rmtree(os.path.join(index_dir, "postings"))
    os.replace(tmp_post, os.path.join(index_dir, "postings"))
    shutil.rmtree(os.path.join(index_dir, "docs"))
    os.replace(tmp_docs, os.path.join(index_dir, "docs"))
    manifest["num_shards"] = K
    manifest["generation"] = int(time.time() * 1000)
    _atomic_write_json(os.path.join(index_dir, "manifest.json"), manifest)
    return manifest
