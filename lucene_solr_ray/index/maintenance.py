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
    analyzed = frozenset(
        e[0] for e in (reader.manifest.get("config") or {}).get(
            "analyzed_fields") or ())
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
            # analyzed-field terms carry THEIR field's norms
            i_colon = term.find(":")
            nfield = (term[:i_colon]
                      if i_colon > 0 and term[:i_colon] in analyzed else None)
            norms = s.norms_for(docs, nfield)
            assert int(norms.min()) >= int(minn.min()), f"impact min_norm violated for {term!r}"
            report["terms_checked"] += 1
            report["postings_checked"] += len(docs)
        if sample_terms is None:
            # full mode: per-shard sum(ttf) over TEXT terms == sum(doclen),
            # and per analyzed field sum(ttf of its namespaced terms) ==
            # sum(fdl_<field>). Index-time synonym insertions add postings
            # without adding to doclen (documented), so the text invariant
            # relaxes to >= there. Keyword-field terms ("col:value") are
            # namespaced too and excluded from the text sum.
            _mc = reader.manifest.get("config") or {}
            # synonym, word-delimiter and edge-ngram insertions add postings
            # without adding to doclen, so the equality relaxes to >= there
            has_syn = (bool(_mc.get("synonyms")) or bool(_mc.get("word_delimiter"))
                       or bool(_mc.get("edge_ngram")))
            ns_prefixes = analyzed | {
                c for c in (reader.manifest.get("config") or {}).get(
                    "keyword_fields") or ()}
            text_ttf = 0
            field_ttf: dict = {f: 0 for f in analyzed}
            for t in uniq.tolist():
                i = t.find(":")
                pre = t[:i] if i > 0 else None
                ttf_t = s.term_stats(t)[1]
                if pre in analyzed:
                    field_ttf[pre] += ttf_t
                elif pre in ns_prefixes:
                    pass  # keyword terms: no length accounting
                else:
                    text_ttf += ttf_t
            if has_syn:
                assert text_ttf >= int(s.doclens.sum()), "shard ttf < sum(doclen)"
            else:
                assert text_ttf == int(s.doclens.sum()), "shard ttf != sum(doclen)"
            for f, v in field_ttf.items():
                fdl = s.docvalues.get(f"fdl_{f}")
                assert fdl is not None and v == int(fdl.sum()), \
                    f"field {f!r} ttf != sum(fdl)"
            total_ttf += text_ttf
    assert total_docs == reader.doc_count, "manifest doc_count mismatch"
    if sample_terms is None:
        _mc = reader.manifest.get("config") or {}
        if (_mc.get("synonyms") or _mc.get("word_delimiter")
                or _mc.get("edge_ngram")):
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


def update_documents_versioned(
    index_dir: str, new_paths, key_col: str = "doc_id",
    text_col: str = "text", version_col: str = "warc_ts",
) -> dict:
    """Versioned update-by-key: an incoming doc replaces the stored one only
    when its version is STRICTLY higher (DistributedUpdateProcessor.java:75
    externally-assigned `_version_` semantics / UpdateLog.java:96). Applying
    re-crawl batches in ANY order converges to the same index: every key
    ends up with its max-version document, ties keep the stored copy.

    Requires the index to carry version_col as a NUMERIC docvalues field
    (the stored-version lookup is a pruned (doc_id, dv_version) read of the
    docs tables — the corpus is never touched)."""
    from zlib import crc32

    import pyarrow as pa
    import pyarrow.parquet as pq

    manifest = load_manifest(index_dir)
    if not manifest or not manifest.get("committed"):
        raise ValueError("update_documents_versioned requires a committed index")
    cfg = IndexBuildConfig(**manifest["config"])
    if version_col not in (cfg.docvalues_fields or ()):
        raise ValueError(
            f"{version_col!r} must be in docvalues_fields for versioned updates")
    if isinstance(new_paths, str):
        new_paths = [new_paths]

    # incoming (key, version); within the batch the max version per key wins
    inc = pa.concat_tables([
        pq.read_table(p) for p in new_paths
    ], promote_options="default")
    if inc.num_rows == 0:
        return manifest
    keys = inc[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
    vers = inc[version_col].to_numpy(zero_copy_only=False).astype(np.float64)
    order = np.lexsort((-vers, keys))
    first = np.ones(len(keys), dtype=bool)
    sk = keys[order]
    first[1:] = sk[1:] != sk[:-1]
    pick = order[first]                      # row index of max-version per key
    inc = inc.take(pa.array(np.sort(pick)))
    keys = inc[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
    vers = inc[version_col].to_numpy(zero_copy_only=False).astype(np.float64)

    # stored LIVE versions of the incoming keys (tombstoned docs don't block)
    gens = _tombstone_gens(index_dir, manifest)
    wanted = np.sort(keys)
    stored: dict[int, float] = {}
    ddir = os.path.join(index_dir, "docs")
    if os.path.isdir(ddir):
        t = pq.read_table(ddir, columns=["doc_id", f"dv_{version_col}", "shard"])
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = np.zeros(len(ids), dtype=bool)
        if len(ids):
            idx = np.minimum(np.searchsorted(wanted, ids), len(wanted) - 1)
            m = wanted[idx] == ids
        if gens and m.any():
            sh = t["shard"].to_numpy(zero_copy_only=False).astype(np.int64)
            m &= ~_dead_mask(ids, sh, gens)
        sv = t[f"dv_{version_col}"].to_numpy(zero_copy_only=False)[m]
        for k, v in zip(ids[m].tolist(), sv.tolist()):
            stored[k] = max(stored.get(k, float("-inf")), float(v))

    win = np.array([
        k not in stored or v > stored[k] for k, v in zip(keys.tolist(), vers.tolist())
    ], dtype=bool)
    if not win.any():
        return manifest
    winners = inc.filter(pa.array(win))

    upd_dir = os.path.join(index_dir, "updates")
    os.makedirs(upd_dir, exist_ok=True)
    upd_path = os.path.join(
        upd_dir, f"upd_{manifest['generation']}_{crc32(str(sorted(new_paths)).encode()):08x}.parquet")
    pq.write_table(winners, upd_path)
    delete_by_ids(index_dir, winners[key_col].to_numpy(zero_copy_only=False))
    return append_index(index_dir, upd_path, key_col=key_col, text_col=text_col)


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
        from .build import corpus_read_columns

        cols = corpus_read_columns(cfg, key_col, text_col)
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
    from functools import partial

    merged = ray.data.read_parquet(expand_parquet_dirs(postings_in)).groupby(
        ["shard", "bucket", "sub"], num_partitions=max(16, 2 * ncpu)
    ).map_groups(
        # appended generations keep the per-field postings formats the
        # manifest recorded (PerField SPI; same helper as every other
        # merge path)
        partial(encode_merge_group,
                field_formats=_shard_formats(index_dir)),
        batch_format="pyarrow")
    merged.write_parquet(os.path.join(index_dir, "postings"), partition_cols=["shard"])
    dvf = tuple(cfg.docvalues_fields or ())
    sdvf = tuple(cfg.string_docvalues_fields or ())
    ssdvf = tuple(cfg.sorted_set_docvalues_fields or ())
    sndvf = tuple(getattr(cfg, "sorted_numeric_docvalues_fields", ()) or ())
    bdvf = tuple(getattr(cfg, "binary_docvalues_fields", ()) or ())
    dds = ray.data.read_parquet(expand_parquet_dirs(docs_in)).map_batches(
        lambda t: docs_explode(t, dvf, sdvf, ssdvf, sndvf, bdvf),
        batch_format="pyarrow")
    dds.write_parquet(os.path.join(index_dir, "docs"), partition_cols=["shard"])
    if getattr(cfg, "points_fields", ()):
        from .points import build_points

        build_points(index_dir,
                     range(shard_offset, shard_offset + cfg.num_shards),
                     cfg.points_fields)

    from ray.data.aggregate import Count, Sum

    delta = ray.data.read_parquet(expand_parquet_dirs(docs_in)).map_batches(
        lambda t: docs_explode(t, dvf, sdvf, ssdvf, sndvf, bdvf),
        batch_format="pyarrow"
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
    if not cfg.retain_stage1:
        import shutil as _shutil

        for d in new_chunk_dirs:
            _shutil.rmtree(d, ignore_errors=True)
    return manifest


def add_indexes(dst_index_dir: str, src_index_dir: str) -> dict:
    """IndexWriter.addIndexes (index/IndexWriter.java:2750): import another
    committed index's ENCODED segments as new generations.

    Doc ids are global keys and the postings encoding is shard-independent,
    so the import is a pure shard-relabel (shard id += destination offset —
    the docID-rebase analog): no decode, no re-encode, no shuffle. The
    reference likewise copies codec-level structures when formats match
    (SegmentMerger's bulk-merge path). Doc keys must be disjoint (same
    append-only contract as append_index); the source must have no pending
    deletes (its tombstone scoping is meaningless in the destination —
    force_merge it first)."""
    import pyarrow as pa

    dst = load_manifest(dst_index_dir)
    src = load_manifest(src_index_dir)
    if not (dst and dst.get("committed") and src and src.get("committed")):
        raise ValueError("add_indexes requires two committed indexes")
    if src.get("deletes"):
        raise ValueError(
            "source index has pending deletes; force_merge it before import")
    dcfg = IndexBuildConfig(**dst["config"])
    scfg = IndexBuildConfig(**src["config"])
    if tuple(dcfg.docvalues_fields or ()) != tuple(scfg.docvalues_fields or ()):
        raise ValueError("add_indexes requires matching docvalues_fields")
    offset = dst.get("next_shard_offset", dst["num_shards"])
    src_ids = src.get("shard_ids") or list(range(src["num_shards"]))

    for table in ("postings", "docs"):
        for s in src_ids:
            d = os.path.join(src_index_dir, table, f"shard={s}")
            files = expand_parquet_dirs([d]) if os.path.isdir(d) else []
            if not files:
                continue

            def relabel(t: pa.Table, _s=s) -> pa.Table:
                # hive partitioning dropped the shard column on read; append
                # the destination id (partition_cols restores it on write)
                if "shard" in t.column_names:
                    t = t.drop_columns(["shard"])
                return t.append_column(
                    "shard", pa.array(np.full(len(t), offset + _s, np.int32)))

            ray.data.read_parquet(files).map_batches(
                relabel, batch_format="pyarrow"
            ).write_parquet(os.path.join(dst_index_dir, table),
                            partition_cols=["shard"])

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


def real_time_get(index_dir: str, keys) -> "pa.Table":
    """RealTimeGetComponent role (solr/core/.../handler/component/
    RealTimeGetComponent.java:88): fetch docs by unique key against the
    NEWEST committed state — update-by-key appends a fresh generation and
    tombstones the pre-update shards, so the newest generation's copy wins
    and tombstoned keys return nothing.

    The read is O(keys), never a scan: each key routes to shard
    (key % K) + generation offset, and only those shard files are read,
    with a parquet id filter pushed down. Returns (doc_id, doclen, shard)
    sorted by doc_id."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from .build import IndexBuildConfig, load_manifest

    manifest = load_manifest(index_dir)
    if not manifest or not manifest.get("committed"):
        raise ValueError("real_time_get requires a committed index")
    K = IndexBuildConfig(**manifest["config"]).num_shards
    offsets = _gen_offsets(manifest, K)
    gens = _tombstone_gens(index_dir, manifest) if manifest.get("deletes") \
        else []
    keys = np.unique(np.asarray(list(keys), dtype=np.int64))
    found: dict = {}
    # newest generation first: its copy wins
    for off in sorted(offsets, reverse=True):
        rest = np.asarray([k for k in keys if k not in found],
                          dtype=np.int64)
        if not len(rest):
            break
        for sub in np.unique(rest % K):
            shard = int(off + sub)
            d = os.path.join(index_dir, "docs", f"shard={shard}")
            if not os.path.isdir(d):
                continue
            ks = rest[rest % K == sub]
            t = pq.read_table(d, columns=["doc_id", "doclen"],
                              filters=[("doc_id", "in", ks.tolist())])
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            if not len(ids):
                continue
            dead = _dead_mask(ids, np.full(len(ids), shard), gens) \
                if gens else np.zeros(len(ids), dtype=bool)
            dls = t["doclen"].to_numpy(zero_copy_only=False)
            for i in range(len(ids)):
                k = int(ids[i])
                if k not in found:
                    # dead here = masked copy OR deleted key; either way
                    # this (newest) generation decides: masked-dead means
                    # the key was deleted after this generation wrote it
                    found[k] = None if dead[i] else (int(dls[i]), shard)
    rows = sorted((k, v[0], v[1]) for k, v in found.items()
                  if v is not None)
    return pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "doclen": pa.array([r[1] for r in rows], pa.int32()),
        "shard": pa.array([r[2] for r in rows], pa.int32()),
    })


# ---------------------------------------------------------------------------
# Encoded-segments merge. The reference merges codec-level structures, not
# raw tokens (index/SegmentMerger.java:97-162): here the committed postings
# and docs tables merge directly — decode, purge tombstones, k-way sort,
# re-encode — so stage-1 is a BUILD-TIME checkpoint only and is
# garbage-collected after commit (no 2x permanent storage, no full-corpus
# re-tokenize shuffle per forceMerge).
# ---------------------------------------------------------------------------

_NORM_CACHE: dict = {}
_FMT_CACHE: dict = {}


def _shard_formats(index_dir: str) -> dict | None:
    """field -> postings format map from the index manifest (PerField SPI);
    cached per worker so re-encoding merges keep the per-field choice.
    Keyed on the manifest file's (mtime, size) signature, not the path
    alone: an index REBUILT at the same path with different formats in a
    long-lived worker must not re-encode merges with the stale map."""
    mpath = os.path.join(index_dir, "manifest.json")
    try:
        st = os.stat(mpath)
        sig = (st.st_mtime_ns, st.st_size)
    except OSError:
        sig = None
    hit = _FMT_CACHE.get(index_dir)
    if hit is None or hit[0] != sig:
        from .build import load_manifest

        m = load_manifest(index_dir) or {}
        ff = dict(map(tuple, (m.get("config") or {}).get(
            "field_postings_formats") or ()))
        _FMT_CACHE[index_dir] = (sig, ff or None)
    return _FMT_CACHE[index_dir][1]


def _shard_norms(index_dir: str, shard: int):
    """(sorted doc_ids, norm bytes) of one source shard, cached per worker
    process. Keyed by the shard files' signature: shard ids are never reused
    by maintenance ops, but a rebuilt test index may reuse them."""
    import glob

    import pyarrow.parquet as pq

    d = os.path.join(index_dir, "docs", f"shard={shard}")
    files = sorted(glob.glob(os.path.join(d, "*.parquet")))
    sig = tuple((f, os.path.getmtime(f), os.path.getsize(f)) for f in files)
    key = (index_dir, shard)
    hit = _NORM_CACHE.get(key)
    if hit and hit[0] == sig:
        return hit[1], hit[2]
    if not files:
        ids = np.zeros(0, np.int64)
        nm = np.zeros(0, np.uint8)
    else:
        t = pq.read_table(files, columns=["doc_id", "norm"])
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        nm = t["norm"].to_numpy(zero_copy_only=False).astype(np.uint8)
        o = np.argsort(ids, kind="stable")
        ids, nm = ids[o], nm[o]
    if len(_NORM_CACHE) > 64:
        _NORM_CACHE.clear()
    _NORM_CACHE[key] = (sig, ids, nm)
    return ids, nm


def _decode_encoded_rows(t):
    """Decode encoded postings rows -> row-contiguous flat arrays.

    Returns (row_terms object[], dfs int64[], flat_docs int64[], flat_freqs
    int32[], flat_pos int32[]|None). Short rows (df < 128) decode in ONE
    vectorized varint pass; long rows loop (few, inner work vectorized) —
    symmetric with encode_postings_group."""
    from ..util.packing import decode_blocks, varint_decode_all

    dfs = t["df"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = int(dfs.sum())
    flat_docs = np.empty(n, np.int64)
    flat_freqs = np.empty(n, np.int32)
    seg = np.concatenate([[0], np.cumsum(dfs)]).astype(np.int64)
    sb = t["short_bin"].to_pylist()
    is_short = np.asarray([b is not None for b in sb], dtype=bool)
    short_rows = np.flatnonzero(is_short)
    if len(short_rows):
        joined = b"".join(sb[int(i)] for i in short_rows)
        lens_s = dfs[short_rows]
        total_s = int(lens_s.sum())
        vals = varint_decode_all(np.frombuffer(joined, np.uint8), 2 * total_s)
        gaps = vals[0::2].astype(np.int64)
        fr = vals[1::2].astype(np.int32)
        ends_s = np.cumsum(lens_s)
        starts_s = ends_s - lens_s
        c = np.cumsum(gaps)
        base = (c - gaps)[starts_s]           # running sum before each run
        docs_s = c - np.repeat(base, lens_s)
        idx = np.repeat(seg[short_rows] - starts_s, lens_s) + np.arange(total_s)
        flat_docs[idx] = docs_s
        flat_freqs[idx] = fr
    long_rows = np.flatnonzero(~is_short)
    if len(long_rows):
        db = t["docs_bin"].to_pylist()
        fb = t["freqs_bin"].to_pylist()
        for r in long_rows:
            r = int(r)
            g = decode_blocks(db[r], int(dfs[r])).astype(np.int64)
            flat_docs[seg[r]:seg[r + 1]] = np.cumsum(g)
            flat_freqs[seg[r]:seg[r + 1]] = decode_blocks(fb[r], int(dfs[r])).astype(np.int32)
    row_terms = np.asarray(t["term"].to_pylist(), dtype=object)
    flat_pos = None
    if "positions" in t.column_names:
        pl = t["positions"].combine_chunks()
        if len(pl) and pl.null_count == 0:
            flat_pos = pl.values.to_numpy(zero_copy_only=False).astype(np.int32)
    flat_off = None
    if "offsets" in t.column_names:
        ol = t["offsets"].combine_chunks()
        if len(ol) and ol.null_count == 0:
            flat_off = ol.values.to_numpy(zero_copy_only=False).astype(np.int64)
    return row_terms, dfs, flat_docs, flat_freqs, flat_pos, flat_off


def _merge_encoded_group(group, index_dir: str, gens):
    """map_groups fn: merge one (gshard, bucket) group of encoded rows from
    several source shards into freshly-encoded rows for the target shard.
    Tombstoned docs (source-shard scoped) are physically dropped; per-posting
    norms re-read from the SOURCE docs tables (pruned per-shard column read,
    cached per worker)."""
    from .build import merge_flat_and_encode
    from .postings import POSTINGS_SCHEMA

    if group.num_rows == 0:
        return POSTINGS_SCHEMA.empty_table()
    gshard = int(group["gshard"][0].as_py())
    row_terms, dfs, flat_docs, flat_freqs, flat_pos, flat_off = (
        _decode_encoded_rows(group))
    src = group["src_shard"].to_numpy(zero_copy_only=False).astype(np.int64)
    shard_rep = np.repeat(src, dfs)
    if gens and len(flat_docs):
        dead = _dead_mask(flat_docs, shard_rep, gens)
        if dead.any():
            keep = ~dead
            if flat_pos is not None:
                occ_keep = np.repeat(keep, flat_freqs)
                flat_pos = flat_pos[occ_keep]
                if flat_off is not None:
                    flat_off = flat_off[occ_keep]
            seg_starts = (np.cumsum(dfs) - dfs).astype(np.int64)
            dfs = np.add.reduceat(keep.astype(np.int64), seg_starts)
            flat_docs = flat_docs[keep]
            flat_freqs = flat_freqs[keep]
            shard_rep = shard_rep[keep]
    if not len(flat_docs):
        return POSTINGS_SCHEMA.empty_table()
    flat_norms = np.empty(len(flat_docs), np.uint8)
    for s in np.unique(src):
        ids, nm = _shard_norms(index_dir, int(s))
        m = shard_rep == s
        if m.any():
            flat_norms[m] = nm[np.searchsorted(ids, flat_docs[m])]
    return merge_flat_and_encode(
        row_terms, dfs, flat_docs, flat_freqs, flat_norms, flat_pos, gshard,
        flat_off=flat_off, field_formats=_shard_formats(index_dir),
    )


def _purge_rows(t, index_dir: str, gens, src_shard: int, gshard: int):
    """Shuffle-free purge of one postings batch (single-source merge case:
    the target shard has exactly ONE source shard, so no k-way term merge
    is needed). Rows containing no tombstoned doc pass through BYTE-
    IDENTICAL (only the shard label changes — the reference likewise
    bulk-copies unaffected codec data on merge, SegmentMerger.java:97);
    rows touching a dead doc are decoded, masked and re-encoded. At web
    dup/delete rates a tiny fraction of terms touch deleted docs, so this
    replaces an all-to-all shuffle + full re-encode with a linear scan."""
    import pyarrow as pa

    from .build import merge_flat_and_encode
    from .postings import POSTINGS_SCHEMA

    cols = POSTINGS_SCHEMA.names
    if "shard" in t.column_names:
        t = t.drop_columns(["shard"])
    if "offsets" not in t.column_names:   # pre-offsets segment layout
        t = t.append_column(
            "offsets", pa.array([None] * len(t), pa.large_list(pa.int64())))
    if t.num_rows == 0:
        return POSTINGS_SCHEMA.empty_table()

    def _relabel(tbl: "pa.Table") -> "pa.Table":
        tbl = tbl.append_column(
            "shard", pa.array(np.full(len(tbl), gshard, np.int32)))
        return tbl.select(cols).cast(POSTINGS_SCHEMA)

    gens = [(ids, ms) for ids, ms in gens if len(ids) and src_shard < ms]
    if not gens:
        return _relabel(t)

    row_terms, dfs, flat_docs, flat_freqs, flat_pos, flat_off = (
        _decode_encoded_rows(t))
    shard_rep = np.full(len(flat_docs), src_shard, np.int64)
    dead = _dead_mask(flat_docs, shard_rep, gens)
    if not dead.any():
        return _relabel(t)
    seg_starts = (np.cumsum(dfs) - dfs).astype(np.int64)
    row_hit = np.add.reduceat(dead, seg_starts) > 0
    post_hit = np.repeat(row_hit, dfs)

    out = []
    if (~row_hit).any():
        out.append(_relabel(t.filter(pa.array(~row_hit))))

    m = post_hit & ~dead                   # surviving postings of hit rows
    if m.any():
        sub_pos = None
        sub_off = None
        if flat_pos is not None:
            occ_m = np.repeat(m, flat_freqs)
            sub_pos = flat_pos[occ_m]
            if flat_off is not None:
                sub_off = flat_off[occ_m]
        sub_docs = flat_docs[m]
        sub_freqs = flat_freqs[m]
        sub_lens = np.add.reduceat(
            m.astype(np.int64), seg_starts)[row_hit]
        sub_terms = row_terms[row_hit]
        keep_run = sub_lens > 0            # rows whose postings all died
        if not keep_run.all():
            # positions were already filtered posting-wise above
            sub_terms = sub_terms[keep_run]
            sub_lens = sub_lens[keep_run]
        ids, nm = _shard_norms(index_dir, src_shard)
        sub_norms = nm[np.searchsorted(ids, sub_docs)]
        out.append(merge_flat_and_encode(
            sub_terms, sub_lens, sub_docs, sub_freqs, sub_norms, sub_pos,
            gshard, flat_off=sub_off,
            field_formats=_shard_formats(index_dir),
        ).select(cols).cast(POSTINGS_SCHEMA))
    if not out:
        return POSTINGS_SCHEMA.empty_table()
    return pa.concat_tables(out) if len(out) > 1 else out[0]


def _stats_for_shards(index_dir: str, shard_ids) -> tuple[int, int]:
    """(doc_count, sum_doclen) over the given docs shard dirs (pruned read)."""
    dirs = [os.path.join(index_dir, "docs", f"shard={s}") for s in shard_ids]
    files = expand_parquet_dirs([d for d in dirs if os.path.isdir(d)])
    if not files:
        return 0, 0
    from ray.data.aggregate import Count, Sum

    row = ray.data.read_parquet(files, columns=["doclen"]).aggregate(
        Count(), Sum("doclen", alias_name="sum_dl"))
    return int(row["count()"]), int(row["sum_dl"] or 0)


def _merge_encoded(index_dir: str, manifest: dict, merged_ids: list[int],
                   new_off: int) -> None:
    """Merge the given shards' encoded postings + docs into K new shards
    [new_off, new_off + K). Writes ONLY new shard partitions; the caller
    commits the manifest and then GCs the source dirs, so a crash at any
    point leaves a readable index (old manifest -> old shards, all present).

    Partitioning: groupby (gshard, bucket=crc32(term) %% num_buckets) — a
    term's full merged postings re-encode in one task (the reference's
    merge is likewise serial per term). Skew lever at scale: num_buckets.
    Tombstone id arrays are ray.put ONCE and read from the object store in
    every task (zero-copy numpy, no per-task closure serialization — at
    web delete rates the arrays are O(deleted docs))."""
    import shutil as _shutil

    import pyarrow as pa
    import ray as _ray

    from .build import term_bucket

    cfg = IndexBuildConfig(**manifest["config"])
    K = cfg.num_shards
    # Retry safety: target ids [new_off, new_off+K) are only ever published
    # by THIS merge's manifest commit, so any existing dir with those ids is
    # debris from a crashed prior attempt. Clear it first — parquet writes
    # APPEND into existing partition dirs, and a retry would otherwise
    # publish doubled postings/docs under the same shard ids.
    for kind in ("postings", "docs", "points"):
        for s in range(new_off, new_off + K):
            _shutil.rmtree(os.path.join(index_dir, kind, f"shard={s}"),
                           ignore_errors=True)
    nb = max(4, cfg.num_buckets)
    gens = _tombstone_gens(index_dir, manifest)
    gens_ref = _ray.put(gens) if gens else None
    ncpu = int(_ray.cluster_resources().get("CPU", 4))

    post_cols = ["term", "df", "short_bin", "docs_bin", "freqs_bin"]
    if cfg.store_positions:
        post_cols.append("positions")
    if getattr(cfg, "store_offsets", False) or getattr(cfg, "payload_delimiter", None):
        post_cols.append("offsets")

    # Single-source fast path: every target shard has exactly one source
    # (purging/relabelling one generation, the forceMerge-after-delete case).
    # No k-way term merge is needed, so skip the all-to-all groupby: scan
    # each shard once, pass untouched rows through byte-identical, re-encode
    # only rows containing tombstoned docs (_purge_rows).
    if len({s % K for s in merged_ids}) == len(merged_ids):
        files = expand_parquet_dirs(
            [d for s in merged_ids
             if os.path.isdir(d := os.path.join(index_dir, "postings",
                                                f"shard={s}"))])
        if files:
            # ONE dataset over every source file (the hive shard column is
            # inferred from the paths) — a per-shard union of datasets costs
            # an execution each and dominates small merges
            def purge(t: "pa.Table") -> "pa.Table":
                import ray as _r

                from .postings import POSTINGS_SCHEMA

                g = _r.get(gens_ref) if gens_ref is not None else []
                sh = t["shard"].to_numpy(zero_copy_only=False)
                outs = [
                    _purge_rows(t.filter(pa.array(sh == s)), index_dir, g,
                                int(s), new_off + int(s) % K)
                    for s in np.unique(sh)
                ]
                outs = [o for o in outs if o.num_rows]
                if not outs:
                    return POSTINGS_SCHEMA.empty_table()
                return pa.concat_tables(outs) if len(outs) > 1 else outs[0]

            ray.data.read_parquet(files).map_batches(
                purge, batch_format="pyarrow",
            ).write_parquet(os.path.join(index_dir, "postings"),
                            partition_cols=["shard"])
        _merge_docs_tables(index_dir, merged_ids, new_off, gens_ref, K)
        _rebuild_points(index_dir, cfg, merged_ids, new_off, K)
        return

    files = expand_parquet_dirs(
        [d for s in merged_ids
         if os.path.isdir(d := os.path.join(index_dir, "postings",
                                            f"shard={s}"))])
    if files:
        def label(t: "pa.Table") -> "pa.Table":
            sh = t["shard"].to_numpy(zero_copy_only=False).astype(np.int64)
            terms = np.asarray(t["term"].to_pylist(), dtype=object)
            t = t.drop_columns(["shard"])
            return (
                t.append_column("src_shard", pa.array(sh.astype(np.int32)))
                 .append_column("gshard", pa.array(
                     (new_off + sh % K).astype(np.int32)))
                 .append_column("bucket", pa.array(term_bucket(terms, nb)))
            )

        # one dataset over all sources (shard from the hive column, one
        # execution) feeding the merge shuffle
        merged = ray.data.read_parquet(
            files, columns=post_cols + ["shard"],
        ).map_batches(label, batch_format="pyarrow").groupby(
            ["gshard", "bucket"], num_partitions=max(16, 2 * ncpu)
        ).map_groups(
            lambda g: _merge_encoded_group(
                g, index_dir,
                __import__("ray").get(gens_ref) if gens_ref is not None
                else []),
            batch_format="pyarrow",
        )
        merged.write_parquet(os.path.join(index_dir, "postings"),
                             partition_cols=["shard"])

    _merge_docs_tables(index_dir, merged_ids, new_off, gens_ref, K)
    _rebuild_points(index_dir, cfg, merged_ids, new_off, K)


def _rebuild_points(index_dir: str, cfg: IndexBuildConfig, merged_ids,
                    new_off: int, K: int) -> None:
    """Points leaves for the merged shards (SegmentMerger re-sorts BKD per
    new segment): rebuilt from the just-written merged docs tables."""
    if not getattr(cfg, "points_fields", ()):
        return
    from .points import build_points

    build_points(index_dir, sorted({new_off + s % K for s in merged_ids}),
                 cfg.points_fields)


def _merge_docs_tables(index_dir: str, merged_ids, new_off: int,
                       gens_ref, K: int) -> None:
    """docs tables: relabel + purge, NO re-encode (plain per-doc rows).
    One dataset over all source files — the shard of each row comes from
    the inferred hive partition column. `gens_ref` is a ray.put ObjectRef
    of the tombstone generations (or None), read zero-copy per task."""
    import pyarrow as pa

    files = expand_parquet_dirs(
        [d for s in merged_ids
         if os.path.isdir(d := os.path.join(index_dir, "docs", f"shard={s}"))])
    if not files:
        return

    def relabel(t: "pa.Table") -> "pa.Table":
        import ray as _r

        gens = _r.get(gens_ref) if gens_ref is not None else []
        sh = t["shard"].to_numpy(zero_copy_only=False).astype(np.int64)
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        if gens:
            dead = _dead_mask(ids, sh, gens)
            if dead.any():
                keep = ~dead
                t = t.filter(pa.array(keep))
                sh = sh[keep]
        t = t.drop_columns(["shard"])
        return t.append_column(
            "shard", pa.array((new_off + sh % K).astype(np.int32)))

    ray.data.read_parquet(files).map_batches(
        relabel, batch_format="pyarrow",
    ).write_parquet(os.path.join(index_dir, "docs"), partition_cols=["shard"])


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
    generations are physically dropped on the way.

    Operates on the ENCODED segment tables (never stage-1). Commit order is
    crash-safe: new shard partitions are written first, the manifest flips
    to them, and only then are the source dirs GC'd — a crash at any point
    leaves a manifest whose shards all exist."""
    import shutil

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

    _merge_encoded(index_dir, manifest, merged_ids, new_off)

    new_ids = sorted(
        [i for i in shard_ids if i not in set(merged_ids)]
        + list(range(new_off, new_off + K))
    )
    doc_count, sum_dl = _stats_for_shards(index_dir, new_ids)
    manifest["shard_ids"] = new_ids
    manifest["next_shard_offset"] = new_off + K
    manifest["num_shards"] = len(new_ids)
    manifest["stats"] = {"doc_count": doc_count, "sum_total_term_freq": sum_dl}
    manifest["generation"] = int(time.time() * 1000)
    _atomic_write_json(os.path.join(index_dir, "manifest.json"), manifest)

    # GC LAST: the committed manifest no longer references these dirs
    for s in merged_ids:
        shutil.rmtree(os.path.join(index_dir, "postings", f"shard={s}"),
                      ignore_errors=True)
        shutil.rmtree(os.path.join(index_dir, "docs", f"shard={s}"),
                      ignore_errors=True)
        shutil.rmtree(os.path.join(index_dir, "points", f"shard={s}"),
                      ignore_errors=True)
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
    """Collapse ALL generations into one (forceMerge(1)), physically dropping
    tombstoned documents and clearing the tombstones (the reference's
    forceMerge purging deleted docs).

    Merges the ENCODED segment tables directly — stage-1 is never re-read
    (and is GC'd here if a pre-round-3 build left it behind). The merged
    generation gets FRESH shard ids [next_shard_offset, +K): readers are
    manifest-driven, and never reusing ids means every crash point leaves a
    readable index (old manifest -> old dirs, still present until the final
    GC)."""
    import shutil

    manifest = load_manifest(index_dir)
    if not manifest or not manifest.get("committed"):
        raise ValueError("force_merge requires a committed index")
    cfg = IndexBuildConfig(**manifest["config"])
    K = cfg.num_shards
    shard_ids = manifest.get("shard_ids") or list(range(manifest["num_shards"]))
    if not manifest.get("deletes") and len(shard_ids) == K:
        return manifest  # single generation, nothing to purge — no-op

    new_off = manifest.get("next_shard_offset", manifest["num_shards"])
    _merge_encoded(index_dir, manifest, shard_ids, new_off)

    new_ids = list(range(new_off, new_off + K))
    doc_count, sum_dl = _stats_for_shards(index_dir, new_ids)
    delete_files = [d["file"] for d in manifest.get("deletes") or []]
    manifest["stats"] = {"doc_count": doc_count, "sum_total_term_freq": sum_dl}
    manifest["deletes"] = []
    manifest["num_shards"] = K
    manifest["shard_ids"] = new_ids
    manifest["next_shard_offset"] = new_off + K
    manifest["generation"] = int(time.time() * 1000)
    _atomic_write_json(os.path.join(index_dir, "manifest.json"), manifest)

    # GC LAST (crash-safe: committed manifest references only new dirs)
    for s in shard_ids:
        shutil.rmtree(os.path.join(index_dir, "postings", f"shard={s}"),
                      ignore_errors=True)
        shutil.rmtree(os.path.join(index_dir, "docs", f"shard={s}"),
                      ignore_errors=True)
        shutil.rmtree(os.path.join(index_dir, "points", f"shard={s}"),
                      ignore_errors=True)
    for f in delete_files:
        try:
            os.remove(os.path.join(index_dir, f))
        except OSError:
            pass
    shutil.rmtree(os.path.join(index_dir, "stage1"), ignore_errors=True)
    return manifest


def split_index(index_dir: str, out_dirs: list[str], route) -> list[dict]:
    """SolrIndexSplitter / MultiPassIndexSplitter role
    (solr/update/SolrIndexSplitter.java:80, lucene/misc
    MultiPassIndexSplitter.java:44): split a committed index into
    len(out_dirs) self-contained indexes by a doc route.

    route: vectorized callable doc_id array -> target part index in
    [0, len(out_dirs)) — the Solr hash-route / docID-range predicate.

    Mechanism is the reference's own (MultiPassIndexSplitter "deletes" the
    complement in each pass, then the merge purges): each part gets the
    committed segment FILES (hardlinks where possible — the replicator's
    copy), tombstones for every doc routed elsewhere, and a force_merge
    that physically drops them via the encoded-segment path. Each output
    is a normal committed index; the input is left untouched.
    """
    import numpy as np
    import pyarrow.parquet as pq

    manifest = load_manifest(index_dir)
    if not manifest or not manifest.get("committed"):
        raise ValueError("split_index requires a committed index")
    n_parts = len(out_dirs)

    # route every live doc once (pruned read: just the doc_id column)
    shard_ids = manifest.get("shard_ids") or list(range(manifest["num_shards"]))
    all_ids = []
    for s in shard_ids:
        d = os.path.join(index_dir, "docs", f"shard={s}")
        if os.path.isdir(d):
            all_ids.append(pq.read_table(d, columns=["doc_id"])["doc_id"]
                           .to_numpy(zero_copy_only=False))
    # tombstoned copies need no special casing: every part inherits the
    # source's tombstone files via the revision pull, so a dead (or
    # superseded-by-update) copy stays masked wherever it lands, and the
    # live copy is dropped exactly in the parts it isn't routed to
    ids = np.concatenate(all_ids) if all_ids else np.zeros(0, np.int64)
    part_of = np.asarray(route(ids), dtype=np.int64)
    if len(part_of) and (part_of.min() < 0 or part_of.max() >= n_parts):
        raise ValueError("route returned a part index out of range")

    from .replicator import pull_revision, publish_revision

    publish_revision(index_dir)
    out_manifests = []
    for p, out in enumerate(out_dirs):
        pull_revision(index_dir, out)
        drop = ids[part_of != p]
        if len(drop):
            delete_by_ids(out, drop)
        out_manifests.append(force_merge(out))
    return out_manifests




def merge_atomic_ops(docs: "pa.Table", ops: dict, key_col: str = "doc_id"):
    """AtomicUpdateDocumentMerger semantics (solr/core/.../update/processor/
    AtomicUpdateDocumentMerger.java:59): per key, a dict of field -> op
    modifiers applied over the CURRENT stored document:

      {"set": v}        replace (set to None deletes the field value)
      {"inc": n}        numeric increment
      {"add": v|[v...]} append to a list field (scalar fields promote)
      {"remove": v|[v]} remove matching values from a list field
      {"removeregex": pat} remove list values matching the regex

    Returns the merged table, same schema (list columns stay lists).
    """
    import re as _re

    import numpy as np
    import pyarrow as pa

    keys = docs[key_col].to_pylist()
    cols = {c: docs[c].to_pylist() for c in docs.column_names}
    for i, k in enumerate(keys):
        doc_ops = ops.get(k)
        if not doc_ops:
            continue
        for fld, mod in doc_ops.items():
            if fld not in cols:
                raise KeyError(f"unknown field {fld!r}")
            cur = cols[fld][i]
            if not isinstance(mod, dict):
                mod = {"set": mod}  # bare value == set (Solr shorthand)
            for op, v in mod.items():
                if op == "set":
                    cur = v
                elif op == "inc":
                    cur = (cur or 0) + v
                elif op == "add":
                    base = (list(cur) if isinstance(cur, list)
                            else ([] if cur is None else [cur]))
                    cur = base + (v if isinstance(v, list) else [v])
                elif op == "remove":
                    drop = set(v if isinstance(v, list) else [v])
                    base = cur if isinstance(cur, list) else [cur]
                    cur = [x for x in base if x not in drop]
                elif op == "removeregex":
                    pat = _re.compile(v)
                    base = cur if isinstance(cur, list) else [cur]
                    cur = [x for x in base
                           if not pat.fullmatch(str(x))]
                else:
                    raise ValueError(f"unknown atomic op {op!r}")
            cols[fld][i] = cur
    return pa.table({c: pa.array(cols[c], docs.schema.field(c).type)
                     for c in docs.column_names})


def atomic_update(index_dir: str, source_paths, ops: dict,
                  key_col: str = "doc_id", text_col: str = "text") -> dict:
    """Atomic (partial) document update: fetch the CURRENT stored docs for
    the keys in `ops` (id-filter pushdown against source_paths — the
    stored-fields store; chain updates by passing the previous update's
    written source), apply the field modifiers, and run the standard
    update-by-key (tombstone + fresh generation reindex). Keys already
    deleted from the index are skipped, as Solr's RTG-based merge does.

    Returns {'updated': n, 'skipped_deleted': m, 'source': new_parquet}.
    """
    import os

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.dataset as pds
    import pyarrow.parquet as pq

    keys = sorted(ops)
    live = set(real_time_get(index_dir, keys)[key_col].to_pylist())
    todo = [k for k in keys if k in live]
    if not todo:
        return {"updated": 0, "skipped_deleted": len(keys), "source": None}
    if isinstance(source_paths, str):
        source_paths = [source_paths]
    cur = pds.dataset(source_paths).to_table(
        filter=pc.field(key_col).isin(todo))
    if cur.num_rows != len(todo):
        missing = set(todo) - set(cur[key_col].to_pylist())
        raise ValueError(f"stored fields missing for keys {sorted(missing)[:5]}")
    merged = merge_atomic_ops(cur, ops, key_col=key_col)
    # deterministic per-key-set name so a retried update overwrites its
    # own source rather than piling up
    import hashlib as _hl

    tag = _hl.md5(repr(todo).encode()).hexdigest()[:8]
    out = os.path.join(index_dir, f"atomic_src_{tag}.parquet")
    pq.write_table(merged, out)
    update_documents(index_dir, [out], key_col=key_col, text_col=text_col)
    return {"updated": len(todo), "skipped_deleted": len(keys) - len(todo),
            "source": out}
