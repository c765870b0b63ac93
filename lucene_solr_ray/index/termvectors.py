"""Term vectors: per-document term -> freq sidecar
(codecs/lucene50/Lucene50TermVectorsFormat.java:31 role; enabled per field
by FieldType.setStoreTermVectors, document/FieldType.java:32).

In the reference term vectors are a per-doc forward index written beside
the postings and never k-way merged — the Ray-native equivalent is an
independent parquet table `tv/shard=N` with rows (doc_id, term, freq),
hash-partitioned by the same doc->shard rule as the docs table. Build is
one distributed tokenize pass (vectorized factorize + run-length, no
shuffle: rows are already per-doc); lookup is a pruned parquet read.

Consumers: MoreLikeThis without corpus access (the reference's
MoreLikeThis.java:710 retrieveTerms(docNum) reads term vectors first and
re-analyzes only as a fallback), and CheckIndex-style tf cross-checks.
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

TV_SCHEMA = pa.schema([
    ("doc_id", pa.int64()),
    ("term", pa.large_string()),
    ("freq", pa.int32()),
])

# FieldType.setStoreTermVectorPositions/Offsets (document/FieldType.java:32):
# per-(doc, term) occurrence positions + packed (start<<32)|end char
# offsets — the data FastVectorHighlighter reads
TV_SCHEMA_PO = TV_SCHEMA.append(
    pa.field("positions", pa.large_list(pa.int32()))
).append(pa.field("offsets", pa.large_list(pa.int64())))


class _TvTokenizer:
    """map_batches fn: (doc_id, term, freq[, positions, offsets]) rows per
    batch, shard column for partitioned write."""

    def __init__(self, key_col: str, text_col: str, num_shards: int,
                 stopwords: tuple = (), with_positions_offsets: bool = False):
        self.key_col = key_col
        self.text_col = text_col
        self.num_shards = num_shards
        self.stop = frozenset(stopwords) if stopwords else None
        self.po = with_positions_offsets

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..analysis.analyzers import (analyze_fast, standard_analyzer,
                                          standard_analyzer_offsets)

        keys = batch[self.key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = batch[self.text_col].to_pylist()
        toks: list[str] = []
        lens = np.zeros(len(texts), dtype=np.int64)
        pos_flat: list[int] = []
        off_flat: list[int] = []
        for i, t in enumerate(texts):
            if self.po:
                terms, poss, ss, ee = standard_analyzer_offsets(
                    t or "", self.stop)
                pos_flat.extend(poss)
                off_flat.extend((s << 32) | e for s, e in zip(ss, ee))
            else:
                terms = analyze_fast(t or "") if self.stop is None else None
                if terms is None:
                    terms, _ = standard_analyzer(t or "", self.stop)
            toks.extend(terms)
            lens[i] = len(terms)
        schema = TV_SCHEMA_PO if self.po else TV_SCHEMA
        if not toks:
            return schema.empty_table().append_column(
                "shard", pa.array([], pa.int32()))
        arr = np.asarray(toks, dtype=object)
        doc_idx = np.repeat(np.arange(len(texts)), lens)
        codes, uniques = pd.factorize(arr)
        order = np.lexsort((codes, doc_idx))
        sc, sd = codes[order], doc_idx[order]
        new = np.empty(len(sc), dtype=bool)
        new[0] = True
        new[1:] = (sc[1:] != sc[:-1]) | (sd[1:] != sd[:-1])
        starts = np.flatnonzero(new)
        freq = np.diff(np.append(starts, len(sc))).astype(np.int32)
        d = keys[sd[starts]]
        u = uniques.astype(object)
        cols = {
            "doc_id": pa.array(d, pa.int64()),
            "term": pa.array(u[sc[starts]], pa.large_string()),
            "freq": pa.array(freq, pa.int32()),
        }
        if self.po:
            # lexsort is stable: within each (doc, term) run the original
            # token order survives, so positions/offsets lists stay sorted
            run_offsets = np.append(starts, len(sc)).astype(np.int64)
            p_sorted = np.asarray(pos_flat, np.int32)[order]
            o_sorted = np.asarray(off_flat, np.int64)[order]
            cols["positions"] = pa.LargeListArray.from_arrays(
                run_offsets, pa.array(p_sorted, pa.int32()))
            cols["offsets"] = pa.LargeListArray.from_arrays(
                run_offsets, pa.array(o_sorted, pa.int64()))
        cols["shard"] = pa.array((d % self.num_shards).astype(np.int32))
        return pa.table(cols)


def build_term_vectors(corpus_paths, index_dir: str, key_col: str = "doc_id",
                       text_col: str = "text", num_shards: int = 4,
                       stopwords: tuple = (),
                       with_positions_offsets: bool = False) -> str:
    """One tokenize pass -> tv/shard=N parquet partitions (no shuffle).
    with_positions_offsets stores per-occurrence positions + char offsets
    (FieldType.setStoreTermVectorPositionsAndOffsets), enabling the
    FastVectorHighlighter path."""
    import ray.data

    out = os.path.join(index_dir, "tv")
    tmp = out + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    ds = ray.data.read_parquet(corpus_paths, columns=[key_col, text_col])
    ds.map_batches(
        _TvTokenizer(key_col, text_col, num_shards, stopwords,
                     with_positions_offsets),
        batch_format="pyarrow",
    ).write_parquet(tmp, partition_cols=["shard"])
    shutil.rmtree(out, ignore_errors=True)
    os.replace(tmp, out)
    return out


def term_vector(index_dir: str, doc_id: int,
                num_shards: int | None = None) -> pa.Table:
    """One doc's term vector (pruned read of its shard partition)."""
    tv_dir = os.path.join(index_dir, "tv")
    path = tv_dir
    if num_shards is not None:
        path = os.path.join(tv_dir, f"shard={int(doc_id) % num_shards}")
    t = pq.read_table(path, filters=pc.field("doc_id") == int(doc_id),
                      columns=["doc_id", "term", "freq"])
    return t.sort_by("term")


def term_vectors_for(index_dir: str, doc_ids,
                     num_shards: int | None = None) -> pa.Table:
    """Term vectors for a set of docs (one pruned read per touched shard)."""
    ids = sorted(int(d) for d in doc_ids)
    tv_dir = os.path.join(index_dir, "tv")
    if num_shards is None:
        t = pq.read_table(tv_dir, filters=pc.field("doc_id").isin(ids),
                          columns=["doc_id", "term", "freq"])
        return t.sort_by([("doc_id", "ascending"), ("term", "ascending")])
    by_shard: dict[int, list[int]] = {}
    for d in ids:
        by_shard.setdefault(d % num_shards, []).append(d)
    parts = [
        pq.read_table(os.path.join(tv_dir, f"shard={s}"),
                      filters=pc.field("doc_id").isin(ds_),
                      columns=["doc_id", "term", "freq"])
        for s, ds_ in sorted(by_shard.items())
    ]
    t = pa.concat_tables(parts)
    return t.sort_by([("doc_id", "ascending"), ("term", "ascending")])


def term_vectors_po_for(index_dir: str, doc_ids,
                        num_shards: int | None = None
                        ) -> dict[int, dict[str, tuple]]:
    """Positions+offsets term vectors for a set of docs, as
    {doc -> {term -> (positions int32[], packed offsets int64[])}} — the
    FieldTermStack.java:49 read path feeding FastVectorHighlighter. One
    pruned read per touched shard; raises a clear error when the sidecar
    was built without with_positions_offsets."""
    ids = sorted(int(d) for d in doc_ids)
    if not ids:
        return {}
    tv_dir = os.path.join(index_dir, "tv")
    cols = ["doc_id", "term", "positions", "offsets"]
    by_shard: dict[int, list[int]] = {}
    if num_shards is None:
        by_shard[-1] = ids
    else:
        for d in ids:
            by_shard.setdefault(d % num_shards, []).append(d)
    parts = []
    for s, ds_ in sorted(by_shard.items()):
        path = tv_dir if s < 0 else os.path.join(tv_dir, f"shard={s}")
        schema_names = pq.read_schema(
            pq.ParquetDataset(path).files[0]).names
        if "positions" not in schema_names:
            raise ValueError(
                "term-vector sidecar lacks positions/offsets; rebuild with "
                "build_term_vectors(..., with_positions_offsets=True)")
        parts.append(pq.read_table(
            path, filters=pc.field("doc_id").isin(ds_), columns=cols))
    t = pa.concat_tables(parts)
    out: dict[int, dict[str, tuple]] = {}
    docs = t["doc_id"].to_numpy(zero_copy_only=False)
    terms = t["term"].to_pylist()
    poss = t["positions"].to_pylist()
    offs = t["offsets"].to_pylist()
    for d, term, p, o in zip(docs, terms, poss, offs):
        out.setdefault(int(d), {})[term] = (
            np.asarray(p, np.int64), np.asarray(o, np.int64))
    return out


def more_like_this_tv(searcher, index_dir: str, doc_id: int,
                      max_terms: int = 10, min_df: int = 2, k: int = 10):
    """MoreLikeThis off the term-vector sidecar (MoreLikeThis.java:710
    retrieveTerms(docNum)): identical term selection to the re-analyze
    path, with the doc's tf read from tv instead of the corpus."""
    from ..search.query import Bool, Term

    nshards = getattr(searcher.reader, "num_shards", None)
    tv = term_vector(index_dir, doc_id, num_shards=nshards)
    tf = dict(zip(tv["term"].to_pylist(),
                  (int(x) for x in tv["freq"].to_pylist())))
    n_docs = searcher.reader.doc_count
    scored = []
    for t, f in tf.items():
        df, _ = searcher.reader.term_stats(t)
        if df < min_df:
            continue
        idf = np.log(1 + (n_docs - df + 0.5) / (df + 0.5))
        scored.append((f * idf, t))
    # identical selection AND tie order to services.more_like_this
    scored.sort(reverse=True)
    terms = [t for _, t in scored[:max_terms]]
    if not terms:
        return None, []
    node = Bool(should=[Term(t) for t in terms], min_should=1)
    return searcher.search(node, k=k), terms
