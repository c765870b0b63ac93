"""Index readers (the reference's IndexReader / LeafReader role).

A ShardReader pins one doc-partitioned shard's term dictionary + postings
metadata in memory (the reference mmaps .tim/.tip/.doc; we hold the Arrow
postings table and binary-search the sorted term column — SURVEY.md §2.3:
term-dict-as-sorted-table is the idiomatic substitution for the FST).

Salted head terms may occupy several rows (disjoint doc sub-ranges, see
build.py); lookup returns all rows and decode concatenates them in doc order.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..util.packing import block_spans, decode_blocks
from .postings import decode_posting


def _load_shard_deletes(index_dir: str, shard: int) -> np.ndarray:
    """Sorted doc ids deleted from this shard (live-docs overlay,
    Lucene50LiveDocsFormat role). A tombstone generation applies only to
    shards that existed when it was written (max_shard) — appended
    generations may legitimately reuse a deleted doc id."""
    mpath = os.path.join(index_dir, "manifest.json")
    if not os.path.exists(mpath):
        return np.zeros(0, dtype=np.int64)
    with open(mpath) as f:
        manifest = json.load(f)
    parts = []
    for d in manifest.get("deletes") or []:
        if shard < d["max_shard"]:
            t = pq.read_table(os.path.join(index_dir, d["file"]), columns=["doc_id"])
            parts.append(t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64))
    if not parts:
        return np.zeros(0, dtype=np.int64)
    return np.unique(np.concatenate(parts))


class ShardReader:
    """One doc-shard's term dictionary + postings.

    Column residency mirrors what the reference gets from mmap: the term
    dictionary, stats, block metadata and the doc/freq binaries load
    eagerly (they serve every query); the POSITIONS and IMPACTS columns —
    the largest, needed only by phrase/span/interval queries and WAND
    bounds — load lazily on first use. A term-only workload never pays
    their RAM."""

    _LAZY_COLS = ("positions", "impacts_bin", "offsets")

    def __init__(self, index_dir: str, shard: int, cache_size: int = 256):
        self.shard = shard
        self._index_dir = index_dir
        self._cache: dict = {}          # decoded-postings LRU (LRUQueryCache role)
        self._cache_size = cache_size
        pdir = os.path.join(index_dir, "postings", f"shard={shard}")
        self._pdir = pdir
        ddir = os.path.join(index_dir, "docs", f"shard={shard}")
        self.dead = _load_shard_deletes(index_dir, shard)
        mpath = os.path.join(index_dir, "manifest.json")
        _cfgd: dict = {}
        if os.path.exists(mpath):
            with open(mpath) as f:
                _cfgd = json.load(f).get("config") or {}
        # whether the INDEX stores each payload: a null payload row on a
        # stored column is a mixed-generation gap (-1 fill keeps occurrence
        # alignment); on an unstored column it is the whole-index state
        # (empty keeps the consumers' no-payload fast path)
        self._stores_payload = {
            "positions": bool(_cfgd.get("store_positions", True)),
            "offsets": bool(_cfgd.get("store_offsets", False))
            or bool(_cfgd.get("payload_delimiter")),
        }
        self._order = None              # sort permutation for lazy columns
        self._lazy: dict[str, pa.ChunkedArray | None] = {}
        t = None
        self._file_cols: list[str] = []
        if os.path.exists(pdir):
            pfiles = sorted(f for f in os.listdir(pdir) if f.endswith(".parquet"))
            if pfiles:
                self._file_cols = pq.read_schema(
                    os.path.join(pdir, pfiles[0])).names
                eager = [c for c in self._file_cols if c not in self._LAZY_COLS]
                t = pq.read_table(pdir, columns=eager)
        if t is not None and t.num_rows:
            idx = pa.compute.sort_indices(t, sort_keys=[("term", "ascending")])
            self._order = idx
            t = t.take(idx).combine_chunks()
            self.terms = np.asarray(t["term"].to_pylist(), dtype=object)
        else:
            self.terms = np.zeros(0, dtype=object)
        self.table = t
        d = pq.read_table(ddir) if os.path.exists(ddir) else None
        self.docvalues: dict[str, np.ndarray] = {}
        # per-analyzed-field norm bytes, derived lazily from fdl_<field>
        self._field_norms: dict[str, np.ndarray] = {}
        # index-sort permutations (IndexWriterConfig.setIndexSort role),
        # keyed (field, descending); computed once per loaded shard
        self._sort_perms: dict[tuple, np.ndarray] = {}
        # SORTED string docvalues: per-field (sorted unique values, ordinal
        # per doc) — the Lucene80DocValuesFormat SORTED layout (value dict +
        # ord column); comparisons/sorts run on int ordinals, strings are
        # gathered only for output rows
        self.sorted_dv: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        # SORTED_SET docvalues: per-field (sorted unique values, flat ords,
        # per-doc offsets) — the SORTED_SET layout (shared value dict + an
        # increasing ord run per doc); set ops run on int ordinals
        self.sorted_set_dv: dict[str, tuple[np.ndarray, np.ndarray, np.ndarray]] = {}
        # SORTED_NUMERIC docvalues: per-field (flat float64 values ascending
        # within each doc, per-doc offsets) — DocValuesType.SORTED_NUMERIC
        self.sorted_numeric_dv: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        # BINARY docvalues: per-field object array of bytes (None = missing)
        # — DocValuesType.BINARY (BinaryDocValuesField.java:33)
        self.binary_dv: dict[str, np.ndarray] = {}
        if d is not None and d.num_rows:
            order = pa.compute.sort_indices(d["doc_id"])
            d = d.take(order).combine_chunks()
            self.doc_ids = d["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            self.doclens = d["doclen"].to_numpy(zero_copy_only=False).astype(np.int32)
            self.norms = d["norm"].to_numpy(zero_copy_only=False).astype(np.uint8)
            for name in d.column_names:
                if name.startswith("dv_"):
                    self.docvalues[name[3:]] = d[name].to_numpy(
                        zero_copy_only=False
                    ).astype(np.float64)
                elif name.startswith("sdv_"):
                    col = d[name]
                    if pa.types.is_dictionary(col.type):
                        col = col.cast(pa.large_string())
                    vals = np.asarray(col.to_pylist(), dtype="U")
                    u, inv = np.unique(vals, return_inverse=True)
                    self.sorted_dv[name[4:]] = (u, inv.astype(np.int32))
                elif name.startswith("bdv_"):
                    self.binary_dv[name[4:]] = np.asarray(
                        d[name].to_pylist(), dtype=object)
                elif name.startswith("sndv_"):
                    lst = d[name].combine_chunks()
                    offs = lst.offsets.to_numpy().astype(np.int64)
                    vals = lst.values.to_numpy(zero_copy_only=False).astype(
                        np.float64)
                    self.sorted_numeric_dv[name[5:]] = (vals, offs)
                elif name.startswith("ssdv_"):
                    lst = d[name].combine_chunks()
                    offs = lst.offsets.to_numpy().astype(np.int64)
                    fv = lst.values
                    if pa.types.is_dictionary(fv.type):
                        fv = fv.cast(pa.large_string())
                    flat = np.asarray(fv.to_pylist(), dtype="U")
                    u, ords = np.unique(flat, return_inverse=True)
                    self.sorted_set_dv[name[5:]] = (
                        u, ords.astype(np.int32), offs)
        else:
            self.doc_ids = np.zeros(0, dtype=np.int64)
            self.doclens = np.zeros(0, dtype=np.int32)
            self.norms = np.zeros(0, dtype=np.uint8)
        # restrict tombstones to ids actually present in this shard, and
        # precompute the live view of the docs table (the raw table stays:
        # norms/stats keep including deleted docs until forceMerge, matching
        # the reference's Terms.getDocCount()/docFreq() semantics)
        if len(self.dead) and len(self.doc_ids):
            idx = np.searchsorted(self.doc_ids, self.dead)
            idx_c = np.minimum(idx, len(self.doc_ids) - 1)
            self.dead = self.dead[self.doc_ids[idx_c] == self.dead]
        elif len(self.dead):
            # empty shard (num_shards > occupied hash buckets): no doc can be
            # tombstoned here, and indexing an empty doc_ids array would raise
            self.dead = self.dead[:0]
        if len(self.dead):
            live = np.ones(len(self.doc_ids), dtype=bool)
            live[np.searchsorted(self.doc_ids, self.dead)] = False
            self.live_doc_ids = self.doc_ids[live]
            self.live_doclens = self.doclens[live]
            self._live_mask = live
        else:
            self.live_doc_ids = self.doc_ids
            self.live_doclens = self.doclens
            self._live_mask = None

    # --- points (BKD substitute, index/points.py) ------------------------
    @property
    def points(self):
        """Lazy per-shard points reader; only row-group stats stay resident."""
        p = getattr(self, "_points", None)
        if p is None:
            from .points import ShardPoints

            p = self._points = ShardPoints(self._index_dir, self.shard)
        return p

    def has_points(self, field: str) -> bool:
        return self.points.has_field(field)

    def point_range(self, field: str, lower, upper) -> np.ndarray:
        """Live doc ids with lower <= dv_<field> <= upper, via the sorted
        points leaves (PointRangeQuery.java:47 over the BKD substitute)."""
        docs = self.points.range(field, lower, upper)
        return docs[self._live_filter(docs)]

    def _lazy_col(self, name: str):
        """Load a deferred column on first use (sorted to match self.table);
        None when the shard has no such column or no rows."""
        if name in self._lazy:
            return self._lazy[name]
        col = None
        if self.table is not None and name in self._file_cols:
            raw = pq.read_table(self._pdir, columns=[name])[name]
            col = raw.take(self._order).combine_chunks()
        self._lazy[name] = col
        return col

    def _live_filter(self, docs: np.ndarray) -> np.ndarray:
        """Boolean keep-mask over a sorted doc array (True = live)."""
        if not len(self.dead):
            return np.ones(len(docs), dtype=bool)
        idx = np.searchsorted(self.dead, docs)
        idx_c = np.minimum(idx, len(self.dead) - 1)
        return self.dead[idx_c] != docs

    # --- term dictionary -------------------------------------------------
    def term_rows(self, term: str) -> list[int]:
        """Row indices for a term (several when head-salted across buckets)."""
        lo = np.searchsorted(self.terms, term, side="left")
        hi = np.searchsorted(self.terms, term, side="right")
        return list(range(int(lo), int(hi)))

    def term_stats(self, term: str) -> tuple[int, int]:
        """(df, ttf) of a term within this shard."""
        rows = self.term_rows(term)
        if not rows:
            return 0, 0
        df = sum(int(self.table["df"][r].as_py()) for r in rows)
        ttf = sum(int(self.table["ttf"][r].as_py()) for r in rows)
        return df, ttf

    def postings(self, term: str, with_positions: bool = False,
                 live_only: bool = True, payload_col: str = "positions"):
        """Decode a term's postings -> (docs, freqs[, payload_flat]).

        Multi-row (salted) terms concatenate in ascending doc order: sub
        ranges are disjoint, so ordering rows by their first doc suffices.
        live_only masks tombstoned docs (the live-docs overlay); pass False
        to see raw storage (check_index validates the encoded invariants).
        payload_col selects the per-occurrence payload(s) fetched when
        with_positions is True: "positions" (int32) or "offsets" (packed
        int64 char offsets, store_offsets indexes only) — both are laid out
        1:1 per occurrence, split by freqs. A tuple of column names fetches
        several payloads off ONE docs/freqs decode (the highlighter wants
        positions AND offsets; decoding twice doubles the cost on exactly
        the high-frequency terms phrases target).
        """
        pcols = (payload_col,) if isinstance(payload_col, str) else tuple(payload_col)
        pdtypes = [np.int64 if c == "offsets" else np.int32 for c in pcols]
        key = (term, with_positions, live_only, pcols)
        if key in self._cache:
            return self._cache[key]
        rows = self.term_rows(term)
        if not rows:
            empty = (np.zeros(0, np.int64), np.zeros(0, np.int32))
            return ((*empty, *(np.zeros(0, dt) for dt in pdtypes))
                    if with_positions else empty)
        pos_arrs = [self._lazy_col(c) for c in pcols] if with_positions else []
        decoded = []
        for r in rows:
            row = {
                "df": self.table["df"][r].as_py(),
                "short_bin": self.table["short_bin"][r].as_py(),
                "docs_bin": self.table["docs_bin"][r].as_py(),
                "freqs_bin": self.table["freqs_bin"][r].as_py(),
            }
            docs, freqs = decode_posting(row)
            pos = []
            if with_positions:
                n_occ = int(freqs.sum())
                for c, arr, dt in zip(pcols, pos_arrs, pdtypes):
                    sl = arr.slice(r, 1) if arr is not None else None
                    if sl is None or sl.null_count:
                        if self._stores_payload.get(c, True):
                            # stored column, null ROW (pre-payload segment
                            # appended to an index that stores it): fill
                            # the -1 "no payload" sentinel 1:1 per
                            # occurrence so multi-row terms stay aligned
                            # through merge and live filtering
                            pos.append(np.full(n_occ, -1, dtype=dt))
                        else:
                            # the index never stores this payload: empty
                            # keeps the consumers' no-payload fast path
                            pos.append(np.zeros(0, dtype=dt))
                    else:
                        pos.append(
                            sl.flatten().to_numpy(zero_copy_only=False).astype(dt))
            decoded.append((docs, freqs, pos))
        decoded.sort(key=lambda x: int(x[0][0]) if len(x[0]) else -1)
        docs = np.concatenate([d for d, _, _ in decoded])
        freqs = np.concatenate([f for _, f, _ in decoded])
        pos_alls = ([np.concatenate([p[i] for _, _, p in decoded])
                     for i in range(len(pcols))] if with_positions else [])
        if len(decoded) > 1 and np.any(np.diff(docs) < 0):
            # Defensive merge: salted rows are CONTIGUOUS doc sub-ranges by
            # construction (build.py sub = doc // span), so first-doc order
            # should already be globally sorted — but if an older layout (or
            # an external segment import) interleaves ranges, fall back to a
            # full doc-order merge, gathering positions segment-wise.
            order = np.argsort(docs, kind="stable")
            if with_positions:
                seg_starts = np.concatenate([[0], np.cumsum(freqs.astype(np.int64))])[:-1]
                sl = freqs.astype(np.int64)[order]
                ss = seg_starts[order]
                cum = np.concatenate([[0], np.cumsum(sl)])
                ranges = np.repeat(ss - cum[:-1], sl) + np.arange(int(sl.sum()))
                # an index-unstored payload is a zeros(0) placeholder —
                # leave it empty rather than indexing it with an
                # occurrence-length mask (row-null payloads on stored
                # columns were -1-filled above and DO reorder)
                pos_alls = [p[ranges] if len(p) == len(ranges) else p
                            for p in pos_alls]
            docs = docs[order]
            freqs = freqs[order]
        if live_only and len(self.dead):
            keep = self._live_filter(docs)
            if not keep.all():
                if with_positions:
                    pos_keep = np.repeat(keep, freqs)
                    pos_alls = [p[pos_keep] if len(p) == len(pos_keep) else p
                                for p in pos_alls]
                docs = docs[keep]
                freqs = freqs[keep]
        out = (docs, freqs, *pos_alls) if with_positions else (docs, freqs)
        if len(self._cache) >= self._cache_size:
            self._cache.pop(next(iter(self._cache)))
        self._cache[key] = out
        return out

    def block_metadata(self, term: str):
        """Concatenated (block_first_docs, block_max_freq, block_min_norm,
        block_df) across a term's rows, plus per-row handles for lazy decode."""
        rows = self.term_rows(term)
        chunks = []
        for r in rows:
            f = self.table["block_first_docs"][r].as_py() or []
            chunks.append(
                (
                    f,
                    self.table["block_max_freq"][r].as_py() or [],
                    self.table["block_min_norm"][r].as_py() or [],
                )
            )
        # salted rows hold disjoint doc sub-ranges; order them by first doc so
        # concatenated block metadata is globally doc-ascending
        chunks.sort(key=lambda c: c[0][0] if c[0] else -1)
        firsts = [x for c in chunks for x in c[0]]
        maxf = [x for c in chunks for x in c[1]]
        minn = [x for c in chunks for x in c[2]]
        return (
            np.asarray(firsts, dtype=np.int64),
            np.asarray(maxf, dtype=np.int32),
            np.asarray(minn, dtype=np.int32),
        )

    def block_impacts(self, term: str):
        """Per-block competitive-impact frontier (freq_arr, norm_arr) lists,
        concatenated across rows in the same first-doc order block_metadata
        uses; None when the term has no stored frontier (short term or a
        legacy index without the impacts_bin column)."""
        if self.table is None or "impacts_bin" not in self._file_cols:
            return None
        key = ("\x1fIMP", term)
        if key in self._cache:
            return self._cache[key]
        from .postings import decode_impacts

        imp_arr = self._lazy_col("impacts_bin")
        rows = self.term_rows(term)
        chunks = []
        for r in rows:
            f = self.table["block_first_docs"][r].as_py() or []
            dec = decode_impacts(imp_arr[r].as_py())
            if dec is None or len(dec) != len(f):
                chunks = None
                break
            chunks.append((f, dec))
        if chunks is None:
            out = None
        else:
            chunks.sort(key=lambda c: c[0][0] if c[0] else -1)
            out = []
            for _, dec in chunks:
                out.extend(dec)
        if len(self._cache) >= self._cache_size:
            self._cache.pop(next(iter(self._cache)))
        self._cache[key] = out
        return out

    def block_layout(self, term: str):
        """Lazy-decode layout for a term's postings blocks.

        Returns (firsts, handles, cache): `firsts` matches block_metadata's
        global block order (salted rows concatenated by first doc);
        `handles[b]` decodes global block b independently; `cache` memoizes
        decoded blocks. This is the skip-structure byte map — WAND jumps to
        a surviving window's blocks without decoding the pruned ones
        (Lucene84SkipWriter.java:51 jump-by-file-pointer role)."""
        key = ("\x1fBLK", term)
        if key in self._cache:
            return self._cache[key]
        rows = self.term_rows(term)
        chunks = []
        for r in rows:
            f = self.table["block_first_docs"][r].as_py() or []
            if not f:
                continue
            sb = self.table["short_bin"][r].as_py()
            if sb is not None:
                # short (varint) row: one pseudo-block = the whole row
                chunks.append((f[0], [("s", r, 0, 0, 0, 0, 0)]))
            else:
                db = self.table["docs_bin"][r].as_py()
                fb = self.table["freqs_bin"][r].as_py()
                do, dc = block_spans(db)
                fo, _ = block_spans(fb)
                blocks = [
                    ("l", db, fb,
                     int(do[j]), int(do[j + 1]),
                     int(fo[j]), int(fo[j + 1]), int(dc[j]))
                    for j in range(len(dc))
                ]
                chunks.append((f[0], blocks))
        chunks.sort(key=lambda c: c[0])
        handles = [h for _, blks in chunks for h in blks]
        firsts, _, _ = self.block_metadata(term)
        out = (firsts, handles, {})
        if len(self._cache) >= self._cache_size:
            self._cache.pop(next(iter(self._cache)))
        self._cache[key] = out
        return out

    def postings_blocks(self, term: str, b0: int, b1: int,
                        live_only: bool = True):
        """Decode ONLY global blocks [b0, b1) of a term -> (docs, freqs).

        Each block is self-contained: gaps re-anchor at the block's stored
        first doc, so pruned blocks are never touched (the lazy path behind
        block-max WAND). Decoded blocks memoize in the layout cache."""
        firsts, handles, cache = self.block_layout(term)
        parts_d, parts_f = [], []
        for b in range(b0, b1):
            got = cache.get(b)
            if got is None:
                h = handles[b]
                if h[0] == "s":
                    r = h[1]
                    docs, freqs = decode_posting({
                        "df": self.table["df"][r].as_py(),
                        "short_bin": self.table["short_bin"][r].as_py(),
                        "docs_bin": None,
                        "freqs_bin": None,
                    })
                else:
                    _, db, fb, d0, d1, f0, f1, cnt = h
                    gaps = decode_blocks(db[d0:d1], cnt).astype(np.int64)
                    freqs = decode_blocks(fb[f0:f1], cnt).astype(np.int32)
                    docs = int(firsts[b]) + np.cumsum(gaps) - int(gaps[0])
                got = (docs, freqs)
                cache[b] = got
            parts_d.append(got[0])
            parts_f.append(got[1])
        if not parts_d:
            return np.zeros(0, np.int64), np.zeros(0, np.int32)
        docs = np.concatenate(parts_d)
        freqs = np.concatenate(parts_f)
        if live_only and len(self.dead):
            keep = self._live_filter(docs)
            if not keep.all():
                docs = docs[keep]
                freqs = freqs[keep]
        return docs, freqs

    # --- norms -----------------------------------------------------------
    def norms_for(self, docs: np.ndarray, field: str | None = None) -> np.ndarray:
        """Vectorized doc_id -> norm byte lookup (searchsorted on sorted ids).

        field=None -> the main text field's norms; an analyzed field name
        -> that field's norms, derived (and cached) from its fdl_<field>
        doclen docvalues column (per-field norms, the reference's per-field
        NumericDocValues norms)."""
        idx = np.searchsorted(self.doc_ids, docs)
        if field is None:
            return self.norms[idx]
        fn = self._field_norms.get(field)
        if fn is None:
            from ..util.smallfloat import int_to_byte4_vec

            fn = int_to_byte4_vec(
                self.docvalues[f"fdl_{field}"].astype(np.int64))
            self._field_norms[field] = fn
        return fn[idx]

    # --- SORTED docvalues --------------------------------------------------
    def strings_for(self, field: str, docs: np.ndarray) -> np.ndarray:
        """doc_id -> string value for a SORTED docvalues field ('U' array)."""
        u, inv = self.sorted_dv[field]
        idx = np.searchsorted(self.doc_ids, docs)
        return u[inv[idx]]

    def bytes_for(self, field: str, docs: np.ndarray) -> np.ndarray:
        """doc_id -> bytes (or None) for a BINARY docvalues field."""
        vals = self.binary_dv[field]
        idx = np.searchsorted(self.doc_ids, docs)
        return vals[idx]

    # --- index sort (IndexWriterConfig.setIndexSort role) -------------------
    def sort_perm(self, field: str, descending: bool = False) -> np.ndarray:
        """Slot permutation ordering this shard by a NUMERIC docvalues
        field (or doclen / doc_id), ties broken by doc order ASCENDING in
        both directions — the global (value, doc_id) sort order, so a
        per-shard prefix of the permutation is a valid top-k candidate
        set. The reference bakes this order into segment doc ids at flush
        (IndexWriterConfig.setIndexSort, Sorter.java:49); here it is
        recovered once per loaded shard and cached, leaving the doc-id
        layout untouched."""
        key = (field, bool(descending))
        perm = self._sort_perms.get(key)
        if perm is None:
            if field == "doclen":
                vals = self.doclens.astype(np.int64)
            elif field == "doc_id":
                vals = self.doc_ids
            else:
                vals = self.docvalues[field]
            slots = np.arange(len(vals), dtype=np.int64)
            perm = np.lexsort((slots, -vals if descending else vals))
            self._sort_perms[key] = perm
        return perm


class IndexReader:
    """Composite over all shards + collection statistics (manifest)."""

    def __init__(self, index_dir: str):
        self.index_dir = index_dir
        with open(os.path.join(index_dir, "manifest.json")) as f:
            self.manifest = json.load(f)
        if not self.manifest.get("committed"):
            raise ValueError(f"index at {index_dir} has no committed manifest")
        # shard ids may be NON-contiguous after a tiered (selective) merge:
        # the manifest's shard_ids list is authoritative; legacy manifests
        # imply range(num_shards)
        self.shard_ids: list[int] = (
            self.manifest.get("shard_ids")
            or list(range(self.manifest["num_shards"]))
        )
        self.num_shards = len(self.shard_ids)
        self._shards: dict[int, ShardReader] = {}

    def shard(self, i: int) -> ShardReader:
        if i not in self._shards:
            self._shards[i] = ShardReader(self.index_dir, i)
        return self._shards[i]

    @property
    def shards(self) -> list[ShardReader]:
        return [self.shard(i) for i in self.shard_ids]

    @property
    def doc_count(self) -> int:
        return self.manifest["stats"]["doc_count"]

    @property
    def sum_total_term_freq(self) -> int:
        return self.manifest["stats"]["sum_total_term_freq"]

    def term_stats(self, term: str) -> tuple[int, int]:
        """Global (df, ttf): per-shard stats summed, as the reference sums
        per-segment stats at query time (TermQuery.createWeight)."""
        df = ttf = 0
        for s in self.shards:
            d, t = s.term_stats(term)
            df += d
            ttf += t
        return df, ttf

    @property
    def analyzed_fields(self) -> frozenset:
        """Analyzed-field names (PerFieldAnalyzerWrapper role) from config."""
        af = (self.manifest.get("config") or {}).get("analyzed_fields") or ()
        return frozenset(e[0] for e in af)

    def analyzer_chain(self, field: str) -> tuple:
        """(stemmer_name|None, stopwords frozenset|None, filter_spec) for
        an analyzed field — the query-side analyzer must mirror the
        index-side chain (incl. the per-field token-filter list)."""
        for e in (self.manifest.get("config") or {}).get("analyzed_fields") or ():
            if e[0] == field:
                stem = e[1] if len(e) > 1 and e[1] else None
                stops = frozenset(
                    s.strip() for s in (e[2] if len(e) > 2 else "").split(",")
                    if s.strip()
                ) or None
                filt = e[3] if len(e) > 3 else ()
                return stem, stops, filt
        return None, None, ()

    def field_stats(self, field: str) -> tuple[int, int]:
        """(docCount(field), sumTotalTermFreq(field)) for an analyzed field
        (the reference's per-field CollectionStatistics): computed once from
        the fdl_<field> doclen docvalues across shards and cached. Like the
        text-field manifest stats, deleted-but-unmerged docs still count
        (Terms.getDocCount semantics)."""
        if not hasattr(self, "_field_stats"):
            self._field_stats: dict[str, tuple[int, int]] = {}
        if field not in self._field_stats:
            dc = sdl = 0
            for s in self.shards:
                v = s.docvalues.get(f"fdl_{field}")
                if v is not None and len(v):
                    dc += int(np.count_nonzero(v))
                    sdl += int(v.sum())
            self._field_stats[field] = (dc, sdl)
        return self._field_stats[field]
