"""Ray-Data-native inverted index build (the reference's IndexWriter role).

Pipeline shape (SURVEY.md §3.1 / §7.2, re-expressed Ray-Data-first):

  stage A  read_parquet(corpus chunk) -> map_batches(TokenizeExplode)
           -> write_parquet(index_dir/stage1/part=<chunk>/, hive by kind)
           One task == one DWPT flush: tokenize (StandardAnalyzer chain),
           per-batch postings aggregation, norm bytes (SmallFloat intToByte4).
           Emits postings rows per (term, doc-shard) with list payloads, plus
           doc rows (doc_id, doclen, norm). Stage-1 parquet is the
           checkpointed "segment" layer — the per-partition lineage unit.

  stage B  read stage1 postings -> groupby(shard, bucket, sub) -> map_groups
           (encode) -> write_parquet(index_dir/postings, partitioned by shard)
           The wide shuffle (the reference's SegmentMerger/TieredMergePolicy
           role): bucket = hash(term) % num_buckets spreads the term space;
           head terms (detected by a sampling pre-pass) additionally carry a
           doc-range subkey sub = doc_id // head_sub_span so no single group
           holds a full Zipf-head posting list — the explicit skew handling
           the merge needs at 10^12 docs. Because sub is a CONTIGUOUS doc
           range (not a hash), a head term's encoded rows cover disjoint
           ascending doc intervals: the reader concatenates them in
           first-doc order and the result is globally doc-sorted, and each
           row's block metadata stays doc-ascending too.

  stage C  read stage1 docs -> explode -> write_parquet(index_dir/docs,
           partitioned by shard); tiny aggregate -> collection stats.

  commit   manifest.json written last (the reference's segments_N two-phase
           commit pattern, index/SegmentInfos.java:57-67): a build is visible
           iff its manifest generation exists. Resume skips completed stage-1
           chunks recorded in the manifest's lineage.

Sharding is doc-partitioned (shard = doc_id % num_shards), mirroring
Lucene/Solr's doc-partitioned segments; this is itself the first line of
head-term skew mitigation — the postings of "the" split across all shards.
"""

from __future__ import annotations

import json
import os
import time
from collections import Counter
from dataclasses import dataclass, field, asdict
from zlib import crc32

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data

from ..analysis import standard_analyzer
from ..util.smallfloat import int_to_byte4_vec
from .postings import POSTINGS_SCHEMA, encode_postings_group

STAGE1_SCHEMA = pa.schema(
    [
        ("kind", pa.int8()),  # 0 = postings row, 1 = docs row
        ("shard", pa.int32()),
        ("bucket", pa.int32()),
        ("sub", pa.int32()),   # head-term doc-range subkey (0 for tail terms)
        ("term", pa.large_string()),
        ("docs", pa.large_list(pa.int64())),
        ("freqs", pa.large_list(pa.int32())),   # doc rows: doclen
        ("norms", pa.large_list(pa.int32())),   # norm byte per doc
        ("positions", pa.large_list(pa.int32())),
        # char offsets per occurrence, aligned 1:1 with positions, packed
        # (start << 32) | end per token (store_offsets builds only); -1
        # marks a non-offset posting (keyword / analyzed-field terms)
        ("offsets", pa.large_list(pa.int64())),
        # docvalues sidecar (doc rows only): per doc, the values of
        # cfg.docvalues_fields concatenated in declared order (float64)
        ("dv", pa.large_list(pa.float64())),
        # SORTED (string) docvalues sidecar: cfg.string_docvalues_fields
        # values per doc, declared order (Lucene80DocValuesFormat SORTED role)
        ("sdv", pa.large_list(pa.large_string())),
    ]
)


def term_bucket(terms: np.ndarray, num_buckets: int) -> np.ndarray:
    """Stable term -> bucket hash (crc32; deterministic across processes)."""
    return np.array(
        [crc32(t.encode("utf-8")) % num_buckets for t in terms], dtype=np.int32
    )


@dataclass
class IndexBuildConfig:
    num_shards: int = 4
    # stage-1 row count scales with num_batches * num_shards (one row per
    # (term, doc-shard) per batch): bigger batches and fewer shards shrink
    # the merge shuffle; smaller batches improve stage-A parallelism for
    # small corpora. 0 = AUTO: clamp(corpus_rows / (1.5 * cluster_cpus),
    # 2048, 16384) — enough batches to keep every worker busy while
    # minimizing merge-shuffle rows. Measured: 200k docs / 32 CPUs wants
    # 4096 (merge halves vs 2048), 1M docs wants 8-16k (merge halves
    # again); the cap also bounds per-task memory for 10^12-doc corpora.
    num_buckets: int = 32          # merge-shuffle groups per shard
    store_positions: bool = True
    # IndexOptions.DOCS_AND_FREQS_AND_POSITIONS_AND_OFFSETS
    # (index/IndexOptions.java:41): store per-occurrence char offsets into
    # the indexed text alongside positions — the PostingsHighlighter /
    # UnifiedHighlighter OFFSETS source (postingshighlight/
    # PostingsHighlighter.java:47). Opt-in, as in the reference (the
    # default FieldType stops at positions). Offsets are Python code-point
    # offsets into the EXTRACTED text (when html_col is set, the stripped
    # text, not the raw HTML). Keyword and analyzed-field terms carry -1
    # (no offsets); synonym / word-delimiter insertions carry the offsets
    # of the token they stack on.
    store_offsets: bool = False
    # DelimitedPayloadTokenFilter chain (analysis/payloads/
    # DelimitedPayloadTokenFilter.java:33 with the IntegerEncoder, fed by
    # WhitespaceTokenizer.java:32 — the reference's standard payload field
    # config, since UAX#29 would split the delimiter): tokens `term<d>int`
    # index `term` carrying the integer as a per-occurrence payload; other
    # tokens carry -1. Payloads ride the same per-occurrence int64 sidecar
    # as offsets (the reference likewise interleaves payloads and offsets
    # in the .pos stream, Lucene84PostingsWriter.java:57), so one index
    # stores offsets OR payloads, not both — validated below. Query side:
    # search.services.payload_score (PayloadScoreQuery.java:57).
    payload_delimiter: str | None = None
    batch_size: int = 0            # docs per tokenize batch (0 = auto)
    stopwords: tuple = ()
    # head-term skew handling: terms whose sampled token share exceeds
    # head_df_ratio get a doc-range subkey sub = doc_id // head_sub_span so
    # their merge work splits across groups in contiguous doc intervals
    head_df_ratio: float = 0.005
    head_sample_docs: int = 600   # Zipf head is stable under small samples
    head_sub_span: int = 1 << 20
    # stage-1 / postings layout version: bump invalidates old checkpoints
    format_version: int = 4
    files_per_chunk: int = 64      # stage-A chunk = lineage/resume unit
    tokenize_concurrency: int | None = None
    # True -> tokenize runs as an actor pool (state loads once per actor);
    # False -> stateless tasks (lower startup overhead; tokenizer state is
    # just module-level compiled regexes, so tasks are the default)
    use_actor_pool: bool = False
    # keep the stage-1 dataset materialized in the object store for the merge
    # (still checkpointed to parquet for resume). Disk streaming measured
    # faster even single-node (columnar re-read beats filtering the wide
    # materialized blocks), so default False.
    keep_stage1_in_memory: bool = False
    # when set, text is extracted from this html (binary) column via the
    # HTMLStripCharFilter-equivalent; if text_col also exists, extraction is
    # verified byte-identical per row (the input_hint per-row invariant)
    html_col: str | None = None
    # keyword fields (the reference's StringField / multi-field Document,
    # document/Field.java:62): each listed column is indexed untokenized as
    # one term "column:value" per doc. Keyword terms do not contribute to
    # the text field's length/norm (StringFields carry no norms).
    keyword_fields: tuple = ()
    # numeric docvalues columns stored alongside each doc (the reference's
    # NUMERIC DocValues, index/DocValuesType.java): sortable/filterable at
    # query time without touching the corpus
    docvalues_fields: tuple = ()
    # SORTED (string) docvalues columns (Lucene80DocValuesFormat.java:66-132
    # SORTED role): per-shard ordinal-encoded string column, sortable and
    # facetable off the index.
    string_docvalues_fields: tuple = ()
    # SORTED_SET (multi-valued string) docvalues columns (same format's
    # SORTED_SET role, index/DocValuesType.java SORTED_SET): the corpus
    # column holds either list<string> or a single string (a 1-element set).
    # Per doc the value set is deduped + sorted (the reference stores ords
    # in increasing order per doc); stored as a list<dictionary<string>>
    # column ssdv_<name> in the docs table — value dictionary + per-doc ord
    # list, facetable and set-filterable off the index.
    sorted_set_docvalues_fields: tuple = ()
    # SORTED_NUMERIC (multi-valued numeric) docvalues columns
    # (SortedNumericDocValuesField.java, DocValuesType.SORTED_NUMERIC): the
    # corpus column holds list<numeric> or a single numeric. Per doc the
    # values are sorted ascending (the reference's in-doc ordering) and
    # stored as a list<float64> column sndv_<name> in the docs table;
    # range-filterable (newSlowRangeQuery: match if ANY value in range) and
    # sortable with a MIN/MAX selector (SortedNumericSelector.java:34).
    sorted_numeric_docvalues_fields: tuple = ()
    # BINARY docvalues columns (DocValuesType.BINARY,
    # BinaryDocValuesField.java:33): per-doc opaque bytes stored beside the
    # docs table as bdv_<name> large_binary (null = missing). The corpus
    # column holds binary or string (utf-8 encoded). Transport rides the
    # string sidecar as 'x'+hex ('' = missing) so encode/merge plumbing is
    # shared; docs_explode decodes back to bytes.
    binary_docvalues_fields: tuple = ()
    # points fields (the reference's BKD-indexed numerics,
    # util/bkd/BKDWriter.java:59-90): per shard, a (value, doc_id) file
    # sorted by value with row_group_size=1024 leaves; PointRangeQuery reads
    # only the row groups whose parquet min/max stats overlap the range (see
    # index/points.py). Each points field is also stored as numeric
    # docvalues (forced in __post_init__) — the value source the points
    # build sorts from, and the IndexOrDocValues alternative plan.
    points_fields: tuple = ()
    # token-filter chain (analysis/common filter zoo): names or
    # (name, *args) entries from analysis/filters.py, run between the stop
    # filter and the stemmer on the TEXT field (index- and query-side).
    # e.g. ("trim", "english_possessive", ("length", 2, 64))
    token_filters: tuple = ()
    # (Set)KeywordMarkerFilter: these words skip the stemmer, index- and
    # query-side (SetKeywordMarkerFilter.java:32)
    protected_words: tuple = ()
    # EdgeNGramTokenFilter (min_gram, max_gram): every indexed TEXT token
    # additionally emits its leading grams as posInc-0 stacked insertions
    # (preserveOriginal search-as-you-type config; grams shorter than the
    # token only). Query side is untouched: a prefix typed by a user is a
    # plain TermQuery against the grams — the point of the filter.
    edge_ngram: tuple = ()
    # analysis-chain extensions (SURVEY.md §2.2): optional stemmer
    # ("porter" | "minimal_english", en/PorterStemFilter.java:56 role) and
    # index-time synonym groups ("a,b,c" strings; every member of a group
    # indexes every other member at the same position with posIncrement-0
    # semantics, SynonymGraphFilter.java:81 role). Synonym insertions do NOT
    # count toward field length/norms (keeps doclen equal to the visible
    # token count; a deliberate, documented divergence).
    stemmer: str | None = None
    synonyms: tuple = ()
    # Index-time MULTI-WORD synonym graph (SynonymGraphFilter.java:81 +
    # FlattenGraphFilter.java:32 flatten semantics — an index cannot store
    # posLength, so graph arcs flatten onto token positions). Rule grammar
    # is the Solr synonyms.txt format:
    #   "usa, united states of america"     equivalence group
    #   "dns, domain name system => dns"    explicit mapping
    # Members are analyzed with the standard chain (lowercase etc.) before
    # matching. For each occurrence of an n-token LHS phrase, every k-token
    # RHS inserts token j at the position of matched token min(j, n-1)
    # (+j-(n-1) steps past the match when k > n) with posInc-0 stacking —
    # so a single-token synonym lands on the phrase's first position
    # (query "dns" matches "domain name system" docs), and a multi-word
    # expansion overlays the following real positions (phrase query
    # "domain name system" matches "dns" docs), exactly the flattened
    # shapes TestSynonymGraphFilter.java exercises. Insertions do NOT
    # count toward field length/norms (same documented accounting as
    # `synonyms`), so both surface forms score identically under BM25
    # when doclens agree.
    synonym_graph: tuple = ()
    # WordDelimiterGraphFilter subset (see analysis.word_delimiter_parts):
    # mixed-case / alphanumeric tokens additionally index their lowercase
    # parts + catenated form at the same position (posInc-0 insertions, no
    # doclen contribution — same accounting as synonym insertions)
    word_delimiter: bool = False
    # WordDelimiterGraphFilter with FULL graph semantics
    # (miscellaneous/WordDelimiterGraphFilter.java:99 + FlattenGraphFilter
    # .java:32; see analysis.word_delimiter_graph_stream): parts of a split
    # token take CONSECUTIVE positions and downstream tokens shift, so
    # phrase queries match across a split; catenations + the preserved
    # original stack posInc-0 at the first part (no doclen contribution —
    # Lucene's default discountOverlaps accounting).
    word_delimiter_graph: bool = False
    # CommonGramsFilter (commongrams/CommonGramsFilter.java:51): for every
    # adjacent token pair where either side is in this common-word list,
    # additionally index the bigram "w1_w2" at the FIRST word's position
    # (posInc 0, posLength 2 — no doclen contribution). Query-side phrase
    # queries mirror CommonGramsQueryFilter (CommonGramsQueryFilter
    # .java:64): bigrams replace their leading unigram, giving exact
    # phrase-with-stopword matching off dedicated terms. Incompatible
    # with stemmer/token_filters (the bigram is built from raw tokens).
    common_grams: tuple = ()
    # CJKBigramFilter (analysis/cjk/CJKBigramFilter.java:52 — the
    # CJKAnalyzer role, the reference's dictionary-less CJK mode):
    # position-adjacent all-CJK tokens re-emit as overlapping character
    # bigrams at consecutive positions (isolated chars stay unigrams).
    # Query side mirrors via rewrite_cjk_bigrams. Incompatible with the
    # offset sidecar and the other stream-restructuring chains.
    cjk_bigrams: bool = False
    # PerFieldPostingsFormat SPI (codecs/perfield/PerFieldPostingsFormat
    # .java:70): ((field, format), ...) pairs; '' = the main text field.
    # Formats: 'lucene84' (default FOR/PFor + VInt tail) and 'direct'
    # (DirectPostingsFormat.java:104 role — long lists encode as
    # fixed-width plain-FOR blocks; decode is a straight widen at 2-8x
    # the bytes, for latency-critical hot fields). Same wire format
    # either way, so search/merge/append paths are format-agnostic.
    field_postings_formats: tuple = ()
    # per-field analyzed fields (PerFieldAnalyzerWrapper role,
    # analysis/miscellaneous/PerFieldAnalyzerWrapper.java:51 + the
    # reference's multi-field Document): each (column, stemmer, stopwords)
    # entry tokenizes that corpus column with ITS OWN chain ("" = none /
    # stopwords comma-separated) and indexes terms as "column:term" with
    # per-field positions and PER-FIELD norms; the field's doclen rides the
    # numeric-docvalues sidecar as fdl_<column>, giving query-time field
    # norms and per-field BM25 stats (docCount(field), sumTotalTermFreq
    # (field)) without new storage plumbing. Phrases within a field work
    # (positions are field-local); cross-field spans are not supported.
    analyzed_fields: tuple = ()
    # stage-1 is a build-time checkpoint (resume unit); merges operate on the
    # ENCODED segment tables, so after commit stage-1 is dead weight (~the
    # tokenized corpus, positions included) and is GC'd. True retains it for
    # debugging.
    retain_stage1: bool = False
    # stage-1 checkpoint mode — how the tokenize output reaches the merge:
    #   "sync":    write stage-1 parquet, stage B re-reads it from disk
    #              (lowest memory: one chunk in flight; the 100-TB default)
    #   "overlap": materialize stage-1 in the object store, feed stage B
    #              from memory while the parquet checkpoint lands in a
    #              BACKGROUND thread (resume granularity preserved — each
    #              chunk's lineage entry commits when its write finishes)
    #   "off":     materialize only, never write the checkpoint (fastest;
    #              a killed build restarts from zero)
    #   "auto":    "overlap" when the input is small enough that the
    #              tokenized corpus fits comfortably in the object store,
    #              else "sync"
    stage1_checkpoint: str = "auto"

    def __post_init__(self):
        if self.stage1_checkpoint not in ("auto", "sync", "overlap", "off"):
            raise ValueError(
                f"stage1_checkpoint={self.stage1_checkpoint!r}: options are "
                "auto, sync, overlap, off")
        if self.store_offsets and not self.store_positions:
            # the reference's IndexOptions enum has no offsets-without-
            # positions level either (IndexOptions.java:24-41)
            raise ValueError("store_offsets requires store_positions")
        if self.payload_delimiter:
            if not self.store_positions:
                raise ValueError("payload_delimiter requires store_positions")
            if self.store_offsets:
                raise ValueError(
                    "payloads and offsets share the per-occurrence sidecar "
                    "column; an index stores one or the other")
            clash = [f for f in ("word_delimiter", "word_delimiter_graph",
                                 "edge_ngram", "synonyms",
                                 "synonym_graph", "stemmer", "token_filters",
                                 "html_col")
                     if getattr(self, f)]
            if clash:
                raise ValueError(
                    "payload_delimiter selects the whitespace->payload->"
                    f"lowercase chain; incompatible with {clash}")
        if self.token_filters:
            from ..analysis.filters import build_chain

            build_chain(self.token_filters)   # validate names/args early
        if self.edge_ngram:
            lo, hi = self.edge_ngram
            if not (1 <= lo <= hi):
                raise ValueError("edge_ngram wants 1 <= min_gram <= max_gram")
        if self.common_grams:
            clash = [f for f in ("word_delimiter", "word_delimiter_graph",
                                 "edge_ngram", "synonyms", "synonym_graph",
                                 "stemmer", "token_filters", "cjk_bigrams")
                     if getattr(self, f)]
            if clash:
                raise ValueError(
                    f"common_grams builds bigrams from the raw token "
                    f"stream; incompatible with {clash}")
        if self.cjk_bigrams:
            clash = [f for f in ("word_delimiter", "word_delimiter_graph",
                                 "edge_ngram", "synonyms", "synonym_graph",
                                 "store_offsets", "payload_delimiter")
                     if getattr(self, f)]
            if clash:
                raise ValueError(
                    f"cjk_bigrams restructures the token stream; "
                    f"incompatible with {clash}")
        if self.word_delimiter and self.word_delimiter_graph:
            raise ValueError(
                "word_delimiter and word_delimiter_graph are two modes of "
                "the same filter; enable one")
        if self.synonym_graph and self.word_delimiter_graph:
            raise ValueError(
                "synonym_graph cannot combine with word_delimiter_graph at "
                "index time (both renumber the position stream)")
        if self.synonym_graph and self.word_delimiter:
            # WDGF parts capture their positions BEFORE the graph flatten
            # renumbers the stream, so they would silently misalign; the
            # reference likewise documents WordDelimiterGraphFilter as
            # unsuitable for index-time combination with graph synonym
            # output (WordDelimiterGraphFilter.java header)
            raise ValueError(
                "synonym_graph cannot combine with word_delimiter at "
                "index time (position-shift misalignment)")
        for fld, fmt in (self.field_postings_formats or ()):
            if fmt not in ("lucene84", "direct"):
                raise ValueError(
                    f"unknown postings format {fmt!r} for field {fld!r}; "
                    "options: lucene84, direct")
        if self.points_fields:
            self.docvalues_fields = tuple(self.docvalues_fields) + tuple(
                f for f in self.points_fields if f not in self.docvalues_fields
            )
        if self.analyzed_fields:
            # per-field doclen sidecar columns (idempotent across the
            # manifest round-trip, which re-runs __post_init__)
            self.docvalues_fields = tuple(self.docvalues_fields) + tuple(
                f"fdl_{c}" for c, *_ in self.analyzed_fields
                if f"fdl_{c}" not in self.docvalues_fields
            )

    def fingerprint(self) -> str:
        # execution-only knobs (how stage-1 reaches the merge, pool sizes)
        # don't change index CONTENT: exclude them so flipping them never
        # invalidates a resumable build
        d = asdict(self)
        for k in ("stage1_checkpoint", "keep_stage1_in_memory",
                  "use_actor_pool", "tokenize_concurrency", "retain_stage1"):
            d.pop(k, None)
        return json.dumps(d, sort_keys=True, default=list)


class TokenizeExplode:
    """Stateful map_batches stage: analyzer chain + per-batch postings build.

    All cross-token work is vectorized (pandas factorize + numpy lexsort /
    reduceat); the only per-row Python is the tokenizer regex itself.
    """

    def __init__(self, key_col: str, text_col: str, cfg: dict, head_terms: list[str]):
        self.key_col = key_col
        self.text_col = text_col
        self.cfg = cfg
        self.stop = frozenset(cfg["stopwords"]) if cfg["stopwords"] else None
        self.head = frozenset(head_terms)
        self.num_shards = cfg["num_shards"]
        self.num_buckets = cfg["num_buckets"]
        self.sub_span = cfg["head_sub_span"]
        self.store_positions = cfg["store_positions"]
        self.payload_delim = cfg.get("payload_delimiter") or None
        # payload ints ride the offsets sidecar: downstream assembly/encode
        # plumbing is identical, so payload mode simply turns `so` on
        self.store_offsets = bool(cfg.get("store_offsets")) or bool(self.payload_delim)
        from ..analysis.filters import build_chain
        from ..analysis.stem import get_stemmer, get_stemmer_cfg

        self.stem = get_stemmer_cfg(cfg)
        self.common_grams = frozenset(cfg.get("common_grams") or ())
        self.cjk = bool(cfg.get("cjk_bigrams"))
        self.tf_chain, self.tf_drops = build_chain(cfg.get("token_filters"))
        eg = cfg.get("edge_ngram") or ()
        self.edge_ngram = (int(eg[0]), int(eg[1])) if eg else None
        syn: dict[str, tuple] = {}
        for group in cfg.get("synonyms") or ():
            members = [m.strip() for m in group.split(",") if m.strip()]
            for m in members:
                others = tuple(x for x in members if x != m)
                if others:
                    syn[m] = tuple(sorted(set(syn.get(m, ())) | set(others)))
        self.syn = syn
        # multi-word synonym graph: compile rules to lhs -> [rhs, ...] in
        # the SAME normalized token space the stream will be in (rule
        # tokens run through the configured filter chain + stemmer, as the
        # reference analyzes rules with the index analyzer,
        # SolrSynonymParser.java:118)
        self.syn_graph: dict[tuple, list[tuple]] = {}
        if cfg.get("synonym_graph"):
            from ..analysis.synonyms import parse_synonym_rules

            def norm(toks: tuple) -> tuple | None:
                out = []
                for t in toks:
                    if self.tf_chain is not None:
                        t = self.tf_chain(t)
                        if t is None:
                            return None
                    if self.stem is not None:
                        t = self.stem(t)
                    out.append(t)
                return tuple(out)

            for lhs, rhs in parse_synonym_rules(cfg["synonym_graph"]):
                lhs_n, rhs_n = norm(lhs), norm(rhs)
                if lhs_n and rhs_n and lhs_n != rhs_n:
                    self.syn_graph.setdefault(lhs_n, [])
                    if rhs_n not in self.syn_graph[lhs_n]:
                        self.syn_graph[lhs_n].append(rhs_n)
        # per-field analyzer chains:
        # (column, stemmer_fn, stop_frozenset, filter_chain, chain_drops)
        # — entry format (col[, stemmer[, stopwords_csv[, filter_spec]]])
        self.analyzed: list[tuple] = []
        for entry in cfg.get("analyzed_fields") or ():
            col = entry[0]
            stem_name = entry[1] if len(entry) > 1 and entry[1] else None
            stops = frozenset(
                s.strip() for s in (entry[2] if len(entry) > 2 else "").split(",")
                if s.strip()
            ) or None
            f_ch, f_drops = build_chain(entry[3] if len(entry) > 3 else ())
            self.analyzed.append(
                (col, get_stemmer(stem_name), stops, f_ch, f_drops))

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = batch[self.key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if self.cfg.get("html_col"):
            from ..analysis import html_to_text

            # block-level tags strip to "\n" (reference HTMLStripCharFilter
            # semantics); the body text itself is byte-identical, so the
            # per-row invariant is equality after trimming the frame
            texts = [html_to_text(h).strip()
                     for h in batch[self.cfg["html_col"]].to_pylist()]
            if self.text_col in batch.column_names:
                given = batch[self.text_col].to_pylist()
                bad = sum(1 for a, b in zip(texts, given) if a != b)
                if bad:
                    raise ValueError(
                        f"html extraction broke byte-identity for {bad} rows"
                    )
        else:
            texts = batch[self.text_col].to_pylist()

        from ..analysis.analyzers import analyze_fast

        flat_terms: list[str] = []
        fallback_pos: dict[int, list[int]] = {}
        doclens = np.zeros(len(texts), dtype=np.int64)
        wdg = bool(self.cfg.get("word_delimiter"))
        wdgraph = bool(self.cfg.get("word_delimiter_graph"))
        so = self.store_offsets
        # packed (start << 32) | end per text token, aligned with flat_terms
        flat_offs: list[int] = []
        # word-delimiter insertions: (term, doc idx, position), posInc-0
        wd_terms: list[str] = []
        wd_doc: list[int] = []
        wd_pos: list[int] = []
        wd_off: list[int] = []   # parts inherit the whole token's offsets
        # a drop-capable filter chain (length) removes tokens -> doclens and
        # positions must come from the explicit slow path; 1:1 chains apply
        # vectorized on factorized uniques after the loop instead
        use_fast = (not self.stop and not wdg and not wdgraph and not so
                    and not self.tf_drops and not self.common_grams
                    and not self.cjk)
        drop_ch = self.tf_chain if self.tf_drops else None
        if wdg or wdgraph:
            from ..analysis import word_delimiter_parts
            from ..analysis.analyzers import word_delimiter_graph_stream
            from ..analysis.lowercase import java_lower
            from ..analysis.tokenizer import (standard_tokenize,
                                              standard_tokenize_offsets)
        if so and not wdg:
            from ..analysis.analyzers import standard_analyzer_offsets
        if self.payload_delim:
            from ..analysis.analyzers import whitespace_payload_analyzer
        for i, text in enumerate(texts):
            positions = None
            offs_doc = None
            if self.payload_delim:
                # whitespace -> delimited-payload -> lowercase chain; the
                # payload ints ARE this build's per-occurrence sidecar
                terms, positions, offs_doc = whitespace_payload_analyzer(
                    text or "", self.payload_delim, self.stop)
            elif wdg or wdgraph:
                # case information feeds the splitter, so the pre-lowercase
                # tokenizer output is needed here
                if so:
                    raw, positions, t_s, t_e = standard_tokenize_offsets(
                        text or "")
                    offs_doc = [(s << 32) | e for s, e in zip(t_s, t_e)]
                else:
                    raw, positions = standard_tokenize(text or "")
                low = [java_lower(t) for t in raw]
                if self.stop:
                    keep = [t not in self.stop for t in low]
                    low = [t for t, k in zip(low, keep) if k]
                    positions = [p for p, k in zip(positions, keep) if k]
                    raw = [r for r, k in zip(raw, keep) if k]
                    if so:
                        offs_doc = [o for o, k in zip(offs_doc, keep) if k]
                if drop_ch is not None:
                    # chain runs before WDGF part emission: dropped tokens
                    # emit no parts (position holes kept, StopFilter-style)
                    mapped = [drop_ch(t) for t in low]
                    keep = [m is not None for m in mapped]
                    low = [m for m in mapped if m is not None]
                    positions = [p for p, k in zip(positions, keep) if k]
                    raw = [r for r, k in zip(raw, keep) if k]
                    if so:
                        offs_doc = [o for o, k in zip(offs_doc, keep) if k]
                if wdgraph:
                    # graph mode: parts take consecutive positions, the
                    # rest of the stream shifts; catenations/original land
                    # in the posInc-0 sidecar (no doclen contribution)
                    terms, positions, offs_doc, wd_over = \
                        word_delimiter_graph_stream(
                            raw, positions, offs_doc if so else None)
                    for ot, op, oo in wd_over:
                        wd_terms.append(ot)
                        wd_doc.append(i)
                        wd_pos.append(op)
                        if so:
                            wd_off.append(oo)
                else:
                    for j, (r, p) in enumerate(zip(raw, positions)):
                        for part in word_delimiter_parts(r):
                            wd_terms.append(part)
                            wd_doc.append(i)
                            wd_pos.append(p)
                            if so:
                                wd_off.append(offs_doc[j])
                    terms = low
            elif so:
                terms, positions, t_s, t_e = standard_analyzer_offsets(
                    text or "", self.stop)
                offs_doc = [(s << 32) | e for s, e in zip(t_s, t_e)]
                if drop_ch is not None:
                    mapped = [drop_ch(t) for t in terms]
                    keep = [m is not None for m in mapped]
                    terms = [m for m in mapped if m is not None]
                    positions = [p for p, k in zip(positions, keep) if k]
                    offs_doc = [o for o, k in zip(offs_doc, keep) if k]
            else:
                terms = analyze_fast(text or "") if use_fast else None
                if terms is None:
                    terms, positions = standard_analyzer(text or "", self.stop)
                    if drop_ch is not None:
                        mapped = [drop_ch(t) for t in terms]
                        keep = [m is not None for m in mapped]
                        terms = [m for m in mapped if m is not None]
                        positions = [p for p, k in zip(positions, keep) if k]
            if self.cjk and terms:
                from ..analysis.analyzers import cjk_bigram_stream

                pos_l = (positions if positions is not None
                         else list(range(len(terms))))
                terms, positions = cjk_bigram_stream(terms, pos_l)
            if self.common_grams and len(terms) > 1:
                # CommonGramsFilter.java:151 gramToken(): bigram stacks at
                # the first word's position spanning both tokens' offsets;
                # a stop-filter position hole breaks adjacency (no bigram)
                pos_l = (positions if positions is not None
                         else list(range(len(terms))))
                for b in range(1, len(terms)):
                    if pos_l[b] != pos_l[b - 1] + 1:
                        continue
                    t1, t2 = terms[b - 1], terms[b]
                    if t1 in self.common_grams or t2 in self.common_grams:
                        wd_terms.append(t1 + "_" + t2)
                        wd_doc.append(i)
                        wd_pos.append(pos_l[b - 1])
                        if so:
                            wd_off.append(
                                (offs_doc[b - 1] >> 32 << 32)
                                | (offs_doc[b] & 0xFFFFFFFF))
            if positions is not None:
                fallback_pos[i] = positions
            if so:
                flat_offs.extend(offs_doc)
            flat_terms.extend(terms)
            doclens[i] = len(terms)

        # position bound: query-time phrase matching packs (doc << 22) | pos,
        # so any position >= 2^22 would silently corrupt phrase results. Fail
        # loudly instead (the reference likewise rejects positions beyond
        # IndexWriter.MAX_POSITION rather than wrapping).
        _MAX_POS = (1 << 22) - 1
        if len(doclens) and int(doclens.max()) > _MAX_POS:
            raise ValueError(
                f"document exceeds max token positions ({_MAX_POS}); "
                "split or truncate it before indexing"
            )
        for plist in fallback_pos.values():
            if plist and plist[-1] > _MAX_POS:
                raise ValueError(
                    f"document position {plist[-1]} exceeds max {_MAX_POS}"
                )

        norm_bytes = int_to_byte4_vec(doclens)

        # keyword fields: one "column:value" term per doc, appended AFTER
        # doclen/norm computation so they never affect the text norms;
        # position -1 marks a non-positional posting
        kw_terms: list[str] = []
        kw_doc: list[int] = []
        for col in self.cfg.get("keyword_fields") or ():
            vals = batch[col].to_pylist()
            for i, v in enumerate(vals):
                if v is not None:
                    kw_terms.append(f"{col}:{v}")
                    kw_doc.append(i)

        # analyzed fields: each column tokenizes with its own chain; terms
        # are namespaced "column:term", positions are field-local, and each
        # token carries the FIELD's norm byte (per-field norms). Field
        # doclens feed the fdl_<col> docvalues sidecar for query-time norms
        # and per-field BM25 stats.
        af_parts: list[tuple] = []  # (terms_arr, doc_idx, pos, norm_bytes_tok)
        fdl_vals: dict[str, np.ndarray] = {}
        for col, stem_f, stop_f, f_ch, f_drops in self.analyzed:
            ftexts = batch[col].to_pylist()
            f_terms: list[str] = []
            f_pos_fallback: dict[int, list[int]] = {}
            f_lens = np.zeros(len(ftexts), dtype=np.int64)
            f_fast = stop_f is None and not f_drops
            for i, text in enumerate(ftexts):
                terms = analyze_fast(text or "") if f_fast else None
                if terms is None:
                    terms, positions = standard_analyzer(text or "", stop_f)
                    if f_drops:
                        # drop-capable per-field chain: position holes kept
                        kept = [(f_ch(t), p) for t, p in zip(terms, positions)]
                        kept = [(t2, p) for t2, p in kept if t2 is not None]
                        terms = [t2 for t2, _ in kept]
                        positions = [p for _, p in kept]
                    f_pos_fallback[i] = positions
                f_terms.extend(terms)
                f_lens[i] = len(terms)
            if len(f_lens) and int(f_lens.max()) > (1 << 22) - 1:
                raise ValueError(
                    f"field {col!r} exceeds max token positions; split it"
                )
            fdl_vals[f"fdl_{col}"] = f_lens.astype(np.float64)
            n_f = int(f_lens.sum())
            if not n_f:
                continue
            arr = np.asarray(f_terms, dtype=object)
            if (f_ch is not None and not f_drops) or stem_f is not None:
                # per-field 1:1 chain then stemmer, on uniques
                c, u = pd.factorize(arr)
                if f_ch is not None and not f_drops:
                    u = np.array([f_ch(x) for x in u], dtype=object)
                if stem_f is not None:
                    u = np.array([stem_f(x) for x in u], dtype=object)
                arr = u[c]
            c, u = pd.factorize(arr)
            u_pref = np.array([f"{col}:{x}" for x in u], dtype=object)
            arr = u_pref[c]
            f_doc = np.repeat(np.arange(len(ftexts), dtype=np.int32), f_lens)
            f_off = np.concatenate([[0], np.cumsum(f_lens)])
            f_pos = (np.arange(n_f, dtype=np.int64)
                     - np.repeat(f_off[:-1], f_lens)).astype(np.int32)
            for i, plist in f_pos_fallback.items():
                f_pos[f_off[i]:f_off[i + 1]] = plist
            f_norm = int_to_byte4_vec(f_lens)[f_doc]
            af_parts.append((arr, f_doc, f_pos, f_norm))

        parts: list[pa.Table] = []
        # --- assemble the token stream: text [+ synonym insertions] [+ kw]
        n_text = int(doclens.sum())
        text_arr = np.asarray(flat_terms, dtype=object)
        chain_11 = self.tf_chain if not self.tf_drops else None
        if (self.stem is not None or chain_11 is not None) and n_text:
            # apply the 1:1 filter chain, then the stemmer, each on UNIQUE
            # tokens once per batch (1:1 transforms leave doclen/norms/
            # positions untouched; chain order = stop -> filters -> stem)
            c, u = pd.factorize(text_arr)
            if chain_11 is not None:
                u = np.array([chain_11(x) for x in u], dtype=object)
            if self.stem is not None:
                u = np.array([self.stem(x) for x in u], dtype=object)
            text_arr = u[c]
        doc_idx_text = np.repeat(np.arange(len(texts), dtype=np.int32), doclens)
        doc_offsets = np.concatenate([[0], np.cumsum(doclens)])
        # implicit positions 0..n-1 per doc; fallback docs overwrite
        text_pos = (
            np.arange(n_text, dtype=np.int64)
            - np.repeat(doc_offsets[:-1], doclens)
        ).astype(np.int32)
        for i, plist in fallback_pos.items():
            text_pos[doc_offsets[i]:doc_offsets[i + 1]] = plist
        off_text = np.asarray(flat_offs, dtype=np.int64) if so else None

        # --- multi-word synonym graph (SynonymGraphFilter.java:81 +
        # FlattenGraphFilter.java:32). Two steps, both vectorized, run
        # BEFORE the other insertion blocks so every downstream consumer
        # sees the final (shifted) positions:
        #   1. match: each n-token LHS occurrence found by a shifted-
        #      equality scan (doc/pos contiguity checked at the endpoints
        #      only — positions strictly increase within a doc, so endpoint
        #      distance n-1 implies every internal gap is 1);
        #   2. flatten: a k-token RHS with k > n needs k-n extra position
        #      slots, so every real token AFTER the match site in the same
        #      doc shifts right by that amount (scatter extras at site
        #      ends, per-doc cumsum) — exactly the reference's flatten
        #      renumbering, which is why a phrase of [expansion token,
        #      following real token] matches while [LHS token, following
        #      real token] becomes sloppy-only (the known flatten
        #      "sausage" artifact TestFlattenGraphFilter pins down).
        #      RHS token j then lands at the (new) position of matched
        #      token min(j, n-1), continuing +1 per step past the match.
        # Overlapping matches all fire (the reference consumes greedily
        # left-to-right; a deliberate, documented divergence — rule sets
        # with overlapping LHS phrases may stack extra tokens).
        sg_terms: list = []
        sg_doc_parts: list = []
        sg_pos_parts: list = []
        sg_off_parts: list = []
        if self.syn_graph and n_text:
            L = n_text
            sites: list[tuple] = []   # (hits array, n, rhs_list)
            bump = np.zeros(L + 1, dtype=np.int64)
            for lhs, rhs_list in self.syn_graph.items():
                n = len(lhs)
                if L < n:
                    continue
                m = text_arr[:L - n + 1] == lhs[0]
                for j in range(1, n):
                    m &= text_arr[j:L - n + 1 + j] == lhs[j]
                if n > 1:
                    m &= doc_idx_text[n - 1:] == doc_idx_text[:L - n + 1]
                    m &= (text_pos[n - 1:] - text_pos[:L - n + 1]) == (n - 1)
                hits_sg = np.flatnonzero(m)
                if not len(hits_sg):
                    continue
                sites.append((hits_sg, n, rhs_list))
                extra = max(max(len(r) for r in rhs_list) - n, 0)
                if extra:
                    np.add.at(bump, hits_sg + n, extra)
            if sites:
                shift = np.cumsum(bump[:-1])
                # cumsum crosses doc boundaries; sites only affect later
                # tokens of their OWN doc, so subtracting each doc's
                # start value localizes the shift. Zero-token docs make
                # their (irrelevant) start offset collide with n_text —
                # clip: np.repeat drops them via doclens == 0 anyway
                doc_start = np.minimum(doc_offsets[:-1], L - 1)
                shift -= np.repeat(shift[doc_start], doclens)
                text_pos = (text_pos + shift).astype(np.int32)
                for hits_sg, n, rhs_list in sites:
                    for rhs in rhs_list:
                        for j, tok in enumerate(rhs):
                            srcs = hits_sg + min(j, n - 1)
                            sg_terms.extend([tok] * len(hits_sg))
                            sg_doc_parts.append(doc_idx_text[srcs])
                            sg_pos_parts.append(
                                (text_pos[srcs] + max(0, j - (n - 1))
                                 ).astype(np.int32))
                            if so:
                                sg_off_parts.append(off_text[srcs])
        n_sg = len(sg_terms)

        # synonym insertions: same doc, same position, zero length
        # contribution (posIncrement-0 stacked tokens)
        syn_terms: list = []
        syn_doc_parts: list = []
        syn_pos_parts: list = []
        syn_off_parts: list = []
        if self.syn and n_text:
            for key, additions in self.syn.items():
                occ = np.flatnonzero(text_arr == key)
                if not len(occ):
                    continue
                for s in additions:
                    syn_terms.extend([s] * len(occ))
                    syn_doc_parts.append(doc_idx_text[occ])
                    syn_pos_parts.append(text_pos[occ])
                    if so:
                        syn_off_parts.append(off_text[occ])
        n_syn = len(syn_terms)

        # EdgeNGram insertions (EdgeNGramTokenFilter.java:39): each final
        # text token additionally emits its leading grams, stacked at the
        # token's position (posInc 0, zero length contribution like
        # synonyms). Vectorized: occurrences grouped per unique via one
        # argsort; only the per-unique gram strings are Python.
        eg_terms: list = []
        eg_doc_parts: list = []
        eg_pos_parts: list = []
        eg_off_parts: list = []
        if self.edge_ngram and n_text:
            from ..analysis.filters import edge_grams

            lo_g, hi_g = self.edge_ngram
            c_eg, u_eg = pd.factorize(text_arr)
            order_eg = np.argsort(c_eg, kind="stable")
            counts_eg = np.bincount(c_eg, minlength=len(u_eg))
            starts_eg = np.concatenate([[0], np.cumsum(counts_eg)])
            for k, term in enumerate(u_eg):
                grams = edge_grams(term, lo_g, hi_g)
                if not grams:
                    continue
                occ = order_eg[starts_eg[k]:starts_eg[k + 1]]
                occ_rep = np.repeat(occ, len(grams))
                eg_terms.extend(grams * len(occ))
                eg_doc_parts.append(doc_idx_text[occ_rep])
                eg_pos_parts.append(text_pos[occ_rep])
                if so:
                    eg_off_parts.append(off_text[occ_rep])
        n_eg = len(eg_terms)

        if wd_terms and self.tf_chain is not None:
            # WDGF parts run through the same filter chain as the main
            # stream (the reference chains filters after WDGF's output)
            mapped = [self.tf_chain(t) for t in wd_terms]
            if self.tf_drops:
                keep = [m is not None for m in mapped]
                wd_terms = [m for m in mapped if m is not None]
                wd_doc = [d for d, k in zip(wd_doc, keep) if k]
                wd_pos = [p for p, k in zip(wd_pos, keep) if k]
                if so:
                    wd_off = [o for o, k in zip(wd_off, keep) if k]
            else:
                wd_terms = mapped
        if wd_terms and self.stem is not None:
            # the reference chains WDGF before the stemmer: parts stem too
            wd_terms = [self.stem(t) for t in wd_terms]
        n_wd = len(wd_terms)
        n_af = sum(len(p[0]) for p in af_parts)
        n_tok = n_text + n_syn + n_eg + n_sg + len(kw_terms) + n_wd + n_af
        if n_tok:
            all_parts = [text_arr]
            if n_syn:
                all_parts.append(np.asarray(syn_terms, dtype=object))
            if n_eg:
                all_parts.append(np.asarray(eg_terms, dtype=object))
            if n_sg:
                all_parts.append(np.asarray(sg_terms, dtype=object))
            if n_wd:
                all_parts.append(np.asarray(wd_terms, dtype=object))
            if kw_terms:
                all_parts.append(np.asarray(kw_terms, dtype=object))
            all_parts.extend(p[0] for p in af_parts)
            flat_all = np.concatenate(all_parts) if len(all_parts) > 1 else all_parts[0]
            doc_idx = np.concatenate(
                [doc_idx_text]
                + (syn_doc_parts if n_syn else [])
                + (eg_doc_parts if n_eg else [])
                + (sg_doc_parts if n_sg else [])
                + ([np.asarray(wd_doc, np.int32)] if n_wd else [])
                + ([np.asarray(kw_doc, np.int32)] if kw_terms else [])
                + [p[1] for p in af_parts]
            ).astype(np.int32)
            flat_pos = np.concatenate(
                [text_pos]
                + (syn_pos_parts if n_syn else [])
                + (eg_pos_parts if n_eg else [])
                + (sg_pos_parts if n_sg else [])
                + ([np.asarray(wd_pos, np.int32)] if n_wd else [])
                + ([np.zeros(len(kw_terms), np.int32)] if kw_terms else [])
                + [p[2] for p in af_parts]
            ).astype(np.int32)
            flat_off = None
            if so:
                # keyword / analyzed-field terms carry -1 (no text offsets)
                flat_off = np.concatenate(
                    [off_text]
                    + (syn_off_parts if n_syn else [])
                    + (eg_off_parts if n_eg else [])
                    + (sg_off_parts if n_sg else [])
                    + ([np.asarray(wd_off, np.int64)] if n_wd else [])
                    + ([np.full(len(kw_terms), -1, np.int64)]
                       if kw_terms else [])
                    + [np.full(len(p[0]), -1, np.int64) for p in af_parts]
                ).astype(np.int64)
            # per-token norm byte: text/synonym/edge-gram/word-delimiter/
            # keyword tokens carry the TEXT field's norm; analyzed-field
            # tokens carry THEIR field's
            flat_norm = np.concatenate(
                [norm_bytes[doc_idx_text]]
                + ([norm_bytes[np.concatenate(syn_doc_parts)]] if n_syn else [])
                + ([norm_bytes[np.concatenate(eg_doc_parts)]] if n_eg else [])
                + ([norm_bytes[np.concatenate(sg_doc_parts)]] if n_sg else [])
                + ([norm_bytes[np.asarray(wd_doc, np.int64)]] if n_wd else [])
                + ([norm_bytes[np.asarray(kw_doc, np.int64)]] if kw_terms else [])
                + [p[3] for p in af_parts]
            ).astype(np.uint8)
            codes, uniques = pd.factorize(flat_all)
            codes = codes.astype(np.int32)
            # sort tokens by (term, doc, position): explicit doc/pos keys —
            # synonym insertions append out of doc order, so input order
            # alone no longer guarantees contiguous (term, doc) runs
            order = np.lexsort((flat_pos, doc_idx, codes))
            s_codes = codes[order]
            s_doc = doc_idx[order]
            s_pos = flat_pos[order]
            s_off = flat_off[order] if so else None
            s_norm = flat_norm[order]
            # run-length per (term, doc)
            new_run = np.empty(n_tok, dtype=bool)
            new_run[0] = True
            new_run[1:] = (s_codes[1:] != s_codes[:-1]) | (s_doc[1:] != s_doc[:-1])
            starts = np.flatnonzero(new_run)
            td_code = s_codes[starts]
            td_docidx = s_doc[starts]
            td_freq = np.diff(np.append(starts, n_tok)).astype(np.int32)
            td_doc = keys[td_docidx]
            td_norm = s_norm[starts].astype(np.int32)
            td_shard = (td_doc % self.num_shards).astype(np.int32)

            # bucket: hash(term); head terms also carry a contiguous doc-range
            # subkey (sub = doc // span) — depends only on (term, doc), so it
            # is consistent across batches and parallelism levels, and the
            # per-(term, sub) doc intervals are disjoint AND ordered
            uniq_list = uniques.tolist()
            crcs = np.array([crc32(t.encode("utf-8")) for t in uniq_list], dtype=np.uint64)
            td_bucket = (crcs[td_code] % self.num_buckets).astype(np.int32)
            td_sub = np.zeros(len(td_code), dtype=np.int32)
            if self.head:
                is_head = np.array([t in self.head for t in uniq_list], dtype=bool)
                head_mask = is_head[td_code]
                if head_mask.any():
                    td_sub[head_mask] = (td_doc[head_mask] // self.sub_span).astype(np.int32)

            # second ordering: rows grouped per (term, shard), docs ascending
            # (sub ascends with doc inside a run, so runs split cleanly)
            order2 = np.lexsort((td_doc, td_shard, td_code))
            g_code = td_code[order2]
            g_shard = td_shard[order2]
            g_bucket = td_bucket[order2]
            g_sub = td_sub[order2]
            g_doc = td_doc[order2]
            g_freq = td_freq[order2]
            g_norm = td_norm[order2]

            row_break = np.empty(len(g_code), dtype=bool)
            row_break[0] = True
            row_break[1:] = (
                (g_code[1:] != g_code[:-1])
                | (g_shard[1:] != g_shard[:-1])
                | (g_sub[1:] != g_sub[:-1])
            )
            row_starts = np.flatnonzero(row_break)
            row_lens = np.diff(np.append(row_starts, len(g_code)))
            offsets = np.concatenate([[0], np.cumsum(row_lens)]).astype(np.int64)

            docs_col = pa.LargeListArray.from_arrays(offsets, pa.array(g_doc, pa.int64()))
            freqs_col = pa.LargeListArray.from_arrays(offsets, pa.array(g_freq, pa.int32()))
            norms_col = pa.LargeListArray.from_arrays(offsets, pa.array(g_norm, pa.int32()))

            if self.store_positions:
                # gather variable-length position segments into order2 layout
                seg_starts = starts  # per td row (ordering1), aligned with s_pos
                seg_lens = td_freq.astype(np.int64)
                sl2 = seg_lens[order2]
                ss2 = seg_starts[order2]
                total = int(sl2.sum())
                cum = np.concatenate([[0], np.cumsum(sl2)])
                ranges = np.repeat(ss2 - cum[:-1], sl2) + np.arange(total)
                pos_flat2 = s_pos[ranges]
                pos_offsets = cum[np.append(row_starts, len(g_code))]
                pos_offsets = np.concatenate([[0], pos_offsets[1:]]).astype(np.int64)
                pos_col = pa.LargeListArray.from_arrays(
                    pos_offsets, pa.array(pos_flat2, pa.int32())
                )
                if so:
                    # offsets ride the exact same per-occurrence layout
                    off_col = pa.LargeListArray.from_arrays(
                        pos_offsets, pa.array(s_off[ranges], pa.int64())
                    )
                else:
                    off_col = pa.array([None] * len(row_starts),
                                       pa.large_list(pa.int64()))
            else:
                pos_col = pa.array([None] * len(row_starts), pa.large_list(pa.int32()))
                off_col = pa.array([None] * len(row_starts),
                                   pa.large_list(pa.int64()))

            terms_col = pa.array(
                [uniq_list[c] for c in g_code[row_starts]], pa.large_string()
            )
            n_rows = len(row_starts)
            parts.append(
                pa.table(
                    {
                        "kind": pa.array(np.zeros(n_rows, np.int8)),
                        "shard": pa.array(g_shard[row_starts], pa.int32()),
                        "bucket": pa.array(g_bucket[row_starts], pa.int32()),
                        "sub": pa.array(g_sub[row_starts], pa.int32()),
                        "term": terms_col,
                        "docs": docs_col,
                        "freqs": freqs_col,
                        "norms": norms_col,
                        "positions": pos_col,
                        "offsets": off_col,
                        "dv": pa.array([None] * n_rows, pa.large_list(pa.float64())),
                        "sdv": pa.array([None] * n_rows, pa.large_list(pa.large_string())),
                    },
                    schema=STAGE1_SCHEMA,
                )
            )

        # doc rows: one per shard present in this batch
        dv_fields = tuple(self.cfg.get("docvalues_fields") or ())
        if dv_fields:
            dv_mat = np.stack(
                [fdl_vals[c] if c in fdl_vals
                 else batch[c].to_numpy(zero_copy_only=False).astype(np.float64)
                 for c in dv_fields], axis=1,
            )  # (n_docs, n_fields)
        sdv_fields = tuple(self.cfg.get("string_docvalues_fields") or ())
        ssdv_fields = tuple(self.cfg.get("sorted_set_docvalues_fields") or ())
        sndv_fields = tuple(
            self.cfg.get("sorted_numeric_docvalues_fields") or ())
        bdv_fields = tuple(self.cfg.get("binary_docvalues_fields") or ())
        if sdv_fields or ssdv_fields or sndv_fields or bdv_fields:
            # SORTED_SET transport: a doc's value set rides the same flat
            # strided sidecar as SORTED fields, joined by \x1f (US), deduped
            # + sorted (the reference stores per-doc ords in increasing
            # order); docs_explode splits it back into a list column
            sdv_cols = [
                np.asarray([x if x is not None else "" for x in batch[c].to_pylist()],
                           dtype=object)
                for c in sdv_fields
            ]
            for c in ssdv_fields:
                vals = batch[c].to_pylist()
                sdv_cols.append(np.asarray(
                    ["\x1f".join(sorted(set(v))) if isinstance(v, list)
                     else (v or "") for v in vals], dtype=object))
            for c in sndv_fields:
                # SORTED_NUMERIC transport: per-doc ASCENDING values as
                # \x1f-joined float hex (exact roundtrip); docs_explode
                # decodes back to a list<float64> column
                vals = batch[c].to_pylist()
                sdv_cols.append(np.asarray(
                    ["\x1f".join(float(x).hex() for x in sorted(v))
                     if isinstance(v, list)
                     else ("" if v is None else float(v).hex())
                     for v in vals], dtype=object))
            for c in bdv_fields:
                # BINARY transport: 'x'+hex, '' = missing (distinguishes
                # null from empty bytes); strings encode as utf-8
                vals = batch[c].to_pylist()
                sdv_cols.append(np.asarray(
                    ["" if v is None else "x" + (
                        v.encode("utf-8") if isinstance(v, str) else bytes(v)
                    ).hex() for v in vals], dtype=object))
            sdv_fields_all = sdv_fields + ssdv_fields + sndv_fields + bdv_fields
            sdv_mat = np.stack(sdv_cols, axis=1)  # (n_docs, n_sfields) object
        else:
            sdv_fields_all = ()
        shard_of_doc = (keys % self.num_shards).astype(np.int32)
        d_order = np.argsort(shard_of_doc, kind="stable")
        dk = keys[d_order]
        dl = doclens[d_order].astype(np.int32)
        dn = norm_bytes[d_order].astype(np.int32)
        dsh = shard_of_doc[d_order]
        brk = np.empty(len(dk), dtype=bool)
        if len(dk):
            brk[0] = True
            brk[1:] = dsh[1:] != dsh[:-1]
            rs = np.flatnonzero(brk)
            rl = np.diff(np.append(rs, len(dk)))
            off = np.concatenate([[0], np.cumsum(rl)]).astype(np.int64)
            nr = len(rs)
            if dv_fields:
                dv_sorted = dv_mat[d_order]  # row-aligned with dk
                dv_off = (off * len(dv_fields)).astype(np.int64)
                dv_col = pa.LargeListArray.from_arrays(
                    dv_off, pa.array(dv_sorted.ravel(), pa.float64())
                )
            else:
                dv_col = pa.array([None] * nr, pa.large_list(pa.float64()))
            if sdv_fields_all:
                sdv_sorted = sdv_mat[d_order]
                sdv_off = (off * len(sdv_fields_all)).astype(np.int64)
                sdv_col = pa.LargeListArray.from_arrays(
                    sdv_off, pa.array(sdv_sorted.ravel().tolist(), pa.large_string())
                )
            else:
                sdv_col = pa.array([None] * nr, pa.large_list(pa.large_string()))
            parts.append(
                pa.table(
                    {
                        "kind": pa.array(np.ones(nr, np.int8)),
                        "shard": pa.array(dsh[rs], pa.int32()),
                        "bucket": pa.array(np.zeros(nr, np.int32)),
                        "sub": pa.array(np.zeros(nr, np.int32)),
                        "term": pa.array([""] * nr, pa.large_string()),
                        "docs": pa.LargeListArray.from_arrays(off, pa.array(dk, pa.int64())),
                        "freqs": pa.LargeListArray.from_arrays(off, pa.array(dl, pa.int32())),
                        "norms": pa.LargeListArray.from_arrays(off, pa.array(dn, pa.int32())),
                        "positions": pa.array([None] * nr, pa.large_list(pa.int32())),
                        "offsets": pa.array([None] * nr, pa.large_list(pa.int64())),
                        "dv": dv_col,
                        "sdv": sdv_col,
                    },
                    schema=STAGE1_SCHEMA,
                )
            )
        if not parts:
            return STAGE1_SCHEMA.empty_table()
        return pa.concat_tables(parts)


def merge_flat_and_encode(
    row_terms: np.ndarray,      # object array, one term per input row
    row_lens: np.ndarray,       # int64 postings per row
    flat_docs: np.ndarray,      # int64, row-contiguous, sorted within a row
    flat_freqs: np.ndarray,     # int32, aligned with flat_docs
    flat_norms: np.ndarray,     # uint8, aligned with flat_docs
    flat_pos: np.ndarray | None,  # int32 positions, row-contiguous by freqs
    shard: int,
    flat_off: np.ndarray | None = None,  # int64 packed offsets, same layout
    field_formats: dict | None = None,   # PerFieldPostingsFormat hook
) -> pa.Table:
    """k-way merge + encode flat per-row postings (the shared core of the
    stage-B merge and the encoded-segments merge). Docs of one term across
    rows are disjoint (a doc lives in exactly one source row), so a single
    vectorized sort by (term, doc) yields the merged postings."""
    codes, uniques = pd.factorize(row_terms)
    flat_code = np.repeat(codes, row_lens)
    # sort postings by (lexical term rank, doc) in one pass; terms are emitted
    # in unsigned-UTF8 term order (the reference's BytesRef ordering contract)
    term_order = np.argsort(uniques.astype("U"), kind="stable")
    rank = np.empty(len(uniques), dtype=np.int64)
    rank[term_order] = np.arange(len(uniques))
    order = np.lexsort((flat_docs, rank[flat_code]))
    s_docs = flat_docs[order]
    s_freqs = flat_freqs[order]
    s_norms = flat_norms[order]
    s_rank = rank[flat_code][order]

    pos_arr = None
    off_arr = None
    if flat_pos is not None:
        # positions are per-posting variable segments keyed by freqs
        seg_lens = flat_freqs.astype(np.int64)
        seg_starts = np.concatenate([[0], np.cumsum(seg_lens)])[:-1]
        sl2 = seg_lens[order]
        ss2 = seg_starts[order]
        total = int(sl2.sum())
        cum = np.concatenate([[0], np.cumsum(sl2)])
        ranges = np.repeat(ss2 - cum[:-1], sl2) + np.arange(total)
        pos_arr = flat_pos[ranges]
        if flat_off is not None:
            off_arr = flat_off[ranges]

    if not len(s_rank):
        return POSTINGS_SCHEMA.empty_table()
    new_run = np.empty(len(s_rank), dtype=bool)
    new_run[0] = True
    new_run[1:] = s_rank[1:] != s_rank[:-1]
    run_starts = np.flatnonzero(new_run)
    terms_sorted = uniques[term_order]
    # drop term entries with no postings in this group (purged rows): runs
    # follow rank order by construction
    present = np.unique(s_rank)
    terms_sorted = terms_sorted[present]

    return encode_postings_group(
        np.asarray(terms_sorted, dtype=object),
        run_starts,
        s_docs,
        s_freqs,
        s_norms,
        pos_arr,
        shard,
        offs=off_arr,
        field_formats=field_formats,
    )


def encode_merge_group(group: pa.Table,
                       field_formats: dict | None = None) -> pa.Table:
    """map_groups fn for stage B: k-way merge + encode one (shard, bucket)
    from stage-1 list payloads."""
    if group.num_rows == 0:
        return POSTINGS_SCHEMA.empty_table()
    shard = int(group["shard"][0].as_py())
    row_terms = np.asarray(group["term"].to_pylist(), dtype=object)
    docs_ch = group["docs"].combine_chunks()
    row_lens = np.diff(docs_ch.offsets.to_numpy()).astype(np.int64)
    flat_docs = docs_ch.values.to_numpy(zero_copy_only=False).astype(np.int64)
    flat_freqs = group["freqs"].combine_chunks().values.to_numpy(zero_copy_only=False).astype(np.int32)
    flat_norms = group["norms"].combine_chunks().values.to_numpy(zero_copy_only=False).astype(np.uint8)
    pos_list = group["positions"].combine_chunks()
    flat_pos = None
    if pos_list.null_count < len(pos_list):
        flat_pos = pos_list.values.to_numpy(zero_copy_only=False).astype(np.int32)
    flat_off = None
    if "offsets" in group.column_names:
        off_list = group["offsets"].combine_chunks()
        if off_list.null_count < len(off_list):
            flat_off = off_list.values.to_numpy(
                zero_copy_only=False).astype(np.int64)
    return merge_flat_and_encode(
        row_terms, row_lens, flat_docs, flat_freqs, flat_norms, flat_pos,
        shard, flat_off=flat_off, field_formats=field_formats,
    )


def docs_explode(batch: pa.Table, dv_fields: tuple = (),
                 sdv_fields: tuple = (), ssdv_fields: tuple = (),
                 sndv_fields: tuple = (), bdv_fields: tuple = ()) -> pa.Table:
    """Stage C: doc list rows -> one row per document (+ docvalues columns).

    String docvalues columns are dictionary-encoded (the SORTED DocValues
    ordinal layout: per-column value dictionary + int ordinal per doc).
    SORTED_SET fields arrive as \\x1f-joined per-doc sets and become
    list<dictionary<string>> columns (value dict + per-doc ord list);
    SORTED_NUMERIC fields arrive as \\x1f-joined float hex and become
    list<float64> columns (ascending per doc)."""
    docs_ch = batch["docs"].combine_chunks()
    lens = np.diff(docs_ch.offsets.to_numpy()).astype(np.int64)
    shard = np.repeat(batch["shard"].to_numpy(zero_copy_only=False), lens)
    cols = {
        "shard": pa.array(shard, pa.int32()),
        "doc_id": pa.array(docs_ch.values.to_numpy(zero_copy_only=False), pa.int64()),
        "doclen": pa.array(
            batch["freqs"].combine_chunks().values.to_numpy(zero_copy_only=False), pa.int32()
        ),
        "norm": pa.array(
            batch["norms"].combine_chunks().values.to_numpy(zero_copy_only=False), pa.int32()
        ),
    }
    if dv_fields and "dv" in batch.column_names:
        flat = batch["dv"].combine_chunks().values.to_numpy(zero_copy_only=False)
        mat = flat.reshape(-1, len(dv_fields))
        for j, name in enumerate(dv_fields):
            cols[f"dv_{name}"] = pa.array(mat[:, j], pa.float64())
    all_s = (tuple(sdv_fields) + tuple(ssdv_fields) + tuple(sndv_fields)
             + tuple(bdv_fields))
    if all_s and "sdv" in batch.column_names:
        svals = batch["sdv"].combine_chunks().values
        n_f = len(all_s)
        for j, name in enumerate(all_s):
            # stride j::n_f over the flat string values; dictionary-encode
            idx = pa.array(np.arange(j, len(svals), n_f, dtype=np.int64))
            col = svals.take(idx)
            if name in sndv_fields:
                joined = col.to_pylist()
                lists = [[float.fromhex(x) for x in s.split("\x1f")]
                         if s else [] for s in joined]
                lens = np.asarray([len(v) for v in lists], dtype=np.int64)
                off = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
                flat = np.fromiter(
                    (x for v in lists for x in v), dtype=np.float64,
                    count=int(lens.sum()))
                cols[f"sndv_{name}"] = pa.LargeListArray.from_arrays(
                    pa.array(off), pa.array(flat, pa.float64()))
            elif name in ssdv_fields:
                lst = pc.split_pattern(col, "\x1f")
                offs = lst.offsets.to_numpy().astype(np.int64)
                lens = np.diff(offs)
                # an empty joined string means an empty set, not {""}
                emp = pc.equal(col, "").to_numpy(zero_copy_only=False)
                keep = np.repeat(~emp, lens)
                lens = np.where(emp, 0, lens)
                new_off = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
                vals = lst.values.filter(pa.array(keep))
                cols[f"ssdv_{name}"] = pa.LargeListArray.from_arrays(
                    pa.array(new_off), vals.dictionary_encode()
                )
            elif name in bdv_fields:
                joined = col.to_pylist()
                cols[f"bdv_{name}"] = pa.array(
                    [bytes.fromhex(s[1:]) if s else None for s in joined],
                    pa.large_binary())
            else:
                cols[f"sdv_{name}"] = col.dictionary_encode()
    return pa.table(cols)


def detect_head_terms(paths: list[str], text_col: str, cfg: IndexBuildConfig) -> list[str]:
    """Sampling pre-pass: terms whose token share exceeds head_df_ratio.

    The Zipf head is stable under sampling, so a few thousand docs suffice;
    the result is broadcast into the tokenize stage for consistent salting.
    """
    remaining = cfg.head_sample_docs
    counts: Counter = Counter()
    total = 0
    for p in paths:
        if remaining <= 0:
            break
        pf = pq.ParquetFile(p)
        for rb in pf.iter_batches(batch_size=min(remaining, 1024), columns=[text_col]):
            for text in rb.column(0).to_pylist():
                terms, _ = standard_analyzer(text or "", frozenset(cfg.stopwords) or None)
                counts.update(terms)
                total += len(terms)
            remaining -= rb.num_rows
            if remaining <= 0:
                break
    if not total:
        return []
    return [t for t, c in counts.items() if c / total >= cfg.head_df_ratio]


def expand_parquet_dirs(paths: list[str]) -> list[str]:
    """Expand directories to their parquet files (ray.data.read_parquet
    treats multi-path lists as file paths, not directories)."""
    import glob as _glob

    out: list[str] = []
    for p in paths:
        if os.path.isdir(p):
            out.extend(sorted(_glob.glob(os.path.join(p, "*.parquet"))))
        else:
            out.append(p)
    return out


def _atomic_write_json(path: str, obj: dict) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=1)
    os.replace(tmp, path)


def load_manifest(index_dir: str) -> dict | None:
    p = os.path.join(index_dir, "manifest.json")
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return None


def effective_batch_size(cfg: "IndexBuildConfig", paths: list[str]) -> int:
    """cfg.batch_size, or the auto heuristic (see IndexBuildConfig)."""
    if cfg.batch_size:
        return cfg.batch_size
    import ray as _ray

    try:
        n_rows = sum(pq.ParquetFile(p).metadata.num_rows for p in paths)
    except Exception:
        return 4096
    ncpu = int(_ray.cluster_resources().get("CPU", 4)) if _ray.is_initialized() else 8
    return int(min(16384, max(2048, n_rows // max(1, int(1.5 * ncpu)))))


def corpus_read_columns(cfg: "IndexBuildConfig", key_col: str,
                        text_col: str) -> list[str]:
    """Columns the tokenize stage must read from the corpus parquet.

    fdl_<col> docvalues are synthesized from analyzed-field token counts,
    not read from the corpus; the analyzed source columns are read instead.
    Shared by build_index and every incremental path (append/update)."""
    cols = [key_col, text_col] if not cfg.html_col else [key_col, text_col, cfg.html_col]
    cols += [c for c in (cfg.keyword_fields or ()) if c not in cols]
    synth = {f"fdl_{e[0]}" for e in (cfg.analyzed_fields or ())}
    cols += [c for c in (cfg.docvalues_fields or ())
             if c not in cols and c not in synth]
    cols += [e[0] for e in (cfg.analyzed_fields or ()) if e[0] not in cols]
    cols += [c for c in (cfg.string_docvalues_fields or ()) if c not in cols]
    cols += [c for c in (cfg.sorted_set_docvalues_fields or ()) if c not in cols]
    cols += [c for c in (cfg.sorted_numeric_docvalues_fields or ())
             if c not in cols]
    cols += [c for c in (cfg.binary_docvalues_fields or ()) if c not in cols]
    return cols


def _warm_fsspec_http() -> None:
    """Resolve the fsspec HTTP module import ONCE before any driver threads
    run concurrent Ray Data jobs. Ray's path resolution does
    `from fsspec.implementations.http import HTTPFileSystem` inside a
    ModuleNotFoundError guard; with aiohttp absent (this env), two threads
    importing it simultaneously can race into a PLAIN ImportError from a
    partially-initialized module, which escapes the guard and kills a
    build stage. Registering a stub module makes the import deterministic
    (and is semantically right: no HTTP filesystem can exist here)."""
    try:
        import fsspec.implementations.http  # noqa: F401
    except ImportError:
        import sys
        import types

        m = types.ModuleType("fsspec.implementations.http")

        class HTTPFileSystem:  # placeholder: aiohttp absent in this env
            pass

        m.HTTPFileSystem = HTTPFileSystem
        sys.modules.setdefault("fsspec.implementations.http", m)
    except Exception:
        pass


def build_index(
    paths: str | list[str],
    index_dir: str,
    key_col: str = "doc_id",
    text_col: str = "text",
    cfg: IndexBuildConfig | None = None,
    resume: bool = True,
) -> dict:
    """Build (or resume) an index over parquet corpus files. Returns manifest."""
    cfg = cfg or IndexBuildConfig()
    if isinstance(paths, str):
        paths = [paths]
    # directories expand to their parquet files (identity on plain files,
    # so existing manifests' source lists stay stable)
    paths = sorted(expand_parquet_dirs(sorted(paths)))
    os.makedirs(index_dir, exist_ok=True)

    fp = cfg.fingerprint()
    manifest = load_manifest(index_dir) if resume else None
    if manifest and manifest.get("config_fingerprint") == fp:
        if manifest.get("committed") and manifest.get("sources") == paths:
            return manifest  # identical committed build — reuse
        if any(manifest.get(k)
               for k in ("deletes", "shard_ids", "next_shard_offset")):
            # A same-config rebuild with a changed path list would rewrite
            # postings mode='overwrite' (dropping appended generations) and
            # the fresh manifest would lose deletes/shard state —
            # resurrecting tombstoned docs. Refuse: mutate via
            # append_index/update_documents, or use a fresh index_dir.
            raise ValueError(
                f"{index_dir} has appended generations or pending deletes; "
                "build_index(resume=True) cannot rebuild it in place"
            )
    else:
        manifest = None
    if manifest is None:
        # config changed (or resume disabled): ALL existing state — stage-1
        # checkpoints, segments, tombstones — belongs to a different index;
        # start the directory clean
        import shutil as _shutil

        for sub in ("stage1", "postings", "docs", "deletes"):
            _shutil.rmtree(os.path.join(index_dir, sub), ignore_errors=True)

    t0 = time.time()
    phases: dict[str, float] = {}
    lineage = dict(manifest["lineage"]) if manifest else {}
    head_terms = manifest["head_terms"] if manifest else detect_head_terms(paths, text_col, cfg)

    stage1_dir = os.path.join(index_dir, "stage1")
    chunks = [paths[i:i + cfg.files_per_chunk] for i in range(0, len(paths), cfg.files_per_chunk)]
    cfg_dict = asdict(cfg)

    # Resume safety: a changed file list can regroup the same source files
    # under NEW chunk ids. Stage-1 part dirs from chunk ids not in the
    # CURRENT grouping would double-index their documents if merged, so they
    # (and their lineage entries) are dropped before any work happens.
    current_ids = {
        f"c{ci:05d}_{crc32('|'.join(chunk).encode()):08x}"
        for ci, chunk in enumerate(chunks)
    }
    stale = set(lineage) - current_ids
    if stale or os.path.isdir(stage1_dir):
        import re as _re
        import shutil as _shutil

        # GC only BASE-build part ids (c%05d_%08x). Generation ('g*') and
        # add_indexes ('ax*') parts belong to the committed index, never to
        # this build's chunk grouping — deleting them would drop their docs.
        base_pat = _re.compile(r"^c\d{5}_[0-9a-f]{8}$")
        on_disk = (
            {d[len("part="):] for d in os.listdir(stage1_dir)
             if d.startswith("part=")}
            if os.path.isdir(stage1_dir) else set()
        )
        for cid in (on_disk - current_ids) | stale:
            if not base_pat.match(cid.removesuffix(".tmp")):
                continue
            _shutil.rmtree(os.path.join(stage1_dir, f"part={cid}"), ignore_errors=True)
        lineage = {k: v for k, v in lineage.items()
                   if k in current_ids or not base_pat.match(k)}

    # resolve the stage-1 checkpoint mode (see IndexBuildConfig)
    ckpt_mode = cfg.stage1_checkpoint
    if ckpt_mode == "auto":
        try:
            in_bytes = sum(os.path.getsize(p) for p in paths)
        except OSError:
            in_bytes = None
        store = ray.cluster_resources().get("object_store_memory", 0)
        # tokenized stage-1 in uncompressed Arrow runs several times the
        # raw parquet bytes; take the in-memory plan only when that fits
        # comfortably (half the store), else stream via parquet
        ckpt_mode = ("overlap" if in_bytes is not None and store
                     and in_bytes * 8 < store * 0.5 else "sync")

    import threading

    _warm_fsspec_http()

    ckpt_threads: list[threading.Thread] = []
    ckpt_lock = threading.Lock()
    ckpt_errors: list[BaseException] = []

    def _ckpt_write(ds_mat, tmp_dir, out_dir, chunk_id, chunk):
        # background checkpoint: stage B consumes the materialized blocks
        # while this parquet write lands; the chunk's lineage entry (and
        # manifest) commit only AFTER os.replace, so a crash mid-write
        # just re-tokenizes this chunk on resume
        try:
            ds_mat.write_parquet(tmp_dir, partition_cols=["kind"])
            os.replace(tmp_dir, out_dir)
            with ckpt_lock:
                lineage[chunk_id] = {"files": chunk, "ts": time.time()}
                _atomic_write_json(
                    os.path.join(index_dir, "manifest.json"),
                    {
                        "committed": False,
                        "config_fingerprint": fp,
                        "config": cfg_dict,
                        "sources": paths,
                        "head_terms": head_terms,
                        "lineage": dict(lineage),
                    },
                )
        except BaseException as e:  # noqa: BLE001 — best-effort checkpoint
            ckpt_errors.append(e)

    stage1_mats: dict[str, "ray.data.Dataset"] = {}
    _t = time.time()
    for ci, chunk in enumerate(chunks):
        chunk_id = f"c{ci:05d}_{crc32('|'.join(chunk).encode()):08x}"
        out_dir = os.path.join(stage1_dir, f"part={chunk_id}")
        # a lineage hit only counts while its stage-1 part is still on disk:
        # commit GCs stage-1, so extending a COMMITTED build via resume
        # re-tokenizes the old chunks (append_index is the incremental path)
        if chunk_id in lineage and os.path.isdir(out_dir):
            continue
        cols = corpus_read_columns(cfg, key_col, text_col)
        ds = ray.data.read_parquet(chunk, columns=cols)
        eff_bs = effective_batch_size(cfg, chunk)
        fn_kwargs = dict(
            key_col=key_col, text_col=text_col, cfg=cfg_dict, head_terms=head_terms
        )
        if cfg.use_actor_pool:
            import ray as _ray

            # cap the pool below the cluster CPU count: a pool reserving
            # every CPU starves the read/write tasks and the stage stalls
            ncpu = int(_ray.cluster_resources().get("CPU", 4))
            concurrency = min(
                cfg.tokenize_concurrency or max(2, ncpu - 2), max(2, ncpu - 2)
            )
            stage1 = ds.map_batches(
                TokenizeExplode,
                fn_constructor_kwargs=fn_kwargs,
                batch_format="pyarrow",
                batch_size=eff_bs,
                concurrency=concurrency,
            )
        else:
            stage1 = ds.map_batches(
                TokenizeExplode(**fn_kwargs),
                batch_format="pyarrow",
                batch_size=eff_bs,
            )
        tmp_dir = out_dir + ".tmp"
        if cfg.keep_stage1_in_memory or ckpt_mode in ("overlap", "off"):
            stage1 = stage1.materialize()
            stage1_mats[chunk_id] = stage1
        if ckpt_mode == "off":
            # no checkpoint: fastest, restarts from zero on a crash
            lineage[chunk_id] = {"files": chunk, "ts": time.time()}
            continue
        if ckpt_mode == "overlap":
            th = threading.Thread(
                target=_ckpt_write,
                args=(stage1, tmp_dir, out_dir, chunk_id, chunk),
                daemon=True)
            th.start()
            ckpt_threads.append(th)
            continue
        stage1.write_parquet(tmp_dir, partition_cols=["kind"])
        os.replace(tmp_dir, out_dir)
        lineage[chunk_id] = {"files": chunk, "ts": time.time()}
        # checkpoint after every chunk: a killed build resumes from here
        _atomic_write_json(
            os.path.join(index_dir, "manifest.json"),
            {
                "committed": False,
                "config_fingerprint": fp,
                "config": cfg_dict,
                "sources": paths,
                "head_terms": head_terms,
                "lineage": lineage,
            },
        )

    phases["stage1"] = time.time() - _t

    # assemble stage-1 inputs: chunks materialized this run stay in the
    # object store; previously-checkpointed chunks stream from parquet
    data_cols = ["shard", "bucket", "sub", "term", "docs", "freqs", "norms",
                 "positions", "dv", "sdv"]
    if cfg.store_offsets or cfg.payload_delimiter:
        data_cols.insert(data_cols.index("dv"), "offsets")

    def _from_disk(kind: int) -> list:
        if not os.path.isdir(stage1_dir):
            return []  # overlap/off: the background write may not have started
        part_dirs = sorted(
            os.path.join(stage1_dir, d) for d in os.listdir(stage1_dir)
            if d.startswith("part=") and not d.endswith(".tmp")
        )
        out = []
        for d in part_dirs:
            cid = os.path.basename(d)[len("part="):]
            if cid in stage1_mats:
                continue
            sub = os.path.join(d, f"kind={kind}")
            if os.path.exists(sub):
                out.append(sub)
        return out

    def _stage1_ds(kind: int):
        parts = []
        disk = _from_disk(kind)
        if disk:
            parts.append(ray.data.read_parquet(expand_parquet_dirs(disk)).select_columns(data_cols))
        for m in stage1_mats.values():
            parts.append(
                m.filter(expr=f"kind == {kind}").select_columns(data_cols)
            )
        ds0 = parts[0]
        for p in parts[1:]:
            ds0 = ds0.union(p)
        return ds0

    # stage B: the wide merge shuffle. Explicit shuffle partition count
    # (~2x CPUs) — the auto partitioning over many small blocks is
    # pathologically slow for this list-payload sort
    import ray as _ray

    ncpu = int(_ray.cluster_resources().get("CPU", 4))
    np_merge = int(os.environ.get('LSR_NP_MERGE', max(16, 2 * ncpu)))
    postings_dir = os.path.join(index_dir, "postings")
    from functools import partial

    ff = dict(cfg.field_postings_formats or ())

    # stage C: docs tables + collection stats — independent of stage B
    # (map-only over stage-1 kind=1), so it runs in a BACKGROUND thread
    # concurrently with the merge shuffle; stage D (points) and the stats
    # aggregate read stage C's output, so they ride the same thread
    docs_dir = os.path.join(index_dir, "docs")
    dv_fields = tuple(cfg.docvalues_fields or ())
    sdv_fields = tuple(cfg.string_docvalues_fields or ())
    ssdv_fields = tuple(cfg.sorted_set_docvalues_fields or ())
    sndv_fields = tuple(cfg.sorted_numeric_docvalues_fields or ())
    bdv_fields = tuple(cfg.binary_docvalues_fields or ())
    dds = _stage1_ds(1).map_batches(
        lambda t: docs_explode(t, dv_fields, sdv_fields, ssdv_fields,
                               sndv_fields, bdv_fields),
        batch_format="pyarrow"
    )

    stage_c_out: dict = {}
    stage_c_errors: list[BaseException] = []

    def _stage_c():
        try:
            _t = time.time()
            dds.write_parquet(docs_dir, partition_cols=["shard"],
                              mode="overwrite")
            phases["stageC"] = time.time() - _t

            if cfg.points_fields:
                # stage D: per-shard sorted points leaves (BKD substitute)
                from .points import build_points

                build_points(index_dir, range(cfg.num_shards),
                             cfg.points_fields)

            from ray.data.aggregate import Count, Sum

            _t2 = time.time()
            stats_row = (
                ray.data.read_parquet(docs_dir, columns=["doclen"])
                .aggregate(Count(), Sum("doclen", alias_name="sum_dl"))
            )
            stage_c_out["doc_count"] = int(stats_row["count()"])
            stage_c_out["sum_dl"] = int(stats_row["sum_dl"])
            phases["stats"] = time.time() - _t2
        except BaseException as e:  # noqa: BLE001 — re-raised on join
            stage_c_errors.append(e)

    stage_c_thread = threading.Thread(target=_stage_c, daemon=True)
    stage_c_thread.start()

    merged = _stage1_ds(0).groupby(["shard", "bucket", "sub"], num_partitions=np_merge).map_groups(
        partial(encode_merge_group, field_formats=ff or None),
        batch_format="pyarrow"
    )
    _t = time.time()
    merged.write_parquet(postings_dir, partition_cols=["shard"], mode="overwrite")
    phases["stageB"] = time.time() - _t
    if os.environ.get("LSR_BUILD_STATS"):
        print(merged.stats())

    stage_c_thread.join()
    if stage_c_errors:
        raise stage_c_errors[0]
    doc_count = stage_c_out["doc_count"]
    sum_dl = stage_c_out["sum_dl"]

    # overlap mode: every checkpoint write must land before the commit
    # manifest claims the lineage (and before stage-1 GC below)
    for th in ckpt_threads:
        th.join()
    if ckpt_errors:
        raise ckpt_errors[0]

    manifest = {
        "committed": True,
        "generation": int(time.time() * 1000),
        "config_fingerprint": fp,
        "config": cfg_dict,
        "sources": paths,
        "head_terms": head_terms,
        "lineage": lineage,
        "num_shards": cfg.num_shards,
        "stats": {"doc_count": doc_count, "sum_total_term_freq": sum_dl},
        "metrics": {"build_sec": time.time() - t0,
                    "docs_per_sec": doc_count / max(1e-9, time.time() - t0),
                    "phases": {k: round(v, 3) for k, v in phases.items()}},
    }
    _atomic_write_json(os.path.join(index_dir, "manifest.json"), manifest)
    if not cfg.retain_stage1:
        # committed: the checkpoint layer is dead weight now — maintenance
        # ops (force_merge/merge_generations/add_indexes) merge the ENCODED
        # tables and never re-read stage-1
        import shutil as _shutil

        _shutil.rmtree(stage1_dir, ignore_errors=True)
    return manifest
