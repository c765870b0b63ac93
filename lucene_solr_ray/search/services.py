"""Query-side services: stored-field fetch, highlighting, MoreLikeThis,
significant terms.

* fetch_stored — the reference's two-phase distributed fetch
  (QueryComponent STAGE_GET_FIELDS, SURVEY.md §3.3): score with narrow
  columns first, then fetch wide stored fields only for the winning ids via
  a pushed-down parquet filter.
* highlight — UnifiedHighlighter role: re-analyze only the matched docs,
  emit best-window snippets with <b> marks.
* more_like_this — MoreLikeThis.java:143: top tf-idf terms of a document
  become an OR query.
* significant_terms — SignificantTermsStream.java:59: foreground (matching
  docs) vs background term frequencies scored per term.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..analysis import standard_analyzer
from .query import Bool, Term
from .searcher import IndexSearcher


def fetch_stored(corpus_paths, key_col: str, doc_ids: list[int],
                 columns: list[str] | None = None) -> pa.Table:
    """Fetch stored fields for winning ids only (row-filter pushdown)."""
    import ray.data

    if not list(doc_ids):
        # typed empty result: callers zip key/text columns — a schema-less
        # pa.table({}) would KeyError on zero-hit queries
        import pyarrow.parquet as _pq

        from ..index.build import expand_parquet_dirs

        paths = [corpus_paths] if isinstance(corpus_paths, str) else list(corpus_paths)
        files = sorted(expand_parquet_dirs(sorted(paths)))
        schema = _pq.read_schema(files[0])
        cols = columns or list(schema.names)
        return pa.table({c: pa.array([], schema.field(c).type)
                         for c in cols})
    ds = ray.data.read_parquet(
        corpus_paths, columns=columns,
        filter=pc.field(key_col).isin(list(doc_ids)),
    )
    t = pa.concat_tables(
        [b for b in ds.iter_batches(batch_format="pyarrow", batch_size=8192)]
        or [pa.table({})]
    )
    return t


def highlight(text: str, query_terms: set[str], window: int = 10,
              pre: str = "<b>", post: str = "</b>") -> str:
    """Best-window snippet: the token window containing the most query-term
    hits, with matches wrapped."""
    terms, _ = standard_analyzer(text)
    if not terms:
        return ""
    hits = np.array([t in query_terms for t in terms], dtype=np.int32)
    if not hits.any():
        return " ".join(terms[:window])
    csum = np.concatenate([[0], np.cumsum(hits)])
    n = len(terms)
    w = min(window, n)
    scores = csum[w:] - csum[:-w] if n > w else np.array([csum[-1]])
    best = int(np.argmax(scores))
    out = []
    for i in range(best, min(best + w, n)):
        out.append(f"{pre}{terms[i]}{post}" if hits[i] else terms[i])
    return " ".join(out)


def highlight_results(searcher: IndexSearcher, corpus_paths, key_col: str,
                      text_col: str, query: str, k: int = 10) -> pa.Table:
    """search -> two-phase fetch -> snippet per hit."""
    from .query import query_terms as qt

    node = searcher._node(query)
    res = searcher.search(node, k=k)
    ids = res["doc_id"].to_pylist()
    stored = fetch_stored(corpus_paths, key_col, ids, columns=[key_col, text_col])
    lookup = dict(zip(stored[key_col].to_pylist(), stored[text_col].to_pylist()))
    qterms = set(qt(node))
    snips = [highlight(lookup.get(d, ""), qterms) for d in ids]
    return res.append_column("snippet", pa.array(snips, pa.string()))


def passage_from_offsets(text: str, spans: np.ndarray, max_chars: int = 160,
                         pre: str = "<b>", post: str = "</b>") -> str:
    """Best char-window passage from match spans (no re-analysis).

    spans: int64 array of packed (start << 32) | end match offsets. Picks
    the max_chars window starting at a match that contains the most match
    spans (PostingsHighlighter.java:185's passage scoring, simplified to a
    fixed-width window instead of BreakIterator sentences), widens to the
    surrounding whitespace, and wraps every contained match."""
    if not len(spans):
        return text[:max_chars]
    spans = np.unique(spans)            # sorted, dedup stacked tokens
    starts = (spans >> 32).astype(np.int64)
    ends = (spans & 0xFFFFFFFF).astype(np.int64)
    # window i covers matches [i, hi_i): those whose end fits in max_chars
    his = np.searchsorted(ends, starts + max_chars, side="right")
    counts = his - np.arange(len(spans))
    best = int(np.argmax(counts))       # ties -> earliest passage
    lo, hi = best, int(his[best])
    w_start, w_end = int(starts[lo]), int(ends[hi - 1])
    # widen to whitespace/text bounds without exceeding max_chars much
    pad = max(0, (max_chars - (w_end - w_start)) // 2)
    a = max(0, w_start - pad)
    b = min(len(text), w_end + pad)
    # trim the partial word at each pad edge (keep the context, snap to a
    # word boundary): first space after a, last space before b
    if a > 0:
        sp = text.find(" ", a, w_start)
        a = sp + 1 if sp != -1 else a
    if b < len(text):
        sp = text.rfind(" ", w_end, b)
        b = sp if sp != -1 else b
    out, cur = [], a
    for s, e in zip(starts[lo:hi], ends[lo:hi]):
        out.append(text[cur:s])
        out.append(pre + text[s:e] + post)
        cur = int(e)
    out.append(text[cur:b])
    return "".join(out)


def collect_offset_spans(searcher: IndexSearcher, qterms,
                         ids) -> dict[int, list]:
    """Per hit doc, the packed (start<<32)|end match spans of every query
    term, straight off the postings' per-occurrence offsets (store_offsets
    indexes). Empty lists when the index carries no offsets."""
    id_arr = np.asarray(sorted(ids), dtype=np.int64)
    spans: dict[int, list] = {int(d): [] for d in ids}
    for sh in searcher.reader.shards:
        for t in qterms:
            if not sh.term_rows(t):   # O(log V), not an O(V) set rebuild
                continue
            docs, freqs, offs = sh.postings(t, with_positions=True,
                                            payload_col="offsets")
            if not len(docs) or not len(offs):
                continue
            hit = np.isin(docs, id_arr)
            if not hit.any():
                continue
            occ_doc = np.repeat(docs, freqs)
            occ_hit = np.repeat(hit, freqs)
            for d, o in zip(occ_doc[occ_hit], offs[occ_hit]):
                if o >= 0:              # -1 = keyword/analyzed-field term
                    spans[int(d)].append(int(o))
    return spans


def collect_phrase_spans(searcher: IndexSearcher, phrase_terms,
                         ids) -> dict[int, list]:
    """Spans of EXACT phrase matches only (slop 0): per hit doc, the packed
    offsets of occurrences that participate in an adjacency match of the
    full term sequence — the UnifiedHighlighter's position-aware phrase
    highlighting (uhighlight/PhraseHelper.java:61), vs. wrapping every
    loose term occurrence."""
    id_arr = np.asarray(sorted(ids), dtype=np.int64)
    spans: dict[int, list] = {int(d): [] for d in ids}
    k = len(phrase_terms)
    for sh in searcher.reader.shards:
        if any(not sh.term_rows(t) for t in phrase_terms):
            continue
        # per term: {doc -> (positions, offsets)} restricted to hit docs
        per_term: list[dict[int, tuple]] = []
        for t in phrase_terms:
            docs, freqs, offs, poss = sh.postings(
                t, with_positions=True, payload_col=("offsets", "positions"))
            if not len(docs) or len(offs) != len(poss):
                per_term.append({})
                continue
            hit = np.isin(docs, id_arr)
            bounds = np.concatenate([[0], np.cumsum(freqs)])
            m = {}
            for r in np.flatnonzero(hit):
                s, e = bounds[r], bounds[r + 1]
                m[int(docs[r])] = (poss[s:e], offs[s:e])
            per_term.append(m)
        docs_all = set(per_term[0]) if per_term and per_term[0] else set()
        for d in docs_all:
            if any(d not in pt for pt in per_term):
                continue
            p0, o0 = per_term[0][d]
            ok = np.ones(len(p0), dtype=bool)
            sels = []
            for j in range(1, k):
                pj, _ = per_term[j][d]
                idx = np.searchsorted(pj, p0 + j)
                idxc = np.minimum(idx, len(pj) - 1)
                ok &= pj[idxc] == p0 + j
                sels.append(idxc)
            if not ok.any():
                continue
            out = spans[d]
            out.extend(int(o) for o in o0[ok] if o >= 0)
            for j, sel in enumerate(sels, start=1):
                _, oj = per_term[j][d]
                out.extend(int(o) for o in oj[sel[ok]] if o >= 0)
    return spans


def _query_phrases(node, searcher: "IndexSearcher | None" = None
                   ) -> tuple[list[tuple], list[str]]:
    """(exact phrases, loose terms) of a query tree — shared by the
    offsets-source and term-vector highlighters so both pick identical
    span sets for identical queries. When a searcher is given, multi-term
    nodes (prefix/wildcard/regexp/fuzzy/range) expand against the index
    dictionary, the UnifiedHighlighter's automata extraction
    (uhighlight/UnifiedHighlighter.java:132 MultiTermHighlighting role) —
    so 'fa*' highlights every matching surface form."""
    from .query import (Bool, ConstantScore, DisMax, Fuzzy, Phrase, Prefix,
                        Regexp, TermRange, Wildcard)
    from .query import query_terms as qt

    phrases: list[tuple] = []
    multiterm: list = []

    def _walk(n):
        if isinstance(n, Phrase) and n.slop == 0:
            phrases.append(tuple(n.terms))
        elif isinstance(n, (Prefix, Wildcard, Regexp, Fuzzy, TermRange)):
            multiterm.append(n)
        elif isinstance(n, ConstantScore):
            _walk(n.query)
        elif isinstance(n, DisMax):
            for c in n.clauses:
                _walk(c)
        elif isinstance(n, Bool):
            for c in n.must + n.should + n.filter:
                _walk(c)
    _walk(node)
    loose = set(qt(node))
    if multiterm and searcher is not None:
        from .multiterm import expand_terms

        for sh in searcher.reader.shards:
            for mt in multiterm:
                loose.update(expand_terms(sh.terms, mt))
    in_phrase = {t for p in phrases for t in p}
    return phrases, sorted(loose - in_phrase)


def highlight_results_tv(searcher: IndexSearcher, index_dir: str,
                         corpus_paths, key_col: str, text_col: str,
                         query: str, k: int = 10,
                         max_chars: int = 160) -> pa.Table:
    """search -> fetch stored -> snippet from TERM-VECTOR offsets per hit.

    The FastVectorHighlighter path (vectorhighlight/FastVectorHighlighter
    .java:45): match spans come from the per-doc term-vector sidecar's
    occurrence positions + char offsets (FieldTermStack.java:49 reads the
    same data from Lucene's tv files), so neither the postings nor the
    stored body is re-analyzed — the reference's trade: term vectors cost
    index space but highlight any query shape without touching the
    inverted index. Requires build_term_vectors(...,
    with_positions_offsets=True). Exact phrases highlight position-aware
    (only participating occurrences), like the FVH's phraseHighlight=true
    default; passage selection shares passage_from_offsets with the
    offsets-source highlighter, so identical span sets produce identical
    snippets (pytest parity)."""
    from ..index.termvectors import term_vectors_po_for

    node = searcher._node(query)
    res = searcher.search(node, k=k)
    ids = res["doc_id"].to_pylist()
    stored = fetch_stored(corpus_paths, key_col, ids,
                          columns=[key_col, text_col])
    lookup = dict(zip(stored[key_col].to_pylist(),
                      stored[text_col].to_pylist()))
    phrases, qterms = _query_phrases(node, searcher)
    nshards = getattr(searcher.reader, "num_shards", None)
    tv = term_vectors_po_for(index_dir, ids, num_shards=nshards)
    spans: dict[int, list] = {int(d): [] for d in ids}
    for d, per_term in tv.items():
        out = spans[d]
        for t in qterms:
            if t in per_term:
                out.extend(int(o) for o in per_term[t][1] if o >= 0)
        for p in phrases:
            if any(t not in per_term for t in p):
                continue
            p0, o0 = per_term[p[0]]
            ok = np.ones(len(p0), dtype=bool)
            sels = []
            for j in range(1, len(p)):
                pj, _ = per_term[p[j]]
                idx = np.searchsorted(pj, p0 + j)
                idxc = np.minimum(idx, len(pj) - 1)
                ok &= pj[idxc] == p0 + j
                sels.append(idxc)
            if not ok.any():
                continue
            out.extend(int(o) for o in o0[ok] if o >= 0)
            for j, sel in enumerate(sels, start=1):
                _, oj = per_term[p[j]]
                out.extend(int(o) for o in oj[sel[ok]] if o >= 0)
    from .query import query_terms as qt

    snips = []
    for d in ids:
        text = lookup.get(d, "")
        sp = spans.get(int(d)) or []
        if sp:
            snips.append(passage_from_offsets(
                text, np.asarray(sp, np.int64), max_chars))
        else:
            snips.append(highlight(text, set(qt(node))))
    return res.append_column("snippet", pa.array(snips, pa.string()))


def highlight_results_offsets(searcher: IndexSearcher, corpus_paths,
                              key_col: str, text_col: str, query: str,
                              k: int = 10, max_chars: int = 160) -> pa.Table:
    """search -> fetch stored -> snippet from INDEXED OFFSETS per hit.

    The UnifiedHighlighter OffsetSource.POSTINGS path (uhighlight/
    UnifiedHighlighter.java:132, postingshighlight/PostingsHighlighter.java:47):
    match spans come straight off the postings' per-occurrence offsets
    (store_offsets indexes), so no matched doc is ever re-analyzed — the
    win the reference gets for large stored bodies. Falls back to the
    re-analyze path per doc when a hit has no offset spans (e.g. index
    built without store_offsets)."""
    from .query import query_terms as qt

    from .query import Bool, ConstantScore, DisMax, Phrase

    node = searcher._node(query)
    res = searcher.search(node, k=k)
    ids = res["doc_id"].to_pylist()
    stored = fetch_stored(corpus_paths, key_col, ids,
                          columns=[key_col, text_col])
    lookup = dict(zip(stored[key_col].to_pylist(),
                      stored[text_col].to_pylist()))
    # exact phrases highlight position-aware (only participating
    # occurrences); everything else falls back to loose term spans
    phrases, qterms = _query_phrases(node, searcher)
    spans = collect_offset_spans(searcher, qterms, ids) if qterms \
        else {int(d): [] for d in ids}
    for p in phrases:
        for d, sp in collect_phrase_spans(searcher, p, ids).items():
            spans[d].extend(sp)
    snips = []
    for d in ids:
        text = lookup.get(d, "")
        sp = spans.get(d) or []
        if sp:
            snips.append(passage_from_offsets(
                text, np.asarray(sp, np.int64), max_chars))
        else:
            snips.append(highlight(text, set(qt(node))))
    return res.append_column("snippet", pa.array(snips, pa.string()))


def more_like_this(searcher: IndexSearcher, doc_text: str, max_terms: int = 10,
                   min_df: int = 2, k: int = 10) -> pa.Table:
    """Build an OR query from the doc's top tf-idf terms and run it."""
    terms, _ = standard_analyzer(doc_text)
    if not terms:
        return searcher.search(Bool(), k=k)
    uniq, counts = np.unique(np.asarray(terms, dtype=object), return_counts=True)
    N = searcher.reader.doc_count
    scored = []
    for t, tf in zip(uniq.tolist(), counts.tolist()):
        df, _ = searcher.reader.term_stats(t)
        if df < min_df:
            continue
        idf = np.log(1 + (N - df + 0.5) / (df + 0.5))
        scored.append((tf * idf, t))
    scored.sort(reverse=True)
    sel = [t for _, t in scored[:max_terms]]
    if not sel:
        return searcher.search(Bool(), k=k)
    return searcher.search(Bool(should=[Term(t) for t in sel], min_should=1), k=k)


def suggest(searcher: IndexSearcher, prefix: str, k: int = 5) -> list[tuple[str, int]]:
    """Prefix suggester (AnalyzingSuggester role): dictionary terms starting
    with the prefix, ranked by global df desc then term asc. The FST is
    replaced by the sorted-term-table range scan."""
    from .multiterm import expand_terms
    from .query import Prefix

    seen: set[str] = set()
    for s in searcher.reader.shards:
        seen.update(expand_terms(s.terms, Prefix(prefix.lower())))
    ranked = sorted(
        ((searcher.reader.term_stats(t)[0], t) for t in seen),
        key=lambda x: (-x[0], x[1]),
    )
    return [(t, df) for df, t in ranked[:k]]


def infix_suggest(searcher: IndexSearcher, fragment: str, k: int = 5) -> list[tuple[str, int]]:
    """AnalyzingInfixSuggester role (suggest/analyzing/
    AnalyzingInfixSuggester.java:106): dictionary terms CONTAINING the
    fragment anywhere, ranked by global df desc then term asc. The
    reference's sidecar search index over suggestions is replaced by a
    vectorized substring scan of the resident sorted term dictionary."""
    frag = fragment.lower()
    seen: set[str] = set()
    for s in searcher.reader.shards:
        if not len(s.terms):
            continue
        arr = s.terms.astype("U")
        hit = np.char.find(arr, frag) >= 0
        seen.update(arr[hit].tolist())
    ranked = sorted(
        ((searcher.reader.term_stats(t)[0], t) for t in seen),
        key=lambda x: (-x[0], x[1]),
    )
    return [(t, df) for df, t in ranked[:k]]


def _analyze_key(text: str) -> list[str]:
    """Suggester key analysis: the ASCII fast path, falling back to the
    general analyzer on non-ASCII input (analyze_fast returns None there)."""
    from ..analysis.analyzers import analyze_fast, standard_analyzer

    toks = analyze_fast(text)
    if toks is None:
        toks, _ = standard_analyzer(text)
    return toks


class CompletionSuggester:
    """Weighted completion suggester (suggest/analyzing/
    AnalyzingSuggester.java:121 role): a (suggestion, weight) dictionary
    queried by analyzed prefix, top-k by weight desc then suggestion asc.

    The FST is replaced by one sorted array + searchsorted prefix range
    (same substitution as the term dictionary). Ray-native use at scale:
    build once, ray.put(self), look up inside map_batches tasks."""

    def __init__(self, entries: list[tuple[str, int]]):
        keys = []
        for text, w in entries:
            keys.append((" ".join(_analyze_key(text or "")), str(text), int(w)))
        keys.sort()
        self._keys = np.asarray([x[0] for x in keys], dtype="U")
        self._texts = np.asarray([x[1] for x in keys], dtype=object)
        self._weights = np.asarray([x[2] for x in keys], dtype=np.int64)

    def suggest(self, prefix: str, k: int = 5) -> list[tuple[str, int]]:
        key = " ".join(_analyze_key(prefix or ""))
        if not key:
            return []
        lo = np.searchsorted(self._keys, key, side="left")
        hi = np.searchsorted(self._keys, key + "￿", side="right")
        if hi <= lo:
            return []
        w = self._weights[lo:hi]
        t = self._texts[lo:hi]
        order = np.lexsort((t.astype("U"), -w))[:k]
        return [(str(t[i]), int(w[i])) for i in order]


class BlendedInfixSuggester:
    """BlendedInfixSuggester (suggest/analyzing/
    BlendedInfixSuggester.java:50): infix lookup over weighted suggestion
    phrases where the score blends the stored weight with the POSITION of
    the first matched token:

        POSITION_LINEAR                  weight * (1 - 0.10 * position)
        POSITION_RECIPROCAL              weight / (1 + position)
        POSITION_EXPONENTIAL_RECIPROCAL  weight / (1 + position)**exponent

    (coefficient rules :88-93, LINEAR_COEF :62). Matching is
    analyzed-token prefix-of-any-token (the reference's infix search over
    the suggestion sidecar index); the sidecar is replaced by the resident
    tokenized entry table — build once, ray.put for map_batches use."""

    def __init__(self, entries: list[tuple[str, int]],
                 blender: str = "linear", exponent: float = 2.0):
        self._texts = [str(t) for t, _ in entries]
        self._weights = [int(w) for _, w in entries]
        self._toks = [_analyze_key(t or "") for t, _ in entries]
        # build-once lookup state (suggest runs per keystroke): first
        # occurrence position per token, per entry
        self._first_pos = [
            {t: i for i, t in reversed(list(enumerate(toks)))}
            for toks in self._toks
        ]
        self.blender = blender
        self.exponent = float(exponent)

    def _coef(self, position: int) -> float:
        if self.blender == "linear":
            return max(0.0, 1.0 - 0.10 * position)
        if self.blender == "reciprocal":
            return 1.0 / (1.0 + position)
        return 1.0 / (1.0 + position) ** self.exponent

    def suggest(self, fragment: str, k: int = 5) -> list[tuple[str, float]]:
        frags = _analyze_key(fragment or "")
        if not frags:
            return []
        # every token but the last must match EXACTLY; the last (being
        # typed) is a prefix — the reference ANDs all query terms
        # (AnalyzingInfixSuggester.finishQuery)
        exact, last = frags[:-1], frags[-1]
        out = []
        for text, w, toks, fp in zip(self._texts, self._weights,
                                     self._toks, self._first_pos):
            if any(e not in fp for e in exact):
                continue
            pos = next((i for i, t in enumerate(toks)
                        if t.startswith(last)), None)
            if pos is None:
                continue
            # coefficient from the FIRST matched query token's position
            # (BlendedInfixSuggester.createCoefficient scans for the first
            # matching term, :201-230)
            first_pos = min([pos] + [fp[e] for e in exact])
            out.append((w * self._coef(first_pos), text))
        out.sort(key=lambda x: (-x[0], x[1]))
        return [(t, s) for s, t in out[:k]]


def spell_correct(searcher: IndexSearcher, word: str, max_edits: int = 2,
                  k: int = 3) -> list[tuple[str, int]]:
    """DirectSpellChecker role: dictionary terms within edit distance,
    ranked by df desc (more frequent spelling wins), distance asc."""
    from .multiterm import _levenshtein_leq, expand_terms
    from .query import Fuzzy

    seen: set[str] = set()
    for s in searcher.reader.shards:
        seen.update(expand_terms(s.terms, Fuzzy(word.lower(), max_edits)))
    def dist(t):
        for d in range(max_edits + 1):
            if _levenshtein_leq(t, word.lower(), d):
                return d
        return max_edits
    ranked = sorted(
        ((dist(t), -searcher.reader.term_stats(t)[0], t) for t in seen if t != word.lower()),
    )
    return [(t, -negdf) for d, negdf, t in ranked[:k]]


def word_break_suggest(searcher: IndexSearcher, word: str,
                       max_changes: int = 1, min_freq: int = 1,
                       min_break_len: int = 1,
                       max_suggestions: int = 5,
                       sort: str = "max") -> pa.Table:
    """WordBreakSpellChecker.suggestWordBreaks (suggest/spell/
    WordBreakSpellChecker.java:92,258): split a run-together word into
    dictionary words — each split point's left side must be a dictionary
    term with freq >= min_freq and length >= min_break_len; up to
    max_changes breaks, recursing into the remainder. Ranked by
    (fewer breaks, then max — or 'sum' — part frequency desc,
    BreakSuggestionSortMethod :65-72).

    Returns (suggestion, breaks, freq)."""
    w = word.lower()
    df_of = lambda t: searcher.reader.term_stats(t)[0]  # noqa: E731
    results: list[tuple[list[str], int]] = []

    def rec(rest: str, parts: list[str]):
        breaks = len(parts)
        if breaks >= 1 and len(rest) >= min_break_len:
            f = df_of(rest)
            if f >= min_freq:
                results.append((parts + [rest], breaks))
        if breaks >= max_changes:
            return
        for i in range(min_break_len, len(rest) - min_break_len + 1):
            left = rest[:i]
            if df_of(left) >= min_freq:
                rec(rest[i:], parts + [left])

    rec(w, [])
    agg = max if sort == "max" else sum
    scored = [(" ".join(parts), breaks,
               int(agg(df_of(p) for p in parts)))
              for parts, breaks in results]
    scored.sort(key=lambda x: (x[1], -x[2], x[0]))
    scored = scored[:max_suggestions]
    return pa.table({
        "suggestion": pa.array([s for s, _, _ in scored], pa.string()),
        "breaks": pa.array([b for _, b, _ in scored], pa.int64()),
        "freq": pa.array([f for _, _, f in scored], pa.int64()),
    })


def word_combine_suggest(searcher: IndexSearcher, terms: list[str],
                         max_changes: int = 1, min_freq: int = 1,
                         max_suggestions: int = 5) -> pa.Table:
    """WordBreakSpellChecker.suggestWordCombinations (:197-221): join runs
    of adjacent query terms (up to max_changes joins) whose concatenation
    is a dictionary word with freq >= min_freq.

    Returns (combined, start, end, freq) ranked by freq desc."""
    df_of = lambda t: searcher.reader.term_stats(t)[0]  # noqa: E731
    out = []
    for i in range(len(terms)):
        comb = terms[i].lower()
        for j in range(i + 1, min(len(terms), i + 1 + max_changes)):
            comb = comb + terms[j].lower()
            f = df_of(comb)
            if f >= min_freq:
                out.append((comb, i, j, int(f)))
    out.sort(key=lambda x: (-x[3], x[0]))
    out = out[:max_suggestions]
    return pa.table({
        "combined": pa.array([c for c, *_ in out], pa.string()),
        "start": pa.array([s for _, s, _, _ in out], pa.int64()),
        "end": pa.array([e for _, _, e, _ in out], pa.int64()),
        "freq": pa.array([f for *_, f in out], pa.int64()),
    })


def spell_collate(searcher: IndexSearcher, query: str,
                  max_collations: int = 3, max_tries: int = 10,
                  max_edits: int = 2) -> pa.Table:
    """SpellCheckCollator (solr/core/.../spelling/SpellCheckCollator.java:62):
    substitute the top spelling corrections for each unknown query term
    back into the ORIGINAL query string, re-run each candidate collation,
    and keep only collations that produce hits — ranked by hit count desc
    (the reference's collation verification loop, :96-170).

    Returns (collation, hits)."""
    import itertools
    import re as _re

    ops = {"AND", "OR", "NOT", "TO"}
    words = _re.findall(r"[A-Za-z][A-Za-z0-9]*", query)
    bad = []
    for w in dict.fromkeys(words):
        if w in ops:
            continue
        if searcher.reader.term_stats(w.lower())[0] == 0:
            bad.append(w)
    if not bad:
        return pa.table({"collation": pa.array([], pa.string()),
                         "hits": pa.array([], pa.int64())})
    cand = {w: [c for c, _ in spell_correct(searcher, w, max_edits, k=3)]
            or [w] for w in bad}
    out = []
    tries = 0
    for combo in itertools.product(*(cand[w] for w in bad)):
        if tries >= max_tries:
            break
        tries += 1
        collation = query
        for w, rep in zip(bad, combo):
            collation = _re.sub(rf"\b{_re.escape(w)}\b", rep, collation)
        hits = searcher.count(collation)
        if hits > 0:
            out.append((collation, hits))
    out.sort(key=lambda x: (-x[1], x[0]))
    out = out[:max_collations]
    return pa.table({
        "collation": pa.array([c for c, _ in out], pa.string()),
        "hits": pa.array([h for _, h in out], pa.int64()),
    })


def search_sorted_by_expression(searcher: IndexSearcher, query, expr: str,
                                k: int = 10,
                                descending: bool = True) -> pa.Table:
    """Expression SortField (lucene/expressions/.../ExpressionSortField —
    the compiled-bindings sort the expressions module feeds into Sort):
    top-k matching docs ordered by a compiled arithmetic expression over
    score / doclen / doc_id / NUMERIC docvalues. Ties break by doc_id asc
    (the TopFieldCollector rule)."""
    from .executor import eval_node, resolve_weights
    from .expressions import compile_expression

    node = searcher._node(query)
    weights = resolve_weights(searcher.reader, node, searcher.params,
                              searcher.dtype)
    fn = compile_expression(expr)
    all_docs, all_vals = [], []
    for s in searcher.reader.shards:
        docs, scores = eval_node(s, node, weights, searcher.dtype)
        if not len(docs):
            continue
        idx = np.searchsorted(s.doc_ids, docs)
        env = {"score": scores.astype(np.float64),
               "doclen": s.doclens[idx].astype(np.float64),
               "doc_id": docs.astype(np.float64)}
        for name, vals in s.docvalues.items():
            if name in fn.variables:
                env[name] = vals[idx]
        all_docs.append(docs)
        all_vals.append(np.asarray(fn(env), dtype=np.float64))
    if not all_docs:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "sort_value": pa.array([], pa.float64())})
    docs = np.concatenate(all_docs)
    vals = np.concatenate(all_vals)
    order = np.lexsort((docs, -vals if descending else vals))[:k]
    return pa.table({
        "doc_id": pa.array(docs[order], pa.int64()),
        "sort_value": pa.array(vals[order], pa.float64()),
    })


def search_sorted_by_field(searcher: IndexSearcher, query: str, field: str,
                           k: int = 10, descending: bool = True,
                           selector: str = "min",
                           early_terminate: bool = False,
                           stats: dict | None = None) -> "pa.Table":
    """TopFieldCollector role: top-k matching docs ordered by a docvalues
    column instead of score. Supported per-shard fields: doclen, doc_id,
    NUMERIC docvalues, SORTED string docvalues (TopFieldCollector.java:42
    over Lucene80DocValuesFormat SORTED ords — per-shard comparisons run on
    int ordinals; the cross-shard merge compares the string values), and
    SORTED_NUMERIC docvalues reduced per doc by `selector` ("min"|"max",
    SortedNumericSelector.java:34; docs with no values sort last)."""
    node = searcher._node(query)
    from .executor import eval_node, resolve_weights

    weights = resolve_weights(searcher.reader, node, searcher.params, searcher.dtype)
    is_string = any(field in s.sorted_dv for s in searcher.reader.shards)
    is_sndv = not is_string and any(
        field in getattr(s, "sorted_numeric_dv", {})
        for s in searcher.reader.shards)
    if early_terminate and not is_string and not is_sndv:
        return _early_terminated_sorted_search(
            searcher, node, weights, field, k, descending, stats)
    all_docs, all_vals = [], []
    for s in searcher.reader.shards:
        docs, _ = eval_node(s, node, weights, searcher.dtype)
        if not len(docs):
            continue
        if is_string:
            vals = s.strings_for(field, docs)
        elif is_sndv:
            fvals, offs = s.sorted_numeric_dv[field]
            idx = np.searchsorted(s.doc_ids, docs)
            lens = np.diff(offs)[idx]
            # values ascend within a doc: min = first, max = last
            sel = offs[:-1][idx] if selector == "min" else offs[1:][idx] - 1
            missing = np.inf if not descending else -np.inf  # sort last
            vals = np.where(lens > 0,
                            fvals[np.clip(sel, 0, max(len(fvals) - 1, 0))],
                            missing)
        elif field == "doclen":
            idx = np.searchsorted(s.doc_ids, docs)
            vals = s.doclens[idx]
        elif field == "doc_id":
            vals = docs
        elif field in getattr(s, "docvalues", {}):
            idx = np.searchsorted(s.doc_ids, docs)
            vals = s.docvalues[field][idx]
        else:
            raise ValueError(f"unknown sort field {field!r}")
        all_docs.append(docs)
        all_vals.append(vals)
    if not all_docs:
        typ = (pa.string() if is_string
               else pa.float64() if is_sndv else pa.int64())
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         field: pa.array([], typ)})
    docs = np.concatenate(all_docs)
    if is_string:
        vals = np.concatenate(all_vals)
        # ranks give a descending-capable integer key for string values
        u, inv = np.unique(vals, return_inverse=True)
        order = np.lexsort((docs, -inv if descending else inv))[:k]
        return pa.table({"doc_id": pa.array(docs[order], pa.int64()),
                         field: pa.array(vals[order].tolist(), pa.string())})
    if is_sndv:
        vals = np.concatenate(all_vals).astype(np.float64)
        order = np.lexsort((docs, -vals if descending else vals))[:k]
        return pa.table({"doc_id": pa.array(docs[order], pa.int64()),
                         field: pa.array(vals[order], pa.float64())})
    vals = np.concatenate(all_vals).astype(np.int64)
    order = np.lexsort((docs, -vals if descending else vals))[:k]
    return pa.table({"doc_id": pa.array(docs[order], pa.int64()),
                     field: pa.array(vals[order], pa.int64())})


def _early_terminated_sorted_search(searcher: IndexSearcher, node, weights,
                                    field: str, k: int, descending: bool,
                                    stats: dict | None = None,
                                    chunk: int = 4096) -> "pa.Table":
    """EarlyTerminatingSortingCollector role (misc/
    EarlyTerminatingSortingCollector.java + TopFieldCollector's
    canEarlyTerminate when Sort == IndexWriterConfig.setIndexSort): hits
    consumed in index-sort order let each segment stop after its first k
    matches. The reference bakes the sort into segment doc ids at flush
    (index/Sorter.java:49); here each shard walks its cached sort
    permutation (ShardReader.sort_perm) in chunks and stops the moment k
    matching slots are seen — on high-match-rate queries that touches a
    ~k-sized prefix instead of ranking every hit. Results are identical
    to the exhaustive path (same (value, doc_id) order and dtype).
    ``stats``, when given, receives {"scanned": slots visited,
    "total": slots in all shards} as the early-termination evidence."""
    from .executor import eval_node

    scanned = total = 0
    top_docs, top_vals = [], []
    for s in searcher.reader.shards:
        total += len(s.doc_ids)
        docs, _ = eval_node(s, node, weights, searcher.dtype)
        if not len(docs):
            continue
        match = np.zeros(len(s.doc_ids), dtype=bool)
        match[np.searchsorted(s.doc_ids, docs)] = True
        perm = s.sort_perm(field, descending)
        got, n_got = [], 0
        for lo in range(0, len(perm), chunk):
            sl = perm[lo:lo + chunk]
            scanned += len(sl)
            hit = sl[match[sl]]
            if len(hit):
                got.append(hit)
                n_got += len(hit)
            if n_got >= k:
                break
        if got:
            # concatenation preserves perm (index-sort) order; the first
            # k entries are this shard's true top-k for (value, doc_id)
            slots = np.concatenate(got)[:k]
            top_docs.append(s.doc_ids[slots])
            if field == "doclen":
                top_vals.append(s.doclens[slots].astype(np.int64))
            elif field == "doc_id":
                top_vals.append(s.doc_ids[slots])
            else:
                top_vals.append(s.docvalues[field][slots].astype(np.int64))
    if stats is not None:
        stats["scanned"] = int(scanned)
        stats["total"] = int(total)
    if not top_docs:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         field: pa.array([], pa.int64())})
    docs = np.concatenate(top_docs)
    vals = np.concatenate(top_vals)
    order = np.lexsort((docs, -vals if descending else vals))[:k]
    return pa.table({"doc_id": pa.array(docs[order], pa.int64()),
                     field: pa.array(vals[order], pa.int64())})


def _facet_docvalues_scan(index_dir: str, col: str, extract, query=None,
                          top_n: int | None = 1000) -> "pa.Table":
    """Shared scaffold for docvalues facets: a pruned (doc_id, col, shard)
    read -> live/query masking -> per-batch value counts -> groupby sum ->
    sort/limit. ``extract(table, keep_mask)`` yields the kept flat string
    values for one batch (single- vs. multi-valued is its only variation).

    top_n defaults to a BOUNDED 1000 (facet.limit's spirit): the result
    lands on the driver, and a high-cardinality field (host, term) with an
    unbounded default would materialize the whole distinct table there.
    Pass top_n=None explicitly to take everything."""
    import os

    import ray
    import ray.data
    from ray.data.aggregate import Sum

    from ..index.build import load_manifest
    from ..index.maintenance import _dead_mask, _tombstone_gens

    manifest = load_manifest(index_dir) or {}
    gens = _tombstone_gens(index_dir, manifest) if manifest.get("deletes") else []
    ds = ray.data.read_parquet(os.path.join(index_dir, "docs"),
                               columns=["doc_id", col, "shard"])
    fg_ref = None
    if query is not None:
        res = IndexSearcher(index_dir).match_all(query)
        fg_ref = ray.put(np.sort(res["doc_id"].to_numpy()))

    def partial(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = np.ones(len(ids), dtype=bool)
        if gens:
            sh = t["shard"].to_numpy(zero_copy_only=False).astype(np.int64)
            keep &= ~_dead_mask(ids, sh, gens)
        if fg_ref is not None:
            fg = ray.get(fg_ref)
            if len(fg):
                idx = np.minimum(np.searchsorted(fg, ids), len(fg) - 1)
                keep &= fg[idx] == ids
            else:
                keep[:] = False
        vals = extract(t, keep)
        if not len(vals):
            return pa.table({"value": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        u, cnt = np.unique(vals.astype("U"), return_counts=True)
        return pa.table({"value": pa.array(u.tolist(), pa.string()),
                         "cnt": pa.array(cnt.astype(np.int64), pa.int64())})

    agg = ds.map_batches(partial, batch_format="pyarrow").groupby("value").aggregate(
        Sum("cnt", alias_name="cnt"))
    rows = agg.sort(["cnt", "value"], descending=[True, False])
    if top_n is not None:
        rows = rows.limit(top_n)
    out = rows.take_all()
    out = [r for r in out if r["cnt"] and r["cnt"] > 0]
    return pa.table({
        "value": pa.array([r["value"] for r in out], pa.string()),
        "cnt": pa.array([r["cnt"] for r in out], pa.int64()),
    })


def facet_string_docvalues(index_dir: str, field: str, query=None,
                           top_n: int | None = 1000) -> "pa.Table":
    """Facet counts over a SORTED string docvalues column, computed from the
    index's docs tables only (SortedSetDocValuesFacetCounts.java:66 role for
    the single-valued SORTED case; multi-valued facets go through
    facet_sorted_set_docvalues). Returns (value, cnt) sorted by cnt desc,
    value asc. Docs with no value ("" is the build-time missing sentinel,
    build.py SORTED transport) are not counted — the reference's
    SortedSetDocValuesFacetCounts likewise counts only docs with ords."""
    col = f"sdv_{field}"

    def extract(t: pa.Table, keep: np.ndarray) -> np.ndarray:
        vcol = t[col]
        if pa.types.is_dictionary(vcol.type):
            vcol = vcol.cast(pa.large_string())
        vals = np.asarray(vcol.to_pylist(), dtype=object)[keep]
        return vals[vals != ""]

    return _facet_docvalues_scan(index_dir, col, extract, query, top_n)


def facet_sorted_set_docvalues(index_dir: str, field: str, query=None,
                               top_n: int | None = 1000) -> "pa.Table":
    """Facet counts over a SORTED_SET (multi-valued string) docvalues column
    (SortedSetDocValuesFacetCounts.java:66, the multi-valued case): each doc
    counts once per distinct value in its set (sets are deduped at index
    time). Returns (value, cnt) sorted by cnt desc, value asc."""
    col = f"ssdv_{field}"

    def extract(t: pa.Table, keep: np.ndarray) -> np.ndarray:
        lst = t[col].combine_chunks()
        offs = lst.offsets.to_numpy().astype(np.int64)
        fv = lst.values
        if pa.types.is_dictionary(fv.type):
            fv = fv.cast(pa.large_string())
        flat_keep = np.repeat(keep, np.diff(offs))
        return np.asarray(fv.to_pylist(), dtype=object)[flat_keep]

    return _facet_docvalues_scan(index_dir, col, extract, query, top_n)


def elevate(searcher: IndexSearcher, query: str, elevate_ids,
            exclude_ids=(), k: int = 10) -> pa.Table:
    """QueryElevationComponent (solr/.../handler/component/
    QueryElevationComponent.java:117): pinned docs first in the configured
    order (kept even when they don't match the query, score 0 then), then
    the remaining matches by score desc / doc_id asc, excluded ids removed,
    top-k overall. Returns (doc_id, score, elevated, rank)."""
    res = searcher.match_all(query)
    ids = res["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    sc = res["score"].to_numpy(zero_copy_only=False).astype(np.float64)
    elevate_ids = [int(d) for d in elevate_ids]
    drop = set(int(d) for d in exclude_ids) | set(elevate_ids)
    smap = dict(zip(ids.tolist(), sc.tolist()))
    out_ids, out_sc, out_el = [], [], []
    for d in elevate_ids:
        if d in set(int(x) for x in exclude_ids):
            continue
        out_ids.append(d)
        out_sc.append(float(smap.get(d, 0.0)))
        out_el.append(True)
    rest = [(int(d), float(s)) for d, s in zip(ids, sc) if int(d) not in drop]
    rest.sort(key=lambda x: (-x[1], x[0]))
    for d, s in rest:
        out_ids.append(d)
        out_sc.append(s)
        out_el.append(False)
    out_ids, out_sc, out_el = out_ids[:k], out_sc[:k], out_el[:k]
    return pa.table({
        "doc_id": pa.array(out_ids, pa.int64()),
        "score": pa.array(out_sc, pa.float64()),
        "elevated": pa.array(out_el, pa.bool_()),
        "rank": pa.array(np.arange(1, len(out_ids) + 1, dtype=np.int64)),
    })


def rescore(searcher: IndexSearcher, query: str, rescore_query: str,
            first_pass_n: int = 50, weight: float = 1.0, k: int = 10) -> "pa.Table":
    """QueryRescorer role: take the first-pass top-N, add weight * second
    query's scores on those docs, re-rank."""
    first = searcher.search(query, k=first_pass_n)
    ids = first["doc_id"].to_pylist()
    base = dict(zip(ids, first["score"].to_pylist()))
    second = searcher.match_all(rescore_query)
    add = dict(zip(second["doc_id"].to_pylist(), second["score"].to_pylist()))
    combined = [(d, base[d] + weight * add.get(d, 0.0)) for d in ids]
    combined.sort(key=lambda x: (-x[1], x[0]))
    combined = combined[:k]
    return pa.table({
        "doc_id": pa.array([d for d, _ in combined], pa.int64()),
        "score": pa.array([s for _, s in combined], pa.float64()),
    })


class Monitor:
    """Reverse search (lucene/monitor Monitor.java:48 / percolator): register
    queries once, stream documents through, get matching query ids.

    Ray-native use: pass an instance to map_batches as an actor-pool stage —
    the compiled query set loads once per actor; each batch of docs is
    indexed into an in-memory mini index (the MemoryIndex role is played by
    the brute-force postings dict) and every registered query runs over it.
    """

    def __init__(self, queries: dict[str, str], key_col: str = "doc_id",
                 text_col: str = "text"):
        from .query import parse_query, query_terms, requires_positive_term

        self.key_col = key_col
        self.text_col = text_col
        self.compiled = {qid: parse_query(q) for qid, q in queries.items()}
        # TermFilteredPresearcher (monitor/TermFilteredPresearcher.java:63):
        # invert each query's positive terms so a batch only runs the
        # queries whose terms its vocabulary touches. Only queries PROVABLY
        # anchored to one of their terms are filtered; everything else
        # (pure must_not, match-all, multi-term patterns, spans) stays in
        # the always-check set — conservative, never lossy.
        self.term_to_qids: dict[str, list[str]] = {}
        self.always_check: list[str] = []
        for qid, node in self.compiled.items():
            terms = set(query_terms(node))
            if not terms or not requires_positive_term(node):
                self.always_check.append(qid)
                continue
            for t in terms:
                self.term_to_qids.setdefault(t, []).append(qid)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .memory import MemoryIndex

        mini = MemoryIndex(
            batch[self.key_col].to_pylist(), batch[self.text_col].to_pylist()
        )
        # presearch: candidate queries = union over the batch vocabulary
        cand: set[str] = set(self.always_check)
        if len(mini.postings) < len(self.term_to_qids):
            probe = (t for t in mini.postings if t in self.term_to_qids)
        else:
            probe = (t for t in self.term_to_qids if t in mini.postings)
        for t in probe:
            cand.update(self.term_to_qids[t])
        out_doc, out_q = [], []
        for qid in sorted(cand):
            node = self.compiled[qid]
            for d in sorted(mini.matches(node)):
                out_doc.append(d)
                out_q.append(qid)
        return pa.table({
            self.key_col: pa.array(out_doc, pa.int64()),
            "query_id": pa.array(out_q, pa.string()),
        })


def facet_keyword_field(index_dir: str, field: str, query=None,
                        top_n: int | None = 1000) -> pa.Table:
    """String-field facet counts computed ONLY from index columns (the
    SortedSetDocValuesFacetCounts role, facet/sortedset/
    SortedSetDocValuesFacetCounts.java:66): keyword fields are indexed as
    'field:value' terms, so the unconstrained facet is a groupby-sum of df
    over the postings parquet — the corpus is never read. With a query, the
    matching doc-id set is broadcast and each value's postings are decoded
    and intersected (same partial+final shape as significant_terms).

    Returns (value, cnt) sorted by cnt desc, value asc. Tombstoned docs are
    excluded (the reference's SortedSetDocValuesFacetCounts respects
    liveDocs): with no pending deletes the fast df-sum path runs; with
    deletes, each value's postings are decoded and masked against the
    (shard-scoped) tombstones so the unconstrained and query-constrained
    paths stay consistent."""
    import os

    import ray
    import ray.data
    from ray.data.aggregate import Sum

    from ..index.build import load_manifest
    from ..index.maintenance import _dead_mask, _tombstone_gens
    from ..index.postings import decode_doc_ids

    prefix = field + ":"
    postings_dir = os.path.join(index_dir, "postings")
    manifest = load_manifest(index_dir) or {}
    gens = _tombstone_gens(index_dir, manifest) if manifest.get("deletes") else []
    if query is None and not gens:
        cols = ["term", "df"]
    else:
        cols = ["term", "df", "short_bin", "docs_bin", "shard"]
    ds = ray.data.read_parquet(postings_dir, columns=cols)

    fg_ref = None
    if query is not None:
        searcher = IndexSearcher(index_dir)
        res = searcher.match_all(query)
        fg_ref = ray.put(np.sort(res["doc_id"].to_numpy()))

    def partial(t: pa.Table) -> pa.Table:
        terms = t["term"].to_pylist()
        sel = [i for i, x in enumerate(terms) if x.startswith(prefix)]
        if not sel:
            return pa.table({"value": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        values = [terms[i][len(prefix):] for i in sel]
        if fg_ref is None and not gens:
            cnt = t["df"].to_numpy(zero_copy_only=False)[sel].astype(np.int64)
        else:
            fg = ray.get(fg_ref) if fg_ref is not None else None
            dfs = t["df"].to_numpy(zero_copy_only=False)
            shards = (t["shard"].to_numpy(zero_copy_only=False).astype(np.int64)
                      if "shard" in t.column_names else None)
            shorts = t["short_bin"].to_pylist()
            longs = t["docs_bin"].to_pylist()
            cnt = np.zeros(len(sel), dtype=np.int64)
            for j, i in enumerate(sel):
                docs = decode_doc_ids(int(dfs[i]), shorts[i], longs[i])
                if gens and shards is not None and len(docs):
                    dead = _dead_mask(
                        docs, np.full(len(docs), shards[i]), gens)
                    docs = docs[~dead]
                if fg is None:
                    cnt[j] = len(docs)
                elif len(fg) and len(docs):
                    idx = np.minimum(np.searchsorted(fg, docs), len(fg) - 1)
                    cnt[j] = int(np.count_nonzero(fg[idx] == docs))
        return pa.table({"value": pa.array(values, pa.string()),
                         "cnt": pa.array(cnt, pa.int64())})

    agg = ds.map_batches(partial, batch_format="pyarrow").groupby("value").aggregate(
        Sum("cnt", alias_name="cnt")
    )
    rows = agg.sort(["cnt", "value"], descending=[True, False])
    if top_n is not None:
        rows = rows.limit(top_n)
    out = rows.take_all()
    out = [r for r in out if r["cnt"] > 0]
    return pa.table({
        "value": pa.array([r["value"] for r in out], pa.string()),
        "cnt": pa.array([r["cnt"] for r in out], pa.int64()),
    })


def cluster_results(searcher: IndexSearcher, query, corpus_path: str,
                    key_col: str = "doc_id", text_col: str = "text",
                    k: int = 20, n_clusters: int = 3, iters: int = 10,
                    top_terms: int = 64, seed: int = 42) -> pa.Table:
    """Search-result clustering (solr/contrib/clustering
    ClusteringComponent.java:63 / SearchClusteringEngine role — the
    Carrot2 engine is an external library, so the clustering algorithm
    here is deterministic spherical k-means over TF-IDF snippets, the
    standard substitution).

    Top-k hits' texts are fetched with an id-filter pushdown (two-phase
    fetch — never a corpus scan), vectorized into L2-normalized TF-IDF
    over the result set's `top_terms` df-ranked terms, and k-means++-free
    seeded k-means labels each hit. Returns (doc_id, rank, cluster,
    cluster_label) where the label is the cluster's highest-TF-IDF term."""
    import pyarrow.dataset as pds

    hits = searcher.search(query, k=k)
    ids = hits["doc_id"].to_pylist()
    if not ids:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "rank": pa.array([], pa.int32()),
                         "cluster": pa.array([], pa.int32()),
                         "cluster_label": pa.array([], pa.string())})
    dset = pds.dataset(corpus_path)
    t = dset.to_table(columns=[key_col, text_col],
                      filter=pds.field(key_col).isin(ids))
    texts = dict(zip(t[key_col].to_pylist(), t[text_col].to_pylist()))
    docs_toks = [(texts.get(d) or "").split(" ") for d in ids]
    from collections import Counter

    df_c: Counter = Counter()
    for toks in docs_toks:
        df_c.update(set(toks))
    vocab = [w for w, _ in sorted(df_c.items(),
                                  key=lambda x: (-x[1], x[0]))[:top_terms]]
    vid = {w: i for i, w in enumerate(vocab)}
    n, m = len(ids), len(vocab)
    tfm = np.zeros((n, m), dtype=np.float64)
    for i, toks in enumerate(docs_toks):
        for w in toks:
            j = vid.get(w)
            if j is not None:
                tfm[i, j] += 1.0
    idf = np.log(1.0 + n / np.maximum(
        np.asarray([df_c[w] for w in vocab], dtype=np.float64), 1.0))
    x = tfm * idf[None, :]
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    kk = min(n_clusters, n)
    cents = x[rng.choice(n, size=kk, replace=False)]
    for _ in range(iters):
        assign = np.argmax(x @ cents.T, axis=1)
        for c in range(kk):
            mem = x[assign == c]
            if len(mem):
                v = mem.sum(axis=0)
                cents[c] = v / np.maximum(np.linalg.norm(v), 1e-12)
    assign = np.argmax(x @ cents.T, axis=1)
    labels = []
    for c in range(kk):
        mem = x[assign == c]
        labels.append(vocab[int(np.argmax(mem.sum(axis=0)))] if len(mem)
                      else "")
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "rank": hits["rank"],
        "cluster": pa.array(assign.astype(np.int32), pa.int32()),
        "cluster_label": pa.array([labels[c] for c in assign], pa.string()),
    })


def terms_enum(index_dir: str, field: str | None = None, prefix: str = "",
               regex: str | None = None, lower: str | None = None,
               upper: str | None = None, mincount: int = 1,
               maxcount: int | None = None, limit: int = 10,
               sort: str = "count") -> pa.Table:
    """TermsComponent (solr/core/.../handler/component/TermsComponent.java):
    enumerate a field's terms with their doc frequencies, filtered by
    terms.prefix / terms.regex / terms.lower..terms.upper /
    terms.mincount/maxcount, sorted by count (df desc, term asc) or index
    (term asc), limited to terms.limit.

    Distributed: one pruned-column read of the postings parquet (term, df
    only), a vectorized per-batch filter, one groupby(term) partial sum —
    the aggregated table is vocabulary-sized, so the final sort+limit is
    cheap at any corpus scale. df is the RAW doc frequency (the reference's
    docFreq likewise counts tombstoned docs until they merge away).

    field=None enumerates the main text field (terms without a field
    namespace); a named field reads its 'field:value' keyword/analyzed
    postings."""
    import os
    import re as _re

    import ray.data
    from ray.data.aggregate import Sum

    ns = (field + ":") if field else ""
    rx = _re.compile(regex) if regex else None
    ds = ray.data.read_parquet(os.path.join(index_dir, "postings"),
                               columns=["term", "df"])

    def part(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        col = pc.cast(t["term"], pa.string())
        if ns:
            m = pc.starts_with(col, ns)
            col = pc.utf8_slice_codeunits(col, len(ns))
        else:
            m = pc.invert(pc.match_substring(col, ":"))
        if prefix:
            m = pc.and_(m, pc.starts_with(col, prefix))
        if lower is not None:
            m = pc.and_(m, pc.greater_equal(col, lower))
        if upper is not None:
            m = pc.and_(m, pc.less_equal(col, upper))
        if rx is not None:
            m = pc.and_(m, pc.match_substring_regex(
                col, f"^(?:{regex})$"))
        out = pa.table({"term": col, "df": pc.cast(t["df"], pa.int64())})
        return out.filter(m)

    agg = ds.map_batches(part, batch_format="pyarrow").groupby("term") \
        .aggregate(Sum("df", alias_name="df"))

    def count_filter(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        m = pc.greater_equal(t["df"], mincount)
        if maxcount is not None:
            m = pc.and_(m, pc.less_equal(t["df"], maxcount))
        return t.filter(m)

    agg = agg.map_batches(count_filter, batch_format="pyarrow")
    if sort == "count":
        rows = agg.sort(["df", "term"], descending=[True, False])
    else:
        rows = agg.sort("term")
    if limit is not None:
        rows = rows.limit(limit)  # only `limit` rows reach the driver
    out = rows.take_all()
    return pa.table({
        "term": pa.array([r["term"] for r in out], pa.string()),
        "df": pa.array([r["df"] for r in out], pa.int64()),
    })


def significant_terms(searcher: IndexSearcher, query: str, top_n: int = 10,
                      min_df: int = 2) -> pa.Table:
    """Terms over-represented in the matching set vs the background.

    Score = (fg_df / fg_size) / (bg_df / N) (simple lift, as in the
    reference's default significance heuristics).

    Distributed partial+final, matching the reference's
    io/stream/SignificantTermsStream.java:59 shape: the foreground doc-id
    set is broadcast ONCE (ray.put of a sorted array), a map_batches pass
    over the index's postings parquet decodes each term row and counts
    foreground hits with a vectorized searchsorted, partials are summed by
    one groupby(term), and only the top-n rows reach the driver. No full-
    vocabulary Python loop, no driver-side posting decode."""
    import os

    import ray
    import ray.data
    from ray.data.aggregate import Sum

    from ..index.postings import decode_doc_ids

    node = searcher._node(query)
    res = searcher.match_all(node)
    fg_ids = np.sort(res["doc_id"].to_numpy())
    fg_size = len(fg_ids)
    empty = pa.table({"term": pa.array([], pa.string()),
                      "score": pa.array([], pa.float64()),
                      "fg_df": pa.array([], pa.int64()),
                      "bg_df": pa.array([], pa.int64())})
    if fg_size == 0:
        return empty
    N = searcher.reader.doc_count
    fg_ref = ray.put(fg_ids)

    def partial(t: pa.Table) -> pa.Table:
        fg = ray.get(fg_ref)  # zero-copy plasma read per task
        n = t.num_rows
        hits = np.zeros(n, dtype=np.int64)
        dfs = t["df"].to_numpy(zero_copy_only=False)
        shorts = t["short_bin"].to_pylist()
        longs = t["docs_bin"].to_pylist()
        for i in range(n):
            docs = decode_doc_ids(int(dfs[i]), shorts[i], longs[i])
            idx = np.searchsorted(fg, docs)
            idx_c = np.minimum(idx, len(fg) - 1)
            hits[i] = int(np.count_nonzero(fg[idx_c] == docs))
        return pa.table({
            "term": t["term"],
            "fg_df": pa.array(hits, pa.int64()),
            "bg_df": pa.array(dfs.astype(np.int64), pa.int64()),
        })

    postings_dir = os.path.join(searcher.reader.index_dir, "postings")
    ds = ray.data.read_parquet(
        postings_dir, columns=["term", "df", "short_bin", "docs_bin"]
    )
    agg = ds.map_batches(partial, batch_format="pyarrow").groupby("term").aggregate(
        Sum("fg_df", alias_name="fg_df"), Sum("bg_df", alias_name="bg_df")
    )

    def score(t: pa.Table) -> pa.Table:
        fdf = t["fg_df"].to_numpy(zero_copy_only=False).astype(np.float64)
        bdf = t["bg_df"].to_numpy(zero_copy_only=False).astype(np.float64)
        lift = (fdf / fg_size) / (bdf / N)
        keep = (t["fg_df"].to_numpy(zero_copy_only=False) > 0) & (
            t["bg_df"].to_numpy(zero_copy_only=False) >= min_df
        )
        return pa.table({
            "term": t["term"],
            "score_raw": pa.array(lift, pa.float64()),
            "fg_df": t["fg_df"],
            "bg_df": t["bg_df"],
        }).filter(pa.array(keep))

    top = (
        agg.map_batches(score, batch_format="pyarrow")
        .sort(["score_raw", "term"], descending=[True, False])
        .limit(top_n)
        .take_all()
    )
    return pa.table({
        "term": pa.array([r["term"] for r in top], pa.string()),
        "score": pa.array([round(r["score_raw"], 6) for r in top], pa.float64()),
        "fg_df": pa.array([r["fg_df"] for r in top], pa.int64()),
        "bg_df": pa.array([r["bg_df"] for r in top], pa.int64()),
    })


def geo_nearest(searcher: IndexSearcher, lat: float, lon: float,
                lat_field: str = "lat", lon_field: str = "lon",
                k: int = 10, query=None) -> "pa.Table":
    """Distance sort (LatLonDocValuesField.newDistanceSort +
    TopFieldCollector): top-k docs nearest (lat, lon), optionally restricted
    to a query's matches. Per shard: candidates -> vectorized haversine over
    the lat/lon docvalues -> local top-k; the cross-shard merge handles only
    shards*k rows. Ties break on doc_id asc (the reference's tie rule)."""
    from .executor import eval_node, resolve_weights
    from .geo import distances_for
    from .query import MatchAll

    node = searcher._node(query) if query is not None else MatchAll()
    weights = resolve_weights(searcher.reader, node, searcher.params,
                              searcher.dtype)
    parts_d, parts_km = [], []
    for s in searcher.reader.shards:
        docs, _ = eval_node(s, node, weights, searcher.dtype)
        if not len(docs):
            continue
        d = distances_for(s, docs, lat_field, lon_field, lat, lon)
        loc = np.lexsort((docs, d))[:k]
        parts_d.append(docs[loc])
        parts_km.append(d[loc])
    if not parts_d:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "distance_km": pa.array([], pa.float64()),
                         "rank": pa.array([], pa.int32())})
    docs = np.concatenate(parts_d)
    km = np.concatenate(parts_km)
    order = np.lexsort((docs, km))[:k]
    return pa.table({
        "doc_id": pa.array(docs[order], pa.int64()),
        "distance_km": pa.array(km[order], pa.float64()),
        "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int32)),
    })


def to_parent_block_join(searcher: IndexSearcher, child_query,
                         parent_of, score_mode: str = "max",
                         k: int | None = None,
                         round_child: int | None = None) -> pa.Table:
    """ToParentBlockJoinQuery: children matching child_query roll up to
    their parent with a ScoreMode aggregation (join/ToParentBlockJoinQuery.
    java:63; BlockJoinScorer score modes None/Avg/Max/Total/Min per
    search/join/ScoreMode.java).

    The reference derives each child's parent from index order (the parent
    BitSet: parent doc follows its children in one addDocuments block).
    Doc ids here are application keys, so `parent_of` is a vectorized
    callable mapping a child doc_id array -> parent key array — the same
    parent identity, expressed as a key function instead of adjacency.

    Scale shape: child matching and child->parent partial aggregation run
    per shard (threaded); the driver merges O(distinct parents per shard)
    partials, never the raw child stream. score_mode:
      "max" / "min" / "total" / "avg" — aggregated child score
      "none"  — parent matches if any child matches; score 0 (filter role)
    k = None returns ALL parents sorted by parent_id (oracle mode); k
    returns the top-k by (score desc, parent_id asc) like TopDocs ties.
    round_child rounds each child score before aggregating (oracle-exact
    comparisons against a SQL mirror that rounds per child).
    """
    from .executor import eval_node, resolve_weights

    node = searcher._node(child_query)
    weights = resolve_weights(searcher.reader, node, searcher.params,
                              searcher.dtype)

    def partial(shard):
        docs, scores = eval_node(shard, node, weights, searcher.dtype)
        if not len(docs):
            z64 = np.zeros(0, np.float64)
            return (np.zeros(0, np.int64), z64, z64, z64,
                    np.zeros(0, np.int64))
        s = scores.astype(np.float64)
        if round_child is not None:
            p10 = 10.0 ** round_child
            ax = np.abs(s) * p10
            fl = np.floor(ax)
            s = np.sign(s) * (fl + (ax - fl >= 0.5)) / p10
        par = np.asarray(parent_of(docs), dtype=np.int64)
        order = np.argsort(par, kind="stable")
        p, v = par[order], s[order]
        starts = np.flatnonzero(np.r_[True, p[1:] != p[:-1]])
        ends = np.r_[starts[1:], len(p)]
        return (p[starts],
                np.add.reduceat(v, starts),
                np.maximum.reduceat(v, starts),
                np.minimum.reduceat(v, starts),
                (ends - starts).astype(np.int64))

    parts = searcher._map_shards(partial,
                                 parallel=searcher._big_query(weights))
    par = np.concatenate([p[0] for p in parts])
    if not len(par):
        return pa.table({"parent_id": pa.array([], pa.int64()),
                         "score": pa.array([], pa.float64()),
                         "n_children": pa.array([], pa.int64())})
    tot = np.concatenate([p[1] for p in parts])
    mx = np.concatenate([p[2] for p in parts])
    mn = np.concatenate([p[3] for p in parts])
    cnt = np.concatenate([p[4] for p in parts])
    order = np.argsort(par, kind="stable")
    par, tot, mx, mn, cnt = (par[order], tot[order], mx[order],
                             mn[order], cnt[order])
    starts = np.flatnonzero(np.r_[True, par[1:] != par[:-1]])
    pid = par[starts]
    g_tot = np.add.reduceat(tot, starts)
    g_cnt = np.add.reduceat(cnt, starts)
    if score_mode == "max":
        score = np.maximum.reduceat(mx, starts)
    elif score_mode == "min":
        score = np.minimum.reduceat(mn, starts)
    elif score_mode == "total":
        score = g_tot
    elif score_mode == "avg":
        score = g_tot / g_cnt
    elif score_mode == "none":
        score = np.zeros(len(pid), np.float64)
    else:
        raise ValueError(f"unknown score_mode {score_mode!r}")
    if k is not None:
        loc = np.lexsort((pid, -score))[:k]
        pid, score, g_cnt = pid[loc], score[loc], g_cnt[loc]
    return pa.table({
        "parent_id": pa.array(pid, pa.int64()),
        "score": pa.array(score, pa.float64()),
        "n_children": pa.array(g_cnt, pa.int64()),
    })


def to_child_block_join(searcher: IndexSearcher, parent_query,
                        parent_of, child_ids: np.ndarray) -> pa.Table:
    """ToChildBlockJoinQuery: parents matching parent_query project DOWN to
    their child docs, each child inheriting its parent's score
    (join/ToChildBlockJoinQuery.java:42 — childScore = parentScore).

    child_ids is the candidate child doc_id universe (e.g. a shard's doc
    column or a prior filter's matches); children whose parent matched are
    returned with the parent's score.
    """
    t = searcher.match_all(parent_query)
    p_ids = t["doc_id"].to_numpy()
    p_scores = t["score"].to_numpy()
    kids = np.asarray(child_ids, dtype=np.int64)
    kpar = np.asarray(parent_of(kids), dtype=np.int64)
    order = np.argsort(p_ids)
    pos = np.searchsorted(p_ids, kpar, sorter=order)
    pos_c = np.minimum(pos, len(p_ids) - 1) if len(p_ids) else pos
    if len(p_ids):
        take = order[pos_c]
        m = p_ids[take] == kpar
    else:
        m = np.zeros(len(kids), dtype=bool)
        take = np.zeros(len(kids), dtype=np.int64)
    sel = np.flatnonzero(m)
    out_kids = kids[sel]
    out_scores = p_scores[take[sel]].astype(np.float64)
    o = np.argsort(out_kids)
    return pa.table({
        "doc_id": pa.array(out_kids[o], pa.int64()),
        "score": pa.array(out_scores[o], pa.float64()),
    })


def payload_score(searcher: IndexSearcher, term: str,
                  function: str = "max") -> pa.Table:
    """PayloadScoreQuery(SpanTermQuery, PayloadFunction, includeSpanScore=
    false) — queries/payloads/PayloadScoreQuery.java:57 with
    Max/Min/Average/SumPayloadFunction: each matching doc scores the
    aggregate of the payload ints at the term's positions. Occurrences
    without a payload (-1 sentinel) are skipped, exactly the reference's
    payload-absent behavior (PayloadFunction only sees present payloads);
    a doc whose occurrences carry no payloads scores 0.

    Runs per shard off one postings decode (payloads ride the positions
    layout); the driver concatenates disjoint per-shard doc ranges.
    """
    if function not in ("max", "min", "avg", "sum"):
        raise ValueError(f"unknown payload function {function!r}")

    def per_shard(shard):
        got = shard.postings(term, with_positions=True, payload_col="offsets")
        docs, freqs, pay = got[0], got[1], got[2]
        if not len(docs):
            return docs, np.zeros(0, np.float64)
        if not len(pay):
            # index without payloads: every doc scores 0 (matches only)
            return docs, np.zeros(len(docs), np.float64)
        starts = np.concatenate([[0], np.cumsum(freqs.astype(np.int64))])[:-1]
        present = pay != -1
        seg = np.repeat(np.arange(len(docs)), freqs)
        cnt = np.bincount(seg[present], minlength=len(docs))
        if function in ("sum", "avg"):
            tot = np.bincount(seg[present],
                              weights=pay[present].astype(np.float64),
                              minlength=len(docs))
            score = tot if function == "sum" else np.divide(
                tot, cnt, out=np.zeros(len(docs)), where=cnt > 0)
        else:
            fill = np.float64(-np.inf if function == "max" else np.inf)
            v = np.where(present, pay.astype(np.float64), fill)
            red = (np.maximum if function == "max" else np.minimum)
            score = red.reduceat(v, starts)
        return docs, np.where(cnt > 0, score, 0.0)

    parts = searcher._map_shards(per_shard, parallel=False)
    docs = np.concatenate([p[0] for p in parts])
    scores = np.concatenate([p[1] for p in parts])
    order = np.argsort(docs)
    return pa.table({
        "doc_id": pa.array(docs[order], pa.int64()),
        "score": pa.array(scores[order].astype(np.float64), pa.float64()),
    })


def grouping_search(searcher: IndexSearcher, query, field: str,
                    n_groups: int = 3, docs_per_group: int = 2,
                    round_nd: int | None = None) -> pa.Table:
    """Two-pass grouping at query time (grouping/GroupingSearch.java:51):
    pass 1 picks the top n_groups group values by their best doc score
    (FirstPassGroupingCollector.java:43), pass 2 the top docs_per_group
    docs inside each (TopGroupsCollector role). Groups come from a SORTED
    string docvalues field.

    Scale shape: each shard scores its matches, attaches group ords, and
    keeps only docs_per_group candidates per group (a per-shard partial —
    any doc in a global per-group top-k is in its shard's per-group
    top-k); the driver merges partials, never the raw match stream.
    Ties: groups order by (best score desc, group asc); docs inside a
    group by (score desc, doc_id asc). round_nd rounds scores before
    ranking so an oracle rounding identically ranks identically.
    """
    from .executor import eval_node, resolve_weights

    node = searcher._node(query)
    weights = resolve_weights(searcher.reader, node, searcher.params,
                              searcher.dtype)

    def partial(shard):
        docs, scores = eval_node(shard, node, weights, searcher.dtype)
        if not len(docs):
            return (np.zeros(0, object), np.zeros(0, np.int64),
                    np.zeros(0, np.float64))
        s = scores.astype(np.float64)
        if round_nd is not None:
            p10 = 10.0 ** round_nd
            ax = np.abs(s) * p10
            fl = np.floor(ax)
            s = np.sign(s) * (fl + (ax - fl >= 0.5)) / p10
        grp = np.asarray(shard.strings_for(field, docs), dtype=object)
        order = np.lexsort((docs, -s, grp))
        g, d, v = grp[order], docs[order], s[order]
        new = np.empty(len(g), dtype=bool)
        new[0] = True
        new[1:] = g[1:] != g[:-1]
        run_pos = np.arange(len(g)) - np.maximum.accumulate(
            np.where(new, np.arange(len(g)), 0))
        keep = run_pos < docs_per_group
        return g[keep], d[keep], v[keep]

    parts = searcher._map_shards(partial,
                                 parallel=searcher._big_query(weights))
    grp = np.concatenate([p[0] for p in parts])
    if not len(grp):
        return pa.table({"grp": pa.array([], pa.large_string()),
                         "doc_id": pa.array([], pa.int64()),
                         "score": pa.array([], pa.float64()),
                         "grp_rank": pa.array([], pa.int64()),
                         "doc_rank": pa.array([], pa.int64())})
    docs = np.concatenate([p[1] for p in parts])
    scores = np.concatenate([p[2] for p in parts])
    # pass 1: top groups by best score
    order = np.lexsort((docs, -scores, grp))
    g, d, v = grp[order], docs[order], scores[order]
    new = np.empty(len(g), dtype=bool)
    new[0] = True
    new[1:] = g[1:] != g[:-1]
    starts = np.flatnonzero(new)
    gvals = g[starts]
    gmax = np.maximum.reduceat(v, starts)
    gorder = np.lexsort((gvals, -gmax))[:n_groups]
    grp_rank = {gvals[i]: r + 1 for r, i in enumerate(gorder)}
    # pass 2: top docs inside each selected group
    run_pos = np.arange(len(g)) - np.repeat(starts, np.diff(
        np.append(starts, len(g))))
    keep = np.array([x in grp_rank for x in g]) & (run_pos < docs_per_group)
    g, d, v, rp = g[keep], d[keep], v[keep], run_pos[keep]
    gr = np.array([grp_rank[x] for x in g], dtype=np.int64)
    out_order = np.lexsort((rp, gr))
    return pa.table({
        "grp": pa.array(g[out_order], pa.large_string()),
        "doc_id": pa.array(d[out_order], pa.int64()),
        "score": pa.array(v[out_order], pa.float64()),
        "grp_rank": pa.array(gr[out_order], pa.int64()),
        "doc_rank": pa.array(rp[out_order] + 1, pa.int64()),
    })


def fuzzy_suggest(searcher: IndexSearcher, prefix: str, k: int = 5,
                  max_edits: int = 1, non_fuzzy_prefix: int = 1,
                  min_fuzzy_length: int = 3) -> list[tuple[str, int]]:
    """FuzzySuggester (suggest/analyzing/FuzzySuggester.java:139; defaults
    maxEdits=1, transpositions=true, nonFuzzyPrefix=1, minFuzzyLength=3):
    dictionary terms whose prefix is within max_edits (restricted-Damerau)
    of the typed key, first non_fuzzy_prefix chars exact; keys shorter than
    min_fuzzy_length fall back to exact-prefix completion. Ranked df desc,
    term asc (the engine's df-weight convention, as services.suggest).

    The reference intersects a Levenshtein automaton with the suggest FST;
    here the resident sorted term dictionary is sliced to the exact
    non-fuzzy prefix range and the survivors run the same banded DP the
    fuzzy query path uses. A term matches when ANY of its prefixes of
    length len(key)-max_edits .. len(key)+max_edits is within max_edits.
    """
    from .multiterm import _levenshtein_leq

    p = prefix.lower()
    if len(p) < min_fuzzy_length:
        return suggest(searcher, p, k=k)
    anchor = p[:non_fuzzy_prefix]
    lens = range(max(1, len(p) - max_edits), len(p) + max_edits + 1)
    seen: set[str] = set()
    for s in searcher.reader.shards:
        terms = s.terms
        lo = np.searchsorted(terms, anchor)
        hi = np.searchsorted(terms, anchor[:-1] + chr(ord(anchor[-1]) + 1))
        for t in terms[lo:hi].tolist():
            if t in seen:
                continue
            if any(_levenshtein_leq(p, t[:L], max_edits) for L in lens):
                seen.add(t)
    ranked = sorted(((searcher.reader.term_stats(t)[0], t) for t in seen),
                    key=lambda x: (-x[0], x[1]))
    return [(t, df) for df, t in ranked[:k]]


def search_sorted_by_fields(searcher: IndexSearcher, query,
                            fields: list[tuple[str, bool]],
                            k: int = 10) -> pa.Table:
    """Compound sort (search/Sort.java with multiple SortFields feeding
    TopFieldCollector.java:42): top-k matching docs ordered by several
    keys — SORTED string docvalues, NUMERIC docvalues, doclen or doc_id —
    each ascending or descending; final tiebreak doc_id asc.

    fields: [(field_name, descending), ...] in priority order.
    """
    from .executor import eval_node, resolve_weights

    node = searcher._node(query)
    weights = resolve_weights(searcher.reader, node, searcher.params,
                              searcher.dtype)

    def vals_of(s, docs, field):
        if field in s.sorted_dv:
            return s.strings_for(field, docs)
        if field == "doclen":
            return s.doclens[np.searchsorted(s.doc_ids, docs)]
        if field == "doc_id":
            return docs
        if field in getattr(s, "docvalues", {}):
            return s.docvalues[field][np.searchsorted(s.doc_ids, docs)]
        raise ValueError(f"unknown sort field {field!r}")

    all_docs, per_field = [], [[] for _ in fields]
    for s in searcher.reader.shards:
        docs, _ = eval_node(s, node, weights, searcher.dtype)
        if not len(docs):
            continue
        all_docs.append(docs)
        for j, (f, _) in enumerate(fields):
            per_field[j].append(vals_of(s, docs, f))
    if not all_docs:
        cols = {"doc_id": pa.array([], pa.int64())}
        for f, _ in fields:
            cols[f] = pa.array([])
        return pa.table(cols)
    docs = np.concatenate(all_docs)
    keys = [docs]  # least-significant lexsort key = final doc_id tiebreak
    out_cols = {}
    for j in range(len(fields) - 1, -1, -1):
        f, desc = fields[j]
        v = np.concatenate(per_field[j])
        out_cols[f] = v
        if v.dtype.kind in ("U", "O"):  # strings sort via global ranks
            _, inv = np.unique(v, return_inverse=True)
            keys.append(-inv if desc else inv)
        else:
            vv = v.astype(np.float64)
            keys.append(-vv if desc else vv)
    order = np.lexsort(tuple(keys))[:k]
    cols = {"doc_id": pa.array(docs[order], pa.int64())}
    for f, _ in fields:
        v = out_cols[f][order]
        if v.dtype.kind in ("U", "O"):
            cols[f] = pa.array(v.tolist(), pa.string())
        elif np.issubdtype(v.dtype, np.integer):
            cols[f] = pa.array(v.astype(np.int64), pa.int64())
        else:
            cols[f] = pa.array(v.astype(np.float64), pa.float64())
    return pa.table(cols)


def _round_half_away_arr(v: np.ndarray, nd: int) -> np.ndarray:
    """Round-half-away-from-zero (Java Math.round family / DuckDB round)."""
    p10 = 10.0 ** nd
    ax = np.abs(v) * p10
    fl = np.floor(ax)
    return np.sign(v) * (fl + (ax - fl >= 0.5)) / p10


def join_query(searcher: IndexSearcher, from_query, from_field: str,
               to_field: str | None = None, score_mode: str = "max",
               k: int | None = None,
               round_from: int | None = None) -> pa.Table:
    """JoinUtil.createJoinQuery (join/JoinUtil.java:90): query-time value
    join. Phase 1 (TermsWithScoreCollector role): docs matching from_query
    contribute their from_field docvalue, scores aggregated per value with
    ScoreMode (join/ScoreMode.java Max / Total / Avg / Min / None). Phase 2
    (GlobalOrdinalsWithScoreQuery role): every doc whose to_field carries a
    collected value matches, scored with that value's aggregate — ordinals
    stay shard-local (the SORTED dv dict); the join key crosses shards as
    the value itself, the reference's OrdinalMap substitute.

    Scale shape: phase 1 emits O(distinct values) partials per shard and
    the driver merges only those (the from-side doc stream never leaves
    the shards); phase 2 is a per-shard docvalues membership scan against
    the broadcast value->score map. k=None returns ALL joined docs sorted
    by doc_id (oracle mode); otherwise top-k by (score desc, doc_id asc).
    round_from rounds each from-doc score before aggregation so a SQL
    mirror that rounds per doc composes identically; "avg" divides the
    ALREADY-ROUNDED total by the count for the same reason.
    """
    from .executor import eval_node, resolve_weights

    to_field = to_field or from_field
    node = searcher._node(from_query)
    weights = resolve_weights(searcher.reader, node, searcher.params,
                              searcher.dtype)

    def value_of(s, docs):
        if from_field in s.sorted_dv:
            return s.strings_for(from_field, docs)
        if from_field in s.docvalues:
            return s.docvalues[from_field][np.searchsorted(s.doc_ids, docs)]
        raise ValueError(f"{from_field!r} is not a docvalues field")

    def partial(s):
        docs, scores = eval_node(s, node, weights, searcher.dtype)
        if not len(docs):
            return None
        sc = scores.astype(np.float64)
        if round_from is not None:
            sc = _round_half_away_arr(sc, round_from)
        vals = value_of(s, docs)
        if vals.dtype.kind in ("U", "O"):
            keep = np.asarray([v != "" for v in vals], bool)  # missing joins nothing
            vals, sc = vals[keep], sc[keep]
        if not len(vals):
            return None
        u, inv = np.unique(vals, return_inverse=True)
        order = np.argsort(inv, kind="stable")
        iv, v = inv[order], sc[order]
        starts = np.flatnonzero(np.r_[True, iv[1:] != iv[:-1]])
        return (u[iv[starts]],
                np.add.reduceat(v, starts),
                np.maximum.reduceat(v, starts),
                np.minimum.reduceat(v, starts),
                np.diff(np.r_[starts, len(iv)]).astype(np.int64))

    parts = [p for p in searcher._map_shards(
        partial, parallel=searcher._big_query(weights)) if p is not None]
    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "score": pa.array([], pa.float64())})
    if not parts:
        return empty
    vals = np.concatenate([p[0] for p in parts])
    tot = np.concatenate([p[1] for p in parts])
    mx = np.concatenate([p[2] for p in parts])
    mn = np.concatenate([p[3] for p in parts])
    cnt = np.concatenate([p[4] for p in parts])
    order = np.argsort(vals, kind="stable")
    vals, tot, mx, mn, cnt = (vals[order], tot[order], mx[order],
                              mn[order], cnt[order])
    starts = np.flatnonzero(
        np.r_[True, vals[1:] != vals[:-1]])
    vkeys = vals[starts]
    g_tot = np.add.reduceat(tot, starts)
    g_cnt = np.add.reduceat(cnt, starts)
    if score_mode == "max":
        vscore = np.maximum.reduceat(mx, starts)
    elif score_mode == "min":
        vscore = np.minimum.reduceat(mn, starts)
    elif score_mode == "total":
        vscore = g_tot
    elif score_mode == "avg":
        if round_from is not None:
            g_tot = _round_half_away_arr(g_tot, round_from)
        vscore = g_tot / g_cnt
    elif score_mode == "none":
        vscore = np.zeros(len(vkeys), np.float64)
    else:
        raise ValueError(f"unknown score_mode {score_mode!r}")

    is_string = vkeys.dtype.kind in ("U", "O")

    def scan(s):
        if is_string and to_field in s.sorted_dv:
            u2, inv2 = s.sorted_dv[to_field]
            pos = np.searchsorted(vkeys, u2)
            pos_c = np.clip(pos, 0, max(len(vkeys) - 1, 0))
            ok = vkeys[pos_c] == u2
            dict_score = np.where(ok, vscore[pos_c], np.nan)
            sdoc = dict_score[inv2]
        elif not is_string and to_field in s.docvalues:
            dv = s.docvalues[to_field]
            pos = np.searchsorted(vkeys, dv)
            pos_c = np.clip(pos, 0, max(len(vkeys) - 1, 0))
            ok = vkeys[pos_c] == dv
            sdoc = np.where(ok, vscore[pos_c], np.nan)
        else:
            raise ValueError(f"{to_field!r} is not a docvalues field")
        m = ~np.isnan(sdoc)
        return s.doc_ids[m], sdoc[m]

    parts2 = searcher._map_shards(scan, parallel=searcher._big_query(weights))
    docs = np.concatenate([p[0] for p in parts2]) if parts2 else np.zeros(0, np.int64)
    if not len(docs):
        return empty
    sc = np.concatenate([p[1] for p in parts2])
    if k is None:
        order = np.argsort(docs, kind="stable")
    else:
        order = np.lexsort((docs, -sc))[:k]
    return pa.table({
        "doc_id": pa.array(docs[order], pa.int64()),
        "score": pa.array(sc[order], pa.float64()),
    })


def collapse_expand(searcher: IndexSearcher, query, field: str,
                    k: int = 10, expand_rows: int = 2,
                    head_by: str | tuple[str, str] = "score",
                    null_policy: str = "ignore",
                    round_nd: int | None = None) -> pa.Table:
    """Solr field collapse + expand (search/CollapsingQParserPlugin.java:61,
    handler/component/ExpandComponent.java:104): the result set keeps one
    head doc per group (the collapse field's SORTED docvalue), ranked as
    usual by (score desc, doc_id asc); the expand pass returns the top
    expand_rows companion docs of each returned head's group, head
    excluded, ranked the same way.

    head_by picks the group head: "score" (the default, Solr's score
    collapse) or ("min"|"max", <NUMERIC dv field>) (Solr's min=/max=
    local params); head ties break to the lower doc_id. The main result
    ranking stays score-based either way, as the plugin only filters docs.

    null_policy mirrors nullPolicy= (missing SORTED value == ''):
    "ignore" drops null-group docs, "expand" keeps each null doc as its
    own one-doc group, "collapse" makes all nulls one group.

    Scale shape: each shard ships per group only its top expand_rows+1
    docs by (score, doc) plus (min/max modes) its head-field argbest —
    supersets of any global head/companion — so driver traffic is
    O(groups * expand_rows), never the match stream. Scores round
    (half-away) before ranking when round_nd is set so a SQL
    window-function mirror ranks identically.
    """
    from .executor import eval_node, resolve_weights

    if null_policy not in ("ignore", "expand", "collapse"):
        raise ValueError(f"unknown nullPolicy {null_policy!r}")
    hmode, hfield = (("score", None) if head_by == "score"
                     else (head_by[0], head_by[1]))
    if hmode not in ("score", "min", "max"):
        raise ValueError(f"unknown head_by {head_by!r}")
    node = searcher._node(query)
    weights = resolve_weights(searcher.reader, node, searcher.params,
                              searcher.dtype)
    keep_n = expand_rows + 1

    def partial(shard):
        z = (np.zeros(0, object), np.zeros(0, np.int64),
             np.zeros(0, np.float64), np.zeros(0, np.float64))
        docs, scores = eval_node(shard, node, weights, searcher.dtype)
        if not len(docs):
            return z
        s = scores.astype(np.float64)
        if round_nd is not None:
            s = _round_half_away_arr(s, round_nd)
        grp = np.asarray(shard.strings_for(field, docs), dtype=object)
        isnull = grp == ""
        if null_policy == "ignore" and isnull.any():
            m = ~isnull
            docs, s, grp, isnull = docs[m], s[m], grp[m], isnull[m]
            if not len(docs):
                return z
        elif null_policy == "expand" and isnull.any():
            # singleton groups: a key no real value collides with
            grp = grp.copy()
            grp[isnull] = np.array(
                ["\x00%d" % d for d in docs[isnull]], dtype=object)
        if hmode == "score":
            hval = s
        else:
            idx = np.searchsorted(shard.doc_ids, docs)
            hval = shard.docvalues[hfield].astype(np.float64)[idx]
        # per-group per-shard top keep_n by (score desc, doc asc)
        order = np.lexsort((docs, -s, grp))
        g, run_new = grp[order], np.empty(len(order), dtype=bool)
        run_new[0] = True
        run_new[1:] = g[1:] != g[:-1]
        run_pos = np.arange(len(g)) - np.maximum.accumulate(
            np.where(run_new, np.arange(len(g)), 0))
        keep = np.zeros(len(docs), dtype=bool)
        keep[order] = run_pos < keep_n
        if hmode != "score":
            # also keep the shard's head-field argbest per group
            key = hval if hmode == "min" else -hval
            horder = np.lexsort((docs, key, grp))
            hg = grp[horder]
            hnew = np.empty(len(horder), dtype=bool)
            hnew[0] = True
            hnew[1:] = hg[1:] != hg[:-1]
            keep[horder[hnew]] = True
        return grp[keep], docs[keep], s[keep], hval[keep]

    parts = searcher._map_shards(partial,
                                 parallel=searcher._big_query(weights))
    grp = np.concatenate([p[0] for p in parts])
    empty = pa.table({
        "grp": pa.array([], pa.large_string()),
        "doc_id": pa.array([], pa.int64()),
        "score": pa.array([], pa.float64()),
        "role": pa.array([], pa.large_string()),
        "head_rank": pa.array([], pa.int64()),
        "exp_rank": pa.array([], pa.int64()),
    })
    if not len(grp):
        return empty
    docs = np.concatenate([p[1] for p in parts])
    scores = np.concatenate([p[2] for p in parts])
    hvals = np.concatenate([p[3] for p in parts])
    # group heads
    if hmode == "score":
        horder = np.lexsort((docs, -scores, grp))
    else:
        key = hvals if hmode == "min" else -hvals
        horder = np.lexsort((docs, key, grp))
    hg = grp[horder]
    hnew = np.empty(len(horder), dtype=bool)
    hnew[0] = True
    hnew[1:] = hg[1:] != hg[:-1]
    head_idx = horder[hnew]  # one per group
    # rank heads by (score desc, doc asc), top k
    hs, hd = scores[head_idx], docs[head_idx]
    hr = np.lexsort((hd, -hs))[:k]
    head_idx = head_idx[hr]
    head_rank_of = {grp[i]: r + 1 for r, i in enumerate(head_idx)}
    head_doc_of = {grp[i]: docs[i] for i in head_idx}
    # expand companions for the selected groups
    sel = np.array([g in head_rank_of for g in grp], dtype=bool)
    is_head = np.zeros(len(grp), dtype=bool)
    is_head[head_idx] = True
    cand = sel & ~is_head
    # drop duplicate head doc rows kept by both keep-sets
    cand &= np.array(
        [head_doc_of.get(g, -1) != d for g, d in zip(grp, docs)], dtype=bool)
    out_g, out_d, out_s, out_role, out_hr, out_er = [], [], [], [], [], []
    for r, i in enumerate(head_idx):
        g = grp[i]
        shown = "" if g.startswith("\x00") else g
        out_g.append(shown)
        out_d.append(docs[i])
        out_s.append(scores[i])
        out_role.append("head")
        out_hr.append(r + 1)
        out_er.append(0)
        m = cand & (grp == g)
        if expand_rows and m.any():
            cd, cs = docs[m], scores[m]
            co = np.lexsort((cd, -cs))[:expand_rows]
            for e, j in enumerate(co):
                out_g.append(shown)
                out_d.append(cd[j])
                out_s.append(cs[j])
                out_role.append("expand")
                out_hr.append(r + 1)
                out_er.append(e + 1)
    return pa.table({
        "grp": pa.array(out_g, pa.large_string()),
        "doc_id": pa.array(out_d, pa.int64()),
        "score": pa.array(out_s, pa.float64()),
        "role": pa.array(out_role, pa.large_string()),
        "head_rank": pa.array(out_hr, pa.int64()),
        "exp_rank": pa.array(out_er, pa.int64()),
    })


def diversified_top_k(searcher: IndexSearcher, query, field: str,
                      k: int = 10, max_hits_per_key: int = 1,
                      round_nd: int | None = None) -> pa.Table:
    """DiversifiedTopDocsCollector (lucene/misc/.../search/
    DiversifiedTopDocsCollector.java:51): top-k by score where each key
    (a SORTED docvalues value) contributes at most max_hits_per_key docs —
    equivalently, docs are admitted in (score desc, doc asc) order while
    their key's quota is open.

    Scale shape: a shard's per-key (score, doc) top max_hits_per_key is a
    superset of any doc admitted globally, so each shard ships at most
    groups x max_hits_per_key candidate rows.
    """
    from .executor import eval_node, resolve_weights

    node = searcher._node(query)
    weights = resolve_weights(searcher.reader, node, searcher.params,
                              searcher.dtype)

    def partial(shard):
        docs, scores = eval_node(shard, node, weights, searcher.dtype)
        if not len(docs):
            return (np.zeros(0, object), np.zeros(0, np.int64),
                    np.zeros(0, np.float64))
        s = scores.astype(np.float64)
        if round_nd is not None:
            s = _round_half_away_arr(s, round_nd)
        key = np.asarray(shard.strings_for(field, docs), dtype=object)
        order = np.lexsort((docs, -s, key))
        g = key[order]
        new = np.empty(len(g), dtype=bool)
        new[0] = True
        new[1:] = g[1:] != g[:-1]
        run_pos = np.arange(len(g)) - np.maximum.accumulate(
            np.where(new, np.arange(len(g)), 0))
        keep = order[run_pos < max_hits_per_key]
        return key[keep], docs[keep], s[keep]

    parts = searcher._map_shards(partial,
                                 parallel=searcher._big_query(weights))
    key = np.concatenate([p[0] for p in parts])
    if not len(key):
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "key": pa.array([], pa.large_string()),
                         "score": pa.array([], pa.float64())})
    docs = np.concatenate([p[1] for p in parts])
    scores = np.concatenate([p[2] for p in parts])
    order = np.lexsort((docs, -scores))
    quota: dict = {}
    out_i: list[int] = []
    for i in order:
        g = key[i]
        used = quota.get(g, 0)
        if used < max_hits_per_key:
            quota[g] = used + 1
            out_i.append(i)
            if len(out_i) >= k:
                break
    idx = np.asarray(out_i, dtype=np.int64)
    return pa.table({
        "doc_id": pa.array(docs[idx], pa.int64()),
        "key": pa.array(key[idx], pa.large_string()),
        "score": pa.array(scores[idx], pa.float64()),
    })


def docvalues_stats(searcher: IndexSearcher, query, field: str,
                    round_nd: int | None = None) -> pa.Table:
    """DocValuesStats collector (lucene/misc/.../search/DocValuesStats
    .java:28, DocValuesStatsCollector role): over the docs matching
    `query`, the NUMERIC docvalues field's count / missing / min / max /
    mean / sample variance. Per-shard partials ship five scalars each
    (count, sum, sumsq, min, max); the driver merges moments — the
    match set never leaves the shards."""
    from .executor import eval_node, resolve_weights

    node = searcher._node(query)
    weights = resolve_weights(searcher.reader, node, searcher.params,
                              searcher.dtype)

    def partial(shard):
        docs, _ = eval_node(shard, node, weights, searcher.dtype)
        vals = shard.docvalues.get(field)
        if not len(docs):
            return (0, 0, 0.0, 0.0, np.inf, -np.inf)
        if vals is None:
            # shard has no dv column: its matching docs count as MISSING
            # (DocValuesStats.java missing()), not silently dropped
            return (0, len(docs), 0.0, 0.0, np.inf, -np.inf)
        idx = np.searchsorted(shard.doc_ids, docs)
        v = vals.astype(np.float64)[idx]
        # the engine's NUMERIC dv columns are dense; a missing doc would
        # be an absent docvalues column (all-missing), handled above
        return (len(v), 0, float(v.sum()), float((v * v).sum()),
                float(v.min()), float(v.max()))

    parts = searcher._map_shards(partial,
                                 parallel=searcher._big_query(weights))
    n = sum(p[0] for p in parts)
    missing = sum(p[1] for p in parts)
    if not n:
        # matched docs in dv-less shards still count as missing
        return pa.table({"cnt": pa.array([0], pa.int64()),
                         "missing": pa.array([missing], pa.int64()),
                         "vmin": pa.array([None], pa.float64()),
                         "vmax": pa.array([None], pa.float64()),
                         "mean": pa.array([None], pa.float64()),
                         "variance": pa.array([None], pa.float64())})
    s = sum(p[2] for p in parts)
    sq = sum(p[3] for p in parts)
    vmin = min(p[4] for p in parts)
    vmax = max(p[5] for p in parts)
    mean = s / n
    # sample variance, the reference's (sumsq - n*mean^2) / (n - 1) form
    variance = (sq - n * mean * mean) / (n - 1) if n > 1 else 0.0
    rnd = (lambda x: float(_round_half_away_arr(np.array([x]), round_nd)[0])
           ) if round_nd is not None else (lambda x: x)
    return pa.table({
        "cnt": pa.array([n], pa.int64()),
        "missing": pa.array([missing], pa.int64()),
        "vmin": pa.array([rnd(vmin)], pa.float64()),
        "vmax": pa.array([rnd(vmax)], pa.float64()),
        "mean": pa.array([rnd(mean)], pa.float64()),
        "variance": pa.array([rnd(variance)], pa.float64()),
    })
