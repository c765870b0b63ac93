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


def significant_terms(searcher: IndexSearcher, query: str, top_n: int = 10,
                      min_df: int = 2) -> pa.Table:
    """Terms over-represented in the matching set vs the background.

    Score = (fg_df / fg_size) / (bg_df / N) (simple lift, as in the
    reference's default significance heuristics)."""
    node = searcher._node(query)
    res = searcher.match_all(node)
    fg_ids = set(res["doc_id"].to_pylist())
    fg_size = len(fg_ids)
    if fg_size == 0:
        return pa.table({"term": pa.array([], pa.string()),
                         "score": pa.array([], pa.float64()),
                         "fg_df": pa.array([], pa.int64()),
                         "bg_df": pa.array([], pa.int64())})
    N = searcher.reader.doc_count
    # foreground df per term: walk each shard's dictionary once
    from collections import Counter

    fg: Counter = Counter()
    bg: dict[str, int] = {}
    for s in searcher.reader.shards:
        for term in np.unique(s.terms).tolist():
            docs, _ = s.postings(term)
            bg[term] = bg.get(term, 0) + len(docs)
            if fg_size < len(docs):
                hits = len(fg_ids.intersection(docs.tolist()))
            else:
                hits = int(np.isin(docs, np.fromiter(fg_ids, dtype=np.int64)).sum())
            if hits:
                fg[term] += hits
    rows = []
    for term, fdf in fg.items():
        bdf = bg[term]
        if bdf < min_df:
            continue
        lift = (fdf / fg_size) / (bdf / N)
        rows.append((lift, term, fdf, bdf))
    rows.sort(key=lambda r: (-r[0], r[1]))
    rows = rows[:top_n]
    return pa.table({
        "term": pa.array([r[1] for r in rows], pa.string()),
        "score": pa.array([round(r[0], 6) for r in rows], pa.float64()),
        "fg_df": pa.array([r[2] for r in rows], pa.int64()),
        "bg_df": pa.array([r[3] for r in rows], pa.int64()),
    })
