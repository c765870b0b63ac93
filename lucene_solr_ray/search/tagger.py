"""SolrTextTagger (solr/core/.../handler/tagger/Tagger.java:40,
TaggerRequestHandler.java:80): find all dictionary phrases occurring in
each document's token stream and emit (doc, start, end, tag) spans, with
the reference's overlap policies (TagClusterReducer.java:32-102):

  ALL                     every match
  NO_SUB                  drop matches contained inside another match
  LONGEST_DOMINANT_RIGHT  repeatedly keep the longest match (ties -> the
                          right-most), removing whatever overlaps it

The reference walks an FST of the dictionary; here the dictionary compiles
once per actor into a first-token -> phrase-suffixes map (longest first),
broadcast via ray.put — the corpus streams through a stateless
map_batches, the dictionary never re-ships per batch. Offsets are TOKEN
positions (the engine's analysis chain is position-based; char offsets
would come from the offsets sidecar the same way highlighting gets them).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset


def compile_dictionary(phrases: list[str]) -> dict:
    """first-token -> list of (token_tuple, phrase_text), longest first."""
    from ..analysis.analyzers import analyze_fast, standard_analyzer

    by_first: dict[str, list] = {}
    for p in phrases:
        terms = analyze_fast(p)
        if terms is None:
            terms, _ = standard_analyzer(p)
        if not terms:
            continue
        entry = (tuple(terms), p)
        # dedupe repeated (token_tuple, phrase) entries: a duplicate would
        # produce duplicate spans that defeat _reduce_ldr's one-at-a-time
        # survivor removal
        if entry not in by_first.setdefault(terms[0], []):
            by_first[terms[0]].append(entry)
    for v in by_first.values():
        v.sort(key=lambda x: -len(x[0]))
    return by_first


def _reduce_no_sub(spans: list[tuple[int, int, str]]):
    """Drop spans strictly contained in (or equal to but shorter-listed
    than) another span (TagClusterReducer.NO_SUB:38-56)."""
    out = []
    for i, (s, e, t) in enumerate(spans):
        contained = any(
            (s2 <= s and e2 >= e and (s2, e2) != (s, e))
            or ((s2, e2) == (s, e) and j < i and t2 == t)
            for j, (s2, e2, t2) in enumerate(spans) if j != i)
        if not contained:
            out.append((s, e, t))
    return out


def _reduce_ldr(spans: list[tuple[int, int, str]]):
    """LONGEST_DOMINANT_RIGHT (:59-102): keep the longest (ties -> the
    right-most), drop overlaps, repeat."""
    alive = sorted(spans)
    kept = []
    while alive:
        best = None
        for sp in alive:  # forward scan; >= makes later equal-length win
            if best is None or (sp[1] - sp[0]) >= (best[1] - best[0]):
                best = sp
        kept.append(best)
        alive = [sp for sp in alive
                 if sp == best or sp[1] <= best[0] or sp[0] >= best[1]]
        alive.remove(best)
    return sorted(kept)


def tag_documents(ds: Dataset, key_col: str, text_col: str,
                  phrases: list[str],
                  overlaps: str = "NO_SUB") -> Dataset:
    """Tag every doc against the phrase dictionary -> Dataset of
    (key, start, end, tag); start/end are token positions, end exclusive."""
    if overlaps not in ("ALL", "NO_SUB", "LONGEST_DOMINANT_RIGHT"):
        raise ValueError(f"unknown overlaps policy {overlaps!r}")
    dict_ref = ray.put(compile_dictionary(phrases))

    def tag(t: pa.Table) -> pa.Table:
        from ..analysis.analyzers import analyze_fast, standard_analyzer

        by_first = ray.get(dict_ref)
        keys = t[key_col].to_numpy(zero_copy_only=False)
        out_k: list = []
        out_s: list[int] = []
        out_e: list[int] = []
        out_t: list[str] = []
        for kid, txt in zip(keys, t[text_col].to_pylist()):
            terms = analyze_fast(txt or "")
            if terms is None:
                terms, _ = standard_analyzer(txt or "")
            n = len(terms)
            # anchor positions = dictionary first-token hits (numpy mask
            # over the token array keeps the scan vectorized; candidate
            # verification only runs at anchors)
            arr = np.asarray(terms, dtype=object)
            hits = np.flatnonzero(
                np.isin(arr, np.asarray(list(by_first), dtype=object)))
            spans: list[tuple[int, int, str]] = []
            for i in hits.tolist():
                for toks, label in by_first[terms[i]]:
                    L = len(toks)
                    if i + L <= n and tuple(terms[i:i + L]) == toks:
                        spans.append((i, i + L, label))
            if overlaps == "NO_SUB":
                spans = _reduce_no_sub(spans)
            elif overlaps == "LONGEST_DOMINANT_RIGHT":
                spans = _reduce_ldr(spans)
            spans.sort()
            for s, e, label in spans:
                out_k.append(kid)
                out_s.append(s)
                out_e.append(e)
                out_t.append(label)
        return pa.table({
            key_col: pa.array(out_k, t[key_col].type),
            "start_pos": pa.array(out_s, pa.int64()),
            "end_pos": pa.array(out_e, pa.int64()),
            "tag": pa.array(out_t, pa.large_string()),
        })

    out = ds.select_columns([key_col, text_col]).map_batches(
        tag, batch_format="pyarrow")
    # a partition whose every doc tags to zero spans yields empty blocks;
    # union a typed empty block so the schema survives (same guard as
    # dedup/ops.py _ensure_schema — avoids the RefBundle schema-drop)
    s = ds.schema()
    key_type = dict(zip(s.names, s.types))[key_col]
    empty = pa.table({
        key_col: pa.array([], key_type),
        "start_pos": pa.array([], pa.int64()),
        "end_pos": pa.array([], pa.int64()),
        "tag": pa.array([], pa.large_string()),
    })
    import ray.data as _rd

    return out.union(_rd.from_arrow(empty))
