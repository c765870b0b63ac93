"""Declarative search-component pipeline (the Solr SearchHandler role).

The reference's SearchHandler iterates an ordered component list — query,
facet, highlight, stats, spellcheck — each reading the request params and
adding its section to the response
(solr/core/.../component/SearchHandler.java:281 process loop;
QueryComponent / FacetComponent / HighlightComponent / StatsComponent /
SpellCheckComponent). Here a request is a plain params dict (Solr-style
names) and the handler returns the response dict; components are pluggable
via `register_component`.

Supported params (the Solr names):
    q, rows                        -> response.docs / numFound (QueryComponent)
    sort: "<field> asc|desc"       -> docvalues sort instead of score
    facet, facet.field (list|csv)  -> facet_counts.facet_fields
    stats, stats.field             -> stats.stats_fields (min/max/sum/mean/count)
    hl, hl.fl ignored (text field), hl.snippets window -> highlighting
    spellcheck, spellcheck.q       -> spellcheck.suggestions

Ray-side: each component runs the engine's distributed primitives; the
handler itself is driver-side orchestration only (as the reference's is).
"""

from __future__ import annotations

from typing import Callable

import numpy as np

COMPONENTS: dict[str, Callable] = {}


def register_component(name: str):
    def deco(fn):
        COMPONENTS[name] = fn
        return fn
    return deco


def _csv(v) -> list[str]:
    if isinstance(v, (list, tuple)):
        return list(v)
    return [x.strip() for x in str(v).split(",") if x.strip()]


@register_component("query")
def _query_component(ctx: dict, params: dict, resp: dict) -> None:
    searcher = ctx["searcher"]
    q = params.get("q", "*:*")
    rows = int(params.get("rows", 10))
    sort = params.get("sort")
    if sort:
        from ..search.services import search_sorted_by_field

        bits = sort.split()
        t = search_sorted_by_field(
            searcher, q, bits[0], k=rows,
            descending=(len(bits) > 1 and bits[1].lower() == "desc"))
        docs = t.to_pylist()
        num_found = searcher.count(q)
    else:
        t = searcher.search(q, k=rows)
        docs = t.to_pylist()
        num_found = searcher.count(q)
    resp["response"] = {"numFound": int(num_found), "docs": docs}


@register_component("facet")
def _facet_component(ctx: dict, params: dict, resp: dict) -> None:
    if not params.get("facet"):
        return
    from ..search.services import facet_keyword_field

    out = {}
    for field in _csv(params.get("facet.field", [])):
        t = facet_keyword_field(ctx["index_dir"], field,
                                query=params.get("q") or None)
        out[field] = {r["value"]: int(r["cnt"]) for r in t.to_pylist()}
    resp["facet_counts"] = {"facet_fields": out}


@register_component("stats")
def _stats_component(ctx: dict, params: dict, resp: dict) -> None:
    if not params.get("stats"):
        return
    searcher = ctx["searcher"]
    out = {}
    for field in _csv(params.get("stats.field", [])):
        vals = []
        for s in searcher.reader.shards:
            if field == "doclen":
                v = s.doclens
            elif field in getattr(s, "docvalues", {}):
                v = s.docvalues[field]
            else:
                continue
            if s._live_mask is not None:
                v = v[s._live_mask]
            vals.append(np.asarray(v, dtype=np.float64))
        if not vals:
            continue
        v = np.concatenate(vals)
        out[field] = {"min": float(v.min()), "max": float(v.max()),
                      "count": int(len(v)), "sum": float(v.sum()),
                      "mean": float(v.mean())}
    resp["stats"] = {"stats_fields": out}


@register_component("highlight")
def _highlight_component(ctx: dict, params: dict, resp: dict) -> None:
    if not params.get("hl") or "response" not in resp:
        return
    from ..search.services import highlight

    corpus = ctx.get("corpus_paths")
    if not corpus:
        return
    from ..search.services import fetch_stored

    ids = [d["doc_id"] for d in resp["response"]["docs"]]
    terms = {t.lower() for t in str(params.get("q", "")).split()
             if t and t.upper() not in ("AND", "OR", "NOT")}
    stored = fetch_stored(corpus, ctx.get("key_col", "doc_id"), ids,
                          columns=[ctx.get("key_col", "doc_id"),
                                   ctx.get("text_col", "text")])
    text_of = dict(zip(stored[ctx.get("key_col", "doc_id")].to_pylist(),
                       stored[ctx.get("text_col", "text")].to_pylist()))
    searcher = ctx["searcher"]
    if searcher.reader.manifest.get("config", {}).get("store_offsets"):
        # HighlightComponent picks the postings-offset source when the
        # field indexed offsets (UnifiedHighlighter.getOffsetSource) — no
        # re-analysis of matched docs
        from ..search.services import collect_offset_spans, passage_from_offsets

        spans = collect_offset_spans(searcher, sorted(terms), ids)
        resp["highlighting"] = {
            int(i): (passage_from_offsets(
                        text_of.get(i, ""), np.asarray(spans[int(i)], np.int64))
                     if spans.get(int(i))
                     else highlight(text_of.get(i, ""), terms))
            for i in ids}
        return
    resp["highlighting"] = {
        int(i): highlight(text_of.get(i, ""), terms) for i in ids}


@register_component("spellcheck")
def _spellcheck_component(ctx: dict, params: dict, resp: dict) -> None:
    if not params.get("spellcheck"):
        return
    from ..search.services import spell_correct

    word = params.get("spellcheck.q") or params.get("q", "")
    out = {}
    for w in str(word).split():
        sugg = spell_correct(ctx["searcher"], w.lower())
        if sugg:
            out[w] = sugg
    resp["spellcheck"] = {"suggestions": out}


DEFAULT_CHAIN = ("query", "facet", "stats", "highlight", "spellcheck")


def handle_request(index_dir: str, params: dict,
                   components: tuple = DEFAULT_CHAIN,
                   corpus_paths=None, key_col: str = "doc_id",
                   text_col: str = "text") -> dict:
    """Run the component chain over one request; returns the response dict
    (SearchHandler.handleRequestBody:281 — components execute in declared
    order, each contributing its response section)."""
    from ..search import IndexSearcher

    ctx = {"index_dir": index_dir,
           "searcher": IndexSearcher(index_dir),
           "corpus_paths": corpus_paths,
           "key_col": key_col, "text_col": text_col}
    resp: dict = {}
    for name in components:
        if name not in COMPONENTS:
            raise ValueError(f"unknown component {name!r}")
        COMPONENTS[name](ctx, params, resp)
    return resp
