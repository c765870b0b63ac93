"""Span / proximity evaluation kernels (search/spans/*.java role).

The reference enumerates spans doc-at-a-time (NearSpansOrdered.java,
NearSpansUnordered.java); here candidate docs are the vectorized postings
intersection of all clauses, and only the surviving docs run the per-doc
window logic:

* ordered: for every anchor position of the FIRST clause, chain greedily to
  the smallest later position of each next clause (one searchsorted per
  clause, vectorized over all anchors at once); a window matches when
  (width - n_clauses) <= slop.
* unordered: the classic smallest-covering-range sweep over the k position
  lists (per candidate doc; lists are per-doc and short).

freq = the reference's sloppyFreq: each matching anchor/range contributes
1 / (1 + matchLength) where matchLength is the total gap between the
clause positions (SpanScorer.setFreqCurrentDoc accumulating
1/(1+spans.width()); NearSpansOrdered.stretchToOrder's matchWidth is the
gap sum, which for term subspans equals (range width - n_clauses)). The
float freq is scored through the phrase weight (blended clause stats)
exactly like the reference feeds sloppyFreq to Similarity.score.
"""

from __future__ import annotations

import heapq

import numpy as np

from .query import SpanFirst, SpanNear, SpanOrQ, SpanTerm


def _clause_positions(shard, clause):
    """{doc -> sorted position array} for a span clause (term or or-union)."""
    terms = (
        [clause.text] if isinstance(clause, SpanTerm)
        else [c.text for c in clause.clauses]
    )
    per_doc: dict[int, list] = {}
    for t in terms:
        docs, freqs, pos = shard.postings(t, with_positions=True)
        if not len(docs):
            continue
        cum = np.concatenate([[0], np.cumsum(freqs.astype(np.int64))])
        for i, d in enumerate(docs.tolist()):
            per_doc.setdefault(d, []).append(pos[cum[i]:cum[i + 1]])
    return {
        d: (np.sort(np.concatenate(ps)) if len(ps) > 1 else np.asarray(ps[0]))
        for d, ps in per_doc.items()
    }


def _ordered_sloppy_freq(pos_lists: list[np.ndarray], slop: int) -> float:
    """sloppyFreq over anchors of clause 0 that start an ordered window
    within slop: each contributes 1/(1+matchLength), matchLength = gap sum
    = (range width - n_clauses) for term subspans."""
    anchors = pos_lists[0].astype(np.int64)
    cur = anchors.copy()
    alive = np.ones(len(cur), dtype=bool)
    for pl in pos_lists[1:]:
        idx = np.searchsorted(pl, cur + 1)
        ok = idx < len(pl)
        alive &= ok
        cur[ok] = pl[idx[ok]]
    match_len = (cur - anchors + 1) - len(pos_lists)
    hit = alive & (match_len <= slop)
    return float(np.sum(1.0 / (1.0 + match_len[hit])))


def _unordered_sloppy_freq(pos_lists: list[np.ndarray], slop: int) -> float:
    """sloppyFreq over minimal covering ranges of one-position-per-clause:
    each range within slop contributes 1/(1+matchLength)."""
    k = len(pos_lists)
    ptrs = [0] * k
    heap = [(int(pl[0]), j) for j, pl in enumerate(pos_lists)]
    heapq.heapify(heap)
    hi = max(int(pl[0]) for pl in pos_lists)
    freq = 0.0
    while True:
        lo, j = heap[0]
        match_len = (hi - lo + 1) - k
        if match_len <= slop:
            freq += 1.0 / (1.0 + max(0, match_len))
        ptrs[j] += 1
        if ptrs[j] >= len(pos_lists[j]):
            break
        nxt = int(pos_lists[j][ptrs[j]])
        heapq.heapreplace(heap, (nxt, j))
        hi = max(hi, nxt)
    return freq


def eval_span_near(shard, node: SpanNear, weights, dtype):
    clause_pos = [_clause_positions(shard, c) for c in node.clauses]
    if not all(clause_pos):
        return np.zeros(0, np.int64), np.zeros(0, dtype)
    cand = set(clause_pos[0])
    for cp in clause_pos[1:]:
        cand &= set(cp)
    if not cand:
        return np.zeros(0, np.int64), np.zeros(0, dtype)
    docs_out, freqs_out = [], []
    fn = _ordered_sloppy_freq if node.in_order else _unordered_sloppy_freq
    for d in sorted(cand):
        f = fn([cp[d] for cp in clause_pos], node.slop)
        if f:
            docs_out.append(d)
            freqs_out.append(f)
    if not docs_out:
        return np.zeros(0, np.int64), np.zeros(0, dtype)
    docs = np.asarray(docs_out, dtype=np.int64)
    freqs = np.asarray(freqs_out, dtype=np.float64)
    from .bm25 import score_postings

    tw = weights[_span_key(node)]
    norms = shard.norms_for(docs)
    return docs, score_postings(tw, freqs, norms, dtype)


def eval_span_first(shard, node: SpanFirst, weights, dtype):
    cp = _clause_positions(shard, node.clause)
    docs_out, freqs_out = [], []
    for d in sorted(cp):
        f = int(np.count_nonzero(cp[d] < node.end))
        if f:
            docs_out.append(d)
            freqs_out.append(f)
    if not docs_out:
        return np.zeros(0, np.int64), np.zeros(0, dtype)
    docs = np.asarray(docs_out, dtype=np.int64)
    freqs = np.asarray(freqs_out, dtype=np.int32)
    from .bm25 import score_postings

    tw = weights[_span_key(node)]
    norms = shard.norms_for(docs)
    return docs, score_postings(tw, freqs, norms, dtype)


def eval_span_not(shard, node, weights, dtype):
    """SpanNotQuery: include positions surviving when no exclude position
    lies in [p - pre, p + post] (one-position clauses; SpanNotQuery.java)."""
    cp_inc = _clause_positions(shard, node.include)
    if not cp_inc:
        return np.zeros(0, np.int64), np.zeros(0, dtype)
    cp_exc = _clause_positions(shard, node.exclude)
    docs_out, freqs_out = [], []
    for d in sorted(cp_inc):
        pos = cp_inc[d]
        exc = cp_exc.get(d)
        if exc is None:
            f = len(pos)
        else:
            # survivor: no exclude position in [p - pre, p + post]
            lo = np.searchsorted(exc, pos - node.pre, side="left")
            hi = np.searchsorted(exc, pos + node.post, side="right")
            f = int(np.count_nonzero(lo == hi))
        if f:
            docs_out.append(d)
            freqs_out.append(f)
    if not docs_out:
        return np.zeros(0, np.int64), np.zeros(0, dtype)
    docs = np.asarray(docs_out, dtype=np.int64)
    freqs = np.asarray(freqs_out, dtype=np.int32)
    from .bm25 import score_postings

    tw = weights[_span_key(node)]
    norms = shard.norms_for(docs)
    return docs, score_postings(tw, freqs, norms, dtype)


def span_clause_terms(clause) -> list[str]:
    if isinstance(clause, SpanTerm):
        return [clause.text]
    if isinstance(clause, SpanOrQ):
        return [c.text for c in clause.clauses]
    raise TypeError(f"unsupported span clause {clause!r}")


def _span_key(node):
    from .query import SpanNot

    if isinstance(node, SpanNot):
        # scored from the INCLUDE clause (exclude only filters)
        return ("\x1fSPANN\x1f" + "|".join(span_clause_terms(node.include)),
                node.boost)
    if isinstance(node, SpanNear):
        return (
            "\x1fSPAN\x1f".join("|".join(span_clause_terms(c)) for c in node.clauses),
            node.boost,
        )
    return ("\x1fSPANF\x1f" + "|".join(span_clause_terms(node.clause)), node.boost)
