"""Explanation trees — IndexSearcher.explain / Weight.explain.

Reference: lucene/core/.../search/Explanation.java:27 (a value, a
description, nested details; isMatch). The reference builds the tree
inside each Weight's explain(); here one recursive walker re-derives the
per-clause contributions for a single document from the same kernels the
scorer uses, so explained values are EXACTLY the scored values (the
explain-equals-score invariant TestExplanations enforces).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .executor import eval_node, resolve_weights
from .query import (
    Bool,
    ConstantScore,
    DisMax,
    MatchAll,
    Phrase,
    Synonym,
    Term,
)


@dataclass
class Explanation:
    value: float
    description: str
    details: list = field(default_factory=list)
    is_match: bool = True

    def to_dict(self) -> dict:
        return {"match": self.is_match, "value": self.value,
                "description": self.description,
                "details": [d.to_dict() for d in self.details]}

    def __str__(self, indent: int = 0) -> str:
        pad = "  " * indent
        head = f"{pad}{self.value:.6f} = {self.description}"
        return "\n".join([head] + [d.__str__(indent + 1)
                                   for d in self.details])


def _no_match(desc: str) -> Explanation:
    return Explanation(0.0, f"no matching term ({desc})", is_match=False)


def _shard_of(searcher, doc_id: int):
    for s in searcher.reader.shards:
        i = np.searchsorted(s.doc_ids, doc_id)
        if i < len(s.doc_ids) and s.doc_ids[i] == doc_id:
            return s
    return None


def _score_of(searcher, node, doc_id: int, weights) -> float | None:
    """The node's exact score for one doc (None = no match), re-derived
    through the production eval path on the doc's shard."""
    shard = _shard_of(searcher, doc_id)
    if shard is None:
        return None
    docs, scores = eval_node(shard, node, weights, searcher.dtype)
    i = np.searchsorted(docs, doc_id)
    if i < len(docs) and docs[i] == doc_id:
        return float(scores[i])
    return None


def _explain_leaf(searcher, node, doc_id: int, weights) -> Explanation:
    sc = _score_of(searcher, node, doc_id, weights)
    if isinstance(node, Term):
        if sc is None:
            return _no_match(f"term {node.text!r} not in doc {doc_id}")
        shard = _shard_of(searcher, doc_id)
        d, f = shard.postings(node.text)
        i = np.searchsorted(d, doc_id)
        freq = int(f[i])
        tw = weights[(node.text, node.boost)]
        norm = int(shard.norms_for(np.asarray([doc_id]),
                                   tw.norm_field)[0])
        from ..util.smallfloat import byte4_to_int

        return Explanation(sc, f"weight(text:{node.text} in {doc_id}) "
                               f"[BM25], product of:", [
            Explanation(float(tw.weight),
                        f"boost({node.boost}) * idf, df={tw.df}"),
            Explanation(sc / float(tw.weight) if tw.weight else 0.0,
                        f"tf saturation, freq={freq}, "
                        f"dl(quantized)={byte4_to_int(norm)}"),
        ])
    if sc is None:
        return _no_match(type(node).__name__)
    return Explanation(sc, f"{type(node).__name__} score")


def explain(searcher, query, doc_id: int) -> Explanation:
    """IndexSearcher.explain(query, doc) — the per-clause score breakdown
    for one document."""
    node = searcher._node(query)
    weights = resolve_weights(searcher.reader, node, searcher.params,
                              searcher.dtype)
    return _explain_node(searcher, node, int(doc_id), weights)


def _explain_node(searcher, node, doc_id: int, weights) -> Explanation:
    if isinstance(node, Bool):
        det = []
        total = 0.0
        matched_required = True
        for c in node.must:
            e = _explain_node(searcher, c, doc_id, weights)
            det.append(e)
            matched_required &= e.is_match
            total += e.value
        for c in node.should:
            e = _explain_node(searcher, c, doc_id, weights)
            if e.is_match:
                det.append(e)
                total += e.value
        for c in node.filter:
            sc = _score_of(searcher, c, doc_id, weights)
            ok = sc is not None
            det.append(Explanation(0.0, "FILTER clause", is_match=ok))
            matched_required &= ok
        for c in node.must_not:
            sc = _score_of(searcher, c, doc_id, weights)
            if sc is not None:
                det.append(Explanation(0.0, "MUST_NOT clause matched",
                                       is_match=False))
                matched_required = False
        # min_should quorum
        n_should = sum(1 for c in node.should
                       if _score_of(searcher, c, doc_id, weights)
                       is not None)
        if node.min_should > 0 and n_should < node.min_should:
            matched_required = False
        if not matched_required or (not node.must and node.should
                                    and n_should == 0):
            return Explanation(0.0, "BooleanQuery: no match", det, False)
        return Explanation(total, "sum of:", det)
    if isinstance(node, DisMax):
        det = [_explain_node(searcher, c, doc_id, weights)
               for c in node.clauses]
        hits = [e for e in det if e.is_match]
        if not hits:
            return Explanation(0.0, "DisjunctionMax: no match", det, False)
        mx = max(e.value for e in hits)
        sm = sum(e.value for e in hits)
        return Explanation(mx + node.tiebreak * (sm - mx),
                           f"max plus {node.tiebreak} times others of:",
                           det)
    if isinstance(node, ConstantScore):
        sc = _score_of(searcher, node, doc_id, weights)
        if sc is None:
            return _no_match("ConstantScore")
        return Explanation(sc, "ConstantScore")
    if isinstance(node, MatchAll):
        return Explanation(node.boost, "MatchAllDocsQuery")
    if isinstance(node, (Phrase, Synonym)):
        sc = _score_of(searcher, node, doc_id, weights)
        if sc is None:
            return _no_match(type(node).__name__)
        return Explanation(sc, f"{type(node).__name__} "
                               f"({'/'.join(node.terms)})")
    return _explain_leaf(searcher, node, doc_id, weights)
