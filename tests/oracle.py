"""Brute-force in-memory BM25 oracle (no index, no pruning, no sharding).

Independent of the index build/merge/encode machinery — only the analyzer
and the float-exact BM25 kernels are shared (those are unit-tested on their
own). Mirrors the reference's CheckHits/TestWANDScorer test pattern:
engine results must equal exhaustive brute-force results.
"""

from __future__ import annotations

import numpy as np

from lucene_solr_ray.analysis import standard_analyzer
from lucene_solr_ray.search.bm25 import (
    BM25Params,
    multi_term_weight,
    score_postings,
    term_weight,
)
from lucene_solr_ray.util.smallfloat import int_to_byte4


class BruteForceIndex:
    def __init__(self, doc_ids, texts, params=BM25Params(), dtype=np.float32):
        self.params = params
        self.dtype = dtype
        self.postings: dict[str, dict[int, int]] = {}
        self.positions: dict[str, dict[int, list[int]]] = {}
        self.norm: dict[int, int] = {}
        self.sum_dl = 0
        self.N = len(doc_ids)
        for did, text in zip(doc_ids, texts):
            terms, pos = standard_analyzer(text or "")
            self.norm[did] = int_to_byte4(len(terms))
            self.sum_dl += len(terms)
            for t, p in zip(terms, pos):
                self.postings.setdefault(t, {}).setdefault(did, 0)
                self.postings[t][did] += 1
                self.positions.setdefault(t, {}).setdefault(did, []).append(p)

    def term_scores(self, term: str, boost=1.0) -> dict[int, float]:
        plist = self.postings.get(term, {})
        tw = term_weight(len(plist), self.N, self.sum_dl, self.params, boost, self.dtype)
        out = {}
        for did, f in plist.items():
            s = score_postings(
                tw, np.asarray([f]), np.asarray([self.norm[did]]), self.dtype
            )[0]
            out[did] = s
        return out

    def phrase_scores(self, terms, boost=1.0) -> dict[int, float]:
        cand = None
        for t in terms:
            docs = set(self.positions.get(t, {}))
            cand = docs if cand is None else cand & docs
        if not cand:
            return {}
        dfs = [len(self.postings.get(t, {})) for t in terms]
        tw = multi_term_weight(dfs, self.N, self.sum_dl, self.params, boost, self.dtype)
        out = {}
        for did in cand:
            base = set(self.positions[terms[0]][did])
            for i, t in enumerate(terms[1:], 1):
                base &= {p - i for p in self.positions[t][did]}
            if base:
                out[did] = score_postings(
                    tw, np.asarray([len(base)]), np.asarray([self.norm[did]]), self.dtype
                )[0]
        return out

    def eval(self, node) -> dict[int, float]:
        from lucene_solr_ray.search.query import Bool, Phrase, Term

        if isinstance(node, Term):
            return self.term_scores(node.text, node.boost)
        if isinstance(node, Phrase):
            return self.phrase_scores(list(node.terms), node.boost)
        assert isinstance(node, Bool)
        # clause scores accumulate in double, cast to scoring dtype at the
        # boolean boundary (Disjunction/ConjunctionScorer double-sum rule)
        if node.must:
            parts = [self.eval(c) for c in node.must]
            docs = set(parts[0])
            for p in parts[1:]:
                docs &= set(p)
            acc = {d: sum(float(p[d]) for p in parts) for d in docs}
            for c in node.should:
                p = self.eval(c)
                for d in list(acc):
                    if d in p:
                        acc[d] += float(p[d])
            out = {d: self.dtype(s) for d, s in acc.items()}
        else:
            accd: dict[int, float] = {}
            counts: dict[int, int] = {}
            for c in node.should:
                p = self.eval(c)
                for d, s in p.items():
                    accd[d] = accd.get(d, 0.0) + float(s)
                    counts[d] = counts.get(d, 0) + 1
            if node.min_should > 1:
                accd = {d: s for d, s in accd.items() if counts[d] >= node.min_should}
            out = {d: self.dtype(s) for d, s in accd.items()}
        for c in node.must_not:
            for d in self.eval(c):
                out.pop(d, None)
        return out

    def top_k(self, node, k=10):
        scores = self.eval(node)
        items = sorted(scores.items(), key=lambda kv: (-float(kv[1]), kv[0]))[:k]
        return [d for d, _ in items], [float(s) for _, s in items]
