"""MemoryIndex: a single-batch in-RAM index for percolation.

The reference's MemoryIndex (lucene/memory/.../MemoryIndex.java:178) indexes
one document in RAM so registered queries can run against it; here one
*batch* of documents is indexed (dict postings) and evaluated with the same
query AST the main engine uses. Scores are not needed for percolation — this
returns matching doc sets.
"""

from __future__ import annotations

from ..analysis import standard_analyzer
from .query import Bool, Phrase, Term


class MemoryIndex:
    def __init__(self, doc_ids, texts):
        self.postings: dict[str, dict[int, list[int]]] = {}
        self.all_docs: set[int] = set()
        for did, text in zip(doc_ids, texts):
            self.all_docs.add(did)
            terms, pos = standard_analyzer(text or "")
            for t, p in zip(terms, pos):
                self.postings.setdefault(t, {}).setdefault(did, []).append(p)

    def matches(self, node) -> set[int]:
        if node is None:
            return set()
        if isinstance(node, Term):
            return set(self.postings.get(node.text, {}))
        if isinstance(node, Phrase):
            out = set()
            cand = None
            for t in node.terms:
                docs = set(self.postings.get(t, {}))
                cand = docs if cand is None else cand & docs
            for d in cand or ():
                base = set(self.postings[node.terms[0]][d])
                for i, t in enumerate(node.terms[1:], 1):
                    base &= {p - i for p in self.postings[t][d]}
                    if not base:
                        break
                if base:
                    out.add(d)
            return out
        if isinstance(node, Bool):
            if node.must:
                out = self.matches(node.must[0])
                for c in node.must[1:]:
                    out &= self.matches(c)
            elif node.should:
                sets = [self.matches(c) for c in node.should]
                if node.min_should > 1:
                    from collections import Counter

                    cnt: Counter = Counter()
                    for s in sets:
                        cnt.update(s)
                    out = {d for d, n in cnt.items() if n >= node.min_should}
                else:
                    out = set().union(*sets)
            else:
                out = set()
            for c in node.must_not:
                out -= self.matches(c)
            return out
        from .multiterm import MULTI_TERM_TYPES, expand_terms

        if isinstance(node, MULTI_TERM_TYPES):
            # expand against THIS document set's vocabulary (the reference's
            # Monitor rewrites multi-term queries per MemoryIndex segment);
            # the sorted vocab is immutable after __init__ — build it once,
            # not per registered pattern query
            import numpy as np

            vocab = getattr(self, "_vocab", None)
            if vocab is None:
                vocab = np.sort(np.asarray(list(self.postings), dtype=object))
                self._vocab = vocab
            out: set[int] = set()
            for t in expand_terms(vocab, node):
                out |= set(self.postings.get(t, {}))
            return out
        raise TypeError(f"MemoryIndex does not support {type(node).__name__}")
