"""Multi-term query rewriting (the reference's MultiTermQuery rewrite).

Prefix / Wildcard / Regexp / TermRange / TermInSet rewrite to a
constant-score filter over the expanded term set (the reference's
CONSTANT_SCORE_REWRITE default — matching docs score `boost`). Fuzzy
rewrites to a Synonym over the terms within edit distance (the reference
blends stats via TopTermsBlendedFreqScoringRewrite; the synonym rewrite —
summed tf, max df — is the documented approximation). Expansion scans the
sorted term dictionary: ranges by binary search, patterns by a compiled
regex over the dictionary slice (an FST/automaton intersection is the scale
path; a sorted-column scan is the idiomatic Arrow substitution,
SURVEY.md §2.3).

Expansion is GLOBAL (union over shards) so scoring stats are consistent
across shards regardless of which shard holds which matching term.
"""

from __future__ import annotations

import re

import numpy as np

from .query import (
    Bool,
    ConstantScore,
    DisMax,
    Fuzzy,
    MatchAll,
    Phrase,
    Prefix,
    Regexp,
    Synonym,
    Term,
    TermInSet,
    TermRange,
    Wildcard,
)


def _levenshtein_leq(a: str, b: str, k: int) -> bool:
    """Restricted Damerau-Levenshtein distance(a, b) <= k.

    Adjacent transpositions count as ONE edit, matching the reference's
    FuzzyQuery default (transpositions=true, LevenshteinAutomata with
    transpositions — search/FuzzyQuery.java:56): 'ab'~1 matches 'ba'.
    Early-exits when a full row exceeds k."""
    if abs(len(a) - len(b)) > k:
        return False
    prev2: list[int] | None = None
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i] + [0] * len(b)
        lo = len(b) + 1
        for j, cb in enumerate(b, 1):
            c = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            if (
                prev2 is not None and i > 1 and j > 1
                and ca == b[j - 2] and a[i - 2] == cb
            ):
                c = min(c, prev2[j - 2] + 1)
            cur[j] = c
            lo = min(lo, c)
        if lo > k:
            return False
        prev2 = prev
        prev = cur
    return prev[-1] <= k


def _wildcard_to_regex(pattern: str) -> str:
    out = []
    for ch in pattern:
        if ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        else:
            out.append(re.escape(ch))
    return "".join(out)


def expand_terms(terms_sorted: np.ndarray, node) -> list[str]:
    """Matching dictionary terms for one multi-term node, one shard dict."""
    n = len(terms_sorted)
    if isinstance(node, Prefix):
        lo = np.searchsorted(terms_sorted, node.prefix, side="left")
        hi = np.searchsorted(terms_sorted, node.prefix + "\U0010FFFF", side="right")
        return terms_sorted[lo:hi].tolist()
    if isinstance(node, TermRange):
        lo = 0 if node.lower is None else int(
            np.searchsorted(terms_sorted, node.lower,
                            side="left" if node.include_lower else "right")
        )
        hi = n if node.upper is None else int(
            np.searchsorted(terms_sorted, node.upper,
                            side="right" if node.include_upper else "left")
        )
        return terms_sorted[lo:hi].tolist()
    if isinstance(node, (Wildcard, Regexp)):
        pat = _wildcard_to_regex(node.pattern) if isinstance(node, Wildcard) else node.pattern
        rx = re.compile(pat)
        # narrow the scan with the literal prefix when one exists
        m = re.match(r"^[^.*?+\[\](){}\\|^$]+", pat)
        if m and isinstance(node, Wildcard):
            pre = node.pattern[: len(m.group())]
            lo = np.searchsorted(terms_sorted, pre, side="left")
            hi = np.searchsorted(terms_sorted, pre + "\U0010FFFF", side="right")
            cand = terms_sorted[lo:hi]
        else:
            cand = terms_sorted
        return [t for t in cand.tolist() if rx.fullmatch(t)]
    if isinstance(node, Fuzzy):
        k = node.max_edits
        return [
            t for t in terms_sorted.tolist()
            if abs(len(t) - len(node.text)) <= k and _levenshtein_leq(t, node.text, k)
        ]
    raise TypeError(f"not a multi-term node: {node}")


MULTI_TERM_TYPES = (Prefix, Wildcard, Regexp, TermRange, Fuzzy)


def rewrite(node, expander):
    """Rewrite multi-term nodes into primitive ones.

    `expander(node) -> list[str]` returns the globally-unioned matching
    terms. Constant-score nodes become ConstantScore(TermInSet); Fuzzy
    becomes Synonym (blended-stats approximation).
    """
    if node is None or isinstance(node, (Term, Phrase, MatchAll, TermInSet, Synonym)):
        return node
    if isinstance(node, Fuzzy):
        terms = expander(node)
        if not terms:
            return Bool()
        return Synonym(tuple(terms), node.boost)
    if isinstance(node, MULTI_TERM_TYPES):
        terms = expander(node)
        if not terms:
            return Bool()
        return ConstantScore(TermInSet(tuple(terms)), node.boost)
    from .query import Covering, MultiPhrase, PhraseWildcard

    if isinstance(node, PhraseWildcard):
        # PhraseWildcardQuery rewrite: expand every pattern position against
        # the term dictionary (globally unioned; the reference expands per
        # segment under the same expansion budget —
        # sandbox/search/PhraseWildcardQuery.java), then evaluate as a
        # MultiPhrase through the exact union-positions matcher.
        positions = []
        for p in node.positions:
            if isinstance(p, str):
                positions.append((p,))
            elif isinstance(p, Term):
                positions.append((p.text,))
            else:
                terms = expander(p)
                if not terms:
                    return Bool()  # a position with no matching term: no docs
                positions.append(tuple(terms[: node.max_expansions]))
        if all(len(p) == 1 for p in positions):
            return Phrase(tuple(p[0] for p in positions), node.boost,
                          node.slop)
        return MultiPhrase(tuple(positions), node.boost, node.slop)
    if isinstance(node, Covering):
        return Covering(tuple(rewrite(c, expander) for c in node.clauses),
                        node.min_match_field, node.boost)
    from .query import IntervalQuery

    if isinstance(node, IntervalQuery):
        from .intervals import expand_multiterm

        return IntervalQuery(expand_multiterm(node.source, expander),
                             node.boost)
    from .query import SpanFirst, SpanNear, SpanNot, SpanOrQ, SpanTerm

    if isinstance(node, (SpanNear, SpanNot, SpanFirst, SpanOrQ)):
        # ComplexPhraseQuery.rewrite (queryparser/complexPhrase/
        # ComplexPhraseQueryParser.java:263-335): embedded multi-terms
        # expand against the term dictionary into SpanOr unions; a clause
        # with no matching term kills the whole span query.
        def span_clause(c):
            if isinstance(c, SpanTerm):
                return [c]
            if isinstance(c, SpanOrQ):
                flat: list = []
                for m in c.clauses:
                    got = span_clause(m)
                    if got is None:
                        return None
                    flat.extend(got)
                return flat
            if isinstance(c, MULTI_TERM_TYPES):  # Fuzzy is a member
                terms = expander(c)
                return [SpanTerm(t) for t in terms] if terms else None
            return [c]

        def one(c):
            got = span_clause(c)
            if got is None or not got:
                return None
            return got[0] if len(got) == 1 else SpanOrQ(tuple(got))

        if isinstance(node, SpanOrQ):
            return one(node) or Bool()
        if isinstance(node, SpanNear):
            new = [one(c) for c in node.clauses]
            if any(c is None for c in new):
                return Bool()
            return SpanNear(tuple(new), node.slop, node.in_order,
                            node.boost)
        if isinstance(node, SpanNot):
            inc, exc = one(node.include), one(node.exclude)
            if inc is None:
                return Bool()
            if exc is None:  # nothing to exclude: include spans stand
                return SpanNot(inc, SpanTerm("\x00none"), node.pre,
                               node.post, node.boost)
            return SpanNot(inc, exc, node.pre, node.post, node.boost)
        inc = one(node.clause)
        if inc is None:
            return Bool()
        return SpanFirst(inc, node.end, node.boost)
    if isinstance(node, ConstantScore):
        return ConstantScore(rewrite(node.query, expander), node.boost)
    if isinstance(node, DisMax):
        return DisMax(tuple(rewrite(c, expander) for c in node.clauses), node.tiebreak)
    if isinstance(node, Bool):
        return Bool(
            must=[rewrite(c, expander) for c in node.must],
            should=[rewrite(c, expander) for c in node.should],
            must_not=[rewrite(c, expander) for c in node.must_not],
            filter=[rewrite(c, expander) for c in node.filter],
            min_should=node.min_should,
        )
    return node
