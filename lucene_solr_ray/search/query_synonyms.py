"""Query-time multi-word synonyms -> TermAutomatonQuery.

The reference handles query-time graph synonyms (a SynonymGraphFilter'd
query TokenStream, where "ny" and "new york" occupy the same graph span)
by compiling the token graph into a TermAutomatonQuery
(sandbox/search/TokenStreamToTermAutomatonQuery.java:35). This module
builds the same automaton directly from analyzed query tokens plus
multi-word synonym rules: one state per token boundary, base arcs for the
original tokens, and one alternate path per synonym expansion spanning the
same boundaries — so a phrase query matches ANY spelling of the span.
"""

from __future__ import annotations

from .query import TermAutomaton


def build_synonym_automaton(tokens: list[str],
                            rules: dict,
                            boost: float = 1.0) -> TermAutomaton:
    """tokens: analyzed query tokens (the phrase being matched).
    rules: {lhs_tuple: [alt_tuple, ...]} — each occurrence of lhs in the
    token sequence gains alternate paths spelling every alt between the
    same two states. Rules apply one way; pass both directions for
    symmetric synonyms."""
    tokens = list(tokens)
    n = len(tokens)
    if not n:
        raise ValueError("empty token sequence")
    transitions = [(i, i + 1, t) for i, t in enumerate(tokens)]
    next_state = n + 1
    for i in range(n):
        for lhs, alts in rules.items():
            lhs = tuple(lhs)
            j = i + len(lhs)
            if tuple(tokens[i:j]) != lhs:
                continue
            for alt in alts:
                alt = tuple(alt)
                if not alt:
                    continue
                cur = i
                for k, w in enumerate(alt):
                    last = k == len(alt) - 1
                    to = j if last else next_state
                    if not last:
                        next_state += 1
                    transitions.append((cur, to, w))
                    cur = to
    return TermAutomaton(next_state, tuple(transitions), (), (n,),
                         boost=boost)


def synonym_phrase_query(text: str, rules: dict, boost: float = 1.0):
    """Analyze the text and build the synonym-graph automaton for it."""
    from ..analysis import standard_analyzer

    toks, _ = standard_analyzer(text)
    return build_synonym_automaton(toks, rules, boost)
