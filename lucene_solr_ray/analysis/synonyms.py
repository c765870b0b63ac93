"""Index-time synonym graph rule parsing (SynonymGraphFilter.java:81;
rule grammar = the Solr synonyms.txt format, SolrSynonymParser.java:60).

A rule is either an equivalence group or an explicit mapping:

    "usa, united states of america"          every member -> every OTHER
    "ipod, i pod => ipod"                    every LHS -> every RHS

Members may be multi-word (space-separated). Each member is analyzed
before matching — the reference parses rule text through the index
analyzer for the same reason (SolrSynonymParser.java:118 analyze()) —
so "US A" and "us a" compile to the same token tuple.

The flatten placement semantics (how the parsed expansions land on token
positions) live with the assembly stage in index/build.py; this module is
pure rule -> (lhs tokens, rhs tokens) compilation, shared by the index
build and any query-side expander.
"""

from __future__ import annotations

from typing import Callable


def _analyze_member(member: str, analyze: Callable[[str], list[str]] | None
                    ) -> tuple:
    if analyze is None:
        from .analyzers import analyze_fast, standard_analyzer

        terms = analyze_fast(member)
        if terms is None:
            terms, _ = standard_analyzer(member)
        return tuple(terms)
    return tuple(analyze(member))


def parse_synonym_rules(
    rules, analyze: Callable[[str], list[str]] | None = None
) -> list[tuple[tuple, tuple]]:
    """Compile rule strings to deduped (lhs_tokens, rhs_tokens) expansion
    pairs; identity pairs (lhs == rhs) are dropped, as the builder in the
    reference drops them (SynonymMap.Builder.add)."""
    pairs: list[tuple[tuple, tuple]] = []
    seen: set[tuple[tuple, tuple]] = set()
    for rule in rules or ():
        if "=>" in rule:
            lhs_s, rhs_s = rule.split("=>", 1)
            lhs = [_analyze_member(m, analyze)
                   for m in lhs_s.split(",") if m.strip()]
            rhs = [_analyze_member(m, analyze)
                   for m in rhs_s.split(",") if m.strip()]
        else:
            members = [_analyze_member(m, analyze)
                       for m in rule.split(",") if m.strip()]
            lhs = rhs = members
        for a in lhs:
            if not a:
                continue
            for b in rhs:
                if not b or a == b or (a, b) in seen:
                    continue
                seen.add((a, b))
                pairs.append((a, b))
    return pairs
