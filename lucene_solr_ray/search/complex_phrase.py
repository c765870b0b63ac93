"""ComplexPhraseQueryParser (queryparser/complexPhrase/
ComplexPhraseQueryParser.java:70): the classic grammar, except quoted
phrases may embed wildcards, prefixes, fuzzy terms, ranges and OR groups.
Each phrase rewrites to a SpanNearQuery whose clauses are SpanTerm (plain
words) or SpanOr over the dictionary expansion of the embedded multi-term
(ComplexPhraseQuery.rewrite():263-335); slop comes from `"..."~n`
(getFieldQuery:94), proximity is in-order by default (setInOrder:83).

Mechanics: phrase tokens (plus their trailing ~slop/^boost suffixes) are
swapped for placeholder words, the classic parser builds the surrounding
boolean structure, and the placeholders are substituted with SpanNear
nodes. Multi-term clauses stay unexpanded here; the searcher's standard
rewrite pass expands them against the global term dictionary (the
reference expands per segment under the same budget). Embedded negation
(`"a -b"`) is out of scope — SpanNot exists but the reference's
gap-adjusted slop accounting is not replicated.
"""

from __future__ import annotations

import re

from .query import (Bool, Fuzzy, Prefix, SpanNear, SpanOrQ, SpanTerm,
                    TermRange, Wildcard, _analyze_term, _TOKEN_RE,
                    parse_query)

# one phrase element: an OR group, a range, or a bare (possibly wild) word
_ELEM_RE = re.compile(r"\([^)]*\)|\[[^\]]*\]|\S+")

_PLACEHOLDER = "cpxspanph%d"


def _word_clause(w: str):
    """One phrase word -> SpanTerm | unexpanded multi-term node | list of
    consecutive SpanTerms (when analysis splits it) | None (dropped)."""
    m = re.match(r"^(.+)~(\d*)$", w)
    if m:
        edits = int(m.group(2)) if m.group(2) else 2
        return Fuzzy(m.group(1).lower(), max_edits=edits)
    if "*" in w or "?" in w:
        low = w.lower()
        if low.endswith("*") and "*" not in low[:-1] and "?" not in low:
            return Prefix(low[:-1])
        return Wildcard(low)
    terms = _analyze_term(w)
    if not terms:
        return None
    if len(terms) == 1:
        return SpanTerm(terms[0])
    return [SpanTerm(t) for t in terms]


def _parse_phrase_body(body: str, slop: int, in_order: bool,
                       boost: float):
    """Phrase contents -> SpanNear (or SpanTerm-equivalent single clause)."""
    clauses: list = []
    for el in _ELEM_RE.findall(body):
        if el.startswith("(") and el.endswith(")"):
            members: list = []
            for w in el[1:-1].replace(" OR ", " ").split():
                c = _word_clause(w)
                if c is None:
                    continue
                members.extend(c if isinstance(c, list) else [c])
            if not members:
                return Bool()  # a group with no live member: no docs
            clauses.append(members[0] if len(members) == 1
                           else SpanOrQ(tuple(members)))
        elif el.startswith("[") and el.endswith("]"):
            m = re.match(r"(\S+)\s+TO\s+(\S+)", el[1:-1].strip())
            if not m:
                return Bool()
            lo = None if m.group(1) == "*" else m.group(1).lower()
            hi = None if m.group(2) == "*" else m.group(2).lower()
            clauses.append(TermRange(lo, hi))
        else:
            c = _word_clause(el)
            if c is None:
                continue  # analysis hole (stopword): position gap ignored
            clauses.extend(c if isinstance(c, list) else [c])
    if not clauses:
        return Bool()
    if len(clauses) == 1 and isinstance(clauses[0], SpanTerm):
        from .query import Term

        return Term(clauses[0].text, boost)
    return SpanNear(tuple(clauses), slop=slop, in_order=in_order,
                    boost=boost)


def _substitute(node, mapping: dict):
    """Replace placeholder Term nodes with their span queries."""
    from .query import (Bool as B, ConstantScore, DisMax, Term)

    if isinstance(node, Term) and node.text in mapping:
        built = mapping[node.text]
        if isinstance(built, SpanNear) and node.boost != 1.0:
            from dataclasses import replace

            return replace(built, boost=built.boost * node.boost)
        return built
    if isinstance(node, B):
        return B(must=[_substitute(c, mapping) for c in node.must],
                 should=[_substitute(c, mapping) for c in node.should],
                 must_not=[_substitute(c, mapping) for c in node.must_not],
                 filter=[_substitute(c, mapping) for c in node.filter],
                 min_should=node.min_should)
    if isinstance(node, ConstantScore):
        return ConstantScore(_substitute(node.query, mapping), node.boost)
    if isinstance(node, DisMax):
        return DisMax(tuple(_substitute(c, mapping) for c in node.clauses),
                      node.tiebreak)
    return node


def parse_complex_phrase(q: str, in_order: bool = True):
    """Parse a complex-phrase query string into a query AST."""
    toks = _TOKEN_RE.findall(q)
    out: list[str] = []
    mapping: dict = {}
    i = 0
    while i < len(toks):
        t = toks[i]
        if t.startswith('"') and t.endswith('"') and len(t) >= 2:
            body = t[1:-1]
            slop, boost = 0, 1.0
            while i + 1 < len(toks):
                nxt = toks[i + 1]
                if nxt.startswith("~") and nxt[1:].isdigit():
                    slop = int(nxt[1:])
                    i += 1
                elif nxt.startswith("^"):
                    try:
                        boost = float(nxt[1:])
                        i += 1
                    except ValueError:
                        break
                else:
                    break
            ph = _PLACEHOLDER % len(mapping)
            mapping[ph] = _parse_phrase_body(body, slop, in_order, boost)
            out.append(ph)
        else:
            out.append(t)
        i += 1
    node = parse_query(" ".join(out))
    return _substitute(node, mapping) if mapping else node
