"""Surround query parser — span-operator syntax over the spans machinery.

Reference: lucene/queryparser/.../surround/parser/QueryParser.jj and
query/DistanceQuery.java:74-98: `nW(a, b, ...)` = ordered within n,
`nN(...)` = unordered within n (bare W/N = distance 1, getOpDistance
:124-130), compiled to ``SpanNearQuery(clauses, opDistance - 1, ordered)``.
Both prefix (`3W(a, b)`) and infix (`a 3W b`) forms parse, plus
`AND`/`OR`/`NOT` boolean combination (prefix `OR(a, b)` / `AND(a, b)` too)
and parentheses. Distance-operator operands must be span-able: terms or
nested distance/OR expressions (OR inside a distance op becomes SpanOr —
SpanNearClauseFactory.java:33).
"""

from __future__ import annotations

import re

from .query import Bool, SpanNear, SpanOrQ, SpanTerm

_TOKEN = re.compile(
    r"\(|\)|,|\d*[wWnN](?=\s*\()"        # prefix distance op
    r"|\b(?:AND|OR|NOT|and|or|not)\b"
    r"|\d+[wWnN]\b|\b[wWnN]\b"           # infix distance op
    r"|[^\s(),]+")


def _dist(op: str) -> tuple[int, bool]:
    """(opDistance, ordered) per getOpDistance (:124-130)."""
    ordered = op[-1] in "wW"
    return (1 if len(op) == 1 else int(op[:-1])), ordered


def _is_distop(tok: str) -> bool:
    return re.fullmatch(r"\d*[wWnN]", tok) is not None


class _P:
    def __init__(self, toks):
        self.toks = toks
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self):
        t = self.peek()
        self.i += 1
        return t


def _to_span(node):
    """Coerce a parsed node into a span clause (terms / spans / OR-of-spans
    qualify; anything else is a grammar error — distance subqueries must
    be span-able, DistanceSubQuery contract)."""
    if isinstance(node, (SpanTerm, SpanNear, SpanOrQ)):
        return node
    from .query import Term

    if isinstance(node, Term):
        return SpanTerm(node.text)
    if isinstance(node, Bool) and node.should and not node.must \
            and not node.must_not and not node.filter:
        return SpanOrQ(tuple(_to_span(c) for c in node.should))
    raise ValueError(f"not span-able inside a distance operator: {node!r}")


def surround_parse(q: str):
    """Parse a surround expression into a query node. Raises ValueError on
    malformed input (the reference parser likewise throws ParseException)."""
    p = _P(_TOKEN.findall(q or ""))
    node = _parse_or(p)
    if p.peek() is not None:
        raise ValueError(f"unexpected token: {p.peek()!r}")
    if node is None:
        raise ValueError("empty surround query")
    return node


def _parse_or(p: _P):
    left = _parse_and(p)
    while p.peek() and p.peek().lower() == "or":
        p.next()
        right = _parse_and(p)
        left = Bool(should=[left, right])
    return left


def _parse_and(p: _P):
    left = _parse_not(p)
    while p.peek() and p.peek().lower() == "and":
        p.next()
        right = _parse_not(p)
        left = Bool(must=[left, right])
    return left


def _parse_not(p: _P):
    left = _parse_dist(p)
    while p.peek() and p.peek().lower() == "not":
        p.next()
        right = _parse_dist(p)
        left = Bool(must=[left], must_not=[right])
    return left


def _parse_dist(p: _P):
    left = _parse_primary(p)
    while p.peek() and _is_distop(p.peek()) and \
            (p.i + 1 >= len(p.toks) or p.toks[p.i + 1] != "("):
        op = p.next()
        right = _parse_primary(p)
        d, ordered = _dist(op)
        left = SpanNear((_to_span(left), _to_span(right)), d - 1, ordered)
    return left


def _parse_primary(p: _P):
    tok = p.peek()
    if tok is None:
        raise ValueError("unexpected end of surround query")
    if tok == "(":
        p.next()
        node = _parse_or(p)
        if p.next() != ")":
            raise ValueError("missing ')'")
        return node
    if _is_distop(tok) and p.i + 1 < len(p.toks) and p.toks[p.i + 1] == "(":
        op = p.next()
        p.next()  # '('
        args = [_parse_or(p)]
        while p.peek() == ",":
            p.next()
            args.append(_parse_or(p))
        if p.next() != ")":
            raise ValueError("missing ')' after distance operands")
        d, ordered = _dist(op)
        return SpanNear(tuple(_to_span(a) for a in args), d - 1, ordered)
    if tok.lower() in ("or", "and") and p.i + 1 < len(p.toks) \
            and p.toks[p.i + 1] == "(":
        op = p.next().lower()
        p.next()  # '('
        args = [_parse_or(p)]
        while p.peek() == ",":
            p.next()
            args.append(_parse_or(p))
        if p.next() != ")":
            raise ValueError("missing ')'")
        return Bool(should=args) if op == "or" else Bool(must=args)
    if tok in (")", ","):
        raise ValueError(f"unexpected {tok!r}")
    p.next()
    from ..analysis import standard_analyzer

    terms, _ = standard_analyzer(tok)
    if not terms:
        raise ValueError(f"empty term: {tok!r}")
    from .query import Term

    return Term(terms[0])
