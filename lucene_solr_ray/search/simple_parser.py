"""SimpleQueryParser — the lenient end-user query syntax.

Reference: lucene/queryparser/.../simple/SimpleQueryParser.java:99. The
grammar never throws: `+` AND, `|` OR, `-` negates the next token, `"..."`
phrase (`~N` slop), trailing `*` prefix, `~N` fuzzy on terms, `(...)`
precedence, backslash escapes. Operator combination is LEFT-ACCUMULATIVE
("simple order from right to left" in the javadoc's sense):
``a | b + c`` parses as ``(a OR b) AND c``. A negated token becomes
``Bool(must_not=[tok], should=[MatchAll])`` before combining
(buildQueryTree's not-wrapper), exactly as the reference.
"""

from __future__ import annotations

from .query import Bool, Fuzzy, MatchAll, Phrase, Prefix, Term

_DELIMS = set(' \t\n\r+|"()')


def _analyze_one(text: str):
    from ..analysis import standard_analyzer

    terms, _ = standard_analyzer(text)
    return terms


def simple_parse(q: str, default_operator: str = "or"):
    """Parse the lenient syntax into a query node. Never raises on
    malformed input — unparseable pieces are dropped or read literally."""
    node, _ = _parse(q or "", 0, default_operator, top_level=True)
    return node if node is not None else Bool()


def _combine(top, branch, op: str, negate: bool):
    if branch is None:
        return top
    if negate:
        branch = Bool(must_not=[branch], should=[MatchAll()])
    if top is None:
        return branch
    if op == "and":
        return Bool(must=[top, branch])
    return Bool(should=[top, branch])


def _parse(s: str, i: int, default_op: str, top_level: bool):
    top = None
    op = None
    negate = False
    n = len(s)
    while i < n:
        ch = s[i]
        if ch in " \t\n\r":
            i += 1
        elif ch == "+":
            op = "and"
            i += 1
        elif ch == "|":
            op = "or"
            i += 1
        elif ch == "-":
            negate = not negate
            i += 1
        elif ch == "(":
            sub, i = _parse(s, i + 1, default_op, top_level=False)
            top = _combine(top, sub, op or default_op, negate)
            op, negate = None, False
        elif ch == ")":
            i += 1
            if not top_level:
                return top, i
            # lenient: stray ')' at top level is ignored
        elif ch == '"':
            j = i + 1
            buf = []
            while j < n and s[j] != '"':
                if s[j] == "\\" and j + 1 < n:
                    buf.append(s[j + 1])
                    j += 2
                else:
                    buf.append(s[j])
                    j += 1
            j += 1  # closing quote (or end: lenient)
            slop = 0
            if j < n and s[j] == "~":
                k = j + 1
                while k < n and s[k].isdigit():
                    k += 1
                if k > j + 1:
                    slop = int(s[j + 1:k])
                    j = k
            terms = _analyze_one("".join(buf))
            branch = None
            if len(terms) == 1:
                branch = Term(terms[0])
            elif terms:
                branch = Phrase(tuple(terms), 1.0, slop)
            top = _combine(top, branch, op or default_op, negate)
            op, negate = None, False
            i = j
        else:
            # a bare token: read until an unescaped delimiter
            buf = []
            esc_last_star = False
            while i < n and (s[i] not in _DELIMS):
                if s[i] == "\\" and i + 1 < n:
                    buf.append(s[i + 1])
                    esc_last_star = s[i + 1] == "*"
                    i += 2
                else:
                    buf.append(s[i])
                    esc_last_star = False
                    i += 1
            raw = "".join(buf)
            branch = None
            fuzzy = None
            if "~" in raw:
                base, _, suf = raw.rpartition("~")
                if suf.isdigit() and base:
                    raw, fuzzy = base, int(suf)
            if raw.endswith("*") and not esc_last_star and len(raw) > 1:
                terms = _analyze_one(raw[:-1])
                if terms:
                    branch = Prefix(terms[-1])
            elif raw:
                terms = _analyze_one(raw)
                if len(terms) == 1:
                    branch = (Fuzzy(terms[0], max_edits=min(2, fuzzy))
                              if fuzzy else Term(terms[0]))
                elif terms:
                    branch = Phrase(tuple(terms))
            top = _combine(top, branch, op or default_op, negate)
            op, negate = None, False
    return top, i
