"""XML query parser (queryparser/xml/CoreParser.java:40): the element set
CoreParser registers (:77-121) mapped onto the engine's query AST.

Supported elements: TermQuery, TermsQuery, MatchAllDocsQuery, BooleanQuery
(+Clause occurs=must/mustNot/should/filter, minimumNumberShouldMatch),
RangeQuery, PointRangeQuery, DisjunctionMaxQuery (tieBreaker),
ConstantScoreQuery, UserQuery (classic syntax), SpanTerm, SpanOr,
SpanOrTerms, SpanNear (slop/inOrder), SpanNot, SpanFirst.
SpanPositionRange with start=0 maps to SpanFirst; nonzero start and
BoostingTermQuery (payload scoring as a composable query) are not mapped.

Field routing mirrors the engine's document model: fieldName equal to the
main text field (default 'text') hits the analyzed postings; any other
fieldName resolves as a keyword field ('field:term' namespaced terms) for
term-ish queries and as a NUMERIC docvalues column for PointRangeQuery.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

from .query import (Bool, ConstantScore, DisMax, MatchAll, NumericRange,
                    SpanFirst, SpanNear, SpanNot, SpanOrQ, SpanTerm, Term,
                    TermInSet, TermRange, _analyze_term, parse_query)


class XMLParseError(ValueError):
    pass


def _boost(e) -> float:
    return float(e.get("boost", 1.0))


def _field(e, text_field: str) -> str | None:
    """None = the main analyzed text field; else the keyword field name."""
    f = e.get("fieldName", text_field)
    return None if f == text_field else f


def _term_text(e, fld: str | None) -> str:
    raw = (e.text or "").strip()
    if fld is not None:
        return f"{fld}:{raw}"
    toks = _analyze_term(raw)
    if len(toks) != 1:
        raise XMLParseError(f"TermQuery text {raw!r} analyzes to "
                            f"{len(toks)} tokens")
    return toks[0]


def _analyzed_terms(e, fld: str | None) -> list[str]:
    raw = (e.text or "").strip()
    if fld is not None:
        return [f"{fld}:{w}" for w in raw.split()]
    return _analyze_term(raw)


def _child(e, what: str):
    if len(e) == 0:
        raise XMLParseError(f"{what} requires a child element")
    return e[0]


def _span_leaf(e, text_field: str):
    """A span CLAUSE position: SpanTerm or a SpanOr union of terms — the
    flat shapes the engine's span evaluator executes. Nested SpanNear /
    SpanNot / SpanFirst composition inside another span is rejected at
    parse time (the evaluator would fail at query time otherwise)."""
    tag = e.tag
    fld = _field(e, text_field)
    if tag == "SpanTerm":
        return SpanTerm(_term_text(e, fld))
    if tag == "SpanOrTerms":
        members = tuple(SpanTerm(t) for t in _analyzed_terms(e, fld))
        if not members:
            raise XMLParseError("empty SpanOrTerms")
        return members[0] if len(members) == 1 else SpanOrQ(members)
    if tag == "SpanOr":
        members = tuple(_span_leaf(c, text_field) for c in e)
        if not members:
            raise XMLParseError("empty SpanOr")
        flat: list = []
        for m in members:
            flat.extend(m.clauses if isinstance(m, SpanOrQ) else [m])
        return flat[0] if len(flat) == 1 else SpanOrQ(tuple(flat))
    raise XMLParseError(
        f"span clause {tag!r} unsupported here (nested span composition "
        "is out of scope: clauses must be SpanTerm/SpanOr/SpanOrTerms)")


def _span(e, text_field: str):
    tag = e.tag
    if tag in ("SpanTerm", "SpanOr", "SpanOrTerms"):
        return _span_leaf(e, text_field)
    if tag == "SpanNear":
        if e.get("slop") is None:
            raise XMLParseError("SpanNear requires a slop attribute")
        return SpanNear(tuple(_span_leaf(c, text_field) for c in e),
                        slop=int(e.get("slop")),
                        in_order=e.get("inOrder", "false").lower() == "true",
                        boost=_boost(e))
    if tag == "SpanNot":
        inc = e.find("Include")
        exc = e.find("Exclude")
        if inc is None or exc is None:
            raise XMLParseError("SpanNot requires Include and Exclude")
        return SpanNot(_span_leaf(_child(inc, "Include"), text_field),
                       _span_leaf(_child(exc, "Exclude"), text_field),
                       boost=_boost(e))
    if tag == "SpanFirst":
        return SpanFirst(_span_leaf(_child(e, "SpanFirst"), text_field),
                         end=int(e.get("end", 1)), boost=_boost(e))
    if tag == "SpanPositionRange":
        if int(e.get("start", 0)) != 0:
            raise XMLParseError("SpanPositionRange start != 0 unsupported")
        return SpanFirst(
            _span_leaf(_child(e, "SpanPositionRange"), text_field),
            end=int(e.get("end", 1)), boost=_boost(e))
    raise XMLParseError(f"unknown span element {tag!r}")


_OCCURS = {"must": "must", "mustnot": "must_not", "should": "should",
           "filter": "filter"}


def _query(e, text_field: str, default_field: str):
    tag = e.tag
    fld = _field(e, text_field)
    if tag == "TermQuery":
        return Term(_term_text(e, fld), _boost(e))
    if tag == "TermsQuery":
        terms = _analyzed_terms(e, fld)
        if not terms:
            return Bool()
        return TermInSet(tuple(terms), _boost(e))
    if tag == "MatchAllDocsQuery":
        return MatchAll(_boost(e))
    if tag == "BooleanQuery":
        b = Bool(min_should=int(e.get("minimumNumberShouldMatch", 0)))
        for cl in e:
            if cl.tag != "Clause":
                raise XMLParseError(
                    f"BooleanQuery child {cl.tag!r} is not a Clause")
            occ = _OCCURS.get((cl.get("occurs") or "should").lower())
            if occ is None:
                raise XMLParseError(
                    f"invalid occurs {cl.get('occurs')!r}")
            getattr(b, occ).append(
                _query(_child(cl, "Clause"), text_field, default_field))
        bo = _boost(e)
        return b if bo == 1.0 else _boosted(b, bo)
    if tag == "RangeQuery":
        lo, hi = e.get("lowerTerm"), e.get("upperTerm")
        if fld is None:
            lo2 = None if lo in (None, "") else lo.lower()
            hi2 = None if hi in (None, "") else hi.lower()
        else:
            # keyword fields share one term dictionary with the text
            # field ('lang:en' next to plain words): an open bound must
            # still stay inside the field's namespace, so it becomes the
            # prefix itself / the prefix's maximal suffix. Values keep
            # their case, matching the keyword TermQuery path.
            pre = f"{fld}:"
            lo2 = pre if lo in (None, "") else pre + lo
            hi2 = (pre + "\U0010ffff") if hi in (None, "") else pre + hi
        return TermRange(
            lo2, hi2,
            include_lower=e.get("includeLower", "true").lower() == "true",
            include_upper=e.get("includeUpper", "true").lower() == "true",
            boost=_boost(e))
    if tag == "PointRangeQuery":
        lo, hi = e.get("lowerTerm"), e.get("upperTerm")
        return NumericRange(
            e.get("fieldName", default_field),
            None if lo in (None, "") else float(lo),
            None if hi in (None, "") else float(hi),
            boost=_boost(e))
    if tag == "DisjunctionMaxQuery":
        return DisMax(tuple(_query(c, text_field, default_field) for c in e),
                      tiebreak=float(e.get("tieBreaker", 0.0)))
    if tag == "ConstantScoreQuery":
        return ConstantScore(
            _query(_child(e, "ConstantScoreQuery"), text_field,
                   default_field), _boost(e))
    if tag == "UserQuery":
        return parse_query((e.text or "").strip())
    if tag in ("SpanTerm", "SpanOr", "SpanOrTerms", "SpanNear", "SpanNot",
               "SpanFirst", "SpanPositionRange"):
        return _span(e, text_field)
    raise XMLParseError(f"unknown query element {tag!r}")


def _boosted(q, b: float):
    """Multiply a query's scores by b (BoostQuery role). Bool/DisMax have
    no boost field; score composition is linear in the clauses, so the
    boost distributes into scoring clauses recursively instead of
    collapsing the ranking to a constant."""
    from dataclasses import replace

    if isinstance(q, Bool):
        return Bool(must=[_boosted(c, b) for c in q.must],
                    should=[_boosted(c, b) for c in q.should],
                    must_not=list(q.must_not), filter=list(q.filter),
                    min_should=q.min_should)
    if isinstance(q, DisMax):
        return DisMax(tuple(_boosted(c, b) for c in q.clauses),
                      q.tiebreak)
    if hasattr(q, "boost"):
        try:
            return replace(q, boost=q.boost * b)
        except TypeError:
            pass
    return ConstantScore(q, b)


def parse_xml_query(xml_text: str, text_field: str = "text",
                    default_field: str = ""):
    """Parse a CoreParser XML query document into the engine's AST."""
    try:
        root = ET.fromstring(xml_text)
    except ET.ParseError as err:
        raise XMLParseError(f"malformed XML: {err}") from err
    return _query(root, text_field, default_field)
