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


def _span(e, text_field: str):
    tag = e.tag
    fld = _field(e, text_field)
    if tag == "SpanTerm":
        return SpanTerm(_term_text(e, fld))
    if tag in ("SpanOr", "SpanOrTerms"):
        if tag == "SpanOrTerms":
            members = tuple(SpanTerm(t) for t in _analyzed_terms(e, fld))
        else:
            members = tuple(_span(c, text_field) for c in e)
        if not members:
            raise XMLParseError(f"empty {tag}")
        return members[0] if len(members) == 1 else SpanOrQ(members)
    if tag == "SpanNear":
        if e.get("slop") is None:
            raise XMLParseError("SpanNear requires a slop attribute")
        return SpanNear(tuple(_span(c, text_field) for c in e),
                        slop=int(e.get("slop")),
                        in_order=e.get("inOrder", "false").lower() == "true",
                        boost=_boost(e))
    if tag == "SpanNot":
        inc = e.find("Include")
        exc = e.find("Exclude")
        if inc is None or exc is None:
            raise XMLParseError("SpanNot requires Include and Exclude")
        return SpanNot(_span(inc[0], text_field), _span(exc[0], text_field),
                       boost=_boost(e))
    if tag == "SpanFirst":
        return SpanFirst(_span(e[0], text_field), end=int(e.get("end", 1)),
                         boost=_boost(e))
    if tag == "SpanPositionRange":
        if int(e.get("start", 0)) != 0:
            raise XMLParseError("SpanPositionRange start != 0 unsupported")
        return SpanFirst(_span(e[0], text_field), end=int(e.get("end", 1)),
                         boost=_boost(e))
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
            getattr(b, occ).append(_query(cl[0], text_field, default_field))
        bo = _boost(e)
        return b if bo == 1.0 else _boosted(b, bo)
    if tag == "RangeQuery":
        lo, hi = e.get("lowerTerm"), e.get("upperTerm")
        pre = "" if fld is None else f"{fld}:"
        return TermRange(
            None if lo in (None, "") else pre + lo.lower(),
            None if hi in (None, "") else pre + hi.lower(),
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
        return ConstantScore(_query(e[0], text_field, default_field),
                             _boost(e))
    if tag == "UserQuery":
        return parse_query((e.text or "").strip())
    if tag in ("SpanTerm", "SpanOr", "SpanOrTerms", "SpanNear", "SpanNot",
               "SpanFirst", "SpanPositionRange"):
        return _span(e, text_field)
    raise XMLParseError(f"unknown query element {tag!r}")


def _boosted(q, b: float):
    from dataclasses import replace

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
