"""XML query parser (queryparser/xml/CoreParser.java:40) — each element
parses to the AST its classic-syntax / constructed equivalent produces,
and scores identically on the index."""

import numpy as np
import pytest

from lucene_solr_ray.index import IndexBuildConfig, build_index
from lucene_solr_ray.search import IndexSearcher
from lucene_solr_ray.search.query import (Bool, DisMax, MatchAll,
                                          NumericRange, SpanNear, SpanOrQ,
                                          SpanTerm, Term, TermInSet,
                                          TermRange, parse_query)
from lucene_solr_ray.search.xml_parser import XMLParseError, parse_xml_query

DOCS = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture(scope="module")
def searcher(tmp_path_factory, ray_session):
    d = str(tmp_path_factory.mktemp("xml_idx"))
    build_index(DOCS, d, key_col="doc_id", text_col="text",
                cfg=IndexBuildConfig(num_shards=3, num_buckets=4,
                                     keyword_fields=("lang",),
                                     docvalues_fields=("n_chars",)))
    return IndexSearcher(d, dtype=np.float64)


def same_results(searcher, xml, equiv):
    a = searcher.match_all(parse_xml_query(xml))
    b = searcher.match_all(equiv)
    assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist()
    assert a["score"].to_pylist() == pytest.approx(b["score"].to_pylist())
    return a


def test_term_query(searcher):
    t = same_results(searcher, "<TermQuery>Fast</TermQuery>", Term("fast"))
    assert len(t)
    assert parse_xml_query(
        '<TermQuery boost="2.5">fast</TermQuery>') == Term("fast", 2.5)


def test_keyword_field_term(searcher):
    node = parse_xml_query('<TermQuery fieldName="lang">en</TermQuery>')
    assert node == Term("lang:en")
    assert len(searcher.match_all(node))


def test_terms_and_match_all(searcher):
    assert parse_xml_query("<TermsQuery>fast slow</TermsQuery>") == \
        TermInSet(("fast", "slow"))
    assert parse_xml_query("<MatchAllDocsQuery/>") == MatchAll()


def test_boolean(searcher):
    xml = """<BooleanQuery>
      <Clause occurs="must"><TermQuery>fast</TermQuery></Clause>
      <Clause occurs="mustNot"><TermQuery>slow</TermQuery></Clause>
      <Clause occurs="should"><TermQuery>query</TermQuery></Clause>
    </BooleanQuery>"""
    same_results(searcher, xml, Bool(must=[Term("fast")],
                                     must_not=[Term("slow")],
                                     should=[Term("query")]))


def test_boolean_filter_and_msm(searcher):
    xml = """<BooleanQuery minimumNumberShouldMatch="2">
      <Clause occurs="filter"><TermQuery>fast</TermQuery></Clause>
      <Clause occurs="should"><TermQuery>query</TermQuery></Clause>
      <Clause occurs="should"><TermQuery>merge</TermQuery></Clause>
      <Clause occurs="should"><TermQuery>slow</TermQuery></Clause>
    </BooleanQuery>"""
    node = parse_xml_query(xml)
    assert node.min_should == 2 and len(node.filter) == 1
    assert len(searcher.match_all(node))


def test_range_queries(searcher):
    assert parse_xml_query(
        '<RangeQuery lowerTerm="q" upperTerm="r"/>') == TermRange("q", "r")
    assert parse_xml_query(
        '<RangeQuery lowerTerm="q" includeLower="false"/>') == \
        TermRange("q", None, include_lower=False)
    node = parse_xml_query(
        '<PointRangeQuery fieldName="n_chars" lowerTerm="100" '
        'upperTerm="300"/>')
    assert node == NumericRange("n_chars", 100.0, 300.0)
    assert len(searcher.match_all(node))


def test_dismax_and_constant_score(searcher):
    xml = """<DisjunctionMaxQuery tieBreaker="0.3">
      <TermQuery>fast</TermQuery><TermQuery>query</TermQuery>
    </DisjunctionMaxQuery>"""
    same_results(searcher, xml,
                 DisMax((Term("fast"), Term("query")), tiebreak=0.3))
    n = parse_xml_query('<ConstantScoreQuery boost="3">'
                        "<TermQuery>fast</TermQuery></ConstantScoreQuery>")
    t = searcher.match_all(n)
    assert set(t["score"].to_pylist()) == {3.0}


def test_user_query(searcher):
    same_results(searcher, "<UserQuery>fast AND query</UserQuery>",
                 parse_query("fast AND query"))


def test_spans(searcher):
    xml = """<SpanNear slop="2" inOrder="true">
      <SpanOrTerms>fast slow</SpanOrTerms>
      <SpanTerm>query</SpanTerm>
    </SpanNear>"""
    same_results(searcher, xml,
                 SpanNear((SpanOrQ((SpanTerm("fast"), SpanTerm("slow"))),
                           SpanTerm("query")), slop=2, in_order=True))
    nf = parse_xml_query('<SpanFirst end="5"><SpanTerm>fast</SpanTerm>'
                         "</SpanFirst>")
    npr = parse_xml_query('<SpanPositionRange start="0" end="5">'
                          "<SpanTerm>fast</SpanTerm></SpanPositionRange>")
    assert nf == npr
    xml_not = """<SpanNot>
      <Include><SpanTerm>fast</SpanTerm></Include>
      <Exclude><SpanTerm>slow</SpanTerm></Exclude>
    </SpanNot>"""
    assert len(searcher.match_all(parse_xml_query(xml_not)))


def test_errors():
    with pytest.raises(XMLParseError):
        parse_xml_query("<NotAQuery/>")
    with pytest.raises(XMLParseError):
        parse_xml_query("<BooleanQuery><TermQuery>x</TermQuery>"
                        "</BooleanQuery>")
    with pytest.raises(XMLParseError):
        parse_xml_query("<SpanNear><SpanTerm>a</SpanTerm></SpanNear>")
    with pytest.raises(XMLParseError):
        parse_xml_query("not xml at all <<<")
    with pytest.raises(XMLParseError):
        parse_xml_query('<SpanPositionRange start="2" end="5">'
                        "<SpanTerm>a</SpanTerm></SpanPositionRange>")


def test_review_fixes(searcher):
    """Regression pins for the session-3 review findings."""
    import numpy as np

    # nested span composition is rejected at PARSE time, not query time
    with pytest.raises(XMLParseError):
        parse_xml_query('<SpanNear slop="0"><SpanNear slop="1">'
                        "<SpanTerm>a</SpanTerm><SpanTerm>b</SpanTerm>"
                        "</SpanNear><SpanTerm>c</SpanTerm></SpanNear>")
    with pytest.raises(XMLParseError):
        parse_xml_query('<SpanOr><SpanNear slop="1"><SpanTerm>a</SpanTerm>'
                        "<SpanTerm>b</SpanTerm></SpanNear></SpanOr>")
    # open-ended keyword range stays inside the field namespace
    node = parse_xml_query('<RangeQuery fieldName="lang" lowerTerm="en"/>')
    assert node.lower == "lang:en" and node.upper.startswith("lang:")
    hits = searcher.match_all(node)
    # every match has SOME lang keyword >= en; none are plain text terms
    all_lang = searcher.match_all(parse_xml_query(
        '<RangeQuery fieldName="lang"/>'))
    assert set(hits["doc_id"].to_pylist()) <= set(
        all_lang["doc_id"].to_pylist())
    # BooleanQuery boost multiplies clause scores instead of flattening
    b1 = searcher.match_all(parse_xml_query(
        "<BooleanQuery><Clause occurs=\"should\"><TermQuery>fast"
        "</TermQuery></Clause></BooleanQuery>"))
    b2 = searcher.match_all(parse_xml_query(
        "<BooleanQuery boost=\"2\"><Clause occurs=\"should\">"
        "<TermQuery>fast</TermQuery></Clause></BooleanQuery>"))
    s1 = dict(zip(b1["doc_id"].to_pylist(), b1["score"].to_pylist()))
    s2 = dict(zip(b2["doc_id"].to_pylist(), b2["score"].to_pylist()))
    assert set(s1) == set(s2) and len(set(s2.values())) > 1
    for k in s1:
        assert s2[k] == pytest.approx(2 * s1[k])
    # childless elements raise XMLParseError, not IndexError
    for bad in ('<BooleanQuery><Clause occurs="must"/></BooleanQuery>',
                '<ConstantScoreQuery boost="2"/>',
                '<SpanFirst end="3"/>',
                "<SpanNot><Include/><Exclude><SpanTerm>a</SpanTerm>"
                "</Exclude></SpanNot>"):
        with pytest.raises(XMLParseError):
            parse_xml_query(bad)
