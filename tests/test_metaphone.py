"""Double Metaphone (Philips 2000; the encoder behind the reference's
DoubleMetaphoneFilter — analysis/phonetic/DoubleMetaphoneFilter.java:31).
Golden outputs from the reference's DoubleMetaphoneFilterTest plus
well-known published pairs."""

import pytest

from lucene_solr_ray.analysis.metaphone import double_metaphone as dm


@pytest.mark.parametrize("word,primary,alt", [
    # DoubleMetaphoneFilterTest.java goldens (maxCodeLength=4)
    ("international", "ANTR", None),
    ("Kuczewski", "KSSK", "KXFS"),
    ("hello", "HL", None),
    # published algorithm examples
    ("smith", "SM0", "XMT"),
    ("schmidt", "XMT", "SMT"),
    ("snider", "SNTR", "XNTR"),
    ("school", "SKL", None),
    ("philip", "FLP", None),
    ("thomas", "TMS", None),
    ("jose", "HS", None),
    ("michael", "MKL", "MXL"),
    ("wright", "RT", None),
    ("xavier", "SF", "SFR"),
    ("katherine", "K0RN", "KTRN"),
    ("knight", "NT", None),
    ("gnome", "NM", None),
    ("edge", "AJ", None),
    ("edgar", "ATKR", None),
])
def test_double_metaphone_golden(word, primary, alt):
    assert dm(word) == (primary, alt)


def test_code_length_parameter():
    # DoubleMetaphoneFilterTest.testSize8FalseInject
    assert dm("international", 8) == ("ANTRNXNL", None)


def test_phonetic_equivalence_pairs():
    for a, b in [("smith", "smyth"), ("jon", "john"),
                 ("catherine", "katherine")]:
        pa_, sa = dm(a)
        pb, sb = dm(b)
        codes_a = {pa_, sa or pa_}
        codes_b = {pb, sb or pb}
        assert codes_a & codes_b, (a, b, codes_a, codes_b)


def test_unencodable_passthrough_filter():
    from lucene_solr_ray.analysis.filters import build_chain

    ch, drops = build_chain(("double_metaphone",))
    assert not drops
    # DoubleMetaphoneFilterTest.testNonConvertableStrings*: kept verbatim
    assert ch("12345") == "12345"
    assert ch("hello") == "HL"
