"""KStem parity tests (KStemFilter.java:49 / KStemmer.java:71).

The reference ships a 12,130-pair golden vocabulary
(analysis/common/src/test/.../en/kstemTestData.zip, used by
TestKStemmer.testVocabulary); when that archive is readable we assert
EVERY pair. A hand-picked subset covering each rule family is inlined so
the test still runs without the reference tree.
"""

import io
import os
import zipfile

import pytest

from lucene_solr_ray.analysis.kstem import kstem

_REF_ZIP = ("/root/reference/lucene/analysis/common/src/test/org/apache/"
            "lucene/analysis/en/kstemTestData.zip")

# one or two cases per rule family (plural, -ies, past tense, doubled
# consonant, aspect, -ity, -ness, -ion/-ation/-ication, -er, -ly, -al,
# -ive, -ize, -ment, -ble, -ism, -ic, -ncy, -nce, conflation tables,
# lexicon identity, exception words)
GOLDEN = [
    ("cats", "cat"),
    ("calories", "calorie"),
    ("aides", "aide"),
    ("crosses", "cross"),
    ("dying", "die"),
    ("aging", "age"),
    ("italians", "italy"),
    ("microcoded", "microcode"),
    ("backfilled", "backfill"),
    ("amplification", "amplify"),
    ("militarily", "military"),
    ("querying", "query"),
    # lexicon identity: inflected forms present in the dictionary stay
    ("flies", "flies"),
    ("running", "running"),
    ("engineering", "engineering"),
    ("indices", "indices"),
    ("definition", "definition"),
    # short words and non-candidates pass through
    ("ab", "ab"),
    ("the", "the"),
    ("data", "data"),
]


@pytest.mark.parametrize("word,expected", GOLDEN)
def test_kstem_golden(word, expected):
    assert kstem(word) == expected


def test_kstem_non_alpha_and_bounds():
    assert kstem("a") == "a"
    assert kstem("") == ""
    assert kstem("r2d2s") == "r2d2s"          # non-alpha: untouched
    assert kstem("x" * 60) == "x" * 60        # beyond MaxWordLen
    assert kstem("Cats") == "Cats"            # must be pre-lowercased


@pytest.mark.skipif(not os.path.exists(_REF_ZIP),
                    reason="reference golden archive not available")
def test_kstem_full_reference_vocabulary():
    with zipfile.ZipFile(_REF_ZIP) as z:
        data = z.read("kstem_examples.txt")
    bad = []
    for line in io.TextIOWrapper(io.BytesIO(data), encoding="utf-8"):
        line = line.rstrip("\n")
        if not line:
            continue
        word, expected = line.split("\t")
        got = kstem(word)
        if got != expected:
            bad.append((word, expected, got))
    assert not bad, f"{len(bad)} mismatches, first 10: {bad[:10]}"


def test_kstem_registered_in_stemmer_registry():
    from lucene_solr_ray.analysis.stem import get_stemmer

    st = get_stemmer("kstem")
    assert st("querying") == "query"
    assert st("merge") == "merge"
