"""Snowball (Porter2) English + Savoy light stemmers
(snowball/SnowballFilter.java:44 role; de/GermanLightStemmer.java:64,
es/SpanishLightStemmer.java:64, fr/FrenchMinimalStemmer.java:63).
Porter2 vectors are worked rule-by-rule from the published Snowball
'english' spec."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.analysis.stem import (
    french_minimal_stem,
    german_light_stem,
    get_stemmer,
    porter2_stem,
    spanish_light_stem,
)

P2_CASES = {
    # step 0 / 1a
    "boys": "boy", "ties": "tie", "cries": "cri", "gasses": "gass",
    "boy's": "boy",
    # step 1b incl. at/bl/iz + doubles + short-word 'e'
    "agreed": "agre", "feed": "feed", "plastered": "plaster",
    "bled": "bled", "motoring": "motor", "sing": "sing",
    "conflated": "conflat", "troubled": "troubl", "sized": "size",
    "hopping": "hop", "tanned": "tan", "falling": "fall",
    "hissing": "hiss", "failing": "fail", "filing": "file",
    # step 1c
    "cry": "cri", "by": "by", "say": "say",
    # steps 2-4
    "relational": "relat", "conditional": "condit", "digitizer": "digit",
    "hopeful": "hope", "goodness": "good", "adjustment": "adjust",
    "adoption": "adopt", "generously": "generous", "knightly": "knight",
    # step 5 + R-region subtleties
    "rate": "rate", "cease": "ceas", "controlling": "control",
    "generate": "generat", "communism": "communism",
    # exception lists
    "skis": "ski", "dying": "die", "news": "news", "inning": "inning",
    "proceed": "proceed", "early": "earli",
}


def test_porter2_vectors():
    for w, want in P2_CASES.items():
        assert porter2_stem(w) == want, w


def test_porter2_idempotent_on_corpus_vocab():
    """Stemming a stem must be stable for the synthetic corpus vocabulary
    (the filter runs once per chain; double-stem drift would desync the
    index- and query-side mirrors)."""
    t = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                      columns=["text"])
    vocab = set()
    for s in t["text"].to_pylist()[:500]:
        vocab.update(s.split())
    for w in sorted(vocab):
        s1 = porter2_stem(w)
        assert porter2_stem(s1) == s1, w


def test_light_stemmers_reference_behavior():
    # GermanLightStemmer.java:64
    assert german_light_stem("häuser") == "haus"
    assert german_light_stem("bücher") == "buch"
    assert german_light_stem("katzen") == "katz"
    assert german_light_stem("grösste") == "grosst"  # umlaut folds
    assert german_light_stem("hunds") == "hund"
    # SpanishLightStemmer.java:64
    assert spanish_light_stem("casa") == "casa"  # < 5 chars untouched
    assert spanish_light_stem("casas") == "cas"
    assert spanish_light_stem("veces") == "vez"
    assert spanish_light_stem("meses") == "mes"
    assert spanish_light_stem("gatos") == "gat"
    assert spanish_light_stem("sol") == "sol"
    # FrenchMinimalStemmer.java:63
    assert french_minimal_stem("chevaux") == "cheval"
    assert french_minimal_stem("cheval") == "cheval"
    assert french_minimal_stem("hommes") == "hom"
    assert french_minimal_stem("garçons") == "garçon"
    assert french_minimal_stem("chat") == "chat"  # < 6 chars untouched


def test_registry_and_index_query_mirror(tmp_path, ray_session):
    """english_snowball is a first-class chain stemmer: index + query
    mirrored exactly like porter/minimal_english."""
    from lucene_solr_ray.index import IndexBuildConfig, build_index
    from lucene_solr_ray.search import IndexSearcher

    assert get_stemmer("english_snowball") is porter2_stem
    texts = ["the cats were generously hopping",
             "a knightly adjustment of rates",
             "dogs chase cars"]
    p = str(tmp_path / "c.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(3, dtype=np.int64)),
        "text": pa.array(texts, pa.string())}), p)
    idx = str(tmp_path / "idx")
    build_index(p, idx, cfg=IndexBuildConfig(
        num_shards=1, num_buckets=2, stemmer="english_snowball"))
    s = IndexSearcher(idx)
    # query-side stemming folds the surface form to the indexed stem
    assert s.match_all("generous")["doc_id"].to_pylist() == [0]
    assert s.match_all("generously")["doc_id"].to_pylist() == [0]
    assert s.match_all("hopped")["doc_id"].to_pylist() == [0]
    assert s.match_all("adjusting")["doc_id"].to_pylist() == [1]
    assert s.match_all("knight")["doc_id"].to_pylist() == [1]


def test_french_light_full():
    """Full UniNE French light stemmer (fr/FrenchLightStemmer.java:66):
    inflection pairs converge, accents fold, doubles collapse."""
    from lucene_solr_ray.analysis.stem import french_light_stem as f

    assert f("chevaux") == "cheval"
    assert f("nationaux") == "national"
    # masculine/feminine converge
    assert f("amoureuse") == f("amoureux") == "amoureu"
    # eaux keeps the e (no l substitution), doubles collapse in norm
    assert f("barreaux") == f("barreau") == "bareau"
    assert f("formation") == "form"
    assert f("investissement") == "investi"
    assert f("communication") == "comunic"
    assert get_stemmer("french_light") is f


def test_hungarian_portuguese_light():
    """UniNE Hungarian + Portuguese light stemmers
    (hu/HungarianLightStemmer.java:64, pt/PortugueseLightStemmer.java:64):
    inflected forms converge to the same stem as their base."""
    from lucene_solr_ray.analysis.stem import (
        hungarian_light_stem as h,
        portuguese_light_stem as p,
    )

    # Hungarian: case suffix + plural + final-vowel normalize
    assert h("babáknak") == "bab"       # dative plural of baba
    assert h("házakban") == "haz"       # inessive plural of ház
    assert h("ház") == "haz"            # accent folds, no suffix fires
    assert h("kertek") == "ker"         # 'tek' possessive strips first (reference rule order)
    assert h("dobok") == "dob"          # plural 'ok'
    # Portuguese: plural rewrites + feminine fold + accent fold
    assert p("meninas") == p("meninos") == "menin"
    assert p("corações") == p("coração") == "coraca"
    assert p("animais") == p("animal") == "animal"
    assert p("felizmente") == "feliz"
    assert p("casas") == p("casa") == "casa"
    assert get_stemmer("hungarian_light") is h
    assert get_stemmer("portuguese_light") is p
