"""Token-filter library (analysis/common filter zoo) + EdgeNGram
search-as-you-type indexing."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.analysis.filters import (
    build_chain,
    decimal_digit,
    edge_grams,
    english_possessive,
    make_length,
    make_pattern_replace,
    make_truncate,
    reverse_filter,
    trim_filter,
)
from lucene_solr_ray.index import IndexBuildConfig, build_index
from lucene_solr_ray.search import IndexSearcher


def test_filter_functions_match_reference_semantics():
    # TrimFilter
    assert trim_filter("  ab  ") == "ab"
    # EnglishPossessiveFilter: 's with ASCII + curly + fullwidth apostrophes
    assert english_possessive("john's") == "john"
    assert english_possessive("john’s") == "john"
    assert english_possessive("johns") == "johns"
    assert english_possessive("'s") == ""
    # DecimalDigitFilter: Arabic-Indic + Devanagari + fullwidth -> ASCII
    assert decimal_digit("١٢٣") == "123"
    assert decimal_digit("१२") == "12"
    assert decimal_digit("abc") == "abc"
    # ReverseStringFilter
    assert reverse_filter("abc") == "cba"
    # LengthFilter: None = drop
    lf = make_length(2, 4)
    assert lf("ab") == "ab" and lf("abcd") == "abcd"
    assert lf("a") is None and lf("abcde") is None
    # TruncateTokenFilter
    assert make_truncate(3)("abcdef") == "abc"
    # PatternReplaceFilter
    assert make_pattern_replace(r"\d+", "#")("a1b22c") == "a#b#c"


def test_build_chain_composition_and_validation():
    ch, drops = build_chain(("trim", "english_possessive", ("length", 2, 8)))
    assert drops
    assert ch(" fox's ") == "fox"
    assert ch(" a ") is None          # trimmed to 1 char -> dropped
    ch2, drops2 = build_chain(["english_possessive"])
    assert not drops2 and ch2("cat's") == "cat"
    assert build_chain(()) == (None, False)
    with pytest.raises(ValueError):
        build_chain(("no_such_filter",))
    with pytest.raises(ValueError):
        build_chain((("trim", 1),))   # plain filter takes no args


def test_edge_grams_exclude_full_term():
    assert edge_grams("search", 2, 4) == ["se", "sea", "sear"]
    assert edge_grams("ab", 2, 4) == []           # full term excluded
    assert edge_grams("abc", 2, 4) == ["ab"]
    assert edge_grams("x", 2, 4) == []


TEXTS = [
    "John's automatic searching tool finds a needle",
    "the searcher searched automatically",
    "a b c xylophone",
]


def _write(tmp, texts):
    p = str(tmp / "c.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
    }), p)
    return p


@pytest.fixture(scope="module")
def tf_idx(tmp_path_factory, ray_session):
    tmp = tmp_path_factory.mktemp("tf")
    p = _write(tmp, TEXTS)
    idx = str(tmp / "idx")
    build_index(p, idx, cfg=IndexBuildConfig(
        num_shards=2, num_buckets=4,
        token_filters=("english_possessive", ("length", 2, 64)),
    ))
    return idx


def test_chain_applies_at_index_and_query_time(tf_idx):
    s = IndexSearcher(tf_idx)
    # index side: "John's" stored as "john"; query side mirrors, so the
    # user can type either form
    assert s.search("john", k=5)["doc_id"].to_pylist() == [0]
    assert s.search("john's", k=5)["doc_id"].to_pylist() == [0]
    # length filter dropped the 1-char tokens
    assert s.count("a") == 0 and s.count("b") == 0
    assert s.count("xylophone") == 1


def test_drop_filter_keeps_position_holes(tf_idx):
    s = IndexSearcher(tf_idx)
    # doc 2 = "a b c xylophone": drops leave xylophone at position 3
    from lucene_solr_ray.index.reader import ShardReader

    found = False
    for sh in range(2):
        r = ShardReader(tf_idx, sh)
        if "xylophone" in set(r.terms.tolist()):
            _, _, pos = r.postings("xylophone", with_positions=True)
            assert pos.tolist() == [3]
            found = True
    assert found
    # doclen excludes dropped tokens: "finds a needle" -> "a" gone, so
    # doc 0 has 7 live tokens not 8 (norms reflect post-filter counts);
    # check via phrase adjacency across the hole NOT matching
    assert s.search('"finds needle"', k=5).num_rows == 0


def test_edge_ngram_search_as_you_type(tmp_path_factory, ray_session):
    tmp = tmp_path_factory.mktemp("eg")
    p = _write(tmp, TEXTS)
    idx = str(tmp / "idx")
    build_index(p, idx, cfg=IndexBuildConfig(
        num_shards=2, num_buckets=4, edge_ngram=(2, 5)))
    s = IndexSearcher(idx)
    # typed prefixes hit as PLAIN term queries (the point of the filter)
    assert set(s.search("automa", k=5)["doc_id"].to_pylist()) == set()  # >5
    assert set(s.search("autom", k=5)["doc_id"].to_pylist()) == {0, 1}
    assert set(s.search("se", k=5)["doc_id"].to_pylist()) == {0, 1}
    assert s.search("xy", k=5)["doc_id"].to_pylist() == [2]
    # full terms still match, and their BM25 is unchanged by the grams
    # (grams are zero-length-contribution stacked tokens)
    idx_plain = str(tmp / "idx_plain")
    build_index(p, idx_plain, cfg=IndexBuildConfig(
        num_shards=2, num_buckets=4))
    s_plain = IndexSearcher(idx_plain)
    a, b = s.search("needle", k=5), s_plain.search("needle", k=5)
    assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist()
    assert a["score"].to_pylist() == b["score"].to_pylist()


def test_chain_fast_and_slow_paths_agree(tmp_path_factory, ray_session):
    # 1:1 chain rides the vectorized fast path; adding stopwords forces the
    # per-doc slow path — both must produce identical postings
    tmp = tmp_path_factory.mktemp("paths")
    p = _write(tmp, TEXTS)
    cfg_fast = IndexBuildConfig(num_shards=1, num_buckets=2,
                                token_filters=("english_possessive",))
    cfg_slow = IndexBuildConfig(num_shards=1, num_buckets=2,
                                token_filters=("english_possessive",),
                                stopwords=("zzzneverseen",))
    ia, ib = str(tmp / "ia"), str(tmp / "ib")
    build_index(p, ia, cfg=cfg_fast)
    build_index(p, ib, cfg=cfg_slow)
    sa, sb = IndexSearcher(ia), IndexSearcher(ib)
    for q in ("john", "searching", "needle"):
        ta, tb = sa.search(q, k=5), sb.search(q, k=5)
        assert ta["doc_id"].to_pylist() == tb["doc_id"].to_pylist(), q
        assert ta["score"].to_pylist() == tb["score"].to_pylist(), q


def test_reverse_filter_round_trips(tmp_path_factory, ray_session):
    # ReverseStringFilter end-to-end: reversed index, reversed query term
    tmp = tmp_path_factory.mktemp("rev")
    p = _write(tmp, TEXTS)
    idx = str(tmp / "idx")
    build_index(p, idx, cfg=IndexBuildConfig(
        num_shards=1, num_buckets=2, token_filters=("reverse",)))
    s = IndexSearcher(idx)
    # query side applies the same chain, so the USER still types "needle"
    assert s.search("needle", k=5)["doc_id"].to_pylist() == [0]
    # and the dictionary itself holds reversed terms
    from lucene_solr_ray.index.reader import ShardReader

    r = ShardReader(idx, 0)
    assert "eldeen" in set(r.terms.tolist())


def test_config_validation():
    with pytest.raises(ValueError):
        IndexBuildConfig(token_filters=("bogus",))
    with pytest.raises(ValueError):
        IndexBuildConfig(edge_ngram=(3, 2))


def test_distributed_searcher_mirrors_chain(tf_idx):
    from lucene_solr_ray.search.searcher import DistributedSearcher

    d = DistributedSearcher(tf_idx, num_actors=2)
    assert d.search("john's", k=5)["doc_id"].to_pylist() == [0]
    assert d.search("john", k=5)["doc_id"].to_pylist() == [0]


def test_soundex_classic_vectors():
    from lucene_solr_ray.analysis.filters import soundex_filter

    # the canonical American-Soundex test set (h/w transparency, vowel
    # separation, first-letter code suppression)
    assert soundex_filter("robert") == "r163"
    assert soundex_filter("rupert") == "r163"
    assert soundex_filter("ashcraft") == "a261"
    assert soundex_filter("ashcroft") == "a261"
    assert soundex_filter("tymczak") == "t522"
    assert soundex_filter("pfister") == "p236"
    assert soundex_filter("honeyman") == "h555"
    assert soundex_filter("123") == "123"       # no letters: pass-through


def test_soundex_phonetic_search(tmp_path_factory, ray_session):
    tmp = tmp_path_factory.mktemp("sx")
    p = _write(tmp, ["robert called", "rupert answered", "nobody home"])
    idx = str(tmp / "idx")
    build_index(p, idx, cfg=IndexBuildConfig(
        num_shards=1, num_buckets=2, token_filters=("soundex",)))
    s = IndexSearcher(idx)
    # phonetic match: either spelling finds both docs
    assert set(s.search("robert", k=5)["doc_id"].to_pylist()) == {0, 1}
    assert set(s.search("rupert", k=5)["doc_id"].to_pylist()) == {0, 1}


def test_protected_words_skip_stemmer(tmp_path_factory, ray_session):
    tmp = tmp_path_factory.mktemp("kwm")
    p = _write(tmp, ["searching the archives", "maths class"])
    idx = str(tmp / "idx")
    build_index(p, idx, cfg=IndexBuildConfig(
        num_shards=1, num_buckets=2, stemmer="porter",
        protected_words=("maths",)))
    from lucene_solr_ray.index.reader import ShardReader

    r = ShardReader(idx, 0)
    terms = set(r.terms.tolist())
    assert "maths" in terms          # protected: NOT stemmed to "math"
    assert "search" in terms         # unprotected: porter-stemmed
    s = IndexSearcher(idx)
    # query side honors the same marker set
    assert s.search("maths", k=5)["doc_id"].to_pylist() == [1]
    assert s.search("searching", k=5)["doc_id"].to_pylist() == [0]


def test_keep_words_filter(tmp_path_factory, ray_session):
    from lucene_solr_ray.analysis.filters import build_chain

    ch, drops = build_chain((("keep_words", "fox,dog"),))
    assert drops
    assert ch("fox") == "fox" and ch("cat") is None
    tmp = tmp_path_factory.mktemp("kw")
    p = _write(tmp, ["fox dog cat", "cat only here"])
    idx = str(tmp / "idx")
    build_index(p, idx, cfg=IndexBuildConfig(
        num_shards=1, num_buckets=2,
        token_filters=(("keep_words", "fox,dog"),)))
    s = IndexSearcher(idx)
    assert s.count("fox") == 1
    assert s.count("cat") == 0       # not in the keep set -> never indexed


def test_per_field_filter_chain(tmp_path_factory, ray_session):
    import pyarrow as pa
    import pyarrow.parquet as pq

    tmp = tmp_path_factory.mktemp("pf")
    p = str(tmp / "c.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["body text one", "body text two"]),
        "title": pa.array(["Smith's Cookbook", "a tiny x guide"]),
    }), p)
    idx = str(tmp / "idx")
    build_index(p, idx, cfg=IndexBuildConfig(
        num_shards=2, num_buckets=4,
        analyzed_fields=(
            ("title", "", "", ("english_possessive", ("length", 2, 64))),
        ),
    ))
    s = IndexSearcher(idx)
    # per-field chain at index time: "Smith's" -> title:smith; query-side
    # mirror runs the same chain on field values
    assert s.search("title:smith", k=5)["doc_id"].to_pylist() == [0]
    assert s.search("title:smith's", k=5)["doc_id"].to_pylist() == [0]
    # length filter drops 1-char tokens in the field only
    assert s.search("title:x", k=5).num_rows == 0
    # field phrase honors the chain ("a" and "x" dropped w/ holes)
    assert s.search('title:"tiny guide"~2', k=5)["doc_id"].to_pylist() == [1]
    # TEXT field untouched by the per-field chain
    assert s.count("one") == 1


def test_check_index_accepts_edge_ngram(tmp_path_factory, ray_session):
    """Edge-gram insertions add postings without doclen contribution, so
    check_index's ttf invariant must relax to >= (regression: a healthy
    edge_ngram index was reported corrupt in full mode)."""
    from lucene_solr_ray.index.maintenance import check_index

    tmp = tmp_path_factory.mktemp("eg_check")
    p = _write(tmp, TEXTS)
    idx = str(tmp / "idx")
    build_index(p, idx, cfg=IndexBuildConfig(
        num_shards=2, num_buckets=4, edge_ngram=(2, 5)))
    rep = check_index(idx)
    assert rep["ok"] and rep["terms_checked"] > 0


def test_normalization_filters_reference_semantics():
    from lucene_solr_ray.analysis.filters import (
        apostrophe_filter,
        german_normalization,
        scandinavian_fold,
    )

    # tr/ApostropheFilter.java:36
    assert apostrophe_filter("türkiye'nin") == "türkiye"
    assert apostrophe_filter("istanbul’da") == "istanbul"
    assert apostrophe_filter("plain") == "plain"
    # de/GermanNormalizationFilter.java:41 (3-state FSM)
    assert german_normalization("straße") == "strasse"
    assert german_normalization("häuser") == "hauser"
    assert german_normalization("quelle") == "quelle"   # 'ue' after q kept
    assert german_normalization("mauer") == "mauer"     # 'ue' after vowel kept
    assert german_normalization("baer") == "bar"        # ae digraph folds
    assert german_normalization("boese") == "bose"      # oe digraph folds
    assert german_normalization("fluesse") == "flusse"  # initial-u umlaut state
    # miscellaneous/ScandinavianFoldingFilter.java:79
    assert scandinavian_fold("räksmörgås") == "raksmorgas"
    assert scandinavian_fold("blåbærsyltetøj") == "blabarsyltetoj"
    assert scandinavian_fold("raeksmoergaas") == "raksmorgas"
    assert scandinavian_fold("aaa") == "aa"  # the reference's scan artifact


def test_new_filters_in_chain():
    ch, drops = build_chain(("apostrophe", "german_normalization",
                             "scandinavian_fold"))
    assert not drops
    assert ch("straße'nin") == "strasse"


def test_unicode_fold():
    from lucene_solr_ray.analysis.filters import unicode_fold

    # diacritics strip (NFKD + Mn removal)
    assert unicode_fold("café") == "cafe"
    assert unicode_fold("naïve") == "naive"
    assert unicode_fold("Über") == "uber"
    # compatibility forms: fullwidth + ligature
    assert unicode_fold("ＡＢＣ") == "abc"
    assert unicode_fold("ﬁle") == "file"
    # case fold beyond lower(): German sharp s
    assert unicode_fold("STRASSE") == "strasse"
    assert unicode_fold("straße") == "strasse"
    # ascii fast path
    assert unicode_fold("Plain") == "plain"
    ch, drops = build_chain(("unicode_fold",))
    assert not drops and ch("Café") == "cafe"
