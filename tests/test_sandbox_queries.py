"""CommonTermsQuery / CoveringQuery / PhraseWildcardQuery parity tests.

Reference semantics: lucene/queries/.../CommonTermsQuery.java:61 (buildQuery
:158-222), lucene/sandbox/.../search/CoveringQuery.java:35 +
CoveringScorer.java:94-115, sandbox/.../search/PhraseWildcardQuery.java.
"""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.index import IndexBuildConfig, build_index
from lucene_solr_ray.search import IndexSearcher
from lucene_solr_ray.search.query import (
    Bool,
    CommonTerms,
    Covering,
    MultiPhrase,
    PhraseWildcard,
    Prefix,
    Term,
    rewrite_common_terms,
)

DOCS = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture(scope="module")
def idx(tmp_path_factory, ray_session):
    d = str(tmp_path_factory.mktemp("sbx_idx"))
    cfg = IndexBuildConfig(num_shards=2, num_buckets=4, batch_size=256)
    build_index(DOCS, d, key_col="doc_id", text_col="text", cfg=cfg)
    return d


@pytest.fixture(scope="module")
def raw():
    t = pq.read_table(DOCS, columns=["doc_id", "text"])
    return list(zip(t["doc_id"].to_pylist(),
                    [s.split(" ") for s in t["text"].to_pylist()]))


def _df(raw, term):
    return sum(1 for _, toks in raw if term in toks)


def _pick_terms(raw):
    """One high-df and two low-df terms from the corpus vocabulary."""
    from collections import Counter

    c = Counter()
    for _, toks in raw:
        c.update(set(toks))
    ranked = c.most_common()
    common = ranked[0][0]
    rare, rare2 = ranked[-1][0], ranked[-2][0]
    assert c[common] > c[rare] and c[common] > c[rare2]
    return common, rare, rare2


# ---------------------------------------------------------------------------
# CommonTermsQuery
# ---------------------------------------------------------------------------

def test_common_terms_rewrite_shapes(idx, raw):
    s = IndexSearcher(idx, dtype=np.float64)
    common, rare, rare2 = _pick_terms(raw)
    n_docs = len(raw)
    # high iff df > ceil(mtf * n): put the cutoff just below df(common)
    cut = (_df(raw, common) - 1) / n_docs

    node = s._node(CommonTerms(terms=(common, rare), max_term_frequency=cut))
    # mixed: low-freq group MUST, high-freq group SHOULD
    assert isinstance(node, Bool) and len(node.must) == 1 and len(node.should) == 1
    assert node.must[0].should[0].text == rare
    assert node.should[0].should[0].text == common

    # all terms above the cutoff -> conjunction of the common terms (:197-204)
    node = s._node(CommonTerms(terms=(common, rare),
                               max_term_frequency=0.0))
    assert isinstance(node, Bool) and node.must and not node.should

    # single term -> plain TermQuery (CommonTermsQuery.rewrite :122-125)
    node = s._node(CommonTerms(terms=(rare,)))
    assert isinstance(node, Term) and node.text == rare


def test_common_terms_scores_match_manual_bool(idx, raw):
    s = IndexSearcher(idx, dtype=np.float64)
    common, rare, rare2 = _pick_terms(raw)
    n_docs = len(raw)
    cut = (_df(raw, common) - 1) / n_docs

    got = s.match_all(CommonTerms(terms=(common, rare, rare2),
                                  max_term_frequency=cut))
    want = s.match_all(Bool(
        must=[Bool(should=[Term(rare), Term(rare2)], min_should=0)],
        should=[Bool(should=[Term(common)])],
    ))
    assert got["doc_id"].to_pylist() == want["doc_id"].to_pylist()
    np.testing.assert_allclose(got["score"].to_pylist(),
                               want["score"].to_pylist())


def test_common_terms_min_should_fraction():
    # minNrShouldMatch(:171-176): fraction rounds vs optional count
    df = {"a": 1, "b": 1, "c": 1, "z": 50}.get
    node = rewrite_common_terms(
        CommonTerms(terms=("a", "b", "c", "z"), max_term_frequency=0.1,
                    low_min_should=0.5), df, 100)
    low = node.must[0]
    assert low.min_should == 2  # round(0.5 * 3)


def test_common_terms_absolute_cutoff():
    # max_term_frequency >= 1 acts as an absolute df cutoff
    df = {"a": 3, "b": 7}.get
    node = rewrite_common_terms(
        CommonTerms(terms=("a", "b"), max_term_frequency=5.0), df, 1000000)
    assert node.must[0].should[0].text == "a"
    assert node.should[0].should[0].text == "b"


def test_common_terms_distributed_parity(idx):
    from lucene_solr_ray.search import DistributedSearcher

    t = pq.read_table(DOCS, columns=["text"])
    toks = [s.split(" ") for s in t["text"].to_pylist()]
    from collections import Counter

    c = Counter()
    for tk in toks:
        c.update(set(tk))
    ranked = c.most_common()
    common, rare = ranked[0][0], ranked[-1][0]
    cut = (ranked[0][1] - 1) / len(toks)
    q = CommonTerms(terms=(common, rare), max_term_frequency=cut)
    local = IndexSearcher(idx, dtype=np.float64).search(q, k=10)
    dist = DistributedSearcher(idx, num_actors=2, dtype=np.float64).search(q, k=10)
    assert local["doc_id"].to_pylist() == dist["doc_id"].to_pylist()
    np.testing.assert_allclose(local["score"].to_pylist(),
                               dist["score"].to_pylist())


# ---------------------------------------------------------------------------
# CoveringQuery
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def cov_setup(tmp_path_factory, ray_session):
    rng = np.random.default_rng(11)
    n = 400
    vocab = [f"w{i}" for i in range(30)]
    texts = [" ".join(rng.choice(vocab, size=12)) for _ in range(n)]
    # per-doc required match count 1..3; every 7th doc missing the field
    minm = [None if i % 7 == 0 else float(1 + i % 3) for i in range(n)]
    tdir = tmp_path_factory.mktemp("cov")
    path = str(tdir / "docs.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(texts, pa.large_string()),
        "min_m": pa.array(minm, pa.float64()),
    }), path)
    d = str(tdir / "idx")
    cfg = IndexBuildConfig(num_shards=2, num_buckets=4, batch_size=128,
                           docvalues_fields=("min_m",))
    build_index(path, d, key_col="doc_id", text_col="text", cfg=cfg)
    return d, texts, minm


def test_covering_matches_and_scores(cov_setup):
    d, texts, minm = cov_setup
    s = IndexSearcher(d, dtype=np.float64)
    clauses = (Term("w1"), Term("w2"), Term("w3"))
    got = s.match_all(Covering(clauses, "min_m"))
    got_ids = got["doc_id"].to_pylist()
    got_scores = dict(zip(got_ids, got["score"].to_pylist()))

    per = {c.text: dict(zip(s.match_all(c)["doc_id"].to_pylist(),
                            s.match_all(c)["score"].to_pylist()))
           for c in clauses}
    exp = {}
    for i, toks in enumerate(t.split(" ") for t in texts):
        if minm[i] is None:
            continue  # docs missing the field never match
        hits = [w for w in ("w1", "w2", "w3") if w in toks]
        if len(hits) >= max(1.0, minm[i]):
            exp[i] = sum(per[w][i] for w in hits)
    assert sorted(got_ids) == sorted(exp)
    for i in exp:
        assert got_scores[i] == pytest.approx(exp[i])


def test_covering_min_below_one_counts_as_one(cov_setup, tmp_path):
    # dv value 0/negative is clamped to 1 (CoveringQuery javadoc)
    d, texts, minm = cov_setup
    s = IndexSearcher(d, dtype=np.float64)
    # with one clause only docs whose required count clamps to 1 can match
    got = s.match_all(Covering((Term("w5"),), "min_m"))
    base = s.match_all(Term("w5"))
    base_ids = set(base["doc_id"].to_pylist())
    want = sorted(i for i in base_ids
                  if minm[i] is not None and max(1.0, minm[i]) <= 1)
    assert sorted(got["doc_id"].to_pylist()) == want


# ---------------------------------------------------------------------------
# PhraseWildcardQuery
# ---------------------------------------------------------------------------

def test_phrase_wildcard_matches_brute_force(idx, raw):
    s = IndexSearcher(idx, dtype=np.float64)
    # find a bigram (exact, prefix*) that actually occurs
    found = None
    for _, toks in raw:
        for a, b in zip(toks, toks[1:]):
            if len(b) >= 4:
                found = (a, b[:3])
                break
        if found:
            break
    lead, pre = found
    got = s.match_all(PhraseWildcard((lead, Prefix(pre))))
    exp = sorted(
        d for d, toks in raw
        if any(x == lead and y.startswith(pre)
               for x, y in zip(toks, toks[1:])))
    assert got["doc_id"].to_pylist() == exp

    # scores equal the explicit MultiPhrase over the expanded dictionary
    vocab = sorted({t for _, toks in raw for t in toks if t.startswith(pre)})
    want = s.match_all(MultiPhrase(((lead,), tuple(vocab))))
    assert got["doc_id"].to_pylist() == want["doc_id"].to_pylist()
    np.testing.assert_allclose(got["score"].to_pylist(),
                               want["score"].to_pylist())


def test_phrase_wildcard_all_exact_is_phrase(idx, raw):
    s = IndexSearcher(idx, dtype=np.float64)
    # two exact positions collapse to a plain Phrase node
    for _, toks in raw:
        if len(toks) >= 2:
            a, b = toks[0], toks[1]
            break
    from lucene_solr_ray.search.query import Phrase

    node = s._node(PhraseWildcard((a, b)))
    assert isinstance(node, Phrase) and node.terms == (a, b)


def test_phrase_wildcard_no_match_position(idx):
    s = IndexSearcher(idx, dtype=np.float64)
    got = s.match_all(PhraseWildcard(("zzzznotaterm", Prefix("qqqq"))))
    assert got.num_rows == 0
