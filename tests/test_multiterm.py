import numpy as np
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.index import IndexBuildConfig, build_index
from lucene_solr_ray.search import IndexSearcher
from lucene_solr_ray.search.query import (
    Bool,
    ConstantScore,
    DisMax,
    Fuzzy,
    MatchAll,
    Prefix,
    Regexp,
    Synonym,
    Term,
    TermInSet,
    TermRange,
    Wildcard,
    parse_query,
)

DOCS = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture(scope="module")
def idx(tmp_path_factory, ray_session):
    d = str(tmp_path_factory.mktemp("mt_idx"))
    cfg = IndexBuildConfig(num_shards=2, num_buckets=4, batch_size=256)
    build_index(DOCS, d, key_col="doc_id", text_col="text", cfg=cfg)
    return d


@pytest.fixture(scope="module")
def raw():
    t = pq.read_table(DOCS, columns=["doc_id", "text"])
    return list(zip(t["doc_id"].to_pylist(), [s.split(" ") for s in t["text"].to_pylist()]))


def match_ids(raw, pred):
    return sorted(d for d, toks in raw if any(pred(t) for t in toks))


def test_parser_forms():
    assert isinstance(parse_query("fa*"), Prefix)
    assert isinstance(parse_query("f?st"), Wildcard)
    assert isinstance(parse_query("fast~1"), Fuzzy)
    assert isinstance(parse_query("[fast TO query]"), TermRange)
    assert isinstance(parse_query("/fa.t/"), Regexp)


def test_prefix(idx, raw):
    s = IndexSearcher(idx)
    got = s.match_all(Prefix("fa"))
    assert got["doc_id"].to_pylist() == match_ids(raw, lambda t: t.startswith("fa"))
    # constant score
    assert set(got["score"].to_pylist()) == {1.0}


def test_wildcard_and_regexp(idx, raw):
    s = IndexSearcher(idx)
    got = s.match_all(Wildcard("f?st"))
    import re

    exp = match_ids(raw, lambda t: re.fullmatch(r"f.st", t))
    assert got["doc_id"].to_pylist() == exp
    got2 = s.match_all(Regexp("f.st"))
    assert got2["doc_id"].to_pylist() == exp


def test_term_range(idx, raw):
    s = IndexSearcher(idx)
    got = s.match_all(TermRange("fast", "hash"))
    exp = match_ids(raw, lambda t: "fast" <= t <= "hash")
    assert got["doc_id"].to_pylist() == exp


def test_fuzzy(idx, raw):
    s = IndexSearcher(idx)
    got = s.match_all(Fuzzy("fasx", max_edits=1))
    # "fast" is 1 edit away
    exp = match_ids(raw, lambda t: t == "fast" or t == "fasx")
    assert got["doc_id"].to_pylist() == exp


def test_term_in_set_and_matchall(idx, raw):
    s = IndexSearcher(idx)
    got = s.match_all(TermInSet(("fast", "query")))
    exp = match_ids(raw, lambda t: t in ("fast", "query"))
    assert got["doc_id"].to_pylist() == exp
    n = s.count(MatchAll())
    assert n == len(raw)


def test_synonym_scoring(idx, raw):
    # synonym score == single-term score computed with df=max, freq=sum
    s = IndexSearcher(idx)
    got = s.match_all(Synonym(("fast", "quick")))  # quick not in corpus
    single = s.match_all(Term("fast"))
    # df(fast) >= df(quick)=0 so blended df == df(fast); freqs identical
    assert got["doc_id"].to_pylist() == single["doc_id"].to_pylist()
    np.testing.assert_allclose(got["score"].to_pylist(), single["score"].to_pylist())


def test_dismax(idx):
    s = IndexSearcher(idx)
    a = s.match_all(Term("fast"))
    b = s.match_all(Term("query"))
    dm = s.match_all(DisMax((Term("fast"), Term("query")), tiebreak=0.0))
    sa = dict(zip(a["doc_id"].to_pylist(), a["score"].to_pylist()))
    sb = dict(zip(b["doc_id"].to_pylist(), b["score"].to_pylist()))
    for d, sc in zip(dm["doc_id"].to_pylist(), dm["score"].to_pylist()):
        exp = max(sa.get(d, -1), sb.get(d, -1))
        assert abs(sc - exp) < 1e-6


def test_constant_score_wrapper(idx):
    s = IndexSearcher(idx)
    got = s.match_all(ConstantScore(Term("fast"), boost=2.5))
    assert set(got["score"].to_pylist()) == {2.5}


def test_multiterm_in_bool(idx, raw):
    s = IndexSearcher(idx)
    got = s.match_all(parse_query("fa* AND query"))
    exp = sorted(
        d for d, toks in raw
        if any(t.startswith("fa") for t in toks) and "query" in toks
    )
    assert got["doc_id"].to_pylist() == exp


def test_distributed_multiterm(idx):
    from lucene_solr_ray.search import DistributedSearcher

    local = IndexSearcher(idx)
    dist = DistributedSearcher(idx, num_actors=2)
    for q in ["fa*", "f?st", "fast~1", "fa* AND query"]:
        a = local.search(q, k=10)
        b = dist.search(q, k=10)
        assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist(), q
        assert a["score"].to_pylist() == b["score"].to_pylist(), q


def test_fuzzy_damerau_transposition():
    # 'ab'~1 must match 'ba' (adjacent transposition = one edit)
    from lucene_solr_ray.search.multiterm import _levenshtein_leq

    assert _levenshtein_leq("ab", "ba", 1)
    assert not _levenshtein_leq("abcd", "badc", 1)  # two transpositions
    assert _levenshtein_leq("abcd", "badc", 2)


def test_fuzzy_max_expansions_cap(tmp_path):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_solr_ray.index import IndexBuildConfig, build_index
    from lucene_solr_ray.search import IndexSearcher
    from lucene_solr_ray.search.query import Fuzzy, Synonym

    # many one-edit neighbours of 'cat': cap must keep the highest-df ones
    variants = ["cat" + c for c in "abcdefgh"]  # cata..cath (8 edits of 'cat')
    texts = ["cat common common"] * 50
    for i, v in enumerate(variants):
        texts.extend([v] * (i + 1))  # df ladder: cata=1 ... cath=8
    ids = np.arange(len(texts), dtype=np.int64)
    p = str(tmp_path / "c.parquet")
    pq.write_table(pa.table({"doc_id": pa.array(ids),
                             "text": pa.array(texts, pa.string())}), p)
    idx = str(tmp_path / "idx")
    build_index(p, idx, cfg=IndexBuildConfig(num_shards=2, num_buckets=4))
    s = IndexSearcher(idx)
    node = s._node(Fuzzy("cat", max_edits=1, max_expansions=3))
    assert isinstance(node, Synonym)
    # 'cat' itself (df=50) plus the two highest-df variants
    assert set(node.terms) == {"cat", "cath", "catg"}


def test_bool_must_with_min_should(tmp_path):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_solr_ray.index import IndexBuildConfig, build_index
    from lucene_solr_ray.search import IndexSearcher
    from lucene_solr_ray.search.query import Bool, Term

    texts = ["alpha beta", "alpha gamma", "alpha delta", "alpha beta gamma"]
    p = str(tmp_path / "c.parquet")
    pq.write_table(pa.table({"doc_id": pa.array(np.arange(4, dtype=np.int64)),
                             "text": pa.array(texts, pa.string())}), p)
    idx = str(tmp_path / "idx")
    build_index(p, idx, cfg=IndexBuildConfig(num_shards=1, num_buckets=2))
    s = IndexSearcher(idx)
    # must=alpha, should=[beta, gamma], min_should=1: doc 2 (alpha delta)
    # matches the must clause but NO should clause -> excluded
    node = Bool(must=[Term("alpha")], should=[Term("beta"), Term("gamma")],
                min_should=1)
    assert s.match_all(node)["doc_id"].to_pylist() == [0, 1, 3]
    node2 = Bool(must=[Term("alpha")], should=[Term("beta"), Term("gamma")],
                 min_should=2)
    assert s.match_all(node2)["doc_id"].to_pylist() == [3]
