"""Minimal-interval algebra parity (mirrors lucene/queries/.../intervals/
TestIntervals.java case shapes: ordered / unordered / phrase / maxgaps /
maxwidth / containing / contained_by / or over a hand-computed corpus)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.index import IndexBuildConfig, build_index
from lucene_solr_ray.search import IndexSearcher
from lucene_solr_ray.search import intervals as iv
from lucene_solr_ray.search.query import Bool, IntervalQuery, Term

TEXTS = [
    "w1 w2 w3 w4 w5",      # 0
    "w1 w3 w2 w3 w4",      # 1
    "w5 w4 w3 w2 w1",      # 2
    "w1 w1 w2 w2 w3",      # 3
]


@pytest.fixture(scope="module")
def idx(tmp_path_factory, ray_session):
    d = tmp_path_factory.mktemp("iv")
    p = str(d / "c.parquet")
    pq.write_table(pa.table({"doc_id": pa.array(range(len(TEXTS)), pa.int64()),
                             "text": pa.array(TEXTS, pa.string())}), p)
    out = str(d / "idx")
    build_index(p, out, cfg=IndexBuildConfig(num_shards=2, num_buckets=4))
    return out


def _docs(idx, src):
    s = IndexSearcher(idx)
    return sorted(s.match_all(IntervalQuery(src))["doc_id"].to_pylist())


def test_ordered(idx):
    assert _docs(idx, iv.ordered("w1", "w3")) == [0, 1, 3]


def test_unordered(idx):
    assert _docs(idx, iv.unordered("w1", "w3")) == [0, 1, 2, 3]


def test_phrase(idx):
    assert _docs(idx, iv.phrase("w2", "w3")) == [0, 1, 3]


def test_maxgaps(idx):
    assert _docs(idx, iv.maxgaps(0, iv.ordered("w1", "w3"))) == [1]
    assert _docs(idx, iv.maxgaps(1, iv.ordered("w1", "w3"))) == [0, 1]


def test_maxwidth(idx):
    assert _docs(idx, iv.maxwidth(2, iv.unordered("w1", "w3"))) == [1]


def test_containing(idx):
    got = _docs(idx, iv.containing(iv.unordered("w1", "w5"), iv.term("w3")))
    assert got == [0, 2]


def test_contained_by(idx):
    got = _docs(idx, iv.contained_by(iv.term("w3"), iv.unordered("w2", "w4")))
    assert got == [0, 1, 2]


def test_or(idx):
    got = _docs(idx, iv.or_(iv.term("w5"), iv.phrase("w1", "w2")))
    assert got == [0, 2, 3]


def test_minimality_and_freq(idx):
    # doc 3 = "w1 w1 w2 w2 w3": phrase(w1, w2) has exactly ONE minimal
    # interval (1,2) — the (0,?) anchor dies (w2 not at pos 1) and the
    # non-minimal covers are pruned
    from lucene_solr_ray.search.bm25 import BM25Params
    from lucene_solr_ray.search.executor import eval_node, resolve_weights

    s = IndexSearcher(idx, dtype=np.float64)
    node = IntervalQuery(iv.phrase("w1", "w2"))
    weights = resolve_weights(s.reader, node, s.params, np.float64)
    freqs = {}
    for sh in s.reader.shards:
        from lucene_solr_ray.search.intervals import (
            _intervals, _term_positions, terms_of)

        pos_of = {}
        for t in set(terms_of(node.source)):
            _, p = _term_positions(sh, t)
            pos_of[t] = {**pos_of.get(t, {}), **p}
        for d in (0, 3):
            if d in pos_of.get("w1", {}):
                got = _intervals(node.source, pos_of, d)
                freqs[d] = len(got)
    assert freqs.get(3) == 1
    assert freqs.get(0) == 1


def test_intervals_compose_with_bool(idx):
    # interval query as a Bool clause: must match interval AND term w5
    s = IndexSearcher(idx)
    node = Bool(must=[Term("w5")],
                filter=[IntervalQuery(iv.unordered("w1", "w3"))])
    got = sorted(s.match_all(node)["doc_id"].to_pylist())
    assert got == [0, 2]


def test_intervals_empty_and_missing_term(idx):
    assert _docs(idx, iv.ordered("w1", "nosuchterm")) == []
    assert _docs(idx, iv.maxgaps(0, iv.ordered("w3", "w1"))) == []


def test_not_containing(idx):
    # unordered(w1,w5) spans: doc0 [0,4] contains w3@2; doc2 [0,4] contains
    # w3@2 — both excluded; docs 1,3 have no w5 at all
    assert _docs(idx, iv.not_containing(
        iv.unordered("w1", "w5"), iv.term("w3"))) == []
    # exclusion absent everywhere: every big doc passes
    assert _docs(idx, iv.not_containing(
        iv.unordered("w1", "w5"), iv.term("zz"))) == [0, 2]
    # w2..w4 spans not containing w3: doc1 has [2,4]=w2 w3 w4 (contains) but
    # minimal spans may differ — assert against the positive complement
    pos = set(_docs(idx, iv.containing(iv.unordered("w2", "w4"), iv.term("w3"))))
    neg = set(_docs(idx, iv.not_containing(iv.unordered("w2", "w4"),
                                           iv.term("w3"))))
    both = set(_docs(idx, iv.unordered("w2", "w4")))
    assert pos | neg <= both  # each doc appears where >= 1 span qualifies


def test_not_contained_by(idx):
    # w3 occurrences outside every w2..w4 cover: doc3's w3@4 sits inside
    # [3,4]? w2@3,w3@4 -> unordered(w2,w4) needs w4 which doc3 lacks -> all
    # of doc3's w3 qualify
    got = _docs(idx, iv.not_contained_by(iv.term("w3"),
                                         iv.unordered("w2", "w4")))
    assert 3 in got
    # big absent -> small passes untouched
    assert _docs(idx, iv.not_contained_by(iv.term("w3"), iv.term("zz"))) \
        == [0, 1, 2, 3]


def test_overlapping(idx):
    # w3 occurrences overlapping a w2..w4 cover: docs 0,1,2 have a w3
    # inside the minimal w2..w4 span; doc3 lacks w4 entirely
    got = _docs(idx, iv.overlapping(iv.term("w3"),
                                    iv.unordered("w2", "w4")))
    assert got == [0, 1, 2]
    # no reference -> nothing overlaps
    assert _docs(idx, iv.overlapping(iv.unordered("w1", "w2"),
                                     iv.term("zz"))) == []


def test_negative_ops_brute_force_parity(idx):
    """Randomized parity: not_containing/not_contained_by/overlapping vs a
    brute-force O(n^2) interval filter over the same minimal child sets."""
    rng = np.random.default_rng(5)
    vocab = ["w1", "w2", "w3", "w4", "w5"]
    texts = [" ".join(rng.choice(vocab, rng.integers(3, 12)))
             for _ in range(40)]
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        p = f"{d}/c.parquet"
        pq.write_table(pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string())}), p)
        out = f"{d}/idx"
        build_index(p, out, cfg=IndexBuildConfig(num_shards=1, num_buckets=4))

        def brute(doc_text, big_pair, small_term, mode):
            toks = doc_text.split()
            def occs(w):
                return [i for i, t in enumerate(toks) if t == w]
            a, b = big_pair
            spans = []
            for i in occs(a):
                for j in occs(b):
                    lo, hi = min(i, j), max(i, j)
                    if a == b and i == j:
                        continue
                    spans.append((lo, hi))
            # minimalize
            spans = sorted(set(spans))
            spans = [s for s in spans
                     if not any(o != s and s[0] <= o[0] and o[1] <= s[1]
                                for o in spans)]
            sm = occs(small_term)
            if mode == "not_containing":
                return any(not any(s[0] <= x <= s[1] for x in sm)
                           for s in spans)
            if mode == "overlapping":
                return any(any(s[0] <= x <= s[1] for x in sm) for s in spans)
            raise AssertionError(mode)

        for big, small, mode, node in [
            (("w1", "w2"), "w3", "not_containing",
             iv.not_containing(iv.unordered("w1", "w2"), iv.term("w3"))),
            (("w2", "w4"), "w5", "not_containing",
             iv.not_containing(iv.unordered("w2", "w4"), iv.term("w5"))),
            (("w1", "w3"), "w2", "overlapping",
             iv.overlapping(iv.unordered("w1", "w3"), iv.term("w2"))),
        ]:
            got = set(_docs(out, node))
            want = {i for i, t in enumerate(texts) if brute(t, big, small, mode)}
            assert got == want, (mode, big, small)


def test_non_overlapping(idx):
    # w3 occurrences meeting no w2..w4 cover: complement of overlapping
    # within each doc's qualifying spans
    ov = _docs(idx, iv.overlapping(iv.term("w3"), iv.unordered("w2", "w4")))
    non = _docs(idx, iv.non_overlapping(iv.term("w3"),
                                        iv.unordered("w2", "w4")))
    # doc3 lacks w4: reference absent -> all w3 occurrences pass
    assert 3 in non
    # every doc shows up on at least one side (w3 exists in all docs)
    assert sorted(set(ov) | set(non)) == [0, 1, 2, 3]
    # reference absent everywhere: identical to the bare source
    assert _docs(idx, iv.non_overlapping(iv.term("w3"), iv.term("zz"))) \
        == [0, 1, 2, 3]


def test_multiterm_interval_sources(idx):
    # prefix expands to an IOr over matching dictionary terms
    assert _docs(idx, iv.ordered(iv.term("w1"), iv.prefix("w3"))) \
        == _docs(idx, iv.ordered("w1", "w3"))
    # wildcard w? == any vocab term; phrase(w2, w?) == w2 followed by any
    got = _docs(idx, iv.phrase(iv.term("w2"), iv.wildcard("w?")))
    assert got == _docs(idx, iv.phrase(iv.term("w2"),
                                       iv.or_("w1", "w2", "w3", "w4", "w5")))
    assert 0 in got
    # no dictionary match -> no intervals, no crash
    assert _docs(idx, iv.ordered(iv.term("w1"), iv.prefix("zz"))) == []


def test_before_after_brute_force(idx):
    for src_t, ref_t in (("w1", "w3"), ("w4", "w2"), ("w3", "w3")):
        for kind in ("before", "after"):
            ctor = iv.before if kind == "before" else iv.after
            got = set(_docs(idx, ctor(src_t, ref_t)))
            want = set()
            for d, text in enumerate(TEXTS):
                toks = text.split()
                sp = [i for i, t in enumerate(toks) if t == src_t]
                rp = [i for i, t in enumerate(toks) if t == ref_t]
                if not sp or not rp:
                    continue
                if kind == "before" and any(a < max(rp) for a in sp):
                    want.add(d)
                if kind == "after" and any(a > min(rp) for a in sp):
                    want.add(d)
            assert got == want, (kind, src_t, ref_t)
