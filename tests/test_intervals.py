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
