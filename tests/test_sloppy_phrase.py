"""Exact SloppyPhraseMatcher semantics (search/SloppyPhraseMatcher.java:60):
matchLength = max(pp) - min(pp) over phrase positions, sloppyFreq =
sum 1/(1+matchLength) over minimal windows, repeats on distinct positions."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.index import IndexBuildConfig, build_index
from lucene_solr_ray.search import IndexSearcher
from lucene_solr_ray.search.executor import (
    _score_phrase,
    _score_sloppy_phrase,
    _sloppy_freq_doc,
    resolve_weights,
)
from lucene_solr_ray.search.query import Phrase

TEXTS = [
    "a x b x c",   # 0: "a b c" window = max(0,1,2)-min = 2
    "a b c y z",   # 1: exact window 0
    "b a z z z",   # 2: "a b" transposed -> window 2
    "a b a z z",   # 3: repeats "a b a" exact
    "a b x z z",   # 4: single 'a' -> repeats can't match "a b a"
    "a b a b a",   # 5
    "x y z w v",   # 6: no phrase terms
]


@pytest.fixture(scope="module")
def sloppy_index(tmp_path_factory, ray_session):
    tmp = tmp_path_factory.mktemp("sloppy")
    p = str(tmp / "c.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(len(TEXTS), dtype=np.int64)),
        "text": pa.array(TEXTS, pa.string()),
    }), p)
    idx = str(tmp / "idx")
    build_index(p, idx, cfg=IndexBuildConfig(num_shards=2, num_buckets=4))
    return idx


def _eval(idx, node):
    s = IndexSearcher(idx)
    w = resolve_weights(s.reader, node, s.params, s.dtype)
    docs, scores = [], []
    for sh in s.reader.shards:
        d, sc = (_score_sloppy_phrase if node.slop > 0 else _score_phrase)(
            sh, node, w, s.dtype)
        docs.append(d)
        scores.append(sc)
    d = np.concatenate(docs)
    sc = np.concatenate(scores)
    o = np.argsort(d)
    return d[o], sc[o]


def test_window_is_max_minus_min_not_displacement_sum(sloppy_index):
    # doc 0 "a x b x c": pp = (0, 1, 2) -> matchLength 2, within slop 2.
    # (The old displacement-sum approximation computed 1+2=3 and rejected.)
    d, _ = _eval(sloppy_index, Phrase(("a", "b", "c"), slop=2))
    assert 0 in d.tolist() and 1 in d.tolist()


def test_transposed_pair_matches_at_slop_2(sloppy_index):
    d, _ = _eval(sloppy_index, Phrase(("a", "b"), slop=2))
    assert 2 in d.tolist()
    d0, _ = _eval(sloppy_index, Phrase(("a", "b"), slop=1))
    assert 2 not in d0.tolist()


def test_repeats_need_distinct_positions(sloppy_index):
    d, _ = _eval(sloppy_index, Phrase(("a", "b", "a"), slop=1))
    assert 3 in d.tolist()
    assert 4 not in d.tolist()  # only one 'a' in the doc


def test_slop_zero_equals_exact_path(sloppy_index):
    node = Phrase(("a", "b"), slop=0)
    s = IndexSearcher(sloppy_index)
    w = resolve_weights(s.reader, node, s.params, s.dtype)
    for sh in s.reader.shards:
        de, se = _score_phrase(sh, node, w, s.dtype)
        ds, ss = _score_sloppy_phrase(sh, node, w, s.dtype)
        assert de.tolist() == ds.tolist()
        np.testing.assert_allclose(se, ss, rtol=1e-6)


def test_sloppy_freq_doc_values():
    # "a b c y z" exact: one window of length 0 -> 1.0
    assert _sloppy_freq_doc(
        [np.asarray([0]), np.asarray([0]), np.asarray([0])], 2, []
    ) == pytest.approx(1.0)
    # "a x b x c": pp lists a=[0], b=[1], c=[2] -> one window len 2 -> 1/3
    assert _sloppy_freq_doc(
        [np.asarray([0]), np.asarray([1]), np.asarray([2])], 2, []
    ) == pytest.approx(1.0 / 3.0)
    # "a b a b a" / phrase "a b": pp a=[0,2,4], b=[0,2] -> sweep windows:
    # (0,0)=1.0 advance a; (2,0) len2 -> 1/3; advance b; (2,2)=1.0 advance a;
    # (4,2) len2 -> 1/3; advance b exhausts.
    f = _sloppy_freq_doc([np.asarray([0, 2, 4]), np.asarray([0, 2])], 2, [])
    assert f == pytest.approx(1.0 + 1 / 3 + 1.0 + 1 / 3)
    # repeats: "a b a" over "a b a": slot0 a=[0,2], slot1 b=[0], slot2 a=[-2,0]
    # valid: actual positions distinct -> (0,0,0) window 0 -> 1.0 first match
    f = _sloppy_freq_doc(
        [np.asarray([0, 2]), np.asarray([0]), np.asarray([-2, 0])], 0,
        [(0, 2)],
    )
    assert f >= 1.0
