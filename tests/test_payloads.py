"""Delimited payloads end to end: WhitespaceTokenizer ->
DelimitedPayloadTokenFilter(IntegerEncoder) chain at build
(analysis/payloads/DelimitedPayloadTokenFilter.java:33), payload ints
riding the per-occurrence sidecar through encode/merge/purge, and
PayloadScoreQuery aggregation at query time
(queries/payloads/PayloadScoreQuery.java:57)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.index import IndexBuildConfig, build_index
from lucene_solr_ray.index.maintenance import check_index, force_merge
from lucene_solr_ray.search import IndexSearcher
from lucene_solr_ray.search.services import payload_score

TEXTS = [
    "fast|3 query merge|10 fast|7",      # fast payloads {3, 7}
    "slow fast query|2",                 # fast has NO payload
    "fast|1 fast|1 fast|4",              # {1, 1, 4}
    "query merge",                       # no fast at all
    "FAST|9 mixed Case|5",               # lowercased term, payload kept
]


@pytest.fixture(scope="module")
def idx(tmp_path_factory, ray_session):
    root = tmp_path_factory.mktemp("payload")
    corpus = str(root / "corpus.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(TEXTS)), pa.int64()),
        "text": pa.array(TEXTS),
    }), corpus)
    d = str(root / "idx")
    build_index(corpus, d, key_col="doc_id", text_col="text",
                cfg=IndexBuildConfig(num_shards=2, num_buckets=4,
                                     payload_delimiter="|"))
    return d


def test_config_validation():
    with pytest.raises(ValueError, match="sidecar"):
        IndexBuildConfig(payload_delimiter="|", store_offsets=True)
    with pytest.raises(ValueError, match="incompatible"):
        IndexBuildConfig(payload_delimiter="|", stemmer="porter")
    with pytest.raises(ValueError, match="store_positions"):
        IndexBuildConfig(payload_delimiter="|", store_positions=False)


def test_payload_functions(idx):
    s = IndexSearcher(idx)
    # docs matching 'fast': 0 {3,7}, 1 {} (no payload), 2 {1,1,4}, 4 {9}
    want = {
        "max": {0: 7.0, 1: 0.0, 2: 4.0, 4: 9.0},
        "min": {0: 3.0, 1: 0.0, 2: 1.0, 4: 9.0},
        "sum": {0: 10.0, 1: 0.0, 2: 6.0, 4: 9.0},
        "avg": {0: 5.0, 1: 0.0, 2: 2.0, 4: 9.0},
    }
    for fn, exp in want.items():
        t = payload_score(s, "fast", fn)
        got = dict(zip(t["doc_id"].to_pylist(), t["score"].to_pylist()))
        assert got == exp, fn


def test_positions_and_bm25_still_work(idx):
    s = IndexSearcher(idx)
    # payload annotations never leak into terms
    assert s.count("fast") == 4
    assert s.count("merge") == 2
    # phrase over payload-carrying tokens: positions are real
    t = s.match_all('"fast query"')
    assert t["doc_id"].to_pylist() == [0, 1]


def test_check_index_green(idx):
    rep = check_index(idx)
    assert rep["ok"]


def test_payloads_survive_force_merge(idx, tmp_path):
    from lucene_solr_ray.index.maintenance import delete_by_ids

    # tombstone a doc, purge, re-check payload aggregation
    delete_by_ids(idx, [2])
    force_merge(idx)
    s = IndexSearcher(idx)
    t = payload_score(s, "fast", "sum")
    got = dict(zip(t["doc_id"].to_pylist(), t["score"].to_pylist()))
    assert got == {0: 10.0, 1: 0.0, 4: 9.0}


def test_unknown_function(idx):
    with pytest.raises(ValueError):
        payload_score(IndexSearcher(idx), "fast", "median")
