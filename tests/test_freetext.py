"""FreeTextSuggester: distributed n-gram counts + stupid-backoff lookup
(suggest/analyzing/FreeTextSuggester.java:135) — brute-force parity."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.search.freetext import (
    ALPHA,
    FreeTextSuggester,
    build_freetext,
)

TEXTS = [
    "fast query runs fast queue drains",
    "fast query wins the race",
    "slow query loses fast quest",
    "the queue is fast",
]


def brute(texts):
    toks = [t.split() for t in texts]
    uni: dict[str, int] = {}
    big: dict[tuple, int] = {}
    total = 0
    for ts in toks:
        for w in ts:
            uni[w] = uni.get(w, 0) + 1
            total += 1
        for a, b in zip(ts, ts[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
    return uni, big, total


@pytest.fixture(scope="module")
def sugg(tmp_path_factory, ray_session):
    root = tmp_path_factory.mktemp("freetext")
    corpus = str(root / "corpus.parquet")
    pq.write_table(pa.table({"text": pa.array(TEXTS)}), corpus)
    out = build_freetext(corpus, str(root / "ft_idx"), n=2)
    return FreeTextSuggester(out, n=2)


def test_bigram_scores(sugg):
    uni, big, total = brute(TEXTS)
    out = sugg.lookup("fast q", k=10)
    got = dict(zip(out["word"].to_pylist(), out["score"].to_pylist()))
    # candidates after 'fast' with prefix q: query(2), queue(1), quest(1)
    want = {
        w: big[("fast", w)] / uni["fast"]
        for w in ("query", "queue", "quest")
    }
    assert got == pytest.approx(want)


def test_backoff_to_unigram(sugg):
    uni, big, total = brute(TEXTS)
    # context 'slow': only 'query' follows; 'queue'/'quest' back off
    out = sugg.lookup("slow qu", k=10)
    got = dict(zip(out["word"].to_pylist(), out["score"].to_pylist()))
    want = {
        "query": big[("slow", "query")] / uni["slow"],
        "queue": ALPHA * uni["queue"] / total,
        "quest": ALPHA * uni["quest"] / total,
    }
    assert got == pytest.approx(want)


def test_unknown_context_pure_backoff(sugg):
    uni, big, total = brute(TEXTS)
    out = sugg.lookup("zzz fa", k=10)
    got = dict(zip(out["word"].to_pylist(), out["score"].to_pylist()))
    assert got == pytest.approx({"fast": ALPHA * uni["fast"] / total})


def test_trailing_space_all_continuations(sugg):
    uni, big, total = brute(TEXTS)
    out = sugg.lookup("fast ", k=10)
    got = dict(zip(out["word"].to_pylist(), out["score"].to_pylist()))
    for w, c in big.items():
        if w[0] == "fast":
            assert got[w[1]] == pytest.approx(c / uni["fast"])


def test_topk_order_deterministic(sugg):
    out = sugg.lookup("fast q", k=2)
    scores = out["score"].to_pylist()
    assert scores == sorted(scores, reverse=True)
    # tie between queue/quest (count 1 each) resolves word-ascending
    assert out["word"].to_pylist()[1] in ("quest", "queue")
    out2 = sugg.lookup("fast q", k=3)
    tied = out2.slice(1, 2)["word"].to_pylist()
    assert tied == sorted(tied)
