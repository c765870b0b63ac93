"""Benchmark n-gram decontamination (textstats/decontam.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from lucene_solr_ray.textstats.decontam import _gram_hashes, decontaminate


def test_gram_hashes_identity_and_short_docs():
    g1, d1 = _gram_hashes(["a b c d", "a b c d"], n=3)
    # two identical docs produce identical gram hashes, doc-indexed
    assert len(g1) == 4 and list(d1) == [0, 0, 1, 1]
    assert g1[0] == g1[2] and g1[1] == g1[3] and g1[0] != g1[1]
    # shorter than n -> no grams (mirrors generate_series(1, len-n+1))
    g2, d2 = _gram_hashes(["a b"], n=3)
    assert len(g2) == 0 and len(d2) == 0
    # token-boundary sensitivity: 'ab c' vs 'a bc' must differ
    g3, _ = _gram_hashes(["ab c x", "a bc x"], n=3)
    assert g3[0] != g3[1]


def test_decontaminate_counts_and_flags(ray_session):
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array([
            "a b c d e f g h i j",     # 3 overlapping bench 8-grams
            "x y z w v u t s",         # no overlap
            "a b c d e f g h extra",   # exactly 1 bench 8-gram
            "short text",              # < 8 tokens -> no grams
        ])}))
    bench = ray.data.from_arrow(pa.table({
        "text": pa.array(["a b c d e f g h i j k"])}))
    out = decontaminate(docs, bench, "doc_id", "text", n=8) \
        .to_pandas().sort_values("doc_id")
    assert list(out["contaminated_ngrams"]) == [3, 0, 1, 0]
    assert list(out["is_contaminated"]) == [True, False, True, False]


def test_decontaminate_repeated_gram_counted_once(ray_session):
    # the same benchmark gram appearing twice in a doc counts ONCE
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0], pa.int64()),
        "text": pa.array(["p q r p q r p q r"])}))
    bench = ray.data.from_arrow(pa.table({"text": pa.array(["p q r"])}))
    out = decontaminate(docs, bench, "doc_id", "text", n=3).to_pandas()
    # doc grams: pqr, qrp, rpq, pqr, qrp, rpq, pqr -> distinct matched = 1
    assert list(out["contaminated_ngrams"]) == [1]


def test_decontaminate_empty_benchmark(ray_session):
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0], pa.int64()),
        "text": pa.array(["a b c d"])}))
    bench = ray.data.from_arrow(pa.table({"text": pa.array([], pa.string())}))
    out = decontaminate(docs, bench, "doc_id", "text", n=3).to_pandas()
    assert list(out["is_contaminated"]) == [False]
