"""facet_top_k_refined: refinement-phase parity vs the exact rollup, plus
the TPUT certificate's fallback on adversarially-spread keys."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from lucene_solr_ray.relational import facet_counts
from lucene_solr_ray.relational.ops import _facet_top_k_refined


def _exact_topk(ds, key, k):
    rows = facet_counts(ds, key, "cnt") \
        .sort(["cnt", key], descending=[True, False]).limit(k).take_all()
    return [(r[key], int(r["cnt"])) for r in rows]


def test_refined_matches_exact_on_zipf(ray_session):
    rng = np.random.default_rng(7)
    vals = [f"v{z}" for z in rng.zipf(1.3, 20000) if z < 500]
    tables = [
        pa.table({"key": pa.array(vals[i::8], pa.string())}) for i in range(8)
    ]
    ds = ray.data.from_arrow(tables)
    out, certified = _facet_top_k_refined(ds, "key", 10)
    got = list(zip(out["key"].to_pylist(), out["cnt"].to_pylist()))
    assert certified  # Zipf heads dominate every block: no fallback needed
    assert got == _exact_topk(ds, "key", 10)


def test_refined_fallback_on_spread_key(ray_session):
    # 'v' appears 3x in EVERY block but never in a block's local top-1;
    # per-block fillers appear 5x each. Global: v=24 beats every filler (5).
    # With k=1, overrequest=0 the refinement alone would miss v; the
    # certificate must detect it and fall back to the exact rollup.
    tables = []
    for b in range(8):
        tables.append(pa.table({
            "key": pa.array([f"f{b}"] * 5 + ["v"] * 3, pa.string())}))
    ds = ray.data.from_arrow(tables)
    out, certified = _facet_top_k_refined(ds, "key", 1, overrequest=0)
    assert not certified
    got = list(zip(out["key"].to_pylist(), out["cnt"].to_pylist()))
    assert got == [("v", 24)]


def test_refined_small_cardinality_certifies(ray_session):
    # fewer distinct values than the refine set: every value is refined,
    # thresholds are 0, certificate passes trivially, counts exact
    tables = [pa.table({"key": pa.array(["a"] * 4 + ["b"] * 2 + ["c"],
                                        pa.string())}) for _ in range(4)]
    ds = ray.data.from_arrow(tables)
    out, certified = _facet_top_k_refined(ds, "key", 3)
    assert certified
    assert list(zip(out["key"].to_pylist(), out["cnt"].to_pylist())) == [
        ("a", 16), ("b", 8), ("c", 4)]
