import numpy as np
import pytest

from lucene_solr_ray.relational.sketches import (
    HLL,
    TDigest,
    approx_count_distinct,
    approx_quantiles,
)


def test_hll_accuracy():
    rng = np.random.default_rng(0)
    for true_n in [100, 5000, 100_000]:
        h = HLL(p=12)
        vals = rng.integers(0, 2**63, size=true_n, dtype=np.uint64)
        h.add_values(np.unique(vals).tolist())
        est = h.estimate()
        true = len(np.unique(vals))
        assert abs(est - true) / true < 0.05, (true, est)


def test_hll_merge_equals_union():
    a, b = HLL(), HLL()
    a.add_values(range(0, 6000))
    b.add_values(range(3000, 9000))
    u = a.merge(b)
    est = u.estimate()
    assert abs(est - 9000) / 9000 < 0.05
    # idempotent merge
    assert u.merge(u).estimate() == est


def test_tdigest_quantiles():
    rng = np.random.default_rng(1)
    vals = rng.lognormal(3, 1, size=50_000)
    td = TDigest()
    for chunk in np.array_split(vals, 17):
        td.add(chunk)
    for q in [0.1, 0.5, 0.9, 0.99]:
        exact = np.quantile(vals, q)
        approx = td.quantile(q)
        assert abs(approx - exact) / exact < 0.03, (q, exact, approx)


def test_tdigest_merge():
    rng = np.random.default_rng(2)
    vals = rng.normal(100, 15, size=40_000)
    parts = np.array_split(vals, 8)
    tds = []
    for p in parts:
        t = TDigest()
        t.add(p)
        tds.append(t)
    acc = tds[0]
    for t in tds[1:]:
        acc = acc.merge(t)
    assert abs(acc.quantile(0.5) - np.quantile(vals, 0.5)) < 1.0


def test_dataset_sketch_ops(ray_session, sf_dir):
    import ray.data

    li = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_extendedprice"])
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_extendedprice"])
    true_distinct = len(set(t["l_partkey"].to_pylist()))
    est = approx_count_distinct(li, "l_partkey")
    assert abs(est - true_distinct) / true_distinct < 0.05

    vals = np.asarray(t["l_extendedprice"].to_pylist())
    [q50] = approx_quantiles(li, "l_extendedprice", [0.5])
    assert abs(q50 - np.quantile(vals, 0.5)) / np.quantile(vals, 0.5) < 0.02
