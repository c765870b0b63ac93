"""Product quantization ANN (ann/pq.py, Jégou et al. 2011) — codebook
round trips, ADC exactness against decoded vectors, recall vs brute
force, compression."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from lucene_solr_ray.ann.pq import (pq_decode, pq_encode, pq_search,
                                    train_pq)


def make_vectors(n=400, d=16, n_clusters=8, seed=3):
    rng = np.random.RandomState(seed)
    cents = rng.randn(n_clusters, d) * 5
    x = cents[rng.randint(0, n_clusters, n)] + rng.randn(n, d) * 0.3
    return x


@pytest.fixture(scope="module")
def setup(ray_session):
    x = make_vectors()
    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(len(x)), pa.int64()),
        "embedding": pa.array([row.tolist() for row in x],
                              pa.list_(pa.float32())),
    }))
    books = train_pq(ds, "embedding", m=4, k=64, iters=10)
    codes_ds = pq_encode(ds, "vec_id", "embedding", books)
    return x, ds, books, codes_ds


def test_shapes_and_compression(setup):
    x, _, books, codes_ds = setup
    assert books.shape == (4, 64, 4)
    enc = codes_ds.to_pandas().sort_values("vec_id")
    assert len(enc) == len(x)
    # 16 float32s (64 bytes) -> 4 uint8s: 16x compression
    assert all(len(c) == 4 for c in enc["codes"])


def test_adc_exact_on_decoded(setup):
    """ADC with the ip metric must equal q . decode(code) exactly-ish."""
    x, _, books, codes_ds = setup
    enc = codes_ds.to_pandas().sort_values("vec_id")
    codes = np.stack(enc["codes"].to_numpy())
    dec = pq_decode(codes, books)
    q = x[:3]
    got = pq_search(codes_ds, "vec_id", books, q, k=5, metric="ip")
    for qi in range(3):
        sub = got.to_pandas()
        sub = sub[sub["query_id"] == qi]
        for vid, s in zip(sub["vec_id"], sub["score"]):
            assert s == pytest.approx(float(q[qi] @ dec[int(vid)]),
                                      rel=1e-9)


def test_recall_vs_brute(setup):
    """On well-clustered data the quantized top-10 must overlap the exact
    cosine top-10 substantially (codes preserve cluster geometry)."""
    x, ds, books, codes_ds = setup
    # l2 metric compares like-for-like with nearest-neighbor geometry
    q = x[:8]
    got = pq_search(codes_ds, "vec_id", books, q, k=10, metric="l2")
    gp = got.to_pandas()
    recalls = []
    for qi in range(len(q)):
        d2 = ((x - q[qi]) ** 2).sum(axis=1)
        exact = set(np.argsort(d2)[:10])
        approx = set(gp[gp["query_id"] == qi]["vec_id"])
        recalls.append(len(exact & approx) / 10)
    assert np.mean(recalls) >= 0.6


def test_l2_table_matches_decoded_distance(setup):
    x, _, books, codes_ds = setup
    enc = codes_ds.to_pandas().sort_values("vec_id")
    codes = np.stack(enc["codes"].to_numpy())
    dec = pq_decode(codes, books)
    q = x[5:6]
    got = pq_search(codes_ds, "vec_id", books, q, k=3,
                    metric="l2").to_pandas()
    for vid, s in zip(got["vec_id"], got["score"]):
        # search negates l2 so bigger == closer
        assert -s == pytest.approx(float(((q[0] - dec[int(vid)]) ** 2).sum()),
                                   rel=1e-9)


def test_bad_dims():
    with pytest.raises(ValueError):
        ds = ray.data.from_arrow(pa.table({
            "embedding": pa.array([[1.0, 2.0, 3.0]],
                                  pa.list_(pa.float32()))}))
        train_pq(ds, "embedding", m=2)
