"""IVF-Flat ANN index tests: exact parity when probing all lists, recall
at small nprobe on clustered data, and probe-mask correctness."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from lucene_solr_ray.ann import brute_force_knn, build_ivf_index, \
    ivf_index_search

DIM = 16
N_CLUSTERS = 8
PER = 100


@pytest.fixture(scope="module")
def corpus(ray_session):
    rng = np.random.default_rng(3)
    centers = rng.normal(size=(N_CLUSTERS, DIM)) * 4
    vecs = np.concatenate([
        centers[i] + rng.normal(scale=0.3, size=(PER, DIM))
        for i in range(N_CLUSTERS)
    ])
    ids = np.arange(len(vecs), dtype=np.int64)
    t = pa.table({
        "vec_id": pa.array(ids),
        "embedding": pa.array(vecs.tolist(),
                              pa.list_(pa.float64())),
    })
    return t, vecs


@pytest.fixture(scope="module")
def ivf_dir(corpus, tmp_path_factory):
    t, _ = corpus
    d = str(tmp_path_factory.mktemp("ivf") / "idx")
    meta = build_ivf_index(ray.data.from_arrow(t), d, "vec_id", "embedding",
                           n_lists=N_CLUSTERS, sample_size=400, iters=8,
                           seed=7)
    assert meta["n_lists"] == N_CLUSTERS
    return d


def test_ivf_full_probe_equals_brute_force(corpus, ivf_dir):
    t, vecs = corpus
    queries = vecs[[5, 250, 707]]
    exact = brute_force_knn(ray.data.from_arrow(t), "vec_id", "embedding",
                            queries, k=10)
    got = ivf_index_search(ivf_dir, queries, k=10, nprobe=N_CLUSTERS)
    assert got["key"].to_pylist() == exact["key"].to_pylist()
    np.testing.assert_allclose(got["cosine"].to_pylist(),
                               exact["cosine"].to_pylist(), rtol=1e-9)


def test_ivf_small_nprobe_recall(corpus, ivf_dir):
    t, vecs = corpus
    rng = np.random.default_rng(11)
    q_idx = rng.choice(len(vecs), size=10, replace=False)
    queries = vecs[q_idx]
    exact = brute_force_knn(ray.data.from_arrow(t), "vec_id", "embedding",
                            queries, k=10)
    got = ivf_index_search(ivf_dir, queries, k=10, nprobe=2)
    hits = 0
    for qi in range(10):
        e = {k for q, k in zip(exact["query_id"].to_pylist(),
                               exact["key"].to_pylist()) if q == qi}
        g = {k for q, k in zip(got["query_id"].to_pylist(),
                               got["key"].to_pylist()) if q == qi}
        hits += len(e & g) / len(e)
    assert hits / 10 >= 0.9  # clustered data: nprobe=2 recalls ~everything


def test_ivf_probe_mask_restricts_lists(corpus, ivf_dir):
    # nprobe=1: every result must come from the query's single nearest list
    import json
    import os

    import pyarrow.parquet as pq

    t, vecs = corpus
    cents = np.load(os.path.join(ivf_dir, "centroids.npy"))
    q = vecs[[40]]
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    best = int(np.argmax(qn @ cents.T, axis=1)[0])
    got = ivf_index_search(ivf_dir, q, k=50, nprobe=1)
    allowed = set(pq.read_table(
        os.path.join(ivf_dir, f"list={best}"))["vec_id"].to_pylist())
    assert set(got["key"].to_pylist()) <= allowed
    assert got.num_rows > 0


def test_ivf_empty_list_reseed(ray_session, tmp_path):
    # more lists than natural clusters still yields non-empty training
    rng = np.random.default_rng(5)
    vecs = rng.normal(size=(40, 8))
    t = pa.table({
        "vec_id": pa.array(np.arange(40, dtype=np.int64)),
        "embedding": pa.array(vecs.tolist(), pa.list_(pa.float64())),
    })
    d = str(tmp_path / "idx")
    meta = build_ivf_index(ray.data.from_arrow(t), d, "vec_id", "embedding",
                           n_lists=16, sample_size=40, iters=5)
    got = ivf_index_search(d, vecs[[0]], k=5, nprobe=16)
    assert got.num_rows == 5
    assert got["key"].to_pylist()[0] == 0  # self is nearest
