"""Spatial queries (LatLonPoint family, search/geo.py): haversine sanity,
box/distance parity vs brute force, dateline crossing, distance sort."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.index import IndexBuildConfig, build_index
from lucene_solr_ray.search import IndexSearcher
from lucene_solr_ray.search.geo import (
    GeoBox,
    GeoDistance,
    bounding_box,
    haversine_km,
)

N = 3000


@pytest.fixture(scope="module")
def geo_index(tmp_path_factory):
    root = tmp_path_factory.mktemp("geo")
    rng = np.random.default_rng(11)
    lat = rng.uniform(-90, 90, N)
    lon = rng.uniform(-180, 180, N)
    corpus = pa.table({
        "doc_id": pa.array(np.arange(N, dtype=np.int64)),
        "text": pa.array([f"place {i}" for i in range(N)]),
        "lat": pa.array(lat, pa.float64()),
        "lon": pa.array(lon, pa.float64()),
    })
    cpath = str(root / "corpus.parquet")
    pq.write_table(corpus, cpath)
    idx = str(root / "idx")
    cfg = IndexBuildConfig(num_shards=2, num_buckets=4, batch_size=1024,
                           points_fields=("lat", "lon"))
    build_index(cpath, idx, cfg=cfg)
    return idx, lat, lon


def test_haversine_known_pair():
    # Paris -> London, great-circle ~343.5 km on the mean-radius sphere
    d = float(haversine_km(48.8566, 2.3522, np.array([51.5074]),
                           np.array([-0.1278]))[0])
    assert abs(d - 343.5) < 1.5


def test_box_query_parity(geo_index):
    idx, lat, lon = geo_index
    s = IndexSearcher(idx)
    node = GeoBox("lat", "lon", 10.0, 40.0, -20.0, 30.0)
    got = np.sort(s.match_all(node)["doc_id"].to_numpy(zero_copy_only=False))
    want = np.flatnonzero((lat >= 10) & (lat <= 40) & (lon >= -20) & (lon <= 30))
    assert np.array_equal(got, want)


def test_box_query_dateline(geo_index):
    idx, lat, lon = geo_index
    s = IndexSearcher(idx)
    node = GeoBox("lat", "lon", -30.0, 30.0, 170.0, -170.0)  # crosses 180
    got = np.sort(s.match_all(node)["doc_id"].to_numpy(zero_copy_only=False))
    want = np.flatnonzero((lat >= -30) & (lat <= 30)
                          & ((lon >= 170) | (lon <= -170)))
    assert np.array_equal(got, want)


def test_distance_query_parity(geo_index):
    idx, lat, lon = geo_index
    s = IndexSearcher(idx)
    for qlat, qlon, r in [(48.85, 2.35, 2000.0), (0.0, 0.0, 5000.0),
                          (85.0, 10.0, 1500.0)]:  # last: polar box degeneracy
        node = GeoDistance("lat", "lon", qlat, qlon, r)
        got = np.sort(s.match_all(node)["doc_id"].to_numpy(zero_copy_only=False))
        want = np.flatnonzero(haversine_km(qlat, qlon, lat, lon) <= r)
        assert np.array_equal(got, want), (qlat, qlon, r)


def test_bounding_box_encloses_radius():
    rng = np.random.default_rng(3)
    for _ in range(20):
        qlat = float(rng.uniform(-80, 80))
        qlon = float(rng.uniform(-180, 180))
        r = float(rng.uniform(50, 3000))
        mnla, mxla, mnlo, mxlo = bounding_box(qlat, qlon, r)
        # sample points ON the radius circle; every one must fall in the box
        bear = np.linspace(0, 2 * np.pi, 64)
        dlat = np.degrees(r / 6371.0088) * np.cos(bear)
        pl = qlat + dlat
        dlon = np.degrees(r / 6371.0088) * np.sin(bear) / np.maximum(
            1e-9, np.cos(np.radians(np.clip(pl, -89.9, 89.9))))
        po = qlon + dlon
        ok_lat = (pl >= mnla - 1e-6) & (pl <= mxla + 1e-6)
        po_n = (po + 180.0) % 360.0 - 180.0
        if mnlo <= mxlo:
            ok_lon = (po_n >= mnlo - 1e-6) & (po_n <= mxlo + 1e-6)
        else:
            ok_lon = (po_n >= mnlo - 1e-6) | (po_n <= mxlo + 1e-6)
        inside = np.abs(pl) <= 90.0
        assert np.all((ok_lat & ok_lon)[inside])


def test_geo_nearest(geo_index):
    from lucene_solr_ray.search.services import geo_nearest

    idx, lat, lon = geo_index
    s = IndexSearcher(idx)
    res = geo_nearest(s, 48.85, 2.35, k=10)
    d = haversine_km(48.85, 2.35, lat, lon)
    want = np.lexsort((np.arange(N), d))[:10]
    assert res["doc_id"].to_pylist() == want.tolist()
    assert res["rank"].to_pylist() == list(range(1, 11))
    got_d = np.asarray(res["distance_km"].to_pylist())
    assert np.allclose(got_d, d[want])
    assert np.all(np.diff(got_d) >= 0)


def test_polygon_square_matches_box(geo_index):
    from lucene_solr_ray.search.geo import GeoPolygon

    idx, lat, lon = geo_index
    s = IndexSearcher(idx)
    # an axis-aligned square polygon must equal the box filter (interior;
    # vertices off the sample grid so no point sits on an edge)
    la0, la1, lo0, lo1 = 10.0, 40.0, -20.0, 30.0
    poly = GeoPolygon("lat", "lon",
                      (la0, la0, la1, la1), (lo0, lo1, lo1, lo0))
    got = np.sort(s.match_all(poly)["doc_id"].to_numpy(zero_copy_only=False))
    want = np.flatnonzero((lat > la0) & (lat < la1) & (lon > lo0) & (lon < lo1))
    assert np.array_equal(got, want)


def test_polygon_concave_parity_brute_force(geo_index):
    from lucene_solr_ray.search.geo import GeoPolygon, point_in_polygon

    idx, lat, lon = geo_index
    s = IndexSearcher(idx)
    # concave "arrow" polygon
    vlats = (0.0, 30.0, 60.0, 30.0)
    vlons = (-40.0, 50.0, -40.0, -10.0)
    poly = GeoPolygon("lat", "lon", vlats, vlons)
    got = np.sort(s.match_all(poly)["doc_id"].to_numpy(zero_copy_only=False))
    want = np.flatnonzero(point_in_polygon(lat, lon, vlats, vlons))
    assert np.array_equal(got, want)
    assert 0 < len(got) < N


def test_point_in_polygon_winding_independent():
    from lucene_solr_ray.search.geo import point_in_polygon

    rng = np.random.default_rng(3)
    py, px = rng.uniform(-5, 5, 500), rng.uniform(-5, 5, 500)
    vlats, vlons = (0.0, 4.0, 4.0, 0.0), (0.0, 0.0, 4.0, 4.0)
    a = point_in_polygon(py, px, vlats, vlons)
    b = point_in_polygon(py, px, vlats[::-1], vlons[::-1])
    assert np.array_equal(a, b)
    assert np.array_equal(a, (py > 0) & (py < 4) & (px > 0) & (px < 4))


def test_geo_heatmap(geo_index):
    from lucene_solr_ray.search.geo import geo_heatmap

    d, lats, lons = geo_index
    s = IndexSearcher(d, dtype=np.float64)
    rows = cols = 4
    t = geo_heatmap(s, None, "lat", "lon", -90.0, 90.0, -180.0, 180.0,
                    rows=rows, cols=cols)
    got = {(r, c): n for r, c, n in zip(t["row"].to_pylist(),
                                        t["col"].to_pylist(),
                                        t["cnt"].to_pylist())}
    exp: dict = {}
    for la, lo in zip(lats, lons):
        r = min(int((la + 90.0) / (180.0 / rows)), rows - 1)
        c = min(int((lo + 180.0) / (360.0 / cols)), cols - 1)
        exp[(r, c)] = exp.get((r, c), 0) + 1
    assert got == exp
    assert sum(got.values()) == len(lats)
