"""Shape-vs-shape relates (LatLonShape.java:63 newGeometryQuery role):
polygon relate classification + the Dataset-level bbox-pruned kernel,
cross-checked against closed-form diamond/box arithmetic."""

import numpy as np
import pyarrow as pa
import pytest

from lucene_solr_ray.search.shapes import (CONTAINS, DISJOINT, INTERSECTS,
                                           WITHIN, polygon_relate,
                                           shape_relate)


def ring(*pts):
    a = np.asarray(pts, np.float64)
    return a[:, 0], a[:, 1]


SQ = ring((0, 0), (0, 10), (10, 10), (10, 0))           # big square


def test_polygon_relate_classification():
    # small square fully inside
    a = ring((2, 2), (2, 4), (4, 4), (4, 2))
    assert polygon_relate(*a, *SQ) == WITHIN
    # huge square containing the query
    b = ring((-5, -5), (-5, 15), (15, 15), (15, -5))
    assert polygon_relate(*b, *SQ) == CONTAINS
    # overlapping
    c = ring((5, 5), (5, 15), (15, 15), (15, 5))
    assert polygon_relate(*c, *SQ) == INTERSECTS
    # far away
    d = ring((20, 20), (20, 25), (25, 25), (25, 20))
    assert polygon_relate(*d, *SQ) == DISJOINT
    # diamond poking through one edge
    e = ring((5, 9), (8, 12), (11, 9), (8, 6))
    assert polygon_relate(*e, *SQ) == INTERSECTS
    # boundary touch counts as INTERSECTS (Component2D semantics)
    f = ring((0, 10), (0, 20), (10, 20), (10, 10))
    assert polygon_relate(*f, *SQ) == INTERSECTS


def _diamond(cy, cx, r):
    return [cy + r, cx, cy, cx + r, cy - r, cx, cy, cx - r]


def _make_ds(rd, n=400, seed=3):
    rng = np.random.RandomState(seed)
    ids, shapes = [], []
    for i in range(n):
        cy = float(rng.uniform(-40, 40))
        cx = float(rng.uniform(-80, 80))
        r = float(rng.uniform(0.5, 8.0))
        ids.append(i)
        shapes.append(_diamond(cy, cx, r))
    t = pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "shape": pa.array(shapes, pa.list_(pa.float64())),
        "cy": pa.array([s[2] for s in shapes]),
        "cx": pa.array([s[1] for s in shapes]),
    })
    return t


@pytest.mark.parametrize("relation", [INTERSECTS, WITHIN, CONTAINS,
                                      DISJOINT])
def test_shape_relate_matches_closed_form(ray_session, relation):
    import ray.data as rd

    t = _make_ds(rd)
    # recover (cy, cx, r) from the diamond encoding for the closed form
    shp = [list(x) for x in t["shape"].to_pylist()]
    cy = np.array([s[2] for s in shp])
    cx = np.array([s[1] - (s[1] - s[5]) / 2 for s in shp])
    r = np.array([(s[0] - s[4]) / 2 for s in shp])
    y1, y2, x1, x2 = -10.05, 10.05, -20.05, 20.05
    query = [(y1, x1), (y1, x2), (y2, x2), (y2, x1)]

    # closed-form diamond-vs-box relations
    man = (np.maximum.reduce([y1 - cy, cy - y2, np.zeros(len(cy))])
           + np.maximum.reduce([x1 - cx, cx - x2, np.zeros(len(cx))]))
    inter = man <= r
    within = ((cy - r >= y1) & (cy + r <= y2)
              & (cx - r >= x1) & (cx + r <= x2))
    contains = (np.maximum(np.abs(y1 - cy), np.abs(y2 - cy))
                + np.maximum(np.abs(x1 - cx), np.abs(x2 - cx))) <= r
    expect = {
        INTERSECTS: inter,
        WITHIN: within,
        CONTAINS: contains,
        DISJOINT: ~inter,
    }[relation]

    ds = rd.from_arrow(t.select(["doc_id", "shape"]))
    rows = shape_relate(ds, "doc_id", "shape", query, relation).take_all()
    got = sorted(r["doc_id"] for r in rows)
    assert got == sorted(np.flatnonzero(expect).tolist())
