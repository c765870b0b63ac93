"""Shape-vs-shape spatial relations — the LatLonShape role
(core/src/java/org/apache/lucene/document/LatLonShape.java:63 newGeometryQuery
with QueryRelation INTERSECTS / WITHIN / CONTAINS / DISJOINT,
LatLonShapeQuery + ShapeQuery relate semantics).

Data model (the Ray-native substitute for the BKD triangle tree): each doc
carries its polygon as a flat ``list<double>`` column [lat0, lon0, lat1,
lon1, ...] (simple ring, no holes — the documented subset; the reference
triangulates arbitrary polygons, we relate the outer ring). The per-batch
kernel prunes by bounding box FIRST (numpy over the whole batch — the
BKD's cheap reject) and runs the exact edge/containment relate only on
bbox-overlapping candidates.

Planar lat/lon math, like the reference's encoded-integer plane (no
great-circle edges); boundary touching counts as INTERSECTS, matching
Component2D.relate semantics.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset

INTERSECTS = "INTERSECTS"
WITHIN = "WITHIN"
CONTAINS = "CONTAINS"
DISJOINT = "DISJOINT"


def _point_in_ring(py: np.ndarray, px: np.ndarray,
                   vy: np.ndarray, vx: np.ndarray) -> np.ndarray:
    """Ray-cast point-in-polygon for arrays of points (y=lat, x=lon)."""
    inside = np.zeros(len(py), dtype=bool)
    j = len(vy) - 1
    for i in range(len(vy)):
        cond = ((vy[i] > py) != (vy[j] > py))
        with np.errstate(divide="ignore", invalid="ignore"):
            xcross = (vx[j] - vx[i]) * (py - vy[i]) / (vy[j] - vy[i]) + vx[i]
        inside ^= cond & (px < xcross)
        j = i
    return inside


def _segments_cross(ay, ax, by, bx, qy, qx, ry, rx) -> bool:
    """True when segment (a,b) and segment (q,r) intersect (touch counts)."""
    def orient(oy, ox, py, px, sy, sx):
        return (px - ox) * (sy - oy) - (py - oy) * (sx - ox)

    d1 = orient(qy, qx, ry, rx, ay, ax)
    d2 = orient(qy, qx, ry, rx, by, bx)
    d3 = orient(ay, ax, by, bx, qy, qx)
    d4 = orient(ay, ax, by, bx, ry, rx)
    if (((d1 > 0 and d2 < 0) or (d1 < 0 and d2 > 0))
            and ((d3 > 0 and d4 < 0) or (d3 < 0 and d4 > 0))):
        return True  # proper crossing
    # collinear endpoint-on-segment touches
    if d1 == 0 and _on_seg(qy, qx, ry, rx, ay, ax):
        return True
    if d2 == 0 and _on_seg(qy, qx, ry, rx, by, bx):
        return True
    if d3 == 0 and _on_seg(ay, ax, by, bx, qy, qx):
        return True
    if d4 == 0 and _on_seg(ay, ax, by, bx, ry, rx):
        return True
    return False


def _on_seg(ay, ax, by, bx, py, px) -> bool:
    return (min(ay, by) <= py <= max(ay, by)
            and min(ax, bx) <= px <= max(ax, bx))


def polygon_relate(a_lat: np.ndarray, a_lon: np.ndarray,
                   q_lat: np.ndarray, q_lon: np.ndarray) -> str:
    """Relation of doc ring A to query ring Q: WITHIN (A inside Q),
    CONTAINS (A contains Q), INTERSECTS (boundaries cross / touch), or
    DISJOINT. Mirrors Component2D's classification: WITHIN/CONTAINS imply
    a non-crossing boundary; any boundary crossing is INTERSECTS."""
    na, nq = len(a_lat), len(q_lat)
    for i in range(na):
        a1y, a1x = a_lat[i], a_lon[i]
        a2y, a2x = a_lat[(i + 1) % na], a_lon[(i + 1) % na]
        for j in range(nq):
            if _segments_cross(a1y, a1x, a2y, a2x,
                               q_lat[j], q_lon[j],
                               q_lat[(j + 1) % nq], q_lon[(j + 1) % nq]):
                return INTERSECTS
    if _point_in_ring(a_lat[:1], a_lon[:1], q_lat, q_lon)[0]:
        return WITHIN
    if _point_in_ring(q_lat[:1], q_lon[:1], a_lat, a_lon)[0]:
        return CONTAINS
    return DISJOINT


def shape_relate(ds: Dataset, id_col: str, shape_col: str,
                 query_poly, relation: str = INTERSECTS) -> Dataset:
    """Docs whose shape stands in `relation` to the query polygon.

    query_poly: [(lat, lon), ...] ring. relation: INTERSECTS (anything
    non-disjoint — WITHIN and CONTAINS both match, as in the reference's
    QueryRelation.INTERSECTS), WITHIN, CONTAINS, or DISJOINT.

    Batch kernel: numpy bbox test over all rows first; the exact relate
    runs only on bbox-overlapping shapes. DISJOINT = bbox-rejected rows
    plus exact-disjoint survivors (the reference's DISJOINT also needs the
    full visit)."""
    qp = np.asarray(query_poly, np.float64)
    q_lat, q_lon = qp[:, 0], qp[:, 1]
    q_minlat, q_maxlat = q_lat.min(), q_lat.max()
    q_minlon, q_maxlon = q_lon.min(), q_lon.max()
    if relation not in (INTERSECTS, WITHIN, CONTAINS, DISJOINT):
        raise ValueError(f"unknown relation {relation!r}")

    def kernel(t: pa.Table) -> pa.Table:
        lst = t[shape_col].combine_chunks()
        flat = np.asarray(lst.values.to_numpy(zero_copy_only=False),
                          np.float64)
        offs = np.asarray(lst.offsets.to_numpy(zero_copy_only=False),
                          np.int64)
        n = len(t)
        keep = np.zeros(n, dtype=bool)
        # vectorized bbox reject: per-row min/max via reduceat
        if len(flat):
            lats = flat[0::2]
            lons = flat[1::2]
            lo = offs[:-1] // 2
            counts = (offs[1:] - offs[:-1]) // 2
            valid = counts > 0
            idx = lo[valid]
            minlat = np.minimum.reduceat(lats, idx)
            maxlat = np.maximum.reduceat(lats, idx)
            minlon = np.minimum.reduceat(lons, idx)
            maxlon = np.maximum.reduceat(lons, idx)
            overlap = ~((maxlat < q_minlat) | (minlat > q_maxlat)
                        | (maxlon < q_minlon) | (minlon > q_maxlon))
            cand = np.flatnonzero(valid)[overlap]
            for row in cand:
                s = flat[offs[row]:offs[row + 1]]
                rel = polygon_relate(s[0::2], s[1::2], q_lat, q_lon)
                if relation == INTERSECTS:
                    keep[row] = rel != DISJOINT
                elif relation == DISJOINT:
                    keep[row] = rel == DISJOINT
                else:
                    keep[row] = rel == relation
            if relation == DISJOINT:
                # bbox-rejected shapes are disjoint by definition
                keep[np.flatnonzero(valid)[~overlap]] = True
        return t.select([id_col]).filter(pa.array(keep))

    return ds.map_batches(kernel, batch_format="pyarrow")


def shape_relations(ds: Dataset, id_col: str, shape_col: str,
                    query_poly) -> Dataset:
    """(id, relation) for EVERY doc — the classification form of
    shape_relate (one pass, all four QueryRelation classes). Bbox-
    rejected shapes classify as DISJOINT without the exact relate."""
    qp = np.asarray(query_poly, np.float64)
    q_lat, q_lon = qp[:, 0], qp[:, 1]
    q_minlat, q_maxlat = q_lat.min(), q_lat.max()
    q_minlon, q_maxlon = q_lon.min(), q_lon.max()

    def kernel(t: pa.Table) -> pa.Table:
        lst = t[shape_col].combine_chunks()
        flat = np.asarray(lst.values.to_numpy(zero_copy_only=False),
                          np.float64)
        offs = np.asarray(lst.offsets.to_numpy(zero_copy_only=False),
                          np.int64)
        n = len(t)
        rel = np.full(n, DISJOINT, dtype=object)
        if len(flat):
            lats, lons = flat[0::2], flat[1::2]
            lo = offs[:-1] // 2
            counts = (offs[1:] - offs[:-1]) // 2
            valid = counts > 0
            idx = lo[valid]
            minlat = np.minimum.reduceat(lats, idx)
            maxlat = np.maximum.reduceat(lats, idx)
            minlon = np.minimum.reduceat(lons, idx)
            maxlon = np.maximum.reduceat(lons, idx)
            overlap = ~((maxlat < q_minlat) | (minlat > q_maxlat)
                        | (maxlon < q_minlon) | (minlon > q_maxlon))
            for row in np.flatnonzero(valid)[overlap]:
                sh = flat[offs[row]:offs[row + 1]]
                rel[row] = polygon_relate(sh[0::2], sh[1::2], q_lat, q_lon)
        return pa.table({id_col: t[id_col],
                         "relation": pa.array(rel.tolist(), pa.string())})

    return ds.map_batches(kernel, batch_format="pyarrow")
