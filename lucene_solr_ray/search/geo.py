"""Spatial queries: the LatLonPoint family re-expressed over the points
index (document/LatLonPoint.java: newBoxQuery, newDistanceQuery;
document/LatLonDocValuesField.java: newDistanceSort).

Layout: latitude and longitude are two numeric fields indexed as points
(index/points.py) and docvalues. The reference packs (lat, lon) into one
2-D BKD tree; the substitution runs two 1-D leaf-pruned range reads and
intersects the sorted doc-id arrays — the same I/O discipline (only leaves
overlapping the box are read), with the intersection vectorized.

* box query — lat in [min_lat, max_lat] AND lon in [min_lon, max_lon],
  pure comparisons, no trig. Dateline-crossing boxes (min_lon > max_lon)
  split into two boxes and union (LatLonPoint.newBoxQuery does the same).
* distance query — the reference's two-phase shape: a bounding-box
  pre-filter from the radius (cheap, leaf-pruned) then the exact haversine
  verify on the candidates only (LatLonPointDistanceQuery's
  approximation-then-verify).
* distance sort — haversine over the matched docs' docvalues, ascending
  (LatLonDocValuesField.newDistanceSort role).

Poles: boxes clamp to [-90, 90]; a radius reaching a pole widens the
longitude band to the full circle (the standard bounding-box degeneracy).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

EARTH_RADIUS_KM = 6371.0088  # mean earth radius (GeoUtils.EARTH_MEAN_RADIUS)


@dataclass(frozen=True)
class GeoBox:
    """LatLonPoint.newBoxQuery: constant-score box filter."""
    lat_field: str
    lon_field: str
    min_lat: float
    max_lat: float
    min_lon: float
    max_lon: float
    boost: float = 1.0


@dataclass(frozen=True)
class GeoDistance:
    """LatLonPoint.newDistanceQuery: docs within radius_km of (lat, lon)."""
    lat_field: str
    lon_field: str
    lat: float
    lon: float
    radius_km: float
    boost: float = 1.0


@dataclass(frozen=True)
class GeoPolygon:
    """LatLonPoint.newPolygonQuery role (document/LatLonPoint.java,
    geo/Polygon.java): docs whose point lies inside the polygon. Vertices
    are in ring order (closed implicitly); like the reference, a polygon
    must not cross the dateline — split it and OR the parts."""
    lat_field: str
    lon_field: str
    lats: tuple  # vertex latitudes, ring order
    lons: tuple  # vertex longitudes
    boost: float = 1.0


def point_in_polygon(py: np.ndarray, px: np.ndarray, vlats, vlons) -> np.ndarray:
    """Vectorized crossing-number (even-odd) point-in-polygon over
    (lat=py, lon=px) arrays. The per-edge arithmetic is kept in the exact
    form `px < (xj-xi)*(py-yi)/(yj-yi)+xi` so a SQL oracle spelling the
    same expression is float-identical (geo/GeoUtils ray-crossing form)."""
    py = np.asarray(py, np.float64)
    px = np.asarray(px, np.float64)
    inside = np.zeros(py.shape, dtype=bool)
    n = len(vlats)
    for i in range(n):
        j = (i - 1) % n
        yi, yj = float(vlats[i]), float(vlats[j])
        xi, xj = float(vlons[i]), float(vlons[j])
        gate = (yi > py) != (yj > py)
        if yi == yj:
            continue  # horizontal edge never satisfies the gate
        cross = px < (xj - xi) * (py - yi) / (yj - yi) + xi
        inside ^= gate & cross
    return inside


def polygon_docs(shard, node: GeoPolygon) -> np.ndarray:
    """Sorted live doc ids inside the polygon: bounding-box prefilter over
    the points index (the reference's BKD relate on the polygon's bbox),
    exact crossing-number verify on the candidates only."""
    cand = box_docs(shard, GeoBox(node.lat_field, node.lon_field,
                                  min(node.lats), max(node.lats),
                                  min(node.lons), max(node.lons)))
    if not len(cand):
        return cand
    idx = np.searchsorted(shard.doc_ids, cand)
    lats = shard.docvalues[node.lat_field][idx]
    lons = shard.docvalues[node.lon_field][idx]
    return cand[point_in_polygon(lats, lons, node.lats, node.lons)]


def haversine_km(lat1, lon1, lat2, lon2) -> np.ndarray:
    """Vectorized great-circle distance (km). The operand order is fixed so
    the float64 result is bit-reproducible against the SQL oracle form."""
    lat1, lon1 = np.radians(lat1), np.radians(lon1)
    lat2, lon2 = np.radians(np.asarray(lat2, np.float64)), np.radians(
        np.asarray(lon2, np.float64))
    a = (np.sin((lat2 - lat1) / 2.0) ** 2
         + np.cos(lat1) * np.cos(lat2) * np.sin((lon2 - lon1) / 2.0) ** 2)
    return 2.0 * EARTH_RADIUS_KM * np.arcsin(np.sqrt(a))


def _range_docs(shard, field: str, lo: float, hi: float) -> np.ndarray:
    """Leaf-pruned when the field has points; docvalues scan otherwise."""
    if shard.has_points(field):
        return shard.point_range(field, lo, hi)
    vals = shard.docvalues[field]
    m = (vals >= lo) & (vals <= hi)
    if shard._live_mask is not None:
        m &= shard._live_mask
    return shard.doc_ids[m]


def box_docs(shard, node: GeoBox) -> np.ndarray:
    """Sorted live doc ids inside the box (dateline split handled)."""
    lat_docs = _range_docs(shard, node.lat_field,
                           max(-90.0, node.min_lat), min(90.0, node.max_lat))
    if node.min_lon <= node.max_lon:
        lon_docs = _range_docs(shard, node.lon_field, node.min_lon, node.max_lon)
    else:  # dateline crossing: [min_lon, 180] U [-180, max_lon]
        lon_docs = np.union1d(
            _range_docs(shard, node.lon_field, node.min_lon, 180.0),
            _range_docs(shard, node.lon_field, -180.0, node.max_lon),
        )
    return np.intersect1d(lat_docs, lon_docs, assume_unique=True)


def bounding_box(lat: float, lon: float, radius_km: float):
    """(min_lat, max_lat, min_lon, max_lon) enclosing the radius; the lon
    band widens by 1/cos(lat) and degenerates to the full circle near a
    pole (GeoUtils' bounding-box derivation)."""
    dlat = np.degrees(radius_km / EARTH_RADIUS_KM)
    min_lat, max_lat = lat - dlat, lat + dlat
    if min_lat <= -90.0 or max_lat >= 90.0:
        return max(-90.0, min_lat), min(90.0, max_lat), -180.0, 180.0
    cos_lat = np.cos(np.radians(max(abs(min_lat), abs(max_lat))))
    dlon = np.degrees(radius_km / (EARTH_RADIUS_KM * max(1e-12, cos_lat)))
    if dlon >= 180.0:
        return min_lat, max_lat, -180.0, 180.0
    min_lon, max_lon = lon - dlon, lon + dlon
    if min_lon < -180.0:
        min_lon += 360.0  # wraps -> dateline-crossing box
    if max_lon > 180.0:
        max_lon -= 360.0
    return min_lat, max_lat, min_lon, max_lon


def distance_docs(shard, node: GeoDistance):
    """(sorted live doc ids within radius, their distances in km): box
    pre-filter (leaf-pruned) then exact haversine verify — the reference's
    two-phase distance query."""
    mnla, mxla, mnlo, mxlo = bounding_box(node.lat, node.lon, node.radius_km)
    cand = box_docs(shard, GeoBox(node.lat_field, node.lon_field,
                                  mnla, mxla, mnlo, mxlo))
    if not len(cand):
        return cand, np.zeros(0, np.float64)
    idx = np.searchsorted(shard.doc_ids, cand)
    lats = shard.docvalues[node.lat_field][idx]
    lons = shard.docvalues[node.lon_field][idx]
    d = haversine_km(node.lat, node.lon, lats, lons)
    keep = d <= node.radius_km
    return cand[keep], d[keep]


def distances_for(shard, doc_ids: np.ndarray, lat_field: str, lon_field: str,
                  lat: float, lon: float) -> np.ndarray:
    """Haversine distances for already-matched docs (distance-sort source)."""
    idx = np.searchsorted(shard.doc_ids, doc_ids)
    return haversine_km(lat, lon, shard.docvalues[lat_field][idx],
                        shard.docvalues[lon_field][idx])


def geo_heatmap(searcher, query, lat_field: str, lon_field: str,
                min_lat: float, max_lat: float,
                min_lon: float, max_lon: float,
                rows: int = 8, cols: int = 8):
    """facet.heatmap (solr/core/.../search/facet/FacetHeatmap.java:65):
    2-D grid counts of the matching docs inside a bounding box — the
    PNG/ints-2D heatmap payload's counts, computed over the lat/lon
    NUMERIC docvalues. Per shard, matched docs' coordinates bucket into
    row = floor((lat-min)/cell_h), col = floor((lon-min)/cell_w)
    (top-edge values clamp into the last cell); shard partials sum.

    Returns (row, col, cnt) for the non-empty cells, ordered."""
    import numpy as np
    import pyarrow as pa

    from .executor import eval_node, resolve_weights
    from .query import MatchAll

    node = searcher._node(query) if query is not None else MatchAll()
    weights = resolve_weights(searcher.reader, node, searcher.params,
                              searcher.dtype)
    cell_h = (max_lat - min_lat) / rows
    cell_w = (max_lon - min_lon) / cols
    grid = np.zeros((rows, cols), dtype=np.int64)
    for s in searcher.reader.shards:
        docs, _ = eval_node(s, node, weights, searcher.dtype)
        if not len(docs):
            continue
        idx = np.searchsorted(s.doc_ids, docs)
        lat = s.docvalues[lat_field][idx]
        lon = s.docvalues[lon_field][idx]
        inside = ((lat >= min_lat) & (lat <= max_lat)
                  & (lon >= min_lon) & (lon <= max_lon))
        r = np.minimum(((lat[inside] - min_lat) / cell_h).astype(np.int64),
                       rows - 1)
        c = np.minimum(((lon[inside] - min_lon) / cell_w).astype(np.int64),
                       cols - 1)
        np.add.at(grid, (r, c), 1)
    rr, cc = np.nonzero(grid)
    return pa.table({
        "row": pa.array(rr.astype(np.int64), pa.int64()),
        "col": pa.array(cc.astype(np.int64), pa.int64()),
        "cnt": pa.array(grid[rr, cc], pa.int64()),
    })
