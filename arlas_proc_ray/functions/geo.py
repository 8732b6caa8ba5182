"""Geo scalar kernels (SURVEY.md §2.3) — vectorized numpy over Arrow arrays.

The reference implements these as per-row JTS/GeoTools UDFs
(/root/reference/src/main/scala/io/arlas/data/utils/GeoTool.scala); notably
its GeodeticCalculator is not thread-safe and is re-instantiated per call
(GeoTool.scala:40-41). Here every kernel is a pure numpy array function —
no per-row objects, safe everywhere.

Distances/bearings use the great-circle (haversine / spherical) model with
the WGS84 mean radius; the reference uses geodetic (ellipsoidal) math, so
values differ at the <0.5% level — documented, deterministic, and
self-consistent across this engine and its tests.
"""

from __future__ import annotations

import numpy as np

EARTH_RADIUS_M = 6_371_008.8  # WGS84 mean radius

_BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def haversine_m(lat1, lon1, lat2, lon2) -> np.ndarray:
    """Great-circle distance in meters (vectorized).

    Analogue of getDistanceBetween (GeoTool.scala:93-98).
    """
    lat1, lon1, lat2, lon2 = (np.radians(np.asarray(x, np.float64)) for x in (lat1, lon1, lat2, lon2))
    dlat = lat2 - lat1
    dlon = lon2 - lon1
    a = np.sin(dlat / 2) ** 2 + np.cos(lat1) * np.cos(lat2) * np.sin(dlon / 2) ** 2
    return 2 * EARTH_RADIUS_M * np.arcsin(np.sqrt(np.clip(a, 0, 1)))


def bearing_deg(lat1, lon1, lat2, lon2) -> np.ndarray:
    """Initial great-circle bearing, normalized to [0, 360).

    Analogue of getBearingBetween (GeoTool.scala:66-74).
    """
    lat1, lon1, lat2, lon2 = (np.radians(np.asarray(x, np.float64)) for x in (lat1, lon1, lat2, lon2))
    dlon = lon2 - lon1
    y = np.sin(dlon) * np.cos(lat2)
    x = np.cos(lat1) * np.sin(lat2) - np.sin(lat1) * np.cos(lat2) * np.cos(dlon)
    return (np.degrees(np.arctan2(y, x)) + 360.0) % 360.0


def geohash(lat, lon, precision: int = 12) -> list[str]:
    """Base-32 geohash per point, fully vectorized bit interleaving.

    Analogue of getGeohashFrom (GeoTool.scala:136-163, a spatial4j port).
    """
    lat = np.asarray(lat, np.float64)
    lon = np.asarray(lon, np.float64)
    nbits = precision * 5
    lon_bits = (nbits + 1) // 2
    lat_bits = nbits // 2
    lon_q = np.minimum(
        ((lon + 180.0) / 360.0 * (1 << lon_bits)).astype(np.uint64),
        (1 << lon_bits) - 1,
    )
    lat_q = np.minimum(
        ((lat + 90.0) / 180.0 * (1 << lat_bits)).astype(np.uint64),
        (1 << lat_bits) - 1,
    )
    # interleave: even global bit positions (0,2,…) are longitude
    inter = np.zeros(len(np.atleast_1d(lon_q)), dtype=np.uint64)
    lon_q = np.atleast_1d(lon_q)
    lat_q = np.atleast_1d(lat_q)
    for i in range(lon_bits):
        bit = (lon_q >> np.uint64(lon_bits - 1 - i)) & np.uint64(1)
        inter |= bit << np.uint64(nbits - 1 - 2 * i)
    for i in range(lat_bits):
        bit = (lat_q >> np.uint64(lat_bits - 1 - i)) & np.uint64(1)
        inter |= bit << np.uint64(nbits - 2 - 2 * i)
    out = []
    for v in inter.tolist():
        chars = []
        for c in range(precision):
            shift = nbits - 5 * (c + 1)
            chars.append(_BASE32[(v >> shift) & 31])
        out.append("".join(chars))
    return out


def simplify_polyline(points: np.ndarray, tolerance: float) -> np.ndarray:
    """Douglas-Peucker polyline simplification (iterative, planar).

    Analogue of simplifyGeometry (GeoTool.scala:294-302) /
    WithGeometrySimplifier (tools/WithGeometrySimplifier.scala:28-42).
    ``points``: (n, 2) array; returns the kept subset in order.
    """
    pts = np.asarray(points, np.float64)
    n = len(pts)
    if n <= 2:
        return pts
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[-1] = True
    stack = [(0, n - 1)]
    while stack:
        s, e = stack.pop()
        if e - s < 2:
            continue
        seg = pts[e] - pts[s]
        seg_len = np.hypot(*seg)
        mid = pts[s + 1 : e]
        if seg_len == 0:
            d = np.hypot(*(mid - pts[s]).T)
        else:
            d = np.abs(np.cross(seg, mid - pts[s])) / seg_len
        imax = int(np.argmax(d))
        if d[imax] > tolerance:
            keep[s + 1 + imax] = True
            stack.append((s, s + 1 + imax))
            stack.append((s + 1 + imax, e))
    return pts[keep]


def split_antimeridian(lats: np.ndarray, lons: np.ndarray):
    """Split a polyline where it crosses ±180° longitude.

    Analogue of splitLinestringAntimeridian / fixAntimeridianCrossing
    (GeoTool.scala:313-397): segments whose longitudes jump more than 180°
    are cut at the antimeridian with a latitude interpolated at the
    crossing; returns a list of (lats, lons) segments.
    """
    lats = np.asarray(lats, np.float64)
    lons = np.asarray(lons, np.float64)
    if len(lats) < 2:
        return [(lats, lons)]
    segments = []
    cur_la, cur_lo = [lats[0]], [lons[0]]
    for i in range(1, len(lats)):
        lo_prev, lo = lons[i - 1], lons[i]
        if abs(lo - lo_prev) > 180.0:  # crosses the antimeridian
            # unwrap the shorter way and interpolate the crossing latitude
            lo_unwrapped = lo - 360.0 if lo > lo_prev else lo + 360.0
            edge = 180.0 if lo_prev > 0 else -180.0
            t = (edge - lo_prev) / (lo_unwrapped - lo_prev)
            la_cross = lats[i - 1] + t * (lats[i] - lats[i - 1])
            cur_la.append(la_cross)
            cur_lo.append(edge)
            segments.append((np.array(cur_la), np.array(cur_lo)))
            cur_la, cur_lo = [la_cross], [-edge]
        cur_la.append(lats[i])
        cur_lo.append(lons[i])
    segments.append((np.array(cur_la), np.array(cur_lo)))
    return segments


def stddev_ellipse(lat: float, lon: float, sigma_lat: float, sigma_lon: float,
                   n_points: int = 36) -> np.ndarray:
    """N-point standard-deviation ellipse around a centroid.

    Analogue of getStandardDeviationEllipsis (GeoTool.scala:75-91).
    Returns an (n_points+1, 2) closed ring of (lat, lon).
    """
    theta = np.linspace(0, 2 * np.pi, n_points, endpoint=False)
    ring_lat = lat + sigma_lat * np.sin(theta)
    ring_lon = lon + sigma_lon * np.cos(theta)
    ring = np.column_stack([ring_lat, ring_lon])
    return np.vstack([ring, ring[:1]])


def dedup_consecutive(points: np.ndarray) -> np.ndarray:
    """Drop consecutive duplicate coordinates.

    Analogue of removeConsecutiveDuplicatesCoords (GeoTool.scala:259-276).
    """
    pts = np.asarray(points, np.float64)
    if len(pts) < 2:
        return pts
    keep = np.ones(len(pts), dtype=bool)
    keep[1:] = np.any(pts[1:] != pts[:-1], axis=1)
    return pts[keep]


def wkt_linestring(lats, lons) -> str:
    """Points → WKT LINESTRING (POINT when a single coordinate).

    Analogue of getTrailBetween (GeoTool.scala:54-57): the reference emits
    stringly-typed WKT geometry; so do we (lon lat order, WKT convention).
    """
    lats = np.atleast_1d(np.asarray(lats, np.float64))
    lons = np.atleast_1d(np.asarray(lons, np.float64))
    uniq = dedup_consecutive(np.column_stack([lats, lons]))
    if len(uniq) == 1:
        return f"POINT ({uniq[0][1]} {uniq[0][0]})"
    body = ", ".join(f"{lo} {la}" for la, lo in uniq)
    return f"LINESTRING ({body})"


def parse_wkt_linestring(wkt: str) -> np.ndarray:
    """WKT LINESTRING/POINT → (n, 2) array of (lat, lon).

    Analogue of wktToGeometry (GeoTool.scala:108-117).
    """
    inner = wkt[wkt.index("(") + 1 : wkt.rindex(")")]
    pts = []
    for pair in inner.split(","):
        lo, la = pair.split()
        pts.append((float(la), float(lo)))
    return np.asarray(pts, np.float64)


def trail_geohashes(wkt: str | None, precision: int = 6) -> list[str] | None:
    """Distinct geohash cells of every point of a WKT trail.

    Named analogue of the WithGeohash transformer
    (features/WithGeohash.scala:35-48): parse the trail, geohash each
    coordinate, deduplicate. The reference's Scala ``.toSet.toArray``
    iterates in hash order; here distinct cells keep FIRST-APPEARANCE
    order (deterministic and stable — documented divergence, the set
    CONTENT is identical).
    """
    if not wkt:
        return None
    pts = parse_wkt_linestring(wkt)
    cells = geohash(pts[:, 0], pts[:, 1], precision)
    return list(dict.fromkeys(cells))


def with_geohash(ds, *, trail_col: str, target: str = "geohashes",
                 precision: int = 6):
    """Dataset stage: append the distinct-geohash array column."""
    import pandas as pd

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf[target] = [trail_geohashes(t, precision) for t in pdf[trail_col]]
        return pdf

    return ds.map_batches(fn, batch_format="pandas", batch_size=None)


LOCATION_DIGITS = 6  # meter precision (GeoTool.scala:34)


def straight_line_distance_from_trails(trails) -> float | None:
    """Great-circle distance between the FIRST coordinate of the first
    non-null trail and the LAST coordinate of the last one.

    Analogue of getStraightLineDistanceFromTrails (GeoTool.scala:100-106):
    null trails dropped; fewer than two coordinates → 0.0.
    """
    coords = []
    for t in trails:
        if t:
            coords.append(parse_wkt_linestring(t))
    if not coords:
        return 0.0
    pts = np.concatenate(coords)
    if len(pts) <= 1:
        return 0.0
    (la1, lo1), (la2, lo2) = pts[0], pts[-1]
    return float(haversine_m(la1, lo1, la2, lo2))


def linestrings_to_multilinestring(trails) -> str | None:
    """WKT LINESTRINGs → one WKT MULTILINESTRING (None for empty input).

    Analogue of lineStringsToSingleMultiLineString (GeoTool.scala:185-194).
    """
    if not len(trails):
        return None
    parts = []
    for t in trails:
        pts = parse_wkt_linestring(t)
        body = ", ".join(f"{lo} {la}" for la, lo in pts)
        parts.append(f"({body})")
    return f"MULTILINESTRING ({', '.join(parts)})"


def trail_data_from_trails_and_coords(trails, lats, lons, use_trail):
    """Stitch per-fragment trails and pause points into one trail.

    Analogue of getTrailDataFromTrailsAndCoords (GeoTool.scala:196-239):
    fragments with ``use_trail`` contribute their full trail coordinates,
    paused fragments collapse to their single (lat, lon) point; consecutive
    duplicates removed; a single surviving point becomes a POINT. Returns
    ``{"trail", "departure_lat", "departure_lon", "arrival_lat",
    "arrival_lon"}`` (endpoints scaled to LOCATION_DIGITS) or None on
    length mismatch.
    """
    n = len(use_trail)
    if not (len(trails) == len(lats) == len(lons) == n):
        return None
    pieces = []
    for i in range(n):
        if use_trail[i]:
            pieces.append(parse_wkt_linestring(trails[i]))
        else:
            pieces.append(np.array([[lats[i], lons[i]]], np.float64))
    pts = dedup_consecutive(np.concatenate(pieces))
    if len(pts) == 1:
        trail = f"POINT ({pts[0][1]} {pts[0][0]})"
    else:
        body = ", ".join(f"{lo} {la}" for la, lo in pts)
        trail = f"LINESTRING ({body})"
    dep, arr = pts[0], pts[-1]
    r = lambda x: round(float(x), LOCATION_DIGITS)  # noqa: E731
    return {
        "trail": trail,
        "departure_lat": r(dep[0]),
        "departure_lon": r(dep[1]),
        "arrival_lat": r(arr[0]),
        "arrival_lon": r(arr[1]),
    }
