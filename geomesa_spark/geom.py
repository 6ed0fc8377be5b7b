"""Vectorized geometry kernels: WKT parse/write, point-in-polygon,
haversine distance, bbox utilities.

Pure NumPy — no shapely/JTS in this environment. These kernels are the
exact-refinement stage behind the ``st_*`` predicates (reference
semantics: geomesa-spark/geomesa-spark-jts/.../jts/udf/
SpatialRelationFunctions.scala — st_contains/st_intersects/st_dwithin —
evaluated there by JTS; here by ray-crossing and segment tests over
ragged coordinate arrays). Designed to be called from pandas UDFs on
Arrow batches, never per-row Python in the hot path: callers group by
polygon so each polygon parses once and tests all its candidate points
vectorized.
"""

from __future__ import annotations

import math
import re

import numpy as np

__all__ = [
    "parse_wkt",
    "to_wkt",
    "Geometry",
    "points_in_polygon",
    "points_in_rings",
    "haversine_m",
    "vincenty_m",
    "bbox_of",
    "EARTH_RADIUS_M",
    "geom_area",
    "geom_length",
    "geom_centroid",
    "convex_hull",
    "segments_intersect",
    "geoms_intersect",
    "geom_contains",
    "batch_predicate",
    "geom_covers",
    "points_on_boundary",
    "is_simple",
    "clip_polygons",
    "relate_matrix",
    "relate_match",
    "geohash_encode",
    "geohash_decode",
    "wkb_from_points",
    "point_buffer_wkt",
]

EARTH_RADIUS_M = 6371008.8  # mean Earth radius (IUGG)

_NUM = re.compile(r"[-+]?\d*\.?\d+(?:[eE][-+]?\d+)?")


class Geometry:
    """Parsed geometry: type tag + list of rings/paths as (n,2) arrays.

    - POINT:            coords = [(1,2) array]
    - MULTIPOINT:       coords = [(k,2) array]
    - LINESTRING:       coords = [(n,2) array]
    - MULTILINESTRING:  coords = [arrays]
    - POLYGON:          coords = [outer_ring, hole1, ...]
    - MULTIPOLYGON:     coords = flat ring list; ``ring_poly`` maps ring->poly
    """

    __slots__ = ("geom_type", "rings", "ring_poly", "parts")

    def __init__(self, geom_type: str, rings: list[np.ndarray], ring_poly=None, parts=None):
        self.geom_type = geom_type
        self.rings = rings
        self.ring_poly = ring_poly
        self.parts = parts  # GEOMETRYCOLLECTION children

    @property
    def bbox(self) -> tuple[float, float, float, float]:
        allc = np.concatenate(self.rings) if self.rings else np.zeros((0, 2))
        if len(allc) == 0:
            return (math.nan,) * 4
        return (
            float(allc[:, 0].min()),
            float(allc[:, 1].min()),
            float(allc[:, 0].max()),
            float(allc[:, 1].max()),
        )

    def __repr__(self):
        return f"Geometry({self.geom_type}, {len(self.rings)} rings)"


def _coords(text: str) -> np.ndarray:
    nums = [float(m) for m in _NUM.findall(text)]
    return np.asarray(nums, dtype=np.float64).reshape(-1, 2)


def _split_groups(body: str) -> list[str]:
    """Split a WKT body on top-level commas between paren groups."""
    groups, depth, start = [], 0, 0
    for i, ch in enumerate(body):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            groups.append(body[start:i])
            start = i + 1
    groups.append(body[start:])
    return groups


def parse_wkt(wkt: str) -> Geometry:
    """Parse WKT for POINT / MULTIPOINT / LINESTRING / MULTILINESTRING /
    POLYGON / MULTIPOLYGON (2-D)."""
    s = wkt.strip()
    i = s.index("(")
    tag = s[:i].strip().upper()
    body = s[i:].strip()
    inner = body[1:-1]

    if tag in ("POINT", "MULTIPOINT", "LINESTRING"):
        return Geometry(tag, [_coords(inner)])
    if tag == "MULTILINESTRING":
        return Geometry(tag, [_coords(g) for g in _split_groups(inner)])
    if tag == "POLYGON":
        return Geometry(tag, [_coords(g) for g in _split_groups(inner)])
    if tag == "MULTIPOLYGON":
        rings: list[np.ndarray] = []
        ring_poly: list[int] = []
        for pi, poly in enumerate(_split_groups(inner)):
            p = poly.strip()
            p = p[1:-1]  # strip the polygon's own parens
            for g in _split_groups(p):
                rings.append(_coords(g))
                ring_poly.append(pi)
        return Geometry(tag, rings, ring_poly)
    if tag == "GEOMETRYCOLLECTION":
        # parts are full WKT geometries split on top-level commas
        # (reference attribute type ObjectType GEOMETRY_COLLECTION);
        # rings aggregates all parts' rings so bbox/intersects reuse the
        # flat paths, ``parts`` keeps the typed children for accessors
        parts = [parse_wkt(g.strip()) for g in _split_groups(inner) if g.strip()]
        g = Geometry(tag, [r for p in parts for r in p.rings])
        g.parts = parts
        return g
    raise ValueError(f"unsupported WKT type: {tag}")


def to_wkt(geom: Geometry) -> str:
    def ring_str(r: np.ndarray) -> str:
        return "(" + ", ".join(f"{x:g} {y:g}" for x, y in r) + ")"

    t = geom.geom_type
    if t == "POINT":
        x, y = geom.rings[0][0]
        return f"POINT ({x:g} {y:g})"
    if t in ("LINESTRING", "MULTIPOINT"):
        return f"{t} " + ring_str(geom.rings[0])
    if t in ("POLYGON", "MULTILINESTRING"):
        return f"{t} (" + ", ".join(ring_str(r) for r in geom.rings) + ")"
    if t == "MULTIPOLYGON":
        polys: dict[int, list[str]] = {}
        for r, pi in zip(geom.rings, geom.ring_poly):
            polys.setdefault(pi, []).append(ring_str(r))
        return "MULTIPOLYGON (" + ", ".join(
            "(" + ", ".join(rs) + ")" for _, rs in sorted(polys.items())
        ) + ")"
    if t == "GEOMETRYCOLLECTION":
        return "GEOMETRYCOLLECTION (" + ", ".join(to_wkt(p) for p in (geom.parts or [])) + ")"
    raise ValueError(t)


def points_in_rings(px: np.ndarray, py: np.ndarray, rings: list[np.ndarray]) -> np.ndarray:
    """Even-odd (ray-crossing) point-in-polygon over a ring set.

    Holes are handled by parity: a point inside the outer ring and inside
    a hole ring crosses an even number of edges total. Vectorized over
    points; loops over edges (polygon vertex counts are small).
    Boundary semantics follow the half-open crossing rule (deterministic;
    exact on-edge points may fall either side — test fixtures avoid
    placing points exactly on edges, as the reference suites do).
    """
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    inside = np.zeros(px.shape, dtype=bool)
    for ring in rings:
        r = ring
        if len(r) < 3:
            continue
        if r[0, 0] != r[-1, 0] or r[0, 1] != r[-1, 1]:
            r = np.vstack([r, r[:1]])
        x0, y0 = r[:-1, 0], r[:-1, 1]
        x1, y1 = r[1:, 0], r[1:, 1]
        for j in range(len(x0)):
            a_y, b_y = y0[j], y1[j]
            a_x, b_x = x0[j], x1[j]
            if a_y == b_y:
                continue
            cond = (a_y <= py) != (b_y <= py)
            if not cond.any():
                continue
            t = (py - a_y) / (b_y - a_y)
            xi = a_x + t * (b_x - a_x)
            inside ^= cond & (px < xi)
    return inside


def points_in_polygon(px, py, geom: Geometry) -> np.ndarray:
    """Point-in-polygon for POLYGON / MULTIPOLYGON with bbox fast path."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    xmin, ymin, xmax, ymax = geom.bbox
    in_box = (px >= xmin) & (px <= xmax) & (py >= ymin) & (py <= ymax)
    out = np.zeros(px.shape, dtype=bool)
    if not in_box.any():
        return out
    if geom.geom_type == "POLYGON":
        out[in_box] = points_in_rings(px[in_box], py[in_box], geom.rings)
        return out
    if geom.geom_type == "MULTIPOLYGON":
        sub = np.zeros(int(in_box.sum()), dtype=bool)
        by_poly: dict[int, list[np.ndarray]] = {}
        for r, pi in zip(geom.rings, geom.ring_poly):
            by_poly.setdefault(pi, []).append(r)
        for rings in by_poly.values():
            sub |= points_in_rings(px[in_box], py[in_box], rings)
        out[in_box] = sub
        return out
    raise ValueError(f"points_in_polygon: not a polygon: {geom.geom_type}")


def haversine_m(lon1, lat1, lon2, lat2) -> np.ndarray:
    """Great-circle distance in meters (vectorized).

    Formula matches what the DuckDB oracle SQL spells out with
    sin/cos/asin/sqrt so Spark and oracle agree bit-for-bit-ish
    (double rounding differences < 1e-9 relative).
    """
    lon1 = np.radians(np.asarray(lon1, dtype=np.float64))
    lat1 = np.radians(np.asarray(lat1, dtype=np.float64))
    lon2 = np.radians(np.asarray(lon2, dtype=np.float64))
    lat2 = np.radians(np.asarray(lat2, dtype=np.float64))
    dlon = lon2 - lon1
    dlat = lat2 - lat1
    a = np.sin(dlat / 2) ** 2 + np.cos(lat1) * np.cos(lat2) * np.sin(dlon / 2) ** 2
    return 2.0 * EARTH_RADIUS_M * np.arcsin(np.sqrt(np.clip(a, 0.0, 1.0)))


WGS84_A = 6378137.0
WGS84_F = 1.0 / 298.257223563


def vincenty_m(lon1, lat1, lon2, lat2, tol: float = 1e-12, max_iter: int = 200) -> np.ndarray:
    """Geodesic distance on the WGS84 ellipsoid (Vincenty 1975 inverse
    formula — public algorithm), vectorized. Near-antipodal pairs that
    fail to converge fall back to the spherical haversine (documented
    Vincenty limitation; error there ≤ 0.5%)."""
    a, f = WGS84_A, WGS84_F
    b = (1.0 - f) * a
    lon1 = np.radians(np.asarray(lon1, dtype=np.float64))
    lat1 = np.radians(np.asarray(lat1, dtype=np.float64))
    lon2 = np.radians(np.asarray(lon2, dtype=np.float64))
    lat2 = np.radians(np.asarray(lat2, dtype=np.float64))
    U1 = np.arctan((1.0 - f) * np.tan(lat1))
    U2 = np.arctan((1.0 - f) * np.tan(lat2))
    L = lon2 - lon1
    sinU1, cosU1 = np.sin(U1), np.cos(U1)
    sinU2, cosU2 = np.sin(U2), np.cos(U2)
    lam = L.copy() if L.shape else np.array(L, dtype=np.float64)
    lam = np.atleast_1d(lam).astype(np.float64)
    shape = lam.shape
    active = np.ones(shape, dtype=bool)
    sin_sig = np.zeros(shape)
    cos_sig = np.ones(shape)
    sigma = np.zeros(shape)
    cos2_alpha = np.ones(shape)
    cos_2sigm = np.zeros(shape)
    converged = np.zeros(shape, dtype=bool)
    for _ in range(max_iter):
        if not active.any():
            break
        sl, cl = np.sin(lam), np.cos(lam)
        sin_sig = np.hypot(cosU2 * sl, cosU1 * sinU2 - sinU1 * cosU2 * cl)
        cos_sig = sinU1 * sinU2 + cosU1 * cosU2 * cl
        sigma = np.arctan2(sin_sig, cos_sig)
        with np.errstate(divide="ignore", invalid="ignore"):
            sin_alpha = np.where(sin_sig != 0, cosU1 * cosU2 * sl / np.where(sin_sig != 0, sin_sig, 1.0), 0.0)
            cos2_alpha = 1.0 - sin_alpha * sin_alpha
            cos_2sigm = np.where(
                cos2_alpha != 0,
                cos_sig - 2.0 * sinU1 * sinU2 / np.where(cos2_alpha != 0, cos2_alpha, 1.0),
                0.0,  # equatorial line
            )
        C = f / 16.0 * cos2_alpha * (4.0 + f * (4.0 - 3.0 * cos2_alpha))
        lam_new = L + (1.0 - C) * f * sin_alpha * (
            sigma + C * sin_sig * (cos_2sigm + C * cos_sig * (-1.0 + 2.0 * cos_2sigm**2))
        )
        delta = np.abs(lam_new - lam)
        lam = np.where(active, lam_new, lam)
        newly = active & (delta < tol)
        converged |= newly
        active &= ~newly
    u2 = cos2_alpha * (a * a - b * b) / (b * b)
    A = 1.0 + u2 / 16384.0 * (4096.0 + u2 * (-768.0 + u2 * (320.0 - 175.0 * u2)))
    B = u2 / 1024.0 * (256.0 + u2 * (-128.0 + u2 * (74.0 - 47.0 * u2)))
    dsig = B * sin_sig * (
        cos_2sigm
        + B / 4.0 * (
            cos_sig * (-1.0 + 2.0 * cos_2sigm**2)
            - B / 6.0 * cos_2sigm * (-3.0 + 4.0 * sin_sig**2) * (-3.0 + 4.0 * cos_2sigm**2)
        )
    )
    dist = b * A * (sigma - dsig)
    same = (lat1 == lat2) & (lon1 == lon2)
    dist = np.where(np.atleast_1d(same), 0.0, dist)
    # non-converged (near-antipodal): spherical fallback
    bad = ~converged & ~np.atleast_1d(same)
    if bad.any():
        hv = np.atleast_1d(
            haversine_m(
                np.degrees(np.atleast_1d(lon1)), np.degrees(np.atleast_1d(lat1)),
                np.degrees(np.atleast_1d(lon2)), np.degrees(np.atleast_1d(lat2)),
            )
        )
        dist = np.where(bad, hv, dist)
    return dist.reshape(shape) if shape else float(dist)


def bbox_of(wkts) -> np.ndarray:
    """(n,4) array of [xmin, ymin, xmax, ymax] for an iterable of WKTs."""
    out = np.empty((len(wkts), 4), dtype=np.float64)
    for i, w in enumerate(wkts):
        out[i] = parse_wkt(w).bbox
    return out


# --- measures ------------------------------------------------------------
# JTS-compatible semantics (reference: geomesa-spark-jts SpatialRelation
# Functions st_area/st_length/st_centroid evaluate JTS Geometry methods):
# area: polygons only (lines/points -> 0), holes subtract;
# length: line length, polygon perimeter; centroid: area/length/point
# weighted by dimension.


def _ring_signed_area2(r: np.ndarray) -> float:
    """Twice the signed (shoelace) area of a closed ring."""
    if len(r) < 3:
        return 0.0
    x, y = r[:, 0], r[:, 1]
    x2, y2 = np.roll(x, -1), np.roll(y, -1)
    return float(np.sum(x * y2 - x2 * y))


def _close(r: np.ndarray) -> np.ndarray:
    if len(r) and (r[0, 0] != r[-1, 0] or r[0, 1] != r[-1, 1]):
        return np.vstack([r, r[:1]])
    return r


def geom_area(geom: Geometry) -> float:
    if geom.geom_type not in ("POLYGON", "MULTIPOLYGON"):
        return 0.0
    total = 0.0
    if geom.geom_type == "POLYGON":
        rings = geom.rings
        for i, r in enumerate(rings):
            a = abs(_ring_signed_area2(_close(r))) / 2.0
            total += a if i == 0 else -a
        return total
    by_poly: dict[int, list[np.ndarray]] = {}
    for r, pi in zip(geom.rings, geom.ring_poly):
        by_poly.setdefault(pi, []).append(r)
    for rings in by_poly.values():
        for i, r in enumerate(rings):
            a = abs(_ring_signed_area2(_close(r))) / 2.0
            total += a if i == 0 else -a
    return total


def _path_length(r: np.ndarray) -> float:
    if len(r) < 2:
        return 0.0
    d = np.diff(r, axis=0)
    return float(np.sum(np.hypot(d[:, 0], d[:, 1])))


def geom_length(geom: Geometry) -> float:
    t = geom.geom_type
    if t in ("POINT", "MULTIPOINT"):
        return 0.0
    if t in ("LINESTRING", "MULTILINESTRING"):
        return sum(_path_length(r) for r in geom.rings)
    # polygon perimeter (JTS getLength), all rings closed
    return sum(_path_length(_close(r)) for r in geom.rings)


def geom_centroid(geom: Geometry) -> tuple[float, float]:
    t = geom.geom_type
    if t in ("POINT", "MULTIPOINT"):
        allc = np.concatenate(geom.rings)
        return float(allc[:, 0].mean()), float(allc[:, 1].mean())
    if t in ("LINESTRING", "MULTILINESTRING"):
        sx = sy = sw = 0.0
        for r in geom.rings:
            if len(r) < 2:
                continue
            d = np.diff(r, axis=0)
            seg_len = np.hypot(d[:, 0], d[:, 1])
            mid = (r[:-1] + r[1:]) / 2.0
            sx += float((mid[:, 0] * seg_len).sum())
            sy += float((mid[:, 1] * seg_len).sum())
            sw += float(seg_len.sum())
        if sw == 0.0:
            return float(geom.rings[0][0, 0]), float(geom.rings[0][0, 1])
        return sx / sw, sy / sw
    # polygon: area-weighted with holes negative (signed shoelace centroid)
    sx = sy = sa = 0.0
    ring_groups = (
        geom.rings
        if t == "POLYGON"
        else geom.rings  # multipolygon: holes already follow their outer
    )
    hole_flags: list[bool] = []
    if t == "POLYGON":
        hole_flags = [i > 0 for i in range(len(geom.rings))]
    else:
        seen: dict[int, int] = {}
        for pi in geom.ring_poly:
            seen[pi] = seen.get(pi, 0) + 1
            hole_flags.append(seen[pi] > 1)
    for r, is_hole in zip(ring_groups, hole_flags):
        rc = _close(r)
        x, y = rc[:-1, 0], rc[:-1, 1]
        x2, y2 = rc[1:, 0], rc[1:, 1]
        cross = x * y2 - x2 * y
        a2 = float(cross.sum())  # 2*signed area
        if a2 == 0.0:
            continue
        cx = float(((x + x2) * cross).sum()) / (3.0 * a2)
        cy = float(((y + y2) * cross).sum()) / (3.0 * a2)
        a = abs(a2) / 2.0
        if is_hole:
            a = -a
        sx += cx * a
        sy += cy * a
        sa += a
    if sa == 0.0:
        allc = np.concatenate(geom.rings)
        return float(allc[:, 0].mean()), float(allc[:, 1].mean())
    return sx / sa, sy / sa


def convex_hull(points: np.ndarray) -> np.ndarray:
    """Andrew monotone chain; returns hull vertices CCW (closed not
    included). points: (n,2)."""
    pts = np.unique(points, axis=0)
    if len(pts) <= 2:
        return pts
    # lexicographic sort (unique already sorts rows)
    def half(iterable):
        h: list[np.ndarray] = []
        for p in iterable:
            while len(h) >= 2 and np.cross(h[-1] - h[-2], p - h[-2]) <= 0:
                h.pop()
            h.append(p)
        return h

    lower = half(pts)
    upper = half(pts[::-1])
    return np.array(lower[:-1] + upper[:-1])


# --- intersection predicates --------------------------------------------

def segments_intersect(a0, a1, b0, b1) -> bool:
    """Proper/improper segment intersection via orientation tests."""
    def orient(p, q, r):
        v = (q[0] - p[0]) * (r[1] - p[1]) - (q[1] - p[1]) * (r[0] - p[0])
        return 0 if v == 0 else (1 if v > 0 else -1)

    def on_seg(p, q, r):
        return (
            min(p[0], q[0]) <= r[0] <= max(p[0], q[0])
            and min(p[1], q[1]) <= r[1] <= max(p[1], q[1])
        )

    o1, o2 = orient(a0, a1, b0), orient(a0, a1, b1)
    o3, o4 = orient(b0, b1, a0), orient(b0, b1, a1)
    if o1 != o2 and o3 != o4:
        return True
    if o1 == 0 and on_seg(a0, a1, b0):
        return True
    if o2 == 0 and on_seg(a0, a1, b1):
        return True
    if o3 == 0 and on_seg(b0, b1, a0):
        return True
    return o4 == 0 and on_seg(b0, b1, a1)


def _any_edge_cross(g1: Geometry, g2: Geometry) -> bool:
    """Vectorized any-pair edge intersection between two geometries."""
    for r1 in g1.rings:
        e1 = _close(r1) if g1.geom_type in ("POLYGON", "MULTIPOLYGON") else r1
        if len(e1) < 2:
            continue
        a0x, a0y = e1[:-1, 0][:, None], e1[:-1, 1][:, None]
        a1x, a1y = e1[1:, 0][:, None], e1[1:, 1][:, None]
        for r2 in g2.rings:
            e2 = _close(r2) if g2.geom_type in ("POLYGON", "MULTIPOLYGON") else r2
            if len(e2) < 2:
                continue
            b0x, b0y = e2[:-1, 0][None, :], e2[:-1, 1][None, :]
            b1x, b1y = e2[1:, 0][None, :], e2[1:, 1][None, :]

            def orient(px, py, qx, qy, rx, ry):
                return np.sign((qx - px) * (ry - py) - (qy - py) * (rx - px))

            o1 = orient(a0x, a0y, a1x, a1y, b0x, b0y)
            o2 = orient(a0x, a0y, a1x, a1y, b1x, b1y)
            o3 = orient(b0x, b0y, b1x, b1y, a0x, a0y)
            o4 = orient(b0x, b0y, b1x, b1y, a1x, a1y)
            proper = (o1 != o2) & (o3 != o4)
            col = (
                ((o1 == 0) & (np.minimum(a0x, a1x) <= b0x) & (b0x <= np.maximum(a0x, a1x))
                 & (np.minimum(a0y, a1y) <= b0y) & (b0y <= np.maximum(a0y, a1y)))
                | ((o2 == 0) & (np.minimum(a0x, a1x) <= b1x) & (b1x <= np.maximum(a0x, a1x))
                   & (np.minimum(a0y, a1y) <= b1y) & (b1y <= np.maximum(a0y, a1y)))
                | ((o3 == 0) & (np.minimum(b0x, b1x) <= a0x) & (a0x <= np.maximum(b0x, b1x))
                   & (np.minimum(b0y, b1y) <= a0y) & (a0y <= np.maximum(b0y, b1y)))
                | ((o4 == 0) & (np.minimum(b0x, b1x) <= a1x) & (a1x <= np.maximum(b0x, b1x))
                   & (np.minimum(b0y, b1y) <= a1y) & (a1y <= np.maximum(b0y, b1y)))
            )
            if bool((proper | col).any()):
                return True
    return False


def _rep_points(g: Geometry) -> np.ndarray:
    return np.concatenate(g.rings)


def geoms_intersect(g1: Geometry, g2: Geometry) -> bool:
    """ST_Intersects for the supported type lattice: bbox reject, then
    vertex-containment + edge-crossing tests."""
    b1, b2 = g1.bbox, g2.bbox
    if b1[2] < b2[0] or b2[2] < b1[0] or b1[3] < b2[1] or b2[3] < b1[1]:
        return False
    polyish = ("POLYGON", "MULTIPOLYGON")
    if g1.geom_type in polyish:
        p = _rep_points(g2)
        if bool(points_in_polygon(p[:, 0], p[:, 1], g1).any()):
            return True
    if g2.geom_type in polyish:
        p = _rep_points(g1)
        if bool(points_in_polygon(p[:, 0], p[:, 1], g2).any()):
            return True
    if g1.geom_type in ("POINT", "MULTIPOINT") and g2.geom_type in ("POINT", "MULTIPOINT"):
        a, b = _rep_points(g1), _rep_points(g2)
        return bool((a[:, None] == b[None, :]).all(axis=2).any())
    if g1.geom_type in ("POINT", "MULTIPOINT") or g2.geom_type in ("POINT", "MULTIPOINT"):
        # point vs line: point on any segment
        pt_g, other = (g1, g2) if g1.geom_type in ("POINT", "MULTIPOINT") else (g2, g1)
        if other.geom_type in polyish:
            return False  # handled above
        for p in _rep_points(pt_g):
            for r in other.rings:
                for i in range(len(r) - 1):
                    if segments_intersect(r[i], r[i + 1], p, p):
                        return True
        return False
    return _any_edge_cross(g1, g2)


def geom_contains(g1: Geometry, g2: Geometry) -> bool:
    """ST_Contains (polygon container): every vertex of g2 inside g1 and
    no boundary crossing. Boundary-touching counts as NOT contained only
    for points exactly on edges (ray-cast half-open rule), matching the
    engine's join refinement semantics."""
    if g1.geom_type not in ("POLYGON", "MULTIPOLYGON"):
        return False
    p = _rep_points(g2)
    if not bool(points_in_polygon(p[:, 0], p[:, 1], g1).all()):
        return False
    if g2.geom_type in ("POINT", "MULTIPOINT"):
        return True
    return not _any_edge_cross(g1, g2)


# --- batched pair predicate (layer x layer joins) ------------------------
#
# The geometry-pair predicates above (geoms_intersect / geom_contains)
# evaluate ONE pair per call. A layer x layer spatial join produces
# millions of candidate pairs per Arrow batch; calling the scalar
# predicate per pair is the row-at-a-time-Python anti-pattern. The
# batched kernel below evaluates a whole batch of (left_wkt, right_wkt)
# pairs with NumPy only:
#
#   1. parse each DISTINCT WKT once (caller-supplied cache survives
#      across batches within a task),
#   2. vectorized bbox reject over all pairs,
#   3. group surviving pairs by LEFT geometry; within a group every
#      test runs over packed arrays of the rights — right-vertex-in-left
#      (one points_in_polygon call + or/and-reduceat), left-vertex-in-
#      right (one edges x points crossing-parity pass, xor-reduceat per
#      polygon part), shared-vertex / point-on-edge for the point/line
#      combinations, and an orientation-test edge-cross pass, each
#      reduced per right geometry with reduceat.
#
# Semantics are IDENTICAL to geoms_intersect / geom_contains applied
# per pair (property-tested in tests/test_geom.py): the same IEEE
# expressions, the same half-open ray-cast rule, the same test order.


def _edges_of(geom: Geometry) -> np.ndarray:
    """(E,4) [x0,y0,x1,y1] edge array: polygon rings closed, line paths
    open, points none — the exact edge sets _any_edge_cross walks."""
    if geom.geom_type in ("POINT", "MULTIPOINT"):
        return np.zeros((0, 4))
    closedish = geom.geom_type in ("POLYGON", "MULTIPOLYGON")
    segs = []
    for r in geom.rings:
        e = _close(r) if closedish else r
        if len(e) < 2:
            continue
        segs.append(np.concatenate([e[:-1], e[1:]], axis=1))
    return np.concatenate(segs, axis=0) if segs else np.zeros((0, 4))


def _pip_parts(geom: Geometry) -> tuple[np.ndarray, np.ndarray]:
    """(closed edge array, per-part edge counts) for the batched parity
    PIP. Parts mirror points_in_polygon: POLYGON = one parity group over
    all rings (holes via even-odd); MULTIPOLYGON = one group per
    polygon, OR'd by the caller. Zero-edge parts are dropped (they can
    contain nothing)."""
    if geom.geom_type == "POLYGON":
        groups = [geom.rings]
    else:
        by_poly: dict[int, list[np.ndarray]] = {}
        for r, pi in zip(geom.rings, geom.ring_poly):
            by_poly.setdefault(pi, []).append(r)
        groups = [rings for _, rings in sorted(by_poly.items())]
    segs, counts = [], []
    for rings in groups:
        cnt = 0
        for r in rings:
            e = _close(r)
            if len(e) < 2:
                continue
            segs.append(np.concatenate([e[:-1], e[1:]], axis=1))
            cnt += len(e) - 1
        if cnt:
            counts.append(cnt)
    if not segs:
        return np.zeros((0, 4)), np.zeros(0, dtype=np.int64)
    return np.concatenate(segs, axis=0), np.asarray(counts, dtype=np.int64)


def _seg_or(vals: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Segment-wise ANY over ``vals`` split by ``counts`` (empty → False)."""
    out = np.zeros(len(counts), dtype=bool)
    nz = counts > 0
    if nz.any():
        offs = np.concatenate([[0], np.cumsum(counts)[:-1]])[nz]
        out[nz] = np.logical_or.reduceat(vals, offs)
    return out


def _seg_and(vals: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Segment-wise ALL (empty → True, vacuous — callers guard)."""
    out = np.ones(len(counts), dtype=bool)
    nz = counts > 0
    if nz.any():
        offs = np.concatenate([[0], np.cumsum(counts)[:-1]])[nz]
        out[nz] = np.logical_and.reduceat(vals, offs)
    return out


def _cross_cols(A: np.ndarray, B: np.ndarray, proper_only: bool = False) -> np.ndarray:
    """Per-B-edge: does ANY edge of A cross it? Same orientation /
    collinear-touch tests as _any_edge_cross, broadcast [m,E] and
    chunked over E so memory stays bounded."""
    m, E = len(A), len(B)
    out = np.zeros(E, dtype=bool)
    if m == 0 or E == 0:
        return out
    a0x, a0y = A[:, 0][:, None], A[:, 1][:, None]
    a1x, a1y = A[:, 2][:, None], A[:, 3][:, None]
    step = max(1, 4_000_000 // m)
    for s in range(0, E, step):
        b = B[s : s + step]
        b0x, b0y = b[:, 0][None, :], b[:, 1][None, :]
        b1x, b1y = b[:, 2][None, :], b[:, 3][None, :]
        o1 = np.sign((a1x - a0x) * (b0y - a0y) - (a1y - a0y) * (b0x - a0x))
        o2 = np.sign((a1x - a0x) * (b1y - a0y) - (a1y - a0y) * (b1x - a0x))
        o3 = np.sign((b1x - b0x) * (a0y - b0y) - (b1y - b0y) * (a0x - b0x))
        o4 = np.sign((b1x - b0x) * (a1y - b0y) - (b1y - b0y) * (a1x - b0x))
        if proper_only:
            hit = (o1 * o2 < 0) & (o3 * o4 < 0)
        else:
            proper = (o1 != o2) & (o3 != o4)
            col = (
                ((o1 == 0) & (np.minimum(a0x, a1x) <= b0x) & (b0x <= np.maximum(a0x, a1x))
                 & (np.minimum(a0y, a1y) <= b0y) & (b0y <= np.maximum(a0y, a1y)))
                | ((o2 == 0) & (np.minimum(a0x, a1x) <= b1x) & (b1x <= np.maximum(a0x, a1x))
                   & (np.minimum(a0y, a1y) <= b1y) & (b1y <= np.maximum(a0y, a1y)))
                | ((o3 == 0) & (np.minimum(b0x, b1x) <= a0x) & (a0x <= np.maximum(b0x, b1x))
                   & (np.minimum(b0y, b1y) <= a0y) & (a0y <= np.maximum(b0y, b1y)))
                | ((o4 == 0) & (np.minimum(b0x, b1x) <= a1x) & (a1x <= np.maximum(b0x, b1x))
                   & (np.minimum(b0y, b1y) <= a1y) & (a1y <= np.maximum(b0y, b1y)))
            )
            hit = proper | col
        out[s : s + step] = hit.any(axis=0)
    return out


def _pip_many(
    pts: np.ndarray, edges: np.ndarray, part_counts: np.ndarray, parts_per: np.ndarray
) -> np.ndarray:
    """ANY of ``pts`` inside each of several polygons at once.

    ``edges``: concatenated closed edges, grouped part-by-part then
    polygon-by-polygon; ``part_counts``: edges per parity part;
    ``parts_per``: parts per polygon. One crossing matrix [E,p], parity
    by xor-reduceat per part, OR across parts — the same half-open
    crossing rule as points_in_rings (horizontal edges self-exclude via
    the (y0<=py)!=(y1<=py) guard; same IEEE op order for xi)."""
    n_right = len(parts_per)
    out = np.zeros(n_right, dtype=bool)
    if len(edges) == 0 or len(pts) == 0 or len(part_counts) == 0:
        return out
    x0, y0 = edges[:, 0][:, None], edges[:, 1][:, None]
    x1, y1 = edges[:, 2][:, None], edges[:, 3][:, None]
    part_offs = np.concatenate([[0], np.cumsum(part_counts)[:-1]])
    nz = parts_per > 0
    right_offs = np.concatenate([[0], np.cumsum(parts_per)[:-1]])[nz]
    # chunk the POINTS axis so the E×p crossing matrix stays bounded
    # (a 10^4-vertex left geometry against 10^5 packed right edges must
    # not materialize a gigacell matrix)
    step = max(1, 4_000_000 // max(len(edges), 1))
    for s in range(0, len(pts), step):
        if out[nz].all():
            break
        p = pts[s : s + step]
        px, py = p[:, 0][None, :], p[:, 1][None, :]
        cond = (y0 <= py) != (y1 <= py)
        with np.errstate(divide="ignore", invalid="ignore"):
            t = (py - y0) / (y1 - y0)
            xi = x0 + t * (x1 - x0)
        cross = cond & (px < xi)
        par = np.bitwise_xor.reduceat(cross, part_offs, axis=0)
        if nz.any():
            out[nz] |= np.logical_or.reduceat(par, right_offs, axis=0).any(axis=1)
    return out


def _points_on_edges(pts: np.ndarray, edges: np.ndarray) -> np.ndarray:
    """[E,p] bool: point j lies on edge i (exact collinearity + bbox) —
    the degenerate segments_intersect(e0, e1, p, p) result."""
    if len(edges) == 0 or len(pts) == 0:
        return np.zeros((len(edges), len(pts)), dtype=bool)
    ax, ay = edges[:, 0][:, None], edges[:, 1][:, None]
    bx, by = edges[:, 2][:, None], edges[:, 3][:, None]
    px, py = pts[:, 0][None, :], pts[:, 1][None, :]
    cross = (bx - ax) * (py - ay) - (by - ay) * (px - ax)
    return (
        (cross == 0.0)
        & (np.minimum(ax, bx) <= px) & (px <= np.maximum(ax, bx))
        & (np.minimum(ay, by) <= py) & (py <= np.maximum(ay, by))
    )


def _pack_wkt(wkt: str, cache: dict) -> dict:
    p = cache.get(wkt)
    if p is None:
        if len(cache) > 8192:
            cache.clear()
        g = parse_wkt(wkt)
        kind = (
            "point" if g.geom_type in ("POINT", "MULTIPOINT")
            else "poly" if g.geom_type in ("POLYGON", "MULTIPOLYGON")
            else "line"
        )
        p = {
            "geom": g,
            "bbox": g.bbox,
            "verts": np.concatenate(g.rings),
            "edges": _edges_of(g),
            "kind": kind,
        }
        if kind == "poly":
            p["pip_edges"], p["pip_counts"] = _pip_parts(g)
        cache[wkt] = p
    return p


def batch_predicate(
    left_wkts, right_wkts, predicate: str = "intersects", cache: dict | None = None
) -> np.ndarray:
    """Vectorized geometry-pair predicate over parallel WKT sequences.

    Returns bool[n] with out[i] == geoms_intersect(L[i], R[i]) (or
    geom_contains for predicate='contains') — no per-pair Python. This
    is the refine kernel behind spatial_join_geoms and the st_*
    geometry×geometry fallback."""
    n = len(left_wkts)
    out = np.zeros(n, dtype=bool)
    if n == 0:
        return out
    if cache is None:
        cache = {}
    lp = [_pack_wkt(w, cache) for w in left_wkts]
    rp = [_pack_wkt(w, cache) for w in right_wkts]
    lb = np.array([p["bbox"] for p in lp])
    rb = np.array([p["bbox"] for p in rp])
    alive = ~(
        (lb[:, 2] < rb[:, 0]) | (rb[:, 2] < lb[:, 0])
        | (lb[:, 3] < rb[:, 1]) | (rb[:, 3] < lb[:, 1])
    )

    groups: dict[str, list[int]] = {}
    for i in np.flatnonzero(alive):
        groups.setdefault(left_wkts[i], []).append(int(i))

    for w, rows in groups.items():
        gl = lp[rows[0]]  # not cache[w]: the cache may clear mid-batch
        idx = np.asarray(rows)
        rs = [rp[i] for i in idx]
        res = np.zeros(len(idx), dtype=bool)
        rkinds = np.array([r["kind"] for r in rs])

        if predicate in ("contains", "covers"):
            covers = predicate == "covers"
            if gl["kind"] != "poly":
                if covers and gl["kind"] == "point":
                    # geom_covers point container: every right vertex
                    # equals some left vertex
                    lv = gl["verts"]
                    for j, r in enumerate(rs):
                        rv = r["verts"]
                        eq = (
                            (rv[:, None, 0] == lv[None, :, 0])
                            & (rv[:, None, 1] == lv[None, :, 1])
                        ).any(axis=1)
                        res[j] = bool(eq.all())
                    out[idx] = res
                continue  # line containers → False (matches the scalar)
            vcat = np.concatenate([r["verts"] for r in rs])
            vcounts = np.array([len(r["verts"]) for r in rs])
            ins = points_in_polygon(vcat[:, 0], vcat[:, 1], gl["geom"])
            if covers:
                # closed region: interior OR exactly on boundary
                ins = ins | points_on_boundary(vcat[:, 0], vcat[:, 1], gl["geom"])
            allin = _seg_and(ins, vcounts)
            cand = np.flatnonzero(allin)
            if len(cand):
                pmask = rkinds[cand] == "point"
                res[cand[pmask]] = True
                ecand = cand[~pmask]
                if len(ecand):
                    ecat = np.concatenate([rs[j]["edges"] for j in ecand])
                    ecounts = np.array([len(rs[j]["edges"]) for j in ecand])
                    crossed = _seg_or(
                        _cross_cols(gl["edges"], ecat, proper_only=covers), ecounts
                    )
                    res[ecand] = ~crossed
            out[idx] = res
            continue

        decided = np.zeros(len(idx), dtype=bool)
        # test 1: any right vertex inside the (polygonal) left
        if gl["kind"] == "poly":
            vcat = np.concatenate([r["verts"] for r in rs])
            vcounts = np.array([len(r["verts"]) for r in rs])
            ins = points_in_polygon(vcat[:, 0], vcat[:, 1], gl["geom"])
            anyv = _seg_or(ins, vcounts)
            res |= anyv
            decided |= anyv
        # test 2: any left vertex inside a polygonal right
        sel = np.flatnonzero(~decided & (rkinds == "poly"))
        if len(sel):
            pe = np.concatenate([rs[j]["pip_edges"] for j in sel])
            pc = np.concatenate([rs[j]["pip_counts"] for j in sel])
            parts_per = np.array([len(rs[j]["pip_counts"]) for j in sel])
            anyl = _pip_many(gl["verts"], pe, pc, parts_per)
            res[sel[anyl]] = True
            decided[sel[anyl]] = True
        # test 3: point/point shared vertex
        if gl["kind"] == "point":
            sel = np.flatnonzero(~decided & (rkinds == "point"))
            if len(sel):
                rcat = np.concatenate([rs[j]["verts"] for j in sel])
                rcounts = np.array([len(rs[j]["verts"]) for j in sel])
                lv = gl["verts"]
                eq = (
                    (rcat[:, 0][:, None] == lv[None, :, 0])
                    & (rcat[:, 1][:, None] == lv[None, :, 1])
                ).any(axis=1)
                hit = _seg_or(eq, rcounts)
                res[sel[hit]] = True
                decided[sel] = True  # point/point fully decided here
        # test 4: point-on-line (either orientation; polygon sides were
        # decided above or are False per the scalar test order)
        if gl["kind"] == "point":
            sel = np.flatnonzero(~decided & (rkinds == "line"))
            if len(sel):
                ecat = np.concatenate([rs[j]["edges"] for j in sel])
                ecounts = np.array([len(rs[j]["edges"]) for j in sel])
                onb = _points_on_edges(gl["verts"], ecat).any(axis=1)
                hit = _seg_or(onb, ecounts)
                res[sel[hit]] = True
                decided[sel] = True
        elif gl["kind"] == "line":
            sel = np.flatnonzero(~decided & (rkinds == "point"))
            if len(sel):
                vcat = np.concatenate([rs[j]["verts"] for j in sel])
                vcounts = np.array([len(rs[j]["verts"]) for j in sel])
                onb = _points_on_edges(vcat, gl["edges"]).any(axis=0)
                hit = _seg_or(onb, vcounts)
                res[sel[hit]] = True
                decided[sel] = True
        # test 5: edge crossing for the remaining pairs where both sides
        # have edges (poly/line vs poly/line)
        if len(gl["edges"]):
            sel = np.flatnonzero(~decided & (rkinds != "point"))
            sel = sel[[len(rs[j]["edges"]) > 0 for j in sel]] if len(sel) else sel
            if len(sel):
                ecat = np.concatenate([rs[j]["edges"] for j in sel])
                ecounts = np.array([len(rs[j]["edges"]) for j in sel])
                crossed = _seg_or(_cross_cols(gl["edges"], ecat), ecounts)
                res[sel[crossed]] = True
        out[idx] = res
    return out


def points_on_boundary(px: np.ndarray, py: np.ndarray, geom: Geometry) -> np.ndarray:
    """True where (px,py) lies exactly on an edge/vertex of the
    geometry's rings (exact float collinearity + bbox test)."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    on = np.zeros(px.shape, dtype=bool)
    closedish = geom.geom_type in ("POLYGON", "MULTIPOLYGON")
    for r in geom.rings:
        e = _close(r) if closedish else r
        if len(e) < 2:
            on |= (px == e[0, 0]) & (py == e[0, 1])
            continue
        for j in range(len(e) - 1):
            ax, ay = e[j]
            bx, by = e[j + 1]
            cross = (bx - ax) * (py - ay) - (by - ay) * (px - ax)
            inbox = (
                (px >= min(ax, bx)) & (px <= max(ax, bx))
                & (py >= min(ay, by)) & (py <= max(ay, by))
            )
            on |= (cross == 0.0) & inbox
    return on


def geom_covers(g1: Geometry, g2: Geometry) -> bool:
    """ST_Covers: every point of g2 lies in g1's closed region
    (interior OR boundary) — unlike contains, boundary contact counts.
    Vertex containment (closed) + no PROPER edge crossing (a proper
    crossing means g2 exits g1's closed region; collinear boundary
    touching is allowed)."""
    if g1.geom_type not in ("POLYGON", "MULTIPOLYGON"):
        if g1.geom_type in ("POINT", "MULTIPOINT"):
            a, b = _rep_points(g1), _rep_points(g2)
            return bool((b[:, None] == a[None, :]).all(axis=2).any(axis=1).all())
        return False
    p = _rep_points(g2)
    closed_in = points_in_polygon(p[:, 0], p[:, 1], g1) | points_on_boundary(
        p[:, 0], p[:, 1], g1
    )
    if not bool(closed_in.all()):
        return False
    if g2.geom_type in ("POINT", "MULTIPOINT"):
        return True
    return not _any_proper_cross(g1, g2)


def _any_proper_cross(g1: Geometry, g2: Geometry) -> bool:
    """True when any edge pair crosses PROPERLY (strict orientation
    flips on both segments — excludes collinear/endpoint touches)."""
    for r1 in g1.rings:
        e1 = _close(r1) if g1.geom_type in ("POLYGON", "MULTIPOLYGON") else r1
        if len(e1) < 2:
            continue
        a0x, a0y = e1[:-1, 0][:, None], e1[:-1, 1][:, None]
        a1x, a1y = e1[1:, 0][:, None], e1[1:, 1][:, None]
        for r2 in g2.rings:
            e2 = _close(r2) if g2.geom_type in ("POLYGON", "MULTIPOLYGON") else r2
            if len(e2) < 2:
                continue
            b0x, b0y = e2[:-1, 0][None, :], e2[:-1, 1][None, :]
            b1x, b1y = e2[1:, 0][None, :], e2[1:, 1][None, :]

            def orient(px, py, qx, qy, rx, ry):
                return np.sign((qx - px) * (ry - py) - (qy - py) * (rx - px))

            o1 = orient(a0x, a0y, a1x, a1y, b0x, b0y)
            o2 = orient(a0x, a0y, a1x, a1y, b1x, b1y)
            o3 = orient(b0x, b0y, b1x, b1y, a0x, a0y)
            o4 = orient(b0x, b0y, b1x, b1y, a1x, a1y)
            if bool(((o1 * o2 < 0) & (o3 * o4 < 0)).any()):
                return True
    return False


def is_simple(geom: Geometry) -> bool:
    """ST_IsSimple: no anomalous self-intersection.

    POINT always; MULTIPOINT no duplicates; LINESTRING/rings: no two
    non-adjacent segments intersect and no adjacent pair overlaps
    collinearly."""
    t = geom.geom_type
    if t == "POINT":
        return True
    if t == "MULTIPOINT":
        pts = geom.rings[0]
        return len(np.unique(pts, axis=0)) == len(pts)

    def path_simple(e: np.ndarray, closed: bool) -> bool:
        m = len(e) - 1
        for i in range(m):
            for j in range(i + 1, m):
                adjacent = (j == i + 1) or (closed and i == 0 and j == m - 1)
                if adjacent:
                    # shared endpoint is fine; collinear overlap is not
                    shared = e[j] if j == i + 1 else e[0]
                    a, b = (e[i], e[i + 1]) if j == i + 1 else (e[j], e[j + 1])
                    c, d = (e[j], e[j + 1]) if j == i + 1 else (e[i], e[i + 1])
                    v1 = a - shared if (a != shared).any() else b - shared
                    v2 = c - shared if (c != shared).any() else d - shared
                    if v1[0] * v2[1] - v1[1] * v2[0] == 0 and v1 @ v2 > 0:
                        return False
                    continue
                if segments_intersect(e[i], e[i + 1], e[j], e[j + 1]):
                    return False
        return True

    closedish = t in ("POLYGON", "MULTIPOLYGON")
    for r in geom.rings:
        e = _close(r) if closedish else r
        if len(e) < 2:
            continue
        if not path_simple(e, closed=closedish or bool((e[0] == e[-1]).all())):
            return False
    return True


# --- polygon clipping (Greiner–Hormann) ----------------------------------


class _GHNode:
    __slots__ = ("pt", "nxt", "prv", "neighbor", "inter", "entry", "visited")

    def __init__(self, pt):
        self.pt = (float(pt[0]), float(pt[1]))
        self.nxt = self.prv = self.neighbor = None
        self.inter = False
        self.entry = False
        self.visited = False


def _ring_open(r: np.ndarray) -> np.ndarray:
    r = np.asarray(r, dtype=np.float64)
    if len(r) > 1 and r[0, 0] == r[-1, 0] and r[0, 1] == r[-1, 1]:
        return r[:-1]
    return r


def _gh_build(ring: np.ndarray) -> _GHNode:
    nodes = [_GHNode(p) for p in ring]
    for i, nd in enumerate(nodes):
        nd.nxt = nodes[(i + 1) % len(nodes)]
        nd.prv = nodes[i - 1]
    return nodes[0]


def _gh_vertices(head: _GHNode):
    n = head
    while True:
        yield n
        n = n.nxt
        if n is head:
            break


def _seg_inter_params(a0, a1, b0, b1):
    """Intersection parameters (ta, tb) of segments, or None if
    parallel / not properly crossing in (0,1) on both."""
    d1x, d1y = a1[0] - a0[0], a1[1] - a0[1]
    d2x, d2y = b1[0] - b0[0], b1[1] - b0[1]
    den = d1x * d2y - d1y * d2x
    if den == 0.0:
        return None
    ex, ey = b0[0] - a0[0], b0[1] - a0[1]
    ta = (ex * d2y - ey * d2x) / den
    tb = (ex * d1y - ey * d1x) / den
    if 0.0 < ta < 1.0 and 0.0 < tb < 1.0:
        return ta, tb
    return None


def _pip_ring(x: float, y: float, ring: np.ndarray) -> bool:
    return bool(points_in_rings(np.array([x]), np.array([y]), [ring])[0])


def clip_polygons(subject: np.ndarray, clip: np.ndarray, op: str) -> Geometry | None:
    """Boolean operation between two SIMPLE hole-free polygon rings via
    Greiner–Hormann (Greiner & Hormann 1998, "Efficient clipping of
    arbitrary polygons" — public algorithm): works for concave rings,
    unlike Sutherland–Hodgman.

    op: 'intersection' | 'difference' (subject − clip) | 'union'.
    Returns a POLYGON / MULTIPOLYGON / None (empty result). Degenerate
    configurations (vertex exactly on the other ring's edge) are
    unsupported, matching the engine-wide no-on-edge fixture
    convention.
    """
    s_ring = _ring_open(subject)
    c_ring = _ring_open(clip)
    if len(s_ring) < 3 or len(c_ring) < 3:
        return None
    s_head = _gh_build(s_ring)
    c_head = _gh_build(c_ring)

    # phase 1: insert intersection nodes (per original edge pair, sorted
    # by parameter within each edge)
    s_orig = list(_gh_vertices(s_head))
    c_orig = list(_gh_vertices(c_head))
    inserted: dict[int, list[tuple[float, _GHNode]]] = {}
    n_inter = 0
    for si, sn in enumerate(s_orig):
        s_next = s_orig[(si + 1) % len(s_orig)]
        hits = []
        for ci, cn in enumerate(c_orig):
            c_next = c_orig[(ci + 1) % len(c_orig)]
            r = _seg_inter_params(sn.pt, s_next.pt, cn.pt, c_next.pt)
            if r is None:
                continue
            ta, tb = r
            pt = (
                sn.pt[0] + ta * (s_next.pt[0] - sn.pt[0]),
                sn.pt[1] + ta * (s_next.pt[1] - sn.pt[1]),
            )
            ns, nc = _GHNode(pt), _GHNode(pt)
            ns.inter = nc.inter = True
            ns.neighbor, nc.neighbor = nc, ns
            hits.append((ta, ns))
            inserted.setdefault(ci, []).append((tb, nc))
            n_inter += 1
        for ta, ns in sorted(hits, key=lambda kv: kv[0]):
            # insert before current s_next (keeps ascending-alpha order)
            prev = s_next.prv
            prev.nxt, ns.prv = ns, prev
            ns.nxt, s_next.prv = s_next, ns
    for ci, hits in inserted.items():
        c_next = c_orig[(ci + 1) % len(c_orig)]
        for tb, nc in sorted(hits, key=lambda kv: kv[0]):
            prev = c_next.prv
            prev.nxt, nc.prv = nc, prev
            nc.nxt, c_next.prv = c_next, nc

    if n_inter == 0:
        s_in_c = _pip_ring(s_ring[0, 0], s_ring[0, 1], c_ring)
        c_in_s = _pip_ring(c_ring[0, 0], c_ring[0, 1], s_ring)
        if op == "intersection":
            if s_in_c:
                return Geometry("POLYGON", [s_ring])
            if c_in_s:
                return Geometry("POLYGON", [c_ring])
            return None
        if op == "difference":
            if s_in_c:
                return None
            if c_in_s:
                return Geometry("POLYGON", [s_ring, c_ring])  # hole
            return Geometry("POLYGON", [s_ring])
        if s_in_c:
            return Geometry("POLYGON", [c_ring])
        if c_in_s:
            return Geometry("POLYGON", [s_ring])
        return Geometry(
            "MULTIPOLYGON", [s_ring, c_ring], ring_poly=[0, 1]
        )

    # phase 2: entry/exit flags (alternate from the first vertex's
    # containment state); A−B ≡ A ∩ complement(B): complementing B
    # flips which side is "inside", which in GH flag terms flips the
    # SUBJECT's entry/exit parity (the traversal still walks the clip
    # ring backwards through its unflipped flags); union flips both
    def mark(head: _GHNode, other_ring: np.ndarray, flip: bool):
        first = head.pt
        inside = _pip_ring(first[0], first[1], other_ring)
        for nd in _gh_vertices(head):
            if nd.inter:
                nd.entry = (not inside) ^ flip
                inside = not inside

    mark(s_head, c_ring, flip=(op in ("difference", "union")))
    mark(c_head, s_ring, flip=(op == "union"))

    # phase 3: traversal
    out_rings: list[np.ndarray] = []
    while True:
        start = next(
            (nd for nd in _gh_vertices(s_head) if nd.inter and not nd.visited), None
        )
        if start is None:
            break
        ring_pts = [start.pt]
        cur = start
        guard = 0
        limit = 4 * (len(s_ring) + len(c_ring) + n_inter)
        while True:
            cur.visited = True
            if cur.neighbor is not None:
                cur.neighbor.visited = True
            if cur.entry:
                while True:
                    cur = cur.nxt
                    ring_pts.append(cur.pt)
                    if cur.inter:
                        break
            else:
                while True:
                    cur = cur.prv
                    ring_pts.append(cur.pt)
                    if cur.inter:
                        break
            cur = cur.neighbor
            guard += 1
            if cur is start or cur is start.neighbor or guard > limit:
                break
        if ring_pts[-1] == ring_pts[0]:
            ring_pts = ring_pts[:-1]
        ring = np.array(ring_pts)
        if len(ring) >= 3:
            out_rings.append(ring)

    if not out_rings:
        return None
    if len(out_rings) == 1:
        return Geometry("POLYGON", out_rings)
    return Geometry("MULTIPOLYGON", out_rings, ring_poly=list(range(len(out_rings))))


# --- DE-9IM (classification-based) ---------------------------------------


def _dim(g: Geometry) -> int:
    if g.geom_type in ("POINT", "MULTIPOINT"):
        return 0
    if g.geom_type in ("LINESTRING", "MULTILINESTRING"):
        return 1
    return 2


def relate_matrix(a: Geometry, b: Geometry) -> str:
    """DE-9IM matrix string (row-major II,IB,IE,BI,BB,BE,EI,EB,EE).

    Classification-based: the pair is classified with the engine's
    predicates (equals/contains/covers/touches/crosses/overlaps/
    disjoint) and the canonical matrix for that class is emitted
    (reference SpatialRelationFunctions.st_relate delegates to JTS
    relate; here the common point/line/polygon configurations produce
    the same strings, exotic boundary collapses may differ — documented
    engine-wide convention)."""
    da, db = _dim(a), _dim(b)

    def m(s: str) -> str:
        return s

    def transpose(s: str) -> str:
        return "".join(s[i] for i in (0, 3, 6, 1, 4, 7, 2, 5, 8))

    if da == 0 and db == 0:
        pa, pb = _rep_points(a), _rep_points(b)
        shared = (pa[:, None] == pb[None, :]).all(axis=2)
        if shared.any():
            only_shared = shared.any(axis=1).all() and shared.any(axis=0).all()
            return m("0FFFFFFF2") if only_shared else m("0F0FFF0F2")
        return m("FF0FFF0F2")

    if da == 0:  # point vs line/polygon
        p = _rep_points(a)
        if db == 2:
            inside = points_in_polygon(p[:, 0], p[:, 1], b)
            onb = points_on_boundary(p[:, 0], p[:, 1], b)
            if bool((inside | onb).all()):
                if bool(inside.any()) and bool(onb.any()):
                    return m("00FFFF212")
                return m("0FFFFF212") if bool(inside.any()) else m("F0FFFF212")
            if bool(inside.any()) or bool(onb.any()):
                return m("00FFFF212") if bool(inside.any()) else m("F00FFF212")
            return m("FF0FFF212")
        onl = points_on_boundary(p[:, 0], p[:, 1], b)
        ends = np.vstack([r[[0, -1]] for r in b.rings if len(r)])
        onend = (p[:, None] == ends[None, :]).all(axis=2).any(axis=1)
        if bool(onl.all()):
            return m("F0FFFF102") if bool(onend.all()) else m("0FFFFF102")
        return m("FF0FFF102") if not bool(onl.any()) else m("0F0FFF102")
    if db == 0:
        return transpose(relate_matrix(b, a))

    if da == 2 and db == 2:
        if _geom_equal(a, b):
            return m("2FFF1FFF2")
        if not geoms_intersect(a, b):
            return m("FF2FF1212")
        if geom_contains(a, b):
            return m("212FF1FF2")
        if geom_contains(b, a):
            return m("2FF1FF212")
        if _any_proper_cross(a, b):
            return m("212101212")  # overlaps
        # intersecting but no interior crossing → boundary touch
        return m("FF2F11212")

    if da == 1 and db == 2:
        return transpose(relate_matrix(b, a))
    if da == 2 and db == 1:
        p = _rep_points(b)
        inside = points_in_polygon(p[:, 0], p[:, 1], a)
        onb = points_on_boundary(p[:, 0], p[:, 1], a)
        if bool(inside.all()):
            return m("102FF1FF2")  # line in polygon interior
        if bool((inside | onb).all()) and bool(inside.any()):
            return m("102F01FF2")
        if _any_proper_cross(a, b):
            return m("1020F1102")  # crosses
        if bool(onb.any()) or geoms_intersect(a, b):
            return m("FF2F01102")  # touches
        return m("FF2FF1102")

    # line vs line
    if _geom_equal(a, b):
        return m("1FFF0FFF2")
    if not geoms_intersect(a, b):
        return m("FF1FF0102")
    if _any_proper_cross(a, b):
        return m("0F1FF0102")  # crosses at interior point
    return m("FF1F00102")  # touches (endpoint contact)


def _geom_equal(a: Geometry, b: Geometry) -> bool:
    return (
        a.geom_type == b.geom_type
        and len(a.rings) == len(b.rings)
        and all(
            r1.shape == r2.shape and bool((r1 == r2).all())
            for r1, r2 in zip(a.rings, b.rings)
        )
    )


def relate_match(matrix: str, pattern: str) -> bool:
    """DE-9IM pattern match: T = any non-F dim, F = empty, * = any,
    0/1/2 = exact dimension."""
    if len(matrix) != 9 or len(pattern) != 9:
        return False
    for mc, pc in zip(matrix, pattern.upper()):
        if pc == "*":
            continue
        if pc == "T":
            if mc == "F":
                return False
        elif mc != pc:
            return False
    return True


# --- geohash -------------------------------------------------------------

_GH32 = "0123456789bcdefghjkmnpqrstuvwxyz"
_GH32_INV = {c: i for i, c in enumerate(_GH32)}


def geohash_encode(lon: float, lat: float, precision: int = 12) -> str:
    """Standard base-32 geohash (interleaved lon/lat bisection)."""
    lo_lon, hi_lon, lo_lat, hi_lat = -180.0, 180.0, -90.0, 90.0
    bits = []
    even = True
    while len(bits) < precision * 5:
        if even:
            mid = (lo_lon + hi_lon) / 2
            if lon >= mid:
                bits.append(1)
                lo_lon = mid
            else:
                bits.append(0)
                hi_lon = mid
        else:
            mid = (lo_lat + hi_lat) / 2
            if lat >= mid:
                bits.append(1)
                lo_lat = mid
            else:
                bits.append(0)
                hi_lat = mid
        even = not even
    out = []
    for i in range(precision):
        v = 0
        for b in bits[i * 5 : i * 5 + 5]:
            v = (v << 1) | b
        out.append(_GH32[v])
    return "".join(out)


def geohash_decode(gh: str) -> tuple[float, float]:
    """Center point of a geohash cell."""
    lo_lon, hi_lon, lo_lat, hi_lat = -180.0, 180.0, -90.0, 90.0
    even = True
    for c in gh:
        v = _GH32_INV[c]
        for i in range(4, -1, -1):
            bit = (v >> i) & 1
            if even:
                mid = (lo_lon + hi_lon) / 2
                if bit:
                    lo_lon = mid
                else:
                    hi_lon = mid
            else:
                mid = (lo_lat + hi_lat) / 2
                if bit:
                    lo_lat = mid
                else:
                    hi_lat = mid
            even = not even
    return (lo_lon + hi_lon) / 2, (lo_lat + hi_lat) / 2


# --- WKB codec -----------------------------------------------------------

_WKB_TYPES = {
    1: "POINT",
    2: "LINESTRING",
    3: "POLYGON",
    4: "MULTIPOINT",
    5: "MULTILINESTRING",
    6: "MULTIPOLYGON",
    7: "GEOMETRYCOLLECTION",
}
_WKB_CODES = {v: k for k, v in _WKB_TYPES.items()}

import struct  # noqa: E402


def wkb_write(geom: Geometry) -> bytes:
    """Little-endian ISO WKB for the supported type lattice."""
    t = geom.geom_type

    def coords(r: np.ndarray) -> bytes:
        return struct.pack("<I", len(r)) + np.asarray(r, dtype="<f8").tobytes()

    head = struct.pack("<BI", 1, _WKB_CODES[t])
    if t == "POINT":
        x, y = geom.rings[0][0]
        return struct.pack("<BI", 1, 1) + struct.pack("<dd", x, y)
    if t == "LINESTRING":
        return head + coords(geom.rings[0])
    if t == "POLYGON":
        return head + struct.pack("<I", len(geom.rings)) + b"".join(
            coords(_close(r)) for r in geom.rings
        )
    if t == "MULTIPOINT":
        pts = geom.rings[0]
        return head + struct.pack("<I", len(pts)) + b"".join(
            struct.pack("<BIdd", 1, 1, x, y) for x, y in pts
        )
    if t == "MULTILINESTRING":
        return head + struct.pack("<I", len(geom.rings)) + b"".join(
            struct.pack("<BI", 1, 2) + coords(r) for r in geom.rings
        )
    if t == "MULTIPOLYGON":
        by_poly: dict[int, list[np.ndarray]] = {}
        for r, pi in zip(geom.rings, geom.ring_poly):
            by_poly.setdefault(pi, []).append(r)
        parts = []
        for rings in by_poly.values():
            parts.append(
                struct.pack("<BII", 1, 3, len(rings))
                + b"".join(coords(_close(r)) for r in rings)
            )
        return head + struct.pack("<I", len(by_poly)) + b"".join(parts)
    if t == "GEOMETRYCOLLECTION":
        kids = geom.parts or []
        return head + struct.pack("<I", len(kids)) + b"".join(wkb_write(k) for k in kids)
    raise ValueError(t)


def wkb_read(buf: bytes) -> Geometry:
    """Parse (E)WKB for the supported type lattice, either endianness."""
    pos = 0

    def read(fmt: str, end: str):
        nonlocal pos
        vals = struct.unpack_from(end + fmt, buf, pos)
        pos += struct.calcsize(fmt)
        return vals

    def read_geom() -> Geometry:
        nonlocal pos
        (b,) = struct.unpack_from("B", buf, pos)
        pos += 1
        end = "<" if b == 1 else ">"
        (code,) = read("I", end)
        code &= 0xFF  # strip EWKB SRID/Z flags
        t = _WKB_TYPES[code]
        if t == "POINT":
            x, y = read("dd", end)
            return Geometry("POINT", [np.array([[x, y]])])
        if t in ("LINESTRING", "MULTIPOINT"):
            if t == "LINESTRING":
                (n,) = read("I", end)
                arr = np.array(read(f"{2*n}d", end)).reshape(-1, 2)
                return Geometry(t, [arr])
            (n,) = read("I", end)
            pts = []
            for _ in range(n):
                g = read_geom()
                pts.append(g.rings[0][0])
            return Geometry("MULTIPOINT", [np.array(pts)])
        if t == "POLYGON":
            (nr,) = read("I", end)
            rings = []
            for _ in range(nr):
                (n,) = read("I", end)
                rings.append(np.array(read(f"{2*n}d", end)).reshape(-1, 2))
            return Geometry("POLYGON", rings)
        if t == "MULTILINESTRING":
            (n,) = read("I", end)
            return Geometry(t, [read_geom().rings[0] for _ in range(n)])
        if t == "MULTIPOLYGON":
            (n,) = read("I", end)
            rings: list[np.ndarray] = []
            ring_poly: list[int] = []
            for pi in range(n):
                g = read_geom()
                for r in g.rings:
                    rings.append(r)
                    ring_poly.append(pi)
            return Geometry("MULTIPOLYGON", rings, ring_poly)
        if t == "GEOMETRYCOLLECTION":
            (n,) = read("I", end)
            parts = [read_geom() for _ in range(n)]
            g = Geometry(t, [r for p in parts for r in p.rings])
            g.parts = parts
            return g
        raise ValueError(t)

    return read_geom()


def clip_polygon_convex(subject: np.ndarray, clip: np.ndarray) -> np.ndarray:
    """Sutherland–Hodgman: subject ring clipped by a CONVEX clip ring
    (CCW). Returns the clipped ring (possibly empty)."""
    def is_ccw(r):
        return _ring_signed_area2(_close(r)) > 0

    clip = clip if is_ccw(clip) else clip[::-1]
    out = list(subject)
    m = len(clip)
    for i in range(m):
        a, b = clip[i], clip[(i + 1) % m]
        inp, out = out, []
        if not inp:
            break
        for j in range(len(inp)):
            p, q = inp[j - 1], inp[j]
            side_q = (b[0] - a[0]) * (q[1] - a[1]) - (b[1] - a[1]) * (q[0] - a[0])
            side_p = (b[0] - a[0]) * (p[1] - a[1]) - (b[1] - a[1]) * (p[0] - a[0])
            if side_q >= 0:
                if side_p < 0:
                    t = side_p / (side_p - side_q)
                    out.append(p + t * (q - p))
                out.append(q)
            elif side_p >= 0:
                t = side_p / (side_p - side_q)
                out.append(p + t * (q - p))
    return np.array(out) if out else np.zeros((0, 2))


def point_seg_dist(px, py, ax, ay, bx, by):
    """Vectorized point-to-segment distance (planar)."""
    dx, dy = bx - ax, by - ay
    ll = dx * dx + dy * dy
    t = np.where(ll > 0, ((px - ax) * dx + (py - ay) * dy) / np.where(ll > 0, ll, 1), 0.0)
    t = np.clip(t, 0.0, 1.0)
    cx, cy = ax + t * dx, ay + t * dy
    return np.hypot(px - cx, py - cy), cx, cy


def geom_distance(g1: Geometry, g2: Geometry) -> float:
    """Planar min distance (JTS Geometry.distance semantics): 0 when
    intersecting; else min vertex-to-edge distance across both."""
    if geoms_intersect(g1, g2):
        return 0.0
    best = np.inf
    for ga, gb in ((g1, g2), (g2, g1)):
        pts = _rep_points(ga)
        for r in gb.rings:
            e = _close(r) if gb.geom_type in ("POLYGON", "MULTIPOLYGON") else r
            if len(e) < 2:
                d = np.hypot(pts[:, 0] - e[0, 0], pts[:, 1] - e[0, 1])
                best = min(best, float(d.min()))
                continue
            d, _, _ = point_seg_dist(
                pts[:, 0][:, None], pts[:, 1][:, None],
                e[:-1, 0][None, :], e[:-1, 1][None, :],
                e[1:, 0][None, :], e[1:, 1][None, :],
            )
            best = min(best, float(d.min()))
    return best


def closest_point_on(g: Geometry, px: float, py: float) -> tuple[float, float]:
    """Closest point on g's boundary/vertices to (px,py) (JTS
    st_closestPoint analogue for the non-interior case; interior hits
    return the point itself)."""
    if g.geom_type in ("POLYGON", "MULTIPOLYGON") and bool(
        points_in_polygon(np.array([px]), np.array([py]), g)[0]
    ):
        return px, py
    best, bx, by = np.inf, px, py
    for r in g.rings:
        e = _close(r) if g.geom_type in ("POLYGON", "MULTIPOLYGON") else r
        if len(e) < 2:
            d = math.hypot(px - e[0, 0], py - e[0, 1])
            if d < best:
                best, bx, by = d, float(e[0, 0]), float(e[0, 1])
            continue
        d, cx, cy = point_seg_dist(px, py, e[:-1, 0], e[:-1, 1], e[1:, 0], e[1:, 1])
        i = int(np.argmin(d))
        if d[i] < best:
            best, bx, by = float(d[i]), float(cx[i]), float(cy[i])
    return bx, by


# --- buffer --------------------------------------------------------------

def wkb_from_points(lons: np.ndarray, lats: np.ndarray) -> list[bytes]:
    """Vectorized little-endian WKB POINT encoding."""
    n = len(lons)
    buf = np.empty((n, 21), dtype=np.uint8)
    buf[:, 0] = 1  # little-endian
    buf[:, 1:5] = np.frombuffer(
        np.full(n, 1, dtype="<u4").tobytes(), dtype=np.uint8
    ).reshape(n, 4)
    buf[:, 5:13] = np.frombuffer(
        np.asarray(lons, dtype="<f8").tobytes(), dtype=np.uint8
    ).reshape(n, 8)
    buf[:, 13:21] = np.frombuffer(
        np.asarray(lats, dtype="<f8").tobytes(), dtype=np.uint8
    ).reshape(n, 8)
    return [bytes(b) for b in buf]


def point_buffer_wkt(lon: float, lat: float, radius_m: float, segments: int = 32) -> str:
    """Geodesic point buffer approximated as an n-gon in lon/lat degrees
    (reference: geomesa-spark-jts GeometricProcessingFunctions::
    st_bufferPoint — geodesic buffer; here a spherical small-circle
    approximation, accurate away from the poles)."""
    ang = np.linspace(0.0, 2.0 * np.pi, segments, endpoint=False)
    dlat = (radius_m / EARTH_RADIUS_M) * np.cos(ang)
    coslat = max(math.cos(math.radians(lat)), 1e-12)
    dlon = (radius_m / EARTH_RADIUS_M) * np.sin(ang) / coslat
    vx = lon + np.degrees(dlon)
    vy = lat + np.degrees(dlat)
    pts = ", ".join(f"{x} {y}" for x, y in zip(vx, vy))
    first = f"{vx[0]} {vy[0]}"
    return f"POLYGON (({pts}, {first}))"


def simplify_path(pts: np.ndarray, tol: float, closed: bool = False) -> np.ndarray:
    """Douglas–Peucker path simplification (vectorized per segment).

    Reference semantics: GeoTools/JTS DouglasPeuckerSimplifier as used
    by the upstream engine's st_simplify for tile rendering. Iterative
    (explicit stack — no recursion-depth limit on pathological paths);
    the perpendicular distance of every interior vertex to the current
    chord is computed as one NumPy expression per split. ``closed``
    keeps first==last and enforces the 4-point polygon-ring minimum by
    falling back to the ring's extreme vertices when over-simplified."""
    pts = np.asarray(pts, dtype=np.float64)
    n = len(pts)
    if n <= 2:
        return pts.copy()
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[n - 1] = True
    stack = [(0, n - 1)]
    while stack:
        a, b = stack.pop()
        if b - a < 2:
            continue
        seg = pts[a + 1 : b]
        d = pts[b] - pts[a]
        L2 = float(d @ d)
        if L2 == 0.0:
            dist = np.hypot(seg[:, 0] - pts[a, 0], seg[:, 1] - pts[a, 1])
        else:
            # |cross((p-a), d)| / |d|
            dist = np.abs(
                (seg[:, 0] - pts[a, 0]) * d[1] - (seg[:, 1] - pts[a, 1]) * d[0]
            ) / np.sqrt(L2)
        i = int(np.argmax(dist))
        if dist[i] > tol:
            m = a + 1 + i
            keep[m] = True
            stack.append((a, m))
            stack.append((m, b))
    out = pts[keep]
    if closed and len(out) < 4:
        # ring collapsed below the POLYGON minimum: keep the extreme
        # vertices (bbox corners of the original ring) so the output
        # stays a valid closed ring
        body = pts[:-1]
        idx = sorted({
            int(body[:, 0].argmin()), int(body[:, 0].argmax()),
            int(body[:, 1].argmin()), int(body[:, 1].argmax()),
        })
        out = np.vstack([body[idx], body[idx[0]]])
    return out
