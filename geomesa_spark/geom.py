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
    "bbox_of",
    "EARTH_RADIUS_M",
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

    __slots__ = ("geom_type", "rings", "ring_poly")

    def __init__(self, geom_type: str, rings: list[np.ndarray], ring_poly=None):
        self.geom_type = geom_type
        self.rings = rings
        self.ring_poly = ring_poly

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


def bbox_of(wkts) -> np.ndarray:
    """(n,4) array of [xmin, ymin, xmax, ymax] for an iterable of WKTs."""
    out = np.empty((len(wkts), 4), dtype=np.float64)
    for i, w in enumerate(wkts):
        out[i] = parse_wkt(w).bbox
    return out
