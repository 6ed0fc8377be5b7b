"""Geometry kernel tests — PIP vs brute-force winding oracle, WKT
round-trip, haversine sanity (mirrors the reference's
SparkSQLSpatialRelationshipsTest truth tables on small WKT fixtures).
"""

import numpy as np
import pytest

from geomesa_spark.geom import (
    Geometry,
    bbox_of,
    haversine_m,
    parse_wkt,
    points_in_polygon,
    to_wkt,
)

rng = np.random.default_rng(7)


class TestWKT:
    def test_point(self):
        g = parse_wkt("POINT (10.5 -20.25)")
        assert g.geom_type == "POINT"
        assert g.rings[0].tolist() == [[10.5, -20.25]]

    def test_polygon_with_hole(self):
        g = parse_wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))")
        assert g.geom_type == "POLYGON"
        assert len(g.rings) == 2
        assert g.bbox == (0, 0, 10, 10)

    def test_multipolygon(self):
        g = parse_wkt(
            "MULTIPOLYGON (((0 0, 2 0, 2 2, 0 2, 0 0)), ((5 5, 7 5, 7 7, 5 7, 5 5), (5.5 5.5, 6 5.5, 6 6, 5.5 6, 5.5 5.5)))"
        )
        assert g.geom_type == "MULTIPOLYGON"
        assert len(g.rings) == 3
        assert g.ring_poly == [0, 1, 1]

    def test_roundtrip(self):
        w = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"
        assert to_wkt(parse_wkt(w)).startswith("POLYGON")
        g2 = parse_wkt(to_wkt(parse_wkt(w)))
        assert np.allclose(g2.rings[0], parse_wkt(w).rings[0])

    def test_linestring_and_scientific(self):
        g = parse_wkt("LINESTRING (0 0, 1e1 -2.5E-1)")
        assert np.allclose(g.rings[0], [[0, 0], [10, -0.25]])

    def test_bad_type(self):
        with pytest.raises(ValueError):
            parse_wkt("TRIANGLE ((0 0, 1 0, 0 1))")

    def test_bbox_of_batch(self):
        b = bbox_of(["POINT (1 2)", "POLYGON ((0 0, 4 0, 4 3, 0 3, 0 0))"])
        assert b.shape == (2, 4)
        assert b[1].tolist() == [0, 0, 4, 3]


def _pip_winding_oracle(px, py, rings):
    """Brute-force winding-number check (independent algorithm)."""
    out = np.zeros(len(px), dtype=int)
    for k in range(len(px)):
        x, y = px[k], py[k]
        crossings = 0
        for ring in rings:
            r = ring
            if r[0, 0] != r[-1, 0] or r[0, 1] != r[-1, 1]:
                r = np.vstack([r, r[:1]])
            for (x0, y0), (x1, y1) in zip(r[:-1], r[1:]):
                if (y0 > y) != (y1 > y):
                    xi = x0 + (y - y0) / (y1 - y0) * (x1 - x0)
                    if x < xi:
                        crossings += 1
        out[k] = crossings % 2
    return out.astype(bool)


class TestPIP:
    def test_square(self):
        g = parse_wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
        px = np.array([5.0, 15.0, -1.0, 9.99, 0.5])
        py = np.array([5.0, 5.0, 5.0, 9.99, 0.5])
        assert points_in_polygon(px, py, g).tolist() == [True, False, False, True, True]

    def test_hole(self):
        g = parse_wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))")
        px = np.array([5.0, 3.0, 6.5])
        py = np.array([5.0, 3.0, 6.5])
        # center is inside the hole -> excluded
        assert points_in_polygon(px, py, g).tolist() == [False, True, True]

    def test_concave(self):
        # L-shape
        g = parse_wkt("POLYGON ((0 0, 10 0, 10 4, 4 4, 4 10, 0 10, 0 0))")
        px = np.array([2.0, 8.0, 8.0, 2.0])
        py = np.array([2.0, 2.0, 8.0, 8.0])
        assert points_in_polygon(px, py, g).tolist() == [True, True, False, True]

    def test_multipolygon(self):
        g = parse_wkt("MULTIPOLYGON (((0 0, 2 0, 2 2, 0 2, 0 0)), ((5 5, 7 5, 7 7, 5 7, 5 5)))")
        px = np.array([1.0, 6.0, 3.5])
        py = np.array([1.0, 6.0, 3.5])
        assert points_in_polygon(px, py, g).tolist() == [True, True, False]

    def test_matches_winding_oracle_random(self):
        # random convex-ish and star polygons vs the independent oracle
        for trial in range(20):
            n = int(rng.integers(3, 12))
            ang = np.sort(rng.uniform(0, 2 * np.pi, n))
            rad = rng.uniform(1, 5, n)
            cx, cy = rng.uniform(-50, 50, 2)
            ring = np.stack([cx + rad * np.cos(ang), cy + rad * np.sin(ang)], axis=1)
            ring = np.vstack([ring, ring[:1]])
            g = Geometry("POLYGON", [ring])
            px = rng.uniform(cx - 6, cx + 6, 500)
            py = rng.uniform(cy - 6, cy + 6, 500)
            got = points_in_polygon(px, py, g)
            want = _pip_winding_oracle(px, py, [ring])
            assert np.array_equal(got, want), f"trial {trial}"


class TestHaversine:
    def test_zero(self):
        assert float(haversine_m(10, 20, 10, 20)) == 0.0

    def test_equator_degree(self):
        # 1 degree of longitude at the equator ~ 111.19 km
        d = float(haversine_m(0, 0, 1, 0))
        assert abs(d - 111195) < 200

    def test_symmetry_vectorized(self):
        lon1, lat1 = rng.uniform(-180, 180, 100), rng.uniform(-89, 89, 100)
        lon2, lat2 = rng.uniform(-180, 180, 100), rng.uniform(-89, 89, 100)
        d1 = haversine_m(lon1, lat1, lon2, lat2)
        d2 = haversine_m(lon2, lat2, lon1, lat1)
        assert np.allclose(d1, d2)
        assert (d1 >= 0).all() and (d1 <= np.pi * 6371008.8 + 1).all()


class TestClipProperties:
    """Greiner–Hormann invariants over random star polygons:
    area(A∩B) + area(A−B) = area(A), and ∩/∪ inclusion-exclusion."""

    @staticmethod
    def _star(seed, cx, cy, n=9, r=3.0):
        r_ = np.random.RandomState(seed)
        ang = np.sort(r_.uniform(0, 2 * np.pi, n))
        rad = r_.uniform(0.4 * r, r, n)
        return np.stack([cx + rad * np.cos(ang), cy + rad * np.sin(ang)], axis=1)

    def test_area_conservation(self):
        from geomesa_spark.geom import clip_polygons, geom_area

        checked = 0
        for seed in range(40):
            a = self._star(seed, 0.0, 0.0)
            b = self._star(seed + 1000, np.random.RandomState(seed).uniform(-2, 2),
                           np.random.RandomState(seed + 7).uniform(-2, 2))
            ga = abs(
                sum(np.cross(a[i], a[(i + 1) % len(a)]) for i in range(len(a)))
            ) / 2.0
            inter = clip_polygons(a, b, "intersection")
            diff = clip_polygons(a, b, "difference")
            ai = geom_area(inter) if inter is not None else 0.0
            ad = geom_area(diff) if diff is not None else 0.0
            assert ai + ad == pytest.approx(ga, rel=1e-9), f"seed {seed}"
            # union = A + B - A∩B
            uni = clip_polygons(a, b, "union")
            gb = abs(
                sum(np.cross(b[i], b[(i + 1) % len(b)]) for i in range(len(b)))
            ) / 2.0
            au = geom_area(uni) if uni is not None else 0.0
            assert au == pytest.approx(ga + gb - ai, rel=1e-9), f"seed {seed}"
            checked += 1
        assert checked == 40
