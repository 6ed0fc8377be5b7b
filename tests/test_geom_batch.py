"""Property tests: geom.batch_predicate ≡ the scalar pair predicates.

The batched kernel must agree with geoms_intersect / geom_contains on
EVERY pair of a randomized geometry soup — rects (incl. exact-touching
lattice rects that exercise the collinear paths), convex polygons,
holed polygons, multipolygons, lines, points and multipoints. This is
the same property-test discipline that caught the Greiner–Hormann
orientation bug in round 2: goldens alone miss symmetric mistakes.
"""

import numpy as np

from geomesa_spark.geom import (
    batch_predicate,
    geom_contains,
    geoms_intersect,
    parse_wkt,
)


def _rect(x0, y0, x1, y1):
    return f"POLYGON (({x0} {y0}, {x1} {y0}, {x1} {y1}, {x0} {y1}, {x0} {y0}))"


def _soup(rng: np.random.RandomState) -> list[str]:
    geoms: list[str] = []
    # lattice rects: exact shared edges / corner touches (collinear paths)
    for _ in range(8):
        x0, y0 = rng.randint(-5, 5), rng.randint(-5, 5)
        geoms.append(_rect(x0, y0, x0 + rng.randint(1, 4), y0 + rng.randint(1, 4)))
    # float rects
    for _ in range(6):
        x0, y0 = rng.uniform(-10, 8), rng.uniform(-10, 8)
        geoms.append(_rect(x0, y0, x0 + rng.uniform(0.5, 5), y0 + rng.uniform(0.5, 5)))
    # convex polygons (random hexagons)
    for _ in range(5):
        cx, cy, rr = rng.uniform(-8, 8), rng.uniform(-8, 8), rng.uniform(0.5, 4)
        ang = np.sort(rng.uniform(0, 2 * np.pi, 6))
        pts = ", ".join(
            f"{cx + rr * np.cos(a)} {cy + rr * np.sin(a)}" for a in ang
        )
        first = f"{cx + rr * np.cos(ang[0])} {cy + rr * np.sin(ang[0])}"
        geoms.append(f"POLYGON (({pts}, {first}))")
    # holed rects
    for _ in range(4):
        x0, y0 = rng.uniform(-9, 5), rng.uniform(-9, 5)
        w = rng.uniform(2, 5)
        q = w / 4
        geoms.append(
            f"POLYGON (({x0} {y0}, {x0+w} {y0}, {x0+w} {y0+w}, {x0} {y0+w}, {x0} {y0}), "
            f"({x0+q} {y0+q}, {x0+w-q} {y0+q}, {x0+w-q} {y0+w-q}, {x0+q} {y0+w-q}, {x0+q} {y0+q}))"
        )
    # multipolygons (two disjoint rects)
    for _ in range(3):
        x0, y0 = rng.uniform(-9, 2), rng.uniform(-9, 2)
        r1 = f"(({x0} {y0}, {x0+2} {y0}, {x0+2} {y0+2}, {x0} {y0+2}, {x0} {y0}))"
        r2 = f"(({x0+4} {y0}, {x0+6} {y0}, {x0+6} {y0+2}, {x0+4} {y0+2}, {x0+4} {y0}))"
        geoms.append(f"MULTIPOLYGON ({r1}, {r2})")
    # lines
    for _ in range(5):
        pts = ", ".join(
            f"{rng.uniform(-10, 10)} {rng.uniform(-10, 10)}" for _ in range(4)
        )
        geoms.append(f"LINESTRING ({pts})")
    # points / multipoints, some exactly on lattice corners
    for _ in range(4):
        geoms.append(f"POINT ({rng.randint(-5, 5)} {rng.randint(-5, 5)})")
    for _ in range(3):
        geoms.append(f"POINT ({rng.uniform(-10, 10)} {rng.uniform(-10, 10)})")
    for _ in range(2):
        pts = ", ".join(f"{rng.randint(-5, 5)} {rng.randint(-5, 5)}" for _ in range(3))
        geoms.append(f"MULTIPOINT ({pts})")
    return geoms


def _all_pairs(geoms):
    lws, rws = [], []
    for a in geoms:
        for b in geoms:
            lws.append(a)
            rws.append(b)
    return lws, rws


class TestBatchPredicateParity:
    def test_intersects_matches_scalar(self):
        for seed in (0, 1, 2, 3):
            rng = np.random.RandomState(seed)
            geoms = _soup(rng)
            lws, rws = _all_pairs(geoms)
            got = batch_predicate(lws, rws, "intersects")
            want = np.array(
                [geoms_intersect(parse_wkt(a), parse_wkt(b)) for a, b in zip(lws, rws)]
            )
            bad = np.flatnonzero(got != want)
            assert len(bad) == 0, (
                f"seed={seed}: {len(bad)} mismatches, first: "
                f"{lws[bad[0]]} vs {rws[bad[0]]} got={got[bad[0]]} want={want[bad[0]]}"
            )

    def test_contains_matches_scalar(self):
        for seed in (0, 1, 2):
            rng = np.random.RandomState(seed)
            geoms = _soup(rng)
            lws, rws = _all_pairs(geoms)
            got = batch_predicate(lws, rws, "contains")
            want = np.array(
                [geom_contains(parse_wkt(a), parse_wkt(b)) for a, b in zip(lws, rws)]
            )
            bad = np.flatnonzero(got != want)
            assert len(bad) == 0, (
                f"seed={seed}: {len(bad)} mismatches, first: "
                f"{lws[bad[0]]} contains {rws[bad[0]]} got={got[bad[0]]} want={want[bad[0]]}"
            )

    def test_symmetry_of_intersects(self):
        rng = np.random.RandomState(7)
        geoms = _soup(rng)
        lws, rws = _all_pairs(geoms)
        fwd = batch_predicate(lws, rws, "intersects")
        rev = batch_predicate(rws, lws, "intersects")
        assert (fwd == rev).all()

    def test_rect_rect_is_closed_bbox_overlap(self):
        """For axis-aligned rect pairs the kernel's verdict equals the
        CLOSED bbox-overlap test — the ANSI-expressible form the
        geom_join driver oracle relies on."""
        rng = np.random.RandomState(11)
        rects, boxes = [], []
        for _ in range(30):
            x0, y0 = rng.randint(-6, 6), rng.randint(-6, 6)
            x1, y1 = x0 + rng.randint(1, 5), y0 + rng.randint(1, 5)
            rects.append(_rect(x0, y0, x1, y1))
            boxes.append((x0, y0, x1, y1))
        lws, rws = _all_pairs(rects)
        got = batch_predicate(lws, rws, "intersects")
        k = 0
        for a in boxes:
            for b in boxes:
                want = a[0] <= b[2] and b[0] <= a[2] and a[1] <= b[3] and b[1] <= a[3]
                assert got[k] == want, (a, b)
                k += 1

    def test_rect_rect_contains_is_strict_inside(self):
        rng = np.random.RandomState(13)
        rects, boxes = [], []
        for _ in range(30):
            x0, y0 = rng.randint(-6, 6), rng.randint(-6, 6)
            x1, y1 = x0 + rng.randint(1, 6), y0 + rng.randint(1, 6)
            rects.append(_rect(x0, y0, x1, y1))
            boxes.append((x0, y0, x1, y1))
        lws, rws = _all_pairs(rects)
        got = batch_predicate(lws, rws, "contains")
        k = 0
        for a in boxes:
            for b in boxes:
                want = a[0] < b[0] and b[2] < a[2] and a[1] < b[1] and b[3] < a[3]
                assert got[k] == want, (a, b)
                k += 1

    def test_empty_and_cache_reuse(self):
        assert len(batch_predicate([], [], "intersects")) == 0
        cache: dict = {}
        a = [_rect(0, 0, 2, 2)] * 3
        b = [_rect(1, 1, 3, 3), _rect(5, 5, 6, 6), "POINT (1 1)"]
        r1 = batch_predicate(a, b, "intersects", cache)
        r2 = batch_predicate(a, b, "intersects", cache)
        assert (r1 == r2).all()
        assert list(r1) == [True, False, True]


class TestBatchCovers:
    def test_covers_matches_scalar(self):
        from geomesa_spark.geom import geom_covers

        for seed in (0, 5):
            rng = np.random.RandomState(seed)
            geoms = _soup(rng)
            lws, rws = _all_pairs(geoms)
            got = batch_predicate(lws, rws, "covers")
            want = np.array(
                [geom_covers(parse_wkt(a), parse_wkt(b)) for a, b in zip(lws, rws)]
            )
            bad = np.flatnonzero(got != want)
            assert len(bad) == 0, (
                f"seed={seed}: {len(bad)} mismatches, first: "
                f"{lws[bad[0]]} covers {rws[bad[0]]} got={got[bad[0]]} want={want[bad[0]]}"
            )

    def test_covers_boundary_inclusive(self):
        big = _rect(0, 0, 4, 4)
        # shares the left edge → covered (boundary allowed), not contained
        edge = _rect(0, 1, 2, 3)
        assert batch_predicate([big], [edge], "covers")[0]
        assert not batch_predicate([big], [edge], "contains")[0]
