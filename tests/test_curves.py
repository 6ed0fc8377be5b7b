"""Curve unit tests — mirrors the reference's curve specs
(geomesa-z3/src/test/scala/.../curve/{Z2SFCTest,Z3SFCTest,XZ2SFCTest,
BinnedTimeTest}.scala and zorder/sfcurve/{Z2Spec,Z3Spec,ZRangeTest}):
round-trip within curve resolution, known corner vectors, interleave
identity, and cover-containment of ``ranges``.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from geomesa_spark.curves import (
    BinnedTime,
    XZ2SFC,
    Z2SFC,
    Z3SFC,
    compact1by1,
    compact1by2,
    part1by1,
    part1by2,
)

rng = np.random.default_rng(42)


class TestBitInterleave:
    def test_part1by1_roundtrip(self):
        x = rng.integers(0, 1 << 31, size=10000, dtype=np.uint64)
        assert np.array_equal(compact1by1(part1by1(x)), x)

    def test_part1by2_roundtrip(self):
        x = rng.integers(0, 1 << 21, size=10000, dtype=np.uint64)
        assert np.array_equal(compact1by2(part1by2(x)), x)

    def test_known_vectors(self):
        assert int(part1by1(np.uint64(0b1))) == 0b1
        assert int(part1by1(np.uint64(0b11))) == 0b101
        assert int(part1by1(np.uint64(0b111))) == 0b10101
        assert int(part1by2(np.uint64(0b11))) == 0b1001

    def test_interleave_identity(self):
        # z2(x, y) == part1by1(x) | part1by1(y) << 1 bit for bit
        sfc = Z2SFC()
        lon, lat = 12.34, -56.78
        xn = sfc.lon.normalize(lon)
        yn = sfc.lat.normalize(lat)
        expected = int(part1by1(np.uint64(xn))) | (int(part1by1(np.uint64(yn))) << 1)
        assert int(sfc.index(lon, lat)) == expected


class TestZ2:
    sfc = Z2SFC()

    def test_corners(self):
        assert int(self.sfc.index(-180.0, -90.0)) == 0
        assert int(self.sfc.index(180.0, 90.0)) == (1 << 62) - 1

    def test_roundtrip_within_resolution(self):
        lon = rng.uniform(-180, 180, 20000)
        lat = rng.uniform(-90, 90, 20000)
        z = self.sfc.index(lon, lat)
        lon2, lat2 = self.sfc.invert(z)
        assert np.max(np.abs(lon2 - lon)) <= 360.0 / (1 << 31)
        assert np.max(np.abs(lat2 - lat)) <= 180.0 / (1 << 31)

    def test_monotone_in_each_dim(self):
        # fixing one dim, z increases with the other's normalized value
        z1 = self.sfc.index(10.0, 20.0)
        z2 = self.sfc.index(10.0, 20.0001)
        assert int(z2) > int(z1)

    def test_ranges_cover_all_inside_points(self):
        bbox = (-10.0, -5.0, 25.0, 30.0)
        lon = rng.uniform(bbox[0], bbox[2], 5000)
        lat = rng.uniform(bbox[1], bbox[3], 5000)
        z = self.sfc.index(lon, lat).astype(object)
        ranges = self.sfc.ranges([bbox], max_ranges=500)
        assert ranges
        covered = np.zeros(len(lon), dtype=bool)
        for lo, hi in ranges:
            covered |= (z >= lo) & (z <= hi)
        assert covered.all()

    def test_ranges_prune_far_points(self):
        bbox = (-10.0, -5.0, 25.0, 30.0)
        ranges = self.sfc.ranges([bbox], max_ranges=500)
        # a sample of far-away points should mostly fall outside the cover
        lon = rng.uniform(100, 170, 2000)
        lat = rng.uniform(-80, -40, 2000)
        z = self.sfc.index(lon, lat).astype(object)
        covered = np.zeros(len(lon), dtype=bool)
        for lo, hi in ranges:
            covered |= (z >= lo) & (z <= hi)
        assert covered.sum() == 0

    def test_ranges_multiple_boxes_merge(self):
        r = self.sfc.ranges([(-10, -10, 0, 0), (-5, -5, 5, 5)], max_ranges=400)
        # merged, sorted, non-overlapping
        for (l0, h0), (l1, h1) in zip(r, r[1:]):
            assert h0 < l1 - 1 or h0 < l1  # strictly increasing, gap >= 1


class TestZ3:
    sfc = Z3SFC()
    bt = BinnedTime("week")

    def test_roundtrip(self):
        lon = rng.uniform(-180, 180, 5000)
        lat = rng.uniform(-90, 90, 5000)
        t = rng.integers(0, Z3SFC.WEEK_MILLIS, 5000)
        z = self.sfc.index(lon, lat, t)
        lon2, lat2, t2 = self.sfc.invert(z)
        assert np.max(np.abs(lon2 - lon)) <= 360.0 / (1 << 21)
        assert np.max(np.abs(lat2 - lat)) <= 180.0 / (1 << 21)
        assert np.max(np.abs(t2 - t)) <= Z3SFC.WEEK_MILLIS / (1 << 21)

    def test_corner(self):
        assert int(self.sfc.index(-180.0, -90.0, 0)) == 0
        assert int(self.sfc.index(180.0, 90.0, Z3SFC.WEEK_MILLIS)) == (1 << 63) - 1

    def test_ranges_cover(self):
        bbox = (0.0, 0.0, 10.0, 10.0)
        tlo, thi = 0, 3600_000
        lon = rng.uniform(0, 10, 2000)
        lat = rng.uniform(0, 10, 2000)
        t = rng.integers(0, 3600_000, 2000)
        z = self.sfc.index(lon, lat, t).astype(object)
        ranges = self.sfc.ranges([bbox], [(tlo, thi)], max_ranges=800)
        covered = np.zeros(len(lon), dtype=bool)
        for lo, hi in ranges:
            covered |= (z >= lo) & (z <= hi)
        assert covered.all()


class TestBinnedTime:
    def test_roundtrip_exact(self):
        bt = BinnedTime("week")
        millis = rng.integers(0, 2**41, 10000)
        bins, offs = bt.to_bin(millis)
        assert np.array_equal(bt.from_bin(bins, offs), millis)
        assert (offs >= 0).all() and (offs < bt.period_millis).all()

    def test_week_bin_is_epoch_floor(self):
        bt = BinnedTime("week")
        b, o = bt.to_bin(604800000 * 5 + 123)
        assert int(b) == 5 and int(o) == 123

    def test_bad_period(self):
        with pytest.raises(ValueError):
            BinnedTime("fortnight")


class TestXZ2:
    sfc = XZ2SFC(g=12)

    def test_point_box_gets_max_level(self):
        # a degenerate (point) box indexes at resolution g
        cs = int(self.sfc.index(10.0, 10.0, 10.0, 10.0))
        total = (4 ** (self.sfc.g + 1) - 1) // 3
        assert 0 <= cs < total

    def test_one_key_per_geometry(self):
        # vectorized batch: one code per input box
        xmin = rng.uniform(-170, 160, 500)
        ymin = rng.uniform(-80, 70, 500)
        w = rng.uniform(0.001, 5.0, 500)
        h = rng.uniform(0.001, 5.0, 500)
        codes = self.sfc.index(xmin, ymin, xmin + w, ymin + h)
        assert codes.shape == (500,)
        assert (codes >= 0).all()

    def test_cover_superset_of_intersecting(self):
        """Every geometry bbox intersecting the query must land in the
        cover — the XZ guarantee that replaces key duplication."""
        q = (-20.0, -20.0, 20.0, 20.0)
        xmin = rng.uniform(-60, 50, 2000)
        ymin = rng.uniform(-60, 50, 2000)
        w = rng.uniform(0.01, 10.0, 2000)
        h = rng.uniform(0.01, 10.0, 2000)
        xmax, ymax = xmin + w, ymin + h
        codes = self.sfc.index(xmin, ymin, xmax, ymax)
        intersects = (xmin <= q[2]) & (xmax >= q[0]) & (ymin <= q[3]) & (ymax >= q[1])
        ranges = self.sfc.ranges([q])
        covered = np.zeros(len(codes), dtype=bool)
        for lo, hi in ranges:
            covered |= (codes >= lo) & (codes <= hi)
        assert covered[intersects].all()
        # and the cover actually prunes: most non-intersecting far boxes excluded
        far = (xmin > 45) | (ymin > 45) | (xmax < -45) | (ymax < -45)
        if far.any():
            assert covered[far].mean() < 0.5

    def test_enlarged_cell_contains_box(self):
        # the defining invariant: the level-l cell containing (xmin,ymin),
        # doubled, contains the whole normalized box
        for _ in range(200):
            x0 = float(rng.uniform(-170, 150))
            y0 = float(rng.uniform(-80, 70))
            bw = float(rng.uniform(0.001, 20))
            bh = float(rng.uniform(0.001, 20))
            nx0, ny0, nx1, ny1 = self.sfc._norm(x0, y0, x0 + bw, y0 + bh)
            length = self.sfc._length(float(nx0), float(ny0), float(nx1), float(ny1))
            cw = 0.5**length
            cx = np.floor(nx0 / cw) * cw
            cy = np.floor(ny0 / cw) * cw
            assert cx + 2 * cw >= nx1 - 1e-12
            assert cy + 2 * cw >= ny1 - 1e-12


class TestHexGrid:
    def test_nearest_center_property(self, spark):
        """Cube rounding must assign each point to the hexagon whose
        center is Euclidean-nearest (hex Voronoi property)."""
        import math

        import numpy as np

        from geomesa_spark.curves.hexgrid import hex_qr

        s = 5.0
        rng = np.random.RandomState(3)
        pts = [(float(x), float(y)) for x, y in zip(
            rng.uniform(-170, 170, 300), rng.uniform(-80, 80, 300))]
        df = spark.createDataFrame(pts, "lon double, lat double")
        q, r = hex_qr(df.lon, df.lat, s)
        rows = df.select("lon", "lat", q.alias("q"), r.alias("r")).collect()

        def center(qq, rr):
            return 1.5 * s * qq, math.sqrt(3.0) * (rr + qq / 2.0) * s

        for row in rows:
            cx, cy = center(row["q"], row["r"])
            d0 = (row["lon"] - cx) ** 2 + (row["lat"] - cy) ** 2
            for dq in range(-2, 3):
                for dr in range(-2, 3):
                    ox, oy = center(row["q"] + dq, row["r"] + dr)
                    d = (row["lon"] - ox) ** 2 + (row["lat"] - oy) ** 2
                    assert d0 <= d + 1e-9, (row, dq, dr, d0, d)

    def test_center_roundtrip_and_neighbors(self, spark):
        from pyspark.sql import functions as F

        from geomesa_spark.curves.hexgrid import (
            HEX_MOD, HEX_OFF, hex_cell, hex_center, hex_neighbors, hex_qr,
        )

        s = 2.0
        cells = spark.createDataFrame(
            [(q, r) for q in range(-3, 4) for r in range(-3, 4)], "q long, r long"
        )
        lon, lat = hex_center(F.col("q"), F.col("r"), s)
        back = cells.select("q", "r", lon.alias("lon"), lat.alias("lat"))
        q2, r2 = hex_qr(F.col("lon"), F.col("lat"), s)
        chk = back.select("q", "r", q2.alias("q2"), r2.alias("r2")).collect()
        assert all(c["q"] == c["q2"] and c["r"] == c["r2"] for c in chk)

        one = spark.range(1).select(hex_cell(F.lit(10.0), F.lit(20.0), s).alias("c"))
        ring1 = one.select(F.size(hex_neighbors(F.col("c"), 1)).alias("n")).collect()[0]["n"]
        ring2 = one.select(F.size(hex_neighbors(F.col("c"), 2)).alias("n")).collect()[0]["n"]
        assert ring1 == 7 and ring2 == 19  # 1 + 3k(k+1)
        # packed id decodes back to axial
        c = one.collect()[0]["c"]
        q, r = divmod(c, HEX_MOD)
        assert abs(q - HEX_OFF) < HEX_OFF and abs(r - HEX_OFF) < HEX_OFF


class TestGeohash:
    def test_codegen_matches_scalar_kernel(self, spark):
        """geohash_col (pure column expressions) agrees with the scalar
        bisection kernel geom.geohash_encode away from cell edges —
        random points, several precisions."""
        import random

        from geomesa_spark.curves.geohash import geohash_col
        from geomesa_spark.geom import geohash_encode

        rng = random.Random(42)
        pts = [
            (rng.uniform(-179.99, 179.99), rng.uniform(-89.99, 89.99))
            for _ in range(300)
        ]
        df = spark.createDataFrame(pts, "lon double, lat double")
        for prec in (1, 4, 8, 12):
            got = (
                df.select("lon", "lat", geohash_col(F.col("lon"), F.col("lat"), prec).alias("gh"))
                .collect()
            )
            for r in got:
                assert r["gh"] == geohash_encode(r["lon"], r["lat"], prec), (
                    r["lon"], r["lat"], prec,
                )

    def test_decode_roundtrip(self, spark):
        """decode(encode(p)) cell center re-encodes to the same hash."""
        import random

        from geomesa_spark.curves.geohash import geohash_col
        from geomesa_spark.geom import geohash_decode, geohash_encode

        rng = random.Random(7)
        for _ in range(100):
            lon, lat = rng.uniform(-180, 180), rng.uniform(-90, 90)
            gh = geohash_encode(lon, lat, 8)
            clon, clat = geohash_decode(gh)
            assert geohash_encode(clon, clat, 8) == gh

    def test_known_values(self, spark):
        from geomesa_spark.curves.geohash import geohash_col

        # canonical test vector: ezs42 ≈ (-5.6, 42.6)
        df = spark.createDataFrame([(-5.60302734375, 42.60498046875)], "lon double, lat double")
        got = df.select(geohash_col(F.col("lon"), F.col("lat"), 5).alias("gh")).collect()
        assert got[0]["gh"] == "ezs42"
