"""st_* catalog tests mirroring the reference Spark SQL suites
(reference: geomesa-spark/geomesa-spark-sql/src/test/scala/.../sql/
{SparkSQLSpatialRelationshipsTest, SparkSQLGeometricConstructorsTest,
SparkSQLGeometricAccessorsTest, SparkSQLGeometricOutputsTest}.scala —
truth tables over small WKT fixtures)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def sql(spark):
    from geomesa_spark.functions.st import register_st_functions

    register_st_functions(spark)

    def run(expr: str, **geoms):
        cols = ", ".join(f"'{v}' AS {k}" for k, v in geoms.items()) or "1 AS __one"
        return spark.sql(f"SELECT {expr} AS r FROM (SELECT {cols})").collect()[0].r

    return run


BOX = "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"
BOX_SHIFT = "POLYGON ((2 2, 6 2, 6 6, 2 6, 2 2))"
BOX_FAR = "POLYGON ((10 10, 12 10, 12 12, 10 12, 10 10))"
HOLED = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))"


class TestRelations:
    def test_contains_within(self, sql):
        assert sql(f"st_contains('{BOX}', pt)", pt="POINT (1 1)") is True
        assert sql(f"st_contains('{BOX}', pt)", pt="POINT (5 5)") is False
        assert sql(f"st_within(pt, '{BOX}')", pt="POINT (1 1)") is True

    def test_contains_hole(self, sql):
        assert sql(f"st_contains('{HOLED}', pt)", pt="POINT (5 5)") is False
        assert sql(f"st_contains('{HOLED}', pt)", pt="POINT (2 2)") is True

    def test_intersects_disjoint(self, sql):
        assert sql(f"st_intersects('{BOX}', '{BOX_SHIFT}')") is True
        assert sql(f"st_disjoint('{BOX}', '{BOX_FAR}')") is True
        assert sql(f"st_intersects(line, '{BOX}')", line="LINESTRING (-1 -1, 5 5)") is True
        assert sql(f"st_intersects(line, '{BOX}')", line="LINESTRING (8 8, 9 9)") is False

    def test_equals_overlaps(self, sql):
        assert sql(f"st_equals('{BOX}', '{BOX}')") is True
        assert sql(f"st_overlaps('{BOX}', '{BOX_SHIFT}')") is True
        assert sql(f"st_overlaps('{BOX}', '{BOX_FAR}')") is False

    def test_polygon_in_polygon(self, sql):
        inner = "POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))"
        assert sql(f"st_contains('{BOX}', '{inner}')") is True
        assert sql(f"st_contains('{inner}', '{BOX}')") is False

    def test_null_first_operand_all_point_batch(self, spark):
        """ADVICE round-1: NULL geometry must yield NULL (not false)
        even on an all-points batch where the grouped fast path runs."""
        df = spark.createDataFrame(
            [(None, "POINT (1 1)"), (BOX, "POINT (1 1)"), (BOX, "POINT (9 9)")],
            "g string, p string",
        )
        rows = df.select(F.expr("st_contains(g, p)").alias("r")).collect()
        assert [r.r for r in rows] == [None, True, False]


class TestMeasures:
    def test_area_with_hole(self, sql):
        assert sql(f"st_area('{HOLED}')") == 96.0

    def test_length_perimeter(self, sql):
        assert sql("st_length(l)", l="LINESTRING (0 0, 3 4)") == 5.0
        assert sql(f"st_length('{BOX}')") == 16.0

    def test_centroid(self, sql):
        assert sql(f"st_centroid('{BOX}')") == "POINT (2.0 2.0)"

    def test_distance(self, sql):
        assert sql(f"st_distance(pt, '{BOX}')", pt="POINT (7 0)") == 3.0
        assert sql(f"st_distance(pt, '{BOX}')", pt="POINT (2 2)") == 0.0

    def test_distance_sphere_points(self, sql):
        # one degree of longitude at the equator ≈ 111.195 km
        d = sql("st_distanceSphere(a, b)", a="POINT (0 0)", b="POINT (1 0)")
        assert abs(d - 111195.0) < 200.0


class TestConstructorsAccessors:
    def test_point_xy(self, sql):
        assert sql("st_x(st_point(1.5, 2.5))") == 1.5
        assert sql("st_y(st_point(1.5, 2.5))") == 2.5

    def test_bbox_and_type(self, sql):
        assert sql("st_geometryType(st_makeBBOX(0.0, 0.0, 2.0, 2.0))") == "ST_Polygon"
        assert sql("st_area(st_makeBBOX(0.0, 0.0, 2.0, 2.0))") == 4.0

    def test_make_line(self, sql):
        got = sql("st_makeLine(array(st_point(0.0, 0.0), st_point(1.0, 1.0)))")
        assert got == "LINESTRING (0.0 0.0, 1.0 1.0)"

    def test_accessors(self, sql):
        assert sql(f"st_numPoints('{BOX}')") == 5
        assert sql(f"st_dimension('{BOX}')") == 2
        assert sql("st_isClosed(l)", l="LINESTRING (0 0, 1 1, 0 0)") is True
        assert sql(f"st_envelope(l)", l="LINESTRING (0 0, 3 4)") == (
            "POLYGON ((0.0 0.0, 3.0 0.0, 3.0 4.0, 0.0 4.0, 0.0 0.0))"
        )

    def test_casts(self, sql):
        assert sql(f"st_castToPolygon('{BOX}')") == BOX
        assert sql(f"st_castToPoint('{BOX}')") is None


class TestOutputs:
    def test_wkb_roundtrip(self, sql):
        for w in (BOX, HOLED, "POINT (1.5 -2.25)", "LINESTRING (0 0, 1 2, 3 4)"):
            got = sql(f"st_geomFromWKB(st_asBinary('{w}'))")
            norm = lambda s: s.replace(".0 ", " ").replace(".0)", ")").replace(".0,", ",")  # noqa: E731
            assert norm(got) == norm(w)

    def test_geojson(self, sql):
        gj = json.loads(sql("st_asGeoJSON(p)", p="POINT (1 2)"))
        assert gj == {"type": "Point", "coordinates": [1.0, 2.0]}

    def test_geohash_roundtrip(self, sql):
        gh = sql("st_geoHash(st_point(-0.1, 51.5), 40)")
        back = sql(f"st_pointFromGeoHash('{gh}')")
        from geomesa_spark.geom import parse_wkt

        pt = parse_wkt(back).rings[0][0]
        assert abs(pt[0] - -0.1) < 0.01 and abs(pt[1] - 51.5) < 0.01


class TestProcessing:
    def test_translate(self, sql):
        assert sql("st_translate(p, 1.0, 2.0)", p="POINT (1 1)") == "POINT (2 3)"

    def test_buffer_point_contains(self, sql):
        # 10km buffer around a point contains a point 5km east
        buf = sql("st_bufferPoint(st_point(0.0, 0.0), 10000.0)")
        assert sql(f"st_contains('{buf}', pt)", pt="POINT (0.045 0)") is True
        assert sql(f"st_contains('{buf}', pt)", pt="POINT (0.2 0)") is False

    def test_convex_hull(self, sql):
        hull = sql("st_convexHull(m)", m="MULTIPOINT (0 0, 2 0, 1 1, 2 2, 0 2)")
        assert sql(f"st_area('{hull}')") == 4.0

    def test_intersection_convex(self, sql):
        got = sql(f"st_intersection('{BOX}', '{BOX_SHIFT}')")
        assert sql(f"st_area('{got}')") == 4.0

    def test_antimeridian(self, sql):
        assert sql("st_antimeridianSafeGeom(p)", p="POINT (190 10)") == "POINT (-170 10)"
        # upstream catalog alias
        assert sql("st_idlSafeGeom(p)", p="POINT (190 10)") == "POINT (-170 10)"

    def test_intersection_concave(self, sql):
        # L-shape ∩ square exercises the Greiner–Hormann path (the old
        # convex-only Sutherland–Hodgman clip would overcount)
        ell = "POLYGON ((0 0, 6 0, 6 2, 2 2, 2 6, 0 6, 0 0))"
        got = sql(f"st_intersection('{ell}', q)", q="POLYGON ((1 1, 5 1, 5 5, 1 5, 1 1))")
        assert sql(f"st_area('{got}')") == pytest.approx(7.0)

    def test_difference(self, sql):
        got = sql(f"st_difference('{BOX}', '{BOX_SHIFT}')")
        assert sql(f"st_area('{got}')") == pytest.approx(12.0)
        # fully-contained clip punches a hole
        holed = sql(f"st_difference('{BOX}', q)", q="POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))")
        assert sql(f"st_area('{holed}')") == pytest.approx(15.0)
        # disjoint clip leaves the subject untouched
        assert sql(f"st_area(st_difference('{BOX}', '{BOX_FAR}'))") == pytest.approx(16.0)
        # subject inside clip → empty (NULL)
        assert sql(f"st_difference(q, '{BOX}')", q="POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))") is None
        # ASYMMETRIC case (regression: the GH flag flip once computed
        # B−A; square−square cases are symmetric and missed it)
        ell = "POLYGON ((0 0, 6 0, 6 2, 2 2, 2 6, 0 6, 0 0))"  # area 20
        sq = "POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))"  # area 4, overlap 3
        assert sql(f"st_area(st_difference('{ell}', '{sq}'))") == pytest.approx(17.0)
        assert sql(f"st_area(st_difference('{sq}', '{ell}'))") == pytest.approx(1.0)

    def test_intersection_points(self, sql):
        got = sql(f"st_intersection(m, '{BOX}')", m="MULTIPOINT (1 1, 9 9)")
        assert got == "POINT (1 1)"


class TestRelate:
    def test_point_polygon_matrices(self, sql):
        assert sql(f"st_relate(p, '{BOX}')", p="POINT (1 1)") == "0FFFFF212"
        assert sql(f"st_relate(p, '{BOX}')", p="POINT (4 2)") == "F0FFFF212"
        assert sql(f"st_relate(p, '{BOX}')", p="POINT (9 9)") == "FF0FFF212"
        # transposed argument order transposes the matrix
        assert sql(f"st_relate('{BOX}', p)", p="POINT (1 1)") == "0F2FF1FF2"

    def test_polygon_polygon_matrices(self, sql):
        assert sql(f"st_relate('{BOX}', '{BOX}')") == "2FFF1FFF2"
        assert sql(f"st_relate('{BOX}', '{BOX_FAR}')") == "FF2FF1212"
        assert sql(f"st_relate('{BOX}', '{BOX_SHIFT}')") == "212101212"
        inner = "POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))"
        assert sql(f"st_relate('{BOX}', '{inner}')") == "212FF1FF2"
        assert sql(f"st_relate('{inner}', '{BOX}')") == "2FF1FF212"

    def test_line_line_matrices(self, sql):
        assert sql("st_relate(a, b)", a="LINESTRING (0 0, 2 2)", b="LINESTRING (0 2, 2 0)") == "0F1FF0102"
        assert sql("st_relate(a, b)", a="LINESTRING (0 0, 1 1)", b="LINESTRING (5 5, 6 6)") == "FF1FF0102"

    def test_relate_bool_patterns(self, sql):
        # JTS intersects ≡ relate T********|*T*******|***T*****|****T****
        assert sql(f"st_relateBool('{BOX}', '{BOX_SHIFT}', 'T********')") is True
        assert sql(f"st_relateBool('{BOX}', '{BOX_FAR}', 'T********')") is False
        # contains pattern
        inner = "POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))"
        assert sql(f"st_relateBool('{BOX}', '{inner}', 'T*****FF*')") is True


class TestCoversSimpleN:
    def test_covers_boundary_inclusive(self, sql):
        assert sql(f"st_covers('{BOX}', p)", p="POINT (4 2)") is True   # on edge
        assert sql(f"st_contains('{BOX}', p)", p="POINT (4 2)") is False  # half-open kernel
        assert sql(f"st_covers('{BOX}', p)", p="POINT (1 1)") is True
        assert sql(f"st_covers('{BOX}', p)", p="POINT (9 9)") is False

    def test_is_simple(self, sql):
        assert sql("st_isSimple(l)", l="LINESTRING (0 0, 2 2, 4 0)") is True
        assert sql("st_isSimple(l)", l="LINESTRING (0 0, 2 2, 0 2, 2 0)") is False
        assert sql(f"st_isSimple('{BOX}')") is True

    def test_geometry_n(self, sql):
        mp = "MULTIPOINT (1 1, 2 2, 3 3)"
        assert sql(f"st_geometryN('{mp}', 2)") == "POINT (2 2)"
        ml = "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))"
        assert sql(f"st_geometryN('{ml}', 1)") == "LINESTRING (0 0, 1 1)"
        assert sql(f"st_geometryN('{BOX}', 1)") == BOX
        assert sql(f"st_geometryN('{mp}', 9)") is None

    def test_geometry_collection(self, sql):
        gc = "GEOMETRYCOLLECTION (POINT (1 2), LINESTRING (0 0, 1 1))"
        assert sql(f"st_numGeometries('{gc}')") == 2
        assert sql(f"st_geometryN('{gc}', 1)") == "POINT (1 2)"
        assert sql(f"st_geometryN('{gc}', 2)") == "LINESTRING (0 0, 1 1)"


class TestSpheroid:
    def test_vincenty_known_values(self):
        import numpy as np

        from geomesa_spark.geom import vincenty_m

        # published WGS84 geodesics
        assert float(vincenty_m(np.array([0.0]), np.array([0.0]),
                                np.array([1.0]), np.array([0.0]))[0]) == pytest.approx(111319.491, abs=0.01)
        assert float(vincenty_m(np.array([0.0]), np.array([0.0]),
                                np.array([0.0]), np.array([1.0]))[0]) == pytest.approx(110574.389, abs=0.01)
        # Vincenty's own test line (Flinders Peak -> Buninyong): 54972.271 m
        assert float(vincenty_m(np.array([144.42486788888888]), np.array([-37.95103341666667]),
                                np.array([143.92649552777777]), np.array([-37.65282113888889]))[0]
                     ) == pytest.approx(54972.271, abs=0.01)

    def test_spheroid_vs_sphere_sql(self, sql):
        d_sph = sql("st_distanceSphere(a, b)", a="POINT (0 0)", b="POINT (0 1)")
        d_ell = sql("st_distanceSpheroid(a, b)", a="POINT (0 0)", b="POINT (0 1)")
        assert d_ell == pytest.approx(110574.389, abs=0.01)
        assert d_ell != d_sph  # no longer an alias
        assert abs(d_ell - d_sph) < 1000

    def test_length_spheroid(self, sql):
        # one-degree equatorial segment
        got = sql("st_lengthSpheroid(l)", l="LINESTRING (0 0, 1 0)")
        assert got == pytest.approx(111319.491, abs=0.01)


class TestSimplify:
    def test_simplify_line_and_ring(self, spark):
        from geomesa_spark.functions.st import register_st_functions

        register_st_functions(spark)
        df = spark.createDataFrame(
            [
                ("line", "LINESTRING (0 0, 1 0.01, 2 -0.01, 3 0.02, 4 0)", 0.1),
                ("keep", "LINESTRING (0 0, 1 1, 2 0, 3 1, 4 0)", 0.5),
                ("ring", "POLYGON ((0 0, 5 0.01, 10 0, 10 10, 0 10, 0 0))", 0.1),
                ("pt", "POINT (3 4)", 1.0),
            ],
            "name string, wkt string, tol double",
        )
        got = {
            r.name: r.s
            for r in spark.sql(
                "SELECT name, st_simplify(wkt, tol) AS s FROM {df}", df=df
            ).collect()
        }
        assert got["line"] == "LINESTRING (0 0, 4 0)"
        # every vertex exceeds tolerance: nothing dropped
        assert got["keep"] == "LINESTRING (0 0, 1 1, 2 0, 3 1, 4 0)"
        # the near-collinear edge vertex goes; ring stays closed
        assert got["ring"] == "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"
        assert got["pt"] == "POINT (3 4)"

    def test_simplify_ring_minimum(self, spark):
        """Over-aggressive tolerance must not emit a degenerate ring:
        the bbox-corner fallback keeps a valid closed POLYGON."""
        from geomesa_spark.functions.st import st_simplify
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            [("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))",)], "wkt string"
        )
        out = df.select(st_simplify("wkt", F.lit(100.0)).alias("s")).first().s
        assert out.startswith("POLYGON ((") and out.count(",") >= 3
        # first == last vertex (closed)
        body = out[len("POLYGON (("):-2].split(", ")
        assert body[0] == body[-1]
