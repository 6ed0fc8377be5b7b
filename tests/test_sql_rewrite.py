"""SQL-text spatial rewrite (plans/sql_rewrite.py): plan shape, result
parity with both the unrewritten SQL and the Python-API operators, and
the antimeridian wrap in the shared cover machinery.

Reference test analogue: geomesa-spark-sql
SparkSQLSpatialRelationshipsTest (same queries through the SQL surface
must match the programmatic API row-for-row)."""

import pytest
from pyspark.sql import functions as F

from geomesa_spark.functions.st import register_st_functions
from geomesa_spark.operators.joins import distance_join, spatial_join_points_in_polys
from geomesa_spark.plans.sql_rewrite import rewrite_spatial_sql, spatial_sql
from geomesa_spark.tables import poly_layers, query_points, synthesize_documents


@pytest.fixture(scope="module")
def geo_views(spark):
    from geomesa_spark.operators.extract import extract_geo_points

    register_st_functions(spark)
    pts = extract_geo_points(synthesize_documents(spark, 3000)).cache()
    polys = poly_layers(spark, 300).cache()
    pts.createOrReplaceTempView("rw_pts")
    polys.createOrReplaceTempView("rw_polys")
    query_points(spark, 2000).createOrReplaceTempView("rw_probes")
    yield {"pts": pts, "polys": polys}
    pts.unpersist()
    polys.unpersist()


PIP_SQL = """
SELECT p.doc_id, p.span_offset, q.poly_id
FROM rw_pts p JOIN rw_polys q
  ON st_contains(q.wkt, st_point(p.lon, p.lat))
"""


class TestPipRewrite:
    def test_plan_is_hash_join(self, spark, geo_views):
        df = spatial_sql(spark, PIP_SQL)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_rows_match_unrewritten(self, spark, geo_views):
        fast = set(map(tuple, spatial_sql(spark, PIP_SQL).collect()))
        slow = set(map(tuple, spark.sql(PIP_SQL).collect()))
        assert fast == slow
        assert len(fast) > 0

    def test_within_point_first(self, spark, geo_views):
        sql = """
        SELECT p.doc_id, p.span_offset, q.poly_id
        FROM rw_pts p JOIN rw_polys q
          ON st_within(st_point(p.lon, p.lat), q.wkt)
        """
        rewritten = rewrite_spatial_sql(sql, spark)
        assert "__cell" in rewritten
        fast = set(map(tuple, spatial_sql(spark, sql).collect()))
        slow = set(map(tuple, spark.sql(sql).collect()))
        assert fast == slow

    def test_envelope_from_wkt_when_missing(self, spark, geo_views):
        geo_views["polys"].select("poly_id", "kind", "wkt").createOrReplaceTempView(
            "rw_polys_nake"
        )
        sql = PIP_SQL.replace("rw_polys", "rw_polys_nake")
        rewritten = rewrite_spatial_sql(sql, spark)
        assert "st_xmin" in rewritten
        fast = set(map(tuple, spatial_sql(spark, sql).collect()))
        slow = set(map(tuple, spark.sql(sql).collect()))
        assert fast == slow

    def test_unsupported_passthrough(self, spark):
        sql = "SELECT 1 AS one"
        assert rewrite_spatial_sql(sql, spark) == sql


class TestDwithinRewrite:
    def test_rows_match_operator(self, spark, geo_views):
        sql = """
        SELECT q.q_id, p.doc_id, p.span_offset
        FROM rw_pts p JOIN rw_probes q
          ON st_distanceSphere(st_point(p.lon, p.lat), st_point(q.lon, q.lat)) <= q.radius_m
        """
        rewritten = rewrite_spatial_sql(sql, spark)
        assert "__cell" in rewritten
        fast = spatial_sql(spark, sql)
        plan = fast._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" not in plan
        got = set(map(tuple, fast.collect()))
        ref = set(
            map(
                tuple,
                distance_join(geo_views["pts"], query_points(spark, 2000), bits=6)
                .select("q_id", "doc_id", "span_offset")
                .collect(),
            )
        )
        assert len(got) > 0
        assert got == ref


class TestDwithinFunctionForm:
    def test_st_dwithin_join_rewrites(self, spark, geo_views):
        sql = """
        SELECT q.q_id, p.doc_id, p.span_offset
        FROM rw_pts p JOIN rw_probes q
          ON st_dwithin(st_point(p.lon, p.lat), st_point(q.lon, q.lat), q.radius_m)
        """
        rewritten = rewrite_spatial_sql(sql, spark)
        assert "__cell" in rewritten
        got = set(map(tuple, spatial_sql(spark, sql).collect()))
        ref = set(
            map(
                tuple,
                distance_join(geo_views["pts"], query_points(spark, 2000), bits=6)
                .select("q_id", "doc_id", "span_offset")
                .collect(),
            )
        )
        assert got == ref and len(got) > 0


class TestLiteralFilterRewrite:
    def test_bbox_conjuncts_added(self, spark, geo_views):
        sql = (
            "SELECT doc_id FROM rw_pts WHERE st_contains("
            "'POLYGON ((-150 -40, -50 -40, -50 40, -150 40, -150 -40))', "
            "st_point(lon, lat))"
        )
        rewritten = rewrite_spatial_sql(sql, spark)
        assert "lon >= -150.0D" in rewritten and "lat <= 40.0D" in rewritten
        fast = set(r[0] for r in spatial_sql(spark, sql).collect())
        slow = set(r[0] for r in spark.sql(sql).collect())
        assert fast == slow and len(fast) > 0

    def test_dwithin_literal_filter(self, spark, geo_views):
        sql = (
            "SELECT doc_id FROM rw_pts WHERE st_distanceSphere("
            "st_point(lon, lat), st_point(0.0, 0.0)) <= 2000000.0"
        )
        rewritten = rewrite_spatial_sql(sql, spark)
        assert "lon >=" in rewritten and "st_distanceSphere" in rewritten
        fast = set(r[0] for r in spatial_sql(spark, sql).collect())
        slow = set(r[0] for r in spark.sql(sql).collect())
        assert fast == slow and len(fast) > 0

    def test_dwithin_literal_near_dateline_untouched(self, spark):
        sql = (
            "SELECT 1 FROM rw_pts WHERE st_distanceSphere("
            "st_point(lon, lat), st_point(-179.9, 0.0)) <= 300000.0"
        )
        assert rewrite_spatial_sql(sql, spark) == sql


class TestDensifyTrack:
    def test_segments_bounded_and_endpoints_kept(self, spark):
        from geomesa_spark.operators.joins import densify_track

        tube = spark.createDataFrame(
            [
                ("t0", 0, 0.0, 0.0, "2024-01-01 00:00:00"),
                ("t0", 1, 10.0, 0.0, "2024-01-01 01:00:00"),
                ("t0", 2, 10.0, 5.0, "2024-01-01 01:30:00"),
            ],
            "tube_id string, vertex_id int, lon double, lat double, dtg string",
        ).withColumn("dtg", F.to_timestamp("dtg"))
        out = densify_track(tube, max_seg_s=600).orderBy("dtg").collect()
        # 1h gap → 6 segments, 30m gap → 3, plus the final vertex
        assert len(out) == 6 + 3 + 1
        secs = [r["dtg"].timestamp() for r in out]
        gaps = [b - a for a, b in zip(secs, secs[1:])]
        assert max(gaps) <= 600
        assert out[0]["lon"] == 0.0 and out[-1]["lon"] == 10.0 and out[-1]["lat"] == 5.0
        # interpolated positions lie on the segment
        mid = out[3]
        assert mid["lat"] == 0.0 and 0.0 < mid["lon"] < 10.0


class TestGeomGeomJoin:
    def test_matches_brute_force(self, spark):
        """Layer×layer intersects join equals the NumPy brute force."""
        from geomesa_spark.geom import geoms_intersect, parse_wkt
        from geomesa_spark.operators.joins import spatial_join_geoms

        a = poly_layers(spark, 60).withColumnRenamed("poly_id", "left_id")
        b = (
            poly_layers(spark, 90)
            .where(F.col("poly_id").substr(6, 6).cast("int") >= 30)
            .withColumnRenamed("poly_id", "right_id")
        )
        got = {
            (r["left_id"], r["right_id"])
            for r in spatial_join_geoms(a, b, bits=5).collect()
        }
        rows_a = a.collect()
        rows_b = b.collect()
        want = {
            (ra["left_id"], rb["right_id"])
            for ra in rows_a
            for rb in rows_b
            if geoms_intersect(parse_wkt(ra["wkt"]), parse_wkt(rb["wkt"]))
        }
        assert got == want and len(want) > 0

    def test_contains_predicate(self, spark):
        from geomesa_spark.operators.joins import spatial_join_geoms

        big = spark.createDataFrame(
            [("B", "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))", 0.0, 0.0, 10.0, 10.0)],
            "left_id string, wkt string, min_lon double, min_lat double, max_lon double, max_lat double",
        )
        small = spark.createDataFrame(
            [
                ("in", "POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))", 1.0, 1.0, 2.0, 2.0),
                ("out", "POLYGON ((20 20, 21 20, 21 21, 20 21, 20 20))", 20.0, 20.0, 21.0, 21.0),
            ],
            "right_id string, wkt string, min_lon double, min_lat double, max_lon double, max_lat double",
        )
        got = {r["right_id"] for r in spatial_join_geoms(big, small, bits=4, predicate="contains").collect()}
        assert got == {"in"}


class TestAntimeridianWrap:
    """ADVICE round-1: cover ranges must wrap at ±180, not clamp."""

    def _frame(self, spark, rows, cols):
        return spark.createDataFrame(rows, cols)

    def test_distance_join_across_dateline(self, spark):
        pts = self._frame(
            spark,
            [("a", 0, 179.9, 10.0), ("b", 0, -179.9, 10.0), ("c", 0, 170.0, 10.0)],
            ["doc_id", "span_offset", "lon", "lat"],
        )
        probes = self._frame(
            spark,
            [("q0", -179.95, 10.0, 50_000.0)],
            ["q_id", "lon", "lat", "radius_m"],
        )
        got = {
            r["doc_id"]
            for r in distance_join(pts, probes, bits=6).select("doc_id").collect()
        }
        # 179.9 is ~22 km from -179.95 across the dateline
        assert got == {"a", "b"}

    def test_knn_across_dateline(self, spark):
        pts = self._frame(
            spark,
            [("near", 0, 179.9, 0.0), ("far", 0, -170.0, 0.0)],
            ["doc_id", "span_offset", "lon", "lat"],
        )
        probes = self._frame(
            spark, [("q0", -179.95, 0.0, 1)], ["q_id", "lon", "lat", "k"]
        )
        from geomesa_spark.operators.knn import knn

        got = knn(pts, probes, bits=6, ring_cells=1).select("doc_id").collect()
        assert [r["doc_id"] for r in got] == ["near"]

    def test_pip_join_unchanged_for_normalized_polys(self, spark, geo_views):
        # wrap must not change results for polygons whose raw envelopes
        # extend past ±180 (the refine kernel compares raw coordinates)
        got = (
            spatial_join_points_in_polys(
                geo_views["pts"], geo_views["polys"], bits=6, broadcast=True
            )
            .count()
        )
        ref = (
            spatial_join_points_in_polys(
                geo_views["pts"], geo_views["polys"], bits=4, broadcast=True
            )
            .count()
        )
        assert got == ref


class TestGeomGeomRewrite:
    def _layers(self, spark):
        from geomesa_spark.tables import rect_layer

        a = poly_layers(spark, 60).withColumnRenamed("poly_id", "left_id")
        b = rect_layer(spark, 80).withColumnRenamed("rect_id", "right_id")
        a.createOrReplaceTempView("gg_a")
        b.createOrReplaceTempView("gg_b")
        return a, b

    def test_rewrite_fires_and_plans_hash_join(self, spark):
        """The layer×layer SQL form must plan as a (Broadcast)HashJoin on
        __cell — not a BroadcastNestedLoopJoin cartesian."""
        from geomesa_spark.plans.sql_rewrite import rewrite_spatial_sql, spatial_sql

        self._layers(spark)
        sql = (
            "SELECT a.left_id, b.right_id FROM gg_a a JOIN gg_b b "
            "ON st_intersects(a.wkt, b.wkt)"
        )
        rw = rewrite_spatial_sql(sql, spark)
        assert "__cell" in rw and "st_intersects" in rw
        plan = spatial_sql(spark, sql)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" not in plan
        assert "HashJoin" in plan

    def test_rewritten_rows_match_brute_force(self, spark):
        from geomesa_spark.geom import geoms_intersect, parse_wkt
        from geomesa_spark.plans.sql_rewrite import spatial_sql

        a, b = self._layers(spark)
        sql = (
            "SELECT a.left_id, b.right_id FROM gg_a a JOIN gg_b b "
            "ON st_intersects(a.wkt, b.wkt)"
        )
        got = {(r["left_id"], r["right_id"]) for r in spatial_sql(spark, sql).collect()}
        want = {
            (ra["left_id"], rb["right_id"])
            for ra in a.collect()
            for rb in b.collect()
            if geoms_intersect(parse_wkt(ra["wkt"]), parse_wkt(rb["wkt"]))
        }
        assert got == want and len(want) > 0

    def test_exactly_one_row_per_pair(self, spark):
        """Reference-point dedup: multi-cell overlaps must not duplicate."""
        from geomesa_spark.plans.sql_rewrite import spatial_sql

        self._layers(spark)
        sql = (
            "SELECT a.left_id, b.right_id FROM gg_a a JOIN gg_b b "
            "ON st_intersects(a.wkt, b.wkt)"
        )
        rows = spatial_sql(spark, sql, bits=7).collect()
        pairs = [(r["left_id"], r["right_id"]) for r in rows]
        assert len(pairs) == len(set(pairs))

    def test_contains_form_rewrites(self, spark):
        from geomesa_spark.geom import geom_contains, parse_wkt
        from geomesa_spark.plans.sql_rewrite import rewrite_spatial_sql, spatial_sql

        a, b = self._layers(spark)
        sql = (
            "SELECT a.left_id, b.right_id FROM gg_a a JOIN gg_b b "
            "ON st_contains(a.wkt, b.wkt)"
        )
        assert "__cell" in rewrite_spatial_sql(sql, spark)
        got = {(r["left_id"], r["right_id"]) for r in spatial_sql(spark, sql).collect()}
        want = {
            (ra["left_id"], rb["right_id"])
            for ra in a.collect()
            for rb in b.collect()
            if geom_contains(parse_wkt(ra["wkt"]), parse_wkt(rb["wkt"]))
        }
        assert got == want


class TestGeomJoinDedup:
    def test_no_duplicate_pairs_at_fine_grid(self, spark):
        """At bits=8 geometries share many cover cells; the
        reference-point filter must still emit each pair exactly once."""
        from geomesa_spark.operators.joins import spatial_join_geoms
        from geomesa_spark.tables import rect_layer

        a = poly_layers(spark, 80).withColumnRenamed("poly_id", "left_id")
        b = rect_layer(spark, 120).withColumnRenamed("rect_id", "right_id")
        out = spatial_join_geoms(a, b, bits=8).select("left_id", "right_id").collect()
        pairs = [(r["left_id"], r["right_id"]) for r in out]
        assert len(pairs) == len(set(pairs)) and len(pairs) > 0
        # and bits must not change the result set
        out5 = spatial_join_geoms(a, b, bits=5).select("left_id", "right_id").collect()
        assert set(pairs) == {(r["left_id"], r["right_id"]) for r in out5}


class TestGeomJoinGiantLeft:
    def test_world_spanning_polygon(self, spark):
        """Degenerate skew: one left geometry covering most of the grid
        joins every rect through a single kernel group — exercises the
        chunked PIP/edge paths and the reference-point dedup under a
        full-cover explosion."""
        from geomesa_spark.operators.joins import spatial_join_geoms
        from geomesa_spark.tables import rect_layer

        big = spark.createDataFrame(
            [(
                "world",
                "POLYGON ((-179 -84, 179 -84, 179 84, -179 84, -179 -84))",
                -179.0, -84.0, 179.0, 84.0,
            )],
            "left_id string, wkt string, min_lon double, min_lat double, "
            "max_lon double, max_lat double",
        )
        rects = rect_layer(spark, 2000).withColumnRenamed("rect_id", "right_id")
        out = spatial_join_geoms(big, rects, bits=6).collect()
        pairs = [(r["left_id"], r["right_id"]) for r in out]
        assert len(pairs) == len(set(pairs))
        # brute force: every rect whose CLOSED bbox overlaps the polygon's
        want = {
            r["right_id"]
            for r in rects.collect()
            if r["min_lon"] <= 179 and r["max_lon"] >= -179
            and r["min_lat"] <= 84 and r["max_lat"] >= -84
        }
        assert {p[1] for p in pairs} == want and len(want) > 1500


class TestStrictMode:
    CTE_SQL = """
    WITH j AS (
      SELECT p.doc_id, p.span_offset, q.poly_id
      FROM rw_pts p JOIN rw_polys q
        ON st_contains(q.wkt, st_point(p.lon, p.lat))
    )
    SELECT doc_id, span_offset, poly_id FROM j
    """

    def test_cte_falls_through_identity_but_correct(self, spark, geo_views):
        """A spatial join inside a CTE is NOT rewritten (documented
        boundary) — the identity fallback must still return the right
        rows via the st_* function evaluation (cartesian fallback)."""
        assert rewrite_spatial_sql(self.CTE_SQL, spark) == self.CTE_SQL
        got = set(map(tuple, spark.sql(self.CTE_SQL).collect()))
        want = set(map(tuple, spark.sql(PIP_SQL).collect()))
        assert got == want and len(got) > 0

    def test_strict_raises_on_fallthrough(self, spark, geo_views):
        with pytest.raises(ValueError, match="cartesian fallback"):
            rewrite_spatial_sql(self.CTE_SQL, spark, strict=True)

    def test_strict_quiet_when_rewrite_fires(self, spark, geo_views):
        out = rewrite_spatial_sql(PIP_SQL, spark, strict=True)
        assert "__cell" in out

    def test_strict_not_masked_by_literal_filter_rewrite(self, spark, geo_views):
        """ADVICE r4: strict previously compared the FINAL output to the
        input, so a literal-filter rewrite firing on another clause
        masked an unrewritten CTE spatial join. The gate now sits on the
        join stage: this query must raise even though the literal bbox
        rewrite changes the text."""
        sql = """
        WITH j AS (
          SELECT p.doc_id, q.poly_id
          FROM rw_pts p JOIN rw_polys q
            ON st_contains(q.wkt, st_point(p.lon, p.lat))
        )
        SELECT * FROM j JOIN rw_pts x ON j.doc_id = x.doc_id
        WHERE st_contains('POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))',
                          st_point(x.lon, x.lat))
        """
        # precondition for the mask: the non-strict rewrite DOES alter
        # the text (the literal filter gains bbox conjuncts) while the
        # CTE join falls through
        out = rewrite_spatial_sql(sql, spark)
        assert out != sql and "__cell" not in out
        with pytest.raises(ValueError, match="cartesian fallback"):
            rewrite_spatial_sql(sql, spark, strict=True)

    def test_strict_quiet_on_where_refine_after_splice(self, spark, geo_views):
        """A second two-alias spatial call in the WHERE of an already-
        spliced join is a per-row refine over the keyed pair, NOT a
        cartesian risk — strict must stay quiet (review finding r5: the
        first version of the join-stage gate raised here)."""
        sql = """
        SELECT p.doc_id, q.poly_id
        FROM rw_pts p JOIN rw_polys q
          ON st_contains(q.wkt, st_point(p.lon, p.lat))
        WHERE st_distanceSphere(st_point(p.lon, p.lat),
                                st_point(q.min_lon, q.min_lat)) >= 0
        """
        out = rewrite_spatial_sql(sql, spark, strict=True)
        assert "__cell" in out
        # and it still runs (the refine predicate survives as a filter)
        assert spark.sql(out).count() > 0

    def test_strict_raises_on_second_join_in_cte(self, spark, geo_views):
        """Top-level join rewrites, but a SECOND two-alias spatial join
        inside a CTE falls through — strict must still raise (the input
        carries more join call sites than the splice consumed)."""
        sql = """
        WITH inner_j AS (
          SELECT a.doc_id FROM rw_pts a JOIN rw_polys b
            ON st_intersects(b.wkt, st_point(a.lon, a.lat))
        )
        SELECT p.doc_id, q.poly_id
        FROM rw_pts p JOIN rw_polys q
          ON st_contains(q.wkt, st_point(p.lon, p.lat))
        """
        with pytest.raises(ValueError, match="cartesian fallback"):
            rewrite_spatial_sql(sql, spark, strict=True)

    def test_strict_quiet_without_spatial_predicate(self, spark):
        sql = "SELECT 1 AS one"
        assert rewrite_spatial_sql(sql, spark, strict=True) == sql

    def test_strict_quiet_on_literal_point_filter(self, spark, geo_views):
        """A predicate is join-shaped only when TWO different aliases
        appear among its arguments: decimal literals must not read as
        qualified columns, and a single-table per-row filter (literal
        point vs one alias's columns) legitimately takes the identity
        path without strict raising."""
        sql = """
        SELECT * FROM rw_pts p
        WHERE st_distanceSphere(st_point(1.5, 2.5), st_point(p.lon, p.lat)) <= 1000
        """
        assert rewrite_spatial_sql(sql, spark, strict=True) == sql
        lit_sql = "SELECT st_distanceSphere(st_point(1.5, 2.5), st_point(3.5, 4.5)) AS d"
        assert rewrite_spatial_sql(lit_sql, spark, strict=True) == lit_sql
