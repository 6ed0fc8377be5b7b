"""ECQL front-end: parser, compiler, FilterSplitter split, planner.

Reference parity target: GeoTools ECQL grammar as consumed everywhere in
GeoMesa (CLI -q/--cql, GeoMesaRelation CQL pushdown, QueryPlanner /
FilterSplitter primary-vs-residual decomposition)."""

from datetime import datetime, timezone

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from geomesa_spark import geom as G
from geomesa_spark.plans.ecql import (
    EcqlError,
    apply_transforms,
    compile_ecql,
    compile_expression,
    parse_ecql,
    parse_expression,
    plan_ecql,
    split_primary,
)


def _utc(spark):
    spark.conf.set("spark.sql.session.timeZone", "UTC")


class TestParser:
    def test_precedence_or_and(self):
        ast = parse_ecql("a = 1 OR b = 2 AND c = 3")
        assert ast[0] == "or"
        assert ast[1] == ("cmp", "=", "a", 1)
        assert ast[2][0] == "and"

    def test_not_binds_tighter_than_and(self):
        ast = parse_ecql("NOT a = 1 AND b = 2")
        assert ast[0] == "and"
        assert ast[1] == ("not", ("cmp", "=", "a", 1))

    def test_parens_override(self):
        ast = parse_ecql("(a = 1 OR b = 2) AND c = 3")
        assert ast[0] == "and" and ast[1][0] == "or"

    def test_string_escape_and_ops(self):
        ast = parse_ecql("name = 'it''s' AND age <> 3 AND h >= 2.5")
        flat = str(ast)
        assert "it's" in flat and "<>" in flat and "2.5" in flat

    def test_between_like_in_null(self):
        assert parse_ecql("v BETWEEN 1 AND 5") == ("between", "v", 1, 5, False)
        assert parse_ecql("v NOT BETWEEN 1 AND 5")[4] is True
        assert parse_ecql("s LIKE 'ab%'") == ("like", "s", "ab%", False, False)
        assert parse_ecql("s ILIKE 'ab%'")[3] is True
        assert parse_ecql("s NOT LIKE 'x_'")[4] is True
        assert parse_ecql("t IN ('a', 'b', 3)") == ("in", "t", ["a", "b", 3], False)
        assert parse_ecql("t IS NULL") == ("isnull", "t", False)
        assert parse_ecql("t IS NOT NULL") == ("isnull", "t", True)

    def test_bbox_with_optional_crs(self):
        assert parse_ecql("BBOX(geom, -10, -5, 10, 5)") == (
            "bbox", "geom", -10.0, -5.0, 10.0, 5.0,
        )
        assert parse_ecql("bbox(geom, -10, -5, 10, 5, 'EPSG:4326')")[1] == "geom"

    def test_wkt_capture_nested_parens(self):
        ast = parse_ecql(
            "INTERSECTS(geom, MULTIPOLYGON(((0 0, 1 0, 1 1, 0 0)), ((5 5, 6 5, 6 6, 5 5))))"
        )
        assert ast[0] == "spatial" and ast[1] == "intersects"
        g = G.parse_wkt(ast[3])
        assert g.geom_type == "MULTIPOLYGON" and len(g.rings) == 2

    def test_dwithin_units(self):
        assert parse_ecql("DWITHIN(geom, POINT(1 2), 3, kilometers)")[3] == 3000.0
        assert parse_ecql("DWITHIN(geom, POINT(1 2), 1, 'nautical miles')")[3] == 1852.0
        assert parse_ecql("BEYOND(geom, POINT(1 2), 2, meters)")[4] is True
        mi = parse_ecql("DWITHIN(geom, POINT(1 2), 1, statute miles)")
        assert mi[3] == 1609.344

    def test_temporal_forms(self):
        d = parse_ecql("dtg DURING 2024-01-01T00:00:00Z/2024-01-02T00:00:00Z")
        assert d[0] == "during"
        assert d[2] == datetime(2024, 1, 1, tzinfo=timezone.utc)
        per = parse_ecql("dtg DURING 2024-01-01T00:00:00Z/P1D")
        assert per[3] == datetime(2024, 1, 2, tzinfo=timezone.utc)
        rper = parse_ecql("dtg DURING PT12H/2024-01-02T00:00:00Z")
        assert rper[2] == datetime(2024, 1, 1, 12, tzinfo=timezone.utc)
        b = parse_ecql("dtg BEFORE 2024-06-01T12:30:00Z")
        assert b == ("tcmp", "before", "dtg", datetime(2024, 6, 1, 12, 30, tzinfo=timezone.utc))
        assert parse_ecql("dtg AFTER 2024-06-01")[1] == "after"

    def test_ident_starting_with_p_is_not_duration(self):
        ast = parse_ecql("props = 'x' AND PT1 = 2")
        assert ast[1][2] == "props" and ast[2][2] == "PT1"

    def test_errors(self):
        for bad in (
            "a = ",
            "BBOX(geom, 1, 2, 3)",
            "DWITHIN(geom, POINT(1 2), 5, furlongs)",
            "a = 1 b = 2",
            "name = 'unterminated",
        ):
            with pytest.raises(EcqlError):
                parse_ecql(bad)


@pytest.fixture(scope="module")
def pts_df(spark):
    _utc(spark)
    rows = []
    for i in range(400):
        lon = -20.0 + (i * 31 % 400) / 10.0  # [-20, 20)
        lat = -10.0 + (i * 17 % 200) / 10.0  # [-10, 10)
        rows.append(
            (
                i,
                f"f{i:03d}",
                lon,
                lat,
                datetime(2024, 1, 1, tzinfo=timezone.utc) + pd.Timedelta(minutes=7 * i).to_pytimedelta(),
                ["a", "b", "c"][i % 3],
                float(i % 50),
            )
        )
    df = spark.createDataFrame(
        rows, "id long, name string, lon double, lat double, dtg timestamp, cat string, score double"
    )
    return df.cache()


class TestCompile:
    def _pd(self, df):
        return df.toPandas().sort_values("id").reset_index(drop=True)

    def test_attribute_filter_matrix(self, pts_df):
        got = pts_df.where(
            compile_ecql("cat IN ('a','b') AND score BETWEEN 10 AND 30 AND name LIKE 'f0%' AND id IS NOT NULL")
        )
        p = self._pd(pts_df)
        want = p[
            p.cat.isin(["a", "b"]) & p.score.between(10, 30) & p.name.str.startswith("f0")
        ]
        assert sorted(r.id for r in got.collect()) == sorted(want.id)

    def test_bbox_and_during_exclusive(self, pts_df, spark):
        _utc(spark)
        got = pts_df.where(
            compile_ecql(
                "BBOX(geom, -5, -5, 5, 5) AND dtg DURING 2024-01-01T00:00:00Z/2024-01-01T12:00:00Z"
            )
        ).collect()
        p = self._pd(pts_df)
        t0 = pd.Timestamp("2024-01-01 00:00:00")
        t1 = pd.Timestamp("2024-01-01 12:00:00")
        want = p[
            p.lon.between(-5, 5) & p.lat.between(-5, 5) & (p.dtg > t0) & (p.dtg < t1)
        ]
        assert sorted(r.id for r in got) == sorted(want.id)
        # DURING endpoints excluded: a row exactly at t0 must not match
        assert 0 not in {r.id for r in got}

    def test_intersects_polygon_matches_kernel(self, pts_df):
        wkt = "POLYGON((-6 -6, 6 -6, 6 6, -6 6, -6 -6))"
        got = {r.id for r in pts_df.where(compile_ecql(f"INTERSECTS(geom, {wkt})")).collect()}
        p = self._pd(pts_df)
        g = G.parse_wkt(wkt)
        m = G.points_in_polygon(p.lon.to_numpy(), p.lat.to_numpy(), g) | G.points_on_boundary(
            p.lon.to_numpy(), p.lat.to_numpy(), g
        )
        assert got == set(p.id[m])
        # DISJOINT is the complement
        dis = {r.id for r in pts_df.where(compile_ecql(f"DISJOINT(geom, {wkt})")).collect()}
        assert dis == set(p.id) - got

    def test_within_excludes_boundary(self, spark):
        # OGC/JTS Within (DE-9IM T*F**F***): a point exactly ON the
        # polygon boundary matches INTERSECTS and TOUCHES but NOT WITHIN
        df = spark.createDataFrame(
            [(1, 0.5, 0.5), (2, 0.0, 0.5), (3, 2.0, 2.0), (4, 1.0, 1.0)],
            "id long, lon double, lat double",
        )
        wkt = "POLYGON((0 0, 1 0, 1 1, 0 1, 0 0))"
        within = {r.id for r in df.where(compile_ecql(f"WITHIN(geom, {wkt})")).collect()}
        inter = {r.id for r in df.where(compile_ecql(f"INTERSECTS(geom, {wkt})")).collect()}
        touch = {r.id for r in df.where(compile_ecql(f"TOUCHES(geom, {wkt})")).collect()}
        assert within == {1}          # interior only
        assert inter == {1, 2, 4}     # interior + boundary
        assert touch == {2, 4}        # boundary only

    def test_within_line_excludes_endpoints(self, spark):
        # boundary of a line = its endpoints (Mod-2 rule): WITHIN excludes
        # them, TOUCHES matches only them
        df = spark.createDataFrame(
            [(1, 0.5, 0.0), (2, 0.0, 0.0), (3, 1.0, 0.0), (4, 0.5, 1.0)],
            "id long, lon double, lat double",
        )
        wkt = "LINESTRING(0 0, 1 0)"
        within = {r.id for r in df.where(compile_ecql(f"WITHIN(geom, {wkt})")).collect()}
        inter = {r.id for r in df.where(compile_ecql(f"INTERSECTS(geom, {wkt})")).collect()}
        touch = {r.id for r in df.where(compile_ecql(f"TOUCHES(geom, {wkt})")).collect()}
        assert within == {1}
        assert inter == {1, 2, 3}
        assert touch == {2, 3}
        # a CLOSED line has no boundary: every on-path point is within
        ring = "LINESTRING(0 0, 1 0, 1 1, 0 0)"
        w2 = {r.id for r in df.where(compile_ecql(f"WITHIN(geom, {ring})")).collect()}
        assert 2 in w2 and 4 not in w2

    def test_dwithin_point_codegen(self, pts_df):
        got = {
            r.id
            for r in pts_df.where(
                compile_ecql("DWITHIN(geom, POINT(0 0), 500, kilometers)")
            ).collect()
        }
        p = self._pd(pts_df)
        d = G.haversine_m(p.lon.to_numpy(), p.lat.to_numpy(), 0.0, 0.0)
        assert got == set(p.id[d <= 500_000.0])
        bey = {
            r.id
            for r in pts_df.where(
                compile_ecql("BEYOND(geom, POINT(0 0), 500, kilometers)")
            ).collect()
        }
        assert bey == set(p.id) - got

    def test_dwithin_linestring(self, pts_df):
        got = {
            r.id
            for r in pts_df.where(
                compile_ecql("DWITHIN(geom, LINESTRING(-10 0, 10 0), 200, kilometers)")
            ).collect()
        }
        p = self._pd(pts_df)
        px, py = p.lon.to_numpy(), p.lat.to_numpy()
        best = np.full(px.shape, np.inf)
        for (ax, ay), (bx, by) in [((-10.0, 0.0), (10.0, 0.0))]:
            dx, dy = bx - ax, by - ay
            t = np.clip(((px - ax) * dx + (py - ay) * dy) / (dx * dx + dy * dy), 0, 1)
            best = np.minimum(best, G.haversine_m(px, py, ax + t * dx, ay + t * dy))
        assert got == set(p.id[best <= 200_000.0])

    def test_or_not_nesting(self, pts_df):
        got = {
            r.id
            for r in pts_df.where(
                compile_ecql("NOT (cat = 'a' OR cat = 'b') OR score < 1")
            ).collect()
        }
        p = self._pd(pts_df)
        want = set(p.id[(~p.cat.isin(["a", "b"])) | (p.score < 1)])
        assert got == want

    def test_point_literal_equals(self, pts_df):
        p = self._pd(pts_df)
        x, y = p.lon[0], p.lat[0]
        got = pts_df.where(compile_ecql(f"EQUALS(geom, POINT({x} {y}))")).collect()
        assert {r.id for r in got} == set(p.id[(p.lon == x) & (p.lat == y)])


class TestSplit:
    def test_and_intersects_envelopes(self):
        bb, iv = split_primary(
            "BBOX(geom, -10, -10, 10, 10) AND BBOX(geom, 0, 0, 20, 20) AND cat = 'a'"
        )
        assert bb == [(0.0, 0.0, 10.0, 10.0)]
        assert iv is None

    def test_or_multi_range(self):
        bb, _ = split_primary("BBOX(geom, 0, 0, 1, 1) OR BBOX(geom, 5, 5, 6, 6)")
        assert len(bb) == 2

    def test_or_poisons_primary(self):
        bb, _ = split_primary("BBOX(geom, 0, 0, 1, 1) OR cat = 'a'")
        assert bb is None

    def test_polygon_and_dwithin_envelopes(self):
        bb, _ = split_primary("INTERSECTS(geom, POLYGON((0 0, 4 0, 2 3, 0 0)))")
        assert bb == [(0.0, 0.0, 4.0, 3.0)]
        bb2, _ = split_primary("DWITHIN(geom, POINT(0 0), 111.195, kilometers)")
        (x0, y0, x1, y1) = bb2[0]
        assert y1 == pytest.approx(1.0, abs=1e-6) and x1 >= 1.0

    def test_temporal_interval(self):
        _, iv = split_primary(
            "dtg DURING 2024-01-01T00:00:00Z/2024-01-05T00:00:00Z AND dtg AFTER 2024-01-02T00:00:00Z"
        )
        assert iv[0] == datetime(2024, 1, 2, tzinfo=timezone.utc)
        assert iv[1] == datetime(2024, 1, 5, tzinfo=timezone.utc)
        _, open_iv = split_primary("dtg BEFORE 2024-01-05T00:00:00Z")
        assert open_iv == (None, datetime(2024, 1, 5, tzinfo=timezone.utc))

    def test_not_contributes_nothing(self):
        bb, iv = split_primary("NOT BBOX(geom, 0, 0, 1, 1)")
        assert bb is None and iv is None

    def test_or_interval_open_endpoints(self):
        # AFTER X OR BEFORE Y (X > Y) covers ALL time — the union must be
        # fully open on both sides, never the inverted (X, Y) interval
        _, iv = split_primary(
            "dtg AFTER 2024-03-01T00:00:00Z OR dtg BEFORE 2024-02-01T00:00:00Z"
        )
        assert iv == (None, None)
        # one-sided: closed endpoints union, open side stays open
        _, iv2 = split_primary(
            "dtg AFTER 2024-03-01T00:00:00Z OR dtg DURING 2024-01-01T00:00:00Z/2024-01-05T00:00:00Z"
        )
        assert iv2 == (datetime(2024, 1, 1, tzinfo=timezone.utc), None)
        # both closed: plain envelope union
        _, iv3 = split_primary(
            "dtg DURING 2024-01-01T00:00:00Z/2024-01-05T00:00:00Z"
            " OR dtg DURING 2024-02-01T00:00:00Z/2024-02-05T00:00:00Z"
        )
        assert iv3 == (
            datetime(2024, 1, 1, tzinfo=timezone.utc),
            datetime(2024, 2, 5, tzinfo=timezone.utc),
        )

    def test_or_interval_overcovers_plan(self, pts_df, spark):
        # end-to-end: plan_ecql with z3 columns must not drop rows for the
        # disjunctive-open filter (the r3 bug produced an inverted interval
        # → lit(False) coarse predicate → zero rows)
        _utc(spark)
        text = (
            "BBOX(geom, -180, -90, 180, 90) AND "
            "(dtg AFTER 2024-01-01T06:00:00Z OR dtg BEFORE 2024-01-01T03:00:00Z)"
        )
        residual = pts_df.where(compile_ecql(text))
        from geomesa_spark.operators.extract import with_z3_cell

        idx = with_z3_cell(pts_df).localCheckpoint(eager=False)
        planned = plan_ecql(idx, text, z3_cols=("epoch_bin", "cell_z3"))
        assert {r.id for r in planned.collect()} == {r.id for r in residual.collect()}


class TestTransforms:
    def test_expression_parse_precedence(self):
        ast = parse_expression("a + b * 2 - c / 4")
        # ((a + (b*2)) - (c/4))
        assert ast[0] == "bin" and ast[1] == "-"
        assert ast[2][1] == "+" and ast[2][3][1] == "*"
        assert ast[3][1] == "/"

    def test_expression_unary_and_parens(self):
        ast = parse_expression("-(a + 1) * 3")
        assert ast == ("bin", "*", ("neg", ("bin", "+", ("attr", "a"), ("lit", 1))), ("lit", 3))

    def test_expression_functions(self, pts_df):
        got = pts_df.select(
            compile_expression("strConcat(strToUpperCase(name), '-X')").alias("s"),
            compile_expression("abs(floor(lat)) + 1").alias("d"),
            compile_expression("strSubstring(name, 0, 2)").alias("p"),
            compile_expression("min(score, 10)").alias("m"),
            compile_expression("getX(geom)").alias("x"),
            "id",
        ).orderBy("id").limit(3).collect()
        p = pts_df.toPandas().sort_values("id").reset_index(drop=True)
        for k, r in enumerate(got):
            assert r.s == p.name[k].upper() + "-X"
            assert r.d == abs(np.floor(p.lat[k])) + 1
            assert r.p == p.name[k][:2]
            assert r.m == min(p.score[k], 10)
            assert r.x == p.lon[k]

    def test_apply_transforms_projection(self, pts_df):
        out = apply_transforms(
            pts_df, ["id", "geom", "label=strConcat(cat, '!')"]
        )
        assert out.columns == ["id", "lon", "lat", "label"]
        row = out.orderBy("id").first()
        assert row.label in ("a!", "b!", "c!")

    def test_plan_ecql_with_transforms(self, pts_df):
        out = plan_ecql(
            pts_df,
            "BBOX(geom, -5, -5, 5, 5)",
            transforms=["id", "u=strToUpperCase(cat)"],
        )
        assert out.columns == ["id", "u"]
        assert out.count() == pts_df.where(compile_ecql("BBOX(geom, -5, -5, 5, 5)")).count()

    def test_unknown_function_raises(self):
        with pytest.raises(EcqlError):
            compile_expression("frobnicate(a)")


class TestPlan:
    def test_plan_matches_residual_only_z2(self, pts_df, spark):
        from geomesa_spark.operators.extract import with_z2_cell

        _utc(spark)
        text = "BBOX(geom, -5, -5, 5, 5) AND cat <> 'c'"
        idx = with_z2_cell(pts_df).localCheckpoint(eager=False)
        planned = plan_ecql(idx, text, z2_col="cell_z2")
        naive = pts_df.where(compile_ecql(text))
        assert sorted(r.id for r in planned.collect()) == sorted(
            r.id for r in naive.collect()
        )
        # the coarse predicate must actually reach the plan
        assert "cell_z2" in planned._jdf.queryExecution().executedPlan().toString()

    def test_plan_z3_spatiotemporal(self, pts_df, spark):
        from geomesa_spark.operators.extract import with_z3_cell

        _utc(spark)
        text = (
            "BBOX(geom, -8, -8, 8, 8) AND dtg DURING 2024-01-01T00:00:00Z/2024-01-01T18:00:00Z"
        )
        idx = with_z3_cell(pts_df).localCheckpoint(eager=False)
        planned = plan_ecql(idx, text, z3_cols=("epoch_bin", "cell_z3"))
        naive = pts_df.where(compile_ecql(text))
        assert sorted(r.id for r in planned.collect()) == sorted(
            r.id for r in naive.collect()
        )

    def test_plan_no_index_columns_full_scan(self, pts_df):
        text = "score >= 25 AND cat = 'b'"
        planned = plan_ecql(pts_df, text)
        naive = pts_df.where(compile_ecql(text))
        assert planned.count() == naive.count()

    def test_audit_log_records_plan(self, pts_df, tmp_path):
        from geomesa_spark.operators.extract import with_z2_cell
        from geomesa_spark.plans.audit import disable_audit, enable_audit, read_audit

        log = str(tmp_path / "audit.jsonl")
        enable_audit(log)
        try:
            idx = with_z2_cell(pts_df)
            plan_ecql(idx, "BBOX(geom, -5, -5, 5, 5) AND cat = 'a'", z2_col="cell_z2")
            plan_ecql(pts_df, "cat = 'b'")
            events = read_audit(log)
        finally:
            disable_audit()
        assert len(events) == 2
        assert events[0]["index"] == "z2" and events[0]["n_envelopes"] == 1
        assert "BBOX" in events[0]["filter"]
        assert events[1]["index"] == "none"
        assert events[0]["plan_millis"] >= 0

    def test_audit_disabled_is_noop(self, pts_df):
        from geomesa_spark.plans.audit import audit_event, read_audit

        audit_event(event="x")  # must not raise nor record
        assert read_audit() == []


class TestRunQuery:
    """Unified Query surface (reference QueryHints dispatch)."""

    def test_plain_filter_and_transforms(self, pts_df):
        from geomesa_spark.plans.query import run_query

        out = run_query(
            pts_df,
            filter="BBOX(geom, -5, -5, 5, 5) AND cat = 'a'",
            transforms=["name", "d=score * 2"],
        )
        assert out.columns == ["name", "d"]
        naive = pts_df.where(
            (F.col("lon") >= -5) & (F.col("lon") <= 5)
            & (F.col("lat") >= -5) & (F.col("lat") <= 5)
            & (F.col("cat") == "a")
        )
        assert out.count() == naive.count()

    def test_density_hints_match_operator(self, pts_df):
        from geomesa_spark.operators.tiles import density_grid
        from geomesa_spark.plans.query import run_query

        bbox = (-20.0, -10.0, 20.0, 10.0)
        got = run_query(
            pts_df,
            hints={"density_bbox": bbox, "density_width": 8, "density_height": 4},
        )
        want = density_grid(pts_df, bbox, 8, 4)
        assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))

    def test_bin_hints(self, pts_df):
        from geomesa_spark.plans.query import run_query

        out = run_query(pts_df, hints={"bin_track": "cat", "bin_dtg": "dtg"})
        assert out.columns == ["track_hash", "secs", "lat", "lon"]
        assert out.count() == 400

    def test_stats_hints_return_dict(self, pts_df):
        from geomesa_spark.plans.query import run_query

        out = run_query(pts_df, filter="cat = 'a'", hints={"stats_string": "MinMax(score)"})
        assert isinstance(out, dict)

    def test_sampling_per_key(self, pts_df):
        from geomesa_spark.plans.query import run_query

        out = run_query(pts_df, hints={"sampling": 0.1, "sample_by": "cat"})
        # 1-in-10 per category: 400 rows / 3 cats -> 14 each (ceil 134/10 etc.)
        n = out.count()
        assert 39 <= n <= 42
        # deterministic
        assert out.count() == run_query(pts_df, hints={"sampling": 0.1, "sample_by": "cat"}).count()

    def test_sampling_hash_deterministic(self, pts_df):
        from geomesa_spark.plans.query import run_query

        a = {r.id for r in run_query(pts_df, hints={"sampling": 0.25}).select("id").collect()}
        b = {
            r.id
            for r in run_query(pts_df.repartition(7), hints={"sampling": 0.25})
            .select("id").collect()
        }
        assert a == b and 0 < len(a) < 400

    def test_sampling_one_keeps_everything(self, pts_df):
        # k == 1 (sampling >= ~0.67) must be a no-op, not zero rows
        from geomesa_spark.plans.query import run_query

        total = pts_df.count()
        assert run_query(pts_df, hints={"sampling": 1.0, "sample_by": "cat"}).count() == total
        assert run_query(pts_df, hints={"sampling": 1.0}).count() == total

    def test_hint_validation(self, pts_df):
        import pytest as _pytest

        from geomesa_spark.plans.query import run_query

        with _pytest.raises(ValueError, match="unknown"):
            run_query(pts_df, hints={"densty_bbox": (0, 0, 1, 1)})
        with _pytest.raises(ValueError, match="conflicting"):
            run_query(pts_df, hints={"sampling": 0.5, "bin_track": "cat"})


class TestGrammarRound4:
    def test_include_exclude(self, pts_df):
        assert parse_ecql("INCLUDE") == ("include",)
        assert parse_ecql("EXCLUDE") == ("exclude",)
        total = pts_df.count()
        assert pts_df.where(compile_ecql("INCLUDE")).count() == total
        assert pts_df.where(compile_ecql("EXCLUDE")).count() == 0
        # composes: INCLUDE AND x == x; EXCLUDE OR x == x
        a = pts_df.where(compile_ecql("INCLUDE AND cat = 'a'")).count()
        b = pts_df.where(compile_ecql("EXCLUDE OR cat = 'a'")).count()
        c = pts_df.where(compile_ecql("cat = 'a'")).count()
        assert a == b == c > 0
        # no index primary from the universal filters
        assert split_primary("INCLUDE") == (None, None)

    def test_feature_id_filter(self, spark):
        ast = parse_ecql("IN ('f-1', 'f-3')")
        assert ast == ("fid_in", ["f-1", "f-3"])
        df = spark.createDataFrame(
            [("f-1", 1), ("f-2", 2), ("f-3", 3)], "__fid__ string, v int"
        )
        got = {r.v for r in df.where(compile_ecql("IN ('f-1', 'f-3')")).collect()}
        assert got == {1, 3}
        # still an attribute IN when an attribute precedes it
        assert parse_ecql("cat IN ('a')")[0] == "in"

    def test_attr_vs_attr_comparison(self, spark):
        ast = parse_ecql("score > bonus")
        assert ast == ("cmpa", ">", "score", "bonus")
        df = spark.createDataFrame(
            [(1, 10, 5), (2, 3, 7), (3, 4, 4)], "id int, score int, bonus int"
        )
        got = {r.id for r in df.where(compile_ecql("score > bonus")).collect()}
        assert got == {1}
        eq = {r.id for r in df.where(compile_ecql("score = bonus")).collect()}
        assert eq == {3}
        # literal comparisons unaffected
        lit = {r.id for r in df.where(compile_ecql("score > 4")).collect()}
        assert lit == {1}
