"""CLI surface (tools/cli.py) — reference `geomesa ingest/export/stats`
command parity, exercised in-process via main(argv)."""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))


@pytest.fixture(scope="module")
def cli():
    import cli as m

    return m


class TestCli:
    def test_ingest_csv_then_stats(self, spark, cli, tmp_path, capsys):
        src = tmp_path / "in.csv"
        src.write_text("alice,31\nbob,44\n")
        out = str(tmp_path / "tbl")
        assert cli.main([
            "ingest", "--format", "csv", "--sft", "name:String,age:Int",
            "--input", str(src), "--output", out,
        ]) == 0
        got = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert got["ingested"] == 2
        assert cli.main(["stats", "--input", out, "--spec", "Count();MinMax(age)"]) == 0
        stats = json.loads(capsys.readouterr().out)
        assert stats["Count()"][0]["count"] == 2
        assert stats["MinMax(age)"][0]["min_age"] == 31

    def test_sql_with_spatial_rewrite(self, spark, cli, tmp_path, capsys):
        from geomesa_spark.operators.extract import extract_geo_points
        from geomesa_spark.tables import poly_layers, synthesize_documents

        pts = str(tmp_path / "pts")
        pol = str(tmp_path / "pol")
        extract_geo_points(synthesize_documents(spark, 500)).write.parquet(pts)
        poly_layers(spark, 100).write.parquet(pol)
        assert cli.main([
            "sql", "--spatial-rewrite",
            "--view", f"p={pts}", "--view", f"q={pol}",
            "--query",
            "SELECT count(*) AS n FROM p p JOIN q q"
            " ON st_contains(q.wkt, st_point(p.lon, p.lat))",
        ]) == 0
        n = json.loads(capsys.readouterr().out.strip().splitlines()[-1])["n"]
        assert n > 0

    def test_export_shapefile(self, spark, cli, tmp_path, capsys):
        src = str(tmp_path / "tbl2")
        spark.createDataFrame(
            [("a", 1.0, 2.0)], "name string, lon double, lat double"
        ).write.parquet(src)
        base = str(tmp_path / "shp_out")
        assert cli.main(["export", "--input", src, "--format", "shapefile",
                         "--output", base]) == 0
        assert os.path.exists(base + ".shp") and os.path.exists(base + ".dbf")

    def test_export_with_cql_filter(self, spark, cli, tmp_path, capsys):
        src = str(tmp_path / "tbl3")
        spark.createDataFrame(
            [("a", 1.0, 2.0, 5), ("b", 50.0, 60.0, 9), ("c", 2.0, 1.0, 9)],
            "name string, lon double, lat double, v int",
        ).write.parquet(src)
        out = str(tmp_path / "filtered")
        assert cli.main([
            "export", "--input", src, "--format", "parquet", "--output", out,
            "-q", "BBOX(geom, 0, 0, 10, 10) AND v = 9",
        ]) == 0
        got = spark.read.parquet(out).collect()
        assert [r.name for r in got] == ["c"]

    def test_explain(self, spark, cli, tmp_path, capsys):
        src = str(tmp_path / "tbl5")
        spark.createDataFrame(
            [("a", 1.0, 2.0)], "name string, lon double, lat double"
        ).write.parquet(src)
        assert cli.main(["explain", "--input", src, "-q",
                         "BBOX(geom, -10, -10, 10, 10) AND name = 'a'"]) == 0
        out = capsys.readouterr().out
        head = json.loads(out[: out.index("== Physical Plan ==")].rsplit("}", 1)[0] + "}")
        assert head["plan_events"][0]["index"] == "none"  # no z2 col given
        assert head["plan_events"][0]["n_envelopes"] == 1
        assert "PushedFilters" in out

    def test_describe(self, spark, cli, tmp_path, capsys):
        src = str(tmp_path / "tbl4")
        spark.createDataFrame(
            [("a", 1.0, 2.0)], "name string, lon double, lat double"
        ).write.parquet(src)
        assert cli.main(["describe", "--input", src]) == 0
        out = json.loads(capsys.readouterr().out)
        assert {f["name"] for f in out["attributes"]} == {"name", "lon", "lat"}
        assert out["geometry"] == "lon/lat point columns"


class TestFacade:
    def test_engine_facade_surfaces(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from geomesa_spark import GeoMesaSpark
        from geomesa_spark.operators.extract import extract_geo_points
        from geomesa_spark.tables import poly_layers, synthesize_documents

        gm = GeoMesaSpark(spark)
        pts = extract_geo_points(synthesize_documents(spark, 500))
        polys = poly_layers(spark, 100)
        j = gm.join_points_in_polys(pts, polys, bits=6, broadcast=True)
        assert j.count() > 0
        d = gm.density(pts, (-180.0, -85.0, 180.0, 85.0), 36, 17)
        assert d.agg(F.sum("cnt")).collect()[0][0] > 0
        pts.createOrReplaceTempView("fac_pts")
        polys.createOrReplaceTempView("fac_polys")
        s = gm.sql(
            "SELECT count(*) AS n FROM fac_pts p JOIN fac_polys q"
            " ON st_contains(q.wkt, st_point(p.lon, p.lat))"
        )
        assert s.collect()[0]["n"] == j.count()
        # writer semantics round trip
        base = spark.createDataFrame([("a", 1), ("b", 2)], "__fid__ string, v int")
        path = str(tmp_path / "fac_tbl")
        gm.upsert_init(base, path, n_buckets=4)
        gm.upsert(spark.createDataFrame([("a", 10)], "__fid__ string, v int"), path)
        gm.delete(spark.createDataFrame([("b",)], "__fid__ string"), path)
        gm.compact(path)
        got = {(r["__fid__"], r["v"]) for r in gm.read_latest(path).collect()}
        assert got == {("a", 10)}

    def test_engine_facade_corpus(self, spark):
        from pyspark.sql import functions as F

        from geomesa_spark import GeoMesaSpark

        gm = GeoMesaSpark(spark)
        docs = spark.createDataFrame(
            [(i, "en" if i % 2 else "de", f"tok{i} tok{i+1} tok{i+2} tok{i+3}")
             for i in range(20)],
            "doc_id long, lang string, text string",
        )
        assert gm.stratified_sample(docs, ["lang"], 3).count() == 6
        sh = gm.shard(docs, 4)
        assert sh.select("shard").distinct().count() <= 4
        cont = gm.contamination(docs, docs.limit(2), n=3)
        assert cont.where(F.col("contamination") > 0).count() >= 2
        cd = gm.chunk_dedup(docs, chunk_tokens=2)
        assert cd.count() == 20
