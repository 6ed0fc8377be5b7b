"""Command-line surface mirroring the reference's ``geomesa`` tools
(geomesa-tools/.../tools/ — IngestCommand, ExportCommand, StatsCommand,
plus the compaction maintenance job).

Thin argparse layer over the engine modules — every subcommand is the
same call a PySpark user would write, so the CLI doubles as executable
documentation:

    python tools/cli.py ingest --format csv --sft "name:String,age:Int" \\
        --input data.csv --output /tmp/tbl
    python tools/cli.py export --input /tmp/tbl --format geojson --output /tmp/out
    python tools/cli.py stats --input /tmp/tbl --spec "Count();MinMax(age)"
    python tools/cli.py sql --view pts=/tmp/tbl \\
        --query "SELECT count(*) FROM pts" [--spatial-rewrite]
    python tools/cli.py compact --table /tmp/upsert_tbl
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _session(cores: int | None = None):
    from geomesa_spark.session import build_session

    return build_session(cores=cores or int(os.environ.get("SPARK_GRAFT_CPUS", "8")), app="geomesa-cli")


def cmd_ingest(args) -> int:
    from geomesa_spark.sources import convert as C

    spark = _session(args.cores)
    transforms = json.loads(args.transforms) if args.transforms else None
    fmt = args.format
    if fmt in ("csv", "tsv"):
        df = C.read_delimited(
            spark, args.input, args.sft, transforms=transforms,
            delimiter="\t" if fmt == "tsv" else ",", header=args.header,
        )
    elif fmt == "json":
        df = C.read_json(spark, args.input, args.sft,
                         field_paths=json.loads(args.paths) if args.paths else None)
    elif fmt == "geojson":
        df = C.read_geojson(spark, args.input, args.sft)
    elif fmt == "xml":
        df = C.read_xml(spark, args.input, args.sft, record_tag=args.record_tag,
                        xpaths=json.loads(args.paths) if args.paths else None)
    elif fmt == "fixed":
        offsets = [tuple(map(int, p.split(":"))) for p in args.offsets.split(",")]
        df = C.read_fixed_width(spark, args.input, args.sft, offsets, transforms=transforms)
    else:
        raise SystemExit(f"unknown ingest format: {fmt}")
    df.write.mode("overwrite").parquet(args.output)
    n = spark.read.parquet(args.output).count()
    print(json.dumps({"ingested": n, "output": args.output}))
    return 0


def cmd_export(args) -> int:
    # NOTE: the sources package re-exports the export() FUNCTION, which
    # shadows the submodule attribute (`import ... as` resolves the
    # attribute, so importlib is the unambiguous spelling)
    import importlib

    E = importlib.import_module("geomesa_spark.sources.export")

    spark = _session(args.cores)
    df = spark.read.parquet(args.input)
    if getattr(args, "cql", None):
        # reference CLI parity: every export/query command takes -q/--cql
        # (geomesa-tools ExportCommand); compiled to one Catalyst filter
        from geomesa_spark.plans.ecql import compile_ecql

        df = df.where(compile_ecql(args.cql, lon=args.lon, lat=args.lat, dtg=args.dtg))
    fmt = args.format
    if fmt == "geojson":
        E.to_geojson_lines(df, geom_col=args.geom_col).write.mode("overwrite").text(args.output)
    elif fmt == "arrow":
        E.to_arrow_ipc(df, args.output)
    elif fmt == "bin":
        with open(args.output, "wb") as f:
            f.write(E.pack_bin(E.bin_records(df)))
    elif fmt == "shapefile":
        from geomesa_spark.sources.shapefile import write_shapefile

        write_shapefile(df, args.output)
    else:
        E.export(df, args.output, fmt)
    print(json.dumps({"exported": fmt, "output": args.output}))
    return 0


def cmd_stats(args) -> int:
    from geomesa_spark.operators.stats import run_stats_dsl

    spark = _session(args.cores)
    df = spark.read.parquet(args.input)
    out = {}
    for spec, frame in run_stats_dsl(df, args.spec).items():
        out[spec] = [r.asDict() for r in frame.limit(args.limit).collect()]
    print(json.dumps(out, default=str, indent=1))
    return 0


def cmd_sql(args) -> int:
    from geomesa_spark.functions.st import register_st_functions

    spark = _session(args.cores)
    register_st_functions(spark)
    for pair in args.view or []:
        name, path = pair.split("=", 1)
        spark.read.parquet(path).createOrReplaceTempView(name)
    if args.spatial_rewrite:
        from geomesa_spark.plans.sql_rewrite import spatial_sql

        df = spatial_sql(spark, args.query)
    else:
        df = spark.sql(args.query)
    if args.output:
        df.write.mode("overwrite").parquet(args.output)
        print(json.dumps({"rows": spark.read.parquet(args.output).count(), "output": args.output}))
    else:
        for r in df.limit(args.limit).collect():
            print(json.dumps(r.asDict(), default=str))
    return 0


def cmd_stats_analyze(args) -> int:
    from geomesa_spark.sources.catalog import analyze_table

    spark = _session(args.cores)
    m = analyze_table(spark, args.input, cell_col=args.cell_col)
    print(json.dumps(m["lineage"]["stats"], default=str, indent=1))
    return 0


def cmd_describe(args) -> int:
    """describe-schema analogue (reference geomesa-tools
    DescribeSchemaCommand): attribute names/types, the geometry
    convention detected on the table, and manifest lineage if present."""
    from geomesa_spark.sources.catalog import latest_manifest

    spark = _session(args.cores)
    df = spark.read.parquet(args.input)
    fields = [{"name": f.name, "type": f.dataType.simpleString()} for f in df.schema.fields]
    names = {f.name for f in df.schema.fields}
    geom = (
        "lon/lat point columns" if {"lon", "lat"} <= names
        else "wkt geometry column" if "wkt" in names
        else "none detected"
    )
    out = {"table": args.input, "attributes": fields, "geometry": geom}
    try:
        m = latest_manifest(args.input)
        if m:
            out["manifest"] = {k: m[k] for k in ("epoch", "lineage") if k in m}
    except Exception:
        pass
    print(json.dumps(out, default=str, indent=1))
    return 0


def cmd_explain(args) -> int:
    """explain analogue (reference geomesa-tools ExplainCommand): print
    the planner's decisions for an ECQL query over a table — the
    audit events (index chosen, envelope count, plan time) and the
    physical plan, without executing the scan."""
    from geomesa_spark.plans.audit import disable_audit, enable_audit, read_audit
    from geomesa_spark.plans.ecql import plan_ecql

    spark = _session(args.cores)
    df = spark.read.parquet(args.input)
    kw = {}
    if args.z2_col:
        kw["z2_col"] = args.z2_col
    enable_audit()
    try:
        planned = plan_ecql(df, args.cql, lon=args.lon, lat=args.lat, dtg=args.dtg, **kw)
        events = read_audit()
    finally:
        disable_audit()
    print(json.dumps({"filter": args.cql, "plan_events": events}, default=str, indent=1))
    planned.explain("formatted")
    return 0


def cmd_compact(args) -> int:
    from geomesa_spark.sources.upsert import compact

    spark = _session(args.cores)
    m = compact(spark, args.table)
    print(json.dumps({"compacted": m is not None,
                      "lineage": (m or {}).get("lineage")}, default=str))
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="geomesa-cli")
    ap.add_argument("--cores", type=int, default=None)
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("ingest")
    p.add_argument("--format", required=True,
                   choices=["csv", "tsv", "json", "geojson", "xml", "fixed"])
    p.add_argument("--sft", required=True)
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--transforms")
    p.add_argument("--paths")
    p.add_argument("--record-tag")
    p.add_argument("--offsets", help="fixed-width start:width list, comma-separated")
    p.add_argument("--header", action="store_true")
    p.set_defaults(fn=cmd_ingest)

    p = sub.add_parser("export")
    p.add_argument("--input", required=True)
    p.add_argument("--format", required=True,
                   choices=["csv", "tsv", "json", "parquet", "orc", "avro",
                            "geojson", "arrow", "bin", "shapefile"])
    p.add_argument("--output", required=True)
    p.add_argument("--geom-col", default="wkt")
    p.add_argument("-q", "--cql", help="ECQL filter applied before export")
    p.add_argument("--lon", default="lon")
    p.add_argument("--lat", default="lat")
    p.add_argument("--dtg", default="dtg")
    p.set_defaults(fn=cmd_export)

    p = sub.add_parser("stats")
    p.add_argument("--input", required=True)
    p.add_argument("--spec", required=True)
    p.add_argument("--limit", type=int, default=100)
    p.set_defaults(fn=cmd_stats)

    p = sub.add_parser("sql")
    p.add_argument("--query", required=True)
    p.add_argument("--view", action="append", help="name=parquet_path (repeatable)")
    p.add_argument("--output")
    p.add_argument("--limit", type=int, default=100)
    p.add_argument("--spatial-rewrite", action="store_true")
    p.set_defaults(fn=cmd_sql)

    p = sub.add_parser("stats-analyze")
    p.add_argument("--input", required=True)
    p.add_argument("--cell-col")
    p.set_defaults(fn=cmd_stats_analyze)

    p = sub.add_parser("describe")
    p.add_argument("--input", required=True)
    p.set_defaults(fn=cmd_describe)

    p = sub.add_parser("explain")
    p.add_argument("--input", required=True)
    p.add_argument("-q", "--cql", required=True)
    p.add_argument("--z2-col")
    p.add_argument("--lon", default="lon")
    p.add_argument("--lat", default="lat")
    p.add_argument("--dtg", default="dtg")
    p.set_defaults(fn=cmd_explain)

    p = sub.add_parser("compact")
    p.add_argument("--table", required=True)
    p.set_defaults(fn=cmd_compact)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
