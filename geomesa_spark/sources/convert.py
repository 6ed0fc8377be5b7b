"""Converter ingest: delimited text / JSON → typed feature tables.

Reference: geomesa-convert — DelimitedTextConverter.scala /
JsonConverter.scala plus the transform-expression language in
geomesa-convert-common/.../convert2/transforms/*.scala, and the SFT
spec-string schema DSL (geomesa-utils/.../geotools/SimpleFeatureTypes.
scala::createType, e.g. ``"name:String,age:Int,dtg:Date,*geom:Point:
srid=4326"``).

Spark-first: the converter compiles to a plain DataFrame plan —
``spark.read.csv/json`` with an explicit schema plus a column
expression per transform — so ingest runs fully in codegen (the
reference evaluates its transform ASTs row-at-a-time per feature).
Geometry attributes land as WKT string columns (+ lon/lat doubles for
points), matching the engine's geometry convention.

Transform language subset (reference transforms → Spark exprs):
``$1`` field refs, ``concatenate``, ``trim``, ``lowerCase``,
``upperCase``, ``regexReplace``, ``substring``, ``length``,
``toString``, ``date(pattern, $n)``, ``isoDate``, ``millisToDate``,
``secsToDate``, ``md5``, ``murmurHash3``(→xxhash64), ``uuid``,
``base64Encode/Decode``, ``jsonPath``(→get_json_object), ``add/
subtract/multiply/divide``, ``try``/``withDefault``(→coalesce),
``point($x,$y)``, ``geometry($wkt)``.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "sft_to_schema",
    "parse_sft",
    "read_delimited",
    "read_json",
    "read_geojson",
    "read_geojson_collection",
    "geojson_geometry_to_wkt",
    "read_xml",
    "read_fixed_width",
    "compile_transform",
    "register_script",
    "unregister_script",
    "with_error_mode",
]

_SFT_TYPES = {
    "string": T.StringType(),
    "int": T.IntegerType(),
    "integer": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "boolean": T.BooleanType(),
    "date": T.TimestampType(),
    "uuid": T.StringType(),
    "bytes": T.BinaryType(),
    # geometry attributes: WKT string convention
    "point": T.StringType(),
    "linestring": T.StringType(),
    "polygon": T.StringType(),
    "multipoint": T.StringType(),
    "multilinestring": T.StringType(),
    "multipolygon": T.StringType(),
    "geometry": T.StringType(),
    "geometrycollection": T.StringType(),
}

_GEOM_TYPES = {k for k in _SFT_TYPES if k.startswith(("point", "line", "poly", "multi", "geometry"))}


def _split_spec(spec: str) -> list[str]:
    """Split on commas outside List[...] / Map[...] brackets."""
    parts, depth, start = [], 0, 0
    for i, ch in enumerate(spec):
        if ch == "[":
            depth += 1
        elif ch == "]":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(spec[start:i])
            start = i + 1
    parts.append(spec[start:])
    return parts


def parse_sft(spec: str) -> list[dict]:
    """Parse the SFT spec string into attribute descriptors:
    [{name, type, is_default_geom, options}]."""
    out = []
    for part in filter(None, (p.strip() for p in _split_spec(spec))):
        default = part.startswith("*")
        if default:
            part = part[1:]
        bits = part.split(":")
        name, typ = bits[0], bits[1].lower()
        opts = dict(b.split("=", 1) for b in bits[2:] if "=" in b)
        if typ.startswith("list[") or typ.startswith("map["):
            inner = typ[typ.index("[") + 1 : -1]
            if typ.startswith("list"):
                dtype = T.ArrayType(_SFT_TYPES[inner.strip().lower()])
            else:
                k, v = (s.strip().lower() for s in inner.split(","))
                dtype = T.MapType(_SFT_TYPES[k], _SFT_TYPES[v])
        else:
            dtype = _SFT_TYPES[typ]
        out.append(
            {"name": name, "type": typ, "dtype": dtype, "is_default_geom": default, "options": opts}
        )
    return out


def sft_to_schema(spec: str) -> T.StructType:
    """SFT spec string → StructType (reference SparkUtils.sft2StructType
    direction, minus the UDT)."""
    return T.StructType(
        [T.StructField(a["name"], a["dtype"], True) for a in parse_sft(spec)]
    )


_FIELD_RE = re.compile(r"\$(\d+)")


#: scripted transform functions, callable from transform expressions as
#: ``udf:name(args...)`` — the analogue of the reference's scripting
#: factory (geomesa-convert-common .../transforms/
#: ScriptingFunctionFactory.scala :~60, where converter configs call
#: user JS as ``js:name(...)``). Registered functions are wrapped as
#: Arrow-batched pandas UDFs, so scripted ingest stays vectorized.
_SCRIPT_REGISTRY: dict[str, "F.udf"] = {}


def register_script(name: str, fn, return_type: str = "string") -> None:
    """Register a vectorized Python function for converter transforms.

    ``fn`` receives one ``pandas.Series`` per argument and must return a
    ``pandas.Series`` of ``return_type`` (it is wrapped in a
    ``pandas_udf``, so each call processes an Arrow batch, never a row).
    After registration, any transform expression may invoke it as
    ``udf:name($1, ...)``.
    """
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    # explicit SCALAR type: the decorator form infers the kind from type
    # hints, which breaks for callers using `from __future__ import
    # annotations` (hints arrive as unresolvable strings)
    _SCRIPT_REGISTRY[name] = pandas_udf(fn, return_type, PandasUDFType.SCALAR)


def unregister_script(name: str) -> None:
    _SCRIPT_REGISTRY.pop(name, None)


def _split_args(raw: str) -> list[str]:
    """Split a transform call's argument text on top-level commas
    (shared by the built-in and udf: branches of compile_transform)."""
    args, depth, start = [], 0, 0
    for i, ch in enumerate(raw):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            args.append(raw[start:i])
            start = i + 1
    if raw.strip():
        args.append(raw[start:])
    return args


def compile_transform(expr: str, fields: list[str]) -> Column:
    """Compile one converter transform expression to a Column.

    ``$n`` refers to the n-th raw input column (1-based, $0 = whole
    record is not supported). Nested calls compile recursively.
    ``udf:name(args)`` invokes a function registered with
    :func:`register_script`.
    """
    expr = expr.strip()
    m = _FIELD_RE.fullmatch(expr)
    if m:
        return F.col(fields[int(m.group(1)) - 1])
    if expr.startswith("'") and expr.endswith("'"):
        return F.lit(expr[1:-1])
    if re.fullmatch(r"-?\d+(\.\d+)?", expr):
        return F.lit(float(expr) if "." in expr else int(expr))

    scripted = re.fullmatch(r"udf:(\w+)\((.*)\)", expr, re.S)
    if scripted:
        fn_name, raw = scripted.group(1), scripted.group(2)
        if fn_name not in _SCRIPT_REGISTRY:
            raise ValueError(f"unregistered scripted function: {fn_name!r}")
        return _SCRIPT_REGISTRY[fn_name](
            *[compile_transform(a, fields) for a in _split_args(raw)]
        )

    call = re.fullmatch(r"(\w+)\((.*)\)", expr, re.S)
    if not call:
        raise ValueError(f"bad transform expression: {expr!r}")
    fn, raw_args = call.group(1), call.group(2)
    args = _split_args(raw_args)
    c = [compile_transform(a, fields) for a in args]

    table = {
        "concatenate": lambda: F.concat(*c),
        "trim": lambda: F.trim(c[0]),
        "lowerCase": lambda: F.lower(c[0]),
        "upperCase": lambda: F.upper(c[0]),
        "regexReplace": lambda: F.regexp_replace(c[2], args[0].strip().strip("'"), args[1].strip().strip("'")),
        "substring": lambda: F.substring(c[0], int(args[1]) + 1, int(args[2]) - int(args[1])),
        "length": lambda: F.length(c[0]),
        "toString": lambda: c[0].cast("string"),
        "date": lambda: F.to_timestamp(c[1], args[0].strip().strip("'")),
        "isoDate": lambda: F.to_timestamp(c[0], "yyyyMMdd"),
        "isoDateTime": lambda: F.to_timestamp(c[0], "yyyyMMdd'T'HHmmss"),
        "millisToDate": lambda: F.timestamp_millis(c[0].cast("long")),
        "secsToDate": lambda: F.timestamp_seconds(c[0].cast("long")),
        "md5": lambda: F.md5(c[0].cast("string")),
        "murmurHash3": lambda: F.xxhash64(c[0]),
        "uuid": lambda: F.expr("uuid()"),
        "base64Encode": lambda: F.base64(c[0].cast("binary")),
        "base64Decode": lambda: F.unbase64(c[0]),
        "jsonPath": lambda: F.get_json_object(c[1], args[0].strip().strip("'")),
        "add": lambda: c[0] + c[1],
        "subtract": lambda: c[0] - c[1],
        "multiply": lambda: c[0] * c[1],
        "divide": lambda: c[0] / c[1],
        "withDefault": lambda: F.coalesce(*c),
        "try": lambda: F.coalesce(*c) if len(c) > 1 else c[0],
        "point": lambda: F.concat(
            F.lit("POINT ("), c[0].cast("string"), F.lit(" "), c[1].cast("string"), F.lit(")")
        ),
        "geometry": lambda: c[0],
        "intToDouble": lambda: c[0].cast("double"),
        "stringToDouble": lambda: c[0].try_cast("double"),
        "stringToInt": lambda: c[0].try_cast("int"),
        "stringToLong": lambda: c[0].try_cast("long"),
        "toDouble": lambda: c[0].try_cast("double"),
        "toInt": lambda: c[0].try_cast("int"),
        "toLong": lambda: c[0].try_cast("long"),
        "toBoolean": lambda: c[0].try_cast("boolean"),
        "emptyToNull": lambda: F.when(F.trim(c[0]) == "", None).otherwise(c[0]),
        "stringToBytes": lambda: c[0].cast("binary"),
        "bytesToString": lambda: c[0].cast("string"),
        "dateToMillis": lambda: F.unix_timestamp(c[0]) * 1000
        + F.date_format(c[0], "SSS").cast("long"),
        "printf": lambda: F.format_string(args[0].strip().strip("'"), *c[1:]),
        "strlen": lambda: F.length(c[0]),
        "capitalize": lambda: F.initcap(c[0]),
        "list": lambda: F.array(*c),
        "listItem": lambda: F.element_at(c[0], F.lit(int(args[1]) + 1)),
        "mapValue": lambda: F.element_at(c[0], args[1].strip().strip("'")),
    }
    if fn not in table:
        raise ValueError(f"unknown transform function: {fn!r}")
    return table[fn]()


def read_delimited(
    spark: SparkSession,
    path: str,
    sft_spec: str,
    transforms: dict[str, str] | None = None,
    delimiter: str = ",",
    header: bool = False,
) -> DataFrame:
    """DelimitedTextConverter: CSV/TSV → SFT-typed DataFrame.

    Without transforms, raw columns map positionally onto the SFT
    attributes with casts. With transforms, each SFT attribute is a
    transform expression over the raw columns ($1-based).
    """
    attrs = parse_sft(sft_spec)
    raw = (
        spark.read.option("delimiter", delimiter)
        .option("header", str(header).lower())
        .csv(path)
    )
    fields = raw.columns
    cols = []
    for i, a in enumerate(attrs):
        if transforms and a["name"] in transforms:
            c = compile_transform(transforms[a["name"]], fields)
        else:
            c = F.col(fields[i])
        if a["type"] == "date" and not (transforms and a["name"] in transforms):
            c = F.to_timestamp(c)
        else:
            c = c.try_cast(a["dtype"]) if not isinstance(a["dtype"], (T.ArrayType, T.MapType)) else c
        cols.append(c.alias(a["name"]))
    return raw.select(*cols)


def with_error_mode(
    df: DataFrame,
    required: list[str],
    mode: str = "skip",
    observation_name: str = "convert_errors",
):
    """Converter ErrorMode + ingest counters (reference geomesa-convert
    EvaluationContext: success/failure counters, ErrorMode.SkipBadRecords
    vs RaiseErrors — convert2/EvaluationContext.scala, ErrorMode.scala).

    A record FAILS when any required SFT attribute is null after
    conversion — the converters cast with ``try_cast``, so a parse
    failure surfaces as a null, exactly like the reference's per-field
    try/catch. Modes:

    - ``'skip'``  (SkipBadRecords): drop failures; returns
      ``(clean_df, observation)`` where the Observation rides the NEXT
      action on ``clean_df`` and then carries ``{"records", "failed"}``
      metrics — counters with ZERO extra pass, the Spark analogue of the
      reference's streaming counters (same trick the tile writer uses
      for its manifest stats).
    - ``'raise'`` (RaiseErrors): returns a DataFrame that fails the job
      on the first bad record (codegen'd raise_error, no Python).
    - ``'keep'``: returns the DataFrame with a ``__failed`` boolean
      column for caller-side routing (dead-letter queues).
    """
    from pyspark.sql import Observation

    failed = F.lit(False)
    for r in required:
        failed = failed | F.col(r).isNull()
    if mode == "keep":
        return df.withColumn("__failed", failed)
    if mode == "raise":
        return df.where(
            F.when(
                failed,
                F.raise_error(
                    F.concat(
                        F.lit("malformed record: null in required attribute of ("),
                        *[F.concat(F.coalesce(F.col(r).cast("string"), F.lit("∅")), F.lit(" ")) for r in required],
                        F.lit(")"),
                    )
                ),
            ).otherwise(F.lit(True))
        )
    if mode != "skip":
        raise ValueError(f"unknown error mode {mode!r} (skip | raise | keep)")
    obs = Observation(observation_name)
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("records"),
        F.sum(failed.cast("long")).alias("failed"),
    )
    return observed.where(~failed), obs


def geojson_geometry_to_wkt(col: Column) -> Column:
    """GeoJSON geometry-object JSON string → WKT column.

    Arrow-batched pandas UDF (coordinate nesting depth varies by type,
    which defeats a single from_json schema); the inverse of
    st_asGeoJSON. An ingest-boundary kernel, not a join hot path.
    """

    @F.pandas_udf(T.StringType())
    def conv(s: pd.Series) -> pd.Series:
        import json as _json

        import numpy as np

        from geomesa_spark.geom import Geometry, to_wkt

        def one(txt):
            if txt is None:
                return None
            try:
                g = _json.loads(txt)
                t = g["type"].upper()
                c = g.get("coordinates")
                if t == "POINT":
                    return to_wkt(Geometry("POINT", [np.array([c], dtype=float)]))
                if t in ("LINESTRING", "MULTIPOINT"):
                    return to_wkt(Geometry(t, [np.array(c, dtype=float)]))
                if t in ("POLYGON", "MULTILINESTRING"):
                    return to_wkt(Geometry(t, [np.array(r, dtype=float) for r in c]))
                if t == "MULTIPOLYGON":
                    rings, ring_poly = [], []
                    for pi, poly in enumerate(c):
                        for r in poly:
                            rings.append(np.array(r, dtype=float))
                            ring_poly.append(pi)
                    return to_wkt(Geometry(t, rings, ring_poly))
                return None
            except Exception:
                return None

        return s.map(one)

    return conv(col)


def read_geojson(
    spark: SparkSession,
    path: str,
    sft_spec: str,
    geom_attr: str | None = None,
) -> DataFrame:
    """GeoJSON-lines converter (reference geomesa-convert-json GeoJSON
    mode): one Feature per line → SFT-typed DataFrame. Properties map
    by name; the default-geometry attribute gets the feature's geometry
    as WKT (plus lon/lat doubles when it is a Point)."""
    attrs = parse_sft(sft_spec)
    if geom_attr is None:
        geom_attr = next(
            (a["name"] for a in attrs if a["is_default_geom"] or a["type"] in _GEOM_TYPES),
            None,
        )
    raw = spark.read.text(path)
    cols = []
    for a in attrs:
        if a["name"] == geom_attr:
            c = geojson_geometry_to_wkt(
                F.get_json_object(F.col("value"), "$.geometry")
            )
        else:
            c = F.get_json_object(F.col("value"), f"$.properties.{a['name']}")
            if a["type"] == "date":
                c = F.to_timestamp(c)
            elif not isinstance(a["dtype"], (T.ArrayType, T.MapType)):
                c = c.try_cast(a["dtype"])
        cols.append(c.alias(a["name"]))
    out = raw.select(*cols)
    if geom_attr and any(a["name"] == geom_attr and a["type"] == "point" for a in attrs):
        pt = r"POINT \(([-+0-9.eE]+) ([-+0-9.eE]+)\)"
        out = out.withColumn(
            "lon", F.regexp_extract(F.col(geom_attr), pt, 1).try_cast("double")
        ).withColumn(
            "lat", F.regexp_extract(F.col(geom_attr), pt, 2).try_cast("double")
        )
    return out


def read_geojson_collection(
    spark: SparkSession,
    path: str,
    sft_spec: str,
    geom_attr: str | None = None,
) -> DataFrame:
    """Whole-document GeoJSON ``FeatureCollection`` converter (reference
    geomesa-convert-json with a feature-path over a collection document,
    JsonConverter.scala) — the complement of :func:`read_geojson`'s
    one-feature-per-line mode.

    Spark-first: multiLine JSON read with an EXPLICIT schema that types
    ``geometry``/``properties`` as strings — Spark's Jackson parser
    re-emits object tokens as raw JSON text for StringType fields, so no
    schema inference pass and no dependence on the collection being
    homogeneous. Features explode JVM-side; per-attribute extraction is
    the same get_json_object/codegen path as the lines reader."""
    attrs = parse_sft(sft_spec)
    if geom_attr is None:
        geom_attr = next(
            (a["name"] for a in attrs if a["is_default_geom"] or a["type"] in _GEOM_TYPES),
            None,
        )
    schema = T.StructType(
        [
            T.StructField(
                "features",
                T.ArrayType(
                    T.StructType(
                        [
                            T.StructField("geometry", T.StringType()),
                            T.StructField("properties", T.StringType()),
                            T.StructField("id", T.StringType()),
                        ]
                    )
                ),
            )
        ]
    )
    doc = spark.read.schema(schema).option("multiLine", True).json(path)
    feats = doc.select(F.explode("features").alias("f"))
    cols = []
    for a in attrs:
        if a["name"] == geom_attr:
            c = geojson_geometry_to_wkt(F.col("f.geometry"))
        else:
            c = F.get_json_object(F.col("f.properties"), f"$.{a['name']}")
            if a["type"] == "date":
                c = F.to_timestamp(c)
            elif not isinstance(a["dtype"], (T.ArrayType, T.MapType)):
                c = c.try_cast(a["dtype"])
        cols.append(c.alias(a["name"]))
    out = feats.select(*cols)
    if geom_attr and any(a["name"] == geom_attr and a["type"] == "point" for a in attrs):
        pt = r"POINT \(([-+0-9.eE]+) ([-+0-9.eE]+)\)"
        out = out.withColumn(
            "lon", F.regexp_extract(F.col(geom_attr), pt, 1).try_cast("double")
        ).withColumn(
            "lat", F.regexp_extract(F.col(geom_attr), pt, 2).try_cast("double")
        )
    return out


def read_xml(
    spark: SparkSession,
    path: str,
    sft_spec: str,
    xpaths: dict[str, str] | None = None,
    record_tag: str | None = None,
) -> DataFrame:
    """XmlConverter (reference geomesa-convert-xml XmlConverter.scala):
    XML records → SFT-typed DataFrame.

    Spark-first: extraction uses the BUILT-IN ``xpath_string`` SQL
    function (Hive UDF, JVM-side — no per-row Python and no external
    XML package). One record per line by default; with ``record_tag``,
    multi-record lines/documents are exploded by splitting on the
    element boundary first (regexp, codegen).

    xpaths maps attribute → XPath relative to the record root, e.g.
    ``{"name": "/feature/name/text()"}``; defaults to
    ``/<record_tag or first tag>/<attr>/text()``.
    """
    attrs = parse_sft(sft_spec)
    raw = spark.read.text(path)
    rec = F.col("value")
    if record_tag:
        pieces = F.expr(
            f"regexp_extract_all(value, '<{record_tag}[\\\\s\\\\S]*?</{record_tag}>', 0)"
        )
        raw = raw.select(F.explode(pieces).alias("value"))
        rec = F.col("value")
    cols = []
    for a in attrs:
        xp = (xpaths or {}).get(a["name"])
        if xp is None:
            root = record_tag or "*"
            xp = f"//{a['name']}/text()" if root == "*" else f"/{root}/{a['name']}/text()"
        c = F.expr(f"xpath_string(value, '{xp}')")
        if a["type"] == "date":
            c = F.to_timestamp(c)
        elif not isinstance(a["dtype"], (T.ArrayType, T.MapType)):
            c = c.try_cast(a["dtype"])
        cols.append(c.alias(a["name"]))
    return raw.select(*cols)


def read_fixed_width(
    spark: SparkSession,
    path: str,
    sft_spec: str,
    offsets: list[tuple[int, int]],
    transforms: dict[str, str] | None = None,
) -> DataFrame:
    """FixedWidthConverter (reference geomesa-convert-fixedwidth):
    byte-offset fields → SFT-typed DataFrame.

    ``offsets[i] = (start, width)`` (0-based start) for the i-th SFT
    attribute — pure ``substring`` + cast column expressions, one
    codegen stage. ``transforms`` (attr → expression over $1..$n field
    refs, $i = the i-th sliced field) compile like the delimited
    converter's.
    """
    attrs = parse_sft(sft_spec)
    if len(offsets) != len(attrs):
        raise ValueError("read_fixed_width: one (start, width) per SFT attribute")
    raw = spark.read.text(path)
    sliced = raw.select(
        *[
            F.trim(F.substring(F.col("value"), start + 1, width)).alias(f"_f{i+1}")
            for i, (start, width) in enumerate(offsets)
        ]
    )
    fields = sliced.columns
    cols = []
    for i, a in enumerate(attrs):
        if transforms and a["name"] in transforms:
            c = compile_transform(transforms[a["name"]], fields)
        else:
            c = F.col(fields[i])
        if a["type"] == "date" and not (transforms and a["name"] in transforms):
            c = F.to_timestamp(c)
        elif not isinstance(a["dtype"], (T.ArrayType, T.MapType)):
            c = c.try_cast(a["dtype"])
        cols.append(c.alias(a["name"]))
    return sliced.select(*cols)


def read_json(
    spark: SparkSession,
    path: str,
    sft_spec: str,
    field_paths: dict[str, str] | None = None,
) -> DataFrame:
    """JsonConverter: JSON lines → SFT-typed DataFrame; ``field_paths``
    maps attribute → JSONPath-ish path (get_json_object syntax)."""
    attrs = parse_sft(sft_spec)
    if not field_paths:
        return spark.read.schema(sft_to_schema(sft_spec)).json(path)
    raw = spark.read.text(path)
    cols = []
    for a in attrs:
        p = field_paths.get(a["name"], f"$.{a['name']}")
        c = F.get_json_object(F.col("value"), p)
        if a["type"] == "date":
            c = F.to_timestamp(c)
        elif not isinstance(a["dtype"], (T.ArrayType, T.MapType)):
            c = c.try_cast(a["dtype"])
        cols.append(c.alias(a["name"]))
    return raw.select(*cols)
