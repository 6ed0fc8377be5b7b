"""Stats layer: GeoMesa's mergeable-sketch stat suite as Spark aggregates.

Reference: geomesa-utils/src/main/scala/org/locationtech/geomesa/utils/
stats/{Stat.scala (DSL parser), MinMax.scala, CountStat.scala,
Frequency.scala, TopK.scala, Histogram.scala, DescriptiveStats.scala,
GroupBy.scala} and the scan-side StatsScan (geomesa-index-api/.../index/
iterators/StatsScan.scala). GeoMesa computes partial sketches per tablet
and merges client-side — exactly Spark's partial/final hash aggregation,
so every stat maps to built-in aggregate expressions (JVM, codegen;
HLL/CMS use Spark's own mergeable sketch implementations).

The Stat-DSL front-end accepts the reference's spec-string grammar,
e.g. ``"MinMax(dtg);Count();TopK(name,10);Histogram(age,10,0,100)"``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "minmax",
    "descriptive_stats",
    "histogram",
    "topk",
    "enumeration",
    "cardinality",
    "frequency",
    "run_stats_dsl",
]


def minmax(df: DataFrame, cols: list[str]) -> DataFrame:
    """A1: per-attribute min/max + exact count (one row)."""
    aggs = [F.count("*").alias("count")]
    for c in cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    return df.agg(*aggs)


def cardinality(df: DataFrame, col: str, rsd: float = 0.05) -> DataFrame:
    """A2: approximate distinct count (Spark HLL++, mergeable like the
    reference's HyperLogLog in MinMax) next to the exact count."""
    return df.agg(
        F.approx_count_distinct(col, rsd).alias(f"approx_distinct_{col}"),
        F.countDistinct(col).alias(f"exact_distinct_{col}"),
    )


def frequency(df: DataFrame, col: str) -> DataFrame:
    """A3: per-value frequencies (exact groupBy — partial/final combine;
    Spark's count_min_sketch agg is the sketch form when the value
    domain is unbounded)."""
    return df.groupBy(col).agg(F.count("*").alias("freq"))


def topk(df: DataFrame, col: str, k: int = 10) -> DataFrame:
    """A4: exact heavy hitters; deterministic tie-break on the value."""
    return (
        df.groupBy(col)
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col(col).asc())
        .limit(k)
    )


def enumeration(df: DataFrame, col: str) -> DataFrame:
    """Enumeration(attr): exact value→count (reference EnumerationStat)."""
    return frequency(df, col)


def histogram(df: DataFrame, col: str, bins: int, lo: float, hi: float) -> DataFrame:
    """A5: fixed-width binned counts; floor arithmetic (no width_bucket —
    DuckDB-oracle-portable), bins clamped to [0, bins-1]."""
    w = (hi - lo) / bins
    b = F.floor((F.col(col) - lo) / w).cast("int")
    b = F.least(F.greatest(b, F.lit(0)), F.lit(bins - 1))
    return (
        df.where(F.col(col).isNotNull())
        .groupBy(b.alias("bin"))
        .agg(F.count("*").alias("cnt"))
    )


def descriptive_stats(df: DataFrame, cols: list[str]) -> DataFrame:
    """A6: count/mean/variance/skewness/kurtosis per attribute (Welford-
    mergeable in the reference; Spark's ImperativeAggregates here)."""
    aggs = [F.count("*").alias("count")]
    for c in cols:
        aggs += [
            F.avg(c).alias(f"mean_{c}"),
            F.var_samp(c).alias(f"var_{c}"),
            F.skewness(c).alias(f"skew_{c}"),
            F.kurtosis(c).alias(f"kurt_{c}"),
        ]
    return df.agg(*aggs)


def run_stats_dsl(df: DataFrame, spec: str) -> dict[str, DataFrame]:
    """A8: parse the reference Stat DSL and run each component.

    Returns {component_spec: DataFrame}. Scalar stats are one-row
    frames; grouped stats (Enumeration/TopK/Histogram/GroupBy) are
    one-row-per-group. GroupBy nests one level, as the reference does:
    ``GroupBy(attr,Count())``.
    """
    def parse(stmt: str) -> tuple[str, str]:
        i = stmt.find("(")
        if i < 0 or not stmt.endswith(")"):
            raise ValueError(f"bad stat spec: {stmt!r}")
        return stmt[:i], stmt[i + 1 : -1]

    out: dict[str, DataFrame] = {}
    for stmt in filter(None, (s.strip() for s in spec.split(";"))):
        name, raw = parse(stmt.replace(" ", ""))
        args = [a for a in raw.split(",") if a != ""]
        if name == "Count":
            out[stmt] = df.agg(F.count("*").alias("count"))
        elif name == "MinMax":
            out[stmt] = minmax(df, [args[0]]).drop("count")
        elif name == "Cardinality":
            out[stmt] = cardinality(df, args[0])
        elif name == "Enumeration":
            out[stmt] = enumeration(df, args[0])
        elif name == "TopK":
            out[stmt] = topk(df, args[0], int(args[1]) if len(args) > 1 else 10)
        elif name == "Frequency":
            out[stmt] = frequency(df, args[0])
        elif name == "Histogram":
            out[stmt] = histogram(df, args[0], int(args[1]), float(args[2]), float(args[3]))
        elif name == "DescriptiveStats":
            out[stmt] = descriptive_stats(df, args)
        elif name == "GroupBy":
            attr, inner = raw.split(",", 1)
            iname, iraw = parse(inner)
            if iname == "Count":
                out[stmt] = df.groupBy(attr).agg(F.count("*").alias("count"))
            elif iname == "MinMax":
                out[stmt] = df.groupBy(attr).agg(
                    F.min(iraw).alias(f"min_{iraw}"), F.max(iraw).alias(f"max_{iraw}")
                )
            else:
                raise ValueError(f"unsupported GroupBy inner stat: {inner!r}")
        else:
            raise ValueError(f"unknown stat: {name!r}")
    return out
