"""Unified query entry point — the reference's GeoTools Query object
surface (reference: geomesa-index-api QueryRunner/QueryPlanner +
geomesa-index-api/.../conf/QueryHints.scala: DENSITY_BBOX/WIDTH/
HEIGHT/WEIGHT, STATS_STRING, BIN_TRACK/DTG/LABEL, SAMPLING/SAMPLE_BY).

A reference user runs everything through one shape:
``Query(typeName, ecqlFilter, transforms)`` + hints that switch the
scan into a server-side aggregation. :func:`run_query` reproduces that
contract over a DataFrame: ECQL filter (index-aware through
``plan_ecql``), then EITHER a hint-selected aggregation (density / BIN
/ stats / sampling) or the transform projection. Hints dispatch to the
same operators the driver queries certify — this is a front door, not
a second implementation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["run_query"]

_DENSITY_KEYS = {"density_bbox", "density_width", "density_height", "density_weight"}
_BIN_KEYS = {"bin_track", "bin_dtg", "bin_label"}
_KNOWN = _DENSITY_KEYS | _BIN_KEYS | {"stats_string", "sampling", "sample_by"}


def run_query(
    df: DataFrame,
    filter: str | None = None,  # noqa: A002 - reference name
    transforms: list[str] | None = None,
    hints: dict | None = None,
    lon: str = "lon",
    lat: str = "lat",
    dtg: str = "dtg",
    geom_attr: str = "geom",
    z2_col: str | None = None,
    z3_cols: tuple[str, str] | None = None,
):
    """Run a reference-shaped query: ECQL filter → hints aggregation or
    transform projection.

    Returns a DataFrame for scan/density/BIN/sampling queries, or a
    ``{stat_name: DataFrame}`` dict for ``stats_string`` (mirroring the
    reference's stats query returning an encoded Stat, not features).
    Exactly one hint family may be set per query (reference QueryPlanner
    picks one scan type). Unknown hint keys raise — silent typos in a
    hints map are the reference's own footgun, not one to copy.
    """
    hints = dict(hints or {})
    unknown = set(hints) - _KNOWN
    if unknown:
        raise ValueError(f"unknown query hints: {sorted(unknown)}")
    families = [
        name
        for name, keys in (
            ("density", _DENSITY_KEYS),
            ("bin", _BIN_KEYS),
            ("stats", {"stats_string"}),
            ("sampling", {"sampling", "sample_by"}),
        )
        if keys & set(hints)
    ]
    if len(families) > 1:
        raise ValueError(f"conflicting hint families: {families}")

    from geomesa_spark.plans.audit import audit_event

    audit_event(event="query.run", filter=filter, hints=sorted(hints), transforms=transforms)

    out = df
    if filter:
        from geomesa_spark.plans.ecql import plan_ecql

        out = plan_ecql(
            out, filter, lon=lon, lat=lat, dtg=dtg, geom_attr=geom_attr,
            z2_col=z2_col, z3_cols=z3_cols,
        )

    if not families:
        if transforms:
            from geomesa_spark.plans.ecql import apply_transforms

            out = apply_transforms(out, transforms, lon=lon, lat=lat, geom_attr=geom_attr)
        return out

    family = families[0]
    if family == "density":
        from geomesa_spark.operators.tiles import density_grid

        return density_grid(
            out,
            hints["density_bbox"],
            int(hints.get("density_width", 256)),
            int(hints.get("density_height", 128)),
            weight_col=hints.get("density_weight"),
            lon=lon,
            lat=lat,
        )
    if family == "bin":
        from geomesa_spark.sources.export import bin_records

        return bin_records(
            out,
            track_col=hints["bin_track"],
            dtg_col=hints.get("bin_dtg", dtg),
            lon_col=lon,
            lat_col=lat,
            label_col=hints.get("bin_label"),
        )
    if family == "stats":
        from geomesa_spark.operators.stats import run_stats_dsl

        return run_stats_dsl(out, hints["stats_string"])
    # sampling: deterministic 1-in-k. With sample_by, the reference's
    # per-key thinning (window rank mod k); without, a value-derived
    # hash filter — no global window, no partition-layout dependence.
    frac = float(hints.get("sampling", 0.1))
    k = max(1, round(1.0 / frac))
    by = hints.get("sample_by")
    if by:
        from pyspark.sql import Window

        w = Window.partitionBy(by).orderBy(*[F.col(c).asc() for c in out.columns])
        return (
            out.withColumn("__rn", F.row_number().over(w))
            .where(((F.col("__rn") - 1) % k) == 0)
            .drop("__rn")
        )
    return out.where(
        F.pmod(F.xxhash64(*[F.col(c) for c in out.columns]), F.lit(k)) == 0
    )
