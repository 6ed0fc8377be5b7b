"""Density aggregation (heatmap) and tile materialization.

Reference: geomesa-index-api/.../index/iterators/DensityScan.scala —
renders features into a width×height grid over an envelope with a
weight expression, partial per-range grids merged client-side. In Spark
that is literally partial/final hash aggregation over a floor-binned
cell id: ``groupBy(floor((lon-x0)/dx), floor((lat-y0)/dy)).sum(weight)``
— all built-ins, whole-stage codegen, no UDF.

Tile materialization writes the aggregated grid (or the raw cell-keyed
points) as a parquet table bucketed by cell prefix with a salt column
for hot tiles, plus an Iceberg-style JSON manifest with per-partition
lineage + metrics (sources/catalog.py) so jobs are checkpoint-resumable.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from geomesa_spark.sources.catalog import write_manifest

__all__ = [
    "density_grid",
    "smooth_density",
    "idw_surface",
    "grid_dbscan",
    "hotspots",
    "gi_star",
    "local_moran",
    "emerging_hotspots",
    "quadrat_test",
    "global_autocorr",
    "rasterize_coverage",
    "tile_pyramid",
    "write_tiles",
    "read_tiles",
    "vectorize_density",
    "web_mercator_tiles",
    "quadkey_col",
    "quadkey_pyramid",
    "raster_algebra",
    "zonal_stats",
    "contour_segments",
    "dissolve_envelopes",
    "focal_stats",
    "slope_grid",
    "majority_filter",
    "proximity_grid",
    "tri_grid",
    "aspect_grid",
]

# marching-squares case table: (case index, segment slot, center rule,
# edge pair) with edges B=0 R=1 T=2 L=3 and corner bits a(bl)=1 b(br)=2
# c(tr)=4 d(tl)=8. Center rule: 0 = unconditional, 1 = only when the
# quad's corner sum >= 4·threshold (saddle connects through the
# center), -1 = only when it doesn't.
_MS_CASES = [
    (1, 0, 0, 0, 3), (2, 0, 0, 0, 1), (3, 0, 0, 1, 3), (4, 0, 0, 1, 2),
    (5, 0, 1, 2, 3), (5, 1, 1, 0, 1), (5, 0, -1, 0, 3), (5, 1, -1, 1, 2),
    (6, 0, 0, 0, 2), (7, 0, 0, 2, 3), (8, 0, 0, 2, 3), (9, 0, 0, 0, 2),
    (10, 0, 1, 0, 3), (10, 1, 1, 1, 2), (10, 0, -1, 0, 1), (10, 1, -1, 2, 3),
    (11, 0, 0, 1, 2), (12, 0, 0, 1, 3), (13, 0, 0, 0, 1), (14, 0, 0, 0, 3),
]

# web-mercator valid latitude (slippy-map convention)
_MERC_MAX_LAT = 85.05112878


def web_mercator_tiles(
    points: DataFrame,
    zoom: int,
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """XYZ (slippy-map) tile assignment at ``zoom`` — the web-mercator
    analogue of the reference's gridded density keys (DensityScan's
    envelope grid rendered into the tiling every map client consumes).

    Adds ``zx``/``zy`` (tile indices, clamped to the valid range) and
    ``quadkey`` (Bing-style digit string, one char per zoom level — the
    prefix-orderable tile key: a tile's ancestors are its quadkey
    prefixes, so prefix ranges select whole subtrees, the same property
    the Z-curve keys exploit). Pure codegen column math — floor/ln/tan
    — no UDF; groups/joins on (zx, zy) shuffle exactly like any other
    cell key and the quadkey prefix is the bucketing key at scale."""
    n = 1 << zoom
    latc = F.least(F.greatest(F.col(lat), F.lit(-_MERC_MAX_LAT)), F.lit(_MERC_MAX_LAT))
    r = F.radians(latc)
    zx = F.least(
        F.greatest(F.floor((F.col(lon) + 180.0) / 360.0 * n), F.lit(0)), F.lit(n - 1)
    ).cast("long")
    zy = F.least(
        F.greatest(
            F.floor(
                (F.lit(1.0) - F.log(F.tan(r) + F.lit(1.0) / F.cos(r)) / F.lit(math.pi))
                / 2.0
                * n
            ),
            F.lit(0),
        ),
        F.lit(n - 1),
    ).cast("long")
    out = points.withColumn("zx", zx).withColumn("zy", zy)
    return out.withColumn("quadkey", quadkey_col(F.col("zx"), F.col("zy"), zoom))


def quadkey_col(zx, zy, zoom: int):
    """Bing quadkey digits, most-significant level first:
    digit_i = bit i of x + 2·bit i of y, i = zoom-1 … 0."""
    digits = [
        (
            F.shiftright(zx, i).bitwiseAND(F.lit(1))
            + F.shiftright(zy, i).bitwiseAND(F.lit(1)) * 2
        ).cast("string")
        for i in range(zoom - 1, -1, -1)
    ]
    return F.concat(*digits)


def quadkey_pyramid(
    tiles: DataFrame,
    zoom: int,
    min_zoom: int,
    quadkey_col: str = "quadkey",
) -> DataFrame:
    """Tile-pyramid rollup on quadkey prefixes: per-tile counts at every
    zoom in [min_zoom, zoom] in ONE pass — a tile's ancestors are its
    quadkey prefixes, so level-L counts are a groupBy on
    substring(quadkey, 1, L). The level sequence explodes per row
    ((zoom-min_zoom+1)× expansion) into a single hash aggregate with
    map-side partials — the pyramid materialization a tile server runs
    after every ingest, without one scan per level.

    Output: (level int, qk string, n long)."""
    lv = F.explode(F.sequence(F.lit(min_zoom), F.lit(zoom))).alias("level")
    return (
        tiles.select(F.col(quadkey_col), lv)
        .groupBy("level", F.expr(f"substring({quadkey_col}, 1, level)").alias("qk"))
        .agg(F.count("*").alias("n"))
    )


def raster_algebra(
    a: DataFrame,
    b: DataFrame,
    op: str = "add",
    value_col: str = "cnt",
) -> DataFrame:
    """Local map algebra between two sparse rasters on the SAME grid
    (the raster half of the reference's raster↔vector surface): cell-
    aligned add / subtract / max / min, absent cells = 0.

    Full outer equi-join on the (ix, iy) cell key + coalesce — both
    sides shuffle once on the cell key (or co-locate for free when the
    rasters are bucketed by cell, sources/bucketed.py), and the result
    stays sparse: only cells present in either input appear."""
    ops = {
        "add": lambda x, y: x + y,
        "subtract": lambda x, y: x - y,
        "max": F.greatest,
        "min": F.least,
    }
    if op not in ops:
        raise ValueError(f"raster_algebra op must be one of {sorted(ops)}, got {op!r}")
    va = a.select("ix", "iy", F.col(value_col).alias("__va"))
    vb = b.select("ix", "iy", F.col(value_col).alias("__vb"))
    j = va.join(vb, ["ix", "iy"], "full_outer")
    x = F.coalesce(F.col("__va"), F.lit(0)).cast("long")
    y = F.coalesce(F.col("__vb"), F.lit(0)).cast("long")
    return j.select("ix", "iy", ops[op](x, y).alias(value_col))


def zonal_stats(
    density: DataFrame,
    zones: DataFrame,
    zone_id: str = "zone_id",
    value_col: str = "cnt",
) -> DataFrame:
    """Raster→vector zonal statistics (the RasterQuery/summary side of
    the reference's raster↔vector surface): aggregate a rasterized
    density grid per vector zone.

    ``density`` carries cell-center coords (lon_c, lat_c) + a value
    column; ``zones`` carries envelopes (zone_id, min_lon, min_lat,
    max_lon, max_lat). The zone layer is the small dim side — broadcast
    envelope join (no shuffle on the raster side), then one hash
    aggregate per zone: n_cells, decimal-exact sum, min/max. At 100 TB
    the raster side streams through map-side partial aggregation; only
    |zones| rows shuffle."""
    cond = (
        (density["lon_c"] >= zones["min_lon"])
        & (density["lon_c"] <= zones["max_lon"])
        & (density["lat_c"] >= zones["min_lat"])
        & (density["lat_c"] <= zones["max_lat"])
    )
    j = density.join(F.broadcast(zones), cond, "inner")
    s = F.sum(F.col(value_col).cast("decimal(18,6)"))
    return j.groupBy(zone_id).agg(
        F.count("*").alias("n_cells"),
        s.cast("double").alias("sum_value"),
        F.min(value_col).cast("double").alias("min_value"),
        F.max(value_col).cast("double").alias("max_value"),
    )


def density_grid(
    points: DataFrame,
    bbox: tuple[float, float, float, float],
    width: int,
    height: int,
    weight_col: str | None = None,
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Sparse density grid: one row per non-empty cell.

    Output: (ix int, iy int, weight double, cnt long) where ix/iy index
    the width×height grid over bbox = (x0, y0, x1, y1).
    """
    x0, y0, x1, y1 = bbox
    dx = (x1 - x0) / width
    dy = (y1 - y0) / height
    inb = points.where(
        (F.col(lon) >= x0) & (F.col(lon) < x1) & (F.col(lat) >= y0) & (F.col(lat) < y1)
    )
    w = F.col(weight_col) if weight_col else F.lit(1.0)
    return (
        inb.groupBy(
            F.floor((F.col(lon) - x0) / dx).cast("int").alias("ix"),
            F.floor((F.col(lat) - y0) / dy).cast("int").alias("iy"),
        )
        .agg(F.sum(w).alias("weight"), F.count("*").alias("cnt"))
    )


def _kernel_spread(
    cells: DataFrame,
    carry: list[str],
    radius: int,
    sx: str = "ix",
    sy: str = "iy",
    exclude_self: bool = False,
) -> DataFrame:
    """(2r+1)² Moore-footprint explode over AGGREGATED cells — the
    shared primitive behind smooth_density / idw_surface / hotspots /
    grid_dbscan: one row per (source cell, kx, ky) with target coords.
    Output: (tx, ty, kx, ky, sx, sy, *carry).
    """
    k = F.explode(F.sequence(F.lit(-radius), F.lit(radius)))
    out = (
        cells.select(sx, sy, *carry, k.alias("kx"))
        .select(sx, sy, *carry, "kx", k.alias("ky"))
    )
    if exclude_self:
        out = out.where((F.col("kx") != 0) | (F.col("ky") != 0))
    return out.select(
        (F.col(sx) + F.col("kx")).alias("tx"),
        (F.col(sy) + F.col("ky")).alias("ty"),
        "kx",
        "ky",
        F.col(sx).alias("sx"),
        F.col(sy).alias("sy"),
        *carry,
    )


def smooth_density(
    points: DataFrame,
    bbox: tuple[float, float, float, float],
    width: int,
    height: int,
    radius: int = 1,
    weight_col: str | None = None,
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Focal (kernel) density smoothing — the heatmap variant of A9
    (reference DensityScan renders raw weights; GeoServer-side heatmaps
    convolve them; here the convolution IS the Spark plan).

    Separable integer TENT kernel k(dx,dy) = (r+1-|dx|)·(r+1-|dy|):
    each non-empty grid cell explodes its (2r+1)² kernel footprint
    (sequence × explode, codegen) and the target cell sums
    contribution = cell_weight · k. With unit weights every
    contribution is an exact integer double, so sums are
    order-independent and the DuckDB oracle matches bit-for-bit — a
    Gaussian kernel would hash-drift across libm exp() implementations
    (swap the kernel expression for production smoothing; the plan
    shape is identical). Shuffle cost: one groupBy over |cells|·(2r+1)²
    rows of already-aggregated data, NOT over raw points.

    Output: (ix, iy, weight) over the same grid as density_grid,
    including cells lit only by neighbors; edge cells clip (no wrap).
    """
    r = radius
    g = density_grid(points, bbox, width, height, weight_col=weight_col, lon=lon, lat=lat)
    k = ((F.lit(r + 1) - F.abs(F.col("kx"))) * (F.lit(r + 1) - F.abs(F.col("ky")))).cast(
        "double"
    )
    sm = _kernel_spread(g, ["weight"], r).select(
        "tx", "ty", (F.col("weight") * k).alias("contrib")
    ).where(
        (F.col("tx") >= 0) & (F.col("tx") < width)
        & (F.col("ty") >= 0) & (F.col("ty") < height)
    )
    return (
        sm.groupBy(F.col("tx").cast("int").alias("ix"), F.col("ty").cast("int").alias("iy"))
        .agg(F.sum("contrib").alias("weight"))
    )


def idw_surface(
    points: DataFrame,
    bbox: tuple[float, float, float, float],
    width: int,
    height: int,
    value_col: str,
    radius: int = 2,
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Inverse-distance-weighted interpolation surface — the
    raster-from-samples counterpart of A9 (density renders counts; IDW
    renders a measured value field, the classic GIS gridding op next to
    GeoMesa's DensityScan / GeoServer heatmap pipeline).

    Scale shape: samples are FIRST reduced to per-cell (Σvalue, n) —
    one hash aggregate over raw points, map-side partial — so the
    kernel explode and the final shuffle run over |non-empty cells|·
    (2r+1)² already-aggregated rows, never over raw points. Weights are
    radius-bounded 1/d² in cell-index space (d² is an exact integer),
    the Shepard power-2 kernel.

    Float parity: per-target contributions are folded in a
    DETERMINISTIC order — ``sort_array`` over struct(d2, sx, sy, …)
    then one ``aggregate`` fold — so a DuckDB oracle replaying the same
    fold (list(... ORDER BY d2, sx, sy) + list_reduce) is
    ulp-identical; a plain SUM would drift in the last ulp across
    engines. Arrays are bounded by (2r+1)² entries per target cell.

    A cell containing samples (d2 = 0) takes their exact mean, the
    Shepard zero-distance convention. Output: sparse
    (ix, iy, n_cells, idw) — cells within ``radius`` of at least one
    sample; idw rounded 6 dp.
    """
    r = radius
    x0, y0, x1, y1 = bbox
    dx = (x1 - x0) / width
    dy = (y1 - y0) / height
    inb = points.where(
        (F.col(lon) >= x0) & (F.col(lon) < x1) & (F.col(lat) >= y0) & (F.col(lat) < y1)
    )
    grid = inb.groupBy(
        F.floor((F.col(lon) - x0) / dx).cast("int").alias("sx"),
        F.floor((F.col(lat) - y0) / dy).cast("int").alias("sy"),
    ).agg(
        F.sum(F.col(value_col).cast("double")).alias("sv"),
        F.count("*").alias("n"),
    )
    contrib = (
        _kernel_spread(grid, ["sv", "n"], r, sx="sx", sy="sy")
        .select(
            F.col("tx").cast("int").alias("ix"),
            F.col("ty").cast("int").alias("iy"),
            (F.col("kx") * F.col("kx") + F.col("ky") * F.col("ky"))
            .cast("int")
            .alias("d2"),
            "sx", "sy", "sv", "n",
        )
        .where(
            (F.col("ix") >= 0) & (F.col("ix") < width)
            & (F.col("iy") >= 0) & (F.col("iy") < height)
        )
    )
    agg = contrib.groupBy("ix", "iy").agg(
        F.sort_array(F.collect_list(F.struct("d2", "sx", "sy", "sv", "n"))).alias("arr")
    )
    zero = F.filter(F.col("arr"), lambda x: x["d2"] == 0)
    nz = F.filter(F.col("arr"), lambda x: x["d2"] > 0)
    fold = F.aggregate(
        nz,
        F.struct(F.lit(0.0).alias("num"), F.lit(0.0).alias("den")),
        lambda a, x: F.struct(
            (a["num"] + x["sv"] / x["d2"]).alias("num"),
            (a["den"] + x["n"] / x["d2"]).alias("den"),
        ),
    )
    z1 = F.element_at(zero, 1)
    return agg.select(
        "ix",
        "iy",
        F.size("arr").alias("n_cells"),
        F.round(
            F.when(F.size(zero) > 0, z1["sv"] / z1["n"]).otherwise(
                fold["num"] / fold["den"]
            ),
            6,
        ).alias("idw"),
    )


def tile_pyramid(
    points: DataFrame,
    max_bits: int = 8,
    min_bits: int = 2,
    weight_col: str | None = None,
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Multi-resolution tile rollup (raster pyramid): one pass computes
    the finest level, then each coarser level aggregates the previous
    one — the classic hypertable/zoom rollup, log2(levels) small
    shuffles over already-aggregated data instead of rescanning points.

    Output: (level int, xi long, yi long, weight double, cnt long),
    parent weight = sum of its 4 children exactly.
    """
    n = 1 << max_bits
    w = F.col(weight_col) if weight_col else F.lit(1.0)
    base = (
        points.groupBy(
            F.least(F.floor((F.col(lon) + 180.0) / 360.0 * n), F.lit(n - 1)).cast("long").alias("xi"),
            F.least(F.floor((F.col(lat) + 90.0) / 180.0 * n), F.lit(n - 1)).cast("long").alias("yi"),
        )
        .agg(F.sum(w).alias("weight"), F.count("*").alias("cnt"))
        .withColumn("level", F.lit(max_bits))
    )
    levels = [base]
    cur = base
    for bits in range(max_bits - 1, min_bits - 1, -1):
        cur = (
            cur.groupBy(
                F.shiftrightunsigned(F.col("xi"), 1).alias("xi"),
                F.shiftrightunsigned(F.col("yi"), 1).alias("yi"),
            )
            .agg(F.sum("weight").alias("weight"), F.sum("cnt").alias("cnt"))
            .withColumn("level", F.lit(bits))
        )
        levels.append(cur)
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out.select(F.col("level").cast("int"), "xi", "yi", "weight", "cnt")


def read_tiles(
    spark,
    path: str,
    bbox: tuple[float, float, float, float] | None = None,
    max_prefixes: int = 4096,
) -> DataFrame:
    """Partition-pruned read of a ``write_tiles`` table (the query-side
    half of the bucketed layout — reference analogue: an index scan
    hitting only the tablets its key ranges name).

    For a bbox the planner derives the Z2 cell ranges, shifts them to
    tile prefixes and hashes the candidate prefix set to its bucket
    dirs in one TINY local job (O(prefixes), no data scan) — only those
    ``bucket=`` directories are listed/read; within the surviving files
    the cell BETWEEN predicate prunes row groups (the data is sorted by
    (tile_prefix, cell) at write). Returns the index-scan candidate
    superset — rows whose cell falls in the coarse ranges; callers
    refine with the exact lon/lat predicate as usual. Degenerate cases
    (huge bbox → too many prefixes or all buckets hit) fall back to the
    full read with the predicate."""
    from geomesa_spark.plans.planner import _Z2, z2_range_predicate
    from geomesa_spark.sources.catalog import latest_manifest

    full = spark.read.parquet(path)
    if bbox is None:
        return full
    m = latest_manifest(path) or {}
    spec = m.get("partition_spec", {})
    pb = int(spec.get("prefix_bits", 8))
    nb = int(spec.get("n_buckets", 16))
    cell_col = spec.get("cell_col", "cell_z2")
    pred = z2_range_predicate([bbox], cell_col=cell_col)
    shift = 2 * (31 - pb)
    prefs = sorted(
        {
            p
            for lo, hi in _Z2.ranges([bbox], max_ranges=64)
            for p in range(lo >> shift, (hi >> shift) + 1)
        }
    )
    if not prefs or len(prefs) > max_prefixes:
        return full.where(pred)
    buckets = sorted(
        r["b"]
        for r in spark.createDataFrame([(p,) for p in prefs], "p long")
        .select(F.pmod(F.xxhash64("p"), F.lit(nb)).alias("b"))
        .distinct()
        .collect()
    )
    if len(buckets) >= nb:
        return full.where(pred)
    sub = spark.read.option("basePath", path).parquet(
        *[f"{path}/bucket={b}" for b in buckets]
    )
    return sub.where(pred)


def vectorize_density(
    points: DataFrame,
    bbox: tuple[float, float, float, float],
    width: int,
    height: int,
    min_weight: float = 1.0,
    weight_col: str | None = None,
) -> DataFrame:
    """Raster → vector: threshold the density grid and merge
    4-adjacent surviving cells into connected regions (the inverse of
    the DensityScan direction — together they close the north star's
    raster↔vector loop).

    Spark shape: density aggregation → self equi-join on shifted cell
    ids for adjacency edges → HashMin connected components
    (dedup_clusters — bounded label-propagation fixpoint) → per-region
    envelope + stats. Output: (region_id = min cell id, n_cells,
    weight, cnt, x0, y0, x1, y1) with the envelope in bbox
    coordinates; st_makeBBOX(x0,y0,x1,y1) yields the polygon WKT.
    """
    from geomesa_spark.operators.dedup import dedup_clusters

    x0b, y0b, x1b, y1b = bbox
    dx = (x1b - x0b) / width
    dy = (y1b - y0b) / height
    g = density_grid(points, bbox, width, height, weight_col=weight_col)
    cells = g.where(F.col("weight") >= min_weight).withColumn(
        "cell_id", F.col("iy").cast("long") * width + F.col("ix")
    )
    a = cells.select("cell_id", "ix", "iy")
    right = (
        a.select(F.col("cell_id").alias("n_id"), F.col("ix").alias("nx"), F.col("iy").alias("ny"))
    )
    edges = None
    for dxi, dyi in ((1, 0), (0, 1)):
        e = a.join(
            right,
            (F.col("nx") == F.col("ix") + dxi) & (F.col("ny") == F.col("iy") + dyi),
        ).select(F.col("cell_id").alias("key_a"), F.col("n_id").alias("key_b"))
        edges = e if edges is None else edges.unionByName(e)
    labels = dedup_clusters(edges)
    labeled = cells.join(labels, cells["cell_id"] == labels["node"], "left").withColumn(
        "region_id", F.coalesce(F.col("label"), F.col("cell_id"))  # singleton regions
    )
    return labeled.groupBy("region_id").agg(
        F.count("*").alias("n_cells"),
        F.sum("weight").alias("weight"),
        F.sum("cnt").alias("cnt"),
        (F.lit(x0b) + F.min("ix") * dx).alias("x0"),
        (F.lit(y0b) + F.min("iy") * dy).alias("y0"),
        (F.lit(x0b) + (F.max("ix") + 1) * dx).alias("x1"),
        (F.lit(y0b) + (F.max("iy") + 1) * dy).alias("y1"),
    )


def hotspots(
    points: DataFrame,
    bbox: tuple[float, float, float, float],
    width: int,
    height: int,
    min_weight: float = 1.0,
    weight_col: str | None = None,
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Density hotspot detection: grid cells whose weight STRICTLY
    exceeds every Moore neighbor's (local maxima of the DensityScan
    surface — the hotspot primitive under Getis-Ord-style analyses;
    plateau cells are excluded by design, deterministic).

    Shape: density_grid (one hash aggregate over raw points), then the
    neighbor maximum via the same kernel-explode-over-aggregated-cells
    trick as smooth_density — spread each cell's weight to its 8
    neighbors, re-aggregate max per target, LEFT join back (cells with
    no occupied neighbor are trivially peaks). No self-join on an
    inequality, no window over the grid.

    Output: (ix, iy, weight, cnt, nbr_max) for peak cells with
    weight >= min_weight; nbr_max is 0.0 for isolated cells.
    """
    g = density_grid(points, bbox, width, height, weight_col=weight_col, lon=lon, lat=lat)
    spread = _kernel_spread(g, ["weight"], 1, exclude_self=True)
    nmax = spread.groupBy("tx", "ty").agg(F.max("weight").alias("nbr_max"))
    return (
        g.where(F.col("weight") >= min_weight)
        .join(nmax, (F.col("ix") == F.col("tx")) & (F.col("iy") == F.col("ty")), "left")
        .withColumn("nbr_max", F.coalesce(F.col("nbr_max"), F.lit(0.0)))
        .where(F.col("weight") > F.col("nbr_max"))
        .select("ix", "iy", "weight", "cnt", "nbr_max")
    )


def gi_star(
    points: DataFrame,
    bbox: tuple[float, float, float, float],
    width: int,
    height: int,
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Getis-Ord Gi* hotspot statistic over the count grid (Getis &
    Ord 1992; binary weights over the 3×3 Moore window including
    self) — the statistical-significance upgrade of `hotspots`' raw
    local maxima: Gi* = (Σ_j x_j − X̄·W_i) / (S·√((n·W_i − W_i²)/(n−1)))
    with n = width·height grid cells, X̄/S the global mean/std of cell
    counts (empty cells are zeros), W_i the in-grid window size.

    Scale shape: one hash aggregate to cells; the window sum Σ_j x_j
    via _kernel_spread over OCCUPIED cells only (empties add 0); W_i is
    pure edge-clip arithmetic (no join); global T = Σx and Q = Σx² ride
    as a broadcast 1-row aggregate of exact integer doubles. Reported
    for occupied cells (the sparse convention). Float parity: X̄, S and
    the Gi* expression are one fixed IEEE sequence over exact integers,
    mirrored by the oracle; round 6 dp.
    """
    n_cells = float(width * height)
    g = density_grid(points, bbox, width, height, lon=lon, lat=lat).select(
        "ix", "iy", F.col("cnt").cast("double").alias("x")
    )
    wsum = (
        _kernel_spread(g, ["x"], 1)
        .groupBy("tx", "ty")
        .agg(F.sum("x").alias("sw"))
    )
    tot = g.agg(
        F.sum("x").alias("__t"),
        F.sum(F.col("x") * F.col("x")).alias("__q"),
    )
    cells = (
        g.join(wsum, (F.col("ix") == F.col("tx")) & (F.col("iy") == F.col("ty")))
        .crossJoin(F.broadcast(tot))
    )
    wi = (
        (F.least(F.col("ix") + 1, F.lit(width - 1)) - F.greatest(F.col("ix") - 1, F.lit(0)) + 1)
        * (F.least(F.col("iy") + 1, F.lit(height - 1)) - F.greatest(F.col("iy") - 1, F.lit(0)) + 1)
    ).cast("double")
    mean = F.col("__t") / n_cells
    s = F.sqrt(F.col("__q") / n_cells - mean * mean)
    denom = s * F.sqrt((n_cells * wi - wi * wi) / (n_cells - 1.0))
    # wi == n (window spans the whole grid): the variance term is zero
    # and the numerator provably is too (Σ_window = T = X̄·n) — the
    # statistic is vacuous there, emit exact 0 instead of 0/0
    gi = F.when(wi < F.lit(n_cells), (F.col("sw") - mean * wi) / denom).otherwise(0.0)
    return cells.select(
        "ix",
        "iy",
        F.col("x").cast("long").alias("cnt"),
        F.round(gi, 6).alias("gi"),
    )


def local_moran(
    points: DataFrame,
    bbox: tuple[float, float, float, float],
    width: int,
    height: int,
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Local Moran's I (Anselin 1995 LISA; binary Moore weights,
    self excluded, m2 = Σ(x−X̄)²/n) over the count grid — the
    cluster/outlier companion to gi_star's hot/cold scores:
    I_i = ((x_i − X̄)/m2) · Σ_j w_ij (x_j − X̄).

    Empty neighbor cells carry z = −X̄, so the neighbor term over the
    FULL grid reduces to occupied-only sums plus window arithmetic:
    Σ_j z_j = (sw − x_i) − (W_i − 1)·X̄ with sw the occupied window sum
    including self (the same _kernel_spread aggregate gi_star uses) and
    W_i the edge-clipped window size. One cell aggregate, one spread
    aggregate, a broadcast scalar — no join against empty cells ever
    materializes. Bit-exact: fixed IEEE sequence over exact integer
    sums, mirrored by the oracle; reported for occupied cells.
    """
    n_cells = float(width * height)
    g = density_grid(points, bbox, width, height, lon=lon, lat=lat).select(
        "ix", "iy", F.col("cnt").cast("double").alias("x")
    )
    wsum = (
        _kernel_spread(g, ["x"], 1)
        .groupBy("tx", "ty")
        .agg(F.sum("x").alias("sw"))
    )
    tot = g.agg(
        F.sum("x").alias("__t"),
        F.sum(F.col("x") * F.col("x")).alias("__q"),
    )
    cells = (
        g.join(wsum, (F.col("ix") == F.col("tx")) & (F.col("iy") == F.col("ty")))
        .crossJoin(F.broadcast(tot))
    )
    wi = (
        (F.least(F.col("ix") + 1, F.lit(width - 1)) - F.greatest(F.col("ix") - 1, F.lit(0)) + 1)
        * (F.least(F.col("iy") + 1, F.lit(height - 1)) - F.greatest(F.col("iy") - 1, F.lit(0)) + 1)
    ).cast("double")
    mean = F.col("__t") / n_cells
    m2 = F.col("__q") / n_cells - mean * mean
    zsum = (F.col("sw") - F.col("x")) - (wi - F.lit(1.0)) * mean
    return cells.select(
        "ix",
        "iy",
        F.col("x").cast("long").alias("cnt"),
        F.round((F.col("x") - mean) / m2 * zsum, 6).alias("moran_i"),
    )


def emerging_hotspots(
    points: DataFrame,
    bbox: tuple[float, float, float, float],
    width: int,
    height: int,
    ts_col: str = "dtg",
    bin_hours: int = 500,
    tau: int = 2,
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Emerging-hotspot analysis (the ArcGIS space-time-cube shape):
    per cell, the Mann-Kendall trend statistic S = Σ_{i<j}
    sign(c_j − c_i) over the time-binned count sequence, classified
    intensifying (S > tau) / diminishing (S < −tau) / stable. S is a
    pure INTEGER statistic — no distribution assumptions, bit-exact by
    construction.

    Shape: ONE hash aggregate to (cell, bin) counts, then per cell a
    sorted-collect + nested fold computes S with zero joins (bins per
    cell are bounded by the time range / bin width — the space-time
    cube contract). Trend is over OBSERVED bins only; cells seen in a
    single bin are trivially stable. The DuckDB oracle computes the
    same S with a pair self-join — identical exact integers.
    """
    x0, y0, x1, y1 = bbox
    dx = (x1 - x0) / width
    dy = (y1 - y0) / height
    inb = points.where(
        (F.col(lon) >= x0) & (F.col(lon) < x1) & (F.col(lat) >= y0) & (F.col(lat) < y1)
    )
    binned = inb.groupBy(
        F.floor((F.col(lon) - x0) / dx).cast("int").alias("ix"),
        F.floor((F.col(lat) - y0) / dy).cast("int").alias("iy"),
        (F.unix_seconds(F.col(ts_col).cast("timestamp")) / (bin_hours * 3600))
        .cast("long")
        .alias("bin"),
    ).agg(F.count("*").alias("c"))
    seq = binned.groupBy("ix", "iy").agg(
        F.sort_array(F.collect_list(F.struct("bin", "c"))).alias("a"),
        F.sum("c").alias("total"),
    )
    a = F.col("a")
    n = F.size(a)
    # S = Σ_{j} Σ_{i<j} sign(c_j − c_i): nested fold over the sorted
    # bins — exact integers, O(n²) on a per-cell bounded n
    s_stat = F.aggregate(
        F.sequence(F.lit(2), n),
        F.lit(0),
        lambda acc, j: acc
        + F.aggregate(
            F.slice(a, 1, j - 1),
            F.lit(0),
            lambda inner, x: inner
            + F.signum(F.element_at(a, j)["c"] - x["c"]).cast("int"),
        ),
    )
    s_guard = F.when(n >= 2, s_stat).otherwise(0)
    return seq.select(
        "ix",
        "iy",
        n.alias("n_bins"),
        "total",
        s_guard.alias("s_stat"),
        F.when(s_guard > tau, F.lit("intensifying"))
        .when(s_guard < -tau, F.lit("diminishing"))
        .otherwise(F.lit("stable"))
        .alias("trend"),
    )


def rasterize_coverage(
    rects: DataFrame,
    bbox: tuple[float, float, float, float],
    width: int,
    height: int,
) -> DataFrame:
    """Partial-coverage rasterization of axis-aligned rectangles: per
    grid cell, the number of rects touching it and the total covered
    AREA (deg²) including fractional cell overlaps — the weighted
    upgrade of a hit-count density (GIS "polygon to raster" with the
    area-weight option).

    Each rect explodes to exactly the cells its envelope spans (two
    bounded sequences — never the whole grid), then the overlap
    rectangle per (rect, cell) is pure arithmetic. Exactness: overlap
    edges cast to DECIMAL(14,3) (coordinates are ≤3-dp rationals), so
    widths/areas/sums are exact decimals — the per-cell total is
    aggregation-order-independent. Zero-width touches (edge exactly on
    a cell boundary) are excluded in both engines. Output:
    (ix, iy, n_rects, coverage) round 6.
    """
    x0, y0, x1, y1 = bbox
    dx = (x1 - x0) / width
    dy = (y1 - y0) / height
    r = rects.where(
        (F.col("max_lon") > x0) & (F.col("min_lon") < x1)
        & (F.col("max_lat") > y0) & (F.col("min_lat") < y1)
    )
    ix_lo = F.greatest(F.floor((F.col("min_lon") - x0) / dx), F.lit(0)).cast("int")
    ix_hi = F.least(F.floor((F.col("max_lon") - x0) / dx), F.lit(width - 1)).cast("int")
    iy_lo = F.greatest(F.floor((F.col("min_lat") - y0) / dy), F.lit(0)).cast("int")
    iy_hi = F.least(F.floor((F.col("max_lat") - y0) / dy), F.lit(height - 1)).cast("int")
    e = (
        r.withColumn("__ix", F.explode(F.sequence(ix_lo, ix_hi)))
        .withColumn("__iy", F.explode(F.sequence(iy_lo, iy_hi)))
    )
    dec = "decimal(14,3)"
    cx0 = F.lit(x0) + F.col("__ix") * dx
    cx1 = F.lit(x0) + (F.col("__ix") + 1) * dx
    cy0 = F.lit(y0) + F.col("__iy") * dy
    cy1 = F.lit(y0) + (F.col("__iy") + 1) * dy
    ow = F.least(F.col("max_lon"), cx1).cast(dec) - F.greatest(F.col("min_lon"), cx0).cast(dec)
    oh = F.least(F.col("max_lat"), cy1).cast(dec) - F.greatest(F.col("min_lat"), cy0).cast(dec)
    return (
        e.select("__ix", "__iy", ow.alias("__ow"), oh.alias("__oh"))
        .where((F.col("__ow") > 0) & (F.col("__oh") > 0))
        .groupBy(F.col("__ix").alias("ix"), F.col("__iy").alias("iy"))
        .agg(
            F.count("*").alias("n_rects"),
            F.round(F.sum(F.col("__ow") * F.col("__oh")).cast("double"), 6).alias("coverage"),
        )
    )


def global_autocorr(
    points: DataFrame,
    bbox: tuple[float, float, float, float],
    width: int,
    height: int,
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Global spatial autocorrelation over the count grid, one row with
    BOTH classic statistics (binary Moore weights, self excluded):
    Getis-Ord General G = Σ_ij w_ij x_i x_j / Σ_{i≠j} x_i x_j and
    Moran's I = (N/W) · Σ_ij w_ij z_i z_j / Σ z_i² with z = x − μ over
    ALL N = width·height cells (empties carry z = −μ).

    Everything reduces to FOUR exact integer sums over occupied cells —
    T = Σx, Q = Σx², P = Σ_i x_i·(sw_i − x_i) (neighbor-pair product
    sum via the shared _kernel_spread aggregate), D = Σ_i deg_i·x_i
    (edge-clipped degree, pure arithmetic) — plus two closed-form grid
    constants: N and the total link count W = (3w−2)(3h−2) − N. The
    empty-cell expansions fold into those: Σ w z z = P − 2μD + μ²W,
    Σ z² = Q − T²/N. Zero joins beyond the one wsum lookup; the final
    statistics are a fixed IEEE sequence over exact BIGINTs (round 6).
    """
    n_cells = width * height
    w_links = (3 * width - 2) * (3 * height - 2) - n_cells
    g = density_grid(points, bbox, width, height, lon=lon, lat=lat).select(
        "ix", "iy", F.col("cnt").alias("c")
    )
    wsum = (
        _kernel_spread(g, ["c"], 1)
        .groupBy("tx", "ty")
        .agg(F.sum("c").alias("sw"))
    )
    deg = (
        (F.least(F.col("ix") + 1, F.lit(width - 1)) - F.greatest(F.col("ix") - 1, F.lit(0)) + 1)
        * (F.least(F.col("iy") + 1, F.lit(height - 1)) - F.greatest(F.col("iy") - 1, F.lit(0)) + 1)
        - 1
    ).cast("long")
    cells = g.join(wsum, (F.col("ix") == F.col("tx")) & (F.col("iy") == F.col("ty")))
    agg = cells.agg(
        F.count("*").alias("n_occupied"),
        F.sum("c").alias("t"),
        F.sum(F.col("c") * F.col("c")).alias("q"),
        F.sum(F.col("c") * (F.col("sw") - F.col("c"))).alias("p"),
        F.sum(deg * F.col("c")).alias("d"),
    )
    t_d = F.col("t").cast("double")
    p_d = F.col("p").cast("double")
    mu = t_d / n_cells
    gen_g = p_d / (t_d * F.col("t") - F.col("q"))
    num_z = p_d - 2.0 * mu * F.col("d") + mu * mu * w_links
    den_z = F.col("q").cast("double") - t_d * F.col("t") / n_cells
    moran = (float(n_cells) / w_links) * (num_z / den_z)
    return agg.select(
        F.lit(n_cells).alias("n_cells"),
        "n_occupied",
        "t",
        "p",
        "d",
        F.round(gen_g, 6).alias("general_g"),
        F.round(moran, 6).alias("moran_i"),
    )


def quadrat_test(
    points: DataFrame,
    bbox: tuple[float, float, float, float],
    width: int,
    height: int,
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Quadrat dispersion test: the variance-to-mean ratio (VMR) of
    point counts over a width×height grid INCLUDING empty quadrats
    (VMR > 1 = clustered, ≈ 1 = Poisson/random, < 1 = dispersed).

    Empty cells never materialize: with N = width·height known, Σc and
    Σc² over the OCCUPIED cells determine mean and variance exactly
    (empty cells contribute 0 to both sums) — one hash aggregate to
    (cell, count), one global integer reduce, zero joins. The moments
    are exact BIGINTs; mean/variance/VMR are a fixed IEEE double
    sequence on those scalars — bit-stable cross-engine. Output: one
    row (n_cells, n_points, mean_count, vmr).
    """
    x0, y0, x1, y1 = bbox
    dx = (x1 - x0) / width
    dy = (y1 - y0) / height
    n_cells = width * height
    inb = points.where(
        (F.col(lon) >= x0) & (F.col(lon) < x1) & (F.col(lat) >= y0) & (F.col(lat) < y1)
    )
    b = inb.groupBy(
        F.floor((F.col(lon) - x0) / dx).cast("int").alias("ix"),
        F.floor((F.col(lat) - y0) / dy).cast("int").alias("iy"),
    ).agg(F.count("*").alias("c"))
    agg = b.agg(
        F.coalesce(F.sum("c"), F.lit(0).cast("long")).alias("n"),
        F.coalesce(F.sum(F.col("c") * F.col("c")), F.lit(0).cast("long")).alias("ss"),
    )
    mean = F.col("n").cast("double") / n_cells
    var = (
        F.col("ss").cast("double") - F.col("n").cast("double") * F.col("n") / n_cells
    ) / (n_cells - 1)
    return agg.select(
        F.lit(n_cells).alias("n_cells"),
        F.col("n").alias("n_points"),
        F.round(mean, 6).alias("mean_count"),
        F.round(var / mean, 6).alias("vmr"),
    )


def grid_dbscan(
    points: DataFrame,
    bbox: tuple[float, float, float, float],
    width: int,
    height: int,
    minpts: int,
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Cell-resolution DBSCAN (the GriDBSCAN / cell-based
    approximation: eps = one grid cell, density measured over the 3×3
    Moore neighborhood). Published shape — grid-partitioned DBSCAN —
    re-expressed as pure DataFrame ops; the spatial-clustering
    companion to vectorize_density's thresholded regions.

    Pipeline (everything after step 1 runs over AGGREGATED cells, so
    at 100 TB the raw points are touched exactly once):
      1. density_grid: one hash aggregate → (ix, iy, cnt);
      2. neighborhood density: 3×3 kernel explode + re-aggregate →
         ncnt = Σ cnt over the Moore neighborhood (incl. self);
      3. CORE cells: ncnt >= minpts; 8-adjacent cores merge into
         clusters via HashMin label propagation (dedup_clusters —
         bounded fixpoint, label = min cell_id);
      4. BORDER cells: occupied non-core cells 8-adjacent to a core
         adopt min(adjacent core label) — deterministic tie-break;
      5. everything else occupied is NOISE (cluster NULL).

    Output: (ix, iy, cnt, ncnt, role core|border|noise, cluster).
    All counts exact integers — the DuckDB oracle replays the same
    min-label fixpoint with a recursive CTE.
    """
    from geomesa_spark.operators.dedup import dedup_clusters

    cells = (
        density_grid(points, bbox, width, height, lon=lon, lat=lat)
        .select("ix", "iy", "cnt")
        .withColumn("cell_id", F.col("iy").cast("long") * width + F.col("ix"))
    )
    ncnt = (
        _kernel_spread(cells, ["cnt"], 1)
        .groupBy("tx", "ty")
        .agg(F.sum("cnt").alias("ncnt"))
    )
    cells = cells.join(
        ncnt, (F.col("ix") == F.col("tx")) & (F.col("iy") == F.col("ty"))
    ).select("ix", "iy", "cnt", "cell_id", "ncnt")
    core = cells.where(F.col("ncnt") >= minpts)
    ca = core.select("cell_id", "ix", "iy")
    cb = core.select(
        F.col("cell_id").alias("n_id"), F.col("ix").alias("nx"), F.col("iy").alias("ny")
    )
    edges = None
    for dxi, dyi in ((1, 0), (0, 1), (1, 1), (1, -1)):  # 8-adjacency, one direction
        e = ca.join(
            cb,
            (F.col("nx") == F.col("ix") + dxi) & (F.col("ny") == F.col("iy") + dyi),
        ).select(F.col("cell_id").alias("key_a"), F.col("n_id").alias("key_b"))
        edges = e if edges is None else edges.unionByName(e)
    labels = dedup_clusters(edges)
    core_lab = (
        core.join(labels, core["cell_id"] == labels["node"], "left")
        .withColumn("cluster", F.coalesce(F.col("label"), F.col("cell_id")))
        .select("ix", "iy", "cnt", "ncnt", "cell_id", "cluster")
    )
    noncore = cells.join(core_lab.select("cell_id"), "cell_id", "left_anti")
    # core reach exploded to its 3×3 footprint → plain equi-join on the
    # cell key (never a nested-loop theta-join), min-label per target
    core_spread = _kernel_spread(core_lab, ["cluster"], 1).select(
        "tx", "ty", F.col("cluster").alias("cc")
    )
    adj = noncore.join(
        core_spread,
        (F.col("ix") == F.col("tx")) & (F.col("iy") == F.col("ty")),
        "left",
    )
    border = adj.groupBy("ix", "iy", "cnt", "ncnt").agg(F.min("cc").alias("cluster"))
    return (
        core_lab.select(
            "ix", "iy", "cnt", "ncnt", F.lit("core").alias("role"), "cluster"
        )
        .unionByName(
            border.select(
                "ix", "iy", "cnt", "ncnt",
                F.when(F.col("cluster").isNotNull(), F.lit("border"))
                .otherwise(F.lit("noise"))
                .alias("role"),
                "cluster",
            )
        )
    )


def write_tiles(
    df: DataFrame,
    path: str,
    cell_col: str = "cell_z2",
    prefix_bits: int = 8,
    n_buckets: int = 16,
    salt_buckets: int = 4,
    salt_key: str = "doc_id",
    mode: str = "overwrite",
    lineage: dict | None = None,
) -> dict:
    """Materialize a cell-keyed table bucketed by cell prefix with salt.

    Layout (Iceberg-style hidden partitioning emulated on plain parquet;
    swap for a real Iceberg catalog when the runtime jar exists):
      bucket = pmod(xxhash64(tile_prefix), n_buckets)   -- dir partition
      salt   = pmod(xxhash64(salt_key),   salt_buckets) -- spreads hot tiles
      files sorted within partitions by (tile_prefix, cell) for row-group
      min/max pruning on later range scans.

    Returns the manifest dict (also written as JSON beside the data).
    """
    from pyspark.sql import Observation

    tile = F.shiftrightunsigned(F.col(cell_col), 2 * (31 - prefix_bits))
    out = (
        df.withColumn("tile_prefix", tile)
        .withColumn("bucket", F.pmod(F.xxhash64(F.col("tile_prefix")), F.lit(n_buckets)))
        .withColumn("salt", F.pmod(F.xxhash64(F.col(salt_key)), F.lit(salt_buckets)))
    )
    # one cheap Observation metric (total rows) rides the write job; the
    # PER-BUCKET manifest stats come from the parquet FOOTERS after the
    # write — exact min/max/rows per bucket for zero extra scan. (The
    # previous version observed 4 conditional aggregates × n_buckets per
    # row — 16 HLL updates per record — which measured as ~1/3 of the
    # whole pipeline's wall time; footers carry the same facts for free.)
    obs = Observation("tile_stats")
    out = out.observe(obs, F.count(F.lit(1)).alias("rows"))
    (
        out.repartition(n_buckets * salt_buckets, "bucket", "salt")
        .sortWithinPartitions("tile_prefix", cell_col)
        .write.mode(mode)
        .partitionBy("bucket")
        .parquet(path)
    )
    total_rows = int(obs.get["rows"] or 0)

    from geomesa_spark.sources.catalog import partition_footer_stats

    footer = partition_footer_stats(path, "bucket", stat_col="tile_prefix")
    stats_mode = "parquet-footer per-bucket (exact, metadata-only)"
    if footer is not None:
        partitions = [
            {
                "bucket": p["bucket"],
                "rows": p["rows"],
                "min_tile": int(p["min"]) if p["min"] is not None else None,
                "max_tile": int(p["max"]) if p["max"] is not None else None,
            }
            for p in footer
        ]
    else:
        # remote filesystem (hdfs://, s3a://): footers aren't listable
        # from the driver — one cheap 2-column aggregate over the
        # written table (still far below the old per-row observe cost)
        stats_mode = "spark-aggregate per-bucket (remote path)"
        rows_df = (
            df.sparkSession.read.parquet(path)
            .groupBy("bucket")
            .agg(
                F.count(F.lit(1)).alias("rows"),
                F.min("tile_prefix").alias("mn"),
                F.max("tile_prefix").alias("mx"),
            )
        )
        partitions = [
            {
                "bucket": int(r["bucket"]),
                "rows": int(r["rows"]),
                "min_tile": int(r["mn"]) if r["mn"] is not None else None,
                "max_tile": int(r["mx"]) if r["mx"] is not None else None,
            }
            for r in rows_df.collect()
        ]
    # footer totals equal this write's observed rows only when the write
    # replaced the WHOLE table: append mode and dynamic partition
    # overwrite (which keeps bucket dirs the new data didn't touch) both
    # legitimately leave the footers covering more than this commit. The
    # manifest records the footer truth (the table) plus this commit's
    # observed rows; a mismatch under a full static overwrite is a real
    # write fault and raises (an exception, not an assert — asserts
    # vanish under python -O).
    footer_rows = sum(p["rows"] for p in partitions)
    dynamic = (
        str(
            df.sparkSession.conf.get(
                "spark.sql.sources.partitionOverwriteMode", "static"
            )
        ).lower()
        == "dynamic"
    )
    if mode == "overwrite" and not dynamic and footer_rows != total_rows:
        raise RuntimeError(
            f"write_tiles: footer rows {footer_rows} != observed rows "
            f"{total_rows} after a static overwrite — table at {path} is "
            "inconsistent with the write"
        )
    return write_manifest(
        path,
        spec={
            "cell_col": cell_col,
            "prefix_bits": prefix_bits,
            "n_buckets": n_buckets,
            "salt_buckets": salt_buckets,
            "stats_mode": stats_mode,
        },
        partitions=partitions,
        lineage={**(lineage or {}), "commit_rows": total_rows},
    )


def contour_segments(
    points: DataFrame,
    bbox: tuple[float, float, float, float],
    width: int,
    height: int,
    threshold: int,
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Marching-squares isoline extraction at integer ``threshold``
    over the width×height count grid — the vector dual of the
    reference's DensityScan heatmap (cell values sampled at CELL
    CENTERS; a node is "inside" when its count >= threshold; nodes
    outside the data are 0, so contours close around the data).

    Shape: the density_grid aggregate, a 4-role corner explode
    (each occupied cell feeds the 4 quads it corners — the
    _kernel_spread idea at radius bounded to the 2×2 quad), one hash
    aggregate per quad, then an equi-join against the BROADCAST 20-row
    marching-squares case table (_MS_CASES) — saddle cases (5/10)
    resolve by the exact integer corner-sum-vs-4·threshold center
    rule. Edge crossings interpolate t = (T−v0)/(v1−v0) — a single
    division of exact integers, so endpoints are deterministic; output
    lon/lat round 6. No UDF, no window; the only shuffle is the quad
    aggregate. Output: (qx, qy, seg, x1, y1, x2, y2).
    """
    x0, y0, x1g, y1g = bbox
    dx = (x1g - x0) / width
    dy = (y1g - y0) / height
    t_lit = int(threshold)
    g = density_grid(points, bbox, width, height).select("ix", "iy", "cnt")
    roles = g.select(
        F.explode(
            F.array(
                F.struct(F.col("ix").alias("qx"), F.col("iy").alias("qy"),
                         F.lit(0).alias("role")),
                F.struct((F.col("ix") - 1).alias("qx"), F.col("iy").alias("qy"),
                         F.lit(1).alias("role")),
                F.struct((F.col("ix") - 1).alias("qx"), (F.col("iy") - 1).alias("qy"),
                         F.lit(2).alias("role")),
                F.struct(F.col("ix").alias("qx"), (F.col("iy") - 1).alias("qy"),
                         F.lit(3).alias("role")),
            )
        ).alias("r"),
        F.col("cnt"),
    ).select("r.qx", "r.qy", "r.role", "cnt")
    quads = roles.groupBy("qx", "qy").agg(
        F.coalesce(F.sum(F.when(F.col("role") == 0, F.col("cnt"))), F.lit(0)).alias("va"),
        F.coalesce(F.sum(F.when(F.col("role") == 1, F.col("cnt"))), F.lit(0)).alias("vb"),
        F.coalesce(F.sum(F.when(F.col("role") == 2, F.col("cnt"))), F.lit(0)).alias("vc"),
        F.coalesce(F.sum(F.when(F.col("role") == 3, F.col("cnt"))), F.lit(0)).alias("vd"),
    )
    t = F.lit(t_lit).cast("long")
    idx = (
        F.when(F.col("va") >= t, 1).otherwise(0)
        + F.when(F.col("vb") >= t, 2).otherwise(0)
        + F.when(F.col("vc") >= t, 4).otherwise(0)
        + F.when(F.col("vd") >= t, 8).otherwise(0)
    )
    center_in = (F.col("va") + F.col("vb") + F.col("vc") + F.col("vd")) >= F.lit(
        4 * t_lit
    ).cast("long")
    q = quads.withColumn("idx", idx).withColumn("cin", center_in).where(
        (F.col("idx") > 0) & (F.col("idx") < 15)
    )
    spark = points.sparkSession
    cases = spark.createDataFrame(
        _MS_CASES, "idx int, seg int, cc int, e1 int, e2 int"
    )
    j = q.join(F.broadcast(cases), "idx").where(
        (F.col("cc") == 0)
        | ((F.col("cc") == 1) & F.col("cin"))
        | ((F.col("cc") == -1) & ~F.col("cin"))
    )
    tb = (t - F.col("va")).cast("double") / (F.col("vb") - F.col("va")).cast("double")
    tr = (t - F.col("vb")).cast("double") / (F.col("vc") - F.col("vb")).cast("double")
    tt = (t - F.col("vd")).cast("double") / (F.col("vc") - F.col("vd")).cast("double")
    tl = (t - F.col("va")).cast("double") / (F.col("vd") - F.col("va")).cast("double")

    def _gx(e):
        return (
            F.when(e == 0, F.col("qx").cast("double") + tb)
            .when(e == 1, (F.col("qx") + 1).cast("double"))
            .when(e == 2, F.col("qx").cast("double") + tt)
            .otherwise(F.col("qx").cast("double"))
        )

    def _gy(e):
        return (
            F.when(e == 0, F.col("qy").cast("double"))
            .when(e == 1, F.col("qy").cast("double") + tr)
            .when(e == 2, (F.col("qy") + 1).cast("double"))
            .otherwise(F.col("qy").cast("double") + tl)
        )

    def _geo_x(gx):
        return F.round(F.lit(x0) + (gx + F.lit(0.5)) * F.lit(dx), 6)

    def _geo_y(gy):
        return F.round(F.lit(y0) + (gy + F.lit(0.5)) * F.lit(dy), 6)

    e1, e2 = F.col("e1"), F.col("e2")
    return j.select(
        "qx",
        "qy",
        "seg",
        _geo_x(_gx(e1)).alias("x1"),
        _geo_y(_gy(e1)).alias("y1"),
        _geo_x(_gx(e2)).alias("x2"),
        _geo_y(_gy(e2)).alias("y2"),
    )


def dissolve_envelopes(
    rects: DataFrame,
    cell_deg: float = 5.0,
    id_col: str = "rect_id",
) -> DataFrame:
    """Envelope dissolve (the ST_Union/dissolve analogue at envelope
    resolution): merge transitively-overlapping rectangles into
    clusters and report each cluster's member count + merged envelope.
    Boundary touches count as overlap (closed envelopes).

    Shape: candidate pairs come from a cell-cover equi-join on a
    ``cell_deg`` grid (each rect explodes to the cells its envelope
    spans — the rasterize_coverage fence; NEVER an all-pairs product),
    refined by the exact envelope-overlap test; connected components
    run through dedup_clusters' pointer-jumping HashMin (bounded
    rounds, raises on non-convergence); singletons rejoin via a left
    join with label = own id. Envelope merge is min/max only — no
    float summation, so the result is bit-deterministic. Output:
    (cluster, n_rects, min_lon, min_lat, max_lon, max_lat).
    """
    from geomesa_spark.operators.dedup import dedup_clusters

    env = rects.select(
        F.col(id_col).alias("rid"), "min_lon", "min_lat", "max_lon", "max_lat"
    )
    from geomesa_spark.operators.joins import explode_envelope_cover

    cells = explode_envelope_cover(env, cell_deg, cx="cx", cy="cy")
    a, b = cells.alias("a"), cells.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.cx") == F.col("b.cx"))
            & (F.col("a.cy") == F.col("b.cy"))
            & (F.col("a.rid") < F.col("b.rid")),
        )
        .where(
            (F.col("a.min_lon") <= F.col("b.max_lon"))
            & (F.col("b.min_lon") <= F.col("a.max_lon"))
            & (F.col("a.min_lat") <= F.col("b.max_lat"))
            & (F.col("b.min_lat") <= F.col("a.max_lat"))
        )
        .select(F.col("a.rid").alias("key_a"), F.col("b.rid").alias("key_b"))
    )
    labels = dedup_clusters(pairs)
    merged = env.join(labels, env["rid"] == labels["node"], "left").select(
        F.coalesce(F.col("label"), F.col("rid")).alias("cluster"),
        "min_lon", "min_lat", "max_lon", "max_lat",
    )
    return merged.groupBy("cluster").agg(
        F.count("*").alias("n_rects"),
        F.min("min_lon").alias("min_lon"),
        F.min("min_lat").alias("min_lat"),
        F.max("max_lon").alias("max_lon"),
        F.max("max_lat").alias("max_lat"),
    )


def focal_stats(
    points: DataFrame,
    bbox: tuple[float, float, float, float],
    width: int,
    height: int,
    radius: int = 1,
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Focal (neighborhood) statistics over the count grid — the
    raster morphology pass next to smooth_density's weighted mean:
    per target cell, min / max / sum / cell-count of the occupied
    cells in its (2r+1)^2 Moore footprint (focal max = grayscale
    DILATE, focal min over occupied = ERODE-on-support).

    One _kernel_spread explode of the AGGREGATED grid (never the raw
    points) + one hash aggregate on the target cell. Exact integers
    end-to-end; targets are every cell receiving at least one occupied
    neighbor, so the sparse support grows by the footprint only.
    Output: (ix, iy, f_min, f_max, f_sum, f_n).
    """
    g = density_grid(points, bbox, width, height, lon=lon, lat=lat).select(
        "ix", "iy", "cnt"
    )
    sp = _kernel_spread(g, ["cnt"], radius).where(
        (F.col("tx") >= 0) & (F.col("tx") < width)
        & (F.col("ty") >= 0) & (F.col("ty") < height)
    )
    return sp.groupBy(F.col("tx").alias("ix"), F.col("ty").alias("iy")).agg(
        F.min("cnt").alias("f_min"),
        F.max("cnt").alias("f_max"),
        F.sum("cnt").alias("f_sum"),
        F.count("*").alias("f_n"),
    )


def slope_grid(
    points: DataFrame,
    bbox: tuple[float, float, float, float],
    width: int,
    height: int,
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Horn's-method slope magnitude over the count raster (value =
    cell count, absent cells = 0): gx = Σ v·wx, gy = Σ v·wy with the
    classic 3×3 weights wx = dx·(2−|dy|), wy = dy·(2−|dx|) for the
    source's offset (dx, dy) from the target, slope =
    sqrt((gx/8)² + (gy/8)²) in value units per cell.

    The weighted sums are EXACT integers from one _kernel_spread
    explode + hash aggregate (dx = sx−tx = −kx on the spread rows);
    only the final two divisions and the sqrt are IEEE, round 6 —
    sqrt-only, per the repo's oracled-trig rule (aspect would need
    atan2, which diverges from DuckDB's libm at the last ulp).
    Output: (ix, iy, gx8, gy8, slope) with gx8/gy8 the exact
    integer 8×gradients.
    """
    agg = _horn_gradients(points, bbox, width, height, lon, lat)
    gx = F.col("gx8").cast("double") / F.lit(8.0)
    gy = F.col("gy8").cast("double") / F.lit(8.0)
    return agg.select(
        "ix", "iy", "gx8", "gy8",
        F.round(F.sqrt(gx * gx + gy * gy), 6).alias("slope"),
    )


def majority_filter(
    points: DataFrame,
    bbox: tuple[float, float, float, float],
    width: int,
    height: int,
    radius: int = 1,
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Focal MODE (majority filter — the classic raster noise-cleanup
    pass beside focal_stats' min/max): per target cell, the most
    frequent occupied-neighbor value in the (2r+1)^2 footprint, ties
    broken toward the SMALLEST value so the answer is deterministic.

    _kernel_spread explode + a (target, value) hash aggregate + a
    per-target row_number window — PARTITIONED by the target cell
    (never global). Exact integers. Output: (ix, iy, mode_cnt,
    mode_n) where mode_n is how many footprint cells carry the mode.
    """
    g = density_grid(points, bbox, width, height, lon=lon, lat=lat).select(
        "ix", "iy", "cnt"
    )
    sp = _kernel_spread(g, ["cnt"], radius).where(
        (F.col("tx") >= 0) & (F.col("tx") < width)
        & (F.col("ty") >= 0) & (F.col("ty") < height)
    )
    per_val = sp.groupBy(
        F.col("tx").alias("ix"), F.col("ty").alias("iy"), F.col("cnt")
    ).agg(F.count("*").alias("m"))
    w = Window.partitionBy("ix", "iy").orderBy(F.col("m").desc(), F.col("cnt").asc())
    return (
        per_val.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select("ix", "iy", F.col("cnt").alias("mode_cnt"), F.col("m").alias("mode_n"))
    )


def proximity_grid(
    points: DataFrame,
    bbox: tuple[float, float, float, float],
    width: int,
    height: int,
    radius: int = 3,
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Truncated discrete distance transform: per cell within
    ``radius`` of the data, the CHEBYSHEV distance (in cells) to the
    nearest occupied cell — the "how far is the closest feature"
    surface (site-selection / coverage-gap analytics; the raster dual
    of a DWITHIN buffer). Occupied cells read 0; cells farther than
    ``radius`` from everything are absent (the sparse support only
    grows by the footprint).

    One _kernel_spread explode of the aggregated grid + a min hash
    aggregate on the target cell. Exact integers. Output: (ix, iy,
    dist).
    """
    g = density_grid(points, bbox, width, height, lon=lon, lat=lat).select("ix", "iy")
    sp = _kernel_spread(g, [], radius).where(
        (F.col("tx") >= 0) & (F.col("tx") < width)
        & (F.col("ty") >= 0) & (F.col("ty") < height)
    )
    d = F.greatest(F.abs(F.col("kx")), F.abs(F.col("ky")))
    return sp.groupBy(F.col("tx").alias("ix"), F.col("ty").alias("iy")).agg(
        F.min(d).cast("long").alias("dist")
    )


def tri_grid(
    points: DataFrame,
    bbox: tuple[float, float, float, float],
    width: int,
    height: int,
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Terrain Ruggedness Index on the count raster (Riley et al.
    1999: tri = sqrt of the sum of SQUARED center-to-neighbor
    differences), completing the terrain triple beside slope_grid and
    focal_stats' range: per OCCUPIED cell, Σ (v_n − v_c)² over its
    in-grid Moore neighbors, empty neighbors contributing v_c² — the
    raw sum is exact integers, tri = sqrt(sum) the one IEEE op.

    Shape mirrors the oracle directly: the self-excluded clipped
    _kernel_spread joins back to the center grid on the target cell,
    ONE hash aggregate sums the squared differences and counts the
    occupied neighbors, and the off-grid/empty-neighbor terms fold in
    as closed-form span arithmetic. Output: (ix, iy, cnt, tri_sum,
    tri).
    """
    g = density_grid(points, bbox, width, height, lon=lon, lat=lat).select(
        "ix", "iy", "cnt"
    )
    sp = _kernel_spread(g, ["cnt"], 1, exclude_self=True).where(
        (F.col("tx") >= 0) & (F.col("tx") < width)
        & (F.col("ty") >= 0) & (F.col("ty") < height)
    ).select("tx", "ty", F.col("cnt").alias("__vn"))
    j = g.join(
        sp, (g["ix"] == sp["tx"]) & (g["iy"] == sp["ty"]), "left"
    )
    d = F.col("__vn") - F.col("cnt")
    agg = j.groupBy("ix", "iy", "cnt").agg(
        F.coalesce(F.sum(d * d), F.lit(0)).alias("__occ_sum"),
        F.count("__vn").alias("__n_occ"),
    )
    span_x = F.least(F.col("ix") + 1, F.lit(width - 1)) - F.greatest(
        F.col("ix") - 1, F.lit(0)
    ) + 1
    span_y = F.least(F.col("iy") + 1, F.lit(height - 1)) - F.greatest(
        F.col("iy") - 1, F.lit(0)
    ) + 1
    empty_n = (span_x * span_y - 1).cast("long") - F.col("__n_occ")
    tri_sum = F.col("__occ_sum") + empty_n * F.col("cnt") * F.col("cnt")
    return agg.select(
        "ix", "iy", "cnt",
        tri_sum.alias("tri_sum"),
        F.round(F.sqrt(tri_sum.cast("double")), 6).alias("tri"),
    )


def _horn_gradients(points, bbox, width, height, lon, lat) -> DataFrame:
    """Shared Horn 3×3 gradient pass behind slope_grid / aspect_grid:
    exact integer 8×gradients (gx8, gy8) per in-grid target cell."""
    g = density_grid(points, bbox, width, height, lon=lon, lat=lat).select(
        "ix", "iy", "cnt"
    )
    sp = _kernel_spread(g, ["cnt"], 1).where(
        (F.col("tx") >= 0) & (F.col("tx") < width)
        & (F.col("ty") >= 0) & (F.col("ty") < height)
    )
    wx = (-F.col("kx")) * (2 - F.abs(F.col("ky")))
    wy = (-F.col("ky")) * (2 - F.abs(F.col("kx")))
    return sp.groupBy(F.col("tx").alias("ix"), F.col("ty").alias("iy")).agg(
        F.sum(F.col("cnt") * wx).alias("gx8"),
        F.sum(F.col("cnt") * wy).alias("gy8"),
    )


def aspect_grid(
    points: DataFrame,
    bbox: tuple[float, float, float, float],
    width: int,
    height: int,
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Aspect CLASSES (downhill-direction octants) from the Horn
    gradients — the categorical aspect product, computed WITHOUT the
    atan2 the repo's oracled-trig rule excludes: the octant
    0..7 = floor(angle/45°) of (gx, gy) falls out of pure integer
    sign/magnitude comparisons (boundaries lie exactly on the axes
    and diagonals, so no trig is ever needed; a boundary angle
    belongs to the higher octant, exactly floor(angle/45°); flat
    cells — zero gradient — are octant NULL).

    Shares _horn_gradients with slope_grid. Output: (ix, iy, gx8,
    gy8, octant) with octant 0 = East, counterclockwise (1 = NE, 2 =
    N, … 7 = SE).
    """
    agg = _horn_gradients(points, bbox, width, height, lon, lat)
    gx, gy = F.col("gx8"), F.col("gy8")
    ax, ay = F.abs(gx), F.abs(gy)
    octant = (
        F.when((gx == 0) & (gy == 0), F.lit(None).cast("int"))
        .when((gx > 0) & (gy >= 0) & (ax > ay), F.lit(0))    # [0°, 45°)
        .when((gx > 0) & (gy > 0), F.lit(1))                 # [45°, 90°)
        .when((gx <= 0) & (gy > 0) & (ay > ax), F.lit(2))    # [90°, 135°)
        .when((gx < 0) & (gy > 0), F.lit(3))                 # [135°, 180°)
        .when((gx < 0) & (gy <= 0) & (ax > ay), F.lit(4))    # [180°, 225°)
        .when((gx < 0) & (gy < 0), F.lit(5))                 # [225°, 270°)
        .when((gx >= 0) & (gy < 0) & (ay > ax), F.lit(6))    # [270°, 315°)
        .otherwise(F.lit(7))                                 # [315°, 360°)
    )
    return agg.select("ix", "iy", "gx8", "gy8", octant.alias("octant"))
