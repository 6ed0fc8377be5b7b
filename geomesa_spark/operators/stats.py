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
    "extent",
    "convex_hull_agg",
    "rollup_counts",
    "descriptive_stats",
    "quantiles",
    "percent_rank_norm",
    "clark_evans",
    "directional_distribution",
    "colocation_quotient",
    "benford_digits",
    "hhi_concentration",
    "chi2_contingency",
    "gini_concentration",
    "two_proportion_z",
    "top_share",
    "hellinger_pairs",
    "wilson_intervals",
    "cohens_h",
    "odds_ratio",
    "winsorize",
    "zscore_outliers",
    "histogram",
    "topk",
    "enumeration",
    "cardinality",
    "frequency",
    "frequency_sketch",
    "cms_decode",
    "cms_estimate_long",
    "run_stats_dsl",
]


def minmax(df: DataFrame, cols: list[str]) -> DataFrame:
    """A1: per-attribute min/max + exact count (one row)."""
    aggs = [F.count("*").alias("count")]
    for c in cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    return df.agg(*aggs)


def extent(
    df: DataFrame,
    group_cols: list[str] | None = None,
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Bounding-box aggregate (the reference's st_extent / MinMax-over-
    geometry stat): per group — or globally — the envelope of all
    points plus the count. min/max are exact and order-independent, so
    the result is oracle-stable; map-side partial aggregation means
    only |groups| rows shuffle at any scale."""
    aggs = [
        F.count("*").alias("n"),
        F.min(lon).alias("min_lon"),
        F.min(lat).alias("min_lat"),
        F.max(lon).alias("max_lon"),
        F.max(lat).alias("max_lat"),
    ]
    return df.groupBy(*(group_cols or [])).agg(*aggs) if group_cols else df.agg(*aggs)


def convex_hull_agg(
    df: DataFrame,
    group_cols: list[str],
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Convex hull of each group's point set (reference:
    geomesa-process/geomesa-process-vector/.../process/analytic/
    ConvexHullProcess.scala — aggregates a feature collection into one
    hull geometry). Output: (group cols, n_points, hull_wkt) with the
    engine-wide %.6f WKT convention; degenerate sets emit POINT /
    LINESTRING like JTS does.

    Distributed shape — hull(hull(A) ∪ hull(B)) == hull(A ∪ B), so:
      1. a SHUFFLE-FREE mapInPandas pass reduces every Arrow batch to
         its per-group partial-hull vertices (+ the batch's point
         count): at 100 TB only O(groups × hull-size) rows per batch
         survive into the exchange, never the raw points;
      2. one applyInPandas merge per group over those bounded vertex
         sets computes the exact final hull.
    The vertex order is Andrew monotone chain CCW from the
    lexicographically smallest vertex (geom.convex_hull), closed for
    POLYGON — deterministic, so the WKT is oracle-comparable."""
    import pandas as pd

    from geomesa_spark.geom import convex_hull

    gtypes = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    part_schema = ", ".join(
        [f"`{g}` {gtypes[g]}" for g in group_cols]
        + ["__lon double", "__lat double", "__cnt long"]
    )

    def _partial(batches):
        import numpy as np

        for pdf in batches:
            # dropna=False: Spark's groupBy keeps a null group; pandas'
            # default would silently drop null-keyed rows here
            for key, grp in pdf.groupby(group_cols, sort=False, dropna=False):
                key = key if isinstance(key, tuple) else (key,)
                verts = convex_hull(grp[[lon, lat]].to_numpy(dtype="float64"))
                out = pd.DataFrame(verts, columns=["__lon", "__lat"])
                for g, v in zip(group_cols, key):
                    out[g] = v
                # carry the batch's raw count on the first vertex row
                # (zero elsewhere) so n_points survives the reduction
                out["__cnt"] = 0
                out.loc[out.index[0], "__cnt"] = len(grp)
                yield out[group_cols + ["__lon", "__lat", "__cnt"]]

    def _wkt(verts) -> str:
        pts = [f"{x:.6f} {y:.6f}" for x, y in verts]
        if len(verts) == 1:
            return f"POINT ({pts[0]})"
        if len(verts) == 2:
            return f"LINESTRING ({pts[0]}, {pts[1]})"
        return "POLYGON ((" + ", ".join(pts + [pts[0]]) + "))"

    out_schema = ", ".join(
        [f"`{g}` {gtypes[g]}" for g in group_cols] + ["n_points long", "hull_wkt string"]
    )

    def _merge(key, pdf):
        verts = convex_hull(pdf[["__lon", "__lat"]].to_numpy(dtype="float64"))
        return pd.DataFrame(
            [list(key) + [int(pdf["__cnt"].sum()), _wkt(verts)]],
            columns=group_cols + ["n_points", "hull_wkt"],
        )

    partials = df.select(*group_cols, lon, lat).mapInPandas(_partial, schema=part_schema)
    return partials.groupBy(*group_cols).applyInPandas(_merge, schema=out_schema)


def rollup_counts(df: DataFrame, cols: list[str]) -> DataFrame:
    """OLAP ROLLUP counts (the hierarchical-grouping-sets analogue of
    the reference's layered stat scans): one pass emits counts at every
    prefix level of ``cols`` plus the grand total, with ``gid`` the
    grouping-set id (Catalyst's grouping_id == the ANSI GROUPING()
    bitmask DuckDB computes, so the oracle matches structurally). A
    single Expand+hash-aggregate — no per-level rescan."""
    return df.rollup(*cols).agg(
        F.count("*").alias("n"), F.grouping_id().cast("long").alias("gid")
    )


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


def frequency_sketch(
    df: DataFrame, col: str, eps: float = 0.001, confidence: float = 0.99, seed: int = 42
) -> DataFrame:
    """A3 sketch form (reference Frequency.scala :~150 is a
    CountMinSketch merged across tablets): Spark's mergeable
    ``count_min_sketch`` aggregate — partial sketches per partition,
    merged in the final aggregation, exactly the reference's
    distribution shape. Returns one row with the serialized sketch
    (decode with cms_decode / query longs with cms_estimate_long)."""
    return df.agg(
        F.count_min_sketch(F.col(col), F.lit(eps), F.lit(confidence), F.lit(seed)).alias(
            "cms"
        )
    )


def cms_decode(buf: bytes) -> dict:
    """Parse Spark's serialized CountMinSketch (version 1 binary
    layout: int version, long totalCount, int depth, int width,
    long[depth] hashA, long[depth][width] table — public format from
    org.apache.spark.util.sketch.CountMinSketchImpl)."""
    import struct

    import numpy as np

    ver, total, depth, width = struct.unpack_from(">iqii", buf, 0)
    off = 20
    hash_a = np.frombuffer(buf, dtype=">i8", count=depth, offset=off)
    off += 8 * depth
    table = np.frombuffer(buf, dtype=">i8", count=depth * width, offset=off).reshape(
        depth, width
    )
    return {"version": ver, "total": total, "depth": depth, "width": width,
            "hash_a": hash_a, "table": table}


def cms_estimate_long(sketch: dict, item: int) -> int:
    """Point estimate for a LONG item (mirrors CountMinSketchImpl.hash:
    h = hashA[i]*item; h += h >>> 32; h &= 2^31-1; h %= width)."""
    est = None
    for i in range(sketch["depth"]):
        h = (int(sketch["hash_a"][i]) * int(item)) & 0xFFFFFFFFFFFFFFFF
        h = (h + (h >> 32)) & 0x7FFFFFFF
        c = int(sketch["table"][i][h % sketch["width"]])
        est = c if est is None else min(est, c)
    return int(est or 0)


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


def descriptive_stats(df: DataFrame, cols: list[str], covariance: bool = True) -> DataFrame:
    """A6: count/mean/variance/skewness/kurtosis per attribute plus
    pairwise sample covariance (reference DescriptiveStats keeps the
    full co-moment matrix; Spark's covar_samp is the same mergeable
    accumulator)."""
    aggs = [F.count("*").alias("count")]
    for c in cols:
        aggs += [
            F.avg(c).alias(f"mean_{c}"),
            F.var_samp(c).alias(f"var_{c}"),
            F.skewness(c).alias(f"skew_{c}"),
            F.kurtosis(c).alias(f"kurt_{c}"),
        ]
    if covariance:
        for i, a in enumerate(cols):
            for b in cols[i + 1:]:
                aggs.append(F.covar_samp(a, b).alias(f"cov_{a}_{b}"))
    return df.agg(*aggs)


def quantiles(
    df: DataFrame,
    col: str,
    probs: tuple[float, ...] = (0.25, 0.5, 0.75),
    group_cols: list[str] | None = None,
    approx: bool = False,
) -> DataFrame:
    """Per-group quantiles of ``col`` (the percentile extension of the
    reference's DescriptiveStats): ANSI linear interpolation at
    p·(n−1), rounded to 6 dp so the interpolation double hashes
    identically cross-engine.

    ``approx=False`` uses Spark's exact ``percentile`` — a sort-based
    aggregate that materializes each group's values, fine for bounded
    per-group cardinality. At 100 TB groups, pass ``approx=True`` for
    the mergeable t-digest-style ``percentile_approx`` sketch (constant
    memory per group; no exact-SQL oracle, property-tested instead)."""
    fn = "percentile_approx" if approx else "percentile"
    names = [f"q{int(round(p * 100)):02d}" for p in probs]
    if len(set(names)) != len(names):
        raise ValueError(
            f"probs {probs} collide at whole-percent column names {names}; "
            "space them at least a percent apart (or alias manually)"
        )
    aggs = [F.count("*").alias("n")] + [
        F.round(F.expr(f"{fn}(`{col}`, {p!r})"), 6).alias(name)
        for p, name in zip(probs, names)
    ]
    return df.groupBy(*(group_cols or [])).agg(*aggs) if group_cols else df.agg(*aggs)


def directional_distribution(
    df: DataFrame,
    group_cols: list[str],
    x: str = "lon",
    y: str = "lat",
) -> DataFrame:
    """Standard deviational ellipse per group (the classic GIS
    "directional distribution" summary): mean center, major/minor axis
    lengths, and orientation of the point cloud's covariance ellipse.

    Transcendental-free by construction: instead of the textbook
    tan 2θ/rotated-σ formulas (atan/sin/cos — libm-divergent across
    engines), the axes come from the CLOSED-FORM eigenvalues of the
    2×2 covariance matrix — λ± = ((a+c) ± √((a−c)² + 4b²))/2 — and the
    orientation is reported as tan θ = (λ₁ − a)/b (the eigenvector
    slope), so the only non-arithmetic op is IEEE-exact sqrt. The
    moments Σx, Σy, Σx², Σy², Σxy are EXACT decimal sums (coordinates
    are 2-dp rationals); one fixed double sequence follows. Round 6.
    """
    xd = F.col(x).cast("decimal(12,2)")
    yd = F.col(y).cast("decimal(12,2)")
    agg = df.groupBy(*group_cols).agg(
        F.count("*").alias("n"),
        F.sum(xd).alias("sx"),
        F.sum(yd).alias("sy"),
        F.sum(xd * xd).alias("sxx"),
        F.sum(yd * yd).alias("syy"),
        F.sum(xd * yd).alias("sxy"),
    )
    sx_d = F.col("sx").cast("double")
    sy_d = F.col("sy").cast("double")
    n = F.col("n")
    a = (F.col("sxx").cast("double") - sx_d * F.col("sx") / n) / n
    b = (F.col("sxy").cast("double") - sx_d * F.col("sy") / n) / n
    c = (F.col("syy").cast("double") - sy_d * F.col("sy") / n) / n
    disc = F.sqrt((a - c) * (a - c) + 4.0 * b * b)
    lam1 = (a + c + disc) / 2.0
    lam2 = (a + c - disc) / 2.0
    return agg.select(
        *group_cols,
        "n",
        F.round(sx_d / n, 6).alias("mean_x"),
        F.round(sy_d / n, 6).alias("mean_y"),
        F.round(F.sqrt(F.greatest(lam1, F.lit(0.0))), 6).alias("major_axis"),
        F.round(F.sqrt(F.greatest(lam2, F.lit(0.0))), 6).alias("minor_axis"),
        F.round(
            F.when(b == 0.0, F.lit(0.0)).otherwise((lam1 - a) / b), 6
        ).alias("tan_theta"),
    )


def clark_evans(
    points: DataFrame,
    id_col,
    area_m2: float,
    bits: int = 6,
    order_cols: tuple = ("doc_id", "span_offset"),
) -> DataFrame:
    """Clark–Evans nearest-neighbor index: R = mean observed NN
    distance / expected NN distance under CSR (0.5/√density). R < 1 =
    clustered, R ≈ 1 = random, R > 1 = dispersed.

    The exact nearest-neighbor distance per point comes from the kNN
    operator at k=2 (ring passes + exact fallback — never a cartesian):
    the self-match ranks first at distance 0, so min(dist) over the
    non-self rows is the true NN (exact duplicates give 0 either way).
    The mean is an EXACT decimal sum of 6-dp-rounded distances divided
    once — bit-stable cross-engine; R is two more IEEE ops on scalars.
    Output: one row (n_points, mean_nn_m, r_index).
    """
    from geomesa_spark.operators.knn import knn

    pts = points.withColumn("__pid", id_col)
    probes = pts.select(
        F.col("__pid").alias("q_id"), "lon", "lat", F.lit(2).alias("k")
    )
    nb = knn(pts, probes, bits=bits, order_cols=order_cols, k_max=2)
    nn = (
        nb.where(F.col("__pid") != F.col("q_id"))
        .groupBy("q_id")
        .agg(F.min("dist_m").alias("nn_m"))
    )
    agg = nn.agg(
        F.count("*").alias("n_points"),
        F.sum(F.round(F.col("nn_m"), 6).cast("decimal(28,6)")).alias("__s"),
    )
    mean = F.col("__s").cast("double") / F.col("n_points")
    expected = 0.5 / F.sqrt(F.col("n_points") / F.lit(float(area_m2)))
    out = agg.select(
        "n_points",
        F.round(mean, 6).alias("mean_nn_m"),
        F.round(mean / expected, 6).alias("r_index"),
    )
    # hold the knn result: its pass caches are scoped to nb's lifetime
    out._knn_scope = nb
    return out


def colocation_quotient(
    points: DataFrame,
    id_col,
    cat_col: str,
    k: int = 5,
    bits: int = 6,
    order_cols: tuple = ("doc_id", "span_offset"),
) -> DataFrame:
    """Colocation quotient CLQ(A→B): how over/under-represented
    category B is among the k nearest neighbors of category-A points,
    vs its global share — CLQ = (C_AB / (N_A·k)) / (N_B' / (N−1)) with
    N_B' = N_B − 1 when A = B (a point is never its own neighbor).
    CLQ > 1 means B colocates with A.

    The k-NN sets come from the kNN operator at k+1 (self ranks first
    at distance 0; a deterministic re-rank after dropping self keeps
    exactly k, covering the duplicate-point edge where self falls out
    of the top k+1). All counts are exact integers; the quotient is a
    fixed IEEE sequence, round 6. Output: (cat_a, cat_b, c_ab, clq).
    """
    from pyspark.sql import Window as W

    from geomesa_spark.operators.knn import knn

    pts = points.withColumn("__pid", id_col).withColumn("__cat", F.col(cat_col))
    probes = pts.select(
        F.col("__pid").alias("q_id"),
        F.col("__cat").alias("cat_a"),
        "lon",
        "lat",
        F.lit(k + 1).alias("k"),
    )
    nb = knn(pts, probes, bits=bits, order_cols=order_cols, k_max=k + 1)
    w = W.partitionBy("q_id").orderBy(F.col("dist_m"), *[F.col(c) for c in order_cols])
    top = (
        nb.where(F.col("__pid") != F.col("q_id"))
        .withColumn("__r", F.row_number().over(w))
        .where(F.col("__r") <= k)
    )
    c = top.groupBy("cat_a", F.col("__cat").alias("cat_b")).agg(
        F.count("*").alias("c_ab")
    )
    tot = pts.groupBy(F.col("__cat").alias("cat_b")).agg(F.count("*").alias("n_b"))
    n_all = pts.agg(F.count("*").alias("n"))
    out = (
        c.join(tot.withColumnRenamed("cat_b", "cat_a").withColumnRenamed("n_b", "n_a"), "cat_a")
        .join(tot, "cat_b")
        .crossJoin(F.broadcast(n_all))
    )
    nb_eff = F.col("n_b") - F.when(F.col("cat_a") == F.col("cat_b"), 1).otherwise(0)
    clq = (F.col("c_ab").cast("double") / (F.col("n_a") * k)) / (
        nb_eff.cast("double") / (F.col("n") - 1)
    )
    res = out.select("cat_a", "cat_b", "c_ab", F.round(clq, 6).alias("clq"))
    res._knn_scope = nb
    return res


BENFORD_P = [
    0.3010299956639812, 0.17609125905568124, 0.12493873660829992,
    0.09691001300805642, 0.07918124604762482, 0.06694678963061322,
    0.05799194697768673, 0.05115252244738129, 0.04575749056067514,
]  # log10(1 + 1/d), d = 1..9 — precomputed literals: both engines
# parse the same 17-significant-digit decimal to the same double, so
# no transcendental ever evaluates inside either engine.


def benford_digits(df: DataFrame, col: str, scale: int = 100) -> DataFrame:
    """Benford's-law first-digit audit of a numeric column (the
    fraud/synthetic-data screen): observed count per leading digit vs
    the Benford expectation n·log10(1+1/d), with the per-digit
    chi-square term.

    Digit extraction is float-free: the value scales to its exact
    fixed-point integer (``scale`` = 10^decimals), casts to a decimal
    string — integer→string is exact and identical cross-engine,
    unlike double→string or log10-based digit math — and takes the
    first character. Zero/negative-scaled values are excluded. The
    Benford probabilities are Python-precomputed literals (see
    BENFORD_P), so the expectation is one multiply from exact counts.
    Output: (digit, n, expected_n, chi_term) round 6.
    """
    k = F.round(F.abs(F.col(col)) * scale).cast("long")
    pos = df.select(k.alias("__k")).where(F.col("__k") >= 1)
    d = F.substring(F.col("__k").cast("string"), 1, 1).cast("int")
    counts = pos.select(d.alias("digit")).groupBy("digit").agg(
        F.count("*").alias("n")
    )
    tot = counts.agg(F.sum("n").alias("__t"))
    p = F.element_at(F.array(*[F.lit(x) for x in BENFORD_P]), F.col("digit"))
    e = F.col("__t").cast("double") * p
    diff = F.col("n").cast("double") - e
    return counts.crossJoin(F.broadcast(tot)).select(
        "digit",
        "n",
        F.round(e, 6).alias("expected_n"),
        F.round(diff * diff / e, 6).alias("chi_term"),
    )


def hhi_concentration(df: DataFrame, key_col: str) -> DataFrame:
    """Herfindahl–Hirschman concentration of row share per key — the
    skew screen (hot-key detection) a pipeline runs before choosing a
    partitioning: HHI = Σ (c_k/T)² ∈ (1/n, 1], with the
    effective-key-count 1/HHI alongside. Two exact integer sums (T,
    Σc²) → HHI = Σc²/T² as one fixed double sequence; one hash
    aggregate + one 1-row reduce. Output: (n_keys, n_rows, hhi,
    effective_keys) round 6.
    """
    c = df.groupBy(key_col).agg(F.count("*").alias("c"))
    agg = c.agg(
        F.count("*").alias("n_keys"),
        F.sum("c").alias("t"),
        F.sum(F.col("c") * F.col("c")).alias("ss"),
    )
    hhi = F.col("ss").cast("double") / (F.col("t").cast("double") * F.col("t"))
    return agg.select(
        "n_keys",
        F.col("t").alias("n_rows"),
        F.round(hhi, 6).alias("hhi"),
        F.round(1.0 / hhi, 6).alias("effective_keys"),
    )


def chi2_contingency(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Pearson chi-square test of independence between two categorical
    columns, plus Cramér's V — "are these attributes associated?", the
    screen a pipeline runs before conditioning one column on another.

    Never materializes the dense category cross product: for observed
    cell counts n with expectations e = r·c/N, the unobserved cells'
    contribution Σe telescopes, giving chi² = Σ_obs((n−e)²/e − e) + N
    exactly. Per-cell terms are a fixed IEEE sequence rounded to 6
    decimals, then summed as DECIMAL(30,6) — order-independent, so the
    result is deterministic under any partitioning. Shape: one hash
    aggregate on (a,b), two tiny marginal aggregates DERIVED from it
    (the fact table is scanned once) joined back broadcast, one 1-row
    reduce. Cramér's V = sqrt(chi²/(N·min(r−1,c−1))) — sqrt-only,
    NULL when either side is constant. Output: one row (n_obs,
    r_cats, c_cats, dof, chi2, cramers_v).
    """
    cells = (
        df.select(F.col(col_a).alias("a"), F.col(col_b).alias("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("n"))
    )
    ra = cells.groupBy("a").agg(F.sum("n").alias("ra"))
    cb = cells.groupBy("b").agg(F.sum("n").alias("cb"))
    tot = cells.agg(
        F.sum("n").alias("nn"),
        F.countDistinct("a").alias("r_cats"),
        F.countDistinct("b").alias("c_cats"),
    )
    e = F.col("ra").cast("double") * F.col("cb").cast("double") / F.col("nn").cast("double")
    d = F.col("n").cast("double") - e
    term = F.round(d * d / e - e, 6).cast("decimal(30,6)")
    agg = (
        cells.join(F.broadcast(ra), "a")
        .join(F.broadcast(cb), "b")
        .crossJoin(F.broadcast(tot))
        .groupBy("nn", "r_cats", "c_cats")
        .agg(F.sum(term).alias("acc"))
    )
    chi2 = (F.col("acc") + F.col("nn").cast("decimal(30,6)")).cast("double")
    m = F.least(F.col("r_cats") - 1, F.col("c_cats") - 1).cast("long")
    return agg.select(
        F.col("nn").alias("n_obs"),
        "r_cats",
        "c_cats",
        ((F.col("r_cats") - 1).cast("long") * (F.col("c_cats") - 1)).alias("dof"),
        F.round(chi2, 6).alias("chi2"),
        F.round(
            F.when(m > 0, F.sqrt(chi2 / (F.col("nn").cast("double") * m.cast("double")))),
            6,
        ).alias("cramers_v"),
    )


def two_proportion_z(
    df: DataFrame, cond_col: str, success_col: str
) -> DataFrame:
    """Two-proportion z-test (the A/B-test primitive; the 2×2 special
    case of ``chi2_contingency`` reported as a signed z): group A =
    rows where boolean ``cond_col`` is true, group B = the rest;
    success = boolean ``success_col``. z = (p1−p2)/sqrt(p̂(1−p̂)(1/n1 +
    1/n2)) with pooled p̂.

    ONE hash aggregate with conditional counts (no join, no second
    scan); four exact integers feed a fixed IEEE tail, sqrt-only.
    Output: one row (n1, s1, n2, s2, p1, p2, z) round 6; z is NULL
    when either group is empty or p̂ is degenerate (0 or 1).
    """
    c = F.col(cond_col)
    s = F.col(success_col).cast("long")
    agg = df.agg(
        F.sum(F.when(c, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(c, s).otherwise(0)).alias("s1"),
        F.sum(F.when(~c, 1).otherwise(0)).alias("n2"),
        F.sum(F.when(~c, s).otherwise(0)).alias("s2"),
    )
    n1, s1 = F.col("n1").cast("double"), F.col("s1").cast("double")
    n2, s2 = F.col("n2").cast("double"), F.col("s2").cast("double")
    p1, p2 = s1 / n1, s2 / n2
    pp = (s1 + s2) / (n1 + n2)
    se = F.sqrt(pp * (F.lit(1.0) - pp) * (F.lit(1.0) / n1 + F.lit(1.0) / n2))
    return agg.select(
        "n1", "s1", "n2", "s2",
        F.round(p1, 6).alias("p1"),
        F.round(p2, 6).alias("p2"),
        F.round(
            F.when((F.col("n1") > 0) & (F.col("n2") > 0) & (se > 0.0), (p1 - p2) / se),
            6,
        ).alias("z"),
    )


def gini_concentration(df: DataFrame, key_col: str) -> DataFrame:
    """Gini coefficient of the per-key row-count distribution — the
    inequality companion to ``hhi_concentration``'s skew screen:
    G = (2·Σᵢ i·cᵢ)/(n·T) − (n+1)/n over counts sorted ascending.

    The global sort collapses to a COUNT-OF-COUNTS fold: keys sharing
    count c occupy a contiguous rank block [R+1, R+m], whose rank-sum
    is m·R + m(m+1)/2 — so A = Σ_blocks c·(m·R + m(m+1)/2) comes from
    ONE sorted in-array fold over the tiny (count → #keys) table; no
    global Window over the keys, no pairwise join. All integers until
    the two final divisions (round 6); bigint-safe while T·n < 2^63.
    Output: one row (n_keys, n_rows, gini).
    """
    c = df.groupBy(key_col).agg(F.count("*").alias("c"))
    cc = c.groupBy("c").agg(F.count("*").alias("m"))
    row = cc.agg(F.sort_array(F.collect_list(F.struct("c", "m"))).alias("arr"))
    fold = F.expr(
        """
        aggregate(
          arr,
          named_struct('r', 0L, 'a', 0L),
          (acc, x) -> named_struct(
            'r', acc.r + x.m,
            'a', acc.a + x.c * (x.m * acc.r + x.m * (x.m + 1L) DIV 2L)))
        """
    )
    acc = row.select(
        F.aggregate("arr", F.lit(0).cast("long"), lambda a, x: a + x["m"]).alias("n"),
        F.aggregate(
            "arr", F.lit(0).cast("long"), lambda a, x: a + x["c"] * x["m"]
        ).alias("t"),
        fold.alias("f"),
    )
    n, t = F.col("n"), F.col("t")
    g = (2 * F.col("f.a")).cast("double") / (n.cast("double") * t.cast("double")) - (
        n + 1
    ).cast("double") / n.cast("double")
    # empty input → one row of NULLs, matching the oracle's ungrouped
    # aggregate (and the sibling hhi_concentration's shape)
    return acc.select(
        F.when(n > 0, n).alias("n_keys"),
        F.when(n > 0, t).alias("n_rows"),
        F.round(F.when(n > 0, g), 6).alias("gini"),
    )


def percent_rank_norm(
    df: DataFrame,
    col: str,
    group_cols: list[str],
    out_col: str = "pr",
) -> DataFrame:
    """Per-group percent-rank normalization (the quantile-transform
    feature-scaling stage): pr = (rank−1)/(n−1) ∈ [0,1] within each
    group, SQL-standard tie semantics (equal values share a rank, so
    the output is deterministic under any shuffle order).

    One partitioned window — the shuffle is on the group key, the same
    cost as a groupBy at any key count. The ratio is one double
    division of exact integers → bit-stable cross-engine (round 6 dp).
    """
    from pyspark.sql import Window as W

    w = W.partitionBy(*group_cols).orderBy(F.col(col))
    return df.withColumn(out_col, F.round(F.percent_rank().over(w), 6))


def winsorize(
    df: DataFrame,
    col: str,
    group_cols: list[str],
    lower: float = 0.05,
    upper: float = 0.95,
    out_col: str | None = None,
) -> DataFrame:
    """Per-group winsorization: clip ``col`` to the group's
    [lower, upper] exact quantiles — the standard outlier-clipping
    preprocessing stage next to zscore_outliers' row-dropping one.

    Shape mirrors zscore_outliers: ONE hash aggregate computes the two
    percentile bounds per group (map-side partials), broadcast-joined
    back — the fact rows never reshuffle. The clip is least/greatest
    codegen. Bounds use Spark's exact ``percentile`` (ANSI linear
    interpolation, deterministic); rounded 6 dp like quantiles so the
    clipped doubles hash identically cross-engine. At unbounded group
    cardinality switch the bound computation to percentile_approx (the
    quantiles(approx=True) path).
    """
    from pyspark.sql.functions import broadcast

    bounds = df.groupBy(*group_cols).agg(
        F.round(F.expr(f"percentile(`{col}`, {lower!r})"), 6).alias("__lo"),
        F.round(F.expr(f"percentile(`{col}`, {upper!r})"), 6).alias("__hi"),
    )
    clipped = F.greatest(F.col("__lo"), F.least(F.col("__hi"), F.col(col)))
    return (
        df.join(broadcast(bounds), on=group_cols)
        .withColumn(out_col or col, clipped)
        .drop("__lo", "__hi")
    )


def zscore_outliers(
    df: DataFrame,
    col: str,
    group_cols: list[str],
    threshold: float = 2.0,
) -> DataFrame:
    """Per-group z-score anomaly filter — the outlier-removal stage of
    a training-data quality pipeline (and the filtering counterpart of
    A6 DescriptiveStats): keep rows with |x − μ| > t·σ of their group.

    Scale shape: group moments come from ONE hash aggregate with
    map-side partials (n, Σx, Σx² — Chan et al.'s mergeable moments),
    then broadcast-join back onto the fact table: no second shuffle of
    the raw rows, ever. Float parity: Σx / Σx² are EXACT decimal sums
    (order-independent), so μ = Σx/n, σ² = Σx²/n − μ², z = (x−μ)/σ is
    one fixed IEEE expression both engines evaluate identically —
    the z column hashes bit-for-bit cross-engine after round(…, 6).
    Population σ (ddof=0), matching the reference's Stat DSL variance.
    """
    from pyspark.sql.functions import broadcast

    dec = F.col(col).cast("decimal(18,2)")
    stats = df.groupBy(*group_cols).agg(
        F.count("*").alias("__n"),
        F.sum(dec).alias("__sv"),
        F.sum(dec * dec).alias("__ssq"),
    )
    m = F.col("__sv").cast("double") / F.col("__n")
    var = F.col("__ssq").cast("double") / F.col("__n") - m * m
    sd = F.sqrt(var)
    joined = df.join(broadcast(stats), on=group_cols)
    z = (F.col(col) - m) / sd
    return (
        joined.where(sd > 0)
        .where(F.abs(z) > threshold)
        .withColumn("z", F.round(z, 6))
        .drop("__n", "__sv", "__ssq")
    )


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
            out[stmt] = _grouped_stat(df, attr, *parse(inner))
        else:
            raise ValueError(f"unknown stat: {name!r}")
    return out


def _grouped_stat(df: DataFrame, attr: str, iname: str, iraw: str) -> DataFrame:
    """A8 GroupBy(attr, inner) for EVERY inner stat the DSL supports
    (reference GroupBy.scala nests arbitrary stats; each maps to a
    grouped aggregation — same partial/final merge shape)."""
    from pyspark.sql import Window

    args = [a for a in iraw.split(",") if a != ""]
    if iname == "Count":
        return df.groupBy(attr).agg(F.count("*").alias("count"))
    if iname == "MinMax":
        c = args[0]
        return df.groupBy(attr).agg(F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}"))
    if iname == "Cardinality":
        c = args[0]
        return df.groupBy(attr).agg(
            F.approx_count_distinct(c).alias(f"approx_distinct_{c}"),
            F.countDistinct(c).alias(f"exact_distinct_{c}"),
        )
    if iname in ("Enumeration", "Frequency"):
        return df.groupBy(attr, args[0]).agg(F.count("*").alias("freq"))
    if iname == "TopK":
        c, k = args[0], int(args[1]) if len(args) > 1 else 10
        counts = df.groupBy(attr, c).agg(F.count("*").alias("cnt"))
        w = Window.partitionBy(attr).orderBy(F.col("cnt").desc(), F.col(c).asc())
        return (
            counts.withColumn("__rk", F.row_number().over(w))
            .where(F.col("__rk") <= k)
            .drop("__rk")
        )
    if iname == "Histogram":
        c, bins, lo, hi = args[0], int(args[1]), float(args[2]), float(args[3])
        w = (hi - lo) / bins
        b = F.least(
            F.greatest(F.floor((F.col(c) - lo) / w).cast("int"), F.lit(0)), F.lit(bins - 1)
        )
        return (
            df.where(F.col(c).isNotNull())
            .groupBy(attr, b.alias("bin"))
            .agg(F.count("*").alias("cnt"))
        )
    if iname == "DescriptiveStats":
        aggs = [F.count("*").alias("count")]
        for c in args:
            aggs += [
                F.avg(c).alias(f"mean_{c}"),
                F.var_samp(c).alias(f"var_{c}"),
            ]
        for i, a in enumerate(args):
            for b2 in args[i + 1:]:
                aggs.append(F.covar_samp(a, b2).alias(f"cov_{a}_{b2}"))
        return df.groupBy(attr).agg(*aggs)
    raise ValueError(f"unsupported GroupBy inner stat: {iname!r}")


def top_share(df: DataFrame, key_col: str, k: int) -> DataFrame:
    """Pareto concentration: the fraction of all rows owned by the
    ``k`` heaviest keys — the "does 1% of users generate 90% of
    events?" screen completing the gini/hhi trio (and the direct
    input to a hot-key salting decision: share(k)/k is the skew of
    the head).

    Same count-of-counts collapse as gini_concentration: keys sharing
    a count form one block, so the top-k cut is ONE fold over the
    count-descending block list (take min(m, k_left) keys per block)
    — no global window over the key table, no sort of |keys| rows.
    Exact integers; share is one double division, round 6. Output:
    one row (k, n_keys, n_rows, top_rows, share); NULLs when the
    input is empty.
    """
    if k <= 0:
        raise ValueError("k must be positive")
    c = df.groupBy(key_col).agg(F.count("*").alias("c"))
    cc = c.groupBy("c").agg(F.count("*").alias("m"))
    row = cc.agg(
        F.reverse(F.sort_array(F.collect_list(F.struct("c", "m")))).alias("arr")
    )
    fold = F.expr(
        f"""
        aggregate(
          arr,
          named_struct('left', {int(k)}L, 'rows', 0L),
          (a, x) -> named_struct(
            'left', greatest(a.left - x.m, 0L),
            'rows', a.rows + x.c * least(x.m, a.left)))
        """
    )
    acc = row.select(
        F.aggregate("arr", F.lit(0).cast("long"), lambda a, x: a + x["m"]).alias("n"),
        F.aggregate(
            "arr", F.lit(0).cast("long"), lambda a, x: a + x["c"] * x["m"]
        ).alias("t"),
        fold.alias("f"),
    )
    n, t, tr = F.col("n"), F.col("t"), F.col("f.rows")
    return acc.select(
        F.lit(int(k)).cast("long").alias("k"),
        F.when(n > 0, n).alias("n_keys"),
        F.when(n > 0, t).alias("n_rows"),
        F.when(n > 0, tr).alias("top_rows"),
        F.round(F.when(n > 0, tr.cast("double") / t.cast("double")), 6).alias("share"),
    )


def hellinger_pairs(
    df: DataFrame,
    group_col: str,
    value_col: str,
    lo: float,
    hi: float,
    nbins: int,
) -> DataFrame:
    """Pairwise Hellinger distance between the groups' value
    distributions — the distribution-DRIFT screen (is segment A's
    value histogram shaped like segment B's?) built sqrt-only, unlike
    KL/PSI/JSD whose logarithms the repo's oracled-trig rule excludes:
    BC = Σᵢ √(pᵢ·qᵢ) (Bhattacharyya), H = √(1 − BC).

    Shape: one histogram aggregate per (group, bin) (clamped
    fixed-width bins), per-group totals joined back BROADCAST, then a
    bin equi-join of the group pairs (group_a < group_b) — absent
    bins contribute 0 to BC, so the inner join is exact. Per-bin
    terms are a fixed IEEE sequence rounded to 6 decimals and summed
    as DECIMAL — order-independent under any partitioning; BC ≤ 1 up
    to rounding, so 1 − BC is clamped at 0 before the final sqrt.
    Output: (group_a, group_b, n_bins_shared, bc, hellinger).
    """
    width = (hi - lo) / nbins
    b = F.least(
        F.greatest(F.floor((F.col(value_col) - lo) / width), F.lit(0)),
        F.lit(nbins - 1),
    ).cast("long")
    cells = (
        df.select(F.col(group_col).alias("g"), b.alias("bin"))
        .groupBy("g", "bin")
        .agg(F.count("*").alias("c"))
    )
    tot = cells.groupBy("g").agg(F.sum("c").alias("t"))
    pg = cells.join(F.broadcast(tot), "g").select(
        "g", "bin", (F.col("c").cast("double") / F.col("t").cast("double")).alias("p")
    )
    a = pg.select(F.col("g").alias("group_a"), "bin", F.col("p").alias("pa"))
    bb = pg.select(F.col("g").alias("group_b"), "bin", F.col("p").alias("pb"))
    pairs = a.join(bb, "bin").where(F.col("group_a") < F.col("group_b"))
    term = F.round(F.sqrt(F.col("pa") * F.col("pb")), 6).cast("decimal(20,6)")
    agg = pairs.groupBy("group_a", "group_b").agg(
        F.count("*").alias("__nb"), F.sum(term).alias("bc_d")
    )
    # the pair UNIVERSE comes from the group list, not from shared
    # bins: a pair with disjoint histograms (the maximally drifted
    # case, H = 1) has no shared-bin rows and would otherwise be
    # silently absent from the output
    ga = tot.select(F.col("g").alias("group_a"))
    gb = tot.select(F.col("g").alias("group_b"))
    univ = ga.crossJoin(gb).where(F.col("group_a") < F.col("group_b"))
    full = univ.join(F.broadcast(agg), ["group_a", "group_b"], "left")
    bc = F.coalesce(F.col("bc_d").cast("double"), F.lit(0.0))
    return full.select(
        "group_a",
        "group_b",
        F.coalesce(F.col("__nb"), F.lit(0).cast("long")).alias("n_bins_shared"),
        F.round(bc, 6).alias("bc"),
        F.round(F.sqrt(F.greatest(F.lit(1.0) - bc, F.lit(0.0))), 6).alias("hellinger"),
    )


def wilson_intervals(
    df: DataFrame,
    group_col: str,
    success_col: str,
    z: float = 1.96,
) -> DataFrame:
    """Wilson score confidence interval for each group's success rate
    — the ranking-under-uncertainty primitive (sort segments by
    ci_low, not by the raw rate, so small-n groups can't fake the
    top): center = (p̂ + z²/2n)/(1 + z²/n), half-width =
    z·√(p̂(1−p̂)/n + z²/4n²)/(1 + z²/n).

    One conditional hash aggregate per group; two exact integers per
    group feed a fixed sqrt-only IEEE tail (the same double sequence
    in the oracle — ``z`` must be quoted identically, repr handles
    it). Output: (group, n, s, rate, ci_low, ci_high) round 6.
    """
    g = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count("*").alias("n"),
        F.sum(F.col(success_col).cast("long")).alias("s"),
    )
    n = F.col("n").cast("double")
    p = F.col("s").cast("double") / n
    z2 = float(z) * float(z)
    denom = F.lit(1.0) + F.lit(z2) / n
    center = (p + F.lit(z2) / (2.0 * n)) / denom
    hw = (
        F.lit(float(z))
        * F.sqrt(p * (F.lit(1.0) - p) / n + F.lit(z2) / (4.0 * n * n))
        / denom
    )
    return g.select(
        F.col("grp").alias(group_col),
        "n",
        "s",
        F.round(p, 6).alias("rate"),
        F.round(center - hw, 6).alias("ci_low"),
        F.round(center + hw, 6).alias("ci_high"),
    )


def cohens_h(df: DataFrame, cond_col: str, success_col: str) -> DataFrame:
    """Cohen's h effect size for two proportions — the magnitude
    companion to two_proportion_z's significance (a huge-n A/B can be
    "significant" at a meaningless effect): h = 2·asin(√p1) −
    2·asin(√p2) (the arcsine variance-stabilizing transform).

    Same single conditional aggregate as the z-test; the tail is
    sqrt+asin only — both in the engine's allowed oracle-exact set
    (the haversine precedent; ln/atan2 remain excluded). Output: one
    row (n1, s1, n2, s2, p1, p2, h) round 6; h NULL when either group
    is empty.
    """
    c = F.col(cond_col)
    sc = F.col(success_col).cast("long")
    agg = df.agg(
        F.sum(F.when(c, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(c, sc).otherwise(0)).alias("s1"),
        F.sum(F.when(~c, 1).otherwise(0)).alias("n2"),
        F.sum(F.when(~c, sc).otherwise(0)).alias("s2"),
    )
    p1 = F.col("s1").cast("double") / F.col("n1").cast("double")
    p2 = F.col("s2").cast("double") / F.col("n2").cast("double")
    h = 2.0 * F.asin(F.sqrt(p1)) - 2.0 * F.asin(F.sqrt(p2))
    # guard p1/p2 too: on an empty group Spark's 0/0 is NULL but
    # DuckDB's is NaN — the NULL contract must hold in both engines
    return agg.select(
        "n1", "s1", "n2", "s2",
        F.round(F.when(F.col("n1") > 0, p1), 6).alias("p1"),
        F.round(F.when(F.col("n2") > 0, p2), 6).alias("p2"),
        F.round(F.when((F.col("n1") > 0) & (F.col("n2") > 0), h), 6).alias("h"),
    )


def odds_ratio(df: DataFrame, cond_col: str, success_col: str) -> DataFrame:
    """Odds ratio for the 2×2 outcome table — the epidemiology-style
    effect measure completing the A/B family (two_proportion_z's
    significance, cohens_h's standardized magnitude, OR's
    multiplicative odds): OR = (s1·f2)/(s2·f1) with f = failures.

    Same single conditional aggregate; the cross products are EXACT
    integers and OR is one double division, round 6 — NULL when any
    margin that would divide by zero is empty (s2 = 0 or f1 = 0).
    Output: one row (n1, s1, n2, s2, odds1, odds2, odds_ratio).
    """
    c = F.col(cond_col)
    sc = F.col(success_col).cast("long")
    agg = df.agg(
        F.sum(F.when(c, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(c, sc).otherwise(0)).alias("s1"),
        F.sum(F.when(~c, 1).otherwise(0)).alias("n2"),
        F.sum(F.when(~c, sc).otherwise(0)).alias("s2"),
    )
    f1 = F.col("n1") - F.col("s1")
    f2 = F.col("n2") - F.col("s2")
    odds1 = F.when(f1 > 0, F.col("s1").cast("double") / f1.cast("double"))
    odds2 = F.when(f2 > 0, F.col("s2").cast("double") / f2.cast("double"))
    orr = F.when(
        (F.col("s2") > 0) & (f1 > 0),
        (F.col("s1") * f2).cast("double") / (F.col("s2") * f1).cast("double"),
    )
    return agg.select(
        "n1", "s1", "n2", "s2",
        F.round(odds1, 6).alias("odds1"),
        F.round(odds2, 6).alias("odds2"),
        F.round(orr, 6).alias("odds_ratio"),
    )
