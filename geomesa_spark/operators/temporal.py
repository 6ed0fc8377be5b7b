"""Temporal joins Spark lacks as built-ins: AS-OF attach.

The build brief names as-of joins among the operators to re-express
Spark-first (no reference analogue — GeoMesa's closest is the Z3 time
filter). The scalable shape is NOT a range join (which Catalyst plans
as a nested loop) but the UNION + ordered-window carry:

  union(left rows tagged L, right rows tagged R, keeping only the
        right's key/time/value columns)
  window partitionBy(keys) orderBy(time, tag, right_tiebreak)
        rowsBetween(unbounded preceding, current row)
  attach last(value, ignorenulls) over that window; keep left rows.

One shuffle on the join keys, state = one running value per key inside
the window operator — the same cost as a groupBy, at any key count. The
tag ordering encodes the bound: inclusive (right.time <= left.time)
sorts rights BEFORE lefts at equal time; strict sorts them after.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "asof_attach",
    "date_offset",
    "funnel_depths",
    "interval_join",
    "sessionize",
    "transition_matrix",
    "lag_autocorr",
    "cohort_retention",
]


def cohort_retention(
    events: DataFrame,
    bin_seconds: int,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Cohort retention: users grouped by their first-activity bin
    (the cohort), then for each later bin offset the fraction of the
    cohort still active — the standard product-analytics retention
    triangle.

    Shape: one (key → first bin) aggregate, an equi-join back on the
    key (both sides partitioned by the key — one shuffle pair AQE can
    co-plan), then a distinct-count per (cohort, offset). The cohort
    size is the offset-0 row of the SAME aggregate, attached by a
    broadcast join on the cohort key (cohort count = time range /
    bin — tiny). Exact integer counts; retention is one double
    division, round 6. Output: (cohort_bin, offset, n_active,
    retention).
    """
    b = F.expr(f"unix_seconds(CAST({ts_col} AS TIMESTAMP)) DIV {bin_seconds}")
    ev = events.select(F.col(key_col).alias("__k"), b.alias("__bin"))
    first = ev.groupBy("__k").agg(F.min("__bin").alias("__cohort"))
    joined = ev.join(first, "__k")
    active = joined.groupBy(
        F.col("__cohort").alias("cohort_bin"),
        (F.col("__bin") - F.col("__cohort")).alias("offset"),
    ).agg(F.countDistinct("__k").alias("n_active"))
    size = (
        active.where(F.col("offset") == 0)
        .select("cohort_bin", F.col("n_active").alias("__size"))
    )
    return (
        active.join(F.broadcast(size), "cohort_bin")
        .select(
            "cohort_bin",
            "offset",
            "n_active",
            F.round(F.col("n_active").cast("double") / F.col("__size"), 6).alias(
                "retention"
            ),
        )
    )


def lag_autocorr(
    events: DataFrame,
    bin_seconds: int,
    lag: int = 1,
    ts_col: str = "ts",
) -> DataFrame:
    """Lag-k Pearson autocorrelation of the event-count time series
    (the burstiness/periodicity check a monitoring pipeline runs):
    counts per ``bin_seconds`` bucket — INCLUDING empty buckets, which
    an observed-bins-only series would silently skip over — paired
    with the counts ``lag`` buckets later.

    The dense time axis comes from exploding sequence(min_bin,
    max_bin) off a one-row bounds aggregate (bin count = time range /
    width, bounded by contract) — never a global Window. Zero-fill is
    a left join; the pairing is an equi-join on bin+lag. Pearson's r
    reduces to six exact integer sums and a fixed IEEE tail. Output:
    one row (n_pairs, r) round 6.
    """
    binned = events.select(
        F.expr(f"unix_seconds(CAST({ts_col} AS TIMESTAMP)) DIV {bin_seconds}").alias("bin")
    )
    counts = binned.groupBy("bin").agg(F.count("*").alias("c"))
    bounds = counts.agg(F.min("bin").alias("lo"), F.max("bin").alias("hi"))
    dense = bounds.select(F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("bin"))
    filled = dense.join(counts, "bin", "left").select(
        "bin", F.coalesce(F.col("c"), F.lit(0).cast("long")).alias("c")
    )
    a = filled.select(F.col("bin").alias("b1"), F.col("c").alias("x"))
    bb = filled.select((F.col("bin") - lag).alias("b1"), F.col("c").alias("y"))
    pairs = a.join(bb, "b1")
    s = pairs.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n = F.col("n")
    num = n.cast("double") * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")
    den = F.sqrt(n.cast("double") * F.col("sxx") - F.col("sx").cast("double") * F.col("sx")) * F.sqrt(
        n.cast("double") * F.col("syy") - F.col("sy").cast("double") * F.col("sy")
    )
    return s.select(
        n.alias("n_pairs"),
        F.round(F.when(den > 0.0, num / den), 6).alias("r"),
    )


def transition_matrix(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak: str = "event_id",
) -> DataFrame:
    """First-order Markov transition counts/probabilities between
    event types along each key's time-ordered stream (the behavioral
    "what happens after X" analytic).

    One (key)-partitioned window derives each event's successor — the
    same single shuffle a sessionize takes — then a hash aggregate
    counts (from, to) pairs; the row probability divides by the
    per-from total via a tiny second aggregate joined back (type
    cardinality is small — never a global window). Exact integer
    counts; prob is one double division, round 6. Output: (from_type,
    to_type, n, prob).
    """
    w = Window.partitionBy(key_col).orderBy(F.col(ts_col), F.col(tiebreak))
    nxt = events.withColumn("__next", F.lead(type_col).over(w)).where(
        F.col("__next").isNotNull()
    )
    c = nxt.groupBy(
        F.col(type_col).alias("from_type"), F.col("__next").alias("to_type")
    ).agg(F.count("*").alias("n"))
    tot = c.groupBy("from_type").agg(F.sum("n").alias("__tot"))
    return (
        c.join(F.broadcast(tot), "from_type")
        .select(
            "from_type",
            "to_type",
            "n",
            F.round(F.col("n").cast("double") / F.col("__tot"), 6).alias("prob"),
        )
    )


def funnel_depths(
    events: DataFrame,
    steps: tuple,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak: str | None = None,
) -> DataFrame:
    """Funnel analysis: per key, the furthest step of ``steps`` reached
    IN ORDER (ordered-subsequence match over the time-sorted event
    stream — the conversion-funnel primitive of event analytics),
    reported as (depth, n_keys) with depth 0..len(steps).

    Spark shape: ONE groupBy on the key collects the sorted event-type
    sequence (sort_array over (ts, tiebreak, type) structs — bounded by
    per-key event count, the same contract as track_lines), then the
    depth is a single ``aggregate`` fold: advance the counter iff the
    next event equals steps[depth]. A second tiny aggregate counts keys
    per depth. Exact integers end-to-end. For keys with unbounded event
    counts, pre-filter to the step types (only they move the fold) —
    but note that drops keys with NO step events from the groupBy, so
    union the distinct keys back (depth 0) to keep the histogram's
    denominator intact.

    Oracle note: greedy earliest-match subsequence == chained per-step
    min-timestamps, which is what the DuckDB oracle uses — NOT
    list_reduce: DuckDB 1.0 mis-evaluates acc-conditional lambdas on
    ~1% of grouped rows (see ROUND5.md).
    """
    k = len(steps)
    step_arr = F.array(*[F.lit(s) for s in steps])
    order_cols = [F.col(ts_col)] + ([F.col(tiebreak)] if tiebreak else []) + [
        F.col(type_col)
    ]
    seq = events.groupBy(key_col).agg(
        F.sort_array(
            F.collect_list(F.struct(*order_cols, F.col(type_col).alias("__et")))
        ).alias("__seq")
    )
    depth = F.aggregate(
        F.col("__seq"),
        F.lit(0),
        lambda acc, x: F.when(
            (acc < k) & (x["__et"] == F.element_at(step_arr, acc + 1)), acc + 1
        ).otherwise(acc),
    )
    return (
        seq.select(depth.alias("depth"))
        .groupBy("depth")
        .agg(F.count("*").alias("n_keys"))
    )


def date_offset(
    df: DataFrame,
    ts_col: str,
    offset: str,
    out_col: str | None = None,
) -> DataFrame:
    """Shift a timestamp attribute by a calendar interval (reference:
    geomesa-process/geomesa-process-vector/.../process/transform/
    DateOffsetProcess.scala — offsets a date attribute of every feature
    in a collection). ``offset`` is an ANSI interval string, e.g.
    ``'1 HOUR'``, ``'-30 MINUTE'``, ``'7 DAY'``. Pure codegen column
    arithmetic — narrow, no shuffle; Catalyst folds the interval
    literal so the scan predicate pushdown above/below is unaffected.
    """
    shifted = F.expr(f"`{ts_col}` + INTERVAL {offset}")
    return df.withColumn(out_col or ts_col, shifted)


def asof_attach(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_time: str = "ts",
    right_time: str = "ts",
    value_cols: tuple = ("value",),
    strict: bool = False,
    right_tiebreak: str | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row: the most recent right row with equal ``keys``
    and right_time <= left_time (``strict=True`` → <). Attaches each of
    ``value_cols`` as ``<col><suffix>`` (NULL when no right row
    qualifies). Ties among right rows at one timestamp break on
    ``right_tiebreak`` (take the greatest), making the result
    deterministic."""
    tag_left = 1 if not strict else 0
    tag_right = 1 - tag_left
    carry = [F.col(c).alias(f"__v_{c}") for c in value_cols]
    tb = [F.col(right_tiebreak).alias("__ord")] if right_tiebreak else []
    rpart = right.select(
        *[F.col(k) for k in keys],
        F.col(right_time).alias("__t"),
        *carry,
        *tb,
    ).withColumn("__tag", F.lit(tag_right))
    lpart = left.withColumn("__t", F.col(left_time)).withColumn(
        "__tag", F.lit(tag_left)
    )
    u = lpart.unionByName(rpart, allowMissingColumns=True)
    order = [F.col("__t").asc(), F.col("__tag").asc()]
    if right_tiebreak:
        order.append(F.col("__ord").asc_nulls_first())
    w = Window.partitionBy(*keys).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    out = u
    for c in value_cols:
        out = out.withColumn(f"{c}{suffix}", F.last(f"__v_{c}", ignorenulls=True).over(w))
    drop = ["__t", "__tag"] + [f"__v_{c}" for c in value_cols] + (
        ["__ord"] if right_tiebreak else []
    )
    return out.where(F.col("__tag") == tag_left).drop(*drop)


def interval_join(
    events: DataFrame,
    intervals: DataFrame,
    time_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bin_s: int = 3600,
    broadcast: bool | None = None,
) -> DataFrame:
    """Containment interval join (events whose time falls inside an
    interval) WITHOUT a nested-loop range join: intervals explode their
    time-bin cover, equi-join on the event's single bin, exact BETWEEN
    refine — the temporal analogue of the cell-cover spatial join. An
    event has ONE bin and an interval's cover bins are distinct, so no
    pair duplicates. ``broadcast=None`` → stats decider on the exploded
    interval side."""
    if broadcast is None:
        from geomesa_spark.plans.decider import auto_broadcast

        broadcast = auto_broadcast(intervals, 4.0)
    ev = events.withColumn(
        "__bin", F.floor(F.unix_timestamp(F.col(time_col)) / bin_s).cast("long")
    )
    cover = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(start_col)) / bin_s).cast("long"),
                F.floor(F.unix_timestamp(F.col(end_col)) / bin_s).cast("long"),
            )
        ),
    )
    if broadcast:
        cover = F.broadcast(cover)
    j = ev.join(cover, on="__bin", how="inner").drop("__bin")
    return j.where(
        (F.col(time_col) >= F.col(start_col)) & (F.col(time_col) <= F.col(end_col))
    )


def sessionize(
    df: DataFrame,
    keys: list[str],
    time_col: str = "ts",
    gap_s: int = 1800,
    tiebreak: str | None = None,
    out: str = "session_idx",
) -> DataFrame:
    """Gap-based sessionization: events of one key belong to the same
    session while consecutive gaps stay ≤ ``gap_s``. One window pass:
    a new-session flag (gap > gap_s, first row inclusive) cumulative-
    summed into a per-key 1-based session index — the batch form of the
    streaming session window, mirrorable in ANSI SQL."""
    order = [F.col(time_col).asc()] + ([F.col(tiebreak).asc()] if tiebreak else [])
    w = Window.partitionBy(*keys).orderBy(*order)
    secs = F.unix_timestamp(F.col(time_col))
    new_s = F.when(
        (secs - F.lag(secs).over(w)).isNull() | ((secs - F.lag(secs).over(w)) > gap_s),
        F.lit(1),
    ).otherwise(F.lit(0))
    return df.withColumn(
        out,
        F.sum(new_s).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
