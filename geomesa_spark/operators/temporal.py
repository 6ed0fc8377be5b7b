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
    "cusum_changepoint",
    "ewma_bins",
    "allen_relations",
    "debounce",
    "trend_bins",
    "inter_arrival",
    "sliding_window_counts",
    "overlap_duration",
    "union_duration",
    "runs_test",
    "peak_bins",
    "time_to_event",
    "seasonal_residuals",
    "acf_profile",
]

# Allen's 13 interval relations, classified from exact integer
# comparisons of (ls, le) vs (rs, re) — the complete algebra behind the
# OGC/ECQL temporal operators (BEFORE/AFTER/DURING/TEQUALS plus the
# MEETS/OVERLAPS family GeoTools' filter spec names).
_ALLEN_CASES = [
    ("equals", "ls = rs AND le = re"),
    ("before", "le < rs"),
    ("after", "re < ls"),
    ("meets", "le = rs"),
    ("met_by", "re = ls"),
    ("starts", "ls = rs AND le < re"),
    ("started_by", "ls = rs AND re < le"),
    ("finishes", "le = re AND rs < ls"),
    ("finished_by", "le = re AND ls < rs"),
    ("during", "rs < ls AND le < re"),
    ("contains", "ls < rs AND re < le"),
    ("overlaps", "ls < rs AND rs < le AND le < re"),
    ("overlapped_by", "rs < ls AND ls < re AND re < le"),
]


def _dense_counts(events: DataFrame, bin_seconds: int, ts_col: str) -> DataFrame:
    """The shared dense, zero-filled bin axis behind lag_autocorr /
    cusum_changepoint / ewma_bins / trend_bins: counts per
    ``bin_seconds`` bucket INCLUDING empty buckets — a bounds
    aggregate, a sequence explode (bin count = time range / width,
    bounded by contract — never a global Window), and a zero-fill left
    join. Output: (lo, bin, c) with c a non-null long."""
    binned = events.select(
        F.expr(f"unix_seconds(CAST({ts_col} AS TIMESTAMP)) DIV {bin_seconds}").alias("bin")
    )
    counts = binned.groupBy("bin").agg(F.count("*").alias("c"))
    bounds = counts.agg(F.min("bin").alias("lo"), F.max("bin").alias("hi"))
    dense = bounds.select(
        "lo", F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("bin")
    )
    return dense.join(counts, "bin", "left").select(
        "lo", "bin", F.coalesce(F.col("c"), F.lit(0).cast("long")).alias("c")
    )



def _pearson_from_sums(s: DataFrame, keep_cols: list) -> DataFrame:
    """Pearson r from the six-sum frame (n, sx, sy, sxy, sxx, syy) —
    the bit-exactness-critical IEEE tail shared by lag_autocorr and
    acf_profile so the op sequence can never drift between them."""
    n = F.col("n")
    num = n.cast("double") * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")
    den = F.sqrt(
        n.cast("double") * F.col("sxx") - F.col("sx").cast("double") * F.col("sx")
    ) * F.sqrt(
        n.cast("double") * F.col("syy") - F.col("sy").cast("double") * F.col("sy")
    )
    return s.select(
        *keep_cols,
        n.alias("n_pairs"),
        F.round(F.when(den > 0.0, num / den), 6).alias("r"),
    )


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
    filled = _dense_counts(events, bin_seconds, ts_col).select("bin", "c")
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
    return _pearson_from_sums(s, [])


def cusum_changepoint(
    events: DataFrame,
    bin_seconds: int,
    ts_col: str = "ts",
) -> DataFrame:
    """Single-changepoint detection (CUSUM) over the binned
    event-count series — "where did the rate shift?", the monitoring
    companion to ``lag_autocorr``: maximize |S_i − i·T/n| over split
    points i, where S_i is the count through bin i, T the total and n
    the (dense, zero-filled) bin count.

    All comparisons run on the EXACT integer |n·S_i − i·T| (the
    statistic scaled by n), so the argmax — earliest bin on ties — is
    float-free; only the three reported ratios are IEEE, round 6.
    Shape: the lag_autocorr dense axis (bounds aggregate → sequence
    explode → zero-fill left join; bin count = time range / width,
    bounded by contract), then ONE sorted in-array fold on a 1-row
    frame — never a global Window, no self-join. Integer-safe while
    n·T < 2^63. Output: one row (n_bins, total, cp_bin, cp_index,
    stat, mean_before, mean_after); empty when n_bins < 2.
    """
    filled = _dense_counts(events, bin_seconds, ts_col)
    row = filled.groupBy("lo").agg(
        F.sort_array(F.collect_list(F.struct("bin", "c"))).alias("arr")
    )
    # acc: i = bins consumed, s = running sum, bv/bi/bs = best |n·S−i·T|
    # and its split index / prefix sum (strict > keeps the earliest).
    fold = F.expr(
        """
        aggregate(
          arr,
          named_struct('i', 0L, 's', 0L, 'bv', -1L, 'bi', 0L, 'bs', 0L),
          (a, x) -> named_struct(
            'i', a.i + 1L,
            's', a.s + x.c,
            'bv', IF(a.i + 1L < size(arr) AND
                     abs(size(arr) * (a.s + x.c) - (a.i + 1L) * t) > a.bv,
                     abs(size(arr) * (a.s + x.c) - (a.i + 1L) * t), a.bv),
            'bi', IF(a.i + 1L < size(arr) AND
                     abs(size(arr) * (a.s + x.c) - (a.i + 1L) * t) > a.bv,
                     a.i + 1L, a.bi),
            'bs', IF(a.i + 1L < size(arr) AND
                     abs(size(arr) * (a.s + x.c) - (a.i + 1L) * t) > a.bv,
                     a.s + x.c, a.bs)))
        """
    )
    acc = (
        row.select(
            "lo",
            "arr",
            F.size("arr").cast("long").alias("n"),
            F.aggregate("arr", F.lit(0).cast("long"), lambda a, x: a + x["c"]).alias("t"),
        )
        .select("lo", "n", "t", fold.alias("f"))
        .where(F.col("f.bi") > 0)
    )
    n, t = F.col("n"), F.col("t")
    bi, bs = F.col("f.bi"), F.col("f.bs")
    return acc.select(
        n.alias("n_bins"),
        t.alias("total"),
        (F.col("lo") + bi - 1).alias("cp_bin"),
        bi.alias("cp_index"),
        F.round(F.col("f.bv").cast("double") / n, 6).alias("stat"),
        F.round(bs.cast("double") / bi, 6).alias("mean_before"),
        F.round((t - bs).cast("double") / (n - bi), 6).alias("mean_after"),
    )


def ewma_bins(
    events: DataFrame,
    bin_seconds: int,
    alpha: float = 0.25,
    ts_col: str = "ts",
) -> DataFrame:
    """Exponentially-weighted moving average of the (dense,
    zero-filled) event-count series — the smoothed baseline a
    monitoring pipeline charts next to ``cusum_changepoint``'s shift
    detector: s₁ = x₁, sᵢ = α·xᵢ + (1−α)·sᵢ₋₁.

    The recursion is ONE sorted in-array fold on a 1-row frame (the
    lag_autocorr dense axis; bin count bounded by contract), seeded
    from the first element so the step lambda carries no
    accumulator-conditional branch — the DuckDB oracle replays the
    identical α·x + (1−α)·s double sequence via a recursive CTE,
    ulp-identical. Any float ``alpha`` in (0, 1] parses to the same
    double in both engines (repr round-trips; both parsers are
    correctly rounded) and 1−α is the same single IEEE subtraction on
    each side, so the oracle only has to quote the SAME literal.
    Output: (bin, c, ewma round 6) per dense bin.
    """
    if not (0.0 < alpha <= 1.0):
        raise ValueError("alpha must be a float in (0, 1]")
    a_lit = repr(float(alpha))
    filled = _dense_counts(events, bin_seconds, ts_col).select("bin", "c")
    row = filled.agg(
        F.sort_array(F.collect_list(F.struct("bin", "c"))).alias("arr")
    ).where(F.size("arr") > 0)
    step = f"{a_lit}D * x.c + (1.0D - {a_lit}D) * a.s"
    fold = F.expr(
        f"""
        aggregate(
          slice(arr, 2, size(arr) - 1),
          named_struct(
            's', CAST(element_at(arr, 1).c AS DOUBLE),
            'out', array(named_struct(
              'bin', element_at(arr, 1).bin,
              'c', element_at(arr, 1).c,
              's', CAST(element_at(arr, 1).c AS DOUBLE)))),
          (a, x) -> named_struct(
            's', {step},
            'out', concat(a.out, array(named_struct(
              'bin', x.bin, 'c', x.c, 's', {step})))),
          acc -> acc.out)
        """
    )
    return row.select(F.explode(fold).alias("e")).select(
        F.col("e.bin").alias("bin"),
        F.col("e.c").alias("c"),
        F.round(F.col("e.s"), 6).alias("ewma"),
    )


def allen_relations(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_start: str = "start",
    left_end: str = "end",
    right_start: str = "start",
    right_end: str = "end",
) -> DataFrame:
    """Classify each (left, right) interval pair sharing the ``on`` key
    into its Allen relation — the full 13-relation algebra generalizing
    the reference's ECQL temporal predicates (DURING / BEFORE / AFTER /
    TEQUALS and the GeoTools Meets/TOverlaps family) from
    interval-vs-literal filters to an interval×interval join.

    One equi-join on the key (the pair fence — never a time-range
    nested loop), then a first-match CASE over exact epoch-micros
    integer comparisons: for non-degenerate intervals (start < end) the
    13 relations are mutually exclusive and exhaustive; zero-length
    intervals resolve deterministically by the fixed match order. Total
    and float-free. Output: key + (ls, le, rs, re) micros + relation.
    """
    l = left.select(
        F.col(on).alias("__k"),
        F.expr(f"unix_micros(CAST({left_start} AS TIMESTAMP))").alias("ls"),
        F.expr(f"unix_micros(CAST({left_end} AS TIMESTAMP))").alias("le"),
    )
    r = right.select(
        F.col(on).alias("__k"),
        F.expr(f"unix_micros(CAST({right_start} AS TIMESTAMP))").alias("rs"),
        F.expr(f"unix_micros(CAST({right_end} AS TIMESTAMP))").alias("re"),
    )
    case = "CASE " + " ".join(
        f"WHEN {cond} THEN '{name}'" for name, cond in _ALLEN_CASES
    ) + " END"
    return (
        l.join(r, "__k")
        .select(
            F.col("__k").alias(on), "ls", "le", "rs", "re",
            F.expr(case).alias("relation"),
        )
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


def debounce(
    events: DataFrame,
    cooldown_seconds: int,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Greedy per-key event debouncing (rate limiting / alert
    throttling): keep an event iff it is at least ``cooldown_seconds``
    after the PREVIOUSLY KEPT event — always the key's first event,
    then the earliest event past each cooldown. NOT expressible as a
    lag() window: whether a row survives depends on which earlier rows
    survived, so the chain is a per-key fold.

    Spark shape: ONE groupBy collects the sorted epoch-micros array
    (bounded by per-key event count — the funnel_depths contract),
    seeded-fold keeps the chain (no accumulator-conditional branch on
    an empty seed), explode returns the kept rows. Exact integer
    comparisons end-to-end. The DuckDB oracle replays the chain as a
    recursive CTE (min-ts chaining), NOT list_reduce — the same DuckDB
    1.0 defect funnel_depths documents. Output: (key, ts_us).
    """
    c_us = int(cooldown_seconds) * 1_000_000
    seq = events.select(
        F.col(key_col).alias("__k"),
        F.expr(f"unix_micros(CAST({ts_col} AS TIMESTAMP))").alias("__t"),
    ).groupBy("__k").agg(F.sort_array(F.collect_list("__t")).alias("arr"))
    kept = F.expr(
        f"""
        aggregate(
          slice(arr, 2, size(arr) - 1),
          array(element_at(arr, 1)),
          (a, x) -> IF(x >= element_at(a, -1) + {c_us}L, concat(a, array(x)), a))
        """
    )
    return seq.select(
        F.col("__k").alias(key_col), F.explode(kept).alias("ts_us")
    )


def trend_bins(
    events: DataFrame,
    bin_seconds: int,
    ts_col: str = "ts",
) -> DataFrame:
    """OLS linear trend of the dense, zero-filled event-count series —
    the "is traffic growing?" summary next to cusum_changepoint's
    shift detector and emerging_hotspots' per-cell Mann-Kendall:
    y = count per bin regressed on x = bin index (0-based).

    The lag_autocorr dense axis, then ONE aggregate of five exact
    integer sums (x is the renumbered 0..n−1 index so every sum is
    integer); slope/intercept/r² are a fixed IEEE tail — r² as the
    exact-integer ratio (nΣxy−ΣxΣy)²/((nΣxx−(Σx)²)(nΣyy−(Σy)²))
    evaluated in doubles. Output: one row (n_bins, slope, intercept,
    r2) round 6; slope NULL when n_bins < 2.
    """
    filled = _dense_counts(events, bin_seconds, ts_col).select(
        (F.col("bin") - F.col("lo")).alias("x"), F.col("c").alias("y")
    )
    s = filled.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n = F.col("n").cast("double")
    num = n * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")
    dx = n * F.col("sxx") - F.col("sx").cast("double") * F.col("sx")
    dy = n * F.col("syy") - F.col("sy").cast("double") * F.col("sy")
    slope = num / dx
    intercept = (F.col("sy").cast("double") - slope * F.col("sx")) / n
    return s.select(
        F.col("n").alias("n_bins"),
        F.round(F.when(F.col("n") > 1, slope), 6).alias("slope"),
        F.round(F.when(F.col("n") > 1, intercept), 6).alias("intercept"),
        F.round(F.when((F.col("n") > 1) & (dy > 0.0), num * num / (dx * dy)), 6).alias("r2"),
    )


def inter_arrival(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-key inter-arrival gap statistics (the burstiness/SLA metric
    of an event stream): consecutive time-ordered gaps in micros via
    one lag() window on the key partition, then one hash aggregate —
    (key, n_gaps, min_gap_us, max_gap_us, mean_gap_us). Keys with a
    single event drop out (no gaps). Exact integers except the one
    mean division, which is reported as WHOLE micros: at ~1e10-micros
    magnitude a double's ulp (~8e-6) exceeds 1e-6, so a round-6 value
    is engine-dependent by construction — integer micros granularity
    sits far above the ulp and hashes identically. Equal-micros ties
    leave the gap MULTISET (and so every aggregate) unchanged, so the
    result is deterministic."""
    t = F.expr(f"unix_micros(CAST({ts_col} AS TIMESTAMP))")
    g = events.select(F.col(key_col).alias("key"), t.alias("__t")).withColumn(
        "__gap", F.col("__t") - F.lag("__t").over(Window.partitionBy("key").orderBy(F.col("__t").asc()))
    ).where(F.col("__gap").isNotNull())
    return g.groupBy("key").agg(
        F.count("*").alias("n_gaps"),
        F.min("__gap").alias("min_gap_us"),
        F.max("__gap").alias("max_gap_us"),
        F.round(F.sum("__gap").cast("double") / F.count("*"), 0)
        .cast("long")
        .alias("mean_gap_us"),
    )


def sliding_window_counts(
    events: DataFrame,
    size_seconds: int,
    slide_seconds: int,
    ts_col: str = "ts",
) -> DataFrame:
    """Sliding (hopping) window counts — the batch shape of the
    Structured Streaming `window(ts, size, slide)` aggregation the
    live layer runs: each event lands in size/slide overlapping
    windows; one groupBy on Spark's BUILT-IN window() expression (an
    internal explode + hash aggregate, codegen end-to-end).

    The oracle derives the same window set from first principles —
    epoch-aligned starts k·slide in (t−size, t] — so this query also
    PINS Spark's window-assignment semantics (half-open [start, end),
    epoch alignment) against an exact integer reimplementation.
    Output: (ws_us, we_us, n) in epoch micros.
    """
    if size_seconds % slide_seconds != 0:
        # Spark supports non-divisor slides, but pin the common case
        # contract the streaming layer uses (size = k·slide)
        raise ValueError("size_seconds must be a multiple of slide_seconds")
    w = F.window(
        F.col(ts_col).cast("timestamp"),
        f"{size_seconds} seconds",
        f"{slide_seconds} seconds",
    )
    return (
        events.groupBy(w.alias("w"))
        .agg(F.count("*").alias("n"))
        .select(
            F.expr("unix_micros(w.start)").alias("ws_us"),
            F.expr("unix_micros(w.end)").alias("we_us"),
            "n",
        )
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


def overlap_duration(
    a: DataFrame,
    b: DataFrame,
    on: str,
    start_col: str = "start",
    end_col: str = "end",
) -> DataFrame:
    """Total co-presence time per key: micros during which at least
    one A interval AND at least one B interval are simultaneously
    active — the quantitative companion to allen_relations (how MUCH
    do the schedules overlap, summed over every interval of each
    side).

    Classic sweep line as ONE keyed window: each interval contributes
    a +1/−1 edge, two running sums track the active counts, and each
    inter-edge segment adds (next_t − t) where both counts are
    positive. Tie order at equal timestamps is irrelevant — zero-width
    segments contribute 0 and the post-group state is a plain sum —
    so the result is deterministic without a tie-break column. Exact
    integer micros end-to-end. Output: (key, overlap_us).
    """

    def _edges(df, sc, ec, da, db):
        t_s = F.expr(f"unix_micros(CAST({sc} AS TIMESTAMP))")
        t_e = F.expr(f"unix_micros(CAST({ec} AS TIMESTAMP))")
        return df.select(
            F.col(on).alias("__k"),
            F.explode(
                F.array(
                    F.struct(t_s.alias("t"), F.lit(da).alias("da"), F.lit(db).alias("db")),
                    F.struct(t_e.alias("t"), F.lit(-da).alias("da"), F.lit(-db).alias("db")),
                )
            ).alias("e"),
        ).select("__k", "e.t", "e.da", "e.db")
    edges = _edges(a, start_col, end_col, 1, 0).unionByName(
        _edges(b, start_col, end_col, 0, 1)
    )
    w = Window.partitionBy("__k").orderBy("t", "da", "db").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wl = Window.partitionBy("__k").orderBy("t", "da", "db")
    seg = edges.select(
        "__k",
        "t",
        F.sum("da").over(w).alias("ca"),
        F.sum("db").over(w).alias("cb"),
        F.lead("t").over(wl).alias("nt"),
    )
    return seg.groupBy(F.col("__k").alias(on)).agg(
        F.coalesce(
            F.sum(
                F.when(
                    (F.col("ca") > 0) & (F.col("cb") > 0) & F.col("nt").isNotNull(),
                    F.col("nt") - F.col("t"),
                )
            ),
            F.lit(0),
        ).cast("long").alias("overlap_us")
    )


def union_duration(
    df: DataFrame,
    on: str,
    start_col: str = "start",
    end_col: str = "end",
) -> DataFrame:
    """Total covered time per key — the measure of the UNION of the
    key's (possibly overlapping) intervals, i.e. "how long was this
    user/device actually active": overlap-counted time is counted
    once. The single-set sibling of overlap_duration, same sweep: ±1
    edges, one keyed running sum, add each inter-edge segment while
    the active count is positive. Exact integer micros. Output:
    (key, n_intervals, active_us).
    """
    t_s = F.expr(f"unix_micros(CAST({start_col} AS TIMESTAMP))")
    t_e = F.expr(f"unix_micros(CAST({end_col} AS TIMESTAMP))")
    edges = df.select(
        F.col(on).alias("__k"),
        F.explode(
            F.array(
                F.struct(t_s.alias("t"), F.lit(1).alias("d")),
                F.struct(t_e.alias("t"), F.lit(-1).alias("d")),
            )
        ).alias("e"),
    ).select("__k", "e.t", "e.d")
    w = Window.partitionBy("__k").orderBy("t", "d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wl = Window.partitionBy("__k").orderBy("t", "d")
    seg = edges.select(
        "__k", "t", "d",
        F.sum("d").over(w).alias("ca"),
        F.lead("t").over(wl).alias("nt"),
    )
    return seg.groupBy(F.col("__k").alias(on)).agg(
        (F.sum(F.when(F.col("d") == 1, 1).otherwise(0))).cast("long").alias("n_intervals"),
        F.coalesce(
            F.sum(
                F.when(
                    (F.col("ca") > 0) & F.col("nt").isNotNull(), F.col("nt") - F.col("t")
                )
            ),
            F.lit(0),
        ).cast("long").alias("active_us"),
    )


def runs_test(
    events: DataFrame,
    bin_seconds: int,
    ts_col: str = "ts",
) -> DataFrame:
    """Wald-Wolfowitz runs test on the dense binned count series — "is
    the traffic pattern random, or does it clump?" next to
    lag_autocorr's linear-dependence check. Each bin is classified
    above/below the MEAN via the exact integer comparison c·n > T (no
    quantile interpolation), runs are counted from the bin/bin+1
    pairing join, and z = (R − μ)/σ with μ = 1 + 2·n1·n2/n,
    σ² = 2·n1·n2·(2·n1·n2 − n) / (n²·(n−1)) — all inputs exact
    integers, sqrt-only tail, round 6.

    Shape: the shared dense axis, a broadcast 1-row totals join, one
    pairing equi-join, one reduce. Output: one row (n_bins, n_above,
    n_below, runs, z); z NULL when either class is empty or n < 2.
    """
    filled = _dense_counts(events, bin_seconds, ts_col).select("bin", "c")
    tot = filled.agg(
        F.count("*").alias("n"), F.sum("c").alias("t")
    )
    signed = filled.crossJoin(F.broadcast(tot)).select(
        "bin", (F.col("c") * F.col("n") > F.col("t")).cast("int").alias("s")
    )
    a = signed.select(F.col("bin").alias("b"), F.col("s").alias("s1"))
    b = signed.select((F.col("bin") - 1).alias("b"), F.col("s").alias("s2"))
    # coalesce: a single-bin series has an empty pairing join, and
    # sum() over zero rows is NULL — the run count of a 1-element
    # series is 1, not NULL
    trans = a.join(b, "b").agg(
        F.coalesce(
            F.sum(F.when(F.col("s1") != F.col("s2"), 1).otherwise(0)), F.lit(0)
        ).alias("chg")
    )
    agg = signed.agg(
        F.count("*").alias("n"),
        F.sum("s").alias("n1"),
        F.sum(F.lit(1) - F.col("s")).alias("n2"),
    ).crossJoin(F.broadcast(trans))
    n = F.col("n").cast("double")
    n1, n2 = F.col("n1").cast("double"), F.col("n2").cast("double")
    runs = (F.col("chg") + 1).cast("long")
    mu = F.lit(1.0) + 2.0 * n1 * n2 / n
    var = (2.0 * n1 * n2 * (2.0 * n1 * n2 - n)) / (n * n * (n - F.lit(1.0)))
    z = (runs.cast("double") - mu) / F.sqrt(var)
    return agg.select(
        F.col("n").alias("n_bins"),
        F.col("n1").cast("long").alias("n_above"),
        F.col("n2").cast("long").alias("n_below"),
        runs.alias("runs"),
        F.round(
            F.when((F.col("n1") > 0) & (F.col("n2") > 0) & (F.col("n") > 1), z), 6
        ).alias("z"),
    )


def peak_bins(
    events: DataFrame,
    bin_seconds: int,
    min_count: int = 1,
    ts_col: str = "ts",
) -> DataFrame:
    """Strict local maxima of the dense binned count series — the 1-D
    analogue of tiles.hotspots (traffic spikes): bins with count >=
    ``min_count`` that strictly exceed BOTH neighbors (missing
    neighbors — the series ends — count as 0, like the spatial
    hotspots' empty cells).

    Two shifted self-equi-joins on the dense axis (left joins so edge
    bins keep zero neighbors), exact integers. Output: (bin, c,
    prev_c, next_c).
    """
    filled = _dense_counts(events, bin_seconds, ts_col).select("bin", "c")
    prev = filled.select((F.col("bin") + 1).alias("bin"), F.col("c").alias("prev_c"))
    nxt = filled.select((F.col("bin") - 1).alias("bin"), F.col("c").alias("next_c"))
    j = (
        filled.join(prev, "bin", "left")
        .join(nxt, "bin", "left")
        .select(
            "bin",
            "c",
            F.coalesce("prev_c", F.lit(0).cast("long")).alias("prev_c"),
            F.coalesce("next_c", F.lit(0).cast("long")).alias("next_c"),
        )
    )
    return j.where(
        (F.col("c") >= min_count)
        & (F.col("c") > F.col("prev_c"))
        & (F.col("c") > F.col("next_c"))
    )


def time_to_event(
    events: DataFrame,
    from_type: str,
    to_type: str,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Conversion latency per key: micros from the FIRST ``from_type``
    event to the FIRST ``to_type`` event at or after it — the
    time-to-convert / time-to-resolution metric (view→purchase,
    error→recovery).

    ONE conditional hash aggregate: first_from = min ts over from-type
    rows; the converting event is min ts over to-type rows ≥
    first_from, folded into the SAME aggregate as min(CASE …) over a
    per-key self-contained expression — no join, no window. Keys with
    a from-event and no later to-event report NULL latency (observed
    censoring); keys with no from-event drop out. Exact integer
    micros. Output: (key, first_from_us, first_to_us, latency_us).
    """
    t = F.expr(f"unix_micros(CAST({ts_col} AS TIMESTAMP))")
    base = events.select(
        F.col(key_col).alias("key"), F.col(type_col).alias("et"), t.alias("t")
    )
    ff = base.where(F.col("et") == from_type).groupBy("key").agg(
        F.min("t").alias("first_from_us")
    )
    to = base.where(F.col("et") == to_type).select("key", F.col("t").alias("__tt"))
    # conditional min INSIDE the aggregate (min ignores nulls): keys
    # with no to-event — or only to-events BEFORE the first from-event
    # — keep their row with NULL latency instead of vanishing
    out = ff.join(to, "key", "left").groupBy("key", "first_from_us").agg(
        F.min(
            F.when(F.col("__tt") >= F.col("first_from_us"), F.col("__tt"))
        ).alias("first_to_us")
    )
    return out.select(
        "key",
        "first_from_us",
        "first_to_us",
        (F.col("first_to_us") - F.col("first_from_us")).alias("latency_us"),
    )


def seasonal_residuals(
    events: DataFrame,
    bin_seconds: int,
    period_bins: int,
    ts_col: str = "ts",
) -> DataFrame:
    """Seasonality-adjusted counts: each dense bin's deviation from
    its PHASE mean (phase = bin mod period — hour-of-day for hourly
    bins with period 24) — the de-seasonalized residual an anomaly
    rule should threshold instead of the raw count.

    The shared dense axis, one phase aggregate (period_bins rows,
    broadcast back), residual = c − mean. Phase means are one double
    division of exact integers; both mean and residual round 6.
    Output: (bin, phase, c, phase_mean, resid).
    """
    filled = _dense_counts(events, bin_seconds, ts_col).select("bin", "c")
    ph = filled.withColumn("phase", F.pmod(F.col("bin"), F.lit(period_bins)))
    means = ph.groupBy("phase").agg(
        (F.sum("c").cast("double") / F.count("*").cast("double")).alias("__m")
    )
    j = ph.join(F.broadcast(means), "phase")
    return j.select(
        "bin",
        "phase",
        "c",
        F.round(F.col("__m"), 6).alias("phase_mean"),
        F.round(F.col("c").cast("double") - F.col("__m"), 6).alias("resid"),
    )


def acf_profile(
    events: DataFrame,
    bin_seconds: int,
    max_lag: int,
    ts_col: str = "ts",
) -> DataFrame:
    """The full autocorrelation profile r(1..max_lag) of the dense
    binned count series in ONE pass — lag_autocorr generalized: the
    ACF row (is there a daily/weekly cycle? at which lag does memory
    die off?) instead of a single coefficient.

    Raises ValueError for max_lag < 1 (Spark's sequence(1, 0) would
    DESCEND and emit a bogus lag-0 row where the oracle's
    generate_series is empty).

    The x side explodes the (tiny) lag list per bin — a max_lag×
    expansion that map-side partials collapse into max_lag aggregate
    rows — equi-joined against the series on the shifted bin; per-lag
    Pearson r from the same six exact integer sums as lag_autocorr.
    Output: (lag, n_pairs, r) round 6, one row per lag.
    """
    if int(max_lag) < 1:
        raise ValueError("max_lag must be >= 1")
    filled = _dense_counts(events, bin_seconds, ts_col).select("bin", "c")
    x = filled.select(
        "bin",
        F.col("c").alias("x"),
        F.explode(F.sequence(F.lit(1), F.lit(int(max_lag)))).alias("lag"),
    ).select((F.col("bin") + F.col("lag")).alias("b2"), "lag", "x")
    y = filled.select(F.col("bin").alias("b2"), F.col("c").alias("y"))
    pairs = x.join(y, "b2")
    s = pairs.groupBy("lag").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    return _pearson_from_sums(s, ["lag"])
