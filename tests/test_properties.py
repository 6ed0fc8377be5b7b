"""Hypothesis property tests for the curve kernels and the ECQL front
door — randomized invariants on top of the existing golden/parity
suites (the discipline that caught the Greiner–Hormann orientation bug
in round 2, now mechanized).

Curve properties are pure NumPy (no Spark per example — hundreds of
examples run in milliseconds); the ECQL property executes bounded
examples against one cached DataFrame.
"""

from __future__ import annotations

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from geomesa_spark.curves.xz import XZ2SFC
from geomesa_spark.curves.zorder import Z2SFC, Z3SFC

lons = st.floats(min_value=-180.0, max_value=180.0, allow_nan=False)
lats = st.floats(min_value=-90.0, max_value=90.0, allow_nan=False)


@st.composite
def bboxes(draw, min_span=1e-6):
    x0 = draw(st.floats(min_value=-180.0, max_value=179.0))
    y0 = draw(st.floats(min_value=-90.0, max_value=89.0))
    w = draw(st.floats(min_value=min_span, max_value=180.0 - max(x0, 0)))
    h = draw(st.floats(min_value=min_span, max_value=90.0 - max(y0, 0)))
    return (x0, y0, min(x0 + w, 180.0), min(y0 + h, 90.0))


class TestZ2Properties:
    @given(lons, lats)
    @settings(max_examples=300, deadline=None)
    def test_round_trip_within_half_cell(self, lon, lat):
        sfc = Z2SFC()
        z = sfc.index(lon, lat)
        lon2, lat2 = sfc.invert(z)
        cell_w = 360.0 / (1 << 31)
        cell_h = 180.0 / (1 << 31)
        assert abs(float(lon2) - min(max(lon, -180.0), 180.0)) <= cell_w
        assert abs(float(lat2) - min(max(lat, -90.0), 90.0)) <= cell_h

    @given(bboxes(), st.lists(st.tuples(st.floats(0, 1), st.floats(0, 1)), min_size=1, max_size=8),
           st.sampled_from([4, 16, 64, 1000]))
    @settings(max_examples=200, deadline=None)
    def test_ranges_cover_every_inside_point(self, bbox, uv, max_ranges):
        """Soundness under ANY max_ranges coarsening: a point inside the
        bbox always lands inside some returned z-range (coarsening may
        over-cover, never under-cover)."""
        sfc = Z2SFC()
        x0, y0, x1, y1 = bbox
        rngs = sfc.ranges([bbox], max_ranges=max_ranges)
        for u, v in uv:
            lon = x0 + u * (x1 - x0)
            lat = y0 + v * (y1 - y0)
            z = int(sfc.index(lon, lat))
            assert any(lo <= z <= hi for lo, hi in rngs), (lon, lat, max_ranges)

    @given(bboxes())
    @settings(max_examples=100, deadline=None)
    def test_coarsening_only_grows_cover(self, bbox):
        """Fewer allowed ranges ⇒ covered z-length only grows (the
        maxRanges guard trades scan width for planning cost, never
        correctness)."""
        sfc = Z2SFC()
        size = lambda rs: sum(hi - lo + 1 for lo, hi in rs)  # noqa: E731
        fine = size(sfc.ranges([bbox], max_ranges=1000))
        coarse = size(sfc.ranges([bbox], max_ranges=4))
        assert coarse >= fine


class TestZ3Properties:
    @given(lons, lats, st.floats(min_value=0, max_value=Z3SFC.WEEK_MILLIS))
    @settings(max_examples=200, deadline=None)
    def test_round_trip(self, lon, lat, t):
        sfc = Z3SFC()
        z = sfc.index(lon, lat, t)
        lon2, lat2, t2 = sfc.invert(z)
        assert abs(float(lon2) - lon) <= 360.0 / (1 << 21)
        assert abs(float(lat2) - lat) <= 180.0 / (1 << 21)
        assert abs(float(t2) - t) <= Z3SFC.WEEK_MILLIS / (1 << 21)

    @given(bboxes(), st.floats(0, Z3SFC.WEEK_MILLIS - 1), st.floats(0, 1),
           st.lists(st.tuples(st.floats(0, 1), st.floats(0, 1), st.floats(0, 1)),
                    min_size=1, max_size=5))
    @settings(max_examples=100, deadline=None)
    def test_ranges_cover_cube(self, bbox, t_lo, tf, uvw):
        sfc = Z3SFC()
        t_hi = t_lo + tf * (Z3SFC.WEEK_MILLIS - t_lo)
        x0, y0, x1, y1 = bbox
        rngs = sfc.ranges([bbox], [(t_lo, t_hi)], max_ranges=32)
        for u, v, w in uvw:
            z = int(sfc.index(x0 + u * (x1 - x0), y0 + v * (y1 - y0),
                              t_lo + w * (t_hi - t_lo)))
            assert any(lo <= z <= hi for lo, hi in rngs)


class TestXZ2Properties:
    @given(bboxes(min_span=1e-4), st.lists(st.tuples(st.floats(0, 1), st.floats(0, 1)),
                                           min_size=1, max_size=4))
    @settings(max_examples=100, deadline=None)
    def test_query_ranges_cover_contained_geometries(self, query, uv):
        """Any geometry envelope fully inside the query bbox must have
        its XZ2 index inside some query range (the extended-geometry
        guarantee: one key per geometry, query covers containment)."""
        sfc = XZ2SFC()
        qx0, qy0, qx1, qy1 = query
        rngs = sfc.ranges([query], max_ranges=1000)
        for u, v in uv:
            # a degenerate (point-sized) envelope inside the query
            gx = qx0 + u * (qx1 - qx0)
            gy = qy0 + v * (qy1 - qy0)
            z = int(np.asarray(sfc.index(gx, gy, gx, gy)).ravel()[0])
            assert any(lo <= z <= hi for lo, hi in rngs)


@st.composite
def rects(draw, grid=None):
    """Axis-aligned rectangle; with ``grid`` the corners snap to a
    lattice so exact edge/corner touches are generated often."""
    if grid:
        x0 = draw(st.integers(-8, 7)) * grid
        y0 = draw(st.integers(-8, 7)) * grid
        x1 = x0 + draw(st.integers(1, 6)) * grid
        y1 = y0 + draw(st.integers(1, 6)) * grid
    else:
        x0 = draw(st.floats(-50, 49, allow_nan=False))
        y0 = draw(st.floats(-50, 49, allow_nan=False))
        x1 = x0 + draw(st.floats(0.01, 30))
        y1 = y0 + draw(st.floats(0.01, 30))
    return (x0, y0, x1, y1)


def _rect_wkt(r):
    x0, y0, x1, y1 = r
    return (
        f"POLYGON (({x0} {y0}, {x1} {y0}, {x1} {y1}, {x0} {y1}, {x0} {y0}))"
    )


class TestBatchPredicateProperties:
    """Independent arithmetic oracle for the geometry-pair refine
    kernel: for axis-aligned rectangles, intersects ⇔ closed bbox
    overlap and contains ⇔ strict containment — checked over random
    pair batches including lattice-snapped exact touches (the kernel
    semantics the geom_join driver oracle states in ANSI SQL)."""

    @given(st.lists(st.tuples(rects(grid=2.5), rects(grid=2.5)), min_size=1, max_size=40))
    @settings(max_examples=150, deadline=None)
    def test_rect_pairs_match_arithmetic(self, pairs):
        from geomesa_spark.geom import batch_predicate

        lw = [_rect_wkt(a) for a, _ in pairs]
        rw = [_rect_wkt(b) for _, b in pairs]
        got_i = batch_predicate(lw, rw, "intersects")
        got_c = batch_predicate(lw, rw, "contains")
        for k, (a, b) in enumerate(pairs):
            inter = not (a[2] < b[0] or b[2] < a[0] or a[3] < b[1] or b[3] < a[1])
            contains = a[0] < b[0] and a[1] < b[1] and b[2] < a[2] and b[3] < a[3]
            assert bool(got_i[k]) == inter, (a, b)
            assert bool(got_c[k]) == contains, (a, b)

    @given(st.lists(st.tuples(rects(), rects()), min_size=1, max_size=40))
    @settings(max_examples=100, deadline=None)
    def test_intersects_symmetric(self, pairs):
        from geomesa_spark.geom import batch_predicate

        lw = [_rect_wkt(a) for a, _ in pairs]
        rw = [_rect_wkt(b) for _, b in pairs]
        ab = batch_predicate(lw, rw, "intersects")
        ba = batch_predicate(rw, lw, "intersects")
        assert (ab == ba).all()


ATTR_FILTERS = [
    "cat = 'a'",
    "score > 25",
    "score BETWEEN 5 AND 45",
    "name LIKE 'f0%'",
    "cat IN ('a', 'c')",
    "score IS NULL",
    "NOT cat = 'b'",
]
SPATIAL_FILTERS = [
    "BBOX(geom, -10, -5, 10, 5)",
    "BBOX(geom, -19, -9, 0, 0)",
    "DWITHIN(geom, POINT (0 0), 500000, meters)",
    "INTERSECTS(geom, POLYGON ((-5 -5, 5 -5, 5 5, -5 5, -5 -5)))",
]
TEMPORAL_FILTERS = [
    "dtg DURING 2024-01-01T00:00:00Z/2024-01-02T00:00:00Z",
    "dtg AFTER 2024-01-01T12:00:00Z",
    "dtg BEFORE 2024-01-01T06:00:00Z",
    "dtg TEQUALS 2024-01-01T00:11:00Z",
]
EXTRA_FILTERS = [
    "BEYOND(geom, POINT (10 5), 1000000, meters)",
    "BBOX(geom, -19, -9, -10, -2) OR BBOX(geom, 5, 2, 19, 9)",
    "name ILIKE 'F1%'",
    # inverted disjunctive-open interval: covers ALL time (round-4 fix)
    "dtg AFTER 2024-01-01T12:00:00Z OR dtg BEFORE 2024-01-01T06:00:00Z",
    "INCLUDE",
    # round-4 grammar: attribute-vs-attribute comparison
    "lat < lon",
    "NOT (EXCLUDE)",
]


@st.composite
def ecql_filters(draw):
    """Random AND/OR/NOT trees over the attribute/spatial/temporal
    predicate pool (depth ≤ 2)."""
    pool = ATTR_FILTERS + SPATIAL_FILTERS + TEMPORAL_FILTERS + EXTRA_FILTERS

    def leaf():
        return draw(st.sampled_from(pool))

    depth = draw(st.integers(0, 2))
    expr = leaf()
    for _ in range(depth):
        op = draw(st.sampled_from(["AND", "OR"]))
        rhs = leaf()
        if draw(st.booleans()):
            rhs = f"NOT ({rhs})"
        expr = f"({expr}) {op} ({rhs})"
    return expr


class TestEcqlProperty:
    @given(ecql_filters())
    @settings(max_examples=25, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    def test_planned_equals_naive(self, spark_module_df, text):
        """For ANY generated filter: the index-planned scan (coarse Z2
        ranges + residual) returns exactly the rows of the naive
        compiled filter — over-cover in the coarse phase is always
        corrected by the residual."""
        from geomesa_spark.plans.ecql import compile_ecql, plan_ecql

        idx_df, raw_df = spark_module_df
        planned = plan_ecql(idx_df, text, z2_col="cell_z2")
        naive = raw_df.where(compile_ecql(text))
        assert planned.count() == naive.count(), text


import pytest  # noqa: E402


@pytest.fixture(scope="module")
def spark_module_df(spark):
    from datetime import datetime, timezone

    import pandas as pd

    from geomesa_spark.operators.extract import with_z2_cell

    rows = []
    for i in range(300):
        rows.append((
            i, f"f{i:03d}",
            -20.0 + (i * 31 % 400) / 10.0,
            -10.0 + (i * 17 % 200) / 10.0,
            datetime(2024, 1, 1, tzinfo=timezone.utc) + pd.Timedelta(minutes=11 * i).to_pytimedelta(),
            ["a", "b", "c"][i % 3],
            float(i % 50) if i % 7 else None,
        ))
    df = spark.createDataFrame(
        rows, "id long, name string, lon double, lat double, dtg timestamp, cat string, score double"
    ).cache()
    return with_z2_cell(df).cache(), df


@pytest.fixture(scope="module")
def spark_z3_df(spark_module_df):
    from geomesa_spark.operators.extract import with_z3_cell

    _, raw = spark_module_df
    return with_z3_cell(raw).cache(), raw


class TestEcqlZ3Property:
    @given(ecql_filters())
    @settings(max_examples=25, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    def test_planned_equals_naive_z3(self, spark_z3_df, text):
        """Same over-cover-corrected-by-residual property through the Z3
        (spatiotemporal) planner path — the path where an inverted
        temporal-interval union (round-4 ADVICE: AFTER x OR BEFORE y)
        silently compiled to an empty coarse range and dropped rows.
        Disjunctive/open intervals in the pool exercise exactly that."""
        from geomesa_spark.plans.ecql import compile_ecql, plan_ecql

        idx_df, raw_df = spark_z3_df
        planned = plan_ecql(idx_df, text, z3_cols=("epoch_bin", "cell_z3"))
        naive = raw_df.where(compile_ecql(text))
        assert planned.count() == naive.count(), text


# ---------------------------------------------------------------- XZ3
# r5 (r4 verdict item 8): random bbox×interval ECQL through the planner
# FRONT END (parse → split_primary, the path where the OR-interval bug
# lived) feeding the XZ3 extended-geometry×time range planner, checked
# against a brute-force pandas oracle. Property: the coarse candidate
# set is LOSSLESS — every geometry whose envelope intersects a query
# bbox at a matching time survives the coarse predicate (over-cover is
# allowed; a miss is the bug class the r4 fix closed on the Z3 path).

_XZ3_EPOCH0 = 1704067200000  # 2024-01-01T00:00:00Z
_XZ3_DAY = 86400_000


def _xz3_iso(day_offset_millis):
    from datetime import datetime, timedelta, timezone

    t = datetime(2024, 1, 1, tzinfo=timezone.utc) + timedelta(
        milliseconds=day_offset_millis
    )
    return t.strftime("%Y-%m-%dT%H:%M:%SZ")


@st.composite
def xz3_queries(draw):
    """(ecql_text, bboxes, temporal_truth) — the truth function encodes
    the generated shape's exact time semantics for the pandas oracle."""
    def qbox():
        x0 = draw(st.floats(min_value=-60.0, max_value=50.0))
        y0 = draw(st.floats(min_value=-40.0, max_value=30.0))
        w = draw(st.floats(min_value=0.5, max_value=40.0))
        h = draw(st.floats(min_value=0.5, max_value=30.0))
        return (x0, y0, x0 + w, y0 + h)

    n_boxes = draw(st.integers(1, 2))
    boxes = [qbox() for _ in range(n_boxes)]
    bbox_text = " OR ".join(
        f"BBOX(geom, {b[0]}, {b[1]}, {b[2]}, {b[3]})" for b in boxes
    )
    if n_boxes > 1:
        bbox_text = f"({bbox_text})"

    a = draw(st.integers(0, 70)) * _XZ3_DAY
    b = a + draw(st.integers(1, 30)) * _XZ3_DAY
    ta, tb = _XZ3_EPOCH0 + a, _XZ3_EPOCH0 + b
    shape = draw(st.sampled_from(["during", "after", "before", "or_open", "or_union"]))
    if shape == "during":
        tt = f"dtg DURING {_xz3_iso(a)}/{_xz3_iso(b)}"
        truth = lambda m: (m >= ta) & (m <= tb)  # noqa: E731
    elif shape == "after":
        tt = f"dtg AFTER {_xz3_iso(a)}"
        truth = lambda m: m > ta  # noqa: E731
    elif shape == "before":
        tt = f"dtg BEFORE {_xz3_iso(b)}"
        truth = lambda m: m < tb  # noqa: E731
    elif shape == "or_open":
        # the round-4 regression shape: inverted disjunctive-open
        # interval widens to ALL time, never to the empty (ta, tb) flip
        tt = f"(dtg AFTER {_xz3_iso(b)} OR dtg BEFORE {_xz3_iso(a)})"
        truth = lambda m: (m > tb) | (m < ta)  # noqa: E731
    else:
        # disjoint interval union: the split hull must cover BOTH legs
        c = b + draw(st.integers(1, 10)) * _XZ3_DAY  # day offsets
        d = c + draw(st.integers(1, 10)) * _XZ3_DAY
        tc, td = _XZ3_EPOCH0 + c, _XZ3_EPOCH0 + d
        tt = (
            f"(dtg DURING {_xz3_iso(a)}/{_xz3_iso(b)}"
            f" OR dtg DURING {_xz3_iso(c)}/{_xz3_iso(d)})"
        )
        truth = lambda m: ((m >= ta) & (m <= tb)) | ((m >= tc) & (m <= td))  # noqa: E731
    return f"{bbox_text} AND {tt}", boxes, truth


@pytest.fixture(scope="module")
def spark_xz3_df(spark):
    """240 extended geometries (envelopes spanning up to 25°) with event
    times over 80 days, XZ3-keyed once; plus the pandas brute-force view."""
    from pyspark.sql import functions as F

    from geomesa_spark.operators.extract import with_xz3_cell

    rows = []
    for i in range(240):
        x0 = -70.0 + (i * 37 % 130)
        y0 = -50.0 + (i * 23 % 90)
        rows.append((
            f"g{i:03d}", x0, y0,
            x0 + 0.5 + (i * 7 % 25), y0 + 0.5 + (i * 11 % 20),
            _XZ3_EPOCH0 + (i * 31 % 80) * _XZ3_DAY + (i % 24) * 3600_000,
        ))
    df = spark.createDataFrame(
        rows, "gid string, min_lon double, min_lat double, max_lon double, max_lat double, millis long"
    ).withColumn("dtg", F.timestamp_millis(F.col("millis")))
    keyed = with_xz3_cell(df).cache()
    keyed.count()
    return keyed, keyed.select("gid", "min_lon", "min_lat", "max_lon", "max_lat", "millis").toPandas()


class TestXz3PlannerProperty:
    @given(xz3_queries())
    @settings(max_examples=25, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    def test_coarse_ranges_lossless(self, spark_xz3_df, q):
        text, boxes, truth = q
        from geomesa_spark.plans.ecql import split_primary
        from geomesa_spark.plans.planner import xz3_range_predicate

        keyed, pdf = spark_xz3_df
        bboxes, interval = split_primary(text)
        assert bboxes, text  # the bbox primary must be extracted

        # open endpoints (AFTER/BEFORE/or_open) widen to the data era —
        # what a planner does when one side of the interval is unbounded
        t_lo = int(interval[0].timestamp() * 1000) if interval and interval[0] else 0
        t_hi = (
            int(interval[1].timestamp() * 1000)
            if interval and interval[1]
            else _XZ3_EPOCH0 + 200 * _XZ3_DAY
        )
        cand = {
            r.gid
            for r in keyed.where(xz3_range_predicate(bboxes, t_lo, t_hi))
            .select("gid").collect()
        }

        hit = truth(pdf.millis.values)
        inter = np.zeros(len(pdf), dtype=bool)
        for (qx0, qy0, qx1, qy1) in boxes:
            inter |= (
                (pdf.min_lon.values <= qx1) & (pdf.max_lon.values >= qx0)
                & (pdf.min_lat.values <= qy1) & (pdf.max_lat.values >= qy0)
            )
        exact = set(pdf.gid.values[hit & inter])
        assert exact <= cand, (text, sorted(exact - cand)[:5])


class TestConvexHullProperties:
    """Kernel properties behind stats.convex_hull_agg's two-stage
    distributed reduction. Integer-valued coordinates keep every cross
    product exact, so the merge identity is testable without epsilon."""

    pts_strategy = st.lists(
        st.tuples(st.integers(-50, 50), st.integers(-50, 50)),
        min_size=1, max_size=60,
    )

    @staticmethod
    def _hull(arr):
        from geomesa_spark.geom import convex_hull

        return convex_hull(np.asarray(arr, dtype="float64"))

    @given(pts_strategy, pts_strategy)
    @settings(max_examples=200, deadline=None)
    def test_merge_invariance(self, a, b):
        """hull(hull(A) ∪ hull(B)) == hull(A ∪ B) — the exact identity
        the shuffle-free partial-hull pass relies on."""
        full = self._hull(a + b)
        merged = self._hull(
            np.concatenate([self._hull(a), self._hull(b)]).tolist()
        )
        assert np.array_equal(full, merged)

    @given(pts_strategy)
    @settings(max_examples=200, deadline=None)
    def test_containment_and_vertex_subset(self, a):
        """Every input point is inside-or-on the hull (CCW edge cross
        ≥ 0), and every hull vertex is an input point."""
        hull = self._hull(a)
        pts = np.asarray(a, dtype="float64")
        in_set = {tuple(p) for p in pts}
        assert all(tuple(v) in in_set for v in hull)
        if len(hull) >= 3:
            for i in range(len(hull)):
                e0, e1 = hull[i], hull[(i + 1) % len(hull)]
                cross = (e1[0] - e0[0]) * (pts[:, 1] - e0[1]) - (
                    e1[1] - e0[1]
                ) * (pts[:, 0] - e0[0])
                assert (cross >= 0).all()


class TestHilbertProperties:
    """Hilbert kernel: bijection, exact inverse, and the curve's
    defining unit-step adjacency (consecutive ids are 4-adjacent cells
    — the locality property Z-order lacks at quadrant seams)."""

    def test_bijection_inverse_adjacency_p4(self):
        from geomesa_spark.curves.hilbert import hilbert_d2xy, hilbert_xy2d

        p, n = 4, 16
        xs, ys = np.meshgrid(np.arange(n), np.arange(n))
        d = hilbert_xy2d(p, xs.ravel(), ys.ravel())
        assert sorted(d.tolist()) == list(range(n * n))
        x2, y2 = hilbert_d2xy(p, d)
        assert (x2 == xs.ravel()).all() and (y2 == ys.ravel()).all()
        order = np.argsort(d)
        ox, oy = xs.ravel()[order], ys.ravel()[order]
        steps = np.abs(np.diff(ox)) + np.abs(np.diff(oy))
        assert (steps == 1).all()

    @given(st.lists(st.tuples(st.integers(0, 255), st.integers(0, 255)),
                    min_size=1, max_size=64))
    @settings(max_examples=50, deadline=None)
    def test_column_fold_matches_numpy(self, spark_module_df, pts):
        """The Column-expression fold is bit-identical to the NumPy
        spec kernel on random p=8 coordinates."""
        from geomesa_spark.curves.hilbert import hilbert_col, hilbert_xy2d

        spark = spark_module_df[0].sparkSession
        df = spark.createDataFrame(pts, "ix long, iy long")
        got = [r.hd for r in df.withColumn("hd", hilbert_col("ix", "iy", 8))
               .orderBy("ix", "iy", "hd").collect()]
        xs = sorted(pts)
        want = hilbert_xy2d(8, [a for a, _ in xs], [b for _, b in xs]).tolist()
        assert got == want


class TestAllenAlgebraProperties:
    """The 13-relation case list is exhaustive and mutually exclusive
    for non-degenerate intervals, and relation(L,R) is always the
    converse of relation(R,L) — checked by evaluating the SAME
    condition strings the engine compiles and the oracle quotes."""

    _CONVERSE = {
        "equals": "equals", "before": "after", "after": "before",
        "meets": "met_by", "met_by": "meets", "starts": "started_by",
        "started_by": "starts", "finishes": "finished_by",
        "finished_by": "finishes", "during": "contains",
        "contains": "during", "overlaps": "overlapped_by",
        "overlapped_by": "overlaps",
    }

    @staticmethod
    def _classify(ls, le, rs, re):
        from geomesa_spark.operators.temporal import _ALLEN_CASES

        env = {"ls": ls, "le": le, "rs": rs, "re": re}
        hits = [
            name
            for name, cond in _ALLEN_CASES
            if eval(cond.replace(" = ", " == ").replace(" AND ", " and "), env)  # noqa: S307
        ]
        return hits

    @given(st.lists(st.integers(min_value=0, max_value=20), min_size=4, max_size=4))
    @settings(max_examples=500, deadline=None)
    def test_exhaustive_exclusive_and_converse(self, vals):
        a, b, c, d = vals
        ls, le = min(a, b), max(a, b)
        rs, re = min(c, d), max(c, d)
        if ls == le or rs == re:
            return  # degenerate: first-match order decides (documented)
        hits = self._classify(ls, le, rs, re)
        assert len(hits) == 1, (ls, le, rs, re, hits)
        back = self._classify(rs, re, ls, le)
        assert back == [self._CONVERSE[hits[0]]]


class TestMarchingSquaresCaseTable:
    """tiles._MS_CASES validated from first principles, exhaustively
    over all corner-value sign patterns (values in {0,3,7,10}^4 at
    T=5): the emitted segments' edge multiset equals the boundary's
    crossed-edge set exactly once each, saddles included."""

    def test_segments_consume_each_crossed_edge_once(self):
        from itertools import product

        from geomesa_spark.operators.tiles import _MS_CASES

        T = 5
        # edge id -> its two corners (a=bl, b=br, c=tr, d=tl)
        edges = {0: ("a", "b"), 1: ("b", "c"), 2: ("d", "c"), 3: ("a", "d")}
        for va, vb, vc, vd in product([0, 3, 7, 10], repeat=4):
            corner = {"a": va, "b": vb, "c": vc, "d": vd}
            inside = {k: v >= T for k, v in corner.items()}
            idx = inside["a"] * 1 + inside["b"] * 2 + inside["c"] * 4 + inside["d"] * 8
            crossed = sorted(
                e for e, (c1, c2) in edges.items() if inside[c1] != inside[c2]
            )
            cin = va + vb + vc + vd >= 4 * T
            rows = [
                r for r in _MS_CASES
                if r[0] == idx and (r[2] == 0 or (r[2] == 1) == cin)
            ]
            used = sorted(e for r in rows for e in (r[3], r[4]))
            if idx in (0, 15):
                assert crossed == [] and rows == []
            else:
                assert used == crossed, (va, vb, vc, vd, idx, used, crossed)
                # each segment's two edges are distinct
                assert all(r[3] != r[4] for r in rows)


class TestSweepOperatorProperties:
    """Randomized cross-checks of the composition operators against
    brute-force Python references — small example counts (each example
    runs a Spark job) but fully independent implementations."""

    @given(st.lists(st.tuples(st.integers(0, 40), st.integers(0, 30)),
                    min_size=1, max_size=10),
           st.lists(st.tuples(st.integers(0, 40), st.integers(0, 30)),
                    min_size=1, max_size=10))
    @settings(max_examples=15, deadline=None)
    def test_overlap_union_vs_bruteforce(self, spark_module_df, a_iv, b_iv):
        """overlap_duration and union_duration equal a per-second
        brute-force membership count over random second-granularity
        intervals."""
        from datetime import datetime, timedelta

        from geomesa_spark.operators.temporal import overlap_duration, union_duration

        spark = spark_module_df[0].sparkSession
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        t0 = datetime(2024, 1, 1)

        def mk(iv):
            return [(1, t0 + timedelta(seconds=s), t0 + timedelta(seconds=s + d))
                    for s, d in iv]

        a = spark.createDataFrame(mk(a_iv), "k long, start timestamp, end timestamp")
        b = spark.createDataFrame(mk(b_iv), "k long, start timestamp, end timestamp")
        # brute force on a half-open [s, s+d) second lattice; the sweep
        # measures closed-interval overlap length, which equals the
        # half-open lattice count for integer endpoints
        in_a = {t for s, d in a_iv for t in range(s, s + d)}
        in_b = {t for s, d in b_iv for t in range(s, s + d)}
        want_overlap = len(in_a & in_b) * 1_000_000
        got = overlap_duration(a, b, "k").collect()[0].overlap_us
        assert got == want_overlap
        want_union = len(in_a) * 1_000_000
        got_u = union_duration(a, "k").collect()[0].active_us
        assert got_u == want_union

    @given(st.lists(st.integers(0, 300), min_size=1, max_size=25),
           st.integers(5, 60))
    @settings(max_examples=15, deadline=None)
    def test_debounce_vs_greedy_loop(self, spark_module_df, secs, cooldown):
        from datetime import datetime, timedelta

        from geomesa_spark.operators.temporal import debounce

        spark = spark_module_df[0].sparkSession
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        t0 = datetime(2024, 1, 1)
        df = spark.createDataFrame(
            [(1, t0 + timedelta(seconds=s)) for s in secs], "user_id long, ts timestamp"
        )
        base = int(t0.timestamp()) * 1_000_000
        got = sorted((r.ts_us - base) // 1_000_000 for r in debounce(df, cooldown).collect())
        want, last = [], None
        for s in sorted(secs):
            if last is None or s >= last + cooldown:
                want.append(s)
                last = s
        assert got == want

    @given(st.lists(st.tuples(st.integers(0, 30), st.integers(0, 30),
                              st.integers(1, 8), st.integers(1, 8)),
                    min_size=1, max_size=12))
    @settings(max_examples=15, deadline=None)
    def test_dissolve_vs_bruteforce_cc(self, spark_module_df, rects):
        """dissolve_envelopes matches a brute-force union-find over the
        all-pairs overlap graph (random envelopes, boundary-inclusive)."""
        from geomesa_spark.operators.tiles import dissolve_envelopes

        spark = spark_module_df[0].sparkSession
        rows = [
            (f"r{i:03d}", float(x), float(y), float(x + w), float(y + h))
            for i, (x, y, w, h) in enumerate(rects)
        ]
        df = spark.createDataFrame(
            rows,
            "rect_id string, min_lon double, min_lat double, "
            "max_lon double, max_lat double",
        )
        got = {r.cluster: (r.n_rects, r.min_lon, r.min_lat, r.max_lon, r.max_lat)
               for r in dissolve_envelopes(df, cell_deg=5.0).collect()}
        # brute force union-find
        parent = list(range(len(rows)))

        def find(i):
            while parent[i] != i:
                parent[i] = parent[parent[i]]
                i = parent[i]
            return i

        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                _, ax0, ay0, ax1, ay1 = rows[i]
                _, bx0, by0, bx1, by1 = rows[j]
                if ax0 <= bx1 and bx0 <= ax1 and ay0 <= by1 and by0 <= ay1:
                    parent[find(i)] = find(j)
        comps = {}
        for i, row in enumerate(rows):
            comps.setdefault(find(i), []).append(row)
        want = {}
        for members in comps.values():
            label = min(m[0] for m in members)
            want[label] = (
                len(members),
                min(m[1] for m in members), min(m[2] for m in members),
                max(m[3] for m in members), max(m[4] for m in members),
            )
        assert got == want
