"""SQL-text spatial optimization: rewrite ``st_*`` join conditions and
filters into cell-cover equi-joins / bbox pushdown before Spark parses
the query.

Reference analogue: geomesa-spark-sql SQLRules.scala::
SpatialOptimizationsRule (:~60), which intercepts the parsed Catalyst
plan and swaps spatial predicates for index scans + joins. Here the
same rewrite happens on the SQL *text*: the coarse predicate (grid-cell
arithmetic) is ordinary SQL, so after rewriting Catalyst sees a plain
equi-join on ``__cell`` and plans a BroadcastHashJoin — instead of the
BroadcastNestedLoopJoin cartesian it would plan for a UDF-only join
condition. The original ``st_*`` predicate is kept as a residual WHERE
filter (vectorized grouped kernel), so results are identical — only the
candidate set shrinks from |points|×|polys| to cell-cover matches.

Supported shapes (qualified column refs required):

- ``... FROM pts p JOIN polys q ON st_contains(q.wkt, st_point(p.lon, p.lat))``
  (also st_covers / st_intersects / st_within with the point first)
- ``... ON st_distanceSphere(st_point(p.lon,p.lat), st_point(q.lon,q.lat)) <= r``
  (r literal or a probe-side column) — DWITHIN join
- ``... FROM layer_a a JOIN layer_b b ON st_intersects(a.wkt, b.wkt)``
  (also st_contains / st_covers between two geometry columns) — the
  layer×layer join: BOTH sides explode their envelope cell cover, the
  equi-join on ``__cell`` carries a reference-point dedup conjunct
  (the pair is kept only at the cell containing the lower-left corner
  of the two envelopes' intersection — a standard partition-based
  spatial-join dedup, cf. PBSM/SpatialHadoop), so each candidate pair
  appears EXACTLY once without knowing any id columns, and the
  original predicate refines via the batched NumPy kernel.
- ``WHERE st_contains('POLYGON (...)', st_point(lon, lat))`` — a WKT
  literal filter gains closed-bbox conjuncts that reach the parquet scan
  as PushedFilters (partition/row-group pruning).

Anything else passes through unchanged — the rewrite is a pure
optimization with a safe identity fallback.

Cell formulas mirror operators/extract.py::grid_cell and
operators/joins.py::cover_cells_for_polys exactly (including the
antimeridian pmod wrap), so rewritten SQL joins pair the same
candidates as the Python-API operators. Double literals carry the ``D``
suffix: bare ``180.0`` is DECIMAL in Spark SQL and would change the
IEEE arithmetic.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

__all__ = ["spatial_sql", "rewrite_spatial_sql"]

_ENV_COLS = ("min_lon", "min_lat", "max_lon", "max_lat")

_JOIN_RE = re.compile(
    r"FROM\s+(?P<t1>\w+)\s+(?:AS\s+)?(?P<a1>\w+)\s+(?:INNER\s+)?JOIN\s+"
    r"(?P<t2>\w+)\s+(?:AS\s+)?(?P<a2>\w+)\s+ON\s+",
    re.IGNORECASE,
)

_PIP_GEOM_FIRST = re.compile(
    r"^st_(contains|covers|intersects)\s*\(\s*(\w+)\.(\w+)\s*,\s*"
    r"st_point\s*\(\s*(\w+)\.(\w+)\s*,\s*(\w+)\.(\w+)\s*\)\s*\)$",
    re.IGNORECASE,
)
_PIP_POINT_FIRST = re.compile(
    r"^st_(within|intersects)\s*\(\s*st_point\s*\(\s*(\w+)\.(\w+)\s*,\s*(\w+)\.(\w+)\s*\)"
    r"\s*,\s*(\w+)\.(\w+)\s*\)$",
    re.IGNORECASE,
)
_GEOM_GEOM = re.compile(
    r"^st_(intersects|contains|covers)\s*\(\s*(\w+)\.(\w+)\s*,\s*(\w+)\.(\w+)\s*\)$",
    re.IGNORECASE,
)
_DWITHIN = re.compile(
    r"^st_distanceSphere\s*\(\s*st_point\s*\(\s*(\w+)\.(\w+)\s*,\s*(\w+)\.(\w+)\s*\)\s*,\s*"
    r"st_point\s*\(\s*(\w+)\.(\w+)\s*,\s*(\w+)\.(\w+)\s*\)\s*\)\s*<=?\s*(?P<r>[\w.]+)$",
    re.IGNORECASE,
)
_DWITHIN_FN = re.compile(
    r"^st_dwithin\s*\(\s*st_point\s*\(\s*(\w+)\.(\w+)\s*,\s*(\w+)\.(\w+)\s*\)\s*,\s*"
    r"st_point\s*\(\s*(\w+)\.(\w+)\s*,\s*(\w+)\.(\w+)\s*\)\s*,\s*(?P<r>[\w.]+)\s*\)$",
    re.IGNORECASE,
)
_FILTER_PIP = re.compile(
    r"st_(contains|covers|intersects)\s*\(\s*'([^']+)'\s*,\s*"
    r"st_point\s*\(\s*([\w.]+)\s*,\s*([\w.]+)\s*\)\s*\)",
    re.IGNORECASE,
)
_FILTER_DW = re.compile(
    r"st_distanceSphere\s*\(\s*st_point\s*\(\s*([\w.]+)\s*,\s*([\w.]+)\s*\)\s*,\s*"
    r"st_point\s*\(\s*(-?[\d.eE+]+)\s*,\s*(-?[\d.eE+]+)\s*\)\s*\)\s*<=?\s*([\d.eE+]+)",
    re.IGNORECASE,
)

_CLAUSE_KW = re.compile(r"\b(WHERE|GROUP\s+BY|ORDER\s+BY|HAVING|LIMIT|UNION)\b", re.IGNORECASE)

# strict-mode detector: a TWO-TABLE spatial predicate anywhere in the
# text (incl. inside CTEs/subqueries the rewriter does not reach). A
# predicate is join-shaped only when qualified columns of TWO DIFFERENT
# aliases appear among its arguments — one alias (or none) is a per-row
# filter that legitimately takes the identity path. The qualified-column
# atom requires an IDENTIFIER before the dot, since `\w+\.\w+` would
# also match decimal literals like 1.5.
_SPATIAL_CALL_RE = re.compile(
    r"\bst_(contains|covers|intersects|within|dwithin|distanceSphere)\s*\(",
    re.IGNORECASE,
)
_QUALIFIED_COL_RE = re.compile(r"\b([A-Za-z_]\w*)\.[A-Za-z_]\w*")


def _count_spatial_join_predicates(sql: str) -> int:
    """Number of spatial CALL SITES whose arguments reference two
    different aliases — each is a join predicate the rewriter must
    either rewrite or (strict mode) refuse."""
    n = 0
    for m in _SPATIAL_CALL_RE.finditer(sql):
        # scan the call's balanced argument span (nested st_point(...)
        # calls are part of the predicate)
        depth, i = 0, m.end() - 1
        start = m.end()
        while i < len(sql):
            if sql[i] == "(":
                depth += 1
            elif sql[i] == ")":
                depth -= 1
                if depth == 0:
                    break
            i += 1
        aliases = {a.lower() for a in _QUALIFIED_COL_RE.findall(sql[start:i])}
        if len(aliases) >= 2:
            n += 1
    return n


def _spatial_on_join_count(sql: str) -> int:
    """Two-alias spatial call sites inside ON conditions only — the
    JOIN-MECHANISM sites. Once the top-level join has been spliced onto
    the cell key, a two-alias spatial call OUTSIDE every ON clause
    (e.g. a WHERE refine over the already-keyed pair) is a per-row
    filter, not a cartesian risk — strict mode must not raise on it."""
    n = 0
    for m in _JOIN_RE.finditer(sql):
        cond, _ = _scan_condition(sql, m.end())
        n += _count_spatial_join_predicates(cond)
    return n


def _scan_condition(sql: str, start: int) -> tuple[str, int]:
    """Extract the ON condition from ``start`` to the next top-level
    clause keyword (paren-depth aware)."""
    depth = 0
    i = start
    while i < len(sql):
        ch = sql[i]
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0:
            m = _CLAUSE_KW.match(sql, i)
            if m:
                return sql[start:i].strip(), i
        i += 1
    return sql[start:].strip(), len(sql)


def _point_cell(lon: str, lat: str, n: int) -> str:
    # mirrors extract.grid_cell: least-clamped floor bins, row-major
    return (
        f"(least(floor(({lat} + 90.0D) / 180.0D * {n}), {n - 1}) * {n}"
        f" + least(floor(({lon} + 180.0D) / 360.0D * {n}), {n - 1}))"
    )


def _cover_lateral(n: int) -> str:
    # mirrors joins.cover_cells_for_polys: y clamped, x unclamped + pmod
    # wrap, span capped at n columns
    y0 = f"least(greatest(floor((min_lat + 90.0D) / 180.0D * {n}), 0), {n - 1})"
    y1 = f"least(greatest(floor((max_lat + 90.0D) / 180.0D * {n}), 0), {n - 1})"
    x0 = f"floor((min_lon + 180.0D) / 360.0D * {n})"
    x1 = f"least(floor((max_lon + 180.0D) / 360.0D * {n}), {x0} + {n - 1})"
    return (
        f" LATERAL VIEW explode(sequence({y0}, {y1})) __ey AS __yy"
        f" LATERAL VIEW explode(sequence({x0}, {x1})) __ex AS __xx"
    )


def _poly_subquery(table: str, wkt_col: str, has_env: bool, n: int) -> str:
    src = table
    if not has_env:
        src = (
            f"(SELECT *, st_xmin({wkt_col}) AS min_lon, st_ymin({wkt_col}) AS min_lat,"
            f" st_xmax({wkt_col}) AS max_lon, st_ymax({wkt_col}) AS max_lat FROM {table})"
        )
    return (
        f"(SELECT *, (__yy * {n} + pmod(__xx, {n})) AS __cell FROM {src} __s"
        f"{_cover_lateral(n)})"
    )


def _probe_subquery(table: str, lon: str, lat: str, radius: str, n: int) -> str:
    """DWITHIN cover: circle-bbox per probe, widest-latitude lon scaling
    (mirrors operators/joins.py::distance_join)."""
    rlat = f"({radius} / 111195.0D)"
    coslat = f"greatest(cos(radians(least(abs({lat}) + {rlat}, 90.0D))), cast(1e-6 as double))"
    rlon = f"({rlat} / {coslat})"
    src = (
        f"(SELECT *, {lon} - {rlon} AS min_lon, {lon} + {rlon} AS max_lon,"
        f" {lat} - {rlat} AS min_lat, {lat} + {rlat} AS max_lat FROM {table})"
    )
    return (
        f"(SELECT * EXCEPT (min_lon, max_lon, min_lat, max_lat), (__yy * {n} + pmod(__xx, {n}))"
        f" AS __cell FROM {src} __s{_cover_lateral(n)})"
    )


def _table_columns(spark: SparkSession | None, name: str) -> list[str]:
    if spark is None:
        return []
    try:
        return [c.lower() for c in spark.table(name).columns]
    except Exception:
        return []


def rewrite_spatial_sql(
    sql: str,
    spark: SparkSession | None = None,
    bits: int = 6,
    broadcast: bool = True,
    strict: bool = False,
) -> str:
    """Rewrite spatial joins/filters in ``sql``; identity if no
    supported pattern matches.

    The matcher is textual and handles the documented top-level shapes
    only: a spatial predicate inside a CTE or subquery falls through
    UNREWRITTEN (still correct — the st_* functions evaluate as-is, but
    a geometry×geometry join then runs as the cartesian fallback). Pass
    ``strict=True`` to raise ``ValueError`` instead of silently taking
    the identity path when the SQL contains a spatial join predicate
    that nothing rewrote — the mode to use when a pipeline REQUIRES the
    cell-cover plan.
    """
    n = 1 << bits
    joined = _rewrite_join(sql, spark, n, broadcast)
    if strict:
        # Gate on the JOIN stage specifically: comparing the FINAL output
        # to the input would let an unrelated literal-filter rewrite mask
        # an unrewritten spatial join (e.g. inside a CTE/subquery). The
        # rewriter handles at most ONE join per call, so strict raises
        # whenever the input carries more JOIN-MECHANISM spatial call
        # sites than the stage consumed. When a splice happened, only
        # ON-clause sites count — a two-alias spatial call in a WHERE
        # over the already-keyed pair is a refine, not a cartesian (a
        # false positive the first version of this gate raised on). When
        # nothing was consumed, ANY two-alias site (incl. comma-join
        # WHERE predicates) means the cartesian fallback. Counting the
        # INPUT sidesteps the residual: a successful splice re-emits the
        # original predicate as the refine conjunct, so the output text
        # always still "contains" a spatial join.
        consumed = 0 if joined == sql else 1
        risk = _spatial_on_join_count(sql) if consumed else _count_spatial_join_predicates(sql)
        if risk > consumed:
            raise ValueError(
                "rewrite_spatial_sql(strict=True): SQL contains a spatial "
                "join predicate that no supported top-level join/filter "
                "shape matched (CTEs and subqueries are not rewritten); "
                "the query would run on the cartesian fallback"
            )
    return _rewrite_literal_filters(joined)


def _rewrite_join(sql: str, spark: SparkSession | None, n: int, broadcast: bool) -> str:
    m = _JOIN_RE.search(sql)
    if not m:
        return sql
    t1, a1, t2, a2 = m.group("t1"), m.group("a1"), m.group("t2"), m.group("a2")
    cond, cond_end = _scan_condition(sql, m.end())

    alias_table = {a1: t1, a2: t2}
    pip = _PIP_GEOM_FIRST.match(cond)
    envelope_where = None
    if pip:
        _, ga, gcol, pa1, loncol, pa2, latcol = pip.groups()
        if pa1 != pa2 or ga == pa1 or ga not in alias_table or pa1 not in alias_table:
            return sql
        poly_a, pt_a = ga, pa1
    else:
        pipp = _PIP_POINT_FIRST.match(cond)
        if pipp:
            _, pa1, loncol, pa2, latcol, ga, gcol = pipp.groups()
            if pa1 != pa2 or ga == pa1 or ga not in alias_table or pa1 not in alias_table:
                return sql
            poly_a, pt_a = ga, pa1
        else:
            gg = _GEOM_GEOM.match(cond)
            if gg:
                _, la, lcol, ra, rcol = gg.groups()
                if la == ra or la not in alias_table or ra not in alias_table:
                    return sql
                return _splice_geom_geom(
                    sql, m, cond_end, spark, alias_table, la, lcol, ra, rcol,
                    cond, n, broadcast, order=(a1, a2),
                )
            dw = _DWITHIN.match(cond) or _DWITHIN_FN.match(cond)
            if not dw:
                return sql
            qa1, qlon, qa2, qlat, ra1, rlon, ra2, rlat, radius = dw.groups()
            if qa1 != qa2 or ra1 != ra2 or qa1 == ra1:
                return sql
            # the probe (cover) side: the alias owning the radius column,
            # else the second st_point's side
            probe_a = radius.split(".")[0] if "." in radius else ra1
            if probe_a not in alias_table:
                return sql
            pt_a = a1 if probe_a == a2 else a2
            plon, plat = (qlon, qlat) if qa1 == pt_a else (rlon, rlat)
            blon, blat = (qlon, qlat) if qa1 == probe_a else (rlon, rlat)
            r_expr = radius.split(".")[1] if "." in radius else radius
            probe_sub = _probe_subquery(alias_table[probe_a], blon, blat, r_expr, n)
            pt_sub = f"(SELECT *, {_point_cell(plon, plat, n)} AS __cell FROM {alias_table[pt_a]})"
            return _splice(
                sql, m, cond_end, pt_a, pt_sub, probe_a, probe_sub, cond, None, broadcast,
                order=(a1, a2),
            )

    cols2 = _table_columns(spark, alias_table[poly_a])
    has_env = all(c in cols2 for c in _ENV_COLS) if cols2 else False
    poly_sub = _poly_subquery(alias_table[poly_a], gcol, has_env, n)
    pt_sub = f"(SELECT *, {_point_cell(loncol, latcol, n)} AS __cell FROM {alias_table[pt_a]})"
    envelope_where = (
        f"{pt_a}.{loncol} >= {poly_a}.min_lon AND {pt_a}.{loncol} <= {poly_a}.max_lon"
        f" AND {pt_a}.{latcol} >= {poly_a}.min_lat AND {pt_a}.{latcol} <= {poly_a}.max_lat"
    )
    return _splice(
        sql, m, cond_end, pt_a, pt_sub, poly_a, poly_sub, cond, envelope_where, broadcast,
        order=(a1, a2),
    )


def _splice(
    sql: str,
    join_m: re.Match,
    cond_end: int,
    pt_a: str,
    pt_sub: str,
    cover_a: str,
    cover_sub: str,
    residual: str,
    envelope_where: str | None,
    broadcast: bool,
    order: tuple[str, str],
) -> str:
    a1, a2 = order
    first_sub, second_sub = (
        (pt_sub, cover_sub) if pt_a == a1 else (cover_sub, pt_sub)
    )
    new_from = (
        f"FROM {first_sub} {a1} JOIN {second_sub} {a2} "
        f"ON {pt_a}.__cell = {cover_a}.__cell "
    )
    conds = [residual] if envelope_where is None else [envelope_where, residual]
    tail = sql[cond_end:]
    wm = re.search(r"\bWHERE\b", tail, re.IGNORECASE)
    if wm:
        tail = tail[: wm.end()] + " (" + ") AND (".join(conds) + ") AND" + tail[wm.end():]
    else:
        clause = " WHERE (" + ") AND (".join(conds) + ") "
        km = _CLAUSE_KW.search(tail)
        if km:
            tail = tail[: km.start()] + clause + tail[km.start():]
        else:
            tail = tail.rstrip().rstrip(";") + clause
    out = sql[: join_m.start()] + new_from + tail
    if broadcast:
        out = re.sub(
            r"\bSELECT\b", f"SELECT /*+ BROADCAST({cover_a}) */", out, count=1,
            flags=re.IGNORECASE,
        )
    return out


def _splice_geom_geom(
    sql: str,
    join_m: re.Match,
    cond_end: int,
    spark: SparkSession | None,
    alias_table: dict,
    la: str,
    lcol: str,
    ra: str,
    rcol: str,
    residual: str,
    n: int,
    broadcast: bool,
    order: tuple[str, str],
) -> str:
    """Layer×layer join: both sides cell-covered, reference-point dedup.

    The equi-join on ``__cell`` would emit a pair once per shared cover
    cell; the dedup conjunct keeps the pair ONLY at the cell containing
    the lower-left corner of the envelopes' intersection. That corner's
    coordinate lies in both envelopes, so its (pmod-wrapped) cell is in
    both covers — every bbox-overlapping pair survives exactly once; the
    residual st_* kernel then refines exactly. The same double
    expressions as the cover (D-suffixed literals) guarantee the
    canonical index is bit-identical to the cover's own floor index."""
    a1, a2 = order
    subs = {}
    for alias, col in ((la, lcol), (ra, rcol)):
        cols = _table_columns(spark, alias_table[alias])
        has_env = all(c in cols for c in _ENV_COLS) if cols else False
        subs[alias] = _poly_subquery(alias_table[alias], col, has_env, n)
    gx = f"greatest({la}.min_lon, {ra}.min_lon)"
    gy = f"greatest({la}.min_lat, {ra}.min_lat)"
    canon = (
        f"(least(greatest(floor(({gy} + 90.0D) / 180.0D * {n}), 0), {n - 1}) * {n}"
        f" + pmod(floor(({gx} + 180.0D) / 360.0D * {n}), {n}))"
    )
    env_overlap = (
        f"{la}.min_lon <= {ra}.max_lon AND {ra}.min_lon <= {la}.max_lon"
        f" AND {la}.min_lat <= {ra}.max_lat AND {ra}.min_lat <= {la}.max_lat"
    )
    pre = f"{la}.__cell = {canon} AND {env_overlap}"
    return _splice(
        sql, join_m, cond_end, la, subs[la], ra, subs[ra], residual, pre, broadcast,
        order=(a1, a2),
    )


def _rewrite_literal_filters(sql: str) -> str:
    """WKT-literal spatial filters gain closed-bbox conjuncts that push
    into the parquet scan (the residual st_* keeps exact semantics)."""
    from geomesa_spark.geom import parse_wkt

    def repl(m: re.Match) -> str:
        try:
            b = parse_wkt(m.group(2)).bbox
        except Exception:
            return m.group(0)
        lon, lat = m.group(3), m.group(4)
        return (
            f"({lon} >= {b[0]!r}D AND {lon} <= {b[2]!r}D"
            f" AND {lat} >= {b[1]!r}D AND {lat} <= {b[3]!r}D AND {m.group(0)})"
        )

    out = _FILTER_PIP.sub(repl, sql)

    def repl_dw(m: re.Match) -> str:
        # DWITHIN around a literal point → circle-bbox conjuncts
        # (residual keeps exactness; skip near the antimeridian where
        # a raw-lon box would wrongly exclude wrapped matches)
        import math

        lon, lat = m.group(1), m.group(2)
        cx, cy, r = float(m.group(3)), float(m.group(4)), float(m.group(5))
        rlat = r / 111195.0
        coslat = max(math.cos(math.radians(min(abs(cy) + rlat, 90.0))), 1e-6)
        rlon = rlat / coslat
        if cx - rlon < -180.0 or cx + rlon > 180.0:
            return m.group(0)
        return (
            f"({lon} >= {cx - rlon!r}D AND {lon} <= {cx + rlon!r}D"
            f" AND {lat} >= {cy - rlat!r}D AND {lat} <= {cy + rlat!r}D AND {m.group(0)})"
        )

    return _FILTER_DW.sub(repl_dw, out)


def spatial_sql(
    spark: SparkSession, sql: str, bits: int = 6, broadcast: bool = True
) -> DataFrame:
    """``spark.sql`` with the spatial rewrite applied (and the st_*
    catalog registered)."""
    from geomesa_spark.functions.st import register_st_functions

    register_st_functions(spark)
    return spark.sql(rewrite_spatial_sql(sql, spark, bits=bits, broadcast=broadcast))
