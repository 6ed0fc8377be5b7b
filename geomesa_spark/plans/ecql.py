"""(E)CQL filter front-end: parse filter text → AST → Catalyst Column,
plus the FilterSplitter-style index split.

GeoMesa's primary user-facing query surface is an ECQL filter string —
every CLI command takes ``-q/--cql``, the Spark integration accepts CQL
through GeoMesaRelation, and QueryPlanner decomposes the parsed filter
into an indexed PRIMARY (bbox / time interval / attribute equality) plus
a RESIDUAL evaluated per row (reference:
geomesa-index-api/.../index/planning/FilterSplitter.scala::getQueryOptions,
geomesa-utils/.../filters — grammar per GeoTools ECQL / OGC Filter).

Spark-first mapping:
- The parser is a small recursive-descent over the public ECQL grammar
  (no GeoTools dependency) producing a plain tuple AST.
- ``compile_ecql`` turns the AST into ONE Catalyst ``Column``:
  attribute/temporal/bbox/DWITHIN predicates are pure built-ins
  (whole-stage codegen); predicates against a constant polygon compile
  to a single Arrow-vectorized pandas UDF closed over the parsed
  geometry (``geom.points_in_polygon`` on the whole batch — never
  per-row Python).
- ``split_primary`` mirrors FilterSplitter: walks the conjunctive
  structure and extracts the spatial envelopes + temporal interval that
  the cell-range planner can turn into coarse parquet-pushdown
  predicates; the FULL filter is always re-applied as the exact
  residual, so over-extraction is impossible by construction.
- ``plan_ecql`` = split → coarse z2/z3 range predicate (planner.py) →
  conjoin compiled exact filter. Catalyst collapses coarse+exact into
  one scan stage, same two-phase contract as the rest of the planner.

Semantics notes (mirroring GeoTools ECQL behavior):
- ``DURING`` bounds are EXCLUSIVE (OGC temporal `During`); BEFORE/AFTER
  are strict.
- ``BBOX`` / geometry predicates over a point layer use the engine's
  ray-crossing kernel convention (geom.points_in_polygon); BBOX itself
  is the closed envelope, matching the reference's envelope semantics.
- DWITHIN/BEYOND distances are geodesic (haversine), with ECQL unit
  names: meters, kilometers, feet, statute miles, nautical miles.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from datetime import datetime, timedelta, timezone

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from geomesa_spark import geom as G

__all__ = [
    "parse_ecql",
    "compile_ecql",
    "split_primary",
    "plan_ecql",
    "EcqlError",
]


class EcqlError(ValueError):
    pass


# ---------------------------------------------------------------- lexer

_DT_RE = re.compile(
    r"\d{4}-\d{2}-\d{2}(?:T\d{2}:\d{2}:\d{2}(?:\.\d+)?(?:Z|[+-]\d{2}:\d{2})?)?"
)
_DUR_RE = re.compile(r"P(?:\d+[YMWD])*(?:T(?:\d+[HMS])+)?", re.IGNORECASE)
_NUM_RE = re.compile(r"[+-]?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?")
_ID_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_.:]*")

_GEOM_TYPES = {
    "POINT",
    "LINESTRING",
    "POLYGON",
    "MULTIPOINT",
    "MULTILINESTRING",
    "MULTIPOLYGON",
    "GEOMETRYCOLLECTION",
}

_KEYWORDS = {
    "AND", "OR", "NOT", "BETWEEN", "LIKE", "ILIKE", "IN", "IS", "NULL",
    "TRUE", "FALSE", "BBOX", "INTERSECTS", "DISJOINT", "CONTAINS",
    "WITHIN", "TOUCHES", "CROSSES", "OVERLAPS", "EQUALS", "DWITHIN",
    "BEYOND", "DURING", "BEFORE", "AFTER", "TEQUALS", "INCLUDE",
    "EXCLUDE",
}


@dataclass
class _Tok:
    kind: str  # ident kw num str dt dur op lparen rparen comma slash eof
    val: object
    start: int
    end: int


class _Lexer:
    def __init__(self, s: str):
        self.s = s
        self.i = 0
        self._peeked: _Tok | None = None

    def _scan(self) -> _Tok:
        s, n = self.s, len(self.s)
        i = self.i
        while i < n and s[i].isspace():
            i += 1
        if i >= n:
            return _Tok("eof", None, i, i)
        c = s[i]
        # datetime before number (both may start with a digit)
        m = _DT_RE.match(s, i)
        if m:
            return _Tok("dt", m.group(0), i, m.end())
        if c == "(":
            return _Tok("lparen", c, i, i + 1)
        if c == ")":
            return _Tok("rparen", c, i, i + 1)
        if c == ",":
            return _Tok("comma", c, i, i + 1)
        if c == "/":
            return _Tok("slash", c, i, i + 1)
        if c in "+-*":
            # arithmetic (and numeric sign — handled as unary by the
            # parsers, so "BBOX(geom, -10, ...)" still works)
            return _Tok("arith", c, i, i + 1)
        if c == "'":
            j = i + 1
            out = []
            while j < n:
                if s[j] == "'":
                    if j + 1 < n and s[j + 1] == "'":  # '' escape
                        out.append("'")
                        j += 2
                        continue
                    return _Tok("str", "".join(out), i, j + 1)
                out.append(s[j])
                j += 1
            raise EcqlError(f"unterminated string literal at {i}")
        for op in ("<>", "!=", "<=", ">=", "<", ">", "="):
            if s.startswith(op, i):
                return _Tok("op", "<>" if op == "!=" else op, i, i + len(op))
        if c.isdigit():
            m = _NUM_RE.match(s, i)
            txt = m.group(0)
            v = float(txt) if ("." in txt or "e" in txt or "E" in txt) else int(txt)
            return _Tok("num", v, i, m.end())
        m = _ID_RE.match(s, i)
        if m:
            txt = m.group(0)
            up = txt.upper()
            if up.startswith("P") and _DUR_RE.fullmatch(txt) and up != "P":
                return _Tok("dur", txt, i, m.end())
            if up in _KEYWORDS:
                return _Tok("kw", up, i, m.end())
            return _Tok("ident", txt, i, m.end())
        raise EcqlError(f"unexpected character {c!r} at {i}")

    def peek(self) -> _Tok:
        if self._peeked is None:
            t = self._scan()
            self._peeked = t
        return self._peeked

    def next(self) -> _Tok:
        t = self.peek()
        self._peeked = None
        self.i = t.end
        return t

    def expect(self, kind: str, val=None) -> _Tok:
        t = self.next()
        if t.kind != kind or (val is not None and t.val != val):
            raise EcqlError(f"expected {val or kind}, got {t.val!r} at {t.start}")
        return t

    def take_wkt(self) -> str:
        """Consume a WKT geometry literal starting at the current cursor:
        geometry-type keyword + balanced parens, returned verbatim."""
        t = self.next()
        if t.kind != "ident" or t.val.upper() not in _GEOM_TYPES:
            raise EcqlError(f"expected WKT geometry at {t.start}, got {t.val!r}")
        s, n = self.s, len(self.s)
        j = t.end
        while j < n and s[j].isspace():
            j += 1
        if j >= n or s[j] != "(":
            # EMPTY geometries: POINT EMPTY — not supported
            raise EcqlError(f"expected '(' after {t.val} at {j}")
        depth = 0
        while j < n:
            if s[j] == "(":
                depth += 1
            elif s[j] == ")":
                depth -= 1
                if depth == 0:
                    j += 1
                    break
            j += 1
        if depth != 0:
            raise EcqlError(f"unbalanced WKT parens starting at {t.start}")
        self.i = j
        self._peeked = None
        return s[t.start:j]


# --------------------------------------------------------------- parser
#
# AST is plain tuples:
#   ("and", a, b) ("or", a, b) ("not", a)
#   ("cmp", op, attr, value)            op in = <> < <= > >=
#   ("between", attr, lo, hi, negated)
#   ("like", attr, pattern, ci, negated)
#   ("in", attr, [values], negated)
#   ("isnull", attr, negated)
#   ("bbox", attr, x0, y0, x1, y1)
#   ("spatial", op, attr, wkt)          op in intersects disjoint contains
#                                             within touches crosses
#                                             overlaps equals
#   ("dwithin", attr, wkt, meters, beyond: bool)
#   ("during", attr, t0, t1)            t* as tz-aware datetime
#   ("tcmp", op, attr, t)               op in before after tequals
# Values: int/float/str/bool/datetime.

_UNITS = {
    "meters": 1.0,
    "kilometers": 1000.0,
    "feet": 0.3048,
    "statute miles": 1609.344,
    "nautical miles": 1852.0,
}

_SPATIAL_OPS = {
    "INTERSECTS", "DISJOINT", "CONTAINS", "WITHIN", "TOUCHES",
    "CROSSES", "OVERLAPS", "EQUALS",
}


def _parse_dt(txt: str) -> datetime:
    t = txt
    if t.endswith("Z"):
        t = t[:-1] + "+00:00"
    if "T" not in t:
        t += "T00:00:00+00:00"
    elif not re.search(r"[+-]\d{2}:\d{2}$", t):
        t += "+00:00"
    return datetime.fromisoformat(t)


def _parse_duration(txt: str) -> timedelta:
    m = re.fullmatch(
        r"P(?:(\d+)Y)?(?:(\d+)M)?(?:(\d+)W)?(?:(\d+)D)?"
        r"(?:T(?:(\d+)H)?(?:(\d+)M)?(?:(\d+)S)?)?",
        txt,
        re.IGNORECASE,
    )
    if not m:
        raise EcqlError(f"bad ISO-8601 duration {txt!r}")
    y, mo, w, d, h, mi, s = (int(g) if g else 0 for g in m.groups())
    # calendar-exact years/months need an anchor; ECQL periods in query
    # filters conventionally use D/H/M/S — approximate Y/M like GeoTools
    # (365/30 days) for completeness
    return timedelta(days=y * 365 + mo * 30 + w * 7 + d, hours=h, minutes=mi, seconds=s)


class _Parser:
    def __init__(self, text: str):
        self.lx = _Lexer(text)

    def parse(self):
        node = self._or()
        t = self.lx.peek()
        if t.kind != "eof":
            raise EcqlError(f"trailing input at {t.start}: {t.val!r}")
        return node

    def _or(self):
        node = self._and()
        while self.lx.peek().kind == "kw" and self.lx.peek().val == "OR":
            self.lx.next()
            node = ("or", node, self._and())
        return node

    def _and(self):
        node = self._not()
        while self.lx.peek().kind == "kw" and self.lx.peek().val == "AND":
            self.lx.next()
            node = ("and", node, self._not())
        return node

    def _not(self):
        t = self.lx.peek()
        if t.kind == "kw" and t.val == "NOT":
            self.lx.next()
            return ("not", self._not())
        return self._primary()

    def _primary(self):
        t = self.lx.peek()
        if t.kind == "lparen":
            self.lx.next()
            node = self._or()
            self.lx.expect("rparen")
            return node
        if t.kind == "kw" and t.val == "BBOX":
            return self._bbox()
        if t.kind == "kw" and t.val in _SPATIAL_OPS:
            return self._spatial(t.val)
        if t.kind == "kw" and t.val in ("DWITHIN", "BEYOND"):
            return self._dwithin(t.val == "BEYOND")
        if t.kind == "kw" and t.val in ("INCLUDE", "EXCLUDE"):
            # the OGC universal filters (GeoMesa CLI -q "INCLUDE" is the
            # conventional full-scan query)
            self.lx.next()
            return ("include",) if t.val == "INCLUDE" else ("exclude",)
        if t.kind == "kw" and t.val == "IN":
            # top-level IN = the GeoTools feature-ID filter: IN ('f1','f2')
            self.lx.next()
            self.lx.expect("lparen")
            vals = [self._literal()]
            while self.lx.peek().kind == "comma":
                self.lx.next()
                vals.append(self._literal())
            self.lx.expect("rparen")
            return ("fid_in", [str(v) for v in vals])
        if t.kind == "ident":
            return self._attr_predicate()
        raise EcqlError(f"unexpected token {t.val!r} at {t.start}")

    def _bbox(self):
        self.lx.next()
        self.lx.expect("lparen")
        attr = self.lx.expect("ident").val
        vals = []
        for _ in range(4):
            self.lx.expect("comma")
            vals.append(self._number())
        # optional trailing CRS string — accepted and ignored (EPSG:4326 only)
        if self.lx.peek().kind == "comma":
            self.lx.next()
            self.lx.expect("str")
        self.lx.expect("rparen")
        return ("bbox", attr, *[float(v) for v in vals])

    def _number(self):
        t = self.lx.next()
        sign = 1
        if t.kind == "arith" and t.val in "+-":
            sign = -1 if t.val == "-" else 1
            t = self.lx.next()
        if t.kind != "num":
            raise EcqlError(f"expected number at {t.start}, got {t.val!r}")
        return sign * t.val

    def _spatial(self, op: str):
        self.lx.next()
        self.lx.expect("lparen")
        attr = self.lx.expect("ident").val
        self.lx.expect("comma")
        wkt = self.lx.take_wkt()
        self.lx.expect("rparen")
        return ("spatial", op.lower(), attr, wkt)

    def _dwithin(self, beyond: bool):
        self.lx.next()
        self.lx.expect("lparen")
        attr = self.lx.expect("ident").val
        self.lx.expect("comma")
        wkt = self.lx.take_wkt()
        self.lx.expect("comma")
        dist = float(self._number())
        self.lx.expect("comma")
        unit_parts = [self.lx.next()]
        if unit_parts[0].kind not in ("ident", "str"):
            raise EcqlError(f"expected unit name at {unit_parts[0].start}")
        # 'statute miles' / 'nautical miles' come as two idents
        if self.lx.peek().kind == "ident":
            unit_parts.append(self.lx.next())
        unit = " ".join(str(p.val) for p in unit_parts).lower()
        if unit not in _UNITS:
            raise EcqlError(f"unknown DWITHIN unit {unit!r}")
        self.lx.expect("rparen")
        return ("dwithin", attr, wkt, dist * _UNITS[unit], beyond)

    def _literal(self):
        t = self.lx.next()
        if t.kind == "arith" and t.val in "+-":
            sign = -1 if t.val == "-" else 1
            t = self.lx.expect("num")
            return sign * t.val
        if t.kind == "num" or t.kind == "str":
            return t.val
        if t.kind == "dt":
            return _parse_dt(t.val)
        if t.kind == "kw" and t.val in ("TRUE", "FALSE"):
            return t.val == "TRUE"
        raise EcqlError(f"expected literal at {t.start}, got {t.val!r}")

    def _attr_predicate(self):
        attr = self.lx.expect("ident").val
        t = self.lx.next()
        negated = False
        if t.kind == "kw" and t.val == "NOT":
            negated = True
            t = self.lx.next()
        if t.kind == "op":
            # attr-vs-attr comparison (GeoTools: a > b) when the right
            # side is a bare identifier, else attr-vs-literal
            if self.lx.peek().kind == "ident":
                return ("cmpa", t.val, attr, self.lx.next().val)
            return ("cmp", t.val, attr, self._literal())
        if t.kind == "kw" and t.val == "BETWEEN":
            lo = self._literal()
            self.lx.expect("kw", "AND")
            hi = self._literal()
            return ("between", attr, lo, hi, negated)
        if t.kind == "kw" and t.val in ("LIKE", "ILIKE"):
            pat = self.lx.expect("str").val
            return ("like", attr, pat, t.val == "ILIKE", negated)
        if t.kind == "kw" and t.val == "IN":
            self.lx.expect("lparen")
            vals = [self._literal()]
            while self.lx.peek().kind == "comma":
                self.lx.next()
                vals.append(self._literal())
            self.lx.expect("rparen")
            return ("in", attr, vals, negated)
        if t.kind == "kw" and t.val == "IS":
            neg = False
            if self.lx.peek().kind == "kw" and self.lx.peek().val == "NOT":
                self.lx.next()
                neg = True
            self.lx.expect("kw", "NULL")
            return ("isnull", attr, neg)
        if t.kind == "kw" and t.val == "DURING":
            t0 = self._time_endpoint()
            self.lx.expect("slash")
            t1 = self._time_endpoint()
            if isinstance(t0, timedelta) and isinstance(t1, timedelta):
                raise EcqlError("DURING needs at least one instant")
            if isinstance(t1, timedelta):
                t1 = t0 + t1
            elif isinstance(t0, timedelta):
                t0 = t1 - t0
            return ("during", attr, t0, t1)
        if t.kind == "kw" and t.val in ("BEFORE", "AFTER", "TEQUALS"):
            inst = self._time_endpoint()
            if isinstance(inst, timedelta):
                raise EcqlError(f"{t.val} needs an instant")
            return ("tcmp", t.val.lower(), attr, inst)
        raise EcqlError(f"unexpected {t.val!r} after attribute {attr!r} at {t.start}")

    def _time_endpoint(self):
        t = self.lx.next()
        if t.kind == "dt":
            return _parse_dt(t.val)
        if t.kind == "dur":
            return _parse_duration(t.val)
        if t.kind == "str":
            return _parse_dt(t.val)
        raise EcqlError(f"expected instant or duration at {t.start}")


def parse_ecql(text: str):
    """Parse an ECQL filter string into the tuple AST."""
    return _Parser(text).parse()


# -------------------------------------------------------------- compile


def _pip_predicate(lon_col: str, lat_col: str, wkt: str, mode: str) -> Column:
    """Vectorized point-vs-constant-geometry predicate: the geometry is
    parsed ONCE on the driver and closed over; each Arrow batch runs one
    NumPy kernel (geom.points_in_polygon / points_on_boundary)."""
    g = G.parse_wkt(wkt)

    if mode == "interior":
        @pandas_udf("boolean")
        def _f(lon: pd.Series, lat: pd.Series) -> pd.Series:
            m = G.points_in_polygon(lon.to_numpy(), lat.to_numpy(), g)
            return pd.Series(m)
        return _f(F.col(lon_col), F.col(lat_col))
    if mode == "boundary":
        @pandas_udf("boolean")
        def _t(lon: pd.Series, lat: pd.Series) -> pd.Series:
            m = G.points_on_boundary(lon.to_numpy(), lat.to_numpy(), g)
            return pd.Series(m)
        return _t(F.col(lon_col), F.col(lat_col))
    raise EcqlError(f"unsupported spatial mode {mode}")


def _spatial_col(node, lon: str, lat: str) -> Column:
    _, op, _attr, wkt = node
    g = G.parse_wkt(wkt)
    area = g.geom_type in ("POLYGON", "MULTIPOLYGON")
    lineal = g.geom_type in ("LINESTRING", "MULTILINESTRING")
    if g.geom_type in ("POINT", "MULTIPOINT"):
        pts = g.rings[0]
        same = None
        for k in range(len(pts)):
            x, y = float(pts[k, 0]), float(pts[k, 1])
            t = (F.col(lon) == x) & (F.col(lat) == y)
            same = t if same is None else (same | t)
        if op in ("intersects", "equals", "contains", "within"):
            if op == "equals" and len(pts) != 1:
                return F.lit(False)
            return same
        if op == "disjoint":
            return ~same
        # touches/crosses/overlaps: point-vs-point boundary is empty
        return F.lit(False)
    if op == "equals":
        return F.lit(False)  # point attr never equals a 1/2-dim literal
    if area:
        # kernel convention: points_in_polygon is the ray-crossing
        # interior test; the closed region adds the boundary
        interior = _pip_predicate(lon, lat, wkt, "interior")
        if op == "within":
            # OGC Within requires an interior∩interior intersection: a
            # point sitting exactly ON the boundary matches INTERSECTS
            # but NOT WITHIN (GeoTools/JTS `within` DE-9IM T*F**F***).
            # The ray-crossing kernel classifies some boundary points as
            # "in", so subtract the boundary explicitly.
            return interior & ~_pip_predicate(lon, lat, wkt, "boundary")
        if op == "intersects":
            return interior | _pip_predicate(lon, lat, wkt, "boundary")
        if op == "disjoint":
            return ~(interior | _pip_predicate(lon, lat, wkt, "boundary"))
        if op == "touches":
            # a point on the boundary cannot simultaneously be interior,
            # so the boundary test alone IS the touches predicate (and it
            # must not be vetoed by the ray-crossing kernel's arbitrary
            # in/out call for boundary points)
            return _pip_predicate(lon, lat, wkt, "boundary")
        if op in ("contains", "crosses", "overlaps"):
            # a point can't contain an area; crosses/overlaps need
            # higher-dim intersections (OGC dimension matrix)
            return F.lit(False)
    if lineal:
        on = _pip_predicate(lon, lat, wkt, "boundary")  # on-path test
        # OGC boundary of a lineal geometry (Mod-2 rule): component
        # endpoints occurring an odd number of times; closed components
        # contribute none.  Point WITHIN line excludes these endpoints
        # (DE-9IM T*F**F***); point TOUCHES line matches ONLY them.
        from collections import Counter

        ends: Counter = Counter()
        for ring in g.rings:
            if len(ring) > 1 and not (ring[0] == ring[-1]).all():
                ends[(float(ring[0, 0]), float(ring[0, 1]))] += 1
                ends[(float(ring[-1, 0]), float(ring[-1, 1]))] += 1
        at_end = None
        for (x, y), c in ends.items():
            if c % 2 == 1:
                t = (F.col(lon) == x) & (F.col(lat) == y)
                at_end = t if at_end is None else (at_end | t)
        if op == "intersects":
            return on
        if op == "within":
            return on & ~at_end if at_end is not None else on
        if op == "touches":
            return (on & at_end) if at_end is not None else F.lit(False)
        if op == "disjoint":
            return ~on
        return F.lit(False)
    raise EcqlError(f"unsupported spatial op {op} for {g.geom_type}")


def _dwithin_col(node, lon: str, lat: str) -> Column:
    from geomesa_spark.operators.joins import haversine_m_col

    _, _attr, wkt, meters, beyond = node
    g = G.parse_wkt(wkt)
    if g.geom_type == "POINT":
        x, y = float(g.rings[0][0, 0]), float(g.rings[0][0, 1])
        d = haversine_m_col(F.col(lon), F.col(lat), F.lit(x), F.lit(y))
        return d > meters if beyond else d <= meters
    # general geometry: vectorized min-distance (clamp to each segment,
    # haversine at the closest planar point — the route_search/dwithin_bbox
    # approximation, exact for the small distances DWITHIN is used at)
    is_area = g.geom_type in ("POLYGON", "MULTIPOLYGON")
    closedish = is_area

    @pandas_udf("boolean")
    def _f(plon: pd.Series, plat: pd.Series) -> pd.Series:
        import numpy as np

        px, py = plon.to_numpy(), plat.to_numpy()
        best = np.full(px.shape, np.inf)
        for ring in g.rings:
            e = np.vstack([ring, ring[:1]]) if closedish and not (ring[0] == ring[-1]).all() else ring
            if len(e) == 1:
                best = np.minimum(best, G.haversine_m(px, py, e[0, 0], e[0, 1]))
                continue
            for k in range(len(e) - 1):
                ax, ay = float(e[k, 0]), float(e[k, 1])
                bx, by = float(e[k + 1, 0]), float(e[k + 1, 1])
                dx, dy = bx - ax, by - ay
                den = dx * dx + dy * dy
                if den > 0:
                    t = np.clip(((px - ax) * dx + (py - ay) * dy) / den, 0.0, 1.0)
                else:
                    t = 0.0
                cx, cy = ax + t * dx, ay + t * dy
                best = np.minimum(best, G.haversine_m(px, py, cx, cy))
        if is_area:
            best[G.points_in_polygon(px, py, g)] = 0.0
        return pd.Series(best > meters if beyond else best <= meters)

    return _f(F.col(lon), F.col(lat))


def compile_ecql(
    node_or_text,
    lon: str = "lon",
    lat: str = "lat",
    dtg: str | None = "dtg",
    geom_attr: str = "geom",
    fid_attr: str = "__fid__",
) -> Column:
    """Compile an ECQL filter (text or parsed AST) to one Catalyst
    ``Column``. The geometry attribute ``geom_attr`` resolves to the
    point columns ``(lon, lat)``; every other attribute resolves to the
    DataFrame column of the same name. Temporal predicates compare the
    named attribute as a timestamp."""
    node = parse_ecql(node_or_text) if isinstance(node_or_text, str) else node_or_text

    def lit(v):
        if isinstance(v, datetime):
            return F.lit(v.astimezone(timezone.utc).replace(tzinfo=None)).cast("timestamp")
        return F.lit(v)

    def walk(n) -> Column:
        tag = n[0]
        if tag == "and":
            return walk(n[1]) & walk(n[2])
        if tag == "or":
            return walk(n[1]) | walk(n[2])
        if tag == "not":
            return ~walk(n[1])
        if tag == "cmp":
            _, op, attr, v = n
            c = F.col(attr)
            return {
                "=": c == lit(v), "<>": c != lit(v), "<": c < lit(v),
                "<=": c <= lit(v), ">": c > lit(v), ">=": c >= lit(v),
            }[op]
        if tag == "cmpa":
            _, op, a, b = n
            c, d = F.col(a), F.col(b)
            return {
                "=": c == d, "<>": c != d, "<": c < d,
                "<=": c <= d, ">": c > d, ">=": c >= d,
            }[op]
        if tag == "include":
            return F.lit(True)
        if tag == "exclude":
            return F.lit(False)
        if tag == "fid_in":
            return F.col(fid_attr).isin(list(n[1]))
        if tag == "between":
            _, attr, lo, hi, neg = n
            c = F.col(attr).between(lit(lo), lit(hi))
            return ~c if neg else c
        if tag == "like":
            _, attr, pat, ci, neg = n
            c = F.col(attr).ilike(pat) if ci else F.col(attr).like(pat)
            return ~c if neg else c
        if tag == "in":
            _, attr, vals, neg = n
            c = F.col(attr).isin([v for v in vals])
            return ~c if neg else c
        if tag == "isnull":
            _, attr, neg = n
            c = F.col(attr).isNull()
            return ~c if neg else c
        if tag == "bbox":
            _, attr, x0, y0, x1, y1 = n
            return (
                F.col(lon).between(x0, x1) & F.col(lat).between(y0, y1)
            )
        if tag == "spatial":
            return _spatial_col(n, lon, lat)
        if tag == "dwithin":
            return _dwithin_col(n, lon, lat)
        if tag == "during":
            _, attr, t0, t1 = n
            return (F.col(attr) > lit(t0)) & (F.col(attr) < lit(t1))
        if tag == "tcmp":
            _, op, attr, t = n
            c = F.col(attr)
            if op == "before":
                return c < lit(t)
            if op == "after":
                return c > lit(t)
            return c == lit(t)
        raise EcqlError(f"cannot compile node {tag}")

    return walk(node)


# ---------------------------------------------------- FilterSplitter


def _node_bboxes(n, geom_attr: str):
    """Spatial envelope(s) this node guarantees, or None (no spatial
    constraint derivable). Mirrors FilterSplitter's primary extraction:
    a geometry predicate against the indexed geometry yields its
    literal's envelope; only intersect-like predicates qualify."""
    tag = n[0]
    if tag == "bbox" and n[1] == geom_attr:
        return [(n[2], n[3], n[4], n[5])]
    if tag == "spatial" and n[2] == geom_attr and n[1] in (
        "intersects", "within", "contains", "equals", "touches",
    ):
        x0, y0, x1, y1 = G.parse_wkt(n[3]).bbox
        return [(float(x0), float(y0), float(x1), float(y1))]
    if tag == "dwithin" and n[1] == geom_attr and not n[4]:
        x0, y0, x1, y1 = G.parse_wkt(n[2]).bbox
        # expand by the radius (degrees): conservative at the envelope's
        # worst-case latitude, clamped to the world
        import math

        dlat = n[3] / 111_195.0
        coslat = max(
            0.01,
            min(math.cos(math.radians(abs(y0))), math.cos(math.radians(abs(y1)))),
        )
        dlon = dlat / coslat
        return [(
            max(-180.0, x0 - dlon), max(-90.0, y0 - dlat),
            min(180.0, x1 + dlon), min(90.0, y1 + dlat),
        )]
    if tag == "and":
        a, b = _node_bboxes(n[1], geom_attr), _node_bboxes(n[2], geom_attr)
        if a and b:
            # intersect the tightest single envelopes
            ax0 = max(min(e[0] for e in a), min(e[0] for e in b))
            ay0 = max(min(e[1] for e in a), min(e[1] for e in b))
            ax1 = min(max(e[2] for e in a), max(e[2] for e in b))
            ay1 = min(max(e[3] for e in a), max(e[3] for e in b))
            if ax0 > ax1 or ay0 > ay1:
                return [(0.0, 0.0, 0.0, 0.0)]  # provably empty
            return [(ax0, ay0, ax1, ay1)]
        return a or b
    if tag == "or":
        a, b = _node_bboxes(n[1], geom_attr), _node_bboxes(n[2], geom_attr)
        if a is not None and b is not None:
            return a + b  # multi-range
        return None  # one branch unconstrained → no spatial primary
    return None


def _node_interval(n, dtg_attr: str):
    tag = n[0]
    if tag == "during" and n[1] == dtg_attr:
        return (n[2], n[3])
    if tag == "tcmp" and n[2] == dtg_attr:
        if n[1] == "before":
            return (None, n[3])
        if n[1] == "after":
            return (n[3], None)
        return (n[3], n[3])
    if tag == "cmp" and n[2] == dtg_attr and isinstance(n[3], datetime):
        op = n[1]
        if op in ("<", "<="):
            return (None, n[3])
        if op in (">", ">="):
            return (n[3], None)
        if op == "=":
            return (n[3], n[3])
        return None
    if tag == "between" and n[1] == dtg_attr and isinstance(n[2], datetime) and not n[4]:
        return (n[2], n[3])
    if tag == "and":
        a, b = _node_interval(n[1], dtg_attr), _node_interval(n[2], dtg_attr)
        if a and b:
            lo = max((t for t in (a[0], b[0]) if t is not None), default=None)
            hi = min((t for t in (a[1], b[1]) if t is not None), default=None)
            return (lo, hi)
        return a or b
    if tag == "or":
        a, b = _node_interval(n[1], dtg_attr), _node_interval(n[2], dtg_attr)
        if a and b:
            # Union of intervals, None = ±infinity: an open endpoint on
            # EITHER branch leaves the union open on that side.  (The old
            # min/max treated None as "other branch wins", which for
            # `AFTER X OR BEFORE Y` produced the inverted (X, Y) instead
            # of (-inf, +inf) — violating the over-cover contract.)
            lo = None if (a[0] is None or b[0] is None) else min(a[0], b[0])
            hi = None if (a[1] is None or b[1] is None) else max(a[1], b[1])
            return (lo, hi)
        return None
    return None


def split_primary(node_or_text, geom_attr: str = "geom", dtg_attr: str = "dtg"):
    """FilterSplitter analogue: extract the index-servable PRIMARY from
    the filter — the guaranteed spatial envelopes and temporal interval.
    Returns ``(bboxes | None, (t_lo, t_hi) | None)``; either side of the
    interval may be None (open). The full filter is always re-applied as
    the residual, so the extraction only needs to be CONSERVATIVE
    (over-cover), never exact — OR branches without a constraint poison
    the primary, AND tightens it, NOT contributes nothing."""
    node = parse_ecql(node_or_text) if isinstance(node_or_text, str) else node_or_text
    return _node_bboxes(node, geom_attr), _node_interval(node, dtg_attr)


def plan_ecql(
    df: DataFrame,
    text: str,
    lon: str = "lon",
    lat: str = "lat",
    dtg: str = "dtg",
    geom_attr: str = "geom",
    z2_col: str | None = None,
    z3_cols: tuple[str, str] | None = None,
    transforms: list[str] | None = None,
) -> DataFrame:
    """QueryPlanner analogue: parse → split → coarse cell-range
    predicate (Z3 if both space+time primaries exist and the table has
    z3 columns, else Z2) → conjoin the exact compiled filter. Both
    phases land in one scan stage under Catalyst.

    ``z2_col`` / ``z3_cols`` name pre-materialized index columns on
    ``df`` (as a stored index table would have); if absent the filter
    still runs as a full-scan residual — same degradation the reference
    has when no index matches (FilterSplitter's full-table fallback).
    """
    import time

    from geomesa_spark.plans.planner import z2_range_predicate, z3_range_predicate

    t_start = time.perf_counter()
    ast = parse_ecql(text)
    bboxes, interval = split_primary(ast, geom_attr=geom_attr, dtg_attr=dtg)
    exact = compile_ecql(ast, lon=lon, lat=lat, dtg=dtg, geom_attr=geom_attr)

    coarse = None
    index_used = "none"
    if (
        bboxes
        and interval
        and interval[0] is not None
        and interval[1] is not None
        and z3_cols is not None
    ):
        t_lo = int(interval[0].timestamp() * 1000)
        t_hi = int(interval[1].timestamp() * 1000)
        coarse = z3_range_predicate(
            bboxes, t_lo, t_hi, bin_col=z3_cols[0], cell_col=z3_cols[1]
        )
        index_used = "z3"
    elif bboxes and z2_col is not None:
        coarse = z2_range_predicate(bboxes, cell_col=z2_col)
        index_used = "z2"

    pred = exact if coarse is None else (coarse & exact)

    from geomesa_spark.plans.audit import audit_event

    audit_event(
        event="query.plan",
        filter=text,
        index=index_used,
        n_envelopes=len(bboxes) if bboxes else 0,
        interval=[t.isoformat() if t else None for t in interval] if interval else None,
        transforms=transforms,
        plan_millis=int((time.perf_counter() - t_start) * 1000),
    )
    out = df.where(pred)
    if transforms:
        out = apply_transforms(out, transforms, lon=lon, lat=lat, geom_attr=geom_attr)
    return out


# ------------------------------------------------- query transforms
#
# GeoMesa Query "transforms" are relational projections with derived
# attributes in the GeoTools expression language, e.g.
#   Query(sft, ecql, Array("name", "derived=strConcat(foo,bar)"))
# (reference: geomesa-index-api/.../planning QueryPlanner transform
# handling; geomesa-process TransformProcess definitions). Here the
# expression grammar (property names, literals, + - * /, function
# calls) compiles to Catalyst Columns — pure built-ins, codegen.

_EXPR_FUNCS = {
    # GeoTools filter-function names → Spark builders.
    # (columns, raw_arg_nodes) -> Column
    "strConcat": lambda c, a: F.concat(*c),
    "strToUpperCase": lambda c, a: F.upper(c[0]),
    "strToLowerCase": lambda c, a: F.lower(c[0]),
    "strTrim": lambda c, a: F.trim(c[0]),
    "strLength": lambda c, a: F.length(c[0]),
    "strCapitalize": lambda c, a: F.initcap(c[0]),
    # strSubstring uses Java begin/end indexes (end exclusive)
    "strSubstring": lambda c, a: F.substring(
        c[0], int(a[1][1]) + 1, int(a[2][1]) - int(a[1][1])
    ),
    "strReplace": lambda c, a: F.regexp_replace(c[0], str(a[1][1]), str(a[2][1])),
    "abs": lambda c, a: F.abs(c[0]),
    "ceil": lambda c, a: F.ceil(c[0]),
    "floor": lambda c, a: F.floor(c[0]),
    "round": lambda c, a: F.round(c[0], 0),
    "sqrt": lambda c, a: F.sqrt(c[0]),
    "pow": lambda c, a: F.pow(c[0], c[1]),
    "min": lambda c, a: F.least(*c),
    "max": lambda c, a: F.greatest(*c),
    "dateFormat": lambda c, a: F.date_format(c[1], str(a[0][1])),
}


class _ExprParser(_Parser):
    """Expression-only entry point sharing the filter lexer."""

    def parse_expr(self):
        node = self._additive()
        t = self.lx.peek()
        if t.kind != "eof":
            raise EcqlError(f"trailing input at {t.start}: {t.val!r}")
        return node

    def _additive(self):
        node = self._mult()
        while True:
            t = self.lx.peek()
            if t.kind == "arith" and t.val in "+-":
                self.lx.next()
                node = ("bin", t.val, node, self._mult())
            else:
                return node

    def _mult(self):
        node = self._factor()
        while True:
            t = self.lx.peek()
            if (t.kind == "arith" and t.val == "*") or t.kind == "slash":
                self.lx.next()
                node = ("bin", "*" if t.kind == "arith" else "/", node, self._factor())
            else:
                return node

    def _factor(self):
        t = self.lx.peek()
        if t.kind == "arith" and t.val in "+-":
            self.lx.next()
            f = self._factor()
            return f if t.val == "+" else ("neg", f)
        if t.kind == "lparen":
            self.lx.next()
            node = self._additive()
            self.lx.expect("rparen")
            return node
        if t.kind in ("num", "str"):
            self.lx.next()
            return ("lit", t.val)
        if t.kind == "ident" or t.kind == "dur":
            # 'dur' can swallow idents like PT1 — treat as a name here
            self.lx.next()
            if self.lx.peek().kind == "lparen":
                self.lx.next()
                args = []
                if self.lx.peek().kind != "rparen":
                    args.append(self._additive())
                    while self.lx.peek().kind == "comma":
                        self.lx.next()
                        args.append(self._additive())
                self.lx.expect("rparen")
                return ("call", str(t.val), args)
            return ("attr", str(t.val))
        raise EcqlError(f"unexpected token {t.val!r} at {t.start} in expression")


def parse_expression(text: str):
    """Parse one GeoTools-style transform expression into an AST."""
    return _ExprParser(text).parse_expr()


def compile_expression(
    node_or_text,
    lon: str = "lon",
    lat: str = "lat",
    geom_attr: str = "geom",
) -> Column:
    """Compile a transform expression to one Catalyst Column.
    ``getX(geom)`` / ``getY(geom)`` resolve to the point columns."""
    node = parse_expression(node_or_text) if isinstance(node_or_text, str) else node_or_text

    def walk(n) -> Column:
        tag = n[0]
        if tag == "lit":
            return F.lit(n[1])
        if tag == "attr":
            return F.col(n[1])
        if tag == "neg":
            return -walk(n[1])
        if tag == "bin":
            a, b = walk(n[2]), walk(n[3])
            return {"+": a + b, "-": a - b, "*": a * b, "/": a / b}[n[1]]
        if tag == "call":
            fn, args = n[1], n[2]
            if fn in ("getX", "getY"):
                if args and args[0] == ("attr", geom_attr):
                    return F.col(lon if fn == "getX" else lat)
                raise EcqlError(f"{fn} expects the geometry attribute")
            if fn not in _EXPR_FUNCS:
                raise EcqlError(f"unknown transform function {fn!r}")
            return _EXPR_FUNCS[fn]([walk(a) for a in args], args)
        raise EcqlError(f"cannot compile expression node {tag}")

    return walk(node)


def apply_transforms(
    df: DataFrame,
    transforms: list[str],
    lon: str = "lon",
    lat: str = "lat",
    geom_attr: str = "geom",
) -> DataFrame:
    """Apply a Query-transform projection: each entry is either a plain
    attribute name (``geom`` expands to the point columns) or
    ``name=expression``. One ``select`` — Catalyst prunes the scan to
    exactly the referenced columns."""
    cols = []
    for t in transforms:
        name, eq, expr = t.partition("=")
        name = name.strip()
        if not eq:
            if name == geom_attr:
                cols.extend([F.col(lon), F.col(lat)])
            else:
                cols.append(F.col(name))
        else:
            cols.append(
                compile_expression(expr.strip(), lon=lon, lat=lat, geom_attr=geom_attr).alias(name)
            )
    return df.select(*cols)
