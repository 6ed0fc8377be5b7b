"""Codegen geohash encoding — pure column expressions, no Python.

Reference surface: geomesa-spark-jts GeometricOutputFunctions.scala::
st_geoHash and GeometricConstructorFunctions.scala::st_geomFromGeoHash
(the scalar kernels live in geom.py::geohash_encode/decode and back the
st_* catalog). This module is the HOT-PATH form: the base-32 geohash of
a (lon, lat) column pair built entirely from Spark built-ins —
normalize each dimension to an integer (the same floor contract as the
Z2 index: ``floor((x - lo) * (2^bits / extent))`` with a top clamp),
then assemble each output character from five interleaved bits
(lon-first) via shift/and arithmetic and an alphabet array lookup.
One whole-stage-codegen projection; mirrorable term-for-term in ANSI
SQL, so the driver oracle can certify it bit-for-bit.

Cell-edge convention: a coordinate exactly on a cell boundary follows
the floor-normalization contract (consistent with the Z2/Z3 index
columns), which can differ from textbook bisection by one cell when the
rounded product lands a hair under an integer — the convention is
engine-wide and mirrored by the oracle, so joins against the index stay
consistent.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

GH32 = "0123456789bcdefghjkmnpqrstuvwxyz"

__all__ = ["GH32", "geohash_col", "sql_geohash_xy", "sql_geohash_chars"]


def _norm(col: Column, lo: float, extent: float, bits: int) -> Column:
    scale = float(1 << bits) / extent
    return F.least(
        F.floor((col - F.lit(lo)) * F.lit(scale)).cast("long"),
        F.lit((1 << bits) - 1),
    )


def geohash_col(lon: Column, lat: Column, precision: int = 8) -> Column:
    """Base-32 geohash string of a point as one codegen expression."""
    nbits = 5 * precision
    nlon = (nbits + 1) // 2
    nlat = nbits // 2
    xi = _norm(lon, -180.0, 360.0, nlon)
    yi = _norm(lat, -90.0, 180.0, nlat)
    alphabet = F.array(*[F.lit(ch) for ch in GH32])
    chars = []
    for c in range(precision):
        v: Column | None = None
        for j in range(5):
            m = 5 * c + j
            if m % 2 == 0:
                bit = F.shiftrightunsigned(xi, nlon - 1 - m // 2)
            else:
                bit = F.shiftrightunsigned(yi, nlat - 1 - (m - 1) // 2)
            term = bit.bitwiseAND(F.lit(1)) * F.lit(1 << (4 - j))
            v = term if v is None else v + term
        chars.append(F.element_at(alphabet, (v + 1).cast("int")))
    return F.concat(*chars)


def sql_geohash_xy(lon: str, lat: str, precision: int = 8) -> tuple[str, str]:
    """ANSI-SQL mirror of the normalization step: (xi_expr, yi_expr)."""
    nbits = 5 * precision
    nlon = (nbits + 1) // 2
    nlat = nbits // 2
    xi = (
        f"least(CAST(floor(({lon} - (-180.0)) * ({float(1 << nlon)!r} / 360.0)) AS BIGINT), "
        f"{(1 << nlon) - 1})"
    )
    yi = (
        f"least(CAST(floor(({lat} - (-90.0)) * ({float(1 << nlat)!r} / 180.0)) AS BIGINT), "
        f"{(1 << nlat) - 1})"
    )
    return xi, yi


def sql_geohash_chars(precision: int = 8, xi: str = "xi", yi: str = "yi") -> str:
    """ANSI-SQL mirror of the character assembly over ``xi``/``yi``
    columns (use with :func:`sql_geohash_xy` in a CTE)."""
    nbits = 5 * precision
    nlon = (nbits + 1) // 2
    nlat = nbits // 2
    chars = []
    for c in range(precision):
        terms = []
        for j in range(5):
            m = 5 * c + j
            if m % 2 == 0:
                terms.append(f"((({xi} >> {nlon - 1 - m // 2}) & 1) * {1 << (4 - j)})")
            else:
                terms.append(f"((({yi} >> {nlat - 1 - (m - 1) // 2}) & 1) * {1 << (4 - j)})")
        chars.append(f"substr('{GH32}', CAST({' + '.join(terms)} AS INT) + 1, 1)")
    return " || ".join(chars)
