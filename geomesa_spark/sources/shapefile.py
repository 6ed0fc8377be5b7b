"""Shapefile export sink (reference: geomesa-tools ShapefileExporter,
which delegates to GeoTools' ShapefileDataStore).

No GeoTools here, so the engine writes the PUBLIC ESRI shapefile format
(ESRI Shapefile Technical Description, 1998) directly: .shp geometry
records + .shx offset index + dBase III .dbf attribute table. POINT
geometries only — the dominant export shape for this engine's feature
tables; extended geometries should export GeoJSON/parquet instead.

Like pack_bin / to_arrow_ipc this is a driver-side funnel for
tool-compatibility exports (collect → bytes); bulk data belongs in
columnar sinks. Numeric/text attributes map to dBase N/C fields.
"""

from __future__ import annotations

import os
import struct

from pyspark.sql import DataFrame

__all__ = ["write_shapefile", "read_shapefile_points"]


def write_shapefile(
    df: DataFrame,
    path_base: str,
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> int:
    """Write ``path_base``.shp/.shx/.dbf from a (small, collected)
    DataFrame of points. All non-coordinate columns become dBase
    attributes (numerics → N 18.6, everything else → C 64). Returns the
    record count."""
    rows = df.collect()
    cols = [c for c in df.columns if c not in (lon_col, lat_col)]
    numeric = {
        f.name
        for f in df.schema.fields
        if f.dataType.typeName() in ("integer", "long", "double", "float", "short", "decimal")
    }

    xs = [float(r[lon_col]) for r in rows]
    ys = [float(r[lat_col]) for r in rows]
    bbox = (min(xs), min(ys), max(xs), max(ys)) if rows else (0.0, 0.0, 0.0, 0.0)

    # --- .shp + .shx ------------------------------------------------------
    def header(file_len_words: int) -> bytes:
        return (
            struct.pack(">i20xi", 9994, file_len_words)  # code, 20 unused, length
            + struct.pack("<ii", 1000, 1)  # version, shape type POINT
            + struct.pack("<8d", bbox[0], bbox[1], bbox[2], bbox[3], 0, 0, 0, 0)
        )

    rec_words = (8 + 20) // 2  # record header + point content, in 16-bit words
    shp_len = 50 + len(rows) * rec_words
    shx_len = 50 + len(rows) * 4

    with open(path_base + ".shp", "wb") as shp, open(path_base + ".shx", "wb") as shx:
        shp.write(header(shp_len))
        shx.write(header(shx_len))
        offset = 50
        for i, (x, y) in enumerate(zip(xs, ys)):
            shp.write(struct.pack(">ii", i + 1, 10))  # number, content words
            shp.write(struct.pack("<idd", 1, x, y))
            shx.write(struct.pack(">ii", offset, 10))
            offset += rec_words

    # --- .dbf (dBase III) -------------------------------------------------
    fields = []
    for c in cols:
        if c in numeric:
            fields.append((c[:10], b"N", 18, 6))
        else:
            fields.append((c[:10], b"C", 64, 0))
    rec_len = 1 + sum(f[2] for f in fields)
    hdr_len = 32 + 32 * len(fields) + 1
    with open(path_base + ".dbf", "wb") as dbf:
        dbf.write(
            struct.pack(
                "<4BIHH20x", 3, 24, 1, 1, len(rows), hdr_len, rec_len
            )
        )
        for name, typ, size, dec in fields:
            dbf.write(
                struct.pack("<11s1sIBB14x", name.encode("ascii"), typ, 0, size, dec)
            )
        dbf.write(b"\x0d")
        for r in rows:
            dbf.write(b" ")  # not deleted
            for (name, typ, size, dec), c in zip(fields, cols):
                v = r[c]
                if typ == b"N":
                    s = ("" if v is None else f"{float(v):.{dec}f}").rjust(size)[:size]
                else:
                    s = ("" if v is None else str(v)).ljust(size)[:size]
                dbf.write(s.encode("utf-8", "replace")[:size].ljust(size))
        dbf.write(b"\x1a")
    return len(rows)


def read_shapefile_points(path_base: str) -> list[tuple[float, float]]:
    """Minimal .shp point reader (round-trip verification)."""
    out = []
    with open(path_base + ".shp", "rb") as f:
        data = f.read()
    (file_words,) = struct.unpack_from(">i", data, 24)
    assert len(data) == file_words * 2, "shp length mismatch"
    pos = 100
    while pos < len(data):
        _, words = struct.unpack_from(">ii", data, pos)
        shape, x, y = struct.unpack_from("<idd", data, pos + 8)
        assert shape == 1
        out.append((x, y))
        pos += 8 + words * 2
    return out
