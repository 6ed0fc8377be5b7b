"""Shapefile export sink (reference: geomesa-tools ShapefileExporter,
which delegates to GeoTools' ShapefileDataStore).

No GeoTools here, so the engine writes the PUBLIC ESRI shapefile format
(ESRI Shapefile Technical Description, 1998) directly: .shp geometry
records + .shx offset index + dBase III .dbf attribute table. Shape
types: POINT (1) via write_shapefile, POLYLINE (3) and POLYGON (5) via
write_shapefile_geoms from a WKT column — outer rings clockwise, holes
counter-clockwise per the spec.

Like pack_bin / to_arrow_ipc this is a driver-side funnel for
tool-compatibility exports (collect → bytes); bulk data belongs in
columnar sinks. Numeric/text attributes map to dBase N/C fields.
"""

from __future__ import annotations

import os
import struct

from pyspark.sql import DataFrame

__all__ = [
    "write_shapefile",
    "write_shapefile_geoms",
    "read_shapefile_points",
    "read_shapefile_geoms",
]


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


def _dbf_write(path_base: str, rows, cols, numeric: set) -> None:
    fields = []
    for c in cols:
        if c in numeric:
            fields.append((c[:10], b"N", 18, 6))
        else:
            fields.append((c[:10], b"C", 64, 0))
    rec_len = 1 + sum(f[2] for f in fields)
    hdr_len = 32 + 32 * len(fields) + 1
    with open(path_base + ".dbf", "wb") as dbf:
        dbf.write(struct.pack("<4BIHH20x", 3, 24, 1, 1, len(rows), hdr_len, rec_len))
        for name, typ, size, dec in fields:
            dbf.write(struct.pack("<11s1sIBB14x", name.encode("ascii"), typ, 0, size, dec))
        dbf.write(b"\x0d")
        for r in rows:
            dbf.write(b" ")
            for (name, typ, size, dec), c in zip(fields, cols):
                v = r[c]
                if typ == b"N":
                    s = ("" if v is None else f"{float(v):.{dec}f}").rjust(size)[:size]
                else:
                    s = ("" if v is None else str(v)).ljust(size)[:size]
                dbf.write(s.encode("utf-8", "replace")[:size].ljust(size))
        dbf.write(b"\x1a")


def write_shapefile_geoms(
    df: DataFrame, path_base: str, wkt_col: str = "wkt"
) -> int:
    """Write POLYGON (shape type 5) or POLYLINE (shape type 3) records
    from a WKT column (reference ExportCommand exports any geometry via
    GeoTools; here the two extended types the spec defines for 2-D
    paths/rings). The layer must be homogeneous — a shapefile holds ONE
    shape type. Ring order follows the public spec: outer rings
    CLOCKWISE (negative shoelace area), holes counter-clockwise; input
    ring order is normalized on write. Driver-side funnel like
    write_shapefile."""
    import numpy as np

    from geomesa_spark.geom import _close, _ring_signed_area2, parse_wkt

    rows = df.collect()
    cols = [c for c in df.columns if c != wkt_col]
    numeric = {
        f.name
        for f in df.schema.fields
        if f.dataType.typeName() in ("integer", "long", "double", "float", "short", "decimal")
    }
    geoms = [parse_wkt(r[wkt_col]) for r in rows]
    types = {g.geom_type.replace("MULTI", "") for g in geoms}
    if not types <= {"POLYGON"} and not types <= {"LINESTRING"}:
        raise ValueError(f"write_shapefile_geoms: mixed/unsupported types {types}")
    polygonal = types == {"POLYGON"}
    shape_type = 5 if polygonal else 3

    recs = []  # (parts_offsets, points) per record
    for g in geoms:
        pts_list = []
        parts = []
        acc = 0
        if polygonal:
            # group rings per polygon, orient outer CW / holes CCW
            if g.geom_type == "POLYGON":
                ring_groups = [g.rings]
            else:
                by_poly: dict[int, list] = {}
                for r, pi in zip(g.rings, g.ring_poly):
                    by_poly.setdefault(pi, []).append(r)
                ring_groups = [rs for _, rs in sorted(by_poly.items())]
            for rings in ring_groups:
                for i, r in enumerate(rings):
                    rc = _close(np.asarray(r, dtype=float))
                    area2 = _ring_signed_area2(rc)
                    want_ccw = i > 0  # holes CCW, outer CW
                    if (area2 > 0) != want_ccw:
                        rc = rc[::-1]
                    parts.append(acc)
                    pts_list.append(rc)
                    acc += len(rc)
        else:
            for r in g.rings:
                r = np.asarray(r, dtype=float)
                if len(r) < 2:
                    continue
                parts.append(acc)
                pts_list.append(r)
                acc += len(r)
        pts = np.concatenate(pts_list) if pts_list else np.zeros((0, 2))
        recs.append((parts, pts))

    def rec_bbox(pts):
        if len(pts) == 0:
            return (0.0, 0.0, 0.0, 0.0)
        return (pts[:, 0].min(), pts[:, 1].min(), pts[:, 0].max(), pts[:, 1].max())

    boxes = [rec_bbox(p) for _, p in recs]
    if boxes:
        gbox = (
            min(b[0] for b in boxes), min(b[1] for b in boxes),
            max(b[2] for b in boxes), max(b[3] for b in boxes),
        )
    else:
        gbox = (0.0, 0.0, 0.0, 0.0)

    def header(file_len_words: int) -> bytes:
        return (
            struct.pack(">i20xi", 9994, file_len_words)
            + struct.pack("<ii", 1000, shape_type)
            + struct.pack("<8d", gbox[0], gbox[1], gbox[2], gbox[3], 0, 0, 0, 0)
        )

    content_words = [
        (4 + 32 + 4 + 4 + 4 * len(parts) + 16 * len(pts)) // 2 for parts, pts in recs
    ]
    shp_len = 50 + sum(4 + w for w in content_words)
    shx_len = 50 + len(recs) * 4
    with open(path_base + ".shp", "wb") as shp, open(path_base + ".shx", "wb") as shx:
        shp.write(header(shp_len))
        shx.write(header(shx_len))
        offset = 50
        for i, ((parts, pts), bb, w) in enumerate(zip(recs, boxes, content_words)):
            shp.write(struct.pack(">ii", i + 1, w))
            shp.write(struct.pack("<i4d", shape_type, *bb))
            shp.write(struct.pack("<ii", len(parts), len(pts)))
            shp.write(struct.pack(f"<{len(parts)}i", *parts))
            shp.write(np.ascontiguousarray(pts, dtype="<f8").tobytes())
            shx.write(struct.pack(">ii", offset, w))
            offset += 4 + w
    _dbf_write(path_base, rows, cols, numeric)
    return len(rows)


def read_shapefile_geoms(path_base: str):
    """Minimal polygon/polyline .shp reader (round-trip verification):
    returns (shape_type, [list of (n,2) part arrays] per record)."""
    import numpy as np

    with open(path_base + ".shp", "rb") as f:
        data = f.read()
    (file_words,) = struct.unpack_from(">i", data, 24)
    assert len(data) == file_words * 2, "shp length mismatch"
    (gtype,) = struct.unpack_from("<i", data, 32)
    out = []
    pos = 100
    while pos < len(data):
        _, words = struct.unpack_from(">ii", data, pos)
        shape = struct.unpack_from("<i", data, pos + 8)[0]
        assert shape == gtype
        nparts, npts = struct.unpack_from("<ii", data, pos + 8 + 4 + 32)
        parts = list(struct.unpack_from(f"<{nparts}i", data, pos + 8 + 44))
        arr = np.frombuffer(
            data, dtype="<f8", count=npts * 2, offset=pos + 8 + 44 + 4 * nparts
        ).reshape(-1, 2)
        bounds = parts + [npts]
        out.append([arr[bounds[i]: bounds[i + 1]] for i in range(nparts)])
        pos += 8 + words * 2
    return gtype, out


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
