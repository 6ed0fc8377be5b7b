"""Shapefile export sink (reference: geomesa-tools ShapefileExporter,
which delegates to GeoTools' ShapefileDataStore).

No GeoTools here, so the engine writes the PUBLIC ESRI shapefile format
(ESRI Shapefile Technical Description, 1998) directly: .shp geometry
records + .shx offset index + dBase III .dbf attribute table. Shape
types: POINT (1) via write_shapefile, POLYLINE (3) and POLYGON (5) via
write_shapefile_geoms from a WKT column — outer rings clockwise, holes
counter-clockwise per the spec.

The sink is driver-WRITTEN (a shapefile is a single seekable file
triple) but not driver-BUFFERED: rows stream through
``df.toLocalIterator()`` one partition at a time, each record is
emitted to .shp/.shx/.dbf as it arrives, and the headers that need
totals (file lengths, global bbox, dBase record count) are patched by
seeking back once the stream is drained. Driver memory is bounded by
one partition, not the layer size. Bulk data still belongs in columnar
sinks; this is the tool-compatibility funnel.
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

_NUMERIC_TYPES = ("integer", "long", "double", "float", "short", "decimal")


class _DbfStream:
    """dBase III writer with a patch-back record count."""

    def __init__(self, path_base: str, cols, numeric: set):
        self.cols = cols
        self.fields = []
        for c in cols:
            if c in numeric:
                self.fields.append((c[:10], b"N", 18, 6))
            else:
                self.fields.append((c[:10], b"C", 64, 0))
        rec_len = 1 + sum(f[2] for f in self.fields)
        hdr_len = 32 + 32 * len(self.fields) + 1
        self.f = open(path_base + ".dbf", "wb")
        # record count 0 for now — patched in close()
        self.f.write(struct.pack("<4BIHH20x", 3, 24, 1, 1, 0, hdr_len, rec_len))
        for name, typ, size, dec in self.fields:
            self.f.write(
                struct.pack("<11s1sIBB14x", name.encode("ascii"), typ, 0, size, dec)
            )
        self.f.write(b"\x0d")
        self.n = 0

    def write(self, r) -> None:
        self.f.write(b" ")  # not deleted
        for (name, typ, size, dec), c in zip(self.fields, self.cols):
            v = r[c]
            if typ == b"N":
                s = ("" if v is None else f"{float(v):.{dec}f}").rjust(size)[:size]
            else:
                s = ("" if v is None else str(v)).ljust(size)[:size]
            self.f.write(s.encode("utf-8", "replace")[:size].ljust(size))
        self.n += 1

    def close(self) -> None:
        self.f.write(b"\x1a")
        self.f.seek(4)
        self.f.write(struct.pack("<I", self.n))
        self.f.close()

    def abort(self) -> None:
        self.f.close()


def _main_header(file_len_words: int, shape_type: int, bbox) -> bytes:
    return (
        struct.pack(">i20xi", 9994, file_len_words)  # code, 20 unused, length
        + struct.pack("<ii", 1000, shape_type)  # version, shape type
        + struct.pack("<8d", bbox[0], bbox[1], bbox[2], bbox[3], 0, 0, 0, 0)
    )


def _abort_triple(path_base: str, shp, shx, dbf) -> None:
    """Close whatever opened and remove the partial .shp/.shx/.dbf."""
    for h in (shp, shx):
        if h is not None:
            try:
                h.close()
            except OSError:
                pass
    if dbf is not None:
        dbf.abort()
    for ext in (".shp", ".shx", ".dbf"):
        try:
            os.remove(path_base + ext)
        except OSError:
            pass


def write_shapefile(
    df: DataFrame,
    path_base: str,
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> int:
    """Write ``path_base``.shp/.shx/.dbf from a DataFrame of points,
    streamed via ``toLocalIterator`` (bounded driver memory). All
    non-coordinate columns become dBase attributes (numerics → N 18.6,
    everything else → C 64). Returns the record count."""
    cols = [c for c in df.columns if c not in (lon_col, lat_col)]
    numeric = {f.name for f in df.schema.fields if f.dataType.typeName() in _NUMERIC_TYPES}

    rec_words = (8 + 20) // 2  # record header + point content, in 16-bit words
    placeholder = _main_header(0, 1, (0.0, 0.0, 0.0, 0.0))
    bbox = [float("inf"), float("inf"), float("-inf"), float("-inf")]
    n, offset = 0, 50

    dbf = shp = shx = None
    try:
        dbf = _DbfStream(path_base, cols, numeric)
        shp = open(path_base + ".shp", "wb")
        shx = open(path_base + ".shx", "wb")
        shp.write(placeholder)
        shx.write(placeholder)
        for r in df.toLocalIterator():
            x, y = float(r[lon_col]), float(r[lat_col])
            bbox[0] = min(bbox[0], x)
            bbox[1] = min(bbox[1], y)
            bbox[2] = max(bbox[2], x)
            bbox[3] = max(bbox[3], y)
            shp.write(struct.pack(">ii", n + 1, 10))  # number, content words
            shp.write(struct.pack("<idd", 1, x, y))
            shx.write(struct.pack(">ii", offset, 10))
            offset += rec_words
            dbf.write(r)
            n += 1
        if n == 0:
            bbox = [0.0, 0.0, 0.0, 0.0]
        shp.seek(0)
        shp.write(_main_header(50 + n * rec_words, 1, bbox))
        shx.seek(0)
        shx.write(_main_header(50 + n * 4, 1, bbox))
    except BaseException:
        # a mid-stream failure — including KeyboardInterrupt during a
        # long toLocalIterator drive, or a failed second open — must not
        # leave a corrupt triple with zeroed placeholder headers behind
        _abort_triple(path_base, shp, shx, dbf)
        raise
    shp.close()
    shx.close()
    dbf.close()
    return n


def _geom_record(g, polygonal: bool):
    """(parts offsets, concatenated points) for one geometry, rings
    oriented per the spec (outer CW, holes CCW)."""
    import numpy as np

    from geomesa_spark.geom import _close, _ring_signed_area2

    pts_list, parts, acc = [], [], 0
    if polygonal:
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
    return parts, pts


def write_shapefile_geoms(
    df: DataFrame, path_base: str, wkt_col: str = "wkt"
) -> int:
    """Write POLYGON (shape type 5) or POLYLINE (shape type 3) records
    from a WKT column (reference ExportCommand exports any geometry via
    GeoTools; here the two extended types the spec defines for 2-D
    paths/rings). The layer must be homogeneous — a shapefile holds ONE
    shape type; a mixed layer aborts the export and removes the partial
    files. Ring order follows the public spec: outer rings CLOCKWISE
    (negative shoelace area), holes counter-clockwise; input ring order
    is normalized on write. Rows stream via ``toLocalIterator`` —
    driver-written, not driver-buffered."""
    import numpy as np

    from geomesa_spark.geom import parse_wkt

    cols = [c for c in df.columns if c != wkt_col]
    numeric = {f.name for f in df.schema.fields if f.dataType.typeName() in _NUMERIC_TYPES}

    placeholder = _main_header(0, 0, (0.0, 0.0, 0.0, 0.0))
    gbox = [float("inf"), float("inf"), float("-inf"), float("-inf")]
    n, offset, words_total = 0, 50, 0
    polygonal: bool | None = None
    shape_type = 0

    dbf = shp = shx = None
    try:
        dbf = _DbfStream(path_base, cols, numeric)
        shp = open(path_base + ".shp", "wb")
        shx = open(path_base + ".shx", "wb")
        shp.write(placeholder)
        shx.write(placeholder)
        for r in df.toLocalIterator():
            g = parse_wkt(r[wkt_col])
            base = g.geom_type.replace("MULTI", "")
            if base not in ("POLYGON", "LINESTRING"):
                raise ValueError(
                    f"write_shapefile_geoms: unsupported type {g.geom_type}"
                )
            if polygonal is None:
                polygonal = base == "POLYGON"
                shape_type = 5 if polygonal else 3
            elif (base == "POLYGON") != polygonal:
                raise ValueError(
                    "write_shapefile_geoms: mixed geometry types in layer"
                )
            parts, pts = _geom_record(g, polygonal)
            if len(pts):
                bb = (pts[:, 0].min(), pts[:, 1].min(), pts[:, 0].max(), pts[:, 1].max())
            else:
                bb = (0.0, 0.0, 0.0, 0.0)
            gbox[0] = min(gbox[0], bb[0])
            gbox[1] = min(gbox[1], bb[1])
            gbox[2] = max(gbox[2], bb[2])
            gbox[3] = max(gbox[3], bb[3])
            w = (4 + 32 + 4 + 4 + 4 * len(parts) + 16 * len(pts)) // 2
            shp.write(struct.pack(">ii", n + 1, w))
            shp.write(struct.pack("<i4d", shape_type, *bb))
            shp.write(struct.pack("<ii", len(parts), len(pts)))
            shp.write(struct.pack(f"<{len(parts)}i", *parts))
            shp.write(np.ascontiguousarray(pts, dtype="<f8").tobytes())
            shx.write(struct.pack(">ii", offset, w))
            offset += 4 + w
            words_total += 4 + w
            dbf.write(r)
            n += 1
        if n == 0:
            gbox = [0.0, 0.0, 0.0, 0.0]
        shp.seek(0)
        shp.write(_main_header(50 + words_total, shape_type, gbox))
        shx.seek(0)
        shx.write(_main_header(50 + n * 4, shape_type, gbox))
    except BaseException:
        _abort_triple(path_base, shp, shx, dbf)
        raise
    shp.close()
    shx.close()
    dbf.close()
    return n


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
