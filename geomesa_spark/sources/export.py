"""Export sinks (reference: geomesa-tools/.../tools/export/
ExportCommand.scala + formats/*.scala — CSV/TSV, GeoJSON, Avro, Arrow
IPC, Parquet, ORC, BIN).

Spark-first: every tabular format is ``df.write.*``; Arrow export uses
PySpark 4's native ``toArrow()``; GeoJSON is a column expression over
the WKT convention; BIN is the reference's packed 16/24-byte track
record (BinAggregatingScan/BinSorter) written via Arrow batches.
"""

from __future__ import annotations

import struct

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["export", "to_geojson_lines", "bin_records", "pack_bin", "to_arrow_ipc"]


def to_arrow_ipc(
    df: DataFrame,
    path: str,
    sort_by: str | None = None,
    dictionary_cols: tuple[str, ...] = (),
    batch_rows: int = 65536,
) -> int:
    """A11 Arrow export (reference ArrowScan/ArrowExporter, full form:
    geomesa-arrow .../arrow/io/DeltaWriter.scala — SORTED record
    batches with DICTIONARY-encoded attributes whose dictionaries grow
    by DELTAS across batches, merged client-side).

    ``dictionary_cols`` are emitted as int32-indexed dictionary arrays;
    each batch's dictionary is a prefix-superset of the previous one,
    so the IPC stream carries only the NEW values per batch
    (``emit_dictionary_deltas``). ``sort_by`` orders rows before
    batching, giving the reference's sorted-batch layout.

    Driver-side collect funnel like the reference's client-side merge;
    huge exports should use ``export(..., 'parquet')``. Returns rows
    written."""
    import pyarrow as pa
    import pyarrow.ipc as ipc

    if sort_by:
        df = df.orderBy(sort_by)
    table = df.toArrow()
    batches = table.to_batches(max_chunksize=batch_rows) or [
        pa.RecordBatch.from_pylist([], schema=table.schema)
    ]

    if not dictionary_cols:
        with pa.OSFile(path, "wb") as f, ipc.new_file(f, table.schema) as w:
            w.write_table(table)
        return table.num_rows

    # running value->index mappings: batch k's dictionary is batch
    # k-1's plus the values first seen in batch k, so the writer can
    # emit a delta (only the tail) instead of a replacement
    mappings: dict[str, dict] = {c: {} for c in dictionary_cols}

    def encode(batch: "pa.RecordBatch") -> "pa.RecordBatch":
        arrays, fields = [], []
        for i, name in enumerate(batch.schema.names):
            col = batch.column(i)
            if name in mappings:
                m = mappings[name]
                vals = col.to_pylist()
                for v in vals:
                    if v is not None and v not in m:
                        m[v] = len(m)
                idx = pa.array(
                    [None if v is None else m[v] for v in vals], pa.int32()
                )
                arr = pa.DictionaryArray.from_arrays(
                    idx, pa.array(list(m), type=col.type)
                )
                arrays.append(arr)
                fields.append(pa.field(name, arr.type))
            else:
                arrays.append(col)
                fields.append(batch.schema.field(i))
        return pa.RecordBatch.from_arrays(arrays, schema=pa.schema(fields))

    encoded = [encode(b) for b in batches]
    opts = ipc.IpcWriteOptions(emit_dictionary_deltas=True)
    # stream format: the file format's footer assumes one dictionary
    # per id, deltas are a stream-format feature (as in the reference,
    # whose scans return IPC streams the client merges)
    with pa.OSFile(path, "wb") as f, ipc.new_stream(
        f, encoded[0].schema, options=opts
    ) as w:
        for b in encoded:
            w.write_batch(b)
    return table.num_rows


def export(df: DataFrame, path: str, fmt: str = "parquet", mode: str = "overwrite", **options):
    """CSV/TSV/JSON/Parquet/ORC/Avro sink (Avro needs the spark-avro
    jar; absent in this sandbox — gated, not stubbed)."""
    fmt = fmt.lower()
    w = df.write.mode(mode)
    if fmt == "csv":
        return w.option("header", "true").options(**options).csv(path)
    if fmt == "tsv":
        return w.option("header", "true").option("delimiter", "\t").options(**options).csv(path)
    if fmt == "json":
        return w.options(**options).json(path)
    if fmt == "parquet":
        return w.options(**options).parquet(path)
    if fmt == "orc":
        return w.options(**options).orc(path)
    if fmt == "avro":
        return w.format("avro").options(**options).save(path)
    raise ValueError(f"unknown export format: {fmt}")


def to_geojson_lines(df: DataFrame, geom_col: str = "wkt", id_col: str | None = None) -> DataFrame:
    """One GeoJSON Feature per row (properties = all non-geometry
    columns), as a text column ready for ``.write.text`` — pure
    built-ins via to_json."""
    from geomesa_spark.functions.st import st_asGeoJSON

    props = [c for c in df.columns if c != geom_col]
    # geometry splices in as the raw st_asGeoJSON string: coordinates
    # nesting depth differs per geometry type (POINT array<double>,
    # Polygon array<array<array<double>>>, ...), so re-parsing with one
    # fixed from_json schema nulls every non-matching type. String
    # surgery keeps the JSON byte-exact for all six types.
    fields = [
        F.lit("Feature").alias("type"),
        *([F.col(id_col).alias("id")] if id_col else []),
    ]
    if props:
        fields.append(F.struct(*[F.col(c) for c in props]).alias("properties"))
        body = F.to_json(F.struct(*fields))
    else:
        body = F.concat(
            F.regexp_replace(F.to_json(F.struct(*fields)), r"\}$", ""),
            F.lit(',"properties":{}}'),
        )
    feature = F.concat(
        F.regexp_replace(body, r"\}$", ""),
        F.lit(',"geometry":'),
        st_asGeoJSON(F.col(geom_col)),
        F.lit("}"),
    )
    return df.select(feature.alias("geojson"))


def bin_records(
    df: DataFrame,
    track_col: str = "track",
    dtg_col: str = "dtg",
    lon_col: str = "lon",
    lat_col: str = "lat",
    label_col: str | None = None,
) -> DataFrame:
    """A10 BIN projection: (track_hash:int, secs:int, lat:float,
    lon:float[, label:long]) sorted within partitions by time (the
    reference's BinSorter merge order)."""
    cols = [
        # truncate the 64-bit hash into int32 range (ANSI cast would
        # overflow-error; the reference stores a 32-bit track hash)
        (F.xxhash64(F.col(track_col)) % F.lit(2147483648)).cast("int").alias("track_hash"),
        F.unix_timestamp(F.col(dtg_col)).cast("int").alias("secs"),
        F.col(lat_col).cast("float").alias("lat"),
        F.col(lon_col).cast("float").alias("lon"),
    ]
    if label_col:
        cols.append(F.xxhash64(F.col(label_col)).alias("label"))
    return df.select(*cols).sortWithinPartitions("secs")


def pack_bin(df: DataFrame) -> bytes:
    """Pack a BIN projection into the reference's 16-byte little-endian
    records (24 with label), streamed via ``toLocalIterator`` (driver
    memory bounded by one partition plus the output buffer). Large
    exports should write the columnar form (bin_records → parquet)
    instead; this is the byte-compatible tail for tooling parity."""
    with_label = "label" in df.columns
    fmt = "<iiff" + ("q" if with_label else "")
    out = bytearray()
    for r in df.toLocalIterator():
        vals = [r.track_hash, r.secs, r.lat, r.lon] + ([r.label] if with_label else [])
        out += struct.pack(fmt, *vals)
    return bytes(out)
