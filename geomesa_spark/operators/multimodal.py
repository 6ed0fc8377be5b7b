"""Multimodal columns: image/audio/video payloads as opaque binary with
typed metadata, processed via Arrow-batched kernels.

The interleaved document spans carry ``media_ref`` URIs for kinds
image/audio (tables.py F1). This module gives them the treatment a
training-data pipeline needs: reference extraction → binary load →
decode → feature extraction / resize / frame sampling — all as
``mapInPandas`` stages with explicit schemas and partition-preserving
shape (no shuffle; media work is embarrassingly parallel per row).

Environment note: no image/audio codecs ship in this sandbox, so the
DECODE step is stubbed — ``decode=fake`` (default) derives a
deterministic payload from the ref's md5 so every downstream kernel is
real, tested compute; ``decode=strict`` raises NotImplementedError at
the exact seam where PIL/libav would plug in. The Spark-side plumbing
(schemas, batch iteration, binary columns, partitioning) is the real
design and is what the tests cover.

Scale design: media bytes NEVER pass through a shuffle — load/decode/
featurize fuse into one stage over the span-exploded partitioning;
only the small typed feature rows (hash, dims, embedding) continue to
joins/aggregations. At 100 TB the fetch step is the I/O bound; the
``fetch`` callable is per-batch so an object-store client can pipeline
range reads.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "extract_media_refs",
    "load_media",
    "decode_image",
    "image_features",
    "sample_frames",
]

_MEDIA_KINDS = ("image", "audio", "video")


def extract_media_refs(docs: DataFrame) -> DataFrame:
    """documents → (doc_id, span_offset, kind, media_ref); spans column
    untouched (span-sequence invariant)."""
    s = docs.select("doc_id", F.explode("spans").alias("s"))
    return (
        s.where(F.col("s.kind").isin(*_MEDIA_KINDS))
        .select(
            "doc_id",
            F.col("s.offset").alias("span_offset"),
            F.col("s.kind").alias("kind"),
            F.col("s.media_ref").alias("media_ref"),
        )
    )


def _fake_bytes(ref: str, size: int = 256) -> bytes:
    """Deterministic stand-in payload: md5-keyed byte stream."""
    seed = hashlib.md5(ref.encode()).digest()
    reps = size // len(seed) + 1
    return (seed * reps)[:size]


def load_media(df: DataFrame, fetch=None, ref_col: str = "media_ref") -> DataFrame:
    """Attach the binary payload column.

    ``fetch(refs: list[str]) -> list[bytes|None]`` is the pluggable
    object-store reader, called once per Arrow batch; default is the
    deterministic fake.
    """
    from pyspark.sql import types as T

    # build a NEW StructType: StructType.add mutates the shared instance
    schema = T.StructType(df.schema.fields + [T.StructField("media_bytes", T.BinaryType())])
    cols = [f.name for f in df.schema.fields]

    def _load(batches):
        f = fetch or (lambda refs: [_fake_bytes(r) for r in refs])
        for pdf in batches:
            pdf = pdf.copy()
            pdf["media_bytes"] = f(list(pdf[ref_col]))
            yield pdf[cols + ["media_bytes"]]

    return df.mapInPandas(_load, schema=schema)


def decode_image(df: DataFrame, mode: str = "fake", bytes_col: str = "media_bytes") -> DataFrame:
    """Decode → (width, height, channels, pixels:binary).

    mode='fake': dims derived from the payload hash, pixels = payload
    tiled to w*h*c (deterministic, real bytes for downstream kernels).
    mode='strict': NotImplementedError at the codec seam (this sandbox
    ships no PIL/libjpeg; plug the real decoder here).
    """
    from pyspark.sql import types as T

    schema = T.StructType(
        df.schema.fields
        + [T.StructField("width", T.IntegerType()), T.StructField("height", T.IntegerType()),
           T.StructField("channels", T.IntegerType()), T.StructField("pixels", T.BinaryType())]
    )
    cols = [f.name for f in df.schema.fields]

    def _decode(batches):
        for pdf in batches:
            if mode == "strict":
                raise NotImplementedError(
                    "image codec not available in this environment; "
                    "plug PIL/libav into decode_image(mode=...)"
                )
            pdf = pdf.copy()
            ws, hs, cs, px = [], [], [], []
            for b in pdf[bytes_col]:
                if b is None:
                    ws.append(None), hs.append(None), cs.append(None), px.append(None)
                    continue
                w = 8 + b[0] % 24
                h = 8 + b[1] % 24
                c = 3
                need = w * h * c
                reps = need // len(b) + 1
                ws.append(w), hs.append(h), cs.append(c)
                px.append((bytes(b) * reps)[:need])
            pdf["width"], pdf["height"], pdf["channels"], pdf["pixels"] = ws, hs, cs, px
            yield pdf[cols + ["width", "height", "channels", "pixels"]]

    return df.mapInPandas(_decode, schema=schema)


def image_features(df: DataFrame, pixels_col: str = "pixels") -> DataFrame:
    """Ragged-batch feature extraction over decoded pixel buffers:
    per-channel means + a 64-bit difference-hash (phash-style).
    Output adds (mean_r, mean_g, mean_b, dhash).

    The kernel is batch-vectorized despite variable image sizes:

    - channel means: ONE concatenation of every buffer in the Arrow
      batch → ``np.add.reduceat`` at the per-image boundaries over the
      ``(N_pixels, 3)`` view — no per-image Python.
    - dhash: images grouped by (h, w) shape; each same-shape group
      stacks into a 4-D block and hashes in one vectorized comparison
      (fake-decoded dims span ~576 shapes, real pipelines resize to a
      handful, so groups are large).
    """
    from pyspark.sql import types as T

    schema = T.StructType(
        df.schema.fields
        + [T.StructField("mean_r", T.DoubleType()), T.StructField("mean_g", T.DoubleType()),
           T.StructField("mean_b", T.DoubleType()), T.StructField("dhash", T.LongType())]
    )
    cols = [f.name for f in df.schema.fields]
    pow2 = 1 << np.arange(64, dtype=np.uint64)

    def _feat(batches):
        for pdf in batches:
            pdf = pdf.copy()
            n = len(pdf)
            px = pdf[pixels_col].to_numpy()
            wv = pdf["width"].to_numpy()
            hv = pdf["height"].to_numpy()
            mr = np.full(n, np.nan)
            mg = np.full(n, np.nan)
            mb = np.full(n, np.nan)
            dh = np.full(n, None, dtype=object)
            valid = np.array([p is not None for p in px], dtype=bool)
            vidx = np.nonzero(valid)[0]
            if len(vidx):
                bufs = [np.frombuffer(px[i], dtype=np.uint8) for i in vidx]
                lens = np.array([b.size for b in bufs], dtype=np.int64)
                flat3 = np.concatenate(bufs).reshape(-1, 3)
                bounds = np.concatenate([[0], np.cumsum(lens)[:-1]]) // 3
                sums = np.add.reduceat(flat3.astype(np.int64), bounds, axis=0)
                npx = (lens // 3).astype(np.float64)
                mr[vidx] = sums[:, 0] / npx
                mg[vidx] = sums[:, 1] / npx
                mb[vidx] = sums[:, 2] / npx

                shapes = {}
                for j, i in enumerate(vidx):
                    shapes.setdefault((int(hv[i]), int(wv[i])), []).append((i, j))
                for (h, w), members in shapes.items():
                    idx = [i for i, _ in members]
                    stack = np.stack(
                        [bufs[j].reshape(h, w, 3) for _, j in members]
                    )
                    g = stack.mean(axis=3)
                    rows = np.linspace(0, h - 1, 8).astype(int)
                    colsi = np.linspace(0, w - 1, 9).astype(int)
                    small = g[:, rows][:, :, colsi]
                    bits = (small[:, :, 1:] > small[:, :, :-1]).reshape(len(idx), 64)
                    vals = bits.dot(pow2).astype(np.int64)
                    for i, v in zip(idx, vals):
                        dh[i] = int(v)
            pdf["mean_r"] = [None if not valid[i] else float(mr[i]) for i in range(n)]
            pdf["mean_g"] = [None if not valid[i] else float(mg[i]) for i in range(n)]
            pdf["mean_b"] = [None if not valid[i] else float(mb[i]) for i in range(n)]
            pdf["dhash"] = dh
            yield pdf[cols + ["mean_r", "mean_g", "mean_b", "dhash"]]

    return df.mapInPandas(_feat, schema=schema)


def sample_frames(df: DataFrame, every_n: int = 10, n_frames_col: str | None = None) -> DataFrame:
    """Video frame sampling plan: explode each media row into frame
    offsets (built-ins — the decode of each sampled frame then goes
    through decode_image). Fake frame count derives from the ref hash
    when no metadata column exists."""
    if n_frames_col is None:
        n = (F.pmod(F.xxhash64("media_ref"), F.lit(90)) + F.lit(10)).cast("int")
    else:
        n = F.col(n_frames_col)
    return df.withColumn(
        "frame_idx",
        F.explode(F.sequence(F.lit(0), n - 1, F.lit(every_n))),
    )
