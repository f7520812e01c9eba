"""Multimodal columns: images/audio/video as opaque ``binary`` columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The Spark-side plumbing — schema contract, partition-preserving batch
iteration, UDF signatures, output shapes — is real and tested.  The
actual codec step is stubbed: this container ships no image/audio
libraries, so ``decode`` raises ``NotImplementedError`` unless
``fake=True``, which produces a *deterministic* synthetic decode from
the bytes themselves (so pipelines and tests exercise the full path).

Schema contract:
    media: struct<data: binary,
                  meta: struct<kind: string, format: string,
                        width: int, height: int, duration_ms: int>>
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType([
    T.StructField("kind", T.StringType()),
    T.StructField("format", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("duration_ms", T.IntegerType()),
])

MEDIA = T.StructType([
    T.StructField("data", T.BinaryType()),
    T.StructField("meta", MEDIA_META),
])


def _fake_pixels(data: bytes, n: int = 16) -> list[int]:
    """Deterministic stand-in for a decoded sample: first n bytes of
    the blob's sha256 — stable across runs/executors."""
    return list(hashlib.sha256(data or b"").digest()[:n])


def decode_image(df: DataFrame, media_col: str = "media", *,
                 fake: bool = False) -> DataFrame:
    """binary image → features struct (mean intensity, sample pixels).

    Real decoders (PIL/opencv) are not in this container; plug one in
    by replacing the body of ``decode`` below.  ``fake=True`` runs the
    full distributed path with the deterministic stub.
    """
    out_schema = T.StructType(
        list(df.schema.fields) + [
            T.StructField("pixels_sample", T.ArrayType(T.IntegerType())),
            T.StructField("mean_intensity", T.DoubleType()),
        ])

    def decode(data: bytes, meta) -> tuple[list[int], float]:
        if not fake:
            raise NotImplementedError(
                "no image codec in this environment; pass fake=True or "
                "plug a decoder (PIL.Image.open(io.BytesIO(data)))")
        px = _fake_pixels(data)
        return px, sum(px) / len(px)

    cols = df.columns

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode(m["data"], m["meta"]) for m in pdf[media_col]]
            pdf = pdf.copy()
            pdf["pixels_sample"] = [f[0] for f in feats]
            pdf["mean_intensity"] = [f[1] for f in feats]
            yield pdf[cols + ["pixels_sample", "mean_intensity"]]

    return df.mapInPandas(run, out_schema)


def resize_image(df: DataFrame, width: int, height: int,
                 media_col: str = "media", *, fake: bool = False) -> DataFrame:
    """Resize: binary → binary with updated meta.  Stub keeps bytes,
    rewrites meta (the schema/partitioning contract is the point)."""
    if not fake:
        raise NotImplementedError("no image codec; pass fake=True")
    return df.withColumn(
        media_col,
        F.struct(
            F.col(f"{media_col}.data").alias("data"),
            F.struct(
                F.col(f"{media_col}.meta.kind").alias("kind"),
                F.col(f"{media_col}.meta.format").alias("format"),
                F.lit(width).alias("width"),
                F.lit(height).alias("height"),
                F.col(f"{media_col}.meta.duration_ms").alias("duration_ms"),
            ).alias("meta")))


def sample_frames(df: DataFrame, every_ms: int,
                  media_col: str = "media", *, fake: bool = False) -> DataFrame:
    """Video frame sampling: one output row per sampled frame
    (explode), each row a frame media struct + frame_ts_ms.

    Stub frames are deterministic byte slices; a real implementation
    replaces the frame extraction only — the explode/partition shape
    is identical."""
    if not fake:
        raise NotImplementedError("no video codec; pass fake=True")
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField("frame_ts_ms", T.IntegerType()),
                                  T.StructField("frame", T.BinaryType())])
    cols = df.columns

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                m = r[media_col]
                dur = (m["meta"]["duration_ms"] or 0)
                data = m["data"] or b""
                for ts in range(0, max(dur, 1), every_ms):
                    lo = (ts * 7) % max(len(data), 1)
                    rows.append({**{c: r[c] for c in cols},
                                 "frame_ts_ms": ts,
                                 "frame": bytes(data[lo:lo + 16])})
            yield pd.DataFrame(rows, columns=cols + ["frame_ts_ms", "frame"])

    return df.mapInPandas(run, out_schema)


def make_media(data_col: str, kind: str, fmt: str,
               width=None, height=None, duration_ms=None):
    """Column helper: wrap a binary column into the media struct."""
    return F.struct(
        F.col(data_col).alias("data"),
        F.struct(F.lit(kind).alias("kind"), F.lit(fmt).alias("format"),
                 F.lit(width).cast("int").alias("width"),
                 F.lit(height).cast("int").alias("height"),
                 F.lit(duration_ms).cast("int").alias("duration_ms")).alias("meta"))
