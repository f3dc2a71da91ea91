"""Multimodal (image/audio/video) column handling (BASELINE.json north star).

Design: media are opaque ``BinaryType`` columns + a typed metadata struct,
exactly how large training pipelines store them in parquet. The
decode/feature stages run as Arrow-batched ``mapInPandas`` — the Spark
plumbing (schemas, batch iteration, partitioning) is real and tested; the
actual codec calls are stubbed (this container has no PIL/ffmpeg) behind
clearly-marked ``NotImplementedError`` raises with a deterministic fake
used by tests and the corpus query.

At 100 TB: binary blobs ride the same parquet row groups as their
metadata; decode stages are narrow mapInPandas passes (no shuffle) sized
by ``spark.sql.files.maxPartitionBytes``; feature outputs are small
columns, so downstream shuffles never move raw media bytes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("meta", T.StructType([
            T.StructField("mime", T.StringType()),
            T.StructField("n_bytes", T.LongType()),
        ])),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("sha256", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("byte_mean", T.DoubleType()),
    ]
)


def documents_as_media(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Build a media-typed table from the documents fixture: utf-8 bytes as
    the opaque blob + typed metadata. Stands in for real image/audio blobs
    so the binary-column plumbing is exercised end-to-end."""
    content = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col).alias("media_id"),
        content.alias("content"),
        F.struct(
            F.lit("text/plain;fake-media").alias("mime"),
            F.octet_length(content).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary content (mapInPandas).

    Deterministic features: sha256, byte length, integer-exact byte mean.
    This is the stage where a real pipeline decodes pixels / PCM — swap
    the body, keep the plumbing."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            content = pdf["content"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "sha256": content.map(lambda b: hashlib.sha256(bytes(b)).hexdigest()),
                    "n_bytes": content.map(len).astype("int64"),
                    # sum/len of integer bytes → one exact double division
                    "byte_mean": content.map(lambda b: sum(b) / len(b) if len(b) else 0.0),
                }
            )

    return media.mapInPandas(batches, FEATURE_SCHEMA)


def decode_image(media: DataFrame) -> DataFrame:
    """STUB — image decode (PIL not available in this container).

    Real implementation: mapInPandas batch -> PIL.Image.open per blob ->
    (width, height, mode, pixel array). The schema and batch shape are
    fixed here so downstream code is written against the real contract.
    """
    raise NotImplementedError(
        "image decode requires PIL/opencv; not installed in this environment. "
        "Plumbing contract: mapInPandas(media) -> media_id, width INT, height INT, mode STRING"
    )


def sample_video_frames(media: DataFrame, every_n: int = 30) -> DataFrame:
    """STUB — video frame sampling (ffmpeg not available in this container).

    Real implementation: mapInPandas batch -> ffmpeg pipe per blob ->
    one row per sampled frame (media_id, frame_idx, frame_blob).
    """
    raise NotImplementedError(
        "video frame sampling requires ffmpeg; not installed in this environment. "
        "Plumbing contract: mapInPandas(media) -> media_id, frame_idx INT, frame BINARY"
    )
