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
            # content is a nullable BINARY column: NULL blobs yield NULL
            # features, not a bytes(None) TypeError that aborts the task
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "sha256": content.map(
                        lambda b: None if b is None else hashlib.sha256(bytes(b)).hexdigest()
                    ),
                    "n_bytes": content.map(
                        lambda b: None if b is None else len(b)
                    ).astype("Int64"),
                    # sum/len of integer bytes → one exact double division
                    "byte_mean": content.map(
                        lambda b: None if b is None else (sum(b) / len(b) if len(b) else 0.0)
                    ),
                }
            )

    return media.mapInPandas(batches, FEATURE_SCHEMA)


DECODE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mode", T.StringType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)

RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("meta", T.StructType([
            T.StructField("mime", T.StringType()),
            T.StructField("n_bytes", T.LongType()),
        ])),
    ]
)


def decode_image(media: DataFrame, *, use_fake_codec: bool = False) -> DataFrame:
    """Image decode. The CODEC is stubbed (no PIL/opencv in this
    container): the default raises; ``use_fake_codec=True`` runs the REAL
    mapInPandas plumbing — Arrow batches, fixed output schema — with a
    deterministic fake that derives (width, height, mode) from the blob's
    sha256. A real deployment swaps only the per-blob body for
    ``PIL.Image.open``; schema, batching, and partitioning stay as
    tested here."""
    if not use_fake_codec:
        raise NotImplementedError(
            "image decode requires PIL/opencv; not installed in this environment. "
            "Re-run with use_fake_codec=True for the deterministic-fake plumbing. "
            "Contract: mapInPandas(media) -> media_id, width INT, height INT, mode STRING"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            digests = pdf["content"].map(
                lambda b: None if b is None else hashlib.sha256(bytes(b)).digest()
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": digests.map(
                        lambda d: None if d is None else 1 + d[0] % 64
                    ).astype("Int32"),
                    "height": digests.map(
                        lambda d: None if d is None else 1 + d[1] % 64
                    ).astype("Int32"),
                    "mode": digests.map(
                        lambda d: None if d is None else ("RGB" if d[2] % 2 else "L")
                    ),
                }
            )

    return media.mapInPandas(batches, DECODE_SCHEMA)


def sample_video_frames(
    media: DataFrame, every_n: int = 30, *, use_fake_codec: bool = False
) -> DataFrame:
    """Video frame sampling — the ROW-EXPANDING mapInPandas shape (one
    input blob → N frame rows). The codec is stubbed (no ffmpeg); the
    fake emits one "frame" per ``every_n`` bytes of content as a
    deterministic slice, exercising the fan-out plumbing a real ffmpeg
    pipe would use."""
    if every_n < 1:
        raise ValueError(f"sample_video_frames: every_n must be >= 1, got {every_n}")
    if not use_fake_codec:
        raise NotImplementedError(
            "video frame sampling requires ffmpeg; not installed in this environment. "
            "Re-run with use_fake_codec=True for the deterministic-fake plumbing. "
            "Contract: mapInPandas(media) -> media_id, frame_idx INT, frame BINARY"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, frames = [], [], []
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                if blob is None:
                    continue  # NULL blob: no frames
                b = bytes(blob)
                for i, off in enumerate(range(0, len(b), every_n)):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(b[off : off + every_n])
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame": pd.Series(frames, dtype=object),
                }
            )

    return media.mapInPandas(batches, FRAME_SCHEMA)


def resize_images(
    media: DataFrame, target_bytes: int = 64, *, use_fake_codec: bool = False
) -> DataFrame:
    """Image resize — blob-in/blob-out mapInPandas (same media schema
    out, so resize stages compose/chain). The codec is stubbed; the fake
    "resizes" by deterministic truncation/zero-padding of the blob to
    ``target_bytes``, preserving the metadata contract (n_bytes updated,
    mime tagged)."""
    if not use_fake_codec:
        raise NotImplementedError(
            "image resize requires PIL/opencv; not installed in this environment. "
            "Re-run with use_fake_codec=True for the deterministic-fake plumbing. "
            "Contract: mapInPandas(media) -> media_id, content BINARY, meta STRUCT"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            resized = pdf["content"].map(
                lambda b: None
                if b is None
                else bytes(b)[:target_bytes].ljust(target_bytes, b"\0")
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "content": resized,
                    "meta": [
                        {"mime": "image/fake-resized", "n_bytes": target_bytes}
                        for _ in range(len(pdf))
                    ],
                }
            )

    return media.mapInPandas(batches, RESIZE_SCHEMA)
