"""Multimodal (image/audio/video) column handling (BASELINE.json north star).

Design: media are opaque ``BinaryType`` columns + a typed metadata struct,
exactly how large training pipelines store them in parquet. The
decode/feature stages run as Arrow-batched ``mapInPandas``. Image DECODE
(dimensions + color mode from PNG/GIF/BMP/JPEG headers) is real,
pure-stdlib ``struct`` parsing — no PIL needed. PNG, GIF and JPEG pixel
decode and resize are ALSO real (``io.png.decode_png_pixels``: zlib
inflate + all five scanline filters; ``io.gif.decode_gif_pixels``:
from-scratch LZW incl. interlace; ``io.jpeg.decode_jpeg_pixels``:
from-scratch baseline Huffman + dequant + IDCT incl. chroma subsampling
and restart markers; exact-integer box resample; RGB re-encode — oracled
end-to-end in `media_resize_checksum` / `media_gif_resize_checksum` /
`media_jpeg_resize_checksum`). Video frame sampling is REAL for Y4M and
MJPEG-in-AVI (``io/video.py``: raw-YUV parse; RIFF walk + per-frame JPEG
decode — oracled in `media_video_frame_checksum`); inter-frame codecs
(H.264/VP9/AV1) still need ffmpeg and yield zero frames, with the
byte-slice fake kept behind ``use_fake_codec=True`` for plumbing tests.

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


_PNG_MODES = {0: "L", 2: "RGB", 3: "P", 4: "LA", 6: "RGBA"}
_BMP_MODES = {1: "1", 8: "L", 24: "RGB", 32: "RGBA"}
_JPEG_MODES = {1: "L", 3: "RGB", 4: "CMYK"}


def image_dimensions(b: bytes) -> tuple[int, int, str] | None:
    """(width, height, mode) from an image header — pure-stdlib ``struct``
    parsing of the four formats a header alone fully determines:

    - PNG (RFC 2083): IHDR is always the first chunk — width/height as
      big-endian u32 at bytes 16..24, color type at byte 25;
    - GIF (87a/89a): logical screen descriptor — little-endian u16 at 6..10;
    - BMP (BITMAPINFOHEADER): little-endian i32 at 18/22 (height may be
      negative for top-down rows), bit depth at 28;
    - JPEG (ISO/IEC 10918): walk the marker segments to the first start-
      of-frame (0xC0–0xCF excluding DHT/DAC 0xC4/0xC8/0xCC); height/width
      are big-endian u16 at SOF payload bytes 1..5, component count at 5.

    Returns None for anything unrecognized or truncated — the caller maps
    that to NULL columns, never a task failure."""
    import struct

    try:
        if b[:8] == b"\x89PNG\r\n\x1a\n" and b[12:16] == b"IHDR":
            w, h = struct.unpack(">II", b[16:24])
            return w, h, _PNG_MODES.get(b[25], "unknown")
        if b[:6] in (b"GIF87a", b"GIF89a"):
            w, h = struct.unpack("<HH", b[6:10])
            return w, h, "P"  # GIF is always palette-based
        if b[:2] == b"BM" and len(b) >= 30:
            w, h = struct.unpack("<ii", b[18:26])
            (bpp,) = struct.unpack("<H", b[28:30])
            return w, abs(h), _BMP_MODES.get(bpp, "unknown")
        if b[:2] == b"\xff\xd8":  # JPEG SOI
            i = 2
            while i + 9 <= len(b):
                if b[i] != 0xFF:
                    return None  # lost marker sync
                marker = b[i + 1]
                if marker == 0xD8 or 0xD0 <= marker <= 0xD7:  # standalone
                    i += 2
                    continue
                (seg_len,) = struct.unpack(">H", b[i + 2 : i + 4])
                if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                    h, w = struct.unpack(">HH", b[i + 5 : i + 9])
                    ncomp = b[i + 9]
                    return w, h, _JPEG_MODES.get(ncomp, "unknown")
                i += 2 + seg_len
        return None
    except (struct.error, IndexError):
        return None


def decode_image(media: DataFrame, *, use_fake_codec: bool = False) -> DataFrame:
    """Image decode to (width, height, mode), real by default: a
    mapInPandas stage parsing PNG/GIF/BMP/JPEG headers with pure-stdlib
    ``struct`` (``image_dimensions``) — no PIL/opencv needed for the
    dimensions a training pipeline filters and buckets on. Unrecognized
    or truncated blobs yield NULL columns, not task failures.

    Full PIXEL decode still needs a codec library; a real deployment
    swaps the per-blob body for ``PIL.Image.open`` keeping this schema,
    batching, and partitioning. ``use_fake_codec=True`` preserves the
    earlier deterministic sha256-derived fake (plumbing tests that need
    nonzero dims for arbitrary non-image blobs)."""
    if not use_fake_codec:

        def header_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in it:
                dims = pdf["content"].map(
                    lambda b: None if b is None else image_dimensions(bytes(b))
                )
                yield pd.DataFrame(
                    {
                        "media_id": pdf["media_id"],
                        "width": dims.map(lambda d: None if d is None else d[0]).astype("Int32"),
                        "height": dims.map(lambda d: None if d is None else d[1]).astype("Int32"),
                        "mode": dims.map(lambda d: None if d is None else d[2]),
                    }
                )

        return media.mapInPandas(header_batches, DECODE_SCHEMA)

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
    input blob → N frame rows).

    REAL by default for the two containers decodable without ffmpeg
    (``io/video.py``): Y4M (raw planar YUV) and AVI carrying an MJPG
    stream (every frame a baseline JPEG through ``io/jpeg.py``). Every
    ``every_n``-th source frame (0, n, 2n, …) is emitted as an RGB PNG;
    ``frame_idx`` is the sampled ordinal. Blobs in neither container —
    including AVIs whose frames are an inter-frame codec like H.264 —
    yield ZERO rows (filter-don't-fail, same contract as the image
    decode stages); a real deployment adds an ffmpeg branch for those
    keeping this schema, batching, and partitioning.

    ``use_fake_codec=True`` keeps the deterministic byte-slice fake (one
    "frame" per ``every_n`` bytes of arbitrary blobs) for plumbing tests
    over non-video content."""
    if every_n < 1:
        raise ValueError(f"sample_video_frames: every_n must be >= 1, got {every_n}")
    if not use_fake_codec:
        import numpy as np

        from etl_demo_spark.io.png import png_bytes
        from etl_demo_spark.io.video import decode_video_frames

        def real_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in it:
                ids, idxs, frames = [], [], []
                for mid, blob in zip(pdf["media_id"], pdf["content"]):
                    if blob is None:
                        continue
                    decoded = decode_video_frames(bytes(blob))
                    if decoded is None:
                        continue
                    for i, src in enumerate(range(0, len(decoded), every_n)):
                        px = decoded[src]
                        if px.shape[2] == 1:
                            px = np.repeat(px, 3, axis=2)
                        ids.append(mid)
                        idxs.append(i)
                        frames.append(png_bytes(px))
                yield pd.DataFrame(
                    {
                        "media_id": pd.Series(ids, dtype="int64"),
                        "frame_idx": pd.Series(idxs, dtype="int32"),
                        "frame": pd.Series(frames, dtype=object),
                    }
                )

        return media.mapInPandas(real_batches, FRAME_SCHEMA)

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
    media: DataFrame,
    target_bytes: int = 64,
    *,
    width: int = 8,
    height: int = 8,
    use_fake_codec: bool = False,
) -> DataFrame:
    """Image resize — blob-in/blob-out mapInPandas (same media schema
    out, so resize stages compose/chain).

    REAL by default for PNG and GIF: full pixel decode
    (``io.png.decode_png_pixels`` — zlib inflate + all five scanline
    filters; ``io.gif.decode_gif_pixels`` — real LZW incl. interlace and
    local color tables), exact-integer box resample to (``height``,
    ``width``), re-encode as RGB PNG (grayscale/RGBA are
    expanded/flattened to RGB first; GIF palettes resolve to RGB; JPEG
    decodes through the from-scratch baseline codec — Huffman + dequant
    + IDCT, 4:4:4/4:2:2/4:2:0, restart markers, ``io/jpeg.py``). Blobs
    that decode under none of the three codecs yield NULL content with
    mime ``image/unsupported`` — the filter-don't-fail contract every
    decode stage here follows.

    ``use_fake_codec=True`` keeps the earlier deterministic
    truncation/zero-padding fake to ``target_bytes`` (plumbing tests over
    arbitrary non-image blobs)."""
    if not use_fake_codec:
        import numpy as np

        from etl_demo_spark.io.gif import decode_gif_pixels
        from etl_demo_spark.io.jpeg import decode_jpeg_pixels
        from etl_demo_spark.io.png import box_resize, decode_png_pixels, png_bytes

        def real_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            def one(b):
                if b is None:
                    return None
                px = decode_png_pixels(bytes(b))
                if px is None:
                    px = decode_gif_pixels(bytes(b))  # (H, W, 3) already
                if px is None:
                    px = decode_jpeg_pixels(bytes(b))  # (H, W, 1|3)
                if px is None:
                    return None
                if px.shape[2] == 1:  # grayscale → RGB
                    px = np.repeat(px, 3, axis=2)
                elif px.shape[2] == 4:  # RGBA → RGB (alpha dropped)
                    px = px[:, :, :3]
                return png_bytes(box_resize(px, height, width))

            for pdf in it:
                resized = pdf["content"].map(one)
                yield pd.DataFrame(
                    {
                        "media_id": pdf["media_id"],
                        "content": resized,
                        "meta": [
                            {
                                "mime": "image/png" if r is not None else "image/unsupported",
                                "n_bytes": len(r) if r is not None else 0,
                            }
                            for r in resized
                        ],
                    }
                )

        return media.mapInPandas(real_batches, RESIZE_SCHEMA)

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
