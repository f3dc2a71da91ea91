"""JPEG baseline codec (io/jpeg.py): round trips, the closed-form
constant-block contract the corpus oracle leans on, subsampling,
restart intervals, and the corrupt-input contract."""

from __future__ import annotations

import math

import numpy as np
import pytest

from etl_demo_spark.io.jpeg import (
    QUANT_LUM,
    decode_jpeg_pixels,
    jpeg_bytes,
    scaled_quant,
)


def _smooth_rgb(h=33, w=41):
    img = np.zeros((h, w, 3), dtype=np.uint8)
    yy, xx = np.mgrid[0:h, 0:w]
    img[:, :, 0] = (xx * 3) % 256
    img[:, :, 1] = (yy * 5) % 256
    img[:, :, 2] = ((xx + yy) * 2) % 256
    return img


def test_constant_block_closed_form_quality50():
    """At quality 50 the luminance DC quant step is exactly 16, so a
    constant gray block v decodes to clamp(2*round_half_away((v-128)/2)
    + 128) — the exact arithmetic media_jpeg_resize_checksum's DuckDB
    oracle recomputes. Every representable v must agree bit-for-bit."""
    assert scaled_quant(QUANT_LUM, 50)[0] == 16
    for v in range(0, 256, 7):
        px = decode_jpeg_pixels(jpeg_bytes(np.full((16, 24), v, np.uint8), quality=50))
        k = v - 128
        qdc = int(math.floor(abs(8 * k) / 16 + 0.5)) * (1 if k >= 0 else -1)
        d = max(0, min(255, 2 * qdc + 128))
        assert px.shape == (16, 24, 1)
        assert (px == d).all(), (v, d, int(px[0, 0, 0]))


def test_rgb_roundtrip_error_bounds_444():
    img = _smooth_rgb()
    for quality, bound in ((90, 6), (75, 10), (50, 16)):
        px = decode_jpeg_pixels(jpeg_bytes(img, quality=quality))
        assert px.shape == img.shape
        assert np.abs(px.astype(int) - img.astype(int)).max() <= bound


def test_rgb_roundtrip_420_subsampling():
    img = _smooth_rgb()
    b = jpeg_bytes(img, quality=90, subsampling="420")
    px = decode_jpeg_pixels(b)
    assert px.shape == img.shape
    assert np.abs(px.astype(int) - img.astype(int)).max() <= 12
    # 4:2:0 must actually shrink the stream vs 4:4:4
    assert len(b) < len(jpeg_bytes(img, quality=90, subsampling="444"))


def test_restart_intervals_roundtrip():
    img = _smooth_rgb()
    b = jpeg_bytes(img, quality=75, restart_interval=2)
    assert b.count(b"\xff\xdd") == 1  # DRI present
    px = decode_jpeg_pixels(b)
    assert px is not None
    assert np.abs(px.astype(int) - img.astype(int)).max() <= 10


def test_grayscale_single_component_stream():
    img = (np.arange(8, dtype=np.uint8)[None, :] * 10 + 50).repeat(8, axis=0)
    b = jpeg_bytes(img, quality=90)
    px = decode_jpeg_pixels(b)
    assert px.shape == (8, 8, 1)
    assert np.abs(px[:, :, 0].astype(int) - img.astype(int)).max() <= 3


def test_non_mcu_aligned_dimensions_crop():
    """Edge-padded encode + decoder crop: odd dims survive exactly."""
    img = _smooth_rgb(h=17, w=23)
    for sub in ("444", "420"):
        px = decode_jpeg_pixels(jpeg_bytes(img, quality=90, subsampling=sub))
        assert px.shape == (17, 23, 3)


def test_corrupt_and_unsupported_inputs_return_none():
    b = jpeg_bytes(_smooth_rgb(), quality=75)
    assert decode_jpeg_pixels(b[:40]) is None  # truncated mid-header
    assert decode_jpeg_pixels(b[:-20]) is None or True  # never raises
    assert decode_jpeg_pixels(b"not a jpeg") is None
    assert decode_jpeg_pixels(b"\xff\xd8\x00\x00garbage") is None
    # progressive marker (SOF2) is declared unsupported, not mis-decoded
    prog = bytearray(b)
    sof = prog.find(b"\xff\xc0")
    prog[sof + 1] = 0xC2
    assert decode_jpeg_pixels(bytes(prog)) is None


def test_encoder_rejects_bad_shapes():
    with pytest.raises(ValueError):
        jpeg_bytes(np.zeros((4, 4, 2), dtype=np.uint8))
    with pytest.raises(ValueError):
        jpeg_bytes(np.zeros((0, 4), dtype=np.uint8))
    with pytest.raises(ValueError):
        jpeg_bytes(np.zeros((4, 4), dtype=np.uint8), subsampling="422")


def test_resize_dispatch_reaches_jpeg(spark):
    """multimodal.resize_images must decode JPEG blobs through the real
    codec: a constant-gray JPEG resizes to exactly its closed-form
    round-trip value on every output pixel."""
    from etl_demo_spark.multimodal import resize_images

    v = 200
    blob = jpeg_bytes(np.full((32, 32), v, np.uint8), quality=50)
    df = spark.createDataFrame([(1, bytearray(blob))], "media_id long, content binary")
    out = resize_images(df, width=4, height=4).collect()[0]
    from etl_demo_spark.io.png import decode_png_pixels

    px = decode_png_pixels(bytes(out.content))
    k = v - 128
    qdc = int(math.floor(abs(8 * k) / 16 + 0.5)) * (1 if k >= 0 else -1)
    d = max(0, min(255, 2 * qdc + 128))
    assert px.shape == (4, 4, 3)
    assert (px == d).all()
