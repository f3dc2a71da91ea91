"""Video containers (io/video.py) and the real sample_video_frames path:
Y4M round trips, AVI/MJPEG walk, sampling stride, corrupt contracts."""

from __future__ import annotations

import math

import numpy as np
import pytest

from etl_demo_spark.io.jpeg import jpeg_bytes
from etl_demo_spark.io.video import (
    avi_mjpeg_bytes,
    decode_avi_mjpeg_frames,
    decode_video_frames,
    decode_y4m_frames,
    y4m_bytes,
)


def _jpeg_constant_roundtrip(v: int) -> int:
    k = v - 128
    qdc = int(math.floor(abs(8 * k) / 16 + 0.5)) * (1 if k >= 0 else -1)
    return max(0, min(255, 2 * qdc + 128))


def test_y4m_mono_roundtrip_exact():
    frames = [np.full((12, 16), v, np.uint8) for v in (0, 77, 200, 255)]
    out = decode_y4m_frames(y4m_bytes(frames))
    assert len(out) == 4
    assert all(o.shape == (12, 16, 1) for o in out)
    assert all((o[:, :, 0] == f).all() for o, f in zip(out, frames))


def test_y4m_c444_gray_exact_and_rgb_tolerance():
    gray = [np.full((8, 8, 3), 133, np.uint8)]
    assert (decode_y4m_frames(y4m_bytes(gray))[0] == 133).all()
    rng = np.random.default_rng(1)
    rgb = [rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)]
    out = decode_y4m_frames(y4m_bytes(rgb))
    assert np.abs(out[0].astype(int) - rgb[0].astype(int)).max() <= 2


def test_y4m_c420_decode_handbuilt_stream():
    hdr = b"YUV4MPEG2 W8 H8 F25:1 Ip A1:1 C420jpeg\n"
    y = np.full(64, 100, np.uint8).tobytes()
    c = np.full(16, 128, np.uint8).tobytes()
    out = decode_y4m_frames(hdr + b"FRAME\n" + y + c + c + b"FRAME\n" + y + c + c)
    assert len(out) == 2
    assert (out[0] == 100).all()


def test_y4m_rejects_truncated_and_unknown_colorspace():
    b = y4m_bytes([np.full((4, 4), 9, np.uint8)])
    assert decode_y4m_frames(b[:-3]) is None  # truncated frame payload
    assert decode_y4m_frames(b"YUV4MPEG2 W4 H4 C422\nFRAME\n" + b"\x00" * 24) is None
    assert decode_y4m_frames(b"not y4m") is None


def test_avi_mjpeg_roundtrip_closed_form():
    vals = (10, 130, 250)
    jf = [jpeg_bytes(np.full((16, 16), v, np.uint8), quality=50) for v in vals]
    avi = avi_mjpeg_bytes(jf, 16, 16)
    out = decode_avi_mjpeg_frames(avi)
    assert len(out) == 3
    for o, v in zip(out, vals):
        assert (o == _jpeg_constant_roundtrip(v)).all()


def test_avi_decode_tolerates_odd_sized_chunks():
    # a 35-byte-ish odd-length frame exercises the RIFF even-padding walk
    jf = [jpeg_bytes(np.full((8, 8), 50, np.uint8), quality=50)]
    if len(jf[0]) % 2 == 0:
        jf.append(jpeg_bytes(np.full((8, 16), 60, np.uint8), quality=50))
    out = decode_avi_mjpeg_frames(avi_mjpeg_bytes(jf, 8, 8))
    assert out is not None and len(out) == len(jf)


def test_container_sniff_and_corrupt_contract():
    avi = avi_mjpeg_bytes([jpeg_bytes(np.full((8, 8), 50, np.uint8))], 8, 8)
    y4m = y4m_bytes([np.full((4, 4), 9, np.uint8)])
    assert decode_video_frames(avi) is not None
    assert decode_video_frames(y4m)[0][0, 0, 0] == 9
    assert decode_video_frames(b"garbage") is None
    assert decode_video_frames(avi[:50]) is None
    # an AVI whose 00dc payloads aren't JPEGs (e.g. H.264) yields None
    fake = avi.replace(b"\xff\xd8", b"\x00\x00", 1)
    assert decode_avi_mjpeg_frames(fake) is None


def test_encoders_reject_bad_input():
    with pytest.raises(ValueError):
        y4m_bytes([])
    with pytest.raises(ValueError):
        y4m_bytes([np.zeros((4, 4, 2), dtype=np.uint8)])
    with pytest.raises(ValueError):
        y4m_bytes([np.zeros((4, 4), np.uint8), np.zeros((8, 8), np.uint8)])
    with pytest.raises(ValueError):
        avi_mjpeg_bytes([], 8, 8)


def test_sample_video_frames_real_stride_and_png_output(spark):
    """every_n sampling over a real container through the Spark operator:
    7 Y4M frames at stride 3 → ordinals 0,1,2 = source frames 0,3,6,
    each a decodable PNG with the source frame's exact pixels."""
    from etl_demo_spark.io.png import decode_png_pixels
    from etl_demo_spark.multimodal import sample_video_frames

    frames = [np.full((6, 8), 30 * i, np.uint8) for i in range(7)]
    blob = y4m_bytes(frames)
    df = spark.createDataFrame([(5, bytearray(blob))], "media_id long, content binary")
    out = sorted(sample_video_frames(df, every_n=3).collect(), key=lambda r: r.frame_idx)
    assert [r.frame_idx for r in out] == [0, 1, 2]
    for r, src in zip(out, (0, 3, 6)):
        px = decode_png_pixels(bytes(r.frame))
        assert px.shape == (6, 8, 3)
        assert (px == 30 * src).all()


def test_ffmpeg_gate_off_by_default(monkeypatch):
    """Without SPARK_GRAFT_FFMPEG=1 the ffmpeg path must not run even if
    the binary exists — engine behavior can't depend on worker PATH."""
    from etl_demo_spark.io.video import decode_ffmpeg_frames

    monkeypatch.delenv("SPARK_GRAFT_FFMPEG", raising=False)
    assert decode_ffmpeg_frames(b"\x00\x00\x00\x18ftypmp42") is None


def test_ffmpeg_interframe_decode_when_present(monkeypatch, tmp_path):
    """Gated end-to-end: encode a tiny H.264 clip with ffmpeg, decode it
    through decode_video_frames' ffmpeg pipe, check frame count + pixel
    parity vs the raw source (lossless x264 at qp 0 when available,
    else a tolerance). Skips cleanly where ffmpeg is absent."""
    import shutil
    import subprocess

    if not shutil.which("ffmpeg"):
        pytest.skip("ffmpeg not installed")
    monkeypatch.setenv("SPARK_GRAFT_FFMPEG", "1")

    from etl_demo_spark.io.video import decode_video_frames, y4m_bytes

    rng = np.random.default_rng(7)
    src = [rng.integers(0, 256, (32, 48), dtype=np.uint8) for _ in range(5)]
    raw = y4m_bytes(src)
    enc = subprocess.run(
        ["ffmpeg", "-v", "error", "-i", "pipe:0", "-c:v", "libx264",
         "-preset", "ultrafast", "-qp", "0", "-f", "mp4",
         "-movflags", "frag_keyframe+empty_moov", "pipe:1"],
        input=raw, capture_output=True, timeout=120,
    )
    if enc.returncode != 0:
        pytest.skip(f"ffmpeg encode unavailable: {enc.stderr[:200]!r}")
    frames = decode_video_frames(enc.stdout)
    assert frames is not None and len(frames) == 5
    for got, want in zip(frames, src):
        assert got.shape[:2] == want.shape
        g = got[..., 0].astype(int) if got.ndim == 3 else got.astype(int)
        assert np.abs(g - want.astype(int)).mean() < 3.0
