"""Pure Python/numpy video containers: YUV4MPEG2 (Y4M) and MJPEG-in-AVI.

Why it exists: the container has no ffmpeg, but two real video formats
are parseable without one — Y4M is raw planar YUV behind a text header
(the format ffmpeg/mjpegtools pipe uncompressed video through), and AVI
with an MJPG stream is a RIFF walk whose every frame is a baseline JPEG
the from-scratch codec in ``io/jpeg.py`` already decodes. Together they
turn ``multimodal.sample_video_frames`` from a codec-gated stub into a
real decode path; inter-frame codecs (H.264/VP9/AV1) still need ffmpeg
and such blobs yield zero frames (filter-don't-fail, like every decode
stage in this repo).

Spec coverage (both public):
  Y4M (mjpegtools yuv4mpeg(5)): stream header params W/H/F/I/A/C/X,
    colorspaces Cmono, C444, C420 / C420jpeg / C420mpeg2 / C420paldv
    (chroma cosited-ness only affects filtering, not sample layout);
    FRAME headers with optional params. Encode: Cmono or C444.
  AVI (Microsoft RIFF/AVI): RIFF('AVI ') → LIST hdrl (avih, strl with
    strh 'vids'/MJPG + strf BITMAPINFOHEADER) → LIST movi with 00dc/00db
    chunks (even-padded) → idx1. Decode tolerates missing idx1 and
    nested rec LISTs.

Range convention: Y4M carries YCbCr as-is; this module converts with the
full-range JFIF matrix (the same one io/jpeg.py uses) so a gray value v
round-trips exactly through Cmono and C444 — the corpus oracle's
closed-form checksum depends on that. Studio-swing sources decode with
the same matrix (documented, deterministic); scaling to studio range is
a caller-side colorimetry decision, not a container property.
"""

from __future__ import annotations

import struct

import numpy as np

from etl_demo_spark.io.jpeg import decode_jpeg_pixels

# ---------------------------------------------------------------- Y4M
_Y4M_MAGIC = b"YUV4MPEG2"


def y4m_bytes(frames: list[np.ndarray], fps: tuple[int, int] = (25, 1)) -> bytes:
    """Serialize frames as a Y4M stream. (H, W) uint8 frames emit Cmono;
    (H, W, 3) RGB frames emit C444 (JFIF full-range conversion, rounded
    half-away so gray inputs keep Y == v exactly). All frames must share
    one shape."""
    if not frames:
        raise ValueError("y4m_bytes: need at least one frame")
    shape = frames[0].shape
    if any(f.shape != shape or f.dtype != np.uint8 for f in frames):
        raise ValueError("y4m_bytes: frames must all be uint8 with one shape")
    mono = len(shape) == 2
    if not mono and shape[2] != 3:
        raise ValueError("y4m_bytes: frames must be (H, W) or (H, W, 3)")
    h, w = shape[0], shape[1]
    cs = "mono" if mono else "444"
    out = bytearray()
    out += b"%s W%d H%d F%d:%d Ip A1:1 C%s\n" % (
        _Y4M_MAGIC, w, h, fps[0], fps[1], cs.encode()
    )
    for f in frames:
        out += b"FRAME\n"
        if mono:
            out += f.tobytes()
        else:
            r, g, b = (f[:, :, i].astype(np.float64) for i in range(3))
            y = 0.299 * r + 0.587 * g + 0.114 * b
            cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
            cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
            for plane in (y, cb, cr):
                snapped = np.sign(plane) * np.floor(np.abs(plane) + 0.5)
                out += np.clip(snapped, 0, 255).astype(np.uint8).tobytes()
    return bytes(out)


def decode_y4m_frames(b: bytes) -> list[np.ndarray] | None:
    """Parse a Y4M stream into frames — (H, W, 1) uint8 for Cmono,
    (H, W, 3) RGB otherwise. Returns None for anything that isn't a
    well-formed Y4M with a supported colorspace."""
    try:
        return _decode_y4m(b)
    except Exception:
        return None


def _decode_y4m(b: bytes) -> list[np.ndarray] | None:
    if not b.startswith(_Y4M_MAGIC + b" ") and not b.startswith(_Y4M_MAGIC + b"\n"):
        return None
    nl = b.index(b"\n")
    w = h = None
    cs = "420"  # yuv4mpeg(5) default when C is absent
    for tok in b[len(_Y4M_MAGIC) : nl].split():
        t = tok.decode("ascii", "replace")
        if t.startswith("W"):
            w = int(t[1:])
        elif t.startswith("H"):
            h = int(t[1:])
        elif t.startswith("C"):
            cs = t[1:]
    if not w or not h:
        return None
    if cs == "mono":
        planes = [(h, w)]
    elif cs.startswith("444"):
        planes = [(h, w), (h, w), (h, w)]
    elif cs.startswith("420"):
        planes = [(h, w), (h // 2, w // 2), (h // 2, w // 2)]
    else:
        return None  # 422/411/alpha variants: not needed yet
    frame_bytes = sum(ph * pw for ph, pw in planes)
    pos = nl + 1
    frames: list[np.ndarray] = []
    while pos < len(b):
        if not b.startswith(b"FRAME", pos):
            return None
        pos = b.index(b"\n", pos) + 1  # FRAME params (if any) end at \n
        if pos + frame_bytes > len(b):
            return None  # truncated frame
        raw = []
        for ph, pw in planes:
            n = ph * pw
            raw.append(np.frombuffer(b[pos : pos + n], dtype=np.uint8).reshape(ph, pw))
            pos += n
        if cs == "mono":
            frames.append(raw[0][:, :, None].copy())
            continue
        y = raw[0].astype(np.float64)
        cb, cr = raw[1].astype(np.float64), raw[2].astype(np.float64)
        if cs.startswith("420"):
            cb = np.repeat(np.repeat(cb, 2, axis=0), 2, axis=1)[:h, :w]
            cr = np.repeat(np.repeat(cr, 2, axis=0), 2, axis=1)[:h, :w]
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        bl = y + 1.772 * (cb - 128.0)
        rgb = np.stack([r, g, bl], axis=2)
        frames.append(np.clip(np.floor(rgb + 0.5 + 1e-9), 0, 255).astype(np.uint8))
    return frames


# ---------------------------------------------------------------- AVI/MJPEG
def avi_mjpeg_bytes(
    jpeg_frames: list[bytes], width: int, height: int, fps: int = 25
) -> bytes:
    """Wrap pre-encoded baseline JPEG frames in a minimal spec-complete
    AVI: hdrl (avih + one MJPG video stream), movi with 00dc chunks,
    idx1. Frames come from ``io.jpeg.jpeg_bytes``."""
    if not jpeg_frames:
        raise ValueError("avi_mjpeg_bytes: need at least one frame")

    def chunk(tag: bytes, data: bytes) -> bytes:
        pad = b"\x00" if len(data) % 2 else b""
        return tag + struct.pack("<I", len(data)) + data + pad

    def lst(kind: bytes, data: bytes) -> bytes:
        return chunk(b"LIST", kind + data)

    n = len(jpeg_frames)
    max_bytes = max(len(f) for f in jpeg_frames)
    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        max_bytes * fps,   # dwMaxBytesPerSec (advisory)
        0,                 # dwPaddingGranularity
        0x10,              # AVIF_HASINDEX
        n, 0, 1, max_bytes, width, height, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sI2H8I4h",
        b"vids", b"MJPG", 0, 0, 0,   # type, handler, flags, priority, language
        0, 1, fps, 0, n, max_bytes, 0xFFFFFFFF, 0,  # init, scale, rate, start, len, buf, quality, sampsize
        0, 0, width, height,
    )
    strf = struct.pack(
        "<I2i2H2I2i2I", 40, width, height, 1, 24, 0x47504A4D,  # 'MJPG'
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_items = [chunk(b"00dc", f) for f in jpeg_frames]
    movi = lst(b"movi", b"".join(movi_items))
    idx = bytearray()
    off = 4  # offsets are relative to the start of 'movi' fourcc
    for f in jpeg_frames:
        idx += struct.pack("<4sIII", b"00dc", 0x10, off, len(f))
        off += 8 + len(f) + (len(f) % 2)
    body = b"AVI " + hdrl + movi + chunk(b"idx1", bytes(idx))
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi_mjpeg_frames(b: bytes) -> list[np.ndarray] | None:
    """Walk the RIFF tree to the movi list and decode every 00dc/00db
    chunk as a baseline JPEG. Returns None if the container isn't an AVI
    or no frame decodes (an AVI carrying H.264 'inside 00dc' fails per
    frame and yields None, not garbage)."""
    try:
        return _decode_avi(b)
    except Exception:
        return None


def _decode_avi(b: bytes) -> list[np.ndarray] | None:
    if len(b) < 12 or b[0:4] != b"RIFF" or b[8:12] != b"AVI ":
        return None
    frames: list[np.ndarray] = []

    def walk(pos: int, end: int) -> None:
        while pos + 8 <= end:
            tag = b[pos : pos + 4]
            size = struct.unpack("<I", b[pos + 4 : pos + 8])[0]
            data_start = pos + 8
            data_end = min(data_start + size, end)
            if tag == b"LIST":
                kind = b[data_start : data_start + 4]
                if kind in (b"movi", b"rec ", b"hdrl"):
                    walk(data_start + 4, data_end)
            elif tag in (b"00dc", b"00db"):
                px = decode_jpeg_pixels(b[data_start:data_end])
                if px is not None:
                    frames.append(px)
            pos = data_start + size + (size % 2)

    walk(12, 12 + struct.unpack("<I", b[4:8])[0] - 4)
    return frames or None


def _ffmpeg_enabled() -> bool:
    """Inter-frame codecs (H.264/VP9/AV1) need a real decoder. The
    stdlib paths stay the DEFAULT; this opt-in gate requires BOTH the
    env flag and the binary, so the engine's behavior never silently
    depends on what happens to be installed on a worker."""
    import os
    import shutil

    return os.environ.get("SPARK_GRAFT_FFMPEG") == "1" and bool(
        shutil.which("ffmpeg")
    )


def decode_ffmpeg_frames(b: bytes) -> list[np.ndarray] | None:
    """Decode ANY container/codec ffmpeg handles by piping the blob in
    and Y4M out, then reusing this module's own Y4M parser — one decode
    path, two producers. Returns None on any failure (filter-don't-fail)
    or when the gate is off. Runs inside the executor-side Pandas UDF:
    one subprocess per blob, bounded by the Arrow batch size."""
    if not _ffmpeg_enabled():
        return None
    import subprocess

    try:
        r = subprocess.run(
            [
                "ffmpeg", "-v", "error", "-i", "pipe:0",
                "-f", "yuv4mpeg2", "-pix_fmt", "yuv444p", "pipe:1",
            ],
            input=b,
            capture_output=True,
            timeout=120,
        )
    except (OSError, subprocess.TimeoutExpired):
        return None
    if r.returncode != 0 or not r.stdout:
        return None
    return decode_y4m_frames(r.stdout)


def decode_video_frames(b: bytes) -> list[np.ndarray] | None:
    """Container sniff: Y4M then AVI/MJPEG, then — only when the
    SPARK_GRAFT_FFMPEG=1 gate is on and the binary exists — an ffmpeg
    pipe for inter-frame codecs. Frames are (H, W, 1) or (H, W, 3)
    uint8; None when nothing decodes."""
    frames = decode_y4m_frames(b)
    if frames is None:
        frames = decode_avi_mjpeg_frames(b)
    if frames is None:
        frames = decode_ffmpeg_frames(b)
    return frames
