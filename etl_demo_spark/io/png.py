"""Minimal pure-stdlib PNG encoder + chart rasterizer.

Closes O-26 (`etl_weekly_trades.py:229-268`, weekly-volume line chart +
stacked weekly-count bars) without matplotlib: a PNG is a fixed signature
plus zlib-compressed filter-0 scanlines (RFC 2083), so numpy + zlib +
struct are enough to emit real, viewable chart images. The rasterizer
draws axes, polylines, stacked bars, and 5×7-bitmap-font titles into an
RGB array; ``encode_png`` serializes it.

Driver-side by design: charts render the tiny post-aggregation frames
(weeks × client_types), never distributed data.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# 5x7 bitmap glyphs (rows of 5 bits, MSB = leftmost pixel) for chart
# titles/labels — uppercase, digits, and the few punctuation marks the
# chart titles use.
_FONT: dict[str, tuple[int, ...]] = {
    "A": (0b01110, 0b10001, 0b10001, 0b11111, 0b10001, 0b10001, 0b10001),
    "B": (0b11110, 0b10001, 0b10001, 0b11110, 0b10001, 0b10001, 0b11110),
    "C": (0b01110, 0b10001, 0b10000, 0b10000, 0b10000, 0b10001, 0b01110),
    "D": (0b11110, 0b10001, 0b10001, 0b10001, 0b10001, 0b10001, 0b11110),
    "E": (0b11111, 0b10000, 0b10000, 0b11110, 0b10000, 0b10000, 0b11111),
    "F": (0b11111, 0b10000, 0b10000, 0b11110, 0b10000, 0b10000, 0b10000),
    "G": (0b01110, 0b10001, 0b10000, 0b10111, 0b10001, 0b10001, 0b01111),
    "H": (0b10001, 0b10001, 0b10001, 0b11111, 0b10001, 0b10001, 0b10001),
    "I": (0b01110, 0b00100, 0b00100, 0b00100, 0b00100, 0b00100, 0b01110),
    "J": (0b00111, 0b00010, 0b00010, 0b00010, 0b00010, 0b10010, 0b01100),
    "K": (0b10001, 0b10010, 0b10100, 0b11000, 0b10100, 0b10010, 0b10001),
    "L": (0b10000, 0b10000, 0b10000, 0b10000, 0b10000, 0b10000, 0b11111),
    "M": (0b10001, 0b11011, 0b10101, 0b10101, 0b10001, 0b10001, 0b10001),
    "N": (0b10001, 0b11001, 0b10101, 0b10011, 0b10001, 0b10001, 0b10001),
    "O": (0b01110, 0b10001, 0b10001, 0b10001, 0b10001, 0b10001, 0b01110),
    "P": (0b11110, 0b10001, 0b10001, 0b11110, 0b10000, 0b10000, 0b10000),
    "Q": (0b01110, 0b10001, 0b10001, 0b10001, 0b10101, 0b10010, 0b01101),
    "R": (0b11110, 0b10001, 0b10001, 0b11110, 0b10100, 0b10010, 0b10001),
    "S": (0b01111, 0b10000, 0b10000, 0b01110, 0b00001, 0b00001, 0b11110),
    "T": (0b11111, 0b00100, 0b00100, 0b00100, 0b00100, 0b00100, 0b00100),
    "U": (0b10001, 0b10001, 0b10001, 0b10001, 0b10001, 0b10001, 0b01110),
    "V": (0b10001, 0b10001, 0b10001, 0b10001, 0b10001, 0b01010, 0b00100),
    "W": (0b10001, 0b10001, 0b10001, 0b10101, 0b10101, 0b10101, 0b01010),
    "X": (0b10001, 0b10001, 0b01010, 0b00100, 0b01010, 0b10001, 0b10001),
    "Y": (0b10001, 0b10001, 0b01010, 0b00100, 0b00100, 0b00100, 0b00100),
    "Z": (0b11111, 0b00001, 0b00010, 0b00100, 0b01000, 0b10000, 0b11111),
    "0": (0b01110, 0b10001, 0b10011, 0b10101, 0b11001, 0b10001, 0b01110),
    "1": (0b00100, 0b01100, 0b00100, 0b00100, 0b00100, 0b00100, 0b01110),
    "2": (0b01110, 0b10001, 0b00001, 0b00010, 0b00100, 0b01000, 0b11111),
    "3": (0b11111, 0b00010, 0b00100, 0b00010, 0b00001, 0b10001, 0b01110),
    "4": (0b00010, 0b00110, 0b01010, 0b10010, 0b11111, 0b00010, 0b00010),
    "5": (0b11111, 0b10000, 0b11110, 0b00001, 0b00001, 0b10001, 0b01110),
    "6": (0b00110, 0b01000, 0b10000, 0b11110, 0b10001, 0b10001, 0b01110),
    "7": (0b11111, 0b00001, 0b00010, 0b00100, 0b01000, 0b01000, 0b01000),
    "8": (0b01110, 0b10001, 0b10001, 0b01110, 0b10001, 0b10001, 0b01110),
    "9": (0b01110, 0b10001, 0b10001, 0b01111, 0b00001, 0b00010, 0b01100),
    " ": (0, 0, 0, 0, 0, 0, 0),
    "-": (0, 0, 0, 0b11111, 0, 0, 0),
    "_": (0, 0, 0, 0, 0, 0, 0b11111),
    ".": (0, 0, 0, 0, 0, 0b00100, 0b00100),
    ":": (0, 0b00100, 0, 0, 0, 0b00100, 0),
    "/": (0b00001, 0b00010, 0b00010, 0b00100, 0b01000, 0b01000, 0b10000),
}


def png_bytes(rgb: np.ndarray) -> bytes:
    """Serialize an (H, W, 3) uint8 array as an RFC-2083 PNG stream
    (color type 2, bit depth 8, filter 0 per scanline, one IDAT)."""
    if rgb.ndim != 3 or rgb.shape[2] != 3 or rgb.dtype != np.uint8:
        raise ValueError("png_bytes expects an (H, W, 3) uint8 array")
    h, w, _ = rgb.shape

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + rgb[y].tobytes() for y in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def encode_png(rgb: np.ndarray, path: str) -> None:
    """Write ``png_bytes(rgb)`` to ``path``."""
    with open(path, "wb") as f:
        f.write(png_bytes(rgb))


def decode_png_size(path: str) -> tuple[int, int]:
    """(width, height) from the IHDR — cheap validation helper."""
    with open(path, "rb") as f:
        sig = f.read(8)
        if sig != b"\x89PNG\r\n\x1a\n":
            raise ValueError("not a PNG")
        f.read(8)  # IHDR length + tag
        w, h = struct.unpack(">II", f.read(8))
    return w, h


_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}  # gray, RGB, RGBA (bit depth 8 only)


def decode_png_pixels(b: bytes) -> np.ndarray | None:
    """Full PIXEL decode of a PNG stream — the inverse of ``png_bytes``,
    but general: bit-depth-8 grayscale/RGB/RGBA, non-interlaced, any
    combination of the five scanline filters (None/Sub/Up/Average/Paeth,
    RFC 2083 §6), IDAT split across any number of chunks. That covers
    what this repo's encoder and the common tool output for these color
    types emit. Returns an (H, W, channels) uint8 array, or None for
    anything that isn't such a PNG (palette, 16-bit, interlaced,
    truncated, corrupt zlib) — callers map None to NULL columns, never
    task failures."""
    try:
        if b[:8] != b"\x89PNG\r\n\x1a\n":
            return None
        pos, w = 8, None
        idat = bytearray()
        while pos + 8 <= len(b):
            (length,) = struct.unpack(">I", b[pos : pos + 4])
            tag = b[pos + 4 : pos + 8]
            data = b[pos + 8 : pos + 8 + length]
            if len(data) < length:
                return None  # truncated
            if tag == b"IHDR":
                w, h, depth, ctype, comp, filt, interlace = struct.unpack(
                    ">IIBBBBB", data
                )
                if depth != 8 or ctype not in _PNG_CHANNELS or interlace != 0:
                    return None
                ch = _PNG_CHANNELS[ctype]
            elif tag == b"IDAT":
                idat += data
            elif tag == b"IEND":
                break
            pos += 12 + length  # length + tag + data + crc
        if w is None or not idat:
            return None
        raw = zlib.decompress(bytes(idat))
        stride = w * ch
        if len(raw) != h * (stride + 1):
            return None
        out = np.zeros((h, stride), dtype=np.uint8)
        prior = np.zeros(stride, dtype=np.uint8)
        for y in range(h):
            row = raw[y * (stride + 1) : (y + 1) * (stride + 1)]
            ftype, line = row[0], np.frombuffer(row[1:], dtype=np.uint8)
            if ftype == 0:
                recon = line.copy()
            elif ftype == 2:  # Up — vectorizes (no intra-row dependency)
                recon = line + prior
            else:
                recon = np.zeros(stride, dtype=np.uint8)
                for i in range(stride):
                    a = int(recon[i - ch]) if i >= ch else 0  # left
                    bb = int(prior[i])  # up
                    c = int(prior[i - ch]) if i >= ch else 0  # up-left
                    if ftype == 1:  # Sub
                        pred = a
                    elif ftype == 3:  # Average
                        pred = (a + bb) // 2
                    elif ftype == 4:  # Paeth
                        p = a + bb - c
                        pa, pb, pc = abs(p - a), abs(p - bb), abs(p - c)
                        pred = a if pa <= pb and pa <= pc else (bb if pb <= pc else c)
                    else:
                        return None
                    recon[i] = (int(line[i]) + pred) & 0xFF
            out[y] = recon
            prior = recon
        return out.reshape(h, w, ch)
    except (struct.error, zlib.error, ValueError, IndexError):
        return None


def box_resize(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Integer box (area-average) resample of an (H, W, C) uint8 array.
    Source pixel (y, x) belongs to output block
    (floor(y·out_h/H), floor(x·out_w/W)) — the value-based bucketing, the
    same expression SQL spells ``(x * out_w) // W`` (the corpus oracle
    recomputes it arithmetically, so the two definitions must be THIS one;
    the index-range form [floor(j·W/out_w), floor((j+1)·W/out_w)) differs
    at boundaries whenever W % out_w != 0). Output = block sum // block
    size — exact integer, bit-reproducible across numpy versions and
    engines. Upscaling leaves some blocks source-free; those fall back to
    floor-index sampling (pixel at (i·H//out_h, j·W//out_w))."""
    h, w, c = img.shape
    acc = img.astype(np.int64)
    row_b = np.arange(h) * out_h // h  # output row of each source row
    col_b = np.arange(w) * out_w // w
    out = np.zeros((out_h, out_w, c), dtype=np.uint8)
    for i in range(out_h):
        ys = np.nonzero(row_b == i)[0]
        if ys.size == 0:  # upscale: no source row maps here
            ys = np.array([i * h // out_h])
        for j in range(out_w):
            xs = np.nonzero(col_b == j)[0]
            if xs.size == 0:
                xs = np.array([j * w // out_w])
            block = acc[np.ix_(ys, xs)]
            out[i, j] = block.sum(axis=(0, 1)) // (ys.size * xs.size)
    return out


def _draw_text(img: np.ndarray, x: int, y: int, text: str, color=(40, 40, 40)) -> None:
    for ch in text.upper():
        glyph = _FONT.get(ch, _FONT[" "])
        for gy, bits in enumerate(glyph):
            for gx in range(5):
                if bits & (1 << (4 - gx)):
                    yy, xx = y + gy, x + gx
                    if 0 <= yy < img.shape[0] and 0 <= xx < img.shape[1]:
                        img[yy, xx] = color
        x += 6


def _blank(w: int, h: int) -> np.ndarray:
    return np.full((h, w, 3), 255, dtype=np.uint8)


def _axes(img: np.ndarray, l: int, t: int, r: int, b: int) -> None:
    img[b, l:r + 1] = (0, 0, 0)
    img[t:b + 1, l] = (0, 0, 0)


def _polyline(img: np.ndarray, xs: np.ndarray, ys: np.ndarray, color) -> None:
    """Dense-sampled line segments (no aliasing niceties needed)."""
    for i in range(len(xs) - 1):
        x0, y0, x1, y1 = xs[i], ys[i], xs[i + 1], ys[i + 1]
        n = max(abs(int(x1) - int(x0)), abs(int(y1) - int(y0)), 1)
        t = np.linspace(0.0, 1.0, n + 1)
        px = np.round(x0 + (x1 - x0) * t).astype(int)
        py = np.round(y0 + (y1 - y0) * t).astype(int)
        ok = (py >= 0) & (py < img.shape[0]) & (px >= 0) & (px < img.shape[1])
        img[py[ok], px[ok]] = color
        # thicken by one pixel vertically for visibility
        ok2 = ok & (py + 1 < img.shape[0])
        img[py[ok2] + 1, px[ok2]] = color


PALETTE = [
    (31, 119, 180),
    (255, 127, 14),
    (44, 160, 44),
    (214, 39, 40),
    (148, 103, 189),
    (140, 86, 75),
]


def line_chart(
    values: list[float],
    path: str,
    title: str = "",
    width: int = 800,
    height: int = 420,
) -> None:
    """Single-series line chart over an ordered x (category positions)."""
    img = _blank(width, height)
    l, t, r, b = 50, 30, width - 20, height - 40
    _axes(img, l, t, r, b)
    if title:
        _draw_text(img, l, 10, title[: (width - l) // 6])
    # None AND NaN both normalize to 0.0 (x != x is the NaN test): a NaN
    # would poison min/max and crash the int() pixel mapping below
    v = np.asarray(
        [0.0 if x is None or x != x else float(x) for x in values], dtype=float
    )
    if len(v) >= 1:
        lo, hi = float(np.nanmin(v)), float(np.nanmax(v))
        lo = min(lo, 0.0)
        span = (hi - lo) or 1.0
        xs = np.linspace(l + 4, r - 4, num=max(len(v), 2))[: len(v)]
        ys = b - 4 - (v - lo) / span * (b - t - 12)
        if len(v) == 1:
            ys = np.repeat(ys, 2)
            xs = np.array([l + 4, r - 4], dtype=float)
        _polyline(img, xs, ys, PALETTE[0])
        _draw_text(img, 2, t, f"{hi:.0f}"[:7])
        _draw_text(img, 2, b - 7, f"{lo:.0f}"[:7])
    encode_png(img, path)


def stacked_bar_chart(
    categories: list[str],
    series: dict[str, list[float]],
    path: str,
    title: str = "",
    width: int = 800,
    height: int = 420,
) -> None:
    """Stacked vertical bars: one bar per category, one colored layer per
    series (insertion order), with a color-keyed legend."""
    img = _blank(width, height)
    l, t, r, b = 50, 30, width - 140, height - 40
    _axes(img, l, t, r, b)
    if title:
        _draw_text(img, l, 10, title[: (width - l) // 6])
    names = list(series)
    n = len(categories)
    if n and names:
        totals = np.zeros(n)
        for vals in series.values():
            totals += np.asarray(
                [0.0 if x is None or x != x else float(x) for x in vals]
            )
        peak = float(totals.max()) or 1.0
        slot = (r - l - 8) / n
        bar_w = max(1, int(slot * 0.7))
        cum = np.zeros(n)
        for si, name in enumerate(names):
            vals = np.asarray(
                [0.0 if x is None or x != x else float(x) for x in series[name]]
            )
            color = PALETTE[si % len(PALETTE)]
            for ci in range(n):
                x0 = int(l + 4 + ci * slot + (slot - bar_w) / 2)
                y1 = b - 1 - int(cum[ci] / peak * (b - t - 12))
                y0 = b - 1 - int((cum[ci] + vals[ci]) / peak * (b - t - 12))
                img[max(t, y0):max(t, y1 + 1), x0:x0 + bar_w] = color
            cum += vals
        _draw_text(img, 2, t, f"{peak:.0f}"[:7])
        for si, name in enumerate(names):  # legend
            y = t + si * 12
            img[y:y + 8, r + 10:r + 18] = PALETTE[si % len(PALETTE)]
            _draw_text(img, r + 22, y, str(name)[:18])
    encode_png(img, path)
