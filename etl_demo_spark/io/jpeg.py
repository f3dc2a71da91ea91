"""Pure Python/numpy baseline JPEG codec: real Huffman + DCT decode AND encode.

Why it exists: the container has no PIL/opencv/ffmpeg, but the multimodal
pipeline's contract is REAL pixel decode wherever a codec is feasible
without native libraries (io/png.py: PNG, round 4; io/gif.py: GIF LZW,
round 5). Baseline sequential JPEG (ITU-T T.81 / ISO 10918-1) is the last
image format the testdata pipeline needs: Huffman entropy coding, zigzag
run-length, dequantization and the 8x8 type-II DCT are all public-spec
arithmetic that numpy expresses directly. Progressive/arithmetic/12-bit
modes are out of scope and return None (filter-don't-fail, like the other
decoders).

Spec coverage (ITU-T T.81, public):
  decode: SOF0 baseline DCT, grayscale + YCbCr 3-component, any sampling
          factors up to 2x2 (4:4:4 / 4:2:2 / 4:2:0), multiple DQT/DHT
          segments, restart intervals (DRI + RST0-7), byte unstuffing.
  encode: SOF0, grayscale (1 component) or YCbCr 4:4:4 / 4:2:0, the
          Annex K example quantization + Huffman tables with libjpeg's
          public quality scaling, optional restart intervals.

Exactness contract (what the corpus oracle leans on): a block whose
samples are all the same value v round-trips to a closed-form value —
encoder DCT coefficients are snapped to integers before quantization
(constant block -> DC exactly 8*(v-128), AC exactly 0), quantization is
round-half-away-from-zero on an exact rational (integer / integer), and
the decoder's final rounding is floor(x + 0.5 + 1e-9) so the 1e-13 float
noise the IDCT matrix multiply carries can never flip a tie. DuckDB SQL
reproduces all three steps with integer arithmetic (see
corpus.media_jpeg_resize_checksum).

The reference's pipeline has no image path at all (etl_weekly_trades.py
is tabular); this backs the driver-mandated multimodal-column surface.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- constants
# zigzag position -> raster index (T.81 Figure 5)
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Annex K example quantization tables (raster order)
QUANT_LUM = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
QUANT_CHROM = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# Annex K example Huffman tables: (bits[1..16], huffval)
_DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROM = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_AC_CHROM = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

# 8x8 DCT basis: A[u, x] = (Cu/2) * cos((2x+1) u pi / 16).
# forward: S = A @ f @ A.T ; inverse: f = A.T @ S @ A
_x = np.arange(8)
_A = np.cos((2 * _x[None, :] + 1) * _x[:, None] * np.pi / 16) / 2.0
_A[0, :] *= 1 / np.sqrt(2)


def _round_half_away(x: np.ndarray) -> np.ndarray:
    """Deterministic half-away-from-zero rounding (np.round is banker's,
    which neither DuckDB nor the spec's examples use)."""
    return np.sign(x) * np.floor(np.abs(x) + 0.5)


def scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg's public quality->table scaling (quality 50 = Annex K
    verbatim; the corpus oracle's closed form assumes quality=50 so the
    luminance DC step is exactly 16)."""
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    t = (base * scale + 50) // 100
    return np.clip(t, 1, 255)


# ---------------------------------------------------------------- huffman
def _canonical_codes(bits: list[int], huffval: list[int]) -> dict[int, tuple[int, int]]:
    """value -> (code, length), canonical per T.81 Annex C."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[huffval[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _HuffTree:
    """Decode table: (length, code) -> value via per-length dicts — O(1)
    per emitted bit, no tree objects."""

    def __init__(self, bits: list[int], huffval: list[int]):
        self.lut: list[dict[int, int]] = [dict() for _ in range(17)]
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.lut[length][code] = huffval[k]
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """MSB-first reader over entropy-coded data with 0xFF00 unstuffing;
    stops at any non-stuffing marker (caller handles RSTn)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0

    def _fill(self) -> bool:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:
                return False  # a real marker: no more entropy bits here
        else:
            self.pos += 1
        self.bitbuf = (self.bitbuf << 8) | b
        self.nbits += 8
        return True

    def read_bit(self) -> int:
        if self.nbits == 0 and not self._fill():
            raise ValueError("jpeg: entropy data ran into a marker")
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_huff(self, tree: _HuffTree) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            hit = tree.lut[length].get(code)
            if hit is not None:
                return hit
        raise ValueError("jpeg: invalid Huffman code")

    def align_and_expect_rst(self, n: int) -> None:
        self.bitbuf = 0
        self.nbits = 0
        if self.data[self.pos] != 0xFF or self.data[self.pos + 1] != 0xD0 + (n & 7):
            raise ValueError("jpeg: missing restart marker")
        self.pos += 2


def _extend(v: int, t: int) -> int:
    """T.81 EXTEND: map t-bit magnitude v to signed coefficient."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


# ---------------------------------------------------------------- decoder
def decode_jpeg_pixels(b: bytes) -> np.ndarray | None:
    """Full pixel decode of a baseline JPEG. Returns (H, W, 1) uint8 for
    grayscale or (H, W, 3) RGB, or None for anything that isn't a
    decodable baseline stream (progressive, arithmetic, 12-bit,
    truncated, corrupt) — callers map None to NULL columns."""
    try:
        return _decode(b)
    except Exception:
        return None


def _decode(b: bytes) -> np.ndarray | None:
    if len(b) < 4 or b[0:2] != b"\xff\xd8":
        return None
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffTree] = {}
    huff_ac: dict[int, _HuffTree] = {}
    frame = None  # (h, w, comps) with comps = [(cid, hs, vs, tq)]
    restart_interval = 0
    while pos < len(b):
        if b[pos] != 0xFF:
            return None
        marker = b[pos + 1]
        pos += 2
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        seglen = struct.unpack(">H", b[pos : pos + 2])[0]
        seg = b[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0xF
                if pq != 0:
                    return None  # 16-bit tables: not baseline-8
                tbl = np.frombuffer(seg[i + 1 : i + 65], dtype=np.uint8).astype(np.int64)
                raster = np.zeros(64, dtype=np.int64)
                raster[ZIGZAG] = tbl  # DQT stores zigzag order
                qt[tq] = raster.reshape(8, 8)
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0xF
                bits = list(seg[i + 1 : i + 17])
                n = sum(bits)
                vals = list(seg[i + 17 : i + 17 + n])
                (huff_ac if tc else huff_dc)[th] = _HuffTree(bits, vals)
                i += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = seg[0], struct.unpack(">H", seg[1:3])[0], struct.unpack(">H", seg[3:5])[0], seg[5]
            if prec != 8 or nc not in (1, 3):
                return None
            comps = []
            for c in range(nc):
                cid, hv, tq_ = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0xF, tq_))
            frame = (h, w, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            return None  # extended/progressive/lossless/arithmetic
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[0:2])[0]
        elif marker == 0xDA:  # SOS — entropy data follows the header
            if frame is None:
                return None
            ns = seg[0]
            scan = []  # (comp_idx, dc_tree, ac_tree)
            for s in range(ns):
                cs, tt = seg[1 + 2 * s], seg[2 + 2 * s]
                idx = next(i for i, c in enumerate(frame[2]) if c[0] == cs)
                scan.append((idx, huff_dc[tt >> 4], huff_ac[tt & 0xF]))
            data_start = pos + seglen
            return _decode_scan(b, data_start, frame, qt, scan, restart_interval)
        pos += seglen
    return None


def _decode_scan(b, pos, frame, qt, scan, restart_interval):
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (w + mcu_w - 1) // mcu_w
    mcus_y = (h + mcu_h - 1) // mcu_h
    planes = [
        np.zeros((mcus_y * 8 * c[2], mcus_x * 8 * c[1]), dtype=np.float64)
        for c in comps
    ]
    reader = _BitReader(b, pos)
    pred = [0] * len(comps)
    rst = 0
    n_mcus = mcus_x * mcus_y
    for m in range(n_mcus):
        if restart_interval and m and m % restart_interval == 0:
            reader.align_and_expect_rst(rst)
            rst = (rst + 1) & 7
            pred = [0] * len(comps)
        my, mx = divmod(m, mcus_x)
        for ci, dc_tree, ac_tree in scan:
            _, hs, vs, tq = comps[ci]
            q = qt[tq]
            for by in range(vs):
                for bx in range(hs):
                    zz = np.zeros(64, dtype=np.int64)
                    t = reader.decode_huff(dc_tree)
                    diff = _extend(reader.receive(t), t)
                    pred[ci] += diff
                    zz[0] = pred[ci]
                    k = 1
                    while k < 64:
                        rs = reader.decode_huff(ac_tree)
                        r, s = rs >> 4, rs & 0xF
                        if s == 0:
                            if r == 15:  # ZRL
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("jpeg: AC index overflow")
                        zz[k] = _extend(reader.receive(s), s)
                        k += 1
                    coeff = np.zeros(64, dtype=np.int64)
                    coeff[ZIGZAG] = zz
                    block = (coeff.reshape(8, 8) * q).astype(np.float64)
                    spatial = _A.T @ block @ _A + 128.0
                    y0 = (my * vs + by) * 8
                    x0 = (mx * hs + bx) * 8
                    planes[ci][y0 : y0 + 8, x0 : x0 + 8] = spatial
    # upsample to full MCU grid, crop, color-convert
    out_planes = []
    for ci, (_, hs, vs, _) in enumerate(comps):
        p = planes[ci]
        if hs < hmax or vs < vmax:
            p = np.repeat(np.repeat(p, vmax // vs, axis=0), hmax // hs, axis=1)
        out_planes.append(p[:h, :w])
    if len(comps) == 1:
        g = np.clip(np.floor(out_planes[0] + 0.5 + 1e-9), 0, 255).astype(np.uint8)
        return g[:, :, None]
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    bl = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, bl], axis=2)
    return np.clip(np.floor(rgb + 0.5 + 1e-9), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------- encoder
class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nacc = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nacc += length
        while self.nacc >= 8:
            self.nacc -= 8
            byte = (self.acc >> self.nacc) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # stuffing

    def pad_to_byte(self) -> None:
        if self.nacc:
            self.put((1 << (8 - self.nacc)) - 1, 8 - self.nacc)  # pad with 1s


def _encode_block(writer, block, q, dc_codes, ac_codes, pred):
    """Forward DCT (integer-snapped), quantize (half-away), entropy-code
    one 8x8 block. Returns the new DC predictor."""
    f = block.astype(np.float64) - 128.0
    coeffs = _A @ f @ _A.T
    # snap to integers: a constant block has exactly-integer coefficients
    # modulo ~1e-13 float noise; snapping makes quantization ties exact
    # rationals so SQL (and any other engine) reproduces them.
    coeffs = _round_half_away(coeffs).astype(np.int64)
    zz = coeffs.reshape(64)[ZIGZAG]
    qz = q.reshape(64)[ZIGZAG]
    quant = _round_half_away(zz / qz).astype(np.int64)

    def cat(v: int) -> int:
        return int(abs(v)).bit_length()

    diff = int(quant[0]) - pred
    t = cat(diff)
    code, ln = dc_codes[t]
    writer.put(code, ln)
    if t:
        writer.put(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = int(np.nonzero(quant[1:])[0][-1]) + 1 if np.any(quant[1:]) else 0
    for k in range(1, last_nz + 1):
        v = int(quant[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]
            writer.put(code, ln)
            run -= 16
        s = cat(v)
        code, ln = ac_codes[(run << 4) | s]
        writer.put(code, ln)
        writer.put(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, ln = ac_codes[0x00]
        writer.put(code, ln)
    return int(quant[0])


def jpeg_bytes(
    img: np.ndarray,
    quality: int = 50,
    *,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Encode an (H, W) / (H, W, 1) grayscale or (H, W, 3) RGB uint8
    array as a baseline JFIF JPEG. subsampling: '444' or '420' (RGB
    only; chroma is box-mean downsampled)."""
    if img.ndim == 2:
        img = img[:, :, None]
    if img.dtype != np.uint8 or img.ndim != 3 or img.shape[2] not in (1, 3):
        raise ValueError("jpeg_bytes expects (H, W[, 1|3]) uint8")
    h, w, nc = img.shape
    if h == 0 or w == 0:
        raise ValueError("jpeg_bytes: empty image")
    gray = nc == 1
    if subsampling not in ("444", "420"):
        raise ValueError(f"jpeg_bytes: unsupported subsampling {subsampling!r}")
    sub = 1 if (gray or subsampling == "444") else 2

    qlum = scaled_quant(QUANT_LUM, quality).reshape(8, 8)
    qchrom = scaled_quant(QUANT_CHROM, quality).reshape(8, 8)

    if gray:
        planes = [img[:, :, 0].astype(np.float64)]
    else:
        rgbf = img.astype(np.float64)
        r, g, bl = rgbf[:, :, 0], rgbf[:, :, 1], rgbf[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * bl
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * bl
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * bl
        # integer samples before the DCT: gray inputs get Y=v, Cb=Cr=128
        # EXACTLY, which the corpus oracle's closed form requires.
        planes = [_round_half_away(p) for p in (y, cb, cr)]
        if sub == 2:
            def down2(p):
                hh = (p.shape[0] + 1) & ~1
                ww = (p.shape[1] + 1) & ~1
                pp = np.pad(p, ((0, hh - p.shape[0]), (0, ww - p.shape[1])), mode="edge")
                return _round_half_away(
                    (pp[0::2, 0::2] + pp[0::2, 1::2] + pp[1::2, 0::2] + pp[1::2, 1::2]) / 4.0
                )
            planes = [planes[0], down2(planes[1]), down2(planes[2])]

    # pad each plane to a multiple of its block grid within the MCU
    mcu = 8 * sub
    mcus_x = (w + mcu - 1) // mcu
    mcus_y = (h + mcu - 1) // mcu
    padded = []
    for i, p in enumerate(planes):
        tw = mcus_x * (8 * sub if i == 0 else 8)
        th = mcus_y * (8 * sub if i == 0 else 8)
        padded.append(
            np.pad(p, ((0, th - p.shape[0]), (0, tw - p.shape[1])), mode="edge")
        )

    dc_lum = _canonical_codes(*_DC_LUM)
    ac_lum = _canonical_codes(*_AC_LUM)
    dc_chrom = _canonical_codes(*_DC_CHROM)
    ac_chrom = _canonical_codes(*_AC_CHROM)

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tq, tbl in ((0, qlum),) + (() if gray else ((1, qchrom),)):
        zz = tbl.reshape(64)[ZIGZAG]  # DQT payload is in zigzag order
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) + bytes(int(v) for v in zz)
    ncomp = 1 if gray else 3
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    if gray:
        out += bytes([1, 0x11, 0])
    else:
        out += bytes([1, (sub << 4) | sub, 0, 2, 0x11, 1, 3, 0x11, 1])
    for tc, th, (bits, vals) in (
        (0, 0, _DC_LUM),
        (1, 0, _AC_LUM),
    ) + (() if gray else ((0, 1, _DC_CHROM), (1, 1, _AC_CHROM))):
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals)) + bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    if gray:
        out += bytes([1, 0x00])
    else:
        out += bytes([1, 0x00, 2, 0x11, 3, 0x11])
    out += b"\x00\x3f\x00"  # Ss/Se/Ah-Al (baseline fixed)

    writer = _BitWriter()
    pred = [0] * ncomp
    rst = 0
    for m in range(mcus_x * mcus_y):
        if restart_interval and m and m % restart_interval == 0:
            writer.pad_to_byte()
            out += bytes(writer.out)
            writer = _BitWriter()
            out += bytes([0xFF, 0xD0 + rst])
            rst = (rst + 1) & 7
            pred = [0] * ncomp
        my, mx = divmod(m, mcus_x)
        for ci in range(ncomp):
            hs = vs = sub if ci == 0 and not gray else 1
            if gray:
                hs = vs = 1
            q = qlum if ci == 0 else qchrom
            dc = dc_lum if ci == 0 else dc_chrom
            ac = ac_lum if ci == 0 else ac_chrom
            for by in range(vs):
                for bx in range(hs):
                    y0 = (my * vs + by) * 8
                    x0 = (mx * hs + bx) * 8
                    block = padded[ci][y0 : y0 + 8, x0 : x0 + 8]
                    pred[ci] = _encode_block(writer, block, q, dc, ac, pred[ci])
    writer.pad_to_byte()
    out += bytes(writer.out)
    out += b"\xff\xd9"  # EOI
    return bytes(out)
