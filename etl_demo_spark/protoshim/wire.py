"""Protobuf wire-format primitives (public spec: protobuf.dev/encoding).

Only what StateMessage needs: varint (wire type 0) and length-delimited
(wire type 2), plus correct SKIPPING of all five wire types so unknown
fields from a newer JVM never break the parser.
"""

from __future__ import annotations

_MASK64 = (1 << 64) - 1

# wire types
WT_VARINT = 0
WT_I64 = 1
WT_LEN = 2
WT_SGROUP = 3
WT_EGROUP = 4
WT_I32 = 5


def encode_varint(value: int) -> bytes:
    """Unsigned LEB128. Negative int32/int64 values follow the protobuf
    rule: two's-complement widened to 64 bits → always 10 bytes."""
    value &= _MASK64
    out = bytearray()
    while True:
        b = value & 0x7F
        value >>= 7
        if value:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def decode_varint(buf: bytes, pos: int) -> tuple[int, int]:
    """(value, new_pos); raises on truncation or >10-byte runaway."""
    result = shift = 0
    for _ in range(10):
        if pos >= len(buf):
            raise ValueError("protoshim: truncated varint")
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result & _MASK64, pos
        shift += 7
    raise ValueError("protoshim: varint longer than 10 bytes")


def varint_to_signed(value: int) -> int:
    """Interpret a decoded varint as a signed two's-complement int64 —
    the encoding plain int32/int64 fields use (protobuf widens int32
    negatives to 64 bits on the wire; this is NOT sint zigzag)."""
    value &= (1 << 64) - 1
    if value >= 1 << 63:
        value -= 1 << 64
    return value


def encode_tag(field_number: int, wire_type: int) -> bytes:
    return encode_varint((field_number << 3) | wire_type)


def encode_len_delimited(field_number: int, payload: bytes) -> bytes:
    return encode_tag(field_number, WT_LEN) + encode_varint(len(payload)) + payload


def encode_varint_field(field_number: int, value: int) -> bytes:
    return encode_tag(field_number, WT_VARINT) + encode_varint(value)


def skip_field(buf: bytes, pos: int, wire_type: int) -> int:
    """Position after an unknown field's payload."""
    if wire_type == WT_VARINT:
        _, pos = decode_varint(buf, pos)
        return pos
    if wire_type == WT_I64:
        return pos + 8
    if wire_type == WT_LEN:
        n, pos = decode_varint(buf, pos)
        return pos + n
    if wire_type == WT_I32:
        return pos + 4
    raise ValueError(f"protoshim: cannot skip wire type {wire_type}")


def iter_fields(buf: bytes):
    """Yield (field_number, wire_type, value, next_pos) over a message.

    ``value`` is the raw varint int for WT_VARINT, the payload bytes for
    WT_LEN, and None for skipped fixed-width types.
    """
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = decode_varint(buf, pos)
        field_number, wire_type = tag >> 3, tag & 7
        if field_number == 0:
            raise ValueError("protoshim: field number 0")
        if wire_type == WT_VARINT:
            value, pos = decode_varint(buf, pos)
            yield field_number, wire_type, value, pos
        elif wire_type == WT_LEN:
            ln, pos = decode_varint(buf, pos)
            if pos + ln > n:
                raise ValueError("protoshim: truncated length-delimited field")
            yield field_number, wire_type, buf[pos : pos + ln], pos + ln
            pos += ln
        else:
            pos = skip_field(buf, pos, wire_type)
            yield field_number, wire_type, None, pos
