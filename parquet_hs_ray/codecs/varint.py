"""ULEB128 varint encode/decode.

Semantics pinned by the reference golden vectors
(`/root/reference/tests/unit/Parquet/Decoder/Spec.hs:54-68`):
``624485 <-> [0xE5, 0x8E, 0x26]``, decode returns (value, consumed).

The reference's ``encodeVarint 0`` emits ZERO bytes
(`/root/reference/src/Parquet/Decoder.hs:155-163`) — a quirk we do NOT
replicate in our on-disk format (a zero header must occupy one byte to be
self-delimiting); ``encode_varint(0) == b"\\x00"`` here. The reference's
decode-side byte limit (`cLeb128ByteLimit = 32`,
`/root/reference/src/Parquet/Decoder.hs:31-32`) is kept as a corruption guard.
"""

from __future__ import annotations

_LEB128_BYTE_LIMIT = 32  # mirrors reference cLeb128ByteLimit (Decoder.hs:31-32)


def encode_varint(value: int) -> bytes:
    """Encode a non-negative int as ULEB128 bytes (0 -> b"\\x00")."""
    if value < 0:
        raise ValueError("varint must be non-negative")
    out = bytearray()
    while True:
        b = value & 0x7F
        value >>= 7
        if value:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def decode_varint(buf: bytes, pos: int = 0) -> tuple[int, int]:
    """Decode a ULEB128 varint from ``buf`` at ``pos``.

    Returns ``(value, new_pos)``. Mirrors the reference decoder
    (`/root/reference/src/Parquet/Decoder.hs:138-152`): little-endian 7-bit
    groups, continuation bit 0x80, at most 32 bytes.
    """
    result = 0
    shift = 0
    start = pos
    while True:
        if pos - start >= _LEB128_BYTE_LIMIT:
            raise ValueError("varint longer than 32 bytes")
        try:
            b = buf[pos]
        except IndexError:
            raise ValueError("truncated varint") from None
        pos += 1
        result |= (b & 0x7F) << shift
        if not (b & 0x80):
            return result, pos
        shift += 7


def zigzag_encode(value: int) -> int:
    """Map a signed int to an unsigned one (0,-1,1,-2,... -> 0,1,2,3,...)."""
    return value * 2 if value >= 0 else -value * 2 - 1


def zigzag_decode(value: int) -> int:
    return value // 2 if value % 2 == 0 else -(value + 1) // 2
