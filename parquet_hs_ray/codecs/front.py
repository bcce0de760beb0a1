"""FRONT codec: incremental (front) coding for variable-length binary —
the idea behind Parquet's DELTA_BYTE_ARRAY encoding (prefix lengths +
suffixes; reference models only PLAIN/dict BYTE_ARRAY,
/root/reference/src/Parquet/Stream/Reader.hs:205-209): each value stores
the byte length of its common prefix with the PREVIOUS value and only
the remaining suffix bytes.  Sorted or clustered string columns (ids,
paths, URLs, date-strings) collapse to a few bytes per row.

Both directions are fully vectorized over a padded (n x max_len) byte
matrix — no per-row Python:

- encode: one scatter fill, one ``==`` compare of adjacent rows, one
  ``cumprod`` per-row prefix run, one ragged suffix gather;
- decode: suffix scatter + per-COLUMN inheritance — for column j the
  authoritative byte of row i lives in the nearest row r <= i with
  ``prefix_len[r] <= j`` (it wrote its own byte there), found with one
  ``np.maximum.accumulate`` per column.  max_len is capped (the matrix
  is the working set), so the column loop is bounded and each pass is
  a contiguous O(n) kernel.

Layout: ``varint(n)`` + FOR-encoded prefix lens + FOR-encoded suffix
lens + ``varint(raw_len)`` + suffix bytes.
"""

from __future__ import annotations

import numpy as np

from .intpack import decode_int, encode_int
from .varint import decode_varint, encode_varint

#: hard cap on the padded row width: past this the matrix working set
#: (n x max_len) stops being cache-friendly and the codec is refused —
#: the selector never picks FRONT above it.
MAX_VALUE_LEN = 4096


def _byte_matrix(lens: np.ndarray, flat: np.ndarray,
                 max_len: int) -> np.ndarray:
    """(n x max_len) zero-padded byte matrix from ragged (lens, flat)."""
    n = len(lens)
    m = np.zeros((n, max_len), dtype=np.uint8)
    if len(flat):
        starts = np.cumsum(lens) - lens
        rows = np.repeat(np.arange(n, dtype=np.int64), lens)
        cols = np.arange(len(flat), dtype=np.int64) - np.repeat(starts, lens)
        m[rows, cols] = flat
    return m


def front_prefix_lens(lens: np.ndarray, raw: bytes | np.ndarray
                      ) -> np.ndarray:
    """Common-prefix length of each value with its predecessor (first
    value: 0).  Shared by the encoder and the selector's trial."""
    n = len(lens)
    lens = np.ascontiguousarray(lens, dtype=np.int64)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    flat = np.frombuffer(raw, dtype=np.uint8) if isinstance(
        raw, (bytes, bytearray, memoryview)) else raw.astype(np.uint8)
    max_len = int(lens.max()) if n else 0
    if max_len == 0:
        return np.zeros(n, dtype=np.int64)
    m = _byte_matrix(lens, flat, max_len)
    eq = m[1:] == m[:-1]
    run = np.cumprod(eq, axis=1, dtype=np.uint8).sum(axis=1).astype(np.int64)
    lcp = np.minimum(run, np.minimum(lens[1:], lens[:-1]))
    return np.concatenate([np.zeros(1, dtype=np.int64), lcp])


def encode_front(lens: np.ndarray, raw: bytes | np.ndarray) -> bytes:
    """Front-code a ragged binary column (nulls must be length 0)."""
    lens = np.ascontiguousarray(lens, dtype=np.int64)
    n = len(lens)
    max_len = int(lens.max()) if n else 0
    if max_len > MAX_VALUE_LEN:
        raise ValueError(
            f"front coding caps value length at {MAX_VALUE_LEN} bytes, "
            f"got {max_len}")
    flat = np.frombuffer(raw, dtype=np.uint8) if isinstance(
        raw, (bytes, bytearray, memoryview)) else raw.astype(np.uint8)
    plens = front_prefix_lens(lens, flat)
    slens = lens - plens
    starts = (np.cumsum(lens) - lens) + plens
    idx = (np.arange(int(slens.sum()), dtype=np.int64)
           - np.repeat(np.cumsum(slens) - slens, slens)
           + np.repeat(starts, slens)) if n else np.zeros(0, np.int64)
    sfx = flat[idx].tobytes()
    enc_p = encode_int(plens, "for")
    enc_s = encode_int(slens, "for")
    return (encode_varint(n)
            + encode_varint(len(enc_p)) + enc_p
            + encode_varint(len(enc_s)) + enc_s
            + encode_varint(len(sfx)) + sfx)


def decode_front(data: bytes, pos: int = 0
                 ) -> tuple[np.ndarray, bytes, int]:
    """Inverse of :func:`encode_front`: returns (lens, raw bytes, pos)."""
    n, pos = decode_varint(data, pos)
    p_len, pos = decode_varint(data, pos)
    plens, used = decode_int(data, np.int64, pos)
    if used - pos != p_len:
        raise ValueError("front prefix-lens section size mismatch")
    pos = used
    s_len, pos = decode_varint(data, pos)
    slens, used = decode_int(data, np.int64, pos)
    if used - pos != s_len:
        raise ValueError("front suffix-lens section size mismatch")
    pos = used
    raw_len, pos = decode_varint(data, pos)
    sfx = np.frombuffer(data[pos:pos + raw_len], dtype=np.uint8)
    pos += raw_len
    if len(plens) != n or len(slens) != n:
        raise ValueError("front length sections row-count mismatch")
    lens = plens + slens
    if n == 0:
        return lens, b"", pos
    if plens[0] != 0 or (plens[1:] > lens[:-1]).any() or (plens < 0).any():
        raise ValueError("front prefix lens violate the chain invariant")
    max_len = int(lens.max())
    if max_len > MAX_VALUE_LEN:
        raise ValueError("front value length exceeds codec cap")
    if max_len == 0:
        return lens, b"", pos

    m = np.zeros((n, max_len), dtype=np.uint8)
    # place suffix bytes at columns [plens[i], lens[i])
    s_starts = np.cumsum(slens) - slens
    rows = np.repeat(np.arange(n, dtype=np.int64), slens)
    cols = (np.arange(len(sfx), dtype=np.int64)
            - np.repeat(s_starts, slens) + np.repeat(plens, slens))
    if len(sfx) != int(slens.sum()):
        raise ValueError("front suffix byte count mismatch")
    m[rows, cols] = sfx
    # inherit prefix bytes: per column j, the byte comes from the nearest
    # row above with plens <= j (row 0 always qualifies: plens[0] == 0)
    ridx = np.arange(n, dtype=np.int64)
    for j in range(max_len):
        owners = np.maximum.accumulate(np.where(plens <= j, ridx, -1))
        col = m[:, j]
        col[:] = col[owners]
    starts = np.cumsum(lens) - lens
    gather = (np.arange(int(lens.sum()), dtype=np.int64)
              - np.repeat(starts, lens)
              + np.repeat(ridx * max_len, lens))
    return lens, m.reshape(-1)[gather].tobytes(), pos
