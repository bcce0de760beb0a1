"""DELTA codec: zigzag-encoded consecutive differences over PFOR.

The reference *declares* DELTA_BINARY_PACKED in its encoding enum but
never decodes it (`/root/reference/src/Parquet/Types/Enums.hs:70-79`,
unsupported in `read_page_content`, `Stream/Reader.hs:159-162`); this is
our working equivalent for sorted/clustered integer columns (row ids,
timestamps): store the first value, then PFOR over zigzag(diff) — runs of
constant step become tiny, outlier jumps are PFOR exceptions.

Payload::

    varint zigzag(first) | PFOR payload of zigzag'd diffs (n-1 values)

All arithmetic is two's-complement wraparound in the column's physical
width, so full-range int64 round-trips exactly.
"""

from __future__ import annotations

import numpy as np

from .pfor import decode_pfor, encode_pfor, estimate_pfor
from .varint import decode_varint, encode_varint, zigzag_decode, zigzag_encode


def _unsigned_view(values: np.ndarray) -> np.ndarray:
    if values.dtype.kind == "i":
        return values.view(values.dtype.str.replace("i", "u"))
    return values


def _zigzag_np(signed: np.ndarray) -> np.ndarray:
    """Vectorized zigzag: sign bit to bit 0."""
    bits = 8 * signed.dtype.itemsize
    u = signed.view(signed.dtype.str.replace("i", "u"))
    return (u << u.dtype.type(1)) ^ _unsigned_view(signed >> (bits - 1))


def _unzigzag_np(z: np.ndarray) -> np.ndarray:
    s = z.view(z.dtype.str.replace("u", "i"))
    return (z >> z.dtype.type(1)).view(s.dtype) ^ -(s & s.dtype.type(1))


def encode_delta(values: np.ndarray) -> bytes:
    n = len(values)
    if n == 0:
        return encode_varint(0) + encode_varint(0)
    values = np.ascontiguousarray(values)
    u = _unsigned_view(values)
    first = int(values[0])
    diffs_u = u[1:] - u[:-1]  # wraparound
    zz = _zigzag_np(diffs_u.view(diffs_u.dtype.str.replace("u", "i")))
    payload = encode_pfor(zz)
    return encode_varint(1) + encode_varint(zigzag_encode(first)) + payload


def decode_delta(data: bytes, np_dtype, pos: int = 0) -> tuple[np.ndarray, int]:
    np_dtype = np.dtype(np_dtype)
    flag, pos = decode_varint(data, pos)
    if flag == 0:
        _, pos = decode_varint(data, pos)
        return np.empty(0, dtype=np_dtype), pos
    zf, pos = decode_varint(data, pos)
    first = zigzag_decode(zf)
    udt = np.dtype(np_dtype.str.replace("i", "u")) if np_dtype.kind == "i" else np_dtype
    zz, pos = decode_pfor(data, udt, pos)
    diffs = _unzigzag_np(zz.view(udt)).view(udt)
    out = np.empty(len(zz) + 1, dtype=udt)
    mask = (1 << (8 * np_dtype.itemsize)) - 1
    out[0] = first & mask
    np.cumsum(diffs, dtype=udt, out=out[1:])
    out[1:] += out[0]
    return out.view(np_dtype), pos


def estimate_delta(sample_windows: np.ndarray, n: int) -> int:
    """Selector hook: predicted size from CONTIGUOUS sample windows (stride
    sampling would destroy the consecutive-difference structure)."""
    if len(sample_windows) < 2:
        return 1 << 30
    u = _unsigned_view(np.ascontiguousarray(sample_windows))
    diffs_u = u[1:] - u[:-1]
    zz = _zigzag_np(diffs_u.view(diffs_u.dtype.str.replace("u", "i")))
    return estimate_pfor(zz, n) + 10
