"""Z-order (Morton) keys for multi-column data layout.

A single sort key can only lengthen runs / tighten min-max stats for ONE
column family; a 100 TB table queried on two independent predicates
(e.g. ``l_partkey`` AND ``l_suppkey``) wants its partitions clustered in
BOTH dimensions so the manifest's per-partition min/max boxes stay small
and ``decode_dataset(predicate=...)`` can prune on either column.  The
classic public construction (Morton 1966; used by every modern lakehouse
layout optimizer) interleaves the bits of rank-scaled column values so
sorting by the interleaved key yields a space-filling-curve layout whose
blocks are near-cubes in value space.

Everything here is exact integer math — scale is
``(x - lo) * 65535 // (hi - lo)`` and the interleave is bit surgery —
so the whole key computation is replayable in DuckDB SQL
(:func:`morton2_sql`) and hash-exact oracled, like every other
deterministic kernel in this engine.

Kernels are pure numpy (no Ray); the layout pipeline lives in
``pipelines/encode_job.py`` / ``selector.advise_sort_order`` callers.
"""

from __future__ import annotations

import numpy as np

_U16_MAX = 65535


def scale_to_u16(x: np.ndarray, lo: float, hi: float) -> np.ndarray:
    """Exact integer min-max scale of ``x`` into [0, 65535].

    ``(x - lo) * 65535 // (hi - lo)`` evaluated in int64 — identical to
    the SQL twin's BIGINT arithmetic.  Values are clipped to [lo, hi]
    first (the caller's stats pass may be a sample at scale).  A
    degenerate column (``hi == lo``) maps to all-zeros.

    Float inputs are FLOORED first (matching the twin's
    ``CAST(floor(e) AS BIGINT)`` — numpy ``astype`` truncates toward
    zero, which would diverge for negative floats).  Ranges wider than
    2^47 (where the int64 multiply would silently wrap — e.g. nanosecond
    timestamps spanning days) are pre-shifted: both ``x-lo`` and the
    range drop the same low bits, keeping the scale monotone and
    in-bounds; the SQL twin does not support such ranges (DuckDB raises
    Out of Range on the BIGINT multiply)."""
    xa = np.asarray(x)
    if xa.dtype.kind == "f":
        xa = np.floor(xa)
    xi = xa.astype(np.int64)
    lo_i, hi_i = np.int64(lo), np.int64(hi)
    if hi_i == lo_i:
        return np.zeros(len(xi), dtype=np.uint16)
    xi = np.clip(xi, lo_i, hi_i)
    # differences in modular uint64: exact even when hi-lo itself would
    # overflow int64 (a full-range column) — the wrap is intended
    with np.errstate(over="ignore"):
        span = np.uint64(hi_i) - np.uint64(lo_i)
        off = xi.astype(np.uint64) - np.uint64(lo_i)
    shift = max(0, int(span).bit_length() - 47)
    if shift:
        off >>= np.uint64(shift)
        span >>= np.uint64(shift)
    return (off * np.uint64(_U16_MAX) // span).astype(np.uint16)


def _spread16(v: np.ndarray) -> np.ndarray:
    """Spread a uint16's bits into the even bit positions of a uint32
    (b15..b0 -> b30,b28,..,b0) — the standard Morton magic-shift chain."""
    x = v.astype(np.uint64)
    x = (x | (x << np.uint64(8))) & np.uint64(0x00FF00FF)
    x = (x | (x << np.uint64(4))) & np.uint64(0x0F0F0F0F)
    x = (x | (x << np.uint64(2))) & np.uint64(0x33333333)
    x = (x | (x << np.uint64(1))) & np.uint64(0x55555555)
    return x


def morton2(u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Interleave two uint16 rank values into a uint32-range uint64 key:
    ``u`` takes the even bits (LSB side), ``v`` the odd bits."""
    return _spread16(np.asarray(u, dtype=np.uint16)) | (
        _spread16(np.asarray(v, dtype=np.uint16)) << np.uint64(1))


def morton_key2(x: np.ndarray, x_lo: float, x_hi: float,
                y: np.ndarray, y_lo: float, y_hi: float) -> np.ndarray:
    """Full 2-D z-key: min-max scale both columns to u16 then interleave.
    Returned as int64 (Arrow-friendly; values fit in 32 bits)."""
    return morton2(scale_to_u16(x, x_lo, x_hi),
                   scale_to_u16(y, y_lo, y_hi)).astype(np.int64)


def _spread16_by3(v: np.ndarray) -> np.ndarray:
    """Spread a uint16's bits to every THIRD bit of a 48-bit value
    (b15..b0 -> b45,b42,..,b0) — the 3-D Morton magic-shift chain."""
    x = v.astype(np.uint64)
    x = (x | (x << np.uint64(16))) & np.uint64(0x0000FF0000FF)
    x = (x | (x << np.uint64(8))) & np.uint64(0x00F00F00F00F)
    x = (x | (x << np.uint64(4))) & np.uint64(0x0C30C30C30C3)
    x = (x | (x << np.uint64(2))) & np.uint64(0x249249249249)
    return x


def morton3(u: np.ndarray, v: np.ndarray, w: np.ndarray) -> np.ndarray:
    """Interleave three uint16 rank values into a 48-bit uint64 key."""
    return (_spread16_by3(np.asarray(u, dtype=np.uint16))
            | (_spread16_by3(np.asarray(v, dtype=np.uint16)) << np.uint64(1))
            | (_spread16_by3(np.asarray(w, dtype=np.uint16)) << np.uint64(2)))


def morton_key3(x, x_lo, x_hi, y, y_lo, y_hi, z, z_lo, z_hi) -> np.ndarray:
    """Full 3-D z-key (int64; values fit in 48 bits)."""
    return morton3(scale_to_u16(x, x_lo, x_hi),
                   scale_to_u16(y, y_lo, y_hi),
                   scale_to_u16(z, z_lo, z_hi)).astype(np.int64)


def _scale_sql(e: str, lo, hi) -> str:
    # floor() before the BIGINT cast: CAST alone rounds half-even, the
    # kernel floors — floor() is a no-op on integer columns
    return (f"((least(greatest(CAST(floor({e}) AS BIGINT), {lo}), {hi}) - {lo})"
            f" * 65535 // greatest({hi} - {lo}, 1))")


def morton3_sql(x_expr: str, x_lo, x_hi, y_expr: str, y_lo, y_hi,
                z_expr: str, z_lo, z_hi) -> str:
    """DuckDB twin of :func:`morton_key3`: 48-term bit-gather sum."""
    parts = []
    for off, (e, lo, hi) in enumerate(((x_expr, x_lo, x_hi),
                                       (y_expr, y_lo, y_hi),
                                       (z_expr, z_lo, z_hi))):
        s = _scale_sql(e, lo, hi)
        parts += [f"((({s} >> {i}) & 1) << {3 * i + off})" for i in range(16)]
    return "(" + " + ".join(parts) + ")"


def morton2_sql(x_expr: str, x_lo, x_hi, y_expr: str, y_lo, y_hi) -> str:
    """The DuckDB twin of :func:`morton_key2` as a SQL expression: the
    same integer min-max scale, then a 16-term bit-gather sum per column
    (``(((u >> i) & 1) << 2i)``) — exact BIGINT arithmetic throughout.
    ``lo``/``hi`` may be int literals or SQL column references (e.g. a
    stats CTE); the ``greatest(hi-lo, 1)`` divisor reproduces the
    kernel's degenerate-column all-zeros behavior (clipped ``x-lo`` is 0
    when hi==lo), so the twin stays exact there too."""
    u, v = _scale_sql(x_expr, x_lo, x_hi), _scale_sql(y_expr, y_lo, y_hi)
    terms = [f"((({u} >> {i}) & 1) << {2 * i})" for i in range(16)]
    terms += [f"((({v} >> {i}) & 1) << {2 * i + 1})" for i in range(16)]
    return "(" + " + ".join(terms) + ")"
