"""Parquet Split-Block Bloom Filters (parquet-format BloomFilter.md).

Point-lookup scan reduction for the self-hosted read path: a column
chunk's bloom answers "is value X definitely absent from this row
group?" without touching any page, so an equality predicate on a
HIGH-CARDINALITY, UNSORTED column (where min/max statistics prune
nothing) still skips row groups.  At 100 TB this is the difference
between decoding every row group of every file and touching only the
ones whose 32-byte-block filter admits the probe.

Spec pieces implemented here, all from the public parquet-format repo:

- **XXH64** (seed 0) over the value's PLAIN encoding — 4/8-byte
  little-endian for INT32/INT64/FLOAT/DOUBLE, raw bytes (no length
  prefix) for BYTE_ARRAY.  Two independent implementations: a general
  byte-string one (`xxh64`) following Yann Collet's published spec,
  and vectorized numpy ones for the fixed 4- and 8-byte short paths
  (`xxh64_fixed4` / `xxh64_fixed8`); tests assert they agree, which
  guards each against transcription slips.
- **Split-block bloom**: ``z`` 32-byte blocks, block chosen by
  ``((h >> 32) * z) >> 32``, one bit set per 32-bit word of the block
  via the eight spec salts applied to the LOW 32 bits of the hash.
- **BloomFilterHeader** thrift struct (numBytes + BLOCK/XXHASH/
  UNCOMPRESSED unions) at ``ColumnMetaData.bloom_filter_offset``
  (field 14; length in field 15), written by `parquet_writer.py` and
  parsed back by `parquet_footer.py`.

The reference models ColumnMetaData but stops before the bloom fields
(`/root/reference/src/Parquet/Types/ColumnChunk.hs:19-30`); this is a
forward-looking superset of its metadata surface.
"""

from __future__ import annotations

import numpy as np

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1

# the eight block salts from parquet-format BloomFilter.md
_SALT = np.array([0x47B6137B, 0x44974D91, 0x8824AD5B, 0xA2B7289D,
                  0x705495C7, 0x2DF1424B, 0x9EFC4947, 0x5C6BFB31],
                 dtype=np.uint32)


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def xxh64(data: bytes, seed: int = 0) -> int:
    """XXH64 of a byte string (general path, any length)."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P1) & _M64
        while i + 32 <= n:
            for j, v in enumerate((v1, v2, v3, v4)):
                lane = int.from_bytes(data[i + 8 * j:i + 8 * j + 8],
                                      "little")
                v = _rotl((v + lane * _P2) & _M64, 31) * _P1 & _M64
                if j == 0:
                    v1 = v
                elif j == 1:
                    v2 = v
                elif j == 2:
                    v3 = v
                else:
                    v4 = v
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12)
             + _rotl(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h ^= _rotl((v * _P2) & _M64, 31) * _P1 & _M64
            h = ((h * _P1) + _P4) & _M64
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        k = int.from_bytes(data[i:i + 8], "little")
        h ^= _rotl((k * _P2) & _M64, 31) * _P1 & _M64
        h = ((_rotl(h, 27) * _P1) + _P4) & _M64
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i:i + 4], "little") * _P1) & _M64
        h = ((_rotl(h, 23) * _P2) + _P3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M64
        h = (_rotl(h, 11) * _P1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


def _rotl_np(x: np.ndarray, r: int) -> np.ndarray:
    return (x << np.uint64(r)) | (x >> np.uint64(64 - r))


def _avalanche_np(h: np.ndarray) -> np.ndarray:
    h = h ^ (h >> np.uint64(33))
    h = h * np.uint64(_P2)
    h = h ^ (h >> np.uint64(29))
    h = h * np.uint64(_P3)
    h = h ^ (h >> np.uint64(32))
    return h


def xxh64_fixed8(vals: np.ndarray, seed: int = 0) -> np.ndarray:
    """Vectorized XXH64 of many 8-byte little-endian values (the plain
    encoding of INT64/DOUBLE).  ``vals`` is viewed as uint64."""
    k = np.ascontiguousarray(vals).view(np.uint64).ravel()
    with np.errstate(over="ignore"):
        h = np.full(k.shape, (seed + _P5 + 8) & _M64, dtype=np.uint64)
        h = h ^ (_rotl_np(k * np.uint64(_P2), 31) * np.uint64(_P1))
        h = _rotl_np(h, 27) * np.uint64(_P1) + np.uint64(_P4)
        return _avalanche_np(h)


def xxh64_fixed4(vals: np.ndarray, seed: int = 0) -> np.ndarray:
    """Vectorized XXH64 of many 4-byte little-endian values (the plain
    encoding of INT32/FLOAT).  ``vals`` is viewed as uint32."""
    k = np.ascontiguousarray(vals).view(np.uint32).ravel().astype(np.uint64)
    with np.errstate(over="ignore"):
        h = np.full(k.shape, (seed + _P5 + 4) & _M64, dtype=np.uint64)
        h = h ^ (k * np.uint64(_P1))
        h = _rotl_np(h, 23) * np.uint64(_P2) + np.uint64(_P3)
        return _avalanche_np(h)


def hash_plain_values(leaf, physical: str) -> np.ndarray:
    """XXH64 hashes (uint64) of an Arrow leaf array's non-null values
    under their parquet PLAIN encodings.  Supported physicals:
    INT32/INT64/FLOAT/DOUBLE (vectorized, plain int/uint/float storage
    only — the width check rejects arrow->numpy conversions that
    change the byte image, e.g. date32 -> datetime64[D]) and
    BYTE_ARRAY (per-unique-value); anything else raises (callers
    validate at the API edge)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    leaf = leaf.combine_chunks() if isinstance(leaf, pa.ChunkedArray) else leaf
    vals = leaf.drop_null()
    if physical in ("INT64", "DOUBLE", "INT32", "FLOAT"):
        width = 8 if physical in ("INT64", "DOUBLE") else 4
        a = np.ascontiguousarray(vals.to_numpy(zero_copy_only=False))
        if a.dtype.kind not in "iuf" or a.dtype.itemsize != width:
            raise ValueError(
                f"bloom: {vals.type} storage does not plain-encode as "
                f"{physical}")
        return (xxh64_fixed8 if width == 8 else xxh64_fixed4)(a)
    if physical == "BYTE_ARRAY":
        if pa.types.is_string(vals.type) or pa.types.is_large_string(
                vals.type):
            vals = pc.cast(vals, pa.binary())
        uniq = pc.unique(vals)
        return np.fromiter((xxh64(v.as_py()) for v in uniq),
                           dtype=np.uint64, count=len(uniq))
    raise ValueError(
        f"bloom filter unsupported for physical type {physical}")


def hash_probe_values(values: list, physical: str) -> np.ndarray:
    """XXH64 hashes of plain Python probe values under ``physical``'s
    PLAIN encoding — the predicate side of :func:`hash_plain_values`
    (which handles the arrow-array write side)."""
    if physical in ("INT64", "INT32"):
        width = 8 if physical == "INT64" else 4
        try:
            a = np.array(values, dtype=np.int64 if width == 8
                         else np.int32)
            if width == 4 and any(int(v) != int(a[i])
                                  for i, v in enumerate(values)):
                raise OverflowError  # out-of-range int32 probe
        except OverflowError:
            a = np.array(values, dtype=np.uint64 if width == 8
                         else np.uint32)
        return (xxh64_fixed8 if width == 8 else xxh64_fixed4)(a)
    if physical == "DOUBLE":
        return xxh64_fixed8(np.array(values, dtype=np.float64))
    if physical == "FLOAT":
        return xxh64_fixed4(np.array(values, dtype=np.float32))
    if physical == "BYTE_ARRAY":
        bs = [v.encode() if isinstance(v, str) else bytes(v)
              for v in values]
        return np.fromiter((xxh64(b) for b in bs), dtype=np.uint64,
                           count=len(bs))
    raise ValueError(
        f"bloom filter unsupported for physical type {physical}")


def _next_pow2(n: int) -> int:
    return 1 << max(0, (n - 1).bit_length())


class SplitBlockBloom:
    """One split-block bloom filter: ``z`` blocks of eight 32-bit
    words.  ``bitset`` is little-endian on disk; in memory a
    ``(z, 8)`` uint32 array."""

    def __init__(self, num_bytes: int):
        if num_bytes < 32 or num_bytes % 32:
            raise ValueError(f"bitset bytes must be a multiple of 32 "
                             f">= 32, got {num_bytes}")
        self.blocks = np.zeros((num_bytes // 32, 8), dtype=np.uint32)

    @classmethod
    def for_ndv(cls, ndv: int, fpp: float = 0.01) -> "SplitBlockBloom":
        """Size for ``ndv`` distinct values at ~``fpp`` false-positive
        rate.  The standard split-block sizing: c = bits per value =
        1.08 / fpp is conservative; we use the parquet-mr table's
        closed form ``-8 / log(1 - fpp^(1/8))`` bits per value and
        round the bitset up to a power of two (32 B .. 128 MiB)."""
        import math

        bits_per_val = -8.0 / math.log(1.0 - fpp ** (1.0 / 8.0))
        nbytes = _next_pow2(int(max(1, ndv) * bits_per_val / 8.0) or 1)
        return cls(min(max(nbytes, 32), 128 << 20))

    @classmethod
    def from_bytes(cls, raw: bytes) -> "SplitBlockBloom":
        f = cls.__new__(cls)
        f.blocks = np.frombuffer(raw, dtype="<u4").reshape(-1, 8).copy()
        return f

    def tobytes(self) -> bytes:
        return self.blocks.astype("<u4").tobytes()

    def _block_and_masks(self, hashes: np.ndarray):
        h = np.asarray(hashes, dtype=np.uint64)
        z = np.uint64(self.blocks.shape[0])
        with np.errstate(over="ignore"):
            block = (((h >> np.uint64(32)) * z) >> np.uint64(32)).astype(
                np.int64)
            x = h.astype(np.uint32)  # low 32 bits
            # (n, 8): one bit per word, salt-multiplied, top-5-bit index
            shifts = ((x[:, None] * _SALT[None, :]) >> np.uint32(27))
            masks = (np.uint32(1) << shifts).astype(np.uint32)
        return block, masks

    def add_hashes(self, hashes: np.ndarray) -> None:
        block, masks = self._block_and_masks(hashes)
        for w in range(8):
            np.bitwise_or.at(self.blocks[:, w], block, masks[:, w])

    def check_hashes(self, hashes: np.ndarray) -> np.ndarray:
        """Boolean array: True = MAY contain, False = definitely not."""
        block, masks = self._block_and_masks(hashes)
        words = self.blocks[block, :]  # (n, 8)
        return ((words & masks) == masks).all(axis=1)

    def might_contain_value(self, value, physical: str) -> bool:
        return bool(self.check_hashes(
            hash_probe_values([value], physical))[0])


def encode_bloom_blob(f: SplitBlockBloom) -> bytes:
    """BloomFilterHeader (thrift compact) + bitset, the on-disk layout
    at ``bloom_filter_offset``."""
    from .parquet_writer import _Struct

    bits = f.tobytes()
    header = (_Struct()
              .i32(1, len(bits))                      # numBytes
              .struct(2, _Struct().struct(1, _Struct()))   # BLOCK
              .struct(3, _Struct().struct(1, _Struct()))   # XXHASH
              .struct(4, _Struct().struct(1, _Struct())))  # UNCOMPRESSED
    return header.tobytes() + bits


def read_bloom_filter(path: str, chunk_info, filesystem=None
                      ) -> SplitBlockBloom | None:
    """Read one column chunk's bloom filter via a ranged read, or None
    when the chunk has none.  Validates the header unions: only
    BLOCK + XXHASH + UNCOMPRESSED decode (anything else returns None —
    pruning then keeps the row group, never drops it)."""
    from .parquet_pages import _read_compact_struct, _read_range

    off = getattr(chunk_info, "bloom_filter_offset", None)
    if off is None:
        return None
    length = getattr(chunk_info, "bloom_filter_length", None)
    if length is not None:
        raw = _read_range(path, off, length, filesystem)
    else:
        # header is tiny; over-read it, then read the bitset exactly
        raw = _read_range(path, off, 64, filesystem)
    try:
        header, pos = _read_compact_struct(raw, 0)
        nbytes = header[1]
        if (1 not in header.get(2, {}) or 1 not in header.get(3, {})
                or 1 not in header.get(4, {})):
            return None  # unknown algorithm/hash/compression
        if length is None:
            raw = _read_range(path, off, pos + nbytes, filesystem)
        bits = raw[pos:pos + nbytes]
        if len(bits) != nbytes:
            return None
        return SplitBlockBloom.from_bytes(bits)
    except (ValueError, KeyError, IndexError):
        return None


def prune_row_groups_by_bloom(km, preds: list, path: str,
                              filesystem=None,
                              candidates: list[int] | None = None
                              ) -> list[int]:
    """Drop row groups whose bloom filters PROVE an equality predicate
    cannot match.  ``preds`` uses the same (column, op, value) triples
    as stats pruning; only ``==`` and ``in`` participate (bloom answers
    membership, not ranges).  Missing/foreign filters keep the row
    group — one-sided, never drops a match.  Flat top-level columns
    only, same contiguous-leaf bookkeeping as stats pruning."""
    import pyarrow as pa

    from .parquet_pages import _leaf_count

    name_to_leaf: dict[str, int] = {}
    next_leaf = 0
    for fld in km.schema:
        k = _leaf_count(fld.type)
        if k == 1 and not pa.types.is_nested(fld.type):
            name_to_leaf[fld.name] = next_leaf
        next_leaf += k
    eq_preds = []
    for col, op, value in preds:
        if op == "==" and col in name_to_leaf:
            eq_preds.append((name_to_leaf[col], [value]))
        elif op == "in" and col in name_to_leaf:
            eq_preds.append((name_to_leaf[col], list(value)))
    rgs = range(len(km.row_groups)) if candidates is None else candidates
    if not eq_preds:
        return list(rgs)
    keep = []
    for rg in rgs:
        ok = True
        for ci, values in eq_preds:
            cc = km.row_groups[rg].columns[ci]
            f = read_bloom_filter(path, cc, filesystem)
            if f is None:
                continue
            physical = km.leaves[ci].physical
            try:
                h = hash_probe_values(values, physical)
            except (ValueError, TypeError, OverflowError):
                continue
            if not f.check_hashes(h).any():
                ok = False
                break
        if ok:
            keep.append(rg)
    return keep
