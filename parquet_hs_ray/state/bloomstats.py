"""Per-partition Bloom filters for point-equality partition pruning.

Min/max manifest stats (our analogue of the Statistics the reference
parses but never uses, `/root/reference/src/Parquet/Types/Primitives.hs:79-87`)
prune RANGE predicates well but are useless for equality probes on
high-cardinality columns: every partition of a uniformly distributed id
column spans nearly the full [min, max] range, so ``doc_id == X`` scans
everything.  A small Bloom filter over each partition's DISTINCT values
proves absence for such probes: the one partition that holds X is kept,
the rest are pruned (modulo the filter's false-positive rate — false
positives only cost a wasted decode, never a wrong answer).

This mirrors Parquet's own optional per-column-chunk bloom_filter_offset
metadata (a public format feature the reference's Thrift types omit).

Hashing is the repo-standard splitmix64 chain (``functions/sketches``):
integers hash their 64-bit two's-complement pattern, strings chain over
utf-8 bytes — both deterministic and replayable.  Bit placement is the
same Kirsch–Mitzenmacher double hash the decontamination Bloom uses.
"""

from __future__ import annotations

import base64

import numpy as np

from ..functions import sketches as sk

# ~16 bits per distinct key at k=4 -> false-positive rate ~0.24%
BITS_PER_KEY = 16
K_HASHES = 4
MAX_DISTINCT = 65536  # above this the filter stops paying; skip it
_KIND_BY_NP = {"i": "int", "u": "int"}


def _positions(h: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    h1 = h.astype(np.uint64)
    h2 = sk._splitmix64(h1) | np.uint64(1)  # odd stride -> full period
    i = np.arange(k, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(m_bits)).astype(np.int64)


def _hash_ints(vals: np.ndarray) -> np.ndarray:
    return sk._splitmix64(vals.astype(np.int64).view(np.uint64))


def _hash_strs(vals) -> np.ndarray:
    return sk.word_hashes(np.asarray(list(vals), dtype=object))


def _next_pow2(x: int) -> int:
    return 1 << max(6, int(x - 1).bit_length())


def build_column_bloom(arr) -> dict | None:
    """Bloom over the distinct non-null values of one Arrow column.

    Returns ``None`` for unsupported types or when the distinct count
    exceeds :data:`MAX_DISTINCT`; otherwise a JSON-safe dict
    ``{"kind", "m", "k", "b64"}`` for the manifest entry.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    t = arr.type
    if pa.types.is_list(t) or pa.types.is_large_list(t) or \
            pa.types.is_fixed_size_list(t):
        # list columns (e.g. tokens list<int32>): the filter covers the
        # FLATTENED element values, serving `contains` partition pruning
        # ("which partitions hold sequences containing token X")
        arr = (arr.combine_chunks() if hasattr(arr, "combine_chunks")
               else arr).flatten()
        t = arr.type
    if pa.types.is_integer(t):
        kind = "int"
    elif pa.types.is_string(t) or pa.types.is_large_string(t):
        kind = "str"
    else:
        return None
    uniq = pc.unique(arr.combine_chunks() if hasattr(arr, "combine_chunks") else arr)
    uniq = uniq.drop_null()
    ndv = len(uniq)
    if ndv > MAX_DISTINCT:
        return None
    m_bits = _next_pow2(ndv * BITS_PER_KEY)
    bits = np.zeros(m_bits // 8, dtype=np.uint8)
    if ndv:
        if kind == "int":
            h = _hash_ints(uniq.to_numpy(zero_copy_only=False))
        else:
            h = _hash_strs(uniq.to_pylist())
        pos = _positions(h, m_bits, K_HASHES).reshape(-1)
        np.bitwise_or.at(bits, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
    return {"kind": kind, "m": int(m_bits), "k": K_HASHES,
            "b64": base64.b64encode(bits.tobytes()).decode()}


def might_contain(bloom: dict, value) -> bool:
    """False only when the filter PROVES the partition lacks ``value``.

    A probe whose python type does not match the filter's kind returns
    True (cannot prune) — equality across types is the decode filter's
    business, not the pruner's.
    """
    kind = bloom.get("kind")
    if kind == "int":
        if isinstance(value, bool) or not isinstance(value, (int, np.integer)):
            return True
        h = _hash_ints(np.asarray([value]))
    elif kind == "str":
        if not isinstance(value, str):
            return True
        h = _hash_strs([value])
    else:
        return True
    bits = np.frombuffer(base64.b64decode(bloom["b64"]), dtype=np.uint8)
    pos = _positions(h, int(bloom["m"]), int(bloom["k"])).reshape(-1)
    return bool(np.all(bits[pos >> 3] & (np.uint8(1) << (pos & 7).astype(np.uint8))))
