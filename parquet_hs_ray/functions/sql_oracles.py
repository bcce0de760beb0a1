"""Generated DuckDB SQL twins for kernels whose math needs uint64
wraparound semantics (simhash signatures) — used by ``oracle_sql()`` in
``__ray_entry__.py`` so the driver can hash-check ``dedup_simhash``
against an independent SQL evaluation (VERDICT r2 #2).

The splitmix64 finalizer (public domain constant set, Steele et al.,
"Fast splittable pseudorandom number generators", OOPSLA 2014 — the same
kernel as ``functions/sketches.py``) is emulated exactly over DuckDB
HUGEINT: every value stays in [0, 2^64), wraparound multiply is done via
32-bit partial products, and each step is its own nested-projection layer
— DuckDB inlines lateral column aliases textually, so a chained-alias
formulation would blow up exponentially while nested SELECTs stay linear.

ASCII note: the char-shingle kernel hashes UTF-8 BYTES while
``ord(substr(...))`` yields CODEPOINTS; they coincide exactly on ASCII
text (the synthetic documents corpus is ASCII — non-ASCII input would
surface immediately as a hash mismatch, never silently)."""

from __future__ import annotations

_M = "18446744073709551616::HUGEINT"  # 2^64
_C1 = 0x9E3779B97F4A7C15
_C2 = 0xBF58476D1CE4E5B9
_C3 = 0x94D049BB133111EB


def _mul_layer(x: str, c: int) -> str:
    """One projection layer: x := (x * c) mod 2^64 via 32-bit partial
    products (x0*c0 + ((x0*c1 + x1*c0) << 32), all < 2^98 < HUGEINT max)."""
    c0, c1 = c & 0xFFFFFFFF, c >> 32
    return (
        f"SELECT * REPLACE ((({x} % 4294967296::HUGEINT) * {c0}::HUGEINT "
        f"+ ((({x} % 4294967296::HUGEINT) * {c1}::HUGEINT "
        f"+ ({x} // 4294967296::HUGEINT) * {c0}::HUGEINT) % {_M}) "
        f"* 4294967296::HUGEINT) % {_M} AS {x})"
    )


def _splitmix_layers(x: str) -> list[str]:
    """Projection layers transforming column ``x`` -> splitmix64(x)."""
    return [
        f"SELECT * REPLACE ((({x}) + {_C1}::HUGEINT) % {_M} AS {x})",
        f"SELECT * REPLACE (xor({x}, {x} >> 30) AS {x})",
        _mul_layer(x, _C2),
        f"SELECT * REPLACE (xor({x}, {x} >> 27) AS {x})",
        _mul_layer(x, _C3),
        f"SELECT * REPLACE (xor({x}, {x} >> 31) AS {x})",
    ]


def _shingle_hash_query(table: str, k: int = 5) -> str:
    """Query yielding (doc_id, h) — one row per char-k-shingle, with h the
    chained splitmix64 hash over the shingle's bytes, exactly matching
    ``sketches.char_shingle_hashes``."""
    byte_cols = ",\n  ".join(
        f"ord(substr(text, i + {j}, 1))::HUGEINT AS c{j}" for j in range(k)
    )
    q = (
        f"SELECT doc_id, 0::HUGEINT AS h,\n  {byte_cols}\n"
        f"FROM (SELECT doc_id, unnest(range(1, greatest(length(text) - {k - 1}, 0) + 1)) AS i, text"
        f"      FROM {table})"
    )
    for j in range(k):
        q = f"SELECT * REPLACE (xor(h, c{j}) AS h) FROM ({q})"
        for layer in _splitmix_layers("h"):
            q = f"{layer} FROM ({q})"
    return q


def simhash_sig_sql(table: str = "documents", k: int = 5) -> str:
    """Query yielding (doc_id, simhash HUGEINT in [0, 2^64)) bit-identical
    to ``sketches.simhash64(char_shingle_hashes(...))``. The majority vote
    and bit assembly stay in exact integer aggregates (SUM over HUGEINT is
    exact in DuckDB; only a float readout would lose low bits)."""
    return f"""
WITH shingle_hashes AS ({_shingle_hash_query(table, k)}),
votes AS (
  SELECT doc_id, bit, sum(CASE WHEN (h >> bit) % 2 = 1 THEN 1 ELSE -1 END) AS v
  FROM shingle_hashes, (SELECT unnest(range(0, 64)) AS bit)
  GROUP BY doc_id, bit
),
sig0 AS (
  SELECT doc_id, sum(CASE WHEN v > 0 THEN (1::HUGEINT << bit) ELSE 0::HUGEINT END) AS simhash
  FROM votes GROUP BY doc_id
)
SELECT d.doc_id, coalesce(s.simhash, 0::HUGEINT) AS simhash
FROM {table} d LEFT JOIN sig0 s USING (doc_id)
"""


def simhash_pairs_sql(table: str = "documents", max_hamming: int = 3,
                      k: int = 5) -> str:
    """Full ``dedup_simhash`` twin: signatures (above) -> 4x16-bit band
    self-join -> hamming verify via bit_count(xor). Returns
    (a, b, hamming) sorted, matching the pipeline's full-recall output
    (the pipeline's counted giant-bucket star fallback only engages above
    ``bucket_cap`` docs per 16-bit band bucket — not at oracle scale)."""
    return f"""
WITH sig AS ({simhash_sig_sql(table, k)}),
bands AS (
  SELECT doc_id, simhash, band, (simhash >> (band * 16)) % 65536 AS bandkey
  FROM sig, (SELECT unnest(range(0, 4)) AS band)
),
cand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b, x.simhash AS ha, y.simhash AS hb
  FROM bands x JOIN bands y
    ON x.band = y.band AND x.bandkey = y.bandkey AND x.doc_id < y.doc_id
)
SELECT a, b, bit_count(xor(ha, hb))::BIGINT AS hamming
FROM cand WHERE bit_count(xor(ha, hb)) <= {max_hamming}
ORDER BY a, b
"""
