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


def _chain_splitmix(inner: str, n_cols: int) -> str:
    """Wrap ``inner`` (which yields an ``h`` column plus ``c0..c{n-1}``)
    in projection layers computing h = fold_j splitmix64(h ^ c_j)."""
    q = inner
    for j in range(n_cols):
        q = f"SELECT * REPLACE (xor(h, c{j}) AS h) FROM ({q})"
        for layer in _splitmix_layers("h"):
            q = f"{layer} FROM ({q})"
    return q


def _shingle_hash_query(table: str, k: int = 5) -> str:
    """Query yielding (doc_id, h) — one row per char-k-shingle, with h the
    chained splitmix64 hash over the shingle's bytes, exactly matching
    ``sketches.char_shingle_hashes``."""
    byte_cols = ",\n  ".join(
        f"ord(substr(text, i + {j}, 1))::HUGEINT AS c{j}" for j in range(k)
    )
    inner = (
        f"SELECT doc_id, 0::HUGEINT AS h,\n  {byte_cols}\n"
        f"FROM (SELECT doc_id, unnest(range(1, greatest(length(text) - {k - 1}, 0) + 1)) AS i, text"
        f"      FROM {table})"
    )
    return _chain_splitmix(inner, k)


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


def _word_hash_cte(table: str) -> str:
    """Recursive CTE body yielding (doc_id, wpos, wh): per-word splitmix64
    byte-chain hashes, exactly matching ``sketches.word_hashes`` over
    ``text.lower().split()`` (whitespace split, empties dropped). The
    recursion steps one byte position per level; the splitmix step is the
    same nested-projection pyramid wrapped around the recursive term."""
    step_inner = (
        "SELECT doc_id, wpos, w, n, j, "
        "xor(h, ord(substr(w, j, 1))::HUGEINT) AS h "
        "FROM wh_rec WHERE j <= n"
    )
    step = step_inner
    for layer in _splitmix_layers("h"):
        step = f"{layer} FROM ({step})"
    return f"""
docs_w AS (
  SELECT doc_id, string_split_regex(lower(coalesce(text, '')), '\\s+') AS arr
  FROM {table}
),
words0 AS (
  SELECT doc_id, unnest(range(1, len(arr) + 1)) AS i, arr FROM docs_w
),
words AS (
  SELECT doc_id, row_number() OVER (PARTITION BY doc_id ORDER BY i) AS wpos, arr[i] AS w
  FROM words0 WHERE arr[i] <> ''
),
wh_rec AS (
  SELECT doc_id, wpos, w, length(w) AS n, 1 AS j, 0::HUGEINT AS h FROM words
  UNION ALL
  SELECT doc_id, wpos, w, n, j + 1 AS j, h FROM ({step})
),
wh AS MATERIALIZED (
  SELECT doc_id, wpos, h AS whash FROM wh_rec WHERE j = n + 1
)"""


_SH0 = (
    "SELECT a.doc_id, a.wpos, 0::HUGEINT AS h, "
    "a.whash AS c0, b.whash AS c1, c.whash AS c2 "
    "FROM wh a "
    "JOIN wh b ON b.doc_id = a.doc_id AND b.wpos = a.wpos + 1 "
    "JOIN wh c ON c.doc_id = a.doc_id AND c.wpos = a.wpos + 2"
)


def _token_hash_cte(table: str, tokens_col: str = "tokens") -> str:
    """CTE body yielding (doc_id, wpos, whash) from a ``list<int>``
    column: one splitmix64 per token value — exactly
    ``sketches.token_ngram_hashes``'s per-unit hash (``wh`` then feeds
    the same shared n-gram/minhash chain as the word path)."""
    q = "SELECT doc_id, wpos, t::HUGEINT AS h FROM tok"
    for layer in _splitmix_layers("h"):
        q = f"{layer} FROM ({q})"
    return f"""
tok AS (
  SELECT doc_id, unnest({tokens_col}) AS t,
         unnest(range(1, len({tokens_col}) + 1)) AS wpos
  FROM {table}
),
wh AS MATERIALIZED (
  SELECT doc_id, wpos, h AS whash FROM ({q})
)"""


def _minhash_ctes(table: str, wh_cte: str | None = None) -> str:
    """The shared WITH-body (unit hashes -> shingles -> signatures ->
    bands -> candidates -> jaccard) used by the minhash pair/cluster
    oracles.  ``wh_cte`` overrides the unit-hash CTE (default: the word
    byte-chain) — the token-id variant plugs in here."""
    from . import sketches as sk

    perm_rows = ", ".join(
        f"({p}, {int(sk._A[p])}::HUGEINT, {int(sk._B[p])}::HUGEINT)"
        for p in range(64)
    )
    mask61 = (1 << 61) - 1
    umax = (1 << 64) - 1

    shingle_q = _chain_splitmix(_SH0, 3)

    bands_in = (
        "SELECT doc_id, band, 0::HUGEINT AS h, "
        "sl[band * 4 + 1] AS c0, sl[band * 4 + 2] AS c1, "
        "sl[band * 4 + 3] AS c2, sl[band * 4 + 4] AS c3 "
        "FROM (SELECT doc_id, unnest(range(0, 16)) AS band, sl FROM sigl)"
    )
    band_q = _chain_splitmix(bands_in, 4)

    return f"""{wh_cte if wh_cte is not None else _word_hash_cte(table)},
shingle_h AS MATERIALIZED (
  SELECT doc_id, wpos, h FROM ({shingle_q})
),
perms(p, pa, pb) AS (VALUES {perm_rows}),
minp AS (
  SELECT doc_id, p, min((h * pa + pb) & {mask61}::HUGEINT) AS mn
  FROM shingle_h CROSS JOIN perms GROUP BY doc_id, p
),
sigs AS (
  SELECT d.doc_id, pr.p, coalesce(m.mn, {umax}::HUGEINT) AS s
  FROM {table} d CROSS JOIN perms pr
  LEFT JOIN minp m ON m.doc_id = d.doc_id AND m.p = pr.p
),
sigl AS (
  SELECT doc_id, list(s ORDER BY p) AS sl FROM sigs GROUP BY doc_id
),
bandh AS MATERIALIZED (
  SELECT doc_id, band, h AS bh FROM ({band_q})
),
cand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM bandh x JOIN bandh y
    ON x.band = y.band AND x.bh = y.bh AND x.doc_id < y.doc_id
),
sets AS MATERIALIZED (SELECT DISTINCT doc_id, h FROM shingle_h),
sizes AS (SELECT doc_id, count(*) AS nsz FROM sets GROUP BY doc_id),
inter AS (
  SELECT c.a, c.b, count(*) AS ninter
  FROM cand c
  JOIN sets sa ON sa.doc_id = c.a
  JOIN sets sb ON sb.doc_id = c.b AND sb.h = sa.h
  GROUP BY c.a, c.b
),
jac AS (
  SELECT c.a, c.b,
    CASE WHEN coalesce(za.nsz, 0) + coalesce(zb.nsz, 0) = 0 THEN 1.0
         ELSE coalesce(i.ninter, 0)::DOUBLE
              / (coalesce(za.nsz, 0) + coalesce(zb.nsz, 0) - coalesce(i.ninter, 0))
    END AS jaccard
  FROM cand c
  LEFT JOIN inter i ON i.a = c.a AND i.b = c.b
  LEFT JOIN sizes za ON za.doc_id = c.a
  LEFT JOIN sizes zb ON zb.doc_id = c.b
)"""


def minhash_pairs_sql(table: str = "documents", threshold: float = 0.8) -> str:
    """Full ``dedup_minhash`` twin (VERDICT r2 'what's missing' #1 class):
    word hashes (recursive splitmix64 byte chain) -> 3-gram shingle chain
    -> 64 permutations (h*a+b masked to 61 bits; the product < 2^125 is
    exact in HUGEINT) -> per-doc segment min -> 16x4 band splitmix chain
    -> band-equality candidates -> exact-Jaccard verify over distinct
    shingle sets. Matches the pipeline's full-recall output (the counted
    star fallback only engages above bucket_cap=4096 docs per bucket).
    Zero-shingle docs get all-max signatures, band-collide with each
    other, and verify at jaccard 1.0 — same as the kernel."""
    return (
        f"WITH RECURSIVE {_minhash_ctes(table)}\n"
        f"SELECT a, b, jaccard FROM jac WHERE jaccard >= {threshold}\n"
        "ORDER BY a, b"
    )


def minhash_clusters_sql(table: str = "documents", threshold: float = 0.8) -> str:
    """``dedup_clusters`` twin: connected components over the minhash
    near-dup graph via a recursive transitive closure (UNION dedups the
    frontier), cluster id = min doc_id of the component; isolated docs
    are their own singleton cluster."""
    return (
        f"WITH RECURSIVE {_minhash_ctes(table)},\n"
        f"edges AS (SELECT a, b FROM jac WHERE jaccard >= {threshold}),\n"
        "sym AS (SELECT a, b FROM edges UNION SELECT b AS a, a AS b FROM edges),\n"
        "reach(a, b) AS (\n"
        f"  SELECT doc_id AS a, doc_id AS b FROM {table}\n"
        "  UNION\n"
        "  SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a)\n"
        "SELECT a AS doc_id, min(b) AS cluster_id FROM reach GROUP BY a"
    )


def jaccard_pairs_sql(table: str = "documents", threshold: float = 0.8) -> str:
    """``dedup_jaccard`` twin: EXACT all-pairs word-ngram Jaccard >=
    threshold over distinct shingle-hash sets — the intersection join on
    shingle hash only reaches pairs with ninter > 0, which is complete
    for any threshold > 0; pairs of zero-shingle docs score 1.0 (the
    kernel's convention) and are added explicitly."""
    shingle_q = _chain_splitmix(_SH0, 3)
    return f"""
WITH RECURSIVE {_word_hash_cte(table)},
shingle_h AS MATERIALIZED (
  SELECT doc_id, wpos, h FROM ({shingle_q})
),
sets AS MATERIALIZED (SELECT DISTINCT doc_id, h FROM shingle_h),
sizes AS MATERIALIZED (SELECT doc_id, count(*) AS nsz FROM sets GROUP BY doc_id),
inter AS (
  SELECT sa.doc_id AS a, sb.doc_id AS b, count(*) AS ninter
  FROM sets sa JOIN sets sb ON sb.h = sa.h AND sa.doc_id < sb.doc_id
  GROUP BY 1, 2
),
jpos AS (
  SELECT i.a, i.b, i.ninter::DOUBLE / (za.nsz + zb.nsz - i.ninter) AS jaccard
  FROM inter i
  JOIN sizes za ON za.doc_id = i.a
  JOIN sizes zb ON zb.doc_id = i.b
),
empties AS (
  SELECT d.doc_id FROM {table} d LEFT JOIN sizes s USING (doc_id)
  WHERE s.doc_id IS NULL
)
SELECT a, b, jaccard FROM (
  SELECT * FROM jpos WHERE jaccard >= {threshold}
  UNION ALL
  SELECT e1.doc_id AS a, e2.doc_id AS b, 1.0 AS jaccard
  FROM empties e1 JOIN empties e2 ON e1.doc_id < e2.doc_id
  WHERE 1.0 >= {threshold})
ORDER BY a, b
"""


def containment_pairs_sql(table: str = "documents",
                          threshold: float = 0.8) -> str:
    """``dedup_containment`` twin: directed ``|src ∩ dst| / |src|`` over
    distinct word-3-gram shingle sets.  The intersection join only
    reaches pairs with ninter > 0 — complete for any threshold > 0, and
    zero-shingle docs emit no rows (the kernel's convention)."""
    shingle_q = _chain_splitmix(_SH0, 3)
    return f"""
WITH RECURSIVE {_word_hash_cte(table)},
shingle_h AS MATERIALIZED (
  SELECT doc_id, wpos, h FROM ({shingle_q})
),
sets AS MATERIALIZED (SELECT DISTINCT doc_id, h FROM shingle_h),
sizes AS MATERIALIZED (SELECT doc_id, count(*) AS nsz FROM sets GROUP BY doc_id),
inter AS (
  SELECT sa.doc_id AS a, sb.doc_id AS b, count(*) AS ninter
  FROM sets sa JOIN sets sb ON sb.h = sa.h AND sa.doc_id <> sb.doc_id
  GROUP BY 1, 2
)
SELECT i.a AS src, i.b AS dst,
       i.ninter::DOUBLE / za.nsz AS containment
FROM inter i JOIN sizes za ON za.doc_id = i.a
WHERE i.ninter::DOUBLE / za.nsz >= {threshold}
ORDER BY src, dst
"""


def decontaminate_sql(table: str = "documents", mod: int = 17) -> str:
    """``doc_decontaminate`` twin: per non-benchmark document, the count
    of DISTINCT word-3-gram shingle hashes shared with the benchmark set
    (docs with doc_id % mod == 0), replaying the exact splitmix64 shingle
    chain the Ray kernel uses (``sketches.word_ngram_hashes``)."""
    shingle_q = _chain_splitmix(_SH0, 3)
    return f"""
WITH RECURSIVE {_word_hash_cte(table)},
shingle_h AS MATERIALIZED (
  SELECT doc_id, h FROM ({shingle_q})
),
bench AS MATERIALIZED (
  SELECT DISTINCT h FROM shingle_h WHERE doc_id % {mod} = 0
),
corpus AS (
  SELECT DISTINCT doc_id, h FROM shingle_h WHERE doc_id % {mod} <> 0
),
hits AS (
  SELECT doc_id, count(*)::BIGINT AS n FROM corpus JOIN bench USING (h)
  GROUP BY doc_id
)
SELECT d.doc_id, coalesce(hits.n, 0)::BIGINT AS n_shared
FROM (SELECT doc_id FROM {table} WHERE doc_id % {mod} <> 0) d
LEFT JOIN hits USING (doc_id)
ORDER BY doc_id
"""


def bloom_decontaminate_sql(table: str = "documents", mod: int = 17,
                            m_bits: int = 1 << 23, k: int = 7) -> str:
    """``doc_decontaminate_bloom`` twin — the Bloom filter IS
    deterministic, so its false positives replay exactly in SQL: per
    shingle hash h the k Kirsch–Mitzenmacher probe positions are
    ``(h + i*(splitmix64(h)|1)) mod 2^64 mod m_bits``; a corpus shingle
    counts iff ALL k of its positions are in the DISTINCT set of
    positions any benchmark shingle set (bit-set membership == position
    set membership — no bitset needed on the SQL side)."""
    shingle_q = _chain_splitmix(_SH0, 3)
    # h2 = splitmix64(h), computed on a copy so h survives
    h2_q = "SELECT doc_id, h, h AS h2 FROM shingle_h"
    for layer in _splitmix_layers("h2"):
        h2_q = f"{layer} FROM ({h2_q})"
    two64 = "18446744073709551616::HUGEINT"
    pos = f"((h + i * h2o) % {two64}) % {m_bits}::HUGEINT"
    return f"""
WITH RECURSIVE {_word_hash_cte(table)},
shingle_h AS MATERIALIZED (
  SELECT doc_id, h FROM ({shingle_q})
),
sh2 AS MATERIALIZED (
  SELECT doc_id, h, (h2 - (h2 % 2) + 1) AS h2o FROM ({h2_q})
),
ks AS (SELECT unnest(range(0, {k}))::HUGEINT AS i),
bench_pos AS MATERIALIZED (
  SELECT DISTINCT {pos} AS p
  FROM (SELECT DISTINCT h, h2o FROM sh2 WHERE doc_id % {mod} = 0)
  CROSS JOIN ks
),
corpus AS (
  SELECT DISTINCT doc_id, h, h2o FROM sh2 WHERE doc_id % {mod} <> 0
),
cpos AS (
  SELECT doc_id, h, {pos} AS p FROM corpus CROSS JOIN ks
),
hits AS (
  SELECT doc_id, h FROM cpos
  LEFT JOIN bench_pos ON cpos.p = bench_pos.p
  GROUP BY doc_id, h HAVING count(bench_pos.p) = {k}
),
cnt AS (
  SELECT doc_id, count(*)::BIGINT AS n FROM hits GROUP BY doc_id
)
SELECT d.doc_id, coalesce(cnt.n, 0)::BIGINT AS n_shared_bloom
FROM (SELECT doc_id FROM {table} WHERE doc_id % {mod} <> 0) d
LEFT JOIN cnt USING (doc_id)
ORDER BY doc_id
"""


def kmv_quantile_sql(table: str = "events", key: str = "event_type",
                     col: str = "value", id_col: str = "event_id",
                     qs=(0.5, 0.95), k: int = 1024, seed: int = 17) -> str:
    """``events_quantiles_kmv`` twin — the KMV bottom-k sample is
    DETERMINISTIC (k smallest ``splitmix64(id ^ seed)`` per group;
    splitmix64 is a bijection so there are no hash ties), and the
    estimate is plain ``quantile_disc`` over the sampled values, so the
    sketch replays exactly in SQL."""
    h_q = (f"SELECT {key}, {col}, "
           f"xor({id_col}::HUGEINT, {seed}::HUGEINT) AS h "
           f"FROM {table} WHERE {col} IS NOT NULL")
    for layer in _splitmix_layers("h"):
        h_q = f"{layer} FROM ({h_q})"
    est = ", ".join(
        f"quantile_disc({col}, {q}) AS p{int(round(q * 100))}_est"
        for q in qs)
    return f"""
WITH ranked AS (
  SELECT {key}, {col},
         row_number() OVER (PARTITION BY {key} ORDER BY h) AS rn
  FROM ({h_q})
)
SELECT {key}, {est}
FROM ranked WHERE rn <= {k}
GROUP BY {key} ORDER BY {key}
"""


def bm25_sql(table: str, terms: "list[str]", k1: float = 1.2,
             b: float = 0.75) -> str:
    """``doc_bm25`` twin.  Float-exact by construction: the contribution
    expression mirrors the kernel's IEEE op order token-for-token, ln()
    resolves to the same libm log, and the cross-term sum is a literal
    left-associative ``+`` chain in sorted term order (SQL SUM() over
    doubles has no order guarantee)."""
    terms = sorted(set(terms))
    inlist = ", ".join(f"'{t}'" for t in terms)
    chain = " + ".join(
        f"coalesce(max(CASE WHEN w = '{t}' THEN contrib END), 0)"
        for t in terms)
    return f"""
WITH words AS (SELECT doc_id, unnest(regexp_extract_all(lower(text),
  '[a-z0-9]+')) AS w FROM {table}),
dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM words GROUP BY doc_id),
st AS (SELECT (SELECT count(*) FROM {table})::BIGINT AS n,
              (SELECT sum(dl) FROM dl)::BIGINT AS sdl),
tf AS (SELECT doc_id, w, count(*)::BIGINT AS tf FROM words
       WHERE w IN ({inlist}) GROUP BY doc_id, w),
df AS (SELECT w, count(*)::BIGINT AS df FROM tf GROUP BY w),
c AS (SELECT tf.doc_id, tf.w,
  ln(1 + (st.n - df.df + 0.5) / (df.df + 0.5)) *
  (tf.tf * ({k1} + 1)) /
  (tf.tf + {k1} * (1 - {b} + {b} * d.dl / (st.sdl::DOUBLE / st.n))) AS contrib
  FROM tf JOIN df USING (w) JOIN dl d ON d.doc_id = tf.doc_id CROSS JOIN st),
p AS (SELECT doc_id, {chain} AS score FROM c GROUP BY doc_id)
SELECT doc_id, score FROM p WHERE score > 0
"""


def corpus_overlap_sql(table: str = "documents", mod: int = 17) -> str:
    """``corpus_overlap`` twin: exact distinct word-3-gram shingle-set
    overlap between the two doc_id%mod halves of ``table``, same
    splitmix64 chain as the Ray kernel (collisions merge identically)."""
    shingle_q = _chain_splitmix(_SH0, 3)
    return f"""
WITH RECURSIVE {_word_hash_cte(table)},
shingle_h AS MATERIALIZED (
  SELECT doc_id, h FROM ({shingle_q})
),
A AS MATERIALIZED (SELECT DISTINCT h FROM shingle_h WHERE doc_id % {mod} = 0),
B AS MATERIALIZED (SELECT DISTINCT h FROM shingle_h WHERE doc_id % {mod} <> 0),
c AS (SELECT (SELECT count(*) FROM A)::BIGINT AS n_a,
             (SELECT count(*) FROM B)::BIGINT AS n_b,
             (SELECT count(*) FROM A JOIN B USING (h))::BIGINT AS n_shared)
SELECT n_a, n_b, n_shared,
       CASE WHEN n_a + n_b - n_shared = 0 THEN 0.0
            ELSE n_shared::DOUBLE / (n_a + n_b - n_shared) END AS jaccard
FROM c
"""


def _word_ngram_inner(n: int) -> str:
    """Generalized ``_SH0``: (doc_id, wpos, h=0, c0..c{n-1}) — one row
    per ``n``-word rolling window, columns the window's word hashes."""
    cols = ", ".join(
        ["t0.whash AS c0"] + [f"t{j}.whash AS c{j}" for j in range(1, n)])
    joins = " ".join(
        f"JOIN wh t{j} ON t{j}.doc_id = t0.doc_id AND t{j}.wpos = t0.wpos + {j}"
        for j in range(1, n))
    return (f"SELECT t0.doc_id, t0.wpos, 0::HUGEINT AS h, {cols} "
            f"FROM wh t0 {joins}")


def span_dedup_sql(table: str = "documents", window: int = 5) -> str:
    """``doc_span_dedup`` twin: per document, total rolling
    ``window``-word spans and how many (position-level) also occur in at
    least one OTHER document — min(doc)!=max(doc) over the span hash
    stands in for a count-distinct, exactly like the Ray kernel."""
    span_q = _chain_splitmix(_word_ngram_inner(window), window)
    return f"""
WITH RECURSIVE {_word_hash_cte(table)},
spans AS MATERIALIZED (SELECT doc_id, h FROM ({span_q})),
reach AS MATERIALIZED (
  SELECT h, min(doc_id) AS mn, max(doc_id) AS mx FROM spans GROUP BY h
),
per AS (
  SELECT s.doc_id, count(*)::BIGINT AS n_spans,
         CAST(count(*) FILTER (WHERE r.mn <> r.mx) AS BIGINT) AS n_shared_spans
  FROM spans s JOIN reach r USING (h) GROUP BY s.doc_id
)
SELECT d.doc_id,
       coalesce(per.n_spans, 0)::BIGINT AS n_spans,
       coalesce(per.n_shared_spans, 0)::BIGINT AS n_shared_spans,
       coalesce(per.n_shared_spans, 0) > 0 AS has_cross_dup
FROM {table} d LEFT JOIN per USING (doc_id)
ORDER BY d.doc_id
"""


def weighted_sample_sql(table: str = "documents", weight_col: str = "n_chars",
                        rate_per_unit: float = 1 / 4000, seed: int = 7) -> str:
    """DuckDB twin of ``text_analysis.sample_weighted``: replay
    splitmix64(xor(doc_id, seed)) through the HUGEINT layer stack, then
    the integer keep rule ``h // T < weight`` (same T construction as the
    kernel, so the comparison is bit-exact — no float in the decision)."""
    T = int(rate_per_unit * (1 << 64))
    if T >= (1 << 64):
        T = (1 << 64) - 1
    q = (f"SELECT doc_id, source, {weight_col}, "
         f"xor(doc_id::HUGEINT, {seed}::HUGEINT) AS h FROM {table}")
    for layer in _splitmix_layers("h"):
        q = f"{layer} FROM ({q})"
    # NaN weights drop the row (the kernel's fillna(0)); the least() clamp
    # is the kernel's uint64 saturation bound (2^64 - 2048, exact in both
    # float64 and HUGEINT) so +inf / >=2^64 weights stay bit-identical
    w_expr = (f"least(floor(greatest(CASE WHEN isnan({weight_col}::DOUBLE) "
              f"THEN 0 ELSE {weight_col} END, 0)), "
              f"18446744073709549568)::HUGEINT")
    return (f"SELECT doc_id, source, {weight_col} FROM ({q}) "
            f"WHERE h // {T}::HUGEINT < {w_expr} "
            f"ORDER BY doc_id")


def cms_top_terms_sql(table: str = "documents", k: int = 20,
                      depth: int = 4, width: int = 1024) -> str:
    """DuckDB twin of ``stats.cms_top_terms``: the same per-word
    splitmix64 recursive-CTE hash chain, the same Kirsch-Mitzenmacher
    double hash ``pos_i = (h1 + i*(splitmix64(h1)|1)) mod 2^64 mod w``,
    cell counts via GROUP BY, estimates via min over depths — the full
    count-min sketch replayed in SQL, hash-exact."""
    # h2 = splitmix64(whash) forced odd: g - g%2 + 1 == g|1
    h2q = "SELECT doc_id, wpos, whash, whash AS g FROM wh"
    for layer in _splitmix_layers("g"):
        h2q = f"{layer} FROM ({h2q})"
    return f"""
WITH RECURSIVE {_word_hash_cte(table)},
occ AS MATERIALIZED (
  SELECT doc_id, wpos, whash, (g - g % 2 + 1) AS h2 FROM ({h2q})
),
pos AS (
  SELECT d.i AS i,
         (((whash + d.i::HUGEINT * h2) % {_M}) % {width}::HUGEINT)::BIGINT AS pos
  FROM occ CROSS JOIN (SELECT unnest(range({depth})) AS i) d
),
cells AS MATERIALIZED (
  SELECT i, pos, count(*)::BIGINT AS cnt FROM pos GROUP BY i, pos
),
vocab AS (
  SELECT DISTINCT w.w AS term, o.whash, o.h2
  FROM words w JOIN occ o ON o.doc_id = w.doc_id AND o.wpos = w.wpos
),
vpos AS (
  SELECT term, d.i AS i,
         (((whash + d.i::HUGEINT * h2) % {_M}) % {width}::HUGEINT)::BIGINT AS pos
  FROM vocab CROSS JOIN (SELECT unnest(range({depth})) AS i) d
),
est AS (
  SELECT term, min(cnt)::BIGINT AS est_count
  FROM vpos JOIN cells USING (i, pos) GROUP BY term
)
SELECT term, est_count FROM est
ORDER BY est_count DESC, term LIMIT {k}
"""


def validate_sql(table: str, rules: "list[tuple]") -> str:
    """DuckDB twin of ``pipelines.validate.validate``: one UNION ALL arm
    per rule, COUNT(*) FILTER for violation counts (BIGINT on both
    sides), ordered by rule name like the Ray result."""
    from parquet_hs_ray.pipelines.validate import rule_name

    def lit(v):
        if isinstance(v, str):
            return "'" + v.replace("'", "''") + "'"
        return repr(v)

    arms = []
    for r in rules:
        kind, col = r[0], r[1]
        name = lit(rule_name(r))
        if kind == "not_null":
            arms.append(f"SELECT {name} AS rule, COUNT(*)::BIGINT AS n_checked, "
                        f"COUNT(*) FILTER (WHERE {col} IS NULL)::BIGINT AS n_violations "
                        f"FROM {table}")
        elif kind == "range":
            lo, hi = r[2], r[3]
            arms.append(f"SELECT {name}, COUNT(*)::BIGINT, COUNT(*) FILTER (WHERE "
                        f"{col} IS NOT NULL AND ({col} < {lit(lo)} OR {col} > {lit(hi)}))"
                        f"::BIGINT FROM {table}")
        elif kind == "in_set":
            vals = ", ".join(lit(v) for v in r[2])
            arms.append(f"SELECT {name}, COUNT(*)::BIGINT, COUNT(*) FILTER (WHERE "
                        f"{col} IS NOT NULL AND {col} NOT IN ({vals}))::BIGINT "
                        f"FROM {table}")
        elif kind == "regex":
            arms.append(f"SELECT {name}, COUNT(*)::BIGINT, COUNT(*) FILTER (WHERE "
                        f"{col} IS NOT NULL AND NOT regexp_matches({col}, {lit(r[2])}))"
                        f"::BIGINT FROM {table}")
        elif kind == "unique":
            arms.append(f"SELECT {name}, COUNT({col})::BIGINT, "
                        f"(COUNT({col}) - COUNT(DISTINCT {col}))::BIGINT FROM {table}")
        else:
            raise ValueError(f"unknown rule kind: {r!r}")
    body = "\nUNION ALL\n".join(arms)
    return f"SELECT * FROM (\n{body}\n) ORDER BY rule"


def minhash_tokens_pairs_sql(table: str, threshold: float = 0.8) -> str:
    """``dedup_minhash_tokens`` twin: identical minhash chain to
    ``minhash_pairs_sql`` but unit hashes come from the token-id splitmix
    (``_token_hash_cte``) instead of the word byte chain.  ``table`` may
    be any table expression (e.g. a read_parquet(...) subquery aliased in
    a WITH upstream)."""
    return (
        f"WITH RECURSIVE {_minhash_ctes(table, wh_cte=_token_hash_cte(table))}\n"
        f"SELECT a, b, jaccard FROM jac WHERE jaccard >= {threshold}\n"
        "ORDER BY a, b"
    )


def simhash_tokens_pairs_sql(table: str, max_hamming: int = 3) -> str:
    """``dedup_simhash_tokens`` twin: token-id unit hashes
    (``_token_hash_cte``) -> the shared 3-gram shingle chain -> the
    simhash majority vote and 4x16-bit band self-join of
    ``simhash_pairs_sql`` — exact over HUGEINT."""
    shingle_q = _chain_splitmix(_SH0, 3)
    return f"""
WITH {_token_hash_cte(table)},
shingle_h AS MATERIALIZED (
  SELECT doc_id, wpos, h FROM ({shingle_q})
),
votes AS (
  SELECT doc_id, bit, sum(CASE WHEN (h >> bit) % 2 = 1 THEN 1 ELSE -1 END) AS v
  FROM shingle_h, (SELECT unnest(range(0, 64)) AS bit)
  GROUP BY doc_id, bit
),
sig0 AS (
  SELECT doc_id, sum(CASE WHEN v > 0 THEN (1::HUGEINT << bit) ELSE 0::HUGEINT END) AS simhash
  FROM votes GROUP BY doc_id
),
sig AS (
  SELECT d.doc_id, coalesce(s.simhash, 0::HUGEINT) AS simhash
  FROM {table} d LEFT JOIN sig0 s USING (doc_id)
),
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


def decontaminate_tokens_sql(union_table: str, corpus_table: str,
                             bench_pred: str) -> str:
    """``cleaning.decontaminate_tokens`` twin: token-id 3-gram shingles
    (shared chain) over ``union_table`` (corpus ∪ benchmark docs, one
    pass), benchmark = rows matching ``bench_pred`` (a boolean SQL
    expression over doc_id); per corpus doc, the count of its DISTINCT
    shingles that appear in the benchmark set."""
    shingle_q = _chain_splitmix(_SH0, 3)
    return f"""
WITH {_token_hash_cte(union_table)},
shingle_h AS MATERIALIZED (
  SELECT doc_id, h FROM ({shingle_q})
),
sh AS (SELECT DISTINCT doc_id, h FROM shingle_h),
bench AS (SELECT DISTINCT h FROM sh WHERE {bench_pred}),
hits AS (
  SELECT s.doc_id, count(*) AS n
  FROM sh s JOIN bench b USING (h) GROUP BY s.doc_id
)
SELECT c.doc_id, coalesce(t.n, 0)::BIGINT AS n_shared
FROM {corpus_table} c LEFT JOIN hits t USING (doc_id)
"""


def dsir_sql(table: str = "documents", target_mod: int = 7,
             n_buckets: int = 256) -> str:
    """``text_analysis.dsir_scores`` twin (DSIR, arXiv:2302.03169,
    integer-exact variant).  Features = word unigrams (the ``wh`` hash
    directly) + bigrams (the shared 2-gram splitmix chain), bucketed
    ``h % n_buckets``; target corpus = rows with
    ``doc_id % target_mod = 0``; per-bucket log-ratio weight via the
    same ``printf('%b')`` bit-length floor-log2 as the surprisal twin;
    per-doc score is an exact BIGINT sum (order-free)."""
    bi_q = _chain_splitmix(_word_ngram_inner(2), 2)
    B = n_buckets
    return f"""
WITH RECURSIVE {_word_hash_cte(table)},
feats AS MATERIALIZED (
  SELECT doc_id, (whash % {B})::BIGINT AS bkt FROM wh
  UNION ALL
  SELECT doc_id, (h % {B})::BIGINT AS bkt FROM ({bi_q})
),
sc AS (SELECT bkt, count(*)::BIGINT AS sn FROM feats GROUP BY bkt),
tc AS (SELECT bkt, count(*)::BIGINT AS tn FROM feats
       WHERE doc_id % {target_mod} = 0 GROUP BY bkt),
tot AS (SELECT (SELECT count(*) FROM feats)::BIGINT AS s_tot,
  (SELECT count(*) FROM feats WHERE doc_id % {target_mod} = 0)::BIGINT AS t_tot),
lam AS (
  SELECT r.bkt,
    (length(printf('%b', (tot.s_tot + {B}) // (coalesce(sc.sn, 0) + 1))) - 1)
  - (length(printf('%b', (tot.t_tot + {B}) // (coalesce(tc.tn, 0) + 1))) - 1)
    AS lam
  FROM (SELECT unnest(range(0, {B}))::BIGINT AS bkt) r
  LEFT JOIN sc ON sc.bkt = r.bkt LEFT JOIN tc ON tc.bkt = r.bkt
  CROSS JOIN tot
),
sco AS (SELECT f.doc_id, count(*)::BIGINT AS n_feats,
               sum(lam)::BIGINT AS dsir_score
        FROM feats f JOIN lam USING (bkt) GROUP BY f.doc_id)
SELECT d.doc_id,
       coalesce(s.n_feats, 0)::BIGINT AS n_feats,
       coalesce(s.dsir_score, 0)::BIGINT AS dsir_score
FROM {table} d LEFT JOIN sco s USING (doc_id)
ORDER BY d.doc_id
"""


def mask_tokens_sql(table: str, mask_id: int, rate_pct: int = 15,
                    seed: int = 1, ignore_id: int = -100) -> str:
    """``trainprep.mask_tokens_mlm`` twin: the per-position mask decision
    ``splitmix64(splitmix64(token ^ seed) ^ pos) % 100 < rate_pct``
    replayed in HUGEINT arithmetic (the proven splitmix emulation),
    lists rebuilt in position order."""
    inner = (f"SELECT doc_id, unnest(tokens) AS torig, "
             f"(generate_subscripts(tokens, 1) - 1)::HUGEINT AS pos "
             f"FROM {table}")
    q = f"SELECT *, xor(torig::HUGEINT, {seed}::HUGEINT) AS h FROM ({inner})"
    for layer in _splitmix_layers("h"):
        q = f"{layer} FROM ({q})"
    q = f"SELECT * REPLACE (xor(h, pos) AS h) FROM ({q})"
    for layer in _splitmix_layers("h"):
        q = f"{layer} FROM ({q})"
    return f"""
WITH m AS MATERIALIZED (
  SELECT doc_id, pos, torig, (h % 100) < {rate_pct} AS is_m FROM ({q})
),
l AS (SELECT doc_id,
        list(CASE WHEN is_m THEN {mask_id}::INTEGER ELSE torig END
             ORDER BY pos) AS tokens,
        list(CASE WHEN is_m THEN torig ELSE {ignore_id}::INTEGER END
             ORDER BY pos) AS labels,
        (count(*) FILTER (WHERE is_m))::BIGINT AS n_masked
      FROM m GROUP BY doc_id)
SELECT d.doc_id, coalesce(l.tokens, []::INTEGER[]) AS tokens,
       coalesce(l.labels, []::INTEGER[]) AS labels,
       coalesce(l.n_masked, 0)::BIGINT AS n_masked
FROM {table} d LEFT JOIN l USING (doc_id) ORDER BY d.doc_id
"""


def shift_labels_sql(table: str, ignore_id: int = -100) -> str:
    """``trainprep.shift_labels`` twin: next-token targets as a list
    slice + append, empty lists preserved."""
    return f"""
SELECT doc_id, tokens, n_tok, source,
       CASE WHEN len(tokens) = 0 THEN []::INTEGER[]
            ELSE list_append(tokens[2:], {ignore_id}::INTEGER) END AS labels
FROM {table} ORDER BY doc_id
"""


def truncate_sequences_sql(table: str, max_len: int) -> str:
    """``trainprep.truncate_sequences`` twin: head slice + length clamp
    (DuckDB list slices are 1-based inclusive)."""
    return f"""
SELECT doc_id, tokens[1:{max_len}] AS tokens,
       least(n_tok, {max_len}) AS n_tok, source
FROM {table} ORDER BY doc_id
"""


def span_dedup_rewrite_sql(table: str = "documents", window: int = 5,
                           shift: int = 1 << 20) -> str:
    """``cleaning.span_dedup_rewrite`` twin: duplicated span occurrences
    (count >= 2 per hash) other than the global min-okey one mark their
    ``window`` covered positions; documents rebuild from the surviving
    lowercased word stream (string_agg in position order)."""
    span_q = _chain_splitmix(_word_ngram_inner(window), window)
    return f"""
WITH RECURSIVE {_word_hash_cte(table)},
occ AS MATERIALIZED (
  SELECT doc_id, wpos - 1 AS s, h,
         doc_id * {shift} + (wpos - 1) AS okey
  FROM ({span_q})),
agg AS (SELECT h, count(*)::BIGINT AS c, min(okey) AS mo FROM occ GROUP BY h),
dup AS (SELECT o.doc_id, o.s FROM occ o JOIN agg USING (h)
        WHERE agg.c >= 2 AND o.okey <> agg.mo),
cov AS (SELECT DISTINCT doc_id, s + off AS p
        FROM dup, (SELECT unnest(range(0, {window})) AS off) t),
kept AS (SELECT w.doc_id, w.wpos, w.w FROM words w
         LEFT JOIN cov ON cov.doc_id = w.doc_id AND cov.p = w.wpos - 1
         WHERE cov.p IS NULL),
agg2 AS (SELECT doc_id, string_agg(w, ' ' ORDER BY wpos) AS text_clean,
                count(*)::BIGINT AS n_kept FROM kept GROUP BY doc_id),
nw AS (SELECT doc_id, count(*)::BIGINT AS n_words FROM words GROUP BY doc_id)
SELECT d.doc_id,
       coalesce(a.text_clean, '') AS text_clean,
       coalesce(nw.n_words, 0)::BIGINT AS n_words,
       (coalesce(nw.n_words, 0) - coalesce(a.n_kept, 0))::BIGINT AS n_removed
FROM {table} d LEFT JOIN agg2 a USING (doc_id) LEFT JOIN nw USING (doc_id)
ORDER BY d.doc_id
"""


def span_dedup_rewrite_tokens_sql(table: str, dk_expr: str,
                                  window: int = 5,
                                  shift: int = 1 << 20) -> str:
    """``cleaning.span_dedup_rewrite_tokens`` twin over a pre-tokenized
    table: token-id n-gram span hashes (the shared splitmix chain),
    canonical occurrence = min ``dk * shift + start`` where ``dk`` is
    ``dk_expr`` evaluated per row (the caller's numeric doc order key);
    sequences rebuild with list(t ORDER BY wpos) over uncovered
    positions."""
    span_q = _chain_splitmix(_word_ngram_inner(window), window)
    return f"""
WITH {_token_hash_cte(table)},
dk AS (SELECT doc_id, {dk_expr} AS dkv FROM {table}),
occ AS MATERIALIZED (
  SELECT sp.doc_id, sp.wpos - 1 AS s, sp.h,
         dk.dkv * {shift} + (sp.wpos - 1) AS okey
  FROM ({span_q}) sp JOIN dk ON dk.doc_id = sp.doc_id),
agg AS (SELECT h, count(*)::BIGINT AS c, min(okey) AS mo FROM occ GROUP BY h),
dup AS (SELECT o.doc_id, o.s FROM occ o JOIN agg USING (h)
        WHERE agg.c >= 2 AND o.okey <> agg.mo),
cov AS (SELECT DISTINCT doc_id, s + off AS p
        FROM dup, (SELECT unnest(range(0, {window})) AS off) t),
kept AS (SELECT tk.doc_id, tk.wpos, tk.t FROM tok tk
         LEFT JOIN cov ON cov.doc_id = tk.doc_id AND cov.p = tk.wpos - 1
         WHERE cov.p IS NULL),
l AS (SELECT doc_id, list(t ORDER BY wpos) AS tokens,
             count(*)::BIGINT AS n_kept FROM kept GROUP BY doc_id),
n0 AS (SELECT doc_id, coalesce(len(tokens), 0)::BIGINT AS n_in FROM {table})
SELECT d.doc_id,
       coalesce(l.tokens, []::INTEGER[]) AS tokens,
       coalesce(l.n_kept, 0)::BIGINT AS n_tok,
       (n0.n_in - coalesce(l.n_kept, 0))::BIGINT AS n_removed
FROM {table} d JOIN n0 USING (doc_id) LEFT JOIN l USING (doc_id)
ORDER BY d.doc_id
"""


def repetition_tokens_sql(table: str, ngram: int = 2,
                          dup_ratio_denom: int = 4) -> str:
    """``cleaning.repetition_stats_tokens`` twin: token n-gram hashes via
    the shared splitmix chain, per-doc occurrence/distinct/top-count in
    exact integer aggregates."""
    gram_q = _chain_splitmix(_word_ngram_inner(ngram), ngram)
    return f"""
WITH {_token_hash_cte(table)},
c AS (SELECT doc_id, h, count(*)::BIGINT AS c FROM ({gram_q})
      GROUP BY doc_id, h),
per AS (SELECT doc_id, sum(c)::BIGINT AS n_grams,
               count(*)::BIGINT AS n_distinct, max(c)::BIGINT AS top_count
        FROM c GROUP BY doc_id)
SELECT d.doc_id,
       coalesce(p.n_grams, 0)::BIGINT AS n_grams,
       coalesce(p.n_distinct, 0)::BIGINT AS n_distinct,
       coalesce(p.top_count, 0)::BIGINT AS top_count,
       (coalesce(p.n_grams, 0) - coalesce(p.n_distinct, 0))
         * {dup_ratio_denom} > coalesce(p.n_grams, 0) AS repetitive
FROM {table} d LEFT JOIN per p USING (doc_id)
ORDER BY d.doc_id
"""


def span_corrupt_sql(table: str, dk_expr: str, span_len: int = 3,
                     rate_pct: int = 15, seed: int = 9,
                     sentinel_base: int = 50_100) -> str:
    """``trainprep.span_corrupt`` twin: the per-(doc, block) corruption
    decision ``splitmix64(splitmix64(dk ^ seed) ^ b) % 100 < rate_pct``
    replayed in HUGEINT arithmetic; blocks exploded with ``unnest(range)``,
    sentinel index k = exclusive running count of corrupted blocks,
    inputs/targets rebuilt with ordered ``flatten(list(...))``."""
    L = span_len
    q = (f"SELECT doc_id, tokens, coalesce(len(tokens), 0)::HUGEINT AS n, "
         f"xor(CAST({dk_expr} AS HUGEINT), {seed}::HUGEINT) AS h "
         f"FROM {table}")
    for layer in _splitmix_layers("h"):
        q = f"{layer} FROM ({q})"
    q = (f"SELECT doc_id, tokens, n, h, "
         f"unnest(range(CAST((n + {L - 1}) // {L} AS BIGINT))) AS b "
         f"FROM ({q})")
    q = f"SELECT * REPLACE (xor(h, b::HUGEINT) AS h) FROM ({q})"
    for layer in _splitmix_layers("h"):
        q = f"{layer} FROM ({q})"
    return f"""
WITH sel AS MATERIALIZED (
  SELECT doc_id, tokens, n, b, (h % 100) < {rate_pct} AS sel FROM ({q})
),
k AS (SELECT *,
        (count(*) FILTER (WHERE sel) OVER (PARTITION BY doc_id ORDER BY b
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))::INTEGER AS k,
        tokens[b * {L} + 1 : least((b + 1) * {L}, n)::BIGINT] AS bt
      FROM sel),
l AS (SELECT doc_id,
        flatten(list(CASE WHEN sel THEN [({sentinel_base} + k)::INTEGER]
                          ELSE bt END ORDER BY b)) AS inputs,
        flatten(list(CASE WHEN sel
                          THEN list_prepend(({sentinel_base} + k)::INTEGER, bt)
                          ELSE []::INTEGER[] END ORDER BY b)) AS targets,
        (count(*) FILTER (WHERE sel))::BIGINT AS n_spans
      FROM k GROUP BY doc_id)
SELECT d.doc_id, coalesce(l.inputs, []::INTEGER[]) AS inputs,
       coalesce(l.targets, []::INTEGER[]) AS targets,
       coalesce(l.n_spans, 0)::BIGINT AS n_spans
FROM {table} d LEFT JOIN l USING (doc_id) ORDER BY d.doc_id
"""


def chunk_sequences_sql(table: str, max_len: int = 2048,
                        stride: int = 1536) -> str:
    """``trainprep.chunk_sequences`` twin: window count by integer-exact
    ceil division, windows exploded with ``unnest(range(...))``, each
    window a 1-based inclusive list slice."""
    M, S = max_len, stride
    return f"""
WITH d AS (SELECT doc_id, tokens, coalesce(len(tokens), 0)::BIGINT AS n
           FROM {table}),
c AS (SELECT doc_id, tokens, n,
             unnest(range(CASE WHEN n = 0 THEN 0
                          ELSE 1 + (greatest(n - {M}, 0) + {S - 1}) // {S}
                          END)) AS k
      FROM d)
SELECT doc_id, k::BIGINT AS chunk_id,
       tokens[k * {S} + 1 : least(k * {S} + {M}, n)] AS tokens,
       least(n - k * {S}, {M})::INTEGER AS n_tok
FROM c ORDER BY doc_id, chunk_id
"""


def ngram_novelty_tokens_sql(table: str, ngram: int = 3,
                             common_df: int = 2) -> str:
    """``cleaning.ngram_novelty_tokens`` twin: per-doc DISTINCT gram
    hashes via the shared splitmix chain, document frequency by a
    GROUP BY over the hash, per-doc common-gram counts by join-back."""
    gram_q = _chain_splitmix(_word_ngram_inner(ngram), ngram)
    return f"""
WITH {_token_hash_cte(table)},
g AS (SELECT DISTINCT doc_id, h FROM ({gram_q})),
dfq AS (SELECT h, count(*)::BIGINT AS df FROM g GROUP BY h),
per AS (SELECT g.doc_id, count(*)::BIGINT AS n_distinct,
               (count(*) FILTER (WHERE dfq.df >= {common_df}))::BIGINT
                 AS n_common
        FROM g JOIN dfq USING (h) GROUP BY g.doc_id)
SELECT d.doc_id, coalesce(per.n_distinct, 0)::BIGINT AS n_distinct,
       coalesce(per.n_common, 0)::BIGINT AS n_common
FROM {table} d LEFT JOIN per USING (doc_id) ORDER BY d.doc_id
"""


def ul2_mixture_sql(table: str, dk_expr: str, seed: int = 9,
                    cls_seed: int = 77, sentinel_base: int = 50_100) -> str:
    """``trainprep.ul2_mixture`` twin: the class decision
    ``splitmix64(dk ^ cls_seed) % 4`` replayed in HUGEINT arithmetic;
    the three span branches reuse :func:`span_corrupt_sql` over the
    class-filtered table; the S branch (PrefixLM) is two list slices."""
    q = (f"SELECT doc_id, tokens, "
         f"xor(CAST({dk_expr} AS HUGEINT), {cls_seed}::HUGEINT) AS h "
         f"FROM {table}")
    for layer in _splitmix_layers("h"):
        q = f"{layer} FROM ({q})"
    # the class table and per-class configs come from ONE shared constant
    # (trainprep.UL2_CONFIGS) so pipeline and twin cannot drift
    from ..pipelines.trainprep import UL2_CONFIGS

    n_cls = len(UL2_CONFIGS)
    cls_tbl = (f"(SELECT doc_id, tokens, (h % {n_cls})::INTEGER AS cls "
               f"FROM ({q}))")
    branches = []
    for i, (tag, L, r) in enumerate(UL2_CONFIGS):
        if L is None:  # S-denoiser (PrefixLM): two list slices
            branches.append(f"""
SELECT doc_id,
  CASE WHEN n = 0 THEN []::INTEGER[]
       ELSE list_append(tokens[1:(3 * n) // 4],
                        {sentinel_base}::INTEGER) END AS inputs,
  CASE WHEN n = 0 THEN []::INTEGER[]
       ELSE list_prepend({sentinel_base}::INTEGER,
                         tokens[(3 * n) // 4 + 1 : n]) END AS targets,
  (n > 0)::BIGINT AS n_spans, '{tag}' AS denoiser
FROM (SELECT doc_id, tokens, coalesce(len(tokens), 0)::BIGINT AS n
      FROM {cls_tbl} WHERE cls = {i})
""")
            continue
        sub = f"(SELECT doc_id, tokens FROM {cls_tbl} WHERE cls = {i})"
        sq = span_corrupt_sql(sub, dk_expr=dk_expr, span_len=L, rate_pct=r,
                              seed=seed, sentinel_base=sentinel_base)
        branches.append(
            f"SELECT doc_id, inputs, targets, n_spans, '{tag}' AS denoiser "
            f"FROM ({sq})")
    return (" UNION ALL ".join(f"({b})" for b in branches)
            + " ORDER BY doc_id")


def hll_ndv_sql(table: str = "events", key: str = "event_type",
                col: str = "user_id", p: int = 12) -> str:
    """SQL twin of ``stats.grouped_ndv_hll``: HyperLogLog is a
    DETERMINISTIC sketch, so the estimate replays exactly — distinct
    (key, value) pairs -> splitmix64(value) -> register plane (index =
    top ``p`` hash bits, rank = leading zeros of the remaining bits
    + 1, max per register) -> the standard estimator with the
    small-range linear-counting correction (Flajolet et al. 2007).
    Integer columns only (the kernel hashes ints via the same
    splitmix64 finalizer these projection layers emulate)."""
    m = 1 << p
    rem = 1 << (64 - p)
    inner = (f"SELECT DISTINCT {key}, {col}::HUGEINT AS h FROM {table} "
             f"WHERE {col} IS NOT NULL")
    for layer in _splitmix_layers("h"):
        inner = f"{layer} FROM ({inner})"
    return f"""
WITH hashed AS ({inner}),
slots AS (
  SELECT {key},
         (h // {rem}::HUGEINT)::BIGINT AS idx,
         (h % {rem}::HUGEINT)::UBIGINT AS w
  FROM hashed
),
regs AS (
  SELECT {key}, idx,
         max(CASE WHEN w = 0 THEN {64 - p + 1}
             ELSE {64 - p + 1} - length(bin(w)) END) AS reg
  FROM slots GROUP BY {key}, idx
),
per_key AS (
  SELECT {key},
         sum(power(2.0, -reg)) AS s_present,
         count(*) AS n_present
  FROM regs GROUP BY {key}
),
est AS (
  SELECT {key},
         (0.7213 / (1 + 1.079 / {m})) * {m} * {m}
           / (s_present + ({m} - n_present)) AS e,
         {m} - n_present AS zeros
  FROM per_key
)
SELECT {key},
       CAST(round(CASE WHEN e <= 2.5 * {m} AND zeros > 0
                  THEN {m} * ln({m} / zeros::DOUBLE)
                  ELSE e END) AS BIGINT) AS ndv_hll
FROM est ORDER BY {key}
"""


def media_features_sql(table: str = "documents") -> str:
    """SQL twin of the multimodal fake-feature stage
    (`stages/multimodal.py: MediaFeatureStage._fake_features`) over
    text payloads: byte length, mean byte value, and six prefix
    polynomial hashes (base 131 over the first k bytes, k = 2..7,
    mixed by (k-1) * the splitmix64 constant mod 2^64, top 24 bits) —
    all exact integer arithmetic in HUGEINT (prefix < 2^50 and the
    mixed product < 2^114 both fit without partial products), cast to
    FLOAT exactly (< 2^24).  ASCII-only equivalence: ord(substr())
    yields codepoints, the kernel hashes bytes — identical on the
    ASCII synthetic corpus (same caveat as the shingle oracles)."""
    C = 0x9E3779B97F4A7C15
    M = 1 << 64
    ln = "strlen(text)"

    def first_k(k: int) -> str:
        terms = []
        for j in range(k):
            terms.append(
                f"CASE WHEN {ln} > {j} THEN "
                f"ord(substr(text, {j + 1}, 1))::HUGEINT * "
                f"power(131, least({ln}, {k}) - 1 - {j})::HUGEINT "
                f"ELSE 0::HUGEINT END")
        return " + ".join(terms)

    feats = [f"{ln}::FLOAT",
             f"CASE WHEN {ln} = 0 THEN 0.0::FLOAT ELSE "
             f"(list_aggregate(list_transform(string_split(text, ''), "
             f"x -> ord(x)), 'sum')::DOUBLE / greatest({ln}, 1))::FLOAT "
             f"END"]
    for k in range(2, 8):
        mix = ((k - 1) * C) % M
        feats.append(
            f"((({first_k(k)}) * {mix}::HUGEINT) % {M}::HUGEINT "
            f"// {1 << 40}::HUGEINT)::FLOAT")
    vec = "[" + ", ".join(feats) + "]"
    return (f"SELECT doc_id AS media_id, {ln}::BIGINT AS n_bytes, "
            f"{vec} AS features FROM {table} ORDER BY media_id")
