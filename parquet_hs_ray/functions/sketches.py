"""Mergeable sketches for dedup: shingling, MinHash, SimHash — vectorized.

Public-knowledge constructions (Broder 1997 resemblance/minwise hashing;
Charikar 2002 simhash). Per-batch kernels emit fixed-width numpy outputs so
Ray Data stages stay Arrow-native; the LSH banding / grouping happens in
the pipeline layer with `groupby` over band-hash columns.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_M61 = np.uint64((1 << 61) - 1)
_MIX = np.uint64(0x9E3779B97F4A7C15)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = (x + _MIX).astype(np.uint64)
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


def word_hashes(flat_words: np.ndarray) -> np.ndarray:
    """Per-word 64-bit hash: splitmix64 chained over the word's utf-8
    bytes from h=0 — the same public finalizer as the shingle kernels, so
    the ENTIRE minhash pipeline is replayable in DuckDB SQL (HUGEINT
    emulation in ``sql_oracles.minhash_pairs_sql``; a siphash here would
    not be). Vectorized as a frontier iteration over byte position: one
    splitmix pass per position over the still-active words (max word
    length passes total, each fully vectorized)."""
    m = len(flat_words)
    out = np.zeros(m, dtype=np.uint64)
    if m == 0:
        return out
    enc = [w.encode("utf-8", errors="surrogatepass") for w in flat_words]
    blens = np.asarray([len(b) for b in enc], dtype=np.int64)
    total = int(blens.sum())
    if total == 0:
        return out
    data = np.frombuffer(b"".join(enc), dtype=np.uint8).astype(np.uint64)
    offs = (np.cumsum(blens) - blens)
    active = np.flatnonzero(blens > 0)
    j = 0
    while len(active):
        out[active] = _splitmix64(out[active] ^ data[offs[active] + j])
        j += 1
        active = active[blens[active] > j]
    return out


def word_ngram_hashes(texts: pd.Series, n: int = 3) -> tuple[np.ndarray, np.ndarray]:
    """Hashes of word n-gram shingles per document.

    Returns (doc_lens, flat hashes): doc_lens[i] shingle hashes belong to
    doc i. Fully vectorized over the concatenated token stream."""
    from .text import flatten_words

    t = texts.fillna("").str.lower().str.split()
    lens = t.str.len().astype(np.int64).to_numpy()
    flat = flatten_words(t, lens)
    if not len(flat):
        return np.zeros(len(t), dtype=np.int64), np.empty(0, dtype=np.uint64)
    word_h = word_hashes(flat)
    return _ngram_combine(lens, word_h, n)


def _ngram_combine(lens: np.ndarray, unit_h: np.ndarray, n: int
                   ) -> tuple[np.ndarray, np.ndarray]:
    """Rolling n-gram shingle combine within doc boundaries over the
    concatenated per-unit hash stream: h = splitmix64(h ^ unit_k),
    h seeded 0 — shared by word and token shinglers (and replayed in SQL
    by the `_SH0` chain)."""
    n_sh = np.maximum(lens - n + 1, 0)
    offs = np.concatenate([np.zeros(1, dtype=np.int64), np.cumsum(lens)])
    sh_offs = np.concatenate([np.zeros(1, dtype=np.int64), np.cumsum(n_sh)])
    total = int(n_sh.sum())
    if total == 0:
        return n_sh, np.empty(0, dtype=np.uint64)
    first = np.repeat(offs[:-1], n_sh) + (np.arange(total, dtype=np.int64)
                                          - np.repeat(sh_offs[:-1], n_sh))
    h = np.zeros(total, dtype=np.uint64)
    for k in range(n):
        h = _splitmix64(h ^ unit_h[first + k])
    return n_sh, h


def token_ngram_hashes(lists: pd.Series, n: int = 3
                       ) -> tuple[np.ndarray, np.ndarray]:
    """Hashes of TOKEN-ID n-gram shingles per row of a ``list<int>``
    column (the engine's native pre-tokenized table) — each token hashes
    as one splitmix64 of its value (SQL twin: one splitmix chain over
    ``t::HUGEINT``), then the shared n-gram combine."""
    arrs = [np.asarray(x, dtype=np.int64) if x is not None and len(x)
            else np.empty(0, np.int64) for x in lists]
    lens = np.asarray([len(a) for a in arrs], dtype=np.int64)
    if not lens.sum():
        return np.zeros(len(lens), dtype=np.int64), np.empty(0, dtype=np.uint64)
    flat = np.concatenate(arrs)
    tok_h = _splitmix64(flat.view(np.uint64))
    return _ngram_combine(lens, tok_h, n)


def char_shingle_hashes(texts: pd.Series, k: int = 5) -> tuple[np.ndarray, np.ndarray]:
    """Character k-shingle hashes per document (byte-level, vectorized)."""
    t = texts.fillna("")
    enc = [s.encode("utf-8", errors="surrogatepass") for s in t]
    blens = np.asarray([len(b) for b in enc], dtype=np.int64)
    data = np.frombuffer(b"".join(enc), dtype=np.uint8) if blens.sum() else np.empty(0, np.uint8)
    n_sh = np.maximum(blens - k + 1, 0)
    total = int(n_sh.sum())
    if total == 0:
        return n_sh, np.empty(0, dtype=np.uint64)
    offs = np.concatenate([np.zeros(1, dtype=np.int64), np.cumsum(blens)])
    sh_offs = np.concatenate([np.zeros(1, dtype=np.int64), np.cumsum(n_sh)])
    first = np.repeat(offs[:-1], n_sh) + (np.arange(total, dtype=np.int64) - np.repeat(sh_offs[:-1], n_sh))
    h = np.zeros(total, dtype=np.uint64)
    for j in range(k):
        h = _splitmix64(h ^ data[first + j].astype(np.uint64))
    return n_sh, h


# 64 fixed odd multipliers for minhash permutations (seeded, public scheme
# h_i(x) = (a_i * x + b_i) mod 2^61-1)
_RNG = np.random.default_rng(42)
_A = (_RNG.integers(1, _M61, size=64, dtype=np.uint64) | np.uint64(1)).astype(np.uint64)
_B = _RNG.integers(0, _M61, size=64, dtype=np.uint64)


def minhash_signatures(n_sh: np.ndarray, hashes: np.ndarray, n_perm: int = 64) -> np.ndarray:
    """(n_docs, n_perm) uint64 signatures via segment-min over permuted
    hashes (minimum.reduceat over the doc-contiguous hash stream — the
    buffered ufunc.at is ~50x slower). Docs with zero shingles get all-max
    signatures."""
    n_docs = len(n_sh)
    sig = np.full((n_docs, n_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    if len(hashes) == 0:
        return sig
    n_sh = np.asarray(n_sh, dtype=np.int64)
    nonzero = n_sh > 0
    starts = (np.cumsum(n_sh) - n_sh)[nonzero]
    for p in range(n_perm):
        hp = (hashes * _A[p] + _B[p]) & _M61
        sig[nonzero, p] = np.minimum.reduceat(hp, starts)
    return sig


def minhash_bands(sig: np.ndarray, n_bands: int = 16) -> np.ndarray:
    """(n_docs, n_bands) band hashes (rows_per_band = n_perm / n_bands)."""
    n_docs, n_perm = sig.shape
    rpb = n_perm // n_bands
    bands = np.zeros((n_docs, n_bands), dtype=np.uint64)
    for b in range(n_bands):
        h = np.zeros(n_docs, dtype=np.uint64)
        for r in range(rpb):
            h = _splitmix64(h ^ sig[:, b * rpb + r])
        bands[:, b] = h
    return bands


def simhash64(n_sh: np.ndarray, hashes: np.ndarray) -> np.ndarray:
    """64-bit simhash per doc: sign of per-bit vote sums over feature
    hashes (vectorized via bincount per bit)."""
    n_docs = len(n_sh)
    out = np.zeros(n_docs, dtype=np.uint64)
    if len(hashes) == 0:
        return out.view(np.int64)
    doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), n_sh)
    counts = n_sh.astype(np.int64)
    for bit in range(64):
        ones = np.bincount(doc_of, weights=((hashes >> np.uint64(bit)) & np.uint64(1)).astype(np.float64), minlength=n_docs)
        vote = 2 * ones - counts  # ones - zeros
        out |= (vote > 0).astype(np.uint64) << np.uint64(bit)
    return out.view(np.int64)


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = (a.view(np.uint64) ^ b.view(np.uint64))
    return np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1)


def jaccard_pairs(set_a: list[np.ndarray], set_b: list[np.ndarray]) -> np.ndarray:
    """Exact Jaccard over pairs of (sorted unique) hash arrays."""
    out = np.empty(len(set_a))
    for i, (a, b) in enumerate(zip(set_a, set_b)):
        if len(a) == 0 and len(b) == 0:
            out[i] = 1.0
            continue
        inter = len(np.intersect1d(a, b, assume_unique=True))
        out[i] = inter / (len(a) + len(b) - inter)
    return out


# ---------------------------------------------------------------------------
# HyperLogLog (Flajolet-Fuster-Gandouet-Meunier 2007) — mergeable NDV sketch.
# The 100 TB path for count(DISTINCT): the shuffle carries one 2^p-byte
# register array per (group, block) instead of the distinct value set that
# the exact `grouped_distinct_count` must move.


def _leading_rank(w: np.ndarray, width: int) -> np.ndarray:
    """rank = (#leading zero bits of ``w`` within ``width`` bits) + 1,
    vectorized exactly (no float log2 — values within one ulp of a power
    of two would mis-rank). w == 0 -> width + 1."""
    w = w.astype(np.uint64)
    rank = np.full(len(w), width + 1, dtype=np.uint8)
    nz = w != 0
    # binary-search the highest set bit in 6 vectorized steps
    pos = np.zeros(len(w), dtype=np.int64)  # floor(log2(w)) accumulator
    v = w.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        big = v >= (np.uint64(1) << np.uint64(shift))
        pos[big] += shift
        v[big] >>= np.uint64(shift)
    rank[nz] = (width - 1 - pos[nz] + 1).astype(np.uint8)
    return rank


def hll_registers(hashes: np.ndarray, p: int = 12) -> np.ndarray:
    """uint64 hash values -> one HLL register array (2^p uint8)."""
    m = 1 << p
    h = hashes.astype(np.uint64)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    w = (h << np.uint64(p)).astype(np.uint64)  # remaining 64-p bits, left-aligned
    rank = _leading_rank(w >> np.uint64(p), 64 - p)
    regs = np.zeros(m, dtype=np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def hll_merge(reg_list: "list[np.ndarray]") -> np.ndarray:
    return np.maximum.reduce([r.astype(np.uint8) for r in reg_list])


def hll_estimate(regs: np.ndarray) -> int:
    """Standard HLL estimator with the small-range linear-counting
    correction; 64-bit hashes need no large-range correction."""
    m = len(regs)
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1 + 1.079 / m))
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.sum(regs == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return int(round(est))
