"""Vectorized Levenshtein edit distance for fuzzy string matching.

The classic Wagner–Fischer DP, vectorized across a BATCH of pairs: the
(i, j) cell recurrence is inherently sequential in i and j, so the
kernel runs L² scalar steps but each step is one numpy op over all N
pairs at once — O(L²) passes of O(N) work instead of N · O(L²) Python
loops.  Strings are compared as utf-8 BYTE sequences (DuckDB's
``levenshtein`` is also byte-based), padded into (N, L) uint8 matrices.

Pipeline-side candidate generation lives in
``pipelines.cleaning.fuzzy_self_pairs`` (length banding).
"""

from __future__ import annotations

import numpy as np


def _pad_bytes(strs, max_len: int) -> tuple[np.ndarray, np.ndarray]:
    n = len(strs)
    out = np.zeros((n, max_len), dtype=np.uint8)
    lens = np.zeros(n, dtype=np.int64)
    for i, s in enumerate(strs):
        b = s.encode("utf-8")[:max_len]
        lens[i] = len(b)
        out[i, : len(b)] = np.frombuffer(b, dtype=np.uint8)
    return out, lens


def levenshtein_pairs(a, b, max_len: int = 64) -> np.ndarray:
    """Edit distance for each aligned pair ``(a[i], b[i])`` — one numpy
    DP over the whole batch.  Strings longer than ``max_len`` bytes are
    truncated (bounded memory per pair: 2 rows of int32)."""
    a = list(a)
    b = list(b)
    n = len(a)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    A, la = _pad_bytes(a, max_len)
    B, lb = _pad_bytes(b, max_len)
    L = int(max(la.max(initial=0), lb.max(initial=0)))
    # row 0: d[0][j] = j, masked beyond each pair's own length later
    prev = np.tile(np.arange(L + 1, dtype=np.int32), (n, 1))
    for i in range(1, L + 1):
        cur = np.empty_like(prev)
        cur[:, 0] = i
        ai = A[:, i - 1][:, None]                     # (n, 1)
        sub = prev[:, :-1] + (ai != B[:, :L]).astype(np.int32)
        for j in range(1, L + 1):
            cur[:, j] = np.minimum(
                np.minimum(prev[:, j] + 1, cur[:, j - 1] + 1),
                sub[:, j - 1])
        # pairs whose A is shorter than i keep their previous row (their
        # DP has already terminated at row la)
        done = la < i
        cur[done] = prev[done]
        prev = cur
    return prev[np.arange(n), lb].astype(np.int64)
