"""Training-prep transforms over the native pre-tokenized sequence table
(the BASELINE.json input shape): deterministic MLM masking, next-token
label shift, and max-length truncation — the last-mile tensor-prep ops a
training dataloader otherwise does on the fly, pushed into the data
plane so they run once, vectorized, at encode time.

All three are pure streaming ``map_batches`` over zero-copy Arrow list
columns (one flatten + vectorized kernel + one ListArray rebuild per
block; no shuffle, no per-row Python) and all three are deterministic by
content — reproducible on any cluster size or block layout — so each
carries a hash-exact DuckDB twin (the masking decision replays the
public splitmix64 chain the sketch family already emulates in SQL).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..functions.sketches import _splitmix64


def _list_parts(col) -> "tuple[pa.DataType, np.ndarray, np.ndarray, np.ndarray]":
    """(value_type, lens, validity, flat values) of a list column; null
    lists read as length 0 but keep their null flag."""
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    lens = pc.list_value_length(col).to_numpy(zero_copy_only=False)
    if lens.dtype == np.int32:
        valid = np.ones(len(lens), dtype=bool)
        lens_i = lens.astype(np.int64)
    else:  # float64 with NaN where the list itself is null
        valid = ~np.isnan(lens)
        lens_i = np.nan_to_num(lens).astype(np.int64)
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
    return col.type.value_type, lens_i, valid, flat


def _rebuild(lens: np.ndarray, valid: np.ndarray, flat: np.ndarray,
             vtype: "pa.DataType") -> "pa.ListArray":
    offs = np.zeros(len(lens) + 1, dtype=np.int32)
    np.cumsum(lens, out=offs[1:])
    return pa.ListArray.from_arrays(
        pa.array(offs, pa.int32()), pa.array(flat, type=vtype),
        mask=pa.array(~valid) if not valid.all() else None)


def mask_tokens_mlm(ds: "ray.data.Dataset", mask_id: int,
                    rate_pct: int = 15, seed: int = 1,
                    ignore_id: int = -100, token_col: str = "tokens"
                    ) -> "ray.data.Dataset":
    """BERT-style masked-language-model corruption, DETERMINISTIC by
    (token value, position): a position is masked iff
    ``splitmix64(splitmix64(token ^ seed) ^ pos) % 100 < rate_pct``
    (``pos`` 0-based within the document) — no RNG state, identical
    output on any cluster size or block layout, and the exact chain the
    DuckDB twin replays in HUGEINT arithmetic.  Masked positions get
    ``mask_id`` in ``tokens`` and their original value in ``labels``;
    unmasked positions keep their token and get ``ignore_id`` in
    ``labels`` (the loss-mask convention).  Returns
    (doc_id, tokens, labels, n_masked)."""

    def f(t: pa.Table) -> pa.Table:
        vtype, lens, valid, flat = _list_parts(t[token_col])
        total = len(flat)
        starts = np.concatenate([np.zeros(1, np.int64), np.cumsum(lens)[:-1]])
        pos = (np.arange(total, dtype=np.int64)
               - np.repeat(starts, lens)).astype(np.uint64)
        h = _splitmix64(flat.astype(np.uint64) ^ np.uint64(seed))
        h = _splitmix64(h ^ pos)
        m = (h % np.uint64(100)) < np.uint64(rate_pct)
        newtok = np.where(m, np.int64(mask_id), flat)
        labels = np.where(m, flat, np.int64(ignore_id))
        doc_of = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        n_masked = np.bincount(doc_of, weights=m.astype(np.float64),
                               minlength=len(lens)).astype(np.int64)
        return pa.table({
            "doc_id": t["doc_id"],
            "tokens": _rebuild(lens, valid, newtok, vtype),
            "labels": _rebuild(lens, valid, labels, vtype),
            "n_masked": pa.array(n_masked, pa.int64()),
        })

    return ds.map_batches(f, batch_format="pyarrow")


def shift_labels(ds: "ray.data.Dataset", ignore_id: int = -100,
                 token_col: str = "tokens") -> "ray.data.Dataset":
    """Causal-LM label construction: ``labels[i] = tokens[i+1]`` with the
    document's final position getting ``ignore_id`` (next-token targets,
    never crossing a document boundary).  Returns the input plus a
    ``labels`` column of the same list type."""

    def f(t: pa.Table) -> pa.Table:
        vtype, lens, valid, flat = _list_parts(t[token_col])
        labels = np.roll(flat, -1) if len(flat) else flat
        ends = np.cumsum(lens) - 1  # last position of each non-empty doc
        ends = ends[lens > 0]
        if len(ends):
            labels = labels.copy() if len(flat) else labels
            labels[ends] = np.int64(ignore_id)
        return t.append_column("labels", _rebuild(lens, valid, labels, vtype))

    return ds.map_batches(f, batch_format="pyarrow")


def truncate_sequences(ds: "ray.data.Dataset", max_len: int,
                       token_col: str = "tokens",
                       len_col: "str | None" = "n_tok"
                       ) -> "ray.data.Dataset":
    """Enforce a maximum sequence length: keep each document's first
    ``max_len`` tokens (the head-truncation convention) and clamp
    ``len_col`` to match.  One ragged head-gather per block."""
    if max_len < 0:
        raise ValueError(f"max_len must be >= 0, got {max_len}")

    def f(t: pa.Table) -> pa.Table:
        vtype, lens, valid, flat = _list_parts(t[token_col])
        new_lens = np.minimum(lens, max_len)
        starts = np.concatenate([np.zeros(1, np.int64), np.cumsum(lens)[:-1]])
        new_starts = np.concatenate([np.zeros(1, np.int64),
                                     np.cumsum(new_lens)[:-1]])
        idx = (np.arange(int(new_lens.sum()), dtype=np.int64)
               - np.repeat(new_starts, new_lens)
               + np.repeat(starts, new_lens))
        out = t.set_column(t.schema.get_field_index(token_col), token_col,
                           _rebuild(new_lens, valid, flat[idx], vtype))
        if len_col is not None and len_col in t.schema.names:
            lt = t[len_col]
            lt = lt.combine_chunks() if isinstance(lt, pa.ChunkedArray) else lt
            clamped = pc.min_element_wise(
                lt, pa.scalar(max_len, type=lt.type))
            out = out.set_column(out.schema.get_field_index(len_col),
                                 len_col, clamped)
        return out

    return ds.map_batches(f, batch_format="pyarrow")


def fim_transform(ds: "ray.data.Dataset", rate_pct: int = 50,
                  pre_id: int = 50281, suf_id: int = 50282,
                  mid_id: int = 50283, token_col: str = "tokens",
                  id_col: str = "doc_id", len_col: str = "n_tok"
                  ) -> "ray.data.Dataset":
    """Fill-in-the-middle (PSM) transformation (Bavarian et al. 2022,
    arXiv:2207.14255): selected documents are reordered to
    ``[pre_id] prefix [suf_id] suffix [mid_id] middle`` so an
    autoregressive model learns infilling.

    Fully DETERMINISTIC by doc id — no RNG state, identical on any
    cluster size or block layout, hash-exact SQL twin:

    - selection: first 8 md5 hex chars of ``id_col`` mod 100 <
      ``rate_pct`` (the ``deterministic_mix`` rule);
    - split points from the NEXT md5 hex slices: ``a = 1 + h1 % (n-1)``
      (prefix = first ``a`` tokens), ``b = a + h2 % (n-a)``
      (middle = tokens[a:b], may be empty; suffix = tokens[b:], never
      empty).  Documents with fewer than 2 tokens (or null) pass
      through unchanged.

    Streaming ``map_batches``: one flatten, one vectorized gather-index
    construction (six masked assignments over a global position array),
    one ListArray rebuild — no per-row Python on the token path.
    Output adds a ``fim`` bool column; ``len_col`` is recomputed
    (``n + 3`` where applied) preserving its type."""
    if not (0 <= rate_pct <= 100):
        raise ValueError("rate_pct must be 0..100")

    def f(t: pa.Table) -> pa.Table:
        import pandas as pd

        from ..functions.text import md5_hex

        vtype, lens, valid, flat = _list_parts(t[token_col])
        n_rows = len(lens)
        hx = md5_hex(pd.Series(t[id_col].to_pylist()).astype(str))
        bucket = np.asarray([int(x[:8], 16) for x in hx],
                            dtype=np.int64) % 100
        h1 = np.asarray([int(x[8:16], 16) for x in hx], dtype=np.int64)
        h2 = np.asarray([int(x[16:24], 16) for x in hx], dtype=np.int64)

        app = (bucket < rate_pct) & (lens >= 2) & valid
        a = np.where(app, 1 + h1 % np.maximum(lens - 1, 1), 0)
        b = np.where(app, a + h2 % np.maximum(lens - a, 1), 0)

        out_lens = lens + np.where(app, 3, 0)
        in_starts = np.zeros(n_rows, dtype=np.int64)
        np.cumsum(lens[:-1], out=in_starts[1:]) if n_rows > 1 else None
        out_starts = np.zeros(n_rows, dtype=np.int64)
        if n_rows > 1:
            np.cumsum(out_lens[:-1], out=out_starts[1:])
        total = int(out_lens.sum())
        p = np.arange(total, dtype=np.int64) - np.repeat(out_starts, out_lens)
        S = np.repeat(in_starts, out_lens)
        A = np.repeat(a, out_lens)
        B = np.repeat(b, out_lens)
        N = np.repeat(lens, out_lens)
        APP = np.repeat(app, out_lens)
        suf = N - B

        out_vals = np.empty(total, dtype=np.int64)
        m = ~APP
        out_vals[m] = flat[(S + p)[m]]
        m = APP & (p == 0)
        out_vals[m] = pre_id
        m = APP & (p >= 1) & (p <= A)
        out_vals[m] = flat[(S + p - 1)[m]]
        m = APP & (p == A + 1)
        out_vals[m] = suf_id
        m = APP & (p >= A + 2) & (p <= A + 1 + suf)
        out_vals[m] = flat[(S + B + p - A - 2)[m]]
        m = APP & (p == A + 2 + suf)
        out_vals[m] = mid_id
        m = APP & (p > A + 2 + suf)
        out_vals[m] = flat[(S + A + p - A - 3 - suf)[m]]

        arr = _rebuild(out_lens, valid, out_vals, vtype)
        out = t.set_column(t.schema.get_field_index(token_col),
                           token_col, arr)
        if len_col in t.column_names:
            new_len = pa.array(out_lens, pa.int64()).cast(
                t.schema.field(len_col).type)
            out = out.set_column(out.schema.get_field_index(len_col),
                                 len_col, new_len)
        return out.append_column("fim", pa.array(app))

    return ds.map_batches(f, batch_format="pyarrow")
