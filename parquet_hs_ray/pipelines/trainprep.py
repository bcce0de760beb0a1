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
