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


def span_corrupt(ds: "ray.data.Dataset", span_len: int = 3,
                 rate_pct: int = 15, seed: int = 9,
                 sentinel_base: int = 50_100, token_col: str = "tokens",
                 key_col: str = "dk", id_col: str = "doc_id"
                 ) -> "ray.data.Dataset":
    """T5-style span corruption (Raffel et al. 2020, arXiv:1910.10683),
    FIXED-LENGTH-BLOCK variant: the sequence is cut into consecutive
    blocks of ``span_len`` tokens; block ``b`` of a document is
    corrupted iff ``splitmix64(splitmix64(dk ^ seed) ^ b) % 100 <
    rate_pct`` (``dk`` = the int64 document key in ``key_col``) —
    non-overlapping spans by construction, so the decision is per
    (doc, block) with NO sequential scan, deterministic on any cluster
    size or block layout, and exactly replayable in SQL (the proven
    HUGEINT splitmix chain).  T5 samples span lengths; fixing them is
    the documented simplification that buys blockwise exactness.

    Outputs per document: ``inputs`` (original tokens with each
    corrupted block collapsed to one sentinel — ``sentinel_base + k``
    for the doc's k-th corrupted block, 0-based), ``targets``
    (``[sentinel_k, span tokens...]`` concatenated in block order) and
    ``n_spans``.  One flatten + vectorized segment arithmetic + two
    ListArray rebuilds per batch; no per-row Python."""
    if span_len < 1:
        raise ValueError("span_len must be >= 1")
    L, r, sd, base = span_len, rate_pct, seed, sentinel_base

    def f(t: pa.Table) -> pa.Table:
        return _span_corrupt_table(t, L, r, sd, base, token_col, key_col,
                                   id_col)

    return ds.map_batches(f, batch_format="pyarrow")


def _span_corrupt_table(t: pa.Table, span_len: int, rate_pct: int,
                        seed: int, sentinel_base: int, token_col: str,
                        key_col: str, id_col: str) -> pa.Table:
    """Per-batch kernel of :func:`span_corrupt` (shared with
    :func:`ul2_mixture`): fixed-length-block T5 corruption of one Arrow
    table -> (id, inputs, targets, n_spans)."""
    from ..functions.sketches import _splitmix64

    L = span_len
    sd = np.uint64(seed)
    vtype, lens, valid, flat = _list_parts(t[token_col])
    n_rows = len(lens)
    dk = np.asarray(t[key_col].to_numpy(zero_copy_only=False),
                    dtype=np.int64).astype(np.uint64)
    h0 = _splitmix64(dk ^ sd)

    nb = (lens + L - 1) // L                       # blocks per row
    total_b = int(nb.sum())
    b_starts = np.zeros(n_rows, dtype=np.int64)
    if n_rows > 1:
        np.cumsum(nb[:-1], out=b_starts[1:])
    blk = np.arange(total_b, dtype=np.int64) - np.repeat(b_starts, nb)
    h = _splitmix64(np.repeat(h0, nb) ^ blk.astype(np.uint64))
    sel = (h % np.uint64(100)) < np.uint64(rate_pct)
    # k = per-row EXCLUSIVE running count of selected blocks
    incl = np.cumsum(sel.astype(np.int64))
    excl = incl - sel.astype(np.int64)
    # rows with nb == 0 at the END of the batch have b_starts == total_b
    # (out of range); clip — their repeat count is 0 so the value is unused
    k_blk = (excl - np.repeat(excl[np.minimum(b_starts, total_b - 1)], nb)
             if total_b else excl)
    blk_len = np.minimum(np.repeat(lens, nb) - blk * L, L)

    in_starts = np.zeros(n_rows, dtype=np.int64)
    if n_rows > 1:
        np.cumsum(lens[:-1], out=in_starts[1:])

    # ---- inputs: per block contributes blk_len (kept) or 1 (sentinel)
    in_contrib = np.where(sel, 1, blk_len)
    row_in_lens = np.zeros(n_rows, dtype=np.int64)
    np.add.at(row_in_lens, np.repeat(np.arange(n_rows), nb), in_contrib)
    tot_in = int(in_contrib.sum())
    # expand per block: local offset q within the block's contribution
    q = np.arange(tot_in, dtype=np.int64) - np.repeat(
        np.concatenate([[0], np.cumsum(in_contrib[:-1])])
        if total_b else np.zeros(0, np.int64), in_contrib)
    SEL = np.repeat(sel, in_contrib)
    SRC = np.repeat(np.repeat(in_starts, nb) + blk * L, in_contrib)
    KV = np.repeat(sentinel_base + k_blk, in_contrib)
    in_vals = np.where(SEL, KV, 0)
    m = ~SEL
    in_vals[m] = flat[(SRC + q)[m]] if len(flat) else 0

    # ---- targets: selected blocks contribute 1 + blk_len
    tg_contrib = np.where(sel, blk_len + 1, 0)
    row_tg_lens = np.zeros(n_rows, dtype=np.int64)
    np.add.at(row_tg_lens, np.repeat(np.arange(n_rows), nb), tg_contrib)
    tot_tg = int(tg_contrib.sum())
    qt = np.arange(tot_tg, dtype=np.int64) - np.repeat(
        np.concatenate([[0], np.cumsum(tg_contrib[:-1])])
        if total_b else np.zeros(0, np.int64), tg_contrib)
    SRCt = np.repeat(np.repeat(in_starts, nb) + blk * L, tg_contrib)
    KVt = np.repeat(sentinel_base + k_blk, tg_contrib)
    tg_vals = np.where(qt == 0, KVt, 0)
    m = qt > 0
    tg_vals[m] = flat[(SRCt + qt - 1)[m]] if len(flat) else 0

    n_spans = np.zeros(n_rows, dtype=np.int64)
    np.add.at(n_spans, np.repeat(np.arange(n_rows), nb),
              sel.astype(np.int64))

    return pa.table({
        id_col: t[id_col],
        "inputs": _rebuild(row_in_lens, valid, in_vals, vtype),
        "targets": _rebuild(row_tg_lens, valid, tg_vals, vtype),
        "n_spans": pa.array(n_spans, pa.int64()),
    })



def chunk_sequences(ds: "ray.data.Dataset", max_len: int = 2048,
                    stride: int = 1536, token_col: str = "tokens",
                    id_col: str = "doc_id") -> "ray.data.Dataset":
    """Sliding-window chunking for long-context training: each document
    explodes into overlapping windows ``tokens[k*stride : k*stride +
    max_len]`` for ``k = 0 .. ceil(max(n - max_len, 0) / stride)`` —
    the HuggingFace ``return_overflowing_tokens`` + ``stride``
    convention (consecutive windows overlap by ``max_len - stride``
    tokens, the last window is the only one allowed shorter, empty
    documents yield no chunks).  Pure per-row arithmetic: a
    ``map_batches`` explode with one flatten + vectorized gather + one
    ListArray rebuild per block, no shuffle, deterministic on any block
    layout, and exactly replayable in SQL (``unnest(range(...))`` +
    1-based list slices).

    Output: ``(doc_id, chunk_id, tokens, n_tok)``, one row per window.
    """
    if stride < 1 or max_len < 1:
        raise ValueError("max_len and stride must be >= 1")
    if stride > max_len:
        # the overlap convention (max_len - stride) is meaningless past
        # max_len and the window-count formula would skip tokens
        raise ValueError(f"stride ({stride}) must be <= max_len ({max_len})")
    M, S = max_len, stride

    def f(t: pa.Table) -> pa.Table:
        vtype, lens, valid, flat = _list_parts(t[token_col])
        n_rows = len(lens)
        over = np.maximum(lens - M, 0)
        nc = np.where(lens > 0, 1 + (over + S - 1) // S, 0)
        total = int(nc.sum())
        row_of = np.repeat(np.arange(n_rows), nc)
        c_starts = np.zeros(n_rows, dtype=np.int64)
        if n_rows > 1:
            np.cumsum(nc[:-1], out=c_starts[1:])
        k = np.arange(total, dtype=np.int64) - np.repeat(c_starts, nc)
        s = k * S
        clens = np.minimum(lens[row_of] - s, M)

        in_starts = np.zeros(n_rows, dtype=np.int64)
        if n_rows > 1:
            np.cumsum(lens[:-1], out=in_starts[1:])
        tot_v = int(clens.sum())
        v_starts = np.concatenate([[0], np.cumsum(clens[:-1])]) if total \
            else np.zeros(0, np.int64)
        q = np.arange(tot_v, dtype=np.int64) - np.repeat(v_starts, clens)
        vals = flat[np.repeat(in_starts[row_of] + s, clens) + q] \
            if tot_v else np.zeros(0, np.int64)

        ids = t[id_col].combine_chunks() if isinstance(
            t[id_col], pa.ChunkedArray) else t[id_col]
        return pa.table({
            id_col: ids.take(pa.array(row_of, pa.int64())),
            "chunk_id": pa.array(k, pa.int64()),
            "tokens": _rebuild(clens, np.ones(total, dtype=bool), vals,
                               vtype),
            "n_tok": pa.array(clens.astype(np.int32), pa.int32()),
        })

    return ds.map_batches(f, batch_format="pyarrow")


def _prefix_lm_table(t: pa.Table, sentinel_base: int, token_col: str,
                     id_col: str) -> pa.Table:
    """S-denoiser kernel (PrefixLM): the suffix quarter (``n - 3n//4``
    tokens, >=1 for non-empty docs) is the single corrupted span —
    ``inputs = prefix + [sentinel]``, ``targets = [sentinel] + suffix``."""
    vtype, lens, valid, flat = _list_parts(t[token_col])
    n_rows = len(lens)
    c = (3 * lens) // 4
    in_lens = np.where(lens > 0, c + 1, 0)
    tg_lens = np.where(lens > 0, lens - c + 1, 0)
    starts = np.zeros(n_rows, dtype=np.int64)
    if n_rows > 1:
        np.cumsum(lens[:-1], out=starts[1:])

    tot_in = int(in_lens.sum())
    q = np.arange(tot_in, dtype=np.int64) - np.repeat(
        np.concatenate([[0], np.cumsum(in_lens[:-1])])
        if n_rows else np.zeros(0, np.int64), in_lens)
    sent = q == np.repeat(c, in_lens)
    in_vals = np.where(sent, np.int64(sentinel_base), 0)
    m = ~sent
    in_vals[m] = flat[(np.repeat(starts, in_lens) + q)[m]] if len(flat) \
        else 0

    tot_tg = int(tg_lens.sum())
    qt = np.arange(tot_tg, dtype=np.int64) - np.repeat(
        np.concatenate([[0], np.cumsum(tg_lens[:-1])])
        if n_rows else np.zeros(0, np.int64), tg_lens)
    tg_vals = np.where(qt == 0, np.int64(sentinel_base), 0)
    m = qt > 0
    tg_vals[m] = flat[(np.repeat(starts + c, tg_lens) + qt - 1)[m]] \
        if len(flat) else 0

    return pa.table({
        id_col: t[id_col],
        "inputs": _rebuild(in_lens, valid, in_vals, vtype),
        "targets": _rebuild(tg_lens, valid, tg_vals, vtype),
        "n_spans": pa.array((lens > 0).astype(np.int64), pa.int64()),
    })


#: UL2 denoiser configs: tag -> (span_len, rate_pct); 's' is PrefixLM.
UL2_CONFIGS = (("r", 3, 15), ("x", 12, 15), ("xd", 3, 50), ("s", None, None))


def ul2_mixture(ds: "ray.data.Dataset", seed: int = 9, cls_seed: int = 77,
                sentinel_base: int = 50_100, token_col: str = "tokens",
                key_col: str = "dk", id_col: str = "doc_id"
                ) -> "ray.data.Dataset":
    """UL2 mixture-of-denoisers (Tay et al. 2022, arXiv:2205.05131):
    each document is assigned ONE denoiser by
    ``splitmix64(dk ^ cls_seed) % 4`` —

    - 0 ``r``: R-denoiser, short spans / low rate (span_len 3, 15%)
    - 1 ``x``: X-denoiser, long spans (span_len 12, 15%)
    - 2 ``xd``: X-denoiser, dense (span_len 3, 50%)
    - 3 ``s``: S-denoiser (PrefixLM): the suffix quarter is the single
      corrupted span

    — so the mixture is deterministic by document key, reproducible on
    any cluster size or block layout, and each branch replays exactly
    in SQL (the shared splitmix chain + the span-corrupt twin).  All
    four branches run inside ONE ``map_batches`` (an Arrow mask filter
    per class, the shared span-corrupt kernel, one concat) — no
    dataset-level fan-out, no shuffle.  Output:
    ``(doc_id, inputs, targets, n_spans, denoiser)``."""
    from ..functions.sketches import _splitmix64

    cs = np.uint64(cls_seed)

    def f(t: pa.Table) -> pa.Table:
        dk = np.asarray(t[key_col].to_numpy(zero_copy_only=False),
                        dtype=np.int64).astype(np.uint64)
        cls = (_splitmix64(dk ^ cs) % np.uint64(4)).astype(np.int64)
        outs = []
        for i, (tag, L, r) in enumerate(UL2_CONFIGS):
            sub = t.filter(pa.array(cls == i))
            if sub.num_rows == 0:
                continue
            part = (_prefix_lm_table(sub, sentinel_base, token_col, id_col)
                    if L is None else
                    _span_corrupt_table(sub, L, r, seed, sentinel_base,
                                        token_col, key_col, id_col))
            outs.append(part.append_column(
                "denoiser", pa.array([tag] * sub.num_rows, pa.string())))
        if not outs:
            sch = pa.schema([
                (id_col, t.schema.field(id_col).type),
                ("inputs", t.schema.field(token_col).type),
                ("targets", t.schema.field(token_col).type),
                ("n_spans", pa.int64()), ("denoiser", pa.string())])
            return sch.empty_table()
        return pa.concat_tables(outs)

    return ds.map_batches(f, batch_format="pyarrow")
