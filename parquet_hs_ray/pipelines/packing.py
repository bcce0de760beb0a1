"""Sequence packing: turn ragged pre-tokenized documents into fixed-length
training sequences (GPT-style concatenate-and-chunk).

The canonical last mile of a pre-training data pipeline: documents of
wildly varying n_tok become context_len-sized rows with zero padding
waste. Packing is per input block (block = partition at scale): within a
block the token streams of consecutive docs are concatenated and split
every ``context_len`` tokens — one vectorized Arrow offset construction,
no per-row loop — and the final shorter remainder chunk of each block is
kept (flagged via n_tok < context_len) so no token is ever dropped.
Cross-block packing would serialize the whole dataset; per-block
remainders waste at most one chunk per partition, negligible at a
2M-token partition budget.

Deterministic given the same input blocking (files -> blocks is stable
for a fixed input layout).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data


def pack_sequences(ds: "ray.data.Dataset", context_len: int = 2048,
                   token_col: str = "tokens") -> "ray.data.Dataset":
    def pack(t: pa.Table) -> pa.Table:
        arr = t[token_col].combine_chunks()
        flat = arr.flatten()  # respects offsets and null rows
        total = len(flat)
        if total == 0:
            empty = pa.ListArray.from_arrays(pa.array([0], pa.int32()),
                                             pa.array([], arr.type.value_type))
            return pa.table({token_col: empty.slice(0, 0),
                             "n_tok": pa.array([], pa.int32())})
        n_chunks = -(-total // context_len)
        offs = np.minimum(np.arange(n_chunks + 1, dtype=np.int64) * context_len,
                          total).astype(np.int32)
        chunks = pa.ListArray.from_arrays(pa.array(offs, pa.int32()), flat)
        lens = (offs[1:] - offs[:-1]).astype(np.int32)
        return pa.table({token_col: chunks, "n_tok": pa.array(lens)})

    # one batch per block: packing granularity == partition granularity
    return ds.map_batches(pack, batch_format="pyarrow", batch_size=None)
