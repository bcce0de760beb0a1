"""Encoder stage: a stateful actor-pool ``map_batches`` class.

One batch = one (or a few) partition plan rows; the actor reads its exact
input slice (row-group-aligned, column-complete), encodes every column via
the auto-selected codec, writes the blob atomically, and emits the
manifest row. State held per actor (built once in ``__init__``, reused
across partitions): nothing model-sized yet, but the actor boundary is
where per-partition dict/FSST symbol tables live during a call — the
Ray-idiomatic home of the reference's threaded-through-recursion dictionary
state (`/root/reference/src/Parquet/Stream/Reader.hs:346-372`).

Restart-safety: encoding is deterministic (selector uses stride sampling,
no RNG) and the blob write is temp+rename keyed by partition id, so a
retried task overwrites with byte-identical content — idempotent.
"""

from __future__ import annotations

import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..format import encode_table
from ..plan import Partition
from ..state import manifest as mf


def read_slice(path: str, row_start: int, row_count: int, columns=None, filesystem=None) -> pa.Table:
    """Read exactly rows [row_start, row_start+row_count) of a parquet file
    (local path or URI / explicit pyarrow filesystem), touching only the row
    groups that overlap the range."""
    from ..state import fsio

    f = pq.ParquetFile(fsio.open_parquet_input(path, filesystem))
    base = 0
    rgs = []
    first_base = None
    for rg in range(f.num_row_groups):
        n = f.metadata.row_group(rg).num_rows
        if base + n > row_start and base < row_start + row_count:
            if first_base is None:
                first_base = base
            rgs.append(rg)
        base += n
        if base >= row_start + row_count:
            break
    if not rgs:
        return f.schema_arrow.empty_table()
    tbl = f.read_row_groups(rgs, columns=columns)
    return tbl.slice(row_start - first_base, row_count)


def attach_bloom_stats(entry: dict, tbl: pa.Table) -> None:
    """Attach per-column Bloom filters to a manifest entry: point-equality
    pruning stats min/max can't provide on high-cardinality columns
    (state/bloomstats.py). Shared by the encode and compact jobs."""
    if not tbl.num_rows:
        return
    from ..state import bloomstats as bst

    for name in tbl.column_names:
        st = entry["columns"].get(name)
        if st is not None:
            bl = bst.build_column_bloom(tbl[name])
            if bl is not None:
                st["bloom"] = bl


class EncoderStage:
    """Callable class for ``map_batches(EncoderStage, concurrency=N)`` over
    a control dataset of partition plan rows."""

    def __init__(self, out_dir: str, token_col: str | None = "n_tok", columns=None,
                 filesystem=None, input_filesystem=None, bloom_stats: bool = True):
        t0 = time.perf_counter()
        from ..memtune import ensure_process_tuned

        ensure_process_tuned()  # pay the page-fault storm once per actor
        self.out_dir = out_dir
        self.token_col = token_col
        self.columns = columns
        self.bloom_stats = bloom_stats
        self.filesystem = filesystem  # output (blobs + manifest)
        self.input_filesystem = input_filesystem  # source parquet
        self.init_ms = round((time.perf_counter() - t0) * 1e3, 1)
        self.first = True
        mf.ensure_dirs(out_dir, filesystem)

    def encode_partition(self, part: Partition) -> dict:
        t0 = time.perf_counter()
        tbl = read_slice(part.path, part.row_start, part.row_count, self.columns,
                         self.input_filesystem)
        t1 = time.perf_counter()
        blob, stats = encode_table(tbl)
        t2 = time.perf_counter()
        mf.write_blob_atomic(self.out_dir, part.partition_id, blob, self.filesystem)
        t3 = time.perf_counter()
        if self.token_col and self.token_col in tbl.column_names:
            col = tbl[self.token_col].combine_chunks()
            n_tokens = int(pa.compute.sum(col).as_py() or 0) if tbl.num_rows else 0
            n_tokens = max(0, n_tokens)
        else:
            n_tokens = 0
        entry = mf.make_entry(
            part, blob, raw_bytes=tbl.nbytes, n_rows=tbl.num_rows, n_tokens=n_tokens,
            col_stats=stats, wall_ms=(time.perf_counter() - t0) * 1e3,
        )
        if self.bloom_stats:
            attach_bloom_stats(entry, tbl)
        entry["read_ms"] = round((t1 - t0) * 1e3, 1)
        entry["encode_ms"] = round((t2 - t1) * 1e3, 1)
        entry["write_ms"] = round((t3 - t2) * 1e3, 1)
        if self.first:
            entry["actor_init_ms"] = self.init_ms
            self.first = False
        mf.write_entry(self.out_dir, entry, self.filesystem)
        return entry

    def __call__(self, batch: dict) -> dict:
        out = {"partition_id": [], "row_count": [], "n_tokens": [], "raw_bytes": [],
               "encoded_bytes": [], "wall_ms": []}
        n = len(batch["partition_id"])
        for i in range(n):
            part = Partition(
                partition_id=int(batch["partition_id"][i]),
                path=str(batch["path"][i]),
                row_start=int(batch["row_start"][i]),
                row_count=int(batch["row_count"][i]),
                est_tokens=int(batch["est_tokens"][i]),
            )
            e = self.encode_partition(part)
            for k in out:
                out[k].append(e[k])
        return {k: np.asarray(v) for k, v in out.items()}
