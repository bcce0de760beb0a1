"""Skew-aware partition planning: split input parquet into encode partitions
bounded by a token budget.

North-rule mandate: "repartitions with explicit skew-aware splitting on
n_tok histograms so no partition exceeds a token budget". The axis-A hazard
is long-document skew (FIXTURES.md F1-skew: 1% of rows 100x longer) — naive
row-count partitioning gives one straggler task 100x the work.

The plan is the unit of lineage: every partition is a deterministic
``(file, row_start, row_count)`` slice of the input, identified by a stable
``partition_id``, so a retry or resume re-reads exactly the same rows (the
reference's analogous seams are independently-offset row groups /
column chunks, `/root/reference/src/Parquet/Types/RowGroup.hs:17-26` —
never exploited there; we make them the scheduling unit).

Planning reads ONLY the ``n_tok`` column (column-pruned row-group reads) —
a ~0.1% scan of the input. Partition boundaries align to parquet row groups
except when one row group alone exceeds the budget, in which case it is
split by row ranges using the row group's n_tok prefix sums; a single row
larger than the whole budget gets its own partition (never silently
dropped).
"""

from __future__ import annotations

import json
from dataclasses import asdict, dataclass

import numpy as np
import pyarrow.parquet as pq

DEFAULT_TOKEN_BUDGET = 4_000_000  # ~16 MB of int32 tokens per partition
DEFAULT_ROW_BUDGET = 262_144  # fallback weight for tables without n_tok


@dataclass
class Partition:
    partition_id: int
    path: str
    row_start: int
    row_count: int
    est_tokens: int


def plan_file(path: str, token_col: str | None = "n_tok", token_budget: int = DEFAULT_TOKEN_BUDGET,
              row_budget: int = DEFAULT_ROW_BUDGET, filesystem=None) -> list[dict]:
    """Plan one parquet file into partition dicts (partition_id assigned later)."""
    from .state import fsio

    f = pq.ParquetFile(fsio.open_parquet_input(path, filesystem))
    has_tok = token_col is not None and token_col in f.schema_arrow.names
    out: list[dict] = []
    cur_start = 0
    cur_rows = 0
    cur_tokens = 0
    row_base = 0

    def flush():
        nonlocal cur_start, cur_rows, cur_tokens
        if cur_rows > 0:
            out.append(dict(path=path, row_start=cur_start, row_count=cur_rows, est_tokens=int(cur_tokens)))
        cur_start += cur_rows
        cur_rows = 0
        cur_tokens = 0

    for rg in range(f.num_row_groups):
        meta = f.metadata.row_group(rg)
        n = meta.num_rows
        if has_tok:
            ntok = f.read_row_group(rg, columns=[token_col])[token_col].combine_chunks().to_numpy(zero_copy_only=False)
            ntok = np.nan_to_num(ntok.astype(np.float64), nan=0).astype(np.int64)
            ntok = np.maximum(ntok, 0)
            rg_tokens = int(ntok.sum())
        else:
            ntok = None
            rg_tokens = n * max(1, token_budget // row_budget)  # weight rows as uniform
        if rg_tokens > token_budget and ntok is not None:
            # split inside the row group on n_tok prefix sums
            flush()
            csum = np.cumsum(ntok)
            start = 0
            while start < n:
                # furthest row such that the slice stays within budget
                base = csum[start - 1] if start else 0
                end = int(np.searchsorted(csum, base + token_budget, side="right"))
                if end <= start:  # single row exceeds the budget: own partition
                    end = start + 1
                out.append(dict(path=path, row_start=row_base + start, row_count=end - start,
                                est_tokens=int(csum[end - 1] - base)))
                start = end
            cur_start = row_base + n
        else:
            if cur_rows and cur_tokens + rg_tokens > token_budget:
                flush()
                cur_start = row_base
            cur_rows += n
            cur_tokens += rg_tokens
        row_base += n
    flush()
    return out


def build_plan(paths: list[str], token_col: str | None = "n_tok",
               token_budget: int = DEFAULT_TOKEN_BUDGET, parallel: bool = True,
               filesystem=None) -> list[Partition]:
    """Plan all input files. Uses a Ray Data control dataset when a Ray
    session is up (per-file planning fans out; each task reads only the
    token column), else runs locally."""
    paths = sorted(paths)
    entries: list[dict] = []
    use_ray = False
    if parallel and len(paths) > 1:
        try:
            import ray

            use_ray = ray.is_initialized()
        except ImportError:
            use_ray = False
    if use_ray:
        import ray

        @ray.remote(num_cpus=1)
        def _plan(p):
            return plan_file(p, token_col, token_budget, filesystem=filesystem)

        for chunk in ray.get([_plan.remote(p) for p in paths]):
            entries.extend(chunk)
    else:
        for p in paths:
            entries.extend(plan_file(p, token_col, token_budget, filesystem=filesystem))
    return [Partition(partition_id=i, **e) for i, e in enumerate(entries)]


def save_plan(plan: list[Partition], path: str, filesystem=None) -> None:
    from .state import fsio

    fsio.write_atomic(path, json.dumps([asdict(p) for p in plan]).encode(), filesystem)


def load_plan(path: str, filesystem=None) -> list[Partition]:
    from .state import fsio

    return [Partition(**e) for e in json.loads(fsio.read_bytes(path, filesystem))]
