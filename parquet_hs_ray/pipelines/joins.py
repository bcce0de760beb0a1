"""Relational operators Ray Data lacks, built from sort + per-block
vectorized kernels + junction correction (the engine's standard pattern,
cf. sessionize and pack_sequences_global).

``asof_join``: for every left row, attach the LATEST right row with
``right.ts <= left.ts`` for the same key — the classic time-series
enrichment join. DuckDB's native ``ASOF JOIN`` is the oracle.

Scale shape: union both sides tagged, ONE sort on (key, ts, side), then
each sorted block forward-fills right-side values per key fully
vectorized. The only cross-block state is the last right-side row of
each block's LAST key (keys are contiguous after the sort, so only the
single boundary key can straddle blocks); those one-row summaries fold
left-to-right on the driver (#blocks tiny rows — same driver footprint
as a partition plan), and each block gets at most one carry row
prepended. No shuffle beyond the sort, no per-group Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


def asof_join(left: "ray.data.Dataset", right: "ray.data.Dataset",
              key: str = "user_id", ts: str = "ts",
              left_cols: tuple[str, ...] = ("event_id",),
              right_cols: tuple[str, ...] = ("event_id", "value"),
              prefix: str = "matched_") -> pd.DataFrame:
    """Left as-of join: per left row, values of the latest right row with
    ``right.ts <= left.ts`` and equal ``key`` (NULLs when none exists).

    Ties on ``right.ts`` within a key break deterministically toward the
    LARGEST first ``right_cols`` value (callers pass a unique id first),
    mirrored in the SQL oracle via a row_number() dedup — DuckDB's ASOF
    tie behavior is otherwise unspecified.

    Returns a pandas DataFrame with ``key``, ``ts``, ``left_cols`` and
    ``prefix+right_cols`` (the sandbox-scale result is row-per-left-row;
    at scale, return the mapped Dataset instead of .to_pandas — the
    construction below is Dataset-native until the final collect)."""
    rid = right_cols[0]

    def tag_left(t: pa.Table) -> pa.Table:
        cols = {key: t[key], ts: t[ts],
                "_side": pa.array(np.ones(t.num_rows, np.int8))}
        for c in left_cols:
            cols[f"l_{c}"] = t[c]
        for c in right_cols:
            cols[f"r_{c}"] = pa.nulls(t.num_rows, t.schema.field(c).type) \
                if c in t.column_names else pa.nulls(t.num_rows, pa.float64())
        return pa.table(cols)

    def tag_right(t: pa.Table) -> pa.Table:
        cols = {key: t[key], ts: t[ts],
                "_side": pa.array(np.zeros(t.num_rows, np.int8))}
        for c in left_cols:
            cols[f"l_{c}"] = pa.nulls(t.num_rows, t.schema.field(c).type) \
                if c in t.column_names else pa.nulls(t.num_rows, pa.int64())
        for c in right_cols:
            cols[f"r_{c}"] = t[c]
        return pa.table(cols)

    both = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow"))
    # side=0 (right) sorts before side=1 (left) at equal ts -> a right row
    # at exactly left.ts is visible to that left row (ts >= semantics);
    # r_<rid> last in the key makes "last row wins" the max-id tie-break
    srt = both.sort([key, ts, "_side", f"r_{rid}"]).materialize()
    refs = srt.to_arrow_refs()

    @ray.remote(num_cpus=0)
    def block_summary(t):
        """(last key, latest right row's values for that key, or None)."""
        if not isinstance(t, pa.Table):
            t = pa.Table.from_pandas(t, preserve_index=False)
        if t.num_rows == 0:
            return None
        df = t.to_pandas()
        last_key = df[key].iloc[-1]
        g = df[(df[key] == last_key) & (df["_side"] == 0)]
        if len(g) == 0:
            return (last_key, None)
        return (last_key, g.iloc[-1][[ts] + [f"r_{c}" for c in right_cols]].to_dict())

    summaries = ray.get([block_summary.remote(r) for r in refs])

    # fold carries left-to-right: carry into block i = the latest right row
    # of the boundary key as of the end of block i-1
    carries: list[tuple | None] = [None] * len(refs)
    running: tuple | None = None
    for i, s in enumerate(summaries):
        carries[i] = running
        if s is None:
            continue
        last_key, row = s
        if row is not None:
            running = (last_key, row)
        elif running is not None and running[0] == last_key:
            pass  # key continues with no new right rows: carry flows
        else:
            running = None  # new key with no right rows yet

    left_schema = left.schema()
    l_dtypes = {c: left_schema.types[left_schema.names.index(c)].to_pandas_dtype()
                for c in left_cols}

    @ray.remote(num_cpus=1)
    def block_join(t, carry):
        if not isinstance(t, pa.Table):
            t = pa.Table.from_pandas(t, preserve_index=False)
        df = t.to_pandas()
        rmask = df["_side"] == 0
        out = df[df["_side"] == 1].copy()
        for c in right_cols:
            filled = df[f"r_{c}"].where(rmask).groupby(df[key]).ffill()
            out[f"r_{c}"] = filled[out.index]
        if carry is not None and len(out):
            # leading left rows of the boundary key that saw no in-block
            # right row inherit the carried latest right row
            m = (out[key] == carry[0]) & out[f"r_{rid}"].isna()
            if m.any():
                for c in right_cols:
                    out.loc[m, f"r_{c}"] = carry[1][f"r_{c}"]
        res = pd.DataFrame({key: out[key], ts: out[ts]})
        for c in left_cols:
            # the union nullability widened these to float/object; left
            # rows always carry real values, so the original dtype is safe
            res[c] = out[f"l_{c}"].astype(l_dtypes[c])
        for c in right_cols:
            res[prefix + c] = out[f"r_{c}"]
        return res

    parts = ray.get([block_join.remote(r, carries[i]) for i, r in enumerate(refs)])
    res = pd.concat([p for p in parts if len(p)], ignore_index=True)
    sort_cols = [key, ts] + list(left_cols)
    return res.sort_values(sort_cols, kind="stable").reset_index(drop=True)
