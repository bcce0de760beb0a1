"""Distributed exact order statistics.

``grouped_quantiles`` computes EXACT per-group discrete quantiles the
scale-correct way: the shuffle carries a value-count histogram (one row
per distinct (group, value) per block, merged by ``groupagg``), never the
raw rows; the final selection walks each group's merged histogram with a
cumulative-count ``searchsorted``.  Cost is bounded by the value domain's
distinct cardinality per group (documented assumption — metric columns
like price/latency are discretized to cents/ms; for truly continuous
domains switch the histogram to fixed-width bins and accept bin-width
error, the standard t-digest-style trade).

Quantile definition matches DuckDB's ``quantile_disc`` exactly: the
sorted element with 1-based rank ``ceil(q*n)`` — so the SQL twin hashes
bit-identical (values are selected, never interpolated: no float math).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
import ray.data


def grouped_quantiles(ds: "ray.data.Dataset", key: str, col: str,
                      qs: Sequence[float] = (0.5, 0.95)) -> "ray.data.Dataset":
    """Per ``key`` group: exact discrete quantiles of ``col`` at each q in
    ``qs``.  Output columns: key, p<q*100> for each q (p50, p95, ...)."""
    qs = [float(q) for q in qs]
    names = [f"p{int(round(q * 100))}" for q in qs]

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = (batch.groupby([key, col], sort=False).size()
             .reset_index(name="cnt"))
        g["cnt"] = g["cnt"].astype(np.int64)
        return g

    from .groupagg import grouped_sum

    hist = grouped_sum(ds.map_batches(partial, batch_format="pandas"),
                       [key, col], ["cnt"])

    def select(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(col, kind="mergesort")
        cum = g["cnt"].to_numpy(dtype=np.int64).cumsum()
        n = int(cum[-1])
        vals = g[col].to_numpy()
        row = {key: [g[key].iloc[0]]}
        for q, name in zip(qs, names):
            rank = max(1, int(np.ceil(q * n)))  # 1-based, quantile_disc rule
            row[name] = [vals[np.searchsorted(cum, rank, side="left")]]
        return pd.DataFrame(row)

    # one histogram per group fits comfortably (distinct-value bounded);
    # group count is small relative to data so map_groups' per-group
    # overhead is not on the hot path
    return hist.groupby(key).map_groups(select, batch_format="pandas")
