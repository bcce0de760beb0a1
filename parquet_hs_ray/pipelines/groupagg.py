"""High-cardinality grouped aggregation without Ray's per-row reduce.

Ray Data's ``groupby().aggregate()`` (both sort- and hash-shuffle
strategies in 2.49) finalizes groups with per-row Python iteration —
measured ~3k rows/s on (user, window) keys, i.e. 50 s of CPU for a 19k-
group aggregate that pandas does in milliseconds.  That cost is per
partial ROW, so it scales with the data, not with the group count: at
10^9 groups it is the whole job.

This module provides the scale shape instead:

1. callers pre-aggregate per batch (one partial row per group per block —
   the shuffle carries aggregates, not events);
2. ``sort(keys)`` — Ray's sort is a vectorized range shuffle (sample →
   range partition → Arrow merge), no per-row Python;
3. one vectorized pandas ``groupby`` per sorted block;
4. only group fragments that straddle a block boundary are re-merged.
   In globally sorted order a straddling group's fragments are
   necessarily the FIRST or LAST group of their blocks, so at most
   2 rows per block (not per group) leave the object store for the
   driver-side merge — bounded by block count, never by data size.

Reference analogue: the reference engine has no aggregation at all
(SURVEY.md §2.5); this is infrastructure for the training-data operators
(windows, dedup, term stats) mandated on top of it.
"""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np
import pandas as pd
import ray.data


# Below this many partial rows (one per group per block after the callers'
# pre-combine) the final merge happens on the driver in one vectorized
# pandas pass instead of paying Ray sort's ~5 s fixed scheduling cost.
# This bounds driver memory by construction (~tens of MB), the same
# cost-model choice real engines make between broadcast-final and
# shuffle-final aggregation; past it, the sort path engages.
SMALL_MERGE_ROWS = 500_000


def sorted_block_aggregate(
    partials: "ray.data.Dataset",
    keys: Sequence[str],
    block_agg: Callable[[pd.DataFrame], pd.DataFrame],
    edge_reduce: Callable[[pd.DataFrame], pd.DataFrame],
    small_merge_rows: int = SMALL_MERGE_ROWS,
) -> "ray.data.Dataset":
    """Aggregate ``partials`` by ``keys`` with vectorized per-block kernels.

    ``block_agg(df) -> df``: aggregate a key-sorted block to one row per
    group (must keep the key columns; output must be key-sorted, which a
    pandas ``groupby(sort=True)`` over sorted input gives for free).

    ``edge_reduce(df) -> df``: merge group FRAGMENTS that share a key
    across blocks.  Receives the concatenated edge rows (first+last group
    of every block, ≤2 per block); must return one row per key with the
    same columns/dtypes as ``block_agg``'s output.  It also sees
    single-fragment edge groups (cheapest correct contract) — for plain
    sums that is a no-op re-sum.
    """
    keys = list(keys)
    partials = partials.materialize()
    if partials.count() <= small_merge_rows:
        allp = partials.to_pandas()
        if not len(allp):
            return partials
        return ray.data.from_pandas(edge_reduce(allp))
    s = partials.sort(keys)

    def per_block(df: pd.DataFrame) -> pd.DataFrame:
        out = block_agg(df)
        n = len(out)
        edge = np.zeros(n, dtype=bool)
        if n:
            edge[0] = True
            edge[n - 1] = True
        out = out.copy()
        out["_edge"] = edge
        return out

    blocks = s.map_batches(per_block, batch_format="pandas", batch_size=None).materialize()

    edges = blocks.map_batches(
        lambda d: d[d["_edge"]].drop(columns="_edge"), batch_format="pandas"
    ).to_pandas()
    interior = blocks.map_batches(
        lambda d: d[~d["_edge"]].drop(columns="_edge"), batch_format="pandas"
    )
    if len(edges) == 0:
        return interior
    merged = edge_reduce(edges)
    merged = merged[list(edges.columns)]  # union needs identical schema order
    for c in edges.columns:  # and identical dtypes
        merged[c] = merged[c].astype(edges[c].dtype)
    return interior.union(ray.data.from_pandas(merged))


def grouped_sum(
    partials: "ray.data.Dataset",
    keys: Sequence[str],
    sum_cols: Sequence[str],
    small_merge_rows: int = SMALL_MERGE_ROWS,
) -> "ray.data.Dataset":
    """Sum ``sum_cols`` per distinct ``keys`` combination (the common case:
    callers' per-batch partials carry additive columns)."""
    keys, sum_cols = list(keys), list(sum_cols)

    def block_agg(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(keys, sort=True, as_index=False)[sum_cols].sum()

    return sorted_block_aggregate(partials, keys, block_agg, block_agg,
                                  small_merge_rows=small_merge_rows)


def grouped_agg(
    rows: "ray.data.Dataset",
    keys: Sequence[str],
    spec: dict,
    small_merge_rows: int = SMALL_MERGE_ROWS,
) -> "ray.data.Dataset":
    """General decomposable aggregate: ``spec`` maps column -> 'sum' |
    'min' | 'max' (all self-decomposable: agg of partial aggs == agg of
    rows).  A per-batch pre-combine runs BEFORE the sort so the shuffle
    carries one row per (group, input block), not one per input row."""
    keys = list(keys)
    cols = list(spec)

    def block_agg(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(keys, sort=True, as_index=False)[cols].agg(spec)

    partials = rows.map_batches(block_agg, batch_format="pandas")
    return sorted_block_aggregate(partials, keys, block_agg, block_agg,
                                  small_merge_rows=small_merge_rows)
