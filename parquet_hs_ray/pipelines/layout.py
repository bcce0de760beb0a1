"""Data-layout pipelines: z-order (Morton) clustering before encode.

``selector.advise_sort_order`` picks the best SINGLE sort order by trial
encode; this module adds the multi-predicate layout: sort by a 2-D
Morton key so per-partition manifest min/max boxes are tight in BOTH
dimensions and ``decode_dataset(predicate=...)`` prunes on either
column.  The sort is Ray Data's vectorized range shuffle (sample →
range partition → Arrow merge) over an int64 key column — the one
all-to-all exchange the layout pays, amortized over every pruned read
after it.

Scale shape: the min/max stats pass reads ONLY the key columns (column
pruning at the read), reduces one 2-value row per block, and the z-key
kernel is pure numpy bit surgery per batch."""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
import ray.data

from ..functions import zorder as zo


def column_minmax(ds: "ray.data.Dataset", cols: Sequence[str]) -> dict:
    """Per-column global (min, max) via one block-partial pass — the
    shuffle-free stats read that precedes the layout sort.  Returns
    ``{col: (lo, hi)}`` as python ints."""
    cols = list(cols)

    def mm(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                                 for cc in cols for c in (f"{cc}__lo", f"{cc}__hi")})
        return pd.DataFrame({c: [v] for cc in cols
                             for c, v in ((f"{cc}__lo", b[cc].min()),
                                          (f"{cc}__hi", b[cc].max()))})

    p = (ds.select_columns(cols)
         .map_batches(mm, batch_format="pandas").to_pandas())
    if not len(p) or p[f"{cols[0]}__lo"].isna().all():
        raise ValueError(
            f"column_minmax: dataset has no rows for columns {cols} — "
            "an empty table has no layout to optimize")
    return {c: (int(p[f"{c}__lo"].min()), int(p[f"{c}__hi"].max()))
            for c in cols}


def zorder_sort(ds: "ray.data.Dataset", col_x: str, col_y: str,
                keep_key: bool = False) -> "ray.data.Dataset":
    """Cluster ``ds`` along the 2-D Morton curve of (``col_x``,
    ``col_y``): stats pass → per-batch z-key → range-shuffle sort →
    (optionally) drop the key column.  An empty dataset is returned
    unchanged (nothing to lay out)."""
    if "_zkey" in ds.schema().names:
        raise ValueError("zorder_sort: input already has a '_zkey' column "
                         "— rename it first (the sort key would overwrite it)")
    try:
        mm = column_minmax(ds, [col_x, col_y])
    except ValueError:
        return ds  # empty input: no layout to compute
    (x_lo, x_hi), (y_lo, y_hi) = mm[col_x], mm[col_y]

    def addkey(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["_zkey"] = zo.morton_key2(b[col_x].to_numpy(), x_lo, x_hi,
                                    b[col_y].to_numpy(), y_lo, y_hi)
        return b

    s = ds.map_batches(addkey, batch_format="pandas").sort("_zkey")
    if keep_key:
        return s
    return s.map_batches(lambda b: b.drop(columns=["_zkey"]),
                         batch_format="pandas")
