"""Streaming-shaped operators over the events log.

The reference has no streaming semantics (SURVEY.md §2.5: its "streaming"
is single-pass bounded-file conduit); these are the windowed/sessionized
aggregates a log-shaped training-data pipeline needs, expressed the Ray
Data way (ray_guide: treat the input as an ordered partitioned log; windows
via partial-agg + groupby, sessions via ``groupby(key).map_groups`` over
ts-sorted groups).

Ordering assumption: sessionization sorts each user's events by ``ts``
inside its group (no global sort); tumbling windows need no ordering at
all (the window id is a pure function of ts).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

_HOUR_US = 3_600_000_000


def _ts_us(series: pd.Series) -> np.ndarray:
    """Epoch microseconds regardless of the column's datetime unit (a
    timestamp[ns] input would otherwise be interpreted 1000x off)."""
    if pd.api.types.is_datetime64_any_dtype(series):
        return series.astype("datetime64[us]").astype("int64").to_numpy()
    return series.astype("int64").to_numpy()


def tumbling_window(events: "ray.data.Dataset", window_us: int = _HOUR_US) -> "ray.data.Dataset":
    """Per (user_id, tumbling window): event count and value sum.

    Partial-aggregation pattern: one partial row per (user, window) per
    batch, then a small groupby over partials — the shuffle carries
    aggregates, not events."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        win = _ts_us(batch["ts"]) // window_us
        g = pd.DataFrame(
            {"user_id": batch["user_id"], "win": win, "value": batch["value"]}
        ).groupby(["user_id", "win"], sort=False)
        out = g.agg(n_events=("value", "size"), sum_value=("value", "sum"))
        return out.reset_index()

    partials = events.map_batches(partial, batch_format="pandas")
    from ray.data.aggregate import Sum

    agg = partials.groupby(["user_id", "win"]).aggregate(
        Sum("n_events", alias_name="n_events"),
        Sum("sum_value", alias_name="sum_value"),
    )

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        batch["n_events"] = batch["n_events"].astype(np.int64)
        batch["sum_value"] = batch["sum_value"].round(6)
        return batch

    return agg.map_batches(finish, batch_format="pandas")


def sessionize(events: "ray.data.Dataset", gap_us: int = 30 * 60 * 1_000_000) -> "ray.data.Dataset":
    """Per user: number of sessions (a session breaks when the gap between
    consecutive events exceeds ``gap_us``) and total events.

    ``groupby(user).map_groups`` with a ts-sort inside each group — the
    canonical Ray Data sessionization shape for an unordered log."""

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        ts = np.sort(_ts_us(g["ts"]))
        breaks = int(np.count_nonzero(np.diff(ts) > gap_us)) if len(ts) > 1 else 0
        return pd.DataFrame(
            {"user_id": [g["user_id"].iloc[0]], "n_sessions": [breaks + 1],
             "n_events": [len(ts)]}
        )

    return events.groupby("user_id").map_groups(per_user, batch_format="pandas")
