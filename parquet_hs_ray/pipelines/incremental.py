"""Incremental (micro-batch) windowed aggregation with persisted state
and watermark semantics — the streaming-shaped operator family the batch
windows in ``pipelines/windows.py`` don't cover.

A training-data pipeline rarely sees its event log once: new files land
hourly and the job re-runs.  ``incremental_tumbling`` processes ONLY the
new increment, merges per-(key, window) partials with a small persisted
state of still-open windows, and emits exactly the windows the advancing
watermark has closed:

- state = one parquet of open-window partials (rows are (key, win,
  n_events, sum_c) — integer cents, so merge order can never drift the
  result) + ``meta.json`` holding the watermark, both on any
  ``pyarrow.fs`` via ``state/fsio`` (the same shared-storage contract as
  the encode manifest);
- watermark = max event time seen minus ``allowed_lateness_us``; a
  window [w*W, (w+1)*W) is CLOSED (emitted, removed from state) once
  its end <= watermark — late events inside the lateness budget still
  merge into their open window;
- events older than the CURRENT watermark (their window already closed)
  are dropped and COUNTED (``info['n_late_dropped']``) — the standard
  watermark contract, never a silent loss;
- state writes are atomic (temp+rename) and versioned; ``meta.json`` is
  the commit point, so a crash mid-increment leaves the previous state
  intact and the increment re-runs idempotently.

Scale shape: the increment aggregates through the same bounded
partial-shuffle as the batch windows (one row per (key, win) per block);
the state only ever holds OPEN windows — bounded by key-cardinality x
(lateness / window), independent of history length.
"""

from __future__ import annotations

import io
import json

import numpy as np
import pandas as pd
import ray.data

_STATE_COLS = ["user_id", "win", "n_events", "sum_c"]


def _read_state(state_dir: str, filesystem=None) -> tuple[pd.DataFrame, int, int]:
    from ..state import fsio

    meta_path = fsio.join(state_dir, "meta.json")
    if not fsio.exists(meta_path, filesystem):
        empty = pd.DataFrame({c: pd.Series([], dtype=np.int64)
                              for c in _STATE_COLS})
        return empty, -(1 << 62), 0
    meta = json.loads(fsio.read_bytes(meta_path, filesystem))
    import pyarrow.parquet as pq

    buf = fsio.read_bytes(fsio.join(state_dir, meta["state_file"]), filesystem)
    st = pq.read_table(io.BytesIO(buf)).to_pandas()
    return st, int(meta["watermark"]), int(meta["version"])


def _write_state(state_dir: str, st: pd.DataFrame, watermark: int,
                 version: int, filesystem=None) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..state import fsio

    fsio.mkdirs(state_dir, filesystem)
    fname = f"state-{version:08d}.parquet"
    buf = io.BytesIO()
    pq.write_table(pa.Table.from_pandas(st, preserve_index=False), buf)
    fsio.write_atomic(fsio.join(state_dir, fname), buf.getvalue(), filesystem)
    # meta.json last: the commit point
    fsio.write_atomic(fsio.join(state_dir, "meta.json"),
                      json.dumps({"watermark": int(watermark),
                                  "version": int(version),
                                  "state_file": fname}).encode(), filesystem)


def incremental_tumbling(new_events: "ray.data.Dataset", state_dir: str,
                         window_us: int = 3_600_000_000,
                         allowed_lateness_us: int = 0,
                         filesystem=None) -> tuple[pd.DataFrame, dict]:
    """Process one increment; returns ``(emitted, info)`` where
    ``emitted`` holds every (user_id, win, n_events, sum_c) window CLOSED
    by this increment's watermark advance (win sorted, deterministic) and
    ``info`` carries the new watermark, open-window count and the
    late-drop counter."""
    state, watermark, version = _read_state(state_dir, filesystem)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        from .windows import _ts_us

        ts = _ts_us(batch["ts"])
        v = batch["value"].to_numpy(dtype=np.float64)
        ok = ~np.isnan(v)
        cents = np.where(ok, np.round(np.where(ok, v, 0.0) * 100.0), 0.0)
        win = ts // window_us
        g = pd.DataFrame({"user_id": batch["user_id"].to_numpy(),
                          "win": win,
                          "n_events": np.int64(1),
                          "sum_c": cents.astype(np.int64),
                          # late = the event's WINDOW is already closed
                          # (not merely ts < watermark: inside the
                          # lateness budget an old ts can still target an
                          # open window)
                          "late": ((win + 1) * window_us <= watermark)
                          .astype(np.int64),
                          "max_ts": ts})
        # late events (window already closed) are counted then excluded
        agg = (g[g["late"] == 0]
               .groupby(["user_id", "win"], sort=False, as_index=False)
               [["n_events", "sum_c"]].sum())
        agg["n_late"] = np.int64(0)
        agg["max_ts"] = np.int64(0)
        tail = pd.DataFrame({"user_id": [np.int64(-1)],
                             "win": [np.int64(np.iinfo(np.int64).min)],
                             "n_events": [np.int64(0)], "sum_c": [np.int64(0)],
                             "n_late": [int(g["late"].sum())],
                             "max_ts": [int(g["max_ts"].max()) if len(g) else 0]})
        return pd.concat([agg, tail], ignore_index=True)

    # merge the partials on the driver: one row per (key, win) per block
    # plus one sentinel per block (late count + block max_ts, which needs
    # a MAX merge grouped_sum can't express) — bounded by keys x windows
    # x blocks, never event rows
    frames = [b for b in new_events.map_batches(partial, batch_format="pandas")
              .iter_batches(batch_format="pandas")]
    allp = (pd.concat(frames, ignore_index=True) if frames
            else pd.DataFrame(columns=["user_id", "win", "n_events", "sum_c",
                                       "n_late", "max_ts"]))
    _SENT = np.iinfo(np.int64).min  # impossible real window index
    sent = allp[allp["win"] == _SENT]
    body = allp[allp["win"] != _SENT]
    n_late = int(sent["n_late"].sum()) if len(sent) else 0
    max_ts = int(sent["max_ts"].max()) if len(sent) else watermark

    inc = (body.groupby(["user_id", "win"], sort=False, as_index=False)
           [["n_events", "sum_c"]].sum()) if len(body) else \
        pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in _STATE_COLS})

    merged = (pd.concat([state[_STATE_COLS], inc[_STATE_COLS]],
                        ignore_index=True)
              .groupby(["user_id", "win"], sort=False, as_index=False)
              [["n_events", "sum_c"]].sum())

    new_watermark = max(watermark, max_ts - allowed_lateness_us)
    closed = (merged["win"] + 1) * window_us <= new_watermark
    emitted = (merged[closed].sort_values(["win", "user_id"])
               .reset_index(drop=True).astype({c: np.int64 for c in _STATE_COLS}))
    remaining = merged[~closed].reset_index(drop=True)

    _write_state(state_dir, remaining[_STATE_COLS], new_watermark,
                 version + 1, filesystem)
    info = {"watermark": int(new_watermark), "n_late_dropped": n_late,
            "open_windows": int(len(remaining)), "version": version + 1,
            "emitted_windows": int(len(emitted))}
    return emitted, info


def incremental_flush(state_dir: str, filesystem=None) -> pd.DataFrame:
    """Close and emit every remaining open window (end-of-stream); state
    becomes empty but keeps its watermark."""
    state, watermark, version = _read_state(state_dir, filesystem)
    out = (state[_STATE_COLS].sort_values(["win", "user_id"])
           .reset_index(drop=True).astype({c: np.int64 for c in _STATE_COLS})
           if len(state) else
           pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in _STATE_COLS}))
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in _STATE_COLS})
    _write_state(state_dir, empty, watermark, version + 1, filesystem)
    return out
