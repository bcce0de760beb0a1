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


def incremental_dedup(new_docs: "ray.data.Dataset", state_dir: str,
                      text_col: str = "text", id_col: str = "doc_id",
                      n_buckets: int = 64, filesystem=None
                      ) -> tuple["ray.data.Dataset", dict]:
    """Micro-batch EXACT dedup against all history: keep each new doc
    whose content hash has never been seen (earlier increments or earlier
    in this one — within an increment the smallest ``id_col`` wins, the
    same canonical rule as ``dedup.dedup_assign``), and persist the new
    hashes.

    State = md5 hashes hash-partitioned into ``n_buckets`` parquet
    files, each rewritten atomically when its bucket gains hashes — the
    seen-set never loads whole; an increment touches only the buckets its
    own hashes map to, and per-bucket work (sorted-array membership +
    merge) is one ``groupby("bucket").map_groups`` group running in the
    cluster — the increment's (id, hash) rows shuffle straight to their
    bucket's worker, and only SURVIVOR ids return to the driver (the old
    shape concatenated every doc's hash row on the driver first).  At 100 TB a bucket row is hash + keeper id
    (16 B + the id rendered as a string, ~24-36 B/distinct doc) and
    ``n_buckets`` scales the rewrite granularity.

    Returns ``(survivors_dataset, info)``; crash-safety is per bucket,
    and re-running the same increment is EXACTLY idempotent: each bucket
    row stores the KEEPER's id alongside the hash, so a doc whose hash
    was persisted by a crashed run of this same increment re-claims it
    (``keeper_id == its own id`` — the within-increment winner is
    deterministic, smallest id) and is emitted again, while true
    duplicates from earlier increments still drop.  Without the keeper
    id a crash after the bucket write but before the caller consumed the
    survivors would silently lose those docs on re-run — the r4 kill -9
    drive (tests/test_incremental_kill.py) checks exactly this.

    PRECONDITION: ``id_col`` must be globally unique ACROSS increments
    (a re-used id whose content matches a persisted keeper would be
    re-emitted as that keeper instead of dropped).  Ids are matched by
    their ``str()`` rendering, so any orderable id dtype works."""
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    from ..state import fsio

    fsio.mkdirs(state_dir, filesystem)

    def hashed(batch: pd.DataFrame) -> pd.DataFrame:
        h = [hashlib.md5(t.encode()).digest() if isinstance(t, str) else b""
             for t in batch[text_col]]
        return pd.DataFrame({id_col: batch[id_col].to_numpy(),
                             "h": h,
                             "bucket": np.frombuffer(
                                 b"".join(x[:1] or b"\0" for x in h),
                                 dtype=np.uint8) % n_buckets})

    def merge_group(sub: pd.DataFrame) -> pd.DataFrame:
        # one call per bucket (map_groups delivers whole groups), running
        # IN the cluster — the increment's (id, hash) rows shuffle to
        # their bucket's worker instead of concatenating on the driver.
        # Read-modify-write under the per-bucket flock: within one job
        # each bucket is exactly one group, but two CONCURRENT increments
        # against the same state_dir would otherwise both read the old
        # file and the last rename would drop the other's hashes (on
        # non-local fs the lock is a no-op — there the caller must run
        # increments against a state_dir one at a time)
        bucket_id = int(sub["bucket"].iloc[0])
        with fsio.file_lock(fsio.join(state_dir, f"bucket-{bucket_id:04d}"),
                            filesystem):
            keep_ids = _bucket_merge(bucket_id, sub)
        if len(keep_ids) == 0:
            # sentinel so buckets_touched still counts all-duplicate
            # buckets (kept=False rows are dropped before the filter)
            return pd.DataFrame({id_col: sub[id_col].iloc[:1],
                                 "bucket": np.int64(bucket_id),
                                 "kept": False})
        return pd.DataFrame({id_col: keep_ids,
                             "bucket": np.full(len(keep_ids), bucket_id),
                             "kept": True})

    def _bucket_merge(bucket_id: int, sub: pd.DataFrame):
        path = fsio.join(state_dir, f"bucket-{bucket_id:04d}.parquet")
        if fsio.exists(path, filesystem):
            t = pq.read_table(io.BytesIO(fsio.read_bytes(path, filesystem)))
            seen = t.column("h").to_pylist()
            # keeper ids persist as strings (any id dtype); legacy files
            # without the column get None — matches no real id, so they
            # keep the old always-drop semantics
            kids = (t.column("kid").to_pylist() if "kid" in t.column_names
                    else [None] * len(seen))
            seen_map = dict(zip(seen, kids))
        else:
            seen, kids, seen_map = [], [], {}
        # canonical within-increment order: smallest id wins its hash
        sub = sub.sort_values(id_col, kind="mergesort")
        first = ~sub.duplicated("h", keep="first").to_numpy()
        ids_np = sub[id_col].to_numpy()
        ids_str = sub[id_col].astype(str).to_numpy()
        # fresh, OR persisted by a crashed run of this very increment
        # (keeper id == this doc's id): exactly-once re-emit on re-run
        persisted_kid = sub["h"].map(seen_map)  # NaN if hash unseen
        unseen = ~sub["h"].isin(seen_map.keys()).to_numpy()
        fresh = unseen | (persisted_kid.to_numpy() == ids_str)
        keep_mask = first & fresh
        keep_ids = ids_np[keep_mask]
        new_mask = keep_mask & unseen
        if new_mask.any():
            buf = io.BytesIO()
            pq.write_table(pa.table({
                "h": pa.array(
                    seen + sub["h"].to_numpy()[new_mask].tolist(),
                    pa.binary()),
                "kid": pa.array(kids + ids_str[new_mask].tolist(),
                                pa.string()),
            }), buf)
            fsio.write_atomic(path, buf.getvalue(), filesystem)
        return keep_ids

    n_in = int(new_docs.count())
    if n_in:
        kept_df = (new_docs.map_batches(hashed, batch_format="pandas")
                   .groupby("bucket")
                   .map_groups(merge_group, batch_format="pandas")
                   .to_pandas())  # survivor ids (+ per-bucket sentinels)
    else:
        kept_df = pd.DataFrame({id_col: [], "bucket": [], "kept": []})
    n_buckets_touched = int(kept_df["bucket"].nunique())
    keep = np.sort(kept_df[id_col][kept_df["kept"].astype(bool)].to_numpy())
    keep_ref = ray.put(keep)

    def filt(t: "pa.Table") -> "pa.Table":
        import pyarrow.compute as pc

        ids = ray.get(keep_ref)
        return t.filter(pc.is_in(t[id_col],
                                 value_set=pa.array(ids, t[id_col].type)))

    out = new_docs.map_batches(filt, batch_format="pyarrow")
    info = {"n_in": n_in, "n_kept": int(len(keep)),
            "buckets_touched": n_buckets_touched}
    return out, info
