"""Driver-style correctness sweep: run every queries() entry and its
oracle_sql() twin at a given sf dir, compare rows / schema (sorted column
names) / values (sorted columns, sorted rows, per-cell canonicalization),
print one JSON line per query. A local stand-in for the driver's
CORRECTNESS gate so regressions surface before round end.

Usage: python tools/correctness_sweep.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def _to_pandas(res):
    import pandas as pd
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def _canon(df):
    """Sorted-columns, sorted-rows, stringified frame for hashing."""
    import numpy as np

    df = df[sorted(df.columns)].copy()

    def cell(v):
        if isinstance(v, (list, tuple, np.ndarray)):
            return "[" + ",".join(cell(x) for x in v) + "]"
        if isinstance(v, float):
            return format(v, ".12g")
        if isinstance(v, bytes):
            return v.hex()
        return str(v)

    rows = ["\x1f".join(cell(v) for v in rec) for rec in df.itertuples(index=False, name=None)]
    rows.sort()
    return hashlib.md5("\n".join(rows).encode()).hexdigest(), len(rows)


def main() -> None:
    import duckdb
    import ray

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "16")),
                 include_dashboard=False, logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entry

    qs, oracles = entry.queries(), entry.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

    n_bad = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        rec = {"q": name}
        try:
            df = _to_pandas(fn(sf))
            rec["rows"] = len(df)
            if name in oracles:
                ref = con.execute(oracles[name]).df()
                rec["oracle_rows"] = len(ref)
                rec["rows_match"] = len(df) == len(ref)
                rec["schema_match"] = sorted(df.columns) == sorted(ref.columns)
                if rec["schema_match"]:
                    h1, _ = _canon(df)
                    h2, _ = _canon(ref)
                    rec["hash_match"] = h1 == h2
                else:
                    rec["hash_match"] = False
                if not (rec["rows_match"] and rec["schema_match"] and rec["hash_match"]):
                    n_bad += 1
            else:
                rec["oracle"] = "none"
        except Exception as exc:  # noqa: BLE001 — sweep must report, not die
            rec["err"] = f"{type(exc).__name__}: {exc}"[:300]
            n_bad += 1
        print(json.dumps(rec), flush=True)
    print(json.dumps({"sweep": "done", "failures": n_bad}))
    ray.shutdown()
    if n_bad:
        sys.exit(1)


if __name__ == "__main__":
    main()
