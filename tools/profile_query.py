"""Per-stage profiler for any __ray_entry__ query: runs it, then prints
Ray Data's execution stats (per-operator wall time, block counts, task
counts) so a slow pipeline can be attributed to a STAGE rather than
guessed at — the `ds.stats()` feedback loop.

Usage: python tools/profile_query.py <query> [sf_dir]
Driver-frame results (pandas/pyarrow) have no Ray stats; the tool still
reports wall time and row count for them.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", 8)),
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")
    import __ray_entry__ as entry

    qs = entry.queries()
    if name not in qs:
        print(f"unknown query {name!r}; known: {sorted(qs)}")
        return 2
    t0 = time.perf_counter()
    res = qs[name](sf_dir)
    import ray.data

    if isinstance(res, ray.data.Dataset):
        res = res.materialize()
        wall = time.perf_counter() - t0
        print(f"query={name} wall={wall:.2f}s rows={res.count()}")
        print(res.stats())
    else:
        wall = time.perf_counter() - t0
        n = len(res) if hasattr(res, "__len__") else "?"
        print(f"query={name} wall={wall:.2f}s rows={n} "
              "(driver-frame result; no Ray stage stats)")
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
