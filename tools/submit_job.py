"""Cluster job entrypoint for ``ray job submit``.

On a real multi-node cluster:

    ray job submit --working-dir /path/to/repo -- \
        python tools/submit_job.py encode \
        --input s3://bucket/tokenized/ --out s3://bucket/encoded/run1 \
        --token-budget 4000000

    ray job submit --working-dir /path/to/repo -- \
        python tools/submit_job.py verify --input s3://bucket/tokenized/ \
        --out s3://bucket/encoded/run1

Differences from the local CLI (`parquet_hs_ray.cli`):

- connects to the SUBMITTING cluster (``ray.init(address="auto")``) instead
  of starting a local session — the job runs at whatever size the cluster
  is, which is how the N-vs-4N scaling criterion is exercised for real
  (same job, two cluster sizes, compare tokens/sec from the summary).
- ``--out`` (and ``--input``) must be shared storage reachable from every
  node — any ``pyarrow.fs`` URI works (s3://, gcs://, hdfs://, a mounted
  file://); the state layer (`parquet_hs_ray/state/fsio.py`) handles it.
- re-submitting the same job resumes: finished partitions are skipped via
  the manifest (kill the job at any point; nothing is lost).

In this sandbox there is no multi-node cluster or dashboard, so the
submission path itself cannot be driven end-to-end; the entrypoint is
exercised directly (it is a thin wrapper over the tested job API).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# `ray job submit --working-dir` lands this file at <working_dir>/tools/;
# make the repo root importable regardless of cwd
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    enc = sub.add_parser("encode")
    enc.add_argument("--input", required=True)
    enc.add_argument("--out", required=True)
    enc.add_argument("--token-col", default="n_tok")
    enc.add_argument("--token-budget", type=int, default=4_000_000)
    enc.add_argument("--no-resume", action="store_true")
    ver = sub.add_parser("verify")
    ver.add_argument("--input", required=True)
    ver.add_argument("--out", required=True)
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        # inside `ray job submit` the address env is set by the runtime and
        # --working-dir ships the package to every node; for dev runs
        # outside a job, put the repo root on the workers' PYTHONPATH
        repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        ray.init(address=os.environ.get("RAY_ADDRESS", "auto"),
                 ignore_reinit_error=True,
                 runtime_env={"env_vars": {"PYTHONPATH": repo_root}})

    from parquet_hs_ray.pipelines.encode_job import encode_dataset, verify_roundtrip

    t0 = time.perf_counter()
    if args.cmd == "encode":
        res = encode_dataset(args.input, args.out, token_col=args.token_col or None,
                             token_budget=args.token_budget, resume=not args.no_resume)
        res["wall_s"] = round(time.perf_counter() - t0, 2)
        if res.get("tokens") and res["wall_s"]:
            res["tokens_per_sec"] = round(res["tokens"] / res["wall_s"])
    else:
        res = verify_roundtrip(args.input, args.out)
        res["wall_s"] = round(time.perf_counter() - t0, 2)
    print(json.dumps(res))
    return 0


if __name__ == "__main__":
    sys.exit(main())
