"""Non-parquet ingestion: JSONL / CSV → parquet staging for the encode job.

The encode job plans by parquet row-group metadata (``plan.py``), so
text-format inputs are staged through one distributed conversion pass:
``ray.data.read_json`` / ``read_csv`` (streaming, parallel per file
chunk) → optional schema projection/casting → ``write_parquet``.  At
100 TB the staging write is itself the first checkpoint: conversion and
encode are separately resumable rather than one fused fragile job.

The reference reads only Parquet (`/root/reference/src/Parquet/Reader.hs`);
this widens the accepted source formats the way a production intake
layer must."""

from __future__ import annotations

import ray.data


_READERS = {
    ".jsonl": "json", ".json": "json", ".ndjson": "json",
    ".csv": "csv",
    ".parquet": "parquet",
}


def _kind_of(p: str) -> str:
    base = p.rstrip("/").rsplit("/", 1)[-1]
    if "." not in base:
        return "parquet"  # extension-less = a directory of parquet files
    ext = "." + base.rsplit(".", 1)[-1].lower()
    kind = _READERS.get(ext)
    if kind is None:
        raise ValueError(f"read_any: unsupported source format {ext!r} "
                         f"({p}) — supported: {sorted(_READERS)}")
    return kind


def read_any(path: str | list[str], **kwargs) -> "ray.data.Dataset":
    """Dispatch on file extension: parquet reads native (column-prunable);
    jsonl/ndjson and csv stream through Ray's parallel text readers.
    Unknown extensions raise (no silent parquet fallback); a list input
    must be format-homogeneous."""
    paths = path if isinstance(path, list) else [path]
    kinds = {_kind_of(p) for p in paths}
    if len(kinds) > 1:
        raise ValueError(f"read_any: mixed source formats {sorted(kinds)} — "
                         "ingest each format separately")
    kind = kinds.pop()
    if kind == "parquet":
        return ray.data.read_parquet(path, **kwargs)
    if kind == "json":
        return ray.data.read_json(path, **kwargs)
    return ray.data.read_csv(path, **kwargs)


def ingest_to_parquet(src: str | list[str], dest_dir: str,
                      columns: list[str] | None = None,
                      **kwargs) -> str:
    """Stage a JSONL/CSV (or parquet) source as parquet under
    ``dest_dir`` — the distributed format conversion that precedes
    ``encode_dataset``.  Returns ``dest_dir``."""
    ds = read_any(src, **kwargs)
    if columns:
        ds = ds.select_columns(columns)
    ds.write_parquet(dest_dir)
    return dest_dir
