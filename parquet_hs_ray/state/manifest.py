"""Per-partition lineage + metrics manifest with atomic writes and resume.

Our analogue of the reference's footer metadata
(`readMetadata`, `/root/reference/src/Parquet/Reader.hs:197-213`): the
manifest is the authoritative description of what encoded data exists.
Unlike the reference's single monolithic footer, it is one JSON file per
partition, written atomically (temp + rename) AFTER the partition's blob is
durable — so a killed job leaves only complete partitions visible and
``finished_ids`` is exactly the resume filter (north rule: "resumable from
checkpoint with per-partition lineage + metrics").

Entry fields: partition lineage (input path, row range), row/token counts,
raw vs encoded bytes, per-column codec + stats (min/max/null_count/
cardinality/run-length/entropy — the stats the reference parses but never
produces, `/root/reference/src/Parquet/Types/Primitives.hs:79-87`),
checksum, wall-clock ms.
"""

from __future__ import annotations

import json
import os
import zlib
from dataclasses import asdict


def blob_path(out_dir: str, partition_id: int) -> str:
    return os.path.join(out_dir, "blobs", f"part-{partition_id:08d}.blob")


def entry_path(out_dir: str, partition_id: int) -> str:
    return os.path.join(out_dir, "manifest", f"part-{partition_id:08d}.json")


def ensure_dirs(out_dir: str) -> None:
    os.makedirs(os.path.join(out_dir, "blobs"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "manifest"), exist_ok=True)


def write_blob_atomic(out_dir: str, partition_id: int, blob: bytes) -> str:
    """Idempotent under retries: temp file keyed by pid + rename."""
    path = blob_path(out_dir, partition_id)
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(blob)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)
    return path


def write_entry(out_dir: str, entry: dict) -> str:
    path = entry_path(out_dir, entry["partition_id"])
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(entry, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)
    return path


def make_entry(partition, blob: bytes, raw_bytes: int, n_rows: int, n_tokens: int,
               col_stats: dict, wall_ms: float) -> dict:
    return {
        "partition_id": partition.partition_id,
        "input_path": partition.path,
        "row_start": partition.row_start,
        "row_count": n_rows,
        "n_tokens": int(n_tokens),
        "raw_bytes": int(raw_bytes),
        "encoded_bytes": len(blob),
        "checksum_crc32": zlib.crc32(blob),
        "wall_ms": round(wall_ms, 2),
        "columns": {
            name: {k: v for k, v in asdict(st).items() if v is not None}
            for name, st in col_stats.items()
        },
        "status": "done",
    }


def load_manifest(out_dir: str) -> list[dict]:
    mdir = os.path.join(out_dir, "manifest")
    if not os.path.isdir(mdir):
        return []
    entries = []
    for fn in sorted(os.listdir(mdir)):
        if fn.endswith(".json"):
            try:
                with open(os.path.join(mdir, fn)) as f:
                    entries.append(json.load(f))
            except (json.JSONDecodeError, OSError):
                # torn/zero-length entry from a crash mid-write: treat the
                # partition as unfinished (it will be re-encoded) rather
                # than failing the whole resume
                continue
    return entries


def finished_ids(out_dir: str) -> set[int]:
    """Partitions whose manifest entry AND blob both exist."""
    done = set()
    for e in load_manifest(out_dir):
        if e.get("status") == "done" and os.path.exists(blob_path(out_dir, e["partition_id"])):
            done.add(e["partition_id"])
    return done


def summary(out_dir: str) -> dict:
    entries = load_manifest(out_dir)
    return {
        "partitions": len(entries),
        "rows": sum(e["row_count"] for e in entries),
        "tokens": sum(e["n_tokens"] for e in entries),
        "raw_bytes": sum(e["raw_bytes"] for e in entries),
        "encoded_bytes": sum(e["encoded_bytes"] for e in entries),
        "wall_ms_sum": round(sum(e["wall_ms"] for e in entries), 1),
    }
