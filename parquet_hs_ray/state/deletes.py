"""Per-partition deletion vectors: row-level deletes without rewrites.

A deletion vector is a sidecar file ``deletes/del-<pid>.bin`` next to a
partition's immutable blob, holding the SORTED row positions (within
that blob) that are logically deleted.  Decode applies it as a keep
mask; compaction materializes it (the compacted output carries no
vector).  Sidecars are written temp+rename like blobs, so a crashed
delete never tears an existing vector; repeated deletes MERGE by set
union (delete is monotone), so re-running a delete job is idempotent.

Semantics match SQL ``DELETE WHERE``: only rows where the predicate is
TRUE are deleted — NULL evaluations keep the row (the decode twin is
``WHERE pred IS NOT TRUE``).

This is the Delta-Lake / Iceberg "deletion vector" design re-expressed
over this store's partition layout; the reference models an immutable
read-only format with no mutation story (parquet-hs has no writer at
all, src/Parquet/Reader.hs is the whole surface), so this is one of the
mandated beyond-reference extensions.

Binary format (all little-endian):
  magic 'PHRD' | u32 version=1 | u64 count | count x u64 indices |
  u32 crc32(indices bytes)
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from . import fsio

_MAGIC = b"PHRD"
_VERSION = 1


def deletes_dir(out_dir: str) -> str:
    return fsio.join(out_dir, "deletes")


def delete_vector_path(out_dir: str, partition_id: int) -> str:
    return fsio.join(out_dir, "deletes", f"del-{partition_id:08d}.bin")


def encode_delete_vector(indices: np.ndarray) -> bytes:
    idx = np.unique(np.asarray(indices, dtype=np.uint64))
    payload = idx.astype("<u8").tobytes()
    return (_MAGIC + struct.pack("<IQ", _VERSION, len(idx)) + payload
            + struct.pack("<I", zlib.crc32(payload)))


def decode_delete_vector(data: bytes) -> np.ndarray:
    if len(data) < 20 or data[:4] != _MAGIC:
        raise ValueError("not a deletion vector (bad magic)")
    version, count = struct.unpack_from("<IQ", data, 4)
    if version != _VERSION:
        raise ValueError(f"unsupported deletion-vector version {version}")
    end = 16 + count * 8
    if len(data) != end + 4:
        raise ValueError("truncated deletion vector")
    payload = data[16:end]
    (crc,) = struct.unpack_from("<I", data, end)
    if zlib.crc32(payload) != crc:
        raise ValueError("deletion vector checksum mismatch")
    return np.frombuffer(payload, dtype="<u8").astype(np.uint64)


def read_delete_vector(out_dir: str, partition_id: int,
                       filesystem=None) -> np.ndarray | None:
    """The partition's deleted row positions (sorted uint64), or None."""
    path = delete_vector_path(out_dir, partition_id)
    if not fsio.exists(path, filesystem):
        return None
    return decode_delete_vector(fsio.read_bytes(path, filesystem))


def write_delete_vector(out_dir: str, partition_id: int, indices: np.ndarray,
                        filesystem=None) -> int:
    """MERGE ``indices`` into the partition's vector (union with any
    existing one) and write it atomically.  Returns the number of newly
    deleted positions (0 writes nothing — idempotent re-deletes are
    free).

    Concurrency: the read-union-write merge runs under a per-partition
    ``fsio.file_lock``, so two concurrent delete jobs touching the same
    partition serialize on local filesystems (neither union is lost).
    On non-local filesystems the lock is a no-op — there the job layer
    must run at most one delete job per store at a time (last rename
    would win otherwise).

    Durability: vectors are fsynced unconditionally (``durable=True``).
    Unlike blobs — whose tearing the manifest crc32 catches at decode —
    a power-crash that reverts a renamed-but-unflushed vector would
    silently resurrect acknowledged DELETEs; nothing checks for an
    ABSENT sidecar.  The write is tiny and off the encode hot path."""
    idx = np.unique(np.asarray(indices, dtype=np.uint64))
    fsio.mkdirs(deletes_dir(out_dir), filesystem)
    path = delete_vector_path(out_dir, partition_id)
    with fsio.file_lock(path, filesystem):
        existing = read_delete_vector(out_dir, partition_id, filesystem)
        if existing is not None and len(existing):
            before = len(existing)
            idx = np.union1d(existing, idx)
            new = len(idx) - before
        else:
            new = len(idx)
        if new == 0:
            return 0
        fsio.write_atomic(path, encode_delete_vector(idx), filesystem,
                          durable=True)
    return int(new)


def list_delete_pids(out_dir: str, filesystem=None) -> set[int]:
    """Partition ids that have a deletion vector — ONE directory listing,
    so a decode over a store with no deletes costs nothing per task."""
    ddir = deletes_dir(out_dir)
    if not fsio.exists(ddir, filesystem):
        return set()
    pids = set()
    for name in fsio.list_files(ddir, filesystem):
        if name.startswith("del-") and name.endswith(".bin"):
            try:
                pids.add(int(name[4:-4]))
            except ValueError:
                continue
    return pids


def keep_mask(deleted: np.ndarray, n_rows: int) -> np.ndarray:
    """Boolean keep mask of length ``n_rows`` (True = row survives)."""
    keep = np.ones(n_rows, dtype=bool)
    if len(deleted):
        d = deleted[deleted < n_rows].astype(np.int64)
        keep[d] = False
    return keep


def deletes_summary(out_dir: str, filesystem=None) -> dict:
    """{'partitions_with_deletes': n, 'rows_deleted': m} from vector
    headers only (count lives in the fixed-size header)."""
    pids = list_delete_pids(out_dir, filesystem)
    total = 0
    for pid in pids:
        data = fsio.read_bytes(delete_vector_path(out_dir, pid), filesystem)
        _, count = struct.unpack_from("<IQ", data, 4)
        total += int(count)
    return {"partitions_with_deletes": len(pids), "rows_deleted": total}
