"""Hash-bucketed storage layout and the zero-shuffle bucketed join.

At 100 TB the single most expensive thing a pipeline does is re-shuffle
a fact table for every join.  The classic fix (Hive/Spark bucketing,
public knowledge) is to pay ONE shuffle at write time: partition both
tables into the same ``n_buckets`` by the same key hash, then every
future equi-join on that key is per-bucket local — task ``i`` reads
bucket ``i`` of each side and joins in memory, no exchange at all.

``bucket_write`` lays a Dataset out as hive-partitioned parquet
(``_bucket=<i>/``) using the engine's splitmix64 hash (the same public
finalizer as the dedup sketches, so bucket routing is replayable
anywhere).  ``bucketed_join`` maps over bucket ids — one task per
bucket, each reading only its two bucket directories (column-pruned)
and merging vectorized.  Joint-key co-location is asserted, not
assumed: both reads recompute the bucket of every row and raise on a
mismatch rather than silently under-joining.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
import ray.data

from ..functions.sketches import _splitmix64


def bucket_of(keys: np.ndarray, n_buckets: int) -> np.ndarray:
    """Stable bucket id per key: integer keys run splitmix64 over the
    value; string keys hash their utf-8 bytes through the same public
    finalizer (``sketches.word_hashes``).  Float keys are rejected —
    equality-joining on floats is a bug, and truncation would silently
    co-bucket distinct keys."""
    arr = np.asarray(keys)
    if arr.dtype.kind in ("U", "S", "O"):
        from ..functions.sketches import word_hashes

        h = word_hashes(arr.astype(str))
    elif arr.dtype.kind in ("i", "u"):
        h = _splitmix64(arr.astype(np.uint64))
    else:
        raise TypeError(f"bucket_of: unsupported key dtype {arr.dtype} — "
                        "use integer or string join keys")
    return (h % np.uint64(n_buckets)).astype(np.int64)


def bucket_write(ds: "ray.data.Dataset", dest: str, key: str,
                 n_buckets: int = 32,
                 columns: Sequence[str] | None = None) -> str:
    """Write ``ds`` as hive-partitioned parquet bucketed by
    ``splitmix64(key) % n_buckets`` — the one shuffle paid up front."""
    cols = list(columns) if columns is not None else None

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        b = b if cols is None else b[cols]
        b = b.copy()
        b["_bucket"] = bucket_of(b[key].to_numpy(), n_buckets)
        return b

    ds.map_batches(tag, batch_format="pandas").write_parquet(
        dest, partition_cols=["_bucket"])
    return dest


def bucketed_join(dir_a: str, dir_b: str, key_a: str, key_b: str,
                  n_buckets: int = 32,
                  concurrency: int | None = None) -> "ray.data.Dataset":
    """Zero-shuffle equi-join of two bucket-co-located parquet layouts:
    one task per bucket, each reads exactly its two bucket directories
    and merges locally.  Raises if a row's recomputed bucket disagrees
    with the directory it was read from (layout drift guard)."""
    import pyarrow.parquet as pq

    items = [{"bucket": i} for i in range(n_buckets)]

    def join_bucket(batch: dict) -> pd.DataFrame:
        outs = []
        for i in batch["bucket"]:
            i = int(i)
            sides = []
            for d, k in ((dir_a, key_a), (dir_b, key_b)):
                try:
                    t = pq.read_table(f"{d}/_bucket={i}").to_pandas()
                except FileNotFoundError:
                    t = None
                if t is not None and len(t):
                    got = bucket_of(t[k].to_numpy(), n_buckets)
                    if not (got == i).all():
                        raise ValueError(
                            f"bucket layout drift in {d}/_bucket={i}: "
                            f"rows hash to other buckets — re-run bucket_write")
                sides.append(t)
            a, b = sides
            if a is None or b is None or not len(a) or not len(b):
                continue
            outs.append(a.merge(b, left_on=key_a, right_on=key_b,
                                how="inner"))
        if not outs:
            # schema-preserving empty result (Ray drops the schema of
            # zero-column blocks): 0-row merge of the two side schemas
            import glob as _glob
            empt = []
            for d in (dir_a, dir_b):
                f = sorted(_glob.glob(f"{d}/_bucket=*/*.parquet"))
                if not f:
                    return pd.DataFrame()
                # footer-only read: the schema, never the data
                empt.append(pq.read_schema(f[0]).empty_table().to_pandas())
            return empt[0].merge(empt[1], left_on=key_a, right_on=key_b,
                                 how="inner")
        return pd.concat(outs, ignore_index=True)

    return ray.data.from_items(items).map_batches(
        join_bucket, batch_format="pandas", batch_size=1,
        concurrency=concurrency)
