"""Deterministic synthetic pre-tokenized sequence table (FIXTURES.md F1).

Schema = BASELINE.json ``input_hint``: (doc_id:string, tokens:list<int32>,
n_tok:int32, source:string). All randomness is seeded (seed=42 default);
generation is chunked so arbitrarily large tables stream to parquet without
driver-side materialization.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = 50_257
SOURCES = ["web", "code", "books", "wiki", "news", "forums", "papers", "social"]
# parquet row-group size for the synthetic writers: slice reads in the
# encode job touch only overlapping row groups, so whole-file row groups
# force every partition to decode the full file (2x+ read amplification
# at 2 partitions/file). 512 rows ~ 430 KB ~ one token-budget fraction.
_ROW_GROUP = 512
SOURCE_WEIGHTS = [0.45, 0.15, 0.1, 0.08, 0.08, 0.07, 0.05, 0.02]

SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("tokens", pa.list_(pa.int32())),
        ("n_tok", pa.int32()),
        ("source", pa.string()),
    ]
)


def gen_batch(
    n_rows: int,
    seed: int = 42,
    start_row: int = 0,
    skew: bool = False,
    nulls: bool = False,
) -> pa.Table:
    """One deterministic batch; ``start_row`` keys the RNG so chunked
    generation is reproducible regardless of chunking."""
    rng = np.random.default_rng((seed, start_row))
    n_tok = np.clip(
        np.round(rng.lognormal(mean=np.log(512), sigma=1.0, size=n_rows)), 1, 16_384
    ).astype(np.int64)
    if skew:
        big = rng.random(n_rows) < 0.01
        n_tok[big] = np.minimum(n_tok[big] * 100, 1_638_400)
    total = int(n_tok.sum())
    # zipf-ish over the vocab (favor small ids), occasional run continuation
    toks = (rng.pareto(1.1, size=total) * 25).astype(np.int64) % VOCAB
    rep = rng.random(total) < 0.15
    starts = np.concatenate([np.zeros(1, dtype=np.int64), np.cumsum(n_tok)[:-1]])
    rep[starts] = False  # never continue a run across docs
    idx = np.arange(total, dtype=np.int64)
    idx[rep] = 0
    np.maximum.accumulate(idx, out=idx)
    toks = toks[idx].astype(np.int32)

    doc_id = pa.array([f"doc-{start_row + i:012d}" for i in range(n_rows)], pa.string())
    source = pa.array(
        np.asarray(SOURCES)[rng.choice(len(SOURCES), size=n_rows, p=SOURCE_WEIGHTS)], pa.string()
    )
    offsets = np.concatenate([np.zeros(1, dtype=np.int64), np.cumsum(n_tok)]).astype(np.int32)
    tokens = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), pa.array(toks, pa.int32()))
    n_tok_arr = pa.array(n_tok.astype(np.int32), pa.int32())
    if nulls:
        null_mask = rng.random(n_rows) < 0.02
        empty_mask = (~null_mask) & (rng.random(n_rows) < 0.03)
        new_lens = n_tok.copy()
        new_lens[null_mask | empty_mask] = 0
        keep = _keep_indices(n_tok, new_lens)
        toks2 = toks[keep]
        offs2 = np.concatenate([np.zeros(1, dtype=np.int64), np.cumsum(new_lens)]).astype(np.int32)
        tokens = pa.ListArray.from_arrays(
            pa.array(offs2, pa.int32()), pa.array(toks2, pa.int32()), mask=pa.array(null_mask)
        )
        n_tok_arr = pa.array(np.where(null_mask, -1, new_lens).astype(np.int32), pa.int32())
    return pa.table(
        {"doc_id": doc_id, "tokens": tokens, "n_tok": n_tok_arr, "source": source},
        schema=SCHEMA,
    )


def _keep_indices(old_lens: np.ndarray, new_lens: np.ndarray) -> np.ndarray:
    starts = np.concatenate([np.zeros(1, dtype=np.int64), np.cumsum(old_lens)[:-1]])
    total = int(new_lens.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    offs = np.concatenate([np.zeros(1, dtype=np.int64), np.cumsum(new_lens)[:-1]])
    return np.repeat(starts - offs, new_lens) + np.arange(total, dtype=np.int64)


def write_dataset(
    out_dir: str,
    n_rows: int,
    seed: int = 42,
    n_files: int = 16,
    skew: bool = False,
    nulls: bool = False,
) -> list[str]:
    """Write the synthetic table as ``n_files`` parquet files (so a Ray read
    parallelizes); deterministic in (n_rows, seed, n_files). Returns paths."""
    os.makedirs(out_dir, exist_ok=True)
    per = (n_rows + n_files - 1) // n_files
    paths = []
    row = 0
    for i in range(n_files):
        rows = min(per, n_rows - row)
        if rows <= 0:
            break
        path = os.path.join(out_dir, f"part-{i:05d}.parquet")
        tbl = gen_batch(rows, seed=seed, start_row=row, skew=skew, nulls=nulls)
        pq.write_table(tbl, path, row_group_size=_ROW_GROUP)
        paths.append(path)
        row += rows
    return paths


def cached_dataset(n_rows: int, seed: int = 42, n_files: int = 16, skew=False, nulls=False) -> str:
    """Generate-once cache under /tmp keyed by parameters (incl. the
    row-group size — caches written before the sized-row-group change
    must not be reused: one whole-file row group makes every encode-job
    slice read decode the full file)."""
    tag = (f"f1_r{n_rows}_s{seed}_f{n_files}_g{_ROW_GROUP}"
           f"{'_skew' if skew else ''}{'_null' if nulls else ''}")
    out_dir = os.path.join("/tmp", "phr_synth", tag)
    done = os.path.join(out_dir, "_DONE")
    if not os.path.exists(done):
        write_dataset(out_dir, n_rows, seed=seed, n_files=n_files, skew=skew, nulls=nulls)
        with open(done, "w") as f:
            f.write("ok")
    return out_dir


def write_dataset_ray(out_dir: str, n_rows: int, seed: int = 42, n_files: int = 32) -> str:
    """Parallel deterministic generation via Ray tasks (one file per task;
    gen_batch is keyed by start_row so chunking does not change content)."""
    import ray

    os.makedirs(out_dir, exist_ok=True)
    per = (n_rows + n_files - 1) // n_files

    @ray.remote(num_cpus=1)
    def _write(i: int, row: int, rows: int) -> str:
        path = os.path.join(out_dir, f"part-{i:05d}.parquet")
        pq.write_table(gen_batch(rows, seed=seed, start_row=row), path,
                       row_group_size=_ROW_GROUP)
        return path

    refs = []
    row = 0
    for i in range(n_files):
        rows = min(per, n_rows - row)
        if rows <= 0:
            break
        refs.append(_write.remote(i, row, rows))
        row += rows
    ray.get(refs)
    return out_dir


def cached_dataset_ray(n_rows: int, seed: int = 42, n_files: int = 32) -> str:
    tag = f"f1_r{n_rows}_s{seed}_f{n_files}_g{_ROW_GROUP}"
    out_dir = os.path.join("/tmp", "phr_synth", tag)
    done = os.path.join(out_dir, "_DONE")
    if not os.path.exists(done):
        write_dataset_ray(out_dir, n_rows, seed=seed, n_files=n_files)
        with open(done, "w") as f:
            f.write("ok")
    return out_dir
