"""Materialize a deterministic sf1 (10x sf0.1) dataset under /tmp for the
scale-sample bench (VERDICT r3 #9): surface O(n^2) / driver-merge constants
the sf0.1 suite hides.  No external data — every table is derived from the
driver's sf0.1 parquet with seeded, reproducible transforms:

- lineitem:   10 replicas, l_orderkey offset per replica (keeps key
              cardinality scaling like real TPC-H growth; value/date
              distributions identical).
- documents:  replica 0 verbatim (preserves the ~0.16% exact-dup rate);
              replicas 1-9 word-shuffle each text with a per-doc seeded
              RNG — same length / vocab / shingle-universe, but not exact
              or trivial near duplicates, so dedup_minhash measures 10x
              corpus growth rather than a synthetic 10-way dup explosion.
- embeddings: 10 replicas, vec_id offset, seeded N(0, 0.01) perturbation
              on replicas 1-9 (avoids degenerate cosine ties).

Usage: python tools/make_sf1.py [out_dir]   (default /tmp/phr_sf1)
Idempotent: skips tables whose output already exists.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
REPLICAS = 10


def _done(path: str) -> bool:
    return os.path.exists(path)


def _write(parts: list[pa.Table], out: str) -> None:
    # strip pandas schema metadata: Ray's schema dedup warns on the dict,
    # and stale pandas metadata has poisoned join key resolution before
    pq.write_table(pa.concat_tables(parts).replace_schema_metadata(None), out)


def make_lineitem(out: str) -> None:
    t = pq.read_table(f"{SRC}/lineitem.parquet")
    max_ok = pc.max(t["l_orderkey"]).as_py() + 1
    parts = []
    for r in range(REPLICAS):
        tr = t
        if r:
            tr = tr.set_column(
                tr.schema.get_field_index("l_orderkey"), "l_orderkey",
                pc.add(tr["l_orderkey"], r * max_ok))
        parts.append(tr)
    _write(parts, out)


def make_documents(out: str) -> None:
    t = pq.read_table(f"{SRC}/documents.parquet")
    n = len(t)
    texts = t["text"].to_pylist()
    parts = [t]
    for r in range(1, REPLICAS):
        shuffled = []
        for i, txt in enumerate(texts):
            if txt is None:
                shuffled.append(None)
                continue
            words = txt.split(" ")
            rng = np.random.default_rng((r << 32) | i)
            rng.shuffle(words)
            shuffled.append(" ".join(words))
        parts.append(pa.table({
            "doc_id": pc.add(t["doc_id"], r * n),
            "text": pa.array(shuffled, pa.string()),
            "lang": t["lang"],
            "source": t["source"],
            "n_chars": pa.array([len(s) if s is not None else 0
                                 for s in shuffled], pa.int64()),
        }))
    _write(parts, out)


def make_embeddings(out: str) -> None:
    t = pq.read_table(f"{SRC}/embeddings.parquet").combine_chunks()
    n = len(t)
    col = t["embedding"].chunk(0)
    flat = col.values.to_numpy(zero_copy_only=False).astype(np.float32)
    offsets = col.offsets
    parts = [t]
    for r in range(1, REPLICAS):
        rng = np.random.default_rng(9000 + r)
        pert = (flat + rng.normal(0, 0.01, flat.shape)).astype(np.float32)
        emb = pa.ListArray.from_arrays(offsets, pa.array(pert, pa.float32()))
        parts.append(pa.table({
            "vec_id": pc.add(t["vec_id"], r * n),
            "embedding": emb.cast(t.schema.field("embedding").type),
            "label": t["label"],
        }))
    _write(parts, out)


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/phr_sf1"
    os.makedirs(out_dir, exist_ok=True)
    for name, fn in (("lineitem", make_lineitem),
                     ("documents", make_documents),
                     ("embeddings", make_embeddings)):
        path = os.path.join(out_dir, f"{name}.parquet")
        if _done(path):
            print(f"skip {name} (exists)")
            continue
        fn(path)
        print(f"wrote {path} ({os.path.getsize(path)} bytes)")


if __name__ == "__main__":
    main()
