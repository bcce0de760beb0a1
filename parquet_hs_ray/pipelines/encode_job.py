"""Encode / decode / verify jobs — Ray Data orchestration.

Lifecycle (SURVEY.md §3.5): plan (n_tok-pruned scan, skew-aware token
budget) -> resume-filter on manifest -> control Dataset of partitions ->
``map_batches(EncoderStage, concurrency=pool)`` actor pool -> blobs +
per-partition manifest. Decode is the inverse: manifest -> Dataset ->
``map_batches(DecoderStage)`` -> Arrow tables streaming onward.

These functions do NOT call ray.init()/shutdown() (driver contract); they
assume a session exists (Ray Data auto-inits local otherwise).
"""

from __future__ import annotations

import glob
import json
import os

import ray.data

from ..plan import DEFAULT_TOKEN_BUDGET, Partition, build_plan, load_plan, save_plan


def tables_bitwise_equal(a, b) -> bool:
    """Arrow equality that treats NaN slots with identical bit patterns as
    equal (Table.equals follows IEEE NaN != NaN, which would flag a
    bit-perfect float round-trip as a mismatch)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    a = a.combine_chunks() if isinstance(a, pa.Table) else a
    b = b.combine_chunks() if isinstance(b, pa.Table) else b
    if a.schema != b.schema or a.num_rows != b.num_rows:
        return False
    for name in a.column_names:
        ca, cb = a[name].combine_chunks(), b[name].combine_chunks()
        t = ca.type
        if pa.types.is_floating(t):
            va = pc.is_valid(ca).to_numpy(zero_copy_only=False)
            vb = pc.is_valid(cb).to_numpy(zero_copy_only=False)
            if not np.array_equal(va, vb):
                return False
            itemsize = np.dtype(t.to_pandas_dtype()).itemsize
            ua = np.frombuffer(ca.buffers()[1], dtype=f"u{itemsize}", count=len(ca), offset=ca.offset * itemsize)
            ub = np.frombuffer(cb.buffers()[1], dtype=f"u{itemsize}", count=len(cb), offset=cb.offset * itemsize)
            if not np.array_equal(ua[va], ub[va]):
                return False
        elif not ca.equals(cb):
            return False
    return True
from ..stages.decode import DecoderStage
from ..stages.encode import EncoderStage
from ..state import manifest as mf


def _expand_paths(input_path: str | list[str], filesystem=None) -> list[str]:
    if isinstance(input_path, (list, tuple)):
        return sorted(input_path)
    if filesystem is not None or "://" in input_path:
        # URI / explicit-fs input: expand a directory into its *.parquet
        import posixpath

        import pyarrow.fs as pafs

        from ..state import fsio

        fs, p = fsio.resolve(input_path, filesystem)
        info = fs.get_file_info(p)
        if info.type == pafs.FileType.Directory:
            names = [n for n in fsio.list_files(p, fs) if n.endswith(".parquet")]
            prefix = input_path.rstrip("/")
            return [f"{prefix}/{n}" for n in names]
        return [input_path]
    if os.path.isdir(input_path):
        return sorted(glob.glob(os.path.join(input_path, "*.parquet")))
    return sorted(glob.glob(input_path)) or [input_path]


def encode_dataset(
    input_path: str | list[str],
    out_dir: str,
    token_col: str | None = "n_tok",
    token_budget: int = DEFAULT_TOKEN_BUDGET,
    concurrency: int | None = None,
    resume: bool = True,
    batch_size: int = 1,
    use_actors: bool | None = None,
    filesystem=None,
    input_filesystem=None,
    append: bool = False,
    bloom_stats: bool = True,
) -> dict:
    """Run the encode job; returns the manifest summary. Safe to re-run:
    finished partitions are skipped (checkpoint resume).

    ``filesystem`` / ``input_filesystem``: optional ``pyarrow.fs``
    filesystems for the encoded output and the source parquet (paths may
    also simply be URIs) — on a multi-node cluster the output MUST be on
    shared storage.

    ``use_actors``: None = auto. Encoding state is per-partition (symbol
    tables are rebuilt deterministically), so the stage is valid both as an
    actor pool and as plain tasks. Actors win when each amortizes its
    process warm-up over many partitions (real-scale jobs); tasks win for
    small jobs because Ray REUSES warm worker processes across stages."""
    from ..state import fsio

    paths = _expand_paths(input_path, input_filesystem)
    mf.ensure_dirs(out_dir, filesystem)
    plan_path = fsio.join(out_dir, "plan.json")
    if resume and fsio.exists(plan_path, filesystem):
        plan = load_plan(plan_path, filesystem)
        plan_paths = sorted({p.path for p in plan})
        if input_path is not None and plan_paths != sorted(paths):
            new_files = sorted(set(paths) - set(plan_paths))
            missing = sorted(set(plan_paths) - set(paths))
            if append and new_files and not missing:
                # extend the dataset: plan only the new files, partition ids
                # continue after the existing plan (old partitions, blobs and
                # lineage are untouched — an append never rewrites)
                extra = build_plan(new_files, token_col=token_col,
                                   token_budget=token_budget, filesystem=input_filesystem)
                base = max(p.partition_id for p in plan) + 1
                plan = plan + [Partition(base + p.partition_id, p.path, p.row_start,
                                         p.row_count, p.est_tokens) for p in extra]
                save_plan(plan, plan_path, filesystem)
            else:
                raise ValueError(
                    f"out_dir {out_dir} holds a plan for different input files "
                    f"({len(plan_paths)} vs {len(paths)} requested); pass a fresh "
                    "out_dir, resume=False / --force, or append=True to add new files"
                )
    else:
        plan = build_plan(paths, token_col=token_col, token_budget=token_budget,
                          filesystem=input_filesystem)
        save_plan(plan, plan_path, filesystem)

    done = mf.finished_ids(out_dir, filesystem) if resume else set()
    todo = [p for p in plan if p.partition_id not in done]
    result = {"planned": len(plan), "skipped_finished": len(done), "encoded": len(todo)}
    if not todo:
        result.update(mf.summary(out_dir, filesystem))
        return result

    items = [
        {"partition_id": p.partition_id, "path": p.path, "row_start": p.row_start,
         "row_count": p.row_count, "est_tokens": p.est_tokens}
        for p in todo
    ]
    ds = ray.data.from_items(items)
    import ray as _ray

    cpus = int(_ray.available_resources().get("CPU", 4))
    if use_actors is None:
        use_actors = len(items) >= cpus * 16
    if use_actors:
        if concurrency is None:
            concurrency = max(2, min(cpus - 1, len(items) // 4 or 1))
        concurrency = max(1, min(concurrency, len(items)))
        out = ds.map_batches(
            EncoderStage,
            fn_constructor_kwargs={"out_dir": out_dir, "token_col": token_col,
                                   "filesystem": filesystem,
                                   "input_filesystem": input_filesystem,
                                   "bloom_stats": bloom_stats},
            batch_size=batch_size,
            concurrency=concurrency,
            num_cpus=1,
            batch_format="numpy",
        )
    else:
        stage = EncoderStage(out_dir, token_col, filesystem=filesystem,
                             input_filesystem=input_filesystem,
                             bloom_stats=bloom_stats)
        out = ds.map_batches(
            stage, batch_size=batch_size, num_cpus=1, batch_format="numpy"
        )
    # consume: the stage wrote blobs+manifest; this materializes only the
    # small per-partition metrics rows
    metrics = out.to_pandas()
    result["encoded"] = len(metrics)
    result.update(mf.summary(out_dir, filesystem))
    return result


def _normalize_predicate(predicate):
    """Predicate spec: a single (col, op, value) or an AND-list of them,
    op in {"==", "<", "<=", ">", ">=", "between", "in", "is_null",
    "is_not_null", "contains"} ("between" takes a (lo, hi) tuple,
    inclusive; "in" takes a list of values — SQL IN-list, pruned when
    EVERY value misses the partition's min/max and Bloom; the null
    tests ignore the value slot — pass None; "contains" tests
    list-column element membership, pruned by the flattened-element
    Bloom + min/max stats)."""
    if predicate is None:
        return []
    if isinstance(predicate, tuple) and len(predicate) == 3 and isinstance(predicate[0], str):
        return [predicate]
    return list(predicate)


def _stats_can_match(entry: dict, preds: list) -> bool:
    """False only when the partition's manifest min/max PROVE no row can
    satisfy the conjunction — the payoff for the per-column stats the
    reference parses but never uses (Types/Primitives.hs:79-87)."""
    for col, op, v in preds:
        st = entry.get("columns", {}).get(col)
        if not st:
            continue  # no stats -> cannot prune
        if op in ("is_null", "is_not_null"):
            nulls = st.get("null_count")
            rows = entry.get("row_count")
            if nulls is None or rows is None:
                continue
            if (op == "is_null" and nulls == 0) or \
               (op == "is_not_null" and nulls == rows):
                return False
            continue
        if op == "in":
            # prunable iff EVERY listed value provably misses
            from ..state import bloomstats as bst

            mn, mx = st.get("min"), st.get("max")
            bloom = st.get("bloom")

            def value_may_hit(x) -> bool:
                if mn is not None and mx is not None:
                    try:
                        if x < mn or x > mx:
                            return False
                    except TypeError:
                        return True
                if bloom is not None and not bst.might_contain(bloom, x):
                    return False
                return True

            if not any(value_may_hit(x) for x in v):
                return False
            continue
        if op in ("==", "contains") and st.get("bloom") is not None:
            # per-partition Bloom over distinct values: proves absence
            # for point probes min/max can't (uniform high-cardinality
            # ids); a false positive only costs a wasted decode
            from ..state import bloomstats as bst

            if not bst.might_contain(st["bloom"], v):
                return False
        if st.get("min") is None or st.get("max") is None:
            continue
        mn, mx = st["min"], st["max"]
        try:
            if (op in ("==", "contains") and (v < mn or v > mx)) or \
               (op == ">" and mx <= v) or (op == ">=" and mx < v) or \
               (op == "<" and mn >= v) or (op == "<=" and mn > v) or \
               (op == "between" and (mx < v[0] or mn > v[1])):
                return False
        except TypeError:
            # predicate value / stats type mismatch (e.g. a numeric-looking
            # --where value against a string column): incomparable stats
            # cannot prove absence -> degrade to no-prune, never crash
            continue
    return True


def pruned_partition_ids(out_dir: str, predicate, filesystem=None) -> tuple[list[int], int]:
    """(kept partition ids, total finished) for a predicate."""
    preds = _normalize_predicate(predicate)
    entries = [e for e in mf.load_manifest(out_dir, filesystem) if e.get("status") == "done"]
    kept = [e["partition_id"] for e in entries if _stats_can_match(e, preds)]
    return kept, len(entries)


def _union_schema(out_dir: str, done_entries: list[dict], filesystem=None):
    """Union schema across an evolved store: one blob header read per
    DISTINCT column-name set (the driver never opens the rest); same-name
    type conflicts across probed sets raise here, drift within a name set
    is caught by the decode stage."""
    import pyarrow as pa

    from ..format import blob_schema

    probe: dict[tuple, int] = {}
    for e in done_entries:
        key = tuple(sorted(e.get("columns", {}).keys())) or \
            ("__nostats__", e["partition_id"])
        probe.setdefault(key, e["partition_id"])
    fields: dict[str, pa.Field] = {}
    order: list[str] = []
    for pid in probe.values():
        sch = blob_schema(mf.read_blob(out_dir, pid, filesystem))
        for f in sch:
            if f.name in fields:
                if fields[f.name].type != f.type:
                    raise ValueError(
                        f"schema evolution type conflict on {f.name!r}: "
                        f"{fields[f.name].type} vs {f.type}")
            else:
                fields[f.name] = f
                order.append(f.name)
    return pa.schema([fields[n] for n in order])


def delete_rows(out_dir: str, predicate, filesystem=None,
                concurrency: int | None = None) -> dict:
    """Row-level DELETE over an encoded store, without rewriting blobs.

    Rows where ``predicate`` (same grammar as ``decode_dataset``)
    evaluates TRUE are recorded in per-partition deletion-vector
    sidecars (``state/deletes.py`` — the Delta/Iceberg design);
    ``decode_dataset``/``decode_to_parquet`` apply them as keep masks
    and ``compact_dataset`` materializes them.  SQL ``DELETE WHERE``
    semantics: NULL evaluations do NOT delete (the surviving set is
    ``WHERE pred IS NOT TRUE``).  Repeated deletes union; re-running
    the same delete is idempotent and writes nothing.

    Distributed shape: manifest min/max + Bloom stats prune partitions
    that cannot contain a matching row before any blob is opened;
    surviving partitions decode ONLY the predicate columns.  Only
    (partition_id, counts) rows return to the driver."""
    from ..state import deletes as dvs

    preds = _normalize_predicate(predicate)
    if not preds:
        raise ValueError("delete_rows requires a predicate")
    entries = [e for e in mf.load_manifest(out_dir, filesystem)
               if e.get("status") == "done"]
    items = [{"partition_id": e["partition_id"]}
             for e in entries if _stats_can_match(e, preds)]
    result = {"partitions": len(entries),
              "partitions_scanned": len(items),
              "partitions_changed": 0, "rows_newly_deleted": 0}
    if not items:
        return result

    def scan(batch: dict) -> dict:
        import numpy as np
        import pyarrow.compute as pc

        from ..format import decode_table
        from ..stages.decode import predicate_mask

        pred_cols = sorted({p[0] for p in preds})
        pids, new = [], []
        for pid in batch["partition_id"]:
            pid = int(pid)
            blob = mf.read_blob(out_dir, pid, filesystem)
            mask = predicate_mask(decode_table(blob, pred_cols), preds)
            # only TRUE deletes (NULL keeps) — is_in on a filtered index
            idx = np.flatnonzero(
                pc.fill_null(mask, False).to_numpy(zero_copy_only=False))
            n = dvs.write_delete_vector(out_dir, pid, idx, filesystem) \
                if len(idx) else 0
            pids.append(pid)
            new.append(n)
        return {"partition_id": np.asarray(pids), "new": np.asarray(new)}

    res = ray.data.from_items(items).map_batches(
        scan, batch_size=4, num_cpus=1, batch_format="numpy",
        concurrency=concurrency).to_pandas()
    result["partitions_changed"] = int((res["new"] > 0).sum())
    result["rows_newly_deleted"] = int(res["new"].sum())
    return result


def decode_dataset(out_dir: str, columns: list[str] | None = None,
                   concurrency: int | None = None, batch_size: int = 1,
                   filesystem=None, predicate=None,
                   target_schema=None, unify_schema: bool = False,
                   aux_families: list[str] | None = None,
                   apply_deletes: bool = True,
                   snapshot: str | None = None
                   ) -> "ray.data.Dataset":
    """Lazy decode Dataset over all finished partitions (streaming).

    ``predicate`` (see ``_normalize_predicate``) prunes whole partitions by
    manifest min/max stats BEFORE any blob is opened; surviving partitions
    decode the predicate columns FIRST (byte-level frame skip), full-decode
    only on a match, and filter exactly — same semantics, ~selectivity×
    less IO and decode work.

    Schema evolution: a store appended to across schema versions holds
    blobs with different column sets.  ``unify_schema=True`` computes the
    UNION schema (one blob header read per distinct column set — the
    driver never opens the rest) and every partition adapts to it:
    missing columns null-pad, order unifies, same-name type conflicts
    raise — across distinct column sets at the driver, and for blobs
    whose name set matches the probe but whose types drifted, at decode
    time in the stage.  Pass ``target_schema`` (a ``pyarrow.Schema``) to pin the
    contract explicitly instead; ``columns=`` then projects it.
    Predicates on a column a blob predates see all-NULL semantics
    (equality/range/is_not_null match nothing, is_null everything).

    ``apply_deletes`` (default True) honors deletion-vector sidecars
    written by ``delete_rows``; pass False to audit the base data.

    ``snapshot`` time-travels: only partitions recorded by
    ``state.snapshots.create_snapshot`` are visible, the snapshot's
    PINNED delete vectors apply (later deletes are ignored), and blob
    crc32s are checked against the snapshot (an immutability violation
    refuses to decode)."""
    import pyarrow as pa

    from ..state import deletes as dvs

    preds = _normalize_predicate(predicate)
    entries = mf.load_manifest(out_dir, filesystem)
    done = [e for e in entries if e.get("status") == "done"]
    snap_crc: dict[int, int] | None = None
    delete_vectors = None
    if snapshot is not None:
        from ..state import snapshots as snaps

        snap = snaps.load_snapshot(out_dir, snapshot, filesystem)
        snap_crc = {int(r["partition_id"]): int(r.get("crc32", -1))
                    for r in snap["partitions"]}
        have = {e["partition_id"] for e in done}
        missing = sorted(set(snap_crc) - have)
        if missing:
            raise ValueError(
                f"snapshot {snapshot!r} references partitions no longer in "
                f"the manifest (e.g. {missing[:3]}) — store was rebuilt")
        done = [e for e in done if e["partition_id"] in snap_crc]
        delete_vectors = snaps.snapshot_delete_vectors(snap)
        deleted_pids = set(delete_vectors)
    else:
        deleted_pids = dvs.list_delete_pids(out_dir, filesystem) \
            if apply_deletes else set()
    if unify_schema and target_schema is None:
        target_schema = _union_schema(out_dir, done, filesystem)
    if target_schema is not None and columns is not None:
        unknown = [c for c in columns if c not in target_schema.names]
        if unknown:
            raise KeyError(f"columns not in target schema: {unknown}")
    items = [{"partition_id": e["partition_id"],
              "crc32": (snap_crc[e["partition_id"]] if snap_crc is not None
                        else e.get("checksum_crc32", -1))}
             for e in done if _stats_can_match(e, preds)]
    aux_dirs = []
    if aux_families:
        from ..format import blob_schema

        pids = {it["partition_id"] for it in items}
        for fam in aux_families:
            adir = aux_family_dir(out_dir, fam)
            have = mf.finished_ids(adir, filesystem)
            missing = pids - have
            if missing:
                raise ValueError(
                    f"aux family {fam!r} is missing {len(missing)} of "
                    f"{len(pids)} partitions (e.g. {sorted(missing)[:3]}); "
                    "run backfill_columns to completion first")
            aux_dirs.append(adir)
            if target_schema is not None and pids:
                # the adapt step projects to the target — fold the
                # family's columns in so aux + unify don't silently drop
                asch = blob_schema(mf.read_blob(adir, min(pids), filesystem))
                for f in asch:
                    if f.name not in target_schema.names:
                        target_schema = target_schema.append(f)
    ds = ray.data.from_items(items)
    if len(items) >= 256:
        return ds.map_batches(
            DecoderStage,
            fn_constructor_kwargs={"out_dir": out_dir, "columns": columns,
                                   "filesystem": filesystem, "predicate": preds,
                                   "target_schema": target_schema,
                                   "aux_dirs": aux_dirs,
                                   "deleted_pids": deleted_pids,
                                   "delete_vectors": delete_vectors},
            batch_size=batch_size,
            concurrency=concurrency or 8,
            num_cpus=1,
            batch_format="numpy",
        )
    stage = DecoderStage(out_dir, columns, filesystem=filesystem, predicate=preds,
                         target_schema=target_schema, aux_dirs=aux_dirs,
                         deleted_pids=deleted_pids,
                         delete_vectors=delete_vectors)
    return ds.map_batches(stage, batch_size=batch_size, num_cpus=1, batch_format="numpy")


def verify_roundtrip(input_path: str | list[str], out_dir: str,
                     filesystem=None, input_filesystem=None) -> dict:
    """Distributed per-partition equality check: decode each blob and compare
    with the exact input slice it came from (per-row token-array equality =
    full Arrow table equality). Returns counts; raises on mismatch."""
    from ..state import fsio

    plan = load_plan(fsio.join(out_dir, "plan.json"), filesystem)
    items = [
        {"partition_id": p.partition_id, "path": p.path, "row_start": p.row_start,
         "row_count": p.row_count, "est_tokens": p.est_tokens}
        for p in plan
    ]

    def check(batch: dict) -> dict:
        import numpy as np

        from ..format import decode_table
        from ..stages.encode import read_slice

        ok, rows = [], []
        for i in range(len(batch["partition_id"])):
            pid = int(batch["partition_id"][i])
            decoded = decode_table(mf.read_blob(out_dir, pid, filesystem))
            original = read_slice(str(batch["path"][i]), int(batch["row_start"][i]),
                                  int(batch["row_count"][i]), filesystem=input_filesystem)
            ok.append(tables_bitwise_equal(decoded, original))
            rows.append(decoded.num_rows)
        return {"partition_id": batch["partition_id"],
                "ok": np.asarray(ok), "rows": np.asarray(rows)}

    res = ray.data.from_items(items).map_batches(check, batch_format="numpy").to_pandas()
    bad = res[~res["ok"]]
    summary = {"partitions": len(res), "rows": int(res["rows"].sum()),
               "mismatched_partitions": int(len(bad))}
    if len(bad):
        raise AssertionError(f"round-trip mismatch in partitions {bad['partition_id'].tolist()[:10]}")
    return summary


def decode_to_parquet(out_dir: str, dest_dir: str, columns: list[str] | None = None,
                      predicate=None, filesystem=None, dest_filesystem=None,
                      partition_cols: list[str] | None = None,
                      target_schema=None, unify_schema: bool = False,
                      apply_deletes: bool = True,
                      writer: str = "pyarrow") -> dict:
    """RESUMABLE decode-to-parquet: one output file per encoded partition
    (``part-<id>.parquet``), written atomically; partitions whose output
    already exists are skipped, so a killed export continues where it
    stopped — the brief's "resumable output" layout (never one giant
    file).

    ``partition_cols`` hive-partitions the export
    (``<dest>/<col>=<val>/part-<id>.parquet``, partition columns dropped
    from the files per hive convention); completion is then tracked with
    atomic ``_done/part-<id>.done`` markers (underscore-prefixed dirs are
    ignored by parquet dataset discovery), since one encoded partition may
    fan out to several hive files.

    ``writer="kernels"`` routes the parquet encode through our own
    write kernels (`sources/parquet_writer.py`) instead of pyarrow —
    the fully self-hosted path (kernel decode -> kernel parquet).

    NOTE: an already-exported partition is NOT re-exported when a later
    ``delete_rows`` touches it — export before delete, or export to a
    fresh dest."""
    if writer not in ("pyarrow", "kernels"):
        raise ValueError(f"writer must be 'pyarrow' or 'kernels', got {writer!r}")
    from ..state import deletes as dvs
    from ..state import fsio

    preds = _normalize_predicate(predicate)
    deleted_pids = dvs.list_delete_pids(out_dir, filesystem) \
        if apply_deletes else set()
    entries = [e for e in mf.load_manifest(out_dir, filesystem)
               if e.get("status") == "done" and _stats_can_match(e, preds)]
    if unify_schema and target_schema is None:
        target_schema = _union_schema(out_dir, entries, filesystem)
    fsio.mkdirs(dest_dir, dest_filesystem)
    if partition_cols:
        done_dir = fsio.join(dest_dir, "_done")
        fsio.mkdirs(done_dir, dest_filesystem)
        existing = set(fsio.list_files(done_dir, dest_filesystem))
        marker = "part-{:08d}.done"
    else:
        existing = set(fsio.list_files(dest_dir, dest_filesystem))
        marker = "part-{:08d}.parquet"
    todo = [e for e in entries
            if marker.format(e["partition_id"]) not in existing]
    result = {"partitions": len(entries), "skipped_finished": len(entries) - len(todo),
              "written": len(todo)}
    if not todo:
        return result

    def export(batch: dict) -> dict:
        import io

        import numpy as np
        import pyarrow.parquet as pq

        def write_one(t: pa.Table, rel: str) -> None:
            if writer == "kernels":
                from ..sources.parquet_writer import encode_parquet_bytes

                blob = encode_parquet_bytes(t, compression="SNAPPY",
                                            encodings="auto")
            else:
                buf = io.BytesIO()
                pq.write_table(t, buf)
                blob = buf.getvalue()
            fsio.write_atomic(fsio.join(dest_dir, rel), blob,
                              dest_filesystem)

        stage = DecoderStage(out_dir, columns, filesystem=filesystem, predicate=preds,
                             target_schema=target_schema,
                             deleted_pids=deleted_pids)
        done = []
        for pid, crc in zip(batch["partition_id"], batch["crc32"]):
            t = stage({"partition_id": [pid], "crc32": [crc]})
            if not partition_cols:
                write_one(t, f"part-{int(pid):08d}.parquet")
            else:
                for subdir, part in _hive_splits(t, partition_cols):
                    fsio.mkdirs(fsio.join(dest_dir, subdir), dest_filesystem)
                    write_one(part, f"{subdir}/part-{int(pid):08d}.parquet")
                fsio.write_atomic(
                    fsio.join(dest_dir, "_done", f"part-{int(pid):08d}.done"),
                    b"", dest_filesystem)
            done.append(int(pid))
        return {"partition_id": np.asarray(done)}

    items = [{"partition_id": e["partition_id"], "crc32": e.get("checksum_crc32", -1)}
             for e in todo]
    ray.data.from_items(items).map_batches(export, batch_size=1, num_cpus=1,
                                           batch_format="numpy").count()
    return result


def _hive_splits(t: pa.Table, partition_cols: list[str]):
    """Yield (hive subdir, sub-table minus partition cols) per distinct
    partition-key combination — vectorized via dictionary-encoded combo
    codes, one filter per distinct combo (not per row)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    missing = [c for c in partition_cols if c not in t.column_names]
    if missing:
        raise KeyError(f"partition_cols {missing!r} not in decoded columns "
                       f"{t.column_names!r}")
    if t.num_rows == 0:
        return
    key_strs = [pc.cast(t[c], pa.string()) for c in partition_cols]
    combo = key_strs[0] if len(key_strs) == 1 else \
        pc.binary_join_element_wise(*key_strs, "\x1f")
    if isinstance(combo, pa.ChunkedArray):
        combo = pa.concat_arrays(combo.chunks)
    codes = pc.dictionary_encode(combo)
    dictionary = codes.dictionary
    indices = codes.indices
    rest = t.drop_columns(partition_cols)
    for code in range(len(dictionary)):
        vals = str(dictionary[code]).split("\x1f")
        subdir = "/".join(f"{c}={v}" for c, v in zip(partition_cols, vals))
        yield subdir, rest.filter(pc.equal(indices, code))


def compact_dataset(src_dir: str, out_dir: str,
                    token_budget: int = DEFAULT_TOKEN_BUDGET,
                    resume: bool = True,
                    filesystem=None, src_filesystem=None) -> dict:
    """Compact an encoded dataset: merge runs of small partitions into
    token-budget-sized ones — the storage-maintenance pass every
    long-lived encoded store needs once appends / skew splits have
    fragmented it (many sub-budget blobs pay per-partition scheduling,
    manifest and dictionary overhead on every later decode).

    Semantics & shape:

    - groups CONSECUTIVE finished partitions (manifest id order) until
      adding the next would exceed ``token_budget`` — rows keep their
      manifest-order position (within-partition order is exact; global
      ordering across blocks follows Ray's ``preserve_order`` execution
      option, as for any decode).
      Weights are manifest ``n_tokens``; datasets encoded without a
      token column fall back to ``raw_bytes`` (then the budget is in
      raw Arrow bytes — documented, not mixed).
    - each group decodes its source blobs (one task per group, streaming
      actor-pool-free map), concatenates, and RE-ENCODES the merged
      chunk: the codec selector re-runs on the bigger chunk, so
      dictionaries/symbol tables amortize and runs lengthen — compaction
      usually SHRINKS total bytes, never changes decoded values.
    - the source is never mutated; the output manifest entry carries
      ``source_partitions`` + ``compacted_from`` lineage, fresh
      per-column stats and Bloom filters.
    - deletion vectors (``delete_rows``) are MATERIALIZED: deleted rows
      are dropped during the merge and the compacted store carries no
      sidecars — compaction is the vacuum step.  Group token weights
      use manifest ``n_tokens`` (an upper bound on stores with
      deletes).
    - resumable exactly like encode: finished output partitions are
      skipped on re-run (blob AND manifest entry required).

    Note: ``cli verify`` needs the original plan lineage, so verify a
    compacted store by decode-comparison against the source store (the
    test does) or against the original input files.
    """
    import time

    import numpy as np
    import pyarrow as pa

    from ..state import deletes as dvs

    deleted_pids = dvs.list_delete_pids(src_dir, src_filesystem)
    entries = sorted((e for e in mf.load_manifest(src_dir, src_filesystem)
                      if e.get("status") == "done"),
                     key=lambda e: e["partition_id"])
    if not entries:
        raise ValueError(f"no finished partitions in {src_dir}")
    use_tokens = any((e.get("n_tokens") or 0) > 0 for e in entries)
    wkey = "n_tokens" if use_tokens else "raw_bytes"

    groups: list[list[dict]] = []
    cur: list[dict] = []
    acc = 0
    cur_cols: tuple | None = None
    for e in entries:
        w = max(0, int(e.get(wkey) or 0))
        cols = tuple(sorted(e.get("columns", {})))
        # a store may hold several tables (whole-directory encode):
        # never merge across schemas — break the group on a column-set
        # change just like on a budget overflow
        if cur and (acc + w > token_budget or cols != cur_cols):
            groups.append(cur)
            cur, acc = [], 0
        cur.append(e)
        acc += w
        cur_cols = cols
    if cur:
        groups.append(cur)

    mf.ensure_dirs(out_dir, filesystem)
    done = mf.finished_ids(out_dir, filesystem) if resume else set()
    items = [{"partition_id": gi,
              "src_ids": np.array([e["partition_id"] for e in g], dtype=np.int64),
              "n_tokens": sum(int(e.get("n_tokens") or 0) for e in g),
              "row_count": sum(int(e.get("row_count") or 0) for e in g)}
             for gi, g in enumerate(groups) if gi not in done]
    result = {"groups": len(groups), "skipped_finished": len(done),
              "compacted": len(items), "source_partitions": len(entries)}
    if not items:
        result.update(mf.summary(out_dir, filesystem))
        return result

    def compact_group(batch: dict) -> dict:
        from ..format import decode_table, encode_table
        from ..stages.encode import attach_bloom_stats

        def load(pid: int) -> pa.Table:
            t = decode_table(mf.read_blob(src_dir, pid, src_filesystem))
            if pid in deleted_pids:
                dv = dvs.read_delete_vector(src_dir, pid, src_filesystem)
                if dv is not None and len(dv):
                    t = t.filter(pa.array(dvs.keep_mask(dv, t.num_rows)))
            return t

        out = {"partition_id": [], "row_count": [], "encoded_bytes": []}
        for i in range(len(batch["partition_id"])):
            t0 = time.perf_counter()
            gid = int(batch["partition_id"][i])
            src_ids = [int(x) for x in batch["src_ids"][i]]
            tbl = pa.concat_tables(
                [load(pid) for pid in src_ids]).combine_chunks()
            blob, stats = encode_table(tbl)
            mf.write_blob_atomic(out_dir, gid, blob, filesystem)
            part = Partition(partition_id=gid, path=f"compact:{src_dir}",
                             row_start=0, row_count=tbl.num_rows,
                             est_tokens=int(batch["n_tokens"][i]))
            entry = mf.make_entry(part, blob, raw_bytes=tbl.nbytes,
                                  n_rows=tbl.num_rows,
                                  n_tokens=int(batch["n_tokens"][i]),
                                  col_stats=stats,
                                  wall_ms=(time.perf_counter() - t0) * 1e3)
            entry["source_partitions"] = src_ids
            entry["compacted_from"] = src_dir
            attach_bloom_stats(entry, tbl)
            mf.write_entry(out_dir, entry, filesystem)
            out["partition_id"].append(gid)
            out["row_count"].append(tbl.num_rows)
            out["encoded_bytes"].append(len(blob))
        return {k: np.asarray(v) for k, v in out.items()}

    ds = ray.data.from_items(items)
    metrics = ds.map_batches(compact_group, batch_size=1, num_cpus=1,
                             batch_format="numpy").to_pandas()
    result["compacted"] = len(metrics)
    result.update(mf.summary(out_dir, filesystem))
    return result


def aux_family_dir(out_dir: str, family: str) -> str:
    from ..state import fsio

    return fsio.join(out_dir, "aux", family)


def backfill_columns(out_dir: str, family: str, fn, columns: list[str] | None = None,
                     filesystem=None, concurrency: int | None = None) -> dict:
    """Add derived columns to an encoded store WITHOUT re-encoding it —
    the 100 TB backfill: computing a quality score over an already-encoded
    corpus must not rewrite the corpus.

    For every finished partition, ``fn(table) -> table`` receives the
    decoded base partition (optionally only ``columns``) and returns the
    NEW columns (same row count, same order).  Each result encodes
    through the normal codec selector into its own blob under
    ``<out>/aux/<family>/`` keyed by the SAME partition id — so decode
    merges base and family by row position, no join, no shuffle.  The
    family is itself a mini-store (manifest + atomic blobs + resume):
    re-running a backfill skips finished partitions; a changed ``fn``
    needs a new family name.

    Scale shape: one task per partition, each reading exactly one base
    blob; the family adds bytes proportional to the new columns only."""
    import ray.data as rd

    from ..state import fsio

    adir = aux_family_dir(out_dir, family)
    mf.ensure_dirs(adir, filesystem)
    entries = [e for e in mf.load_manifest(out_dir, filesystem)
               if e.get("status") == "done"]
    done = mf.finished_ids(adir, filesystem)
    todo = [e for e in entries if e["partition_id"] not in done]
    result = {"partitions": len(entries),
              "skipped_finished": len(entries) - len(todo),
              "backfilled": len(todo), "family": family}
    if not todo:
        return result

    items = [{"partition_id": e["partition_id"],
              "row_count": e.get("row_count", -1)} for e in todo]

    def one(batch: dict) -> "pd.DataFrame":
        import time

        import pandas as pd

        from ..format import decode_table, encode_table

        out_rows = []
        for i in range(len(batch["partition_id"])):
            pid = int(batch["partition_id"][i])
            t0 = time.perf_counter()
            base = decode_table(mf.read_blob(out_dir, pid, filesystem), columns)
            new = fn(base)
            if new.num_rows != base.num_rows:
                raise ValueError(
                    f"backfill fn returned {new.num_rows} rows for "
                    f"partition {pid} ({base.num_rows} expected) — aux "
                    "columns must align by row position")
            clash = set(new.column_names) & set(base.column_names)
            if clash:
                raise ValueError(
                    f"backfill fn returned columns shadowing the base "
                    f"schema: {sorted(clash)} — pick distinct names")
            blob, stats = encode_table(new)
            mf.write_blob_atomic(adir, pid, blob, filesystem)
            entry = {"partition_id": pid, "row_count": new.num_rows,
                     "n_tokens": 0, "raw_bytes": new.nbytes,
                     "encoded_bytes": len(blob),
                     "checksum_crc32": __import__("zlib").crc32(blob),
                     "wall_ms": round((time.perf_counter() - t0) * 1e3, 2),
                     "columns": {n: {"codec": st.codec}
                                 for n, st in stats.items()},
                     "status": "done"}
            mf.write_entry(adir, entry, filesystem)
            out_rows.append({"partition_id": pid, "rows": new.num_rows,
                             "encoded_bytes": len(blob)})
        return pd.DataFrame(out_rows)

    ds = rd.from_items(items)
    kw = {"concurrency": concurrency} if concurrency else {}
    stats_rows = ds.map_batches(one, batch_size=1, num_cpus=1,
                                batch_format="numpy", **kw).to_pandas()
    result["rows"] = int(stats_rows["rows"].sum())
    result["encoded_bytes"] = int(stats_rows["encoded_bytes"].sum())
    return result
