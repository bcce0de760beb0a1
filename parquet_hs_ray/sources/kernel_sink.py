"""Distributed Parquet sink built on our own write kernels.

``KernelParquetDatasink`` plugs ``encode_parquet_bytes`` (thrift footer,
Dremel shredding, RLE levels, PLAIN / PLAIN_DICTIONARY pages —
`parquet_writer.py`) into Ray Data's ``Dataset.write_datasink`` write
operator, so a streaming pipeline can land standard Parquet without
pyarrow's writer anywhere on the path: one file per write task
(``part-<task>-<seq>.parquet``), each written atomically
(write-then-rename via ``fsio.write_atomic``), plus a committed
``_kernel_manifest.json`` listing every file with row/byte counts —
consumers treat a directory without the manifest as an aborted write.

The reference is decode-only (`/root/reference/src/Parquet/Decoder.hs`
stops at ``encodeVarint``); a distributed sink is the strict-superset
write half, shaped for the brief's "resumable output: partitioned
Parquet, never one giant file".

Scale notes: blocks stream through write tasks with backpressure (no
driver materialization); each task holds only its current block plus
the encoded image. File count == write-task count, controlled upstream
with ``repartition`` / block size.
"""

from __future__ import annotations

import json
import os
from typing import Iterable

from ray.data import Datasink
from ray.data._internal.execution.interfaces import TaskContext

from ..state import fsio
from .parquet_writer import encode_parquet_bytes

MANIFEST_NAME = "_kernel_manifest.json"


class KernelParquetDatasink(Datasink):
    """Write a Dataset as standard Parquet through our kernels."""

    def __init__(self, path: str, compression: str = "SNAPPY",
                 row_group_size: int = 1 << 20,
                 use_dictionary: bool = True, encodings: str = "classic",
                 page_version: str = "1.0", filesystem=None,
                 data_page_rows: int | None = None,
                 bloom_filters=None):
        # validate up front: on_write_start destructively clears the
        # destination, so a bad mode must fail before any cleanup
        from .parquet_writer import _CODECS

        if encodings not in ("classic", "auto"):
            raise ValueError(
                f"encodings must be 'classic' or 'auto', got {encodings!r}")
        if page_version not in ("1.0", "2.0"):
            raise ValueError(
                f"page_version must be '1.0' or '2.0', got {page_version!r}")
        if compression.upper() not in _CODECS and \
                compression.upper() != "NONE":
            raise ValueError(f"unsupported compression {compression}")
        self._path = path
        self._compression = compression
        self._row_group_size = row_group_size
        self._use_dictionary = use_dictionary
        self._encodings = encodings
        self._page_version = page_version
        self._filesystem = filesystem
        self._data_page_rows = data_page_rows
        self._bloom_filters = bloom_filters

    def get_name(self) -> str:
        return "KernelParquet"

    def on_write_start(self) -> None:
        fsio.mkdirs(self._path, self._filesystem)
        # a fresh write invalidates any previous commit marker AND its
        # part files: a rewrite with fewer write tasks must not leave
        # stale parts for glob-based readers to double-count
        marker = fsio.join(self._path, MANIFEST_NAME)
        if fsio.exists(marker, self._filesystem):
            fsio.delete_file(marker, self._filesystem)
        for name in fsio.list_files(self._path, self._filesystem):
            if name.startswith("part-") and name.endswith(".parquet"):
                fsio.delete_file(fsio.join(self._path, name),
                                 self._filesystem)

    def write(self, blocks: Iterable, ctx: TaskContext) -> list[dict]:
        from ray.data.block import BlockAccessor

        results = []
        for seq, block in enumerate(blocks):
            t = BlockAccessor.for_block(block).to_arrow()
            if t.num_rows == 0:
                continue
            blob = encode_parquet_bytes(
                t, compression=self._compression,
                row_group_size=self._row_group_size,
                use_dictionary=self._use_dictionary,
                encodings=self._encodings,
                page_version=self._page_version,
                data_page_rows=self._data_page_rows,
                bloom_filters=self._bloom_filters)
            name = f"part-{ctx.task_idx:06d}-{seq:04d}.parquet"
            fsio.write_atomic(fsio.join(self._path, name), blob,
                              self._filesystem)
            results.append({"file": name, "rows": t.num_rows,
                            "bytes": len(blob)})
        return results

    def on_write_complete(self, write_result) -> None:
        files = [r for task in write_result.write_returns for r in task]
        manifest = {
            "files": sorted(files, key=lambda r: r["file"]),
            "rows": sum(r["rows"] for r in files),
            "bytes": sum(r["bytes"] for r in files),
            "compression": self._compression,
        }
        fsio.write_atomic(fsio.join(self._path, MANIFEST_NAME),
                          json.dumps(manifest, indent=1).encode(),
                          self._filesystem, durable=True)


def write_parquet_kernels(ds, path: str, compression: str = "SNAPPY",
                          row_group_size: int = 1 << 20,
                          use_dictionary: bool = True,
                          encodings: str = "classic",
                          page_version: str = "1.0",
                          filesystem=None, concurrency=None,
                          data_page_rows: int | None = None,
                          bloom_filters=None) -> dict:
    """``Dataset.write_parquet`` twin over the kernel writer: streams
    the dataset's blocks through ``KernelParquetDatasink`` and returns
    the committed manifest.  ``bloom_filters`` (column names or
    ``{name: fpp}``) emits per-chunk split-block bloom filters the
    read path probes for equality predicates (`bloom.py`)."""
    sink = KernelParquetDatasink(path, compression=compression,
                                 row_group_size=row_group_size,
                                 use_dictionary=use_dictionary,
                                 encodings=encodings,
                                 page_version=page_version,
                                 filesystem=filesystem,
                                 data_page_rows=data_page_rows,
                                 bloom_filters=bloom_filters)
    ds.write_datasink(sink, concurrency=concurrency)
    return read_sink_manifest(path, filesystem)


# worker-local parsed-footer cache: decode tasks for the same file
# reuse one KernelFileMetaData instead of re-parsing the footer per
# ROW GROUP (a 92-row-group file would otherwise parse its footer 92
# times across the decode stage).  Keyed by (path, size, mtime_ns) so
# an overwritten file re-parses; bounded; local paths only (remote
# filesystems skip the cache — no cheap validity key).
_KM_CACHE: dict = {}


def _cached_km(path: str, filesystem):
    from .parquet_footer import read_footer_via_kernels

    if filesystem is not None or "://" in path:
        return read_footer_via_kernels(path, filesystem=filesystem)
    try:
        st = os.stat(path)
        key = (path, st.st_size, st.st_mtime_ns)
    except OSError:
        return read_footer_via_kernels(path, filesystem=filesystem)
    km = _KM_CACHE.get(key)
    if km is None:
        km = read_footer_via_kernels(path, filesystem=filesystem)
        if len(_KM_CACHE) >= 64:
            _KM_CACHE.clear()
        _KM_CACHE[key] = km
    return km


def read_sink_manifest(path: str, filesystem=None) -> dict:
    """Load the commit manifest; raises if the write never committed."""
    marker = fsio.join(path, MANIFEST_NAME)
    if not fsio.exists(marker, filesystem):
        raise FileNotFoundError(
            f"{marker} missing: the kernel-sink write did not complete")
    return json.loads(fsio.read_bytes(marker, filesystem))


def read_parquet_kernels(path: str, columns: list[str] | None = None,
                         predicate=None, footer: str = "pyarrow",
                         filesystem=None, concurrency=None,
                         page_index: bool = True,
                         bloom: bool = True,
                         verify_crc: bool = False):
    """Distributed parquet READ through our kernels: the inverse of
    ``write_parquet_kernels`` — returns a ``ray.data.Dataset``.

    Two distributed stages: (1) a footer stage parses each file's
    metadata, prunes row groups against ``predicate`` statistics, and
    emits one ``(path, row_group)`` work item per SURVIVING row group;
    (2) a decode stage decodes one row group per task.  The row-group
    seam — not the file — is the unit of parallelism and of per-task
    memory, so one multi-GB file decodes as many bounded tasks instead
    of a single task holding the whole decoded table.  Blocks stream
    out with backpressure; the driver never holds data.

    ``path`` is a single parquet file, a directory, or an explicit
    list of files.  A directory holding a ``_kernel_manifest.json``
    reads the COMMITTED file list (a sink dir without one is an
    aborted write and raises — partial data never reads back
    silently); other directories glob ``*.parquet`` with ``_``/``.``
    entries skipped per parquet dataset convention.

    ``predicate`` is one ``(column, op, value)`` tuple or a list of
    them (AND semantics; ops ``== != < <= > >= in`` — ``in`` takes a
    list of members): row groups whose footer min/max provably cannot
    match are never decoded, then the EXACT filter is applied to the
    decoded rows — pushdown as pruning, not as semantics.

    ``footer="kernels"`` parses footers AND statistics through our
    thrift kernels (`parquet_footer.py`) — zero pyarrow anywhere on
    the read path, pruned reads included.  With ``page_index`` (the
    default) predicates additionally prune at PAGE granularity inside
    each surviving row group via the ColumnIndex/OffsetIndex
    structures when the file carries them (our writer emits them;
    parquet-format PageIndex.md) — only pages whose row ranges may
    match are read and decoded.  pyarrow's Python API does not expose
    the index offsets, so page pruning applies to footer='kernels'.

    ``bloom`` (default on, footer='kernels' only): equality predicates
    additionally probe each candidate row group's split-block bloom
    filter when the file carries one (`bloom.py`; our writer emits
    them under ``bloom_filters=``) — the unsorted-high-cardinality
    case where min/max statistics prune nothing.  One-sided: a missing
    or foreign filter keeps the row group.

    ``filesystem`` (any pyarrow FileSystem, e.g.
    ``state.httpfs.http_range_filesystem``) makes every footer and
    column-chunk read a ranged GET through it — the reference's
    ``remoteParquetFile`` (`Reader.hs:223-248`) at Dataset scale."""
    if footer not in ("pyarrow", "kernels"):
        raise ValueError(f"footer must be 'pyarrow' or 'kernels', got {footer!r}")
    import ray

    from ..state import fsio
    from .parquet_pages import read_parquet_via_kernels

    def _isdir(p: str) -> bool:
        import pyarrow.fs as pafs

        fs, rp = fsio.resolve(p, filesystem)
        return fs.get_file_info(rp).type == pafs.FileType.Directory

    if isinstance(path, (list, tuple)):
        files = list(path)
    elif _isdir(path):
        marker = fsio.join(path, MANIFEST_NAME)
        listing = [
            n for n in fsio.list_files(path, filesystem)
            if n.endswith(".parquet") and not n.startswith(("_", "."))]
        if fsio.exists(marker, filesystem):
            manifest = read_sink_manifest(path, filesystem)
            names = [r["file"] for r in manifest["files"]]
            missing = set(names) - set(listing)
            if missing:
                raise FileNotFoundError(
                    f"manifest lists files absent on disk: "
                    f"{sorted(missing)[:5]}")
            files = [fsio.join(path, n) for n in names]
            if not files:  # committed EMPTY write: 0-row dataset
                import pyarrow as pa

                return ray.data.from_arrow(pa.table({}))
        elif any(n.startswith("part-") for n in listing):
            # sink-shaped dir without a commit marker: aborted write
            raise FileNotFoundError(
                f"{marker} missing: refusing to read a possibly "
                "partial kernel-sink write")
        else:
            files = [fsio.join(path, n) for n in listing]
    else:
        if not fsio.exists(path, filesystem):
            raise FileNotFoundError(path)
        files = [path]
    if not files:
        raise FileNotFoundError(f"no parquet files under {path}")

    preds = None
    if predicate is not None:
        from .parquet_pages import _PRED_OPS

        preds = ([tuple(predicate)] if isinstance(predicate, tuple)
                 else [tuple(p) for p in predicate])
        for p in preds:
            if len(p) != 3:
                raise ValueError(f"predicate must be (col, op, value): {p}")
            if p[1] not in _PRED_OPS:
                raise ValueError(
                    f"unknown predicate op {p[1]!r} (use "
                    f"{sorted(_PRED_OPS)})")
    if columns is not None or preds:
        # fail fast on the driver, not as a deferred per-task RayTaskError
        import pyarrow as pa

        if footer == "kernels":
            from .parquet_footer import read_footer_via_kernels

            sch = read_footer_via_kernels(files[0],
                                          filesystem=filesystem).schema
        else:
            import pyarrow.parquet as pq

            sch = pq.read_schema(
                fsio.open_parquet_input(files[0], filesystem)
                if filesystem is not None or "://" in files[0]
                else files[0])
        known = set(sch.names)
        missing = set(columns or []) - known
        if preds:
            for c, _, _ in preds:
                if c not in known:
                    missing.add(c)
                elif pa.types.is_nested(sch.field(c).type):
                    raise ValueError(
                        f"predicate column {c!r} is nested; only flat "
                        "columns filter")
        if missing:
            raise KeyError(f"columns not in schema: {sorted(missing)}")

    # the filter needs its columns decoded even when projected away
    read_cols = columns
    if preds and columns is not None:
        read_cols = columns + [c for c, _, _ in preds
                               if c not in columns]

    def enumerate_row_groups(batch):
        """Footer stage: one (path, row_group) item per surviving row
        group.  File index 0 emits a row_group=-1 sentinel when fully
        pruned so the dataset always carries ≥1 decode task and a
        stable schema (a fully-pruned read returns 0 rows with the
        RIGHT columns, never an empty {} block)."""
        import numpy as np

        paths = batch["path"].tolist()
        idxs = batch["index"].tolist()
        out_p, out_rg = [], []
        for p, fi in zip(paths, idxs):
            if footer == "kernels":
                from .parquet_footer import (
                    prune_row_groups_by_stats_kernels)

                km = _cached_km(p, filesystem)
                rgs = (prune_row_groups_by_stats_kernels(km, preds)
                       if preds else range(len(km.row_groups)))
                if preds and bloom and any(op in ("==", "in")
                                           for _, op, _ in preds):
                    # split-block bloom probes (bloom.py): row groups
                    # whose filter PROVES an equality value absent are
                    # dropped even when min/max could not prune (the
                    # unsorted high-cardinality case); one-sided
                    from .bloom import prune_row_groups_by_bloom
                    from .parquet_pages import prune_row_groups_by_dict

                    rgs = prune_row_groups_by_bloom(
                        km, preds, p, filesystem=filesystem,
                        candidates=list(rgs))
                    # dictionary-membership pruning: definitive where
                    # PageEncodingStats prove all-dict data pages —
                    # catches bloom false positives AND files written
                    # with no blooms at all (pyarrow/DuckDB defaults)
                    rgs = prune_row_groups_by_dict(
                        km, preds, p, filesystem=filesystem,
                        candidates=list(rgs))
            else:
                import pyarrow.parquet as pq

                from .parquet_pages import prune_row_groups_by_stats

                pf = pq.ParquetFile(
                    p if filesystem is None and "://" not in p
                    else fsio.open_parquet_input(p, filesystem))
                rgs = (prune_row_groups_by_stats(pf.metadata, preds)
                       if preds else range(pf.metadata.num_row_groups))
            rgs = list(rgs)
            if not rgs and fi == 0:
                rgs = [-1]  # schema-anchor sentinel
            out_p.extend([p] * len(rgs))
            out_rg.extend(rgs)
        return {"path": np.array(out_p, dtype=object),
                "row_group": np.array(out_rg, dtype=np.int64)}

    def decode_one(batch):
        import pyarrow.compute as pc

        import pyarrow as pa

        op_fn = {"==": pc.equal, "!=": pc.not_equal,
                 "<": pc.less, "<=": pc.less_equal,
                 ">": pc.greater, ">=": pc.greater_equal,
                 "in": lambda arr, v: pc.is_in(
                     arr, value_set=pa.array(list(v)))}
        p = batch["path"].tolist()[0]
        rg = int(batch["row_group"][0])
        if rg < 0:  # sentinel: 0-row table with the read schema
            return read_parquet_via_kernels(
                p, columns=columns, row_groups=[], footer=footer,
                filesystem=filesystem)
        vc = verify_crc
        t = None
        if preds and page_index and footer == "kernels":
            from .parquet_footer import prune_pages_by_index
            from .parquet_pages import read_row_group_page_pruned

            km = _cached_km(p, filesystem)
            ranges = prune_pages_by_index(km, p, rg, preds,
                                          filesystem=filesystem)
            if ranges is not None:
                t = read_row_group_page_pruned(
                    p, km, rg, ranges, columns=read_cols,
                    filesystem=filesystem, verify_crc=vc)
            else:
                t = read_parquet_via_kernels(
                    p, columns=read_cols, row_groups=[rg],
                    footer=footer, filesystem=filesystem, km=km,
                    verify_crc=vc)
        if t is None:
            t = read_parquet_via_kernels(
                p, columns=read_cols, row_groups=[rg], footer=footer,
                filesystem=filesystem, verify_crc=vc,
                km=(_cached_km(p, filesystem)
                    if footer == "kernels" else None))
        if preds:
            mask = None
            for col, op, val in preds:
                m = op_fn[op](t[col], val)
                mask = m if mask is None else pc.and_kleene(mask, m)
            t = t.filter(pc.fill_null(mask, False))
            if columns is not None:
                t = t.select(columns)
        return t

    items = [{"path": p, "index": i} for i, p in enumerate(files)]
    # Footer stage: DISTRIBUTED (Ray tasks parse/prune footers,
    # num_cpus=0.25 is the honest metadata-only cost) but materialized
    # eagerly — the work list is one (path, row_group) record per
    # surviving row group, bytes per entry, the same driver-side
    # metadata contract as ray.data.read_parquet's planning phase.
    # An earlier streaming formulation (map_batches -> streaming
    # repartition -> decode) drip-fed the decode operator through ONE
    # repartition task's generator backpressure (~50 ms per work item,
    # measured), serializing a 92-row-group file to ~5 s regardless of
    # CPU count; the eager list costs driver memory O(row groups) and
    # dispatches every decode task immediately.
    work = ray.data.from_items(items).map_batches(
        enumerate_row_groups, batch_size=64, batch_format="numpy",
        num_cpus=0.25).take_all()
    # one block per work item => one decode TASK per row group
    return ray.data.from_items(
        work, override_num_blocks=len(work)
    ).map_batches(decode_one, batch_size=1, batch_format="numpy",
                  concurrency=concurrency)
