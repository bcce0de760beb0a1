"""Decoder stage: the inverse ``map_batches`` path.

Our analogue of the reference's column-chunk streaming decode
(`sourceColumnChunk`, `/root/reference/src/Parquet/Reader.hs:714-733` →
`readColumnChunk`/`readPage`, `Stream/Reader.hs:324-372`): one task per
encoded partition reads the blob and decodes every column frame back into
one Arrow table — columnar in, columnar out; the reference's row-assembly
step (Dremel instruction interpreter, `Reader.hs:637-705`) has no analogue
because Arrow list offsets + validity ARE the assembled representation.

Stateless — plain-function tasks, no actor pool needed (no cross-batch
state; dictionaries/symbol tables are self-contained in each blob)."""

from __future__ import annotations

import pyarrow as pa

from ..format import blob_schema, decode_table
from ..state import manifest as mf


class DecoderStage:
    """map_batches callable over manifest rows -> decoded Arrow tables.

    ``columns`` prunes frames at the byte level (length-delimited skip)."""

    def __init__(self, out_dir: str, columns: list[str] | None = None, filesystem=None,
                 predicate: list | None = None):
        from ..memtune import ensure_process_tuned

        ensure_process_tuned()
        self.out_dir = out_dir
        self.columns = columns
        self.filesystem = filesystem
        self.predicate = predicate or []

    def _mask(self, t: pa.Table):
        import pyarrow.compute as pc

        mask = None
        for col, op, v in self.predicate:
            c = t[col]
            if op == "is_null":
                part = pc.is_null(c)
            elif op == "is_not_null":
                part = pc.is_valid(c)
            else:
                m = {"==": pc.equal, "<": pc.less, "<=": pc.less_equal,
                     ">": pc.greater, ">=": pc.greater_equal}.get(op)
                part = m(c, v) if m else pc.and_(pc.greater_equal(c, v[0]),
                                                 pc.less_equal(c, v[1]))
            mask = part if mask is None else pc.and_(mask, part)
        return mask

    def __call__(self, batch: dict) -> pa.Table:
        import zlib

        import pyarrow.compute as pc

        crcs = batch.get("crc32")
        tables = []
        out_schema: pa.Schema | None = None
        for i, pid in enumerate(batch["partition_id"]):
            blob = mf.read_blob(self.out_dir, int(pid), self.filesystem)
            if crcs is not None and int(crcs[i]) >= 0 and zlib.crc32(blob) != int(crcs[i]):
                raise ValueError(
                    f"partition {int(pid)}: blob checksum mismatch (corrupt or "
                    f"partially written blob; manifest crc32={int(crcs[i])})"
                )
            if self.predicate:
                # two-phase: decode only the predicate columns (byte-level
                # frame skip), full-decode only partitions with matches
                pred_cols = sorted({p[0] for p in self.predicate})
                mask = self._mask(decode_table(blob, pred_cols))
                n_match = int(pc.sum(mask).as_py() or 0)
                if n_match == 0:
                    if out_schema is None:
                        out_schema = self._pruned_schema(blob_schema(blob))
                    continue
                t = decode_table(blob, self.columns)
                tables.append(t if n_match == t.num_rows else t.filter(mask))
            else:
                tables.append(decode_table(blob, self.columns))
        if not tables:
            # every partition in this batch was fully pruned: emit a
            # zero-ROW table with the blob's real schema (never a
            # zero-COLUMN table — those poison downstream schema
            # unification and trip Ray's schema-change warning)
            if out_schema is not None:
                return out_schema.empty_table()
            return pa.table({})
        return pa.concat_tables(tables)

    def _pruned_schema(self, schema: pa.Schema) -> pa.Schema:
        if self.columns is None:
            return schema
        keep = set(self.columns)
        # blob frame order == schema field order == decode_table output order
        return pa.schema([f for f in schema if f.name in keep])
