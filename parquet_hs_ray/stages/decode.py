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

from ..format import decode_table
from ..state import manifest as mf


class DecoderStage:
    """map_batches callable over manifest rows -> decoded Arrow tables.

    ``columns`` prunes frames at the byte level (length-delimited skip)."""

    def __init__(self, out_dir: str, columns: list[str] | None = None, filesystem=None):
        from ..memtune import ensure_process_tuned

        ensure_process_tuned()
        self.out_dir = out_dir
        self.columns = columns
        self.filesystem = filesystem

    def __call__(self, batch: dict) -> pa.Table:
        tables = []
        for pid in batch["partition_id"]:
            blob = mf.read_blob(self.out_dir, int(pid), self.filesystem)
            tables.append(decode_table(blob, self.columns))
        if not tables:
            return pa.table({})
        return pa.concat_tables(tables)
