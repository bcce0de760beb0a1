"""Remote-filesystem support (VERDICT r1 #1): blobs, manifest, and plan IO
must work through an arbitrary ``pyarrow.fs.FileSystem`` — on a multi-node
cluster workers cannot read each other's local disks. ``_MockFileSystem``
covers the in-process generic branches; ``SubTreeFileSystem`` (wrapping
local but NOT a ``LocalFileSystem`` instance, so it takes the generic
open_output_stream path) covers the full Ray-distributed job because its
state is shared through the real filesystem across worker processes.
"""

import json
import os

import pyarrow as pa
import pyarrow.fs as pafs
import pyarrow.parquet as pq
import pytest

from parquet_hs_ray.state import fsio
from parquet_hs_ray.state import manifest as mf

SF = "/root/testdata/sf0.001"


def test_fsio_mock_filesystem_roundtrip():
    fs = pafs._MockFileSystem()
    fsio.mkdirs("enc/blobs", fs)
    assert not fsio.exists("enc/blobs/x.blob", fs)
    fsio.write_atomic("enc/blobs/x.blob", b"hello", fs)
    assert fsio.exists("enc/blobs/x.blob", fs)
    assert fsio.read_bytes("enc/blobs/x.blob", fs) == b"hello"
    fsio.write_atomic("enc/blobs/y.blob", b"world", fs)
    assert fsio.list_files("enc/blobs", fs) == ["x.blob", "y.blob"]
    assert fsio.list_files("enc/missing", fs) == []


def test_manifest_on_mock_filesystem():
    fs = pafs._MockFileSystem()
    out = "job1"
    mf.ensure_dirs(out, fs)
    mf.write_blob_atomic(out, 3, b"blobdata", fs)
    assert mf.read_blob(out, 3, fs) == b"blobdata"
    entry = {"partition_id": 3, "status": "done", "row_count": 10, "n_tokens": 50,
             "raw_bytes": 100, "encoded_bytes": 8, "wall_ms": 1.0}
    mf.write_entry(out, entry, fs)
    loaded = mf.load_manifest(out, fs)
    assert loaded == [entry]
    assert mf.finished_ids(out, fs) == {3}
    # entry without blob is not finished
    mf.write_entry(out, dict(entry, partition_id=4), fs)
    assert mf.finished_ids(out, fs) == {3}
    # torn JSON entry is skipped, not fatal
    fsio.write_atomic(mf.entry_path(out, 5), b"{truncat", fs)
    assert [e["partition_id"] for e in mf.load_manifest(out, fs)] == [3, 4]
    s = mf.summary(out, fs)
    assert s["partitions"] == 2 and s["rows"] == 20


def test_plan_on_mock_filesystem():
    from parquet_hs_ray.plan import Partition, load_plan, save_plan

    fs = pafs._MockFileSystem()
    fsio.mkdirs("job", fs)
    plan = [Partition(0, "in.parquet", 0, 100, 5000)]
    save_plan(plan, "job/plan.json", fs)
    assert load_plan("job/plan.json", fs) == plan


def test_read_slice_from_mock_filesystem():
    """Remote *input*: parquet written into a mock fs reads back through
    read_slice/plan_file (the reference's remoteParquetFile analogue,
    /root/reference/src/Parquet/Reader.hs:223-248)."""
    from parquet_hs_ray.plan import plan_file
    from parquet_hs_ray.stages.encode import read_slice

    fs = pafs._MockFileSystem()
    fsio.mkdirs("data", fs)
    tbl = pq.read_table(f"{SF}/region.parquet")
    pq.write_table(tbl, "data/region.parquet", filesystem=fs)
    sl = read_slice("data/region.parquet", 1, 3, filesystem=fs)
    assert sl.equals(tbl.slice(1, 3))
    parts = plan_file("data/region.parquet", token_col=None, filesystem=fs)
    assert sum(p["row_count"] for p in parts) == tbl.num_rows


def test_encode_job_via_subtree_filesystem(ray_session, tmp_path):
    """Full encode -> resume -> decode -> verify through Ray workers with a
    non-local filesystem object for BOTH input and output. SubTreeFileSystem
    state is shared across processes via the underlying real fs, so this
    exercises exactly what shared cluster storage would."""
    from parquet_hs_ray.pipelines.encode_job import (
        decode_dataset,
        encode_dataset,
        verify_roundtrip,
    )

    root = str(tmp_path)
    os.makedirs(f"{root}/in")
    tbl = pq.read_table(f"{SF}/lineitem.parquet")
    pq.write_table(tbl, f"{root}/in/lineitem.parquet", row_group_size=1000)
    fs = pafs.SubTreeFileSystem(root, pafs.LocalFileSystem())

    res = encode_dataset("in", "enc", token_col=None, filesystem=fs,
                         input_filesystem=fs, token_budget=100_000)
    assert res["encoded"] >= 1
    # everything landed under the subtree via the generic write path
    assert os.path.isdir(f"{root}/enc/blobs") and os.path.isdir(f"{root}/enc/manifest")

    # resume: nothing to redo
    res2 = encode_dataset("in", "enc", token_col=None, filesystem=fs,
                          input_filesystem=fs, token_budget=100_000)
    assert res2["encoded"] == 0 and res2["skipped_finished"] == res["planned"]

    # delete one blob -> exactly one partition re-encodes
    blobs = sorted(os.listdir(f"{root}/enc/blobs"))
    os.remove(f"{root}/enc/blobs/{blobs[0]}")
    res3 = encode_dataset("in", "enc", token_col=None, filesystem=fs,
                          input_filesystem=fs, token_budget=100_000)
    assert res3["encoded"] == 1

    out = decode_dataset("enc", filesystem=fs)
    back = pa.Table.from_pandas(
        out.to_pandas().sort_values("l_orderkey", kind="stable").reset_index(drop=True),
        preserve_index=False,
    )
    assert back.num_rows == tbl.num_rows

    v = verify_roundtrip("in", "enc", filesystem=fs, input_filesystem=fs)
    assert v["mismatched_partitions"] == 0 and v["rows"] == tbl.num_rows


def test_fsio_file_uri_resolution(tmp_path):
    """file:// URIs resolve to LocalFileSystem and round-trip."""
    p = f"file://{tmp_path}/sub/x.bin"
    fsio.mkdirs(f"file://{tmp_path}/sub")
    fsio.write_atomic(p, b"data")
    assert fsio.exists(p)
    assert fsio.read_bytes(p) == b"data"
    assert fsio.list_files(f"file://{tmp_path}/sub") == ["x.bin"]
