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


# ---------------------------------------------------------------------------
# Real HTTP range source (VERDICT r2 #8): an in-process stdlib server that
# honors Range headers, driven end-to-end through encode -> decode -> verify.
# Reference parity: remoteParquetFile, /root/reference/src/Parquet/Reader.hs:223-248.
# ---------------------------------------------------------------------------

def _start_range_server(root: str):
    """(server, port, stats) — stats counts Range-headed GETs."""
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    stats = {"range_gets": 0, "full_gets": 0, "heads": 0}

    class Handler(BaseHTTPRequestHandler):
        def _file(self):
            p = os.path.normpath(os.path.join(root, self.path.lstrip("/")))
            if not p.startswith(os.path.abspath(root)) or not os.path.isfile(p):
                return None
            return p

        def do_HEAD(self):
            stats["heads"] += 1
            p = self._file()
            if p is None:
                self.send_error(404)
                return
            self.send_response(200)
            self.send_header("Content-Length", str(os.path.getsize(p)))
            self.send_header("Accept-Ranges", "bytes")
            self.end_headers()

        def do_GET(self):
            p = self._file()
            if p is None:
                self.send_error(404)
                return
            size = os.path.getsize(p)
            rng = self.headers.get("Range")
            with open(p, "rb") as f:
                if rng and rng.startswith("bytes="):
                    stats["range_gets"] += 1
                    a, _, b = rng[len("bytes="):].partition("-")
                    start = int(a)
                    end = min(int(b), size - 1) if b else size - 1
                    f.seek(start)
                    body = f.read(end - start + 1)
                    self.send_response(206)
                    self.send_header("Content-Range", f"bytes {start}-{end}/{size}")
                else:
                    stats["full_gets"] += 1
                    body = f.read()
                    self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        def log_message(self, *a):  # quiet
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, srv.server_address[1], stats


def test_encode_job_from_http_range_source(ray_session, tmp_path):
    """Encode straight off an HTTP server that serves byte ranges, then
    decode + per-partition verify against the same HTTP source. Asserts
    actual ranged GETs were used (not whole-file downloads per read)."""
    from parquet_hs_ray.pipelines.encode_job import (
        decode_dataset,
        encode_dataset,
        verify_roundtrip,
    )
    from parquet_hs_ray.state.httpfs import http_range_filesystem

    root = str(tmp_path / "srv")
    os.makedirs(root)
    tbl = pq.read_table(f"{SF}/lineitem.parquet")
    pq.write_table(tbl, f"{root}/lineitem.parquet", row_group_size=1000)
    srv, port, stats = _start_range_server(root)
    try:
        fs = http_range_filesystem(f"http://127.0.0.1:{port}")
        info = fs.get_file_info("lineitem.parquet")
        assert info.size == os.path.getsize(f"{root}/lineitem.parquet")

        out = str(tmp_path / "enc")
        res = encode_dataset("lineitem.parquet", out, token_col=None,
                             input_filesystem=fs, token_budget=1000)
        assert res["encoded"] >= 2
        assert stats["range_gets"] > 0  # real ranged reads happened

        back = decode_dataset(out).to_pandas().sort_values(
            "l_orderkey", kind="stable").reset_index(drop=True)
        assert len(back) == tbl.num_rows

        v = verify_roundtrip("lineitem.parquet", out, input_filesystem=fs)
        assert v["mismatched_partitions"] == 0 and v["rows"] == tbl.num_rows
    finally:
        srv.shutdown()


def test_parse_where_in_list_quote_aware():
    """ADVICE-r3: quoted values containing commas stay one value; the
    strict-regex shape rejects look-alikes into the scalar fallthrough."""
    import pytest

    from parquet_hs_ray.cli import _parse_where

    assert _parse_where("src in ('a, b', 'c')") == ("src", "in", ["a, b", "c"])
    assert _parse_where("x in (1, 2, 3)") == ("x", "in", [1, 2, 3])
    assert _parse_where("s IN ('hello world', \"x\")") == (
        "s", "in", ["hello world", "x"])
    assert _parse_where("n_tok >= 5") == ("n_tok", ">=", 5)
    # r4 review: empty IN list must not crash; a newline inside the list
    # body must not silently drop the values after it
    assert _parse_where("x in ()") == ("x", "in", [])
    assert _parse_where("x in (1,\n2)") == ("x", "in", [1, 2])
    with pytest.raises(SystemExit):
        _parse_where("col within (1,2)")


def test_file_lock_mutual_exclusion(tmp_path):
    """Two merging writers under fsio.file_lock serialize: concurrent
    write_delete_vector unions both survive (ADVICE-r3 lost-union)."""
    import threading

    import numpy as np

    from parquet_hs_ray.state import deletes as dvs

    out = str(tmp_path)
    barrier = threading.Barrier(2)

    def worker(lo):
        barrier.wait()
        for k in range(10):
            dvs.write_delete_vector(out, 7, np.array([lo + k], dtype=np.uint64))

    ts = [threading.Thread(target=worker, args=(lo,)) for lo in (0, 100)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    got = dvs.read_delete_vector(out, 7)
    want = sorted(list(range(10)) + list(range(100, 110)))
    assert got is not None and got.tolist() == want


def test_file_lock_dead_holder_releases(tmp_path):
    """flock semantics: a lock file left by a DEAD holder is acquirable
    immediately (the kernel released the flock when the holder's fd
    closed) — no staleness window, no age-based breaking.  The lock file
    itself persists by design (unlink-while-locked would let a third
    process lock a fresh inode at the same path)."""
    from parquet_hs_ray.state import fsio

    target = str(tmp_path / "x.bin")
    lockfile = target + ".lock"
    with open(lockfile, "w") as f:
        f.write("999999")  # a dead process's leftover lock file
    with fsio.file_lock(target, timeout=2.0):
        pass  # acquired instantly — no 'stale' wait
    assert os.path.exists(lockfile)  # file persists, by design


def test_file_lock_kill9_holder_releases(tmp_path):
    """A holder killed with SIGKILL mid-critical-section releases the
    flock automatically; a waiter acquires within its timeout."""
    import signal
    import subprocess
    import sys
    import time

    from parquet_hs_ray.state import fsio

    target = str(tmp_path / "y.bin")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.Popen(
        [sys.executable, "-c", (
            "import sys, time; sys.path.insert(0, %r);"
            "from parquet_hs_ray.state import fsio;"
            "lk = fsio.file_lock(%r, timeout=5.0); lk.__enter__();"
            "print('held', flush=True); time.sleep(60)" % (repo, target))],
        stdout=subprocess.PIPE, text=True)
    assert proc.stdout.readline().strip() == "held"
    t0 = time.monotonic()
    try:
        with fsio.file_lock(target, timeout=0.3):
            raise AssertionError("lock acquired while holder alive")
    except TimeoutError:
        pass
    proc.send_signal(signal.SIGKILL)
    proc.wait()
    with fsio.file_lock(target, timeout=5.0):
        pass  # released by the kernel on holder death
    assert time.monotonic() - t0 < 10
