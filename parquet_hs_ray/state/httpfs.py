"""Read-only HTTP range-request filesystem for pyarrow.

Reference parity: the reference reads remote Parquet files natively over
HTTP with byte-range requests (`remoteParquetFile`,
/root/reference/src/Parquet/Reader.hs:223-248 — HEAD for the size, then
ranged GETs per read). This module provides the same capability as a
``pyarrow.fs.PyFileSystem`` handler, so every fsio-threaded surface
(encode input, decode blobs if served, IVF index) can read straight off
an HTTP server: ``fs = http_range_filesystem("http://host:port")`` then
pass ``filesystem=fs`` with server-relative paths.

Stdlib-only (urllib): no extra dependencies, works against any server
that honors ``Range: bytes=a-b`` (object-store gateways, nginx, the test
suite's in-process server). Each ``read`` issues one ranged GET — the
access pattern Parquet wants (footer, then row-group/column slices);
callers that need full-file streaming get a single un-ranged GET via
``open_input_stream``.

Write/mutate operations raise ``NotImplementedError`` — HTTP is a source
here, exactly like the reference.
"""

from __future__ import annotations

import io
import posixpath
import urllib.request

import pyarrow as pa
import pyarrow.fs as pafs


def _head(url: str) -> int | None:
    """Content-Length via HEAD, or None if the resource is missing."""
    req = urllib.request.Request(url, method="HEAD")
    try:
        with urllib.request.urlopen(req) as r:
            cl = r.headers.get("Content-Length")
            return int(cl) if cl is not None else None
    except urllib.error.HTTPError:
        return None
    except urllib.error.URLError:
        return None


class _HttpRangeFile(io.RawIOBase):
    """Seekable read-only file over HTTP ranged GETs."""

    def __init__(self, url: str, size: int):
        self._url = url
        self._size = size
        self._pos = 0

    def readable(self) -> bool:
        return True

    def seekable(self) -> bool:
        return True

    def tell(self) -> int:
        return self._pos

    def seek(self, offset: int, whence: int = 0) -> int:
        base = {0: 0, 1: self._pos, 2: self._size}[whence]
        self._pos = max(0, base + offset)
        return self._pos

    @property
    def size(self) -> int:
        return self._size

    def read(self, n: int = -1) -> bytes:
        if n is None or n < 0:
            n = self._size - self._pos
        n = min(n, self._size - self._pos)
        if n <= 0:
            return b""
        req = urllib.request.Request(
            self._url, headers={"Range": f"bytes={self._pos}-{self._pos + n - 1}"}
        )
        with urllib.request.urlopen(req) as r:
            data = r.read()
        if len(data) > n:  # server ignored Range (200 full body): slice
            data = data[self._pos : self._pos + n]
        self._pos += len(data)
        return data


class HttpRangeHandler(pafs.FileSystemHandler):
    """pyarrow FileSystemHandler over a base URL; paths are URL-relative."""

    def __init__(self, base_url: str):
        self.base_url = base_url.rstrip("/")

    # -- identity / equality (used by pyarrow + pickling into Ray tasks) --
    def get_type_name(self) -> str:
        return f"httprange[{self.base_url}]"

    def __eq__(self, other) -> bool:
        return isinstance(other, HttpRangeHandler) and other.base_url == self.base_url

    def __ne__(self, other) -> bool:
        return not self.__eq__(other)

    def _url(self, path: str) -> str:
        return f"{self.base_url}/{path.lstrip('/')}"

    def normalize_path(self, path: str) -> str:
        return posixpath.normpath(path.lstrip("/")) if path else path

    def get_file_info(self, paths):
        infos = []
        for p in paths:
            size = _head(self._url(p))
            if size is None:
                infos.append(pafs.FileInfo(p, pafs.FileType.NotFound))
            else:
                infos.append(pafs.FileInfo(p, pafs.FileType.File, size=size))
        return infos

    def get_file_info_selector(self, selector):
        raise NotImplementedError("HTTP has no directory listing")

    def open_input_file(self, path: str):
        size = _head(self._url(path))
        if size is None:
            raise FileNotFoundError(self._url(path))
        return pa.PythonFile(_HttpRangeFile(self._url(path), size), mode="r")

    def open_input_stream(self, path: str):
        # single full-body GET; wrapped so pyarrow can stream it
        resp = urllib.request.urlopen(self._url(path))
        return pa.PythonFile(io.BytesIO(resp.read()), mode="r")

    # -- mutations: HTTP is a read-only source (like the reference) --
    def _ro(self, *a, **k):
        raise NotImplementedError("HttpRangeFileSystem is read-only")

    create_dir = delete_dir = delete_dir_contents = delete_root_dir_contents = _ro
    delete_file = move = copy_file = open_output_stream = open_append_stream = _ro


def http_range_filesystem(base_url: str) -> pafs.PyFileSystem:
    """A ``pyarrow.fs.FileSystem`` reading ``base_url``-relative paths via
    HTTP range requests."""
    return pafs.PyFileSystem(HttpRangeHandler(base_url))
