"""pyarrow.fs routing for the JVM-less readers (X-10 substrate).

The table-stream source's planner and executors run in plain Python
processes (the Python DataSource API) — no Hadoop FileSystem handle. By
default they read manifests and parquet bytes with posix IO; this module
is the OBJECT-STORE SEAM: every such read can instead route through a
``pyarrow.fs.FileSystem`` resolved from a small FACTORY SPEC string that
travels in the stream's options (workers are fresh interpreters, so the
filesystem must be *reconstructible from a string*, never a pickled
live handle).

Specs:

* ``None`` / ``"local"`` — ``LocalFileSystem`` on the stripped path
  (the historical fast path; byte-for-byte the old behavior).
* ``"subtree:<base>"`` — ``SubTreeFileSystem`` rooted at ``base``: the
  non-posix rehearsal shape. Paths under ``base`` are addressed
  RELATIVE to it, so any posix assumption (os.path on absolute paths,
  os.replace, direct open()) fails loudly instead of silently passing.
* ``"latency:<ms>:<inner>"`` — a ``PyFileSystem`` handler that sleeps
  ``ms`` per metadata/open call around ``<inner>`` — the
  object-store-RTT rehearsal: correctness under slow listings and a
  measurable per-call budget (O(listings) planning cost shows up as
  wall time instead of hiding behind posix microseconds).

At 100 TB the same seam takes ``pyarrow.fs.S3FileSystem``/``GcsFileSystem``
specs; nothing in the reader distinguishes them from the rehearsal
filesystems. WRITES: the manifest layer's commit CAS is itself
pluggable (``io/commit_backend.py`` — a ConditionalPutBackend replaces
the create-exclusive link/rename with the If-None-Match conditional-PUT
shape rename-less stores expose); see docs/SCALE_LAYOUT.md for the
contract.
"""

from __future__ import annotations

import posixpath
import time
from typing import Any


def _strip_scheme(p: str) -> str:
    return p[len("file:"):] if p.startswith("file:") else p


def _latency_handler_cls():
    """The handler class, built lazily so importing this module never
    pays the pyarrow import (executor workers import it on use):
    pyarrow requires a real ``FileSystemHandler`` subclass, mixed with
    the plain-Python behavior base below."""
    from pyarrow import fs as pafs

    class _LatencyHandler(_LatencyBase, pafs.FileSystemHandler):
        pass

    return _LatencyHandler


class _LatencyBase:
    """FileSystemHandler adding a fixed sleep per filesystem call — the
    object-store-RTT rehearsal wrapper."""

    def __init__(self, inner, ms: float):
        self._inner = inner
        self._s = ms / 1000.0

    def _nap(self):
        time.sleep(self._s)

    # pyarrow.fs.FileSystemHandler interface ------------------------------
    def get_type_name(self):
        return f"latency({self._inner.type_name})"

    def get_file_info(self, paths):
        self._nap()
        return self._inner.get_file_info(paths)

    def get_file_info_selector(self, selector):
        self._nap()
        return self._inner.get_file_info(selector)

    def open_input_stream(self, path):
        self._nap()
        return self._inner.open_input_stream(path)

    def open_input_file(self, path):
        self._nap()
        return self._inner.open_input_file(path)

    def open_output_stream(self, path, metadata):
        self._nap()
        return self._inner.open_output_stream(path, metadata=metadata)

    def open_append_stream(self, path, metadata):
        self._nap()
        return self._inner.open_append_stream(path, metadata=metadata)

    def create_dir(self, path, recursive):
        self._nap()
        self._inner.create_dir(path, recursive=recursive)

    def delete_dir(self, path):
        self._nap()
        self._inner.delete_dir(path)

    def delete_dir_contents(self, path, missing_dir_ok=False):
        self._nap()
        self._inner.delete_dir_contents(path, missing_dir_ok=missing_dir_ok)

    def delete_root_dir_contents(self):
        self._nap()
        self._inner.delete_dir_contents("/", accept_root_dir=True)

    def delete_file(self, path):
        self._nap()
        self._inner.delete_file(path)

    def move(self, src, dest):
        self._nap()
        self._inner.move(src, dest)

    def copy_file(self, src, dest):
        self._nap()
        self._inner.copy_file(src, dest)

    def normalize_path(self, path):
        return self._inner.normalize_path(path)

    def __eq__(self, other):
        return isinstance(other, _LatencyHandler) and (
            self._inner,
            self._s,
        ) == (other._inner, other._s)

    def __ne__(self, other):
        return not self == other


def resolve(path: str, spec: str | None) -> tuple[Any, str]:
    """(pyarrow FileSystem, fs-relative path) for ``path`` under a
    factory spec. Import of pyarrow stays inside (executor workers only
    pay it when a stream actually reads)."""
    from pyarrow import fs as pafs

    p = _strip_scheme(path)
    if spec is None or spec == "local":
        return pafs.LocalFileSystem(), p
    if spec.startswith("subtree:"):
        base = _strip_scheme(spec[len("subtree:"):]).rstrip("/")
        if not (p == base or p.startswith(base + "/")):
            raise ValueError(
                f"pyfs: path {p!r} is outside the subtree base {base!r}"
            )
        rel = p[len(base):].lstrip("/") or "."
        return pafs.SubTreeFileSystem(base, pafs.LocalFileSystem()), rel
    if spec.startswith("latency:"):
        _, ms, inner = spec.split(":", 2)
        ifs, rel = resolve(path, inner or None)
        handler = _latency_handler_cls()(ifs, float(ms))
        return pafs.PyFileSystem(handler), rel
    raise ValueError(f"pyfs: unknown filesystem spec {spec!r}")


def read_bytes(path: str, spec: str | None) -> bytes:
    fs, p = resolve(path, spec)
    with fs.open_input_stream(p) as f:
        return f.read()


def write_bytes(path: str, data: bytes, spec: str | None) -> None:
    """Small-file write via create-temp-then-move (atomic on local and
    any store with atomic rename; last-writer-wins elsewhere — callers
    here are per-consumer sidecars, not the commit CAS)."""
    fs, p = resolve(path, spec)
    tmp = p + ".tmp"
    with fs.open_output_stream(tmp) as f:
        f.write(data)
    fs.move(tmp, p)


def listdir(path: str, spec: str | None) -> list[str]:
    """Base names of the directory's children; [] when absent."""
    from pyarrow import fs as pafs

    fs, p = resolve(path, spec)
    try:
        infos = fs.get_file_info(pafs.FileSelector(p, recursive=False))
    except (FileNotFoundError, OSError):
        return []
    return [posixpath.basename(i.path) for i in infos]


def listdir_or_raise(path: str, spec: str | None) -> list[str]:
    """Like `listdir`, but a MISSING directory raises FileNotFoundError
    (callers that must distinguish gone-from-retention from empty)."""
    from pyarrow import fs as pafs

    fs, p = resolve(path, spec)
    if fs.get_file_info(p).type == pafs.FileType.NotFound:
        raise FileNotFoundError(path)
    infos = fs.get_file_info(pafs.FileSelector(p, recursive=False))
    return [posixpath.basename(i.path) for i in infos]


def file_size(path: str, spec: str | None) -> int:
    fs, p = resolve(path, spec)
    info = fs.get_file_info(p)
    if info.size is None:
        raise FileNotFoundError(path)
    return info.size


def read_parquet(path: str, spec: str | None):
    """pyarrow Table for one parquet file/dir through the routed fs."""
    import pyarrow.parquet as pq

    fs, p = resolve(path, spec)
    return pq.read_table(p, filesystem=fs)
