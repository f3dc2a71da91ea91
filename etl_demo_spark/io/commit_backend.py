"""Pluggable COMMIT backends: the manifest publish primitive behind an
interface, so the one POSIX assumption left in the commit path — an
atomic create-exclusive rename/link — can be replaced by the
conditional-PUT shape object stores expose (S3 ``If-None-Match: *``,
GCS ``x-goods-if-generation-match: 0``, Azure ``If-None-Match: *``).

The manifest layer's correctness rests on exactly ONE primitive:

    publish(path, data) -> bool
        True  — this caller created ``path``; the full bytes are now
                visible to every reader.
        False — ``path`` already existed (another committer won this
                version); nothing was written.

Everything else (staging data files under token'd dirs, three-way
rebase, branch sub-logs, GC) already tolerates arbitrary interleaving —
`_commit_retry` re-resolves and retries on False. A backend therefore
only has to make ``publish`` atomic and exclusive.

Two implementations:

* the DEFAULT (no registration): `io/manifest._publish_cas`'s hard
  link / rename-without-overwrite — POSIX/HDFS semantics, unchanged.
* `ConditionalPutBackend` — the object-store shape: the CAS decision is
  an ``If-None-Match``-style conditional PUT against a `KeyStore`;
  exactly one concurrent PUT of a key succeeds. The winning bytes are
  then MIRRORED to the data plane (plain file write) so the rest of the
  engine — readers, streams, DuckDB oracles — sees the manifest at its
  normal path. On a real object store the PUT itself is both the
  decision and the visibility; here the `InMemoryKeyStore` fake
  arbitrates while the local filesystem plays the data plane, which is
  precisely the split a DynamoDB-locking S3 committer uses.

Rehearsal honesty: the fake store is process-local, so this backend
rehearses the SEMANTICS (atomicity, loser-sees-False, reader-never-torn)
for threaded writers in one process — the same scope as the threaded
OCC tests. Cross-process S3 deployment swaps `InMemoryKeyStore` for a
client implementing the same two-method `KeyStore` protocol over real
conditional PUTs; nothing else changes.

Reference cite: the reference engine (etl_weekly_trades.py) overwrites
its outputs with no commit protocol at all — this module is north-star
lakehouse substrate modeled on the public Iceberg/Delta commit designs.
"""

from __future__ import annotations

import os
import threading
from typing import Protocol


class KeyStore(Protocol):
    """The minimal conditional-PUT surface a backing store must offer."""

    def put_if_absent(self, key: str, data: bytes) -> bool:
        """Atomically create ``key`` with ``data``. True iff created by
        THIS call; False when the key already exists (the bytes are
        left untouched). The object-store mapping is a PUT with
        ``If-None-Match: *`` — success vs HTTP 412."""
        ...

    def get(self, key: str) -> bytes | None:
        ...


class InMemoryKeyStore:
    """Thread-safe fake object store for the commit rehearsal."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._objects: dict[str, bytes] = {}
        self.puts = 0          # total conditional-PUT attempts
        self.conflicts = 0     # attempts that lost (HTTP 412 analogue)

    def put_if_absent(self, key: str, data: bytes) -> bool:
        with self._lock:
            self.puts += 1
            if key in self._objects:
                self.conflicts += 1
                return False
            self._objects[key] = bytes(data)
            return True

    def get(self, key: str) -> bytes | None:
        with self._lock:
            return self._objects.get(key)

    def keys(self) -> list[str]:
        with self._lock:
            return sorted(self._objects)


class ConditionalPutBackend:
    """Commit publish via conditional PUT: the store arbitrates the CAS,
    the winner mirrors the bytes to the data plane."""

    def __init__(self, store: KeyStore) -> None:
        self.store = store

    def publish(self, path: str, data: bytes) -> bool:
        key = path if not path.startswith("file:") else path[len("file:"):]
        if not self.store.put_if_absent(key, data):
            return False
        # winner: make the manifest visible on the data plane. A single
        # writer (this one) owns the path now, so a plain write-temp +
        # replace is torn-read-free for posix readers.
        os.makedirs(os.path.dirname(key), exist_ok=True)
        tmp = f"{key}.{os.getpid()}.{threading.get_ident()}.put"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, key)
        return True
