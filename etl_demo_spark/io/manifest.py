"""Snapshot-manifest mode for partition-scoped MERGE: concurrent readers
NEVER observe a missing partition.

The plain swap in `io/tables.py` retires a partition dir and renames the
staged one in; a reader that lists the table between the two renames sees
the partition vanish (documented there as the residual visibility window).
This module closes that window the way table formats do — with a pointer
file — while keeping the data plain parquet:

  * every partition leaf's files live in a VERSION SUBDIR:
    ``dt=d1/seg=A/__v0000000007/part-*.parquet``;
  * a manifest ``_manifests/v{N}.json`` maps each logical leaf
    (``dt=d1/seg=A``) to its current version subdir;
  * readers resolve the highest manifest and scan exactly the listed
    subdirs (one Spark read with ``basePath`` — partition columns are
    still parsed from the ``k=v`` path segments; the ``__v…`` leaf
    segment is opaque to partition discovery, verified by test);
  * a merge writes NEW version subdirs for the affected leaves only,
    then publishes manifest N+1 in one atomic create+rename. Old data is
    never renamed or deleted at commit time, so a reader that resolved
    manifest N mid-merge keeps reading N's subdirs untouched;
  * superseded version subdirs (and manifests) are garbage-collected at
    the START of a later merge, with a two-manifest retention window —
    the same deferred-delete grace period Iceberg/Delta give in-flight
    readers via snapshot expiry;
  * commit METADATA is O(change), not O(table): a commit publishes a
    DELTA manifest (changed/removed leaves + new-file stats + a parent
    pointer) until the chain reaches ``_FULL_EVERY``, then a full
    snapshot manifest resets it — Delta Lake's log/checkpoint split.
    Readers materialize state by walking at most ``_FULL_EVERY`` small
    files; GC keeps retained versions' ancestor chains as metadata-only
    survivors while still reclaiming their superseded data.

Crash consistency is STRONGER than the rename swap: the commit point is
a single atomic manifest-file publish. A crash before it leaves only
unreferenced ``__v`` orphans (GC'd by a later commit once they outlive
the orphan grace window); a crash after it is a completed merge. No
holding pen, no recovery sweep, no half-swapped state.

MULTI-WRITER: commits are optimistic-concurrency transactions. Every
committer (merge / delete / compact) resolves the latest snapshot,
stages its new version subdirs under an attempt-unique token (two
writers can never collide on a directory name), then publishes
``v{N+1}.json`` with a compare-and-swap primitive (`_publish_cas`):
exactly one writer wins each version; the loser drops its staged dirs
and re-runs the whole transaction against the winner's snapshot — the
standard snapshot-format commit protocol (Iceberg/Delta), so OPTIMIZE,
retention DELETE, and CDC ingest can share a table without a committer
silently clobbering another's snapshot. Unreferenced staging is
protected from a concurrent committer's GC by a modification-time grace
window (`_ORPHAN_GRACE_MS`) — the same reasoning as Iceberg's orphan-
file-removal age threshold.

Cite: the reference (`etl_weekly_trades.py`) has no concurrent-reader
story at all (SQLite append). This is the engine-grade answer short of
adopting a full table format.
"""

from __future__ import annotations

import base64
import contextvars as _contextvars
from contextlib import contextmanager as _contextmanager
import json
import math
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_demo_spark.io.tables import (
    _hadoop_fs,
    _mkdirs_parent,
    _normalize_partition_cols,
    _part_rel,
    affected_partitions,
    _partition_filter,
)

_MANIFEST_DIR = "_manifests"
_RETAIN = 2  # manifests (and their data) kept for in-flight readers
_COMMIT_RETRIES = 5  # optimistic-concurrency attempts before giving up
# Delta-manifest chain bound: commits write only their CHANGED leaves plus a
# parent pointer (metadata cost O(change), not O(table)) until the chain
# reaches this length, then a full snapshot manifest resets it — Delta
# Lake's log/checkpoint split. Resolution walks at most this many files.
_FULL_EVERY = 8
# Unreferenced __v dirs younger than this are presumed in-flight staging of
# a concurrent committer and are NOT garbage-collected (Iceberg's orphan-file
# age-threshold rationale). Crashed attempts are reclaimed once they age out.
_ORPHAN_GRACE_MS = 5 * 60 * 1000
# Deletion-vector datasets live under <root>/_dv/__v{N}-{token}: one parquet
# dataset per DV commit holding every (file_rel, pos) deleted as of that
# snapshot. Cumulative by construction, bounded by compaction (a rewrite
# materializes the deletions and the pointer's entries for those files drop).
_DV_DIR = "_dv"
_DV_SCHEMA = "file_rel STRING, pos BIGINT"
# Row-level CHANGE-DATA sidecars (Delta CDF's _change_data): rewrite
# committers on change_feed=true tables record their commit's exact
# delete/insert rows under <root>/_changes/__v{N}-{token}, referenced
# per-commit as `change_data` in the manifest — the table stream then
# delivers updates/deletes instead of refusing the commit, and a
# compaction (row no-op) records an explicitly EMPTY change set so the
# stream glides through maintenance. Same lifecycle as DV datasets.
_CHANGES_DIR = "_changes"


# --- branches (write-audit-publish) ----------------------------------------
# A BRANCH is a writable named ref: its commits continue the version
# numbering from the base but live in a sub-log
# (`_manifests/branches/<name>/`), so the MAIN chain — what every
# reader, stream, and catalog pin resolves — never sees them until
# `branch_fastforward` publishes the branch head as one main commit
# (zero data movement: branch commits staged their files under the
# table root all along). The active branch is carried in a contextvar
# keyed by table root (`use_branch`), consulted by the three path/
# listing chokepoints below, so every committer and reader in this
# module is branch-capable without signature changes.
_BRANCH_SUBDIR = "branches"

_BRANCH_CTX: _contextvars.ContextVar[dict | None] = _contextvars.ContextVar(
    "manifest_branch_ctx", default=None
)


def _branch_key(root: str) -> str:
    """Context key for a table root — scheme-normalized so
    ``use_branch('file:/x/t')`` and a committer called with ``/x/t``
    (or vice versa) resolve the SAME branch; a miss here would silently
    publish a 'branch' commit straight to main."""
    return _strip_scheme(root).rstrip("/")


def _branch_of(root: str) -> tuple[str, int] | None:
    """(branch name, base version) active for ``root``, or None."""
    ctx = _BRANCH_CTX.get()
    if not ctx:
        return None
    return ctx.get(_branch_key(root))


def _branch_dir(root: str, name: str) -> str:
    return f"{root.rstrip('/')}/{_MANIFEST_DIR}/{_BRANCH_SUBDIR}/{name}"


def _manifest_path(root: str, version: int) -> str:
    b = _branch_of(root)
    if b is not None and version > b[1]:
        return f"{_branch_dir(root, b[0])}/v{version:010d}.json"
    return f"{root.rstrip('/')}/{_MANIFEST_DIR}/v{version:010d}.json"


def _vdir(version: int, token: str | None = None) -> str:
    """Version-subdir name. ``token`` (attempt-unique) guarantees two
    concurrent committers staging the same target version for the same
    leaf can never collide on a directory — the manifest maps leaves to
    vrels explicitly, so the name itself is opaque to readers."""
    base = f"__v{version:010d}"
    return f"{base}-{token}" if token else base


# scheme memo for the local-FS read fast path below: FileSystem.get
# caches instances per scheme, so the py4j target id is stable and one
# getScheme() probe per handle suffices
_FS_SCHEME_MEMO: dict[str, str] = {}


def _posix_path_of(fs, path: str) -> str | None:
    """Return the plain-posix path when ``path`` provably lives on the
    LOCAL filesystem, else None. Metadata reads through the Hadoop FS
    API cost ~3 py4j roundtrips (~9 ms each on this host) per small
    JSON file; a merge commit resolves dozens of immutable manifest
    files, so on local tables those reads go straight through posix IO
    (~0.05 ms) — the same JVM-less branch the table-stream reader
    already uses. Explicit non-file schemes (hdfs://, s3a://…) and
    scheme-less paths on a non-local default FS keep the JVM path;
    WRITES always keep the JVM path (atomicity semantics live there)."""
    if path.startswith("file:"):
        return path[len("file:"):]
    if not path.startswith("/"):
        return None
    try:
        key = fs._target_id
    except Exception:
        key = None
    scheme = _FS_SCHEME_MEMO.get(key)
    if scheme is None:
        try:
            scheme = str(fs.getScheme())
        except Exception:
            return None
        if key is not None:
            _FS_SCHEME_MEMO[key] = scheme
    return path if scheme == "file" else None


def _read_file(fs, jvm, path: str) -> bytes:
    """Read a small (manifest-sized) file through the Hadoop FS API — the
    commons-io helper shipped with the Hadoop client pulls the whole
    stream in one py4j round trip instead of a call per byte.

    ``fs=None`` falls back to plain-posix IO: the table-stream source's
    reader runs in a driver-side Python process with no JVM handle (the
    Python DataSource API), and manifest resolution there only ever
    READS small JSON files. A STRING ``fs`` is a `io.pyfs` factory spec
    — the object-store seam for those JVM-less readers: the same reads
    route through a ``pyarrow.fs.FileSystem`` reconstructed from the
    spec (SubTreeFileSystem / latency wrapper in the rehearsal; S3/GCS
    at scale)."""
    if isinstance(fs, str):
        from etl_demo_spark.io.pyfs import read_bytes

        return read_bytes(path, fs)
    if fs is None:
        with open(_strip_scheme(path), "rb") as f:
            return f.read()
    posix = _posix_path_of(fs, path)
    if posix is not None:
        with open(posix, "rb") as f:
            return f.read()
    stream = fs.open(jvm.org.apache.hadoop.fs.Path(path))
    try:
        return bytes(jvm.org.apache.commons.io.IOUtils.toByteArray(stream))
    finally:
        stream.close()


def _strip_scheme(p: str) -> str:
    return p[len("file:"):] if p.startswith("file:") else p


# --- pluggable commit backends ---------------------------------------------
# The publish primitive is the commit path's ONE atomicity requirement;
# a registered backend (io/commit_backend.py) replaces the POSIX
# link/rename CAS with e.g. the conditional-PUT shape object stores
# expose. Keyed by table root, longest-prefix matched so branch
# sub-logs and stats files under the root route through the same
# backend.
_COMMIT_BACKENDS: dict[str, object] = {}


def set_commit_backend(root: str, backend) -> None:
    """Route every manifest publish under ``root`` through ``backend``
    (an object with ``publish(path, data) -> bool``); ``None`` restores
    the default link/rename CAS."""
    key = _strip_scheme(root).rstrip("/")
    if backend is None:
        _COMMIT_BACKENDS.pop(key, None)
    else:
        _COMMIT_BACKENDS[key] = backend


def _backend_for(path: str):
    if not _COMMIT_BACKENDS:
        return None
    p = _strip_scheme(path)
    best = None
    for key, b in _COMMIT_BACKENDS.items():
        if (p == key or p.startswith(key + "/")) and (
            best is None or len(key) > len(best[0])
        ):
            best = (key, b)
    return best[1] if best else None


def _publish_cas(fs, jvm, path: str, data: bytes) -> bool:
    """Atomic compare-and-swap publish of a manifest: the FULL content is
    written to an attempt-unique temp file first, then moved to the final
    name with create-exclusive semantics — exactly one of any number of
    concurrent committers wins a given version (the losers get False and
    re-resolve), and a reader can never observe a torn manifest: the
    final path either doesn't exist or holds the complete bytes.

    Local filesystems publish via a POSIX hard link (atomic; fails with
    FileAlreadyExistsException if the target exists). HDFS publishes via
    rename-without-overwrite (returns false when the destination exists
    — the FileSystem contract). Rename-less object stores register a
    `ConditionalPutBackend` (io/commit_backend.py) via
    `set_commit_backend` — the CAS decision becomes an If-None-Match
    conditional PUT; everything above this primitive is unchanged."""
    backend = _backend_for(path)
    if backend is not None:
        return bool(backend.publish(path, data))
    tmp = f"{path}.{uuid.uuid4().hex[:8]}.tmp"
    p_tmp = jvm.org.apache.hadoop.fs.Path(tmp)
    _mkdirs_parent(fs, jvm, path)
    stream = fs.create(p_tmp, True)
    try:
        stream.write(bytearray(data))
    finally:
        stream.close()
    try:
        if fs.getUri().getScheme() == "file":
            def topath(s: str):
                return jvm.java.io.File(_strip_scheme(s)).toPath()

            try:
                jvm.java.nio.file.Files.createLink(topath(path), topath(tmp))
                return True
            except Exception as e:  # py4j surfaces the Java exception
                jexc = getattr(e, "java_exception", None)
                if jexc is not None and "FileAlreadyExistsException" in (
                    jexc.getClass().getName()
                ):
                    return False
                raise
        return bool(fs.rename(p_tmp, jvm.org.apache.hadoop.fs.Path(path)))
    finally:
        fs.delete(p_tmp, False)


def _next_version(fs, jvm, root: str) -> int:
    versions = _list_manifest_versions(fs, jvm, root)
    return (versions[-1] if versions else 0) + 1


def _clean_stale_staging(fs, jvm, root: str) -> None:
    """Reclaim crashed committers' sibling staging dirs
    (``<root>.__manifest_staging__<token>``) once past the grace window;
    young ones belong to in-flight concurrent commits."""
    roots = root.rstrip("/")
    parent = jvm.org.apache.hadoop.fs.Path(roots).getParent()
    if parent is None or not fs.exists(parent):
        return
    marker = jvm.org.apache.hadoop.fs.Path(roots).getName() + ".__manifest_staging__"
    cutoff = int(time.time() * 1000) - _ORPHAN_GRACE_MS
    for st in fs.listStatus(parent):
        name = st.getPath().getName()
        if (
            st.isDirectory()
            and name.startswith(marker)
            and st.getModificationTime() < cutoff
        ):
            fs.delete(st.getPath(), True)


def _commit_retry(fs, jvm, root: str, attempt_fn):
    """Optimistic-concurrency loop shared by every manifest committer,
    with COMMIT-TIME CONFLICT DETECTION (the Delta/Iceberg shape).

    ``attempt_fn(doc, new_version, token)`` runs ONE full transaction
    attempt against the resolved snapshot ``doc`` — stage data under
    token'd version subdirs, build the new manifest, `_publish_cas` it —
    and returns ``(published, staged_vrels, result)`` or, for
    rebase-capable committers, ``(published, staged_vrels, result,
    new_doc)`` where ``new_doc`` is the fully-materialized manifest the
    attempt built.

    On a lost race a rebase-capable transaction is first CLASSIFIED
    against the winner's commit(s) (`_rebase_conflict`): two pure
    appends never conflict, and rewrites conflict only when their
    touched-leaf sets intersect the winner's. A non-conflicting loser
    REPUBLISHES its already-staged files onto the new snapshot
    (`_rebase_doc` three-way merge, one new CAS) — zero data bytes
    rewritten. Only a true conflict (overlapping leaves, config/DV
    changes) drops the staged dirs and re-runs the whole transaction
    against the winner's snapshot, so writers touching the same leaf
    still serialize correctly."""
    for _ in range(_COMMIT_RETRIES):
        doc = _load_doc(fs, jvm, root)
        # NOT a second listing: a commit landing between two listings
        # would hand this attempt version head+2 with parent head,
        # silently orphaning head+1. The resolved doc IS the head.
        new_version = doc["version"] + 1
        token = uuid.uuid4().hex[:8]
        out = attempt_fn(doc, new_version, token)
        published, staged, result = out[:3]
        new_doc = out[3] if len(out) > 3 else None
        if published:
            return result
        occ_stats["cas_lost"] += 1
        if new_doc is not None and _REBASE_ENABLED:
            landed = _rebase_publish(fs, jvm, root, doc, new_doc)
            if landed:
                occ_stats["rebased"] += 1
                return result
        occ_stats["reran"] += 1
        for vrel in staged:
            fs.delete(
                jvm.org.apache.hadoop.fs.Path(f"{root.rstrip('/')}/{vrel}"), True
            )
    raise RuntimeError(
        f"manifest commit for {root} lost the optimistic race "
        f"{_COMMIT_RETRIES} times; retry under less write contention"
    )


def _list_dir_versions(fs, jvm, mdir: str) -> list[int]:
    if isinstance(fs, str):  # pyfs factory spec (see _read_file)
        from etl_demo_spark.io.pyfs import listdir

        names = listdir(mdir, fs)
    elif fs is None:  # plain-posix listing for JVM-less readers
        import os

        try:
            names = os.listdir(_strip_scheme(mdir))
        except FileNotFoundError:
            return []
    else:
        posix = _posix_path_of(fs, mdir)
        if posix is not None:
            import os

            try:
                names = os.listdir(posix)
            except FileNotFoundError:
                return []
        else:
            mdir_p = jvm.org.apache.hadoop.fs.Path(mdir)
            if not fs.exists(mdir_p):
                return []
            names = [st.getPath().getName() for st in fs.listStatus(mdir_p)]
    versions = []
    for name in names:
        if name.startswith("v") and name.endswith(".json"):
            try:
                versions.append(int(name[1:-5]))
            except ValueError:
                continue
    return sorted(versions)


def _list_manifest_versions(fs, jvm, root: str) -> list[int]:
    main = _list_dir_versions(fs, jvm, f"{root.rstrip('/')}/{_MANIFEST_DIR}")
    b = _branch_of(root)
    if b is None:
        return main
    name, base = b
    branch = _list_dir_versions(fs, jvm, _branch_dir(root, name))
    # the branch view: main history up to the fork point, then the
    # branch's own commits — main commits after the fork are invisible
    return [v for v in main if v <= base] + branch


def _stat_val(v):
    """JSON-encodable, ORDER-PRESERVING image of a column min/max:
    numbers stay numbers, dates/timestamps become ISO strings (which
    compare lexicographically in the same order), everything else
    stringifies."""
    if v is None or isinstance(v, (int, float, str, bool)):
        return v
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return str(v)


_TRANSFORM_RE = (
    r"^(identity|years|months|days|hours|bucket|truncate)"
    r"\((?:(\d+)\s*,\s*)?([A-Za-z_][A-Za-z0-9_]*)\)$"
)


def _parse_transform(spec: str) -> tuple[str, int | None, str]:
    """('days', None, 'ts') / ('bucket', 8, 'id') from a spec string.
    The grammar is Iceberg's partition-transform family."""
    import re as _re

    m = _re.match(_TRANSFORM_RE, spec.strip())
    if not m:
        raise ValueError(
            f"bad partition transform {spec!r}; expected identity(col), "
            "years|months|days|hours(col), bucket(N, col) or "
            "truncate(N, col)"
        )
    kind, n, col = m.group(1), m.group(2), m.group(3)
    if kind in ("bucket", "truncate"):
        if n is None:
            raise ValueError(f"{kind} transform needs N: {spec!r}")
        return kind, int(n), col
    if n is not None:
        raise ValueError(f"{kind} transform takes no N: {spec!r}")
    return kind, None, col


_TIME_FMT = {
    "years": "yyyy",
    "months": "yyyy-MM",
    "days": "yyyy-MM-dd",
    "hours": "yyyy-MM-dd-HH",
}
_TIME_PYFMT = {
    "years": "%Y",
    "months": "%Y-%m",
    "days": "%Y-%m-%d",
    "hours": "%Y-%m-%d-%H",
}


def _transform_expr(spec: str, df: DataFrame):
    """The DERIVED partition column for one transform spec, as a
    Catalyst expression over ``df``'s source column. String-typed output
    for the time/truncate-string family (it becomes a directory name);
    int for bucket/int-truncate."""
    kind, n, col = _parse_transform(spec)
    c = F.col(col)
    if kind == "identity":
        return c
    if kind in _TIME_FMT:
        return F.date_format(c, _TIME_FMT[kind])
    if kind == "bucket":
        # same hash convention as the bloom tier: xxhash64 over the
        # string rendering, so the Python prune side can replay it with
        # a 1-row Spark job and never re-implement the JVM hash
        return F.pmod(F.xxhash64(c.cast("string")), F.lit(n)).cast("int")
    # truncate
    dtype = dict(df.dtypes).get(col, "")
    if dtype in ("tinyint", "smallint", "int", "bigint"):
        return (c - F.pmod(c, F.lit(n))).cast("long")
    return F.substring(c, 1, n)


def _transform_points(
    spark: SparkSession, spec: str, value
) -> list[str] | None:
    """Directory-value strings a POINT predicate on the source column
    maps to under the transform — always a single value; None when the
    transform can't serve it."""
    kind, n, col = _parse_transform(spec)
    if value is None:
        return None
    if kind == "identity":
        return [str(value)]
    if kind in _TIME_PYFMT:
        ts = _coerce_ts(value)
        return None if ts is None else [ts.strftime(_TIME_PYFMT[kind])]
    if kind == "bucket":
        row = (
            spark.range(1)
            .select(
                F.pmod(F.xxhash64(F.lit(str(value))), F.lit(n)).alias("b")
            )
            .first()
        )
        return [str(int(row["b"]))]
    if isinstance(value, int):
        return [str(value - (value % n))]
    return [str(value)[:n]]


def _transform_range(spec: str, lo, hi, cap: int = 4096) -> list[str] | None:
    """Directory-value strings a RANGE predicate [lo, hi] on the source
    column maps to — an enumeration of the covered periods / truncation
    buckets, or None when the transform can't serve ranges (bucket) or
    the enumeration would exceed ``cap`` (pruning is an optimization;
    an unserved predicate just keeps every leaf)."""
    import datetime as _dt

    kind, n, col = _parse_transform(spec)
    if kind == "bucket" or lo is None or hi is None:
        return None
    if kind == "identity":
        return None  # leaf_filter handles identity values directly
    if kind in _TIME_PYFMT:
        t0, t1 = _coerce_ts(lo), _coerce_ts(hi)
        if t0 is None or t1 is None or t1 < t0:
            return None
        step = {
            "hours": _dt.timedelta(hours=1),
            "days": _dt.timedelta(days=1),
        }.get(kind)
        out, seen = [], set()
        if step is None:  # months / years: walk month starts
            y, m = t0.year, t0.month
            while (y, m) <= (t1.year, t1.month):
                s = (
                    f"{y:04d}" if kind == "years" else f"{y:04d}-{m:02d}"
                )
                if s not in seen:
                    seen.add(s)
                    out.append(s)
                m += 1
                if m == 13:
                    y, m = y + 1, 1
                if len(out) > cap:
                    return None
            return out
        t = t0
        while t <= t1:
            s = t.strftime(_TIME_PYFMT[kind])
            if s not in seen:
                seen.add(s)
                out.append(s)
                if len(out) > cap:
                    return None
            t = t + step
        tail = t1.strftime(_TIME_PYFMT[kind])
        if tail not in seen:
            out.append(tail)
        return out
    # truncate
    if isinstance(lo, int) and isinstance(hi, int):
        start, stop = lo - (lo % n), hi - (hi % n)
        if (stop - start) // n + 1 > cap:
            return None
        return [str(v) for v in range(start, stop + n, n)]
    return None


def _coerce_ts(v):
    import datetime as _dt

    if isinstance(v, _dt.datetime):
        return v
    if isinstance(v, _dt.date):
        return _dt.datetime(v.year, v.month, v.day)
    if isinstance(v, str):
        for fmt in (
            "%Y-%m-%d %H:%M:%S",
            "%Y-%m-%dT%H:%M:%S",
            "%Y-%m-%d",
        ):
            try:
                return _dt.datetime.strptime(v, fmt)
            except ValueError:
                continue
    return None


def _bloom_bits_for(ndv: int, k: int, fpr: float, bits_max: int) -> int | None:
    """Bitset size for a file holding ``ndv`` distinct values: the
    smallest power of two giving the target false-positive rate with k
    probes (bits/key = -k / ln(1 - fpr^(1/k)); ~10.5 at fpr=1%, k=4),
    clamped to [256, bits_max]. Returns None when even ``bits_max``
    leaves < 2 bits/key (FPR ≥ ~60%) — a saturated bitset prunes
    nothing, so storing it would be pure manifest bloat."""
    ndv = max(1, int(ndv))
    if bits_max < 2 * ndv:
        return None
    bits_per_key = -k / math.log(1.0 - fpr ** (1.0 / k))
    target = max(256, int(math.ceil(bits_per_key * ndv)))
    bits = 1
    while bits < target:
        bits <<= 1
    return min(bits, bits_max)


def _pack_words(words: list[int]) -> str:
    """Base64 little-endian int64 packing for a bloom bitset — ~3×
    smaller in the JSON manifest than a digit list, and O(1) to parse."""
    return base64.b64encode(
        b"".join((w & 0xFFFFFFFFFFFFFFFF).to_bytes(8, "little") for w in words)
    ).decode("ascii")


def _unpack_words(blob) -> list[int]:
    """Accept both bitset encodings: legacy int list and packed base64."""
    if isinstance(blob, list):
        return [int(w) for w in blob]
    raw = base64.b64decode(blob)
    return [
        int.from_bytes(raw[i : i + 8], "little") for i in range(0, len(raw), 8)
    ]


def _fold_words(words: list[int], target_bits: int) -> list[int]:
    """Fold a power-of-two bitset down to ``target_bits`` by OR-ing
    halves. Valid because positions are ``pmod(hash, bits)`` with bits a
    power of two: ``h mod 2^m  mod 2^(m-1) == h mod 2^(m-1)``, and word
    granularity (64) divides every size involved — so the folded bitset
    is bit-identical to one built directly at the smaller size."""
    tw = target_bits // 64
    while len(words) > tw:
        half = len(words) // 2
        words = [words[i] | words[i + half] for i in range(half)]
    return words


def _bloom_word_aggs(col: str, bits: int, k: int, key: str | None = None) -> list:
    """bits//64 BIT_OR aggregates building a per-file bloom bitset for
    ``col``: each row contributes k set bits (JVM-side shift/or folds, no
    Python — the DataFrame `shiftleft` wrapper only takes literal shift
    amounts, so the dynamic shift is an SQL expression); NULLs set no
    bits so a NULL probe can't alias. ``key`` names the output aliases
    (the LOGICAL column under an active column mapping, where ``col`` is
    the on-disk physical name)."""
    key = key or col
    pexprs = [
        f"pmod(xxhash64(cast({col} as string), {i}), {bits})" for i in range(k)
    ]
    aggs = []
    for w in range(bits // 64):
        parts = [
            f"(case when {col} is not null and ({p} div 64) = {w} "
            f"then shiftleft(cast(1 as bigint), cast({p} % 64 as int)) "
            f"else cast(0 as bigint) end)"
            for p in pexprs
        ]
        row_word = " | ".join(parts)
        aggs.append(F.bit_or(F.expr(row_word)).alias(f"__bw_{key}_{w}"))
    return aggs


def _validate_bloom_config(
    bloom_bits: int | None, bloom_bits_max: int | None
) -> None:
    """The fold/mask identity (`p & (nbits-1)` == `pmod(h, nbits)` at a
    power-of-two width, words materialized as `range(bits // 64)`) only
    holds when the build width is a power of two. A non-power-of-two
    value would silently drop set bits and mis-mask probes — wrong file
    PRUNING (missing rows), not an error — so refuse it up front."""
    if bloom_bits_max is not None:
        b = int(bloom_bits_max)
        if b < 256 or (b & (b - 1)) != 0:
            raise ValueError(
                f"bloom_bits_max must be a power of two >= 256, got {b}"
            )
    if bloom_bits is not None:
        b = int(bloom_bits)
        if b < 64 or b % 64 != 0:
            raise ValueError(
                f"bloom_bits must be a positive multiple of 64, got {b}"
            )


def _collect_file_stats(
    spark: SparkSession,
    fmt: str,
    root: str,
    vrels: list[str],
    stats_cols: list[str],
    bloom_cols: list[str] | None = None,
    bloom_bits: int | None = None,
    bloom_k: int = 4,
    mapping: dict | None = None,
    bloom_fpr: float = 0.01,
    bloom_bits_max: int = 16384,
) -> dict:
    """{<vrel>/<filename>: {col: [min, max]}} for every data file under
    the given version subdirs — aggregation jobs over exactly those
    files (group key = the scan-provided ``_metadata.file_path``), cost
    proportional to the newly written slice, never the table. Stats and
    bloom columns are LOGICAL names; ``mapping`` translates them to the
    on-disk physical names when a column mapping is active (output stays
    keyed by logical names — the prune API's key space).

    ``bloom_cols`` additionally record a per-file BLOOM bitset
    (``__bloom_<col>``) — the point-lookup complement to min/max: on a
    column whose values are scattered across files (no clustering),
    every file's [min, max] straddles every probe and range skipping is
    useless, but a membership bitset still prunes decisively (Iceberg's
    parquet bloom story, lifted to the manifest tier).

    Bitset sizing is ADAPTIVE by default (``bloom_bits=None``): the
    same stats job records per-file ``approx_count_distinct``, words
    are built at ``bloom_bits_max`` and each file's bitset is FOLDED
    down to the smallest power of two meeting ``bloom_fpr`` for ITS
    distinct count (stored packed base64). A fixed-size table at 100 TB
    row counts saturates — the bench's own sf0.1 layout put the old
    1024-bit default at FPR ≈ 0.97 — while per-file sizing keeps cost
    proportional to content. Files too big for ``bloom_bits_max`` store
    no bitset (kept by the prune — correct, just unpruned) rather than
    a saturated one. Passing an int ``bloom_bits`` selects the legacy
    fixed-size layout.

    The word build is a separate explode→two-level aggregation: k
    hashes per row then bit_or by (file, word) — O(k) work per row
    regardless of bitset width, where the legacy single-agg CASE fan-out
    is O(k·words) per row and stops scaling past a few hundred words."""
    if bloom_cols:
        _validate_bloom_config(bloom_bits, None if bloom_bits is not None else bloom_bits_max)
    paths = [f"{root.rstrip('/')}/{vrel}" for vrel in vrels]
    df = spark.read.format(fmt).option("basePath", root).load(paths)

    def phys(c: str) -> str:
        return (mapping or {}).get(c, c)

    adaptive = bloom_bits is None
    aggs = [F.count(F.lit(1)).alias("__nrows")]
    for c in stats_cols:
        aggs += [F.min(phys(c)).alias(f"__lo_{c}"), F.max(phys(c)).alias(f"__hi_{c}")]
    for c in bloom_cols or []:
        if adaptive:
            aggs.append(
                F.approx_count_distinct(phys(c)).alias(f"__ndv_{c}")
            )
        else:
            aggs += _bloom_word_aggs(phys(c), bloom_bits, bloom_k, key=c)
    rows = (
        df.groupBy(F.col("_metadata.file_path").alias("__fp")).agg(*aggs).collect()
    )

    def to_rel(fp: str) -> str | None:
        # resolve against the known vrels rather than string-stripping the
        # root: _metadata paths are scheme-qualified URIs (file:///…) and
        # the marker match is immune to how the scheme renders
        for vrel in vrels:
            marker = "/" + vrel + "/"
            i = fp.find(marker)
            if i >= 0:
                return vrel + "/" + fp[i + len(marker):]
        return None

    out: dict = {}
    ndv: dict = {}
    for r in rows:
        rel = to_rel(r["__fp"])
        if rel is None:
            continue
        out[rel] = {
            c: [_stat_val(r[f"__lo_{c}"]), _stat_val(r[f"__hi_{c}"])]
            for c in stats_cols
        }
        out[rel]["__rows"] = r["__nrows"]
        for c in bloom_cols or []:
            if adaptive:
                ndv[(rel, c)] = int(r[f"__ndv_{c}"] or 0)
            else:
                out[rel][f"__bloom_{c}"] = [
                    int(r[f"__bw_{c}_{w}"] or 0) for w in range(bloom_bits // 64)
                ]

    if adaptive and bloom_cols:
        # one exploded pass: k positions per row per column, bit_or'd by
        # (file, column, word). Map-side partial agg bounds the shuffle
        # at files × live-words per column — tiny next to the data.
        B = int(bloom_bits_max)
        pos_cols = []
        for c in bloom_cols:
            p = phys(c)
            pos_cols.append(
                F.when(
                    F.col(p).isNotNull(),
                    F.array(
                        *[
                            F.pmod(
                                F.xxhash64(F.col(p).cast("string"), F.lit(i)),
                                F.lit(B),
                            )
                            for i in range(bloom_k)
                        ]
                    ),
                ).alias(f"__pos_{c}")
            )
        stacked = (
            df.select(F.col("_metadata.file_path").alias("__fp"), *pos_cols)
            .select(
                "__fp",
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(c).alias("col"),
                                F.col(f"__pos_{c}").alias("pos"),
                            )
                            for c in bloom_cols
                        ]
                    )
                ).alias("e"),
            )
            .select("__fp", F.col("e.col").alias("col"), F.explode("e.pos").alias("p"))
        )
        wrows = (
            stacked.groupBy(
                "__fp", "col", (F.col("p") / 64).cast("long").alias("w")
            )
            .agg(
                # the Python shiftleft wrapper takes only literal shift
                # amounts; the dynamic shift is an SQL expression
                F.bit_or(
                    F.expr(
                        "shiftleft(cast(1 as bigint), cast(p % 64 as int))"
                    )
                ).alias("word")
            )
            .collect()
        )
        sparse: dict = {}
        for r in wrows:
            rel = to_rel(r["__fp"])
            if rel is not None:
                sparse.setdefault((rel, r["col"]), {})[int(r["w"])] = int(r["word"])
        for rel in out:
            for c in bloom_cols:
                target = _bloom_bits_for(
                    ndv.get((rel, c), 0), bloom_k, bloom_fpr, B
                )
                if target is None:
                    continue
                got = sparse.get((rel, c), {})
                words = [got.get(w, 0) for w in range(B // 64)]
                out[rel][f"__bloom_{c}"] = _pack_words(
                    _fold_words(words, target)
                )
    return out


_STATS_CONFIG_KEYS = (
    "stats_cols",
    "bloom_cols",
    "bloom_bits",
    "bloom_k",
    "bloom_fpr",
    "bloom_bits_max",
)


def _carry_stats_config(doc: dict, new_doc: dict) -> None:
    """Copy the stats/bloom configuration keys a table was initialized
    with into the next commit's doc — config is immutable per table."""
    for key in _STATS_CONFIG_KEYS:
        if key in doc:
            new_doc[key] = doc[key]


# --- commit-time conflict detection (OCC rebase) ---------------------------
# On a lost CAS race, a transaction whose effects cannot overlap the
# winner's republishes its ALREADY-STAGED files onto the new snapshot
# instead of deleting and re-running — Delta/Iceberg's commit-conflict
# semantics. Leaf-scoped three-way merge: loser's touched leaves applied
# onto the winner's head; conflicts = overlapping leaves, table-config
# changes, or both sides moving the (single) DV sidecar.

_REBASE_CONFIG_KEYS = (
    "schema",
    "column_mapping",
    "dropped_physical",
    "partition_transforms",
    "partition_specs",
    "leaf_spec",
    "constraints",
    "change_feed",
) + _STATS_CONFIG_KEYS

# process-local OCC observability (tests and the contention bench read
# this): lost CAS races, how many landed by zero-rewrite rebase vs had
# to re-stage. Not synchronized beyond the GIL — counters, not truth.
occ_stats = {"cas_lost": 0, "rebased": 0, "reran": 0, "last_conflict": None}

# A/B switch for the contention bench: False forces every lost race
# down the legacy delete-and-re-run path. Not a user knob.
_REBASE_ENABLED = True


def _leaf_changes(a: dict, b: dict) -> dict[str, str]:
    """Per-leaf footprint of ``b`` relative to ``a``: ``"append"`` (the
    primary vrel is unchanged and the extras SET only grew — pure
    insert), else ``"rewrite"`` (primary replaced, leaf created/drained,
    extras retired, or DV entries moved)."""
    pa, pb = a.get("partitions", {}), b.get("partitions", {})
    ea, eb = a.get("extra_vrels") or {}, b.get("extra_vrels") or {}
    out: dict[str, str] = {}
    for rel in set(pa) | set(pb):
        if pa.get(rel) != pb.get(rel):
            out[rel] = "rewrite"
            continue
        sa, sb = set(ea.get(rel, [])), set(eb.get(rel, []))
        if sa != sb:
            out[rel] = "append" if sa < sb else "rewrite"
    fa = (a.get("dv") or {}).get("files", {})
    fb = (b.get("dv") or {}).get("files", {})
    for p in set(fa) | set(fb):
        if fa.get(p) != fb.get(p):
            out[p.rsplit("/", 2)[0]] = "rewrite"
    return out


def _structural_touched(a: dict, b: dict) -> set[str]:
    """Leaves whose state differs between docs — a transaction's (or a
    commit range's) leaf footprint."""
    return set(_leaf_changes(a, b))


def _rebase_conflict(base: dict, head: dict, new_doc: dict) -> str | None:
    """Why the lost transaction (built as ``new_doc`` against ``base``)
    cannot be republished onto ``head`` — or None if it can.

    Two PURE APPENDS never conflict, even on the same leaf: extras are
    a set union, and under the split stats layout the rebase publish
    merges the two sides' per-leaf stats files (`_merge_split_stats`) —
    the pointer map stays one fname per leaf, pointing at the union.
    Everything else conflicts exactly when leaf footprints intersect,
    either side changed table config, both moved the DV sidecar, or the
    stats LAYOUT itself flipped concurrently (embedded↔split convert
    racing a data commit — the three-way doc merge has no meaning
    across a layout change)."""
    for k in _REBASE_CONFIG_KEYS:
        if base.get(k) != head.get(k):
            return f"winner changed table config {k!r}"
        if base.get(k) != new_doc.get(k):
            return f"transaction changes table config {k!r}"
    if new_doc.get("tags") is not None and new_doc.get("tags") != base.get(
        "tags"
    ):
        return "transaction changes tags"
    loser_dv = new_doc.get("dv") != base.get("dv")
    winner_dv = head.get("dv") != base.get("dv")
    if loser_dv and winner_dv:
        return "both sides moved the deletion-vector sidecar"
    lay_b = base.get("files_manifests") is not None
    if (new_doc.get("files_manifests") is not None) != lay_b:
        # the TRANSACTION is (or carries) a layout convert — re-running
        # it against the new head is metadata-only and cheap
        return "transaction changes the stats layout"
    if (head.get("files_manifests") is not None) != lay_b:
        if lay_b:
            return "stats layout changed concurrently (split → embedded)"
        # the winner was `convert_to_split_stats` (embedded → split, no
        # leaf footprint): the loser's staged EMBEDDED stats entries are
        # translated into per-leaf stats files at publish
        # (`_convert_stats_on_rebase`) — the data race stays zero-restage
    t = _leaf_changes(base, new_doc)
    w = _leaf_changes(base, head)
    for rel in set(t) & set(w):
        if t[rel] == w[rel] == "append":
            continue  # concurrent inserts into one leaf: extras union
        return f"touched leaves overlap: {rel!r} ({t[rel]} vs {w[rel]})"
    base_txns = base.get("txns") or {}
    new_txns = new_doc.get("txns") or {}
    head_txns = head.get("txns") or {}
    for app, ver in new_txns.items():
        if base_txns.get(app) != ver and base_txns.get(app) != head_txns.get(
            app
        ):
            return f"writer transaction {app!r} advanced concurrently"
    return None


def _rebase_doc(base: dict, head: dict, new_doc: dict) -> dict:
    """Three-way merge: the loser's leaf-scoped mutations (diff
    base→new_doc) applied onto the winner's ``head``. Preconditions
    established by `_rebase_conflict`; the staged vrels/stats files/
    change sidecars referenced by ``new_doc`` are reused byte-for-byte."""
    out = {
        k: v
        for k, v in head.items()
        if not k.startswith("_")
        and k not in ("change_data", "operation", "committed_at_ms", "parent")
    }
    out["version"] = head["version"] + 1
    parts = dict(head.get("partitions", {}))
    extras = {r: list(v) for r, v in (head.get("extra_vrels") or {}).items()}
    new_parts = new_doc.get("partitions", {})
    new_extras = new_doc.get("extra_vrels") or {}
    base_extras = base.get("extra_vrels") or {}
    for rel, kind in _leaf_changes(base, new_doc).items():
        if kind == "append" and rel in parts:
            # pure insert: union the loser's NEW extras onto whatever
            # the winner's head carries for this leaf (possibly its own
            # concurrent appends)
            base_set = set(base_extras.get(rel, []))
            added = [v for v in new_extras.get(rel, []) if v not in base_set]
            cur = extras.get(rel, [])
            extras[rel] = cur + [v for v in added if v not in cur]
            continue
        if rel in new_parts:
            parts[rel] = new_parts[rel]
        else:
            parts.pop(rel, None)
        if rel in new_extras:
            extras[rel] = list(new_extras[rel])
        else:
            extras.pop(rel, None)
    out["partitions"] = parts
    if extras:
        out["extra_vrels"] = extras
    else:
        out.pop("extra_vrels", None)
    if new_doc.get("dv") != base.get("dv"):
        out["dv"] = new_doc.get("dv")  # loser moved it; winner didn't
    if (new_doc.get("txns") or {}) != (base.get("txns") or {}):
        merged = dict(head.get("txns") or {})
        for app, ver in (new_doc.get("txns") or {}).items():
            if (base.get("txns") or {}).get(app) != ver:
                merged[app] = ver
        out["txns"] = merged
    # stats: carry the winner's inventory, attach the loser's staged
    # entries for its touched leaves (embedded entries travel in the
    # doc; split-layout pointers reference stats files already on disk)
    t = _structural_touched(base, new_doc)
    if head.get("files_manifests") is not None and base.get(
        "files_manifests"
    ) is None:
        # winner flipped embedded → split (CONVERT): follow the head's
        # layout; the loser's embedded entries for its touched leaves
        # become per-leaf stats files in `_convert_stats_on_rebase`
        out.pop("files", None)
        out["files_manifests"] = {
            r: f
            for r, f in (head.get("files_manifests") or {}).items()
            if r in parts
        }
        if "operation" in new_doc:
            out["operation"] = new_doc["operation"]
        if "change_data" in new_doc:
            out["change_data"] = new_doc["change_data"]
        return out
    if new_doc.get("files") is not None or head.get("files") is not None:
        live = set(parts.values())
        for vs in extras.values():
            live.update(vs)
        files = {
            p: st
            for p, st in (head.get("files") or {}).items()
            if p.rsplit("/", 1)[0] in live
        }
        for p, st in (new_doc.get("files") or {}).items():
            if p.rsplit("/", 2)[0] in t and p.rsplit("/", 1)[0] in live:
                files[p] = st
        if files or (head.get("files") is not None):
            out["files"] = files
    if head.get("files_manifests") is not None or new_doc.get(
        "files_manifests"
    ) is not None:
        fm = {
            r: f
            for r, f in (head.get("files_manifests") or {}).items()
            if r in parts and r not in t
        }
        for r in t:
            nf = (new_doc.get("files_manifests") or {}).get(r)
            if nf is not None and r in parts:
                fm[r] = nf
        out["files_manifests"] = fm
    if "operation" in new_doc:
        out["operation"] = new_doc["operation"]
    if "change_data" in new_doc:
        out["change_data"] = new_doc["change_data"]
    return out


def _merge_split_stats(
    fs, jvm, root: str, base: dict, head: dict, new_doc: dict, out: dict
) -> None:
    """Split-layout stats merge for same-leaf concurrent APPENDS: both
    sides rewrote the leaf's (monolithic) stats file — the winner's
    holds base∪winner entries, the loser's staged one holds base∪loser.
    For each overlap leaf, union the two files, filter to the merged
    doc's live vrels, and publish a NEW stats file the rebased commit
    points at — so the zero-restage OCC win holds on the 100k-file
    split layout a 100 TB table actually runs. O(overlap leaves), never
    O(table); failed CAS attempts leave only orphan stats JSONs for the
    regular orphan GC."""
    if out.get("files_manifests") is None:
        return
    t = _leaf_changes(base, new_doc)
    w = _leaf_changes(base, head)
    overlap = {
        rel
        for rel in set(t) & set(w)
        if t[rel] == w[rel] == "append" and rel in out.get("partitions", {})
    }
    if not overlap:
        return
    live = set(out["partitions"].values())
    for vs in (out.get("extra_vrels") or {}).values():
        live.update(vs)
    head_fm = head.get("files_manifests") or {}
    new_fm = new_doc.get("files_manifests") or {}
    fm = dict(out["files_manifests"])
    token = uuid.uuid4().hex[:8]
    for leaf in sorted(overlap):
        entries: dict = {}
        for src in (new_fm.get(leaf), head_fm.get(leaf)):
            if src is not None:
                entries.update(_read_leaf_stats(fs, jvm, root, src))
        entries = {
            p: st for p, st in entries.items() if p.rsplit("/", 1)[0] in live
        }
        fname = _split_leaf_fname(out["version"], token, leaf)
        _write_leaf_stats(fs, jvm, root, fname, entries)
        fm[leaf] = fname
    out["files_manifests"] = fm


def _convert_stats_on_rebase(
    fs, jvm, root: str, base: dict, head: dict, new_doc: dict, out: dict
) -> None:
    """Cross-LAYOUT stats translation: the winner was a
    `convert_to_split_stats` (embedded → split, zero leaf footprint)
    and the loser staged a data commit whose stats are EMBEDDED entries
    in its doc. For each leaf the loser touched, union the head's
    converted stats file (base entries) with the loser's embedded
    entries, filter to the merged snapshot's live vrels, and point the
    rebased commit at a NEW stats file — the racing data commit lands
    zero-restage and the table stays split. O(touched leaves)."""
    if (
        base.get("files_manifests") is not None
        or head.get("files_manifests") is None
        or new_doc.get("files") is None
    ):
        return
    t = _leaf_changes(base, new_doc)
    parts = out.get("partitions", {})
    live = set(parts.values())
    for vs in (out.get("extra_vrels") or {}).values():
        live.update(vs)
    head_fm = head.get("files_manifests") or {}
    fm = dict(out.get("files_manifests") or {})
    token = uuid.uuid4().hex[:8]
    for leaf in sorted(set(t) & set(parts)):
        entries: dict = {}
        if head_fm.get(leaf) is not None:
            entries.update(_read_leaf_stats(fs, jvm, root, head_fm[leaf]))
        entries.update(
            {
                p: st
                for p, st in new_doc["files"].items()
                if p.rsplit("/", 2)[0] == leaf
            }
        )
        entries = {
            p: st for p, st in entries.items() if p.rsplit("/", 1)[0] in live
        }
        fname = _split_leaf_fname(out["version"], token, leaf)
        _write_leaf_stats(fs, jvm, root, fname, entries)
        fm[leaf] = fname
    out["files_manifests"] = fm


def _rebase_publish(fs, jvm, root: str, base: dict, new_doc: dict) -> bool:
    """Try to land a lost transaction WITHOUT re-staging: classify vs
    the current head; if conflict-free, three-way merge and CAS. Loops
    while non-conflicting races keep landing. Returns True when the
    rebased commit published (staged bytes reused as-is), False when a
    true conflict demands the full re-run path."""
    for _ in range(_COMMIT_RETRIES):
        head = _load_doc(fs, jvm, root)
        reason = _rebase_conflict(base, head, new_doc)
        if reason is not None:
            occ_stats["last_conflict"] = reason
            return False
        out = _rebase_doc(base, head, new_doc)
        _merge_split_stats(fs, jvm, root, base, head, new_doc, out)
        _convert_stats_on_rebase(fs, jvm, root, base, head, new_doc, out)
        if _publish_cas(
            fs,
            jvm,
            _manifest_path(root, out["version"]),
            _encode_commit(head, out),
        ):
            return True
    return False


# ---------------------------------------------------------------------------
# INLINE (single-pass) stats: write the staged data files AND compute
# their per-file min/max/ndv/bloom stats in ONE Spark job.
#
# The post-write path (`_collect_file_stats`) re-reads the freshly
# written files in 1–2 extra aggregation jobs per commit — 212.5 s of
# the 10k-file migration rehearsal, and a full re-read of every append's
# slice. The inline path replaces the staging write itself: a
# `mapInArrow` stage writes each leaf's rows to parquet via pyarrow
# (bounded row-group buffering, task-deterministic file names, write-
# to-temp + atomic replace so task retries converge) and accumulates the
# SAME per-file statistics from the Arrow batches already in hand —
# commit-time stats cost becomes 0 extra full-data jobs.
#
# Bit-compatibility with the post-write pass:
# * bloom positions are precomputed JVM-SIDE with the identical
#   `pmod(xxhash64(cast(col as string), i), bits)` expressions and
#   shipped as an extra array column (dropped from the written file), so
#   the bitsets OR together to the same words and fold by the same
#   power-of-two identity;
# * min/max come from Arrow kernels / numpy with Spark's float-NaN
#   ordering replicated explicitly (NaN greatest: max is NaN if any NaN,
#   min is NaN only if ALL values are), timestamps re-normalized to the
#   session-naive form `_stat_val` sees from collected Rows;
# * ndv is EXACT (a bounded distinct set per file — the saturation
#   boundary `_bloom_bits_for` cares about is ndv > bits_max/2, so the
#   set is capped there and larger files honestly store no bitset),
#   where the post-write pass uses approx_count_distinct; exact ndv can
#   only size the fold target more truthfully. Folding both layouts to
#   the smaller width yields bit-identical bitsets (property-tested).
#
# Scope gates (`_inline_stats_ok`): parquet format, a local/file: root
# (the executor-side writer uses OS file APIs; object stores keep the
# post-write scan), and atomic-typed stats/bloom columns. Anything else
# falls back to `_collect_file_stats` transparently.
# ---------------------------------------------------------------------------

_INLINE_ROW_BUFFER = 256 * 1024  # rows buffered per leaf before a row group


def _os_path(p: str) -> str | None:
    """Local-filesystem path for a root/staging location, or None when
    the scheme isn't local (s3://, hdfs://, …)."""
    if p.startswith("file:"):
        from urllib.parse import unquote, urlparse

        return unquote(urlparse(p).path)
    head = p.split("/", 1)[0]
    if ":" in head:  # some other scheme
        return None
    return p


def _inline_stats_ok(
    df: DataFrame,
    stats_cols: list[str] | None,
    bloom_cols: list[str] | None,
    fmt: str,
    dest: str,
    mapping: dict | None,
) -> bool:
    """Can this staged write take the single-pass inline path?"""
    if fmt != "parquet" or _os_path(dest) is None:
        return False
    atomic = (
        T.ByteType, T.ShortType, T.IntegerType, T.LongType, T.FloatType,
        T.DoubleType, T.StringType, T.DateType, T.TimestampType,
        T.TimestampNTZType, T.BooleanType, T.DecimalType,
    )
    types = {f.name: f.dataType for f in df.schema.fields}
    for c in list(stats_cols or []) + list(bloom_cols or []):
        p = (mapping or {}).get(c, c)
        if p not in types or not isinstance(types[p], atomic):
            return False
    return True


def _inline_norm_scalar(v):
    """Collected-Row image of an Arrow scalar: Spark sends mapInArrow
    timestamps tz-tagged with the session zone, while driver-collected
    Rows (what `_stat_val` historically saw) are session-naive — strip
    to naive UTC so both paths serialize identically. The engine pins
    spark.sql.session.timeZone=UTC (session.py)."""
    import datetime as _dt

    if isinstance(v, _dt.datetime) and v.tzinfo is not None:
        return v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
    return v


def _inline_stats_writer(
    dest_os: str,
    cols: list[str],
    stats_cols: list[str],
    bloom_cols: list[str],
    bloom_bits: int | None,
    bloom_k: int,
    bloom_fpr: float,
    bloom_bits_max: int,
    token: str,
    phys: dict,
):
    """The mapInArrow function: writes `<dest>/<leaf dirs>/part-*.parquet`
    per leaf encountered in this task's partition and yields one
    (rel, entry-JSON) row per file written. Executor-side; everything it
    closes over is plain data."""
    adaptive = bloom_bits is None
    bits_build = int(bloom_bits_max if adaptive else bloom_bits)
    nwords = bits_build // 64
    ndv_cap = int(bloom_bits_max) // 2

    def fn(batches):
        import os

        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        drop = set(cols) | {f"__bpos_{c}" for c in bloom_cols}
        state: dict = {}

        def leaf_state(rel: str, schema: pa.Schema):
            st = state.get(rel)
            if st is not None:
                return st
            data_schema = pa.schema(
                [schema.field(i) for i in range(len(schema))
                 if schema.field(i).name not in drop]
            )
            d = os.path.join(dest_os, *rel.split("/"))
            os.makedirs(d, exist_ok=True)
            # deterministic per (leaf, task, attempt-token): a task RETRY
            # rewrites the same final name via atomic replace instead of
            # leaving a duplicate file next to the first attempt's
            fname = f"part-{pid:05d}-{token}.snappy.parquet"
            final = os.path.join(d, fname)
            tmp = os.path.join(d, f".{fname}.inprogress")
            st = {
                "rel": f"{rel}/{fname}",
                "final": final,
                "tmp": tmp,
                "writer": pq.ParquetWriter(tmp, data_schema, compression="snappy"),
                "names": [f.name for f in data_schema],
                "buf": [],
                "buf_rows": 0,
                "rows": 0,
                "mm": {c: [None, None] for c in stats_cols},
                "nan": {c: False for c in stats_cols},
                "words": {c: np.zeros(nwords, dtype=np.uint64) for c in bloom_cols},
                "ndv": {c: set() for c in bloom_cols},
            }
            state[rel] = st
            return st

        def flush(st):
            if st["buf_rows"]:
                st["writer"].write_table(
                    pa.Table.from_batches(
                        [b.select(st["names"]) for b in st["buf"]]
                    )
                )
                st["buf"], st["buf_rows"] = [], 0

        def upd_minmax(st, c, arr):
            a = arr.drop_null()
            if len(a) == 0:
                return
            mm = st["mm"][c]
            if pa.types.is_floating(arr.type):
                v = a.to_numpy(zero_copy_only=False)
                nan = np.isnan(v)
                if nan.any():
                    st["nan"][c] = True
                    v = v[~nan]
                if len(v) == 0:
                    return
                lo, hi = float(v.min()), float(v.max())
            else:
                try:
                    s = pc.min_max(a).as_py()
                    lo, hi = s["min"], s["max"]
                except pa.ArrowNotImplementedError:
                    vals = a.to_pylist()
                    lo, hi = min(vals), max(vals)
                lo, hi = _inline_norm_scalar(lo), _inline_norm_scalar(hi)
            if mm[0] is None or lo < mm[0]:
                mm[0] = lo
            if mm[1] is None or hi > mm[1]:
                mm[1] = hi

        def upd_bloom(st, c, sub):
            flat = pc.list_flatten(sub.column(f"__bpos_{c}"))
            if len(flat):
                p = flat.to_numpy(zero_copy_only=False).astype(np.uint64)
                np.bitwise_or.at(
                    st["words"][c],
                    (p >> np.uint64(6)).astype(np.int64),
                    np.left_shift(np.uint64(1), p & np.uint64(63)),
                )
            if adaptive and st["ndv"][c] is not None:
                vals = sub.column(phys[c]).drop_null()
                if len(vals):
                    st["ndv"][c].update(pc.unique(vals).to_pylist())
                    if len(st["ndv"][c]) > ndv_cap:
                        # saturates even bits_max — same boundary as
                        # _bloom_bits_for(ndv): store no bitset, stop
                        # accumulating (memory stays O(bits_max))
                        st["ndv"][c] = None

        for batch in batches:
            if batch.num_rows == 0:
                continue
            # group this batch's rows by leaf: join the (string-cast)
            # partition values, dictionary-encode, split by code. The
            # \x00/\x01 sentinels only matter if a partition VALUE
            # contains them — not reachable through the string casts
            # upstream of real data.
            parts = [
                pc.fill_null(pc.cast(batch.column(c), pa.string()), "\x00N")
                for c in cols
            ]
            key = (
                parts[0]
                if len(parts) == 1
                else pc.binary_join_element_wise(*parts, "\x01")
            )
            codes = pc.dictionary_encode(key).indices.to_numpy(
                zero_copy_only=False
            )
            for u in np.unique(codes):
                mask = codes == u
                idx = int(np.flatnonzero(mask)[0])
                vals = [batch.column(c)[idx].as_py() for c in cols]
                rel = _part_rel(cols, vals)
                sub = (
                    batch
                    if mask.all()
                    else batch.filter(pa.array(mask))
                )
                st = leaf_state(rel, batch.schema)
                st["buf"].append(sub)
                st["buf_rows"] += sub.num_rows
                st["rows"] += sub.num_rows
                if st["buf_rows"] >= _INLINE_ROW_BUFFER:
                    flush(st)
                for c in stats_cols:
                    upd_minmax(st, c, sub.column(phys[c]))
                for c in bloom_cols:
                    upd_bloom(st, c, sub)

        rels, entries = [], []
        for rel in sorted(state):
            st = state[rel]
            flush(st)
            st["writer"].close()
            os.replace(st["tmp"], st["final"])
            entry: dict = {}
            for c in stats_cols:
                lo, hi = st["mm"][c]
                if st["nan"][c]:
                    # Spark float ordering: NaN is the greatest value —
                    # max is NaN whenever one is present; min is NaN
                    # only when EVERY non-null value is NaN
                    hi = float("nan")
                    if lo is None:
                        lo = float("nan")
                entry[c] = [_stat_val(lo), _stat_val(hi)]
            entry["__rows"] = st["rows"]
            for c in bloom_cols:
                words = st["words"][c].astype(np.int64)
                if adaptive:
                    nd = st["ndv"][c]
                    if nd is None:
                        continue
                    target = _bloom_bits_for(
                        len(nd), bloom_k, bloom_fpr, bloom_bits_max
                    )
                    if target is None:
                        continue
                    entry[f"__bloom_{c}"] = _pack_words(
                        _fold_words([int(w) for w in words], target)
                    )
                else:
                    # legacy fixed layout stores the signed int64 word
                    # list, matching Spark's bit_or longs byte-for-byte
                    entry[f"__bloom_{c}"] = [int(w) for w in words]
            rels.append(st["rel"])
            entries.append(json.dumps(entry))
        if rels:
            yield pa.record_batch(
                [pa.array(rels, pa.string()), pa.array(entries, pa.string())],
                names=["rel", "entry"],
            )

    return fn


def _write_staging_with_stats(
    df: DataFrame,
    dest: str,
    cols: list[str],
    stats_cols: list[str] | None,
    bloom_cols: list[str] | None,
    bloom_bits: int | None,
    bloom_k: int,
    bloom_fpr: float,
    bloom_bits_max: int,
    token: str,
    mapping: dict | None = None,
) -> dict:
    """Single-pass staged write: lay the Hive-partitioned layout under
    ``dest`` AND return ``{"<leaf>/<fname>": stats_entry}`` for every
    file written — the inline replacement for `df.write.partitionBy`
    followed by `_collect_file_stats`. One Spark job total (the action
    is collecting the tiny per-file stats rows; the files are its
    side output). ``df`` arrives physical-named with partition columns
    already string-cast, exactly as the legacy write path stages it."""
    stats_cols = list(stats_cols or [])
    bloom_cols = list(bloom_cols or [])
    phys = {c: (mapping or {}).get(c, c) for c in stats_cols + bloom_cols}
    adaptive = bloom_bits is None
    bits_build = int(bloom_bits_max if adaptive else bloom_bits)
    staged = df
    for c in bloom_cols:
        p = phys[c]
        staged = staged.withColumn(
            f"__bpos_{c}",
            F.when(
                F.col(p).isNotNull(),
                F.array(
                    *[
                        F.pmod(
                            F.xxhash64(F.col(p).cast("string"), F.lit(i)),
                            F.lit(bits_build),
                        )
                        for i in range(bloom_k)
                    ]
                ),
            ),
        )
    dest_os = _os_path(dest)
    import os

    os.makedirs(dest_os, exist_ok=True)  # empty source still stages a dir
    fn = _inline_stats_writer(
        dest_os, list(cols), stats_cols, bloom_cols,
        bloom_bits, bloom_k, bloom_fpr, bloom_bits_max, token, phys,
    )
    rows = staged.mapInArrow(fn, "rel STRING, entry STRING").collect()
    return {r["rel"]: json.loads(r["entry"]) for r in rows}


# ---------------------------------------------------------------------------
# SPLIT stats layout (Iceberg's manifest-list/manifest-file shape)
#
# The embedded layout serializes every file's stats (bloom bitsets
# included) into each FULL snapshot manifest — ~1.5 KB/file measured at
# the 10k-file rehearsal, i.e. a 15 MB snapshot document, growing
# linearly to O(100 MB) at the 100 TB file counts. The split layout
# stores per-LEAF stats files under ``_manifests/stats/`` and keeps only
# a {leaf → stats-file} POINTER MAP in the snapshot (Iceberg's manifest
# list): a full snapshot is O(leaves) short strings, a commit writes one
# small stats file per TOUCHED leaf (cost O(change)), and resolution
# never loads stats at all — readers load exactly the leaves their
# partition/hidden-partition prune left standing. Stats files are
# immutable (attempt-token'd names — concurrent committers can't
# collide) so they cache safely and GC by the same
# referenced/superseded/grace rules as version subdirs.
#
# Cite: Iceberg spec "Manifests"/"Manifest Lists" (public docs); the
# reference engine (etl_weekly_trades.py) has no file-skipping metadata
# at all.
# ---------------------------------------------------------------------------

_STATS_SUBDIR = f"{_MANIFEST_DIR}/stats"


def _leaf_stats_path(root: str, fname: str) -> str:
    return f"{root.rstrip('/')}/{_STATS_SUBDIR}/{fname}"


def _split_leaf_fname(version: int, token: str, leaf_rel: str) -> str:
    import hashlib

    h = hashlib.md5(leaf_rel.encode()).hexdigest()[:12]
    return f"s{version:010d}-{token}-{h}.json"


def _write_leaf_stats(fs, jvm, root: str, fname: str, entries: dict) -> None:
    path = _leaf_stats_path(root, fname)
    _mkdirs_parent(fs, jvm, path)
    stream = fs.create(jvm.org.apache.hadoop.fs.Path(path), True)
    try:
        stream.write(bytearray(json.dumps(entries).encode()))
    finally:
        stream.close()


# stats files are immutable once published, so a (root, fname) cache is
# always coherent; bounded to keep long-lived drivers flat
_LEAF_STATS_CACHE: dict[tuple[str, str], dict] = {}
_LEAF_STATS_CACHE_MAX = 4096


def _read_leaf_stats(fs, jvm, root: str, fname: str) -> dict:
    key = (root, fname)
    hit = _LEAF_STATS_CACHE.get(key)
    if hit is not None:
        return hit
    d = json.loads(_read_file(fs, jvm, _leaf_stats_path(root, fname)).decode())
    if len(_LEAF_STATS_CACHE) >= _LEAF_STATS_CACHE_MAX:
        _LEAF_STATS_CACHE.clear()
    _LEAF_STATS_CACHE[key] = d
    return d


def _read_split_stats(
    fs, jvm, root: str, doc: dict, leaves=None
) -> dict:
    """Materialize the {vrel/file → stats} map for the requested leaves
    (default: every leaf) of a split-layout snapshot. Callers that know
    their leaf set (post-prune reads, manifest_diff) pass it and pay
    O(their leaves); observability sweeps pass None and pay O(table) —
    the honest cost of a full inventory."""
    fm = doc.get("files_manifests") or {}
    out: dict = {}
    for leaf, fname in fm.items():
        if leaves is not None and leaf not in leaves:
            continue
        out.update(_read_leaf_stats(fs, jvm, root, fname))
    return out


def _materialized_files(fs, jvm, root: str, doc: dict, leaves=None) -> dict:
    """Layout-blind view of a snapshot's per-file stats."""
    if doc.get("files_manifests") is not None:
        return _read_split_stats(fs, jvm, root, doc, leaves)
    return doc.get("files", {})


def _split_stats_from_entries(
    fs, jvm, root: str, version: int, token: str, entries: dict
) -> dict:
    """Write one stats file per leaf present in ``entries`` and return
    the {leaf → stats fname} pointer map (used by init/convert, where
    EVERY leaf is touched)."""
    by_leaf: dict[str, dict] = {}
    for p, st in entries.items():
        by_leaf.setdefault(p.rsplit("/", 2)[0], {})[p] = st
    fm = {}
    for leaf, ents in by_leaf.items():
        fname = _split_leaf_fname(version, token, leaf)
        _write_leaf_stats(fs, jvm, root, fname, ents)
        fm[leaf] = fname
    return fm


def _carry_files(doc: dict, new_doc: dict) -> None:
    """Stats carry for commits that touch NO data file (constraints, DV
    deletes): pointer map in split layout, embedded dict otherwise."""
    if doc.get("files_manifests") is not None:
        new_doc["files_manifests"] = doc["files_manifests"]
    else:
        new_doc["files"] = doc.get("files", {})


def _attach_stats(
    spark: SparkSession,
    fmt: str,
    root: str,
    doc: dict,
    new_doc: dict,
    new_vrels: list[str],
    token: str,
    col_mapping: dict | None = None,
    precomputed: dict | None = None,
) -> None:
    """Stats-evolution funnel every data-touching committer calls AFTER
    setting new_doc's partitions and extra_vrels. Embedded layout:
    carry-live + collect-fresh into ``new_doc['files']`` (the historical
    behavior). Split layout: rewrite stats files for TOUCHED leaves only
    — carry every other leaf's pointer untouched — so commit metadata
    cost is O(touched leaves), never O(table).

    ``precomputed`` short-circuits the fresh-file scan: a committer that
    staged through `_write_staging_with_stats` already holds every new
    file's entry (keys are final ``<leaf>/<vdir>/<file>`` rels) — no
    re-read of the data happens here at all."""
    stats_cols = doc.get("stats_cols")
    bloom_cols = doc.get("bloom_cols")
    if not stats_cols and not bloom_cols:
        return
    _carry_stats_config(doc, new_doc)
    new_mapping = new_doc["partitions"]
    live = set(new_mapping.values())
    for vs in (new_doc.get("extra_vrels") or {}).values():
        live.update(vs)
    fresh = [v for v in new_vrels if v in live]
    cmap = col_mapping if col_mapping is not None else doc.get("column_mapping")

    def _fresh_stats() -> dict:
        if not fresh:
            return {}
        if precomputed is not None:
            fresh_set = set(fresh)
            return {
                p: st
                for p, st in precomputed.items()
                if p.rsplit("/", 1)[0] in fresh_set
            }
        return _collect_file_stats(
            spark, fmt, root, fresh,
            list(stats_cols or []), bloom_cols,
            doc.get("bloom_bits"), doc.get("bloom_k", 4),
            mapping=cmap,
            bloom_fpr=doc.get("bloom_fpr", 0.01),
            bloom_bits_max=doc.get("bloom_bits_max", 16384),
        )

    if doc.get("files_manifests") is None:
        carried = {
            p: st
            for p, st in doc.get("files", {}).items()
            if p.rsplit("/", 1)[0] in live
        }
        carried.update(_fresh_stats())
        new_doc["files"] = carried
        return

    fs, jvm = _hadoop_fs(spark, root)
    old_fm = doc["files_manifests"]
    touched = {v.rsplit("/", 1)[0] for v in fresh}
    # a leaf whose vrel SET shrank without fresh data (extras retired,
    # leaf rewritten elsewhere) — detect structurally so its stats file
    # drops the dead vrels' entries
    old_p = doc.get("partitions", {})
    old_extras = doc.get("extra_vrels") or {}
    for rel in new_mapping:
        old_set = {old_p[rel]} | set(old_extras.get(rel, [])) if rel in old_p else set()
        new_set = {new_mapping[rel]} | set((new_doc.get("extra_vrels") or {}).get(rel, []))
        if old_set and old_set != new_set:
            touched.add(rel)
    fresh_stats = _fresh_stats()
    fm = {
        r: f for r, f in old_fm.items() if r in new_mapping and r not in touched
    }
    for leaf in sorted(touched):
        if leaf not in new_mapping:
            continue  # staged then dropped (drained leaf)
        entries: dict = {}
        if leaf in old_fm:
            entries.update(
                {
                    p: st
                    for p, st in _read_leaf_stats(
                        fs, jvm, root, old_fm[leaf]
                    ).items()
                    if p.rsplit("/", 1)[0] in live
                }
            )
        entries.update(
            {
                p: st
                for p, st in fresh_stats.items()
                if p.rsplit("/", 2)[0] == leaf
            }
        )
        fname = _split_leaf_fname(new_doc["version"], token, leaf)
        _write_leaf_stats(fs, jvm, root, fname, entries)
        fm[leaf] = fname
    new_doc["files_manifests"] = fm


def _dv_rels(dv: dict) -> list[str]:
    """All chunk rels of a DV pointer. A DV is a CHAIN of position
    datasets — each DV commit appends a chunk holding only ITS new
    positions (O(new) written, not O(all deletions so far)); the chain
    folds into one dataset when it exceeds `_DV_CHUNKS_MAX` (amortized
    O(1) folds) and rewrites materialize it away. Legacy single-"rel"
    docs read as a one-chunk chain."""
    if dv.get("rels") is not None:
        return list(dv["rels"])
    return [dv["rel"]]


_DV_CHUNKS_MAX = 8


def _load_dv(spark: SparkSession, root: str, dv: dict) -> DataFrame:
    """The snapshot's deletion-vector dataset: (file_rel, pos) of every
    logically deleted row — the union of the pointer's chunk chain.
    Explicit schema — the read must never sample footers of a dataset
    whose shape is a contract. Chunks may carry STALE rows for files a
    later rewrite dropped (rewrites prune COUNTS, not chunk bytes); the
    read-side anti-join never matches them, and a fold drops them."""
    return spark.read.schema(_DV_SCHEMA).parquet(
        *[f"{root.rstrip('/')}/{r}" for r in _dv_rels(dv)]
    )


def _dv_commit(
    spark: SparkSession, fs, jvm, root: str, doc: dict,
    new_version: int, token: str, dv_new: DataFrame,
) -> tuple[dict | None, list[str], int]:
    """Shared DV-append step of every merge-on-read committer: write the
    NEW deletion positions as ONE chunk chained onto the snapshot's
    existing chain, folding the chain into a single dataset (filtered
    to live counts' files — stale rows drop) when it exceeds
    `_DV_CHUNKS_MAX`. Returns (dv_doc, staged_rels, n_new); n_new == 0
    means nothing was written and the caller should no-op. Cost is
    O(new positions) per commit + an amortized fold — a long-lived CDC
    feed's per-batch DV cost no longer grows with deletions-so-far."""
    new_counts = {
        r["file_rel"]: r["n"]
        for r in dv_new.groupBy("file_rel")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    n_new = sum(new_counts.values())
    old = doc.get("dv")
    if n_new == 0:
        return old, [], 0
    merged = dict(old["files"]) if old else {}
    for p, n in new_counts.items():
        merged[p] = merged.get(p, 0) + n
    chunk = f"{_DV_DIR}/{_vdir(new_version, token)}"
    nparts = max(1, n_new // 5_000_000)
    dv_new.repartition(nparts).write.mode("errorifexists").parquet(
        f"{root}/{chunk}"
    )
    rels = (_dv_rels(old) if old else []) + [chunk]
    staged = [chunk]
    if len(rels) > _DV_CHUNKS_MAX:
        # fold: one read of the whole chain, restricted to the files the
        # merged counts still track (stale rows from rewritten files
        # drop here), one write — every chunk becomes GC-able
        keep = spark.createDataFrame(
            [(p,) for p in merged], "file_rel STRING"
        )
        folded = (
            spark.read.schema(_DV_SCHEMA)
            .parquet(*[f"{root}/{r}" for r in rels])
            .join(F.broadcast(keep), "file_rel", "left_semi")
        )
        fold_rel = f"{_DV_DIR}/{_vdir(new_version, token + 'f')}"
        folded.repartition(
            max(1, sum(merged.values()) // 5_000_000)
        ).write.mode("errorifexists").parquet(f"{root}/{fold_rel}")
        rels = [fold_rel]
        staged.append(fold_rel)
    dv_doc = (
        {"rel": rels[0], "files": merged}
        if len(rels) == 1
        else {"rels": rels, "files": merged}
    )
    return dv_doc, staged, n_new


def _attach_location(spark: SparkSession, df: DataFrame, root: str) -> DataFrame:
    """Append the row's physical coordinates — ``__dv_file`` (path
    relative to the table root, the manifest's file-rel key space) and
    ``__dv_pos`` (ordinal within its parquet file, Spark's
    ``_metadata.row_index``). The root prefix is the Hadoop-qualified
    rendering, which is exactly how the scan renders
    ``_metadata.file_path`` (pinned by test), so the rel extraction is a
    constant-length substring — no per-row string search."""
    fs, jvm = _hadoop_fs(spark, root)
    q = fs.makeQualified(
        jvm.org.apache.hadoop.fs.Path(root.rstrip("/"))
    ).toString()
    return df.withColumn(
        "__dv_file", F.expr(f"substring(_metadata.file_path, {len(q) + 2})")
    ).withColumn("__dv_pos", F.col("_metadata.row_index"))


def _apply_dv(
    spark: SparkSession,
    df: DataFrame,
    root: str,
    dv: dict | None,
    keep_location: bool = False,
) -> DataFrame:
    """Filter logically deleted rows out of a raw scan by anti-joining on
    (file_rel, row_index). The DV side is BROADCAST: its size is the
    table's live deletion count, bounded by compaction cadence (a rewrite
    materializes deletions and shrinks the dataset) — the same read-side
    contract Delta's deletion vectors carry. The scan side never
    shuffles."""
    if dv is None and not keep_location:
        return df
    out = _attach_location(spark, df, root)
    if dv is not None:
        dvdf = _load_dv(spark, root, dv)
        cond = (out["__dv_file"] == dvdf["file_rel"]) & (
            out["__dv_pos"] == dvdf["pos"]
        )
        out = out.join(F.broadcast(dvdf), cond, "left_anti")
    return out if keep_location else out.drop("__dv_file", "__dv_pos")


def _carry_dv(doc: dict, new_doc: dict) -> None:
    """Carry the deletion-vector pointer into the next commit, pruning
    entries for files the commit rewrote or dropped — their deletions
    were MATERIALIZED by the DV-applying read that fed the rewrite. If
    nothing survives, the pointer is dropped entirely and the dataset
    becomes GC-able."""
    dv = doc.get("dv")
    if not dv:
        return
    live = _all_vrels(new_doc)
    kept = {p: n for p, n in dv["files"].items() if p.rsplit("/", 1)[0] in live}
    if kept:
        new_doc["dv"] = {
            **{k: dv[k] for k in ("rel", "rels") if k in dv},
            "files": kept,
        }


def _carry_mapping(doc: dict, new_doc: dict) -> None:
    """Column-mapping is table state like schema: every commit carries it
    unchanged unless it explicitly evolved it (merge schema evolution,
    ALTER). The dropped-physical tombstone set travels with it: those
    names stay unavailable forever so old files' stale bytes can never
    resurface under a re-added logical column."""
    if doc.get("column_mapping") is not None and "column_mapping" not in new_doc:
        new_doc["column_mapping"] = doc["column_mapping"]
    if doc.get("dropped_physical") and "dropped_physical" not in new_doc:
        new_doc["dropped_physical"] = doc["dropped_physical"]


def _extend_mapping(
    mapping: dict, new_names: list[str], tombstones: list[str] | None = None
) -> dict:
    """Register new logical columns in an ACTIVE column mapping. Physical
    names are frozen at introduction: a new column takes its own name
    unless a prior rename left that physical name occupied (rename a→b
    then add a fresh 'a') OR a DROP tombstoned it (drop a then re-add
    'a' — old files still hold a's bytes, which must surface as NULL,
    not stale data), in which case a suffixed physical name keeps old
    files' bytes unambiguous — Delta's column-mapping rule."""
    out = dict(mapping)
    taken = set(out.values()) | set(tombstones or ())
    for name in new_names:
        if name in out:
            continue
        phys = name
        n = 1
        while phys in taken:
            phys = f"{name}__p{n}"
            n += 1
        out[name] = phys
        taken.add(phys)
    return out


def _to_physical(df: DataFrame, mapping: dict | None) -> DataFrame:
    """Rename a staged write's columns logical→physical. Identity when
    the table has no column mapping (the default, and the pre-mapping
    on-disk layout)."""
    if not mapping:
        return df
    return df.select(
        *[F.col(c).alias(mapping.get(c, c)) for c in df.columns]
    )


def _physical_schema(schema: T.StructType, mapping: dict | None) -> T.StructType:
    """The stored (logical) schema rendered in on-disk physical names —
    what the parquet scan must be handed when a mapping is active."""
    if not mapping:
        return schema
    return T.StructType(
        [
            T.StructField(mapping.get(f.name, f.name), f.dataType, f.nullable)
            for f in schema.fields
        ]
    )


def prune_files(doc: dict, ranges: dict) -> tuple[list[str], int]:
    """File-skipping decision from manifest stats: keep a file unless
    some queried column's recorded [min, max] proves it cannot hold a
    row in ``ranges[col] = (lo, hi)`` (either bound may be None for
    half-open). Files without stats (or NULL bounds) are kept — pruning
    is an OPTIMIZATION; the caller still applies the real filter to the
    surviving rows. Returns (kept file rels, total files tracked)."""
    files = doc.get("files", {})
    kept = []
    for rel, st in files.items():
        drop = False
        for col, (lo, hi) in ranges.items():
            bounds = st.get(col)
            if not bounds or bounds[0] is None or bounds[1] is None:
                continue
            fmin, fmax = bounds
            if (hi is not None and fmin > hi) or (lo is not None and fmax < lo):
                drop = True
                break
        if not drop:
            kept.append(rel)
    return kept, len(files)


def prune_files_bloom(
    spark: SparkSession, doc: dict, points: dict
) -> tuple[list[str], int]:
    """File-skipping decision from the manifest's per-file bloom bitsets:
    keep a file unless some probed column's bitset proves the value is
    ABSENT (any of its k bits unset). The probe's bit positions are
    computed through a 1-row Spark job with the SAME xxhash64 expression
    that built the bitsets, so Python never re-implements the JVM hash.
    Files without a bitset are kept — pruning is an optimization; the
    caller still applies the real filter. False positives only ever keep
    an extra file, never lose a row.

    Bitsets may be per-file SIZED (adaptive tables): probe positions are
    computed once at the build width (``bloom_bits_max``) and masked
    down to each file's power-of-two width — identical to hashing at
    that width, the same identity the build-side fold relies on."""
    bloom_cols = doc.get("bloom_cols") or []
    bits = (
        doc.get("bloom_bits") or doc.get("bloom_bits_max") or 16384
    )
    k = doc.get("bloom_k", 4)
    files = doc.get("files", {})
    probes: dict[str, list[int]] = {}
    exprs = []
    for col, value in points.items():
        if col not in bloom_cols or value is None:
            continue
        if isinstance(value, (list, tuple, set, frozenset, dict)):
            # str() of a container would hash its REPR: no bitset matches,
            # every file prunes, and the read silently loses real rows
            raise ValueError(
                f"prune_points[{col!r}] must be a scalar probe value, got "
                f"{type(value).__name__}; probe one value per call"
            )
        for i in range(k):
            exprs.append(
                F.pmod(
                    F.xxhash64(F.lit(str(value)), F.lit(i)), F.lit(bits)
                ).alias(f"__p_{col}_{i}")
            )
        probes[col] = []
    if not probes:
        return list(files), len(files)
    row = spark.range(1).select(*exprs).first()
    for col in probes:
        probes[col] = [int(row[f"__p_{col}_{i}"]) for i in range(k)]

    kept = []
    for rel, st in files.items():
        drop = False
        for col, poss in probes.items():
            blob = st.get(f"__bloom_{col}")
            if not blob:
                continue
            words = _unpack_words(blob)
            nbits = len(words) * 64
            # mask to this file's width; identity when widths match
            eff = poss if nbits == bits else [p & (nbits - 1) for p in poss]
            if any(not (words[p >> 6] >> (p & 63)) & 1 for p in eff):
                drop = True
                break
        if not drop:
            kept.append(rel)
    return kept, len(files)


def manifest_versions(spark: SparkSession, root: str) -> list[int]:
    """The table's time-travel window, oldest→newest: the last
    ``_RETAIN`` committed versions. Anything returned is fully readable
    (GC keeps every version subdir a retained manifest references).
    Older manifest FILES may survive on disk as delta-chain ancestors —
    metadata-only resolution inputs whose exclusive data is already
    reclaimed — and are deliberately not advertised here."""
    fs, jvm = _hadoop_fs(spark, root)
    return _list_manifest_versions(fs, jvm, root)[-_RETAIN:]


def _load_raw(fs, jvm, root: str, version: int) -> dict:
    return json.loads(_read_file(fs, jvm, _manifest_path(root, version)).decode())


def _resolve_doc(fs, jvm, root: str, version: int) -> dict:
    """Materialize the snapshot state of ``version`` by walking its delta
    chain down to the nearest FULL manifest and applying each delta's
    changed/removed leaves (and file-stats deltas) on the way back up.
    The chain is at most ``_FULL_EVERY`` hops by construction. The
    resolved doc carries ``_chain`` (hops from the last full) so the next
    commit knows when to write a checkpoint snapshot."""
    raw = _load_raw(fs, jvm, root, version)
    if "parent" not in raw:
        doc = dict(raw)
        doc["version"] = version
        doc["_chain"] = 0
        return doc
    parent = raw["parent"]
    if not isinstance(parent, int) or parent >= version:
        raise ValueError(
            f"corrupt manifest chain at v{version} of {root}: parent {parent!r}"
        )
    base = _resolve_doc(fs, jvm, root, parent)
    partitions = dict(base.get("partitions", {}))
    partitions.update(raw.get("partitions_delta", {}))
    for rel in raw.get("removed", []):
        partitions.pop(rel, None)
    doc: dict = {
        "version": version,
        "partitions": partitions,
        "_chain": base["_chain"] + 1,
    }
    if "committed_at_ms" in raw:  # per-commit stamp, never inherited
        doc["committed_at_ms"] = raw["committed_at_ms"]
    if "operation" in raw:  # per-commit label, never inherited
        doc["operation"] = raw["operation"]
    if "change_data" in raw:  # per-commit sidecar pointer, never inherited
        doc["change_data"] = raw["change_data"]
    cf = raw.get("change_feed", base.get("change_feed"))
    if cf:
        doc["change_feed"] = cf
    schema = raw.get("schema", base.get("schema"))
    if schema is not None:
        doc["schema"] = schema
    # deletion-vector pointer: inherited unless the commit changed it; an
    # explicit null (a commit that materialized every deletion) drops it
    dv = raw.get("dv", base.get("dv"))
    if dv is not None:
        doc["dv"] = dv
    cm = raw.get("column_mapping", base.get("column_mapping"))
    if cm is not None:
        doc["column_mapping"] = cm
    dp = raw.get("dropped_physical", base.get("dropped_physical"))
    if dp is not None:
        doc["dropped_physical"] = dp
    pt = raw.get("partition_transforms", base.get("partition_transforms"))
    if pt is not None:
        doc["partition_transforms"] = pt
    ps = raw.get("partition_specs", base.get("partition_specs"))
    if ps is not None:
        doc["partition_specs"] = ps
    ls = raw.get("leaf_spec", base.get("leaf_spec"))
    if ls is not None:
        doc["leaf_spec"] = ls
    dfmt = raw.get("data_format", base.get("data_format"))
    if dfmt is not None:
        doc["data_format"] = dfmt
    ev = raw.get("extra_vrels", base.get("extra_vrels"))
    if ev is not None:
        doc["extra_vrels"] = ev
    tx = raw.get("txns", base.get("txns"))
    if tx is not None:
        doc["txns"] = tx
    cons = raw.get("constraints", base.get("constraints"))
    if cons is not None:
        doc["constraints"] = cons
    tags = raw.get("tags", base.get("tags"))
    if tags is not None:
        doc["tags"] = tags
    for key in _STATS_CONFIG_KEYS:
        val = raw.get(key, base.get(key))
        if val is not None:
            doc[key] = val
    if doc.get("stats_cols") or doc.get("bloom_cols"):
        # SPLIT layout resolves the pointer map only — O(leaves) short
        # strings, never the stats themselves (loaded lazily per leaf)
        if (
            "files_manifests" in raw
            or "files_manifests_delta" in raw
            or base.get("files_manifests") is not None
        ):
            if "files_manifests" in raw:  # explicit override / null stop
                fm = dict(raw["files_manifests"] or {})
            else:
                fm = dict(base.get("files_manifests") or {})
                fm.update(raw.get("files_manifests_delta", {}))
                for rel in raw.get("removed", []):
                    fm.pop(rel, None)
            doc["files_manifests"] = {
                r: f for r, f in fm.items() if r in partitions
            }
            return doc
        live = _all_vrels(doc) | set(partitions.values())
        files = {
            p: st
            for p, st in base.get("files", {}).items()
            if p.rsplit("/", 1)[0] in live
        }
        files.update(raw.get("files_delta", {}))
        doc["files"] = files
    return doc


def _encode_commit(prev_doc: dict, new_doc: dict) -> bytes:
    """Serialize a commit as a DELTA manifest (changed/added leaves,
    removed leaves, new-file stats, parent pointer — O(change) bytes)
    unless the parent chain has reached ``_FULL_EVERY``, in which case a
    FULL snapshot manifest resets the chain. ``new_doc`` is always the
    fully-materialized state the committer built; the delta is computed
    here by diffing against the resolved parent, so committers stay
    oblivious to the encoding. Every commit is stamped with
    ``committed_at_ms`` (wall clock at encode time) for AS-OF-timestamp
    resolution (`version_at_timestamp`); the stamp is per-commit, never
    inherited through the chain."""
    stamp = int(time.time() * 1000)
    # immutable table config carried centrally so no committer can drop
    # it from a full-snapshot encode
    for _k in (
        "partition_transforms",
        "partition_specs",
        "leaf_spec",
        "data_format",
    ):
        if _k not in new_doc and prev_doc.get(_k) is not None:
            new_doc = {**new_doc, _k: prev_doc[_k]}
    if "txns" not in new_doc and prev_doc.get("txns") is not None:
        new_doc = {**new_doc, "txns": prev_doc["txns"]}
    if "tags" not in new_doc and prev_doc.get("tags") is not None:
        new_doc = {**new_doc, "tags": prev_doc["tags"]}
    if "change_feed" not in new_doc and prev_doc.get("change_feed"):
        new_doc = {**new_doc, "change_feed": prev_doc["change_feed"]}
    if prev_doc.get("_chain", 0) + 1 >= _FULL_EVERY:
        # explicit-null keys (a dropped stats config) exist only to stop
        # delta-chain inheritance; a full snapshot simply omits them
        full = {
            k: v
            for k, v in new_doc.items()
            if not k.startswith("_") and v is not None
        }
        full["committed_at_ms"] = stamp
        return json.dumps(full, indent=1).encode()
    prev_p = prev_doc.get("partitions", {})
    new_p = new_doc["partitions"]
    delta: dict = {
        "version": new_doc["version"],
        "parent": prev_doc["version"],
        "committed_at_ms": stamp,
        **(
            {"operation": new_doc["operation"]}
            if "operation" in new_doc
            else {}
        ),
        "partitions_delta": {
            r: v for r, v in new_p.items() if prev_p.get(r) != v
        },
    }
    removed = [r for r in prev_p if r not in new_p]
    if removed:
        delta["removed"] = removed
    if "schema" in new_doc and new_doc.get("schema") != prev_doc.get("schema"):
        delta["schema"] = new_doc["schema"]
    if new_doc.get("dv") != prev_doc.get("dv"):
        # an explicit null records "all deletion vectors materialized";
        # resolution then stops inheriting the parent's pointer
        delta["dv"] = new_doc.get("dv")
    if new_doc.get("column_mapping") != prev_doc.get("column_mapping"):
        delta["column_mapping"] = new_doc.get("column_mapping")
    if new_doc.get("dropped_physical") != prev_doc.get("dropped_physical"):
        delta["dropped_physical"] = new_doc.get("dropped_physical")
    if new_doc.get("extra_vrels") != prev_doc.get("extra_vrels"):
        delta["extra_vrels"] = new_doc.get("extra_vrels")
    if new_doc.get("txns") != prev_doc.get("txns"):
        delta["txns"] = new_doc.get("txns")
    if new_doc.get("partition_transforms") != prev_doc.get(
        "partition_transforms"
    ):
        delta["partition_transforms"] = new_doc.get("partition_transforms")
    if new_doc.get("partition_specs") != prev_doc.get("partition_specs"):
        delta["partition_specs"] = new_doc.get("partition_specs")
    if new_doc.get("leaf_spec") != prev_doc.get("leaf_spec"):
        delta["leaf_spec"] = new_doc.get("leaf_spec")
    if new_doc.get("data_format") != prev_doc.get("data_format"):
        delta["data_format"] = new_doc.get("data_format")
    if new_doc.get("constraints") != prev_doc.get("constraints"):
        delta["constraints"] = new_doc.get("constraints")
    if new_doc.get("tags") != prev_doc.get("tags"):
        delta["tags"] = new_doc.get("tags")
    if "change_data" in new_doc:  # per-commit, never diffed vs parent
        delta["change_data"] = new_doc["change_data"]
    if new_doc.get("change_feed") != prev_doc.get("change_feed"):
        delta["change_feed"] = new_doc.get("change_feed")
    if any(k in new_doc for k in ("stats_cols", "bloom_cols")):
        for key in _STATS_CONFIG_KEYS:
            if key in new_doc and new_doc[key] != prev_doc.get(key):
                delta[key] = new_doc[key]
        if new_doc.get("files_manifests") is not None:
            # split layout: the delta carries only the TOUCHED leaves'
            # new stats-file pointers — O(change) short strings; removed
            # leaves drop their pointer via the shared `removed` list
            prev_fm = prev_doc.get("files_manifests") or {}
            fmd = {
                r: f
                for r, f in new_doc["files_manifests"].items()
                if prev_fm.get(r) != f
            }
            if fmd:
                delta["files_manifests_delta"] = fmd
        else:
            prev_files = prev_doc.get("files", {})
            fdelta = {
                p: st
                for p, st in new_doc.get("files", {}).items()
                if prev_files.get(p) != st
            }
            if fdelta:
                delta["files_delta"] = fdelta
    return json.dumps(delta, indent=1).encode()


def _ancestors(fs, jvm, root: str, version: int) -> set[int]:
    """The manifest files ``version`` needs for resolution: itself plus
    its parent chain down to the nearest full snapshot."""
    out = set()
    v = version
    while True:
        out.add(v)
        raw = _load_raw(fs, jvm, root, v)
        if "parent" not in raw:
            return out
        v = raw["parent"]


def _load_doc(fs, jvm, root: str, version: int | None = None) -> dict:
    versions = _list_manifest_versions(fs, jvm, root)
    if not versions:
        raise FileNotFoundError(
            f"no manifest under {root}/{_MANIFEST_DIR}; run manifest_init()"
        )
    readable = versions[-_RETAIN:]
    if version is None:
        v = versions[-1]
    elif version in readable:
        v = version
    elif _branch_of(root) is not None and version in versions:
        # a BRANCH view retains everything it can see: branch commits
        # never GC, and main GC protects the fork point's data and
        # manifest closure for as long as the branch lives
        v = version
    else:
        # tag-protected snapshots stay readable outside the window: GC
        # keeps their data/manifests for as long as the tag lives (the
        # head manifest is the authority on live tags)
        head_tags = _resolve_doc(fs, jvm, root, versions[-1]).get("tags") or {}
        tagged = {t["version"] for t in head_tags.values()}
        if version in tagged and version in versions:
            return _resolve_doc(fs, jvm, root, version)
        # older manifests may survive on disk as delta-chain ancestors,
        # but only the retained window's DATA is guaranteed present
        raise FileNotFoundError(
            f"manifest v{version} not retained for {root}; available: "
            f"{sorted(set(readable) | tagged)} "
            f"(retention keeps the last {_RETAIN} commits plus tags)"
        )
    return _resolve_doc(fs, jvm, root, v)


def load_manifest(
    spark: SparkSession, root: str, version: int | None = None
) -> tuple[int, dict]:
    """(version, {logical leaf rel → physical rel}) of the highest
    committed manifest — or of ``version`` exactly (time travel; must be
    within the retention window, see `manifest_versions`). Raises if the
    table has no manifest — run `manifest_init` once to migrate a plain
    Hive layout."""
    fs, jvm = _hadoop_fs(spark, root)
    doc = _load_doc(fs, jvm, root, version)
    return doc["version"], doc["partitions"]


def _restrict_doc_to_leaves(doc: dict, partitions: dict) -> dict:
    """A doc narrowed to the surviving leaves (files stats, split-stats
    pointers, and extras restricted alongside the partitions map)."""
    doc = {**doc, "partitions": partitions}
    if doc.get("files"):
        live = set(partitions.values())
        for r in partitions:
            live.update((doc.get("extra_vrels") or {}).get(r, []))
        doc["files"] = {
            p: st
            for p, st in doc["files"].items()
            if p.rsplit("/", 1)[0] in live
        }
    if doc.get("files_manifests"):
        doc["files_manifests"] = {
            r: f for r, f in doc["files_manifests"].items() if r in partitions
        }
    if doc.get("extra_vrels"):
        doc["extra_vrels"] = {
            r: vs for r, vs in doc["extra_vrels"].items() if r in partitions
        }
    return doc


def read_manifested(
    spark: SparkSession,
    root: str,
    fmt: str = "parquet",
    pin_partition_strings: bool = False,
    partition_cols: list[str] | None = None,
    version: int | None = None,
    prune_ranges: dict | None = None,
    leaf_filter: dict | None = None,
    prune_points: dict | None = None,
    prune_source: dict | None = None,
    tag: str | None = None,
    _with_location: bool = False,
) -> DataFrame:
    """Snapshot read: resolve the current manifest once, scan exactly its
    version subdirs. The snapshot is pinned at RESOLUTION time — a merge
    committing afterwards changes neither the resolved paths nor their
    bytes (two-manifest GC retention), so the read is stable end-to-end.

    ``version`` time-travels to an earlier retained commit (the window is
    `manifest_versions`): superseded leaves' version subdirs are never
    renamed at commit and GC keeps everything a retained manifest
    references, so an old snapshot reads byte-for-byte as it was
    published. Readable versions are bounded by ``_RETAIN`` — this is the
    short undo/audit window a pointer-file design affords, not unbounded
    history (that needs a real table format's snapshot log).

    Partition columns still come from the ``k=v`` path segments under
    ``basePath``; filters on them prune to the listed subdirs as usual.
    ``pin_partition_strings`` reproduces `_read_raw_partitions`' explicit
    string schema (the merge path needs exact on-disk strings).

    Schema authority: manifests committed by this module carry the table
    schema (lakehouse-style), and the read applies it EXPLICITLY — no
    footer sampling, and partitions written before a schema evolution
    surface the later-added columns as NULL (the parquet reader clips
    missing columns to null under an explicit schema) without a
    mergeSchema sweep over every file footer. Pre-schema manifests fall
    back to inference.

    ``prune_ranges`` ({col: (lo, hi)}) enables FILE-LEVEL data skipping
    from the manifest's stored per-file min/max stats (tables
    initialized/committed with ``stats_cols``): files whose recorded
    range cannot intersect the query range are dropped from the listing
    before Spark ever opens them — the Iceberg-style skip, one tier
    above the footer row-group pruning Spark already does. Pruning is an
    optimization only (callers still apply the real filter); on a table
    without stats it is a no-op.

    ``leaf_filter`` ({partition_col: value | [values]}) prunes the leaf
    MAPPING on the driver before Spark ever sees a path. Spark's own
    partition pruning removes non-matching leaves from the SCAN, but the
    file index still lists and stat()s every path handed to it — at
    100k leaves that's the driver-side cost this bounds: a dict scan of
    the resolved manifest, then a file index over only the matching
    leaves. Equality/IN semantics on the on-disk partition strings
    (exact match); callers still apply the real filter to the rows, so
    over-pruning is impossible and an unknown column is an error rather
    than a silent full scan.

    ``prune_points`` ({col: value}) enables BLOOM-based file skipping for
    point lookups on ``bloom_cols`` tables (see `manifest_init`): the
    complement to ``prune_ranges`` for columns whose values are scattered
    across files — min/max straddles every probe there, a membership
    bitset still prunes decisively. Composes with both other prunes;
    false positives cost an extra file open, never a lost row.

    Deletion vectors: a snapshot carrying a ``dv`` pointer (see
    `delete_rows_manifested`) reads its data files UNCHANGED and filters
    the logically deleted rows with a broadcast anti-join on
    (file_rel, ``_metadata.row_index``); files whose every row is
    deleted leave the listing before Spark opens them (stats tables).
    ``_with_location`` (internal) appends ``__dv_file``/``__dv_pos`` —
    the row coordinates the DV committers key on."""
    fs, jvm = _hadoop_fs(spark, root)
    if tag is not None:
        # named-ref travel: tags pin snapshots against GC (tag_create),
        # so a tag resolved from the CURRENT manifest is always readable
        if version is not None:
            raise ValueError("read_manifested: pass version= OR tag=")
        tags = _load_doc(fs, jvm, root).get("tags") or {}
        if tag not in tags:
            raise ValueError(
                f"read_manifested: no tag {tag!r} on {root} "
                f"(have: {sorted(tags)})"
            )
        version = tags[tag]["version"]
    doc = _load_doc(fs, jvm, root, version)
    partitions = doc["partitions"]
    if not partitions:
        # empty table: no paths to scan — callers get an empty frame via
        # an empty RDD only if they know the schema; raise instead, the
        # merge path handles emptiness before reading
        raise ValueError(f"manifest for {root} lists no partitions")

    if prune_source:
        # HIDDEN-PARTITIONING prune: translate predicates on SOURCE
        # columns into leaf_filter values on the DERIVED partition
        # columns via the stored transform spec. Pruning only — the
        # kept leaves still hold non-matching rows and the caller
        # applies its real predicate; an untranslatable predicate
        # (bucket range, over-wide enumeration) silently serves every
        # leaf. A source column no transform covers is an error (the
        # caller expected pruning that can never happen).
        def _spec_filter(transforms: dict) -> tuple[set, dict]:
            by_source: dict[str, list[tuple[str, str]]] = {}
            for dcol, spec in transforms.items():
                by_source.setdefault(_parse_transform(spec)[2], []).append(
                    (dcol, spec)
                )
            extra: dict = {}
            for src, pred in prune_source.items():
                for dcol, spec in by_source.get(src, []):
                    if isinstance(pred, tuple) and len(pred) == 2:
                        vals = _transform_range(spec, pred[0], pred[1])
                    else:
                        vals = _transform_points(spark, spec, pred)
                    if vals is not None:
                        extra[dcol] = {str(x) for x in vals}
            return set(by_source), extra

        hist = doc.get("partition_specs")
        if hist:
            # SPEC-EVOLVED table: each leaf prunes under ITS OWN
            # generation's transforms — a source the generation doesn't
            # transform simply can't prune that generation's leaves
            # (completeness over economy); a source NO generation
            # covers is still an error.
            leaf_spec = doc.get("leaf_spec") or {}
            cur_id = len(hist) - 1
            filters = [_spec_filter(h) for h in hist]
            covered = set().union(*(c for c, _ in filters))
            unknown_src = set(prune_source) - covered
            if unknown_src:
                raise ValueError(
                    f"prune_source columns {sorted(unknown_src)} have no "
                    f"partition transform in any spec generation of {root}"
                )

            def _leaf_passes(rel: str) -> bool:
                want = filters[int(leaf_spec.get(rel, cur_id))][1]
                if not want:
                    return True
                kv = dict(seg.split("=", 1) for seg in rel.split("/"))
                return all(
                    kv.get(c) in vals for c, vals in want.items() if c in kv
                )

            partitions = {
                rel: vrel
                for rel, vrel in partitions.items()
                if _leaf_passes(rel)
            }
            doc = _restrict_doc_to_leaves(doc, partitions)
            if not partitions:
                schema_json = doc.get("schema")
                if schema_json is None:
                    raise ValueError(
                        f"prune_source eliminated every leaf of {root} and "
                        "the manifest stores no schema to shape an empty "
                        "result"
                    )
                return spark.createDataFrame(
                    [], T.StructType.fromJson(json.loads(schema_json))
                )
        else:
            transforms = doc.get("partition_transforms") or {}
            by_source, extra = _spec_filter(transforms)
            unknown_src = set(prune_source) - by_source
            if unknown_src:
                raise ValueError(
                    f"prune_source columns {sorted(unknown_src)} have no "
                    f"partition transform on {root} "
                    f"(transformed sources: {sorted(by_source)})"
                )
            if extra:
                leaf_filter = {**(leaf_filter or {}), **extra}

    if leaf_filter:
        def leaf_kv(rel: str) -> dict:
            return dict(seg.split("=", 1) for seg in rel.split("/"))

        sample = leaf_kv(next(iter(partitions)))
        unknown = set(leaf_filter) - set(sample)
        if unknown:
            raise ValueError(
                f"leaf_filter columns {sorted(unknown)} are not partition "
                f"columns of {root} (leaves carry {sorted(sample)})"
            )
        want = {
            c: {str(x) for x in v} if isinstance(v, (list, tuple, set)) else {str(v)}
            for c, v in leaf_filter.items()
        }
        partitions = {
            rel: vrel
            for rel, vrel in partitions.items()
            if all(leaf_kv(rel)[c] in vals for c, vals in want.items())
        }
        if not partitions:
            schema_json = doc.get("schema")
            if schema_json is None:
                raise ValueError(
                    f"leaf_filter eliminated every leaf of {root} and the "
                    "manifest stores no schema to shape an empty result"
                )
            return spark.createDataFrame(
                [], T.StructType.fromJson(json.loads(schema_json))
            )
        if doc.get("files"):
            live = set(partitions.values())
            for r in partitions:
                live.update((doc.get("extra_vrels") or {}).get(r, []))
            doc = dict(doc)
            doc["files"] = {
                p: st
                for p, st in doc["files"].items()
                if p.rsplit("/", 1)[0] in live
            }
        if doc.get("files_manifests"):
            doc = dict(doc)
            doc["files_manifests"] = {
                r: f
                for r, f in doc["files_manifests"].items()
                if r in partitions
            }
        doc = {**doc, "partitions": partitions}
        if doc.get("extra_vrels"):
            doc["extra_vrels"] = {
                r: vs
                for r, vs in doc["extra_vrels"].items()
                if r in partitions
            }
    dv = doc.get("dv")
    # SPLIT layout: materialize per-file stats for exactly the leaves
    # the partition/hidden prune left standing — the point of the split:
    # a filtered point lookup loads O(matching leaves) stats files, and
    # resolution above never loaded any. Materialized only when a prune
    # will consume them (or DV dead-file elision applies); a plain scan
    # of a split table touches no stats file at all.
    if doc.get("files_manifests") and (prune_ranges or prune_points or dv):
        doc = {
            **doc,
            "files": _read_split_stats(
                fs, jvm, root, doc, leaves=set(partitions)
            ),
        }
    # FULLY-deleted files (DV cardinality == the file's recorded row
    # count) leave the listing outright — the anti-join would drain them
    # anyway, but not opening them is the point of file-level metadata
    dead_files: set[str] = set()
    if dv and doc.get("files"):
        dead_files = {
            p
            for p, n in dv["files"].items()
            if doc["files"].get(p, {}).get("__rows") == n
        }

    def _empty(why: str) -> DataFrame:
        schema_json = doc.get("schema")
        if schema_json is None:
            raise ValueError(
                f"{why} eliminated every file of {root} and the "
                "manifest stores no schema to shape an empty result"
            )
        return spark.createDataFrame(
            [], T.StructType.fromJson(json.loads(schema_json))
        )

    if (prune_ranges or prune_points or dead_files) and doc.get("files"):
        kept = set(doc["files"]) - dead_files
        if prune_ranges:
            kept &= set(prune_files(doc, prune_ranges)[0])
        if prune_points:
            kept &= set(prune_files_bloom(spark, doc, prune_points)[0])
        paths = [f"{root.rstrip('/')}/{rel}" for rel in sorted(kept)]
        if not paths:  # every file provably outside the range / absent
            return _empty("pruning")
    else:
        scan_vrels = set(partitions.values())
        for r in partitions:
            scan_vrels.update((doc.get("extra_vrels") or {}).get(r, []))
        paths = [f"{root.rstrip('/')}/{rel}" for rel in sorted(scan_vrels)]
    reader = spark.read.format(fmt)
    if not doc.get("partition_specs"):
        reader = reader.option("basePath", root)
    # (spec-EVOLVED tables scan without basePath: their leaves mix
    # directory shapes — all transform-derived, every data column lives
    # in the files, so nothing needs partition-directory parsing)
    schema_json = doc.get("schema")
    if schema_json is None and not pin_partition_strings:
        # pre-schema manifests can't carry a column mapping (ALTER
        # requires a stored schema), so the inferred names are physical
        return _apply_dv(spark, reader.load(paths), root, dv, _with_location)
    import copy

    if schema_json is not None:
        schema = T.StructType.fromJson(json.loads(schema_json))
    else:
        schema = reader.load(paths).schema
    if pin_partition_strings:
        pin = set(_normalize_partition_cols(partition_cols))
        schema = T.StructType(
            [
                T.StructField(f.name, T.StringType(), True)
                if f.name in pin
                else copy.deepcopy(f)
                for f in schema.fields
            ]
        )
    # the scan is handed the PHYSICAL rendering of the stored schema
    # (identity when no column mapping); renamed columns read their
    # frozen on-disk name and surface under the logical one below
    cmap = doc.get("column_mapping")
    spec_hist = doc.get("partition_specs")
    all_specs: dict[str, str] = {}
    for h in spec_hist or []:
        all_specs.update(h)
    data_fields = [f for f in schema.fields if f.name not in all_specs]
    if spec_hist:
        # spec-EVOLVED table: leaves mix directory shapes, so the scan
        # takes no basePath (no partition-directory parsing); every
        # generation's derived columns are RE-DERIVED below from their
        # source columns — the same expressions the writers used, so
        # values are exact and uniform across generations
        loaded = (
            spark.read.format(fmt)
            .schema(_physical_schema(T.StructType(data_fields), cmap))
            .load(paths)
        )
    else:
        loaded = (
            spark.read.format(fmt)
            .schema(_physical_schema(schema, cmap))
            .option("basePath", root)
            .load(paths)
        )
    # a partitioned read under a user schema surfaces the partition
    # columns LAST regardless of schema order; restore the stored order
    # so evolved tables present a stable column layout
    out_cols = [
        F.col((cmap or {}).get(f.name, f.name)).alias(f.name)
        for f in data_fields
    ]
    loc_cols = ["__dv_file", "__dv_pos"] if _with_location else []
    if _with_location:
        sel = _apply_dv(spark, loaded, root, dv, keep_location=True).select(
            *out_cols, *loc_cols
        )
    else:
        sel = _apply_dv(spark, loaded, root, dv).select(*out_cols)
    if not spec_hist:
        return sel
    for f in schema.fields:
        if f.name in all_specs:
            sel = sel.withColumn(
                f.name,
                _transform_expr(all_specs[f.name], sel).cast(f.dataType),
            )
    return sel.select(*[f.name for f in schema.fields], *loc_cols)


def _stage_change_data(
    fs,
    jvm,
    root: str,
    fmt: str,
    new_version: int,
    token: str,
    changes: DataFrame | None,
    new_doc: dict,
) -> list[str]:
    """Stage a commit's row-level change set (columns = the staged
    physical schema + ``_change_type``) under an attempt-token'd
    ``_changes`` subdir and point ``new_doc`` at it. ``changes=None``
    records an explicitly EMPTY change set (a row-no-op rewrite like
    compaction). Invisible until the manifest referencing it publishes —
    the same staging discipline as data vrels; the caller adds the
    returned rels to its lost-race cleanup list."""
    if changes is None:
        new_doc["change_data"] = {"rel": None}
        return []
    rel = f"{_CHANGES_DIR}/{_vdir(new_version, token)}"
    changes.write.mode("errorifexists").format(fmt).save(
        f"{root.rstrip('/')}/{rel}"
    )
    new_doc["change_data"] = {"rel": rel}
    if fmt == "csv":
        # csv files carry no header/schema: record the sidecar's exact
        # column ORDER in the commit so readers can reconstruct it
        new_doc["change_data"]["cols"] = list(changes.columns)
    return [rel]


def manifest_init(
    spark: SparkSession,
    root: str,
    partition_cols,
    fmt: str = "parquet",
    stats_cols: list[str] | None = None,
    bloom_cols: list[str] | None = None,
    bloom_bits: int | None = None,
    bloom_k: int = 4,
    bloom_fpr: float = 0.01,
    bloom_bits_max: int = 16384,
    partition_transforms: dict[str, str] | None = None,
    stats_split: bool = False,
    precomputed_stats: dict | None = None,
    change_feed: bool = False,
    source_schema_json: str | None = None,
) -> int:
    """One-time migration of a plain Hive-layout table into manifest
    mode: move each leaf's files into ``<leaf>/__v0000000001`` (renames —
    metadata-only, no data copy) and commit manifest v1. Idempotent-safe
    to call on an already-initialized table (no-op).
    ``partition_transforms`` records the hidden-partitioning spec the
    layout was derived with (see `write_manifested`) so source-column
    pruning works on reads.

    ``stats_cols`` turns on per-file min/max tracking for those columns:
    v1 stats are computed here (one aggregation pass), every later
    commit maintains them for its new files only, and
    `read_manifested(prune_ranges=…)` skips files from the listing
    outright. Choose the columns queries range-filter on (event time,
    ids); combine with `compact_manifested(sort_cols=…)` so file ranges
    are disjoint and the skip rate approaches the filter selectivity.

    ``bloom_cols`` additionally records a per-file BLOOM bitset
    (``bloom_k`` xxhash64-derived bits per value) for point-lookup
    skipping via `read_manifested(prune_points=…)` — the membership
    complement to min/max for high-cardinality columns with no
    clustering, where every file's range straddles every probe.

    Sizing is ADAPTIVE by default: each file's bitset is the smallest
    power of two meeting ``bloom_fpr`` for that file's distinct count
    (measured at commit time; false-positive rate ≈ (1−e^(−k·n/m))^k),
    capped at ``bloom_bits_max`` bits (= bits/8 bytes stored per file
    per column; files whose ndv saturates even the cap store nothing
    and simply stay unpruned). A FIXED size can still be forced by
    passing ``bloom_bits`` — but note a fixed size that suits today's
    file row counts saturates when files grow; adaptive sizing is what
    holds at 100 TB layouts."""
    cols = _normalize_partition_cols(partition_cols)
    fs, jvm = _hadoop_fs(spark, root)
    if _list_manifest_versions(fs, jvm, root):
        return load_manifest(spark, root)[0]
    # record the schema (partition types included) before the layout
    # migration — it becomes the table's read authority from v1 on.
    # Formats whose files don't self-describe (csv: no header, so
    # inference yields _c0/_c1; json: typed inference lossy) take the
    # WRITER's schema, handed down by write_manifested.
    schema_json = (
        source_schema_json
        if source_schema_json is not None
        else spark.read.format(fmt).load(root).schema.json()
    )

    # discover leaves: depth-len(cols) dirs of k=v segments
    leaves: list[str] = []
    stack = [(jvm.org.apache.hadoop.fs.Path(root), "", 0)]
    while stack:
        path, rel, d = stack.pop()
        for st in fs.listStatus(path):
            name = st.getPath().getName()
            if not st.isDirectory() or "=" not in name or name.startswith(("_", ".")):
                continue
            r = f"{rel}/{name}" if rel else name
            if d + 1 == len(cols):
                leaves.append(r)
            else:
                stack.append((st.getPath(), r, d + 1))

    version = 1
    mapping = {}
    for rel in leaves:
        vrel = f"{rel}/{_vdir(version)}"
        vpath = jvm.org.apache.hadoop.fs.Path(f"{root.rstrip('/')}/{vrel}")
        fs.mkdirs(vpath)
        leaf = jvm.org.apache.hadoop.fs.Path(f"{root.rstrip('/')}/{rel}")
        for st in fs.listStatus(leaf):
            name = st.getPath().getName()
            if st.isFile() and not name.startswith(("_", ".")):
                fs.rename(
                    st.getPath(),
                    jvm.org.apache.hadoop.fs.Path(f"{root.rstrip('/')}/{vrel}/{name}"),
                )
        mapping[rel] = vrel
    doc = {
        "version": version,
        "partitions": mapping,
        "schema": schema_json,
        "committed_at_ms": int(time.time() * 1000),
        "operation": "CREATE",
    }
    if partition_transforms:
        for spec in partition_transforms.values():
            _parse_transform(spec)
        doc["partition_transforms"] = dict(partition_transforms)
    if fmt != "parquet":
        # table config: the stream reader (io/table_stream.py) routes
        # its pyarrow file reads by this; parquet stays implicit so
        # existing tables' docs are unchanged
        doc["data_format"] = fmt
    if change_feed:
        # CHANGE-DATA FEED: rewrite committers record their exact
        # delete/insert rows per commit (Delta CDF); see the table
        # stream's rows mode for the consumer
        doc["change_feed"] = True
    if stats_cols or bloom_cols:
        if stats_cols:
            doc["stats_cols"] = list(stats_cols)
        if bloom_cols:
            _validate_bloom_config(
                bloom_bits, None if bloom_bits is not None else bloom_bits_max
            )
            doc["bloom_cols"] = list(bloom_cols)
            doc["bloom_k"] = int(bloom_k)
            if bloom_bits is not None:  # legacy fixed-size layout
                doc["bloom_bits"] = int(bloom_bits)
            else:
                doc["bloom_fpr"] = float(bloom_fpr)
                doc["bloom_bits_max"] = int(bloom_bits_max)
        if precomputed_stats is not None:
            # the writer that laid this layout (write_manifested's
            # inline path) already computed every file's entry against
            # PRE-migration rels — rekey onto the __v1 subdirs
            entries = {}
            for p, st in precomputed_stats.items():
                leaf, fname = p.rsplit("/", 1)
                entries[f"{leaf}/{_vdir(version)}/{fname}"] = st
        else:
            entries = _collect_file_stats(
                spark,
                fmt,
                root,
                list(mapping.values()),
                list(stats_cols or []),
                list(bloom_cols) if bloom_cols else None,
                None if bloom_bits is None else int(bloom_bits),
                int(bloom_k),
                bloom_fpr=float(bloom_fpr),
                bloom_bits_max=int(bloom_bits_max),
            )
        if stats_split:
            # Iceberg-style SPLIT layout from birth: per-leaf stats
            # files + a pointer map; the snapshot document stays
            # O(leaves) regardless of file count
            doc["files_manifests"] = _split_stats_from_entries(
                fs, jvm, root, version, uuid.uuid4().hex[:8], entries
            )
        else:
            doc["files"] = entries
    if not _publish_cas(
        fs, jvm, _manifest_path(root, version), json.dumps(doc, indent=1).encode()
    ):
        # a concurrent init won the v1 publish; the file renames are
        # idempotent across racers (deterministic __v1 destination), so
        # the winner's manifest describes the same layout
        return load_manifest(spark, root)[0]
    return version


def _all_vrels(doc: dict) -> set[str]:
    """Every live version subdir of a snapshot: each leaf's PRIMARY vrel
    plus any APPEND extras (`append_manifested` adds files as extra
    vrels instead of rewriting the leaf)."""
    out = set(doc.get("partitions", {}).values())
    for vs in (doc.get("extra_vrels") or {}).values():
        out.update(vs)
    return out


def _leaf_vrels(doc: dict, rel: str) -> list[str]:
    """All version subdirs holding leaf ``rel``'s data, primary first."""
    out = [doc["partitions"][rel]]
    out += list((doc.get("extra_vrels") or {}).get(rel, []))
    return out


def _carry_extras(doc: dict, new_doc: dict) -> None:
    """Carry append extras into the next commit. A leaf whose PRIMARY
    vrel is unchanged keeps its extras (nothing consolidated them); a
    leaf the commit rewrote — new primary vrel — read its content
    THROUGH the manifest (extras included) and consolidated it, so its
    extras are dropped, as are extras of removed leaves. Detection is
    structural (vrel comparison), so every committer makes the same
    correct decision with one call."""
    extras = doc.get("extra_vrels") or {}
    if not extras:
        return
    old_p = doc.get("partitions", {})
    new_p = new_doc["partitions"]
    kept = {
        rel: list(vs)
        for rel, vs in extras.items()
        if rel in new_p and new_p[rel] == old_p.get(rel)
    }
    if kept:
        new_doc["extra_vrels"] = kept


def _gc(fs, jvm, root: str, keep_versions: list[int]) -> None:
    """Delete manifests older than the retention window and any version
    subdir no kept manifest references — superseded data AND orphans from
    crashed attempts. Unreferenced dirs YOUNGER than the orphan grace
    window are spared: they may be a concurrent committer's in-flight
    staging (its manifest publishes after the data lands); a crashed
    attempt's dirs are reclaimed once they age past the window.

    Branch commits SKIP GC entirely (a branch view hides main commits
    after the fork — reclaiming against it would delete live main
    data); main GC protects every live branch's referenced state via
    `_branch_protected`."""
    if _branch_of(root) is not None:
        return
    listed = _list_manifest_versions(fs, jvm, root)
    # TAGS protect their snapshots from reclamation (Iceberg's ref
    # semantics): the newest retained manifest is the authority on live
    # tags — a tagged version's data, DV, stats, and manifest chain are
    # kept alongside the retention window until the tag is deleted.
    keep_versions = list(keep_versions)
    head_tags = (
        _resolve_doc(fs, jvm, root, max(keep_versions)).get("tags") or {}
    )
    for t in head_tags.values():
        if t["version"] not in keep_versions and t["version"] in listed:
            keep_versions.append(t["version"])
    referenced: set[str] = set()
    referenced_dv: set[str] = set()
    referenced_stats: set[str] = set()
    closure: set[int] = set()
    for v in keep_versions:
        kept_doc = _resolve_doc(fs, jvm, root, v)
        referenced.update(_all_vrels(kept_doc))
        if kept_doc.get("dv"):
            referenced_dv.update(_dv_rels(kept_doc["dv"]))
        referenced_stats.update(
            (kept_doc.get("files_manifests") or {}).values()
        )
        closure.update(_ancestors(fs, jvm, root, v))
    # live BRANCHES: every branch commit's data/DV/stats is staged under
    # this root and resolves through main-chain ancestors at-or-below
    # the fork point — all of it stays protected until the branch is
    # deleted or published
    rs = _branch_key(root)
    for bname, bbase in _list_branch_refs(fs, jvm, root):
        tok = _BRANCH_CTX.set(
            {**(_BRANCH_CTX.get() or {}), rs: (bname, bbase)}
        )
        try:
            for bv in _list_dir_versions(fs, jvm, _branch_dir(root, bname)):
                try:
                    bdoc = _resolve_doc(fs, jvm, root, bv)
                except Exception:
                    continue
                referenced.update(_all_vrels(bdoc))
                if bdoc.get("dv"):
                    referenced_dv.update(_dv_rels(bdoc["dv"]))
                referenced_stats.update(
                    (bdoc.get("files_manifests") or {}).values()
                )
                try:
                    ch = _load_raw(fs, jvm, root, bv).get("change_data")
                except Exception:
                    ch = None
                if ch and ch.get("rel"):
                    referenced.add(ch["rel"])
                closure.update(
                    a
                    for a in _ancestors(fs, jvm, root, bv)
                    if a <= bbase
                )
        finally:
            _BRANCH_CTX.reset(tok)
    # dirs referenced ONLY by expiring manifests are provably superseded
    # data — deletable immediately, no grace needed (they cannot be a
    # concurrent committer's staging: staging is never manifest-listed)
    superseded: set[str] = set()
    superseded_dv: set[str] = set()
    superseded_stats: set[str] = set()
    for v in listed:
        if v not in keep_versions:
            try:
                old = _resolve_doc(fs, jvm, root, v)
            except Exception:
                continue
            superseded.update(_all_vrels(old) - referenced)
            if old.get("dv"):
                superseded_dv.update(
                    set(_dv_rels(old["dv"])) - referenced_dv
                )
            superseded_stats.update(
                set((old.get("files_manifests") or {}).values())
                - referenced_stats
            )
    cutoff = int(time.time() * 1000) - _ORPHAN_GRACE_MS

    # split-layout leaf stats files: same lifecycle — keep what retained
    # manifests point at, reclaim superseded pointers immediately and
    # crashed attempts' orphans past the grace window
    sdir = jvm.org.apache.hadoop.fs.Path(f"{root.rstrip('/')}/{_STATS_SUBDIR}")
    if fs.exists(sdir):
        for st in fs.listStatus(sdir):
            name = st.getPath().getName()
            if name in referenced_stats:
                continue
            if name in superseded_stats or st.getModificationTime() < cutoff:
                fs.delete(st.getPath(), False)

    # change-data sidecars (root/_changes/__v…): referenced per-commit —
    # a kept version's raw manifest is the pointer; anything else is
    # reclaimable immediately (superseded commit) or past the grace
    # window (crashed attempt)
    referenced_ch: set[str] = set()
    for v in keep_versions:
        try:
            ch = _load_raw(fs, jvm, root, v).get("change_data")
        except Exception:
            ch = None
        if ch and ch.get("rel"):
            referenced_ch.add(ch["rel"])
    chp = jvm.org.apache.hadoop.fs.Path(f"{root.rstrip('/')}/{_CHANGES_DIR}")
    if fs.exists(chp):
        superseded_ch: set[str] = set()
        for v in listed:
            if v not in keep_versions:
                try:
                    ch = _load_raw(fs, jvm, root, v).get("change_data")
                except Exception:
                    continue
                if ch and ch.get("rel") and ch["rel"] not in referenced_ch:
                    superseded_ch.add(ch["rel"])
        for st in fs.listStatus(chp):
            r = f"{_CHANGES_DIR}/{st.getPath().getName()}"
            # `referenced` additionally carries live BRANCH commits'
            # change sidecars (collected above)
            if r in referenced_ch or r in referenced:
                continue
            if r in superseded_ch or st.getModificationTime() < cutoff:
                fs.delete(st.getPath(), True)

    # deletion-vector datasets (root/_dv/__v…): same lifecycle as version
    # subdirs — keep what retained manifests point at, reclaim superseded
    # pointers immediately and crashed attempts past the grace window.
    # (The __v walk below never descends into '_'-prefixed dirs.)
    dvp = jvm.org.apache.hadoop.fs.Path(f"{root.rstrip('/')}/{_DV_DIR}")
    if fs.exists(dvp):
        for st in fs.listStatus(dvp):
            r = f"{_DV_DIR}/{st.getPath().getName()}"
            if r in referenced_dv:
                continue
            if r in superseded_dv or st.getModificationTime() < cutoff:
                fs.delete(st.getPath(), True)

    # walk every __v dir under the table (any depth ≥ 1 below root)
    stack = [(jvm.org.apache.hadoop.fs.Path(root), "")]
    while stack:
        path, rel = stack.pop()
        for st in fs.listStatus(path):
            name = st.getPath().getName()
            if not st.isDirectory():
                continue
            r = f"{rel}/{name}" if rel else name
            if name.startswith("__v"):
                if r in referenced:
                    pass
                elif r in superseded or st.getModificationTime() < cutoff:
                    fs.delete(st.getPath(), True)
            elif not name.startswith(("_", ".")):
                stack.append((st.getPath(), r))

    # manifest files: keep the retained versions AND their delta-chain
    # ancestors (needed for resolution — their exclusive DATA is already
    # reclaimed above, they are metadata-only survivors)
    for v in listed:
        if v not in closure and v < max(keep_versions):
            fs.delete(
                jvm.org.apache.hadoop.fs.Path(_manifest_path(root, v)), False
            )


def compact_manifested(
    spark: SparkSession,
    root: str,
    fmt: str = "parquet",
    target_file_bytes: int = 256 * 1024 * 1024,
    min_files: int = 2,
    sort_cols: list[str] | None = None,
    zorder_cols: list[str] | None = None,
) -> list[str]:
    """OPTIMIZE for a manifested table: rewrite every leaf holding at
    least ``min_files`` data files into ~``target_file_bytes`` outputs,
    published as new version subdirs in one atomic manifest commit — no
    logical change, readers never see a half-compacted table, and a
    crash before the commit leaves only GC-able orphans. Leaves already
    compact are not rewritten (their version subdirs carry over), so
    repeated runs converge to a no-op. Returns the leaf rels compacted.

    ``sort_cols`` additionally clusters rows WITHIN the rewritten files
    (sortWithinPartitions — no extra shuffle): compaction doubles as a
    re-clustering pass, tightening per-file min/max footer stats so
    later scans filtered on those columns prune row groups. Plain
    columns cover the common time-ordered case.

    ``zorder_cols`` (mutually exclusive with ``sort_cols``) makes
    OPTIMIZE a multi-dimensional re-clustering pass — Delta's
    ``OPTIMIZE ... ZORDER BY``: rows are RANGE-partitioned on the
    Morton interleave of the quantized columns (io/layout.py
    `zorder_key`) and sorted by it within each writer task, so every
    rewritten file spans a compact hyper-rectangle in ``zorder_cols``
    space. With those columns in `manifest_init(stats_cols=…)`, the
    commit records tight per-file min/max on EVERY clustered dimension
    and `read_manifested(prune_ranges=…)` skips files for predicates on
    ANY of them — not just a lead sort key. The range partitioner
    replaces the per-leaf byte-sized hash sharding (file sizes then
    follow the key distribution); numeric columns only (quantization).

    This is the maintenance companion to the streaming CDC sink: every
    micro-batch merge writes at least one file per touched leaf, so a
    long-lived feed accretes small files; compaction restores scan
    efficiency without pausing ingest at all: the optimistic commit loop
    lets OPTIMIZE race the CDC committer, the loser re-running against
    the winner's snapshot.

    Scale: ONE Spark job for all compacted leaves — the read is pruned
    to them, rows are repartitioned on (partition cols + a per-leaf
    shard id sized from the leaf's on-disk bytes), so each output leaf
    gets ceil(bytes/target) writer tasks → that many files, and a
    10k-file day compacts in one shuffle instead of 10k driver-side
    jobs. File listing is manifest-resolved (no directory walk of
    superseded versions)."""
    if sort_cols and zorder_cols:
        raise ValueError(
            "compact_manifested: sort_cols and zorder_cols are mutually "
            "exclusive (a Z-order rewrite defines its own ordering)"
        )
    roots = root.rstrip("/")
    fs, jvm = _hadoop_fs(spark, roots)
    _clean_stale_staging(fs, jvm, roots)

    def _attempt(doc, new_version, token):
        mixed = bool(doc.get("partition_specs"))
        mapping = doc["partitions"]
        if not mapping:
            return True, [], []
        if mixed:
            # spec-EVOLVED table: outputs land under the CURRENT spec —
            # OPTIMIZE doubles as progressive migration (each compacted
            # old-generation leaf is re-keyed whole; the table converges
            # to the current layout leaf by leaf, no full-table rewrite)
            cols = list(doc.get("partition_transforms") or {})
        else:
            # partition columns from any leaf rel: 'dt=d1/seg=A' → ['dt','seg']
            cols = [
                seg.split("=", 1)[0] for seg in next(iter(mapping)).split("/")
            ]

        # per-leaf file inventory through the manifest (current versions
        # only, APPEND extras included — a leaf accreting append vrels
        # is exactly what compaction exists to consolidate)
        stats: dict[str, tuple[int, int]] = {}
        for rel in mapping:
            n, nbytes = 0, 0
            for vrel in _leaf_vrels(doc, rel):
                for st in fs.listStatus(
                    jvm.org.apache.hadoop.fs.Path(f"{roots}/{vrel}")
                ):
                    name = st.getPath().getName()
                    if st.isFile() and not name.startswith(("_", ".")):
                        n += 1
                        nbytes += st.getLen()
            stats[rel] = (n, nbytes)
        to_compact = {
            rel: max(1, -(-nbytes // target_file_bytes))
            for rel, (n, nbytes) in stats.items()
            if n >= min_files
        }
        if not to_compact:
            return True, [], []

        keep = [v for v in _list_manifest_versions(fs, jvm, roots)][-_RETAIN:]
        _gc(fs, jvm, roots, keep)

        old_scope: list[str] = []
        if mixed:
            leaf_spec = doc.get("leaf_spec") or {}
            cur_id = len(doc["partition_specs"]) - 1
            old_tc = sorted(
                r
                for r in to_compact
                if int(leaf_spec.get(r, cur_id)) != cur_id
            )
            cur_tc = [r for r in to_compact if r not in set(old_tc)]
            tloc = _located_with_leaf(spark, roots, fmt, cols)
            affected0 = [
                tuple(seg.split("=", 1)[1] for seg in rel.split("/"))
                for rel in cur_tc
            ]
            touched = tloc.filter(
                F.col("__leaf").isin(old_tc) if old_tc else F.lit(False)
            )
            values, old_scope, scoped = _mixed_dml_scope(
                doc, cols, tloc, affected0, touched
            )
            # a fully-DV-deleted old leaf contributes no rows but must
            # still be materialized out of the snapshot
            old_scope = sorted(set(old_scope) | set(old_tc))
            # shard sizing: a compacted current leaf keeps its measured
            # bytes; re-keyed rows from old-generation leaves spread
            # across the affected current leaves — estimated uniformly
            # (sizing only; correctness is unaffected)
            extra = sum(stats[r][1] for r in old_tc) // max(1, len(values))
            to_compact = {
                _part_rel(cols, v): max(
                    1,
                    -(
                        -(stats.get(_part_rel(cols, v), (0, 0))[1] + extra)
                        // target_file_bytes
                    ),
                )
                for v in values
            }
            values = [
                tuple(seg.split("=", 1)[1] for seg in rel.split("/"))
                for rel in to_compact
            ]
        else:
            values = [tuple(rel_to) for rel_to in (
                tuple(seg.split("=", 1)[1] for seg in rel.split("/")) for rel in to_compact
            )]
            scoped = read_manifested(
                spark, roots, fmt, pin_partition_strings=True, partition_cols=cols
            ).filter(_partition_filter(cols, values))
        shards = spark.createDataFrame(
            [tuple(v) + (n,) for v, n in zip(values, to_compact.values())],
            ", ".join(f"{c} STRING" for c in cols) + ", __n_shards INT",
        )
        if zorder_cols:
            # Z-order rewrite: range-partition on (leaf cols, Morton key) so
            # each writer task holds a CONTIGUOUS zkey slice of one leaf —
            # its output file is a compact hyper-rectangle in zorder space.
            # One tiny bounds agg (a single driver row) feeds quantization.
            from etl_demo_spark.io.layout import _BITS, _quantize, zorder_key

            bits = min(_BITS, 63 // len(zorder_cols))
            baggs = []
            for c in zorder_cols:
                baggs += [F.min(c).alias(f"__lo_{c}"), F.max(c).alias(f"__hi_{c}")]
            brow = scoped.agg(*baggs).collect()[0]
            quantized = []
            for c in zorder_cols:
                lo, hi = brow[f"__lo_{c}"], brow[f"__hi_{c}"]
                if lo is None or hi is None:
                    raise ValueError(
                        f"compact_manifested: zorder column {c!r} is all-NULL"
                    )
                quantized.append(_quantize(F.col(c), float(lo), float(hi), bits=bits))
            total_shards = int(sum(to_compact.values()))
            packed = (
                scoped.withColumn("__zkey", zorder_key(quantized, bits=bits))
                .repartitionByRange(max(total_shards, 1), *cols, F.col("__zkey"))
                .sortWithinPartitions(*cols, "__zkey")
                .drop("__zkey")
            )
        else:
            packed = (
                scoped.join(F.broadcast(shards), cols)
                .withColumn(
                    "__shard",
                    F.pmod(
                        F.hash(F.struct(*[c for c in scoped.columns])),
                        F.col("__n_shards"),
                    ),
                )
                .repartition(*cols, "__shard")
            )
            if sort_cols:
                # task-local sort: rows land in their file ordered by the
                # cluster key (leaf grouping is preserved — the partitionBy
                # writer splits by leaf regardless of row order in the task)
                packed = packed.sortWithinPartitions(*cols, *sort_cols)
            packed = packed.drop("__n_shards", "__shard")
        staging = f"{roots}.__manifest_staging__{token}"
        _to_physical(packed, doc.get("column_mapping")).write.mode(
            "overwrite"
        ).partitionBy(*cols).format(fmt).save(staging)

        new_mapping = dict(mapping)
        staged_vrels: list[str] = []
        for rel in to_compact:
            staged = jvm.org.apache.hadoop.fs.Path(f"{staging}/{rel}")
            if not fs.exists(staged):
                # a leaf whose every row is deletion-vector-deleted reads
                # as empty: the rewrite MATERIALIZES that deletion, so
                # the leaf drops out of the snapshot
                new_mapping.pop(rel, None)
                continue
            vrel = f"{rel}/{_vdir(new_version, token)}"
            _mkdirs_parent(fs, jvm, f"{roots}/{vrel}")
            fs.rename(staged, jvm.org.apache.hadoop.fs.Path(f"{roots}/{vrel}"))
            new_mapping[rel] = vrel
            staged_vrels.append(vrel)
        for rel in old_scope:  # re-keyed into the current spec above
            new_mapping.pop(rel, None)
        fs.delete(jvm.org.apache.hadoop.fs.Path(staging), True)

        new_doc = {"version": new_version, "partitions": new_mapping}
        if mixed:
            _prune_leaf_spec(doc, new_doc)
        if doc.get("schema") is not None:
            new_doc["schema"] = doc["schema"]
        _carry_mapping(doc, new_doc)
        _carry_constraints(doc, new_doc)
        _carry_dv(doc, new_doc)
        _carry_extras(doc, new_doc)
        _attach_stats(spark, fmt, roots, doc, new_doc, staged_vrels, token)
        new_doc["operation"] = "OPTIMIZE"
        if doc.get("change_feed"):
            # a compaction changes no row: an explicit EMPTY change set
            # lets the table stream glide through maintenance commits
            _stage_change_data(
                fs, jvm, roots, fmt, new_version, token, None, new_doc
            )
        ok = _publish_cas(
            fs,
            jvm,
            _manifest_path(roots, new_version),
            _encode_commit(doc, new_doc),
        )
        return ok, staged_vrels, sorted(set(to_compact) | set(old_scope)), new_doc

    return _commit_retry(fs, jvm, roots, _attempt)


def repartition_manifested(
    spark: SparkSession,
    root: str,
    new_partition_cols,
    fmt: str = "parquet",
    target_file_bytes: int = 256 * 1024 * 1024,
) -> list[str]:
    """CHANGE THE TABLE'S PARTITIONING in one atomic commit — the
    recovery for "we partitioned by the wrong column": every row is
    rewritten under the new ``k=v`` layout, published as one pointer
    swap. Readers racing the rewrite see the old layout until the
    commit, the new one after — never a mix; time travel still reads
    the old layout. Deletion vectors are MATERIALIZED by the rewrite
    (the read applies them); schema, constraints, column mapping, and
    stats/bloom config carry (stats recompute for the new files).

    Honesty note vs real table formats: Iceberg's partition-spec
    evolution is metadata-only and applies the new spec to NEW data,
    at the cost of multi-spec scan planning; this engine rewrites
    physically — a full-table job you schedule like a compaction, after
    which every query benefits immediately. The new partition columns
    must exist in the schema and (under column mapping) be
    identity-mapped — a renamed column cannot become a directory name
    without ambiguity.

    Scale: ONE shuffle sized by the table (repartition on the new keys
    with byte-derived shard counts), the same job shape as a full
    compaction. Returns the new leaf rels."""
    cols = _normalize_partition_cols(new_partition_cols)
    roots = root.rstrip("/")
    fs, jvm = _hadoop_fs(spark, roots)
    _clean_stale_staging(fs, jvm, roots)

    def _attempt(doc, new_version, token):
        mapping = doc["partitions"]
        if not mapping:
            return True, [], []
        cmap = doc.get("column_mapping") or {}
        for c in cols:
            if cmap.get(c, c) != c:
                raise ValueError(
                    f"repartition_manifested: {c!r} is renamed under column "
                    f"mapping (physical {cmap[c]!r}); partition columns must "
                    "be identity-mapped"
                )
        target = read_manifested(spark, roots, fmt, version=doc["version"])
        missing = [c for c in cols if c not in target.columns]
        if missing:
            raise ValueError(
                f"repartition_manifested: columns {missing} not in table "
                f"schema {target.columns}"
            )
        # size the shuffle from the table's on-disk bytes
        nbytes = 0
        for vrel in mapping.values():
            for st in fs.listStatus(
                jvm.org.apache.hadoop.fs.Path(f"{roots}/{vrel}")
            ):
                if st.isFile():
                    nbytes += st.getLen()
        shards = max(1, -(-nbytes // target_file_bytes))
        out = target
        for c in cols:
            out = out.withColumn(c, F.col(c).cast("string"))
        staging = f"{roots}.__manifest_staging__{token}"
        _to_physical(
            out.repartition(shards, *cols), doc.get("column_mapping")
        ).write.mode("overwrite").partitionBy(*cols).format(fmt).save(staging)

        new_mapping: dict = {}
        staged_vrels: list[str] = []
        stack = [(jvm.org.apache.hadoop.fs.Path(staging), "", 0)]
        while stack:
            path, rel, d = stack.pop()
            for st in fs.listStatus(path):
                name = st.getPath().getName()
                if not st.isDirectory() or "=" not in name:
                    continue
                r = f"{rel}/{name}" if rel else name
                if d + 1 == len(cols):
                    vrel = f"{r}/{_vdir(new_version, token)}"
                    _mkdirs_parent(fs, jvm, f"{roots}/{vrel}")
                    fs.rename(
                        st.getPath(),
                        jvm.org.apache.hadoop.fs.Path(f"{roots}/{vrel}"),
                    )
                    new_mapping[r] = vrel
                    staged_vrels.append(vrel)
                else:
                    stack.append((st.getPath(), r, d + 1))
        fs.delete(jvm.org.apache.hadoop.fs.Path(staging), True)

        new_doc = {"version": new_version, "partitions": new_mapping}
        if doc.get("schema") is not None:
            new_doc["schema"] = doc["schema"]
        _carry_mapping(doc, new_doc)
        _carry_constraints(doc, new_doc)
        # DVs were materialized by the DV-applying read; drop the pointer
        _carry_extras(doc, new_doc)
        # the rewrite consolidated every leaf under the new classic
        # layout: explicit nulls STOP delta-chain inheritance of the
        # transform spec and any evolution history
        new_doc["partition_transforms"] = None
        new_doc["partition_specs"] = None
        new_doc["leaf_spec"] = None
        _attach_stats(spark, fmt, roots, doc, new_doc, staged_vrels, token)
        new_doc["operation"] = "REPARTITION"
        if doc.get("change_feed"):
            _stage_change_data(  # row no-op, like OPTIMIZE
                fs, jvm, roots, fmt, new_version, token, None, new_doc
            )
        ok = _publish_cas(
            fs, jvm, _manifest_path(roots, new_version), _encode_commit(doc, new_doc)
        )
        return ok, staged_vrels, sorted(new_mapping), new_doc

    return _commit_retry(fs, jvm, roots, _attempt)


def manifest_diff(
    spark: SparkSession, root: str, v_from: int, v_to: int | None = None
) -> dict:
    """Audit what changed between two retained snapshots from METADATA
    alone — no data files are opened. Returns
    ``{leaf_rel: {"status": added|removed|rewritten,
    "rows_before": n|None, "rows_after": n|None}}`` for every leaf whose
    version subdir differs between the manifests; unchanged leaves are
    omitted. Row counts come from the per-file stats recorded at commit
    (``stats_cols`` tables — any column choice records counts); tables
    without stats still get the leaf-level status, with None counts.

    The observability half of time travel: after an incident, "which
    partitions did last night's merge rewrite and what did it do to
    their row counts" is one pointer-file read per side. Bounded by the
    retention window like every versioned read."""
    fs, jvm = _hadoop_fs(spark, root)
    a = _load_doc(fs, jvm, root, v_from)
    b = _load_doc(fs, jvm, root, v_to)

    def leaf_rows(doc: dict, vrel: str):
        files = doc.get("files")
        if files is None and doc.get("files_manifests") is not None:
            # split layout: load only the ONE leaf this vrel belongs to
            files = _read_split_stats(
                fs, jvm, root, doc, leaves={vrel.rsplit("/", 1)[0]}
            )
        if files is None:
            return None
        total = 0
        for p, st in files.items():
            if p.rsplit("/", 1)[0] == vrel and "__rows" in st:
                total += st["__rows"]
        return total

    def leaf_dv(doc: dict, vrel: str) -> int:
        dv = doc.get("dv")
        if not dv:
            return 0
        return sum(
            n for p, n in dv["files"].items() if p.rsplit("/", 1)[0] == vrel
        )

    out: dict = {}
    pa, pb = a["partitions"], b["partitions"]
    for rel in sorted(set(pa) | set(pb)):
        va, vb = pa.get(rel), pb.get(rel)
        if va == vb:
            # primary unchanged, but APPEND extras may have grown
            ea = (a.get("extra_vrels") or {}).get(rel, [])
            eb = (b.get("extra_vrels") or {}).get(rel, [])
            # DV deletes can land in append extras too — count them over
            # the leaf's FULL vrel set on both sides, mirroring the row sum
            dv_a = sum(leaf_dv(a, v) for v in [va] + list(ea))
            dv_b = sum(leaf_dv(b, v) for v in [vb] + list(eb))
            if list(ea) != list(eb):
                before = sum(leaf_rows(a, v) or 0 for v in [va] + list(ea))
                after = sum(leaf_rows(b, v) or 0 for v in [vb] + list(eb))
                out[rel] = {
                    "status": "rows_appended",
                    "rows_before": before - dv_a,
                    "rows_after": after - dv_b,
                }
                continue
            # same files, but a deletion-vector commit may have logically
            # deleted rows in place — surface it (live = physical − DV'd)
            if va is not None and dv_a != dv_b:
                before = leaf_rows(a, va)
                after = leaf_rows(b, vb)
                if before is not None:
                    before += sum(leaf_rows(a, v) or 0 for v in ea)
                if after is not None:
                    after += sum(leaf_rows(b, v) or 0 for v in eb)
                out[rel] = {
                    "status": "rows_deleted",
                    "rows_before": None if before is None else before - dv_a,
                    "rows_after": None if after is None else after - dv_b,
                }
            continue
        status = "added" if va is None else "removed" if vb is None else "rewritten"
        out[rel] = {
            "status": status,
            "rows_before": None if va is None else leaf_rows(a, va),
            "rows_after": None if vb is None else leaf_rows(b, vb),
        }
    return out


def _events_plan(
    fs, jvm, root: str, v_from: int, v_to: int
) -> dict | None:
    """Per-commit EVENT-SOURCE plan for the range (v_from, v_to]: which
    change sidecars and appended vrels cover every commit, or ``None``
    when any rewrite commit lacks a sidecar (callers then fall back to
    the net-diff `read_changes`). Metadata-only; verifies the needed
    dirs still exist (an expired intermediate's sidecar may be gone)."""
    from etl_demo_spark.io.table_stream import _commit_inserts

    sidecars: list[tuple[int, str]] = []
    appends: list[tuple[int, str]] = []
    prev = _resolve_doc(fs, jvm, root, v_from) if v_from > 0 else {
        "version": 0, "partitions": {}
    }
    for v in range(v_from + 1, v_to + 1):
        try:
            cur = _resolve_doc(fs, jvm, root, v)
        except Exception:
            return None
        ch = cur.get("change_data")
        if ch is not None:
            if ch.get("rel"):
                if not fs.exists(
                    jvm.org.apache.hadoop.fs.Path(
                        f"{root.rstrip('/')}/{ch['rel']}"
                    )
                ):
                    return None  # reclaimed intermediate sidecar
                sidecars.append((v, ch["rel"]))
            prev = cur
            continue
        try:
            vrels = _commit_inserts(prev, cur, "fail", root)
        except ValueError:
            return None  # rewrite without a sidecar
        appends.extend((v, r) for r in vrels)
        prev = cur
    return {"sidecars": sidecars, "appends": appends, "to_doc": prev}


def read_change_events(
    spark: SparkSession,
    root: str,
    v_from: int,
    v_to: int,
    fmt: str = "parquet",
) -> DataFrame:
    """PER-COMMIT change events for (v_from, v_to] — the O(changes)
    sibling of `read_changes`: appends feed their new vrels as inserts
    and every rewrite commit feeds its recorded CHANGE SIDECAR
    (``change_feed=True`` tables), so the cost is the bytes of what
    actually changed — never a whole-leaf EXCEPT ALL. Row multiset =
    the net diff PLUS intra-range churn (a row updated twice appears
    twice), which folds identically through any linear aggregate — the
    MV fold consumes this when available. Raises ValueError when a
    rewrite commit has no sidecar (use `read_changes` there)."""
    fs, jvm = _hadoop_fs(spark, root)
    a = _load_doc(fs, jvm, root, v_from)
    b = _load_doc(fs, jvm, root, v_to)
    if b["version"] <= a["version"]:
        raise ValueError(
            f"read_change_events: v_to ({b['version']}) must be newer "
            f"than v_from ({a['version']})"
        )
    plan = _events_plan(fs, jvm, root, a["version"], b["version"])
    if plan is None:
        raise ValueError(
            f"read_change_events: range v{a['version']}..v{b['version']} of "
            f"{root} contains a rewrite without a change sidecar; use "
            "read_changes (net diff) instead"
        )
    schema_json = b.get("schema") or a.get("schema")
    schema = (
        T.StructType.fromJson(json.loads(schema_json)) if schema_json else None
    )
    cm = (b if b.get("schema") else a).get("column_mapping") or {}

    def normalize(df: DataFrame, insert_only: bool) -> DataFrame:
        cols = []
        for f in schema.fields:
            phys = cm.get(f.name, f.name)
            cols.append(
                (
                    F.col(phys) if phys in df.columns else F.lit(None)
                ).cast(f.dataType).alias(f.name)
            )
        if insert_only:
            cols.append(F.lit("insert").alias("_change_type"))
        else:
            cols.append(F.col("_change_type"))
        return df.select(*cols)

    if schema is None:
        raise ValueError(
            f"read_change_events: {root} has no stored schema"
        )
    parts: list[DataFrame] = []
    app_vrels = [r for _, r in plan["appends"]]
    if app_vrels:
        reader = spark.read.format(fmt).option("basePath", root)
        df = reader.schema(_physical_schema(schema, cm)).load(
            [f"{root.rstrip('/')}/{v}" for v in sorted(app_vrels)]
        )
        parts.append(normalize(df, insert_only=True))
    for _, rel in plan["sidecars"]:
        # per-dir inference read: sidecar physical types vary by
        # committer (string-cast partition cols vs typed), the explicit
        # casts in normalize() reconcile them
        parts.append(
            normalize(
                spark.read.format(fmt).load(f"{root.rstrip('/')}/{rel}"),
                insert_only=False,
            )
        )
    if not parts:
        empty = spark.createDataFrame([], schema)
        return empty.withColumn("_change_type", F.lit("insert")).filter(
            F.lit(False)
        )
    out = parts[0]
    for pdf in parts[1:]:
        out = out.unionByName(pdf)
    return out


def manifest_expire(
    spark: SparkSession,
    root: str,
    keep: int = 1,
    drop_tags: bool = False,
) -> list[int]:
    """Expire old snapshots NOW: keep the newest ``keep`` manifests,
    delete every older manifest and every version subdir only they
    reference. This is the snapshot-expiry maintenance op (VACUUM): run
    it after `delete_keys_manifested` when a right-to-erasure request
    must become PHYSICAL deletion rather than waiting for a later
    commit's retention GC — with ``keep=1`` the deleted rows' bytes are
    gone when it returns. It also shrinks the time-travel window to the
    kept versions, and any reader still resolving an expired manifest
    mid-scan can fail — same in-flight-reader grace trade-off every
    snapshot format's expire operation has.

    TAGS BLOCK PHYSICAL DELETION: GC keeps every tag-pinned snapshot
    (including ``catalog:<release>`` tags), so a live tag on a version
    outside the keep window would silently keep the very bytes an
    erasure run must destroy. This op therefore REFUSES (raises
    ``ValueError`` naming the tags) when live tags pin versions older
    than the keep window, unless ``drop_tags=True`` — which deletes
    those tags first (each an audited ``tag_delete`` commit; a release
    tag dropped here leaves the catalog-level release dangling — delete
    it with ``catalog_tag_delete`` for a clean audit trail). Returns
    the versions kept."""
    if keep < 1:
        raise ValueError("manifest_expire: keep must be >= 1")
    fs, jvm = _hadoop_fs(spark, root)
    versions = _list_manifest_versions(fs, jvm, root)
    if not versions:
        raise FileNotFoundError(f"no manifest under {root}/{_MANIFEST_DIR}")
    kept = versions[-keep:]
    blocking = {
        name: t["version"]
        for name, t in (
            _resolve_doc(fs, jvm, root, versions[-1]).get("tags") or {}
        ).items()
        if t["version"] not in kept and t["version"] in versions
    }
    if blocking and not drop_tags:
        raise ValueError(
            f"manifest_expire: live tags pin snapshots outside keep={keep} "
            f"on {root}: {dict(sorted(blocking.items()))} — their bytes "
            "would survive this expire. Delete the tags (tag_delete / "
            "catalog_tag_delete for releases) or pass drop_tags=True to "
            "drop them here; physical erasure cannot proceed under a "
            "live pin."
        )
    if blocking:
        # Each tag_delete appends an UNTAG commit; re-deriving kept as
        # versions[-keep:] would let those metadata commits displace up
        # to len(blocking) REAL historical snapshots out of the keep
        # window. Keep the originally promised data versions AND the
        # new UNTAG head chain (the head must survive regardless).
        old_head = versions[-1]
        for name in sorted(blocking):
            tag_delete(spark, root, name)
        versions = _list_manifest_versions(fs, jvm, root)
        kept = sorted(set(kept) | {v for v in versions if v > old_head})
    # checkpoint every kept DELTA manifest as a FULL snapshot in place
    # (same version number, equivalent resolved content) so its ancestor
    # chain — and any data only those ancestors reference — can be
    # dropped: erasure must not be blocked by metadata-resolution links.
    # The in-place swap is atomic locally (NIO ATOMIC_MOVE); a racing
    # reader resolves either the delta (ancestors still present) or the
    # identical full. On stores without atomic replace this maintenance
    # op has a sub-ms non-atomic window — documented, maintenance-only.
    for v in kept:
        raw = _load_raw(fs, jvm, root, v)
        if "parent" not in raw:
            continue
        doc = _resolve_doc(fs, jvm, root, v)
        full = {k: x for k, x in doc.items() if not k.startswith("_")}
        data = json.dumps(full, indent=1).encode()
        path = _manifest_path(root, v)
        tmp = f"{path}.{uuid.uuid4().hex[:8]}.tmp"
        stream = fs.create(jvm.org.apache.hadoop.fs.Path(tmp), True)
        try:
            stream.write(bytearray(data))
        finally:
            stream.close()
        if fs.getUri().getScheme() == "file":
            # varargs CopyOption... needs a real Java array via py4j
            opts = spark.sparkContext._gateway.new_array(
                jvm.java.nio.file.CopyOption, 2
            )
            opts[0] = jvm.java.nio.file.StandardCopyOption.ATOMIC_MOVE
            opts[1] = jvm.java.nio.file.StandardCopyOption.REPLACE_EXISTING
            jvm.java.nio.file.Files.move(
                jvm.java.io.File(_strip_scheme(tmp)).toPath(),
                jvm.java.io.File(_strip_scheme(path)).toPath(),
                opts,
            )
        else:
            fs.delete(jvm.org.apache.hadoop.fs.Path(path), False)
            fs.rename(
                jvm.org.apache.hadoop.fs.Path(tmp),
                jvm.org.apache.hadoop.fs.Path(path),
            )
    _gc(fs, jvm, root, kept)
    return kept


def delete_keys_manifested(
    spark: SparkSession,
    target_path: str,
    keys_df: DataFrame,
    keys: list[str],
    partition_cols,
    fmt: str = "parquet",
    tombstones: bool = False,
) -> list:
    """DELETE-by-key with snapshot-manifest publication: the manifested
    twin of `tables.delete_keys_partitioned`. New version subdirs are
    written for the partitions that contained a matched key (a fully
    drained partition simply drops out of the new manifest), and the
    deletion becomes visible in one atomic pointer commit — a racing
    reader sees the table entirely before or entirely after the erasure,
    which is exactly the auditability a right-to-erasure job wants.
    On a spec-EVOLVED (mixed-generation) table the erasure is
    leaf-scoped like the DML trio: old-generation leaves holding a
    matched key are rewritten whole, re-keyed into the CURRENT spec;
    untouched leaves of every generation stay byte-identical.
    ``tombstones=True`` (change_feed tables): stage a REDACTED change
    sidecar — keys-only delete rows, every other column NULL — so the
    erasure cascades through CDC without replicating erased payload
    (default False: no change data; streams apply on_rewrite).
    Retention note: the superseded version subdirs (still holding the
    deleted rows) survive until a later commit's GC — run a follow-up
    commit (or trim retention) when erasure must become physical."""
    cols = _normalize_partition_cols(partition_cols)
    single = isinstance(partition_cols, str) or len(cols) == 1
    root = target_path.rstrip("/")
    fs, jvm = _hadoop_fs(spark, root)
    _clean_stale_staging(fs, jvm, root)

    def _attempt(doc, new_version, token):
        mixed = _mixed_spec_guard(doc, cols, "delete_keys_manifested")
        mapping = doc["partitions"]
        keep = [v for v in _list_manifest_versions(fs, jvm, root)][-_RETAIN:]
        _gc(fs, jvm, root, keep)
        if not mapping:
            return True, [], []

        if mixed:
            tloc = _located_with_leaf(spark, root, fmt, cols)
            target = tloc.drop("__leaf")
        else:
            tloc = None
            target = read_manifested(
                spark, root, fmt, pin_partition_strings=True,
                partition_cols=cols,
            )
        key_set = keys_df.select(*keys).distinct()
        touched = (tloc if mixed else target).join(key_set, keys, "left_semi")
        affected = [
            tuple(r) for r in touched.select(*cols).distinct().collect()
        ]
        if not affected:
            return True, [], []

        old_scope: list[str] = []
        if mixed:
            affected, old_scope, scoped = _mixed_dml_scope(
                doc, cols, tloc, affected, touched
            )
        else:
            scoped = target.filter(_partition_filter(cols, affected))
        remaining = scoped.join(key_set, keys, "left_anti")
        for c in cols:
            remaining = remaining.withColumn(c, F.col(c).cast("string"))
        staging = f"{root}.__manifest_staging__{token}"
        _to_physical(remaining, doc.get("column_mapping")).write.mode(
            "overwrite"
        ).partitionBy(*cols).format(fmt).save(staging)

        new_mapping = dict(mapping)
        staged_vrels: list[str] = []
        for values in affected:
            rel = _part_rel(cols, values)
            staged = jvm.org.apache.hadoop.fs.Path(f"{staging}/{rel}")
            if fs.exists(staged):
                vrel = f"{rel}/{_vdir(new_version, token)}"
                dest = f"{root}/{vrel}"
                _mkdirs_parent(fs, jvm, dest)
                fs.rename(staged, jvm.org.apache.hadoop.fs.Path(dest))
                new_mapping[rel] = vrel
                staged_vrels.append(vrel)
            else:  # every row deleted — the leaf leaves the snapshot
                new_mapping.pop(rel, None)
        for rel in old_scope:  # re-keyed into the current spec above
            new_mapping.pop(rel, None)
        fs.delete(jvm.org.apache.hadoop.fs.Path(staging), True)

        new_doc = {"version": new_version, "partitions": new_mapping}
        if mixed:
            _prune_leaf_spec(doc, new_doc)
        if doc.get("schema") is not None:
            new_doc["schema"] = doc["schema"]  # deletion never changes schema
        _carry_mapping(doc, new_doc)
        _carry_constraints(doc, new_doc)
        _carry_dv(doc, new_doc)
        _carry_extras(doc, new_doc)
        _attach_stats(spark, fmt, root, doc, new_doc, staged_vrels, token)
        new_doc["operation"] = "DELETE"
        change_rels: list[str] = []
        if tombstones and doc.get("change_feed"):
            tomb = _redacted_tombstones(doc, touched, keys)
            change_rels = _stage_change_data(
                fs, jvm, root, fmt, new_version, token,
                _to_physical(tomb, doc.get("column_mapping")),
                new_doc,
            )
        ok = _publish_cas(
            fs,
            jvm,
            _manifest_path(root, new_version),
            _encode_commit(doc, new_doc),
        )
        result = [values[0] for values in affected] if single else affected
        return ok, staged_vrels + change_rels, result, new_doc

    return _commit_retry(fs, jvm, root, _attempt)


def merge_upsert_manifested(
    spark: SparkSession,
    target_path: str,
    source: DataFrame,
    keys: list[str],
    partition_cols,
    fmt: str = "parquet",
    schema_evolution: bool = False,
    stats_inline: bool | None = None,
    when_matched: str = "update",
    matched_cond: str | None = None,
    insert: bool = True,
    nmbs_delete: bool = False,
    nmbs_cond: str | None = None,
) -> list:
    """MERGE with snapshot-manifest publication: same semantics, scoping,
    and return contract as `tables.merge_upsert_partitioned`, but the
    commit is one atomic manifest rename — concurrent readers resolving
    via `read_manifested` see the ENTIRE table before the merge or the
    entire table after it, never a partially-swapped state and never a
    missing partition (pinned by the concurrent-reader test).

    ``schema_evolution=True`` admits a source with appended columns
    (`ops.merge_upsert` automerge semantics) and EVOLVES the manifest's
    stored schema in the same atomic commit: the new columns append to
    the table schema, untouched partitions' files are left alone, and
    every subsequent `read_manifested` surfaces them as NULL there via
    the explicit-schema read — schema change and data change become one
    snapshot, which is precisely what the plain swap mode cannot give
    (its readers must opt into a mergeSchema footer sweep). Time travel
    to a pre-evolution version reads the old schema.

    Concurrency: an optimistic transaction (`_commit_retry`) — on a lost
    CAS the merge RE-RUNS against the winner's snapshot, so two writers
    upserting the same leaf serialize (last committer's merge sees the
    first's rows), and no snapshot is ever silently clobbered.

    Scale: identical read/write footprint to the swap path (affected
    leaves only) plus an O(CHANGED leaves) delta-manifest JSON per
    commit (`_encode_commit`; a full O(partitions) snapshot only every
    ``_FULL_EVERY`` commits) — the log/checkpoint metadata cost every
    snapshot format pays. Driver-side resolution walks at most
    ``_FULL_EVERY`` small files; at 100k+ leaves with range-filtered
    reads, adopt a real table format's file-level manifest pruning."""
    from etl_demo_spark.ops import merge_clauses, merge_upsert

    # CLAUSE MODE (Delta/ANSI MERGE beyond the upsert subset): WHEN
    # MATCHED [AND cond] THEN DELETE / WHEN NOT MATCHED THEN INSERT *
    # opt-out / WHEN NOT MATCHED BY SOURCE [AND cond] THEN DELETE —
    # routed through ops.merge_clauses; the commit machinery (leaf
    # scoping, staging, stats, OCC rebase) is identical. NMBS widens
    # the rewrite scope to EVERY target leaf (rows absent from the
    # source live anywhere — that is what the clause means).
    clause_mode = (
        when_matched != "update"
        or matched_cond is not None
        or not insert
        or nmbs_delete
    )
    if clause_mode and schema_evolution:
        raise ValueError(
            "merge_upsert_manifested: clause merges (DELETE / NOT "
            "MATCHED BY SOURCE / insert=False) never evolve schema"
        )

    cols = _normalize_partition_cols(partition_cols)
    single = isinstance(partition_cols, str) or len(cols) == 1
    root = target_path.rstrip("/")
    fs, jvm = _hadoop_fs(spark, root)
    _clean_stale_staging(fs, jvm, root)

    def _attempt(doc, new_version, token):
        mixed = _mixed_spec_guard(doc, cols, "merge_upsert_manifested")
        if clause_mode and mixed:
            raise ValueError(
                "merge_upsert_manifested: clause merges on a mixed-"
                "generation spec table are not supported — consolidate "
                "with repartition_manifested first"
            )
        nonlocal source
        mapping = doc["partitions"]
        prev_schema_json = doc.get("schema")
        keep = [v for v in _list_manifest_versions(fs, jvm, root)][-_RETAIN:]
        _gc(fs, jvm, root, keep)

        # hidden partitioning: derive any transform-defined partition
        # column the source doesn't carry — writers merge on SOURCE
        # columns and never hand-maintain the layout. On a mixed-
        # generation table, OLD generations' derived columns are table
        # columns too (the unified read re-derives them); derive them on
        # the source so the merge's row shapes align.
        all_specs_src = dict(doc.get("partition_transforms") or {})
        stored_types: dict = {}
        if mixed:
            for h in doc.get("partition_specs") or []:
                for dcol, spec in h.items():
                    all_specs_src.setdefault(dcol, spec)
            if prev_schema_json is not None:
                for f in T.StructType.fromJson(
                    json.loads(prev_schema_json)
                ).fields:
                    stored_types[f.name] = f.dataType
        for dcol, spec in all_specs_src.items():
            if (dcol in cols or mixed) and dcol not in source.columns:
                e = _transform_expr(spec, source)
                if dcol not in cols and dcol in stored_types:
                    # old-generation derived columns are DATA columns in
                    # the merged rows — keep the STORED type (a transform
                    # renders directory strings; the table may store e.g.
                    # DATE) or the union coerces the whole column
                    e = e.cast(stored_types[dcol])
                source = source.withColumn(dcol, e)

        tloc = None
        if mapping:
            if mixed:
                tloc = _located_with_leaf(spark, root, fmt, cols)
                target = tloc.drop("__leaf")
            else:
                target = read_manifested(
                    spark, root, fmt, pin_partition_strings=True,
                    partition_cols=cols,
                )
        else:  # fully-drained table: every source row is an insert
            target = source.filter(F.lit(False))
            for c in cols:
                target = target.withColumn(c, F.col(c).cast("string"))
        delete_only = clause_mode and when_matched == "delete" and not insert
        if delete_only:
            # pure-DELETE merge: the source contributes only keys, so
            # the rewrite scope is the target leaves HOLDING those keys
            src_keys = source.select(*keys).distinct()
            affected = [
                tuple(r)
                for r in target.join(src_keys, keys, "left_semi")
                .select(*cols)
                .distinct()
                .collect()
            ]
        else:
            affected = affected_partitions(target, source, keys, cols)
        if nmbs_delete:
            # NOT MATCHED BY SOURCE touches rows OUTSIDE the source's
            # key set — every target leaf is in scope
            every = {
                tuple(r)
                for r in target.select(*cols).distinct().collect()
            }
            affected = sorted(every | set(affected))
        if not affected:
            return True, [], []

        old_scope: list[str] = []
        if mixed and tloc is not None:
            touched = tloc.join(
                source.select(*keys).distinct(), keys, "left_semi"
            )
            affected, old_scope, scoped = _mixed_dml_scope(
                doc, cols, tloc, affected, touched
            )
        else:
            scoped = target.filter(_partition_filter(cols, affected))
        if clause_mode:
            if delete_only:
                src_aligned = source.select(
                    *[
                        F.col(f.name).cast(f.dataType).alias(f.name)
                        for f in scoped.schema.fields
                        if f.name in keys
                    ]
                )
            else:
                if set(source.columns) != set(scoped.columns):
                    missing = sorted(
                        set(scoped.columns) - set(source.columns)
                    )
                    raise ValueError(
                        "merge_upsert_manifested: clause merges need the "
                        f"source to carry every table column; missing "
                        f"{missing}"
                    )
                # align types with the scoped read (partition cols were
                # string-pinned there) so the unions are exact
                src_aligned = source.select(
                    *[
                        F.col(f.name).cast(f.dataType).alias(f.name)
                        for f in scoped.schema.fields
                    ]
                )
            merged = merge_clauses(
                scoped, src_aligned, keys,
                when_matched=when_matched, matched_cond=matched_cond,
                insert=insert, nmbs_delete=nmbs_delete, nmbs_cond=nmbs_cond,
            )
        else:
            merged = merge_upsert(
                scoped, source, keys, schema_evolution=schema_evolution
            )
        for c in cols:
            merged = merged.withColumn(c, F.col(c).cast("string"))
        if doc.get("change_feed"):
            # the CDF sidecar below re-reads `merged`; persist so the
            # merge join computes once, not once per consumer
            merged = merged.persist()
        _validate_constraints(doc, merged, "merge_upsert_manifested")
        # under an active column mapping, columns a schema-evolving merge
        # introduces get their physical names frozen here, and the staged
        # write lands in physical names
        cmap = doc.get("column_mapping")
        if cmap is not None:
            cmap = _extend_mapping(
                cmap,
                [c for c in merged.columns if c not in cmap],
                tombstones=doc.get("dropped_physical"),
            )
        staging = f"{root}.__manifest_staging__{token}"
        physical = _to_physical(merged, cmap)
        tracked = bool(doc.get("stats_cols") or doc.get("bloom_cols"))
        use_inline = (
            tracked
            and stats_inline is not False
            and _inline_stats_ok(
                physical, doc.get("stats_cols"), doc.get("bloom_cols"),
                fmt, staging, cmap,
            )
        )
        staged_stats: dict | None = None
        if use_inline:
            # single-pass staging: files + their per-file stats from one
            # job — the commit re-reads nothing below
            staged_stats = _write_staging_with_stats(
                physical, staging, cols,
                doc.get("stats_cols"), doc.get("bloom_cols"),
                doc.get("bloom_bits"), doc.get("bloom_k", 4),
                doc.get("bloom_fpr", 0.01), doc.get("bloom_bits_max", 16384),
                token, mapping=cmap,
            )
        else:
            physical.write.mode("overwrite").partitionBy(
                *cols
            ).format(fmt).save(staging)

        new_mapping = dict(mapping)
        staged_vrels: list[str] = []
        for values in affected:
            rel = _part_rel(cols, values)
            staged = jvm.org.apache.hadoop.fs.Path(f"{staging}/{rel}")
            if fs.exists(staged):
                vrel = f"{rel}/{_vdir(new_version, token)}"
                dest = f"{root}/{vrel}"
                _mkdirs_parent(fs, jvm, dest)  # ensure <root>/<rel>/ exists
                fs.rename(staged, jvm.org.apache.hadoop.fs.Path(dest))
                new_mapping[rel] = vrel
                staged_vrels.append(vrel)
            else:  # merge drained this leaf — drop it from the snapshot
                new_mapping.pop(rel, None)
        for rel in old_scope:  # re-keyed into the current spec above
            new_mapping.pop(rel, None)
        fs.delete(jvm.org.apache.hadoop.fs.Path(staging), True)

        # evolve the stored schema: existing columns keep their recorded
        # types (partition cols were string-cast only for the staged WRITE —
        # the stored type remains the read authority), genuinely new columns
        # append with the merge output's type. Legacy manifests without a
        # schema stay schema-less (inference fallback) rather than guessing.
        new_doc = {"version": new_version, "partitions": new_mapping}
        if mixed:
            _prune_leaf_spec(doc, new_doc)
        if prev_schema_json is not None:
            prev_schema = T.StructType.fromJson(json.loads(prev_schema_json))
            prev_names = {f.name for f in prev_schema.fields}
            fields = list(prev_schema.fields) + [
                f for f in merged.schema.fields if f.name not in prev_names
            ]
            new_doc["schema"] = T.StructType(fields).json()
        if cmap is not None:
            new_doc["column_mapping"] = cmap
        _carry_constraints(doc, new_doc)
        _carry_dv(doc, new_doc)
        _carry_extras(doc, new_doc)
        precomputed = None
        if staged_stats is not None:
            vdir = _vdir(new_version, token)
            precomputed = {}
            for p, st in staged_stats.items():
                leaf, fname = p.rsplit("/", 1)
                precomputed[f"{leaf}/{vdir}/{fname}"] = st
        _attach_stats(
            spark, fmt, root, doc, new_doc, staged_vrels, token,
            col_mapping=cmap, precomputed=precomputed,
        )
        new_doc["operation"] = "MERGE"
        change_rels: list[str] = []
        if doc.get("change_feed"):
            # CDF sidecar (Delta semantics): every TOUCHED key emits its
            # preimage as a delete and its post-merge row as an insert;
            # brand-new keys emit insert only. The preimage semi-join
            # re-reads the affected leaves once; the postimage reuses
            # the PERSISTED merge output, so the merge join itself never
            # re-executes.
            if clause_mode:
                # clause merges can remove rows the source never keyed
                # (NOT MATCHED BY SOURCE): the sidecar is the EXACT
                # multiset delta of the affected leaves
                pre = scoped.exceptAll(merged).withColumn(
                    "_change_type", F.lit("delete")
                )
                post = merged.exceptAll(scoped).withColumn(
                    "_change_type", F.lit("insert")
                )
            else:
                skeys = source.select(*keys).distinct()
                pre = scoped.join(skeys, keys, "semi").withColumn(
                    "_change_type", F.lit("delete")
                )
                post = merged.join(skeys, keys, "semi").withColumn(
                    "_change_type", F.lit("insert")
                )
            change_rels = _stage_change_data(
                fs, jvm, root, fmt, new_version, token,
                _to_physical(
                    pre.unionByName(post, allowMissingColumns=True), cmap
                ),
                new_doc,
            )
            merged.unpersist()
        ok = _publish_cas(  # the atomic commit point
            fs,
            jvm,
            _manifest_path(root, new_version),
            _encode_commit(doc, new_doc),
        )
        result = [values[0] for values in affected] if single else affected
        return ok, staged_vrels + change_rels, result, new_doc

    return _commit_retry(fs, jvm, root, _attempt)


def write_manifested(
    df: DataFrame,
    root: str,
    partition_cols=None,
    fmt: str = "parquet",
    stats_cols: list[str] | None = None,
    bloom_cols: list[str] | None = None,
    bloom_bits: int | None = None,
    bloom_k: int = 4,
    bloom_fpr: float = 0.01,
    bloom_bits_max: int = 16384,
    partition_transforms: dict[str, str] | None = None,
    stats_split: bool = False,
    stats_inline: bool | None = None,
    change_feed: bool = False,
) -> int:
    """Create a manifested table from a DataFrame in one call: write the
    partitioned layout, then `manifest_init` it (stats/bloom config
    included). The convenience CTAS for this module — after it, the
    table is merge/delete/compact/time-travel ready. Refuses to
    overwrite an existing manifested table (use the DML surface for
    changes; a blind rewrite would bypass snapshot semantics).

    ``partition_transforms`` turns on HIDDEN PARTITIONING (Iceberg's
    partition-transform family): ``{derived_col: "days(ts)" |
    "months(c)" | "years(c)" | "hours(c)" | "bucket(N, c)" |
    "truncate(N, c)" | "identity(c)"}``. The derived columns are
    computed HERE from the source columns — writers never hand-maintain
    a dt column — and become the partition layout (``partition_cols``,
    if also given, come first). The spec is stored in the manifest and
    carried through every commit, so `read_manifested(prune_source=…)`
    prunes leaves from predicates on the SOURCE columns without the
    reader knowing the layout."""
    spark = df.sparkSession
    cols = _normalize_partition_cols(partition_cols) if partition_cols else []
    if partition_transforms:
        for dcol, spec in partition_transforms.items():
            _parse_transform(spec)  # validate before any write
            if dcol in df.columns:
                raise ValueError(
                    f"derived partition column {dcol!r} already exists in "
                    "the DataFrame"
                )
            df = df.withColumn(dcol, _transform_expr(spec, df))
        cols = cols + [c for c in partition_transforms if c not in cols]
    if not cols:
        raise ValueError(
            "write_manifested: need partition_cols and/or partition_transforms"
        )
    fs, jvm = _hadoop_fs(spark, root)
    if _list_manifest_versions(fs, jvm, root):
        raise ValueError(
            f"{root} is already a manifested table; use merge/delete/compact "
            "instead of rewriting it"
        )
    tracked = bool(stats_cols or bloom_cols)
    use_inline = (
        tracked
        and stats_inline is not False
        and _inline_stats_ok(df, stats_cols, bloom_cols, fmt, root, None)
    )
    if stats_inline is True and not use_inline:
        raise ValueError(
            "write_manifested: stats_inline=True but the inline single-"
            "pass writer can't apply (needs parquet, a local root, atomic "
            "stats/bloom column types, and stats_cols/bloom_cols set)"
        )
    precomputed = None
    if use_inline:
        if fs.exists(jvm.org.apache.hadoop.fs.Path(root)):
            raise ValueError(f"{root} already exists")
        # CTAS through the single-pass writer: data files + every file's
        # stats entry from ONE job; manifest_init below then runs no
        # stats scan at all. Partition columns string-cast first so the
        # directory rendering matches Spark's writer.
        staged = df
        for c in cols:
            staged = staged.withColumn(c, F.col(c).cast("string"))
        if bloom_cols:
            _validate_bloom_config(
                bloom_bits, None if bloom_bits is not None else bloom_bits_max
            )
        precomputed = _write_staging_with_stats(
            staged, root, cols, stats_cols, bloom_cols,
            bloom_bits, bloom_k, bloom_fpr, bloom_bits_max,
            uuid.uuid4().hex[:8],
        )
    else:
        df.write.mode("errorifexists").partitionBy(*cols).format(fmt).save(root)
    return manifest_init(
        spark,
        root,
        cols,
        fmt,
        stats_cols,
        bloom_cols,
        bloom_bits,
        bloom_k,
        bloom_fpr=bloom_fpr,
        bloom_bits_max=bloom_bits_max,
        partition_transforms=partition_transforms,
        stats_split=stats_split,
        precomputed_stats=precomputed,
        change_feed=change_feed,
        source_schema_json=(
            df.schema.json() if fmt in ("csv", "json") else None
        ),
    )


def convert_to_split_stats(spark: SparkSession, target_path: str) -> int:
    """Migrate an embedded-stats manifested table to the SPLIT layout
    (per-leaf stats files + a pointer map in the snapshot) as one
    metadata-only commit — no data file is read or touched. Idempotent:
    a table already split (or without stats) returns its current
    version. Do this when a table's file count makes the embedded
    snapshot document the bottleneck (the 10k-file rehearsal measured
    15.4 MB / 1.18 s resolve embedded; split resolves O(leaves))."""
    root = target_path.rstrip("/")
    fs, jvm = _hadoop_fs(spark, root)

    def _attempt(doc, new_version, token):
        if doc.get("files_manifests") is not None or doc.get("files") is None:
            return True, [], doc["version"]  # already split / no stats
        new_doc = {
            "version": new_version,
            "partitions": dict(doc["partitions"]),
            "files_manifests": _split_stats_from_entries(
                fs, jvm, root, new_version, token, doc["files"]
            ),
        }
        if doc.get("schema") is not None:
            new_doc["schema"] = doc["schema"]
        _carry_mapping(doc, new_doc)
        _carry_constraints(doc, new_doc)
        _carry_dv(doc, new_doc)
        _carry_stats_config(doc, new_doc)
        _carry_extras(doc, new_doc)
        new_doc["operation"] = "CONVERT"
        ok = _publish_cas(
            fs, jvm, _manifest_path(root, new_version), _encode_commit(doc, new_doc)
        )
        return ok, [], new_version

    return _commit_retry(fs, jvm, root, _attempt)


def append_manifested(
    spark: SparkSession,
    target_path: str,
    source: DataFrame,
    fmt: str = "parquet",
    txn_app: str | None = None,
    txn_version: int | None = None,
    stats_inline: bool | None = None,
) -> list[str]:
    """APPEND-only ingest: the source's rows land as EXTRA version
    subdirs of the leaves they belong to — cost is O(new data) written
    and NO existing data file is read or rewritten. This is the missing
    fast path next to MERGE for insert-only feeds (event logs, daily
    loads): a merge on the same rows re-reads and rewrites every touched
    leaf, which on an accreting daily partition is quadratic over the
    day. Appended vrels ride the snapshot like any other data — reads,
    stats pruning, DV deletes, time travel, and the change feed (new
    rows surface as inserts) all see them — and the leaf's NEXT rewrite
    (MERGE / UPDATE / DELETE / OPTIMIZE) consolidates them into its new
    primary vrel, so compaction cadence bounds the per-leaf vrel count.

    Hidden partitioning: transform-defined partition columns the source
    doesn't carry are derived from the stored spec. CHECK constraints
    validate the staged slice; a violating append is refused wholesale.
    Brand-new leaves (a partition value the table has never seen) become
    ordinary primary vrels. Duplicate keys are NOT detected — this is
    INSERT, not upsert; use `merge_upsert_manifested` for keyed feeds.

    EXACTLY-ONCE for replayed writers: ``txn_app`` + ``txn_version``
    (Delta's idempotent-writes txn appId/version) record the writer's
    monotonically increasing version IN the commit; a replay carrying a
    version at-or-below the recorded one is a NO-OP — the transaction
    guard and the data land in one atomic commit, so there is no crash
    window where data applied but the guard didn't. This is what makes
    a foreachBatch append sink (`streaming.run_stream_append`) safe
    under micro-batch replay, where a bare append would duplicate rows.
    Returns the leaf rels appended to ([] for a skipped replay).

    ``stats_inline``: None (default) stages through the SINGLE-PASS
    writer whenever the table tracks stats and `_inline_stats_ok` holds
    — the staged files and their per-file stats come out of one job, so
    the commit re-reads nothing. False forces the legacy post-write
    scan; True raises if the inline path can't apply."""
    if (txn_app is None) != (txn_version is None):
        raise ValueError(
            "append_manifested: txn_app and txn_version go together"
        )
    root = target_path.rstrip("/")
    fs, jvm = _hadoop_fs(spark, root)
    _clean_stale_staging(fs, jvm, root)

    def _attempt(doc, new_version, token):
        if txn_app is not None:
            applied = (doc.get("txns") or {}).get(txn_app)
            if applied is not None and int(txn_version) <= int(applied):
                return True, [], []  # replayed transaction: already in
        mapping = doc["partitions"]
        if not mapping:
            raise ValueError(
                f"append_manifested: {root} has no partitions — create the "
                "table with write_manifested first"
            )
        if doc.get("partition_specs"):
            # mixed leaf shapes: the CURRENT spec defines new appends
            cols = list((doc.get("partition_transforms") or {}).keys())
        else:
            cols = [
                seg.split("=", 1)[0]
                for seg in next(iter(mapping)).split("/")
            ]
        src = source
        for dcol, spec in (doc.get("partition_transforms") or {}).items():
            if dcol in cols and dcol not in src.columns:
                src = src.withColumn(dcol, _transform_expr(spec, src))
        # APPEND is insert-only — it never evolves schema, so a source
        # that doesn't match the table (missing column, typo'd extra,
        # incompatible type) must be REFUSED here, not silently written
        # as files whose reads surface NULLs. Schema evolution goes
        # through merge_upsert_manifested, which maps it explicitly.
        if doc.get("schema") is not None:
            table_schema = T.StructType.fromJson(json.loads(doc["schema"]))
            want = {f.name: f.dataType.simpleString() for f in table_schema}
            have = {f.name: f.dataType.simpleString() for f in src.schema}
            # spec-evolved tables: derived columns of ANY generation are
            # re-derived at read time — the source never carries them
            derived_any: set[str] = set()
            for h in doc.get("partition_specs") or []:
                derived_any.update(h)
            missing = sorted(set(want) - set(have) - derived_any)
            extra = sorted(set(have) - set(want))
            # partition columns are string-cast at write time (and may be
            # transform-DERIVED above) — presence is checked, type is not
            wrong = sorted(
                f"{n}: source {have[n]} vs table {want[n]}"
                for n in set(want) & set(have)
                if have[n] != want[n] and n not in cols
            )
            if missing or extra or wrong:
                raise ValueError(
                    "append_manifested: source schema does not match the "
                    f"table at {root} — missing={missing} extra={extra} "
                    f"type_mismatch={wrong}. Appends never evolve schema; "
                    "route schema changes through merge_upsert_manifested."
                )
            # normalize to the table's column ORDER: positional formats
            # (csv has no header, no per-file schema) would otherwise
            # silently swap columns when a caller appends in a
            # different order
            src = src.select(
                *[f.name for f in table_schema.fields if f.name in src.columns]
            )
        _validate_constraints(doc, src, "append_manifested")
        for c in cols:
            src = src.withColumn(c, F.col(c).cast("string"))
        cmap = doc.get("column_mapping")
        staging = f"{root}.__manifest_staging__{token}"
        physical = _to_physical(src, cmap)
        tracked = bool(doc.get("stats_cols") or doc.get("bloom_cols"))
        inline_ok = tracked and _inline_stats_ok(
            physical, doc.get("stats_cols"), doc.get("bloom_cols"),
            fmt, staging, cmap,
        )
        if stats_inline is True and not inline_ok:
            raise ValueError(
                "append_manifested: stats_inline=True but the inline "
                "single-pass writer can't apply here (needs parquet, a "
                "local root, atomic stats/bloom column types, and a "
                "stats-tracking table)"
            )
        use_inline = inline_ok and stats_inline is not False
        staged_stats: dict | None = None
        if use_inline:
            staged_stats = _write_staging_with_stats(
                physical, staging, cols,
                doc.get("stats_cols"), doc.get("bloom_cols"),
                doc.get("bloom_bits"), doc.get("bloom_k", 4),
                doc.get("bloom_fpr", 0.01), doc.get("bloom_bits_max", 16384),
                token, mapping=cmap,
            )
        else:
            physical.write.mode("overwrite").partitionBy(
                *cols
            ).format(fmt).save(staging)

        # move each staged leaf dir into an extra (or fresh) vrel
        extras = {
            r: list(v) for r, v in (doc.get("extra_vrels") or {}).items()
        }
        new_mapping = dict(mapping)
        staged_vrels: list[str] = []
        touched: list[str] = []
        stack = [(jvm.org.apache.hadoop.fs.Path(staging), "", 0)]
        leaves: list[str] = []
        while stack:
            path, rel, d = stack.pop()
            for st in fs.listStatus(path):
                name = st.getPath().getName()
                if not st.isDirectory() or "=" not in name:
                    continue
                r = f"{rel}/{name}" if rel else name
                if d + 1 == len(cols):
                    leaves.append(r)
                else:
                    stack.append((st.getPath(), r, d + 1))
        for rel in leaves:
            vrel = f"{rel}/{_vdir(new_version, token)}"
            dest = f"{root}/{vrel}"
            _mkdirs_parent(fs, jvm, dest)
            fs.rename(
                jvm.org.apache.hadoop.fs.Path(f"{staging}/{rel}"),
                jvm.org.apache.hadoop.fs.Path(dest),
            )
            if rel in new_mapping:
                extras.setdefault(rel, []).append(vrel)
            else:
                new_mapping[rel] = vrel  # first data for this leaf
            staged_vrels.append(vrel)
            touched.append(rel)
        fs.delete(jvm.org.apache.hadoop.fs.Path(staging), True)
        if not touched:  # empty source: nothing to commit
            return True, [], []

        new_doc = {"version": new_version, "partitions": new_mapping}
        if extras:
            new_doc["extra_vrels"] = extras
        if txn_app is not None:
            new_doc["txns"] = {
                **(doc.get("txns") or {}), txn_app: int(txn_version)
            }
        if doc.get("schema") is not None:
            new_doc["schema"] = doc["schema"]
        _carry_mapping(doc, new_doc)
        _carry_constraints(doc, new_doc)
        _carry_dv(doc, new_doc)
        # stats: carry EVERYTHING (no primary changed) + the freshly
        # appended vrels' entries — from the inline writer when it
        # staged (zero re-read), else a post-write scan; in the split
        # layout only the appended leaves' stats files are rewritten
        precomputed = None
        if staged_stats is not None:
            vmap = {rel: f"{rel}/{_vdir(new_version, token)}" for rel in leaves}
            precomputed = {}
            for p, st in staged_stats.items():
                leaf, fname = p.rsplit("/", 1)
                precomputed[f"{vmap[leaf]}/{fname}"] = st
        _attach_stats(
            spark, fmt, root, doc, new_doc, staged_vrels, token,
            col_mapping=cmap, precomputed=precomputed,
        )
        new_doc["operation"] = "APPEND"
        ok = _publish_cas(
            fs, jvm, _manifest_path(root, new_version), _encode_commit(doc, new_doc)
        )
        return ok, staged_vrels, sorted(touched), new_doc

    return _commit_retry(fs, jvm, root, _attempt)


def manifest_files(
    spark: SparkSession, root: str, version: int | None = None
) -> DataFrame:
    """The table's FILES metadata as a DataFrame (Iceberg's ``.files``
    metadata table, lifted to this layer): one row per live data file of
    the resolved snapshot — leaf, physical rel, size in bytes, row count
    and per-column min/max where stats are tracked. Metadata-only (one
    chain resolution + one listStatus per leaf; no data files opened) —
    the observability surface for "what does this table physically look
    like": skew hunts, small-file audits before OPTIMIZE, stats checks.

    Columns: leaf, file_rel, bytes, rows (nullable), stats (map<string,
    array<string>> of [min, max] images, nullable)."""
    fs, jvm = _hadoop_fs(spark, root)
    doc = _load_doc(fs, jvm, root, version)
    # full inventory is inherently O(table); split tables load all leaves
    fstats = _materialized_files(fs, jvm, root, doc)
    rows = []
    for rel in sorted(doc["partitions"]):
      for vrel in _leaf_vrels(doc, rel):
        for st in fs.listStatus(
            jvm.org.apache.hadoop.fs.Path(f"{root.rstrip('/')}/{vrel}")
        ):
            name = st.getPath().getName()
            if not st.isFile() or name.startswith(("_", ".")):
                continue
            frel = f"{vrel}/{name}"
            rec = fstats.get(frel, {})
            stats = {
                c: [str(v[0]), str(v[1])]
                for c, v in rec.items()
                if not c.startswith("__") and isinstance(v, list)
            }
            rows.append(
                (rel, frel, int(st.getLen()), rec.get("__rows"), stats or None)
            )
    return spark.createDataFrame(
        rows,
        "leaf STRING, file_rel STRING, bytes LONG, rows LONG, "
        "stats MAP<STRING, ARRAY<STRING>>",
    )


def register_manifested(
    spark: SparkSession,
    name: str,
    root: str,
    fmt: str = "parquet",
    version: int | None = None,
) -> DataFrame:
    """Register the snapshot read as a temp view so plain ``spark.sql``
    can query the manifested table (joins, window functions, CTEs — the
    whole SQL surface over the governed layout). The view PINS the
    snapshot resolved NOW (paths + deletion vectors + schema as of this
    call) — exactly the read-consistency a long multi-statement SQL
    session wants; re-register to observe later commits. ``version``
    registers a time-travel view."""
    df = read_manifested(spark, root, fmt, version=version)
    df.createOrReplaceTempView(name)
    return df


def manifest_properties(
    spark: SparkSession, root: str, version: int | None = None
) -> DataFrame:
    """The table's governance state as one key/value DataFrame — the
    DESCRIBE EXTENDED surface for this layer: version, commit stamp,
    leaf/file counts, schema fields, CHECK constraints, column-mapping
    entries, deletion-vector summary, stats/bloom config. Metadata-only
    (one chain resolution, no data files opened, no listStatus).

    Columns: key STRING, value STRING."""
    fs, jvm = _hadoop_fs(spark, root)
    doc = _load_doc(fs, jvm, root, version)
    rows: list[tuple[str, str]] = [
        ("version", str(doc["version"])),
        ("committed_at_ms", str(doc.get("committed_at_ms", ""))),
        ("n_leaves", str(len(doc["partitions"]))),
    ]
    if doc.get("files") is not None or doc.get("files_manifests") is not None:
        fstats = _materialized_files(fs, jvm, root, doc)
        rows.append(("n_files", str(len(fstats))))
        total = sum(st.get("__rows", 0) for st in fstats.values())
        rows.append(("rows_physical", str(total)))
        if doc.get("files_manifests") is not None:
            rows.append(("stats_layout", "split"))
    if doc.get("schema") is not None:
        for f in T.StructType.fromJson(json.loads(doc["schema"])).fields:
            rows.append((f"schema.{f.name}", f.dataType.simpleString()))
    for name, expr in sorted((doc.get("constraints") or {}).items()):
        rows.append((f"constraint.{name}", expr))
    for dcol, spec in sorted((doc.get("partition_transforms") or {}).items()):
        rows.append((f"partition_transform.{dcol}", spec))
    for logical, phys in sorted((doc.get("column_mapping") or {}).items()):
        if logical != phys:
            rows.append((f"column_mapping.{logical}", phys))
    dv = doc.get("dv")
    if dv:
        rows.append(("dv.files", str(len(dv["files"]))))
        rows.append(("dv.deleted_rows", str(sum(dv["files"].values()))))
        rows.append(("dv.rel", ",".join(_dv_rels(dv))))
    for key in _STATS_CONFIG_KEYS:
        if doc.get(key) is not None:
            rows.append((key, str(doc[key])))
    for name, t in sorted((doc.get("tags") or {}).items()):
        rows.append((f"tag.{name}", f"v{t['version']}"))
    return spark.createDataFrame(rows, "key STRING, value STRING")


def manifest_history(spark: SparkSession, root: str) -> DataFrame:
    """DESCRIBE HISTORY for a manifested table: one row per commit whose
    manifest file is still on disk (the retained window PLUS older
    delta-chain ancestors kept as resolution inputs), newest first —
    version, commit timestamp, the OPERATION that produced it (CREATE /
    MERGE / DELETE / UPDATE / OPTIMIZE / ALTER / RESTORE / …), whether
    it was encoded as a delta, its parent, and whether the version is
    still readable (inside the retention window — older rows are audit
    metadata only, their exclusive data may be GC'd).

    Metadata-only: one directory listing + one small JSON read per
    commit; commits from before the operation label existed surface
    NULL. The audit-trail surface Delta's DESCRIBE HISTORY provides,
    at this layer."""
    fs, jvm = _hadoop_fs(spark, root)
    all_vs = _list_manifest_versions(fs, jvm, root)
    readable = set(all_vs[-_RETAIN:])
    rows = []
    for v in reversed(all_vs):
        raw = _load_raw(fs, jvm, root, v)
        stamp = raw.get("committed_at_ms")
        rows.append(
            (
                v,
                None if stamp is None else int(stamp),
                raw.get("operation"),
                "parent" in raw,
                raw.get("parent"),
                v in readable,
            )
        )
    df = spark.createDataFrame(
        rows,
        "version LONG, committed_at_ms LONG, operation STRING, "
        "is_delta BOOLEAN, parent LONG, readable BOOLEAN",
    )
    return df.select(
        "version",
        F.timestamp_millis(F.col("committed_at_ms")).alias("committed_at"),
        "operation",
        "is_delta",
        "parent",
        "readable",
    )


def manifest_orphans(spark: SparkSession, root: str) -> DataFrame:
    """Dry-run orphan report: every ``__v`` directory no retained
    manifest references, with its age and whether the next commit's GC
    would reclaim it (past the grace window) or spare it as possible
    in-flight staging. The look-before-VACUUM surface — metadata and
    directory listing only, nothing is deleted.

    Columns: dir_rel, bytes, age_seconds, reclaimable."""
    fs, jvm = _hadoop_fs(spark, root)
    listed = _list_manifest_versions(fs, jvm, root)
    if not listed:
        raise FileNotFoundError(f"no manifest under {root}/{_MANIFEST_DIR}")
    keep = listed[-_RETAIN:]
    referenced: set[str] = set()
    for v in keep:
        referenced.update(_all_vrels(_resolve_doc(fs, jvm, root, v)))
    now_ms = int(time.time() * 1000)
    rows = []
    stack = [(jvm.org.apache.hadoop.fs.Path(root), "")]
    while stack:
        path, rel = stack.pop()
        for st in fs.listStatus(path):
            name = st.getPath().getName()
            if not st.isDirectory():
                continue
            r = f"{rel}/{name}" if rel else name
            if name.startswith("__v"):
                if r in referenced:
                    continue
                size = fs.getContentSummary(st.getPath()).getLength()
                age_s = max(0, (now_ms - st.getModificationTime()) // 1000)
                rows.append(
                    (r, int(size), int(age_s), age_s * 1000 >= _ORPHAN_GRACE_MS)
                )
            elif not name.startswith(("_", ".")):
                stack.append((st.getPath(), r))
    return spark.createDataFrame(
        rows, "dir_rel STRING, bytes LONG, age_seconds LONG, reclaimable BOOLEAN"
    )


def delete_where_manifested(
    spark: SparkSession,
    target_path: str,
    predicate,
    partition_cols,
    fmt: str = "parquet",
) -> list:
    """DELETE ... WHERE with snapshot-manifest publication — the
    manifested twin of `tables.delete_where_partitioned` (retention jobs:
    "drop everything before date X in region Y"). Discovery is one
    predicate-filtered scan projected to the partition columns, the
    rewrite keeps the affected leaves' non-matching rows (NULL-predicate
    rows are KEPT — SQL DELETE removes only TRUE rows), a fully-drained
    leaf drops out of the snapshot, and the whole deletion becomes
    visible in one atomic CAS commit under the optimistic multi-writer
    loop. Returns the partitions rewritten."""
    cols = _normalize_partition_cols(partition_cols)
    single = isinstance(partition_cols, str) or len(cols) == 1
    root = target_path.rstrip("/")
    fs, jvm = _hadoop_fs(spark, root)
    _clean_stale_staging(fs, jvm, root)

    def _attempt(doc, new_version, token):
        mixed = _mixed_spec_guard(doc, cols, "delete_where_manifested")
        mapping = doc["partitions"]
        keep = [v for v in _list_manifest_versions(fs, jvm, root)][-_RETAIN:]
        _gc(fs, jvm, root, keep)
        if not mapping:
            return True, [], []

        if mixed:
            tloc = _located_with_leaf(spark, root, fmt, cols)
            target = tloc.drop("__leaf")
        else:
            tloc = None
            target = read_manifested(
                spark, root, fmt, pin_partition_strings=True,
                partition_cols=cols,
            )
        touched = (tloc if mixed else target).filter(predicate)
        affected = [
            tuple(r) for r in touched.select(*cols).distinct().collect()
        ]
        if not affected:
            return True, [], []

        old_scope: list[str] = []
        if mixed:
            affected, old_scope, scoped = _mixed_dml_scope(
                doc, cols, tloc, affected, touched
            )
        else:
            scoped = target.filter(_partition_filter(cols, affected))
        remaining = scoped.filter(~F.coalesce(predicate, F.lit(False)))
        for c in cols:
            remaining = remaining.withColumn(c, F.col(c).cast("string"))
        staging = f"{root}.__manifest_staging__{token}"
        _to_physical(remaining, doc.get("column_mapping")).write.mode(
            "overwrite"
        ).partitionBy(*cols).format(fmt).save(staging)

        new_mapping = dict(mapping)
        staged_vrels: list[str] = []
        for values in affected:
            rel = _part_rel(cols, values)
            staged = jvm.org.apache.hadoop.fs.Path(f"{staging}/{rel}")
            if fs.exists(staged):
                vrel = f"{rel}/{_vdir(new_version, token)}"
                _mkdirs_parent(fs, jvm, f"{root}/{vrel}")
                fs.rename(staged, jvm.org.apache.hadoop.fs.Path(f"{root}/{vrel}"))
                new_mapping[rel] = vrel
                staged_vrels.append(vrel)
            else:  # every row deleted — the leaf leaves the snapshot
                new_mapping.pop(rel, None)
        for rel in old_scope:  # re-keyed into the current spec above
            new_mapping.pop(rel, None)
        fs.delete(jvm.org.apache.hadoop.fs.Path(staging), True)

        new_doc = {"version": new_version, "partitions": new_mapping}
        if mixed:
            _prune_leaf_spec(doc, new_doc)
        if doc.get("schema") is not None:
            new_doc["schema"] = doc["schema"]
        _carry_mapping(doc, new_doc)
        _carry_constraints(doc, new_doc)
        _carry_dv(doc, new_doc)
        _carry_extras(doc, new_doc)
        _attach_stats(spark, fmt, root, doc, new_doc, staged_vrels, token)
        new_doc["operation"] = "DELETE"
        change_rels: list[str] = []
        if doc.get("change_feed"):
            doomed = scoped.filter(F.coalesce(predicate, F.lit(False)))
            for c in cols:
                doomed = doomed.withColumn(c, F.col(c).cast("string"))
            change_rels = _stage_change_data(
                fs, jvm, root, fmt, new_version, token,
                _to_physical(
                    doomed.withColumn("_change_type", F.lit("delete")),
                    doc.get("column_mapping"),
                ),
                new_doc,
            )
        ok = _publish_cas(
            fs, jvm, _manifest_path(root, new_version), _encode_commit(doc, new_doc)
        )
        result = [values[0] for values in affected] if single else affected
        return ok, staged_vrels + change_rels, result, new_doc

    return _commit_retry(fs, jvm, root, _attempt)


def update_where_manifested(
    spark: SparkSession,
    target_path: str,
    assignments: dict,
    predicate,
    partition_cols,
    fmt: str = "parquet",
) -> list:
    """UPDATE ... SET ... WHERE with snapshot-manifest publication — the
    manifested twin of `tables.update_where_partitioned`, completing the
    DML triad (MERGE / DELETE / UPDATE) on the snapshot layer.
    Assignments MAY set a partition column (the status-transition bulk
    update): the blast radius is source ∪ destination leaves, moved rows
    land under their new leaf's version subdir, a drained source leaf
    drops out of the snapshot, and readers see the entire update — both
    directories — in one atomic CAS commit (the swap path moves two
    directories non-atomically; here the transition cannot be observed
    half-applied). Schema is unchanged by construction (UPDATE cannot
    add columns). Optimistic multi-writer like every other committer."""
    cols = _normalize_partition_cols(partition_cols)
    single = isinstance(partition_cols, str) or len(cols) == 1
    root = target_path.rstrip("/")
    fs, jvm = _hadoop_fs(spark, root)
    _clean_stale_staging(fs, jvm, root)

    def _attempt(doc, new_version, token):
        mixed = _mixed_spec_guard(doc, cols, "update_where_manifested")
        mapping = doc["partitions"]
        keep = [v for v in _list_manifest_versions(fs, jvm, root)][-_RETAIN:]
        _gc(fs, jvm, root, keep)
        if not mapping:
            return True, [], []

        if mixed:
            tloc = _located_with_leaf(spark, root, fmt, cols)
            target = tloc.drop("__leaf")
        else:
            tloc = None
            target = read_manifested(
                spark, root, fmt, pin_partition_strings=True,
                partition_cols=cols,
            )
        unknown = [c for c in assignments if c not in target.columns]
        if unknown:
            raise ValueError(
                f"update_where_manifested: assigned columns {unknown} not in "
                f"table schema {target.columns} (UPDATE cannot add columns — "
                "use a schema-evolving MERGE for that)"
            )
        matched = (tloc if mixed else target).filter(predicate)
        src_parts = matched.select(*cols).distinct()
        # SIMULTANEOUS assignment semantics (SQL UPDATE): every
        # expression sees the OLD row — one projection, never chained
        # withColumn (which would let "SET a=a+1, b=a" read the new a).
        # `updated` below uses the same semantics; `moved` feeds the
        # destination-partition space and the CDF postimage, so the
        # three must agree.
        moved = matched.select(
            *[
                assignments[c].alias(c) if c in assignments else F.col(c)
                for c in target.columns
            ]
        )
        if any(c in assignments for c in cols):
            for c in cols:
                moved = moved.withColumn(c, F.col(c).cast("string"))
            part_space = src_parts.union(moved.select(*cols).distinct()).distinct()
        else:
            part_space = src_parts
        affected = [tuple(r) for r in part_space.collect()]
        if not affected:
            return True, [], []

        old_scope: list[str] = []
        if mixed:
            affected, old_scope, scoped = _mixed_dml_scope(
                doc, cols, tloc, affected, matched
            )
        else:
            scoped = target.filter(_partition_filter(cols, affected))
        updated = scoped.select(
            *[
                F.when(predicate, assignments[c]).otherwise(F.col(c)).alias(c)
                if c in assignments
                else F.col(c)
                for c in target.columns
            ]
        )
        for c in cols:
            updated = updated.withColumn(c, F.col(c).cast("string"))
        _validate_constraints(doc, updated, "update_where_manifested")
        staging = f"{root}.__manifest_staging__{token}"
        _to_physical(updated, doc.get("column_mapping")).write.mode(
            "overwrite"
        ).partitionBy(*cols).format(fmt).save(staging)

        new_mapping = dict(mapping)
        staged_vrels: list[str] = []
        for values in affected:
            rel = _part_rel(cols, values)
            staged = jvm.org.apache.hadoop.fs.Path(f"{staging}/{rel}")
            if fs.exists(staged):
                vrel = f"{rel}/{_vdir(new_version, token)}"
                _mkdirs_parent(fs, jvm, f"{root}/{vrel}")
                fs.rename(staged, jvm.org.apache.hadoop.fs.Path(f"{root}/{vrel}"))
                new_mapping[rel] = vrel
                staged_vrels.append(vrel)
            else:  # drained source leaf
                new_mapping.pop(rel, None)
        for rel in old_scope:  # re-keyed into the current spec above
            new_mapping.pop(rel, None)
        fs.delete(jvm.org.apache.hadoop.fs.Path(staging), True)

        new_doc = {"version": new_version, "partitions": new_mapping}
        if mixed:
            _prune_leaf_spec(doc, new_doc)
        if doc.get("schema") is not None:
            new_doc["schema"] = doc["schema"]
        _carry_mapping(doc, new_doc)
        _carry_constraints(doc, new_doc)
        _carry_dv(doc, new_doc)
        _carry_extras(doc, new_doc)
        _attach_stats(spark, fmt, root, doc, new_doc, staged_vrels, token)
        new_doc["operation"] = "UPDATE"
        change_rels: list[str] = []
        if doc.get("change_feed"):
            pre, post = matched.drop("__leaf"), moved
            for c in cols:
                pre = pre.withColumn(c, F.col(c).cast("string"))
                post = post.withColumn(c, F.col(c).cast("string"))
            changes = pre.withColumn(
                "_change_type", F.lit("delete")
            ).unionByName(post.withColumn("_change_type", F.lit("insert")))
            change_rels = _stage_change_data(
                fs, jvm, root, fmt, new_version, token,
                _to_physical(changes, doc.get("column_mapping")),
                new_doc,
            )
        ok = _publish_cas(
            fs, jvm, _manifest_path(root, new_version), _encode_commit(doc, new_doc)
        )
        result = [values[0] for values in affected] if single else affected
        return ok, staged_vrels + change_rels, result, new_doc

    return _commit_retry(fs, jvm, root, _attempt)


# Reader-proven widenings (pinned by test): the parquet scan upcasts the
# on-disk physical type to the wider stored type per batch, so a widen is
# metadata-only — no file rewrite, old files read as the wider type.
_WIDEN_OK = {
    ("tinyint", "smallint"),
    ("tinyint", "int"),
    ("tinyint", "bigint"),
    ("smallint", "int"),
    ("smallint", "bigint"),
    ("int", "bigint"),
    ("float", "double"),
}


def _mixed_spec_guard(doc: dict, cols: list[str], op: str) -> bool:
    """True when ``doc`` is a spec-EVOLVED (mixed-generation) table and
    the DML may proceed leaf-scoped. The caller must operate in the
    CURRENT spec's derived columns — the rewrite re-keys every touched
    old-generation leaf into the current layout, so any other column
    set has no leaf mapping to stage into."""
    if not doc.get("partition_specs"):
        return False
    cur = doc.get("partition_transforms") or {}
    if set(cols) != set(cur):
        raise ValueError(
            f"{op}: spec-evolved table — partition_cols {sorted(cols)} "
            "must be the CURRENT spec's derived columns "
            f"{sorted(cur)} (touched old-generation leaves are re-keyed "
            "into the current layout)"
        )
    return True


def _located_with_leaf(spark, root: str, fmt: str, cols: list[str]):
    """The unified logical frame plus ``__leaf`` — each row's PHYSICAL
    leaf rel, derived from the scan's file path. On a mixed-generation
    table the derived partition columns alone cannot attribute a row to
    a generation (every generation's transforms re-derive on all rows);
    the file path can."""
    t = read_manifested(
        spark, root, fmt, pin_partition_strings=True, partition_cols=cols,
        _with_location=True,
    )
    return t.withColumn(
        "__leaf", F.regexp_replace(F.col("__dv_file"), "/[^/]+/[^/]+$", "")
    ).drop("__dv_file", "__dv_pos")


def _mixed_dml_scope(
    doc: dict, cols: list[str], tloc, affected0: list, touched
):
    """Leaf-accurate scope for a DML on a spec-EVOLVED table.

    ``touched`` = the target rows the operation modifies (key-matched /
    predicate-matched), as a subset of ``tloc`` (so it carries
    ``__leaf``). Old-generation leaves holding ANY touched row are
    rewritten WHOLE, every row re-keyed into the current spec; that
    pulls in (closure) the existing current-generation leaves those
    re-keyed rows land in, since staging REPLACES a leaf's content.
    Untouched leaves of every generation stay byte-identical.

    Returns (affected, old_scope, scoped): the current-spec value
    tuples to swap, the old-generation leaf rels to drop from the
    snapshot, and the logical rows feeding the rewrite."""
    hist = doc["partition_specs"]
    cur_id = len(hist) - 1
    leaf_spec = doc.get("leaf_spec") or {}
    old_leaves = {
        r
        for r in doc.get("partitions", {})
        if int(leaf_spec.get(r, cur_id)) != cur_id
    }
    old_scope = sorted(
        {r[0] for r in touched.select("__leaf").distinct().collect()}
        & old_leaves
    )
    extra: set = set()
    if old_scope:
        extra = {
            tuple(r)
            for r in tloc.filter(F.col("__leaf").isin(old_scope))
            .select(*cols)
            .distinct()
            .collect()
        }
    affected = list({*(tuple(v) for v in affected0), *extra})
    cond = _partition_filter(cols, affected)
    if old_leaves:
        # value-filter alone would pull rows out of UNTOUCHED old-gen
        # leaves (duplicating them into the staged current leaves while
        # their old leaf stays live) — restrict it to current-gen rows
        cond = cond & ~F.col("__leaf").isin(sorted(old_leaves))
    if old_scope:
        cond = cond | F.col("__leaf").isin(old_scope)
    scoped = tloc.filter(cond).drop("__leaf")
    return affected, old_scope, scoped


def _prune_leaf_spec(doc: dict, new_doc: dict) -> None:
    """After a mixed-generation DML: drop ``leaf_spec`` entries for
    departed leaves and for leaves now on the current generation. The
    spec HISTORY itself is kept even when no old-generation leaf
    remains — the stored schema still carries old derived columns that
    only the spec-evolved read path re-derives."""
    hist = doc.get("partition_specs")
    if not hist:
        return
    cur_id = len(hist) - 1
    new_doc["leaf_spec"] = {
        r: s
        for r, s in (doc.get("leaf_spec") or {}).items()
        if r in new_doc["partitions"] and int(s) != cur_id
    }


def alter_partition_spec(
    spark: SparkSession,
    root: str,
    new_transforms: dict[str, str],
) -> int:
    """METADATA-ONLY partition-spec evolution (Iceberg's
    ``ALTER TABLE … REPLACE PARTITION FIELD``): re-key how FUTURE
    writes are laid out without touching a single existing byte. The
    commit records each existing leaf's generation (``leaf_spec``) and
    appends the new spec to ``partition_specs``; appends after this
    land under the new layout, reads scan both generations
    transparently, and ``prune_source`` translates a source-column
    predicate through EACH generation's own transform — old leaves
    prune under the old spec, new leaves under the new. Time travel to
    pre-evolution versions resolves the old single-spec doc unchanged.

    Only PURE-TRANSFORM tables evolve (every partition directory column
    is transform-derived; source columns live in the files — nothing is
    lost when the directory shape changes). On the mixed-generation
    table that results, the DML trio (MERGE / DELETE WHERE / UPDATE
    WHERE), key erasure, and OPTIMIZE are all LEAF-SCOPED: touched
    old-generation leaves are rewritten whole into the CURRENT spec
    (compaction thereby doubles as progressive migration), and DV
    deletes are positional so they never cared; a
    `repartition_manifested` still consolidates eagerly and clears the
    history. Returns the committed version."""
    for dcol, spec in new_transforms.items():
        _parse_transform(spec)
        if not dcol or "=" in dcol or "/" in dcol:
            raise ValueError(f"alter_partition_spec: bad derived column {dcol!r}")
    fs, jvm = _hadoop_fs(spark, root)

    def _attempt(doc, new_version, token):
        cur = doc.get("partition_transforms")
        if not cur:
            raise ValueError(
                "alter_partition_spec: table has no partition transforms "
                "(classic partition_cols layouts carry data in the "
                "directory names and cannot re-key as metadata)"
            )
        leaf_cols = {
            seg.split("=", 1)[0]
            for rel in doc.get("partitions", {})
            for seg in rel.split("/")
        }
        if not leaf_cols <= set(cur) | {
            c for h in (doc.get("partition_specs") or []) for c in h
        }:
            raise ValueError(
                "alter_partition_spec: table mixes classic partition "
                f"columns into its leaves ({sorted(leaf_cols - set(cur))}) "
                "— only pure-transform tables evolve as metadata"
            )
        if new_transforms == cur:
            return True, [], doc["version"]  # no-op
        hist = list(doc.get("partition_specs") or [cur])
        spec_id = len(hist) - 1  # id of the CURRENT (soon old) spec
        leaf_spec = dict(doc.get("leaf_spec") or {})
        for rel in doc.get("partitions", {}):
            leaf_spec.setdefault(rel, spec_id)
        hist.append(dict(new_transforms))
        new_doc = {
            "version": new_version,
            "partitions": dict(doc.get("partitions", {})),
            "partition_transforms": dict(new_transforms),
            "partition_specs": hist,
            "leaf_spec": leaf_spec,
            "operation": "ALTER SPEC",
        }
        if doc.get("schema") is not None:
            # the new spec's derived columns join the stored schema
            # (typed by probing the transform expression); reads
            # re-derive them from source columns for every generation
            table_schema = T.StructType.fromJson(json.loads(doc["schema"]))
            have = {f.name for f in table_schema}
            fields = list(table_schema.fields)
            probe = spark.createDataFrame([], table_schema)
            for dcol, spec in new_transforms.items():
                src_col = _parse_transform(spec)[2]
                if src_col not in have:
                    raise ValueError(
                        f"alter_partition_spec: transform source "
                        f"{src_col!r} is not a table column"
                    )
                if dcol in have:
                    old_spec = next(
                        (h[dcol] for h in hist[:-1] if dcol in h), None
                    )
                    if old_spec != spec:
                        raise ValueError(
                            f"alter_partition_spec: derived column "
                            f"{dcol!r} collides with an existing column"
                        )
                    continue  # same name, same transform: reuse
                dt = probe.select(
                    _transform_expr(spec, probe).alias(dcol)
                ).schema[0].dataType
                fields.append(T.StructField(dcol, dt, True))
            new_doc["schema"] = json.dumps(T.StructType(fields).jsonValue())
        _carry_mapping(doc, new_doc)
        _carry_constraints(doc, new_doc)
        _carry_dv(doc, new_doc)
        _carry_extras(doc, new_doc)
        _carry_stats_config(doc, new_doc)
        for k in ("files", "files_manifests"):
            if doc.get(k) is not None:
                new_doc[k] = doc[k]
        ok = _publish_cas(
            fs, jvm, _manifest_path(root, new_version), _encode_commit(doc, new_doc)
        )
        return ok, [], new_version

    return _commit_retry(fs, jvm, root, _attempt)


def alter_manifested(
    spark: SparkSession,
    target_path: str,
    add_columns: dict[str, str] | None = None,
    drop_columns: list[str] | None = None,
    rename_columns: dict[str, str] | None = None,
    widen_types: dict[str, str] | None = None,
    fmt: str = "parquet",
) -> int:
    """ALTER TABLE for manifested tables — every variant is a
    METADATA-ONLY atomic commit; no data file is ever read or rewritten:

      * ``add_columns`` ({name: DDL type}): appended nullable; files
        written before the evolution surface the column as NULL via the
        explicit-schema read.
      * ``drop_columns``: the field leaves the stored schema (and the
        stats/bloom config); old files keep the bytes, reads never
        project them. Time travel to a pre-drop version still sees it.
      * ``rename_columns`` ({old: new}): Delta-style COLUMN MAPPING —
        the first rename freezes every column's physical (on-disk) name;
        reads scan physical names and alias to logical, later writes
        land in physical names, so old and new files stay consistent
        without rewriting either (parquet by-name resolution alone would
        NULL the renamed column in old files).
      * ``widen_types`` ({name: wider DDL type}): integral upcasts and
        float→double (`_WIDEN_OK`, reader-proven); the scan upcasts old
        files' narrower physical type per batch.

    Partition columns are immutable (their names are the directory
    layout). Optimistic multi-writer like every committer; returns the
    committed version. Rekeys per-file stats on rename/drop so
    ``prune_ranges``/``prune_points`` keep working in logical names."""
    root = target_path.rstrip("/")
    fs, jvm = _hadoop_fs(spark, root)
    add_columns = dict(add_columns or {})
    drop_columns = list(drop_columns or [])
    rename_columns = dict(rename_columns or {})
    widen_types = dict(widen_types or {})
    if not (add_columns or drop_columns or rename_columns or widen_types):
        raise ValueError("alter_manifested: no operation given")
    touched: list[str] = (
        list(add_columns) + drop_columns + list(rename_columns) + list(widen_types)
    )
    if len(set(touched)) != len(touched):
        raise ValueError(
            f"alter_manifested: a column appears in more than one operation: "
            f"{sorted({c for c in touched if touched.count(c) > 1})}"
        )

    def _attempt(doc, new_version, token):
        if doc.get("schema") is None:
            raise ValueError(
                f"{root} stores no schema (pre-schema manifest); "
                "ALTER requires manifest-managed schema authority"
            )
        schema = T.StructType.fromJson(json.loads(doc["schema"]))
        names = [f.name for f in schema.fields]
        part_cols = (
            {seg.split("=", 1)[0] for seg in next(iter(doc["partitions"])).split("/")}
            if doc["partitions"]
            else set()
        )
        for c in drop_columns + list(rename_columns) + list(widen_types):
            if c not in names:
                raise ValueError(f"alter_manifested: no such column {c!r}")
            if c in part_cols:
                raise ValueError(
                    f"alter_manifested: {c!r} is a partition column — its "
                    "name/type is the directory layout, immutable here"
                )
        targets = list(rename_columns.values())
        if len(set(targets)) != len(targets):
            raise ValueError(
                "alter_manifested: duplicate rename targets "
                f"{sorted({t for t in targets if targets.count(t) > 1})}"
            )
        for c, new in rename_columns.items():
            # a target name may only be taken by a column itself renamed
            # away (swap support) or dropped in the same ALTER
            if (
                new in names
                and new not in rename_columns
                and new not in drop_columns
            ) or new in add_columns:
                raise ValueError(f"alter_manifested: rename target {new!r} exists")
        for c in add_columns:
            if c in names:
                raise ValueError(f"alter_manifested: column {c!r} already exists")

        cons = doc.get("constraints") or {}
        if cons and (rename_columns or drop_columns):
            import re as _re

            for c in list(rename_columns) + drop_columns:
                hit = sorted(
                    n
                    for n, expr in cons.items()
                    if _re.search(rf"\b{_re.escape(c)}\b", expr)
                )
                if hit:
                    raise ValueError(
                        f"alter_manifested: column {c!r} is referenced by "
                        f"CHECK constraint(s) {hit}; drop them first"
                    )

        mapping = doc.get("column_mapping")
        if (rename_columns or drop_columns) and mapping is None:
            # freeze physical names NOW — drops need it too, so a later
            # re-add of the same name can't resurrect old files' bytes
            # via by-name parquet resolution
            mapping = {n: n for n in names}
        dropped_phys = list(doc.get("dropped_physical") or [])

        fields: list[T.StructField] = []
        for f in schema.fields:
            if f.name in drop_columns:
                continue
            name, dtype = f.name, f.dataType
            if f.name in widen_types:
                new_t = T._parse_datatype_string(widen_types[f.name])
                pair = (dtype.simpleString(), new_t.simpleString())
                if pair not in _WIDEN_OK:
                    raise ValueError(
                        f"alter_manifested: {pair[0]} -> {pair[1]} is not a "
                        f"reader-safe widening (allowed: {sorted(_WIDEN_OK)})"
                    )
                dtype = new_t
            fields.append(
                T.StructField(rename_columns.get(name, name), dtype, f.nullable)
            )
        for c, ddl in add_columns.items():
            fields.append(T.StructField(c, T._parse_datatype_string(ddl), True))
        final_names = [f.name for f in fields]
        if len(set(final_names)) != len(final_names):
            raise ValueError(
                "alter_manifested: post-ALTER schema has duplicate columns "
                f"{sorted({n for n in final_names if final_names.count(n) > 1})}"
            )

        # rekey mapping / stats config in ONE pass from the pre-ALTER
        # snapshot — sequential pop/insert corrupts swaps (a<->b) and
        # chains (a->b, b->c), silently pointing logical names at the
        # wrong physical bytes
        if mapping is not None:
            dropped_phys += [
                mapping[c] for c in drop_columns if c in mapping
            ]
            mapping = {
                rename_columns.get(l, l): p
                for l, p in mapping.items()
                if l not in drop_columns
            }
        stats_cols = [
            rename_columns.get(c, c)
            for c in (doc.get("stats_cols") or [])
            if c not in drop_columns
        ]
        bloom_cols = [
            rename_columns.get(c, c)
            for c in (doc.get("bloom_cols") or [])
            if c not in drop_columns
        ]
        split = doc.get("files_manifests") is not None
        rekeying = bool(rename_columns or drop_columns)
        # split layout: only a stats-REKEYING alter needs the per-leaf
        # files (and must rewrite every leaf stats file — the one
        # inherently O(table-metadata) alter); every other alter carries
        # the pointer map untouched
        files = (
            _read_split_stats(fs, jvm, root, doc)
            if split and rekeying and (stats_cols or bloom_cols)
            else doc.get("files")
        )
        if mapping is not None and add_columns:
            mapping = _extend_mapping(
                mapping, list(add_columns), tombstones=dropped_phys
            )

        # rekey per-file stats into the new logical names; dropped
        # columns' entries go with them
        if files is not None and (rename_columns or drop_columns):
            ren = dict(rename_columns)
            new_files = {}
            for rel, st in files.items():
                rec = {}
                for k, v in st.items():
                    base = k[len("__bloom_"):] if k.startswith("__bloom_") else k
                    if base in drop_columns:
                        continue
                    tgt = ren.get(base, base)
                    rec["__bloom_" + tgt if k.startswith("__bloom_") else tgt] = v
                new_files[rel] = rec
            files = new_files

        new_doc = {
            "version": new_version,
            "partitions": dict(doc["partitions"]),
            "schema": T.StructType(fields).json(),
        }
        if mapping is not None:
            new_doc["column_mapping"] = mapping
        if dropped_phys:
            new_doc["dropped_physical"] = dropped_phys
        _carry_constraints(doc, new_doc)
        _carry_dv(doc, new_doc)
        if stats_cols:
            new_doc["stats_cols"] = stats_cols
        elif doc.get("stats_cols"):
            new_doc["stats_cols"] = None  # dropped the last stats column
        if bloom_cols:
            new_doc["bloom_cols"] = bloom_cols
            # carry EVERY bloom config key — dropping bloom_bits_max /
            # bloom_fpr on a full-snapshot boundary would change the
            # probe build width and silently mis-prune adaptive tables
            for key in ("bloom_bits", "bloom_k", "bloom_fpr", "bloom_bits_max"):
                if key in doc:
                    new_doc[key] = doc[key]
        elif doc.get("bloom_cols"):
            new_doc["bloom_cols"] = None
        if files is not None and (stats_cols or bloom_cols):
            if split:
                new_doc["files_manifests"] = _split_stats_from_entries(
                    fs, jvm, root, new_version, token, files
                )
            else:
                new_doc["files"] = files
        elif split and (stats_cols or bloom_cols):
            new_doc["files_manifests"] = doc["files_manifests"]
        _carry_extras(doc, new_doc)
        new_doc["operation"] = "ALTER"
        ok = _publish_cas(
            fs, jvm, _manifest_path(root, new_version), _encode_commit(doc, new_doc)
        )
        return ok, [], new_version

    return _commit_retry(fs, jvm, root, _attempt)


class ConstraintViolation(ValueError):
    """A commit was REFUSED because staged rows violate a table CHECK
    constraint. The table is unchanged (validation runs before any
    rename/publish)."""


def _carry_constraints(doc: dict, new_doc: dict) -> None:
    if doc.get("constraints") and "constraints" not in new_doc:
        new_doc["constraints"] = doc["constraints"]


def _validate_constraints(doc: dict, staged: DataFrame, context: str) -> None:
    """Enforce the table's CHECK constraints on a commit's CHANGED slice
    (never the whole table — the committer only stages what it touched).
    SQL CHECK semantics: a row fails only when the expression is FALSE;
    NULL passes (add an explicit IS NOT NULL constraint to forbid it).
    One aggregate job counts violations for every constraint at once;
    a violation aborts BEFORE anything is renamed or published."""
    constraints = doc.get("constraints")
    if not constraints:
        return
    aggs = [
        F.sum(
            F.when(~F.coalesce(F.expr(sql), F.lit(True)), 1).otherwise(0)
        ).alias(name)
        for name, sql in constraints.items()
    ]
    row = staged.agg(*aggs).first()
    bad = {name: int(row[name]) for name in constraints if row[name]}
    if bad:
        detail = ", ".join(
            f"{name!r} ({constraints[name]}): {n} row(s)"
            for name, n in sorted(bad.items())
        )
        raise ConstraintViolation(
            f"{context}: staged rows violate CHECK constraint(s) {detail}; "
            "commit refused, table unchanged"
        )


def add_constraint_manifested(
    spark: SparkSession, target_path: str, name: str, sql_expr: str
) -> int:
    """ALTER TABLE ... ADD CONSTRAINT (Delta-style CHECK constraints):
    store a SQL boolean expression in the manifest; every later commit
    (merge / UPDATE / CDC batch) validates its STAGED slice against it
    and is refused wholesale on violation — bad rows never become
    readable, atomically. Adding the constraint validates the EXISTING
    table first (one full predicate scan — the one-time cost Delta also
    pays), so a green ALTER means the WHOLE table satisfies it.
    Returns the committed version."""
    root = target_path.rstrip("/")
    fs, jvm = _hadoop_fs(spark, root)

    def _attempt(doc, new_version, token):
        existing = doc.get("constraints") or {}
        if name in existing:
            raise ValueError(
                f"add_constraint_manifested: constraint {name!r} already "
                f"exists ({existing[name]!r}); drop it first"
            )
        probe = {**doc, "constraints": {name: sql_expr}}
        if doc["partitions"]:
            current = read_manifested(spark, root, version=doc["version"])
            _validate_constraints(probe, current, "add_constraint_manifested")
        new_doc = {
            "version": new_version,
            "partitions": dict(doc["partitions"]),
            "constraints": {**existing, name: sql_expr},
        }
        if doc.get("schema") is not None:
            new_doc["schema"] = doc["schema"]
        _carry_mapping(doc, new_doc)
        _carry_dv(doc, new_doc)
        if doc.get("stats_cols") or doc.get("bloom_cols"):
            _carry_stats_config(doc, new_doc)
            _carry_files(doc, new_doc)
        _carry_extras(doc, new_doc)
        new_doc["operation"] = "ADD CONSTRAINT"
        ok = _publish_cas(
            fs, jvm, _manifest_path(root, new_version), _encode_commit(doc, new_doc)
        )
        return ok, [], new_version

    return _commit_retry(fs, jvm, root, _attempt)


def drop_constraint_manifested(
    spark: SparkSession, target_path: str, name: str
) -> int:
    """ALTER TABLE ... DROP CONSTRAINT: metadata-only commit."""
    root = target_path.rstrip("/")
    fs, jvm = _hadoop_fs(spark, root)

    def _attempt(doc, new_version, token):
        existing = doc.get("constraints") or {}
        if name not in existing:
            raise ValueError(
                f"drop_constraint_manifested: no constraint {name!r} "
                f"(have: {sorted(existing)})"
            )
        kept = {k: v for k, v in existing.items() if k != name}
        new_doc = {
            "version": new_version,
            "partitions": dict(doc["partitions"]),
            "constraints": kept if kept else None,
        }
        if doc.get("schema") is not None:
            new_doc["schema"] = doc["schema"]
        _carry_mapping(doc, new_doc)
        _carry_dv(doc, new_doc)
        if doc.get("stats_cols") or doc.get("bloom_cols"):
            _carry_stats_config(doc, new_doc)
            _carry_files(doc, new_doc)
        _carry_extras(doc, new_doc)
        new_doc["operation"] = "DROP CONSTRAINT"
        ok = _publish_cas(
            fs, jvm, _manifest_path(root, new_version), _encode_commit(doc, new_doc)
        )
        return ok, [], new_version

    return _commit_retry(fs, jvm, root, _attempt)


def _list_branch_refs(fs, jvm, root: str) -> list[tuple[str, int]]:
    """[(name, base version)] of every live branch of ``root``."""
    bdir = f"{root.rstrip('/')}/{_MANIFEST_DIR}/{_BRANCH_SUBDIR}"
    if fs is None:
        import os

        try:
            names = [
                n
                for n in os.listdir(_strip_scheme(bdir))
                if not n.startswith(".")
            ]
        except FileNotFoundError:
            return []
    else:
        p = jvm.org.apache.hadoop.fs.Path(bdir)
        if not fs.exists(p):
            return []
        names = [
            st.getPath().getName()
            for st in fs.listStatus(p)
            if st.isDirectory()
        ]
    out = []
    for n in sorted(names):
        try:
            base = json.loads(
                _read_file(fs, jvm, f"{_branch_dir(root, n)}/.base").decode()
            )["version"]
        except Exception:
            continue  # half-created branch; ignored until its .base lands
        out.append((n, int(base)))
    return out


def _branch_base(fs, jvm, root: str, name: str) -> int:
    for n, base in _list_branch_refs(fs, jvm, root):
        if n == name:
            return base
    raise ValueError(
        f"no branch {name!r} on {root} (have: "
        f"{[n for n, _ in _list_branch_refs(fs, jvm, root)]})"
    )


def branch_create(
    spark: SparkSession,
    root: str,
    name: str,
    from_version: int | None = None,
) -> int:
    """Create a WRITABLE named ref forked from the current main head (or
    ``from_version``): inside `use_branch`, every committer in this
    module lands its commits on the branch's sub-log — staged under the
    table root as usual, INVISIBLE to main readers, streams, and catalog
    pins — until `branch_fastforward` publishes the branch head as one
    atomic main commit. This is the write-audit-publish gate (Iceberg's
    WAP): stage a pipeline's output on a branch, validate it, then
    publish; a bad batch is audited and dropped without main ever
    serving it. Returns the fork-point version."""
    if not name or "/" in name or name.startswith("."):
        raise ValueError(f"branch_create: invalid branch name {name!r}")
    fs, jvm = _hadoop_fs(spark, root)
    if any(n == name for n, _ in _list_branch_refs(fs, jvm, root)):
        raise ValueError(f"branch_create: branch {name!r} already exists")
    versions = _list_manifest_versions(fs, jvm, root)
    if not versions:
        raise FileNotFoundError(f"no manifest under {root}/{_MANIFEST_DIR}")
    base = versions[-1] if from_version is None else int(from_version)
    if base not in versions[-_RETAIN:]:
        raise ValueError(
            f"branch_create: fork point v{base} is outside the retained "
            f"window {versions[-_RETAIN:]}"
        )
    path = f"{_branch_dir(root, name)}/.base"
    _mkdirs_parent(fs, jvm, path)
    stream = fs.create(jvm.org.apache.hadoop.fs.Path(path), False)
    try:
        stream.write(bytearray(json.dumps({"version": base}).encode()))
    finally:
        stream.close()
    return base


@_contextmanager
def use_branch(spark: SparkSession, root: str, name: str):
    """Scope every manifest operation on ``root`` to branch ``name``:
    commits land on the branch sub-log, reads resolve the branch head,
    main commits made after the fork stay invisible. Thread-safe and
    reentrant (contextvar); other tables' operations are unaffected."""
    fs, jvm = _hadoop_fs(spark, root)
    base = _branch_base(fs, jvm, root, name)
    rs = _branch_key(root)
    tok = _BRANCH_CTX.set({**(_BRANCH_CTX.get() or {}), rs: (name, base)})
    try:
        yield
    finally:
        _BRANCH_CTX.reset(tok)


def list_branches(spark: SparkSession, root: str) -> DataFrame:
    """Live branches as a DataFrame (name, base_version, head_version,
    commits)."""
    fs, jvm = _hadoop_fs(spark, root)
    rows = []
    for name, base in _list_branch_refs(fs, jvm, root):
        bvs = _list_dir_versions(fs, jvm, _branch_dir(root, name))
        rows.append((name, base, bvs[-1] if bvs else base, len(bvs)))
    return spark.createDataFrame(
        rows,
        "name STRING, base_version BIGINT, head_version BIGINT, "
        "commits BIGINT",
    )


def branch_delete(spark: SparkSession, root: str, name: str) -> None:
    """Drop a branch: its sub-log is deleted now; data only its commits
    referenced becomes reclaimable at the next main commit's GC (after
    the orphan grace window)."""
    fs, jvm = _hadoop_fs(spark, root)
    _branch_base(fs, jvm, root, name)  # raises if absent
    fs.delete(jvm.org.apache.hadoop.fs.Path(_branch_dir(root, name)), True)


def branch_fastforward(
    spark: SparkSession,
    root: str,
    name: str,
    expectations: dict[str, str] | None = None,
    delete_branch: bool = True,
    fmt: str = "parquet",
) -> int:
    """PUBLISH a branch: validate, then make the branch head the next
    MAIN commit — one CAS, zero data movement (the branch's files were
    staged under the table root all along; main simply starts
    referencing them). The write-audit-publish gate:

    * ``expectations`` — {name: SQL boolean predicate} evaluated over
      the branch head; any row where a predicate is false or NULL
      REFUSES the publish, naming the expectation and its violation
      count. Main readers never saw the bad data; fix on the branch (or
      `branch_delete`) and retry.
    * If main advanced past the fork point, the branch is classified
      with the same commit-conflict rules as racing writers
      (`_rebase_conflict`): disjoint-leaf work fast-forwards through a
      three-way merge; a true conflict refuses with the reason.
    * CHANGE-FEED: on a ``change_feed`` table the publish stages the
      branch's NET row delta (base → branch head, computed by
      `read_changes` over the branch view) as its own change sidecar,
      so streams and CDC consumers ride through the publish whatever
      mix of commits the branch carried. When the net delta is not
      computable (a sidecar-less rewrite on the branch) the publish is
      structural and the stream's ``on_rewrite`` policy applies.

    Returns the published main version."""
    fs, jvm = _hadoop_fs(spark, root)
    base_v = _branch_base(fs, jvm, root, name)
    rs = _branch_key(root)
    tok = _BRANCH_CTX.set({**(_BRANCH_CTX.get() or {}), rs: (name, base_v)})
    try:
        bvs = _list_dir_versions(fs, jvm, _branch_dir(root, name))
        if not bvs:
            raise ValueError(
                f"branch_fastforward: branch {name!r} has no commits"
            )
        bhead = bvs[-1]
        H = _resolve_doc(fs, jvm, root, bhead)
        B = _resolve_doc(fs, jvm, root, base_v)
        if expectations:
            df = read_manifested(spark, root)
            failed = {}
            for ename, pred in sorted(expectations.items()):
                p = F.expr(pred)
                bad = df.filter(~p | p.isNull()).count()
                if bad:
                    failed[ename] = bad
            if failed:
                raise ValueError(
                    f"branch_fastforward: branch {name!r} of {root} failed "
                    f"expectations {failed} — main was NOT advanced; fix "
                    "the branch or branch_delete it"
                )
        change_rels: list[str] = []
        change_ptr = None
        if H.get("change_feed") and bhead != base_v:
            # the publish's CDC delta = the branch's net change feed,
            # staged once (the pointer is version-agnostic)
            try:
                fwd = read_changes(spark, root, base_v, bhead)
                holder: dict = {}
                change_rels = _stage_change_data(
                    fs, jvm, root, fmt, bhead, uuid.uuid4().hex[:8],
                    _to_physical(fwd, H.get("column_mapping")), holder,
                )
                change_ptr = holder.get("change_data")
            except (ValueError, FileNotFoundError):
                pass  # structural publish; stream policy applies
    finally:
        _BRANCH_CTX.reset(tok)

    for _ in range(_COMMIT_RETRIES):
        M = _load_doc(fs, jvm, root)
        if M["version"] != base_v:
            reason = _rebase_conflict(B, M, H)
            if reason is not None:
                for rel in change_rels:
                    fs.delete(
                        jvm.org.apache.hadoop.fs.Path(
                            f"{root.rstrip('/')}/{rel}"
                        ),
                        True,
                    )
                raise ValueError(
                    f"branch_fastforward: branch {name!r} conflicts with "
                    f"main commits since the fork ({reason}); re-stage on "
                    "a fresh branch"
                )
            out = _rebase_doc(B, M, H)
        else:
            out = {
                k: v
                for k, v in H.items()
                if not k.startswith("_")
                and k not in ("committed_at_ms", "parent")
            }
            out["version"] = M["version"] + 1
        out.pop("change_data", None)  # per-commit; never the head's own
        if change_ptr is not None:
            out["change_data"] = change_ptr
        out["operation"] = "PUBLISH"
        # tags are MAIN ref state — never the branch's frozen copy
        if M.get("tags") is not None:
            out["tags"] = M["tags"]
        else:
            out.pop("tags", None)
        if _publish_cas(
            fs,
            jvm,
            _manifest_path(root, out["version"]),
            _encode_commit(M, out),
        ):
            published = out["version"]
            break
    else:
        for rel in change_rels:
            fs.delete(
                jvm.org.apache.hadoop.fs.Path(f"{root.rstrip('/')}/{rel}"),
                True,
            )
        raise RuntimeError(
            f"branch_fastforward: lost {_COMMIT_RETRIES} consecutive "
            f"publish races on {root}"
        )
    if delete_branch:
        fs.delete(jvm.org.apache.hadoop.fs.Path(_branch_dir(root, name)), True)
    versions = _list_manifest_versions(fs, jvm, root)
    _gc(fs, jvm, root, versions[-_RETAIN:])
    return published


def tag_create(
    spark: SparkSession,
    target_path: str,
    name: str,
    version: int | None = None,
    replace: bool = False,
) -> int:
    """Create a named TAG pinning a snapshot (Iceberg's tag refs — the
    "dataset release" primitive): ``tag_create(…, "train-v1")`` freezes
    the current (or a given retained) version under a stable name, and
    GC/expiry keep the tagged snapshot's data, deletion vectors, stats
    files, and manifest chain alive for as long as the tag exists — the
    reproducibility contract a training pipeline needs ("the exact bytes
    model X was trained on") without copying a single file.

    Tags live in the manifest doc itself and travel through the delta
    chain like constraints, so they are atomic, versioned, and race-safe
    under the optimistic-commit loop. ``version`` must be retained or
    already tag-protected (anything else may already be reclaimed).
    ``replace=True`` moves an existing tag. Metadata-only commit; returns
    the committed version."""
    root = target_path.rstrip("/")
    fs, jvm = _hadoop_fs(spark, root)

    def _attempt(doc, new_version, token):
        existing = doc.get("tags") or {}
        if name in existing and not replace:
            raise ValueError(
                f"tag_create: tag {name!r} already exists "
                f"(v{existing[name]['version']}); pass replace=True to move"
            )
        target_v = doc["version"] if version is None else int(version)
        protected = _list_manifest_versions(fs, jvm, root)[-_RETAIN:]
        protected += [t["version"] for t in existing.values()]
        if target_v not in protected:
            raise ValueError(
                f"tag_create: v{target_v} of {root} is outside the "
                f"retention window and not tag-protected (readable: "
                f"{sorted(set(protected))}) — its data may be reclaimed"
            )
        new_doc = {
            "version": new_version,
            "partitions": dict(doc["partitions"]),
            "tags": {
                **existing,
                name: {
                    "version": target_v,
                    "created_at_ms": int(time.time() * 1000),
                },
            },
        }
        if doc.get("schema") is not None:
            new_doc["schema"] = doc["schema"]
        _carry_mapping(doc, new_doc)
        _carry_dv(doc, new_doc)
        _carry_constraints(doc, new_doc)
        if doc.get("stats_cols") or doc.get("bloom_cols"):
            _carry_stats_config(doc, new_doc)
            _carry_files(doc, new_doc)
        _carry_extras(doc, new_doc)
        new_doc["operation"] = "TAG"
        ok = _publish_cas(
            fs, jvm, _manifest_path(root, new_version), _encode_commit(doc, new_doc)
        )
        return ok, [], new_version

    return _commit_retry(fs, jvm, root, _attempt)


def tag_delete(spark: SparkSession, target_path: str, name: str) -> int:
    """Delete a tag — the pinned snapshot becomes reclaimable at the next
    GC unless still inside the retention window. Metadata-only commit."""
    root = target_path.rstrip("/")
    fs, jvm = _hadoop_fs(spark, root)

    def _attempt(doc, new_version, token):
        existing = doc.get("tags") or {}
        if name not in existing:
            raise ValueError(
                f"tag_delete: no tag {name!r} (have: {sorted(existing)})"
            )
        kept = {k: v for k, v in existing.items() if k != name}
        new_doc = {
            "version": new_version,
            "partitions": dict(doc["partitions"]),
            "tags": kept if kept else None,
        }
        if doc.get("schema") is not None:
            new_doc["schema"] = doc["schema"]
        _carry_mapping(doc, new_doc)
        _carry_dv(doc, new_doc)
        _carry_constraints(doc, new_doc)
        if doc.get("stats_cols") or doc.get("bloom_cols"):
            _carry_stats_config(doc, new_doc)
            _carry_files(doc, new_doc)
        _carry_extras(doc, new_doc)
        new_doc["operation"] = "UNTAG"
        ok = _publish_cas(
            fs, jvm, _manifest_path(root, new_version), _encode_commit(doc, new_doc)
        )
        return ok, [], new_version

    return _commit_retry(fs, jvm, root, _attempt)


def list_tags(spark: SparkSession, target_path: str) -> DataFrame:
    """The table's live tags as a DataFrame (name, version,
    created_at_ms) — metadata-only, one manifest resolution."""
    root = target_path.rstrip("/")
    fs, jvm = _hadoop_fs(spark, root)
    tags = _load_doc(fs, jvm, root).get("tags") or {}
    rows = [
        (n, int(t["version"]), int(t["created_at_ms"]))
        for n, t in sorted(tags.items())
    ]
    return spark.createDataFrame(
        rows, "name STRING, version INT, created_at_ms LONG"
    )


def rollback_manifested(
    spark: SparkSession,
    target_path: str,
    version: int,
    fmt: str = "parquet",
    with_changes: bool | None = None,
) -> int:
    """RESTORE the table to a retained snapshot — as a NEW commit, never
    by rewinding the pointer (Delta's RESTORE semantics): the bad commits
    stay in history for forensics, readers see the restore atomically,
    and the OCC loop serializes it against concurrent writers. The
    restored state is the old snapshot's complete doc — leaf mapping,
    schema, column mapping, deletion vectors, stats — so a rollback
    across an ALTER or a DV delete restores those too.

    Only RETAINED versions are restorable (their data is GC-guaranteed
    present); the incident-recovery window this affords is `_RETAIN`
    commits — size retention to the rollback horizon you want. Returns
    the new version number.

    CHANGE SIDECAR: on a ``change_feed`` table (or ``with_changes=True``)
    the restore stages its exact row-level delta — the INVERSE of the
    net change feed from the target version to the current head, which
    `read_changes` already computes from manifests + sidecars — so
    streams and CDC consumers RIDE THROUGH the rollback instead of
    refusing it. When the delta is not computable (a rewrite without a
    sidecar in the range, or a schema change across the boundary) the
    restore falls back to a plain rewrite commit — streams then apply
    their ``on_rewrite`` policy — unless ``with_changes=True`` demanded
    it, which raises. ``with_changes=False`` skips the delta outright.
    Live TAGS are preserved, not rewound."""
    root = target_path.rstrip("/")
    fs, jvm = _hadoop_fs(spark, root)

    def _attempt(doc, new_version, token):
        old = _load_doc(fs, jvm, root, version)  # raises outside retention
        new_doc = {
            k: v
            for k, v in old.items()
            if not k.startswith("_")
            # version/committed_at_ms are the new commit's own;
            # change_data is PER-COMMIT (copying it would re-announce the
            # restored version's change sidecar as THIS commit's CDC
            # delta); operation is stamped below; tags are ref state, not
            # snapshot state — the CURRENT tags survive a restore (else a
            # rollback would silently delete tags created since the
            # target and let GC reclaim what they pin)
            and k not in (
                "version", "committed_at_ms", "change_data", "operation",
                "tags",
            )
        }
        new_doc["version"] = new_version
        if doc.get("tags") is not None:
            new_doc["tags"] = doc["tags"]
        # explicit nulls stop delta-chain inheritance of state the old
        # snapshot did not have (e.g. rolling back across a DV delete)
        for key in (
            "dv",
            "schema",
            "column_mapping",
            "dropped_physical",
            "extra_vrels",
            "txns",
            "constraints",
            "files_manifests",
            *_STATS_CONFIG_KEYS,
        ):
            if key in doc and key not in new_doc:
                new_doc[key] = None
        change_rels: list[str] = []
        want = doc.get("change_feed") if with_changes is None else with_changes
        if want and doc["version"] != version:
            try:
                if old.get("schema") != doc.get("schema"):
                    raise ValueError(
                        "the restore crosses a schema change"
                    )
                fwd = read_changes(spark, root, version, doc["version"])
                inv = fwd.withColumn(
                    "_change_type",
                    F.when(
                        F.col("_change_type") == "insert", "delete"
                    ).otherwise("insert"),
                )
                change_rels = _stage_change_data(
                    fs, jvm, root, fmt, new_version, token,
                    _to_physical(inv, old.get("column_mapping")),
                    new_doc,
                )
            except (ValueError, FileNotFoundError) as e:
                # read_changes/_stage_change_data surface either — match
                # branch_fastforward's fallback contract
                if with_changes:
                    raise ValueError(
                        "rollback_manifested: cannot compute the "
                        f"restore's change delta: {e}"
                    ) from e
                # fall back: plain rewrite commit, stream policy applies
        new_doc["operation"] = "RESTORE"
        ok = _publish_cas(
            fs, jvm, _manifest_path(root, new_version), _encode_commit(doc, new_doc)
        )
        return ok, change_rels, new_version

    return _commit_retry(fs, jvm, root, _attempt)


def delete_rows_manifested(
    spark: SparkSession,
    target_path: str,
    predicate,
    fmt: str = "parquet",
) -> int:
    """DELETE ... WHERE via DELETION VECTORS — the merge-on-read twin of
    `delete_where_manifested` (which is copy-on-write). No data file is
    rewritten: the matched rows' physical coordinates (file rel, row
    ordinal) are appended to the snapshot's DV dataset under
    ``<root>/_dv/``, and one atomic manifest commit points at it. Reads
    filter the deleted rows with a broadcast anti-join and drop
    fully-deleted files from the listing (`read_manifested`).

    This is THE write-amplification fix at scale: deleting 0.1% of a
    100 TB table rewrites ~100 GB of parquet under copy-on-write but
    writes only a few MB of positions here — Delta 3.x / Iceberg v2
    merge-on-read semantics, built from `_metadata.row_index` and a
    plain parquet sidecar. The read-side cost (one broadcast anti-join)
    is bounded by compaction cadence: `compact_manifested` reads through
    the DVs, so a rewrite MATERIALIZES the deletions and the carried
    pointer drops those files' entries (`_carry_dv`).

    SQL NULL semantics match the rewrite path: only predicate-TRUE rows
    delete. Idempotent across reruns (the snapshot read already excludes
    deleted rows, so a re-matched row cannot re-enter). Optimistic
    multi-writer like every committer. Returns the rows newly deleted."""
    return _delete_dv(
        spark,
        target_path,
        fmt,
        lambda t: t.filter(F.coalesce(predicate, F.lit(False))),
    )


def delete_keys_dv_manifested(
    spark: SparkSession,
    target_path: str,
    keys_df: DataFrame,
    keys: list[str],
    fmt: str = "parquet",
    tombstones: bool = False,
) -> int:
    """DELETE-by-key via deletion vectors — the merge-on-read twin of
    `delete_keys_manifested`: matched keys' row positions land in the DV
    sidecar (one semi-join discovery pass, no file rewritten). The CDC
    tombstone shape: a streaming sink applying Debezium deletes per
    micro-batch must not rewrite a partition per batch — positions are
    O(tombstones). NOTE the erasure caveat is STRONGER than the rewrite
    twin's: deleted bytes live in the data files until a compaction
    materializes the DVs (then normal retention GC applies) — for
    right-to-erasure, follow with `compact_manifested` + `manifest_expire`.

    ``tombstones=True`` (change_feed tables): stage a REDACTED change
    sidecar — delete rows carrying ONLY the key columns, every other
    column NULL — so downstream CDC consumers cascade the erasure by
    key without the sidecar replicating any erased payload byte. The
    default (False) emits no change data at all; a stream then treats
    the commit per its on_rewrite policy.
    Returns the rows newly deleted."""
    key_set = keys_df.select(*keys).distinct()
    # emit_changes=False: this is the ERASURE path — copying the doomed
    # rows into a change sidecar would defeat right-to-erasure. With
    # tombstones=True a keys-only redacted sidecar is staged instead.
    return _delete_dv(
        spark,
        target_path,
        fmt,
        lambda t: t.join(key_set, keys, "left_semi"),
        emit_changes=False,
        tombstone_cols=list(keys) if tombstones else None,
    )


def _move_staged_leaves(
    fs, jvm, root: str, staging: str, cols: list[str],
    new_version: int, token: str, mapping: dict, old_extras: dict | None,
) -> tuple[dict, dict, list[str]]:
    """Move a partitionBy staging tree's leaf dirs into append-extra
    (or fresh-primary) vrels. Returns (new_mapping, extras,
    staged_vrels) — the shared tail of every DV+append committer."""
    extras = {r: list(v) for r, v in (old_extras or {}).items()}
    new_mapping = dict(mapping)
    staged_vrels: list[str] = []
    stack = [(jvm.org.apache.hadoop.fs.Path(staging), "", 0)]
    leaves: list[str] = []
    while stack:
        path, rel, d = stack.pop()
        for st in fs.listStatus(path):
            name = st.getPath().getName()
            if not st.isDirectory() or "=" not in name:
                continue
            r = f"{rel}/{name}" if rel else name
            if d + 1 == len(cols):
                leaves.append(r)
            else:
                stack.append((st.getPath(), r, d + 1))
    for rel in leaves:
        vrel = f"{rel}/{_vdir(new_version, token)}"
        _mkdirs_parent(fs, jvm, f"{root}/{vrel}")
        fs.rename(
            jvm.org.apache.hadoop.fs.Path(f"{staging}/{rel}"),
            jvm.org.apache.hadoop.fs.Path(f"{root}/{vrel}"),
        )
        if rel in new_mapping:
            extras.setdefault(rel, []).append(vrel)
        else:
            new_mapping[rel] = vrel  # first data for this leaf
        staged_vrels.append(vrel)
    fs.delete(jvm.org.apache.hadoop.fs.Path(staging), True)
    return new_mapping, extras, staged_vrels


def merge_upsert_mor_manifested(
    spark: SparkSession,
    target_path: str,
    source: DataFrame,
    keys: list[str],
    fmt: str = "parquet",
    txn_app: str | None = None,
    txn_version: int | None = None,
) -> int:
    """MERGE (upsert) via DELETION VECTORS + APPEND — the merge-on-read
    twin of `merge_upsert_manifested`: matched target rows' positions
    tombstone into the DV sidecar and EVERY source row (updates and
    fresh inserts alike) lands as append extras — one atomic commit,
    cost O(source rows) written, no leaf rewritten. This is the write
    path a long-lived streaming CDC feed wants: per micro-batch the
    sink writes the batch, not the touched partitions
    (`streaming.run_stream_cdc_upsert(upsert_mode="mor")`); the feed's
    periodic OPTIMIZE materializes DVs and consolidates extras.

    Source must be KEY-UNIQUE (collapse last-wins first — the CDC sink
    does) and schema-matched: MoR merge never evolves schema (route
    evolution through the copy-on-write `merge_upsert_manifested`).
    Works unchanged on spec-EVOLVED tables (postimages land under the
    CURRENT spec). CHECK constraints validate the source slice; on
    change_feed tables the commit stages exact preimage-delete +
    postimage-insert pairs. ``txn_app``/``txn_version`` give replayed
    writers exactly-once, like `append_manifested`. Returns the source
    rows applied (0 for a skipped replay)."""
    if (txn_app is None) != (txn_version is None):
        raise ValueError(
            "merge_upsert_mor_manifested: txn_app and txn_version go together"
        )
    root = target_path.rstrip("/")
    fs, jvm = _hadoop_fs(spark, root)
    _clean_stale_staging(fs, jvm, root)

    def _attempt(doc, new_version, token):
        if txn_app is not None:
            applied = (doc.get("txns") or {}).get(txn_app)
            if applied is not None and int(txn_version) <= int(applied):
                return True, [], 0  # replayed transaction: already in
        mapping = doc["partitions"]
        keep = [v for v in _list_manifest_versions(fs, jvm, root)][-_RETAIN:]
        _gc(fs, jvm, root, keep)
        if not mapping:
            raise ValueError(
                f"merge_upsert_mor_manifested: {root} has no partitions — "
                "create the table with write_manifested first"
            )
        transforms = doc.get("partition_transforms") or {}
        if transforms:
            cols = list(transforms)
        else:
            cols = [
                seg.split("=", 1)[0] for seg in next(iter(mapping)).split("/")
            ]
        src = source
        for dcol, spec in transforms.items():
            if dcol not in src.columns:
                src = src.withColumn(dcol, _transform_expr(spec, src))
        if doc.get("schema") is not None:
            schema = T.StructType.fromJson(json.loads(doc["schema"]))
            derived_any: set[str] = set()
            for h in doc.get("partition_specs") or []:
                derived_any.update(h)
            want = {f.name for f in schema.fields}
            have = set(src.columns)
            missing = sorted(want - have - derived_any)
            extra_cols = sorted(have - want)
            if missing or extra_cols:
                raise ValueError(
                    "merge_upsert_mor_manifested: source schema does not "
                    f"match the table at {root} — missing={missing} "
                    f"extra={extra_cols}. MoR merge never evolves schema; "
                    "route evolution through merge_upsert_manifested."
                )
            src = src.select(
                *[f.name for f in schema.fields if f.name in src.columns]
            )
        _validate_constraints(doc, src, "merge_upsert_mor_manifested")
        for c in cols:
            src = src.withColumn(c, F.col(c).cast("string"))
        src = src.persist()
        try:
            n_src = src.count()
            if n_src == 0:
                return True, [], 0
            target = read_manifested(
                spark, root, fmt, version=doc["version"], _with_location=True
            )
            key_set = src.select(*keys).distinct()
            matched = target.join(F.broadcast(key_set), keys, "left_semi")

            # 1) tombstone the matched target rows' positions (one
            # chunk, O(matched) — the chain folds past _DV_CHUNKS_MAX)
            dv_new = matched.select(
                F.col("__dv_file").alias("file_rel"),
                F.col("__dv_pos").alias("pos"),
            )
            dv_doc, dv_staged, _n_dv = _dv_commit(
                spark, fs, jvm, root, doc, new_version, token, dv_new
            )

            # 2) stage EVERY source row as append extras
            cmap = doc.get("column_mapping")
            staging = f"{root}.__manifest_staging__{token}"
            _to_physical(src, cmap).write.mode("overwrite").partitionBy(
                *cols
            ).format(fmt).save(staging)
            new_mapping, extras, staged_vrels = _move_staged_leaves(
                fs, jvm, root, staging, cols, new_version, token,
                mapping, doc.get("extra_vrels"),
            )

            new_doc: dict = {"version": new_version, "partitions": new_mapping}
            if dv_doc is not None:
                new_doc["dv"] = dv_doc
            else:
                _carry_dv(doc, new_doc)
            if extras:
                new_doc["extra_vrels"] = extras
            if txn_app is not None:
                new_doc["txns"] = {
                    **(doc.get("txns") or {}), txn_app: int(txn_version)
                }
            if doc.get("schema") is not None:
                new_doc["schema"] = doc["schema"]
            _carry_mapping(doc, new_doc)
            _carry_constraints(doc, new_doc)
            _attach_stats(
                spark, fmt, root, doc, new_doc, staged_vrels, token,
                col_mapping=cmap,
            )
            new_doc["operation"] = "MERGE"
            change_rels: list[str] = []
            if doc.get("change_feed"):
                pre = matched.drop("__dv_file", "__dv_pos").select(
                    *src.columns
                )
                for c in cols:
                    pre = pre.withColumn(c, F.col(c).cast("string"))
                changes = pre.withColumn(
                    "_change_type", F.lit("delete")
                ).unionByName(
                    src.withColumn("_change_type", F.lit("insert"))
                )
                change_rels = _stage_change_data(
                    fs, jvm, root, fmt, new_version, token,
                    _to_physical(changes, cmap), new_doc,
                )
            ok = _publish_cas(
                fs, jvm, _manifest_path(root, new_version),
                _encode_commit(doc, new_doc),
            )
            cleanup = dv_staged + staged_vrels + change_rels
            return ok, cleanup, n_src, new_doc
        finally:
            src.unpersist()

    return _commit_retry(fs, jvm, root, _attempt)


def update_rows_manifested(
    spark: SparkSession,
    target_path: str,
    assignments: dict,
    predicate,
    fmt: str = "parquet",
) -> int:
    """UPDATE ... WHERE via DELETION VECTORS + APPEND — the
    merge-on-read twin of `update_where_manifested` (which rewrites
    every touched leaf copy-on-write). No data file is rewritten: the
    matched rows' physical positions land in the DV sidecar and their
    updated images land as APPEND extras of the leaves they (now)
    belong to — one atomic commit, cost O(changed rows) written.
    This is Delta's DV-powered UPDATE: a point update on a 1 GB leaf
    writes kilobytes, not the gigabyte; the leaf's next OPTIMIZE
    materializes the DVs and consolidates the extras.

    Semantics match the copy-on-write twin: only predicate-TRUE rows
    update (SQL NULL keeps the row); assignments may reference the old
    row's columns; an assignment that changes a partition-defining
    SOURCE column moves the row to its new leaf (possibly brand-new).
    Works unchanged on spec-EVOLVED tables — deletion is positional on
    either generation and postimages land under the CURRENT spec.
    CHECK constraints validate the postimages; on change_feed tables
    the commit stages the exact preimage-delete + postimage-insert
    pairs. Returns the rows updated."""
    root = target_path.rstrip("/")
    fs, jvm = _hadoop_fs(spark, root)
    _clean_stale_staging(fs, jvm, root)

    def _attempt(doc, new_version, token):
        mapping = doc["partitions"]
        keep = [v for v in _list_manifest_versions(fs, jvm, root)][-_RETAIN:]
        _gc(fs, jvm, root, keep)
        if not mapping:
            return True, [], 0

        transforms = doc.get("partition_transforms") or {}
        if transforms:
            cols = list(transforms)
        else:
            cols = [
                seg.split("=", 1)[0] for seg in next(iter(mapping)).split("/")
            ]
        target = read_manifested(
            spark, root, fmt, version=doc["version"], _with_location=True
        )
        matched = target.filter(F.coalesce(predicate, F.lit(False)))

        # postimages: assignments applied to the matched rows, derived
        # partition columns RE-derived from the (possibly updated)
        # source columns so a moved row lands in its new leaf
        post = matched.drop("__dv_file", "__dv_pos")
        for c, expr in assignments.items():
            if c not in post.columns:
                raise ValueError(f"update_rows_manifested: no column {c!r}")
            post = post.withColumn(c, expr)
        all_specs: dict[str, str] = {}
        for h in doc.get("partition_specs") or [transforms]:
            all_specs.update(h)
        if transforms:
            if set(assignments) & set(all_specs):
                raise ValueError(
                    "update_rows_manifested: assign to SOURCE columns — "
                    "transform-derived partition columns re-derive"
                )
            post = post.drop(*[c for c in all_specs if c in post.columns])
            for dcol, spec in transforms.items():
                post = post.withColumn(dcol, _transform_expr(spec, post))
        _validate_constraints(doc, post, "update_rows_manifested")
        if doc.get("schema") is not None:
            schema = T.StructType.fromJson(json.loads(doc["schema"]))
            order = [f.name for f in schema.fields if f.name in post.columns]
            post = post.select(*order)
        for c in cols:
            post = post.withColumn(c, F.col(c).cast("string"))
        post = post.persist()
        try:
            n_updated = post.count()
            if n_updated == 0:
                return True, [], 0

            # 1) tombstone the old positions (one chunk, O(matched) —
            # the chain folds past _DV_CHUNKS_MAX)
            dv_new = matched.select(
                F.col("__dv_file").alias("file_rel"),
                F.col("__dv_pos").alias("pos"),
            )
            dv_doc, dv_staged, _n_dv = _dv_commit(
                spark, fs, jvm, root, doc, new_version, token, dv_new
            )

            # 2) stage the postimages as append extras
            cmap = doc.get("column_mapping")
            staging = f"{root}.__manifest_staging__{token}"
            _to_physical(post, cmap).write.mode("overwrite").partitionBy(
                *cols
            ).format(fmt).save(staging)
            new_mapping, extras, staged_vrels = _move_staged_leaves(
                fs, jvm, root, staging, cols, new_version, token,
                mapping, doc.get("extra_vrels"),
            )

            new_doc = {
                "version": new_version,
                "partitions": new_mapping,
                "dv": dv_doc,
            }
            if extras:
                new_doc["extra_vrels"] = extras
            if doc.get("schema") is not None:
                new_doc["schema"] = doc["schema"]
            _carry_mapping(doc, new_doc)
            _carry_constraints(doc, new_doc)
            _attach_stats(
                spark, fmt, root, doc, new_doc, staged_vrels, token,
                col_mapping=cmap,
            )
            new_doc["operation"] = "UPDATE"
            change_rels: list[str] = []
            if doc.get("change_feed"):
                # preimages aligned to the postimage column set (a
                # spec-evolved read also carries old generations'
                # derived columns, which the staged shape drops)
                pre = matched.drop("__dv_file", "__dv_pos").select(
                    *post.columns
                )
                for c in cols:
                    pre = pre.withColumn(c, F.col(c).cast("string"))
                changes = pre.withColumn(
                    "_change_type", F.lit("delete")
                ).unionByName(
                    post.withColumn("_change_type", F.lit("insert"))
                )
                change_rels = _stage_change_data(
                    fs, jvm, root, fmt, new_version, token,
                    _to_physical(changes, cmap), new_doc,
                )
            ok = _publish_cas(
                fs, jvm, _manifest_path(root, new_version),
                _encode_commit(doc, new_doc),
            )
            return ok, dv_staged + staged_vrels + change_rels, n_updated, new_doc
        finally:
            post.unpersist()

    return _commit_retry(fs, jvm, root, _attempt)


def _redacted_tombstones(doc: dict, matched, tombstone_cols: list[str]):
    """Keys-only delete rows in the table's full schema: the matched
    (still-live) rows' distinct key tuples, every non-key column NULL.
    The erasure can then CASCADE through the change feed while the
    sidecar itself contains nothing worth erasing."""
    if doc.get("schema") is None:
        raise ValueError(
            "tombstones=True requires a stored schema (manifest_init/"
            "write_manifested record one)"
        )
    schema = T.StructType.fromJson(json.loads(doc["schema"]))
    missing = set(tombstone_cols) - {f.name for f in schema.fields}
    if missing:
        raise ValueError(f"tombstone key columns not in schema: {missing}")
    keyd = matched.select(*tombstone_cols).distinct()
    return keyd.select(
        *[
            (
                F.col(f.name).cast(f.dataType)
                if f.name in tombstone_cols
                else F.lit(None).cast(f.dataType)
            ).alias(f.name)
            for f in schema.fields
        ]
    ).withColumn("_change_type", F.lit("delete"))


def _delete_dv(
    spark: SparkSession,
    target_path: str,
    fmt: str,
    matcher,
    emit_changes: bool = True,
    tombstone_cols: list[str] | None = None,
) -> int:
    """Shared merge-on-read DELETE commit: ``matcher`` narrows the
    location-bearing snapshot read to the doomed rows; everything after
    is the DV union + counts + sidecar write + pointer CAS."""
    root = target_path.rstrip("/")
    fs, jvm = _hadoop_fs(spark, root)
    _clean_stale_staging(fs, jvm, root)

    def _attempt(doc, new_version, token):
        # no spec guard: deletion vectors are POSITIONAL (file_rel, pos)
        # — no leaf is rewritten, so a mixed-generation table is fine;
        # the location-bearing read re-derives every generation's
        # columns, so matchers on derived columns work across specs
        mapping = doc["partitions"]
        keep = [v for v in _list_manifest_versions(fs, jvm, root)][-_RETAIN:]
        _gc(fs, jvm, root, keep)
        if not mapping:
            return True, [], 0

        target = read_manifested(
            spark, root, fmt, version=doc["version"], _with_location=True
        )
        matched = matcher(target).select(
            F.col("__dv_file").alias("file_rel"), F.col("__dv_pos").alias("pos")
        )
        # one CHUNK holding only this commit's positions — O(new), never
        # O(all deletions so far); the chain folds past _DV_CHUNKS_MAX
        dv_doc, dv_staged, n_new = _dv_commit(
            spark, fs, jvm, root, doc, new_version, token, matched
        )
        if n_new == 0:
            return True, [], 0

        new_doc = {
            "version": new_version,
            "partitions": dict(mapping),
            "dv": dv_doc,
        }
        if doc.get("schema") is not None:
            new_doc["schema"] = doc["schema"]
        _carry_mapping(doc, new_doc)
        _carry_constraints(doc, new_doc)
        if doc.get("stats_cols") or doc.get("bloom_cols"):
            # data files are untouched: stats stay valid (min/max/bloom
            # become conservative over-approximations of the live rows)
            _carry_stats_config(doc, new_doc)
            _carry_files(doc, new_doc)
        _carry_extras(doc, new_doc)
        new_doc["operation"] = "DELETE"
        change_rels: list[str] = []
        if emit_changes and doc.get("change_feed"):
            doomed = (
                matcher(target)
                .drop("__dv_file", "__dv_pos")
                .withColumn("_change_type", F.lit("delete"))
            )
            change_rels = _stage_change_data(
                fs, jvm, root, fmt, new_version, token,
                _to_physical(doomed, doc.get("column_mapping")),
                new_doc,
            )
        elif tombstone_cols and doc.get("change_feed"):
            tomb = _redacted_tombstones(
                doc, matcher(target), tombstone_cols
            )
            change_rels = _stage_change_data(
                fs, jvm, root, fmt, new_version, token,
                _to_physical(tomb, doc.get("column_mapping")),
                new_doc,
            )
        ok = _publish_cas(
            fs, jvm, _manifest_path(root, new_version), _encode_commit(doc, new_doc)
        )
        return ok, dv_staged + change_rels, n_new, new_doc

    return _commit_retry(fs, jvm, root, _attempt)


def version_at_timestamp(spark: SparkSession, root: str, ts_ms: int) -> int:
    """AS-OF-TIMESTAMP resolution: the newest RETAINED version whose
    commit stamp is <= ``ts_ms`` (epoch millis) — pair with
    ``read_manifested(version=...)`` for "read the table as of 2am"
    incident forensics. Bounded by the same retention window as every
    versioned read; raises if no retained commit is old enough (the
    honest answer — resolving to a newer snapshot would silently lie)."""
    fs, jvm = _hadoop_fs(spark, root)
    versions = _list_manifest_versions(fs, jvm, root)
    if not versions:
        raise FileNotFoundError(f"no manifest under {root}/{_MANIFEST_DIR}")
    best = None
    for v in versions[-_RETAIN:]:
        stamp = _load_raw(fs, jvm, root, v).get("committed_at_ms")
        if stamp is not None and stamp <= ts_ms:
            best = v
    if best is None:
        raise FileNotFoundError(
            f"no retained snapshot of {root} at or before ts_ms={ts_ms} "
            f"(window: {versions[-_RETAIN:]})"
        )
    return best


def read_changes(
    spark: SparkSession,
    root: str,
    v_from: int,
    v_to: int | None = None,
    fmt: str = "parquet",
) -> DataFrame:
    """CHANGE FEED between two retained snapshots (Delta's table_changes
    for this layer): the row-level diff v_from → v_to as a DataFrame
    with a ``_change_type`` column (``insert`` / ``delete``; an updated
    row appears as its delete + its insert — the CDC consumer contract).

    Cost is bounded by the CHANGED leaves: unchanged leaves (same
    version subdir in both manifests) are never read; the diff itself is
    two multiset EXCEPT ALLs over the changed slice, so duplicate rows
    diff correctly without requiring a key column. Both versions must be
    within the retention window (their data is guaranteed present)."""
    fs, jvm = _hadoop_fs(spark, root)
    a = _load_doc(fs, jvm, root, v_from)
    b = _load_doc(fs, jvm, root, v_to)
    if b["version"] <= a["version"]:
        raise ValueError(
            f"read_changes: v_to ({b['version']}) must be newer than "
            f"v_from ({a['version']})"
        )
    pa, pb = a["partitions"], b["partitions"]
    # a DV-only commit changes no version subdir, but rows still
    # disappeared: leaves holding files whose deletion count differs
    # between the snapshots join the changed set on both sides (DV sets
    # are append-only per file until a rewrite, so a count diff is a
    # faithful set-diff detector)
    fa = (a.get("dv") or {}).get("files", {})
    fb = (b.get("dv") or {}).get("files", {})
    dv_vrels = {
        p.rsplit("/", 1)[0]
        for p in set(fa) | set(fb)
        if fa.get(p) != fb.get(p)
    }
    # a leaf's content is its FULL vrel set (primary + append extras);
    # any set difference marks the leaf changed. Leaves whose change is
    # PURELY ACCRETIVE (same primary, old vrels a subset of new, no DV
    # movement) take the append fast path: the diff is structurally the
    # new extra vrels, read directly as inserts — no whole-leaf read,
    # no EXCEPT ALL. A daily-partition MV fold over an insert-only feed
    # then costs O(appended rows), not O(the accreting leaf) — the
    # difference between a usable and a useless change feed at 100 TB.
    # Everything else (rewrites, drains, DV deletes) diffs by multiset
    # EXCEPT ALL over the whole leaf, as before.
    def vset(doc_, p_, r):
        return {p_[r]} | set((doc_.get("extra_vrels") or {}).get(r, []))

    changed_rels = {
        r
        for r in set(pa) | set(pb)
        if (r in pa) != (r in pb)
        or vset(a, pa, r) != vset(b, pb, r)
    }
    append_only_vrels: set[str] = set()
    diff_rels: set[str] = set()
    for r in changed_rels:
        if r in pa and r in pb and pa[r] == pb[r]:
            sa, sb = vset(a, pa, r), vset(b, pb, r)
            if sa <= sb and not ((sa | sb) & dv_vrels):
                append_only_vrels |= sb - sa
                continue
        diff_rels.add(r)
    old_vrels = sorted(
        {v for r in diff_rels & set(pa) for v in vset(a, pa, r)}
        | (dv_vrels & _all_vrels(a))
    )
    new_vrels = sorted(
        {v for r in diff_rels & set(pb) for v in vset(b, pb, r)}
        | (dv_vrels & _all_vrels(b))
    )

    schema_json = b.get("schema") or a.get("schema")
    schema = (
        T.StructType.fromJson(json.loads(schema_json)) if schema_json else None
    )

    # physical column names are FROZEN under column mapping, so both
    # sides read under the NEWER snapshot's logical schema + mapping and
    # line up even across a rename between the two versions
    cm = (b if b.get("schema") else a).get("column_mapping")

    def side(vrels: list[str], doc: dict) -> DataFrame | None:
        if not vrels:
            return None
        paths = [f"{root.rstrip('/')}/{v}" for v in sorted(vrels)]
        spec_hist = doc.get("partition_specs")
        if schema is not None and spec_hist:
            # spec-EVOLVED snapshot: leaves mix directory shapes, so no
            # basePath parsing — scan data columns only and RE-DERIVE
            # every generation's partition columns (read_manifested's
            # rule). A pure physical re-key (mixed-generation DML moving
            # rows between leaves) then yields IDENTICAL rows on both
            # sides and cancels in the EXCEPT ALL — only logical changes
            # surface.
            all_specs: dict[str, str] = {}
            for h in spec_hist:
                all_specs.update(h)
            data_fields = [
                f for f in schema.fields if f.name not in all_specs
            ]
            df = (
                spark.read.format(fmt)
                .schema(_physical_schema(T.StructType(data_fields), cm))
                .load(paths)
            )
            df = _apply_dv(spark, df, root, doc.get("dv"))
            df = df.select(
                *[
                    F.col((cm or {}).get(f.name, f.name)).alias(f.name)
                    for f in data_fields
                ]
            )
            for f in schema.fields:
                if f.name in all_specs:
                    df = df.withColumn(
                        f.name,
                        _transform_expr(all_specs[f.name], df).cast(
                            f.dataType
                        ),
                    )
            return df.select(*[f.name for f in schema.fields])
        reader = spark.read.format(fmt).option("basePath", root)
        if schema is not None:
            df = reader.schema(_physical_schema(schema, cm)).load(paths)
            df = _apply_dv(spark, df, root, doc.get("dv"))
            return df.select(
                *[
                    F.col((cm or {}).get(f.name, f.name)).alias(f.name)
                    for f in schema.fields
                ]
            )
        return _apply_dv(spark, reader.load(paths), root, doc.get("dv"))

    old_df, new_df = side(old_vrels, a), side(new_vrels, b)
    appended = side(sorted(append_only_vrels), b)
    if old_df is None and new_df is None and appended is None:
        if schema is None:
            raise ValueError(
                f"read_changes: no change between v{a['version']} and "
                f"v{b['version']} of {root} and no stored schema to shape "
                "an empty result"
            )
        empty = spark.createDataFrame([], schema)
        return empty.withColumn("_change_type", F.lit("insert")).filter(
            F.lit(False)
        )
    out = None
    if old_df is not None or new_df is not None:
        if old_df is None:
            old_df = new_df.filter(F.lit(False))
        if new_df is None:
            new_df = old_df.filter(F.lit(False))
        inserts = new_df.exceptAll(old_df).withColumn(
            "_change_type", F.lit("insert")
        )
        deletes = old_df.exceptAll(new_df).withColumn(
            "_change_type", F.lit("delete")
        )
        out = inserts.unionByName(deletes)
    if appended is not None:
        fast = appended.withColumn("_change_type", F.lit("insert"))
        out = fast if out is None else out.unionByName(fast)
    return out
