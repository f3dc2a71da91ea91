"""Change-feed STREAMING source over manifested tables (Python
DataSource API, Spark 4 ``DataSourceStreamReader``) — X-10 × the
lakehouse substrate; the Delta-Lake ``readStream``-on-a-table /
change-data-feed shape, built on this repo's manifest layer.

What it is: ``spark.readStream.format("tablestream").option("path",
table_root).load()`` tails a manifested table's COMMIT LOG — every
micro-batch delivers the rows appended by a contiguous range of
manifest versions, stamped with ``_change_type`` (``insert``) and
``_commit_version`` (the snapshot version whose commit introduced the
row). The table itself is the queue: downstream jobs (MV folds,
feature backfills, CDC fan-out) subscribe to a table another pipeline
is appending to, with no second copy of the data and no external
broker.

Design (and why it scales):

* OFFSETS ARE MANIFEST VERSIONS — ``{"v": N}`` means "the state up to
  snapshot N has been delivered". ``latestOffset`` is a directory
  listing of ``_manifests/`` (O(versions) names, no data touched);
  exactly-once falls out of the checkpoint replaying version ranges
  against IMMUTABLE manifests. No per-row bookkeeping at any scale.
* PARTITIONS ARE THE COMMITTED FILES THEMSELVES. A version range's
  change set is computed structurally from the manifests (the same
  accretive-leaf logic as `read_changes`): the new vrels introduced by
  each commit ARE the batch, one input partition per data file,
  executor-parallel pyarrow reads. Nothing is recomputed, diffed, or
  copied — delivering a 1 GB append costs reading 1 GB, once.
* REWRITES STREAM THROUGH THE CHANGE-DATA FEED. On a table created
  with ``change_feed=True``, every rewrite committer (MERGE / DELETE
  WHERE / UPDATE WHERE / DV delete) records its exact row changes in a
  per-commit sidecar (Delta CDF's _change_data shape); the stream
  delivers those rows — an update arrives as its preimage-delete plus
  postimage-insert — and a compaction/repartition records an explicitly
  EMPTY change set, so maintenance commits glide through. Without the
  feed, a rewrite is not representable as inserts and the source FAILS
  LOUDLY by default (Delta's behavior without ``ignoreChanges``);
  ``on_rewrite=skip`` opts into skipping such leaves. The GDPR erasure
  path (`delete_keys_dv_manifested`) deliberately writes NO sidecar —
  copying erased rows into a change file would defeat right-to-erasure.
* ``mode=commits`` streams the COMMIT LOG itself — one metadata row per
  commit (version, operation, committed_at_ms), zero data files read:
  the notification channel behind `mv.run_mv_stream_refresh` and any
  audit consumer.
* the reader runs outside the JVM (Python DataSource API); by default
  it resolves manifests with plain-posix IO and reads parquet with
  pyarrow on local paths. The ``fs`` option is the OBJECT-STORE SEAM:
  a `io.pyfs` factory spec (``subtree:<base>``, ``latency:<ms>:…``,
  and at scale S3/GCS) routes EVERY read — manifest JSON, data files,
  DV sidecars, file sizes for packing, the pace sidecar — through a
  ``pyarrow.fs.FileSystem`` reconstructed from the spec in whichever
  worker process needs it. Rehearsed in tests against
  SubTreeFileSystem and a latency-injecting wrapper, so no posix
  assumption can hide in the read path.
* SCHEMA comes from the newest snapshot (logical names under column
  mapping; physical file columns are mapped back on read). Files
  written before a column was added surface NULLs for it — the same
  contract as the batch reader. Partition-directory values (classic
  Hive partitioning) are parsed from the leaf path and coerced to the
  schema type; hidden-partitioning tables keep source columns in the
  files, so nothing is parsed for them.

Reference anchor: the reference engine (etl_weekly_trades.py) has no
streaming at all — this is north-star X-10 surface. The semantics
follow Delta Lake's streaming source (startingVersion / ignoreChanges)
as public prior art.

Options: ``path`` (table root, required); ``starting_version`` —
``earliest`` (default: the FULL SNAPSHOT at the oldest retained
version as the first batch, each row attributed to the version that
committed its file, then tail — robust however many rewrites preceded),
an int N (exact commit-history replay from version N; fails loudly if
N's data left retention), or ``latest`` (only commits after the stream
starts); ``on_rewrite`` (``fail`` default / ``skip``);
``mode`` (``rows`` default / ``commits``); ``max_files_per_batch`` +
``pace_id`` — ADMISSION CONTROL (the maxFilesPerTrigger shape): each
trigger admits at most that many files of the initial snapshot AND,
once tailing, at most that many files' worth of commit BACKLOG
(versions are the tail's pacing granularity — one oversized commit
still ships whole, it is an atomic change set; sizing reads only the
candidate batch's manifests, O(batch) not O(backlog)); the pacing
cursor persists under the table keyed by ``pace_id`` so restarts
resume the high-water mark (one paced consumer per id). The sidecar also records the last COMMITTED
offset, and exactly-once is defended in three places: `latestOffset`
never returns an offset ordered before the committed high-water, an
offset regression in `partitions` fails loudly instead of ratifying
the regressed end into the checkpoint (re-delivery), and a FRESH
checkpoint meeting a pace cursor another checkpoint already committed
past fails at `initialOffset` — before anything is written to the new
checkpoint — instead of silently skipping pacing. ``availableNow``
runs exactly one paced slice per invocation (Spark plans Python
sources as one batch per availableNow run); loop it with
`run_paced_drain` to drain a snapshot to completion in bounded
batches. ``max_partition_bytes`` (default 64 MiB) packs small files
into one input partition — per-task overhead of the Python data
source path is ~fixed, so thousands-of-small-files tables drain at
IO speed instead of task-overhead speed.
"""

from __future__ import annotations

import os
from collections.abc import Iterator
from dataclasses import dataclass
from typing import Any
from urllib.parse import unquote

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

# Baked at driver import time and shipped inside the by-value pickle
# (io/pyds.py): the planning/executor workers are fresh interpreters that
# may not have the repo on their path — the lazy manifest import below
# bootstraps sys.path from this constant before importing.
_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def _manifest():
    """The manifest layer, importable from any worker (see _REPO_ROOT)."""
    try:
        from etl_demo_spark.io import manifest
    except ModuleNotFoundError:  # foreign-cwd worker: bootstrap the path
        import sys

        if _REPO_ROOT not in sys.path:
            sys.path.insert(0, _REPO_ROOT)
        from etl_demo_spark.io import manifest
    return manifest


def _strip_scheme(p: str) -> str:
    return p[len("file:"):] if p.startswith("file:") else p

_META_COLS = [
    T.StructField("_change_type", T.StringType()),
    T.StructField("_commit_version", T.LongType()),
]

_HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"


def _leaf_dir_values(leaf_rel: str) -> dict[str, str | None]:
    """Parse a Hive-style leaf path (``k=v/k2=v2``) into a {physical
    column → raw string} map. Values are URL-unquoted exactly once (the
    writer's escaping); the Hive null sentinel maps to None."""
    out: dict[str, str | None] = {}
    for seg in leaf_rel.split("/"):
        if "=" not in seg:
            continue
        k, _, v = seg.partition("=")
        out[k] = None if v == _HIVE_NULL else unquote(v)
    return out


def _coerce_dir_value(raw: str | None, dt: T.DataType):
    """Coerce a partition-directory string to the logical column type —
    the Python-side twin of the batch reader's string-pin-then-cast."""
    if raw is None:
        return None
    if isinstance(dt, T.StringType):
        return raw
    if isinstance(dt, (T.IntegerType, T.LongType, T.ShortType, T.ByteType)):
        return int(raw)
    if isinstance(dt, (T.DoubleType, T.FloatType)):
        return float(raw)
    if isinstance(dt, T.DecimalType):
        from decimal import Decimal

        return Decimal(raw)
    if isinstance(dt, T.BooleanType):
        return raw.lower() == "true"
    if isinstance(dt, T.DateType):
        import datetime

        return datetime.date.fromisoformat(raw)
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        import datetime

        return datetime.datetime.fromisoformat(raw)
    raise ValueError(
        f"tablestream: unsupported partition-directory type {dt} "
        f"for value {raw!r}"
    )


def _vset(doc: dict, rel: str) -> set[str]:
    parts = doc.get("partitions", {})
    vs = {parts[rel]} if rel in parts else set()
    return vs | set((doc.get("extra_vrels") or {}).get(rel, []))


def _dv_changed_vrels(a: dict, b: dict) -> set[str]:
    fa = (a.get("dv") or {}).get("files", {})
    fb = (b.get("dv") or {}).get("files", {})
    return {
        p.rsplit("/", 1)[0]
        for p in set(fa) | set(fb)
        if fa.get(p) != fb.get(p)
    }


def _commit_inserts(a: dict, b: dict, on_rewrite: str, root: str) -> list[str]:
    """The vrels commit ``b`` introduced on top of ``a``, REQUIRING the
    commit to be purely accretive per leaf (else fail/skip per policy).
    This is the structural core of `read_changes`'s append fast path,
    restated for a JVM-less reader: no data is touched here."""
    dv_moved = _dv_changed_vrels(a, b)
    pa, pb = a.get("partitions", {}), b.get("partitions", {})
    inserts: list[str] = []
    for rel in set(pa) | set(pb):
        sa, sb = _vset(a, rel), _vset(b, rel)
        if sa == sb and not (sa & dv_moved):
            continue
        accretive = (
            rel in pb
            and sa <= sb
            and (rel not in pa or pa[rel] == pb[rel])
            and not ((sa | sb) & dv_moved)
        )
        if accretive:
            inserts.extend(sorted(sb - sa))
            continue
        if on_rewrite == "skip":
            continue
        raise ValueError(
            f"tablestream: commit v{b['version']} of {root} rewrote leaf "
            f"{rel!r} (compaction/update/delete/DV) — not representable as "
            "inserts. Set on_rewrite=skip to tail through maintenance "
            "commits (rewritten rows are not re-delivered)."
        )
    return inserts


_STREAM_FORMATS = ("parquet", "orc", "csv", "json")


def _data_files(
    root: str,
    vrel: str,
    fs_spec: str | None = None,
    fmt: str = "parquet",
) -> list[str]:
    d = os.path.join(_strip_scheme(root.rstrip("/")), vrel)
    try:
        if fs_spec is not None:
            from etl_demo_spark.io.pyfs import listdir_or_raise

            names = listdir_or_raise(d, fs_spec)
        else:
            names = os.listdir(d)
    except FileNotFoundError as e:
        raise ValueError(
            f"tablestream: data dir {vrel!r} of {root} is gone — the "
            "checkpoint fell behind the table's retention window"
        ) from e
    data = [n for n in names if not n.startswith(("_", "."))]
    ext = f".{fmt}"
    out = [n for n in data if n.endswith(ext) or "." not in n]
    if data and not out:
        # a dir whose files don't match the table's declared format must
        # fail loudly, not deliver zero rows
        raise ValueError(
            f"tablestream: {vrel!r} of {root} holds no {fmt} files "
            f"(found e.g. {data[0]!r}) — the table's data_format and its "
            "files disagree"
        )
    return sorted(os.path.join(d, n) for n in out)


@dataclass
class _FilePartition(InputPartition):
    file: str | None  # None = degenerate empty-range partition
    leaf_rel: str
    commit_version: int
    change_file: bool = False  # file carries its own _change_type column
    dv_pos: tuple[int, ...] | None = None  # DV-deleted row indexes to drop
    # csv sidecars only: the commit-recorded column order (csv files
    # carry no schema of their own)
    change_cols: tuple[str, ...] | None = None


@dataclass
class _PackedPartition(InputPartition):
    """Several small files as ONE input partition: the Python-data-source
    per-task cost (worker round-trip, Arrow channel setup) is ~fixed, so
    a many-small-files batch is packed to ``max_partition_bytes`` bins —
    same rows, same per-file metadata, a fraction of the tasks."""

    items: tuple[_FilePartition, ...]


def _pack_partitions(
    parts: list[_FilePartition],
    target_bytes: int,
    fs_spec: str | None = None,
) -> list[InputPartition]:
    """Greedy size-binned packing, order-preserving. Files at or above
    the target stay alone; empty-range sentinels pass through."""
    if target_bytes <= 0 or len(parts) <= 1:
        return list(parts)
    out: list[InputPartition] = []
    bin_items: list[_FilePartition] = []
    bin_bytes = 0

    def flush():
        nonlocal bin_items, bin_bytes
        if len(bin_items) == 1:
            out.append(bin_items[0])
        elif bin_items:
            out.append(_PackedPartition(tuple(bin_items)))
        bin_items, bin_bytes = [], 0

    for p in parts:
        if p.file is None:
            flush()
            out.append(p)
            continue
        try:
            if fs_spec is not None:
                from etl_demo_spark.io.pyfs import file_size

                sz = file_size(p.file, fs_spec)
            else:
                sz = os.path.getsize(p.file)
        except (OSError, FileNotFoundError):
            sz = target_bytes  # let the read path raise the real error
        if bin_bytes and bin_bytes + sz > target_bytes:
            flush()
        bin_items.append(p)
        bin_bytes += sz
        if bin_bytes >= target_bytes:
            flush()
    flush()
    return out


def _physical_shape(doc: dict) -> list[tuple[str, str]]:
    """A schema's PHYSICAL reading shape: sorted (on-disk column name,
    type) pairs. Two docs with equal shapes are readable by the same
    pinned reader — renames (column mapping keeps physical names
    frozen) change the logical schema but not the shape."""
    import json as _json

    schema_json = doc.get("schema")
    if not schema_json:
        return []
    mapping = doc.get("column_mapping") or {}
    sch = T.StructType.fromJson(_json.loads(schema_json))
    return sorted(
        (mapping.get(f.name, f.name), f.dataType.simpleString())
        for f in sch.fields
    )


def _off_key(off: dict) -> tuple:
    """Total order over stream offsets: snap offsets order by slice
    index (absent si = NOTHING delivered yet, i.e. 0); a plain offset is
    past the whole snapshot phase of the same version."""
    if off.get("snap"):
        return (int(off["v"]), 0, int(off.get("si", 0)))
    return (int(off["v"]), 1, 0)


def _vrel_version(vrel: str) -> int:
    """The version that committed a vrel, parsed from its dir name
    (``…/__v0000000007-ab12cd34``) — the initial snapshot's per-file
    commit attribution.

    CAVEAT: this is the STAGING ATTEMPT's version. After an OCC rebase
    or a branch publish, staged dirs keep their pre-race ``__v{N}``
    names while the manifest lands at a LATER version, so the
    attribution can under-report the committing version. Metadata
    accuracy only — delivery and exactly-once are keyed off manifest
    versions, never off this parse."""
    name = vrel.rsplit("/", 1)[-1]
    core = name[len("__v"):].split("-", 1)[0]
    return int(core)


@dataclass
class _CommitPartition(InputPartition):
    version: int  # <=0 = degenerate empty-range partition
    operation: str | None
    committed_at_ms: int | None


_COMMITS_SCHEMA = T.StructType(
    [
        T.StructField("version", T.LongType()),
        T.StructField("operation", T.StringType()),
        T.StructField("committed_at_ms", T.LongType()),
    ]
)


class TableStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        self._root = options["path"]
        self._mode = options.get("mode", "rows")
        if self._mode not in ("rows", "commits"):
            raise ValueError("tablestream: mode must be 'rows' or 'commits'")
        self._on_rewrite = options.get("on_rewrite", "fail")
        if self._on_rewrite not in ("fail", "skip"):
            raise ValueError(
                "tablestream: on_rewrite must be 'fail' or 'skip'"
            )
        self._max_files = int(options.get("max_files_per_batch", 0))
        if self._max_files < 0:
            raise ValueError(
                "tablestream: max_files_per_batch must be >= 0"
            )
        self._pace_id = options.get("pace_id")
        if self._max_files and not self._pace_id:
            raise ValueError(
                "tablestream: max_files_per_batch needs pace_id= (one "
                "paced consumer per id; the pacing cursor persists under "
                "the table keyed by it)"
            )
        self._pack_bytes = int(
            options.get("max_partition_bytes", 64 * 1024 * 1024)
        )
        self._fs_spec = options.get("fs")
        if self._fs_spec is not None:
            from etl_demo_spark.io.pyfs import resolve

            resolve(self._root, self._fs_spec)  # fail fast on a bad spec
        self._snap_cache: tuple[int, list] | None = None
        m = _manifest()
        versions = m._list_manifest_versions(
            self._fs_spec, None, self._root
        )
        if not versions:
            raise ValueError(
                f"tablestream: {self._root} is not a manifested table"
            )
        self._head_doc = m._resolve_doc(
            self._fs_spec, None, self._root, versions[-1]
        )
        # non-parquet tables stream through the matching pyarrow reader;
        # the format is table config recorded at write_manifested (or an
        # explicit option for tables initialized before round 10)
        self._fmt = (
            options.get("format")
            or self._head_doc.get("data_format")
            or "parquet"
        )
        if self._fmt not in _STREAM_FORMATS:
            raise ValueError(
                f"tablestream: unsupported data format {self._fmt!r} "
                f"(streamable: {_STREAM_FORMATS})"
            )
        # SCHEMA-EVOLUTION POLICY under a live checkpoint: the output
        # schema pins at query start (this head). Commits LANDING LATER
        # whose physical reading shape differs (add/drop/widen) FAIL
        # LOUDLY in partitions() — silently delivering rows without the
        # new column would be data loss for CDC consumers. A restart
        # picks up the evolved schema and the checkpoint resumes exactly
        # where it left off (old files NULL-fill / upcast, same as the
        # batch reader). RENAMES alone are transparent mid-run: column
        # mapping freezes physical names, so the pinned reader keeps
        # reading the same bytes under the old logical name until a
        # restart surfaces the new one.
        self._pinned_v = versions[-1]
        self._pinned_shape = _physical_shape(self._head_doc)
        sv = options.get("starting_version", "earliest")
        self._snapshot = False
        if sv == "latest":
            self._start = versions[-1]
        elif sv == "earliest":
            # the robust default (Delta's): deliver the FULL snapshot at
            # the oldest RETAINED version (its data is guaranteed
            # present, whatever rewrites preceded it), then tail commits.
            # Snapshot rows are attributed to the version that committed
            # their file (parsed from the vrel name) — exact history for
            # append-only tables, file-commit attribution after rewrites.
            self._start = versions[-_manifest()._RETAIN:][0]
            self._snapshot = self._mode == "rows"
        else:
            self._start = int(sv) - 1
            if self._start < 0:
                raise ValueError("tablestream: starting_version must be >= 1")
        if self._mode == "commits":
            if sv == "earliest":
                self._start -= 1  # deliver the oldest retained commit too
            self._schema = _COMMITS_SCHEMA
            self._mapping = {}
            return
        schema_json = self._head_doc.get("schema")
        if not schema_json:
            raise ValueError(
                f"tablestream: {self._root} has no stored schema"
            )
        import json as _json

        self._schema = T.StructType.fromJson(_json.loads(schema_json))
        self._mapping = self._head_doc.get("column_mapping") or {}

    # -- offsets ----------------------------------------------------------
    def initialOffset(self) -> dict:
        init = (
            {"v": self._start, "snap": True}
            if self._snapshot
            else {"v": self._start}
        )
        if self._max_files:
            # initialOffset is only invoked on a FRESH checkpoint. A pace
            # sidecar whose COMMITTED high-water is already past the
            # initial offset belongs to another checkpoint (deleted, or a
            # second stream sharing the pace_id): continuing would make
            # latestOffset jump the snapshot and silently skip pacing.
            # Fail here — before anything lands in the new checkpoint.
            # (The committed mark, not the cursor: the first latestOffset
            # poll of THIS run precedes initialOffset in Spark's call
            # order and legitimately advances the cursor one slice.)
            committed = self._pace_doc()[1]
            if committed is not None and _off_key(committed) > _off_key(init):
                raise ValueError(
                    f"tablestream: fresh checkpoint, but pace_id="
                    f"{self._pace_id!r} of {self._root} was already "
                    f"committed past {committed} by another checkpoint. "
                    "One paced consumer per pace_id: delete the stale "
                    f"sidecar ({self._pace_path()}) to restart pacing "
                    "from scratch, or choose a fresh pace_id."
                )
        return init

    def _pace_path(self) -> str:
        return os.path.join(
            _strip_scheme(self._root.rstrip("/")),
            "_manifests",
            f".pace-{self._pace_id}",
        )

    def _pace_doc(self) -> tuple[dict | None, dict | None, dict | None]:
        """(cursor, committed, planned) from the pace sidecar. Legacy
        sidecars hold the bare cursor offset; current ones ``{"cur":…,
        "committed":…, "planned":…}``. ``planned`` is the newest grant
        that ``partitions()`` has turned into an actual batch — a
        legacy doc without it is treated as fully planned (planned =
        cur) so old sidecars keep advancing."""
        import json as _json

        try:
            if self._fs_spec is not None:
                from etl_demo_spark.io.pyfs import read_bytes

                doc = _json.loads(read_bytes(self._pace_path(), self._fs_spec))
            else:
                with open(self._pace_path()) as f:
                    doc = _json.loads(f.read())
        except (OSError, ValueError, FileNotFoundError):
            return None, None, None
        if "cur" in doc:
            return (
                doc.get("cur"),
                doc.get("committed"),
                doc.get("planned", doc.get("cur")),
            )
        return (doc if "v" in doc else None), None, (doc if "v" in doc else None)

    def _pace_write(
        self,
        cur: dict,
        committed: dict | None,
        planned: dict | None = None,
    ) -> None:
        import json as _json

        path = self._pace_path()
        # "planned" is ALWAYS present (null until the first batch plans)
        # so a missing key still identifies a legacy sidecar, which
        # _pace_doc treats as fully planned.
        doc: dict = {"cur": cur, "planned": planned}
        if committed is not None:
            doc["committed"] = committed
        if self._fs_spec is not None:
            from etl_demo_spark.io.pyfs import write_bytes

            write_bytes(path, _json.dumps(doc).encode(), self._fs_spec)
            return
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            f.write(_json.dumps(doc))
        os.replace(tmp, path)

    def latestOffset(self) -> dict:
        versions = _manifest()._list_manifest_versions(
            self._fs_spec, None, self._root
        )
        head = versions[-1] if versions else self._start
        if not self._max_files:
            return {"v": head}
        # ADMISSION CONTROL (maxFilesPerTrigger shape): while the
        # initial snapshot is draining, each poll exposes at most
        # max_files_per_batch more snapshot files. The cursor PERSISTS
        # in a sidecar keyed by pace_id (Spark hosts several reader
        # instances per query, and a restart must resume the high-water
        # mark — the replay source's pace-file pattern), and is clamped
        # to the COMMITTED high-water `commit()` records there, so a
        # lagging cursor can never regress the checkpoint into
        # re-delivery. availableNow plans ONE batch per run for Python
        # sources — each paced availableNow invocation drains one slice;
        # `run_paced_drain` loops it to completion.
        cur, committed, planned = self._pace_doc()
        if cur is None:
            cur = (
                {"v": self._start, "snap": True, "si": 0}
                if self._snapshot
                else {"v": self._start}
            )
        else:
            released = planned
            if committed is not None and (
                released is None or _off_key(committed) > _off_key(released)
            ):
                released = committed
            if committed is not None and _off_key(committed) > _off_key(cur):
                cur = committed
            elif released is None or _off_key(cur) > _off_key(released):
                # GRANT-ONCE: the previous grant hasn't been PLANNED
                # into a batch yet — re-serve the same offset instead
                # of advancing. The engine probes latestOffset more
                # than once per planned batch (a startup probe, plus
                # every processingTime trigger), and each extra probe
                # used to widen the in-flight batch by another slice;
                # clamping to one OUTSTANDING grant makes every planned
                # batch exactly one pace slice. partitions() records
                # the grant as planned, which releases the next one —
                # NOT commit(): Spark only calls source.commit() while
                # constructing a later batch, so gating on committed
                # would deadlock a processingTime stream after its
                # first micro-batch.
                return cur
        if cur.get("snap"):
            total = len(self._snap_parts(int(cur["v"])))
            si = int(cur.get("si", 0)) + self._max_files
            if si < total:
                nxt = {"v": int(cur["v"]), "snap": True, "si": si}
            else:
                # snapshot done: the same poll may start the tail, paced
                # by commits (≤ one pacing quantum over, since the last
                # snapshot slice rides along)
                nxt = {"v": self._tail_next(int(cur["v"]), head)}
        else:
            base_v = int(cur["v"])
            nxt = {"v": self._tail_next(base_v, max(head, base_v))}
        self._pace_write(nxt, committed, planned)
        return nxt

    def _pace_mark_planned(self, end: dict) -> None:
        """Record that ``partitions()`` planned a batch ending at
        ``end`` — releases the next pace grant (see latestOffset).

        Side benefit: a LOST sidecar self-heals. On restart Spark
        replays the WAL's uncommitted last batch through partitions()
        before any latestOffset call, and the replayed ``end`` is the
        checkpoint's own authoritative position — rebuilding the
        cursor there continues the stream exactly-once. (Without a
        replay, a fresh cursor behind the checkpoint still fails loudly
        in partitions() as an offset regression.)"""
        if not self._max_files:
            return
        cur, committed, planned = self._pace_doc()
        if planned is None or _off_key(end) > _off_key(planned):
            planned = end
        if cur is None or _off_key(cur) < _off_key(planned):
            cur = planned
        self._pace_write(cur, committed, planned)

    def _tail_next(self, from_v: int, head: int) -> int:
        """TAIL admission control: the furthest version ≤ ``head`` such
        that delivering commits (from_v, nxt] stays within
        max_files_per_batch — so a stream catching up after downtime
        drains its commit BACKLOG in bounded batches instead of one
        giant one. Versions are the pacing granularity: a single commit
        larger than the budget still ships whole (its files are one
        atomic change set). Cost: resolves only the candidate batch's
        manifests and lists only its new vrel dirs — O(delivered batch)
        metadata per poll, never O(backlog)."""
        if head <= from_v:
            return head
        budget = self._max_files
        prev = self._doc(from_v)
        nxt = from_v
        for v in range(from_v + 1, head + 1):
            cur = self._doc(v)
            ch = cur.get("change_data")
            try:
                if self._mode == "commits":
                    files = 1  # metadata rows: pace by commit count
                elif ch is not None:
                    files = (
                        len(_data_files(self._root, ch["rel"], self._fs_spec, self._fmt))
                        if ch.get("rel")
                        else 0
                    )
                else:
                    files = sum(
                        len(_data_files(self._root, r, self._fs_spec, self._fmt))
                        for r in _commit_inserts(
                            prev, cur, self._on_rewrite, self._root
                        )
                    )
            except ValueError:
                # not representable as inserts / data gone: include this
                # version and stop — planning it raises the loud,
                # accurate error (or skips it under on_rewrite=skip)
                return v
            if nxt > from_v and files > budget:
                break
            budget -= files
            nxt = v
            prev = cur
            if budget <= 0:
                break
        return nxt

    # -- planning ---------------------------------------------------------
    def _snap_parts(self, version: int) -> list:
        """INITIAL-SNAPSHOT partition list at ``version`` (cached — the
        pacing offsets index into it, so it must be deterministic within
        a run): every live vrel's files as inserts, attributed to the
        version that committed each file, DV-deleted positions attached
        for read-time drop."""
        if self._snap_cache is not None and self._snap_cache[0] == version:
            return self._snap_cache[1]
        m = _manifest()
        doc = self._doc(version)
        dv_by_file: dict[str, list[int]] = {}
        dv = doc.get("dv")
        if dv and dv.get("files"):
            for rel in m._dv_rels(dv):
                d = os.path.join(
                    _strip_scheme(self._root.rstrip("/")), rel
                )
                if self._fs_spec is not None:
                    from etl_demo_spark.io.pyfs import read_parquet

                    tbl = read_parquet(d, self._fs_spec)
                else:
                    import pyarrow.parquet as pq

                    tbl = pq.read_table(d)
                for fr, pos in zip(
                    tbl.column("file_rel").to_pylist(),
                    tbl.column("pos").to_pylist(),
                ):
                    dv_by_file.setdefault(fr, []).append(int(pos))
        parts: list[_FilePartition] = []
        for vrel in sorted(m._all_vrels(doc)):
            leaf_rel = vrel.rsplit("/", 1)[0]
            cv = _vrel_version(vrel)
            for f in _data_files(self._root, vrel, self._fs_spec, self._fmt):
                frel = f"{vrel}/{os.path.basename(f)}"
                pos = dv_by_file.get(frel)
                parts.append(
                    _FilePartition(
                        f, leaf_rel, cv,
                        dv_pos=tuple(pos) if pos else None,
                    )
                )
        self._snap_cache = (version, parts)
        return parts

    def _doc(self, version: int) -> dict:
        if version <= 0:
            return {"version": 0, "partitions": {}}
        return _manifest()._resolve_doc(
            self._fs_spec, None, self._root, version
        )

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        s, e = int(start["v"]), int(end["v"])
        if _off_key(end) >= _off_key(start):
            self._pace_mark_planned(end)
        if _off_key(end) < _off_key(start):
            # NEVER an empty batch here: Spark has already written `end`
            # to the offset log, and ratifying it would restart the next
            # batch before `start` — silent re-delivery. Loud is the only
            # safe behavior for both the paced (lost/lagging pace
            # sidecar) and unpaced (manifest log out of sync) cause.
            raise ValueError(
                f"tablestream: offset regression {start} -> {end} on "
                f"{self._root}"
                + (
                    f" — the pace sidecar for pace_id={self._pace_id!r} "
                    "is missing or behind this checkpoint (deleted, or "
                    "shared by a second stream). Restore it, use a fresh "
                    "pace_id with a fresh checkpoint, or drop pacing."
                    if self._max_files
                    else " — the table's manifest log is out of sync "
                    "with this checkpoint"
                )
            )
        if self._mode == "commits":
            # COMMIT-NOTIFICATION stream: one metadata row per commit,
            # zero data files touched — the channel that drives
            # continuous MV refresh (mv.run_mv_stream_refresh) and
            # commit-audit consumers at any table size
            out: list[_CommitPartition] = []
            for v in range(s + 1, e + 1):
                doc = self._doc(v)
                out.append(
                    _CommitPartition(
                        v,
                        doc.get("operation"),
                        doc.get("committed_at_ms"),
                    )
                )
            return out or [_CommitPartition(0, None, None)]
        parts: list[_FilePartition] = []
        if start.get("snap"):
            files = self._snap_parts(s)
            lo = int(start.get("si", 0))
            if end.get("snap"):
                # paced mid-snapshot batch: this slice only, no tail yet
                hi = int(end.get("si", len(files)))
                if hi < lo:
                    raise ValueError(
                        f"tablestream: snapshot offset regression "
                        f"{lo} -> {hi}"
                    )
                return _pack_partitions(
                    files[lo:hi], self._pack_bytes, self._fs_spec
                ) or [_FilePartition(None, "", s)]
            parts.extend(files[lo:])
        prev = self._doc(s)
        for v in range(s + 1, e + 1):
            cur = self._doc(v)
            if v > self._pinned_v:
                shape = _physical_shape(cur)
                if shape != self._pinned_shape:
                    pinned = dict(self._pinned_shape)
                    now = dict(shape)
                    changed = sorted(
                        set(pinned.items()) ^ set(now.items())
                    )
                    raise ValueError(
                        f"tablestream: the table's schema evolved at "
                        f"v{v} of {self._root} (changed physical "
                        f"columns: {changed}) after this stream pinned "
                        f"its output schema at v{self._pinned_v}. "
                        "Restart the stream: the checkpoint resumes "
                        "exactly here and the evolved schema applies "
                        "(older files NULL-fill added columns / upcast "
                        "widened ones). Renames alone stream through "
                        "transparently."
                    )
            ch = cur.get("change_data")
            if ch is not None:
                # CHANGE-DATA commit (change_feed tables): the committer
                # recorded its exact delete/insert rows — stream the
                # sidecar INSTEAD of diffing structure. An explicit
                # rel=None (compaction/repartition) is a row no-op: the
                # stream glides through maintenance.
                if ch.get("rel"):
                    ccols = tuple(ch.get("cols") or ()) or None
                    for f in _data_files(self._root, ch["rel"], self._fs_spec, self._fmt):
                        parts.append(
                            _FilePartition(
                                f, "", v, change_file=True,
                                change_cols=ccols,
                            )
                        )
                prev = cur
                continue
            for vrel in _commit_inserts(prev, cur, self._on_rewrite, self._root):
                leaf_rel = vrel.rsplit("/", 1)[0]
                for f in _data_files(self._root, vrel, self._fs_spec, self._fmt):
                    parts.append(_FilePartition(f, leaf_rel, v))
            prev = cur
        return _pack_partitions(parts, self._pack_bytes, self._fs_spec) or [
            _FilePartition(None, "", e)
        ]

    # -- executor-side read ------------------------------------------------
    def read(self, partition: InputPartition) -> Iterator[Any]:
        """Yield pyarrow RecordBatches — the vectorized Python-DataSource
        path (no per-row Python objects anywhere): the parquet columns
        are cast/renamed to the logical schema, partition-directory
        values become constant arrays, missing evolved columns become
        null arrays, and the two meta columns ride along as constants."""
        if isinstance(partition, _CommitPartition):
            if partition.version > 0:
                yield (
                    partition.version,
                    partition.operation,
                    partition.committed_at_ms,
                )
            return
        if isinstance(partition, _PackedPartition):
            for item in partition.items:
                yield from self._read_file(item)
            return
        yield from self._read_file(partition)

    def _load_table(self, partition: _FilePartition):
        """One data file as a pyarrow Table, routed by the table's
        format. parquet/orc are self-describing; csv/json apply the
        stored schema the same way the batch reader hands it to
        ``spark.read.schema(...)`` — csv positionally (Spark writes no
        header), json by key."""
        from pyspark.sql.pandas.types import to_arrow_type

        path, fmt = partition.file, self._fmt
        if self._fs_spec is not None:
            if fmt == "parquet":
                from etl_demo_spark.io.pyfs import read_parquet

                return read_parquet(path, self._fs_spec)
            import pyarrow as pa

            from etl_demo_spark.io.pyfs import read_bytes

            src = pa.BufferReader(read_bytes(path, self._fs_spec))
        else:
            src = path
        if fmt == "parquet":
            import pyarrow.parquet as pq

            return pq.read_table(src)
        if fmt == "orc":
            from pyarrow import orc

            return orc.read_table(src)
        # csv/json data files hold the schema's DATA columns (partition
        # values live in the directory path): physical names, stored
        # order — exactly what the writer serialized
        import pyarrow as pa

        dirv = _leaf_dir_values(partition.leaf_rel)
        fields = []
        for f in self._schema.fields:
            phys = self._mapping.get(f.name, f.name)
            if phys not in dirv:
                fields.append((phys, to_arrow_type(f.dataType)))
        empty = (
            src.size() == 0
            if isinstance(src, pa.BufferReader)
            else os.path.getsize(src) == 0
        )
        if empty:
            # Spark serializes empty partitions as ZERO-BYTE csv/json
            # part files (no footer to carry "0 rows"); pyarrow's
            # readers refuse them, so shape the empty table here
            schema = pa.schema(fields)
            if partition.change_file:
                schema = schema.append(pa.field("_change_type", pa.string()))
            return schema.empty_table()
        if fmt == "json":
            import pyarrow as pa
            import pyarrow.json as pajson

            schema = pa.schema(fields)
            if partition.change_file:
                schema = schema.append(pa.field("_change_type", pa.string()))
            return pajson.read_json(
                src,
                parse_options=pajson.ParseOptions(
                    explicit_schema=schema,
                    unexpected_field_behavior="ignore",
                ),
            )
        import pyarrow.csv as pacsv

        def read_csv_cols(cols):
            return pacsv.read_csv(
                src,
                read_options=pacsv.ReadOptions(
                    column_names=[n for n, _ in cols]
                ),
                convert_options=pacsv.ConvertOptions(
                    column_types=dict(cols)
                ),
            )

        if partition.change_file:
            if not partition.change_cols:
                # a pre-round-10 commit: no recorded column order, and a
                # headerless csv's order is not recoverable — refuse
                # instead of guessing rows into the wrong columns
                raise ValueError(
                    "tablestream: this csv change-data sidecar predates "
                    "column-order recording (change_data.cols) — its "
                    "column order is not recoverable; start the stream "
                    "past this commit, or re-create the feed"
                )
            # the commit recorded the sidecar's exact column order;
            # types come from the stored schema by physical name
            # (partition values ride INLINE in sidecars, string-cast at
            # write — the csv parser re-types them here)
            types = {
                self._mapping.get(f.name, f.name): to_arrow_type(f.dataType)
                for f in self._schema.fields
            }
            types["_change_type"] = pa.string()
            return read_csv_cols(
                [(n, types.get(n, pa.string())) for n in partition.change_cols]
            )

        try:
            return read_csv_cols(fields)
        except pa.lib.ArrowInvalid as e:
            if "columns" not in str(e):
                raise
            # SCHEMA-EVOLVED csv table: files written before an ALTER
            # add hold fewer columns. Added fields append at the END of
            # the stored schema, so an old file is a strict PREFIX of
            # the column list — retry shorter prefixes (the downstream
            # projection NULL-fills the absent fields, same as the
            # batch reader's permissive csv read).
            if isinstance(src, pa.BufferReader):
                src.seek(0)
            for cut in range(len(fields) - 1, 0, -1):
                try:
                    return read_csv_cols(fields[:cut])
                except pa.lib.ArrowInvalid:
                    if isinstance(src, pa.BufferReader):
                        src.seek(0)
                    continue
            raise

    def _read_file(self, partition: _FilePartition) -> Iterator[Any]:
        if partition.file is None:
            return
        import pyarrow as pa
        import pyarrow.compute as pc
        from pyspark.sql.pandas.types import to_arrow_type

        tbl = self._load_table(partition)
        if partition.dv_pos:
            # initial-snapshot read of a file with deletion-vector rows:
            # drop the tombstoned positions (file row order == position)
            import numpy as np

            keep = np.ones(tbl.num_rows, dtype=bool)
            keep[list(partition.dv_pos)] = False
            tbl = tbl.filter(pa.array(keep))
        n = tbl.num_rows
        have = set(tbl.schema.names)
        dirv = _leaf_dir_values(partition.leaf_rel)
        cols: list[Any] = []
        names: list[str] = []
        for field in self._schema.fields:
            at = to_arrow_type(field.dataType)
            phys = self._mapping.get(field.name, field.name)
            if phys in have:
                col = tbl.column(phys)
                if (
                    pa.types.is_timestamp(col.type)
                    and col.type.tz is None
                    and pa.types.is_timestamp(at)
                    and at.tz is not None
                ):
                    # session-zoned TIMESTAMP stored tz-naive: the engine
                    # pins spark.sql.session.timeZone=UTC (session.py),
                    # so the naive value IS the UTC instant
                    col = pc.assume_timezone(col, at.tz)
                if col.type != at:
                    col = col.cast(at)
            elif phys in dirv:
                col = pa.array(
                    [_coerce_dir_value(dirv[phys], field.dataType)] * n,
                    type=at,
                )
            else:  # evolved column older files never saw
                col = pa.nulls(n, type=at)
            cols.append(col)
            names.append(field.name)
        if partition.change_file:
            cols.append(tbl.column("_change_type").cast(pa.string()))
        else:
            cols.append(pa.array(["insert"] * n, type=pa.string()))
        names.append("_change_type")
        cols.append(
            pa.array([partition.commit_version] * n, type=pa.int64())
        )
        names.append("_commit_version")
        yield from pa.table(cols, names=names).to_batches(
            max_chunksize=65536
        )

    def commit(self, end: dict) -> None:
        # offsets are manifest versions; nothing external to ack. Paced
        # streams additionally record the committed high-water in the
        # pace sidecar: latestOffset clamps to it, so a lagging cursor
        # can never walk the checkpoint backwards into re-delivery.
        if not self._max_files:
            return
        cur, committed, planned = self._pace_doc()
        if committed is None or _off_key(end) > _off_key(committed):
            committed = end
        if cur is None or _off_key(cur) < _off_key(committed):
            cur = committed
        if planned is None or _off_key(planned) < _off_key(committed):
            planned = committed
        self._pace_write(cur, committed, planned)


class TableStreamDataSource(DataSource):
    """``spark.readStream.format("tablestream").option("path", root)``"""

    @classmethod
    def name(cls) -> str:
        return "tablestream"

    def _reader(self) -> TableStreamReader:
        # schema() and streamReader() both need a reader; resolving the
        # head manifest chain once per stream start, not twice
        if getattr(self, "_cached_reader", None) is None:
            self._cached_reader = TableStreamReader(dict(self.options))
        return self._cached_reader

    def schema(self) -> T.StructType:
        reader = self._reader()
        if reader._mode == "commits":
            return reader._schema
        return T.StructType(list(reader._schema.fields) + _META_COLS)

    def streamReader(self, schema: T.StructType) -> TableStreamReader:
        return self._reader()


def register_table_stream_source(spark: Any) -> None:
    """Idempotent registration of the ``tablestream`` streaming format.

    Registered pickle-BY-VALUE (io/pyds.py) so the planning and executor
    workers never need ``etl_demo_spark`` on their import path."""
    from etl_demo_spark.io.pyds import register_data_source

    register_data_source(spark, TableStreamDataSource)


def _pace_cursor(table_root: str, reader_options: dict) -> dict:
    """The persisted pace cursor's ``cur`` doc ({} when absent)."""
    import json as _json

    pace = os.path.join(
        _strip_scheme(table_root.rstrip("/")),
        "_manifests",
        f".pace-{reader_options['pace_id']}",
    )
    try:
        spec = reader_options.get("fs")
        if spec:
            from etl_demo_spark.io.pyfs import read_bytes

            doc = _json.loads(read_bytes(pace, str(spec)))
        else:
            with open(pace) as f:
                doc = _json.loads(f.read())
        return doc.get("cur", doc)
    except (OSError, ValueError, FileNotFoundError):
        return {}


def _drained(cur: dict, table_root: str, reader_options: dict) -> bool:
    """True once the pace cursor sits at the table head with no
    snapshot remainder."""
    if not cur or cur.get("snap"):
        return False
    vs = _manifest()._list_manifest_versions(
        str(reader_options.get("fs")) if reader_options.get("fs") else None,
        None,
        table_root,
    )
    return bool(vs) and int(cur.get("v", -1)) >= vs[-1]


def run_paced_drain_continuous(
    spark: Any,
    table_root: str,
    build_writer,
    max_files_per_batch: int,
    pace_id: str,
    timeout: int = 600,
    trigger: str = "500 milliseconds",
    **reader_options: str,
) -> dict:
    """Drain a PACED tablestream through ONE long-lived processingTime
    query instead of looped availableNow runs.

    The pace is enforced by ``latestOffset`` per micro-batch, so a
    running query advances one bounded slice per TRIGGER — same
    admission control, but the streaming-query start cost (checkpoint
    resolution + the Python planner-worker spawn, ~1.5-2 s measured on
    this host) is paid ONCE for the whole backlog rather than once per
    slice. A 50-slice backlog drain drops from ~50 query starts to 1;
    per-trigger overhead inside the running query measures ~2 ms idle
    (see docs/PLANS.md round-10 addendum). Exactly-once holds the same
    way: the shared checkpoint + the committed pace high-water.

    The query stops once the persisted pace cursor reaches the table
    head AND a subsequent trigger delivered zero rows (so the final
    slice's sink commit is already durable).

    Bound note: grant-once pacing (see ``latestOffset``) re-serves the
    outstanding grant until ``partitions()`` plans it into a batch, so
    EVERY planned batch — including the first, despite the engine's
    extra startup probe — is exactly one pace grant. A grant is at most
    two pace quanta (the final snapshot slice rides along with the
    first tail quantum), and a single commit larger than the budget
    still ships whole — its files are one atomic change set.

    Returns ``{"batches": n, "rows": total, "max_batch_rows": m}``."""
    import json as _json
    import time as _time

    register_table_stream_source(spark)
    ropts = {**reader_options, "pace_id": pace_id}
    reader = (
        spark.readStream.format("tablestream")
        .option("path", table_root)
        .option("max_files_per_batch", str(max_files_per_batch))
        .option("pace_id", pace_id)
    )
    for k, v in reader_options.items():
        reader = reader.option(k, str(v))
    q = build_writer(reader.load()).trigger(processingTime=trigger).start()
    seen: dict[int, int] = {}
    deadline = _time.time() + timeout
    try:
        while True:
            if q.exception() is not None:
                raise q.exception()
            for p in q.recentProgress or []:
                d = _json.loads(p.json) if hasattr(p, "json") else p
                seen[int(d["batchId"])] = int(d["numInputRows"])
            if seen and seen[max(seen)] == 0 and _drained(
                _pace_cursor(table_root, ropts), table_root, ropts
            ):
                break
            if _time.time() > deadline:
                raise TimeoutError(
                    f"run_paced_drain_continuous: {table_root} not "
                    f"drained within {timeout}s (cursor "
                    f"{_pace_cursor(table_root, ropts)})"
                )
            _time.sleep(0.2)
    finally:
        q.stop()
    return {
        "batches": sum(1 for r in seen.values() if r > 0),
        "rows": sum(seen.values()),
        "max_batch_rows": max(seen.values(), default=0),
    }


def run_paced_drain(
    spark: Any,
    table_root: str,
    build_writer,
    max_files_per_batch: int,
    pace_id: str,
    run_timeout: int = 600,
    max_runs: int = 10_000,
    **reader_options: str,
) -> dict:
    """Drain a PACED tablestream to completion in bounded batches —
    admission control under ``availableNow``.

    Spark plans a Python streaming source as ONE batch per availableNow
    run, so a single run of a paced stream delivers exactly one
    ``max_files_per_batch`` slice. This helper loops fresh availableNow
    runs against the SAME checkpoint until a run delivers zero rows: the
    persisted pace cursor advances one slice per run, each run's batch
    stays bounded however large the initial snapshot is, and
    exactly-once holds because every run resumes from the shared
    checkpoint. ``build_writer(df) -> DataStreamWriter`` attaches the
    sink and MUST set ``checkpointLocation``.

    Each availableNow run pays the streaming-query start cost (~1.5-2 s:
    checkpoint resolution + Python planner-worker spawn) — for a long
    backlog prefer `run_paced_drain_continuous`, which pays it once.

    Returns ``{"runs": n, "rows": total_input_rows}``."""
    register_table_stream_source(spark)
    runs = rows = 0
    for _ in range(max_runs):
        reader = (
            spark.readStream.format("tablestream")
            .option("path", table_root)
            .option("max_files_per_batch", str(max_files_per_batch))
            .option("pace_id", pace_id)
        )
        for k, v in reader_options.items():
            reader = reader.option(k, str(v))
        q = build_writer(reader.load()).trigger(availableNow=True).start()
        if not q.awaitTermination(run_timeout):
            q.stop()
            raise TimeoutError(
                f"run_paced_drain: availableNow run {runs + 1} on "
                f"{table_root} exceeded {run_timeout}s"
            )
        got = sum(
            int(p["numInputRows"]) for p in (q.recentProgress or [])
        )
        runs += 1
        rows += got
        if got == 0:
            # zero rows ends the drain — unless the cursor is still
            # mid-snapshot (a zero-row parquet file in the slice)
            pace = os.path.join(
                _strip_scheme(table_root.rstrip("/")),
                "_manifests",
                f".pace-{pace_id}",
            )
            import json as _json

            try:
                spec = reader_options.get("fs")
                if spec:
                    from etl_demo_spark.io.pyfs import read_bytes

                    doc = _json.loads(read_bytes(pace, str(spec)))
                else:
                    with open(pace) as f:
                        doc = _json.loads(f.read())
                cur = doc.get("cur", doc)
            except (OSError, ValueError, FileNotFoundError):
                cur = {}
            if not cur.get("snap"):
                # drained only once the cursor reached the table head (a
                # paced TAIL slice of empty/metadata commits can deliver
                # zero rows mid-backlog)
                vs = _manifest()._list_manifest_versions(
                    str(reader_options.get("fs"))
                    if reader_options.get("fs")
                    else None,
                    None,
                    table_root,
                )
                if not vs or int(cur.get("v", -1)) >= vs[-1]:
                    break
    else:
        raise RuntimeError(
            f"run_paced_drain: {max_runs} runs without draining "
            f"{table_root} — raise max_runs or max_files_per_batch"
        )
    return {"runs": runs, "rows": rows}
