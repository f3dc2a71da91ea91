"""Replay streaming source over a sorted parquet log (Python DataSource
API, Spark 4 ``DataSourceStreamReader``) — X-1/X-10.

What it is: a custom STREAMING source that replays a pre-sorted parquet
event log as a paced micro-batch stream — the tool that turns any stored
table into a deterministic live feed (backfills through the exact same
streaming topology as production, load tests, demo feeds, reproducible
streaming-bug repros). The reference has nothing like it; Spark's own
file source can only move whole files through time, not pace rows.

Design (and why it scales):

* offsets are ROW INDEXES into the log's fixed order — a dict
  ``{"idx": n}``. Exactly-once falls out of the checkpoint replaying
  index ranges.
* pacing is OPT-IN: with ``batch_rows`` set, each offset poll exposes
  that many more rows — a paced feed under processingTime triggers
  (live-replay). Unset, ``latestOffset`` reports everything, which is
  what ``availableNow`` requires — it SNAPSHOTS one latest offset at
  start and drains to it, so a pacing source would strand the rest
  (measured: one 300-row batch of a 1000-row log). The pacing cursor is
  PERSISTED in a sidecar next to the log (``<file>.pace``): a restarted
  query's fresh reader resumes the high-water mark instead of reporting
  an offset BELOW the checkpointed position — without it Spark would
  record the regressed offset and re-deliver the gap (double-counting
  in any non-complete sink). One paced query per log at a time (the
  sidecar is the cursor); unpaced readers never touch it.
* the log is REQUIRED to be pre-sorted (``write_replay_log`` — a one-off
  prep job): the reader never sorts, so a micro-batch is a pure row-range
  slice. At 100 TB the same layout is day-partitioned sorted logs.
* ``partitions(start, end)`` splits the batch range into
  ``partition_rows`` chunks → EXECUTOR-parallel reads; each task slices
  its range out of the parquet with pyarrow (row-group pruning via
  skip+slice, no full-file materialization beyond the touched groups).
  The driver never sees data — unlike ``SimpleDataSourceStreamReader``,
  which is a driver-side prefetch loop and is exactly what this class
  exists to avoid.

Registered as ``spark.readStream.format("replay")`` after
``register_replay_source(spark)``; options: ``path`` (the sorted log),
``batch_rows`` (poll pacing; 0/unset = everything, the availableNow
mode), ``partition_rows`` (task split, default 5000).
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

_PA_TO_DDL = {
    "int8": "tinyint",
    "int16": "smallint",
    "int32": "int",
    "int64": "bigint",
    "float": "float",
    "double": "double",
    "string": "string",
    "large_string": "string",
    "bool": "boolean",
    "date32[day]": "date",
    "binary": "binary",
    "large_binary": "binary",
}


def write_replay_log(df: DataFrame, path: str, order_cols: list[str]) -> None:
    """One-off prep: materialize ``df`` as a replay log — globally sorted
    by ``order_cols`` so the streaming reader's row-index offsets follow
    event order deterministically. Single file per log (a replay unit);
    at scale, one log per day/shard partition, each independently sorted
    — replay fans out per shard, ordering is per-shard (the same contract
    Kafka gives per partition)."""
    df.orderBy(*order_cols).coalesce(1).write.mode("overwrite").parquet(path)


def _log_file(path: str) -> str:
    import glob
    import os

    if os.path.isfile(path):
        return path
    parts = sorted(glob.glob(os.path.join(path, "*.parquet")))
    if len(parts) != 1:
        raise ValueError(
            f"replay source: expected exactly one parquet file under {path} "
            f"(a replay log is one sorted file per unit), found {len(parts)}"
        )
    return parts[0]


@dataclass
class _RangePartition(InputPartition):
    file: str
    start: int
    end: int


class ReplayStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        self._file = _log_file(options["path"])
        self._batch_rows = int(options.get("batch_rows", 0))
        self._partition_rows = int(
            options.get("partition_rows", self._batch_rows or 5000)
        )
        if self._batch_rows < 0 or self._partition_rows < 1:
            raise ValueError(
                "replay source: batch_rows must be >= 0 and partition_rows >= 1"
            )
        import pyarrow.parquet as pq

        self._total = pq.ParquetFile(self._file).metadata.num_rows

    def initialOffset(self) -> dict:
        return {"idx": 0}

    def _pace_file(self) -> str:
        return self._file + ".pace"

    def latestOffset(self) -> dict:
        if not self._batch_rows:
            return {"idx": self._total}
        # paced mode: each poll exposes at most batch_rows more (use with
        # processingTime triggers; see module docstring for why NOT with
        # availableNow). The cursor survives restarts via the sidecar —
        # monotonicity vs the checkpoint is what makes pacing exactly-once.
        import os

        if not hasattr(self, "_latest"):
            self._latest = 0
            if os.path.exists(self._pace_file()):
                try:
                    with open(self._pace_file()) as f:
                        self._latest = int(f.read().strip() or 0)
                except (OSError, ValueError):
                    self._latest = 0
        self._latest = min(self._latest + self._batch_rows, self._total)
        tmp = self._pace_file() + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(self._latest))
        os.replace(tmp, self._pace_file())
        return {"idx": self._latest}

    def partitions(self, start: dict, end: dict) -> list[_RangePartition]:
        s, e = int(start["idx"]), int(end["idx"])
        if e < s:
            # an offset below the checkpointed position would silently
            # re-deliver rows [e, s); fail loudly instead (stale/foreign
            # pace sidecar, or a truncated log)
            raise ValueError(
                f"replay source: offset regression {s} -> {e}; the pace "
                f"sidecar or the log is out of sync with this checkpoint"
            )
        return [
            _RangePartition(self._file, i, min(i + self._partition_rows, e))
            for i in range(s, e, self._partition_rows)
        ] or [_RangePartition(self._file, s, s)]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        import pyarrow.parquet as pq

        pf = pq.ParquetFile(partition.file)
        want_s, want_e = partition.start, partition.end
        if want_e <= want_s:
            return
        # row-group pruning: skip groups wholly before the range, stop
        # after it — only the touched groups decompress
        pos = 0
        for rg in range(pf.metadata.num_row_groups):
            n = pf.metadata.row_group(rg).num_rows
            if pos + n <= want_s:
                pos += n
                continue
            if pos >= want_e:
                break
            tbl = pf.read_row_group(rg)
            lo = max(want_s - pos, 0)
            hi = min(want_e - pos, n)
            for row in tbl.slice(lo, hi - lo).to_pylist():
                yield tuple(row.values())
            pos += n

    def commit(self, end: dict) -> None:
        pass  # offsets are pure indexes; nothing external to acknowledge


class ReplayDataSource(DataSource):
    """``spark.readStream.format("replay").option("path", log).load()``"""

    @classmethod
    def name(cls) -> str:
        return "replay"

    def schema(self) -> str:
        import pyarrow.parquet as pq

        sch = pq.ParquetFile(_log_file(self.options["path"])).schema_arrow
        cols = []
        for field in sch:
            t = str(field.type)
            if t.startswith("timestamp"):
                ddl = "timestamp_ntz" if "tz=" not in t else "timestamp"
            elif t.startswith("decimal"):
                ddl = t
            elif t in _PA_TO_DDL:
                ddl = _PA_TO_DDL[t]
            else:
                raise ValueError(
                    f"replay source: unsupported parquet type {t!r} for "
                    f"column {field.name!r}"
                )
            cols.append(f"{field.name} {ddl}")
        return ", ".join(cols)

    def streamReader(self, schema: T.StructType) -> ReplayStreamReader:
        return ReplayStreamReader(dict(self.options))


def register_replay_source(spark: Any) -> None:
    """Idempotent registration of the ``replay`` streaming format.

    Registered pickle-BY-VALUE (io/pyds.py) so the planning and executor
    workers never need ``etl_demo_spark`` on their import path."""
    from etl_demo_spark.io.pyds import register_data_source

    register_data_source(spark, ReplayDataSource)
