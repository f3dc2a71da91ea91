"""CATALOG commit-log STREAMING source (Python DataSource API) — the
cross-table analogue of the tablestream's ``mode=commits``: one
metadata row per CATALOG version, carrying its full pin map, zero data
files read.

Why it exists: a multi-table consumer (a join MV, a training-data
assembler reading features + labels) must never observe TORN pins —
table A at a version that was committed together with a DIFFERENT
version of table B. Tailing the member tables individually cannot give
that guarantee; tailing the CATALOG can, because every row of this
stream IS an atomic `catalog_commit` — the consumer reads each member
table AT the row's pinned version (`read_manifested(version=…)`,
snapshots are immutable) and recomputes, observing exactly the
cross-table states that were ever published, in order, exactly once
(offsets are catalog versions; checkpoints replay version ranges
against immutable JSON).

Table-level commits that have NOT been pin-flipped into the catalog are
invisible here by construction — the stream fires on catalog FLIPS, so
a downstream refresh runs once per published consistent state, not once
per table write.

Schema: ``version BIGINT, committed_at_ms BIGINT,
pins MAP<STRING, BIGINT>, roots MAP<STRING, STRING>``.

Options: ``path`` (catalog root, required); ``starting_version`` —
``earliest`` (default: every version still on disk), ``latest`` (only
flips after the stream starts), or an int N (from version N on, which
must still exist); ``fs`` — an `io.pyfs` factory spec routing the JSON
reads through ``pyarrow.fs`` (the reader is JVM-less; see
table_stream's object-store seam).

Reference anchor: the reference engine (etl_weekly_trades.py) has one
table and no streaming — north-star X-10 × multi-table surface.
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator
from dataclasses import dataclass
from typing import Any

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

_CAT_DIR = "_catalog"  # io/catalog.py's layout, restated for JVM-less use


def _pyfs():
    try:
        from etl_demo_spark.io import pyfs
    except ModuleNotFoundError:  # foreign-cwd worker: bootstrap the path
        import sys

        if _REPO_ROOT not in sys.path:
            sys.path.insert(0, _REPO_ROOT)
        from etl_demo_spark.io import pyfs
    return pyfs


def _strip_scheme(p: str) -> str:
    return p[len("file:"):] if p.startswith("file:") else p


def _versions(root: str, spec: str | None) -> list[int]:
    d = f"{_strip_scheme(root.rstrip('/'))}/{_CAT_DIR}"
    if spec is None:
        try:
            names = os.listdir(d)
        except FileNotFoundError:
            return []
    else:
        names = _pyfs().listdir(d, spec)
    out = []
    for n in names:
        if n.startswith("v") and n.endswith(".json"):
            try:
                out.append(int(n[1:-5]))
            except ValueError:
                continue
    return sorted(out)


def _load(root: str, version: int, spec: str | None) -> dict:
    p = f"{_strip_scheme(root.rstrip('/'))}/{_CAT_DIR}/v{version:010d}.json"
    if spec is None:
        with open(p, "rb") as f:
            return json.loads(f.read().decode())
    return json.loads(_pyfs().read_bytes(p, spec).decode())


@dataclass
class _CatPartition(InputPartition):
    version: int  # <=0 = degenerate empty-range partition
    committed_at_ms: int | None
    pins: dict | None
    roots: dict | None


_SCHEMA = T.StructType(
    [
        T.StructField("version", T.LongType()),
        T.StructField("committed_at_ms", T.LongType()),
        T.StructField(
            "pins", T.MapType(T.StringType(), T.LongType())
        ),
        T.StructField(
            "roots", T.MapType(T.StringType(), T.StringType())
        ),
    ]
)


class CatalogStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        self._root = options["path"]
        self._fs_spec = options.get("fs")
        vs = _versions(self._root, self._fs_spec)
        if not vs:
            raise ValueError(f"catalogstream: {self._root} is not a catalog")
        sv = options.get("starting_version", "earliest")
        if sv == "latest":
            self._start = vs[-1]
        elif sv == "earliest":
            self._start = vs[0] - 1
        else:
            self._start = int(sv) - 1
            if self._start + 1 not in vs:
                raise ValueError(
                    f"catalogstream: starting_version {sv} not on disk "
                    f"(have {vs[0]}..{vs[-1]})"
                )

    def initialOffset(self) -> dict:
        return {"v": self._start}

    def latestOffset(self) -> dict:
        vs = _versions(self._root, self._fs_spec)
        return {"v": vs[-1] if vs else self._start}

    def partitions(self, start: dict, end: dict) -> list[_CatPartition]:
        s, e = int(start["v"]), int(end["v"])
        if e < s:
            raise ValueError(
                f"catalogstream: offset regression {s} -> {e} on "
                f"{self._root}"
            )
        out = []
        for v in range(s + 1, e + 1):
            doc = _load(self._root, v, self._fs_spec)
            out.append(
                _CatPartition(
                    v,
                    doc.get("committed_at_ms"),
                    {
                        n: int(t["version"])
                        for n, t in doc.get("tables", {}).items()
                    },
                    {
                        n: t["root"]
                        for n, t in doc.get("tables", {}).items()
                    },
                )
            )
        return out or [_CatPartition(0, None, None, None)]

    def read(self, partition: _CatPartition) -> Iterator[Any]:
        if partition.version > 0:
            yield (
                partition.version,
                partition.committed_at_ms,
                partition.pins,
                partition.roots,
            )

    def commit(self, end: dict) -> None:
        pass  # offsets are catalog versions; nothing external to ack


class CatalogStreamDataSource(DataSource):
    """``spark.readStream.format("catalogstream").option("path", root)``"""

    @classmethod
    def name(cls) -> str:
        return "catalogstream"

    def schema(self) -> T.StructType:
        return _SCHEMA

    def streamReader(self, schema: T.StructType) -> CatalogStreamReader:
        return CatalogStreamReader(dict(self.options))


def register_catalog_stream_source(spark: Any) -> None:
    """Idempotent registration, pickle-BY-VALUE (io/pyds.py) so planning
    and executor workers never need the package on their import path."""
    from etl_demo_spark.io.pyds import register_data_source

    register_data_source(spark, CatalogStreamDataSource)
