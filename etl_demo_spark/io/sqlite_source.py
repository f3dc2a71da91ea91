"""SQLite as a first-class Spark source (Python DataSource API, Spark 4).

The reference's only database surface is a SQLite file it appends to with
pandas ``to_sql`` (``etl_weekly_trades.py:134-156``, artifact
``agg_result.db``). Our engine writes that format for parity
(io/sinks.py:write_sqlite_append) — this module closes the loop so a user
of the reference can also READ their accumulated SQLite artifacts through
Spark without an intermediate export.

Built on the Python DataSource API (``pyspark.sql.datasource``): the
driver probes the table's schema and rowid range with stdlib ``sqlite3``,
then hands each executor a disjoint rowid slice — the same parallel-scan
shape as a partitioned JDBC read (``partitionColumn``/``lowerBound``/
``upperBound``), so a large table scans with N tasks rather than one.
Rows stream out of each partition cursor in fetchmany batches; nothing
materializes whole on either driver or executor.

Scale posture: SQLite files live on one filesystem, so this source is for
modest side tables (the reference's artifacts), not 100 TB facts — but
the partitioned-reader pattern is exactly what a sharded operational
store (many SQLite/JDBC shards) plugs into: one InputPartition per shard.
"""

from __future__ import annotations

import datetime as dt
from typing import Any, Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    IsNotNull,
    IsNull,
    LessThan,
    LessThanOrEqual,
)
from pyspark.sql import types as T

# SQLite declared type → Spark type. SQLite affinity rules are loose; we
# map the declarations pandas/to_sql and common DDL produce.
_TYPE_MAP = {
    # integer affinity (SQLite stores BOOLEAN as 0/1 integers)
    "INTEGER": T.LongType(),
    "BIGINT": T.LongType(),
    "SMALLINT": T.LongType(),
    "TINYINT": T.LongType(),
    "MEDIUMINT": T.LongType(),
    "BOOLEAN": T.LongType(),
    "BOOL": T.LongType(),
    "INT": T.LongType(),
    # real / numeric affinity
    "REAL": T.DoubleType(),
    "FLOAT": T.DoubleType(),
    "DOUBLE": T.DoubleType(),
    "NUMERIC": T.DoubleType(),
    "DECIMAL": T.DoubleType(),
    # text affinity
    "TEXT": T.StringType(),
    "VARCHAR": T.StringType(),
    "NVARCHAR": T.StringType(),
    "CHAR": T.StringType(),
    "CLOB": T.StringType(),
    # DATETIME must precede DATE: matching is prefix-based and
    # "DATETIME".startswith("DATE") would otherwise win
    "DATETIME": T.TimestampType(),
    "TIMESTAMP": T.TimestampType(),
    "DATE": T.DateType(),
    "BLOB": T.BinaryType(),
}


_DECIMAL_RE = None  # compiled lazily; module import stays cheap


def _decl_to_spark(decl: str) -> T.DataType:
    d = (decl or "").strip().upper()
    # DECIMAL(p,s)/NUMERIC(p,s) keep exactness (money columns feed exact
    # accumulators elsewhere in the repo); bare DECIMAL/NUMERIC stay
    # double — SQLite itself stores them as REAL.
    global _DECIMAL_RE
    if _DECIMAL_RE is None:
        import re

        _DECIMAL_RE = re.compile(r"^(?:DECIMAL|NUMERIC)\s*\(\s*(\d+)\s*(?:,\s*(\d+)\s*)?\)")
    m = _DECIMAL_RE.match(d)
    if m:
        prec = int(m.group(1))
        scale = int(m.group(2) or 0)
        if 0 < prec <= 38 and 0 <= scale <= prec:
            return T.DecimalType(prec, scale)
    for key, typ in _TYPE_MAP.items():
        if d.startswith(key):
            return typ
    return T.StringType()


def _table_schema(path: str, table: str) -> T.StructType:
    import sqlite3

    with sqlite3.connect(path) as con:
        cols = con.execute(f'PRAGMA table_info("{table}")').fetchall()
    if not cols:
        raise ValueError(f"sqlite source: table {table!r} not found in {path}")
    return T.StructType(
        [T.StructField(c[1], _decl_to_spark(c[2]), True) for c in cols]
    )


class _RowidSlice(InputPartition):
    def __init__(self, lo: int, hi: int):
        self.lo = lo
        self.hi = hi


_PUSHABLE_OPS = {
    EqualTo: "=",
    GreaterThan: ">",
    GreaterThanOrEqual: ">=",
    LessThan: "<",
    LessThanOrEqual: "<=",
}

# value types SQLite compares natively; dates/decimals stay Spark-side
_PUSHABLE_VALUES = (int, float, str, bool)


class SQLiteReader(DataSourceReader):
    def __init__(self, options: dict, schema: T.StructType):
        self.path = options["path"]
        self.table = options["table"]
        self.n_parts = int(options.get("numpartitions", "4"))
        self.schema = schema
        self._where: list[str] = []
        self._params: list = []

    def pushFilters(self, filters: list[Filter]):
        """Translate supported filters into the SQLite WHERE clause so the
        database evaluates them — the same pushdown a partitioned JDBC
        read gets. Unsupported shapes are returned for Spark to apply
        post-scan (the API contract: returned filters stay Spark-side).

        Deliberately NOT a generator: the pushed-clause side effects on
        ``self._where``/``self._params`` must happen before any partition
        reads, regardless of whether (or how lazily) the caller drains
        the returned iterable — a partially-drained generator would
        silently drop filters from both sides."""
        names = {f.name for f in self.schema.fields}
        leftover: list[Filter] = []
        for f in filters:
            clause = None
            attr = getattr(f, "attribute", None)
            col = attr[0] if attr is not None and len(attr) == 1 else None
            if col is not None and col in names:
                op = _PUSHABLE_OPS.get(type(f))
                if op is not None and isinstance(f.value, _PUSHABLE_VALUES):
                    clause = (f'"{col}" {op} ?', [f.value])
                elif isinstance(f, In) and f.value and all(
                    isinstance(v, _PUSHABLE_VALUES) for v in f.value
                ):
                    marks = ", ".join("?" for _ in f.value)
                    clause = (f'"{col}" IN ({marks})', list(f.value))
                elif isinstance(f, IsNull):
                    clause = (f'"{col}" IS NULL', [])
                elif isinstance(f, IsNotNull):
                    clause = (f'"{col}" IS NOT NULL', [])
            if clause is None:
                leftover.append(f)
            else:
                self._where.append(clause[0])
                self._params.extend(clause[1])
        return leftover

    def partitions(self) -> list[_RowidSlice]:
        import sqlite3

        with sqlite3.connect(self.path) as con:
            row = con.execute(
                f'SELECT MIN(rowid), MAX(rowid) FROM "{self.table}"'
            ).fetchone()
        lo, hi = row
        if lo is None:  # empty table: one no-op slice
            return [_RowidSlice(0, -1)]
        n = max(1, min(self.n_parts, hi - lo + 1))
        step = (hi - lo + 1 + n - 1) // n
        return [
            _RowidSlice(lo + i * step, min(hi, lo + (i + 1) * step - 1))
            for i in range(n)
        ]

    def read(self, partition: _RowidSlice) -> Iterator[tuple]:
        import sqlite3

        convs = [_converter(f.dataType) for f in self.schema.fields]
        names = ", ".join(f'"{f.name}"' for f in self.schema.fields)
        where = " AND ".join(["rowid BETWEEN ? AND ?", *self._where])
        with sqlite3.connect(self.path) as con:
            cur = con.execute(
                f'SELECT {names} FROM "{self.table}" WHERE {where}',
                (partition.lo, partition.hi, *self._params),
            )
            while True:
                batch = cur.fetchmany(10_000)
                if not batch:
                    break
                for row in batch:
                    yield tuple(c(v) for c, v in zip(convs, row))


def _converter(typ: T.DataType):
    """SQLite stores dates/timestamps as ISO text (and DECIMAL columns as
    REAL/TEXT); Spark wants objects of the declared type."""
    if isinstance(typ, T.DateType):
        return lambda v: dt.date.fromisoformat(v[:10]) if isinstance(v, str) else v
    if isinstance(typ, T.TimestampType):
        return lambda v: dt.datetime.fromisoformat(v) if isinstance(v, str) else v
    if isinstance(typ, T.DecimalType):
        import decimal

        quantum = decimal.Decimal(1).scaleb(-typ.scale)

        def to_dec(v):
            if v is None:
                return None
            # str() first: Decimal(float) would embed binary-float error
            return decimal.Decimal(str(v)).quantize(quantum)

        return to_dec
    return lambda v: v


class SQLiteDataSource(DataSource):
    """``spark.read.format("sqlite").option("path", f).option("table", t)``.

    Options: ``path`` (file), ``table``, ``numPartitions`` (default 4).
    """

    @classmethod
    def name(cls) -> str:
        return "sqlite"

    def schema(self) -> T.StructType:
        return _table_schema(self.options["path"], self.options["table"])

    def reader(self, schema: T.StructType) -> SQLiteReader:
        return SQLiteReader(self.options, schema)


def register_sqlite_source(spark: Any) -> None:
    """Idempotent registration of the ``sqlite`` format on a session.

    Also enables Python-datasource filter pushdown (runtime-settable
    SQL conf, default off in Spark 4.1): with it off, Spark refuses any
    reader that implements ``pushFilters``."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    from etl_demo_spark.io.pyds import register_data_source

    register_data_source(spark, SQLiteDataSource)  # by-value: see io/pyds.py
