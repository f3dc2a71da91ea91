"""Sinks: Parquet (primary), SQLite (reference parity), Excel (report tail).

Reference O-17 (`etl_weekly_trades.py:134-156`) appends to SQLite via pandas
``to_sql``. At scale the primary sink is partitioned Parquet; the SQLite and
Excel writers exist only for reference parity and the tiny report tail, so
they deliberately run driver-side over ``toPandas()`` of an
already-aggregated (small) result.
"""

from __future__ import annotations

import os
import sqlite3

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """Primary sink. ``partition_by`` (e.g. a date bucket) is the 100 TB
    lever: downstream readers partition-prune instead of full-scanning."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def _ensure_parent(path: str) -> None:
    # Reference O-18 (`etl_weekly_trades.py:158-165`): mkdir -p the parent.
    parent = os.path.dirname(os.path.abspath(path))
    os.makedirs(parent, exist_ok=True)


def write_sqlite_append(
    df: DataFrame, sqlite_path: str, table: str, if_exists: str = "append"
) -> int:
    """Reference-parity SQLite sink (O-17, `etl_weekly_trades.py:134-156`).

    Default ``append`` creates the table if absent and accumulates across
    runs, like pandas ``to_sql(if_exists='append')`` — including the
    reference's documented duplicate-on-rerun behavior (`README.md:29`).
    ``if_exists='replace'`` is the idempotent variant the reference's
    README discusses (`README.md:46`). Driver-side by design: only the
    post-aggregation table (hundreds of rows) ever crosses. NaN→NULL
    happens in sqlite3 binding, matching the golden artifact's NULL cells.
    """
    _ensure_parent(sqlite_path)
    pdf = df.toPandas()
    con = sqlite3.connect(sqlite_path)
    try:
        pdf.to_sql(table, con, if_exists=if_exists, index=False)
        con.commit()
    finally:
        con.close()
    return len(pdf)


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    properties: dict[str, str] | None = None,
    num_partitions: int | None = None,
) -> None:
    """Cluster-grade JDBC sink — the distributed twin of
    ``write_sqlite_append`` (O-17): each EXECUTOR partition opens its own
    connection and batch-inserts its rows, so the write parallelizes with
    the data instead of funneling through a driver ``toPandas()``.

    ``num_partitions`` caps the writer fan-out — at scale, bound it by
    what the database accepts as concurrent connections (a 1000-task
    write is a connection storm; 8–32 writers is typical). ``mode`` maps
    to ``df.write.jdbc`` semantics: append accumulates like the
    reference's ``to_sql(if_exists='append')``; overwrite recreates.

    Works against any JDBC URL whose driver jar is on the classpath
    (embedded Derby ships with Spark and is the round-trip test target;
    SQLite needs the xerial driver jar, same call shape)."""
    if num_partitions is not None:
        # repartition, NOT coalesce: coalesce(n) propagates upstream and
        # collapses the parallelism of the stages FEEDING the write (the
        # classic pitfall — a 32-task aggregation would run on n tasks).
        # repartition inserts an exchange, so upstream compute keeps its
        # width and only the JDBC connection fan-out narrows to n.
        df = df.repartition(num_partitions)
    df.write.jdbc(url, table, mode=mode, properties=properties or {})


def read_jdbc(
    spark,
    url: str,
    table: str,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """JDBC source companion to ``write_jdbc`` (single-partition read;
    pass a query/partitioning via ``spark.read.jdbc`` directly for
    parallel scans — or the ``sqlite`` Python DataSource for SQLite
    files, which already slices by rowid)."""
    return spark.read.jdbc(url, table, properties=properties or {})


def write_excel(df: DataFrame, path: str) -> str:
    """Excel report sink (O-24, `etl_weekly_trades.py:214-217`).

    Driver-side over a tiny aggregate. Uses pandas/openpyxl when present;
    otherwise the built-in pure-stdlib SpreadsheetML writer (io/xlsx.py)
    emits the same number/inline-string cell shapes the reference's
    artifact uses — a real .xlsx either way.
    """
    _ensure_parent(path)
    pdf = df.toPandas()
    try:
        pdf.to_excel(path, index=False)
        return path
    except ImportError:
        from etl_demo_spark.io.xlsx import write_xlsx

        def py(v):
            v = v.item() if hasattr(v, "item") else v  # numpy scalar → python
            return None if (isinstance(v, float) and v != v) else v

        header = [str(c) for c in pdf.columns]
        rows = [[py(v) for v in rec] for rec in pdf.itertuples(index=False, name=None)]
        write_xlsx(path, header, rows)
        return path


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink (X-1) — second columnar format, same writer surface."""
    df.write.mode(mode).orc(path)


def write_text(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Raw text sink: exactly one string column, one line per row — the
    export shape for plain-text training shards (pair with
    ``repartition(n)`` upstream to control shard count/size)."""
    df.write.mode(mode).text(path)
