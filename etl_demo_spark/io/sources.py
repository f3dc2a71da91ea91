"""Sources: Parquet / CSV / JSON scans (SURVEY.md §2 O-1, X-1).

Everything goes through ``spark.read`` so Catalyst pushes filters and prunes
columns into the scan (check ``PushedFilters`` / ``ReadSchema`` in
``.explain("formatted")``). At 100 TB the parquet reader is the single most
important operator: vectorized, predicate-pushing, partition-pruning — none
of which we re-implement.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Driver testdata tables (TESTDATA.md / FIXTURES.md §B).
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    header: bool = True,
    sep: str = ",",
) -> DataFrame:
    """CSV scan (reference O-1, `etl_weekly_trades.py:9-18`).

    With an explicit all-string schema the clean layer owns coercion
    (reference semantics: garbage → NULL, SURVEY.md §1.4); with
    ``schema=None`` Spark infers like ``pd.read_csv`` does.
    """
    reader = spark.read.option("header", str(header).lower()).option("sep", sep)
    if schema is not None:
        return reader.schema(schema).csv(path)
    return reader.option("inferSchema", "true").csv(path)


def read_json(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan (X-1) — columnar like parquet: vectorized reader, predicate
    pushdown, and partition pruning all apply."""
    return spark.read.orc(path)


def read_parquet_merged(spark: SparkSession, path: str) -> DataFrame:
    """Parquet scan with schema merging across files — the engine's answer
    to the reference's append-drift failure (README.md:29: appending a
    no-PnL frame after a PnL frame corrupts the SQLite table). Files
    written with a column subset read back with NULLs in the missing
    columns instead of erroring."""
    return spark.read.option("mergeSchema", "true").parquet(path)


def read_events(spark: SparkSession, path: str) -> DataFrame:
    """Events scan normalizing ``ts`` to session-zoned TIMESTAMP.

    The testdata generator has shipped ``ts`` under three physical types
    across driver rounds; this reader accepts all of them so the engine
    is layout-agnostic:

    - parquet TIMESTAMP(NANOS): Spark's reader rejects it outright, so
      enable the nanos-as-long legacy read and truncate to microseconds
      (integer ``div`` — ns-since-epoch exceeds double's exact range);
    - TIMESTAMP(MICROS) without tz: arrives as TIMESTAMP_NTZ; cast to
      TIMESTAMP (a value no-op under the engine's UTC session zone) so
      downstream window/watermark/date arithmetic sees one type;
    - tz-aware TIMESTAMP: already the target type.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    ts_type = df.schema["ts"].dataType
    if isinstance(ts_type, T.LongType):
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if isinstance(ts_type, T.TimestampNTZType):
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


# (application id, sf_dir, table) → DataFrame. DataFrames are immutable
# logical plans, so reuse is safe; caching skips the per-read footer/schema-
# inference job that otherwise taxes every corpus query with fixed overhead.
# Keyed on the Spark applicationId (unique per context) so a restarted
# session never sees plans bound to a dead context — id(spark) could be
# reused by the allocator after a session is garbage-collected.
#
# CONTRACT: sf_dir contents must be immutable for the application lifetime
# (driver testdata is) — a cached plan pins the file index it was created
# with, so regenerating parquet in place would leave cached DataFrames
# reading the stale listing. Call clear_table_cache() after any in-place
# rewrite. Note also that a cached DataFrame is bound to the SparkSession
# that created it; register_views on a cache hit registers the view in
# THAT session's catalog (multiple sessions over one context should each
# use their own sf_dir or clear between).
_TABLE_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def clear_table_cache() -> int:
    """Drop all cached table plans; returns how many were dropped."""
    n = len(_TABLE_CACHE)
    _TABLE_CACHE.clear()
    return n


def load_tables(
    spark: SparkSession,
    sf_dir: str,
    tables: tuple[str, ...] = TESTDATA_TABLES,
    register_views: bool = False,
) -> dict[str, DataFrame]:
    """Load the driver testdata star schema from ``sf_dir``.

    ``register_views=True`` also registers each table as a temp view so
    ``spark.sql`` queries can reference them by name.
    """
    out: dict[str, DataFrame] = {}
    app_id = spark.sparkContext.applicationId
    for name in tables:
        key = (app_id, sf_dir, name)
        df = _TABLE_CACHE.get(key)
        if df is None:
            path = os.path.join(sf_dir, f"{name}.parquet")
            if name == "events":
                df = read_events(spark, path)
            else:
                df = spark.read.parquet(path)
            _TABLE_CACHE[key] = df
        if register_views:
            df.createOrReplaceTempView(name)
        out[name] = df
    return out


def all_string_schema(columns: list[str]) -> T.StructType:
    """Explicit all-string schema — raw layer for the clean operators."""
    return T.StructType([T.StructField(c, T.StringType(), True) for c in columns])


def read_text(
    spark: SparkSession, path: str, whole_file: bool = False
) -> DataFrame:
    """Raw text source: one row per line (``value: string``), or one row
    per FILE with ``wholetext`` — the ingestion path for plain-text
    corpora before any parsing. Line mode splits large files across
    tasks; whole-file mode keeps document boundaries (one task per file —
    size files accordingly upstream)."""
    return spark.read.text(path, wholetext=whole_file)
