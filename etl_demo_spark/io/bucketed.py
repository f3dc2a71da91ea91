"""Bucketed (hash-clustered) table layout: shuffle-FREE fact-fact joins.

The single most expensive plan shape at 100 TB is a join between two fact
tables (lineitem ⋈ orders, events ⋈ sessions): both sides shuffle on the
key — at 1000 executors that is the full table over the network, twice,
every query. Bucketing amortizes that shuffle into the WRITE: each table
is hash-clustered into N buckets on the join key once, and every
subsequent join on that key reads co-located buckets and skips the
exchange entirely (Spark's bucketed scan reports its output partitioning
to Catalyst, so EnsureRequirements inserts no Exchange).

This is the classic warehouse trade:
  * pay: one shuffle at ingest per table (the bucketed write), a catalog
    entry (bucket metadata lives in the table definition — plain
    directory reads cannot carry it), and a fixed bucket count;
  * get: every fact-fact join, aggregation, or window on the bucket key
    with ZERO exchange on the bucketed sides, forever.

Sizing at 100 TB: buckets are the unit of join parallelism — pick
  n_buckets ≈ table_bytes / target_task_bytes (e.g. 100 TB / 256 MB ≈
  400k is too many files per leaf; in practice 4k-32k and let each task
  read several row groups). Both join sides need the SAME bucket count
  (or multiples, with spark.sql.bucketing.coalesceBucketsInJoin.enabled
  — Spark coalesces the larger side's buckets at read). ``sort_cols``
  pre-sorts within buckets so the sort-merge join can also skip its Sort
  when each bucket holds one file.

Cite: the reference (etl_weekly_trades.py) holds everything in one
pandas frame — no layout concept at all; this module is the Spark-first
answer for its join-heavy report queries at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    bucket_cols: list[str] | str,
    num_buckets: int,
    sort_cols: list[str] | str | None = None,
    path: str | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Hash-cluster ``df`` into ``num_buckets`` buckets on
    ``bucket_cols`` and register it in the session catalog as ``name``
    (bucket metadata MUST live in a catalog — a plain parquet directory
    cannot tell a reader how its files are clustered). ``path`` makes it
    an external table at that location; ``sort_cols`` additionally sorts
    within each bucket file so downstream sort-merge joins skip their
    Sort. One shuffle (the clustered write) — the cost every later join
    on the key no longer pays."""
    bcols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    if num_buckets < 1:
        raise ValueError(f"num_buckets must be >= 1, got {num_buckets}")
    w = df.write.mode(mode).format(fmt).bucketBy(num_buckets, *bcols)
    if sort_cols:
        scols = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
        w = w.sortBy(*scols)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(name)


def read_bucketed(spark: SparkSession, name: str) -> DataFrame:
    """The bucketed table as a DataFrame. The scan reports its hash
    partitioning to the optimizer, which is the whole point — use this
    (not spark.read.parquet on the files) or the bucket metadata is
    lost and joins shuffle again."""
    return spark.table(name)


def assert_no_shuffle_join(joined: DataFrame, sides: int = 2) -> None:
    """Plan guard for tests and load-bearing pipelines: raises if the
    join's physical plan still shuffles a bucketed side. ``sides=2``
    demands ZERO exchanges (both sides bucketed); ``sides=1`` allows one
    (only one side bucketed — the other must still shuffle)."""
    plan = joined._jdf.queryExecution().executedPlan().toString()
    n = plan.count("Exchange hashpartitioning")
    allowed = 0 if sides == 2 else 1
    if n > allowed:
        raise AssertionError(
            f"expected <= {allowed} hash exchange(s) in the bucketed join "
            f"plan, found {n}:\n{plan}"
        )
