"""Cleaning / data-quality operators (SURVEY.md §2 O-2…O-6).

Reference semantics (`etl_weekly_trades.py:20-49`): coerce-to-NULL numeric
and strict-format timestamp parsing, then drop any row containing a NULL.
All of it stays JVM-side (non-ANSI casts + ``to_timestamp``) — no UDFs —
so cleaning is part of the same whole-stage-codegen span as the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TS_FORMAT = "yyyy-MM-dd HH:mm:ss"  # reference strict format (%Y-%m-%d %H:%M:%S)


def null_row_count(df: DataFrame) -> int:
    """O-2 (`etl_weekly_trades.py:24-25`): rows with ≥1 NULL column."""
    pred = None
    for c in df.columns:
        cond = F.col(c).isNull()
        pred = cond if pred is None else (pred | cond)
    return df.where(pred).count()


def distinct_values(df: DataFrame, columns: list[str]) -> dict[str, list]:
    """O-3 (`etl_weekly_trades.py:27-30`): categorical-domain screen.

    Diagnostic (small-cardinality columns only) — collects per-column
    distincts, which are tiny after the distinct aggregation.
    """
    # ONE aggregation pass for all columns (collect_set per column plus a
    # has-null flag, all with map-side partials) instead of a full scan
    # per column — the same one-pass rationale as ``observed``.
    # collect_set drops NULLs, so NULL presence rides as its own flag
    # (the reference's pandas unique() includes NaN).
    row = df.agg(
        *[F.collect_set(c).alias(f"__v_{c}") for c in columns],
        *[
            F.max(F.when(F.col(c).isNull(), True).otherwise(False)).alias(f"__n_{c}")
            for c in columns
        ],
    ).collect()[0]
    return {
        c: list(row[f"__v_{c}"]) + ([None] if row[f"__n_{c}"] else [])
        for c in columns
    }


def coerce_numeric(df: DataFrame, columns: list[str]) -> DataFrame:
    """O-4 (`etl_weekly_trades.py:33-35`): ``to_numeric(errors='coerce')``.

    Non-ANSI ``cast('double')`` returns NULL on garbage — exact match.
    """
    return df.withColumns({c: F.col(c).cast("double") for c in columns})


def parse_timestamp(df: DataFrame, column: str, fmt: str = TS_FORMAT) -> DataFrame:
    """O-5 (`etl_weekly_trades.py:37-43`): strict-format parse, invalid→NULL."""
    return df.withColumn(column, F.to_timestamp(F.col(column), fmt))


def invalid_timestamp_values(df: DataFrame, column: str, fmt: str = TS_FORMAT) -> DataFrame:
    """O-5 diagnostics (`etl_weekly_trades.py:40-41`): distinct raw strings
    that fail the strict parse. Returns a (small) DataFrame."""
    parsed = F.to_timestamp(F.col(column), fmt)
    return (
        df.where(F.col(column).isNotNull() & parsed.isNull())
        .select(F.col(column).alias("invalid_raw"))
        .distinct()
    )


def drop_any_null(df: DataFrame) -> DataFrame:
    """O-6 (`etl_weekly_trades.py:46-48`): keep rows with ALL columns set."""
    return df.na.drop("any")


def clean_trades(df: DataFrame) -> DataFrame:
    """The reference's full ``clean_prepare`` (`etl_weekly_trades.py:20-49`):
    coerce quantity/price, strict-parse timestamp, cast user_id, drop any-null.
    Input: all-string raw trades frame (columns per FIXTURES.md §A1)."""
    df = coerce_numeric(df, ["quantity", "price"])
    df = parse_timestamp(df, "timestamp")
    df = df.withColumn("user_id", F.col("user_id").cast("long"))
    return drop_any_null(df)


def non_null(c: str) -> Column:
    return F.col(c).isNotNull()


def observed(df: DataFrame, name: str = "quality", **metrics: Column):
    """Attach zero-extra-pass data-quality metrics to a plan
    (``Dataset.observe``): the metrics evaluate DURING the next action on
    ``df`` — at 100 TB a separate ``count()`` or profile pass costs a
    full scan; an observation rides the scan the job already does.

    Returns ``(observed_df, observation)``; read ``observation.get``
    AFTER an action has run. Default metrics when none are given: row
    count + per-column null counts (the reference's O-2 diagnostics,
    aggregated for free).

    Works on batch and streaming (streaming surfaces the metrics per
    micro-batch through the query-progress listener)."""
    from pyspark.sql import Observation

    if not metrics:
        metrics = {"rows": F.count(F.lit(1))}
        for c in df.columns:
            metrics[f"nulls_{c}"] = F.sum(F.col(c).isNull().cast("long"))
    obs = Observation(name)
    out = df.observe(obs, *[m.alias(k) for k, m in metrics.items()])
    return out, obs
