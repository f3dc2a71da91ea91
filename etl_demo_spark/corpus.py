"""Query corpus: every operator from SURVEY.md §2 as a named (PySpark
query, DuckDB oracle SQL) pair, run by the driver at sf=0.01.

Conventions (driver contract, `__spark_entry__.py` docstring):
  * each query callable takes (spark, sf_dir) and returns a DataFrame;
  * every computed column is aliased identically in Spark and SQL;
  * floating-point SUMs are computed in exact DECIMAL on BOTH sides and
    cast back to DOUBLE. Double summation is order-dependent, so raw float
    sums differ between engines (and between Spark runs) in the low bits —
    and because the raw data has fixed 2-4 decimal precision, rounding the
    float sums lands exactly on round-half boundaries. Decimal aggregation
    is associative/exact, so both engines produce the identical decimal and
    the identical double after the final cast. The input columns are 2dp
    quantities/prices, so double→decimal(_,4) conversion is lossless;
  * counts are BIGINT on both sides (DuckDB SUM(int) would be HUGEINT —
    always CAST in the oracle).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_demo_spark.io.sources import load_tables
from etl_demo_spark.ops import week_start

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a corpus entry. ``oracle=None`` → driver rows-only check."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# Precisions chosen so Spark decimal arithmetic never hits the precision-38
# cap (which triggers scale-loss rounding): (18,4) * (8,4) → (28,8) exact in
# Spark, scale 8 in DuckDB too. Inputs are ≤2dp, so the lift is lossless.
DEC = "decimal(18,4)"  # money / quantity columns
DEC_SQL = "DECIMAL(18,4)"
RATE = "decimal(8,4)"  # rates in [0,1] (discount, tax)
RATE_SQL = "DECIMAL(8,4)"


def dec(c: str | F.Column) -> F.Column:
    """Lift a raw double money column into exact decimal space."""
    col = F.col(c) if isinstance(c, str) else c
    return col.cast(DEC)


def rate(c: str | F.Column) -> F.Column:
    """Lift a raw double rate column into exact decimal space."""
    col = F.col(c) if isinstance(c, str) else c
    return col.cast(RATE)


def dsum(c: F.Column) -> F.Column:
    """Order-independent, engine-identical SUM: exact decimal accumulation
    (operands must already be decimal via ``dec``), result as DOUBLE."""
    return F.sum(c).cast("double")


# ---------------------------------------------------------------------------
# Flagship (SURVEY.md §7 step 1): weekly 4-key-ish aggregation on lineitem —
# the reference's O-7 week bucket + O-8 notional + O-10 multi-key hash agg,
# mapped onto the TPC-H-ish star schema.
# ---------------------------------------------------------------------------


@query(
    "flagship_weekly_revenue",
    oracle=f"""
    SELECT CAST(date_trunc('week', l_shipdate) AS DATE) AS week_start_date,
           l_returnflag,
           CAST(SUM(CAST(l_extendedprice AS {DEC_SQL})
                    * (1 - CAST(l_discount AS {RATE_SQL}))) AS DOUBLE) AS revenue,
           CAST(SUM(CAST(l_quantity AS {DEC_SQL})) AS DOUBLE) AS sum_qty,
           COUNT(*) AS trade_count
    FROM lineitem
    GROUP BY 1, 2
    """,
)
def flagship_weekly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-7 + O-8 + O-10 on lineitem: weekly revenue per returnflag.

    One shuffle (the groupBy); week bucketing and the notional projection
    are codegen'd into the scan stage; parquet reader prunes to the four
    referenced columns (check ReadSchema)."""
    li = load_tables(spark, sf_dir, tables=("lineitem",))["lineitem"]
    notional = dec("l_extendedprice") * (1 - rate("l_discount"))
    return (
        li.groupBy(
            week_start("l_shipdate").alias("week_start_date"),
            "l_returnflag",
        )
        .agg(
            dsum(notional).alias("revenue"),
            dsum(dec("l_quantity")).alias("sum_qty"),
            F.count(F.lit(1)).alias("trade_count"),
        )
    )
