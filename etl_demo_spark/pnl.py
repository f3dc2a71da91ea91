"""Weekly trades transform + PnL layer (SURVEY.md §2 O-7…O-16).

Re-expresses the reference's analytical core (`etl_weekly_trades.py:52-131`)
as one lazy Spark plan:

    clean trades
      → project week bucket / notional / masked buy-sell columns
      → 4-key hash aggregation (one shuffle)
      → broadcast-join per-symbol mark prices (argmax aggregate, no sort)
      → scalar PnL layer (pure column arithmetic, NULL-propagating)

Scale: the only wide operations are the 4-key groupBy and the tiny
per-symbol argmax; the mark-price join is broadcast (symbol dimension is
small by construction). Nothing collects on the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_demo_spark.ops import broadcast_enrich, grouped_agg, last_value_by, masked, sum0, week_start

GROUP_KEYS = ["week_start_date", "client_type", "user_id", "symbol"]


def project_trades(df: DataFrame) -> DataFrame:
    """O-7/O-8/O-9 (`etl_weekly_trades.py:61-78`): week bucket, notional,
    and side-masked quantity/value columns (NULL outside the side)."""
    is_buy = F.col("side") == "buy"
    is_sell = F.col("side") == "sell"
    notional = F.col("quantity") * F.col("price")
    return df.withColumns(
        {
            "week_start_date": week_start("timestamp"),
            "total_volume": notional,
            "buy_qty": masked(F.col("quantity"), is_buy),
            "sell_qty": masked(F.col("quantity"), is_sell),
            "buy_value": masked(notional, is_buy),
            "sell_value": masked(notional, is_sell),
        }
    )


def aggregate_weekly(df: DataFrame, compute_pnl: bool = True) -> DataFrame:
    """O-10 (`etl_weekly_trades.py:67-96`): 4-key weekly aggregation.

    ``sum0`` = coalesce(sum, 0.0) matches pandas' sum-of-all-NaN = 0.0
    (observed: buy_qty=0.0 rows in the reference's agg_result.db).
    trade_count counts non-null timestamps (`:85`) — post-clean, rows.
    """
    projected = project_trades(df)
    if not compute_pnl:
        return grouped_agg(
            projected,
            GROUP_KEYS,
            {
                "total_volume": sum0("total_volume"),
                "trade_count": F.count("timestamp"),
            },
        )
    return grouped_agg(
        projected,
        GROUP_KEYS,
        {
            "buy_qty": sum0("buy_qty"),
            "sell_qty": sum0("sell_qty"),
            "buy_value": sum0("buy_value"),
            "sell_value": sum0("sell_value"),
            "total_volume": sum0("total_volume"),
            "trade_count": F.count("timestamp"),
        },
    )


def mark_prices(cleaned: DataFrame) -> DataFrame:
    """O-11 (`etl_weekly_trades.py:123-131`): per-symbol price of the
    globally latest trade (computed on cleaned, pre-agg trades — one mark
    per symbol across all weeks, reference quirk at `:87`)."""
    return last_value_by(cleaned.select("symbol", "price", "timestamp"), "symbol", "price", "timestamp").withColumnRenamed(
        "price", "mark_price"
    )


def with_pnl(agg: DataFrame, marks: DataFrame) -> DataFrame:
    """O-12…O-16 (`etl_weekly_trades.py:99-121`): mark-price broadcast join
    + scalar PnL layer. Division by zero → NULL (non-ANSI) reproduces the
    reference's np.isfinite guard (`:109`) for free; NULL propagation
    through the arithmetic matches pandas NaN propagation."""
    df = broadcast_enrich(agg, marks, on="symbol", how="left")
    avg_buy = F.col("buy_value") / F.col("buy_qty")  # NULL when buy_qty == 0
    df = df.withColumn("avg_buy_price", avg_buy)
    df = df.withColumn("net_qty", F.col("buy_qty") - F.col("sell_qty"))
    df = df.withColumn("realized_pnl", F.col("sell_value") - F.col("avg_buy_price") * F.col("sell_qty"))
    df = df.withColumn("unrealized_pnl", (F.col("mark_price") - F.col("avg_buy_price")) * F.col("net_qty"))
    df = df.withColumn("total_pnl", F.col("realized_pnl") + F.col("unrealized_pnl"))
    return df.select(
        "week_start_date", "client_type", "user_id", "symbol",
        "buy_qty", "sell_qty", "buy_value", "sell_value",
        "total_volume", "trade_count", "avg_buy_price", "net_qty",
        "realized_pnl", "mark_price", "unrealized_pnl", "total_pnl",
    )


def transform(cleaned: DataFrame, compute_pnl: bool = True, single_pass: bool = True) -> DataFrame:
    """The reference's ``transform`` (`etl_weekly_trades.py:52-97`), lazily
    composed. Output schema matches FIXTURES.md §A2 exactly.

    ``single_pass=True`` (default) derives mark prices from per-group
    argmaxes carried through the weekly aggregation instead of a second
    scan of the trades — argmax is associative, so the per-symbol argmax
    over group-level (last_price, last_ts) equals the global argmax. At
    100 TB this halves the input IO of the PnL pipeline; the two-scan
    form is kept for differential testing."""
    if not compute_pnl:
        return aggregate_weekly(cleaned, compute_pnl=False)
    if not single_pass:
        return with_pnl(aggregate_weekly(cleaned), mark_prices(cleaned))
    projected = project_trades(cleaned)
    agg = grouped_agg(
        projected,
        GROUP_KEYS,
        {
            "buy_qty": sum0("buy_qty"),
            "sell_qty": sum0("sell_qty"),
            "buy_value": sum0("buy_value"),
            "sell_value": sum0("sell_value"),
            "total_volume": sum0("total_volume"),
            "trade_count": F.count("timestamp"),
            "__last_price": F.max_by("price", "timestamp"),
            "__last_ts": F.max("timestamp"),
        },
    )
    marks = agg.groupBy("symbol").agg(
        F.max_by("__last_price", "__last_ts").alias("mark_price")
    )
    return with_pnl(agg.drop("__last_price", "__last_ts"), marks)
