"""Reporting verbs + export tail (SURVEY.md §2 O-19…O-26).

The reference's ``reporting`` (`etl_weekly_trades.py:167-227`): filter one
client_type, roll up per user, take top-K per metric with ranks, union with
a provenance label, export. Everything before the export is distributed;
only the final ≤ top_n×metrics rows cross to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_demo_spark.io.sinks import write_excel
from etl_demo_spark.ops import ranked, top_k, union_all

DEFAULT_METRICS = ["total_volume", "total_pnl"]


def client_rollup(df_agg: DataFrame, client_type: str, metrics: list[str]) -> DataFrame:
    """O-19 + O-20 (`etl_weekly_trades.py:186-190`): equality filter then
    per-user rollup. Filter-before-aggregate: Catalyst pushes the predicate
    to the scan, the rollup shuffles only the surviving client_type."""
    rolled = (
        df_agg.filter(F.col("client_type") == client_type)
        .groupBy("user_id")
        .agg(*[F.sum(m).alias(m) for m in metrics])
        .withColumn("client_type", F.lit(client_type))
    )
    return rolled


def top_clients(
    df_agg: DataFrame,
    client_type: str = "bronze",
    top_n: int = 3,
    metrics: list[str] | None = None,
) -> DataFrame:
    """O-19…O-23 (`etl_weekly_trades.py:182-207`): per-metric top-K with
    pandas-style average rank over ALL users of the client type, unioned
    with a ``top_label`` provenance column."""
    metrics = metrics or DEFAULT_METRICS
    rolled = client_rollup(df_agg, client_type, metrics)
    frames = []
    for m in metrics:
        with_rank = ranked(rolled, m)  # rank over ALL users, like reference :202
        frames.append(
            top_k(with_rank, m, top_n, tiebreak=["user_id"]).withColumn("top_label", F.lit(m))
        )
    return union_all(frames).select("user_id", *metrics, "client_type", "top_label", "rank")


def export_report(
    df: DataFrame,
    path: str,
    add_timestamp: bool = False,
    _now: "datetime | None" = None,
) -> str:
    """O-24: Excel sink (CSV fallback in this container).

    ``add_timestamp`` mirrors the reference's optional filename stamping
    (`etl_weekly_trades.py:210-212`): prefix the FILENAME with
    ``%Y%m%d_%H%M%S_``. The reference also hard-codes the stamped path to
    ``output/<stamp>_top_clients.xlsx``, discarding the caller's ``path``
    — a quirk, not a contract; we keep the caller's directory and
    basename (the intended semantics). ``_now`` injects a fixed clock for
    deterministic tests.

    Returns the path actually written (callers need it when stamping).
    """
    if add_timestamp:
        import os
        from datetime import datetime

        stamp = (_now or datetime.now()).strftime("%Y%m%d_%H%M%S")
        head, tail = os.path.split(path)
        path = os.path.join(head, f"{stamp}_{tail}")
    return write_excel(df, path)


def weekly_volume_series(df_agg: DataFrame) -> DataFrame:
    """O-26 data source (`etl_weekly_trades.py:239-253`): weekly total
    volume — the chart itself is a driver-side matplotlib concern."""
    return df_agg.groupBy("week_start_date").agg(F.sum("total_volume").alias("total_volume")).orderBy("week_start_date")


def save_charts(df_agg: DataFrame, out_dir: str) -> list[str]:
    """O-26 (`etl_weekly_trades.py:229-268`): weekly-volume line + stacked
    weekly-count bars, as real PNGs. Driver-side matplotlib over the tiny
    aggregate when available; otherwise the built-in pure-stdlib PNG
    rasterizer (io/png.py) draws the same two charts — the distributed
    part (the aggregations) is identical either way."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    series = weekly_volume_series(df_agg).toPandas()
    counts = weekly_counts_by_client(df_agg).toPandas()
    p1 = os.path.join(out_dir, "weekly_volume.png")
    p2 = os.path.join(out_dir, "weekly_counts.png")
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots()
        ax.plot(series["week_start_date"], series["total_volume"])
        ax.set_title("Weekly total volume")
        fig.savefig(p1)
        plt.close(fig)
        fig, ax = plt.subplots()
        indexed = counts.set_index("week_start_date")
        if len(indexed) and len(indexed.columns):
            indexed.plot(kind="bar", stacked=True, ax=ax)
        # an empty aggregate (every input row dropped by cleaning) renders
        # an empty axes rather than raising pandas' no-numeric-data
        # TypeError after the first chart already wrote — the chart SET
        # stays complete either way
        ax.set_title("Weekly trade count by client type")
        fig.savefig(p2)
        plt.close(fig)
    except ImportError:
        from etl_demo_spark.io.png import line_chart, stacked_bar_chart

        line_chart(
            list(series["total_volume"]), p1, title="Weekly total volume"
        )
        cats = [str(v) for v in counts["week_start_date"]]
        layers = {
            c: list(counts[c]) for c in counts.columns if c != "week_start_date"
        }
        stacked_bar_chart(
            cats, layers, p2, title="Weekly trade count by client type"
        )
    return [p1, p2]


def weekly_counts_by_client(df_agg: DataFrame) -> DataFrame:
    """O-25 (`etl_weekly_trades.py:256`): pivot week × client_type on
    trade_count, zero-filled."""
    from etl_demo_spark.ops import pivot_wide

    return pivot_wide(df_agg, "week_start_date", "client_type", "trade_count").orderBy(
        "week_start_date"
    )
