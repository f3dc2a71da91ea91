"""Reference-parity pipeline: the whole of `etl_weekly_trades.py:270-281`
(``run_etl``) as one lazy Spark plan with a single action per sink.

Unlike the reference, optional stages raise real errors (SURVEY.md §2.1
"quirks": bare ``except`` at `:89-90`/`:191-192` is intentionally NOT
reproduced — we implement the intended semantics)."""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from etl_demo_spark.clean import clean_trades
from etl_demo_spark.io.sinks import write_sqlite_append
from etl_demo_spark.io.sources import all_string_schema, read_csv
from etl_demo_spark.pnl import transform
from etl_demo_spark.report import export_report, top_clients

TRADES_COLUMNS = ["timestamp", "user_id", "client_type", "symbol", "side", "quantity", "price"]


@dataclass
class EtlResult:
    aggregated: DataFrame
    rows_loaded: int = 0
    report: DataFrame | None = None
    report_path: str | None = None
    extras: dict = field(default_factory=dict)


def extract(spark: SparkSession, input_csv: str) -> DataFrame:
    """O-1 (`etl_weekly_trades.py:9-18`): CSV scan, all-string schema — the
    clean layer owns type repair (reference's read_csv-then-coerce)."""
    return read_csv(spark, input_csv, schema=all_string_schema(TRADES_COLUMNS))


def run_etl(
    spark: SparkSession,
    input_csv: str,
    sqlite_path: str | None = None,
    table_name: str = "agg_trades_weekly",
    compute_pnl: bool = True,
    report_path: str | None = None,
    client_type: str = "bronze",
    top_n: int = 3,
    diagnose: bool = False,
    add_timestamp: bool = False,
) -> EtlResult:
    """extract → clean → transform(+PnL) → [load] → [report].

    Mirrors `etl_weekly_trades.py:270-281`; sinks are opt-in so tests can
    stay lazy. The aggregate is small (one row per (week, client, user,
    symbol)) so sink-side driver crossings are bounded by output size,
    not input size.
    """
    raw = extract(spark, input_csv)
    obs_raw = obs_clean = None
    if diagnose:
        # zero-extra-pass O-2 diagnostics: observations evaluate during
        # the sink action below instead of separate count() scans
        import uuid

        from etl_demo_spark.clean import observed

        tag = uuid.uuid4().hex[:8]
        raw, obs_raw = observed(raw, f"etl_raw_{tag}")
    cleaned = clean_trades(raw)
    if diagnose:
        from pyspark.sql import functions as F

        from etl_demo_spark.clean import observed

        cleaned, obs_clean = observed(
            cleaned, f"etl_clean_{tag}", rows=F.count(F.lit(1))
        )
    agg = transform(cleaned, compute_pnl=compute_pnl)
    # the aggregate is group-grain (tiny vs the input); persist it so the
    # downstream actions (sink, report, CLI count/show) each reuse one
    # scan+clean+aggregate execution instead of recomputing the pipeline.
    # Tracked: a NEW run_etl releases the previous run's cache (its result
    # has been consumed by then), so repeated pipeline invocations in one
    # session don't accumulate cached aggregates.
    from etl_demo_spark.cache import release_persisted, tracked_persist

    release_persisted()
    agg = tracked_persist(agg)
    result = EtlResult(aggregated=agg)
    action_ran = False
    if sqlite_path is not None:
        result.rows_loaded = write_sqlite_append(agg, sqlite_path, table_name)
        action_ran = True
    if report_path is not None or compute_pnl:
        metrics = ["total_volume", "total_pnl"] if compute_pnl else ["total_volume"]
        result.report = top_clients(agg, client_type=client_type, top_n=top_n, metrics=metrics)
        if report_path is not None:
            result.report_path = export_report(
                result.report, report_path, add_timestamp=add_timestamp
            )
            action_ran = True
    if diagnose and obs_raw is not None and not action_ran:
        # no sink ran, so no action carried the observations — run one
        # cheap count on the persisted aggregate to materialize them
        agg.count()
        action_ran = True
    if diagnose and obs_raw is not None:
        raw_metrics = obs_raw.get
        result.extras["diagnostics"] = {
            "raw_rows": raw_metrics["rows"],
            "raw_null_cells_by_column": {
                k[len("nulls_"):]: v for k, v in raw_metrics.items()
                if k.startswith("nulls_")
            },
            "cleaned_rows": obs_clean.get["rows"],
        }
    return result


def main(argv: list[str] | None = None) -> None:
    """CLI parity with the reference's ``__main__`` invocation
    (`etl_weekly_trades.py:283-292`): run the full ETL headless.

    Usage: python -m etl_demo_spark.pipelines.weekly_trades \
             --input trades.csv --sqlite out/agg.db [--no-pnl] \
             [--report out/top_clients.xlsx] [--charts out/charts]
    """
    import argparse

    from etl_demo_spark.session import get_spark

    p = argparse.ArgumentParser(description="weekly trades ETL (reference-parity)")
    p.add_argument("--input", required=True)
    p.add_argument("--sqlite", default=None)
    p.add_argument("--table", default="agg_trades_weekly")
    p.add_argument("--no-pnl", action="store_true")
    p.add_argument("--report", default=None)
    p.add_argument("--charts", default=None)
    p.add_argument("--client-type", default="bronze")
    p.add_argument("--top-n", type=int, default=3)
    p.add_argument(
        "--add-timestamp",
        action="store_true",
        help="stamp the report filename with %%Y%%m%%d_%%H%%M%%S "
        "(reference add_timestamp, etl_weekly_trades.py:210-212)",
    )
    args = p.parse_args(argv)

    spark = get_spark(app_name="weekly_trades_etl")
    res = run_etl(
        spark,
        args.input,
        sqlite_path=args.sqlite,
        table_name=args.table,
        compute_pnl=not args.no_pnl,
        report_path=args.report,
        client_type=args.client_type,
        top_n=args.top_n,
        add_timestamp=args.add_timestamp,
    )
    print(f"aggregated groups: {res.aggregated.count()}")
    if args.sqlite:
        print(f"loaded {res.rows_loaded} rows into {args.sqlite}:{args.table}")
    if res.report_path:
        print(f"report: {res.report_path}")
    if args.charts:
        from etl_demo_spark.report import save_charts

        for path in save_charts(res.aggregated, args.charts):
            print(f"chart: {path}")
    # echo the head like the reference does (`etl_weekly_trades.py:292`)
    res.aggregated.show(5, truncate=False)


if __name__ == "__main__":
    main()
