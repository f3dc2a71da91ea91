from etl_demo_spark.pipelines.weekly_trades import run_etl

__all__ = ["run_etl"]
