from etl_demo_spark.io.sources import load_tables, read_csv, read_json, read_parquet
from etl_demo_spark.io.sinks import write_parquet, write_sqlite_append

__all__ = [
    "load_tables",
    "read_csv",
    "read_json",
    "read_parquet",
    "write_parquet",
    "write_sqlite_append",
]
