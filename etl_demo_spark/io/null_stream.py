"""Minimal Python-DataSource streaming source: ONE 1-int row per run.

This is a MEASUREMENT CONTROL, not a data source. Spark's Python
DataSource streaming machinery pays a fixed per-query-START cost (spawn
of the driver-side planning worker, handshake, offset exchange) that no
repo code can remove. This source does the least work the API allows —
so an availableNow run of it measures that engine floor directly, and
the bench can report `tablestream start cost − floor` as the part the
repo actually owns (round-11 ask: make the floor claim reproducible by
the driver instead of a builder-session anecdote).

Self-contained by design: pickled BY VALUE via io.pyds.register (only
pyspark + stdlib needed at unpickle time in the planning worker).
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)


class NullStreamReader(DataSourceStreamReader):
    def initialOffset(self) -> dict:
        return {"i": 0}

    def latestOffset(self) -> dict:
        return {"i": 1}

    def partitions(self, start: dict, end: dict) -> list:
        if start.get("i", 0) >= end.get("i", 0):
            return []
        return [InputPartition(0)]

    def read(self, partition):
        yield (1,)

    def commit(self, end: dict) -> None:
        pass


class NullStreamDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "nullstream"

    def schema(self) -> str:
        return "v INT"

    def streamReader(self, schema) -> NullStreamReader:
        return NullStreamReader()


def register_null_stream_source(spark) -> None:
    from etl_demo_spark.io.pyds import register_data_source

    register_data_source(spark, NullStreamDataSource)
