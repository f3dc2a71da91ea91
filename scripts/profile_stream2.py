"""Variant timing: state-partition count effect on the streaming query."""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from etl_demo_spark.session import get_spark

spark = get_spark(app_name="profile-stream2")

from etl_demo_spark.streaming import (
    hourly_event_stats,
    read_events_stream,
    run_stream_to_memory,
)

spark.read.parquet(os.path.join(sf_dir, "events.parquet")).count()

for parts in (32, 8, 4, 2, 1):
    saved = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(parts))
    times = []
    try:
        for i in range(4):
            t0 = time.perf_counter()
            stream = read_events_stream(spark, sf_dir)
            res = run_stream_to_memory(
                spark, hourly_event_stats(stream), f"p{parts}_{i}"
            )
            times.append(time.perf_counter() - t0)
            spark.catalog.dropTempView(f"p{parts}_{i}")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", saved)
    print(f"parts={parts}: " + " ".join(f"{t:.3f}" for t in times))
