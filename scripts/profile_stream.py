"""One-off profiling harness for the stream_hourly_event_stats regression.

Times each component of the streaming query separately at sf0.1:
  - the batch schema probe in read_events_stream
  - the streaming execution itself (availableNow -> memory sink)
  - repeated runs (memory-table accumulation effect)
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from etl_demo_spark.session import get_spark

spark = get_spark(app_name="profile-stream")

from etl_demo_spark.streaming import (
    hourly_event_stats,
    read_events_stream,
    run_stream_to_memory,
)

# warm-up
spark.read.parquet(os.path.join(sf_dir, "events.parquet")).count()

# 1. schema probe cost
for i in range(3):
    t0 = time.perf_counter()
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    _ = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema["ts"].dataType
    print(f"schema_probe[{i}]: {time.perf_counter()-t0:.3f}s")

# 2. full streaming run, repeated 6x to see accumulation
for i in range(6):
    t0 = time.perf_counter()
    stream = read_events_stream(spark, sf_dir)
    t1 = time.perf_counter()
    res = run_stream_to_memory(spark, hourly_event_stats(stream), f"prof_{i}")
    t2 = time.perf_counter()
    n = res.count()
    print(
        f"run[{i}]: read_stream={t1-t0:.3f}s exec={t2-t1:.3f}s rows={n}"
    )

# 3. drop the memory tables, run again
for i in range(6):
    spark.catalog.dropTempView(f"prof_{i}")
for i in range(3):
    t0 = time.perf_counter()
    stream = read_events_stream(spark, sf_dir)
    res = run_stream_to_memory(spark, hourly_event_stats(stream), f"prof2_{i}")
    print(f"after_drop[{i}]: total={time.perf_counter()-t0:.3f}s")
    spark.catalog.dropTempView(f"prof2_{i}")
