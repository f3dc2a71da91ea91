"""Scaling-curve harness: does throughput hold as data grows?

Materializes 1x / 4x / 16x copies of the sf0.1 lineitem table (key-shifted
unions, so key cardinality scales with volume instead of just duplicating
hot keys), then times three representative plan shapes at each scale:

  * agg_low_card  — scan -> filter -> 2-key hash agg (pricing-summary
    shape: map-side partials collapse everything, shuffle is tiny)
  * agg_high_card — groupBy on l_orderkey (~N distinct keys: the shuffle
    carries the full table; the classic scale stressor)
  * join_sum      — self sort-merge join on l_orderkey + aggregate (big
    shuffle on both sides)

Prints one JSON line with wall seconds and rows/s per (query, scale).
Near-flat rows/s across scales = the plans scale linearly in input size —
the local[32] proxy for "would survive a 100x scale-up"; a super-linear
wall-time curve flags a plan that would not.

Usage: python scripts/bench_scaling.py [--scales 1 4 16] [--keep]
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

SRC = "/root/testdata/sf0.1/lineitem.parquet"


def materialize(spark, scale: int, out: str) -> int:
    from pyspark.sql import functions as F

    base = spark.read.parquet(SRC)
    # shift orderkeys per replica: key cardinality grows with volume
    # (pure duplication would turn the high-card agg into a skew test)
    shift = base.agg(F.max("l_orderkey")).first()[0] + 1
    parts = [
        base.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * shift))
        for i in range(scale)
    ]
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    df.write.mode("overwrite").parquet(out)
    return spark.read.parquet(out).count()


def queries(spark, path: str):
    from pyspark.sql import functions as F

    li = spark.read.parquet(path)

    def agg_low_card():
        return (
            li.filter(F.col("l_shipdate") <= "1998-09-02")
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("sum_qty"),
                F.avg("l_extendedprice").alias("avg_price"),
                F.count(F.lit(1)).alias("n"),
            )
        )

    def agg_high_card():
        return li.groupBy("l_orderkey").agg(
            F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).alias("order_value"),
            F.count(F.lit(1)).alias("n_items"),
        )

    def join_sum():
        a = li.select("l_orderkey", "l_extendedprice")
        b = li.select(F.col("l_orderkey"), F.col("l_quantity"))
        return (
            a.join(b, "l_orderkey")
            .groupBy("l_orderkey")
            .agg(F.count(F.lit(1)).alias("n_pairs"))
            .agg(F.sum("n_pairs").alias("total_pairs"))
        )

    return {"agg_low_card": agg_low_card, "agg_high_card": agg_high_card,
            "join_sum": join_sum}


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--scales", type=int, nargs="+", default=[1, 4, 16])
    p.add_argument("--keep", action="store_true")
    args = p.parse_args()

    from etl_demo_spark.session import get_spark

    spark = get_spark(app_name="bench-scaling")
    workdir = tempfile.mkdtemp(prefix="bench_scaling_")
    results: dict[str, dict] = {}
    try:
        for scale in args.scales:
            out = f"{workdir}/li_{scale}x"
            rows = materialize(spark, scale, out)
            qs = queries(spark, out)
            per_q: dict[str, dict] = {}
            for name, fn in qs.items():
                fn().write.format("noop").mode("overwrite").save()  # warm
                best = float("inf")
                for _ in range(2):
                    t0 = time.perf_counter()
                    fn().write.format("noop").mode("overwrite").save()
                    best = min(best, time.perf_counter() - t0)
                per_q[name] = {
                    "sec": round(best, 3),
                    "rows_per_sec": round(rows / best),
                }
            results[f"{scale}x"] = {"rows": rows, "queries": per_q}
        print(json.dumps({"metric": "scaling_curve", "source": SRC,
                          "results": results}))
    finally:
        if not args.keep:
            shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
