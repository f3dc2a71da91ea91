"""Bucketed layout (io/bucketed.py): hash-clustered catalog tables whose
joins and aggregations on the bucket key run with ZERO exchange."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _mk(spark, tmp_path, name: str, df, n: int, sort=None):
    from etl_demo_spark.io.bucketed import write_bucketed

    spark.sql(f"DROP TABLE IF EXISTS {name}")
    write_bucketed(
        df, name, "okey", n, sort_cols=sort, path=str(tmp_path / name)
    )


@pytest.fixture()
def no_broadcast(spark):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_and_agg_shuffle_free(spark, tmp_path, no_broadcast):
    from etl_demo_spark.io.bucketed import assert_no_shuffle_join, read_bucketed

    orders = spark.range(1000).select(
        F.col("id").alias("okey"), (F.col("id") % 7).alias("pri")
    )
    items = spark.range(5000).select(
        (F.col("id") % 1000).alias("okey"), (F.col("id") * 2).alias("qty")
    )
    _mk(spark, tmp_path, "tb_orders", orders, 8, sort="okey")
    _mk(spark, tmp_path, "tb_items", items, 8, sort="okey")

    j = read_bucketed(spark, "tb_orders").join(read_bucketed(spark, "tb_items"), "okey")
    assert_no_shuffle_join(j, sides=2)
    assert j.count() == 5000

    # aggregation on the bucket key: partial+final collapse, no exchange
    agg = read_bucketed(spark, "tb_items").groupBy("okey").agg(F.sum("qty").alias("s"))
    assert "Exchange hashpartitioning" not in _plan(agg)
    assert agg.count() == 1000

    # correctness: identical to the unbucketed join
    plain = orders.join(items, "okey").groupBy("pri").count()
    bucketed = (
        read_bucketed(spark, "tb_orders")
        .join(read_bucketed(spark, "tb_items"), "okey")
        .groupBy("pri")
        .count()
    )
    assert {tuple(r) for r in plain.collect()} == {
        tuple(r) for r in bucketed.collect()
    }


def test_bucketed_coalesce_mismatched_counts(spark, tmp_path, no_broadcast):
    """8-bucket ⋈ 4-bucket: with coalesceBucketsInJoin the larger side's
    buckets pair down and the join still runs exchange-free — the knob
    that lets two pipelines with different sizing still co-join."""
    from etl_demo_spark.io.bucketed import assert_no_shuffle_join, read_bucketed

    prev = spark.conf.get("spark.sql.bucketing.coalesceBucketsInJoin.enabled")
    spark.conf.set("spark.sql.bucketing.coalesceBucketsInJoin.enabled", "true")
    try:
        a = spark.range(400).select(F.col("id").alias("okey"))
        b = spark.range(800).select((F.col("id") % 400).alias("okey"))
        _mk(spark, tmp_path, "tb_a8", a, 8)
        _mk(spark, tmp_path, "tb_b4", b, 4)
        j = read_bucketed(spark, "tb_a8").join(read_bucketed(spark, "tb_b4"), "okey")
        assert_no_shuffle_join(j, sides=2)
        assert j.count() == 800
    finally:
        spark.conf.set("spark.sql.bucketing.coalesceBucketsInJoin.enabled", prev)


def test_one_sided_bucketing_shuffles_only_other_side(spark, tmp_path, no_broadcast):
    from etl_demo_spark.io.bucketed import assert_no_shuffle_join, read_bucketed

    a = spark.range(400).select(F.col("id").alias("okey"))
    _mk(spark, tmp_path, "tb_one", a, 8)
    other = spark.range(800).select((F.col("id") % 400).alias("okey"))
    j = read_bucketed(spark, "tb_one").join(other, "okey")
    assert_no_shuffle_join(j, sides=1)  # exactly the unbucketed side moves
    with pytest.raises(AssertionError, match="expected <= 0"):
        assert_no_shuffle_join(j, sides=2)
    assert j.count() == 800


def test_write_bucketed_validates(spark, tmp_path):
    from etl_demo_spark.io.bucketed import write_bucketed

    with pytest.raises(ValueError, match="num_buckets"):
        write_bucketed(spark.range(3), "tb_bad", "id", 0)
