"""Physical-plan assertions: the scale posture must be visible in the plan.

These guard the properties that matter at 100 TB — column pruning into the
parquet scan, filter pushdown, broadcast joins for dimensions, top-k as
TakeOrderedAndProject (never a global sort) — so a refactor that silently
regresses the plan fails CI, not the cluster."""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as entrymod

SF001 = "/root/testdata/sf0.01"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_flagship_prunes_columns(spark):
    df = entrymod.queries()["flagship_weekly_revenue"](spark, SF001)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # scan must read only the 4 referenced columns, not all 11
    assert "l_shipdate" in plan and "l_extendedprice" in plan
    assert "l_suppkey" not in plan and "l_orderkey" not in plan


def test_filter_pushdown_reaches_scan(spark):
    li = spark.read.parquet(f"{SF001}/lineitem.parquet")
    df = li.filter(F.col("l_quantity") > 45).select("l_orderkey", "l_quantity")
    plan = plan_of(df)
    assert "PushedFilters" in plan and "GreaterThan(l_quantity" in plan


def test_dimension_join_broadcasts(spark):
    df = entrymod.queries()["segment_revenue"](spark, SF001)
    assert "BroadcastHashJoin" in plan_of(df)


def test_topk_is_take_ordered(spark):
    df = entrymod.queries()["top_orders"](spark, SF001)
    assert "TakeOrderedAndProject" in plan_of(df)


def test_semi_anti_join_operators(spark):
    semi = entrymod.queries()["customers_with_open_orders"](spark, SF001)
    anti = entrymod.queries()["customers_without_orders"](spark, SF001)
    assert "LeftSemi" in plan_of(semi)
    assert "LeftAnti" in plan_of(anti)


def test_no_python_udf_in_relational_hot_path(spark):
    """Relational + dedup corpus queries stay JVM-side: no Python eval
    operators in their plans (the Python stages are only lang_id /
    media_features / stateful, by design)."""
    jvm_only = [
        "flagship_weekly_revenue", "pricing_summary", "regional_revenue",
        "orders_running_total", "weekly_trades_pnl", "exact_dedup_fingerprint",
        "minhash_near_dup", "ann_topk_bruteforce", "doc_quality",
    ]
    q = entrymod.queries()
    for name in jvm_only:
        plan = plan_of(q[name](spark, SF001))
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, name


def test_weekly_pnl_mark_join_broadcasts(spark):
    df = entrymod.queries()["weekly_trades_pnl"](spark, SF001)
    assert "BroadcastHashJoin" in plan_of(df)
