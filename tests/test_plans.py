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


def test_q3_shape_is_takeordered_with_broadcast_dims(spark):
    """shipping_priority: deterministic top-10 must compile to
    TakeOrderedAndProject (per-partition top-k + merge, no global sort)
    with the filtered customer dimension broadcast."""
    p = plan_of(entrymod.queries()["shipping_priority"](spark, SF001))
    assert "TakeOrderedAndProject" in p
    assert "BroadcastHashJoin" in p


def test_groupwise_topk_uses_window_group_limit(spark):
    """top_suppliers_per_nation: the rank<=3 filter must push into the
    window sort as WindowGroupLimit — per-partition heap of size k
    instead of ranking every group member."""
    p = plan_of(entrymod.queries()["top_suppliers_per_nation"](spark, SF001))
    assert "WindowGroupLimit" in p


def test_market_share_broadcasts_every_dimension(spark):
    """nation_market_share joins seven dimension copies; every one must
    broadcast — the only shuffle joins lineitem to orders."""
    p = plan_of(entrymod.queries()["nation_market_share"](spark, SF001))
    assert p.count("BroadcastHashJoin") >= 6
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


def test_funnel_is_two_exchange_plan(spark):
    """event_funnel: one shuffle for the per-user conditional-MIN agg,
    one single-partition exchange for the global rollup — any join or
    per-stage rescan would add exchanges."""
    p = plan_of(entrymod.queries()["event_funnel"](spark, SF001))
    assert p.count("Exchange") <= 2
    assert "Join" not in p


def test_plan_digest_summarizes_flagship(spark):
    """plan_digest must report the flagship's known shape: the two-level
    chunked-sum aggregate (round 10) — one shuffle of per-(group, task)
    long partials plus the tiny per-group combine exchange — no joins,
    pruned scan columns, codegen throughout, no Python."""
    from etl_demo_spark.plans import plan_digest

    d = plan_digest(entrymod.queries()["flagship_weekly_revenue"](spark, SF001))
    assert d.exchanges == 2
    assert d.sort_merge_joins == 0 and d.broadcast_hash_joins == 0
    assert d.python_stages == 0
    assert set(d.read_columns) == {
        "l_shipdate", "l_returnflag", "l_extendedprice", "l_discount", "l_quantity",
    }
    assert d.as_dict()["scans"] == 1


def test_plan_digest_counts_broadcasts(spark):
    from etl_demo_spark.plans import plan_digest

    d = plan_digest(entrymod.queries()["nation_market_share"](spark, SF001))
    assert d.broadcasts >= 6
    assert d.sort_merge_joins <= 1


def test_lateral_decorrelates_to_window_group_limit(spark):
    """The correlated LATERAL + LIMIT subquery must compile to a ranked
    window with WindowGroupLimit (map-side partial top-k) and a broadcast
    join — never a per-row nested-loop re-execution."""
    df = entrymod.queries()["lateral_top_orders_per_customer"](spark, SF001)
    plan = plan_of(df)
    assert "WindowGroupLimit" in plan
    assert "BroadcastHashJoin" in plan
    assert "NestedLoop" not in plan


def test_bm25_filters_before_shuffle_and_takes_ordered(spark):
    """BM25's term filter must reach the scan side (only query-term tokens
    shuffle) and the final top-10 must be TakeOrderedAndProject, not a
    global sort."""
    df = entrymod.queries()["bm25_keyword_search"](spark, SF001)
    plan = plan_of(df)
    assert "TakeOrderedAndProject" in plan
    assert plan.count("BroadcastExchange") >= 2  # dfreq + global stats


def test_pii_scrub_is_shuffle_free(spark):
    """The scrub is a narrow projection: no exchange anywhere."""
    df = entrymod.queries()["doc_pii_scrub"](spark, SF001)
    assert "Exchange" not in plan_of(df)


def test_edit_distance_join_qgram_path_is_equi_join(spark):
    """Both gram-filtered candidate paths (q-gram long bucket, unigram
    short bucket) must plan as equi joins on the gram key (sort-merge or
    hash) — the corpus-sized sides never nested-loop. The ONLY
    CartesianProduct allowed is the tiny bucket (strings of ≤ k chars,
    where every in-band pair is a true result, so the join is
    output-sized)."""
    df = entrymod.queries()["similar_part_names"](spark, SF001)
    plan = plan_of(df)
    gram_joins = sum(
        plan.count(f"{j} [g") for j in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin")
    )
    assert gram_joins >= 2, plan  # q-gram bucket AND unigram short bucket
    assert plan.count("CartesianProduct") <= 1


def test_keyset_page_cursor_pushes_to_scan(spark):
    """keyset_page's decomposed lexicographic cursor must reach the
    parquet scan as PushedFilters (the whole point over OFFSET: the scan
    skips pre-cursor row groups instead of the driver discarding rows)."""
    import datetime

    from etl_demo_spark.ops import keyset_page

    orders = spark.read.parquet(f"{SF001}/orders.parquet")
    df = keyset_page(
        orders.select("o_orderkey", "o_orderdate"),
        ["o_orderdate", "o_orderkey"],
        (datetime.date(1995, 6, 1), 1234),
        20,
    )
    plan = plan_of(df)
    assert "PushedFilters" in plan
    assert "GreaterThan(o_orderdate" in plan and "EqualTo(o_orderdate" in plan
    assert "TakeOrderedAndProject" in plan  # page = top-n, never a global sort


def test_keyset_page_desc_cursor_pushes_to_scan(spark):
    """Mixed-direction cursors (newest-first feeds) must push down the
    same way: the (ts DESC, id ASC) seek predicate decomposes to
    LessThan on the leading key plus EqualTo∧GreaterThan on the tie leg,
    all visible in PushedFilters."""
    import datetime

    from etl_demo_spark.ops import keyset_page

    orders = spark.read.parquet(f"{SF001}/orders.parquet")
    df = keyset_page(
        orders.select("o_orderkey", "o_orderdate"),
        [("o_orderdate", "desc"), ("o_orderkey", "asc")],
        (datetime.date(1995, 6, 1), 1234),
        20,
    )
    # the three-filter disjunction overflows the default 100-char scan
    # metadata truncation — widen it for the assertion only
    key = "spark.sql.maxMetadataStringLength"
    saved = spark.conf.get(key)
    spark.conf.set(key, "2000")
    try:
        plan = plan_of(df)
    finally:
        spark.conf.set(key, saved)
    assert "PushedFilters" in plan
    assert "LessThan(o_orderdate" in plan and "EqualTo(o_orderdate" in plan
    assert "GreaterThan(o_orderkey" in plan
    assert "TakeOrderedAndProject" in plan


def test_runtime_metrics_show_map_side_combine(spark):
    """plans.runtime_metrics walks the AQE-final executed plan: the scan
    must report the true row count, the partial aggregate must collapse
    it to ~|groups| BEFORE the exchange (map-side combine — the property
    that makes hot-key sums skew-immune), and nothing may spill."""
    from etl_demo_spark.plans import metric_total, runtime_metrics

    li = spark.read.parquet(f"{SF001}/lineitem.parquet")
    agg = li.groupBy("l_returnflag").agg(F.sum("l_quantity").alias("q"))
    n_rows = li.count()
    agg.collect()

    m = runtime_metrics(agg)
    scan_rows = [
        x["value"]
        for x in m
        if x["node"].startswith("Scan") and x["metric"] == "number of output rows"
    ]
    assert scan_rows and scan_rows[0] == n_rows
    # shuffle carried pre-aggregated partials, not raw rows
    shuffled = metric_total(m, "shuffle records written")
    n_groups = agg.count()
    assert 0 < shuffled <= n_groups * 32  # ≤ groups × map tasks, ≪ n_rows
    assert shuffled < n_rows / 100
    assert metric_total(m, "spill") == 0
