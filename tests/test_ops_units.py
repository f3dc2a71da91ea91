"""Edge-case unit tests (FIXTURES.md §A4) on tiny in-memory frames."""

from __future__ import annotations

import datetime

from pyspark.sql import Row
from pyspark.sql import functions as F

from etl_demo_spark.ops import asof_join, ranked, top_k, week_start
from etl_demo_spark.pnl import transform


def _trades(spark, rows):
    return spark.createDataFrame(
        rows,
        "timestamp timestamp, user_id long, client_type string, symbol string, side string, quantity double, price double",
    )


def test_week_bucket_year_boundary(spark):
    """A Sunday 2023-01-01 trade buckets to Monday 2022-12-26 (reference
    artifact exhibits exactly this week)."""
    df = spark.createDataFrame(
        [
            (datetime.datetime(2023, 1, 1, 23, 59, 59),),
            (datetime.datetime(2023, 1, 2, 0, 0, 0),),
            (datetime.datetime(2022, 12, 26, 0, 0, 0),),
        ],
        "ts timestamp",
    )
    got = [r[0] for r in df.select(week_start("ts")).collect()]
    assert got == [
        datetime.date(2022, 12, 26),
        datetime.date(2023, 1, 2),
        datetime.date(2022, 12, 26),
    ]


def test_sell_only_group_null_chain(spark):
    """Sell-only group: buy_qty 0.0 (pandas sum-of-empty), avg_buy_price /
    realized / unrealized / total NULL (NULL-propagating arithmetic)."""
    df = _trades(
        spark,
        [(datetime.datetime(2023, 3, 1, 10, 0), 1, "gold", "AAPL", "sell", 2.0, 100.0)],
    )
    row = transform(df).collect()[0]
    assert row["buy_qty"] == 0.0
    assert row["sell_qty"] == 2.0
    assert row["sell_value"] == 200.0
    assert row["avg_buy_price"] is None
    assert row["realized_pnl"] is None
    assert row["unrealized_pnl"] is None
    assert row["total_pnl"] is None
    assert row["mark_price"] == 100.0  # latest trade is the sell itself


def test_buy_only_group_zero_realized(spark):
    df = _trades(
        spark,
        [(datetime.datetime(2023, 3, 1, 10, 0), 1, "gold", "AAPL", "buy", 2.0, 100.0),
         (datetime.datetime(2023, 3, 1, 11, 0), 1, "gold", "AAPL", "buy", 2.0, 110.0)],
    )
    row = transform(df).collect()[0]
    assert row["buy_qty"] == 4.0
    assert row["sell_qty"] == 0.0
    assert row["avg_buy_price"] == 105.0
    assert row["realized_pnl"] == 0.0  # sell_value 0.0 - avg*0.0
    assert row["net_qty"] == 4.0
    assert row["mark_price"] == 110.0
    assert row["unrealized_pnl"] == (110.0 - 105.0) * 4.0


def test_mark_price_from_latest_even_if_sell(spark):
    """Mark price is global-latest per symbol, across weeks, sells included
    (reference quirk: computed pre-aggregation, `etl_weekly_trades.py:87`)."""
    df = _trades(
        spark,
        [(datetime.datetime(2023, 3, 1, 10, 0), 1, "gold", "AAPL", "buy", 1.0, 100.0),
         (datetime.datetime(2023, 3, 20, 10, 0), 2, "silver", "AAPL", "sell", 1.0, 123.0)],
    )
    rows = transform(df).collect()
    assert all(r["mark_price"] == 123.0 for r in rows)


def test_average_rank_on_ties(spark):
    """pandas rank(method='average'): tied metric values share the mean of
    their row positions."""
    df = spark.createDataFrame(
        [Row(user_id=1, m=10.0), Row(user_id=2, m=10.0), Row(user_id=3, m=5.0)]
    )
    got = {r["user_id"]: r["rank"] for r in ranked(df, "m").collect()}
    assert got == {1: 1.5, 2: 1.5, 3: 3.0}


def test_top_k_deterministic_ties(spark):
    df = spark.createDataFrame([Row(user_id=u, m=1.0) for u in range(10)])
    got = [r["user_id"] for r in top_k(df, "m", 3, tiebreak=["user_id"]).collect()]
    assert got == [0, 1, 2]


def test_asof_join_nearest_past(spark):
    quotes = spark.createDataFrame(
        [("A", datetime.datetime(2023, 1, 1, 10, 0), 100.0),
         ("A", datetime.datetime(2023, 1, 1, 12, 0), 105.0),
         ("B", datetime.datetime(2023, 1, 1, 11, 0), 50.0)],
        "symbol string, qts timestamp, quote double",
    )
    trades = spark.createDataFrame(
        [("A", datetime.datetime(2023, 1, 1, 11, 0)),   # after 10:00 quote
         ("A", datetime.datetime(2023, 1, 1, 12, 0)),   # exactly at 12:00 quote (<=)
         ("B", datetime.datetime(2023, 1, 1, 10, 0)),   # before any quote -> NULL
         ("B", datetime.datetime(2023, 1, 1, 23, 0))],
        "symbol string, ts timestamp",
    )
    out = asof_join(trades, quotes, on="symbol", left_ts="ts", right_ts="qts", value_cols=["quote"])
    got = {(r["symbol"], r["ts"].hour): r["quote"] for r in out.collect()}
    assert got == {("A", 11): 100.0, ("A", 12): 105.0, ("B", 10): None, ("B", 23): 50.0}


def test_single_pass_pnl_equals_two_scan(spark):
    """Single-pass mark derivation (argmax over per-group argmaxes) must
    equal the two-scan form on the full reference dataset."""
    from etl_demo_spark.clean import clean_trades
    from etl_demo_spark.pipelines.weekly_trades import extract

    cleaned = clean_trades(extract(spark, "/root/reference/trades (1) (2) (1).csv"))
    key = ["week_start_date", "client_type", "user_id", "symbol"]

    def snapshot(df):
        return {
            tuple(str(r[k]) for k in key): tuple(
                r[c] for c in df.columns if c not in key
            )
            for r in df.collect()
        }

    one = snapshot(transform(cleaned, single_pass=True))
    two = snapshot(transform(cleaned, single_pass=False))
    assert one.keys() == two.keys()
    for k in one:
        for a, b in zip(one[k], two[k]):
            if a is None or b is None:
                assert a == b, k
            else:
                assert abs(a - b) < 1e-9 or a == b, k


def test_clean_diagnostics(spark):
    """O-2/O-3/O-5 diagnostics on the reference CSV: null-row count and
    invalid-timestamp listing match the dirty-data contract."""
    from etl_demo_spark.clean import distinct_values, invalid_timestamp_values, null_row_count
    from etl_demo_spark.pipelines.weekly_trades import extract

    raw = extract(spark, "/root/reference/trades (1) (2) (1).csv")
    # 10 dirty rows: 5 with empty timestamp (rest valid) + 5 with
    # timestamp="not_a_date" and empty symbol/quantity/price
    assert null_row_count(raw) == 10
    bad_ts = [r["invalid_raw"] for r in invalid_timestamp_values(raw, "timestamp").collect()]
    assert bad_ts == ["not_a_date"]
    domains = distinct_values(raw, ["client_type", "side"])
    assert set(domains["client_type"]) == {"gold", "silver", "bronze"}
    assert set(domains["side"]) == {"buy", "sell"}


def test_scd2_apply_versions_changed_keys(spark):
    """SCD2 apply: changed keys get their open row closed at the change
    time plus a new open version; unchanged and no-op keys pass through;
    re-applying the same feed is a no-op (idempotent)."""
    import datetime

    from pyspark.sql import functions as F

    from etl_demo_spark.ops import scd2_apply

    t0 = datetime.datetime(2024, 1, 1)
    t1 = datetime.datetime(2024, 2, 1)
    history = spark.createDataFrame(
        [
            (1, "gold", t0, None),     # will change
            (2, "silver", t0, None),   # no-op change arrives
            (3, "bronze", t0, None),   # no change row at all
            (1, "silver", datetime.datetime(2023, 6, 1), t0),  # already closed
        ],
        "k int, tier string, valid_from timestamp, valid_to timestamp",
    )
    changes = spark.createDataFrame(
        [(1, "platinum", t1), (2, "silver", t1)],
        "k int, tier string, ts timestamp",
    )

    def snapshot(df):
        return sorted(
            (r["k"], r["tier"], r["valid_from"], r["valid_to"]) for r in df.collect()
        )

    out = scd2_apply(history, changes, "k", ["tier"])
    got = snapshot(out)
    assert (1, "gold", t0, t1) in got          # closed at change time
    assert (1, "platinum", t1, None) in got    # new open version
    assert (2, "silver", t0, None) in got      # no-op ignored
    assert (3, "bronze", t0, None) in got      # untouched
    assert len(got) == 5

    again = scd2_apply(out, changes, "k", ["tier"])
    assert snapshot(again) == got


def test_operators_survive_empty_inputs(spark):
    """Edge robustness: pipelines and operators must return empty (or
    identity) results on empty inputs, not crash — the behavior a
    scheduled job hits on a quiet partition."""
    from pyspark.sql import functions as F

    from etl_demo_spark.dedup import (
        connected_components,
        exact_dedup_by_fingerprint,
        minhash_lsh_candidates,
    )
    from etl_demo_spark.ops import merge_upsert, scd2_apply

    docs = spark.createDataFrame([], "doc_id long, text string")
    assert exact_dedup_by_fingerprint(docs).count() == 0
    assert minhash_lsh_candidates(docs, num_hashes=8, bands=2).count() == 0

    edges = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(edges).count() == 0

    target = spark.createDataFrame([(1, "a")], "k int, v string")
    empty_src = spark.createDataFrame([], "k int, v string")
    merged = merge_upsert(target, empty_src, ["k"])
    assert [(r["k"], r["v"]) for r in merged.collect()] == [(1, "a")]

    import datetime

    hist = spark.createDataFrame(
        [(1, "x", datetime.datetime(2024, 1, 1), None)],
        "k int, attr string, valid_from timestamp, valid_to timestamp",
    )
    empty_changes = spark.createDataFrame([], "k int, attr string, ts timestamp")
    out = scd2_apply(hist, empty_changes, "k", ["attr"])
    assert out.count() == 1


def test_incremental_agg_merge_equals_full_recompute(spark):
    """Maintaining a weekly aggregate incrementally (stored + new batch)
    must equal recomputing from the full history — counts, exact decimal
    sums, and min/max all merge correctly, including brand-new keys."""
    from pyspark.sql import functions as F

    from etl_demo_spark.io.sources import load_tables
    from etl_demo_spark.ops import incremental_agg_merge, week_start

    li = load_tables(spark, "/root/testdata/sf0.001", tables=("lineitem",))["lineitem"]
    old = li.filter(F.col("l_shipdate") < "1999-01-01")
    new = li.filter(F.col("l_shipdate") >= "1999-01-01")

    def agg(df):
        return df.groupBy(week_start("l_shipdate").alias("wk")).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("qty"),
            F.min("l_extendedprice").alias("min_price"),
            F.max("l_extendedprice").alias("max_price"),
        )

    merged = incremental_agg_merge(
        agg(old), agg(new), ["wk"],
        {"n": "sum", "qty": "sum", "min_price": "min", "max_price": "max"},
    )
    full = agg(li)
    m = {r["wk"]: (r["n"], r["qty"], r["min_price"], r["max_price"]) for r in merged.collect()}
    f = {r["wk"]: (r["n"], r["qty"], r["min_price"], r["max_price"]) for r in full.collect()}
    assert m == f


def test_observed_metrics_ride_the_action(spark):
    """observed() must report row and null counts from the SAME action
    that consumes the frame — no second scan — matching a direct
    computation."""
    from pyspark.sql import functions as F

    from etl_demo_spark.clean import observed

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "c"), (4, None)], "id int, v string"
    )
    out, obs = observed(df)
    n = out.filter(F.col("id") > 0).count()  # one action drives both
    assert n == 4
    got = obs.get
    assert got["rows"] == 4
    assert got["nulls_v"] == 2 and got["nulls_id"] == 0

    # custom metric expressions
    out2, obs2 = observed(df, name="sums", id_sum=F.sum("id"))
    out2.write.format("noop").mode("overwrite").save()
    assert obs2.get["id_sum"] == 10


def test_quality_checks_count_planted_violations(spark):
    """Each expectation counts exactly its planted violations in one pass;
    NULLs violate comparison checks (no three-valued-logic slip-through)."""
    from etl_demo_spark import quality as Q

    df = spark.createDataFrame(
        [
            (1, 10.0, "A"),
            (1, -5.0, "A"),     # dup key + range violation
            (2, None, "B"),     # null qty violates range; bad domain
            (None, 3.0, "A"),   # null key
        ],
        "k long, qty double, flag string",
    )
    rep = {
        r.check: (r.violations, r.total, r.passed)
        for r in Q.run_checks(
            df,
            [
                Q.not_null("k"),
                Q.in_range("qty", 0.0, 100.0),
                Q.in_domain("flag", ("A",)),
            ],
            unique_keys=[["k"]],
        ).collect()
    }
    assert rep["not_null(k)"] == (1, 4, False)
    assert rep["in_range(qty)"] == (2, 4, False)  # -5 and NULL
    assert rep["in_domain(flag)"] == (1, 4, False)
    # 4 rows, 3 distinct k values (1, 2, NULL) -> 1 surplus row
    assert rep["unique_key(k)"] == (1, 4, False)


def test_quality_references_counts_orphans(spark):
    """FK expectation counts non-null orphans only; NULL FKs are the
    not_null check's job, not referential integrity's."""
    from etl_demo_spark import quality as Q

    fact = spark.createDataFrame(
        [(1,), (2,), (2,), (9,), (None,)], "fk long"
    )
    dim = spark.createDataFrame([(1,), (2,)], "pk long")
    row = Q.references(fact, "fk", dim, "pk").collect()[0]
    assert (row.check, row.violations, row.total, row.passed) == (
        "references(fk)", 1, 5, False,
    )


def test_quality_run_suite_matches_run_checks_plus_references(spark):
    """run_suite (one-scan suite: FK folded in via row-preserving join,
    unique key via repartition + two-level agg) must report the IDENTICAL
    rows as the run_checks ∪ references composition it optimizes — on a
    fixture with planted violations of every kind, including a duplicated
    FK value (a non-distinct join side would multiply rows and corrupt
    every other counter)."""
    from etl_demo_spark import quality as Q

    fact = spark.createDataFrame(
        [
            (1, 1, 10.0, 1),
            (1, 1, -5.0, 2),      # dup (k1,k2) + range violation
            (2, 1, None, 9),      # null qty; orphan fk
            (None, 2, 3.0, 2),    # null key; fk ok
            (3, 2, 4.0, None),    # null fk (NOT an orphan)
        ],
        "k1 long, k2 long, qty double, fk long",
    )
    dim = spark.createDataFrame([(1,), (2,), (2,)], "pk long")  # dup pk
    checks = [Q.not_null("k1"), Q.in_range("qty", 0.0, 100.0)]

    legacy = Q.run_checks(fact, checks, unique_keys=[["k1", "k2"]]).unionByName(
        Q.references(fact, "fk", dim, "pk")
    )
    suite = Q.run_suite(
        fact, checks, unique_keys=[["k1", "k2"]], references=[("fk", dim, "pk")]
    )
    as_map = lambda df: {r.check: (r.violations, r.total, r.passed) for r in df.collect()}
    got, want = as_map(suite), as_map(legacy)
    assert got == want
    assert got["unique_key(k1,k2)"] == (1, 5, False)
    assert got["references(fk)"] == (1, 5, False)

    # fallback branch (≠1 unique key) with a folded FK: same rows again
    multi = Q.run_suite(
        fact,
        checks,
        unique_keys=[["k1"], ["k1", "k2"]],
        references=[("fk", dim, "pk")],
    )
    got_multi = as_map(multi)
    assert got_multi["references(fk)"] == (1, 5, False)
    assert got_multi["unique_key(k1,k2)"] == (1, 5, False)
    # k1 values 1,1,2,NULL,3 -> 4 distinct (struct-wrapped: NULL counts) -> 1 surplus
    assert got_multi["unique_key(k1)"] == (1, 5, False)

    # empty table: all zeros / passed, both branches
    empty = spark.createDataFrame([], "k1 long, k2 long, qty double, fk long")
    for uk in ([["k1", "k2"]], [["k1"], ["k2"]]):
        rep = {
            r.check: (r.violations, r.total, r.passed)
            for r in Q.run_suite(
                empty, checks, unique_keys=uk, references=[("fk", dim, "pk")]
            ).collect()
        }
        assert all(v == (0, 0, True) for v in rep.values()), rep


def test_linear_interpolation_edges(spark):
    """Interior gaps interpolate by elapsed-time fraction; leading/trailing
    gaps (missing neighbor) stay NULL; non-gap rows pass through — run
    against the PRODUCTION expression (corpus.interpolate_gaps) on a
    hand-computable fixture."""
    import datetime as dt

    from etl_demo_spark.corpus import interpolate_gaps

    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, base + dt.timedelta(seconds=0), 7, "click", 99.0),   # leading gap
        (2, base + dt.timedelta(seconds=10), 7, "view", 10.0),
        (3, base + dt.timedelta(seconds=13), 7, "click", 99.0),  # 3/10 of the way
        (4, base + dt.timedelta(seconds=20), 7, "view", 30.0),
        (5, base + dt.timedelta(seconds=30), 7, "click", 99.0),  # trailing gap
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    got = {r.event_id: r.interp_value for r in interpolate_gaps(df).collect()}

    assert got[1] is None               # leading gap: no prev neighbor
    assert got[2] == 10.0               # pass-through
    assert got[3] == 10.0 + 20.0 * 0.3  # 3s into a 10s gap from 10 -> 30
    assert got[4] == 30.0
    assert got[5] is None               # trailing gap: no next neighbor


def test_quality_checks_on_empty_table_pass_with_zero_counts(spark):
    """An empty table must report 0 violations / passed=True for every
    constraint (SUM over zero rows is NULL in SQL — the suite must
    coalesce, or a CI gate testing `passed` gets three-valued limbo)."""
    from etl_demo_spark import quality as Q

    df = spark.createDataFrame([], "k long, qty double")
    rep = {
        r.check: (r.violations, r.passed)
        for r in Q.run_checks(
            df, [Q.not_null("k"), Q.in_range("qty", 0.0, 1.0)], unique_keys=[["k"]]
        ).collect()
    }
    assert rep == {
        "not_null(k)": (0, True),
        "in_range(qty)": (0, True),
        "unique_key(k)": (0, True),
    }


def test_asof_join_takes_whole_latest_right_row(spark):
    """A NULL field in the latest right row must come through as NULL —
    not be back-filled from an OLDER right row (per-column fills would
    stitch a row that never existed)."""
    import datetime as dt

    from etl_demo_spark.ops import asof_join

    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)
    left = spark.createDataFrame([("k", t(10))], "sym string, ts timestamp")
    right = spark.createDataFrame(
        [("k", t(1), 100.0, 5.0), ("k", t(5), None, 7.0)],
        "sym string, rts timestamp, px double, qty double",
    )
    row = asof_join(left, right, "sym", "ts", "rts", ["px", "qty"]).collect()[0]
    assert row.px is None and row.qty == 7.0


def test_merge_upsert_applies_null_updates(spark):
    """A matched source row that sets a column to NULL must write NULL
    (real MERGE semantics), not resurrect the target's old value."""
    from etl_demo_spark.ops import merge_upsert

    target = spark.createDataFrame([(1, "old"), (2, "keep")], "id long, val string")
    source = spark.createDataFrame([(1, None), (3, "new")], "id long, val string")
    got = {r.id: r.val for r in merge_upsert(target, source, ["id"]).collect()}
    assert got == {1: None, 2: "keep", 3: "new"}


def test_scd2_apply_inserts_new_keys(spark):
    """A change row for a key with no current history row must insert an
    open version, not vanish."""
    import datetime as dt

    from etl_demo_spark.ops import scd2_apply

    t = lambda d: dt.datetime(2024, 1, d)
    history = spark.createDataFrame(
        [("a", "x", t(1), None)],
        "key string, attr string, valid_from timestamp, valid_to timestamp",
    )
    changes = spark.createDataFrame(
        [("b", "y", t(2))], "key string, attr string, ts timestamp"
    )
    rows = scd2_apply(history, changes, "key", ["attr"]).collect()
    by_key = {(r.key): r for r in rows}
    assert set(by_key) == {"a", "b"}
    assert by_key["b"].attr == "y" and by_key["b"].valid_to is None
    assert by_key["b"].valid_from == t(2)


def test_quality_empty_check_list_returns_empty_report(spark):
    from etl_demo_spark import quality as Q

    df = spark.createDataFrame([(1,)], "k long")
    rep = Q.run_checks(df, [])
    assert rep.count() == 0
    assert [f.name for f in rep.schema.fields] == ["check", "violations", "total", "passed"]


def test_plan_digest_counts_roundrobin_and_nested_struct_columns(spark, tmp_path):
    """RoundRobin repartitions are shuffles and must count; nested-struct
    ReadSchema parsing must not promote inner fields to top-level."""
    from etl_demo_spark.plans import plan_digest

    assert plan_digest(spark.range(100).repartition(8)).exchanges == 1

    p = str(tmp_path / "nested")
    spark.createDataFrame(
        [(1, ("a", 2), 1.5)], "media_id long, meta struct<mime string, n_bytes long>, price double"
    ).write.parquet(p)
    d = plan_digest(spark.read.parquet(p))
    assert set(d.read_columns) == {"media_id", "meta", "price"}


def test_ssum_single_rounds_at_scale_ten(spark):
    """ssum with frac_digits=10 must round ONCE, exactly: the boundary
    residue .0049999999 rounds to 0.00 (a capped scale-6 quotient would
    double-round it to 0.01), and true half-ties still round up."""
    import pyspark.sql.functions as F

    from etl_demo_spark.corpus import ssum

    def one(x, frac):
        return (
            spark.createDataFrame([(x,)], "x long")
            .agg(ssum(F.col("x"), frac).alias("v"))
            .collect()[0].v
        )

    assert one(49_999_999, 10) == 0.0
    assert one(50_000_000, 10) == 0.01
    assert one(123_456_789_012_345, 6) == 123_456_789.01


def test_gap_islands_with_planted_gaps(spark):
    """The islands expression splits at every missing key (the fixture
    orderkeys are dense, so the corpus query yields one island — this
    fixture proves the split logic on real gaps, against the PRODUCTION
    helper)."""
    from etl_demo_spark.corpus import gap_islands

    keys = [1, 2, 3, 7, 8, 15]
    k = spark.createDataFrame([(x,) for x in keys], "o_orderkey long")
    got = sorted(
        (r.island_start, r.island_end, r.island_len)
        for r in gap_islands(k).collect()
    )
    assert got == [(1, 3, 3), (7, 8, 2), (15, 15, 1)]


def test_interval_overlap_join_equals_brute_force(spark):
    """Bucket-decomposed range join == the non-equi brute-force join,
    including intervals spanning MANY buckets (the exactly-once emission
    rule must dedup multi-bucket matches without a distinct)."""
    from etl_demo_spark.ops import interval_overlap_join

    left = spark.createDataFrame(
        [(1, 0, 250), (2, 90, 110), (3, 400, 401), (4, 95, 705)],
        "lid int, a_st long, a_en long",
    )
    right = spark.createDataFrame(
        [(10, 100, 120), (11, 240, 260), (12, 390, 520), (13, 700, 800),
         (14, 0, 1000)],
        "rid int, b_st long, b_en long",
    )
    got = {
        (r.lid, r.rid)
        for r in interval_overlap_join(
            left, right, "a_st", "a_en", "b_st", "b_en", bucket_width=100
        ).collect()
    }
    want = {
        (r.lid, r.rid)
        for r in left.join(
            right,
            (F.col("a_st") <= F.col("b_en")) & (F.col("b_st") <= F.col("a_en")),
        ).collect()
    }
    assert got == want and len(got) > 0
    # every pair exactly once, even for the bucket-spanning (4, 14) pair
    rows = interval_overlap_join(
        left, right, "a_st", "a_en", "b_st", "b_en", bucket_width=100
    ).groupBy("lid", "rid").count().collect()
    assert all(r["count"] == 1 for r in rows)


def test_interval_overlap_join_plan_has_no_nested_loop(spark):
    """The whole point: the range predicate must run inside a shuffled
    equi-join on the bucket id, never a BroadcastNestedLoop/cartesian."""
    from etl_demo_spark.ops import interval_overlap_join

    left = spark.range(100).select(
        F.col("id").alias("lid"), (F.col("id") * 10).alias("a_st"),
        (F.col("id") * 10 + 5).alias("a_en"))
    right = spark.range(100).select(
        F.col("id").alias("rid"), (F.col("id") * 7).alias("b_st"),
        (F.col("id") * 7 + 3).alias("b_en"))
    j = interval_overlap_join(left, right, "a_st", "a_en", "b_st", "b_en", 16)
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan[:1500]


def test_interval_overlap_join_rejects_shared_columns(spark):
    import pytest as _pytest

    from etl_demo_spark.ops import interval_overlap_join

    df = spark.createDataFrame([(1, 2)], "s long, e long")
    with _pytest.raises(ValueError, match="disjoint"):
        interval_overlap_join(df, df, "s", "e", "s", "e", 10)


def test_point_in_interval_join_matches_brute_force(spark):
    from etl_demo_spark.ops import point_in_interval_join

    pts = spark.createDataFrame(
        [(1, 50), (2, 105), (3, 700), (4, 0)], "pid int, p long"
    )
    ivs = spark.createDataFrame(
        [(10, 0, 99), (11, 100, 250), (12, 90, 710), (13, 701, 800)],
        "iid int, st long, en long",
    )
    got = {
        (r.pid, r.iid)
        for r in point_in_interval_join(pts, ivs, "p", "st", "en", 64).collect()
    }
    want = {
        (r.pid, r.iid)
        for r in pts.join(
            ivs, (F.col("st") <= F.col("p")) & (F.col("p") <= F.col("en"))
        ).collect()
    }
    assert got == want and len(got) >= 5


def test_weighted_sample_matches_python_reference(spark):
    """ops.weighted_sample == an exact Python replica of A-Res with the
    same md5-derived uniforms; weight<=0/NULL rows are excluded; an
    overwhelming weight dominates the sample across seeds."""
    import hashlib

    from pyspark.sql import Row

    from etl_demo_spark.ops import weighted_sample

    rows = [Row(id=i, w=float(1 + (i % 7))) for i in range(50)]
    rows += [Row(id=100, w=None), Row(id=101, w=0.0), Row(id=102, w=-3.0)]
    df = spark.createDataFrame(rows)

    def py_sample(items, n, seed):
        keyed = []
        for i, w in items:
            if w is None or w <= 0:
                continue
            h = int(hashlib.md5(f"{i}{seed}".encode()).hexdigest()[:8], 16)
            u = (h + 0.5) / 2**32
            keyed.append((u ** (1.0 / w), -i))
        keyed.sort(reverse=True)
        return [-neg for _, neg in keyed[:n]]

    for seed in ("", "a", "b"):
        got = [
            r.id
            for r in weighted_sample(df, "w", 10, "id", seed=seed).collect()
        ]
        want = py_sample([(r.id, r.w) for r in rows], 10, seed)
        assert sorted(got) == sorted(want), seed
        assert not {100, 101, 102} & set(got)

    # a dominating weight is drawn with probability ~1 under any seed
    df2 = df.unionByName(spark.createDataFrame([Row(id=999, w=1e9)]))
    for seed in ("", "a", "b", "c", "d"):
        ids = {r.id for r in weighted_sample(df2, "w", 5, "id", seed=seed).collect()}
        assert 999 in ids, seed


def test_stratified_exact_sample_counts_and_determinism(spark):
    """Exactly n per stratum (capped by stratum size), identical picks on
    re-run, different picks under a different seed (overwhelmingly)."""
    from pyspark.sql import Row

    from etl_demo_spark.ops import stratified_exact_sample

    rows = [Row(id=i, g=("a" if i % 3 == 0 else "b" if i % 3 == 1 else "c")) for i in range(60)]
    rows += [Row(id=1000, g="tiny")]  # stratum smaller than n
    df = spark.createDataFrame(rows)
    s1 = stratified_exact_sample(df, ["g"], 5, "id", seed="x").collect()
    from collections import Counter

    counts = Counter(r.g for r in s1)
    assert counts == {"a": 5, "b": 5, "c": 5, "tiny": 1}
    s2 = stratified_exact_sample(df, ["g"], 5, "id", seed="x").collect()
    assert sorted(r.id for r in s1) == sorted(r.id for r in s2)
    s3 = stratified_exact_sample(df, ["g"], 5, "id", seed="y").collect()
    assert sorted(r.id for r in s1) != sorted(r.id for r in s3)


def test_cache_scope_tokens(spark):
    """Scoped release: a unit-of-work boundary releasing its own token
    must not demote another unit's still-tracked caches; the no-arg
    release clears everything (documented single-threaded default)."""
    from etl_demo_spark.cache import release_persisted, tracked_persist

    release_persisted()  # clean slate
    a = tracked_persist(spark.range(10).toDF("x"), scope="unit_a")
    b = tracked_persist(spark.range(20).toDF("x"), scope="unit_b")
    c = tracked_persist(spark.range(30).toDF("x"))  # default pool
    a.count(), b.count(), c.count()
    assert release_persisted("unit_a") == 1
    assert b.storageLevel.useMemory  # unit_b untouched
    assert c.storageLevel.useMemory
    assert release_persisted() == 2  # b + default pool
    assert not b.storageLevel.useMemory


def test_pagerank_exact_hand_computed_and_partition_invariant(spark):
    """ops.pagerank_exact: (a) matches a hand-computed 3-node fixpoint
    (integer transfers, floor divisions); (b) bit-identical under wildly
    different edge partitioning — the property that lets the DuckDB
    recursive-CTE oracle replay the distributed run exactly."""
    from pyspark.sql import functions as F

    from etl_demo_spark.ops import pagerank_exact

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 1)], "src LONG, dst LONG"
    )
    # iter1: m = {1:1e6, 2:5e5, 3:15e5} -> pr {1:1000000, 2:575000, 3:1425000}
    # iter2: m = {1:1425000, 2:500000, 3:1075000}
    #        pr {1: 150000+1211250, 2: 575000, 3: 150000+913750}
    got = {r.node: r.pr for r in pagerank_exact(edges, n_iter=2).collect()}
    assert got == {1: 1361250, 2: 575000, 3: 1063750}

    scrambled = {
        r.node: r.pr
        for r in pagerank_exact(edges.repartition(7), n_iter=2).collect()
    }
    assert scrambled == got

    # duplicate edges collapse (distinct) — same fixpoint
    doubled = edges.unionByName(edges)
    assert {
        r.node: r.pr for r in pagerank_exact(doubled, n_iter=2).collect()
    } == got


def test_gap_fill_interpolate_linear_and_locf(spark):
    """Dense spine per key; interior gaps interpolate linearly (exact
    thirds on an integer series), leading/trailing gaps stay NULL under
    linear but carry forward under locf; observed rows pass through."""
    import datetime

    from pyspark.sql import functions as F

    from etl_demo_spark.ops import gap_fill_interpolate

    t0 = datetime.datetime(2024, 1, 1, 0)

    def h(n):
        return t0 + datetime.timedelta(hours=n)

    rows = [
        ("a", h(1), 10.0),   # leading gap at h0 is OUTSIDE bounds (min=h1)
        ("a", h(4), 40.0),   # h2,h3 interior gap
        ("a", h(5), None),   # observed NULL == gap
        ("a", h(7), 70.0),
        ("b", h(0), 5.0),
        ("b", h(2), 5.0),
    ]
    df = spark.createDataFrame(rows, "k STRING, bucket TIMESTAMP, v DOUBLE")

    lin = {
        (r["k"], r["bucket"].hour): (r["value_filled"], r["interpolated"])
        for r in gap_fill_interpolate(df, ["k"], "bucket", "v").collect()
    }
    assert lin[("a", 1)] == (10.0, False)
    assert lin[("a", 2)] == (20.0, True)
    assert lin[("a", 3)] == (30.0, True)
    assert lin[("a", 4)] == (40.0, False)
    assert lin[("a", 5)] == (50.0, True)   # NULL observation interpolates
    assert lin[("a", 6)] == (60.0, True)
    assert lin[("a", 7)] == (70.0, False)
    assert lin[("b", 1)] == (5.0, True)
    assert len([k for k in lin if k[0] == "a"]) == 7  # dense h1..h7

    # trailing gap: drop the h7 anchor -> h5,h6 have no next bracket
    lin2 = {
        (r["k"], r["bucket"].hour): (r["value_filled"], r["interpolated"])
        for r in gap_fill_interpolate(
            df.filter("v IS NULL OR v < 65"), ["k"], "bucket", "v"
        ).collect()
    }
    assert lin2[("a", 5)] == (None, False)

    locf = {
        (r["k"], r["bucket"].hour): (r["value_filled"], r["interpolated"])
        for r in gap_fill_interpolate(
            df, ["k"], "bucket", "v", method="locf"
        ).collect()
    }
    assert locf[("a", 2)] == (10.0, True)
    assert locf[("a", 6)] == (40.0, True)  # carried, not interpolated

    import pytest

    with pytest.raises(ValueError, match="unknown method"):
        gap_fill_interpolate(df, ["k"], "bucket", "v", method="spline")


def test_merge_clauses_edges(spark):
    """ops.merge_clauses edge semantics: NULL conditions never delete,
    duplicate source keys refuse, insert=False keeps matched rows under
    update semantics replaced but adds nothing."""
    import pytest as _pytest

    from etl_demo_spark.ops import merge_clauses

    t = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 30.0)], "k INT, v DOUBLE"
    )
    s = spark.createDataFrame([(2, 99.0), (4, 40.0)], "k INT, v DOUBLE")
    # NULL cond (v > 20 over v=NULL) must NOT delete row 2
    out = {
        tuple(r)
        for r in merge_clauses(
            t, s, ["k"], when_matched="delete", matched_cond="v > 20",
            insert=False,
        ).collect()
    }
    assert out == {(1, 10.0), (2, None), (3, 30.0)}
    # update without insert: matched replaced, nothing added
    out = {
        tuple(r)
        for r in merge_clauses(t, s, ["k"], insert=False).collect()
    }
    assert out == {(1, 10.0), (2, 99.0), (3, 30.0)}
    # NMBS with condition deletes only cond-true unmatched rows
    out = {
        tuple(r)
        for r in merge_clauses(
            t, s, ["k"], nmbs_delete=True, nmbs_cond="v >= 30",
        ).collect()
    }
    assert out == {(1, 10.0), (2, 99.0), (4, 40.0)}
    dup = spark.createDataFrame([(2, 1.0), (2, 2.0)], "k INT, v DOUBLE")
    with _pytest.raises(ValueError, match="duplicate source keys"):
        merge_clauses(t, dup, ["k"])
