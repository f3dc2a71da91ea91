"""SQL DML through catalog names (`catalog_sql`): INSERT / MERGE /
UPDATE / DELETE route through the manifested committers, flip the
catalog pin atomically, and refresh the registered views."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def cat(spark, tmp_path):
    from etl_demo_spark.io.catalog import catalog_init
    from etl_demo_spark.io.manifest import write_manifested

    orders = spark.createDataFrame(
        [
            (1, "A", 10.0, "2026-01"),
            (2, "B", 20.0, "2026-01"),
            (3, "A", 30.0, "2026-02"),
        ],
        "ok INT, cust STRING, price DOUBLE, month STRING",
    )
    feed = spark.createDataFrame(
        [(4, "C", 40.0, "2026-02"), (2, "B", 25.0, "2026-01")],
        "ok INT, cust STRING, price DOUBLE, month STRING",
    )
    o_root, f_root = str(tmp_path / "orders"), str(tmp_path / "feed")
    write_manifested(orders, o_root, "month")
    write_manifested(feed, f_root, "month")
    cat_root = str(tmp_path / "cat")
    catalog_init(spark, cat_root, {"orders": o_root, "feed": f_root})
    return cat_root


def _rows(spark):
    return {
        tuple(r)
        for r in spark.table("orders")
        .select("ok", "cust", "price", "month")
        .collect()
    }


def test_insert_values_positional_cast(spark, cat):
    from etl_demo_spark.io.catalog import catalog_sql, catalog_snapshot

    v = catalog_sql(
        spark, cat, "INSERT INTO orders VALUES (9, 'Z', 90, '2026-03')"
    )
    assert v == 2
    assert (9, "Z", 90.0, "2026-03") in _rows(spark)  # int 90 cast to DOUBLE
    # the pin flipped: a fresh snapshot reads the row too
    got = catalog_snapshot(spark, cat).read("orders")
    assert got.where("ok = 9").count() == 1


def test_insert_select_from_sibling_view(spark, cat):
    from etl_demo_spark.io.catalog import catalog_sql

    catalog_sql(
        spark,
        cat,
        "INSERT INTO orders (ok, cust, price, month) "
        "SELECT ok + 100, cust, price * 2, month FROM feed WHERE ok = 4",
    )
    assert (104, "C", 80.0, "2026-02") in _rows(spark)


def test_merge_upsert_shape(spark, cat):
    from etl_demo_spark.io.catalog import catalog_sql

    catalog_sql(
        spark,
        cat,
        "MERGE INTO orders t USING (SELECT * FROM feed) s ON t.ok = s.ok "
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *",
    )
    rows = _rows(spark)
    assert (2, "B", 25.0, "2026-01") in rows  # matched: updated
    assert (4, "C", 40.0, "2026-02") in rows  # not matched: inserted
    assert (2, "B", 20.0, "2026-01") not in rows
    assert len(rows) == 4


def test_update_and_delete(spark, cat):
    from etl_demo_spark.io.catalog import catalog_sql

    catalog_sql(
        spark, cat,
        "UPDATE orders SET price = price + 1, cust = upper(cust) "
        "WHERE month = '2026-01'",
    )
    assert (1, "A", 11.0, "2026-01") in _rows(spark)
    assert (3, "A", 30.0, "2026-02") in _rows(spark)  # untouched
    catalog_sql(spark, cat, "DELETE FROM orders WHERE price >= 21")
    assert {r[0] for r in _rows(spark)} == {1}


def test_unsupported_and_unknown_raise(spark, cat):
    from etl_demo_spark.io.catalog import catalog_sql

    with pytest.raises(ValueError, match="unsupported statement"):
        catalog_sql(spark, cat, "TRUNCATE TABLE orders")
    with pytest.raises(ValueError, match="not a member"):
        catalog_sql(spark, cat, "DELETE FROM nope WHERE 1=1")
    with pytest.raises(ValueError, match="every table column"):
        catalog_sql(spark, cat, "INSERT INTO orders (ok) SELECT 1")
    # malformed merge clauses are refused, not silently half-applied
    # (MATCHED THEN DELETE itself is supported since round 10)
    with pytest.raises(ValueError, match="unsupported MERGE clause"):
        catalog_sql(
            spark, cat,
            "MERGE INTO orders t USING feed s ON t.ok = s.ok "
            "WHEN MATCHED THEN EXPLODE",
        )


def test_prefixed_views_and_pin_consistency(spark, cat):
    from etl_demo_spark.io.catalog import catalog_sql, catalog_versions

    v0 = catalog_versions(spark, cat)[-1]
    catalog_sql(
        spark,
        cat,
        "INSERT INTO feed SELECT ok, cust, price, month FROM c_orders "
        "WHERE ok = 1",
        prefix="c_",
    )
    assert catalog_versions(spark, cat)[-1] == v0 + 1
    assert spark.table("c_feed").where("ok = 1").count() == 1


def test_txn_two_statements_one_flip(spark, cat):
    from etl_demo_spark.io.catalog import (
        catalog_snapshot,
        catalog_sql_txn,
        catalog_versions,
    )

    pre = catalog_snapshot(spark, cat)
    v0 = catalog_versions(spark, cat)[-1]
    cv = catalog_sql_txn(
        spark,
        cat,
        [
            "INSERT INTO orders (ok, cust, price, month) "
            "SELECT ok + 500, cust, price, month FROM feed",
            "DELETE FROM feed WHERE ok = 2",
        ],
    )
    # TWO table commits (one per table), ONE catalog flip
    assert cv == v0 + 1 and catalog_versions(spark, cat)[-1] == cv
    ids = {r[0] for r in spark.table("orders").select("ok").collect()}
    assert {502, 504} <= ids
    assert spark.table("feed").where("ok = 2").count() == 0
    # the pre-txn snapshot (each table one version back — retained)
    # still reads the untouched state of BOTH tables: all-or-nothing
    assert pre.read("orders").where("ok >= 500").count() == 0
    assert pre.read("feed").where("ok = 2").count() == 1


def test_txn_same_table_statements_compose_sequentially(spark, cat):
    from etl_demo_spark.io.catalog import catalog_sql_txn

    catalog_sql_txn(
        spark,
        cat,
        [
            "INSERT INTO orders VALUES (700, 'T', 5.0, '2026-07')",
            "INSERT INTO orders VALUES (701, 'T', 6.0, '2026-07')",
            "DELETE FROM orders WHERE ok = 700",
        ],
    )
    ids = {r[0] for r in spark.table("orders").select("ok").collect()}
    assert 701 in ids and 700 not in ids  # DELETE saw the first INSERT


def test_txn_read_your_own_writes(spark, cat):
    from etl_demo_spark.io.catalog import catalog_snapshot, catalog_sql_txn

    # BEGIN…COMMIT contract: statement 2's SELECT source sees statement
    # 1's insert (read-your-own-writes) — exactly once — while outside
    # readers see neither until the single pin flip
    pre = catalog_snapshot(spark, cat)
    catalog_sql_txn(
        spark,
        cat,
        [
            "INSERT INTO orders VALUES (900, 'X', 1.0, '2026-09')",
            "INSERT INTO feed (ok, cust, price, month) "
            "SELECT ok + 1000, cust, price, month FROM orders WHERE ok >= 900",
        ],
    )
    assert spark.table("orders").where("ok = 900").count() == 1
    assert spark.table("feed").where("ok = 1900").count() == 1
    # the pre-txn snapshot saw neither side: all-or-nothing held
    assert pre.read("orders").where("ok = 900").count() == 0
    assert pre.read("feed").where("ok >= 1900").count() == 0


def test_txn_empty_refused(spark, cat):
    from etl_demo_spark.io.catalog import catalog_sql_txn

    with pytest.raises(ValueError, match="empty statement list"):
        catalog_sql_txn(spark, cat, [])


def test_merge_when_matched_delete(spark, cat):
    """Round-10 clause family: WHEN MATCHED THEN DELETE removes exactly
    the source-keyed rows; WHEN NOT MATCHED THEN INSERT * still lands
    the new keys — one atomic commit + pin flip."""
    from etl_demo_spark.io.catalog import catalog_sql

    catalog_sql(
        spark, cat,
        "MERGE INTO orders t USING feed s ON t.ok = s.ok "
        "WHEN MATCHED THEN DELETE "
        "WHEN NOT MATCHED THEN INSERT *",
    )
    got = _rows(spark)
    assert (2, "B", 20.0, "2026-01") not in got, "matched key not deleted"
    assert (4, "C", 40.0, "2026-02") in got, "unmatched source not inserted"
    assert {(1, "A", 10.0, "2026-01"), (3, "A", 30.0, "2026-02")} <= got


def test_merge_matched_delete_with_condition(spark, cat):
    """WHEN MATCHED AND cond THEN DELETE: the condition scopes the
    delete to target rows where it is TRUE; NULL/false survive."""
    from etl_demo_spark.io.catalog import catalog_sql

    catalog_sql(
        spark, cat,
        "MERGE INTO orders t USING (SELECT 1 AS ok UNION ALL SELECT 2) s "
        "ON t.ok = s.ok "
        "WHEN MATCHED AND t.price < 15 THEN DELETE",
    )
    got = _rows(spark)
    assert (1, "A", 10.0, "2026-01") not in got, "cond-true row survived"
    assert (2, "B", 20.0, "2026-01") in got, "cond-false row deleted"
    assert (3, "A", 30.0, "2026-02") in got


def test_merge_not_matched_by_source_delete_syncs(spark, cat):
    """UPDATE SET * + INSERT * + NOT MATCHED BY SOURCE DELETE = full
    snapshot sync: after the statement the target IS the source."""
    from etl_demo_spark.io.catalog import catalog_sql, catalog_snapshot

    catalog_sql(
        spark, cat,
        "MERGE INTO orders t USING feed s ON t.ok = s.ok "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT * "
        "WHEN NOT MATCHED BY SOURCE THEN DELETE",
    )
    got = _rows(spark)
    assert got == {
        (4, "C", 40.0, "2026-02"),
        (2, "B", 25.0, "2026-01"),
    }, got
    # time travel still serves the pre-sync state
    pre = catalog_snapshot(spark, cat, version=1).read("orders")
    assert pre.count() == 3


def test_merge_insert_only_and_refusals(spark, cat):
    from etl_demo_spark.io.catalog import catalog_sql

    catalog_sql(
        spark, cat,
        "MERGE INTO orders t USING feed s ON t.ok = s.ok "
        "WHEN NOT MATCHED THEN INSERT *",
    )
    got = _rows(spark)
    assert (4, "C", 40.0, "2026-02") in got
    assert (2, "B", 20.0, "2026-01") in got, "matched row must pass through"
    with pytest.raises(ValueError, match="unsupported MERGE clause"):
        catalog_sql(
            spark, cat,
            "MERGE INTO orders t USING feed s ON t.ok = s.ok "
            "WHEN MATCHED THEN UPDATE SET price = 0",
        )
    with pytest.raises(ValueError, match="TARGET columns only"):
        catalog_sql(
            spark, cat,
            "MERGE INTO orders t USING feed s ON t.ok = s.ok "
            "WHEN MATCHED AND s.price > 0 THEN DELETE",
        )
