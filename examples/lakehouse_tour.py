"""Lakehouse tour: the snapshot/governance surface end-to-end in one
runnable script — hidden partitioning, DML, deletion vectors, ALTER with
column mapping, time travel, commit history, incremental materialized
views with the cost-based refresh, and the multi-table catalog's atomic
cross-table commit. Run:

    PYTHONPATH=. python examples/lakehouse_tour.py [SF_DIR]

Default SF_DIR: /root/testdata/sf0.001.
"""

from __future__ import annotations

import datetime
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from pyspark.sql import functions as F

    from etl_demo_spark.session import get_spark

    spark = get_spark(app_name="lakehouse-tour")
    spark.sparkContext.setLogLevel("ERROR")
    root = Path(tempfile.mkdtemp(prefix="lakehouse_tour_"))

    from etl_demo_spark.io.catalog import (
        catalog_commit,
        catalog_init,
        catalog_snapshot,
        register_catalog,
    )
    from etl_demo_spark.io.manifest import (
        alter_manifested,
        delete_rows_manifested,
        manifest_history,
        manifest_properties,
        manifest_versions,
        merge_upsert_manifested,
        read_manifested,
        write_manifested,
    )
    from etl_demo_spark.mv import mv_create, mv_read, mv_refresh

    # 1. CREATE with hidden partitioning: the writer derives the layout
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice",
        "o_orderpriority",
    )
    tbl = str(root / "orders")
    write_manifested(
        orders,
        tbl,
        partition_transforms={"p_month": "months(o_orderdate)"},
    )
    print("== table created; layout derived from months(o_orderdate)")

    # 2. Source-column pruning: no layout knowledge needed at read time
    m0 = orders.select(F.date_trunc("month", "o_orderdate")).first()[0]
    pruned = read_manifested(
        spark, tbl,
        prune_source={"o_orderdate": (m0, m0 + datetime.timedelta(days=27))},
    )
    print(
        f"one-month predicate opens {len(pruned.inputFiles())} of "
        f"{len(read_manifested(spark, tbl).inputFiles())} files"
    )

    # 3. DML: merge (derives partition values itself) + DV delete
    bump = orders.limit(50).withColumn(
        "o_totalprice", F.col("o_totalprice") + F.lit(1.0)
    )
    merge_upsert_manifested(spark, tbl, bump, ["o_orderkey"], ["p_month"])
    n = delete_rows_manifested(
        spark, tbl, F.col("o_totalprice") > 500_000.0
    )
    print(f"merged 50 rows; deletion vectors removed {n} rows, no rewrite")

    # 4. ALTER as metadata + time travel + history
    alter_manifested(spark, tbl, rename_columns={"o_totalprice": "price"})
    vs = manifest_versions(spark, tbl)
    print("history:")
    manifest_history(spark, tbl).show(truncate=False)
    old = read_manifested(spark, tbl, version=vs[-2])
    print(f"time travel to v{vs[-2]}: price column was o_totalprice: "
          f"{'o_totalprice' in old.columns}")
    print("properties (excerpt):")
    manifest_properties(spark, tbl).filter(
        F.col("key").startswith("partition_transform")
        | F.col("key").startswith("column_mapping")
    ).show(truncate=False)

    # 5. Incremental MV with cost-based refresh
    mv = str(root / "by_priority")
    mv_create(
        spark, tbl, mv, keys=["o_orderpriority"],
        aggs={"n": ("count", None), "revenue": ("sum", "px")},
        derived={"px": "CAST(price AS DECIMAL(18,2))"}, buckets=2,
    )
    merge_upsert_manifested(
        spark, tbl,
        orders.limit(10).withColumnRenamed("o_totalprice", "price"),
        ["o_orderkey"], ["p_month"],
    )
    r = mv_refresh(spark, mv)
    print(f"mv_refresh chose {r['mode']!r} ({r['reason']})")
    mv_read(spark, mv).show(5)

    # 6. Multi-table catalog: atomic cross-table visibility
    side = str(root / "audit")
    write_manifested(
        orders.limit(20).select("o_orderkey", "o_orderpriority"),
        side, "o_orderpriority", change_feed=True,
    )
    cat = str(root / "cat")
    catalog_init(spark, cat, {"orders": tbl, "audit": side})
    pre = catalog_snapshot(spark, cat)
    merge_upsert_manifested(
        spark, side,
        orders.limit(40).select("o_orderkey", "o_orderpriority"),
        ["o_orderkey"], ["o_orderpriority"],
    )
    # durable but invisible until the catalog flip:
    assert pre.read("audit").count() == catalog_snapshot(spark, cat).read("audit").count()
    catalog_commit(
        spark, cat, {"audit": manifest_versions(spark, side)[-1]}
    )
    register_catalog(spark, cat, prefix="lk_")
    spark.sql(
        "SELECT COUNT(*) AS orders_rows, "
        "(SELECT COUNT(*) FROM lk_audit) AS audit_rows FROM lk_orders"
    ).show()
    # 7. Round-8 surfaces: tags, the table stream, continuous MV
    from etl_demo_spark.io.manifest import list_tags, tag_create
    from etl_demo_spark.io.table_stream import register_table_stream_source
    from etl_demo_spark.mv import run_mv_stream_refresh

    tag_create(spark, side, "release-1")  # pin the audit table's state
    merge_upsert_manifested(
        spark, side,
        orders.limit(60).select("o_orderkey", "o_orderpriority"),
        ["o_orderkey"], ["o_orderpriority"],
    )
    pinned = read_manifested(spark, side, tag="release-1").count()
    live = read_manifested(spark, side).count()
    print(f"tag release-1 reads {pinned} rows while the live table has {live}")
    list_tags(spark, side).show()

    register_table_stream_source(spark)
    sink, ck = str(root / "feed"), str(root / "feed_ck")
    q = (
        spark.readStream.format("tablestream")
        .option("path", side)
        .load()
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    spark.read.parquet(sink).groupBy("_commit_version").count().orderBy(
        "_commit_version"
    ).show()

    stats = run_mv_stream_refresh(spark, mv, str(root / "mv_ck"))
    print(f"continuous MV: {len(stats)} stream-triggered refresh(es)")

    print("done — all surfaces exercised under", root)


if __name__ == "__main__":
    main()
