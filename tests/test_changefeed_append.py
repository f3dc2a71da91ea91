"""Change-feed APPEND fast path: a purely accretive commit's diff is
structurally the new extra vrels — read directly as inserts, no
whole-leaf read, no EXCEPT ALL. Pins (a) semantic equality with the
multiset-diff result, (b) the scan footprint (only appended files are
read), (c) fallback to the full diff when a DV delete or a rewrite
touches the same leaves."""

from __future__ import annotations

from pyspark.sql import functions as F


def _mk(spark, tmp_path):
    from etl_demo_spark.io.manifest import write_manifested

    df = spark.createDataFrame(
        [(i, float(i), f"d{i % 3}") for i in range(90)],
        "k INT, x DOUBLE, dt STRING",
    )
    root = str(tmp_path / "t")
    write_manifested(df.repartition(2), root, "dt")
    return root


def test_append_feed_is_inserts_only_and_reads_only_new_files(spark, tmp_path):
    from etl_demo_spark.io.manifest import (
        append_manifested,
        manifest_versions,
        read_changes,
    )

    root = _mk(spark, tmp_path)
    extra = spark.createDataFrame(
        [(1000 + i, -1.0 * i, f"d{i % 3}") for i in range(9)],
        "k INT, x DOUBLE, dt STRING",
    )
    append_manifested(spark, root, extra)
    v1, v2 = manifest_versions(spark, root)[-2:]
    feed = read_changes(spark, root, v1, v2)
    rows = feed.collect()
    assert all(r["_change_type"] == "insert" for r in rows)
    assert {r["k"] for r in rows} == {1000 + i for i in range(9)}
    # footprint: ONLY the appended vrels' files are scanned — the
    # accreting leaf's primary (and everything else) is untouched
    files = feed.inputFiles()
    # every scanned file lives under a tokened APPEND vrel — the
    # accreting leaves' primary __v1 dirs never appear in the plan
    assert files and all("-" in f.rsplit("/", 2)[-2] for f in files), files


def test_append_feed_equals_multiset_diff_when_mixed_with_rewrite(
    spark, tmp_path
):
    from etl_demo_spark.io.manifest import (
        append_manifested,
        manifest_versions,
        merge_upsert_manifested,
        read_changes,
    )

    root = _mk(spark, tmp_path)
    # one commit appends to d0/d1/d2; the next rewrites d1 — the feed
    # across both must combine the fast path (v1->v2) with the full
    # diff (v2->v3) consistently at every step
    extra = spark.createDataFrame(
        [(2000 + i, 5.0, f"d{i % 3}") for i in range(6)],
        "k INT, x DOUBLE, dt STRING",
    )
    append_manifested(spark, root, extra)
    upd = spark.createDataFrame(
        [(1, 999.0, "d1"), (4, 999.0, "d1")], "k INT, x DOUBLE, dt STRING"
    )
    merge_upsert_manifested(spark, root, upd, ["k"], "dt")
    v2, v3 = manifest_versions(spark, root)[-2:]
    feed = read_changes(spark, root, v2, v3).collect()
    deletes = {r["k"] for r in feed if r["_change_type"] == "delete"}
    inserts = {
        (r["k"], r["x"]) for r in feed if r["_change_type"] == "insert"
    }
    assert deletes == {1, 4}  # rewrite surfaced as delete+insert
    assert {(1, 999.0), (4, 999.0)} <= inserts
    # d1's previously-appended rows were CONSOLIDATED into the new
    # primary with identical values: they cancel in the diff instead of
    # resurfacing as phantom events; d0/d2 extras are untouched carries
    assert not any(k >= 2000 for k, _ in inserts)


def test_dv_on_appended_leaf_falls_back_to_full_diff(spark, tmp_path):
    from etl_demo_spark.io.manifest import (
        append_manifested,
        delete_rows_manifested,
        manifest_versions,
        read_changes,
    )

    root = _mk(spark, tmp_path)
    extra = spark.createDataFrame(
        [(3000, 1.0, "d0"), (3001, 2.0, "d0")], "k INT, x DOUBLE, dt STRING"
    )
    append_manifested(spark, root, extra)
    v_pre = manifest_versions(spark, root)[-1]
    # DV-delete one APPENDED row: the appended vrel now has DV movement,
    # so the v_pre->v_post diff must NOT shortcut it as pure inserts
    delete_rows_manifested(spark, root, F.col("k") == 3000)
    v_post = manifest_versions(spark, root)[-1]
    feed = read_changes(spark, root, v_pre, v_post).collect()
    assert {(r["k"], r["_change_type"]) for r in feed} == {(3000, "delete")}
