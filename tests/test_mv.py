"""Incremental materialized views (mv.py): change-feed folds must equal
full recomputes under inserts, updates, deletes, group death/rebirth,
crash recovery, and retention-lag fallback — and the repair path must
re-read the base only for groups whose extremum was actually touched."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_demo_spark.io.manifest import (
    delete_where_manifested,
    manifest_versions,
    merge_upsert_manifested,
    read_manifested,
    write_manifested,
)
from etl_demo_spark.mv import (
    MVConcurrentRefreshError,
    mv_create,
    mv_read,
    mv_refresh,
    mv_state,
    mv_vacuum,
    mv_watermark,
)

AGGS = {
    "n": ("count", None),
    "n_vals": ("count", "val"),
    "total": ("sum", "val_dec"),
    "avg_val": ("avg", "val_dec"),
    "lo": ("min", "val"),
    "hi": ("max", "val"),
}
DERIVED = {"val_dec": "CAST(val AS DECIMAL(18,2))"}


def _seed(spark, path: str):
    rows = [
        # (id, grp, val, part)
        (1, "a", 10.0, "p1"),
        (2, "a", 20.0, "p1"),
        (3, "a", 30.0, "p2"),
        (4, "b", 5.0, "p1"),
        (5, "b", None, "p2"),
        (6, "c", None, "p2"),
    ]
    df = spark.createDataFrame(rows, "id INT, grp STRING, val DOUBLE, part STRING")
    write_manifested(df, path, "part")
    return df


def _expected(spark, base_path: str):
    b = read_manifested(spark, base_path).selectExpr(
        "*", "CAST(val AS DECIMAL(18,2)) AS val_dec"
    )
    return {
        r["grp"]: r
        for r in b.groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count("val").alias("n_vals"),
            F.sum("val_dec").alias("total"),
            F.avg("val_dec").alias("avg_val"),
            F.min("val").alias("lo"),
            F.max("val").alias("hi"),
        )
        .collect()
    }


def _got(spark, mv_path: str):
    return {r["grp"]: r for r in mv_read(spark, mv_path).collect()}


def _assert_matches(spark, base_path, mv_path):
    exp, got = _expected(spark, base_path), _got(spark, mv_path)
    assert set(got) == set(exp)
    for g in exp:
        for c in ("n", "n_vals", "total", "lo", "hi"):
            assert got[g][c] == exp[g][c], (g, c, got[g], exp[g])
        if exp[g]["avg_val"] is None:
            assert got[g]["avg_val"] is None, (g, got[g])
        else:
            assert float(got[g]["avg_val"]) == pytest.approx(
                float(exp[g]["avg_val"])
            ), (g, got[g], exp[g])


def _mk(spark, tmp_path):
    base = str(tmp_path / "base")
    mv = str(tmp_path / "view")
    _seed(spark, base)
    mv_create(spark, base, mv, ["grp"], AGGS, derived=DERIVED, buckets=4)
    return base, mv


def test_create_matches_full_aggregate_and_noop(spark, tmp_path):
    base, mv = _mk(spark, tmp_path)
    _assert_matches(spark, base, mv)
    # SUM/AVG over the all-NULL group are NULL, counts still live
    got = _got(spark, mv)
    assert got["c"]["n"] == 1 and got["c"]["n_vals"] == 0
    assert got["c"]["total"] is None and got["c"]["avg_val"] is None
    assert got["c"]["lo"] is None and got["c"]["hi"] is None
    r = mv_refresh(spark, mv, cost_based=False)
    assert r["mode"] == "noop"
    assert mv_watermark(spark, mv) == 1


def test_incremental_fold_insert_update_delete(spark, tmp_path):
    base, mv = _mk(spark, tmp_path)
    src = spark.createDataFrame(
        [
            (2, "a", 25.0, "p1"),   # update: non-extreme row of 'a'
            (7, "b", 50.0, "p1"),   # insert: new max for 'b'
            (8, "d", 1.0, "p2"),    # insert: brand-new group
        ],
        "id INT, grp STRING, val DOUBLE, part STRING",
    )
    merge_upsert_manifested(spark, base, src, ["id"], "part")
    r = mv_refresh(spark, mv, cost_based=False)
    assert r["mode"] == "incremental"
    assert r["mv_version"] == 2
    # the update touched a non-extreme row and the inserts need no repair:
    # nothing re-reads the base
    assert r["recomputed_groups"] == 0
    _assert_matches(spark, base, mv)

    # now delete the stored max of 'a' -> exactly one group repairs
    delete_where_manifested(spark, base, F.col("id") == 3, "part")
    r = mv_refresh(spark, mv, cost_based=False)
    assert r["mode"] == "incremental"
    assert r["recomputed_groups"] == 1
    _assert_matches(spark, base, mv)


def test_group_death_tombstone_rebirth_and_vacuum(spark, tmp_path):
    base, mv = _mk(spark, tmp_path)
    delete_where_manifested(spark, base, F.col("grp") == "b", "part")
    mv_refresh(spark, mv, cost_based=False)
    _assert_matches(spark, base, mv)
    assert "b" not in _got(spark, mv)
    tomb = mv_state(spark, mv).filter(F.col("_n") == 0).collect()
    assert [t["grp"] for t in tomb] == ["b"]
    # tombstone invariant: zero counts, NULL extrema
    assert tomb[0]["_s_n"] == 0 and tomb[0]["_s_total"] == 0
    assert tomb[0]["_s_lo"] is None and tomb[0]["_s_hi"] is None

    # rebirth: new rows for the dead group fold on top of the tombstone
    src = spark.createDataFrame(
        [(9, "b", 7.0, "p1")], "id INT, grp STRING, val DOUBLE, part STRING"
    )
    merge_upsert_manifested(spark, base, src, ["id"], "part")
    mv_refresh(spark, mv, cost_based=False)
    _assert_matches(spark, base, mv)
    assert _got(spark, mv)["b"]["lo"] == 7.0

    # vacuum drops only tombstones (kill one group again first)
    delete_where_manifested(spark, base, F.col("grp") == "c", "part")
    mv_refresh(spark, mv, cost_based=False)
    assert mv_vacuum(spark, mv) >= 1
    assert mv_state(spark, mv).filter(F.col("_n") == 0).count() == 0
    _assert_matches(spark, base, mv)


def test_crash_between_intent_and_merge_recovers(spark, tmp_path, monkeypatch):
    base, mv = _mk(spark, tmp_path)
    src = spark.createDataFrame(
        [(7, "a", 99.0, "p1")], "id INT, grp STRING, val DOUBLE, part STRING"
    )
    merge_upsert_manifested(spark, base, src, ["id"], "part")

    import etl_demo_spark.mv as mvmod

    def boom(*a, **k):
        raise RuntimeError("injected crash after intent publish")

    monkeypatch.setattr(mvmod, "merge_upsert_manifested", boom)
    with pytest.raises(RuntimeError, match="injected crash"):
        mv_refresh(spark, mv, cost_based=False)
    monkeypatch.undo()

    # intent is pending; the MV itself is untouched and still readable
    assert manifest_versions(spark, mv)[-1] == 1
    assert mv_watermark(spark, mv) == 1
    # recovery: the next refresh re-runs the recorded fold
    r = mv_refresh(spark, mv, cost_based=False)
    assert r["mode"] == "incremental" and r["mv_version"] == 2
    assert mv_watermark(spark, mv) == 2
    _assert_matches(spark, base, mv)
    # and it converges: nothing further to do
    assert mv_refresh(spark, mv, cost_based=False)["mode"] == "noop"


def test_concurrent_refresher_loses_intent_cas(spark, tmp_path, monkeypatch):
    base, mv = _mk(spark, tmp_path)
    src = spark.createDataFrame(
        [(7, "a", 99.0, "p1")], "id INT, grp STRING, val DOUBLE, part STRING"
    )
    merge_upsert_manifested(spark, base, src, ["id"], "part")

    import etl_demo_spark.mv as mvmod

    # simulate "another refresher already published the intent"
    real = mvmod._publish_intent
    monkeypatch.setattr(
        mvmod,
        "_publish_intent",
        lambda fs, jvm, root, intent: real(fs, jvm, root, intent) and False,
    )
    with pytest.raises(MVConcurrentRefreshError):
        mv_refresh(spark, mv, cost_based=False)
    monkeypatch.undo()
    # the "other" refresher's intent is pending; this refresher resumes it
    r = mv_refresh(spark, mv, cost_based=False)
    assert r["mv_version"] == 2
    _assert_matches(spark, base, mv)


def test_retention_lag_falls_back_to_full(spark, tmp_path):
    base, mv = _mk(spark, tmp_path)
    # three base commits: the MV's watermark (v1) falls out of _RETAIN=2
    for i, g in enumerate(("a", "b", "c")):
        src = spark.createDataFrame(
            [(20 + i, g, 100.0 + i, "p1")],
            "id INT, grp STRING, val DOUBLE, part STRING",
        )
        merge_upsert_manifested(spark, base, src, ["id"], "part")
    assert 1 not in manifest_versions(spark, base)
    r = mv_refresh(spark, mv, cost_based=False)
    assert r["mode"] == "full"
    _assert_matches(spark, base, mv)
    # back on the incremental path afterwards
    delete_where_manifested(spark, base, F.col("id") == 20, "part")
    assert mv_refresh(spark, mv, cost_based=False)["mode"] == "incremental"
    _assert_matches(spark, base, mv)


def test_mv_read_time_travel_and_empty_diff_commit(spark, tmp_path):
    base, mv = _mk(spark, tmp_path)
    src = spark.createDataFrame(
        [(7, "a", 99.0, "p1")], "id INT, grp STRING, val DOUBLE, part STRING"
    )
    merge_upsert_manifested(spark, base, src, ["id"], "part")
    mv_refresh(spark, mv, cost_based=False)
    # the MV is itself a manifested table: time travel to the pre-refresh view
    old = {r["grp"]: r for r in mv_read(spark, mv, version=1).collect()}
    assert old["a"]["n"] == 3 and _got(spark, mv)["a"]["n"] == 4

    # a row-preserving base commit (compaction) yields an EMPTY diff; the
    # refresh still advances the watermark with a no-op merge
    from etl_demo_spark.io.manifest import compact_manifested

    compact_manifested(spark, base)
    r = mv_refresh(spark, mv, cost_based=False)
    assert r["changed_groups"] == 0
    assert mv_watermark(spark, mv) == manifest_versions(spark, base)[-1]
    _assert_matches(spark, base, mv)


def test_cost_based_refresh_policy(spark, tmp_path):
    """Default SHAPE-AWARE cost policy: a whole-leaf MERGE feed (read
    both sides + EXCEPT ALL, 8x-weighted) takes FULL recompute even
    when the changed fraction is small; an APPEND-shaped change (new
    vrels read once as inserts) takes the fold at default knobs. Both
    paths converge to the same state."""
    base, mv = _mk(spark, tmp_path)
    src = spark.createDataFrame(
        [(7, "a", 99.0, "p1"), (8, "d", 1.0, "p2")],
        "id INT, grp STRING, val DOUBLE, part STRING",
    )
    merge_upsert_manifested(spark, base, src, ["id"], "part")
    r = mv_refresh(spark, mv)  # diff-shaped: 8x both sides >= base
    assert r["mode"] == "full" and r["reason"] == "cost", r
    assert r["cost"]["full_cheaper"] is True
    assert r["cost"]["base_scan_complete"] is True
    assert 0 < r["cost"]["diff_bytes"]
    _assert_matches(spark, base, mv)

    # an 8-leaf base with an APPEND-shaped change: the feed is the new
    # vrel's bytes only — the fold is chosen at DEFAULT knobs and the
    # estimate shows why (append_bytes tiny, diff_bytes zero)
    base2 = str(tmp_path / "base8")
    mv2 = str(tmp_path / "view8")
    big = spark.range(0, 80).selectExpr(
        "cast(id as int) AS id",
        "concat('g', id % 3) AS grp",
        "cast(id as double) AS val",
        "concat('p', id % 8) AS part",
    )
    write_manifested(big, base2, "part")
    mv_create(
        spark, base2, mv2, ["grp"],
        {"n": ("count", None), "hi": ("max", "val")}, buckets=2,
    )
    from etl_demo_spark.io.manifest import append_manifested

    one = spark.createDataFrame(
        [(1000, "g0", 500.0, "p0")],
        "id INT, grp STRING, val DOUBLE, part STRING",
    )
    append_manifested(spark, base2, one)
    r2 = mv_refresh(spark, mv2)  # default knobs pick the fold
    assert r2["mode"] == "incremental" and r2["reason"] == "fold", r2
    assert r2["cost"]["full_cheaper"] is False
    assert r2["cost"]["diff_bytes"] == 0
    assert 0 < r2["cost"]["append_bytes"] < r2["cost"]["base_bytes_scanned"]
    exp2 = {
        r["grp"]: (r["n"], r["hi"])
        for r in read_manifested(spark, base2)
        .groupBy("grp")
        .agg(F.count(F.lit(1)).alias("n"), F.max("val").alias("hi"))
        .collect()
    }
    got2 = {r["grp"]: (r["n"], r["hi"]) for r in mv_read(spark, mv2).collect()}
    assert got2 == exp2

    # rewriting every leaf makes the changed slice ~the whole table:
    # full wins on the fraction crossover, not the floor
    allrows = read_manifested(spark, base2).withColumn(
        "val", F.col("val") + F.lit(1.0)
    )
    merge_upsert_manifested(spark, base2, allrows, ["id"], "part")
    r3 = mv_refresh(spark, mv2, full_floor_bytes=0, changed_frac_crossover=0.2)
    assert r3["mode"] == "full" and r3["reason"] == "cost", r3
    exp = {
        r["grp"]: (r["n"], r["hi"])
        for r in read_manifested(spark, base2)
        .groupBy("grp")
        .agg(F.count(F.lit(1)).alias("n"), F.max("val").alias("hi"))
        .collect()
    }
    got = {r["grp"]: (r["n"], r["hi"]) for r in mv_read(spark, mv2).collect()}
    assert got == exp
