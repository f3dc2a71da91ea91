"""Change-data feed (Delta CDF shape): rewrite committers on
``change_feed=True`` tables record their exact delete/insert rows in a
per-commit sidecar; the table stream delivers them instead of refusing
the commit, maintenance rewrites stream as row no-ops, and a downstream
replica applying the feed (multiset inserts EXCEPT ALL deletes)
converges to the table."""

from __future__ import annotations

import glob
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from etl_demo_spark.io.manifest import (
    append_manifested,
    compact_manifested,
    delete_keys_dv_manifested,
    delete_rows_manifested,
    delete_where_manifested,
    merge_upsert_manifested,
    read_manifested,
    update_where_manifested,
    write_manifested,
)
from etl_demo_spark.io.table_stream import register_table_stream_source


@pytest.fixture(scope="module")
def cdf_root():
    root = tempfile.mkdtemp(prefix="cdf_")
    yield root
    shutil.rmtree(root, ignore_errors=True)


def _rows(spark, ids, part="a", val=1.0):
    return spark.createDataFrame(
        [(i, part, float(val)) for i in ids],
        "id BIGINT, part STRING, val DOUBLE",
    )


def _drain(spark, table, sink, ck):
    register_table_stream_source(spark)
    q = (
        spark.readStream.format("tablestream")
        .option("path", table)
        .load()
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return spark.read.parquet(sink)


def _replica(feed):
    body = feed.drop("_commit_version")
    ins = body.filter("_change_type = 'insert'").drop("_change_type")
    dels = body.filter("_change_type = 'delete'").drop("_change_type")
    return ins.exceptAll(dels)


def _assert_converged(spark, feed, table):
    rep = _replica(feed)
    tbl = read_manifested(spark, table)
    assert rep.exceptAll(tbl).count() == 0
    assert tbl.exceptAll(rep).count() == 0


def test_merge_streams_update_pairs_and_replica_converges(spark, cdf_root):
    table = f"{cdf_root}/t1"
    write_manifested(_rows(spark, range(0, 5)), table, "part", change_feed=True)
    # update ids 1,2 (val 9.0) + insert 100 — one merge commit (v2)
    merge_upsert_manifested(
        spark, table, _rows(spark, [1, 2, 100], val=9.0), ["id"], ["part"]
    )
    feed = _drain(spark, table, f"{cdf_root}/t1_sink", f"{cdf_root}/t1_ck")
    v2 = feed.filter("_commit_version = 2")
    # touched keys 1,2: delete(preimage val=1.0) + insert(postimage 9.0);
    # new key 100: insert only
    assert v2.filter("_change_type = 'delete'").count() == 2
    assert v2.filter("_change_type = 'delete' AND val = 1.0").count() == 2
    assert v2.filter("_change_type = 'insert'").count() == 3
    assert v2.filter("_change_type = 'insert' AND val = 9.0").count() == 3
    _assert_converged(spark, feed, table)


def test_delete_and_update_where_stream_their_rows(spark, cdf_root):
    """Subscriber pattern: a persistent checkpoint drains after each
    commit, so every rewrite's sidecar is delivered as it lands (an
    after-the-fact earliest-snapshot stream would see only the final
    state — that contract is covered by test_initial_snapshot below)."""
    table = f"{cdf_root}/t2"
    sink, ck = f"{cdf_root}/t2_sink", f"{cdf_root}/t2_ck"
    write_manifested(_rows(spark, range(0, 8)), table, "part", change_feed=True)
    _drain(spark, table, sink, ck)
    delete_where_manifested(spark, table, F.col("id") >= 6, "part")  # v2
    _drain(spark, table, sink, ck)
    update_where_manifested(
        spark, table, {"val": F.lit(7.5)}, F.col("id") < 2, "part"
    )  # v3
    feed = _drain(spark, table, sink, ck)
    v2 = feed.filter("_commit_version = 2")
    assert v2.filter("_change_type = 'delete'").count() == 2
    assert v2.filter("_change_type = 'insert'").count() == 0
    v3 = feed.filter("_commit_version = 3")
    assert v3.filter("_change_type = 'delete' AND val = 1.0").count() == 2
    assert v3.filter("_change_type = 'insert' AND val = 7.5").count() == 2
    _assert_converged(spark, feed, table)


def test_compaction_streams_as_row_noop(spark, cdf_root):
    table = f"{cdf_root}/t3"
    sink, ck = f"{cdf_root}/t3_sink", f"{cdf_root}/t3_ck"
    write_manifested(_rows(spark, range(0, 3)), table, "part", change_feed=True)
    append_manifested(spark, table, _rows(spark, [10, 11]))  # v2
    _drain(spark, table, sink, ck)
    compact_manifested(spark, table)  # v3: rewrite, zero row change
    append_manifested(spark, table, _rows(spark, [20]))  # v4
    feed = _drain(spark, table, sink, ck)
    assert feed.filter("_commit_version = 3").count() == 0
    assert feed.filter("_commit_version = 4").count() == 1
    _assert_converged(spark, feed, table)


def test_initial_snapshot_after_rewrites_and_dv(spark, cdf_root):
    """A LATE subscriber (fresh checkpoint, default earliest) gets the
    full snapshot at the oldest retained version — post-rewrite state,
    DV tombstones excluded — then tails. No replay of history it can't
    have."""
    from etl_demo_spark.io.manifest import manifest_versions

    table = f"{cdf_root}/t8"
    write_manifested(_rows(spark, range(0, 10)), table, "part", change_feed=True)
    merge_upsert_manifested(
        spark, table, _rows(spark, [0, 1], val=4.0), ["id"], ["part"]
    )  # v2
    delete_rows_manifested(spark, table, F.col("id") >= 8)  # v3 (DV)
    feed = _drain(spark, table, f"{cdf_root}/t8_sink", f"{cdf_root}/t8_ck")
    # snapshot at the oldest retained version (v2: post-merge, pre-DV)
    # + the v3 delete events; the applied replica converges
    _assert_converged(spark, feed, table)
    assert _replica(feed).filter("id >= 8").count() == 0
    assert feed.filter(
        "_commit_version = 3 AND _change_type = 'delete'"
    ).count() == 2
    # snapshot rows attribute to the version that committed their FILE:
    # the single leaf (part=a) was wholly rewritten by the v2 merge, so
    # every snapshot row carries v2
    assert feed.filter("_commit_version = 2").count() == 10
    assert feed.filter("_commit_version = 2 AND val = 4.0").count() == 2


def test_dv_delete_streams_deletes_but_erasure_path_does_not(spark, cdf_root):
    table = f"{cdf_root}/t4"
    write_manifested(_rows(spark, range(0, 6)), table, "part", change_feed=True)
    delete_rows_manifested(spark, table, F.col("id") >= 4)  # v2: DV + CDF
    feed = _drain(spark, table, f"{cdf_root}/t4_sink", f"{cdf_root}/t4_ck")
    v2 = feed.filter("_commit_version = 2")
    assert v2.filter("_change_type = 'delete'").count() == 2
    _assert_converged(spark, feed, table)
    # GDPR path: no sidecar, the stream refuses (on_rewrite default)
    delete_keys_dv_manifested(
        spark, table, spark.createDataFrame([(0,)], "id BIGINT"), ["id"]
    )  # v3
    with pytest.raises(Exception, match="rewrote leaf|STREAM_FAILED"):
        _drain(spark, table, f"{cdf_root}/t4_sink", f"{cdf_root}/t4_ck")


def test_change_sidecar_reclaimed_past_retention(spark, cdf_root):
    table = f"{cdf_root}/t5"
    write_manifested(_rows(spark, range(0, 4)), table, "part", change_feed=True)
    merge_upsert_manifested(spark, table, _rows(spark, [1], val=5.0), ["id"], ["part"])  # v2
    assert glob.glob(f"{table}/_changes/__v0000000002*")
    for i in range(3):  # v3..v5 push v2 out of retention; GC runs per commit
        merge_upsert_manifested(
            spark, table, _rows(spark, [200 + i]), ["id"], ["part"]
        )
    assert not glob.glob(f"{table}/_changes/__v0000000002*"), (
        "expired commit's change sidecar must be reclaimed"
    )


def test_read_change_events_matches_net_diff_and_mv_folds_cheaply(
    spark, cdf_root
):
    from etl_demo_spark.io.manifest import (
        manifest_versions,
        read_change_events,
        read_changes,
    )
    from etl_demo_spark.mv import mv_create, mv_read, mv_refresh

    base, mv = f"{cdf_root}/t6", f"{cdf_root}/t6_mv"
    write_manifested(_rows(spark, range(0, 20)), base, "part", change_feed=True)
    mv_create(
        spark, base, mv, ["part"],
        {"n": ("count", None), "s": ("sum", "val"), "mx": ("max", "val")},
    )
    # churn: update + insert in one merge commit (v2)
    merge_upsert_manifested(
        spark, base, _rows(spark, [3, 4, 300], val=9.0), ["id"], ["part"]
    )
    events = read_change_events(spark, base, 1, 2)
    net = read_changes(spark, base, 1, 2)

    def applied(feed):
        ins = feed.filter("_change_type = 'insert'").drop("_change_type")
        dels = feed.filter("_change_type = 'delete'").drop("_change_type")
        return ins.exceptAll(dels)

    # events = net diff + intra-range churn; their APPLICATION is equal
    assert applied(events).exceptAll(applied(net)).count() == 0
    assert applied(net).exceptAll(applied(events)).count() == 0

    # the estimate must charge sidecar bytes at 1x, never EXCEPT-ALL 8x
    # (at this toy scale the sidecar's parquet overhead exceeds the
    # 1 KB base, so the DEFAULT policy rightly picks full — the shape of
    # the estimate is what's under test, the fold is pinned explicitly)
    from etl_demo_spark.io.manifest import _hadoop_fs
    from etl_demo_spark.mv import _load_spec, _refresh_cost_estimate

    fs, jvm = _hadoop_fs(spark, mv)
    est = _refresh_cost_estimate(spark, _load_spec(fs, jvm, mv), 1, 2, 0, 1.0)
    assert est["diff_bytes"] == 0, (
        "sidecar-covered range must not be charged EXCEPT-ALL bytes"
    )
    assert est["sidecar_bytes"] > 0

    stats = mv_refresh(spark, mv, cost_based=False)  # pin the events fold
    assert stats["mode"] == "incremental", stats

    # a delete commit (v3): the events fold handles its sidecar too,
    # incl. the MAX repair path (id 19 was a per-part extremum candidate)
    delete_where_manifested(spark, base, F.col("id") == 19, "part")
    stats = mv_refresh(spark, mv, cost_based=False)
    assert stats["mode"] == "incremental", stats
    expect = {
        r["part"]: (r["n"], r["s"], r["mx"])
        for r in read_manifested(spark, base)
        .groupBy("part")
        .agg(
            F.count("*").alias("n"),
            F.sum("val").alias("s"),
            F.max("val").alias("mx"),
        )
        .collect()
    }
    got = {
        r["part"]: (r["n"], r["s"], r["mx"])
        for r in mv_read(spark, mv).collect()
    }
    assert got == expect


def test_read_change_events_refuses_uncovered_rewrite(spark, cdf_root):
    from etl_demo_spark.io.manifest import (
        manifest_versions,
        read_change_events,
    )

    base = f"{cdf_root}/t7"
    write_manifested(_rows(spark, range(0, 5)), base, "part")  # no CDF
    merge_upsert_manifested(spark, base, _rows(spark, [1], val=2.0), ["id"], ["part"])
    with pytest.raises(ValueError, match="without a change sidecar"):
        read_change_events(spark, base, 1, manifest_versions(spark, base)[-1])


def test_update_where_cross_referencing_assignments_agree(spark, cdf_root):
    """SET val = val + 1, id = CAST(val AS BIGINT): SQL UPDATE semantics
    mean every expression sees the OLD row. The committed table, the
    destination-partition space, and the CDF postimage must all agree
    (regression: the postimage used chained withColumn, letting the
    second assignment read the first's result)."""
    table = f"{cdf_root}/t9"
    sink, ck = f"{cdf_root}/t9_sink", f"{cdf_root}/t9_ck"
    write_manifested(
        _rows(spark, [100, 200], val=7.0), table, "part", change_feed=True
    )
    _drain(spark, table, sink, ck)
    update_where_manifested(
        spark,
        table,
        {"val": F.col("val") + 1, "id": F.col("val").cast("bigint")},
        F.col("id") == 100,
        "part",
    )  # old row (100, 7.0) -> (7, 8.0) under simultaneous semantics
    feed = _drain(spark, table, sink, ck)
    post = feed.filter("_commit_version = 2 AND _change_type = 'insert'")
    assert [(r["id"], r["val"]) for r in post.collect()] == [(7, 8.0)]
    _assert_converged(spark, feed, table)


def test_rollback_does_not_reannounce_change_data(spark, cdf_root):
    """RESTORE must not copy the restored version's per-commit sidecar
    pointer — a stream would re-deliver the old commit's changes as the
    restore's CDC delta."""
    from etl_demo_spark.io.manifest import (
        _hadoop_fs,
        _load_doc,
        rollback_manifested,
    )

    table = f"{cdf_root}/t10"
    write_manifested(_rows(spark, range(0, 4)), table, "part", change_feed=True)
    merge_upsert_manifested(
        spark, table, _rows(spark, [1], val=3.0), ["id"], ["part"]
    )  # v2 with sidecar
    rollback_manifested(spark, table, 2)  # v3 = restore of v2
    fs, jvm = _hadoop_fs(spark, table)
    assert "change_data" not in _load_doc(fs, jvm, table), (
        "RESTORE must not inherit the target commit's change_data"
    )


def test_orc_table_streams(spark, cdf_root):
    """Round-10: non-parquet manifested tables stream — the reader
    routes file reads by the data_format recorded in the manifest."""
    table = f"{cdf_root}/t11"
    write_manifested(_rows(spark, range(0, 3)), table, "part", fmt="orc")
    got = _drain(spark, table, f"{cdf_root}/t11_sink", f"{cdf_root}/t11_ck")
    assert got.count() == 3
    assert set(got.select("id").toPandas()["id"]) == {0, 1, 2}


def test_restore_stages_inverse_delta_on_change_feed_tables(spark, tmp_path):
    """RESTORE on a change_feed table sidecars its exact inverse delta
    (streams ride through); plain tables keep the rewrite-commit shape;
    with_changes=True on an uncomputable delta raises."""
    import etl_demo_spark.io.manifest as m

    def rows(ids, val=1.0):
        return spark.createDataFrame(
            [(i, "a", float(val)) for i in ids],
            "id BIGINT, part STRING, val DOUBLE",
        )

    root = str(tmp_path / "cf")
    m.write_manifested(rows(range(4)), root, "part", change_feed=True)  # v1
    m.merge_upsert_manifested(spark, root, rows([0, 1], 9.0), ["id"], ["part"])
    rb = m.rollback_manifested(spark, root, 1)  # v3
    fs, jvm = m._hadoop_fs(spark, root)
    ch = m._load_raw(fs, jvm, root, rb).get("change_data")
    assert ch and ch.get("rel"), "change_feed restore must carry a sidecar"
    # the sidecar IS the inverse delta: applying it to the pre-restore
    # state reproduces the restored table
    ev = m.read_change_events(spark, root, rb - 1, rb)
    pre = m.read_manifested(spark, root, version=rb - 1)
    applied = pre.unionByName(
        ev.filter("_change_type = 'insert'").drop("_change_type")
    ).exceptAll(ev.filter("_change_type = 'delete'").drop("_change_type"))
    restored = m.read_manifested(spark, root)
    assert applied.exceptAll(restored).count() == 0
    assert restored.exceptAll(applied).count() == 0

    # plain table: no sidecar (rewrite-commit shape preserved)
    root2 = str(tmp_path / "plain")
    m.write_manifested(rows(range(3)), root2, "part")
    m.merge_upsert_manifested(spark, root2, rows([0], 5.0), ["id"], ["part"])
    rb2 = m.rollback_manifested(spark, root2, 1)
    fs2, jvm2 = m._hadoop_fs(spark, root2)
    assert m._load_raw(fs2, jvm2, root2, rb2).get("change_data") is None
    # ... unless demanded — then the computable delta stages anyway
    rb3 = m.rollback_manifested(spark, root2, 2, with_changes=True)
    assert m._load_raw(fs2, jvm2, root2, rb3).get("change_data")


def test_catalog_stream_delivers_pin_maps(spark, tmp_path):
    """catalogstream: one row per catalog version with the atomic pin
    map; offsets are catalog versions (checkpoint resume delivers only
    new flips); starting_version=latest tails."""
    from etl_demo_spark.io.catalog import catalog_commit, catalog_init
    from etl_demo_spark.io.catalog_stream import (
        register_catalog_stream_source,
    )
    from etl_demo_spark.io.manifest import (
        append_manifested,
        manifest_versions,
        write_manifested,
    )

    register_catalog_stream_source(spark)
    a = str(tmp_path / "ta")
    cat = str(tmp_path / "cat")
    sink, ck = str(tmp_path / "sink"), str(tmp_path / "ck")
    df = spark.createDataFrame([(1, "x", 1.0)], "id BIGINT, part STRING, v DOUBLE")
    write_manifested(df, a, "part")
    catalog_init(spark, cat, {"ta": a})  # cv1

    def drain():
        q = (
            spark.readStream.format("catalogstream")
            .option("path", cat)
            .load()
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return spark.read.parquet(sink)

    got = drain()
    assert got.count() == 1
    row = got.first()
    assert row["version"] == 1 and row["pins"] == {"ta": 1}
    assert row["roots"]["ta"].endswith("/ta")
    append_manifested(spark, a, df.withColumn("id", F.lit(2).cast("bigint")))
    got = drain()  # no flip yet: nothing new
    assert got.count() == 1
    catalog_commit(spark, cat, {"ta": manifest_versions(spark, a)[-1]})
    got = drain()
    assert got.count() == 2
    assert {r["version"]: dict(r["pins"]) for r in got.collect()} == {
        1: {"ta": 1},
        2: {"ta": 2},
    }


def test_clause_merge_cdf_is_exact_delta_incl_nmbs(spark, cdf_root):
    """Round-10 clause merges on a change_feed table: the CDF sidecar is
    the EXACT multiset delta — including rows removed by NOT MATCHED BY
    SOURCE, which the per-source-key preimage of the upsert path could
    never see. Applying the events to the pre-state reproduces the
    post-state."""
    import etl_demo_spark.io.manifest as m

    table = f"{cdf_root}/t12"
    write_manifested(
        _rows(spark, range(0, 4)), table, "part", change_feed=True
    )
    # full sync to {1 (updated), 9 (new)}: update+insert+NMBS delete
    src = spark.createDataFrame(
        [(1, "a", 9.0), (9, "a", 5.0)], "id BIGINT, part STRING, val DOUBLE"
    )
    m.merge_upsert_manifested(
        spark, table, src, ["id"], "part",
        when_matched="update", insert=True, nmbs_delete=True,
    )
    live = {(r["id"], r["val"]) for r in m.read_manifested(spark, table).collect()}
    assert live == {(1, 9.0), (9, 5.0)}, live
    ev = m.read_change_events(spark, table, 1, 2)
    pre = m.read_manifested(spark, table, version=1)
    applied = pre.unionByName(
        ev.filter("_change_type = 'insert'").drop("_change_type")
    ).exceptAll(ev.filter("_change_type = 'delete'").drop("_change_type"))
    post = m.read_manifested(spark, table)
    assert applied.exceptAll(post).count() == 0
    assert post.exceptAll(applied).count() == 0
    # the NMBS deletes (ids 0,2,3) ARE in the sidecar
    dels = {r["id"] for r in ev.filter("_change_type = 'delete'").collect()}
    assert {0, 2, 3} <= dels, dels

    # pure-DELETE merge with a key-only source (CDC tombstones)
    m.merge_upsert_manifested(
        spark, table,
        spark.createDataFrame([(9,)], "id BIGINT"),
        ["id"], "part", when_matched="delete", insert=False,
    )
    assert {r["id"] for r in m.read_manifested(spark, table).collect()} == {1}
    ev2 = m.read_change_events(spark, table, 2, 3)
    assert {(r["id"], r["_change_type"]) for r in ev2.collect()} == {
        (9, "delete")
    }


def test_erasure_tombstones_cascade_without_payload(spark, cdf_root):
    """tombstones=True: the GDPR erasure stages a REDACTED change
    sidecar — delete rows carry only the key columns, every other
    column NULL — so a downstream replica cascades the deletion by key
    while the sidecar replicates no erased payload byte."""
    table = f"{cdf_root}/t20"
    write_manifested(_rows(spark, range(0, 8)), table, "part", change_feed=True)
    feed0 = _drain(spark, table, f"{cdf_root}/t20_sink", f"{cdf_root}/t20_ck")
    assert feed0.count() == 8
    from etl_demo_spark.io.manifest import delete_keys_manifested

    delete_keys_dv_manifested(
        spark, table,
        spark.createDataFrame([(2,), (5,)], "id BIGINT"), ["id"],
        tombstones=True,
    )  # v2: DV erasure + redacted sidecar
    delete_keys_manifested(
        spark, table,
        spark.createDataFrame([(7,)], "id BIGINT"), ["id"], "part",
        tombstones=True,
    )  # v3: COW erasure + redacted sidecar
    feed = _drain(spark, table, f"{cdf_root}/t20_sink", f"{cdf_root}/t20_ck")
    dels = feed.filter("_change_type = 'delete'")
    assert {r["id"] for r in dels.collect()} == {2, 5, 7}
    # REDACTION: every non-key column is NULL in the tombstones
    assert dels.filter(
        F.col("part").isNotNull() | F.col("val").isNotNull()
    ).count() == 0
    # and no erased value survives anywhere in the sidecar files
    import json as _json

    import etl_demo_spark.io.manifest as m

    fs, jvm = m._hadoop_fs(spark, table)
    for v in (2, 3):
        ch = m._load_raw(fs, jvm, table, v).get("change_data")
        assert ch and ch.get("rel"), "erasure must have staged a sidecar"
        side = spark.read.parquet(f"{table}/{ch['rel']}")
        assert side.filter(F.col("val").isNotNull()).count() == 0
    # downstream cascade: delete-by-key applied to the replica converges
    body = feed.drop("_commit_version")
    ins = body.filter("_change_type = 'insert'").drop("_change_type")
    del_keys = dels.select("id").distinct()
    rep = ins.join(del_keys, "id", "left_anti")
    tbl = read_manifested(spark, table)
    assert rep.exceptAll(tbl).count() == 0
    assert tbl.exceptAll(rep).count() == 0


def test_erasure_tombstones_require_change_feed_silently_skip(spark, cdf_root):
    """tombstones on a NON-change-feed table are a no-op (there is no
    feed to cascade through) — the erasure itself still lands."""
    table = f"{cdf_root}/t21"
    write_manifested(_rows(spark, range(0, 4)), table, "part")
    n = delete_keys_dv_manifested(
        spark, table,
        spark.createDataFrame([(1,)], "id BIGINT"), ["id"],
        tombstones=True,
    )
    assert n == 1
    import etl_demo_spark.io.manifest as m

    fs, jvm = m._hadoop_fs(spark, table)
    assert m._load_raw(fs, jvm, table, 2).get("change_data") is None
    assert read_manifested(spark, table).count() == 3
