"""Change-feed streaming source over manifested tables (io/table_stream).

Contract under test: `spark.readStream.format("tablestream")` delivers a
manifested table's committed rows exactly once, attributed to the commit
version that introduced them; append/metadata commits stream through,
rewrites fail loudly (or are skipped under on_rewrite=skip); offsets are
manifest versions so a checkpoint restart delivers only new commits."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from etl_demo_spark.io.manifest import (
    alter_manifested,
    append_manifested,
    delete_where_manifested,
    read_manifested,
    write_manifested,
)
from etl_demo_spark.io.table_stream import register_table_stream_source


@pytest.fixture(scope="module")
def ts_env(spark):
    register_table_stream_source(spark)
    root = tempfile.mkdtemp(prefix="tablestream_")
    yield root
    shutil.rmtree(root, ignore_errors=True)


def _mk_rows(spark, ids, part="a"):
    return spark.createDataFrame(
        [(i, part, float(i) * 1.5) for i in ids],
        "id BIGINT, part STRING, val DOUBLE",
    )


def _drain(spark, table, sink, ck, **opts):
    reader = spark.readStream.format("tablestream").option("path", table)
    for k, v in opts.items():
        reader = reader.option(k, v)
    q = (
        reader.load()
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return spark.read.parquet(sink)


def test_full_history_delivery_with_commit_attribution(spark, ts_env):
    table, sink, ck = f"{ts_env}/t1", f"{ts_env}/t1_sink", f"{ts_env}/t1_ck"
    write_manifested(_mk_rows(spark, range(0, 5)), table, "part")  # v1
    append_manifested(spark, table, _mk_rows(spark, range(5, 8)))  # v2
    append_manifested(spark, table, _mk_rows(spark, range(8, 12), "b"))  # v3

    got = _drain(spark, table, sink, ck)
    assert got.count() == 12
    by_v = {
        r["_commit_version"]: r["n"]
        for r in got.groupBy("_commit_version")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert by_v == {1: 5, 2: 3, 3: 4}
    assert set(got.select("_change_type").distinct().toPandas()["_change_type"]) == {
        "insert"
    }
    # value parity: the stream IS the table, typed partition dirs included
    body = got.drop("_change_type", "_commit_version")
    tbl = read_manifested(spark, table)
    assert body.exceptAll(tbl).count() == 0
    assert tbl.exceptAll(body).count() == 0
    assert dict(body.dtypes)["part"] == "string"
    assert dict(body.dtypes)["id"] == "bigint"


def test_checkpoint_resume_delivers_only_new_commits(spark, ts_env):
    table, sink, ck = f"{ts_env}/t2", f"{ts_env}/t2_sink", f"{ts_env}/t2_ck"
    write_manifested(_mk_rows(spark, range(0, 4)), table, "part")
    _drain(spark, table, sink, ck)
    append_manifested(spark, table, _mk_rows(spark, range(100, 103)))  # v2
    got = _drain(spark, table, sink, ck)
    assert got.count() == 7
    assert got.filter("_commit_version = 2").count() == 3
    # a third drain with no new commit delivers nothing
    got = _drain(spark, table, sink, ck)
    assert got.count() == 7


def test_metadata_only_commit_streams_through_silently(spark, ts_env):
    table, sink, ck = f"{ts_env}/t3", f"{ts_env}/t3_sink", f"{ts_env}/t3_ck"
    write_manifested(_mk_rows(spark, range(0, 3)), table, "part")
    _drain(spark, table, sink, ck)
    alter_manifested(spark, table, add_columns={"extra": "int"})  # v2: no data
    append_manifested(
        spark,
        table,
        spark.createDataFrame(
            [(50, "a", 9.0, 7)], "id BIGINT, part STRING, val DOUBLE, extra INT"
        ),
    )  # v3
    got = _drain(spark, table, sink, ck)
    assert got.filter("_commit_version = 2").count() == 0
    assert got.filter("_commit_version = 3").count() == 1
    # NOTE: the sink schema was fixed before the ALTER, so `extra` isn't
    # in this parquet sink; schema pickup on restart is covered below.


def test_evolved_schema_backfills_null_for_old_files(spark, ts_env):
    table, sink, ck = f"{ts_env}/t4", f"{ts_env}/t4_sink", f"{ts_env}/t4_ck"
    write_manifested(_mk_rows(spark, range(0, 3)), table, "part")  # v1
    alter_manifested(spark, table, add_columns={"extra": "int"})  # v2
    got = _drain(spark, table, sink, ck)  # fresh stream: schema has extra
    assert "extra" in got.columns
    assert got.filter("extra IS NULL").count() == 3


def test_rename_column_mapping_streams_logical_names(spark, ts_env):
    table, sink, ck = f"{ts_env}/t5", f"{ts_env}/t5_sink", f"{ts_env}/t5_ck"
    write_manifested(_mk_rows(spark, range(0, 3)), table, "part")  # v1
    alter_manifested(spark, table, rename_columns={"val": "amount"})  # v2
    append_manifested(
        spark,
        table,
        spark.createDataFrame(
            [(9, "a", 4.5)], "id BIGINT, part STRING, amount DOUBLE"
        ),
    )  # v3
    got = _drain(spark, table, sink, ck)
    assert "amount" in got.columns and "val" not in got.columns
    # pre-rename files (physical name frozen) still surface values
    assert got.filter("_commit_version = 1 AND amount IS NOT NULL").count() == 3


def test_rewrite_fails_by_default_and_skips_on_request(spark, ts_env):
    table, sink, ck = f"{ts_env}/t6", f"{ts_env}/t6_sink", f"{ts_env}/t6_ck"
    write_manifested(_mk_rows(spark, range(0, 6)), table, "part")
    _drain(spark, table, sink, ck)
    delete_where_manifested(spark, table, F.col("id") >= 4, "part")  # rewrite
    with pytest.raises(Exception, match="rewrote leaf|STREAM_FAILED"):
        _drain(spark, table, sink, ck)
    # a fresh checkpoint with on_rewrite=skip tails through the rewrite
    append_manifested(spark, table, _mk_rows(spark, [77]))
    got = _drain(
        spark,
        table,
        f"{ts_env}/t6_sink2",
        f"{ts_env}/t6_ck2",
        on_rewrite="skip",
        starting_version="2",
    )
    # v2 (the rewrite) skipped entirely; v3 append delivered
    assert got.filter("_commit_version = 2").count() == 0
    assert got.filter("_commit_version = 3").count() == 1


def test_starting_version_latest_tails_only_future_commits(spark, ts_env):
    table, sink, ck = f"{ts_env}/t7", f"{ts_env}/t7_sink", f"{ts_env}/t7_ck"
    write_manifested(_mk_rows(spark, range(0, 5)), table, "part")
    got = _drain(spark, table, sink, ck, starting_version="latest")
    assert got.count() == 0
    append_manifested(spark, table, _mk_rows(spark, [200, 201]))
    got = _drain(spark, table, sink, ck, starting_version="latest")
    assert got.count() == 2
    assert got.filter("_commit_version = 2").count() == 2


def test_not_a_table_and_bad_options_raise(spark, ts_env):
    with pytest.raises(Exception, match="not a manifested table"):
        spark.readStream.format("tablestream").option(
            "path", f"{ts_env}/nope"
        ).load().writeStream.format("noop").trigger(availableNow=True).start()
    table = f"{ts_env}/t8"
    write_manifested(_mk_rows(spark, range(0, 2)), table, "part")
    with pytest.raises(Exception, match="on_rewrite"):
        q = (
            spark.readStream.format("tablestream")
            .option("path", table)
            .option("on_rewrite", "explode")
            .load()
            .writeStream.format("noop")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)


def test_max_files_per_batch_paces_initial_snapshot(spark, ts_env):
    """Admission control (maxFilesPerTrigger shape): a paced
    processingTime stream drains the initial snapshot across several
    micro-batches — bounded batch size at any table size — and still
    delivers every row exactly once."""
    import time as _time

    table, sink, ck = f"{ts_env}/t9", f"{ts_env}/t9_sink", f"{ts_env}/t9_ck"
    write_manifested(_mk_rows(spark, range(0, 6)), table, "part")  # v1
    append_manifested(spark, table, _mk_rows(spark, range(6, 12), "b"))
    append_manifested(spark, table, _mk_rows(spark, range(12, 18), "c"))
    total = 18
    q = (
        spark.readStream.format("tablestream")
        .option("path", table)
        .option("max_files_per_batch", "3")
        .option("pace_id", "t9test")
        .load()
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ck)
        .trigger(processingTime="1 seconds")
        .start()
    )
    try:
        deadline = _time.time() + 240
        while _time.time() < deadline:
            try:
                if spark.read.parquet(sink).count() >= total:
                    break
            except Exception:
                pass  # sink not yet materialized
            _time.sleep(1)
    finally:
        q.stop()
        q.awaitTermination(60)
    got = spark.read.parquet(sink)
    assert got.count() == total, "paced stream must deliver every row"
    assert got.select("id").distinct().count() == total, "no duplicates"
    fed = [p["numInputRows"] for p in q.recentProgress if p["numInputRows"] > 0]
    assert len(fed) >= 3, f"snapshot must drain across several batches: {fed}"


def test_pack_partitions_bins_small_files():
    """Small files pack into one input partition (per-task overhead of
    the Python data source path is ~fixed); big files stay alone;
    order and per-file metadata survive."""
    import os as _os
    import tempfile as _tf

    from etl_demo_spark.io.table_stream import (
        _FilePartition,
        _PackedPartition,
        _pack_partitions,
    )

    d = _tf.mkdtemp(prefix="pack_")
    files = []
    for i, size in enumerate([10, 10, 10, 100, 10, 10]):
        p = _os.path.join(d, f"f{i}.parquet")
        with open(p, "wb") as f:
            f.write(b"x" * size)
        files.append(_FilePartition(p, f"leaf{i}", i))
    out = _pack_partitions(files, target_bytes=35)
    # 10+10+10 -> one packed bin; 100 alone (>= target); 10+10 packed
    flat = []
    for part in out:
        if isinstance(part, _PackedPartition):
            assert len(part.items) > 1
            flat.extend(part.items)
        else:
            flat.append(part)
    assert flat == files, "order and metadata must survive packing"
    assert len(out) < len(files)
    # target 0 disables packing
    assert _pack_partitions(files, target_bytes=0) == files


def test_run_paced_drain_available_now_bounded_batches(spark, ts_env):
    """Admission control under availableNow: each run delivers one
    bounded slice; the loop drains the snapshot to completion with
    exactly-once delivery."""
    from etl_demo_spark.io.table_stream import run_paced_drain

    table = f"{ts_env}/t10"
    sink, ck = f"{ts_env}/t10_sink", f"{ts_env}/t10_ck"
    write_manifested(
        _mk_rows(spark, range(0, 8)).repartition(4), table, "part"
    )
    append_manifested(
        spark, table, _mk_rows(spark, range(8, 16), "b").repartition(4)
    )

    def build_writer(df):
        return (
            df.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ck)
        )

    stats = run_paced_drain(
        spark,
        table,
        build_writer,
        max_files_per_batch=2,
        pace_id="t10drain",
        # tiny target: keep one task per file so batch sizes stay visible
        max_partition_bytes="0",
    )
    got = spark.read.parquet(sink)
    assert got.count() == 16
    assert got.select("id").distinct().count() == 16, "exactly once"
    assert stats["rows"] == 16
    assert stats["runs"] >= 3, f"must take several bounded runs: {stats}"
    # a second drain from the same checkpoint delivers nothing new
    stats2 = run_paced_drain(
        spark, table, build_writer, 2, "t10drain", max_partition_bytes="0"
    )
    assert stats2["rows"] == 0
    assert spark.read.parquet(sink).count() == 16


def test_paced_commit_highwater_persisted(spark, ts_env):
    """commit() records the committed offset in the pace sidecar and
    latestOffset never returns an offset ordered before it."""
    import json as _json
    import os as _os

    from etl_demo_spark.io.table_stream import run_paced_drain

    table = f"{ts_env}/t11"
    sink, ck = f"{ts_env}/t11_sink", f"{ts_env}/t11_ck"
    write_manifested(_mk_rows(spark, range(0, 6)).repartition(3), table, "part")

    def build_writer(df):
        return (
            df.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ck)
        )

    run_paced_drain(spark, table, build_writer, 1, "t11pace")
    pace = _os.path.join(table, "_manifests", ".pace-t11pace")
    doc = _json.loads(open(pace).read())
    assert "cur" in doc and "committed" in doc, doc
    from etl_demo_spark.io.table_stream import _off_key

    # committed progress was recorded (it may lag the final batch by one
    # cycle: Spark acks batch N when batch N+1 starts); the cursor is
    # past the snapshot and never below the committed mark
    assert _off_key(doc["committed"]) > _off_key({"v": 1, "snap": True})
    assert not doc["cur"].get("snap")
    assert _off_key(doc["cur"]) >= _off_key(doc["committed"])


def test_fresh_checkpoint_over_committed_pace_id_fails_loudly(spark, ts_env):
    """A fresh checkpoint meeting a pace sidecar another checkpoint
    already committed past must fail at stream start (silently skipping
    pacing would deliver the whole snapshot in one batch)."""
    from etl_demo_spark.io.table_stream import run_paced_drain

    table = f"{ts_env}/t12"
    sink, ck = f"{ts_env}/t12_sink", f"{ts_env}/t12_ck"
    write_manifested(_mk_rows(spark, range(0, 6)).repartition(3), table, "part")

    def build_writer(df):
        return (
            df.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ck)
        )

    run_paced_drain(spark, table, build_writer, 1, "t12pace")
    # same pace_id, FRESH checkpoint: must refuse, not skip pacing
    with pytest.raises(Exception, match="already\\s+committed past|pace_id"):
        q = (
            spark.readStream.format("tablestream")
            .option("path", table)
            .option("max_files_per_batch", "1")
            .option("pace_id", "t12pace")
            .load()
            .writeStream.format("parquet")
            .option("path", f"{ts_env}/t12_sink2")
            .option("checkpointLocation", f"{ts_env}/t12_ck2")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        if q.exception():
            raise q.exception()


def test_lost_pace_sidecar_never_redelivers(spark, ts_env):
    """Deleting the pace sidecar under a live checkpoint must NEVER
    cause silent re-delivery. Two sanctioned outcomes, both covered:

    1. SELF-HEAL — on resume, Spark replays the WAL's uncommitted last
       batch through ``partitions()`` before any ``latestOffset`` call,
       and ``_pace_mark_planned`` rebuilds the sidecar at that batch's
       end offset — the checkpoint's own authoritative position. The
       stream continues exactly-once from where it left off.
    2. LOUD FAILURE — when no WAL replay precedes planning (fully
       committed checkpoint), ``latestOffset`` starts a fresh cursor
       behind the checkpoint and ``partitions()`` raises the
       offset-regression error instead of re-delivering."""
    import os as _os
    import shutil as _shutil

    from etl_demo_spark.io.table_stream import (
        TableStreamReader,
        run_paced_drain,
    )

    table = f"{ts_env}/t13"
    sink, ck = f"{ts_env}/t13_sink", f"{ts_env}/t13_ck"
    write_manifested(_mk_rows(spark, range(0, 6)).repartition(3), table, "part")

    def build_writer(df):
        return (
            df.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ck)
        )

    run_paced_drain(spark, table, build_writer, 1, "t13pace")
    _os.unlink(_os.path.join(table, "_manifests", ".pace-t13pace"))
    append_manifested(spark, table, _mk_rows(spark, [99]))
    before = spark.read.parquet(sink).count()
    q = (
        spark.readStream.format("tablestream")
        .option("path", table)
        .option("max_files_per_batch", "1")
        .option("pace_id", "t13pace")
        .load()
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    if q.exception():
        raise q.exception()
    got = spark.read.parquet(sink)
    # self-healed: the appended row flowed, NOTHING was re-delivered
    assert got.count() == before + 1
    assert got.select("id").distinct().count() == before + 1
    # loud-failure path: a fresh cursor (no sidecar, no WAL replay)
    # planning behind the checkpoint refuses instead of re-delivering
    _os.unlink(_os.path.join(table, "_manifests", ".pace-t13pace"))
    reader = TableStreamReader(
        {"path": table, "max_files_per_batch": "1", "pace_id": "t13pace"}
    )
    with pytest.raises(ValueError, match="offset regression"):
        reader.partitions({"v": 2}, {"v": 1, "snap": True, "si": 1})
    _shutil.rmtree(f"{ts_env}/t13_ck", ignore_errors=True)


def test_pyfs_unit_specs(tmp_path):
    """The pyfs seam's factory specs: local, subtree (relative paths,
    posix escapes fail loudly), latency wrapper (measurably slower,
    byte-identical results)."""
    import time as _time

    from etl_demo_spark.io import pyfs

    d = tmp_path / "data"
    d.mkdir()
    (d / "a.txt").write_bytes(b"hello")
    (d / "b.txt").write_bytes(b"world!")

    assert pyfs.read_bytes(str(d / "a.txt"), None) == b"hello"
    sub = f"subtree:{tmp_path}"
    assert pyfs.read_bytes(str(d / "a.txt"), sub) == b"hello"
    assert sorted(pyfs.listdir(str(d), sub)) == ["a.txt", "b.txt"]
    assert pyfs.listdir(str(d / "nope"), sub) == []
    with pytest.raises(FileNotFoundError):
        pyfs.listdir_or_raise(str(d / "nope"), sub)
    assert pyfs.file_size(str(d / "b.txt"), sub) == 6
    with pytest.raises(ValueError, match="outside the subtree"):
        pyfs.read_bytes("/etc/hostname", sub)
    pyfs.write_bytes(str(d / "c.txt"), b"xyz", sub)
    assert (d / "c.txt").read_bytes() == b"xyz"

    lat = f"latency:40:{sub}"
    t0 = _time.perf_counter()
    assert pyfs.read_bytes(str(d / "a.txt"), lat) == b"hello"
    assert _time.perf_counter() - t0 >= 0.04, "latency wrapper must bite"
    with pytest.raises(ValueError, match="unknown filesystem spec"):
        pyfs.resolve("/x", "s3-nope:bucket")


def test_stream_routes_through_non_posix_filesystem(spark, ts_env):
    """Object-store seam rehearsal: the SAME tablestream drain, routed
    through SubTreeFileSystem and through a latency-injecting wrapper,
    delivers byte-identical results to the posix path — manifest
    resolution, data reads, DV handling, packing sizes, and the pace
    sidecar all go through pyarrow.fs, no posix assumption left."""
    table = f"{ts_env}/t14"
    write_manifested(
        _mk_rows(spark, range(0, 9)).repartition(3), table, "part"
    )
    append_manifested(spark, table, _mk_rows(spark, range(9, 12), "b"))

    def drain_with(tag, **opts):
        sink, ck = f"{ts_env}/t14_sink_{tag}", f"{ts_env}/t14_ck_{tag}"
        got = _drain(spark, table, sink, ck, **opts)
        return sorted(
            (r["id"], r["part"], r["val"], r["_commit_version"])
            for r in got.collect()
        )

    base = drain_with("posix")
    sub = drain_with("subtree", fs=f"subtree:{ts_env}")
    lat = drain_with("lat", fs=f"latency:25:subtree:{ts_env}")
    assert base == sub == lat
    assert len(base) == 12

    # paced drain (pace sidecar lives behind the seam too)
    from etl_demo_spark.io.table_stream import run_paced_drain

    sink, ck = f"{ts_env}/t14_sink_paced", f"{ts_env}/t14_ck_paced"

    def build_writer(df):
        return (
            df.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ck)
        )

    stats = run_paced_drain(
        spark,
        table,
        build_writer,
        max_files_per_batch=2,
        pace_id="t14pace",
        fs=f"subtree:{ts_env}",
        max_partition_bytes="0",
    )
    assert stats["rows"] == 12
    got = spark.read.parquet(sink)
    assert got.select("id").distinct().count() == 12

    with pytest.raises(Exception, match="unknown filesystem spec"):
        q = (
            spark.readStream.format("tablestream")
            .option("path", table)
            .option("fs", "bogus:zzz")
            .load()
            .writeStream.format("noop")
            .option("checkpointLocation", f"{ts_env}/t14_ck_bad")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)


def test_tail_pacing_bounds_commit_backlog_batches(spark, ts_env):
    """TAIL admission control: a paced stream catching up after downtime
    drains its commit BACKLOG in bounded batches (versions are the
    pacing granularity), instead of one giant batch — and still delivers
    every row exactly once."""
    from etl_demo_spark.io.table_stream import run_paced_drain

    table = f"{ts_env}/t15"
    sink, ck = f"{ts_env}/t15_sink", f"{ts_env}/t15_ck"
    write_manifested(_mk_rows(spark, range(0, 2)), table, "part")  # v1
    # drain the snapshot first so the backlog test isolates the tail
    def build_writer(df):
        return (
            df.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ck)
        )

    run_paced_drain(spark, table, build_writer, 2, "t15pace")
    # downtime: six commits accrue, ~2 files each
    for i in range(6):
        append_manifested(
            spark, table, _mk_rows(spark, [100 + 2 * i, 101 + 2 * i], "b")
        )
    stats = run_paced_drain(
        spark, table, build_writer, max_files_per_batch=2, pace_id="t15pace"
    )
    assert stats["rows"] == 12
    assert stats["runs"] >= 3, f"backlog must drain in bounded runs: {stats}"
    got = spark.read.parquet(sink)
    assert got.count() == 14
    assert got.select("id").distinct().count() == 14, "exactly once"
    # oversized single commit still ships whole (atomic change set)
    append_manifested(
        spark, table, _mk_rows(spark, range(300, 310), "c").repartition(5)
    )
    stats2 = run_paced_drain(spark, table, build_writer, 2, "t15pace")
    assert stats2["rows"] == 10
    assert spark.read.parquet(sink).select("id").distinct().count() == 24


def test_run_paced_drain_continuous_one_query(spark, ts_env):
    """Round-10: the continuous paced drain — ONE processingTime query
    advances one bounded slice per TRIGGER (same admission control as
    the availableNow loop) and stops itself once the pace cursor sits
    at the table head. Exactly-once, same rows as the loop variant,
    query-start cost paid once."""
    from etl_demo_spark.io.table_stream import run_paced_drain_continuous

    table = f"{ts_env}/t16"
    sink, ck = f"{ts_env}/t16_sink", f"{ts_env}/t16_ck"
    write_manifested(
        _mk_rows(spark, range(0, 8)).repartition(4), table, "part"
    )
    append_manifested(
        spark, table, _mk_rows(spark, range(8, 12), "b").repartition(2)
    )
    append_manifested(
        spark, table, _mk_rows(spark, range(12, 16), "c").repartition(2)
    )

    def build_writer(df):
        return (
            df.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ck)
        )

    stats = run_paced_drain_continuous(
        spark,
        table,
        build_writer,
        max_files_per_batch=2,
        pace_id="t16drain",
        trigger="200 milliseconds",
        max_partition_bytes="0",
    )
    got = spark.read.parquet(sink)
    assert got.count() == 16
    assert got.select("id").distinct().count() == 16, "exactly once"
    assert stats["rows"] == 16
    # grant-once pacing: every planned batch is exactly one GRANT,
    # however often the engine probes latestOffset. A grant is <= 2
    # pace quanta (the final snapshot slice rides along with the first
    # tail quantum): b1 = snap files[0:2] (4 rows), b2 = snap files[2:4]
    # + v2 (8 rows), b3 = v3 (4 rows).
    assert stats["batches"] >= 3, f"pace must bound every trigger: {stats}"
    assert stats["max_batch_rows"] <= 8, stats
    # a later append drains from the same checkpoint + pace cursor —
    # and the two drain flavors interoperate on one checkpoint
    from etl_demo_spark.io.table_stream import run_paced_drain

    append_manifested(
        spark, table, _mk_rows(spark, range(16, 20), "c").repartition(2)
    )
    stats2 = run_paced_drain(
        spark, table, build_writer, 2, "t16drain", max_partition_bytes="0"
    )
    assert stats2["rows"] == 4
    assert spark.read.parquet(sink).select("id").distinct().count() == 20


@pytest.mark.parametrize("fmt", ["csv", "json", "orc"])
def test_non_parquet_tables_stream_with_value_parity(spark, ts_env, fmt):
    """Round-10: manifested CSV/JSON/ORC tables stream through the same
    reader — the manifest records data_format, the reader routes each
    file through the matching pyarrow reader applying the STORED schema
    (csv positionally, json by key), and delivers value-parity with the
    batch read: typed ids, doubles, partition-dir values, commit
    attribution, checkpoint resume."""
    table = f"{ts_env}/t17_{fmt}"
    sink, ck = f"{ts_env}/t17_{fmt}_sink", f"{ts_env}/t17_{fmt}_ck"
    write_manifested(_mk_rows(spark, range(0, 5)), table, "part", fmt=fmt)
    append_manifested(
        spark, table, _mk_rows(spark, range(5, 8), "b"), fmt=fmt
    )

    got = _drain(spark, table, sink, ck)
    assert got.count() == 8
    by_v = {
        r["_commit_version"]: r["n"]
        for r in got.groupBy("_commit_version")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert by_v == {1: 5, 2: 3}
    body = got.drop("_change_type", "_commit_version")
    tbl = read_manifested(spark, table, fmt)
    assert body.exceptAll(tbl).count() == 0
    assert tbl.exceptAll(body).count() == 0
    assert dict(body.dtypes)["id"] == "bigint"
    assert dict(body.dtypes)["val"] == "double"
    # checkpoint resume delivers only the new commit
    append_manifested(spark, table, _mk_rows(spark, [99], "c"), fmt=fmt)
    got = _drain(spark, table, sink, ck)
    assert got.count() == 9
    assert got.filter("_commit_version = 3").count() == 1


def test_csv_change_feed_sidecar_streams_with_recorded_cols(spark, ts_env):
    """CSV carries no per-file schema, so the commit records the
    sidecar's exact column order (change_data.cols) — csv change feeds
    then stream with full typed parity, like json/parquet."""
    table = f"{ts_env}/t18"
    sink, ck = f"{ts_env}/t18_sink", f"{ts_env}/t18_ck"
    write_manifested(
        _mk_rows(spark, range(0, 4)), table, "part",
        fmt="csv", change_feed=True,
    )
    _drain(spark, table, sink, ck)
    delete_where_manifested(
        spark, table, F.col("id") >= 2, "part", fmt="csv"
    )
    got = _drain(spark, table, sink, ck)
    dels = got.filter("_change_type = 'delete'")
    assert dels.count() == 2
    # typed parity through the headerless round-trip, partition value
    # re-typed from the inline sidecar column
    vals = {r["id"]: (r["val"], r["part"]) for r in dels.collect()}
    assert vals == {2: (3.0, "a"), 3: (4.5, "a")}
    assert dict(got.dtypes)["id"] == "bigint"
    assert dict(got.dtypes)["val"] == "double"


def test_csv_sidecar_without_recorded_cols_refuses_loudly(spark, ts_env):
    """A pre-recording csv sidecar commit (no change_data.cols) has an
    unrecoverable column order — the stream must refuse, never guess."""
    import json as _json

    import etl_demo_spark.io.manifest as m

    table = f"{ts_env}/t18b"
    sink, ck = f"{ts_env}/t18b_sink", f"{ts_env}/t18b_ck"
    write_manifested(
        _mk_rows(spark, range(0, 4)), table, "part",
        fmt="csv", change_feed=True,
    )
    _drain(spark, table, sink, ck)
    v = 2
    delete_where_manifested(
        spark, table, F.col("id") >= 2, "part", fmt="csv"
    )
    # simulate a legacy commit: strip the recorded column order
    mp = m._manifest_path(table, v)
    raw = _json.loads(open(mp, "rb").read())
    assert raw["change_data"].pop("cols", None) is not None
    with open(mp, "w") as fh:
        _json.dump(raw, fh)
    with pytest.raises(Exception, match="cols|STREAM_FAILED"):
        _drain(spark, table, sink, ck)


def test_json_change_feed_streams_rewrites(spark, ts_env):
    """JSON is self-describing per line: change sidecars stream, so a
    DELETE on a json change_feed table rides through as CDC rows."""
    table = f"{ts_env}/t19"
    sink, ck = f"{ts_env}/t19_sink", f"{ts_env}/t19_ck"
    write_manifested(
        _mk_rows(spark, range(0, 4)), table, "part",
        fmt="json", change_feed=True,
    )
    _drain(spark, table, sink, ck)
    delete_where_manifested(
        spark, table, F.col("id") >= 2, "part", fmt="json"
    )
    got = _drain(spark, table, sink, ck)
    dels = got.filter("_change_type = 'delete'")
    assert dels.count() == 2
    assert set(dels.select("id").toPandas()["id"]) == {2, 3}


def _start_live(spark, table, sink, ck, trigger="300 milliseconds"):
    return (
        spark.readStream.format("tablestream")
        .option("path", table)
        .load()
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ck)
        .trigger(processingTime=trigger)
        .start()
    )


def _wait_rows(spark, q, sink, n, timeout=60):
    import time as _time

    deadline = _time.time() + timeout
    while _time.time() < deadline:
        if q.exception() is not None:
            raise q.exception()
        try:
            if spark.read.parquet(sink).count() >= n:
                return
        except Exception:
            pass
        _time.sleep(0.3)
    raise TimeoutError(f"sink never reached {n} rows")


def test_add_column_under_live_checkpoint_fails_then_resumes(spark, ts_env):
    """Round-10 schema-evolution policy: a running stream pins its
    output schema at start; an ALTER add landing mid-run FAILS LOUDLY
    (silently dropping the new column would be CDC data loss), and a
    restart resumes the same checkpoint exactly-once under the evolved
    schema — older files NULL-filled."""
    import time as _time

    table = f"{ts_env}/t20"
    sink, ck = f"{ts_env}/t20_sink", f"{ts_env}/t20_ck"
    write_manifested(_mk_rows(spark, range(0, 4)), table, "part")
    q = _start_live(spark, table, sink, ck)
    try:
        _wait_rows(spark, q, sink, 4)
        alter_manifested(spark, table, add_columns={"extra": "int"})  # v2
        append_manifested(
            spark,
            table,
            spark.createDataFrame(
                [(50, "a", 9.0, 7)],
                "id BIGINT, part STRING, val DOUBLE, extra INT",
            ),
        )  # v3
        deadline = _time.time() + 90
        while q.exception() is None and _time.time() < deadline:
            _time.sleep(0.3)
        exc = q.exception()
        assert exc is not None, "live stream must refuse the evolved schema"
        assert "schema evolved" in str(exc) and "Restart" in str(exc)
    finally:
        q.stop()
    # restart: same checkpoint, evolved schema, exactly-once
    q = _start_live(spark, table, sink, ck)
    try:
        _wait_rows(spark, q, sink, 5)
    finally:
        q.stop()
        q.awaitTermination(30)
    got = spark.read.option("mergeSchema", "true").parquet(sink)
    assert got.count() == 5
    assert got.select("id").distinct().count() == 5, "exactly once"
    assert got.filter("extra = 7").count() == 1


def test_rename_under_live_checkpoint_streams_transparently(spark, ts_env):
    """Renames alone stream through a live checkpoint: column mapping
    freezes physical names, so the pinned reader keeps serving values
    under the OLD logical name; a restart surfaces the new one."""
    table = f"{ts_env}/t21"
    sink, ck = f"{ts_env}/t21_sink", f"{ts_env}/t21_ck"
    write_manifested(_mk_rows(spark, range(0, 3)), table, "part")
    q = _start_live(spark, table, sink, ck)
    try:
        _wait_rows(spark, q, sink, 3)
        alter_manifested(spark, table, rename_columns={"val": "amount"})
        append_manifested(
            spark,
            table,
            spark.createDataFrame(
                [(9, "a", 4.5)], "id BIGINT, part STRING, amount DOUBLE"
            ),
        )  # v3, physical name frozen
        _wait_rows(spark, q, sink, 4)  # raises if the stream died
        assert q.exception() is None, "rename must be transparent mid-run"
    finally:
        q.stop()
        q.awaitTermination(30)
    got = spark.read.parquet(sink)  # old logical name throughout the run
    assert got.filter("id = 9 AND val = 4.5").count() == 1
    # a restart surfaces the new logical name (same sink — the file
    # sink's _spark_metadata is keyed to the checkpoint's batch ids)
    append_manifested(
        spark,
        table,
        spark.createDataFrame(
            [(10, "a", 5.5)], "id BIGINT, part STRING, amount DOUBLE"
        ),
    )
    q = _start_live(spark, table, sink, ck)
    try:
        _wait_rows(spark, q, sink, 5)
    finally:
        q.stop()
        q.awaitTermination(30)
    got2 = spark.read.option("mergeSchema", "true").parquet(sink)
    assert "amount" in got2.columns
    assert got2.filter("id = 10 AND amount = 5.5").count() == 1
    assert got2.select("id").distinct().count() == 5, "exactly once"


def test_widen_under_live_checkpoint_fails_then_resumes(spark, ts_env):
    """A type widen mid-run fails loudly (the pinned reader would
    downcast new files); the restarted stream serves the widened type
    for old and new files alike."""
    import time as _time

    table = f"{ts_env}/t22"
    sink, ck = f"{ts_env}/t22_sink", f"{ts_env}/t22_ck"
    write_manifested(
        spark.createDataFrame(
            [(1, "a", 10), (2, "a", 20)], "id BIGINT, part STRING, qty INT"
        ),
        table,
        "part",
    )
    q = _start_live(spark, table, sink, ck)
    try:
        _wait_rows(spark, q, sink, 2)
        alter_manifested(spark, table, widen_types={"qty": "bigint"})
        append_manifested(
            spark,
            table,
            spark.createDataFrame(
                [(3, "a", 5_000_000_000)], "id BIGINT, part STRING, qty BIGINT"
            ),
        )
        deadline = _time.time() + 90
        while q.exception() is None and _time.time() < deadline:
            _time.sleep(0.3)
        exc = q.exception()
        assert exc is not None and "schema evolved" in str(exc)
    finally:
        q.stop()
    q = _start_live(spark, table, sink, ck)
    try:
        _wait_rows(spark, q, sink, 3)
    finally:
        q.stop()
        q.awaitTermination(30)
    # (mergeSchema refuses INT vs BIGINT; the explicit widened schema
    # upcasts the pre-widen files, same as the table reader does)
    got = spark.read.schema(
        "id BIGINT, qty BIGINT, part STRING, "
        "_change_type STRING, _commit_version BIGINT"
    ).parquet(sink)
    assert got.filter("qty = 5000000000").count() == 1, "widened value intact"
    assert got.select("id").distinct().count() == 3


def test_two_paced_consumers_have_isolated_cursors(spark, ts_env):
    """Round-10 (consumer groups): N pace_ids = N independent
    consumers. Each (checkpoint, pace_id) pair drains the whole table
    exactly-once at its own rate; neither's cursor, committed
    high-water, nor planned grant ever touches the other's sidecar."""
    import json as _json
    import os as _os

    from etl_demo_spark.io.table_stream import run_paced_drain

    table = f"{ts_env}/t23"
    write_manifested(
        _mk_rows(spark, range(0, 8)).repartition(4), table, "part"
    )
    append_manifested(
        spark, table, _mk_rows(spark, range(8, 12), "b").repartition(2)
    )

    def build_writer(sink, ck):
        def b(df):
            return (
                df.writeStream.format("parquet")
                .option("path", sink)
                .option("checkpointLocation", ck)
            )

        return b

    # consumer A drains fully at 2 files/slice
    sa, ca = f"{ts_env}/t23_sa", f"{ts_env}/t23_ca"
    stats_a = run_paced_drain(
        spark, table, build_writer(sa, ca), 2, "groupA",
        max_partition_bytes="0",
    )
    # consumer B starts AFTER A finished, slower (1 file/slice)
    sb, cb = f"{ts_env}/t23_sb", f"{ts_env}/t23_cb"
    stats_b = run_paced_drain(
        spark, table, build_writer(sb, cb), 1, "groupB",
        max_partition_bytes="0",
    )
    for sink, stats in ((sa, stats_a), (sb, stats_b)):
        got = spark.read.parquet(sink)
        assert got.count() == 12
        assert got.select("id").distinct().count() == 12, "exactly once"
        assert stats["rows"] == 12
    assert stats_b["runs"] > stats_a["runs"], "B must pace slower"
    # the sidecars are separate files with independent cursors
    pace = lambda pid: _os.path.join(table, "_manifests", f".pace-{pid}")
    da = _json.loads(open(pace("groupA")).read())
    db = _json.loads(open(pace("groupB")).read())
    assert da["cur"] == db["cur"] == {"v": 2}, (da, db)
    # a new append: A drains it without disturbing B's cursor
    append_manifested(spark, table, _mk_rows(spark, [99], "c"))
    run_paced_drain(
        spark, table, build_writer(sa, ca), 2, "groupA",
        max_partition_bytes="0",
    )
    assert spark.read.parquet(sa).count() == 13
    assert _json.loads(open(pace("groupB")).read())["cur"] == {"v": 2}, (
        "A's drain moved B's cursor"
    )
    assert spark.read.parquet(sb).count() == 12


@pytest.mark.parametrize("fmt", ["csv", "json"])
def test_nonparquet_schema_evolution_null_backfills(spark, ts_env, fmt):
    """Round-10 (formats x evolution): an ALTER add on a csv/json table
    leaves old files with fewer columns. csv files are a strict PREFIX
    of the stored column list (adds append at the end), so the reader
    retries shorter prefixes; json null-fills missing keys natively.
    A fresh stream delivers old rows with NULL backfill and new rows
    with values — same contract as the batch reader."""
    table = f"{ts_env}/t24_{fmt}"
    sink, ck = f"{ts_env}/t24_{fmt}_sink", f"{ts_env}/t24_{fmt}_ck"
    write_manifested(_mk_rows(spark, range(0, 3)), table, "part", fmt=fmt)
    alter_manifested(spark, table, add_columns={"extra": "int"}, fmt=fmt)
    append_manifested(
        spark,
        table,
        spark.createDataFrame(
            [(50, "a", 9.0, 7)],
            "id BIGINT, part STRING, val DOUBLE, extra INT",
        ),
        fmt=fmt,
    )
    got = _drain(spark, table, sink, ck)
    assert got.count() == 4
    assert got.filter("extra IS NULL").count() == 3, "old files null-fill"
    assert got.filter("extra = 7 AND id = 50").count() == 1
    # value parity with the batch reader on the evolved table
    body = got.drop("_change_type", "_commit_version")
    batch = read_manifested(spark, table, fmt).select(*body.columns)
    assert body.exceptAll(batch).count() == 0
    assert batch.exceptAll(body).count() == 0
