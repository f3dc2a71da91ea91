"""Structured Streaming tests: the streaming engine must produce exactly
the batch results over the same input (batch/stream unification)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_demo_spark.io.sources import load_tables
from etl_demo_spark.streaming import (
    hourly_event_stats,
    read_events_stream,
    run_stream_to_memory,
)
from etl_demo_spark.streaming.stateful import user_running_counters

SF0001 = "/root/testdata/sf0.001"


def test_stream_equals_batch_hourly(spark):
    stream = read_events_stream(spark, SF0001)
    got = run_stream_to_memory(spark, hourly_event_stats(stream), "t_stream_hourly")

    batch = load_tables(spark, SF0001, tables=("events",))["events"]
    want = hourly_event_stats(batch)

    a = {(r["hour_start"], r["event_type"]): (r["n_events"], r["total_value"]) for r in got.collect()}
    b = {(r["hour_start"], r["event_type"]): (r["n_events"], r["total_value"]) for r in want.collect()}
    assert a == b


def test_stateful_counters_match_batch(spark):
    stream = read_events_stream(spark, SF0001)
    out = run_stream_to_memory(
        spark, user_running_counters(stream), "t_stream_state", output_mode="update"
    )
    # last update per user = final state
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    final = {
        r["user_id"]: (r["n_events"], r["total_value"], r["max_value"])
        for r in out.withColumn("rn", F.row_number().over(w)).filter("rn = 1").collect()
    }

    batch = load_tables(spark, SF0001, tables=("events",))["events"]
    want = {
        r["user_id"]: (r["n"], r["tot"], r["mx"])
        for r in batch.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("tot"), F.max("value").alias("mx"))
        .collect()
    }
    assert set(final) == set(want)
    for u in want:
        assert final[u][0] == want[u][0], u
        assert abs(final[u][1] - want[u][1]) < 1e-6, u
        assert final[u][2] == want[u][2], u


def test_transform_with_state_profile_matches_batch(spark):
    """transformWithStateInPandas (state v2) per-user profile: final
    MapState/ValueState values must equal batch aggregates. Skipped where
    the v2 worker protocol can't run (needs the protobuf runtime — see
    stateful.transform_with_state_available)."""
    import pytest

    from etl_demo_spark.streaming.stateful import (
        transform_with_state_available,
        user_type_profile,
    )

    if not transform_with_state_available():
        pytest.skip("google.protobuf not installed: transformWithState v2 worker can't run")

    provider_key = "spark.sql.streaming.stateStore.providerClass"
    saved = spark.conf.get(provider_key, None)
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = read_events_stream(spark, SF0001)
        out = run_stream_to_memory(
            spark, user_type_profile(stream), "t_tws_profile", output_mode="update"
        )
    finally:
        if saved is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, saved)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    final = {
        r["user_id"]: (r["n_types"], r["n_events"])
        for r in out.withColumn("rn", F.row_number().over(w)).filter("rn = 1").collect()
    }
    batch = load_tables(spark, SF0001, tables=("events",))["events"]
    want = {
        r["user_id"]: (r["nt"], r["n"])
        for r in batch.groupBy("user_id")
        .agg(F.countDistinct("event_type").alias("nt"), F.count("*").alias("n"))
        .collect()
    }
    assert final == want


def test_session_window_closes_on_gap(spark):
    import datetime

    from etl_demo_spark.streaming import session_window_agg

    base = datetime.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, base),
        (1, base + datetime.timedelta(minutes=10)),   # same session
        (1, base + datetime.timedelta(minutes=55)),   # > 30 min gap → new session
        (2, base),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = session_window_agg(df).collect()
    by_user = {}
    for r in got:
        by_user.setdefault(r["user_id"], []).append(r["n_events"])
    assert sorted(by_user[1]) == [1, 2]
    assert by_user[2] == [1]


def test_foreach_batch_sink_writes_parquet(spark, tmp_path):
    from etl_demo_spark.streaming.windows import run_stream_foreach_batch

    stream = read_events_stream(spark, SF0001)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    run_stream_foreach_batch(stream.select("event_id", "user_id", "value"), out, ckpt)
    back = spark.read.parquet(out)
    assert back.count() == 1000
    # restart with same checkpoint: no new batches, no duplication
    stream2 = read_events_stream(spark, SF0001)
    run_stream_foreach_batch(stream2.select("event_id", "user_id", "value"), out, ckpt)
    assert spark.read.parquet(out).count() == 1000


def test_sqlite_replace_idempotent(spark, tmp_path):
    import sqlite3

    from etl_demo_spark.io.sinks import write_sqlite_append

    df = spark.read.parquet(f"{SF0001}/region.parquet")
    db = str(tmp_path / "r.db")
    write_sqlite_append(df, db, "t", if_exists="replace")
    write_sqlite_append(df, db, "t", if_exists="replace")
    con = sqlite3.connect(db)
    assert con.execute("SELECT COUNT(*) FROM t").fetchone()[0] == 5
    con.close()


def test_watermark_finalizes_windows_append_mode(spark, tmp_path):
    """Append-mode windowed agg with a watermark emits a window exactly
    once, only after the watermark passes its end — and withholds windows
    that are still open. (Late-row *dropping* is explicitly best-effort in
    Spark and not asserted; finalization semantics are the guarantee.)
    Two micro-batches via maxFilesPerTrigger=1."""
    import datetime

    src = tmp_path / "src"
    src.mkdir()
    early = spark.createDataFrame(
        [
            (datetime.datetime(2024, 1, 1, 0, 5), "a", 1.0),
            (datetime.datetime(2024, 1, 1, 9, 0), "a", 1.0),  # watermark -> 08:00
        ],
        "ts timestamp, k string, v double",
    )
    late = spark.createDataFrame(
        [
            (datetime.datetime(2024, 1, 1, 0, 10), "a", 1.0),  # window 00:00 << 08:00 -> dropped
            (datetime.datetime(2024, 1, 1, 9, 10), "a", 1.0),  # current -> kept in state
        ],
        "ts timestamp, k string, v double",
    )
    early.coalesce(1).write.parquet(str(src / "b0"))
    late.coalesce(1).write.parquet(str(src / "b1"))

    from pyspark.sql import functions as F2

    stream = (
        spark.readStream.schema("ts timestamp, k string, v double")
        .option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false")
        .parquet(str(src) + "/*")
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F2.window("ts", "1 hour").alias("w"), "k")
        .agg(F2.count("*").alias("n"))
        .select(F2.col("w.start").alias("ws"), "k", "n")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("t_late")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = [(r["ws"].hour, r["n"]) for r in spark.table("t_late").collect()]
    finalized_hours = [h for h, _ in rows]
    # exactly one emission, for the closed 00:00 window only
    assert finalized_hours == [0], rows
    # the 09:00 window is still open (watermark hasn't passed 10:00) and
    # must NOT have been emitted
    assert 9 not in finalized_hours, rows
    # the watermark did advance past the first batch's max event time
    watermarks = [p["eventTime"].get("watermark") for p in q.recentProgress]
    assert any(w and w.startswith("2024-01-01T08") for w in watermarks), watermarks


def test_stream_dedup_within_watermark(spark, tmp_path):
    """dropDuplicatesWithinWatermark removes duplicates arriving within
    the watermark horizon, with bounded state."""
    import datetime

    from etl_demo_spark.streaming.windows import dedup_stream

    src = tmp_path / "dsrc"
    src.mkdir()
    base = datetime.datetime(2024, 1, 1, 0, 0)
    rows = [
        (1, base, "a"),
        (1, base + datetime.timedelta(minutes=1), "a"),  # dup key within horizon
        (2, base + datetime.timedelta(minutes=2), "b"),
    ]
    spark.createDataFrame(rows, "k long, ts timestamp, v string").coalesce(1).write.parquet(
        str(src / "f0")
    )
    stream = spark.readStream.schema("k long, ts timestamp, v string").parquet(str(src) + "/*")
    out = dedup_stream(stream, ["k"])
    q = (
        out.writeStream.format("memory")
        .queryName("t_dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(r["k"] for r in spark.table("t_dedup").collect())
    assert got == [1, 2]


def test_stream_stream_join_equals_batch(spark):
    from etl_demo_spark.io.sources import load_tables
    from etl_demo_spark.streaming.windows import purchases_after_clicks

    stream = read_events_stream(spark, SF0001)
    streamed = run_stream_to_memory(
        spark, purchases_after_clicks(stream), "t_ssj", output_mode="append"
    )
    batch = load_tables(spark, SF0001, tables=("events",))["events"]
    want = purchases_after_clicks(batch)
    a = {(r["click_id"], r["purchase_id"]) for r in streamed.collect()}
    b = {(r["click_id"], r["purchase_id"]) for r in want.collect()}
    assert a == b and len(a) > 0


def test_incremental_file_arrival_processes_only_new_data(spark, tmp_path):
    """Incremental ingestion: after the first availableNow run drains the
    directory, a second run with the SAME checkpoint processes exactly
    the newly arrived files — nothing re-read, nothing missed. This is
    the contract a scheduled backfill/ingest job relies on."""
    import pyspark.sql.functions as F

    from etl_demo_spark.streaming.windows import run_stream_foreach_batch

    src = tmp_path / "incoming"
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

    batch1 = docs.filter(F.col("doc_id") % 2 == 0)
    batch1.coalesce(1).write.mode("append").parquet(str(src))

    def stream():
        return (
            spark.readStream.schema(docs.schema).parquet(str(src))
            .select("doc_id", "lang", "n_chars")
        )

    run_stream_foreach_batch(stream(), out, ckpt)
    n1 = spark.read.parquet(out).count()
    assert n1 == batch1.count()

    batch2 = docs.filter(F.col("doc_id") % 2 == 1)
    batch2.coalesce(1).write.mode("append").parquet(str(src))

    run_stream_foreach_batch(stream(), out, ckpt)
    back = spark.read.parquet(out)
    assert back.count() == docs.count()  # old data NOT duplicated
    assert back.select("doc_id").distinct().count() == docs.count()


def test_stateful_counters_all_null_values_emit_null_max(spark, tmp_path):
    """A user whose every value is NULL must emit max_value NULL (not the
    -inf state sentinel) and total 0.0, while n_events still counts rows."""
    import pyspark.sql.functions as F

    from etl_demo_spark.streaming.stateful import user_running_counters
    from etl_demo_spark.streaming.windows import run_stream_to_memory

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(1, None), (1, None), (2, 5.0), (2, None)], "user_id long, value double"
    ).write.parquet(src)
    stream = (
        spark.readStream.schema("user_id long, value double").parquet(src)
    )
    out = run_stream_to_memory(
        spark, user_running_counters(stream), "nulls_counters", output_mode="update"
    )
    rows = {r.user_id: r for r in out.collect()}
    assert rows[1].n_events == 2 and rows[1].max_value is None and rows[1].total_value == 0.0
    assert rows[2].n_events == 2 and rows[2].max_value == 5.0 and rows[2].total_value == 5.0


def test_stream_cdc_upsert_partition_scoped(spark, tmp_path):
    """Streaming CDC upsert (foreachBatch + partition-scoped MERGE): a
    second batch touching only one segment must leave every other
    partition's files byte-identical (same names, bytes, mtimes), and the
    final table must equal the logical last-write-wins merge."""
    import hashlib
    from pathlib import Path

    from etl_demo_spark.streaming.windows import run_stream_cdc_upsert

    target = str(tmp_path / "dim")
    inbox = tmp_path / "inbox"
    inbox.mkdir()
    ckpt = str(tmp_path / "ckpt")
    schema = "id INT, name STRING, seg STRING"

    def state(root):
        return {
            str(p.relative_to(root)): (
                hashlib.md5(p.read_bytes()).hexdigest(),
                p.stat().st_mtime,
            )
            for p in Path(root).rglob("*")
            if p.is_file() and not p.name.startswith((".", "_"))
        }

    spark.createDataFrame(
        [(1, "alpha", "A"), (2, "beta", "B"), (3, "gamma", "C")], schema
    ).coalesce(1).write.parquet(str(inbox / "b0"))
    stream = spark.readStream.schema(schema).parquet(str(inbox / "*"))
    run_stream_cdc_upsert(stream, target, ["id"], "seg", ckpt)
    before = state(target)
    assert {r.id: r.name for r in spark.read.parquet(target).collect()} == {
        1: "alpha", 2: "beta", 3: "gamma"
    }

    # batch 2: update in A (two rows for id 1 — last wins) + insert in A
    spark.createDataFrame(
        [(1, "ALPHA-mid", "A"), (1, "ALPHA-final", "A"), (9, "iota", "A")], schema
    ).coalesce(1).write.parquet(str(inbox / "b1"))
    stream = spark.readStream.schema(schema).parquet(str(inbox / "*"))
    run_stream_cdc_upsert(stream, target, ["id"], "seg", ckpt)

    after = state(target)
    for part in ("seg=B", "seg=C"):
        assert {k: v for k, v in before.items() if part in k} == {
            k: v for k, v in after.items() if part in k
        }
    got = {r.id: (r.name, r.seg) for r in spark.read.parquet(target).collect()}
    assert got == {
        1: ("ALPHA-final", "A"),
        2: ("beta", "B"),
        3: ("gamma", "C"),
        9: ("iota", "A"),
    }


def test_transform_with_state_list_state_recent_k(spark):
    """transformWithState ListState (the Arrow list-transfer half of the
    v2 protocol): last-5-per-user buffer's final state must equal the
    batch top-5 by (ts_ms, event_id)."""
    from pyspark.sql import Window

    from etl_demo_spark.io.sources import read_events
    from etl_demo_spark.streaming import read_events_stream
    from etl_demo_spark.streaming.stateful import user_recent_events
    from etl_demo_spark.streaming.windows import run_stream_to_memory

    pk = "spark.sql.streaming.stateStore.providerClass"
    saved = spark.conf.get(pk, None)
    spark.conf.set(
        pk, "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    )
    try:
        stream = read_events_stream(spark, SF0001)
        out = run_stream_to_memory(
            spark, user_recent_events(stream, k=5), "t_recent_k", output_mode="update"
        )
        w = Window.partitionBy("user_id").orderBy(F.col("n_kept").desc())
        final = {
            r["user_id"]: (r["n_kept"], round(r["kept_value_sum"], 4))
            for r in out.withColumn("rn", F.row_number().over(w))
            .filter("rn=1")
            .collect()
        }
    finally:
        if saved is None:
            spark.conf.unset(pk)
        else:
            spark.conf.set(pk, saved)
    ev = read_events(spark, f"{SF0001}/events.parquet")
    w2 = Window.partitionBy("user_id").orderBy(
        F.unix_millis("ts").desc(), F.col("event_id").desc()
    )
    ref = {
        r["user_id"]: (r["n"], round(r["s"], 4))
        for r in ev.withColumn("rn", F.row_number().over(w2))
        .filter("rn <= 5")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("s"))
        .collect()
    }
    assert final == ref


def test_transform_with_state_event_time_timers(spark, tmp_path):
    """transformWithState EVENT-TIME timers (Register/Delete + expiry
    callback): two micro-batches; users idle past the gap when the
    watermark advances must emit exactly one expiry row with their true
    last-seen and expiry timestamps; re-active and fresh users must not."""
    import datetime

    from etl_demo_spark.streaming.stateful import user_inactivity_expiry

    pk = "spark.sql.streaming.stateStore.providerClass"
    saved = spark.conf.get(pk, None)
    spark.conf.set(
        pk, "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    )
    try:
        inbox = tmp_path / "in"
        inbox.mkdir()
        schema = "user_id long, ts timestamp"
        dt = lambda s: datetime.datetime.utcfromtimestamp(s)  # noqa: E731
        spark.createDataFrame(
            [(1, dt(1000)), (2, dt(1200)), (3, dt(2000))], schema
        ).coalesce(1).write.parquet(str(inbox / "f1"))
        spark.createDataFrame(
            [(3, dt(10000)), (9, dt(10001))], schema
        ).coalesce(1).write.parquet(str(inbox / "f2"))
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(inbox / "*"))
        )
        out_df = user_inactivity_expiry(stream, gap_ms=1800_000, watermark="0 seconds")
        q = (
            out_df.writeStream.format("memory")
            .queryName("t_exp_timers")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if saved is None:
            spark.conf.unset(pk)
        else:
            spark.conf.set(pk, saved)
    got = sorted(
        (r["user_id"], r["last_seen_ms"], r["expired_at_ms"])
        for r in spark.table("t_exp_timers").collect()
    )
    # users 1,2: last seen in batch 1, gap passed when batch 2's watermark
    # (10000s) arrives; user 3 re-registered by batch 2; user 9 fresh
    assert got == [
        (1, 1_000_000, 2_800_000),
        (2, 1_200_000, 3_000_000),
    ]


def test_replay_source_drain_and_paced_modes(spark, tmp_path):
    """Custom replay streaming source (Python DataSourceStreamReader):
    (a) availableNow full drain over executor-parallel range partitions
    equals the batch aggregate; (b) paced mode under a processing-time
    trigger delivers the same totals across multiple micro-batches."""
    import time

    from etl_demo_spark.io.replay_source import (
        register_replay_source,
        write_replay_log,
    )
    from etl_demo_spark.io.sources import read_events

    register_replay_source(spark)
    ev = read_events(spark, f"{SF0001}/events.parquet")
    log = str(tmp_path / "log")
    write_replay_log(ev, log, ["ts", "event_id"])
    want = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }

    stream = (
        spark.readStream.format("replay")
        .option("path", log)
        .option("partition_rows", 200)
        .load()
    )
    q = (
        stream.groupBy("event_type").agg(F.count("*").alias("n"))
        .writeStream.format("memory").queryName("t_replay_drain")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck1"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = {r["event_type"]: r["n"] for r in spark.table("t_replay_drain").collect()}
    assert got == want

    paced = (
        spark.readStream.format("replay")
        .option("path", log)
        .option("batch_rows", 300)
        .load()
    )
    q2 = (
        paced.groupBy("event_type").agg(F.count("*").alias("n"))
        .writeStream.format("memory").queryName("t_replay_paced")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(processingTime="50 milliseconds").start()
    )
    deadline = time.time() + 90
    while time.time() < deadline:
        rows = spark.table("t_replay_paced").collect()
        if rows and sum(r["n"] for r in rows) >= sum(want.values()):
            break
        time.sleep(0.3)
    q2.stop()
    got2 = {r["event_type"]: r["n"] for r in spark.table("t_replay_paced").collect()}
    assert got2 == want
    assert len(q2.recentProgress) >= 2  # genuinely multi-batch


def test_replay_log_growth_resumes_into_cdc_upsert(spark, tmp_path):
    """End-to-end lakehouse loop: a growing sorted CDC log replayed
    through the custom streaming source into the partition-scoped MERGE
    sink. The second availableNow run must resume from the checkpointed
    ROW-INDEX offset (processing only the log's new tail), apply
    last-wins by the CDC sequence, and leave unaffected partitions'
    files byte-identical."""
    import hashlib

    from etl_demo_spark.io.replay_source import (
        register_replay_source,
        write_replay_log,
    )
    from etl_demo_spark.streaming.windows import run_stream_cdc_upsert

    register_replay_source(spark)
    target = str(tmp_path / "dim")
    log = str(tmp_path / "log")
    ck = str(tmp_path / "ck")
    schema = "seq long, id INT, name STRING, seg STRING"

    def files(part: str) -> dict:
        return {
            str(p): hashlib.md5(p.read_bytes()).hexdigest()
            for p in (tmp_path / "dim").rglob("*.parquet")
            if part in str(p)
        }

    epoch1 = [(1, 1, "alpha", "A"), (2, 2, "beta", "B"), (3, 1, "alpha2", "A")]
    write_replay_log(spark.createDataFrame(epoch1, schema), log, ["seq"])
    stream = spark.readStream.format("replay").option("path", log).load()
    run_stream_cdc_upsert(stream, target, ["id"], "seg", ck, order_col="seq")
    assert {r.id: r.name for r in spark.read.parquet(target).collect()} == {
        1: "alpha2", 2: "beta"
    }
    b_before = files("seg=B")

    # the log GROWS append-only in seq order: the prefix row order is
    # unchanged, so the checkpointed index offset stays valid
    epoch2 = epoch1 + [(4, 3, "gamma", "C"), (5, 1, "alpha3", "A")]
    write_replay_log(spark.createDataFrame(epoch2, schema), log, ["seq"])
    stream2 = spark.readStream.format("replay").option("path", log).load()
    run_stream_cdc_upsert(stream2, target, ["id"], "seg", ck, order_col="seq")

    assert {r.id: r.name for r in spark.read.parquet(target).collect()} == {
        1: "alpha3", 2: "beta", 3: "gamma"
    }
    assert files("seg=B") == b_before  # untouched partition: same bytes


def test_stream_cdc_tombstones_delete_and_replay_idempotent(spark, tmp_path):
    """CDC with a Debezium-style op column: a key whose LAST batch event
    is the tombstone is deleted (earlier same-batch upserts ignored), a
    key whose tombstone precedes a later upsert survives, the op column
    never lands in the table, and replaying the whole feed from a fresh
    checkpoint converges to the same table (idempotency)."""
    from etl_demo_spark.streaming.windows import run_stream_cdc_upsert

    target = str(tmp_path / "dim")
    inbox = tmp_path / "inbox"
    inbox.mkdir()
    schema = "id INT, name STRING, seg STRING, seq LONG, op STRING"

    spark.createDataFrame(
        [(1, "alpha", "A", 1, "U"), (2, "beta", "B", 2, "U"), (3, "gamma", "C", 3, "U")],
        schema,
    ).coalesce(1).write.parquet(str(inbox / "b0"))
    stream = spark.readStream.schema(schema).parquet(str(inbox / "*"))
    run_stream_cdc_upsert(
        stream, target, ["id"], "seg", str(tmp_path / "ck1"),
        order_col="seq", op_col="op",
    )
    assert {r.id for r in spark.read.parquet(target).collect()} == {1, 2, 3}
    assert "op" not in spark.read.parquet(target).columns

    # batch 2: id1 upsert-then-tombstone (→ deleted), id2 tombstone-then-
    # upsert (→ survives updated), id4 inserted
    spark.createDataFrame(
        [
            (1, "ALPHA2", "A", 10, "U"), (1, None, "A", 11, "D"),
            (2, None, "B", 12, "D"), (2, "BETA2", "B", 13, "U"),
            (4, "delta", "A", 14, "U"),
        ],
        schema,
    ).coalesce(1).write.parquet(str(inbox / "b1"))
    stream = spark.readStream.schema(schema).parquet(str(inbox / "*"))
    run_stream_cdc_upsert(
        stream, target, ["id"], "seg", str(tmp_path / "ck1"),
        order_col="seq", op_col="op",
    )
    got = {r.id: (r.name, r.seg) for r in spark.read.parquet(target).collect()}
    assert got == {2: ("BETA2", "B"), 3: ("gamma", "C"), 4: ("delta", "A")}
    import os

    assert not os.path.isdir(os.path.join(target, "seg=A")) or got  # A holds id4
    assert got[4] == ("delta", "A")

    # full replay from a FRESH checkpoint over the same inbox → same table
    target2 = str(tmp_path / "dim2")
    stream = spark.readStream.schema(schema).parquet(str(inbox / "*"))
    run_stream_cdc_upsert(
        stream, target2, ["id"], "seg", str(tmp_path / "ck2"),
        order_col="seq", op_col="op",
    )
    got2 = {r.id: (r.name, r.seg) for r in spark.read.parquet(target2).collect()}
    assert got2 == got


def test_stream_cdc_manifest_mode_reader_always_sees_complete_snapshot(
    spark, tmp_path
):
    """mode="manifest" CDC sink: a batch reader loop racing the stream
    must observe, on EVERY read, one of the complete committed snapshots
    — never a half-merged table, a vanished partition, or a torn state.
    Tombstones apply as their own atomic commit, so the upsert-applied /
    delete-pending intermediate is itself a complete valid snapshot."""
    import threading

    from etl_demo_spark.io.manifest import load_manifest, read_manifested
    from etl_demo_spark.streaming.windows import run_stream_cdc_upsert

    target = str(tmp_path / "dim")
    inbox = tmp_path / "inbox"
    inbox.mkdir()
    ckpt = str(tmp_path / "ckpt")
    schema = "id INT, name STRING, seg STRING, op STRING"

    def feed(batch_name, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(inbox / batch_name)
        )
        stream = spark.readStream.schema(schema).parquet(str(inbox / "*"))
        run_stream_cdc_upsert(
            stream, target, ["id"], "seg", ckpt, op_col="op", mode="manifest"
        )

    # bootstrap commit (s0) before the reader starts
    feed("b0", [(1, "alpha", "A", "U"), (2, "beta", "B", "U"),
                (3, "gamma", "A", "U"), (4, "delta", "B", "U")])
    s0 = {1: "alpha", 2: "beta", 3: "gamma", 4: "delta"}
    s1 = {**s0, 1: "v1", 9: "iota"}
    s2a = {**s1, 3: "v2"}
    s2b = {k: v for k, v in s2a.items() if k != 2}
    s3 = {**s2b, 7: "eta"}
    valid = [s0, s1, s2a, s2b, s3]

    stop = threading.Event()
    violations: list = []
    seen: set = set()

    def reader():
        while not stop.is_set():
            got = {
                r.id: r.name for r in read_manifested(spark, target).collect()
            }
            seen.add(tuple(sorted(got.items())))
            if got not in valid:
                violations.append(got)

    t = threading.Thread(target=reader, daemon=True)
    t.start()
    try:
        feed("b1", [(1, "v1", "A", "U"), (9, "iota", "A", "U")])
        feed("b2", [(3, "v2", "A", "U"), (2, "beta", "B", "D")])
        feed("b3", [(7, "eta", "B", "U")])
    finally:
        stop.set()
        t.join(timeout=120)

    assert not violations, violations[:3]
    assert len(seen) >= 2  # the reader actually raced the commits
    got = {r.id: r.name for r in read_manifested(spark, target).collect()}
    assert got == s3
    version, mapping = load_manifest(spark, target)
    # b1 upsert, b2 upsert, b2 delete, b3 upsert = 4 commits after init
    assert version == 5
    assert all(rel.split("/")[0] in ("seg=A", "seg=B") for rel in mapping)


def test_stream_cdc_dv_tombstones_no_rewrite(spark, tmp_path):
    """delete_mode="dv": tombstones apply as deletion-vector commits —
    the tombstone batch rewrites NO data file (byte-identical inventory),
    deleted keys disappear from reads, replays stay idempotent, and a
    later OPTIMIZE materializes the deletions."""
    import glob
    import os

    import pytest

    from etl_demo_spark.io.manifest import (
        _hadoop_fs,
        _load_doc,
        compact_manifested,
        read_manifested,
    )
    from etl_demo_spark.streaming.windows import run_stream_cdc_upsert

    target = str(tmp_path / "dim")
    inbox = tmp_path / "inbox"
    inbox.mkdir()
    ckpt = str(tmp_path / "ckpt")
    schema = "id INT, name STRING, seg STRING, op STRING"

    def feed(batch_name, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(inbox / batch_name)
        )
        stream = spark.readStream.schema(schema).parquet(str(inbox / "*"))
        run_stream_cdc_upsert(
            stream, target, ["id"], "seg", ckpt,
            op_col="op", mode="manifest", delete_mode="dv",
        )

    feed("b0", [(1, "alpha", "A", "U"), (2, "beta", "B", "U"),
                (3, "gamma", "A", "U")])

    inventory = {
        f: os.path.getmtime(f)
        for f in glob.glob(f"{target}/seg=*/__v*/*.parquet")
    }
    feed("b1", [(2, "beta", "B", "D")])  # pure-tombstone batch
    after = {
        f: os.path.getmtime(f)
        for f in glob.glob(f"{target}/seg=*/__v*/*.parquet")
    }
    assert inventory == after, "DV tombstones must rewrite no data file"
    got = {r.id: r.name for r in read_manifested(spark, target).collect()}
    assert got == {1: "alpha", 3: "gamma"}
    fs, jvm = _hadoop_fs(spark, target)
    doc = _load_doc(fs, jvm, target)
    assert doc.get("dv") and sum(doc["dv"]["files"].values()) == 1

    # replay idempotence: re-run the whole inbox on a FRESH checkpoint
    stream = spark.readStream.schema(schema).parquet(str(inbox / "*"))
    run_stream_cdc_upsert(
        stream, target, ["id"], "seg", str(tmp_path / "ckpt2"),
        op_col="op", mode="manifest", delete_mode="dv",
    )
    got = {r.id: r.name for r in read_manifested(spark, target).collect()}
    assert got == {1: "alpha", 3: "gamma"}

    # the feed's OPTIMIZE pass materializes the deletions
    compact_manifested(spark, target, min_files=1)
    doc = _load_doc(fs, jvm, target)
    assert "dv" not in doc
    got = {r.id: r.name for r in read_manifested(spark, target).collect()}
    assert got == {1: "alpha", 3: "gamma"}

    with pytest.raises(ValueError, match="needs mode='manifest'"):
        run_stream_cdc_upsert(
            spark.readStream.schema(schema).parquet(str(inbox / "*")),
            target, ["id"], "seg", ckpt, delete_mode="dv",
        )


def test_stream_cdc_catalog_pins_batches_atomically(spark, tmp_path):
    """catalog_root/catalog_table on the CDC sink: each micro-batch's
    upsert + tombstone pair becomes visible through the catalog in ONE
    flip; a crash between the table commits and the pin leaves catalog
    readers on the previous batch, and the checkpoint replay converges."""
    import pytest

    from etl_demo_spark.io.catalog import (
        catalog_init,
        catalog_snapshot,
        catalog_versions,
    )
    from etl_demo_spark.io.manifest import read_manifested, write_manifested
    from etl_demo_spark.streaming.windows import run_stream_cdc_upsert

    target = str(tmp_path / "dim")
    cat = str(tmp_path / "cat")
    inbox = tmp_path / "inbox"
    inbox.mkdir()
    ckpt = str(tmp_path / "ckpt")
    schema = "id INT, name STRING, seg STRING, op STRING"

    # bootstrap the member table + catalog before the feed starts
    write_manifested(
        spark.createDataFrame([(0, "seed", "A", "U")], schema).drop("op"),
        target,
        "seg",
    )
    catalog_init(spark, cat, {"dim": target})

    with pytest.raises(ValueError, match="requires mode='manifest'"):
        run_stream_cdc_upsert(
            spark.readStream.schema(schema).parquet(str(inbox / "*")),
            target, ["id"], "seg", ckpt,
            catalog_root=cat, catalog_table="dim",
        )
    with pytest.raises(ValueError, match="go together"):
        run_stream_cdc_upsert(
            spark.readStream.schema(schema).parquet(str(inbox / "*")),
            target, ["id"], "seg", ckpt,
            mode="manifest", catalog_root=cat,
        )

    def feed(batch_name, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(inbox / batch_name)
        )
        stream = spark.readStream.schema(schema).parquet(str(inbox / "*"))
        run_stream_cdc_upsert(
            stream, target, ["id"], "seg", ckpt,
            op_col="op", mode="manifest", delete_mode="dv",
            catalog_root=cat, catalog_table="dim",
        )

    # batch 1: upsert two keys AND delete the seed — two table commits,
    # one catalog flip
    feed("b0", [(1, "alpha", "A", "U"), (2, "beta", "B", "U"),
                (0, "seed", "A", "D")])
    snap = catalog_snapshot(spark, cat)
    got = {r.id: r.name for r in snap.read("dim").collect()}
    assert got == {1: "alpha", 2: "beta"}
    v_after_b0 = snap.version

    # crash injection: tombstone apply dies AFTER the merge commit →
    # the catalog must still serve batch-1 state (never the torn one)
    import etl_demo_spark.streaming.windows as win

    import etl_demo_spark.io.manifest as man

    real_dv = man.delete_keys_dv_manifested

    def boom(*a, **k):
        raise RuntimeError("injected crash before catalog pin")

    man_patch = pytest.MonkeyPatch()
    man_patch.setattr(
        "etl_demo_spark.streaming.windows.delete_keys_dv_manifested",
        boom,
        raising=False,
    )
    # the sink imports inside the function, so patch the source module
    man_patch.setattr(man, "delete_keys_dv_manifested", boom)
    spark.createDataFrame(
        [(3, "gamma", "A", "U"), (1, "alpha", "A", "D")], schema
    ).coalesce(1).write.parquet(str(inbox / "b1"))
    stream = spark.readStream.schema(schema).parquet(str(inbox / "*"))
    with pytest.raises(Exception):
        run_stream_cdc_upsert(
            stream, target, ["id"], "seg", ckpt,
            op_col="op", mode="manifest", delete_mode="dv",
            catalog_root=cat, catalog_table="dim",
        )
    man_patch.undo()

    # direct table read CAN see the half-applied batch (merge landed,
    # delete didn't) — that is exactly the seam...
    direct = {r.id for r in read_manifested(spark, target).collect()}
    assert 3 in direct and 1 in direct
    # ...but the catalog still serves the complete batch-1 state
    snap2 = catalog_snapshot(spark, cat)
    assert snap2.version == v_after_b0
    assert {r.id: r.name for r in snap2.read("dim").collect()} == {
        1: "alpha", 2: "beta"
    }

    # recovery: replay converges and the pin lands
    stream = spark.readStream.schema(schema).parquet(str(inbox / "*"))
    run_stream_cdc_upsert(
        stream, target, ["id"], "seg", ckpt,
        op_col="op", mode="manifest", delete_mode="dv",
        catalog_root=cat, catalog_table="dim",
    )
    final = catalog_snapshot(spark, cat)
    assert final.version > v_after_b0
    assert {r.id: r.name for r in final.read("dim").collect()} == {
        2: "beta", 3: "gamma"
    }
    assert len(catalog_versions(spark, cat)) >= 3


def test_stream_append_exactly_once_under_replay(spark, tmp_path):
    """The streaming APPEND sink: per-batch rows land as extra vrels
    (no rewrite), and a FULL REPLAY on a fresh checkpoint — the failure
    mode where a bare blind append duplicates every row — is a no-op
    because the batch id rides the commit as a transaction version."""
    import glob
    import os

    from etl_demo_spark.io.manifest import (
        _hadoop_fs,
        _load_doc,
        read_manifested,
        write_manifested,
    )
    from etl_demo_spark.streaming.windows import run_stream_append

    target = str(tmp_path / "events")
    inbox = tmp_path / "inbox"
    inbox.mkdir()
    schema = "id INT, v INT, part STRING"
    write_manifested(
        spark.createDataFrame([(0, 0, "p0")], schema), target, "part"
    )

    def feed(batch_name, rows, ckpt):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(inbox / batch_name)
        )
        stream = spark.readStream.schema(schema).parquet(str(inbox / "*"))
        run_stream_append(stream, target, ckpt, txn_app="t1")

    ck1 = str(tmp_path / "ck1")
    feed("b0", [(1, 10, "p0"), (2, 20, "p1")], ck1)
    inventory = {
        f: os.path.getmtime(f)
        for f in glob.glob(f"{target}/part=*/__v*/*.parquet")
    }
    feed("b1", [(3, 30, "p0")], ck1)
    after = {
        f: os.path.getmtime(f)
        for f in glob.glob(f"{target}/part=*/__v*/*.parquet")
    }
    assert inventory.items() <= after.items(), "append sink rewrote a file"
    got = {r.id for r in read_manifested(spark, target).collect()}
    assert got == {0, 1, 2, 3}

    # FULL REPLAY on a fresh checkpoint: both batches re-offered as
    # batch 0 — at-or-below the recorded txn version -> skipped
    stream = spark.readStream.schema(schema).parquet(str(inbox / "*"))
    run_stream_append(stream, target, str(tmp_path / "ck2"), txn_app="t1")
    got2 = {r.id for r in read_manifested(spark, target).collect()}
    assert got2 == {0, 1, 2, 3}, "replay duplicated appended rows"

    # a DIFFERENT app id is an independent transaction line and applies
    stream = spark.readStream.schema(schema).parquet(str(inbox / "*"))
    run_stream_append(stream, target, str(tmp_path / "ck3"), txn_app="t2")
    assert read_manifested(spark, target).count() == 4 + 3  # dup by design
    doc = _load_doc(*_hadoop_fs(spark, target), target)
    assert set(doc["txns"]) == {"t1", "t2"}


def test_stream_cdc_mor_upserts_rewrite_free(spark, tmp_path):
    """upsert_mode="mor" + delete_mode="dv": after bootstrap, NO
    micro-batch rewrites a data file — upserts tombstone + append,
    tombstone ops land as deletion vectors; reads stay correct and a
    fresh-checkpoint replay converges."""
    import glob
    import os

    from etl_demo_spark.io.manifest import (
        _hadoop_fs,
        _load_doc,
        read_manifested,
    )
    from etl_demo_spark.streaming.windows import run_stream_cdc_upsert

    target = str(tmp_path / "dim")
    inbox = tmp_path / "inbox"
    inbox.mkdir()
    ckpt = str(tmp_path / "ckpt")
    schema = "id INT, name STRING, seg STRING, op STRING"

    def feed(batch_name, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(inbox / batch_name)
        )
        stream = spark.readStream.schema(schema).parquet(str(inbox / "*"))
        run_stream_cdc_upsert(
            stream, target, ["id"], "seg", ckpt,
            op_col="op", mode="manifest",
            delete_mode="dv", upsert_mode="mor",
        )

    feed("b0", [(1, "alpha", "A", "U"), (2, "beta", "B", "U"),
                (3, "gamma", "A", "U")])
    inventory = {
        f: os.path.getmtime(f)
        for f in glob.glob(f"{target}/seg=*/__v*/*.parquet")
    }
    # update + insert + delete across two batches: zero rewrites
    feed("b1", [(1, "ALPHA", "A", "U"), (4, "delta", "B", "U")])
    feed("b2", [(3, "gamma", "A", "D")])
    after = {
        f: os.path.getmtime(f)
        for f in glob.glob(f"{target}/seg=*/__v*/*.parquet")
    }
    for f, sig in inventory.items():
        assert after.get(f) == sig, f"MoR CDC batch rewrote a file: {f}"
    got = {r.id: r.name for r in read_manifested(spark, target).collect()}
    assert got == {1: "ALPHA", 2: "beta", 4: "delta"}
    fs, jvm = _hadoop_fs(spark, target)
    doc = _load_doc(fs, jvm, target)
    assert doc.get("dv") and doc.get("extra_vrels")

    # fresh-checkpoint replay of the whole inbox converges (idempotent
    # last-wins per key; MoR tombstones re-apply harmlessly)
    stream = spark.readStream.schema(schema).parquet(str(inbox / "*"))
    run_stream_cdc_upsert(
        stream, target, ["id"], "seg", str(tmp_path / "ckpt2"),
        op_col="op", mode="manifest",
        delete_mode="dv", upsert_mode="mor",
    )
    got = {r.id: r.name for r in read_manifested(spark, target).collect()}
    assert got == {1: "ALPHA", 2: "beta", 4: "delta"}
