"""Structured Streaming operators (SURVEY.md §2.2 X-10).

Batch/stream unification is the design center: every transform here takes a
DataFrame and works identically on a batch frame and a `readStream` frame —
the reference's weekly batch aggregation (O-10) IS a tumbling window, so the
same function serves both (SURVEY.md §7 step 5).

Watermarks bound state: at 100 TB/day of events, an unbounded window state
OOMs; ``withWatermark`` lets Spark drop state for windows older than the
lateness budget and handles late data deterministically up to that bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

def _events_raw_schema(ts_type: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_type),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )


# (application id, path) → the probed physical type of events.ts. The
# probe is a footer-only batch read (~0.2-0.4 s of job overhead); caching
# it matters because the streaming corpus queries re-probe per invocation.
# Testdata directories are immutable for the app lifetime (io/sources.py
# documents the same contract for its table cache).
_TS_TYPE_CACHE: dict[tuple[str, str], T.DataType] = {}


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet (driver testdata).

    ``pathGlobFilter`` scopes the directory listing to the events file.
    The testdata's ``ts`` physical type has varied across driver rounds
    (TIMESTAMP(NANOS) → long via legacy read; TIMESTAMP(MICROS) →
    TIMESTAMP_NTZ), so probe the footer with a batch read (file metadata
    only — no data scan, cached per app+path) and normalize to
    session-zoned TIMESTAMP exactly as the batch reader does
    (io/sources.py:read_events). In production this is the same code over
    a growing directory / Kafka source — the transforms don't change."""
    import os

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = os.path.join(sf_dir, "events.parquet")
    key = (spark.sparkContext.applicationId, path)
    ts_type = _TS_TYPE_CACHE.get(key)
    if ts_type is None:
        ts_type = spark.read.parquet(path).schema["ts"].dataType
        _TS_TYPE_CACHE[key] = ts_type
    raw = (
        spark.readStream.schema(_events_raw_schema(ts_type))
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if isinstance(ts_type, T.LongType):
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if isinstance(ts_type, T.TimestampNTZType):
        return raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


def hourly_event_stats(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Tumbling 1-hour window × event_type: count + exact-decimal value sum.

    Works on batch and stream alike; on a stream the watermark bounds
    window state and admits late events up to 1 hour."""
    with_wm = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        with_wm.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("hour_start"), "event_type", "n_events", "total_value")
    )


def sliding_window_counts(events: DataFrame, size: str = "1 day", slide: str = "12 hours") -> DataFrame:
    """Sliding window (size 1d, slide 12h): each event lands in
    size/slide windows. Spark aligns window origins to the epoch."""
    with_wm = events.withWatermark("ts", "1 hour") if events.isStreaming else events
    return (
        with_wm.groupBy(F.window("ts", size, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )


def session_window_agg(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Session windows per user: a session closes after ``gap`` of
    inactivity. Emits session start, event count, and last-event time —
    all SQL-emulable (gaps-and-islands) for the oracle."""
    with_wm = events.withWatermark("ts", "1 hour") if events.isStreaming else events
    return (
        with_wm.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max("ts").alias("last_ts"),
        )
        .select(
            F.col("w.start").alias("session_start"),
            "user_id",
            "n_events",
            "last_ts",
        )
    )


def run_stream_foreach_batch(
    stream_df: DataFrame, out_dir: str, checkpoint_dir: str, mode: str = "overwrite"
) -> None:
    """foreachBatch sink: per-micro-batch custom writes with the batch id
    available for idempotence. Here each batch lands as parquet partitioned
    by batch id — the pattern for sinks Spark has no native writer for
    (JDBC upserts, external indexes). The checkpoint dir gives exactly-once
    batch tracking across restarts."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode(mode).parquet(f"{out_dir}/batch_id={batch_id}")

    q = (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_stream_append(
    stream_df: DataFrame,
    target_path: str,
    checkpoint_dir: str,
    txn_app: str = "stream_append",
    catalog_root: str | None = None,
    catalog_table: str | None = None,
) -> None:
    """Streaming APPEND sink for insert-only feeds (event logs, IoT,
    clickstreams): every micro-batch lands through the manifest layer's
    append fast path — O(batch) written, NO existing file read or
    rewritten — where the CDC upsert sink would re-merge (and therefore
    rewrite) the touched leaves on every batch.

    EXACTLY-ONCE under replay: the micro-batch id is recorded as a
    transaction version (``txn_app``) inside the SAME atomic commit as
    the data, so a restarted query re-offering an already-applied batch
    is a no-op — the guard a bare blind append lacks. The target table
    must exist (`write_manifested` bootstraps the layout and, if hidden
    partitioning is configured, appends derive their partition values
    from the stored spec).

    ``catalog_root``/``catalog_table`` additionally pin each batch's
    version in a multi-table catalog, same contract as the CDC sink."""
    if (catalog_root is None) != (catalog_table is None):
        raise ValueError(
            "run_stream_append: catalog_root and catalog_table go together"
        )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        from etl_demo_spark.io.manifest import (
            append_manifested,
            manifest_versions,
        )

        spark = batch_df.sparkSession
        append_manifested(
            spark,
            target_path,
            batch_df,
            txn_app=txn_app,
            txn_version=int(batch_id),
        )
        if catalog_root is not None:
            from etl_demo_spark.io.catalog import catalog_commit

            catalog_commit(
                spark,
                catalog_root,
                {catalog_table: manifest_versions(spark, target_path)[-1]},
            )

    q = (
        stream_df.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_stream_cdc_upsert(
    stream_df: DataFrame,
    target_path: str,
    keys: list[str],
    partition_col: str,
    checkpoint_dir: str,
    order_col: str | None = None,
    op_col: str | None = None,
    delete_op: str = "D",
    mode: str = "swap",
    delete_mode: str = "rewrite",
    upsert_mode: str = "rewrite",
    catalog_root: str | None = None,
    catalog_table: str | None = None,
) -> None:
    """Streaming CDC upsert sink: every micro-batch MERGEs into a
    partitioned parquet table via the partition-scoped merge
    (`io.tables.merge_upsert_partitioned`) — only the partitions the
    batch's keys touch are rewritten, so sink cost per batch tracks the
    CHANGE footprint, not table size. This is the streaming half of the
    lakehouse-style upsert pipeline: a CDC feed lands continuously while
    the table stays point-readable with pruned partitions.

    ``mode="manifest"`` commits every micro-batch atomically through the
    snapshot-manifest layer (`io.manifest.merge_upsert_manifested` /
    `delete_keys_manifested`): a batch reader racing the stream resolves
    a complete snapshot on every read — never a half-swapped table or a
    vanished partition, which the default ``"swap"`` sink can still
    expose during its rename window (documented there). The first batch
    bootstraps the layout and `manifest_init`s it; a pre-existing plain
    Hive table is migrated in place on the first merge (init is
    idempotent). Upsert and tombstone application stay two commits per
    batch — each individually atomic; replays keep both idempotent. The
    manifest layer's optimistic commit loop also makes this sink safe to
    run CONCURRENTLY with OPTIMIZE (`compact_manifested`) or a retention
    DELETE on the same table.

    ``delete_mode="dv"`` (manifest mode only) applies tombstones via
    DELETION VECTORS (`io.manifest.delete_keys_dv_manifested`) instead
    of a partition rewrite: per batch the tombstones cost O(positions)
    written, not O(affected partitions) — the write-amplification fix a
    long-lived CDC feed needs (a rewrite per micro-batch re-copies hot
    partitions continuously; the DV sidecar grows by the tombstone
    count, and the nightly OPTIMIZE the feed already needs for small
    files materializes the deletions in the same pass).

    ``upsert_mode="mor"`` (manifest mode only) applies the upserts
    merge-on-read too (`io.manifest.merge_upsert_mor_manifested`):
    matched rows' positions tombstone into the DV sidecar and the
    batch's rows land as append extras — per batch the sink writes
    O(batch), never a partition rewrite; with ``delete_mode="dv"`` the
    whole feed becomes rewrite-free between OPTIMIZE passes.

    ``catalog_root``/``catalog_table`` (manifest mode only) pin the
    table's post-batch version in a multi-table CATALOG
    (`io.catalog.catalog_commit`) after BOTH per-batch commits land.
    This closes the sink's one visibility seam: upsert and tombstone
    application are two individually-atomic table commits, so a direct
    table reader can land between them; a reader resolving through the
    catalog sees each micro-batch all-or-nothing. A crash between the
    table commits and the catalog pin leaves catalog readers on the
    previous batch's consistent state; the checkpoint replays the batch
    (both commits are idempotent) and the pin lands on retry.

    ``op_col`` turns on TOMBSTONE handling (the Debezium-style op field
    every real CDC feed carries): after per-key last-wins collapse, a
    key whose final event is ``delete_op`` is DELETED from the table
    (`io.tables.delete_keys_partitioned` — same partition scoping), any
    other final event upserts; the op column itself never lands in the
    table. A delete for an absent key is a no-op, so replays stay
    idempotent. Within one batch the upsert and delete key sets are
    disjoint by construction (only each key's last event survives), so
    apply order cannot matter.

    Semantics per batch: one surviving row per key — last-wins by
    ``order_col`` (the CDC sequence/LSN column every real feed carries;
    pass it whenever one exists). Without it, ``monotonically_increasing_
    id()`` approximates batch order: exact within each input partition,
    partition-ordered across them — fine for file-per-batch sources,
    NOT a total order for multi-partition Kafka batches with intra-key
    races (that's what the sequence column is for). Then source-wins
    MERGE. Replays after a crash re-apply the same batch; MERGE with
    source-wins is idempotent, so exactly-once lands on the checkpoint's
    at-least-once delivery. The first batch against an empty/missing
    target bootstraps the partitioned layout."""
    from etl_demo_spark.io.manifest import (
        delete_keys_dv_manifested,
        delete_keys_manifested,
        manifest_init,
        manifest_versions,
        merge_upsert_manifested,
        merge_upsert_mor_manifested,
    )

    if catalog_root is not None and mode != "manifest":
        raise ValueError(
            "run_stream_cdc_upsert: catalog pinning requires mode='manifest' "
            "(the catalog pins manifest versions)"
        )
    if (catalog_root is None) != (catalog_table is None):
        raise ValueError(
            "run_stream_cdc_upsert: catalog_root and catalog_table go together"
        )
    from etl_demo_spark.io.tables import (
        delete_keys_partitioned,
        merge_upsert_partitioned,
    )

    if mode not in ("swap", "manifest"):
        raise ValueError(f"run_stream_cdc_upsert: unknown mode {mode!r}")
    if delete_mode not in ("rewrite", "dv"):
        raise ValueError(
            f"run_stream_cdc_upsert: unknown delete_mode {delete_mode!r}"
        )
    if delete_mode == "dv" and mode != "manifest":
        raise ValueError(
            "run_stream_cdc_upsert: delete_mode='dv' needs mode='manifest' "
            "(deletion vectors live in the snapshot-manifest layer)"
        )
    if upsert_mode not in ("rewrite", "mor"):
        raise ValueError(
            f"run_stream_cdc_upsert: unknown upsert_mode {upsert_mode!r}"
        )
    if upsert_mode == "mor" and mode != "manifest":
        raise ValueError(
            "run_stream_cdc_upsert: upsert_mode='mor' needs mode='manifest' "
            "(merge-on-read lives in the snapshot-manifest layer)"
        )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        order = (
            F.col(order_col) if order_col else F.monotonically_increasing_id()
        )
        w = Window.partitionBy(*keys).orderBy(order.desc())
        last = (
            batch_df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        deletes = None
        if op_col is not None:
            deletes = last.filter(F.col(op_col) == delete_op).select(*keys)
            last = last.filter(F.col(op_col) != delete_op).drop(op_col)
        jvm = spark._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(target_path)
        fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
        if not fs.exists(hpath):
            # bootstrap: deletes against a not-yet-existing table are
            # no-ops; an all-tombstone first batch must not create an
            # empty layout the next merge's schema read would choke on
            if op_col is None or not last.isEmpty():
                last.write.partitionBy(partition_col).parquet(target_path)
                if mode == "manifest":
                    manifest_init(spark, target_path, partition_col)
        elif mode == "manifest":
            # idempotent: migrates a pre-existing plain table once,
            # no-ops on every later batch
            manifest_init(spark, target_path, partition_col)
            if upsert_mode == "mor":
                # per-batch cost = O(batch rows) written: matched
                # positions tombstone, the batch appends as extras —
                # the long-lived feed's write-amplification fix (its
                # periodic OPTIMIZE materializes + consolidates)
                merge_upsert_mor_manifested(
                    spark, target_path, last, keys
                )
            else:
                merge_upsert_manifested(
                    spark, target_path, last, keys, partition_col
                )
            if deletes is not None:
                if delete_mode == "dv":
                    delete_keys_dv_manifested(
                        spark, target_path, deletes, keys
                    )
                else:
                    delete_keys_manifested(
                        spark, target_path, deletes, keys, partition_col
                    )
        else:
            merge_upsert_partitioned(
                spark, target_path, last, keys, partition_col
            )
            if deletes is not None:
                delete_keys_partitioned(
                    spark, target_path, deletes, keys, partition_col
                )

        # catalog pin LAST: both table commits for this batch become
        # visible to catalog readers in one flip (all-or-nothing); a
        # crash before this line leaves them on the previous batch
        if catalog_root is not None and fs.exists(hpath):
            from etl_demo_spark.io.catalog import catalog_commit

            catalog_commit(
                spark,
                catalog_root,
                {catalog_table: manifest_versions(spark, target_path)[-1]},
            )

    q = (
        stream_df.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_stream_to_memory(
    spark: SparkSession,
    stream_df: DataFrame,
    table_name: str,
    output_mode: str = "complete",
    state_partitions: int | None = None,
) -> DataFrame:
    """Execute a streaming DataFrame to completion over the available input
    (availableNow trigger → memory sink) and return the result table.

    This is a REAL Structured Streaming execution — incremental planning,
    state store, watermarks — not a batch rewrite; used by the corpus so
    the driver's differential check covers the streaming engine.

    ``state_partitions`` sizes the stateful shuffle (the number of state-
    store partitions, fixed at checkpoint creation). Size it to the STATE
    cardinality, not the input volume: stateful aggregation does map-side
    partial aggregation, so the shuffle into N state partitions carries at
    most (#map tasks x #distinct keys) rows regardless of input size.
    Oversizing is a pure per-micro-batch tax — each state partition opens
    and commits its own store files every batch (measured on this host:
    a ~3600-key hourly window agg runs ~1.0 s at 2-4 partitions vs
    2.5-18 s at 32). The conf is set only between here and query start
    and restored after (each run uses a fresh temp checkpoint, so the
    chosen partitioning never leaks across runs)."""
    saved = spark.conf.get("spark.sql.shuffle.partitions")
    if state_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        q = (
            stream_df.writeStream.format("memory")
            .queryName(table_name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if state_partitions is not None:
            spark.conf.set("spark.sql.shuffle.partitions", saved)
    return spark.table(table_name)


def purchases_after_clicks(events: DataFrame, within: str = "1 hour") -> DataFrame:
    """Stream-stream inner join: purchases within ``within`` AFTER a click
    by the same user. On streams both sides are watermarked and the time-
    range condition bounds the join state (Spark drops click state once
    the purchase watermark passes click_ts + within). Works identically
    on batch frames — the corpus oracle is the plain SQL join."""
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    if clicks.isStreaming:
        clicks = clicks.withWatermark("click_ts", "1 hour")
        purchases = purchases.withWatermark("purchase_ts", "1 hour")
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") > F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {within}"))
    )
    return clicks.join(purchases, cond, "inner").select(
        F.col("c_user").alias("user_id"), "click_id", "purchase_id",
        "click_ts", "purchase_ts",
    )


def dedup_stream(events: DataFrame, keys: list[str], watermark: str = "1 hour") -> DataFrame:
    """Streaming exact dedup: dropDuplicatesWithinWatermark keeps state
    only for the watermark horizon — bounded memory on an infinite stream
    (plain dropDuplicates on a stream grows state forever)."""
    if events.isStreaming:
        return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)
    return events.dropDuplicates(keys)


def enriched_purchase_stats(
    events: DataFrame, customers: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """Stream-static join + windowed aggregation: purchases enriched with
    the customer's market segment (the static side broadcasts — each
    micro-batch probes the dimension, no stream state for the join), then
    a tumbling hourly count + exact-decimal value sum per segment.

    Works identically on a batch frame (the oracle path). At scale the
    static side is the broadcast-refreshed dimension pattern: re-read per
    restart, pinned per micro-batch."""
    purchases = events.filter(F.col("event_type") == "purchase")
    with_wm = (
        purchases.withWatermark("ts", watermark) if events.isStreaming else purchases
    )
    dim = F.broadcast(customers.select("c_custkey", "c_mktsegment"))
    return (
        with_wm.join(dim, with_wm.user_id == dim.c_custkey)
        .groupBy(F.window("ts", "1 hour").alias("w"), "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("hour_start"),
            "c_mktsegment",
            "n_purchases",
            "total_value",
        )
    )
