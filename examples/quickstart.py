"""Quickstart: the engine's public API end-to-end in one runnable script.

For a user of the reference repo switching over — each section mirrors a
task they run today (or a scale task the reference can't do) and prints a
small result. Run:

    PYTHONPATH=. python examples/quickstart.py [TRADES_CSV] [SF_DIR]

Defaults: the reference's shipped CSV and /root/testdata/sf0.001.
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    trades_csv = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/trades (1) (2) (1).csv"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"

    from etl_demo_spark.session import get_spark

    spark = get_spark(app_name="quickstart")
    spark.sparkContext.setLogLevel("ERROR")
    out = Path(tempfile.mkdtemp(prefix="quickstart_"))

    # 1. The reference's whole pipeline: extract → clean → PnL → load → report
    from etl_demo_spark.pipelines.weekly_trades import run_etl

    res = run_etl(
        spark,
        trades_csv,
        sqlite_path=str(out / "agg_result.db"),
        report_path=str(out / "top_clients.xlsx"),
        add_timestamp=False,
    )
    print(f"[trades] {res.rows_loaded} weekly groups -> {out/'agg_result.db'}")
    print(f"[trades] report -> {res.report_path}")

    # 2. Read the artifacts BACK through Spark (SQLite + xlsx sources)
    from etl_demo_spark.io.sqlite_source import register_sqlite_source
    from etl_demo_spark.io.xlsx_source import register_xlsx_source

    register_sqlite_source(spark)
    register_xlsx_source(spark)
    agg = (
        spark.read.format("sqlite")
        .option("path", str(out / "agg_result.db"))
        .option("table", "agg_trades_weekly")
        .load()
    )
    report = spark.read.format("xlsx").load(str(res.report_path))
    print(f"[sources] sqlite rows={agg.count()}, xlsx rows={report.count()}")

    # 3. Relational analytics on the star schema (plain DataFrame API)
    from pyspark.sql import functions as F

    from etl_demo_spark.io.sources import load_tables

    t = load_tables(spark, sf_dir, tables=("orders", "customer"))
    top_seg = (
        t["orders"]
        .join(F.broadcast(t["customer"]), t["orders"].o_custkey == t["customer"].c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.sum("o_totalprice").alias("revenue"))
        .orderBy(F.col("revenue").desc())
        .limit(3)
    )
    print("[analytics] top segments:", [tuple(r) for r in top_seg.collect()])

    # 4. Training-data ops: dedup, quality, deterministic sampling
    docs = load_tables(spark, sf_dir, tables=("documents",))["documents"]

    from etl_demo_spark.dedup import exact_dedup_by_fingerprint
    from etl_demo_spark.ops import stratified_exact_sample, weighted_sample

    dedup = exact_dedup_by_fingerprint(docs)
    n_dupes = dedup.filter(F.col("n_copies") > 1).count()
    print(f"[dedup] fingerprint groups with duplicates: {n_dupes}")
    sample = weighted_sample(
        docs.select("doc_id", F.length("text").alias("n_chars")),
        weight_col="n_chars", n=5, id_col="doc_id", seed="demo",
    )
    print("[sampling] length-weighted pick:", [r.doc_id for r in sample.collect()])
    strat = stratified_exact_sample(docs, ["lang"], 2, "doc_id", seed="demo")
    print(f"[sampling] 2-per-language rows: {strat.count()}")

    # 5. Vector search over the embeddings table
    emb = load_tables(spark, sf_dir, tables=("embeddings",))["embeddings"]
    from etl_demo_spark.vec import brute_force_topk, lsh_topk

    qv = [float(v) for v in emb.first()["embedding"]]
    exact = brute_force_topk(emb, qv, k=3).collect()
    approx = lsh_topk(emb, qv, k=3, planes=6, probe_radius=2).collect()
    print("[ann] exact top-3:", [(r[0], r[1]) for r in exact])
    print("[ann] lsh top-3:  ", [(r[0], r[1]) for r in approx])

    # 6. Streaming: the same hourly aggregation on the real streaming engine
    from etl_demo_spark.streaming import (
        hourly_event_stats,
        read_events_stream,
        run_stream_to_memory,
    )

    stream = read_events_stream(spark, sf_dir)
    stats = run_stream_to_memory(
        spark, hourly_event_stats(stream), "quickstart_stream", state_partitions=2
    )
    print(f"[streaming] hourly window rows: {stats.count()}")

    # 7. Table DML under the snapshot manifest: merge, erase, time travel
    from etl_demo_spark.io.manifest import (
        delete_keys_manifested,
        manifest_init,
        merge_upsert_manifested,
        read_manifested,
    )

    table = str(out / "customers")
    cust = t["customer"].select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
    cust.write.partitionBy("c_mktsegment").parquet(table)
    manifest_init(spark, table, "c_mktsegment", stats_cols=["c_custkey"])
    changes = cust.filter(F.col("c_custkey") % 50 == 0).withColumn(
        "c_acctbal", F.col("c_acctbal") + 100.0
    )
    touched = merge_upsert_manifested(
        spark, table, changes, ["c_custkey"], "c_mktsegment"
    )
    erased = delete_keys_manifested(
        spark, table,
        cust.filter(F.col("c_custkey") % 97 == 0).select("c_custkey"),
        ["c_custkey"], "c_mktsegment",
    )
    now = read_manifested(spark, table).count()
    # time travel: the retained window is the last 2 commits (older
    # manifests may survive on disk only as delta-chain ancestors)
    from etl_demo_spark.io.manifest import manifest_versions

    vs = manifest_versions(spark, table)
    prior = read_manifested(spark, table, version=vs[-2]).count()
    lookup = read_manifested(
        spark, table, prune_ranges={"c_custkey": (1, 40)}
    )
    print(
        f"[dml] merge touched {len(touched)} partitions, erase touched "
        f"{len(erased)}; rows now={now}, at v{vs[-2]}={prior} (time travel); "
        f"range lookup opened {len(lookup.inputFiles())} files"
    )

    # 7b. Table governance: DV deletes, ALTER, constraints, rollback
    from etl_demo_spark.io.manifest import (
        ConstraintViolation,
        add_constraint_manifested,
        alter_manifested,
        delete_rows_manifested,
        manifest_properties,
        rollback_manifested,
    )

    n_dv = delete_rows_manifested(spark, table, F.col("c_acctbal") < 0)
    alter_manifested(
        spark, table,
        rename_columns={"c_acctbal": "balance"},
        add_columns={"note": "string"},
    )
    add_constraint_manifested(spark, table, "key_pos", "c_custkey > 0")
    try:
        merge_upsert_manifested(
            spark, table,
            read_manifested(spark, table).limit(1).withColumn(
                "c_custkey", F.lit(-1)
            ),
            ["c_custkey"], "c_mktsegment",
        )
        raise AssertionError("constraint must refuse")
    except ConstraintViolation:
        refused = True
    # incident drill: a bad bulk update lands, RESTORE to the last good
    # snapshot as a new commit (history keeps the incident auditable)
    from etl_demo_spark.io.manifest import update_where_manifested

    last_good = manifest_versions(spark, table)[-1]
    update_where_manifested(
        spark, table, {"balance": F.lit(0.0)}, F.lit(True), "c_mktsegment"
    )
    rollback_manifested(spark, table, last_good)
    props = {r.key: r.value for r in manifest_properties(spark, table).collect()}
    print(
        f"[governance] dv-deleted {n_dv} rows in place (no rewrite); renamed "
        f"c_acctbal->balance as metadata; constraint refused a bad merge: "
        f"{refused}; table now v{props['version']} with "
        f"{props.get('dv.deleted_rows', '0')} DV rows pending compaction"
    )

    # 7c. Web-corpus prep: URL dedup + NFC normalization + RAG chunking
    from etl_demo_spark.text import nfc_normalize_udf
    from etl_demo_spark.web import url_dedup

    urls = docs.select(
        "doc_id",
        F.concat(
            F.lit("HTTPS://WWW."), F.col("source"), F.lit(".example.com/d/"),
            (F.col("doc_id") % 100).cast("string"),
            F.lit("?utm_source=feed&id="), (F.col("doc_id") % 100).cast("string"),
        ).alias("url"),
    )
    kept = url_dedup(urls)
    nfc = nfc_normalize_udf()
    n_norm = (
        docs.select(nfc(F.col("text")).alias("n"), "text")
        .filter(F.col("n") != F.col("text"))
        .count()
    )
    print(
        f"[web] {urls.count()} raw urls -> {kept.count()} canonical; "
        f"{n_norm} docs changed by NFC normalization"
    )

    # 7d. Compressed vector search: product quantization (4 bytes/vector)
    from etl_demo_spark.vec import pq_topk

    pq = pq_topk(emb, k=3, query_id=0, m=4, ksub=8, n_iter=2).collect()
    print("[ann] pq top-3 (ADC dist):", [(r[0], r[1]) for r in pq])

    # 8. Tokenizer training: BPE on the corpus word-frequency statistic
    from etl_demo_spark.bpe import bpe_encode, bpe_train, word_freqs

    merges, _ = bpe_train(word_freqs(docs), num_merges=8)
    enc = bpe_encode(docs.limit(3), merges)
    first = enc.select("doc_id", F.slice("bpe_tokens", 1, 8).alias("head")).first()
    print(f"[bpe] learned {len(merges)} merges; doc {first['doc_id']} head: {list(first['head'])}")

    print(f"\nartifacts in {out}")


if __name__ == "__main__":
    main()
