"""Training-corpus preparation pipeline: quality gates → exact dedup →
near-dup clustering → PII scrub → deterministic splits → partitioned
parquet.

The batch job an LLM-data team runs per corpus version, composed from the
engine's operators (SURVEY.md §2.2 X-12/X-14). Every stage is lazy; the
only actions are the final writes and a tiny stats collect.

Scale shape: quality gates prune in the scan stage; exact dedup shuffles
16-byte fingerprints; near-dup work is LSH-bounded (pairs ≪ corpus) and
its delete list semi-joins back; the split column is a narrow projection,
and the writer partitions by it so downstream training jobs read
``split=train/`` via partition pruning — no file-level filtering.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_demo_spark.dedup import (
    connected_components,
    jaccard_verify,
    minhash_lsh_candidates,
)
from etl_demo_spark.text import fingerprint, pii_counts, scrub_pii, split_assign, token_count


@dataclass
class CorpusPrepConfig:
    min_chars: int = 150
    min_tokens: int = 25
    near_dup_threshold: float = 0.5
    minhash_hashes: int = 32
    minhash_bands: int = 8
    train_frac: float = 0.8
    val_frac: float = 0.1
    splits_partitioned: bool = True
    extra: dict = field(default_factory=dict)


def quality_gate(docs: DataFrame, cfg: CorpusPrepConfig) -> DataFrame:
    """Length + token-count gates (cheap, scan-stage) with the token
    count kept as a column — downstream accounting reuses it."""
    return docs.filter(F.length("text") >= cfg.min_chars).withColumn(
        "n_tokens", token_count("text")
    ).filter(F.col("n_tokens") >= cfg.min_tokens)


def exact_dedup_keep(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Keep the min-id document per normalized-text fingerprint."""
    keep = (
        docs.select(F.col(id_col), fingerprint("text").alias("fp"))
        .groupBy("fp")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    return docs.join(keep, id_col, "left_semi")


def near_dup_delete_list(docs: DataFrame, cfg: CorpusPrepConfig) -> DataFrame:
    """Ids to drop: everything in a near-dup cluster except the min-id
    representative (pairs → components → per-component min)."""
    pairs = jaccard_verify(
        minhash_lsh_candidates(
            docs, num_hashes=cfg.minhash_hashes, bands=cfg.minhash_bands
        ),
        docs,
        threshold=cfg.near_dup_threshold,
    )
    comp = connected_components(pairs)
    keepers = comp.groupBy("component").agg(F.min("id").alias("keeper"))
    return (
        comp.join(keepers, "component")
        .filter(F.col("id") != F.col("keeper"))
        .select(F.col("id").alias("doc_id"))
    )


def run_corpus_prep(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    cfg: CorpusPrepConfig | None = None,
) -> dict:
    """Run the full prep job; returns per-split accounting.

    Output layout: ``{output_path}/split=train|val|test/part-*.parquet``
    (partition-pruned reads for training jobs).
    """
    import uuid

    from etl_demo_spark.clean import observed

    cfg = cfg or CorpusPrepConfig()
    docs = spark.read.parquet(input_path)
    # zero-extra-pass accounting: these observations evaluate during the
    # output write below, not as separate scans (names unique per session)
    tag = uuid.uuid4().hex[:8]
    docs, obs_in = observed(docs, f"prep_in_{tag}", rows=F.count(F.lit(1)))
    gated = quality_gate(docs, cfg)
    gated, obs_gated = observed(gated, f"prep_gated_{tag}", rows=F.count(F.lit(1)))
    deduped = exact_dedup_keep(gated)
    drops = near_dup_delete_list(deduped, cfg)
    kept = deduped.join(drops, "doc_id", "left_anti")
    # PII hygiene: redact emails/phones in-place; the audit counter rides
    # the write action via observe (no extra scan)
    n_em, n_ph = pii_counts("text")
    kept = kept.withColumn("_pii_hits", n_em + n_ph)
    kept, obs_pii = observed(
        kept,
        f"prep_pii_{tag}",
        docs_with_pii=F.sum(F.when(F.col("_pii_hits") > 0, 1).otherwise(0)),
    )
    scrubbed = kept.withColumn("text", scrub_pii(F.col("text"))).drop("_pii_hits")
    final = scrubbed.withColumn(
        "split", split_assign("doc_id", cfg.train_frac, cfg.val_frac)
    )
    writer = final.write.mode("overwrite")
    if cfg.splits_partitioned:
        writer = writer.partitionBy("split")
    writer.parquet(output_path)

    stats_rows = (
        spark.read.parquet(output_path)
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("n_tokens").cast("long")).alias("total_tokens"),
        )
        .collect()
    )
    stats = {
        r["split"]: {"n_docs": r["n_docs"], "total_tokens": r["total_tokens"]}
        for r in stats_rows
    }
    stats["_pipeline"] = {
        "input_docs": obs_in.get["rows"],
        "passed_quality_gates": obs_gated.get["rows"],
        "kept_after_dedup": sum(v["n_docs"] for k, v in stats.items() if k != "_pipeline"),
        "docs_with_pii_scrubbed": obs_pii.get["docs_with_pii"],
    }
    return stats


def main(argv: list[str] | None = None) -> None:
    import argparse

    from etl_demo_spark.session import get_spark

    p = argparse.ArgumentParser(description="training-corpus preparation")
    p.add_argument("input", help="documents parquet path")
    p.add_argument("output", help="output directory (split-partitioned parquet)")
    p.add_argument("--min-chars", type=int, default=150)
    p.add_argument("--min-tokens", type=int, default=25)
    p.add_argument("--near-dup-threshold", type=float, default=0.5)
    args = p.parse_args(argv)

    spark = get_spark(app_name="corpus-prep")
    stats = run_corpus_prep(
        spark,
        args.input,
        args.output,
        CorpusPrepConfig(
            min_chars=args.min_chars,
            min_tokens=args.min_tokens,
            near_dup_threshold=args.near_dup_threshold,
        ),
    )
    pipe = stats.pop("_pipeline", {})
    if pipe:
        print(
            f"input: {pipe['input_docs']} docs -> "
            f"{pipe['passed_quality_gates']} past gates -> "
            f"{pipe['kept_after_dedup']} kept"
        )
    for split, s in sorted(stats.items()):
        print(f"{split}: {s['n_docs']} docs, {s['total_tokens']} tokens")


if __name__ == "__main__":
    main()
