"""Physical-layout tools for the 100 TB posture: Z-order clustered
writes for multi-dimensional data skipping.

A parquet scan can prune row groups / files only when the filter column's
min-max ranges are narrow per file. A sort on one column gives perfect
pruning on that column and none on the others; Z-ordering interleaves the
bits of several columns so every file covers a small hyper-rectangle of
the key space — all interleaved dimensions prune well (the technique
popularized by lakehouse table formats, implemented here with nothing but
built-in column expressions; see docs/SCALE_LAYOUT.md).

Scale shape: one tiny min/max aggregate per write (driver-side, the only
extra pass), then a narrow key projection, a range repartition on the key
(one shuffle — the same shuffle a plain sorted write would do), and a
within-partition sort. Nothing leaves the JVM.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 16 bits per dimension: 2 dims fill 32 bits, 4 dims fill 64. More
# resolution than files-per-write in any sane layout job.
_BITS = 16


def _quantize(c: Column, lo: float, hi: float, bits: int = _BITS) -> Column:
    """Scale a numeric column to an integer in [0, 2^bits) via its global
    min/max. Layout-only math — result ordering, not row values, so double
    rounding here is harmless."""
    span = hi - lo
    if span <= 0:  # constant column: every row in bucket 0
        return F.lit(0).cast("long")
    scaled = (c.cast("double") - F.lit(float(lo))) / F.lit(float(span))
    return F.least(
        F.greatest((scaled * F.lit(float((1 << bits) - 1))).cast("long"), F.lit(0)),
        F.lit((1 << bits) - 1),
    )


def zorder_key(quantized: list[Column], bits: int = _BITS) -> Column:
    """Interleave the bits of pre-quantized integer columns into one long
    (Morton code). Pure built-ins — shiftleft/shiftright/bitwise — so the
    whole key is whole-stage-codegen'd.

    ``bits × len(quantized)`` must stay ≤ 63: bit 63 is the long's sign
    bit (keys would go negative and sort FIRST, shredding the clustering),
    and Java shift amounts wrap mod 64 (higher bits would silently alias
    low bits). Callers size ``bits`` per column count (write_zordered)."""
    if bits * len(quantized) > 63:
        raise ValueError(
            f"zorder_key: {bits} bits × {len(quantized)} columns exceeds the "
            "63 usable bits of a long (sign bit / shift wrap-around)"
        )
    terms = []
    n = len(quantized)
    for i in range(bits):
        for j, q in enumerate(quantized):
            bit = F.shiftright(q, i).bitwiseAND(F.lit(1))
            terms.append(F.shiftleft(bit, i * n + j))
    return reduce(lambda a, b: a.bitwiseOR(b), terms).cast("long")


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    num_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet clustered by the Z-order of ``cols``.

    Two passes: a min/max agg over the cluster columns (tiny — one row to
    the driver), then range-repartition + sort on the Morton key and a
    plain parquet write. Every output file then spans a compact
    hyper-rectangle in ``cols`` space, so min/max footer stats prune scans
    filtered on ANY of the clustered columns — not just a lead sort key."""
    if not cols:
        raise ValueError("write_zordered: need at least one cluster column")
    # per-column resolution shrinks with column count so the interleaved
    # key never reaches the long's sign bit (zorder_key invariant)
    bits = min(_BITS, 63 // len(cols))
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"__lo_{c}"), F.max(c).alias(f"__hi_{c}")]
    stats = df.agg(*aggs).collect()[0]
    bounds = {}
    for c in cols:
        lo, hi = stats[f"__lo_{c}"], stats[f"__hi_{c}"]
        if lo is None or hi is None:
            raise ValueError(
                f"write_zordered: column {c!r} is all-NULL — cannot cluster on it"
            )
        try:
            bounds[c] = (float(lo), float(hi))
        except (TypeError, ValueError) as e:
            raise ValueError(
                f"write_zordered: column {c!r} is not numeric "
                f"(min={lo!r}) — cast dates/timestamps to epoch numbers first"
            ) from e
    quantized = [_quantize(F.col(c), *bounds[c], bits=bits) for c in cols]
    key = zorder_key(quantized, bits=bits)
    (
        df.withColumn("__zkey", key)
        .repartitionByRange(num_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode(mode)
        .parquet(path)
    )


def file_inventory(df: DataFrame) -> DataFrame:
    """Per-file inventory of a file-sourced DataFrame via the hidden
    ``_metadata`` struct: path, size, row count. The maintenance view
    that decides WHEN to compact (many small files) — no directory
    listing on the driver, the scan itself carries the metadata."""
    return (
        df.select(
            F.col("_metadata.file_path").alias("file_path"),
            F.col("_metadata.file_size").alias("file_size"),
        )
        .groupBy("file_path", "file_size")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


def compact_parquet(
    spark,
    src_path: str,
    dst_path: str,
    target_file_bytes: int = 256 * 1024 * 1024,
) -> int:
    """Compact a small-files parquet directory into ~``target_file_bytes``
    outputs; returns the file count written. Output count is estimated
    from the CURRENT total byte size (compression carries over ~1:1 for
    a rewrite). At 100 TB this runs per partition directory after
    streaming ingestion (foreachBatch writers produce one file per
    micro-batch per partition — the canonical small-files source).

    Writes to a NEW path: compaction must be atomic-swap (write, verify,
    rename/repoint), never in-place."""
    df = spark.read.parquet(src_path)
    total_bytes = (
        df.select(F.col("_metadata.file_path").alias("p"), F.col("_metadata.file_size").alias("s"))
        .groupBy("p").agg(F.first("s").alias("s"))
        .agg(F.sum("s")).collect()[0][0]
    ) or 1
    n_files = max(1, -(-int(total_bytes) // target_file_bytes))
    df.repartition(n_files).write.mode("overwrite").parquet(dst_path)
    return n_files
