"""10k-file scale rehearsal for the manifest layer's DRIVER-side paths.

Every driver-side cost in io/manifest.py is O(files) or O(leaves):
`manifest_init`'s per-file stats/bloom collect, snapshot resolution,
prune decisions over the stats map, the DV delete's per-file counts
collect, and compaction's staging bookkeeping. The committed test/bench
layouts top out at ~112 files — two orders of magnitude below a real
deployment's partition counts — so this script builds a REAL manifested
table at a configurable file count (default 10,000: 100 date leaves x
100 files) and times each path end-to-end, printing one JSON line per
layout. Run with a smaller --files first for the comparison row:

    python scripts/scale_rehearsal_10k.py --files 100
    python scripts/scale_rehearsal_10k.py --files 10000

Numbers land in docs/SCALE_LAYOUT.md; the acceptance bar from the
round-6 review is "no super-linear step between 112 and 10k files".
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--files", type=int, default=10_000)
    ap.add_argument("--rows-per-file", type=int, default=500)
    ap.add_argument("--keep", action="store_true", help="keep the table dir")
    ap.add_argument(
        "--split", action="store_true",
        help="use the Iceberg-style split stats layout (per-leaf "
        "manifests + pointer-map snapshot) instead of embedded stats",
    )
    ap.add_argument(
        "--inline", action="store_true",
        help="create the table through the single-pass inline-stats "
        "writer (write_manifested stats_inline=True): files AND their "
        "stats from ONE job, no post-write scan",
    )
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from etl_demo_spark.io.manifest import (
        _hadoop_fs,
        _load_doc,
        compact_manifested,
        delete_rows_manifested,
        manifest_init,
        prune_files,
        prune_files_bloom,
        read_manifested,
    )
    from etl_demo_spark.session import get_spark

    spark = get_spark(app_name="scale-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")

    leaves = 100 if args.files >= 1000 else 8
    files_per_leaf = max(1, args.files // leaves)
    n_rows = leaves * files_per_leaf * args.rows_per_file
    root = tempfile.mkdtemp(prefix=f"rehearsal_{args.files}_") + "/t"

    # id is globally unique and SCATTERED across files (hash repartition),
    # so min/max never prunes it but the bloom tier must; v clusters by
    # leaf for the range-prune measurement.
    df = spark.range(n_rows).select(
        F.col("id"),
        (F.col("id") % leaves).cast("string").alias("dt"),
        (F.col("id") % leaves).alias("v"),
    )
    if args.inline:
        from etl_demo_spark.io.manifest import write_manifested

        t0 = time.perf_counter()
        write_manifested(
            df.repartition(files_per_leaf), root, ["dt"],
            stats_cols=["v"], bloom_cols=["id"],
            stats_split=args.split, stats_inline=True,
        )
        t_write = time.perf_counter() - t0
        t_init = 0.0  # no post-write stats pass exists on this path
    else:
        t0 = time.perf_counter()
        (
            df.repartition(files_per_leaf)
            .write.partitionBy("dt")
            .parquet(root)
        )
        t_write = time.perf_counter() - t0

        t0 = time.perf_counter()
        manifest_init(
            spark, root, ["dt"], stats_cols=["v"], bloom_cols=["id"],
            stats_split=args.split,
        )
        t_init = time.perf_counter() - t0

    fs, jvm = _hadoop_fs(spark, root)
    t0 = time.perf_counter()
    doc = _load_doc(fs, jvm, root)
    t_resolve = time.perf_counter() - t0
    from etl_demo_spark.io.manifest import _manifest_path, _materialized_files

    # split layout: resolution above loaded NO stats; time the full
    # materialization separately (the O(table) cost an unfiltered bloom
    # probe pays — a leaf-filtered read pays only its leaves)
    t0 = time.perf_counter()
    files_map = _materialized_files(fs, jvm, root, doc)
    t_stats_load = time.perf_counter() - t0
    n_files = len(files_map)
    pruned_doc = {**doc, "files": files_map}

    manifest_bytes = fs.getFileStatus(
        jvm.org.apache.hadoop.fs.Path(_manifest_path(root, doc["version"]))
    ).getLen()

    t0 = time.perf_counter()
    kept_range, total = prune_files(pruned_doc, {"v": (1, 1)})
    t_prune_range = time.perf_counter() - t0

    probe_id = n_rows // 2
    t0 = time.perf_counter()
    kept_bloom, _ = prune_files_bloom(spark, pruned_doc, {"id": probe_id})
    t_prune_bloom = time.perf_counter() - t0

    t0 = time.perf_counter()
    lf = read_manifested(spark, root, leaf_filter={"dt": "1"})
    lf_files = len(lf.inputFiles())
    t_leaf_filter = time.perf_counter() - t0

    t0 = time.perf_counter()
    n_del = delete_rows_manifested(spark, root, F.col("id") == probe_id)
    t_dv_delete = time.perf_counter() - t0

    t0 = time.perf_counter()
    compact_manifested(spark, root, min_files=2)
    t_compact = time.perf_counter() - t0
    post = _load_doc(fs, jvm, root)
    post = {**post, "files": _materialized_files(fs, jvm, root, post)}

    out = {
        "layout": "split" if args.split else "embedded",
        "stats_mode": "inline" if args.inline else "postscan",
        "write_plus_stats_sec": round(t_write + t_init, 2),
        "files": n_files,
        "leaves": leaves,
        "rows": n_rows,
        "write_layout_sec": round(t_write, 2),
        "manifest_init_sec": round(t_init, 2),
        "resolve_sec": round(t_resolve, 3),
        "stats_load_sec": round(t_stats_load, 3),
        "manifest_bytes": int(manifest_bytes),
        "prune_range_sec": round(t_prune_range, 3),
        "prune_range_kept": len(kept_range),
        "prune_bloom_sec": round(t_prune_bloom, 3),
        "prune_bloom_kept": len(kept_bloom),
        "leaf_filter_sec": round(t_leaf_filter, 3),
        "leaf_filter_files": lf_files,
        "dv_delete_sec": round(t_dv_delete, 2),
        "dv_deleted_rows": int(n_del),
        "compact_sec": round(t_compact, 2),
        "files_after_compact": len(post.get("files", {})),
    }
    print(json.dumps(out))
    if not args.keep:
        shutil.rmtree(os.path.dirname(root), ignore_errors=True)


if __name__ == "__main__":
    main()
