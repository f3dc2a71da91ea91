"""Standalone OCC rehearsal driver — one of N separate PROCESSES racing
commits on the same manifested table and the same catalog.

The threaded races in `tests/test_manifest.py` / `tests/test_catalog.py`
share one JVM and one Hadoop `FileSystem` object; the deployment shape
for multiple writers is separate driver processes (separate JVMs,
separate FS clients), where the only coordination is the filesystem
itself. This script is that shape: it is launched by
`tests/test_occ_multiprocess.py` (and usable by hand) as

    python scripts/occ_worker.py --root T --catalog C --table-name t \
        --writer W1 --commits 4 --ready R --go G

Protocol:
* build a private SparkSession (its own JVM), touch ``--ready``;
* spin until ``--go`` exists (the launcher creates it once every worker
  is ready, so the commit loops genuinely overlap);
* loop ``--commits`` times: `append_manifested` two rows tagged
  (writer, seq), then `catalog_commit` pinning the fresh table version;
* print ONE JSON line: the table versions this process's appends won,
  the catalog versions it published, and retry visibility.

Atomicity under test is `_publish_cas` (create-exclusive rename): each
manifest/catalog version file must have exactly ONE winner across
processes, losers must retry onto the winner's snapshot, and no append
row may be lost. The launcher asserts all of that from a third process.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True, help="manifested table root")
    ap.add_argument("--catalog", required=True, help="catalog root")
    ap.add_argument("--table-name", required=True, help="catalog member name")
    ap.add_argument("--writer", required=True, help="writer id tag")
    ap.add_argument("--commits", type=int, default=4)
    ap.add_argument("--ready", required=True, help="file to create when up")
    ap.add_argument("--go", required=True, help="file to wait for before racing")
    args = ap.parse_args()

    # a modest JVM: the race is about metadata CAS, not data volume
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "1500m")
    from etl_demo_spark.io.catalog import catalog_commit
    from etl_demo_spark.io.manifest import (
        append_manifested,
        manifest_versions,
    )
    from etl_demo_spark.session import get_spark

    spark = get_spark(
        app_name=f"occ-worker-{args.writer}",
        master="local[2]",
        shuffle_partitions=2,
        extra_conf={"spark.sql.autoBroadcastJoinThreshold": "1048576"},
    )

    Path(args.ready).touch()
    deadline = time.time() + 180
    while not Path(args.go).exists():
        if time.time() > deadline:
            print(json.dumps({"writer": args.writer, "error": "go timeout"}))
            sys.exit(2)
        time.sleep(0.02)

    table_versions: list[int] = []
    catalog_versions: list[int] = []
    for seq in range(args.commits):
        src = spark.createDataFrame(
            [
                (args.writer, seq, 2 * seq, "2026-01-01"),
                (args.writer, seq, 2 * seq + 1, "2026-01-02"),
            ],
            "writer STRING, seq INT, payload INT, dt STRING",
        )
        append_manifested(spark, args.root, src)
        # head right after our commit: ours, or a later one the other
        # process already won — either is a valid (newest-wins) pin
        v = manifest_versions(spark, args.root)[-1]
        table_versions.append(v)
        cv = catalog_commit(spark, args.catalog, {args.table_name: v})
        catalog_versions.append(cv)

    from etl_demo_spark.io.manifest import occ_stats

    print(
        json.dumps(
            {
                "writer": args.writer,
                "commits": args.commits,
                "table_versions_seen": table_versions,
                "catalog_versions_published": catalog_versions,
                "occ": dict(occ_stats),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
