"""Cross-PROCESS OCC rehearsal: two separate driver processes (separate
JVMs, separate Hadoop FileSystem clients) race `append_manifested` CAS
commits on the same table and `catalog_commit` pins on the same catalog.

The threaded races elsewhere in the suite share one JVM; the deployment
shape for concurrent writers is separate `spark-submit` processes where
the ONLY coordination is the filesystem's create-exclusive rename. This
test launches `scripts/occ_worker.py` twice (ready/go handshake so the
commit loops genuinely overlap) and asserts, from a third process:

* exactly one winner per manifest version — versions contiguous, count
  exactly 1 (init) + 2 x COMMITS (every lost CAS retried onto the
  winner's snapshot and won a fresh version);
* no lost updates and no double-applies — every (writer, seq) append
  contributes exactly its two rows;
* no torn catalog — catalog versions contiguous, every pinned table
  version is a real manifest version, every snapshot resolvable.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
COMMITS = 3


@pytest.mark.parametrize("split_stats", [False, True], ids=["plain", "split"])
def test_two_processes_race_table_and_catalog(spark, tmp_path, split_stats):
    from etl_demo_spark.io.catalog import (
        catalog_init,
        catalog_snapshot,
        catalog_versions,
    )
    from etl_demo_spark.io.manifest import (
        manifest_history,
        manifest_versions,
        read_manifested,
        write_manifested,
    )

    root = str(tmp_path / "events")
    cat = str(tmp_path / "cat")
    # seed BOTH leaves the workers append into: creating a brand-new
    # leaf is a primary-vrel change (a structural conflict by design);
    # with the leaves pre-existing, every racing append is a pure
    # extras-union and must land by zero-rewrite rebase — under the
    # SPLIT stats layout too (round 10: the rebase publish merges the
    # racing appends' per-leaf stats files)
    seed = spark.createDataFrame(
        [("seed", -1, 0, "2026-01-01"), ("seed", -1, 1, "2026-01-02")],
        "writer STRING, seq INT, payload INT, dt STRING",
    )
    if split_stats:
        write_manifested(
            seed, root, partition_cols=["dt"],
            stats_cols=["payload"], stats_split=True,
        )
    else:
        write_manifested(seed, root, partition_cols=["dt"])
    assert catalog_init(spark, cat, {"events": root}) == 1

    env = dict(os.environ)
    env["SPARK_GRAFT_DRIVER_MEM"] = "1500m"
    go = tmp_path / "go"
    procs, readies = [], []
    for wid in ("W1", "W2"):
        ready = tmp_path / f"ready_{wid}"
        readies.append(ready)
        procs.append(
            subprocess.Popen(
                [
                    sys.executable,
                    str(REPO / "scripts" / "occ_worker.py"),
                    "--root", root,
                    "--catalog", cat,
                    "--table-name", "events",
                    "--writer", wid,
                    "--commits", str(COMMITS),
                    "--ready", str(ready),
                    "--go", str(go),
                ],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
            )
        )
    deadline = time.time() + 240
    while not all(r.exists() for r in readies):
        for p in procs:
            if p.poll() is not None:
                pytest.fail(f"worker died before ready: {p.communicate()[1][-2000:]}")
        assert time.time() < deadline, "workers never became ready"
        time.sleep(0.1)
    go.touch()

    reports = []
    for p in procs:
        out, err = p.communicate(timeout=420)
        assert p.returncode == 0, f"worker failed: {err[-3000:]}"
        reports.append(json.loads(out.strip().splitlines()[-1]))
    assert {r["writer"] for r in reports} == {"W1", "W2"}
    assert all(r["commits"] == COMMITS for r in reports)
    # commit-time conflict detection: pure appends NEVER conflict, so a
    # lost CAS must land by zero-rewrite rebase — the full re-run path
    # (delete staged dirs, restage the data) must not fire at all
    for r in reports:
        assert r["occ"]["reran"] == 0, (
            f"{r['writer']} re-staged a pure append on a lost race: {r['occ']}"
        )
        assert r["occ"]["rebased"] == r["occ"]["cas_lost"], r["occ"]

    # exactly one winner per version: the full commit trail (delta-chain
    # manifests outlive the _RETAIN read window) is contiguous with one
    # version per append + init — a torn CAS would leave a gap or a
    # double-claimed version
    hist = manifest_history(spark, root).orderBy("version").collect()
    assert [r["version"] for r in hist] == list(range(1, 2 + 2 * COMMITS))
    assert all(r["operation"] == "APPEND" for r in hist[1:]), [
        r["operation"] for r in hist
    ]
    vs = manifest_versions(spark, root)  # retained (readable) window

    # no lost updates / double-applies: every (writer, seq) appears with
    # exactly its two payload rows
    rows = (
        read_manifested(spark, root)
        .where("writer <> 'seed'")
        .groupBy("writer", "seq")
        .count()
        .collect()
    )
    got = {(r["writer"], r["seq"]): r["count"] for r in rows}
    want = {(w, s): 2 for w in ("W1", "W2") for s in range(COMMITS)}
    assert got == want

    if split_stats:
        # the rebase stats merges lost no entries: the head snapshot's
        # per-leaf stats files cover EVERY live data file
        from etl_demo_spark.io.manifest import (
            _all_vrels,
            _hadoop_fs,
            _load_doc,
            _materialized_files,
        )

        fs, jvm = _hadoop_fs(spark, root)
        doc = _load_doc(fs, jvm, root)
        entries = _materialized_files(fs, jvm, root, doc)
        covered = {p.rsplit("/", 1)[0] for p in entries}
        assert set(_all_vrels(doc)) <= covered, (
            sorted(set(_all_vrels(doc)) - covered)
        )
        total = sum(st.get("__rows", 0) for st in entries.values())
        assert total == read_manifested(spark, root).count()

    # no torn catalog: contiguous versions, every pin a real manifest
    # version, every snapshot resolvable at its pins
    cvs = catalog_versions(spark, cat)
    assert cvs == list(range(1, 2 + 2 * COMMITS))
    all_committed = {r["version"] for r in hist}
    for cv in cvs:
        snap = catalog_snapshot(spark, cat, version=cv)
        pinned = snap.pins()["events"]
        assert pinned in all_committed  # never a torn / phantom pin
        if pinned in vs:  # still inside the table's retention window
            assert snap.read("events").count() >= 1
        else:  # documented contract: stale pins fail loudly, never read torn
            with pytest.raises(ValueError, match="retention window"):
                snap.read("events")
    # the final catalog pin trails head by at most the other writer's
    # tail appends (last catalog CAS wins; its pin was read at ITS last
    # append, not at global head) — never torn, possibly briefly stale
    assert catalog_snapshot(spark, cat).pins()["events"] >= vs[-1] - 2
