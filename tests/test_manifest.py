"""Snapshot-manifest MERGE (io/manifest.py): atomic pointer commit —
readers racing a merge must never see a missing partition or a torn
(half-merged) snapshot."""

from __future__ import annotations

import os
import threading

from pyspark.sql import functions as F


def _seed(spark, path: str):
    rows = [
        (1, "alpha", "d1", "A"),
        (2, "beta", "d1", "B"),
        (3, "gamma", "d2", "A"),
        (4, "delta", "d2", "B"),
    ]
    df = spark.createDataFrame(rows, "id INT, name STRING, dt STRING, seg STRING")
    df.write.mode("overwrite").partitionBy("dt", "seg").parquet(path)


def test_manifest_init_and_read_round_trip(spark, tmp_path):
    from etl_demo_spark.io.manifest import manifest_init, read_manifested

    path = str(tmp_path / "t")
    _seed(spark, path)
    v = manifest_init(spark, path, ["dt", "seg"])
    assert v == 1
    # files migrated into __v0000000001 subdirs
    assert os.path.isdir(os.path.join(path, "dt=d1", "seg=A", "__v0000000001"))
    got = {r.id: (r.name, r.dt, r.seg) for r in read_manifested(spark, path).collect()}
    assert got == {
        1: ("alpha", "d1", "A"),
        2: ("beta", "d1", "B"),
        3: ("gamma", "d2", "A"),
        4: ("delta", "d2", "B"),
    }
    # init is idempotent
    assert manifest_init(spark, path, ["dt", "seg"]) == 1


def test_manifest_merge_semantics_and_blast_radius(spark, tmp_path):
    from etl_demo_spark.io.manifest import (
        load_manifest,
        manifest_init,
        merge_upsert_manifested,
        read_manifested,
    )

    path = str(tmp_path / "t")
    _seed(spark, path)
    manifest_init(spark, path, ["dt", "seg"])

    source = spark.createDataFrame(
        [(1, "ALPHA2", "d1", "A"), (99, "new", "d1", "A")],
        "id INT, name STRING, dt STRING, seg STRING",
    )
    affected = merge_upsert_manifested(spark, path, source, ["id"], ["dt", "seg"])
    assert affected == [("d1", "A")]

    version, mapping = load_manifest(spark, path)
    assert version == 2
    assert mapping["dt=d1/seg=A"] == "dt=d1/seg=A/__v0000000002"
    assert mapping["dt=d1/seg=B"] == "dt=d1/seg=B/__v0000000001"  # untouched

    got = {r.id: (r.name, r.dt, r.seg) for r in read_manifested(spark, path).collect()}
    assert got[1] == ("ALPHA2", "d1", "A")
    assert got[99] == ("new", "d1", "A")
    assert got[2] == ("beta", "d1", "B") and len(got) == 5

    # v1 data of the replaced leaf is RETAINED for in-flight readers
    assert os.path.isdir(os.path.join(path, "dt=d1", "seg=A", "__v0000000001"))

    # …until a later merge's GC (retention = 2 manifests)
    source2 = spark.createDataFrame(
        [(2, "BETA2", "d1", "B")], "id INT, name STRING, dt STRING, seg STRING"
    )
    merge_upsert_manifested(spark, path, source2, ["id"], ["dt", "seg"])
    source3 = spark.createDataFrame(
        [(3, "GAMMA2", "d2", "A")], "id INT, name STRING, dt STRING, seg STRING"
    )
    merge_upsert_manifested(spark, path, source3, ["id"], ["dt", "seg"])
    assert not os.path.isdir(os.path.join(path, "dt=d1", "seg=A", "__v0000000001"))
    got = {r.id: r.name for r in read_manifested(spark, path).collect()}
    assert got == {1: "ALPHA2", 2: "BETA2", 3: "GAMMA2", 4: "delta", 99: "new"}


def test_manifest_merge_drains_leaf(spark, tmp_path):
    from etl_demo_spark.io.manifest import (
        load_manifest,
        manifest_init,
        merge_upsert_manifested,
        read_manifested,
    )

    path = str(tmp_path / "t")
    _seed(spark, path)
    manifest_init(spark, path, ["dt", "seg"])

    # key 2 is (d1, B)'s only row; moving it to (d2, B) drains the leaf
    source = spark.createDataFrame(
        [(2, "beta-moved", "d2", "B")], "id INT, name STRING, dt STRING, seg STRING"
    )
    affected = merge_upsert_manifested(spark, path, source, ["id"], ["dt", "seg"])
    assert sorted(affected) == [("d1", "B"), ("d2", "B")]

    _, mapping = load_manifest(spark, path)
    assert "dt=d1/seg=B" not in mapping
    got = {r.id: (r.name, r.dt, r.seg) for r in read_manifested(spark, path).collect()}
    assert got[2] == ("beta-moved", "d2", "B") and len(got) == 4


def test_manifest_crashed_attempt_is_invisible_and_healed(spark, tmp_path):
    """A crash after placing new __v dirs but BEFORE the manifest rename
    leaves the table exactly as it was (readers resolve the old
    manifest); the re-run GCs the orphaned version dirs — including the
    version-number collision — and converges."""
    from etl_demo_spark.io.manifest import (
        load_manifest,
        manifest_init,
        merge_upsert_manifested,
        read_manifested,
    )

    path = str(tmp_path / "t")
    _seed(spark, path)
    manifest_init(spark, path, ["dt", "seg"])

    # simulate the crashed attempt: an orphan __v0000000002 with junk
    orphan = os.path.join(path, "dt=d1", "seg=A", "__v0000000002")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "part-junk.parquet"), "wb") as f:
        f.write(b"junk")

    # readers are unaffected (manifest still points at v1)
    assert read_manifested(spark, path).count() == 4

    source = spark.createDataFrame(
        [(1, "ALPHA2", "d1", "A")], "id INT, name STRING, dt STRING, seg STRING"
    )
    affected = merge_upsert_manifested(spark, path, source, ["id"], ["dt", "seg"])
    assert affected == [("d1", "A")]
    version, _ = load_manifest(spark, path)
    assert version == 2
    got = {r.id: r.name for r in read_manifested(spark, path).collect()}
    assert got[1] == "ALPHA2" and len(got) == 4


def test_manifest_concurrent_reader_never_sees_missing_partition(spark, tmp_path):
    """THE contract this module exists for: a reader loop racing a series
    of merges must observe, on every single read, a complete snapshot —
    all four leaves present, row count constant, and the updated key
    either wholly pre-merge or wholly post-merge."""
    from etl_demo_spark.io.manifest import (
        manifest_init,
        merge_upsert_manifested,
        read_manifested,
    )

    path = str(tmp_path / "t")
    _seed(spark, path)
    manifest_init(spark, path, ["dt", "seg"])

    stop = threading.Event()
    violations: list[str] = []
    snapshots_seen: set[str] = set()

    def reader():
        while not stop.is_set():
            rows = read_manifested(spark, path).collect()
            leaves = {(r.dt, r.seg) for r in rows}
            if len(rows) != 4:
                violations.append(f"row count {len(rows)}")
            if leaves != {("d1", "A"), ("d1", "B"), ("d2", "A"), ("d2", "B")}:
                violations.append(f"leaves {sorted(leaves)}")
            name1 = next(r.name for r in rows if r.id == 1)
            snapshots_seen.add(name1)
            if not (name1 == "alpha" or name1.startswith("v")):
                violations.append(f"torn name {name1}")

    t = threading.Thread(target=reader, daemon=True)
    t.start()
    try:
        for i in range(4):
            source = spark.createDataFrame(
                [(1, f"v{i}", "d1", "A")], "id INT, name STRING, dt STRING, seg STRING"
            )
            merge_upsert_manifested(spark, path, source, ["id"], ["dt", "seg"])
    finally:
        stop.set()
        t.join(timeout=120)
    assert not violations, violations[:5]
    assert len(snapshots_seen) >= 2  # the reader actually raced the merges
