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
    # commit vdirs carry an attempt-unique token suffix (OCC staging)
    assert mapping["dt=d1/seg=A"].startswith("dt=d1/seg=A/__v0000000002")
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
    """A crash after placing new __v dirs but BEFORE the manifest publish
    leaves the table exactly as it was (readers resolve the old
    manifest); a later commit GCs the orphaned version dirs once they age
    past the orphan grace window (younger orphans are spared — they could
    be a CONCURRENT committer's in-flight staging) and converges."""
    from etl_demo_spark.io.manifest import (
        load_manifest,
        manifest_init,
        merge_upsert_manifested,
        read_manifested,
    )

    path = str(tmp_path / "t")
    _seed(spark, path)
    manifest_init(spark, path, ["dt", "seg"])

    # simulate the crashed attempt: an orphan token'd __v dir with junk
    orphan = os.path.join(path, "dt=d1", "seg=A", "__v0000000002-deadbeef")
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
    # the young orphan is SPARED (grace window: could be in-flight staging)
    assert os.path.isdir(orphan)

    # age it past the grace window; the next commit reclaims it
    old = 1_000_000_000  # epoch seconds, far in the past
    os.utime(orphan, (old, old))
    source2 = spark.createDataFrame(
        [(3, "GAMMA2", "d2", "A")], "id INT, name STRING, dt STRING, seg STRING"
    )
    merge_upsert_manifested(spark, path, source2, ["id"], ["dt", "seg"])
    assert not os.path.isdir(orphan)


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


def test_manifest_time_travel_reads_prior_snapshot(spark, tmp_path):
    from etl_demo_spark.io.manifest import (
        manifest_init,
        manifest_versions,
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
    merge_upsert_manifested(spark, path, source, ["id"], ["dt", "seg"])
    assert manifest_versions(spark, path) == [1, 2]

    # current snapshot has the merge; v1 reads the table exactly as seeded
    now = {r.id: r.name for r in read_manifested(spark, path).collect()}
    assert now[1] == "ALPHA2" and 99 in now
    v1 = {r.id: r.name for r in read_manifested(spark, path, version=1).collect()}
    assert v1 == {1: "alpha", 2: "beta", 3: "gamma", 4: "delta"}

    # outside the retention window → explicit error, not silent wrong data
    import pytest

    with pytest.raises(FileNotFoundError):
        read_manifested(spark, path, version=7)

    # after two more merges, v1 is GC'd and time travel to it refuses
    for batch in ([(2, "BETA2", "d1", "B")], [(3, "GAMMA2", "d2", "A")]):
        src = spark.createDataFrame(
            batch, "id INT, name STRING, dt STRING, seg STRING"
        )
        merge_upsert_manifested(spark, path, src, ["id"], ["dt", "seg"])
    assert 1 not in manifest_versions(spark, path)
    with pytest.raises(FileNotFoundError):
        read_manifested(spark, path, version=1)
    # the newest RETAINED prior version still reads complete
    vs = manifest_versions(spark, path)
    prior = {r.id: r.name for r in read_manifested(spark, path, version=vs[-2]).collect()}
    assert set(prior) == {1, 2, 3, 4, 99}


def test_manifest_schema_evolution_atomic_and_time_travel(spark, tmp_path):
    """Evolution under the manifest: the stored schema makes the new
    column visible table-wide (NULL in untouched partitions) with NO
    mergeSchema option on the reader, and time travel to the
    pre-evolution snapshot reads the OLD schema."""
    from etl_demo_spark.io.manifest import (
        manifest_init,
        merge_upsert_manifested,
        read_manifested,
    )

    path = str(tmp_path / "t")
    _seed(spark, path)
    manifest_init(spark, path, ["dt", "seg"])

    source = spark.createDataFrame(
        [(1, "ALPHA2", "d1", "A", "web"), (99, "new", "d1", "A", "app")],
        "id INT, name STRING, dt STRING, seg STRING, chan STRING",
    )
    affected = merge_upsert_manifested(
        spark, path, source, ["id"], ["dt", "seg"], schema_evolution=True
    )
    assert affected == [("d1", "A")]

    cur = read_manifested(spark, path)
    assert cur.columns == ["id", "name", "dt", "seg", "chan"]
    got = {r.id: (r.name, r.chan) for r in cur.collect()}
    assert got[1] == ("ALPHA2", "web") and got[99] == ("new", "app")
    # untouched partitions surface the evolved column as NULL — their
    # files were never rewritten (explicit-schema clipping, not mergeSchema)
    assert got[2] == ("beta", None) and got[3] == ("gamma", None)

    v1 = read_manifested(spark, path, version=1)
    assert v1.columns == ["id", "name", "dt", "seg"]  # pre-evolution schema
    assert {r.id for r in v1.collect()} == {1, 2, 3, 4}

    # a follow-up merge WITHOUT the evolved column: strict mode refuses
    # (drift must be deliberate), evolution mode keeps the column — the
    # matched row's chan stays NULL-not-clobbered, row 1's survives
    import pytest

    src2 = spark.createDataFrame(
        [(3, "GAMMA2", "d2", "A")], "id INT, name STRING, dt STRING, seg STRING"
    )
    with pytest.raises(ValueError, match="schema_evolution"):
        merge_upsert_manifested(spark, path, src2, ["id"], ["dt", "seg"])
    merge_upsert_manifested(
        spark, path, src2, ["id"], ["dt", "seg"], schema_evolution=True
    )
    got = {r.id: (r.name, r.chan) for r in read_manifested(spark, path).collect()}
    assert got[1] == ("ALPHA2", "web") and got[3] == ("GAMMA2", None)


def test_manifest_delete_keys_atomic_and_drains_leaf(spark, tmp_path):
    from etl_demo_spark.io.manifest import (
        delete_keys_manifested,
        load_manifest,
        manifest_init,
        read_manifested,
    )

    path = str(tmp_path / "t")
    _seed(spark, path)  # (d1,A):{1} (d1,B):{2} (d2,A):{3} (d2,B):{4}
    manifest_init(spark, path, ["dt", "seg"])

    erase = spark.createDataFrame([(1,), (99,)], "id INT")
    affected = delete_keys_manifested(spark, path, erase, ["id"], ["dt", "seg"])
    assert affected == [("d1", "A")]

    version, mapping = load_manifest(spark, path)
    assert version == 2
    assert "dt=d1/seg=A" not in mapping  # drained leaf left the snapshot
    assert mapping["dt=d1/seg=B"].endswith("__v0000000001")  # untouched

    got = {r.id for r in read_manifested(spark, path).collect()}
    assert got == {2, 3, 4}
    # time travel still reads the pre-delete snapshot (erasure is logical
    # until retention GC — documented)
    v1 = {r.id for r in read_manifested(spark, path, version=1).collect()}
    assert v1 == {1, 2, 3, 4}

    # no matched keys → no new version
    assert delete_keys_manifested(
        spark, path, spark.createDataFrame([(123,)], "id INT"), ["id"], ["dt", "seg"]
    ) == []
    assert load_manifest(spark, path)[0] == 2


def test_manifest_expire_makes_erasure_physical(spark, tmp_path):
    import glob

    from etl_demo_spark.io.manifest import (
        delete_keys_manifested,
        manifest_expire,
        manifest_init,
        manifest_versions,
        read_manifested,
    )

    path = str(tmp_path / "t")
    _seed(spark, path)
    manifest_init(spark, path, ["dt", "seg"])
    delete_keys_manifested(
        spark, path, spark.createDataFrame([(1,)], "id INT"), ["id"], ["dt", "seg"]
    )
    # logically deleted, physically retained (time travel still sees it)
    assert {r.id for r in read_manifested(spark, path, version=1).collect()} == {1, 2, 3, 4}
    v1_files = glob.glob(f"{path}/dt=d1/seg=A/__v0000000001/*.parquet")
    assert v1_files

    kept = manifest_expire(spark, path, keep=1)
    assert kept == [2] and manifest_versions(spark, path) == [2]
    assert not glob.glob(f"{path}/dt=d1/seg=A/__v0000000001/*")  # bytes gone
    assert {r.id for r in read_manifested(spark, path).collect()} == {2, 3, 4}
    import pytest

    with pytest.raises(FileNotFoundError):
        read_manifested(spark, path, version=1)


def test_compact_manifested_one_shot_and_converges(spark, tmp_path):
    """OPTIMIZE: multi-file leaves are rewritten to compact files in one
    atomic commit, already-compact leaves carry their version subdirs
    over untouched, content is byte-for-byte-equal logically, and a
    second run is a no-op."""
    import glob

    from etl_demo_spark.io.manifest import (
        compact_manifested,
        load_manifest,
        manifest_init,
        read_manifested,
    )

    path = str(tmp_path / "t")
    # leaf (d1,A): 4 small files; (d1,B): 1 file
    a = spark.createDataFrame(
        [(i, f"n{i}", "d1", "A") for i in range(40)],
        "id INT, name STRING, dt STRING, seg STRING",
    )
    a.repartition(4).write.partitionBy("dt", "seg").parquet(path)
    b = spark.createDataFrame(
        [(100, "solo", "d1", "B")], "id INT, name STRING, dt STRING, seg STRING"
    )
    b.coalesce(1).write.mode("append").partitionBy("dt", "seg").parquet(path)
    manifest_init(spark, path, ["dt", "seg"])
    before = {r.id: r.name for r in read_manifested(spark, path).collect()}

    compacted = compact_manifested(spark, path, min_files=2)
    assert compacted == ["dt=d1/seg=A"]

    version, mapping = load_manifest(spark, path)
    assert version == 2
    assert "__v0000000002" in mapping["dt=d1/seg=A"]  # token'd OCC vdir
    assert mapping["dt=d1/seg=B"].endswith("__v0000000001")  # untouched
    files = glob.glob(f"{path}/dt=d1/seg=A/__v0000000002-*/*.parquet")
    assert len(files) == 1  # tiny leaf → single shard
    after = {r.id: r.name for r in read_manifested(spark, path).collect()}
    assert after == before

    # second run: nothing left to compact
    assert compact_manifested(spark, path, min_files=2) == []
    assert load_manifest(spark, path)[0] == 2


def test_manifest_file_stats_prune_and_maintenance(spark, tmp_path):
    """Iceberg-style file skipping from manifest stats: a range read
    opens only the files whose recorded [min,max] can intersect; commits
    maintain stats for their new files; an impossible range yields an
    empty, correctly-shaped frame without touching storage."""
    from etl_demo_spark.io.manifest import (
        manifest_init,
        merge_upsert_manifested,
        read_manifested,
    )

    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, f"n{i}", "d1" if i < 100 else "d2") for i in range(200)],
        "id INT, name STRING, dt STRING",
    )
    # disjoint id-range files within each leaf
    df.repartitionByRange(8, F.col("id")).write.partitionBy("dt").parquet(path)
    manifest_init(spark, path, "dt", stats_cols=["id"])

    full = read_manifested(spark, path)
    assert len(full.inputFiles()) >= 6

    pruned = read_manifested(spark, path, prune_ranges={"id": (10, 15)})
    assert len(pruned.inputFiles()) < len(full.inputFiles())
    got = {r.id for r in pruned.filter("id between 10 and 15").collect()}
    assert got == set(range(10, 16))

    # a commit maintains stats: new file's range must be discoverable
    src = spark.createDataFrame([(500, "new", "d2")], "id INT, name STRING, dt STRING")
    merge_upsert_manifested(spark, path, src, ["id"], "dt")
    pruned = read_manifested(spark, path, prune_ranges={"id": (450, None)})
    assert {r.id for r in pruned.filter("id >= 450").collect()} == {500}
    # that read must not have opened d1's files (ids 0..99)
    assert all("dt=d1" not in f for f in pruned.inputFiles())

    # impossible range: empty frame, schema intact, zero files
    nothing = read_manifested(spark, path, prune_ranges={"id": (10000, None)})
    assert nothing.count() == 0
    assert nothing.columns == ["id", "name", "dt"]


def test_manifest_diff_metadata_only(spark, tmp_path):
    """Snapshot diff from pointer files alone: a merge's touched leaf
    shows rewritten with exact before/after row counts (from the
    stats recorded at commit), an insert-created leaf shows added, a
    drained leaf shows removed; unchanged leaves are omitted."""
    from etl_demo_spark.io.manifest import (
        delete_keys_manifested,
        manifest_diff,
        manifest_init,
        merge_upsert_manifested,
    )

    path = str(tmp_path / "t")
    _seed(spark, path)  # (d1,A):{1} (d1,B):{2} (d2,A):{3} (d2,B):{4}
    manifest_init(spark, path, ["dt", "seg"], stats_cols=["id"])

    # v2: update row 1 + insert 99 into (d1,A); create brand-new (d3,C)
    src = spark.createDataFrame(
        [(1, "ALPHA2", "d1", "A"), (99, "new", "d1", "A"), (7, "seven", "d3", "C")],
        "id INT, name STRING, dt STRING, seg STRING",
    )
    merge_upsert_manifested(spark, path, src, ["id"], ["dt", "seg"])

    d = manifest_diff(spark, path, 1, 2)
    assert d["dt=d1/seg=A"] == {
        "status": "rewritten", "rows_before": 1, "rows_after": 2
    }
    assert d["dt=d3/seg=C"] == {
        "status": "added", "rows_before": None, "rows_after": 1
    }
    assert "dt=d1/seg=B" not in d and len(d) == 2

    # v3: drain (d2,A) entirely
    delete_keys_manifested(
        spark, path, spark.createDataFrame([(3,)], "id INT"), ["id"], ["dt", "seg"]
    )
    d = manifest_diff(spark, path, 2, 3)
    assert d == {
        "dt=d2/seg=A": {"status": "removed", "rows_before": 1, "rows_after": None}
    }


# ---------------------------------------------------------------------------
# Optimistic multi-writer concurrency (round 6)
# ---------------------------------------------------------------------------


def test_publish_cas_first_writer_wins(spark, tmp_path):
    """The CAS primitive: exactly one publish of a given path succeeds,
    the loser gets False, the winner's FULL content is what readers see,
    and no temp litter survives."""
    import os

    from etl_demo_spark.io.manifest import _publish_cas
    from etl_demo_spark.io.tables import _hadoop_fs

    d = str(tmp_path / "cas")
    os.makedirs(d)
    fs, jvm = _hadoop_fs(spark, d)
    p = f"{d}/v0000000001.json"
    assert _publish_cas(fs, jvm, p, b'{"w": "first"}') is True
    assert _publish_cas(fs, jvm, p, b'{"w": "second"}') is False
    with open(p) as f:
        assert f.read() == '{"w": "first"}'
    assert [n for n in os.listdir(d) if n.endswith(".tmp")] == []


def test_manifest_lost_race_retries_on_winners_snapshot(spark, tmp_path, monkeypatch):
    """THE lost-update test: writer B commits a full merge into the SAME
    leaf between writer A's snapshot resolve and A's publish. A's CAS
    must fail, and A's retry must re-run the merge against B's snapshot —
    both writers' rows survive (a clobber would lose B's insert, since a
    merge rewrites the whole leaf)."""
    import etl_demo_spark.io.manifest as m

    path = str(tmp_path / "t")
    _seed(spark, path)
    m.manifest_init(spark, path, ["dt", "seg"])

    real_publish = m._publish_cas
    state = {"injected": False}

    def racing_publish(fs, jvm, p, data):
        if not state["injected"]:
            state["injected"] = True
            src_b = spark.createDataFrame(
                [(99, "B-INSERT", "d1", "A")],
                "id INT, name STRING, dt STRING, seg STRING",
            )
            m.merge_upsert_manifested(spark, path, src_b, ["id"], ["dt", "seg"])
        return real_publish(fs, jvm, p, data)

    monkeypatch.setattr(m, "_publish_cas", racing_publish)
    src_a = spark.createDataFrame(
        [(1, "A-UPDATE", "d1", "A")], "id INT, name STRING, dt STRING, seg STRING"
    )
    affected = m.merge_upsert_manifested(spark, path, src_a, ["id"], ["dt", "seg"])
    assert affected == [("d1", "A")]

    version, _ = m.load_manifest(spark, path)
    assert version == 3  # B won v2; A retried onto v3
    got = {r.id: r.name for r in m.read_manifested(spark, path).collect()}
    assert got[1] == "A-UPDATE"  # A's change landed
    assert got[99] == "B-INSERT"  # B's snapshot was NOT clobbered
    assert len(got) == 5


def test_manifest_two_writers_threaded_both_commit(spark, tmp_path):
    """Two real threads merging concurrently: exactly one commit wins per
    version, the loser retries onto the next, and no snapshot is lost —
    final state carries both writers' rows at version 3."""
    from etl_demo_spark.io.manifest import (
        load_manifest,
        manifest_init,
        merge_upsert_manifested,
        read_manifested,
    )

    path = str(tmp_path / "t")
    _seed(spark, path)
    manifest_init(spark, path, ["dt", "seg"])
    barrier = threading.Barrier(2)
    errors: list[Exception] = []

    def writer(key, name, dt, seg):
        try:
            src = spark.createDataFrame(
                [(key, name, dt, seg)], "id INT, name STRING, dt STRING, seg STRING"
            )
            barrier.wait(timeout=60)
            merge_upsert_manifested(spark, path, src, ["id"], ["dt", "seg"])
        except Exception as e:  # pragma: no cover - surfaced via assert
            errors.append(e)

    t1 = threading.Thread(target=writer, args=(1, "W1", "d1", "A"))
    t2 = threading.Thread(target=writer, args=(4, "W2", "d2", "B"))
    t1.start()
    t2.start()
    t1.join(timeout=300)
    t2.join(timeout=300)
    assert not errors, errors
    got = {r.id: r.name for r in read_manifested(spark, path).collect()}
    assert got[1] == "W1" and got[4] == "W2" and len(got) == 4
    version, _ = load_manifest(spark, path)
    assert version == 3


# ---------------------------------------------------------------------------
# Delta manifests: O(change) commit metadata, bounded resolution (round 6)
# ---------------------------------------------------------------------------


def test_delta_manifest_metadata_cost_bounded_at_10k_leaves(spark, tmp_path):
    """Metadata-layer scaling contract, exercised at 10k synthetic
    leaves with no data files: a commit touching 10 leaves must write
    O(change) bytes (not O(table)), resolution through a delta chain
    must reproduce the exact materialized state, and the chain length
    must be bounded by the checkpoint cadence."""
    import json
    import os

    from etl_demo_spark.io.manifest import (
        _FULL_EVERY,
        _encode_commit,
        _manifest_path,
        _resolve_doc,
        _ancestors,
    )
    from etl_demo_spark.io.tables import _hadoop_fs

    root = str(tmp_path / "t")
    os.makedirs(os.path.join(root, "_manifests"))
    fs, jvm = _hadoop_fs(spark, root)

    n = 10_000
    parts = {f"dt=d{i}": f"dt=d{i}/__v0000000001" for i in range(n)}
    full_doc = {"version": 1, "partitions": parts, "schema": None}
    full_bytes = json.dumps(full_doc, indent=1).encode()
    with open(_manifest_path(root, 1), "wb") as f:
        f.write(full_bytes)

    # ten commits, each touching 10 leaves; expected state tracked in python
    expected = dict(parts)
    for v in range(2, 12):
        prev = _resolve_doc(fs, jvm, root, v - 1)
        new_parts = dict(prev["partitions"])
        for i in range(10):
            leaf = f"dt=d{(v * 37 + i) % n}"
            new_parts[leaf] = f"{leaf}/__v{v:010d}-tok"
            expected[leaf] = new_parts[leaf]
        data = _encode_commit(
            prev, {"version": v, "partitions": new_parts, "schema": None}
        )
        with open(_manifest_path(root, v), "wb") as f:
            f.write(data)
        raw = json.loads(data)
        if "parent" in raw:  # delta commit: O(change) bytes
            assert len(data) < len(full_bytes) * 0.02, (v, len(data))
            assert len(raw["partitions_delta"]) == 10
        # resolution reproduces the exact state regardless of encoding
        assert _resolve_doc(fs, jvm, root, v)["partitions"] == expected

    # chain bounded: every version resolves through <= _FULL_EVERY files
    for v in range(2, 12):
        assert len(_ancestors(fs, jvm, root, v)) <= _FULL_EVERY
    # at least one checkpoint (full) manifest appeared past the cadence
    fulls = [
        v for v in range(2, 12)
        if "parent" not in json.loads(open(_manifest_path(root, v)).read())
    ]
    assert fulls, "no full checkpoint manifest written in 10 commits"


def test_delta_manifest_end_to_end_chain_and_time_travel(spark, tmp_path, monkeypatch):
    """Real commits: merges publish DELTA manifests (parent pointer,
    changed leaves only), a full checkpoint appears at the cadence
    boundary, reads and time travel work across it, and GC keeps the
    ancestor chain resolvable while still reclaiming superseded data."""
    import json

    import etl_demo_spark.io.manifest as m

    monkeypatch.setattr(m, "_FULL_EVERY", 3)
    path = str(tmp_path / "t")
    _seed(spark, path)
    m.manifest_init(spark, path, ["dt", "seg"])

    for i in range(2, 7):  # commits v2..v6
        src = spark.createDataFrame(
            [(1, f"v{i}", "d1", "A")], "id INT, name STRING, dt STRING, seg STRING"
        )
        m.merge_upsert_manifested(spark, path, src, ["id"], ["dt", "seg"])

    kinds = {}
    for v in range(1, 7):
        try:
            raw = json.loads(open(m._manifest_path(path, v)).read())
            kinds[v] = "delta" if "parent" in raw else "full"
        except FileNotFoundError:
            kinds[v] = "gone"
    # v1 full (init); v2 delta(1); v3 delta(2); v4 full (chain hit 3);
    # v5 delta(4); v6 delta(5). GC keeps the retained window's chains.
    assert kinds[4] == "full" and kinds[5] == "delta" and kinds[6] == "delta"
    raw6 = json.loads(open(m._manifest_path(path, 6)).read())
    assert raw6["parent"] == 5
    assert set(raw6["partitions_delta"]) == {"dt=d1/seg=A"}
    assert "removed" not in raw6

    # reads resolve through the chain; time travel crosses the boundary
    got = {r.id: r.name for r in m.read_manifested(spark, path).collect()}
    assert got[1] == "v6" and len(got) == 4
    vs = m.manifest_versions(spark, path)
    assert vs == [5, 6]
    prior = {
        r.id: r.name
        for r in m.read_manifested(spark, path, version=5).collect()
    }
    assert prior[1] == "v5"
    # unreadable outside the window even if the manifest file survives as
    # a resolution ancestor
    import pytest

    with pytest.raises(FileNotFoundError):
        m.read_manifested(spark, path, version=3)


def test_read_manifested_leaf_filter_prunes_on_driver(spark, tmp_path):
    """leaf_filter prunes the resolved mapping BEFORE Spark builds a file
    index: only matching leaves' files are listed, rows are correct,
    stats-based file pruning composes, unknown columns error loudly, and
    a fully-pruned read returns an empty schema-shaped frame."""
    import pytest

    from etl_demo_spark.io.manifest import manifest_init, read_manifested

    path = str(tmp_path / "t")
    _seed(spark, path)
    manifest_init(spark, path, ["dt", "seg"], stats_cols=["id"])

    one = read_manifested(spark, path, leaf_filter={"dt": "d1"})
    assert {(r.dt, r.seg) for r in one.collect()} == {("d1", "A"), ("d1", "B")}
    # the file index only ever saw the two matching leaves
    assert all("dt=d1" in f for f in one.inputFiles())
    assert len(one.inputFiles()) > 0

    both = read_manifested(spark, path, leaf_filter={"dt": ["d1", "d2"], "seg": "B"})
    assert {r.id for r in both.collect()} == {2, 4}
    assert all("seg=B" in f for f in both.inputFiles())

    # composes with stats pruning (id=1 lives only in (d1,A))
    combo = read_manifested(
        spark, path, leaf_filter={"dt": "d1"}, prune_ranges={"id": (1, 1)}
    )
    assert {r.id for r in combo.filter(F.col("id") == 1).collect()} == {1}

    empty = read_manifested(spark, path, leaf_filter={"dt": "d9"})
    assert empty.count() == 0
    assert set(empty.columns) == {"id", "name", "dt", "seg"}

    with pytest.raises(ValueError, match="not partition columns"):
        read_manifested(spark, path, leaf_filter={"nope": "x"})


def test_bloom_file_skipping_point_lookup(spark, tmp_path):
    """Per-file bloom bitsets: on a column whose values are scattered
    across files (min/max useless — every file straddles every probe), a
    point lookup through prune_points opens a strict subset of files and
    loses no rows; an absent value prunes to (near) nothing; bitsets are
    maintained for a later commit's new files only."""
    from pyspark.sql import functions as F

    from etl_demo_spark.io.manifest import (
        _load_doc,
        manifest_init,
        merge_upsert_manifested,
        prune_files,
        read_manifested,
    )
    from etl_demo_spark.io.tables import _hadoop_fs

    path = str(tmp_path / "t")
    # ids 0..3999 scattered over 8 files per leaf via hash repartition
    df = spark.range(0, 4000).select(
        F.col("id"),
        (F.col("id") % 2).cast("string").alias("dt"),
        (F.col("id") * 7).alias("val"),
    )
    df.repartition(8).write.partitionBy("dt").parquet(path)
    manifest_init(spark, path, ["dt"], stats_cols=["id"], bloom_cols=["id"])

    full = read_manifested(spark, path)
    n_files = len(full.inputFiles())
    assert n_files >= 12

    # min/max CANNOT prune this layout (scattered ids)...
    fs, jvm = _hadoop_fs(spark, path)
    doc = _load_doc(fs, jvm, path)
    kept_range, total = prune_files(doc, {"id": (1234, 1234)})
    assert len(kept_range) == total
    # ...but the bloom bitset can
    probe = read_manifested(spark, path, prune_points={"id": 1234})
    assert len(probe.inputFiles()) < n_files / 2, (
        len(probe.inputFiles()), n_files
    )
    got = probe.filter(F.col("id") == 1234).collect()
    assert len(got) == 1 and got[0]["val"] == 1234 * 7

    # an absent value prunes to almost nothing (false positives only)
    absent = read_manifested(spark, path, prune_points={"id": 999_999})
    assert len(absent.inputFiles()) <= max(3, n_files // 4)
    assert absent.filter(F.col("id") == 999_999).count() == 0

    # maintenance: a merge commit records bitsets for its new files,
    # and the new key becomes bloom-findable
    src = spark.createDataFrame(
        [(777_777, "0", 1)], "id LONG, dt STRING, val LONG"
    )
    merge_upsert_manifested(spark, path, src, ["id"], ["dt"])
    after = read_manifested(spark, path, prune_points={"id": 777_777})
    hit = after.filter(F.col("id") == 777_777).collect()
    assert len(hit) == 1 and len(after.inputFiles()) < n_files


def test_bloom_adaptive_sizing_high_ndv(spark, tmp_path):
    """Per-file ADAPTIVE bloom sizing at realistic file sizes: with ~2k
    distinct values per file the old fixed 1024-bit default saturates
    (FPR ≈ 0.97 — prunes nothing); adaptive sizing picks a per-file
    power-of-two meeting the target FPR, so a point lookup opens ~the
    true containing files. Files whose ndv saturates even the cap store
    NO bitset (kept, unpruned, still correct)."""
    from pyspark.sql import functions as F

    from etl_demo_spark.io.manifest import (
        _load_doc,
        _unpack_words,
        manifest_init,
        read_manifested,
    )
    from etl_demo_spark.io.tables import _hadoop_fs

    path = str(tmp_path / "t")
    # 32k ids scattered over 8 files per leaf -> ~2k distinct per file
    df = spark.range(0, 32_000).select(
        F.col("id"),
        (F.col("id") % 2).cast("string").alias("dt"),
        (F.col("id") * 7).alias("val"),
    )
    df.repartition(8).write.partitionBy("dt").parquet(path)
    manifest_init(spark, path, ["dt"], bloom_cols=["id"])

    fs, jvm = _hadoop_fs(spark, path)
    doc = _load_doc(fs, jvm, path)
    assert "bloom_bits" not in doc and doc.get("bloom_bits_max") == 16384
    sizes = {
        len(_unpack_words(st["__bloom_id"])) * 64
        for st in doc["files"].values()
        if "__bloom_id" in st
    }
    assert sizes, "every ~2k-ndv file should fit under the 16384-bit cap"
    assert all(s >= 8192 for s in sizes), sizes  # sized for the ndv, not 1024

    n_files = len(read_manifested(spark, path).inputFiles())
    assert n_files >= 12
    probe = read_manifested(spark, path, prune_points={"id": 12345})
    # true containing count is 1; allow a couple of false positives
    assert len(probe.inputFiles()) <= 3, (len(probe.inputFiles()), n_files)
    got = probe.filter(F.col("id") == 12345).collect()
    assert len(got) == 1 and got[0]["val"] == 12345 * 7

    absent = read_manifested(spark, path, prune_points={"id": 999_999_999})
    assert len(absent.inputFiles()) <= 2
    assert absent.filter(F.col("id") == 999_999_999).count() == 0

    # saturation: cap too small for the ndv -> bitset omitted, reads keep
    # every file and lose no rows
    path2 = str(tmp_path / "sat")
    df.repartition(2).write.partitionBy("dt").parquet(path2)  # ~8k ndv/file
    manifest_init(spark, path2, ["dt"], bloom_cols=["id"], bloom_bits_max=4096)
    doc2 = _load_doc(*_hadoop_fs(spark, path2), path2)
    assert all("__bloom_id" not in st for st in doc2["files"].values())
    p2 = read_manifested(spark, path2, prune_points={"id": 777})
    assert p2.filter(F.col("id") == 777).count() == 1


def test_manifest_observability_surfaces(spark, tmp_path):
    """write_manifested CTAS + the two metadata tables: .files-style
    inventory (leaf, bytes, rows, stats images) and the dry-run orphan
    report (age + reclaimability, nothing deleted)."""
    import os

    from etl_demo_spark.io.manifest import (
        manifest_files,
        manifest_orphans,
        merge_upsert_manifested,
        read_manifested,
        write_manifested,
    )

    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "alpha", "d1"), (2, "beta", "d1"), (3, "gamma", "d2")],
        "id INT, name STRING, dt STRING",
    )
    v = write_manifested(df, path, ["dt"], stats_cols=["id"])
    assert v == 1
    assert {r.id for r in read_manifested(spark, path).collect()} == {1, 2, 3}

    import pytest

    with pytest.raises(ValueError, match="already a manifested table"):
        write_manifested(df, path, ["dt"])

    inv = manifest_files(spark, path)
    rows = inv.collect()
    assert {r.leaf for r in rows} == {"dt=d1", "dt=d2"}
    assert all(r.bytes > 0 for r in rows)
    d1 = [r for r in rows if r.leaf == "dt=d1"]
    assert sum(r.rows for r in d1) == 2
    assert all(r.stats["id"] is not None for r in rows)

    # a superseding merge leaves v1's old dir as a RETAINED (referenced)
    # dir, not an orphan; a hand-planted junk dir IS an orphan
    merge_upsert_manifested(
        spark,
        path,
        spark.createDataFrame([(1, "ALPHA", "d1")], "id INT, name STRING, dt STRING"),
        ["id"],
        ["dt"],
    )
    junk = os.path.join(path, "dt=d1", "__v0000000009-junk")
    os.makedirs(junk)
    with open(os.path.join(junk, "f.parquet"), "wb") as f:
        f.write(b"x" * 100)
    orph = {r.dir_rel: r for r in manifest_orphans(spark, path).collect()}
    assert "dt=d1/__v0000000009-junk" in orph
    assert not orph["dt=d1/__v0000000009-junk"].reclaimable  # young
    old = 1_000_000_000
    os.utime(junk, (old, old))
    orph2 = {r.dir_rel: r for r in manifest_orphans(spark, path).collect()}
    assert orph2["dt=d1/__v0000000009-junk"].reclaimable
    # dry run: nothing was deleted
    assert os.path.isdir(junk)


def test_delete_and_update_where_manifested(spark, tmp_path):
    """Predicate DML through the snapshot layer: DELETE WHERE keeps
    NULL-predicate rows (SQL semantics), drains leaves atomically;
    UPDATE WHERE with a partition-moving assignment publishes source
    drain + destination growth in one commit; both bump versions under
    the OCC protocol and time travel still reads the pre-DML state."""
    from etl_demo_spark.io.manifest import (
        delete_where_manifested,
        load_manifest,
        manifest_init,
        read_manifested,
        update_where_manifested,
    )

    path = str(tmp_path / "t")
    rows = [
        (1, 10, "A"), (2, None, "A"), (3, 30, "A"),
        (4, 40, "B"), (5, 5, "C"),
    ]
    spark.createDataFrame(rows, "id INT, val INT, seg STRING").write.partitionBy(
        "seg"
    ).parquet(path)
    manifest_init(spark, path, "seg")

    # DELETE val < 20: id1 (10) and id5 (5) go; id2's NULL predicate KEEPS it
    affected = delete_where_manifested(
        spark, path, F.col("val") < 20, "seg"
    )
    assert sorted(affected) == ["A", "C"]
    got = {r.id for r in read_manifested(spark, path).collect()}
    assert got == {2, 3, 4}
    _, mapping = load_manifest(spark, path)
    assert "seg=C" not in mapping  # drained leaf left the snapshot

    # UPDATE moving rows A -> Z (partition-moving assignment)
    affected = update_where_manifested(
        spark,
        path,
        {"val": F.coalesce(F.col("val"), F.lit(0)) + 1, "seg": F.lit("Z")},
        F.col("seg") == "A",
        "seg",
    )
    assert sorted(affected) == ["A", "Z"]
    got = {r.id: (r.val, r.seg) for r in read_manifested(spark, path).collect()}
    assert got == {2: (1, "Z"), 3: (31, "Z"), 4: (40, "B")}
    version, mapping = load_manifest(spark, path)
    assert version == 3 and "seg=A" not in mapping
    # time travel: the pre-UPDATE snapshot still reads complete
    prior = {r.id for r in read_manifested(spark, path, version=2).collect()}
    assert prior == {2, 3, 4}


def test_change_feed_and_timestamp_travel(spark, tmp_path):
    """read_changes: row-level diff between snapshots bounded by changed
    leaves — an update surfaces as delete+insert, a drained leaf's rows
    as deletes, unchanged leaves are never scanned. version_at_timestamp
    resolves AS-OF stamps within the retention window."""
    import time as _time

    from etl_demo_spark.io.manifest import (
        manifest_init,
        merge_upsert_manifested,
        read_changes,
        read_manifested,
        version_at_timestamp,
    )

    path = str(tmp_path / "t")
    _seed(spark, path)  # v1
    manifest_init(spark, path, ["dt", "seg"])
    t_after_v1 = int(_time.time() * 1000)

    # v2: update id1, insert id9 (both in d1/A); move id2 d1/B -> d2/B
    src = spark.createDataFrame(
        [(1, "ALPHA2", "d1", "A"), (9, "iota", "d1", "A"), (2, "beta", "d2", "B")],
        "id INT, name STRING, dt STRING, seg STRING",
    )
    merge_upsert_manifested(spark, path, src, ["id"], ["dt", "seg"])

    ch = read_changes(spark, path, 1, 2)
    got = {(r.id, r.name, r.dt, r.seg, r._change_type) for r in ch.collect()}
    assert got == {
        (1, "alpha", "d1", "A", "delete"),
        (1, "ALPHA2", "d1", "A", "insert"),
        (9, "iota", "d1", "A", "insert"),
        (2, "beta", "d1", "B", "delete"),
        (2, "beta", "d2", "B", "insert"),
    }
    # unchanged leaf (d2,A) never read
    assert not any("dt=d2/seg=A" in f for f in ch.inputFiles())

    # AS-OF timestamp: between the two commits resolves to v1
    v = version_at_timestamp(spark, path, t_after_v1)
    assert v == 1
    assert {r.id for r in read_manifested(spark, path, version=v).collect()} == {
        1, 2, 3, 4
    }
    import pytest

    with pytest.raises(FileNotFoundError, match="at or before"):
        version_at_timestamp(spark, path, 1)  # epoch 1970: nothing retained

    with pytest.raises(ValueError, match="must be newer"):
        read_changes(spark, path, 2, 1)


def test_compact_manifested_zorder_prunes_both_dimensions(spark, tmp_path):
    """OPTIMIZE ... ZORDER: after a Z-order compaction, manifest file
    stats prune range reads on EITHER clustered dimension — the
    scattered pre-compaction layout makes min/max useless on both."""
    from etl_demo_spark.io.manifest import (
        compact_manifested,
        manifest_init,
        read_manifested,
    )

    path = str(tmp_path / "grid")
    n = 4096
    df = spark.range(n).select(
        (F.col("id") % 64).alias("x"),
        (F.col("id") / 64).cast("long").alias("y"),
        F.col("id").alias("payload"),
        F.lit("d1").alias("dt"),
    )
    # 16 scattered files: every file spans the full x and y ranges
    df.repartition(16).write.partitionBy("dt").parquet(path)
    manifest_init(spark, path, "dt", stats_cols=["x", "y"])

    before = read_manifested(spark, path)
    total_files = len(before.inputFiles())
    assert total_files >= 16
    scat_x = len(
        read_manifested(spark, path, prune_ranges={"x": (0, 7)}).inputFiles()
    )
    assert scat_x == total_files  # scattered: stats prune nothing

    compacted = compact_manifested(
        spark, path, target_file_bytes=6 * 1024, zorder_cols=["x", "y"]
    )
    assert compacted == ["dt=d1"]
    after = read_manifested(spark, path)
    out_files = len(after.inputFiles())
    assert out_files >= 4  # a real multi-file rewrite, not one blob

    # logical equality: pure rewrite
    assert after.count() == n
    assert (
        after.select(F.sum("payload")).collect()[0][0]
        == before.select(F.sum("payload")).collect()[0][0]
    )

    # both dimensions now prune to strict subsets with zero row loss
    for col, lohi, expect_rows in (
        ("x", (0, 7), n // 8),
        ("y", (0, 7), 64 * 8),
    ):
        pruned = read_manifested(spark, path, prune_ranges={col: lohi})
        assert len(pruned.inputFiles()) < out_files, col
        assert (
            pruned.filter(
                (F.col(col) >= lohi[0]) & (F.col(col) <= lohi[1])
            ).count()
            == expect_rows
        ), col

    # sort_cols + zorder_cols together are refused
    import pytest as _pytest

    with _pytest.raises(ValueError, match="mutually exclusive"):
        compact_manifested(spark, path, sort_cols=["x"], zorder_cols=["y"])


def test_rollback_restores_snapshot_as_new_commit(spark, tmp_path):
    """RESTORE semantics: rollback publishes a NEW version holding the
    old snapshot's complete state (mapping, schema, DVs) — history moves
    forward, the restored read equals the old read, and rolling back
    across a DV delete clears the pointer rather than inheriting it."""
    import pytest

    from etl_demo_spark.io.manifest import (
        _hadoop_fs,
        _load_doc,
        alter_manifested,
        delete_rows_manifested,
        manifest_versions,
        merge_upsert_manifested,
        read_manifested,
        rollback_manifested,
    )

    path = str(tmp_path / "t")
    _seed(spark, path)
    from etl_demo_spark.io.manifest import manifest_init

    manifest_init(spark, path, ["dt", "seg"])  # v1
    src = spark.createDataFrame(
        [(9, "iota", "d1", "A")], "id INT, name STRING, dt STRING, seg STRING"
    )
    merge_upsert_manifested(spark, path, src, ["id"], ["dt", "seg"])  # v2
    v1_rows = {r.id for r in read_manifested(spark, path, version=1).collect()}

    new_v = rollback_manifested(spark, path, 1)  # v3 == v1
    assert new_v == 3
    assert manifest_versions(spark, path)[-1] == 3
    got = {r.id for r in read_manifested(spark, path).collect()}
    assert got == v1_rows == {1, 2, 3, 4}

    # rollback across a DV delete: the restored snapshot has NO dv
    delete_rows_manifested(spark, path, F.col("id") == 2)  # v4
    assert {r.id for r in read_manifested(spark, path).collect()} == {1, 3, 4}
    rollback_manifested(spark, path, 3)  # v5 == v3
    fs, jvm = _hadoop_fs(spark, path)
    doc = _load_doc(fs, jvm, path)
    assert "dv" not in doc
    assert {r.id for r in read_manifested(spark, path).collect()} == {1, 2, 3, 4}

    # rollback across an ALTER restores the pre-ALTER schema
    alter_manifested(spark, path, add_columns={"note": "string"})  # v6
    assert "note" in read_manifested(spark, path).columns
    rollback_manifested(spark, path, 5)  # v7
    assert "note" not in read_manifested(spark, path).columns

    # only retained versions restore
    with pytest.raises(FileNotFoundError, match="not retained"):
        rollback_manifested(spark, path, 1)


def test_hidden_partitioning_transforms(spark, tmp_path):
    """Iceberg-style partition transforms: write_manifested derives the
    layout from days()/bucket() specs (writer never hand-maintains a dt
    column), prune_source prunes leaves from SOURCE-column predicates —
    a timestamp range, a bucket point lookup — and a later MERGE derives
    the partition values for its source rows automatically."""
    import datetime

    from pyspark.sql import functions as F

    from etl_demo_spark.io.manifest import (
        _load_doc,
        manifest_versions,
        merge_upsert_manifested,
        read_manifested,
        write_manifested,
    )
    from etl_demo_spark.io.tables import _hadoop_fs

    path = str(tmp_path / "t")
    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (i, t0 + datetime.timedelta(hours=6 * i), f"u{i % 7}", float(i))
        for i in range(40)
    ]  # 10 days of events
    df = spark.createDataFrame(rows, "id INT, ts TIMESTAMP, user STRING, v DOUBLE")
    write_manifested(
        df, path, partition_transforms={"p_day": "days(ts)", "p_u": "bucket(4, user)"}
    )

    fs, jvm = _hadoop_fs(spark, path)
    doc = _load_doc(fs, jvm, path)
    assert doc["partition_transforms"] == {
        "p_day": "days(ts)", "p_u": "bucket(4, user)"
    }
    full = read_manifested(spark, path)
    n_files = len(full.inputFiles())
    assert full.count() == 40 and "p_day" in full.columns

    # source-column RANGE prune: 2 of 10 days
    lo, hi = t0 + datetime.timedelta(days=2), t0 + datetime.timedelta(
        days=3, hours=23
    )
    pr = read_manifested(spark, path, prune_source={"ts": (lo, hi)})
    assert 0 < len(pr.inputFiles()) < n_files
    got = pr.filter((F.col("ts") >= lo) & (F.col("ts") <= hi)).count()
    assert got == df.filter((F.col("ts") >= lo) & (F.col("ts") <= hi)).count()

    # bucket POINT prune: at most 1/4 of the day-leaves survive
    pb = read_manifested(spark, path, prune_source={"user": "u3"})
    assert len(pb.inputFiles()) < n_files
    assert pb.filter(F.col("user") == "u3").count() == df.filter(
        F.col("user") == "u3"
    ).count()

    # a MERGE whose source has NO derived columns lands in the right leaf
    src = spark.createDataFrame(
        [(100, datetime.datetime(2024, 1, 2, 5), "u3", 9.9)],
        "id INT, ts TIMESTAMP, user STRING, v DOUBLE",
    )
    merge_upsert_manifested(spark, path, src, ["id"], ["p_day", "p_u"])
    after = read_manifested(
        spark, path, prune_source={"ts": (datetime.datetime(2024, 1, 2),
                                          datetime.datetime(2024, 1, 2, 23))}
    )
    assert 100 in {r.id for r in after.collect()}
    assert doc["partition_transforms"] == _load_doc(fs, jvm, path).get(
        "partition_transforms"
    ), "transforms must carry through the merge commit"
    assert len(manifest_versions(spark, path)) == 2

    # validation: unknown source column is an error, not silence
    import pytest

    with pytest.raises(ValueError, match="no partition transform"):
        read_manifested(spark, path, prune_source={"ghost": 1})
    with pytest.raises(ValueError, match="bad partition transform"):
        write_manifested(
            df, str(tmp_path / "bad"),
            partition_transforms={"p": "spline(ts)"},
        )


def test_hidden_partitioning_composes_with_dml_and_maintenance(spark, tmp_path):
    """A transform-partitioned table stays a full citizen of the DML and
    maintenance surface: DV delete, compaction (spec carries, pruning
    still works), time travel to the pre-delete snapshot, and the
    change feed."""
    import datetime

    from pyspark.sql import functions as F

    from etl_demo_spark.io.manifest import (
        _hadoop_fs,
        _load_doc,
        compact_manifested,
        delete_rows_manifested,
        manifest_versions,
        read_changes,
        read_manifested,
        write_manifested,
    )

    path = str(tmp_path / "t")
    t0 = datetime.datetime(2024, 3, 1)
    rows = [
        (i, t0 + datetime.timedelta(hours=12 * i), float(i)) for i in range(12)
    ]  # 6 days
    df = spark.createDataFrame(rows, "id INT, ts TIMESTAMP, v DOUBLE")
    write_manifested(df, path, partition_transforms={"p_day": "days(ts)"})

    assert delete_rows_manifested(spark, path, F.col("id") == 4) == 1
    v_pre, v_post = manifest_versions(spark, path)[-2:]
    got = {r.id for r in read_manifested(spark, path).collect()}
    assert got == set(range(12)) - {4}
    # time travel still shows the deleted row
    assert 4 in {
        r.id for r in read_manifested(spark, path, version=v_pre).collect()
    }
    ch = {(r.id, r._change_type) for r in read_changes(spark, path, v_pre, v_post).collect()}
    assert ch == {(4, "delete")}

    compact_manifested(spark, path, min_files=1)
    fs, jvm = _hadoop_fs(spark, path)
    doc = _load_doc(fs, jvm, path)
    assert doc.get("partition_transforms") == {"p_day": "days(ts)"}, (
        "spec must carry through compaction"
    )
    # pruning still works on the compacted layout
    lo = datetime.datetime(2024, 3, 2)
    hi = datetime.datetime(2024, 3, 2, 23)
    pr = read_manifested(spark, path, prune_source={"ts": (lo, hi)})
    assert len(pr.inputFiles()) < len(read_manifested(spark, path).inputFiles())
    assert {r.id for r in pr.filter((F.col("ts") >= lo) & (F.col("ts") <= hi)).collect()} == {2, 3}


def test_append_manifested_no_rewrite_fast_path(spark, tmp_path):
    """APPEND lands new files as extra version subdirs: byte-identical
    existing inventory (mtimes included), rows visible immediately,
    operation=APPEND in the history, change feed shows pure inserts,
    time travel to the pre-append snapshot, and a brand-new partition
    value becomes an ordinary primary leaf."""
    import glob
    import os

    from pyspark.sql import functions as F

    from etl_demo_spark.io.manifest import (
        append_manifested,
        manifest_history,
        manifest_versions,
        read_changes,
        read_manifested,
        write_manifested,
    )

    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "a", "p1"), (2, "b", "p1"), (3, "c", "p2")],
        "id INT, name STRING, part STRING",
    )
    write_manifested(df, path, "part")
    before = {
        f: os.path.getmtime(f) for f in glob.glob(f"{path}/part=*/__v*/*.parquet")
    }

    touched = append_manifested(
        spark,
        path,
        spark.createDataFrame(
            [(4, "d", "p1"), (5, "e", "p3")], "id INT, name STRING, part STRING"
        ),
    )
    assert touched == ["part=p1", "part=p3"]
    after = {
        f: os.path.getmtime(f) for f in glob.glob(f"{path}/part=*/__v*/*.parquet")
    }
    assert before.items() <= after.items(), "append must not touch existing files"
    assert len(after) > len(before)

    got = {r.id: (r.name, r.part) for r in read_manifested(spark, path).collect()}
    assert got == {
        1: ("a", "p1"), 2: ("b", "p1"), 3: ("c", "p2"),
        4: ("d", "p1"), 5: ("e", "p3"),
    }
    h = {r["version"]: r["operation"] for r in manifest_history(spark, path).collect()}
    assert h[2] == "APPEND"
    vs = manifest_versions(spark, path)
    assert {r.id for r in read_manifested(spark, path, version=vs[-2]).collect()} == {1, 2, 3}
    ch = {(r.id, r._change_type) for r in read_changes(spark, path, vs[-2], vs[-1]).collect()}
    assert ch == {(4, "insert"), (5, "insert")}


def test_append_then_rewrite_consolidates_extras(spark, tmp_path):
    """A later MERGE or OPTIMIZE on an appended leaf consolidates the
    extras into its new primary vrel (extra_vrels entry dropped, no row
    lost); stats stay maintained so range pruning covers appended files."""
    from pyspark.sql import functions as F

    from etl_demo_spark.io.manifest import (
        _hadoop_fs,
        _load_doc,
        append_manifested,
        compact_manifested,
        merge_upsert_manifested,
        read_manifested,
        write_manifested,
    )

    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, i * 10, "p1" if i < 3 else "p2") for i in range(6)],
        "id INT, v INT, part STRING",
    )
    write_manifested(df, path, "part", stats_cols=["id"])
    append_manifested(
        spark,
        path,
        spark.createDataFrame(
            [(100, 1000, "p1"), (101, 1010, "p2")], "id INT, v INT, part STRING"
        ),
    )
    fs, jvm = _hadoop_fs(spark, path)
    doc = _load_doc(fs, jvm, path)
    assert set(doc["extra_vrels"]) == {"part=p1", "part=p2"}
    # appended files carry stats: a range probe on the appended ids opens
    # only their files
    pr = read_manifested(spark, path, prune_ranges={"id": (100, 101)})
    assert 0 < len(pr.inputFiles()) < len(read_manifested(spark, path).inputFiles())
    assert {r.id for r in pr.filter("id >= 100").collect()} == {100, 101}

    # merge touching p1 consolidates p1's extras, leaves p2's alone
    merge_upsert_manifested(
        spark, path,
        spark.createDataFrame([(0, 999, "p1")], "id INT, v INT, part STRING"),
        ["id"], "part",
    )
    doc = _load_doc(fs, jvm, path)
    assert "part=p1" not in (doc.get("extra_vrels") or {})
    assert "part=p2" in doc["extra_vrels"]
    got = {r.id: r.v for r in read_manifested(spark, path).collect()}
    assert got[0] == 999 and got[100] == 1000 and got[101] == 1010

    # compaction consolidates the rest
    compact_manifested(spark, path, min_files=2)
    doc = _load_doc(fs, jvm, path)
    assert not doc.get("extra_vrels")
    assert {r.id for r in read_manifested(spark, path).collect()} == (
        set(range(6)) | {100, 101}
    )


def test_append_composes_with_dv_constraints_and_transforms(spark, tmp_path):
    """Appends respect CHECK constraints (refused wholesale), derive
    hidden-partitioning columns, and appended rows are DV-deletable."""
    import datetime

    import pytest
    from pyspark.sql import functions as F

    from etl_demo_spark.io.manifest import (
        ConstraintViolation,
        add_constraint_manifested,
        append_manifested,
        delete_rows_manifested,
        read_manifested,
        write_manifested,
    )

    path = str(tmp_path / "t")
    t0 = datetime.datetime(2024, 5, 1)
    df = spark.createDataFrame(
        [(i, t0 + datetime.timedelta(days=i), float(i)) for i in range(4)],
        "id INT, ts TIMESTAMP, v DOUBLE",
    )
    write_manifested(df, path, partition_transforms={"p_day": "days(ts)"})
    add_constraint_manifested(spark, path, "v_nonneg", "v >= 0")

    with pytest.raises(ConstraintViolation):
        append_manifested(
            spark, path,
            spark.createDataFrame(
                [(9, t0, -1.0)], "id INT, ts TIMESTAMP, v DOUBLE"
            ),
        )
    # hidden partitioning: source carries NO p_day; appended row lands in
    # the right derived leaf and prunes by source predicate
    append_manifested(
        spark, path,
        spark.createDataFrame(
            [(10, datetime.datetime(2024, 5, 2, 6), 7.0)],
            "id INT, ts TIMESTAMP, v DOUBLE",
        ),
    )
    pr = read_manifested(
        spark, path,
        prune_source={"ts": (datetime.datetime(2024, 5, 2),
                             datetime.datetime(2024, 5, 2, 23))},
    )
    assert {r.id for r in pr.collect()} == {1, 10}
    assert delete_rows_manifested(spark, path, F.col("id") == 10) == 1
    assert 10 not in {r.id for r in read_manifested(spark, path).collect()}


def test_append_txn_guard_idempotent(spark, tmp_path):
    """Delta-style idempotent writes: an append replayed at-or-below its
    recorded txn version is a no-op; higher versions apply; app ids are
    independent lines; the guard and the data share one atomic commit."""
    import pytest

    from etl_demo_spark.io.manifest import (
        _hadoop_fs,
        _load_doc,
        append_manifested,
        manifest_versions,
        read_manifested,
        write_manifested,
    )

    path = str(tmp_path / "t")
    write_manifested(
        spark.createDataFrame([(0, "p0")], "id INT, part STRING"), path, "part"
    )
    src = spark.createDataFrame([(1, "p0")], "id INT, part STRING")
    assert append_manifested(spark, path, src, txn_app="a", txn_version=1)
    v = manifest_versions(spark, path)[-1]
    # replay at the same and at a lower version: no-ops, no new commit
    assert append_manifested(spark, path, src, txn_app="a", txn_version=1) == []
    assert append_manifested(spark, path, src, txn_app="a", txn_version=0) == []
    assert manifest_versions(spark, path)[-1] == v
    assert read_manifested(spark, path).count() == 2
    # a higher version applies; the recorded watermark advances
    assert append_manifested(spark, path, src, txn_app="a", txn_version=2)
    doc = _load_doc(*_hadoop_fs(spark, path), path)
    assert doc["txns"] == {"a": 2}
    assert read_manifested(spark, path).count() == 3
    with pytest.raises(ValueError, match="go together"):
        append_manifested(spark, path, src, txn_app="a")


def test_append_rejects_schema_mismatch(spark, tmp_path):
    """ADVICE r7: append is INSERT, never schema evolution — a source
    missing a column, carrying an extra one, or with an incompatible
    type is refused wholesale (reads would otherwise silently surface
    NULLs / drop the unknown column)."""
    import pytest

    from etl_demo_spark.io.manifest import append_manifested, write_manifested

    path = str(tmp_path / "t")
    write_manifested(
        spark.createDataFrame(
            [(1, "a", "p1")], "id INT, name STRING, part STRING"
        ),
        path,
        "part",
    )
    with pytest.raises(ValueError, match="missing=\\['name'\\]"):
        append_manifested(
            spark, path,
            spark.createDataFrame([(2, "p1")], "id INT, part STRING"),
        )
    with pytest.raises(ValueError, match="extra=\\['typo'\\]"):
        append_manifested(
            spark, path,
            spark.createDataFrame(
                [(2, "b", "x", "p1")],
                "id INT, name STRING, typo STRING, part STRING",
            ),
        )
    with pytest.raises(ValueError, match="type_mismatch"):
        append_manifested(
            spark, path,
            spark.createDataFrame(
                [(2, "b", "p1")], "id BIGINT, name STRING, part STRING"
            ),
        )
    # matching schema (any column ORDER) still appends
    src = spark.createDataFrame(
        [("c", "p1", 3)], "name STRING, part STRING, id INT"
    ).select("id", "name", "part")
    assert append_manifested(spark, path, src) == ["part=p1"]


def test_manifest_diff_counts_dv_inside_append_extras(spark, tmp_path):
    """ADVICE r7: rows_before/rows_after must subtract DV-deleted rows
    that live inside APPEND extra vrels, and a DV-only commit whose
    deletes land in an extra vrel must surface as rows_deleted."""
    from etl_demo_spark.io.manifest import (
        append_manifested,
        delete_rows_manifested,
        manifest_diff,
        manifest_init,
        write_manifested,
    )

    path = str(tmp_path / "t")
    write_manifested(
        spark.createDataFrame(
            [(i, "p1") for i in range(5)], "id INT, part STRING"
        ),
        path,
        "part",
        stats_cols=["id"],
    )  # v1: 5 rows
    append_manifested(
        spark, path,
        spark.createDataFrame(
            [(i, "p1") for i in range(100, 104)], "id INT, part STRING"
        ),
    )  # v2: +4 rows in an extra vrel
    # v3: DV-delete 2 rows that live ONLY in the appended extra
    assert delete_rows_manifested(spark, path, F.col("id").isin(100, 101)) == 2

    d23 = manifest_diff(spark, path, 2, 3)
    assert d23 == {
        "part=p1": {"status": "rows_deleted", "rows_before": 9, "rows_after": 7}
    }
    # and a later append's before-count reflects the extras' DV deletes
    append_manifested(
        spark, path,
        spark.createDataFrame([(200, "p1")], "id INT, part STRING"),
    )  # v4
    d34 = manifest_diff(spark, path, 3, 4)
    assert d34 == {
        "part=p1": {"status": "rows_appended", "rows_before": 7, "rows_after": 8}
    }


# ---------------------------------------------------------------------------
# Commit-time conflict detection: lost races rebase instead of re-running
# (round 9)
# ---------------------------------------------------------------------------


def _stat_files(root):
    """(path -> (size, mtime_ns)) for every data file under root,
    excluding manifests/stats/sidecar metadata dirs."""
    import os

    out = {}
    for dirpath, dirnames, filenames in os.walk(root):
        if "_manifests" in dirpath or "_stats" in dirpath:
            continue
        for f in filenames:
            if f.startswith(("_", ".")):
                continue
            p = os.path.join(dirpath, f)
            st = os.stat(p)
            out[p] = (st.st_size, st.st_mtime_ns)
    return out


def test_append_losing_race_rebases_without_restaging(
    spark, tmp_path, monkeypatch
):
    """An APPEND that loses the CAS race to a MERGE on a DIFFERENT leaf
    republishes its already-staged files onto the winner's snapshot:
    zero data bytes rewritten (byte-identity of the staged files), one
    extra manifest CAS, occ_stats records a rebase and no re-run."""
    import etl_demo_spark.io.manifest as m

    path = str(tmp_path / "t")
    _seed(spark, path)
    m.manifest_init(spark, path, ["dt", "seg"])  # v1

    real_publish = m._publish_cas
    state = {"injected": False, "staged": None}

    def racing_publish(fs, jvm, p, data):
        if not state["injected"]:
            state["injected"] = True
            # capture the loser's staged bytes BEFORE the winner runs
            state["staged"] = _stat_files(path)
            src_b = spark.createDataFrame(
                [(2, "B-WINNER", "d1", "B")],
                "id INT, name STRING, dt STRING, seg STRING",
            )
            m.merge_upsert_manifested(spark, path, src_b, ["id"], ["dt", "seg"])
        return real_publish(fs, jvm, p, data)

    monkeypatch.setattr(m, "_publish_cas", racing_publish)
    base_stats = dict(m.occ_stats)
    src_a = spark.createDataFrame(
        [(50, "A-APPEND", "d2", "A")],
        "id INT, name STRING, dt STRING, seg STRING",
    )
    touched = m.append_manifested(spark, path, src_a)
    assert touched == ["dt=d2/seg=A"]
    assert m.occ_stats["cas_lost"] == base_stats["cas_lost"] + 1
    assert m.occ_stats["rebased"] == base_stats["rebased"] + 1
    assert m.occ_stats["reran"] == base_stats["reran"]

    # byte-identity: every file the loser staged before losing the race
    # is still on disk, same size, same mtime — nothing was re-written
    after = _stat_files(path)
    for p, sig in state["staged"].items():
        assert after.get(p) == sig, f"staged file churned: {p}"

    version, _ = m.load_manifest(spark, path)
    assert version == 3  # winner v2, rebased loser v3
    fs, jvm = m._hadoop_fs(spark, path)
    assert m._resolve_doc(fs, jvm, path, 3).get("operation") == "APPEND"
    got = {r.id: r.name for r in m.read_manifested(spark, path).collect()}
    assert got[50] == "A-APPEND" and got[2] == "B-WINNER"
    assert len(got) == 5


def test_merge_losing_race_to_disjoint_append_rebases(
    spark, tmp_path, monkeypatch
):
    """The mirror race: a MERGE (leaf rewrite) loses to an APPEND on a
    different leaf — the rewrite republishes staged files untouched."""
    import etl_demo_spark.io.manifest as m

    path = str(tmp_path / "t")
    _seed(spark, path)
    m.manifest_init(spark, path, ["dt", "seg"])

    real_publish = m._publish_cas
    state = {"injected": False, "staged": None}

    def racing_publish(fs, jvm, p, data):
        if not state["injected"]:
            state["injected"] = True
            state["staged"] = _stat_files(path)
            src_b = spark.createDataFrame(
                [(60, "B-APPEND", "d2", "B")],
                "id INT, name STRING, dt STRING, seg STRING",
            )
            m.append_manifested(spark, path, src_b)
        return real_publish(fs, jvm, p, data)

    monkeypatch.setattr(m, "_publish_cas", racing_publish)
    base_stats = dict(m.occ_stats)
    src_a = spark.createDataFrame(
        [(1, "A-MERGE", "d1", "A")], "id INT, name STRING, dt STRING, seg STRING"
    )
    m.merge_upsert_manifested(spark, path, src_a, ["id"], ["dt", "seg"])
    assert m.occ_stats["rebased"] == base_stats["rebased"] + 1
    assert m.occ_stats["reran"] == base_stats["reran"]
    after = _stat_files(path)
    for p, sig in state["staged"].items():
        assert after.get(p) == sig, f"staged file churned: {p}"
    got = {r.id: r.name for r in m.read_manifested(spark, path).collect()}
    assert got[1] == "A-MERGE" and got[60] == "B-APPEND"
    assert len(got) == 5
    version, _ = m.load_manifest(spark, path)
    assert version == 3


def test_same_leaf_race_still_reruns_full_transaction(
    spark, tmp_path, monkeypatch
):
    """True conflict (winner rewrote the SAME leaf the loser appends to)
    must take the full re-run path — the rebase would otherwise attach
    extras computed against a stale leaf state."""
    import etl_demo_spark.io.manifest as m

    path = str(tmp_path / "t")
    _seed(spark, path)
    m.manifest_init(spark, path, ["dt", "seg"])

    real_publish = m._publish_cas
    state = {"injected": False}

    def racing_publish(fs, jvm, p, data):
        if not state["injected"]:
            state["injected"] = True
            src_b = spark.createDataFrame(
                [(1, "B-SAME-LEAF", "d1", "A")],
                "id INT, name STRING, dt STRING, seg STRING",
            )
            m.merge_upsert_manifested(spark, path, src_b, ["id"], ["dt", "seg"])
        return real_publish(fs, jvm, p, data)

    monkeypatch.setattr(m, "_publish_cas", racing_publish)
    base_stats = dict(m.occ_stats)
    src_a = spark.createDataFrame(
        [(70, "A-SAME-LEAF", "d1", "A")],
        "id INT, name STRING, dt STRING, seg STRING",
    )
    m.append_manifested(spark, path, src_a)
    assert m.occ_stats["reran"] == base_stats["reran"] + 1
    assert m.occ_stats["rebased"] == base_stats["rebased"]
    got = {r.id: r.name for r in m.read_manifested(spark, path).collect()}
    assert got[1] == "B-SAME-LEAF" and got[70] == "A-SAME-LEAF"
    assert len(got) == 5


def test_rebase_conflict_classifier_units():
    """Pure-dict classification table for `_rebase_conflict`."""
    from etl_demo_spark.io.manifest import _rebase_conflict

    base = {"version": 1, "partitions": {"a": "a/v1", "b": "b/v1"}}
    # disjoint append vs append: no conflict
    head = {**base, "version": 2, "extra_vrels": {"a": ["a/v2x"]}}
    new = {**base, "version": 2, "extra_vrels": {"b": ["b/v2y"]}}
    assert _rebase_conflict(base, head, new) is None
    # same-leaf append-append: extras union — NO conflict
    new2 = {**base, "version": 2, "extra_vrels": {"a": ["a/v2z"]}}
    assert _rebase_conflict(base, head, new2) is None
    # same-leaf append-append under the SPLIT stats layout is mergeable
    # too (the rebase publish unions the per-leaf stats files)
    head_fm = {**head, "files_manifests": {"a": "s1", "b": "s2"}}
    base_fm = {**base, "files_manifests": {"a": "s0", "b": "s2"}}
    new2_fm = {**new2, "files_manifests": {"a": "s3", "b": "s2"}}
    assert _rebase_conflict(base_fm, head_fm, new2_fm) is None
    # a transaction that ITSELF flips the stats layout re-runs (cheap,
    # metadata-only), and a split → embedded head flip has no merge —
    # but an embedded-base data commit racing a CONVERT winner is
    # mergeable: the publish translates its embedded entries into
    # per-leaf stats files (`_convert_stats_on_rebase`)
    assert "layout" in _rebase_conflict(base_fm, head_fm, new2)
    assert _rebase_conflict(base, head_fm, new2) is None
    # the loser IS the convert: its doc flips the layout -> re-run
    assert "layout" in _rebase_conflict(base, head, new2_fm)
    # same-leaf rewrite vs append: conflict
    head_rw = {**base, "version": 2, "partitions": {"a": "a/v2", "b": "b/v1"}}
    assert "overlap" in _rebase_conflict(base, head_rw, new2)
    # winner changed schema: conflict
    head2 = {**base, "version": 2, "schema": "{}"}
    assert "config" in _rebase_conflict(base, head2, new)
    # both moved the DV sidecar: conflict
    head3 = {**base, "version": 2, "dv": {"rel": "_dv/1", "files": {}}}
    new3 = {**base, "version": 2, "dv": {"rel": "_dv/2", "files": {}}}
    assert "deletion-vector" in _rebase_conflict(base, head3, new3)
    # dv entries name their leaves: a rewrite of that leaf conflicts
    head4 = {
        "version": 2,
        "partitions": {"a": "a/v2", "b": "b/v1"},
    }
    new4 = {
        **base,
        "version": 2,
        "dv": {"rel": "_dv/3", "files": {"a/v1/f0.parquet": 2}},
    }
    assert "overlap" in _rebase_conflict(base, head4, new4)
