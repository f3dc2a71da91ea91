"""Deletion vectors (io/manifest.py delete_rows_manifested): merge-on-read
DELETE — no data file is rewritten, reads anti-join the position sidecar,
rewrites materialize the deletions, GC reclaims superseded DV datasets."""

from __future__ import annotations

import glob
import os
import threading

from pyspark.sql import functions as F


def _seed(spark, path: str, stats: bool = True):
    from etl_demo_spark.io.manifest import write_manifested

    df = spark.range(100).select(
        "id",
        (F.col("id") % 4).cast("string").alias("k"),
        (F.col("id") * 10).alias("v"),
    )
    write_manifested(
        df.repartition(3), path, "k", stats_cols=["id"] if stats else None
    )


def test_dv_delete_rewrites_nothing_and_filters_reads(spark, tmp_path):
    """The write-amplification contract: DELETE via deletion vectors
    leaves every data file byte-identical (same paths, same sizes) and
    writes only the _dv sidecar; reads exclude exactly the matched rows.
    NULL-predicate rows are KEPT (SQL DELETE removes only TRUE rows)."""
    from etl_demo_spark.io.manifest import (
        delete_rows_manifested,
        read_manifested,
    )

    path = str(tmp_path / "t")
    _seed(spark, path)
    before = {
        f: os.path.getsize(f) for f in glob.glob(f"{path}/k=*/__v*/*.parquet")
    }

    n = delete_rows_manifested(spark, path, F.col("id") % 10 == 3)
    assert n == 10
    after = {
        f: os.path.getsize(f) for f in glob.glob(f"{path}/k=*/__v*/*.parquet")
    }
    assert before == after, "DV delete must not touch data files"
    assert os.path.isdir(os.path.join(path, "_dv"))

    got = sorted(r.id for r in read_manifested(spark, path).collect())
    assert got == [i for i in range(100) if i % 10 != 3]

    # NULL predicate keeps the row: v IS NULL rows survive a v<0 delete
    path2 = str(tmp_path / "t2")
    rows = [(1, None, "A"), (2, -5, "A"), (3, 7, "B")]
    from etl_demo_spark.io.manifest import write_manifested

    write_manifested(
        spark.createDataFrame(rows, "id INT, val INT, seg STRING"), path2, "seg"
    )
    assert delete_rows_manifested(spark, path2, F.col("val") < 0) == 1
    assert {r.id for r in read_manifested(spark, path2).collect()} == {1, 3}


def test_dv_composes_idempotent_and_noop_skips_commit(spark, tmp_path):
    """Consecutive DV deletes union correctly; a re-run of the same
    predicate matches nothing (the snapshot read already excludes deleted
    rows) and publishes NO new version."""
    from etl_demo_spark.io.manifest import (
        delete_rows_manifested,
        manifest_versions,
        read_manifested,
    )

    path = str(tmp_path / "t")
    _seed(spark, path)
    assert delete_rows_manifested(spark, path, F.col("id") % 10 == 3) == 10
    # 3 already gone from [0..5): 0,1,2,4 remain to delete
    assert delete_rows_manifested(spark, path, F.col("id") < 5) == 4
    got = sorted(r.id for r in read_manifested(spark, path).collect())
    assert got == [i for i in range(100) if i % 10 != 3 and i >= 5]

    vs = manifest_versions(spark, path)
    assert delete_rows_manifested(spark, path, F.col("id") < 5) == 0
    assert manifest_versions(spark, path) == vs, "no-op must not commit"


def test_dv_time_travel_and_change_feed(spark, tmp_path):
    """A DV-only commit changes no version subdir, yet time travel reads
    the pre-delete rows and read_changes surfaces the deletions — scoped
    to the leaves whose DV entries changed, never the whole table."""
    from etl_demo_spark.io.manifest import (
        delete_rows_manifested,
        manifest_versions,
        read_changes,
        read_manifested,
    )

    path = str(tmp_path / "t")
    _seed(spark, path)
    v1 = manifest_versions(spark, path)[-1]
    # ids 0,4,8,..,96 live in k=0; delete four of them
    assert delete_rows_manifested(spark, path, F.col("id").isin(0, 4, 8, 12)) == 4
    v2 = manifest_versions(spark, path)[-1]

    prior = sorted(r.id for r in read_manifested(spark, path, version=v1).collect())
    assert prior == list(range(100))

    ch = read_changes(spark, path, v1, v2)
    got = {(r.id, r._change_type) for r in ch.collect()}
    assert got == {(0, "delete"), (4, "delete"), (8, "delete"), (12, "delete")}
    # diff cost bounded by the DV-affected leaf (plus the sidecar):
    # k=1/2/3 never scanned
    assert all(
        "/k=0/" in f or "/_dv/" in f for f in ch.inputFiles()
    ), ch.inputFiles()


def test_dv_row_coordinates_match_manifest_keyspace(spark, tmp_path):
    """_attach_location's rel extraction (qualified-root substring of
    _metadata.file_path) must land in the SAME key space as the
    manifest's per-file stats map — the invariant the anti-join and the
    full-file drop both key on."""
    from etl_demo_spark.io.manifest import (
        _hadoop_fs,
        _load_doc,
        read_manifested,
    )

    path = str(tmp_path / "t")
    _seed(spark, path)
    fs, jvm = _hadoop_fs(spark, path)
    doc = _load_doc(fs, jvm, path)
    located = read_manifested(spark, path, _with_location=True)
    rels = {
        r["__dv_file"] for r in located.select("__dv_file").distinct().collect()
    }
    assert rels == set(doc["files"]), (rels, set(doc["files"]))
    # positions are per-file ordinals: each file's max pos == rows-1
    per_file = {
        r["__dv_file"]: r.mx
        for r in located.groupBy("__dv_file")
        .agg(F.max("__dv_pos").alias("mx"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for rel, mx in per_file.items():
        assert mx == doc["files"][rel]["__rows"] - 1


def test_dv_fully_deleted_file_leaves_listing(spark, tmp_path):
    """When a file's DV cardinality reaches its recorded row count, the
    read drops it from the listing outright (stats tables) — the
    scan-avoidance tier above the anti-join."""
    from etl_demo_spark.io.manifest import (
        delete_rows_manifested,
        read_manifested,
        write_manifested,
    )

    path = str(tmp_path / "t")
    df = spark.range(100).select(
        "id", (F.col("id") % 4).cast("string").alias("k")
    )
    write_manifested(df.coalesce(1), path, "k", stats_cols=["id"])
    assert delete_rows_manifested(spark, path, F.col("k") == "1") == 25
    rd = read_manifested(spark, path)
    assert not any("k=1" in f for f in rd.inputFiles()), rd.inputFiles()
    assert rd.count() == 75
    # stats pruning composes with DVs: a range read over deleted ids
    # still excludes them
    pruned = read_manifested(spark, path, prune_ranges={"id": (0, 10)})
    live = sorted(
        r.id for r in pruned.filter(F.col("id").between(0, 10)).collect()
    )
    assert live == [i for i in range(11) if i % 4 != 1]


def test_dv_materialized_by_rewrites_and_gc_reclaims(spark, tmp_path):
    """Copy-on-write committers read THROUGH the DVs: compaction
    materializes the deletions, drops the pointer, and once the
    DV-carrying manifests roll out of retention the sidecar dataset is
    GC'd. A partition-scoped merge prunes only its leaves' entries."""
    from etl_demo_spark.io.manifest import (
        _hadoop_fs,
        _load_doc,
        compact_manifested,
        delete_rows_manifested,
        merge_upsert_manifested,
        read_manifested,
    )

    path = str(tmp_path / "t")
    _seed(spark, path)
    assert delete_rows_manifested(spark, path, F.col("id") < 8) == 8
    fs, jvm = _hadoop_fs(spark, path)
    doc = _load_doc(fs, jvm, path)
    assert doc["dv"]["files"] and sum(doc["dv"]["files"].values()) == 8

    # merge touching k=0 only: its DV entries are pruned, others carried
    src = spark.createDataFrame(
        [(200, "0", 42)], "id BIGINT, k STRING, v BIGINT"
    )
    merge_upsert_manifested(spark, path, src, ["id"], "k")
    doc = _load_doc(fs, jvm, path)
    assert doc.get("dv"), "untouched leaves keep their DV entries"
    assert all("k=0" not in p for p in doc["dv"]["files"]), doc["dv"]["files"]
    got = sorted(r.id for r in read_manifested(spark, path).collect())
    assert got == [i for i in range(8, 100)] + [200]

    # full compaction materializes the rest and drops the pointer
    compact_manifested(spark, path, min_files=1)
    doc = _load_doc(fs, jvm, path)
    assert "dv" not in doc
    got2 = sorted(r.id for r in read_manifested(spark, path).collect())
    assert got2 == got

    # retention: two more commits roll the DV-carrying manifests out of
    # the window; their sidecar is superseded metadata -> reclaimed
    for i in (300, 301):
        merge_upsert_manifested(
            spark,
            path,
            spark.createDataFrame([(i, "0", 1)], "id BIGINT, k STRING, v BIGINT"),
            ["id"],
            "k",
        )
    dv_dirs = glob.glob(f"{path}/_dv/*")
    assert dv_dirs == [], dv_dirs


def test_dv_two_writers_threaded_both_commit(spark, tmp_path):
    """OCC: two concurrent DV deleters serialize — both sets of rows end
    up deleted, counts are exact, and no snapshot is lost."""
    from etl_demo_spark.io.manifest import (
        delete_rows_manifested,
        read_manifested,
    )

    path = str(tmp_path / "t")
    _seed(spark, path)
    results: dict[str, int] = {}
    errs: list[Exception] = []

    def run(name: str, pred):
        try:
            results[name] = delete_rows_manifested(spark, path, pred)
        except Exception as e:  # pragma: no cover - surfaced in assert
            errs.append(e)

    t1 = threading.Thread(target=run, args=("a", F.col("id") < 10))
    t2 = threading.Thread(target=run, args=("b", F.col("id") >= 90))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errs, errs
    assert results["a"] == 10 and results["b"] == 10
    got = sorted(r.id for r in read_manifested(spark, path).collect())
    assert got == list(range(10, 90))


def test_manifest_diff_surfaces_dv_deletes(spark, tmp_path):
    """A DV-only commit changes no version subdir, but the snapshot diff
    must still report the leaf's LIVE row change (physical − DV'd)."""
    from etl_demo_spark.io.manifest import (
        delete_rows_manifested,
        manifest_diff,
        manifest_versions,
    )

    path = str(tmp_path / "t")
    _seed(spark, path)
    v1 = manifest_versions(spark, path)[-1]
    # k=0 holds ids 0,4,...,96 (25 rows); delete three of them
    assert delete_rows_manifested(spark, path, F.col("id").isin(0, 4, 8)) == 3
    v2 = manifest_versions(spark, path)[-1]
    d = manifest_diff(spark, path, v1, v2)
    assert d == {
        "k=0": {"status": "rows_deleted", "rows_before": 25, "rows_after": 22}
    }, d


def test_register_manifested_sql_and_snapshot_pin(spark, tmp_path):
    """spark.sql over the governed table; the view pins the snapshot at
    registration (a later DV delete is invisible until re-register)."""
    from etl_demo_spark.io.manifest import (
        delete_rows_manifested,
        register_manifested,
    )

    path = str(tmp_path / "t")
    _seed(spark, path)
    register_manifested(spark, "mtab", path)
    n0 = spark.sql("SELECT count(*) AS n FROM mtab WHERE id % 2 = 0").first().n
    assert n0 == 50
    delete_rows_manifested(spark, path, F.col("id") < 10)
    # pinned view still reads the registration-time snapshot
    assert spark.sql("SELECT count(*) AS n FROM mtab").first().n == 100
    register_manifested(spark, "mtab", path)
    assert spark.sql("SELECT count(*) AS n FROM mtab").first().n == 90


def test_dv_sequence_equals_filter_composition(spark, tmp_path):
    """Property: any sequence of DV deletes is extensionally a filter
    composition — the surviving rows equal the base table filtered by
    the conjunction of negated predicates (with SQL NULL semantics)."""
    from etl_demo_spark.io.manifest import (
        delete_rows_manifested,
        read_manifested,
        write_manifested,
    )

    path = str(tmp_path / "t")
    base = spark.range(200).select(
        "id",
        (F.col("id") % 3).cast("string").alias("k"),
        F.when(F.col("id") % 11 == 0, None).otherwise(F.col("id") * 2).alias("v"),
    )
    write_manifested(base.repartition(3), path, "k")
    preds = [
        F.col("v") > 300,
        F.col("id") % 7 == 0,
        (F.col("v") < 50) & (F.col("id") % 2 == 0),
    ]
    for p in preds:
        delete_rows_manifested(spark, path, p)
    expected = base
    for p in preds:
        expected = expected.filter(~F.coalesce(p, F.lit(False)))
    got = sorted(r.id for r in read_manifested(spark, path).collect())
    want = sorted(r.id for r in expected.collect())
    assert got == want


def test_dv_composes_with_leaf_filter_and_version(spark, tmp_path):
    """DV anti-join composes with driver-side leaf pruning AND time
    travel in one read: the pruned listing still excludes deleted rows,
    and a versioned read of a pruned leaf applies THAT version's DV."""
    from etl_demo_spark.io.manifest import (
        delete_rows_manifested,
        manifest_versions,
        read_manifested,
    )

    path = str(tmp_path / "t")
    _seed(spark, path)
    delete_rows_manifested(spark, path, F.col("id").isin(0, 4, 1, 5))
    v1 = manifest_versions(spark, path)[-1]
    delete_rows_manifested(spark, path, F.col("id") == 8)

    k0 = read_manifested(spark, path, leaf_filter={"k": "0"})
    assert all("/k=0/" in f or "/_dv/" in f for f in k0.inputFiles())
    got = sorted(r.id for r in k0.collect())
    assert got == [i for i in range(100) if i % 4 == 0 and i not in (0, 4, 8)]

    prior = read_manifested(spark, path, version=v1, leaf_filter={"k": "0"})
    got_prior = sorted(r.id for r in prior.collect())
    assert got_prior == [i for i in range(100) if i % 4 == 0 and i not in (0, 4)]


def test_delete_keys_dv_direct_and_composite_keys(spark, tmp_path):
    """delete_keys_dv_manifested: key-set deletion through the sidecar —
    composite keys, absent keys are no-ops, no file rewritten."""
    from etl_demo_spark.io.manifest import (
        delete_keys_dv_manifested,
        read_manifested,
        write_manifested,
    )

    path = str(tmp_path / "t")
    rows = [(1, "a", "A"), (1, "b", "A"), (2, "a", "B"), (3, "c", "B")]
    write_manifested(
        spark.createDataFrame(rows, "id INT, sub STRING, seg STRING"), path, "seg"
    )
    before = sorted(glob.glob(f"{path}/seg=*/__v*/*.parquet"))
    keys = spark.createDataFrame(
        [(1, "b"), (3, "c"), (9, "zz")], "id INT, sub STRING"
    )
    n = delete_keys_dv_manifested(spark, path, keys, ["id", "sub"])
    assert n == 2  # (9,'zz') absent -> no-op
    assert sorted(glob.glob(f"{path}/seg=*/__v*/*.parquet")) == before
    got = {(r.id, r.sub) for r in read_manifested(spark, path).collect()}
    assert got == {(1, "a"), (2, "a")}
    # replay is idempotent
    assert delete_keys_dv_manifested(spark, path, keys, ["id", "sub"]) == 0


def test_rollback_loses_race_and_retries(spark, tmp_path):
    """RESTORE participates in the OCC protocol: a competing commit
    between resolve and publish forces the rollback onto the next
    version, and the restored state still wins."""
    from etl_demo_spark.io import manifest as M

    path = str(tmp_path / "t")
    _seed(spark, path)
    M.delete_rows_manifested(spark, path, F.col("id") < 5)  # v2
    calls = {"n": 0}
    orig = M._publish_cas

    def racing(fs, jvm, p, data):
        if calls["n"] == 0:
            calls["n"] += 1
            # inject a competing DV delete that wins this version
            M._publish_cas = orig
            try:
                M.delete_rows_manifested(spark, path, F.col("id") == 50)
            finally:
                M._publish_cas = racing
            return orig(fs, jvm, p, data)  # now loses: version taken
        return orig(fs, jvm, p, data)

    M._publish_cas = racing
    try:
        new_v = M.rollback_manifested(spark, path, 2)
    finally:
        M._publish_cas = orig
    assert new_v == 4  # lost v3 to the injected delete, landed on v4
    got = sorted(r.id for r in M.read_manifested(spark, path).collect())
    assert got == list(range(5, 100))  # v2 state restored, id 50 back


def test_update_rows_mor_writes_only_deltas(spark, tmp_path):
    """Merge-on-read UPDATE: matched rows tombstone into the DV sidecar
    and their postimages land as append extras — every pre-existing
    data file stays byte-identical, reads see the updated values, and
    repeated updates converge."""
    import etl_demo_spark.io.manifest as m

    path = str(tmp_path / "t")
    _seed(spark, path)
    before = {
        f: (os.path.getsize(f), os.path.getmtime(f))
        for f in glob.glob(f"{path}/k=*/__v*/*.parquet")
    }
    n = m.update_rows_manifested(
        spark, path, {"v": F.col("v") + 1}, F.col("id") % 10 == 3
    )
    assert n == 10
    after = {
        f: (os.path.getsize(f), os.path.getmtime(f))
        for f in glob.glob(f"{path}/k=*/__v*/*.parquet")
    }
    for f, sig in before.items():
        assert after.get(f) == sig, f"UPDATE rewrote a data file: {f}"
    got = m.read_manifested(spark, path)
    assert got.count() == 100
    vals = {r["id"]: r["v"] for r in got.collect()}
    assert all(
        vals[i] == i * 10 + (1 if i % 10 == 3 else 0) for i in range(100)
    )
    fs, jvm = m._hadoop_fs(spark, path)
    doc = m._load_doc(fs, jvm, path)
    assert doc.get("dv") and doc.get("extra_vrels")
    assert doc.get("operation") == "UPDATE"
    # second update hits the previously appended postimages (their
    # positions tombstone; new postimages append) and still converges
    n2 = m.update_rows_manifested(
        spark, path, {"v": F.col("v") * 2}, F.col("id") % 10 == 3
    )
    assert n2 == 10
    vals2 = {r["id"]: r["v"] for r in m.read_manifested(spark, path).collect()}
    assert all(
        vals2[i] == (i * 10 + 1) * 2 if i % 10 == 3 else vals2[i] == i * 10
        for i in range(100)
    )
    # stats stayed usable: a point probe on the updated slice still works
    assert m.read_manifested(spark, path).filter("id = 3").count() == 1
    # OPTIMIZE materializes: extras consolidate, answers unchanged
    m.compact_manifested(spark, path, min_files=1)
    vals3 = {r["id"]: r["v"] for r in m.read_manifested(spark, path).collect()}
    assert vals3 == vals2


def test_update_rows_mor_moves_rows_across_leaves(spark, tmp_path):
    """An assignment that changes a partition-defining column tombstones
    the old position and appends the postimage into its NEW leaf
    (created on demand)."""
    import etl_demo_spark.io.manifest as m

    path = str(tmp_path / "t")
    _seed(spark, path)
    n = m.update_rows_manifested(
        spark, path, {"k": F.lit("9")}, F.col("id") < 5
    )
    assert n == 5
    got = m.read_manifested(spark, path)
    assert got.count() == 100
    assert got.filter("k = '9'").count() == 5
    fs, jvm = m._hadoop_fs(spark, path)
    doc = m._load_doc(fs, jvm, path)
    assert "k=9" in doc["partitions"], "fresh leaf for moved rows"


def test_update_rows_mor_emits_cdf_pairs(spark, tmp_path):
    """On change_feed tables the MoR UPDATE stages exact preimage-delete
    + postimage-insert pairs in its sidecar."""
    import etl_demo_spark.io.manifest as m

    path = str(tmp_path / "t")
    df = spark.range(10).select(
        "id", (F.col("id") % 2).cast("string").alias("k"),
        (F.col("id") * 10).alias("v"),
    )
    m.write_manifested(df, path, "k", change_feed=True)
    m.update_rows_manifested(
        spark, path, {"v": F.col("v") + 7}, F.col("id") == 4
    )
    fs, jvm = m._hadoop_fs(spark, path)
    ch = m._load_raw(fs, jvm, path, 2).get("change_data")
    assert ch and ch.get("rel")
    side = spark.read.parquet(f"{path}/{ch['rel']}")
    rows = {(r["_change_type"], r["id"], r["v"]) for r in side.collect()}
    assert rows == {("delete", 4, 40), ("insert", 4, 47)}


def test_merge_mor_upserts_without_rewrite(spark, tmp_path):
    """Merge-on-read MERGE: matched keys tombstone positionally, every
    source row appends as extras — no pre-existing file rewritten,
    updates + inserts land in one atomic commit, replays with a txn
    guard are exactly-once."""
    import etl_demo_spark.io.manifest as m

    path = str(tmp_path / "t")
    _seed(spark, path)  # ids 0..99, v = id*10
    before = {
        f: (os.path.getsize(f), os.path.getmtime(f))
        for f in glob.glob(f"{path}/k=*/__v*/*.parquet")
    }
    src = spark.range(95, 105).select(
        "id",
        (F.col("id") % 4).cast("string").alias("k"),
        F.lit(-1).alias("v"),
    )
    n = m.merge_upsert_mor_manifested(
        spark, path, src, ["id"], txn_app="feed", txn_version=1
    )
    assert n == 10
    after = {
        f: (os.path.getsize(f), os.path.getmtime(f))
        for f in glob.glob(f"{path}/k=*/__v*/*.parquet")
    }
    for f, sig in before.items():
        assert after.get(f) == sig, f"MoR merge rewrote a data file: {f}"
    got = m.read_manifested(spark, path)
    assert got.count() == 105
    vals = {r["id"]: r["v"] for r in got.collect()}
    assert all(vals[i] == -1 for i in range(95, 105))
    assert all(vals[i] == i * 10 for i in range(95))
    fs, jvm = m._hadoop_fs(spark, path)
    doc = m._load_doc(fs, jvm, path)
    assert doc.get("operation") == "MERGE"
    assert doc.get("dv") and sum(doc["dv"]["files"].values()) == 5
    # replay with the same txn version: no-op
    assert (
        m.merge_upsert_mor_manifested(
            spark, path, src, ["id"], txn_app="feed", txn_version=1
        )
        == 0
    )
    assert m.read_manifested(spark, path).count() == 105
    # a second MoR merge re-tombstones the previous batch's extras
    src2 = spark.range(100, 102).select(
        "id", (F.col("id") % 4).cast("string").alias("k"),
        F.lit(-2).alias("v"),
    )
    m.merge_upsert_mor_manifested(
        spark, path, src2, ["id"], txn_app="feed", txn_version=2
    )
    got2 = {r["id"]: r["v"] for r in m.read_manifested(spark, path).collect()}
    assert got2[100] == -2 and got2[101] == -2 and got2[104] == -1
    assert len(got2) == 105
    # OPTIMIZE materializes + consolidates; answers unchanged
    m.compact_manifested(spark, path, min_files=1)
    got3 = {r["id"]: r["v"] for r in m.read_manifested(spark, path).collect()}
    assert got3 == got2


def test_merge_mor_emits_cdf_and_refuses_schema_drift(spark, tmp_path):
    import pytest

    import etl_demo_spark.io.manifest as m

    path = str(tmp_path / "t")
    df = spark.range(4).select(
        "id", (F.col("id") % 2).cast("string").alias("k"),
        (F.col("id") * 10).alias("v"),
    )
    m.write_manifested(df, path, "k", change_feed=True)
    src = spark.createDataFrame([(1, "1", 99), (9, "1", 90)],
                                "id BIGINT, k STRING, v BIGINT")
    m.merge_upsert_mor_manifested(spark, path, src, ["id"])
    fs, jvm = m._hadoop_fs(spark, path)
    ch = m._load_raw(fs, jvm, path, 2).get("change_data")
    assert ch and ch.get("rel")
    side = spark.read.parquet(f"{path}/{ch['rel']}")
    rows = {(r["_change_type"], r["id"], r["v"]) for r in side.collect()}
    assert rows == {("delete", 1, 10), ("insert", 1, 99), ("insert", 9, 90)}
    with pytest.raises(ValueError, match="never evolves schema"):
        m.merge_upsert_mor_manifested(
            spark, path,
            src.withColumn("extra_col", F.lit(1)), ["id"],
        )


def test_dv_chunks_accrete_and_fold(spark, tmp_path):
    """DV commits are O(new positions): each DELETE writes one CHUNK
    holding only its own positions (never a rewrite of all deletions so
    far), and the chain folds into one dataset past _DV_CHUNKS_MAX —
    the long-lived CDC feed's per-batch DV cost stays flat."""
    import etl_demo_spark.io.manifest as m

    path = str(tmp_path / "t")
    _seed(spark, path)
    fs, jvm = m._hadoop_fs(spark, path)
    for i in range(m._DV_CHUNKS_MAX):  # 8 single-row deletes
        assert m.delete_rows_manifested(spark, path, F.col("id") == i) == 1
        dv = m._load_doc(fs, jvm, path)["dv"]
        rels = m._dv_rels(dv)
        assert len(rels) == i + 1, "each commit must add exactly one chunk"
        # the newest chunk holds ONLY this commit's position
        newest = spark.read.parquet(f"{path}/{rels[-1]}")
        assert newest.count() == 1
    # the 9th delete trips the fold: one dataset, counts intact
    assert m.delete_rows_manifested(
        spark, path, F.col("id") == m._DV_CHUNKS_MAX
    ) == 1
    dv = m._load_doc(fs, jvm, path)["dv"]
    rels = m._dv_rels(dv)
    assert len(rels) == 1, "chain must fold past _DV_CHUNKS_MAX"
    assert sum(dv["files"].values()) == m._DV_CHUNKS_MAX + 1
    folded = spark.read.parquet(f"{path}/{rels[0]}")
    assert folded.count() == m._DV_CHUNKS_MAX + 1
    got = sorted(r.id for r in m.read_manifested(spark, path).collect())
    assert got == list(range(m._DV_CHUNKS_MAX + 1, 100))
    # a rewrite still materializes everything away
    m.compact_manifested(spark, path, min_files=1)
    doc = m._load_doc(fs, jvm, path)
    assert doc.get("dv") is None or not doc["dv"]["files"]
    assert m.read_manifested(spark, path).count() == 100 - (
        m._DV_CHUNKS_MAX + 1
    )
