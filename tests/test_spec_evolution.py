"""Metadata-only partition-spec evolution (io/manifest.py
alter_partition_spec).

Contract under test: evolving a pure-transform table's spec touches no
data byte; appends after the evolution land under the new layout; reads
scan both generations transparently; prune_source prunes each leaf
under ITS OWN generation's transforms; time travel to pre-evolution
versions resolves the old single-spec doc; leaf rewrites on a mixed
table are refused until a repartition consolidates (which clears the
history)."""

from __future__ import annotations

import datetime
import glob
import os

import pytest
from pyspark.sql import functions as F

import etl_demo_spark.io.manifest as m


def _events(spark, lo, hi, n_users=8):
    rows = [
        (
            i,
            datetime.datetime(2024, 1, 1) + datetime.timedelta(hours=6 * i),
            i % n_users,
            float(i),
        )
        for i in range(lo, hi)
    ]
    return spark.createDataFrame(
        rows, "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, value DOUBLE"
    )


@pytest.fixture()
def evolved(spark, tmp_path):
    root = str(tmp_path / "ev")
    m.write_manifested(
        _events(spark, 0, 40), root, partition_transforms={"p_day": "days(ts)"}
    )  # v1: daily spec
    pre_files = {
        f: os.stat(f).st_mtime_ns for f in glob.glob(f"{root}/p_day=*/__v*/*")
    }
    assert pre_files
    v = m.alter_partition_spec(
        spark,
        root,
        {"p_month": "months(ts)", "p_b": "bucket(4, user_id)"},
    )  # v2: metadata only
    m.append_manifested(spark, root, _events(spark, 40, 80))  # v3: new layout
    return root, pre_files, v


def test_evolution_is_metadata_only_and_reads_both_generations(
    spark, evolved
):
    root, pre_files, v = evolved
    # rewrite-free: every pre-evolution byte untouched
    after = {
        f: os.stat(f).st_mtime_ns for f in glob.glob(f"{root}/p_day=*/__v*/*")
    }
    assert after == pre_files, "evolution must not touch existing data"
    # new appends landed under the NEW layout
    assert glob.glob(f"{root}/p_month=*/p_b=*/__v*/*.parquet")
    # one read spans both generations, values intact
    got = m.read_manifested(spark, root)
    assert got.count() == 80
    assert got.agg(F.sum("event_id")).first()[0] == sum(range(80))
    # every generation's derived columns surface, RE-DERIVED from the
    # source columns — exact for old and new rows alike
    assert {"p_day", "p_month", "p_b"} <= set(got.columns)
    assert (
        got.filter(
            (F.col("p_day") != F.date_format("ts", "yyyy-MM-dd"))
            | (F.col("p_month") != F.date_format("ts", "yyyy-MM"))
            | F.col("p_day").isNull()
        ).count()
        == 0
    )


def test_prune_source_prunes_each_generation_under_its_own_spec(
    spark, evolved
):
    root, _, _ = evolved
    full = m.read_manifested(spark, root)
    n_leaves_full = len(
        {p.rsplit("/", 2)[0] for p in full.inputFiles()}
    )
    lo = datetime.datetime(2024, 1, 3)
    hi = datetime.datetime(2024, 1, 5, 23, 0, 0)
    pruned = m.read_manifested(spark, root, prune_source={"ts": (lo, hi)})
    n_leaves_pruned = len(
        {p.rsplit("/", 2)[0] for p in pruned.inputFiles()}
    )
    assert 0 < n_leaves_pruned < n_leaves_full
    # completeness: the pruned scan + real predicate == the full answer
    pred = (F.col("ts") >= F.lit(lo)) & (F.col("ts") <= F.lit(hi))
    assert (
        pruned.filter(pred).count() == full.filter(pred).count() > 0
    )
    # a source only the NEW spec transforms prunes new-generation
    # leaves and keeps every old-generation leaf (completeness)
    by_user = m.read_manifested(spark, root, prune_source={"user_id": 3})
    assert (
        by_user.filter(F.col("user_id") == 3).count()
        == full.filter(F.col("user_id") == 3).count()
    )
    with pytest.raises(ValueError, match="no partition transform"):
        m.read_manifested(spark, root, prune_source={"value": (0, 1)})


def test_time_travel_across_the_evolution_boundary(spark, tmp_path):
    root = str(tmp_path / "tt")
    m.write_manifested(
        _events(spark, 0, 40), root, partition_transforms={"p_day": "days(ts)"}
    )  # v1
    m.alter_partition_spec(spark, root, {"p_month": "months(ts)"})  # v2
    # pre-evolution version still reads through the OLD single-spec doc
    old = m.read_manifested(spark, root, version=1)
    assert old.count() == 40
    assert "p_month" not in old.columns
    mid = m.read_manifested(spark, root, version=2)
    assert mid.count() == 40  # ALTER SPEC moved no rows
    assert "p_month" in mid.columns
    fs, jvm = m._hadoop_fs(spark, root)
    assert m._resolve_doc(fs, jvm, root, 2).get("operation") == "ALTER SPEC"
    m.append_manifested(spark, root, _events(spark, 40, 80))  # v3
    assert m.read_manifested(spark, root, version=2).count() == 40
    assert m.read_manifested(spark, root).count() == 80


def test_rewrites_refused_until_repartition_consolidates(spark, evolved):
    root, _, _ = evolved
    # DML in an OLD generation's columns has no current leaf layout to
    # stage into — refused loudly (current-spec DML is leaf-scoped, see
    # test_mixed_generation_* below)
    with pytest.raises(ValueError, match="CURRENT spec"):
        m.delete_where_manifested(spark, root, F.col("event_id") < 5, ["p_day"])
    with pytest.raises(ValueError, match="CURRENT spec"):
        m.merge_upsert_manifested(
            spark,
            root,
            _events(spark, 0, 1),
            ["event_id"],
            ["p_day"],
        )
    # consolidation escape hatch: rewrite to a classic layout clears
    # the evolution history and re-enables every committer
    m.repartition_manifested(spark, root, ["user_id"])
    fs, jvm = m._hadoop_fs(spark, root)
    doc = m._load_doc(fs, jvm, root)
    assert doc.get("partition_specs") is None
    assert doc.get("partition_transforms") is None
    assert m.read_manifested(spark, root).count() == 80
    m.delete_where_manifested(spark, root, F.col("event_id") < 5, ["user_id"])
    assert m.read_manifested(spark, root).count() == 75


def test_alter_spec_validation(spark, tmp_path):
    root = str(tmp_path / "classic")
    df = spark.createDataFrame(
        [(1, "a", 1.0)], "id BIGINT, part STRING, val DOUBLE"
    )
    m.write_manifested(df, root, "part")
    with pytest.raises(ValueError, match="classic partition"):
        m.alter_partition_spec(spark, root, {"p_b": "bucket(4, id)"})


def _old_leaf_files(root):
    return {
        f: os.stat(f).st_mtime_ns for f in glob.glob(f"{root}/p_day=*/__v*/*")
    }


def test_mixed_generation_merge_is_leaf_scoped(spark, evolved):
    """Round-10 contract: MERGE on a mixed-generation table rewrites
    only the TOUCHED leaves — the touched old-generation leaf is
    re-keyed whole into the current spec, untouched old-generation
    leaves stay byte-identical, and both generations keep pruning."""
    root, _, _ = evolved
    pre = _old_leaf_files(root)
    # events 4..7 live in old leaf p_day=2024-01-02 (hours 24..42);
    # event 50 lives in a new-generation leaf; 200 is a brand-new insert
    src = spark.createDataFrame(
        [
            (5, datetime.datetime(2024, 1, 2, 6), 5, 999.0),
            (50, datetime.datetime(2024, 1, 13, 12), 2, 888.0),
            (200, datetime.datetime(2024, 2, 1), 1, 777.0),
        ],
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, value DOUBLE",
    )
    m.merge_upsert_manifested(
        spark, root, src, ["event_id"], ["p_month", "p_b"]
    )
    got = m.read_manifested(spark, root)
    assert got.count() == 81
    vals = {
        r["event_id"]: r["value"]
        for r in got.filter(F.col("event_id").isin(5, 50, 200)).collect()
    }
    assert vals == {5: 999.0, 50: 888.0, 200: 777.0}
    # full-table integrity: no row lost or duplicated by the re-key
    assert got.agg(F.sum("event_id")).first()[0] == sum(range(80)) + 200
    assert got.select("event_id").distinct().count() == 81

    # the touched old leaf dropped from the snapshot (its rows re-keyed
    # into the current layout); every OTHER old-generation leaf is
    # byte-identical
    after = _old_leaf_files(root)
    touched_leaf = f"{root}/p_day=2024-01-02"
    for f, sig in pre.items():
        if not f.startswith(touched_leaf):
            assert after.get(f) == sig, f"untouched old leaf churned: {f}"
    fs, jvm = m._hadoop_fs(spark, root)
    doc = m._load_doc(fs, jvm, root)
    assert "p_day=2024-01-02" not in doc["partitions"]
    assert "p_day=2024-01-02" not in (doc.get("leaf_spec") or {})
    assert doc.get("partition_specs"), "spec history survives the DML"
    # re-keyed rows (events 4,6,7) still read back exactly, with their
    # old derived column re-derived
    rekeyed = got.filter(F.col("event_id").isin(4, 6, 7)).collect()
    assert {r["event_id"] for r in rekeyed} == {4, 6, 7}
    assert all(str(r["p_day"]) == "2024-01-02" for r in rekeyed)

    # both generations still prune under their own spec
    full = m.read_manifested(spark, root)
    lo, hi = datetime.datetime(2024, 1, 5), datetime.datetime(2024, 1, 6, 23)
    pruned = m.read_manifested(spark, root, prune_source={"ts": (lo, hi)})
    assert len(pruned.inputFiles()) < len(full.inputFiles())
    pred = (F.col("ts") >= F.lit(lo)) & (F.col("ts") <= F.lit(hi))
    assert pruned.filter(pred).count() == full.filter(pred).count() > 0


def test_mixed_generation_delete_where(spark, evolved):
    root, _, _ = evolved
    pre = _old_leaf_files(root)
    # event 10 (hour 60 -> Jan 3) in an old leaf; event 60 in a new one
    m.delete_where_manifested(
        spark, root, F.col("event_id").isin(10, 60), ["p_month", "p_b"]
    )
    got = m.read_manifested(spark, root)
    assert got.count() == 78
    assert got.filter(F.col("event_id").isin(10, 60)).count() == 0
    # the old leaf's surviving rows (8, 9, 11) were re-keyed, not lost
    assert got.filter(F.col("event_id").isin(8, 9, 11)).count() == 3
    after = _old_leaf_files(root)
    touched_leaf = f"{root}/p_day=2024-01-03"
    for f, sig in pre.items():
        if not f.startswith(touched_leaf):
            assert after.get(f) == sig, f"untouched old leaf churned: {f}"
    fs, jvm = m._hadoop_fs(spark, root)
    assert "p_day=2024-01-03" not in m._load_doc(fs, jvm, root)["partitions"]


def test_mixed_generation_update_where(spark, evolved):
    root, _, _ = evolved
    pre = _old_leaf_files(root)
    # predicate spans generations: one old-gen row (20 -> Jan 6) and
    # one new-gen row (70)
    m.update_where_manifested(
        spark, root,
        {"value": F.col("value") + 1000.0},
        F.col("event_id").isin(20, 70),
        ["p_month", "p_b"],
    )
    got = m.read_manifested(spark, root)
    assert got.count() == 80
    vals = {
        r["event_id"]: r["value"]
        for r in got.filter(F.col("event_id").isin(20, 70)).collect()
    }
    assert vals == {20: 1020.0, 70: 1070.0}
    after = _old_leaf_files(root)
    touched_leaf = f"{root}/p_day=2024-01-06"
    for f, sig in pre.items():
        if not f.startswith(touched_leaf):
            assert after.get(f) == sig, f"untouched old leaf churned: {f}"


def test_mixed_generation_merge_emits_cdf(spark, tmp_path):
    """CDF on a mixed-generation MERGE: preimage deletes come from the
    old-generation leaf, postimage inserts carry the merged rows."""
    root = str(tmp_path / "cdf")
    m.write_manifested(
        _events(spark, 0, 8), root,
        partition_transforms={"p_day": "days(ts)"}, change_feed=True,
    )  # v1
    m.alter_partition_spec(spark, root, {"p_month": "months(ts)"})  # v2
    src = spark.createDataFrame(
        [(5, datetime.datetime(2024, 1, 2, 6), 5, 999.0)],
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, value DOUBLE",
    )
    m.merge_upsert_manifested(spark, root, src, ["event_id"], ["p_month"])  # v3
    ch = m.read_changes(spark, root, 2, 3)
    by_type = {
        (r["_change_type"], r["event_id"]): r["value"] for r in ch.collect()
    }
    assert by_type == {("delete", 5): 5.0, ("insert", 5): 999.0}, by_type
    assert m.read_manifested(spark, root).count() == 8

def test_mixed_generation_compact_skips_old_leaves_without_duplication(
    spark, tmp_path
):
    """OPTIMIZE on a mixed table compacts the qualifying CURRENT-spec
    leaves without pulling rows out of old-generation leaves (a naive
    value-filter would duplicate them: every generation's derived
    columns re-derive on all rows)."""
    root = str(tmp_path / "mixc")
    # single-file old leaves (repartition(1) -> one task per write)
    m.write_manifested(
        _events(spark, 0, 40).repartition(1), root,
        partition_transforms={"p_day": "days(ts)"},
    )
    m.alter_partition_spec(
        spark, root, {"p_month": "months(ts)", "p_b": "bucket(4, user_id)"}
    )
    # two appends -> current-gen leaves accrete 2 files each
    m.append_manifested(spark, root, _events(spark, 40, 80).repartition(1))
    m.append_manifested(spark, root, _events(spark, 80, 88).repartition(1))
    pre = _old_leaf_files(root)
    compacted = m.compact_manifested(spark, root, min_files=2)
    assert compacted and all(r.startswith("p_month=") for r in compacted)
    got = m.read_manifested(spark, root)
    assert got.count() == 88
    assert got.select("event_id").distinct().count() == 88
    assert got.agg(F.sum("event_id")).first()[0] == sum(range(88))
    assert _old_leaf_files(root) == pre, "old-generation leaves churned"


def test_mixed_generation_compact_migrates_old_leaves_to_current_spec(
    spark, evolved
):
    """min_files=1 compacts every leaf: old-generation leaves are
    re-keyed whole into the current spec — OPTIMIZE doubles as
    progressive migration, converging the table without a dedicated
    full-table rewrite."""
    root, _, _ = evolved
    compacted = m.compact_manifested(spark, root, min_files=1)
    assert any(r.startswith("p_day=") for r in compacted)
    fs, jvm = m._hadoop_fs(spark, root)
    doc = m._load_doc(fs, jvm, root)
    assert not any(r.startswith("p_day=") for r in doc["partitions"])
    assert not doc.get("leaf_spec"), "all leaves on the current spec now"
    assert doc.get("partition_specs"), "history survives (schema keeps p_day)"
    got = m.read_manifested(spark, root)
    assert got.count() == 80
    assert got.agg(F.sum("event_id")).first()[0] == sum(range(80))
    # the old generation's derived column still re-derives
    assert got.filter(F.col("p_day").isNull()).count() == 0
    # source-column pruning still works after full migration
    pruned = m.read_manifested(
        spark, root, prune_source={"user_id": 3}
    )
    assert (
        pruned.filter(F.col("user_id") == 3).count()
        == got.filter(F.col("user_id") == 3).count()
        > 0
    )


def test_mixed_generation_delete_keys_erasure(spark, evolved):
    """Right-to-erasure on a mixed table: old-generation leaves holding
    a matched key are rewritten whole into the current spec; untouched
    old leaves stay byte-identical."""
    root, _, _ = evolved
    pre = _old_leaf_files(root)
    # event 14 (hour 84 -> Jan 4) in an old leaf; event 55 in a new one
    keys = spark.createDataFrame([(14,), (55,)], "event_id BIGINT")
    m.delete_keys_manifested(
        spark, root, keys, ["event_id"], ["p_month", "p_b"]
    )
    got = m.read_manifested(spark, root)
    assert got.count() == 78
    assert got.filter(F.col("event_id").isin(14, 55)).count() == 0
    # survivors of the touched old leaf (12, 13, 15) re-keyed, not lost
    assert got.filter(F.col("event_id").isin(12, 13, 15)).count() == 3
    after = _old_leaf_files(root)
    touched_leaf = f"{root}/p_day=2024-01-04"
    for f, sig in pre.items():
        if not f.startswith(touched_leaf):
            assert after.get(f) == sig, f"untouched old leaf churned: {f}"
    fs, jvm = m._hadoop_fs(spark, root)
    assert "p_day=2024-01-04" not in m._load_doc(fs, jvm, root)["partitions"]


def test_mixed_generation_dv_delete_is_positional(spark, evolved):
    """Deletion vectors never rewrite a leaf, so they work unchanged on
    a mixed-generation table — including predicates on derived columns
    of EITHER generation — and compaction later materializes them."""
    root, pre_files, _ = evolved
    n = m.delete_rows_manifested(
        spark, root, F.col("event_id").isin(3, 44)
    )
    assert n == 2
    got = m.read_manifested(spark, root)
    assert got.count() == 78
    assert got.filter(F.col("event_id").isin(3, 44)).count() == 0
    # zero data bytes moved: every old-generation file untouched
    assert _old_leaf_files(root) == pre_files
    # a predicate on an OLD generation's derived column matches rows
    # re-derived across the whole table
    n2 = m.delete_rows_manifested(
        spark, root, F.col("p_day") == "2024-01-08"
    )
    assert n2 == 4  # events 28..31
    assert m.read_manifested(spark, root).count() == 74
    # compaction (migration pass) materializes the DVs
    m.compact_manifested(spark, root, min_files=1)
    fs, jvm = m._hadoop_fs(spark, root)
    doc = m._load_doc(fs, jvm, root)
    assert m.read_manifested(spark, root).count() == 74
    assert not any(r.startswith("p_day=") for r in doc["partitions"])


def test_mixed_generation_mor_update_is_positional(spark, evolved):
    """Merge-on-read UPDATE on a mixed table: old-generation positions
    tombstone into the DV, postimages append under the CURRENT spec —
    zero pre-existing bytes move on either generation."""
    root, pre_files, _ = evolved
    n = m.update_rows_manifested(
        spark, root, {"value": F.col("value") + 500.0},
        F.col("event_id").isin(6, 66),  # one old-gen row, one new-gen
    )
    assert n == 2
    assert _old_leaf_files(root) == pre_files, "old generation churned"
    got = m.read_manifested(spark, root)
    assert got.count() == 80
    vals = {
        r["event_id"]: r["value"]
        for r in got.filter(F.col("event_id").isin(6, 66)).collect()
    }
    assert vals == {6: 506.0, 66: 566.0}
    # the postimages landed under the CURRENT spec (month/bucket leaves)
    fs, jvm = m._hadoop_fs(spark, root)
    doc = m._load_doc(fs, jvm, root)
    new_extras = {
        r for r, vs in (doc.get("extra_vrels") or {}).items() if vs
    }
    assert new_extras and all(r.startswith("p_month=") for r in new_extras)
    # derived columns of BOTH generations still re-derive on the moved rows
    row6 = got.filter("event_id = 6").collect()[0]
    assert str(row6["p_day"]) == "2024-01-02"
