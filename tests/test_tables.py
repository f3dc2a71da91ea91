"""Partition-scoped MERGE / SCD2 (io/tables.py): blast-radius and
byte-identity contracts — the partitions a merge does not touch must keep
the exact same files (same names, same bytes, same mtimes)."""

from __future__ import annotations

import hashlib
import os
from pathlib import Path

from pyspark.sql import functions as F


def _file_state(root: str) -> dict[str, tuple[str, float]]:
    """path → (md5, mtime) for every data file under root."""
    out = {}
    for p in Path(root).rglob("*"):
        if p.is_file() and not p.name.startswith((".", "_")):
            out[str(p.relative_to(root))] = (
                hashlib.md5(p.read_bytes()).hexdigest(),
                p.stat().st_mtime,
            )
    return out


def _seed_table(spark, path: str):
    rows = [
        (1, "alpha", "A"),
        (2, "beta", "A"),
        (3, "gamma", "B"),
        (4, "delta", "B"),
        (5, "epsilon", "C"),
        (6, "zeta", "D"),
    ]
    df = spark.createDataFrame(rows, "id INT, name STRING, seg STRING")
    df.write.mode("overwrite").partitionBy("seg").parquet(path)


def test_merge_partitioned_rewrites_only_affected(spark, tmp_path):
    from etl_demo_spark.io.tables import merge_upsert_partitioned

    path = str(tmp_path / "t")
    _seed_table(spark, path)
    before = _file_state(path)

    source = spark.createDataFrame(
        [(1, "ALPHA2", "A"), (99, "new-in-A", "A")], "id INT, name STRING, seg STRING"
    )
    affected = merge_upsert_partitioned(spark, path, source, ["id"], "seg")
    assert sorted(affected) == ["A"]

    after = _file_state(path)
    untouched_before = {k: v for k, v in before.items() if "seg=A" not in k}
    untouched_after = {k: v for k, v in after.items() if "seg=A" not in k}
    assert untouched_before == untouched_after  # names, bytes AND mtimes

    got = {
        r.id: (r.name, r.seg)
        for r in spark.read.parquet(path).collect()
    }
    assert got[1] == ("ALPHA2", "A")
    assert got[99] == ("new-in-A", "A")
    assert got[3] == ("gamma", "B") and len(got) == 7


def test_merge_partitioned_moves_row_and_deletes_emptied_partition(spark, tmp_path):
    from etl_demo_spark.io.tables import merge_upsert_partitioned

    path = str(tmp_path / "t")
    _seed_table(spark, path)
    before = _file_state(path)

    # key 6 is partition D's ONLY row; the update moves it to C — D must
    # end up deleted (dynamic overwrite could never do this), C rewritten
    source = spark.createDataFrame([(6, "zeta-moved", "C")], "id INT, name STRING, seg STRING")
    affected = merge_upsert_partitioned(spark, path, source, ["id"], "seg")
    assert sorted(affected) == ["C", "D"]

    assert not os.path.exists(os.path.join(path, "seg=D"))
    got = {r.id: (r.name, r.seg) for r in spark.read.parquet(path).collect()}
    assert got[6] == ("zeta-moved", "C") and len(got) == 6

    after = _file_state(path)
    for part in ("seg=A", "seg=B"):
        b = {k: v for k, v in before.items() if part in k}
        a = {k: v for k, v in after.items() if part in k}
        assert b == a


def test_merge_partitioned_empty_source_touches_nothing(spark, tmp_path):
    from etl_demo_spark.io.tables import merge_upsert_partitioned

    path = str(tmp_path / "t")
    _seed_table(spark, path)
    before = _file_state(path)
    empty = spark.createDataFrame([], "id INT, name STRING, seg STRING")
    assert merge_upsert_partitioned(spark, path, empty, ["id"], "seg") == []
    assert _file_state(path) == before


def test_merge_partitioned_leftover_staging_is_cleared(spark, tmp_path):
    from etl_demo_spark.io.tables import merge_upsert_partitioned

    path = str(tmp_path / "t")
    _seed_table(spark, path)
    staging = path + ".__merge_staging__"
    os.makedirs(os.path.join(staging, "seg=Z"))  # simulate crashed run
    Path(staging, "seg=Z", "junk.parquet").write_bytes(b"junk")

    source = spark.createDataFrame([(5, "EPS", "C")], "id INT, name STRING, seg STRING")
    merge_upsert_partitioned(spark, path, source, ["id"], "seg")
    assert not os.path.exists(staging)
    got = {r.id: r.name for r in spark.read.parquet(path).collect()}
    assert got[5] == "EPS" and len(got) == 6


def test_scd2_partitioned_closed_files_untouched(spark, tmp_path):
    from etl_demo_spark.io.tables import scd2_apply_partitioned

    path = str(tmp_path / "hist")
    hist = spark.createDataFrame(
        [
            (1, "bronze", 100, None),
            (1, "old", 50, 100),  # already-closed version
            (2, "silver", 100, None),
        ],
        "k INT, tier STRING, valid_from INT, valid_to INT",
    ).withColumn("is_current", F.col("valid_to").isNull())
    hist.write.mode("overwrite").partitionBy("is_current").parquet(path)
    closed_before = {
        k: v for k, v in _file_state(path).items() if "is_current=false" in k
    }

    changes = spark.createDataFrame([(1, "gold", 200)], "k INT, tier STRING, ts INT")
    scd2_apply_partitioned(spark, path, changes, "k", ["tier"])

    after = _file_state(path)
    # the pre-existing closed files are byte-identical (appends added new
    # files alongside; none of the old ones were rewritten)
    for k, v in closed_before.items():
        assert after.get(k) == v

    out = spark.read.parquet(path)
    cur = {r.k: r.tier for r in out.filter("valid_to IS NULL").collect()}
    assert cur == {1: "gold", 2: "silver"}
    closed = sorted(
        (r.k, r.tier, r.valid_to) for r in out.filter("valid_to IS NOT NULL").collect()
    )
    assert closed == [(1, "bronze", 200), (1, "old", 100)]


def test_merge_partitioned_null_partition_rows_survive(spark, tmp_path):
    """NULL partition values: isin() alone evaluates NULL→false for NULL
    rows, so without the explicit isNull branch the whole
    __HIVE_DEFAULT_PARTITION__ slice would be dropped from the merge and
    then deleted by the swap. Unmatched NULL-partition rows must survive,
    matched ones must update."""
    from etl_demo_spark.io.tables import merge_upsert_partitioned

    path = str(tmp_path / "t")
    spark.createDataFrame(
        [(1, "a", "A"), (2, "b", None), (3, "c", None)],
        "id INT, name STRING, seg STRING",
    ).write.partitionBy("seg").parquet(path)

    source = spark.createDataFrame([(2, "B2", None)], "id INT, name STRING, seg STRING")
    affected = merge_upsert_partitioned(spark, path, source, ["id"], "seg")
    assert affected == [None]

    got = {r.id: (r.name, r.seg) for r in spark.read.parquet(path).collect()}
    assert got == {1: ("a", "A"), 2: ("B2", None), 3: ("c", None)}


def test_merge_partitioned_numeric_looking_string_partition(spark, tmp_path):
    """Partition values like '0123' must NOT round-trip through type
    inference (which coerces to 123 and targets a different directory —
    leaving stale rows beside the merged copy). The raw-partition read
    pins the on-disk string form."""
    import os

    from etl_demo_spark.io.tables import merge_upsert_partitioned

    path = str(tmp_path / "t")
    spark.createDataFrame(
        [(1, "a", "0123"), (2, "b", "0456")], "id INT, name STRING, seg STRING"
    ).write.partitionBy("seg").parquet(path)
    assert os.path.isdir(os.path.join(path, "seg=0123"))

    source = spark.createDataFrame([(1, "A2", "0123")], "id INT, name STRING, seg STRING")
    affected = merge_upsert_partitioned(spark, path, source, ["id"], "seg")
    assert affected == ["0123"]

    assert os.path.isdir(os.path.join(path, "seg=0123"))
    assert not os.path.isdir(os.path.join(path, "seg=123"))
    got = {r.id: (r.name, r.seg) for r in spark.read.parquet(path).collect()}
    assert got == {1: ("A2", "0123"), 2: ("b", "0456")} or got == {
        1: ("A2", 123), 2: ("b", 456)
    }  # read-back types depend on inference; the DIRS are what matter
    assert len(got) == 2


def test_merge_partitioned_recovers_crashed_swap(spark, tmp_path):
    """A swap that died between retiring the old partition dir and
    renaming the staged one leaves the only copy in the staging pen; the
    next merge call must restore it before re-applying (no data loss)."""
    import os
    import shutil

    from etl_demo_spark.io.tables import merge_upsert_partitioned

    path = str(tmp_path / "t")
    _seed_table(spark, path)

    # simulate the crash window: partition B retired into the pen,
    # staging still on disk, target missing seg=B
    staging = path + ".__merge_staging__"
    os.makedirs(os.path.join(staging, ".replaced"))
    shutil.move(os.path.join(path, "seg=B"), os.path.join(staging, ".replaced", "seg=B"))
    assert not os.path.exists(os.path.join(path, "seg=B"))

    source = spark.createDataFrame([(5, "EPS2", "C")], "id INT, name STRING, seg STRING")
    affected = merge_upsert_partitioned(spark, path, source, ["id"], "seg")
    assert affected == ["C"]
    assert not os.path.exists(staging)

    got = {r.id: (r.name, r.seg) for r in spark.read.parquet(path).collect()}
    assert got[3] == ("gamma", "B") and got[4] == ("delta", "B")  # restored
    assert got[5] == ("EPS2", "C") and len(got) == 6


def test_recovery_never_resurrects_deliberately_emptied_partition(spark, tmp_path):
    """A partition the merge drained (partition-moving update) is marked
    complete in the staging pen; a crash after the swap loop but before
    the staging delete, followed by a DIFFERENT batch, must not restore
    the drained rows beside their moved copies."""
    import os
    import shutil

    from etl_demo_spark.io.tables import merge_upsert_partitioned

    path = str(tmp_path / "t")
    _seed_table(spark, path)
    # move key 6 out of D (drains D); then simulate the crash window by
    # recreating staging WITH the done-marked pen entry post-swap
    source = spark.createDataFrame([(6, "zeta-moved", "C")], "id INT, name STRING, seg STRING")
    merge_upsert_partitioned(spark, path, source, ["id"], "seg")
    assert not os.path.exists(os.path.join(path, "seg=D"))

    staging = path + ".__merge_staging__"
    os.makedirs(os.path.join(staging, ".replaced", "seg=D.done"))
    with open(os.path.join(staging, ".replaced", "seg=D.done", "part-0.parquet"), "wb") as f:
        f.write(b"stale")

    other = spark.createDataFrame([(1, "ALPHA9", "A")], "id INT, name STRING, seg STRING")
    merge_upsert_partitioned(spark, path, other, ["id"], "seg")
    assert not os.path.exists(os.path.join(path, "seg=D"))  # stayed drained
    got = {r.id: (r.name, r.seg) for r in spark.read.parquet(path).collect()}
    assert got[6] == ("zeta-moved", "C") and got[1] == ("ALPHA9", "A")


# ---------------------------------------------------------------------------
# Multi-level (dt=…/seg=…) partition layouts
# ---------------------------------------------------------------------------


def _seed_two_level(spark, path: str):
    rows = [
        (1, "alpha", "d1", "A"),
        (2, "beta", "d1", "B"),
        (3, "gamma", "d2", "A"),
        (4, "delta", "d2", "B"),
        (5, "epsilon", "d2", "C"),
    ]
    df = spark.createDataFrame(rows, "id INT, name STRING, dt STRING, seg STRING")
    df.write.mode("overwrite").partitionBy("dt", "seg").parquet(path)


def test_merge_two_level_rewrites_only_affected_leaf(spark, tmp_path):
    """dt=…/seg=… layout: the blast radius is the affected LEAF tuple,
    not the whole dt — every other leaf (including siblings under the
    same dt) keeps byte-identical files."""
    from etl_demo_spark.io.tables import merge_upsert_partitioned

    path = str(tmp_path / "t")
    _seed_two_level(spark, path)
    before = _file_state(path)

    source = spark.createDataFrame(
        [(1, "ALPHA2", "d1", "A"), (99, "new", "d1", "A")],
        "id INT, name STRING, dt STRING, seg STRING",
    )
    affected = merge_upsert_partitioned(spark, path, source, ["id"], ["dt", "seg"])
    assert affected == [("d1", "A")]

    after = _file_state(path)
    leaf = os.path.join("dt=d1", "seg=A")
    untouched_before = {k: v for k, v in before.items() if leaf not in k}
    untouched_after = {k: v for k, v in after.items() if leaf not in k}
    assert untouched_before == untouched_after  # names, bytes AND mtimes

    got = {r.id: (r.name, r.dt, r.seg) for r in spark.read.parquet(path).collect()}
    assert got[1] == ("ALPHA2", "d1", "A")
    assert got[99] == ("new", "d1", "A")
    assert got[2] == ("beta", "d1", "B") and len(got) == 6


def test_merge_two_level_moves_row_across_leaves(spark, tmp_path):
    """An update that changes BOTH partition values moves the row across
    leaf dirs; the drained leaf disappears, its dt-sibling is untouched."""
    from etl_demo_spark.io.tables import merge_upsert_partitioned

    path = str(tmp_path / "t")
    _seed_two_level(spark, path)
    before = _file_state(path)

    # key 5 is (d2, C)'s only row; move it to (d1, C) — a brand-new leaf
    source = spark.createDataFrame(
        [(5, "eps-moved", "d1", "C")], "id INT, name STRING, dt STRING, seg STRING"
    )
    affected = merge_upsert_partitioned(spark, path, source, ["id"], ["dt", "seg"])
    assert sorted(affected) == [("d1", "C"), ("d2", "C")]

    assert not os.path.exists(os.path.join(path, "dt=d2", "seg=C"))
    assert os.path.isdir(os.path.join(path, "dt=d1", "seg=C"))
    got = {r.id: (r.name, r.dt, r.seg) for r in spark.read.parquet(path).collect()}
    assert got[5] == ("eps-moved", "d1", "C") and len(got) == 5

    after = _file_state(path)
    for leaf in ("dt=d1/seg=A", "dt=d1/seg=B", "dt=d2/seg=A", "dt=d2/seg=B"):
        key = os.path.join(*leaf.split("/"))
        b = {k: v for k, v in before.items() if key in k}
        a = {k: v for k, v in after.items() if key in k}
        assert b == a, leaf


def test_merge_two_level_recovers_crashed_swap(spark, tmp_path):
    """Depth-2 recovery: a leaf retired into the nested pen with the swap
    unfinished must be restored by the next merge call."""
    import shutil

    from etl_demo_spark.io.tables import merge_upsert_partitioned

    path = str(tmp_path / "t")
    _seed_two_level(spark, path)

    staging = path + ".__merge_staging__"
    os.makedirs(os.path.join(staging, ".replaced", "dt=d2"))
    shutil.move(
        os.path.join(path, "dt=d2", "seg=B"),
        os.path.join(staging, ".replaced", "dt=d2", "seg=B"),
    )
    assert not os.path.exists(os.path.join(path, "dt=d2", "seg=B"))

    source = spark.createDataFrame(
        [(1, "ALPHA3", "d1", "A")], "id INT, name STRING, dt STRING, seg STRING"
    )
    affected = merge_upsert_partitioned(spark, path, source, ["id"], ["dt", "seg"])
    assert affected == [("d1", "A")]
    assert not os.path.exists(staging)

    got = {r.id: (r.name, r.dt, r.seg) for r in spark.read.parquet(path).collect()}
    assert got[4] == ("delta", "d2", "B")  # restored from the pen
    assert got[1] == ("ALPHA3", "d1", "A") and len(got) == 5


def test_merge_two_level_null_and_numeric_leaf_values(spark, tmp_path):
    """NULL in one level and a numeric-looking string in the other: the
    NULL row lands in __HIVE_DEFAULT_PARTITION__ under its dt, and the
    '0123' dt neither collapses to 123 nor strands stale rows."""
    from etl_demo_spark.io.tables import merge_upsert_partitioned

    path = str(tmp_path / "t")
    spark.createDataFrame(
        [(1, "a", "0123", "X"), (2, "b", "0123", None), (3, "c", "7", "X")],
        "id INT, name STRING, dt STRING, seg STRING",
    ).write.partitionBy("dt", "seg").parquet(path)
    assert os.path.isdir(os.path.join(path, "dt=0123", "seg=X"))

    source = spark.createDataFrame(
        [(2, "B2", "0123", None)], "id INT, name STRING, dt STRING, seg STRING"
    )
    affected = merge_upsert_partitioned(spark, path, source, ["id"], ["dt", "seg"])
    assert affected == [("0123", None)]
    assert os.path.isdir(os.path.join(path, "dt=0123", "seg=X"))
    assert not os.path.isdir(os.path.join(path, "dt=123"))

    got = {r.id: r.name for r in spark.read.parquet(path).collect()}
    assert got == {1: "a", 2: "B2", 3: "c"}


def test_scd2_crash_after_append_then_reapply_then_compact(spark, tmp_path, monkeypatch):
    """The documented SCD2 crash anomaly, simulated end-to-end: the
    closure append lands, the current swap dies, and re-applying the SAME
    batch (per the recovery contract) appends the batch's closures a
    second time. scd2_compact must converge the closed partition back to
    exactly-once closures and leave the current slice alone."""
    import pytest

    from etl_demo_spark.io import tables

    path = str(tmp_path / "hist")
    hist = spark.createDataFrame(
        [
            (1, "bronze", 100, None),
            (1, "old", 50, 100),  # pre-existing closed version
            (2, "silver", 100, None),
        ],
        "k INT, tier STRING, valid_from INT, valid_to INT",
    ).withColumn("is_current", F.col("valid_to").isNull())
    hist.write.mode("overwrite").partitionBy("is_current").parquet(path)

    changes = spark.createDataFrame([(1, "gold", 200)], "k INT, tier STRING, ts INT")

    # crash between the closure append and the current swap
    real_swap = tables._swap_partitions

    def dying_swap(*args, **kwargs):
        raise RuntimeError("simulated crash before current swap")

    monkeypatch.setattr(tables, "_swap_partitions", dying_swap)
    with pytest.raises(RuntimeError, match="simulated crash"):
        tables.scd2_apply_partitioned(spark, path, changes, "k", ["tier"])
    monkeypatch.setattr(tables, "_swap_partitions", real_swap)

    # current slice still old (swap never ran), closure already appended
    cur = spark.read.parquet(path).filter("valid_to IS NULL")
    assert {r.tier for r in cur.collect()} == {"bronze", "silver"}

    # recovery contract: re-apply the SAME batch → correct current, but
    # the bronze closure is now appended twice
    tables.scd2_apply_partitioned(spark, path, changes, "k", ["tier"])
    out = spark.read.parquet(path)
    closed = [
        (r.k, r.tier, r.valid_from, r.valid_to)
        for r in out.filter("valid_to IS NOT NULL").collect()
    ]
    assert sorted(closed) == [
        (1, "bronze", 100, 200),
        (1, "bronze", 100, 200),  # the anomaly
        (1, "old", 50, 100),
    ]

    removed = tables.scd2_compact(spark, path, "k")
    assert removed == 1

    out = spark.read.parquet(path)
    closed = sorted(
        (r.k, r.tier, r.valid_from, r.valid_to)
        for r in out.filter("valid_to IS NOT NULL").collect()
    )
    assert closed == [(1, "bronze", 100, 200), (1, "old", 50, 100)]
    cur = {r.k: r.tier for r in out.filter("valid_to IS NULL").collect()}
    assert cur == {1: "gold", 2: "silver"}

    # idempotent: a second compact is a no-op and rewrites nothing
    before = _file_state(path)
    assert tables.scd2_compact(spark, path, "k") == 0
    assert _file_state(path) == before


def test_merge_upsert_schema_evolution_semantics(spark):
    """ops.merge_upsert automerge: source-only columns append (NULL for
    untouched target rows), target-only columns keep the target value on
    match and are NULL for inserts; strict mode refuses drifted schemas."""
    import pytest

    from etl_demo_spark.ops import merge_upsert

    target = spark.createDataFrame(
        [(1, "alpha", 10.0), (2, "beta", 20.0)], "id INT, name STRING, bal DOUBLE"
    )
    # producer added `chan`, stopped sending `name`
    source = spark.createDataFrame(
        [(1, 110.0, "web"), (9, 0.0, "app")], "id INT, bal DOUBLE, chan STRING"
    )
    with pytest.raises(ValueError, match="schema_evolution"):
        merge_upsert(target, source, ["id"])

    got = merge_upsert(target, source, ["id"], schema_evolution=True)
    assert got.columns == ["id", "name", "bal", "chan"]
    rows = {r.id: (r.name, r.bal, r.chan) for r in got.collect()}
    assert rows[1] == ("alpha", 110.0, "web")  # matched: name KEPT, bal/chan from src
    assert rows[2] == ("beta", 20.0, None)     # untouched: new col NULL
    assert rows[9] == (None, 0.0, "app")       # insert: target-only col NULL

    # key must exist on both sides
    with pytest.raises(ValueError, match="key column"):
        merge_upsert(target.drop("id"), source, ["id"], schema_evolution=True)


def test_merge_partitioned_schema_evolution_and_followup(spark, tmp_path):
    """Swap-mode evolution: the widened schema lands in the affected
    partition only; a FOLLOW-UP merge with schema_evolution=True must
    still see the evolved column (mergeSchema sweep) and not drop it."""
    from etl_demo_spark.io.tables import merge_upsert_partitioned

    path = str(tmp_path / "t")
    _seed_table(spark, path)
    before = _file_state(path)

    src1 = spark.createDataFrame(
        [(1, "ALPHA2", "A", "web")], "id INT, name STRING, seg STRING, chan STRING"
    )
    affected = merge_upsert_partitioned(
        spark, path, src1, ["id"], "seg", schema_evolution=True
    )
    assert affected == ["A"]
    untouched = {k: v for k, v in before.items() if "seg=A" not in k}
    assert untouched == {k: v for k, v in _file_state(path).items() if "seg=A" not in k}

    # second merge touches B WITHOUT sending chan: A's chan must survive
    src2 = spark.createDataFrame([(3, "GAMMA2", "B")], "id INT, name STRING, seg STRING")
    affected = merge_upsert_partitioned(
        spark, path, src2, ["id"], "seg", schema_evolution=True
    )
    assert affected == ["B"]

    got = {
        r.id: (r.name, r.seg, r.chan)
        for r in spark.read.option("mergeSchema", "true").parquet(path).collect()
    }
    assert got[1] == ("ALPHA2", "A", "web")
    assert got[3] == ("GAMMA2", "B", None)
    assert got[2] == ("beta", "A", None) and len(got) == 6


def test_delete_keys_partitioned_scoped_and_drains(spark, tmp_path):
    """DELETE-by-key: rewrites only partitions holding a matched key,
    removes a fully-drained partition's directory, returns the blast
    radius; untouched partitions stay byte-identical."""
    from etl_demo_spark.io.tables import delete_keys_partitioned

    path = str(tmp_path / "t")
    _seed_table(spark, path)  # A:{1,2} B:{3,4} C:{5} D:{6}
    before = _file_state(path)

    erase = spark.createDataFrame([(1,), (5,), (77,)], "id INT")
    affected = delete_keys_partitioned(spark, path, erase, ["id"], "seg")
    assert sorted(affected) == ["A", "C"]

    got = {r.id: r.seg for r in spark.read.parquet(path).collect()}
    assert got == {2: "A", 3: "B", 4: "B", 6: "D"}
    # C fully drained → directory gone; B and D byte-identical
    import os

    assert not os.path.isdir(os.path.join(path, "seg=C"))
    untouched = {k: v for k, v in before.items() if "seg=B" in k or "seg=D" in k}
    assert untouched == {
        k: v for k, v in _file_state(path).items() if "seg=B" in k or "seg=D" in k
    }

    # no matched keys → no-op, nothing rewritten
    state = _file_state(path)
    assert delete_keys_partitioned(
        spark, path, spark.createDataFrame([(123,)], "id INT"), ["id"], "seg"
    ) == []
    assert _file_state(path) == state


def test_delete_keys_two_level(spark, tmp_path):
    from etl_demo_spark.io.tables import delete_keys_partitioned

    path = str(tmp_path / "t")
    _seed_two_level(spark, path)
    erase = spark.createDataFrame([(1,)], "id INT")
    affected = delete_keys_partitioned(spark, path, erase, ["id"], ["dt", "seg"])
    assert len(affected) == 1 and isinstance(affected[0], tuple)
    assert 1 not in {r.id for r in spark.read.parquet(path).collect()}


def test_update_where_partitioned_moves_and_drains(spark, tmp_path):
    """UPDATE setting the partition column: matched rows move to the
    destination directory, the drained source partition disappears,
    untouched partitions stay byte-identical, non-matched rows in the
    destination partition are preserved unmodified."""
    import os

    from etl_demo_spark.io.tables import update_where_partitioned

    path = str(tmp_path / "t")
    _seed_table(spark, path)  # A:{1,2} B:{3,4} C:{5} D:{6}
    before = _file_state(path)

    affected = update_where_partitioned(
        spark,
        path,
        {"name": F.upper(F.col("name")), "seg": F.lit("B")},
        F.col("seg") == "C",
        "seg",
    )
    assert sorted(affected) == ["B", "C"]

    got = {r.id: (r.name, r.seg) for r in spark.read.parquet(path).collect()}
    assert got[5] == ("EPSILON", "B")  # moved + transformed
    assert got[3] == ("gamma", "B") and got[4] == ("delta", "B")  # preserved
    assert not os.path.isdir(os.path.join(path, "seg=C"))  # drained
    untouched = {k: v for k, v in before.items() if "seg=A" in k or "seg=D" in k}
    assert untouched == {
        k: v for k, v in _file_state(path).items() if "seg=A" in k or "seg=D" in k
    }


def test_update_where_partitioned_non_partition_assignment(spark, tmp_path):
    from etl_demo_spark.io.tables import update_where_partitioned

    path = str(tmp_path / "t")
    _seed_table(spark, path)
    before = _file_state(path)
    affected = update_where_partitioned(
        spark, path, {"name": F.lit("X")}, F.col("id") == 3, "seg"
    )
    assert affected == ["B"]
    got = {r.id: r.name for r in spark.read.parquet(path).collect()}
    assert got[3] == "X" and got[4] == "delta" and got[1] == "alpha"
    untouched = {k: v for k, v in before.items() if "seg=B" not in k}
    assert untouched == {
        k: v for k, v in _file_state(path).items() if "seg=B" not in k
    }

    # unknown assigned column refuses loudly; nothing matched is a no-op
    import pytest

    with pytest.raises(ValueError, match="cannot add columns"):
        update_where_partitioned(
            spark, path, {"nope": F.lit(1)}, F.col("id") == 1, "seg"
        )
    state = _file_state(path)
    assert update_where_partitioned(
        spark, path, {"name": F.lit("Y")}, F.col("id") == 999, "seg"
    ) == []
    assert _file_state(path) == state


def test_delete_where_partitioned(spark, tmp_path):
    """Predicate DELETE: only partitions holding a matching row rewrite,
    NULL-predicate rows are kept (SQL DELETE semantics), a pure
    partition-column predicate drops whole directories."""
    import os

    from etl_demo_spark.io.tables import delete_where_partitioned

    path = str(tmp_path / "t")
    rows = [
        (1, "alpha", "A"), (2, None, "A"), (3, "gamma", "B"),
        (4, "delta", "B"), (5, "epsilon", "C"),
    ]
    spark.createDataFrame(rows, "id INT, name STRING, seg STRING").write.partitionBy(
        "seg"
    ).parquet(path)
    before = _file_state(path)

    # row-level predicate: name starts with 'a' → only id 1 (A); the
    # NULL name in A must survive (predicate evaluates NULL, not TRUE)
    affected = delete_where_partitioned(
        spark, path, F.col("name").startswith("a"), "seg"
    )
    assert affected == ["A"]
    got = {r.id for r in spark.read.parquet(path).collect()}
    assert got == {2, 3, 4, 5}
    untouched = {k: v for k, v in before.items() if "seg=A" not in k}
    assert untouched == {k: v for k, v in _file_state(path).items() if "seg=A" not in k}

    # partition-column predicate: drop segment C wholesale
    affected = delete_where_partitioned(spark, path, F.col("seg") == "C", "seg")
    assert affected == ["C"]
    assert not os.path.isdir(os.path.join(path, "seg=C"))
    assert {r.id for r in spark.read.parquet(path).collect()} == {2, 3, 4}
