"""Multi-table catalog (io/catalog.py): atomic cross-table visibility,
consistent snapshots under concurrent DML, CAS races, crash-before-
publish invisibility, and cross-table time travel."""

from __future__ import annotations

import threading

import pytest
from pyspark.sql import functions as F

from etl_demo_spark.io.catalog import (
    CatalogConflict,
    catalog_commit,
    catalog_init,
    catalog_snapshot,
    catalog_versions,
)
from etl_demo_spark.io.manifest import (
    delete_where_manifested,
    merge_upsert_manifested,
    write_manifested,
)


def _mk(spark, tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    cat = str(tmp_path / "cat")
    spark.createDataFrame(
        [(1, 100, "p"), (2, 200, "p")], "id INT, amt INT, part STRING"
    ).transform(lambda df: (write_manifested(df, a, "part"), df)[1])
    write_manifested(
        spark.createDataFrame([(9, 0, "p")], "id INT, amt INT, part STRING"),
        b,
        "part",
    )
    assert catalog_init(spark, cat, {"a": a, "b": b}) == 1
    return a, b, cat


def _totals(snap):
    ta = snap.read("a").agg(F.sum("amt")).first()[0] or 0
    tb = snap.read("b").agg(F.sum("amt")).first()[0] or 0
    return ta, tb


def test_transfer_is_atomic_through_the_catalog(spark, tmp_path):
    """Move amt=100 from table a to table b via two per-table commits +
    one catalog flip: a snapshot taken before the flip keeps the old
    consistent state EVEN AFTER the table commits land; after the flip a
    new snapshot sees both sides moved. Total is conserved in every
    catalog-visible state."""
    a, b, cat = _mk(spark, tmp_path)
    before = catalog_snapshot(spark, cat)
    assert _totals(before) == (300, 0)

    from etl_demo_spark.io.manifest import manifest_versions

    delete_where_manifested(spark, a, F.col("id") == 1, "part")
    va = manifest_versions(spark, a)[-1]
    src = spark.createDataFrame([(10, 100, "p")], "id INT, amt INT, part STRING")
    merge_upsert_manifested(spark, b, src, ["id"], "part")
    vb = manifest_versions(spark, b)[-1]
    # table commits are durable but the catalog still serves the old pins
    assert _totals(before) == (300, 0)
    assert _totals(catalog_snapshot(spark, cat)) == (300, 0)

    v = catalog_commit(spark, cat, {"a": va, "b": vb})
    assert v == 2
    after = catalog_snapshot(spark, cat)
    assert _totals(after) == (200, 100)
    assert sum(_totals(after)) == sum(_totals(before)) == 300
    # the pre-flip snapshot object still reads the old consistent state
    assert _totals(before) == (300, 0)


def test_crash_before_catalog_publish_leaves_old_view(spark, tmp_path):
    """A writer that commits its tables and dies before catalog_commit
    leaves readers on the previous pins — consistent, never torn."""
    a, b, cat = _mk(spark, tmp_path)
    delete_where_manifested(spark, a, F.col("id") == 1, "part")
    # (no catalog_commit — the crash)
    assert _totals(catalog_snapshot(spark, cat)) == (300, 0)
    # recovery: the next writer pins whatever it commits; the orphaned
    # table version stays reachable by table-level time travel only
    assert catalog_versions(spark, cat) == [1]


def test_cross_table_time_travel(spark, tmp_path):
    a, b, cat = _mk(spark, tmp_path)
    from etl_demo_spark.io.manifest import manifest_versions

    delete_where_manifested(spark, a, F.col("id") == 1, "part")
    va = manifest_versions(spark, a)[-1]
    catalog_commit(spark, cat, {"a": va})
    old = catalog_snapshot(spark, cat, version=1)
    new = catalog_snapshot(spark, cat)
    assert _totals(old) == (300, 0) and _totals(new) == (200, 0)
    assert old.pins()["b"] == new.pins()["b"]  # untouched table carries


def test_concurrent_disjoint_committers_both_land(spark, tmp_path):
    """Two writers updating DISJOINT tables race the catalog CAS; the
    loser re-merges onto the winner's pins, so BOTH updates are visible
    at the final head."""
    a, b, cat = _mk(spark, tmp_path)
    from etl_demo_spark.io.manifest import manifest_versions

    delete_where_manifested(spark, a, F.col("id") == 1, "part")
    va = manifest_versions(spark, a)[-1]
    src = spark.createDataFrame([(10, 50, "p")], "id INT, amt INT, part STRING")
    merge_upsert_manifested(spark, b, src, ["id"], "part")
    vb = manifest_versions(spark, b)[-1]

    errs = []

    def commit(pins):
        try:
            catalog_commit(spark, cat, pins)
        except Exception as e:  # pragma: no cover
            errs.append(e)

    t1 = threading.Thread(target=commit, args=({"a": va},))
    t2 = threading.Thread(target=commit, args=({"b": vb},))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errs
    head = catalog_snapshot(spark, cat)
    assert head.version == 3
    assert head.pins() == {"a": va, "b": vb}
    assert _totals(head) == (200, 50)


def test_validation_and_conflict_paths(spark, tmp_path):
    a, b, cat = _mk(spark, tmp_path)
    with pytest.raises(ValueError, match="not catalog members"):
        catalog_commit(spark, cat, {"ghost": 2})
    with pytest.raises(ValueError, match="no table"):
        catalog_snapshot(spark, cat).read("ghost")
    with pytest.raises(ValueError, match="not available"):
        catalog_snapshot(spark, cat, version=99)
    with pytest.raises(ValueError, match="not a catalog"):
        catalog_snapshot(spark, str(tmp_path / "nope"))
    # idempotent re-init returns the existing head
    assert catalog_init(spark, cat, {"a": a, "b": b}) == 1
    assert isinstance(CatalogConflict("x"), RuntimeError)


def test_pinned_version_survives_dml_until_retention(spark, tmp_path):
    """Repeatable read within the retention window: a snapshot keeps
    serving its pinned versions across one later commit; once a second
    commit pushes the pin past the table's 2-version retention, the
    read fails with the CLEAR pin-expired error, not a raw scan error."""
    a, b, cat = _mk(spark, tmp_path)
    from etl_demo_spark.io.manifest import manifest_versions

    snap = catalog_snapshot(spark, cat)
    src = spark.createDataFrame([(20, 10, "p")], "id INT, amt INT, part STRING")
    merge_upsert_manifested(spark, a, src, ["id"], "part")
    catalog_commit(spark, cat, {"a": manifest_versions(spark, a)[-1]})
    assert _totals(snap) == (300, 0)          # pin still retained
    assert _totals(catalog_snapshot(spark, cat)) == (310, 0)

    src2 = spark.createDataFrame([(21, 10, "p")], "id INT, amt INT, part STRING")
    merge_upsert_manifested(spark, a, src2, ["id"], "part")
    catalog_commit(spark, cat, {"a": manifest_versions(spark, a)[-1]})
    with pytest.raises(ValueError, match="retention window"):
        snap.read("a")
    assert _totals(catalog_snapshot(spark, cat)) == (320, 0)
    assert catalog_versions(spark, cat) == [1, 2, 3]


def test_catalog_as_of_timestamp(spark, tmp_path):
    """Cross-table AS OF TIMESTAMP: the newest catalog version committed
    at-or-before the asked instant wins; before-the-beginning raises;
    version= and as_of_ms= are mutually exclusive."""
    import time

    a, b, cat = _mk(spark, tmp_path)
    from etl_demo_spark.io.manifest import manifest_versions

    t_before = int(time.time() * 1000)
    time.sleep(0.05)
    delete_where_manifested(spark, a, F.col("id") == 1, "part")
    catalog_commit(spark, cat, {"a": manifest_versions(spark, a)[-1]})

    old = catalog_snapshot(spark, cat, as_of_ms=t_before)
    assert old.version == 1 and _totals(old) == (300, 0)
    now = catalog_snapshot(spark, cat, as_of_ms=int(time.time() * 1000))
    assert now.version == 2 and _totals(now) == (200, 0)
    with pytest.raises(ValueError, match="at or before"):
        catalog_snapshot(spark, cat, as_of_ms=1)
    with pytest.raises(ValueError, match="exclusive"):
        catalog_snapshot(spark, cat, version=1, as_of_ms=t_before)


def test_register_catalog_sql_views_are_pinned(spark, tmp_path):
    """register_catalog exposes every member table as a temp view under
    one consistent pin: a cross-table SQL join sees the snapshot state;
    later DML + catalog commits don't move the views until re-register."""
    from etl_demo_spark.io.catalog import register_catalog
    from etl_demo_spark.io.manifest import manifest_versions

    a, b, cat = _mk(spark, tmp_path)
    snap = register_catalog(spark, cat, prefix="cx_")
    tot = spark.sql(
        "SELECT (SELECT SUM(amt) FROM cx_a) + (SELECT SUM(amt) FROM cx_b) AS t"
    ).first()["t"]
    assert tot == 300 and snap.version == 1

    delete_where_manifested(spark, a, F.col("id") == 1, "part")
    catalog_commit(spark, cat, {"a": manifest_versions(spark, a)[-1]})
    # views still serve the registered pin
    assert spark.sql("SELECT SUM(amt) AS s FROM cx_a").first()["s"] == 300
    snap2 = register_catalog(spark, cat, prefix="cx_")
    assert snap2.version == 2
    assert spark.sql("SELECT SUM(amt) AS s FROM cx_a").first()["s"] == 200


def test_catalog_history_surface(spark, tmp_path):
    """Cross-table DESCRIBE HISTORY: one row per (catalog version,
    table) with the pinned table version; `changed` marks which table
    each catalog commit moved (v1 rows all count as changed — first
    pin)."""
    from etl_demo_spark.io.catalog import catalog_history
    from etl_demo_spark.io.manifest import manifest_versions

    a, b, cat = _mk(spark, tmp_path)
    delete_where_manifested(spark, a, F.col("id") == 1, "part")
    catalog_commit(spark, cat, {"a": manifest_versions(spark, a)[-1]})

    h = catalog_history(spark, cat).collect()
    assert {(r["catalog_version"], r["table"]) for r in h} == {
        (1, "a"), (1, "b"), (2, "a"), (2, "b"),
    }
    by = {(r["catalog_version"], r["table"]): r for r in h}
    assert by[(2, "a")]["changed"] and not by[(2, "b")]["changed"]
    assert by[(2, "a")]["table_version"] == 2
    assert by[(2, "b")]["table_version"] == by[(1, "b")]["table_version"]
    assert all(r["committed_at"] is not None for r in h)
