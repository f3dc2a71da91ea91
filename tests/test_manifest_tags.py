"""Snapshot TAGS (Iceberg-style named refs) on the manifest layer.

Contract under test: a tag pins a snapshot under a stable name; tagged
snapshots survive retention GC (data, manifests, ancestors) until the
tag is deleted; `read_manifested(tag=…)` reads the pinned bytes; tags
travel atomically through the delta chain and full-snapshot boundaries
alongside every other commit kind."""

from __future__ import annotations

import glob
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from etl_demo_spark.io.manifest import (
    list_tags,
    merge_upsert_manifested,
    read_manifested,
    tag_create,
    tag_delete,
    write_manifested,
)


@pytest.fixture(scope="module")
def tag_root():
    root = tempfile.mkdtemp(prefix="manifest_tags_")
    yield root
    shutil.rmtree(root, ignore_errors=True)


def _rows(spark, ids, part="a", val=1.0):
    return spark.createDataFrame(
        [(i, part, float(val)) for i in ids],
        "id BIGINT, part STRING, val DOUBLE",
    )


def _merge(spark, table, df):
    merge_upsert_manifested(spark, table, df, ["id"], ["part"])


def test_tag_pins_snapshot_past_retention_and_through_checkpoint(
    spark, tag_root
):
    table = f"{tag_root}/t1"
    write_manifested(_rows(spark, range(0, 6)), table, "part")  # v1
    tag_create(spark, table, "release-1")  # v2 pins v1
    v1_content = sorted(
        r["id"] for r in read_manifested(spark, table, tag="release-1").collect()
    )
    # 9 merge commits: evicts v1 from the 2-version retention window AND
    # crosses the _FULL_EVERY=8 full-snapshot boundary, so the tag must
    # survive both the delta chain and a checkpoint re-encode
    for i in range(9):
        _merge(spark, table, _rows(spark, [100 + i], val=2.0))
    got = read_manifested(spark, table, tag="release-1")
    assert sorted(r["id"] for r in got.collect()) == v1_content == list(range(6))
    # the tag reads the OLD state: none of the merged rows are visible
    assert got.filter("id >= 100").count() == 0
    assert read_manifested(spark, table).filter("id >= 100").count() == 9
    # by-version read of the tagged snapshot also works (manifests kept)
    tags = {r["name"]: r["version"] for r in list_tags(spark, table).collect()}
    assert tags == {"release-1": 1}
    assert read_manifested(spark, table, version=1).count() == 6


def test_untagged_old_version_is_reclaimed(spark, tag_root):
    table = f"{tag_root}/t2"
    write_manifested(_rows(spark, range(0, 4)), table, "part")  # v1
    for i in range(4):
        _merge(spark, table, _rows(spark, [50 + i]))
    with pytest.raises(Exception):
        read_manifested(spark, table, version=1).collect()


def test_tag_delete_releases_protection(spark, tag_root):
    table = f"{tag_root}/t3"
    write_manifested(_rows(spark, range(0, 4)), table, "part")  # v1
    tag_create(spark, table, "tmp")  # v2
    for i in range(3):
        _merge(spark, table, _rows(spark, [70 + i], val=3.0))
    assert read_manifested(spark, table, tag="tmp").count() == 4
    v1_dirs = glob.glob(f"{table}/part=a/__v0000000001*")
    assert v1_dirs, "tagged v1 data must still exist"
    tag_delete(spark, table, "tmp")
    _merge(spark, table, _rows(spark, [99]))  # next GC reclaims v1
    assert not glob.glob(f"{table}/part=a/__v0000000001*"), (
        "untagged v1 data must be reclaimed by the next commit's GC"
    )
    with pytest.raises(Exception, match="no tag"):
        read_manifested(spark, table, tag="tmp").collect()


def test_tag_validation_and_replace(spark, tag_root):
    table = f"{tag_root}/t4"
    write_manifested(_rows(spark, range(0, 3)), table, "part")  # v1
    tag_create(spark, table, "r1")  # v2
    with pytest.raises(ValueError, match="already exists"):
        tag_create(spark, table, "r1")
    _merge(spark, table, _rows(spark, [10]))  # v3
    tag_create(spark, table, "r1", replace=True)  # v4: moves r1 -> v3
    tags = {r["name"]: r["version"] for r in list_tags(spark, table).collect()}
    assert tags["r1"] == 3
    assert read_manifested(spark, table, tag="r1").count() == 4
    with pytest.raises(ValueError, match="outside the retention window"):
        tag_create(spark, table, "bad", version=1)
    with pytest.raises(ValueError, match="version= OR tag="):
        read_manifested(spark, table, version=3, tag="r1")
    with pytest.raises(ValueError, match="no tag"):
        read_manifested(spark, table, tag="ghost")
    with pytest.raises(ValueError, match="no tag"):
        tag_delete(spark, table, "ghost")


def test_retagging_a_tag_protected_version(spark, tag_root):
    """A version outside retention but held by one tag can get a second
    name (release aliases) — protection is the union of live tags."""
    table = f"{tag_root}/t5"
    write_manifested(_rows(spark, range(0, 3)), table, "part")  # v1
    tag_create(spark, table, "first")  # v2
    for i in range(3):
        _merge(spark, table, _rows(spark, [30 + i]))
    tag_create(spark, table, "alias", version=1)  # v1 held by "first"
    tag_delete(spark, table, "first")
    _merge(spark, table, _rows(spark, [40]))  # GC: v1 still held by alias
    assert read_manifested(spark, table, tag="alias").count() == 3


def test_rollback_preserves_live_tags(spark, tag_root):
    """Tags are ref state, not snapshot state: a RESTORE to a version
    that predates a tag must not delete the tag (else the next GC
    reclaims what it pins)."""
    from etl_demo_spark.io.manifest import rollback_manifested

    table = f"{tag_root}/t6"
    write_manifested(_rows(spark, range(0, 3)), table, "part")  # v1
    _merge(spark, table, _rows(spark, [10], val=2.0))  # v2
    tag_create(spark, table, "post-merge")  # v3 pins v2
    rollback_manifested(spark, table, 2)  # v4 = restore of v2 (pre-tag doc)
    tags = {r["name"]: r["version"] for r in list_tags(spark, table).collect()}
    assert tags == {"post-merge": 2}, tags
    assert read_manifested(spark, table, tag="post-merge").count() == 4


def test_expire_refuses_under_live_tag_then_drop_tags_erases(
    spark, tag_root
):
    """manifest_expire's right-to-erasure contract vs tag pins: a live
    tag outside the keep window BLOCKS physical expiry (loudly), and
    drop_tags=True drops the pins and makes the bytes actually go."""
    import glob as _glob
    import os as _os

    from etl_demo_spark.io.manifest import manifest_expire

    table = f"{tag_root}/t_exp"
    write_manifested(_rows(spark, range(0, 4)), table, "part")  # v1
    tag_create(spark, table, "hold-v1")  # v2 pins v1
    _merge(spark, table, _rows(spark, [10], val=2.0))  # v3
    _merge(spark, table, _rows(spark, [11], val=2.0))  # v4
    with pytest.raises(ValueError, match="live tags pin.*hold-v1"):
        manifest_expire(spark, table, keep=1)
    # v1's data still on disk (the pin did its job)
    v1_dirs = _glob.glob(f"{table}/part=a/__v0000000001*")
    assert v1_dirs, "tag-pinned v1 data must survive the refused expire"
    kept = manifest_expire(spark, table, keep=1, drop_tags=True)
    # keep=1 promised the at-call head (v4) survives; the UNTAG commit
    # (v5) is the new head chain and is kept in addition
    assert 4 in kept
    assert not _glob.glob(f"{table}/part=a/__v0000000001*"), (
        "after drop_tags expire, the pinned version's bytes are gone"
    )
    assert list_tags(spark, table).count() == 0
    # newest state still reads fine
    assert read_manifested(spark, table).count() == 6


def test_expire_drop_tags_does_not_displace_kept_history(spark, tag_root):
    """drop_tags=True appends one UNTAG commit per dropped tag; those
    metadata commits must not displace the promised keep=K REAL data
    versions out of the keep window (regression: kept was recomputed as
    versions[-keep:] after the drops)."""
    from etl_demo_spark.io.manifest import manifest_expire, manifest_versions

    table = f"{tag_root}/t_exp_keep"
    write_manifested(_rows(spark, range(0, 3)), table, "part")  # v1
    tag_create(spark, table, "pin-a")  # v2 pins v1
    tag_create(spark, table, "pin-b", version=1)  # v3 pins v1
    _merge(spark, table, _rows(spark, [10], val=2.0))  # v4
    _merge(spark, table, _rows(spark, [11], val=2.0))  # v5
    _merge(spark, table, _rows(spark, [12], val=2.0))  # v6
    # keep=3 promises v4/v5/v6 survive; the two UNTAG commits (v7, v8)
    # must be kept IN ADDITION, not instead
    kept = manifest_expire(spark, table, keep=3, drop_tags=True)
    assert {4, 5, 6} <= set(kept), kept
    # the promised versions' manifest files survived on disk (rollback/
    # audit horizon); the pre-keep ones are physically gone
    import glob as _glob

    on_disk = {
        int(p.rsplit("/v", 1)[1][:10])
        for p in _glob.glob(f"{table}/_manifests/v*.json")
    }
    assert {4, 5, 6} <= on_disk, on_disk
    assert on_disk.isdisjoint({1, 2, 3}), on_disk
    # v4's merge leaf (referenced by kept v4/v5 docs) survived too
    assert _glob.glob(f"{table}/part=a/__v0000000004*"), (
        "kept v4's data must survive the drop_tags expire"
    )
    assert list_tags(spark, table).count() == 0
    assert read_manifested(spark, table).count() == 6
