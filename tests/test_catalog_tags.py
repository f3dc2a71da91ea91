"""Catalog RELEASE tags: one name pins a catalog version AND every
member table's snapshot against GC — the cross-table dataset-release
primitive on top of table-level tags."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from etl_demo_spark.io.catalog import (
    catalog_init,
    catalog_commit,
    catalog_snapshot,
    catalog_tag_create,
    catalog_tag_delete,
)
from etl_demo_spark.io.manifest import (
    list_tags,
    manifest_versions,
    merge_upsert_manifested,
    write_manifested,
)


@pytest.fixture(scope="module")
def ct_root():
    root = tempfile.mkdtemp(prefix="catalog_tags_")
    yield root
    shutil.rmtree(root, ignore_errors=True)


def _rows(spark, ids, part="a", val=1.0):
    return spark.createDataFrame(
        [(i, part, float(val)) for i in ids],
        "id BIGINT, part STRING, val DOUBLE",
    )


def _merge(spark, table, df):
    merge_upsert_manifested(spark, table, df, ["id"], ["part"])


def test_release_tag_pins_all_members_past_retention(spark, ct_root):
    a, b, cat = f"{ct_root}/a", f"{ct_root}/b", f"{ct_root}/cat"
    write_manifested(_rows(spark, range(0, 4)), a, "part")
    write_manifested(_rows(spark, range(100, 103)), b, "part")
    catalog_init(spark, cat, {"alpha": a, "beta": b})
    cv = catalog_tag_create(spark, cat, "train-v1")
    assert cv == 2
    # churn both tables far past retention, flipping catalog pins along
    for i in range(4):
        _merge(spark, a, _rows(spark, [10 + i], val=2.0))
        _merge(spark, b, _rows(spark, [110 + i], val=2.0))
        catalog_commit(
            spark,
            cat,
            {
                "alpha": manifest_versions(spark, a)[-1],
                "beta": manifest_versions(spark, b)[-1],
            },
        )
    rel = catalog_snapshot(spark, cat, tag="train-v1")
    assert rel.read("alpha").count() == 4
    assert rel.read("beta").count() == 3
    assert rel.read("alpha").filter("val = 2.0").count() == 0
    # live head moved on
    live = catalog_snapshot(spark, cat)
    assert live.read("alpha").count() == 8
    # member tables carry the release tag
    t = {r["name"] for r in list_tags(spark, a).collect()}
    assert "catalog:train-v1" in t


def test_release_delete_releases_member_protection(spark, ct_root):
    a, cat = f"{ct_root}/c", f"{ct_root}/cat2"
    write_manifested(_rows(spark, range(0, 3)), a, "part")
    catalog_init(spark, cat, {"only": a})
    catalog_tag_create(spark, cat, "r1")
    catalog_tag_delete(spark, cat, "r1")
    assert list_tags(spark, a).count() == 0
    with pytest.raises(ValueError, match="no release"):
        catalog_snapshot(spark, cat, tag="r1")
    with pytest.raises(ValueError, match="no release"):
        catalog_tag_delete(spark, cat, "r1")


def test_release_validation_and_replace(spark, ct_root):
    a, cat = f"{ct_root}/d", f"{ct_root}/cat3"
    write_manifested(_rows(spark, range(0, 3)), a, "part")
    catalog_init(spark, cat, {"only": a})
    catalog_tag_create(spark, cat, "r1")
    with pytest.raises(ValueError, match="already exists"):
        catalog_tag_create(spark, cat, "r1")
    _merge(spark, a, _rows(spark, [50]))
    catalog_commit(spark, cat, {"only": manifest_versions(spark, a)[-1]})
    cv = catalog_tag_create(spark, cat, "r1", replace=True)
    rel = catalog_snapshot(spark, cat, tag="r1")
    assert rel.read("only").count() == 4
    with pytest.raises(ValueError, match="exclusive"):
        catalog_snapshot(spark, cat, version=cv, tag="r1")


def test_replace_drops_stale_member_tags(spark, ct_root):
    """catalog_tag_create(replace=True): members of the replaced release
    that are no longer catalog members must lose their catalog:<name>
    tag — an orphaned tag would pin their snapshots against GC forever
    with no release referencing them."""
    from etl_demo_spark.io.catalog import catalog_alter

    a, b, cat = f"{ct_root}/e1", f"{ct_root}/e2", f"{ct_root}/cat4"
    write_manifested(_rows(spark, range(0, 3)), a, "part")
    write_manifested(_rows(spark, range(0, 2), "b"), b, "part")
    catalog_init(spark, cat, {"ta": a, "tb": b})
    catalog_tag_create(spark, cat, "rel")
    assert list_tags(spark, b).filter("name = 'catalog:rel'").count() == 1
    catalog_alter(spark, cat, remove=["tb"])
    catalog_tag_create(spark, cat, "rel", replace=True)
    assert list_tags(spark, a).filter("name = 'catalog:rel'").count() == 1
    assert list_tags(spark, b).filter("name = 'catalog:rel'").count() == 0, (
        "replaced release must untag departed members"
    )


def test_catalog_alter_membership(spark, ct_root):
    """catalog_alter adds/removes members atomically; snapshots of old
    versions still resolve the old member set."""
    from etl_demo_spark.io.catalog import catalog_alter

    a, b, cat = f"{ct_root}/f1", f"{ct_root}/f2", f"{ct_root}/cat5"
    write_manifested(_rows(spark, range(0, 3)), a, "part")
    write_manifested(_rows(spark, range(0, 5), "b"), b, "part")
    v1 = catalog_init(spark, cat, {"ta": a})
    v2 = catalog_alter(spark, cat, add={"tb": b})
    snap = catalog_snapshot(spark, cat)
    assert snap.read("tb").count() == 5
    old = catalog_snapshot(spark, cat, version=v1)
    with pytest.raises(Exception):
        old.read("tb")
    v3 = catalog_alter(spark, cat, remove=["ta"])
    assert v3 == v2 + 1
    with pytest.raises(Exception):
        catalog_snapshot(spark, cat).read("ta")
    with pytest.raises(ValueError, match="not members"):
        catalog_alter(spark, cat, remove=["ta"])
    with pytest.raises(ValueError, match="already members"):
        catalog_alter(spark, cat, add={"tb": b})
    with pytest.raises(ValueError, match="nothing to add"):
        catalog_alter(spark, cat)
