"""Catalog-level WRITE-AUDIT-PUBLISH (io/catalog.py:catalog_wap_*):
atomic multi-table stage -> validate -> publish. Per-table WAP can
publish table A while table B's audit fails; this gate validates the
whole multi-table load (incl. CROSS-table expectations) and flips all
catalog pins in one CAS — catalog readers and catalogstream consumers
see the load whole or not at all."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_demo_spark.io.catalog import (
    catalog_init,
    catalog_snapshot,
    catalog_versions,
    catalog_wap_abort,
    catalog_wap_begin,
    catalog_wap_publish,
    use_catalog_wap,
)
from etl_demo_spark.io.manifest import (
    append_manifested,
    delete_where_manifested,
    list_branches,
    manifest_versions,
    read_manifested,
    write_manifested,
)


def _mk(spark, tmp_path):
    """docs + embs member tables: every doc should have an embedding."""
    docs, embs = str(tmp_path / "docs"), str(tmp_path / "embs")
    cat = str(tmp_path / "cat")
    write_manifested(
        spark.createDataFrame(
            [(1, "alpha", "p"), (2, "beta", "p")],
            "doc_id INT, body STRING, part STRING",
        ),
        docs,
        "part",
    )
    write_manifested(
        spark.createDataFrame(
            [(1, 0.1, "p"), (2, 0.2, "p")],
            "doc_id INT, vec DOUBLE, part STRING",
        ),
        embs,
        "part",
    )
    assert catalog_init(spark, cat, {"docs": docs, "embs": embs}) == 1
    return docs, embs, cat


CROSS = {
    "every_doc_embedded": (
        "SELECT d.doc_id FROM docs d LEFT ANTI JOIN embs e USING (doc_id)"
    )
}


def test_staged_load_is_invisible_until_publish(spark, tmp_path):
    docs, embs, cat = _mk(spark, tmp_path)
    catalog_wap_begin(spark, cat, "load1")
    with use_catalog_wap(spark, cat, "load1"):
        append_manifested(
            spark,
            docs,
            spark.createDataFrame(
                [(3, "gamma", "p")], "doc_id INT, body STRING, part STRING"
            ),
        )
        append_manifested(
            spark,
            embs,
            spark.createDataFrame(
                [(3, 0.3, "p")], "doc_id INT, vec DOUBLE, part STRING"
            ),
        )
        # inside the WAP: reads see the staged rows
        assert read_manifested(spark, docs).count() == 3
    # outside: main tables, catalog pins, catalog version — all untouched
    assert read_manifested(spark, docs).count() == 2
    assert read_manifested(spark, embs).count() == 2
    assert catalog_versions(spark, cat)[-1] == 1
    snap = catalog_snapshot(spark, cat)
    assert snap.read("docs").count() == 2

    v = catalog_wap_publish(spark, cat, "load1", sql_expectations=CROSS)
    assert v == 2 and catalog_versions(spark, cat)[-1] == 2
    snap = catalog_snapshot(spark, cat)
    assert snap.read("docs").count() == 3
    assert snap.read("embs").count() == 3
    # branches and the ref are gone
    assert list_branches(spark, docs).count() == 0
    assert list_branches(spark, embs).count() == 0
    with pytest.raises(ValueError, match="no catalog WAP"):
        catalog_wap_publish(spark, cat, "load1")


def test_cross_table_expectation_refuses_whole_publish(spark, tmp_path):
    """The shape per-table WAP cannot gate: docs gets a row with NO
    matching embedding. Table-level checks pass on both tables, but the
    cross-table expectation refuses — and NOTHING moves: not docs' main
    (whose own branch was fine), not embs', not the pins."""
    docs, embs, cat = _mk(spark, tmp_path)
    catalog_wap_begin(spark, cat, "load2")
    with use_catalog_wap(spark, cat, "load2"):
        append_manifested(
            spark,
            docs,
            spark.createDataFrame(
                [(4, "delta", "p")], "doc_id INT, body STRING, part STRING"
            ),
        )
    with pytest.raises(ValueError, match="every_doc_embedded.*1"):
        catalog_wap_publish(spark, cat, "load2", sql_expectations=CROSS)
    assert read_manifested(spark, docs).count() == 2, "docs main moved!"
    assert manifest_versions(spark, docs)[-1] == 1
    assert catalog_versions(spark, cat)[-1] == 1

    # fix ON THE SAME WAP (stage the missing embedding), then publish
    with use_catalog_wap(spark, cat, "load2"):
        append_manifested(
            spark,
            embs,
            spark.createDataFrame(
                [(4, 0.4, "p")], "doc_id INT, vec DOUBLE, part STRING"
            ),
        )
    v = catalog_wap_publish(spark, cat, "load2", sql_expectations=CROSS)
    assert v == 2
    snap = catalog_snapshot(spark, cat)
    assert snap.read("docs").count() == 3
    assert snap.read("embs").count() == 3


def test_per_table_expectations_and_abort(spark, tmp_path):
    docs, embs, cat = _mk(spark, tmp_path)
    catalog_wap_begin(spark, cat, "load3")
    with use_catalog_wap(spark, cat, "load3"):
        append_manifested(
            spark,
            embs,
            spark.createDataFrame(
                [(9, -1.0, "p")], "doc_id INT, vec DOUBLE, part STRING"
            ),
        )
    with pytest.raises(ValueError, match="embs.vec_nonneg.*1"):
        catalog_wap_publish(
            spark, cat, "load3",
            expectations={"embs": {"vec_nonneg": "vec >= 0"}},
        )
    catalog_wap_abort(spark, cat, "load3")
    assert list_branches(spark, embs).count() == 0
    assert read_manifested(spark, embs).count() == 2
    assert catalog_versions(spark, cat)[-1] == 1
    # the name is reusable after abort
    catalog_wap_begin(spark, cat, "load3")
    catalog_wap_abort(spark, cat, "load3")


def test_begin_is_exclusive_and_all_or_nothing(spark, tmp_path):
    docs, embs, cat = _mk(spark, tmp_path)
    catalog_wap_begin(spark, cat, "dup")
    with pytest.raises(ValueError, match="already exists|already open"):
        catalog_wap_begin(spark, cat, "dup")
    catalog_wap_abort(spark, cat, "dup")
    with pytest.raises(ValueError, match="not catalog members"):
        catalog_wap_begin(spark, cat, "x", tables=["docs", "nope"])
    # the failed begin rolled back docs' branch
    assert list_branches(spark, docs).filter("name = 'wap-x'").count() == 0


def test_untouched_member_keeps_its_pin(spark, tmp_path):
    docs, embs, cat = _mk(spark, tmp_path)
    catalog_wap_begin(spark, cat, "docsonly")
    with use_catalog_wap(spark, cat, "docsonly"):
        delete_where_manifested(spark, docs, F.col("doc_id") == 2, "part")
    v = catalog_wap_publish(spark, cat, "docsonly")
    snap = catalog_snapshot(spark, cat, version=v)
    assert snap.read("docs").count() == 1
    assert snap.pins()["embs"] == 1, "untouched member's pin must not move"
    assert list_branches(spark, embs).count() == 0, "untouched branch dropped"


def test_conflicting_main_commit_refuses_before_anything_moves(
    spark, tmp_path
):
    """A main DML rewriting the same leaf the WAP touched lands after
    the fork: the publish pre-classifies and refuses BEFORE any table
    fast-forwards — including tables whose own branches were clean."""
    docs, embs, cat = _mk(spark, tmp_path)
    catalog_wap_begin(spark, cat, "race")
    with use_catalog_wap(spark, cat, "race"):
        delete_where_manifested(spark, docs, F.col("doc_id") == 1, "part")
        append_manifested(
            spark,
            embs,
            spark.createDataFrame(
                [(5, 0.5, "p")], "doc_id INT, vec DOUBLE, part STRING"
            ),
        )
    # racing main writer rewrites the SAME leaf of docs
    delete_where_manifested(spark, docs, F.col("doc_id") == 2, "part")
    embs_main_before = manifest_versions(spark, embs)[-1]
    with pytest.raises(ValueError, match="conflicts with"):
        catalog_wap_publish(spark, cat, "race")
    assert manifest_versions(spark, embs)[-1] == embs_main_before, (
        "clean member fast-forwarded despite the refusal"
    )
    assert catalog_versions(spark, cat)[-1] == 1
    catalog_wap_abort(spark, cat, "race")


def test_catalogstream_sees_one_atomic_pin_flip(spark, tmp_path):
    """A catalogstream consumer tails catalog commits: the whole WAP —
    two table loads — surfaces as EXACTLY ONE catalog version, with
    both pins moved in it."""
    import tempfile

    from etl_demo_spark.io.catalog_stream import (
        register_catalog_stream_source,
    )

    docs, embs, cat = _mk(spark, tmp_path)
    register_catalog_stream_source(spark)
    sink = tempfile.mkdtemp(prefix="wapstream_")
    catalog_wap_begin(spark, cat, "s1")
    with use_catalog_wap(spark, cat, "s1"):
        append_manifested(
            spark,
            docs,
            spark.createDataFrame(
                [(6, "zeta", "p")], "doc_id INT, body STRING, part STRING"
            ),
        )
        append_manifested(
            spark,
            embs,
            spark.createDataFrame(
                [(6, 0.6, "p")], "doc_id INT, vec DOUBLE, part STRING"
            ),
        )
    catalog_wap_publish(spark, cat, "s1", sql_expectations=CROSS)
    q = (
        spark.readStream.format("catalogstream")
        .option("path", cat)
        .load()
        .writeStream.format("parquet")
        .option("path", f"{sink}/out")
        .option("checkpointLocation", f"{sink}/ck")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(f"{sink}/out")
    rows = {r["version"]: dict(r["pins"]) for r in got.collect()}
    # one catalog commit carries BOTH member moves — never a torn state
    assert rows[1] == {"docs": 1, "embs": 1}, rows
    assert rows[2] == {"docs": 2, "embs": 2}, rows
    assert sorted(rows) == [1, 2], rows


def test_catalog_wap_through_conditional_put_backend(spark, tmp_path):
    """Round-10 composition: the WHOLE catalog WAP — per-table branch
    commits, the WAP ref, the fast-forwards, and the catalog pin flip —
    routes through the rename-less conditional-PUT commit backend. On
    an object store the PUT is the commit; nothing above the primitive
    changes."""
    import etl_demo_spark.io.manifest as m
    from etl_demo_spark.io.commit_backend import (
        ConditionalPutBackend,
        InMemoryKeyStore,
    )

    store = InMemoryKeyStore()
    m.set_commit_backend(str(tmp_path), ConditionalPutBackend(store))
    try:
        docs, embs, cat = _mk(spark, tmp_path)
        catalog_wap_begin(spark, cat, "putload")
        with use_catalog_wap(spark, cat, "putload"):
            append_manifested(
                spark,
                docs,
                spark.createDataFrame(
                    [(7, "eta", "p")], "doc_id INT, body STRING, part STRING"
                ),
            )
            append_manifested(
                spark,
                embs,
                spark.createDataFrame(
                    [(7, 0.7, "p")], "doc_id INT, vec DOUBLE, part STRING"
                ),
            )
        v = catalog_wap_publish(spark, cat, "putload", sql_expectations=CROSS)
        snap = catalog_snapshot(spark, cat, version=v)
        assert snap.read("docs").count() == 3
        assert snap.read("embs").count() == 3
        keys = store.keys()
        # the catalog versions AND both tables' published manifests are
        # PUT objects; the WAP ref was arbitrated by conditional PUT too
        assert any("_catalog/v0000000002.json" in k for k in keys), keys
        assert any("_wap/putload.json" in k for k in keys), keys
        for t in ("docs", "embs"):
            assert any(
                f"/{t}/" in k and k.endswith("v0000000002.json") for k in keys
            ), (t, keys)
    finally:
        m.set_commit_backend(str(tmp_path), None)


def test_wap_staged_data_survives_main_gc_churn(spark, tmp_path):
    """GC protection: while a WAP is open, heavy MAIN churn on a member
    (enough commits to cross retention AND a _FULL_EVERY checkpoint)
    must never reclaim the branch's staged files — the publish after
    the churn lands every staged row, merged over the advanced main."""
    import glob
    import os as _os

    docs, embs, cat = _mk(spark, tmp_path)
    catalog_wap_begin(spark, cat, "slowload")
    with use_catalog_wap(spark, cat, "slowload"):
        append_manifested(
            spark,
            docs,
            spark.createDataFrame(
                [(30, "stage", "p")], "doc_id INT, body STRING, part STRING"
            ),
        )
        append_manifested(
            spark,
            embs,
            spark.createDataFrame(
                [(30, 3.0, "p")], "doc_id INT, vec DOUBLE, part STRING"
            ),
        )
        staged = {
            f: _os.stat(f).st_mtime_ns
            for f in glob.glob(f"{docs}/part=*/__v*/*.parquet")
        }
    # main churn on BOTH members: 10 commits each — far past _RETAIN,
    # across a _FULL_EVERY checkpoint re-encode, each commit running GC
    for i in range(10):
        append_manifested(
            spark,
            docs,
            spark.createDataFrame(
                [(100 + i, "main", "p")],
                "doc_id INT, body STRING, part STRING",
            ),
        )
        append_manifested(
            spark,
            embs,
            spark.createDataFrame(
                [(100 + i, float(i), "p")],
                "doc_id INT, vec DOUBLE, part STRING",
            ),
        )
    after = {
        f: _os.stat(f).st_mtime_ns
        for f in glob.glob(f"{docs}/part=*/__v*/*.parquet")
    }
    assert staged.items() <= after.items(), "main GC reclaimed WAP files"
    v = catalog_wap_publish(spark, cat, "slowload", sql_expectations=CROSS)
    snap = catalog_snapshot(spark, cat, version=v)
    # 2 base + 10 churn + 1 staged, on both members, exactly once
    assert snap.read("docs").count() == 13
    assert snap.read("embs").count() == 13
    assert snap.read("docs").filter("doc_id = 30").count() == 1
    assert snap.read("embs").filter("doc_id = 30").count() == 1
