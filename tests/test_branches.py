"""Branches + write-audit-publish (io/manifest.py branch family).

Contract under test: a branch is a writable named ref — commits inside
`use_branch` land on a sub-log invisible to main readers; `branch_
fastforward` validates expectations and publishes the branch head as ONE
atomic main commit with zero data movement; main GC protects live
branches' staged data; conflicts with main commits since the fork are
classified with the same commit-conflict rules as racing writers."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

import etl_demo_spark.io.manifest as m


def _rows(spark, vals):
    return spark.createDataFrame(
        [(i, p, float(v)) for i, p, v in vals],
        "id BIGINT, part STRING, val DOUBLE",
    )


def _mk(spark, tmp_path, name="t"):
    root = str(tmp_path / name)
    m.write_manifested(
        _rows(spark, [(1, "a", 1.0), (2, "b", 2.0)]), root, "part"
    )
    return root


def _stat_files(root):
    out = {}
    for f in glob.glob(f"{root}/part=*/__v*/*.parquet"):
        st = os.stat(f)
        out[f] = (st.st_size, st.st_mtime_ns)
    return out


def test_branch_commits_invisible_to_main_until_publish(spark, tmp_path):
    root = _mk(spark, tmp_path)
    assert m.branch_create(spark, root, "wap") == 1
    with m.use_branch(spark, root, "wap"):
        m.append_manifested(spark, root, _rows(spark, [(10, "a", 5.0)]))
        m.merge_upsert_manifested(
            spark, root, _rows(spark, [(2, "b", 99.0)]), ["id"], ["part"]
        )
        assert m.read_manifested(spark, root).count() == 3
        got = {r.id: r.val for r in m.read_manifested(spark, root).collect()}
        assert got[2] == 99.0 and got[10] == 5.0
    # main: untouched — version, rows, values
    assert m.manifest_versions(spark, root)[-1] == 1
    main = {r.id: r.val for r in m.read_manifested(spark, root).collect()}
    assert main == {1: 1.0, 2: 2.0}
    b = {r["name"]: r for r in m.list_branches(spark, root).collect()}
    assert b["wap"]["base_version"] == 1 and b["wap"]["commits"] == 2

    # publish: main flips to the branch head in one commit, ZERO data
    # movement — the branch's staged files are referenced byte-for-byte
    pre = _stat_files(root)
    v = m.branch_fastforward(spark, root, "wap")
    assert v == 2
    after = _stat_files(root)
    for f, sig in pre.items():
        assert after.get(f) == sig, f"publish moved data: {f}"
    main = {r.id: r.val for r in m.read_manifested(spark, root).collect()}
    assert main == {1: 1.0, 2: 99.0, 10: 5.0}
    assert m.list_branches(spark, root).count() == 0  # consumed
    fs, jvm = m._hadoop_fs(spark, root)
    assert m._resolve_doc(fs, jvm, root, 2).get("operation") == "PUBLISH"


def test_wap_expectations_gate_bad_data_off_main(spark, tmp_path):
    """The audit gate: bad rows staged on a branch REFUSE to publish
    under a failing expectation; main readers never see them; after the
    fix the same branch publishes."""
    root = _mk(spark, tmp_path)
    m.branch_create(spark, root, "audit")
    with m.use_branch(spark, root, "audit"):
        m.append_manifested(
            spark, root, _rows(spark, [(30, "a", -7.0), (31, "b", 3.0)])
        )
    with pytest.raises(ValueError, match="failed.*expectations.*non_negative"):
        m.branch_fastforward(
            spark, root, "audit", expectations={"non_negative": "val >= 0"}
        )
    # main never served the bad row; branch still live for the fix
    assert m.read_manifested(spark, root).count() == 2
    assert m.list_branches(spark, root).count() == 1
    with m.use_branch(spark, root, "audit"):
        m.delete_where_manifested(spark, root, F.col("val") < 0, "part")
    v = m.branch_fastforward(
        spark, root, "audit", expectations={"non_negative": "val >= 0"}
    )
    got = {r.id: r.val for r in m.read_manifested(spark, root).collect()}
    assert got == {1: 1.0, 2: 2.0, 31: 3.0}
    assert v == m.manifest_versions(spark, root)[-1]


def test_publish_after_disjoint_main_commit_merges(spark, tmp_path):
    """Main advanced on a DIFFERENT leaf after the fork: fast-forward
    classifies with the racing-writer rules and lands both."""
    root = _mk(spark, tmp_path)
    m.branch_create(spark, root, "wap")
    with m.use_branch(spark, root, "wap"):
        m.merge_upsert_manifested(
            spark, root, _rows(spark, [(1, "a", 42.0)]), ["id"], ["part"]
        )
    m.append_manifested(spark, root, _rows(spark, [(40, "b", 4.0)]))  # main v2
    v = m.branch_fastforward(spark, root, "wap")
    assert v == 3
    got = {r.id: r.val for r in m.read_manifested(spark, root).collect()}
    assert got == {1: 42.0, 2: 2.0, 40: 4.0}


def test_publish_conflicting_main_commit_refuses(spark, tmp_path):
    root = _mk(spark, tmp_path)
    m.branch_create(spark, root, "wap")
    with m.use_branch(spark, root, "wap"):
        m.merge_upsert_manifested(
            spark, root, _rows(spark, [(1, "a", 42.0)]), ["id"], ["part"]
        )
    # main rewrites the SAME leaf after the fork
    m.merge_upsert_manifested(
        spark, root, _rows(spark, [(1, "a", -1.0)]), ["id"], ["part"]
    )
    with pytest.raises(ValueError, match="conflicts with\\s+main"):
        m.branch_fastforward(spark, root, "wap")
    # main keeps its own state; the branch can be dropped cleanly
    got = {r.id: r.val for r in m.read_manifested(spark, root).collect()}
    assert got[1] == -1.0
    m.branch_delete(spark, root, "wap")
    assert m.list_branches(spark, root).count() == 0


def test_main_gc_protects_live_branch_through_churn(spark, tmp_path):
    """Main churns past the retention window while a branch stays
    forked at v1: the branch head (and its main-chain ancestors + its
    own staged data) must remain fully readable."""
    root = _mk(spark, tmp_path)
    m.branch_create(spark, root, "longlived")
    with m.use_branch(spark, root, "longlived"):
        m.append_manifested(spark, root, _rows(spark, [(90, "a", 9.0)]))
    for i in range(9):  # evicts v1 from retention AND crosses _FULL_EVERY
        m.merge_upsert_manifested(
            spark, root, _rows(spark, [(100 + i, "b", 1.0)]), ["id"], ["part"]
        )
    with m.use_branch(spark, root, "longlived"):
        got = {r.id: r.val for r in m.read_manifested(spark, root).collect()}
    assert got == {1: 1.0, 2: 2.0, 90: 9.0}, (
        "branch must read its fork-point state + own commits after main churn"
    )
    # and the branch still publishes? no — main rewrote leaf b (its own
    # appends), branch appended to a: disjoint → still publishable
    v = m.branch_fastforward(spark, root, "longlived")
    main = {r.id: r.val for r in m.read_manifested(spark, root).collect()}
    assert main[90] == 9.0 and len(main) == 12
    assert v == m.manifest_versions(spark, root)[-1]


def test_branch_validation_errors(spark, tmp_path):
    root = _mk(spark, tmp_path)
    with pytest.raises(ValueError, match="invalid branch name"):
        m.branch_create(spark, root, "bad/name")
    m.branch_create(spark, root, "b1")
    with pytest.raises(ValueError, match="already exists"):
        m.branch_create(spark, root, "b1")
    with pytest.raises(ValueError, match="no commits"):
        m.branch_fastforward(spark, root, "b1")
    with pytest.raises(ValueError, match="no branch"):
        m.use_branch(spark, root, "nope").__enter__()


def test_publish_stages_net_delta_for_change_feed_streams(spark, tmp_path):
    """On a change_feed table, a multi-commit branch PUBLISH stages the
    branch's net row delta as its change sidecar — a CDC subscriber
    rides through the publish and converges to the published table."""
    root = str(tmp_path / "cf")
    m.write_manifested(
        _rows(spark, [(1, "a", 1.0), (2, "b", 2.0)]), root, "part",
        change_feed=True,
    )  # v1
    from etl_demo_spark.io.table_stream import register_table_stream_source

    register_table_stream_source(spark)
    sink, ck = str(tmp_path / "sink"), str(tmp_path / "ck")

    def drain():
        q = (
            spark.readStream.format("tablestream")
            .option("path", root)
            .load()
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    drain()  # subscriber at v1
    m.branch_create(spark, root, "wap")
    with m.use_branch(spark, root, "wap"):
        m.append_manifested(spark, root, _rows(spark, [(10, "a", 5.0)]))
        m.merge_upsert_manifested(
            spark, root, _rows(spark, [(2, "b", 99.0)]), ["id"], ["part"]
        )
        m.append_manifested(spark, root, _rows(spark, [(11, "b", 7.0)]))
    v = m.branch_fastforward(spark, root, "wap")
    fs, jvm = m._hadoop_fs(spark, root)
    assert m._load_raw(fs, jvm, root, v).get("change_data", {}).get("rel"), (
        "publish on a change_feed table must stage its net delta"
    )
    drain()  # the SAME checkpoint rides through the publish
    feed = spark.read.parquet(sink).drop("_commit_version")
    replica = feed.filter("_change_type = 'insert'").drop(
        "_change_type"
    ).exceptAll(feed.filter("_change_type = 'delete'").drop("_change_type"))
    live = m.read_manifested(spark, root)
    assert replica.exceptAll(live).count() == 0
    assert live.exceptAll(replica).count() == 0
    assert {r.id: r.val for r in live.collect()} == {
        1: 1.0, 2: 99.0, 10: 5.0, 11: 7.0
    }


def test_branch_context_key_is_scheme_normalized(spark, tmp_path):
    """use_branch('file:/x/t') + a committer called with '/x/t' (and the
    reverse) must hit the SAME branch context — a key miss here silently
    publishes the 'branch' commit straight to main, bypassing the WAP
    gate (regression: the context was keyed by the raw root string)."""
    root = _mk(spark, tmp_path, "t_scheme")
    m.branch_create(spark, root, "wap")
    with m.use_branch(spark, f"file:{root}", "wap"):
        m.append_manifested(spark, root, _rows(spark, [(10, "a", 5.0)]))
    with m.use_branch(spark, root, "wap"):
        m.append_manifested(
            spark, f"file:{root}", _rows(spark, [(11, "b", 6.0)])
        )
    # main untouched: both commits landed on the branch sub-log
    assert m.manifest_versions(spark, root)[-1] == 1
    assert m.read_manifested(spark, root).count() == 2
    b = {r["name"]: r for r in m.list_branches(spark, root).collect()}
    assert b["wap"]["commits"] == 2
    m.branch_fastforward(spark, root, "wap")
    assert m.read_manifested(spark, root).count() == 4
