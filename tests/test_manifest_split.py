"""SPLIT stats layout (io/manifest.py — Iceberg's manifest-list shape):
per-leaf stats files under _manifests/stats/ + a {leaf → stats-file}
pointer map in the snapshot. The scale contract under test: snapshot
documents stay O(leaves) regardless of file count, a commit rewrites
stats files for its TOUCHED leaves only, resolution loads no stats at
all, and reads load exactly the leaves their partition prune kept.

Reference cite: the reference engine (etl_weekly_trades.py) has no
file-skipping metadata; this layout is modeled on the public Apache
Iceberg spec's manifest-list/manifest-file split.
"""

from __future__ import annotations

import glob
import json
import os

import pytest
from pyspark.sql import functions as F


def _mk(spark, path, n=4000, leaves=4, stats_split=True, files_per_leaf=4):
    from etl_demo_spark.io.manifest import write_manifested

    df = spark.range(0, n).select(
        F.col("id"),
        (F.col("id") % leaves).cast("string").alias("dt"),
        (F.col("id") * 3).alias("v"),
    )
    write_manifested(
        df.repartition(files_per_leaf), path, "dt",
        stats_cols=["id"], bloom_cols=["id"], stats_split=stats_split,
    )
    return df


def test_split_snapshot_is_pointer_sized_and_prunes(spark, tmp_path):
    """The snapshot document holds NO stats blobs — only the pointer map
    — yet range/bloom pruning works identically to the embedded layout,
    loading stats lazily per leaf."""
    from etl_demo_spark.io.manifest import (
        _hadoop_fs,
        _load_doc,
        read_manifested,
    )

    path = str(tmp_path / "t")
    _mk(spark, path)
    doc = _load_doc(*_hadoop_fs(spark, path), path)
    assert "files" not in doc
    assert sorted(doc["files_manifests"]) == ["dt=0", "dt=1", "dt=2", "dt=3"]
    # the snapshot document is pointer-sized: far below a single leaf's
    # bloom blob footprint (~2 KB/file embedded)
    snap = min(glob.glob(f"{path}/_manifests/v*.json"), key=os.path.getsize)
    assert os.path.getsize(snap) < 2000
    # every pointer resolves to a real stats file with per-file entries
    for fname in doc["files_manifests"].values():
        entries = json.loads(open(f"{path}/_manifests/stats/{fname}").read())
        assert entries and all("__rows" in st for st in entries.values())

    n_all = len(read_manifested(spark, path).inputFiles())
    pr = read_manifested(spark, path, prune_points={"id": 1234})
    assert len(pr.inputFiles()) <= 2 < n_all
    assert pr.filter("id = 1234").count() == 1
    rr = read_manifested(spark, path, prune_ranges={"id": (10, 20)})
    assert rr.filter("id between 10 and 20").count() == 11
    assert len(rr.inputFiles()) < n_all


def test_split_commit_rewrites_touched_leaves_only(spark, tmp_path):
    """O(change) commit metadata: a merge into one leaf repoints that
    leaf's stats file and NO other; the delta manifest carries only the
    touched pointer (never stats blobs, never the full map)."""
    from etl_demo_spark.io.manifest import (
        _hadoop_fs,
        _load_doc,
        _load_raw,
        append_manifested,
        merge_upsert_manifested,
        read_manifested,
    )

    path = str(tmp_path / "t")
    _mk(spark, path)
    fs, jvm = _hadoop_fs(spark, path)
    v1 = _load_doc(fs, jvm, path)

    merge_upsert_manifested(
        spark, path,
        spark.createDataFrame([(99999, "1", 5)], "id BIGINT, dt STRING, v BIGINT"),
        ["id"], ["dt"],
    )
    v2 = _load_doc(fs, jvm, path)
    repointed = {
        r for r in v2["files_manifests"]
        if v2["files_manifests"][r] != v1["files_manifests"][r]
    }
    assert repointed == {"dt=1"}
    raw = _load_raw(fs, jvm, path, v2["version"])
    assert set(raw.get("files_manifests_delta", {})) == {"dt=1"}
    assert "files_delta" not in raw and "files" not in raw
    assert read_manifested(
        spark, path, prune_points={"id": 99999}
    ).filter("id = 99999").count() == 1

    # append: ONE leaf's stats file rewritten, merged old + fresh entries
    append_manifested(
        spark, path,
        spark.createDataFrame([(77777, "2", 1)], "id BIGINT, dt STRING, v BIGINT"),
    )
    v3 = _load_doc(fs, jvm, path)
    assert {
        r for r in v3["files_manifests"]
        if v3["files_manifests"][r] != v2["files_manifests"][r]
    } == {"dt=2"}
    ents = json.loads(
        open(f"{path}/_manifests/stats/{v3['files_manifests']['dt=2']}").read()
    )
    vrels = {p.rsplit("/", 1)[0] for p in ents}
    assert len(vrels) == 2, vrels  # primary + the appended extra vrel
    assert read_manifested(
        spark, path, prune_points={"id": 77777}
    ).filter("id = 77777").count() == 1


def test_split_survives_full_snapshot_boundary_and_gc(spark, tmp_path):
    """Crossing the _FULL_EVERY checkpoint keeps the pointer map (full
    snapshots embed pointers, not blobs); superseded stats files are
    GC'd with the same retention rules as version subdirs."""
    from etl_demo_spark.io.manifest import (
        _FULL_EVERY,
        _hadoop_fs,
        _load_doc,
        _load_raw,
        merge_upsert_manifested,
        read_manifested,
    )

    path = str(tmp_path / "t")
    _mk(spark, path)
    fs, jvm = _hadoop_fs(spark, path)
    for i in range(_FULL_EVERY + 2):
        merge_upsert_manifested(
            spark, path,
            spark.createDataFrame(
                [(500000 + i, str(i % 4), 1)], "id BIGINT, dt STRING, v BIGINT"
            ),
            ["id"], ["dt"],
        )
    doc = _load_doc(fs, jvm, path)
    assert doc.get("files_manifests") and "files" not in doc
    # at least one full snapshot was written past the boundary; it holds
    # the pointer map and no stats blobs (only versions GC left on disk
    # are inspectable)
    from etl_demo_spark.io.manifest import _list_manifest_versions

    fulls = [
        v for v in _list_manifest_versions(fs, jvm, path)
        if v > 1 and "parent" not in _load_raw(fs, jvm, path, v)
    ]
    assert fulls, "no full snapshot across the boundary?"
    raw_full = _load_raw(fs, jvm, path, fulls[-1])
    assert "files_manifests" in raw_full and "files" not in raw_full
    assert read_manifested(
        spark, path, prune_points={"id": 500000 + _FULL_EVERY}
    ).filter(f"id = {500000 + _FULL_EVERY}").count() == 1
    # GC bound: superseded-by-expiry stats files are reclaimed (attempt
    # orphans keep a grace window; referenced files obviously stay)
    live = set()
    from etl_demo_spark.io.manifest import _resolve_doc
    for v in _list_manifest_versions(fs, jvm, path)[-2:]:
        live.update(_resolve_doc(fs, jvm, path, v).get("files_manifests", {}).values())
    on_disk = {os.path.basename(p) for p in glob.glob(f"{path}/_manifests/stats/*.json")}
    assert live <= on_disk
    # every commit rewrote ≤1 leaf; disk holds the live set plus young
    # (grace-window) attempt files — far below leaves × commits
    assert len(on_disk) <= len(live) + 2 * (_FULL_EVERY + 2)


def test_split_compose_dv_rollback_changefeed_timetravel(spark, tmp_path):
    """The snapshot features compose with the split layout: DV deletes
    (incl. dead-file elision), RESTORE, change feed, time travel."""
    from etl_demo_spark.io.manifest import (
        append_manifested,
        delete_rows_manifested,
        manifest_diff,
        manifest_versions,
        read_changes,
        read_manifested,
        rollback_manifested,
    )

    path = str(tmp_path / "t")
    _mk(spark, path)
    append_manifested(
        spark, path,
        spark.createDataFrame([(77777, "2", 1)], "id BIGINT, dt STRING, v BIGINT"),
    )
    vs = manifest_versions(spark, path)
    d = manifest_diff(spark, path, vs[-2], vs[-1])
    assert d == {
        "dt=2": {"status": "rows_appended", "rows_before": 1000, "rows_after": 1001}
    }
    ch = {(r.id, r._change_type) for r in read_changes(spark, path, vs[-2], vs[-1]).collect()}
    assert ch == {(77777, "insert")}
    assert read_manifested(spark, path, version=vs[-2]).count() == 4000

    assert delete_rows_manifested(spark, path, F.col("id") == 77777) == 1
    assert read_manifested(spark, path).filter("id = 77777").count() == 0
    vs = manifest_versions(spark, path)
    rollback_manifested(spark, path, vs[-2])
    assert read_manifested(spark, path).filter("id = 77777").count() == 1


def test_split_alter_rename_rekeys_leaf_stats_files(spark, tmp_path):
    """A stats-rekeying ALTER rewrites every leaf stats file (the one
    inherently O(table-metadata) alter); a non-rekeying ALTER carries
    the pointer map byte-identically."""
    from etl_demo_spark.io.manifest import (
        _hadoop_fs,
        _load_doc,
        alter_manifested,
        read_manifested,
    )

    path = str(tmp_path / "t")
    _mk(spark, path)
    fs, jvm = _hadoop_fs(spark, path)
    before = _load_doc(fs, jvm, path)["files_manifests"]
    alter_manifested(spark, path, add_columns={"note": "string"})
    assert _load_doc(fs, jvm, path)["files_manifests"] == before

    alter_manifested(spark, path, rename_columns={"id": "item_id"})
    after = _load_doc(fs, jvm, path)["files_manifests"]
    assert all(after[r] != before[r] for r in before)
    pr = read_manifested(spark, path, prune_points={"item_id": 1234})
    assert pr.filter("item_id = 1234").count() == 1
    assert len(pr.inputFiles()) <= 2


def test_convert_to_split_stats_migration(spark, tmp_path):
    """Embedded → split as one metadata-only commit: no data file is
    touched, pruning/pointing unchanged, idempotent re-run."""
    from etl_demo_spark.io.manifest import (
        _hadoop_fs,
        _load_doc,
        convert_to_split_stats,
        merge_upsert_manifested,
        read_manifested,
    )

    path = str(tmp_path / "t")
    _mk(spark, path, stats_split=False)
    inv = {
        f: os.path.getmtime(f) for f in glob.glob(f"{path}/dt=*/__v*/*.parquet")
    }
    v = convert_to_split_stats(spark, path)
    assert v == 2
    assert {
        f: os.path.getmtime(f) for f in glob.glob(f"{path}/dt=*/__v*/*.parquet")
    } == inv, "convert must touch no data file"
    doc = _load_doc(*_hadoop_fs(spark, path), path)
    assert doc.get("files_manifests") and "files" not in doc
    assert read_manifested(
        spark, path, prune_points={"id": 42}
    ).filter("id = 42").count() == 1
    assert convert_to_split_stats(spark, path) == 2  # idempotent
    # post-convert commits stay split
    merge_upsert_manifested(
        spark, path,
        spark.createDataFrame([(123456, "0", 9)], "id BIGINT, dt STRING, v BIGINT"),
        ["id"], ["dt"],
    )
    doc2 = _load_doc(*_hadoop_fs(spark, path), path)
    assert doc2.get("files_manifests") and "files" not in doc2


def test_split_leaf_filter_loads_only_matching_leaves(spark, tmp_path):
    """The read-side scale contract: with a leaf_filter, only the
    matching leaves' stats files are opened (observed via the process
    cache after a cold start)."""
    from etl_demo_spark.io import manifest as M

    path = str(tmp_path / "t")
    _mk(spark, path)
    M._LEAF_STATS_CACHE.clear()
    out = M.read_manifested(
        spark, path, leaf_filter={"dt": "2"}, prune_points={"id": 1234}
    )
    loaded = {k[1] for k in M._LEAF_STATS_CACHE if k[0].endswith(str(tmp_path / "t"))}
    doc = M._load_doc(*M._hadoop_fs(spark, path), path)
    assert loaded == {doc["files_manifests"]["dt=2"]}, loaded
    assert out.filter("id = 1234").count() == 1  # 1234 % 4 == 2: present
    M._LEAF_STATS_CACHE.clear()


def test_split_two_writers_threaded_both_commit(spark, tmp_path):
    """OCC on a split table: two threads merging different leaves both
    land; the loser's retry re-reads the winner's pointer map, so both
    leaves' stats files are current at the final version."""
    import threading

    from etl_demo_spark.io.manifest import (
        _hadoop_fs,
        _load_doc,
        merge_upsert_manifested,
        read_manifested,
    )

    path = str(tmp_path / "t")
    _mk(spark, path)
    errs = []

    def w(leaf: int, key: int):
        try:
            merge_upsert_manifested(
                spark, path,
                spark.createDataFrame(
                    [(key, str(leaf), 1)], "id BIGINT, dt STRING, v BIGINT"
                ),
                ["id"], ["dt"],
            )
        except Exception as e:  # pragma: no cover
            errs.append(e)

    t1 = threading.Thread(target=w, args=(0, 600000))
    t2 = threading.Thread(target=w, args=(3, 600001))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errs
    doc = _load_doc(*_hadoop_fs(spark, path), path)
    assert doc["version"] == 3
    for key in (600000, 600001):
        assert read_manifested(
            spark, path, prune_points={"id": key}
        ).filter(f"id = {key}").count() == 1


def test_split_same_leaf_append_race_rebases_and_merges_stats(
    spark, tmp_path, monkeypatch
):
    """Round-10 contract: same-leaf concurrent APPENDS on a SPLIT-stats
    table rebase with ZERO restaging — the rebase publish unions the two
    sides' per-leaf stats files. The merged stats file must be
    EQUIVALENT to a from-scratch recompute over the leaf's live files
    (min/max/rows exact), and cover every live file."""
    import etl_demo_spark.io.manifest as m

    path = str(tmp_path / "t")
    _mk(spark, path)  # v1, leaves dt=0..3, stats+bloom on id

    real_publish = m._publish_cas
    state = {"injected": False, "staged": None}

    def _stat_files():
        out = {}
        for f in glob.glob(f"{path}/dt=*/__v*/*"):
            st = os.stat(f)
            out[f] = (st.st_size, st.st_mtime_ns)
        return out

    def racing_publish(fs, jvm, p, data):
        if not state["injected"]:
            state["injected"] = True
            state["staged"] = _stat_files()
            m.append_manifested(
                spark, path,
                spark.createDataFrame(
                    [(700001, "1", 7)], "id BIGINT, dt STRING, v BIGINT"
                ),
            )
        return real_publish(fs, jvm, p, data)

    monkeypatch.setattr(m, "_publish_cas", racing_publish)
    base_stats = dict(m.occ_stats)
    m.append_manifested(
        spark, path,
        spark.createDataFrame(
            [(700002, "1", 8)], "id BIGINT, dt STRING, v BIGINT"
        ),
    )
    monkeypatch.setattr(m, "_publish_cas", real_publish)
    assert m.occ_stats["cas_lost"] == base_stats["cas_lost"] + 1
    assert m.occ_stats["rebased"] == base_stats["rebased"] + 1
    assert m.occ_stats["reran"] == base_stats["reran"], (
        "same-leaf append race on a split-stats table must NOT restage"
    )
    # zero bytes rewritten: the loser's staged files survive untouched
    after = _stat_files()
    for p, sig in state["staged"].items():
        assert after.get(p) == sig, f"staged file churned: {p}"

    # both rows visible, both prunable via the merged stats file
    fs, jvm = m._hadoop_fs(spark, path)
    doc = m._load_doc(fs, jvm, path)
    assert doc["version"] == 3  # winner v2, rebased loser v3
    for key in (700001, 700002):
        assert m.read_manifested(
            spark, path, prune_points={"id": key}
        ).filter(f"id = {key}").count() == 1

    # the merged leaf stats file covers EVERY live file of the leaf and
    # matches a from-scratch recompute on min/max/rows exactly
    leaf_vrels = [doc["partitions"]["dt=1"]] + list(
        (doc.get("extra_vrels") or {}).get("dt=1", [])
    )
    entries = m._read_leaf_stats(fs, jvm, path, doc["files_manifests"]["dt=1"])
    live_files = {
        f"dt=1/{os.path.basename(os.path.dirname(f))}/{os.path.basename(f)}"
        for vrel in leaf_vrels
        for f in glob.glob(f"{path}/{vrel}/*")
        if not os.path.basename(f).startswith(("_", "."))
    }
    assert set(entries) == live_files, (set(entries), live_files)
    recomputed = m._collect_file_stats(
        spark, "parquet", path, leaf_vrels, ["id"], None, None, 4
    )
    for p, st in recomputed.items():
        got = {k: v for k, v in entries[p].items() if not k.startswith("__bloom")}
        assert got == st, (p, got, st)


def test_append_racing_convert_rebases_without_restage(
    spark, tmp_path, monkeypatch
):
    """An embedded-stats data commit losing the CAS race to a
    `convert_to_split_stats` winner lands by REBASE: its staged files
    are reused byte-for-byte and its embedded stats entries are
    translated into per-leaf stats files — the layout migration never
    forces an ingest re-run."""
    import etl_demo_spark.io.manifest as m

    path = str(tmp_path / "t")
    _mk(spark, path, stats_split=False)  # v1: embedded stats
    real_publish = m._publish_cas
    state = {"injected": False, "staged": None}

    def racing(fs, jvm, p, data):
        if not state["injected"]:
            state["injected"] = True
            state["staged"] = {
                f: (os.path.getsize(f), os.path.getmtime(f))
                for f in glob.glob(f"{path}/dt=*/__v*/*.parquet")
            }
            assert m.convert_to_split_stats(spark, path) == 2
        return real_publish(fs, jvm, p, data)

    monkeypatch.setattr(m, "_publish_cas", racing)
    base_stats = dict(m.occ_stats)
    src = spark.createDataFrame(
        [(100000, "1", 7), (100001, "7", 8)], "id BIGINT, dt STRING, v BIGINT"
    )
    m.append_manifested(spark, path, src)  # dt=1 exists, dt=7 brand new
    assert m.occ_stats["cas_lost"] == base_stats["cas_lost"] + 1
    assert m.occ_stats["rebased"] == base_stats["rebased"] + 1
    assert m.occ_stats["reran"] == base_stats["reran"]

    # zero restage: every staged byte survived the race untouched
    after = {
        f: (os.path.getsize(f), os.path.getmtime(f))
        for f in glob.glob(f"{path}/dt=*/__v*/*.parquet")
    }
    for f, sig in state["staged"].items():
        assert after.get(f) == sig, f"staged file churned: {f}"

    fs, jvm = m._hadoop_fs(spark, path)
    doc = m._load_doc(fs, jvm, path)
    assert doc["version"] == 3
    assert doc.get("operation") == "APPEND"
    # the merged snapshot is SPLIT — embedded entries are gone, and the
    # loser's touched leaves (incl. the brand-new dt=7) have pointers
    assert "files" not in doc
    fm = doc["files_manifests"]
    assert set(fm) == set(doc["partitions"])
    got = m.read_manifested(spark, path)
    assert got.count() == 4002
    assert got.filter("id = 100001").count() == 1
    # the appended rows' stats (incl. bloom) survived the translation:
    # a point probe prunes to exactly the appended file
    pr = m.read_manifested(spark, path, prune_points={"id": 100000})
    assert pr.filter("id = 100000").count() == 1
    assert len(pr.inputFiles()) == 1
    # untouched leaves keep the winner's converted stats files verbatim
    conv = m._resolve_doc(fs, jvm, path, 2)["files_manifests"]
    for rel in set(conv) - {"dt=1", "dt=7"}:
        assert fm[rel] == conv[rel]


def test_convert_losing_race_to_append_reruns_cheaply(
    spark, tmp_path, monkeypatch
):
    """The mirror race: the CONVERT itself loses to a data commit. A
    layout flip has no three-way merge, so it re-runs — acceptable
    because a convert is metadata-only — and the converted table covers
    the winner's rows."""
    import etl_demo_spark.io.manifest as m

    path = str(tmp_path / "t")
    _mk(spark, path, stats_split=False)  # v1: embedded stats
    real_publish = m._publish_cas
    state = {"injected": False}

    def racing(fs, jvm, p, data):
        if not state["injected"]:
            state["injected"] = True
            m.append_manifested(
                spark,
                path,
                spark.createDataFrame(
                    [(200000, "2", 9)], "id BIGINT, dt STRING, v BIGINT"
                ),
            )
        return real_publish(fs, jvm, p, data)

    monkeypatch.setattr(m, "_publish_cas", racing)
    base_stats = dict(m.occ_stats)
    v = m.convert_to_split_stats(spark, path)
    assert v == 3  # append won v2, convert re-ran and landed v3
    assert m.occ_stats["reran"] == base_stats["reran"] + 1
    fs, jvm = m._hadoop_fs(spark, path)
    doc = m._load_doc(fs, jvm, path)
    assert "files" not in doc and set(doc["files_manifests"]) == set(
        doc["partitions"]
    )
    pr = m.read_manifested(spark, path, prune_points={"id": 200000})
    assert pr.filter("id = 200000").count() == 1
