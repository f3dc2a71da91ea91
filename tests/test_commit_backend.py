"""Pluggable commit backends (io/commit_backend.py): the manifest
publish CAS behind an interface, rehearsed with the conditional-PUT
shape rename-less object stores expose.

Contract under test: with a `ConditionalPutBackend` registered for a
table root, EVERY manifest publish is arbitrated by an If-None-Match
conditional PUT against the key store — exactly one concurrent
committer wins a version, losers re-resolve (and pure appends land by
zero-restage rebase), branches + write-audit-publish keep their
semantics, and readers never observe a torn manifest. The posix
link/rename path is never the decision point."""

from __future__ import annotations

import threading

import pytest
from pyspark.sql import functions as F

import etl_demo_spark.io.manifest as m
from etl_demo_spark.io.commit_backend import (
    ConditionalPutBackend,
    InMemoryKeyStore,
)


@pytest.fixture()
def backed_root(spark, tmp_path):
    root = str(tmp_path / "t")
    store = InMemoryKeyStore()
    m.set_commit_backend(root, ConditionalPutBackend(store))
    try:
        yield root, store
    finally:
        m.set_commit_backend(root, None)


def _rows(spark, vals):
    return spark.createDataFrame(
        [(i, p, float(v)) for i, p, v in vals],
        "id BIGINT, part STRING, val DOUBLE",
    )


def test_put_if_absent_is_atomic_under_threads():
    store = InMemoryKeyStore()
    wins = []
    barrier = threading.Barrier(16)

    def racer(i):
        barrier.wait(timeout=60)
        if store.put_if_absent("k", f"w{i}".encode()):
            wins.append(i)

    ts = [threading.Thread(target=racer, args=(i,)) for i in range(16)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert len(wins) == 1
    assert store.get("k") == f"w{wins[0]}".encode()
    assert store.conflicts == 15


def test_every_manifest_publish_routes_through_the_store(
    spark, backed_root
):
    root, store = backed_root
    m.write_manifested(_rows(spark, [(1, "a", 1.0), (2, "b", 2.0)]), root, "part")
    m.append_manifested(spark, root, _rows(spark, [(3, "a", 3.0)]))
    m.merge_upsert_manifested(
        spark, root, _rows(spark, [(2, "b", 99.0)]), ["id"], ["part"]
    )
    assert m.read_manifested(spark, root).count() == 3
    got = {r.id: r.val for r in m.read_manifested(spark, root).collect()}
    assert got == {1: 1.0, 2: 99.0, 3: 3.0}
    # versions 1..3 all live in the store — the PUT was the commit
    keys = store.keys()
    for v in (1, 2, 3):
        assert any(k.endswith(f"v{v:010d}.json") for k in keys), (v, keys)
    assert store.puts >= 3 and store.conflicts == 0


def test_threaded_occ_rebase_through_conditional_put(spark, backed_root):
    """The round-9 OCC core on the object-store commit path: two
    threads' appends race; lost conditional PUTs rebase with ZERO
    restaging, every commit lands, versions stay contiguous."""
    root, store = backed_root
    m.write_manifested(_rows(spark, [(0, "a", 0.0), (1, "b", 0.0)]), root, "part")
    base_stats = dict(m.occ_stats)
    n_per = 4
    errors: list[Exception] = []
    barrier = threading.Barrier(2)

    def writer(wid):
        barrier.wait(timeout=120)
        for seq in range(n_per):
            try:
                m.append_manifested(
                    spark, root,
                    _rows(spark, [(100 * wid + seq, "a", 1.0),
                                  (100 * wid + seq, "b", 1.0)]),
                )
            except Exception as e:  # pragma: no cover
                errors.append(e)

    ts = [threading.Thread(target=writer, args=(w,)) for w in (1, 2)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=600)
    assert not errors
    # all 8 appends landed: 1 seed + 8 = 9 contiguous versions
    fs, jvm = m._hadoop_fs(spark, root)
    versions = m._list_manifest_versions(fs, jvm, root)
    assert versions == list(range(1, 10))
    assert m.read_manifested(spark, root).count() == 2 + 2 * 2 * n_per
    # pure appends never restage, even under the conditional-PUT CAS
    assert m.occ_stats["reran"] == base_stats["reran"]
    assert (
        m.occ_stats["rebased"] - base_stats["rebased"]
        == m.occ_stats["cas_lost"] - base_stats["cas_lost"]
    )
    # the store arbitrated every version exactly once; its 412s are the
    # lost races
    keys = store.keys()
    for v in versions:
        assert any(k.endswith(f"v{v:010d}.json") for k in keys)
    # every attempt-level lost race is a store 412, but the store can see
    # MORE 412s than occ_stats["cas_lost"]: _rebase_publish loops
    # internally when yet another commit lands during the rebase window,
    # and those inner lost PUTs are store conflicts without a cas_lost
    # increment (cas_lost counts attempt_fn-level losses only). Equality
    # here was a race: it held only when no third commit interleaved a
    # rebase. Upper bound: each of the `rebased` transactions may lose at
    # most _COMMIT_RETRIES − 1 inner PUTs on top of its attempt-level one.
    cas_delta = m.occ_stats["cas_lost"] - base_stats["cas_lost"]
    rebased_delta = m.occ_stats["rebased"] - base_stats["rebased"]
    assert store.conflicts >= cas_delta
    assert store.conflicts <= cas_delta + rebased_delta * (m._COMMIT_RETRIES - 1)


def test_wap_branch_publish_through_conditional_put(spark, backed_root):
    root, store = backed_root
    m.write_manifested(_rows(spark, [(1, "a", 1.0), (2, "b", 2.0)]), root, "part")
    m.branch_create(spark, root, "wap")
    with m.use_branch(spark, root, "wap"):
        m.append_manifested(spark, root, _rows(spark, [(10, "a", -5.0)]))
    # main untouched; the branch commit was arbitrated by the store too
    assert m.read_manifested(spark, root).count() == 2
    assert any("/branches/wap/" in k for k in store.keys())
    with pytest.raises(ValueError, match="failed expectations"):
        m.branch_fastforward(
            spark, root, "wap", expectations={"non_negative": "val >= 0"}
        )
    assert m.read_manifested(spark, root).count() == 2  # still gated
    with m.use_branch(spark, root, "wap"):
        m.update_where_manifested(
            spark, root, {"val": F.lit(5.0)}, F.col("id") == 10, ["part"]
        )
    v = m.branch_fastforward(
        spark, root, "wap", expectations={"non_negative": "val >= 0"}
    )
    got = {r.id: r.val for r in m.read_manifested(spark, root).collect()}
    assert got == {1: 1.0, 2: 2.0, 10: 5.0}
    assert any(k.endswith(f"v{v:010d}.json") for k in store.keys())
