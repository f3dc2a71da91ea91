"""Continuous MV maintenance: commit-log stream → mv_refresh per batch.

Contract under test: the tablestream commits mode delivers one metadata
row per base commit (no data files read); run_mv_stream_refresh folds
pending commits into the MV exactly once (replays are no-ops via the
refresh intent machinery); the view equals the batch aggregate after
every drain."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from etl_demo_spark.io.manifest import (
    append_manifested,
    manifest_versions,
    write_manifested,
)
from etl_demo_spark.io.table_stream import register_table_stream_source
from etl_demo_spark.mv import mv_read, mv_create, mv_watermark, run_mv_stream_refresh


@pytest.fixture(scope="module")
def mvs_root():
    root = tempfile.mkdtemp(prefix="mv_stream_")
    yield root
    shutil.rmtree(root, ignore_errors=True)


def _rows(spark, ids, part="a", val=2.0):
    return spark.createDataFrame(
        [(i, part, float(val)) for i in ids],
        "id BIGINT, part STRING, val DOUBLE",
    )


def _expect(spark, base):
    from etl_demo_spark.io.manifest import read_manifested

    return {
        r["part"]: (r["n"], r["s"])
        for r in read_manifested(spark, base)
        .groupBy("part")
        .agg(F.count("*").alias("n"), F.sum("val").alias("s"))
        .collect()
    }


def _got(spark, mv):
    return {
        r["part"]: (r["n"], r["s"]) for r in mv_read(spark, mv).collect()
    }


def test_commits_mode_streams_metadata_rows(spark, mvs_root):
    register_table_stream_source(spark)
    base = f"{mvs_root}/b0"
    write_manifested(_rows(spark, range(3)), base, "part")  # v1
    append_manifested(spark, base, _rows(spark, [10], "b"))  # v2
    sink, ck = f"{mvs_root}/b0_sink", f"{mvs_root}/b0_ck"
    q = (
        spark.readStream.format("tablestream")
        .option("path", base)
        .option("mode", "commits")
        .load()
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        r["version"]: r["operation"]
        for r in spark.read.parquet(sink).collect()
    }
    assert got == {1: "CREATE", 2: "APPEND"}
    assert spark.read.parquet(sink).filter("committed_at_ms IS NULL").count() == 0


def test_stream_refresh_keeps_view_fresh_and_replay_is_noop(spark, mvs_root):
    base, mv, ck = f"{mvs_root}/b1", f"{mvs_root}/mv1", f"{mvs_root}/ck1"
    write_manifested(_rows(spark, range(0, 6)), base, "part")  # v1
    mv_create(spark, base, mv, ["part"], {"n": ("count", None), "s": ("sum", "val")})
    append_manifested(spark, base, _rows(spark, range(100, 104), "b"))  # v2
    append_manifested(spark, base, _rows(spark, range(200, 202)))  # v3

    stats = run_mv_stream_refresh(spark, mv, ck)
    assert len(stats) >= 1 and stats[-1]["mode"] in ("incremental", "full")
    assert mv_watermark(spark, mv) == manifest_versions(spark, base)[-1]
    assert _got(spark, mv) == _expect(spark, base)

    # nothing new: the drain delivers no commits, refresh never runs
    stats = run_mv_stream_refresh(spark, mv, ck)
    assert stats == []

    # one more commit, same checkpoint: exactly one more refresh
    append_manifested(spark, base, _rows(spark, [300], "c", val=5.0))  # v4
    stats = run_mv_stream_refresh(spark, mv, ck)
    assert len(stats) == 1
    assert _got(spark, mv) == _expect(spark, base)
    assert "c" in _got(spark, mv)


def test_stream_refresh_survives_fresh_checkpoint_replay(spark, mvs_root):
    """A FRESH checkpoint re-offers every commit from v1; mv_refresh's
    watermark makes the replayed notifications no-ops — the view is not
    double-counted."""
    base, mv = f"{mvs_root}/b2", f"{mvs_root}/mv2"
    write_manifested(_rows(spark, range(0, 4)), base, "part")
    mv_create(spark, base, mv, ["part"], {"n": ("count", None), "s": ("sum", "val")})
    append_manifested(spark, base, _rows(spark, [50, 51], "b"))
    run_mv_stream_refresh(spark, mv, f"{mvs_root}/ck2a")
    before = _got(spark, mv)
    stats = run_mv_stream_refresh(spark, mv, f"{mvs_root}/ck2b")  # fresh ck
    assert all(s["mode"] == "noop" for s in stats)
    assert _got(spark, mv) == before == _expect(spark, base)
