"""Single-pass INLINE stats (`_write_staging_with_stats`): the staged
files and their per-file stats come out of one job. These tests pin the
contract that made the change safe — entries are byte-identical to the
legacy post-write scan (`_collect_file_stats`) on the same data, with
bloom bitsets bit-identical after folding to the common width (sizing
may differ only because inline ndv is exact where the scan's is
approximate)."""

from __future__ import annotations

import datetime
import decimal
import json
import math

import pytest
from pyspark.sql import functions as F

STATS_COLS = ["k", "x", "s", "d", "ts", "dec"]
BLOOM_COLS = ["k", "s"]


def _fixture_df(spark):
    rows = []
    for i in range(400):
        rows.append(
            (
                # negatives, and a null every 13th row
                None if i % 13 == 0 else (i - 200) * 7,
                # NaN island + nulls in a float col
                float("nan") if 100 <= i < 110 else (
                    None if i % 17 == 0 else (i - 200) * 0.25
                ),
                # unicode + empty-ish strings
                ["alpha", "Ωmega", "zzz", "", "héllo"][i % 5] + str(i % 23),
                datetime.date(2026, 1 + i % 12, 1 + i % 28),
                datetime.datetime(2026, 1, 1 + i % 28, i % 24, i % 60),
                decimal.Decimal(i - 200) + decimal.Decimal("0.75"),
                f"d{i % 3}",
            )
        )
    return spark.createDataFrame(
        rows,
        "k INT, x DOUBLE, s STRING, d DATE, ts TIMESTAMP, "
        "dec DECIMAL(10,2), dt STRING",
    ).repartition(1)  # one task -> one file per leaf on BOTH paths


def _entries_by_leaf(spark, root):
    from etl_demo_spark.io.manifest import _hadoop_fs, _load_doc

    doc = _load_doc(*_hadoop_fs(spark, root), root)
    out = {}
    for p, st in doc["files"].items():
        leaf = p.split("/")[0]
        assert leaf not in out, f"expected one file per leaf, extra: {p}"
        out[leaf] = st
    return out


def _write_both(spark, tmp_path, df, **kw):
    from etl_demo_spark.io.manifest import write_manifested

    a, b = str(tmp_path / "legacy"), str(tmp_path / "inline")
    write_manifested(df, a, "dt", stats_cols=STATS_COLS,
                     bloom_cols=BLOOM_COLS, stats_inline=False, **kw)
    write_manifested(df, b, "dt", stats_cols=STATS_COLS,
                     bloom_cols=BLOOM_COLS, stats_inline=True, **kw)
    return _entries_by_leaf(spark, a), _entries_by_leaf(spark, b)


def _strip_blooms(entry):
    return {k: v for k, v in entry.items() if not k.startswith("__bloom_")}


def test_minmax_rows_byte_identical(spark, tmp_path):
    legacy, inline = _write_both(spark, tmp_path, _fixture_df(spark))
    assert set(legacy) == set(inline)
    for leaf in legacy:
        a = json.dumps(_strip_blooms(legacy[leaf]), sort_keys=True)
        b = json.dumps(_strip_blooms(inline[leaf]), sort_keys=True)
        assert a == b, f"{leaf}: {a} != {b}"
        # the NaN island must surface Spark's ordering: max NaN, min real
        assert math.isnan(json.loads(b)["x"][1])
        assert not math.isnan(json.loads(b)["x"][0])


def test_adaptive_blooms_fold_identical(spark, tmp_path):
    from etl_demo_spark.io.manifest import _fold_words, _unpack_words

    legacy, inline = _write_both(spark, tmp_path, _fixture_df(spark))
    for leaf in legacy:
        for c in BLOOM_COLS:
            wa = _unpack_words(legacy[leaf][f"__bloom_{c}"])
            wb = _unpack_words(inline[leaf][f"__bloom_{c}"])
            # widths may differ only through exact-vs-approx ndv sizing;
            # the power-of-two fold identity makes them comparable
            w = min(len(wa), len(wb)) * 64
            fa = [x & 0xFFFFFFFFFFFFFFFF for x in _fold_words(wa, w)]
            fb = [x & 0xFFFFFFFFFFFFFFFF for x in _fold_words(wb, w)]
            assert fa == fb, f"{leaf}.{c}"


def test_legacy_fixed_blooms_byte_identical(spark, tmp_path):
    legacy, inline = _write_both(
        spark, tmp_path, _fixture_df(spark), bloom_bits=1024
    )
    for leaf in legacy:
        assert _strip_blooms(legacy[leaf]) == _strip_blooms(inline[leaf])
        for c in BLOOM_COLS:
            # fixed width: the signed int64 word lists match exactly
            assert legacy[leaf][f"__bloom_{c}"] == inline[leaf][f"__bloom_{c}"]


def test_append_inline_matches_scan(spark, tmp_path):
    from etl_demo_spark.io.manifest import append_manifested, write_manifested

    df = _fixture_df(spark)
    base = df.where("k IS NULL OR k < 0")
    extra = df.where("k >= 0")
    a, b = str(tmp_path / "legacy"), str(tmp_path / "inline")
    for root, inline in ((a, False), (b, True)):
        write_manifested(base, root, "dt", stats_cols=STATS_COLS,
                         bloom_cols=BLOOM_COLS, stats_inline=inline)
        append_manifested(spark, root, extra, stats_inline=inline)
    # base + append vrels both carry entries; compare whole docs by kind
    from etl_demo_spark.io.manifest import _hadoop_fs, _load_doc

    da = _load_doc(*_hadoop_fs(spark, a), a)["files"]
    db = _load_doc(*_hadoop_fs(spark, b), b)["files"]
    assert len(da) == len(db)

    def by_vrel_kind(d):
        out = {}
        for p, st in d.items():
            leaf, vrel, _ = p.split("/")
            kind = "append" if "-" in vrel else "base"
            out[(leaf, kind)] = st
        return out

    ka, kb = by_vrel_kind(da), by_vrel_kind(db)
    assert set(ka) == set(kb)
    for key in ka:
        assert json.dumps(_strip_blooms(ka[key]), sort_keys=True) == json.dumps(
            _strip_blooms(kb[key]), sort_keys=True
        ), key


def test_merge_inline_roundtrip_and_stats(spark, tmp_path):
    from etl_demo_spark.io.manifest import (
        merge_upsert_manifested,
        read_manifested,
        write_manifested,
    )

    df = _fixture_df(spark)
    root = str(tmp_path / "t")
    write_manifested(df, root, "dt", stats_cols=STATS_COLS,
                     bloom_cols=BLOOM_COLS, stats_inline=True)
    upd = df.where("k IS NOT NULL AND k % 5 = 0").withColumn(
        "x", F.col("x") + 1000.0
    )
    merge_upsert_manifested(spark, root, upd, ["k"], "dt", stats_inline=True)
    back = read_manifested(spark, root)
    assert back.count() == df.count()
    # NaN compares greater than any number in Spark, so exclude it and
    # the null-x rows the +1000 can't lift
    want = upd.where("x IS NOT NULL AND NOT isnan(x)").count()
    assert back.where("x > 900 AND NOT isnan(x)").count() == want
    ents = _entries_by_leaf(spark, root)
    # merged stats reflect the update (the +1000 rows lift every max)
    for leaf, st in ents.items():
        assert st["x"][1] > 900 or math.isnan(st["x"][1])


def test_inline_prune_points_and_ranges(spark, tmp_path):
    from etl_demo_spark.io.manifest import read_manifested, write_manifested

    df = _fixture_df(spark).where("k IS NOT NULL")
    root = str(tmp_path / "t")
    write_manifested(df.repartition(8, "k"), root, "dt",
                     stats_cols=["k"], bloom_cols=["s"], stats_inline=True)
    probe = df.select("k", "s").first()
    got = read_manifested(
        spark, root, prune_points={"s": probe["s"]}
    ).where(F.col("s") == probe["s"])
    want = df.where(F.col("s") == probe["s"]).count()
    assert got.count() == want  # bloom prune never loses a matching row
    rng = read_manifested(spark, root, prune_ranges={"k": (0, 50)}).where(
        "k BETWEEN 0 AND 50"
    )
    assert rng.count() == df.where("k BETWEEN 0 AND 50").count()


def test_inline_split_layout_and_hidden_partitioning(spark, tmp_path):
    from etl_demo_spark.io.manifest import (
        append_manifested,
        read_manifested,
        write_manifested,
    )

    df = _fixture_df(spark)
    root = str(tmp_path / "t")
    write_manifested(
        df.drop("dt"), root, stats_cols=["k"], bloom_cols=["s"],
        partition_transforms={"m": "months(d)"},
        stats_split=True, stats_inline=True,
    )
    n0 = read_manifested(spark, root).count()
    assert n0 == df.count()
    append_manifested(spark, root, df.drop("dt").limit(20), stats_inline=True)
    assert read_manifested(spark, root).count() == n0 + 20
    pruned = read_manifested(
        spark, root, prune_source={"d": (datetime.date(2026, 3, 1),
                                         datetime.date(2026, 3, 31))}
    )
    want = df.where("d >= '2026-03-01' AND d <= '2026-03-31'").count()
    assert pruned.where("d >= '2026-03-01' AND d <= '2026-03-31'").count() >= want


def test_stats_inline_true_raises_when_unsupported(spark, tmp_path):
    from etl_demo_spark.io.manifest import write_manifested

    df = _fixture_df(spark).withColumn("arr", F.array(F.col("k")))
    with pytest.raises(ValueError, match="stats_inline=True"):
        write_manifested(
            df, str(tmp_path / "t"), "dt",
            stats_cols=["arr"], stats_inline=True,
        )
