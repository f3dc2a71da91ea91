"""Source/sink coverage (X-1, O-17, O-24): parquet/csv/json round-trips,
partitioned writes, SQLite append semantics."""

from __future__ import annotations

import sqlite3

from pyspark.sql import functions as F

from etl_demo_spark.io.sinks import write_parquet, write_sqlite_append
from etl_demo_spark.io.sources import read_csv, read_json, read_parquet

SF0001 = "/root/testdata/sf0.001"


def test_parquet_roundtrip_partitioned(spark, tmp_path):
    df = read_parquet(spark, f"{SF0001}/orders.parquet")
    out = str(tmp_path / "orders_part")
    write_parquet(df.withColumn("year", F.year("o_orderdate")), out, partition_by=["year"])
    back = spark.read.parquet(out)
    assert back.count() == df.count()
    # partition pruning: a year filter must scan only that partition's files
    one_year = back.filter(F.col("year") == 1997)
    plan = one_year._jdf.queryExecution().executedPlan().toString()
    assert one_year.count() > 0
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "year" in m.group(1), plan[:1500]


def test_csv_roundtrip(spark, tmp_path):
    df = read_parquet(spark, f"{SF0001}/nation.parquet")
    out = str(tmp_path / "nation_csv")
    df.write.option("header", "true").csv(out)
    back = read_csv(spark, out)
    assert back.count() == 25
    assert set(back.columns) == set(df.columns)


def test_json_roundtrip(spark, tmp_path):
    df = read_parquet(spark, f"{SF0001}/region.parquet")
    out = str(tmp_path / "region_json")
    df.write.json(out)
    back = read_json(spark, out)
    assert {(r["r_regionkey"], r["r_name"]) for r in back.collect()} == {
        (r["r_regionkey"], r["r_name"]) for r in df.collect()
    }


def test_sqlite_append_accumulates(spark, tmp_path):
    """O-17: append mode accumulates across runs (the reference's
    documented duplicate-on-rerun behavior, README.md:29)."""
    df = read_parquet(spark, f"{SF0001}/region.parquet")
    db = str(tmp_path / "out.db")
    assert write_sqlite_append(df, db, "t") == 5
    assert write_sqlite_append(df, db, "t") == 5
    con = sqlite3.connect(db)
    assert con.execute("SELECT COUNT(*) FROM t").fetchone()[0] == 10
    con.close()


def test_jdbc_write_roundtrip_derby(spark, tmp_path):
    """O-17 cluster-grade twin: the trades aggregate written through the
    distributed JDBC sink (embedded Derby, ships with Spark) must read
    back with the same 545 rows and values as the SQLite sink writes —
    and append mode must accumulate like to_sql(if_exists='append')."""
    from etl_demo_spark.io.sinks import read_jdbc, write_jdbc
    from etl_demo_spark.pipelines.weekly_trades import run_etl

    res = run_etl(spark, "/root/reference/trades (1) (2) (1).csv")
    agg = res.aggregated
    url = f"jdbc:derby:{tmp_path}/derbydb;create=true"

    write_jdbc(agg, url, "agg_trades_weekly", num_partitions=4)
    back = read_jdbc(spark, url, "agg_trades_weekly")
    assert back.count() == agg.count() == 545

    key = ["week_start_date", "client_type", "user_id", "symbol"]

    def snap(df):
        return {
            tuple(str(r[c]) for c in key): tuple(
                None if r[c] is None else round(float(r[c]), 6)
                for c in ("total_volume", "total_pnl")
            )
            for r in df.collect()
        }

    assert snap(back) == snap(agg)

    # append accumulates (reference's duplicate-on-rerun behavior)
    write_jdbc(agg, url, "agg_trades_weekly", num_partitions=4)
    assert read_jdbc(spark, url, "agg_trades_weekly").count() == 1090
    agg.unpersist()


def test_save_charts_writes_real_pngs(spark, tmp_path):
    """O-26: the chart sink writes REAL PNGs with or without matplotlib —
    valid signature/IHDR, chart-sized, and actually painted (non-white
    pixels from the line and the stacked bars)."""
    import struct
    import zlib

    import numpy as np

    from etl_demo_spark.io.png import decode_png_size
    from etl_demo_spark.pipelines.weekly_trades import run_etl
    from etl_demo_spark.report import save_charts

    res = run_etl(spark, "/root/reference/trades (1) (2) (1).csv")
    paths = save_charts(res.aggregated, str(tmp_path / "charts"))
    assert [p.rsplit("/", 1)[-1] for p in paths] == [
        "weekly_volume.png", "weekly_counts.png",
    ]

    def painted_fraction(path: str) -> float:
        """Decode filter-0 scanlines and measure non-white coverage."""
        with open(path, "rb") as f:
            data = f.read()
        assert data[:8] == b"\x89PNG\r\n\x1a\n"
        w, h = struct.unpack(">II", data[16:24])
        # concatenate IDAT payloads
        idat, off = b"", 8
        while off < len(data):
            ln, tag = struct.unpack(">I4s", data[off:off + 8])
            if tag == b"IDAT":
                idat += data[off + 8: off + 8 + ln]
            off += 12 + ln
        raw = zlib.decompress(idat)
        stride = 1 + w * 3
        rows = [raw[i * stride + 1:(i + 1) * stride] for i in range(h)]
        img = np.frombuffer(b"".join(rows), dtype=np.uint8).reshape(h, w, 3)
        return float((img != 255).any(axis=2).mean())

    for p in paths:
        w, h = decode_png_size(p)
        assert (w, h) == (800, 420)
        assert painted_fraction(p) > 0.005, p  # axes + marks, not blank


def test_write_excel_emits_real_xlsx(spark, tmp_path):
    """O-24: without openpyxl the built-in SpreadsheetML writer still
    produces a real .xlsx whose sheet1 round-trips the report values."""
    from etl_demo_spark.io.sinks import write_excel
    from etl_demo_spark.io.xlsx import read_xlsx_values
    from etl_demo_spark.pipelines.weekly_trades import run_etl

    res = run_etl(spark, "/root/reference/trades (1) (2) (1).csv")
    out = str(tmp_path / "top_clients.xlsx")
    written = write_excel(res.report, out)
    assert written.endswith(".xlsx")
    header, rows = read_xlsx_values(written)
    assert header == ["user_id", "total_volume", "total_pnl",
                      "client_type", "top_label", "rank"]
    assert len(rows) == 6


def test_xlsx_datasource_reads_reference_artifact(spark):
    """spark.read.format("xlsx") loads the reference's own report
    workbook with inferred numeric/string types, matching the stdlib
    parser cell-for-cell."""
    from etl_demo_spark.io.xlsx import read_xlsx_values
    from etl_demo_spark.io.xlsx_source import register_xlsx_source

    register_xlsx_source(spark)
    path = "/root/reference/output/top_clients.xlsx"
    df = spark.read.format("xlsx").load(path)
    header, rows = read_xlsx_values(path)
    assert df.columns == [str(h) for h in header]
    assert [f.dataType.simpleString() for f in df.schema.fields] == [
        "double", "double", "double", "string", "string", "double",
    ]
    got = sorted(tuple(r) for r in df.collect())
    want = sorted(
        tuple(float(v) if isinstance(v, (int, float)) else str(v) for v in r)
        for r in rows
    )
    assert got == want


def test_xlsx_datasource_round_trip_and_multi_file(spark, tmp_path):
    """write_excel output reads back through the xlsx source; a directory
    of workbooks scans one partition per file; a header mismatch names
    the offending file instead of misaligning columns."""
    import pytest

    from etl_demo_spark.io.sinks import write_excel
    from etl_demo_spark.io.xlsx_source import register_xlsx_source
    from etl_demo_spark.pipelines.weekly_trades import run_etl

    register_xlsx_source(spark)
    res = run_etl(spark, "/root/reference/trades (1) (2) (1).csv")
    d = tmp_path / "reports"
    d.mkdir()
    write_excel(res.report, str(d / "week1.xlsx"))
    write_excel(res.report, str(d / "week2.xlsx"))
    df = spark.read.format("xlsx").load(str(d))
    assert df.rdd.getNumPartitions() == 2
    assert df.count() == 12  # 6 report rows x 2 files
    single = spark.read.format("xlsx").load(str(d / "week1.xlsx"))
    assert sorted(map(tuple, single.collect())) == sorted(
        tuple(r) for r in res.report.withColumn(
            "user_id", res.report.user_id.cast("double")
        ).withColumn("rank", res.report["rank"].cast("double")).collect()
    )

    # header drift across files must fail loudly, naming the offender
    # ("bad.xlsx" sorts first so it donates the schema; the week files
    # then mismatch — either way the error carries a path + both headers)
    write_excel(res.report.withColumnRenamed("rank", "position"), str(d / "bad.xlsx"))
    with pytest.raises(Exception, match="does not match the schema header"):
        spark.read.format("xlsx").load(str(d)).collect()


def test_export_report_add_timestamp_stamps_filename(spark, tmp_path):
    """O-24 add_timestamp parity (`etl_weekly_trades.py:210-212`): the
    report filename gains a %Y%m%d_%H%M%S_ prefix; content is unchanged
    vs the unstamped export."""
    from datetime import datetime

    from etl_demo_spark.io.xlsx import read_xlsx_values
    from etl_demo_spark.pipelines.weekly_trades import run_etl
    from etl_demo_spark.report import export_report

    res = run_etl(spark, "/root/reference/trades (1) (2) (1).csv")
    fixed = datetime(2026, 8, 14, 12, 34, 56)
    plain = export_report(res.report, str(tmp_path / "top_clients.xlsx"))
    stamped = export_report(
        res.report,
        str(tmp_path / "top_clients.xlsx"),
        add_timestamp=True,
        _now=fixed,
    )
    assert stamped == str(tmp_path / "20260814_123456_top_clients.xlsx")
    assert read_xlsx_values(stamped) == read_xlsx_values(plain)


def test_report_xlsx_value_parity_with_reference_artifact(spark, tmp_path):
    """The engine's .xlsx report carries the SAME cell values as the
    reference's golden ``output/top_clients.xlsx`` (openpyxl-written),
    both parsed with the same SpreadsheetML reader."""
    from etl_demo_spark.io.sinks import write_excel
    from etl_demo_spark.io.xlsx import read_xlsx_values
    from etl_demo_spark.pipelines.weekly_trades import run_etl

    ref_header, ref_rows = read_xlsx_values("/root/reference/output/top_clients.xlsx")
    res = run_etl(spark, "/root/reference/trades (1) (2) (1).csv")
    out = write_excel(res.report, str(tmp_path / "mine.xlsx"))
    my_header, my_rows = read_xlsx_values(out)
    assert my_header == ref_header
    assert len(my_rows) == len(ref_rows) == 6

    def norm(rows):
        # rank order within each metric is the row identity; floats to 6dp
        return {
            (r[0], r[4], r[5]): (round(r[1], 6), round(r[2], 6), r[3])
            for r in rows
        }

    assert norm(my_rows) == norm(ref_rows)


def test_orc_roundtrip(spark, tmp_path):
    from etl_demo_spark.io.sinks import write_orc
    from etl_demo_spark.io.sources import read_orc

    df = read_parquet(spark, f"{SF0001}/supplier.parquet")
    out = str(tmp_path / "supplier_orc")
    write_orc(df, out)
    back = read_orc(spark, out)
    assert back.count() == df.count()
    assert back.schema == df.schema


def test_parquet_schema_drift_append_reads_merged(spark, tmp_path):
    """The reference's documented failure (append a reduced-schema frame
    after a full one → corrupt SQLite table) must be survivable here:
    mergeSchema reads the union schema with NULLs for missing columns."""
    from etl_demo_spark.io.sources import read_parquet_merged

    out = str(tmp_path / "drifting")
    full = spark.createDataFrame(
        [(1, 10.0, 0.5)], "user_id long, total_volume double, total_pnl double"
    )
    reduced = spark.createDataFrame(
        [(2, 20.0)], "user_id long, total_volume double"
    )
    write_parquet(full, out, mode="overwrite")
    write_parquet(reduced, out, mode="append")
    back = read_parquet_merged(spark, out)
    assert set(back.columns) == {"user_id", "total_volume", "total_pnl"}
    rows = {r["user_id"]: r for r in back.collect()}
    assert rows[2]["total_pnl"] is None
    assert rows[1]["total_pnl"] == 0.5


def test_text_roundtrip_line_and_wholefile(spark, tmp_path):
    """Text source/sink: line mode round-trips rows; whole-file mode
    yields one row per shard file with newlines preserved."""
    from pyspark.sql import functions as F

    from etl_demo_spark.io.sinks import write_text
    from etl_demo_spark.io.sources import read_text

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    lines = docs.select(F.regexp_replace("text", r"[\r\n]", " ").alias("value"))
    out = str(tmp_path / "txt")
    write_text(lines.repartition(4), out)

    back = read_text(spark, out)
    assert back.columns == ["value"]
    assert back.count() == lines.count()
    assert {r["value"] for r in back.collect()} == {r["value"] for r in lines.collect()}

    whole = read_text(spark, out, whole_file=True)
    assert whole.count() == 4  # one row per shard file
    total_lines = sum(
        len(r["value"].rstrip("\n").split("\n")) for r in whole.collect()
    )
    assert total_lines == lines.count()


def test_compaction_and_file_inventory(spark, tmp_path):
    """Many small files compact into the estimated count with identical
    rows; file_inventory reports one row per physical file."""
    from etl_demo_spark.io.layout import compact_parquet, file_inventory

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    frag = str(tmp_path / "fragmented")
    li.repartition(24).write.mode("overwrite").parquet(frag)

    inv = file_inventory(spark.read.parquet(frag)).collect()
    assert len(inv) == 24
    assert sum(r["n_rows"] for r in inv) == li.count()

    dst = str(tmp_path / "compacted")
    n = compact_parquet(spark, frag, dst, target_file_bytes=10**12)
    assert n == 1
    back = spark.read.parquet(dst)
    assert back.count() == li.count()
    assert len(file_inventory(back).collect()) == 1


def test_sqlite_source_reads_reference_artifact(spark):
    """The custom Python DataSource reads the reference's golden SQLite
    artifact back through Spark: full 545 rows across multiple rowid-range
    partitions, schema mapped from the declared DDL types, and values
    agreeing with a direct sqlite3 scan."""
    import sqlite3

    from etl_demo_spark.io.sqlite_source import register_sqlite_source

    register_sqlite_source(spark)
    path = "/root/reference/agg_result.db"
    df = (
        spark.read.format("sqlite")
        .option("path", path)
        .option("table", "agg_trades_weekly")
        .option("numPartitions", "5")
        .load()
    )
    assert df.rdd.getNumPartitions() == 5
    rows = df.collect()
    assert len(rows) == 545
    schema = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    assert schema["week_start_date"] == "date"
    assert schema["user_id"] == "bigint"
    assert schema["total_volume"] == "double"
    assert schema["client_type"] == "string"

    with sqlite3.connect(path) as con:
        want_vol = con.execute(
            "SELECT ROUND(SUM(total_volume), 2) FROM agg_trades_weekly"
        ).fetchone()[0]
        want_weeks = con.execute(
            "SELECT COUNT(DISTINCT week_start_date) FROM agg_trades_weekly"
        ).fetchone()[0]
    got_vol = round(sum(r.total_volume for r in rows), 2)
    assert got_vol == want_vol
    assert len({r.week_start_date for r in rows}) == want_weeks


def test_sqlite_source_roundtrip_with_engine_sink(spark, tmp_path):
    """Write with the engine's SQLite sink, read back with the sqlite
    source: the reference's append-accumulation workflow becomes fully
    queryable."""
    from etl_demo_spark.io.sinks import write_sqlite_append
    from etl_demo_spark.io.sqlite_source import register_sqlite_source

    register_sqlite_source(spark)
    db = str(tmp_path / "rt.db")
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5)], "id long, s string, v double"
    )
    write_sqlite_append(df, db, "t")
    write_sqlite_append(df, db, "t")  # append semantics accumulate
    back = (
        spark.read.format("sqlite")
        .option("path", db).option("table", "t").load()
    )
    assert back.count() == 4
    assert {r.s for r in back.collect()} == {"a", "b"}


def test_xml_roundtrip(spark, tmp_path):
    """Spark 4 native XML source round-trips typed rows (X-1 breadth)."""
    out = str(tmp_path / "x")
    df = spark.createDataFrame([(1, "a", 1.5), (2, "b", 2.5)], "id long, s string, v double")
    df.write.format("xml").option("rootTag", "rows").option("rowTag", "row").mode(
        "overwrite"
    ).save(out)
    back = spark.read.format("xml").option("rowTag", "row").load(out)
    assert sorted((r.id, r.s, r.v) for r in back.collect()) == [
        (1, "a", 1.5), (2, "b", 2.5),
    ]


def test_sqlite_source_maps_wider_declared_types(spark, tmp_path):
    """SMALLINT/BOOLEAN/DECIMAL/CHAR/DATETIME declarations map to usable
    Spark types (prefix matching, DATETIME before DATE), and the values
    round-trip."""
    import sqlite3

    from etl_demo_spark.io.sqlite_source import register_sqlite_source

    register_sqlite_source(spark)
    db = str(tmp_path / "t.db")
    with sqlite3.connect(db) as con:
        con.execute(
            "CREATE TABLE w (a SMALLINT, b BOOLEAN, c DECIMAL(10,2), "
            "d CHAR(8), e DATETIME)"
        )
        con.execute(
            "INSERT INTO w VALUES (7, 1, 2.5, 'hi', '2024-03-01 12:30:00')"
        )
    df = (
        spark.read.format("sqlite")
        .option("path", db).option("table", "w").load()
    )
    schema = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    assert schema == {
        "a": "bigint", "b": "bigint", "c": "decimal(10,2)",
        "d": "string", "e": "timestamp",
    }
    r = df.collect()[0]
    from decimal import Decimal

    assert (r.a, r.b, r.c, r.d) == (7, 1, Decimal("2.50"), "hi")
    assert r.e.year == 2024 and r.e.hour == 12


def test_sqlite_source_bare_numeric_stays_double(spark, tmp_path):
    """DECIMAL(p,s) is exact, but bare NUMERIC/DECIMAL (no precision) stays
    double — SQLite stores those as REAL so no exactness exists to keep."""
    import sqlite3

    from etl_demo_spark.io.sqlite_source import _table_schema

    db = str(tmp_path / "n.db")
    with sqlite3.connect(db) as con:
        con.execute("CREATE TABLE n (a NUMERIC, b DECIMAL, c NUMERIC(12,4))")
    schema = {f.name: f.dataType.simpleString() for f in _table_schema(db, "n").fields}
    assert schema == {"a": "double", "b": "double", "c": "decimal(12,4)"}


def test_sqlite_source_pushes_filters_down(spark, tmp_path):
    """Supported predicates are translated into the SQLite WHERE clause
    (reader-level check) and the end-to-end filtered read returns exactly
    the matching rows; unsupported shapes are yielded back to Spark."""
    import sqlite3

    from pyspark.sql.datasource import EqualTo, In, IsNotNull, StringContains
    from etl_demo_spark.io.sqlite_source import SQLiteReader, register_sqlite_source
    from pyspark.sql import functions as F

    db = str(tmp_path / "pf.db")
    with sqlite3.connect(db) as con:
        con.execute("CREATE TABLE t (id INTEGER, grp TEXT, v REAL)")
        con.executemany(
            "INSERT INTO t VALUES (?, ?, ?)",
            [(i, "ab"[i % 2], float(i)) for i in range(100)],
        )

    # reader-level: which filters are absorbed vs yielded back
    from etl_demo_spark.io.sqlite_source import _table_schema

    rdr = SQLiteReader({"path": db, "table": "t"}, _table_schema(db, "t"))
    leftover = list(
        rdr.pushFilters(
            [
                EqualTo(("grp",), "a"),
                In(("id",), (1, 2, 3)),
                IsNotNull(("v",)),
                StringContains(("grp",), "a"),  # not translated
            ]
        )
    )
    assert [type(f) for f in leftover] == [StringContains]
    assert rdr._where == ['"grp" = ?', '"id" IN (?, ?, ?)', '"v" IS NOT NULL']
    rows = list(rdr.read(rdr.partitions()[0]))
    assert [r[0] for r in rows] == [2]  # grp='a' ∧ id∈{1,2,3} → id 2 only

    # end-to-end through Spark
    register_sqlite_source(spark)
    df = (
        spark.read.format("sqlite")
        .option("path", db).option("table", "t").load()
        .filter((F.col("grp") == "b") & (F.col("id") < 10))
    )
    assert sorted(r.id for r in df.collect()) == [1, 3, 5, 7, 9]


# ---------------------------------------------------------------------------
# PNG pixel codec (io/png.py decode_png_pixels / box_resize)
# ---------------------------------------------------------------------------


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def test_decode_png_pixels_roundtrip_and_all_filters():
    """Decoder vs the repo's own encoder (filter 0), plus a hand-built
    stream exercising Sub/Up/Average/Paeth un-filtering, grayscale and
    RGBA color types, and split IDAT chunks."""
    import struct
    import zlib

    import numpy as np

    from etl_demo_spark.io.png import decode_png_pixels, png_bytes

    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (13, 9, 3), dtype=np.uint8)
    assert np.array_equal(decode_png_pixels(png_bytes(img)), img)

    h, w, ch = 4, 5, 3
    img2 = rng.integers(0, 256, (h, w, ch), dtype=np.uint8)

    def filt(y: int, ftype: int) -> bytes:
        row = img2[y].reshape(-1).astype(int)
        prior = img2[y - 1].reshape(-1).astype(int) if y else np.zeros(w * ch, int)
        out = []
        for i in range(w * ch):
            a = row[i - ch] if i >= ch else 0
            b = prior[i]
            c = prior[i - ch] if i >= ch else 0
            if ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            out.append((row[i] - pred) & 0xFF)
        return bytes([ftype]) + bytes(out)

    raw = b"".join(filt(y, f) for y, f in zip(range(h), [1, 2, 3, 4]))
    z = zlib.compress(raw)
    stream = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + _png_chunk(b"IDAT", z[: len(z) // 2])  # IDAT split across chunks
        + _png_chunk(b"IDAT", z[len(z) // 2 :])
        + _png_chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png_pixels(stream), img2)

    for ctype, nch in ((0, 1), (6, 4)):  # grayscale, RGBA
        px = rng.integers(0, 256, (6, 7, nch), dtype=np.uint8)
        raw = b"".join(b"\x00" + px[y].tobytes() for y in range(6))
        stream = (
            b"\x89PNG\r\n\x1a\n"
            + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 7, 6, 8, ctype, 0, 0, 0))
            + _png_chunk(b"IDAT", zlib.compress(raw))
            + _png_chunk(b"IEND", b"")
        )
        assert np.array_equal(decode_png_pixels(stream), px)

    # filter-don't-fail: garbage, truncation, unsupported color type
    assert decode_png_pixels(b"not a png") is None
    assert decode_png_pixels(png_bytes(img)[:30]) is None
    pal = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 3, 0, 0, 0))
    )
    assert decode_png_pixels(pal) is None


def test_resize_images_real_png(spark):
    """The real resize path vs a driver-side reference: decode + box
    resample computed locally with the same library functions must equal
    what the distributed mapInPandas stage emits, byte for byte (the
    resized blob is a deterministic function of the input)."""
    import numpy as np

    from etl_demo_spark.io.png import box_resize, decode_png_pixels, png_bytes
    from etl_demo_spark.multimodal import resize_images

    rng = np.random.default_rng(7)
    blobs = {
        i: png_bytes(rng.integers(0, 256, (10 + i, 17 - i, 3), dtype=np.uint8))
        for i in range(4)
    }
    media = spark.createDataFrame(
        [(i, b, {"mime": "image/png", "n_bytes": len(b)}) for i, b in blobs.items()],
        "media_id long, content binary, meta struct<mime:string,n_bytes:long>",
    )
    out = {r["media_id"]: r for r in resize_images(media, width=5, height=6).collect()}
    for i, src in blobs.items():
        expect = png_bytes(box_resize(decode_png_pixels(src), 6, 5))
        assert bytes(out[i]["content"]) == expect
        assert out[i]["meta"]["mime"] == "image/png"
        px = decode_png_pixels(bytes(out[i]["content"]))
        assert px.shape == (6, 5, 3)


def test_xlsx_type_drift_raises_with_location(spark, tmp_path):
    """A text cell in a column the FIRST workbook inferred as DOUBLE must
    raise naming the file/row/column — silent NULL coercion would lose
    data with no signal (header drift already raises; type drift now
    does too)."""
    import pytest

    from etl_demo_spark.io.xlsx import write_xlsx
    from etl_demo_spark.io.xlsx_source import register_xlsx_source

    register_xlsx_source(spark)
    d = tmp_path / "wb"
    d.mkdir()
    write_xlsx(str(d / "a.xlsx"), ["name", "score"], [["x", 1.5], ["y", 2.0]])
    write_xlsx(str(d / "b.xlsx"), ["name", "score"], [["z", "oops"]])
    with pytest.raises(Exception) as ei:
        spark.read.format("xlsx").load(str(d)).collect()
    msg = str(ei.value)
    assert "b.xlsx" in msg and "score" in msg and "oops" in msg
