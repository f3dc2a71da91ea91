"""Golden reference parity (SURVEY.md §5): run the pipeline on the
reference's own dirty CSV and match its committed artifacts bit-for-bit
(tolerance 1e-9 relative on floats; NaN↔NULL normalized)."""

from __future__ import annotations

import math
import sqlite3

import pytest

from etl_demo_spark.clean import clean_trades
from etl_demo_spark.pipelines.weekly_trades import extract, run_etl

REF_CSV = "/root/reference/trades (1) (2) (1).csv"
GOLDEN_DB = "/root/reference/agg_result.db"
KEY = ["week_start_date", "client_type", "user_id", "symbol"]
VALUE_COLS = [
    "buy_qty", "sell_qty", "buy_value", "sell_value", "total_volume",
    "trade_count", "avg_buy_price", "net_qty", "realized_pnl",
    "mark_price", "unrealized_pnl", "total_pnl",
]


def _close(a, b, tol=1e-9) -> bool:
    if a is None and b is None:
        return True
    if a is None or b is None:
        return False
    if isinstance(a, float) and math.isnan(a):
        return b is None or (isinstance(b, float) and math.isnan(b))
    return math.isclose(float(a), float(b), rel_tol=tol, abs_tol=1e-9)


@pytest.fixture(scope="module")
def golden_rows():
    con = sqlite3.connect(GOLDEN_DB)
    cols = ", ".join(KEY + VALUE_COLS)
    rows = con.execute(
        f"SELECT {cols} FROM agg_trades_weekly ORDER BY week_start_date, client_type, user_id, symbol"
    ).fetchall()
    con.close()
    return rows


def test_dirty_data_contract(spark):
    """FIXTURES.md §A1 anchors: 800 raw rows, 790 survive cleaning."""
    raw = extract(spark, REF_CSV)
    assert raw.count() == 800
    assert clean_trades(raw).count() == 790


def test_agg_matches_golden_db(spark, golden_rows):
    """All 16 output columns equal the reference's agg_result.db."""
    res = run_etl(spark, REF_CSV)
    mine = {
        (str(r["week_start_date"]), r["client_type"], r["user_id"], r["symbol"]): r
        for r in res.aggregated.collect()
    }
    assert len(mine) == 545 == len(golden_rows)
    for g in golden_rows:
        k = (g[0], g[1], g[2], g[3])
        assert k in mine, f"missing group {k}"
        m = mine[k]
        for i, c in enumerate(VALUE_COLS):
            assert _close(m[c], g[4 + i]), f"{k}.{c}: {m[c]} != {g[4 + i]}"


GOLDEN_REPORT = [
    # (user_id, total_volume, total_pnl, top_label, rank) from output/top_clients.xlsx
    (3002, 301105.8294, -486.7756000000025, "total_volume", 1.0),
    (3001, 257768.7659, -944.1912000000005, "total_volume", 2.0),
    (3003, 221485.5917, 1486.924999999997, "total_volume", 3.0),
    (3003, 221485.5917, 1486.924999999997, "total_pnl", 1.0),
    (3002, 301105.8294, -486.7756000000025, "total_pnl", 2.0),
    (3001, 257768.7659, -944.1912000000005, "total_pnl", 3.0),
]


def test_report_matches_golden_xlsx(spark):
    res = run_etl(spark, REF_CSV)
    got = [
        (r["user_id"], r["total_volume"], r["total_pnl"], r["top_label"], r["rank"])
        for r in res.report.collect()
    ]
    # union order within a metric is rank order; metrics in declaration order
    assert len(got) == 6
    by_label = {}
    for row in got:
        by_label.setdefault(row[3], []).append(row)
    for exp in GOLDEN_REPORT:
        match = [
            r for r in by_label[exp[3]]
            if r[0] == exp[0] and _close(r[1], exp[1], 1e-6) and _close(r[2], exp[2], 1e-6) and r[4] == exp[4]
        ]
        assert match, f"report row missing: {exp}"


def test_run_etl_diagnostics_match_dirty_contract(spark, tmp_path):
    """diagnose=True surfaces the dirty-data contract (800 raw rows, 790
    cleaned — SURVEY §1.5) from observations riding the sink action, with
    no separate diagnostic scans."""
    from etl_demo_spark.pipelines.weekly_trades import run_etl

    res = run_etl(
        spark,
        "/root/reference/trades (1) (2) (1).csv",
        sqlite_path=str(tmp_path / "agg.db"),
        report_path=None,
        diagnose=True,
    )
    d = res.extras["diagnostics"]
    assert d["raw_rows"] == 800
    assert d["cleaned_rows"] == 790
    # raw layer is all-string: only truly EMPTY cells are NULL here (the
    # 5 "not_a_date" strings null out later, at the strict parse)
    assert d["raw_null_cells_by_column"]["timestamp"] == 5
    assert d["raw_null_cells_by_column"]["quantity"] == 5
