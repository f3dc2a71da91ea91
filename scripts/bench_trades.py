"""Trades E+T+L throughput harness (BASELINE.md 1M-row workload).

Generates the synthetic trades CSV (same schema/domains as the reference's
shipped ``trades (1) (2) (1).csv``: 15 users x 3 client_types x 5 symbols x
2 sides, 90-day timestamp range, numpy seed 42), then times this engine's
full E+T+L — CSV scan -> clean -> weekly 4-key agg + PnL -> SQLite append —
with session startup excluded, per BASELINE.md's convention.

Optionally times the reference pandas pipeline on the SAME csv for an
in-situ ratio: pass ``--reference /path/to/etl_weekly_trades.py`` (the
script is executed in a subprocess; nothing is imported into this repo).

Usage:
    python scripts/bench_trades.py [--rows 1000000] [--runs 3]
                                   [--reference /root/reference/etl_weekly_trades.py]

Prints one JSON line: {"rows": N, "engine_sec": [...], "engine_rows_per_sec":
best, "groups": G, "reference_sec": [...] | null}.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))


def generate_csv(path: str, rows: int, seed: int = 42) -> None:
    import numpy as np

    rng = np.random.default_rng(seed)
    users = np.array([1001, 1002, 1003, 1004, 1005,
                      2001, 2002, 2003, 2004, 2005,
                      3001, 3002, 3003, 3004, 3005])
    ctype = {1: "gold", 2: "silver", 3: "bronze"}
    symbols = np.array(["AAPL", "SPY", "QQQ", "MSFT", "GOOGL"])
    sides = np.array(["buy", "sell"])

    uid = rng.choice(users, size=rows)
    # 90-day range starting 2023-01-01, minute granularity (reference shape)
    base = np.datetime64("2023-01-01T00:00:00")
    ts = base + rng.integers(0, 90 * 24 * 60, size=rows).astype("timedelta64[m]")
    qty = np.round(rng.uniform(0.01, 20.0, size=rows), 2)
    price = np.round(rng.uniform(50.0, 500.0, size=rows), 2)

    import pandas as pd

    df = pd.DataFrame(
        {
            "timestamp": np.datetime_as_string(ts, unit="s"),
            "user_id": uid,
            "client_type": [ctype[u // 1000] for u in uid],
            "symbol": rng.choice(symbols, size=rows),
            "side": rng.choice(sides, size=rows),
            "quantity": qty,
            "price": price,
        }
    )
    df["timestamp"] = df["timestamp"].str.replace("T", " ", regex=False)
    df.to_csv(path, index=False)


def time_engine(csv_path: str, runs: int, workdir: str) -> tuple[list[float], int]:
    from etl_demo_spark.pipelines.weekly_trades import run_etl
    from etl_demo_spark.session import get_spark

    spark = get_spark(app_name="bench-trades")
    # warm-up on a prefix so the timed runs measure steady state, not
    # first-touch JVM/codegen costs (BASELINE.md: startup excluded)
    run_etl(spark, csv_path, sqlite_path=os.path.join(workdir, "warm.db"))

    times: list[float] = []
    groups = 0
    for i in range(runs):
        db = os.path.join(workdir, f"agg_{i}.db")
        t0 = time.perf_counter()
        res = run_etl(spark, csv_path, sqlite_path=db)
        times.append(time.perf_counter() - t0)
        groups = res.rows_loaded
        res.aggregated.unpersist()
    return times, groups


def time_reference(ref_script: str, csv_path: str, runs: int, workdir: str) -> list[float]:
    """Run the reference pipeline in a subprocess from a scratch cwd.

    The driver code is the reference's own ``extract -> transform -> load``
    (reporting excluded: matplotlib/openpyxl absent, per BASELINE.md)."""
    drv = os.path.join(workdir, "_ref_driver.py")
    Path(drv).write_text(
        "import importlib.util, json, sys, time, types\n"
        "# the E+T+L path never plots; satisfy the script's top-level imports\n"
        "for name in ('matplotlib', 'matplotlib.pyplot', 'openpyxl'):\n"
        "    sys.modules.setdefault(name, types.ModuleType(name))\n"
        "spec = importlib.util.spec_from_file_location('refmod', sys.argv[1])\n"
        "m = importlib.util.module_from_spec(spec)\n"
        "spec.loader.exec_module(m)\n"
        "csv, runs, out = sys.argv[2], int(sys.argv[3]), []\n"
        "for i in range(runs):\n"
        "    t0 = time.perf_counter()\n"
        "    df = m.extract(csv)\n"
        "    df = m.transform(df, compute_pnl=True)\n"
        "    m.load(df, f'ref_{i}.db')\n"
        "    out.append(time.perf_counter() - t0)\n"
        "print(json.dumps(out))\n"
    )
    proc = subprocess.run(
        [sys.executable, drv, ref_script, csv_path, str(runs)],
        cwd=workdir, capture_output=True, text=True, timeout=600,
    )
    if proc.returncode != 0:
        raise RuntimeError(f"reference run failed: {proc.stderr[-2000:]}")
    return json.loads(proc.stdout.strip().splitlines()[-1])


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--rows", type=int, default=1_000_000)
    p.add_argument("--runs", type=int, default=3)
    p.add_argument("--reference", default=None,
                   help="path to the reference etl_weekly_trades.py (optional)")
    p.add_argument("--keep", action="store_true", help="keep the workdir")
    args = p.parse_args()

    workdir = tempfile.mkdtemp(prefix="bench_trades_")
    try:
        csv_path = os.path.join(workdir, "trades_1m.csv")
        generate_csv(csv_path, args.rows)

        engine_times, groups = time_engine(csv_path, args.runs, workdir)
        ref_times = None
        if args.reference:
            ref_times = time_reference(args.reference, csv_path, args.runs, workdir)

        best = min(engine_times)
        print(json.dumps({
            "rows": args.rows,
            "groups": groups,
            "engine_sec": [round(t, 3) for t in engine_times],
            "engine_rows_per_sec": round(args.rows / best),
            "reference_sec": [round(t, 3) for t in ref_times] if ref_times else None,
            "ratio_engine_over_reference": (
                round(best / min(ref_times), 3) if ref_times else None
            ),
        }))
    finally:
        if not args.keep:
            shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
