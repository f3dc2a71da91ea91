"""Spot-check named registry queries against their DuckDB oracles.

Same normalization/hash as scripts/sweep_correctness.py, but runs only the
queries named on the command line — the inner loop for verifying a new or
changed corpus query at a chosen scale factor without a full sweep.

Usage:
    python scripts/check_queries.py q1 [q2 ...] [--sf /root/testdata/sf0.1]
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

from scripts.sweep_correctness import TABLES, _value_hash  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        args = args[:i] + args[i + 2 :]
    if not args:
        print("usage: check_queries.py q1 [q2 ...] [--sf DIR]")
        sys.exit(2)

    import duckdb

    import __spark_entry__ as entrymod
    from etl_demo_spark.session import get_spark

    spark = get_spark(app_name="check-queries")
    spark.sparkContext.setLogLevel("ERROR")
    queries, oracles = entrymod.queries(), entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failed = []
    for name in args:
        if name not in queries:
            print(f"{name}: NOT REGISTERED")
            failed.append(name)
            continue
        spdf = queries[name](spark, sf_dir).toPandas()
        if name not in oracles:
            print(f"{name}: rows-only ({len(spdf)} rows)")
            continue
        opdf = con.sql(oracles[name]).df()
        schema_ok = sorted(spdf.columns) == sorted(opdf.columns)
        hash_ok = schema_ok and _value_hash(spdf) == _value_hash(opdf)
        status = "OK" if hash_ok else "FAIL"
        print(
            f"{name}: {status} spark_rows={len(spdf)} oracle_rows={len(opdf)} "
            f"schema={'ok' if schema_ok else f'{sorted(spdf.columns)} vs {sorted(opdf.columns)}'}"
        )
        if not hash_ok:
            failed.append(name)
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
