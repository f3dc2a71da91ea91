"""Full-registry correctness sweep → a driver-schema JSON artifact.

The external driver stamps the same fixed ~50-query subset each round, so
the rest of the 147-query registry has no judge-auditable oracle row.
This script runs EVERY registered query at sf0.01 side-by-side with its
DuckDB oracle and writes one JSON object per query using the driver's own
per-query schema (rows_match / schema_match / hash_match / spark_rows /
oracle_rows / err), with ``err: "no_oracle"`` rows-only entries for the
approximate/heuristic operators exactly as the driver records them.

Usage:
    python scripts/sweep_correctness.py [OUT.json] [SF_DIR]

Defaults: OUT=CORRECTNESS_FULL.json, SF_DIR=/root/testdata/sf0.01.
The value comparison replicates tests/test_entry.py::test_query_matches_oracle:
sort columns by name, normalize (NULL sentinel, ISO timestamps, floats to
6dp), sort rows, then hash — order-insensitive and engine-neutral.
"""

from __future__ import annotations

import datetime
import hashlib
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _norm(v):
    import pandas as pd

    if v is None or v != v:
        return "\x00NULL"
    if isinstance(v, (pd.Timestamp, datetime.datetime, datetime.date)):
        return pd.Timestamp(v).isoformat()
    if isinstance(v, float):
        return f"{v:.6f}"
    return str(v)


def _value_hash(pdf) -> str:
    cols = sorted(pdf.columns)
    df = pdf[cols].copy()
    for c in cols:
        df[c] = df[c].map(_norm)
    rows = sorted(map(tuple, df.itertuples(index=False, name=None)))
    h = hashlib.md5()
    for r in rows:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest()


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "CORRECTNESS_FULL.json"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

    import duckdb

    import __spark_entry__ as entrymod
    from etl_demo_spark.session import get_spark

    spark = get_spark(app_name="sweep-correctness")
    spark.sparkContext.setLogLevel("ERROR")
    queries, oracles = entrymod.queries(), entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    results: dict[str, dict] = {}
    t_start = time.time()
    for name in queries:
        rec: dict = {
            "rows_match": None,
            "schema_match": None,
            "hash_match": None,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
        }
        try:
            spdf = queries[name](spark, sf_dir).toPandas()
            rec["spark_rows"] = len(spdf)
            if name in oracles:
                opdf = con.sql(oracles[name]).df()
                rec["oracle_rows"] = len(opdf)
                rec["rows_match"] = len(spdf) == len(opdf)
                rec["schema_match"] = sorted(spdf.columns) == sorted(opdf.columns)
                rec["hash_match"] = (
                    rec["schema_match"] and _value_hash(spdf) == _value_hash(opdf)
                )
            else:
                rec["err"] = "no_oracle"
        except Exception as e:  # capture, keep sweeping
            rec["err"] = f"{type(e).__name__}: {e}"[:500]
        results[name] = rec
        flag = (
            "OK"
            if rec["hash_match"]
            else ("rows-only" if rec["err"] == "no_oracle" else "FAIL")
        )
        print(f"{name}: {flag} ({rec['spark_rows']} rows)", file=sys.stderr)

    oracled = [r for r in results.values() if r["err"] != "no_oracle"]
    green = [r for r in oracled if r["hash_match"]]
    summary = {
        "_meta": {
            "sf_dir": sf_dir,
            "n_queries": len(results),
            "n_oracled": len(oracled),
            "n_oracled_green": len(green),
            "n_rows_only": len(results) - len(oracled),
            "wall_seconds": round(time.time() - t_start, 1),
        }
    }
    summary.update(results)
    Path(out_path).write_text(json.dumps(summary, indent=2) + "\n")
    print(f"wrote {out_path}: {len(green)}/{len(oracled)} oracled green")
    if len(green) != len(oracled):
        bad = [n for n, r in results.items() if r["err"] not in (None, "no_oracle") or (r["err"] is None and not r["hash_match"])]
        print("NOT GREEN:", bad)
        sys.exit(1)


if __name__ == "__main__":
    main()
