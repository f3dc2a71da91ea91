#!/usr/bin/env bash
# Headless one-command run of the reference-parity weekly-trades ETL:
# extract → clean → transform(+PnL) → SQLite load → xlsx report → PNG charts.
# The Spark analogue of the reference CI step (reference repo,
# .github/workflows/etl_weekly_trades.yml:35-43: run ETL, collect the DB).
#
# Usage: scripts/run_headless.sh [INPUT_CSV] [OUT_DIR]
# Defaults: the reference's shipped CSV; ./out/
set -euo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
INPUT="${1:-/root/reference/trades (1) (2) (1).csv}"
OUT="${2:-$REPO/out}"
mkdir -p "$OUT"

PYTHONPATH="$REPO" python -m etl_demo_spark.pipelines.weekly_trades \
  --input "$INPUT" \
  --sqlite "$OUT/agg_result.db" \
  --report "$OUT/top_clients.xlsx" \
  --charts "$OUT/charts"

echo "artifacts in $OUT:"
ls -l "$OUT" "$OUT/charts"
