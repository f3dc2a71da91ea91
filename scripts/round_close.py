"""Round-exit artifact gate: regenerate the full-registry sweeps AT THE
CLOSING COMMIT, in subprocesses, and verify they cover the live registry.

Round-5 postmortem: four queries landed after the committed sweep was
generated, so the round shipped with no auditable correctness row for
them. This script makes "artifacts match the registry at HEAD" a single
command run as the last step of a round:

  1. `sweep_correctness.py` → CORRECTNESS_FULL_r{N}.json (every registered
     query vs its DuckDB oracle at sf0.01);
  2. `sweep_plans.py` → PLANSHAPE.json (per-query physical-plan scale
     audit);
  3. gate: both artifacts' query sets must EQUAL the live registry's
     (count and names), PLANSHAPE's global invariants must hold, and the
     correctness sweep must contain zero failures/errors.

Usage:
    python scripts/round_close.py ROUND_NUMBER
        e.g. `python scripts/round_close.py 6` writes
        CORRECTNESS_FULL_r06.json + PLANSHAPE.json and exits nonzero if
        any gate fails (stale artifact, red query, missing coverage).

Each sweep runs in its own subprocess so session-sticky confs from one
cannot contaminate the other (the streaming queries set legacy parquet
confs) and so the gate measures exactly what a fresh driver would see.
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))


def main() -> int:
    if len(sys.argv) != 2:
        print(__doc__)
        return 2
    rnd = int(sys.argv[1])
    corr_path = REPO / f"CORRECTNESS_FULL_r{rnd:02d}.json"
    plan_path = REPO / "PLANSHAPE.json"

    from etl_demo_spark.corpus import ORACLES, QUERIES

    live = set(QUERIES)
    print(f"registry: {len(QUERIES)} queries, {len(ORACLES)} oracled")

    for script, out in (
        ("sweep_correctness.py", corr_path),
        ("sweep_plans.py", plan_path),
    ):
        print(f"running {script} -> {out.name} ...", flush=True)
        r = subprocess.run(
            [sys.executable, str(REPO / "scripts" / script), str(out)],
            cwd=REPO,
        )
        if r.returncode != 0:
            print(f"GATE FAIL: {script} exited {r.returncode}")
            return 1

    failures = []

    corr = json.loads(corr_path.read_text())
    corr_queries = {k for k in corr if not k.startswith("_")}
    if corr_queries != live:
        failures.append(
            f"correctness coverage mismatch: artifact {len(corr_queries)} vs "
            f"registry {len(live)}; missing={sorted(live - corr_queries)[:5]} "
            f"extra={sorted(corr_queries - live)[:5]}"
        )
    red = {
        k: v
        for k, v in corr.items()
        if not k.startswith("_")
        and (
            (v.get("err") not in (None, "no_oracle"))
            or v.get("rows_match") is False
            or v.get("schema_match") is False
            or v.get("hash_match") is False
        )
    }
    if red:
        failures.append(f"correctness red rows: {sorted(red)[:10]}")
    n_no_oracle = sum(
        1 for k, v in corr.items()
        if not k.startswith("_") and v.get("err") == "no_oracle"
    )
    if n_no_oracle != len(live) - len(ORACLES):
        failures.append(
            f"no_oracle count {n_no_oracle} != registry rows-only "
            f"{len(live) - len(ORACLES)}"
        )

    plans = json.loads(plan_path.read_text())
    plan_items = {k: v for k, v in plans.items() if not k.startswith("_")}
    if set(plan_items) != live:
        failures.append(
            f"planshape coverage mismatch: artifact {len(plan_items)} vs "
            f"registry {len(live)}"
        )
    allow = set(plans.get("_meta", {}).get("cartesian_allowlist", []))
    for name, d in plan_items.items():
        if not isinstance(d, dict):
            continue
        if d.get("row_python_stages", 0) != 0:
            failures.append(f"{name}: row-at-a-time Python stage in plan")
        if d.get("cartesian_joins", 0) != 0 and name not in allow:
            failures.append(f"{name}: unallowlisted cartesian join")

    if failures:
        print("ROUND-CLOSE GATE FAILED:")
        for f in failures:
            print(f"  - {f}")
        return 1
    print(
        f"round-close gate PASSED: {len(corr_queries)} queries swept "
        f"({len(corr_queries) - n_no_oracle} oracled green, "
        f"{n_no_oracle} rows-only), planshape invariants hold"
    )

    # Stage any driver-named artifacts sitting uncommitted in the tree
    # (BENCH_r*.json / CORRECTNESS_r*.json overwrites land AFTER the
    # round's last code commit — rounds 5 and 6 both shipped with them
    # dangling). `git add` only; the closing `git commit` stays a human
    # action so the round's final message is deliberate.
    import subprocess as sp

    dirty = sp.run(
        ["git", "status", "--porcelain"], cwd=REPO, capture_output=True, text=True
    ).stdout.splitlines()
    staged = []
    for line in dirty:
        name = line[3:].strip()
        if name.startswith(("BENCH_r", "CORRECTNESS_r", "CORRECTNESS_FULL_r")) or name in (
            "PLANSHAPE.json",
            "LEAKCHECK.json",
            "COPYCHECK.json",
            "VERDICT.md",
            "ADVICE.md",
        ):
            sp.run(["git", "add", name], cwd=REPO)
            staged.append(name)
    if staged:
        print(f"staged round artifacts: {sorted(staged)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
