"""Pin committed plan dumps to the live plans (round 11).

The round-10 verdict flagged a drift between an OPTIMIZATION_r10.md plan
claim and the committed dump. This file makes that class of drift fail a
test: for every query with a committed ``plans/r11/*_after.txt``, the
live plan's node counts must equal the dump's node counts. Regenerate the
dump (and the md claim) whenever the plan legitimately changes.
"""

from __future__ import annotations

from pathlib import Path

import pytest

import __spark_entry__ as entrymod
from etl_demo_spark.plans import dump_digest

PLANS_R11 = Path(__file__).resolve().parent.parent / "plans" / "r11"
SF01 = "/root/testdata/sf0.1"

PINNED = sorted(p.name[: -len("_after.txt")] for p in PLANS_R11.glob("*_after.txt"))


@pytest.mark.parametrize("name", PINNED)
def test_live_plan_matches_committed_after_dump(spark, name):
    dump = dump_digest((PLANS_R11 / f"{name}_after.txt").read_text())
    df = entrymod.queries()[name](spark, SF01)
    # digest the live plan with the SAME methodology as the dump
    # (formatted mode lists each node once; the compact toString repeats
    # cached subtrees per reference site and counts differently)
    formatted = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    live = dump_digest(formatted)
    for key in ("exchanges", "broadcasts", "scans",
                "sort_merge_joins", "broadcast_hash_joins"):
        assert live[key] == dump[key], (
            f"{name}: live {key}={live[key]} != committed dump "
            f"{key}={dump[key]} — regenerate plans/r11/{name}_after.txt "
            f"(and any md claim) or revisit the plan change"
        )
