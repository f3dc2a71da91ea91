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
from etl_demo_spark.plans import dump_digest, plan_digest

PLANS_R11 = Path(__file__).resolve().parent.parent / "plans" / "r11"
SF01 = "/root/testdata/sf0.1"

PINNED = sorted(p.name[: -len("_after.txt")] for p in PLANS_R11.glob("*_after.txt"))


@pytest.mark.parametrize("name", PINNED)
def test_live_plan_matches_committed_after_dump(spark, name):
    dump = dump_digest((PLANS_R11 / f"{name}_after.txt").read_text())
    live = plan_digest(entrymod.queries()[name](spark, SF01)).as_dict()
    for key in ("exchanges", "broadcasts", "scans",
                "sort_merge_joins", "broadcast_hash_joins"):
        assert live[key] == dump[key], (
            f"{name}: live {key}={live[key]} != committed dump "
            f"{key}={dump[key]} — regenerate plans/r11/{name}_after.txt "
            f"(and any md claim) or revisit the plan change"
        )
