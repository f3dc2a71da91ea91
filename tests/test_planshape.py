"""PLANSHAPE.json invariants + live spot-digests.

The artifact is regenerated near round end (scripts/sweep_plans.py); these
tests pin (a) the global scale invariants on the committed artifact and
(b) three representative queries' digests against a LIVE plan build, so a
stale artifact that no longer matches HEAD fails here rather than
misleading a reader."""

from __future__ import annotations

import json
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
ARTIFACT = REPO / "PLANSHAPE.json"


@pytest.fixture(scope="module")
def planshape() -> dict:
    if not ARTIFACT.exists():
        pytest.skip("PLANSHAPE.json not generated yet (run scripts/sweep_plans.py)")
    return json.loads(ARTIFACT.read_text())


def test_no_row_python_anywhere(planshape):
    """BatchEvalPython (row-at-a-time pickling) is banned repo-wide: every
    Python stage must be Arrow-batched."""
    offenders = {
        n: d
        for n, d in planshape.items()
        if n != "_meta" and d.get("row_python_stages", 0) > 0
    }
    assert not offenders, offenders
    assert planshape["_meta"]["row_python_stages_total"] == 0


def test_no_cartesian_outside_allowlist(planshape):
    from scripts.sweep_plans import CARTESIAN_ALLOWLIST

    offenders = {
        n: d["cartesian_joins"]
        for n, d in planshape.items()
        if n != "_meta"
        and d.get("cartesian_joins", 0) > 0
        and n not in CARTESIAN_ALLOWLIST
    }
    assert not offenders, offenders
    assert planshape["_meta"]["violations"] == []


def test_artifact_covers_full_registry(planshape):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", str(REPO / "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    registry = set(mod.queries())
    digested = set(planshape) - {"_meta"}
    missing = registry - digested
    assert not missing, f"stale PLANSHAPE.json — regenerate: {sorted(missing)[:5]}"
    assert planshape["_meta"]["n_errors"] == 0


@pytest.mark.parametrize(
    "name",
    ["flagship_weekly_revenue", "nation_product_profit", "exact_dedup_fingerprint"],
)
def test_artifact_matches_live_plan(planshape, spark, name):
    """Digest three headline queries live and compare the counters the
    artifact recorded — catches silent plan regressions between sweeps."""
    import importlib.util

    from etl_demo_spark.plans import plan_digest

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", str(REPO / "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    df = mod.queries()[name](spark, "/root/testdata/sf0.01")
    live = plan_digest(df).as_dict()
    recorded = planshape[name]
    for key in (
        "exchanges",
        "broadcasts",
        "cartesian_joins",
        "row_python_stages",
        "sort_merge_joins",
        "broadcast_hash_joins",
    ):
        assert live[key] == recorded[key], (name, key, live[key], recorded[key])
