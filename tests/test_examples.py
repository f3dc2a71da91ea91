"""The quickstart example must stay runnable — it is the switching-user's
first contact with the engine, so it runs as a real subprocess (own
SparkSession, fresh sys.path) exactly like a user would run it."""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_quickstart_runs_end_to_end():
    proc = subprocess.run(
        [sys.executable, str(REPO / "examples" / "quickstart.py")],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=str(REPO),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = proc.stdout
    for marker in (
        "[trades] 545 weekly groups",
        "[sources] sqlite rows=545, xlsx rows=6",
        "[analytics] top segments:",
        "[sampling]",
        "[ann] exact top-3:",
        "[streaming] hourly window rows:",
    ):
        assert marker in out, f"missing {marker!r} in:\n{out}"


def test_lakehouse_tour_runs_end_to_end():
    proc = subprocess.run(
        [sys.executable, str(REPO / "examples" / "lakehouse_tour.py")],
        capture_output=True,
        text=True,
        timeout=900,
        cwd=str(REPO),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = proc.stdout
    for marker in (
        "layout derived from months(o_orderdate)",
        "one-month predicate opens",
        "deletion vectors removed",
        "partition_transform.p_month",
        "mv_refresh chose",
        "done — all surfaces exercised",
    ):
        assert marker in out, f"missing {marker!r} in:\n{out}"
