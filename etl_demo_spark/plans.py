"""Plan introspection utilities: summarize a DataFrame's physical plan
into the handful of numbers the 100 TB posture cares about.

``plan_digest`` powers ad-hoc plan review and regression tests: instead
of eyeballing ``explain()`` output, assert on the digest — "this query
has one exchange, two broadcasts, and no Python stages" survives plan
renames and id churn that break raw string matching.
"""

from __future__ import annotations

import re
from dataclasses import asdict, dataclass

from pyspark.sql import DataFrame


@dataclass(frozen=True)
class PlanDigest:
    exchanges: int            # shuffles (excluding broadcast exchanges)
    broadcasts: int           # broadcast exchanges (small-side dims)
    scans: int                # file scans
    sort_merge_joins: int
    broadcast_hash_joins: int
    wholestage_codegen_spans: int
    python_stages: int        # ArrowEvalPython / BatchEvalPython / mapInPandas
    take_ordered: bool        # top-k compiled to TakeOrderedAndProject
    read_columns: tuple[str, ...]  # union of pruned scan schemas
    cartesian_joins: int = 0  # CartesianProduct + BroadcastNestedLoopJoin
    row_python_stages: int = 0  # BatchEvalPython — row-at-a-time, the slow path

    def as_dict(self) -> dict:
        return asdict(self)


def plan_digest(df: DataFrame) -> PlanDigest:
    """Digest the CURRENT physical plan (pre-execution; for the final
    adaptive plan run an action on ``df`` first — AQE rewrites joins and
    partition counts at runtime)."""
    p = df._jdf.queryExecution().executedPlan().toString()
    read_cols: set[str] = set()
    # ReadSchema appears in formatted explain; the compact tree shows the
    # scan's pruned output list as `FileScan parquet [col#1,col#2]`.
    # The struct body needs bracket-aware parsing: nested structs and
    # decimal(p,s) contain both '>' and ',' — a flat regex would stop at
    # the first '>' and promote inner struct fields to top-level columns.
    for m in re.finditer(r"ReadSchema: struct<", p):
        start = m.end()
        depth, i = 1, start
        while i < len(p) and depth > 0:
            if p[i] == "<":
                depth += 1
            elif p[i] == ">":
                depth -= 1
            i += 1
        body = p[start : i - 1]
        field_start, d2 = 0, 0
        for j, ch in enumerate(body + ","):
            if ch in "<(":
                d2 += 1
            elif ch in ">)":
                d2 -= 1
            elif ch == "," and d2 == 0:
                name = body[field_start:j].split(":")[0].strip()
                if name:
                    read_cols.add(name)
                field_start = j + 1
    for m in re.finditer(r"FileScan \w+ \[([^\]]*)\]", p):
        for field in m.group(1).split(","):
            name = field.split("#")[0].strip()
            if name:
                read_cols.add(name)
    return PlanDigest(
        # every partitioning family counts: hash, range, single-partition,
        # and round-robin (spread_for_cpu's repartition) are all shuffles
        exchanges=len(
            re.findall(
                r"\bExchange (?:hash|range|SinglePartition|RoundRobin)", p
            )
        ),
        broadcasts=p.count("BroadcastExchange"),
        scans=p.count("Scan parquet") + p.count("Scan csv") + p.count("Scan orc")
        + p.count("Scan json") + p.count("Scan text"),
        sort_merge_joins=p.count("SortMergeJoin"),
        broadcast_hash_joins=p.count("BroadcastHashJoin"),
        # only present once codegen has run (post-execution / final plan)
        wholestage_codegen_spans=len(set(re.findall(r"\*\((\d+)\)", p))),
        python_stages=p.count("EvalPython") + p.count("MapInPandas")
        + p.count("FlatMapGroupsInPandas"),
        take_ordered=("TakeOrderedAndProject" in p),
        read_columns=tuple(sorted(read_cols)),
        cartesian_joins=p.count("CartesianProduct")
        + p.count("BroadcastNestedLoopJoin"),
        row_python_stages=p.count("BatchEvalPython"),
    )


def dump_digest(formatted_plan: str) -> dict:
    """Node counts from a COMMITTED ``explain("formatted")`` dump
    (plans/rNN/*_{before,after}.txt). Formatted mode lists every node
    exactly once as a ``(N) NodeName`` detail header, so counting
    headers gives true node counts (the tree section would double-count
    via ReusedExchange references). Round 11: the drift alarm between an
    OPTIMIZATION_rNN.md plan claim, the committed dump, and the live
    plan — tests/test_plan_dump_pins.py pins all three together."""
    heads = re.findall(r"^\((\d+)\) (\w+)", formatted_plan, flags=re.M)
    names = [n for _, n in heads]
    return {
        "exchanges": names.count("Exchange"),
        "broadcasts": names.count("BroadcastExchange"),
        "scans": names.count("Scan"),
        "sort_merge_joins": names.count("SortMergeJoin"),
        "broadcast_hash_joins": names.count("BroadcastHashJoin"),
    }


def runtime_metrics(df: DataFrame) -> list[dict]:
    """POST-execution metrics from the (AQE-final) physical plan: one row
    per plan node per metric — output rows, shuffle bytes/records, spill
    bytes, scan bytes/files/pruning counts, peak memory. Run an action on
    ``df`` first; before execution most metrics read 0.

    This is the feedback loop `plan_digest` can't give: the digest says
    "one exchange", this says HOW MANY BYTES crossed it and whether the
    sort spilled — the numbers that decide partition counts and salting
    at 100 TB. Implementation walks the JVM plan tree via py4j (driver-
    side, metadata-only — nothing touches executors).

    Returns dicts of (node, node_id, metric, value) — value in the
    metric's native unit (bytes/rows/ms as named). AQE wraps the plan in
    AdaptiveSparkPlan; the walk descends into the FINAL plan so reused
    exchanges and runtime-replanned joins report their real nodes."""
    out: list[dict] = []
    seen: set[int] = set()

    def walk(node) -> None:
        nid = node.id()
        if nid in seen:
            # AQE reuses stages (self-joins → ReusedExchange / shared
            # QueryStageExec at two tree positions); walking the shared
            # subtree twice would double-count its accumulators in
            # metric_total
            return
        seen.add(nid)
        name = node.nodeName()
        metrics = node.metrics()
        it = metrics.iterator()
        while it.hasNext():
            kv = it.next()
            metric = kv._2()
            out.append(
                {
                    "node": name,
                    "node_id": nid,
                    "metric": str(metric.name().get() if metric.name().isDefined() else kv._1()),
                    "value": int(metric.value()),
                }
            )
        # AQE nodes hide the executed subtree behind accessor methods:
        # AdaptiveSparkPlanExec → executedPlan(); every QueryStageExec
        # flavor (Result/Shuffle/Broadcast/TableCache…) is a LEAF whose
        # real subtree hangs off .plan()
        cls = node.getClass().getSimpleName()
        if cls == "AdaptiveSparkPlanExec":
            walk(node.executedPlan())
            return
        if cls.endswith("QueryStageExec"):
            walk(node.plan())
            return
        if cls in ("InMemoryTableScanExec",):
            return  # cached subtree: its build plan already ran elsewhere
        children = node.children()
        cit = children.iterator()
        while cit.hasNext():
            walk(cit.next())

    walk(df._jdf.queryExecution().executedPlan())
    return out


def metric_total(metrics: list[dict], substring: str) -> int:
    """Sum every metric whose NAME contains ``substring`` (case-insensitive)
    — `metric_total(m, 'spill')` / `metric_total(m, 'shuffle bytes')`."""
    s = substring.lower()
    return sum(m["value"] for m in metrics if s in m["metric"].lower())
