"""Full-registry PLAN-SHAPE sweep → PLANSHAPE.json, the scale-audit artifact.

Correctness sweeps prove the numbers are right; this proves the PLANS are
right — the properties that decide whether a query survives a 100× data
scale-up. For every registered query it digests the physical plan
(etl_demo_spark.plans.plan_digest) and records the scale-killer counters:

  exchanges            shuffles (hash/range/single/round-robin)
  broadcasts           broadcast exchanges (small dims riding broadcast)
  cartesian_joins      CartesianProduct + BroadcastNestedLoopJoin
  row_python_stages    BatchEvalPython (row-at-a-time Python — slow path)
  python_stages        all Python stages (Arrow-batched ones included)
  sort_merge/broadcast joins, scans, take_ordered

Global invariants (tests/test_planshape.py pins them on the artifact):
  * row_python_stages == 0 everywhere — no row-at-a-time Python, ever.
  * cartesian_joins == 0 outside CARTESIAN_ALLOWLIST (each allowlisted
    query's cross join is deliberate and output- or 1-row-bounded;
    rationale inline below).

Queries that EXECUTE at build time (streaming runs, MERGE swaps) digest
the plan of the frame they return — for those the artifact records the
serving read, which is exactly what repeats at scale.

Usage: python scripts/sweep_plans.py [OUT.json] [SF_DIR]
Defaults: OUT=PLANSHAPE.json, SF_DIR=/root/testdata/sf0.01.
"""

from __future__ import annotations

import datetime
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

# Deliberate cross joins, each bounded by construction:
CARTESIAN_ALLOWLIST = {
    # 1-row aggregate totals broadcast back over the table (quality.py,
    # text.py BM25/OOV corpus stats): N×1, not N×M
    "lineitem_quality_report",
    "bm25_keyword_search",
    "doc_oov_rate",
    "corpus_term_stats",
    "doc_repetition_profile",
    # broadcast date-spine expansion: |weeks| × |groups|, output-sized
    "weekly_revenue_spine",
    "recursive_month_spine",
    # edit-distance short bucket: every in-band pair is a true result,
    # so the cross join is output-sized by definition
    "similar_part_names",
    # scalar subquery / tiny-literal frames the optimizer plans as BNLJ
    "orders_keyset_page",
    "orders_keyset_page_desc",
    # 1-row aggregate theta-joined back over the table (N×1 BNLJ with a
    # broadcast single-row build — same class as the totals broadcasts)
    "wealthy_inactive_customers",
    "nation_value_concentration",
    # int8 quantization: the global scale and the query row's codes are
    # both 1-row broadcasts (N×1 BNLJ), the same scalar-broadcast class
    "ann_topk_int8",
    # the SQ8 shortlist->exact-re-rank hybrid composes the int8 tier's
    # scalar broadcasts (scale + query codes) with a 1-row query-vector
    # broadcast for the exact re-rank — all N×1 BNLJ scalar broadcasts
    "ann_topk_sq8_rerank",
    # deliberate BRUTE-FORCE baselines, each with a bucketed scale path
    # elsewhere in the registry: exact all-pairs Jaccard (scale path:
    # jaccard_join_prefix_filter), exhaustive k-NN probe (scale path:
    # ann_topk_lsh / ann_topk_ivf), exact pairwise series distance over
    # the bounded user dimension
    "ngram_jaccard_pairs",
    "knn_self_join",
    "similar_user_timeseries",
}


def main() -> int:
    out_path = Path(sys.argv[1]) if len(sys.argv) > 1 else REPO / "PLANSHAPE.json"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", str(REPO / "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from etl_demo_spark.plans import plan_digest
    from etl_demo_spark.session import get_spark

    spark = get_spark(app_name="sweep-plans", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    queries = mod.queries()
    results: dict[str, dict] = {}
    t0 = time.time()
    violations: list[str] = []
    for name, fn in queries.items():
        t1 = time.time()
        try:
            df = fn(spark, sf_dir)
            d = plan_digest(df).as_dict()
            d.pop("read_columns", None)  # bulky and churn-prone; keep counters
            d["build_secs"] = round(time.time() - t1, 2)
            results[name] = d
            if d["row_python_stages"]:
                violations.append(f"{name}: {d['row_python_stages']} BatchEvalPython")
            if d["cartesian_joins"] and name not in CARTESIAN_ALLOWLIST:
                violations.append(f"{name}: {d['cartesian_joins']} cartesian joins")
        except Exception as e:  # noqa: BLE001 — sweep records, never dies
            results[name] = {"err": f"{type(e).__name__}: {e}"[:300]}
        print(f"{name}: {json.dumps(results[name])[:120]}", flush=True)

    ok = [r for r in results.values() if "err" not in r]
    meta = {
        "generated_utc": datetime.datetime.now(datetime.timezone.utc).isoformat(
            timespec="seconds"
        ),
        "sf_dir": sf_dir,
        "n_queries": len(results),
        "n_digested": len(ok),
        "n_errors": len(results) - len(ok),
        "total_exchanges": sum(r["exchanges"] for r in ok),
        "row_python_stages_total": sum(r["row_python_stages"] for r in ok),
        "cartesian_outside_allowlist": [
            v for v in violations if "cartesian" in v
        ],
        "violations": violations,
        "wall_secs": round(time.time() - t0, 1),
        "cartesian_allowlist": sorted(CARTESIAN_ALLOWLIST),
    }
    payload = {"_meta": meta, **dict(sorted(results.items()))}
    out_path.write_text(json.dumps(payload, indent=1))
    print(
        f"\n{meta['n_digested']}/{meta['n_queries']} digested, "
        f"{meta['n_errors']} errors, {len(violations)} violations, "
        f"{meta['wall_secs']}s -> {out_path}"
    )
    return 1 if violations or meta["n_errors"] else 0


if __name__ == "__main__":
    raise SystemExit(main())
