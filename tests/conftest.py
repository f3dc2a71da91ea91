from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

SF0001 = "/root/testdata/sf0.001"
SF001 = "/root/testdata/sf0.01"

# --------------------------------------------------------------------------
# `pytest -m core` — the fast verification subset (round 11, VERDICT ask:
# the full suite is ~60 min and the driver's pytest run times out; this
# gives a <10-min gate covering the entry contract, golden parity, the
# headline queries' oracle checks, and one representative test per
# operator family). Selection is by nodeid here instead of decorating 20
# files — one curated list, zero churn in the test bodies.
# --------------------------------------------------------------------------

CORE_NODEIDS = {
    # driver contract + registry integrity + bench contract
    "test_entry.py::test_entry_smoke",
    "test_entry.py::test_every_oracle_key_has_query",
    "test_entry.py::test_corpus_registry_integrity",
    "test_entry.py::test_doc_totals_match_registry",
    # golden reference parity (surface 2)
    "test_trades_golden.py::test_agg_matches_golden_db",
    # one per operator family
    "test_llm_ops.py::test_minhash_lsh_finds_planted_near_dup",
    "test_expr_sql_parity.py",  # whole file: SQL fast-path drift alarms
    "test_plan_dump_pins.py",  # whole file: committed-dump drift alarms
    "test_ops_units.py::test_week_bucket_year_boundary",
    "test_streaming.py::test_stream_equals_batch_hourly",
    "test_manifest.py::test_manifest_init_and_read_round_trip",
    "test_manifest.py::test_manifest_merge_semantics_and_blast_radius",
    "test_mv.py::test_incremental_fold_insert_update_delete",
    "test_catalog.py::test_transfer_is_atomic_through_the_catalog",
    "test_table_stream.py::test_full_history_delivery_with_commit_attribution",
    "test_tables.py::test_merge_partitioned_rewrites_only_affected",
    "test_io.py::test_parquet_roundtrip_partitioned",
    "test_jpeg.py",  # whole file: multimodal decode (fast pure-python)
    "test_bucketed.py",
    "test_branches.py",
}

# headline queries' oracle rows (the driver's own t2 check, one per
# headline operator; minhash_near_dup is rows-only by design and is
# covered by the planted-near-dup test above)
CORE_ORACLE_QUERIES = {
    "flagship_weekly_revenue", "pricing_summary", "regional_revenue",
    "orders_running_total", "nation_product_profit", "waiting_suppliers",
    "weekly_trades_pnl", "exact_dedup_fingerprint", "bm25_keyword_search",
    "lineitem_quality_report", "corpus_prep_pipeline", "ann_topk_bruteforce",
    "media_features", "stream_hourly_event_stats",
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "core: fast verification subset (see conftest.CORE_NODEIDS)"
    )


def pytest_collection_modifyitems(config, items):
    for item in items:
        nodeid = item.nodeid.replace("tests/", "", 1)
        base = nodeid.split("[", 1)[0]
        fname = nodeid.split("::", 1)[0]
        is_core = (
            nodeid in CORE_NODEIDS
            or base in CORE_NODEIDS
            or fname in CORE_NODEIDS
            or (
                base == "test_entry.py::test_query_matches_oracle"
                and nodeid.split("[", 1)[1].rstrip("]") in CORE_ORACLE_QUERIES
            )
        )
        if is_core:
            item.add_marker(pytest.mark.core)


@pytest.fixture(scope="session")
def spark():
    from etl_demo_spark.session import get_spark

    # Small shuffle-partition count keeps tiny-fixture tests fast; prod
    # posture is exercised via config assertions, not test wall-clock.
    s = get_spark(app_name="etl_demo_spark-tests", shuffle_partitions=8)
    yield s
