"""etl_demo_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference repo ``ohusiev/etl-demo`` (see SURVEY.md), plus
the large-scale pipeline operators (dedup, similarity search, text analysis,
streaming) that a 100 TB training-data pipeline needs.

Design posture (SURVEY.md §4/§7):
  * DataFrame/SQL end-to-end; lazy plans, one action per sink.
  * ``spark.sql.ansi.enabled=false`` so coerce-to-NULL parsing and
    div-by-zero→NULL match the reference semantics exactly.
  * AQE on; broadcast small dimensions; no driver-side collects in the
    hot path.

Public surface (import submodules for the full toolkit):
  * ``session.get_spark`` — the engine's session posture.
  * ``pipelines.weekly_trades.run_etl`` — reference-parity ETL.
  * ``pipelines.corpus_prep.run_corpus_prep`` — training-data prep.
  * ``ops`` — relational verbs, as-of join, salting, MERGE/SCD2,
    incremental aggregate maintenance.
  * ``dedup`` / ``vec`` / ``text`` — LLM-pipeline operators.
  * ``io.layout`` — Z-order writes, compaction, file inventory.
  * ``plans.plan_digest`` — physical-plan introspection.
"""

from etl_demo_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
