"""SparkSession factory with the engine's config posture.

Scale notes (100 TB design, local[32] test): every knob here is chosen so the
same code runs unchanged on a 1000-executor cluster —

* ``spark.sql.adaptive.enabled`` — AQE re-plans at runtime: coalesces small
  shuffle partitions, converts sort-merge joins to broadcast when the built
  side turns out small, and splits skewed partitions. This is the main
  defense against skew at 100 TB.
* ``spark.sql.ansi.enabled=false`` — the reference's cleaning semantics
  (garbage→NULL casts, div-by-zero→NULL; SURVEY.md §2.1 O-4/O-5/O-13)
  require non-ANSI evaluation. Spark 4 defaults to ANSI on, so we must set
  this explicitly.
* ``spark.sql.session.timeZone=UTC`` — deterministic date/ts semantics and
  parity with the DuckDB oracle (naive timestamps).
* Arrow on — every pandas_udf / applyInPandas / toPandas crossing is
  Arrow-batched, never row-at-a-time pickling.
* ``spark.sql.shuffle.partitions`` — sized to cores locally; on a real
  cluster AQE coalescing makes the static number mostly irrelevant as long
  as it is not too small.
"""

from __future__ import annotations

import os
from pathlib import Path

from pyspark.sql import SparkSession


def real_protobuf_installed() -> bool:
    """Single authority on "is the real protobuf wheel installed here":
    both the PYTHONPATH export below and __spark_entry__'s executor-zip
    packaging ask THIS function, so the two can never disagree. Failure
    default is deliberately conservative: an unexpected metadata error
    reads as INSTALLED — the shim must never shadow a real distribution,
    while a missing shim only costs the transformWithState feature (which
    fails loudly). Probes the DRIVER environment; the executor decision
    assumes the cluster's Python environments are homogeneous (the normal
    posture) — on a heterogeneous cluster, install the wheel everywhere
    or delete the repo's google/ directory and ship your own."""
    try:
        from importlib.metadata import PackageNotFoundError, version

        version("protobuf")
        return True
    except PackageNotFoundError:
        return False
    except Exception:
        return True


def _export_protoshim_path() -> None:
    """Make the repo-local ``google.protobuf`` shim importable in the
    Python processes the JVM spawns (executor workers AND the
    transformWithState driver worker, which is launched with the JVM's
    PYTHONPATH env — sys.path edits in THIS process never reach it).

    Only fires when the real protobuf wheel is not installed: if it is,
    the shim must NOT shadow it, and the spawned workers already have it
    via site-packages. Must run before the first JVM launch; a no-op for
    an already-running session (documented limitation: call get_spark
    before building any transformWithState plan)."""
    if real_protobuf_installed():
        return  # never shadow the real wheel
    repo_root = str(Path(__file__).resolve().parent.parent)
    if not (Path(repo_root) / "google" / "protobuf").is_dir():
        return  # shim not shipped alongside this package (e.g. zip deploy)
    existing = os.environ.get("PYTHONPATH", "")
    if repo_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            repo_root + (os.pathsep + existing if existing else "")
        )


def get_spark(
    app_name: str = "etl_demo_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's posture.

    If a session already exists, Spark returns it (configs on an existing
    session are not re-applied — tests share one session via conftest).
    """
    # read the env once per call: deriving master AND shuffle partitions
    # from the same read keeps them consistent even when a harness sets
    # SPARK_GRAFT_CPUS after this module was imported
    _export_protoshim_path()
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # cpus may legitimately be non-numeric ('*' is a valid local[...] token);
    # shuffle width then falls back to a sane default instead of raising
    cpus_n = int(cpus) if cpus.isdigit() else 32
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or cpus_n),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.python.filterPushdown.enabled", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
