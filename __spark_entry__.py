"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check on sf0.001.
``queries()`` / ``oracle_sql()`` — the operator corpus from SURVEY.md §2,
implemented in ``etl_demo_spark.corpus`` and re-exported here.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from etl_demo_spark import corpus  # noqa: E402

SF0001 = "/root/testdata/sf0.001"

_SHIPPED_SESSIONS: set[int] = set()


def _real_protobuf_installed() -> bool:
    # single probe shared with session._export_protoshim_path — the two
    # decisions (export the shim to spawned workers / ship it in the
    # executor zip) must never disagree about the same environment
    from etl_demo_spark.session import real_protobuf_installed

    return real_protobuf_installed()


def _engine_posture(spark: SparkSession) -> None:
    """Apply the engine's session posture to a caller-owned session.

    The driver builds its own SparkSession (Spark 4 defaults: ANSI ON).
    This engine's semantics require non-ANSI evaluation — coerce-to-NULL
    casts (O-4/O-5), div-by-zero→NULL (O-13), and wrapping long arithmetic
    in the MinHash/SimHash hash families — so set it explicitly on every
    entry point (runtime-settable conf)."""
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def _ship_package(spark: SparkSession) -> None:
    """Make etl_demo_spark importable on executor Python workers.

    The driver process gets the package via the sys.path insert above, but
    executor workers are separate interpreters: any UDF pickled by
    reference needs the package on their path too. Zip it once per session
    and addPyFile — harmless in local mode, required on a real cluster."""
    key = id(spark)
    if key in _SHIPPED_SESSIONS:
        return
    import os
    import tempfile
    import zipfile

    # pid-unique path: concurrent driver processes must not clobber each
    # other's zip mid-addPyFile
    zpath = Path(tempfile.gettempdir()) / f"etl_demo_spark_pkg_{os.getpid()}.zip"
    pkg = Path(_REPO) / "etl_demo_spark"
    with zipfile.ZipFile(zpath, "w") as zf:
        for p in sorted(pkg.rglob("*.py")):
            zf.write(p, p.relative_to(Path(_REPO)))
        # the google/protobuf façade rides along so transformWithState's
        # worker protocol runs on executors without the protobuf wheel
        # (see etl_demo_spark/protoshim) — but NEVER when the real wheel
        # is installed here: addPyFile zips precede site-packages on the
        # workers' sys.path, and shadowing the full distribution with the
        # StateMessage-slice shim would break any other protobuf use.
        # The probe reads the DRIVER env and assumes homogeneous cluster
        # Python environments (see session.real_protobuf_installed)
        shim = Path(_REPO) / "google"
        if shim.is_dir() and not _real_protobuf_installed():
            for p in sorted(shim.rglob("*.py")):
                zf.write(p, p.relative_to(Path(_REPO)))
    spark.sparkContext.addPyFile(str(zpath))
    _SHIPPED_SESSIONS.add(key)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _engine_posture(spark)
    _ship_package(spark)
    return corpus.flagship_weekly_revenue(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def wrap(fn: corpus.QueryFn) -> corpus.QueryFn:
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _engine_posture(spark)
            _ship_package(spark)
            return fn(spark, sf_dir)

        run.__name__ = fn.__name__
        run.__doc__ = fn.__doc__
        return run

    return {name: wrap(fn) for name, fn in corpus.QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query (omissions → rows-only check)."""
    return dict(corpus.ORACLES)
