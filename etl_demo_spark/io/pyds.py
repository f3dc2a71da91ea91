"""Registration helper for the repo's Python DataSources.

``spark.dataSource.register`` pickles the DataSource CLASS; by default
cloudpickle serializes it BY REFERENCE ("import this name"), which makes
the driver-side planning worker and the executor workers need
``etl_demo_spark`` on their import path. That holds when the session was
launched by `session.get_spark` (PYTHONPATH export) or from the repo
root (``python -m`` workers put the cwd on sys.path), but a user who
builds their own SparkSession from an arbitrary cwd gets
``ModuleNotFoundError: etl_demo_spark`` at stream planning time — the
worker is a fresh interpreter the driver's ``sys.path`` edits never
reach.

Fix at the root: register the DataSource's MODULE for pickle-BY-VALUE
(cloudpickle ships the class body and the module globals it references
inside the pickle itself), so unpickling needs only pyspark + stdlib.
The repo's DataSource modules are written to be self-contained for
exactly this reason; anything heavier (the table-stream source's
manifest resolution) is lazy-imported behind a baked-in path bootstrap.
"""

from __future__ import annotations

import sys
from typing import Any


def register_data_source(spark: Any, ds_class: type) -> None:
    """Register ``ds_class`` with its defining module pickled by value —
    idempotent, like every register_* helper in this package."""
    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[ds_class.__module__])
    spark.dataSource.register(ds_class)
