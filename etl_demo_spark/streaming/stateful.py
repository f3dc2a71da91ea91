"""Custom stateful streaming operator (X-10/X-11):
``applyInPandasWithState`` — per-key state evolved across micro-batches.

Example operator: per-user running counters (events seen, value sum,
max value) maintained in a GroupState and emitted per batch. This is the
template for custom sessionization, CDC dedup windows, online feature
aggregation — anything Spark's built-in windows can't express.

Scale: state lives in the executor state store partitioned by key; the
only shuffle is the groupBy(user_id) hash exchange. Arrow-batched both
directions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double, max_value double"
STATE_SCHEMA = "n long, total double, mx double"


def user_running_counters(events: DataFrame) -> DataFrame:
    """Stateful per-user counters over a stream (update mode).

    The state-update function is NESTED so cloudpickle serializes it by
    value — executor Python workers don't have this package on their
    sys.path (module-level functions pickle by reference and fail with
    ModuleNotFoundError on the workers)."""

    def update(key, pdfs, state):
        import math

        import pandas as pd

        # state keeps max as -inf internally (tuple state can't hold None
        # cleanly); the OUTPUT maps it back to NULL so the sentinel never
        # leaks. NULL values: n_events counts rows, total/max skip NaNs
        # (pandas sum/max skipna), and an all-NULL key emits a NULL max —
        # never -inf or NaN.
        if state.exists:
            n, total, mx = state.get
        else:
            n, total, mx = 0, 0.0, float("-inf")
        for pdf in pdfs:
            n += len(pdf)
            sub = float(pdf["value"].sum())  # skipna: NULLs contribute 0
            if not math.isnan(sub):
                total += sub
            batch_max = pdf["value"].max()  # NaN iff no non-null values
            if batch_max is not None and not pd.isna(batch_max):
                mx = max(mx, float(batch_max))
        state.update((n, total, mx))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [total],
                "max_value": [None if math.isinf(mx) else mx],
            }
        )

    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
