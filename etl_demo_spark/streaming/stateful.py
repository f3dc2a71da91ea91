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
from pyspark.sql import functions as F
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


TWS_OUTPUT_SCHEMA = (
    "user_id long, n_types long, n_events long, total_value double"
)


def transform_with_state_available() -> bool:
    """True when the transformWithState v2 worker protocol can run here
    (its state-server RPC needs a protobuf runtime).

    In this repo that is ALWAYS satisfiable: when the real wheel is
    absent, the repo-root ``google/protobuf`` façade (backed by
    ``etl_demo_spark.protoshim`` — a minimal pure-Python wire-format +
    descriptor runtime) serves the generated StateMessage module, and
    ``session.get_spark`` exports it to the JVM-spawned worker processes
    via PYTHONPATH before the first launch. The probe still exists for
    zip-deployed environments where neither is importable."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def _ensure_protoshim_env(events: DataFrame) -> None:
    """Companion to session._export_protoshim_path for sessions built
    WITHOUT get_spark (the external driver constructs its own): the
    transformWithState runners spawn their Python processes with the env
    vars captured in ``sc.environment`` (they become
    ``PythonFunction.envVars``), so injecting the repo root there puts
    the ``google/protobuf`` façade on the spawned workers' import path
    even though the JVM's own env is already frozen. No-op when the real
    protobuf wheel is installed (never shadow it) or the shim isn't on
    disk. Must run BEFORE the transformWithStateInPandas plan is built —
    the env dict is read when the UDF object is created."""
    import os
    from pathlib import Path

    try:
        from importlib.metadata import PackageNotFoundError, version

        version("protobuf")
        return
    except PackageNotFoundError:
        pass
    except Exception:
        return
    repo = str(Path(__file__).resolve().parents[2])
    if not (Path(repo) / "google" / "protobuf").is_dir():
        return
    env = events.sparkSession.sparkContext.environment
    existing = env.get("PYTHONPATH") or os.environ.get("PYTHONPATH", "")
    if repo not in existing.split(os.pathsep):
        env["PYTHONPATH"] = repo + (os.pathsep + existing if existing else "")


def user_type_profile(events: DataFrame) -> DataFrame:
    """Per-user activity profile via ``transformWithStateInPandas`` — the
    Spark 4 arbitrary-stateful API (state v2): TYPED state variables per
    key instead of one opaque tuple. A ``ValueState`` carries the event
    count + value sum; a ``MapState`` keyed by event_type carries per-type
    counts, so ``n_types`` is the user's distinct-event-type count evolved
    incrementally across micro-batches (no rescan of history).

    Requires the RocksDB state store provider (the v2 operator does not
    run on the default HDFS-backed store) — callers set
    ``spark.sql.streaming.stateStore.providerClass =
    org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider``
    before starting the stream.

    Protobuf: the v2 operator's Python worker talks to the state server
    over protobuf. Where the real wheel is absent (this container), the
    repo's ``google/protobuf`` façade over ``etl_demo_spark.protoshim``
    supplies the runtime and ``get_spark`` exports it to the spawned
    workers — so the operator runs UN-gated here (end-to-end in
    tests/test_streaming.py and the oracled `stream_user_type_profile`
    corpus query). :func:`transform_with_state_available` remains the
    probe for deployments where neither runtime is importable.

    The processor class is defined INSIDE the function so cloudpickle
    serializes it by value (executor workers don't have this package on
    sys.path). Works on batch frames too: Spark runs the same operator
    with transient state, which is how the unit test pins final-state ==
    batch-aggregate equivalence."""
    _ensure_protoshim_env(events)
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class Profile(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", "n long, total double")
            self._per_type = handle.getMapState(
                "type_counts", "event_type string", "n long"
            )

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            if self._totals.exists():
                n, total = self._totals.get()
            else:
                n, total = 0, 0.0
            for pdf in rows:
                n += len(pdf)
                s = pdf["value"].sum()  # skipna — all-NULL batch sums to 0.0
                if not pd.isna(s):
                    total += float(s)
                for et, c in pdf["event_type"].value_counts().items():
                    prev = (
                        self._per_type.getValue(et)[0]
                        if self._per_type.containsKey(et)
                        else 0
                    )
                    self._per_type.updateValue(et, (prev + int(c),))
            self._totals.update((n, total))
            n_types = sum(1 for _ in self._per_type.keys())
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_types": [n_types],
                    "n_events": [n],
                    "total_value": [total],
                }
            )

        def close(self) -> None:
            pass

    return (
        events.select("user_id", "event_type", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=Profile(),
            outputStructType=TWS_OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )


def user_recent_events(events: DataFrame, k: int = 5) -> DataFrame:
    """Last-k events per user via transformWithState ``ListState`` — the
    bounded-buffer shape (recent-activity panels, feature windows,
    replay caches). Each batch merges the incoming rows into the stored
    list, keeps the k latest by (ts_ms, event_id) — a deterministic total
    order — and emits the kept count and value sum.

    Protocol note: ListState moves its elements over the state server's
    Arrow path (`ListStateGet`/`ListStatePut` with fetchWithArrow), so
    this operator exercises the list half of the v2 protocol that
    `user_type_profile`'s ValueState/MapState does not; together they
    cover every message family the worker client sends. Runs on the
    repo's protoshim runtime where the protobuf wheel is absent.

    Scale: state is O(users × k) tuples, each micro-batch touches only
    keys present in the batch; emit is one row per touched key (update
    mode)."""
    _ensure_protoshim_env(events)
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RecentK(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._recent = handle.getListState(
                "recent", "ts_ms long, event_id long, value double"
            )

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            kept = list(self._recent.get()) if self._recent.exists() else []
            for pdf in rows:
                kept.extend(
                    (int(t), int(e), float(v))
                    for t, e, v in zip(pdf["ts_ms"], pdf["event_id"], pdf["value"])
                )
            kept.sort(key=lambda r: (r[0], r[1]))
            kept = kept[-k:]
            self._recent.put([tuple(r) for r in kept])
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_kept": [len(kept)],
                    "kept_value_sum": [round(sum(r[2] for r in kept), 4)],
                }
            )

        def close(self) -> None:
            pass

    return (
        events.select(
            "user_id",
            (F.unix_millis(F.col("ts"))).alias("ts_ms"),
            "event_id",
            "value",
        )
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=RecentK(),
            outputStructType="user_id long, n_kept long, kept_value_sum double",
            outputMode="Update",
            timeMode="None",
        )
    )


def user_inactivity_expiry(
    events: DataFrame, gap_ms: int = 3_600_000, watermark: str = "0 seconds"
) -> DataFrame:
    """Inactivity detection via transformWithState EVENT-TIME TIMERS: on
    every batch each user's single timer is re-registered to
    last_seen + gap; when the watermark passes a timer, the expiry
    callback emits ``(user_id, last_seen_ms, expired=true)`` and clears
    the user's state — the session-timeout / abandoned-cart / liveness
    shape, with the engine (not the operator) responsible for firing.

    Protocol note: exercises the timer family of the v2 worker protocol
    (RegisterTimer/DeleteTimer/ListTimers + the expiry-timer iterator —
    `StateResponseWithTimer`, whose TimerInfo carries a proto3-optional
    field, the one presence form nothing else in the protocol uses).

    Scale: one ValueState tuple + one timer per live user; expired keys
    delete their state, so state tracks LIVE users, not ever-seen users.
    """
    _ensure_protoshim_env(events)
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class Inactivity(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            self._last = handle.getValueState("last_seen", "ts_ms long")

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            last = self._last.get()[0] if self._last.exists() else None
            mx = last
            for pdf in rows:
                bmax = int(pdf["ts_ms"].max())
                mx = bmax if mx is None else max(mx, bmax)
            if last is not None:
                self._handle.deleteTimer(last + gap_ms)
            self._last.update((mx,))
            self._handle.registerTimer(mx + gap_ms)
            return iter(())  # emits only on expiry

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            import pandas as pd

            last = self._last.get()[0] if self._last.exists() else None
            self._last.clear()
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "last_seen_ms": [last],
                    "expired_at_ms": [expiredTimerInfo.getExpiryTimeInMs()],
                }
            )

        def close(self) -> None:
            pass

    return (
        events.withWatermark("ts", watermark)
        .select(
            "user_id", F.unix_millis(F.col("ts")).alias("ts_ms"), F.col("ts")
        )
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=Inactivity(),
            outputStructType="user_id long, last_seen_ms long, expired_at_ms long",
            outputMode="Update",
            timeMode="EventTime",
        )
    )
