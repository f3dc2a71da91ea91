"""Scoped caching for operator-internal persists.

Several operators persist an intermediate DataFrame they fan out over
(the shingle table in the prefix-filter similarity join, the session
table in the concurrent-session range join, the group-grain aggregate in
the trades pipeline). Those handles are internal — callers never see
them — so nothing ever unpersisted them, and repeated invocations (the
bench warm+timed loops, a 147-query sweep, a long-lived server session)
accumulated cached tables until LRU eviction (the
``CacheManager: Asked to cache already cached data`` warnings in the
round-2 bench tail).

Policy: operators persist through :func:`tracked_persist`; the corpus
query wrapper calls :func:`release_persisted` when the NEXT query starts,
by which point the previous query's result has been consumed. Releasing
is always safe — an unpersisted plan silently recomputes — so even a
caller that holds a stale result DataFrame gets correct (just slower)
answers. Long-lived applications can call :func:`release_persisted`
directly at their own unit-of-work boundaries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_LIVE: list[DataFrame] = []


def tracked_persist(df: DataFrame, storage_level=None) -> DataFrame:
    """``df.persist()`` + registration for later bulk release."""
    persisted = df.persist(storage_level) if storage_level is not None else df.persist()
    _LIVE.append(persisted)
    return persisted


def release_persisted() -> int:
    """Unpersist every tracked DataFrame; returns how many were released.

    Dead-session handles are ignored (a restarted SparkSession leaves
    stale JVM references behind; those tables died with the old context).
    """
    n = 0
    for df in _LIVE:
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass
    _LIVE.clear()
    return n
