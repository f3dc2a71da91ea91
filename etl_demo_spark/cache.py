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
answers.

Ownership: the no-argument ``release_persisted()`` releases EVERY tracked
cache — the right call at a single-threaded unit-of-work boundary (one
query at a time: the driver, the bench, the sweep, ``run_etl``), and the
documented assumption of that default. An application interleaving
several in-flight units of work in one session (or across driver threads)
must scope instead: pass ``scope=`` a token of its choosing to
``tracked_persist`` and release only that token's caches — otherwise one
unit's boundary would demote another's still-hot caches to recompute.
The registry itself is lock-guarded, so concurrent threads can't corrupt
the list; what the lock can NOT arbitrate is cross-unit release policy —
that's what the tokens are for.
"""

from __future__ import annotations

import itertools
import os
import threading

from pyspark.sql import DataFrame

_LOCK = threading.Lock()
_LIVE: list[tuple[object, DataFrame]] = []
_VIEWS: list[tuple[object, object, str]] = []  # (scope, sparkSession, name)
_VIEW_SEQ = itertools.count()
_ALL = object()  # sentinel: release regardless of scope


def tracked_persist(
    df: DataFrame, storage_level=None, scope: object = None
) -> DataFrame:
    """``df.persist()`` + registration for later bulk release.

    ``scope`` tags the cache with an ownership token; ``None`` (the
    default) is itself a token — the shared "current unit of work" pool
    that the no-argument :func:`release_persisted` empties."""
    persisted = df.persist(storage_level) if storage_level is not None else df.persist()
    with _LOCK:
        _LIVE.append((scope, persisted))
    return persisted


def tracked_view(df: DataFrame, tag: str, scope: object = None) -> str:
    """Register ``df`` as a process-unique temp view and track the name
    for release at the unit-of-work boundary.

    Exists for the one-shot SQL compositions (dedup.py round 11): they
    need a catalog name to splice a DataFrame into a spark.sql() string.
    The name must NOT be dropped eagerly — ``dropTempView`` (and the
    replace in ``createOrReplaceTempView``) runs CacheManager's uncache
    on the view's plan, which silently UNPERSISTS any just-persisted
    DataFrame the view wraps (measured: the minhash banded cache died
    this way and the whole LSH pipeline recomputed once per plan branch
    — 3 scans became 12). Dropping at :func:`release_persisted` time is
    safe: the caches are being released there anyway."""
    name = f"__{tag}_{os.getpid()}_{next(_VIEW_SEQ)}"
    df.createOrReplaceTempView(name)
    with _LOCK:
        _VIEWS.append((scope, df.sparkSession, name))
    return name


def release_persisted(scope: object = _ALL) -> int:
    """Unpersist tracked DataFrames; returns how many were released.

    With no argument releases EVERYTHING (single-threaded unit-of-work
    boundary — see the module docstring for when that is and isn't
    valid); with ``scope=token`` releases only caches registered under
    that token, leaving other units' caches hot.

    Dead-session handles are ignored (a restarted SparkSession leaves
    stale JVM references behind; those tables died with the old context).
    """
    with _LOCK:
        if scope is _ALL:
            victims, keep = _LIVE[:], []
            view_victims, view_keep = _VIEWS[:], []
        else:
            victims = [e for e in _LIVE if e[0] == scope]
            keep = [e for e in _LIVE if e[0] != scope]
            view_victims = [e for e in _VIEWS if e[0] == scope]
            view_keep = [e for e in _VIEWS if e[0] != scope]
        _LIVE[:] = keep
        _VIEWS[:] = view_keep
    n = 0
    for _, df in victims:
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass
    for _, spark, name in view_victims:
        try:
            spark.catalog.dropTempView(name)
        except Exception:
            pass
    return n
