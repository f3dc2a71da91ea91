"""Incrementally-maintained MATERIALIZED VIEWS over the manifest change
feed: a grouped-aggregate table that refreshes by folding the row-level
diff of its base table instead of recomputing from all history.

This is the consumer the change feed (`io/manifest.py:read_changes`) was
built for, and the piece a 100 TB deployment needs most: a nightly
dashboard aggregate over a petabyte fact table must not re-scan the
fact table because one partition's CDC merge landed. The refresh cost
here is O(changed leaves) to read the diff + O(affected groups) to fold
it — never O(history).

Maintenance strategy (the classic incremental-view-maintenance split):

* **Decomposable aggregates** — COUNT(*), COUNT(col), SUM, AVG (stored
  as sum+count) — fold as SIGNED deltas: an ``insert`` change
  contributes +value, a ``delete`` contributes -value. No base-table
  access at all.
* **Non-decomposable under deletes** — MIN/MAX — fold inserts cheaply
  (``least``/``greatest`` against the stored extremum); a delete can
  only change the extremum if the deleted value TIES OR CROSSES the
  stored extremum, so exactly those groups get their MIN/MAX re-derived
  from the base snapshot, restricted to those groups (a broadcast
  semi-join; with `stats_cols` on the group key the manifest prunes the
  re-read to intersecting files). An UPDATE of a non-extreme row —
  the overwhelmingly common case — folds without any base access.

Exactly-once refresh protocol: each refresh first CAS-publishes an
INTENT file recording ``(mv_version_it_will_produce, base_from,
base_to)``, then applies the fold through one atomic
`merge_upsert_manifested` commit. A crash between the two leaves the
intent pending; the next refresh detects ``intent.mv_version ==
current_mv_version + 1`` and RE-RUNS the recorded fold — deterministic,
because both snapshots are immutable — before advancing. Two concurrent
refreshers race the intent CAS and exactly one proceeds. The watermark
("MV reflects base version B") is therefore always derivable from the
newest intent at-or-below the MV's current manifest version; it is
never stored separately from the commit that made it true.

Group liveness: a group whose row count folds to zero becomes a
TOMBSTONE row (``_n = 0``) so the whole refresh stays ONE upsert-shaped
atomic commit; `mv_read` filters tombstones out and `mv_vacuum`
physically drops them. The MV itself is a manifested table partitioned
by a stable hash bucket of the group key, so a refresh rewrites only
the buckets containing affected groups and readers time-travel /
snapshot-read it like any other manifested table.

Retention contract: incremental refresh needs ``base_from`` still
retained on the base table (the change feed reads both snapshots). A
refresh that lagged past the base's retention window falls back to a
FULL recompute at the current base snapshot — same atomic commit shape
— and a pending intent whose snapshots have been expired raises
`MVStaleError` (runbook: drop and recreate; size base retention to
exceed refresh lag).

Reference parity: the reference (`etl_weekly_trades.py:107-156`)
recomputes its weekly aggregate from the full trades frame on every
run and appends to SQLite; this module is the engine-grade replacement
for exactly that nightly-recompute pattern.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_demo_spark.io.manifest import (
    _hadoop_fs,
    _load_doc,
    _publish_cas,
    _read_file,
    manifest_versions,
    merge_upsert_manifested,
    read_changes,
    read_manifested,
    write_manifested,
)

_MV_DIR = "_mv"
_KINDS = ("count", "sum", "avg", "min", "max")


class MVStaleError(RuntimeError):
    """The MV fell outside its base table's retention window (or a
    pending intent's snapshots were expired): incremental refresh is
    impossible and the recorded fold cannot be replayed. Drop and
    recreate the view."""


class MVConcurrentRefreshError(RuntimeError):
    """Another refresher holds the intent for the next MV version."""


# ---------------------------------------------------------------- sidecar


def _mv_path(mv_root: str, name: str) -> str:
    return f"{mv_root.rstrip('/')}/{_MV_DIR}/{name}"


def _load_json(fs, jvm, path: str) -> dict | None:
    if not fs.exists(jvm.org.apache.hadoop.fs.Path(path)):
        return None
    return json.loads(_read_file(fs, jvm, path).decode("utf-8"))


def _load_spec(fs, jvm, mv_root: str) -> dict:
    spec = _load_json(fs, jvm, _mv_path(mv_root, "spec.json"))
    if spec is None:
        raise ValueError(
            f"{mv_root} is not a materialized view (no {_MV_DIR}/spec.json); "
            "a crash during mv_create leaves a partial directory — delete "
            "it and re-create"
        )
    return spec


def _load_intent(fs, jvm, mv_root: str, mv_version: int) -> dict | None:
    return _load_json(fs, jvm, _mv_path(mv_root, f"intent_v{mv_version}.json"))


def _publish_intent(fs, jvm, mv_root: str, intent: dict) -> bool:
    return _publish_cas(
        fs,
        jvm,
        _mv_path(mv_root, f"intent_v{intent['mv_version']}.json"),
        json.dumps(intent, sort_keys=True).encode("utf-8"),
    )


def mv_watermark(spark: SparkSession, mv_root: str) -> int:
    """The base-table version this MV currently reflects: the newest
    APPLIED intent — i.e. the intent for the highest MV manifest version
    at-or-below the MV's current version. Metadata-only."""
    fs, jvm = _hadoop_fs(spark, mv_root)
    cur = manifest_versions(spark, mv_root)[-1]
    for v in range(cur, 0, -1):
        intent = _load_intent(fs, jvm, mv_root, v)
        if intent is not None:
            return int(intent["base_to"])
    raise ValueError(f"{mv_root}: no applied intent found (corrupt sidecar)")


# ------------------------------------------------------------- state shape


def _validate(keys: list[str], aggs: dict) -> None:
    reserved = {"_n", "mv_bucket", "_change_type"}
    for out, (kind, col) in aggs.items():
        if kind not in _KINDS:
            raise ValueError(f"agg kind {kind!r} for {out!r}; want {_KINDS}")
        if kind != "count" and col is None:
            raise ValueError(f"{kind} aggregate {out!r} needs a column")
        if out in keys or out in reserved or out.startswith(("_s_", "_nn_")):
            raise ValueError(f"output name {out!r} collides with MV internals")


def _derive(df: DataFrame, derived: dict[str, str]) -> DataFrame:
    if not derived:
        return df
    return df.selectExpr("*", *[f"{e} AS {n}" for n, e in derived.items()])


def _zero(dtype: str):
    return F.lit(0).cast(dtype)


def _full_state(df: DataFrame, keys: list[str], aggs: dict) -> DataFrame:
    """Aggregate a base snapshot into the internal state schema."""
    dtypes = dict(df.dtypes)
    exprs = [F.count(F.lit(1)).alias("_n")]
    for out, (kind, col) in aggs.items():
        if kind == "count":
            src = F.count(col) if col else F.count(F.lit(1))
            exprs.append(src.alias(f"_s_{out}"))
        elif kind in ("sum", "avg"):
            exprs.append(
                F.sum(F.coalesce(F.col(col), _zero(dtypes[col]))).alias(f"_s_{out}")
            )
            exprs.append(F.count(col).alias(f"_nn_{out}"))
        else:  # min / max
            fn = F.min if kind == "min" else F.max
            exprs.append(fn(col).alias(f"_s_{out}"))
    return df.groupBy(*keys).agg(*exprs)


def _bucketed(df: DataFrame, keys: list[str], buckets: int) -> DataFrame:
    return df.withColumn(
        "mv_bucket",
        F.pmod(F.xxhash64(*[F.col(k) for k in keys]), F.lit(buckets)).cast(
            "string"
        ),
    )


# ---------------------------------------------------------------- create


def mv_create(
    spark: SparkSession,
    base_root: str,
    mv_root: str,
    keys: list[str],
    aggs: dict[str, tuple[str, str | None]],
    derived: dict[str, str] | None = None,
    buckets: int = 16,
    fmt: str = "parquet",
) -> int:
    """CREATE MATERIALIZED VIEW: full-compute the grouped aggregate at
    the base table's CURRENT snapshot and persist it as a manifested
    table ready for incremental `mv_refresh`.

    ``aggs`` maps output column → ``(kind, source_col)`` with kind in
    {'count','sum','avg','min','max'} (``('count', None)`` is COUNT(*)).
    ``derived`` maps extra column names to SQL expressions projected
    onto the base before aggregating (e.g. an exact-DECIMAL cast of a
    double measure) — stored as SQL strings in the spec so every future
    refresh replays them identically.

    Returns the base version the view was built at. One full base scan
    — the last one this aggregate ever needs."""
    derived = dict(derived or {})
    _validate(keys, aggs)
    fs, jvm = _hadoop_fs(spark, mv_root)
    base_v = manifest_versions(spark, base_root)[-1]
    base = _derive(read_manifested(spark, base_root, fmt, version=base_v), derived)
    state = _bucketed(_full_state(base, keys, aggs), keys, buckets)
    write_manifested(state, mv_root, "mv_bucket", fmt)
    ok = _publish_intent(
        fs,
        jvm,
        mv_root,
        {"mv_version": 1, "base_from": None, "base_to": base_v, "full": True},
    )
    ok = ok and _publish_cas(
        fs,
        jvm,
        _mv_path(mv_root, "spec.json"),
        json.dumps(
            {
                "base_root": base_root.rstrip("/"),
                "keys": keys,
                "aggs": {o: [k, c] for o, (k, c) in aggs.items()},
                "derived": derived,
                "buckets": buckets,
                "fmt": fmt,
            },
            sort_keys=True,
        ).encode("utf-8"),
    )
    if not ok:
        raise MVConcurrentRefreshError(
            f"{mv_root}: lost the create race (sidecar already published)"
        )
    return base_v


# ----------------------------------------------------------------- refresh


def _fold_incremental(
    spark: SparkSession, spec: dict, mv_root: str, v_from: int, v_to: int
) -> tuple[DataFrame, int]:
    """Signed-delta fold of the base change feed into new absolute state
    rows for every affected group. Returns (source, recompute_groups)."""
    keys = spec["keys"]
    aggs = {o: tuple(kc) for o, kc in spec["aggs"].items()}
    # EVENTS when the range is fully covered by change sidecars +
    # structural appends (change_feed tables): the fold then reads
    # O(changed rows) instead of whole-leaf EXCEPT ALLs. Intra-range
    # churn folds identically through the signed delta; the MIN/MAX
    # delete-side repair below stays conservative under events (a value
    # inserted and deleted inside the range still triggers repair when
    # it ties-or-crosses the stored extremum).
    from etl_demo_spark.io.manifest import read_change_events

    try:
        feed = read_change_events(
            spark, spec["base_root"], v_from, v_to, spec["fmt"]
        )
    except ValueError:
        feed = read_changes(spark, spec["base_root"], v_from, v_to, spec["fmt"])
    ch = _derive(feed, spec["derived"])
    dtypes = dict(ch.dtypes)
    sign = F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(F.lit(-1))

    exprs = [F.sum(sign).alias("__d_rows")]
    for out, (kind, col) in aggs.items():
        if kind == "count":
            contrib = (
                sign * F.when(F.col(col).isNotNull(), 1).otherwise(0)
                if col
                else sign
            )
            exprs.append(F.sum(contrib).alias(f"__d_{out}"))
        elif kind in ("sum", "avg"):
            exprs.append(
                F.sum(sign * F.coalesce(F.col(col), _zero(dtypes[col]))).alias(
                    f"__d_{out}"
                )
            )
            exprs.append(
                F.sum(sign * F.when(F.col(col).isNotNull(), 1).otherwise(0)).alias(
                    f"__dnn_{out}"
                )
            )
        else:
            fn = F.min if kind == "min" else F.max
            exprs.append(
                fn(
                    F.when(F.col("_change_type") == "insert", F.col(col))
                ).alias(f"__d_{out}")
            )
            # delete-side extremum: decides whether the stored extremum
            # might have been removed (only then is a base re-read needed)
            exprs.append(
                fn(
                    F.when(F.col("_change_type") == "delete", F.col(col))
                ).alias(f"__dd_{out}")
            )
    delta = ch.groupBy(*keys).agg(*exprs)

    stored = read_manifested(spark, mv_root, spec["fmt"])
    sdt = dict(stored.dtypes)
    folded = delta.join(stored.drop("mv_bucket"), on=keys, how="left")

    n_new = F.coalesce(F.col("_n"), F.lit(0)) + F.col("__d_rows")
    cols = [F.col(k) for k in keys] + [n_new.alias("_n")]
    minmax = [o for o, (k, _) in aggs.items() if k in ("min", "max")]
    # Does any delete tie-or-cross a stored extremum? Only then can the
    # extremum itself have been removed; deletes strictly inside the range
    # fold for free (a plain UPDATE of a non-extreme row never re-reads
    # the base). NULL stored extremum with non-NULL deletes means the
    # state is behind the feed — repair conservatively.
    touch = F.lit(False)
    for o in minmax:
        dd, s = F.col(f"__dd_{o}"), F.col(f"_s_{o}")
        crossed = (dd <= s) if aggs[o][0] == "min" else (dd >= s)
        touch = touch | (dd.isNotNull() & (s.isNull() | crossed))
    needs_r = (touch & (n_new > 0)) if minmax else F.lit(False)
    for out, (kind, col) in aggs.items():
        s, d = f"_s_{out}", f"__d_{out}"
        if kind in ("count", "sum", "avg"):
            cols.append(
                (F.coalesce(F.col(s), _zero(sdt[s])) + F.col(d))
                .cast(sdt[s])
                .alias(s)
            )
            if kind in ("sum", "avg"):
                nn = f"_nn_{out}"
                cols.append(
                    (F.coalesce(F.col(nn), F.lit(0)) + F.col(f"__dnn_{out}"))
                    .cast(sdt[nn])
                    .alias(nn)
                )
        else:
            fold = F.least if kind == "min" else F.greatest
            cols.append(fold(F.col(s), F.col(d)).cast(sdt[s]).alias(s))
    folded = folded.select(*cols, needs_r.alias("_needs_r"))

    # MIN/MAX repair: re-derive extrema from the base snapshot for exactly
    # the groups whose extremum may have been deleted.
    recompute_groups = 0
    if minmax:
        rk = folded.filter(F.col("_needs_r")).select(*keys).persist()
        recompute_groups = rk.count()
        if recompute_groups:
            base = _derive(
                read_manifested(
                    spark, spec["base_root"], spec["fmt"], version=v_to
                ),
                spec["derived"],
            )
            slice_ = base.join(F.broadcast(rk), on=keys, how="semi")
            rex = [
                (F.min if aggs[o][0] == "min" else F.max)(aggs[o][1]).alias(
                    f"_r_{o}"
                )
                for o in minmax
            ]
            repaired = slice_.groupBy(*keys).agg(*rex)
            folded = folded.join(repaired, on=keys, how="left")
            for o in minmax:
                s = f"_s_{o}"
                folded = folded.withColumn(
                    s,
                    F.when(F.col("_needs_r"), F.col(f"_r_{o}"))
                    .otherwise(F.col(s))
                    .cast(sdt[s]),
                ).drop(f"_r_{o}")
        rk.unpersist()
    folded = folded.drop("_needs_r")

    # Tombstone shape for dead groups: zero counts, NULL extrema — the
    # invariant a later re-insert folds on top of.
    cols = [F.col(k) for k in keys] + [F.col("_n")]
    for out, (kind, col) in aggs.items():
        s = f"_s_{out}"
        if kind in ("count", "sum", "avg"):
            cols.append(F.when(F.col("_n") > 0, F.col(s)).otherwise(_zero(sdt[s])).cast(sdt[s]).alias(s))
            if kind in ("sum", "avg"):
                nn = f"_nn_{out}"
                cols.append(F.when(F.col("_n") > 0, F.col(nn)).otherwise(F.lit(0)).cast(sdt[nn]).alias(nn))
        else:
            cols.append(F.when(F.col("_n") > 0, F.col(s)).cast(sdt[s]).alias(s))
    return folded.select(*cols), recompute_groups


def _full_source(spark: SparkSession, spec: dict, mv_root: str, v_to: int) -> DataFrame:
    """Full-recompute fallback: absolute state at base@v_to plus
    tombstones for stored groups that no longer exist."""
    keys = spec["keys"]
    aggs = {o: tuple(kc) for o, kc in spec["aggs"].items()}
    base = _derive(
        read_manifested(spark, spec["base_root"], spec["fmt"], version=v_to),
        spec["derived"],
    )
    fresh = _full_state(base, keys, aggs)
    stored = read_manifested(spark, mv_root, spec["fmt"])
    sdt = dict(stored.dtypes)
    fresh = fresh.select(
        *keys, F.col("_n"), *[F.col(c).cast(sdt[c]).alias(c) for c in sdt if c.startswith(("_s_", "_nn_"))]
    )
    dead = (
        stored.filter(F.col("_n") > 0)
        .select(*keys)
        .join(fresh.select(*keys), on=keys, how="anti")
        .withColumn("_n", F.lit(0).cast(sdt["_n"]))
    )
    for c in sdt:
        if c.startswith("_nn_"):
            dead = dead.withColumn(c, _zero(sdt[c]))
        elif c.startswith("_s_"):
            kind = spec["aggs"][c[3:]][0]
            dead = dead.withColumn(
                c, _zero(sdt[c]) if kind in ("count", "sum", "avg") else F.lit(None).cast(sdt[c])
            )
    return fresh.unionByName(dead.select(*fresh.columns))


def _refresh_cost_estimate(
    spark: SparkSession,
    spec: dict,
    v_from: int,
    v_to: int,
    floor_bytes: int,
    crossover: float,
    diff_read_factor: float = 8.0,
) -> dict:
    """Metadata-only byte estimate of the two refresh paths, from the
    two base manifests plus a content-summary per vrel (no data read).

    The fold's cost depends on the feed's SHAPE, mirroring exactly what
    `read_changes` will do:

    * APPEND-shaped leaves (same primary, old vrel set ⊆ new, no DV
      movement) feed only their NEW extra vrels, read once as inserts —
      their cost is those bytes, nothing more;
    * DIFF-shaped leaves (rewrites, drains, DV deletes) are read WHOLE
      on both sides and pushed through two EXCEPT ALLs — shuffles +
      hashing make each byte several times costlier than a plain scan,
      so those bytes are weighted by ``diff_read_factor`` (8×: measured
      against full refresh, whole-leaf merge feeds lose to a full scan
      well below a 1:1 byte ratio — the round-6 "11× slower" regime).

    Full recompute wins when ``fold_cost >= crossover × base_bytes`` or
    the base is under ``floor_bytes`` (default 0 — the fold's fixed
    overhead MEASURED lower than the full path's own fixed overhead, so
    no absolute floor is needed; the parameter remains for operators
    who want one). The live-leaf sweep EARLY-EXITS once the running
    total proves incremental wins, so the driver cost on a huge table
    is O(changed leaves), not O(leaves)."""
    root = spec["base_root"]
    fs, jvm = _hadoop_fs(spark, root)
    a = _load_doc(fs, jvm, root, v_from)
    b = _load_doc(fs, jvm, root, v_to)

    def vbytes(vrel: str) -> int:
        return int(
            fs.getContentSummary(
                jvm.org.apache.hadoop.fs.Path(f"{root.rstrip('/')}/{vrel}")
            ).getLength()
        )

    from etl_demo_spark.io.manifest import _events_plan

    plan = _events_plan(fs, jvm, root, a["version"], b["version"])
    if plan is not None and plan["sidecars"]:
        # the fold will consume events: sidecar bytes + appended bytes,
        # every byte read exactly once — no EXCEPT ALL weighting
        sidecar_bytes = sum(vbytes(r) for _, r in plan["sidecars"])
        append_bytes_ = sum(vbytes(r) for _, r in plan["appends"])
        fold_cost = float(sidecar_bytes + append_bytes_)
        all_b = set(b["partitions"].values()) | {
            v for vs in (b.get("extra_vrels") or {}).values() for v in vs
        }
        stop_at = max(
            float(floor_bytes),
            fold_cost / crossover if crossover > 0 else float("inf"),
        )
        base_bytes, complete = 0, True
        for v in all_b:
            base_bytes += vbytes(v)
            if base_bytes > stop_at:
                complete = False
                break
        return {
            "changed_bytes": int(fold_cost),
            "append_bytes": int(append_bytes_),
            "diff_bytes": 0,
            "sidecar_bytes": int(sidecar_bytes),
            "fold_cost_bytes": int(fold_cost),
            "base_bytes_scanned": base_bytes,
            "base_scan_complete": complete,
            "full_cheaper": complete
            and (
                base_bytes <= floor_bytes
                or fold_cost >= crossover * base_bytes
            ),
        }
    pa, pb = a["partitions"], b["partitions"]
    fa = (a.get("dv") or {}).get("files", {})
    fb = (b.get("dv") or {}).get("files", {})
    dv_vrels = {
        p.rsplit("/", 1)[0]
        for p in set(fa) | set(fb)
        if fa.get(p) != fb.get(p)
    }
    ea = a.get("extra_vrels") or {}
    eb = b.get("extra_vrels") or {}

    def vset(p: dict, e: dict, r: str) -> set:
        out = set(e.get(r, []))
        if r in p:
            out.add(p[r])
        return out

    all_vrels_a = set(pa.values()) | {v for vs in ea.values() for v in vs}
    all_vrels_b = set(pb.values()) | {v for vs in eb.values() for v in vs}
    append_vrels: set = set()
    diff_vrels: set = set()
    for r in set(pa) | set(pb):
        sa, sb = vset(pa, ea, r), vset(pb, eb, r)
        if sa == sb:
            continue
        if (
            r in pa
            and r in pb
            and pa[r] == pb[r]
            and sa <= sb
            and not ((sa | sb) & dv_vrels)
        ):
            append_vrels |= sb - sa  # read once, inserts only
        else:
            diff_vrels |= sa | sb  # read whole leaf, both sides
    diff_vrels |= dv_vrels & (all_vrels_a | all_vrels_b)

    append_bytes = sum(vbytes(v) for v in append_vrels)
    diff_bytes = sum(vbytes(v) for v in diff_vrels)
    fold_cost = append_bytes + diff_read_factor * diff_bytes
    stop_at = max(
        float(floor_bytes),
        fold_cost / crossover if crossover > 0 else float("inf"),
    )
    base_bytes, complete = 0, True
    for v in all_vrels_b:
        base_bytes += vbytes(v)
        if base_bytes > stop_at:
            complete = False  # incremental wins; remainder irrelevant
            break
    full_cheaper = complete and (
        base_bytes <= floor_bytes or fold_cost >= crossover * base_bytes
    )
    return {
        "changed_bytes": append_bytes + diff_bytes,
        "append_bytes": append_bytes,
        "diff_bytes": diff_bytes,
        "fold_cost_bytes": int(fold_cost),
        "base_bytes_scanned": base_bytes,
        "base_scan_complete": complete,
        "full_cheaper": full_cheaper,
    }


def mv_refresh(
    spark: SparkSession,
    mv_root: str,
    cost_based: bool = True,
    full_floor_bytes: int = 0,
    changed_frac_crossover: float = 1.0,
) -> dict:
    """REFRESH MATERIALIZED VIEW, incrementally where cheaper.

    Resolution order: (1) a PENDING intent (crash recovery) re-runs its
    recorded fold; (2) otherwise the base's current version is compared
    to the watermark — equal is a no-op, a retained watermark folds the
    change feed, an expired watermark falls back to full recompute at
    the current base snapshot. The data change lands as ONE atomic
    manifested merge; the intent that described it was CAS-published
    first, so a crash anywhere re-converges on the next call.

    ``cost_based`` (default on) additionally picks FULL recompute when
    the manifests' metadata says it is cheaper than the fold. The
    estimate is SHAPE-AWARE (`_refresh_cost_estimate`): append-shaped
    changes cost their new bytes once; diff-shaped changes (rewrites,
    DV deletes) cost both sides of the whole leaf weighted 8× for the
    EXCEPT ALL machinery. Full wins when that fold cost reaches
    ``changed_frac_crossover`` × live base bytes (default 1.0), or the
    base is under ``full_floor_bytes`` (default 0 — measured, the fold's
    fixed overhead is LOWER than the full path's own; the knob remains
    for operators who want an absolute guard). Measured on this host:
    a 2k-row append into a 12M-row/160 MB base folds in 2.1 s vs 4.3 s
    full refresh; a whole-leaf merge feed at the same size correctly
    flips to full (fold 4.9 s vs 2.9 s). The decision is recorded in
    the intent, so crash recovery replays the same path. Pass
    ``cost_based=False`` to force the fold whenever the watermark is
    retained (e.g. to pin CDC semantics in tests).

    Returns a stats dict: ``mode`` ('noop'|'incremental'|'full'),
    ``reason`` ('fold'|'cost'|'watermark_expired'|'pending_intent'),
    ``base_from``/``base_to``, ``mv_version``, ``changed_groups``,
    ``recomputed_groups``, and ``cost`` (the byte estimate, when one
    was made)."""
    fs, jvm = _hadoop_fs(spark, mv_root)
    spec = _load_spec(fs, jvm, mv_root)
    cur = manifest_versions(spark, mv_root)[-1]
    base_vs = manifest_versions(spark, spec["base_root"])

    cost = None
    pending = _load_intent(fs, jvm, mv_root, cur + 1)
    if pending is not None:
        v_from, v_to = pending["base_from"], int(pending["base_to"])
        full = bool(pending["full"])
        reason = "pending_intent"
        if not full and v_from not in base_vs:
            full = v_to in base_vs  # recorded diff expired: try full@to
        if full and v_to not in base_vs:
            raise MVStaleError(
                f"{mv_root}: pending intent v{cur + 1} targets expired base "
                f"version {v_to}; drop and recreate the view"
            )
    else:
        watermark = mv_watermark(spark, mv_root)
        base_cur = base_vs[-1]
        if base_cur == watermark:
            return {
                "mode": "noop",
                "reason": "up_to_date",
                "base_from": watermark,
                "base_to": watermark,
                "mv_version": cur,
                "changed_groups": 0,
                "recomputed_groups": 0,
            }
        v_from, v_to = watermark, base_cur
        full = v_from not in base_vs
        reason = "watermark_expired" if full else "fold"
        if not full and cost_based:
            cost = _refresh_cost_estimate(
                spark, spec, v_from, v_to, full_floor_bytes,
                changed_frac_crossover,
            )
            if cost["full_cheaper"]:
                full, reason = True, "cost"
        if not _publish_intent(
            fs,
            jvm,
            mv_root,
            {
                "mv_version": cur + 1,
                "base_from": v_from,
                "base_to": v_to,
                "full": full,
            },
        ):
            raise MVConcurrentRefreshError(
                f"{mv_root}: another refresher holds intent v{cur + 1}"
            )

    recomputed = 0
    if full:
        source = _full_source(spark, spec, mv_root, v_to)
    else:
        source, recomputed = _fold_incremental(spark, spec, mv_root, v_from, v_to)
    source = _bucketed(source, spec["keys"], spec["buckets"]).persist()
    try:
        # one action for both decision scalars — a second count over the
        # persisted fold is a whole extra job of fixed overhead
        stat = source.agg(
            F.count(F.lit(1)).alias("c"),
            F.sum(F.when(F.col("_n") < 0, 1).otherwise(0)).alias("neg"),
        ).first()
        changed, neg = int(stat["c"]), int(stat["neg"] or 0)
        if neg:
            raise RuntimeError(
                f"{mv_root}: {neg} groups folded to negative counts — the "
                "change feed does not match the stored state (foreign DML "
                "on the MV?); drop and recreate"
            )
        if changed:
            merge_upsert_manifested(
                spark, mv_root, source, spec["keys"], "mv_bucket", spec["fmt"]
            )
        else:
            # Empty diff (e.g. the base commit was an OPTIMIZE rewrite or
            # another row-preserving commit). Advance the watermark by
            # re-upserting one stored row — a no-op merge that bumps the
            # MV version so the published intent becomes APPLIED.
            one = read_manifested(spark, mv_root, spec["fmt"]).limit(1)
            if one.take(1):
                merge_upsert_manifested(
                    spark, mv_root, one, spec["keys"], "mv_bucket", spec["fmt"]
                )
            else:
                # Empty view AND empty diff: there is no row to carry a
                # no-op commit, so retract the intent instead. Safe —
                # its merge never committed (MV still at `cur`) and its
                # recorded range folds to zero rows, so a later refresh
                # re-folding watermark→current applies nothing twice.
                fs.delete(
                    jvm.org.apache.hadoop.fs.Path(
                        _mv_path(mv_root, f"intent_v{cur + 1}.json")
                    ),
                    False,
                )
                return {
                    "mode": "noop",
                    "reason": "empty_diff",
                    "base_from": v_from,
                    "base_to": v_to,
                    "mv_version": cur,
                    "changed_groups": 0,
                    "recomputed_groups": 0,
                }
    finally:
        source.unpersist()
    out = {
        "mode": "full" if full else "incremental",
        "reason": reason,
        "base_from": v_from,
        "base_to": v_to,
        "mv_version": cur + 1,
        "changed_groups": changed,
        "recomputed_groups": recomputed,
    }
    if cost is not None:
        out["cost"] = cost
    return out


# ------------------------------------------------------------------- read


def mv_read(
    spark: SparkSession, mv_root: str, version: int | None = None
) -> DataFrame:
    """The view's LOGICAL content: group keys + finalized aggregates.
    COUNTs surface as BIGINT, SUM over an all-NULL group is NULL (SQL
    semantics, via the stored non-null count), AVG finalizes as
    sum/count, tombstoned groups are filtered out. Reads are snapshot
    reads of the MV's own manifest (``version=`` time-travels)."""
    fs, jvm = _hadoop_fs(spark, mv_root)
    spec = _load_spec(fs, jvm, mv_root)
    st = read_manifested(spark, mv_root, spec["fmt"], version=version)
    cols = [F.col(k) for k in spec["keys"]]
    for out, (kind, _col) in spec["aggs"].items():
        s = f"_s_{out}"
        if kind == "count":
            cols.append(F.col(s).alias(out))
        elif kind == "sum":
            cols.append(
                F.when(F.col(f"_nn_{out}") > 0, F.col(s)).alias(out)
            )
        elif kind == "avg":
            cols.append(
                F.when(
                    F.col(f"_nn_{out}") > 0, F.col(s) / F.col(f"_nn_{out}")
                ).alias(out)
            )
        else:
            cols.append(F.col(s).alias(out))
    return st.filter(F.col("_n") > 0).select(*cols)


def mv_state(spark: SparkSession, mv_root: str) -> DataFrame:
    """The RAW internal state incl. tombstones — the debugging surface."""
    fs, jvm = _hadoop_fs(spark, mv_root)
    spec = _load_spec(fs, jvm, mv_root)
    return read_manifested(spark, mv_root, spec["fmt"])


def mv_vacuum(spark: SparkSession, mv_root: str) -> int:
    """Physically drop tombstoned groups (``_n = 0``) via the predicate
    DELETE path — one atomic commit; returns affected leaf count."""
    from etl_demo_spark.io.manifest import delete_where_manifested

    fs, jvm = _hadoop_fs(spark, mv_root)
    spec = _load_spec(fs, jvm, mv_root)
    affected = delete_where_manifested(
        spark, mv_root, F.col("_n") == 0, "mv_bucket", spec["fmt"]
    )
    return len(affected)


def run_mv_stream_refresh(
    spark: SparkSession,
    mv_root: str,
    checkpoint_dir: str,
    cost_based: bool = True,
    trigger_seconds: float | None = None,
    drain_timeout: float = 600.0,
):
    """CONTINUOUS MATERIALIZED VIEW: keep the view fresh by tailing the
    base table's COMMIT LOG — the Delta Live Tables shape, composed from
    parts this repo already certifies.

    The notification channel is the tablestream source in
    ``mode=commits`` (`io/table_stream.py`): one metadata row per base
    commit, ZERO data files read by the stream itself — at 100 TB the
    stream costs directory listings. Each micro-batch that carries at
    least one commit triggers `mv_refresh`, which consumes the actual
    row deltas through the manifest change feed and lands them as one
    atomic MV commit; its intent machinery makes a replayed notification
    (restart, duplicate batch) a no-op, so the composition is
    exactly-once without any new state.

    ``trigger_seconds=None`` runs availableNow (drain pending commits,
    stop — the scheduled-refresh shape) and returns the per-batch
    `mv_refresh` stats; if the drain exceeds ``drain_timeout`` seconds
    the query is STOPPED and a TimeoutError raised — a scheduled
    refresh must never return partial stats with the stream still
    running (it would hold the checkpoint against the next run). A
    value runs a processingTime trigger and returns the live
    StreamingQuery — the caller owns its lifecycle
    (stop/awaitTermination/exception())."""
    from etl_demo_spark.io.table_stream import register_table_stream_source

    fs, jvm = _hadoop_fs(spark, mv_root)
    spec = _load_spec(fs, jvm, mv_root)
    register_table_stream_source(spark)
    stats: list[dict] = []

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        stats.append(mv_refresh(batch_df.sparkSession, mv_root, cost_based))

    stream = (
        spark.readStream.format("tablestream")
        .option("path", spec["base_root"])
        .option("mode", "commits")
        .load()
    )
    writer = stream.writeStream.foreachBatch(apply_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_seconds is None:
        q = writer.trigger(availableNow=True).start()
        if not q.awaitTermination(drain_timeout):
            q.stop()
            raise TimeoutError(
                f"run_mv_stream_refresh: availableNow drain of {mv_root} "
                f"exceeded {drain_timeout}s — query stopped; "
                f"{len(stats)} batch(es) had applied (each an atomic, "
                "idempotent mv_refresh commit; rerun to resume)"
            )
        return stats
    return writer.trigger(processingTime=f"{trigger_seconds} seconds").start()
