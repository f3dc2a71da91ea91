"""Partition-scoped table maintenance on plain parquet (no table-format
dependence): MERGE and SCD2 that rewrite ONLY the partitions containing
changed keys, leaving every untouched partition's files byte-identical.

Why this module exists: `ops.merge_upsert` / `ops.scd2_apply` are pure
DataFrame transforms — correct, but applying them to a stored table means
rewriting the whole table. At 100 TB that turns a 1 GB change batch into a
100 TB write. The lakehouse formats (Delta/Iceberg/Hudi) solve this with
file-level metadata; this module gets the dominant win — partition-level
scoping — with nothing but the partition layout already mandated by
docs/SCALE_LAYOUT.md:

  1. find the affected partitions: target partitions that CONTAIN a
     matched key (one key-projected semi-join) ∪ the source rows' own
     partition values (insert destinations, and the destination side of a
     partition-value-changing update);
  2. read ONLY those partitions (partition pruning — the scan never
     touches the other 99%), apply the in-memory merge;
  3. write the merged slice to a sibling staging directory, then swap the
     affected partition directories in via the Hadoop FileSystem API
     (works on HDFS/S3A the same as local disk).

The directory swap (rather than `partitionOverwriteMode=dynamic` straight
onto the target) is deliberate: Spark cannot safely overwrite a path it is
still lazily reading in the same job, and a persist()-then-overwrite is a
correctness trap (cache eviction would recompute from already-deleted
files). Stage-then-swap is what Hive's INSERT OVERWRITE does internally;
the staged bytes are bounded by the affected partitions, not the table.
It also handles the one case dynamic overwrite cannot: an update that
MOVES a row's partition value can leave its old partition EMPTY, and
"overwrite with zero rows" never deletes a directory — the swap retires
every affected partition dir and moves in only the non-empty ones.

Crash-consistency contract (same class as Hive-on-parquet, weaker than a
lakehouse snapshot commit): the swap NEVER deletes data it has not
already replaced — each old partition dir is renamed into the staging
area's ``.replaced/`` holding pen, the staged dir is renamed in, and the
staging area (pen included) is deleted only after EVERY partition
swapped. A crash mid-swap therefore leaves a recoverable staging
directory; the next merge/scd2 call against the same path first runs the
recovery sweep (restore any held-aside partition the target is missing,
then clear staging) and re-applies — source-wins MERGE is idempotent, so
the re-run converges. Readers concurrent with the swap can still see a
partition vanish for the rename window; where that is unacceptable, use
the snapshot-manifest mode in `io/manifest.py` — versioned partition
subdirs + an atomic pointer-file commit, under which a racing reader
always resolves a complete snapshot (concurrent-reader test pinned
there). The *scoping* logic is identical in both modes and matches what
full table formats do at the file level.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Characters Hive/Spark escape in partition directory names
# (ExternalCatalogUtils.charToEscape) — everything else passes through.
_ESCAPE = set('"#%\'*/:=?\\\x7f{[]^') | {chr(c) for c in range(0x20)}

def _escape_part(value: str) -> str:
    return "".join(f"%{ord(ch):02X}" if ch in _ESCAPE else ch for ch in value)


def _part_dir(col: str, value) -> str:
    if value is None:
        return f"{col}=__HIVE_DEFAULT_PARTITION__"
    if isinstance(value, bool):  # Spark writes boolean partitions lowercase
        return f"{col}={'true' if value else 'false'}"
    return f"{col}={_escape_part(str(value))}"


def _part_rel(cols: list[str], values) -> str:
    """Relative directory of one partition tuple under a (possibly
    multi-level) Hive layout: ``dt=2024-01-01/seg=EU``. ``values`` is a
    tuple aligned with ``cols`` (the single-column case passes a 1-tuple)."""
    return "/".join(_part_dir(c, v) for c, v in zip(cols, values))


def _normalize_partition_cols(partition_cols) -> list[str]:
    """Accept the historical single-column string or the multi-level list."""
    if isinstance(partition_cols, str):
        return [partition_cols]
    cols = list(partition_cols)
    if not cols:
        raise ValueError("partition_cols must name at least one column")
    return cols


def _hadoop_fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jvm


def _read_raw_partitions(
    spark: SparkSession,
    path: str,
    fmt: str,
    partition_cols: list[str],
    merge_schema: bool = False,
) -> DataFrame:
    """Load with every partition column pinned to STRING via an EXPLICIT
    schema: directory names come back as the exact strings on disk.
    Default type inference would coerce numeric-looking values
    ('0123' → 123) and the swap would then target ``seg=123`` while the
    real directory is ``seg=0123`` — a silent stale-rows-plus-new-rows
    corruption. A user schema (rather than toggling
    spark.sql.sources.partitionColumnTypeInference.enabled) keeps the
    pin LOCAL to this read — the conf is session-global, and flipping it
    would change partition types under every concurrent reader on the
    session for the duration of the merge."""
    import copy

    pin = set(partition_cols)
    reader = spark.read.format(fmt)
    if merge_schema:
        # union the schema across ALL files (distributed footer sweep) —
        # required once a table has evolved columns, or the default
        # single-footer sample could miss them and a rewrite would
        # silently drop the evolved column from affected partitions
        reader = reader.option("mergeSchema", "true")
    inferred = reader.load(path).schema
    pinned = T.StructType(
        [
            T.StructField(f.name, T.StringType(), True)
            if f.name in pin
            else copy.deepcopy(f)
            for f in inferred.fields
        ]
    )
    return spark.read.format(fmt).schema(pinned).load(path)


def _mkdirs_parent(fs, jvm, path: str) -> None:
    parent = jvm.org.apache.hadoop.fs.Path(path).getParent()
    if parent is not None and not fs.exists(parent):
        fs.mkdirs(parent)


def _pen_leaves(fs, jvm, pen: str, depth: int) -> list[tuple]:
    """(status, relative-path) of every pen entry exactly ``depth``
    directory levels below ``pen`` — one per held-aside partition dir in
    a ``depth``-level Hive layout (``dt=…/seg=…`` → depth 2)."""
    out: list[tuple] = []
    stack = [(jvm.org.apache.hadoop.fs.Path(pen), "", 0)]
    while stack:
        path, rel, d = stack.pop()
        for st in fs.listStatus(path):
            name = st.getPath().getName()
            r = f"{rel}/{name}" if rel else name
            if d + 1 == depth:
                out.append((st, r))
            elif st.isDirectory():
                stack.append((st.getPath(), r, d + 1))
    return out


def _recover_staging(
    fs, jvm, target_path: str, staging: str, depth: int = 1
) -> None:
    """Heal a crashed swap: any partition dir held aside in
    ``staging/.replaced/`` whose target partition is MISSING and whose
    swap was NOT marked complete was caught between its two renames —
    put it back. Pen entries with the ``.done`` suffix are partitions the
    swap DELIBERATELY emptied (a partition-moving update drained them;
    restoring those would resurrect deleted rows beside their moved
    copies). Everything else in staging is a stale copy of work the
    re-run will redo. Then clear staging.

    Consistency note for DIRECT callers (the checkpointed foreachBatch
    sink gets this for free): recovery restores to a PER-PARTITION
    boundary — partitions swapped before the crash keep the batch's
    changes, restored ones roll back to pre-batch state. Re-apply the
    SAME batch after recovery to converge (source-wins merge is
    idempotent); applying a different batch first leaves the interrupted
    batch half-applied."""
    staging_p = jvm.org.apache.hadoop.fs.Path(staging)
    if not fs.exists(staging_p):
        return
    pen = f"{staging}/.replaced"
    if fs.exists(jvm.org.apache.hadoop.fs.Path(pen)):
        for st, rel in _pen_leaves(fs, jvm, pen, depth):
            if rel.endswith(".done"):
                continue  # deliberately-emptied partition: never restore
            tgt = f"{target_path.rstrip('/')}/{rel}"
            tgt_p = jvm.org.apache.hadoop.fs.Path(tgt)
            if not fs.exists(tgt_p):
                _mkdirs_parent(fs, jvm, tgt)
                fs.rename(st.getPath(), tgt_p)
    fs.delete(staging_p, True)


def _swap_partitions(
    fs, jvm, target_path: str, staging: str, rel_dirs: list[str]
) -> None:
    """Retire-and-replace each partition dir. Old dirs are RENAMED into
    the staging pen (never deleted) until the whole loop succeeds, so no
    crash window destroys the only copy of anything; on exception the
    staging dir (pen included) is left in place for _recover_staging."""
    pen = f"{staging}/.replaced"
    fs.mkdirs(jvm.org.apache.hadoop.fs.Path(pen))
    for rel in rel_dirs:
        old = jvm.org.apache.hadoop.fs.Path(f"{target_path.rstrip('/')}/{rel}")
        new = jvm.org.apache.hadoop.fs.Path(f"{staging}/{rel}")
        if fs.exists(old):
            _mkdirs_parent(fs, jvm, f"{pen}/{rel}")  # nested layouts
            fs.rename(old, jvm.org.apache.hadoop.fs.Path(f"{pen}/{rel}"))
        if fs.exists(new):  # emptied partitions have no staged dir
            _mkdirs_parent(fs, jvm, f"{target_path.rstrip('/')}/{rel}")
            fs.rename(new, old)
        else:
            # the retire WAS this partition's whole swap (merge drained
            # it): mark its pen entry complete so a crashed-run recovery
            # never resurrects the drained rows beside their moved copies
            penned = jvm.org.apache.hadoop.fs.Path(f"{pen}/{rel}")
            if fs.exists(penned):
                fs.rename(penned, jvm.org.apache.hadoop.fs.Path(f"{pen}/{rel}.done"))
    fs.delete(jvm.org.apache.hadoop.fs.Path(staging), True)


def delete_keys_partitioned(
    spark: SparkSession,
    target_path: str,
    keys_df: DataFrame,
    keys: list[str],
    partition_cols,
    fmt: str = "parquet",
) -> list:
    """DELETE the rows whose key appears in ``keys_df`` from a
    partitioned table, rewriting ONLY the partitions that contain a
    matched key — the GDPR/right-to-erasure shape: a few thousand keys
    against a 100 TB table must not become a 100 TB rewrite.

    Same staging-swap protocol and crash contract as the MERGE above
    (recovery sweep on entry, retire-and-replace, drained partitions
    retired with the ``.done`` pen marker so recovery never resurrects
    deleted rows). Affected discovery is the key semi-join only — unlike
    MERGE there is no insert side, so untouched partitions are exactly
    those holding none of the keys. Returns the partitions rewritten
    (bare values for single-column layouts, tuples for multi-level).

    Scale: one key-projected semi-join for discovery (AQE broadcasts
    small key sets), a pruned read of the affected partitions, one
    anti-join, and a write bounded by the affected slice. Deleting every
    row of a partition removes its directory."""
    cols = _normalize_partition_cols(partition_cols)
    single = isinstance(partition_cols, str) or len(cols) == 1

    staging = target_path.rstrip("/") + ".__merge_staging__"
    fs, jvm = _hadoop_fs(spark, target_path)
    _recover_staging(fs, jvm, target_path, staging, depth=len(cols))

    target = _read_raw_partitions(spark, target_path, fmt, cols)
    key_set = keys_df.select(*keys).distinct()
    affected = [
        tuple(r)
        for r in target.join(key_set, keys, "left_semi")
        .select(*cols)
        .distinct()
        .collect()
    ]
    if not affected:
        return []

    remaining = target.filter(_partition_filter(cols, affected)).join(
        key_set, keys, "left_anti"
    )
    for c in cols:
        remaining = remaining.withColumn(c, F.col(c).cast("string"))
    remaining.write.mode("overwrite").partitionBy(*cols).format(fmt).save(staging)
    _swap_partitions(
        fs,
        jvm,
        target_path,
        staging,
        [_part_rel(cols, values) for values in affected],
    )
    return [values[0] for values in affected] if single else affected


def delete_where_partitioned(
    spark: SparkSession,
    target_path: str,
    predicate,
    partition_cols,
    fmt: str = "parquet",
) -> list:
    """DELETE ... WHERE on a partitioned table: the predicate twin of
    `delete_keys_partitioned` for retention jobs ("drop everything
    before date X in region Y") where the victims are described by a
    condition, not a key list. Discovery is one predicate-filtered scan
    projected to the partition columns (predicate pushed to the parquet
    footers), the rewrite keeps the affected partitions' non-matching
    rows, a fully-drained partition's directory is removed, and the
    same crash-safe swap applies. Returns the partitions rewritten.

    When the predicate is on the partition columns ALONE, the rewrite
    degenerates to pure directory retirement (the staged write of the
    affected slice is empty) — an O(metadata) partition drop."""
    cols = _normalize_partition_cols(partition_cols)
    single = isinstance(partition_cols, str) or len(cols) == 1

    staging = target_path.rstrip("/") + ".__merge_staging__"
    fs, jvm = _hadoop_fs(spark, target_path)
    _recover_staging(fs, jvm, target_path, staging, depth=len(cols))

    target = _read_raw_partitions(spark, target_path, fmt, cols)
    affected = [
        tuple(r)
        for r in target.filter(predicate).select(*cols).distinct().collect()
    ]
    if not affected:
        return []

    remaining = target.filter(_partition_filter(cols, affected)).filter(
        ~F.coalesce(predicate, F.lit(False))
        # NULL-predicate rows are KEPT: SQL DELETE removes only rows the
        # condition is TRUE for, and a bare ~NULL would drop them
    )
    for c in cols:
        remaining = remaining.withColumn(c, F.col(c).cast("string"))
    remaining.write.mode("overwrite").partitionBy(*cols).format(fmt).save(staging)
    _swap_partitions(
        fs,
        jvm,
        target_path,
        staging,
        [_part_rel(cols, values) for values in affected],
    )
    return [values[0] for values in affected] if single else affected


def update_where_partitioned(
    spark: SparkSession,
    target_path: str,
    assignments: dict,
    predicate,
    partition_cols,
    fmt: str = "parquet",
) -> list:
    """UPDATE ... SET ... WHERE on a partitioned table, rewriting only
    the partitions involved — completing the DML triad (MERGE above,
    DELETE above, UPDATE here) on plain parquet.

    ``assignments`` maps column name → Column expression (evaluated
    against the matched row); ``predicate`` is a Column. Assignments MAY
    set a partition column (the status-transition shape: move every
    matched row from ``seg=OPEN`` to ``seg=CLOSED``): the blast radius
    is then source partitions (rows matching the predicate) ∪
    destination partitions (the matched rows AFTER assignment), rows
    land in their new directory, and a drained source partition's
    directory is removed. Same staging-swap protocol and crash contract
    as the MERGE; returns the partitions rewritten.

    Scale: discovery is one predicate-filtered scan projected to the
    partition columns (the predicate reaches the parquet footers —
    PushedFilters — so partitions with no candidate row-groups are
    barely touched), then a pruned read + a single CASE-WHEN projection
    over the affected slice. Write cost is the affected partitions, not
    the table."""
    cols = _normalize_partition_cols(partition_cols)
    single = isinstance(partition_cols, str) or len(cols) == 1

    staging = target_path.rstrip("/") + ".__merge_staging__"
    fs, jvm = _hadoop_fs(spark, target_path)
    _recover_staging(fs, jvm, target_path, staging, depth=len(cols))

    target = _read_raw_partitions(spark, target_path, fmt, cols)
    unknown = [c for c in assignments if c not in target.columns]
    if unknown:
        raise ValueError(
            f"update_where_partitioned: assigned columns {unknown} not in table "
            f"schema {target.columns} (UPDATE cannot add columns — use a "
            "schema-evolving MERGE for that)"
        )
    matched = target.filter(predicate)
    src_parts = matched.select(*cols).distinct()
    moved = matched
    for c, expr in assignments.items():
        moved = moved.withColumn(c, expr)
    if any(c in assignments for c in cols):
        # partition values come from a computed expression now — pin them
        # back to the on-disk string space the swap targets
        for c in cols:
            moved = moved.withColumn(c, F.col(c).cast("string"))
        dst_parts = moved.select(*cols).distinct()
        part_space = src_parts.union(dst_parts).distinct()
    else:
        part_space = src_parts
    affected = [tuple(r) for r in part_space.collect()]
    if not affected:
        return []

    scoped = target.filter(_partition_filter(cols, affected))
    updated = scoped.select(
        *[
            F.when(predicate, assignments[c]).otherwise(F.col(c)).alias(c)
            if c in assignments
            else F.col(c)
            for c in target.columns
        ]
    )
    for c in cols:
        updated = updated.withColumn(c, F.col(c).cast("string"))
    updated.write.mode("overwrite").partitionBy(*cols).format(fmt).save(staging)
    _swap_partitions(
        fs,
        jvm,
        target_path,
        staging,
        [_part_rel(cols, values) for values in affected],
    )
    return [values[0] for values in affected] if single else affected


def affected_partitions(
    target: DataFrame, source: DataFrame, keys: list[str], partition_cols
) -> list[tuple]:
    """Partition tuples a key-matched MERGE must rewrite: target
    partitions holding a source key (covers updates AND the old home of a
    partition-moving update) ∪ source partition tuples (covers inserts and
    the new home). Two narrow distinct-aggregations over the partition
    columns. The key semi-join is left to the optimizer: AQE broadcasts
    the source key set when it is small (the CDC-batch common case) and
    falls back to a shuffle semi-join for huge backfills — an
    unconditional broadcast hint here would OOM exactly the large-source
    case this module exists to scale.

    ``partition_cols`` may be a single column name or a list (multi-level
    ``dt=…/seg=…`` layouts); the return value is always a list of value
    TUPLES aligned with the normalized column list."""
    cols = _normalize_partition_cols(partition_cols)
    src_keys = source.select(*keys).distinct()
    tgt_hit = target.join(src_keys, keys, "left_semi").select(*cols).distinct()
    src_parts = source.select(*cols).distinct()
    return [tuple(r) for r in tgt_hit.union(src_parts).distinct().collect()]


def _partition_filter(partition_cols: list[str], affected: list[tuple]):
    """IN-list predicate over partition tuples that keeps NULL-partition
    rows when NULL is an affected value — an equality alone evaluates to
    NULL (→ false) for NULL rows, which would silently drop the whole
    __HIVE_DEFAULT_PARTITION__ slice from the merge. The OR-of-ANDs over
    plain column comparisons (not a struct IN) stays transparent to
    Catalyst's partition pruning, so the scoped read touches only the
    affected leaf directories."""
    if len(partition_cols) == 1:
        # single level: one compact IN over the values (an `In` expression
        # rather than an OR chain) + the NULL leg when needed
        col = partition_cols[0]
        non_null = [t[0] for t in affected if t[0] is not None]
        cond = F.col(col).isin(non_null) if non_null else F.lit(False)
        if any(t[0] is None for t in affected):
            cond = cond | F.col(col).isNull()
        return cond

    def tuple_match(values: tuple):
        conj = None
        for c, v in zip(partition_cols, values):
            term = F.col(c).isNull() if v is None else (F.col(c) == F.lit(v))
            conj = term if conj is None else (conj & term)
        return conj

    cond = F.lit(False)
    for values in affected:
        cond = cond | tuple_match(values)
    return cond


def merge_upsert_partitioned(
    spark: SparkSession,
    target_path: str,
    source: DataFrame,
    keys: list[str],
    partition_cols,
    fmt: str = "parquet",
    schema_evolution: bool = False,
) -> list:
    """MERGE INTO a partitioned parquet table, rewriting only affected
    partitions (see module docstring for the why and the swap protocol).
    Matched rows take the source version wholesale (source-wins,
    NULL-updates apply — same semantics as ops.merge_upsert); unmatched
    source rows insert.

    ``schema_evolution=True`` admits a source with appended columns
    (`ops.merge_upsert` automerge semantics): affected partitions are
    rewritten with the widened schema, untouched partitions keep their
    old files. From then on the table's schema lives only in the union
    of its files, so EVERY later merge against it must keep passing
    ``schema_evolution=True`` (which turns on the mergeSchema footer
    sweep here) and plain readers need ``mergeSchema=true`` to see the
    evolved columns as NULL in old partitions. If that contract is too
    loose, use `manifest.merge_upsert_manifested` — its stored-schema
    snapshot makes the evolution atomic and self-describing.

    ``partition_cols`` is a single column name or a list for multi-level
    Hive layouts (``dt=…/seg=…`` — the docs/SCALE_LAYOUT.md standard at
    100 TB, where scoping by the leaf TUPLE keeps the blast radius at one
    day×segment instead of a whole day). Returns the partitions
    rewritten so callers/tests can assert the blast radius: bare values
    for a single-column layout (historical contract), value tuples for
    multi-level.

    Scale: reads affected partitions only (partition pruning on an IN
    list / OR-of-ANDs over the partition columns), one co-keyed merge
    join over that slice, writes bytes proportional to the change's
    partition footprint — a 1-partition change batch on a 10k-partition
    table does ~1/10k of the full-rewrite IO. Cite: reference
    `etl_weekly_trades.py:150-166` appends to SQLite with no update path
    at all; this is the engine-grade replacement.
    """
    from etl_demo_spark.ops import merge_upsert

    cols = _normalize_partition_cols(partition_cols)
    single = isinstance(partition_cols, str) or len(cols) == 1

    staging = target_path.rstrip("/") + ".__merge_staging__"
    fs, jvm = _hadoop_fs(spark, target_path)
    # heal any crashed swap (same-layout assumption: recovery depth is
    # the table's partition-level count)
    _recover_staging(fs, jvm, target_path, staging, depth=len(cols))

    target = _read_raw_partitions(
        spark, target_path, fmt, cols, merge_schema=schema_evolution
    )
    affected = affected_partitions(target, source, keys, cols)
    if not affected:
        return []

    scoped = target.filter(_partition_filter(cols, affected))
    # the merge coalesces target (string-pinned) and source partition
    # values; ensure the staged write's directory names come from the
    # same string space _part_dir targets
    merged = merge_upsert(scoped, source, keys, schema_evolution=schema_evolution)
    for c in cols:
        merged = merged.withColumn(c, F.col(c).cast("string"))
    (
        merged.write.mode("overwrite")
        .partitionBy(*cols)
        .format(fmt)
        .save(staging)
    )
    _swap_partitions(
        fs,
        jvm,
        target_path,
        staging,
        [_part_rel(cols, values) for values in affected],
    )
    return [values[0] for values in affected] if single else affected


def scd2_apply_partitioned(
    spark: SparkSession,
    history_path: str,
    changes: DataFrame,
    key: str,
    attrs: list[str],
    ts_col: str = "ts",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    current_col: str = "is_current",
) -> None:
    """SCD2 apply on a history table partitioned by ``is_current`` (the
    layout docs/SCALE_LAYOUT.md prescribes for point-in-time pruning):

      * the CURRENT partition (small — one row per live key) is rewritten
        with the post-apply current rows;
      * newly-closed versions APPEND to the closed partition — existing
        closed files are never opened, let alone rewritten.

    This matches how the data actually moves: closed history is immutable
    (append-only audit), churn is confined to the current slice. A full
    `ops.scd2_apply` + rewrite would re-copy the entire closed history —
    unbounded growth — every batch; here the write cost is O(live keys) +
    O(this batch's closures), independent of history depth.

    Crash ordering (two target mutations — closure append + current swap
    — cannot both be atomic on plain parquet): the swap follows the
    module's retire-and-replace protocol, so no window LOSES data; the
    one residual anomaly is DUPLICATION — a crash after the closure
    append but before the current swap, followed by a re-apply of the
    same batch against the still-old current slice, appends that batch's
    closures a second time. Bounded to one batch, detectable as duplicate
    (key, valid_from, valid_to) rows in the closed partition, removable
    with `scd2_compact` (crash-simulation test pins the full
    crash → re-apply → compact convergence); eliminating it outright
    needs a snapshot commit, i.e. a real table format."""
    from etl_demo_spark.cache import release_persisted, tracked_persist
    from etl_demo_spark.ops import scd2_apply

    staging = history_path.rstrip("/") + ".__scd2_staging__"
    fs, jvm = _hadoop_fs(spark, history_path)
    # heal a crashed apply-swap AND a crashed compact-swap: a compact that
    # died mid-swap holds the whole closed partition in its pen, and
    # applying on top of that truncated view would orphan it for good
    _recover_staging(fs, jvm, history_path, staging)
    _recover_staging(
        fs, jvm, history_path, history_path.rstrip("/") + ".__scd2_compact_staging__"
    )

    base = spark.read.parquet(history_path)
    data_cols = [c for c in base.columns if c != current_col]
    # with inference off the partition column is the literal string
    # "true"/"false" regardless of how the table was first written
    cur = base.filter(F.col(current_col).cast("string") == "true").select(data_cols)
    scope = object()  # don't release other units' caches (cache.py contract)
    applied = tracked_persist(
        scd2_apply(
            cur, changes, key, attrs,
            ts_col=ts_col, valid_from=valid_from, valid_to=valid_to,
        ),
        scope=scope,
    )
    try:
        new_cur = applied.filter(F.col(valid_to).isNull()).withColumn(
            current_col, F.lit(True)
        )
        newly_closed = applied.filter(F.col(valid_to).isNotNull()).withColumn(
            current_col, F.lit(False)
        )
        new_cur.select(base.columns).write.mode("overwrite").partitionBy(
            current_col
        ).parquet(staging)
        newly_closed.select(base.columns).write.mode("append").partitionBy(
            current_col
        ).parquet(history_path)
        _swap_partitions(
            fs, jvm, history_path, staging, [_part_dir(current_col, True)]
        )
    finally:
        release_persisted(scope)


def scd2_compact(
    spark: SparkSession,
    history_path: str,
    key: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    current_col: str = "is_current",
) -> int:
    """Compact the closed partition of an SCD2 history table to
    exactly-once closures, healing the one residual crash anomaly
    `scd2_apply_partitioned` documents: a crash after the closure append
    but before the current swap, followed by a re-apply of the SAME batch
    against the still-old current slice, appends that batch's closures a
    second time. The duplicates are full-row copies keyed by
    (key, valid_from, valid_to) — legitimate history has a unique
    valid_from per key — so a distinct over that triple restores
    exactly-once semantics.

    The rewrite targets ONLY the closed partition and goes through the
    module's retire-and-replace swap (crash-safe; a crashed compact is
    healed by the next compact or apply). Cost is one scan + one
    hash-distinct shuffle of 16-byte-keyed rows over the closed slice —
    run it as an occasional maintenance job, not per batch; the apply
    path stays append-only for closed history. Returns the number of
    duplicate rows removed (0 = nothing to do, nothing rewritten)."""
    staging = history_path.rstrip("/") + ".__scd2_compact_staging__"
    fs, jvm = _hadoop_fs(spark, history_path)
    _recover_staging(fs, jvm, history_path, staging)
    _recover_staging(
        fs, jvm, history_path, history_path.rstrip("/") + ".__scd2_staging__"
    )

    base = spark.read.parquet(history_path)
    closed = base.filter(F.col(current_col).cast("string") == "false")
    deduped = closed.dropDuplicates([key, valid_from, valid_to])
    n_before = closed.count()
    n_after = deduped.count()
    if n_before == n_after:
        return 0
    deduped.write.mode("overwrite").partitionBy(current_col).parquet(staging)
    _swap_partitions(
        fs, jvm, history_path, staging, [_part_dir(current_col, False)]
    )
    return n_before - n_after
