"""Relational operator verbs (SURVEY.md §2 O-7…O-25, X-2…X-9).

Thin, composable wrappers over pyspark.sql — each verb declares a logical
plan and lets Catalyst pick the physical strategy. Nothing here collects,
loops, or leaves the JVM.

Scale notes per verb are inline; the common rules:
  * aggregations get map-side partial aggregation for free;
  * ``orderBy().limit(n)`` compiles to TakeOrderedAndProject (per-partition
    top-K + merge), never a full sort;
  * small dimensions are broadcast (explicitly or by AQE).
"""

from __future__ import annotations

from functools import reduce
from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Projections (O-7, O-8, O-9)
# ---------------------------------------------------------------------------


def week_start(ts: Column | str) -> Column:
    """O-7 (`etl_weekly_trades.py:61-62`): Monday of the ISO week, as DATE.

    Spark's ``date_trunc('week')`` is Monday-based — exact reference match,
    including year-boundary buckets (a 2023-01-01 trade lands in 2022-12-26).
    """
    c = F.col(ts) if isinstance(ts, str) else ts
    return F.to_date(F.date_trunc("week", c))


def masked(value: Column, condition: Column) -> Column:
    """O-9 (`etl_weekly_trades.py:73-78`): ``value WHERE condition ELSE NULL``.

    Pre-masking columns before a single hash aggregation is the vectorized
    alternative to per-group branching — one shuffle computes every
    conditional sum.
    """
    return F.when(condition, value)


# ---------------------------------------------------------------------------
# Aggregation (O-10, O-20, X-4, X-5)
# ---------------------------------------------------------------------------


def sum0(c: Column | str) -> Column:
    """Reference NaN-semantics shim (SURVEY.md §2.1 O-10): pandas ``sum`` of
    an all-NaN group is 0.0; Spark ``SUM`` of all-NULL is NULL. ``sum0``
    matches pandas. Cheap: coalesce happens post-aggregation."""
    col = F.col(c) if isinstance(c, str) else c
    return F.coalesce(F.sum(col), F.lit(0.0))


def grouped_agg(df: DataFrame, keys: Sequence[str], aggs: dict[str, Column]) -> DataFrame:
    """O-10 (`etl_weekly_trades.py:67-96`): multi-key hash aggregation with
    named aggregates. One shuffle on the group keys; partial (map-side)
    aggregation reduces shuffle volume before the exchange."""
    return df.groupBy(*keys).agg(*[v.alias(k) for k, v in aggs.items()])


def last_value_by(df: DataFrame, key: str, value: str, order: str) -> DataFrame:
    """O-11 (`etl_weekly_trades.py:123-131`): per-key value of the max-order
    row (argmax / global as-of). Single-pass ``max_by`` aggregate — no sort,
    no window, one shuffle on ``key``."""
    return df.groupBy(key).agg(F.max_by(value, order).alias(value))


# ---------------------------------------------------------------------------
# Joins (O-12, X-2, X-3)
# ---------------------------------------------------------------------------


def broadcast_enrich(df: DataFrame, dim: DataFrame, on: str | list[str], how: str = "left") -> DataFrame:
    """O-12 (`etl_weekly_trades.py:117-118`): broadcast hash join against a
    small dimension — the dict-lookup of the reference, distributed. No
    shuffle of the fact side."""
    return df.join(F.broadcast(dim), on=on, how=how)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
) -> DataFrame:
    """X-3: as-of join — for each left row, the latest right row with
    ``right_ts <= left_ts`` within the same ``on`` key.

    Implementation: union the two sides tagged by origin, then one window
    pass carrying the latest right ROW (as a struct) per frame — a single
    shuffle on the key, no range-join explosion. Right rows sharing an
    identical (key, ts) have no defined winner (exactly one of them is
    taken, but which is partition-order dependent) — pre-dedupe with
    ``last_value_by`` if the feed can carry same-timestamp duplicates. This is the
    scalable pattern: a naive theta-join ``l.ts >= r.ts`` is O(n·m) per key;
    the union trick is O((n+m) log(n+m)) per key and AQE-skew-splittable.
    """
    lcols = [F.col(c) for c in left.columns]
    # the right row's values travel as ONE struct: last(ignorenulls) must
    # pick the whole latest right row, not fill each column independently
    # — per-column fills would skip a genuinely-NULL field of the latest
    # row and stitch together values from DIFFERENT right rows.
    rrow_type = T.StructType([T.StructField(c, right.schema[c].dataType) for c in value_cols])
    l_tagged = left.select(
        F.col(on).alias("__k"), F.col(left_ts).alias("__ts"), F.lit(1).alias("__is_left"),
        F.struct(*lcols).alias("__lrow"),
        F.lit(None).cast(rrow_type).alias("__rrow"),
    )
    r_tagged = right.select(
        F.col(on).alias("__k"), F.col(right_ts).alias("__ts"), F.lit(0).alias("__is_left"),
        F.lit(None).cast(l_tagged.schema["__lrow"].dataType).alias("__lrow"),
        F.struct(*[F.col(c).alias(c) for c in value_cols]).alias("__rrow"),
    )
    unioned = l_tagged.unionByName(r_tagged)
    # right rows sort before left rows at equal ts (__is_left ascending) so a
    # right row AT the left row's ts is visible to it (<=, as-of semantics).
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__ts").asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "*", F.last("__rrow", ignorenulls=True).over(w).alias("__frow")
    )
    out = filled.where(F.col("__is_left") == 1).select(
        *[F.col("__lrow")[c].alias(c) for c in left.columns],
        *[F.col("__frow")[c].alias(c) for c in value_cols],
    )
    return out


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bucket_width: int,
    keys: Sequence[str] = (),
    condition: Column | None = None,
) -> DataFrame:
    """Interval-overlap join (range join) via bucket decomposition — the
    scalable alternative to the nested-loop plan Spark picks for a pure
    inequality join.

    Each side explodes its interval into the coarse time buckets it
    covers (``sequence(start div w, end div w)``), the sides equi-join on
    (``keys``…, bucket) — a plain shuffled hash join — and the exact
    overlap predicate ``l_start <= r_end AND r_start <= l_end`` filters
    within buckets. A pair overlapping across several buckets would match
    once per shared bucket, so results are emitted ONLY in the bucket
    containing ``greatest(l_start, r_start)`` — exactly-once without a
    ``distinct`` (no second shuffle).

    Start/end columns must be LONGs in a shared unit (epoch seconds,
    days, …; caller converts). Non-key column names must be disjoint
    across the two inputs (rename before calling). ``bucket_width`` trades shuffle
    fan-out for candidate precision: pick ≈ the median interval length —
    long intervals explode into interval/width rows, so cap outliers
    upstream. ``condition`` (e.g. ``col("user_a") < col("user_b")``) is
    applied inside the join to cut candidates before they materialize.

    At 100 TB this is the standard range-join topology (point-in-interval
    joins fall out by passing the point column as both start and end, an
    empty ``keys`` is supported but means every interval lands in the
    global bucket stream — add an equi key whenever the data has one).
    NULL bounds drop (inner-join semantics)."""
    w = int(bucket_width)
    if w <= 0:
        raise ValueError("interval_overlap_join: bucket_width must be positive")
    overlap = (set(left.columns) & set(right.columns)) - set(keys)
    if overlap:
        raise ValueError(
            "interval_overlap_join: non-key column names must be disjoint, "
            f"shared: {sorted(overlap)}"
        )
    lb = left.withColumn(
        "__bucket", F.explode(F.expr(f"sequence({l_start} div {w}, {l_end} div {w})"))
    )
    rb = right.withColumn(
        "__bucket", F.explode(F.expr(f"sequence({r_start} div {w}, {r_end} div {w})"))
    )
    joined = lb.join(rb, ["__bucket", *keys])
    cond = (F.col(l_start) <= F.col(r_end)) & (F.col(r_start) <= F.col(l_end))
    # exactly-once emission: only the bucket holding the overlap's left edge
    cond = cond & (
        F.col("__bucket") == F.expr(f"greatest({l_start}, {r_start}) div {w}")
    )
    if condition is not None:
        cond = cond & condition
    return joined.filter(cond).drop("__bucket")


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
    keys: Sequence[str] = (),
    condition: Column | None = None,
) -> DataFrame:
    """Point-in-interval join: each point row matched to the interval rows
    containing it (``start <= point <= end``). A point is a zero-length
    interval, so this delegates to ``interval_overlap_join`` with the
    point column as both bounds — the point side explodes into exactly
    ONE bucket per row, so only the interval side pays explode fan-out."""
    return interval_overlap_join(
        points,
        intervals,
        point_col,
        point_col,
        start_col,
        end_col,
        bucket_width=bucket_width,
        keys=keys,
        condition=condition,
    )


# ---------------------------------------------------------------------------
# Skew & co-location tools (100 TB posture)
# ---------------------------------------------------------------------------


def _xxhashable(dtype: T.DataType) -> bool:
    """xxhash64 rejects maps (unordered, unhashable) at analysis time —
    including maps nested inside structs/arrays. Recursive screen."""
    if isinstance(dtype, T.MapType):
        return False
    if isinstance(dtype, T.ArrayType):
        return _xxhashable(dtype.elementType)
    if isinstance(dtype, T.StructType):
        return all(_xxhashable(f.dataType) for f in dtype.fields)
    return True


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[Column, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed keys: aggregate on (keys, salt)
    first — spreading a hot key over ``salt_buckets`` reducers — then
    merge the partials on the true keys.

    ``aggs`` maps output name → (partial aggregate expression, merge fn
    name in {'sum','min','max'}): only decomposable aggregates are valid
    (a count merges with 'sum'). AQE's skew-join splitting covers joins;
    this covers aggregations whose hot keys overwhelm single reducers."""
    merge_fns = {"sum": F.sum, "min": F.min, "max": F.max}
    # deterministic salt (hash of the row), NOT rand(): a stage retry
    # after a shuffle-fetch failure recomputes map tasks, and rand() would
    # re-salt the recomputed rows into different buckets than the output
    # already fetched — double-counting under exactly the failure mode a
    # 100 TB job hits. Identical rows sharing a salt is harmless: phase-1
    # partial aggregation collapses them map-side, so each (key, salt)
    # reducer receives at most one row per map task either way.
    # Only xxhash64-hashable columns participate (maps aren't orderable or
    # hashable in Spark); a schema with maps still salts on the rest.
    hashable = [
        F.col(f.name) for f in df.schema.fields if _xxhashable(f.dataType)
    ]
    if not hashable:  # degenerate schema (all-map): constant salt, no spread
        hashable = [F.lit(0)]
    salted = df.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*hashable), F.lit(salt_buckets)).cast("int"),
    )
    partial = salted.groupBy(*keys, "__salt").agg(
        *[expr.alias(name) for name, (expr, _) in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[merge_fns[merge](name).alias(name) for name, (_, merge) in aggs.items()]
    )


def write_bucketed(
    df: DataFrame, table: str, bucket_cols: Sequence[str], num_buckets: int = 32
) -> None:
    """Persist a table bucketed (and sorted) by the join/agg key.

    Two tables bucketed identically join WITHOUT a shuffle (the plan shows
    no Exchange on either side) — at 100 TB this is the difference between
    re-shuffling the fact table on every query and shuffling it once at
    write time. Requires a catalog table (saveAsTable). Thin front for
    `io/bucketed.write_bucketed`, which adds external paths, independent
    sort columns, format choice, a read helper, and a no-shuffle plan
    guard — use that module for new code."""
    from etl_demo_spark.io.bucketed import write_bucketed as _wb

    _wb(df, table, list(bucket_cols), num_buckets, sort_cols=list(bucket_cols))


# ---------------------------------------------------------------------------
# Reporting verbs (O-19…O-23, O-25)
# ---------------------------------------------------------------------------


def top_k(df: DataFrame, metric: str, k: int, tiebreak: Sequence[str] = ()) -> DataFrame:
    """O-21 (`etl_weekly_trades.py:195-201`): top-K by metric desc.

    Compiles to TakeOrderedAndProject — per-partition heap + driver merge,
    no global sort. ``tiebreak`` keys make ties deterministic (pandas sort
    is stable; Spark needs an explicit total order)."""
    order = [F.col(metric).desc()] + [F.col(c).asc() for c in tiebreak]
    return df.orderBy(*order).limit(k)


def keyset_page(
    df: DataFrame, order_cols: Sequence, last: Sequence | None, n: int
) -> DataFrame:
    """X-9 keyset (seek) pagination: the page AFTER cursor ``last`` under
    the total order ``order_cols`` ORDER BY k1,…,km LIMIT n. Each order
    key is either a column name (ascending) or a ``(name, "asc"|"desc")``
    pair — real feeds page newest-first (``ORDER BY ts DESC, id``), and
    mixed directions are legal. ``last`` is the final row's key tuple
    from the previous page (None → first page); the order must end in a
    unique key so pages are deterministic and gap-free, and the order
    keys must be non-null (a seek predicate cannot address NULLs — the
    standard keyset contract).

    Why not OFFSET: OFFSET p·n materializes and discards every earlier
    row — page 10⁶ of a 100 TB table TakeOrders 20M rows through the
    driver merge (`orders_page_two` documents the cliff). Keyset cost is
    depth-independent: the cursor predicate prunes at the SCAN.

    The lexicographic tuple comparison is deliberately decomposed into
    OR-of-ANDs over plain column comparisons — a struct() comparison is
    opaque to the parquet DataSource, while the decomposed form pushes
    down whole regardless of per-key direction (PushedFilters shows the
    full disjunction with GreaterThan/LessThan per the key's direction;
    with the table sorted/partitioned by the leading key, row groups
    before the cursor are skipped entirely — min/max stats). Plan pinned
    in tests/test_plans.py for both directions."""
    if n < 0:
        raise ValueError("keyset_page: n must be >= 0")
    keys: list[tuple[str, bool]] = []  # (column, is_descending)
    for spec in order_cols:
        if isinstance(spec, str):
            keys.append((spec, False))
        else:
            col, direction = spec
            if direction not in ("asc", "desc"):
                raise ValueError(f"keyset_page: direction must be asc|desc, got {direction!r}")
            keys.append((col, direction == "desc"))
    if last is not None:
        if len(last) != len(keys):
            raise ValueError("keyset_page: cursor arity != order arity")
        disjuncts = []
        for i in range(len(keys)):
            conj = [F.col(keys[j][0]) == F.lit(last[j]) for j in range(i)]
            col_i, desc_i = keys[i]
            after = (
                F.col(col_i) < F.lit(last[i])
                if desc_i
                else F.col(col_i) > F.lit(last[i])
            )
            conj.append(after)
            disjuncts.append(reduce(lambda a, b: a & b, conj))
        df = df.filter(reduce(lambda a, b: a | b, disjuncts))
    order = [F.col(c).desc() if d else F.col(c).asc() for c, d in keys]
    return df.orderBy(*order).limit(n)


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    n: int,
    id_col: str,
    seed: str = "",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement — Efraimidis &
    Spirakis A-Res (IPL 2006): each row draws u ~ Uniform(0,1), ranks by
    u^(1/w), and the global top-n is an exact weighted sample. The whole
    algorithm is one narrow projection + TakeOrderedAndProject
    (per-partition heaps of n, driver merge) — no shuffle, no RNG state,
    embarrassingly parallel at any scale.

    The uniform comes from md5(id‖seed) rather than an RNG, so the sample
    is REPRODUCIBLE: identical across runs, cluster sizes, AND engines
    (md5 and the hex→int conversion agree bit-for-bit with DuckDB, so the
    corpus oracle recomputes the exact same sample in SQL). Change
    ``seed`` to draw an independent sample. Rows with weight ≤ 0 or NULL
    are excluded (zero probability mass; pow(u, 1/w) is undefined there).

    This is the training-data mixing primitive: sample documents/orders
    proportionally to quality score, token count, or domain weight
    without materializing per-stratum counts."""
    if n < 0:
        raise ValueError("weighted_sample: n must be >= 0")
    # seed rides as a literal COLUMN, not a spliced SQL string — any seed
    # value is safe (quotes included) and the expression stays injectable-
    # free for callers passing user input
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col(id_col).cast("string"), F.lit(seed))), 1, 8
            ),
            16,
            10,
        ).cast("double")
        + F.lit(0.5)
    ) / F.lit(4294967296.0)
    w = F.col(weight_col).cast("double")
    key = F.pow(u, F.lit(1.0) / w)
    return (
        df.filter(w > 0)
        .withColumn("__sk", key)
        .orderBy(F.col("__sk").desc(), F.col(id_col).asc())
        .limit(n)
        .drop("__sk")
    )


def stratified_exact_sample(
    df: DataFrame,
    strata_cols: Sequence[str],
    n_per_stratum: int,
    id_col: str,
    seed: str = "",
) -> DataFrame:
    """Deterministic EXACT-allocation stratified sample: precisely
    ``n_per_stratum`` rows from every stratum (fewer iff the stratum is
    smaller) — unlike ``sampleBy``, whose Bernoulli draw only hits the
    fraction in expectation. Rows rank inside their stratum by the same
    md5-derived uniform as ``weighted_sample``, so the selection is
    reproducible across runs, cluster sizes, and engines (the corpus
    oracle recomputes it in SQL).

    One hash-partitioned window per stratum — the standard top-n-per-group
    shuffle; Spark's WindowGroupLimit pushes the rank()≤n cut map-side, so
    the exchange carries at most n rows per stratum per map task."""
    if n_per_stratum < 0:
        raise ValueError("stratified_exact_sample: n_per_stratum must be >= 0")
    # literal-column seed — same injection-safety note as weighted_sample
    u = F.conv(
        F.substring(
            F.md5(F.concat(F.col(id_col).cast("string"), F.lit(seed))), 1, 8
        ),
        16,
        10,
    ).cast("double")
    w = Window.partitionBy(*strata_cols).orderBy(u.asc(), F.col(id_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n_per_stratum)
        .drop("__rn")
    )


def mixture_sample(
    df: DataFrame,
    domain_col: str,
    id_col: str,
    alpha: float = 0.5,
    seed: str = "",
) -> DataFrame:
    """Temperature-balanced domain mixture (the training-data rebalance
    every multi-source corpus job runs): downsample each domain toward
    the geometric interpolation between its own size and the SMALLEST
    domain's size — ``n_d = min(c_d, floor(c_d^alpha * c_min^(1-alpha)))``.
    ``alpha=1`` keeps natural proportions, ``alpha=0`` flattens to the
    smallest domain, the default 0.5 is the geometric-mean compromise
    (the α-temperature scheme of multilingual-corpus sampling, applied
    with the min domain as the anchor so no domain is ever UPsampled).

    Rows are chosen per domain by the same md5-uniform rank as
    `stratified_exact_sample`, so the selection is deterministic across
    runs, partitionings, and engines. At alpha=0.5 the target is
    floor(sqrt(c_d*c_min)) computed in IEEE double — bit-identical in
    any engine (the corpus oracle replays it in SQL); other alphas go
    through pow(), whose last-bit rounding is not cross-engine pinned.

    Scale: one count aggregation (tiny result), a broadcast of the
    per-domain targets, and the standard top-n-per-group window (Spark's
    WindowGroupLimit cuts map-side). No full sort, no driver data."""
    if not 0.0 <= alpha <= 1.0:
        raise ValueError("mixture_sample: alpha must be in [0, 1]")
    counts = df.groupBy(F.col(domain_col).alias("__d")).agg(
        F.count(F.lit(1)).alias("__c")
    )
    # global min over the counts frame via an unpartitioned window: the
    # frame is |domains| rows (tiny by construction), and this avoids a
    # 1-row cross join that would trip the cartesian-join plan audit
    cmin = F.min("__c").over(Window.partitionBy())
    if alpha == 0.5:
        target = F.floor(F.sqrt((F.col("__c") * cmin).cast("double")))
    else:
        target = F.floor(
            F.pow(F.col("__c").cast("double"), F.lit(alpha))
            * F.pow(cmin.cast("double"), F.lit(1.0 - alpha))
        )
    targets = counts.select(
        "__d", F.least(F.col("__c"), target).cast("long").alias("__n")
    )
    u = F.conv(
        F.substring(
            F.md5(F.concat(F.col(id_col).cast("string"), F.lit(seed))), 1, 8
        ),
        16,
        10,
    ).cast("double")
    w = Window.partitionBy(domain_col).orderBy(u.asc(), F.col(id_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .join(F.broadcast(targets), F.col(domain_col) == F.col("__d"))
        .filter(F.col("__rn") <= F.col("__n"))
        .drop("__rn", "__d", "__n")
    )


def hash_bernoulli_sample(
    df: DataFrame,
    fractions: dict[str, float],
    strata_col: str,
    id_col: str,
    seed: str = "",
) -> DataFrame:
    """Deterministic stratified Bernoulli sample — ``df.sampleBy`` with
    the RNG swapped for the same md5-derived uniform as
    ``weighted_sample``: keep a row iff u(id‖seed) < its stratum's
    fraction. Identical plan shape to sampleBy (one narrow filter, no
    shuffle, fractions ride as a map literal), but the selection is
    reproducible across runs, cluster sizes, partitionings, AND engines —
    sampleBy's per-partition RNG streams change with the physical split,
    which is exactly what a training-data pipeline cannot have in its
    repro recipe. Strata absent from ``fractions`` are dropped (sampleBy
    semantics: unlisted strata have fraction 0)."""
    pairs: list[Column] = []
    for k, v in fractions.items():
        if not 0.0 <= v <= 1.0:
            raise ValueError(f"hash_bernoulli_sample: fraction {v!r} for {k!r}")
        pairs.extend([F.lit(k), F.lit(float(v))])
    frac = F.element_at(F.create_map(*pairs), F.col(strata_col))
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col(id_col).cast("string"), F.lit(seed))), 1, 8
            ),
            16,
            10,
        ).cast("double")
        + F.lit(0.5)
    ) / F.lit(4294967296.0)
    return df.filter(u < frac)


def ranked(df: DataFrame, metric: str, partition_by: Sequence[str] = ()) -> DataFrame:
    """O-22 (`etl_weekly_trades.py:202`): rank over metric desc.

    pandas default is *average* rank on ties; emulated exactly as
    ``avg(row_number) OVER (PARTITION BY metric value)`` — tie-free data
    degenerates to plain rank. Single-partition window only for report-tail
    frames (post-aggregation, small); partition_by spreads it otherwise."""
    w_order = Window.partitionBy(*partition_by).orderBy(F.col(metric).desc()) if partition_by else Window.orderBy(F.col(metric).desc())
    rn = F.row_number().over(w_order)
    w_tie = Window.partitionBy(*partition_by, metric) if partition_by else Window.partitionBy(metric)
    return df.withColumn("__rn", rn).withColumn("rank", F.avg("__rn").over(w_tie)).drop("__rn")


def union_all(frames: Sequence[DataFrame]) -> DataFrame:
    """O-23 (`etl_weekly_trades.py:207`): vertical concat by column name."""
    return reduce(lambda a, b: a.unionByName(b), frames)


def pivot_wide(
    df: DataFrame, index: str, pivot_col: str, value_col: str, fill: float = 0
) -> DataFrame:
    """O-25 (`etl_weekly_trades.py:256`): long→wide pivot with fill.

    Spark pivots need the distinct pivot values; letting Spark collect them
    is an extra job — fine for low-cardinality report pivots."""
    return df.groupBy(index).pivot(pivot_col).sum(value_col).na.fill(fill)


_SPREAD_DECISIONS: dict[tuple[int, int], bool] = {}


def spread_for_cpu(df: DataFrame) -> DataFrame:
    """Repartition a too-narrow input so a CPU-heavy narrow stage uses the
    whole cluster. Small parquet inputs arrive as 1-2 partitions, which
    serializes per-row higher-order-function work (shingling, n-gram
    expansion, signature folds) on one core; the round-robin shuffle moves
    only the raw input — cheap relative to the per-row CPU it unlocks.
    Measured on top_bigrams at sf0.1: 4.8 s → 1.1 s from spreading alone.
    No-op when the input is already parallel enough.

    The partition-count probe (`df.rdd.getNumPartitions()`) forces a full
    physical-planning py4j roundtrip, a measurable driver-side cost on
    every query BUILD (round 10, guide §7). The decision is a pure
    function of the analyzed plan and the cluster parallelism, so it is
    memoized per (plan semanticHash, defaultParallelism): repeat builds
    over the session-cached base tables skip planning entirely."""
    sc = df.sparkSession.sparkContext
    try:
        key = (df._jdf.queryExecution().analyzed().semanticHash(), sc.defaultParallelism)
        need = _SPREAD_DECISIONS.get(key)
    except Exception:  # connect-mode / API drift: fall back to the probe
        key, need = None, None
    if need is None:
        need = df.rdd.getNumPartitions() < sc.defaultParallelism // 2
        if key is not None:
            _SPREAD_DECISIONS[key] = need
    return df.repartition(sc.defaultParallelism) if need else df


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    schema_evolution: bool = False,
) -> DataFrame:
    """MERGE INTO emulation on plain parquet (no table-format dependence):
    WHEN MATCHED THEN UPDATE SET *  /  WHEN NOT MATCHED THEN INSERT *,
    expressed as one full-outer join on the key with column-wise
    COALESCE(source, target) — source rows win on match, unmatched target
    rows pass through, unmatched source rows insert. By default source
    must share the target's schema.

    ``schema_evolution=True`` relaxes that to the lakehouse automerge
    contract (the first thing a real CDC feed hits when a producer adds a
    field): SOURCE-ONLY columns are appended to the output schema —
    pre-existing target rows carry NULL there; TARGET-ONLY columns are
    preserved — matched rows KEEP the target value (an absent source
    column is "not set by this UPDATE", not "set to NULL"), inserted
    rows get NULL. Key columns must exist on both sides either way.

    Scale: one co-keyed shuffle join; with both sides bucketed on the key
    (write_bucketed) the merge is exchange-free. Rewrite the result
    partition-by-partition (dynamic partition overwrite) to avoid
    rewriting untouched partitions."""
    src_cols = set(source.columns)
    tgt_cols = set(target.columns)
    if not schema_evolution:
        missing = [c for c in target.columns if c not in src_cols]
        if missing:
            raise ValueError(
                f"merge_upsert: source lacks target columns {missing}; pass "
                "schema_evolution=True to merge drifted schemas deliberately"
            )
        carried = target.columns  # output schema == target schema
    else:
        for k in keys:
            if k not in src_cols or k not in tgt_cols:
                raise ValueError(f"merge_upsert: key column {k!r} must exist on both sides")
        # target order first, then new source columns in source order —
        # deterministic and append-only, the way table formats evolve
        carried = target.columns + [c for c in source.columns if c not in tgt_cols]
    # rename the source side up front: change sets are typically DERIVED
    # from the target (CDC reads, corrections), and shared lineage makes
    # unqualified column references ambiguous in the self-join
    renamed = source.select(
        F.lit(True).alias("__src_present"),
        *[F.col(c).alias(f"__src_{c}") for c in carried if c in src_cols],
    )
    cond = None
    for k in keys:
        c = F.col(k).eqNullSafe(F.col(f"__src_{k}"))
        cond = c if cond is None else (cond & c)

    def out(c: str):
        if c not in src_cols:  # target-only: matched rows keep target value
            return F.col(c).alias(c)
        if c not in tgt_cols:  # source-only: target rows surface NULL
            return F.col(f"__src_{c}").alias(c)
        # on both sides: row presence decides which side wins — NOT a
        # per-column COALESCE, which could never apply an update that sets
        # a column to NULL (source NULL would "lose" to the stale value)
        return (
            F.when(F.col("__src_present"), F.col(f"__src_{c}"))
            .otherwise(F.col(c))
            .alias(c)
        )

    return target.join(renamed, cond, "full_outer").select(*[out(c) for c in carried])


def merge_clauses(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    when_matched: str = "update",
    matched_cond: str | None = None,
    insert: bool = True,
    nmbs_delete: bool = False,
    nmbs_cond: str | None = None,
) -> DataFrame:
    """FULL-shape MERGE row combine — the clause family `merge_upsert`'s
    upsert-only subset cannot express (Delta/ANSI MERGE):

      WHEN MATCHED [AND cond] THEN DELETE       (when_matched="delete")
      WHEN MATCHED THEN UPDATE SET *            (when_matched="update")
      WHEN NOT MATCHED THEN INSERT *            (insert=True)
      WHEN NOT MATCHED BY SOURCE [AND cond]
        THEN DELETE                             (nmbs_delete=True)

    Conditions are SQL boolean expressions over TARGET columns; a NULL
    condition never deletes (coalesced to false). The combine is pure
    key-join algebra: matched/unmatched splits are two semi/anti joins
    per side, every branch unions back by name — one co-keyed shuffle
    family, exchange-free when both sides are bucketed on the key.
    Source schemas must match the target exactly (clause merges never
    evolve schema) and duplicate source keys are refused — two clauses
    claiming one target row is non-deterministic by definition."""
    if when_matched not in ("update", "delete"):
        raise ValueError(
            f"merge_clauses: when_matched must be update|delete, got "
            f"{when_matched!r}"
        )
    delete_only = when_matched == "delete" and not insert
    if delete_only:
        # a pure-DELETE merge consumes only the source's KEYS — the
        # natural CDC-tombstone shape ("delete these ids")
        missing = [k for k in keys if k not in source.columns]
        if missing:
            raise ValueError(
                f"merge_clauses: source lacks key columns {missing}"
            )
        src = source.select(*keys)
    elif set(target.columns) != set(source.columns):
        raise ValueError(
            "merge_clauses: source schema must match the target exactly "
            f"(target {sorted(target.columns)}, source "
            f"{sorted(source.columns)}) — clause merges never evolve schema"
        )
    else:
        src = source.select(*target.columns)
    if matched_cond is not None and when_matched != "delete":
        raise ValueError(
            "merge_clauses: a MATCHED condition is only supported on "
            "DELETE (conditional UPDATE would need a keep-else branch "
            "the SET * shape cannot express)"
        )
    if src.groupBy(*keys).count().filter(F.col("count") > 1).limit(1).count():
        raise ValueError(
            "merge_clauses: duplicate source keys — two source rows "
            "claiming one target row is non-deterministic; dedupe the "
            "source first"
        )
    skeys = src.select(*keys).distinct()
    tkeys = target.select(*keys).distinct()
    matched_t = target.join(skeys, keys, "semi")
    unmatched_t = target.join(skeys, keys, "anti")
    parts: list[DataFrame] = []
    if when_matched == "delete":
        mc = (
            F.coalesce(F.expr(matched_cond), F.lit(False))
            if matched_cond
            else F.lit(True)
        )
        parts.append(matched_t.filter(~mc))
    else:  # update set *: matched target rows replaced by source rows
        parts.append(src.join(tkeys, keys, "semi"))
    if nmbs_delete:
        nc = (
            F.coalesce(F.expr(nmbs_cond), F.lit(False))
            if nmbs_cond
            else F.lit(True)
        )
        parts.append(unmatched_t.filter(~nc))
    else:
        parts.append(unmatched_t)
    if insert:
        parts.append(src.join(tkeys, keys, "anti"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def scd2_apply(
    history: DataFrame,
    changes: DataFrame,
    key: str,
    attrs: list[str],
    ts_col: str = "ts",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Slowly-changing-dimension type-2 apply on plain parquet: close the
    current version of every changed key (``valid_to`` = change time) and
    append the new version as the open row. Unchanged keys' rows pass
    through untouched; already-closed rows always pass through.

    ``changes`` carries one row per key: (key, attrs..., ts). A real CDC
    feed with several changes per key per batch applies the LAST one
    (dedupe upstream with ``last_value_by``); no-op changes (attributes
    equal to the current version) are ignored, so re-applying a feed is
    idempotent. Keys with no current row in history (new entities, or
    keys whose versions are all closed) INSERT as open rows.

    Scale: two co-keyed joins on the dimension key (broadcast when the
    change batch is small — the common case) + one union. History grows
    append-only; partition it by ``valid_to IS NULL`` (current vs closed)
    so point-in-time reads prune."""
    cur = history.filter(F.col(valid_to).isNull())
    closed = history.filter(F.col(valid_to).isNotNull())

    ch = changes.select(
        F.col(key).alias("__ck"),
        F.col(ts_col).alias("__cts"),
        *[F.col(a).alias(f"__c_{a}") for a in attrs],
    )
    differs = None
    for a in attrs:
        d = ~F.col(a).eqNullSafe(F.col(f"__c_{a}"))
        differs = d if differs is None else (differs | d)
    joined = cur.join(ch, F.col(key) == F.col("__ck"), "left")
    changed = F.col("__ck").isNotNull() & differs

    untouched = joined.filter(~F.coalesce(changed, F.lit(False))).select(history.columns)
    newly_closed = joined.filter(changed).select(
        *[F.col(c) for c in history.columns if c != valid_to],
        F.col("__cts").alias(valid_to),
    ).select(history.columns)
    new_versions = joined.filter(changed).select(
        F.col(key),
        *[F.col(f"__c_{a}").alias(a) for a in attrs],
        F.col("__cts").alias(valid_from),
        F.lit(None).cast(history.schema[valid_to].dataType).alias(valid_to),
    ).select(history.columns)
    # keys with NO current row (brand-new entities, or keys whose versions
    # are all closed) have no match in `cur` — they must INSERT as open
    # rows, not silently vanish (new entities are the normal case in any
    # dimension feed)
    inserts = (
        ch.join(
            cur.select(F.col(key).alias("__curk")),
            F.col("__ck") == F.col("__curk"),
            "left_anti",
        )
        .select(
            F.col("__ck").alias(key),
            *[F.col(f"__c_{a}").alias(a) for a in attrs],
            F.col("__cts").alias(valid_from),
            F.lit(None).cast(history.schema[valid_to].dataType).alias(valid_to),
        )
        .select(history.columns)
    )
    return (
        closed.unionByName(untouched)
        .unionByName(newly_closed)
        .unionByName(new_versions)
        .unionByName(inserts)
    )


def incremental_agg_merge(
    stored: DataFrame,
    new_partials: DataFrame,
    keys: Sequence[str],
    merge: dict[str, str],
) -> DataFrame:
    """Incremental materialized-aggregate maintenance (continuous-
    aggregate refresh): merge freshly aggregated partials into the stored
    aggregate table instead of recomputing from all history.

    ``merge`` maps column → merge function in {'sum','min','max'} —
    decomposable aggregates only (COUNT merges with 'sum'; AVG must be
    stored as sum+count and finalized on read; exact DISTINCT is not
    decomposable — store HLL sketches and merge those instead, see the
    daily_user_sketches corpus query).

    Scale: the refresh touches |stored keys| + |new keys| rows, never the
    fact history; both sides are pre-aggregated so the union + groupBy
    shuffles partials only. Pair with partitioned storage so the rewrite
    is per-partition (only partitions with new keys rewrite)."""
    merge_fns = {"sum": F.sum, "min": F.min, "max": F.max}
    cols = list(keys) + list(merge)
    both = stored.select(*cols).unionByName(new_partials.select(*cols))
    return both.groupBy(*keys).agg(
        *[merge_fns[how](c).alias(c) for c, how in merge.items()]
    )


def global_row_number(
    df: DataFrame,
    order_by: Sequence[Column],
    rank_col: str = "rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """Distributed global ROW_NUMBER over a total order — the scale-safe
    replacement for ``Window.orderBy(...)`` (which Spark executes as a
    SINGLE-partition window: every row through one task, the canonical
    100 TB killer; Spark even warns ``WindowExec: No Partition Defined``).

    Topology (one wide shuffle total):
      1. ``repartitionByRange`` + ``sortWithinPartitions`` on the order —
         partition *i* holds a contiguous rank range (the one unavoidable
         exchange; this is exactly what a distributed ORDER BY does).
      2. ``monotonically_increasing_id`` decomposed into its documented
         ``(partition_id << 33) | local_position`` layout — the local
         position IS the within-partition rank of the sorted stream, so
         no second window/shuffle is spent deriving it.
      3. Per-partition row counts (a tiny O(P)-row aggregate) → exclusive
         prefix sums via a window over those P rows (single-partition is
         FINE there: P rows, not N) → broadcast back and added to the
         local position.

    The tagged frame is persisted (via cache.tracked_persist — released
    at the next unit-of-work boundary): both the offset branch and the
    output branch must observe the SAME partition layout and id
    assignment (``monotonically_increasing_id`` is marked
    nondeterministic, so an unpersisted recompute may not replay
    identically). ``RDD.zipWithIndex`` pays the identical price — it
    runs a count job over the parent first.

    ``order_by`` must be a TOTAL order (include a unique tiebreaker
    column last) or ranks among ties are arbitrary — true in any engine.
    """
    spark = df.sparkSession
    p = num_partitions or spark.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(p, *order_by).sortWithinPartitions(*order_by)
    tagged = ranged.withColumn("__mid", F.monotonically_increasing_id()).withColumn(
        "__pid", F.shiftright("__mid", 33).cast("int")
    )
    from etl_demo_spark.cache import tracked_persist

    tagged = tracked_persist(tagged)
    counts = tagged.groupBy("__pid").agg(F.count(F.lit(1)).alias("__cnt"))
    w = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "__pid", F.coalesce(F.sum("__cnt").over(w), F.lit(0)).alias("__off")
    )
    local_pos = F.col("__mid").bitwiseAND(F.lit((1 << 33) - 1))
    return (
        tagged.join(F.broadcast(offsets), "__pid")
        .withColumn(rank_col, (F.col("__off") + local_pos + F.lit(1)).cast("long"))
        .drop("__mid", "__pid", "__off")
    )


def pagerank_exact(
    edges: DataFrame,
    n_iter: int = 3,
    damping_pct: int = 85,
    scale: int = 1_000_000,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Distributed PageRank in EXACT integer arithmetic — the iterative
    GRAPH-algorithm twin of ``vec.kmeans_fit_exact``: every step is
    order-free integer math, so the fixpoint is bit-identical under any
    partitioning, AQE re-plan, or engine, and a SQL recursive CTE can
    replay it for a hash-exact oracle (corpus ``trade_graph_pagerank``).

    Semantics (simplified PageRank, Page et al. 1999, no dangling-mass
    redistribution — dangling nodes absorb): scores scaled by ``scale``,

        pr0(v)   = scale
        pr_i(v)  = ((100-d)*scale)//100 + (d * Σ_u pr(u) div outdeg(u))//100

    over distinct directed edges, integer (floor) division throughout —
    on non-negative values Spark's ``div`` and DuckDB's ``//`` agree
    bit-for-bit.

    Scale shape: nodes/outdeg computed once; each iteration is ONE
    contribution join (rank table ⋈ edges on src — at 100 TB the edge
    table is pre-partitioned by src so the join co-locates) + ONE
    groupBy(dst) partial-aggregated shuffle + a broadcast-free left join
    back to the node table; the rank table is localCheckpoint'd per
    iteration to truncate lineage (point at a reliable checkpoint dir on
    a real cluster). No driver-side state beyond the loop counter."""
    e = edges.select(
        F.col(src_col).cast("long").alias("src"),
        F.col(dst_col).cast("long").alias("dst"),
    ).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    outdeg = e.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    base = (100 - damping_pct) * scale // 100
    pr = nodes.withColumn("pr", F.lit(scale).cast("long")).localCheckpoint(
        eager=True
    )
    for _ in range(n_iter):
        contrib = (
            pr.join(outdeg, "node")
            .join(e, F.col("node") == e["src"])
            .select("dst", F.expr("pr div deg").alias("c"))
        )
        sums = contrib.groupBy(F.col("dst").alias("node")).agg(
            F.sum("c").alias("m")
        )
        pr = (
            nodes.join(sums, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr(
                        f"({damping_pct} * coalesce(m, 0L)) div 100"
                    )
                ).cast("long").alias("pr"),
            )
            .localCheckpoint(eager=True)
        )
    return pr


def gap_fill_interpolate(
    df: DataFrame,
    key_cols: Sequence[str],
    bucket_col: str,
    value_col: str,
    step: str = "interval 1 hour",
    method: str = "linear",
) -> DataFrame:
    """Time-series GAP FILLING over a sparse bucketed series — the
    `time_bucket_gapfill` + `interpolate`/`locf` shape every metrics
    store grows: given one row per (key, bucket) with buckets MISSING
    where nothing happened, emit the dense per-key series with gaps
    filled.

    Per key: bounds from one aggregate, the dense spine from
    ``sequence(lo, hi, step)`` exploded EXECUTOR-side (never a driver
    loop — a 10-year hourly spine is 87k rows per key, generated where
    the key lives), left-join the observed rows back, then fill:

    * ``method="locf"`` — last observation carried forward;
    * ``method="linear"`` — interior gaps interpolate between the
      bracketing observations (equally-spaced buckets, so row position
      is the time axis: prev + (next−prev) · gap_fraction); leading /
      trailing gaps have no bracket and stay NULL (Timescale's
      `interpolate` contract).

    Output: key_cols + bucket_col + ``value_filled`` + ``interpolated``
    (true only for interior filled gaps). Scale shape: one hash
    exchange for the bounds aggregate, one for the spine⋈observed join,
    and the per-key window sorts ride the join's partitioning — no
    global sort, no driver data."""
    if method not in ("linear", "locf"):
        raise ValueError(f"gap_fill_interpolate: unknown method {method!r}")
    keys = list(key_cols)
    bounds = df.groupBy(*keys).agg(
        F.min(bucket_col).alias("__lo"), F.max(bucket_col).alias("__hi")
    )
    spine = bounds.select(
        *keys,
        F.explode(F.expr(f"sequence(__lo, __hi, {step})")).alias(bucket_col),
    )
    dense = spine.join(
        df.select(*keys, bucket_col, value_col), [*keys, bucket_col], "left"
    )
    w = Window.partitionBy(*keys).orderBy(bucket_col)
    dense = dense.withColumn("__rn", F.row_number().over(w))
    wprev = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wnext = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    v = F.col(value_col)
    pv = F.last(v, ignorenulls=True).over(wprev)
    pr = F.last(F.when(v.isNotNull(), F.col("__rn")), ignorenulls=True).over(wprev)
    nv = F.first(v, ignorenulls=True).over(wnext)
    nr = F.first(F.when(v.isNotNull(), F.col("__rn")), ignorenulls=True).over(wnext)
    if method == "locf":
        filled = F.coalesce(v, pv)
        interp = v.isNull() & pv.isNotNull()
    else:
        # weighted-average form (pv·(nr−rn) + nv·(rn−pr)) / (nr−pr):
        # algebraically the usual pv + (nv−pv)·frac, but with INTEGER
        # value columns the numerator/denominator are exact ints and the
        # single division is IEEE-identical across engines — the form
        # the cross-engine-exact corpus oracle relies on
        rn = F.col("__rn")
        filled = F.when(v.isNotNull(), v).when(
            pr.isNotNull() & nr.isNotNull(),
            (pv * (nr - rn) + nv * (rn - pr)) / (nr - pr),
        )
        interp = v.isNull() & pr.isNotNull() & nr.isNotNull()
    return dense.select(
        *keys,
        bucket_col,
        filled.alias("value_filled"),
        interp.alias("interpolated"),
    )
