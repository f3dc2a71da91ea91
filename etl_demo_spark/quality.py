"""Declarative data-quality expectations (Deequ-style, library-light).

The reference's de-facto quality layer is a handful of inline diagnostic
prints — null-row counts (`etl_weekly_trades.py:25`), categorical domain
screens (`:27-30`), invalid-timestamp listings (`:39-41`) — run as separate
eager passes. This module generalizes them into declarative, composable
constraints evaluated in ONE Spark job:

* row-level checks (not-null, domain, range, regex, custom predicate)
  compile to conditional-count aggregate expressions and share a single
  aggregation over the table — at 100 TB you pay one scan for the whole
  suite, with every counter accumulated map-side;
* table-level checks (unique key) ride the same pass via distinct-count
  aggregates;
* cross-table checks (foreign-key references) are separate broadcast-able
  anti-join counts, unioned into the same report.

Output is one row per constraint: (check, violations, total, passed) —
small enough to alert on, join into CI gates, or track over time.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    """A named row-level expectation. ``predicate`` is True where the row
    is OK; NULL evaluates as a violation (SQL three-valued logic would
    otherwise let NULLs slip through every comparison check)."""

    name: str
    predicate: Column


def not_null(col: str) -> Check:
    return Check(f"not_null({col})", F.col(col).isNotNull())


def in_domain(col: str, values: tuple[str, ...]) -> Check:
    return Check(f"in_domain({col})", F.col(col).isin(*values))


def in_range(col: str, lo: float, hi: float) -> Check:
    return Check(f"in_range({col})", (F.col(col) >= lo) & (F.col(col) <= hi))


def matches(col: str, regex: str) -> Check:
    return Check(f"matches({col})", F.col(col).rlike(regex))


def satisfies(name: str, predicate: Column) -> Check:
    """Escape hatch: any boolean Column as a named expectation."""
    return Check(name, predicate)


def _violations(check: Check) -> Column:
    # NULL predicate → violation: coalesce the tri-state bool to False.
    # The outer coalesce handles the empty-table case: SUM over zero rows
    # is NULL, and a quality gate must report 0 violations / passed=true
    # there, not a NULL that fails neither `passed` nor `NOT passed`.
    ok = F.coalesce(check.predicate, F.lit(False))
    return F.coalesce(F.sum(F.when(ok, 0).otherwise(1)), F.lit(0)).cast("long")


def run_checks(
    df: DataFrame,
    checks: list[Check],
    unique_keys: list[list[str]] | None = None,
) -> DataFrame:
    """Evaluate all expectations in one aggregation pass over ``df``.

    Every row-level check becomes one conditional-count aggregate; a
    unique-key expectation adds a count-distinct over the key struct
    (violations = rows beyond the first per duplicated key). The result
    is unpivoted to one row per check via an array-of-structs explode —
    a single driver-sized row becomes len(checks) rows, no extra job.
    """
    unique_keys = unique_keys or []
    if not checks and not unique_keys:
        # empty suite (e.g. a config-driven gate that filtered to zero
        # applicable checks): an empty all-passed report, not an
        # array<void> AnalysisException from F.array() of nothing
        spark = df.sparkSession
        return spark.createDataFrame(
            [], "check string, violations long, total long, passed boolean"
        )
    aggs = [F.count(F.lit(1)).alias("_total")]
    names: list[str] = []
    for c in checks:
        names.append(c.name)
        aggs.append(_violations(c).alias(f"_v{len(names) - 1}"))
    for keys in unique_keys:
        names.append(f"unique_key({','.join(keys)})")
        aggs.append(
            (
                F.count(F.lit(1))
                - F.count_distinct(F.struct(*[F.col(k) for k in keys]))
            )
            .cast("long")
            .alias(f"_v{len(names) - 1}")
        )
    wide = df.agg(*aggs)
    report = F.array(
        *[
            F.struct(
                F.lit(n).alias("check"),
                F.col(f"_v{i}").alias("violations"),
                F.col("_total").alias("total"),
            )
            for i, n in enumerate(names)
        ]
    )
    return (
        wide.select(F.explode(report).alias("r"))
        .select("r.check", "r.violations", "r.total")
        .withColumn("passed", F.col("violations") == 0)
    )


def run_suite(
    df: DataFrame,
    checks: list[Check],
    unique_keys: list[list[str]] | None = None,
    references: list[tuple[str, DataFrame, str]] | None = None,
) -> DataFrame:
    """The whole expectation suite — row-level checks, unique keys, AND
    referential checks — in ONE pass over ``df``.

    ``references`` is a list of (fk_col, dim_df, pk_col). Instead of a
    separate anti-join pass per FK (a second full scan of the fact table
    each), every FK rides the single scan as a row-preserving LEFT join
    against the deduplicated dim keys; "fk present but unmatched" becomes
    one more violation flag in the shared aggregation. The join cannot
    change the row count (the key side is distinct), so every other
    counter is unaffected; the violation count is exactly the anti-join
    count.

    Aggregation shape: a unique-key expectation makes the distinct-count
    keys near-unique, where map-side partial aggregation reduces nothing —
    it only builds a ~row-count hash map of counters inside the scan tasks
    and shuffles the same rows anyway. With exactly one unique key the
    suite therefore repartitions the projected flag columns by that key
    (AQE-managed count), aggregates per key AFTER the exchange, and folds
    the per-key counts in a trivial final aggregate:
    ``unique violations = SUM(per-key n) − COUNT(keys)`` — the identical
    number ``COUNT(*) − COUNT(DISTINCT key)`` produces. With zero or
    several unique keys it falls back to the one-row aggregate of
    ``run_checks`` (still folding the FKs into the same scan).
    """
    unique_keys = unique_keys or []
    references = references or []
    work = df
    check_flags: list[tuple[str, Column]] = []
    for c in checks:
        ok = F.coalesce(c.predicate, F.lit(False))
        check_flags.append((c.name, F.when(ok, 0).otherwise(1)))
    ref_flags: list[tuple[str, Column]] = []
    for fk, dim, pk in references:
        marker = f"__ref_{fk}"
        keys = dim.select(F.col(pk).alias(marker)).distinct()
        work = work.join(keys, work[fk] == F.col(marker), "left")
        ref_flags.append(
            (
                f"references({fk})",
                F.when(F.col(fk).isNotNull() & F.col(marker).isNull(), 1).otherwise(0),
            )
        )
    # final report order: checks, unique keys, references (matches the
    # run_checks + union(references) composition this replaces)
    if len(unique_keys) == 1:
        ukey = unique_keys[0]
        flags = check_flags + ref_flags
        # pack the 0/1 violation flags into ONE integer column so the
        # repartition exchange carries (key cols + 4 bytes) per row instead
        # of len(flags) columns — the flags are re-extracted as bit fields
        # after the shuffle, where the work is parallel (measured: the
        # packed shuffle closes ~2/3 of the local gap vs the multi-column
        # form at sf0.1; at scale the exchange is the dominant byte mover).
        # >30 flags would overflow the int bit-pack: fall back to one long
        # (never in practice — a suite that size should be split anyway).
        wide_pack = len(flags) > 30
        packed = None
        for i, (_, f) in enumerate(flags):
            bit = f.cast("long") if wide_pack else f
            packed = bit if packed is None else packed + F.shiftleft(bit, i)
        proj = work.select(
            *[F.col(k) for k in ukey],
            packed.cast("long" if wide_pack else "int").alias("_pk"),
        )
        per_key = (
            proj.repartition(*ukey)
            .groupBy(*ukey)
            .agg(
                F.count(F.lit(1)).alias("_n"),
                *[
                    F.sum(F.shiftright("_pk", i).bitwiseAND(F.lit(1))).alias(f"_s{i}")
                    for i in range(len(flags))
                ],
            )
        )
        wide = per_key.agg(
            F.coalesce(F.sum("_n"), F.lit(0)).cast("long").alias("_total"),
            *[
                F.coalesce(F.sum(f"_s{i}"), F.lit(0)).cast("long").alias(f"_v{i}")
                for i in range(len(flags))
            ],
            F.coalesce(F.sum("_n") - F.count(F.lit(1)), F.lit(0))
            .cast("long")
            .alias("_vdup"),
        )
        entries = [(n, f"_v{i}") for i, (n, _) in enumerate(check_flags)]
        entries.append((f"unique_key({','.join(ukey)})", "_vdup"))
        entries.extend(
            (n, f"_v{len(check_flags) + i}") for i, (n, _) in enumerate(ref_flags)
        )
    else:
        aggs = [F.count(F.lit(1)).alias("_total")]
        entries = []
        for i, (n, f) in enumerate(check_flags):
            entries.append((n, f"_v{i}"))
            aggs.append(F.coalesce(F.sum(f), F.lit(0)).cast("long").alias(f"_v{i}"))
        for keys in unique_keys:
            idx = len(entries)
            entries.append((f"unique_key({','.join(keys)})", f"_v{idx}"))
            aggs.append(
                (
                    F.count(F.lit(1))
                    - F.count_distinct(F.struct(*[F.col(k) for k in keys]))
                )
                .cast("long")
                .alias(f"_v{idx}")
            )
        for n, f in ref_flags:
            idx = len(entries)
            entries.append((n, f"_v{idx}"))
            aggs.append(F.coalesce(F.sum(f), F.lit(0)).cast("long").alias(f"_v{idx}"))
        if not entries:
            spark = df.sparkSession
            return spark.createDataFrame(
                [], "check string, violations long, total long, passed boolean"
            )
        wide = work.agg(*aggs)
    report = F.array(
        *[
            F.struct(
                F.lit(n).alias("check"),
                F.col(v).alias("violations"),
                F.col("_total").alias("total"),
            )
            for n, v in entries
        ]
    )
    return (
        wide.select(F.explode(report).alias("r"))
        .select("r.check", "r.violations", "r.total")
        .withColumn("passed", F.col("violations") == 0)
    )


def references(
    df: DataFrame, fk: str, dim: DataFrame, pk: str, total: int | None = None
) -> DataFrame:
    """Referential-integrity expectation: every non-null ``fk`` value in
    ``df`` exists as ``dim.pk``. Violations via LEFT ANTI join — Catalyst
    broadcasts small dims automatically, and AQE converts at runtime when
    stats only materialize then. Returns the same report shape as
    ``run_checks`` so callers can union the two."""
    viol = (
        df.where(F.col(fk).isNotNull())
        .join(dim.select(F.col(pk).alias(fk)).distinct(), on=fk, how="left_anti")
        .agg(F.count(F.lit(1)).cast("long").alias("violations"))
    )
    tot = (
        df.agg(F.count(F.lit(1)).cast("long").alias("total"))
        if total is None
        else None
    )
    base = viol.crossJoin(tot) if tot is not None else viol.withColumn(
        "total", F.lit(total).cast("long")
    )
    return base.select(
        F.lit(f"references({fk})").alias("check"),
        "violations",
        "total",
        (F.col("violations") == 0).alias("passed"),
    )
