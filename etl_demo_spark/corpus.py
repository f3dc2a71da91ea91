"""Query corpus: every operator from SURVEY.md §2 as a named (PySpark
query, DuckDB oracle SQL) pair, run by the driver at sf=0.01.

Conventions (driver contract, `__spark_entry__.py` docstring):
  * each query callable takes (spark, sf_dir) and returns a DataFrame;
  * every computed column is aliased identically in Spark and SQL;
  * floating-point SUMs are computed in exact DECIMAL on BOTH sides and
    cast back to DOUBLE. Double summation is order-dependent, so raw float
    sums differ between engines (and between Spark runs) in the low bits —
    and because the raw data has fixed 2-4 decimal precision, rounding the
    float sums lands exactly on round-half boundaries. Decimal aggregation
    is associative/exact, so both engines produce the identical decimal and
    the identical double after the final cast. The input columns are 2dp
    quantities/prices, so double→decimal(_,4) conversion is lossless;
  * counts are BIGINT on both sides (DuckDB SUM(int) would be HUGEINT —
    always CAST in the oracle);
  * decimal→double conversion is only correctly rounded on both engines
    when the scaled integer (value × 10^scale) fits in 2^53 — beyond that
    DuckDB's int128/10^scale double path can differ from Java by 1 ULP.
    Large-magnitude scale-8 sums are therefore ROUNDed to scale 2 in
    exact decimal space (identical on both engines: half-up on positive
    decimals) before the cast. Caught by the sf0.1 sweep; rule of thumb:
    |sum| × 10^scale < 9e15.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_demo_spark.cache import release_persisted as _release_persisted
from etl_demo_spark.cache import tracked_persist as _tracked_persist
from etl_demo_spark.io.sources import load_tables
from etl_demo_spark.ops import asof_join, week_start


def _t(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    tabs = load_tables(spark, sf_dir, tables=tuple(names))
    return [tabs[n] for n in names]

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}
_LAST_QUERY: list[str | None] = [None]  # release caches on query CHANGE


def query(name: str, oracle: str | None = None):
    """Register a corpus entry. ``oracle=None`` → driver rows-only check.

    The REGISTERED callable releases operator-internal caches when a
    DIFFERENT query starts (cache.release_persisted) — by the time the
    driver/bench moves on, the prior query's result has been consumed, so
    a sweep holds at most one query's caches instead of accumulating all
    of them across a 148-query sweep. REPEATED invocations of the same
    query keep their caches (Spark's CacheManager dedupes by plan, so the
    re-persist reuses the existing table — its "already cached" log line
    is the reuse working): that is the steady-state a resident cluster
    sustains, and what bench.py's warm+timed loop is documented to
    measure. The original function is returned unwrapped so in-module
    composition is unaffected.
    """
    import functools

    def deco(fn: QueryFn) -> QueryFn:
        @functools.wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            if _LAST_QUERY[0] != name:
                _release_persisted()
                _LAST_QUERY[0] = name
            return fn(spark, sf_dir)

        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# Precisions chosen so Spark decimal arithmetic never hits the precision-38
# cap (which triggers scale-loss rounding): (18,4) * (8,4) → (28,8) exact in
# Spark, scale 8 in DuckDB too. Inputs are ≤2dp, so the lift is lossless.
DEC = "decimal(18,4)"  # money / quantity columns
DEC_SQL = "DECIMAL(18,4)"
RATE = "decimal(8,4)"  # rates in [0,1] (discount, tax)
RATE_SQL = "DECIMAL(8,4)"


def dec(c: str | F.Column) -> F.Column:
    """Lift a raw double money column into exact decimal space."""
    col = F.col(c) if isinstance(c, str) else c
    return col.cast(DEC)


def rate(c: str | F.Column) -> F.Column:
    """Lift a raw double rate column into exact decimal space."""
    col = F.col(c) if isinstance(c, str) else c
    return col.cast(RATE)


def dsum(c: F.Column) -> F.Column:
    """Order-independent, engine-identical SUM: exact decimal accumulation
    (operands must already be decimal via ``dec``), result as DOUBLE."""
    return F.sum(c).cast("double")


# Fixed-point fast path: per-row decimal MULTIPLICATION dominates the cost of
# the money aggregates (measured ~2.4× a long multiply at sf0.1). The inputs
# are ≤2dp decimals stored as doubles, so price×(1−disc)[×(1+tax)] is computed
# exactly in scaled-integer space — cents × basis points — with long
# arithmetic, and only the final SUM accumulates in decimal (overflow-proof
# at cluster scale; a per-row product is < 7×10^10, so even petabyte row
# counts can't overflow the decimal(28,0) accumulator, while a long SUM
# would wrap at ~1.3×10^8 rows/partition). The mathematical value is
# identical to the dec()/rate() path — verified bit-for-bit at sf0.1 —
# so oracles keep their decimal formulation.


def money_c(c: str | F.Column) -> F.Column:
    """Money column → exact cents as long (inputs are ≤2dp)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.round(col * 100, 0).cast("long")


def rate_bp(c: str | F.Column) -> F.Column:
    """Rate column → exact basis points as long (inputs are ≤4dp)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.round(col * 10000, 0).cast("long")


def ssum(scaled: F.Column, frac_digits: int) -> F.Column:
    """SUM a scaled-long product exactly and rescale: decimal accumulation,
    one exact decimal division by 10^frac_digits, ROUND to 2dp in decimal
    space (half-up on both engines), then one double cast.

    The sum is downcast to its true magnitude bound BEFORE the division
    so the quotient never hits Spark's precision-38 cap: SUM over
    decimal(p,0) types as decimal(p+10,0), and dividing that by 10^10
    needs p+10+12 digits — capped, and adjustPrecisionScale then clamps
    the quotient's scale to 6, injecting a hidden half-up round BEFORE
    the 2dp round (double rounding: residue .0049999999 → .005000 → .01,
    while the oracle's single exact round gives .00 — reproduced live).
    The downcast is safe by construction: p1 = 38 − max(6, frac+2) ≥ 26
    holds ~10^26 of scaled magnitude, far above any realistic total, and
    a violation surfaces as NULL (non-ANSI overflow), not silent
    wraparound. With p1 int digits the quotient is decimal(38, ≥frac) —
    exact."""
    acc_p = 38 - max(6, frac_digits + 2)
    total = (
        F.sum(scaled.cast(f"decimal({acc_p},0)")).cast(f"decimal({acc_p},0)")
        / F.lit(10**frac_digits)
    )
    return F.round(total, 2).cast("double")


# ---------------------------------------------------------------------------
# Round-10 optimization: chunked long-space money sums.
#
# A decimal(>18,0) SUM accumulator is stored as a byte array in the agg
# hash map (only precision ≤ 18 rides the compact-long fast path), so every
# per-row update boxes through BigDecimal — measured ~2.4× the cost of a
# long update at sf0.1, and the dominant per-row cost of the low-cardinality
# money aggregations once the multiplication already runs in scaled-long
# space. The fix is a two-level aggregate (guide §2.3/§2.4 shape):
#
#   stage 1  groupBy(keys, spark_partition_id()) — pure LONG sums. Each
#            (key, pid) group lives in exactly one scan task, so the
#            map-side partial collapses it to one row; the exchange carries
#            the same row count as the single-level plan's partial rows
#            but with 8-byte longs instead of 16-byte decimals.
#   stage 2  groupBy(keys) — the handful of per-task partials are combined
#            in exact decimal, then rescaled/rounded/cast exactly as
#            ssum/dsum would have.
#
# Overflow safety is structural, not statistical: a scaled product v is
# split as hi = v div 1e8, lo = v % 1e8 (exact long identity
# hi*1e8 + lo == v, negatives included). |lo| < 1e8 and |hi| ≤ |v|/1e8, so
# with per-row |v| ≤ ~1.3e15 (price_c × bp × bp bounds) a per-task long sum
# overflows only past ~9e10 rows — two orders of magnitude beyond any real
# scan split (10^9 rows ≈ hundreds of GB in one task). Values already
# ≤ 1e8 per row (cents, basis points) skip the split and use one long sum
# (same ~9e10 rows/task bound). The recombined decimal total is
# bit-identical to the direct decimal SUM: integer arithmetic throughout,
# and the final divide/round/cast sequence is unchanged.
# ---------------------------------------------------------------------------

_HL = 100_000_000  # hi/lo split point (1e8)


def hl_split(scaled: F.Column, name: str) -> list[F.Column]:
    """Split a scaled-long product into exact (hi, lo) long parts."""
    hi = F.call_function("div", scaled, F.lit(_HL))
    return [hi.alias(f"__{name}_h"), (scaled % F.lit(_HL)).alias(f"__{name}_l")]


def _dsum28(c: str) -> F.Column:
    return F.sum(F.col(c).cast("decimal(28,0)")).cast("decimal(28,0)")


def hl_total(name: str) -> F.Column:
    """Exact decimal(38,0)-safe total of hl_split partial long sums."""
    return (_dsum28(f"__{name}_h") * F.lit(_HL) + _dsum28(f"__{name}_l")).cast(
        "decimal(32,0)"
    )


def ssum_total(total: F.Column, frac_digits: int) -> F.Column:
    """ssum's exact rescale/round/cast, applied to an hl_total column."""
    acc_p = 38 - max(6, frac_digits + 2)
    q = total.cast(f"decimal({acc_p},0)") / F.lit(10**frac_digits)
    return F.round(q, 2).cast("double")


# ---------------------------------------------------------------------------
# Flagship (SURVEY.md §7 step 1): weekly 4-key-ish aggregation on lineitem —
# the reference's O-7 week bucket + O-8 notional + O-10 multi-key hash agg,
# mapped onto the TPC-H-ish star schema.
# ---------------------------------------------------------------------------


@query(
    "flagship_weekly_revenue",
    oracle=f"""
    SELECT CAST(date_trunc('week', l_shipdate) AS DATE) AS week_start_date,
           l_returnflag,
           CAST(ROUND(SUM(CAST(l_extendedprice AS {DEC_SQL})
                          * (1 - CAST(l_discount AS {RATE_SQL}))), 2) AS DOUBLE) AS revenue,
           CAST(SUM(CAST(l_quantity AS {DEC_SQL})) AS DOUBLE) AS sum_qty,
           COUNT(*) AS trade_count
    FROM lineitem
    GROUP BY 1, 2
    """,
)
def flagship_weekly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-7 + O-8 + O-10 on lineitem: weekly revenue per returnflag.

    One shuffle (the groupBy); week bucketing and the notional projection
    are codegen'd into the scan stage; parquet reader prunes to the four
    referenced columns (check ReadSchema)."""
    li = load_tables(spark, sf_dir, tables=("lineitem",))["lineitem"]
    notional_s = money_c("l_extendedprice") * (10000 - rate_bp("l_discount"))
    # round-10: chunked long accumulation (see hl_split) — the scan stage
    # does only long hash-agg updates; the per-task partials combine in
    # exact decimal in stage 2. Bit-identical to ssum/dsum on the same
    # inputs; oracle unchanged.
    part = (
        li.select(
            week_start("l_shipdate").alias("week_start_date"),
            "l_returnflag",
            F.spark_partition_id().alias("__c"),
            money_c("l_quantity").alias("__q"),
            *hl_split(notional_s, "rev"),
        )
        .groupBy("week_start_date", "l_returnflag", "__c")
        .agg(
            F.sum("__rev_h").alias("__rev_h"),
            F.sum("__rev_l").alias("__rev_l"),
            F.sum("__q").alias("__q"),
            F.count(F.lit(1)).alias("__n"),
        )
    )
    return part.groupBy("week_start_date", "l_returnflag").agg(
        ssum_total(hl_total("rev"), 6).alias("revenue"),
        (_dsum28("__q") / F.lit(100)).cast("decimal(32,4)").cast("double").alias("sum_qty"),
        F.sum("__n").alias("trade_count"),
    )


# ---------------------------------------------------------------------------
# Relational breadth (SURVEY.md §2.2 X-2…X-9) on the TPC-H-ish star schema.
# ---------------------------------------------------------------------------


@query(
    "pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS {DEC_SQL})) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS {DEC_SQL})) AS DOUBLE) AS sum_base_price,
           CAST(ROUND(SUM(CAST(l_extendedprice AS {DEC_SQL}) * (1 - CAST(l_discount AS {RATE_SQL}))), 2) AS DOUBLE) AS sum_disc_price,
           CAST(ROUND(SUM(CAST(l_extendedprice AS {DEC_SQL}) * (1 - CAST(l_discount AS {RATE_SQL})) * (1 + CAST(l_tax AS {RATE_SQL}))), 2) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS {DEC_SQL})) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_discount AS {RATE_SQL})) AS DOUBLE) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary (O-10 + X-8 arithmetic).

    Averages are computed as exact-decimal sum / count so both engines do
    one identical double division at the end (a native AVG would float-
    accumulate in engine-specific order).

    Round-10: the per-row money sums accumulate as chunked LONGS
    (hl_split — see the helper's overflow proof) and only the per-task
    partials are combined in decimal, removing every per-row BigDecimal
    update from the scan stage. Values are bit-identical to the direct
    decimal formulation; verified against the unchanged oracle."""
    (li,) = _t(spark, sf_dir, "lineitem")
    disc_price_s = money_c("l_extendedprice") * (10000 - rate_bp("l_discount"))
    charge_s = disc_price_s * (10000 + rate_bp("l_tax"))
    # stage 1: per-(group, task) LONG partials — q/p/d are ≤1e8 per row
    # (cents / basis points) so a single long sum is overflow-safe; the
    # two products split hi/lo
    part = li.select(
        "l_returnflag",
        "l_linestatus",
        F.spark_partition_id().alias("__c"),
        money_c("l_quantity").alias("__q"),
        money_c("l_extendedprice").alias("__p"),
        rate_bp("l_discount").alias("__d"),
        *hl_split(disc_price_s, "ds"),
        *hl_split(charge_s, "cs"),
    ).groupBy("l_returnflag", "l_linestatus", "__c").agg(
        F.sum("__q").alias("__q"),
        F.sum("__p").alias("__p"),
        F.sum("__d").alias("__d"),
        F.sum("__ds_h").alias("__ds_h"),
        F.sum("__ds_l").alias("__ds_l"),
        F.sum("__cs_h").alias("__cs_h"),
        F.sum("__cs_l").alias("__cs_l"),
        F.count(F.lit(1)).alias("__n"),
    )
    # stage 2: exact decimal combine of the few per-task partials
    cnt = F.sum("__n")
    qty_dec = (_dsum28("__q") / F.lit(100)).cast("decimal(32,4)")
    price_dec = (_dsum28("__p") / F.lit(100)).cast("decimal(32,4)")
    disc_dec = (_dsum28("__d") / F.lit(10000)).cast("decimal(32,4)")
    return part.groupBy("l_returnflag", "l_linestatus").agg(
        qty_dec.cast("double").alias("sum_qty"),
        price_dec.cast("double").alias("sum_base_price"),
        ssum_total(hl_total("ds"), 6).alias("sum_disc_price"),
        ssum_total(hl_total("cs"), 10).alias("sum_charge"),
        (qty_dec.cast("double") / cnt).alias("avg_qty"),
        (disc_dec.cast("double") / cnt).alias("avg_disc"),
        cnt.alias("count_order"),
    )


@query(
    "segment_revenue",
    oracle=f"""
    SELECT c_mktsegment,
           CAST(SUM(CAST(o_totalprice AS {DEC_SQL})) AS DOUBLE) AS revenue,
           COUNT(*) AS n_orders
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def segment_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-2 inner join: fact(orders) ⋈ dim(customer), dim broadcast — no
    shuffle of the fact side; agg on a low-cardinality key."""
    orders, customer = _t(spark, sf_dir, "orders", "customer")
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .groupBy("c_mktsegment")
        .agg(dsum(dec("o_totalprice")).alias("revenue"), F.count(F.lit(1)).alias("n_orders"))
    )


@query(
    "regional_revenue",
    oracle=f"""
    SELECT r_name,
           CAST(ROUND(SUM(CAST(l_extendedprice AS {DEC_SQL}) * (1 - CAST(l_discount AS {RATE_SQL}))), 2) AS DOUBLE) AS revenue
    FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style 5-table join (X-2). lineitem⋈orders is the only big
    shuffle (co-keyed on orderkey); customer/nation/region broadcast."""
    li, orders, customer, nation, region = _t(
        spark, sf_dir, "lineitem", "orders", "customer", "nation", "region"
    )
    revenue_s = money_c("l_extendedprice") * (10000 - rate_bp("l_discount"))
    # round-10: chunked long accumulation (hl_split) after the joins — the
    # join stage's agg does long updates only; decimal combine on the tiny
    # per-task partials. Bit-identical; oracle unchanged.
    part = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("r_name", F.spark_partition_id().alias("__c"), *hl_split(revenue_s, "rev"))
        .groupBy("r_name", "__c")
        .agg(F.sum("__rev_h").alias("__rev_h"), F.sum("__rev_l").alias("__rev_l"))
    )
    return part.groupBy("r_name").agg(
        ssum_total(hl_total("rev"), 6).alias("revenue")
    )


@query(
    "customers_with_open_orders",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
    """,
)
def customers_with_open_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-2 left-semi join — no row multiplication, right side reduced to
    existence bits before the join."""
    orders, customer = _t(spark, sf_dir, "orders", "customer")
    open_orders = orders.filter(F.col("o_orderstatus") == "O")
    return customer.join(
        open_orders, customer.c_custkey == open_orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@query(
    "customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-2 left-anti join."""
    orders, customer = _t(spark, sf_dir, "orders", "customer")
    return customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "customer_order_stats_left",
    oracle=f"""
    SELECT c_custkey,
           COUNT(o_orderkey) AS n_orders,
           CAST(COALESCE(SUM(CAST(o_totalprice AS {DEC_SQL})), 0) AS DOUBLE) AS total_spent
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
)
def customer_order_stats_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-2 left outer join preserving order-less customers; COUNT(col)
    counts non-nulls on both engines; sum-of-empty coalesced to 0."""
    orders, customer = _t(spark, sf_dir, "orders", "customer")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(F.sum(dec("o_totalprice")), F.lit(0).cast(DEC)).cast("double").alias("total_spent"),
        )
    )


@query(
    "bulky_lineitems_theta",
    oracle="""
    SELECT p_brand, COUNT(*) AS n_bulky
    FROM lineitem JOIN part ON l_partkey = p_partkey AND l_quantity > p_size
    GROUP BY p_brand
    """,
)
def bulky_lineitems_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-2 theta join: equi key + non-equi residual predicate. Catalyst
    keeps the equi part as the join key (hash/broadcast) and evaluates the
    range predicate as a post-join filter — no cartesian blowup."""
    li, part = _t(spark, sf_dir, "lineitem", "part")
    return (
        li.join(
            F.broadcast(part),
            (li.l_partkey == part.p_partkey) & (li.l_quantity > part.p_size),
        )
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n_bulky"))
    )


@query(
    "orders_running_total",
    oracle=f"""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS {DEC_SQL}))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
    FROM orders
    """,
)
def orders_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-6 window frame: per-customer cumulative spend. Total order
    (orderdate, orderkey) makes the frame deterministic; decimal
    accumulation keeps both engines bit-identical."""
    from pyspark.sql import Window

    (orders,) = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(dec("o_totalprice")).over(w).cast("double").alias("running_spend"),
    )


@query(
    "orders_window_ranks",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROW_NUMBER()  OVER w AS rn,
           RANK()        OVER w AS rnk,
           DENSE_RANK()  OVER w AS drnk,
           NTILE(4)      OVER w AS quartile,
           LAG(o_orderkey)  OVER w AS prev_orderkey,
           LEAD(o_orderkey) OVER w AS next_orderkey
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def orders_window_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-6 ranking + analytic window functions over a deterministic total
    order per customer."""
    from pyspark.sql import Window

    (orders,) = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    # ranking functions are INT in Spark but BIGINT in DuckDB/ANSI — cast
    # to long so a type-strict schema comparison agrees
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).cast("long").alias("rn"),
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.lag("o_orderkey").over(w).alias("prev_orderkey"),
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
    )


@query(
    "orders_rollup",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS {DEC_SQL})) AS DOUBLE) AS revenue
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def orders_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-5 rollup: hierarchical subtotals (status, status+priority, grand
    total) in one pass."""
    (orders,) = _t(spark, sf_dir, "orders")
    return orders.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum(dec("o_totalprice")).alias("revenue"),
    )


@query(
    "lineitem_cube",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l_quantity AS {DEC_SQL})) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def lineitem_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-5 cube: all grouping-set combinations."""
    (li,) = _t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_items"),
        dsum(dec("l_quantity")).alias("sum_qty"),
    )


@query(
    "distinct_order_months",
    oracle="""
    SELECT DISTINCT CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month, o_orderstatus
    FROM orders
    """,
)
def distinct_order_months(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-4 distinct (compiles to a hash aggregate, map-side partials)."""
    (orders,) = _t(spark, sf_dir, "orders")
    return orders.select(
        F.to_date(F.date_trunc("month", "o_orderdate")).alias("order_month"), "o_orderstatus"
    ).distinct()


@query(
    "supplier_part_counts",
    oracle="""
    SELECT l_suppkey,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(*) AS n_items
    FROM lineitem
    GROUP BY l_suppkey
    """,
)
def supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-4 exact count-distinct per group (expand + two-phase agg)."""
    (li,) = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_suppkey").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.count(F.lit(1)).alias("n_items"),
    )


@query(
    "approx_distinct_parts",
    oracle="""
    SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           TRUE AS within_bound
    FROM lineitem
    """,
)
def approx_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-4 approx_count_distinct (HyperLogLog++). At 100 TB this replaces
    exact count-distinct where ±2% error is acceptable — no expand, no
    per-key state explosion.

    SELF-CERTIFYING oracle row: the HLL estimate itself is
    engine-specific, so the frame carries the EXACT count (hash-compared
    against DuckDB) plus ``within_bound`` — the sketch's relative error
    asserted ≤ 4× its configured 2% rsd in-query. A broken sketch flips
    the boolean and the driver row goes red; a healthy one hash-matches
    the oracle's TRUE."""
    (li,) = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.countDistinct("l_partkey").alias("exact_parts"),
        (
            F.abs(
                F.approx_count_distinct("l_partkey", 0.02).cast("double")
                - F.countDistinct("l_partkey").cast("double")
            )
            <= F.lit(4 * 0.02) * F.countDistinct("l_partkey").cast("double")
        ).alias("within_bound"),
    )


@query(
    "status_custkeys_intersect",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def status_custkeys_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-7 INTERSECT (distinct semantics on both engines)."""
    (orders,) = _t(spark, sf_dir, "orders")
    o = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    f = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return o.intersect(f)


@query(
    "status_custkeys_except",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def status_custkeys_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-7 EXCEPT (distinct semantics)."""
    (orders,) = _t(spark, sf_dir, "orders")
    p = orders.filter(F.col("o_orderstatus") == "P").select("o_custkey")
    f = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return p.subtract(f)


@query(
    "part_string_funcs",
    oracle="""
    SELECT upper(substr(p_type, 1, 3)) AS type_prefix,
           regexp_extract(p_brand, '[0-9]+', 0) AS brand_num,
           COUNT(*) AS n_parts,
           CAST(MIN(length(p_name)) AS BIGINT) AS min_name_len,
           CAST(MAX(length(p_name)) AS BIGINT) AS max_name_len
    FROM part
    GROUP BY 1, 2
    """,
)
def part_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-8 string library: substring/upper/regexp_extract/length — all
    JVM-side, codegen'd, no UDFs."""
    (part,) = _t(spark, sf_dir, "part")
    return (
        part.select(
            F.upper(F.substring("p_type", 1, 3)).alias("type_prefix"),
            F.regexp_extract("p_brand", "[0-9]+", 0).alias("brand_num"),
            F.length("p_name").alias("name_len"),
        )
        .groupBy("type_prefix", "brand_num")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.min("name_len").cast("long").alias("min_name_len"),
            F.max("name_len").cast("long").alias("max_name_len"),
        )
    )


@query(
    "orders_date_funcs",
    oracle="""
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS order_year,
           CAST(EXTRACT(quarter FROM o_orderdate) AS INT) AS order_quarter,
           COUNT(*) AS n_orders,
           CAST(MIN(datediff('day', DATE '1995-01-01', o_orderdate)) AS BIGINT) AS min_days_since_epoch,
           MIN(CAST(o_orderdate + INTERVAL 30 DAY AS DATE)) AS earliest_due
    FROM orders
    GROUP BY 1, 2
    """,
)
def orders_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-8 date/time library: extract, datediff, date arithmetic."""
    (orders,) = _t(spark, sf_dir, "orders")
    return (
        orders.select(
            F.year("o_orderdate").alias("order_year"),
            F.quarter("o_orderdate").alias("order_quarter"),
            F.datediff(F.col("o_orderdate"), F.lit("1995-01-01")).alias("days_since"),
            F.date_add(F.col("o_orderdate"), 30).alias("due"),
        )
        .groupBy("order_year", "order_quarter")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("days_since").cast("long").alias("min_days_since_epoch"),
            F.min("due").alias("earliest_due"),
        )
    )


@query(
    "events_json_extract",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           COUNT(*) AS n_events
    FROM events
    GROUP BY event_type
    """,
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-8 JSON: get_json_object over the events.props JSON string column.
    At scale prefer from_json with an explicit schema (single parse,
    pushdown-friendly); get_json_object shown as the ad-hoc path."""
    (events,) = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return events.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"), F.count(F.lit(1)).alias("n_events")
    )


@query(
    "priority_status_pivot",
    oracle="""
    SELECT o_orderpriority,
           CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 END), 0) AS BIGINT) AS "F",
           CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 END), 0) AS BIGINT) AS "O",
           CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 END), 0) AS BIGINT) AS "P"
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def priority_status_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-25 pivot (long→wide) with explicit pivot values — skipping the
    distinct-values discovery job, which also fixes column order."""
    (orders,) = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
    )


@query(
    "top_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 10
    """,
)
def top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-21/X-9 top-K: compiles to TakeOrderedAndProject (per-partition
    heap + merge, no global sort). Tiebreak on orderkey for determinism."""
    (orders,) = _t(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Text analysis (X-14) over documents.
# ---------------------------------------------------------------------------


@query(
    "doc_token_stats",
    oracle="""
    SELECT doc_id,
           CAST(length(string_split_regex(trim(text), '\\s+')) AS INT) AS n_tokens,
           CAST(length(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS INT) AS n_bpe_tokens,
           md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
    FROM documents
    """,
)
def doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-14: whitespace + BPE-ish token counts and the normalized-text md5
    fingerprint. Narrow projection — fully codegen'd, no shuffle."""
    from etl_demo_spark.text import bpe_ish_token_count, fingerprint, token_count

    (docs,) = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        token_count("text").alias("n_tokens"),
        bpe_ish_token_count("text").alias("n_bpe_tokens"),
        fingerprint("text").alias("fp"),
    )


@query(
    "doc_quality",
    oracle="""
    WITH f AS (
      SELECT doc_id,
             CAST(length(text) AS BIGINT) AS n_chars,
             CAST(length(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
             CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS BIGINT) AS n_punct,
             CAST(length(list_filter(string_split_regex(trim(text), '\\s+'),
                  t -> t IN ('the','a','an','and','or','of','to','in','is','it'))) AS BIGINT) AS n_stopwords
      FROM documents
    )
    SELECT doc_id, n_chars, n_tokens, n_punct, n_stopwords,
           0.5 * least((CAST(n_stopwords AS DOUBLE) / CAST(n_tokens AS DOUBLE)) * 2, 1.0)
         + 0.3 * least((CAST(n_chars AS DOUBLE) / CAST(n_tokens AS DOUBLE)) / 10, 1.0)
         - 0.2 * (CAST(n_punct AS DOUBLE) / CAST(n_chars AS DOUBLE)) AS quality_score
    FROM f
    """,
)
def doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-14 quality scoring: length/punctuation/stopword ratios combined in
    a fixed-order arithmetic expression (bit-deterministic across engines)."""
    from etl_demo_spark.text import quality_features

    (docs,) = _t(spark, sf_dir, "documents")
    return quality_features(docs).select(
        "doc_id", "n_chars", "n_tokens", "n_punct", "n_stopwords", "quality_score"
    )


@query(
    "lang_source_profile",
    oracle="""
    SELECT lang, source, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars
    FROM documents
    GROUP BY lang, source
    """,
)
def lang_source_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus profiling rollup by language × source (integer sums — exact)."""
    (docs,) = _t(spark, sf_dir, "documents")
    return docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        (F.sum("n_chars").cast("double") / F.count(F.lit(1))).alias("avg_chars"),
    )


@query(
    "lang_id_heuristic",
    oracle="""
    WITH scored AS (
      SELECT doc_id,
             (text IS NULL OR text = '') AS empty,
             length(regexp_replace(substr(text, 1, 200), '[^一-鿿]', '', 'g'))
               AS cjk,
             length(substr(text, 1, 200)) AS headlen,
             list_distinct(string_split_regex(lower(text), '\\s+')) AS toks
      FROM documents
    ),
    hits AS (
      SELECT doc_id, empty, cjk, headlen,
        len(list_intersect(toks, ['der','die','das','und','ist','nicht','mit'])) AS h_de,
        len(list_intersect(toks, ['the','and','of','to','is','with','that'])) AS h_en,
        len(list_intersect(toks, ['el','la','los','que','es','y','por'])) AS h_es,
        len(list_intersect(toks, ['le','la','les','et','est','que','pour'])) AS h_fr
      FROM scored
    ),
    pred AS (
      SELECT CASE
        WHEN empty THEN 'und'
        WHEN cjk > 0.2 * headlen THEN 'zh'
        WHEN greatest(h_de, h_en, h_es, h_fr) = 0 THEN 'und'
        WHEN h_de = greatest(h_de, h_en, h_es, h_fr) THEN 'de'
        WHEN h_en = greatest(h_de, h_en, h_es, h_fr) THEN 'en'
        WHEN h_es = greatest(h_de, h_en, h_es, h_fr) THEN 'es'
        ELSE 'fr'
      END AS lang_pred
      FROM hits
    )
    SELECT lang_pred, COUNT(*) AS n_docs FROM pred GROUP BY lang_pred
    """,
)
def lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-11/X-14: Arrow-batched pandas_udf language-ID; distribution of
    predictions. The heuristic (CJK-codepoint screen → stopword-marker
    voting, earliest-sorted-language ties) is deterministic and fully
    arithmetic, so the oracle re-derives every prediction in SQL —
    marker-set intersections + a GREATEST argmax in the same sorted
    order, making the Python stage's output exactly checkable. Accuracy
    on known-language fixtures stays unit-tested; a real pipeline swaps
    fastText in and returns to rows-only, the plumbing unchanged."""
    from etl_demo_spark.text import lang_id

    (docs,) = _t(spark, sf_dir, "documents")
    return (
        docs.select(lang_id(F.col("text")).alias("lang_pred"))
        .groupBy("lang_pred")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


# ---------------------------------------------------------------------------
# Dedup (X-12) over documents.
# ---------------------------------------------------------------------------


@query(
    "exact_dedup_fingerprint",
    oracle="""
    SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp,
           CAST(MIN(doc_id) AS BIGINT) AS keeper_id,
           COUNT(*) AS n_copies
    FROM documents
    GROUP BY 1
    """,
)
def exact_dedup_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-12 exact dedup on normalized-text fingerprint: shuffles 16-byte
    keys, not documents; deterministic keeper = min(doc_id)."""
    from etl_demo_spark.dedup import exact_dedup_by_fingerprint

    (docs,) = _t(spark, sf_dir, "documents")
    return exact_dedup_by_fingerprint(docs)


@query("minhash_near_dup")  # LSH candidates: no exact SQL oracle (rows-only)
def minhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-12 MinHash+LSH near-dup candidates with exact-Jaccard verification
    on candidates only (never all-pairs). Signatures are the narrow per-row
    fold (zero shuffles); verification re-derives shingle sets for candidate
    docs from the pruned columnar scan — measured ~2× faster end-to-end than
    the hash-agg variant that shuffles shingle-hash sets alongside the
    signatures (``minhash_near_dup_pairs``; scans are cheap, shuffles are
    not). Verified against a brute-force oracle on planted near-dups in
    unit tests."""
    from etl_demo_spark.dedup import jaccard_verify, minhash_lsh_candidates

    (docs,) = _t(spark, sf_dir, "documents")
    cands = minhash_lsh_candidates(docs, num_hashes=32, bands=8)
    return jaccard_verify(cands, docs, threshold=0.5)


# MinHash/LSH constants for the EXACT-oracled variant: small-odd
# multipliers + offsets mod the Mersenne-31 prime keep every product
# under 2^60 (md5-prefix hashes are 48-bit), so neither engine wraps —
# wrapping is where Spark (silent) and DuckDB (error) diverge.
_MH_EXACT_A = [1 + 2 * ((j * 2654435761) % 2048) for j in range(16)]
_MH_EXACT_B = [(j * 1779033703 + 12582917) % 2147483647 for j in range(16)]
_MH_SIG_SQL = ",\n             ".join(
    f"list_min(list_transform(h, x -> ({_MH_EXACT_A[j]} * x + {_MH_EXACT_B[j]})"
    f" % 2147483647)) AS s{j}"
    for j in range(16)
)


@query(
    "minhash_lsh_exact_pairs",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
    ),
    sh AS (
      SELECT doc_id,
             list_distinct(list_transform(generate_series(1, len(t) - 2),
                                          i -> array_to_string(t[i:i+2], ' '))) AS shingles
      FROM toks WHERE len(t) >= 3
    ),
    hs AS (
      SELECT doc_id,
             list_transform(shingles,
                            s -> CAST(('0x' || substr(md5(s), 1, 12)) AS BIGINT)) AS h
      FROM sh
    ),
    sig AS (
      SELECT doc_id, {_MH_SIG_SQL}
      FROM hs
    ),
    sigv AS (
      SELECT doc_id,
             [s0,s1,s2,s3,s4,s5,s6,s7,s8,s9,s10,s11,s12,s13,s14,s15] AS sig
      FROM sig
    ),
    banded AS (
      SELECT doc_id, sig, b, array_to_string(sig[4*b+1:4*b+4], ',') AS bkey
      FROM sigv, LATERAL unnest(generate_series(0, 3)) AS t(b)
    ),
    pairs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                      a.sig AS sig_a, b.sig AS sig_b
      FROM banded a
      JOIN banded b ON a.b = b.b AND a.bkey = b.bkey AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b,
           CAST(len(list_filter(generate_series(1, 16),
                                i -> sig_a[i] = sig_b[i])) AS INT) AS n_sig_match
    FROM pairs
    """,
)
def minhash_lsh_exact_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-12 MinHash+LSH with an EXACT cross-engine oracle — the full
    banding pipeline (word 3-shingles → shingle hash → 16-permutation
    signature → 4 bands → bucket self-join → candidate pairs with
    signature agreement counts) in arithmetic both engines reproduce
    bit-for-bit: md5-hex-prefix shingle hashes (48-bit, parsed the same
    way on both sides) and affine permutations mod the Mersenne-31 prime
    with multipliers small enough that nothing wraps.

    This is the oracle-grade twin of `minhash_near_dup` (which keeps
    xxhash64 — ~3× cheaper per shingle — and therefore stays rows-only):
    same algebra, same banding topology, same candidate semantics, so a
    hash match here certifies the LSH machinery the fast variant runs.

    Plan shape: narrow signature projection (md5 + 16 array_min folds,
    zero shuffles), explode to 4 band rows/doc, one exchange for the
    band-bucket self-join, distinct on pairs. Never all-pairs — the
    bucket join is the 100 TB shape."""
    (docs,) = _t(spark, sf_dir, "documents")

    toks = docs.select(
        "doc_id", F.split(F.trim("text"), r"\s+").alias("t")
    ).filter(F.size("t") >= 3)
    sh = toks.select(
        "doc_id",
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size("t") - 2),
                lambda i: F.concat_ws(" ", F.slice("t", i, 3)),
            )
        ).alias("shingles"),
    )
    hs = sh.select(
        "doc_id",
        F.transform(
            "shingles",
            lambda s: F.conv(F.substring(F.md5(s), 1, 12), 16, 10).cast("long"),
        ).alias("h"),
    )
    def perm(j: int):
        # closure, not a default arg: pyspark reads lambda arity, so a
        # second parameter would receive a Column (same note as
        # dedup.minhash_signature's mix())
        return lambda x: (
            F.lit(_MH_EXACT_A[j]) * x + F.lit(_MH_EXACT_B[j])
        ) % F.lit(2147483647)

    sig = hs.select(
        "doc_id",
        F.array(
            *[F.array_min(F.transform("h", perm(j))) for j in range(16)]
        ).alias("sig"),
    )
    banded = sig.select(
        "doc_id",
        "sig",
        F.posexplode(
            F.array(
                *[
                    F.concat_ws(",", F.slice("sig", 4 * b + 1, 4))
                    for b in range(4)
                ]
            )
        ).alias("b", "bkey"),
    )
    a, bb = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            bb,
            (F.col("a.b") == F.col("b.b"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .distinct()
    )
    return pairs.select(
        "doc_a",
        "doc_b",
        F.size(
            F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda t: t)
        )
        .cast("int")
        .alias("n_sig_match"),
    )


@query("simhash_profile")  # bit-level hash fold: no SQL oracle (rows-only)
def simhash_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-12 SimHash: 64-bit signature per doc via a pure aggregate fold
    (no UDF, no shuffle); profiled by leading byte. No SQL oracle — the
    bit-fold hash family is engine-specific; signature correctness is
    asserted in unit tests (hamming ordering on planted near-dups,
    explode-agg table == per-row fold)."""
    from etl_demo_spark.dedup import simhash_table

    (docs,) = _t(spark, sf_dir, "documents")
    sim = simhash_table(docs)
    return (
        sim.groupBy((F.col("simhash").bitwiseAND(F.lit(255))).alias("lead_byte"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


@query(
    "minhash_near_dup_certified",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
      FROM documents WHERE doc_id < 500
    ),
    sh AS (
      SELECT doc_id,
             list_distinct(list_transform(generate_series(1, len(t) - 2),
                                          i -> array_to_string(t[i:i+2], ' '))) AS s
      FROM toks WHERE len(t) >= 3
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_exact_pairs,
           TRUE AS subset_ok,
           TRUE AS recall_floor_ok
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
          / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.85
    """,
)
def minhash_near_dup_certified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELF-CERTIFICATION row for the xxhash64 MinHash+LSH instance that
    `minhash_near_dup` runs (which stays rows-only: DuckDB cannot replay
    xxhash64). The same LSH config (32 hashes, 8 bands) is run against
    the provably-complete prefix-filtered EXACT Jaccard join on the same
    word-3-shingle sets, and the frame carries:

    * ``n_exact_pairs`` — the exact θ=0.85 pair count, hash-compared
      against DuckDB's brute-force all-pairs join (doc_id < 500 keeps
      the oracle's quadratic check constant across sfs);
    * ``subset_ok`` — every LSH-found verified pair is in the exact set
      (exactness of the verify stage);
    * ``recall_floor_ok`` — LSH catches ≥80% of exact pairs (analytic
      catch probability at J=0.85 with 8 bands of 4 is 0.997, so the
      floor certifies the banding with overwhelming margin without
      betting a driver row on the 3e-4 per-pair tail).

    A broken signature fold, band topology, or verify stage flips a
    boolean and the driver row goes red."""
    from etl_demo_spark.dedup import (
        jaccard_verify,
        minhash_lsh_candidates,
        prefix_filter_jaccard_join,
        shingles_from_tokens,
    )
    from etl_demo_spark.text import tokens

    (docs,) = _t(spark, sf_dir, "documents")
    sub = docs.filter(F.col("doc_id") < 500)
    sets = (
        sub.select(F.col("doc_id").alias("id"), tokens("text").alias("__t"))
        .filter(F.size("__t") >= 3)
        .select("id", shingles_from_tokens("__t", 3).alias("shingles"))
    )
    exact = prefix_filter_jaccard_join(sets, 0.85).select("id_a", "id_b").persist()
    cands = minhash_lsh_candidates(sub, num_hashes=32, bands=8)
    found = (
        jaccard_verify(cands, sub, threshold=0.85).select("id_a", "id_b").persist()
    )
    try:
        n_exact = exact.count()
        stray = found.join(exact, ["id_a", "id_b"], "left_anti").count()
        caught = found.join(exact, ["id_a", "id_b"], "semi").count()
    finally:
        exact.unpersist()
        found.unpersist()
    subset_ok = stray == 0
    recall_ok = n_exact < 5 or caught >= 0.8 * n_exact
    assert subset_ok, f"verify stage emitted {stray} pairs outside the exact set"
    assert recall_ok, f"LSH recall collapsed: {caught}/{n_exact} exact pairs found"
    return spark.createDataFrame(
        [(n_exact, subset_ok, recall_ok)],
        "n_exact_pairs BIGINT, subset_ok BOOLEAN, recall_floor_ok BOOLEAN",
    )


@query(
    "simhash_certified",
    oracle="""
    WITH dup AS (
      SELECT CAST(COALESCE(SUM(c * (c - 1) // 2), 0) AS BIGINT)
               AS n_dup_text_pairs
      FROM (SELECT COUNT(*) AS c FROM documents GROUP BY text)
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM documents) AS n_docs,
           n_dup_text_pairs,
           TRUE AS sig_equal_on_dup_text,
           TRUE AS low_sim_hamming_ok
    FROM dup
    """,
)
def simhash_certified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELF-CERTIFICATION row for the xxhash64 SimHash instance that
    `simhash_profile` runs (rows-only: the bit-fold family is
    engine-specific). Two semantic invariants of a correct SimHash are
    asserted in-frame alongside exact counts DuckDB reproduces:

    * ``sig_equal_on_dup_text`` — identical texts hash to identical
      signatures (determinism of the tf-weighted bit vote);
    * ``low_sim_hamming_ok`` — across the deterministic pairing of
      doc i with doc i+250 (unrelated texts), mean 64-bit Hamming
      distance ≥ 8. Unrelated docs from a SHARED vocabulary land well
      below the 32-bit independence expectation (the common tokens
      dominate the tf vote; measured ~14 on the driver corpus), but a
      degenerate fold — all-zero signatures, stuck bits — drops the
      mean toward 0 and fails loudly. Near-dup sensitivity is covered
      by `simhash_exact_pairs`' bit-exact oracle."""
    from etl_demo_spark.dedup import simhash_table

    (docs,) = _t(spark, sf_dir, "documents")
    sim = simhash_table(docs)  # (id, simhash)
    joined = docs.select(F.col("doc_id").alias("id"), "text").join(sim, "id")
    grp = joined.groupBy("text").agg(
        F.count(F.lit(1)).alias("c"),
        F.countDistinct("simhash").alias("ns"),
    )
    row = grp.agg(
        F.sum(F.expr("c * (c - 1) div 2")).alias("n_dup_text_pairs"),
        F.max(F.when(F.col("c") > 1, F.col("ns")).otherwise(F.lit(1))).alias(
            "max_ns"
        ),
        F.count(F.lit(1)).alias("n_distinct_texts"),
    ).first()
    n_docs = docs.count()
    sig_equal = int(row["max_ns"] or 1) == 1

    a, b = sim.alias("a"), sim.alias("b")
    ham = (
        a.filter(F.col("a.id") < 250)
        .join(b, F.col("b.id") == F.col("a.id") + 250)
        .select(
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("h")
        )
        .agg(F.avg("h").alias("mean_h"), F.count(F.lit(1)).alias("n_pairs"))
        .first()
    )
    low_sim_ok = ham["n_pairs"] == 0 or float(ham["mean_h"]) >= 8.0
    assert sig_equal, "identical texts produced different simhash signatures"
    assert low_sim_ok, f"mean hamming {ham['mean_h']} over unrelated pairs"
    return spark.createDataFrame(
        [(n_docs, int(row["n_dup_text_pairs"] or 0), sig_equal, low_sim_ok)],
        "n_docs BIGINT, n_dup_text_pairs BIGINT, "
        "sig_equal_on_dup_text BOOLEAN, low_sim_hamming_ok BOOLEAN",
    )


# simhash_exact_pairs: 48-bit md5-based SimHash both engines reproduce
# bit-for-bit (same md5-hex-prefix parse as minhash_lsh_exact_pairs).
_SH_BITS = 48
_SH_BAND_BITS = 12
_SH_SUM_SQL = ",\n             ".join(
    f"SUM(tf * ((h >> {b}) & 1)) AS s{b}" for b in range(_SH_BITS)
)
_SH_FOLD_SQL = "\n               + ".join(
    f"(CASE WHEN 2 * s{b} > n THEN {1 << b} ELSE 0 END)" for b in range(_SH_BITS)
)


@query(
    "simhash_exact_pairs",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
    ),
    tf AS (
      SELECT doc_id, tok, COUNT(*) AS tf
      FROM (SELECT doc_id, unnest(t) AS tok FROM toks)
      GROUP BY doc_id, tok
    ),
    hashed AS (
      SELECT doc_id, CAST(('0x' || substr(md5(tok), 1, 12)) AS BIGINT) AS h, tf
      FROM tf
    ),
    sums AS (
      SELECT doc_id, SUM(tf) AS n,
             {_SH_SUM_SQL}
      FROM hashed GROUP BY doc_id
    ),
    sh AS (
      SELECT doc_id, CAST({_SH_FOLD_SQL} AS BIGINT) AS simhash FROM sums
    ),
    banded AS (
      SELECT doc_id, simhash, b, (simhash >> ({_SH_BAND_BITS} * b)) & 4095 AS bkey
      FROM sh, LATERAL unnest(generate_series(0, 3)) AS u(b)
    ),
    pairs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                      a.simhash AS sa, b.simhash AS sb
      FROM banded a JOIN banded b
        ON a.b = b.b AND a.bkey = b.bkey AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b, CAST(bit_count(xor(sa, sb)) AS INT) AS hamming
    FROM pairs
    WHERE bit_count(xor(sa, sb)) <= 4
    """,
)
def simhash_exact_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-12 SimHash near-dup pipeline with an EXACT cross-engine oracle —
    the oracle-grade twin of `simhash_profile` the way
    `minhash_lsh_exact_pairs` certifies `minhash_near_dup`: token
    tf-weighted 48-bit SimHash from md5-hex-prefix hashes (parsed
    identically on both engines), strict-majority bit vote (ties → 0),
    4 × 12-bit band bucketing, bucket self-join, exact Hamming verify at
    ≤ 4 bits. The fast variant keeps xxhash64 (engine-specific, so it
    stays rows-only); a hash match here certifies the same
    signature/band/verify machinery.

    Plan shape: one (doc, token) partial-agg shuffle collapses repeats
    map-side, ONE per-doc aggregation computes all 48 bit sums + the
    token total in a single pass (no per-bit scan), explode to 4 band
    rows/doc, one exchange for the band-bucket self-join, Hamming verify
    on the joined signatures. Candidate volume is bounded by band-bucket
    co-residency — never all-pairs — and the verify prunes random 12-bit
    collisions to the semantic near-dup set, exactly the shape this runs
    at 100 TB."""
    (docs,) = _t(spark, sf_dir, "documents")
    tf = (
        docs.select(
            "doc_id", F.explode(F.split(F.trim("text"), r"\s+")).alias("tok")
        )
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    hashed = tf.select(
        "doc_id",
        F.conv(F.substring(F.md5("tok"), 1, 12), 16, 10).cast("long").alias("h"),
        "tf",
    )
    sums = hashed.groupBy("doc_id").agg(
        F.sum("tf").alias("n"),
        *[
            F.sum(F.col("tf") * F.shiftright("h", b).bitwiseAND(F.lit(1))).alias(
                f"s{b}"
            )
            for b in range(_SH_BITS)
        ],
    )
    fold = F.lit(0).cast("long")
    for b in range(_SH_BITS):
        fold = fold + F.when(
            F.col(f"s{b}") * 2 > F.col("n"), F.lit(1 << b)
        ).otherwise(F.lit(0))
    sh = sums.select("doc_id", fold.cast("long").alias("simhash"))
    banded = sh.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright("simhash", _SH_BAND_BITS * k).bitwiseAND(
                        F.lit(4095)
                    )
                    for k in range(4)
                ]
            )
        ).alias("b", "bkey"),
    )
    a, bb = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            bb,
            (F.col("a.b") == F.col("b.b"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sa"),
            F.col("b.simhash").alias("sb"),
        )
        .distinct()
    )
    return (
        pairs.select(
            "doc_a",
            "doc_b",
            F.bit_count(F.col("sa").bitwiseXOR(F.col("sb")))
            .cast("int")
            .alias("hamming"),
        )
        .filter(F.col("hamming") <= 4)
    )


# ---------------------------------------------------------------------------
# Vector similarity (X-13) over embeddings.
# ---------------------------------------------------------------------------


def _query_vec(spark: SparkSession, sf_dir: str) -> list[float]:
    (emb,) = _t(spark, sf_dir, "embeddings")
    row = emb.filter(F.col("vec_id") == 0).select("embedding").first()
    return [float(v) for v in row[0]]


@query(
    "ann_topk_bruteforce",
    oracle="""
    WITH q AS (
      SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0
    )
    SELECT vec_id,
           ROUND(list_dot_product(CAST(embedding AS DOUBLE[]), qv)
                 / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])))
                    * sqrt(list_dot_product(qv, qv))), 6) AS cos_sim
    FROM embeddings, q
    ORDER BY cos_sim DESC, vec_id ASC
    LIMIT 10
    """,
)
def ann_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-13 exact cosine top-k (the correctness baseline / re-rank stage):
    zip_with+aggregate dot products, TakeOrderedAndProject top-k."""
    from etl_demo_spark.vec import brute_force_topk

    (emb,) = _t(spark, sf_dir, "embeddings")
    return brute_force_topk(emb, _query_vec(spark, sf_dir), k=10)


@query(
    "ann_topk_lsh",
    oracle="""
    WITH dims AS (
      SELECT vec_id, i AS d,
             CAST(round(CAST(embedding[i + 1] AS DOUBLE) * 1000) AS BIGINT) AS qx
      FROM embeddings, LATERAL unnest(generate_series(0, 63)) AS u(i)
    ),
    planes AS (
      SELECT p, i,
             CASE WHEN (CAST(('0x' || substr(md5(CAST(p AS VARCHAR) || ':'
                                                 || CAST(i AS VARCHAR)), 1, 12))
                             AS BIGINT) & 1) = 1
                  THEN 1 ELSE -1 END AS s
      FROM generate_series(0, 5) AS gp(p), generate_series(0, 63) AS gi(i)
    ),
    proj AS (
      SELECT v.vec_id, pl.p, SUM(v.qx * pl.s) AS proj
      FROM dims v JOIN planes pl ON pl.i = v.d
      GROUP BY v.vec_id, pl.p
    ),
    buckets AS (
      SELECT vec_id,
             CAST(SUM(CASE WHEN proj > 0 THEN 1 << p ELSE 0 END) AS BIGINT) AS bucket
      FROM proj GROUP BY vec_id
    ),
    qb AS (SELECT bucket AS qbucket FROM buckets WHERE vec_id = 0),
    cand AS (
      SELECT b.vec_id FROM buckets b, qb
      WHERE bit_count(xor(b.bucket, qbucket)) <= 2
    ),
    q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0)
    SELECT e.vec_id,
           ROUND(list_dot_product(CAST(e.embedding AS DOUBLE[]), qv)
                 / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                          CAST(e.embedding AS DOUBLE[])))
                    * sqrt(list_dot_product(qv, qv))), 6) AS cos_sim
    FROM embeddings e JOIN cand c ON e.vec_id = c.vec_id, q
    ORDER BY cos_sim DESC, e.vec_id ASC
    LIMIT 10
    """,
)
def ann_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-13 scale path with an EXACT cross-engine oracle: sign-LSH
    bucketing restricts the exact re-rank to the query's Hamming-≤2
    bucket neighborhood (multi-probe radius 2: 22/64 buckets ≈ 1/3 of a
    full scan — the accuracy/cost dial documented on the operator).

    Exactly oracled via `vec.lsh_topk_exact`: md5-derived ±1 planes (the
    hash both engines share — the SQL derives the same constants
    in-database), integer projections on round(x·1000) quantized vectors
    (a sign can't flip in the last ulp), Hamming-≤2 probe set, exact
    round-6 cosine re-rank — the DuckDB replay reproduces bucket ids,
    candidate set, and ranking bit-for-bit, certifying the same
    bucket/probe machinery the xxhash64 fast variant (`vec.lsh_topk`,
    recall-tested + bench-reported) runs. The probe-mask broadcast join
    is the 100 TB shape: against a bucket-partitioned layout the
    non-probed buckets prune at file level."""
    from etl_demo_spark.vec import lsh_topk_exact

    (emb,) = _t(spark, sf_dir, "embeddings")
    return lsh_topk_exact(
        emb, _query_vec(spark, sf_dir), k=10, planes=6, probe_radius=2
    )


@query(
    "ann_topk_ivf",
    oracle="""
    WITH dims AS (
      SELECT vec_id, i AS d,
             CAST(round(CAST(embedding[i + 1] AS DOUBLE) * 1000) AS BIGINT) AS qx
      FROM embeddings, LATERAL unnest(generate_series(0, 63)) AS u(i)
    ),
    seeds AS (
      SELECT seed_id, c FROM (
        SELECT vec_id AS seed_id,
               ROW_NUMBER() OVER (
                 ORDER BY CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 12))
                               AS BIGINT) ASC, vec_id ASC
               ) - 1 AS c
        FROM embeddings
      ) WHERE c < 16
    ),
    cents AS (
      SELECT s.c, d.d, d.qx AS cx
      FROM seeds s JOIN dims d ON d.vec_id = s.seed_id
    ),
    dist AS (
      SELECT v.vec_id, ct.c, SUM((v.qx - ct.cx) * (v.qx - ct.cx)) AS d2
      FROM dims v JOIN cents ct ON ct.d = v.d
      GROUP BY v.vec_id, ct.c
    ),
    assign AS (
      SELECT vec_id, c AS cell FROM (
        SELECT vec_id, c,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, c) AS rn
        FROM dist
      ) WHERE rn = 1
    ),
    probes AS (
      SELECT c AS cell FROM (
        SELECT c, ROW_NUMBER() OVER (ORDER BY d2, c) AS rn
        FROM dist WHERE vec_id = 0
      ) WHERE rn <= 4
    ),
    q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0)
    SELECT e.vec_id,
           ROUND(list_dot_product(CAST(e.embedding AS DOUBLE[]), qv)
                 / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                          CAST(e.embedding AS DOUBLE[])))
                    * sqrt(list_dot_product(qv, qv))), 6) AS cos_sim
    FROM embeddings e
    JOIN assign a ON a.vec_id = e.vec_id
    JOIN probes p ON p.cell = a.cell, q
    ORDER BY cos_sim DESC, e.vec_id ASC
    LIMIT 10
    """,
)
def ann_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-13 IVF scale path with an EXACT cross-engine oracle:
    deterministic coarse quantizer, scan only the nprobe best cells,
    exact cosine re-rank within them — ~nprobe/n_cells of the
    brute-force scan; with a cell-partitioned layout the skipped cells
    prune at file level.

    Exactly oracled via `vec.ivf_topk_exact`: md5-hex-prefix seed
    selection, int64 squared-L2 cell assignment on round(x·1000)
    quantized vectors with ties to the smallest cell (the
    `kmeans_fit_exact` contract), integer probe ranking, round-6 cosine
    re-rank — the DuckDB replay reproduces codebook, assignment, probes,
    and ranking bit-for-bit, certifying the same machinery the xxhash64
    fast variant (`vec.ivf_topk`, recall-tested + bench-reported) runs.

    DEMO SHAPE, deliberately: assignment re-runs over the corpus per
    query so the whole operator is one self-contained plan. The
    production serve path is `pipelines/embedding_index.py` — assign
    ONCE, write `partitionBy("cell")` with the codebook as a sidecar,
    and each query's probes become partition pruning against the
    prebuilt index (build once, probe many)."""
    from etl_demo_spark.vec import ivf_topk_exact

    (emb,) = _t(spark, sf_dir, "embeddings")
    return ivf_topk_exact(emb, _query_vec(spark, sf_dir), k=10, n_cells=16, nprobe=4)


@query(
    "ann_topk_int8",
    oracle="""
    WITH dims AS (
      SELECT vec_id, i AS d, CAST(embedding[i] AS DOUBLE) AS x
      FROM embeddings, LATERAL unnest(generate_series(1, len(embedding))) AS u(i)
    ),
    scale AS (SELECT MAX(abs(x)) AS s FROM dims),
    coded AS (
      SELECT vec_id, d, CAST(floor((x * 127.0) / s) AS BIGINT) AS code
      FROM dims, scale
    ),
    qcodes AS (SELECT d, code AS qcode FROM coded WHERE vec_id = 0)
    SELECT c.vec_id, CAST(SUM(c.code * q.qcode) AS BIGINT) AS qdot
    FROM coded c JOIN qcodes q ON c.d = q.d
    GROUP BY c.vec_id
    ORDER BY qdot DESC, vec_id ASC
    LIMIT 10
    """,
)
def ann_topk_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-13 int8 scalar quantization (FAISS SQ8 family) with an EXACT
    oracle — unlike the LSH/IVF probes, quantized ranking is
    deterministic: symmetric global scale, floor(x·127/s) codes, integer
    code dot product. Exact because the code computation is
    order-matched IEEE double arithmetic and everything after it is
    integer — no rounding shims. The 4×-smaller integer codes are the
    memory leg of the ANN stack (vec.int8_topk docstring has the plan
    shape: narrow array transform, two 1-row broadcasts, zero shuffles
    before TakeOrdered); measured 10/10 overlap with exact cosine top-10
    here, recall asserted in unit tests."""
    from etl_demo_spark.vec import int8_topk

    (emb,) = _t(spark, sf_dir, "embeddings")
    return int8_topk(emb, k=10, query_id=0)


@query(
    "ann_topk_sq8_rerank",
    oracle="""
    WITH dims AS (
      SELECT vec_id, i AS d, CAST(embedding[i] AS DOUBLE) AS x
      FROM embeddings, LATERAL unnest(generate_series(1, len(embedding))) AS u(i)
    ),
    scale AS (SELECT MAX(abs(x)) AS s FROM dims),
    coded AS (
      SELECT vec_id, d, CAST(floor((x * 127.0) / s) AS BIGINT) AS code
      FROM dims, scale
    ),
    qcodes AS (SELECT d, code AS qcode FROM coded WHERE vec_id = 0),
    shortlist AS (
      SELECT c.vec_id, CAST(SUM(c.code * q.qcode) AS BIGINT) AS qdot
      FROM coded c JOIN qcodes q ON c.d = q.d
      GROUP BY c.vec_id
      ORDER BY qdot DESC, vec_id ASC
      LIMIT 64
    ),
    q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0)
    SELECT e.vec_id,
           ROUND(list_dot_product(CAST(e.embedding AS DOUBLE[]), qv)
                 / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                          CAST(e.embedding AS DOUBLE[])))
                    * sqrt(list_dot_product(qv, qv))), 6) AS cos_sim
    FROM embeddings e JOIN shortlist s ON e.vec_id = s.vec_id, q
    ORDER BY cos_sim DESC, e.vec_id ASC
    LIMIT 10
    """,
)
def ann_topk_sq8_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-13 HYBRID two-tier ANN (`vec.int8_rerank_topk`, round 10): an
    SQ8 integer-code scan of the WHOLE corpus shortlists the top-64
    candidates (4x smaller bytes than the float scan, deterministic
    integer ranking), then exact float cosine re-ranks only the
    shortlist. This is the recall-floor lift the fixed-probe tiers
    cannot give on an isotropic corpus: LSH/IVF lose whole neighbors to
    unprobed buckets at any fixed budget (probe-curve floor 0.55-0.64
    at defaults), while quantization error only displaces a neighbor a
    few shortlist positions — depth 64 for k=10 measures recall 1.0 on
    the bench corpus (`ann_probe_curve`'s sq8_rerank tier), at byte
    fraction 0.25 + 64 exact rows.

    Exactly oracled end-to-end: the code computation is order-matched
    IEEE double arithmetic, everything between is integer, and the
    re-rank is the shared round-6 cosine — DuckDB replays scale, codes,
    shortlist, and final ranking bit-for-bit.

    Reference anchor: the reference engine (etl_weekly_trades.py) has no
    vector search — north-star X-13 surface."""
    from etl_demo_spark.vec import int8_rerank_topk

    (emb,) = _t(spark, sf_dir, "embeddings")
    return int8_rerank_topk(emb, k=10, query_id=0, rerank_depth=64)


@query(
    "embedding_near_dups",
    oracle="""
    SELECT vec_id AS id_a, vec_id + 1000000 AS id_b,
           CAST(1.0 AS DOUBLE) AS cos_sim
    FROM embeddings
    UNION ALL
    SELECT vec_id AS id_a, vec_id + 2000000 AS id_b,
           CAST(1.0 AS DOUBLE) AS cos_sim
    FROM embeddings
    UNION ALL
    SELECT vec_id + 1000000 AS id_a, vec_id + 2000000 AS id_b,
           CAST(1.0 AS DOUBLE) AS cos_sim
    FROM embeddings
    """,
)
def embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-12/X-13 embedding-cosine near-dup pairs via LSH buckets (exact
    cosine within buckets only).

    EXACTLY oracled against an analytically-planted pair set: the
    testdata embeddings are near-orthogonal random vectors (measured max
    pairwise cosine ≈ 0.51 at sf0.01/sf0.1 — far under the 0.9
    threshold), so the only pairs a CORRECT near-dup operator can emit
    are the planted ones. The query plants two positive scalar copies of
    every vector (×2.0 at id+1M, ×3.0 at id+2M): a positive scaling
    leaves every sign-LSH hyperplane projection's sign unchanged, so all
    three copies land in the SAME bucket with recall 100% *by
    construction* (not probabilistically), and cosine between any two is
    exactly 1.0 — hence the closed-form SQL oracle of the 3·n pair
    triangle. The probabilistic side of LSH recall (perturbed copies that
    may miss the bucket) is asserted separately in
    tests/test_llm_ops.py, where an approximate bound — not an exact
    row set — is the honest claim."""
    from etl_demo_spark.vec import embedding_near_dup_pairs

    (emb,) = _t(spark, sf_dir, "embeddings")
    base = emb.select("vec_id", "embedding")
    scaled2 = base.select(
        (F.col("vec_id") + F.lit(1_000_000)).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(2.0)).alias("embedding"),
    )
    scaled3 = base.select(
        (F.col("vec_id") + F.lit(2_000_000)).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(3.0)).alias("embedding"),
    )
    planted = base.unionByName(scaled2).unionByName(scaled3)
    return embedding_near_dup_pairs(planted, threshold=0.9, planes=6)


# ---------------------------------------------------------------------------
# Multimodal plumbing (binary columns + Arrow-batched Python stage).
# ---------------------------------------------------------------------------


@query(
    "media_features",
    oracle="""
    SELECT doc_id AS media_id,
           sha256(text) AS sha256,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
    FROM documents
    """,
)
def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing end-to-end: documents → binary media table →
    mapInPandas (Arrow-batched) feature extraction. The sha256/byte-length
    features are oracle-checked — proving the binary column and the Python
    batch stage produce byte-identical content on both engines."""
    from etl_demo_spark.multimodal import documents_as_media, extract_features

    (docs,) = _t(spark, sf_dir, "documents")
    return extract_features(documents_as_media(docs)).select("media_id", "sha256", "n_bytes")


@query(
    "media_decode_dims",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(1 + doc_id % 64 AS INTEGER) AS width,
           CAST(1 + length(text) % 64 AS INTEGER) AS height,
           'RGB' AS mode
    FROM documents
    """,
)
def media_decode_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode, exactly oracled: per document, synthesize a
    valid PNG (io/png.py's RFC-2083 encoder) whose dimensions derive from
    the row — width = 1 + doc_id % 64, height = 1 + length(text) % 64 —
    then parse them back with the stdlib header decoder
    (multimodal.decode_image, no fake codec). The oracle recomputes the
    dimensions arithmetically from the parquet columns, so a hash match
    proves the encode→decode round trip bit-agrees on every row.

    Plan shape: two narrow Arrow-batched Python stages (blob build,
    header parse), no shuffle — blobs never move between executors."""
    import numpy as np

    from etl_demo_spark.io.png import png_bytes
    from etl_demo_spark.multimodal import decode_image

    (docs,) = _t(spark, sf_dir, "documents")

    def build(it):
        for pdf in it:
            blobs = []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                w = 1 + int(did) % 64
                h = 1 + len(text) % 64
                # deterministic gradient fill — a real image, not just a header
                col = (np.arange(w, dtype=np.uint16) * 255 // max(w, 1)).astype(np.uint8)
                rgb = np.stack(
                    [np.tile(col, (h, 1))] * 3, axis=2
                )
                blobs.append(png_bytes(rgb))
            yield pd.DataFrame({"media_id": pdf["doc_id"], "content": blobs})

    media = docs.select("doc_id", "text").mapInPandas(
        build,
        "media_id bigint, content binary",
    )
    return decode_image(media)


# ---------------------------------------------------------------------------
# Reference-parity PnL pipeline mapped onto lineitem (O-7…O-16 end-to-end).
# ---------------------------------------------------------------------------


@query(
    "weekly_trades_pnl",
    oracle=f"""
    WITH trades AS (
      SELECT l_shipdate AS ts,
             l_suppkey AS user_id,
             l_linestatus AS client_type,
             l_returnflag AS symbol,
             CASE WHEN l_linenumber % 2 = 1 THEN 'buy' ELSE 'sell' END AS side,
             CAST(l_quantity AS {DEC_SQL}) AS quantity,
             CAST(l_extendedprice AS {DEC_SQL}) AS price,
             l_orderkey, l_linenumber
      FROM lineitem
    ),
    marks AS (
      SELECT symbol, price AS mark_price FROM (
        SELECT symbol, price,
               ROW_NUMBER() OVER (PARTITION BY symbol
                                  ORDER BY ts DESC, l_orderkey DESC, l_linenumber DESC) AS rn
        FROM trades
      ) WHERE rn = 1
    ),
    agg AS (
      SELECT CAST(date_trunc('week', ts) AS DATE) AS week_start_date,
             client_type, user_id, symbol,
             CAST(COALESCE(SUM(CASE WHEN side = 'buy'  THEN quantity END), 0) AS DOUBLE) AS buy_qty,
             CAST(COALESCE(SUM(CASE WHEN side = 'sell' THEN quantity END), 0) AS DOUBLE) AS sell_qty,
             CAST(COALESCE(SUM(CASE WHEN side = 'buy'  THEN quantity * price END), 0) AS DOUBLE) AS buy_value,
             CAST(COALESCE(SUM(CASE WHEN side = 'sell' THEN quantity * price END), 0) AS DOUBLE) AS sell_value,
             CAST(SUM(quantity * price) AS DOUBLE) AS total_volume,
             COUNT(ts) AS trade_count
      FROM trades
      GROUP BY 1, 2, 3, 4
    )
    SELECT a.week_start_date, a.client_type, a.user_id, a.symbol,
           a.buy_qty, a.sell_qty, a.buy_value, a.sell_value,
           a.total_volume, a.trade_count,
           CASE WHEN a.buy_qty <> 0 THEN a.buy_value / a.buy_qty END AS avg_buy_price,
           a.buy_qty - a.sell_qty AS net_qty,
           a.sell_value - (CASE WHEN a.buy_qty <> 0 THEN a.buy_value / a.buy_qty END) * a.sell_qty AS realized_pnl,
           CAST(m.mark_price AS DOUBLE) AS mark_price,
           (CAST(m.mark_price AS DOUBLE) - (CASE WHEN a.buy_qty <> 0 THEN a.buy_value / a.buy_qty END)) * (a.buy_qty - a.sell_qty) AS unrealized_pnl,
           (a.sell_value - (CASE WHEN a.buy_qty <> 0 THEN a.buy_value / a.buy_qty END) * a.sell_qty)
             + ((CAST(m.mark_price AS DOUBLE) - (CASE WHEN a.buy_qty <> 0 THEN a.buy_value / a.buy_qty END)) * (a.buy_qty - a.sell_qty)) AS total_pnl
    FROM agg a LEFT JOIN marks m USING (symbol)
    """,
)
def weekly_trades_pnl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's ENTIRE analytical core (O-7…O-16) as one oracle-
    checked query, with lineitem playing the trades table (side from
    line-number parity, mark price = price of the latest trade per symbol
    with a deterministic (ts, orderkey, linenumber) tiebreak).

    Every SUM accumulates exactly — scaled-long products (cents×cents)
    into a decimal(28,0) accumulator, rescaled once per group — and all
    post-agg scalars are fixed-order double arithmetic on identical
    inputs, so results are bit-identical across engines against the
    oracle's decimal formulation.
    """
    (li,) = _t(spark, sf_dir, "lineitem")
    trades = li.select(
        F.col("l_shipdate").alias("ts"),
        F.col("l_suppkey").alias("user_id"),
        F.col("l_linestatus").alias("client_type"),
        F.col("l_returnflag").alias("symbol"),
        F.when(F.col("l_linenumber") % 2 == 1, "buy").otherwise("sell").alias("side"),
        money_c("l_quantity").alias("qty_c"),
        money_c("l_extendedprice").alias("price_c"),
        "l_orderkey",
        "l_linenumber",
    )
    # fixed-point fast path: quantity and price are ≤2dp, so the notional
    # is exact in cents×cents space (long mul, ×10^4); only the SUM runs
    # in decimal. Same rational as quantity*price in decimal — the /10^4
    # rescale and double cast land on the identical double (2^53 bound
    # holds per group).
    notional_s = F.col("qty_c") * F.col("price_c")
    zero28 = F.lit(0).cast("decimal(28,0)")

    def fsum(scaled, cond, frac_digits: int) -> F.Column:
        masked = F.when(cond, scaled) if cond is not None else scaled
        return (
            (
                F.coalesce(F.sum(masked.cast("decimal(28,0)")), zero28)
                / F.lit(10**frac_digits)
            )
            .cast("double")
        )

    # round-10: the group count is ~rows (weekly per-user-symbol keys), so
    # map-side partial aggregation reduces ~nothing at ANY scale — it only
    # builds a near-row-count hash map of decimal buffers in the scan
    # tasks and then shuffles the same row count anyway (guide §2.3/§2.4).
    # Repartition by the group keys FIRST: the exchange carries the raw
    # narrow longs (8 B each, no decimal buffers), and the decimal
    # accumulation runs once, parallel, after the shuffle. AQE picks the
    # partition count (REPARTITION_BY_COL), so the shape is
    # scale-adaptive, not tuned to local[32]. Results are identical —
    # the same exact-decimal sums, grouped the same way.
    keyed = trades.select(
        F.to_date(F.date_trunc("week", "ts")).alias("week_start_date"),
        "client_type",
        "user_id",
        "symbol",
        (F.col("side") == "buy").alias("is_buy"),
        "qty_c",
        "price_c",
        "ts",
    ).repartition("week_start_date", "client_type", "user_id", "symbol")
    is_buy = F.col("is_buy")
    is_sell = ~F.col("is_buy")
    agg = keyed.groupBy(
        "week_start_date", "client_type", "user_id", "symbol"
    ).agg(
        fsum(F.col("qty_c"), is_buy, 2).alias("buy_qty"),
        fsum(F.col("qty_c"), is_sell, 2).alias("sell_qty"),
        fsum(notional_s, is_buy, 4).alias("buy_value"),
        fsum(notional_s, is_sell, 4).alias("sell_value"),
        fsum(notional_s, None, 4).alias("total_volume"),
        F.count("ts").alias("trade_count"),
    )
    # marks as a separate narrow aggregate rather than max_by buffers
    # carried through the big shuffle: the group count of the main agg is
    # ~rows (partial aggregation barely reduces), so every extra buffer
    # byte is shuffled ~once per input row — measurably slower than a
    # second scan that column-prunes to (symbol, price, order key) and
    # collapses map-side to one row per symbol per task.
    order_key = F.struct("ts", "l_orderkey", "l_linenumber")
    marks = trades.groupBy("symbol").agg(
        (F.max_by("price_c", order_key).cast("decimal(28,0)") / F.lit(100)).alias(
            "mark_price"
        )
    )
    # one post-join projection instead of a withColumn chain: each
    # withColumn re-analyzes the whole plan (driver-side O(depth²));
    # a single select produces the identical expressions once.
    avg_buy = F.when(F.col("buy_qty") != 0, F.col("buy_value") / F.col("buy_qty"))
    mark_d = F.col("mark_price").cast("double")
    net_qty = F.col("buy_qty") - F.col("sell_qty")
    realized = F.col("sell_value") - avg_buy * F.col("sell_qty")
    unrealized = (mark_d - avg_buy) * net_qty
    return agg.join(F.broadcast(marks), "symbol", "left").select(
        "week_start_date", "client_type", "user_id", "symbol",
        "buy_qty", "sell_qty", "buy_value", "sell_value",
        "total_volume", "trade_count",
        avg_buy.alias("avg_buy_price"),
        net_qty.alias("net_qty"),
        realized.alias("realized_pnl"),
        mark_d.alias("mark_price"),
        unrealized.alias("unrealized_pnl"),
        (realized + unrealized).alias("total_pnl"),
    )


# ---------------------------------------------------------------------------
# Structured Streaming (X-10) over events — REAL streaming executions
# (availableNow trigger → memory sink), oracle-checked where SQL-expressible.
# ---------------------------------------------------------------------------

import itertools as _itertools

_STREAM_SEQ = _itertools.count(1)  # thread-safe under the GIL (single next())


def _stream_table_name() -> str:
    # memory-sink table names must be unique per execution within a session
    # even if the driver runs corpus queries concurrently
    return f"stream_result_{next(_STREAM_SEQ)}"


def _run_stream(spark: SparkSession, stream_df, output_mode: str = "complete",
                state_partitions: int = 2):
    """Corpus-standard streaming execution: availableNow → memory sink.

    Two hygiene rules on top of run_stream_to_memory:
    - drops memory-sink tables left by PRIOR streaming corpus queries, so
      repeated invocations (bench warm+3, sweep loops) don't accumulate
      sink rows in session memory. CONTRACT: starting a new streaming
      corpus query therefore INVALIDATES DataFrames returned by earlier
      ones — unlike released operator caches (which transparently
      recompute), a memory-sink view has no lineage to recompute from,
      so a later action on a stale handle raises TABLE_OR_VIEW_NOT_FOUND
      rather than silently re-running. Consume (collect/toPandas/write)
      each streaming result before requesting the next one; that is how
      the driver, the bench, and the sweep all already behave;
    - sizes the stateful shuffle to the corpus state cardinalities
      (thousands of keys at sf0.1) instead of the batch-oriented session
      default; see run_stream_to_memory's docstring for the scale math.
    """
    from etl_demo_spark.streaming import run_stream_to_memory

    for t in spark.catalog.listTables():
        if t.name.startswith("stream_result_") and t.isTemporary:
            spark.catalog.dropTempView(t.name)
    return run_stream_to_memory(
        spark,
        stream_df,
        _stream_table_name(),
        output_mode=output_mode,
        state_partitions=state_partitions,
    )


@query(
    "stream_hourly_event_stats",
    oracle="""
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def stream_hourly_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-10 tumbling-window streaming aggregation, executed by the real
    streaming engine (incremental micro-batches, watermarked state,
    availableNow trigger) — then differentially checked against a plain
    GROUP BY oracle. Batch/stream unification made testable."""
    from etl_demo_spark.streaming import hourly_event_stats, read_events_stream

    stream = read_events_stream(spark, sf_dir)
    return _run_stream(spark, hourly_event_stats(stream))


@query(
    "session_windows",
    oracle="""
    WITH flagged AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
             CASE WHEN CAST(ts AS TIMESTAMP) - LAG(CAST(ts AS TIMESTAMP))
                       OVER (PARTITION BY user_id ORDER BY ts) > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    numbered AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_no
      FROM flagged
    )
    SELECT MIN(ts) AS session_start, user_id,
           COUNT(*) AS n_events, MAX(ts) AS last_ts
    FROM numbered
    GROUP BY user_id, session_no
    """,
)
def session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-10 session windows (30-min inactivity gap) per user — Spark's
    session_window vs a gaps-and-islands SQL oracle. Runs on the batch
    frame (same function serves streams; the streaming path is exercised
    by stream_hourly_event_stats and stream_user_counters)."""
    from etl_demo_spark.streaming import session_window_agg

    (events,) = _t(spark, sf_dir, "events")
    return session_window_agg(events)


@query(
    "sliding_window_counts",
    oracle="""
    WITH buckets AS (
      SELECT time_bucket(INTERVAL 12 HOURS, CAST(ts AS TIMESTAMP), TIMESTAMP '1970-01-01') AS b0,
             event_type
      FROM events
    ),
    expanded AS (
      SELECT b0 AS window_start, event_type FROM buckets
      UNION ALL
      SELECT b0 - INTERVAL 12 HOURS AS window_start, event_type FROM buckets
    )
    SELECT window_start, event_type, COUNT(*) AS n_events
    FROM expanded
    GROUP BY 1, 2
    """,
)
def sliding_window_counts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-10 sliding windows (1 day size, 12 h slide): every event counts in
    two windows; oracle expands each event into both epoch-aligned buckets."""
    from etl_demo_spark.streaming import sliding_window_counts

    (events,) = _t(spark, sf_dir, "events")
    return sliding_window_counts(events)


@query(
    "stream_user_counters",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n_events,
           ROUND(COALESCE(SUM(value), 0.0), 4) AS total_value,
           MAX(value) AS max_value
    FROM events
    GROUP BY user_id
    """,
)
def stream_user_counters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-10/X-11 applyInPandasWithState: per-user running counters evolved
    in GroupState across micro-batches (update mode).

    Oracled BECAUSE stateful-final == batch-aggregate (the same
    equivalence `stream_user_type_profile` pins for state v2): the last
    update emitted per user must equal the one-shot GROUP BY the oracle
    computes. total_value is rounded to 4dp on both sides — the stream
    folds per-batch partial sums sequentially, the oracle sums in one
    pass, and float addition is order-sensitive. COALESCE matches the
    operator's all-NULL-values contract (count rows, total 0.0)."""
    from etl_demo_spark.streaming import read_events_stream
    from etl_demo_spark.streaming.stateful import user_running_counters

    stream = read_events_stream(spark, sf_dir)
    counters = user_running_counters(stream)
    out = _run_stream(spark, counters, output_mode="update")
    # update-mode memory sink may hold one row per state update; keep the last per user
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        out.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
        .select(
            "user_id",
            "n_events",
            F.round("total_value", 4).alias("total_value"),
            "max_value",
        )
    )


@query(
    "stream_user_type_profile",
    oracle="""
    SELECT user_id,
           COUNT(DISTINCT event_type) AS n_types,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 4) AS total_value
    FROM events
    GROUP BY user_id
    """,
)
def stream_user_type_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-10/X-11 transformWithStateInPandas (state v2) run END-TO-END by
    the real streaming engine: TYPED per-key state on the RocksDB store —
    a ValueState (event count + value sum) and a MapState keyed by
    event_type whose size is the user's incrementally-evolved distinct
    count. The worker's state-server RPC runs over protobuf — the repo's
    pure-Python runtime (etl_demo_spark/protoshim + the google/ façade)
    where the wheel is absent.

    Oracled BECAUSE stateful-final == batch-aggregate: the last update
    per user must equal the plain GROUP BY the oracle computes, so a hash
    match proves the v2 state machine (init → per-batch evolve → final
    state) lands exactly where one-shot aggregation does. total_value is
    rounded to 4dp on both sides (float accumulation order differs
    between a sequential batch fold and the oracle's sum).

    Scale: state is O(live users); micro-batch cost is O(batch) + state
    lookups; RocksDB spills state off-heap — the operator a 100 TB
    clickstream profile table is maintained by."""
    from etl_demo_spark.streaming import read_events_stream
    from etl_demo_spark.streaming.stateful import user_type_profile

    provider_key = "spark.sql.streaming.stateStore.providerClass"
    saved = spark.conf.get(provider_key, None)
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = read_events_stream(spark, sf_dir)
        out = _run_stream(spark, user_type_profile(stream), output_mode="update")
    finally:
        if saved is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, saved)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        out.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
        .select(
            "user_id",
            "n_types",
            "n_events",
            F.round("total_value", 4).alias("total_value"),
        )
    )


# ---------------------------------------------------------------------------
# As-of join (X-3) and reporting verbs (O-19…O-23).
# ---------------------------------------------------------------------------


@query(
    "events_asof_last_purchase",
    oracle="""
    SELECT a.event_id, a.user_id,
           CAST(a.ts AS TIMESTAMP) AS ts,
           CAST(p.ts AS TIMESTAMP) AS last_purchase_ts
    FROM events a
    ASOF LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'purchase') p
      ON a.user_id = p.user_id AND a.ts >= p.ts
    """,
)
def events_asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-3 as-of join: for every event, the most recent prior (<=) purchase
    time of the same user — attribution's core primitive. Implemented with
    the union+window trick (one shuffle per key, O((n+m)log) per key);
    DuckDB's native ASOF JOIN is the oracle."""
    (events,) = _t(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("last_purchase_ts")
    )
    left = events.select("event_id", "user_id", "ts")
    return asof_join(
        left,
        purchases,
        on="user_id",
        left_ts="ts",
        right_ts="last_purchase_ts",
        value_cols=["last_purchase_ts"],
    )


@query(
    "top_clients_report",
    oracle=f"""
    WITH rolled AS (
      SELECT o_custkey AS user_id,
             CAST(SUM(CAST(o_totalprice AS {DEC_SQL})) AS DOUBLE) AS total_spend,
             CAST(COUNT(*) AS DOUBLE) AS n_orders
      FROM orders WHERE o_orderstatus = 'O'
      GROUP BY 1
    ),
    by_spend AS (
      SELECT user_id, total_spend, n_orders,
             AVG(rn) OVER (PARTITION BY total_spend) AS rank
      FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY total_spend DESC, user_id) AS rn FROM rolled)
    ),
    by_orders AS (
      SELECT user_id, total_spend, n_orders,
             AVG(rn) OVER (PARTITION BY n_orders) AS rank
      FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY n_orders DESC, user_id) AS rn FROM rolled)
    )
    SELECT * FROM (
      SELECT user_id, total_spend, n_orders, rank, 'total_spend' AS top_label
      FROM by_spend ORDER BY total_spend DESC, user_id LIMIT 3)
    UNION ALL
    SELECT * FROM (
      SELECT user_id, total_spend, n_orders, rank, 'n_orders' AS top_label
      FROM by_orders ORDER BY n_orders DESC, user_id LIMIT 3)
    """,
)
def top_clients_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-19…O-23 as one oracle-checked report: equality filter → per-user
    rollup → per-metric top-K with pandas-style average rank over ALL users
    → union with provenance label. Mirrors the reference's reporting stage
    (`etl_weekly_trades.py:182-207`) on the orders table."""
    from etl_demo_spark.ops import ranked, top_k, union_all

    (orders,) = _t(spark, sf_dir, "orders")
    rolled = (
        orders.filter(F.col("o_orderstatus") == "O")
        .groupBy(F.col("o_custkey").alias("user_id"))
        .agg(
            dsum(dec("o_totalprice")).alias("total_spend"),
            F.count(F.lit(1)).cast("double").alias("n_orders"),
        )
    )
    frames = []
    for metric in ["total_spend", "n_orders"]:
        with_rank = ranked(rolled, metric)
        frames.append(
            top_k(with_rank, metric, 3, tiebreak=["user_id"]).withColumn(
                "top_label", F.lit(metric)
            )
        )
    return union_all(frames).select("user_id", "total_spend", "n_orders", "rank", "top_label")


@query(
    "supplier_brand_lists",
    oracle="""
    SELECT l_suppkey,
           array_to_string(list_sort(list(DISTINCT p_brand)), ',') AS brands,
           COUNT(DISTINCT p_brand) AS n_brands
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY l_suppkey
    """,
)
def supplier_brand_lists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-8 array functions: collect_set → sort_array → array_join rendered
    as a deterministic string (sorted, comma-joined) so the array surface
    is oracle-comparable."""
    li, part = _t(spark, sf_dir, "lineitem", "part")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey")
        .agg(
            F.array_join(F.sort_array(F.collect_set("p_brand")), ",").alias("brands"),
            F.countDistinct("p_brand").alias("n_brands"),
        )
    )


@query(
    "events_props_map",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
    FROM events
    GROUP BY event_type
    """,
)
def events_props_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-8 map/JSON: from_json into MAP<STRING,BIGINT> + element_at — the
    single-parse, schema-typed path (vs get_json_object's per-path parse
    in events_json_extract). At scale parse once, extract many."""
    (events,) = _t(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,bigint>")
    k = F.element_at(m, "k")
    return events.select(F.col("event_type"), k.alias("k")).groupBy("event_type").agg(
        F.sum("k").alias("sum_k"), F.max("k").cast("long").alias("max_k")
    )


@query(
    "grouping_sets_sql",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS {DEC_SQL})) AS DOUBLE) AS revenue
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """,
)
def grouping_sets_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-5 GROUPING SETS through the SQL entry point (spark.sql over
    registered temp views) — a set rollup/cube can't express
    ((status),(priority)) without the cross terms."""
    load_tables(spark, sf_dir, tables=("orders",), register_views=True)
    return spark.sql(
        f"""
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS {DEC})) AS DOUBLE) AS revenue
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """
    )


@query(
    "orders_range_frame",
    oracle=f"""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS {DEC_SQL}))
                OVER (PARTITION BY o_custkey
                      ORDER BY datediff('day', DATE '1995-01-01', o_orderdate)
                      RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS DOUBLE) AS spend_30d
    FROM orders
    """,
)
def orders_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-6 RANGE frame: per-customer trailing-30-day spend. The order key
    is a day offset so the range bound is numeric on both engines; equal
    order values share one frame (RANGE semantics), so the result is
    deterministic even with same-day orders."""
    from pyspark.sql import Window

    (orders,) = _t(spark, sf_dir, "orders")
    days = F.datediff(F.col("o_orderdate"), F.lit("1995-01-01"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(days)
        .rangeBetween(-30, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(dec("o_totalprice")).over(w).cast("double").alias("spend_30d"),
    )


@query(
    "segment_demeaned_balance",
    oracle=f"""
    SELECT c_custkey, c_mktsegment,
           c_acctbal - CAST(SUM(CAST(c_acctbal AS {DEC_SQL}))
                            OVER (PARTITION BY c_mktsegment) AS DOUBLE)
                       / (COUNT(*) OVER (PARTITION BY c_mktsegment)) AS acctbal_demeaned
    FROM customer
    """,
)
def segment_demeaned_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-11 applyInPandas (grouped-map): per-segment demeaning in an
    Arrow-batched pandas stage. The mean is computed with exact Decimal
    summation inside the UDF so it is order-independent and equals the
    oracle's decimal-window mean bit-for-bit."""
    (customer,) = _t(spark, sf_dir, "customer")

    def demean(pdf):
        import decimal

        import pandas as pd

        total = sum((decimal.Decimal(str(v)).quantize(decimal.Decimal("0.0001"))
                     for v in pdf["c_acctbal"]), decimal.Decimal(0))
        mean = float(total) / len(pdf)
        return pd.DataFrame(
            {
                "c_custkey": pdf["c_custkey"],
                "c_mktsegment": pdf["c_mktsegment"],
                "acctbal_demeaned": pdf["c_acctbal"] - mean,
            }
        )

    return customer.groupBy("c_mktsegment").applyInPandas(
        demean, "c_custkey long, c_mktsegment string, acctbal_demeaned double"
    )


@query(
    "weekly_counts_pivot",
    oracle="""
    SELECT CAST(date_trunc('week', l_shipdate) AS DATE) AS week_start_date,
           CAST(COALESCE(SUM(CASE WHEN l_linestatus = 'F' THEN 1 END), 0) AS BIGINT) AS "F",
           CAST(COALESCE(SUM(CASE WHEN l_linestatus = 'O' THEN 1 END), 0) AS BIGINT) AS "O"
    FROM lineitem
    GROUP BY 1
    """,
)
def weekly_counts_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-25 on the trades mapping: week × client_type(linestatus) trade
    counts, wide — the chart-feeding pivot of the reference
    (`etl_weekly_trades.py:256`)."""
    (li,) = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy(week_start("l_shipdate").alias("week_start_date"))
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
    )


@query(
    "parts_above_avg_price",
    oracle=f"""
    SELECT p_partkey, p_name, p_retailprice
    FROM part
    WHERE p_retailprice > (
      SELECT CAST(SUM(CAST(p_retailprice AS {DEC_SQL})) AS DOUBLE) / COUNT(*) FROM part)
    """,
)
def parts_above_avg_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-2/X-8 scalar subquery: parts priced above the global mean (mean
    as exact-decimal sum / count on both engines). Catalyst plans the
    subquery as a one-row broadcast."""
    load_tables(spark, sf_dir, tables=("part",), register_views=True)
    return spark.sql(
        f"""
        SELECT p_partkey, p_name, p_retailprice
        FROM part
        WHERE p_retailprice > (
          SELECT CAST(SUM(CAST(p_retailprice AS {DEC})) AS DOUBLE) / COUNT(*) FROM part)
        """
    )


@query(
    "orders_with_bulky_items",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_quantity >= 49)
    """,
)
def orders_with_bulky_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-2 IN-subquery (decorrelates to a left-semi join over the filtered
    lineitem scan — predicate pushed to parquet)."""
    load_tables(spark, sf_dir, tables=("orders", "lineitem"), register_views=True)
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_quantity >= 49)
        """
    )


@query(
    "customer_max_order",
    oracle=f"""
    SELECT c.c_custkey,
           (SELECT MAX(o_totalprice) FROM orders o WHERE o.o_custkey = c.c_custkey) AS max_order
    FROM customer c
    """,
)
def customer_max_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-2 correlated scalar subquery (decorrelates to an aggregate +
    left outer join). MAX of raw doubles is order-independent — no decimal
    lift needed."""
    load_tables(spark, sf_dir, tables=("orders", "customer"), register_views=True)
    return spark.sql(
        """
        SELECT c.c_custkey,
               (SELECT MAX(o_totalprice) FROM orders o WHERE o.o_custkey = c.c_custkey) AS max_order
        FROM customer c
        """
    )


@query(
    "lineitem_quality_profile",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           CAST(COUNT(*) - COUNT(l_quantity) AS BIGINT) AS null_quantity,
           CAST(COUNT(*) - COUNT(l_shipdate) AS BIGINT) AS null_shipdate,
           COUNT(DISTINCT l_returnflag) AS n_returnflags,
           COUNT(DISTINCT l_linestatus) AS n_linestatuses,
           MIN(CAST(l_shipdate AS DATE)) AS min_shipdate,
           MAX(CAST(l_shipdate AS DATE)) AS max_shipdate
    FROM lineitem
    """,
)
def lineitem_quality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-2/O-3 as a first-class query: null counts per column, categorical
    cardinalities, and value ranges — the data-quality screen the
    reference prints as diagnostics (`etl_weekly_trades.py:24-30`),
    computed in one aggregation pass."""
    (li,) = _t(spark, sf_dir, "lineitem")
    n = F.count(F.lit(1))
    return li.agg(
        n.alias("n_rows"),
        (n - F.count("l_quantity")).alias("null_quantity"),
        (n - F.count("l_shipdate")).alias("null_shipdate"),
        F.countDistinct("l_returnflag").alias("n_returnflags"),
        F.countDistinct("l_linestatus").alias("n_linestatuses"),
        F.min(F.to_date("l_shipdate")).alias("min_shipdate"),
        F.max(F.to_date("l_shipdate")).alias("max_shipdate"),
    )


@query(
    "udaf_status_spend",
    oracle=f"""
    SELECT o_orderstatus,
           CAST(SUM(CAST(o_totalprice AS {DEC_SQL})) AS DOUBLE) AS total_spend
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def udaf_status_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-11 UDAF: GROUPED_AGG pandas_udf. The aggregation body sums with
    exact ``decimal.Decimal`` (order-independent), so even a Python UDAF
    is oracle-checkable bit-for-bit. Arrow ships each group's column as
    one batch; Spark handles the shuffle and grouping."""
    def dec_sum(v: pd.Series) -> float:
        import decimal

        q = decimal.Decimal("0.0001")
        total = sum((decimal.Decimal(str(x)).quantize(q) for x in v), decimal.Decimal(0))
        return float(total)

    # type-hint style (SPARK-28264): Series -> scalar infers GROUPED_AGG
    dec_sum = F.pandas_udf(dec_sum, "double")

    (orders,) = _t(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        dec_sum("o_totalprice").alias("total_spend")
    )


@query(
    "orders_first_last_nth",
    oracle="""
    SELECT o_custkey, o_orderkey,
           FIRST_VALUE(o_orderkey) OVER w AS first_order,
           LAST_VALUE(o_orderkey)  OVER w AS last_order,
           NTH_VALUE(o_orderkey, 2) OVER w AS second_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def orders_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-6 analytic window functions over the full partition frame with a
    deterministic total order."""
    from pyspark.sql import Window

    (orders,) = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(w).alias("last_order"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_order"),
    )


@query(
    "approx_percentiles",
    oracle="""
    SELECT ROUND(quantile_cont(l_extendedprice, 0.5), 2) AS p50,
           ROUND(quantile_cont(l_extendedprice, 0.95), 2) AS p95,
           ROUND(quantile_cont(l_extendedprice, 0.99), 2) AS p99,
           TRUE AS within_bound
    FROM lineitem
    """,
)
def approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-4 family: approx_percentile (GK-style sketch) — the 100 TB
    replacement for exact percentiles (no global sort).

    SELF-CERTIFYING oracle row: the sketch estimates are
    engine-specific, so the frame carries the EXACT interpolated
    quantiles (hash-compared against DuckDB's quantile_cont — same
    linear-interpolation definition, ROUND(,2) for the last-ULP gap)
    plus ``within_bound``: each estimate must land inside the exact
    value's ±0.002 RANK window — 20× the sketch's configured 1e-4 rank
    accuracy. Rank error, not value error, is what the GK sketch
    guarantees."""
    (li,) = _t(spark, sf_dir, "lineitem")
    qs = [0.5, 0.95, 0.99]
    guard = [q + d for q in qs for d in (-0.002, 0.002)]
    row = li.agg(
        F.percentile_approx("l_extendedprice", qs, 10000).alias("ap"),
        F.expr(
            "percentile(l_extendedprice, array({}))".format(
                ",".join(str(q) for q in qs)
            )
        ).alias("ep"),
        F.expr(
            "percentile(l_extendedprice, array({}))".format(
                ",".join(str(g) for g in guard)
            )
        ).alias("gp"),
    )
    ok = F.lit(True)
    for i in range(len(qs)):
        ok = ok & (
            (F.col("ap")[i] >= F.col("gp")[2 * i])
            & (F.col("ap")[i] <= F.col("gp")[2 * i + 1])
        )
    return row.select(
        F.round(F.col("ep")[0], 2).alias("p50"),
        F.round(F.col("ep")[1], 2).alias("p95"),
        F.round(F.col("ep")[2], 2).alias("p99"),
        ok.alias("within_bound"),
    )


@query(
    "quantity_price_stats",
    oracle="""
    SELECT l_returnflag,
           ROUND(corr(l_quantity, l_extendedprice), 4) AS corr_qp,
           ROUND(covar_samp(l_quantity, l_extendedprice), 2) AS covar_qp,
           ROUND(stddev_samp(l_quantity), 4) AS sd_qty,
           ROUND(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
           ROUND(regr_intercept(l_extendedprice, l_quantity), 2) AS intercept,
           ROUND(regr_r2(l_extendedprice, l_quantity), 4) AS r2,
           regr_count(l_extendedprice, l_quantity) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def quantity_price_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-4/X-8 statistical aggregate family: correlation, sample
    covariance, stddev, and the SQL:2016 linear-regression aggregates
    (slope/intercept/R²/count) per return flag — one whole-stage-codegen
    hash aggregation, map-side partial merge via the standard pairwise
    moment updates, no second pass. Final doubles ROUND()ed on both
    engines: the moment accumulations are order-dependent in the last
    ULPs, and the driver hash compares formatted values."""
    (li,) = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qp"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias("covar_qp"),
        F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 4).alias("slope"),
        F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 2).alias("intercept"),
        F.round(F.regr_r2("l_extendedprice", "l_quantity"), 4).alias("r2"),
        F.regr_count("l_extendedprice", "l_quantity").alias("n"),
    )


@query(
    "region_nation_lists",
    oracle="""
    SELECT r.r_name AS region,
           string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations,
           COUNT(*) AS n_nations
    FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def region_nation_lists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-8 ordered string aggregation: SQL:2023 LISTAGG ... WITHIN GROUP
    (Spark 4) vs DuckDB's ordered string_agg — deterministic because the
    within-group order is total. The broadcast join keeps the 5x25
    dimension join exchange-free."""
    region, nation = _t(spark, sf_dir, "region", "nation")
    joined = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    )
    return (
        joined.groupBy(F.col("r_name").alias("region"))
        .agg(
            F.expr(
                "listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name)"
            ).alias("nations"),
            F.count(F.lit(1)).alias("n_nations"),
        )
    )


@query(
    "quarterly_distinct_customers_bitmap",
    oracle="""
    SELECT CAST(date_trunc('quarter', o_orderdate) AS DATE) AS quarter,
           COUNT(DISTINCT o_custkey) AS n_customers
    FROM orders
    GROUP BY 1
    """,
)
def quarterly_distinct_customers_bitmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-4 MERGEABLE EXACT distinct counting via bitmap aggregates
    (Spark 3.5 bitmap_construct_agg family): build per-(month, bucket)
    bitmap partials, OR-merge them up to quarters, and sum per-bucket
    cardinalities — exact COUNT(DISTINCT) whose partials are reusable
    state, verified against DuckDB's plain COUNT DISTINCT.

    Why it matters at 100 TB: COUNT(DISTINCT) is not decomposable through
    plain sums, so incremental pipelines either re-scan history or accept
    HLL error. Bitmap partials are the third way — materialize the
    month×bucket bitmaps once, merge any coarser rollup (quarter, year,
    trailing-90d) from the partials alone, exactly. The bucket split
    (bitmap_bucket_number) keeps each bitmap bounded, so the partial
    table shuffles small fixed-size blobs, never raw keys."""
    (orders,) = _t(spark, sf_dir, "orders")
    partials = (
        orders.groupBy(
            F.trunc("o_orderdate", "mm").alias("month"),
            F.bitmap_bucket_number("o_custkey").alias("bkt"),
        ).agg(
            F.bitmap_construct_agg(F.bitmap_bit_position("o_custkey")).alias("bm")
        )
    )
    return (
        partials.groupBy(F.trunc("month", "quarter").alias("quarter"), "bkt")
        .agg(F.bitmap_or_agg("bm").alias("bm"))
        .groupBy("quarter")
        .agg(F.sum(F.bitmap_count("bm")).alias("n_customers"))
    )


@query(
    "stratified_docs_exact",
    oracle="""
    SELECT doc_id, lang
    FROM (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 's3'), 1, 8)) AS BIGINT) ASC,
                        doc_id ASC
             ) AS rn
      FROM documents
    )
    WHERE rn <= 20
    """,
)
def stratified_docs_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic exact-allocation stratified sample
    (`ops.stratified_exact_sample`): exactly 20 documents per language
    (fewer iff a language has fewer), selection reproducible bit-for-bit
    across engines via the md5-derived uniform — the DuckDB oracle
    recomputes the identical per-stratum pick. The exact-count companion
    to the Bernoulli `stratified_doc_sample` (rows-only): balanced
    training-mix construction needs counts, not expectations."""
    from etl_demo_spark.ops import stratified_exact_sample

    (docs,) = _t(spark, sf_dir, "documents")
    return stratified_exact_sample(
        docs.select("doc_id", "lang"),
        strata_cols=["lang"],
        n_per_stratum=20,
        id_col="doc_id",
        seed="s3",
    )


@query(
    "weighted_order_sample",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice > 0
    ORDER BY pow(
        (CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || 'r3'), 1, 8)) AS BIGINT) + 0.5)
          / 4294967296.0,
        1.0 / o_totalprice
    ) DESC, o_orderkey ASC
    LIMIT 100
    """,
)
def weighted_order_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (`ops.weighted_sample`, Efraimidis–Spirakis A-Res): 100 orders drawn
    with probability proportional to o_totalprice, reproducible
    bit-for-bit across engines because the uniform is md5-derived — the
    DuckDB oracle recomputes the IDENTICAL sample with the same formula.
    Plan: narrow projection + TakeOrderedAndProject; no shuffle, no RNG
    state. The training-data mixing primitive (sample docs by quality /
    token count / domain weight) exercised on the relational schema."""
    from etl_demo_spark.ops import weighted_sample

    (orders,) = _t(spark, sf_dir, "orders")
    return weighted_sample(
        orders.select("o_orderkey", "o_totalprice"),
        weight_col="o_totalprice",
        n=100,
        id_col="o_orderkey",
        seed="r3",
    )


@query(
    "orders_page_two",
    oracle="""
    SELECT o_orderkey, o_orderdate, o_totalprice
    FROM orders
    ORDER BY o_orderdate, o_orderkey
    LIMIT 20 OFFSET 40
    """,
)
def orders_page_two(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-9 keyset-free pagination: ORDER BY … LIMIT k OFFSET n (SQL
    OFFSET, Spark 3.4+). The total order includes the unique key so the
    page is deterministic on both engines. Physical note: Spark plans
    this as a global TakeOrdered of the first OFFSET+LIMIT rows — cheap
    for report pages, degrading linearly in OFFSET; deep pagination at
    scale should use a keyset predicate (WHERE (date, key) > last_seen)
    instead, which prunes at the scan."""
    (orders,) = _t(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("orders_page_src")
    return spark.sql(
        """
        SELECT o_orderkey, o_orderdate, o_totalprice
        FROM orders_page_src
        ORDER BY o_orderdate, o_orderkey
        LIMIT 20 OFFSET 40
        """
    )


@query(
    "similar_part_names",
    oracle="""
    WITH p AS (SELECT DISTINCT p_name AS s FROM part)
    SELECT a.s AS a, b.s AS b, levenshtein(a.s, b.s) AS dist
    FROM p a JOIN p b ON a.s < b.s
    WHERE levenshtein(a.s, b.s) <= 2
    """,
)
def similar_part_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-12 fuzzy string matching: exact edit-distance self-join over the
    distinct part names (`dedup.edit_distance_join` — q-gram count-filter
    candidates, JVM levenshtein verification) vs DuckDB's brute-force
    quadratic join. The operator's candidate volume tracks shared-q-gram
    co-occurrence, not n²; the oracle's all-pairs comparison is exact on
    the (vocabulary-bounded) distinct-name set."""
    from etl_demo_spark.dedup import edit_distance_join

    (part,) = _t(spark, sf_dir, "part")
    return edit_distance_join(
        part.select(F.col("p_name").alias("s")), str_col="s", threshold=2
    )


@query(
    "busy_suppliers_having",
    oracle=f"""
    SELECT l_suppkey,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l_quantity AS {DEC_SQL})) AS DOUBLE) AS total_qty
    FROM lineitem
    GROUP BY l_suppkey
    HAVING COUNT(*) > 550
    """,
)
def busy_suppliers_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-4/X-9 HAVING: post-aggregation filter (Catalyst plans it as a
    Filter above the final HashAggregate — no second shuffle)."""
    (li,) = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_suppkey")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum(dec("l_quantity")).alias("total_qty"),
        )
        .filter(F.col("n_items") > 550)
    )


@query(
    "richest_supplier_per_nation",
    oracle="""
    SELECT n_name, s_name AS richest_supplier, s_acctbal AS best_acctbal
    FROM (
      SELECT n.n_name, s.s_name, s.s_acctbal,
             ROW_NUMBER() OVER (PARTITION BY n.n_name
                                ORDER BY s.s_acctbal DESC, s.s_suppkey ASC) AS rn
      FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    ) WHERE rn = 1
    """,
)
def richest_supplier_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-11 generalized: per-group argmax with a deterministic tiebreak via
    max_by on an ordering struct (single-pass aggregate, no window sort).
    The oracle uses the window formulation — both must agree."""
    supplier, nation = _t(spark, sf_dir, "supplier", "nation")
    joined = supplier.join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
    # order by (acctbal DESC, suppkey ASC) == max_by (acctbal, -suppkey)
    return joined.groupBy("n_name").agg(
        F.max_by("s_name", F.struct(F.col("s_acctbal"), -F.col("s_suppkey"))).alias("richest_supplier"),
        F.max("s_acctbal").alias("best_acctbal"),
    )


@query(
    "loyal_customers_semi_anti",
    oracle="""
    SELECT c_custkey, c_mktsegment
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
    """,
)
def loyal_customers_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-2 semi + anti composed: customers with orders but none pending."""
    orders, customer = _t(spark, sf_dir, "orders", "customer")
    with_orders = customer.join(orders, customer.c_custkey == orders.o_custkey, "left_semi")
    pending = orders.filter(F.col("o_orderstatus") == "P")
    return with_orders.join(
        pending, with_orders.c_custkey == pending.o_custkey, "left_anti"
    ).select("c_custkey", "c_mktsegment")


@query(
    "order_value_buckets",
    oracle=f"""
    SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
                WHEN o_totalprice < 150000 THEN 'medium'
                ELSE 'large' END AS bucket,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS {DEC_SQL})) AS DOUBLE) AS revenue
    FROM orders
    GROUP BY 1
    """,
)
def order_value_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-8 CASE WHEN bucketing + aggregation."""
    (orders,) = _t(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 150000, "medium")
        .otherwise("large")
    )
    return orders.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum(dec("o_totalprice")).alias("revenue"),
    )


@query(
    "stream_click_to_purchase",
    oracle="""
    SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
           CAST(c.ts AS TIMESTAMP) AS click_ts,
           CAST(p.ts AS TIMESTAMP) AS purchase_ts
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id
     AND p.ts > c.ts
     AND p.ts <= c.ts + INTERVAL 1 HOUR
    """,
)
def stream_click_to_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-10 stream-stream join executed by the REAL streaming engine
    (watermarked both sides, time-range-bounded state), checked against
    the plain batch SQL join. Attribution's join, streaming-native."""
    from etl_demo_spark.streaming import read_events_stream
    from etl_demo_spark.streaming.windows import purchases_after_clicks

    stream = read_events_stream(spark, sf_dir)
    joined = purchases_after_clicks(stream)
    return _run_stream(spark, joined, output_mode="append")


@query(
    "heavy_hitter_types",
    oracle="""
    SELECT p_type, COUNT(*) AS cnt
    FROM part
    GROUP BY p_type
    ORDER BY cnt DESC, p_type
    LIMIT 10
    """,
)
def heavy_hitter_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-4 heavy hitters via the ``approx_top_k`` sketch (Spark 4.1):
    a single-pass, MERGEABLE frequent-items summary — at 100 TB this
    replaces a full groupBy when only the head of the distribution
    matters, and its memory is bounded by the tracked-item capacity,
    not the key cardinality.

    Oracled EXACTLY: capacity (10 000) ≥ the column's NDV (150 fixed
    p_type values), where the space-saving sketch degrades to exact
    counting; the top-10 is then re-sorted deterministically by
    (count DESC, item) OUTSIDE the sketch so boundary ties resolve the
    same way DuckDB's ORDER BY does. Below-NDV capacity trades that
    exactness for bounded memory (counts become upper bounds)."""
    (part,) = _t(spark, sf_dir, "part")
    sk = part.agg(F.expr("approx_top_k(p_type, 500, 10000)").alias("tk"))
    return (
        sk.select(F.explode("tk").alias("e"))
        .select(F.col("e.item").alias("p_type"), F.col("e.count").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("p_type"))
        .limit(10)
    )


@query(
    "top_bigrams",
    oracle="""
    WITH toks AS (
      SELECT string_split_regex(trim(text), '\\s+') AS l FROM documents
    ),
    bigrams AS (
      SELECT unnest(list_transform(range(1, len(l)), i -> l[i] || ' ' || l[i+1])) AS bigram
      FROM toks
    )
    SELECT bigram, COUNT(*) AS n
    FROM bigrams
    GROUP BY bigram
    ORDER BY n DESC, bigram ASC
    LIMIT 20
    """,
)
def top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-14 n-gram extraction: per-doc bigrams (transform over token
    positions — no UDF), exploded and counted corpus-wide, top-20. The
    explode feeds map-side partial aggregation, so the shuffle carries
    (bigram, partial count), not every occurrence."""
    from etl_demo_spark.ops import spread_for_cpu
    from etl_demo_spark.text import tokens

    (docs,) = _t(spark, sf_dir, "documents")
    toks = tokens("text")
    # zip_with over two shifted slices beats indexed element_at lookups
    # (~1.6x — one pass, no per-position array indexing); spreading the
    # 1-partition input unlocks the cluster for the interpreted HOF stage
    # (4.8 s -> 0.7 s combined at sf0.1)
    n1 = F.greatest(F.size(toks) - 1, F.lit(0))
    bigrams = F.zip_with(
        F.slice(toks, 1, n1), F.slice(toks, 2, n1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    return (
        spread_for_cpu(docs).select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("bigram").asc())
        .limit(20)
    )


@query(
    "null_handling_funcs",
    oracle=f"""
    SELECT c_mktsegment,
           CAST(SUM(CASE WHEN NULLIF(c_acctbal, 0.0) IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS zero_or_null_bal,
           CAST(SUM(CAST(COALESCE(NULLIF(c_acctbal, 0.0), -1.0) AS {DEC_SQL})) AS DOUBLE) AS adjusted_sum,
           CAST(COUNT(c_acctbal) AS BIGINT) AS non_null_bal
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def null_handling_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-8 NULL-handling library: nullif / coalesce / conditional counting."""
    (customer,) = _t(spark, sf_dir, "customer")
    adjusted = F.coalesce(F.nullif(F.col("c_acctbal"), F.lit(0.0)), F.lit(-1.0))
    return customer.groupBy("c_mktsegment").agg(
        F.sum(F.when(F.nullif(F.col("c_acctbal"), F.lit(0.0)).isNull(), 1).otherwise(0))
        .cast("long")
        .alias("zero_or_null_bal"),
        dsum(dec(adjusted)).alias("adjusted_sum"),
        F.count("c_acctbal").alias("non_null_bal"),
    )


@query(
    "forecast_revenue_q6",
    oracle=f"""
    SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS {DEC_SQL}) * CAST(l_discount AS {RATE_SQL})), 2) AS DOUBLE) AS promo_revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def forecast_revenue_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: highly selective conjunctive filter + global sum.
    Every predicate is scan-pushable (check PushedFilters) — at 100 TB this
    query reads a fraction of the row groups via parquet min/max stats."""
    (li,) = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(dec("l_extendedprice") * rate("l_discount")), 2)
            .cast("double")
            .alias("promo_revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "priority_late_orders_q4",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
)
def priority_late_orders_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS with a correlated inequality (decorrelates
    to a left-semi join with a non-equi residual)."""
    orders, li = _t(spark, sf_dir, "orders", "lineitem")
    window_orders = orders.filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-07-01")
    )
    late = window_orders.join(
        li,
        (window_orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.date_add(window_orders.o_orderdate, 60)),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n_orders"))


@query(
    "salted_status_agg",
    oracle=f"""
    SELECT l_returnflag,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l_quantity AS {DEC_SQL})) AS DOUBLE) AS total_qty,
           MAX(l_quantity) AS max_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def salted_status_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew tool in the correctness gate: two-phase salted aggregation
    (keys+salt partials → merge) must equal the plain GROUP BY — so the
    plain SQL is its oracle. Decimal sums keep the merge exact."""
    from etl_demo_spark.ops import salted_agg

    (li,) = _t(spark, sf_dir, "lineitem")
    out = salted_agg(
        li,
        ["l_returnflag"],
        {
            "n_items": (F.count(F.lit(1)), "sum"),
            "total_qty": (F.sum(dec("l_quantity")), "sum"),
            "max_qty": (F.max("l_quantity"), "max"),
        },
        salt_buckets=16,
    )
    return out.select(
        "l_returnflag",
        F.col("n_items").cast("long").alias("n_items"),
        F.col("total_qty").cast("double").alias("total_qty"),
        "max_qty",
    )


@query(
    "events_props_entries",
    oracle="""
    SELECT event_id, k AS prop_key,
           CAST(json_extract_string(props, '$.' || k) AS BIGINT) AS prop_value
    FROM (SELECT event_id, props, unnest(json_keys(props)) AS k FROM events)
    """,
)
def events_props_entries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-8 map explode (UDTF-shaped): one row per JSON property via
    from_json → explode(map). DuckDB's json_each table function is the
    oracle. At scale: explode is a narrow op; the single from_json parse
    happens once per row regardless of key count."""
    (events,) = _t(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,bigint>")
    return events.select("event_id", F.explode(m).alias("prop_key", "prop_value"))


@query(
    "price_percentiles",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_extendedprice, 0.5) AS p50,
           quantile_cont(l_extendedprice, 0.95) AS p95,
           MIN(l_extendedprice) AS p0,
           MAX(l_extendedprice) AS p100
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-4 exact percentiles: both engines linearly interpolate between
    the same order statistics, so results are bit-identical (verified) —
    unlike SUM, the computation touches at most two values. At 100 TB use
    percentile_approx (see approx_percentiles) — exact percentile
    materializes per-group sorted state."""
    (li,) = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("p50"),
        F.expr("percentile(l_extendedprice, 0.95)").alias("p95"),
        F.min("l_extendedprice").alias("p0"),
        F.max("l_extendedprice").alias("p100"),
    )


@query(
    "custkey_multiset_ops",
    oracle="""
    SELECT o_custkey, 'both_statuses' AS src FROM (
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
      INTERSECT ALL
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
    UNION ALL
    SELECT o_custkey, 'open_minus_final' AS src FROM (
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
      EXCEPT ALL
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
    """,
)
def custkey_multiset_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-7 bag-semantics set ops: INTERSECT ALL / EXCEPT ALL preserve
    multiplicities (duplicate custkeys survive per occurrence count)."""
    (orders,) = _t(spark, sf_dir, "orders")
    o = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    f = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return o.intersectAll(f).withColumn("src", F.lit("both_statuses")).unionByName(
        o.exceptAll(f).withColumn("src", F.lit("open_minus_final"))
    )


@query(
    "weekly_revenue_spine",
    oracle=f"""
    WITH spine AS (
      SELECT CAST(unnest(generate_series(DATE '1996-01-01', DATE '1996-12-30', INTERVAL 7 DAY)) AS DATE) AS week_start
    ),
    rev AS (
      SELECT CAST(date_trunc('week', l_shipdate) AS DATE) AS week_start,
             CAST(ROUND(SUM(CAST(l_extendedprice AS {DEC_SQL})), 2) AS DOUBLE) AS revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      GROUP BY 1
    )
    SELECT s.week_start, COALESCE(r.revenue, 0.0) AS revenue
    FROM spine s LEFT JOIN rev r USING (week_start)
    """,
)
def weekly_revenue_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-8 date-spine pattern: generate a complete weekly calendar with
    ``sequence`` + explode and left-join the aggregate, so silent gaps
    (weeks with zero sales) appear as explicit zeros — the correct input
    for time-series charts/models. 1996-01-01 is a Monday, so the 7-day
    spine aligns with date_trunc('week') buckets."""
    (li,) = _t(spark, sf_dir, "lineitem")
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("1996-01-01").cast("date"),
                F.lit("1996-12-30").cast("date"),
                F.expr("INTERVAL 7 DAY"),
            )
        ).alias("week_start")
    )
    rev = (
        li.filter((F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01"))
        .groupBy(F.to_date(F.date_trunc("week", "l_shipdate")).alias("week_start"))
        .agg(F.round(F.sum(dec("l_extendedprice")), 2).cast("double").alias("revenue"))
    )
    return spine.join(rev, "week_start", "left").select(
        "week_start", F.coalesce("revenue", F.lit(0.0)).alias("revenue")
    )

# ---------------------------------------------------------------------------
# TPC-H-shaped relational breadth, batch 2 (X-2/X-6): distribution joins,
# conditional-aggregate ratios, group-filter subqueries, global-argmax CTEs.
# ---------------------------------------------------------------------------


@query(
    "order_count_distribution",
    oracle="""
    SELECT n_orders, COUNT(*) AS n_customers
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS n_orders
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey
    )
    GROUP BY n_orders
    """,
)
def order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (X-2 + X-4): customer ⋈left orders, per-customer
    order count, then the count-of-counts histogram. The left join keeps
    orderless customers (n_orders = 0 via COUNT of NULL key).

    Scale: the first agg shuffles on c_custkey (high cardinality, even);
    the histogram agg is over ≤ a few dozen distinct counts — AQE
    coalesces it to a handful of partitions."""
    orders, customer = _t(spark, sf_dir, "orders", "customer")
    per_cust = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(F.count(F.lit(1)).alias("n_customers"))


@query(
    "promo_revenue_share",
    oracle=f"""
    SELECT year(l_shipdate) AS yr,
           CAST(ROUND(SUM(CASE WHEN p_type = 'PROMO'
                               THEN CAST(l_extendedprice AS {DEC_SQL})
                                    * (1 - CAST(l_discount AS {RATE_SQL}))
                               ELSE 0 END), 2) AS DOUBLE)
           / CAST(ROUND(SUM(CAST(l_extendedprice AS {DEC_SQL})
                            * (1 - CAST(l_discount AS {RATE_SQL}))), 2) AS DOUBLE)
             AS promo_share
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY 1
    """,
)
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional-aggregate ratio (promo revenue share
    per ship-year). part broadcasts (dim side); both sums accumulate in
    exact decimal and the share is one double division — deterministic
    across engines (reference O-9/O-10 masked-aggregation pattern).

    Scale: single shuffle on the year key after a broadcast join; the
    CASE mask is codegen'd into the probe side."""
    li, part = _t(spark, sf_dir, "lineitem", "part")
    notional = dec("l_extendedprice") * (1 - rate("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", notional).otherwise(F.lit(0).cast("decimal(1,0)"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(F.year("l_shipdate").cast("long").alias("yr"))
        .agg(
            (
                F.round(F.sum(promo), 2).cast("double")
                / F.round(F.sum(notional), 2).cast("double")
            ).alias("promo_share")
        )
    )


@query(
    "large_quantity_orders",
    oracle=f"""
    SELECT c_name, c_custkey, o_orderkey, o_orderdate,
           CAST(SUM(CAST(l_quantity AS {DEC_SQL})) AS DOUBLE) AS total_qty
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS {DEC_SQL})) > 200
    )
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate
    """,
)
def large_quantity_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total line quantity exceeds a
    threshold (group-HAVING subquery → semi join), enriched with the
    customer and re-aggregated.

    Scale: the HAVING subquery and the outer agg both shuffle lineitem
    on l_orderkey — co-keyed, so Catalyst reuses one exchange; the
    surviving-order set is small (skew-safe) and joins back semi-style."""
    customer, orders, li = _t(spark, sf_dir, "customer", "orders", "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).alias("q"))
        .filter(F.col("q") > 200)
        .select("l_orderkey")
    )
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .join(big, "l_orderkey", "left_semi")
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate")
        .agg(dsum(dec("l_quantity")).alias("total_qty"))
    )


@query(
    "nation_trade_volume",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           year(l_shipdate) AS yr,
           CAST(ROUND(SUM(CAST(l_extendedprice AS {DEC_SQL})
                          * (1 - CAST(l_discount AS {RATE_SQL}))), 2) AS DOUBLE) AS volume
    FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE n1.n_name < n2.n_name
    GROUP BY 1, 2, 3
    """,
)
def nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between nation pairs by
    ship-year. Six-table join; the nation dimension joins twice under
    different roles (self-join aliasing).

    Scale: lineitem⋈orders is the only large shuffle (both sides keyed
    on orderkey); supplier/customer/nation broadcast; the asymmetric
    pair filter halves the output without a post-join distinct."""
    li, supplier, orders, customer, nation = _t(
        spark, sf_dir, "lineitem", "supplier", "orders", "customer", "nation"
    )
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    volume = dec("l_extendedprice") * (1 - rate("l_discount"))
    return (
        li.join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(F.col("supp_nation") < F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("yr"))
        .agg(F.round(F.sum(volume), 2).cast("double").alias("volume"))
    )


@query(
    "top_revenue_supplier",
    oracle=f"""
    WITH rev AS (
      SELECT l_suppkey,
             CAST(ROUND(SUM(CAST(l_extendedprice AS {DEC_SQL})
                            * (1 - CAST(l_discount AS {RATE_SQL}))), 2) AS DOUBLE) AS total_rev
      FROM lineitem GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_rev
    FROM supplier JOIN rev ON s_suppkey = l_suppkey
    WHERE total_rev = (SELECT MAX(total_rev) FROM rev)
    """,
)
def top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: revenue per supplier; keep the global argmax via
    a scalar subquery over the same aggregate (view reuse).

    Scale: one shuffle on l_suppkey; the MAX scalar is a tiny broadcast
    back onto the aggregate — no global sort."""
    li, supplier = _t(spark, sf_dir, "lineitem", "supplier")
    volume = dec("l_extendedprice") * (1 - rate("l_discount"))
    rev = li.groupBy("l_suppkey").agg(
        F.round(F.sum(volume), 2).cast("double").alias("total_rev")
    )
    best = rev.agg(F.max("total_rev").alias("best_rev"))
    return (
        supplier.join(rev, supplier.s_suppkey == rev.l_suppkey)
        .join(F.broadcast(best), F.col("total_rev") == F.col("best_rev"))
        .select("s_suppkey", "s_name", "total_rev")
    )


@query(
    "wealthy_inactive_customers",
    oracle=f"""
    SELECT c_mktsegment,
           COUNT(*) AS n_cust,
           CAST(SUM(CAST(c_acctbal AS {DEC_SQL})) AS DOUBLE) AS total_bal
    FROM customer
    WHERE c_acctbal > (
            SELECT CAST(SUM(CAST(c_acctbal AS {DEC_SQL})) AS DOUBLE) / COUNT(*)
            FROM customer WHERE c_acctbal > 0
          )
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2001-01-01')
    GROUP BY c_mktsegment
    """,
)
def wealthy_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with no *recent*
    orders (none in the data's final year) — scalar aggregate subquery +
    anti join, rolled up by segment.

    The average is exact-decimal sum / count (one double division) so
    both engines compare against the bit-identical threshold.

    Scale: the threshold is a 1-row broadcast; the anti join reduces
    orders to its distinct custkeys before probing (Catalyst rewrites
    NOT EXISTS to left-anti); final agg is over 5 segments."""
    customer, orders = _t(spark, sf_dir, "customer", "orders")
    avg_bal = customer.filter(F.col("c_acctbal") > 0).agg(
        (dsum(dec("c_acctbal")) / F.count(F.lit(1))).alias("avg_bal")
    )
    return (
        customer.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(
            orders.filter(F.col("o_orderdate") >= "2001-01-01"),
            customer.c_custkey == orders.o_custkey,
            "left_anti",
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            dsum(dec("c_acctbal")).alias("total_bal"),
        )
    )


@query(
    "orders_window_dist",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           NTILE(4)       OVER w AS price_quartile,
           CAST(percent_rank() OVER w AS DOUBLE) AS pct_rank,
           CAST(cume_dist()    OVER w AS DOUBLE) AS cume,
           row_number()   OVER w AS rn
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
    """,
)
def orders_window_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-6 distribution window functions: ntile / percent_rank /
    cume_dist over per-priority price order. The (price, orderkey)
    compound sort key makes every function deterministic under ties.

    Scale: one shuffle on o_orderpriority + per-partition sort. Note a
    low-cardinality partition key concentrates data (5 priorities →
    5 active tasks); at 100 TB, window partitioning needs a
    higher-cardinality key or a pre-bucketed layout."""
    from pyspark.sql.window import Window

    (orders,) = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(4).over(w).cast("long").alias("price_quartile"),
        F.percent_rank().over(w).cast("double").alias("pct_rank"),
        F.cume_dist().over(w).cast("double").alias("cume"),
        F.row_number().over(w).cast("long").alias("rn"),
    )

# ---------------------------------------------------------------------------
# Range join, exact n-gram Jaccard, vector norms, regexp/math/bit functions.
# ---------------------------------------------------------------------------


@query(
    "clicks_before_purchase",
    oracle="""
    SELECT p.event_id AS purchase_id, COUNT(c.c_id) AS n_clicks
    FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
    LEFT JOIN (SELECT event_id AS c_id, user_id AS c_user, ts AS c_ts
               FROM events WHERE event_type = 'click') c
      ON c.c_user = p.user_id
     AND c.c_ts >  p.ts - INTERVAL 1 HOUR
     AND c.c_ts <= p.ts
    GROUP BY p.event_id
    """,
)
def clicks_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-2 range/interval join: for every purchase, the number of clicks
    by the same user in the preceding hour (event-attribution pattern).

    Scale: the equi key (user_id) drives a sort-merge join; the interval
    predicate is evaluated inside the merge, so no cartesian blowup.
    A pure range join (no equi key) would instead bucketize ts to
    1-hour grains and join on the grain ± 1 — same composition, one
    extra explode. Reference parity: generalizes O-11's "latest before
    t" lookup from a global argmax to a windowed count."""
    (ev,) = _t(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    cond = (
        (c.c_user == p.user_id)
        & (c.c_ts > p.ts - F.expr("INTERVAL 1 HOUR"))
        & (c.c_ts <= p.ts)
    )
    return p.join(c, cond, "left").groupBy("purchase_id").agg(
        F.count("c_id").alias("n_clicks")
    )


@query(
    "jaccard_join_prefix_filter",
    oracle="""
    WITH sh AS (
      SELECT doc_id,
             list_distinct(list_transform(generate_series(1, len(text) - 4),
                                          i -> substring(text, i, 5))) AS shingles
      FROM documents WHERE doc_id < 500
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
           / (len(a.shingles) + len(b.shingles)
              - len(list_intersect(a.shingles, b.shingles))) AS jaccard
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
          / (len(a.shingles) + len(b.shingles)
             - len(list_intersect(a.shingles, b.shingles))) >= 0.8
    """,
)
def jaccard_join_prefix_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-12 EXACT similarity join at scale: the prefix-filtered
    AllPairs/PPJoin topology (`dedup.prefix_filter_jaccard_join`) finds
    every char-5-gram Jaccard ≥ 0.8 pair with NO quadratic stage — the
    provably-complete exact counterpart to MinHash-LSH's probabilistic
    candidates, oracled against DuckDB's brute-force all-pairs join.

    The doc_id < 500 bound keeps the ORACLE's quadratic check constant
    across sfs; the Spark side's cost tracks rare-token co-occurrence
    (prefix-token equi-join), not pair count, and runs unbounded in
    `dedup.prefix_filter_jaccard_join` itself. verify="rejoin" (the
    default): these documents shingle to ~300 tokens each, so the
    carry-mode alternative would inflate the prefix-join exchange by the
    array size (measured 4 s → 60 s at sf0.1) — the trade is documented
    on the operator.

    Shingles are HASHED to longs at build (xxhash64 per 5-gram) — the
    scale-standard representation (no pipeline shuffles raw n-gram
    strings at 100 TB). Jaccard over hash sets equals Jaccard over the
    string sets the oracle computes unless a 64-bit collision lands
    inside one document's ~300-shingle set (P ≈ 2⁻⁴⁸ per doc); the
    driver's exact hash-match doubles as the proof that none did."""
    from etl_demo_spark.dedup import prefix_filter_jaccard_join

    (docs,) = _t(spark, sf_dir, "documents")
    sh = docs.filter(F.col("doc_id") < 500).select(
        F.col("doc_id").alias("id"),
        F.expr(
            # CASE guard: sequence(1, n) with n <= 0 DESCENDS ([1, 0, ...])
            # in Spark, minting phantom shingles for sub-5-char docs that
            # the oracle's empty generate_series would never produce
            "CASE WHEN length(text) >= 5 THEN"
            " array_distinct(transform(sequence(1, length(text) - 4),"
            " i -> xxhash64(substring(text, i, 5))))"
            " ELSE array() END"
        ).alias("shingles"),
    )
    return prefix_filter_jaccard_join(sh, threshold=0.8).select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        "jaccard",
    )


@query(
    "ngram_jaccard_pairs",
    oracle="""
    WITH sh AS (
      SELECT doc_id,
             list_distinct(list_transform(generate_series(1, len(text) - 4),
                                          i -> substring(text, i, 5))) AS shingles
      FROM documents WHERE doc_id < 200
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
           / (len(a.shingles) + len(b.shingles)
              - len(list_intersect(a.shingles, b.shingles))) AS jaccard
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
          / (len(a.shingles) + len(b.shingles)
             - len(list_intersect(a.shingles, b.shingles))) >= 0.6
    """,
)
def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-12 exact n-gram Jaccard near-dup detection: character 5-gram
    shingle sets, pairwise |A∩B| / |A∪B| ≥ 0.6 over a bounded doc window
    (doc_id < 200, so the oracle's quadratic check stays constant-cost
    at every sf).

    Scale: this exact verifier is the *second* stage of near-dup dedup —
    at 100 TB the candidate pairs come from MinHash-LSH banding
    (`minhash_near_dup`), and this exact Jaccard runs only on candidates
    (see dedup.verify_jaccard). The set ops stay JVM-side:
    array_distinct/array_intersect/array_union, no Python UDF.
    Jaccard is an exact int/int division — bit-identical on both
    engines. Assumes len(text) ≥ 5 (testdata min is 48); shorter docs
    would need a sequence() guard."""
    from etl_demo_spark.ops import spread_for_cpu

    (docs,) = _t(spark, sf_dir, "documents")
    sh = docs.filter(F.col("doc_id") < 200).select(
        "doc_id",
        F.expr(
            # same sub-5-char guard as the hashed-shingle sites: Spark's
            # sequence(1, n<=0) descends instead of being empty
            "CASE WHEN length(text) >= 5 THEN"
            " array_distinct(transform(sequence(1, length(text) - 4),"
            " i -> substring(text, i, 5)))"
            " ELSE array() END"
        ).alias("shingles"),
    )
    # the theta join is a broadcast nested loop whose parallelism is the
    # LEFT side's partitioning — spread it so the quadratic intersect
    # work fans out (measured 4.0 s -> sub-second at sf0.1)
    a = spread_for_cpu(
        sh.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"))
    )
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        a.join(b, F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", (inter.cast("double") / union).alias("jaccard"))
        .filter(F.col("jaccard") >= 0.6)
    )


@query(
    "embedding_norms",
    oracle="""
    SELECT vec_id, label,
           CAST(SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS DOUBLE) AS sq_norm,
           CAST(MAX(ABS(CAST(x AS DOUBLE))) AS DOUBLE) AS max_abs
    FROM embeddings, UNNEST(embedding) AS t(x)
    GROUP BY vec_id, label
    """,
)
def embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-13 vector arithmetic staying JVM-side: squared L2 norm via a
    sequential `aggregate` fold and max-|x| via array `reduce` — the
    building blocks of cosine similarity, as whole-stage-codegen'd
    higher-order functions (no UDF, no shuffle; embarrassingly
    parallel over partitions).

    Determinism: the fold adds 64 doubles in list order; the oracle's
    UNNEST+SUM accumulates in the same order, so the doubles agree
    bit-for-bit (verified exactly at sf0.1)."""
    (emb,) = _t(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        "label",
        F.expr(
            "aggregate(embedding, CAST(0.0 AS DOUBLE),"
            " (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"
        ).alias("sq_norm"),
        F.expr(
            "aggregate(embedding, CAST(0.0 AS DOUBLE),"
            " (acc, x) -> greatest(acc, abs(CAST(x AS DOUBLE))))"
        ).alias("max_abs"),
    )


@query(
    "doc_regexp_funcs",
    oracle="""
    SELECT doc_id,
           len(regexp_extract_all(text, 'spark')) AS n_spark,
           regexp_extract(text, '\\b(w[a-z]+)', 1) AS first_w_word,
           len(string_split(text, ' ')) AS n_tokens,
           regexp_replace(substring(text, 1, 40), '[aeiou]', '_', 'g') AS devoweled_head
    FROM documents
    """,
)
def doc_regexp_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-8/X-14 regexp function breadth: count-all-matches, first
    capture group, split-count, global replace — all JVM-side string
    kernels (regexp_count / regexp_extract / split / regexp_replace),
    narrow and shuffle-free.

    Patterns are kept in the RE2 ∩ Java-regex common dialect so both
    engines match identically."""
    (docs,) = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.regexp_count("text", F.lit("spark")).cast("bigint").alias("n_spark"),
        F.regexp_extract("text", r"\b(w[a-z]+)", 1).alias("first_w_word"),
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
        F.regexp_replace(F.substring("text", 1, 40), "[aeiou]", "_").alias(
            "devoweled_head"
        ),
    )


@query(
    "math_bit_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(sqrt(l_quantity) AS DOUBLE) AS qty_sqrt,
           CAST(floor(l_extendedprice) AS DOUBLE) AS p_floor,
           CAST(ceil(l_extendedprice) AS DOUBLE) AS p_ceil,
           CAST(abs(l_discount - 0.05) AS DOUBLE) AS disc_dev,
           CAST(sign(l_quantity - 25) AS DOUBLE) AS qty_sign,
           l_orderkey % 7 AS key_mod,
           xor(l_orderkey, l_partkey) AS key_xor,
           l_orderkey & 255 AS key_and,
           l_orderkey | 1 AS key_or
    FROM lineitem
    """,
)
def math_bit_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-8 math + bitwise scalar breadth. Only IEEE-exact kernels are
    used (sqrt is correctly rounded; floor/ceil/abs/sign/% are exact;
    &/|/^ are integer ops) so values are bit-identical across engines —
    transcendentals (exp/ln/pow) are deliberately excluded: libm results
    differ by 1 ULP between engines and would need rounded comparison.

    Narrow projection, no shuffle; all whole-stage codegen."""
    (li,) = _t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.sqrt("l_quantity").alias("qty_sqrt"),
        F.floor("l_extendedprice").cast("double").alias("p_floor"),
        F.ceil("l_extendedprice").cast("double").alias("p_ceil"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.signum(F.col("l_quantity") - 25).alias("qty_sign"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
        F.col("l_orderkey").bitwiseXOR(F.col("l_partkey")).alias("key_xor"),
        (F.col("l_orderkey").bitwiseAND(F.lit(255))).alias("key_and"),
        (F.col("l_orderkey").bitwiseOR(F.lit(1))).alias("key_or"),
    )

# ---------------------------------------------------------------------------
# Array-function breadth, string distance, multi-grain time rollup.
# ---------------------------------------------------------------------------


@query(
    "part_array_funcs",
    oracle="""
    SELECT p_brand,
           array_to_string(list_sort(list(DISTINCT p_type)), ',') AS types_sorted,
           array_to_string(list_sort(list(DISTINCT p_type))[1:2], ',') AS first_two,
           list_contains(list(DISTINCT p_type), 'PROMO') AS has_promo,
           array_to_string(list_reverse(list_sort(list(DISTINCT p_type))), ',') AS types_desc,
           COUNT(DISTINCT p_type) AS n_types
    FROM part GROUP BY p_brand
    """,
)
def part_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-8 array-function breadth: collect_set → sort_array → slice /
    array_contains / reverse / array_join. Arrays render as sorted
    comma-joined strings so the surface is oracle-comparable; set
    construction is the only shuffle (25 brand groups)."""
    (part,) = _t(spark, sf_dir, "part")
    types = F.sort_array(F.collect_set("p_type"))
    return part.groupBy("p_brand").agg(
        F.array_join(types, ",").alias("types_sorted"),
        F.array_join(F.slice(types, 1, 2), ",").alias("first_two"),
        F.array_contains(F.collect_set("p_type"), "PROMO").alias("has_promo"),
        F.array_join(F.reverse(types), ",").alias("types_desc"),
        F.countDistinct("p_type").alias("n_types"),
    )


@query(
    "supplier_name_distance",
    oracle="""
    SELECT s_suppkey, s_name,
           levenshtein(s_name, 'Supplier#000000000') AS edit_dist,
           CAST(instr(s_name, '#') AS BIGINT) AS hash_pos,
           upper(substring(s_name, 1, 8)) AS head_upper
    FROM supplier
    """,
)
def supplier_name_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-8/X-14 string-distance kernel: levenshtein edit distance against
    a fixed probe (fuzzy entity matching primitive), plus instr/upper/
    substring. All JVM string kernels, narrow, shuffle-free."""
    (supplier,) = _t(spark, sf_dir, "supplier")
    return supplier.select(
        "s_suppkey",
        "s_name",
        F.levenshtein("s_name", F.lit("Supplier#000000000")).cast("bigint").alias("edit_dist"),
        F.instr("s_name", "#").cast("bigint").alias("hash_pos"),
        F.upper(F.substring("s_name", 1, 8)).alias("head_upper"),
    )


@query(
    "multi_grain_event_rollup",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day_start,
           CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_start,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value,
           CAST(GROUPING(date_trunc('hour', ts)) AS INT) AS is_day_grain
    FROM events
    GROUP BY GROUPING SETS ((date_trunc('day', ts)),
                            (date_trunc('day', ts), date_trunc('hour', ts)))
    """,
)
def multi_grain_event_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate shape: one pass producing the
    hourly grain AND the daily rollup (GROUPING SETS over time buckets),
    with grouping() disambiguating grain rows.

    Scale: Spark expands grouping sets into one Expand + single shuffle —
    fine while the grain count is small. At 100 TB with many grains the
    better topology is cascading rollups (hour from raw, day from hour,
    week from day), each re-aggregating the previous (much smaller)
    grain — the streaming variant maintains the hour grain incrementally
    and cascades on trigger."""
    load_tables(spark, sf_dir, tables=("events",), register_views=True)
    return spark.sql(
        """
        SELECT date_trunc('day', ts) AS day_start,
               date_trunc('hour', ts) AS hour_start,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value,
               CAST(GROUPING(date_trunc('hour', ts)) AS INT) AS is_day_grain
        FROM events
        GROUP BY GROUPING SETS ((date_trunc('day', ts)),
                                (date_trunc('day', ts), date_trunc('hour', ts)))
        """
    )

# ---------------------------------------------------------------------------
# Batch sessionization and exact-sum statistical dispersion.
# ---------------------------------------------------------------------------


@query(
    "event_sessions_batch",
    oracle="""
    WITH d AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
      SELECT user_id, ts,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS session_id
      FROM d
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id, COUNT(*) AS n_events,
           MIN(ts) AS session_start, MAX(ts) AS session_end
    FROM s GROUP BY user_id, session_id
    """,
)
def event_sessions_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-6 batch sessionization: 30-minute-gap sessions via lag → boolean
    session-start flags → running-sum session ids → per-session rollup.
    The batch twin of the streaming `session_windows` query (same gap
    semantics, differently expressed).

    Scale: one shuffle on user_id serves both window functions AND the
    final group (same partitioning, Catalyst reuses the exchange); the
    (ts, event_id) compound order makes session ids deterministic under
    timestamp ties."""
    from pyspark.sql.window import Window

    (ev,) = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # microsecond precision to match the oracle's INTERVAL comparison —
    # a seconds cast would truncate and disagree on exact-boundary gaps
    gap = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    is_new = F.when(gap.isNull() | (gap > 1800 * 1_000_000), 1).otherwise(0)
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sess = ev.select(
        "user_id", "ts", "event_id", is_new.alias("is_new")
    ).select(
        "user_id", "ts", F.sum("is_new").over(run).alias("session_id")
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


@query(
    "concurrent_session_pairs",
    oracle="""
    WITH d AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
      SELECT user_id, ts,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS session_id
      FROM d
    ), sess AS (
      SELECT user_id, session_id, MIN(ts) AS st, MAX(ts) AS en
      FROM s GROUP BY user_id, session_id
    )
    SELECT a.user_id AS user_a, b.user_id AS user_b,
           COUNT(*) AS n_overlaps,
           CAST(SUM(epoch_us(LEAST(a.en, b.en)) - epoch_us(GREATEST(a.st, b.st))) AS DOUBLE)
             / 1000000.0 AS overlap_secs
    FROM sess a JOIN sess b
      ON a.user_id < b.user_id
     AND a.st <= b.en AND b.st <= a.en
    GROUP BY a.user_id, b.user_id
    """,
)
def concurrent_session_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-3 range join: which user pairs had OVERLAPPING activity sessions,
    how often, and for how long. Sessions are the 30-minute-gap windows of
    `event_sessions_batch`; the overlap join is `ops.interval_overlap_join`
    — bucket-decomposed (1-hour buckets on epoch seconds) so the
    inequality predicate runs inside a plain shuffled equi-join on the
    bucket id, with exactly-once emission in the bucket holding the
    overlap's left edge. DuckDB's native IEJoin is the oracle.

    Scale: candidates per bucket ≈ concurrent sessions in that hour (not
    n²); overlap seconds are exact integer microsecond sums cast to
    double at the end."""
    from pyspark.sql.window import Window

    from etl_demo_spark.ops import interval_overlap_join

    (ev,) = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    is_new = F.when(gap.isNull() | (gap > 1800 * 1_000_000), 1).otherwise(0)
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # persist: BOTH join sides derive from this session table — without
    # it the window/session pipeline (two window passes + an aggregation)
    # executes twice; with it the range join reads a materialized 95k-row
    # table twice (measured 4.3 s → ~1.5 s at sf0.1)
    sess = (
        ev.select("user_id", "ts", "event_id", is_new.alias("is_new"))
        .select("user_id", "ts", F.sum("is_new").over(run).alias("session_id"))
        .groupBy("user_id", "session_id")
        .agg(
            F.min(F.unix_micros("ts")).alias("st_us"),
            F.max(F.unix_micros("ts")).alias("en_us"),
        )
    )
    sess = _tracked_persist(sess)
    left = sess.select(
        F.col("user_id").alias("user_a"),
        F.col("st_us").cast("long").alias("a_st"),
        F.col("en_us").cast("long").alias("a_en"),
    )
    right = sess.select(
        F.col("user_id").alias("user_b"),
        F.col("st_us").cast("long").alias("b_st"),
        F.col("en_us").cast("long").alias("b_en"),
    )
    pairs = interval_overlap_join(
        left,
        right,
        "a_st",
        "a_en",
        "b_st",
        "b_en",
        # 15-min buckets ≈ p90–p99 session length: explode fan-out stays
        # ~1 row/session while per-bucket candidate density drops 4× vs
        # 1-hour buckets (measured at sf0.1)
        bucket_width=900 * 1_000_000,
        condition=F.col("user_a") < F.col("user_b"),
    )
    return pairs.groupBy("user_a", "user_b").agg(
        F.count(F.lit(1)).alias("n_overlaps"),
        (
            F.sum(F.least("a_en", "b_en") - F.greatest("a_st", "b_st"))
            .cast("double") / F.lit(1_000_000.0)
        ).alias("overlap_secs"),
    )


@query(
    "lineitem_dispersion",
    oracle=f"""
    SELECT l_returnflag,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS {DEC_SQL})) AS DOUBLE) AS qty_sum,
           sqrt((CAST(SUM(CAST(l_quantity AS {DEC_SQL}) * CAST(l_quantity AS {DEC_SQL})) AS DOUBLE)
                 - CAST(SUM(CAST(l_quantity AS {DEC_SQL})) AS DOUBLE)
                   * CAST(SUM(CAST(l_quantity AS {DEC_SQL})) AS DOUBLE) / COUNT(*))
                / (COUNT(*) - 1)) AS qty_stddev
    FROM lineitem GROUP BY l_returnflag
    """,
)
def lineitem_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-4/X-8 statistical aggregates computed deterministically: sample
    stddev from EXACT decimal moments (Σx, Σx²) + one fixed-order double
    formula — a native stddev_samp float-accumulates in engine-specific
    order and can't be hash-compared across engines. Same single-shuffle
    plan as any grouped agg; the moments combine associatively (partial
    aggregation safe)."""
    (li,) = _t(spark, sf_dir, "lineitem")
    q = dec("l_quantity")
    n = F.count(F.lit(1))
    s1 = F.sum(q).cast("double")
    s2 = F.sum(q * q).cast("double")
    return li.groupBy("l_returnflag").agg(
        n.alias("n"),
        s1.alias("qty_sum"),
        F.sqrt((s2 - s1 * s1 / n) / (n - 1)).alias("qty_stddev"),
    )

# ---------------------------------------------------------------------------
# Python UDTF (X-11): table-valued quality-rule expansion.
# ---------------------------------------------------------------------------


@query(
    "doc_quality_issues",
    oracle="""
    SELECT doc_id, 'too_short' AS issue, CAST(len(text) AS BIGINT) AS metric
    FROM documents WHERE len(text) < 60
    UNION ALL
    SELECT doc_id, 'few_tokens', CAST(len(string_split(text, ' ')) AS BIGINT)
    FROM documents WHERE len(string_split(text, ' ')) < 10
    UNION ALL
    SELECT doc_id, 'mentions_slow', CAST(len(regexp_extract_all(text, 'slow')) AS BIGINT)
    FROM documents WHERE contains(text, 'slow')
    """,
)
def doc_quality_issues(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-11 Python UDTF: a table-valued function emitting zero-or-more
    (issue, metric) rows per document — the lateral-join shape rule
    engines need, where per-row fan-out is data-dependent.

    Scale: UDTFs are the Python slow path (use built-in explode when the
    rule set is SQL-expressible — the oracle shows this one is); the
    point here is the *surface*. The UDTF runs Arrow-batched, narrow,
    and embarrassingly parallel — no shuffle; rule evaluation cost
    scales with input partitions."""
    from pyspark.sql.functions import udtf

    # useArrow: without it Spark plans BatchEvalPythonUDTF — the pickled
    # row-at-a-time path the rest of the repo bans (PLANSHAPE pins 0)
    @udtf(returnType="doc_id bigint, issue string, metric bigint", useArrow=True)
    class QualityIssues:
        def eval(self, doc_id, text):  # noqa: ANN001 - UDTF contract
            n = len(text)
            if n < 60:
                yield doc_id, "too_short", n
            toks = text.split(" ")
            if len(toks) < 10:
                yield doc_id, "few_tokens", len(toks)
            c = text.count("slow")
            if c > 0:
                yield doc_id, "mentions_slow", c

    load_tables(spark, sf_dir, tables=("documents",), register_views=True)
    spark.udtf.register("doc_quality_issues_udtf", QualityIssues)
    return spark.sql(
        "SELECT q.* FROM documents, LATERAL doc_quality_issues_udtf(doc_id, text) q"
    )

# ---------------------------------------------------------------------------
# Unpivot (wide→long melt) and IGNORE-NULLS forward fill.
# ---------------------------------------------------------------------------


@query(
    "lineitem_unpivot",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS val
    FROM lineitem WHERE l_orderkey < 200
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
    FROM lineitem WHERE l_orderkey < 200
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
    FROM lineitem WHERE l_orderkey < 200
    """,
)
def lineitem_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-25's inverse (wide→long melt) via the native unpivot operator —
    the normalization step feeding generic per-measure pipelines.

    Scale: unpivot is a narrow Expand (k output rows per input row, no
    shuffle); the key-range filter pushes into the parquet scan on both
    engines."""
    (li,) = _t(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_orderkey") < 200).unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_extendedprice", "l_discount"],
        variableColumnName="measure",
        valueColumnName="val",
    )


@query(
    "event_value_ffill",
    oracle="""
    SELECT event_id, user_id, ts,
           CASE WHEN event_type <> 'click' THEN value END AS raw_value,
           last_value(CASE WHEN event_type <> 'click' THEN value END IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value
    FROM events
    """,
)
def event_value_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-6 gap-fill / forward-fill: last non-NULL value per user ordered
    by time (last_value with ignorenulls over a running frame) — the
    time-series as-of-carry pattern (clicks carry the last non-click
    value forward).

    Scale: one shuffle on user_id + per-partition sort; the running
    frame is O(1) state per row. Values pass through unchanged (no
    float arithmetic), so cross-engine comparison is exact."""
    from pyspark.sql.window import Window

    (ev,) = _t(spark, sf_dir, "events")
    raw = F.when(F.col("event_type") != "click", F.col("value"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        raw.alias("raw_value"),
        F.last(raw, ignorenulls=True).over(w).alias("filled_value"),
    )


# ---------------------------------------------------------------------------
# TPC-H breadth completion (X-2/X-9): the remaining query shapes —
# Q3/Q8/Q9/Q10/Q12/Q16/Q17/Q19/Q20/Q21 and a Q11-style concentration
# query — adapted to the testdata star schema (no partsupp table; no
# l_shipmode/l_commitdate columns, so lateness is derived from
# l_shipdate vs o_orderdate and supply cost is proxied from
# p_retailprice).
# ---------------------------------------------------------------------------


@query(
    "shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           CAST(ROUND(SUM(CAST(l_extendedprice AS {DEC_SQL})
                          * (1 - CAST(l_discount AS {RATE_SQL}))), 2) AS DOUBLE) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1999-01-01'
      AND l_shipdate  > TIMESTAMP '1999-01-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: unshipped-revenue per order for one market
    segment, top-10 by revenue. The segment filter reduces customer
    BEFORE the join; l_orderkey is a unique tiebreak so the limit is
    deterministic across engines.

    Scale: customer (filtered) broadcasts; lineitem⋈orders shuffles on
    orderkey once and the groupBy reuses that partitioning (co-keyed,
    no second lineitem shuffle); orderBy().limit() compiles to
    TakeOrderedAndProject — per-partition top-10 + merge, no global
    sort."""
    customer, orders, li = _t(spark, sf_dir, "customer", "orders", "lineitem")
    notional_s = money_c("l_extendedprice") * (10000 - rate_bp("l_discount"))
    return (
        li.filter(F.col("l_shipdate") > "1999-01-01")
        .join(orders.filter(F.col("o_orderdate") < "1999-01-01"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(customer.filter(F.col("c_mktsegment") == "BUILDING")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(ssum(notional_s, 6).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@query(
    "returned_item_revenue",
    oracle=f"""
    SELECT c_custkey, c_name,
           CAST(ROUND(SUM(CAST(l_extendedprice AS {DEC_SQL})
                          * (1 - CAST(l_discount AS {RATE_SQL}))), 2) AS DOUBLE) AS revenue,
           c_acctbal, n_name
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1997-07-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def returned_item_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: customers who returned the most value in a
    half-year window, enriched with their nation.

    Scale: the returnflag + date filters push into both parquet scans;
    lineitem⋈orders is the one big shuffle; customer and nation
    broadcast onto the aggregate; deterministic top-20 via the unique
    c_custkey tiebreak."""
    customer, orders, li, nation = _t(
        spark, sf_dir, "customer", "orders", "lineitem", "nation"
    )
    notional_s = money_c("l_extendedprice") * (10000 - rate_bp("l_discount"))
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(
            orders.filter(
                (F.col("o_orderdate") >= "1997-01-01")
                & (F.col("o_orderdate") < "1997-07-01")
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(ssum(notional_s, 6).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@query(
    "late_shipment_priority",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY l_linestatus
    """,
)
def late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: late shipments (shipped > 60 days after order
    date — the schema has no commit/receipt dates) classified by order
    priority, counted per line status.

    Scale: lineitem's date-range filter pushes into the scan; the
    cross-table lateness predicate evaluates at the join; the final agg
    is 2-3 groups — map-side partial combine collapses it before one
    tiny shuffle."""
    orders, li = _t(spark, sf_dir, "orders", "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
    )


@query(
    "nation_market_share",
    oracle=f"""
    SELECT year(o_orderdate) AS yr,
           CAST(ROUND(SUM(CASE WHEN n1.n_name = 'NATION_3'
                               THEN CAST(l_extendedprice AS {DEC_SQL})
                                    * (1 - CAST(l_discount AS {RATE_SQL}))
                               ELSE 0 END), 2) AS DOUBLE)
           / CAST(ROUND(SUM(CAST(l_extendedprice AS {DEC_SQL})
                            * (1 - CAST(l_discount AS {RATE_SQL}))), 2) AS DOUBLE)
             AS mkt_share
    FROM lineitem
      JOIN part     ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      JOIN region   ON n2.n_regionkey = r_regionkey
    WHERE p_type = 'STANDARD' AND r_name = 'EUROPE'
    GROUP BY 1
    """,
)
def nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one supplier nation's share of STANDARD-part
    revenue among European customers, per order year — the 8-table
    join with a conditional-aggregate ratio.

    Scale: every dimension (part filtered by type, supplier, customer,
    nation×2, region) broadcasts; lineitem⋈orders is the single big
    shuffle; numerator and denominator accumulate in one pass as exact
    decimals, ratio is one double division."""
    li, part, supplier, orders, customer, nation, region = _t(
        spark, sf_dir, "lineitem", "part", "supplier", "orders", "customer",
        "nation", "region",
    )
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    cust_region = (
        customer.join(
            F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
        )
        .join(F.broadcast(region.filter(F.col("r_name") == "EUROPE")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    vol = dec("l_extendedprice") * (1 - rate("l_discount"))
    national = F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(
        F.lit(0).cast("decimal(1,0)")
    )
    return (
        li.join(F.broadcast(part.filter(F.col("p_type") == "STANDARD")),
                li.l_partkey == part.p_partkey)
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust_region), orders.o_custkey == F.col("c_custkey"))
        .groupBy(F.year("o_orderdate").cast("long").alias("yr"))
        .agg(
            (
                F.round(F.sum(national), 2).cast("double")
                / F.round(F.sum(vol), 2).cast("double")
            ).alias("mkt_share")
        )
    )


@query(
    "nation_product_profit",
    oracle=f"""
    SELECT n_name, year(l_shipdate) AS yr,
           CAST(ROUND(SUM(CAST(l_extendedprice AS {DEC_SQL})
                          * (1 - CAST(l_discount AS {RATE_SQL}))
                          - CAST(p_retailprice AS DECIMAL(12,4))
                            * CAST(l_quantity AS DECIMAL(12,4))
                            * CAST(0.10 AS DECIMAL(3,2))), 2) AS DOUBLE) AS profit
    FROM lineitem
      JOIN part     ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
    GROUP BY 1, 2
    """,
)
def nation_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit per supplier nation per ship year, with
    supply cost proxied as 10% of p_retailprice per unit (the schema
    has no partsupp.ps_supplycost).

    Scale: part/supplier/nation broadcast; one shuffle on the
    (nation, year) agg key. The per-row profit is computed exactly in
    scaled-long space (cents × basis points) — the measured ~2.4×
    fast path over per-row decimal multiplication — and only the SUM
    accumulates in overflow-proof decimal."""
    li, part, supplier, nation = _t(
        spark, sf_dir, "lineitem", "part", "supplier", "nation"
    )
    # revenue at 1e-6 dollars; 0.10*retail*qty: cents*cents = 1e-4 → ×10 = 1e-6
    profit_s = money_c("l_extendedprice") * (10000 - rate_bp("l_discount")) - money_c(
        "p_retailprice"
    ) * money_c("l_quantity") * 10
    # round-10: chunked long accumulation (hl_split; exact for negative
    # profits too — div truncates toward zero and % matches its sign, so
    # hi*1e8 + lo == v identically). Bit-identical; oracle unchanged.
    partials = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "n_name",
            F.year("l_shipdate").cast("long").alias("yr"),
            F.spark_partition_id().alias("__c"),
            *hl_split(profit_s, "pf"),
        )
        .groupBy("n_name", "yr", "__c")
        .agg(F.sum("__pf_h").alias("__pf_h"), F.sum("__pf_l").alias("__pf_l"))
    )
    return partials.groupBy("n_name", "yr").agg(
        ssum_total(hl_total("pf"), 6).alias("profit")
    )


@query(
    "part_supplier_breadth",
    oracle="""
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
      AND p_size IN (1, 5, 10, 15, 20, 25)
    GROUP BY 1, 2, 3
    """,
)
def part_supplier_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many distinct suppliers ship each
    (brand, type, size) combination — supplier relationships derived
    from lineitem since the schema has no partsupp table.

    Scale: the part-side filters broadcast a reduced dimension;
    COUNT(DISTINCT) expands to a two-level aggregate (dedup on
    group+suppkey, then count) — both shuffles are on low-skew
    composite keys."""
    part, li = _t(spark, sf_dir, "part", "lineitem")
    p = part.filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25)
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "small_quantity_revenue",
    oracle=f"""
    WITH brand_li AS (
      SELECT l_partkey, l_quantity, l_extendedprice
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_brand = 'Brand#2'
    ), pa AS (
      SELECT l_partkey AS pk,
             CAST(SUM(CAST(l_quantity AS {DEC_SQL})) AS DOUBLE) / COUNT(*) AS avg_qty
      FROM brand_li GROUP BY 1
    )
    SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS {DEC_SQL})), 2) AS DOUBLE) / 7.0
             AS avg_yearly,
           COUNT(*) AS n_small
    FROM brand_li JOIN pa ON l_partkey = pk
    WHERE l_quantity < CAST(0.2 AS DOUBLE) * avg_qty
    """,
)
def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue lost if small-quantity orders (below
    20% of the part's average order quantity) for one brand were not
    taken — correlated per-part average via aggregate + self-join.

    Scale: the brand filter broadcasts a tiny part set and shrinks
    lineitem before the per-part average; the avg table and the probe
    are co-keyed on l_partkey so the join reuses the agg's exchange;
    the threshold compare is double math, identical on both engines."""
    li, part = _t(spark, sf_dir, "lineitem", "part")
    brand_li = li.join(
        F.broadcast(part.filter(F.col("p_brand") == "Brand#2")),
        li.l_partkey == part.p_partkey,
    ).select("l_partkey", "l_quantity", "l_extendedprice")
    pa = brand_li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (dsum(dec("l_quantity")) / F.count(F.lit(1))).alias("avg_qty")
    )
    return (
        brand_li.join(pa, F.col("l_partkey") == F.col("pk"))
        .filter(F.col("l_quantity") < F.lit(0.2) * F.col("avg_qty"))
        .agg(
            (F.round(F.sum(dec("l_extendedprice")), 2).cast("double") / F.lit(7.0)).alias(
                "avg_yearly"
            ),
            F.count(F.lit(1)).alias("n_small"),
        )
    )


@query(
    "bracketed_promo_revenue",
    oracle=f"""
    SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS {DEC_SQL})
                          * (1 - CAST(l_discount AS {RATE_SQL}))), 2) AS DOUBLE)
             AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#2'  AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 1 AND 15)
       OR (p_brand = 'Brand#14' AND p_size BETWEEN 5 AND 25
           AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#25' AND p_size BETWEEN 20 AND 50
           AND l_quantity BETWEEN 25 AND 50)
    """,
)
def bracketed_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunction of per-bracket conjunctive
    predicates spanning both join sides, reduced to one global sum.

    Scale: Catalyst extracts the common join key and pushes the
    part-only disjuncts (brand ∨ brand ∨ brand) below the join; the
    mixed predicates evaluate at the probe. Single-row result — the
    agg collapses map-side."""
    li, part = _t(spark, sf_dir, "lineitem", "part")
    q = F.col("l_quantity")
    br = (
        ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 10) & q.between(1, 15))
        | ((F.col("p_brand") == "Brand#14") & F.col("p_size").between(5, 25) & q.between(10, 30))
        | ((F.col("p_brand") == "Brand#25") & F.col("p_size").between(20, 50) & q.between(25, 50))
    )
    notional_s = money_c("l_extendedprice") * (10000 - rate_bp("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(br)
        .agg(ssum(notional_s, 6).alias("revenue"), F.count(F.lit(1)).alias("n_lines"))
    )


@query(
    "promo_heavy_suppliers",
    oracle=f"""
    SELECT s_suppkey, s_name, s_acctbal
    FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_type = 'PROMO'
        AND l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'
      GROUP BY l_suppkey
      HAVING SUM(CAST(l_quantity AS {DEC_SQL})) > 400
    )
    """,
)
def promo_heavy_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who moved significant volume of
    PROMO parts in one year — grouped-HAVING subquery feeding a semi
    join (availability is lineitem-derived; the schema has no
    partsupp.ps_availqty).

    Scale: part (type-filtered) broadcasts; the HAVING agg shuffles
    the filtered lineitem on l_suppkey (100 suppliers — tiny); the
    surviving key set broadcasts back as a left-semi probe, so the
    supplier table is never shuffled."""
    supplier, li, part = _t(spark, sf_dir, "supplier", "lineitem", "part")
    heavy = (
        li.filter(
            (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
        )
        .join(F.broadcast(part.filter(F.col("p_type") == "PROMO")),
              li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum(dec("l_quantity")).alias("q"))
        .filter(F.col("q") > 400)
        .select("l_suppkey")
    )
    return supplier.join(
        F.broadcast(heavy), supplier.s_suppkey == F.col("l_suppkey"), "left_semi"
    ).select("s_suppkey", "s_name", "s_acctbal")


@query(
    "waiting_suppliers",
    oracle="""
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier
      JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY s_name
    """,
)
def waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: in finished multi-supplier orders, count the
    late lineitems of the *sole* late supplier ("late" = shipped > 60
    days after the order date; the schema has no commit/receipt
    dates). The EXISTS / NOT-EXISTS pair is re-expressed as one
    per-order aggregate: n_suppliers > 1 ∧ n_late_suppliers = 1 —
    every late row then belongs to the single late supplier.

    Scale: ONE pass over lineitem⋈orders computes the late flag; the
    per-order profile and the late-row probe are co-keyed on
    l_orderkey (exchange reuse instead of the reference pattern's two
    correlated rescans); supplier broadcasts onto the tiny tail."""
    supplier, li, orders = _t(spark, sf_dir, "supplier", "lineitem", "orders")
    flagged = (
        li.join(
            orders.filter(F.col("o_orderstatus") == "F").select(
                "o_orderkey", "o_orderdate"
            ),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .select(
            "l_orderkey",
            "l_suppkey",
            (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
            ).alias("is_late"),
        )
    )
    # round-10 reshape (same result, oracle unchanged): the original form
    # scanned lineitem twice (per-order profile + late-row probe), shuffled
    # the full probe side by l_orderkey for the semi join, and paid an
    # Expand-based double COUNT DISTINCT. Now ONE linear plan: aggregate to
    # the (order, supplier) level — n_supp is COUNT(*) over that level,
    # a supplier is late iff it has any late row, and the late-row count
    # rides the same rollup — then derive the per-order profile with
    # windows over the SAME orderkey clustering (no second exchange, no
    # self-join, no Expand) and keep the sole-late-supplier rows. One
    # lineitem scan, one data-sized exchange.
    from pyspark.sql.window import Window

    lvl1 = (
        flagged.repartition("l_orderkey")
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.sum(F.when(F.col("is_late"), 1).otherwise(0)).alias("n_late_rows"),
            F.max("is_late").alias("any_late"),
        )
    )
    per_order = Window.partitionBy("l_orderkey")
    qualified = lvl1.select(
        "l_suppkey",
        "n_late_rows",
        "any_late",
        F.count(F.lit(1)).over(per_order).alias("n_supp"),
        F.sum(F.col("any_late").cast("int")).over(per_order).alias("n_late"),
    ).filter(F.col("any_late") & (F.col("n_supp") > 1) & (F.col("n_late") == 1))
    return (
        qualified.join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.sum("n_late_rows").alias("numwait"))
    )


@query(
    "nation_value_concentration",
    oracle=f"""
    WITH v AS (
      SELECT n_name, SUM(CAST(l_extendedprice AS {DEC_SQL})
                         * (1 - CAST(l_discount AS {RATE_SQL}))) AS s
      FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
      GROUP BY n_name
    )
    SELECT n_name, CAST(ROUND(s, 2) AS DOUBLE) AS value
    FROM v
    WHERE CAST(ROUND(s, 2) AS DOUBLE)
          > (SELECT CAST(ROUND(SUM(s), 2) AS DOUBLE) FROM v) * CAST(0.04 AS DOUBLE)
    """,
)
def nation_value_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: supplier nations carrying an above-threshold
    share of total traded value — a scalar aggregate-over-aggregate in
    the HAVING position (value is lineitem-derived; no partsupp).

    Scale: one shuffle on the 25-nation key; the global total reuses
    the per-nation decimal sums (no second lineitem scan) and comes
    back as a 1-row broadcast; threshold compare is double math."""
    li, supplier, nation = _t(spark, sf_dir, "lineitem", "supplier", "nation")
    vol = dec("l_extendedprice") * (1 - rate("l_discount"))
    per_nation = (
        li.join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.sum(vol).alias("s"))
    )
    total = per_nation.agg(
        (F.round(F.sum("s"), 2).cast("double") * F.lit(0.04)).alias("threshold")
    )
    return (
        per_nation.select("n_name", F.round(F.col("s"), 2).cast("double").alias("value"))
        .join(F.broadcast(total))
        .filter(F.col("value") > F.col("threshold"))
        .select("n_name", "value")
    )


# ---------------------------------------------------------------------------
# Event-analytics breadth: first-touch funnel, weekly cohort retention,
# groupwise top-k — the product-analytics staples over the events table.
# ---------------------------------------------------------------------------


@query(
    "event_funnel",
    oracle="""
    WITH u AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'signup'   THEN ts END) AS t_signup,
             MIN(CASE WHEN event_type = 'view'     THEN ts END) AS t_view,
             MIN(CASE WHEN event_type = 'click'    THEN ts END) AS t_click,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      FROM events GROUP BY user_id
    )
    SELECT COUNT(t_signup) AS stage_signup,
           CAST(SUM(CASE WHEN t_signup < t_view THEN 1 ELSE 0 END) AS BIGINT)
             AS stage_view,
           CAST(SUM(CASE WHEN t_signup < t_view AND t_view < t_click
                         THEN 1 ELSE 0 END) AS BIGINT) AS stage_click,
           CAST(SUM(CASE WHEN t_signup < t_view AND t_view < t_click
                          AND t_click < t_purchase
                         THEN 1 ELSE 0 END) AS BIGINT) AS stage_purchase
    FROM u
    """,
)
def event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch funnel signup→view→click→purchase: a user advances a
    stage only if the first occurrence of each step strictly follows the
    first occurrence of the previous one. NULL stage times propagate
    through the comparisons to "did not reach" (non-ANSI NULL < x ⇒ NULL
    ⇒ counted 0) — identical in both engines.

    Scale: ONE pass over events (conditional MIN per stage inside a
    single hash agg on user_id), then a single-row rollup — no joins,
    no windows, no per-stage rescans."""
    (ev,) = _t(spark, sf_dir, "events")
    stage_min = {
        s: F.min(F.when(F.col("event_type") == s, F.col("ts"))).alias(f"t_{s}")
        for s in ("signup", "view", "click", "purchase")
    }
    u = ev.groupBy("user_id").agg(*stage_min.values())
    reached_view = F.col("t_signup") < F.col("t_view")
    reached_click = reached_view & (F.col("t_view") < F.col("t_click"))
    reached_purchase = reached_click & (F.col("t_click") < F.col("t_purchase"))
    flag = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("long")  # noqa: E731
    return u.agg(
        F.count("t_signup").alias("stage_signup"),
        flag(reached_view).alias("stage_view"),
        flag(reached_click).alias("stage_click"),
        flag(reached_purchase).alias("stage_purchase"),
    )


@query(
    "cohort_retention",
    oracle="""
    WITH f AS (
      SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
      FROM events GROUP BY user_id
    )
    SELECT cohort_week,
           CAST(datediff('day', cohort_week,
                         CAST(date_trunc('week', ts) AS DATE)) / 7 AS BIGINT)
             AS week_offset,
           COUNT(DISTINCT e.user_id) AS active_users
    FROM events e JOIN f ON e.user_id = f.user_id
    GROUP BY 1, 2
    """,
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users bucketed by first-activity week,
    counted as active per whole-week offset from their cohort week
    (offsets are exact multiples of 7 days, so the /7 is lossless in
    both engines).

    Scale: the cohort table and the activity probe shuffle on the SAME
    user_id key — co-keyed join, one exchange each; the retention agg
    groups on (cohort_week, offset), a few hundred cells, with the
    count-distinct expanding to the standard two-level dedup agg."""
    (ev,) = _t(spark, sf_dir, "events")
    f = ev.groupBy("user_id").agg(week_start(F.min("ts")).alias("cohort_week"))
    return (
        ev.join(f, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff(week_start(F.col("ts")), F.col("cohort_week")) / 7)
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("active_users"))
    )


@query(
    "top_suppliers_per_nation",
    oracle=f"""
    WITH rev AS (
      SELECT n_name, s_name,
             CAST(ROUND(SUM(CAST(l_extendedprice AS {DEC_SQL})
                            * (1 - CAST(l_discount AS {RATE_SQL}))), 2) AS DOUBLE)
               AS revenue
      FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
      GROUP BY 1, 2
    ), r AS (
      SELECT n_name, s_name, revenue,
             ROW_NUMBER() OVER (PARTITION BY n_name
                                ORDER BY revenue DESC, s_name) AS rk
      FROM rev
    )
    SELECT n_name, s_name, revenue, rk FROM r WHERE rk <= 3
    """,
)
def top_suppliers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Groupwise top-k (X-6): the top-3 revenue suppliers within every
    nation — rank-within-partition then filter, with the unique s_name
    as tiebreak so both engines pick identical rows.

    Scale: supplier/nation broadcast; one shuffle aggregates lineitem on
    the (nation, supplier) pair; the window repartitions only the tiny
    aggregate by nation. The rank filter prunes before anything leaves
    the exchange (WindowGroupLimit pushes the k=3 limit into the
    sort)."""
    from pyspark.sql.window import Window

    li, supplier, nation = _t(spark, sf_dir, "lineitem", "supplier", "nation")
    vol = dec("l_extendedprice") * (1 - rate("l_discount"))
    rev = (
        li.join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name", "s_name")
        .agg(F.round(F.sum(vol), 2).cast("double").alias("revenue"))
    )
    w = Window.partitionBy("n_name").orderBy(F.col("revenue").desc(), "s_name")
    return (
        rev.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 3)
    )


# ---------------------------------------------------------------------------
# Training-data preparation: deterministic splits and the composed
# filter→dedup→split corpus-prep pipeline over documents.
# ---------------------------------------------------------------------------


@query(
    "deterministic_split",
    oracle="""
    SELECT CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cd' THEN 'train'
                WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
                ELSE 'test' END AS split,
           COUNT(*) AS n_docs,
           CAST(SUM(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT)
             AS total_tokens
    FROM documents
    GROUP BY 1
    """,
)
def deterministic_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split keyed on the doc-id
    hash (string-threshold comparison on the first md5 hex byte — see
    ``text.split_assign``), with per-split document and token counts.

    Scale: the assignment is a narrow projection (one md5 of a ~10-byte
    string per row — not the document body); the rollup is a 3-group
    agg that collapses map-side. Adding workers or re-running never
    reshuffles documents between splits."""
    from etl_demo_spark.text import split_assign, token_count

    (docs,) = _t(spark, sf_dir, "documents")
    return (
        docs.groupBy(split_assign("doc_id").alias("split"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(token_count("text").cast("long")).alias("total_tokens"),
        )
    )


@query(
    "corpus_prep_pipeline",
    oracle="""
    WITH q AS (
      SELECT doc_id, lang,
             len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
             md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp,
             substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS hb
      FROM documents
      WHERE length(text) >= 150
    ), qq AS (
      SELECT * FROM q WHERE n_tokens >= 25
    ), keep AS (
      SELECT MIN(doc_id) AS doc_id FROM qq GROUP BY fp
    )
    SELECT lang,
           CASE WHEN hb < 'cd' THEN 'train'
                WHEN hb < 'e6' THEN 'val'
                ELSE 'test' END AS split,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
    FROM qq JOIN keep USING (doc_id)
    GROUP BY 1, 2
    """,
)
def corpus_prep_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed training-corpus preparation pipeline: length +
    token-count quality gates → exact dedup on the normalized-text
    fingerprint (deterministic min-id keeper) → hash-based 80/10/10
    split → per-(lang, split) document/token accounting. One query, all
    JVM-side built-ins.

    Scale: the quality gates prune before anything shuffles; dedup
    shuffles 16-byte fingerprints (never document bodies); the keeper
    set semi-joins back; the final rollup has ≲ languages × 3 groups.
    This is the shape of the real 100 TB job — the only full-width
    columns ever in flight are in the initial pruned scan."""
    from etl_demo_spark.text import fingerprint, split_assign, token_count

    (docs,) = _t(spark, sf_dir, "documents")
    q = (
        docs.filter(F.length("text") >= 150)
        .select(
            "doc_id",
            "lang",
            token_count("text").alias("n_tokens"),
            fingerprint("text").alias("fp"),
            split_assign("doc_id").alias("split"),
        )
        .filter(F.col("n_tokens") >= 25)
    )
    keep = q.groupBy("fp").agg(F.min("doc_id").alias("doc_id")).select("doc_id")
    return (
        q.join(keep, "doc_id", "left_semi")
        .groupBy("lang", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("n_tokens").cast("long")).alias("total_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# Slowly-changing-dimension history build and time-weighted averaging —
# the temporal-table patterns over the events stream.
# ---------------------------------------------------------------------------


@query(
    "scd2_purchase_history",
    oracle="""
    SELECT user_id, value AS attr_value, ts AS valid_from,
           lead(ts) OVER w AS valid_to,
           (lead(ts) OVER w IS NULL) AS is_current
    FROM events
    WHERE event_type = 'purchase'
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def scd2_purchase_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-type-2 history build: each purchase event versions the user's
    purchase-value attribute, valid from its own timestamp until the
    next purchase (open/NULL interval = current row). The (ts, event_id)
    ordering makes interval edges deterministic under timestamp ties.

    Scale: one shuffle on user_id + per-partition sort; lead() is O(1)
    state. This is the batch path of CDC compaction — the streaming
    twin is the applyInPandasWithState counter in streaming/."""
    from pyspark.sql.window import Window

    (ev,) = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("value").alias("attr_value"),
            F.col("ts").alias("valid_from"),
            nxt.alias("valid_to"),
            nxt.isNull().alias("is_current"),
        )
    )


@query(
    "user_value_twap",
    oracle="""
    WITH t AS (
      SELECT user_id,
             CAST(ROUND(value * 100, 0) AS BIGINT) AS cents,
             epoch_us(ts) AS tus,
             lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS nxt
      FROM events
    )
    SELECT user_id,
           CAST(SUM(cents * (nxt - tus)) AS DOUBLE)
             / CAST(SUM(nxt - tus) AS DOUBLE) / 100.0 AS twap
    FROM t WHERE nxt IS NOT NULL
    GROUP BY user_id
    """,
)
def user_value_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average of each user's event value: every value
    holds until the user's next event, weighted by exact microsecond
    duration. The weighted sum runs in integer space — cents × µs
    accumulated in an overflow-proof decimal — so both engines divide
    the identical exact integers (fixed-order double math at the end).

    Scale: one shuffle on user_id feeding BOTH the lead() window and
    the final agg (co-keyed — the groupBy reuses the window's
    partitioning, no second exchange)."""
    from pyspark.sql.window import Window

    (ev,) = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = ev.select(
        "user_id",
        money_c("value").alias("cents"),
        F.unix_micros("ts").alias("tus"),
        F.lead(F.unix_micros("ts")).over(w).alias("nxt"),
    )
    dur = F.col("nxt") - F.col("tus")
    return (
        t.filter(F.col("nxt").isNotNull())
        .groupBy("user_id")
        .agg(
            (
                F.sum((F.col("cents") * dur).cast("decimal(28,0)")).cast("double")
                / F.sum(dur.cast("decimal(28,0)")).cast("double")
                / F.lit(100.0)
            ).alias("twap")
        )
    )


@query(
    "price_qty_correlation",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n,
           (COUNT(*) * CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(8,2))
                                      * CAST(l_extendedprice AS DECIMAL(19,4))), 0) AS DOUBLE)
            - CAST(SUM(CAST(l_quantity AS DECIMAL(8,2))) AS DOUBLE)
              * CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,4))) AS DOUBLE))
           / sqrt(COUNT(*) * CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(8,2))
                                            * CAST(l_quantity AS DECIMAL(8,2))), 0) AS DOUBLE)
                  - CAST(SUM(CAST(l_quantity AS DECIMAL(8,2))) AS DOUBLE)
                    * CAST(SUM(CAST(l_quantity AS DECIMAL(8,2))) AS DOUBLE))
           / sqrt(COUNT(*) * CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(19,4))
                                            * CAST(l_extendedprice AS DECIMAL(19,4))), 0) AS DOUBLE)
                  - CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,4))) AS DOUBLE)
                    * CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,4))) AS DOUBLE))
             AS qty_price_corr
    FROM lineitem GROUP BY l_returnflag
    """,
)
def price_qty_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation per group from EXACT decimal co-moments
    (Σx, Σy, Σxy, Σx², Σy²) + one fixed-order double formula — native
    corr() float-accumulates in engine-specific order and cannot be
    hash-compared across engines (same trick as lineitem_dispersion).
    Second moments are ROUNDed to integer in exact decimal space before
    the double cast so the scaled value stays inside the 2^53
    correctly-rounded-cast bound through sf0.1 (larger SFs would round
    to coarser units — the same knob, one constant).

    Scale: the five moments ride one hash aggregation (associative —
    partial-agg safe); the formula runs post-agg on a handful of
    groups."""
    (li,) = _t(spark, sf_dir, "lineitem")
    # operand widths differ per engine but the VALUES are identical exact
    # decimals: the oracle uses DECIMAL(19,4) to force DuckDB's int128
    # multiply path, while Spark stays at (18,4)/(8,2) so p1+p2+1 <= 38
    # keeps its products exact (no precision-cap scale loss)
    x = F.col("l_quantity").cast("decimal(8,2)")
    y = dec("l_extendedprice")
    n = F.count(F.lit(1))
    sx = F.sum(x).cast("double")
    sy = F.sum(y).cast("double")
    sxy = F.round(F.sum(x * y), 0).cast("double")
    sxx = F.round(F.sum(x * x), 0).cast("double")
    syy = F.round(F.sum(y * y), 0).cast("double")
    corr = (n * sxy - sx * sy) / F.sqrt(n * sxx - sx * sx) / F.sqrt(n * syy - sy * sy)
    return li.groupBy("l_returnflag").agg(
        n.alias("n"), corr.alias("qty_price_corr")
    )


@query(
    "near_dup_clusters",
    oracle="""
    WITH RECURSIVE sh AS (
      SELECT doc_id,
             list_distinct(list_transform(generate_series(1, len(text) - 4),
                                          i -> substring(text, i, 5))) AS shingles
      FROM documents WHERE doc_id < 500
    ),
    edges AS (
      SELECT a.doc_id AS u, b.doc_id AS v
      FROM sh a JOIN sh b ON a.doc_id <> b.doc_id
      WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
            / (len(a.shingles) + len(b.shingles)
               - len(list_intersect(a.shingles, b.shingles))) >= 0.5
    ),
    reach(src, dst) AS (
      SELECT u, u FROM edges
      UNION
      SELECT r.src, e.v FROM reach r JOIN edges e ON r.dst = e.u
    ),
    comp AS (SELECT src AS id, MIN(dst) AS component FROM reach GROUP BY src)
    SELECT component, COUNT(*) AS cluster_size,
           array_to_string(list_sort(list(id)), ',') AS doc_ids
    FROM comp GROUP BY component HAVING COUNT(*) >= 2
    """,
)
def near_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-12 end-to-end dedup clustering: exact similarity pairs →
    connected components → cluster roster ``(component, cluster_size,
    doc_ids)``. The keeper policy is then "min doc_id per component" —
    exactly what a 100 TB near-dup pass feeds into its delete list.

    The pair stage here is the PROVABLY-COMPLETE prefix-filtered exact
    Jaccard join (`dedup.prefix_filter_jaccard_join`, itself oracled in
    `jaccard_join_prefix_filter`), which makes the WHOLE pipeline
    SQL-expressible: the DuckDB oracle recomputes the pairs brute-force
    and labels components with a recursive-CTE transitive closure
    (component = min reachable id — the same labeling
    `connected_components` converges to). The MinHash-LSH candidate
    generator drops into the identical dataflow when probabilistic
    recall is acceptable (`minhash_near_dup`); components don't care
    where the edges came from. The doc_id < 500 bound keeps the oracle's
    quadratic pair check constant across sfs; doc_ids is comma-joined so
    both engines hash the roster identically.

    Scale: the iterative stage runs on the PAIR graph only (similarity-
    bounded, ≪ corpus); rounds are co-keyed joins; the roster agg is one
    shuffle of (component, id) pairs."""
    from etl_demo_spark.dedup import connected_components, prefix_filter_jaccard_join

    (docs,) = _t(spark, sf_dir, "documents")
    sh = docs.filter(F.col("doc_id") < 500).select(
        F.col("doc_id").alias("id"),
        F.expr(
            # CASE guard: sequence(1, n) with n <= 0 DESCENDS ([1, 0, ...])
            # in Spark, minting phantom shingles for sub-5-char docs that
            # the oracle's empty generate_series would never produce
            "CASE WHEN length(text) >= 5 THEN"
            " array_distinct(transform(sequence(1, length(text) - 4),"
            " i -> xxhash64(substring(text, i, 5))))"
            " ELSE array() END"
        ).alias("shingles"),
    )
    pairs = prefix_filter_jaccard_join(sh, threshold=0.5)
    comp = connected_components(pairs)
    return (
        comp.groupBy("component")
        .agg(
            F.count(F.lit(1)).alias("cluster_size"),
            F.concat_ws(",", F.sort_array(F.collect_list("id"))).alias("doc_ids"),
        )
        .filter(F.col("cluster_size") >= 2)
        .select(F.col("component").cast("long").alias("component"), "cluster_size", "doc_ids")
    )


@query(
    "weekly_flag_full_outer",
    oracle=f"""
    WITH r AS (
      SELECT CAST(date_trunc('week', l_shipdate) AS DATE) AS wk,
             CAST(ROUND(SUM(CAST(l_extendedprice AS {DEC_SQL})
                            * (1 - CAST(l_discount AS {RATE_SQL}))), 2) AS DOUBLE)
               AS returned_rev
      FROM lineitem WHERE l_returnflag = 'R' GROUP BY 1
    ), a AS (
      SELECT CAST(date_trunc('week', l_shipdate) AS DATE) AS wk,
             CAST(ROUND(SUM(CAST(l_extendedprice AS {DEC_SQL})
                            * (1 - CAST(l_discount AS {RATE_SQL}))), 2) AS DOUBLE)
               AS accepted_rev
      FROM lineitem WHERE l_returnflag = 'A' GROUP BY 1
    )
    SELECT COALESCE(r.wk, a.wk) AS wk,
           COALESCE(returned_rev, 0.0) AS returned_rev,
           COALESCE(accepted_rev, 0.0) AS accepted_rev,
           (r.wk IS NULL OR a.wk IS NULL) AS one_sided
    FROM r FULL JOIN a ON r.wk = a.wk
    """,
)
def weekly_flag_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-2 FULL OUTER join (the last join type in the matrix — right
    outer is the mirror of the covered left): weekly returned-vs-accepted
    revenue series aligned on week, keeping weeks where either side is
    absent (coalesced to 0 with a one-sided marker).

    Scale: both inputs aggregate the SAME scan on the same week key, so
    the two branches share one exchange; the full join itself runs on
    the tiny weekly aggregates."""
    (li,) = _t(spark, sf_dir, "lineitem")
    notional_s = money_c("l_extendedprice") * (10000 - rate_bp("l_discount"))

    def side(flag: str, out: str) -> DataFrame:
        return (
            li.filter(F.col("l_returnflag") == flag)
            .groupBy(week_start("l_shipdate").alias("wk"))
            .agg(ssum(notional_s, 6).alias(out))
        )

    r = side("R", "returned_rev")
    a = side("A", "accepted_rev")
    return (
        r.withColumnRenamed("wk", "rwk")
        .join(a, F.col("rwk") == a.wk, "full_outer")
        .select(
            F.coalesce(F.col("rwk"), F.col("wk")).alias("wk"),
            F.coalesce("returned_rev", F.lit(0.0)).alias("returned_rev"),
            F.coalesce("accepted_rev", F.lit(0.0)).alias("accepted_rev"),
            (F.col("rwk").isNull() | F.col("wk").isNull()).alias("one_sided"),
        )
    )


@query(
    "stream_segment_purchases",
    oracle="""
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_start,
           c_mktsegment,
           COUNT(*) AS n_purchases,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
    FROM events JOIN customer ON user_id = c_custkey
    WHERE event_type = 'purchase'
    GROUP BY 1, 2
    """,
)
def stream_segment_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-10 stream-STATIC join, executed by the real streaming engine:
    purchase events enrich against the broadcast customer dimension per
    micro-batch (no join state), then tumble into hourly per-segment
    stats — differentially checked against the batch join + GROUP BY
    oracle.

    Scale: the static dimension broadcasts once per micro-batch; the
    windowed agg keeps watermark-bounded state only. This is the
    standard streaming-enrichment topology (dimension lookups without
    stream-stream state)."""
    from etl_demo_spark.streaming import enriched_purchase_stats, read_events_stream

    (customer,) = _t(spark, sf_dir, "customer")
    stream = read_events_stream(spark, sf_dir)
    return _run_stream(spark, enriched_purchase_stats(stream, customer))


@query(
    "media_frame_counts",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(ceil(octet_length(encode(text)) / 40.0) AS BIGINT) AS n_frames
    FROM documents
    WHERE octet_length(encode(text)) > 0
    """,
)
def media_frame_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal fan-out check: the frame-sampling mapInPandas (one
    blob → N frame rows, fake codec — ffmpeg stubbed) must emit exactly
    ceil(bytes/40) frames per media item; the oracle recomputes that
    count arithmetically from the blob length. Verifies the Python
    row-expansion plumbing, not just the codec.

    Scale: the sampler is a narrow Arrow-batched pass (no shuffle
    carries blobs); only (media_id, frame_idx) pairs reach the counting
    agg."""
    from etl_demo_spark.multimodal import documents_as_media, sample_video_frames

    (docs,) = _t(spark, sf_dir, "documents")
    media = documents_as_media(docs)
    frames = sample_video_frames(media, every_n=40, use_fake_codec=True)
    return frames.groupBy("media_id").agg(F.count(F.lit(1)).alias("n_frames"))


@query(
    "customer_upsert_merge",
    oracle="""
    WITH source AS (
      SELECT c_custkey, c_name, c_nationkey, c_acctbal + 10.0 AS c_acctbal,
             c_mktsegment
      FROM customer WHERE c_custkey % 10 = 0
      UNION ALL
      SELECT c_custkey + 10000000, 'NEW_' || CAST(c_custkey AS VARCHAR),
             c_nationkey, 0.0, c_mktsegment
      FROM customer WHERE c_custkey % 100 = 0
    )
    SELECT COALESCE(s.c_custkey, t.c_custkey) AS c_custkey,
           COALESCE(s.c_name, t.c_name) AS c_name,
           COALESCE(s.c_nationkey, t.c_nationkey) AS c_nationkey,
           COALESCE(s.c_acctbal, t.c_acctbal) AS c_acctbal,
           COALESCE(s.c_mktsegment, t.c_mktsegment) AS c_mktsegment
    FROM customer t FULL JOIN source s ON t.c_custkey = s.c_custkey
    """,
)
def customer_upsert_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC MERGE emulation (the guide's SCD1 upsert shape, no
    table-format dependence): a derived change set — every 10th customer
    with a balance adjustment plus synthetic new keys — merges into the
    customer table via ops.merge_upsert (full-outer join + column-wise
    source-wins coalesce).

    Scale: one co-keyed shuffle; with target and changes bucketed on the
    key the merge is exchange-free, and dynamic partition overwrite
    rewrites only touched partitions."""
    from etl_demo_spark.ops import merge_upsert

    (customer,) = _t(spark, sf_dir, "customer")
    updates = (
        customer.filter(F.col("c_custkey") % 10 == 0)
        .withColumn("c_acctbal", F.col("c_acctbal") + F.lit(10.0))
    )
    inserts = customer.filter(F.col("c_custkey") % 100 == 0).select(
        (F.col("c_custkey") + 10000000).alias("c_custkey"),
        F.concat(F.lit("NEW_"), F.col("c_custkey").cast("string")).alias("c_name"),
        "c_nationkey",
        F.lit(0.0).alias("c_acctbal"),
        "c_mktsegment",
    )
    source = updates.unionByName(inserts)
    return merge_upsert(customer, source, ["c_custkey"])


@query(
    "stratified_doc_sample",
    oracle="""
    SELECT lang, COUNT(*) AS n_sampled
    FROM documents
    WHERE (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'b4'), 1, 8)) AS BIGINT)
           + 0.5) / 4294967296.0
          < CASE lang WHEN 'en' THEN 0.5 WHEN 'de' THEN 1.0 WHEN 'fr' THEN 1.0
                      WHEN 'es' THEN 1.0 WHEN 'it' THEN 1.0 ELSE NULL END
    GROUP BY lang
    """,
)
def stratified_doc_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified Bernoulli sampling by per-language fraction — downsample
    the dominant language, keep the rest: the corpus rebalancing step of a
    training pipeline. Uses `ops.hash_bernoulli_sample` (sampleBy with the
    RNG swapped for an md5-derived uniform), so the sample is reproducible
    across runs, partitionings, AND engines — the DuckDB oracle recomputes
    the identical selection row-for-row. Spark's own ``df.sampleBy`` is the
    same plan shape but its per-partition RNG streams change with the
    physical split (its proportion behavior stays covered in unit tests).

    Scale: one narrow per-row filter (no shuffle); the per-language rates
    ride as a map literal. For exact-size strata use
    `ops.stratified_exact_sample` (`stratified_docs_exact`) instead."""
    from etl_demo_spark.ops import hash_bernoulli_sample

    (docs,) = _t(spark, sf_dir, "documents")
    fractions = {"en": 0.5, "de": 1.0, "fr": 1.0, "es": 1.0, "it": 1.0}
    sample = hash_bernoulli_sample(
        docs, fractions, strata_col="lang", id_col="doc_id", seed="b4"
    )
    return sample.groupBy("lang").agg(F.count(F.lit(1)).alias("n_sampled"))


@query(
    "rolling_active_users",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             list_distinct(list(user_id)) AS users
      FROM events GROUP BY 1
    )
    SELECT day,
           CAST(len(list_distinct(flatten(
             list(users) OVER (ORDER BY day RANGE BETWEEN INTERVAL 6 DAYS PRECEDING
                               AND CURRENT ROW)))) AS BIGINT) AS wau
    FROM daily
    """,
)
def rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct active users (WAU): Spark has no
    COUNT(DISTINCT) over a window frame, so the scalable composition is
    per-day distinct-user SETS (one hash agg) + a range-frame window that
    flattens and re-distincts the trailing week — state per row is the
    day-set list, bounded by 7 × daily actives, never the raw events.

    Scale: events aggregate once on day (map-side partial dedup via
    collect_set); the window runs over ~days rows. The same shape gives
    MAU with a 29-day frame; for billions of actives swap the sets for
    mergeable HLL sketches (see daily_user_sketches)."""
    from pyspark.sql.window import Window

    (ev,) = _t(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date(F.date_trunc("day", "ts")).alias("day")).agg(
        F.collect_set("user_id").alias("users")
    )
    w = (
        Window.orderBy(F.unix_date(F.col("day")))
        .rangeBetween(-6, Window.currentRow)
    )
    return daily.select(
        "day",
        F.size(F.array_distinct(F.flatten(F.collect_list("users").over(w))))
        .cast("long")
        .alias("wau"),
    )


@query(
    "daily_user_sketches",
    oracle="""
    SELECT CAST(date_trunc('week', ts) AS DATE) AS week,
           CAST(COUNT(DISTINCT CAST(date_trunc('day', ts) AS DATE)) AS BIGINT)
             AS n_days,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS within_bound
    FROM events
    GROUP BY 1
    """,
)
def daily_user_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch rollup: per-day HLL sketches of active users,
    unioned into one weekly distinct estimate per week — the lakehouse
    pattern where daily sketches are STORED and any date range's
    distinct count is answered by merging sketches instead of rescanning
    events.

    SELF-CERTIFYING oracle row: the merged estimate is
    implementation-specific (DataSketches HLL), so each week's row
    carries the EXACT weekly distinct count (hash-compared against
    DuckDB) plus ``within_bound`` — the merged sketch's relative error
    asserted ≤ 8% in-query (5× the lgK=12 default's ~1.6% rsd; a merge
    of daily sketches has the SAME bound as one sketch over the union,
    the mergeability property this query exists to exercise).

    Scale: sketch state is KBs per group regardless of cardinality; the
    weekly merge shuffles sketches, not user ids."""
    (ev,) = _t(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date(F.date_trunc("day", "ts")).alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sketch"),
    )
    weekly = daily.groupBy(
        F.to_date(F.date_trunc("week", "day")).alias("week")
    ).agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("approx_users"),
        F.count(F.lit(1)).alias("n_days"),
    )
    exact = ev.groupBy(F.to_date(F.date_trunc("week", "ts")).alias("week")).agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    return weekly.join(exact, "week").select(
        "week",
        "n_days",
        "exact_users",
        (
            F.abs(
                F.col("approx_users").cast("double")
                - F.col("exact_users").cast("double")
            )
            <= F.lit(0.08) * F.col("exact_users").cast("double")
        ).alias("within_bound"),
    )


@query(
    "stream_minute_dedup",
    oracle="""
    SELECT event_type, COUNT(*) AS n_unique
    FROM (SELECT DISTINCT user_id, event_type, date_trunc('minute', ts)
          FROM events)
    GROUP BY event_type
    """,
)
def stream_minute_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-10 streaming exact dedup on the real streaming engine:
    dropDuplicatesWithinWatermark on (user, type, minute) — state is
    bounded by the watermark horizon instead of growing forever — then a
    per-type count of surviving rows. The horizon exceeds the fixture's
    time span so no row is late-dropped and the result is exactly the
    batch DISTINCT (the oracle); in production the horizon is the
    dedup-correctness window you are willing to pay state for.

    Scale: dedup state is one entry per key within the horizon; the
    count aggregate rides the same micro-batch pipeline (complete
    mode)."""
    from etl_demo_spark.streaming import read_events_stream
    from etl_demo_spark.streaming.windows import dedup_stream

    stream = read_events_stream(spark, sf_dir).withColumn(
        "minute", F.date_trunc("minute", "ts")
    )
    deduped = dedup_stream(
        stream.select("user_id", "event_type", "minute", "ts"),
        ["user_id", "event_type", "minute"],
        watermark="40 days",
    )
    counts = deduped.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_unique"))
    return _run_stream(spark, counts)


@query(
    "min_cost_supplier",
    oracle=f"""
    WITH cost AS (
      SELECT l_partkey AS pk, l_suppkey AS sk,
             CAST(ROUND(SUM(CAST(l_extendedprice AS {DEC_SQL})), 2) AS DOUBLE)
             / CAST(SUM(CAST(l_quantity AS {DEC_SQL})) AS DOUBLE) AS unit_cost
      FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
      GROUP BY 1, 2
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_type, unit_cost
    FROM part
      JOIN cost     ON p_partkey = pk
      JOIN supplier ON sk = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_size = 15 AND p_type = 'STANDARD'
      AND unit_cost = (SELECT MIN(unit_cost) FROM cost c2 WHERE c2.pk = p_partkey)
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 10
    """,
)
def min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape — the last of the 22: for STANDARD size-15 parts,
    the European supplier offering the minimum unit cost (derived from
    lineitem since the schema has no partsupp), selected via the
    correlated per-part minimum. The (acctbal, nation, supplier, part)
    ordering with unique tiebreaks makes the top-10 deterministic.

    Scale: Catalyst decorrelates the MIN subquery into a per-part
    aggregate joined back on partkey — co-keyed with the cost table's
    own grouping, so the exchange is reused; supplier/nation/region and
    the filtered part set broadcast; the double equality compares the
    identical round-then-divide result on both sides."""
    li, supplier, nation, region, part = _t(
        spark, sf_dir, "lineitem", "supplier", "nation", "region", "part"
    )
    eu_supp = (
        supplier.join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region.filter(F.col("r_name") == "EUROPE")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    cost = (
        li.join(F.broadcast(eu_supp.select("s_suppkey")),
                li.l_suppkey == F.col("s_suppkey"))
        .groupBy(F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk"))
        .agg(
            (
                F.round(F.sum(dec("l_extendedprice")), 2).cast("double")
                / F.sum(dec("l_quantity")).cast("double")
            ).alias("unit_cost")
        )
    )
    best = cost.groupBy(F.col("pk").alias("bpk")).agg(F.min("unit_cost").alias("best_cost"))
    return (
        cost.join(best, (F.col("pk") == F.col("bpk")) & (F.col("unit_cost") == F.col("best_cost")))
        .join(
            F.broadcast(
                part.filter((F.col("p_size") == 15) & (F.col("p_type") == "STANDARD"))
            ),
            F.col("pk") == F.col("p_partkey"),
        )
        .join(F.broadcast(eu_supp), F.col("sk") == F.col("s_suppkey"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_type", "unit_cost")
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(10)
    )


@query(
    "similar_user_timeseries",
    oracle="""
    WITH daily AS (
      SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY 1, 2
    ), spine AS (
      SELECT DISTINCT day FROM daily
    ), users AS (
      SELECT DISTINCT user_id FROM daily WHERE user_id <> 1
    ), filled AS (
      SELECT u.user_id, s.day, COALESCE(d.cents, 0) AS cents
      FROM users u CROSS JOIN spine s
      LEFT JOIN daily d ON d.user_id = u.user_id AND d.day = s.day
    ), tgt AS (
      SELECT s.day, COALESCE(d.cents, 0) AS tcents
      FROM spine s LEFT JOIN daily d ON d.user_id = 1 AND d.day = s.day
    )
    SELECT f.user_id,
           CAST(SUM((f.cents - t.tcents) * (f.cents - t.tcents)) AS BIGINT) AS dist2
    FROM filled f JOIN tgt t ON f.day = t.day
    GROUP BY 1
    ORDER BY dist2, user_id
    LIMIT 5
    """,
)
def similar_user_timeseries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series similarity search (the EDBT'19/REPOSE problem shape,
    batch variant): each user's activity is a gap-filled daily-value
    series; find the 5 users closest to user 1 by squared Euclidean
    distance. All math is exact integers — daily sums in cents, integer
    differences squared — so both engines rank identical distances, and
    the unique user_id tiebreak pins the top-5.

    Scale: one shuffle aggregates events to (user, day); the date spine
    and the target series are tiny broadcasts; distances reduce per
    user with map-side combine, and the top-5 is TakeOrderedAndProject.
    For large k·users swap brute force for the LSH/IVF paths in vec.py
    over the same series-as-vector representation."""
    (ev,) = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).agg(F.sum(money_c("value")).alias("cents"))
    spine = daily.select("day").distinct()
    users = daily.select("user_id").distinct().filter(F.col("user_id") != 1)
    filled = (
        users.crossJoin(F.broadcast(spine))
        .join(daily, ["user_id", "day"], "left")
        .select("user_id", "day", F.coalesce("cents", F.lit(0)).alias("cents"))
    )
    tgt = (
        spine.join(
            daily.filter(F.col("user_id") == 1).select("day", F.col("cents").alias("tcents")),
            "day",
            "left",
        )
        .select("day", F.coalesce("tcents", F.lit(0)).alias("tcents"))
    )
    diff = F.col("cents") - F.col("tcents")
    return (
        filled.join(F.broadcast(tgt), "day")
        .groupBy("user_id")
        .agg(F.sum(diff * diff).cast("long").alias("dist2"))
        .orderBy("dist2", "user_id")
        .limit(5)
    )


@query(
    "null_safe_priority_join",
    oracle="""
    WITH o AS (
      SELECT o_orderkey, NULLIF(o_orderpriority, '4-NOT SPECIFIED') AS prio
      FROM orders
    ), dim AS (
      SELECT NULLIF(p, '4-NOT SPECIFIED') AS prio, w FROM (VALUES
        ('1-URGENT', 100), ('2-HIGH', 80), ('3-MEDIUM', 50),
        ('4-NOT SPECIFIED', 0), ('5-LOW', 10)) AS t(p, w)
    )
    SELECT COALESCE(o.prio, 'unspecified') AS priority,
           CAST(SUM(w) AS BIGINT) AS weight_total,
           COUNT(*) AS n_orders
    FROM o JOIN dim ON o.prio IS NOT DISTINCT FROM dim.prio
    GROUP BY 1
    """,
)
def null_safe_priority_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-2 null-safe equality join (<=> / IS NOT DISTINCT FROM): the
    unspecified priority maps to NULL on both sides and still matches —
    the dimension-with-a-NULL-member pattern a plain equi-join silently
    drops.

    Scale: the five-row dimension broadcasts; null-safe equality is
    hash-join-able (NULL hashes like any value under <=>), so no
    fallback to nested-loop."""
    (orders,) = _t(spark, sf_dir, "orders")
    o = orders.select(
        F.nullif(F.col("o_orderpriority"), F.lit("4-NOT SPECIFIED")).alias("prio")
    )
    dim = spark.createDataFrame(
        [("1-URGENT", 100), ("2-HIGH", 80), ("3-MEDIUM", 50),
         ("4-NOT SPECIFIED", 0), ("5-LOW", 10)],
        "p string, w int",
    ).select(F.nullif(F.col("p"), F.lit("4-NOT SPECIFIED")).alias("dprio"), "w")
    return (
        o.join(F.broadcast(dim), o.prio.eqNullSafe(F.col("dprio")))
        .groupBy(F.coalesce(F.col("prio"), F.lit("unspecified")).alias("priority"))
        .agg(
            F.sum("w").cast("long").alias("weight_total"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@query(
    "events_variant_props",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_total,
           CAST(MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_max,
           COUNT(*) AS n
    FROM events
    GROUP BY event_type
    """,
)
def events_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props via the VARIANT type (Spark 4): parse_json
    once into the binary variant encoding, then typed path extraction
    with variant_get — the modern alternative to per-access JSON string
    re-parsing (get_json_object re-parses the string for every path;
    a variant column parses once and serves many extractions).

    Scale: parse + extraction are narrow codegen'd stages; only the
    5-group aggregate shuffles. At rest, store the variant column in
    parquet and every downstream path access skips string parsing."""
    (ev,) = _t(spark, sf_dir, "events")
    v = ev.select("event_type", F.parse_json("props").alias("pv"))
    k = F.variant_get(F.col("pv"), "$.k", "bigint")
    return v.groupBy("event_type").agg(
        F.sum(k).cast("long").alias("k_total"),
        F.max(k).cast("long").alias("k_max"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "cogroup_click_purchase_stats",
    oracle="""
    WITH c AS (
      SELECT user_id, COUNT(*) AS n_clicks, MIN(ts) AS first_click
      FROM events WHERE event_type = 'click' GROUP BY user_id
    ), p AS (
      SELECT user_id, COUNT(*) AS n_purchases, MIN(ts) AS first_purchase
      FROM events WHERE event_type = 'purchase' GROUP BY user_id
    )
    SELECT COALESCE(c.user_id, p.user_id) AS user_id,
           CAST(COALESCE(n_clicks, 0) AS BIGINT) AS n_clicks,
           CAST(COALESCE(n_purchases, 0) AS BIGINT) AS n_purchases,
           (first_purchase > first_click) AS clicked_first
    FROM c FULL JOIN p ON c.user_id = p.user_id
    """,
)
def cogroup_click_purchase_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-11 COGROUPED applyInPandas: clicks and purchases arrive as two
    per-user pandas frames in one Python function — the API shape for
    per-key cross-frame logic (pd.merge_asof, per-entity
    reconciliation) that no single-input UDF covers. Here the function
    computes per-user counts and first-event ordering, checked against
    a two-CTE FULL JOIN oracle.

    Scale: both sides shuffle once on the cogroup key; each key's two
    frames stream through Arrow together (state = one user's events,
    never the corpus). Per-GROUP Python dispatch dominates when groups
    are tiny (measured ~3 ms/group here) — reach for cogroup only when
    the per-key logic genuinely needs pandas; this query's own oracle
    (FULL JOIN + conditional aggregates) is the JVM-side formulation to
    prefer when the logic is SQL-expressible."""
    import pandas as pd

    (ev,) = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts")
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts")

    def stats(key: tuple, left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        # a side with no rows for this key can arrive as a COLUMN-LESS
        # empty frame on some Arrow deserialization paths (observed when
        # the events scan runs under the nanos-as-long legacy conf that
        # the streaming queries enable) — guard on column presence, not
        # just length
        def first_ts(pdf: pd.DataFrame):
            return pdf["ts"].min() if ("ts" in pdf.columns and len(pdf)) else pd.NaT

        first_click = first_ts(left)
        first_purchase = first_ts(right)
        clicked_first = (
            None
            if pd.isna(first_click) or pd.isna(first_purchase)
            else bool(first_purchase > first_click)
        )
        return pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_clicks": [len(left)],
                "n_purchases": [len(right)],
                "clicked_first": [clicked_first],
            }
        )

    return (
        clicks.groupBy("user_id")
        .cogroup(purchases.groupBy("user_id"))
        .applyInPandas(
            stats,
            "user_id long, n_clicks long, n_purchases long, clicked_first boolean",
        )
    )


@query(
    "props_map_transform",
    oracle="""
    SELECT event_type,
           CAST(SUM(CASE WHEN 2 * CAST(json_extract(props, '$.k') AS BIGINT) >= 60
                         THEN 2 * CAST(json_extract(props, '$.k') AS BIGINT)
                    END) AS BIGINT) AS kept_total,
           CAST(SUM(CASE WHEN 2 * CAST(json_extract(props, '$.k') AS BIGINT) >= 60
                         THEN 1 ELSE 0 END) AS BIGINT) AS kept_entries,
           COUNT(*) AS n_events
    FROM events
    GROUP BY event_type
    """,
)
def props_map_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOTE: n_events counts EXPLODED map entries; it equals the event
    count only because the fixture's props maps are single-key (verified)
    — multi-key props would fan out. The sibling events_props_entries
    owns the multi-key shape.

    X-8 map higher-order functions: props parse into a real MapType,
    transform_values doubles every value and map_filter keeps entries
    over a threshold — all JVM-side map algebra — then the kept entries
    explode into per-type totals. The oracle computes the same values
    through flat JSON scalar SQL, verifying the map pipeline's results
    exactly.

    Scale: narrow map stages into one 5-group aggregate; maps never
    shuffle (only the exploded scalars do)."""
    (ev,) = _t(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,bigint>")
    doubled = F.transform_values(m, lambda k, v: v * 2)
    kept = F.map_filter(doubled, lambda k, v: v >= 60)
    ex = ev.select("event_type", F.explode_outer(kept).alias("k", "v"))
    return ex.groupBy("event_type").agg(
        F.sum("v").cast("long").alias("kept_total"),
        F.count("v").alias("kept_entries"),
        F.count(F.lit(1)).alias("n_events"),
    )


@query(
    "knn_self_join",
    oracle="""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
      FROM embeddings WHERE vec_id < 200
    ),
    scored AS (
      SELECT q.vec_id AS q_id, c.vec_id AS c_id,
             ROUND(list_dot_product(q.v, c.v)
                   / (sqrt(list_dot_product(q.v, q.v))
                      * sqrt(list_dot_product(c.v, c.v))), 6) AS cos_sim
      FROM e q CROSS JOIN e c
    )
    SELECT q_id, c_id, cos_sim, rank FROM (
      SELECT q_id, c_id, cos_sim,
             ROW_NUMBER() OVER (PARTITION BY q_id
                                ORDER BY cos_sim DESC, c_id ASC) AS rank
      FROM scored
    ) WHERE rank <= 3
    """,
)
def knn_self_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-13 batch k-NN join: every embedding queries the corpus at once
    (bucket equi-join + per-query exact re-rank + WindowGroupLimit) — the
    offline-retrieval shape where per-query search doesn't scale.

    Run here with the probe dial at EXHAUSTIVE (planes=0 → one bucket)
    over a bounded id window, which makes the result exact and therefore
    SQL-oracle-able: the DuckDB oracle recomputes the full k-NN by brute
    force (round-then-rank, c_id tiebreak — the operator's own ordering).
    The production setting (planes=8: candidates bounded by bucket
    collisions, hash join on a long key, never all-pairs) is the same
    topology with a different bucket key width; its recall and rank-1
    self-match are asserted in unit tests (tests/test_llm_ops.py).

    Scale: the WindowGroupLimit pushes k into the per-query window sort
    map-side, so the exchange carries ≤ k rows per query per task."""
    from etl_demo_spark.vec import knn_join

    (emb,) = _t(spark, sf_dir, "embeddings")
    bounded = emb.filter(F.col("vec_id") < 200)
    return knn_join(bounded, bounded, k=3, planes=0)


@query(
    "rollup_grouping_labels",
    oracle=f"""
    SELECT CASE WHEN GROUPING(o_orderstatus) = 1 THEN 'ALL'
                ELSE o_orderstatus END AS status,
           CASE WHEN GROUPING(o_orderpriority) = 1 THEN 'ALL'
                ELSE o_orderpriority END AS priority,
           CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS BIGINT)
             AS grouping_level,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS {DEC_SQL})) AS DOUBLE) AS total_value
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def rollup_grouping_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-5 ROLLUP with GROUPING() disambiguation: subtotal rows are
    labeled 'ALL' and carry a numeric grouping level — the function that
    distinguishes a real NULL group member from a rollup subtotal (the
    only reliable way once nullable group keys enter).

    Scale: rollup expands each row into level-count copies BEFORE the
    exchange (Expand operator), then one hash agg — same single-shuffle
    posture as a plain groupBy at level-count × input cost."""
    (orders,) = _t(spark, sf_dir, "orders")
    g_status = F.grouping("o_orderstatus")
    g_prio = F.grouping("o_orderpriority")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            (g_status * 2 + g_prio).cast("long").alias("grouping_level"),
            F.count(F.lit(1)).alias("n_orders"),
            dsum(dec("o_totalprice")).alias("total_value"),
        )
        .select(
            # grouping()/grouping_id() are only valid inside the rollup
            # aggregate, so labels derive from the materialized level bits
            F.when(F.col("grouping_level") >= 2, "ALL")
            .otherwise(F.col("o_orderstatus"))
            .alias("status"),
            F.when(F.col("grouping_level").bitwiseAND(1) == 1, "ALL")
            .otherwise(F.col("o_orderpriority"))
            .alias("priority"),
            "grouping_level",
            "n_orders",
            "total_value",
        )
    )


# ---------------------------------------------------------------------------
# Keyword retrieval (X-14): corpus term statistics + BM25 scoring — the
# index-free retrieval layer of a training-data pipeline.
# ---------------------------------------------------------------------------


@query(
    "corpus_term_stats",
    oracle="""
    WITH per_doc AS (
      SELECT doc_id, term, COUNT(*) AS tf
      FROM (SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS term
            FROM documents)
      GROUP BY doc_id, term
    )
    SELECT term,
           COUNT(*) AS doc_freq,
           CAST(SUM(tf) AS BIGINT) AS total_tf
    FROM per_doc
    GROUP BY term
    """,
)
def corpus_term_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-14 vocabulary mining: per-term document frequency + total term
    frequency, all-integer (exact across engines). The (doc, term)
    pre-aggregation collapses within-doc repeats before the per-term
    shuffle, so shuffle volume is bounded by distinct pairs, not tokens."""
    from etl_demo_spark.ops import spread_for_cpu
    from etl_demo_spark.text import term_stats

    (docs,) = _t(spark, sf_dir, "documents")
    return term_stats(spread_for_cpu(docs))


# Fixed keyword query for the BM25 corpus entry: terms present in the
# synthetic documents' vocabulary (TESTDATA.md).
BM25_TERMS = ["spark", "query", "join"]


@query(
    "bm25_keyword_search",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS l FROM documents
    ),
    dl AS (SELECT doc_id, CAST(len(l) AS BIGINT) AS dl FROM toks),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf
      FROM (SELECT doc_id, unnest(l) AS term FROM toks)
      WHERE term IN ('spark', 'query', 'join')
      GROUP BY doc_id, term
    ),
    dfreq AS (SELECT term, COUNT(*) AS dfq FROM tf GROUP BY term),
    stats AS (SELECT COUNT(*) AS n_docs,
                     CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
              FROM dl),
    contrib AS (
      SELECT tf.doc_id, tf.term,
             ln((s.n_docs - d.dfq + 0.5) / (d.dfq + 0.5) + 1.0)
               * (tf.tf * 2.2)
               / (tf.tf + 1.2 * (0.25 + 0.75 * (dl.dl / s.avgdl))) AS c
      FROM tf
      JOIN dfreq d ON tf.term = d.term
      JOIN dl ON tf.doc_id = dl.doc_id
      CROSS JOIN stats s
    )
    SELECT doc_id,
           ROUND(  COALESCE(MAX(CASE WHEN term = 'spark' THEN c END), 0.0)
                 + COALESCE(MAX(CASE WHEN term = 'query' THEN c END), 0.0)
                 + COALESCE(MAX(CASE WHEN term = 'join'  THEN c END), 0.0), 4)
             AS bm25
    FROM contrib
    GROUP BY doc_id
    ORDER BY bm25 DESC, doc_id ASC
    LIMIT 10
    """,
)
def bm25_keyword_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-14 retrieval: top-10 documents by Okapi BM25 (k1=1.2, b=0.75) for
    a fixed keyword query, no external index. The term filter precedes the
    (doc, term) shuffle — only query-term occurrences move; df and the
    global (N, avgdl) pair are broadcast. Scores are summed over terms in
    a FIXED column order (double addition is order-dependent) and rounded
    to 4dp: ln() is the one engine-dependent (1-ULP) primitive, and the
    rounding absorbs it (transcendental scores never sit on a 4dp half
    boundary — unlike money columns, where round-on-double is unsafe;
    see corpus.py module docstring)."""
    from etl_demo_spark.text import bm25_scores

    (docs,) = _t(spark, sf_dir, "documents")
    scored = bm25_scores(docs, BM25_TERMS)
    return (
        scored.select("doc_id", F.round("bm25", 4).alias("bm25"))
        .orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
        .limit(10)
    )


@query(
    "doc_lm_perplexity",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, lang, string_split_regex(trim(text), '\s+') AS t
      FROM documents
      WHERE len(string_split_regex(trim(text), '\s+')) >= 2
    ),
    tf AS (
      SELECT doc_id, lang, w1, w2, COUNT(*) AS tf
      FROM (
        SELECT doc_id, lang, t[i] AS w1, t[i+1] AS w2
        FROM toks, LATERAL unnest(generate_series(1, len(t) - 1)) AS u(i)
      )
      GROUP BY doc_id, lang, w1, w2
    ),
    cb AS (SELECT lang, w1, w2, SUM(tf) AS cb FROM tf GROUP BY lang, w1, w2),
    cu AS (SELECT lang, w1, SUM(tf) AS cu FROM tf GROUP BY lang, w1),
    vocab AS (
      SELECT lang, COUNT(DISTINCT tok) AS v
      FROM (SELECT lang, unnest(t) AS tok FROM toks)
      GROUP BY lang
    ),
    nb AS (
      SELECT doc_id AS nb_doc, CAST(len(t) - 1 AS BIGINT) AS n_bigrams
      FROM toks
    ),
    per_doc AS (
      SELECT tf.doc_id, any_value(tf.lang) AS lang,
             SUM(tf.tf * ln((cb.cb + 1.0) / (cu.cu + vocab.v))) AS slp
      FROM tf
      JOIN cb ON tf.lang = cb.lang AND tf.w1 = cb.w1 AND tf.w2 = cb.w2
      JOIN cu ON tf.lang = cu.lang AND tf.w1 = cu.w1
      JOIN vocab ON tf.lang = vocab.lang
      GROUP BY tf.doc_id
    )
    SELECT p.doc_id, p.lang, nb.n_bigrams,
           ROUND(-p.slp / (nb.n_bigrams * ln(2)), 4) AS bits_per_bigram
    FROM per_doc p JOIN nb ON p.doc_id = nb.nb_doc
    ORDER BY p.doc_id
    """,
)
def doc_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-14 corpus-LM quality signal: bits-per-bigram of every document
    under an add-one-smoothed bigram model trained per language on the
    corpus itself — the CCNet/Gopher-family perplexity filter, fully
    relational (no LM library): high-bits documents are the boilerplate /
    noise candidates a training pipeline drops or down-weights.

    Plan shape (text.bigram_lm_bits): one (doc, bigram) partial-agg
    shuffle, corpus counts as groupBy + equi-joins back onto the tf table
    (AQE skew split carves stopword-headed keys — a window over
    (lang, w1) would pile docs×fanout rows on one task), vocabulary-size
    broadcast, per-doc sum co-keyed with the size−1 length projection.
    ln() is 1-ULP engine-dependent and the double sum order-dependent;
    ROUND(…, 4) absorbs both (BM25 convention)."""
    from etl_demo_spark.text import bigram_lm_bits

    (docs,) = _t(spark, sf_dir, "documents")
    scored = bigram_lm_bits(docs)
    return scored.select(
        "doc_id",
        "lang",
        "n_bigrams",
        F.round("bits_per_bigram", 4).alias("bits_per_bigram"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Declarative data-quality expectations (quality.py) — the reference's
# inline diagnostics (O-2/O-3/O-5 screens) generalized to a one-pass
# constraint suite.
# ---------------------------------------------------------------------------


@query(
    "lineitem_quality_report",
    oracle="""
    WITH agg AS (
      SELECT COUNT(*) AS total,
             CAST(SUM(CASE WHEN l_orderkey IS NOT NULL THEN 0 ELSE 1 END) AS BIGINT) AS v0,
             CAST(SUM(CASE WHEN l_quantity >= 1 AND l_quantity <= 50 THEN 0 ELSE 1 END) AS BIGINT) AS v1,
             CAST(SUM(CASE WHEN l_discount >= 0.0 AND l_discount <= 0.1 THEN 0 ELSE 1 END) AS BIGINT) AS v2,
             CAST(SUM(CASE WHEN l_returnflag IN ('A','N','R') THEN 0 ELSE 1 END) AS BIGINT) AS v3,
             CAST(SUM(CASE WHEN l_extendedprice > 0.0 THEN 0 ELSE 1 END) AS BIGINT) AS v4,
             CAST(COUNT(*) - COUNT(DISTINCT (l_orderkey, l_linenumber)) AS BIGINT) AS v5
      FROM lineitem
    ),
    fk AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS v
      FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE l.l_orderkey IS NOT NULL AND o.o_orderkey IS NULL
    )
    SELECT r.check, r.violations, CAST(a.total AS BIGINT) AS total,
           r.violations = 0 AS passed
    FROM agg a, fk,
    LATERAL (VALUES ('not_null(l_orderkey)', a.v0),
                    ('in_range(l_quantity)', a.v1),
                    ('in_range(l_discount)', a.v2),
                    ('in_domain(l_returnflag)', a.v3),
                    ('positive_price', a.v4),
                    ('unique_key(l_orderkey,l_linenumber)', a.v5),
                    ('references(l_orderkey)', fk.v)) AS r("check", violations)
    """,
)
def lineitem_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass declarative expectation suite over lineitem (quality.py
    run_suite): five row-level constraints, the composite-key uniqueness
    check, AND the referential constraint against orders all share a
    single scan of lineitem — the FK rides a row-preserving join against
    the distinct order keys instead of a second-scan anti-join, and the
    near-unique distinct count runs as repartition-by-key + two-level
    aggregation rather than a row-count hash map inside the scan task
    (round 10; guide §2.4/§3.1). All counters are integers — exact across
    engines, and identical to the run_checks ∪ references formulation."""
    from etl_demo_spark import quality as Q

    lineitem, orders = _t(spark, sf_dir, "lineitem", "orders")
    return Q.run_suite(
        lineitem,
        [
            Q.not_null("l_orderkey"),
            Q.in_range("l_quantity", 1, 50),
            Q.in_range("l_discount", 0.0, 0.1),
            Q.in_domain("l_returnflag", ("A", "N", "R")),
            Q.satisfies("positive_price", F.col("l_extendedprice") > 0.0),
        ],
        unique_keys=[["l_orderkey", "l_linenumber"]],
        references=[("l_orderkey", orders, "o_orderkey")],
    )


def interpolate_gaps(ev: DataFrame) -> DataFrame:
    """The interpolation dataflow of event_value_interpolation, reusable on
    any (event_id, ts, user_id, event_type, value) frame — unit tests run
    it on hand-computable fixtures so they exercise THIS expression, not a
    private copy."""
    from pyspark.sql.window import Window

    raw = F.when(F.col("event_type") != "click", F.col("value"))
    back = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    m = ev.select(
        "event_id", "user_id", "ts",
        F.unix_micros("ts").alias("tsu"),
        raw.alias("raw_value"),
    )
    nn = F.col("raw_value").isNotNull()
    b = m.select(
        "event_id", "user_id", "ts", "tsu", "raw_value",
        F.last(F.when(nn, F.col("raw_value")), ignorenulls=True).over(back).alias("pv"),
        F.last(F.when(nn, F.col("tsu")), ignorenulls=True).over(back).alias("pt"),
        F.first(F.when(nn, F.col("raw_value")), ignorenulls=True).over(fwd).alias("nv"),
        F.first(F.when(nn, F.col("tsu")), ignorenulls=True).over(fwd).alias("nt"),
    )
    interp = (
        F.when(nn, F.col("raw_value"))
        .when(
            F.col("pv").isNotNull() & F.col("nv").isNotNull() & (F.col("nt") > F.col("pt")),
            F.col("pv")
            + (F.col("nv") - F.col("pv"))
            * ((F.col("tsu") - F.col("pt")) / (F.col("nt") - F.col("pt"))),
        )
    )
    return b.select("event_id", "user_id", "ts", "raw_value", interp.alias("interp_value"))


@query(
    "event_value_interpolation",
    oracle="""
    WITH masked AS (
      SELECT event_id, user_id, ts, epoch_us(ts) AS tsu,
             CASE WHEN event_type <> 'click' THEN value END AS raw_value
      FROM events
    ),
    bounded AS (
      SELECT event_id, user_id, ts, tsu, raw_value,
             last_value(CASE WHEN raw_value IS NOT NULL THEN raw_value END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
             last_value(CASE WHEN raw_value IS NOT NULL THEN tsu END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
             first_value(CASE WHEN raw_value IS NOT NULL THEN raw_value END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
             first_value(CASE WHEN raw_value IS NOT NULL THEN tsu END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
      FROM masked
    )
    SELECT event_id, user_id, ts, raw_value,
           CASE WHEN raw_value IS NOT NULL THEN raw_value
                WHEN pv IS NOT NULL AND nv IS NOT NULL AND nt > pt
                  THEN pv + (nv - pv) * ((tsu - pt) / (nt - pt))
           END AS interp_value
    FROM bounded
    """,
)
def event_value_interpolation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series linear interpolation of gaps (X-6): click rows are
    value gaps; each gap takes prev + (next − prev) · elapsed-fraction
    between its non-gap neighbors per user. Leading/trailing gaps (no
    neighbor on one side) and zero-width intervals stay NULL — spelled
    as explicit CASE arms so both engines agree instead of relying on
    divide-by-zero semantics (non-ANSI Spark → NULL, DuckDB → ±inf).

    Determinism: the fraction is a single exactly-rounded long/long
    division in [0,1]; the interpolation is fixed-order +,−,× on top —
    bit-identical across engines (no transcendentals).

    Scale: one shuffle on user_id, one per-partition sort serving all
    four running aggregates; O(1) window state per row."""
    (ev,) = _t(spark, sf_dir, "events")
    return interpolate_gaps(ev)



@query(
    "lateral_top_orders_per_customer",
    oracle="""
    SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
    FROM customer c, LATERAL (
      SELECT o_orderkey, o_totalprice
      FROM orders o
      WHERE o.o_custkey = c.c_custkey
      ORDER BY o_totalprice DESC, o_orderkey ASC
      LIMIT 2
    ) t
    """,
)
def lateral_top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-2 correlated LATERAL join (SQL surface): each customer's top-2
    orders by price via a per-row correlated subquery with ORDER BY +
    LIMIT. Catalyst decorrelates this into a ranked window over a single
    orders shuffle (same physical plan family as top_suppliers_per_nation)
    rather than executing the subquery per customer row — the plan to
    check at scale (no nested-loop re-execution). Prices pass through
    unchanged — exact comparison."""
    load_tables(spark, sf_dir, tables=("customer", "orders"), register_views=True)
    return spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM customer c JOIN LATERAL (
          SELECT o_orderkey, o_totalprice
          FROM orders o
          WHERE o.o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey ASC
          LIMIT 2
        ) t
        """
    )


@query(
    "embedding_kmeans_profile",
    oracle="""
    WITH RECURSIVE qlong AS (
      SELECT vec_id, i,
             CAST(round(CAST(embedding[i + 1] AS DOUBLE) * 1000) AS BIGINT) AS x
      FROM embeddings, LATERAL unnest(generate_series(0, len(embedding) - 1)) AS t(i)
    ),
    cent(it, c, i, cx) AS (
      SELECT 0, CAST(vec_id AS INT), i, x FROM qlong WHERE vec_id < 8
      UNION ALL
      SELECT it + 1, cl, i, CAST(FLOOR(CAST(sx AS DOUBLE) / nv) AS BIGINT)
      FROM (
        SELECT a.it, a.cl, q.i, SUM(q.x) AS sx, COUNT(*) AS nv
        FROM (
          SELECT it, vec_id, cl FROM (
            SELECT d.it, d.vec_id, d.c AS cl,
                   ROW_NUMBER() OVER (PARTITION BY d.it, d.vec_id
                                      ORDER BY d.dist, d.c) AS rn
            FROM (
              SELECT cent.it, q2.vec_id, cent.c,
                     SUM((q2.x - cent.cx) * (q2.x - cent.cx)) AS dist
              FROM cent JOIN qlong q2 USING (i)
              WHERE cent.it < 3
              GROUP BY cent.it, q2.vec_id, cent.c
            ) d
          ) WHERE rn = 1
        ) a
        JOIN qlong q ON q.vec_id = a.vec_id
        GROUP BY a.it, a.cl, q.i
      )
    ),
    final_assign AS (
      SELECT vec_id, cl FROM (
        SELECT d.vec_id, d.c AS cl,
               ROW_NUMBER() OVER (PARTITION BY d.vec_id ORDER BY d.dist, d.c) AS rn
        FROM (
          SELECT q2.vec_id, cent.c,
                 SUM((q2.x - cent.cx) * (q2.x - cent.cx)) AS dist
          FROM cent JOIN qlong q2 USING (i)
          WHERE cent.it = 3
          GROUP BY q2.vec_id, cent.c
        ) d
      ) WHERE rn = 1
    ),
    sizes AS (SELECT cl, COUNT(*) AS n_vecs FROM final_assign GROUP BY cl),
    l1 AS (SELECT c, SUM(ABS(cx)) AS cent_l1 FROM cent WHERE it = 3 GROUP BY c)
    SELECT l1.c AS cluster, COALESCE(sizes.n_vecs, 0) AS n_vecs,
           CAST(l1.cent_l1 AS BIGINT) AS cent_l1
    FROM l1 LEFT JOIN sizes ON sizes.cl = l1.c
    """,
)
def embedding_kmeans_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-13 clustering, EXACTLY oracled through an iterative fixpoint:
    distributed Lloyd's k-means in integer arithmetic
    (vec.py:kmeans_fit_exact — vectors quantized to round(x·1000) int64,
    seeds = vec_id < k, exact int64 distances with ties to the smallest
    cluster, floor-division centroid updates), profiled as cluster sizes
    + per-centroid L1 mass. Every step is order-free integer math, so a
    DuckDB RECURSIVE CTE replays the full 3-iteration fixpoint and the
    hash must match bit-for-bit — the operator class ("iterative
    algorithm, not SQL-expressible") the rows-only bucket existed for,
    now held to the same standard as everything else. It also proves the
    engine property that matters at 100 TB: the fit is bit-identical
    under any partitioning or AQE re-plan (float means are not — see
    test_llm_ops.py partition-invariance test).

    Per-iteration plan: one narrow Arrow-batched assignment + one k×dim
    partial-aggregated exchange; driver state O(k·dim). Float
    ``kmeans_fit`` stays the in-engine speed path (IVF build)."""
    from etl_demo_spark.vec import (
        _kmeans_assign_exact_udf,
        kmeans_fit_exact,
        quantize_vec_expr,
    )

    (emb,) = _t(spark, sf_dir, "embeddings")
    centroids = kmeans_fit_exact(emb, k=8, n_iter=3)
    assign = _kmeans_assign_exact_udf(centroids)
    sizes = (
        emb.select(assign(quantize_vec_expr("embedding")).alias("cluster"))
        .groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("n_vecs"))
    )
    l1 = spark.createDataFrame(
        [(c, sum(abs(v) for v in vec)) for c, vec in enumerate(centroids)],
        "cluster int, cent_l1 long",
    )
    return (
        l1.join(F.broadcast(sizes), "cluster", "left")
        .select("cluster", F.coalesce("n_vecs", F.lit(0)).alias("n_vecs"), "cent_l1")
    )


@query(
    "ann_topk_pq",
    oracle="""
    WITH RECURSIVE qlong AS (
      SELECT vec_id, i, i // 16 AS s,
             CAST(round(CAST(embedding[i + 1] AS DOUBLE) * 1000) AS BIGINT) AS x
      FROM embeddings, LATERAL unnest(generate_series(0, len(embedding) - 1)) AS t(i)
    ),
    cent(it, s, c, i, cx) AS (
      SELECT 0, i // 16, CAST(vec_id AS INT), i, x FROM qlong WHERE vec_id < 8
      UNION ALL
      SELECT it + 1, s, cl, i, CAST(FLOOR(CAST(sx AS DOUBLE) / nv) AS BIGINT)
      FROM (
        SELECT a.it, a.s, a.cl, q.i, SUM(q.x) AS sx, COUNT(*) AS nv
        FROM (
          SELECT it, s, vec_id, cl FROM (
            SELECT d.it, d.s, d.vec_id, d.c AS cl,
                   ROW_NUMBER() OVER (PARTITION BY d.it, d.s, d.vec_id
                                      ORDER BY d.dist, d.c) AS rn
            FROM (
              SELECT cent.it, cent.s, q2.vec_id, cent.c,
                     SUM((q2.x - cent.cx) * (q2.x - cent.cx)) AS dist
              FROM cent JOIN qlong q2 USING (i)
              WHERE cent.it < 3
              GROUP BY cent.it, cent.s, q2.vec_id, cent.c
            ) d
          ) WHERE rn = 1
        ) a
        JOIN qlong q ON q.vec_id = a.vec_id AND q.s = a.s
        GROUP BY a.it, a.s, a.cl, q.i
      )
    ),
    codes AS (
      SELECT vec_id, s, cl FROM (
        SELECT d.vec_id, d.s, d.c AS cl,
               ROW_NUMBER() OVER (PARTITION BY d.vec_id, d.s
                                  ORDER BY d.dist, d.c) AS rn
        FROM (
          SELECT q2.vec_id, cent.s, cent.c,
                 SUM((q2.x - cent.cx) * (q2.x - cent.cx)) AS dist
          FROM cent JOIN qlong q2 USING (i)
          WHERE cent.it = 3
          GROUP BY q2.vec_id, cent.s, cent.c
        ) d
      ) WHERE rn = 1
    ),
    dt AS (
      SELECT cent.s, cent.c, SUM((q.x - cent.cx) * (q.x - cent.cx)) AS dist
      FROM cent JOIN qlong q USING (i)
      WHERE cent.it = 3 AND q.vec_id = 0
      GROUP BY cent.s, cent.c
    ),
    scored AS (
      SELECT codes.vec_id, CAST(SUM(dt.dist) AS BIGINT) AS pq_dist
      FROM codes JOIN dt ON dt.s = codes.s AND dt.c = codes.cl
      GROUP BY codes.vec_id
    )
    SELECT CAST(vec_id AS BIGINT) AS vec_id, pq_dist
    FROM scored ORDER BY pq_dist, vec_id LIMIT 10
    """,
)
def ann_topk_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-13 PRODUCT QUANTIZATION top-k (Jégou et al. 2011), EXACTLY
    oracled: 4 subspaces × 16 dims each train 8-centroid codebooks by
    integer-exact Lloyd's (`vec.pq_fit_exact`), vectors compress to 4
    codes, and the query ranks by the ADC table — the sum of per-subspace
    exact int64 distances to the coded centroids. A DuckDB RECURSIVE CTE
    replays ALL FOUR codebook trainings in one recursion keyed by
    (iteration, subspace, code, dim), then the encoding, the distance
    table, and the ranking — hash equality end to end, extending the
    `embedding_kmeans_profile` fixpoint-oracle pattern to the
    multi-codebook case.

    Scale: PQ is the memory tier below int8 SQ — m bytes per vector
    instead of dim (64-dim float32 → 4 bytes, 64×), which is what lets
    a 100 TB corpus's ANN index live in cluster RAM; scan cost is one
    table lookup per subspace per row (memory-bandwidth bound). Training
    is one narrow Arrow-batched assignment + one (m·ksub)-group
    aggregate per iteration, all subspaces together."""
    from etl_demo_spark.vec import pq_topk

    (emb,) = _t(spark, sf_dir, "embeddings")
    return pq_topk(emb, k=10, query_id=0, m=4, ksub=8, n_iter=3)


@query(
    "ann_topk_ivfpq",
    oracle="""
    WITH RECURSIVE qlong AS (
      SELECT vec_id, i,
             CAST(round(CAST(embedding[i + 1] AS DOUBLE) * 1000) AS BIGINT) AS x
      FROM embeddings, LATERAL unnest(generate_series(0, len(embedding) - 1)) AS t(i)
    ),
    ccent(it, c, i, cx) AS (
      SELECT 0, CAST(vec_id AS INT), i, x FROM qlong WHERE vec_id < 8
      UNION ALL
      SELECT it + 1, cl, i, CAST(FLOOR(CAST(sx AS DOUBLE) / nv) AS BIGINT)
      FROM (
        SELECT a.it, a.cl, q.i, SUM(q.x) AS sx, COUNT(*) AS nv
        FROM (
          SELECT it, vec_id, cl FROM (
            SELECT d.it, d.vec_id, d.c AS cl,
                   ROW_NUMBER() OVER (PARTITION BY d.it, d.vec_id
                                      ORDER BY d.dist, d.c) AS rn
            FROM (
              SELECT ccent.it, q2.vec_id, ccent.c,
                     SUM((q2.x - ccent.cx) * (q2.x - ccent.cx)) AS dist
              FROM ccent JOIN qlong q2 USING (i)
              WHERE ccent.it < 3
              GROUP BY ccent.it, q2.vec_id, ccent.c
            ) d
          ) WHERE rn = 1
        ) a
        JOIN qlong q ON q.vec_id = a.vec_id
        GROUP BY a.it, a.cl, q.i
      )
    ),
    cells AS (
      SELECT vec_id, cl FROM (
        SELECT d.vec_id, d.c AS cl,
               ROW_NUMBER() OVER (PARTITION BY d.vec_id ORDER BY d.dist, d.c) AS rn
        FROM (
          SELECT q2.vec_id, ccent.c,
                 SUM((q2.x - ccent.cx) * (q2.x - ccent.cx)) AS dist
          FROM ccent JOIN qlong q2 USING (i)
          WHERE ccent.it = 3
          GROUP BY q2.vec_id, ccent.c
        ) d
      ) WHERE rn = 1
    ),
    resid AS (
      SELECT q.vec_id, cells.cl AS cell, q.i, q.x - cc.cx AS x
      FROM qlong q
      JOIN cells ON cells.vec_id = q.vec_id
      JOIN ccent cc ON cc.it = 3 AND cc.c = cells.cl AND cc.i = q.i
    ),
    pcent(it, s, c, i, cx) AS (
      SELECT 0, i // 16, CAST(vec_id AS INT), i, x FROM resid WHERE vec_id < 8
      UNION ALL
      SELECT it + 1, s, cl, i, CAST(FLOOR(CAST(sx AS DOUBLE) / nv) AS BIGINT)
      FROM (
        SELECT a.it, a.s, a.cl, r.i, SUM(r.x) AS sx, COUNT(*) AS nv
        FROM (
          SELECT it, s, vec_id, cl FROM (
            SELECT d.it, d.s, d.vec_id, d.c AS cl,
                   ROW_NUMBER() OVER (PARTITION BY d.it, d.s, d.vec_id
                                      ORDER BY d.dist, d.c) AS rn
            FROM (
              SELECT pcent.it, pcent.s, r2.vec_id, pcent.c,
                     SUM((r2.x - pcent.cx) * (r2.x - pcent.cx)) AS dist
              FROM pcent JOIN resid r2 ON r2.i = pcent.i
              WHERE pcent.it < 3
              GROUP BY pcent.it, pcent.s, r2.vec_id, pcent.c
            ) d
          ) WHERE rn = 1
        ) a
        JOIN resid r ON r.vec_id = a.vec_id AND r.i // 16 = a.s
        GROUP BY a.it, a.s, a.cl, r.i
      )
    ),
    codes AS (
      SELECT vec_id, s, cl FROM (
        SELECT d.vec_id, d.s, d.c AS cl,
               ROW_NUMBER() OVER (PARTITION BY d.vec_id, d.s
                                  ORDER BY d.dist, d.c) AS rn
        FROM (
          SELECT r2.vec_id, pcent.s, pcent.c,
                 SUM((r2.x - pcent.cx) * (r2.x - pcent.cx)) AS dist
          FROM pcent JOIN resid r2 ON r2.i = pcent.i
          WHERE pcent.it = 3
          GROUP BY r2.vec_id, pcent.s, pcent.c
        ) d
      ) WHERE rn = 1
    ),
    probed AS (
      SELECT c FROM (
        SELECT cc.c, SUM((q.x - cc.cx) * (q.x - cc.cx)) AS dist
        FROM ccent cc JOIN qlong q USING (i)
        WHERE cc.it = 3 AND q.vec_id = 0
        GROUP BY cc.c
      ) ORDER BY dist, c LIMIT 2
    ),
    dt AS (
      SELECT qr.cell, pc.s, pc.c,
             SUM((qr.x - pc.cx) * (qr.x - pc.cx)) AS dist
      FROM (
        SELECT cc.c AS cell, q.i, q.x - cc.cx AS x
        FROM ccent cc JOIN qlong q USING (i)
        WHERE cc.it = 3 AND q.vec_id = 0 AND cc.c IN (SELECT c FROM probed)
      ) qr
      JOIN pcent pc ON pc.i = qr.i
      WHERE pc.it = 3
      GROUP BY qr.cell, pc.s, pc.c
    ),
    scored AS (
      SELECT codes.vec_id, CAST(SUM(dt.dist) AS BIGINT) AS pq_dist
      FROM codes
      JOIN cells ON cells.vec_id = codes.vec_id
      JOIN dt ON dt.cell = cells.cl AND dt.s = codes.s AND dt.c = codes.cl
      WHERE cells.cl IN (SELECT c FROM probed)
      GROUP BY codes.vec_id
    )
    SELECT CAST(vec_id AS BIGINT) AS vec_id, pq_dist
    FROM scored ORDER BY pq_dist, vec_id LIMIT 10
    """,
)
def ann_topk_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-13 IVF-PQ top-k — the FAISS PRODUCTION index shape (coarse
    quantizer cells + product quantization over the RESIDUALS + nprobe
    cell probing + per-cell ADC ranking), EXACTLY oracled by CHAINING the
    two fixpoint recursions: the coarse k-means recursion feeds integer
    residuals into the multi-codebook PQ recursion, then probing, the
    per-cell distance tables, and the ranking all replay in the same
    DuckDB query — the composition proof that the engine's index
    building blocks are deterministic enough to stack.

    Scale: index state is n_cells·dim + m·ksub·dsub ints plus m bytes
    per vector; a query scans only its probed cells (partition-prunable
    with the cell-partitioned layout of pipelines/embedding_index.py) at
    one table lookup per subspace per row."""
    from etl_demo_spark.vec import ivf_pq_topk

    (emb,) = _t(spark, sf_dir, "embeddings")
    return ivf_pq_topk(
        emb, k=10, query_id=0, n_cells=8, nprobe=2, m=4, ksub=8, n_iter=3
    )


@query(
    "trade_graph_pagerank",
    oracle="""
    WITH RECURSIVE pairs AS (
      SELECT DISTINCT CAST(l.l_suppkey AS BIGINT) AS s,
                      CAST(1000000 + o.o_custkey AS BIGINT) AS c
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    e AS (
      SELECT s AS src, c AS dst FROM pairs
      UNION ALL
      SELECT c AS src, s AS dst FROM pairs
    ),
    nodes AS (SELECT DISTINCT src AS node FROM e),
    outdeg AS (SELECT src AS node, COUNT(*) AS deg FROM e GROUP BY src),
    ea AS (
      SELECT src, dst, 1 AS take FROM e
      UNION ALL
      SELECT node, node, 0 FROM nodes
    ),
    pr(it, node, v) AS (
      SELECT 0, node, CAST(1000000 AS BIGINT) FROM nodes
      UNION ALL
      SELECT agg.it + 1, agg.node,
             CAST(150000 + (85 * agg.m) // 100 AS BIGINT)
      FROM (
        SELECT p.it, ea.dst AS node,
               SUM(CASE WHEN ea.take = 1 THEN p.v // o.deg ELSE 0 END) AS m
        FROM pr p
        JOIN ea ON ea.src = p.node
        LEFT JOIN outdeg o ON o.node = p.node
        WHERE p.it < 3
        GROUP BY p.it, ea.dst
      ) agg
    )
    SELECT node, v AS pr FROM pr WHERE it = 3
    """,
)
def trade_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative GRAPH algorithm, distributed and EXACTLY oracled:
    PageRank over the bidirectional supplier↔customer trade graph
    (distinct lineitem-in-order pairs; customer ids offset by 1e6 into a
    shared node space), 3 iterations of `ops.pagerank_exact` — integer
    scores scaled by 1e6, floor-division transfers, so the fixpoint is
    bit-identical under any partitioning and a DuckDB RECURSIVE CTE
    replays it hash-exact (the `embedding_kmeans_profile` pattern
    extended from centroids to graphs; the oracle folds a 0-weight
    self-loop into the edge set so the recursion needs only ONE
    reference to the working table).

    Scale shape: one contribution join (rank ⋈ edges on src — co-located
    when the edge table is pre-partitioned by src) + one partial-
    aggregated groupBy(dst) shuffle per iteration; rank-table lineage
    truncated per iteration. The class of workload (web-graph/citation
    ranking) runs on billion-edge tables with exactly this plan."""
    from etl_demo_spark.ops import pagerank_exact

    li, orders = _t(spark, sf_dir, "lineitem", "orders")
    pairs = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(
            F.col("l_suppkey").cast("long").alias("s"),
            (F.col("o_custkey") + F.lit(1_000_000)).cast("long").alias("c"),
        )
        .distinct()
    )
    edges = pairs.select(F.col("s").alias("src"), F.col("c").alias("dst")).unionByName(
        pairs.select(F.col("c").alias("src"), F.col("s").alias("dst"))
    )
    return pagerank_exact(edges, n_iter=3)


# Shared body of the recursive-spine query: Spark additionally needs the
# MAX RECURSION LEVEL clause (its recursion guard defaults to 100 and the
# clause is Spark-specific syntax); DuckDB runs the plain form.
_RECURSIVE_SPINE_SQL = """
WITH RECURSIVE spine(month_start) {levelclause} AS (
  SELECT CAST('1998-01-01' AS DATE)
  UNION ALL
  SELECT CAST(month_start + INTERVAL 1 MONTH AS DATE) FROM spine
  WHERE month_start < CAST('1998-12-01' AS DATE)
),
rev AS (
  SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS month_start,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS gross,
         COUNT(*) AS n_items
  FROM lineitem
  WHERE l_shipdate >= CAST('1998-01-01' AS DATE)
    AND l_shipdate < CAST('1999-01-01' AS DATE)
  GROUP BY 1
)
SELECT s.month_start,
       COALESCE(r.gross, CAST(0.0 AS DOUBLE)) AS gross,
       COALESCE(r.n_items, 0) AS n_items
FROM spine s LEFT JOIN rev r ON s.month_start = r.month_start
"""


@query(
    "recursive_month_spine",
    oracle=_RECURSIVE_SPINE_SQL.format(levelclause=""),
)
def recursive_month_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-8/SQL surface: WITH RECURSIVE (Spark 4 UnionLoopExec) generating a
    monthly calendar spine, gap-filled against monthly gross revenue via
    LEFT JOIN — the recursive twin of the sequence()-based
    weekly_revenue_spine. Recursion depth is bounded (12 iterations):
    each Spark recursion level is a separate job, so unbounded recursion
    over data-dependent ranges belongs to sequence()/explode — recursion
    is for genuinely iterative references (hierarchies, closures) with
    SMALL depth. Revenue aggregates in exact decimal (corpus rules)."""
    load_tables(spark, sf_dir, tables=("lineitem",), register_views=True)
    return spark.sql(
        _RECURSIVE_SPINE_SQL.format(levelclause="MAX RECURSION LEVEL 20")
    )


@query(
    "doc_pack_chunks",
    oracle="""
    WITH sized AS (
      SELECT doc_id, lang,
             CAST(length(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens
      FROM documents
    ),
    placed AS (
      SELECT doc_id, lang, n_tokens,
             CAST(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               - n_tokens AS tok_start
      FROM sized
    )
    SELECT lang,
           tok_start // 512 AS chunk_id,
           COUNT(*) AS n_docs,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc,
           CAST(SUM(n_tokens) AS BIGINT) AS chunk_tokens
    FROM placed
    GROUP BY lang, tok_start // 512
    """,
)
def doc_pack_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data sequence packing (concat-and-chunk, GPT-style): per
    language stream, documents are laid end-to-end in stable doc_id order
    and sliced into fixed 512-token windows; each document is attributed
    to the chunk its first token lands in. Pure integer arithmetic —
    exact across engines.

    Scale: one shuffle on lang + per-partition sort for the running
    offset, then a partial-aggregated groupBy — the same two-exchange
    shape regardless of corpus size. (True per-bin first-fit packing is
    inherently sequential; the concat-and-chunk formulation is the one
    production pretraining pipelines use precisely because it stays
    data-parallel.)"""
    from pyspark.sql.window import Window

    from etl_demo_spark.text import token_count

    (docs,) = _t(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sized = docs.select(
        "doc_id", "lang", token_count("text").cast("long").alias("n_tokens")
    )
    placed = sized.withColumn(
        "tok_start", F.sum("n_tokens").over(w) - F.col("n_tokens")
    )
    return (
        placed.groupBy(
            "lang", F.expr("tok_start div 512").alias("chunk_id")
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("first_doc"),
            F.sum("n_tokens").alias("chunk_tokens"),
        )
    )


@query(
    "orders_compact_manifested",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           CAST(year(o_orderdate) AS VARCHAR) AS dt
    FROM orders
    """,
)
def orders_compact_manifested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maintenance OPTIMIZE under the snapshot manifest
    (`io/manifest.py compact_manifested`): the orders table is landed as
    many small files per year partition (the shape a streaming CDC sink
    accretes), compacted in one atomic commit with a time-ordered
    cluster sort, and read back through the new manifest. The oracle is
    the plain projection of the base table — compaction must be a pure
    physical rewrite, so hash equality IS the no-corruption proof. File
    shrinkage is asserted in-query (every compacted leaf collapses to
    one file at this size); tests pin untouched-leaf carry-over and
    no-op convergence.

    Scale: one Spark job for all leaves, shard counts sized from
    on-disk bytes, reads pruned to the compacted leaves via the
    manifest — never a per-directory driver loop."""
    import tempfile

    from etl_demo_spark.io.manifest import (
        compact_manifested,
        load_manifest,
        manifest_init,
        read_manifested,
    )

    (orders,) = _t(spark, sf_dir, "orders")
    t = orders.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.year("o_orderdate").cast("string").alias("dt"),
    )
    target_path = tempfile.mkdtemp(prefix="compact_mfst_") + "/orders"
    t.repartition(6).write.partitionBy("dt").parquet(target_path)
    manifest_init(spark, target_path, "dt")

    compacted = compact_manifested(
        spark, target_path, min_files=2, sort_cols=["o_orderkey"]
    )
    assert compacted, "seeded 6 files per leaf — compaction must fire"
    import glob

    _, vmap = load_manifest(spark, target_path)
    for rel in compacted:
        files = glob.glob(f"{target_path}/{vmap[rel]}/*.parquet")
        assert len(files) == 1, (rel, files)
    return read_manifested(spark, target_path).select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.col("dt").cast("string").alias("dt"),
    )


@query(
    "orders_stats_pruned_scan",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           CAST(year(o_orderdate) AS VARCHAR) AS dt
    FROM orders
    WHERE o_orderkey BETWEEN 1000 AND 5000
    """,
)
def orders_stats_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILE-level data skipping from manifest min/max stats
    (`io/manifest.py` ``stats_cols`` + ``prune_ranges``): orders is
    landed with id-range-clustered files inside year partitions, the
    manifest records each file's o_orderkey [min,max] at commit, and the
    range read drops non-intersecting files from the listing BEFORE
    Spark opens them — the Iceberg-style skip tier above footer
    row-group pruning (asserted in-query: the pruned listing is a strict
    subset). The oracle is the plain BETWEEN over the whole table:
    skipping must lose no rows.

    Scale: this is what makes needle-in-100 TB range lookups cheap —
    partition pruning cuts the date dimension, file stats cut WITHIN
    partitions on a second dimension, and neither opens a single
    irrelevant file. Stats upkeep is one aggregation over each commit's
    new files (see `_collect_file_stats`)."""
    import tempfile

    from etl_demo_spark.io.manifest import manifest_init, read_manifested

    (orders,) = _t(spark, sf_dir, "orders")
    t = orders.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.year("o_orderdate").cast("string").alias("dt"),
    )
    target_path = tempfile.mkdtemp(prefix="stats_prune_") + "/orders"
    (
        t.repartitionByRange(8, "o_orderkey")
        .write.partitionBy("dt")
        .parquet(target_path)
    )
    manifest_init(spark, target_path, "dt", stats_cols=["o_orderkey"])

    full_files = len(read_manifested(spark, target_path).inputFiles())
    pruned = read_manifested(
        spark, target_path, prune_ranges={"o_orderkey": (1000, 5000)}
    )
    assert len(pruned.inputFiles()) < full_files, "stats pruning must skip files"
    return pruned.filter(F.col("o_orderkey").between(1000, 5000)).select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.col("dt").cast("string").alias("dt"),
    )


@query(
    "orders_delete_dv",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           CAST(year(o_orderdate) AS VARCHAR) AS dt
    FROM orders
    WHERE NOT (o_orderkey % 7 = 0 AND o_totalprice > 1000.0)
    """,
)
def orders_delete_dv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DELETE via DELETION VECTORS (`io/manifest.py
    delete_rows_manifested`): merge-on-read erasure — the matched rows'
    (file, row-ordinal) coordinates land in a parquet sidecar and one
    atomic manifest commit points at it; NOT ONE data file is rewritten
    (asserted in-query: the file inventory is byte-identical before and
    after). The read filters with a broadcast anti-join on
    ``_metadata.row_index``. The oracle is the complement predicate over
    the base table — the anti-join must remove exactly the TRUE rows.

    Scale: THE write-amplification fix — deleting 0.1% of a 100 TB table
    rewrites ~100 GB under copy-on-write but writes only MBs of
    positions here (Delta 3.x / Iceberg v2 merge-on-read). Read-side
    cost is one broadcast anti-join, bounded by compaction cadence:
    OPTIMIZE reads through the DVs and materializes them."""
    import glob as _glob
    import os as _os
    import tempfile

    from etl_demo_spark.io.manifest import (
        delete_rows_manifested,
        manifest_init,
        read_manifested,
    )

    (orders,) = _t(spark, sf_dir, "orders")
    t = orders.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.year("o_orderdate").cast("string").alias("dt"),
    )
    target_path = tempfile.mkdtemp(prefix="dv_delete_") + "/orders"
    t.repartition(4).write.partitionBy("dt").parquet(target_path)
    manifest_init(spark, target_path, "dt", stats_cols=["o_orderkey"])

    inventory = {
        f: _os.path.getsize(f)
        for f in _glob.glob(f"{target_path}/dt=*/__v*/*.parquet")
    }
    n = delete_rows_manifested(
        spark,
        target_path,
        (F.col("o_orderkey") % 7 == 0) & (F.col("o_totalprice") > 1000.0),
    )
    assert n > 0, "the predicate matches rows at every sf"
    after = {
        f: _os.path.getsize(f)
        for f in _glob.glob(f"{target_path}/dt=*/__v*/*.parquet")
    }
    assert inventory == after, "DV delete must rewrite no data file"
    return read_manifested(spark, target_path).select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.col("dt").cast("string").alias("dt"),
    )


@query(
    "doc_overlap_chunks",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
      FROM documents
    ), sized AS (
      SELECT doc_id, t,
             GREATEST(0, CAST(CEIL((len(t) - 64) / 48.0) AS INT)) * 48 AS last_start
      FROM toks
    ), ex AS (
      SELECT doc_id, t, g.start
      FROM sized, LATERAL unnest(generate_series(0, last_start, 48)) AS g(start)
    )
    SELECT doc_id,
           CAST(start // 48 AS INT) AS chunk_id,
           CAST(len(t[start + 1 : start + 64]) AS INT) AS n_chunk_tokens,
           md5(array_to_string(t[start + 1 : start + 64], ' ')) AS chunk_md5
    FROM ex
    """,
)
def doc_overlap_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG-style OVERLAPPING window chunker: each document's token stream
    is cut into 64-token windows at stride 48 (16-token overlap — the
    boundary-context rule retrieval chunkers use so no sentence is ever
    split across chunks without a copy). Distinct from `doc_pack_chunks`
    (training-data packing concatenates docs; retrieval chunking never
    crosses document boundaries). Chunk identity is pinned by md5 of the
    reconstructed window — the oracle replays tokenization, window
    arithmetic, slicing, and hashing.

    Scale: one narrow projection + an explode whose fan-out is
    ceil(tokens/stride) per document — no shuffle, no state; the 100 TB
    corpus chunks in a single map stage."""
    from etl_demo_spark.text import tokens

    (docs,) = _t(spark, sf_dir, "documents")
    c, s = 64, 48
    toks = tokens("text")
    base = docs.select("doc_id", toks.alias("t"))
    last_start = (
        F.greatest(
            F.lit(0),
            F.ceil((F.size("t") - F.lit(c)) / F.lit(float(s))).cast("int"),
        )
        * s
    )
    ex = base.select(
        "doc_id",
        "t",
        F.explode(F.sequence(F.lit(0), last_start, F.lit(s))).alias("start"),
    )
    chunk = F.slice("t", F.col("start") + 1, c)
    return ex.select(
        "doc_id",
        (F.col("start") / s).cast("int").alias("chunk_id"),
        F.size(chunk).cast("int").alias("n_chunk_tokens"),
        F.md5(F.array_join(chunk, " ")).alias("chunk_md5"),
    )


@query(
    "doc_nfc_normalize",
    oracle="""
    WITH raw AS (
      SELECT doc_id, lang,
             substr(text, 1, 40) ||
             (CASE doc_id % 3
                WHEN 0 THEN ' Café du Marché'
                WHEN 1 THEN ' Café du Marché'
                ELSE ' plain ascii' END) ||
             (CASE WHEN doc_id % 5 = 0 THEN ' Å' ELSE '' END) AS raw
      FROM documents
    ), n AS (
      SELECT lang, raw, nfc_normalize(raw) AS norm FROM raw
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN raw <> norm THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
           CAST(SUM(length(raw) - length(norm)) AS BIGINT) AS chars_saved
    FROM n
    GROUP BY lang
    """,
)
def doc_nfc_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode NFC canonicalization (`text.nfc_normalize_udf`): mixed
    decomposed / precomposed sequences are injected deterministically
    (NFD 'e'+combining-acute vs precomposed 'é' vs plain ASCII — the
    variation a multilingual crawl actually contains), normalized with
    the Arrow-batched UDF, and profiled per language (docs changed,
    code points saved). The DuckDB oracle replays synthesis +
    ``nfc_normalize`` — hash equality pins that Python's unicodedata and
    DuckDB's ICU-backed normalizer implement the same standard, i.e. the
    UDF is cross-engine exact.

    Why it's load-bearing: decomposed and precomposed spellings hash
    DIFFERENTLY, so every downstream dedup tier (URL keys, exact
    fingerprints, MinHash shingles) sees phantom distinct documents
    until this pass runs. One Arrow-batched projection — no shuffle."""
    from etl_demo_spark.text import nfc_normalize_udf

    (docs,) = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    raw = docs.select(
        "doc_id",
        "lang",
        F.concat(
            F.substring("text", 1, 40),
            F.when(did % 3 == 0, F.lit(" Café du Marché"))
            .when(did % 3 == 1, F.lit(" Café du Marché"))
            .otherwise(F.lit(" plain ascii")),
            F.when(did % 5 == 0, F.lit(" Å")).otherwise(F.lit("")),
        ).alias("raw"),
    )
    nfc = nfc_normalize_udf()
    n = raw.withColumn("norm", nfc(F.col("raw")))
    return n.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(
            F.when(F.col("raw") != F.col("norm"), F.lit(1)).otherwise(F.lit(0))
        ).alias("n_changed"),
        F.sum(F.length("raw") - F.length("norm")).alias("chars_saved"),
    )


@query(
    "url_canonical_dedup",
    oracle="""
    WITH raw AS (
      SELECT doc_id,
             (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS' ELSE 'https' END) || '://' ||
             (CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END) ||
             (CASE WHEN doc_id % 2 = 0 THEN upper(source) ELSE source END) || '.Example.COM' ||
             (CASE WHEN doc_id % 5 = 0 THEN ':443' ELSE '' END) ||
             '/Articles/item-' || CAST(doc_id % 100 AS BIGINT) ||
             (CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END) ||
             (CASE WHEN doc_id % 3 = 0 THEN '?id=' || CAST(doc_id % 100 AS BIGINT) || '&utm_source=feed&cat=A'
                   WHEN doc_id % 3 = 1 THEN '?cat=A&id=' || CAST(doc_id % 100 AS BIGINT) || '&fbclid=x'
                   ELSE '?utm_campaign=z&cat=A&id=' || CAST(doc_id % 100 AS BIGINT) END) ||
             (CASE WHEN doc_id % 7 = 0 THEN '#sec-2' ELSE '' END) AS url
      FROM documents
    ), stripped AS (
      SELECT doc_id, url,
             lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
             regexp_replace(regexp_replace(url, '^[A-Za-z][A-Za-z0-9+.-]*://', ''), '#.*$', '') AS rest
      FROM raw
    ), parts AS (
      SELECT doc_id, url, scheme,
             lower(regexp_extract(rest, '^([^/?]+)', 1)) AS hostport,
             substr(rest, length(regexp_extract(rest, '^([^/?]+)', 1)) + 1) AS pathq
      FROM stripped
    ), pieces AS (
      SELECT doc_id, url, scheme,
             regexp_replace(
               CASE WHEN scheme = 'http' THEN regexp_replace(hostport, ':80$', '')
                    WHEN scheme = 'https' THEN regexp_replace(hostport, ':443$', '')
                    ELSE hostport END, '^www\\.', '') AS host,
             regexp_replace(regexp_extract(pathq, '^([^?]*)', 1), '/+$', '') AS path0,
             array_to_string(list_sort(list_filter(string_split(regexp_extract(pathq, '\\?(.*)$', 1), '&'),
               p -> NOT (p LIKE 'utm_%' OR p LIKE 'fbclid=%' OR p LIKE 'gclid=%' OR p LIKE 'ref=%' OR p = ''))), '&') AS qc
      FROM parts
    ), cu AS (
      SELECT doc_id, url,
             scheme || '://' || host ||
             (CASE WHEN path0 = '' THEN '/' ELSE path0 END) ||
             (CASE WHEN qc = '' THEN '' ELSE '?' || qc END) AS canonical_url
      FROM pieces
    )
    SELECT canonical_url,
           CAST(MIN(doc_id) AS BIGINT) AS doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_variants,
           CAST(COUNT(DISTINCT url) AS BIGINT) AS n_raw
    FROM cu
    GROUP BY canonical_url
    """,
)
def url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-level dedup, the FIRST tier of a web-corpus pipeline
    (`web.py canonical_url` / `url_dedup`): deterministic messy URLs are
    synthesized per document (scheme/host case, www., default :443
    port, trailing slash, shuffled query order, utm_*/fbclid tracking
    params, fragments — the variation classes CommonCrawl-style
    canonicalizers normalize), canonicalized with pure Catalyst
    regexp/array expressions, and grouped to one keeper per canonical
    URL. The oracle replays BOTH the synthesis and the canonicalization
    in SQL — hash equality proves the transform semantics exactly.

    Scale: a projection + one hash agg on a ~60-byte key; runs before
    any content-based dedup tier and removes the bulk of crawl
    duplicates without a signature shuffle."""
    from etl_demo_spark.web import canonical_url

    (docs,) = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    item = (did % 100).cast("string")
    url = F.concat(
        F.when(did % 2 == 0, F.lit("HTTPS")).otherwise(F.lit("https")),
        F.lit("://"),
        F.when(did % 3 == 0, F.lit("WWW.")).otherwise(F.lit("")),
        F.when(did % 2 == 0, F.upper("source")).otherwise(F.col("source")),
        F.lit(".Example.COM"),
        F.when(did % 5 == 0, F.lit(":443")).otherwise(F.lit("")),
        F.lit("/Articles/item-"),
        item,
        F.when(did % 4 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(
            did % 3 == 0,
            F.concat(F.lit("?id="), item, F.lit("&utm_source=feed&cat=A")),
        )
        .when(
            did % 3 == 1,
            F.concat(F.lit("?cat=A&id="), item, F.lit("&fbclid=x")),
        )
        .otherwise(
            F.concat(F.lit("?utm_campaign=z&cat=A&id="), item)
        ),
        F.when(did % 7 == 0, F.lit("#sec-2")).otherwise(F.lit("")),
    )
    raw = docs.select("doc_id", url.alias("url"))
    return (
        raw.withColumn("canonical_url", canonical_url("url"))
        .groupBy("canonical_url")
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.count(F.lit(1)).alias("n_variants"),
            F.countDistinct("url").alias("n_raw"),
        )
    )


@query(
    "priority_revenue_bucketed",
    oracle=f"""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(ROUND(SUM(CAST(l_extendedprice AS {DEC_SQL}) * (1 - CAST(l_discount AS {RATE_SQL}))), 2) AS DOUBLE) AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def priority_revenue_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-FREE fact-fact join via bucketed layout (`io/bucketed.py`):
    lineitem and orders are hash-clustered into co-aligned buckets on the
    order key at write time, so the join reads co-located buckets and the
    plan carries ZERO hash exchanges on either side (asserted in-query —
    broadcast disabled so the proof is the bucketing, not table size).
    The oracle is the plain join: bucketing must be invisible to results.

    Scale: the lineitem⋈orders shuffle is THE dominant network cost of
    TPC-H-shaped workloads at 100 TB; bucketing pays it once at ingest
    and every subsequent join/agg on the key skips it. Mismatched bucket
    counts coalesce at read (pinned by test)."""
    import tempfile

    from etl_demo_spark.io.bucketed import (
        assert_no_shuffle_join,
        read_bucketed,
        write_bucketed,
    )

    li, orders = _t(spark, sf_dir, "lineitem", "orders")
    base = tempfile.mkdtemp(prefix="bucketed_")
    spark.sql("DROP TABLE IF EXISTS bkt_lineitem")
    spark.sql("DROP TABLE IF EXISTS bkt_orders")
    write_bucketed(
        li.select("l_orderkey", "l_extendedprice", "l_discount"),
        "bkt_lineitem",
        "l_orderkey",
        8,
        sort_cols="l_orderkey",
        path=f"{base}/lineitem",
    )
    write_bucketed(
        orders.withColumnRenamed("o_orderkey", "l_orderkey").select(
            "l_orderkey", "o_orderpriority"
        ),
        "bkt_orders",
        "l_orderkey",
        8,
        sort_cols="l_orderkey",
        path=f"{base}/orders",
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = read_bucketed(spark, "bkt_lineitem").join(
            read_bucketed(spark, "bkt_orders"), "l_orderkey"
        )
        assert_no_shuffle_join(joined, sides=2)
        revenue_s = money_c("l_extendedprice") * (10000 - rate_bp("l_discount"))
        return joined.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("n_items"),
            ssum(revenue_s, 6).alias("revenue"),
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


@query(
    "orders_dpp_pruned_join",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INT) AS dt,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS total
    FROM orders
    WHERE year(o_orderdate) <= 1997
    GROUP BY CAST(year(o_orderdate) AS INT)
    """,
)
def orders_dpp_pruned_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DYNAMIC partition pruning (Catalyst built-in, plan-pinned here):
    the fact table is laid out partitioned by year; the query filters a
    tiny DIMENSION (era='old'), not the fact, so static pruning can't
    fire — Catalyst injects a dynamicpruning subquery that evaluates the
    broadcast dim side FIRST and prunes the fact scan's partitions at
    RUNTIME (asserted in-query on the scan's PartitionFilters). The
    oracle is the equivalent static predicate — DPP must lose no rows.

    Scale: the star-schema staple — 'revenue for promo weeks' reads only
    promo-week partitions of a 100 TB fact even though the predicate
    lives on the dimension. Declarative layout + built-in optimizer
    behavior; nothing hand-scheduled."""
    import tempfile

    from etl_demo_spark.corpus import dec as _dec

    (orders,) = _t(spark, sf_dir, "orders")
    base = tempfile.mkdtemp(prefix="dpp_") + "/orders"
    orders.select(
        "o_orderkey",
        "o_totalprice",
        F.year("o_orderdate").cast("int").alias("dt"),
    ).write.partitionBy("dt").parquet(base)

    fact = spark.read.option("basePath", base).parquet(base)
    dim = (
        fact.select("dt")
        .distinct()
        .withColumn(
            "era", F.when(F.col("dt") <= 1997, F.lit("old")).otherwise(F.lit("new"))
        )
    )
    joined = fact.join(F.broadcast(dim.filter(F.col("era") == "old")), "dt")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), (
        "expected a dynamicpruning subquery on the fact scan:\n" + plan
    )
    return joined.groupBy(F.col("dt").cast("int").alias("dt")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum(_dec("o_totalprice")), 2).cast("double").alias("total"),
    )


@query(
    "lineitem_bloomfilter_join",
    oracle=f"""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(ROUND(SUM(CAST(l_extendedprice AS {DEC_SQL}) * (1 - CAST(l_discount AS {RATE_SQL}))), 2) AS DOUBLE) AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderpriority = '1-URGENT'
    GROUP BY o_orderpriority
    """,
)
def lineitem_bloomfilter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RUNTIME bloom-filter join pruning (Catalyst built-in, plan-pinned):
    the selective predicate lives on orders, the join key is NOT a
    partition column, so neither static nor dynamic PARTITION pruning
    can help — instead Catalyst builds a bloom filter over the filtered
    orders' keys at runtime and pushes it into the lineitem scan
    (``bloom_filter_agg`` + ``might_contain``, asserted in-query), so
    non-matching lineitem rows die at the scan instead of crossing the
    join shuffle. The oracle is the plain filtered join.

    Scale: the semi-join-reduction sibling of DPP — on a 100 TB fact the
    default thresholds (creation side < 10 MB, application side > 10 GB)
    fire on their own; the local fixture only has to lower the
    application-side floor (restored after)."""
    li, orders = _t(spark, sf_dir, "lineitem", "orders")
    thr_key = (
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    )
    prev_thr = spark.conf.get(thr_key)
    prev_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set(thr_key, "0")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
            "o_orderkey", "o_orderpriority"
        )
        joined = li.join(urgent, li.l_orderkey == urgent.o_orderkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "bloom_filter_agg" in plan and "might_contain" in plan, (
            "expected a runtime bloom filter pushed into the fact scan:\n" + plan
        )
        revenue_s = money_c("l_extendedprice") * (10000 - rate_bp("l_discount"))
        return joined.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("n_items"),
            ssum(revenue_s, 6).alias("revenue"),
        )
    finally:
        spark.conf.set(thr_key, prev_thr)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bc)


@query(
    "orders_repartition_layout",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority,
           CAST(year(o_orderdate) AS VARCHAR) AS dt
    FROM orders
    """,
)
def orders_repartition_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ATOMIC RE-PARTITIONING (`io/manifest.py repartition_manifested`):
    the table lands partitioned by year, then — discovering queries
    actually filter by priority — is rewritten under an
    o_orderpriority layout in ONE commit (asserted in-query: every new
    leaf is priority-keyed; time travel still reads the year layout).
    The oracle is the plain projection: re-layout must be a pure
    physical move.

    Scale: one table-sized shuffle with byte-derived shard counts —
    the same job shape as a full OPTIMIZE, scheduled the same way; the
    pointer swap makes the layout change invisible to racing readers
    until it is complete."""
    import tempfile

    from etl_demo_spark.io.manifest import (
        load_manifest,
        manifest_versions,
        read_manifested,
        repartition_manifested,
        write_manifested,
    )

    (orders,) = _t(spark, sf_dir, "orders")
    t = orders.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        "o_orderpriority",
        F.year("o_orderdate").cast("string").alias("dt"),
    )
    target_path = tempfile.mkdtemp(prefix="repart_") + "/orders"
    write_manifested(t.repartition(4), target_path, "dt")
    v_old = manifest_versions(spark, target_path)[-1]

    leaves = repartition_manifested(spark, target_path, "o_orderpriority")
    assert leaves and all(r.startswith("o_orderpriority=") for r in leaves), leaves
    _, mapping = load_manifest(spark, target_path)
    assert all(rel.startswith("o_orderpriority=") for rel in mapping)
    old = read_manifested(spark, target_path, version=v_old)
    assert any("/dt=" in f for f in old.inputFiles())
    return read_manifested(spark, target_path).select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.col("o_orderpriority").cast("string").alias("o_orderpriority"),
        F.col("dt").cast("string").alias("dt"),
    )


@query(
    "orders_rollback_restore",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           CAST(year(o_orderdate) AS VARCHAR) AS dt
    FROM orders
    """,
)
def orders_rollback_restore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RESTORE after a bad commit (`io/manifest.py rollback_manifested`):
    the table takes a corrupting UPDATE (every price zeroed), then rolls
    back to the pre-incident snapshot — as a NEW commit, so history
    moves forward and the bad version stays auditable (asserted:
    post-rollback version > bad version, and time travel still reads the
    corruption). The oracle is the original projection — the restored
    read must be bit-identical to pre-incident.

    Scale: rollback is one pointer commit regardless of table size —
    the incident-recovery primitive a 100 TB table cannot get from
    re-running yesterday's pipeline."""
    import tempfile

    from etl_demo_spark.io.manifest import (
        manifest_versions,
        read_manifested,
        rollback_manifested,
        update_where_manifested,
        write_manifested,
    )

    (orders,) = _t(spark, sf_dir, "orders")
    t = orders.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.year("o_orderdate").cast("string").alias("dt"),
    )
    target_path = tempfile.mkdtemp(prefix="rollback_") + "/orders"
    write_manifested(t.repartition(4), target_path, "dt")
    good_v = manifest_versions(spark, target_path)[-1]

    update_where_manifested(
        spark, target_path, {"o_totalprice": F.lit(0.0)}, F.lit(True), "dt"
    )
    bad_v = manifest_versions(spark, target_path)[-1]
    new_v = rollback_manifested(spark, target_path, good_v)
    assert new_v > bad_v, (new_v, bad_v)
    # the incident stays auditable inside the retention window
    corrupted = read_manifested(spark, target_path, version=bad_v)
    assert corrupted.filter(F.col("o_totalprice") != 0.0).count() == 0
    return read_manifested(spark, target_path).select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.col("dt").cast("string").alias("dt"),
    )


@query(
    "orders_constraint_gate",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CASE WHEN o_orderstatus = 'O' THEN o_totalprice + 1.0
                ELSE o_totalprice END AS o_totalprice,
           CAST(year(o_orderdate) AS VARCHAR) AS dt
    FROM orders
    """,
)
def orders_constraint_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHECK-constraint enforcement (`io/manifest.py
    add_constraint_manifested`): the table takes a positive-price
    constraint, a VIOLATING bulk update is refused wholesale (asserted:
    version unchanged), and a valid update commits normally. The oracle
    is the base table with only the VALID update applied — proof that
    the refused commit left no trace and the gate let the good one
    through.

    Scale: validation is one aggregate job over the commit's STAGED
    slice (never the table), so the gate costs what the commit already
    reads; refusal happens before any rename — a 100 TB table can't be
    half-poisoned."""
    import tempfile

    from etl_demo_spark.io.manifest import (
        ConstraintViolation,
        add_constraint_manifested,
        manifest_versions,
        update_where_manifested,
        read_manifested,
        write_manifested,
    )

    (orders,) = _t(spark, sf_dir, "orders")
    t = orders.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        "o_orderstatus",
        F.year("o_orderdate").cast("string").alias("dt"),
    )
    target_path = tempfile.mkdtemp(prefix="constraint_") + "/orders"
    write_manifested(t.repartition(4), target_path, "dt")
    add_constraint_manifested(spark, target_path, "price_pos", "o_totalprice > 0")

    vs = manifest_versions(spark, target_path)
    try:
        update_where_manifested(
            spark,
            target_path,
            {"o_totalprice": F.lit(-1.0)},
            F.col("o_orderstatus") == "F",
            "dt",
        )
        raise AssertionError("violating update must be refused")
    except ConstraintViolation:
        pass
    assert manifest_versions(spark, target_path) == vs, "refusal must not commit"

    update_where_manifested(
        spark,
        target_path,
        {"o_totalprice": F.col("o_totalprice") + F.lit(1.0)},
        F.col("o_orderstatus") == "O",
        "dt",
    )
    return read_manifested(spark, target_path).select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.col("dt").cast("string").alias("dt"),
    )


@query(
    "orders_alter_evolution",
    oracle="""
    SELECT o_orderkey,
           CAST(o_custkey AS BIGINT) AS customer_id,
           o_totalprice,
           CAST(NULL AS VARCHAR) AS note,
           CAST(year(o_orderdate) AS VARCHAR) AS dt
    FROM orders
    """,
)
def orders_alter_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALTER TABLE as metadata-only commits (`io/manifest.py
    alter_manifested`): the orders table lands with o_custkey narrowed to
    INT, then — without touching one data file (asserted: the file
    inventory incl. mtimes is identical) — the column is WIDENED back to
    BIGINT, RENAMED to customer_id (Delta-style column mapping: reads
    scan the frozen physical name and alias to the logical one), and a
    nullable note column is ADDED (NULL for every pre-evolution file).
    The oracle is the equivalent projection of the base table — the
    evolved read must reproduce values exactly through the mapping.

    Scale: schema changes on a 100 TB table MUST be O(metadata) — a
    rewrite-based rename is a full-table job; this is one pointer-file
    commit, and old + post-evolution files coexist in one scan."""
    import glob as _glob
    import os as _os
    import tempfile

    from etl_demo_spark.io.manifest import (
        alter_manifested,
        manifest_init,
        read_manifested,
    )

    (orders,) = _t(spark, sf_dir, "orders")
    t = orders.select(
        "o_orderkey",
        F.col("o_custkey").cast("int").alias("o_custkey"),
        "o_totalprice",
        F.year("o_orderdate").cast("string").alias("dt"),
    )
    target_path = tempfile.mkdtemp(prefix="alter_evo_") + "/orders"
    t.repartition(4).write.partitionBy("dt").parquet(target_path)
    manifest_init(spark, target_path, "dt")

    inventory = {
        f: _os.path.getmtime(f)
        for f in _glob.glob(f"{target_path}/dt=*/__v*/*.parquet")
    }
    alter_manifested(spark, target_path, widen_types={"o_custkey": "bigint"})
    alter_manifested(
        spark,
        target_path,
        rename_columns={"o_custkey": "customer_id"},
        add_columns={"note": "string"},
    )
    after = {
        f: _os.path.getmtime(f)
        for f in _glob.glob(f"{target_path}/dt=*/__v*/*.parquet")
    }
    assert inventory == after, "ALTER must rewrite no data file"
    return read_manifested(spark, target_path).select(
        "o_orderkey",
        "customer_id",
        "o_totalprice",
        "note",
        F.col("dt").cast("string").alias("dt"),
    )


@query(
    "orders_update_partitioned",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CASE WHEN o_orderstatus = 'P' THEN o_totalprice + 5.0
                ELSE o_totalprice END AS o_totalprice,
           CASE WHEN o_orderstatus = 'P' THEN 'F'
                ELSE o_orderstatus END AS o_orderstatus
    FROM orders
    """,
)
def orders_update_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-scoped UPDATE ... SET ... WHERE (io/tables.py
    `update_where_partitioned`) in its hardest shape: the assignment
    SETS THE PARTITION COLUMN (the status-transition bulk update —
    every pending order finalizes with a fee). The blast radius is
    source ∪ destination partitions (asserted ['F','P']); the drained
    source partition's directory is removed, moved rows land in their
    new directory, and the oracle is the logical CASE-WHEN over the
    whole table — physical scoping and the directory moves must not
    change the answer.

    Scale: discovery pushes the predicate to the parquet scan
    (PushedFilters), the rewrite touches the two affected partitions
    only, and the update itself is one CASE-WHEN projection — no join
    at all, unlike the MERGE path an UPDATE is often shoehorned into."""
    import tempfile

    from etl_demo_spark.io.tables import update_where_partitioned

    (orders,) = _t(spark, sf_dir, "orders")
    t = orders.select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
    target_path = tempfile.mkdtemp(prefix="update_part_") + "/orders"
    t.write.partitionBy("o_orderstatus").parquet(target_path)

    affected = update_where_partitioned(
        spark,
        target_path,
        {
            "o_totalprice": F.col("o_totalprice") + F.lit(5.0),
            "o_orderstatus": F.lit("F"),
        },
        F.col("o_orderstatus") == "P",
        "o_orderstatus",
    )
    assert sorted(affected) == ["F", "P"], affected
    updated = spark.read.parquet(target_path)
    return updated.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.col("o_orderstatus").cast("string").alias("o_orderstatus"),
    )


@query(
    "orders_update_manifested",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CASE WHEN o_orderstatus = 'P' THEN o_totalprice + 7.0
                ELSE o_totalprice END AS o_totalprice,
           CASE WHEN o_orderstatus = 'P' THEN 'F'
                ELSE o_orderstatus END AS o_orderstatus
    FROM orders
    """,
)
def orders_update_manifested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate UPDATE through the SNAPSHOT-MANIFEST layer
    (io/manifest.py `update_where_manifested`) in its hardest shape: the
    assignment SETS THE PARTITION COLUMN (every pending order finalizes
    with a fee), so rows MOVE between leaves — and unlike the swap-mode
    twin (`orders_update_partitioned`), the source-leaf drain and the
    destination-leaf growth become visible in ONE atomic CAS commit: a
    racing reader can never observe the transition half-applied. Blast
    radius asserted (['F','P']); the oracle is the logical CASE-WHEN
    over the whole table — physical scoping, directory moves, and the
    manifest publication must not change the answer.

    Scale: identical read/write footprint to the swap twin (predicate
    pushed to the scan, two leaves rewritten) plus the O(changed-leaves)
    delta-manifest commit under the optimistic multi-writer loop."""
    import tempfile

    from etl_demo_spark.io.manifest import (
        manifest_init,
        read_manifested,
        update_where_manifested,
    )

    (orders,) = _t(spark, sf_dir, "orders")
    t = orders.select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
    target_path = tempfile.mkdtemp(prefix="update_mani_") + "/orders"
    t.write.partitionBy("o_orderstatus").parquet(target_path)
    manifest_init(spark, target_path, "o_orderstatus")

    affected = update_where_manifested(
        spark,
        target_path,
        {
            "o_totalprice": F.col("o_totalprice") + F.lit(7.0),
            "o_orderstatus": F.lit("F"),
        },
        F.col("o_orderstatus") == "P",
        "o_orderstatus",
    )
    assert sorted(affected) == ["F", "P"], affected
    updated = read_manifested(spark, target_path)
    return updated.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.col("o_orderstatus").cast("string").alias("o_orderstatus"),
    )


@query(
    "customer_delete_partitioned",
    oracle="""
    SELECT c_custkey, c_name, CAST(c_nationkey AS BIGINT) AS c_nationkey,
           c_acctbal, c_mktsegment
    FROM customer
    WHERE NOT (c_custkey % 13 = 0 AND c_mktsegment = 'AUTOMOBILE')
    """,
)
def customer_delete_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-scoped DELETE-by-key (io/tables.py
    `delete_keys_partitioned`): the GDPR/right-to-erasure shape — a key
    list is removed from a partitioned table by rewriting ONLY the
    partitions that contain a matched key (blast radius asserted:
    ['AUTOMOBILE']; untouched-partition byte-identity and the
    drained-partition directory removal are pinned in
    tests/test_tables.py). The oracle is the logical anti-join over the
    whole table — physical scoping must not change the answer.

    Scale: a few thousand erasure keys against a 100 TB table cost one
    key semi-join for discovery (AQE broadcasts the key set), a pruned
    read, one anti-join, and a write bounded by the partitions the keys
    actually live in — never a full rewrite. Cite: reference
    `etl_weekly_trades.py` has no delete path at all (append-only
    SQLite)."""
    import tempfile

    from etl_demo_spark.io.tables import delete_keys_partitioned

    (customer,) = _t(spark, sf_dir, "customer")
    cols = ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"]
    target_path = tempfile.mkdtemp(prefix="delete_part_") + "/customer"
    customer.select(cols).write.partitionBy("c_mktsegment").parquet(target_path)

    erase = customer.filter(
        (F.col("c_custkey") % 13 == 0) & (F.col("c_mktsegment") == "AUTOMOBILE")
    ).select("c_custkey")
    affected = delete_keys_partitioned(
        spark, target_path, erase, ["c_custkey"], "c_mktsegment"
    )
    assert affected == ["AUTOMOBILE"], affected
    remaining = spark.read.parquet(target_path)
    return remaining.select(
        "c_custkey",
        "c_name",
        F.col("c_nationkey").cast("long").alias("c_nationkey"),
        "c_acctbal",
        F.col("c_mktsegment").cast("string").alias("c_mktsegment"),
    )


@query(
    "lang_mixture_sample",
    oracle="""
    WITH c AS (SELECT lang, COUNT(*) AS c FROM documents GROUP BY lang),
    ref AS (SELECT MIN(c) AS cmin FROM c),
    t AS (
      SELECT lang,
             LEAST(c, CAST(FLOOR(SQRT(CAST(c * cmin AS DOUBLE))) AS BIGINT)) AS n
      FROM c, ref
    ),
    r AS (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'mx'), 1, 8)) AS BIGINT) ASC,
                        doc_id ASC
             ) AS rn
      FROM documents
    )
    SELECT r.doc_id, r.lang
    FROM r JOIN t USING (lang)
    WHERE r.rn <= t.n
    """,
)
def lang_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-balanced domain mixture (`ops.mixture_sample`,
    alpha=0.5): each language is downsampled toward the geometric mean
    of its own size and the smallest language's size — the α-temperature
    rebalance every multilingual training corpus runs, anchored at the
    min domain so nothing upsamples. Selection is the md5-uniform
    per-domain rank, and at alpha=0.5 the target count is
    floor(sqrt(c_d·c_min)) in IEEE double — bit-identical cross-engine,
    which is what lets DuckDB replay the ENTIRE decision (counts,
    targets, ranks, membership) hash-exactly.

    Scale: a tiny count agg + broadcast targets + one top-n-per-group
    window with the map-side WindowGroupLimit cut. No full sort."""
    from etl_demo_spark.ops import mixture_sample

    (documents,) = _t(spark, sf_dir, "documents")
    return mixture_sample(documents, "lang", "doc_id", alpha=0.5, seed="mx").select(
        "doc_id", "lang"
    )


@query(
    "duplicate_span_profile",
    oracle="""
    WITH toks AS (
      SELECT doc_id, regexp_extract_all(text, '[a-z]+') AS tk FROM documents
    ),
    wins AS (
      SELECT doc_id, i - 1 AS pos,
             md5(array_to_string(tk[i:i+7], ' ')) AS whash
      FROM toks, LATERAL unnest(generate_series(1, len(tk) - 7)) AS t(i)
      WHERE len(tk) >= 8
    ),
    dup AS (SELECT whash FROM wins GROUP BY whash HAVING COUNT(*) > 1),
    marked AS (SELECT w.doc_id, w.pos FROM wins w JOIN dup USING (whash)),
    isl AS (
      SELECT doc_id, pos,
             CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
                       OR pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > 8
                  THEN 1 ELSE 0 END AS new_span
      FROM marked
    ),
    sp AS (
      SELECT doc_id, pos,
             SUM(new_span) OVER (PARTITION BY doc_id ORDER BY pos) AS span_id
      FROM isl
    ),
    per_span AS (
      SELECT doc_id, span_id, MIN(pos) AS s, MAX(pos) + 8 AS e,
             COUNT(*) AS nw
      FROM sp GROUP BY doc_id, span_id
    )
    SELECT doc_id, CAST(SUM(nw) AS BIGINT) AS n_dup_windows,
           CAST(COUNT(*) AS BIGINT) AS n_spans,
           CAST(SUM(e - s) AS BIGINT) AS dup_tokens
    FROM per_span GROUP BY doc_id
    """,
)
def duplicate_span_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level exact dedup (dedup.py `duplicate_span_profile`, the
    Lee et al. 2022 substring-dedup detector in its windowed, shuffle-
    friendly form): every 8-token window repeated anywhere in the corpus
    is marked, per-doc marks dilate to token intervals and merge by
    gaps-and-islands, and the profile (duplicated windows, merged spans,
    exactly-covered token count) is the removal layer's input. Oracled
    end-to-end against DuckDB replaying the identical window hashing
    (md5 over space-joined slices) and island merge.

    Scale: one corpus-token-scale shuffle of 16-byte window hashes + a
    per-doc window pass — the parallel, spill-friendly rendition of what
    the reference implementation pays a suffix-array build for."""
    from etl_demo_spark.dedup import duplicate_span_profile as span_profile

    (documents,) = _t(spark, sf_dir, "documents")
    return span_profile(documents, "text", "doc_id", k=8)


# ---- BPE tokenizer training (bpe.py) ------------------------------------
# The DuckDB oracle replays the WHOLE training loop in a recursive CTE:
# words are carried as '|'-double-delimited symbol strings ('|l||o||w||</w>|')
# so the per-iteration merge is one replace() of '|a||b|' with '|ab|' —
# each boundary owns two delimiters, which makes SQL replace()'s
# left-to-right non-overlapping scan EXACTLY the greedy fold the engine
# applies JVM-side (shared-delimiter overlap, e.g. 'a a a a', rewrites to
# [aa, aa] in both). The argmax subquery breaks count ties to the
# lexicographically smallest pair, mirroring bpe_train's orderBy.
_BPE_K = 20
_BPE_RECURSION = f"""
    words AS (
      SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS freq FROM (
        SELECT unnest(regexp_extract_all(text, '[a-z]+')) AS w FROM documents
      ) GROUP BY w
    ),
    st(it, word, w, freq) AS (
      SELECT 0, word,
             '|' || regexp_replace(word, '(.)', '\\1||', 'g') || '</w>|',
             freq
      FROM words
      UNION ALL
      SELECT st.it + 1, st.word,
             replace(st.w, '|' || best.a || '||' || best.b || '|',
                     '|' || best.a || best.b || '|'),
             st.freq
      FROM st, (
        SELECT syms[i] AS a, syms[i + 1] AS b
        FROM (SELECT string_split(trim(w, '|'), '||') AS syms, freq FROM st),
             LATERAL unnest(generate_series(1, len(syms) - 1)) AS t(i)
        GROUP BY 1, 2
        ORDER BY SUM(freq) DESC, a, b
        LIMIT 1
      ) best
      WHERE st.it < {_BPE_K}
    ),
    final_syms AS (
      SELECT word, string_split(trim(w, '|'), '||') AS syms, freq
      FROM st WHERE it = (SELECT MAX(it) FROM st)
    )
"""

# one training run per sf_dir per process: the trainer is deterministic,
# and both BPE queries (symbol table + encoder) consume the same merges
_BPE_CACHE: dict = {}


def _bpe_trained(spark: SparkSession, sf_dir: str):
    from etl_demo_spark.bpe import bpe_train_incremental, word_freqs

    key = str(sf_dir)
    got = _BPE_CACHE.get(key)
    if got is None:
        (documents,) = _t(spark, sf_dir, "documents")
        # the incremental trainer (persisted pair-count deltas — the
        # production-vocab scale shape) is merge-for-merge identical to
        # bpe_train, so the recursive-CTE replay oracle certifies it
        merges, final = bpe_train_incremental(word_freqs(documents), _BPE_K)
        got = _BPE_CACHE[key] = (merges, final)
    return got


@query(
    "bpe_pair_stats",
    oracle="""
    WITH words AS (
      SELECT unnest(regexp_extract_all(text, '[a-z]+')) AS w FROM documents
    ),
    pairs AS (
      SELECT substr(w, i, 1) AS a, substr(w, i + 1, 1) AS b
      FROM words, LATERAL unnest(generate_series(1, length(w) - 1)) AS t(i)
      UNION ALL
      SELECT substr(w, length(w), 1) AS a, '</w>' AS b FROM words
    )
    SELECT a, b, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM pairs GROUP BY a, b
    ORDER BY cnt DESC, a, b LIMIT 20
    """,
)
def bpe_pair_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE iteration-0 statistics (bpe.py `pair_counts`): the 20 most
    frequent adjacent symbol pairs (chars + word-end marker) over the
    pre-tokenized corpus, occurrence-weighted. Oracles the pair-count
    stage the trainer argmaxes every iteration — explode of
    arrays_zip(slice, slice) vs DuckDB substr/generate_series.

    Scale: the pair table is vocab × avg-word-length rows, NOT corpus
    tokens — counting runs on the distinct-word frequency table (the
    Zipf compression the whole trainer rides on)."""
    from etl_demo_spark.bpe import _initial_symbols, pair_counts, word_freqs

    (documents,) = _t(spark, sf_dir, "documents")
    return (
        pair_counts(_initial_symbols(word_freqs(documents)))
        .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
        .limit(20)
    )


@query(
    "bpe_symbol_table",
    oracle=f"""
    WITH RECURSIVE {_BPE_RECURSION}
    SELECT word, array_to_string(syms, ' ') AS tokens, freq
    FROM final_syms
    """,
)
def bpe_symbol_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE TRAINING, oracled end-to-end (bpe.py
    `bpe_train`, k={k} merges): the trained per-word symbol table must
    match a DuckDB recursive CTE that replays every iteration — pair
    count, count-desc/lexicographic argmax, greedy left-to-right merge
    rewrite. An exact cross-engine replay of an iterative vocabulary
    learner; the merge SEQUENCE itself is additionally pinned
    merge-for-merge against a pure-Python Sennrich reference in
    tests/test_llm_ops.py.

    Scale: the corpus collapses to (distinct word, freq) once — a
    lossless sufficient statistic for BPE — and all k iterations run on
    that table: one small pair-count shuffle + a 1-row argmax collect +
    a JVM fold rewrite each. Nothing touches the corpus again and
    nothing per-row leaves the JVM (see bpe.py module docstring)."""
    merges, final = _bpe_trained(spark, sf_dir)
    return final.select(
        "word", F.array_join("symbols", " ").alias("tokens"), "freq"
    )


bpe_symbol_table.__doc__ = bpe_symbol_table.__doc__.format(k=_BPE_K)


@query(
    "bpe_encoded_docs",
    oracle=f"""
    WITH RECURSIVE {_BPE_RECURSION},
    doc_words AS (
      SELECT doc_id, unnest(regexp_extract_all(text, '[a-z]+')) AS word
      FROM documents
    )
    SELECT d.doc_id,
           CAST(SUM(len(f.syms)) AS BIGINT) AS n_bpe_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_words
    FROM doc_words d JOIN final_syms f USING (word)
    GROUP BY d.doc_id
    """,
)
def bpe_encoded_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE ENCODING oracled against the trained table: every document
    tokenized with the learned merges (bpe.py `bpe_encode`, the GPT-2
    rank-loop pandas UDF), summarized as tokens-per-doc. Because every
    corpus word was in the training vocabulary, the encoder's output
    for each word must equal the trainer's final symbol sequence — so
    the DuckDB side needs no encoder at all: it joins doc words to the
    recursive CTE's final table. A disagreement anywhere in the
    Arrow-batched apply loop (rank order, overlap handling, word cache)
    breaks the hash.

    Scale: encode is a shuffle-free map stage; the per-batch word cache
    makes it O(distinct words per batch), and the merge list broadcasts
    in the closure. Docs with zero [a-z] words are excluded on both
    sides (inner-join semantics)."""
    from etl_demo_spark.bpe import bpe_encode

    merges, _ = _bpe_trained(spark, sf_dir)
    (documents,) = _t(spark, sf_dir, "documents")
    enc = bpe_encode(documents, merges)
    return (
        enc.filter(F.size("bpe_tokens") > 0)
        .select(
            "doc_id",
            F.size("bpe_tokens").cast("long").alias("n_bpe_tokens"),
            F.expr(f"size(regexp_extract_all(text, '[a-z]+', 0))")
            .cast("long")
            .alias("n_words"),
        )
    )


@query(
    "doc_pii_scrub",
    oracle="""
    WITH enriched AS (
      SELECT doc_id,
             CASE WHEN doc_id % 7 = 0
                  THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
                       || '@example.com or +1 555-867-' || CAST(5000 + doc_id % 1000 AS VARCHAR)
                  ELSE text END AS text
      FROM documents
    )
    SELECT doc_id,
           CAST(length(regexp_extract_all(text,
                '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS INT) AS n_emails,
           CAST(length(regexp_extract_all(text,
                '\\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}')) AS INT) AS n_phones,
           md5(regexp_replace(regexp_replace(text,
                '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                '\\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}', '<PHONE>', 'g')) AS scrubbed_md5
    FROM enriched
    """,
)
def doc_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data PII hygiene (X-14): email/phone detection counts and
    the md5 of the redacted text. PII is planted deterministically from
    doc_id (every 7th doc) on BOTH engines so the scrub provably fires;
    the regex families avoid lookaround/backreferences so Java regex
    (Spark) and RE2 (DuckDB) agree. Narrow projection — codegen'd, no
    shuffle; comparing md5 of the scrubbed text checks the full
    replacement semantics, not just the counts."""
    from etl_demo_spark.text import pii_counts, scrub_pii

    (docs,) = _t(spark, sf_dir, "documents")
    planted = F.when(
        F.col("doc_id") % 7 == 0,
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or +1 555-867-"),
            (F.lit(5000) + F.col("doc_id") % 1000).cast("string"),
        ),
    ).otherwise(F.col("text"))
    enriched = docs.select("doc_id", planted.alias("text"))
    n_em, n_ph = pii_counts("text")
    return enriched.select(
        "doc_id",
        n_em.alias("n_emails"),
        n_ph.alias("n_phones"),
        F.md5(scrub_pii("text")).alias("scrubbed_md5"),
    )


@query(
    "split_contamination_report",
    oracle="""
    WITH assigned AS (
      SELECT doc_id,
             md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp,
             CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cd' THEN 'train'
                  WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    )
    SELECT fp,
           COUNT(*) AS n_docs,
           CAST(COUNT(DISTINCT split) AS INT) AS n_splits,
           array_to_string(list_sort(list(DISTINCT split)), ',') AS splits,
           CAST(MIN(doc_id) AS BIGINT) AS example_doc
    FROM assigned
    GROUP BY fp
    HAVING COUNT(DISTINCT split) > 1
    """,
)
def split_contamination_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test contamination audit: duplicate documents (by normalized
    fingerprint) whose copies land in DIFFERENT splits — the leak that
    silently inflates eval scores. Composition of the deterministic
    split assignment and fingerprint dedup; emits each contaminated
    fingerprint group with its split set.

    Scale: one shuffle on the 16-byte fingerprint; the split label is a
    narrow projection. The HAVING keeps only leaking groups, so output
    is proportional to contamination, not corpus size."""
    from etl_demo_spark.text import fingerprint, split_assign

    (docs,) = _t(spark, sf_dir, "documents")
    assigned = docs.select(
        "doc_id",
        fingerprint("text").alias("fp"),
        split_assign("doc_id").alias("split"),
    )
    return (
        assigned.groupBy("fp")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_distinct("split").cast("int").alias("n_splits"),
            F.array_join(F.array_sort(F.collect_set("split")), ",").alias("splits"),
            F.min("doc_id").alias("example_doc"),
        )
        .filter(F.col("n_splits") > 1)
    )


@query(
    "user_value_outliers",
    oracle="""
    WITH m AS (
      SELECT user_id,
             COUNT(*) AS n,
             CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS DOUBLE) AS s1,
             CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)
                      * CAST(ROUND(value * 100, 0) AS BIGINT)) AS DOUBLE) AS s2
      FROM events
      GROUP BY user_id
    ),
    stats AS (
      SELECT user_id, n,
             s1 / n AS mean_c,
             sqrt((s2 - (s1 * s1) / n) / n) AS sd_c
      FROM m WHERE n >= 10
    )
    SELECT e.user_id,
           CAST(COUNT(*) AS BIGINT) AS n_outliers,
           CAST(MIN(e.event_id) AS BIGINT) AS first_outlier_event
    FROM events e
    JOIN stats st ON e.user_id = st.user_id
    WHERE st.sd_c > 0.0
      AND abs(CAST(ROUND(e.value * 100, 0) AS BIGINT) - st.mean_c) > 3.0 * st.sd_c
    GROUP BY e.user_id
    """,
)
def user_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user 3-sigma outlier detection from EXACT moments: per-user
    count/sum/sum-of-squares accumulate in integer cent space, the
    mean/σ/threshold chain is fixed-order double arithmetic (÷, ×, sqrt
    and abs are all correctly-rounded IEEE ops — deterministic across
    engines, unlike a transcendental), and events beyond mean ± 3σ are
    counted per user.

    Scale: one shuffle for the moments, then the per-user stats (tiny)
    broadcast back onto the events scan — same two-pass shape as any
    profile-then-filter pipeline; no window state."""
    (ev,) = _t(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100, 0).cast("long")
    # decimal accumulators: a long SUM of squared cents wraps at cluster
    # scale; decimal(28,0) accumulation is exact at any row count and
    # casts to the same correctly-rounded double as DuckDB's HUGEINT sum
    m = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(cents.cast("decimal(28,0)")).cast("double").alias("s1"),
        F.sum((cents * cents).cast("decimal(28,0)")).cast("double").alias("s2"),
    )
    stats = (
        m.filter(F.col("n") >= 10)
        .select(
            "user_id",
            (F.col("s1") / F.col("n")).alias("mean_c"),
            F.sqrt((F.col("s2") - (F.col("s1") * F.col("s1")) / F.col("n")) / F.col("n")).alias("sd_c"),
        )
    )
    joined = ev.join(F.broadcast(stats), "user_id").filter(
        (F.col("sd_c") > 0.0)
        & (F.abs(cents - F.col("mean_c")) > F.lit(3.0) * F.col("sd_c"))
    )
    return joined.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_outliers"),
        F.min("event_id").alias("first_outlier_event"),
    )


@query(
    "incremental_dedup_two_batches",
    oracle="""
    WITH b1 AS (
      SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
      FROM documents WHERE doc_id % 2 = 0
    ),
    b2 AS (
      SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
      FROM documents WHERE doc_id % 2 = 1
    ),
    k1 AS (SELECT fp, MIN(doc_id) AS doc_id FROM b1 GROUP BY fp),
    k2 AS (
      SELECT w.fp, w.doc_id
      FROM (SELECT fp, MIN(doc_id) AS doc_id FROM b2 GROUP BY fp) w
      WHERE NOT EXISTS (SELECT 1 FROM k1 WHERE k1.fp = w.fp)
    )
    SELECT 'batch1' AS batch, COUNT(*) AS n_kept,
           CAST(MIN(doc_id) AS BIGINT) AS min_kept_doc FROM k1
    UNION ALL
    SELECT 'batch2' AS batch, COUNT(*) AS n_kept,
           CAST(MIN(doc_id) AS BIGINT) AS min_kept_doc FROM k2
    """,
)
def incremental_dedup_two_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-12 cross-batch incremental dedup (dedup.incremental_dedup) with
    the corpus split into two ingest batches by doc_id parity: batch 2
    must admit only fingerprints never accepted in batch 1. The oracle
    states the same semantics declaratively (min-id per fp within a
    batch; NOT EXISTS against the earlier batch's store)."""
    from etl_demo_spark.dedup import incremental_dedup

    (docs,) = _t(spark, sf_dir, "documents")
    b1 = docs.filter(F.col("doc_id") % 2 == 0)
    b2 = docs.filter(F.col("doc_id") % 2 == 1)
    kept1, store = incremental_dedup(b1, None)
    kept2, _ = incremental_dedup(b2, store)

    def summarize(kept: DataFrame, label: str) -> DataFrame:
        return kept.agg(
            F.lit(label).alias("batch"),
            F.count(F.lit(1)).alias("n_kept"),
            F.min("doc_id").alias("min_kept_doc"),
        ).select("batch", "n_kept", "min_kept_doc")

    return summarize(kept1, "batch1").unionByName(summarize(kept2, "batch2"))


# ---------------------------------------------------------------------------
# Business-analytics shapes (X-6/X-2 composition): time intelligence,
# segmentation, concentration, co-occurrence.
# ---------------------------------------------------------------------------


@query(
    "orders_yoy_growth",
    oracle=f"""
    WITH m AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
             CAST(SUM(CAST(o_totalprice AS {DEC_SQL})) AS DOUBLE) AS revenue
      FROM orders
      GROUP BY 1
    )
    SELECT month_start, revenue,
           lag(revenue, 12) OVER (ORDER BY month_start) AS revenue_prev_year,
           CASE WHEN lag(revenue, 12) OVER (ORDER BY month_start) IS NOT NULL
                THEN (revenue - lag(revenue, 12) OVER (ORDER BY month_start))
                     / lag(revenue, 12) OVER (ORDER BY month_start)
           END AS yoy_growth
    FROM m
    """,
)
def orders_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time intelligence: month revenue vs the same month last year
    (lag 12 over the monthly series) and relative growth. Revenue
    aggregates exactly in decimal; the growth ratio is one exactly-
    rounded division of identical doubles on both engines.

    Scale: the window runs over the MONTHLY aggregate (≤ a few hundred
    rows regardless of fact size) — the unpartitioned ORDER BY is on
    post-agg data, not facts."""
    from pyspark.sql.window import Window

    (orders,) = _t(spark, sf_dir, "orders")
    m = orders.groupBy(
        F.to_date(F.date_trunc("month", "o_orderdate")).alias("month_start")
    ).agg(dsum(dec("o_totalprice")).alias("revenue"))
    w = Window.orderBy("month_start")
    prev = F.lag("revenue", 12).over(w)
    return m.select(
        "month_start",
        "revenue",
        prev.alias("revenue_prev_year"),
        F.when(prev.isNotNull(), (F.col("revenue") - prev) / prev).alias("yoy_growth"),
    )


@query(
    "customer_rfm_segments",
    oracle=f"""
    WITH per_cust AS (
      SELECT o_custkey AS c_custkey,
             MAX(o_orderdate) AS last_order,
             COUNT(*) AS n_orders,
             CAST(SUM(CAST(o_totalprice AS {DEC_SQL})) AS DOUBLE) AS monetary
      FROM orders
      GROUP BY 1
    ),
    scored AS (
      SELECT c_custkey,
             ntile(4) OVER (ORDER BY last_order ASC, c_custkey ASC) AS r_score,
             ntile(4) OVER (ORDER BY n_orders ASC, c_custkey ASC) AS f_score,
             ntile(4) OVER (ORDER BY monetary ASC, c_custkey ASC) AS m_score
      FROM per_cust
    )
    SELECT r_score, f_score, m_score,
           COUNT(*) AS n_customers,
           CAST(MIN(c_custkey) AS BIGINT) AS example_cust
    FROM scored
    GROUP BY 1, 2, 3
    """,
)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per-customer recency/frequency/monetary quartiles
    (ntile with a custkey tiebreak — ntile is deterministic only under a
    total order) rolled up to segment sizes.

    Scale: one shuffle for the per-customer profile; the three ntile
    windows each need a global sort of CUSTOMER-grain rows (not facts).
    At 100 TB grain, swap ntile for approx-percentile bucket joins — same
    output contract."""
    from pyspark.sql.window import Window

    (orders,) = _t(spark, sf_dir, "orders")
    per_cust = orders.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("n_orders"),
        dsum(dec("o_totalprice")).alias("monetary"),
    )
    scored = per_cust.select(
        "c_custkey",
        F.ntile(4).over(Window.orderBy(F.col("last_order").asc(), F.col("c_custkey").asc())).cast("long").alias("r_score"),
        F.ntile(4).over(Window.orderBy(F.col("n_orders").asc(), F.col("c_custkey").asc())).cast("long").alias("f_score"),
        F.ntile(4).over(Window.orderBy(F.col("monetary").asc(), F.col("c_custkey").asc())).cast("long").alias("m_score"),
    )
    return scored.groupBy("r_score", "f_score", "m_score").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.min("c_custkey").alias("example_cust"),
    )


@query(
    "supplier_pareto",
    oracle=f"""
    WITH s AS (
      SELECT l_suppkey,
             SUM(CAST(l_extendedprice AS {DEC_SQL})
                 * (1 - CAST(l_discount AS {RATE_SQL}))) AS rev_d
      FROM lineitem
      GROUP BY 1
    ),
    ranked AS (
      SELECT l_suppkey,
             CAST(ROUND(rev_d, 2) AS DOUBLE) AS revenue,
             CAST(ROUND(SUM(rev_d) OVER (ORDER BY rev_d DESC, l_suppkey ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE)
                  / CAST(ROUND(SUM(rev_d) OVER (), 2) AS DOUBLE) AS cum_share
      FROM s
    )
    SELECT l_suppkey, revenue, cum_share,
           cum_share <= 0.8 AS in_top80
    FROM ranked
    """,
)
def supplier_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto / ABC analysis: suppliers ranked by revenue with cumulative
    revenue share and the 80% concentration flag. The running sum and the
    grand total both accumulate in EXACT decimal (order-independent), so
    the one double division per row is over identical operands on both
    engines.

    Scale: supplier-grain window (not facts); the running frame needs a
    global sort of suppliers — at extreme supplier cardinality this
    becomes a two-pass percentile bucketing, same contract."""
    from pyspark.sql.window import Window

    (li,) = _t(spark, sf_dir, "lineitem")
    s = li.groupBy("l_suppkey").agg(
        F.sum(dec("l_extendedprice") * (1 - rate("l_discount"))).alias("rev_d")
    )
    w_run = Window.orderBy(F.col("rev_d").desc(), F.col("l_suppkey").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.partitionBy()
    ranked = s.select(
        "l_suppkey",
        F.round(F.col("rev_d"), 2).cast("double").alias("revenue"),
        # exact decimal sums, ROUNDed to scale 2 in decimal space before
        # the double cast (scale-8 magnitudes here exceed the 2^53
        # correctly-rounded-cast bound — module docstring), then one
        # exactly-rounded double division; decimal/decimal division would
        # instead hit Spark's precision-38 cap and truncate to scale 6
        (
            F.round(F.sum("rev_d").over(w_run), 2).cast("double")
            / F.round(F.sum("rev_d").over(w_all), 2).cast("double")
        ).alias("cum_share"),
    )
    return ranked.select(
        "l_suppkey", "revenue", "cum_share", (F.col("cum_share") <= 0.8).alias("in_top80")
    )


@query(
    "basket_part_pairs",
    oracle="""
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    )
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
           COUNT(*) AS n_orders_together
    FROM items a JOIN items b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
    HAVING COUNT(*) >= 2
    ORDER BY n_orders_together DESC, part_a ASC, part_b ASC
    LIMIT 20
    """,
)
def basket_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: part pairs appearing together in the
    same order, top-20 by support (≥2 orders). The distinct projection
    collapses repeated parts per order BEFORE the self-join, and the
    a<b predicate halves the fan-out; the join is co-keyed on orderkey
    (one shuffle feeds both sides — exchange reuse), so pair volume is
    Σ k_i² over per-order item counts, bounded by basket size, never
    corpus².

    All-integer counts — exact."""
    (li,) = _t(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    a = items.alias("a")
    b = items.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("part_a"), F.col("b.l_partkey").alias("part_b")
        )
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_orders_together"))
        .filter(F.col("n_orders_together") >= 2)
        .orderBy(
            F.col("n_orders_together").desc(), F.col("part_a").asc(), F.col("part_b").asc()
        )
        .limit(20)
    )


@query(
    "doc_repetition_profile",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS l FROM documents
    ),
    grams AS (
      SELECT doc_id,
             CAST(len(l) AS BIGINT) AS n_tokens,
             CAST(len(l) - len(list_distinct(l)) AS BIGINT) AS dup_tokens,
             list_transform(range(1, greatest(len(l) - 2, 0) + 1),
                            i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2]) AS g3
      FROM toks
    )
    SELECT doc_id, n_tokens, dup_tokens,
           CAST(len(g3) - len(list_distinct(g3)) AS BIGINT) AS dup_3grams,
           CASE WHEN len(g3) > 0
                THEN CAST(len(g3) - len(list_distinct(g3)) AS DOUBLE) / CAST(len(g3) AS DOUBLE)
                ELSE 0.0 END AS rep_3gram_ratio
    FROM grams
    """,
)
def doc_repetition_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals per document: duplicate-token count
    and the duplicate-3-gram ratio (the fraction of trigram positions
    whose trigram already occurred — the standard boilerplate/looping
    filter in pretraining pipelines). All counts are set-vs-list length
    differences (exact integers); the one ratio is an exactly-rounded
    division of identical operands.

    Scale: narrow per-row array work (no shuffle) — JVM higher-order
    functions, no Python; the 3-gram list lives only inside the row."""
    from etl_demo_spark.text import tokens

    (docs,) = _t(spark, sf_dir, "documents")
    toks = tokens("text")
    n1 = F.greatest(F.size(toks) - 2, F.lit(0))
    g3 = F.zip_with(
        F.slice(toks, 1, n1),
        F.zip_with(F.slice(toks, 2, n1), F.slice(toks, 3, n1),
                   lambda b, c: F.concat_ws(" ", b, c)),
        lambda a, bc: F.concat_ws(" ", a, bc),
    )
    d = docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        (F.size(toks) - F.size(F.array_distinct(toks))).cast("long").alias("dup_tokens"),
        g3.alias("g3"),
    )
    dup3 = (F.size("g3") - F.size(F.array_distinct("g3"))).cast("long")
    return d.select(
        "doc_id", "n_tokens", "dup_tokens",
        dup3.alias("dup_3grams"),
        F.when(F.size("g3") > 0, dup3.cast("double") / F.size("g3").cast("double"))
        .otherwise(F.lit(0.0))
        .alias("rep_3gram_ratio"),
    )


@query(
    "doc_oov_rate",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS term
      FROM documents
    ),
    vocab AS (
      SELECT term FROM (
        SELECT term, COUNT(*) AS n FROM toks GROUP BY term
        ORDER BY n DESC, term ASC LIMIT 20
      )
    )
    SELECT t.doc_id,
           COUNT(*) AS n_tokens,
           CAST(SUM(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
           CAST(SUM(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS oov_rate
    FROM toks t LEFT JOIN vocab v ON t.term = v.term
    GROUP BY t.doc_id
    """,
)
def doc_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary rate per document against the corpus's own top-20
    vocabulary (deterministic count-then-term tiebreak) — the cheap
    distribution-shift / gibberish gate a pretraining pipeline runs
    before anything model-based. Integer counts + one exact division.

    Scale: the vocabulary is a TakeOrdered top-k (tiny) broadcast back
    onto the token stream; per-doc aggregation partial-aggregates
    map-side. Two shuffles total regardless of corpus size."""
    from etl_demo_spark.ops import spread_for_cpu
    from etl_demo_spark.text import tokens

    (docs,) = _t(spark, sf_dir, "documents")
    t = spread_for_cpu(docs).select(
        "doc_id", F.explode(tokens("text")).alias("term")
    )
    vocab = (
        t.groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("term").asc())
        .limit(20)
        .select("term", F.lit(1).alias("_in_vocab"))
    )
    oov = F.sum(F.when(F.col("_in_vocab").isNull(), 1).otherwise(0)).cast("long")
    return t.join(F.broadcast(vocab), "term", "left").groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        oov.alias("n_oov"),
        (oov.cast("double") / F.count(F.lit(1))).alias("oov_rate"),
    )


@query(
    "stream_trending_types",
    oracle="""
    WITH counts AS (
      SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_start,
             event_type,
             COUNT(*) AS n_events
      FROM events
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT hour_start, event_type, n_events,
             row_number() OVER (PARTITION BY hour_start
                                ORDER BY n_events DESC, event_type ASC) AS rnk
      FROM counts
    )
    SELECT hour_start, event_type, n_events, CAST(rnk AS INT) AS rnk
    FROM ranked WHERE rnk <= 3
    """,
)
def stream_trending_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-10 stream-then-serve: windowed counts computed by the REAL
    streaming engine (micro-batches into a memory sink — the streaming
    gold table), then per-window top-3 trending event types ranked
    batch-side over the sink — the standard lambda-free serving pattern
    (stream maintains the aggregate, cheap batch query serves ranks).
    Deterministic row_number tiebreak on event_type.

    Scale: the streaming agg holds one row of state per (hour, type)
    under the watermark; the ranking runs over the (tiny) finalized
    aggregate, never the raw stream."""
    from pyspark.sql.window import Window

    from etl_demo_spark.streaming import hourly_event_stats, read_events_stream

    stream = read_events_stream(spark, sf_dir)
    gold = _run_stream(spark, hourly_event_stats(stream))
    w = Window.partitionBy("hour_start").orderBy(
        F.col("n_events").desc(), F.col("event_type").asc()
    )
    return (
        gold.select("hour_start", "event_type", "n_events")
        .withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= 3)
    )


def gap_islands(k: DataFrame, key_col: str = "o_orderkey") -> DataFrame:
    """Contiguous-run detection over a distinct integer key frame (the
    value-minus-row_number trick), shared by the corpus query and its
    planted-gap unit test."""
    from pyspark.sql.window import Window

    grp = k.withColumn(
        "island_id",
        F.col(key_col) - F.row_number().over(Window.orderBy(key_col)),
    )
    return grp.groupBy("island_id").agg(
        F.min(key_col).alias("island_start"),
        F.max(key_col).alias("island_end"),
        F.count(F.lit(1)).alias("island_len"),
    ).drop("island_id")


@query(
    "orderkey_gap_islands",
    oracle="""
    WITH k AS (SELECT DISTINCT o_orderkey FROM orders),
    grp AS (
      SELECT o_orderkey,
             o_orderkey - row_number() OVER (ORDER BY o_orderkey) AS island_id
      FROM k
    )
    SELECT CAST(MIN(o_orderkey) AS BIGINT) AS island_start,
           CAST(MAX(o_orderkey) AS BIGINT) AS island_end,
           COUNT(*) AS island_len
    FROM grp
    GROUP BY island_id
    """,
)
def orderkey_gap_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands (X-6): contiguous orderkey runs via the classic
    value-minus-row_number grouping — the sequence-integrity check every
    ingest pipeline runs to find dropped id ranges. All-integer, exact.

    Scale: the global row_number needs a total order over DISTINCT keys —
    fine at key-grain; at extreme cardinality, range-partition by key and
    run the same expression per range with boundary stitching."""
    (orders,) = _t(spark, sf_dir, "orders")
    return gap_islands(orders.select("o_orderkey").distinct())


@query(
    "customer_merge_partitioned",
    oracle="""
    WITH source AS (
      SELECT c_custkey, 'ADJ_' || c_name AS c_name, c_nationkey,
             c_acctbal + 25.0 AS c_acctbal, c_mktsegment
      FROM customer WHERE c_custkey % 7 = 0 AND c_mktsegment = 'BUILDING'
      UNION ALL
      SELECT c_custkey + 20000000, 'NEWP_' || CAST(c_custkey AS VARCHAR),
             c_nationkey, 0.0 AS c_acctbal, 'BUILDING' AS c_mktsegment
      FROM customer WHERE c_custkey % 50 = 0
    )
    SELECT COALESCE(s.c_custkey, t.c_custkey) AS c_custkey,
           COALESCE(s.c_name, t.c_name) AS c_name,
           COALESCE(s.c_nationkey, t.c_nationkey) AS c_nationkey,
           COALESCE(s.c_acctbal, t.c_acctbal) AS c_acctbal,
           COALESCE(s.c_mktsegment, t.c_mktsegment) AS c_mktsegment
    FROM customer t FULL JOIN source s ON t.c_custkey = s.c_custkey
    """,
)
def customer_merge_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-scoped MERGE (io/tables.py): the customer table stored
    partitioned by c_mktsegment, merged with a change batch confined to
    the BUILDING segment — the merge rewrites exactly ONE of the five
    partitions (asserted: the returned blast radius is ['BUILDING'];
    byte-identity of untouched partitions is pinned in tests/
    test_tables.py). The oracle is the logical MERGE over the whole
    table — physical scoping must not change the answer.

    Scale: this is the shape that makes MERGE viable at 100 TB — the
    rewrite IO is proportional to the change's partition footprint, not
    the table. See io/tables.py module docstring for the staging-swap
    protocol and its crash-consistency contract."""
    import tempfile

    from etl_demo_spark.io.tables import merge_upsert_partitioned

    (customer,) = _t(spark, sf_dir, "customer")
    cols = ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"]
    target_path = tempfile.mkdtemp(prefix="merge_part_") + "/customer"
    customer.select(cols).write.partitionBy("c_mktsegment").parquet(target_path)

    updates = (
        customer.filter(
            (F.col("c_custkey") % 7 == 0) & (F.col("c_mktsegment") == "BUILDING")
        )
        .select(cols)
        .withColumn("c_name", F.concat(F.lit("ADJ_"), F.col("c_name")))
        .withColumn("c_acctbal", F.col("c_acctbal") + F.lit(25.0))
    )
    inserts = customer.filter(F.col("c_custkey") % 50 == 0).select(
        (F.col("c_custkey") + 20000000).alias("c_custkey"),
        F.concat(F.lit("NEWP_"), F.col("c_custkey").cast("string")).alias("c_name"),
        "c_nationkey",
        F.lit(0.0).alias("c_acctbal"),
        F.lit("BUILDING").alias("c_mktsegment"),
    )
    source = updates.unionByName(inserts)

    affected = merge_upsert_partitioned(
        spark, target_path, source, ["c_custkey"], "c_mktsegment"
    )
    assert affected == ["BUILDING"], affected
    merged = spark.read.parquet(target_path)
    return merged.select(
        "c_custkey",
        "c_name",
        F.col("c_nationkey").cast("long").alias("c_nationkey"),
        "c_acctbal",
        "c_mktsegment",
    )


@query(
    "orders_merge_two_level",
    oracle="""
    WITH t AS (
      SELECT o_orderkey, o_custkey, o_totalprice,
             CAST(year(o_orderdate) AS VARCHAR) AS dt,
             o_orderstatus AS seg
      FROM orders
    ),
    s AS (
      SELECT o_orderkey, o_custkey, o_totalprice + 10.0 AS o_totalprice,
             dt, seg
      FROM t WHERE o_orderkey % 9 = 0 AND dt = '1995' AND seg = 'F'
      UNION ALL
      SELECT o_orderkey + 30000000 AS o_orderkey, o_custkey,
             CAST(1.0 AS DOUBLE) AS o_totalprice,
             '1995' AS dt, 'F' AS seg
      FROM t WHERE o_orderkey % 1000 = 0
    )
    SELECT COALESCE(s.o_orderkey, t.o_orderkey) AS o_orderkey,
           COALESCE(s.o_custkey, t.o_custkey) AS o_custkey,
           COALESCE(s.o_totalprice, t.o_totalprice) AS o_totalprice,
           COALESCE(s.dt, t.dt) AS dt,
           COALESCE(s.seg, t.seg) AS seg
    FROM t FULL JOIN s ON t.o_orderkey = s.o_orderkey
    """,
)
def orders_merge_two_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-scoped MERGE on a TWO-LEVEL ``dt=…/seg=…`` layout
    (io/tables.py `merge_upsert_partitioned` with
    ``partition_cols=["dt","seg"]``) — the docs/SCALE_LAYOUT.md standard
    at 100 TB, where the blast radius must be the affected leaf TUPLE
    (one year × one status here), not the whole date partition. The
    change batch (updates + inserts) is confined to (1995, 'F'); the
    merge rewrites exactly that leaf (asserted), and the oracle is the
    logical MERGE over the whole table — physical scoping must not
    change the answer. Byte-identity of untouched leaves incl.
    same-dt siblings is pinned in tests/test_tables.py."""
    import tempfile

    from etl_demo_spark.io.tables import merge_upsert_partitioned

    (orders,) = _t(spark, sf_dir, "orders")
    t = orders.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.year("o_orderdate").cast("string").alias("dt"),
        F.col("o_orderstatus").alias("seg"),
    )
    target_path = tempfile.mkdtemp(prefix="merge_2lvl_") + "/orders"
    t.write.partitionBy("dt", "seg").parquet(target_path)

    updates = (
        t.filter((F.col("o_orderkey") % 9 == 0) & (F.col("dt") == "1995") & (F.col("seg") == "F"))
        .withColumn("o_totalprice", F.col("o_totalprice") + F.lit(10.0))
    )
    inserts = t.filter(F.col("o_orderkey") % 1000 == 0).select(
        (F.col("o_orderkey") + 30000000).alias("o_orderkey"),
        "o_custkey",
        F.lit(1.0).alias("o_totalprice"),
        F.lit("1995").alias("dt"),
        F.lit("F").alias("seg"),
    )
    source = updates.unionByName(inserts)

    affected = merge_upsert_partitioned(
        spark, target_path, source, ["o_orderkey"], ["dt", "seg"]
    )
    assert affected == [("1995", "F")], affected
    merged = spark.read.parquet(target_path)
    return merged.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.col("dt").cast("string").alias("dt"),
        F.col("seg").cast("string").alias("seg"),
    )


@query(
    "merge_schema_evolution",
    oracle="""
    WITH t AS (
      SELECT c_custkey, c_name, c_acctbal, c_mktsegment FROM customer
    ),
    s AS (
      SELECT c_custkey, c_acctbal + 100.0 AS c_acctbal,
             c_mktsegment, 'web' AS c_channel
      FROM customer WHERE c_mktsegment = 'MACHINERY' AND c_custkey % 11 = 0
      UNION ALL
      SELECT c_custkey + 40000000 AS c_custkey, CAST(0.0 AS DOUBLE) AS c_acctbal,
             'MACHINERY' AS c_mktsegment, 'app' AS c_channel
      FROM customer WHERE c_custkey % 400 = 0
    )
    SELECT COALESCE(s.c_custkey, t.c_custkey) AS c_custkey,
           t.c_name AS c_name,
           CASE WHEN s.c_custkey IS NOT NULL THEN s.c_acctbal
                ELSE t.c_acctbal END AS c_acctbal,
           COALESCE(s.c_mktsegment, t.c_mktsegment) AS c_mktsegment,
           s.c_channel AS c_channel
    FROM t FULL OUTER JOIN s ON t.c_custkey = s.c_custkey
    """,
)
def merge_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-EVOLVING partition-scoped MERGE under the snapshot manifest
    (`io/manifest.py merge_upsert_manifested(..., schema_evolution=True)`):
    the CDC producer added a field (``c_channel``) and stopped sending
    another (``c_name``) — the first schema drift every long-lived feed
    hits. Lakehouse automerge semantics, oracled column-by-column:
    source-only ``c_channel`` appends to the table schema (NULL in every
    untouched row — the manifest's stored schema surfaces it without a
    mergeSchema footer sweep), target-only ``c_name`` keeps the target
    value on match and is NULL for inserts (absent-from-source means
    "not set by this UPDATE", never "set to NULL").

    The change batch is confined to MACHINERY, so the evolution rewrites
    ONE partition (blast radius asserted) yet the schema change is
    visible table-wide in the same atomic manifest commit — schema and
    data evolve in one snapshot, which plain-parquet mergeSchema readers
    cannot get atomically. Time travel to the pre-evolution version
    still reads the OLD schema (pinned in tests/test_manifest.py).

    Scale: identical footprint to `orders_merge_two_level` (affected
    leaves only) + one pointer file; the stored-schema read spares every
    subsequent scan the O(files) footer union an evolved Hive-layout
    table would otherwise pay. Cite: reference `etl_weekly_trades.py`
    appends to SQLite and would simply crash on a new column."""
    import tempfile

    from etl_demo_spark.io.manifest import (
        manifest_init,
        merge_upsert_manifested,
        read_manifested,
    )

    (customer,) = _t(spark, sf_dir, "customer")
    t = customer.select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
    target_path = tempfile.mkdtemp(prefix="merge_evo_") + "/customer"
    t.write.partitionBy("c_mktsegment").parquet(target_path)
    manifest_init(spark, target_path, "c_mktsegment")

    updates = (
        customer.filter(
            (F.col("c_mktsegment") == "MACHINERY") & (F.col("c_custkey") % 11 == 0)
        )
        .select(
            "c_custkey",
            (F.col("c_acctbal") + F.lit(100.0)).alias("c_acctbal"),
            "c_mktsegment",
            F.lit("web").alias("c_channel"),
        )
    )
    inserts = customer.filter(F.col("c_custkey") % 400 == 0).select(
        (F.col("c_custkey") + 40000000).alias("c_custkey"),
        F.lit(0.0).alias("c_acctbal"),
        F.lit("MACHINERY").alias("c_mktsegment"),
        F.lit("app").alias("c_channel"),
    )
    source = updates.unionByName(inserts)

    affected = merge_upsert_manifested(
        spark, target_path, source, ["c_custkey"], "c_mktsegment",
        schema_evolution=True,
    )
    assert affected == ["MACHINERY"], affected
    merged = read_manifested(spark, target_path)
    return merged.select(
        "c_custkey",
        "c_name",
        "c_acctbal",
        F.col("c_mktsegment").cast("string").alias("c_mktsegment"),
        "c_channel",
    )


@query(
    "orders_keyset_page",
    oracle="""
    SELECT o_orderkey, o_orderdate, o_totalprice
    FROM orders
    ORDER BY o_orderdate, o_orderkey
    LIMIT 20 OFFSET 40
    """,
)
def orders_keyset_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-9 keyset pagination (`ops.keyset_page`): the page after cursor
    (o_orderdate, o_orderkey) of row 40 — exactly rows 41–60 of the total
    order, which is what the OFFSET oracle computes, so the equivalence
    IS the correctness claim. The cursor fetch here is a bounded 40-row
    TakeOrdered standing in for the client's stored cursor.

    Scale: unlike OFFSET (depth-proportional TakeOrdered through the
    driver — see `orders_page_two`), the cursor predicate is pushed to
    the parquet scan as a plain OR-of-comparisons (plan pinned in
    tests/test_plans.py), so page 10⁶ costs the same as page 2."""
    from etl_demo_spark.ops import keyset_page

    (orders,) = _t(spark, sf_dir, "orders")
    base = orders.select("o_orderkey", "o_orderdate", "o_totalprice")
    boundary = base.orderBy("o_orderdate", "o_orderkey").limit(40).collect()[-1]
    last = (boundary["o_orderdate"], boundary["o_orderkey"])
    return keyset_page(base, ["o_orderdate", "o_orderkey"], last, 20)


@query(
    "orders_keyset_page_desc",
    oracle="""
    SELECT o_orderkey, o_orderdate, o_totalprice
    FROM orders
    ORDER BY o_orderdate DESC, o_orderkey ASC
    LIMIT 20 OFFSET 40
    """,
)
def orders_keyset_page_desc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-9 keyset pagination, newest-first with a MIXED-direction order
    (`ORDER BY o_orderdate DESC, o_orderkey ASC` — the standard feed
    shape): page after the cursor at row 40, equal by construction to
    the OFFSET oracle. The mixed cursor decomposes to
    (o_orderdate < d) OR (o_orderdate = d AND o_orderkey > k), which
    still pushes to the parquet scan whole (LessThan + EqualTo +
    GreaterThan in PushedFilters — plan pinned in tests/test_plans.py),
    so paging a 100 TB feed backwards in time costs one pruned scan per
    page at any depth."""
    from etl_demo_spark.ops import keyset_page

    (orders,) = _t(spark, sf_dir, "orders")
    base = orders.select("o_orderkey", "o_orderdate", "o_totalprice")
    order = [("o_orderdate", "desc"), ("o_orderkey", "asc")]
    boundary = (
        base.orderBy(F.col("o_orderdate").desc(), F.col("o_orderkey").asc())
        .limit(40)
        .collect()[-1]
    )
    last = (boundary["o_orderdate"], boundary["o_orderkey"])
    return keyset_page(base, order, last, 20)


@query(
    "media_resize_checksum",
    oracle="""
    WITH d AS (
      SELECT doc_id, 8 + doc_id % 57 AS w FROM documents
    ),
    px AS (
      SELECT doc_id, w, (x * 8) // w AS j, (x * 255) // w AS v
      FROM d, LATERAL unnest(generate_series(0, w - 1)) AS t(x)
    ),
    outcols AS (
      SELECT doc_id, j, SUM(v) // COUNT(*) AS ov
      FROM px GROUP BY doc_id, j
    )
    SELECT doc_id AS media_id, 8 AS width, 8 AS height,
           CAST(3 * 8 * SUM(ov) AS BIGINT) AS pix_sum
    FROM outcols GROUP BY doc_id
    """,
)
def media_resize_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL pixel round trip, exactly oracled: per document synthesize an
    x-gradient RGB PNG (value (x·255)//w, w = 8 + doc_id % 57,
    h = 8 + len(text) % 57 — all ≥ 8 so the 8×8 resize strictly
    downsamples), run the REAL resize (`multimodal.resize_images`: zlib
    pixel decode → exact-integer box resample → RGB re-encode), decode
    the RESULT's pixels again and return dimensions + the exact pixel
    sum. The oracle recomputes the box averages arithmetically in SQL —
    the gradient depends only on x, so each output column is
    (Σ_{x∈block_j} (x·255)//w) // |block_j| and the checksum is
    3 channels × 8 rows × Σ_j out_j. A hash match proves encoder, zlib
    round trip, un-filtering, and the resample's integer arithmetic all
    bit-agree on every row.

    Plan shape: two narrow Arrow-batched Python stages (blob build,
    resize+decode), no shuffle — blobs never leave their partition."""
    import numpy as np

    from etl_demo_spark.io.png import decode_png_pixels, png_bytes
    from etl_demo_spark.multimodal import resize_images

    (docs,) = _t(spark, sf_dir, "documents")

    def build(it):
        for pdf in it:
            blobs = []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                w = 8 + int(did) % 57
                h = 8 + len(text) % 57
                col = ((np.arange(w, dtype=np.int64) * 255) // w).astype(np.uint8)
                blobs.append(png_bytes(np.stack([np.tile(col, (h, 1))] * 3, axis=2)))
            yield pd.DataFrame({"media_id": pdf["doc_id"], "content": blobs})

    media = docs.select("doc_id", "text").mapInPandas(
        build, "media_id bigint, content binary"
    )
    resized = resize_images(media, width=8, height=8)

    def checksum(it):
        for pdf in it:
            widths, heights, sums = [], [], []
            for b in pdf["content"]:
                px = decode_png_pixels(bytes(b))
                heights.append(px.shape[0]); widths.append(px.shape[1])
                sums.append(int(px.astype(np.int64).sum()))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": pd.Series(widths, dtype="int32"),
                    "height": pd.Series(heights, dtype="int32"),
                    "pix_sum": pd.Series(sums, dtype="int64"),
                }
            )

    return resized.mapInPandas(
        checksum, "media_id bigint, width int, height int, pix_sum bigint"
    )


@query(
    "media_gif_resize_checksum",
    oracle="""
    WITH d AS (
      SELECT doc_id, 8 + doc_id % 57 AS w FROM documents
    ),
    px AS (
      SELECT doc_id, w, (x * 8) // w AS j, (x * 255) // w AS v
      FROM d, LATERAL unnest(generate_series(0, w - 1)) AS t(x)
    ),
    outcols AS (
      SELECT doc_id, j, SUM(v) // COUNT(*) AS ov
      FROM px GROUP BY doc_id, j
    )
    SELECT doc_id AS media_id, 8 AS width, 8 AS height,
           CAST(3 * 8 * SUM(ov) AS BIGINT) AS pix_sum
    FROM outcols GROUP BY doc_id
    """,
)
def media_gif_resize_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GIF twin of `media_resize_checksum`, exactly oracled: per document
    synthesize an x-gradient GIF (palette index (x·255)//w over a
    256-entry grayscale table; w = 8 + doc_id % 57,
    h = 8 + len(text) % 57) with the from-scratch LZW ENCODER
    (`io/gif.py`), run the REAL resize (`multimodal.resize_images` now
    dispatches PNG→GIF decode: LZW inflate → palette resolve →
    exact-integer box resample → RGB PNG re-encode), decode the result
    and return dimensions + the exact pixel sum. Same closed-form SQL
    oracle as the PNG query — the gradient depends only on x — so a hash
    match proves the GIF container build, LZW round trip, palette
    mapping, and the resample all bit-agree on every row.

    Plan shape: two narrow Arrow-batched Python stages, no shuffle."""
    import numpy as np

    from etl_demo_spark.io.gif import gif_bytes
    from etl_demo_spark.io.png import decode_png_pixels
    from etl_demo_spark.multimodal import resize_images

    (docs,) = _t(spark, sf_dir, "documents")

    def build(it):
        palette = np.stack([np.arange(256, dtype=np.uint8)] * 3, axis=1)
        for pdf in it:
            blobs = []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                w = 8 + int(did) % 57
                h = 8 + len(text) % 57
                col = ((np.arange(w, dtype=np.int64) * 255) // w).astype(np.uint8)
                blobs.append(gif_bytes(np.tile(col, (h, 1)), palette))
            yield pd.DataFrame({"media_id": pdf["doc_id"], "content": blobs})

    media = docs.select("doc_id", "text").mapInPandas(
        build, "media_id bigint, content binary"
    )
    resized = resize_images(media, width=8, height=8)

    def checksum(it):
        for pdf in it:
            widths, heights, sums = [], [], []
            for b in pdf["content"]:
                px = decode_png_pixels(bytes(b))
                heights.append(px.shape[0]); widths.append(px.shape[1])
                sums.append(int(px.astype(np.int64).sum()))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": pd.Series(widths, dtype="int32"),
                    "height": pd.Series(heights, dtype="int32"),
                    "pix_sum": pd.Series(sums, dtype="int64"),
                }
            )

    return resized.mapInPandas(
        checksum, "media_id bigint, width int, height int, pix_sum bigint"
    )


@query(
    "media_jpeg_resize_checksum",
    oracle="""
    WITH base AS (
      SELECT doc_id, 1 + doc_id % 7 AS nbx, 8 * (1 + doc_id % 7) AS w
      FROM documents
    ),
    px AS (
      SELECT doc_id, (x * 8) // w AS j,
             CAST((((x // 8) * 255) // nbx + doc_id) % 256 AS BIGINT) - 128 AS k
      FROM base, LATERAL unnest(generate_series(0, w - 1)) AS t(x)
    ),
    dec AS (
      SELECT doc_id, j,
             LEAST(255, GREATEST(0,
               128 + 2 * (CASE WHEN k >= 0 THEN (k + 1) // 2
                               ELSE -((1 - k) // 2) END))) AS dv
      FROM px
    ),
    outcols AS (
      SELECT doc_id, j, SUM(dv) // COUNT(*) AS ov
      FROM dec GROUP BY doc_id, j
    )
    SELECT doc_id AS media_id, 8 AS width, 8 AS height,
           CAST(3 * 8 * SUM(ov) AS BIGINT) AS pix_sum
    FROM outcols GROUP BY doc_id
    """,
)
def media_jpeg_resize_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JPEG sibling of the PNG/GIF checksum queries, exactly oracled
    through a LOSSY codec: per document synthesize a block-constant
    x-gradient grayscale JPEG at quality 50 (every 8x8 block one value
    v(bx) = ((bx*255)//nbx + doc_id) % 256; w = 8*(1 + doc_id % 7),
    h = 8*(1 + len(text) % 7)) with the from-scratch baseline ENCODER
    (`io/jpeg.py`), run the REAL resize (`multimodal.resize_images`
    dispatches PNG→GIF→JPEG decode: Huffman inflate → dequant → IDCT →
    exact-integer box resample → RGB PNG re-encode), decode the result
    and return dimensions + the exact pixel sum.

    The oracle is closed-form because quality 50 keeps the luminance DC
    quantizer at exactly 16, so a constant block round-trips to
    clamp(2*round_half_away((v-128)/2) + 128) — integer arithmetic DuckDB
    replays with CASE + floor division. A hash match proves Huffman
    encode/decode, DC prediction, zigzag, quantization tie behavior, the
    IDCT path and the resample all bit-agree on every row of a lossy
    format's output.

    Plan shape: two narrow Arrow-batched Python stages, no shuffle —
    blobs never leave their partition."""
    import numpy as np

    from etl_demo_spark.io.jpeg import jpeg_bytes
    from etl_demo_spark.io.png import decode_png_pixels
    from etl_demo_spark.multimodal import resize_images

    (docs,) = _t(spark, sf_dir, "documents")

    def build(it):
        for pdf in it:
            blobs = []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                nbx = 1 + int(did) % 7
                w = 8 * nbx
                h = 8 * (1 + len(text) % 7)
                bx = np.arange(nbx, dtype=np.int64)
                v = ((bx * 255) // nbx + int(did)) % 256
                col = np.repeat(v, 8).astype(np.uint8)
                blobs.append(jpeg_bytes(np.tile(col, (h, 1)), quality=50))
            yield pd.DataFrame({"media_id": pdf["doc_id"], "content": blobs})

    media = docs.select("doc_id", "text").mapInPandas(
        build, "media_id bigint, content binary"
    )
    resized = resize_images(media, width=8, height=8)

    def checksum(it):
        for pdf in it:
            widths, heights, sums = [], [], []
            for b in pdf["content"]:
                px = decode_png_pixels(bytes(b))
                heights.append(px.shape[0]); widths.append(px.shape[1])
                sums.append(int(px.astype(np.int64).sum()))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": pd.Series(widths, dtype="int32"),
                    "height": pd.Series(heights, dtype="int32"),
                    "pix_sum": pd.Series(sums, dtype="int64"),
                }
            )

    return resized.mapInPandas(
        checksum, "media_id bigint, width int, height int, pix_sum bigint"
    )


@query(
    "media_video_frame_checksum",
    oracle="""
    WITH f AS (
      SELECT doc_id, x AS fidx
      FROM documents, LATERAL unnest(generate_series(0, doc_id % 5, 2)) AS t(x)
    ),
    vals AS (
      SELECT doc_id, CAST((fidx * 40 + doc_id) % 256 AS BIGINT) AS v FROM f
    ),
    dec AS (
      SELECT doc_id,
             CASE WHEN doc_id % 2 = 0 THEN
               LEAST(255, GREATEST(0, 128 + 2 *
                 (CASE WHEN v >= 128 THEN (v - 127) // 2
                       ELSE -((129 - v) // 2) END)))
             ELSE v END AS dv
      FROM vals
    )
    SELECT doc_id AS media_id, COUNT(*) AS n_frames,
           CAST(SUM(3 * 16 * 16 * dv) AS BIGINT) AS pix_sum
    FROM dec GROUP BY doc_id
    """,
)
def media_video_frame_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video frame sampling, exactly oracled across BOTH containers:
    per document synthesize a 16x16 clip with F = 1 + doc_id % 5
    constant-gray frames (frame f's value (f*40 + doc_id) % 256) — even
    doc_ids as MJPEG-in-AVI at quality 50 (every frame a baseline JPEG),
    odd doc_ids as lossless Y4M mono — then run the REAL sampler
    (`multimodal.sample_video_frames`, every_n=2: container sniff → RIFF
    walk + Huffman/IDCT per frame, or raw-YUV parse → RGB PNG per
    sampled frame), decode each emitted PNG and aggregate per-doc frame
    counts + exact pixel sums.

    The oracle enumerates sampled frame indices with generate_series and
    replays the JPEG constant-block closed form (quality-50 DC quantizer
    = 16) for even docs and the identity for odd docs. A hash match
    proves the AVI walk, per-frame JPEG entropy decode, Y4M plane math,
    the sampling stride, and the PNG re-encode all bit-agree.

    Plan shape: narrow build → row-expanding frame fan-out → per-frame
    checksum (all Arrow-batched, zero shuffles) → one final hash
    aggregate on media_id."""
    import numpy as np

    from etl_demo_spark.io.jpeg import jpeg_bytes
    from etl_demo_spark.io.png import decode_png_pixels
    from etl_demo_spark.io.video import avi_mjpeg_bytes, y4m_bytes
    from etl_demo_spark.multimodal import sample_video_frames

    (docs,) = _t(spark, sf_dir, "documents")

    def build(it):
        for pdf in it:
            blobs = []
            for did in pdf["doc_id"]:
                did = int(did)
                nf = 1 + did % 5
                frames = [
                    np.full((16, 16), (f * 40 + did) % 256, np.uint8)
                    for f in range(nf)
                ]
                if did % 2 == 0:
                    jf = [jpeg_bytes(fr, quality=50) for fr in frames]
                    blobs.append(avi_mjpeg_bytes(jf, 16, 16))
                else:
                    blobs.append(y4m_bytes(frames))
            yield pd.DataFrame({"media_id": pdf["doc_id"], "content": blobs})

    media = docs.select("doc_id").mapInPandas(build, "media_id bigint, content binary")
    frames = sample_video_frames(media, every_n=2)

    def checksum(it):
        for pdf in it:
            sums = []
            for b in pdf["frame"]:
                px = decode_png_pixels(bytes(b))
                sums.append(int(px.astype(np.int64).sum()))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "fsum": pd.Series(sums, dtype="int64"),
                }
            )

    per_frame = frames.mapInPandas(checksum, "media_id bigint, fsum bigint")
    return per_frame.groupBy("media_id").agg(
        F.count("*").alias("n_frames"), F.sum("fsum").alias("pix_sum")
    )


@query(
    "stream_replay_hourly_stats",
    oracle="""
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def stream_replay_hourly_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-1/X-10 custom streaming SOURCE end-to-end: the events table is
    materialized as a sorted replay log and streamed back through the
    repo's Python-DataSource replay source (`io/replay_source.py` —
    row-index offsets, executor-parallel pyarrow range partitions), then
    aggregated by the SAME tumbling-window pipeline the file-source
    streaming query uses. The oracle is the plain batch aggregate: a
    hash match proves the custom source delivered every row exactly once
    with the right schema through a real incremental execution.

    Scale: this is the backfill topology — replay a stored log through
    the production streaming query; offsets are row ranges, so the source
    parallelizes by slice and checkpoint-resumes mid-log."""
    import tempfile

    from etl_demo_spark.io.replay_source import (
        register_replay_source,
        write_replay_log,
    )
    from etl_demo_spark.streaming import hourly_event_stats

    (events,) = _t(spark, sf_dir, "events")
    register_replay_source(spark)
    log = tempfile.mkdtemp(prefix="replay_log_") + "/events"
    write_replay_log(events, log, ["ts", "event_id"])
    stream = spark.readStream.format("replay").option("path", log).load()
    # the replay schema is timestamp_ntz (parquet physical); the window
    # pipeline expects the session-zone timestamp the file reader yields
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return _run_stream(spark, hourly_event_stats(stream))


# ---------------------------------------------------------------------------
# Distributed global ranking + sorted-neighborhood dedup (round 5).
# ---------------------------------------------------------------------------


@query(
    "orders_global_ranked",
    oracle="""
    SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice,
           ROW_NUMBER() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rn
    FROM orders
    """,
)
def orders_global_ranked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-6/X-9 at scale: a GLOBAL ROW_NUMBER over the whole table with NO
    single-partition window (ops.global_row_number). ``ROW_NUMBER() OVER
    (ORDER BY ...)`` — no PARTITION BY — is the classic 100 TB trap:
    Spark funnels every row through ONE task. This operator instead
    range-partitions on the order (the same exchange a distributed ORDER
    BY pays), derives within-partition positions for free from
    monotonically_increasing_id's documented (pid << 33 | pos) layout,
    and broadcasts O(num_partitions) prefix-sum offsets back — one wide
    shuffle total, every partition ranked in parallel.

    The oracle is DuckDB's actual global ROW_NUMBER, so the hash match
    proves the decomposition is exactly the single-threaded semantics.
    The (o_totalprice DESC, o_orderkey) order is total — ranks are
    well-defined on both engines."""
    from etl_demo_spark.ops import global_row_number

    (orders,) = _t(spark, sf_dir, "orders")
    ranked = global_row_number(
        orders.select("o_orderkey", F.col("o_totalprice").cast("double").alias("o_totalprice")),
        [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        rank_col="rn",
    )
    return ranked.select("o_orderkey", "o_totalprice", "rn")


@query(
    "sorted_neighborhood_dups",
    oracle="""
    WITH ranked AS (
      SELECT doc_id, text,
             ROW_NUMBER() OVER (
               ORDER BY lang || ':' || substring(lower(text), 1, 16), doc_id
             ) AS rn
      FROM documents
    ),
    sh AS (
      SELECT doc_id, rn,
             list_distinct(list_transform(generate_series(1, len(text) - 4),
                                          i -> substring(text, i, 5))) AS shingles
      FROM ranked
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
           / (len(a.shingles) + len(b.shingles)
              - len(list_intersect(a.shingles, b.shingles))) AS jaccard
    FROM sh a JOIN sh b ON b.rn > a.rn AND b.rn <= a.rn + 10
    WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
          / (len(a.shingles) + len(b.shingles)
             - len(list_intersect(a.shingles, b.shingles))) >= 0.3
    """,
)
def sorted_neighborhood_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-12 third blocking family — Sorted-Neighborhood (merge/purge):
    documents sorted by the fuzzy key ``lang || ':' || lower(text[:16])``,
    candidates = pairs within 10 rank positions, then EXACT char-5-gram
    Jaccard ≥ 0.3 on candidates only (dedup.sorted_neighborhood_candidates
    composed with a rejoin verify, the same second stage LSH uses).

    EXACTLY oracled: DuckDB replays the identical global ROW_NUMBER
    (pure-ASCII corpus, binary collation on both engines, doc_id
    tiebreak), the identical window-10 neighborhood, and the identical
    integer-ratio Jaccard — a hash match proves the distributed rank
    decomposition (range shuffle + mid-decomposition + offset broadcast,
    ops.global_row_number) equals the single-threaded semantics end to
    end, and that the bucket-exploded neighborhood join emits exactly
    the |Δrank| ≤ w pair set.

    Scale: one range exchange + an equi-join with fixed 2× fan-out —
    candidate count is n·w by CONSTRUCTION (prefix-filter joins grow
    with token-frequency skew; LSH with band collisions). The verify
    stage shingles candidate docs only."""
    from etl_demo_spark.dedup import sorted_neighborhood_candidates

    (docs,) = _t(spark, sf_dir, "documents")
    key = F.concat(F.col("lang"), F.lit(":"), F.lower(F.substring("text", 1, 16)))
    cands = sorted_neighborhood_candidates(docs, key, id_col="doc_id", window=10)
    sh = docs.select(
        "doc_id",
        F.expr(
            # sub-5-char guard: Spark's sequence(1, n<=0) descends
            "CASE WHEN length(text) >= 5 THEN"
            " array_distinct(transform(sequence(1, length(text) - 4),"
            " i -> substring(text, i, 5)))"
            " ELSE array() END"
        ).alias("shingles"),
    )
    a = sh.select(F.col("doc_id").alias("id_a"), F.col("shingles").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("shingles").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        cands.join(a, "id_a")
        .join(b, "id_b")
        .select("id_a", "id_b", (inter.cast("double") / union).alias("jaccard"))
        .filter(F.col("jaccard") >= 0.3)
    )


@query(
    "semantic_dedup_planted",
    oracle="""
    SELECT vec_id, TRUE AS kept FROM embeddings
    UNION ALL
    SELECT vec_id + 1000000 AS vec_id, FALSE AS kept FROM embeddings
    UNION ALL
    SELECT vec_id + 2000000 AS vec_id, FALSE AS kept FROM embeddings
    """,
)
def semantic_dedup_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-12/X-13 SemDeDup — cluster-scoped embedding dedup with a
    keep-one-representative DECISION (vec.semantic_dedup), not just pair
    listing: sign-LSH cells → integer-exact in-cell cosine ≥ 0.9 →
    keep-first-by-id anti-join. Emits (vec_id, kept) for every row.

    EXACTLY oracled by the same analytical planting as
    embedding_near_dups: two positive scalar copies of every vector
    (×2.0 at id+1M, ×3.0 at id+2M) co-bucket with their original by
    construction (a positive scaling flips no hyperplane sign) at
    cosine ≈ 1 ≫ 0.9, while the raw corpus is near-orthogonal (measured
    max pairwise cosine 0.60 at sf0.1 — and quantization perturbs
    cosines by ≲ 1e-5, nowhere near the 0.3 gap). So the unique correct
    answer is closed-form: every original kept, every copy removed
    (each copy sees a smaller-id in-cell neighbor at sim ≈ 1; each
    original's neighbors are all below threshold). The decision layer —
    in-cell EXISTS against smaller ids, distinct, anti-join — is
    engine-side real work the pair query never exercised."""
    from etl_demo_spark.vec import semantic_dedup

    (emb,) = _t(spark, sf_dir, "embeddings")
    base = emb.select("vec_id", "embedding")
    scaled2 = base.select(
        (F.col("vec_id") + F.lit(1_000_000)).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(2.0)).alias("embedding"),
    )
    scaled3 = base.select(
        (F.col("vec_id") + F.lit(2_000_000)).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(3.0)).alias("embedding"),
    )
    planted = base.unionByName(scaled2).unionByName(scaled3)
    return semantic_dedup(planted, threshold=0.9, planes=6)


@query(
    "orders_mv_incremental",
    oracle="""
    WITH post_dml AS (
        SELECT o_orderpriority, o_custkey,
               CAST(CASE WHEN o_orderstatus = 'P'
                         THEN o_totalprice + 7.0
                         ELSE o_totalprice END AS DECIMAL(18,2)) AS px
        FROM orders
    )
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(px) AS DOUBLE) AS revenue,
           CAST(MAX(px) AS DOUBLE) AS max_price,
           CAST(MIN(o_custkey) AS BIGINT) AS min_cust
    FROM post_dml
    WHERE NOT (px > 450000.00)
    GROUP BY o_orderpriority
    """,
)
def orders_mv_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained MATERIALIZED VIEW over the manifest
    change feed (mv.py): create the view at the base snapshot, run two
    DML commits against the base — a partition-moving predicate UPDATE
    (every pending order finalizes with a fee) and a predicate DELETE
    (drop the >450k price tier, which removes every group's stored
    maximum) — and REFRESH incrementally after each. The oracle is the
    full aggregate over the post-DML table: two change-feed folds plus
    one bounded MIN/MAX repair must land on exactly the state a full
    recompute would. Both refreshes are asserted 'incremental' (never
    the full-recompute fallback), and the DELETE refresh is asserted to
    repair every group — the deleted tier crosses each stored max.

    Scale: the folds read only CHANGED leaves of the base (two multiset
    EXCEPT ALLs), the repair re-reads the base restricted to touched
    groups via a broadcast semi-join, and each refresh commits atomically
    through the snapshot-manifest merge — a nightly 100 TB aggregate
    refresh costs O(diff), not a table scan. SUMs fold in exact DECIMAL
    (associative), so the incremental state is bit-identical to the
    recompute. Cite: reference `etl_weekly_trades.py:107-156` recomputes
    its weekly aggregate from scratch every run — this is that job's
    engine-grade replacement."""
    import tempfile

    from etl_demo_spark.io.manifest import (
        delete_where_manifested,
        update_where_manifested,
        write_manifested,
    )
    from etl_demo_spark.mv import mv_create, mv_read, mv_refresh

    (orders,) = _t(spark, sf_dir, "orders")
    t = orders.select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus",
        "o_orderpriority",
    )
    root = tempfile.mkdtemp(prefix="mv_inc_")
    base, mv = f"{root}/orders", f"{root}/by_priority"
    write_manifested(t, base, "o_orderstatus")
    mv_create(
        spark, base, mv,
        keys=["o_orderpriority"],
        aggs={
            "n_orders": ("count", None),
            "revenue": ("sum", "px"),
            "max_price": ("max", "px"),
            "min_cust": ("min", "o_custkey"),
        },
        derived={"px": "CAST(o_totalprice AS DECIMAL(18,2))"},
        buckets=4,
    )

    update_where_manifested(
        spark, base,
        {"o_totalprice": F.col("o_totalprice") + F.lit(7.0),
         "o_orderstatus": F.lit("F")},
        F.col("o_orderstatus") == "P",
        "o_orderstatus",
    )
    r1 = mv_refresh(spark, mv, cost_based=False)
    assert r1["mode"] == "incremental", r1

    delete_where_manifested(
        spark, base, F.col("o_totalprice") > 450000.0, "o_orderstatus"
    )
    r2 = mv_refresh(spark, mv, cost_based=False)
    assert r2["mode"] == "incremental", r2
    assert r2["recomputed_groups"] >= 1, r2  # the deleted tier held each max

    return mv_read(spark, mv).select(
        "o_orderpriority",
        "n_orders",
        F.col("revenue").cast("double").alias("revenue"),
        F.col("max_price").cast("double").alias("max_price"),
        F.col("min_cust").cast("bigint").alias("min_cust"),
    )


@query(
    "event_value_gapfill",
    oracle="""
    WITH sparse AS (
      SELECT event_type, date_trunc('hour', ts) AS bucket,
             CAST(ROUND(AVG(value) * 10000) AS BIGINT) AS v
      FROM events WHERE value > 180 GROUP BY 1, 2
    ),
    bounds AS (
      SELECT event_type, MIN(bucket) AS lo, MAX(bucket) AS hi
      FROM sparse GROUP BY 1
    ),
    spine AS (
      SELECT event_type,
             unnest(generate_series(lo, hi, INTERVAL 1 hour)) AS bucket
      FROM bounds
    ),
    dense AS (
      SELECT s.event_type, s.bucket, sp.v,
             ROW_NUMBER() OVER (PARTITION BY s.event_type
                                ORDER BY s.bucket) AS rn
      FROM spine s LEFT JOIN sparse sp
        ON s.event_type = sp.event_type AND s.bucket = sp.bucket
    ),
    marked AS (
      SELECT *,
        LAST_VALUE(v IGNORE NULLS) OVER w_prev AS pv,
        LAST_VALUE(CASE WHEN v IS NOT NULL THEN rn END IGNORE NULLS)
          OVER w_prev AS pr,
        FIRST_VALUE(v IGNORE NULLS) OVER w_next AS nv,
        FIRST_VALUE(CASE WHEN v IS NOT NULL THEN rn END IGNORE NULLS)
          OVER w_next AS nr
      FROM dense
      WINDOW w_prev AS (PARTITION BY event_type ORDER BY bucket
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             w_next AS (PARTITION BY event_type ORDER BY bucket
                        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT event_type,
           strftime(bucket, '%Y-%m-%d %H:00:00') AS bucket,
           CASE WHEN v IS NOT NULL THEN v / 10000.0
                WHEN pr IS NOT NULL AND nr IS NOT NULL
                  THEN ((pv * (nr - rn) + nv * (rn - pr))
                        / CAST(nr - pr AS DOUBLE)) / 10000.0
           END AS value_filled,
           (v IS NULL AND pr IS NOT NULL AND nr IS NOT NULL)
             AS interpolated
    FROM marked
    """,
)
def event_value_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series GAP FILLING with linear interpolation
    (`ops.gap_fill_interpolate`) — the time_bucket_gapfill+interpolate
    shape: hourly mean `value` per event type over a deliberately
    sparsified series (value > 180 keeps ~30% of hours), densified to
    the full per-type hour spine with interior gaps linearly
    interpolated between the bracketing observations and edge gaps NULL.

    Cross-engine exactness: bucket means are scaled to INTEGERS
    (round(avg·10⁴)) before interpolation, the operator's
    weighted-average form keeps the numerator exact, and the single
    int/int division is IEEE-identical on both engines — no final-round
    boundary exists, the whole fill replays bit-for-bit in DuckDB
    window functions.

    Scale shape: the spine is `sequence()` exploded executor-side (no
    driver loop), one exchange for the bounds agg, one for the
    spine⋈observed join, per-key window sorts ride that partitioning."""
    from etl_demo_spark.ops import gap_fill_interpolate

    (ev,) = _t(spark, sf_dir, "events")
    sparse = (
        ev.filter(F.col("value") > 180)
        .groupBy(
            "event_type", F.date_trunc("hour", "ts").alias("bucket")
        )
        .agg(
            F.round(F.avg("value") * 10000).cast("long").alias("v")
        )
    )
    filled = gap_fill_interpolate(
        sparse, ["event_type"], "bucket", "v", step="interval 1 hour"
    )
    return filled.select(
        "event_type",
        F.date_format("bucket", "yyyy-MM-dd HH:00:00").alias("bucket"),
        (F.col("value_filled") / F.lit(10000.0)).alias("value_filled"),
        "interpolated",
    )


@query(
    "catalog_atomic_transfer",
    oracle="""
    WITH a_final AS (
      SELECT o_orderpriority, COUNT(*) AS n,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS total
      FROM orders
      WHERE o_orderstatus = 'O' AND NOT (o_totalprice > 250000.0)
      GROUP BY o_orderpriority
    ),
    b_final AS (
      SELECT o_orderpriority, COUNT(*) AS n,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS total
      FROM orders
      WHERE o_orderstatus = 'P'
         OR (o_orderstatus = 'O' AND o_totalprice > 250000.0)
      GROUP BY o_orderpriority
    )
    SELECT 'open' AS side, o_orderpriority, CAST(n AS BIGINT) AS n,
           CAST(total AS DOUBLE) AS total
    FROM a_final
    UNION ALL
    SELECT 'archive' AS side, o_orderpriority, CAST(n AS BIGINT) AS n,
           CAST(total AS DOUBLE) AS total
    FROM b_final
    """,
)
def catalog_atomic_transfer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ATOMIC CROSS-TABLE commit through the multi-table catalog
    (`io/catalog.py`): two manifested tables (open orders / archive),
    a transfer that DELETEs the >250k tier from one and MERGEs it into
    the other as two ordinary per-table commits, then ONE catalog flip.

    In-query asserts pin the transactional contract a single-table
    format cannot give: (1) a snapshot resolved BEFORE the flip still
    reads the pre-transfer state of BOTH tables even after the table
    commits land durable; (2) the post-flip snapshot sees both sides
    moved; (3) row count and decimal total are conserved across every
    catalog-visible state — no reader can ever observe the transferred
    tier in both tables or in neither.

    The returned frame is the post-flip consistent state, which the
    oracle derives straight from the base data — so the hash check
    certifies the whole DML + catalog pipeline moved exactly the right
    rows. Scale: the catalog document is O(tables); resolution adds one
    tiny JSON read to each snapshot."""
    import tempfile

    from etl_demo_spark.io.catalog import (
        catalog_commit,
        catalog_init,
        catalog_snapshot,
    )
    from etl_demo_spark.io.manifest import (
        delete_where_manifested,
        manifest_versions,
        merge_upsert_manifested,
        write_manifested,
    )

    (orders,) = _t(spark, sf_dir, "orders")
    base = orders.select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus",
        "o_orderpriority",
    )
    root = tempfile.mkdtemp(prefix="cat_tx_")
    a_root, b_root, cat = f"{root}/open", f"{root}/archive", f"{root}/cat"
    write_manifested(
        base.filter(F.col("o_orderstatus") == "O"), a_root, "o_orderpriority"
    )
    write_manifested(
        base.filter(F.col("o_orderstatus") == "P"), b_root, "o_orderpriority"
    )
    catalog_init(spark, cat, {"open": a_root, "archive": b_root})

    def totals(snap, name):
        r = snap.read(name).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("t"),
        ).first()
        return int(r["n"]), r["t"] or 0

    pre = catalog_snapshot(spark, cat)
    a0, b0 = totals(pre, "open"), totals(pre, "archive")

    moving = pre.read("open").filter(F.col("o_totalprice") > 250000.0)
    merge_upsert_manifested(
        spark, b_root, moving, ["o_orderkey"], "o_orderpriority"
    )
    delete_where_manifested(
        spark, a_root, F.col("o_totalprice") > 250000.0, "o_orderpriority"
    )
    # durable table commits, but the catalog still serves the old pins
    mid = catalog_snapshot(spark, cat)
    assert totals(mid, "open") == a0 and totals(mid, "archive") == b0, (
        "catalog leaked a half-applied transfer"
    )

    catalog_commit(
        spark,
        cat,
        {
            "open": manifest_versions(spark, a_root)[-1],
            "archive": manifest_versions(spark, b_root)[-1],
        },
    )
    post = catalog_snapshot(spark, cat)
    a1, b1 = totals(post, "open"), totals(post, "archive")
    assert a1[0] + b1[0] == a0[0] + b0[0], "row count not conserved"
    assert a1[1] + b1[1] == a0[1] + b0[1], "decimal total not conserved"
    assert totals(pre, "open") == a0, "pre-flip snapshot lost repeatability"

    def side(snap, name, label):
        return snap.read(name).groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total"),
        ).select(F.lit(label).alias("side"), "o_orderpriority", "n", "total")

    return side(post, "open", "open").unionByName(
        side(post, "archive", "archive")
    )


@query(
    "orders_commit_history",
    oracle="""
    SELECT * FROM (VALUES
      (CAST(4 AS BIGINT), 'ALTER',  TRUE,  CAST(3 AS BIGINT), TRUE),
      (CAST(3 AS BIGINT), 'DELETE', TRUE,  CAST(2 AS BIGINT), TRUE),
      (CAST(2 AS BIGINT), 'MERGE',  TRUE,  CAST(1 AS BIGINT), FALSE),
      (CAST(1 AS BIGINT), 'CREATE', FALSE, CAST(NULL AS BIGINT), FALSE)
    ) AS t(version, operation, is_delta, parent, readable)
    """,
)
def orders_commit_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Commit AUDIT TRAIL (`manifest_history` — the DESCRIBE HISTORY
    surface): a fixed DML sequence (CREATE → MERGE → DELETE → ALTER)
    must surface exactly its operation labels, delta/full encodings,
    parent pointers, and retention-window readability. The frame is
    fully deterministic by construction (timestamps excluded), so the
    oracle is the literal expected history — a hash match certifies
    that every committer stamps its label, that labels survive the
    delta manifest encoding, and that resolution never inherits a
    parent's label."""
    import tempfile

    from etl_demo_spark.io.manifest import (
        alter_manifested,
        delete_where_manifested,
        manifest_history,
        merge_upsert_manifested,
        write_manifested,
    )

    (orders,) = _t(spark, sf_dir, "orders")
    t = orders.select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    ).limit(200)
    root = tempfile.mkdtemp(prefix="hist_") + "/t"
    write_manifested(t, root, "o_orderpriority")                      # v1
    src = t.limit(5).withColumn(
        "o_totalprice", F.col("o_totalprice") + F.lit(1.0)
    )
    merge_upsert_manifested(
        spark, root, src, ["o_orderkey"], "o_orderpriority"
    )                                                                 # v2
    delete_where_manifested(
        spark, root, F.col("o_orderkey") % 2 == 0, "o_orderpriority"
    )                                                                 # v3
    alter_manifested(spark, root, add_columns={"note": "string"})     # v4
    return manifest_history(spark, root).select(
        "version", "operation", "is_delta", "parent", "readable"
    )


@query(
    "events_hidden_partition_prune",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(value), 2) AS total_value
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-08 00:00:00'
      AND ts <  TIMESTAMP '2024-01-12 00:00:00'
    GROUP BY event_type
    """,
)
def events_hidden_partition_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HIDDEN PARTITIONING (Iceberg's partition-transform family): the
    events table lands as `write_manifested(partition_transforms=
    {"p_day": "days(ts)", "p_b": "bucket(4, user_id)"})` — the writer
    derives the layout, nobody hand-maintains a dt column — and the
    read prunes leaves from a predicate on the SOURCE timestamp
    (`prune_source={"ts": (lo, hi)}`), no layout knowledge required.

    In-query asserts pin the scale contract: the pruned scan opens a
    strict subset of leaf files, and the result over the pruned scan +
    real predicate equals the oracle's full-table aggregate — pruning
    can drop only provably-out-of-range leaves, never rows. ROUND(,2)
    on the double sum (cross-engine last-ULP rule); day boundaries are
    half-open so bucket rows on the edge stay unambiguous."""
    import datetime
    import tempfile

    from etl_demo_spark.io.manifest import read_manifested, write_manifested

    (ev,) = _t(spark, sf_dir, "events")
    root = tempfile.mkdtemp(prefix="hidden_part_") + "/events"
    write_manifested(
        ev.select("event_id", "ts", "user_id", "event_type", "value"),
        root,
        partition_transforms={
            "p_day": "days(ts)",
            "p_b": "bucket(4, user_id)",
        },
    )
    full_files = len(read_manifested(spark, root).inputFiles())
    lo = datetime.datetime(2024, 1, 8)
    hi = datetime.datetime(2024, 1, 11, 23, 59, 59)
    pruned = read_manifested(spark, root, prune_source={"ts": (lo, hi)})
    n_pruned = len(pruned.inputFiles())
    assert 0 < n_pruned < full_files, (n_pruned, full_files)

    return (
        pruned.filter(
            (F.col("ts") >= F.lit(lo))
            & (F.col("ts") < F.lit(datetime.datetime(2024, 1, 12)))
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


@query(
    "orders_append_ingest",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total
    FROM (
      SELECT o_orderpriority, o_totalprice FROM orders
      UNION ALL
      SELECT o_orderpriority, o_totalprice + 1000000.0 FROM orders
      WHERE o_orderkey % 10 = 0
    )
    GROUP BY o_orderpriority
    """,
)
def orders_append_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPEND-only ingest fast path (`append_manifested`): a daily-load
    slice lands as EXTRA version subdirs of the touched leaves — the
    in-query asserts pin that NO pre-existing data file was rewritten
    (byte-identical inventory incl. mtimes) while every appended row is
    immediately visible, stats-maintained, and change-feed-visible as an
    insert. A MERGE of the same slice would re-read and rewrite every
    touched leaf; at 100 TB with accreting daily partitions that is the
    difference between O(new data) and quadratic-over-the-day ingest.

    The returned frame aggregates base ∪ appended rows, which the oracle
    derives from the base table alone — a hash match certifies the
    append moved exactly the intended rows and nothing else."""
    import glob
    import os
    import tempfile

    from etl_demo_spark.io.manifest import (
        append_manifested,
        manifest_versions,
        read_changes,
        read_manifested,
        write_manifested,
    )

    (orders,) = _t(spark, sf_dir, "orders")
    base = orders.select("o_orderkey", "o_totalprice", "o_orderpriority")
    root = tempfile.mkdtemp(prefix="append_") + "/orders"
    write_manifested(base, root, "o_orderpriority")
    inventory = {
        f: os.path.getmtime(f)
        for f in glob.glob(f"{root}/o_orderpriority=*/__v*/*.parquet")
    }

    slice_ = base.filter(F.col("o_orderkey") % 10 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") + F.lit(1_000_000.0)
    )
    n_slice = slice_.count()
    append_manifested(spark, root, slice_)

    after = {
        f: os.path.getmtime(f)
        for f in glob.glob(f"{root}/o_orderpriority=*/__v*/*.parquet")
    }
    assert inventory.items() <= after.items(), (
        "append rewrote a pre-existing data file"
    )
    vs = manifest_versions(spark, root)
    feed = read_changes(spark, root, vs[-2], vs[-1])
    n_ins = feed.filter(F.col("_change_type") == "insert").count()
    n_del = feed.filter(F.col("_change_type") == "delete").count()
    assert (n_ins, n_del) == (n_slice, 0), (n_ins, n_del, n_slice)

    return (
        read_manifested(spark, root)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total"),
        )
    )


@query(
    "stream_append_ingest",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(value), 2) AS total_value
    FROM events
    GROUP BY event_type
    """,
)
def stream_append_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming APPEND sink end-to-end on the real streaming engine
    (`streaming.run_stream_append`): the events table replays through a
    file stream whose micro-batches land via the manifest append fast
    path — O(batch) written per batch, zero rewrite of earlier batches'
    files — with the micro-batch id recorded as a transaction version
    inside each atomic commit. In-query asserts pin exactly-once: a
    FULL REPLAY of the stream on a fresh checkpoint (every batch
    re-offered) must append nothing, and the commit history must show
    only APPEND operations after CREATE. The oracle aggregates the
    source directly, so a hash match certifies no row was lost or
    duplicated through the streaming path."""
    import tempfile

    from etl_demo_spark.io.manifest import (
        manifest_history,
        read_manifested,
        write_manifested,
    )
    from etl_demo_spark.streaming.windows import run_stream_append

    (ev,) = _t(spark, sf_dir, "events")
    src = ev.select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    root = tempfile.mkdtemp(prefix="stream_append_")
    staged, target = f"{root}/inbox", f"{root}/events"
    # deterministic split: a small seed slice bootstraps the table's
    # layout, the remainder arrives through the stream
    seed = src.filter(F.col("event_id") % 100 == 0)
    src.filter(F.col("event_id") % 100 != 0).write.parquet(staged)
    write_manifested(seed, target, "event_type")

    stream = spark.readStream.schema(src.schema).parquet(staged)
    run_stream_append(stream, target, f"{root}/ck1", txn_app="ingest")
    n1 = read_manifested(spark, target).count()

    # full replay on a fresh checkpoint: the txn guard makes it a no-op
    stream = spark.readStream.schema(src.schema).parquet(staged)
    run_stream_append(stream, target, f"{root}/ck2", txn_app="ingest")
    n2 = read_manifested(spark, target).count()
    assert n1 == n2, f"replay duplicated rows: {n1} -> {n2}"

    ops = {r["operation"] for r in manifest_history(spark, target).collect()}
    assert ops <= {"CREATE", "APPEND"}, ops

    return (
        read_manifested(spark, target)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


@query(
    "event_value_gapfill_locf",
    oracle="""
    WITH sparse AS (
      SELECT event_type, date_trunc('hour', ts) AS bucket,
             CAST(ROUND(AVG(value) * 10000) AS BIGINT) AS v
      FROM events WHERE value > 180 GROUP BY 1, 2
    ),
    bounds AS (
      SELECT event_type, MIN(bucket) AS lo, MAX(bucket) AS hi
      FROM sparse GROUP BY 1
    ),
    spine AS (
      SELECT event_type,
             unnest(generate_series(lo, hi, INTERVAL 1 hour)) AS bucket
      FROM bounds
    ),
    dense AS (
      SELECT s.event_type, s.bucket, sp.v
      FROM spine s LEFT JOIN sparse sp
        ON s.event_type = sp.event_type AND s.bucket = sp.bucket
    )
    SELECT event_type,
           strftime(bucket, '%Y-%m-%d %H:00:00') AS bucket,
           LAST_VALUE(v IGNORE NULLS) OVER (
             PARTITION BY event_type ORDER BY bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) / 10000.0 AS value_filled,
           (v IS NULL AND LAST_VALUE(v IGNORE NULLS) OVER (
             PARTITION BY event_type ORDER BY bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) IS NOT NULL) AS interpolated
    FROM dense
    """,
)
def event_value_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LOCF (last observation carried forward) variant of the gap
    filler — the fill a metrics store uses when interpolation would
    invent values (counters, states): gaps take the previous observed
    value, leading gaps stay NULL. Same integer-scaled exactness as the
    linear variant (one int/int division, no round boundary)."""
    from etl_demo_spark.ops import gap_fill_interpolate

    (ev,) = _t(spark, sf_dir, "events")
    sparse = (
        ev.filter(F.col("value") > 180)
        .groupBy("event_type", F.date_trunc("hour", "ts").alias("bucket"))
        .agg(F.round(F.avg("value") * 10000).cast("long").alias("v"))
    )
    filled = gap_fill_interpolate(
        sparse, ["event_type"], "bucket", "v", step="interval 1 hour",
        method="locf",
    )
    return filled.select(
        "event_type",
        F.date_format("bucket", "yyyy-MM-dd HH:00:00").alias("bucket"),
        (F.col("value_filled") / F.lit(10000.0)).alias("value_filled"),
        "interpolated",
    )


@query(
    "catalog_sql_dml",
    oracle="""
    WITH base AS (
      SELECT o_orderkey, o_orderpriority, o_totalprice, o_orderstatus
      FROM orders WHERE o_orderstatus = 'F'
    ),
    feed AS (
      SELECT o_orderkey, o_orderpriority, o_totalprice, o_orderstatus
      FROM orders WHERE o_orderstatus = 'O' AND o_totalprice > 200000.0
    ),
    after_ins AS (
      SELECT * FROM base
      UNION ALL
      SELECT o_orderkey, o_orderpriority, o_totalprice, 'I'
      FROM feed WHERE o_totalprice > 300000.0
    ),
    msrc AS (
      SELECT o_orderkey, o_orderpriority, o_totalprice * 2 AS o_totalprice,
             'M' AS o_orderstatus
      FROM feed WHERE o_totalprice > 280000.0
    ),
    after_merge AS (
      SELECT * FROM after_ins
      WHERE o_orderkey NOT IN (SELECT o_orderkey FROM msrc)
      UNION ALL
      SELECT * FROM msrc
    ),
    after_upd AS (
      SELECT o_orderkey, o_orderpriority,
             CASE WHEN o_orderstatus = 'M' THEN o_totalprice + 1000.0
                  ELSE o_totalprice END AS o_totalprice,
             o_orderstatus
      FROM after_merge
    ),
    after_del AS (
      SELECT * FROM after_upd WHERE NOT (o_totalprice < 40000.0)
    )
    SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM after_del
    GROUP BY o_orderpriority, o_orderstatus
    """,
)
def catalog_sql_dml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL DML against CATALOG NAMES (`io/catalog.py catalog_sql`) — the
    write path a `register_catalog` user reaches for next: INSERT INTO /
    MERGE INTO / UPDATE / DELETE statements addressed at catalog member
    names, each routed through the manifested committers
    (append_manifested / merge_upsert_manifested / update_where /
    delete_where) and published by ONE catalog pin flip per statement.

    The sequence exercises every supported verb against a target built
    from the F-status orders slice, sourcing from a sibling member view
    inside the same consistent snapshot: a positional INSERT...SELECT
    (with a literal retyped column, proving the ANSI cast), the
    upsert-shaped MERGE (matched rows rewritten, unmatched inserted —
    including brand-new leaves), an expression UPDATE on the merged
    tier, and a predicate DELETE. The returned frame reads the FINAL
    pinned snapshot; the oracle replays the same four mutations as pure
    SQL over the base parquet, so a hash match certifies statement
    parsing, positional mapping, key extraction, commit routing, and
    pin-flip visibility end to end. In-query asserts pin that every
    statement advanced the catalog by exactly one version.

    Scale: parsing is a statement-head regex; data movement is the
    committers' own (INSERT appends O(new rows) with no existing file
    read; MERGE/UPDATE/DELETE rewrite affected leaves only)."""
    import tempfile

    from etl_demo_spark.io.catalog import (
        catalog_init,
        catalog_snapshot,
        catalog_sql,
    )
    from etl_demo_spark.io.manifest import write_manifested

    (orders,) = _t(spark, sf_dir, "orders")
    cols = ["o_orderkey", "o_orderpriority", "o_totalprice", "o_orderstatus"]
    root = tempfile.mkdtemp(prefix="cat_sql_")
    t_root, f_root, cat = f"{root}/target", f"{root}/feed", f"{root}/cat"
    write_manifested(
        orders.filter(F.col("o_orderstatus") == "F").select(*cols),
        t_root,
        "o_orderpriority",
    )
    write_manifested(
        orders.filter(
            (F.col("o_orderstatus") == "O") & (F.col("o_totalprice") > 200000.0)
        ).select(*cols),
        f_root,
        "o_orderpriority",
    )
    catalog_init(spark, cat, {"dml_target": t_root, "dml_feed": f_root})

    statements = [
        # positional INSERT with an explicit column list; the string
        # literal 'I' lands in o_orderstatus via the ANSI positional cast
        "INSERT INTO dml_target (o_orderkey, o_orderpriority, "
        "o_totalprice, o_orderstatus) "
        "SELECT o_orderkey, o_orderpriority, o_totalprice, 'I' "
        "FROM dml_feed WHERE o_totalprice > 300000.0",
        # upsert MERGE: >300000 keys were just inserted (matched →
        # rewritten at doubled price), 280000–300000 are new inserts
        "MERGE INTO dml_target USING (SELECT o_orderkey, o_orderpriority, "
        "o_totalprice * 2 AS o_totalprice, 'M' AS o_orderstatus "
        "FROM dml_feed WHERE o_totalprice > 280000.0) s "
        "ON dml_target.o_orderkey = s.o_orderkey "
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *",
        "UPDATE dml_target SET o_totalprice = o_totalprice + 1000.0 "
        "WHERE o_orderstatus = 'M'",
        "DELETE FROM dml_target WHERE o_totalprice < 40000.0",
    ]
    v = catalog_snapshot(spark, cat).version
    for stmt in statements:
        nv = catalog_sql(spark, cat, stmt)
        assert nv == v + 1, "each statement must flip the pin exactly once"
        v = nv

    final = catalog_snapshot(spark, cat)
    return (
        final.read("dml_target")
        .groupBy("o_orderpriority", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total"),
        )
    )


@query(
    "catalog_sql_txn_transfer",
    oracle="""
    WITH open0 AS (
      SELECT o_orderkey, o_orderpriority, o_totalprice
      FROM orders WHERE o_orderstatus = 'O'
    ),
    archive0 AS (
      SELECT o_orderkey, o_orderpriority, o_totalprice
      FROM orders WHERE o_orderstatus = 'F'
    ),
    moved AS (SELECT * FROM open0 WHERE o_totalprice > 250000.0),
    open1 AS (SELECT * FROM open0 WHERE NOT (o_totalprice > 250000.0)),
    archive1 AS (SELECT * FROM archive0 UNION ALL SELECT * FROM moved)
    SELECT 'open' AS side, o_orderpriority, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM open1 GROUP BY o_orderpriority
    UNION ALL
    SELECT 'archive' AS side, o_orderpriority, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM archive1 GROUP BY o_orderpriority
    """,
)
def catalog_sql_txn_transfer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTI-STATEMENT ATOMIC SQL TRANSACTION (`catalog_sql_txn`) — the
    warehouse BEGIN...COMMIT shape no single-table snapshot format can
    give: a money-transfer-style move (INSERT the >250k tier into the
    archive, DELETE it from open) expressed as TWO plain SQL statements
    against catalog names, landing as two durable-but-invisible table
    commits and ONE catalog pin flip.

    In-query asserts pin the transactional contract: (1) the catalog
    advanced exactly ONE version for the whole batch; (2) a snapshot
    resolved BEFORE the transaction still reads the pre-transfer state
    of BOTH tables afterward (repeatable read); (3) row count and
    decimal total are conserved across the flip — no catalog reader can
    ever observe the tier in both tables or in neither. The returned
    frame is the post-commit consistent state; the oracle derives it
    straight from the base parquet, so the hash match certifies the
    statement parsing, the snapshot-read source semantics, both
    committers, and the single-flip publication end to end."""
    import tempfile

    from etl_demo_spark.io.catalog import (
        catalog_init,
        catalog_snapshot,
        catalog_sql_txn,
        catalog_versions,
    )
    from etl_demo_spark.io.manifest import write_manifested

    (orders,) = _t(spark, sf_dir, "orders")
    cols = ["o_orderkey", "o_orderpriority", "o_totalprice"]
    root = tempfile.mkdtemp(prefix="cat_txn_")
    a_root, b_root, cat = f"{root}/open", f"{root}/archive", f"{root}/cat"
    write_manifested(
        orders.filter(F.col("o_orderstatus") == "O").select(*cols),
        a_root, "o_orderpriority",
    )
    write_manifested(
        orders.filter(F.col("o_orderstatus") == "F").select(*cols),
        b_root, "o_orderpriority",
    )
    catalog_init(spark, cat, {"open": a_root, "archive": b_root})

    def totals(snap, name):
        r = snap.read(name).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("t"),
        ).first()
        return int(r["n"]), r["t"] or 0

    pre = catalog_snapshot(spark, cat)
    a0, b0 = totals(pre, "open"), totals(pre, "archive")
    v0 = catalog_versions(spark, cat)[-1]

    cv = catalog_sql_txn(
        spark,
        cat,
        [
            "INSERT INTO archive (o_orderkey, o_orderpriority, o_totalprice) "
            "SELECT o_orderkey, o_orderpriority, o_totalprice FROM open "
            "WHERE o_totalprice > 250000.0",
            "DELETE FROM open WHERE o_totalprice > 250000.0",
        ],
    )
    assert cv == v0 + 1, "a transaction must flip the catalog exactly once"
    a1, b1 = totals(pre, "open"), totals(pre, "archive")
    assert (a1, b1) == (a0, b0), "pre-txn snapshot lost repeatability"
    post = catalog_snapshot(spark, cat)
    a2, b2 = totals(post, "open"), totals(post, "archive")
    assert a2[0] + b2[0] == a0[0] + b0[0], "row count not conserved"
    assert a2[1] + b2[1] == a0[1] + b0[1], "decimal total not conserved"

    def side(name, label):
        return post.read(name).groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total"),
        ).select(F.lit(label).alias("side"), "o_orderpriority", "n", "total")

    return side("open", "open").unionByName(side("archive", "archive"))


@query(
    "stream_table_changes",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(value), 2) AS total_value,
           CAST(SUM(CASE WHEN event_id % 3 = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_create,
           CAST(SUM(CASE WHEN event_id % 3 = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_append1,
           CAST(SUM(CASE WHEN event_id % 3 = 2 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_append2
    FROM events
    GROUP BY event_type
    """,
)
def stream_table_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tail a manifested table as a STREAM (`io/table_stream`, the
    Delta-CDF readStream-on-a-table shape): the events table is built in
    three commits (CREATE + two appends, sliced by event_id % 3), then
    `format("tablestream")` replays the commit log — offsets are
    manifest versions, partitions are the committed files themselves,
    each row stamped with the `_commit_version` that introduced it. The
    oracle recomputes the per-commit attribution from the slice
    predicate, so a hash match certifies the stream delivered every row
    exactly once AND attributed it to the right commit. In-query asserts
    pin exactly-once on restart: a second drain from the same checkpoint
    with no new commits delivers nothing."""
    import tempfile

    from etl_demo_spark.io.manifest import append_manifested, write_manifested
    from etl_demo_spark.io.table_stream import register_table_stream_source

    register_table_stream_source(spark)
    (ev,) = _t(spark, sf_dir, "events")
    src = ev.select("event_id", "ts", "user_id", "event_type", "value")
    root = tempfile.mkdtemp(prefix="stream_table_changes_")
    table, sink, ck = f"{root}/events", f"{root}/sink", f"{root}/ck"
    write_manifested(
        src.filter(F.col("event_id") % 3 == 0), table, "event_type"
    )  # v1
    append_manifested(spark, table, src.filter(F.col("event_id") % 3 == 1))
    append_manifested(spark, table, src.filter(F.col("event_id") % 3 == 2))

    def drain() -> int:
        q = (
            spark.readStream.format("tablestream")
            .option("path", table)
            .load()
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        return spark.read.parquet(sink).count()

    n1 = drain()
    n2 = drain()  # same checkpoint, no new commits: must be a no-op
    assert n1 == n2, f"restart re-delivered rows: {n1} -> {n2}"

    feed = spark.read.parquet(sink)
    types = {r[0] for r in feed.select("_change_type").distinct().collect()}
    assert types == {"insert"}, types
    return feed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 2).alias("total_value"),
        F.sum(F.when(F.col("_commit_version") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_create"),
        F.sum(F.when(F.col("_commit_version") == 2, 1).otherwise(0))
        .cast("long")
        .alias("n_append1"),
        F.sum(F.when(F.col("_commit_version") == 3, 1).otherwise(0))
        .cast("long")
        .alias("n_append2"),
    )


@query(
    "stream_csv_table",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(value), 2) AS total_value,
           CAST(SUM(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_create,
           CAST(SUM(CASE WHEN event_id % 2 = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_append
    FROM events
    GROUP BY event_type
    """,
)
def stream_csv_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NON-PARQUET table streaming (round 10, `io/table_stream`): the
    same commit-log stream over a manifested CSV table. The manifest
    records ``data_format``; the reader routes each file through
    pyarrow's csv reader applying the STORED schema positionally —
    headerless Spark csv files carry no names or types, so the schema
    authority the manifest already holds for evolution is what makes
    csv streamable at all. Typed parity is the point the oracle
    certifies: event_id arrives BIGINT, value DOUBLE (shortest-
    round-trip decimal text parses back bit-exact), partition-directory
    values typed from the path, commit attribution intact. In-query
    asserts pin exactly-once on restart and stream-vs-batch parity.

    Reference anchor: the reference engine (etl_weekly_trades.py) reads
    one CSV batch-only — north-star X-10 surface. Scale: identical plan
    shape to the parquet stream (per-file pyarrow partitions, packed);
    csv costs the text parse, which is the tradeoff the format chose."""
    import tempfile

    from etl_demo_spark.io.manifest import (
        append_manifested,
        read_manifested,
        write_manifested,
    )
    from etl_demo_spark.io.table_stream import register_table_stream_source

    register_table_stream_source(spark)
    (ev,) = _t(spark, sf_dir, "events")
    src = ev.select("event_id", "user_id", "event_type", "value")
    root = tempfile.mkdtemp(prefix="stream_csv_")
    table, sink, ck = f"{root}/events_csv", f"{root}/sink", f"{root}/ck"
    write_manifested(
        src.filter(F.col("event_id") % 2 == 0), table, "event_type", fmt="csv"
    )  # v1
    append_manifested(
        spark, table, src.filter(F.col("event_id") % 2 == 1), fmt="csv"
    )  # v2

    def drain() -> int:
        q = (
            spark.readStream.format("tablestream")
            .option("path", table)
            .load()
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        return spark.read.parquet(sink).count()

    n1 = drain()
    assert n1 == drain(), "restart re-delivered rows"
    feed = spark.read.parquet(sink)
    body = feed.drop("_change_type", "_commit_version")
    batch = read_manifested(spark, table, "csv").select(*body.columns)
    assert body.exceptAll(batch).count() == 0
    assert batch.exceptAll(body).count() == 0, "stream/batch parity"
    return feed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 2).alias("total_value"),
        F.sum(F.when(F.col("_commit_version") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_create"),
        F.sum(F.when(F.col("_commit_version") == 2, 1).otherwise(0))
        .cast("long")
        .alias("n_append"),
    )


@query(
    "stream_csv_cdc",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_insert,
           CAST(SUM(CASE WHEN event_id % 3 = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_delete,
           CAST(SUM(CAST(value AS DECIMAL(18,4)))
                - SUM(CASE WHEN event_id % 3 = 0
                           THEN CAST(value AS DECIMAL(18,4))
                           ELSE CAST(0 AS DECIMAL(18,4)) END)
                AS DOUBLE) AS net_value
    FROM events
    GROUP BY event_type
    """,
)
def stream_csv_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV CHANGE-DATA SIDECARS STREAM (round 10, closing the last csv
    carve-out): headerless csv sidecar files carry no schema, so the
    commit records the sidecar's exact column order
    (``change_data.cols`` — `io/manifest.py _stage_change_data`) and
    the stream reader re-types each recorded column from the stored
    schema (`io/table_stream.py _load_table`). A DELETE on a csv
    change_feed table then rides through as typed CDC delete rows —
    value-parity certified by the oracle: the feed's insert multiset is
    v1's full load, its delete multiset is exactly the predicate's
    rows, and net_value (inserts − deletes) equals the live table. The
    in-query assert pins feed-vs-batch convergence.

    Reference anchor: none (the reference rewrites outputs whole,
    etl_weekly_trades.py:134-156) — north-star X-10 CDC surface."""
    import tempfile

    from etl_demo_spark.io.manifest import (
        delete_where_manifested,
        read_manifested,
        write_manifested,
    )
    from etl_demo_spark.io.table_stream import register_table_stream_source

    register_table_stream_source(spark)
    (ev,) = _t(spark, sf_dir, "events")
    src = ev.select("event_id", "user_id", "event_type", "value")
    root = tempfile.mkdtemp(prefix="stream_csv_cdc_")
    table, sink, ck = f"{root}/events_csv", f"{root}/sink", f"{root}/ck"
    write_manifested(
        src, table, "event_type", fmt="csv", change_feed=True
    )  # v1
    delete_where_manifested(
        spark, table, F.col("event_id") % 3 == 0, "event_type", fmt="csv"
    )  # v2: delete commit -> csv change sidecar

    q = (
        spark.readStream.format("tablestream")
        .option("path", table)
        .load()
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    feed = spark.read.parquet(sink)
    body = feed.drop("_commit_version")
    ins = body.filter("_change_type = 'insert'").drop("_change_type")
    dels = body.filter("_change_type = 'delete'").drop("_change_type")
    # applying the feed converges to the live table (typed, multiset)
    batch = read_manifested(spark, table, "csv").select(*ins.columns)
    net = ins.exceptAll(dels)
    assert net.exceptAll(batch).count() == 0
    assert batch.exceptAll(net).count() == 0, "feed/batch divergence"
    return feed.groupBy("event_type").agg(
        F.sum(F.when(F.col("_change_type") == "insert", 1).otherwise(0))
        .cast("long")
        .alias("n_insert"),
        F.sum(F.when(F.col("_change_type") == "delete", 1).otherwise(0))
        .cast("long")
        .alias("n_delete"),
        F.sum(
            F.when(
                F.col("_change_type") == "insert",
                F.col("value").cast("decimal(18,4)"),
            ).otherwise(-F.col("value").cast("decimal(18,4)"))
        )
        .cast("double")
        .alias("net_value"),
    )


@query(
    "erasure_tombstone_cdc",
    oracle="""
    SELECT 'insert' AS _change_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_ids,
           CAST(COUNT(value) AS BIGINT) AS n_payload
    FROM events
    UNION ALL
    SELECT 'delete' AS _change_type,
           CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n,
           CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_ids,
           CAST(0 AS BIGINT) AS n_payload
    FROM events WHERE event_id % 9 = 0
    """,
)
def erasure_tombstone_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RIGHT-TO-ERASURE THAT CASCADES (round 10,
    `delete_keys_dv_manifested(tombstones=True)`): the GDPR dilemma is
    that an erasure must propagate to downstream replicas, but copying
    the doomed rows into a change sidecar would itself replicate the
    data being erased. The redacted-tombstone sidecar resolves it:
    delete rows carry ONLY the key columns — every payload column NULL
    — so a CDC consumer cascades the deletion BY KEY while the sidecar
    contains nothing worth erasing (Debezium's tombstone-record shape).

    The feed's delete rows are asserted payload-free in-query (both in
    the delivered stream and in the raw sidecar files on disk), and the
    replica that anti-joins the tombstone keys converges to the live
    table. The oracle pins the exact multiset: inserts = the full v1
    load with non-null payloads, deletes = one keys-only row per erased
    key with zero non-null payloads — a hash match certifies redaction
    AND cascade correctness together.

    Reference anchor: none (the reference rewrites outputs whole,
    etl_weekly_trades.py:134-156) — north-star X-10/GDPR surface."""
    import tempfile

    from etl_demo_spark.io.manifest import (
        _hadoop_fs,
        _load_raw,
        delete_keys_dv_manifested,
        read_manifested,
        write_manifested,
    )
    from etl_demo_spark.io.table_stream import register_table_stream_source

    register_table_stream_source(spark)
    (ev,) = _t(spark, sf_dir, "events")
    src = ev.select("event_id", "user_id", "event_type", "value")
    root = tempfile.mkdtemp(prefix="erasure_cdc_")
    table, sink, ck = f"{root}/events", f"{root}/sink", f"{root}/ck"
    write_manifested(src, table, "event_type", change_feed=True)  # v1
    keys = (
        src.filter(F.col("event_id") % 9 == 0).select("event_id").distinct()
    )
    delete_keys_dv_manifested(
        spark, table, keys, ["event_id"], tombstones=True
    )  # v2: DV erasure + redacted sidecar

    q = (
        spark.readStream.format("tablestream")
        .option("path", table)
        .load()
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    feed = spark.read.parquet(sink)
    dels = feed.filter("_change_type = 'delete'")
    # redaction: no payload byte in the delivered feed or the sidecar
    assert (
        dels.filter(
            F.col("value").isNotNull()
            | F.col("user_id").isNotNull()
            | F.col("event_type").isNotNull()
        ).count()
        == 0
    )
    fs, jvm = _hadoop_fs(spark, table)
    ch = _load_raw(fs, jvm, table, 2).get("change_data")
    assert ch and ch.get("rel")
    side = spark.read.parquet(f"{table}/{ch['rel']}")
    assert side.filter(F.col("value").isNotNull()).count() == 0
    # cascade: replica applying tombstone KEYS converges to the table
    ins = feed.filter("_change_type = 'insert'").drop(
        "_change_type", "_commit_version"
    )
    rep = ins.join(dels.select("event_id").distinct(), "event_id", "left_anti")
    tbl = read_manifested(spark, table).select(*ins.columns)
    assert rep.exceptAll(tbl).count() == 0
    assert tbl.exceptAll(rep).count() == 0

    return feed.groupBy("_change_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("event_id").alias("n_ids"),
        F.count("value").alias("n_payload"),
    )


@query(
    "orders_tagged_release",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total
    FROM orders
    WHERE o_orderstatus = 'F'
    GROUP BY o_orderpriority
    """,
)
def orders_tagged_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot TAGS as the dataset-release primitive (`tag_create` /
    `read_manifested(tag=…)`): the finished-orders slice is committed and
    tagged "release-1", then three later merges land new rows AND push
    the tagged version out of the 2-commit retention window — GC keeps
    the tagged snapshot alive (Iceberg's ref semantics), so the tag
    still reads the EXACT release bytes. The oracle recomputes the
    release state straight from the base data; in-query asserts pin that
    the live table has moved on while the tag has not."""
    import tempfile

    from etl_demo_spark.io.manifest import (
        merge_upsert_manifested,
        read_manifested,
        tag_create,
        write_manifested,
    )

    (orders,) = _t(spark, sf_dir, "orders")
    cols = ["o_orderkey", "o_orderpriority", "o_totalprice"]
    root = tempfile.mkdtemp(prefix="tagged_release_")
    table = f"{root}/orders"
    write_manifested(
        orders.filter(F.col("o_orderstatus") == "F").select(*cols),
        table, "o_orderpriority",
    )  # v1: the release
    tag_create(spark, table, "release-1")  # v2
    live = orders.filter(F.col("o_orderstatus") == "O").select(*cols)
    for lo, hi in ((300000.0, None), (250000.0, 300000.0), (200000.0, 250000.0)):
        batch = live.filter(F.col("o_totalprice") > lo)
        if hi is not None:
            batch = batch.filter(F.col("o_totalprice") <= hi)
        merge_upsert_manifested(
            spark, table, batch, ["o_orderkey"], ["o_orderpriority"]
        )  # v3..v5: v1 leaves the retention window, tag keeps it alive

    release = read_manifested(spark, table, tag="release-1")
    current = read_manifested(spark, table)
    n_new = current.count() - release.count()
    expect = live.filter(F.col("o_totalprice") > 200000.0).count()
    assert n_new == expect, f"live table should have {expect} new rows, {n_new}"

    return release.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("total"),
    )


@query(
    "mv_stream_maintained",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY event_type
    """,
)
def mv_stream_maintained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONTINUOUS MATERIALIZED VIEW (`mv.run_mv_stream_refresh`): the
    events table lands in three commits; a commit-log stream
    (tablestream `mode=commits` — one metadata row per commit, zero data
    files read by the stream) drives `mv_refresh` per batch, which folds
    the actual row deltas through the manifest change feed into one
    atomic MV commit each. The oracle recomputes the aggregate straight
    from the source, so a hash match certifies the streamed maintenance
    lost/duplicated nothing; in-query asserts pin the watermark at the
    base head and that a fresh-checkpoint full replay is a no-op."""
    import tempfile

    from etl_demo_spark.io.manifest import (
        append_manifested,
        manifest_versions,
        write_manifested,
    )
    from etl_demo_spark.mv import mv_create, mv_read, mv_watermark, run_mv_stream_refresh

    (ev,) = _t(spark, sf_dir, "events")
    src = ev.select(
        "event_id",
        "event_type",
        F.col("value").cast("decimal(18,4)").alias("v"),
    )
    root = tempfile.mkdtemp(prefix="mv_stream_q_")
    base, mv, ck = f"{root}/events", f"{root}/mv", f"{root}/ck"
    write_manifested(src.filter(F.col("event_id") % 3 == 0), base, "event_type")
    mv_create(
        spark, base, mv, ["event_type"],
        {"n": ("count", None), "total": ("sum", "v")},
    )
    append_manifested(spark, base, src.filter(F.col("event_id") % 3 == 1))
    append_manifested(spark, base, src.filter(F.col("event_id") % 3 == 2))

    stats = run_mv_stream_refresh(spark, mv, ck)
    assert len(stats) >= 1, "pending commits must trigger a refresh"
    assert mv_watermark(spark, mv) == manifest_versions(spark, base)[-1]
    replay = run_mv_stream_refresh(spark, mv, f"{root}/ck_fresh")
    assert all(s["mode"] == "noop" for s in replay), replay

    return mv_read(spark, mv).select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.col("total").cast("double").alias("total_value"),
    )


@query(
    "stream_cdc_out",
    oracle="""
    WITH merged AS (
      SELECT event_id, event_type, user_id,
             CASE WHEN event_id % 10 = 0 THEN value * 2 ELSE value END AS value
      FROM events
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(value), 2) AS total_value
    FROM merged
    WHERE NOT (value > 195.0)
    GROUP BY event_type
    """,
)
def stream_cdc_out(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-OUT through the change-data feed (Delta CDF shape): a
    change_feed table takes an append, an upsert MERGE (values doubled
    for every tenth key), and a DELETE WHERE; the table stream delivers
    inserts for the appends and the committers' recorded sidecar rows
    for the rewrites (update = preimage-delete + postimage-insert). A
    downstream REPLICA applies the feed as a multiset — inserts EXCEPT
    ALL deletes — and must converge to the live table (asserted
    in-query); the oracle recomputes the final state from the base data,
    so a hash match certifies the whole CDC pipeline end-to-end."""
    import tempfile

    from etl_demo_spark.io.manifest import (
        append_manifested,
        delete_where_manifested,
        merge_upsert_manifested,
        read_manifested,
        write_manifested,
    )
    from etl_demo_spark.io.table_stream import register_table_stream_source

    register_table_stream_source(spark)
    (ev,) = _t(spark, sf_dir, "events")
    src = ev.select("event_id", "event_type", "user_id", "value")
    root = tempfile.mkdtemp(prefix="cdc_out_")
    table, sink, ck = f"{root}/events", f"{root}/sink", f"{root}/ck"
    write_manifested(
        src.filter(F.col("event_id") % 2 == 0), table, "event_type",
        change_feed=True,
    )  # v1
    append_manifested(spark, table, src.filter(F.col("event_id") % 2 == 1))
    merge_upsert_manifested(  # v3: update every tenth key
        spark,
        table,
        src.filter(F.col("event_id") % 10 == 0).withColumn(
            "value", F.col("value") * 2
        ),
        ["event_id"],
        ["event_type"],
    )
    delete_where_manifested(  # v4
        spark, table, F.col("value") > 195.0, "event_type"
    )

    q = (
        spark.readStream.format("tablestream")
        .option("path", table)
        .load()
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    feed = spark.read.parquet(sink).drop("_commit_version")
    replica = feed.filter("_change_type = 'insert'").drop(
        "_change_type"
    ).exceptAll(feed.filter("_change_type = 'delete'").drop("_change_type"))
    live = read_manifested(spark, table)
    assert replica.exceptAll(live).count() == 0, "replica has phantom rows"
    assert live.exceptAll(replica).count() == 0, "replica lost rows"

    return replica.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


@query(
    "catalog_release_snapshot",
    oracle="""
    SELECT 'open' AS side, o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders WHERE o_orderstatus = 'O'
    GROUP BY o_orderpriority
    UNION ALL
    SELECT 'closed' AS side, o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders WHERE o_orderstatus = 'F'
    GROUP BY o_orderpriority
    """,
)
def catalog_release_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table RELEASE tag (`catalog_tag_create`): two member tables
    are pinned under one release name, then churned far past the table
    retention window with catalog pin flips after every merge — the
    release's member tags keep BOTH tables' pinned snapshots alive
    (Iceberg refs, lifted to the catalog). The oracle recomputes the
    release state straight from the base data; in-query asserts pin that
    the live catalog head has moved on while the release has not."""
    import tempfile

    from etl_demo_spark.io.catalog import (
        catalog_commit,
        catalog_init,
        catalog_snapshot,
        catalog_tag_create,
    )
    from etl_demo_spark.io.manifest import (
        manifest_versions,
        merge_upsert_manifested,
        write_manifested,
    )

    (orders,) = _t(spark, sf_dir, "orders")
    cols = ["o_orderkey", "o_orderpriority", "o_totalprice"]
    root = tempfile.mkdtemp(prefix="cat_release_")
    a_root, b_root, cat = f"{root}/open", f"{root}/closed", f"{root}/cat"
    write_manifested(
        orders.filter(F.col("o_orderstatus") == "O").select(*cols),
        a_root, "o_orderpriority",
    )
    write_manifested(
        orders.filter(F.col("o_orderstatus") == "F").select(*cols),
        b_root, "o_orderpriority",
    )
    catalog_init(spark, cat, {"open": a_root, "closed": b_root})
    catalog_tag_create(spark, cat, "release-1")

    churn = orders.filter(F.col("o_totalprice") > 300000.0).select(*cols)
    for i in range(3):  # push the release out of both retention windows
        batch = churn.withColumn(
            "o_orderkey", F.col("o_orderkey") + F.lit((i + 1) * 100_000_000)
        )
        merge_upsert_manifested(
            spark, a_root, batch, ["o_orderkey"], ["o_orderpriority"]
        )
        merge_upsert_manifested(
            spark, b_root, batch, ["o_orderkey"], ["o_orderpriority"]
        )
        catalog_commit(
            spark, cat,
            {
                "open": manifest_versions(spark, a_root)[-1],
                "closed": manifest_versions(spark, b_root)[-1],
            },
        )

    rel = catalog_snapshot(spark, cat, tag="release-1")
    live = catalog_snapshot(spark, cat)
    n_churn = churn.count()
    for t in ("open", "closed"):
        assert (
            live.read(t).count() - rel.read(t).count() == 3 * n_churn
        ), f"live {t} must have moved past the release"

    def side(tname, label):
        return rel.read(tname).groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total"),
        ).select(F.lit(label).alias("side"), "o_orderpriority", "n", "total")

    return side("open", "open").unionByName(side("closed", "closed"))


@query(
    "occ_rebase_concurrent_writers",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM (
      SELECT o_orderpriority,
             CASE WHEN o_orderpriority = '1-URGENT' AND o_orderkey % 7 = 0
                  THEN o_totalprice + 500000.0
                  ELSE o_totalprice END AS price
      FROM orders
      UNION ALL
      SELECT o_orderpriority, o_totalprice + 1000000.0 AS price
      FROM orders
      WHERE o_orderpriority = '5-LOW' AND o_orderkey % 10 = 0
    )
    GROUP BY o_orderpriority
    """,
)
def occ_rebase_concurrent_writers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COMMIT-TIME CONFLICT DETECTION (`io/manifest.py:_rebase_publish`):
    an APPEND and a disjoint-leaf MERGE race the same manifest CAS — the
    loser must land by REPUBLISHING its already-staged files onto the
    winner's snapshot, not by deleting and re-running the transaction.
    This is Delta/Iceberg commit-conflict semantics, and the write-
    throughput ceiling of the lakehouse story: a streaming append sink
    racing periodic OPTIMIZE would otherwise re-write its batch every
    lost race and hard-fail under sustained contention.

    The race is injected deterministically: the append's first CAS is
    intercepted and a merge into a DIFFERENT leaf commits first, so the
    append genuinely loses. In-query asserts pin the contract — (1)
    byte-identity (path+size+mtime) of every file the loser staged
    before losing, (2) occ_stats records exactly one rebase and zero
    re-runs, (3) the rebased commit is version winner+1 with its own
    operation stamp. The returned aggregate covers base ∪ merge-update ∪
    appended rows; the oracle derives the same state relationally, so a
    hash match certifies both transactions landed exactly once.

    Reference anchor: the reference engine (etl_weekly_trades.py) has no
    concurrency at all — north-star lakehouse surface."""
    import glob
    import os
    import tempfile

    import etl_demo_spark.io.manifest as m

    (orders,) = _t(spark, sf_dir, "orders")
    base = orders.select("o_orderkey", "o_totalprice", "o_orderpriority")
    root = tempfile.mkdtemp(prefix="occ_rebase_") + "/orders"
    m.write_manifested(base, root, "o_orderpriority")

    def files_now() -> dict:
        out = {}
        for f in glob.glob(f"{root}/o_orderpriority=*/__v*/*.parquet"):
            st = os.stat(f)
            out[f] = (st.st_size, st.st_mtime_ns)
        return out

    pre_append = files_now()
    winner_src = base.filter(
        (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_orderkey") % 7 == 0)
    ).withColumn("o_totalprice", F.col("o_totalprice") + F.lit(500_000.0))
    loser_src = base.filter(
        (F.col("o_orderpriority") == "5-LOW") & (F.col("o_orderkey") % 10 == 0)
    ).withColumn("o_totalprice", F.col("o_totalprice") + F.lit(1_000_000.0))

    real_cas = m._publish_cas
    state: dict = {"fired": False}

    def racing_cas(fs, jvm, p, data):
        if not state["fired"]:
            state["fired"] = True
            state["staged"] = {
                f: sig for f, sig in files_now().items() if f not in pre_append
            }
            m.merge_upsert_manifested(
                spark, root, winner_src, ["o_orderkey"], ["o_orderpriority"]
            )
        return real_cas(fs, jvm, p, data)

    occ_before = dict(m.occ_stats)
    m._publish_cas = racing_cas
    try:
        m.append_manifested(spark, root, loser_src)
    finally:
        m._publish_cas = real_cas

    assert state["fired"], "the race was never exercised"
    assert state["staged"], "the loser staged nothing before losing"
    after = files_now()
    for f, sig in state["staged"].items():
        assert after.get(f) == sig, f"staged file churned on rebase: {f}"
    assert m.occ_stats["rebased"] == occ_before["rebased"] + 1, m.occ_stats
    assert m.occ_stats["reran"] == occ_before["reran"], m.occ_stats
    fs, jvm = m._hadoop_fs(spark, root)
    head_v = m.manifest_versions(spark, root)[-1]
    assert head_v == 3, head_v  # base v1, winner v2, rebased loser v3
    assert m._resolve_doc(fs, jvm, root, 3).get("operation") == "APPEND"

    return (
        m.read_manifested(spark, root)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total"),
        )
    )


@query(
    "wap_branch_publish",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM (
      SELECT o_orderpriority, o_totalprice AS price FROM orders
      UNION ALL
      SELECT o_orderpriority, o_totalprice + 2000000.0 AS price
      FROM orders
      WHERE o_orderkey % 8 = 0
    )
    GROUP BY o_orderpriority
    """,
)
def wap_branch_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WRITE-AUDIT-PUBLISH (`io/manifest.py:branch_create` /
    `use_branch` / `branch_fastforward`): the standard gate between "the
    pipeline wrote it" and "training reads it". A daily load lands on a
    BRANCH — its commits are staged under the table root but invisible
    to every main reader, stream, and catalog pin — then an expectation
    suite validates the branch head, and only a passing branch
    fast-forwards into ONE atomic main commit with zero data movement.

    The load is deliberately poisoned (a negative price slips in);
    in-query asserts pin the gate: (1) the first publish attempt is
    REFUSED naming the failing expectation and its violation count, (2)
    main's row count and head version never move while the bad batch is
    quarantined, (3) after the fix lands on the same branch the publish
    succeeds and the published files are byte-identical to what the
    branch staged (audit-then-point, never rewrite). The oracle derives
    the final state from the base table + the clean slice alone — a
    hash match certifies the bad row never leaked and the good rows
    landed exactly once.

    Reference anchor: the reference engine (etl_weekly_trades.py) has
    no staging/validation gates — north-star lakehouse surface."""
    import glob
    import os
    import tempfile

    import etl_demo_spark.io.manifest as m

    (orders,) = _t(spark, sf_dir, "orders")
    base = orders.select("o_orderkey", "o_totalprice", "o_orderpriority")
    root = tempfile.mkdtemp(prefix="wap_") + "/orders"
    m.write_manifested(base, root, "o_orderpriority")
    n_base = base.count()

    load = base.filter(F.col("o_orderkey") % 8 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") + F.lit(2_000_000.0)
    )
    poison = spark.createDataFrame(
        [(999_999_999, -1.0, "1-URGENT")],
        "o_orderkey BIGINT, o_totalprice DOUBLE, o_orderpriority STRING",
    ).withColumn(
        "o_totalprice", F.col("o_totalprice").cast(load.schema["o_totalprice"].dataType)
    ).withColumn(
        "o_orderkey", F.col("o_orderkey").cast(load.schema["o_orderkey"].dataType)
    )

    m.branch_create(spark, root, "ingest")
    with m.use_branch(spark, root, "ingest"):
        m.append_manifested(
            spark, root, load.unionByName(poison.select(*load.columns))
        )

    gate = {"price_positive": "o_totalprice >= 0"}
    refused = False
    try:
        m.branch_fastforward(spark, root, "ingest", expectations=gate)
    except ValueError as e:
        refused = True
        assert "price_positive" in str(e) and "1" in str(e), str(e)
    assert refused, "the poisoned branch must not publish"
    # quarantined: main never moved
    assert m.read_manifested(spark, root).count() == n_base
    assert m.manifest_versions(spark, root)[-1] == 1

    with m.use_branch(spark, root, "ingest"):
        m.delete_where_manifested(
            spark, root, F.col("o_totalprice") < 0, "o_orderpriority"
        )
        staged = {
            f: os.stat(f).st_mtime_ns
            for f in glob.glob(f"{root}/o_orderpriority=*/__v*/*.parquet")
        }
    v = m.branch_fastforward(spark, root, "ingest", expectations=gate)
    after = {
        f: os.stat(f).st_mtime_ns
        for f in glob.glob(f"{root}/o_orderpriority=*/__v*/*.parquet")
    }
    assert staged.items() <= after.items(), "publish must not rewrite data"
    assert v == m.manifest_versions(spark, root)[-1]

    return (
        m.read_manifested(spark, root)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total"),
        )
    )


@query(
    "catalog_wap_two_table",
    oracle="""
    WITH base_docs AS (
      SELECT doc_id, lang FROM documents
      WHERE doc_id IN (SELECT vec_id FROM embeddings)
    ),
    docs_final AS (
      SELECT doc_id, lang FROM base_docs
      UNION ALL
      SELECT doc_id + 10000000, lang FROM base_docs WHERE doc_id % 7 = 0
    ),
    embs_final AS (
      SELECT vec_id, label FROM embeddings
      UNION ALL
      SELECT vec_id + 10000000, label FROM embeddings
      WHERE vec_id % 14 = 0 AND vec_id IN (SELECT doc_id FROM base_docs)
      UNION ALL
      SELECT vec_id + 10000000, -1 FROM embeddings
      WHERE vec_id % 7 = 0 AND vec_id % 14 <> 0
        AND vec_id IN (SELECT doc_id FROM base_docs)
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN label < 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_backfilled
    FROM docs_final d JOIN embs_final e ON d.doc_id = e.vec_id
    GROUP BY lang
    """,
)
def catalog_wap_two_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CATALOG-LEVEL WRITE-AUDIT-PUBLISH (`io/catalog.py:
    catalog_wap_begin` / `use_catalog_wap` / `catalog_wap_publish`): the
    multi-table gate per-table WAP cannot express. A training-data load
    is two tables that must move TOGETHER — documents and their
    embeddings — and the audit is a CROSS-table invariant ("every doc
    has an embedding row"), not a per-table predicate.

    The load is deliberately torn: all the new docs stage onto the docs
    branch but only HALF their embeddings stage onto the embeddings
    branch. In-query asserts pin the gate: (1) while staged, main
    tables, catalog pins, and the catalog version are untouched; (2)
    the first publish is REFUSED naming the cross-table expectation and
    the exact violation count — including the docs table whose OWN
    branch was internally fine; (3) after the missing embeddings are
    backfilled on the same WAP (label -1), the publish lands ALL pins
    in ONE catalog commit; (4) a snapshot resolved before the publish
    still reads the pre-load state of both tables afterwards. The
    oracle derives the final joined state from the base data alone — a
    hash match certifies the torn load never leaked and the fixed load
    landed exactly once in both tables.

    Reference anchor: the reference engine (etl_weekly_trades.py) is a
    single-frame pipeline with no multi-table atomicity — north-star
    lakehouse surface. Scale: validation reads branch heads (normal
    pruned scans); the publish itself is metadata-only (per-table
    fast-forwards + one O(tables) catalog CAS)."""
    import tempfile

    from etl_demo_spark.io.catalog import (
        catalog_init,
        catalog_snapshot,
        catalog_versions,
        catalog_wap_begin,
        catalog_wap_publish,
        use_catalog_wap,
    )
    from etl_demo_spark.io.manifest import (
        append_manifested,
        manifest_versions,
        read_manifested,
        write_manifested,
    )

    docs_src, embs_src = _t(spark, sf_dir, "documents", "embeddings")
    base_docs = docs_src.select("doc_id", "lang").join(
        embs_src.select(F.col("vec_id").alias("doc_id")), "doc_id", "semi"
    )
    base_embs = embs_src.select(
        "vec_id", "label", F.pmod(F.col("vec_id"), F.lit(4)).alias("pb")
    )
    root = tempfile.mkdtemp(prefix="cat_wap_")
    d_root, e_root, cat = f"{root}/docs", f"{root}/embs", f"{root}/cat"
    write_manifested(base_docs, d_root, "lang")
    write_manifested(base_embs, e_root, "pb")
    catalog_init(spark, cat, {"docs": d_root, "embs": e_root})
    pre = catalog_snapshot(spark, cat)
    n_docs0 = pre.read("docs").count()
    n_embs0 = pre.read("embs").count()

    new_docs = base_docs.filter(F.col("doc_id") % 7 == 0).withColumn(
        "doc_id", F.col("doc_id") + F.lit(10_000_000)
    )
    # only HALF the embeddings stage — the torn multi-table load
    half_embs = (
        base_embs.join(
            base_docs.select(F.col("doc_id").alias("vec_id")), "vec_id", "semi"
        )
        .filter(F.col("vec_id") % 14 == 0)
        .withColumn("vec_id", F.col("vec_id") + F.lit(10_000_000))
        .withColumn("pb", F.pmod(F.col("vec_id"), F.lit(4)))
    )
    n_new_docs = new_docs.count()
    n_half = half_embs.count()

    gate = {
        "every_doc_embedded": (
            "SELECT d.doc_id FROM docs d LEFT ANTI JOIN embs e "
            "ON d.doc_id = e.vec_id"
        )
    }
    catalog_wap_begin(spark, cat, "load")
    with use_catalog_wap(spark, cat, "load"):
        append_manifested(spark, d_root, new_docs)
        append_manifested(spark, e_root, half_embs)
    # staged, not visible: main tables, pins, catalog version untouched
    assert read_manifested(spark, d_root).count() == n_docs0
    assert read_manifested(spark, e_root).count() == n_embs0
    assert catalog_versions(spark, cat)[-1] == 1

    refused = False
    try:
        catalog_wap_publish(spark, cat, "load", sql_expectations=gate)
    except ValueError as e:
        refused = True
        missing = n_new_docs - n_half
        assert "every_doc_embedded" in str(e) and str(missing) in str(e), (
            str(e)
        )
    assert refused, "the torn load must not publish"
    assert manifest_versions(spark, d_root)[-1] == 1, "docs main moved"
    assert manifest_versions(spark, e_root)[-1] == 1, "embs main moved"
    assert catalog_versions(spark, cat)[-1] == 1

    # backfill the missing embeddings ON THE SAME WAP, then publish
    with use_catalog_wap(spark, cat, "load"):
        fix = (
            read_manifested(spark, d_root)
            .select(F.col("doc_id").alias("vec_id"))
            .join(
                read_manifested(spark, e_root).select("vec_id"),
                "vec_id",
                "anti",
            )
            .withColumn("label", F.lit(-1).cast("int"))
            .withColumn("pb", F.pmod(F.col("vec_id"), F.lit(4)))
        )
        append_manifested(spark, e_root, fix)
    v = catalog_wap_publish(spark, cat, "load", sql_expectations=gate)
    assert catalog_versions(spark, cat)[-1] == v
    post = catalog_snapshot(spark, cat)
    assert post.read("docs").count() == n_docs0 + n_new_docs
    # pre-publish snapshot keeps serving the pre-load state
    assert pre.read("docs").count() == n_docs0
    assert pre.read("embs").count() == n_embs0

    fd = post.read("docs")
    fe = post.read("embs")
    return (
        fd.join(fe, fd["doc_id"] == fe["vec_id"])
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("label") < 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_backfilled"),
        )
    )


@query(
    "catalog_sql_merge_full",
    oracle="""
    WITH open0 AS (
      SELECT o_orderkey, o_orderpriority,
             CAST(o_totalprice AS DECIMAL(18,2)) AS price
      FROM orders WHERE o_orderstatus = 'O'
    ),
    feed AS (
      -- the sync source: keys %3=0 kept (price bumped), %3=1 absent
      -- (NMBS-deleted), plus a new-key slice
      SELECT o_orderkey, o_orderpriority,
             CAST(price + 100.0 AS DECIMAL(18,2)) AS price
      FROM open0 WHERE o_orderkey % 3 = 0
      UNION ALL
      SELECT o_orderkey + 70000000, o_orderpriority,
             CAST(price AS DECIMAL(18,2)) AS price
      FROM open0 WHERE o_orderkey % 5 = 0
    ),
    synced AS (
      SELECT f.o_orderkey, f.o_orderpriority, f.price FROM feed f
    ),
    tombstoned AS (
      -- second statement: WHEN MATCHED AND price > 200000 THEN DELETE
      -- keyed by the big-ticket slice of the synced table
      SELECT s.o_orderkey, s.o_orderpriority, s.price
      FROM synced s
      WHERE NOT (s.o_orderkey IN (SELECT o_orderkey FROM synced
                                  WHERE o_orderkey % 2 = 0)
                 AND s.price > 200000.0)
    )
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(price) AS DOUBLE) AS total
    FROM tombstoned
    GROUP BY o_orderpriority
    """,
)
def catalog_sql_merge_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL-shape SQL MERGE through catalog names (round 10,
    `io/catalog.py:_parse_merge_clauses` -> `io/manifest.py:
    merge_upsert_manifested(when_matched=…, nmbs_delete=…)` ->
    `ops.merge_clauses`): the clause family the round-8 upsert-only
    subset could not express.

    Statement 1 is a snapshot SYNC — WHEN MATCHED THEN UPDATE SET * +
    WHEN NOT MATCHED THEN INSERT * + WHEN NOT MATCHED BY SOURCE THEN
    DELETE — after which the target IS the source (in-query assert).
    Statement 2 is a conditional tombstone pass — WHEN MATCHED AND
    price > 200000 THEN DELETE with a KEY-ONLY source (the CDC
    tombstone shape; rows failing the condition survive). Each
    statement is ordinary committer work + ONE catalog pin flip; the
    oracle replays both statements relationally, so a hash match
    certifies clause routing, condition scoping, and NMBS semantics
    end-to-end. Scale: matched/unmatched splits are semi/anti joins on
    the merge key (one co-keyed shuffle family); NMBS rewrites every
    leaf by definition — that is what the clause means."""
    import tempfile

    from etl_demo_spark.io.catalog import catalog_init, catalog_sql
    from etl_demo_spark.io.manifest import read_manifested, write_manifested

    (orders,) = _t(spark, sf_dir, "orders")
    base = orders.filter(F.col("o_orderstatus") == "O").select(
        "o_orderkey",
        "o_orderpriority",
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    root = tempfile.mkdtemp(prefix="sql_merge_full_")
    t_root, s_root, cat = f"{root}/open", f"{root}/feed", f"{root}/cat"
    write_manifested(base, t_root, "o_orderpriority")
    feed = base.filter(F.col("o_orderkey") % 3 == 0).withColumn(
        "price", (F.col("price") + F.lit(100.0)).cast("decimal(18,2)")
    ).unionByName(
        base.filter(F.col("o_orderkey") % 5 == 0).withColumn(
            "o_orderkey", F.col("o_orderkey") + F.lit(70_000_000)
        )
    )
    write_manifested(feed, s_root, "o_orderpriority")
    catalog_init(spark, cat, {"open": t_root, "feed": s_root})

    catalog_sql(
        spark, cat,
        "MERGE INTO open t USING feed s ON t.o_orderkey = s.o_orderkey "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT * "
        "WHEN NOT MATCHED BY SOURCE THEN DELETE",
    )
    synced = read_manifested(spark, t_root)
    n_feed = feed.count()
    assert synced.count() == n_feed, "sync must make target == source"
    assert synced.exceptAll(
        feed.select(*synced.columns)
    ).count() == 0, "sync drifted from the source"

    tombs = synced.filter(F.col("o_orderkey") % 2 == 0).select("o_orderkey")
    tombs.createOrReplaceTempView("sqlmf_tombs")
    catalog_sql(
        spark, cat,
        "MERGE INTO open t USING sqlmf_tombs s "
        "ON t.o_orderkey = s.o_orderkey "
        "WHEN MATCHED AND t.price > 200000.0 THEN DELETE",
    )
    out = read_manifested(spark, t_root)
    assert out.filter(
        (F.col("o_orderkey") % 2 == 0) & (F.col("price") > 200000.0)
    ).count() == 0, "conditional tombstones missed rows"

    return out.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("price").cast("double").alias("total"),
    )


@query(
    "catalog_sql_txn_read_own_writes",
    oracle="""
    WITH open0 AS (
      SELECT o_orderkey, o_orderpriority,
             CAST(o_totalprice AS DECIMAL(18,2)) AS price
      FROM orders WHERE o_orderstatus = 'O'
    ),
    inserted AS (
      SELECT o_orderkey + 50000000 AS o_orderkey, o_orderpriority,
             CAST(price + 1000000.0 AS DECIMAL(18,2)) AS price
      FROM open0 WHERE o_orderkey % 9 = 0
    ),
    open1 AS (
      SELECT * FROM open0 UNION ALL SELECT * FROM inserted
    )
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(price) AS DOUBLE) AS total
    FROM open1
    GROUP BY o_orderpriority
    """,
)
def catalog_sql_txn_read_own_writes(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """READ-YOUR-OWN-WRITES inside `catalog_sql_txn` — the BEGIN…COMMIT
    isolation a SQL user expects: statement 2's SELECT source AGGREGATES
    statement 1's inserts (the touched table's view is re-pointed at
    its new, not-yet-pinned head after every statement), while outside
    readers resolve the old catalog pins until the single CAS flips the
    whole batch.

    The transaction inserts a derived slice into `open` (statement 1),
    then materializes a per-priority rollup OF OPEN — including the
    fresh inserts — into `rollup` (statement 2). In-query asserts pin
    the contract from both sides: the rollup's row counts equal base ∪
    inserted (statement 2 saw statement 1), AND a catalog snapshot
    resolved before the transaction still reads the empty rollup and
    the pre-insert open table (no dirty reads; all-or-nothing flip).
    The oracle replays the same sequential semantics relationally, so a
    hash match certifies view re-pointing, both committers, and the
    single-flip publication."""
    import tempfile

    from etl_demo_spark.io.catalog import (
        catalog_init,
        catalog_snapshot,
        catalog_sql_txn,
        catalog_versions,
    )
    from etl_demo_spark.io.manifest import write_manifested

    (orders,) = _t(spark, sf_dir, "orders")
    root = tempfile.mkdtemp(prefix="cat_ryow_")
    a_root, r_root, cat = f"{root}/open", f"{root}/rollup", f"{root}/cat"
    open0 = orders.filter(F.col("o_orderstatus") == "O").select(
        "o_orderkey",
        "o_orderpriority",
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    write_manifested(open0, a_root, "o_orderpriority")
    # seed the rollup with one throwaway partition row per priority so
    # the table (and its schema) exists; the txn's statement 2 inserts
    # the real aggregate rows
    seed = open0.groupBy("o_orderpriority").agg(
        F.lit(-1).cast("bigint").alias("n"),
        F.lit(0).cast("decimal(18,2)").alias("total"),
    )
    write_manifested(seed, r_root, "o_orderpriority")
    catalog_init(spark, cat, {"open": a_root, "rollup": r_root})

    pre = catalog_snapshot(spark, cat)
    n_open0 = open0.count()
    n_ins = open0.filter(F.col("o_orderkey") % 9 == 0).count()
    v0 = catalog_versions(spark, cat)[-1]

    cv = catalog_sql_txn(
        spark,
        cat,
        [
            "INSERT INTO open (o_orderkey, o_orderpriority, price) "
            "SELECT o_orderkey + 50000000, o_orderpriority, "
            "CAST(price + 1000000.0 AS DECIMAL(18,2)) FROM open "
            "WHERE o_orderkey % 9 = 0",
            "INSERT INTO rollup (o_orderpriority, n, total) "
            "SELECT o_orderpriority, COUNT(*), "
            "CAST(SUM(price) AS DECIMAL(18,2)) FROM open "
            "GROUP BY o_orderpriority",
        ],
    )
    assert cv == v0 + 1, "one flip for the whole transaction"
    # statement 2 saw statement 1: the rollup's total row count equals
    # base ∪ inserted
    post = catalog_snapshot(spark, cat)
    rolled = post.read("rollup").filter(F.col("n") >= 0)
    total_n = rolled.agg(F.sum("n")).first()[0]
    assert total_n == n_open0 + n_ins, (total_n, n_open0, n_ins)
    # outside the txn nothing was visible until the flip
    assert pre.read("rollup").filter(F.col("n") >= 0).count() == 0
    assert pre.read("open").count() == n_open0

    return (
        post.read("open")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("price").cast("double").alias("total"),
        )
    )


@query(
    "events_spec_evolution_prune",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(value), 2) AS total_value
    FROM (
      SELECT event_type, value, ts FROM events
      UNION ALL
      SELECT event_type, value, ts + INTERVAL 365 DAY AS ts FROM events
      WHERE event_id % 5 = 0
    )
    WHERE ts >= TIMESTAMP '2024-01-08 00:00:00'
      AND ts <  TIMESTAMP '2024-01-12 00:00:00'
    GROUP BY event_type
    """,
)
def events_spec_evolution_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """METADATA-ONLY PARTITION-SPEC EVOLUTION (`alter_partition_spec`):
    re-key a grown table's layout without rewriting a byte — Iceberg's
    spec evolution, the recovery for "daily partitions were right at
    1 TB and wrong at 100 TB". The events table lands under a DAILY
    spec, evolves to MONTHLY + user-bucket as pure metadata, and a
    second slice (shifted a year out) appends under the NEW layout;
    one timestamp-range query then prunes leaves across BOTH
    generations — old leaves under days(ts), new leaves under
    months(ts) — with the reader knowing nothing about either layout.

    In-query asserts pin the contract: (1) byte-identity (mtime) of
    every pre-evolution data file — the evolution and the later append
    rewrote nothing; (2) the pruned scan opens a strict subset of
    leaves while returning exactly the full-scan answer over the same
    predicate (pruning drops only provably-out-of-range leaves, never
    rows); (3) DML addressed in an OLD generation's columns is refused
    (current-spec DML is leaf-scoped — see events_spec_evolution_dml).
    The oracle derives the same aggregate from the base parquet, so a
    hash match certifies both write paths and the dual-spec planning.

    Reference anchor: the reference engine has one fixed CSV layout —
    north-star lakehouse surface."""
    import datetime
    import glob
    import os
    import tempfile

    import etl_demo_spark.io.manifest as m

    (ev,) = _t(spark, sf_dir, "events")
    src = ev.select("event_id", "ts", "user_id", "event_type", "value")
    root = tempfile.mkdtemp(prefix="spec_ev_") + "/events"
    m.write_manifested(src, root, partition_transforms={"p_day": "days(ts)"})
    pre = {
        f: os.stat(f).st_mtime_ns
        for f in glob.glob(f"{root}/p_day=*/__v*/*.parquet")
    }
    m.alter_partition_spec(
        spark, root, {"p_month": "months(ts)", "p_b": "bucket(8, user_id)"}
    )
    late = src.filter(F.col("event_id") % 5 == 0).withColumn(
        "ts", F.col("ts") + F.expr("INTERVAL 365 DAYS")
    )
    m.append_manifested(spark, root, late)
    after = {
        f: os.stat(f).st_mtime_ns
        for f in glob.glob(f"{root}/p_day=*/__v*/*.parquet")
    }
    assert after == pre, "evolution/append must not rewrite old-spec bytes"
    assert glob.glob(f"{root}/p_month=*/p_b=*/__v*/*.parquet"), (
        "appends must land under the evolved layout"
    )

    lo = datetime.datetime(2024, 1, 8)
    hi = datetime.datetime(2024, 1, 11, 23, 59, 59)
    full = m.read_manifested(spark, root)
    pruned = m.read_manifested(spark, root, prune_source={"ts": (lo, hi)})
    leaves = lambda df: {p.rsplit("/", 2)[0] for p in df.inputFiles()}  # noqa: E731
    assert 0 < len(leaves(pruned)) < len(leaves(full)), (
        len(leaves(pruned)),
        len(leaves(full)),
    )
    pred = (F.col("ts") >= F.lit(lo)) & (
        F.col("ts") < F.lit(datetime.datetime(2024, 1, 12))
    )
    assert pruned.filter(pred).count() == full.filter(pred).count()

    refused = False
    try:
        m.merge_upsert_manifested(
            spark, root, late.limit(1), ["event_id"], ["p_day"]
        )
    except ValueError as e:
        refused = "CURRENT spec" in str(e)
    assert refused, (
        "DML in an old generation's columns must refuse on a mixed table"
    )

    return (
        pruned.filter(pred)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


@query(
    "events_spec_evolution_dml",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
    FROM (
      SELECT event_type,
             CASE WHEN ts >= TIMESTAMP '2024-01-03 00:00:00'
                   AND ts <  TIMESTAMP '2024-01-05 00:00:00'
                  THEN value + 1000.0 ELSE value END AS value
      FROM (
        SELECT event_type, value, ts FROM events
        UNION ALL
        SELECT event_type, value, ts + INTERVAL 365 DAY AS ts FROM events
        WHERE event_id % 5 = 0
      )
      UNION ALL
      SELECT event_type, value + 0.5 AS value FROM events
      WHERE event_id % 11 = 0
    )
    GROUP BY event_type
    """,
)
def events_spec_evolution_dml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEAF-SCOPED DML ON A MIXED-GENERATION TABLE (round 10): after a
    metadata-only spec evolution, MERGE no longer demands a full-table
    consolidation — it rewrites exactly the touched leaves, re-keying
    each touched OLD-generation leaf whole into the CURRENT spec while
    every untouched old-generation leaf stays byte-identical (Iceberg's
    behavior: rewrites land in the current spec; history survives).

    The events table lands under a DAILY spec, evolves to MONTHLY +
    user-bucket, appends a year-shifted slice under the new layout,
    then one MERGE (a) updates a two-day window of OLD-generation rows
    (value + 1000) and (b) inserts fresh rows landing in NEW-generation
    leaves. In-query asserts pin: untouched old leaves byte-identical
    (mtime), the touched old leaves dropped from the snapshot (their
    rows re-keyed), row-count integrity, and both generations still
    pruning after the DML. The oracle replays the same logical
    update+insert over the base parquet — a hash match certifies the
    merge applied exactly once across generations with no row lost,
    duplicated, or left stale.

    Reference anchor: the reference engine rewrites its whole output
    per run (etl_weekly_trades.py:134-156) — north-star lakehouse
    surface."""
    import datetime
    import glob
    import os
    import tempfile

    import etl_demo_spark.io.manifest as m

    (ev,) = _t(spark, sf_dir, "events")
    src = ev.select("event_id", "ts", "user_id", "event_type", "value")
    root = tempfile.mkdtemp(prefix="spec_dml_") + "/events"
    m.write_manifested(src, root, partition_transforms={"p_day": "days(ts)"})
    m.alter_partition_spec(
        spark, root, {"p_month": "months(ts)", "p_b": "bucket(8, user_id)"}
    )
    late = src.filter(F.col("event_id") % 5 == 0).withColumn(
        "ts", F.col("ts") + F.expr("INTERVAL 365 DAYS")
    )
    m.append_manifested(spark, root, late)
    pre_files = {
        f: os.stat(f).st_mtime_ns
        for f in glob.glob(f"{root}/p_day=*/__v*/*.parquet")
    }

    lo = datetime.datetime(2024, 1, 3)
    hi = datetime.datetime(2024, 1, 5)
    updates = src.filter(
        (F.col("ts") >= F.lit(lo)) & (F.col("ts") < F.lit(hi))
    ).withColumn("value", F.col("value") + F.lit(1000.0))
    inserts = src.filter(F.col("event_id") % 11 == 0).select(
        (F.col("event_id") + F.lit(90000000)).alias("event_id"),
        "ts",
        "user_id",
        "event_type",
        (F.col("value") + F.lit(0.5)).alias("value"),
    )
    n_base = src.count()
    n_late = late.count()
    n_ins = inserts.count()
    m.merge_upsert_manifested(
        spark,
        root,
        updates.unionByName(inserts),
        ["event_id", "ts"],
        ["p_month", "p_b"],
    )

    # untouched OLD-generation leaves: byte-identical after the merge
    touched_days = {f"{root}/p_day=2024-01-03", f"{root}/p_day=2024-01-04"}
    after = {
        f: os.stat(f).st_mtime_ns
        for f in glob.glob(f"{root}/p_day=*/__v*/*.parquet")
    }
    for f, sig in pre_files.items():
        if not any(f.startswith(d + "/") for d in touched_days):
            assert after.get(f) == sig, f"untouched old leaf churned: {f}"
    fs, jvm = m._hadoop_fs(spark, root)
    doc = m._load_doc(fs, jvm, root)
    assert "p_day=2024-01-03" not in doc["partitions"], (
        "touched old leaf must be re-keyed out of the snapshot"
    )
    assert doc.get("partition_specs"), "spec history survives the DML"

    got = m.read_manifested(spark, root)
    assert got.count() == n_base + n_late + n_ins
    # both generations still prune after the rewrite
    full_leaves = {p.rsplit("/", 2)[0] for p in got.inputFiles()}
    pruned = m.read_manifested(
        spark, root, prune_source={"ts": (lo, datetime.datetime(2024, 1, 6))}
    )
    pruned_leaves = {p.rsplit("/", 2)[0] for p in pruned.inputFiles()}
    assert 0 < len(pruned_leaves) < len(full_leaves)
    pred = (F.col("ts") >= F.lit(lo)) & (
        F.col("ts") < F.lit(datetime.datetime(2024, 1, 6))
    )
    assert pruned.filter(pred).count() == got.filter(pred).count()

    return got.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,4)"))
        .cast("double")
        .alias("total_value"),
    )


@query(
    "events_spec_evolution_maintenance",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
    FROM (
      SELECT event_id, event_type, value FROM events
      UNION ALL
      SELECT event_id, event_type, value FROM events WHERE event_id % 5 = 0
    )
    WHERE event_id % 7 <> 0 AND event_id % 13 <> 0
    GROUP BY event_type
    """,
)
def events_spec_evolution_maintenance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """MAINTENANCE ON A MIXED-GENERATION TABLE (round 10, closing the
    consolidation-first requirement): after a metadata-only spec
    evolution, the whole-leaf maintenance trio no longer demands a
    full-table `repartition_manifested` first —

    * DV DELETE (`delete_rows_manifested`) is positional (file, pos):
      zero bytes rewritten on EITHER generation;
    * KEY ERASURE (`delete_keys_manifested`) is leaf-scoped like the
      DML trio: old-generation leaves holding a matched key rewrite
      whole into the CURRENT spec, untouched old leaves stay
      byte-identical;
    * OPTIMIZE (`compact_manifested`, min_files=1) doubles as
      PROGRESSIVE MIGRATION: every compacted old-generation leaf is
      re-keyed into the current spec (and the pass materializes the
      DVs), so the table converges leaf by leaf — Iceberg's
      rewrite_data_files posture.

    The chain runs DV delete -> erasure -> full-migration compact on an
    evolved events table carrying a year-shifted append; in-query
    asserts pin zero-byte DV deletes, erased old leaves leaving the
    snapshot, and the post-compact snapshot holding only current-spec
    leaves with the spec history intact. The oracle replays the
    surviving multiset from the base parquet — a hash match certifies
    no row was lost, duplicated, or resurrected across the three
    maintenance commits.

    Reference anchor: the reference rewrites its whole output per run
    (etl_weekly_trades.py:134-156) — north-star lakehouse surface."""
    import glob
    import os
    import tempfile

    import etl_demo_spark.io.manifest as m

    (ev,) = _t(spark, sf_dir, "events")
    src = ev.select("event_id", "ts", "user_id", "event_type", "value")
    root = tempfile.mkdtemp(prefix="spec_maint_") + "/events"
    m.write_manifested(src, root, partition_transforms={"p_day": "days(ts)"})
    m.alter_partition_spec(
        spark, root, {"p_month": "months(ts)", "p_b": "bucket(8, user_id)"}
    )
    late = src.filter(F.col("event_id") % 5 == 0).withColumn(
        "ts", F.col("ts") + F.expr("INTERVAL 365 DAYS")
    )
    m.append_manifested(spark, root, late)
    n_total = src.count() + late.count()

    # 1) DV delete spanning both generations: zero data bytes moved
    pre_files = {
        f: os.stat(f).st_mtime_ns
        for f in glob.glob(f"{root}/p_*/**/*.parquet", recursive=True)
    }
    n_dv = m.delete_rows_manifested(spark, root, F.col("event_id") % 7 == 0)
    assert n_dv > 0
    after_dv = {
        f: os.stat(f).st_mtime_ns
        for f in glob.glob(f"{root}/p_*/**/*.parquet", recursive=True)
    }
    assert after_dv == pre_files, "DV delete must rewrite no data file"
    assert m.read_manifested(spark, root).count() == n_total - n_dv

    # 2) key erasure, leaf-scoped across generations
    keys = (
        src.filter(
            (F.col("event_id") % 13 == 0) & (F.col("event_id") % 7 != 0)
        )
        .select("event_id")
        .distinct()
    )
    m.delete_keys_manifested(
        spark, root, keys, ["event_id"], ["p_month", "p_b"]
    )
    survivors = m.read_manifested(spark, root)
    assert (
        survivors.filter(
            (F.col("event_id") % 7 == 0) | (F.col("event_id") % 13 == 0)
        ).count()
        == 0
    )

    # 3) OPTIMIZE as progressive migration: every old-generation leaf
    # re-keys into the current spec; DVs materialize
    m.compact_manifested(spark, root, min_files=1)
    fs, jvm = m._hadoop_fs(spark, root)
    doc = m._load_doc(fs, jvm, root)
    assert not any(r.startswith("p_day=") for r in doc["partitions"]), (
        "compact must migrate old-generation leaves to the current spec"
    )
    assert not doc.get("leaf_spec")
    assert doc.get("partition_specs"), "spec history survives"
    got = m.read_manifested(spark, root)
    assert got.count() == survivors.count()

    return got.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,4)"))
        .cast("double")
        .alias("total_value"),
    )


@query(
    "events_update_mor",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN event_id % 7 = 0
                         THEN CAST(value + 100.0 AS DECIMAL(18,4))
                         ELSE CAST(value AS DECIMAL(18,4)) END)
                AS DOUBLE) AS total_value
    FROM events
    GROUP BY event_type
    """,
)
def events_update_mor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE-ON-READ UPDATE (round 10, `update_rows_manifested`): the
    write-amplification fix for point updates — matched rows' physical
    positions tombstone into the deletion-vector sidecar and their
    updated images land as APPEND extras, one atomic commit, cost
    O(changed rows) written. A point update on a 1 GB leaf writes
    kilobytes instead of rewriting the gigabyte (Delta's DV-powered
    UPDATE); the next OPTIMIZE materializes and consolidates.

    In-query asserts pin the contract: every pre-existing data file
    byte-identical (size + mtime) after the update, the commit carries
    both a DV pointer and append extras, and the read surfaces exactly
    the updated values. The oracle replays the logical update over the
    base parquet in exact decimal — a hash match certifies no row
    lost, duplicated, or double-updated through the DV/extras overlay.

    Reference anchor: the reference rewrites its whole output per run
    (etl_weekly_trades.py:134-156) — north-star lakehouse surface."""
    import glob
    import os
    import tempfile

    import etl_demo_spark.io.manifest as m

    (ev,) = _t(spark, sf_dir, "events")
    src = ev.select("event_id", "user_id", "event_type", "value")
    root = tempfile.mkdtemp(prefix="mor_update_") + "/events"
    m.write_manifested(src, root, "event_type", stats_cols=["event_id"])
    pre = {
        f: (os.path.getsize(f), os.stat(f).st_mtime_ns)
        for f in glob.glob(f"{root}/event_type=*/__v*/*.parquet")
    }
    assert pre
    n = m.update_rows_manifested(
        spark, root, {"value": F.col("value") + 100.0},
        F.col("event_id") % 7 == 0,
    )
    assert n > 0
    after = {
        f: (os.path.getsize(f), os.stat(f).st_mtime_ns)
        for f in glob.glob(f"{root}/event_type=*/__v*/*.parquet")
    }
    for f, sig in pre.items():
        assert after.get(f) == sig, f"MoR update rewrote a data file: {f}"
    fs, jvm = m._hadoop_fs(spark, root)
    doc = m._load_doc(fs, jvm, root)
    assert doc.get("dv") and doc.get("extra_vrels")
    got = m.read_manifested(spark, root)
    assert got.count() == src.count()
    return got.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,4)"))
        .cast("double")
        .alias("total_value"),
    )


@query(
    "orders_merge_mor",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(total AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM (
      SELECT o_orderpriority,
             CASE WHEN o_orderkey % 50 = 0
                  THEN o_totalprice + 1000.0
                  ELSE o_totalprice END AS total
      FROM orders
      UNION ALL
      SELECT o_orderpriority, o_totalprice + 7777.5 AS total
      FROM orders WHERE o_orderkey % 97 = 0
    )
    GROUP BY o_orderpriority
    """,
)
def orders_merge_mor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE-ON-READ MERGE (round 10, `merge_upsert_mor_manifested`):
    the upsert twin of the MoR UPDATE — matched target rows tombstone
    positionally into the DV sidecar and EVERY source row (updates and
    fresh inserts alike) lands as append extras, one atomic commit,
    O(source rows) written. This is the write path a streaming CDC sink
    wants per micro-batch (`run_stream_cdc_upsert(upsert_mode="mor")`):
    the batch is written, never the touched partitions; with
    delete_mode="dv" the whole feed is rewrite-free between OPTIMIZEs.

    In-query asserts pin byte-identity of every pre-existing data file
    plus the DV + extras commit shape; the oracle replays the logical
    upsert (updates overlay, inserts union) in exact decimal — a hash
    match certifies each key resolved exactly once through the
    DV/extras overlay with no row lost, duplicated, or stale.

    Reference anchor: the reference rewrites its whole output per run
    (etl_weekly_trades.py:134-156) — north-star lakehouse surface."""
    import glob
    import os
    import tempfile

    import etl_demo_spark.io.manifest as m

    (orders,) = _t(spark, sf_dir, "orders")
    src = orders.select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
    )
    root = tempfile.mkdtemp(prefix="mor_merge_") + "/orders"
    m.write_manifested(src, root, "o_orderpriority", stats_cols=["o_orderkey"])
    pre = {
        f: (os.path.getsize(f), os.stat(f).st_mtime_ns)
        for f in glob.glob(f"{root}/o_orderpriority=*/__v*/*.parquet")
    }
    assert pre
    updates = src.filter(F.col("o_orderkey") % 50 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") + 1000.0
    )
    inserts = src.filter(F.col("o_orderkey") % 97 == 0).select(
        (F.col("o_orderkey") + F.lit(30000000)).alias("o_orderkey"),
        "o_custkey",
        (F.col("o_totalprice") + 7777.5).alias("o_totalprice"),
        "o_orderpriority",
    )
    n = m.merge_upsert_mor_manifested(
        spark, root, updates.unionByName(inserts), ["o_orderkey"]
    )
    assert n == updates.count() + inserts.count()
    after = {
        f: (os.path.getsize(f), os.stat(f).st_mtime_ns)
        for f in glob.glob(f"{root}/o_orderpriority=*/__v*/*.parquet")
    }
    for f, sig in pre.items():
        assert after.get(f) == sig, f"MoR merge rewrote a data file: {f}"
    fs, jvm = m._hadoop_fs(spark, root)
    doc = m._load_doc(fs, jvm, root)
    assert doc.get("dv") and doc.get("extra_vrels")
    got = m.read_manifested(spark, root)
    assert got.count() == src.count() + inserts.count()
    return got.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("total"),
    )


@query(
    "stream_cdc_restore",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(value), 2) AS total_value
    FROM events
    GROUP BY event_type
    """,
)
def stream_cdc_restore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMS RIDE THROUGH RESTORE (`rollback_manifested` change
    sidecar): on a change_feed table, a rollback stages its exact
    row-level delta — the inverse of the net change feed from the
    restore target to the head — so a CDC subscriber applies the
    rollback like any other commit instead of refusing a rewrite.

    The table takes an append and a value-doubling MERGE, a replica
    drains the feed, then the table is RESTORED to the pre-merge
    version; the SAME checkpoint drains again and the replica must
    converge to the live (restored) table — asserted in-query as
    multiset equality both ways, plus the restore commit's sidecar
    presence (`change_data` non-null on the RESTORE commit). The oracle
    recomputes the restored state from the base parquet (append ∪ seed
    = the full events table, merge undone), so a hash match certifies
    the inverse-delta computation end-to-end."""
    import tempfile

    import etl_demo_spark.io.manifest as m
    from etl_demo_spark.io.table_stream import register_table_stream_source

    register_table_stream_source(spark)
    (ev,) = _t(spark, sf_dir, "events")
    src = ev.select("event_id", "event_type", "user_id", "value")
    root = tempfile.mkdtemp(prefix="cdc_restore_")
    table, sink, ck = f"{root}/events", f"{root}/sink", f"{root}/ck"
    m.write_manifested(
        src.filter(F.col("event_id") % 2 == 0), table, "event_type",
        change_feed=True,
    )  # v1
    m.append_manifested(spark, table, src.filter(F.col("event_id") % 2 == 1))
    m.merge_upsert_manifested(  # v3: the bad deploy doubles every 5th key
        spark,
        table,
        src.filter(F.col("event_id") % 5 == 0).withColumn(
            "value", F.col("value") * 2
        ),
        ["event_id"],
        ["event_type"],
    )

    def drain():
        q = (
            spark.readStream.format("tablestream")
            .option("path", table)
            .load()
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    drain()  # replica is at v3 (bad values included)
    rb = m.rollback_manifested(spark, table, 2)  # v4 RESTORE, sidecar'd
    fs, jvm = m._hadoop_fs(spark, table)
    ch = m._load_raw(fs, jvm, table, rb).get("change_data")
    assert ch and ch.get("rel"), "restore on a change_feed table must sidecar"
    drain()  # the SAME checkpoint rides through the restore

    feed = spark.read.parquet(sink).drop("_commit_version")
    replica = feed.filter("_change_type = 'insert'").drop(
        "_change_type"
    ).exceptAll(feed.filter("_change_type = 'delete'").drop("_change_type"))
    live = m.read_manifested(spark, table)
    assert replica.exceptAll(live).count() == 0, "replica has phantom rows"
    assert live.exceptAll(replica).count() == 0, "replica lost rows"

    return replica.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


@query(
    "catalog_stream_consistent_mv",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100 * 4)
                AS BIGINT) AS total_cents_x_rate
    FROM orders
    WHERE o_orderstatus = 'O'
    GROUP BY o_orderpriority
    """,
)
def catalog_stream_consistent_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CATALOG-LEVEL CONSISTENT MULTI-TABLE STREAM
    (`io/catalog_stream.py`): one metadata row per catalog version with
    its full PIN MAP — the cross-table analogue of the tablestream's
    commits mode, and the only channel that lets a two-table consumer
    refresh WITHOUT torn pins (member tables individually tailed can
    interleave versions that were never published together).

    The fixture maintains a cross-table INVARIANT that any torn read
    breaks: every catalog flip doubles table A's prices in the SAME
    atomic pin flip that halves table B's rates, so
    Σ price×rate is constant per published state — a refresh mixing
    new-A with old-B reads double. The stream drains every catalog
    version; a refresh per row reads BOTH tables AT the row's pins and
    recomputes the join. In-query asserts: (1) every refresh observes
    the invariant (never torn), (2) refresh count == catalog flips —
    a table-level commit without a pin flip triggers nothing, (3)
    exactly-once across a second drain of the same checkpoint. The
    oracle recomputes the final state from base parquet (prices ×4,
    rates ×¼ cancel), certifying the pinned-version reads end-to-end."""
    import tempfile

    from etl_demo_spark.io.catalog import catalog_commit, catalog_init
    from etl_demo_spark.io.catalog_stream import (
        register_catalog_stream_source,
    )
    from etl_demo_spark.io.manifest import (
        append_manifested,
        manifest_versions,
        merge_upsert_manifested,
        read_manifested,
        write_manifested,
    )

    register_catalog_stream_source(spark)
    (orders,) = _t(spark, sf_dir, "orders")
    a0 = orders.filter(F.col("o_orderstatus") == "O").select(
        "o_orderkey",
        "o_orderpriority",
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    root = tempfile.mkdtemp(prefix="cat_stream_")
    a_root, b_root, cat = f"{root}/prices", f"{root}/rates", f"{root}/cat"
    sink, ck = f"{root}/sink", f"{root}/ck"
    write_manifested(a0, a_root, "o_orderpriority")
    rates0 = a0.select("o_orderpriority").distinct().withColumn(
        "rate", F.lit(4).cast("bigint")
    )
    write_manifested(rates0, b_root, "o_orderpriority")
    catalog_init(spark, cat, {"prices": a_root, "rates": b_root})  # cv1

    def flip(mult: int, rate: int) -> None:
        merge_upsert_manifested(
            spark,
            a_root,
            read_manifested(spark, a_root).withColumn(
                "cents", F.col("cents") * mult
            ),
            ["o_orderkey"],
            ["o_orderpriority"],
        )
        merge_upsert_manifested(
            spark,
            b_root,
            read_manifested(spark, b_root).withColumn(
                "rate", F.lit(rate).cast("bigint")
            ),
            ["o_orderpriority"],
            ["o_orderpriority"],
        )
        catalog_commit(
            spark,
            cat,
            {
                "prices": manifest_versions(spark, a_root)[-1],
                "rates": manifest_versions(spark, b_root)[-1],
            },
        )

    def drain():
        q = (
            spark.readStream.format("catalogstream")
            .option("path", cat)
            .load()
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    # the CONTINUOUS pattern: refresh as each flip arrives (each refresh
    # reads pins that are by construction inside the member tables'
    # retention windows — historical catalog versions need release tags,
    # which catalog_release_snapshot covers)
    totals: list[int] = []
    seen: set[int] = set()
    last_pins: dict = {}

    def refresh_new_flips() -> int:
        drain()
        fresh = 0
        for r in sorted(
            spark.read.parquet(sink).collect(), key=lambda r: r["version"]
        ):
            if r["version"] in seen:
                continue
            seen.add(r["version"])
            fresh += 1
            pins = r["pins"]
            last_pins.clear()
            last_pins.update(pins)
            a = read_manifested(spark, a_root, version=int(pins["prices"]))
            b = read_manifested(spark, b_root, version=int(pins["rates"]))
            t = (
                a.join(b, "o_orderpriority")
                .agg(F.sum(F.col("cents") * F.col("rate")))
                .first()[0]
            )
            totals.append(int(t))
        return fresh

    assert refresh_new_flips() == 1  # cv1
    flip(2, 2)  # cv2: prices x2, rates 4->2
    assert refresh_new_flips() == 1
    flip(2, 1)  # cv3: prices x4 total, rates ->1
    assert refresh_new_flips() == 1
    assert len(set(totals)) == 1, f"torn multi-table read observed: {totals}"

    # a table-level commit WITHOUT a pin flip: invisible to the stream
    append_manifested(
        spark,
        a_root,
        spark.createDataFrame(
            [(999_999_999, "1-URGENT", 1)],
            "o_orderkey BIGINT, o_orderpriority STRING, cents BIGINT",
        ),
    )
    assert refresh_new_flips() == 0, "no refresh without a pin flip"
    assert len(totals) == 3
    # the un-flipped append never surfaced in any pinned refresh
    assert read_manifested(
        spark, a_root, version=int(last_pins["prices"])
    ).count() < read_manifested(spark, a_root).count()

    a = read_manifested(spark, a_root, version=int(last_pins["prices"]))
    b = read_manifested(spark, b_root, version=int(last_pins["rates"]))
    return (
        a.join(b, "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("cents") * F.col("rate")).alias("total_cents_x_rate"),
        )
    )
