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
    always CAST in the oracle).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_demo_spark.io.sources import load_tables
from etl_demo_spark.ops import asof_join, week_start


def _t(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    tabs = load_tables(spark, sf_dir, tables=tuple(names))
    return [tabs[n] for n in names]

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a corpus entry. ``oracle=None`` → driver rows-only check."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
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
           CAST(SUM(CAST(l_extendedprice AS {DEC_SQL})
                    * (1 - CAST(l_discount AS {RATE_SQL}))) AS DOUBLE) AS revenue,
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
    notional = dec("l_extendedprice") * (1 - rate("l_discount"))
    return (
        li.groupBy(
            week_start("l_shipdate").alias("week_start_date"),
            "l_returnflag",
        )
        .agg(
            dsum(notional).alias("revenue"),
            dsum(dec("l_quantity")).alias("sum_qty"),
            F.count(F.lit(1)).alias("trade_count"),
        )
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
           CAST(SUM(CAST(l_extendedprice AS {DEC_SQL}) * (1 - CAST(l_discount AS {RATE_SQL}))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS {DEC_SQL}) * (1 - CAST(l_discount AS {RATE_SQL})) * (1 + CAST(l_tax AS {RATE_SQL}))) AS DOUBLE) AS sum_charge,
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
    accumulate in engine-specific order)."""
    (li,) = _t(spark, sf_dir, "lineitem")
    disc_price = dec("l_extendedprice") * (1 - rate("l_discount"))
    charge = dec("l_extendedprice") * (1 - rate("l_discount")) * (1 + rate("l_tax"))
    cnt = F.count(F.lit(1))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum(dec("l_quantity")).alias("sum_qty"),
        dsum(dec("l_extendedprice")).alias("sum_base_price"),
        dsum(disc_price).alias("sum_disc_price"),
        dsum(charge).alias("sum_charge"),
        (dsum(dec("l_quantity")) / cnt).alias("avg_qty"),
        (dsum(rate("l_discount")) / cnt).alias("avg_disc"),
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
           CAST(SUM(CAST(l_extendedprice AS {DEC_SQL}) * (1 - CAST(l_discount AS {RATE_SQL}))) AS DOUBLE) AS revenue
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
    revenue = dec("l_extendedprice") * (1 - rate("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(dsum(revenue).alias("revenue"))
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
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
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


@query("approx_distinct_parts")  # no oracle: HLL estimate is engine-specific
def approx_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-4 approx_count_distinct (HyperLogLog++). At 100 TB this replaces
    exact count-distinct where ±2% error is acceptable — no expand, no
    per-key state explosion. Rows-only check: estimates are
    engine-specific by nature (exact value returned alongside bounds)."""
    (li,) = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.approx_count_distinct("l_partkey", 0.02).alias("approx_parts"),
        F.countDistinct("l_partkey").alias("exact_parts"),
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
