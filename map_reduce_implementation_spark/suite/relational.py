"""Relational operator suite (SURVEY.md §2.3-§2.8 — all EXT vs the
reference, which has no joins/windows/sorts/set-ops at all).

Every query is a declarative DataFrame pipeline: Catalyst does predicate
pushdown, column pruning and join-strategy selection; AQE handles runtime
coalesce and skew. Scale notes are per-query in the docstrings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import table
from .base import SQL_REVENUE, Query, dec, money_sum, revenue_expr


# --- scans / filter / project ------------------------------------------------


def q_filter_project(spark: SparkSession, sf: str) -> DataFrame:
    """Predicate + projection pushed down to the parquet scan (verified in
    plans/audit.py: PushedFilters + 3-column ReadSchema). At 100 TB this
    reads only the row groups passing the min/max filter."""
    return (
        table(spark, sf, "lineitem")
        .filter((F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01"))
        .filter(F.col("l_quantity") > 45)
        .select("l_orderkey", "l_partkey", "l_quantity")
    )


SQL_FILTER_PROJECT = """
SELECT l_orderkey, l_partkey, l_quantity
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_quantity > 45
"""


# --- aggregations ------------------------------------------------------------


def q_pricing_summary(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q1 shape: the canonical partial+final two-phase aggregation —
    the Spark-native form of the reference's combiner pipeline
    (usr_functions.c:37-54 partial → 73-108 final). Shuffle carries only
    |groups|×partitions rows thanks to map-side partial agg."""
    li = table(spark, sf, "lineitem").filter(F.col("l_shipdate") <= "1998-09-02")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        money_sum("l_quantity", "sum_qty"),
        money_sum("l_extendedprice", "sum_base_price"),
        F.sum(revenue_expr()).cast("double").alias("sum_disc_price"),
        (F.sum(dec("l_quantity")).cast("double") / F.count("*")).alias("avg_qty"),
        F.count("*").alias("count_order"),
    )


SQL_PRICING_SUMMARY = f"""
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
  CAST(SUM({SQL_REVENUE}) AS DOUBLE) AS sum_disc_price,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q_agg_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """COUNT(DISTINCT) — Spark expands to a two-phase distinct aggregate;
    at scale prefer approx_count_distinct (HLL) which is one pass and
    mergeable — provided as a separate rows-only query."""
    return (
        table(spark, sf, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct("l_partkey").alias("n_part"),
            F.count("*").alias("n_rows"),
        )
    )


SQL_AGG_DISTINCT = """
SELECT l_returnflag,
  COUNT(DISTINCT l_suppkey) AS n_supp,
  COUNT(DISTINCT l_partkey) AS n_part,
  COUNT(*) AS n_rows
FROM lineitem GROUP BY l_returnflag
"""


def q_rollup(spark: SparkSession, sf: str) -> DataFrame:
    """ROLLUP grouping sets (EXT; SURVEY §2.4)."""
    return (
        table(spark, sf, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n_orders"), money_sum("o_totalprice", "sum_price"))
    )


SQL_ROLLUP = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


def q_cube(spark: SparkSession, sf: str) -> DataFrame:
    return (
        table(spark, sf, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(money_sum("l_quantity", "sum_qty"), F.count("*").alias("n_rows"))
    )


SQL_CUBE = """
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
  COUNT(*) AS n_rows
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
"""


def q_pivot(spark: SparkSession, sf: str) -> DataFrame:
    """Pivot with an explicit value list (never let Spark scan for values
    at 100 TB — always pass the list)."""
    return (
        table(spark, sf, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.sum(dec("l_quantity")).cast("double"))
    )


SQL_PIVOT = """
SELECT l_returnflag,
  CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS F,
  CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS O
FROM lineitem GROUP BY l_returnflag
"""


# --- joins -------------------------------------------------------------------


def q_join_shipping_priority(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join + agg + top-k. customer is small → we
    broadcast it; orders⋈lineitem is a shuffle hash/sort-merge join on
    the key both sides already produce. Top-k plans as
    TakeOrderedAndProject (no global sort at scale)."""
    cust = table(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = table(spark, sf, "orders").filter(F.col("o_orderdate") < "1999-01-01")
    li = table(spark, sf, "lineitem").filter(F.col("l_shipdate") > "1997-01-01")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue_expr()).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


SQL_JOIN_SHIPPING_PRIORITY = f"""
SELECT o_orderkey, o_orderdate, o_orderpriority,
  CAST(SUM({SQL_REVENUE}) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1999-01-01'
  AND l_shipdate > TIMESTAMP '1997-01-01'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
"""


def q_join_nation_volume(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between nation pairs by
    year. Both nation sides resolve through **broadcast** dims (nation,
    supplier, customer); the only big shuffle is orders⋈lineitem on the
    orderkey both sides already produce. The pair×year output is
    |nations|²×years — tiny — so the final agg reduces hard."""
    nation = table(spark, sf, "nation").select("n_nationkey", "n_name")
    supp = (
        table(spark, sf, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        table(spark, sf, "customer")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    li = table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    orders = table(spark, sf, "orders")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(F.sum(revenue_expr()).cast("double").alias("volume"))
    )


SQL_JOIN_NATION_VOLUME = f"""
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
  CAST(year(l_shipdate) AS INTEGER) AS l_year,
  CAST(SUM({SQL_REVENUE}) AS DOUBLE) AS volume
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN customer ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND sn.n_name <> cn.n_name
GROUP BY sn.n_name, cn.n_name, year(l_shipdate)
"""


def q_join_returned_customers(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by revenue lost to returned
    items in one quarter. Dims broadcast, one orderkey shuffle, top-k
    via TakeOrderedAndProject — same scale skeleton as Q3."""
    nation = table(spark, sf, "nation").select("n_nationkey", "n_name")
    cust = table(spark, sf, "customer").join(
        F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
    )
    orders = table(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= "1995-01-01") & (F.col("o_orderdate") < "1995-04-01")
    )
    li = table(spark, sf, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(revenue_expr()).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


SQL_JOIN_RETURNED_CUSTOMERS = f"""
SELECT c_custkey, c_name, c_acctbal, n_name,
  CAST(SUM({SQL_REVENUE}) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1995-04-01'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


def q_forecast_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q6 shape: pure filter + global agg, no join — the query
    whose entire cost is the scan, so it lives or dies on predicate
    pushdown + column pruning (plan-asserted in test_plans for the
    scan family). One row out; partial aggs collapse map-side."""
    li = table(spark, sf, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(dec("l_extendedprice") * dec("l_discount"))
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


SQL_FORECAST_REVENUE = """
SELECT
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
  COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


def q_promo_revenue_share(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share per month — conditional
    aggregation over a broadcast part join. The CASE rides inside the
    same partial agg as the total, so one scan + one broadcast join +
    one month-keyed reduce covers both numerator and denominator."""
    part = table(spark, sf, "part").select("p_partkey", "p_type")
    li = table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    rev = revenue_expr()
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.date_format("l_shipdate", "yyyy-MM").alias("month"))
        .agg(
            F.sum(F.when(F.col("p_type").startswith("PROMO"), rev))
            .cast("double")
            .alias("promo_revenue"),
            F.sum(rev).cast("double").alias("total_revenue"),
        )
        .select(
            "month",
            "promo_revenue",
            "total_revenue",
            F.round(
                F.lit(100.0) * F.col("promo_revenue") / F.col("total_revenue"), 6
            ).alias("promo_pct"),
        )
    )


SQL_PROMO_REVENUE_SHARE = f"""
SELECT strftime(l_shipdate, '%Y-%m') AS month,
  CAST(SUM(CASE WHEN p_type LIKE 'PROMO%' THEN {SQL_REVENUE} END) AS DOUBLE) AS promo_revenue,
  CAST(SUM({SQL_REVENUE}) AS DOUBLE) AS total_revenue,
  ROUND(100.0 * CAST(SUM(CASE WHEN p_type LIKE 'PROMO%' THEN {SQL_REVENUE} END) AS DOUBLE)
        / CAST(SUM({SQL_REVENUE}) AS DOUBLE), 6) AS promo_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY strftime(l_shipdate, '%Y-%m')
"""


def q_market_basket(spark: SparkSession, sf: str) -> DataFrame:
    """Association mining: top-50 part pairs co-occurring in orders,
    with support and lift. The pair generation is a self-join ON THE
    ORDER KEY — per-order item counts are bounded (a basket has a few
    items), so pair count is O(orders·basket²), never |parts|². At
    100 TB the guard is a per-order item cap before pairing (same
    max_df idea as the jaccard stop-shingle cap). Item frequencies
    join back via **broadcast** (part-dictionary-sized). Top-k plans
    as TakeOrderedAndProject."""
    # Round-12 optimization (guide §2.4): the distinct item frame feeds
    # FOUR plan references (order-count scalar, item frequencies, both
    # self-join sides) — materialize once instead of re-running the
    # fact scan + distinct per reference (8 parquet scans → 2)
    items = (
        table(spark, sf, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_orders = items.select("l_orderkey").distinct().count()  # one scalar
    freq = items.groupBy("l_partkey").agg(F.count("*").alias("item_n"))
    a, b = items.alias("a"), items.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("p1"), F.col("b.l_partkey").alias("p2")
        )
        .agg(F.count("*").alias("pair_n"))
    )
    fa = freq.select(F.col("l_partkey").alias("p1"), F.col("item_n").alias("n1"))
    fb = freq.select(F.col("l_partkey").alias("p2"), F.col("item_n").alias("n2"))
    scored = (
        pairs.join(F.broadcast(fa), "p1")
        .join(F.broadcast(fb), "p2")
        .select(
            "p1",
            "p2",
            "pair_n",
            F.round(F.col("pair_n") / F.lit(n_orders), 6).alias("support"),
            F.round(
                (F.col("pair_n") / F.lit(n_orders))
                / (
                    (F.col("n1") / F.lit(n_orders))
                    * (F.col("n2") / F.lit(n_orders))
                ),
                6,
            ).alias("lift"),
        )
    )
    return scored.orderBy(
        F.desc("pair_n"), F.asc("p1"), F.asc("p2")
    ).limit(50)


SQL_MARKET_BASKET = """
WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM items),
freq AS (SELECT l_partkey, COUNT(*) AS item_n FROM items GROUP BY l_partkey),
pairs AS (
  SELECT a.l_partkey AS p1, b.l_partkey AS p2, COUNT(*) AS pair_n
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY a.l_partkey, b.l_partkey
)
SELECT p1, p2, pair_n,
  ROUND(pair_n / n.n_orders, 6) AS support,
  ROUND((pair_n / n.n_orders) / ((fa.item_n / n.n_orders) * (fb.item_n / n.n_orders)), 6) AS lift
FROM pairs
JOIN freq fa ON pairs.p1 = fa.l_partkey
JOIN freq fb ON pairs.p2 = fb.l_partkey
CROSS JOIN n
ORDER BY pair_n DESC, p1 ASC, p2 ASC
LIMIT 50
"""


def q_approx_distinct_rollup(spark: SparkSession, sf: str) -> DataFrame:
    """Mergeable-sketch rollup — THE 100 TB distinct-count pattern:
    build one HLL sketch per (lang, source) cell, then merge cell
    sketches with ``hll_union_agg`` to per-lang distinct-doc estimates.
    COUNT(DISTINCT) re-shuffles raw values at every rollup level;
    sketches shuffle kilobytes and merge associatively, which is also
    how incremental daily rollups compose. Estimates are
    engine-specific (Apache DataSketches) → rows-only driver check;
    the ±5% accuracy bound vs exact is asserted in tests."""
    d = table(spark, sf, "documents")
    cells = d.groupBy("lang", "source").agg(
        F.hll_sketch_agg("doc_id").alias("sk"),
        F.count("*").alias("n_rows"),
    )
    return (
        cells.groupBy("lang")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_docs"),
            F.sum("n_rows").alias("n_rows"),
        )
        .select("lang", "approx_docs", "n_rows")
    )


def q_join_region_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way star join. All dimensions (region, nation,
    supplier, customer) are broadcast — only the orders⋈lineitem edge
    shuffles. This is the 100 TB-correct shape: the fact-fact join keys
    are co-partitioned by the shuffle; everything else is map-side."""
    region = table(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    nation = table(spark, sf, "nation")
    supplier = table(spark, sf, "supplier")
    customer = table(spark, sf, "customer")
    orders = table(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1999-01-01")
    )
    li = table(spark, sf, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(
            F.broadcast(customer),
            (orders.o_custkey == customer.c_custkey)
            & (customer.c_nationkey == supplier.s_nationkey),
        )
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(revenue_expr()).cast("double").alias("revenue"))
    )


SQL_JOIN_REGION_REVENUE = f"""
SELECT n_name, CAST(SUM({SQL_REVENUE}) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1999-01-01'
GROUP BY n_name
"""


def q_broadcast_join(spark: SparkSession, sf: str) -> DataFrame:
    """Explicit broadcast-hint join: part (dimension) into lineitem (fact).
    No shuffle of the fact side at all — map-side hash join."""
    part = table(spark, sf, "part").filter(F.col("p_size") >= 40)
    li = table(spark, sf, "lineitem")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(F.sum(revenue_expr()).cast("double").alias("revenue"), F.count("*").alias("n_items"))
    )


SQL_BROADCAST_JOIN = f"""
SELECT p_brand, CAST(SUM({SQL_REVENUE}) AS DOUBLE) AS revenue, COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_size >= 40
GROUP BY p_brand
"""


def q_semi_join(spark: SparkSession, sf: str) -> DataFrame:
    """LEFT SEMI = EXISTS: customers having at least one urgent order.
    Plans as a broadcast/shuffled semi join — no row duplication, no
    post-join distinct needed."""
    orders = table(spark, sf, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    cust = table(spark, sf, "customer")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


SQL_SEMI_JOIN = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
"""


def q_anti_join(spark: SparkSession, sf: str) -> DataFrame:
    """LEFT ANTI = NOT EXISTS: customers with no urgent orders."""
    orders = table(spark, sf, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    cust = table(spark, sf, "customer")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


SQL_ANTI_JOIN = """
SELECT c_custkey, c_name
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
"""


def q_outer_join(spark: SparkSession, sf: str) -> DataFrame:
    """LEFT OUTER join preserving empty groups (nations with zero
    suppliers) — the same zero-fill semantics as the letter counter's
    26-row domain join (usr_functions.c:102-106)."""
    nation = table(spark, sf, "nation")
    supplier = table(spark, sf, "supplier")
    return (
        nation.join(supplier, nation.n_nationkey == supplier.s_nationkey, "left")
        .groupBy("n_nationkey", "n_name")
        .agg(F.count("s_suppkey").alias("n_suppliers"))
    )


SQL_OUTER_JOIN = """
SELECT n_nationkey, n_name, COUNT(s_suppkey) AS n_suppliers
FROM nation LEFT JOIN supplier ON n_nationkey = s_nationkey
GROUP BY n_nationkey, n_name
"""


# --- windows -----------------------------------------------------------------


def q_window_topk_per_group(spark: SparkSession, sf: str) -> DataFrame:
    """Top-3 customers per market segment by balance. ROW_NUMBER with a
    unique tie-break (c_custkey) so the result is deterministic. At scale
    this is one shuffle on the partition key; skewed groups are split by
    AQE."""
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        table(spark, sf, "customer")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("c_mktsegment", "c_custkey", "c_acctbal", "rn")
    )


SQL_WINDOW_TOPK_PER_GROUP = """
SELECT c_mktsegment, c_custkey, c_acctbal, rn FROM (
  SELECT c_mktsegment, c_custkey, c_acctbal,
    CAST(ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                            ORDER BY c_acctbal DESC, c_custkey ASC) AS INTEGER) AS rn
  FROM customer) t
WHERE rn <= 3
"""


def q_window_running_sum(spark: SparkSession, sf: str) -> DataFrame:
    """Per-customer running spend (ROWS UNBOUNDED PRECEDING). Decimal
    accumulation keeps every prefix exact → oracle-stable."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        table(spark, sf, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            "o_orderdate",
            F.sum(dec("o_totalprice")).over(w).cast("double").alias("running_spend"),
        )
    )


SQL_WINDOW_RUNNING_SUM = """
SELECT o_custkey, o_orderkey, o_orderdate,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
       OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
FROM orders
"""


def q_window_lag(spark: SparkSession, sf: str) -> DataFrame:
    """LAG: gap in days since the customer's previous order."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_orderdate").over(w)
    return table(spark, sf, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.col("o_orderdate"), prev).cast("int").alias("days_since_prev"),
    )


SQL_WINDOW_LAG = """
SELECT o_custkey, o_orderkey,
  CAST(datediff('day',
       LAG(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
       o_orderdate) AS INTEGER) AS days_since_prev
FROM orders
"""


def q_window_frames(spark: SparkSession, sf: str) -> DataFrame:
    """Ranking + distribution + explicit-frame window functions in one
    pass: ntile quartiles, percent_rank, cume_dist, and first/last value
    over a bounded ROWS frame — all share ONE window sort (single
    shuffle on the partition key, one sort per partition)."""
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    o = table(spark, sf, "orders")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 9).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 9).alias("cume"),
        F.first_value(F.col("o_orderkey")).over(wf).alias("cheapest_key_so_far"),
    )


SQL_WINDOW_FRAMES = """
SELECT o_custkey, o_orderkey,
  CAST(NTILE(4) OVER w AS INTEGER) AS quartile,
  ROUND(PERCENT_RANK() OVER w, 9) AS pct_rank,
  ROUND(CUME_DIST() OVER w, 9) AS cume,
  FIRST_VALUE(o_orderkey) OVER
    (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey
     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cheapest_key_so_far
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
"""


def q_custdist(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of per-customer order counts —
    LEFT join (zero-order customers count at 0) then a second aggregation
    over the first's result. Two shuffles by construction (different
    keys); the second input is already tiny (one row per customer)."""
    c = table(spark, sf, "customer")
    o = table(spark, sf, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


SQL_CUSTDIST = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
) t
GROUP BY c_count
"""


def q_window_range_frame(spark: SparkSession, sf: str) -> DataFrame:
    """RANGE window frame (value-based, not row-based): for each order,
    how many same-customer orders fall within ±5000 of its price. RANGE
    frames cost the same one sort as ROWS frames — the frame bound is
    resolved by scanning the ordered partition."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_totalprice"))
        .rangeBetween(-5000, 5000)
    )
    o = table(spark, sf, "orders")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.count("*").over(w).alias("n_near_price"),
        F.round(F.avg("o_totalprice").over(w), 6).alias("avg_near_price"),
    )


SQL_WINDOW_RANGE_FRAME = """
SELECT o_custkey, o_orderkey,
  COUNT(*) OVER w AS n_near_price,
  ROUND(AVG(o_totalprice) OVER w, 6) AS avg_near_price
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice
             RANGE BETWEEN 5000 PRECEDING AND 5000 FOLLOWING)
"""


def q_pipe_syntax(spark: SparkSession, sf: str) -> DataFrame:
    """SQL pipe syntax (Spark 4, GoogleSQL-style |> operators): the
    linear dataflow reading of a filter→aggregate→filter→sort pipeline.
    Parses to the IDENTICAL Catalyst plan as nested SQL — pure surface
    syntax, zero execution difference (the oracle is the nested form)."""
    table(spark, sf, "orders").createOrReplaceTempView("orders_pipe")
    return spark.sql(
        """
        FROM orders_pipe
        |> WHERE o_orderstatus = 'F'
        |> AGGREGATE COUNT(*) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
           GROUP BY o_orderpriority
        |> WHERE n > 10
        """
    )


SQL_PIPE_SYNTAX = """
SELECT o_orderpriority, COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders
WHERE o_orderstatus = 'F'
GROUP BY o_orderpriority
HAVING COUNT(*) > 10
"""


def q_histogram_bins(spark: SparkSession, sf: str) -> DataFrame:
    """Equi-width histogram of order totals (10k-wide bins). Binning is a
    projection, so the aggregate shuffles only (bin → count) pairs —
    the classic map-side-combine shape that stays O(bins) at any SF."""
    o = table(spark, sf, "orders")
    bin_col = F.floor(F.col("o_totalprice") / F.lit(10000)).cast("long")
    return o.groupBy(bin_col.alias("bin")).agg(
        F.count("*").alias("n_orders"),
        F.round(F.min("o_totalprice"), 6).alias("lo"),
        F.round(F.max("o_totalprice"), 6).alias("hi"),
    )


SQL_HISTOGRAM_BINS = """
SELECT CAST(FLOOR(o_totalprice / 10000) AS BIGINT) AS bin,
  COUNT(*) AS n_orders,
  ROUND(MIN(o_totalprice), 6) AS lo,
  ROUND(MAX(o_totalprice), 6) AS hi
FROM orders GROUP BY 1
"""


# --- sorts / limits / set ops / distinct ------------------------------------


def q_topk_orders(spark: SparkSession, sf: str) -> DataFrame:
    """Global top-10 — Spark plans TakeOrderedAndProject: each partition
    keeps its local top-10, driver merges. O(n) not O(n log n); never a
    full sort at 100 TB."""
    return (
        table(spark, sf, "orders")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


SQL_TOPK_ORDERS = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
"""


def q_union_all(spark: SparkSession, sf: str) -> DataFrame:
    cust = table(spark, sf, "customer")
    a = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = cust.filter(F.col("c_acctbal") > 8000).select("c_custkey")
    return a.unionAll(b)


SQL_UNION_ALL = """
SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
UNION ALL
SELECT c_custkey FROM customer WHERE c_acctbal > 8000
"""


def q_intersect(spark: SparkSession, sf: str) -> DataFrame:
    cust = table(spark, sf, "customer")
    a = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = cust.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    return a.intersect(b)


SQL_INTERSECT = """
SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
INTERSECT
SELECT c_custkey FROM customer WHERE c_acctbal > 5000
"""


def q_except(spark: SparkSession, sf: str) -> DataFrame:
    cust = table(spark, sf, "customer")
    a = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = cust.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    return a.subtract(b)  # distinct EXCEPT semantics, matching SQL EXCEPT


SQL_EXCEPT = """
SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
EXCEPT
SELECT c_custkey FROM customer WHERE c_acctbal > 5000
"""


def q_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """DISTINCT = hash aggregation on all columns (partial+final)."""
    return table(spark, sf, "orders").select("o_orderstatus", "o_orderpriority").distinct()


SQL_DISTINCT = "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders"


# --- scalar functions --------------------------------------------------------


def q_scalar_functions(spark: SparkSession, sf: str) -> DataFrame:
    """Scalar surface (SURVEY §2.8): string/math built-ins, all JVM-side
    codegen — the engine-native generalization of the reference's
    isalpha/toupper/strstr/strlen set."""
    p = table(spark, sf, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_u"),
        F.lower("p_type").alias("type_l"),
        F.length("p_name").alias("name_len"),
        F.substring("p_type", 1, 5).alias("type5"),
        F.concat_ws("_", "p_brand", F.col("p_size").cast("string")).alias("brand_size"),
        F.floor("p_retailprice").cast("double").alias("floor_price"),
        F.ceil("p_retailprice").cast("double").alias("ceil_price"),
        F.abs(F.col("p_size") - F.lit(25)).alias("size_dev"),
    )


SQL_SCALAR_FUNCTIONS = """
SELECT p_partkey,
  UPPER(p_brand) AS brand_u,
  LOWER(p_type) AS type_l,
  CAST(LENGTH(p_name) AS INTEGER) AS name_len,
  SUBSTRING(p_type, 1, 5) AS type5,
  CONCAT(p_brand, '_', CAST(p_size AS VARCHAR)) AS brand_size,
  CAST(FLOOR(p_retailprice) AS DOUBLE) AS floor_price,
  CAST(CEIL(p_retailprice) AS DOUBLE) AS ceil_price,
  ABS(p_size - 25) AS size_dev
FROM part
"""


def q_datetime_functions(spark: SparkSession, sf: str) -> DataFrame:
    """Date/time scalar surface over order dates."""
    o = table(spark, sf, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("d"),
        F.quarter("o_orderdate").alias("q"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
    )


SQL_DATETIME_FUNCTIONS = """
SELECT o_orderkey,
  CAST(year(o_orderdate) AS INTEGER) AS y,
  CAST(month(o_orderdate) AS INTEGER) AS m,
  CAST(day(o_orderdate) AS INTEGER) AS d,
  CAST(quarter(o_orderdate) AS INTEGER) AS q,
  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start
FROM orders
"""


def q_revenue_seasonality(spark: SparkSession, sf: str) -> DataFrame:
    """Month-over-month revenue growth: the reporting time-series shape
    (aggregate to a coarse grain, then LAG over the aggregated rows).
    The unpartitioned window is safe BECAUSE it runs on the ~83 monthly
    rows after aggregation, never on the fact table — the one case
    where a global window is the right plan at any scale."""
    li = table(spark, sf, "lineitem")
    monthly = li.groupBy(
        F.date_format("l_shipdate", "yyyy-MM").alias("month")
    ).agg(F.sum(revenue_expr()).cast("double").alias("revenue"))
    w = Window.orderBy("month")
    prev = F.lag("revenue").over(w)
    return monthly.select(
        "month",
        "revenue",
        prev.alias("prev_revenue"),
        F.round(F.lit(100.0) * (F.col("revenue") - prev) / prev, 6).alias("mom_pct"),
    ).orderBy("month")


SQL_REVENUE_SEASONALITY = f"""
WITH m AS (
  SELECT strftime(l_shipdate, '%Y-%m') AS month,
    CAST(SUM({SQL_REVENUE}) AS DOUBLE) AS revenue
  FROM lineitem GROUP BY 1
)
SELECT month, revenue,
  lag(revenue) OVER (ORDER BY month) AS prev_revenue,
  ROUND(100.0 * (revenue - lag(revenue) OVER (ORDER BY month))
        / lag(revenue) OVER (ORDER BY month), 6) AS mom_pct
FROM m ORDER BY month
"""


QUERIES: dict[str, Query] = {
    "filter_project": Query(q_filter_project, SQL_FILTER_PROJECT),
    "revenue_seasonality": Query(q_revenue_seasonality, SQL_REVENUE_SEASONALITY),
    "pricing_summary": Query(q_pricing_summary, SQL_PRICING_SUMMARY),
    "agg_distinct": Query(q_agg_distinct, SQL_AGG_DISTINCT),
    "rollup": Query(q_rollup, SQL_ROLLUP),
    "cube": Query(q_cube, SQL_CUBE),
    "pivot": Query(q_pivot, SQL_PIVOT),
    "join_shipping_priority": Query(q_join_shipping_priority, SQL_JOIN_SHIPPING_PRIORITY),
    "join_region_revenue": Query(q_join_region_revenue, SQL_JOIN_REGION_REVENUE),
    "join_nation_volume": Query(q_join_nation_volume, SQL_JOIN_NATION_VOLUME),
    "join_returned_customers": Query(
        q_join_returned_customers, SQL_JOIN_RETURNED_CUSTOMERS
    ),
    "market_basket": Query(q_market_basket, SQL_MARKET_BASKET),
    "approx_distinct_rollup": Query(q_approx_distinct_rollup, None),
    "forecast_revenue": Query(q_forecast_revenue, SQL_FORECAST_REVENUE),
    "promo_revenue_share": Query(q_promo_revenue_share, SQL_PROMO_REVENUE_SHARE),
    "broadcast_join": Query(q_broadcast_join, SQL_BROADCAST_JOIN),
    "semi_join": Query(q_semi_join, SQL_SEMI_JOIN),
    "anti_join": Query(q_anti_join, SQL_ANTI_JOIN),
    "outer_join": Query(q_outer_join, SQL_OUTER_JOIN),
    "window_topk_per_group": Query(q_window_topk_per_group, SQL_WINDOW_TOPK_PER_GROUP),
    "window_running_sum": Query(q_window_running_sum, SQL_WINDOW_RUNNING_SUM),
    "window_lag": Query(q_window_lag, SQL_WINDOW_LAG),
    "window_frames": Query(q_window_frames, SQL_WINDOW_FRAMES),
    "topk_orders": Query(q_topk_orders, SQL_TOPK_ORDERS),
    "union_all": Query(q_union_all, SQL_UNION_ALL),
    "intersect": Query(q_intersect, SQL_INTERSECT),
    "except_": Query(q_except, SQL_EXCEPT),
    "distinct": Query(q_distinct, SQL_DISTINCT),
    "histogram_bins": Query(q_histogram_bins, SQL_HISTOGRAM_BINS),
    "custdist": Query(q_custdist, SQL_CUSTDIST),
    "pipe_syntax": Query(q_pipe_syntax, SQL_PIPE_SYNTAX),
    "window_range_frame": Query(q_window_range_frame, SQL_WINDOW_RANGE_FRAME),
    "scalar_functions": Query(q_scalar_functions, SQL_SCALAR_FUNCTIONS),
    "datetime_functions": Query(q_datetime_functions, SQL_DATETIME_FUNCTIONS),
}
