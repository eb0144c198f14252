"""TPC-H decision-support shapes, round 3 (EXT — the reference has no
SQL surface; these complete the classic plan-shape inventory that
``tpch2.py`` started: EXISTS-with-correlated-predicate (Q4), two-level
share-of-market CASE aggregation (Q8), multi-dim profit rollup (Q9),
global-scalar-threshold HAVING (Q11), argmax-by-scalar-subquery (Q15),
distinct-count variety rollup (Q16), and fraction-of-group semi join
(Q20).

Adapted to the driver's schema: no partsupp table and no
commitdate/receiptdate/shipmode columns, so supply relationships are
derived from lineitem's (partkey, suppkey) pairs, supply cost from
``p_retailprice``, and Q4's lateness predicate from
``l_shipdate > o_orderdate``. The PLAN shapes — what the engine is
graded on — are unchanged.

Exact-comparison discipline: every threshold compare that decides row
membership is done in DECIMAL with integer multipliers (``2*q > total``
instead of ``q > 0.5*total``), so Spark and DuckDB agree bit-for-bit at
the boundary; doubles appear only in rounded output columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import table
from .base import SQL_REVENUE, Query, dec, revenue_expr


def q_order_priority_check(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q4 shape: order counts per priority for one quarter, kept
    only when EXISTS a line item shipped after the order date (lateness
    stand-in for commit<receipt). Catalyst decorrelates the EXISTS into
    a LEFT SEMI join on orderkey with the cross-table predicate pushed
    into the join condition — one shuffle, no per-row subquery; the
    5-row priority agg collapses map-side."""
    orders = table(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    )
    li = table(spark, sf, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


SQL_ORDER_PRIORITY_CHECK = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= '1996-01-01' AND o.o_orderdate < '1996-04-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
  )
GROUP BY o_orderpriority
"""


def q_market_share(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q8 shape: NATION_5's share of ECONOMY-part revenue sold to
    ASIA customers, by order year. The market rows come from
    lineitem⋈orders (the one big orderkey shuffle); part/supplier/
    customer/nation/region all resolve as broadcasts. The share is a
    conditional-sum over the same aggregate pass (no second scan), the
    textbook CASE-inside-agg rewrite of Q8's subquery formulation."""
    part = (
        table(spark, sf, "part")
        .filter(F.col("p_type") == "ECONOMY")
        .select("p_partkey")
    )
    nation = table(spark, sf, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    region = (
        table(spark, sf, "region")
        .filter(F.col("r_name") == "ASIA")
        .select("r_regionkey")
    )
    supp = (
        table(spark, sf, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        table(spark, sf, "customer")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    li = table(spark, sf, "lineitem").join(
        F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")
    )
    orders = table(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= "1995-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    rev = revenue_expr()
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_5", rev).otherwise(
                        F.lit(0).cast("decimal(18,2)")
                    )
                ).cast("double")
                / F.sum(rev).cast("double"),
                6,
            ).alias("mkt_share")
        )
    )


SQL_MARKET_SHARE = f"""
SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
  ROUND(
    CAST(SUM(CASE WHEN n_s.n_name = 'NATION_5' THEN {SQL_REVENUE}
             ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
    / CAST(SUM({SQL_REVENUE}) AS DOUBLE), 6) AS mkt_share
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey AND p.p_type = 'ECONOMY'
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n_c ON c.c_nationkey = n_c.n_nationkey
JOIN region r ON n_c.n_regionkey = r.r_regionkey AND r.r_name = 'ASIA'
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n_s ON s.s_nationkey = n_s.n_nationkey
WHERE o.o_orderdate >= '1995-01-01' AND o.o_orderdate < '1997-01-01'
GROUP BY 1
"""


def q_nation_profit(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation × order year for PROMO
    parts, profit = revenue − supply cost, with supply cost derived as
    60% of retail price × quantity (no partsupp table). All three
    decimal factors stay exact until the final rounded double. One
    orderkey shuffle; part/supplier/nation broadcast."""
    part = (
        table(spark, sf, "part")
        .filter(F.col("p_type") == "PROMO")
        .select("p_partkey", "p_retailprice")
    )
    nation = table(spark, sf, "nation").select("n_nationkey", "n_name")
    supp = (
        table(spark, sf, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    li = table(spark, sf, "lineitem").join(
        F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")
    )
    orders = table(spark, sf, "orders").select("o_orderkey", "o_orderdate")
    amount = revenue_expr() - (
        dec("p_retailprice")
        * dec("l_quantity")
        * F.lit("0.6").cast("decimal(3,1)")
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        # round the EXACT decimal sum, then cast: rounding the double
        # instead hits half-cent ties differently per engine (observed
        # at sf0.1: one group off by $0.01)
        .agg(F.round(F.sum(amount), 2).cast("double").alias("profit"))
    )


SQL_NATION_PROFIT = f"""
SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
  CAST(ROUND(SUM(
    {SQL_REVENUE}
    - CAST(p.p_retailprice AS DECIMAL(18,2)) * CAST(l.l_quantity AS DECIMAL(18,2))
      * CAST('0.6' AS DECIMAL(3,1))
  ), 2) AS DOUBLE) AS profit
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey AND p.p_type = 'PROMO'
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
GROUP BY 1, 2
"""


def q_top_supplier_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) with maximum revenue over one
    quarter — aggregate, then argmax via a broadcast single-row MAX
    joined back (the view + scalar-subquery formulation, decorrelated).
    The equality compare runs on the EXACT decimal sum; the output
    carries the rounded double."""
    li = table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    rev = (
        li.groupBy("l_suppkey")
        .agg(F.sum(revenue_expr()).alias("total_rev"))
    )
    top = rev.agg(F.max("total_rev").alias("max_rev"))
    supp = table(spark, sf, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(top), F.col("total_rev") == F.col("max_rev"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.round("total_rev", 2).cast("double").alias("total_revenue"),
        )
    )


SQL_TOP_SUPPLIER_REVENUE = f"""
WITH rev AS (
  SELECT l_suppkey, SUM({SQL_REVENUE}) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, CAST(ROUND(r.total_rev, 2) AS DOUBLE) AS total_revenue
FROM rev r JOIN supplier s ON r.l_suppkey = s.s_suppkey
WHERE r.total_rev = (SELECT MAX(total_rev) FROM rev)
"""


def q_important_part_value(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose lineitem revenue exceeds 1.5× the
    average part's — per-key aggregate filtered against a global scalar
    aggregate. TPC-H's fixed fraction (0.0001/SF) must be re-tuned per
    scale; comparing against the MEAN (``2·n·v > 3·total``) is
    scale-invariant and keeps the same plan shape. The compare is
    integer-multiplied decimal (exact boundary, both engines agree);
    the global (total, n) is one broadcast row; nothing rescans the
    fact table."""
    li = table(spark, sf, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        F.sum(revenue_expr()).alias("part_value")
    )
    total = per_part.agg(
        F.sum("part_value").alias("total_value"),
        F.count(F.lit(1)).alias("n_parts"),
    )
    return (
        per_part.join(F.broadcast(total))
        .filter(
            F.col("part_value") * F.lit(2).cast("decimal(18,0)") * F.col("n_parts")
            > F.col("total_value") * F.lit(3).cast("decimal(18,0)")
        )
        .select(
            "l_partkey",
            F.round("part_value", 2).cast("double").alias("part_value"),
        )
    )


SQL_IMPORTANT_PART_VALUE = f"""
WITH per_part AS (
  SELECT l_partkey, SUM({SQL_REVENUE}) AS part_value FROM lineitem GROUP BY l_partkey
),
tot AS (SELECT SUM(part_value) AS total_value, COUNT(*) AS n_parts FROM per_part)
SELECT l_partkey, CAST(ROUND(part_value, 2) AS DOUBLE) AS part_value
FROM per_part, tot
WHERE part_value * CAST(2 AS DECIMAL(18,0)) * n_parts > total_value * CAST(3 AS DECIMAL(18,0))
"""


def q_part_supplier_variety(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q16 shape: how many distinct suppliers serve each
    (brand, type, size) bucket — supply relationships derived from
    lineitem's observed (partkey, suppkey) pairs (no partsupp table).
    The pair-distinct happens BEFORE the dimension join (smallest
    possible shuffle payload: two longs); part is broadcast."""
    pairs = (
        table(spark, sf, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    part = (
        table(spark, sf, "part")
        .filter((F.col("p_brand") != "Brand#5") & (F.col("p_size") <= 6))
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    return (
        pairs.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


SQL_PART_SUPPLIER_VARIETY = """
SELECT p.p_brand, p.p_type, p.p_size,
       COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_brand <> 'Brand#5' AND p.p_size <= 6
GROUP BY 1, 2, 3
"""


def q_dominant_suppliers(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who shipped MORE THAN HALF of some
    STANDARD part's 1996 volume — fraction-of-group membership feeding
    a semi join. Group totals come from a rollup of the same
    (part, supplier) aggregate (no second fact scan); the comparison is
    ``2·q > total`` in decimal (exact). The qualifying supplier set is
    tiny and semi-joins the supplier dim broadcast-side."""
    part = (
        table(spark, sf, "part")
        .filter(F.col("p_type") == "STANDARD")
        .select("p_partkey")
    )
    li = (
        table(spark, sf, "lineitem")
        .filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    )
    # Round-12 optimization (guide §2.4): the (part, supplier) cells
    # feed the totals rollup AND the dominance join-back — materialize
    # once instead of replaying the filtered fact scan per consumer
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(dec("l_quantity")).alias("q")
    ).localCheckpoint(eager=True)
    totals = ps.groupBy("l_partkey").agg(F.sum("q").alias("part_total"))
    dominant = (
        ps.join(F.broadcast(totals), "l_partkey")
        .filter(F.col("q") * F.lit(2).cast("decimal(18,0)") > F.col("part_total"))
        .select("l_suppkey")
        .distinct()
    )
    supp = table(spark, sf, "supplier").select("s_suppkey", "s_name", "s_acctbal")
    return supp.join(
        dominant, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi"
    ).select("s_suppkey", "s_name", F.round(dec("s_acctbal").cast("double"), 2).alias("s_acctbal"))


SQL_DOMINANT_SUPPLIERS = """
WITH ps AS (
  SELECT l.l_partkey, l.l_suppkey, SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS q
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey AND p.p_type = 'STANDARD'
  WHERE l.l_shipdate >= '1996-01-01' AND l.l_shipdate < '1997-01-01'
  GROUP BY 1, 2
),
totals AS (SELECT l_partkey, SUM(q) AS part_total FROM ps GROUP BY 1),
dom AS (
  SELECT DISTINCT ps.l_suppkey
  FROM ps JOIN totals t ON ps.l_partkey = t.l_partkey
  WHERE ps.q * CAST(2 AS DECIMAL(18,0)) > t.part_total
)
SELECT s.s_suppkey, s.s_name,
       ROUND(CAST(CAST(s.s_acctbal AS DECIMAL(18,2)) AS DOUBLE), 2) AS s_acctbal
FROM supplier s WHERE s.s_suppkey IN (SELECT l_suppkey FROM dom)
"""


def q_window_rank_functions(spark: SparkSession, sf: str) -> DataFrame:
    """The full ranking-function family in one partitioned window —
    rank, dense_rank, percent_rank, cume_dist, ntile(4) over customers
    by balance within market segment. One exchange on the partition
    key; every function shares the same sort (single WindowExec)."""
    from pyspark.sql import Window

    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return table(spark, sf, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.round(F.percent_rank().over(w), 9).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 9).alias("cume"),
        F.ntile(4).over(w).alias("quartile"),
    )


SQL_WINDOW_RANK_FUNCTIONS = """
SELECT c_custkey, c_mktsegment,
  CAST(RANK() OVER w AS INTEGER) AS rnk,
  CAST(DENSE_RANK() OVER w AS INTEGER) AS drnk,
  ROUND(PERCENT_RANK() OVER w, 9) AS pct_rank,
  ROUND(CUME_DIST() OVER w, 9) AS cume,
  CAST(NTILE(4) OVER w AS INTEGER) AS quartile
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC)
"""


QUERIES: dict[str, Query] = {
    "order_priority_check": Query(q_order_priority_check, SQL_ORDER_PRIORITY_CHECK),
    "market_share": Query(q_market_share, SQL_MARKET_SHARE),
    "nation_profit": Query(q_nation_profit, SQL_NATION_PROFIT),
    "top_supplier_revenue": Query(q_top_supplier_revenue, SQL_TOP_SUPPLIER_REVENUE),
    "important_part_value": Query(q_important_part_value, SQL_IMPORTANT_PART_VALUE),
    "part_supplier_variety": Query(q_part_supplier_variety, SQL_PART_SUPPLIER_VARIETY),
    "dominant_suppliers": Query(q_dominant_suppliers, SQL_DOMINANT_SUPPLIERS),
    "window_rank_functions": Query(q_window_rank_functions, SQL_WINDOW_RANK_FUNCTIONS),
}
