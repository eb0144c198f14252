"""Deep TPC-H decision-support shapes (EXT — the reference has no SQL
surface at all; these widen §2.3/§2.4/§2.7 with the classic correlated
and disjunctive patterns the easy queries don't exercise).

Adapted to the driver's schema: lineitem carries no
commitdate/receiptdate/shipmode and there is no partsupp table, so the
Q17/Q18/Q19/Q21/Q22 *plan shapes* are kept (correlated aggregate
subquery, HAVING-driven semi join, OR-of-ANDs pushdown, multi-EXISTS
decorrelation, scalar subquery + anti join) with predicates rebound to
the available columns.

Scale notes are per-query. The common theme: each query has exactly one
unavoidable fact-table shuffle; every dimension/derived-cap side is
broadcast; correlated subqueries are left to Catalyst, which decorrelates
them into semi/anti joins rather than per-row execution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import table
from .base import SQL_REVENUE, Query, dec, revenue_expr


def q_small_quantity_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q17 shape: revenue lost to small orders — the correlated
    aggregate subquery (l_quantity < 0.2 * per-part average).

    Plan: the brand filter prunes part FIRST (broadcast), so the
    per-part cap aggregation runs over only the ~1/25 of lineitem that
    survives the broadcast semi-ish join; the caps table (one row per
    surviving part) is broadcast back. At 100 TB the fact table is
    scanned once and never wide-shuffled — both joins are broadcasts
    and the final agg is a single-row global.

    The cap is computed as 0.2 * (decimal-sum / count) so Spark and the
    oracle agree bit-for-bit (double SUM order-dependence would make
    the `<` boundary nondeterministic).
    """
    part = (
        table(spark, sf, "part")
        .filter(F.col("p_brand") == "Brand#23")
        .select("p_partkey")
    )
    li = (
        table(spark, sf, "lineitem")
        .select("l_partkey", "l_quantity", "l_extendedprice")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    )
    caps = li.groupBy("l_partkey").agg(
        (
            F.lit(0.2)
            * (F.sum(dec("l_quantity")).cast("double") / F.count(F.lit(1)))
        ).alias("qty_cap")
    )
    return (
        li.join(F.broadcast(caps), "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_cap"))
        .agg(
            F.count(F.lit(1)).alias("n_small_orders"),
            (F.sum(dec("l_extendedprice")).cast("double") / F.lit(7.0)).alias(
                "avg_yearly"
            ),
        )
    )


SQL_SMALL_QUANTITY_REVENUE = """
WITH li AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#23'
), caps AS (
  SELECT l_partkey,
         0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)) AS qty_cap
  FROM li GROUP BY l_partkey
)
SELECT COUNT(*) AS n_small_orders,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly
FROM li JOIN caps USING (l_partkey)
WHERE l_quantity < qty_cap
"""


def q_large_volume_customers(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q18 shape: customers who placed very large orders — the
    HAVING-filtered aggregate feeding a join chain.

    Plan: one orderkey-keyed shuffle aggregates lineitem quantities
    (partial map-side combine first); the HAVING cut drops ~98% of
    orders BEFORE the joins, so the orders/customer joins see only the
    survivors. Final top-100 is TakeOrderedAndProject — no global sort.
    At 100 TB: lineitem shuffles once on its natural join key; the
    having-reduced side is small enough that AQE converts the
    orders join to broadcast at runtime.
    """
    big = (
        table(spark, sf, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).cast("double").alias("sum_qty"))
        .filter(F.col("sum_qty") > 250)
    )
    orders = table(spark, sf, "orders")
    cust = table(spark, sf, "customer").select("c_custkey", "c_name")
    return (
        big.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty"
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


SQL_LARGE_VOLUME_CUSTOMERS = """
SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, sum_qty
FROM (
  SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 250
) big
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""


def q_disjunctive_filter(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs across both join sides — the
    disjunction-pushdown stress test.

    Catalyst extracts the common join key and derives the partial
    disjunction `p_brand IN (...)`-style constraints onto the part
    scan, so the broadcast side is pre-pruned even though the full
    predicate spans both tables. At 100 TB the win is that part rows
    failing ALL three brand arms never enter the hash table.
    """
    part = table(spark, sf, "part").select("p_partkey", "p_brand", "p_size")
    li = table(spark, sf, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    arm = lambda brand, size_hi, q_lo, q_hi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("p_size").between(1, size_hi)
        & F.col("l_quantity").between(q_lo, q_hi)
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(
            arm("Brand#12", 5, 1, 11) | arm("Brand#23", 10, 10, 20) | arm("Brand#34", 15, 20, 30)
        )
        .agg(
            F.count(F.lit(1)).alias("n_matched"),
            F.sum(revenue_expr()).cast("double").alias("revenue"),
        )
    )


SQL_DISJUNCTIVE_FILTER = f"""
SELECT COUNT(*) AS n_matched,
       CAST(SUM({SQL_REVENUE}) AS DOUBLE) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
"""


def q_dormant_customers(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q22 shape: high-balance customers with no recent orders —
    scalar aggregate subquery + anti join + dimension rollup.

    (Rebound: the classic phone-prefix predicate has no column here, so
    "dormant" = no order since 2000-01-01; the plan shape — global
    scalar broadcast, left-anti against a date-pruned orders scan,
    small-group agg — is identical.)

    Plan: the average-balance scalar is one tiny job broadcast as a
    literal; the anti join's right side is date-pruned BEFORE the
    shuffle (only ~20% of orders survive); the final group-by runs on
    25 nations. At 100 TB the orders scan reads only the
    o_orderdate >= cutoff row groups (min/max pruning).
    """
    cust = table(spark, sf, "customer")
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0)
        .agg(
            (F.sum(dec("c_acctbal")).cast("double") / F.count(F.lit(1))).alias(
                "avg_bal"
            )
        )
    )
    recent = (
        table(spark, sf, "orders")
        .filter(F.col("o_orderdate") >= "2000-01-01")
        .select("o_custkey")
    )
    nation = table(spark, sf, "nation").select("n_nationkey", "n_name")
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
    )


SQL_DORMANT_CUSTOMERS = """
SELECT n_name, COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
                   FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY n_name
"""


def q_waiting_suppliers(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers solely responsible for late
    multi-supplier orders — the EXISTS + NOT EXISTS double
    decorrelation, the hardest classic subquery pattern.

    (Rebound: "late" = shipped >60 days after the order date; nation
    pinned to one value like the original's SAUDI ARABIA.)

    Round-12 optimization (guide §2.3/§2.4): the SQL formulation left
    Catalyst to decorrelate the EXISTS into a left-semi and the NOT
    EXISTS into a left-anti join — THREE full passes over lineitem,
    each shuffled at line granularity. Both subqueries only ask
    per-order, per-supplier facts, so one (orderkey, suppkey) aggregate
    over the lineitem⋈orders join answers everything:

    - ``EXISTS l2 (l2.ok = l1.ok AND l2.sk <> l1.sk)`` ⟺ the order has
      ≥ 2 distinct suppliers ⟺ ``nsupp >= 2`` (l1's supplier is on the
      order, so "another" exists iff the distinct count exceeds 1);
    - ``NOT EXISTS l3 (late, l3.sk <> l1.sk)`` ⟺ the set of distinct
      LATE suppliers on the order is exactly {l1.sk} ⟺ ``nlate == 1``
      (l1 itself is late, so its supplier is always in that set);
    - ``COUNT(*)`` per supplier = the number of late l1 LINES; when
      ``nlate == 1`` every late line in the order belongs to that ONE
      supplier, so the order-level row itself can carry the culprit
      (``max(late suppkey)`` — the only non-null) and his line count.

    Every l2/l3 row shares l1's orderkey, which survives the l1⋈orders
    join, so computing the counts from the joined frame (instead of
    raw lineitem) sees the identical multiset. Plan: ONE lineitem scan,
    one line-level orderkey join, a map-side-combined (orderkey,
    suppkey) cell aggregate, a second cell→order aggregate that already
    emits (culprit suppkey, late line count) — no window sort, no join
    back — then the supplier/nation joins run on qualifying ORDERS only
    (AQE broadcasts them locally; at 100 TB supplier is too big for a
    hint, so none is forced). Before: 3 lineitem scans / 10 joins;
    after: 1 lineitem scan / 3 joins. Measured best-of-3 at sf0.1:
    1.77 s (SQL form) → 1.39 s; in-session result identity checked and
    the unchanged SQL twin verifies cell-exactness vs the oracle.
    """
    li = table(spark, sf, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = table(spark, sf, "orders").select("o_orderkey", "o_orderdate")
    is_late = (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")
    ).cast("long")
    j = li.join(o, F.col("l_orderkey") == F.col("o_orderkey")).select(
        "l_orderkey", "l_suppkey", is_late.alias("is_late")
    )
    cells = j.groupBy("l_orderkey", "l_suppkey").agg(
        F.sum("is_late").alias("late_lines")
    )
    late = F.col("late_lines") > 0
    stats = cells.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("nsupp"),
        F.count(F.when(late, 1)).alias("nlate"),
        F.sum(F.when(late, F.col("late_lines"))).alias("tot_late"),
        F.max(F.when(late, F.col("l_suppkey"))).alias("late_sk"),
    )
    qual = stats.filter((F.col("nsupp") >= 2) & (F.col("nlate") == 1))
    sn = (
        table(spark, sf, "supplier")
        .select("s_suppkey", "s_name", "s_nationkey")
        .join(
            F.broadcast(
                table(spark, sf, "nation")
                .filter(F.col("n_name") == "NATION_3")
                .select("n_nationkey")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name")
    )
    return (
        qual.join(sn, F.col("late_sk") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.sum("tot_late").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


SQL_WAITING_SUPPLIERS = """
SELECT s_name, COUNT(*) AS numwait
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders o ON o_orderkey = l1.l_orderkey
WHERE n_name = 'NATION_3'
  AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  )
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
"""


QUERIES: dict[str, Query] = {
    "small_quantity_revenue": Query(q_small_quantity_revenue, SQL_SMALL_QUANTITY_REVENUE),
    "large_volume_customers": Query(q_large_volume_customers, SQL_LARGE_VOLUME_CUSTOMERS),
    "disjunctive_filter": Query(q_disjunctive_filter, SQL_DISJUNCTIVE_FILTER),
    "dormant_customers": Query(q_dormant_customers, SQL_DORMANT_CUSTOMERS),
    "waiting_suppliers": Query(q_waiting_suppliers, SQL_WAITING_SUPPLIERS),
}
