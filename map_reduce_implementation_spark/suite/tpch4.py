"""TPC-H decision-support shapes, round 4 (EXT) — the last two classic
plan shapes absent from the registry: min-cost-supplier decorrelated
argmin (Q2) and dual conditional counts over a join (Q12). Q6/Q14
already live in ``relational.py`` (forecast_revenue,
promo_revenue_share); with Q2 and Q12, every one of the 22 TPC-H
query SHAPES has a registry twin adapted to the driver's schema.

Adapted to the driver's schema exactly like ``tpch3.py``: no partsupp
table and no shipmode/commitdate/receiptdate columns, so supply cost
derives from lineitem prices, Q12's shipmode becomes ``l_linestatus``,
and its lateness predicate is ``l_shipdate > o_orderdate``. Plan
shapes — what the engine is graded on — are unchanged.

Exact-comparison discipline (see tpch3.py): membership compares in
DECIMAL; doubles only in rounded output columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import table
from .base import Query, dec


def q_min_cost_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q2 shape: for each STANDARD part, the EUROPE supplier(s)
    achieving the minimum observed supply cost, ordered by account
    balance. Q2's correlated scalar subquery (min cost over the
    region's suppliers for THIS part) is expressed the way Catalyst
    decorrelates it anyway: aggregate per-(part, supplier) costs, take
    the per-part min, join back on equality — two uniform partkey
    shuffles instead of a per-row subquery. Supplier→nation→region
    resolve as broadcasts; supply cost = min lineitem price for the
    (part, supplier) pair (no partsupp table, tpch3 convention)."""
    li = table(spark, sf, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    part = (
        table(spark, sf, "part")
        .filter(F.col("p_type") == "STANDARD")
        .select("p_partkey", "p_name")
    )
    nation = table(spark, sf, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    region = (
        table(spark, sf, "region")
        .filter(F.col("r_name") == "EUROPE")
        .select("r_regionkey")
    )
    supp = (
        table(spark, sf, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    # no hard broadcast hints on part/supplier: both scale linearly with
    # SF (200k·SF / 10k·SF rows), and F.broadcast is honored regardless
    # of size — AQE still picks broadcast at runtime while they fit;
    # only the fixed-size nation/region dims are hinted above
    # Round-12 optimization (guide §2.4): the (part, supplier) cost
    # cells feed the per-part min AND the equality join-back —
    # materialize once instead of replaying the two fact joins per
    # consumer (20 parquet scans → 10 in the captured plan)
    cost = (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal", "n_name")
        .agg(F.min(dec("l_extendedprice")).alias("cost_dec"))
        .localCheckpoint(eager=True)
    )
    best = cost.groupBy(F.col("p_partkey").alias("mk")).agg(
        F.min("cost_dec").alias("min_cost")
    )
    return (
        cost.join(
            best,
            (F.col("p_partkey") == F.col("mk"))
            & (F.col("cost_dec") == F.col("min_cost")),
        )
        .select(
            "s_name",
            F.col("n_name").alias("nation"),
            "p_partkey",
            "p_name",
            F.round(F.col("cost_dec"), 2).cast("double").alias("supply_cost"),
            F.col("s_acctbal").cast("double").alias("s_acctbal"),
        )
        .orderBy(F.desc("s_acctbal"), F.asc("s_name"), F.asc("p_partkey"))
        .limit(100)
    )


SQL_MIN_COST_SUPPLIER = """
WITH supp AS (
  SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
  FROM supplier s
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey AND r.r_name = 'EUROPE'
),
cost AS (
  SELECT p.p_partkey, p.p_name, s.s_suppkey, s.s_name, s.s_acctbal, s.n_name,
    MIN(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS cost_dec
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey AND p.p_type = 'STANDARD'
  JOIN supp s ON l.l_suppkey = s.s_suppkey
  GROUP BY ALL
),
best AS (
  SELECT p_partkey AS mk, MIN(cost_dec) AS min_cost FROM cost GROUP BY 1
)
SELECT c.s_name, c.n_name AS nation, c.p_partkey, c.p_name,
  CAST(ROUND(c.cost_dec, 2) AS DOUBLE) AS supply_cost,
  CAST(c.s_acctbal AS DOUBLE) AS s_acctbal
FROM cost c JOIN best b ON c.p_partkey = b.mk AND c.cost_dec = b.min_cost
ORDER BY s_acctbal DESC, s_name ASC, p_partkey ASC
LIMIT 100
"""


def q_late_shipment_priority(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q12 shape: dual conditional counts over the orders⋈lineitem
    join — per line status (shipmode stand-in), how many LATE-shipped
    lines belong to high- vs low-priority orders in one year. One
    orderkey-keyed shuffle join (both sides uniform), the lateness
    predicate evaluated in the join output, and the CASE counts
    collapse map-side to a 2-row result."""
    orders = table(spark, sf, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


SQL_LATE_SHIPMENT_PRIORITY = """
SELECT l.l_linestatus,
  CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
    AS BIGINT) AS high_line_count,
  CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END)
    AS BIGINT) AS low_line_count
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= '1996-01-01' AND l.l_shipdate < '1997-01-01'
  AND l.l_shipdate > o.o_orderdate
GROUP BY l.l_linestatus
"""


QUERIES: dict[str, Query] = {
    "min_cost_supplier": Query(q_min_cost_supplier, SQL_MIN_COST_SUPPLIER),
    "late_shipment_priority": Query(
        q_late_shipment_priority, SQL_LATE_SHIPMENT_PRIORITY
    ),
}
