"""Warehouse data-quality surface, round 4 (EXT): referential-integrity
audit and ANALYZE-style column profiling.

Both are the operational queries every warehouse runs between loads —
and at 100 TB they are also the queries that find the broken partition
before a 6-hour join does:

- ``integrity_audit`` — orphan counts for every foreign-key edge of
  the star schema (child rows whose key misses the parent). Each edge
  is ONE left join against deduped parent keys (row count and orphan
  count from the same aggregate), parent broadcast only where its
  cardinality is SF-independent; the fact-side scans prune to the key
  column, so the whole audit is one column scan per edge.
- ``dataset_profile`` — per-column null count, exact distinct count,
  and numeric min/max over lineitem (the CBO-statistics shape of
  ANALYZE TABLE). One scan; each column's metrics aggregate in the
  same pass. Only numeric/bounded metrics are emitted (min/max as
  rounded doubles) — string-formatted extremes would hash-differ
  between engines on timestamp rendering.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import table
from .base import Query

# (edge name, child table, child key, parent table, parent key,
#  parent is dim-sized → broadcast). "Dim-sized" means FIXED cardinality
# regardless of scale factor (nation=25, region=5); part/supplier/
# customer/orders all grow linearly with SF, and F.broadcast is a hard
# hint Catalyst honors regardless of size — force-broadcasting an
# SF-scaling table would OOM the audit at exactly the scale it exists
# for. Their joins stay shuffles (or AQE picks broadcast at runtime
# when the parent happens to be small).
FK_EDGES = [
    ("orders->customer", "orders", "o_custkey", "customer", "c_custkey", False),
    ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey", False),
    ("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey", False),
    ("lineitem->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey", False),
    ("supplier->nation", "supplier", "s_nationkey", "nation", "n_nationkey", True),
    ("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey", True),
    ("nation->region", "nation", "n_regionkey", "region", "r_regionkey", True),
]


def q_integrity_audit(spark: SparkSession, sf: str) -> DataFrame:
    """One row per FK edge: child row count and orphan count (child keys
    absent from the parent). ONE pass over each child per edge: a left
    join against the deduped parent keys with a hit flag yields row
    count and orphan count from the same aggregate (the earlier
    anti-join + separate count formulation scanned every child twice).
    The distinct() on parent keys is kept deliberately — it makes the
    row count robust even when the parent's "primary key" is itself
    corrupt with duplicates, which is precisely the load-state this
    audit exists to catch. Fixed-size dims broadcast; SF-scaling
    parents shuffle on the key, which is the join the warehouse pays
    anyway. NULL child keys count as orphans — a NULL FK fails the
    constraint (a NULL equi-join key never matches)."""
    parts = []
    for name, child, ckey, parent, pkey, dim in FK_EDGES:
        c = table(spark, sf, child).select(F.col(ckey).alias("k"))
        p = (
            table(spark, sf, parent)
            .select(F.col(pkey).alias("k"))
            .distinct()
            .withColumn("hit", F.lit(1))
        )
        if dim:
            p = F.broadcast(p)
        # Round-12 optimization (guide §2.2): pre-aggregate the child
        # to (key, multiplicity) BEFORE the parent join — the join
        # shuffle carries distinct child keys instead of every fact
        # row, and the same exact integer totals fall out of the
        # multiplicity sums (NULL keys keep their own group and still
        # never match, so they stay counted as orphans; an empty child
        # still reports 0 rows via the coalesce, and n_orphans stays
        # NULL-on-empty exactly as the row-level sum did).
        ck = c.groupBy("k").agg(F.count(F.lit(1)).alias("cn"))
        parts.append(
            ck.join(p, "k", "left").agg(
                F.lit(name).alias("fk_edge"),
                F.coalesce(F.sum("cn"), F.lit(0)).alias("n_child_rows"),
                F.sum(
                    F.when(F.col("hit").isNull(), F.col("cn")).otherwise(0)
                ).alias("n_orphans"),
            )
        )
    return reduce(lambda a, b: a.unionByName(b), parts)


def _sql_integrity_audit() -> str:
    sels = []
    for name, child, ckey, parent, pkey, _ in FK_EDGES:
        sels.append(
            f"""SELECT '{name}' AS fk_edge,
  (SELECT COUNT(*) FROM {child}) AS n_child_rows,
  (SELECT COUNT(*) FROM {child} c
   WHERE c.{ckey} IS NULL
      OR NOT EXISTS (SELECT 1 FROM {parent} p WHERE p.{pkey} = c.{ckey})
  ) AS n_orphans"""
        )
    return "\nUNION ALL\n".join(sels)


PROFILE_COLS = [
    "l_quantity",
    "l_extendedprice",
    "l_discount",
    "l_tax",
    "l_orderkey",
    "l_partkey",
    "l_suppkey",
    "l_linenumber",
]


def q_dataset_profile(spark: SparkSession, sf: str) -> DataFrame:
    """ANALYZE TABLE lineitem: per numeric column, null count, exact
    distinct count, rounded min/max — the statistics a cost-based
    optimizer feeds on. All metrics for all columns come from ONE scan:
    count_distinct columns share the aggregate (Spark expands to an
    expand+partial-agg plan, still a single pass over the fact table);
    output is long-format (column, metric values), 8 rows."""
    li = table(spark, sf, "lineitem")
    aggs = []
    for c in PROFILE_COLS:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}__nulls"),
            F.countDistinct(c).alias(f"{c}__distinct"),
            F.round(F.min(F.col(c).cast("double")), 6).alias(f"{c}__min"),
            F.round(F.max(F.col(c).cast("double")), 6).alias(f"{c}__max"),
        ]
    wide = li.agg(*aggs)
    rows = [
        F.struct(
            F.lit(c).alias("column"),
            F.col(f"{c}__nulls").alias("null_count"),
            F.col(f"{c}__distinct").alias("n_distinct"),
            F.col(f"{c}__min").alias("min_value"),
            F.col(f"{c}__max").alias("max_value"),
        )
        for c in PROFILE_COLS
    ]
    return wide.select(F.explode(F.array(*rows)).alias("s")).select("s.*")


def _sql_dataset_profile() -> str:
    sels = []
    for c in PROFILE_COLS:
        sels.append(
            f"""SELECT '{c}' AS column,
  CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_count,
  COUNT(DISTINCT {c}) AS n_distinct,
  ROUND(MIN(CAST({c} AS DOUBLE)), 6) AS min_value,
  ROUND(MAX(CAST({c} AS DOUBLE)), 6) AS max_value
FROM lineitem"""
        )
    return "\nUNION ALL\n".join(sels)


QUERIES: dict[str, Query] = {
    "integrity_audit": Query(q_integrity_audit, _sql_integrity_audit()),
    "dataset_profile": Query(q_dataset_profile, _sql_dataset_profile()),
}
