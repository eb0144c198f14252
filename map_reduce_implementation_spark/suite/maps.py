"""Map/struct column surface (EXT). Map-typed outputs don't hash
portably across engines, so each query EXPLODES the map back to rows
for the oracle comparison — the map construction itself is the operator
under test."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import table
from .base import Query


def q_map_functions(spark: SparkSession, sf: str) -> DataFrame:
    """Build a map<event_type, count> per user, then explode to rows —
    map_from_entries over collect_list(struct), map_keys/values used in
    the projection."""
    ev = table(spark, sf, "events")
    per_type = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    mapped = per_type.groupBy("user_id").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("event_type", "n")))
        ).alias("type_counts")
    )
    return mapped.select(
        "user_id",
        F.size("type_counts").alias("n_types"),
        F.explode("type_counts").alias("event_type", "n_events"),
    )


SQL_MAP_FUNCTIONS = """
WITH per_type AS (
  SELECT user_id, event_type, COUNT(*) AS n FROM events GROUP BY 1, 2
),
sized AS (
  SELECT user_id, COUNT(*) AS n_types FROM per_type GROUP BY 1
)
SELECT p.user_id, CAST(s.n_types AS INTEGER) AS n_types,
       p.event_type, p.n AS n_events
FROM per_type p JOIN sized s ON p.user_id = s.user_id
"""


def q_struct_functions(spark: SparkSession, sf: str) -> DataFrame:
    """Nested struct build + field access + inline flattening."""
    o = table(spark, sf, "orders")
    nested = o.select(
        "o_orderkey",
        F.struct(
            F.col("o_custkey").alias("cust"),
            F.struct(F.col("o_orderstatus").alias("st"), F.col("o_totalprice").alias("p")).alias(
                "detail"
            ),
        ).alias("info"),
    )
    return nested.select(
        "o_orderkey",
        F.col("info.cust").alias("cust"),
        F.col("info.detail.st").alias("status"),
        F.col("info.detail.p").alias("price"),
    )


SQL_STRUCT_FUNCTIONS = """
SELECT o_orderkey, o_custkey AS cust, o_orderstatus AS status, o_totalprice AS price
FROM orders
"""


QUERIES: dict[str, Query] = {
    "map_functions": Query(q_map_functions, SQL_MAP_FUNCTIONS),
    "struct_functions": Query(q_struct_functions, SQL_STRUCT_FUNCTIONS),
}
