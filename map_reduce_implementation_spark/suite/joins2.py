"""Advanced join shapes (EXT — SURVEY §2.3: the reference has no joins):
cross, range (interval), and as-of joins, plus a salted-join skew
utility demo. These are the shapes Spark has no single-keyword operator
for — composed from inequality join conditions + windowed dedup, per the
SURVEY's custom-operator guidance (composition first, UDFs never).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import table
from .base import Query


def q_cross_join(spark: SparkSession, sf: str) -> DataFrame:
    """Explicit small×small cross join (region × nation grid)."""
    r = table(spark, sf, "region").select(F.col("r_name"))
    n = table(spark, sf, "nation").select(F.col("n_name"))
    return r.crossJoin(n)


SQL_CROSS_JOIN = "SELECT r_name, n_name FROM region CROSS JOIN nation"


def q_range_join(spark: SparkSession, sf: str) -> DataFrame:
    """Interval/range join: pairs of events by the same user within a
    5-minute window. Planned as a broadcast-nested-loop / shuffled
    inequality join locally; at 100 TB you bucket ``ts`` to the range
    width first so the equi-part (user_id, bucket) carries the shuffle —
    that exact rewrite is what AQE cannot invent for you.

    The bucketed rewrite is used here: join on (user_id, bucket) where
    e2 checks both its own and the previous bucket → equi-join shuffle,
    inequality applied as a post-filter."""
    ev = table(spark, sf, "events").select("user_id", "event_id", "ts")
    width = 300  # seconds
    bucket = (F.unix_timestamp("ts") / width).cast("long")
    e1 = ev.select(
        F.col("user_id"), F.col("event_id").alias("id1"), F.col("ts").alias("ts1"),
        bucket.alias("b1"),
    )
    e2 = ev.select(
        F.col("user_id").alias("u2"), F.col("event_id").alias("id2"),
        F.col("ts").alias("ts2"), bucket.alias("b2"),
    )
    # candidate buckets: same or adjacent (ts2 in (ts1, ts1+5min] spans ≤2)
    joined = e1.join(
        e2,
        (F.col("user_id") == F.col("u2"))
        & ((F.col("b2") == F.col("b1")) | (F.col("b2") == F.col("b1") + 1))
        & (F.col("ts2") > F.col("ts1"))
        & (F.col("ts2") <= F.col("ts1") + F.expr("INTERVAL 5 MINUTES")),
    )
    return joined.select("user_id", "id1", "id2")


SQL_RANGE_JOIN = """
SELECT e1.user_id, e1.event_id AS id1, e2.event_id AS id2
FROM events e1 JOIN events e2
  ON e1.user_id = e2.user_id
 AND e2.ts > e1.ts
 AND e2.ts <= e1.ts + INTERVAL 5 MINUTE
"""


def q_asof_join(spark: SparkSession, sf: str) -> DataFrame:
    """As-of join: for every 'purchase' event, the most recent prior
    'view' by the same user. Composition: union-tag + window max — ONE
    shuffle on user_id, no inequality join at all. This is the
    100 TB-correct as-of shape (the naive t1<=t2 join is quadratic per
    key)."""
    ev = table(spark, sf, "events")
    tagged = ev.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.when(F.col("event_type") == "view", F.col("ts")).alias("view_ts"),
    ).filter(F.col("event_type").isin("view", "purchase"))
    from pyspark.sql import Window

    win = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts"), F.col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    enriched = tagged.withColumn("last_view_ts", F.max("view_ts").over(win))
    return enriched.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), "ts", "last_view_ts"
    )


SQL_ASOF_JOIN = """
WITH tagged AS (
  SELECT user_id, event_id, ts, event_type,
    CASE WHEN event_type = 'view' THEN ts END AS view_ts
  FROM events WHERE event_type IN ('view', 'purchase')
),
enriched AS (
  SELECT user_id, event_id, ts, event_type,
    MAX(view_ts) OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_view_ts
  FROM tagged
)
SELECT user_id, event_id AS purchase_id, ts, last_view_ts
FROM enriched WHERE event_type = 'purchase'
"""


def q_asof_join_forward(spark: SparkSession, sf: str) -> DataFrame:
    """Forward as-of: for every 'view', the NEXT 'purchase' by the same
    user (conversion attribution). Mirror of q_asof_join with an
    unbounded-FOLLOWING frame and min — still one shuffle on user_id."""
    ev = table(spark, sf, "events")
    tagged = ev.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.when(F.col("event_type") == "purchase", F.col("ts")).alias("purchase_ts"),
    ).filter(F.col("event_type").isin("view", "purchase"))
    from pyspark.sql import Window

    win = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts"), F.col("event_id"))
        .rowsBetween(1, Window.unboundedFollowing)
    )
    enriched = tagged.withColumn("next_purchase_ts", F.min("purchase_ts").over(win))
    return enriched.filter(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("view_id"), "ts", "next_purchase_ts"
    )


SQL_ASOF_JOIN_FORWARD = """
WITH tagged AS (
  SELECT user_id, event_id, ts, event_type,
    CASE WHEN event_type = 'purchase' THEN ts END AS purchase_ts
  FROM events WHERE event_type IN ('view', 'purchase')
),
enriched AS (
  SELECT user_id, event_id, ts, event_type,
    MIN(purchase_ts) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
      AS next_purchase_ts
  FROM tagged
)
SELECT user_id, event_id AS view_id, ts, next_purchase_ts
FROM enriched WHERE event_type = 'view'
"""


def q_array_functions(spark: SparkSession, sf: str) -> DataFrame:
    """Array scalar surface over the embedding column."""
    e = table(spark, sf, "embeddings")
    v = F.transform("embedding", lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.array_max(v), 6).alias("vmax"),
        F.round(F.array_min(v), 6).alias("vmin"),
        F.round(F.element_at(v, 1), 6).alias("first_el"),
        F.round(
            F.aggregate(F.slice(v, 1, 8), F.lit(0.0), lambda a, x: a + x), 6
        ).alias("head8_sum"),
    )


SQL_ARRAY_FUNCTIONS = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
SELECT vec_id,
  CAST(len(v) AS INTEGER) AS dim,
  ROUND(list_max(v), 6) AS vmax,
  ROUND(list_min(v), 6) AS vmin,
  ROUND(v[1], 6) AS first_el,
  ROUND(list_sum(list_slice(v, 1, 8)), 6) AS head8_sum
FROM e
"""


def q_salted_join(spark: SparkSession, sf: str) -> DataFrame:
    """Skew-safe salted join (operators/skew.py) — result identical to
    the plain equi-join, so the plain SQL join IS the oracle; the salt
    spreads any hot o_custkey over 8 reducers."""
    from ..operators.skew import salted_join

    orders = table(spark, sf, "orders").select("o_orderkey", "o_custkey")
    cust = table(spark, sf, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_name"
    )
    return salted_join(orders, cust, "o_custkey", n_salts=8)


SQL_SALTED_JOIN = """
SELECT o_orderkey, o_custkey, c_name
FROM orders JOIN customer ON o_custkey = c_custkey
"""


def q_null_safe_join(spark: SparkSession, sf: str) -> DataFrame:
    """Null-safe equality join (``eqNullSafe`` / SQL ``<=>``): NULL keys
    match each other instead of vanishing — the semantics needed when a
    'bucket' key is legitimately absent. Demonstrated on per-status
    aggregates with one status NULLed out; plans as a normal hash join
    (null-safe keys still hash-partition)."""
    o = table(spark, sf, "orders")
    s = o.groupBy(F.nullif("o_orderstatus", F.lit("O")).alias("st")).agg(
        F.count("*").alias("n")
    )
    a, b = s.alias("a"), s.alias("b")
    return a.join(b, F.col("a.st").eqNullSafe(F.col("b.st"))).select(
        F.col("a.st").alias("status"),
        F.col("a.n").alias("n_left"),
        F.col("b.n").alias("n_right"),
    )


SQL_NULL_SAFE_JOIN = """
WITH s AS (
  SELECT NULLIF(o_orderstatus, 'O') AS st, COUNT(*) AS n FROM orders GROUP BY 1
)
SELECT a.st AS status, a.n AS n_left, b.n AS n_right
FROM s a JOIN s b ON a.st IS NOT DISTINCT FROM b.st
"""


def q_lateral_join(spark: SparkSession, sf: str) -> DataFrame:
    """Correlated LATERAL subquery (SQL:1999): top-2 customers by balance
    per nation. Catalyst decorrelates this into a window-ranked join —
    same physical shape as the QUALIFY/top-k-per-group pattern, so it
    scales as one shuffle on the correlation key, NOT a per-row subquery."""
    table(spark, sf, "nation").createOrReplaceTempView("nation_lat")
    table(spark, sf, "customer").createOrReplaceTempView("customer_lat")
    return spark.sql(
        """
        SELECT n.n_name, t.c_name, t.c_acctbal
        FROM nation_lat n,
        LATERAL (
          SELECT c_name, c_acctbal FROM customer_lat c
          WHERE c.c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_name LIMIT 2
        ) t
        """
    )


SQL_LATERAL_JOIN = """
SELECT n.n_name, t.c_name, t.c_acctbal
FROM nation n,
LATERAL (
  SELECT c_name, c_acctbal FROM customer c
  WHERE c.c_nationkey = n.n_nationkey
  ORDER BY c_acctbal DESC, c_name LIMIT 2
) t
"""


QUERIES: dict[str, Query] = {
    "cross_join": Query(q_cross_join, SQL_CROSS_JOIN),
    "lateral_join": Query(q_lateral_join, SQL_LATERAL_JOIN),
    "null_safe_join": Query(q_null_safe_join, SQL_NULL_SAFE_JOIN),
    "salted_join": Query(q_salted_join, SQL_SALTED_JOIN),
    "range_join": Query(q_range_join, SQL_RANGE_JOIN),
    "asof_join": Query(q_asof_join, SQL_ASOF_JOIN),
    "asof_join_forward": Query(q_asof_join_forward, SQL_ASOF_JOIN_FORWARD),
    "array_functions": Query(q_array_functions, SQL_ARRAY_FUNCTIONS),
}
