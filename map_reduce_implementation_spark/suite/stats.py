"""Statistical aggregates & grouping-set suite (EXT — SURVEY §2.4 lists
none in the reference; all built-in Spark aggregates).

Float caveat: stddev/var/corr are order-dependent in the last ulps —
both engines use numerically stable one-pass algorithms that agree to
~1e-10 relative; results are rounded to 6 dp on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import table
from .base import Query, dec


def q_stats_agg(spark: SparkSession, sf: str) -> DataFrame:
    li = table(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
        F.round(F.var_samp("l_discount"), 6).alias("var_disc"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 6).alias("cov_qty_price"),
        F.round(F.avg(dec("l_extendedprice")).cast("double"), 6).alias("avg_price"),
    )


SQL_STATS_AGG = """
SELECT l_returnflag,
  ROUND(stddev_samp(l_quantity), 6) AS sd_qty,
  ROUND(var_samp(l_discount), 6) AS var_disc,
  ROUND(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
  ROUND(covar_samp(l_quantity, l_extendedprice), 6) AS cov_qty_price,
  ROUND(CAST(AVG(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 6) AS avg_price
FROM lineitem GROUP BY l_returnflag
"""


def q_percentiles(spark: SparkSession, sf: str) -> DataFrame:
    """Exact interpolated percentiles (Spark ``percentile`` ≡ DuckDB
    ``quantile_cont``). The approx/sketch variant (approx_percentile /
    t-digest) is a separate rows-only query — sketches differ by engine."""
    li = table(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_quantity, 0.5)"), 6).alias("p50_qty"),
        F.round(F.expr("percentile(l_quantity, 0.95)"), 6).alias("p95_qty"),
        F.round(F.expr("percentile(l_extendedprice, 0.25)"), 6).alias("p25_price"),
    )


SQL_PERCENTILES = """
SELECT l_returnflag,
  ROUND(quantile_cont(l_quantity, 0.5), 6) AS p50_qty,
  ROUND(quantile_cont(l_quantity, 0.95), 6) AS p95_qty,
  ROUND(quantile_cont(l_extendedprice, 0.25), 6) AS p25_price
FROM lineitem GROUP BY l_returnflag
"""


def q_grouping_sets(spark: SparkSession, sf: str) -> DataFrame:
    """GROUPING SETS via the SQL surface (same Catalyst plan as the
    DataFrame rollup/cube — Expand + partial/final agg)."""
    table(spark, sf, "orders").createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


SQL_GROUPING_SETS = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


def q_approx_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """approx_count_distinct (HLL++) — the one-pass mergeable sketch used
    instead of COUNT(DISTINCT) at 100 TB. Engine sketches differ →
    rows-only check; accuracy vs exact asserted in tests (±5%)."""
    li = table(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", rsd=0.01).alias("approx_orders"),
        F.countDistinct("l_orderkey").alias("exact_orders"),
    )


def q_having(spark: SparkSession, sf: str) -> DataFrame:
    """Post-aggregation filter (HAVING)."""
    ev = table(spark, sf, "events")
    return (
        ev.groupBy("user_id")
        .agg(F.count("*").alias("n_events"))
        .filter(F.col("n_events") > 80)
    )


SQL_HAVING = """
SELECT user_id, COUNT(*) AS n_events FROM events
GROUP BY user_id HAVING COUNT(*) > 80
"""


def q_agg_extras(spark: SparkSession, sf: str) -> DataFrame:
    """Ordered-set / boolean / bitwise aggregate surface: median,
    count_if, bool_and/or, bit_and/or/xor, deterministic mode.
    All JVM hash aggregates — one shuffle on the group key.
    mode(col, deterministic=True) ties-break to the lowest value,
    matching DuckDB's mode(x ORDER BY x)."""
    li = table(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.median("l_quantity"), 6).alias("med_qty"),
        F.count_if(F.col("l_quantity") > 25).alias("n_big"),
        F.bool_and(F.col("l_quantity") > 0).alias("all_pos"),
        F.bool_or(F.col("l_quantity") > 49).alias("any_huge"),
        F.bit_and("l_linenumber").alias("ln_and"),
        F.bit_or("l_linenumber").alias("ln_or"),
        F.bit_xor("l_linenumber").alias("ln_xor"),
        F.mode("l_linestatus", True).alias("top_status"),
    )


SQL_AGG_EXTRAS = """
SELECT l_returnflag,
  ROUND(median(l_quantity), 6) AS med_qty,
  CAST(count_if(l_quantity > 25) AS BIGINT) AS n_big,
  bool_and(l_quantity > 0) AS all_pos,
  bool_or(l_quantity > 49) AS any_huge,
  bit_and(l_linenumber) AS ln_and,
  bit_or(l_linenumber) AS ln_or,
  bit_xor(l_linenumber) AS ln_xor,
  mode(l_linestatus ORDER BY l_linestatus) AS top_status
FROM lineitem GROUP BY l_returnflag
"""


def q_regr_agg(spark: SparkSession, sf: str) -> DataFrame:
    """Linear-regression aggregates (price vs quantity per flag) — the
    one-pass moment accumulators (count, sums, co-moments) Spark merges
    map-side, so the shuffle carries O(groups) not O(rows)."""
    li = table(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 6).alias("slope"),
        F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 6).alias("intercept"),
        F.round(F.regr_r2("l_extendedprice", "l_quantity"), 9).alias("r2"),
        F.regr_count("l_extendedprice", "l_quantity").alias("n"),
        F.round(F.regr_avgx("l_extendedprice", "l_quantity"), 6).alias("avg_x"),
        F.round(F.regr_avgy("l_extendedprice", "l_quantity"), 6).alias("avg_y"),
    )


SQL_REGR_AGG = """
SELECT l_returnflag,
  ROUND(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
  ROUND(regr_intercept(l_extendedprice, l_quantity), 6) AS intercept,
  ROUND(regr_r2(l_extendedprice, l_quantity), 9) AS r2,
  regr_count(l_extendedprice, l_quantity) AS n,
  ROUND(regr_avgx(l_extendedprice, l_quantity), 6) AS avg_x,
  ROUND(regr_avgy(l_extendedprice, l_quantity), 6) AS avg_y
FROM lineitem GROUP BY l_returnflag
"""


def q_listagg(spark: SparkSession, sf: str) -> DataFrame:
    """Ordered string aggregation (SQL:2016 LISTAGG ... WITHIN GROUP,
    Spark 4). Per-group ordered concat requires a sort within each
    group's partial state — fine for small groups (names per region);
    for huge groups prefer collect_list + downstream processing."""
    n = table(spark, sf, "nation")
    return n.groupBy("n_regionkey").agg(
        F.expr("listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name)").alias("names")
    )


SQL_LISTAGG = """
SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS names
FROM nation GROUP BY n_regionkey
"""


def q_group_by_all(spark: SparkSession, sf: str) -> DataFrame:
    """GROUP BY ALL (modern SQL sugar: every non-aggregate select column
    becomes a grouping key) — same Catalyst plan as the explicit list."""
    table(spark, sf, "orders").createOrReplaceTempView("orders_gba")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM orders_gba GROUP BY ALL
        """
    )


SQL_GROUP_BY_ALL = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders GROUP BY ALL
"""


def q_approx_percentile(spark: SparkSession, sf: str) -> DataFrame:
    """approx_percentile (Greenwald-Khanna sketch) — the mergeable
    one-pass quantile estimator for 100 TB (exact percentile needs a
    per-group sort/collect). Sketches are engine-specific → rows-only
    driver check; accuracy vs the exact percentile asserted in tests."""
    li = table(spark, sf, "lineitem")
    tail = F.expr("approx_percentile(l_extendedprice, array(0.9, 0.99), 1000)")
    return li.groupBy("l_returnflag").agg(
        F.expr("approx_percentile(l_extendedprice, 0.5, 1000)").alias("p50_approx"),
        F.element_at(tail, 1).alias("p90_approx"),
        F.element_at(tail, 2).alias("p99_approx"),
    )


QUERIES: dict[str, Query] = {
    "stats_agg": Query(q_stats_agg, SQL_STATS_AGG),
    "group_by_all": Query(q_group_by_all, SQL_GROUP_BY_ALL),
    "approx_percentile": Query(q_approx_percentile, None),
    "percentiles": Query(q_percentiles, SQL_PERCENTILES),
    "grouping_sets": Query(q_grouping_sets, SQL_GROUPING_SETS),
    "approx_distinct": Query(q_approx_distinct, None),
    "having": Query(q_having, SQL_HAVING),
    "agg_extras": Query(q_agg_extras, SQL_AGG_EXTRAS),
    "regr_agg": Query(q_regr_agg, SQL_REGR_AGG),
    "listagg": Query(q_listagg, SQL_LISTAGG),
}
