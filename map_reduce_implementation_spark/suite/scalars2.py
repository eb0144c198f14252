"""Extended scalar/function surface + subquery shapes (EXT; SURVEY §2.8
lists the reference's six scalar ops — this exposes the engine-native
superset) — all JVM codegen, each with an exact oracle twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import table
from .base import Query


def q_string_functions(spark: SparkSession, sf: str) -> DataFrame:
    d = table(spark, sf, "documents")
    return d.select(
        "doc_id",
        F.initcap(F.substring("text", 1, 20)).alias("head_initcap"),
        F.lpad(F.col("lang"), 5, "_").alias("lang_pad"),
        F.translate("lang", "aeiou", "AEIOU").alias("lang_tr"),
        F.regexp_extract("text", "([a-z]+)", 1).alias("first_word"),
        F.instr("text", "data").alias("data_pos"),
        F.split_part(F.col("source"), F.lit("rc"), F.lit(2)).alias("src_num"),
        F.repeat(F.col("lang"), 2).alias("lang2"),
        F.reverse(F.col("lang")).alias("lang_rev"),
        F.trim(F.concat(F.lit("  "), F.col("lang"), F.lit("  "))).alias("lang_trim"),
    )


SQL_STRING_FUNCTIONS = """
SELECT doc_id,
  -- DuckDB initcap doesn't exist; emulate title-case of first char per word
  list_aggr(list_transform(string_split(SUBSTRING(text, 1, 20), ' '),
    x -> CASE WHEN length(x) > 0
              THEN upper(x[1]) || lower(x[2:]) ELSE x END), 'string_agg', ' ')
    AS head_initcap,
  lpad(lang, 5, '_') AS lang_pad,
  translate(lang, 'aeiou', 'AEIOU') AS lang_tr,
  regexp_extract(text, '([a-z]+)', 1) AS first_word,
  CAST(instr(text, 'data') AS INTEGER) AS data_pos,
  split_part(source, 'rc', 2) AS src_num,
  repeat(lang, 2) AS lang2,
  reverse(lang) AS lang_rev,
  trim('  ' || lang || '  ') AS lang_trim
FROM documents
"""


def q_conditional_functions(spark: SparkSession, sf: str) -> DataFrame:
    c = table(spark, sf, "customer")
    return c.select(
        "c_custkey",
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("(b)")).alias(
            "seg_or_b"
        ),
        F.when(F.col("c_acctbal") < 0, "neg")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("high")
        .alias("bal_band"),
        F.greatest(F.col("c_acctbal"), F.lit(0.0)).alias("bal_floor0"),
        F.least(F.col("c_nationkey"), F.lit(10)).alias("nk_cap"),
    )


SQL_CONDITIONAL_FUNCTIONS = """
SELECT c_custkey,
  COALESCE(NULLIF(c_mktsegment, 'BUILDING'), '(b)') AS seg_or_b,
  CASE WHEN c_acctbal < 0 THEN 'neg'
       WHEN c_acctbal < 5000 THEN 'mid' ELSE 'high' END AS bal_band,
  GREATEST(c_acctbal, 0.0) AS bal_floor0,
  LEAST(c_nationkey, 10) AS nk_cap
FROM customer
"""


def q_scalar_subquery(spark: SparkSession, sf: str) -> DataFrame:
    """Scalar subquery: orders above the global average price. Spark
    plans the subquery as an independent job feeding a literal —
    morally a broadcast of one value."""
    table(spark, sf, "orders").createOrReplaceTempView("orders_sq")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM orders_sq
        WHERE o_totalprice > (SELECT CAST(AVG(CAST(o_totalprice AS DECIMAL(18,2)))
                                          AS DOUBLE) FROM orders_sq)
        """
    )


SQL_SCALAR_SUBQUERY = """
SELECT o_orderkey, o_totalprice
FROM orders
WHERE o_totalprice > (SELECT CAST(AVG(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                      FROM orders)
"""


def q_in_subquery(spark: SparkSession, sf: str) -> DataFrame:
    """IN (correlated-free) subquery — planned as a left-semi join."""
    for t in ("orders", "customer"):
        table(spark, sf, t).createOrReplaceTempView(f"{t}_in")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey
        FROM orders_in
        WHERE o_custkey IN (SELECT c_custkey FROM customer_in WHERE c_acctbal > 9000)
        """
    )


SQL_IN_SUBQUERY = """
SELECT o_orderkey, o_custkey
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
"""


def q_union_by_name(spark: SparkSession, sf: str) -> DataFrame:
    """unionByName with missing columns filled — schema-evolution union."""
    a = table(spark, sf, "supplier").select(
        F.col("s_suppkey").alias("entity_id"), F.col("s_name").alias("name")
    )
    b = table(spark, sf, "customer").select(
        F.col("c_name").alias("name"),
        F.col("c_custkey").alias("entity_id"),
        F.col("c_mktsegment").alias("segment"),
    )
    return a.unionByName(b, allowMissingColumns=True)


SQL_UNION_BY_NAME = """
SELECT s_suppkey AS entity_id, s_name AS name, NULL AS segment FROM supplier
UNION ALL
SELECT c_custkey AS entity_id, c_name AS name, c_mktsegment AS segment FROM customer
"""


def q_explode_tokens(spark: SparkSession, sf: str) -> DataFrame:
    """explode/posexplode (lateral UNNEST) — token stream with positions
    from the first 20 documents."""
    from ..functions import tokens

    d = (
        table(spark, sf, "documents")
        .filter(F.col("doc_id") < 20)
        .select("doc_id", tokens("text").alias("ts"))
    )
    return d.select(
        "doc_id", F.posexplode("ts").alias("pos", "tok")
    ).withColumn("pos", F.col("pos").cast("int"))


SQL_EXPLODE_TOKENS = """
WITH t AS (
  SELECT doc_id,
    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS ts
  FROM documents WHERE doc_id < 20
)
SELECT doc_id, CAST(u.i - 1 AS INTEGER) AS pos, ts[u.i] AS tok
FROM t, unnest(range(1, len(ts) + 1)) u(i)
"""


def q_sample_deterministic(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic sampling via hash-mod — reproducible across engines
    AND cluster sizes, unlike rate-based ``df.sample`` (whose RNG is
    partition-dependent; provided separately as ``q_sample_rng``
    rows-only). This is the sampling pattern a training-data pipeline
    should use: stable membership under re-runs and repartitioning."""
    o = table(spark, sf, "orders")
    return o.filter(F.pmod(F.col("o_orderkey"), F.lit(20)) == 0).select(
        "o_orderkey", "o_custkey"
    )


SQL_SAMPLE_DETERMINISTIC = """
SELECT o_orderkey, o_custkey FROM orders WHERE o_orderkey % 20 = 0
"""


def q_sample_stratified(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic stratified sampling: per-class keep rates (all
    purchases, 1/4 of clicks, 1/20 of views) via hash-mod on the event
    id. The training-data rebalancing pattern: reproducible membership
    under re-runs AND repartitioning, unlike df.stat.sampleBy's RNG.
    One scan, no shuffle — the predicate is a pure projection."""
    ev = table(spark, sf, "events")
    rate = (
        F.when(F.col("event_type") == "purchase", 1)
        .when(F.col("event_type") == "click", 4)
        .otherwise(20)
    )
    return ev.filter(F.pmod(F.col("event_id"), rate) == 0).select(
        "event_id", "event_type", "user_id"
    )


SQL_SAMPLE_STRATIFIED = """
SELECT event_id, event_type, user_id
FROM events
WHERE event_id % (CASE event_type WHEN 'purchase' THEN 1
                  WHEN 'click' THEN 4 ELSE 20 END) = 0
"""


def q_sample_weighted(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic weighted sampling without replacement (Efraimidis-
    Spirakis A-ES): key = u^(1/w) with a HASH-derived uniform u instead
    of an RNG, top-k by key. Longer documents are proportionally more
    likely to be kept — the data-mixing knob of a curation pipeline —
    yet membership is exactly reproducible on any cluster layout.
    Top-k is TakeOrderedAndProject: no global sort at scale."""
    d = table(spark, sf, "documents")
    u = (F.pmod(F.col("doc_id"), F.lit(1000003)) * 2654435761 % 4294967296) / 4294967296.0
    w = F.octet_length("text").cast("double")
    key = F.round(F.pow(u, 1.0 / w), 9)
    return (
        d.select("doc_id", key.alias("es_key"))
        .orderBy(F.desc("es_key"), F.asc("doc_id"))
        .limit(100)
    )


SQL_SAMPLE_WEIGHTED = """
SELECT doc_id,
  ROUND(POW(((doc_id % 1000003) * 2654435761 % 4294967296) / 4294967296.0,
            1.0 / octet_length(encode(text))), 9) AS es_key
FROM documents
ORDER BY es_key DESC, doc_id ASC
LIMIT 100
"""


def q_sample_rng(spark: SparkSession, sf: str) -> DataFrame:
    """Bernoulli df.sample (seeded) — partition-dependent RNG stream →
    rows-only driver check; the exact sample under the test session's
    fixed partitioning is pinned in tests/test_sample_rng_pinned.py.

    Pitfall (found round 6, PySpark 4.1.2): the 2-positional-arg overload
    ``df.sample(0.05, seed=42)`` silently DROPS the seed — the sample
    changed across sessions (64/68/73/74 rows measured on identical
    configs). Only the explicit ``sample(withReplacement=False,
    fraction=, seed=)`` form is reproducible; always use it."""
    return (
        table(spark, sf, "orders")
        .sample(withReplacement=False, fraction=0.05, seed=42)
        .select("o_orderkey")
    )


def q_exists_subquery(spark: SparkSession, sf: str) -> DataFrame:
    """Correlated EXISTS — planned as a left-semi join; the correlation
    is decorrelated by Catalyst into the join condition (no per-row
    subquery execution ever happens)."""
    for t in ("customer", "orders"):
        table(spark, sf, t).createOrReplaceTempView(f"{t}_ex")
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM customer_ex c
        WHERE EXISTS (
          SELECT 1 FROM orders_ex o
          WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
        )
        """
    )


SQL_EXISTS_SUBQUERY = """
SELECT c_custkey, c_name
FROM customer c
WHERE EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
)
"""


def q_not_exists_subquery(spark: SparkSession, sf: str) -> DataFrame:
    """Correlated NOT EXISTS — the left-anti join plan (customers with
    no orders at all)."""
    for t in ("customer", "orders"):
        table(spark, sf, t).createOrReplaceTempView(f"{t}_nex")
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM customer_nex c
        WHERE NOT EXISTS (
          SELECT 1 FROM orders_nex o WHERE o.o_custkey = c.c_custkey
        )
        """
    )


SQL_NOT_EXISTS_SUBQUERY = """
SELECT c_custkey, c_name
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
"""


def q_unpivot(spark: SparkSession, sf: str) -> DataFrame:
    """UNPIVOT (wide→long) via ``stack`` — the inverse of pivot: three
    account metrics per customer melt into (metric, val) rows. Pure
    projection+generator, no shuffle."""
    c = table(spark, sf, "customer")
    return c.selectExpr(
        "c_custkey",
        "stack(2, 'acctbal', CAST(c_acctbal AS DOUBLE), "
        "'custkey_mod', CAST(c_custkey % 97 AS DOUBLE)) AS (metric, val)",
    )


SQL_UNPIVOT = """
SELECT c_custkey, u.metric, u.val
FROM customer
CROSS JOIN LATERAL (
  SELECT 'acctbal' AS metric, CAST(c_acctbal AS DOUBLE) AS val
  UNION ALL
  SELECT 'custkey_mod', CAST(c_custkey % 97 AS DOUBLE)
) u
"""


def q_try_functions(spark: SparkSession, sf: str) -> DataFrame:
    """Error-safe arithmetic/casts (try_divide / try_cast): NULL instead
    of a failed 100 TB job at row 3 billion. This session runs ANSI mode
    (spark.sql.ansi.enabled=true) where plain ops THROW on overflow and
    zero-division — try_* is the designed per-expression escape hatch."""
    li = table(spark, sf, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(
            F.try_divide(F.col("l_extendedprice"), F.col("l_quantity") - F.lit(25)), 6
        ).alias("ratio_or_null"),
        F.col("l_returnflag").try_cast("int").alias("flag_as_int"),
        F.col("l_linenumber").cast("string").try_cast("int").alias("ln_roundtrip"),
    )


SQL_TRY_FUNCTIONS = """
SELECT l_orderkey, l_linenumber,
  CASE WHEN l_quantity = 25 THEN NULL
       ELSE ROUND(l_extendedprice / (l_quantity - 25), 6) END AS ratio_or_null,
  TRY_CAST(l_returnflag AS INTEGER) AS flag_as_int,
  TRY_CAST(CAST(l_linenumber AS VARCHAR) AS INTEGER) AS ln_roundtrip
FROM lineitem
"""


QUERIES: dict[str, Query] = {
    "string_functions": Query(q_string_functions, SQL_STRING_FUNCTIONS),
    "try_functions": Query(q_try_functions, SQL_TRY_FUNCTIONS),
    "exists_subquery": Query(q_exists_subquery, SQL_EXISTS_SUBQUERY),
    "not_exists_subquery": Query(q_not_exists_subquery, SQL_NOT_EXISTS_SUBQUERY),
    "unpivot": Query(q_unpivot, SQL_UNPIVOT),
    "conditional_functions": Query(q_conditional_functions, SQL_CONDITIONAL_FUNCTIONS),
    "scalar_subquery": Query(q_scalar_subquery, SQL_SCALAR_SUBQUERY),
    "in_subquery": Query(q_in_subquery, SQL_IN_SUBQUERY),
    "union_by_name": Query(q_union_by_name, SQL_UNION_BY_NAME),
    "explode_tokens": Query(q_explode_tokens, SQL_EXPLODE_TOKENS),
    "sample_deterministic": Query(q_sample_deterministic, SQL_SAMPLE_DETERMINISTIC),
    "sample_stratified": Query(q_sample_stratified, SQL_SAMPLE_STRATIFIED),
    "sample_weighted": Query(q_sample_weighted, SQL_SAMPLE_WEIGHTED),
    "sample_rng": Query(q_sample_rng, None),
}
