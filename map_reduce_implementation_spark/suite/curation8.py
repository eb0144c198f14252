"""Round-6 wave 16 — selection frontiers, keep-policies, and profiling.

- ``pareto_skyline`` — 2-D Pareto frontier (skyline operator,
  Börzsönyi et al. 2001) over one month of orders: minimize price,
  maximize recency. The multi-objective data-selection primitive
  ("no other candidate is both cheaper and fresher") — computed with
  the SORT-BASED linear formulation (two window functions) while the
  oracle is the DEFINITIONAL quadratic NOT-EXISTS dominance test, so
  the fast plan is verified against the semantics, not against itself.
- ``dedup_cluster_representatives`` — the keep-BEST policy on fuzzy
  dedup clusters (RefinedWeb keeps a representative, not the minimum
  id): capped-shingle candidates → exact-Jaccard edges → connected
  components → per-cluster argmax(n_chars, doc_id tie) over the
  multi-doc clusters. Same recursive-CTE fixpoint oracle discipline
  as ``dedup_fuzzy_clusters``.
- ``term_burstiness`` — Church–Gale burstiness (1995): cf/df, the
  mean occurrences per containing document. Separates topical terms
  (bursty: rare docs, many repeats) from function words (cf ≈ df) —
  the term-level companion to the hapax/Zipf corpus stats and a
  stopword-list generator.
- ``events_value_moments`` — per-type skewness and excess kurtosis of
  the value column from raw power sums of the micro-quantized value:
  the heavy-tail profile that says whether a mean-based monitor (MAD,
  z-score) is even applicable to this stream.

Determinism: skyline dominance and the burstiness ratio order on
exact integers (cents, counts) or their single bit-exact divisions;
the moments' per-term powers are identical IEEE products of exact
integer-valued doubles in both engines (only summation order differs
— ROUND 6 absorbs it, the entropy precedent); CC labels come from the
iterative loop vs a recursive-CTE fixpoint. Degenerate guards
(zero-variance type, empty month, singleton-only clustering) are
identical CASEs in both engines, pinned in tests/test_round6_waves.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import tokens as _tokens
from ..sources import table
from .base import Query, dec
from .dedup import FUZZY_MAX_DF, SQL_SHINGLE_SIZES_CTE, _shingles

SKY_FROM, SKY_TO = "1997-03-01", "1997-04-01"
BURSTY_MIN_DF = 5
BURSTY_TOP_K = 20


def q_pareto_skyline(spark: SparkSession, sf: str) -> DataFrame:
    """Skyline of {SKY_FROM}..{SKY_TO} orders: keep an order iff no
    other order in the slice is at-least-as-recent AND at-most-as-
    expensive with one strict. Duplicate (price, date) points are
    mutually non-dominating and both survive (the standard skyline
    convention) — the same-date window uses strict-less, the
    later-date window at-most.

    Plan: the linear sort-based skyline — ONE date-keyed range window
    (min price over strictly-later dates) + one same-date partition
    min; no self-join, no quadratic dominance test (that is the
    ORACLE's job). At 100 TB: the window key is the date (bounded
    distinct values), so the exchange is date-bucketed and the
    frontier test stays two window passes regardless of row count."""
    o = table(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= SKY_FROM) & (F.col("o_orderdate") < SKY_TO)
    )
    base = o.select(
        "o_orderkey",
        "o_orderdate",
        F.datediff("o_orderdate", F.lit("1995-01-01")).alias("dd"),
        (dec("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    w_later = (
        Window.orderBy(F.desc("dd"))
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    w_same = Window.partitionBy("dd")
    flagged = base.select(
        "o_orderkey",
        "o_orderdate",
        "cents",
        F.min("cents").over(w_later).alias("minp_later"),
        F.min("cents").over(w_same).alias("minp_same"),
    )
    return (
        flagged.filter(
            ~(
                (
                    F.col("minp_later").isNotNull()
                    & (F.col("minp_later") <= F.col("cents"))
                )
                | (F.col("minp_same") < F.col("cents"))
            )
        )
        .select(
            "o_orderkey",
            "o_orderdate",
            F.round(F.col("cents") / F.lit(100.0), 2).alias("price"),
        )
        .orderBy(F.desc("o_orderdate"), F.asc("o_orderkey"))
    )


SQL_PARETO_SKYLINE = f"""
WITH base AS (
  SELECT o_orderkey, o_orderdate,
    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM orders
  WHERE o_orderdate >= DATE '{SKY_FROM}' AND o_orderdate < DATE '{SKY_TO}'
)
SELECT o_orderkey, o_orderdate, ROUND(cents / 100.0, 2) AS price
FROM base a
WHERE NOT EXISTS (
  SELECT 1 FROM base b
  WHERE b.cents <= a.cents AND b.o_orderdate >= a.o_orderdate
    AND (b.cents < a.cents OR b.o_orderdate > a.o_orderdate)
)
ORDER BY o_orderdate DESC, o_orderkey ASC
"""


def q_dedup_cluster_representatives(spark: SparkSession, sf: str) -> DataFrame:
    """Keep-best representatives of the multi-doc fuzzy-dedup
    clusters: the ``dedup_fuzzy_clusters`` pipeline (capped shingles →
    J ≥ 0.5 verify → iterative CC) followed by a per-cluster
    argmax(n_chars DESC, doc_id ASC) — the RefinedWeb-style "keep the
    richest member" policy next to that entry's keep-minimum-id. One
    row per multi-doc cluster: representative, size, and the length
    spread the representative was chosen over.

    Scale notes inherit from dedup_fuzzy_clusters (bounded pair
    fan-out, O(edges) CC rounds); the selection adds one
    cluster-keyed window over the cluster-membership frame."""
    from ..operators.dedup import connected_components, jaccard_pairs

    pairs = jaccard_pairs(
        _shingles(spark, sf, 5), threshold=0.5, max_df=FUZZY_MAX_DF
    )
    edges = pairs.select(F.col("d1").alias("src"), F.col("d2").alias("dst"))
    d = table(spark, sf, "documents")
    nodes = d.select(F.col("doc_id").alias("node"))
    cc = connected_components(edges, nodes)
    labeled = cc.join(
        d.select(F.col("doc_id").alias("node"), "n_chars"), "node"
    )
    w = Window.partitionBy("label").orderBy(
        F.desc("n_chars"), F.asc("node")
    )
    ranked = labeled.select(
        F.col("label").alias("cluster_id"),
        "node",
        "n_chars",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy("label")).alias("sz"),
        F.min("n_chars").over(Window.partitionBy("label")).alias("minc"),
        F.max("n_chars").over(Window.partitionBy("label")).alias("maxc"),
    )
    return (
        ranked.filter((F.col("rk") == 1) & (F.col("sz") > 1))
        .select(
            "cluster_id",
            F.col("sz").alias("cluster_size"),
            F.col("node").alias("rep_doc_id"),
            F.col("n_chars").alias("rep_n_chars"),
            F.col("minc").alias("min_n_chars"),
            F.col("maxc").alias("max_n_chars"),
        )
        .orderBy("cluster_id")
    )


SQL_DEDUP_CLUSTER_REPRESENTATIVES = f"""
WITH RECURSIVE {SQL_SHINGLE_SIZES_CTE},
fdf AS (SELECT shingle, COUNT(*) AS c FROM sh GROUP BY 1),
fcapped AS (
  SELECT sh.doc_id, sh.shingle FROM sh JOIN fdf USING (shingle)
  WHERE fdf.c <= {FUZZY_MAX_DF}
),
p0 AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS inter
  FROM fcapped a JOIN fcapped b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
edges AS (
  SELECT d1 AS a, d2 AS b
  FROM p0
  JOIN sizes sa ON sa.doc_id = d1
  JOIN sizes sb ON sb.doc_id = d2
  WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.5
),
sym AS (SELECT a, b FROM edges UNION SELECT b AS a, a AS b FROM edges),
reach(node, anc) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT r.node, s.b
  FROM reach r JOIN sym s ON s.a = r.anc
),
cc AS (SELECT node, MIN(anc) AS cluster_id FROM reach GROUP BY node),
labeled AS (
  SELECT cc.cluster_id, cc.node, d.n_chars,
    ROW_NUMBER() OVER (PARTITION BY cc.cluster_id
      ORDER BY d.n_chars DESC, cc.node ASC) AS rk,
    COUNT(*) OVER (PARTITION BY cc.cluster_id) AS sz,
    MIN(d.n_chars) OVER (PARTITION BY cc.cluster_id) AS minc,
    MAX(d.n_chars) OVER (PARTITION BY cc.cluster_id) AS maxc
  FROM cc JOIN documents d ON d.doc_id = cc.node
)
SELECT cluster_id, sz AS cluster_size, node AS rep_doc_id,
  n_chars AS rep_n_chars, minc AS min_n_chars, maxc AS max_n_chars
FROM labeled WHERE rk = 1 AND sz > 1
ORDER BY cluster_id
"""


def q_term_burstiness(spark: SparkSession, sf: str) -> DataFrame:
    """Top-{BURSTY_TOP_K} bursty terms (df ≥ {BURSTY_MIN_DF}):
    burstiness = cf/df — corpus frequency over document frequency,
    the Church–Gale within-document repetition rate. Ordering is on
    the UNROUNDED single integer division (bit-exact in both engines)
    with a term tie-break.

    Plan: one tokenization → (doc, term) counts (map-side partial) →
    term-keyed aggregate → TakeOrderedAndProject cut. Everything
    after the first aggregate is vocabulary-sized."""
    d = table(spark, sf, "documents")
    dt = (
        d.select("doc_id", F.explode(_tokens(F.col("text"))).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    agg = dt.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"), F.sum("c").alias("cf")
    )
    return (
        agg.filter(F.col("df") >= BURSTY_MIN_DF)
        .select(
            "term",
            "df",
            "cf",
            (F.col("cf") / F.col("df")).alias("burstiness"),
        )
        .orderBy(F.desc("burstiness"), F.asc("term"))
        .limit(BURSTY_TOP_K)
    )


SQL_TERM_BURSTINESS = f"""
WITH dt AS (
  SELECT doc_id, term, COUNT(*) AS c FROM (
    SELECT doc_id, unnest(list_filter(
      string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS term
    FROM documents
  ) GROUP BY 1, 2
),
agg AS (
  SELECT term, COUNT(*) AS df, CAST(SUM(c) AS BIGINT) AS cf
  FROM dt GROUP BY 1
)
SELECT term, df, cf, cf * 1.0 / df AS burstiness
FROM agg WHERE df >= {BURSTY_MIN_DF}
ORDER BY burstiness DESC, term ASC LIMIT {BURSTY_TOP_K}
"""


def q_events_value_moments(spark: SparkSession, sf: str) -> DataFrame:
    """Per-type skewness g₁ = m₃/m₂^1.5 and excess kurtosis
    g₂ = m₄/m₂² − 3 of the value column, from raw power sums of the
    micro-quantized value (q = round(value·100), exact integer cents
    — skew/kurtosis are scale-invariant so the ×100 cancels): the
    tail profile consulted before trusting any mean/σ-based monitor
    on this stream (g₂ ≫ 0 says MAD, not z-scores).

    Determinism: per-term powers q², q³, q⁴ are identical IEEE
    products of exact-integer-valued doubles in both engines; only
    the summation order differs and ROUND 6 absorbs it (the entropy
    precedent). Zero-variance types yield guarded NULLs. Plan: ONE
    scan, map-side 5-sum partials per type."""
    ev = table(spark, sf, "events")
    q = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").cast(
        "double"
    )
    agg = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q).alias("s1"),
        F.sum(q * q).alias("s2"),
        F.sum(q * q * q).alias("s3"),
        F.sum(q * q * q * q).alias("s4"),
    )
    n = F.col("n").cast("double")
    mu = F.col("s1") / n
    m2 = F.col("s2") / n - mu * mu
    m3 = F.col("s3") / n - 3 * mu * (F.col("s2") / n) + 2 * mu * mu * mu
    m4 = (
        F.col("s4") / n
        - 4 * mu * (F.col("s3") / n)
        + 6 * mu * mu * (F.col("s2") / n)
        - 3 * mu * mu * mu * mu
    )
    return agg.select(
        "event_type",
        F.col("n").alias("n_events"),
        F.round(mu / 100, 6).alias("mean_value"),
        F.round(
            F.when(m2 > 0, m3 / F.pow(m2, F.lit(1.5))), 6
        ).alias("skewness"),
        F.round(
            F.when(m2 > 0, m4 / (m2 * m2) - 3), 6
        ).alias("excess_kurtosis"),
    ).orderBy("event_type")


SQL_EVENTS_VALUE_MOMENTS = """
WITH agg AS (
  SELECT event_type, COUNT(*) AS n,
    SUM(q) AS s1, SUM(q * q) AS s2,
    SUM(q * q * q) AS s3, SUM(q * q * q * q) AS s4
  FROM (
    SELECT event_type,
      CAST(CAST(floor(value * 100 + 0.5) AS BIGINT) AS DOUBLE) AS q
    FROM events
  ) GROUP BY 1
)
SELECT event_type, n AS n_events,
  ROUND((s1 / n) / 100, 6) AS mean_value,
  ROUND(CASE WHEN s2 / n - (s1 / n) * (s1 / n) > 0 THEN
    (s3 / n - 3 * (s1 / n) * (s2 / n) + 2 * (s1 / n) * (s1 / n) * (s1 / n))
    / pow(s2 / n - (s1 / n) * (s1 / n), 1.5) END, 6) AS skewness,
  ROUND(CASE WHEN s2 / n - (s1 / n) * (s1 / n) > 0 THEN
    (s4 / n - 4 * (s1 / n) * (s3 / n)
     + 6 * (s1 / n) * (s1 / n) * (s2 / n)
     - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n))
    / ((s2 / n - (s1 / n) * (s1 / n)) * (s2 / n - (s1 / n) * (s1 / n))) - 3
    END, 6) AS excess_kurtosis
FROM agg ORDER BY event_type
"""


QUERIES: dict[str, Query] = {
    "pareto_skyline": Query(q_pareto_skyline, SQL_PARETO_SKYLINE),
    "dedup_cluster_representatives": Query(
        q_dedup_cluster_representatives, SQL_DEDUP_CLUSTER_REPRESENTATIVES
    ),
    "term_burstiness": Query(q_term_burstiness, SQL_TERM_BURSTINESS),
    "events_value_moments": Query(
        q_events_value_moments, SQL_EVENTS_VALUE_MOMENTS
    ),
}
