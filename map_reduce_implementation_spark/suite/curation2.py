"""Curation/analytics depth, round 3 additions (EXT): novelty scoring,
asymmetric containment, vocabulary coverage, RFM segmentation.

Each fills a real gap in the LLM-pipeline/warehouse surface rather than
re-shading an existing entry:

- ``text_novelty_score`` — per-document fraction of shingles never seen
  in any EARLIER document (the incremental-crawl novelty gate: ingest
  order decides what counts as "new").
- ``dedup_containment`` — asymmetric overlap |A∩B| / |A| (catches a
  short doc quoted inside a long one, which symmetric Jaccard dilutes
  below threshold).
- ``token_vocab_coverage`` — cumulative corpus coverage of the top-k
  vocabulary (the tokenizer-design curve: how many types cover 90% of
  tokens).
- ``customer_rfm_segments`` — classic recency/frequency/monetary
  quartile scoring (three ntiles over one aggregate, concatenated
  segment label).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import table
from .base import Query, dec
from .dedup import _shingles


def q_text_novelty_score(spark: SparkSession, sf: str) -> DataFrame:
    """Novelty = fraction of a doc's distinct shingles whose FIRST
    occurrence (min doc_id) is this doc. Plan: one shingle-keyed
    aggregate for first-owners (map-side combinable MIN), broadcast-free
    re-join on the shingle stream, then a doc-keyed mean. Two shuffles
    total, both on uniform hash keys; no windows over raw data. At
    100 TB the first-owner table is the dedup state a crawler keeps —
    here derived in-plan."""
    sh = _shingles(spark, sf, 5)
    first = sh.groupBy("shingle").agg(F.min("doc_id").alias("first_doc"))
    return (
        sh.join(first, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.round(
                F.avg(
                    F.when(F.col("first_doc") == F.col("doc_id"), 1.0).otherwise(0.0)
                ),
                9,
            ).alias("novelty"),
        )
    )


SQL_TEXT_NOVELTY_SCORE = """
WITH toks AS (
  SELECT doc_id,
    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS ts
  FROM documents
),
sh AS (
  SELECT DISTINCT doc_id,
    ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] || ' ' || ts[i+3] || ' ' || ts[i+4] AS shingle
  FROM toks, range(1, 100000) r(i)
  WHERE i + 4 <= len(ts)
),
first AS (SELECT shingle, MIN(doc_id) AS first_doc FROM sh GROUP BY 1)
SELECT sh.doc_id, COUNT(*) AS n_shingles,
  ROUND(AVG(CASE WHEN f.first_doc = sh.doc_id THEN 1.0 ELSE 0.0 END), 9) AS novelty
FROM sh JOIN first f USING (shingle)
GROUP BY sh.doc_id
"""


def q_dedup_containment(spark: SparkSession, sf: str) -> DataFrame:
    """Asymmetric containment |A∩B| / |A| ≥ 0.8 over hashed shingle
    sets (d1 < d2 both directions reported via contained_doc). Same
    posting-list shape as jaccard — intersections come from the
    shingle-keyed self-join, set sizes from one aggregate — but the
    denominator is per-SIDE, so a short quoted doc scores high even
    when symmetric Jaccard stays low. The df≤2 cap bounds per-shingle
    pair fan-out exactly like the capped-jaccard entry."""
    sh = _shingles(spark, sf, 5)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    df_counts = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("c"))
    capped = sh.join(
        df_counts.filter(F.col("c") == 2).select("shingle"), "shingle"
    )
    inter = (
        capped.alias("a")
        .join(
            capped.alias("b"),
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2")
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("d1"), F.col("n").alias("n1"))
    sb = sizes.select(F.col("doc_id").alias("d2"), F.col("n").alias("n2"))
    both = inter.join(sa, "d1").join(sb, "d2")
    # containment in the SMALLER set: 10*inter >= 8*min(n1,n2), exact ints
    return (
        both.filter(
            F.col("inter") * 10 >= F.least("n1", "n2") * 8
        )
        .select(
            "d1",
            "d2",
            F.when(F.col("n1") <= F.col("n2"), F.col("d1"))
            .otherwise(F.col("d2"))
            .alias("contained_doc"),
            F.round(
                F.col("inter") / F.least("n1", "n2").cast("double"), 9
            ).alias("containment"),
        )
    )


SQL_DEDUP_CONTAINMENT = """
WITH toks AS (
  SELECT doc_id,
    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS ts
  FROM documents
),
sh AS (
  SELECT DISTINCT doc_id,
    ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] || ' ' || ts[i+3] || ' ' || ts[i+4] AS shingle
  FROM toks, range(1, 100000) r(i)
  WHERE i + 4 <= len(ts)
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
df AS (SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) = 2),
capped AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN df USING (shingle)),
inter AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS inter
  FROM capped a JOIN capped b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT i.d1, i.d2,
  CASE WHEN sa.n <= sb.n THEN i.d1 ELSE i.d2 END AS contained_doc,
  ROUND(i.inter / CAST(LEAST(sa.n, sb.n) AS DOUBLE), 9) AS containment
FROM inter i
JOIN sizes sa ON sa.doc_id = i.d1
JOIN sizes sb ON sb.doc_id = i.d2
WHERE i.inter * 10 >= LEAST(sa.n, sb.n) * 8
"""


def q_token_vocab_coverage(spark: SparkSession, sf: str) -> DataFrame:
    """Tokenizer-design curve: rank the vocabulary by frequency and
    report, at powers-of-two vocab sizes, the cumulative fraction of
    all token OCCURRENCES covered. The heavy stream collapses to one
    (token → count) aggregate; ranking and the running sum are windows
    over the aggregated vocab only (|V| rows, never the corpus), and
    the output is ~10 rows. Rank ties broken by token text for a
    deterministic curve."""
    from ..functions import tokens

    d = table(spark, sf, "documents")
    tok = d.select(F.explode(tokens("text")).alias("tok"))
    vocab = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    w = Window.orderBy(F.desc("c"), F.asc("tok"))
    ranked = vocab.select(
        "tok",
        "c",
        F.row_number().over(w).alias("rk"),
        F.sum("c").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("cum"),
    )
    total = vocab.agg(F.sum("c").alias("total"))
    probes = [2**k for k in range(0, 14)]  # 1 .. 8192
    return (
        ranked.filter(F.col("rk").isin(probes))
        .crossJoin(F.broadcast(total))
        .select(
            F.col("rk").alias("vocab_size"),
            F.round(F.col("cum") / F.col("total").cast("double"), 9).alias(
                "coverage"
            ),
        )
    )


SQL_TOKEN_VOCAB_COVERAGE = """
WITH tok AS (
  SELECT unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS tok
  FROM documents
),
vocab AS (SELECT tok, COUNT(*) AS c FROM tok GROUP BY 1),
ranked AS (
  SELECT tok, c,
    ROW_NUMBER() OVER (ORDER BY c DESC, tok ASC) AS rk,
    SUM(c) OVER (ORDER BY c DESC, tok ASC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM vocab
)
SELECT CAST(rk AS INTEGER) AS vocab_size,
  ROUND(cum / CAST((SELECT SUM(c) FROM vocab) AS DOUBLE), 9) AS coverage
FROM ranked
WHERE rk IN (1, 2, 4, 8, 16, 32, 64, 128, 256, 512, 1024, 2048, 4096, 8192)
"""


def q_customer_rfm_segments(spark: SparkSession, sf: str) -> DataFrame:
    """RFM segmentation: per customer, recency (latest order date),
    frequency (order count), monetary (decimal-summed total), each
    quartiled by ntile, concatenated into a 3-digit segment. One
    custkey aggregate; the three ntile windows run over the aggregated
    customer rows (|customers|, not |orders|) and share no raw-data
    sort. Ties broken by custkey for deterministic quartiles."""
    o = table(spark, sf, "orders")
    agg = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(dec("o_totalprice")).alias("monetary_dec"),
    )
    wr = Window.orderBy(F.desc("last_order"), F.asc("o_custkey"))
    wf = Window.orderBy(F.desc("frequency"), F.asc("o_custkey"))
    wm = Window.orderBy(F.desc("monetary_dec"), F.asc("o_custkey"))
    return agg.select(
        F.col("o_custkey").alias("custkey"),
        F.ntile(4).over(wr).alias("r_quartile"),
        F.ntile(4).over(wf).alias("f_quartile"),
        F.ntile(4).over(wm).alias("m_quartile"),
        F.concat_ws(
            "",
            F.ntile(4).over(wr),
            F.ntile(4).over(wf),
            F.ntile(4).over(wm),
        ).alias("segment"),
        F.round(F.col("monetary_dec"), 2).cast("double").alias("monetary"),
    )


SQL_CUSTOMER_RFM_SEGMENTS = """
WITH agg AS (
  SELECT o_custkey,
    MAX(o_orderdate) AS last_order,
    COUNT(*) AS frequency,
    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS monetary_dec
  FROM orders GROUP BY 1
),
q AS (
  SELECT o_custkey,
    NTILE(4) OVER (ORDER BY last_order DESC, o_custkey ASC) AS r_quartile,
    NTILE(4) OVER (ORDER BY frequency DESC, o_custkey ASC) AS f_quartile,
    NTILE(4) OVER (ORDER BY monetary_dec DESC, o_custkey ASC) AS m_quartile,
    monetary_dec
  FROM agg
)
SELECT o_custkey AS custkey,
  CAST(r_quartile AS INTEGER) AS r_quartile,
  CAST(f_quartile AS INTEGER) AS f_quartile,
  CAST(m_quartile AS INTEGER) AS m_quartile,
  CAST(r_quartile AS VARCHAR) || CAST(f_quartile AS VARCHAR) || CAST(m_quartile AS VARCHAR) AS segment,
  CAST(ROUND(monetary_dec, 2) AS DOUBLE) AS monetary
FROM q
"""


def q_dedup_repeated_substrings(spark: SparkSession, sf: str) -> DataFrame:
    """Exact repeated-substring detection (the span-level dedup of
    Lee et al. 2022, "Deduplicating Training Data Makes Language Models
    Better"): every 10-token window is hashed; a window is REPEATED if
    its hash occurs more than once in the whole corpus. Per doc:
    window count, repeated count, repeated fraction — the signal a
    pipeline uses to CUT spans rather than drop documents.

    Plan: position-preserving window hashes (same bound-tokens trick as
    ``_shingles`` — no n-gram strings materialized, positions kept), one
    uniform hash-keyed aggregate for global counts, join back, one
    doc-keyed aggregate. Two shuffles, both on uniform keys; the window
    stream is longs, never text. Scales like the shingle pipeline."""
    from ..functions import tokens

    n = 10
    d = table(spark, sf, "documents")
    bound = d.select(
        "doc_id",
        F.transform(tokens("text"), lambda t: F.xxhash64(t)).alias("hts"),
    )
    wins = bound.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.lit(0), F.size("hts") - (n - 1))),
                lambda i: F.xxhash64(F.slice("hts", i, n)),
            )
        ).alias("pos", "whash"),
    )
    counts = wins.groupBy("whash").agg(F.count(F.lit(1)).alias("c"))
    return (
        wins.join(counts, "whash")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.sum(F.when(F.col("c") > 1, 1).otherwise(0)).alias("n_repeated"),
            F.round(
                F.avg(F.when(F.col("c") > 1, 1.0).otherwise(0.0)), 9
            ).alias("repeated_frac"),
        )
    )


SQL_DEDUP_REPEATED_SUBSTRINGS = """
WITH toks AS (
  SELECT doc_id,
    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS ts
  FROM documents
),
w AS (
  SELECT doc_id, i AS pos,
    ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] || ' ' || ts[i+3] || ' ' || ts[i+4]
      || ' ' || ts[i+5] || ' ' || ts[i+6] || ' ' || ts[i+7] || ' ' || ts[i+8]
      || ' ' || ts[i+9] AS win
  FROM toks, range(1, 100000) r(i)
  WHERE i + 9 <= len(ts)
),
counts AS (SELECT win, COUNT(*) AS c FROM w GROUP BY 1)
SELECT w.doc_id, COUNT(*) AS n_windows,
  CAST(SUM(CASE WHEN counts.c > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_repeated,
  ROUND(AVG(CASE WHEN counts.c > 1 THEN 1.0 ELSE 0.0 END), 9) AS repeated_frac
FROM w JOIN counts USING (win)
GROUP BY w.doc_id
"""


QUERIES: dict[str, Query] = {
    "text_novelty_score": Query(q_text_novelty_score, SQL_TEXT_NOVELTY_SCORE),
    "dedup_repeated_substrings": Query(
        q_dedup_repeated_substrings, SQL_DEDUP_REPEATED_SUBSTRINGS
    ),
    "dedup_containment": Query(q_dedup_containment, SQL_DEDUP_CONTAINMENT),
    "token_vocab_coverage": Query(
        q_token_vocab_coverage, SQL_TOKEN_VOCAB_COVERAGE
    ),
    "customer_rfm_segments": Query(
        q_customer_rfm_segments, SQL_CUSTOMER_RFM_SEGMENTS
    ),
}
