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
    # Round-12 optimization (guide §2.4): the shingle stream feeds the
    # first-owner aggregate AND the join-back — materialize it once
    # instead of tokenizing the corpus per reference
    sh = _shingles(spark, sf, 5).localCheckpoint(eager=True)
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
    """CAPPED asymmetric containment over hashed shingle sets (d1 < d2
    both directions reported via contained_doc). Same posting-list
    shape as jaccard — intersections come from the shingle-keyed
    self-join, set sizes from one aggregate — but the denominator is
    per-SIDE, so a short quoted doc scores high even when symmetric
    Jaccard stays low.

    Semantics, stated honestly: the df <= max_df cap (same shape as
    ``operators.dedup.jaccard_pairs``' ``max_df``) drops shingles whose
    corpus document-frequency exceeds the cap BEFORE the self-join, so
    the numerator — and therefore the reported containment — is a
    LOWER BOUND of true |A∩B|/min(|A|,|B|): overlap carried entirely
    by ultra-common (df > max_df) shingles is not seen. That is the
    price that bounds per-shingle pair fan-out at max_df·(max_df-1)/2
    and keeps the join linear-ish at 100 TB; boilerplate-only overlap
    is usually unwanted in a near-dup signal anyway. (Round 3 shipped
    df == 2 exactly, a much looser bound, while the docstring claimed
    true containment — both sides now compute df <= 20.)"""
    max_df = 20
    # Round-12 optimization (guide §2.4): the shingle stream feeds four
    # plan references (sizes, df_counts, both self-join sides) and the
    # size frame two — materialize each once instead of re-tokenizing
    # the corpus per consumer (12 parquet scans → 0 rescans in the
    # captured plan; the jaccard_pairs operator got the same fix)
    sh = _shingles(spark, sf, 5).localCheckpoint(eager=True)
    sizes = (
        sh.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    df_counts = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("c"))
    capped = sh.join(
        df_counts.filter(F.col("c") <= max_df).select("shingle"), "shingle"
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
df AS (SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= 20),
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
    (token → count) aggregate; the probes only ever need rank <= 8192,
    so the ranked prefix is taken with TakeOrderedAndProject (top-8192
    per partition, merged on the driver-side reduce — never a global
    sort) BEFORE the window. The row_number/running-sum window then
    sees <= 8192 rows regardless of vocabulary size; the denominator
    comes from the separate full aggregate. Rank ties broken by token
    text for a deterministic curve."""
    from ..functions import tokens

    max_probe = 8192
    d = table(spark, sf, "documents")
    tok = d.select(F.explode(tokens("text")).alias("tok"))
    vocab = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    top = vocab.orderBy(F.desc("c"), F.asc("tok")).limit(max_probe)
    w = Window.orderBy(F.desc("c"), F.asc("tok"))
    ranked = top.select(
        "tok",
        "c",
        F.row_number().over(w).alias("rk"),
        F.sum("c").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("cum"),
    )
    total = vocab.agg(F.sum("c").alias("total"))
    probes = [2**k for k in range(0, 14)]  # 1 .. 8192 == max_probe
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
    quartiled against exact percentile CUT-POINTS, concatenated into a
    3-digit segment.

    Quartiles are VALUE-based (standard RFM formulation): bucket b
    means the value sits strictly above the (4-b)/4 percentile, so
    tied values always share a bucket. Round 3 used three ntile
    windows instead — rank-based and tie-splitting, but each one a
    global unpartitioned sort over ALL customers, a single-task
    bottleneck at 100 TB. Here the plan is: one custkey aggregate, one
    1-row percentile aggregate (partial per-partition value maps, no
    row sort), broadcast the cut-points, bucket with CASE — map-side
    only after the custkey shuffle. At real scale swap `percentile`
    for `approx_percentile` (same plan shape); the exact form is kept
    because the DuckDB oracle reproduces its interpolation bit-for-bit
    (quantile_cont, (n-1)*q indexing — both engines).

    Recency percentiles run over epoch days (dates aren't numeric for
    interpolation); monetary over cents-exact doubles."""
    o = table(spark, sf, "orders")
    agg = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(dec("o_totalprice")).alias("monetary_dec"),
    ).select(
        "o_custkey",
        "last_order",
        "frequency",
        F.unix_date(F.col("last_order").cast("date")).alias("rdays"),
        F.col("monetary_dec").cast("double").alias("monetary_d"),
        "monetary_dec",
    )
    qs = F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75))
    cuts = agg.agg(
        F.percentile("rdays", qs).alias("rq"),
        F.percentile("frequency", qs).alias("fq"),
        F.percentile("monetary_d", qs).alias("mq"),
    )

    def bucket(col: str, cut: str):
        # DESC quartiles: above p75 → 1, above p50 → 2, above p25 → 3
        c = F.col(col).cast("double")
        return (
            F.when(c > F.col(cut)[2], 1)
            .when(c > F.col(cut)[1], 2)
            .when(c > F.col(cut)[0], 3)
            .otherwise(4)
        )

    return agg.crossJoin(F.broadcast(cuts)).select(
        F.col("o_custkey").alias("custkey"),
        bucket("rdays", "rq").alias("r_quartile"),
        bucket("frequency", "fq").alias("f_quartile"),
        bucket("monetary_d", "mq").alias("m_quartile"),
        F.concat_ws(
            "",
            bucket("rdays", "rq"),
            bucket("frequency", "fq"),
            bucket("monetary_d", "mq"),
        ).alias("segment"),
        F.round(F.col("monetary_dec"), 2).cast("double").alias("monetary"),
    )


SQL_CUSTOMER_RFM_SEGMENTS = """
WITH agg AS (
  SELECT o_custkey,
    MAX(o_orderdate) AS last_order,
    COUNT(*) AS frequency,
    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS monetary_dec,
    CAST(CAST(MAX(o_orderdate) AS DATE) - DATE '1970-01-01' AS BIGINT) AS rdays,
    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS monetary_d
  FROM orders GROUP BY o_custkey
),
cuts AS (
  SELECT quantile_cont(rdays, [0.25, 0.5, 0.75]) AS rq,
    quantile_cont(frequency, [0.25, 0.5, 0.75]) AS fq,
    quantile_cont(monetary_d, [0.25, 0.5, 0.75]) AS mq
  FROM agg
),
b AS (
  SELECT a.*,
    CASE WHEN a.rdays > c.rq[3] THEN 1 WHEN a.rdays > c.rq[2] THEN 2
         WHEN a.rdays > c.rq[1] THEN 3 ELSE 4 END AS r_quartile,
    CASE WHEN a.frequency > c.fq[3] THEN 1 WHEN a.frequency > c.fq[2] THEN 2
         WHEN a.frequency > c.fq[1] THEN 3 ELSE 4 END AS f_quartile,
    CASE WHEN a.monetary_d > c.mq[3] THEN 1 WHEN a.monetary_d > c.mq[2] THEN 2
         WHEN a.monetary_d > c.mq[1] THEN 3 ELSE 4 END AS m_quartile
  FROM agg a, cuts c
)
SELECT o_custkey AS custkey,
  CAST(r_quartile AS INTEGER) AS r_quartile,
  CAST(f_quartile AS INTEGER) AS f_quartile,
  CAST(m_quartile AS INTEGER) AS m_quartile,
  CAST(r_quartile AS VARCHAR) || CAST(f_quartile AS VARCHAR) || CAST(m_quartile AS VARCHAR) AS segment,
  CAST(ROUND(monetary_dec, 2) AS DOUBLE) AS monetary
FROM b
"""


def window_hash_frames(
    spark: SparkSession, sf: str, n: int = 10
) -> tuple[DataFrame, DataFrame]:
    """Shared span-dedup plumbing: (bound, wins) where ``bound`` is
    (doc_id, hts: per-token xxhash64 array) and ``wins`` is the
    position-preserving hash of every ``n``-token window
    (doc_id, pos, whash). Used by both the detection query below and
    ``curation4.q_dedup_span_removal`` — ONE implementation so window
    size, tokenization and the short-doc guard cannot drift apart.

    Short-doc guard: ``sequence(1, 0)`` is DESCENDING in Spark, so a
    doc with < n tokens would evaluate ``slice(hts, 0, n)`` and throw —
    when/otherwise makes short docs yield zero windows instead."""
    from ..functions import tokens

    d = table(spark, sf, "documents")
    # Round-12 optimization (guide §2.4): both consumers reference
    # ``wins`` twice (global window counts + join-back) and
    # span_removal additionally reads ``bound`` — lazily that replayed
    # the corpus tokenize + window-hash build per reference (10 scans
    # in the before-plan). Materialize each once: one tokenize pass,
    # one in-memory window build, every downstream branch reads
    # materialized longs.
    bound = d.select(
        "doc_id",
        F.transform(tokens("text"), lambda t: F.xxhash64(t)).alias("hts"),
    ).localCheckpoint(eager=True)
    wins = bound.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.when(
                    F.size("hts") >= n,
                    F.sequence(F.lit(1), F.size("hts") - (n - 1)),
                ).otherwise(F.array().cast("array<int>")),
                lambda i: F.xxhash64(F.slice("hts", i, n)),
            )
        ).alias("pos", "whash"),
    ).localCheckpoint(eager=True)
    return bound, wins


# the matching DuckDB CTE pair (toks + w) for n=10 windows — composed
# into both span-dedup oracles so the SQL twin can't drift either
SQL_TOKS_WINDOWS_CTE = """
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
)"""


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
    _, wins = window_hash_frames(spark, sf, 10)
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


SQL_DEDUP_REPEATED_SUBSTRINGS = SQL_TOKS_WINDOWS_CTE + """,
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
