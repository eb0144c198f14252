"""Training-data curation operators beyond the basic text suite —
the jobs a 100 TB LLM data pipeline actually schedules between crawl
and tokenizer: benchmark decontamination, PII redaction, per-source
quota sampling (domain mixing), sequence packing, TF-IDF term salience,
and the deterministic global training-order shuffle.

Each query is a declarative single plan with a bit-exact DuckDB oracle;
scale notes live on each docstring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import tokens
from ..sources import table
from .base import Query


def q_decontaminate(spark: SparkSession, sf: str) -> DataFrame:
    """Benchmark decontamination: flag training docs sharing ≥1 distinct
    5-gram shingle with the eval set (here: doc_id % 10 == 0 stands in
    for a benchmark suite). Output = flagged doc, overlap shingle count,
    and overlap ratio vs the doc's own shingle count.

    100 TB shape: eval sets are tiny (benchmarks are MBs) → the distinct
    eval-shingle set is **broadcast**, so the training side never
    shuffles; the plan is scan → hash-join(broadcast) → partial agg.
    Shingles are xxhash64-hashed 8-byte keys (same all-numeric trick as
    the dedup suite — no n-gram strings cross the exchange)."""
    from .dedup import _shingles

    # Round-12 optimization (guide §2.4): the hashed shingle stream
    # feeds three consumers (eval set, per-doc sizes, hit counts) — each
    # lazy reference replayed the corpus tokenize+shingle pass (3
    # documents scans → 1); the materialized rows are 2 longs each
    sh = _shingles(spark, sf, 5).localCheckpoint(eager=True)
    ev = (
        sh.filter(F.col("doc_id") % 10 == 0)
        .select("shingle")
        .distinct()
    )
    train = sh.filter(F.col("doc_id") % 10 != 0)
    sizes = train.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    hits = (
        train.join(F.broadcast(ev), "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_overlap"))
    )
    return (
        hits.join(sizes, "doc_id")
        .select(
            "doc_id",
            "n_overlap",
            "n_shingles",
            F.round(F.col("n_overlap") / F.col("n_shingles"), 6).alias(
                "overlap_ratio"
            ),
        )
    )


SQL_DECONTAMINATE = """
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
ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 10 = 0),
train AS (SELECT * FROM sh WHERE doc_id % 10 <> 0),
sizes AS (SELECT doc_id, COUNT(*) AS n_shingles FROM train GROUP BY 1),
hits AS (
  SELECT t.doc_id, COUNT(*) AS n_overlap
  FROM train t JOIN ev ON t.shingle = ev.shingle
  GROUP BY 1
)
SELECT h.doc_id, h.n_overlap, s.n_shingles,
       ROUND(h.n_overlap * 1.0 / s.n_shingles, 6) AS overlap_ratio
FROM hits h JOIN sizes s ON h.doc_id = s.doc_id
"""


# Deterministic PII injection (the synthetic corpus has none) so the
# redaction path has real work: same expression on both engines.
_PII_EMAIL = "[a-z0-9._]+@[a-z0-9.-]+\\.[a-z]+"
_PII_PHONE = "555-[0-9]{4}"
_PII_IP = "[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+"


def q_pii_redact(spark: SparkSession, sf: str) -> DataFrame:
    """PII redaction: count and mask emails / phone numbers / IPv4s with
    typed placeholder tokens. All JVM ``regexp_replace``/``regexp_count``
    (RE2-compatible patterns, no lookarounds — portable to the DuckDB
    oracle). One scan, zero shuffles — embarrassingly parallel at any
    scale; output carries md5(redacted) so the oracle proves the
    *transformed text*, not just the counts."""
    d = table(spark, sf, "documents")
    aug = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 7 == 0,
                F.concat(F.lit(" contact user"), F.col("doc_id").cast("string"), F.lit("@example.com")),
            )
            .when(F.col("doc_id") % 7 == 1, F.lit(" call 555-0142 now"))
            .when(F.col("doc_id") % 7 == 2, F.lit(" from host 10.1.2.3 port 80"))
            .otherwise(F.lit("")),
        ).alias("t"),
    )
    red = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("t"), _PII_EMAIL, "<EMAIL>"),
            _PII_IP,
            "<IP>",
        ),
        _PII_PHONE,
        "<PHONE>",
    )
    return aug.select(
        "doc_id",
        F.regexp_count(F.col("t"), F.lit(_PII_EMAIL)).alias("n_emails"),
        F.regexp_count(F.col("t"), F.lit(_PII_PHONE)).alias("n_phones"),
        F.regexp_count(F.col("t"), F.lit(_PII_IP)).alias("n_ips"),
        F.md5(red).alias("redacted_md5"),
    )


SQL_PII_REDACT = """
WITH aug AS (
  SELECT doc_id,
    text || CASE
      WHEN doc_id % 7 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
      WHEN doc_id % 7 = 1 THEN ' call 555-0142 now'
      WHEN doc_id % 7 = 2 THEN ' from host 10.1.2.3 port 80'
      ELSE '' END AS t
  FROM documents
)
SELECT doc_id,
  CAST(len(regexp_extract_all(t, '[a-z0-9._]+@[a-z0-9.-]+\\.[a-z]+')) AS INTEGER) AS n_emails,
  CAST(len(regexp_extract_all(t, '555-[0-9]{4}')) AS INTEGER) AS n_phones,
  CAST(len(regexp_extract_all(t, '[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+')) AS INTEGER) AS n_ips,
  md5(regexp_replace(
        regexp_replace(
          regexp_replace(t, '[a-z0-9._]+@[a-z0-9.-]+\\.[a-z]+', '<EMAIL>', 'g'),
          '[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+', '<IP>', 'g'),
        '555-[0-9]{4}', '<PHONE>', 'g')) AS redacted_md5
FROM aug
"""


def q_quota_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Domain mixing / per-source quota sampling: keep at most 5 docs
    per (lang, source) cell, chosen by a deterministic md5 order (so the
    sample is stable across runs and engines), doc_id as tie-break.
    One shuffle on the quota key; per-group state is a streaming top-5
    (rank + filter → Spark's WindowExec with partial sort). At 100 TB
    this is the mixture-weights enforcement pass before training."""
    d = table(spark, sf, "documents")
    w = Window.partitionBy("lang", "source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("doc_id", "lang", "source", F.col("rn").alias("quota_rank"))
    )


SQL_QUOTA_SAMPLE = """
SELECT doc_id, lang, source, CAST(rn AS INTEGER) AS quota_rank
FROM (
  SELECT doc_id, lang, source,
    ROW_NUMBER() OVER (
      PARTITION BY lang, source
      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM documents
) WHERE rn <= 5
"""


def q_sequence_pack(spark: SparkSession, sf: str) -> DataFrame:
    """Sequence packing (concat-and-chunk, GPT-style): within each lang
    stream, docs in doc_id order are concatenated and cut into
    2048-token packs; each doc reports its pack id and offset. The
    running total is one window cumsum per lang — a single shuffle,
    no sequential driver loop, and the semantics are exactly the
    deterministic packing a dataloader replays. Docs crossing a
    boundary span two packs (standard concat-and-chunk)."""
    d = table(spark, sf, "documents")
    t = d.select("doc_id", "lang", F.size(tokens(F.col("text"))).alias("n_tokens"))
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return t.select(
        "doc_id",
        "lang",
        "n_tokens",
        (cum / 2048).cast("long").alias("pack_id"),
        (cum % 2048).cast("long").alias("pack_offset"),
    )


SQL_SEQUENCE_PACK = """
WITH t AS (
  SELECT doc_id, lang,
    len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens,
    COALESCE(SUM(n_tokens) OVER (
      PARTITION BY lang ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
  FROM t
)
SELECT doc_id, lang, n_tokens,
  CAST(cum // 2048 AS BIGINT) AS pack_id,
  CAST(cum % 2048 AS BIGINT) AS pack_offset
FROM c
"""


def q_tfidf_top_terms(spark: SparkSession, sf: str) -> DataFrame:
    """Per-doc top-3 salient terms by tf·idf (idf = ln(N/df)). Two
    shuffles — (doc,term) term frequencies, then term document
    frequencies joined back — plus a per-doc top-k window. The df side
    is a small dictionary (vocab-sized) → broadcast back to the tf
    stream at scale. Deterministic tie-break (score desc, term asc)."""
    d = table(spark, sf, "documents")
    n_docs = d.count()  # scalar, one tiny job — the oracle inlines COUNT(*)
    # Round-12 optimization (guide §2.4): tf feeds two consumers (the
    # df dictionary aggregate AND the scored join) — lazily it was
    # replayed per consumer, re-tokenizing the corpus twice.
    # Materialize the (doc, term) cells once; everything downstream is
    # cell-sized, and at 100 TB the second corpus pass disappears.
    tf = (
        d.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=True)
    )
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = tf.join(F.broadcast(df_), "term").select(
        "doc_id",
        "term",
        (F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df"))).alias("score"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select(
            "doc_id",
            "term",
            F.round("score", 6).alias("tfidf"),
            F.col("rk").alias("term_rank"),
        )
    )


SQL_TFIDF_TOP_TERMS = """
WITH tok AS (
  SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term,
    tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df) AS score
  FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
)
SELECT doc_id, term, ROUND(score, 6) AS tfidf, CAST(rk AS INTEGER) AS term_rank
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY doc_id ORDER BY score DESC, term ASC) AS rk
  FROM scored
) WHERE rk <= 3
"""


def q_train_shuffle(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic global training-order shuffle: rank docs by a
    Knuth multiplicative hash of doc_id (engine-portable integer
    arithmetic — exact in both engines, reproducible across epochs by
    changing the seed constant).

    A naive ``row_number() OVER (ORDER BY key)`` funnels every row into
    ONE partition (Spark warns: "Moving all data to a single
    partition") — the classic global-ranking scale-killer. This plan
    does two-phase distributed ranking instead: the key space is cut
    into 256 contiguous range buckets; ranks are computed per-bucket in
    parallel, then offset by a prefix sum over the (tiny, 256-row)
    bucket counts broadcast back. One data shuffle, no single-partition
    stage; the oracle is still the simple global ROW_NUMBER."""
    d = table(spark, sf, "documents")
    key = (F.col("doc_id") * F.lit(2654435761)) % F.lit(4294967296)
    step = 4294967296 // 256
    keyed = d.select(
        "doc_id",
        key.alias("shuffle_key"),
        (key / F.lit(step)).cast("long").alias("bucket"),
    )
    wb = Window.partitionBy("bucket").orderBy("shuffle_key", "doc_id")
    intra = keyed.withColumn("intra", F.row_number().over(wb))
    counts = keyed.groupBy("bucket").agg(F.count("*").alias("n"))
    wp = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    prefix = counts.select(
        "bucket", F.coalesce(F.sum("n").over(wp), F.lit(0)).alias("offset")
    )
    return intra.join(F.broadcast(prefix), "bucket").select(
        "doc_id",
        "shuffle_key",
        (F.col("offset") + F.col("intra")).cast("int").alias("shuffle_rank"),
    )


SQL_TRAIN_SHUFFLE = """
SELECT doc_id,
  (doc_id * 2654435761) % 4294967296 AS shuffle_key,
  CAST(ROW_NUMBER() OVER (
    ORDER BY (doc_id * 2654435761) % 4294967296, doc_id) AS INTEGER) AS shuffle_rank
FROM documents
"""


def q_quality_outliers(spark: SparkSession, sf: str) -> DataFrame:
    """Robust per-group outlier detection (median/MAD z-score, |z| > 2.5)
    on the heavy-tailed ``events.value`` — the anomaly-flagging pass
    that catches corrupt measurements without assuming normality (a
    mean/stddev z-score would be dragged by the tail it's hunting).

    Two grouped exact-median passes (event_type-keyed shuffles reducing
    to one row per type) + **broadcast** joins of the tiny stats table
    back to the scan — the event stream itself is never shuffled on a
    wide key, so the plan is scan-dominated at any scale."""
    ev = table(spark, sf, "events")
    med = ev.groupBy("event_type").agg(F.median("value").alias("med"))
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_id", "event_type", "value", "med",
        F.abs(F.col("value") - F.col("med")).alias("adev"),
    )
    mad = dev.groupBy("event_type").agg(F.median("adev").alias("mad"))
    z = F.round(
        (F.col("value") - F.col("med")) / (F.lit(1.4826) * F.col("mad")), 6
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .filter(F.col("mad") > 0)
        .select("event_id", "event_type", "value", z.alias("robust_z"))
        .filter(F.abs(F.col("robust_z")) > 2.5)
    )


SQL_QUALITY_OUTLIERS = """
WITH med AS (SELECT event_type, median(value) AS med FROM events GROUP BY event_type),
dev AS (
  SELECT e.event_id, e.event_type, e.value, m.med, abs(e.value - m.med) AS adev
  FROM events e JOIN med m ON e.event_type = m.event_type
),
mad AS (SELECT event_type, median(adev) AS mad FROM dev GROUP BY event_type)
SELECT d.event_id, d.event_type, d.value,
  ROUND((d.value - d.med) / (1.4826 * m.mad), 6) AS robust_z
FROM dev d JOIN mad m ON d.event_type = m.event_type
WHERE m.mad > 0 AND abs(ROUND((d.value - d.med) / (1.4826 * m.mad), 6)) > 2.5
"""


def q_domain_mix_report(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus-mixture report: per (lang, source) doc count, char volume,
    corpus share, and the cumulative share within each lang ordered by
    descending count (the "what covers 90% of my German data" view that
    drives mixture reweighting). One grouped agg (the report is
    cell-count-sized — tiny) + one window over it; the corpus total
    rides along as a window over an empty frame of the AGGREGATED rows,
    never a second scan of the raw data."""
    d = table(spark, sf, "documents")
    cells = d.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"), F.sum("n_chars").alias("n_chars_total")
    )
    w_all = Window.partitionBy()
    w_cum = (
        Window.partitionBy("lang")
        .orderBy(F.desc("n_docs"), F.asc("source"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return cells.select(
        "lang",
        "source",
        "n_docs",
        "n_chars_total",
        F.round(F.col("n_docs") / F.sum("n_docs").over(w_all), 6).alias(
            "corpus_share"
        ),
        F.round(
            F.sum("n_docs").over(w_cum) / F.sum("n_docs").over(Window.partitionBy("lang")),
            6,
        ).alias("lang_cum_share"),
    )


SQL_DOMAIN_MIX_REPORT = """
WITH cells AS (
  SELECT lang, source, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS n_chars_total
  FROM documents GROUP BY lang, source
)
SELECT lang, source, n_docs, n_chars_total,
  ROUND(n_docs * 1.0 / SUM(n_docs) OVER (), 6) AS corpus_share,
  ROUND(
    SUM(n_docs) OVER (
      PARTITION BY lang ORDER BY n_docs DESC, source ASC
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    * 1.0 / SUM(n_docs) OVER (PARTITION BY lang), 6) AS lang_cum_share
FROM cells
"""


QUERIES: dict[str, Query] = {
    "decontaminate": Query(q_decontaminate, SQL_DECONTAMINATE),
    "pii_redact": Query(q_pii_redact, SQL_PII_REDACT),
    "quota_sample": Query(q_quota_sample, SQL_QUOTA_SAMPLE),
    "sequence_pack": Query(q_sequence_pack, SQL_SEQUENCE_PACK),
    "tfidf_top_terms": Query(q_tfidf_top_terms, SQL_TFIDF_TOP_TERMS),
    "train_shuffle": Query(q_train_shuffle, SQL_TRAIN_SHUFFLE),
    "quality_outliers": Query(q_quality_outliers, SQL_QUALITY_OUTLIERS),
    "domain_mix_report": Query(q_domain_mix_report, SQL_DOMAIN_MIX_REPORT),
}
