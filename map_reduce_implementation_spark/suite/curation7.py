"""Round-5 data-selection wave: DSIR — Data Selection with Importance
Resampling (Xie et al. 2023), the name-brand method for picking
pretraining documents that LOOK LIKE a small high-quality target set.

Two unigram LMs are fit — one on the target slice (here the ``en``
documents, standing in for the curated target corpus), one on the full
raw pool — and every raw document is scored by its average per-token
log importance ratio ln p_target(t) − ln p_raw(t). High scores mean
"this raw doc is distributionally close to the target"; the top-N by
score is the selected pretraining subset. This is the hashed-ngram
DSIR estimator with n=1 (the paper's §3.1 setup restricted to
unigrams — the same restriction `text_unigram_logprob` makes for the
CCNet/Gopher perplexity family, and for the same reason: higher-order
features change the feature map, not the plan shape).

Determinism: both LMs are Laplace-smoothed integer-ratio
probabilities over the SHARED raw vocabulary (so the log of each
ratio is the same double in both engines), per-doc sums follow the
proven unigram-NLL recipe (ROUND(·, 6) after the sum), and the top-N
cut orders by (rounded score DESC, doc_id ASC) in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import table
from .base import Query
from .text import _tokens

DSIR_TARGET_LANG = "en"  # the high-quality target slice
DSIR_TOP_N = 100  # selected pretraining subset size


def q_dsir_importance_sample(spark: SparkSession, sf: str) -> DataFrame:
    """DSIR selection: top-{DSIR_TOP_N} raw documents by average
    per-token log importance ratio under Laplace-smoothed unigram LMs
    of the target ({DSIR_TARGET_LANG}) slice vs the raw pool.

    Plan: ONE tokenize pass builds the term-keyed count frame that
    carries BOTH models (raw count + target-slice count per term,
    vocabulary-sized — Heaps' law keeps it broadcastable at any corpus
    scale); that frame is localCheckpoint'd so the model and its
    normalizing scalars derive from the materialized vocabulary
    instead of each replaying the corpus tokenize (the
    filter_cascade_report pattern — without it this plan scans
    documents 6×, with it exactly 2×: once to count, once to score);
    scoring re-joins the broadcast model to the token stream (one
    doc-keyed shuffle), and the top-N is a TakeOrderedAndProject —
    per-partition heaps, never a global sort. The three scalars
    (target/raw token totals, shared vocab size) ride a 1-row
    broadcast frame, nothing collects to the driver."""
    d = table(spark, sf, "documents")
    tok = d.select(
        "doc_id", "lang", F.explode(_tokens(F.col("text"))).alias("term")
    )
    raw_ctf = tok.groupBy("term").agg(
        F.count(F.lit(1)).alias("raw_ctf"),
        F.count(F.when(F.col("lang") == DSIR_TARGET_LANG, 1)).alias(
            "tgt_ctf"
        ),
    ).localCheckpoint(eager=True)
    scalars = raw_ctf.agg(
        F.sum("raw_ctf").alias("raw_total"),
        F.sum("tgt_ctf").alias("tgt_total"),
        F.count(F.lit(1)).alias("vocab"),
    )
    model = raw_ctf.crossJoin(F.broadcast(scalars)).select(
        "term",
        (
            F.log(
                (F.col("tgt_ctf") + F.lit(1))
                / (F.col("tgt_total") + F.col("vocab"))
            )
            - F.log(
                (F.col("raw_ctf") + F.lit(1))
                / (F.col("raw_total") + F.col("vocab"))
            )
        ).alias("log_ratio"),
    )
    scored = (
        tok.join(F.broadcast(model), "term")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(
                F.sum("log_ratio") / F.count(F.lit(1)), 6
            ).alias("avg_log_ratio"),
        )
    )
    return scored.orderBy(
        F.desc("avg_log_ratio"), F.asc("doc_id")
    ).limit(DSIR_TOP_N)


SQL_DSIR_IMPORTANCE_SAMPLE = f"""
WITH tok AS (
  SELECT doc_id, lang,
    unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                       x -> x <> '')) AS term
  FROM documents
),
raw_ctf AS (
  SELECT term, COUNT(*) AS raw_ctf,
    COUNT(*) FILTER (WHERE lang = '{DSIR_TARGET_LANG}') AS tgt_ctf
  FROM tok GROUP BY term
),
scalars AS (
  SELECT CAST(SUM(raw_ctf) AS BIGINT) AS raw_total,
    CAST(SUM(tgt_ctf) AS BIGINT) AS tgt_total,
    COUNT(*) AS vocab
  FROM raw_ctf
),
model AS (
  SELECT term,
    ln((tgt_ctf + 1) * 1.0 / (tgt_total + vocab))
      - ln((raw_ctf + 1) * 1.0 / (raw_total + vocab)) AS log_ratio
  FROM raw_ctf CROSS JOIN scalars
),
scored AS (
  SELECT tok.doc_id, COUNT(*) AS n_tokens,
    ROUND(SUM(model.log_ratio) / COUNT(*), 6) AS avg_log_ratio
  FROM tok JOIN model ON tok.term = model.term
  GROUP BY tok.doc_id
)
SELECT doc_id, n_tokens, avg_log_ratio FROM scored
ORDER BY avg_log_ratio DESC, doc_id ASC LIMIT {DSIR_TOP_N}
"""


QUERIES: dict[str, Query] = {
    "dsir_importance_sample": Query(
        q_dsir_importance_sample, SQL_DSIR_IMPORTANCE_SAMPLE
    ),
}
