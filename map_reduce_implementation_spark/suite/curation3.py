"""Curation/ML depth, round 4 additions (EXT): temperature-resampled
domain weights, nearest-centroid classification with a confusion
matrix, and perplexity-bucket stratified sampling.

Each fills a real pipeline gap rather than re-shading an entry:

- ``domain_temperature_resample`` — the mixture-reweighting step
  (UnifiedQA / multilingual-LM style): sampling weight w_d ∝ n_d^α
  flattens the domain distribution; expected per-domain sample counts
  for a fixed budget. α = 0.5 so the power is ``sqrt`` — IEEE
  correctly-rounded in every engine, which keeps the oracle exact
  where a libm ``pow`` could drift in the last ulp.
- ``nearest_centroid_confusion`` — train-free classifier eval over the
  labeled embeddings: per-label mean centroid (exact decimal sums),
  assign every vector to its nearest centroid, report the
  true-vs-predicted confusion matrix. The evaluation loop a pipeline
  runs to sanity-check embedding quality before spending GPU time.
- ``perplexity_bucket_sample`` — quality-stratified sampling (DCLM /
  CCNet bucket style): score docs by unigram avg-NLL, cut into
  quartile buckets by exact percentile cut-points (the RFM pattern —
  no global window over raw rows), keep a deterministic md5-ordered
  top-3 per bucket.

Engine-agreement tricks reused from the proven recipes: sequential
folds over array_sort'ed collect_lists == DuckDB ``list_sum(list(...
ORDER BY ...))``; decimal sums for anything later compared; doubles
only after exact operands; sqrt not pow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import table
from .base import Query

RESAMPLE_BUDGET = 10_000


def q_domain_temperature_resample(spark: SparkSession, sf: str) -> DataFrame:
    """Per-source temperature resampling weights (α=0.5): w = sqrt(n),
    share = w / Σw, expected = budget × share. The denominator Σw is a
    SEQUENTIAL fold over the source-sorted weight list — 20 domains,
    one tiny single-row aggregate — so Spark and the oracle add the
    same doubles in the same order (a plain SUM would be
    partition-order dependent). One uniform groupBy shuffle on the
    heavy stream; everything after is domain-count-sized."""
    d = table(spark, sf, "documents")
    counts = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    w = counts.select(
        "source", "n_docs", F.sqrt(F.col("n_docs").cast("double")).alias("w")
    )
    tot = w.agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("source", "w"))),
            F.lit(0.0),
            lambda acc, x: acc + x["w"],
        ).alias("tw")
    )
    return w.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        F.round("w", 6).alias("weight"),
        F.round(F.col("w") / F.col("tw"), 6).alias("share"),
        F.round(F.lit(float(RESAMPLE_BUDGET)) * F.col("w") / F.col("tw"), 1).alias(
            "expected_samples"
        ),
    )


SQL_DOMAIN_TEMPERATURE_RESAMPLE = f"""
WITH c AS (
  SELECT source, COUNT(*) AS n_docs, sqrt(CAST(COUNT(*) AS DOUBLE)) AS w
  FROM documents GROUP BY source
),
t AS (SELECT list_sum(list(w ORDER BY source)) AS tw FROM c)
SELECT c.source, c.n_docs,
  ROUND(c.w, 6) AS weight,
  ROUND(c.w / t.tw, 6) AS share,
  ROUND({RESAMPLE_BUDGET}.0 * c.w / t.tw, 1) AS expected_samples
FROM c, t
"""


def q_nearest_centroid_confusion(spark: SparkSession, sf: str) -> DataFrame:
    """Nearest-centroid classifier eval: per-label mean centroids from
    EXACT decimal component sums (posexplode → (label, dim)-keyed agg —
    uniform keys, map-side combinable), centroids collected driver-side
    (labels × dim scalars, the bounded IVF-style collect), every vector
    assigned to its nearest centroid by the literal-fold argmin, and
    the confusion matrix (true, predicted, n) reported with per-class
    accuracy. Ties break to the lowest label id on both engines.

    Means are double-divisions of exact decimal sums, so both engines
    materialize bit-identical centroid literals — the whole pipeline
    stays hash-exact without a single approximate compare."""
    from ..operators.similarity import _as_double

    e = table(spark, sf, "embeddings")
    comp = e.select(
        "label", F.posexplode(_as_double("embedding")).alias("pos", "x")
    )
    cent = comp.groupBy("label", "pos").agg(
        F.sum(F.col("x").cast("decimal(28,12)")).alias("sx"),
        F.count(F.lit(1)).alias("n"),
    )
    cvec = (
        cent.groupBy("label")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            "pos",
                            (F.col("sx").cast("double") / F.col("n")).alias("m"),
                        )
                    )
                ),
                lambda s: s["m"],
            ).alias("cv")
        )
        .orderBy("label")
    )
    cents = [(r["label"], [float(x) for x in r["cv"]]) for r in cvec.collect()]
    dists = F.array(
        *[
            F.aggregate(
                F.zip_with(
                    _as_double("embedding"),
                    F.array(*[F.lit(float(x)) for x in cv]),
                    lambda a, b: (a - b) * (a - b),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            for _, cv in cents
        ]
    )
    labels = F.array(*[F.lit(int(lbl)) for lbl, _ in cents])
    pred = e.select(
        "label",
        labels[F.array_position(dists, F.array_min(dists)) - 1].alias("pred_label"),
    )
    return (
        pred.groupBy(F.col("label").alias("true_label"), "pred_label")
        .agg(F.count(F.lit(1)).alias("n"))
    )


SQL_NEAREST_CENTROID_CONFUSION = """
WITH e AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
comp AS (
  SELECT label, i AS pos, v[i] AS x
  FROM e, range(1, 100000) r(i) WHERE i <= len(v)
),
cent AS (
  SELECT label, pos,
    CAST(SUM(CAST(x AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*) AS m
  FROM comp GROUP BY label, pos
),
cvec AS (
  SELECT label, list(m ORDER BY pos) AS cv FROM cent GROUP BY label
),
assign AS (
  SELECT vec_id, c_label AS pred_label FROM (
    SELECT e.vec_id, c.label AS c_label,
      ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
        list_sum(list_transform(list_zip(e.v, c.cv),
                 x -> (x[1]-x[2])*(x[1]-x[2]))) ASC, c.label ASC) AS rk
    FROM e, cvec c
  ) WHERE rk = 1
)
SELECT e.label AS true_label, a.pred_label, COUNT(*) AS n
FROM e JOIN assign a USING (vec_id)
GROUP BY e.label, a.pred_label
"""


PPL_KEEP_PER_BUCKET = 3


def q_perplexity_bucket_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Quality-stratified sampling: score every doc with the unigram
    avg-NLL (broadcast LM, the CCNet-style cheap perplexity), cut the
    corpus into quartile buckets by exact percentile CUT-POINTS (the
    customer_rfm_segments pattern — one 1-row aggregate broadcast into
    a CASE, no global window over doc rows), then keep a deterministic
    md5-ordered top-{PPL_KEEP_PER_BUCKET} per bucket so every quality
    stratum is represented in the sample. The per-bucket rank is a
    4-partition window whose exchange is capped by WindowGroupLimit
    (rank ≤ k prunes map-side before the shuffle)."""
    from .text import _tokens

    d = table(spark, sf, "documents")
    tok = d.select("doc_id", F.explode(_tokens(F.col("text"))).alias("term"))
    ctf = tok.groupBy("term").agg(F.count(F.lit(1)).alias("ctf"))
    total = ctf.agg(F.sum("ctf")).collect()[0][0]  # one scalar (corpus size)
    nll = (
        tok.join(F.broadcast(ctf), "term")
        .groupBy("doc_id")
        .agg(
            F.round(
                -F.sum(F.log(F.col("ctf") / F.lit(total))) / F.count(F.lit(1)), 6
            ).alias("avg_nll")
        )
    )
    qs = F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75))
    cuts = nll.agg(F.percentile("avg_nll", qs).alias("cq"))
    bucketed = nll.crossJoin(F.broadcast(cuts)).select(
        "doc_id",
        "avg_nll",
        F.when(F.col("avg_nll") > F.col("cq")[2], 4)
        .when(F.col("avg_nll") > F.col("cq")[1], 3)
        .when(F.col("avg_nll") > F.col("cq")[0], 2)
        .otherwise(1)
        .alias("bucket"),
    )
    w = Window.partitionBy("bucket").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        bucketed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= PPL_KEEP_PER_BUCKET)
        .select("doc_id", "avg_nll", "bucket", F.col("rn").alias("bucket_rank"))
    )


SQL_PERPLEXITY_BUCKET_SAMPLE = f"""
WITH tok AS (
  SELECT doc_id,
    unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS term
  FROM documents
),
ctf AS (SELECT term, COUNT(*) AS ctf FROM tok GROUP BY term),
total AS (SELECT CAST(SUM(ctf) AS BIGINT) AS t FROM ctf),
nll AS (
  SELECT tok.doc_id,
    ROUND(-SUM(ln(ctf.ctf / total.t)) / COUNT(*), 6) AS avg_nll
  FROM tok JOIN ctf ON tok.term = ctf.term CROSS JOIN total
  GROUP BY tok.doc_id
),
cuts AS (SELECT quantile_cont(avg_nll, [0.25, 0.5, 0.75]) AS cq FROM nll),
b AS (
  SELECT n.doc_id, n.avg_nll,
    CASE WHEN n.avg_nll > c.cq[3] THEN 4 WHEN n.avg_nll > c.cq[2] THEN 3
         WHEN n.avg_nll > c.cq[1] THEN 2 ELSE 1 END AS bucket
  FROM nll n, cuts c
)
SELECT doc_id, avg_nll, CAST(bucket AS INTEGER) AS bucket,
  CAST(rn AS INTEGER) AS bucket_rank
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY bucket ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM b
) WHERE rn <= {PPL_KEEP_PER_BUCKET}
"""


QUERIES: dict[str, Query] = {
    "domain_temperature_resample": Query(
        q_domain_temperature_resample, SQL_DOMAIN_TEMPERATURE_RESAMPLE
    ),
    "nearest_centroid_confusion": Query(
        q_nearest_centroid_confusion, SQL_NEAREST_CENTROID_CONFUSION
    ),
    "perplexity_bucket_sample": Query(
        q_perplexity_bucket_sample, SQL_PERPLEXITY_BUCKET_SAMPLE
    ),
}
