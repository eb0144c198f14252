"""Round-5 wave 2: the batched two-stage retrieval stack, embedding
whitening, and event-stream burst detection.

- ``similarity_two_stage_retrieval`` composes the repo's ANN machinery
  end-to-end the way a production system runs it: a BATCH of queries is
  coarse-quantized in-plan (no per-query driver round trip — the recall
  arms are single-query with driver-side probe selection), each query
  probes its nearest IVF cells, candidates are exactly re-scored and
  top-k ranked per query. The retrieval twin of what
  ``dedup_fuzzy_clusters`` is for the dedup family.
- ``embedding_whitening`` standardizes each dimension to zero mean /
  unit variance — the feature-normalization pass run before ANN
  indexing or probe training (anisotropic dims dominate cosine);
  downstream of ``embedding_dim_stats`` (which only measures).
- ``events_burst_zscore`` flags hourly volume bursts per event type
  against a trailing-24-bucket baseline — the stream-health monitor a
  pipeline runs on its telemetry; all window math on (type, hour)
  cells, never raw events.

Determinism follows the house recipes: integer quantization before
cross-row sums, sequential folds for vector math, ROW_NUMBER with
total-order tie-breaks, variance from exact integer power sums (never
engine-native STDDEV, whose streaming update order differs between
engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.similarity import _as_double, cosine, ivf_assign
from ..sources import table
from .base import Query

TS_CELLS = 8
TS_PROBE = 2
TS_K = 3
TS_QMOD = 100  # query batch = vec_id % 100 == 7 (bounded, scattered)
TS_QREM = 7

DIM = 64
WHITEN_EPS = 1e-12

BURST_WIN = 24  # trailing observed hourly buckets
BURST_MIN_K = 12  # baseline must have at least this many buckets
BURST_Z = 3.0


def two_stage_retrieval(
    spark: SparkSession,
    corpus: DataFrame,
    queries: DataFrame,
    cents: list[list[float]],
    probe: int = TS_PROBE,
    k: int = TS_K,
    assign_gemm_threshold: int = 32,
) -> DataFrame:
    """Parameterized core of ``similarity_two_stage_retrieval``.

    ``corpus`` must expose (vec_id, embedding); ``queries`` (qid, qv as
    double array). Split out (round 6) so the bench's retrieval scaling
    row can hold the query batch FIXED while the corpus grows 10× —
    the production shape whose n·probe/cells candidate-volume contract
    the scaling row measures. ``assign_gemm_threshold`` passes through
    to ``ivf_assign`` (round 7): the scaling arm forces the gemm
    quantizer at every point (the literal-fold expression is
    k×dim-bounded and never plans at the 100× arm's k=800), while the
    hash-graded suite query keeps the default literal path at k=8."""
    cent_df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cents)], "c_id int, cv array<double>"
    )
    d2 = F.aggregate(
        F.zip_with("qv", "cv", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    wp = Window.partitionBy("qid").orderBy(F.asc("d2"), F.asc("c_id"))
    probes = (
        queries.crossJoin(F.broadcast(cent_df))
        .select("qid", "qv", "c_id", d2.alias("d2"))
        .withColumn("rk", F.row_number().over(wp))
        .filter(F.col("rk") <= probe)
        .select("qid", "qv", F.col("c_id").alias("cell"))
    )
    assign = ivf_assign(corpus, cents, gemm_threshold=assign_gemm_threshold).select(
        "vec_id", "cell", _as_double("embedding").alias("v")
    )
    scored = (
        assign.join(F.broadcast(probes), "cell")
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            F.round(cosine(F.col("v"), F.col("qv")), 9).alias("sim"),
        )
    )
    wr = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= k)
        .select(F.col("qid").alias("query_id"), "rank", "vec_id", "sim")
    )


def q_similarity_two_stage(spark: SparkSession, sf: str) -> DataFrame:
    """Batched two-stage retrieval: IVF candidate generation → exact
    rerank → top-{TS_K} per query, for a whole query BATCH in one plan.

    Stage 1: coarse-quantize the corpus onto the first-{TS_CELLS}
    vectors (the engine-reproducible quantizer the recall arms
    established); each query's {TS_PROBE} nearest cells are picked by a
    ROW_NUMBER over the (queries × centroids) grid — bounded rows, all
    in-plan (the single-query recall arms choose probes driver-side;
    a production batch can't afford that round trip).
    Stage 2: candidates = cell-assignment ⋈ broadcast probe table
    (each vector lives in ONE cell, so a (query, vector) pair appears
    at most once), exact cosine rerank, per-query top-{TS_K} via a
    rank window that only ever sees one query's candidates.

    100 TB shape: the corpus is scanned once for assignment (zero
    shuffles — centroids are plan literals); the only exchange is the
    rank window keyed by query id; the probe table is queries×probe
    rows, always broadcastable. Candidate volume per query is
    n·probe/cells — the IVF contract."""
    e = table(spark, sf, "embeddings")
    cents = [
        [float(x) for x in r["embedding"]]
        for r in e.filter(F.col("vec_id") < TS_CELLS)
        .orderBy("vec_id")
        .select("embedding")
        .collect()
    ]
    qs = e.filter(F.col("vec_id") % TS_QMOD == TS_QREM).select(
        F.col("vec_id").alias("qid"), _as_double("embedding").alias("qv")
    )
    return two_stage_retrieval(spark, e, qs, cents)


SQL_SIMILARITY_TWO_STAGE = f"""
WITH cents AS (
  SELECT vec_id AS c_id, CAST(embedding AS DOUBLE[]) AS cv
  FROM embeddings WHERE vec_id < {TS_CELLS}
),
qs AS (
  SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id % {TS_QMOD} = {TS_QREM}
),
probes AS (
  SELECT qid, qv, c_id AS cell FROM (
    SELECT q.qid, q.qv, c.c_id,
      ROW_NUMBER() OVER (PARTITION BY q.qid ORDER BY
        list_sum(list_transform(list_zip(q.qv, c.cv),
                 x -> (x[1]-x[2])*(x[1]-x[2]))) ASC, c.c_id ASC) AS rk
    FROM qs q, cents c
  ) WHERE rk <= {TS_PROBE}
),
assign AS (
  SELECT vec_id, c_id AS cell, v FROM (
    SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS v, c.c_id,
      ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
        list_sum(list_transform(list_zip(CAST(e.embedding AS DOUBLE[]), c.cv),
                 x -> (x[1]-x[2])*(x[1]-x[2]))) ASC, c.c_id ASC) AS rk
    FROM embeddings e, cents c
  ) WHERE rk = 1
),
scored AS (
  SELECT p.qid, a.vec_id,
    ROUND(list_sum(list_transform(list_zip(a.v, p.qv), x -> x[1] * x[2]))
      / (sqrt(list_sum(list_transform(a.v, x -> x * x)))
         * sqrt(list_sum(list_transform(p.qv, x -> x * x)))), 9) AS sim
  FROM assign a JOIN probes p USING (cell)
  WHERE a.vec_id <> p.qid
)
SELECT qid AS query_id, CAST(rk AS INTEGER) AS rank, vec_id, sim FROM (
  SELECT qid, vec_id, sim,
    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id ASC) AS rk
  FROM scored
) WHERE rk <= {TS_K}
"""


def q_embedding_whitening(spark: SparkSession, sf: str) -> DataFrame:
    """Per-dimension whitening (zero mean, unit variance): the
    normalization pass an embedding export goes through before indexing
    or probe training. Emits per vector the whitened values at three
    probe dimensions plus the whitened L2 norm — scalar columns the
    driver can hash (the full whitened array feeds downstream
    operators; ``multimodal_features`` set the probe-dims precedent).

    Determinism: means come from exact integer sums of 1e-7-quantized
    cells; variance is E[x²] − mean² from exact integer power sums
    (never engine-native STDDEV — its streaming update is
    order-dependent); the per-vector fold is sequential. All cross-row
    math is order-independent, all per-row math order-fixed.

    100 TB shape: one posexplode → (pos)-keyed 64-row moment aggregate
    (uniform keys, map-side combined — the ``embedding_dim_stats``
    recipe) folded into a 1-row broadcast stats frame → a zero-shuffle
    map over the corpus. A single 129-column wide aggregate over array
    extractions computes the identical stats but measured ~10× slower
    at sf0.1 (11.4 s vs 1.2 s end-to-end): 128 per-row array indexings
    + 128 decimal(38,0) accumulators in one codegen stage degrade far
    past the exploded long stream, so the narrow-agg shape wins despite
    touching 64× more (tiny) rows."""
    e = table(spark, sf, "embeddings").select(
        "vec_id", _as_double("embedding").alias("v")
    )
    comp = e.select(F.posexplode("v").alias("pos", "x")).select(
        "pos", F.floor(F.col("x") * F.lit(1e7) + F.lit(0.5)).alias("q")
    )
    st = comp.groupBy("pos").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("q").cast("decimal(38,0)")).alias("s"),
        F.sum((F.col("q") * F.col("q")).cast("decimal(38,0)")).alias("t"),
    )
    mean_c = F.col("s").cast("double") / F.lit(1e7) / F.col("n")
    var_c = F.greatest(
        F.col("t").cast("double") / F.lit(1e14) / F.col("n") - mean_c * mean_c,
        F.lit(0.0),
    )
    per_dim = st.select(
        "pos",
        mean_c.alias("m"),
        F.sqrt(var_c + F.lit(WHITEN_EPS)).alias("sd"),
    )
    stat_row = per_dim.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
        ).alias("mean"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", F.col("sd").alias("m2")))),
            lambda s: s["m2"],
        ).alias("std"),
    )
    joined = e.crossJoin(F.broadcast(stat_row))
    centered = F.zip_with("v", "mean", lambda a, b: a - b)
    whitened = F.zip_with(centered, F.col("std"), lambda a, b: a / b)
    bound = joined.select("vec_id", "v", "mean", "std", whitened.alias("w"))
    wnorm = F.sqrt(
        F.aggregate(F.col("w"), F.lit(0.0), lambda acc, x: acc + x * x)
    )
    return bound.select(
        "vec_id",
        F.round(F.col("w")[0], 9).alias("w0"),
        F.round(F.col("w")[5], 9).alias("w5"),
        F.round(F.col("w")[10], 9).alias("w10"),
        F.round(wnorm, 6).alias("whitened_norm"),
    )


SQL_EMBEDDING_WHITENING = f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
q AS (
  SELECT vec_id, v,
    list_transform(v, x -> CAST(floor(x * 1e7 + 0.5) AS BIGINT)) AS vq
  FROM e
),
st AS (
  SELECT i AS pos, SUM(vq[i]) AS s, SUM(vq[i] * vq[i]) AS t, COUNT(*) AS n
  FROM q, range(1, {DIM + 1}) r(i) GROUP BY i
),
ms AS (
  SELECT
    list(CAST(s AS DOUBLE) / 1e7 / n ORDER BY pos) AS mean,
    list(sqrt(greatest(CAST(t AS DOUBLE) / 1e14 / n
         - (CAST(s AS DOUBLE) / 1e7 / n) * (CAST(s AS DOUBLE) / 1e7 / n), 0.0)
         + {WHITEN_EPS}) ORDER BY pos) AS std
  FROM st
),
w AS (
  SELECT e.vec_id,
    list_transform(list_zip(e.v, ms.mean, ms.std),
                   x -> (x[1] - x[2]) / x[3]) AS wl
  FROM e, ms
)
SELECT vec_id,
  ROUND(wl[1], 9) AS w0,
  ROUND(wl[6], 9) AS w5,
  ROUND(wl[11], 9) AS w10,
  ROUND(sqrt(list_sum(list_transform(wl, x -> x * x))), 6) AS whitened_norm
FROM w
"""


def q_events_burst_zscore(spark: SparkSession, sf: str) -> DataFrame:
    """Hourly burst detection per event type: each (type, hour) bucket's
    count is z-scored against the mean/std of its trailing
    {BURST_WIN} OBSERVED buckets (ROWS frame — gap-robust), flagged
    when z > {BURST_Z} with at least {BURST_MIN_K} baseline buckets.
    The stream-health monitor a pipeline runs on ingest telemetry;
    mean/stddev gates on raw values are ``quality_outliers``'s job —
    this one is about VOLUME anomalies over time.

    Determinism: variance from exact integer power sums over the
    window (SUM(c), SUM(c²), COUNT — never engine-native STDDEV whose
    Welford update order differs between engines); z is then a fixed
    chain of IEEE ops. Scale: all window math runs on the (type, hour)
    aggregate — cardinality types × hours, never raw events; one
    uniform shuffle to build the cells, one type-keyed window."""
    ev = table(spark, sf, "events")
    cells = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(F.count("*").alias("c"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(-BURST_WIN, -1)
    )
    k = F.count("c").over(w)
    s1 = F.sum("c").over(w)
    s2 = F.sum(F.col("c") * F.col("c")).over(w)
    m = s1.cast("double") / k
    sd = F.sqrt(
        F.greatest(s2.cast("double") / k - m * m, F.lit(0.0))
    )
    z = F.when((k >= BURST_MIN_K) & (sd > 0), (F.col("c") - m) / sd)
    zed = cells.select("event_type", z.alias("zv"))
    return zed.groupBy("event_type").agg(
        F.count("*").alias("n_buckets"),
        F.sum(F.when(F.col("zv") > BURST_Z, 1).otherwise(0)).alias("n_bursts"),
        F.round(F.max("zv"), 6).alias("max_z"),
    )


SQL_EVENTS_BURST_ZSCORE = f"""
WITH cells AS (
  SELECT event_type, date_trunc('hour', ts) AS h, COUNT(*) AS c
  FROM events GROUP BY 1, 2
),
wz AS (
  SELECT event_type, c,
    COUNT(c) OVER win AS k, SUM(c) OVER win AS s1, SUM(c * c) OVER win AS s2
  FROM cells
  WINDOW win AS (PARTITION BY event_type ORDER BY h
                 ROWS BETWEEN {BURST_WIN} PRECEDING AND 1 PRECEDING)
),
z AS (
  SELECT event_type,
    CASE WHEN k >= {BURST_MIN_K}
          AND sqrt(greatest(CAST(s2 AS DOUBLE) / k
               - (CAST(s1 AS DOUBLE) / k) * (CAST(s1 AS DOUBLE) / k), 0.0)) > 0
         THEN (c - CAST(s1 AS DOUBLE) / k)
              / sqrt(greatest(CAST(s2 AS DOUBLE) / k
                 - (CAST(s1 AS DOUBLE) / k) * (CAST(s1 AS DOUBLE) / k), 0.0))
    END AS zv
  FROM wz
)
SELECT event_type, COUNT(*) AS n_buckets,
  CAST(SUM(CASE WHEN zv > {BURST_Z} THEN 1 ELSE 0 END) AS BIGINT) AS n_bursts,
  ROUND(MAX(zv), 6) AS max_z
FROM z GROUP BY event_type
"""


QUERIES: dict[str, Query] = {
    "similarity_two_stage_retrieval": Query(
        q_similarity_two_stage, SQL_SIMILARITY_TWO_STAGE
    ),
    "embedding_whitening": Query(q_embedding_whitening, SQL_EMBEDDING_WHITENING),
    "events_burst_zscore": Query(q_events_burst_zscore, SQL_EVENTS_BURST_ZSCORE),
}
