"""Round-5 governance wave: the audits a training-data pipeline runs
before a release ships — cross-split contamination (eval leakage),
k-anonymity of quasi-identifier tuples, and neighbor-vote label-noise
detection.

Why these three: near-duplicate leakage between train and heldout
splits silently inflates every eval number (the reason Lee et al. 2021
and GPT-3's appendix both re-deduplicate ACROSS the split boundary, not
just within train); k-anonymity over quasi-identifier combinations is
the standard re-identification audit (Sweeney 2002) a privacy review
runs before any record-level data release — `pii_redact` scrubs the
direct identifiers, this measures the indirect ones; and
neighbor-label disagreement (the kNN form of Confident Learning,
Northcutt et al. 2021) is the cheapest label-noise sweep over an
embedded corpus — the data-centric triage step before any relabeling
budget is spent.

All three are hash-graded. Determinism: the split assignment reuses
the engine-reproducible md5-bucket recipe (`pipeline2._md5_bucket` ==
dataset_split's proven oracle twin), pair thresholds compare the same
unrounded fold both engines compute identically, shares are integer
ratios in a single guarded division, and the plurality vote breaks
ties (votes DESC, label ASC) on integers only.

Scale shapes (100 TB): leakage rides `cosine_pairs`' blocked
gemm-candidate path (block key = LSH/IVF bucket at scale) and its
joins are uniform on vec_id; the k-anonymity class frame is bounded by
quasi-identifier cardinality (not corpus size) and the k-sweep is a
4-row broadcast; label-noise scores a bounded, broadcast query SAMPLE
against one corpus scan (`knn_join`'s WindowGroupLimit plan) — the
full-corpus variant would swap the sample for ANN candidates
(`similarity_ann_*`), same downstream vote.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import table
from .base import Query

LEAK_THRESHOLD = 0.25  # same near-dup cut as similarity_cosine_pairs
TRAIN_PCT = 90  # md5 buckets [0, 90) are train; the rest heldout
K_LEVELS = (2, 5, 10, 25)  # k-anonymity thresholds swept
BAL_BAND = 500.0  # acctbal quasi-identifier band width
NOISE_SAMPLE_MOD = 50  # every 50th vector is audited (knn_join's rate)
NOISE_K = 5  # neighbors voting per audited vector


def q_split_leakage_audit(spark: SparkSession, sf: str) -> DataFrame:
    """Cross-split near-dup leakage: assign every vector to train/
    heldout with the stored-nothing md5 split (`dataset_split`'s
    recipe), find near-dup pairs (cosine >= {LEAK_THRESHOLD}, blocked
    on label), and report per label how many heldout vectors have a
    train-side near-duplicate — the eval-contamination number. A
    heldout doc with a train near-dup makes eval loss on it
    memorization, not generalization.

    Plan: pair generation is `cosine_pairs`' blocked gemm-candidate +
    exact-verify path (one per-block quadratic in BLAS, never a global
    cross product); the two split joins are uniform on vec_id; both
    aggregates are label-cell-sized, and labels with zero pairs
    survive via the LEFT join from the per-label base frame."""
    from ..operators.similarity import cosine_pairs
    from .pipeline2 import _md5_bucket

    e = table(spark, sf, "embeddings")

    # Round-12 optimization (guide §2.4): the pair stream used to join
    # back onto the corpus TWICE just to re-derive per-id facts — but
    # is_train is a pure md5 function of the id (stored nothing), so it
    # evaluates directly on id1/id2, and the pair's label is its
    # blocking key, which cosine_pairs now emits (emit_block). Two
    # pair-level joins + two embeddings scans removed.
    def is_train_of(c):
        return _md5_bucket("split|", c.cast("string"), 100) < TRAIN_PCT

    split = e.select(
        "vec_id", "label", is_train_of(F.col("vec_id")).alias("is_train")
    )
    tagged = cosine_pairs(
        e, threshold=LEAK_THRESHOLD, block_col="label", emit_block=True
    ).select(
        "id1",
        "id2",
        "label",
        is_train_of(F.col("id1")).alias("t1"),
        is_train_of(F.col("id2")).alias("t2"),
    )
    cross = F.col("t1") != F.col("t2")
    held_id = F.when(cross & ~F.col("t1"), F.col("id1")).when(
        cross & ~F.col("t2"), F.col("id2")
    )
    agg = tagged.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.count(F.when(cross, 1)).alias("n_cross_pairs"),
        F.countDistinct(held_id).alias("n_leaked_heldout"),
    )
    base = split.groupBy("label").agg(
        F.count(F.when(~F.col("is_train"), 1)).alias("n_heldout")
    )
    joined = base.join(agg, "label", "left")
    leaked = F.coalesce("n_leaked_heldout", F.lit(0))
    return joined.select(
        "label",
        F.coalesce("n_pairs", F.lit(0)).alias("n_pairs"),
        F.coalesce("n_cross_pairs", F.lit(0)).alias("n_cross_pairs"),
        leaked.alias("n_leaked_heldout"),
        "n_heldout",
        F.when(
            F.col("n_heldout") > 0,
            F.round(leaked / F.col("n_heldout"), 9),
        ).alias("leak_share"),
    )


SQL_SPLIT_LEAKAGE_AUDIT = f"""
WITH e AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v,
    ('0x' || substr(md5('split|' || CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT
      % 100 < {TRAIN_PCT} AS is_train
  FROM embeddings
),
pairs AS (
  SELECT a.label, a.vec_id AS id1, b.vec_id AS id2,
    a.is_train AS t1, b.is_train AS t2
  FROM e a JOIN e b ON a.vec_id < b.vec_id AND a.label = b.label
  WHERE
    list_sum(list_transform(list_zip(a.v, b.v), x -> x[1] * x[2]))
      / (
        sqrt(list_sum(list_transform(a.v, x -> x * x)))
        * sqrt(list_sum(list_transform(b.v, x -> x * x)))
      ) >= {LEAK_THRESHOLD}
),
agg AS (
  SELECT label, COUNT(*) AS n_pairs,
    COUNT(*) FILTER (WHERE t1 <> t2) AS n_cross_pairs,
    COUNT(DISTINCT CASE WHEN t1 <> t2 THEN
      CASE WHEN NOT t1 THEN id1 ELSE id2 END END) AS n_leaked_heldout
  FROM pairs GROUP BY label
),
base AS (
  SELECT label, COUNT(*) FILTER (WHERE NOT is_train) AS n_heldout
  FROM e GROUP BY label
)
SELECT base.label,
  CAST(coalesce(agg.n_pairs, 0) AS BIGINT) AS n_pairs,
  CAST(coalesce(agg.n_cross_pairs, 0) AS BIGINT) AS n_cross_pairs,
  CAST(coalesce(agg.n_leaked_heldout, 0) AS BIGINT) AS n_leaked_heldout,
  CAST(base.n_heldout AS BIGINT) AS n_heldout,
  CASE WHEN base.n_heldout > 0 THEN
    ROUND(coalesce(agg.n_leaked_heldout, 0) * 1.0 / base.n_heldout, 9)
  END AS leak_share
FROM base LEFT JOIN agg ON base.label = agg.label
"""


def q_k_anonymity_audit(spark: SparkSession, sf: str) -> DataFrame:
    """k-anonymity audit over customer quasi-identifiers (nation,
    market segment, account-balance band of {BAL_BAND}): for each
    candidate k, how many equivalence classes fall below k members and
    how many customers those classes expose. A class of size < k means
    an attacker knowing only the quasi-identifiers narrows a target to
    fewer than k candidates — the Sweeney re-identification bound.

    Plan: ONE scan groups customers into the class frame (bounded by
    quasi-identifier cardinality — nations x segments x bands — not by
    row count), the {len(K_LEVELS)}-row k dimension is broadcast into
    a nested-loop tag, and the final aggregate is k-keyed over class
    cells. Nothing in the plan scales with customer count past the
    first groupBy's map-side combine."""
    c = table(spark, sf, "customer")
    classes = (
        c.select(
            "c_nationkey",
            "c_mktsegment",
            F.floor(F.col("c_acctbal") / F.lit(BAL_BAND))
            .cast("long")
            .alias("bal_band"),
        )
        .groupBy("c_nationkey", "c_mktsegment", "bal_band")
        .agg(F.count(F.lit(1)).alias("csz"))
    )
    ks = spark.range(1).select(
        F.explode(F.array(*[F.lit(k) for k in K_LEVELS])).alias("k")
    )
    risky = F.col("csz") < F.col("k")
    return (
        classes.crossJoin(F.broadcast(ks))
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n_classes"),
            F.count(F.when(risky, 1)).alias("n_risky_classes"),
            F.sum("csz").alias("n_rows"),
            F.coalesce(
                F.sum(F.when(risky, F.col("csz"))), F.lit(0)
            ).alias("n_risky_rows"),
        )
        .select(
            F.col("k").cast("int").alias("k"),
            "n_classes",
            "n_risky_classes",
            F.round(F.col("n_risky_rows") / F.col("n_rows"), 9).alias(
                "risky_row_share"
            ),
            "n_risky_rows",
        )
    )


SQL_K_ANONYMITY_AUDIT = f"""
WITH classes AS (
  SELECT c_nationkey, c_mktsegment,
    CAST(floor(c_acctbal / {BAL_BAND}) AS BIGINT) AS bal_band,
    COUNT(*) AS csz
  FROM customer GROUP BY 1, 2, 3
),
ks AS (SELECT * FROM (VALUES {", ".join(f"({k})" for k in K_LEVELS)}) AS t(k))
SELECT CAST(ks.k AS INTEGER) AS k,
  COUNT(*) AS n_classes,
  COUNT(*) FILTER (WHERE csz < ks.k) AS n_risky_classes,
  ROUND(
    coalesce(SUM(csz) FILTER (WHERE csz < ks.k), 0) * 1.0 / SUM(csz), 9
  ) AS risky_row_share,
  CAST(coalesce(SUM(csz) FILTER (WHERE csz < ks.k), 0) AS BIGINT)
    AS n_risky_rows
FROM classes CROSS JOIN ks
GROUP BY ks.k
"""


def q_embedding_label_noise(spark: SparkSession, sf: str) -> DataFrame:
    """Label-noise sweep (kNN Confident Learning): every
    {NOISE_SAMPLE_MOD}th vector is audited (`similarity_knn_join`'s
    sampling rate — a denser audit scales cost linearly in the sample,
    6.7 s vs 1.3 s at sf0.1 for mod 10 vs 50) — its {NOISE_K} nearest
    corpus neighbors vote, the plurality label (ties: votes DESC,
    label ASC) is compared to the vector's own label, and disagreement
    flags a suspected mislabel. The flagged subset is the relabeling
    queue a data-centric cleanup prioritizes.

    Plan: the audited sample is bounded and **broadcast** into
    `knn_join`'s single corpus scan (WindowGroupLimit keeps {NOISE_K}
    rows per query before the exchange); the vote aggregate is
    |sample| x |labels| cells and the plurality window sees <=
    |labels| rows per query. At 100 TB the sample swap-in is an ANN
    candidate set (`similarity_ann_*`), same vote downstream."""
    from ..operators.similarity import knn_join

    e = table(spark, sf, "embeddings")
    q = e.filter(F.col("vec_id") % NOISE_SAMPLE_MOD == 0)
    corpus = e.filter(F.col("vec_id") % NOISE_SAMPLE_MOD != 0)
    # Round-12 optimization (guide §2.2 "shuffle fewer bytes" / §2.4):
    # both labels ride through knn_join's single score pass
    # (query_cols/corpus_cols passthrough) instead of TWO extra
    # embeddings scans + joins back onto the table (8 scans / 8
    # exchanges → 2 scans / 3 exchanges at sf0.01). own_label is
    # functionally dependent on query_id, so adding it to the vote
    # groupBy changes no group; the former inner joins dropped no rows
    # (top's query_ids ⊆ q's by construction). Votes, plurality
    # tie-break, and every output cell are identical.
    nn = knn_join(
        q, corpus, k=NOISE_K, query_cols=("label",), corpus_cols=("label",)
    )
    votes = (
        nn.withColumnRenamed("c_label", "n_label")
        .groupBy("query_id", "q_label", "n_label")
        .agg(F.count(F.lit(1)).alias("n_votes"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("n_votes"), F.asc("n_label")
    )
    return (
        votes.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "query_id",
            F.col("q_label").alias("own_label"),
            F.col("n_label").alias("knn_label"),
            F.col("n_votes").alias("n_agree"),
            (F.col("n_label") != F.col("q_label")).alias("suspect"),
        )
    )


SQL_EMBEDDING_LABEL_NOISE = f"""
WITH q AS (
  SELECT vec_id AS query_id, label, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id % {NOISE_SAMPLE_MOD} = 0
),
c AS (
  SELECT vec_id AS neighbor_id, label AS n_label,
    CAST(embedding AS DOUBLE[]) AS cv
  FROM embeddings WHERE vec_id % {NOISE_SAMPLE_MOD} <> 0
),
scored AS (
  SELECT q.query_id, c.neighbor_id, c.n_label,
    ROUND(
      list_sum(list_transform(list_zip(c.cv, q.qv), x -> x[1] * x[2]))
      / (
        sqrt(list_sum(list_transform(c.cv, x -> x * x)))
        * sqrt(list_sum(list_transform(q.qv, x -> x * x)))
      ), 9) AS sim
  FROM c CROSS JOIN q
),
nn AS (
  SELECT query_id, n_label FROM (
    SELECT query_id, n_label, ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rk
    FROM scored
  ) WHERE rk <= {NOISE_K}
),
votes AS (
  SELECT query_id, n_label, COUNT(*) AS n_votes
  FROM nn GROUP BY query_id, n_label
),
top AS (
  SELECT query_id, n_label, n_votes FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY n_votes DESC, n_label ASC) AS rk
    FROM votes
  ) WHERE rk = 1
)
SELECT q.query_id, q.label AS own_label, top.n_label AS knn_label,
  top.n_votes AS n_agree, top.n_label <> q.label AS suspect
FROM q JOIN top ON q.query_id = top.query_id
"""


L_LEVELS = (2, 3, 4, 5)  # l-diversity thresholds swept


def q_l_diversity_audit(spark: SparkSession, sf: str) -> DataFrame:
    """l-diversity audit (Machanavajjhala et al. 2007) — the attack
    k-anonymity misses: a class can hold k people yet leak the
    sensitive attribute anyway if all k SHARE its value (homogeneity
    attack). Quasi-identifiers here are (nation, {BAL_BAND}-unit
    balance band); the sensitive attribute is the market segment; for
    each l in {L_LEVELS}, the classes carrying fewer than l distinct
    segments and the customers they expose. The companion to
    ``k_anonymity_audit`` — a release review runs both.

    Plan: the distinct-sensitive count is an exact two-level
    aggregate (QI×segment cells, then QI classes — never a
    countDistinct shuffle of raw rows); the class frame is bounded by
    QI cardinality, the {len(L_LEVELS)}-row l dimension is broadcast,
    and the final aggregate is l-keyed over class cells (the
    k-anonymity plan shape exactly)."""
    c = table(spark, sf, "customer")
    cells = (
        c.select(
            "c_nationkey",
            F.floor(F.col("c_acctbal") / F.lit(BAL_BAND))
            .cast("long")
            .alias("bal_band"),
            "c_mktsegment",
        )
        .groupBy("c_nationkey", "bal_band", "c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    classes = cells.groupBy("c_nationkey", "bal_band").agg(
        F.sum("n").alias("csz"), F.count(F.lit(1)).alias("ldiv")
    )
    ls = spark.range(1).select(
        F.explode(F.array(*[F.lit(v) for v in L_LEVELS])).alias("l")
    )
    risky = F.col("ldiv") < F.col("l")
    return (
        classes.crossJoin(F.broadcast(ls))
        .groupBy("l")
        .agg(
            F.count(F.lit(1)).alias("n_classes"),
            F.count(F.when(risky, 1)).alias("n_risky_classes"),
            F.sum("csz").alias("n_rows"),
            F.coalesce(
                F.sum(F.when(risky, F.col("csz"))), F.lit(0)
            ).alias("n_risky_rows"),
        )
        .select(
            F.col("l").cast("int").alias("l"),
            "n_classes",
            "n_risky_classes",
            F.round(F.col("n_risky_rows") / F.col("n_rows"), 9).alias(
                "risky_row_share"
            ),
            "n_risky_rows",
        )
    )


SQL_L_DIVERSITY_AUDIT = f"""
WITH cells AS (
  SELECT c_nationkey,
    CAST(floor(c_acctbal / {BAL_BAND}) AS BIGINT) AS bal_band,
    c_mktsegment, COUNT(*) AS n
  FROM customer GROUP BY 1, 2, 3
),
classes AS (
  SELECT c_nationkey, bal_band, CAST(SUM(n) AS BIGINT) AS csz,
    COUNT(*) AS ldiv
  FROM cells GROUP BY 1, 2
),
ls AS (SELECT * FROM (VALUES {", ".join(f"({v})" for v in L_LEVELS)}) AS t(l))
SELECT CAST(ls.l AS INTEGER) AS l,
  COUNT(*) AS n_classes,
  COUNT(*) FILTER (WHERE ldiv < ls.l) AS n_risky_classes,
  ROUND(
    coalesce(SUM(csz) FILTER (WHERE ldiv < ls.l), 0) * 1.0 / SUM(csz), 9
  ) AS risky_row_share,
  CAST(coalesce(SUM(csz) FILTER (WHERE ldiv < ls.l), 0) AS BIGINT)
    AS n_risky_rows
FROM classes CROSS JOIN ls
GROUP BY ls.l
"""


QUERIES: dict[str, Query] = {
    "split_leakage_audit": Query(
        q_split_leakage_audit, SQL_SPLIT_LEAKAGE_AUDIT
    ),
    "l_diversity_audit": Query(q_l_diversity_audit, SQL_L_DIVERSITY_AUDIT),
    "k_anonymity_audit": Query(q_k_anonymity_audit, SQL_K_ANONYMITY_AUDIT),
    "embedding_label_noise": Query(
        q_embedding_label_noise, SQL_EMBEDDING_LABEL_NOISE
    ),
}
