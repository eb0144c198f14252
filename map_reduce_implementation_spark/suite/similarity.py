"""Similarity-search suite over the ``embeddings`` table (vec_id,
embedding: array<float>, label).

The oracle twin computes the identical double-precision sequential fold
(DuckDB list ops are evaluated element-order like Spark's aggregate
fold); sims are rounded to 9 dp on both sides to absorb any last-ulp
difference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.similarity import (
    ann_lsh_topk,
    cosine_pairs,
    cosine_topk,
    ivf_topk,
    knn_join,
)
from ..sources import table
from .base import Query

QUERY_VEC_ID = 0
TOP_K = 10


def _query_vec(spark: SparkSession, sf: str) -> list[float]:
    row = (
        table(spark, sf, "embeddings")
        .filter(F.col("vec_id") == QUERY_VEC_ID)
        .select("embedding")
        .first()
    )
    return [float(x) for x in row[0]]


def q_cosine_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Brute-force exact top-10 neighbors of vec_id=0 by cosine."""
    qv = _query_vec(spark, sf)
    return cosine_topk(
        table(spark, sf, "embeddings"), qv, k=TOP_K, exclude_id=QUERY_VEC_ID
    )


# The oracle reproduces the same sequential fold in double precision.
SQL_COSINE_TOPK = f"""
WITH q AS (
  SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = {QUERY_VEC_ID}
),
scored AS (
  SELECT e.vec_id,
    ROUND(
      list_sum(list_transform(list_zip(CAST(e.embedding AS DOUBLE[]), q.qv), x -> x[1] * x[2]))
      / (
        sqrt(list_sum(list_transform(CAST(e.embedding AS DOUBLE[]), x -> x * x)))
        * sqrt(list_sum(list_transform(q.qv, x -> x * x)))
      ), 9) AS sim
  FROM embeddings e, q
  WHERE e.vec_id <> {QUERY_VEC_ID}
)
SELECT vec_id, sim FROM scored ORDER BY sim DESC, vec_id ASC LIMIT {TOP_K}
"""


def q_cosine_pairs_blocked(spark: SparkSession, sf: str) -> DataFrame:
    """Embedding near-dup pairs: blocked on ``label`` so the self-join is
    per-block, never a cross product (at scale the block key is an LSH
    bucket). Threshold 0.25 — the synthetic vectors are near-orthogonal."""
    return cosine_pairs(
        table(spark, sf, "embeddings"), threshold=0.25, block_col="label"
    )


SQL_COSINE_PAIRS_BLOCKED = """
WITH e AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
)
SELECT a.vec_id AS id1, b.vec_id AS id2,
  ROUND(
    list_sum(list_transform(list_zip(a.v, b.v), x -> x[1] * x[2]))
    / (
      sqrt(list_sum(list_transform(a.v, x -> x * x)))
      * sqrt(list_sum(list_transform(b.v, x -> x * x)))
    ), 9) AS sim
FROM e a JOIN e b ON a.vec_id < b.vec_id AND a.label = b.label
WHERE
  list_sum(list_transform(list_zip(a.v, b.v), x -> x[1] * x[2]))
    / (
      sqrt(list_sum(list_transform(a.v, x -> x * x)))
      * sqrt(list_sum(list_transform(b.v, x -> x * x)))
    ) >= 0.25
"""


def q_ann_lsh_topk(spark: SparkSession, sf: str) -> DataFrame:
    """LSH-bucketed approximate top-k (scale path). Spark-only plan
    (seeded hyperplane literals) → rows-only check; recall vs brute
    force is asserted in tests/test_similarity.py."""
    qv = _query_vec(spark, sf)
    return ann_lsh_topk(
        table(spark, sf, "embeddings"), qv, k=TOP_K, n_planes=4
    ).filter(F.col("vec_id") != QUERY_VEC_ID)


def q_ann_ivf_topk(spark: SparkSession, sf: str) -> DataFrame:
    """IVF-bucketed approximate top-k (scale path #2): coarse-quantize,
    probe nprobe cells. Deterministic centroid pick → rows-only check;
    recall vs brute force asserted in tests/test_dedup_similarity.py."""
    qv = _query_vec(spark, sf)
    return ivf_topk(
        table(spark, sf, "embeddings"), qv, k=TOP_K, n_cells=8, nprobe=3
    ).filter(F.col("vec_id") != QUERY_VEC_ID)


def q_embedding_norms(spark: SparkSession, sf: str) -> DataFrame:
    """Vector norm + dimension audit — the sanity scan a pipeline runs
    before any ANN build."""
    e = table(spark, sf, "embeddings")
    v = F.transform("embedding", lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        "label",
        F.size("embedding").alias("dim"),
        F.round(
            F.sqrt(
                F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x)
            ),
            9,
        ).alias("l2_norm"),
    )


SQL_EMBEDDING_NORMS = """
SELECT vec_id, label,
  CAST(len(embedding) AS INTEGER) AS dim,
  ROUND(sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x))), 9) AS l2_norm
FROM embeddings
"""


def q_knn_join(spark: SparkSession, sf: str) -> DataFrame:
    """Exact k-NN JOIN: every 50th vector is a query; each gets its
    top-3 cosine neighbors from the rest of the corpus. Queries are
    broadcast; WindowGroupLimit keeps k rows per query before the
    exchange (see operators/similarity.py::knn_join)."""
    e = table(spark, sf, "embeddings")
    return knn_join(
        e.filter(F.col("vec_id") % 50 == 0),
        e.filter(F.col("vec_id") % 50 != 0),
        k=3,
    )


SQL_KNN_JOIN = """
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id % 50 = 0
),
c AS (
  SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
  FROM embeddings WHERE vec_id % 50 <> 0
),
scored AS (
  SELECT q.query_id, c.neighbor_id,
    ROUND(
      list_sum(list_transform(list_zip(c.cv, q.qv), x -> x[1] * x[2]))
      / (
        sqrt(list_sum(list_transform(c.cv, x -> x * x)))
        * sqrt(list_sum(list_transform(q.qv, x -> x * x)))
      ), 9) AS sim
  FROM c CROSS JOIN q
)
SELECT query_id, neighbor_id, sim, CAST(rk AS INTEGER) AS knn_rank
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rk
  FROM scored
) WHERE rk <= 3
"""


QUERIES: dict[str, Query] = {
    "similarity_cosine_topk": Query(q_cosine_topk, SQL_COSINE_TOPK),
    "similarity_knn_join": Query(q_knn_join, SQL_KNN_JOIN),
    "similarity_cosine_pairs": Query(q_cosine_pairs_blocked, SQL_COSINE_PAIRS_BLOCKED),
    "similarity_ann_lsh": Query(q_ann_lsh_topk, None),
    "similarity_ann_ivf": Query(q_ann_ivf_topk, None),
    "embedding_norms": Query(q_embedding_norms, SQL_EMBEDDING_NORMS),
}
