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


# --- ANN recall@k entries: both approximate arms graded semantically ---
#
# The production LSH/IVF arms (seeded gaussian hyperplanes, Lloyd-iterated
# centroids) are engine-specific and stay rows-only. These twins re-express
# each arm with parameters BOTH engines can derive exactly — integer-valued
# hyperplanes from a closed-form formula, first-k vectors as centroids with
# zero Lloyd iterations — so bucketing, probing, candidate scoring, AND the
# recall@k number against the exact top-k are all DuckDB-hash-verified.
# Same plan shapes and same physics as the production arms; only the
# parameter source differs.

N_PLANES = 4  # 16 buckets over 500 vectors at sf0.01
IVF_CELLS = 8
IVF_PROBE = 2


def _int_plane(i: int, dim: int) -> list[float]:
    """Hyperplane i: integer components ((i·37 + j·101) mod 19) − 9 —
    exactly representable doubles, so sign(dot) is bit-identical across
    engines (no gaussian literals to ship into the SQL)."""
    return [float(((i * 37 + j * 101) % 19) - 9) for j in range(dim)]


def q_ann_lsh_recall(spark: SparkSession, sf: str) -> DataFrame:
    """LSH recall@k, end-to-end driver-gradable: bucket every vector by
    hyperplane sign bits, keep the query's bucket, exact-score the
    candidates, and report |ANN∩exact| / k against the brute-force
    top-k. One row: (k, n_candidates, hits, recall_at_k)."""
    from ..operators.similarity import _as_double, cosine, dot, lit_vector

    e = table(spark, sf, "embeddings")
    qv = _query_vec(spark, sf)
    dim = len(qv)

    def bucket_col(v):
        b = F.lit(0)
        for i in range(N_PLANES):
            p = _as_double(lit_vector(_int_plane(i, dim)))
            b = b + F.when(dot(v, p) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        return b

    emb = e.select("vec_id", _as_double("embedding").alias("v"))
    wb = emb.select("vec_id", "v", bucket_col(F.col("v")).alias("bucket"))
    # Round-12 optimization (guide §2.4): the query's bucket is N_PLANES
    # sign bits of dots of the ALREADY-collected query vector — fold
    # them in Python (the identical left-to-right IEEE fold the Catalyst
    # `dot` runs, so the sign decisions are bit-equal) instead of
    # re-scanning the corpus for one row and broadcast-joining it back;
    # and the candidate set feeds TWO consumers (the top-k sort and
    # n_candidates), so it is checkpointed once instead of replaying
    # the bucket-assignment scan per consumer. 5 scans → 2.
    qbucket = 0
    for i in range(N_PLANES):
        acc = 0.0
        for a, b in zip(qv, _int_plane(i, dim)):
            acc = acc + a * b
        if acc >= 0:
            qbucket += 1 << i
    cand = wb.filter(
        (F.col("bucket") == F.lit(qbucket))
        & (F.col("vec_id") != QUERY_VEC_ID)
    ).localCheckpoint(eager=True)
    qlit = _as_double(lit_vector(qv))
    ann = (
        cand.select("vec_id", F.round(cosine(F.col("v"), qlit), 9).alias("sim"))
        .orderBy(F.desc("sim"), F.asc("vec_id"))
        .limit(TOP_K)
        .select("vec_id")
    )
    exact = cosine_topk(e, qv, k=TOP_K, exclude_id=QUERY_VEC_ID).select("vec_id")
    hits = ann.join(exact, "vec_id").agg(F.count("*").alias("hits"))
    ncand = cand.agg(F.count("*").alias("n_candidates"))
    return ncand.crossJoin(hits).select(
        F.lit(TOP_K).alias("k"),
        "n_candidates",
        "hits",
        (F.col("hits").cast("double") / TOP_K).alias("recall_at_k"),
    )


def _sql_ann_lsh_recall() -> str:
    def plane(i: int) -> str:
        return (
            "list_transform(range(0, len(embedding)), "
            f"j -> CAST((({i}*37 + j*101) % 19) - 9 AS DOUBLE))"
        )

    terms = " + ".join(
        "(CASE WHEN list_sum(list_transform(list_zip(CAST(embedding AS DOUBLE[]), "
        f"{plane(i)}), x -> x[1] * x[2])) >= 0 THEN {1 << i} ELSE 0 END)"
        for i in range(N_PLANES)
    )
    return f"""
WITH b AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, {terms} AS bucket FROM embeddings
),
q AS (SELECT v AS qv, bucket AS qbucket FROM b WHERE vec_id = {QUERY_VEC_ID}),
cand AS (
  SELECT b.vec_id, b.v FROM b, q WHERE b.bucket = q.qbucket AND b.vec_id <> {QUERY_VEC_ID}
),
scored AS (
  SELECT c.vec_id,
    ROUND(list_sum(list_transform(list_zip(c.v, q.qv), x -> x[1] * x[2]))
      / (sqrt(list_sum(list_transform(c.v, x -> x * x)))
         * sqrt(list_sum(list_transform(q.qv, x -> x * x)))), 9) AS sim
  FROM cand c, q
),
ann AS (SELECT vec_id FROM scored ORDER BY sim DESC, vec_id ASC LIMIT {TOP_K}),
exact AS (
  SELECT e.vec_id,
    ROUND(list_sum(list_transform(list_zip(CAST(e.embedding AS DOUBLE[]), q.qv), x -> x[1] * x[2]))
      / (sqrt(list_sum(list_transform(CAST(e.embedding AS DOUBLE[]), x -> x * x)))
         * sqrt(list_sum(list_transform(q.qv, x -> x * x)))), 9) AS sim
  FROM embeddings e, q WHERE e.vec_id <> {QUERY_VEC_ID}
  ORDER BY sim DESC, vec_id ASC LIMIT {TOP_K}
),
h AS (SELECT COUNT(*) AS hits FROM ann JOIN exact USING (vec_id)),
nc AS (SELECT COUNT(*) AS n_candidates FROM cand)
SELECT {TOP_K} AS k, n_candidates, hits, CAST(hits AS DOUBLE) / {TOP_K} AS recall_at_k
FROM nc, h
"""


def q_ann_ivf_recall(spark: SparkSession, sf: str) -> DataFrame:
    """IVF recall@k, end-to-end driver-gradable: coarse-quantize onto
    the first-{IVF_CELLS} vectors as centroids (deterministic init,
    zero Lloyd iterations — SQL-reproducible), probe the query's
    {IVF_PROBE} nearest cells, exact-score the candidates, report
    recall vs brute force. Probe-cell choice happens driver-side from
    the same sequential-fold arithmetic both engines use (a k×dim
    scalar computation — not a collect of data rows)."""
    from ..operators.similarity import _as_double, cosine, ivf_assign, lit_vector

    e = table(spark, sf, "embeddings")
    qv = _query_vec(spark, sf)
    cents = [
        [float(x) for x in r["embedding"]]
        for r in e.filter(F.col("vec_id") < IVF_CELLS)
        .orderBy("vec_id")
        .select("embedding")
        .collect()
    ]
    d2 = []
    for c in cents:
        s = 0.0
        for a, b in zip(qv, c):
            s += (a - b) * (a - b)
        d2.append(s)
    probe = [i for _, i in sorted((d, i) for i, d in enumerate(d2))[:IVF_PROBE]]
    # Round-12 optimization (guide §2.4): cand feeds two consumers (the
    # top-k sort and n_candidates) — checkpoint the probed subset once
    # instead of replaying the corpus-wide cell assignment per consumer
    cand = ivf_assign(e, cents).filter(
        F.col("cell").isin(probe) & (F.col("vec_id") != QUERY_VEC_ID)
    ).localCheckpoint(eager=True)
    qlit = _as_double(lit_vector(qv))
    ann = (
        cand.select(
            "vec_id",
            F.round(cosine(_as_double("embedding"), qlit), 9).alias("sim"),
        )
        .orderBy(F.desc("sim"), F.asc("vec_id"))
        .limit(TOP_K)
        .select("vec_id")
    )
    exact = cosine_topk(e, qv, k=TOP_K, exclude_id=QUERY_VEC_ID).select("vec_id")
    hits = ann.join(exact, "vec_id").agg(F.count("*").alias("hits"))
    ncand = cand.agg(F.count("*").alias("n_candidates"))
    return ncand.crossJoin(hits).select(
        F.lit(TOP_K).alias("k"),
        "n_candidates",
        "hits",
        (F.col("hits").cast("double") / TOP_K).alias("recall_at_k"),
    )


SQL_ANN_IVF_RECALL = f"""
WITH q AS (
  SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = {QUERY_VEC_ID}
),
cents AS (
  SELECT vec_id AS c_id, CAST(embedding AS DOUBLE[]) AS cv
  FROM embeddings WHERE vec_id < {IVF_CELLS}
),
probe AS (
  SELECT c_id FROM (
    SELECT c.c_id,
      list_sum(list_transform(list_zip(q.qv, c.cv), x -> (x[1]-x[2])*(x[1]-x[2]))) AS d2
    FROM cents c, q
  ) ORDER BY d2 ASC, c_id ASC LIMIT {IVF_PROBE}
),
assign AS (
  SELECT vec_id, c_id AS cell FROM (
    SELECT e.vec_id, c.c_id,
      list_sum(list_transform(list_zip(CAST(e.embedding AS DOUBLE[]), c.cv),
               x -> (x[1]-x[2])*(x[1]-x[2]))) AS d2,
      ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
        list_sum(list_transform(list_zip(CAST(e.embedding AS DOUBLE[]), c.cv),
                 x -> (x[1]-x[2])*(x[1]-x[2]))) ASC, c.c_id ASC) AS rk
    FROM embeddings e, cents c
  ) WHERE rk = 1
),
cand AS (
  SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS v
  FROM embeddings e JOIN assign a USING (vec_id)
  WHERE a.cell IN (SELECT c_id FROM probe) AND e.vec_id <> {QUERY_VEC_ID}
),
scored AS (
  SELECT c.vec_id,
    ROUND(list_sum(list_transform(list_zip(c.v, q.qv), x -> x[1] * x[2]))
      / (sqrt(list_sum(list_transform(c.v, x -> x * x)))
         * sqrt(list_sum(list_transform(q.qv, x -> x * x)))), 9) AS sim
  FROM cand c, q
),
ann AS (SELECT vec_id FROM scored ORDER BY sim DESC, vec_id ASC LIMIT {TOP_K}),
exact AS (
  SELECT e.vec_id,
    ROUND(list_sum(list_transform(list_zip(CAST(e.embedding AS DOUBLE[]), q.qv), x -> x[1] * x[2]))
      / (sqrt(list_sum(list_transform(CAST(e.embedding AS DOUBLE[]), x -> x * x)))
         * sqrt(list_sum(list_transform(q.qv, x -> x * x)))), 9) AS sim
  FROM embeddings e, q WHERE e.vec_id <> {QUERY_VEC_ID}
  ORDER BY sim DESC, vec_id ASC LIMIT {TOP_K}
),
h AS (SELECT COUNT(*) AS hits FROM ann JOIN exact USING (vec_id)),
nc AS (SELECT COUNT(*) AS n_candidates FROM cand)
SELECT {TOP_K} AS k, n_candidates, hits, CAST(hits AS DOUBLE) / {TOP_K} AS recall_at_k
FROM nc, h
"""


QUERIES: dict[str, Query] = {
    "similarity_cosine_topk": Query(q_cosine_topk, SQL_COSINE_TOPK),
    "similarity_ann_recall": Query(q_ann_lsh_recall, _sql_ann_lsh_recall()),
    "similarity_ann_ivf_recall": Query(q_ann_ivf_recall, SQL_ANN_IVF_RECALL),
    "similarity_knn_join": Query(q_knn_join, SQL_KNN_JOIN),
    "similarity_cosine_pairs": Query(q_cosine_pairs_blocked, SQL_COSINE_PAIRS_BLOCKED),
    "similarity_ann_lsh": Query(q_ann_lsh_topk, None),
    "similarity_ann_ivf": Query(q_ann_ivf_topk, None),
    "embedding_norms": Query(q_embedding_norms, SQL_EMBEDDING_NORMS),
}
