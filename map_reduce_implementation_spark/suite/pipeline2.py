"""Round-2 LLM-pipeline depth: chunking, mergeable frequency sketch,
changelog compaction, and BM25 retrieval — the remaining data-prep
primitives a 100 TB training pipeline needs beyond dedup/sampling.

Determinism conventions (see base.py): decimal-cast sums, md5-derived
hashes (identical bytes in Spark and DuckDB — unlike murmur3/xxhash,
which differ per engine), fixed-order additions via pivoted columns,
unique tie-break keys on every LIMIT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import tokens as _tokens
from ..sources import table
from .base import Query, dec

CHUNK_SIZE = 128
CHUNK_STRIDE = 96
SQL_TOKENS = "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')"


def q_chunk_documents(spark: SparkSession, sf: str) -> DataFrame:
    """Overlapping fixed-window document chunking (context packing for
    embedding / retrieval indexes): size 128, stride 96 → 32-char
    overlap between consecutive chunks.

    Spark shape: ``sequence()`` generates the start offsets per doc and
    ``posexplode`` fans them out — all JVM array expressions, zero
    shuffles, and the explode multiplies rows AFTER column pruning so
    only (doc_id, text) ever flows. At 100 TB this is a pure map stage:
    chunking parallelism equals scan parallelism, no repartition needed.
    Chunk content is returned as md5 so the row stays narrow; a real
    sink would carry the substring itself.
    """
    d = table(spark, sf, "documents").select("doc_id", "text")
    starts = F.sequence(
        F.lit(1), F.greatest(F.length("text"), F.lit(1)), F.lit(CHUNK_STRIDE)
    )
    chunk = F.expr(f"substring(text, start_pos, {CHUNK_SIZE})")
    return (
        d.select("doc_id", "text", F.posexplode(starts).alias("chunk_idx", "start_pos"))
        .select(
            "doc_id",
            F.col("chunk_idx").cast("int").alias("chunk_idx"),
            F.col("start_pos").cast("int").alias("start_pos"),
            F.length(chunk).alias("chunk_len"),
            F.md5(chunk).alias("chunk_md5"),
        )
    )


SQL_CHUNK_DOCUMENTS = f"""
WITH s AS (
  SELECT doc_id, text,
         unnest(generate_series(1, greatest(length(text),1), {CHUNK_STRIDE})) AS start
  FROM documents
)
SELECT doc_id,
  CAST((start-1)//{CHUNK_STRIDE} AS INTEGER) AS chunk_idx,
  CAST(start AS INTEGER) AS start_pos,
  CAST(length(substr(text, CAST(start AS INTEGER), {CHUNK_SIZE})) AS INTEGER) AS chunk_len,
  md5(substr(text, CAST(start AS INTEGER), {CHUNK_SIZE})) AS chunk_md5
FROM s
"""

CMS_DEPTH = 4
CMS_WIDTH = 1024


def _md5_bucket(prefix: str, term, width: int) -> F.Column:
    """Engine-reproducible hash bucket: md5 is computed identically by
    Spark and DuckDB (unlike murmur3/xxhash), so any sketch layout
    built on it is oracle-checkable. ONE recipe — prefix || term,
    first 8 hex digits, mod width — shared by the CMS and Bloom arms
    so the Spark and SQL sides can't drift independently."""
    h = F.md5(F.concat(F.lit(prefix), term))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % width


def _cms_bucket(depth: int, term) -> F.Column:
    """Row-``depth`` count-min bucket (shared md5 recipe)."""
    return _md5_bucket(f"{depth}|", term, CMS_WIDTH)


def cms_cells(term_counts: DataFrame) -> DataFrame:
    """(d, bucket, cnt) count-min cells from a (term, exact_cnt) count
    table — the mergeable sketch state: cells of a UNION of corpora are
    the cell-wise SUM of each corpus's cells (asserted in
    tests/test_round4_ops.py). Shared by the graded query so the merge
    property is tested against the production layout."""
    return (
        term_counts.select(
            "exact_cnt",
            F.posexplode(
                F.array(*[_cms_bucket(i, F.col("term")) for i in range(CMS_DEPTH)])
            ).alias("d", "bucket"),
        )
        .groupBy("d", "bucket")
        .agg(F.sum("exact_cnt").alias("cnt"))
    )


def q_cms_heavy_hitters(spark: SparkSession, sf: str) -> DataFrame:
    """Count-min-sketch heavy hitters: the mergeable frequency sketch
    (4 rows × 1024 buckets) next to HLL (approx_distinct) and GK
    (approx_percentile) in the sketch family.

    The sketch IS a DataFrame of (row, bucket, cnt) cells — mergeable
    across corpora by cell-wise addition, ≤4096 rows regardless of
    corpus size. Estimates for the exact top-20 terms come from probing
    the broadcast sketch; CMS guarantees est_cnt >= exact_cnt (asserted
    in tests; equality here — collisions need a vocab ≫ 1024).

    Plan: ONE tokenize pass → term-keyed count (map-side combining),
    then cells are the per-term counts re-summed by (row, bucket) — a
    cell's total over its terms equals its total over raw tokens, so
    md5 runs per DISTINCT TERM (vocab-sized, Heaps' law), not per token
    (corpus-sized); measured 1.26× at sf0.1 where the toy vocab is ~50
    terms — the ratio grows with corpus/vocab size, which is the 100 TB
    case. The shuffle moves one row per term; everything after is
    vocab-scale.
    """
    d = table(spark, sf, "documents")
    tok = d.select(F.explode(_tokens(F.col("text"))).alias("term"))
    term_counts = tok.groupBy("term").agg(F.count(F.lit(1)).alias("exact_cnt"))
    cells = cms_cells(term_counts)
    exact = term_counts.orderBy(F.col("exact_cnt").desc(), "term").limit(20)
    probes = exact.select(
        "term",
        "exact_cnt",
        F.posexplode(
            F.array(*[_cms_bucket(i, F.col("term")) for i in range(CMS_DEPTH)])
        ).alias("d", "bucket"),
    )
    return (
        probes.join(F.broadcast(cells), ["d", "bucket"])
        .groupBy("term", "exact_cnt")
        .agg(F.min("cnt").alias("est_cnt"))
    )


SQL_CMS_HEAVY_HITTERS = f"""
WITH tok AS (
  SELECT unnest({SQL_TOKENS}) AS term FROM documents
), hashed AS (
  SELECT term, d,
         CAST(('0x' || substr(md5(d || '|' || term),1,8)) AS BIGINT) % {CMS_WIDTH} AS bucket
  FROM tok CROSS JOIN (SELECT unnest([0,1,2,3]) AS d) s
), cells AS (
  SELECT d, bucket, COUNT(*) AS cnt FROM hashed GROUP BY d, bucket
), exact AS (
  SELECT term, COUNT(*) AS exact_cnt FROM tok GROUP BY term
  ORDER BY exact_cnt DESC, term LIMIT 20
), probes AS (
  SELECT e.term, e.exact_cnt, s.d,
         CAST(('0x' || substr(md5(s.d || '|' || e.term),1,8)) AS BIGINT) % {CMS_WIDTH} AS bucket
  FROM exact e CROSS JOIN (SELECT unnest([0,1,2,3]) AS d) s
)
SELECT p.term, p.exact_cnt, MIN(c.cnt) AS est_cnt
FROM probes p JOIN cells c ON p.d = c.d AND p.bucket = c.bucket
GROUP BY p.term, p.exact_cnt
"""


def q_upsert_snapshot(spark: SparkSession, sf: str) -> DataFrame:
    """Changelog → snapshot compaction (CDC upsert): latest event per
    user, ties broken by event_id. The keep-LAST twin of
    ``dedup_keep_first`` — the shape of every "current state" view over
    an append-only log.

    One user-keyed shuffle; Spark plans the rn=1 filter as
    WindowGroupLimit, keeping only each partition's top row before the
    exchange (the same optimization the top-k-per-group query
    plan-asserts). At 100 TB: compaction cost = one shuffle of the
    changelog, and with the log bucketed by user_id it becomes
    shuffle-free.
    """
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        table(spark, sf, "events")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("ts").alias("last_ts"),
            F.col("event_type").alias("last_type"),
            F.col("value").alias("last_value"),
        )
    )


SQL_UPSERT_SNAPSHOT = """
SELECT user_id, event_id AS last_event_id, ts AS last_ts,
       event_type AS last_type, value AS last_value
FROM events
QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
"""

BM25_TERMS = ("join", "hash", "scan")
BM25_K1 = 1.2
BM25_B = 0.75


def _bm25_scored(spark: SparkSession, sf: str) -> DataFrame:
    """Per-doc BM25 scores (docs matching ≥1 query term) — shared by the
    top-k query and the RRF hybrid fusion. See q_bm25_topk for the
    one-shuffle plan rationale."""
    d = table(spark, sf, "documents")
    tok = d.select("doc_id", F.explode(_tokens(F.col("text"))).alias("term"))
    perdoc = tok.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("dl"),
        *[
            F.count(F.when(F.col("term") == t, 1)).alias(f"tf_{t}")
            for t in BM25_TERMS
        ],
    )
    stats = perdoc.agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum(dec("dl")).cast("double") / F.count(F.lit(1))).alias("avgdl"),
        *[
            F.count(F.when(F.col(f"tf_{t}") > 0, 1)).alias(f"df_{t}")
            for t in BM25_TERMS
        ],
    )

    def term_score(t: str) -> F.Column:
        tf, df_ = F.col(f"tf_{t}"), F.col(f"df_{t}")
        idf = F.log((F.col("n") - df_ + 0.5) / (df_ + 0.5) + 1.0)
        s = idf * (tf * (BM25_K1 + 1.0)) / (
            tf + BM25_K1 * (1.0 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
        )
        return F.when(tf > 0, s).otherwise(F.lit(0.0))

    total = (
        term_score(BM25_TERMS[0]) + term_score(BM25_TERMS[1]) + term_score(BM25_TERMS[2])
    )
    return (
        perdoc.join(F.broadcast(stats))
        .filter(sum(F.col(f"tf_{t}") for t in BM25_TERMS) > 0)
        .select("doc_id", F.round(total, 6).alias("bm25"))
    )


def q_bm25_topk(spark: SparkSession, sf: str) -> DataFrame:
    """BM25 keyword retrieval: top-20 docs for a fixed 3-term query —
    the lexical-search complement to the embedding similarity queries
    (hybrid retrieval = this ∪ similarity_cosine_topk).

    Plan: ONE doc-keyed shuffle total. The naive formulation (separate
    dl / tf / df aggregations re-joined on doc_id and term) costs 7
    exchanges; instead a single groupBy(doc_id) computes dl AND the
    three per-term tfs as conditional counts, and a single global agg
    over that folds N, avgdl and the three dfs into one broadcast row.
    Per-term scores are added in FIXED order — double addition is not
    associative, so a SUM over an unordered term group could differ
    from the oracle in the last bit; the explicit s_join+s_hash+s_scan
    tree is identical on both engines. Top-20 via
    TakeOrderedAndProject.
    """
    return (
        _bm25_scored(spark, sf)
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(20)
    )


SQL_BM25_CTES = f"""tok AS (
  SELECT doc_id, unnest({SQL_TOKENS}) AS term FROM documents
), dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
stats AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(CAST(dl AS DECIMAL(18,2))) AS DOUBLE)/COUNT(*) AS avgdl
  FROM dl
),
tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM tok
  WHERE term IN ('join','hash','scan') GROUP BY doc_id, term
),
df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id, tf.term,
    ln((stats.n - df.df + 0.5)/(df.df + 0.5) + 1.0)
      * (tf.tf * {BM25_K1 + 1.0}) / (tf.tf + {BM25_K1} * ({1.0 - BM25_B} + {BM25_B} * dl.dl / stats.avgdl)) AS s
  FROM tf JOIN df ON tf.term = df.term JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN stats
), bm AS (
  SELECT doc_id,
    ROUND(COALESCE(MAX(CASE WHEN term='join' THEN s END),0)
        + COALESCE(MAX(CASE WHEN term='hash' THEN s END),0)
        + COALESCE(MAX(CASE WHEN term='scan' THEN s END),0), 6) AS bm25
  FROM scored GROUP BY doc_id
)"""

SQL_BM25_TOPK = f"""
WITH {SQL_BM25_CTES}
SELECT doc_id, bm25 FROM bm ORDER BY bm25 DESC, doc_id LIMIT 20
"""


RRF_K = 60
RRF_POOL = 50


def q_hybrid_rrf_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Hybrid retrieval: reciprocal-rank fusion of the BM25 lexical
    ranking and the embedding-cosine ranking (doc_id ≡ vec_id in the
    synthetic corpus) — rrf = Σ 1/(60 + rank), the standard
    fusion used by hybrid search engines.

    Plan: each arm is an independent top-50 TakeOrderedAndProject (no
    global sort); ranking then runs on exactly 50 rows per arm, so the
    unpartitioned row_number window is a 50-row single task, not a
    scale hazard. The arms meet in a tiny full-outer join (≤100 rows).
    At 100 TB each arm's cost is its own query (BM25: one doc-keyed
    shuffle; cosine: one scan + TakeOrdered); fusion cost is constant.
    """
    from .similarity import QUERY_VEC_ID, _query_vec

    bm_top = (
        _bm25_scored(spark, sf)
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(RRF_POOL)
    )
    bm_ranked = bm_top.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.col("bm25").desc(), "doc_id"))
        .alias("r_lex"),
    )
    qv = _query_vec(spark, sf)
    from ..operators.similarity import cosine_topk

    cos_top = cosine_topk(
        table(spark, sf, "embeddings"), qv, k=RRF_POOL, exclude_id=QUERY_VEC_ID
    )
    cos_ranked = cos_top.select(
        F.col("vec_id").alias("doc_id"),
        F.row_number()
        .over(Window.orderBy(F.col("sim").desc(), F.col("vec_id")))
        .alias("r_vec"),
    )
    one = F.lit(1).cast("double")
    rrf = F.round(
        F.coalesce(one / (F.lit(RRF_K) + F.col("r_lex")), F.lit(0.0))
        + F.coalesce(one / (F.lit(RRF_K) + F.col("r_vec")), F.lit(0.0)),
        9,
    )
    return (
        bm_ranked.join(cos_ranked, "doc_id", "full_outer")
        .select("doc_id", rrf.alias("rrf"))
        .orderBy(F.col("rrf").desc(), "doc_id")
        .limit(20)
    )


SQL_HYBRID_RRF_TOPK = f"""
WITH {SQL_BM25_CTES},
bm_ranked AS (
  SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS r_lex
  FROM (SELECT * FROM bm ORDER BY bm25 DESC, doc_id LIMIT {RRF_POOL})
),
q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
cos_scored AS (
  SELECT e.vec_id,
    ROUND(
      list_sum(list_transform(list_zip(CAST(e.embedding AS DOUBLE[]), q.qv), x -> x[1] * x[2]))
      / (
        sqrt(list_sum(list_transform(CAST(e.embedding AS DOUBLE[]), x -> x * x)))
        * sqrt(list_sum(list_transform(q.qv, x -> x * x)))
      ), 9) AS sim
  FROM embeddings e, q WHERE e.vec_id <> 0
),
cos_ranked AS (
  SELECT vec_id AS doc_id, row_number() OVER (ORDER BY sim DESC, vec_id) AS r_vec
  FROM (SELECT * FROM cos_scored ORDER BY sim DESC, vec_id LIMIT {RRF_POOL})
)
SELECT COALESCE(b.doc_id, c.doc_id) AS doc_id,
  ROUND(COALESCE(CAST(1 AS DOUBLE)/({RRF_K} + b.r_lex), 0)
      + COALESCE(CAST(1 AS DOUBLE)/({RRF_K} + c.r_vec), 0), 9) AS rrf
FROM bm_ranked b FULL OUTER JOIN cos_ranked c ON b.doc_id = c.doc_id
ORDER BY rrf DESC, doc_id LIMIT 20
"""


BLOOM_M = 8192  # bits
BLOOM_K = 4  # hash functions


def _bloom_bucket(i: int, term) -> F.Column:
    """Hash-``i`` bit position (shared md5 recipe, Bloom prefix/width)."""
    return _md5_bucket(f"b{i}|", term, BLOOM_M)


def q_bloom_decontaminate(spark: SparkSession, sf: str) -> DataFrame:
    """Bloom-filter decontamination probe — the sketch the exact
    ``decontaminate`` broadcast set gets replaced with when the eval
    suite grows past broadcast size: a {BLOOM_M}-bit, {BLOOM_K}-hash
    Bloom over the eval docs' (doc_id % 10 == 0) term set, probed by
    every training doc. A term is flagged iff ALL {BLOOM_K} bits hit
    (no false negatives; false positives possible). Output per
    training doc: term count, Bloom-flagged count, EXACT overlap count
    (so the artifact shows the one-sided error: flagged >= exact,
    asserted in tests), and the flag rate.

    100 TB shape: the Bloom IS a DataFrame of set bit positions
    (<= {BLOOM_M} rows regardless of eval size — strictly mergeable by
    union/distinct) broadcast into the probe join; the training stream
    shuffles once for its own per-doc term distinct. md5-derived
    positions make the whole sketch DuckDB-reproducible."""
    d = table(spark, sf, "documents")
    # Round-12 optimization (guide §2.4): the term stream feeds five
    # plan references (eval side + the train side's probes / exact /
    # per-doc counts) and the eval term set two — materialize each
    # once instead of re-tokenizing the corpus per consumer (10 scans
    # → 0 rescans)
    dt = d.select(
        "doc_id", F.explode(F.array_distinct(_tokens(F.col("text")))).alias("term")
    ).localCheckpoint(eager=True)
    ev_terms = (
        dt.filter(F.col("doc_id") % 10 == 0)
        .select("term")
        .distinct()
        .localCheckpoint(eager=True)
    )
    bits = (
        ev_terms.select(
            F.explode(
                F.array(*[_bloom_bucket(i, F.col("term")) for i in range(BLOOM_K)])
            ).alias("bit")
        )
        .distinct()
    )
    train = dt.filter(F.col("doc_id") % 10 != 0)
    probes = train.select(
        "doc_id",
        "term",
        F.explode(
            F.array(*[_bloom_bucket(i, F.col("term")) for i in range(BLOOM_K)])
        ).alias("bit"),
    )
    term_hits = (
        probes.join(F.broadcast(bits), "bit")
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("nbits"))
        .filter(F.col("nbits") == BLOOM_K)
    )
    exact_hits = train.join(F.broadcast(ev_terms), "term")
    per_doc = train.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_terms"))
    flagged = term_hits.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bloom_flagged")
    )
    exact = exact_hits.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_exact"))
    return (
        per_doc.join(flagged, "doc_id", "left")
        .join(exact, "doc_id", "left")
        .select(
            "doc_id",
            "n_terms",
            F.coalesce("n_bloom_flagged", F.lit(0)).alias("n_bloom_flagged"),
            F.coalesce("n_exact", F.lit(0)).alias("n_exact"),
            F.round(
                F.coalesce("n_bloom_flagged", F.lit(0)).cast("double")
                / F.col("n_terms"),
                6,
            ).alias("flag_rate"),
        )
    )


def _sql_bloom_bucket(i: int, term: str) -> str:
    return f"('0x' || substr(md5('b{i}|' || {term}), 1, 8))::BIGINT % {BLOOM_M}"


SQL_BLOOM_DECONTAMINATE = f"""
WITH dt AS (
  SELECT DISTINCT doc_id,
    unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                       x -> x <> '')) AS term
  FROM documents
),
ev AS (SELECT DISTINCT term FROM dt WHERE doc_id % 10 = 0),
bits AS (
  SELECT DISTINCT {_sql_bloom_bucket(0, 'term')} AS bit FROM ev
  {" ".join(f"UNION SELECT DISTINCT {_sql_bloom_bucket(i, 'term')} FROM ev" for i in range(1, BLOOM_K))}
),
train AS (SELECT doc_id, term FROM dt WHERE doc_id % 10 <> 0),
probes AS (
  SELECT doc_id, term,
    unnest([{", ".join(_sql_bloom_bucket(i, "term") for i in range(BLOOM_K))}]) AS bit
  FROM train
),
term_hits AS (
  SELECT doc_id, term FROM probes JOIN bits USING (bit)
  GROUP BY doc_id, term HAVING COUNT(*) = {BLOOM_K}
),
per_doc AS (SELECT doc_id, COUNT(*) AS n_terms FROM train GROUP BY doc_id),
flagged AS (SELECT doc_id, COUNT(*) AS n_bloom_flagged FROM term_hits GROUP BY doc_id),
exact AS (
  SELECT t.doc_id, COUNT(*) AS n_exact FROM train t JOIN ev USING (term)
  GROUP BY t.doc_id
)
SELECT p.doc_id, p.n_terms,
  COALESCE(f.n_bloom_flagged, 0) AS n_bloom_flagged,
  COALESCE(e.n_exact, 0) AS n_exact,
  ROUND(CAST(COALESCE(f.n_bloom_flagged, 0) AS DOUBLE) / p.n_terms, 6) AS flag_rate
FROM per_doc p
LEFT JOIN flagged f ON p.doc_id = f.doc_id
LEFT JOIN exact e ON p.doc_id = e.doc_id
"""


QUERIES: dict[str, Query] = {
    "chunk_documents": Query(q_chunk_documents, SQL_CHUNK_DOCUMENTS),
    "bloom_decontaminate": Query(q_bloom_decontaminate, SQL_BLOOM_DECONTAMINATE),
    "cms_heavy_hitters": Query(q_cms_heavy_hitters, SQL_CMS_HEAVY_HITTERS),
    "upsert_snapshot": Query(q_upsert_snapshot, SQL_UPSERT_SNAPSHOT),
    "text_bm25_topk": Query(q_bm25_topk, SQL_BM25_TOPK),
    "hybrid_rrf_topk": Query(q_hybrid_rrf_topk, SQL_HYBRID_RRF_TOPK),
}
