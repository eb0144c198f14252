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
from .text import SQL_UNIGRAM_NLL_CTE

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
    tie-safe integer-quantized component sums (posexplode →
    (label, dim)-keyed agg — uniform keys, map-side combinable),
    centroids collected driver-side (labels × dim scalars, the bounded
    IVF-style collect), every vector assigned to its nearest centroid
    by the literal-fold argmin, and the confusion matrix (true,
    predicted, n) reported. Ties break to the lowest label id on both
    engines.

    Means are double-divisions of exact floor(x·1e7+0.5) integer sums
    (base.py: a raw-float32 decimal cast can land on a rounding-
    boundary tie where the engines differ by one ulp), so both engines
    materialize bit-identical centroid literals — the whole pipeline
    stays hash-exact without a single approximate compare."""
    from ..operators.similarity import _as_double

    e = table(spark, sf, "embeddings")
    comp = e.select(
        "label", F.posexplode(_as_double("embedding")).alias("pos", "x")
    )
    # float32 cells are dyadic rationals that can land EXACTLY on a
    # decimal rounding boundary, where Spark's BigDecimal HALF_UP and
    # DuckDB's float path disagree by one ulp (base.py convention, and
    # observed: 0.1983642578125 in the shipped sf0.01 data) — so
    # quantize with the modeless floor(x·1e7 + 0.5) and sum exact longs
    cent = comp.groupBy("label", "pos").agg(
        F.sum(F.floor(F.col("x") * 1e7 + 0.5).cast("long")).alias("sq"),
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
                            (
                                F.col("sq").cast("double")
                                / (F.lit(1e7) * F.col("n"))
                            ).alias("m"),
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
    CAST(SUM(CAST(FLOOR(x * 10000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
      / (10000000.0 * COUNT(*)) AS m
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
    from .text import unigram_avg_nll

    # Round-12 optimization (guide §2.4): the per-doc NLL frame feeds
    # the cut-point aggregate AND the bucketing pass — materialize once
    # instead of replaying the unigram-LM scoring pipeline per consumer
    # (8 parquet scans → 0 rescans)
    nll = (
        unigram_avg_nll(spark, sf)
        .select("doc_id", "avg_nll")
        .localCheckpoint(eager=True)
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


SQL_PERPLEXITY_BUCKET_SAMPLE = SQL_UNIGRAM_NLL_CTE + f""",
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


# --- round-4 wave 2: corpus profiling ---

STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "it")
GQ_MIN_WORDS, GQ_MAX_WORDS = 20, 100_000
GQ_MIN_MWL, GQ_MAX_MWL = 3.0, 10.0
GQ_MAX_SYMBOL_RATIO = 0.1
GQ_MIN_STOP_HITS = 2


def q_gopher_quality_gate(spark: SparkSession, sf: str) -> DataFrame:
    """Gopher-style (Rae et al. 2021 §A1.1) rule battery as a keep/drop
    gate: word-count bounds, mean-word-length bounds, symbol-to-word
    ratio, and >= {GQ_MIN_STOP_HITS} distinct stopwords present. Every
    metric is an array expression over one tokenize — a ZERO-shuffle
    pure map stage at any scale (the cheapest possible quality gate:
    it reads each doc once and never moves it). Integer sums keep
    mean_word_len exact before the one rounded division."""
    from ..functions import tokens as _toks

    d = table(spark, sf, "documents")
    t = d.select("doc_id", F.col("text"), _toks(F.col("text")).alias("t"))
    n_words = F.size("t")
    char_sum = F.aggregate("t", F.lit(0), lambda acc, x: acc + F.length(x))
    # zero-token docs (pure punctuation — exactly what a quality gate
    # exists to classify) must yield NULL ratios and keep=false, not an
    # ANSI DIVIDE_BY_ZERO that kills the whole arm; the CASE guard
    # matches the oracle, where list_sum([]) is NULL and NULL/0 is NULL
    mwl = F.when(
        n_words > 0, F.round(char_sum.cast("double") / n_words, 4)
    )
    symbols = F.size(F.regexp_extract_all("text", F.lit("[#…]"), 0))
    sym_ratio = F.when(
        n_words > 0, F.round(symbols.cast("double") / n_words, 6)
    )
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct("t"), F.array(*[F.lit(s) for s in STOPWORDS])
        )
    )
    out = t.select(
        "doc_id",
        n_words.alias("n_words"),
        mwl.alias("mean_word_len"),
        sym_ratio.alias("symbol_ratio"),
        stop_hits.alias("stop_hits"),
    )
    return out.withColumn(
        "keep",
        (F.col("n_words") >= GQ_MIN_WORDS)
        & (F.col("n_words") <= GQ_MAX_WORDS)
        & (F.col("mean_word_len") >= GQ_MIN_MWL)
        & (F.col("mean_word_len") <= GQ_MAX_MWL)
        & (F.col("symbol_ratio") < GQ_MAX_SYMBOL_RATIO)
        & (F.col("stop_hits") >= GQ_MIN_STOP_HITS),
    )


SQL_GOPHER_QUALITY_GATE = f"""
WITH t AS (
  SELECT doc_id, text,
    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS t
  FROM documents
),
m AS (
  SELECT doc_id,
    CAST(len(t) AS INTEGER) AS n_words,
    ROUND(CAST(list_sum(list_transform(t, x -> len(x))) AS DOUBLE) / len(t), 4)
      AS mean_word_len,
    ROUND(CAST(len(regexp_extract_all(text, '[#…]')) AS DOUBLE) / len(t), 6)
      AS symbol_ratio,
    CAST(len(list_intersect(list_distinct(t),
        [{", ".join(repr(s) for s in STOPWORDS)}])) AS INTEGER) AS stop_hits
  FROM t
)
SELECT *,
  (n_words >= {GQ_MIN_WORDS} AND n_words <= {GQ_MAX_WORDS}
   AND mean_word_len >= {GQ_MIN_MWL} AND mean_word_len <= {GQ_MAX_MWL}
   AND symbol_ratio < {GQ_MAX_SYMBOL_RATIO}
   AND stop_hits >= {GQ_MIN_STOP_HITS}) AS keep
FROM m
"""


def q_embedding_dim_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Per-dimension profile of the embedding matrix (the sanity pass
    a pipeline runs before trusting a new embedding export: dead dims,
    scale drift, outliers): n, mean, min, max, variance per dimension.

    Moments use a PURE-IEEE 1e-7 quantizer: q = floor(x·1e7 + 0.5) is
    the same double multiply/add/floor in every engine — including the
    tie cases where double→DECIMAL casts diverge (Spark's exact
    BigDecimal HALF_UP vs DuckDB's float path disagreed in the last
    ulp on exactly one of 32k cells here; floor() has no modes) — and
    the integer sums that follow are exact and order-independent. One
    posexplode + one (pos)-keyed agg: uniform keys, map-side
    combinable, output rows = dimensionality."""
    from ..operators.similarity import _as_double

    e = table(spark, sf, "embeddings")
    comp = e.select(F.posexplode(_as_double("embedding")).alias("pos", "x"))
    q = F.floor(F.col("x") * F.lit(1e7) + F.lit(0.5))
    comp = comp.select("pos", "x", q.alias("q"))
    s_d = F.sum("q").cast("double")
    ssq_d = F.sum(
        F.col("q").cast("decimal(18,0)") * F.col("q").cast("decimal(18,0)")
    ).cast("double")
    n_c = F.count(F.lit(1))
    return comp.groupBy("pos").agg(
        n_c.alias("n"),
        (s_d / F.lit(1e7) / n_c).alias("mean"),
        F.min("x").alias("min_x"),
        F.max("x").alias("max_x"),
        F.round(
            (ssq_d / F.lit(1e14) - s_d / F.lit(1e7) * (s_d / F.lit(1e7)) / n_c)
            / n_c,
            9,
        ).alias("variance"),
    )


SQL_EMBEDDING_DIM_STATS = """
WITH comp AS (
  SELECT i - 1 AS pos, v[i] AS x,
    CAST(floor(v[i] * 1e7 + 0.5) AS BIGINT) AS q
  FROM (
    SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings
  ), range(1, 100000) r(i) WHERE i <= len(v)
)
SELECT CAST(pos AS INTEGER) AS pos, COUNT(*) AS n,
  CAST(SUM(q) AS DOUBLE) / 1e7 / COUNT(*) AS mean,
  MIN(x) AS min_x, MAX(x) AS max_x,
  ROUND((CAST(SUM(CAST(q AS DECIMAL(18,0)) * CAST(q AS DECIMAL(18,0))) AS DOUBLE) / 1e14
         - CAST(SUM(q) AS DOUBLE) / 1e7 * (CAST(SUM(q) AS DOUBLE) / 1e7) / COUNT(*))
        / COUNT(*), 9) AS variance
FROM comp GROUP BY pos
"""


def q_tokenizer_fertility(spark: SparkSession, sf: str) -> DataFrame:
    """Per-language tokenizer fertility report (the number that sizes
    a multilingual token budget): docs, token count, type-token ratio,
    chars-per-token, tokens-per-doc and source-bytes-per-token. Two
    independent aggregates — a doc-level one for n_docs/byte totals
    and a token-level one for counts/vocab — joined on the ~constant
    lang key; integer numerators keep every ratio exact before its
    one rounded division. The token stream shuffles once on
    (lang, term) for the distinct, then collapses to lang."""
    from ..functions import tokens as _toks

    d = table(spark, sf, "documents")
    # true UTF-8 bytes (octet_length), not the n_chars character count:
    # for multi-byte scripts the two differ 2-3x and this column is the
    # per-language token-budget number
    docs = d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.octet_length("text")).alias("bytes_total"),
    )
    tok = d.select(
        "lang", F.explode(_toks(F.col("text"))).alias("term")
    )
    toks = tok.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.countDistinct("term").alias("n_types"),
        F.sum(F.length("term")).alias("token_chars"),
    )
    return docs.join(toks, "lang").select(
        "lang",
        "n_docs",
        "n_tokens",
        "n_types",
        F.round(F.col("n_types").cast("double") / F.col("n_tokens"), 6).alias("ttr"),
        F.round(F.col("token_chars").cast("double") / F.col("n_tokens"), 6).alias(
            "chars_per_token"
        ),
        F.round(F.col("n_tokens").cast("double") / F.col("n_docs"), 6).alias(
            "tokens_per_doc"
        ),
        F.round(F.col("bytes_total").cast("double") / F.col("n_tokens"), 6).alias(
            "bytes_per_token"
        ),
    )


SQL_TOKENIZER_FERTILITY = """
WITH docs AS (
  SELECT lang, COUNT(*) AS n_docs, CAST(SUM(strlen(text)) AS BIGINT) AS bytes_total
  FROM documents GROUP BY lang
),
tok AS (
  SELECT lang,
    unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                       x -> x <> '')) AS term
  FROM documents
),
toks AS (
  SELECT lang, COUNT(*) AS n_tokens, COUNT(DISTINCT term) AS n_types,
    SUM(len(term)) AS token_chars
  FROM tok GROUP BY lang
)
SELECT d.lang, d.n_docs, t.n_tokens, t.n_types,
  ROUND(CAST(t.n_types AS DOUBLE) / t.n_tokens, 6) AS ttr,
  ROUND(CAST(t.token_chars AS DOUBLE) / t.n_tokens, 6) AS chars_per_token,
  ROUND(CAST(t.n_tokens AS DOUBLE) / d.n_docs, 6) AS tokens_per_doc,
  ROUND(CAST(d.bytes_total AS DOUBLE) / t.n_tokens, 6) AS bytes_per_token
FROM docs d JOIN toks t USING (lang)
"""


QUERIES: dict[str, Query] = {
    "domain_temperature_resample": Query(
        q_domain_temperature_resample, SQL_DOMAIN_TEMPERATURE_RESAMPLE
    ),
    "gopher_quality_gate": Query(q_gopher_quality_gate, SQL_GOPHER_QUALITY_GATE),
    "embedding_dim_stats": Query(q_embedding_dim_stats, SQL_EMBEDDING_DIM_STATS),
    "tokenizer_fertility": Query(q_tokenizer_fertility, SQL_TOKENIZER_FERTILITY),
    "nearest_centroid_confusion": Query(
        q_nearest_centroid_confusion, SQL_NEAREST_CENTROID_CONFUSION
    ),
    "perplexity_bucket_sample": Query(
        q_perplexity_bucket_sample, SQL_PERPLEXITY_BUCKET_SAMPLE
    ),
}
