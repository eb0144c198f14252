"""Round-6 wave 15 — corpus drift, smoothing mass, and governance audits.

- ``corpus_jsd_sources`` — pairwise Jensen-Shannon divergence between
  source token distributions over the top-100 global vocabulary (+ an
  OOV bucket): the symmetric, bounded drift matrix behind "which crawl
  sources actually differ" — the pairwise companion to
  ``corpus_mutual_information`` and the per-feature PSI monitor.
- ``corpus_good_turing`` — Good-Turing frequency-of-frequencies per
  language (Good 1953; Gale & Sampson 1995): unseen-probability mass
  P₀ = N₁/N and the smoothed r* = (r+1)·N_{r+1}/N_r for small r — the
  "how much vocabulary have we NOT crawled yet" estimator next to
  Heaps-style ``ngram_saturation``.
- ``text_readability`` — per-language Flesch reading-ease from integer
  proxies (tokens, sentence marks, vowel-group syllables): the
  document-difficulty gate every curriculum/quality mix wants.
- ``decontaminate_semantic`` — embedding-space decontamination: drop
  training vectors whose max cosine to a FIXED eval set exceeds a
  threshold (the semantic sibling of the n-gram-overlap policy —
  paraphrased eval leakage that exact matching misses).
- ``quality_winsorized_stats`` — per-source p05/p95 winsorization of
  document length with robust mean and clip counts: the outlier-safe
  summary the plain mean audit gets wrong on heavy tails.
- ``graph_degree_stats`` — trade-graph degree census bucketed by
  decimal digit count: the skew report that says whether a
  celebrity-node salt is needed before any edge-keyed join.

Determinism: counts, ranks, degrees, and quantized clip values are
exact integers; probability/entropy/score doubles are identical
closed-form expressions of them in both engines with ROUND absorbing
summation-order ulps; every collapsible denominator (single-term
vocab, zero sentence marks, empty gap sets, N₂ = 0) carries the same
CASE guard in both engines (tests/test_round6_waves.py pins the
degenerate corpora).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import tokens as _tokens
from ..operators.similarity import _as_double
from ..sources import table
from .base import Query
from .graph import _trade_edges

JSD_TOP_TERMS = 100
JSD_OOV = "__oov__"
GT_MAX_R = 3
DECON_EVAL_N = 32  # eval set = first-N vectors (fixed, corpus-independent)
DECON_THRESHOLD = 0.42  # ≈ p99 of train-vs-eval max-cosine on the corpus
WINSOR_LO = 0.05
WINSOR_HI = 0.95


def q_corpus_jsd_sources(spark: SparkSession, sf: str) -> DataFrame:
    """Pairwise JSD (nats) between source unigram distributions over
    the top-{JSD_TOP_TERMS} global terms + OOV, via the entropy
    identity JSD = H(m) − (H(p)+H(q))/2 on a DENSE source×term grid
    (zero cells materialized, so the pair join is a plain inner join —
    no full-outer alignment).

    Plan: ONE corpus tokenization collapses straight to the
    (source, term) count frame — map-side partial agg, the token
    stream itself never materializes — and that |sources|·|vocab|
    frame (localCheckpoint'd) feeds both the global top-K cut
    (TakeOrderedAndProject, ties broken on term) and the OOV-bucketed
    cell counts; the grid is |sources|·(K+1) rows, every later step is
    grid-space and the pair join runs on a broadcast grid.
    Probabilities are exact-integer ratios; entropy terms are guarded
    p>0 identically in both engines."""
    d = table(spark, sf, "documents")
    st = (
        d.select("source", F.explode(_tokens(F.col("text"))).alias("term"))
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).alias("n_st"))
        .localCheckpoint(eager=True)
    )
    top = (
        st.groupBy("term")
        .agg(F.sum("n_st").alias("c"))
        .orderBy(F.desc("c"), F.asc("term"))
        .limit(JSD_TOP_TERMS)
        .select("term")
    )
    counts = (
        st.join(F.broadcast(top.withColumn("hit", F.lit(1))), "term", "left")
        .select(
            "source",
            F.when(F.col("hit").isNotNull(), F.col("term"))
            .otherwise(F.lit(JSD_OOV))
            .alias("cell"),
            "n_st",
        )
        .groupBy("source", "cell")
        .agg(F.sum("n_st").alias("n_sc"))
    )
    totals = counts.groupBy("source").agg(F.sum("n_sc").alias("n_s"))
    cells = top.select("term").union(
        spark.createDataFrame([(JSD_OOV,)], "term string")
    )
    grid = (
        totals.crossJoin(F.broadcast(cells))
        .join(
            counts.withColumnRenamed("cell", "term"),
            ["source", "term"],
            "left",
        )
        .select(
            "source",
            "term",
            (F.coalesce(F.col("n_sc"), F.lit(0)) / F.col("n_s")).alias("p"),
        )
        # Round-12 optimization (guide §2.4): the |sources|·(K+1)-row
        # grid feeds BOTH sides of the pair self-join — lazily its
        # whole counts→totals→grid subtree (3 shuffles over the
        # checkpointed st) was replayed per side (16 exchanges / 24
        # scans at sf0.01). Materialized, the self-join reads a tiny
        # in-memory frame twice: 8 exchanges.
        .localCheckpoint(eager=True)
    )
    a, b = grid.alias("a"), grid.alias("b")
    pairs = a.join(
        b,
        (F.col("a.term") == F.col("b.term"))
        & (F.col("a.source") < F.col("b.source")),
    ).select(
        F.col("a.source").alias("source_a"),
        F.col("b.source").alias("source_b"),
        F.col("a.p").alias("pa"),
        F.col("b.p").alias("pb"),
    )
    m = (F.col("pa") + F.col("pb")) / 2
    term = (
        F.when(m > 0, -m * F.log(m)).otherwise(F.lit(0.0))
        + F.lit(0.5)
        * F.when(F.col("pa") > 0, F.col("pa") * F.log("pa")).otherwise(
            F.lit(0.0)
        )
        + F.lit(0.5)
        * F.when(F.col("pb") > 0, F.col("pb") * F.log("pb")).otherwise(
            F.lit(0.0)
        )
    )
    return (
        pairs.groupBy("source_a", "source_b")
        .agg(F.round(F.sum(term), 6).alias("jsd_nats"))
        .orderBy("source_a", "source_b")
    )


SQL_CORPUS_JSD_SOURCES = f"""
WITH st AS (
  SELECT source, term, COUNT(*) AS n_st FROM (
    SELECT source, unnest(list_filter(
      string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS term
    FROM documents
  ) GROUP BY 1, 2
),
top AS (
  SELECT term FROM (
    SELECT term, CAST(SUM(n_st) AS BIGINT) AS c FROM st GROUP BY 1
  ) ORDER BY c DESC, term ASC LIMIT {JSD_TOP_TERMS}
),
counts AS (
  SELECT source,
    CASE WHEN top.term IS NOT NULL THEN st.term
      ELSE '{JSD_OOV}' END AS cell,
    CAST(SUM(n_st) AS BIGINT) AS n_sc
  FROM st LEFT JOIN top ON st.term = top.term
  GROUP BY 1, 2
),
totals AS (
  SELECT source, CAST(SUM(n_sc) AS BIGINT) AS n_s FROM counts GROUP BY 1
),
cells AS (SELECT term FROM top UNION ALL SELECT '{JSD_OOV}'),
grid AS (
  SELECT totals.source, cells.term,
    COALESCE(counts.n_sc, 0) * 1.0 / totals.n_s AS p
  FROM totals CROSS JOIN cells
  LEFT JOIN counts
    ON counts.source = totals.source AND counts.cell = cells.term
)
SELECT a.source AS source_a, b.source AS source_b,
  ROUND(SUM(
    (CASE WHEN (a.p + b.p) / 2 > 0
      THEN -((a.p + b.p) / 2) * ln((a.p + b.p) / 2) ELSE 0.0 END)
    + 0.5 * (CASE WHEN a.p > 0 THEN a.p * ln(a.p) ELSE 0.0 END)
    + 0.5 * (CASE WHEN b.p > 0 THEN b.p * ln(b.p) ELSE 0.0 END)
  ), 6) AS jsd_nats
FROM grid a JOIN grid b
  ON a.term = b.term AND a.source < b.source
GROUP BY 1, 2
ORDER BY 1, 2
"""


def q_corpus_good_turing(spark: SparkSession, sf: str) -> DataFrame:
    """Good-Turing estimates per language: token count N, vocab V,
    hapax/dis counts N₁/N₂, unseen mass P₀ = N₁/N, and smoothed
    r* = (r+1)·N_{r+1}/N_r for r = 1..{GT_MAX_R}.

    Plan: one tokenization → (lang, term) counts → a lang-keyed
    frequency-of-frequencies rollup (|langs|·|distinct counts| cells).
    Every ratio is a SINGLE division of exact integers (bit-exact
    unrounded — the proven recipe); empty N_r denominators are NULL
    via the same CASE in both engines."""
    d = table(spark, sf, "documents")
    tc = (
        d.select("lang", F.explode(_tokens(F.col("text"))).alias("term"))
        .groupBy("lang", "term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    agg = tc.groupBy("lang").agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("vocab"),
        *[
            F.count(F.when(F.col("c") == r, 1)).alias(f"n{r}")
            for r in range(1, GT_MAX_R + 2)
        ],
    )
    cols = [
        F.col("lang"),
        F.col("n_tokens"),
        F.col("vocab"),
        F.col("n1"),
        F.col("n2"),
        (F.col("n1") / F.col("n_tokens")).alias("p0_unseen"),
    ]
    for r in range(1, GT_MAX_R + 1):
        cols.append(
            F.when(
                F.col(f"n{r}") > 0,
                F.lit(r + 1) * F.col(f"n{r + 1}") / F.col(f"n{r}"),
            ).alias(f"rstar_{r}")
        )
    return agg.select(*cols).orderBy("lang")


def _gt_oracle() -> str:
    nr = ",\n    ".join(
        f"COUNT(CASE WHEN c = {r} THEN 1 END) AS n{r}"
        for r in range(1, GT_MAX_R + 2)
    )
    rstars = ",\n  ".join(
        f"CASE WHEN n{r} > 0 THEN {r + 1} * n{r + 1} * 1.0 / n{r} END"
        f" AS rstar_{r}"
        for r in range(1, GT_MAX_R + 1)
    )
    return f"""
WITH tc AS (
  SELECT lang, term, COUNT(*) AS c FROM (
    SELECT lang, unnest(list_filter(
      string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS term
    FROM documents
  ) GROUP BY 1, 2
),
agg AS (
  SELECT lang, CAST(SUM(c) AS BIGINT) AS n_tokens, COUNT(*) AS vocab,
    {nr}
  FROM tc GROUP BY 1
)
SELECT lang, n_tokens, vocab, n1, n2,
  n1 * 1.0 / n_tokens AS p0_unseen,
  {rstars}
FROM agg ORDER BY lang
"""


def q_text_readability(spark: SparkSession, sf: str) -> DataFrame:
    """Per-language Flesch reading-ease from integer proxies:
    206.835 − 1.015·(W/S) − 84.6·(Syl/W) with W = token count,
    S = sentence-mark runs ([.!?]+, clamped ≥1 per doc), Syl =
    vowel-group runs ([aeiouy]+) — the standard heuristic when no
    dictionary syllabifier is in the loop.

    Plan: three regexp counters in ONE corpus scan (map-side integer
    partials per language; nothing else moves). The score is one
    closed-form double expression of three exact integer sums, with
    the zero-word language guarded identically in both engines."""
    d = table(spark, sf, "documents")
    per_doc = d.select(
        "lang",
        F.size(_tokens(F.col("text"))).alias("w"),
        F.greatest(
            F.lit(1), F.regexp_count(F.col("text"), F.lit(r"[.!?]+"))
        ).alias("s"),
        F.regexp_count(F.lower(F.col("text")), F.lit("[aeiouy]+")).alias(
            "syl"
        ),
    )
    agg = per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("w").alias("n_words"),
        F.sum("s").alias("n_sentences"),
        F.sum("syl").alias("n_syllables"),
    )
    return agg.select(
        "lang",
        "n_docs",
        "n_words",
        "n_sentences",
        "n_syllables",
        F.round(
            F.when(
                F.col("n_words") > 0,
                F.lit(206.835)
                - F.lit(1.015)
                * (F.col("n_words") / F.col("n_sentences").cast("double"))
                - F.lit(84.6)
                * (F.col("n_syllables") / F.col("n_words").cast("double")),
            ),
            6,
        ).alias("flesch_score"),
    ).orderBy("lang")


SQL_TEXT_READABILITY = """
WITH per_doc AS (
  SELECT lang,
    len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
      x -> x <> '')) AS w,
    greatest(1, len(regexp_extract_all(text, '[.!?]+'))) AS s,
    len(regexp_extract_all(lower(text), '[aeiouy]+')) AS syl
  FROM documents
),
agg AS (
  SELECT lang, COUNT(*) AS n_docs, CAST(SUM(w) AS BIGINT) AS n_words,
    CAST(SUM(s) AS BIGINT) AS n_sentences,
    CAST(SUM(syl) AS BIGINT) AS n_syllables
  FROM per_doc GROUP BY 1
)
SELECT lang, n_docs, n_words, n_sentences, n_syllables,
  ROUND(CASE WHEN n_words > 0 THEN
    206.835 - 1.015 * (n_words / CAST(n_sentences AS DOUBLE))
    - 84.6 * (n_syllables / CAST(n_words AS DOUBLE)) END, 6)
    AS flesch_score
FROM agg ORDER BY lang
"""


def q_decontaminate_semantic(spark: SparkSession, sf: str) -> DataFrame:
    """Semantic decontamination: training vectors (vec_id ≥
    {DECON_EVAL_N}) whose max cosine to the FIXED eval set (vec_id <
    {DECON_EVAL_N}) exceeds {DECON_THRESHOLD} are flagged — per label:
    train size, flagged count, and the hottest similarity. Catches the
    paraphrased/near-duplicate eval leakage that the n-gram policies
    (``decontaminate``, ``decontaminate_ngram_overlap``) cannot see.

    Plan: the eval set is a bounded broadcast (in production it is an
    external, corpus-independent artifact — here the first-N vectors
    so both engines reproduce it); ONE corpus scan computes
    |eval| sequential-fold cosines per row (exact, the proven
    list-fold == F.aggregate recipe), a vec-keyed max, then a label
    rollup. Candidate volume is n·|eval| — linear in the corpus."""
    e = table(spark, sf, "embeddings")
    ev = (
        e.filter(F.col("vec_id") < DECON_EVAL_N)
        .select(
            F.col("vec_id").alias("eval_id"),
            _as_double("embedding").alias("qv"),
        )
    )
    tr = e.filter(F.col("vec_id") >= DECON_EVAL_N).select(
        "vec_id", "label", _as_double("embedding").alias("v")
    )
    dot = F.aggregate(
        F.zip_with("v", "qv", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nrm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    sims = tr.crossJoin(F.broadcast(ev)).select(
        "vec_id",
        "label",
        (dot / (nrm(F.col("v")) * nrm(F.col("qv")))).alias("sim"),
    )
    per_vec = sims.groupBy("vec_id", "label").agg(
        F.max("sim").alias("max_sim")
    )
    return (
        per_vec.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_train"),
            F.count(
                F.when(F.col("max_sim") >= DECON_THRESHOLD, 1)
            ).alias("n_flagged"),
            F.round(F.max("max_sim"), 9).alias("hottest_sim"),
        )
        .orderBy("label")
    )


SQL_DECONTAMINATE_SEMANTIC = f"""
WITH ev AS (
  SELECT vec_id AS eval_id, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id < {DECON_EVAL_N}
),
tr AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
  FROM embeddings WHERE vec_id >= {DECON_EVAL_N}
),
sims AS (
  SELECT tr.vec_id, tr.label,
    list_sum(list_transform(list_zip(tr.v, ev.qv), x -> x[1] * x[2]))
    / (sqrt(list_sum(list_transform(tr.v, x -> x * x)))
       * sqrt(list_sum(list_transform(ev.qv, x -> x * x)))) AS sim
  FROM tr CROSS JOIN ev
),
per_vec AS (
  SELECT vec_id, label, MAX(sim) AS max_sim FROM sims GROUP BY 1, 2
)
SELECT label, COUNT(*) AS n_train,
  COUNT(CASE WHEN max_sim >= {DECON_THRESHOLD} THEN 1 END) AS n_flagged,
  ROUND(MAX(max_sim), 9) AS hottest_sim
FROM per_vec GROUP BY label ORDER BY label
"""


def q_quality_winsorized_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Per-source winsorized length summary: p05/p95 of n_chars,
    counts clipped at each tail, and the winsorized mean — the
    heavy-tail-robust audit next to ``dataset_profile``'s plain
    moments.

    Determinism: F.percentile == quantile_cont (proven bit-exact);
    clipped values are quantized to integer micro-units BEFORE the
    sum (floor(x·10⁶ + 0.5)) so the mean is a single division of
    exact integers. Plan: a 2-column pruned scan aggregates the
    per-source quantiles; the broadcast join back + final rollup reads
    the same pruned columns — nothing wide ever moves."""
    d = table(spark, sf, "documents").select("source", "n_chars")
    q = d.groupBy("source").agg(
        F.percentile("n_chars", F.lit(WINSOR_LO)).alias("p05"),
        F.percentile("n_chars", F.lit(WINSOR_HI)).alias("p95"),
    )
    j = d.join(F.broadcast(q), "source")
    clip = F.least(
        F.greatest(F.col("n_chars").cast("double"), F.col("p05")),
        F.col("p95"),
    )
    qz = F.floor(clip * 1000000 + F.lit(0.5)).cast("bigint")
    return (
        j.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.max("p05"), 6).alias("p05"),
            F.round(F.max("p95"), 6).alias("p95"),
            F.count(
                F.when(F.col("n_chars") < F.col("p05"), 1)
            ).alias("n_clipped_low"),
            F.count(
                F.when(F.col("n_chars") > F.col("p95"), 1)
            ).alias("n_clipped_high"),
            (F.sum(qz) / (F.count(F.lit(1)) * F.lit(1000000.0))).alias(
                "raw_mean"
            ),
        )
        .select(
            "source",
            "n_docs",
            "p05",
            "p95",
            "n_clipped_low",
            "n_clipped_high",
            F.round("raw_mean", 6).alias("winsorized_mean"),
        )
        .orderBy("source")
    )


SQL_QUALITY_WINSORIZED_STATS = f"""
WITH q AS (
  SELECT source,
    quantile_cont(n_chars, {WINSOR_LO}) AS p05,
    quantile_cont(n_chars, {WINSOR_HI}) AS p95
  FROM documents GROUP BY 1
),
j AS (
  SELECT d.source, d.n_chars, q.p05, q.p95,
    CAST(floor(least(greatest(CAST(d.n_chars AS DOUBLE), q.p05), q.p95)
      * 1000000 + 0.5) AS BIGINT) AS qz
  FROM documents d JOIN q ON d.source = q.source
)
SELECT source, COUNT(*) AS n_docs,
  ROUND(MAX(p05), 6) AS p05, ROUND(MAX(p95), 6) AS p95,
  COUNT(CASE WHEN n_chars < p05 THEN 1 END) AS n_clipped_low,
  COUNT(CASE WHEN n_chars > p95 THEN 1 END) AS n_clipped_high,
  ROUND(CAST(SUM(qz) AS BIGINT) / (COUNT(*) * 1000000.0), 6)
    AS winsorized_mean
FROM j GROUP BY source ORDER BY source
"""


def q_graph_degree_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Trade-graph degree census bucketed by the degree's decimal
    digit count (an exact integer bucket — no float log at bucket
    boundaries): nodes, degree range, and edge mass per bucket. The
    skew report that decides whether the edge-keyed joins
    (pagerank/BFS/triangles) need a celebrity-node salt: a fat top
    bucket holding most of the edge mass says yes.

    Plan: one degree aggregate over the edge list, then a
    |buckets|-cell rollup — entirely integer."""
    deg = (
        _trade_edges(spark, sf)
        .groupBy("src")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    return (
        deg.groupBy(
            F.length(F.col("deg").cast("string")).alias("digits")
        )
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.min("deg").alias("min_deg"),
            F.max("deg").alias("max_deg"),
            F.sum("deg").alias("sum_deg"),
        )
        .orderBy("digits")
    )


SQL_GRAPH_DEGREE_STATS = """
WITH pairs AS (
  SELECT DISTINCT l.l_suppkey AS s, -(o.o_custkey + 1) AS c
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
edges AS (
  SELECT s AS src, c AS dst FROM pairs
  UNION ALL
  SELECT c AS src, s AS dst FROM pairs
),
deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY 1)
SELECT length(CAST(deg AS VARCHAR)) AS digits,
  COUNT(*) AS n_nodes, MIN(deg) AS min_deg, MAX(deg) AS max_deg,
  CAST(SUM(deg) AS BIGINT) AS sum_deg
FROM deg GROUP BY 1 ORDER BY 1
"""


QUERIES: dict[str, Query] = {
    "corpus_jsd_sources": Query(q_corpus_jsd_sources, SQL_CORPUS_JSD_SOURCES),
    "corpus_good_turing": Query(q_corpus_good_turing, _gt_oracle()),
    "text_readability": Query(q_text_readability, SQL_TEXT_READABILITY),
    "decontaminate_semantic": Query(
        q_decontaminate_semantic, SQL_DECONTAMINATE_SEMANTIC
    ),
    "quality_winsorized_stats": Query(
        q_quality_winsorized_stats, SQL_QUALITY_WINSORIZED_STATS
    ),
    "graph_degree_stats": Query(q_graph_degree_stats, SQL_GRAPH_DEGREE_STATS),
}
