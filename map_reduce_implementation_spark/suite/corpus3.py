"""Round-5 corpus-analysis wave 10: graph-based keyword extraction,
classifier-agreement measurement, and reference-likeness scoring.

- ``text_textrank_keywords`` — TextRank (Mihalcea & Tarau 2004), the
  name-brand unsupervised keyword extractor: PageRank over the word
  co-occurrence graph (adjacent-token edges, undirected). Composes the
  suite's two proven pieces — the zip_with bigram idiom and
  ``operators/graph.py::pagerank`` — into the method every
  extractive-keyword pipeline ships first.
- ``text_lang_id_kappa`` — Cohen's kappa (Cohen 1960) for the
  stopword lang-ID classifier against the labeled ``lang`` column:
  chance-corrected agreement, the single number behind "is this
  classifier better than guessing the marginals". Closes the
  classifier-eval loop that ``text_lang_confusion`` (confusion
  matrix) and ``quality_calibration_report`` (calibration) started.
- ``text_bleu_precision`` — corpus-level modified bigram precision
  (the BLEU building block, Papineni et al. 2002 §2.1): each non-en
  language slice scored against the en reference slice with clipped
  n-gram counts — the standard "how reference-like is this candidate
  corpus" audit for synthetic / translated data.

Determinism: TextRank scores follow the pagerank convention (identical
unrolled arithmetic, summation-order ulps absorbed by ROUND 9, rounded
scores + term tie-breaks order the top-k cut identically in both
engines); kappa and precision are integer-count ratios with single
divisions (bit-exact per the suite recipe) rounded for display.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.graph import pagerank
from ..sources import table
from .base import Query
from .text import _tokens

TR_ITERS = 3  # TextRank power iterations (the pagerank default)
TR_DAMPING = 0.85
TR_TOP_K = 20  # keywords reported
BLEU_REF_LANG = "en"  # reference slice for modified precision


def _word_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """DataFrame[prev, cur] — adjacent-token pairs per document (the
    zip_with idiom shared with ``text.q_bigram_logprob``)."""
    d = table(spark, sf, "documents")
    ts = _tokens(F.col("text"))
    n = F.size(ts)
    pair_structs = F.zip_with(
        F.slice(ts, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(ts, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("prev"), b.alias("cur")),
    )
    return d.select(F.explode(pair_structs).alias("b")).select(
        "b.prev", "b.cur"
    )


def q_textrank_keywords(spark: SparkSession, sf: str) -> DataFrame:
    """TextRank keywords: PageRank (d={TR_DAMPING}, {TR_ITERS}
    iterations) on the undirected word co-occurrence graph (an edge
    per distinct adjacent token pair, both directions, self-loops
    dropped), top-{TR_TOP_K} words by rank.

    Plan: edge building is one corpus pass ending in a
    vocabulary²-bounded distinct; the iteration machinery is
    ``operators/graph.py::pagerank`` unchanged (one edge-keyed shuffle
    + one node-keyed agg per round, rank vector never on the driver),
    so TextRank inherits its celebrity-node and checkpoint-cadence
    story. The top-k is a TakeOrderedAndProject on (rounded score,
    term) and the rank window runs on {TR_TOP_K} rows."""
    und = (
        _word_pairs(spark, sf)
        .filter(F.col("prev") != F.col("cur"))
        .select(F.col("prev").alias("src"), F.col("cur").alias("dst"))
    )
    edges = und.unionAll(
        und.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    pr = pagerank(edges, iterations=TR_ITERS, damping=TR_DAMPING)
    top = (
        pr.select(
            F.col("node").alias("term"), F.round("pr", 9).alias("score")
        )
        .orderBy(F.desc("score"), F.asc("term"))
        .limit(TR_TOP_K)
    )
    w = Window.orderBy(F.desc("score"), F.asc("term"))
    return top.select(
        F.row_number().over(w).alias("keyword_rank"), "term", "score"
    )


def _textrank_oracle(iters: int = TR_ITERS) -> str:
    steps = []
    for k in range(1, iters + 1):
        steps.append(
            f"""pr{k} AS (
  SELECT d0.src AS node,
    (1.0 - {TR_DAMPING}) / n.n_nodes + {TR_DAMPING} * COALESCE(t.s, 0.0) AS pr
  FROM deg d0
  LEFT JOIN (
    SELECT e.dst AS node, SUM(p.pr / d.outdeg) AS s
    FROM edges e
    JOIN pr{k - 1} p ON e.src = p.node
    JOIN deg d ON e.src = d.src
    GROUP BY e.dst
  ) t ON d0.src = t.node
  CROSS JOIN n
)"""
        )
    chain = ",\n".join(steps)
    return f"""
WITH t AS (
  SELECT list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks
  FROM documents
), bg AS (
  SELECT unnest(list_zip(toks[1:len(toks)-1], toks[2:len(toks)])) AS b
  FROM t WHERE len(toks) >= 2
), und AS (
  SELECT DISTINCT b[1] AS src, b[2] AS dst FROM bg WHERE b[1] <> b[2]
),
edges AS (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM und UNION ALL SELECT dst AS src, src AS dst FROM und
  )
),
deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
n AS (SELECT COUNT(*) AS n_nodes FROM deg),
pr0 AS (SELECT src AS node, 1.0 / n.n_nodes AS pr FROM deg CROSS JOIN n),
{chain}
SELECT CAST(ROW_NUMBER() OVER (ORDER BY ROUND(pr, 9) DESC, node ASC)
    AS INTEGER) AS keyword_rank,
  node AS term, ROUND(pr, 9) AS score
FROM pr{iters}
ORDER BY score DESC, term ASC LIMIT {TR_TOP_K}
"""


def q_lang_id_kappa(spark: SparkSession, sf: str) -> DataFrame:
    """Cohen's kappa for the stopword lang-ID heuristic vs the labeled
    ``lang`` column: observed agreement p_o, chance agreement p_e from
    the marginal products, and κ = (p_o − p_e)/(1 − p_e) — one row.

    Plan: the only data-sized work is the classify pass
    (``text.q_lang_id``, zero-shuffle column expressions); everything
    after runs on the |langs|×|langs| confusion cells — marginals,
    their product sum, and the three ratios are all cell-space
    aggregates. p_o and p_e are single integer-ratio divisions
    (bit-exact); κ combines them in one identical expression."""
    from .text import q_lang_id

    pred = q_lang_id(spark, sf).select("doc_id", "predicted_lang")
    d = table(spark, sf, "documents").select("doc_id", "lang")
    cells = (
        d.join(pred, "doc_id")
        .groupBy(F.col("lang").alias("true_lang"), "predicted_lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    rows = cells.groupBy("true_lang").agg(F.sum("n").alias("row_n"))
    cols = cells.groupBy("predicted_lang").agg(F.sum("n").alias("col_n"))
    tot = cells.agg(
        F.sum("n").alias("n_docs"),
        F.sum(F.when(F.col("true_lang") == F.col("predicted_lang"), F.col("n"))).alias(
            "agree"
        ),
    )
    prod = (
        rows.join(cols, rows["true_lang"] == cols["predicted_lang"])
        .agg(F.sum(F.col("row_n") * F.col("col_n")).alias("prod_sum"))
    )
    po = F.col("agree") / F.col("n_docs")
    pe = F.col("prod_sum") / (F.col("n_docs") * F.col("n_docs"))
    # degenerate guard: constant-and-correct predictions give p_e = 1
    # and kappa's 0/0 — NULL beats an engine-dependent NaN-vs-NULL
    return (
        tot.crossJoin(F.broadcast(prod))
        .select(
            "n_docs",
            F.round(po, 6).alias("p_observed"),
            F.round(pe, 6).alias("p_expected"),
            F.round(
                F.when(pe < 1.0, (po - pe) / (F.lit(1.0) - pe)), 6
            ).alias("kappa"),
        )
    )


SQL_LANG_ID_KAPPA_TEMPLATE = """
WITH pred AS ({lang_id_sql}),
cells AS (
  SELECT d.lang AS true_lang, p.predicted_lang, COUNT(*) AS n
  FROM documents d JOIN pred p ON d.doc_id = p.doc_id
  GROUP BY 1, 2
),
rows_ AS (SELECT true_lang, CAST(SUM(n) AS BIGINT) AS row_n FROM cells GROUP BY 1),
cols_ AS (SELECT predicted_lang, CAST(SUM(n) AS BIGINT) AS col_n FROM cells GROUP BY 1),
tot AS (
  SELECT CAST(SUM(n) AS BIGINT) AS n_docs,
    CAST(coalesce(SUM(CASE WHEN true_lang = predicted_lang THEN n END), 0)
      AS BIGINT) AS agree
  FROM cells
),
prod AS (
  SELECT CAST(SUM(row_n * col_n) AS BIGINT) AS prod_sum
  FROM rows_ JOIN cols_ ON rows_.true_lang = cols_.predicted_lang
)
SELECT n_docs,
  ROUND(agree * 1.0 / n_docs, 6) AS p_observed,
  ROUND(prod_sum * 1.0 / (n_docs * n_docs), 6) AS p_expected,
  ROUND(CASE WHEN prod_sum * 1.0 / (n_docs * n_docs) < 1.0
    THEN (agree * 1.0 / n_docs - prod_sum * 1.0 / (n_docs * n_docs))
         / (1.0 - prod_sum * 1.0 / (n_docs * n_docs)) END, 6) AS kappa
FROM tot CROSS JOIN prod
"""


def q_bleu_precision(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus-level modified bigram precision of every
    non-{BLEU_REF_LANG} language slice against the {BLEU_REF_LANG}
    reference slice: per candidate bigram type, its count is clipped
    at the reference count (the BLEU clip — a candidate cannot earn
    more credit for a bigram than the reference contains), and the
    per-language precision is clipped mass / candidate mass.

    Plan: ONE corpus pass yields the (lang, bigram) counts; the
    reference side is the en rows of that same aggregate (bigram-type
    bounded — broadcastable by Heaps' law); candidates LEFT-join it so
    reference-absent bigrams clip to zero, and the final agg is
    lang-keyed over bigram types. Integer masses; one division."""
    d = table(spark, sf, "documents")
    ts = _tokens(F.col("text"))
    n = F.size(ts)
    pair_structs = F.zip_with(
        F.slice(ts, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(ts, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("prev"), b.alias("cur")),
    )
    grams = d.select(
        "lang", F.explode(pair_structs).alias("b")
    ).select("lang", F.concat_ws(" ", "b.prev", "b.cur").alias("gram"))
    counts = (
        grams.groupBy("lang", "gram")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)
    )
    ref = counts.filter(F.col("lang") == BLEU_REF_LANG).select(
        "gram", F.col("c").alias("ref_c")
    )
    cand = counts.filter(F.col("lang") != BLEU_REF_LANG)
    return (
        cand.join(F.broadcast(ref), "gram", "left")
        .groupBy("lang")
        .agg(
            F.sum("c").alias("n_bigrams"),
            F.sum(
                F.least(F.col("c"), F.coalesce(F.col("ref_c"), F.lit(0)))
            ).alias("clipped_hits"),
        )
        .select(
            "lang",
            "n_bigrams",
            "clipped_hits",
            F.round(
                F.col("clipped_hits") / F.col("n_bigrams"), 6
            ).alias("precision"),
        )
    )


SQL_BLEU_PRECISION = f"""
WITH t AS (
  SELECT lang,
    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks
  FROM documents
), bg AS (
  SELECT lang, unnest(list_zip(toks[1:len(toks)-1], toks[2:len(toks)])) AS b
  FROM t WHERE len(toks) >= 2
),
counts AS (
  SELECT lang, b[1] || ' ' || b[2] AS gram, COUNT(*) AS c
  FROM bg GROUP BY 1, 2
),
ref AS (
  SELECT gram, c AS ref_c FROM counts WHERE lang = '{BLEU_REF_LANG}'
),
cand AS (SELECT * FROM counts WHERE lang <> '{BLEU_REF_LANG}')
SELECT cand.lang,
  CAST(SUM(c) AS BIGINT) AS n_bigrams,
  CAST(SUM(least(c, coalesce(ref_c, 0))) AS BIGINT) AS clipped_hits,
  ROUND(SUM(least(c, coalesce(ref_c, 0))) * 1.0 / SUM(c), 6) AS precision
FROM cand LEFT JOIN ref ON cand.gram = ref.gram
GROUP BY cand.lang
"""


def _kappa_oracle() -> str:
    from .text import SQL_LANG_ID

    return SQL_LANG_ID_KAPPA_TEMPLATE.format(lang_id_sql=SQL_LANG_ID)


PF_THRESHOLD = 0.5  # Jaccard cut (matches dedup_ngram_jaccard)


def q_prefix_filter_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """Set-similarity join with PREFIX FILTERING (SSJoin, Chaudhuri et
    al. 2006; PPJoin, Xiao et al. 2008) — the third sub-quadratic
    candidate-generation family in the repo, next to df-capping
    (changes semantics: drops hot shingles from scores) and MinHash
    banding (probabilistic: can miss pairs). Prefix filtering is
    EXACT and LOSSLESS: order each doc's shingles by global rarity
    (df ASC, shingle ASC) and index only the first
    |s| − ceil(t·|s|) + 1 of them; any pair with Jaccard ≥ t
    provably shares a prefix shingle (J ≥ t forces |B| ≥ t·|A|, so
    the required overlap exceeds what the dropped suffix can cover),
    so verifying candidates with the exact Jaccard reproduces the
    full O(n²)-free answer bit-for-bit.

    Plan: df is one shingle-keyed aggregate; the per-doc rarity rank
    is a doc-partitioned window; the candidate self-join keys on
    PREFIX shingles only — a boilerplate shingle (huge df) lands in
    almost no prefixes, so the very key that blows up the plain
    posting-list join is filtered out by construction, WITHOUT
    touching scores. Verification re-joins candidates against the
    full shingle lists (work bounded by candidates, not pairs). The
    oracle is the PLAIN quadratic pair join — hash-equality proves
    the optimized path is semantics-preserving, the gemm-candidate
    convention (operators/similarity.py)."""
    from .dedup import _shingles

    # five consumers (df, rank, sizes, both verify sides) — materialize
    # the shingle stream ONCE instead of re-tokenizing per branch
    # (modest at sf0.1, ~2.1 → 1.9 s warm — the doc-keyed rank window
    # dominates locally — but at corpus scale five tokenize passes
    # would; a cluster run persists the stream)
    sh = _shingles(spark, sf, 5).localCheckpoint(eager=True)
    dfreq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    w_doc = Window.partitionBy("doc_id").orderBy(
        F.asc("df"), F.asc("shingle")
    )
    ranked = (
        sh.join(dfreq, "shingle")
        .withColumn("rnk", F.row_number().over(w_doc))
        .withColumn("n", F.count(F.lit(1)).over(Window.partitionBy("doc_id")))
    )
    prefix = ranked.filter(
        F.col("rnk")
        <= F.col("n") - F.ceil(F.col("n") * F.lit(PF_THRESHOLD)) + 1
    ).select("doc_id", "shingle")
    cands = (
        prefix.alias("pa")
        .join(prefix.alias("pb"), "shingle")
        .filter(F.col("pa.doc_id") < F.col("pb.doc_id"))
        .select(
            F.col("pa.doc_id").alias("d1"), F.col("pb.doc_id").alias("d2")
        )
        .distinct()
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    inter = (
        cands.join(sh.alias("sa"), F.col("d1") == F.col("sa.doc_id"))
        .join(
            sh.alias("sb"),
            (F.col("d2") == F.col("sb.doc_id"))
            & (F.col("sa.shingle") == F.col("sb.shingle")),
        )
        .groupBy("d1", "d2")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.alias("za"), F.col("d1") == F.col("za.doc_id"))
        .join(sizes.alias("zb"), F.col("d2") == F.col("zb.doc_id"))
        .select(
            "d1",
            "d2",
            (
                F.col("inter")
                / (F.col("za.n") + F.col("zb.n") - F.col("inter"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= PF_THRESHOLD)
    )


# The oracle is the PLAIN pair join at the same threshold — prefix
# filtering is provably lossless, so hash-equality against the
# unoptimized formulation is the whole point of the entry.
from .dedup import SQL_DEDUP_NGRAM_JACCARD as SQL_PREFIX_FILTER_PAIRS  # noqa: E402


SAT_BATCHES = 10  # ingestion batches for the saturation curve


def q_ngram_saturation(spark: SparkSession, sf: str) -> DataFrame:
    """N-gram saturation curve — the "will more of this source help?"
    diminishing-returns audit (Heaps' law, empirically): docs are
    assigned to {SAT_BATCHES} deterministic ingestion batches (the
    stored-nothing md5 recipe from ``dataset_split``), each distinct
    bigram is charged to the FIRST batch that contains it, and the
    per-batch report shows total bigram instances, newly-seen distinct
    bigrams, and the cumulative share of the final vocabulary — a
    flattening curve says the source has stopped contributing novelty.

    Plan: one corpus pass to bigrams, one gram-keyed MIN(batch)
    aggregate (the distinct-type charge), one {SAT_BATCHES}-row
    cumulative window — nothing after the first aggregate scales with
    the corpus."""
    d = table(spark, sf, "documents")
    ts = _tokens(F.col("text"))
    n = F.size(ts)
    pair_structs = F.zip_with(
        F.slice(ts, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(ts, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("prev"), b.alias("cur")),
    )
    from .pipeline2 import _md5_bucket

    batch = _md5_bucket("sat|", F.col("doc_id").cast("string"), SAT_BATCHES)
    grams = d.select(
        batch.alias("batch"), F.explode(pair_structs).alias("b")
    ).select("batch", F.concat_ws(" ", "b.prev", "b.cur").alias("gram"))
    # Round-12 optimization (guide §2.2/§2.4): ONE (batch, gram) cell
    # aggregate (map-side combined) is materialized and both model
    # frames derive from it by exact integer identities
    # (first_batch = MIN over the gram's batches, instance counts =
    # Σ cell counts per batch) — one corpus tokenization instead of two,
    # and the shuffle carries cells, not raw gram instances.
    cells = (
        grams.groupBy("batch", "gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=True)
    )
    per_gram = cells.groupBy("gram").agg(
        F.min("batch").alias("first_batch"), F.sum("cnt").alias("cnt")
    )
    instance_counts = cells.groupBy("batch").agg(
        F.sum("cnt").alias("n_instances")
    )
    novelty = per_gram.groupBy("first_batch").agg(
        F.count(F.lit(1)).alias("n_new_grams")
    )
    w_cum = Window.orderBy("batch").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.partitionBy()
    return (
        instance_counts.join(
            novelty,
            instance_counts["batch"] == novelty["first_batch"],
            "left",
        )
        .select(
            "batch",
            "n_instances",
            F.coalesce(F.col("n_new_grams"), F.lit(0)).alias("n_new_grams"),
        )
        .select(
            "batch",
            "n_instances",
            "n_new_grams",
            F.round(
                F.sum("n_new_grams").over(w_cum)
                / F.sum("n_new_grams").over(w_all),
                6,
            ).alias("cum_vocab_share"),
        )
    )


SQL_NGRAM_SATURATION = f"""
WITH t AS (
  SELECT ('0x' || substr(md5('sat|' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
      % {SAT_BATCHES} AS batch,
    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks
  FROM documents
), bg AS (
  SELECT batch, unnest(list_zip(toks[1:len(toks)-1], toks[2:len(toks)])) AS b
  FROM t WHERE len(toks) >= 2
),
grams AS (SELECT batch, b[1] || ' ' || b[2] AS gram FROM bg),
per_gram AS (
  SELECT gram, MIN(batch) AS first_batch FROM grams GROUP BY gram
),
instance_counts AS (
  SELECT batch, COUNT(*) AS n_instances FROM grams GROUP BY batch
),
novelty AS (
  SELECT first_batch, COUNT(*) AS n_new_grams FROM per_gram GROUP BY 1
)
SELECT i.batch, i.n_instances,
  CAST(coalesce(n.n_new_grams, 0) AS BIGINT) AS n_new_grams,
  ROUND(
    SUM(coalesce(n.n_new_grams, 0)) OVER (ORDER BY i.batch
      ROWS UNBOUNDED PRECEDING) * 1.0
    / SUM(coalesce(n.n_new_grams, 0)) OVER (), 6) AS cum_vocab_share
FROM instance_counts i LEFT JOIN novelty n ON i.batch = n.first_batch
"""


QUERIES: dict[str, Query] = {
    "text_textrank_keywords": Query(q_textrank_keywords, _textrank_oracle()),
    "text_lang_id_kappa": Query(q_lang_id_kappa, _kappa_oracle()),
    "text_bleu_precision": Query(q_bleu_precision, SQL_BLEU_PRECISION),
    "dedup_prefix_filter_pairs": Query(
        q_prefix_filter_pairs, SQL_PREFIX_FILTER_PAIRS
    ),
    "token_ngram_saturation": Query(q_ngram_saturation, SQL_NGRAM_SATURATION),
}
