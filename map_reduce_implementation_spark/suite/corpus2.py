"""Round-5 corpus-health wave: the audits a pretraining-data owner runs
over a NEW corpus before mixing it in — cross-source contamination, a
properly-smoothed n-gram LM, and a Zipf rank-frequency fit.

- ``cross_source_overlap`` — the "how much of source A is already in
  source B" matrix (the question behind every mixture decision: is
  this crawl mostly re-crawled Wikipedia?). Near-dup pairs from the
  capped shingle-Jaccard machinery, aggregated to an ordered
  (source_a, source_b) cell grid with pair shares.
- ``text_kneser_ney_logprob`` — interpolated Kneser-Ney (Kneser &
  Ney 1995; Chen & Goodman 1999 §2.7), THE canonical n-gram smoothing:
  absolute discounting of the bigram ML estimate backed off to the
  CONTINUATION unigram (how many contexts a word completes, not how
  often it occurs). Upgrades the LM-quality family
  (``text_unigram_logprob`` / ``text_bigram_logprob``) from ML
  estimates to the smoothing every real n-gram filter (KenLM/CCNet)
  actually uses.
- ``text_zipf_fit`` — least-squares power-law fit to the term
  rank-frequency curve on log-log axes (Zipf's law: slope ≈ −1 for
  natural text). Degenerate slopes flag synthetic, templated, or
  truncated corpora — a one-row corpus-health gate.

Determinism: KN probabilities are arithmetic over integer counts with
the dyadic discount 0.75 (exactly representable in double — no
decimal-vs-double boundary exposure), per-doc means follow the proven
unigram-NLL recipe (ROUND(·, 6) after the sum); the Zipf fit
quantizes ln(rank)/ln(freq) to integers (floor(x·1e7 + 0.5)) so every
SUM is exact and order-independent, with the closed-form OLS computed
in identical double expressions in both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.dedup import jaccard_pairs
from ..sources import table
from .base import Query
from .dedup import SQL_SHINGLE_SIZES_CTE, _shingles
from .text import _tokens

OVERLAP_THRESHOLD = 0.3  # near-dup cut for the source-overlap matrix
OVERLAP_MAX_DF = 20  # stop-shingle cap (dedup_containment's production cap)
KN_DISCOUNT = 0.75  # Chen & Goodman's fixed absolute discount
ZIPF_TOP = 500  # rank-frequency fit over the top-500 terms


def q_cross_source_overlap(spark: SparkSession, sf: str) -> DataFrame:
    """Cross-source near-duplicate matrix: for every ordered source
    pair (source_a <= source_b), the number of Jaccard >=
    {OVERLAP_THRESHOLD} doc pairs with one side in each, its share of
    all near-dup pairs, and whether the cell crosses a source boundary.
    The answer to "is this new crawl already inside my mixture?" —
    cf. the cross-corpus contamination tables in Lee et al. 2021 §6
    and Dodge et al. 2021 (C4 analysis).

    Plan: pair generation is the capped posting-list machinery
    (``operators/dedup.py::jaccard_pairs``, max_df={OVERLAP_MAX_DF} —
    the 100 TB skew valve; intersections count capped shingles,
    denominators stay uncapped, exactly the graded
    ``dedup_ngram_jaccard_capped`` semantics). The doc→source map is
    corpus-sized so it is NOT broadcast: the pair frame joins it
    doc-id-keyed (uniform — each doc appears in few near-dup pairs).
    The final grid is |sources|²-bounded, so the pair-share window is
    free at any scale."""
    pairs = jaccard_pairs(
        _shingles(spark, sf, 5),
        threshold=OVERLAP_THRESHOLD,
        max_df=OVERLAP_MAX_DF,
    )
    src = table(spark, sf, "documents").select("doc_id", "source")
    cells = (
        pairs.join(src.alias("qa"), F.col("d1") == F.col("qa.doc_id"))
        .join(src.alias("qb"), F.col("d2") == F.col("qb.doc_id"))
        .select(
            F.least("qa.source", "qb.source").alias("source_a"),
            F.greatest("qa.source", "qb.source").alias("source_b"),
        )
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )
    return cells.select(
        "source_a",
        "source_b",
        "n_pairs",
        (F.col("source_a") != F.col("source_b")).alias("cross_source"),
        F.round(
            F.col("n_pairs") / F.sum("n_pairs").over(Window.partitionBy()),
            6,
        ).alias("pair_share"),
    )


SQL_CROSS_SOURCE_OVERLAP = f"""
WITH {SQL_SHINGLE_SIZES_CTE},
df AS (SELECT shingle, COUNT(*) AS c FROM sh GROUP BY 1),
capped AS (
  SELECT sh.doc_id, sh.shingle FROM sh JOIN df USING (shingle)
  WHERE df.c BETWEEN 2 AND {OVERLAP_MAX_DF}
),
pairs AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS inter
  FROM capped a JOIN capped b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
jp AS (
  SELECT d1, d2 FROM pairs
  JOIN sizes sa ON sa.doc_id = d1
  JOIN sizes sb ON sb.doc_id = d2
  WHERE inter * 1.0 / (sa.n + sb.n - inter) >= {OVERLAP_THRESHOLD}
),
cells AS (
  SELECT least(x.source, y.source) AS source_a,
    greatest(x.source, y.source) AS source_b, COUNT(*) AS n_pairs
  FROM jp
  JOIN documents x ON jp.d1 = x.doc_id
  JOIN documents y ON jp.d2 = y.doc_id
  GROUP BY 1, 2
)
SELECT source_a, source_b, n_pairs,
  source_a <> source_b AS cross_source,
  ROUND(n_pairs * 1.0 / SUM(n_pairs) OVER (), 6) AS pair_share
FROM cells
"""


def q_kneser_ney_logprob(spark: SparkSession, sf: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram score per document: average
    −ln P_KN(cur|prev) with fixed discount D={KN_DISCOUNT},

        P_KN(w₂|w₁) = (c(w₁w₂) − D)/c(w₁·)
                      + D·N₁₊(w₁·)/c(w₁·) · N₁₊(·w₂)/N₁₊(··)

    where N₁₊(w₁·)/N₁₊(·w₂) are the distinct-successor/-predecessor
    counts and N₁₊(··) the distinct-bigram-type total (the continuation
    distribution — "how many contexts does w₂ complete" — the insight
    that makes KN the default smoothing in KenLM-class filters; only
    seen bigrams are scored, so the discounted term is ≥ 1 − D > 0).

    Plan: ONE corpus pass builds the bigram-type count table c₂
    (zip_with shifted slices — no shuffle to form pairs), which is
    localCheckpoint'd; ALL four model statistics (context totals,
    successor/predecessor type counts, the type-total scalar) are then
    vocabulary-bounded aggregates of c₂ — zero further corpus scans
    for the model. Scoring re-joins the broadcast model to the pair
    stream (corpus pass two) and ends in one doc-keyed agg. The type
    total rides a 1-row broadcast frame; nothing collects."""
    d = table(spark, sf, "documents")
    ts = _tokens(F.col("text"))
    n = F.size(ts)
    pair_structs = F.zip_with(
        F.slice(ts, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(ts, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("prev"), b.alias("cur")),
    )
    pairs = d.select("doc_id", F.explode(pair_structs).alias("b")).select(
        "doc_id", "b.prev", "b.cur"
    )
    c2 = (
        pairs.groupBy("prev", "cur")
        .agg(F.count(F.lit(1)).alias("n2"))
        .localCheckpoint(eager=True)
    )
    ctx = c2.groupBy("prev").agg(
        F.sum("n2").alias("n1"), F.count(F.lit(1)).alias("n1fw")
    )
    prec = c2.groupBy("cur").agg(F.count(F.lit(1)).alias("nprec"))
    types = c2.agg(F.count(F.lit(1)).alias("ntypes"))
    model = (
        c2.join(ctx, "prev")
        .join(prec, "cur")
        .crossJoin(F.broadcast(types))
        .select(
            "prev",
            "cur",
            (
                (F.col("n2") - F.lit(KN_DISCOUNT)) / F.col("n1")
                + F.lit(KN_DISCOUNT) * F.col("n1fw") / F.col("n1")
                * (F.col("nprec") / F.col("ntypes"))
            ).alias("p_kn"),
        )
    )
    return (
        pairs.join(F.broadcast(model), ["prev", "cur"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                -F.sum(F.log("p_kn")) / F.count(F.lit(1)), 6
            ).alias("avg_nll_kn"),
        )
    )


SQL_KNESER_NEY_LOGPROB = f"""
WITH t AS (
  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks
  FROM documents
), bg AS (
  SELECT doc_id, unnest(list_zip(toks[1:len(toks)-1], toks[2:len(toks)])) AS b
  FROM t WHERE len(toks) >= 2
), pairs AS (
  SELECT doc_id, b[1] AS prev, b[2] AS cur FROM bg
),
c2 AS (SELECT prev, cur, COUNT(*) AS n2 FROM pairs GROUP BY 1, 2),
ctx AS (
  SELECT prev, CAST(SUM(n2) AS BIGINT) AS n1, COUNT(*) AS n1fw
  FROM c2 GROUP BY prev
),
prec AS (SELECT cur, COUNT(*) AS nprec FROM c2 GROUP BY cur),
types AS (SELECT COUNT(*) AS ntypes FROM c2),
model AS (
  SELECT c2.prev, c2.cur,
    (n2 - CAST({KN_DISCOUNT} AS DOUBLE)) / n1
      + CAST({KN_DISCOUNT} AS DOUBLE) * n1fw / n1
      * (nprec * 1.0 / ntypes) AS p_kn
  FROM c2
  JOIN ctx ON c2.prev = ctx.prev
  JOIN prec ON c2.cur = prec.cur
  CROSS JOIN types
)
SELECT p.doc_id, COUNT(*) AS n_bigrams,
  ROUND(-SUM(ln(p_kn)) / COUNT(*), 6) AS avg_nll_kn
FROM pairs p JOIN model m ON p.prev = m.prev AND p.cur = m.cur
GROUP BY p.doc_id
"""


def q_zipf_fit(spark: SparkSession, sf: str) -> DataFrame:
    """Zipf rank-frequency fit: OLS of ln(freq) on ln(rank) over the
    top-{ZIPF_TOP} corpus terms — slope, intercept, and R² in one row.
    Natural text sits near slope −1 (Zipf 1949); templated or
    synthetic corpora flatten or kink the curve, so the slope is a
    one-glance corpus-health gate (cf. the corpus statistics tables in
    Gopher, Rae et al. 2021 App. A).

    Plan: term frequencies are one vocabulary-sized aggregate; the
    top-{ZIPF_TOP} cut is a TakeOrderedAndProject (per-partition
    heaps), so the ranking window runs on ≤{ZIPF_TOP} rows — the
    vocab_coverage pattern, never an entity-sized global window.
    ln(rank)/ln(freq) are quantized to integers (floor(x·1e7 + 0.5))
    before the five OLS sums, making every SUM exact and
    order-independent; the closed-form slope/intercept/R² are then
    single identical double expressions in both engines."""
    d = table(spark, sf, "documents")
    tok = d.select(F.explode(_tokens(F.col("text"))).alias("term"))
    ctf = tok.groupBy("term").agg(F.count(F.lit(1)).alias("ctf"))
    top = ctf.orderBy(F.desc("ctf"), F.asc("term")).limit(ZIPF_TOP)
    w = Window.orderBy(F.desc("ctf"), F.asc("term"))
    ranked = top.select(F.row_number().over(w).alias("rank"), "ctf")

    def quant(c: Column) -> Column:
        return F.floor(F.log(c) * F.lit(1e7) + F.lit(0.5)).cast("long")

    xy = ranked.select(
        quant(F.col("rank")).alias("x"), quant(F.col("ctf")).alias("y")
    )
    s = xy.agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    nd = F.col("n_terms").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxx = F.col("sxx").cast("double")
    sxy = F.col("sxy").cast("double")
    syy = F.col("syy").cast("double")
    num = nd * sxy - sx * sy
    den = nd * sxx - sx * sx
    deny = nd * syy - sy * sy
    # degenerate-corpus guards (single term → den = 0; constant
    # frequencies → deny = 0): NULL instead of an engine-dependent
    # NaN-vs-NULL 0/0 — the CASE mirrors the oracle exactly
    return s.select(
        "n_terms",
        F.round(F.when(den > 0, num / den), 6).alias("slope"),
        F.round(
            F.when(den > 0, (sy - (num / den) * sx) / (nd * F.lit(1e7))), 6
        ).alias("intercept"),
        F.round(
            F.when((den > 0) & (deny > 0), num * num / (den * deny)), 6
        ).alias("r2"),
    )


SQL_ZIPF_FIT = f"""
WITH tok AS (
  SELECT unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS term
  FROM documents
),
ctf AS (SELECT term, COUNT(*) AS ctf FROM tok GROUP BY term),
top AS (SELECT * FROM ctf ORDER BY ctf DESC, term ASC LIMIT {ZIPF_TOP}),
ranked AS (
  SELECT ROW_NUMBER() OVER (ORDER BY ctf DESC, term ASC) AS rank, ctf
  FROM top
),
xy AS (
  SELECT CAST(floor(ln(rank) * 1e7 + 0.5) AS BIGINT) AS x,
    CAST(floor(ln(ctf) * 1e7 + 0.5) AS BIGINT) AS y
  FROM ranked
),
s AS (
  SELECT COUNT(*) AS n_terms,
    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
    CAST(SUM(x * x) AS BIGINT) AS sxx, CAST(SUM(x * y) AS BIGINT) AS sxy,
    CAST(SUM(y * y) AS BIGINT) AS syy
  FROM xy
),
d AS (
  SELECT n_terms,
    CAST(n_terms AS DOUBLE) * CAST(sxy AS DOUBLE)
      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS num,
    CAST(n_terms AS DOUBLE) * CAST(sxx AS DOUBLE)
      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS den,
    CAST(n_terms AS DOUBLE) * CAST(syy AS DOUBLE)
      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS deny,
    CAST(sy AS DOUBLE) AS syd, CAST(sx AS DOUBLE) AS sxd,
    CAST(n_terms AS DOUBLE) AS nd
  FROM s
)
SELECT n_terms,
  ROUND(CASE WHEN den > 0 THEN num / den END, 6) AS slope,
  ROUND(CASE WHEN den > 0
    THEN (syd - (num / den) * sxd) / (nd * 1e7) END, 6) AS intercept,
  ROUND(CASE WHEN den > 0 AND deny > 0
    THEN num * num / (den * deny) END, 6) AS r2
FROM d
"""


QUERIES: dict[str, Query] = {
    "cross_source_overlap": Query(
        q_cross_source_overlap, SQL_CROSS_SOURCE_OVERLAP
    ),
    "text_kneser_ney_logprob": Query(
        q_kneser_ney_logprob, SQL_KNESER_NEY_LOGPROB
    ),
    "text_zipf_fit": Query(q_zipf_fit, SQL_ZIPF_FIT),
}
