"""Round-5 wave 12 — quality-ensemble and concentration audits.

- ``quality_gate_agreement`` — 2×2 agreement between two independent
  keep/drop gates (the Gopher rule battery vs a C4-style stopword
  gate): overlap Jaccard and binary Cohen's kappa. The ensemble-filter
  analysis every curation ablation runs (cf. FineWeb/RefinedWeb gate
  comparisons): high kappa → the gates are redundant; low kappa → they
  remove different mass and stacking them is a real decision.
- ``text_hapax_ratio`` — hapax legomena share per source (terms
  occurring exactly once): the classic lexical-richness statistic;
  templated or looping sources collapse toward 0.
- ``market_concentration_hhi`` — Herfindahl–Hirschman index of
  supplier revenue per nation (the antitrust concentration number):
  Σ share² over suppliers, plus the top supplier's share.
- ``embedding_outlier_mahalanobis`` — top-20 embedding outliers by
  diagonal Mahalanobis distance (per-dim μ/σ² from the proven
  ``embedding_dim_stats`` quantizer recipe): completes the outlier
  family next to the cosine-to-centroid arm with the name-brand
  scale-aware distance.

Determinism: gate compares are integer cross-multiplications (no
ratio boundaries), kappa/Jaccard are integer-ratio single divisions;
HHI shares are exact-decimal revenue sums divided once, the share²
summation-order ulps absorbed by ROUND 6 (the unigram-NLL recipe);
Mahalanobis z² are quantized (floor(·1e9 + 0.5)) before the per-vector
sum, so ordering and the top-k cut compare exact integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import table
from .base import Query, revenue_expr
from .text import _tokens

STOP_GATE_DEN = 20  # keep iff n_stop * 20 >= n_tokens (ratio >= 5%)
MAHA_TOP_K = 20


def q_quality_gate_agreement(spark: SparkSession, sf: str) -> DataFrame:
    """Agreement report between the Gopher rule gate
    (``gopher_quality_gate``) and a C4-style stopword-density gate
    (keep iff the doc has tokens and stopwords ≥ 1/{STOP_GATE_DEN} of
    them — an integer cross-multiply, so the 5% boundary has no float
    exposure): population, per-gate keep counts, both-keep count, the
    kept-set Jaccard, and binary Cohen's kappa.

    Plan: both gates are zero-shuffle map passes over one corpus scan
    each; the join is doc-keyed; everything after runs on ONE
    4-cell-backed row. All ratios are single integer divisions."""
    from .curation3 import q_gopher_quality_gate
    from .text import STOPWORDS_EN

    ga = q_gopher_quality_gate(spark, sf).select(
        "doc_id", F.col("keep").alias("keep_a")
    )
    t = table(spark, sf, "documents").select(
        "doc_id", _tokens(F.col("text")).alias("toks")
    )
    n_tok = F.size("toks")
    n_stop = F.size(F.filter(F.col("toks"), lambda x: x.isin(*STOPWORDS_EN)))
    gb = t.select(
        "doc_id",
        (
            (n_tok > 0) & (n_stop * F.lit(STOP_GATE_DEN) >= n_tok)
        ).alias("keep_b"),
    )
    j = ga.join(gb, "doc_id")
    agg = j.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("keep_a").cast("long")).alias("n_keep_gopher"),
        F.sum(F.col("keep_b").cast("long")).alias("n_keep_stopword"),
        F.sum((F.col("keep_a") & F.col("keep_b")).cast("long")).alias(
            "n_both"
        ),
    )
    n = F.col("n_docs")
    a = F.col("n_keep_gopher")
    b = F.col("n_keep_stopword")
    both = F.col("n_both")
    po = (both + (n - a - b + both)) / n
    pe = (a * b + (n - a) * (n - b)) / (n * n)
    # degenerate guards (nothing kept → Jaccard 0/0; both gates
    # constant → p_e = 1 and kappa 0/0): NULL in BOTH engines
    return agg.select(
        "n_docs",
        "n_keep_gopher",
        "n_keep_stopword",
        "n_both",
        F.round(
            F.when(a + b - both > 0, both / (a + b - both)), 6
        ).alias("keep_jaccard"),
        F.round(
            F.when(pe < 1.0, (po - pe) / (F.lit(1.0) - pe)), 6
        ).alias("kappa"),
    )


def _gate_agreement_oracle() -> str:
    from .curation3 import SQL_GOPHER_QUALITY_GATE
    from .text import STOPWORDS_EN

    inlist = ",".join(f"'{w}'" for w in STOPWORDS_EN)
    return f"""
WITH gop AS ({SQL_GOPHER_QUALITY_GATE}),
tk AS (
  SELECT doc_id,
    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks
  FROM documents
),
gb AS (
  SELECT doc_id,
    len(toks) > 0
      AND len(list_filter(toks, x -> x IN ({inlist}))) * {STOP_GATE_DEN}
          >= len(toks) AS keep_b
  FROM tk
),
agg AS (
  SELECT COUNT(*) AS n_docs,
    CAST(SUM(CASE WHEN gop.keep THEN 1 ELSE 0 END) AS BIGINT) AS n_keep_gopher,
    CAST(SUM(CASE WHEN gb.keep_b THEN 1 ELSE 0 END) AS BIGINT) AS n_keep_stopword,
    CAST(SUM(CASE WHEN gop.keep AND gb.keep_b THEN 1 ELSE 0 END) AS BIGINT) AS n_both
  FROM gop JOIN gb ON gop.doc_id = gb.doc_id
)
SELECT n_docs, n_keep_gopher, n_keep_stopword, n_both,
  ROUND(CASE WHEN n_keep_gopher + n_keep_stopword - n_both > 0
    THEN n_both * 1.0 / (n_keep_gopher + n_keep_stopword - n_both) END, 6)
    AS keep_jaccard,
  ROUND(CASE WHEN (n_keep_gopher * n_keep_stopword
          + (n_docs - n_keep_gopher) * (n_docs - n_keep_stopword)) * 1.0
          / (n_docs * n_docs) < 1.0 THEN
    ((n_both + (n_docs - n_keep_gopher - n_keep_stopword + n_both)) * 1.0 / n_docs
     - (n_keep_gopher * n_keep_stopword
        + (n_docs - n_keep_gopher) * (n_docs - n_keep_stopword)) * 1.0
       / (n_docs * n_docs))
    / (1.0 - (n_keep_gopher * n_keep_stopword
              + (n_docs - n_keep_gopher) * (n_docs - n_keep_stopword)) * 1.0
             / (n_docs * n_docs)) END, 6) AS kappa
FROM agg
"""


def q_hapax_ratio(spark: SparkSession, sf: str) -> DataFrame:
    """Per-source lexical richness: vocabulary size, hapax legomena
    (terms occurring exactly once IN that source), token total, and
    the hapax share of the vocabulary. One tokenize pass, one
    (source, term)-keyed aggregate, one source-keyed rollup — both
    aggregates map-side combinable, output = |sources| rows."""
    d = table(spark, sf, "documents")
    tok = d.select(
        "source", F.explode(_tokens(F.col("text"))).alias("term")
    )
    ctf = tok.groupBy("source", "term").agg(F.count(F.lit(1)).alias("ctf"))
    return ctf.groupBy("source").agg(
        F.sum("ctf").alias("n_tokens"),
        F.count(F.lit(1)).alias("vocab"),
        F.count(F.when(F.col("ctf") == 1, 1)).alias("hapax"),
    ).select(
        "source",
        "n_tokens",
        "vocab",
        "hapax",
        F.round(F.col("hapax") / F.col("vocab"), 6).alias("hapax_ratio"),
    )


SQL_HAPAX_RATIO = """
WITH tok AS (
  SELECT source,
    unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS term
  FROM documents
),
ctf AS (SELECT source, term, COUNT(*) AS ctf FROM tok GROUP BY 1, 2)
SELECT source,
  CAST(SUM(ctf) AS BIGINT) AS n_tokens,
  COUNT(*) AS vocab,
  CAST(coalesce(SUM(CASE WHEN ctf = 1 THEN 1 END), 0) AS BIGINT) AS hapax,
  ROUND(coalesce(SUM(CASE WHEN ctf = 1 THEN 1 END), 0) * 1.0 / COUNT(*), 6)
    AS hapax_ratio
FROM ctf GROUP BY source
"""


def q_market_concentration_hhi(spark: SparkSession, sf: str) -> DataFrame:
    """Herfindahl–Hirschman concentration of supplier revenue per
    nation: HHI = Σᵢ shareᵢ² (1/n for perfect competition, 1 for
    monopoly) plus the top supplier's share — the dependence-risk
    audit over the trade data.

    Plan: one fact-side shuffle to (nation, supplier) revenue cells
    (supplier dim broadcast), a nation-keyed rollup for totals, and a
    broadcast join back — the share window never materializes an
    entity-sized global ordering. Revenues are exact decimal sums cast
    to double once; shares divide once; the share² summation-order
    ulps are absorbed by ROUND 6."""
    li = table(spark, sf, "lineitem").select(
        "l_suppkey", "l_extendedprice", "l_discount"
    )
    sup = table(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    nation = table(spark, sf, "nation").select("n_nationkey", "n_name")
    # Round-12 optimization (guide §2.4): the supplier-sized revenue
    # cells feed BOTH the nation rollup and the share join-back —
    # materialize once instead of replaying the fact join + aggregate
    # per consumer (10 parquet scans → 2 in the captured plan)
    cells = (
        li.join(F.broadcast(sup), li["l_suppkey"] == sup["s_suppkey"])
        .groupBy("s_nationkey", "s_suppkey")
        .agg(F.sum(revenue_expr()).alias("rev_dec"))
        .localCheckpoint(eager=True)
    )
    nat = cells.groupBy("s_nationkey").agg(
        F.sum("rev_dec").alias("tot_dec"),
        F.count(F.lit(1)).alias("n_suppliers"),
    )
    share = F.col("rev_dec").cast("double") / F.col("tot_dec").cast("double")
    return (
        cells.join(F.broadcast(nat), "s_nationkey")
        .groupBy("s_nationkey")
        .agg(
            F.max("n_suppliers").alias("n_suppliers"),
            F.round(F.sum(share * share), 6).alias("hhi"),
            F.round(F.max(share), 6).alias("top_share"),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == nation["n_nationkey"])
        .select("n_name", "n_suppliers", "hhi", "top_share")
    )


SQL_MARKET_CONCENTRATION_HHI = """
WITH cells AS (
  SELECT s.s_nationkey, l.l_suppkey,
    SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
      AS rev_dec
  FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
  GROUP BY 1, 2
),
nat AS (
  SELECT s_nationkey, SUM(rev_dec) AS tot_dec, COUNT(*) AS n_suppliers
  FROM cells GROUP BY 1
)
SELECT n.n_name, nat.n_suppliers,
  ROUND(SUM((CAST(rev_dec AS DOUBLE) / CAST(tot_dec AS DOUBLE))
            * (CAST(rev_dec AS DOUBLE) / CAST(tot_dec AS DOUBLE))), 6) AS hhi,
  ROUND(MAX(CAST(rev_dec AS DOUBLE) / CAST(tot_dec AS DOUBLE)), 6) AS top_share
FROM cells
JOIN nat ON cells.s_nationkey = nat.s_nationkey
JOIN nation n ON cells.s_nationkey = n.n_nationkey
GROUP BY n.n_name, nat.n_suppliers
"""


def q_embedding_outlier_mahalanobis(spark: SparkSession, sf: str) -> DataFrame:
    """Top-{MAHA_TOP_K} embedding outliers by DIAGONAL Mahalanobis
    distance — Σⱼ ((xⱼ−μⱼ)/σⱼ)², the scale-aware upgrade of the
    cosine-to-centroid outlier arm (a dimension with tiny variance
    contributes heavily when it deviates; raw L2 can't see that).

    Plan: per-dim μ/σ² come from ONE posexplode + (pos)-keyed
    aggregate using ``embedding_dim_stats``' exact quantizer recipe
    (floor(x·1e7+0.5) integer sums — order-independent, tie-mode
    free); the 64-row stats frame broadcasts back into a second
    posexplode pass; per-vector z² are quantized (floor(·1e9+0.5))
    before the vec-keyed sum so the score is an exact integer — the
    TakeOrderedAndProject top-k and its tie-break (score DESC, vec_id
    ASC) compare integers, never floats. Zero-variance dims contribute
    0 by an identical CASE guard in both engines."""
    from ..operators.similarity import _as_double

    e = table(spark, sf, "embeddings")
    comp = e.select(
        "vec_id", F.posexplode(_as_double("embedding")).alias("pos", "x")
    )
    q = F.floor(F.col("x") * F.lit(1e7) + F.lit(0.5))
    qc = comp.select("vec_id", "pos", "x", q.alias("q"))
    s_d = F.sum("q").cast("double")
    ssq_d = F.sum(
        F.col("q").cast("decimal(18,0)") * F.col("q").cast("decimal(18,0)")
    ).cast("double")
    n_c = F.count(F.lit(1))
    stats = qc.groupBy("pos").agg(
        (s_d / F.lit(1e7) / n_c).alias("mu"),
        (
            (ssq_d / F.lit(1e14) - s_d / F.lit(1e7) * (s_d / F.lit(1e7)) / n_c)
            / n_c
        ).alias("var"),
    )
    z2 = F.when(
        F.col("var") > 0,
        ((F.col("x") - F.col("mu")) / F.sqrt(F.col("var")))
        * ((F.col("x") - F.col("mu")) / F.sqrt(F.col("var"))),
    ).otherwise(F.lit(0.0))
    scored = (
        qc.join(F.broadcast(stats), "pos")
        .select(
            "vec_id",
            F.floor(z2 * F.lit(1e9) + F.lit(0.5)).cast("long").alias("z2q"),
        )
        .groupBy("vec_id")
        .agg(F.sum("z2q").alias("score_q"))
    )
    top = scored.orderBy(F.desc("score_q"), F.asc("vec_id")).limit(
        MAHA_TOP_K
    )
    w = Window.orderBy(F.desc("score_q"), F.asc("vec_id"))
    return top.select(
        F.row_number().over(w).alias("outlier_rank"),
        "vec_id",
        F.round(F.col("score_q") / F.lit(1e9), 6).alias("maha_sq"),
    )


SQL_EMBEDDING_OUTLIER_MAHALANOBIS = f"""
WITH comp AS (
  SELECT vec_id, i - 1 AS pos, v[i] AS x,
    CAST(floor(v[i] * 1e7 + 0.5) AS BIGINT) AS q
  FROM (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
  ), range(1, 100000) r(i) WHERE i <= len(v)
),
stats AS (
  SELECT pos,
    CAST(SUM(q) AS DOUBLE) / 1e7 / COUNT(*) AS mu,
    (CAST(SUM(CAST(q AS DECIMAL(18,0)) * CAST(q AS DECIMAL(18,0))) AS DOUBLE) / 1e14
     - CAST(SUM(q) AS DOUBLE) / 1e7 * (CAST(SUM(q) AS DOUBLE) / 1e7) / COUNT(*))
    / COUNT(*) AS var
  FROM comp GROUP BY pos
),
scored AS (
  SELECT vec_id,
    CAST(SUM(CAST(floor(
      (CASE WHEN var > 0
        THEN ((x - mu) / sqrt(var)) * ((x - mu) / sqrt(var))
        ELSE 0.0 END) * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS score_q
  FROM comp JOIN stats ON comp.pos = stats.pos
  GROUP BY vec_id
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY score_q DESC, vec_id ASC) AS INTEGER)
    AS outlier_rank,
  vec_id, ROUND(score_q / 1e9, 6) AS maha_sq
FROM scored
ORDER BY score_q DESC, vec_id ASC LIMIT {MAHA_TOP_K}
"""


QUERIES: dict[str, Query] = {
    "quality_gate_agreement": Query(
        q_quality_gate_agreement, _gate_agreement_oracle()
    ),
    "text_hapax_ratio": Query(q_hapax_ratio, SQL_HAPAX_RATIO),
    "market_concentration_hhi": Query(
        q_market_concentration_hhi, SQL_MARKET_CONCENTRATION_HHI
    ),
    "embedding_outlier_mahalanobis": Query(
        q_embedding_outlier_mahalanobis, SQL_EMBEDDING_OUTLIER_MAHALANOBIS
    ),
}
