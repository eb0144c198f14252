"""Round-5 observability wave: the REPORTS a production curation
pipeline runs over its own filters — the filter-cascade waterfall,
hierarchical token-budget mixing, per-domain boilerplate removal,
duplicate-cluster census, and the near-dup threshold sweep.

Why these five: every prior curation entry IS a pipeline step; these
are the steps that tell the operator whether the pipeline is doing the
right thing. A cascade waterfall (docs dropped per stage, in stage
order) is the first table in every FineWeb/RefinedWeb-style ablation;
the token-budget table (per-domain target tokens and EPOCHS — the
repeat factor) is the data-mixing summary the LLaMA corpus table
popularized; boilerplate-segment removal is CCNet's within-domain
counterpart to C4's global line dedup (``dedup_line_level``); the
cluster-size census is the standard post-dedup audit (how much of the
corpus is duplicated, at what multiplicity); and the threshold sweep
prices a near-dup threshold BEFORE committing a full dedup run — one
candidate-pair pass, every candidate threshold priced from it.

All five are hash-graded; determinism follows suite/base.py (integer-
ratio divisions, sequential folds for cross-group sums, sqrt-only
weights — no pow()/exp() libm exposure, ROUND at display only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import table
from .base import Query

# cascade thresholds sit inside the observed metric distributions
# (token count 10-100 median 54; distinct/total 5th-95th pct
# 0.31-0.82; mean word length 4.17-4.85) so every stage drops a
# non-degenerate, non-total slice at both sf0.01 and sf0.1
MIN_TOKENS = 24
MIN_TTR = 0.38
WLEN_LO, WLEN_HI = 4.3, 4.75

MIX_BUDGET = 1_000_000  # target training tokens for the mixing table

BOILER_MIN_DOCS = 2  # segment df (distinct docs, within source) => boilerplate
SEG_TOKENS = 16  # same segmentation unit as dedup_line_level (curation5)

SWEEP_PCTS = (25, 30, 35, 40)  # candidate cosine thresholds, in percent


def _doc_metrics(spark: SparkSession, sf: str) -> DataFrame:
    """One scan of documents → the per-doc scalars the cascade gates on."""
    from ..functions import tokens

    d = table(spark, sf, "documents")
    return d.select(
        "doc_id",
        F.size(tokens("text")).alias("n_tok"),
        F.size(F.array_distinct(tokens("text"))).alias("n_dist"),
        F.aggregate(
            F.transform(tokens("text"), lambda t: F.length(t)),
            F.lit(0),
            lambda acc, x: acc + x,
        ).alias("sum_len"),
    )


def q_filter_cascade_report(spark: SparkSession, sf: str) -> DataFrame:
    """Filter-cascade waterfall: docs flow through an ORDERED cascade
    (1 too_short: < {MIN_TOKENS} tokens; 2 too_repetitive:
    distinct/total < {MIN_TTR}; 3 word_len_out_of_range: mean token
    length outside [{WLEN_LO}, {WLEN_HI}]) and each doc charges its
    drop to the FIRST stage it fails — the attribution rule that makes
    per-stage drop counts sum to total drops, which is what an
    ablation table needs (naive per-filter counts double-charge docs
    failing several filters). Output: one row per stage with docs
    entering, dropped, surviving, and the conditional drop rate.

    Scale shape: ONE scan computes the three per-doc scalars and the
    first-failed-stage label; the groupBy is 4-key (map-side combined
    to nothing); the waterfall window runs over a 3-row frame. The
    4-row stage-count frame is localCheckpointed so the total and the
    per-stage branches don't each replay the corpus scan — the report
    costs exactly one pass over the corpus regardless of stage count."""
    m = _doc_metrics(spark, sf)
    ttr = F.col("n_dist") / F.col("n_tok")
    wlen = F.col("sum_len") / F.col("n_tok")
    ff = (
        F.when(F.col("n_tok") < MIN_TOKENS, 1)
        .when(ttr < MIN_TTR, 2)
        .when((wlen < WLEN_LO) | (wlen > WLEN_HI), 3)
        .otherwise(0)
    )
    per = (
        m.select(ff.alias("ff"))
        .groupBy("ff")
        .agg(F.count("*").alias("n"))
        .localCheckpoint(eager=True)  # <=4 rows; reused by tot + join
    )
    tot = per.agg(F.sum("n").alias("total"))
    dim = spark.range(1).select(
        F.posexplode(
            F.array(
                F.lit("too_short"),
                F.lit("too_repetitive"),
                F.lit("word_len_out_of_range"),
            )
        ).alias("idx0", "stage_name")
    ).select((F.col("idx0") + 1).cast("int").alias("stage"), "stage_name")
    joined = (
        dim.join(per, dim.stage == per.ff, "left")
        .select("stage", "stage_name", F.coalesce("n", F.lit(0)).alias("n_dropped"))
        .crossJoin(F.broadcast(tot))
    )
    w = Window.orderBy("stage").rowsBetween(Window.unboundedPreceding, -1)
    n_in = F.col("total") - F.coalesce(F.sum("n_dropped").over(w), F.lit(0))
    return joined.select(
        "stage",
        "stage_name",
        n_in.alias("n_in"),
        "n_dropped",
        (n_in - F.col("n_dropped")).alias("n_out"),
        F.round(F.col("n_dropped") / n_in, 6).alias("drop_rate"),
    )


SQL_FILTER_CASCADE_REPORT = f"""
WITH m AS (
  SELECT doc_id,
    len(ts) AS n_tok, len(list_distinct(ts)) AS n_dist,
    list_sum(list_transform(ts, x -> len(x))) AS sum_len
  FROM (
    SELECT doc_id,
      list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS ts
    FROM documents
  )
),
ffs AS (
  SELECT CASE
    WHEN n_tok < {MIN_TOKENS} THEN 1
    WHEN n_dist * 1.0 / n_tok < {MIN_TTR} THEN 2
    WHEN sum_len * 1.0 / n_tok < {WLEN_LO} OR sum_len * 1.0 / n_tok > {WLEN_HI} THEN 3
    ELSE 0 END AS ff
  FROM m
),
per AS (SELECT ff, COUNT(*) AS n FROM ffs GROUP BY ff),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM per),
dim AS (
  SELECT * FROM (VALUES
    (1, 'too_short'), (2, 'too_repetitive'), (3, 'word_len_out_of_range')
  ) AS t(stage, stage_name)
),
j AS (
  SELECT d.stage, d.stage_name, CAST(coalesce(p.n, 0) AS BIGINT) AS n_dropped, tot.total
  FROM dim d LEFT JOIN per p ON p.ff = d.stage, tot
)
SELECT CAST(stage AS INTEGER) AS stage, stage_name,
  CAST(total - coalesce(SUM(n_dropped) OVER (
    ORDER BY stage ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
    AS BIGINT) AS n_in,
  n_dropped,
  CAST(total - coalesce(SUM(n_dropped) OVER (
    ORDER BY stage ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
    - n_dropped AS BIGINT) AS n_out,
  ROUND(n_dropped * 1.0 / (total - coalesce(SUM(n_dropped) OVER (
    ORDER BY stage ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)), 6)
    AS drop_rate
FROM j
"""


def q_token_budget_mix(spark: SparkSession, sf: str) -> DataFrame:
    """Hierarchical token-budget mixing table: a {MIX_BUDGET}-token
    training budget splits FIRST across languages by sqrt-temperature
    over each language's available tokens, THEN within each language
    across sources the same way; every (lang, source) cell reports its
    target tokens and EPOCHS = target/available — the repeat factor
    whose >1 values flag upsampled domains (the LLaMA-corpus-table
    view). The flat siblings: ``domain_temperature_resample`` weights
    DOC counts for a sampler, ``domain_mix_report`` reports the
    as-is shares; this entry PLANS the mixture in token units with the
    two-level split a multilingual curriculum actually uses.

    Determinism: weights are sqrt() only (IEEE-exact — no pow(x, a)
    libm exposure); both Σsqrt denominators are SEQUENTIAL folds over
    key-sorted lists (lang level: ~langs entries; source level: fold
    per lang over its sources) so both engines add the same doubles in
    the same order; epochs is a single division of identical doubles;
    ROUND at display only, and the upsampled flag compares the
    UNROUNDED epochs.

    Scale shape: one corpus scan → (lang, source) token sums (uniform
    map-side-combined groupBy); everything downstream is
    cell-count-sized (tiny). The two denominator folds and the final
    join never touch the raw corpus again."""
    from ..functions import tokens

    d = table(spark, sf, "documents")
    cells = (
        d.select("lang", "source", F.size(tokens("text")).alias("nt"))
        .groupBy("lang", "source")
        .agg(F.sum("nt").alias("cell_tokens"))
        .localCheckpoint(eager=True)  # cell-count rows; the lang/global
        # denominator branches and the final join would otherwise each
        # replay the corpus scan (3 scans observed without this)
    )
    lang_tot = cells.groupBy("lang").agg(
        F.sum("cell_tokens").alias("lang_tokens"),
        F.aggregate(
            F.array_sort(
                F.collect_list(
                    F.struct("source", F.sqrt(F.col("cell_tokens").cast("double")).alias("w"))
                )
            ),
            F.lit(0.0),
            lambda acc, x: acc + x["w"],
        ).alias("src_denom"),
    )
    g = lang_tot.agg(
        F.aggregate(
            F.array_sort(
                F.collect_list(
                    F.struct("lang", F.sqrt(F.col("lang_tokens").cast("double")).alias("w"))
                )
            ),
            F.lit(0.0),
            lambda acc, x: acc + x["w"],
        ).alias("g_denom")
    )
    j = cells.join(lang_tot, "lang").crossJoin(F.broadcast(g))
    lang_share = F.sqrt(F.col("lang_tokens").cast("double")) / F.col("g_denom")
    src_share = F.sqrt(F.col("cell_tokens").cast("double")) / F.col("src_denom")
    target = F.lit(float(MIX_BUDGET)) * lang_share * src_share
    epochs = target / F.col("cell_tokens")
    return j.select(
        "lang",
        "source",
        "cell_tokens",
        F.round(lang_share, 6).alias("lang_share"),
        F.round(src_share, 6).alias("src_share"),
        F.round(target, 1).alias("target_tokens"),
        F.round(epochs, 6).alias("epochs"),
        (epochs > 1.0).alias("upsampled"),
    )


SQL_TOKEN_BUDGET_MIX = f"""
WITH cells AS (
  SELECT lang, source, CAST(SUM(len(list_filter(
    string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> ''))) AS BIGINT)
    AS cell_tokens
  FROM documents GROUP BY lang, source
),
lt AS (
  SELECT lang, CAST(SUM(cell_tokens) AS BIGINT) AS lang_tokens,
    list_sum(list(sqrt(CAST(cell_tokens AS DOUBLE)) ORDER BY source)) AS src_denom
  FROM cells GROUP BY lang
),
g AS (SELECT list_sum(list(sqrt(CAST(lang_tokens AS DOUBLE)) ORDER BY lang)) AS g_denom FROM lt)
SELECT c.lang, c.source, c.cell_tokens,
  ROUND(sqrt(CAST(l.lang_tokens AS DOUBLE)) / g.g_denom, 6) AS lang_share,
  ROUND(sqrt(CAST(c.cell_tokens AS DOUBLE)) / l.src_denom, 6) AS src_share,
  ROUND({MIX_BUDGET}.0 * (sqrt(CAST(l.lang_tokens AS DOUBLE)) / g.g_denom)
    * (sqrt(CAST(c.cell_tokens AS DOUBLE)) / l.src_denom), 1) AS target_tokens,
  ROUND({MIX_BUDGET}.0 * (sqrt(CAST(l.lang_tokens AS DOUBLE)) / g.g_denom)
    * (sqrt(CAST(c.cell_tokens AS DOUBLE)) / l.src_denom) / c.cell_tokens, 6) AS epochs,
  ({MIX_BUDGET}.0 * (sqrt(CAST(l.lang_tokens AS DOUBLE)) / g.g_denom)
    * (sqrt(CAST(c.cell_tokens AS DOUBLE)) / l.src_denom) / c.cell_tokens) > 1.0
    AS upsampled
FROM cells c JOIN lt l ON c.lang = l.lang, g
"""


def q_boilerplate_removal(spark: SparkSession, sf: str) -> DataFrame:
    """CCNet-style within-domain boilerplate removal: a {SEG_TOKENS}-
    token segment occurring in >= {BOILER_MIN_DOCS} DISTINCT documents
    of the SAME source is boilerplate (nav bars, footers, licence
    blocks — text shared across a domain's pages), and EVERY occurrence
    is removed. The contrast with ``dedup_line_level`` (C4) is the
    point: C4 keeps the globally-FIRST copy of a duplicated segment;
    CCNet-style boilerplate removal keeps NONE, and only counts
    repetition within the domain. Per doc: segments seen, segments
    removed, md5 of the surviving re-assembled text.

    Scale shape: ONE segment explode; the distinct-doc count is two
    STACKED windows instead of a groupBy + join back (which would
    re-scan and re-explode the corpus for the second side): first-
    occurrence-within-doc flags over (source, seg, doc_id), summed
    over (source, seg) — df arrives without ever materializing a
    per-segment doc set (a collect_set would hold every doc id of a
    viral footer in one row). Then one per-doc re-assembly groupBy.
    At 100 TB the window key would be xxhash64(source, seg); raw text
    kept here so the oracle is exact (dedup_line_level's argument)."""
    from ..functions import tokens

    d = table(spark, sf, "documents")
    tokd = d.select("doc_id", "source", tokens("text").alias("ts"))
    nseg = F.floor((F.size("ts") - 1) / SEG_TOKENS).cast("int")
    segs = tokd.select(
        "doc_id",
        "source",
        F.posexplode(
            F.transform(
                F.when(F.size("ts") > 0, F.sequence(F.lit(0), nseg)).otherwise(
                    F.array().cast("array<int>")
                ),
                lambda i: F.array_join(
                    F.slice("ts", i * SEG_TOKENS + 1, SEG_TOKENS), " "
                ),
            )
        ).alias("seg_idx", "seg"),
    )
    w_doc = Window.partitionBy("source", "seg", "doc_id").orderBy("seg_idx")
    w_seg = Window.partitionBy("source", "seg")
    flagged = (
        segs.withColumn(
            "first_in_doc", (F.row_number().over(w_doc) == 1).cast("long")
        )
        .withColumn("ndoc", F.sum("first_in_doc").over(w_seg))
        .withColumn("boiler", F.col("ndoc") >= BOILER_MIN_DOCS)
    )
    kept_struct = F.when(
        ~F.col("boiler"), F.struct("seg_idx", F.col("seg").alias("s"))
    )
    return flagged.groupBy("doc_id").agg(
        F.count("*").alias("n_segments"),
        F.sum(F.col("boiler").cast("int")).alias("n_removed"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(kept_struct)), lambda s: s["s"]
                ),
                " ",
            )
        ).alias("kept_hash"),
    )


SQL_BOILERPLATE_REMOVAL = f"""
WITH toks AS (
  SELECT doc_id, source,
    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS ts
  FROM documents
),
segs AS (
  -- range bound = 100k segments (1.6M tokens/doc) >> the corpus max
  -- (~100 tokens); the Spark side's sequence() is unbounded, so the
  -- bound must stay far above any real doc (curation5 precedent)
  SELECT doc_id, source, CAST(g.i AS INTEGER) AS seg_idx,
    array_to_string(ts[g.i*{SEG_TOKENS}+1 : g.i*{SEG_TOKENS}+{SEG_TOKENS}], ' ') AS seg
  FROM toks, range(0, 100000) g(i)
  WHERE len(ts) > 0 AND g.i <= (len(ts)-1) // {SEG_TOKENS}
),
sdf AS (
  SELECT source, seg, COUNT(DISTINCT doc_id) AS ndoc FROM segs GROUP BY source, seg
)
SELECT s.doc_id, COUNT(*) AS n_segments,
  CAST(SUM(CASE WHEN d.ndoc >= {BOILER_MIN_DOCS} THEN 1 ELSE 0 END) AS BIGINT)
    AS n_removed,
  md5(coalesce(string_agg(CASE WHEN d.ndoc < {BOILER_MIN_DOCS} THEN s.seg END,
    ' ' ORDER BY s.seg_idx), '')) AS kept_hash
FROM segs s JOIN sdf d ON s.source = d.source AND s.seg = d.seg
GROUP BY s.doc_id
"""


def q_dedup_cluster_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Duplicate-cluster census — the post-dedup audit table: group
    docs into exact-content clusters (md5(text), ``dedup_exact``'s
    key), then report the cluster-SIZE histogram: how many clusters of
    each multiplicity, how many docs they hold, how many are excess
    copies (size-1 per cluster — exactly the docs dedup would delete),
    and each size's share of the corpus. The size-1 row doubles as the
    unique-doc count, so the table totals to the corpus and the
    excess_share column totals to the overall duplication rate.

    Scale shape: one content-hash groupBy (the dedup shuffle itself),
    one histogram groupBy over cluster rows, and windows over the
    histogram frame (bounded by max multiplicity, ~tens of rows). The
    census adds nothing beyond the dedup pass a pipeline already
    runs."""
    d = table(spark, sf, "documents")
    sizes = d.groupBy(F.md5("text").alias("h")).agg(F.count("*").alias("sz"))
    hist = sizes.groupBy("sz").agg(F.count("*").alias("n_clusters"))
    w = Window.partitionBy()
    n_docs = F.col("sz") * F.col("n_clusters")
    excess = (F.col("sz") - 1) * F.col("n_clusters")
    total = F.sum(n_docs).over(w)
    return hist.select(
        F.col("sz").alias("cluster_size"),
        "n_clusters",
        n_docs.alias("n_docs"),
        excess.alias("excess_docs"),
        F.round(n_docs / total, 6).alias("corpus_share"),
        F.round(excess / total, 6).alias("excess_share"),
    )


SQL_DEDUP_CLUSTER_STATS = """
WITH sizes AS (
  SELECT md5(text) AS h, COUNT(*) AS sz FROM documents GROUP BY md5(text)
),
hist AS (SELECT sz, COUNT(*) AS n_clusters FROM sizes GROUP BY sz)
SELECT sz AS cluster_size, n_clusters,
  CAST(sz * n_clusters AS BIGINT) AS n_docs,
  CAST((sz - 1) * n_clusters AS BIGINT) AS excess_docs,
  ROUND(sz * n_clusters * 1.0 / CAST(SUM(sz * n_clusters) OVER () AS BIGINT), 6)
    AS corpus_share,
  ROUND((sz - 1) * n_clusters * 1.0 / CAST(SUM(sz * n_clusters) OVER () AS BIGINT), 6)
    AS excess_share
FROM hist
"""


def q_similarity_threshold_sweep(spark: SparkSession, sf: str) -> DataFrame:
    """Near-dup threshold sweep: generate the label-blocked cosine
    candidate pairs ONCE at the loosest candidate threshold
    ({min(SWEEP_PCTS)}%), then price every candidate threshold from
    that single pair set — pair count and DISTINCT docs that would be
    dropped (a doc drops when some lower-id partner reaches the
    threshold, ``dedup_embedding_cosine``'s keep rule). This is how a
    threshold is actually chosen: sweep first, run the committed dedup
    (the single-threshold siblings) after.

    Scale shape: the pair scan is the blocked O(pairs-within-block)
    pass the dedup entry already pays — amortized over ALL thresholds
    instead of re-run per candidate value, and traversed ONCE: pair
    counts and the per-doc max sims ride ONE (id2)-keyed groupBy
    (never a pairs×thresholds stream; #{{docs : max_sim ≥ τ}} ==
    COUNT(DISTINCT doc | sim ≥ τ), so no distinct-expand either) —
    measured within noise of the SINGLE-threshold dedup pass itself
    at sf0.1, i.e. all four thresholds for the price of one (the bench
    HEADLINE carries ``dedup_embedding_cosine`` alongside this entry
    so the committed run records show the pair).
    Thresholds are integer percents; each compare divides
    the SAME int literal by 100.0 in both engines, so the cutoffs are
    bit-identical doubles against the 9-dp-rounded sims."""
    from ..operators.similarity import cosine_pairs

    lo = min(SWEEP_PCTS) / 100.0
    pairs = cosine_pairs(
        table(spark, sf, "embeddings"), threshold=lo, block_col="label"
    )
    cut = lambda p: F.col("sim") >= F.lit(p) / F.lit(100.0)
    # ONE traversal of the pair stream: per-doc partial rows carry both
    # the per-threshold pair counts and the max partner sim, so the
    # expensive blocked join is never evaluated twice
    per_doc = pairs.groupBy("id2").agg(
        *[F.sum(cut(p).cast("long")).alias(f"cp{p}") for p in SWEEP_PCTS],
        F.max("sim").alias("msim"),
    )
    wide = per_doc.agg(
        *[
            F.coalesce(F.sum(f"cp{p}"), F.lit(0)).alias(f"np{p}")
            for p in SWEEP_PCTS
        ],
        *[
            F.coalesce(
                F.sum(
                    (F.col("msim") >= F.lit(p) / F.lit(100.0)).cast("long")
                ),
                F.lit(0),
            ).alias(f"nd{p}")
            for p in SWEEP_PCTS
        ],
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(p).cast("int").alias("threshold_pct"),
                F.col(f"np{p}").alias("n_pairs"),
                F.col(f"nd{p}").alias("n_dup_docs"),
            )
            for p in SWEEP_PCTS
        ]
    )
    return wide.select(F.explode(rows).alias("r")).select(
        "r.threshold_pct", "r.n_pairs", "r.n_dup_docs"
    )


_SWEEP_CP = ", ".join(
    f"SUM(CASE WHEN sim >= {p} / 100.0 THEN 1 ELSE 0 END) AS cp{p}"
    for p in SWEEP_PCTS
)
_SWEEP_NP = ", ".join(
    f"CAST(coalesce(SUM(cp{p}), 0) AS BIGINT) AS np{p}" for p in SWEEP_PCTS
)
_SWEEP_ND = ", ".join(
    f"CAST(coalesce(SUM(CASE WHEN msim >= {p} / 100.0 THEN 1 ELSE 0 END), 0)"
    f" AS BIGINT) AS nd{p}"
    for p in SWEEP_PCTS
)
_SWEEP_ROWS = " UNION ALL ".join(
    f"SELECT CAST({p} AS INTEGER) AS threshold_pct, np{p} AS n_pairs,"
    f" nd{p} AS n_dup_docs FROM wide"
    for p in SWEEP_PCTS
)

SQL_SIMILARITY_THRESHOLD_SWEEP = f"""
WITH e AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
pairs AS (
  SELECT a.vec_id AS id1, b.vec_id AS id2,
    ROUND(
      list_sum(list_transform(list_zip(a.v, b.v), x -> x[1] * x[2]))
      / (sqrt(list_sum(list_transform(a.v, x -> x * x)))
         * sqrt(list_sum(list_transform(b.v, x -> x * x)))), 9) AS sim
  FROM e a JOIN e b ON a.vec_id < b.vec_id AND a.label = b.label
  WHERE ROUND(
      list_sum(list_transform(list_zip(a.v, b.v), x -> x[1] * x[2]))
      / (sqrt(list_sum(list_transform(a.v, x -> x * x)))
         * sqrt(list_sum(list_transform(b.v, x -> x * x)))), 9)
    >= {min(SWEEP_PCTS)} / 100.0
),
per_doc AS (
  SELECT id2, {_SWEEP_CP}, MAX(sim) AS msim FROM pairs GROUP BY id2
),
wide AS (SELECT {_SWEEP_NP}, {_SWEEP_ND} FROM per_doc)
{_SWEEP_ROWS}
"""


QUERIES: dict[str, Query] = {
    "filter_cascade_report": Query(
        q_filter_cascade_report, SQL_FILTER_CASCADE_REPORT
    ),
    "token_budget_mix": Query(q_token_budget_mix, SQL_TOKEN_BUDGET_MIX),
    "boilerplate_removal": Query(q_boilerplate_removal, SQL_BOILERPLATE_REMOVAL),
    "dedup_cluster_stats": Query(q_dedup_cluster_stats, SQL_DEDUP_CLUSTER_STATS),
    "similarity_threshold_sweep": Query(
        q_similarity_threshold_sweep, SQL_SIMILARITY_THRESHOLD_SWEEP
    ),
}
