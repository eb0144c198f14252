"""Round-5 curation wave: segment-level C4 dedup, n-gram eval-overlap
decontamination, lexical-diversity scoring (MATTR), robust MAD anomaly
gating, and embedding-space outlier ranking.

Why these five: they are the remaining name-brand steps of a production
training-data pipeline the registry didn't yet cover as first-class
entries — C4's line-level dedup (Raffel et al. 2020 §2.2 dedupes the
corpus at LINE granularity, keep-first, before doc-level filtering),
GPT-3's n-gram eval-set decontamination (Brown et al. 2020 App. C
removes training docs overlapping eval sets by 13-gram collision;
the overlap FRACTION + threshold policy here is the refined form),
moving-average type-token ratio (Covington & McFall 2010 — the
window-normalized lexical-diversity metric length-biased raw TTR
can't replace), median-absolute-deviation outlier gating (the robust
z-score: median ± k·1.4826·MAD tolerates the heavy-tailed metric
distributions that break mean/stddev gates), and per-label centroid
outlier ranking (the embedding-space mislabel/garbage detector run
before training).

Every entry is hash-graded; determinism recipes follow the proven
conventions (suite/base.py): integer-ratio divisions, sequential list
folds for vector math, `F.percentile` ↔ `quantile_cont`, ROUND only at
the display boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import table
from .base import Query
from .dedup import FUZZY_MAX_DF, SQL_SHINGLE_SIZES_CTE, _shingles, _shingles_of

SEG_TOKENS = 16  # C4 dedupes at line granularity; this corpus has no
# newlines, so the segment is a fixed 16-token window (segmentation is
# corpus-specific everywhere; the dedup semantics are C4's: exact
# match, corpus-wide, keep the globally-first occurrence)

EVAL_MOD = 17  # eval slice = doc_id % 17 == 0 (synthetic held-out set)
OVERLAP_NGRAM = 8
OVERLAP_THRESHOLD = 0.1

MATTR_W = 50  # Covington & McFall's standard window

MAD_K = 3.0
MAD_SCALE = 1.4826  # consistency constant: MAD * 1.4826 ~ sigma under normality


def q_dedup_line_level(spark: SparkSession, sf: str) -> DataFrame:
    """C4-style segment-level exact dedup, keep-first corpus-wide:
    each document splits into consecutive {SEG_TOKENS}-token segments;
    a segment instance survives iff it is the globally FIRST occurrence
    of that exact segment text (order = (doc_id, seg_idx)); the output
    reports per doc how many segments survived and the md5 of the
    re-assembled surviving text — the full C4 §2.2 recipe (their unit
    is the line; the corpus here has no newlines, so the unit is a
    fixed token window).

    Scale shape: ONE shuffle keyed by the segment text (the window
    partition); groups are tiny (dup multiplicity), so the per-group
    sort is O(dups). Re-assembly is a per-doc groupBy — second uniform
    shuffle. At 100 TB the partition key would be xxhash64(seg) to
    keep the sort comparator cheap (collision odds n²/2⁶⁵, the shingle
    argument); kept as the raw text here so the oracle is exact.
    Documents with zero tokens produce no segments and are excluded —
    upstream quality gates drop empty docs before dedup anyway."""
    from ..functions import tokens

    d = table(spark, sf, "documents")
    tokd = d.select("doc_id", tokens("text").alias("ts"))
    nseg = F.floor((F.size("ts") - 1) / SEG_TOKENS).cast("int")
    segs = tokd.select(
        "doc_id",
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
    w = Window.partitionBy("seg").orderBy("doc_id", "seg_idx")
    ranked = segs.withColumn("rn", F.row_number().over(w))
    kept_struct = F.when(
        F.col("rn") == 1, F.struct("seg_idx", F.col("seg").alias("s"))
    )
    return ranked.groupBy("doc_id").agg(
        F.count("*").alias("n_segments"),
        F.sum(F.when(F.col("rn") == 1, 1).otherwise(0)).alias("n_kept"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(kept_struct)), lambda s: s["s"]
                ),
                " ",
            )
        ).alias("kept_hash"),
    )


SQL_DEDUP_LINE_LEVEL = f"""
WITH toks AS (
  SELECT doc_id,
    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS ts
  FROM documents
),
segs AS (
  SELECT doc_id, CAST(g.i AS INTEGER) AS seg_idx,
    array_to_string(ts[g.i*{SEG_TOKENS}+1 : g.i*{SEG_TOKENS}+{SEG_TOKENS}], ' ') AS seg
  FROM toks, range(0, 100000) g(i)
  WHERE len(ts) > 0 AND g.i <= (len(ts)-1) // {SEG_TOKENS}
),
rn AS (
  SELECT doc_id, seg_idx, seg,
    ROW_NUMBER() OVER (PARTITION BY seg ORDER BY doc_id, seg_idx) AS r
  FROM segs
)
SELECT doc_id, COUNT(*) AS n_segments,
  CAST(SUM(CASE WHEN r = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
  md5(coalesce(string_agg(CASE WHEN r = 1 THEN seg END, ' ' ORDER BY seg_idx), ''))
    AS kept_hash
FROM rn GROUP BY doc_id
"""


def q_decontaminate_ngram_overlap(spark: SparkSession, sf: str) -> DataFrame:
    """GPT-3-style n-gram decontamination with the overlap-FRACTION
    policy: the eval slice (doc_id % {EVAL_MOD} == 0 stands in for a
    held-out benchmark) contributes a distinct {OVERLAP_NGRAM}-gram
    set; every training doc reports what fraction of its own distinct
    {OVERLAP_NGRAM}-grams collide with it, and is flagged when the
    fraction reaches {OVERLAP_THRESHOLD}. The siblings: ``decontaminate``
    flags any doc sharing ≥1 shingle (and omits clean docs from its
    output); ``bloom_decontaminate`` is the sketch-gated form of the
    same any-hit rule. This entry is the calibrated POLICY variant —
    a single boilerplate n-gram no longer nukes a document, the
    threshold is tunable per benchmark, and every training doc gets an
    explicit keep/flag verdict (clean and shingle-less docs included),
    which is what the downstream filter join actually consumes.

    Scale shape: shingles are hashed int64s (the shingle-pipeline
    argument); the eval set joins as a left-semi on the shingle key —
    one uniform shuffle here, a broadcast in production where eval
    benchmarks are KBs against a 100 TB corpus. Per-doc counts are
    two map-side-combined groupBys; train docs with no shingles
    (< {OVERLAP_NGRAM} tokens) surface with frac 0.0 via the left
    joins — every training doc gets a verdict."""
    from .dedup import _shingles_of

    d = table(spark, sf, "documents")
    ev = (
        _shingles_of(d.filter(F.col("doc_id") % EVAL_MOD == 0), OVERLAP_NGRAM)
        .select("shingle")
        .distinct()
    )
    tr_docs = d.filter(F.col("doc_id") % EVAL_MOD != 0)
    # Round-12 optimization (guide §2.4): the training shingle stream
    # feeds two consumers (per-doc counts + the semi-join hit counts);
    # lazily each replayed the tokenize+shingle pass over the corpus.
    tr_sh = _shingles_of(tr_docs, OVERLAP_NGRAM).localCheckpoint(eager=True)
    counts = tr_sh.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    hits = (
        tr_sh.join(ev, "shingle", "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hits"))
    )
    n_sh = F.coalesce(F.col("n_shingles"), F.lit(0)).alias("n_shingles")
    n_hit = F.coalesce(F.col("n_hits"), F.lit(0)).alias("n_hits")
    frac = F.when(
        F.coalesce(F.col("n_shingles"), F.lit(0)) > 0,
        F.coalesce(F.col("n_hits"), F.lit(0)) / F.col("n_shingles"),
    ).otherwise(F.lit(0.0))
    return (
        tr_docs.select("doc_id")
        .join(counts, "doc_id", "left")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            n_sh,
            n_hit,
            F.round(frac, 9).alias("overlap_frac"),
            (frac >= OVERLAP_THRESHOLD).alias("is_contaminated"),
        )
    )


SQL_DECONTAMINATE_NGRAM_OVERLAP = f"""
WITH toks AS (
  SELECT doc_id,
    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS ts
  FROM documents
),
sh AS (
  SELECT DISTINCT doc_id,
    ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] || ' ' || ts[i+3] || ' ' ||
    ts[i+4] || ' ' || ts[i+5] || ' ' || ts[i+6] || ' ' || ts[i+7] AS shingle
  FROM toks, range(1, 100000) r(i)
  WHERE i + {OVERLAP_NGRAM - 1} <= len(ts)
),
ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % {EVAL_MOD} = 0),
tr AS (SELECT * FROM sh WHERE doc_id % {EVAL_MOD} <> 0),
counts AS (SELECT doc_id, COUNT(*) AS n_shingles FROM tr GROUP BY 1),
hits AS (
  SELECT doc_id, COUNT(*) AS n_hits FROM tr
  WHERE shingle IN (SELECT shingle FROM ev) GROUP BY 1
)
SELECT d.doc_id,
  CAST(coalesce(c.n_shingles, 0) AS BIGINT) AS n_shingles,
  CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
  ROUND(CASE WHEN coalesce(c.n_shingles, 0) > 0
        THEN coalesce(h.n_hits, 0) * 1.0 / c.n_shingles ELSE 0.0 END, 9)
    AS overlap_frac,
  (CASE WHEN coalesce(c.n_shingles, 0) > 0
        THEN coalesce(h.n_hits, 0) * 1.0 / c.n_shingles ELSE 0.0 END)
    >= {OVERLAP_THRESHOLD} AS is_contaminated
FROM documents d
LEFT JOIN counts c ON c.doc_id = d.doc_id
LEFT JOIN hits h ON h.doc_id = d.doc_id
WHERE d.doc_id % {EVAL_MOD} <> 0
"""


def q_text_mattr(spark: SparkSession, sf: str) -> DataFrame:
    """Lexical diversity: raw type-token ratio + MATTR({MATTR_W})
    (Covington & McFall 2010) — the mean of distinct/{MATTR_W} over
    every sliding {MATTR_W}-token window, which removes raw TTR's
    length bias (longer docs mechanically repeat tokens). Docs shorter
    than the window fall back to their raw TTR, per the definition.

    Scale shape: zero shuffles — the whole metric is per-row array
    math inside one codegen stage (window distinct-counts via
    transform + array_distinct over bound token arrays, O(len·W) work
    per doc). Both ratios are integer-sum ÷ integer-count divisions →
    bit-identical across engines; ROUND is display-only."""
    from ..functions import tokens

    d = table(spark, sf, "documents")
    tokd = d.select("doc_id", tokens("text").alias("ts")).withColumn(
        "n_tokens", F.size("ts")
    )
    n_distinct = F.size(F.array_distinct("ts"))
    # per-window distinct counts: windows start at 1..n-W+1 (1-based slice)
    win_counts = F.transform(
        F.sequence(F.lit(1), F.col("n_tokens") - (MATTR_W - 1)),
        lambda i: F.size(F.array_distinct(F.slice("ts", i, MATTR_W))),
    )
    win_sum = F.aggregate(win_counts, F.lit(0), lambda acc, x: acc + x)
    n_win = F.col("n_tokens") - (MATTR_W - 1)
    mattr = F.when(
        F.col("n_tokens") >= MATTR_W, win_sum / (n_win * F.lit(MATTR_W))
    ).otherwise(n_distinct / F.col("n_tokens"))
    return tokd.filter(F.col("n_tokens") > 0).select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.round((n_distinct / F.col("n_tokens")), 9).alias("ttr"),
        F.round(mattr, 9).alias("mattr"),
    )


SQL_TEXT_MATTR = f"""
WITH toks AS (
  SELECT doc_id,
    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS ts
  FROM documents
),
base AS (
  SELECT doc_id, ts, len(ts) AS n_tokens,
    len(list_distinct(ts)) AS n_distinct
  FROM toks WHERE len(ts) > 0
),
wins AS (
  SELECT doc_id,
    SUM(len(list_distinct(ts[w.i : w.i + {MATTR_W - 1}]))) AS win_sum,
    COUNT(*) AS n_win
  FROM base, range(1, 100000) w(i)
  WHERE n_tokens >= {MATTR_W} AND w.i <= n_tokens - {MATTR_W - 1}
  GROUP BY doc_id
)
SELECT b.doc_id, CAST(b.n_tokens AS BIGINT) AS n_tokens,
  ROUND(b.n_distinct * 1.0 / b.n_tokens, 9) AS ttr,
  ROUND(CASE WHEN b.n_tokens >= {MATTR_W}
        THEN w.win_sum * 1.0 / (w.n_win * {MATTR_W})
        ELSE b.n_distinct * 1.0 / b.n_tokens END, 9) AS mattr
FROM base b LEFT JOIN wins w ON w.doc_id = b.doc_id
"""


def q_events_anomaly_mad(spark: SparkSession, sf: str) -> DataFrame:
    """Per-type robust anomaly SUMMARY: median ± {MAD_K}·{MAD_SCALE}·MAD
    band, reporting per event_type the robust stats and how many events
    fall outside — the monitoring-dashboard rollup of the same
    median/MAD gate whose ROW-level arm is ``quality_outliers`` (which
    emits the flagged events themselves at |z| > 2.5); a health monitor
    consumes this bounded types-sized report, not the event stream. The
    median/MAD pair has a 50% breakdown point — one whale cannot drag
    the band the way it drags a mean/stddev gate. (Volume-over-time
    anomalies are ``events_burst_zscore``'s job; this one is about the
    VALUE distribution.)

    Scale shape: exact `percentile` is a per-type map-side-combined
    aggregate (value multiplicity maps); two passes over events (one
    per quantile level, the second over |v − med|), each ONE shuffle
    keyed by event_type, stats broadcast back. At 100 TB swap
    `percentile` → `approx_percentile` (same plan, GK sketch — the
    documented RFM trade)."""
    ev = table(spark, sf, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("med")
    )
    withmed = ev.join(F.broadcast(med), "event_type")
    stats = withmed.groupBy("event_type").agg(
        F.min("med").alias("med"),
        F.percentile(F.abs(F.col("value") - F.col("med")), F.lit(0.5)).alias("mad"),
    )
    flagged = ev.join(F.broadcast(stats), "event_type")
    return flagged.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.round(F.min("med"), 9).alias("median_value"),
        F.round(F.min("mad"), 9).alias("mad"),
        F.sum(
            F.when(
                F.abs(F.col("value") - F.col("med"))
                > F.lit(MAD_K * MAD_SCALE) * F.col("mad"),
                1,
            ).otherwise(0)
        ).alias("n_outliers"),
    )


SQL_EVENTS_ANOMALY_MAD = f"""
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med
  FROM events GROUP BY event_type
),
stats AS (
  SELECT e.event_type, MIN(m.med) AS med,
    quantile_cont(abs(e.value - m.med), 0.5) AS mad
  FROM events e JOIN med m USING (event_type)
  GROUP BY e.event_type
)
SELECT e.event_type, COUNT(*) AS n_events,
  ROUND(MIN(s.med), 9) AS median_value,
  ROUND(MIN(s.mad), 9) AS mad,
  CAST(SUM(CASE WHEN abs(e.value - s.med) > {MAD_K * MAD_SCALE} * s.mad
       THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM events e JOIN stats s USING (event_type)
GROUP BY e.event_type
"""


OUTLIER_TOPK = 20


def q_embedding_centroid_outliers(spark: SparkSession, sf: str) -> DataFrame:
    """Embedding-space outlier ranking: top-{OUTLIER_TOPK} vectors by
    squared distance to their LABEL's centroid — the mislabel/garbage
    detector run on an embedding export before training (a vector far
    from its own class centroid is a label error or junk content).

    Determinism recipe (the mlprobe conventions): centroids are
    per-dimension means of 1e-7-QUANTIZED cells — integer sums are
    order-independent, the final division is one IEEE op — and each
    row's distance is a SEQUENTIAL fold over the 64 dims (F.aggregate
    == list_sum). Top-k is a TakeOrderedAndProject with vec_id
    tie-break, never a global sort.

    Scale shape: one 64-column map-side-combined groupBy per label for
    the centroids (labels are bounded → the centroid table broadcasts),
    one scan computing distances, one bounded top-k."""
    from ..operators.similarity import _as_double

    e = table(spark, sf, "embeddings").select(
        "vec_id", "label", _as_double("embedding").alias("v")
    )
    q = e.select(
        "vec_id",
        "label",
        F.transform("v", lambda x: F.floor(x * F.lit(1e7) + F.lit(0.5))).alias("vq"),
    )
    DIM = 64
    sums = q.groupBy("label").agg(
        F.count("*").alias("n"),
        *[F.sum(F.col("vq")[i]).alias(f"s{i}") for i in range(DIM)],
    )
    cents = sums.select(
        "label",
        F.array(
            *[
                (F.col(f"s{i}").cast("double") / F.lit(1e7) / F.col("n")).alias(
                    f"c{i}"
                )
                for i in range(DIM)
            ]
        ).alias("cent"),
    )
    joined = e.join(F.broadcast(cents), "label")
    dist2 = F.aggregate(
        F.zip_with("v", "cent", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        joined.select(
            "vec_id", "label", F.round(dist2, 9).alias("dist2_to_centroid")
        )
        .orderBy(F.col("dist2_to_centroid").desc(), "vec_id")
        .limit(OUTLIER_TOPK)
    )


SQL_EMBEDDING_CENTROID_OUTLIERS = f"""
WITH e AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
q AS (
  SELECT vec_id, label,
    list_transform(v, x -> floor(x * 1e7 + 0.5)) AS vq, v
  FROM e
),
sums AS (
  SELECT label, i AS pos, SUM(vq[i]) AS s, COUNT(*) AS n
  FROM q, range(1, 65) r(i) GROUP BY label, i
),
cents AS (
  SELECT label,
    list(CAST(s AS DOUBLE) / 1e7 / n ORDER BY pos) AS cent
  FROM sums GROUP BY label
),
d AS (
  SELECT q.vec_id, q.label,
    ROUND(list_sum(list_transform(list_zip(q.v, c.cent),
          p -> (p[1] - p[2]) * (p[1] - p[2]))), 9) AS dist2_to_centroid
  FROM q JOIN cents c USING (label)
)
SELECT vec_id, label, dist2_to_centroid
FROM d ORDER BY dist2_to_centroid DESC, vec_id LIMIT {OUTLIER_TOPK}
"""


NEW_MOD = 10  # "incoming crawl delta" = doc_id % 10 == 3
NEW_REM = 3


def q_dedup_incremental(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental-ingestion dedup — the ASYMMETRIC variant every
    standing pipeline runs on each crawl delta: NEW docs (the
    doc_id % {NEW_MOD} == {NEW_REM} slice stands in for the delta) are
    checked against the STANDING corpus; the standing corpus is never
    re-deduped. Per new doc: exact-dup flag (content hash seen in the
    old corpus), nearest near-dup old doc (capped-shingle Jaccard ≥ 0.5,
    keeper = min old id), and the final keep decision. The batch arms
    (``dedup_exact``/``dedup_fuzzy_clusters``) re-dedup the WHOLE corpus
    — quadratic in history length across crawls; this shape touches each
    old doc once per delta.

    Scale: the old-hash set joins as a left-semi on an md5 key (at real
    scale a Bloom-gated semi-join — ``bloom_decontaminate``'s sketch);
    near-dup candidates come from the same capped posting lists as
    ``dedup_ngram_jaccard_capped`` (pair fan-out bounded by the df cap),
    filtered to cross-side pairs only."""
    from ..operators.dedup import jaccard_pairs

    d = table(spark, sf, "documents")
    is_new = F.col("doc_id") % NEW_MOD == NEW_REM
    old_hashes = (
        d.filter(~is_new).select(F.md5("text").alias("h")).distinct()
    )
    new_docs = d.filter(is_new).select("doc_id", F.md5("text").alias("h"))
    exact_ids = new_docs.join(old_hashes, "h", "left_semi").select("doc_id")
    pairs = jaccard_pairs(_shingles(spark, sf, 5), threshold=0.5, max_df=FUZZY_MAX_DF)
    side = lambda c: F.col(c) % NEW_MOD == NEW_REM
    near = (
        pairs.filter(side("d1") != side("d2"))
        .select(
            F.when(side("d1"), F.col("d1")).otherwise(F.col("d2")).alias("new_id"),
            F.when(side("d1"), F.col("d2")).otherwise(F.col("d1")).alias("old_id"),
        )
        .groupBy("new_id")
        .agg(F.min("old_id").alias("near_dup_of"))
    )
    ex = exact_ids.withColumn("is_exact_dup", F.lit(True))
    return (
        d.filter(is_new)
        .select("doc_id")
        .join(ex, "doc_id", "left")
        .join(near, F.col("doc_id") == F.col("new_id"), "left")
        .select(
            "doc_id",
            F.coalesce(F.col("is_exact_dup"), F.lit(False)).alias("is_exact_dup"),
            "near_dup_of",
            (
                F.coalesce(F.col("is_exact_dup"), F.lit(False)).__invert__()
                & F.col("near_dup_of").isNull()
            ).alias("is_kept"),
        )
    )


SQL_DEDUP_INCREMENTAL = f"""
WITH {{shingle_cte}},
fdf AS (SELECT shingle, COUNT(*) AS c FROM sh GROUP BY 1),
fcapped AS (
  SELECT sh.doc_id, sh.shingle FROM sh JOIN fdf USING (shingle)
  WHERE fdf.c <= {{cap}}
),
p0 AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS inter
  FROM fcapped a JOIN fcapped b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
jpairs AS (
  SELECT d1, d2
  FROM p0
  JOIN sizes sa ON sa.doc_id = d1
  JOIN sizes sb ON sb.doc_id = d2
  WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.5
),
near AS (
  SELECT CASE WHEN d1 % {NEW_MOD} = {NEW_REM} THEN d1 ELSE d2 END AS new_id,
         MIN(CASE WHEN d1 % {NEW_MOD} = {NEW_REM} THEN d2 ELSE d1 END) AS near_dup_of
  FROM jpairs
  WHERE (d1 % {NEW_MOD} = {NEW_REM}) <> (d2 % {NEW_MOD} = {NEW_REM})
  GROUP BY 1
),
oldh AS (
  SELECT DISTINCT md5(text) AS h FROM documents WHERE doc_id % {NEW_MOD} <> {NEW_REM}
)
SELECT d.doc_id,
  (md5(d.text) IN (SELECT h FROM oldh)) AS is_exact_dup,
  n.near_dup_of,
  (NOT (md5(d.text) IN (SELECT h FROM oldh)) AND n.near_dup_of IS NULL) AS is_kept
FROM documents d
LEFT JOIN near n ON n.new_id = d.doc_id
WHERE d.doc_id % {NEW_MOD} = {NEW_REM}
"""

SQL_DEDUP_INCREMENTAL = SQL_DEDUP_INCREMENTAL.format(
    shingle_cte=SQL_SHINGLE_SIZES_CTE, cap=FUZZY_MAX_DF
)


QUERIES: dict[str, Query] = {
    "dedup_line_level": Query(q_dedup_line_level, SQL_DEDUP_LINE_LEVEL),
    "dedup_incremental": Query(q_dedup_incremental, SQL_DEDUP_INCREMENTAL),
    "decontaminate_ngram_overlap": Query(
        q_decontaminate_ngram_overlap, SQL_DECONTAMINATE_NGRAM_OVERLAP
    ),
    "text_mattr": Query(q_text_mattr, SQL_TEXT_MATTR),
    "events_anomaly_mad": Query(q_events_anomaly_mad, SQL_EVENTS_ANOMALY_MAD),
    "embedding_centroid_outliers": Query(
        q_embedding_centroid_outliers, SQL_EMBEDDING_CENTROID_OUTLIERS
    ),
}
