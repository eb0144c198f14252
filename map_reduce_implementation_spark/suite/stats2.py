"""Round-5 wave 13 — information-theoretic and time-series statistics.

- ``corpus_mutual_information`` — mutual information I(lang; source)
  over the documents table, with both marginal entropies and a
  normalized score: the confounding audit run BEFORE training any
  classifier on a mixture (if language is predictable from source,
  a "quality by source" decision silently becomes a language policy —
  the Simpson's-paradox trap of mixture curation).
- ``events_autocorrelation`` — sample autocorrelation of the hourly
  event-count series at lags 1, 2, and 24 (the seasonality detector:
  r₂₄ ≈ 1 says strong daily cycle; all-near-0 says white noise). The
  classic ACF, computed calendar-correct (lag pairs join on the hour
  timestamp, not sequence position, so gap hours don't shift the lag).

Determinism: every sum is over exact integers (cell counts, hourly
counts and their products); the handful of double ops that follow
(p·ln p terms over ≤|langs|·|sources| cells, the ACF's closed-form
numerator/denominator) are identical expressions in both engines with
ROUND 6 absorbing summation-order ulps — the unigram-NLL recipe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import table
from .base import Query
from .text import _tokens

ACF_LAGS = (1, 2, 24)


def q_corpus_mutual_information(spark: SparkSession, sf: str) -> DataFrame:
    """I(lang; source) in nats, H(lang), H(source), and the
    min-entropy-normalized MI (0 = independent, 1 = one determines
    the other) — one row.

    Plan: ONE corpus scan to the |langs|×|sources| contingency cells;
    marginals, entropies, and the MI sum are all cell-space work. The
    per-cell term (n_ls/n)·ln(n_ls·n/(r_l·c_s)) uses only exact
    integer inputs; the normalized score guards the single-class case
    (min entropy 0) with an identical CASE in both engines."""
    d = table(spark, sf, "documents")
    cells = (
        d.groupBy("lang", "source")
        .agg(F.count(F.lit(1)).alias("n_ls"))
        .localCheckpoint(eager=True)
    )
    rows = cells.groupBy("lang").agg(F.sum("n_ls").alias("r_l"))
    cols = cells.groupBy("source").agg(F.sum("n_ls").alias("c_s"))
    tot = cells.agg(F.sum("n_ls").alias("n"))
    joined = (
        cells.join(F.broadcast(rows), "lang")
        .join(F.broadcast(cols), "source")
        .crossJoin(F.broadcast(tot))
    )
    mi = F.sum(
        (F.col("n_ls") / F.col("n"))
        * F.log(
            F.col("n_ls") * F.col("n") / (F.col("r_l") * F.col("c_s"))
        )
    ).alias("mi_raw")
    agg = joined.agg(F.max("n").alias("n_docs"), mi)
    hl = rows.crossJoin(F.broadcast(tot)).agg(
        (
            -F.sum(
                (F.col("r_l") / F.col("n"))
                * F.log(F.col("r_l") / F.col("n"))
            )
        ).alias("h_lang_raw")
    )
    hs = cols.crossJoin(F.broadcast(tot)).agg(
        (
            -F.sum(
                (F.col("c_s") / F.col("n"))
                * F.log(F.col("c_s") / F.col("n"))
            )
        ).alias("h_source_raw")
    )
    out = agg.crossJoin(F.broadcast(hl)).crossJoin(F.broadcast(hs))
    minh = F.least(F.col("h_lang_raw"), F.col("h_source_raw"))
    return out.select(
        "n_docs",
        F.round("mi_raw", 6).alias("mi_nats"),
        F.round("h_lang_raw", 6).alias("h_lang"),
        F.round("h_source_raw", 6).alias("h_source"),
        F.round(
            F.when(minh > 0, F.col("mi_raw") / minh), 6
        ).alias("normalized_mi"),
    )


SQL_CORPUS_MUTUAL_INFORMATION = """
WITH cells AS (
  SELECT lang, source, COUNT(*) AS n_ls FROM documents GROUP BY 1, 2
),
rows_ AS (SELECT lang, CAST(SUM(n_ls) AS BIGINT) AS r_l FROM cells GROUP BY 1),
cols_ AS (SELECT source, CAST(SUM(n_ls) AS BIGINT) AS c_s FROM cells GROUP BY 1),
tot AS (SELECT CAST(SUM(n_ls) AS BIGINT) AS n FROM cells),
agg AS (
  SELECT MAX(n) AS n_docs,
    SUM((n_ls * 1.0 / n) * ln(n_ls * n * 1.0 / (r_l * c_s))) AS mi_raw
  FROM cells
  JOIN rows_ ON cells.lang = rows_.lang
  JOIN cols_ ON cells.source = cols_.source
  CROSS JOIN tot
),
hl AS (
  SELECT -SUM((r_l * 1.0 / n) * ln(r_l * 1.0 / n)) AS h_lang_raw
  FROM rows_ CROSS JOIN tot
),
hs AS (
  SELECT -SUM((c_s * 1.0 / n) * ln(c_s * 1.0 / n)) AS h_source_raw
  FROM cols_ CROSS JOIN tot
)
SELECT n_docs,
  ROUND(mi_raw, 6) AS mi_nats,
  ROUND(h_lang_raw, 6) AS h_lang,
  ROUND(h_source_raw, 6) AS h_source,
  ROUND(CASE WHEN least(h_lang_raw, h_source_raw) > 0
    THEN mi_raw / least(h_lang_raw, h_source_raw) END, 6) AS normalized_mi
FROM agg CROSS JOIN hl CROSS JOIN hs
"""


def q_events_autocorrelation(spark: SparkSession, sf: str) -> DataFrame:
    """Sample ACF of the hourly event-count series at lags
    {ACF_LAGS}: rₖ = Σ(yₜ−ȳ)(yₜ₊ₖ−ȳ) / Σ(yₜ−ȳ)², pairs matched on
    the CALENDAR hour (t and t+k both observed), mean and denominator
    over the full observed series — the standard estimator.

    Plan: one events scan to the hour-bucketed count frame (bounded
    by the stream's time span, not its volume — localCheckpoint'd;
    the lag joins, the scalar moments, and all three lag rows derive
    from it with zero further corpus work). The closed form expands
    the numerator to integer sums (Σyₜyₜ₊ₖ, Σyₜ, Σyₜ₊ₖ, pair count)
    so both engines do the identical double arithmetic on exact
    inputs; a constant series (zero variance) yields guarded NULLs."""
    ev = table(spark, sf, "events")
    hourly = (
        ev.groupBy(F.date_trunc("hour", "ts").alias("h"))
        .agg(F.count(F.lit(1)).alias("y"))
        .localCheckpoint(eager=True)
    )
    # Round-12 optimization (guide §2.1/§2.4): the scalar-moments
    # aggregate is materialized once (it was replayed per lag branch)
    # and the three per-lag self-joins collapse into ONE join — the
    # a-side explodes each hour row into its |lags| shifted probes and
    # a single lag-keyed aggregate yields every lag's exact integer
    # sums. A literal lag spine left-join keeps zero-pair lags
    # emitting the same (np=0, NULL acf) row the empty per-lag
    # aggregate produced.
    spark = ev.sparkSession
    scalars = hourly.agg(
        F.count(F.lit(1)).alias("nh"),
        F.sum("y").alias("s"),
        F.sum(F.col("y") * F.col("y")).alias("ss"),
    ).localCheckpoint(eager=True)
    lag_arr = F.array(*[F.lit(int(k)) for k in ACF_LAGS])
    # shifted probe hour: h + lag hours (identical addition semantics
    # to the former per-branch INTERVAL literal under the UTC session)
    a_exp = hourly.select(
        F.col("y").alias("y1"),
        F.explode(lag_arr).alias("lag"),
        F.col("h").alias("ah"),
    ).withColumn(
        "th", F.col("ah") + F.make_interval(hours=F.col("lag"))
    )
    grouped = (
        a_exp.join(hourly.alias("b"), F.col("b.h") == F.col("th"))
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).alias("np"),
            F.sum(F.col("y1") * F.col("y")).alias("a12"),
            F.sum("y1").alias("b1"),
            F.sum("y").alias("b2"),
        )
    )
    spine = spark.range(1).select(F.explode(lag_arr).alias("lag"))
    psums = spine.join(grouped, "lag", "left").select(
        "lag",
        F.coalesce("np", F.lit(0)).alias("np"),
        "a12",
        "b1",
        "b2",
    )
    j = psums.crossJoin(F.broadcast(scalars))
    ybar = F.col("s").cast("double") / F.col("nh")
    num = (
        F.col("a12").cast("double")
        - ybar * (F.col("b1") + F.col("b2")).cast("double")
        + F.col("np").cast("double") * ybar * ybar
    )
    den = F.col("ss").cast("double") - F.col("nh").cast("double") * ybar * ybar
    return j.select(
        "lag",
        F.col("np").alias("n_pairs"),
        F.round(F.when(den > 0, num / den), 6).alias("acf"),
    )


def _acf_oracle(lags: tuple[int, ...] = ACF_LAGS) -> str:
    selects = []
    for k in lags:
        selects.append(
            f"""SELECT {k} AS lag, np AS n_pairs,
  ROUND(CASE WHEN CAST(ss AS DOUBLE) - CAST(nh AS DOUBLE)
      * (CAST(s AS DOUBLE) / nh) * (CAST(s AS DOUBLE) / nh) > 0
    THEN (CAST(a12 AS DOUBLE)
          - (CAST(s AS DOUBLE) / nh) * CAST(b1 + b2 AS DOUBLE)
          + CAST(np AS DOUBLE) * (CAST(s AS DOUBLE) / nh)
            * (CAST(s AS DOUBLE) / nh))
         / (CAST(ss AS DOUBLE) - CAST(nh AS DOUBLE)
            * (CAST(s AS DOUBLE) / nh) * (CAST(s AS DOUBLE) / nh))
    END, 6) AS acf
FROM (
  SELECT COUNT(*) AS np,
    CAST(SUM(a.y * b.y) AS BIGINT) AS a12,
    CAST(SUM(a.y) AS BIGINT) AS b1, CAST(SUM(b.y) AS BIGINT) AS b2
  FROM hourly a JOIN hourly b ON b.h = a.h + INTERVAL {k} HOUR
) CROSS JOIN scalars"""
        )
    body = "\nUNION ALL\n".join(selects)
    return f"""
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS h, COUNT(*) AS y FROM events GROUP BY 1
),
scalars AS (
  SELECT COUNT(*) AS nh, CAST(SUM(y) AS BIGINT) AS s,
    CAST(SUM(y * y) AS BIGINT) AS ss
  FROM hourly
)
{body}
"""


def q_events_changepoint_cusum(spark: SparkSession, sf: str) -> DataFrame:
    """CUSUM change-point detection (Page 1954) on the hourly
    event-count series: Sₜ = Σ≤ₜ(yᵢ − ȳ) peaks in magnitude at the
    most likely level-shift hour. One row: the arg-max hour, the peak
    CUSUM value, and the mean rate before/after it — the "WHEN did
    traffic change" localizer next to the drift monitors'
    "DID the distribution change" (events_drift_psi/ks) and the ACF's
    "is it periodic".

    Determinism: the comparison key is the INTEGER Dₜ = N·prefixₜ −
    t·S (= N·Sₜ — same arg-max, no floats), prefix sums over the
    bounded hourly frame; ties break on the earliest hour; the
    reported CUSUM and means are single divisions of exact integers.
    Plan: one events scan to the hour-bounded count frame
    (localCheckpoint'd — the cumulative window, the arg-max cut, and
    the before/after aggregate all derive from it), windows run on
    |hours| rows, the arg-max is a TakeOrderedAndProject(1)."""
    from pyspark.sql import Window

    ev = table(spark, sf, "events")
    hourly = (
        ev.groupBy(F.date_trunc("hour", "ts").alias("h"))
        .agg(F.count(F.lit(1)).alias("y"))
        .localCheckpoint(eager=True)
    )
    scalars = hourly.agg(
        F.count(F.lit(1)).alias("nh"), F.sum("y").alias("s")
    )
    w = Window.orderBy("h").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = hourly.select(
        "h",
        F.row_number().over(Window.orderBy("h")).alias("t"),
        F.sum("y").over(w).alias("prefix"),
    )
    d = cum.crossJoin(F.broadcast(scalars)).select(
        "h",
        "t",
        (F.col("nh") * F.col("prefix") - F.col("t") * F.col("s")).alias(
            "dint"
        ),
        "nh",
        "s",
    )
    peak = d.orderBy(F.abs(F.col("dint")).desc(), F.asc("h")).limit(1)
    before = hourly.crossJoin(F.broadcast(peak.select(F.col("h").alias("ph"))))
    return (
        before.groupBy()
        .agg(
            F.sum(F.when(F.col("h") <= F.col("ph"), F.col("y"))).alias("sb"),
            F.count(F.when(F.col("h") <= F.col("ph"), 1)).alias("nb"),
            F.sum(F.when(F.col("h") > F.col("ph"), F.col("y"))).alias("sa"),
            F.count(F.when(F.col("h") > F.col("ph"), 1)).alias("na"),
            F.max("ph").alias("changepoint_hour"),
        )
        .crossJoin(F.broadcast(peak.select("dint", "nh")))
        .select(
            F.col("nh").alias("n_hours"),
            "changepoint_hour",
            F.round(
                F.col("dint").cast("double") / F.col("nh"), 6
            ).alias("cusum_peak"),
            F.round(F.col("sb") / F.col("nb"), 6).alias("mean_before"),
            F.round(
                F.when(F.col("na") > 0, F.col("sa") / F.col("na")), 6
            ).alias("mean_after"),
        )
    )


SQL_EVENTS_CHANGEPOINT_CUSUM = """
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS h, COUNT(*) AS y FROM events GROUP BY 1
),
scalars AS (
  SELECT COUNT(*) AS nh, CAST(SUM(y) AS BIGINT) AS s FROM hourly
),
cum AS (
  SELECT h,
    ROW_NUMBER() OVER (ORDER BY h) AS t,
    CAST(SUM(y) OVER (ORDER BY h ROWS UNBOUNDED PRECEDING) AS BIGINT)
      AS prefix
  FROM hourly
),
d AS (
  SELECT h, t, nh * prefix - t * s AS dint, nh, s
  FROM cum CROSS JOIN scalars
),
peak AS (SELECT * FROM d ORDER BY abs(dint) DESC, h ASC LIMIT 1)
SELECT p.nh AS n_hours,
  p.h AS changepoint_hour,
  ROUND(CAST(p.dint AS DOUBLE) / p.nh, 6) AS cusum_peak,
  ROUND(CAST(SUM(CASE WHEN hourly.h <= p.h THEN y END) AS BIGINT) * 1.0
        / COUNT(CASE WHEN hourly.h <= p.h THEN 1 END), 6) AS mean_before,
  ROUND(CASE WHEN COUNT(CASE WHEN hourly.h > p.h THEN 1 END) > 0
    THEN CAST(SUM(CASE WHEN hourly.h > p.h THEN y END) AS BIGINT) * 1.0
         / COUNT(CASE WHEN hourly.h > p.h THEN 1 END) END, 6) AS mean_after
FROM hourly CROSS JOIN peak p
GROUP BY p.nh, p.h, p.dint
"""


PMI_MIN_COUNT = 5  # collocation support floor
PMI_TOP_K = 20


def q_collocations_pmi(spark: SparkSession, sf: str) -> DataFrame:
    """Top-{PMI_TOP_K} collocations by pointwise mutual information
    (Church & Hanks 1990): adjacent pairs with count ≥ {PMI_MIN_COUNT}
    scored by ln(c₁₂·U²/(B·c₁·c₂)) — the pair-level companion to
    ``corpus_mutual_information``'s corpus-level score and the
    classic phrase-mining primitive (tokenizer vocab seeding,
    stopword-phrase discovery).

    Plan: ONE corpus pass yields the pair counts (zip_with, no
    shuffle to form pairs); unigram counts and the two totals are
    aggregates of the same token stream; both model frames broadcast;
    the cut is a TakeOrderedAndProject on (rounded PMI, pair). All
    inputs to the single ln are exact integers."""
    d = table(spark, sf, "documents")
    ts = _tokens(F.col("text"))
    n = F.size(ts)
    pair_structs = F.zip_with(
        F.slice(ts, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(ts, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("prev"), b.alias("cur")),
    )
    pairs = d.select(F.explode(pair_structs).alias("b")).select(
        "b.prev", "b.cur"
    )
    tok = d.select(F.explode(ts).alias("term"))
    # Round-12 optimization (guide §2.2/§2.4): materialize the two
    # vocabulary-sized count tables once and DERIVE the totals from
    # them (utot = Σc over terms, btot = Σc12 over unfiltered pair
    # types — exact integer identities), so each token stream is built
    # once instead of per consumer (3 corpus tokenizations → 2; the
    # remaining two are the distinct unigram/bigram streams).
    c1 = (
        tok.groupBy("term")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)
    )
    u = c1.agg(F.sum("c").alias("utot"))
    c2all = (
        pairs.groupBy("prev", "cur")
        .agg(F.count(F.lit(1)).alias("c12"))
        .localCheckpoint(eager=True)
    )
    c2 = c2all.filter(F.col("c12") >= PMI_MIN_COUNT)
    btot = c2all.agg(F.sum("c12").alias("btot"))
    scored = (
        c2.join(
            F.broadcast(c1.select(F.col("term").alias("prev"), F.col("c").alias("cp"))),
            "prev",
        )
        .join(
            F.broadcast(c1.select(F.col("term").alias("cur"), F.col("c").alias("cc"))),
            "cur",
        )
        .crossJoin(F.broadcast(u))
        .crossJoin(F.broadcast(btot))
        .select(
            "prev",
            "cur",
            F.col("c12").alias("n_pair"),
            # sum-of-logs form: the single-fraction ln(c12·U²/(B·c₁·c₂))
            # overflows the integer product c12·U² once U ~ 1e9+; the
            # decomposition is overflow-free at any scale and its ≤1-ulp
            # per-term differences vanish under ROUND 6 (the
            # unigram-NLL precedent)
            F.round(
                F.log("c12")
                + F.lit(2.0) * F.log("utot")
                - F.log("btot")
                - F.log("cp")
                - F.log("cc"),
                6,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(
        F.desc("pmi"), F.asc("prev"), F.asc("cur")
    ).limit(PMI_TOP_K)


SQL_COLLOCATIONS_PMI = f"""
WITH t AS (
  SELECT list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks
  FROM documents
), bg AS (
  SELECT unnest(list_zip(toks[1:len(toks)-1], toks[2:len(toks)])) AS b
  FROM t WHERE len(toks) >= 2
), pairs AS (
  SELECT b[1] AS prev, b[2] AS cur FROM bg
),
tok AS (SELECT unnest(toks) AS term FROM t),
c1 AS (SELECT term, COUNT(*) AS c FROM tok GROUP BY term),
u AS (SELECT CAST(SUM(c) AS BIGINT) AS utot FROM c1),
c2 AS (
  SELECT prev, cur, COUNT(*) AS c12 FROM pairs GROUP BY 1, 2
  HAVING COUNT(*) >= {PMI_MIN_COUNT}
),
btot AS (SELECT COUNT(*) AS btot FROM pairs)
SELECT c2.prev, c2.cur, c12 AS n_pair,
  ROUND(ln(c12) + 2.0 * ln(utot) - ln(btot) - ln(cp.c) - ln(cc.c), 6)
    AS pmi
FROM c2
JOIN c1 cp ON c2.prev = cp.term
JOIN c1 cc ON c2.cur = cc.term
CROSS JOIN u CROSS JOIN btot
ORDER BY pmi DESC, c2.prev ASC, c2.cur ASC LIMIT {PMI_TOP_K}
"""


QUERIES: dict[str, Query] = {
    "corpus_mutual_information": Query(
        q_corpus_mutual_information, SQL_CORPUS_MUTUAL_INFORMATION
    ),
    "events_autocorrelation": Query(
        q_events_autocorrelation, _acf_oracle()
    ),
    "events_changepoint_cusum": Query(
        q_events_changepoint_cusum, SQL_EVENTS_CHANGEPOINT_CUSUM
    ),
    "text_collocations_pmi": Query(
        q_collocations_pmi, SQL_COLLOCATIONS_PMI
    ),
}
