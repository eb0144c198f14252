"""Round-6 wave 18 — vector drift, duplication inflation, churn hazard.

- ``embedding_centroid_drift`` — per-label centroid shift between the
  two vec_id-parity halves of the corpus (L2 of the mean difference +
  cosine of the two centroids): the VECTOR-space drift monitor next
  to the value-space PSI/KS pair — the check run when a new embedding
  export lands ("did the encoder move?"), per label so a single
  drifting class can't hide in the global mean.
- ``dedup_inflation_report`` — per-source token-count inflation from
  exact duplication (total tokens / unique-fingerprint tokens): the
  one-number answer to "how much of this source's token budget is
  copies" — the pre-dedup sizing pass that decides whether the dedup
  stage is worth its shuffle for a source.
- ``events_churn_hazard`` — gap-exceedance curve: the share of
  inter-arrival gaps exceeding 1 h / 1 day / 3 days — the empirical
  hazard thresholds behind session timeouts and churn definitions
  (where the curve flattens is where "inactive" stops being noise).

Determinism: the centroid sums use the proven 1e-7 IEEE quantizer
(identical floor() in both engines, exact integer sums after);
inflation and hazard shares are single divisions of exact BIGINTs
(bit-exact unrounded); the centroid geometry doubles are identical
closed-form expressions with ROUND absorbing order. Labels missing a
half and zero-norm centroids carry identical guards in both engines
(degenerate corpora pinned in tests/test_round6_waves.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import tokens as _tokens
from ..operators.similarity import _as_double
from ..sources import table
from .base import Query

HAZARD_THRESHOLDS_S = (3600, 86400, 259200)


def q_embedding_centroid_drift(spark: SparkSession, sf: str) -> DataFrame:
    """Per-label drift between the vec_id-parity halves: half sizes,
    L2 shift of the centroid, and the cosine between the two
    centroids (1 = direction unchanged). Labels present in only one
    half are excluded by the same predicate in both engines.

    Plan: ONE posexplode pass to (label, pos) cells carrying both
    halves' exact quantized sums and counts (map-side combinable,
    |labels|·dim cells); the L2/cosine rollup is cell-space. At
    100 TB the halves are two exports and the split column is the
    export id — same plan."""
    e = table(spark, sf, "embeddings")
    comp = e.select(
        "label",
        (F.col("vec_id") % 2 == 0).alias("a"),
        F.posexplode(_as_double("embedding")).alias("pos", "x"),
    )
    q = F.floor(F.col("x") * F.lit(1e7) + F.lit(0.5))
    cells = comp.groupBy("label", "pos").agg(
        F.sum(F.when(F.col("a"), q)).alias("sa"),
        F.count(F.when(F.col("a"), 1)).alias("na"),
        F.sum(F.when(~F.col("a"), q)).alias("sb"),
        F.count(F.when(~F.col("a"), 1)).alias("nb"),
    )
    both = cells.filter((F.col("na") > 0) & (F.col("nb") > 0))
    ma = F.col("sa") / F.lit(1e7) / F.col("na")
    mb = F.col("sb") / F.lit(1e7) / F.col("nb")
    geo = both.groupBy("label").agg(
        F.max(F.col("na")).alias("n_half_a"),
        F.max(F.col("nb")).alias("n_half_b"),
        F.sum((ma - mb) * (ma - mb)).alias("d2"),
        F.sum(ma * mb).alias("dot"),
        F.sum(ma * ma).alias("n2a"),
        F.sum(mb * mb).alias("n2b"),
    )
    return geo.select(
        "label",
        "n_half_a",
        "n_half_b",
        F.round(F.sqrt(F.col("d2")), 6).alias("centroid_l2_shift"),
        F.round(
            F.when(
                (F.col("n2a") > 0) & (F.col("n2b") > 0),
                F.col("dot")
                / (F.sqrt(F.col("n2a")) * F.sqrt(F.col("n2b"))),
            ),
            9,
        ).alias("centroid_cosine"),
    ).orderBy("label")


SQL_EMBEDDING_CENTROID_DRIFT = """
WITH comp AS (
  SELECT label, a, i - 1 AS pos,
    CAST(floor(v[i] * 1e7 + 0.5) AS BIGINT) AS q
  FROM (
    SELECT label, vec_id % 2 = 0 AS a,
      CAST(embedding AS DOUBLE[]) AS v
    FROM embeddings
  ), range(1, 100000) r(i) WHERE i <= len(v)
),
cells AS (
  SELECT label, pos,
    CAST(SUM(CASE WHEN a THEN q END) AS BIGINT) AS sa,
    COUNT(CASE WHEN a THEN 1 END) AS na,
    CAST(SUM(CASE WHEN NOT a THEN q END) AS BIGINT) AS sb,
    COUNT(CASE WHEN NOT a THEN 1 END) AS nb
  FROM comp GROUP BY 1, 2
),
geo AS (
  SELECT label, MAX(na) AS n_half_a, MAX(nb) AS n_half_b,
    SUM((sa / 1e7 / na - sb / 1e7 / nb) * (sa / 1e7 / na - sb / 1e7 / nb))
      AS d2,
    SUM((sa / 1e7 / na) * (sb / 1e7 / nb)) AS dot,
    SUM((sa / 1e7 / na) * (sa / 1e7 / na)) AS n2a,
    SUM((sb / 1e7 / nb) * (sb / 1e7 / nb)) AS n2b
  FROM cells WHERE na > 0 AND nb > 0 GROUP BY 1
)
SELECT label, n_half_a, n_half_b,
  ROUND(sqrt(d2), 6) AS centroid_l2_shift,
  ROUND(CASE WHEN n2a > 0 AND n2b > 0
    THEN dot / (sqrt(n2a) * sqrt(n2b)) END, 9) AS centroid_cosine
FROM geo ORDER BY label
"""


def q_dedup_inflation_report(spark: SparkSession, sf: str) -> DataFrame:
    """Per-source duplication inflation: documents vs unique
    fingerprints, total vs unique-fingerprint token mass, and the
    inflation factor total/unique (1.0 = no exact copies) — single
    division of exact BIGINTs, bit-exact unrounded.

    Plan: one scan to (source, fingerprint) cells (count + the
    members' common token count), then a source rollup — the
    fingerprint agg is the same shuffle the dedup itself would pay,
    which is the point: this report prices it first."""
    d = table(spark, sf, "documents")
    per = d.select(
        "source",
        F.md5("text").alias("h"),
        F.size(_tokens(F.col("text"))).alias("tok"),
    )
    cells = per.groupBy("source", "h").agg(
        F.count(F.lit(1)).alias("copies"), F.max("tok").alias("tok")
    )
    return (
        cells.groupBy("source")
        .agg(
            F.sum("copies").alias("n_docs"),
            F.count(F.lit(1)).alias("n_unique"),
            F.sum(F.col("copies") * F.col("tok")).alias("total_tokens"),
            F.sum("tok").alias("unique_tokens"),
        )
        .select(
            "source",
            "n_docs",
            "n_unique",
            "total_tokens",
            "unique_tokens",
            F.when(
                F.col("unique_tokens") > 0,
                F.col("total_tokens") / F.col("unique_tokens"),
            ).alias("inflation"),
        )
        .orderBy("source")
    )


SQL_DEDUP_INFLATION_REPORT = """
WITH per AS (
  SELECT source, md5(text) AS h,
    len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
      x -> x <> '')) AS tok
  FROM documents
),
cells AS (
  SELECT source, h, COUNT(*) AS copies, MAX(tok) AS tok
  FROM per GROUP BY 1, 2
)
SELECT source,
  CAST(SUM(copies) AS BIGINT) AS n_docs,
  COUNT(*) AS n_unique,
  CAST(SUM(copies * tok) AS BIGINT) AS total_tokens,
  CAST(SUM(tok) AS BIGINT) AS unique_tokens,
  CASE WHEN CAST(SUM(tok) AS BIGINT) > 0
    THEN CAST(SUM(copies * tok) AS BIGINT) * 1.0
         / CAST(SUM(tok) AS BIGINT) END AS inflation
FROM cells GROUP BY source ORDER BY source
"""


def q_events_churn_hazard(spark: SparkSession, sf: str) -> DataFrame:
    """Gap-exceedance curve at {HAZARD_THRESHOLDS_S} seconds (1 h /
    1 d / 3 d): of all per-user inter-arrival gaps, the share
    exceeding each threshold — the empirical basis for session
    timeouts and the 'inactive user' cutoff. Shares are single
    divisions of exact integers.

    Plan: the ``events_interarrival`` gap frame (one user-keyed lag
    window) aggregated ONCE with one conditional counter per
    threshold — the threshold sweep costs one scan total, not one
    per threshold."""
    ev = table(spark, sf, "events")
    from pyspark.sql import Window

    u = F.unix_micros(F.col("ts"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        ev.select(
            ((u - F.lag(u).over(w)) / F.lit(1000000))
            .cast("bigint")
            .alias("g"),
        )
        .filter(F.col("g").isNotNull())
    )
    # 1-row frame consumed by one branch per threshold — localCheckpoint
    # so the union does NOT replay the events scan per branch (the
    # filter_cascade_report lesson)
    agg = gaps.agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.count(F.when(F.col("g") > t, 1)).alias(f"x{t}")
            for t in HAZARD_THRESHOLDS_S
        ],
    ).localCheckpoint(eager=True)
    rows = []
    for t in HAZARD_THRESHOLDS_S:
        rows.append(
            agg.select(
                F.lit(t).alias("threshold_s"),
                F.col("n").alias("n_gaps"),
                F.col(f"x{t}").alias("n_exceed"),
                (F.col(f"x{t}") / F.col("n")).alias("exceed_share"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out


def _hazard_oracle() -> str:
    selects = [
        f"""SELECT {t} AS threshold_s, n AS n_gaps, x{t} AS n_exceed,
  x{t} * 1.0 / n AS exceed_share FROM agg"""
        for t in HAZARD_THRESHOLDS_S
    ]
    body = "\nUNION ALL\n".join(selects)
    counters = ",\n    ".join(
        f"COUNT(CASE WHEN g > {t} THEN 1 END) AS x{t}"
        for t in HAZARD_THRESHOLDS_S
    )
    return f"""
WITH gaps AS (
  SELECT (epoch_us(ts) - lag(epoch_us(ts)) OVER
    (PARTITION BY user_id ORDER BY ts, event_id)) // 1000000 AS g
  FROM events
),
agg AS (
  SELECT COUNT(*) AS n,
    {counters}
  FROM gaps WHERE g IS NOT NULL
)
{body}
"""


QUERIES: dict[str, Query] = {
    "embedding_centroid_drift": Query(
        q_embedding_centroid_drift, SQL_EMBEDDING_CENTROID_DRIFT
    ),
    "dedup_inflation_report": Query(
        q_dedup_inflation_report, SQL_DEDUP_INFLATION_REPORT
    ),
    "events_churn_hazard": Query(q_events_churn_hazard, _hazard_oracle()),
}
