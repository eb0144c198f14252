"""Distribution-drift monitoring (round 5): PSI and two-sample KS per
event type between the stream's first and second time halves.

Why these two: they are THE production data-drift pair. PSI
(population stability index, the credit-scoring/monitoring standard:
Σ (p_cur − p_ref)·ln(p_cur/p_ref) over reference-calibrated deciles,
alert ≥ 0.1) answers "has the binned distribution shifted"; the
two-sample Kolmogorov–Smirnov statistic D = max |F_ref − F_cur|
answers the same question non-parametrically, with no binning choice
to defend. A pipeline that retrains on fresh data runs both per
feature per period; here the feature is ``events.value`` and the
periods are the halves split at the median timestamp, so the entry is
self-contained on the shipped tables.

Determinism: the split boundary and the decile cut-points come from
exact ``F.percentile`` ↔ ``quantile_cont`` (the RFM/MAD-proven pair);
bin assignment is a sequential fold counting cut-points ≤ value;
shares are integer-ratio divisions with +0.5/+5 Laplace smoothing
(identical literals both engines); the PSI sum is a SEQUENTIAL fold
over bin-ordered terms (ln agreement proven by the hash-graded
``text_char_entropy``); KS CDFs are integer-count ratios under
per-type value-ordered windows — no libm at all on the KS path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import table
from .base import Query

PSI_BINS = 10  # reference-calibrated deciles (9 interior cut-points)
PSI_ALERT = 0.1  # the standard "investigate" threshold
KS_ALERT = 0.05


def _halves(spark: SparkSession, sf: str) -> DataFrame:
    """Events tagged ref/cur by the median-timestamp split (period 1 =
    strictly before the median microsecond): (event_type, value, is_ref)."""
    e = table(spark, sf, "events").filter(F.col("value").isNotNull())
    e = e.select("event_type", "value", F.unix_micros("ts").alias("us"))
    # 1-row boundary, localCheckpointed: every branch that re-derives
    # the halves frame would otherwise replay the median scan too
    m = e.agg(F.percentile("us", F.lit(0.5)).alias("m")).localCheckpoint(
        eager=True
    )
    return e.crossJoin(F.broadcast(m)).select(
        "event_type", "value", (F.col("us") < F.col("m")).alias("is_ref")
    )


def q_events_drift_psi(spark: SparkSession, sf: str) -> DataFrame:
    """Per-type PSI of ``value`` between the time halves, binned by the
    REFERENCE half's own deciles (the defining PSI convention — bins
    are calibrated where the model was trained, then the current
    period is poured into them). Laplace-smoothed shares keep empty
    bins finite, and the bin dimension is COMPLETED per type (tied
    reference deciles can collapse cut-points; unreachable bins still
    carry their smoothing terms, per the binned definition). Types
    with no reference rows have no bins to calibrate and are excluded
    by construction — a type appearing only in the current half is an
    existence change, surfaced by ``events_type_stats``, not a PSI.
    Output: per type, both populations, psi, and the ≥ {PSI_ALERT}
    alert flag.

    Scale shape: one scan tags periods against the broadcast median;
    cut-points are one exact-percentile aggregate per type (broadcast
    back, the RFM recipe — never a global sort); bin counts are a
    (type, period, bin)-keyed map-side-combined groupBy; the PSI fold
    runs over {PSI_BINS}-element lists on a types-sized frame."""
    h = _halves(spark, sf)
    cuts = (
        h.filter("is_ref")
        .groupBy("event_type")
        .agg(
            F.percentile(
                "value",
                F.array(*[F.lit(i / PSI_BINS) for i in range(1, PSI_BINS)]),
            ).alias("cuts")
        )
        .localCheckpoint(eager=True)  # types-sized; downstream branches
        # must not replay the reference-half percentile scan
    )
    binned = h.join(F.broadcast(cuts), "event_type").select(
        "event_type",
        "is_ref",
        F.aggregate(
            "cuts",
            F.lit(0),
            lambda acc, c: acc + (F.col("value") >= c).cast("int"),
        ).alias("bin"),
    )
    counts_obs = binned.groupBy("event_type", "bin").agg(
        F.sum(F.col("is_ref").cast("long")).alias("c_ref"),
        F.sum((~F.col("is_ref")).cast("long")).alias("c_cur"),
    )
    # complete the bin dimension: tied reference deciles can collapse
    # cut-points and leave bins unreachable in BOTH halves — the binned
    # PSI definition (and its smoothing) still charges those bins, so
    # they must appear as zero rows, not be silently absent
    bins_dim = cuts.select(
        "event_type",
        F.explode(F.sequence(F.lit(0), F.lit(PSI_BINS - 1))).alias("bin"),
    )
    counts = (
        bins_dim.join(counts_obs, ["event_type", "bin"], "left")
        .select(
            "event_type",
            "bin",
            F.coalesce("c_ref", F.lit(0)).alias("c_ref"),
            F.coalesce("c_cur", F.lit(0)).alias("c_cur"),
        )
        .localCheckpoint(eager=True)  # types×bins rows; reused by tot + terms
    )
    tot = counts.groupBy("event_type").agg(
        F.sum("c_ref").alias("n_ref"), F.sum("c_cur").alias("n_cur")
    )
    # Laplace smoothing (+0.5 per bin, +BINS/2 per total) keeps
    # log-ratios finite when a bin is empty on one side
    p_ref = (F.col("c_ref") + F.lit(0.5)) / (
        F.col("n_ref") + F.lit(PSI_BINS * 0.5)
    )
    p_cur = (F.col("c_cur") + F.lit(0.5)) / (
        F.col("n_cur") + F.lit(PSI_BINS * 0.5)
    )
    terms = counts.join(F.broadcast(tot), "event_type").select(
        "event_type",
        "bin",
        "n_ref",
        "n_cur",
        ((p_cur - p_ref) * F.log(p_cur / p_ref)).alias("term"),
    )
    psi = (
        terms.groupBy("event_type")
        .agg(
            F.first("n_ref").alias("n_ref"),
            F.first("n_cur").alias("n_cur"),
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("bin", "term"))),
                F.lit(0.0),
                lambda acc, x: acc + x["term"],
            ).alias("psi_raw"),
        )
    )
    return psi.select(
        "event_type",
        "n_ref",
        "n_cur",
        F.round("psi_raw", 9).alias("psi"),
        (F.round("psi_raw", 9) >= PSI_ALERT).alias("drifted"),
    )


_SQL_HALVES = """
h AS (
  SELECT event_type, value, epoch_us(ts) < m.m AS is_ref
  FROM events,
    (SELECT quantile_cont(epoch_us(ts), 0.5) AS m FROM events
     WHERE value IS NOT NULL) m
  WHERE value IS NOT NULL
)
"""
# the median subquery filters NULL values exactly like the Spark side's
# _halves (isNotNull BEFORE the percentile) — without it the two
# engines would pick different boundaries the moment a NULL appears

_PSI_FRACS = ", ".join(str(i / PSI_BINS) for i in range(1, PSI_BINS))

SQL_EVENTS_DRIFT_PSI = f"""
WITH {_SQL_HALVES},
cuts AS (
  SELECT event_type, quantile_cont(value, [{_PSI_FRACS}]) AS cuts
  FROM h WHERE is_ref GROUP BY event_type
),
binned AS (
  SELECT h.event_type, h.is_ref,
    list_sum(list_transform(c.cuts, x -> CASE WHEN h.value >= x THEN 1 ELSE 0 END))
      AS bin
  FROM h JOIN cuts c ON h.event_type = c.event_type
),
counts_obs AS (
  SELECT event_type, bin,
    CAST(SUM(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT) AS c_ref,
    CAST(SUM(CASE WHEN is_ref THEN 0 ELSE 1 END) AS BIGINT) AS c_cur
  FROM binned GROUP BY event_type, bin
),
counts AS (
  -- complete the bin dimension: bins unreachable under collapsed
  -- cut-points still carry their smoothing terms (mirrors Spark)
  SELECT d.event_type, d.bin,
    CAST(coalesce(o.c_ref, 0) AS BIGINT) AS c_ref,
    CAST(coalesce(o.c_cur, 0) AS BIGINT) AS c_cur
  FROM (SELECT c.event_type, CAST(r.i AS INTEGER) AS bin
        FROM cuts c, range(0, {PSI_BINS}) r(i)) d
  LEFT JOIN counts_obs o
    ON o.event_type = d.event_type AND o.bin = d.bin
),
tot AS (
  SELECT event_type, CAST(SUM(c_ref) AS BIGINT) AS n_ref,
    CAST(SUM(c_cur) AS BIGINT) AS n_cur
  FROM counts GROUP BY event_type
),
terms AS (
  SELECT c.event_type, c.bin, t.n_ref, t.n_cur,
    ((c.c_cur + 0.5) / (t.n_cur + {PSI_BINS * 0.5})
     - (c.c_ref + 0.5) / (t.n_ref + {PSI_BINS * 0.5}))
    * ln(((c.c_cur + 0.5) / (t.n_cur + {PSI_BINS * 0.5}))
         / ((c.c_ref + 0.5) / (t.n_ref + {PSI_BINS * 0.5}))) AS term
  FROM counts c JOIN tot t ON c.event_type = t.event_type
),
psi AS (
  SELECT event_type, any_value(n_ref) AS n_ref, any_value(n_cur) AS n_cur,
    list_sum(list(term ORDER BY bin)) AS psi_raw
  FROM terms GROUP BY event_type
)
SELECT event_type, n_ref, n_cur, ROUND(psi_raw, 9) AS psi,
  ROUND(psi_raw, 9) >= {PSI_ALERT} AS drifted
FROM psi
"""


def q_events_drift_ks(spark: SparkSession, sf: str) -> DataFrame:
    """Per-type two-sample Kolmogorov–Smirnov statistic between the
    time halves: D = max over observed values of |F_ref(v) − F_cur(v)|
    from the two empirical CDFs — the binning-free companion to the
    PSI entry (a drift check with no cut-point choice to defend).
    Output: per type, both populations, ks_d, and the ≥ {KS_ALERT}
    alert flag.

    Scale shape: (type, value) pair counts are one map-side-combined
    groupBy; the CDFs are cumulative-sum windows partitioned per type
    over the DISTINCT-value stream (types run parallel; the sort is
    per-type over distinct values, not raw events). At 100 TB the
    value axis would be quantized to a fixed grid first (binned KS —
    same code, bounded distinct values); exact values kept here so the
    oracle is exact. Pure integer-ratio math — no libm anywhere."""
    h = _halves(spark, sf)
    counts = h.groupBy("event_type", "value").agg(
        F.sum(F.col("is_ref").cast("long")).alias("c_ref"),
        F.sum((~F.col("is_ref")).cast("long")).alias("c_cur"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy("event_type")
    cum = counts.select(
        "event_type",
        F.sum("c_ref").over(w).alias("cum_ref"),
        F.sum("c_cur").over(w).alias("cum_cur"),
        F.sum("c_ref").over(w_all).alias("n_ref"),
        F.sum("c_cur").over(w_all).alias("n_cur"),
    )
    d = F.abs(
        F.col("cum_ref") / F.col("n_ref") - F.col("cum_cur") / F.col("n_cur")
    )
    # a type missing one half has no two-sample CDF to compare — those
    # are existence changes (new/vanished types), a different monitor's
    # job (events_type_stats); excluding them beats emitting NULL Ds
    agg = (
        cum.filter((F.col("n_ref") > 0) & (F.col("n_cur") > 0))
        .groupBy("event_type")
        .agg(
            F.first("n_ref").alias("n_ref"),
            F.first("n_cur").alias("n_cur"),
            F.max(d).alias("d_raw"),
        )
    )
    return agg.select(
        "event_type",
        "n_ref",
        "n_cur",
        F.round("d_raw", 9).alias("ks_d"),
        (F.round("d_raw", 9) >= KS_ALERT).alias("drifted"),
    )


SQL_EVENTS_DRIFT_KS = f"""
WITH {_SQL_HALVES},
counts AS (
  SELECT event_type, value,
    CAST(SUM(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT) AS c_ref,
    CAST(SUM(CASE WHEN is_ref THEN 0 ELSE 1 END) AS BIGINT) AS c_cur
  FROM h GROUP BY event_type, value
),
cum AS (
  SELECT event_type,
    CAST(SUM(c_ref) OVER (PARTITION BY event_type ORDER BY value
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_ref,
    CAST(SUM(c_cur) OVER (PARTITION BY event_type ORDER BY value
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_cur,
    CAST(SUM(c_ref) OVER (PARTITION BY event_type) AS BIGINT) AS n_ref,
    CAST(SUM(c_cur) OVER (PARTITION BY event_type) AS BIGINT) AS n_cur
  FROM counts
)
SELECT event_type, any_value(n_ref) AS n_ref, any_value(n_cur) AS n_cur,
  ROUND(MAX(abs(cum_ref * 1.0 / n_ref - cum_cur * 1.0 / n_cur)), 9) AS ks_d,
  ROUND(MAX(abs(cum_ref * 1.0 / n_ref - cum_cur * 1.0 / n_cur)), 9) >= {KS_ALERT}
    AS drifted
FROM cum WHERE n_ref > 0 AND n_cur > 0 GROUP BY event_type
"""


QUERIES: dict[str, Query] = {
    "events_drift_psi": Query(q_events_drift_psi, SQL_EVENTS_DRIFT_PSI),
    "events_drift_ks": Query(q_events_drift_ks, SQL_EVENTS_DRIFT_KS),
}
