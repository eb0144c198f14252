"""Round-6 wave 14 — distributional audits and smoothed series.

- ``quality_benford_audit`` — first-significant-digit distribution of
  order totals vs Benford's law (Newcomb 1881, Benford 1938), with the
  per-digit chi-square contribution: the fraud/synthetic-data screen
  run over any money or count column before trusting it (the synthetic
  corpus FAILS it loudly — digits 1-4 are uniform — which is exactly
  what the audit is for).
- ``revenue_gini`` — Gini coefficient of per-customer revenue via the
  exact rank formula G = (2·Σi·xᵢ)/(n·Σx) − (n+1)/n over the ascending
  sort: the concentration number next to the HHI's market view
  (how unequal is the spend distribution, 0 = uniform, →1 = one whale).
- ``events_ema_hourly`` — exponential moving average of the hourly
  event-count series in closed form (EMAₙ = Σ wₜ·yₜ with
  wₜ = α(1−α)^(n−t), w₁ = (1−α)^(n−1)) — the smoothing baseline the
  burst/CUSUM monitors compare against, computed as ONE weighted
  aggregate instead of a sequential fold.
- ``events_interarrival`` — per-user inter-arrival gap statistics +
  the exponential-MLE fit (rate = n/Σg, log-likelihood
  n·ln(n/Σg) − n, coefficient of variation): CV ≈ 1 says Poisson
  arrivals, CV ≫ 1 says bursty sessions — the traffic-model audit.

Determinism: every aggregate is over exact integers (digit counts,
revenue cents, rank·cents products, integer-second gaps, hourly
counts); the doubles that follow are identical closed-form expressions
of those integers in both engines, with ROUND 6 absorbing
summation-order ulps (the unigram-NLL recipe). Collapsible
denominators (all-equal revenue, zero total gap, single hour) are
guarded with identical CASE in both engines and pinned on synthetic
corpora in tests/test_round6_waves.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import table
from .base import Query, dec

EMA_ALPHA = 0.3


def q_quality_benford_audit(spark: SparkSession, sf: str) -> DataFrame:
    """First-digit Benford audit of ``o_totalprice``: per digit 1-9 the
    observed count/share, Benford's expected share log10(1+1/d), and
    the chi-square contribution (obs − n·p)²/(n·p).

    Determinism: the digit is the first character of the INTEGER cents
    string (decimal(18,2)·100 → BIGINT → VARCHAR) — no float log10 at
    bucket boundaries; counts are exact, the expected-share and chi²
    doubles are identical expressions. Plan: one orders scan to 9
    cells; everything after is cell-space. At 100 TB: map-side partial
    agg to 9 longs per partition, nothing else moves."""
    o = table(spark, sf, "orders")
    cents = (dec("o_totalprice") * 100).cast("bigint")
    digits = o.select(
        F.substring(cents.cast("string"), 1, 1).cast("int").alias("digit")
    )
    cells = digits.groupBy("digit").agg(F.count(F.lit(1)).alias("n_d"))
    tot = cells.agg(F.sum("n_d").alias("n"))
    p = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
    exp_n = F.col("n") * p
    return (
        cells.crossJoin(F.broadcast(tot))
        .select(
            "digit",
            "n_d",
            F.round(F.col("n_d") / F.col("n"), 6).alias("obs_share"),
            F.round(p, 6).alias("benford_share"),
            F.round(
                (F.col("n_d") - exp_n) * (F.col("n_d") - exp_n) / exp_n, 6
            ).alias("chi2_term"),
        )
        .orderBy("digit")
    )


SQL_QUALITY_BENFORD_AUDIT = """
WITH digits AS (
  SELECT CAST(substr(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
    AS BIGINT) AS VARCHAR), 1, 1) AS INTEGER) AS digit
  FROM orders
),
cells AS (SELECT digit, COUNT(*) AS n_d FROM digits GROUP BY 1),
tot AS (SELECT CAST(SUM(n_d) AS BIGINT) AS n FROM cells)
SELECT digit, n_d,
  ROUND(n_d * 1.0 / n, 6) AS obs_share,
  ROUND(log10(1.0 + 1.0 / digit), 6) AS benford_share,
  ROUND((n_d - n * log10(1.0 + 1.0 / digit))
        * (n_d - n * log10(1.0 + 1.0 / digit))
        / (n * log10(1.0 + 1.0 / digit)), 6) AS chi2_term
FROM cells CROSS JOIN tot
ORDER BY digit
"""


def q_revenue_gini(spark: SparkSession, sf: str) -> DataFrame:
    """Gini coefficient of per-customer revenue (exact rank formula
    over the ascending (revenue, custkey) sort) — one row: customer
    count, total revenue, Gini.

    Determinism: revenue is exact BIGINT cents; Σi·xᵢ is an exact
    integer sum (rank ≤ n, cents ≤ 2⁶³/n at any tested SF — at true
    100 TB scale the product sum moves to decimal(38,0), noted); the
    Gini is one closed-form expression of three exact integers. Plan:
    one orders scan → per-customer agg; the global rank is ONE sort of
    the bounded customer frame (at 100 TB: range-partitioned two-pass
    rank — partition boundaries from a sampled CDF, per-partition
    offsets added map-side — same result, no single-partition window;
    the formula itself needs no change). All-equal-revenue degeneracy
    still yields G = 0 via the same formula; zero-total guarded."""
    o = table(spark, sf, "orders")
    rev = o.groupBy("o_custkey").agg(
        F.sum((dec("o_totalprice") * 100).cast("bigint")).alias("cents")
    )
    ranked = rev.select(
        "cents",
        F.row_number()
        .over(Window.orderBy(F.asc("cents"), F.asc("o_custkey")))
        .alias("i"),
    )
    agg = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("s"),
        F.sum(F.col("i") * F.col("cents")).alias("a"),
    )
    return agg.select(
        F.col("n").alias("n_customers"),
        F.round(F.col("s") / F.lit(100.0), 2).alias("total_revenue"),
        F.round(
            F.when(
                F.col("s") > 0,
                (F.lit(2.0) * F.col("a")) / (F.col("n") * F.col("s").cast("double"))
                - (F.col("n") + F.lit(1.0)) / F.col("n"),
            ),
            6,
        ).alias("gini"),
    )


SQL_REVENUE_GINI = """
WITH rev AS (
  SELECT o_custkey,
    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
      AS BIGINT) AS cents
  FROM orders GROUP BY 1
),
ranked AS (
  SELECT cents,
    ROW_NUMBER() OVER (ORDER BY cents ASC, o_custkey ASC) AS i
  FROM rev
),
agg AS (
  SELECT COUNT(*) AS n, CAST(SUM(cents) AS BIGINT) AS s,
    CAST(SUM(i * cents) AS BIGINT) AS a
  FROM ranked
)
SELECT n AS n_customers,
  ROUND(s / 100.0, 2) AS total_revenue,
  ROUND(CASE WHEN s > 0 THEN
    (2.0 * a) / (n * CAST(s AS DOUBLE)) - (n + 1.0) / n END, 6) AS gini
FROM agg
"""


def q_events_ema_hourly(spark: SparkSession, sf: str) -> DataFrame:
    """EMA (α={EMA_ALPHA}) of the hourly event-count series, closed
    form: the recursion EMAₜ = α·yₜ + (1−α)·EMAₜ₋₁ seeded at y₁
    unrolls to ONE weighted sum — wₜ = α(1−α)^(n−t) for t ≥ 2 and
    w₁ = (1−α)^(n−1) — so no sequential fold, no recursive CTE, no
    collect: a single aggregate over the hour-bounded frame.

    One row: hour count, last observed count, EMA, and the EMA's
    deviation from the plain mean (the trend signal: EMA ≫ mean says
    traffic is rising into the present). Plan: one events scan to the
    hourly frame (bounded by time span, localCheckpoint'd), one
    ROW_NUMBER over it, one aggregate. Weights are pow() doubles of
    exact integer exponents — identical in both engines; ROUND 6
    absorbs summation order."""
    ev = table(spark, sf, "events")
    hourly = (
        ev.groupBy(F.date_trunc("hour", "ts").alias("h"))
        .agg(F.count(F.lit(1)).alias("y"))
        .localCheckpoint(eager=True)
    )
    pos = hourly.select(
        "y", F.row_number().over(Window.orderBy("h")).alias("t")
    )
    n = pos.agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("s")
    )
    a = F.lit(float(EMA_ALPHA))
    w = F.when(
        F.col("t") == 1, F.pow(F.lit(1.0) - a, F.col("n") - 1)
    ).otherwise(a * F.pow(F.lit(1.0) - a, F.col("n") - F.col("t")))
    return (
        pos.crossJoin(F.broadcast(n))
        .agg(
            F.max("n").alias("n_hours"),
            F.max(F.when(F.col("t") == F.col("n"), F.col("y"))).alias(
                "y_last"
            ),
            F.round(F.sum(w * F.col("y")), 6).alias("ema"),
            F.round(
                F.sum(w * F.col("y"))
                - F.max(F.col("s").cast("double") / F.col("n")),
                6,
            ).alias("ema_minus_mean"),
        )
    )


SQL_EVENTS_EMA_HOURLY = f"""
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS h, COUNT(*) AS y FROM events GROUP BY 1
),
pos AS (
  SELECT y, ROW_NUMBER() OVER (ORDER BY h) AS t FROM hourly
),
n AS (
  SELECT COUNT(*) AS n, CAST(SUM(y) AS BIGINT) AS s FROM pos
)
SELECT MAX(n) AS n_hours,
  MAX(CASE WHEN t = n THEN y END) AS y_last,
  ROUND(SUM((CASE WHEN t = 1 THEN pow(1.0 - {EMA_ALPHA}, n - 1)
    ELSE {EMA_ALPHA} * pow(1.0 - {EMA_ALPHA}, n - t) END) * y), 6) AS ema,
  ROUND(SUM((CASE WHEN t = 1 THEN pow(1.0 - {EMA_ALPHA}, n - 1)
    ELSE {EMA_ALPHA} * pow(1.0 - {EMA_ALPHA}, n - t) END) * y)
    - MAX(CAST(s AS DOUBLE) / n), 6) AS ema_minus_mean
FROM pos CROSS JOIN n
"""


def q_events_interarrival(spark: SparkSession, sf: str) -> DataFrame:
    """Per-user inter-arrival statistics + exponential-MLE fit, one
    row: gap count, mean gap (s), coefficient of variation, MLE rate
    (events/s), and the exponential log-likelihood at the MLE
    (n·ln(n/Σg) − n). CV ≈ 1 ⇒ Poisson arrivals; CV ≫ 1 ⇒ bursty
    sessions (and the exponential model is wrong — the number that
    says whether retention/funnel windows can assume memorylessness).

    Determinism: gaps are exact integer seconds (epoch-microsecond
    difference, integer-divided by 10⁶ — both engines truncate
    identically); Σg and Σg² are exact BIGINTs at tested SFs (at
    extreme scale Σg² moves to decimal(38,0), noted); the variance is
    the identical two-term double expression, clamped at 0 before the
    sqrt (float cancellation on a constant series must not produce
    NaN in one engine only). Plan: one events scan, one user-keyed
    window for lag, one global aggregate."""
    ev = table(spark, sf, "events")
    u = F.unix_micros(F.col("ts"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        ev.select(
            "user_id",
            "ts",
            "event_id",
            ((u - F.lag(u).over(w)) / F.lit(1000000))
            .cast("bigint")
            .alias("g"),
        )
        .filter(F.col("g").isNotNull())
        .select("g")
    )
    agg = gaps.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("g").alias("s"),
        F.sum(F.col("g") * F.col("g")).alias("ss"),
    )
    mean = F.col("s").cast("double") / F.col("n")
    var = F.greatest(
        F.lit(0.0),
        F.col("ss").cast("double") / F.col("n") - mean * mean,
    )
    return agg.select(
        F.col("n").alias("n_gaps"),
        F.round(mean, 6).alias("mean_gap_s"),
        F.round(
            F.when(F.col("s") > 0, F.sqrt(var) / mean), 6
        ).alias("cv"),
        F.round(
            F.when(F.col("s") > 0, F.col("n") / F.col("s").cast("double")),
            9,
        ).alias("mle_rate"),
        F.round(
            F.when(
                F.col("s") > 0,
                F.col("n")
                * F.log(F.col("n") / F.col("s").cast("double"))
                - F.col("n"),
            ),
            6,
        ).alias("exp_loglik"),
    )


SQL_EVENTS_INTERARRIVAL = """
WITH gaps AS (
  SELECT (epoch_us(ts) - lag(epoch_us(ts)) OVER
    (PARTITION BY user_id ORDER BY ts, event_id)) // 1000000 AS g
  FROM events
),
agg AS (
  SELECT COUNT(*) AS n, CAST(SUM(g) AS BIGINT) AS s,
    CAST(SUM(g * g) AS BIGINT) AS ss
  FROM gaps WHERE g IS NOT NULL
)
SELECT n AS n_gaps,
  ROUND(CAST(s AS DOUBLE) / n, 6) AS mean_gap_s,
  ROUND(CASE WHEN s > 0 THEN
    sqrt(greatest(0.0, CAST(ss AS DOUBLE) / n
      - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n)))
    / (CAST(s AS DOUBLE) / n) END, 6) AS cv,
  ROUND(CASE WHEN s > 0 THEN n / CAST(s AS DOUBLE) END, 9) AS mle_rate,
  ROUND(CASE WHEN s > 0 THEN
    n * ln(n / CAST(s AS DOUBLE)) - n END, 6) AS exp_loglik
FROM agg
"""


QUERIES: dict[str, Query] = {
    "quality_benford_audit": Query(
        q_quality_benford_audit, SQL_QUALITY_BENFORD_AUDIT
    ),
    "revenue_gini": Query(q_revenue_gini, SQL_REVENUE_GINI),
    "events_ema_hourly": Query(q_events_ema_hourly, SQL_EVENTS_EMA_HOURLY),
    "events_interarrival": Query(
        q_events_interarrival, SQL_EVENTS_INTERARRIVAL
    ),
}
