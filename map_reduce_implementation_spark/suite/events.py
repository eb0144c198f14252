"""Event-stream operator suite — batch twins of the streaming surface
(SURVEY.md §2.9; EXT — the reference has no streaming at all).

These run the SAME window expressions the streaming module uses
(streaming/windows.py); Structured Streaming incrementalizes them with
watermark state. Batch execution here gives the DuckDB oracle a target.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import table
from .base import Query, dec


def q_tumbling_window(spark: SparkSession, sf: str) -> DataFrame:
    """1-hour tumbling window per event_type. Epoch-aligned — identical
    boundaries to DuckDB date_trunc('hour'). Decimal sum → oracle-stable.
    Streaming twin: streaming/windows.py::tumbling_counts."""
    ev = table(spark, sf, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(dec("value", 6)).cast("double").alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
            "min_value",
            "max_value",
        )
    )


SQL_TUMBLING_WINDOW = """
SELECT date_trunc('hour', ts) AS window_start, event_type,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
  MIN(value) AS min_value,
  MAX(value) AS max_value
FROM events GROUP BY 1, 2
"""


def q_sliding_window(spark: SparkSession, sf: str) -> DataFrame:
    """1-hour window sliding every 30 min — each event lands in exactly 2
    windows. Oracle reconstructs the same assignment with time_bucket
    (both engines align buckets to the epoch for sub-day intervals)."""
    ev = table(spark, sf, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )


SQL_SLIDING_WINDOW = """
WITH assigned AS (
  SELECT time_bucket(INTERVAL '30 minutes', ts) AS window_start FROM events
  UNION ALL
  SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes' FROM events
)
SELECT window_start, COUNT(*) AS n_events FROM assigned GROUP BY 1
"""


def q_session_window(spark: SparkSession, sf: str) -> DataFrame:
    """Session windows (30-min inactivity gap) per user — Spark's native
    session_window; oracle is the classic gaps-and-islands rewrite.
    Streaming twin: streaming/windows.py::session_counts."""
    ev = table(spark, sf, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select("user_id", F.col("w.start").alias("session_start"), "n_events")
    )


SQL_SESSION_WINDOW = """
WITH flagged AS (
  SELECT user_id, ts,
    CASE WHEN lag(ts) OVER w IS NULL
           OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
         THEN 1 ELSE 0 END AS is_start
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sessions AS (
  SELECT user_id, ts,
    SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
)
SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events
FROM sessions GROUP BY user_id, sid
"""


def q_json_extract(spark: SparkSession, sf: str) -> DataFrame:
    """Semi-structured projection: pull a typed field out of the JSON
    ``props`` column (JVM-side get_json_object — no Python)."""
    ev = table(spark, sf, "events")
    return ev.select(
        "event_id",
        "event_type",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
    )


SQL_JSON_EXTRACT = """
SELECT event_id, event_type,
  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
FROM events
"""


def q_variant_extract(spark: SparkSession, sf: str) -> DataFrame:
    """Spark 4 VARIANT path for semi-structured data: parse_json once
    into the binary VARIANT encoding, then typed variant_get extraction.
    Unlike get_json_object (string re-parse per access), VARIANT parses
    once and each field access is an O(log fields) binary probe — the
    right encoding when many fields are pulled from the same document.
    Aggregates k per event_type to keep the result compact."""
    ev = table(spark, sf, "events")
    v = ev.select(
        "event_type", F.parse_json("props").alias("p")
    ).select(
        "event_type",
        F.expr("variant_get(p, '$.k', 'int')").alias("k"),
    )
    return v.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("k").alias("sum_k"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
    )


SQL_VARIANT_EXTRACT = """
SELECT event_type, COUNT(*) AS n,
  CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
  MIN(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS min_k,
  MAX(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k
FROM events GROUP BY event_type
"""


def q_event_type_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Global per-type stats — the grouped-agg shape a monitoring rollup
    uses; count/min/max are exact and order-independent."""
    ev = table(spark, sf, "events")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.countDistinct("user_id").alias("n_users"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    )


SQL_EVENT_TYPE_STATS = """
SELECT event_type, COUNT(*) AS n, COUNT(DISTINCT user_id) AS n_users,
  MIN(ts) AS first_ts, MAX(ts) AS last_ts
FROM events GROUP BY event_type
"""


def q_hypertable_rollup(spark: SparkSession, sf: str) -> DataFrame:
    """Hypertable-style multi-resolution rollup (TimescaleDB continuous
    aggregate shape): ONE scan produces hour- and day-grain aggregates
    via GROUPING SETS on pre-computed time buckets — at 100 TB the
    coarser grains come from the same shuffle as the finest, not from
    re-scanning. The grain column disambiguates the resolution."""
    ev = table(spark, sf, "events")
    bucketed = ev.select(
        F.date_trunc("hour", "ts").alias("h"),
        F.date_trunc("day", "ts").alias("d"),
        "event_type",
        "value",
    )
    bucketed.createOrReplaceTempView("_ht_rollup_src")
    return spark.sql(
        """
        SELECT
          CASE WHEN h IS NOT NULL THEN 'hour' ELSE 'day' END AS grain,
          coalesce(h, d) AS bucket_start,
          event_type,
          COUNT(*) AS n_events,
          CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        FROM _ht_rollup_src
        GROUP BY GROUPING SETS ((h, event_type), (d, event_type))
        """
    )


SQL_HYPERTABLE_ROLLUP = """
WITH src AS (
  SELECT date_trunc('hour', ts) AS h, date_trunc('day', ts) AS d, event_type, value
  FROM events
)
SELECT
  CASE WHEN h IS NOT NULL THEN 'hour' ELSE 'day' END AS grain,
  coalesce(h, d) AS bucket_start,
  event_type,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM src
GROUP BY GROUPING SETS ((h, event_type), (d, event_type))
"""


def q_gap_fill(spark: SparkSession, sf: str) -> DataFrame:
    """Time-series gap filling: hourly purchase counts over a dense
    hourly spine (sequence + explode), zero-filled where no events.
    The spine is O(hours) — tiny — so the left join broadcasts it; the
    only O(rows) work is the pre-aggregation, which combines map-side."""
    ev = table(spark, sf, "events")
    counts = ev.filter(F.col("event_type") == "purchase").groupBy(
        F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count("*").alias("n"))
    spine = (
        ev.agg(
            F.date_trunc("hour", F.min("ts")).alias("lo"),
            F.date_trunc("hour", F.max("ts")).alias("hi"),
        )
        .select(F.explode(F.sequence("lo", "hi", F.expr("interval 1 hour"))).alias("h"))
    )
    return spine.join(counts, "h", "left").select(
        "h", F.coalesce("n", F.lit(0)).alias("n_purchases")
    )


SQL_GAP_FILL = """
WITH b AS (
  SELECT date_trunc('hour', min(ts)) AS lo, date_trunc('hour', max(ts)) AS hi
  FROM events
),
s AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM b),
c AS (
  SELECT date_trunc('hour', ts) AS h, COUNT(*) AS n
  FROM events WHERE event_type = 'purchase' GROUP BY 1
)
SELECT s.h AS h, COALESCE(c.n, 0) AS n_purchases
FROM s LEFT JOIN c USING (h)
"""


def q_click_attribution(spark: SparkSession, sf: str) -> DataFrame:
    """Batch twin of streaming/windows.py::stream_stream_click_purchase
    (purchases attributed to a same-user click within 1 hour) — the SAME
    function runs as a watermarked stream-stream join in streaming mode;
    this oracle pins its semantics. Equi-key on user + time-range
    predicate: shuffles once on user_id."""
    from ..streaming.windows import stream_stream_click_purchase

    ev = table(spark, sf, "events")
    return stream_stream_click_purchase(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
    )


SQL_CLICK_ATTRIBUTION = """
SELECT c.user_id AS c_user, c.event_id AS click_id, p.event_id AS purchase_id,
       c.ts AS click_ts, p.ts AS purchase_ts
FROM (SELECT * FROM events WHERE event_type = 'click') c
JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON c.user_id = p.user_id
 AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
"""


_RECURSIVE_CHAINS = """
WITH RECURSIVE nxt AS (
  SELECT user_id, event_id, ts,
    LEAD(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_id,
    LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ts
  FROM {src}
),
edges AS (
  SELECT event_id, next_id FROM nxt
  WHERE next_id IS NOT NULL AND next_ts <= ts + INTERVAL 10 MINUTE
),
starts AS (
  SELECT event_id FROM nxt n
  WHERE NOT EXISTS (SELECT 1 FROM edges e WHERE e.next_id = n.event_id)
),
walk AS (
  SELECT event_id AS start_id, event_id AS cur, 1 AS len FROM starts
  UNION ALL
  SELECT w.start_id, e.next_id, w.len + 1
  FROM walk w JOIN edges e ON e.event_id = w.cur
)
SELECT start_id, CAST(MAX(len) AS INTEGER) AS chain_len FROM walk GROUP BY start_id
"""


def q_recursive_chains(spark: SparkSession, sf: str) -> DataFrame:
    """Recursive CTE (WITH RECURSIVE, Spark 4.1): sessionization as an
    explicit chain walk — each event's single LEAD successor within 10
    minutes forms a linear chain; the recursion walks chains from their
    starts and reports lengths. Termination is structural (each event
    has ≤1 successor and time strictly increases — a DAG). Each
    iteration is one join stage; depth = longest chain, so state is
    bounded by the data, not the recursion. Complements session_window
    (declarative) and the iterative connected-components dedup
    (driver-loop) as the third stateful-traversal idiom."""
    table(spark, sf, "events").createOrReplaceTempView("events_rc")
    return spark.sql(_RECURSIVE_CHAINS.format(src="events_rc"))


SQL_RECURSIVE_CHAINS = _RECURSIVE_CHAINS.format(src="events")


def q_funnel(spark: SparkSession, sf: str) -> DataFrame:
    """Ordered conversion funnel view → click → purchase: per-user
    earliest timestamp of each step via conditional aggregation (ONE
    user-keyed shuffle, map-side partials), then each stage counts
    users whose steps occurred in strict time order. The final rollup
    is a single-row agg — partials combine associatively, so at 100 TB
    this is scan → one shuffle → tiny reduce, no window, no self-join
    (the naive formulation is 3 self-joins on events)."""
    ev = table(spark, sf, "events")

    def first_ts(t: str):
        return F.min(F.when(F.col("event_type") == t, F.col("ts")))

    per_user = ev.groupBy("user_id").agg(
        first_ts("view").alias("t_view"),
        first_ts("click").alias("t_click"),
        first_ts("purchase").alias("t_purchase"),
    )
    return per_user.agg(
        F.count(F.col("t_view")).alias("n_view"),
        F.count(F.when(F.col("t_view") < F.col("t_click"), 1)).alias(
            "n_view_click"
        ),
        F.count(
            F.when(
                (F.col("t_view") < F.col("t_click"))
                & (F.col("t_click") < F.col("t_purchase")),
                1,
            )
        ).alias("n_full_funnel"),
    )


SQL_FUNNEL = """
WITH per_user AS (
  SELECT user_id,
    MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
    MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
    MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
  FROM events GROUP BY user_id
)
SELECT COUNT(t_view) AS n_view,
  COUNT(CASE WHEN t_view < t_click THEN 1 END) AS n_view_click,
  COUNT(CASE WHEN t_view < t_click AND t_click < t_purchase THEN 1 END) AS n_full_funnel
FROM per_user
"""


def q_transition_matrix(spark: SparkSession, sf: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: P(next_type | prev_type). One user-keyed window (lag)
    over the stream, then the count/probability aggregation runs on the
    TYPE-PAIR key space — 25 cells regardless of data size, so the
    second shuffle and the probability window are O(|types|²), free at
    any scale. Deterministic sequence order: (ts, event_id) tie-break."""
    from pyspark.sql import Window

    ev = table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        F.lag("event_type").over(w).alias("prev_type"),
        F.col("event_type").alias("next_type"),
    ).filter(F.col("prev_type").isNotNull())
    cells = seq.groupBy("prev_type", "next_type").agg(
        F.count("*").alias("n_transitions")
    )
    w_prev = Window.partitionBy("prev_type")
    return cells.select(
        "prev_type",
        "next_type",
        "n_transitions",
        F.round(
            F.col("n_transitions") / F.sum("n_transitions").over(w_prev), 6
        ).alias("prob"),
    )


SQL_TRANSITION_MATRIX = """
WITH seq AS (
  SELECT user_id,
    LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
    event_type AS next_type
  FROM events
),
cells AS (
  SELECT prev_type, next_type, COUNT(*) AS n_transitions
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY prev_type, next_type
)
SELECT prev_type, next_type, n_transitions,
  ROUND(n_transitions * 1.0 / SUM(n_transitions) OVER (PARTITION BY prev_type), 6) AS prob
FROM cells
"""


def q_retention(spark: SparkSession, sf: str) -> DataFrame:
    """Cohort retention: users grouped by first-active day; for each
    (cohort_day, day_offset), how many came back and what fraction of
    the cohort that is. Two user-keyed shuffles (distinct activity days,
    first-day cohort) + one tiny cohort-keyed agg; the cohort-size join
    is **broadcast** (one row per day). The classic engagement query a
    warehouse runs daily at any scale."""
    ev = table(spark, sf, "events")
    # day stays TIMESTAMP (midnight) — pandas date objects hash as
    # dtype=object and diverge from the oracle's datetime64 canon
    # Round-12 optimization (guide §2.4): ``acts`` feeds the cohort
    # aggregate AND the offset join, ``cohort`` feeds the join AND the
    # size rollup — materialize each once instead of re-scanning and
    # re-deduping the event stream per consumer (6 scans → 2)
    acts = ev.select(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).distinct().localCheckpoint(eager=True)
    cohort = (
        acts.groupBy("user_id")
        .agg(F.min("day").alias("cohort_day"))
        .localCheckpoint(eager=True)
    )
    joined = acts.join(cohort, "user_id").select(
        "user_id",
        "cohort_day",
        F.datediff(F.col("day"), F.col("cohort_day")).alias("day_offset"),
    )
    ret = joined.groupBy("cohort_day", "day_offset").agg(
        F.count_distinct("user_id").alias("n_active")
    )
    sizes = cohort.groupBy("cohort_day").agg(
        F.count("*").alias("cohort_size")
    )
    return ret.join(F.broadcast(sizes), "cohort_day").select(
        "cohort_day",
        "day_offset",
        "n_active",
        "cohort_size",
        F.round(F.col("n_active") / F.col("cohort_size"), 6).alias(
            "retention_rate"
        ),
    )


def q_cohort_ltv(spark: SparkSession, sf: str) -> DataFrame:
    """Cohort lifetime value — the monetary companion to
    ``events_retention``: users cohorted by first-active day; for each
    (cohort_day, day_offset), the CUMULATIVE revenue the cohort has
    produced and the per-member LTV. Revenue sums in DECIMAL (exact,
    order-free); the running total is a window over the aggregated
    (cohort, offset) cells only — days × offsets rows, never the event
    stream — partitioned by cohort_day. Same two user-keyed shuffles as
    retention + one tiny cell window; cohort sizes broadcast."""
    from pyspark.sql import Window

    ev = table(spark, sf, "events")
    acts = ev.select(
        "user_id",
        F.date_trunc("day", "ts").alias("day"),
        dec("value").alias("v"),
    )
    # Round-12 optimization (guide §2.4): cohort feeds two consumers
    # (the cells join + sizes) — lazily each replayed the event-stream
    # scan + user aggregate; materialize the user-sized frame once
    # (3 events scans → 2, the first-activity pass + the offsets pass)
    cohort = acts.groupBy("user_id").agg(
        F.min("day").alias("cohort_day")
    ).localCheckpoint(eager=True)
    cells = (
        acts.join(cohort, "user_id")
        .groupBy(
            "cohort_day",
            F.datediff(F.col("day"), F.col("cohort_day")).alias("day_offset"),
        )
        .agg(F.sum("v").alias("period_rev"))
    )
    w = (
        Window.partitionBy("cohort_day")
        .orderBy("day_offset")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sizes = cohort.groupBy("cohort_day").agg(F.count("*").alias("cohort_size"))
    cum = cells.select(
        "cohort_day",
        "day_offset",
        F.sum("period_rev").over(w).alias("cum_rev"),
    )
    return cum.join(F.broadcast(sizes), "cohort_day").select(
        "cohort_day",
        "day_offset",
        F.round("cum_rev", 2).cast("double").alias("cum_revenue"),
        "cohort_size",
        F.round(
            F.col("cum_rev").cast("double") / F.col("cohort_size"), 6
        ).alias("ltv_per_user"),
    )


SQL_COHORT_LTV = """
WITH acts AS (
  SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         CAST(value AS DECIMAL(18,2)) AS v
  FROM events
),
cohort AS (SELECT user_id, MIN(day) AS cohort_day FROM acts GROUP BY user_id),
cells AS (
  SELECT c.cohort_day,
    CAST(datediff('day', c.cohort_day, a.day) AS INTEGER) AS day_offset,
    SUM(a.v) AS period_rev
  FROM acts a JOIN cohort c ON a.user_id = c.user_id
  GROUP BY 1, 2
),
cum AS (
  SELECT cohort_day, day_offset,
    SUM(period_rev) OVER (PARTITION BY cohort_day ORDER BY day_offset
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_rev
  FROM cells
),
sizes AS (SELECT cohort_day, COUNT(*) AS cohort_size FROM cohort GROUP BY 1)
SELECT m.cohort_day, m.day_offset,
  CAST(ROUND(m.cum_rev, 2) AS DOUBLE) AS cum_revenue,
  s.cohort_size,
  ROUND(CAST(m.cum_rev AS DOUBLE) / s.cohort_size, 6) AS ltv_per_user
FROM cum m JOIN sizes s ON m.cohort_day = s.cohort_day
"""


SQL_RETENTION = """
WITH acts AS (
  -- CAST: DuckDB date_trunc('day') yields DATE; Spark yields TIMESTAMP
  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day FROM events
),
cohort AS (SELECT user_id, MIN(day) AS cohort_day FROM acts GROUP BY user_id),
joined AS (
  SELECT a.user_id, c.cohort_day,
    CAST(datediff('day', c.cohort_day, a.day) AS INTEGER) AS day_offset
  FROM acts a JOIN cohort c ON a.user_id = c.user_id
),
ret AS (
  SELECT cohort_day, day_offset, COUNT(DISTINCT user_id) AS n_active
  FROM joined GROUP BY cohort_day, day_offset
),
sizes AS (SELECT cohort_day, COUNT(*) AS cohort_size FROM cohort GROUP BY cohort_day)
SELECT r.cohort_day, r.day_offset, r.n_active, s.cohort_size,
  ROUND(r.n_active * 1.0 / s.cohort_size, 6) AS retention_rate
FROM ret r JOIN sizes s ON r.cohort_day = s.cohort_day
"""


def q_scd2_intervals(spark: SparkSession, sf: str) -> DataFrame:
    """SCD-Type-2 dimension build: turn the append-only event log into
    validity intervals (valid_from, valid_to, is_current) per user — the
    standard warehouse slowly-changing-dimension shape, and the interval
    form consumed by as-of joins.

    One user-keyed shuffle; LEAD over (ts, event_id) closes each
    interval with the next change and leaves the last one open. At
    100 TB this is the same single-shuffle cost as any per-key window;
    with the log bucketed by user_id it is shuffle-free.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return table(spark, sf, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.col("ts").alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


SQL_SCD2_INTERVALS = """
SELECT user_id, event_id, event_type, ts AS valid_from,
  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
  (lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL) AS is_current
FROM events
"""

EQUI_DEPTH_PROBS = tuple(round(0.1 * i, 1) for i in range(1, 10))


def q_equi_depth_histogram(spark: SparkSession, sf: str) -> DataFrame:
    """Equi-depth (equal-count) histogram of order totals — the
    optimizer-statistics shape, and the scale-sane alternative to a
    global ntile: a global NTILE window would sort ALL rows into one
    partition; instead the 9 decile boundaries come from one exact
    ``percentile`` aggregation, are broadcast as a 9-element array, and
    bucket assignment is a pure map (count of boundaries below the
    value). Exactness: Spark ``percentile`` ≡ DuckDB ``quantile_cont``
    (same interpolation), so boundaries are bit-identical.
    """
    orders = table(spark, sf, "orders")
    # ONE percentile call with an array of probs: a single sort buffer
    # computes all 9 deciles (9 separate percentile() aggregates each
    # buffer and sort the column independently — measured 3.2 s → 0.9 s
    # at sf0.1)
    probs = ", ".join(str(p) for p in EQUI_DEPTH_PROBS)
    bnds = orders.agg(
        F.expr(f"percentile(o_totalprice, array({probs}))").alias("bnds")
    )
    bucket = F.size(
        F.filter(F.col("bnds"), lambda x: F.col("o_totalprice") > x)
    ).cast("int")
    return (
        orders.join(F.broadcast(bnds))
        .groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
            F.sum(dec("o_totalprice")).cast("double").alias("total"),
        )
    )


SQL_EQUI_DEPTH_HISTOGRAM = """
WITH b AS (
  SELECT [quantile_cont(o_totalprice, 0.1), quantile_cont(o_totalprice, 0.2),
          quantile_cont(o_totalprice, 0.3), quantile_cont(o_totalprice, 0.4),
          quantile_cont(o_totalprice, 0.5), quantile_cont(o_totalprice, 0.6),
          quantile_cont(o_totalprice, 0.7), quantile_cont(o_totalprice, 0.8),
          quantile_cont(o_totalprice, 0.9)] AS bnds
  FROM orders
)
SELECT CAST(len(list_filter(b.bnds, x -> o_totalprice > x)) AS INTEGER) AS bucket,
       COUNT(*) AS n, MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM orders, b GROUP BY 1
"""


def q_rate_limit_per_key(spark: SparkSession, sf: str) -> DataFrame:
    """Per-key rate limiting: keep the first 2 events per (user, day) —
    the per-domain crawl-politeness / per-source quota cap every
    large-scale ingestion pipeline applies before heavier processing.

    One (user, day)-keyed shuffle; rn <= k plans as WindowGroupLimit so
    each map task keeps at most k rows per key BEFORE the exchange — at
    100 TB the shuffle carries the capped stream, not the firehose.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("user_id", F.date_trunc("day", F.col("ts"))).orderBy(
        "ts", "event_id"
    )
    return (
        table(spark, sf, "events")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .select("event_id", "user_id", "ts", "event_type")
    )


SQL_RATE_LIMIT_PER_KEY = """
SELECT event_id, user_id, ts, event_type
FROM events
QUALIFY row_number() OVER (PARTITION BY user_id, date_trunc('day', ts)
                           ORDER BY ts, event_id) <= 2
"""

MERGE_SPLIT_TS = "2024-01-15"


def q_merge_upsert(spark: SparkSession, sf: str) -> DataFrame:
    """MERGE INTO semantics as a batch plan: a base snapshot (state
    before the split date) full-outer-joined with a compacted changelog
    delta; the delta wins per key, and each row is tagged
    inserted/updated/unchanged — the Delta/Iceberg MERGE shape on plain
    DataFrames.

    Plan: both sides compact with the same keep-last window (one
    user-keyed shuffle each, WindowGroupLimit), and the full outer join
    re-uses that partitioning — Catalyst plans no extra exchange for
    the join. At 100 TB the delta is normally ≪ base, so the join flips
    to broadcast under AQE; semantics are unchanged.
    """
    from pyspark.sql import Window

    def compact(df: DataFrame) -> DataFrame:
        w = Window.partitionBy("user_id").orderBy(
            F.col("ts").desc(), F.col("event_id").desc()
        )
        return (
            df.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("user_id", "event_id", "ts", "event_type")
        )

    ev = table(spark, sf, "events")
    base = compact(ev.filter(F.col("ts") < MERGE_SPLIT_TS)).alias("b")
    delta = compact(ev.filter(F.col("ts") >= MERGE_SPLIT_TS)).alias("d")
    pick = lambda c: F.coalesce(F.col(f"d.{c}"), F.col(f"b.{c}"))  # noqa: E731
    return base.join(
        delta, F.col("b.user_id") == F.col("d.user_id"), "full_outer"
    ).select(
        pick("user_id").alias("user_id"),
        pick("event_id").alias("last_event_id"),
        pick("ts").alias("last_ts"),
        pick("event_type").alias("last_type"),
        F.when(F.col("d.user_id").isNull(), "unchanged")
        .when(F.col("b.user_id").isNull(), "inserted")
        .otherwise("updated")
        .alias("merge_op"),
    )


SQL_MERGE_UPSERT = f"""
WITH base AS (
  SELECT user_id, event_id, ts, event_type FROM events
  WHERE ts < TIMESTAMP '{MERGE_SPLIT_TS}'
  QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
), delta AS (
  SELECT user_id, event_id, ts, event_type FROM events
  WHERE ts >= TIMESTAMP '{MERGE_SPLIT_TS}'
  QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
)
SELECT COALESCE(d.user_id, b.user_id) AS user_id,
       COALESCE(d.event_id, b.event_id) AS last_event_id,
       COALESCE(d.ts, b.ts) AS last_ts,
       COALESCE(d.event_type, b.event_type) AS last_type,
       CASE WHEN d.user_id IS NULL THEN 'unchanged'
            WHEN b.user_id IS NULL THEN 'inserted'
            ELSE 'updated' END AS merge_op
FROM base b FULL OUTER JOIN delta d ON b.user_id = d.user_id
"""




PATH_LEN = 3
PATH_TOPK = 10


def q_path_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Top-{PATH_TOPK} most frequent {PATH_LEN}-step event paths (the
    sequence-mining upgrade of the first-order transition matrix:
    which full journeys dominate, not just which hops). One user-keyed
    window builds the sliding path with LEADs — paths never become a
    self-join — then counting runs on the path-string key space
    (|types|^{PATH_LEN} max) and the top-k is a
    TakeOrderedAndProject, never a global sort. Deterministic order:
    (ts, event_id) tie-break, count-then-path final order."""
    from pyspark.sql import Window

    ev = table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        F.col("event_type").alias("t0"),
        *[
            F.lead("event_type", i).over(w).alias(f"t{i}")
            for i in range(1, PATH_LEN)
        ],
    ).filter(
        # EVERY step non-null: concat_ws would silently SKIP a null
        # mid-sequence (yielding a shorter path) while the oracle's ||
        # nulls the whole path — guard all steps so both engines agree
        # even if event_type ever becomes nullable
        reduce(
            lambda a, b: a & b,
            [F.col(f"t{i}").isNotNull() for i in range(PATH_LEN)],
        )
    )
    paths = seq.select(
        F.concat_ws(">", *[f"t{i}" for i in range(PATH_LEN)]).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "path")
        .limit(PATH_TOPK)
    )


SQL_PATH_TOPK = f"""
WITH seq AS (
  SELECT event_type AS t0,
    {", ".join(f"LEAD(event_type, {i}) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t{i}" for i in range(1, PATH_LEN))}
  FROM events
)
SELECT {" || '>' || ".join(f"t{i}" for i in range(PATH_LEN))} AS path,
  COUNT(*) AS n
FROM seq
WHERE {" AND ".join(f"t{i} IS NOT NULL" for i in range(PATH_LEN))}
GROUP BY path ORDER BY n DESC, path LIMIT {PATH_TOPK}
"""



def q_watermark_audit(spark: SparkSession, sf: str) -> DataFrame:
    """Out-of-orderness audit — the measurement that SIZES a streaming
    watermark instead of guessing it: treating event_id as ingestion
    order, an event's lateness is how far the per-user running-max
    event time had already advanced past it when it arrived. Reports
    per event type the in-order fraction and the exact p50/p95/p99/max
    lateness in seconds; ``withWatermark`` set at the p99 keeps state
    bounded while dropping <1% of late rows. One user-partitioned
    running-max window (scales with the user key), then all percentile
    work happens on the |types|-sized aggregate."""
    from pyspark.sql import Window

    ev = table(spark, sf, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    late = ev.select(
        "event_type",
        (
            F.unix_timestamp(F.max("ts").over(w)) - F.unix_timestamp("ts")
        ).alias("lateness_s"),
    )
    qs_arr = F.array(F.lit(0.5), F.lit(0.95), F.lit(0.99))
    return late.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(
            F.sum(F.when(F.col("lateness_s") == 0, 1).otherwise(0))
            / F.count(F.lit(1)),
            6,
        ).alias("in_order_frac"),
        F.percentile("lateness_s", qs_arr)[0].alias("p50_lateness_s"),
        F.percentile("lateness_s", qs_arr)[1].alias("p95_lateness_s"),
        F.percentile("lateness_s", qs_arr)[2].alias("p99_lateness_s"),
        F.max("lateness_s").alias("max_lateness_s"),
    )


SQL_WATERMARK_AUDIT = """
WITH late AS (
  SELECT event_type,
    date_diff('second', ts,
      MAX(ts) OVER (PARTITION BY user_id ORDER BY event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      AS lateness_s
  FROM events
)
SELECT event_type, COUNT(*) AS n_events,
  ROUND(CAST(SUM(CASE WHEN lateness_s = 0 THEN 1 ELSE 0 END) AS DOUBLE)
        / COUNT(*), 6) AS in_order_frac,
  quantile_cont(lateness_s, 0.5) AS p50_lateness_s,
  quantile_cont(lateness_s, 0.95) AS p95_lateness_s,
  quantile_cont(lateness_s, 0.99) AS p99_lateness_s,
  MAX(lateness_s) AS max_lateness_s
FROM late GROUP BY event_type
"""



def q_active_users(spark: SparkSession, sf: str) -> DataFrame:
    """DAU / WAU / MAU — rolling DISTINCT-user counts per day, the one
    aggregation shape the suite lacked: a sliding window over a
    distinct set (unlike sums, distinct counts cannot be composed from
    daily partials, so the trailing windows re-count from the deduped
    (day, user) pairs). Shape: one distinct shuffle collapses the raw
    stream to day x user pairs (the data-sized step), then a BROADCAST
    spine of ~30 day rows fans each pair to at most 30 trailing
    windows and a day-keyed conditional COUNT DISTINCT finishes —
    cost scales with active users, never with raw events."""
    ev = table(spark, sf, "events")
    daily = ev.select(
        F.date_trunc("day", "ts").alias("d"), "user_id"
    ).distinct()
    spine = daily.select("d").distinct()
    j = F.broadcast(spine.alias("s")).join(
        daily.alias("u"),
        (F.col("u.d") <= F.col("s.d"))
        & (F.col("u.d") >= F.col("s.d") - F.expr("INTERVAL 29 DAYS")),
    )
    # Stays TIMESTAMP (date_trunc's type), matching the oracle: a DATE
    # cast lands in pandas as object(datetime.date) vs DuckDB's
    # datetime64 and the driver's str-hash would diverge.
    return j.groupBy(F.col("s.d").alias("day")).agg(
        F.countDistinct(
            F.when(F.col("u.d") == F.col("s.d"), F.col("u.user_id"))
        ).alias("dau"),
        F.countDistinct(
            F.when(
                F.col("u.d") >= F.col("s.d") - F.expr("INTERVAL 6 DAYS"),
                F.col("u.user_id"),
            )
        ).alias("wau"),
        F.countDistinct("u.user_id").alias("mau"),
    )


SQL_ACTIVE_USERS = """
WITH daily AS (
  SELECT DISTINCT date_trunc('day', ts) AS d, user_id FROM events
),
spine AS (SELECT DISTINCT d FROM daily)
SELECT CAST(s.d AS TIMESTAMP) AS day,
  COUNT(DISTINCT CASE WHEN u.d = s.d THEN user_id END) AS dau,
  COUNT(DISTINCT CASE WHEN u.d >= s.d - INTERVAL 6 DAY THEN user_id END) AS wau,
  COUNT(DISTINCT user_id) AS mau
FROM spine s JOIN daily u
  ON u.d <= s.d AND u.d >= s.d - INTERVAL 29 DAY
GROUP BY s.d
"""

def q_conversion_lag(spark: SparkSession, sf: str) -> DataFrame:
    """Time-to-convert per first-view day cohort: for each user, the
    first 'view' and the first 'purchase' AT OR AFTER it; per cohort
    day the conversion rate and the p50/p90 lag in minutes — the
    funnel's TIMING companion (``events_funnel`` counts who converts,
    this measures how fast). Lags are exact integer microseconds
    (``unix_micros`` ↔ ``epoch_us``) so the percentile interpolation
    operates on identical ints in both engines; cohort_day stays
    TIMESTAMP (the retention/LTV date-canon precedent).

    Scale: two user-keyed aggregates + one user-keyed join, then all
    percentile math on per-user scalars grouped by ~days cohorts; at
    real scale swap exact `percentile` for `approx_percentile` (the
    documented RFM trade)."""
    ev = table(spark, sf, "events")
    # Round-12 optimization (guide §2.4): v feeds two consumers (the
    # conversion join + the left join to base) — materialize the
    # user-sized first-view frame once instead of replaying the event
    # scan + aggregate per consumer (3 events scans → 2)
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min(F.unix_micros("ts")).alias("v_us"))
        .localCheckpoint(eager=True)
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.unix_micros("ts").alias("p_ts")
    )
    conv = (
        v.join(p, "user_id")
        .filter(F.col("p_ts") >= F.col("v_us"))
        .groupBy("user_id")
        .agg(F.min("p_ts").alias("p_us"))
    )
    base = v.join(conv, "user_id", "left").select(
        F.date_trunc("day", F.timestamp_micros(F.col("v_us"))).alias("cohort_day"),
        "v_us",
        "p_us",
    )
    lag = F.col("p_us") - F.col("v_us")
    converted = F.sum(F.when(F.col("p_us").isNotNull(), 1).otherwise(0))
    return base.groupBy("cohort_day").agg(
        F.count(F.lit(1)).alias("n_users"),
        converted.alias("n_converted"),
        F.round(converted / F.count(F.lit(1)), 6).alias("conv_rate"),
        F.round(F.percentile(lag, F.lit(0.5)) / F.lit(6e7), 6).alias("p50_lag_min"),
        F.round(F.percentile(lag, F.lit(0.9)) / F.lit(6e7), 6).alias("p90_lag_min"),
    )


SQL_CONVERSION_LAG = """
WITH v AS (
  SELECT user_id, MIN(epoch_us(ts)) AS v_us
  FROM events WHERE event_type = 'view' GROUP BY user_id
),
conv AS (
  SELECT e.user_id, MIN(epoch_us(e.ts)) AS p_us
  FROM events e JOIN v ON v.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= v.v_us
  GROUP BY e.user_id
),
base AS (
  SELECT CAST(date_trunc('day', make_timestamp(v.v_us)) AS TIMESTAMP) AS cohort_day,
         v.v_us, c.p_us
  FROM v LEFT JOIN conv c ON c.user_id = v.user_id
)
SELECT cohort_day, COUNT(*) AS n_users,
  CAST(SUM(CASE WHEN p_us IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_converted,
  ROUND(SUM(CASE WHEN p_us IS NOT NULL THEN 1 ELSE 0 END) / COUNT(*), 6) AS conv_rate,
  ROUND(quantile_cont(p_us - v_us, 0.5) / 6e7, 6) AS p50_lag_min,
  ROUND(quantile_cont(p_us - v_us, 0.9) / 6e7, 6) AS p90_lag_min
FROM base GROUP BY cohort_day
"""


MK_ITERS = 5  # stationary-distribution power iterations


def q_markov_stationary(spark: SparkSession, sf: str) -> DataFrame:
    """Stationary distribution of the event-type Markov chain:
    {MK_ITERS} power iterations π_{{k+1}} = π_k·P from the uniform
    start, over the same row-stochastic transition matrix
    ``events_transition_matrix`` reports — the long-run share of time
    the event stream spends in each state (the "where does the funnel
    settle" number next to the matrix's one-step view).

    Plan: ONE events scan builds the type-pair cell counts
    (localCheckpoint'd — matrix, state spine, and every iteration
    derive from the materialized |types|² cells, never re-running the
    user-keyed lag window); each iteration is one |types|²-cell join
    + |types|-key aggregate — free at any scale. The LEFT join back
    to the state spine keeps sink-only states at mass 0 instead of
    silently dropping them. Summation-order ulps (~1e-16/iteration)
    are absorbed by the final ROUND 9 — the pagerank convention; the
    oracle unrolls the identical iterations as a CTE chain."""
    from pyspark.sql import Window

    ev = table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        F.lag("event_type").over(w).alias("prev_type"),
        F.col("event_type").alias("next_type"),
    ).filter(F.col("prev_type").isNotNull())
    cells = (
        seq.groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).alias("nt"))
        .localCheckpoint(eager=True)
    )
    # Round-12 optimization (guide §2.4 + §3.1): rowsum and P are
    # |types|- and |types|²-row frames referenced by EVERY unrolled
    # iteration — lazily the rowsum aggregate replayed 6× and the
    # P join 5× (58 Exchanges in the captured before-plan), and each
    # tiny iteration join ran as a shuffle pair that AQE had to
    # re-plan at runtime. Materializing both once and broadcast-
    # hinting the per-iteration joins statically leaves one exchange
    # per iteration (the |types|-key flow aggregate). Same cells, same
    # probabilities, same iteration arithmetic.
    rowsum = (
        cells.groupBy("prev_type")
        .agg(F.sum("nt").alias("row_n"))
        .localCheckpoint(eager=True)
    )
    P = (
        cells.join(F.broadcast(rowsum), "prev_type")
        .select(
            "prev_type",
            "next_type",
            (F.col("nt") / F.col("row_n")).alias("prob"),
        )
        .localCheckpoint(eager=True)
    )
    states = rowsum.select(F.col("prev_type").alias("state"))
    ns = states.agg(F.count(F.lit(1)).alias("n"))
    pi = states.crossJoin(F.broadcast(ns)).select(
        "state", (F.lit(1.0) / F.col("n")).alias("p")
    )
    for _ in range(MK_ITERS):
        flow = (
            pi.join(F.broadcast(P), pi["state"] == P["prev_type"])
            .groupBy("next_type")
            .agg(F.sum(F.col("p") * F.col("prob")).alias("s"))
        )
        pi = states.join(
            F.broadcast(flow), states["state"] == flow["next_type"], "left"
        ).select("state", F.coalesce(F.col("s"), F.lit(0.0)).alias("p"))
    return pi.select(
        F.col("state").alias("event_type"),
        F.round("p", 9).alias("stationary_prob"),
    )


def _markov_stationary_oracle(iters: int = MK_ITERS) -> str:
    steps = []
    for k in range(1, iters + 1):
        steps.append(
            f"""pi{k} AS (
  SELECT s.state, COALESCE(t.s, 0.0) AS p
  FROM states s
  LEFT JOIN (
    SELECT tm.next_type AS state, SUM(p.p * tm.prob) AS s
    FROM pi{k - 1} p JOIN tm ON p.state = tm.prev_type
    GROUP BY tm.next_type
  ) t ON s.state = t.state
)"""
        )
    chain = ",\n".join(steps)
    return f"""
WITH seq AS (
  SELECT user_id,
    LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
    event_type AS next_type
  FROM events
),
cells AS (
  SELECT prev_type, next_type, COUNT(*) AS nt
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY prev_type, next_type
),
rowsum AS (
  SELECT prev_type, CAST(SUM(nt) AS BIGINT) AS row_n FROM cells GROUP BY 1
),
tm AS (
  SELECT cells.prev_type, cells.next_type, nt * 1.0 / row_n AS prob
  FROM cells JOIN rowsum ON cells.prev_type = rowsum.prev_type
),
states AS (SELECT prev_type AS state FROM rowsum),
ns AS (SELECT COUNT(*) AS n FROM states),
pi0 AS (SELECT state, 1.0 / ns.n AS p FROM states CROSS JOIN ns),
{chain}
SELECT state AS event_type, ROUND(p, 9) AS stationary_prob FROM pi{iters}
"""


QUERIES: dict[str, Query] = {
    "events_markov_stationary": Query(
        q_markov_stationary, _markov_stationary_oracle()
    ),
    "events_funnel": Query(q_funnel, SQL_FUNNEL),
    "events_conversion_lag": Query(q_conversion_lag, SQL_CONVERSION_LAG),
    "events_scd2_intervals": Query(q_scd2_intervals, SQL_SCD2_INTERVALS),
    "equi_depth_histogram": Query(q_equi_depth_histogram, SQL_EQUI_DEPTH_HISTOGRAM),
    "rate_limit_per_key": Query(q_rate_limit_per_key, SQL_RATE_LIMIT_PER_KEY),
    "merge_upsert": Query(q_merge_upsert, SQL_MERGE_UPSERT),
    "events_transition_matrix": Query(q_transition_matrix, SQL_TRANSITION_MATRIX),
    "events_retention": Query(q_retention, SQL_RETENTION),
    "events_cohort_ltv": Query(q_cohort_ltv, SQL_COHORT_LTV),
    "events_tumbling_window": Query(q_tumbling_window, SQL_TUMBLING_WINDOW),
    "events_gap_fill": Query(q_gap_fill, SQL_GAP_FILL),
    "events_click_attribution": Query(q_click_attribution, SQL_CLICK_ATTRIBUTION),
    "events_recursive_chains": Query(q_recursive_chains, SQL_RECURSIVE_CHAINS),
    "events_hypertable_rollup": Query(q_hypertable_rollup, SQL_HYPERTABLE_ROLLUP),
    "events_sliding_window": Query(q_sliding_window, SQL_SLIDING_WINDOW),
    "events_session_window": Query(q_session_window, SQL_SESSION_WINDOW),
    "events_json_extract": Query(q_json_extract, SQL_JSON_EXTRACT),
    "events_variant_extract": Query(q_variant_extract, SQL_VARIANT_EXTRACT),
    "events_type_stats": Query(q_event_type_stats, SQL_EVENT_TYPE_STATS),
    "events_path_topk": Query(q_path_topk, SQL_PATH_TOPK),
    "events_watermark_audit": Query(q_watermark_audit, SQL_WATERMARK_AUDIT),
    "events_active_users": Query(q_active_users, SQL_ACTIVE_USERS),
}
