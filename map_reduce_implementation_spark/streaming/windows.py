"""Structured Streaming surface (SURVEY.md §2.9 — EXT; the reference has
no streaming. Flagged as extension per SURVEY §1.4).

Design: the window aggregations are THE SAME column expressions as the
batch twins in suite/events.py — a function of DataFrame in, DataFrame
out, agnostic to batch vs stream. Structured Streaming incrementalizes
them; the watermark bounds state.

100 TB/stream notes:
- State store scale: watermark + windowed agg keeps state per (window,
  key) only until watermark passes window end — bounded by key
  cardinality × window horizon, not stream length.
- ``Trigger.AvailableNow`` used in tests = batch-equivalent semantics
  with the streaming engine, the recommended backfill pattern.
- Custom stateful ops use ``applyInPandasWithState`` (Arrow-batched).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Fallback stream schema when the directory is still empty at stream
# definition time (a stream may legitimately start before any file
# lands). Uses the TIMESTAMP encoding; a nanos-long directory that is
# empty at start must pass an explicit schema instead.
EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def stream_events(
    spark: SparkSession,
    events_dir: str,
    schema: T.StructType | None = None,
    **reader_options: str,
) -> DataFrame:
    """File-source stream over events parquet (directory of files —
    Spark's file source discovers new files as they land).

    The stream schema is inferred from a one-off batch scan of the same
    directory (readStream requires an explicit schema): the events table
    has shipped ``ts`` as both INT64 nanos and TIMESTAMP(MICROS) across
    dataset generations, and the batch normalizer handles both. If the
    directory is empty at stream-definition time, falls back to
    ``EVENTS_SCHEMA`` (or the caller-provided ``schema``) so the stream
    can start before the first file lands.

    NOTE: the physical schema is fixed at stream start — a given events
    directory must stay single-encoding for the stream's lifetime.
    Files of the other ``ts`` encoding landing later would be decoded
    with the wrong physical type; keep encodings in separate dirs."""
    from ..sources.tables import normalize_events_ts

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    if schema is None:
        try:
            schema = spark.read.parquet(events_dir).schema
        except Exception:  # empty/missing dir: no footers to infer from
            schema = EVENTS_SCHEMA
    reader = spark.readStream.schema(schema)
    for k, v in reader_options.items():  # e.g. maxFilesPerTrigger="1"
        reader = reader.option(k, v)
    raw = reader.parquet(events_dir)
    return normalize_events_ts(raw)


def tumbling_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling-window counts per event_type — streaming twin of
    suite/events.py::q_tumbling_window (same expressions)."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )


def sliding_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", window, slide).alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )


def session_counts(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Session windows (inactivity gap) per user — streaming twin of
    suite/events.py::q_session_window. State per open session, closed
    and emitted once the watermark passes session end + gap."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select("user_id", F.col("w.start").alias("session_start"), "n_events")
    )


def stateful_running_count(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: running event
    count per user across micro-batches (the canonical template for
    bespoke state machines the built-in windows can't express)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("total_events", T.LongType()),
        ]
    )
    state_schema = T.StructType([T.StructField("cnt", T.LongType())])

    def update(key, pdfs, state: GroupState):
        cnt = state.get[0] if state.exists else 0
        for pdf in pdfs:
            cnt += len(pdf)
        state.update((cnt,))
        yield pd.DataFrame({"user_id": [key[0]], "total_events": [cnt]})

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
        )
    )


TWS_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("max_value", T.DoubleType()),
    ]
)


def tws_available() -> bool:
    """transformWithState's Python state client speaks protobuf to the
    JVM state server; without the protobuf wheel the driver worker cannot
    start. Plan construction works either way — only execution needs it."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def stateful_running_stats_tws(events: DataFrame) -> DataFrame:
    """Spark 4 arbitrary-state operator (transformWithStateInPandas):
    per-user running count/sum/max held in a ValueState, one updated row
    emitted per key per micro-batch.

    This is the successor API to applyInPandasWithState (see
    stateful_running_count above): typed state variables (value/list/map),
    timers, TTL, and state-schema evolution — all backed by the RocksDB
    state store provider, which the session must enable:

        spark.sql.streaming.stateStore.providerClass =
          org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider

    At 100 TB-stream scale state is partitioned by the grouping key across
    executors and RocksDB spills it to local disk + changelog-checkpoints
    to the checkpoint location, so per-key state is O(1) memory.

    Requires the protobuf wheel at runtime (gate with tws_available());
    the container this repo is tested in lacks it, so the execution test
    is skipped there and the plan/schema are asserted instead."""
    import pandas as pd
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    state_schema = T.StructType(
        [
            T.StructField("cnt", T.LongType()),
            T.StructField("sm", T.DoubleType()),
            T.StructField("mx", T.DoubleType()),
        ]
    )

    class RunningStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._st = handle.getValueState("stats", state_schema)

        def handleInputRows(self, key, rows, timerValues):
            cnt, sm, mx = (0, 0.0, float("-inf"))
            if self._st.exists():
                cnt, sm, mx = self._st.get()
            for pdf in rows:
                cnt += len(pdf)
                sm += float(pdf["value"].sum())
                mx = max(mx, float(pdf["value"].max()))
            self._st.update((cnt, sm, mx))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [cnt],
                    "total_value": [sm],
                    "max_value": [mx],
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningStats(),
        outputStructType=TWS_OUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def streaming_dedup(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming exact dedup on event_id with watermark-bounded state —
    the streaming twin of dedup_exact. State is dropped once the
    watermark passes (dropDuplicatesWithinWatermark), so memory is
    bounded by the watermark horizon, not stream length."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def stream_stream_click_purchase(
    clicks: DataFrame,
    purchases: DataFrame,
    horizon: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream join: purchases attributed to a same-user
    click within ``horizon``. BOTH sides watermarked + a time-range join
    condition — exactly what Structured Streaming needs to bound join
    state (each side keeps only rows younger than watermark+horizon).
    Works identically on batch frames (watermark applied only when
    streaming), which is how the equivalence test pins semantics.

    ``how="left_outer"`` adds the abandoned-click rows: a click with no
    purchase inside the horizon emits ONCE, null-extended, when the
    watermark passes click_ts + horizon and the engine can prove no
    match can still arrive. (That proof is the whole point: an outer
    stream-stream join without watermarks on both sides AND a time
    bound is unplannable — state would be unbounded and "no match" would
    never be decidable. Spark rejects it; this shape is the minimal
    plannable one.) On a finite AvailableNow run the final watermark
    stops at max(ts) - delay, so trailing unmatched clicks younger than
    that cutoff stay in state and are NOT emitted — the equivalence
    test asserts exactly that boundary."""
    c = clicks
    p = purchases
    if c.isStreaming:
        c = c.withWatermark("ts", watermark)
    if p.isStreaming:
        p = p.withWatermark("ts", watermark)
    c = c.select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    p = p.select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    return c.join(
        p,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {horizon}")),
        how,
    ).select("c_user", "click_id", "purchase_id", "click_ts", "purchase_ts")


def top_event_types(events: DataFrame, k: int = 5) -> DataFrame:
    """Streaming top-k: running event-type leaderboard. Sorting a stream
    requires complete output mode (the whole result is re-emitted per
    trigger) — correct for SMALL keyspaces like a leaderboard; for large
    keyspaces use windowed aggs + downstream batch ranking instead."""
    return (
        events.groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("event_type"))
        .limit(k)
    )


def stream_static_enrich(events: DataFrame, dim: DataFrame, on: str = "event_type") -> DataFrame:
    """Stream-static join: enrich a stream against a static dimension.

    Structured Streaming plans this as a per-micro-batch broadcast join —
    the static side is re-broadcast per batch, never stateful, so it
    scales with the dim size only. The classic 100 TB-stream shape:
    events × small reference data, zero state-store footprint."""
    return events.join(F.broadcast(dim), on)


def read_state(spark: SparkSession, checkpoint_dir: str) -> DataFrame:
    """State-store reader (Spark 4): inspect a streaming query's live
    state straight from its checkpoint — keys, values, partition ids.
    The production debugging tool for 'why is my state store growing':
    no replay, no instrumentation, just a batch scan of the HDFS/RocksDB
    state files. Returns DataFrame[key: struct, value: struct,
    partition_id: int]."""
    return spark.read.format("statestore").load(checkpoint_dir)


def run_foreach_batch_to_parquet(sdf: DataFrame, out_dir: str, timeout_s: int = 120):
    """foreachBatch sink: per-micro-batch custom writes (the escape hatch
    for sinks Structured Streaming lacks — JDBC upserts, dual writes).
    Here: append each batch to parquet with the batch id stamped."""
    from pyspark.sql import functions as F  # noqa: F401  (local alias)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(
            out_dir
        )

    q = (
        sdf.writeStream.foreachBatch(write_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", out_dir + "_ckpt")
        .start()
    )
    q.awaitTermination(timeout_s)
    q.stop()


def run_incremental_rollup(
    sdf: DataFrame, state_dir: str, key_col: str = "event_type", timeout_s: int = 120
) -> None:
    """Continuous-aggregate pattern (the streaming twin of
    ``events_hypertable_rollup`` + ``merge_upsert``): each micro-batch
    aggregates only its NEW rows and merges the per-key deltas into a
    parquet rollup via a full-outer read-modify-write — the
    ``foreachBatch`` escape hatch for sinks the engine can't upsert
    natively (JDBC, object-store tables).

    Scale shape: per batch, work is O(batch) + O(|keys|); the rollup
    state is aggregate-sized and the event history is never re-read.
    The swap is two-phase (write tmp, rewrite state) so a reader never
    sees a half-written rollup; a real lake would use a transactional
    table format's MERGE instead.

    Replay idempotence: foreachBatch is at-least-once — if the job dies
    AFTER the state rewrite but BEFORE the checkpoint commit, the
    restarted stream re-runs the same batch_id. The state therefore
    carries a ``last_batch_id`` stamp (written atomically WITH the
    rollup rows, not as a sidecar that could desync) and a replayed
    batch_id <= the stamp is skipped instead of double-counted. A crash
    in the middle of the overwrite swap itself can still lose the state
    directory — that final hole is exactly what a transactional table
    format's MERGE closes.
    """
    upsert = rollup_upsert(state_dir, key_col)
    q = (
        sdf.writeStream.foreachBatch(upsert)
        .trigger(availableNow=True)
        .option("checkpointLocation", state_dir + "_ckpt")
        .start()
    )
    q.awaitTermination(timeout_s)
    q.stop()


def rollup_upsert(state_dir: str, key_col: str = "event_type"):
    """The foreachBatch merge function behind ``run_incremental_rollup``,
    exposed so the at-least-once replay path (same batch_id delivered
    twice) is directly testable without crashing a streaming query."""

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        delta = batch_df.groupBy(key_col).agg(F.count("*").alias("n_events"))
        try:
            cur = spark.read.parquet(state_dir)
        except Exception:  # first batch: no state yet
            cur = None
        if cur is None:
            merged = delta.withColumn("last_batch_id", F.lit(batch_id))
        else:
            applied = cur.agg(F.max("last_batch_id")).first()[0]
            if applied is not None and batch_id <= applied:
                return  # at-least-once replay of an already-merged batch
            merged = (
                cur.withColumnRenamed("n_events", "n_old")
                .join(
                    delta.withColumnRenamed("n_events", "n_new"),
                    key_col,
                    "full_outer",
                )
                .select(
                    key_col,
                    (
                        F.coalesce("n_old", F.lit(0)) + F.coalesce("n_new", F.lit(0))
                    ).alias("n_events"),
                    F.lit(batch_id).alias("last_batch_id"),
                )
            )
        merged.write.mode("overwrite").parquet(state_dir + "_tmp")
        spark.read.parquet(state_dir + "_tmp").write.mode("overwrite").parquet(
            state_dir
        )

    return upsert


def run_available_now_to_memory(
    sdf: DataFrame, name: str, mode: str = "complete", timeout_s: int = 120
) -> None:
    """Drain the stream with Trigger.AvailableNow into an in-memory table
    (tests/backfill). Batch-equivalent results, streaming engine."""
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
    q.stop()
