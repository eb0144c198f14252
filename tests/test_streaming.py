"""Streaming surface tests: AvailableNow drain must equal the batch twin."""

from __future__ import annotations

import shutil

import pytest

from map_reduce_implementation_spark.sources import table
from map_reduce_implementation_spark.streaming import (
    run_available_now_to_memory,
    session_counts,
    stateful_running_count,
    stream_events,
    tumbling_counts,
)

from .conftest import SF0001


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    # file-source streams read a directory; stage the events file into one
    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(f"{SF0001}/events.parquet", d / "part-000.parquet")
    return str(d)


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_tumbling_stream_equals_batch(spark, events_dir):
    sdf = tumbling_counts(stream_events(spark, events_dir))
    run_available_now_to_memory(sdf, "t_tumbling")
    got = _sorted_rows(spark.table("t_tumbling"))
    want = _sorted_rows(tumbling_counts(table(spark, SF0001, "events")))
    assert got == want


def test_stream_starts_on_empty_dir_then_sees_files(spark, tmp_path):
    """A stream defined over an EMPTY directory must not throw at
    definition time (schema falls back to EVENTS_SCHEMA); files landing
    before the drain are then picked up normally."""
    from pyspark.sql import types as T

    d = tmp_path / "late_events"
    d.mkdir()
    sdf = tumbling_counts(stream_events(spark, str(d)))  # must not raise
    # the drain assertion only makes sense when the staged file carries
    # the fallback's TIMESTAMP encoding (a nanos-long generation needs an
    # explicit schema, as stream_events documents)
    file_ts = spark.read.parquet(f"{SF0001}/events.parquet").schema["ts"].dataType
    if not isinstance(file_ts, T.TimestampNTZType):
        pytest.skip("events generation is not the fallback's ts encoding")
    shutil.copy(f"{SF0001}/events.parquet", d / "part-000.parquet")
    run_available_now_to_memory(sdf, "t_late_start")
    got = _sorted_rows(spark.table("t_late_start"))
    want = _sorted_rows(tumbling_counts(table(spark, SF0001, "events")))
    assert got == want


def test_incremental_rollup_across_batches(spark, tmp_path):
    """foreachBatch continuous aggregate: two files forced into separate
    micro-batches (maxFilesPerTrigger=1); the merged rollup must equal
    the batch groupBy over everything."""
    from map_reduce_implementation_spark.streaming import run_incremental_rollup

    d = tmp_path / "ev"
    d.mkdir()
    shutil.copy(f"{SF0001}/events.parquet", d / "a.parquet")
    shutil.copy(f"{SF0001}/events.parquet", d / "b.parquet")
    state = str(tmp_path / "rollup")
    sdf = stream_events(spark, str(d), maxFilesPerTrigger="1")
    run_incremental_rollup(sdf, state)
    got = _sorted_rows(spark.read.parquet(state).drop("last_batch_id"))
    import pyspark.sql.functions as F

    want = _sorted_rows(
        table(spark, SF0001, "events")
        .groupBy("event_type")
        .agg((F.count("*") * 2).alias("n_events"))
    )
    assert got == want

    # at-least-once replay: re-delivering an already-applied batch_id
    # (the crash-after-state-write-before-checkpoint-commit window) must
    # be a no-op, not a double-count
    from map_reduce_implementation_spark.streaming.windows import rollup_upsert

    upsert = rollup_upsert(state)
    replayed = table(spark, SF0001, "events")
    upsert(replayed, 0)  # batch 0 was already merged by the stream
    upsert(replayed, 1)  # so was batch 1
    still = _sorted_rows(spark.read.parquet(state).drop("last_batch_id"))
    assert still == want


def test_session_stream_equals_batch(spark, events_dir):
    sdf = session_counts(stream_events(spark, events_dir))
    run_available_now_to_memory(sdf, "t_session")
    got = _sorted_rows(spark.table("t_session"))
    want = _sorted_rows(session_counts(table(spark, SF0001, "events")))
    assert got == want


def test_stateful_running_count(spark, events_dir):
    sdf = stateful_running_count(stream_events(spark, events_dir))
    run_available_now_to_memory(sdf, "t_state", mode="update")
    got = {r.user_id: r.total_events for r in spark.table("t_state").collect()}
    ev = table(spark, SF0001, "events")
    want = {
        r.user_id: r.n for r in ev.groupBy("user_id").count().withColumnRenamed("count", "n").collect()
    }
    assert got == want


def test_sliding_stream_equals_batch(spark, events_dir):
    from map_reduce_implementation_spark.streaming import sliding_counts

    sdf = sliding_counts(stream_events(spark, events_dir))
    run_available_now_to_memory(sdf, "t_sliding")
    got = _sorted_rows(spark.table("t_sliding"))
    want = _sorted_rows(sliding_counts(table(spark, SF0001, "events")))
    assert got == want


def test_streaming_dedup_bounded_state(spark, events_dir, tmp_path):
    import shutil as _sh

    from map_reduce_implementation_spark.streaming.windows import (
        run_foreach_batch_to_parquet,
        streaming_dedup,
    )

    # duplicate the events file → stream sees every event twice
    dup_dir = tmp_path / "dup_events"
    dup_dir.mkdir()
    _sh.copy(f"{SF0001}/events.parquet", dup_dir / "a.parquet")
    _sh.copy(f"{SF0001}/events.parquet", dup_dir / "b.parquet")
    deduped = streaming_dedup(stream_events(spark, str(dup_dir)))
    out = str(tmp_path / "dedup_out")
    run_foreach_batch_to_parquet(deduped, out)
    got = spark.read.parquet(out)
    n_src = table(spark, SF0001, "events").count()
    assert got.select("event_id").distinct().count() == n_src
    # both copies land in one availableNow batch → exact dedup holds
    assert got.count() == n_src


def test_stream_static_join_equals_batch(spark, events_dir):
    from map_reduce_implementation_spark.streaming.windows import stream_static_enrich

    dim = spark.createDataFrame(
        [("click", 1.0), ("view", 0.1), ("purchase", 10.0), ("signup", 5.0), ("error", 0.0)],
        "event_type: string, weight: double",
    )
    sdf = stream_static_enrich(stream_events(spark, events_dir), dim).groupBy(
        "event_type"
    ).agg({"weight": "sum", "*": "count"})
    run_available_now_to_memory(sdf, "t_enrich")
    got = _sorted_rows(spark.table("t_enrich"))
    ev = table(spark, SF0001, "events")
    want = _sorted_rows(
        ev.join(dim, "event_type").groupBy("event_type").agg({"weight": "sum", "*": "count"})
    )
    assert got == want


def test_streaming_topk_equals_batch(spark, events_dir):
    from map_reduce_implementation_spark.streaming.windows import top_event_types

    sdf = top_event_types(stream_events(spark, events_dir))
    run_available_now_to_memory(sdf, "t_topk", mode="complete")
    got = [tuple(r) for r in spark.table("t_topk").collect()]
    want = [tuple(r) for r in top_event_types(table(spark, SF0001, "events")).collect()]
    assert got == want


def test_transform_with_state_plan_and_maybe_run(spark, events_dir):
    from map_reduce_implementation_spark.streaming.windows import (
        TWS_OUT_SCHEMA,
        stateful_running_stats_tws,
        tws_available,
    )

    s = stream_events(spark, events_dir)
    sdf = stateful_running_stats_tws(s)
    # plan construction + output schema work regardless of protobuf
    assert sdf.isStreaming and sdf.schema == TWS_OUT_SCHEMA
    assert "transformWithState" in sdf._jdf.queryExecution().logical().toString()
    if not tws_available():
        pytest.skip("protobuf wheel absent: transformWithState cannot execute here")
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        run_available_now_to_memory(sdf, "t_tws", mode="update")
        got = {
            r.user_id: (r.n_events, round(r.total_value, 6), r.max_value)
            for r in spark.table("t_tws").collect()
        }
        ev = table(spark, SF0001, "events")
        from pyspark.sql import functions as F

        want = {
            r.user_id: (r.n, round(r.s, 6), r.m)
            for r in ev.groupBy("user_id")
            .agg(F.count("*").alias("n"), F.sum("value").alias("s"), F.max("value").alias("m"))
            .collect()
        }
        assert got == want
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_stream_stream_join_equals_batch(spark, events_dir):
    from map_reduce_implementation_spark.streaming.windows import (
        stream_stream_click_purchase,
    )

    s = stream_events(spark, events_dir)
    sdf = stream_stream_click_purchase(
        s.filter("event_type = 'click'"), s.filter("event_type = 'purchase'")
    )
    run_available_now_to_memory(sdf, "t_ssj", mode="append")
    got = _sorted_rows(spark.table("t_ssj"))
    ev = table(spark, SF0001, "events")
    want = _sorted_rows(
        stream_stream_click_purchase(
            ev.filter("event_type = 'click'"), ev.filter("event_type = 'purchase'")
        )
    )
    assert got == want and len(want) > 0


def test_state_store_reader(spark, events_dir, tmp_path):
    """Spark 4 statestore format: the checkpoint's live aggregation state
    is directly queryable — per-window counts still held as state must
    sum to the full event count (append mode emits nothing until the
    watermark closes a window, so ALL windows are still open state)."""
    from map_reduce_implementation_spark.streaming.windows import read_state

    ck = str(tmp_path / "ck_state")
    sdf = tumbling_counts(stream_events(spark, events_dir))
    q = (
        sdf.writeStream.format("memory")
        .queryName("t_state_reader")
        .outputMode("append")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()
    st = read_state(spark, ck)
    assert {"key", "value", "partition_id"} <= set(st.columns)
    # append mode drops state once the watermark closes a window, so the
    # store holds ONLY the still-open tail: windows ending after
    # max(ts) - 2h (the watermark horizon). Exact cross-check vs batch.
    from pyspark.sql import functions as F

    ev = table(spark, SF0001, "events")
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    open_events = (
        tumbling_counts(ev)
        .filter(
            F.col("window_start") + F.expr("INTERVAL 1 HOUR")
            > F.lit(max_ts) - F.expr("INTERVAL 2 HOURS")
        )
        .agg(F.sum("n_events"))
        .collect()[0][0]
    )
    state_total = st.agg({"value.count": "sum"}).collect()[0][0]
    assert state_total == open_events and state_total > 0


def test_stream_stream_left_outer_join_watermark_boundary(spark, events_dir):
    """Outer stream-stream join: unmatched clicks null-extend ONCE the
    watermark proves no match can arrive; clicks younger than the final
    watermark cutoff stay in state (finite AvailableNow run) and must
    NOT be emitted. Inner rows are unaffected."""
    import datetime as dt

    from pyspark.sql import functions as F

    from map_reduce_implementation_spark.streaming.windows import (
        stream_stream_click_purchase,
    )

    s = stream_events(spark, events_dir)
    sdf = stream_stream_click_purchase(
        s.filter("event_type = 'click'"),
        s.filter("event_type = 'purchase'"),
        how="left_outer",
    )
    run_available_now_to_memory(sdf, "t_ssj_outer", mode="append")
    got = spark.table("t_ssj_outer").collect()

    ev = table(spark, SF0001, "events")
    batch = stream_stream_click_purchase(
        ev.filter("event_type = 'click'"),
        ev.filter("event_type = 'purchase'"),
        how="left_outer",
    ).collect()
    # final watermark = max(ts) - 2h delay; an unmatched click emits only
    # when watermark > click_ts + 1h horizon
    max_ts = ev.agg(F.max("ts")).first()[0]
    cutoff = max_ts - dt.timedelta(hours=3)

    got_inner = sorted(r for r in map(tuple, got) if r[2] is not None)
    want_inner = sorted(r for r in map(tuple, batch) if r[2] is not None)
    assert got_inner == want_inner and want_inner

    # The exact emitted set depends on micro-batch scheduling (outer rows
    # emit one batch AFTER the watermark advance that expires them, and a
    # finite AvailableNow run schedules no extra batch after the last
    # advance), so assert the scheduling-independent invariants:
    got_outer = {r.click_id for r in got if r.purchase_id is None}
    want_outer_all = {r.click_id for r in batch if r.purchase_id is None}
    want_outer_held = {
        r.click_id for r in batch if r.purchase_id is None and r.click_ts >= cutoff
    }
    # 1. everything emitted is a genuine batch-unmatched click
    assert got_outer <= want_outer_all
    # 2. nothing inside the final watermark window leaked out early
    assert not (got_outer & want_outer_held)
    # 3. expiry does happen (not an empty vacuous pass)
    assert got_outer, "no unmatched clicks were expired"


def test_burst_cells_stream_equals_batch(spark, events_dir):
    """The (event_type, hour) volume cells feeding events_burst_zscore,
    computed as a watermarked streaming windowed aggregate (the
    continuous path a stream-health monitor runs), must equal the batch
    cells — the z-score pass then runs downstream on this rollup."""
    from pyspark.sql import functions as F

    sdf = stream_events(spark, events_dir)
    cells = (
        sdf.withWatermark("ts", "1 hour")
        .groupBy("event_type", F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("c"))
        .select("event_type", F.col("w.start").alias("h"), "c")
    )
    run_available_now_to_memory(cells, "t_burst_cells")
    got = _sorted_rows(spark.table("t_burst_cells"))
    want = _sorted_rows(
        table(spark, SF0001, "events")
        .groupBy("event_type", F.date_trunc("hour", F.col("ts")).alias("h"))
        .agg(F.count("*").alias("c"))
    )
    assert got == want
