"""Round-9 skew evidence: price the hot-key straggler and its two
mitigations with task-level numbers (VERDICT r08 'What's missing' #2 —
the salted join was hash-green but unpriced; a green query does not
show that the salt actually kills the straggler).

Corpus: .bench_data/skew_x10 lineitem (one hot key owns ~25% of 6M fact
rows) joined to rel_x10 orders, auto-broadcast off (both-sides-large
regime — see bench._no_auto_broadcast). Three variants, one shared
session (UI on for the REST task summaries), each timed warm best-of-2
and then profiled once:

  plain_skew_off   — plain shuffle join, AQE skewJoin disabled: the raw
                     straggler. One reducer task owns ~25% of the fact
                     side; stage time ≈ that task's time.
  plain_aqe_skew   — plain join, AQE skewJoin on with thresholds sized
                     to the corpus (skewedPartitionThresholdInBytes is
                     256 MB by default — correct for a 1000-executor
                     cluster, far above this 10×-sf0.1 shuffle; 16 MB /
                     8 MB advisory here so the runtime mitigation
                     actually engages at bench scale, the same reason
                     the family pins auto-broadcast off).
  salted_n8        — operators/skew.salted_join at the registry default
                     n_salts=8: the plan-level mitigation that works
                     even where AQE cannot see the skew (it trades an
                     8× explode of the orders side for an even task
                     distribution).

Per variant the record carries wall seconds and, for every stage of the
profiled run, the task-duration quantiles (p50/p95/max) plus shuffle
volumes — the max-vs-median split IS the straggler evidence the README
paragraph quotes.

Writes bench_runs/skew_probe.json. Usage: python tools/skew_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")

import bench  # noqa: E402
from map_reduce_implementation_spark.session import get_spark  # noqa: E402


def _api(spark, path: str):
    ui = spark.sparkContext.uiWebUrl
    if not ui:
        raise RuntimeError("Spark UI disabled")
    app_id = spark.sparkContext.applicationId
    url = f"{ui}/api/v1/applications/{app_id}/{path}"
    with urllib.request.urlopen(url, timeout=10) as resp:
        return json.load(resp)


def _stage_ids(spark) -> set[int]:
    return {s["stageId"] for s in _api(spark, "stages?status=complete")}


def _stage_rows(spark, new_ids: set[int]) -> list[dict]:
    rows = []
    for s in _api(spark, "stages?status=complete"):
        if s["stageId"] not in new_ids:
            continue
        row = {
            "stageId": s["stageId"],
            "name": s["name"].split("\n")[0][:60],
            "tasks": s.get("numCompleteTasks"),
            "shuffle_read_mb": round(s.get("shuffleReadBytes", 0) / 1e6, 1),
            "shuffle_write_mb": round(s.get("shuffleWriteBytes", 0) / 1e6, 1),
            "executor_run_sec": round(s.get("executorRunTime", 0) / 1e3, 2),
        }
        try:
            q = _api(
                spark,
                f"stages/{s['stageId']}/{s.get('attemptId', 0)}/taskSummary"
                "?quantiles=0.5,0.95,1.0",
            )
            row["task_duration_ms_p50_p95_max"] = [
                round(x, 1) for x in q.get("duration", [])
            ]
            row["task_shuffle_read_mb_p50_p95_max"] = [
                round(x / 1e6, 2)
                for x in (q.get("shuffleReadMetrics") or {}).get("readBytes", [])
            ]
        except Exception as exc:  # noqa: BLE001 — telemetry is best-effort
            row["task_summary_error"] = str(exc)
        rows.append(row)
    return rows


def _plain_join_df(spark, li_dir: str, orders_dir: str):
    from pyspark.sql import functions as F

    li = spark.read.parquet(os.path.join(li_dir, "lineitem.parquet")).select(
        F.col("l_orderkey").alias("okey"),
        "l_linenumber",
        "l_extendedprice",
        "l_discount",
    )
    orders = spark.read.parquet(
        os.path.join(orders_dir, "orders.parquet")
    ).select(F.col("o_orderkey").alias("okey"), "o_custkey", "o_orderdate")
    return li.join(orders, "okey")


def _measure(spark, build) -> dict:
    build()  # warm
    secs = []
    for _ in range(2):
        t0 = time.perf_counter()
        build()
        secs.append(time.perf_counter() - t0)
    before = _stage_ids(spark)
    t0 = time.perf_counter()
    build()
    prof_wall = time.perf_counter() - t0
    out = {
        "wall_sec": round(min(secs), 3),
        "wall_samples": [round(s, 3) for s in secs],
        "profiled_wall_sec": round(prof_wall, 3),
    }
    try:
        out["stages"] = _stage_rows(spark, _stage_ids(spark) - before)
    except Exception as exc:  # noqa: BLE001
        out["stages_error"] = str(exc)
    return out


def main() -> int:
    spark = get_spark(
        app_name="skew-probe", extra_conf={"spark.ui.enabled": "true"}
    )
    rec: dict = {"load_at_start": bench._load_snapshot()}
    try:
        skew10 = bench._ensure_skew_xn(spark, 10, "skew_x10")
        rel10 = bench._ensure_rel_xn(spark, 10, "rel_x10")
        assert skew10 and rel10
        c = spark.conf
        with bench._no_auto_broadcast(spark):
            c.set("spark.sql.adaptive.skewJoin.enabled", "false")
            rec["plain_skew_off"] = _measure(
                spark,
                lambda: bench._run_noop(_plain_join_df(spark, skew10, rel10)),
            )
            c.set("spark.sql.adaptive.skewJoin.enabled", "true")
            c.set(
                "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
                "16m",
            )
            c.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
            rec["plain_aqe_skew"] = _measure(
                spark,
                lambda: bench._run_noop(_plain_join_df(spark, skew10, rel10)),
            )
            c.set("spark.sql.adaptive.skewJoin.enabled", "false")
            rec["salted_n8"] = _measure(
                spark,
                lambda: bench._run_noop(
                    bench._skew_join_df(spark, skew10, rel10)
                ),
            )
            c.set("spark.sql.adaptive.skewJoin.enabled", "true")
            c.unset(
                "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"
            )
            c.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    finally:
        spark.stop()
    out = os.path.join(REPO, "bench_runs", "skew_probe.json")
    with open(out, "w") as fh:
        json.dump(rec, fh, indent=1)
    print(json.dumps(rec, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
