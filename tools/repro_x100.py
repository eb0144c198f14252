"""Round-8 reconciliation: reproduce the two BENCH_r07 out-of-band 100x
points (dedup_semantic 0.108 vs [0.015,0.06]; join_region_revenue 0.363
vs [0.08,0.32]) in a quiet session, and measure the round-8 protocol
candidate alongside: an IN-SESSION interleaved 1x denominator per
family in its own fresh JVM (VERDICT r07 'What's wrong' #1).

For the join family it also captures the x100 stage breakdown (shuffle
read/write bytes, spill, GC time) via the Spark UI REST API — the cost
model VERDICT r07 item #2 asks for.

Writes one JSON record to bench_runs/repro_x100_<tag>.json.
Usage: python tools/repro_x100.py [semantic|join|both]
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

import bench  # noqa: E402  (reuses corpora builders + timing helpers)
from map_reduce_implementation_spark.session import get_spark  # noqa: E402


# One-line machine-load record (VERDICT r07 item #3) — reuse bench's
# snapshot instead of keeping a drift-prone duplicate (ADVICE r08: the
# copy here caught only OSError while bench's catches the full
# (OSError, ValueError, IndexError) tuple a malformed /proc read needs).
_load_snapshot = bench._load_snapshot


def _stages(spark) -> dict[int, dict]:
    """Completed-stage metrics from the Spark UI REST API. The UI URL is
    taken from the live context (uiWebUrl), not a hardcoded :4040 — a
    concurrent Spark app pushes the UI to 4041+ (ADVICE r08)."""
    app_id = spark.sparkContext.applicationId
    ui = spark.sparkContext.uiWebUrl
    if not ui:
        raise RuntimeError("Spark UI disabled; no stage metrics available")
    url = f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
    with urllib.request.urlopen(url, timeout=10) as resp:
        data = json.load(resp)
    return {s["stageId"]: s for s in data}


def _interleaved(build1, build100, pairs: int = 3) -> dict:
    build1()
    build100()  # warm both in this session
    t1s, t100s, loads = [], [], []
    for _ in range(pairs):
        loads.append(_load_snapshot())
        t0 = time.perf_counter()
        build1()
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        build100()
        t100s.append(time.perf_counter() - t0)
    t1, t100 = min(t1s), min(t100s)
    return {
        "sec_x1_insession": round(t1, 4),
        "sec_x100": round(t100, 4),
        "t1_samples": [round(t, 4) for t in t1s],
        "t100_samples": [round(t, 4) for t in t100s],
        "slope_x100_insession_x1": round(t100 / (100 * t1), 4),
        "loads": loads,
    }


def repro_semantic() -> dict:
    spark = get_spark(app_name="repro-sem-x100")
    try:
        assert bench._ensure_embs_xn(spark, 100, "docs_x100")
        x100e = os.path.join(bench.REPO, ".bench_data", "docs_x100")
        row = _interleaved(
            lambda: bench._run_noop(
                bench._semantic_scale_df(spark, bench.SF_DIR, bench.SEM_SCALE_K[1])
            ),
            lambda: bench._run_noop(
                bench._semantic_scale_df(spark, x100e, bench.SEM_SCALE_K[100])
            ),
        )
        # old-protocol slope for reconciliation: committed r07 sec_x1
        # (first-session arm denominator) spread was 0.455-0.677
        row["slope_x100_vs_r07_arm_x1_band"] = [
            round(row["sec_x100"] / (100 * 0.677), 4),
            round(row["sec_x100"] / (100 * 0.455), 4),
        ]
        return row
    finally:
        spark.stop()


def repro_join() -> dict:
    spark = get_spark(
        app_name="repro-join-x100", extra_conf={"spark.ui.enabled": "true"}
    )
    try:
        rel100 = bench._ensure_rel_xn(spark, 100, "rel_x100")
        assert rel100
        from map_reduce_implementation_spark.suite import all_queries

        rq = all_queries()["join_region_revenue"]
        row = _interleaved(
            lambda: bench._run_noop(rq.build(spark, bench.SF_DIR)),
            lambda: bench._run_noop(rq.build(spark, rel100)),
        )
        row["slope_x100_vs_r07_arm_x1_band"] = [
            round(row["sec_x100"] / (100 * 0.48), 4),
            round(row["sec_x100"] / (100 * 0.2908), 4),
        ]
        # stage breakdown of ONE x100 run (cost model, VERDICT item #2).
        # A UI failure (disabled, port moved, API change) degrades to a
        # record without x100_profile instead of losing the whole run's
        # already-gathered timings (ADVICE r08).
        try:
            before = _stages(spark)
            t0 = time.perf_counter()
            bench._run_noop(rq.build(spark, rel100))
            wall = time.perf_counter() - t0
            after = _stages(spark)
            new = [s for sid, s in sorted(after.items()) if sid not in before]
            row["x100_profile"] = {
                "wall_sec": round(wall, 3),
                "stages": [
                    {
                        "stageId": s["stageId"],
                        "name": s["name"].split("\n")[0][:80],
                        "tasks": s.get("numCompleteTasks"),
                        "input_mb": round(s.get("inputBytes", 0) / 1e6, 1),
                        "shuffle_write_mb": round(s.get("shuffleWriteBytes", 0) / 1e6, 1),
                        "shuffle_read_mb": round(s.get("shuffleReadBytes", 0) / 1e6, 1),
                        "mem_spill_mb": round(s.get("memoryBytesSpilled", 0) / 1e6, 1),
                        "disk_spill_mb": round(s.get("diskBytesSpilled", 0) / 1e6, 1),
                        "executor_run_sec": round(s.get("executorRunTime", 0) / 1e3, 2),
                        "gc_sec": round(s.get("jvmGcTime", 0) / 1e3, 2),
                    }
                    for s in new
                ],
            }
        except Exception as exc:  # noqa: BLE001 — telemetry is best-effort
            row["x100_profile_error"] = str(exc)
        return row
    finally:
        spark.stop()


def main() -> int:
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    # optional tag suffixes the record filename (e.g. `join 4g` →
    # repro_x100_join_4g.json) so a constrained-heap spill-regime run
    # doesn't overwrite the canonical quiet-session record
    tag = f"_{sys.argv[2]}" if len(sys.argv) > 2 else ""
    rec: dict = {
        "load_at_start": _load_snapshot(),
        "driver_mem": os.environ.get("SPARK_GRAFT_DRIVER_MEM"),
    }
    if which in ("semantic", "both"):
        rec["dedup_semantic"] = repro_semantic()
    if which in ("join", "both"):
        rec["join_region_revenue"] = repro_join()
    out = os.path.join(REPO, "bench_runs", f"repro_x100_{which}{tag}.json")
    with open(out, "w") as fh:
        json.dump(rec, fh, indent=1)
    print(json.dumps(rec, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
