#!/usr/bin/env python
"""Round-12 optimization profiler (guide §1: measure first).

For each suite query (default: the bench HEADLINE list) measure, in one
warm session:

- ``build_s``   — Python-side plan construction (q.build call),
- ``analyze_s`` — first ``df.schema`` touch (Catalyst analysis),
- ``exec_s``    — best-of-N noop-sink execution (guide §1.4),
- ``jobs``/``stages``/``tasks`` — scheduler work per execution, via the
  status tracker deltas (how much of ``exec_s`` is stage-count overhead).

Output: one JSON line per query to stdout (tools-only; NOT a bench
artifact — the bench protocol stays bench.py's).

Usage:
    python tools/profile_queries.py [query ...]   # default: HEADLINE
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _noop(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> int:
    from bench import HEADLINE
    from map_reduce_implementation_spark.session import get_spark
    from map_reduce_implementation_spark.suite import all_queries

    names = sys.argv[1:] or HEADLINE
    spark = get_spark(app_name="profile_queries")
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    qs = all_queries()

    for name in names:
        q = qs.get(name)
        if q is None:
            print(json.dumps({"query": name, "error": "unknown"}))
            continue
        try:
            t0 = time.perf_counter()
            df = q.build(spark, SF_DIR)
            build_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            _ = df.schema
            analyze_s = time.perf_counter() - t0
            # warm run (JIT, file listing)
            sc.setJobDescription(f"profile:{name}")
            _noop(df)
            jobs0 = tracker.getJobIdsForGroup(None)
            best = float("inf")
            runs = 2
            for _ in range(runs):
                t0 = time.perf_counter()
                _noop(q.build(spark, SF_DIR))
                best = min(best, time.perf_counter() - t0)
            jobs1 = tracker.getJobIdsForGroup(None)
            new_jobs = [j for j in jobs1 if j not in jobs0]
            n_stages = 0
            n_tasks = 0
            for j in new_jobs:
                ji = tracker.getJobInfo(j)
                if ji is None:
                    continue
                for st in ji.stageIds:
                    si = tracker.getStageInfo(st)
                    if si is not None:
                        n_stages += 1
                        n_tasks += si.numTasks
            print(
                json.dumps(
                    {
                        "query": name,
                        "build_s": round(build_s, 4),
                        "analyze_s": round(analyze_s, 4),
                        "exec_s": round(best, 4),
                        "jobs_per_run": round(len(new_jobs) / runs, 1),
                        "stages_per_run": round(n_stages / runs, 1),
                        "tasks_per_run": round(n_tasks / runs, 1),
                    }
                ),
                flush=True,
            )
        except Exception as exc:  # keep profiling the rest
            print(json.dumps({"query": name, "error": str(exc)[:200]}), flush=True)
        spark.catalog.clearCache()
        sc.setJobDescription(None)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
