"""Round-9 sizing probe for the skew family's second-decade band.

Runs the new ``_x100_specs`` skew entry (fresh JVM, interleaved
in-session 1x/100x pairs — the exact round-8 protocol bench will use)
and captures the x100 join's stage metrics via the Spark UI REST API,
so the quoted band and the README paragraph cite a measured record
instead of a guess. Writes bench_runs/skew_x100_probe.json.

Usage: python tools/skew_x100_probe.py
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


def _stages(spark) -> list[dict]:
    app_id = spark.sparkContext.applicationId
    ui = spark.sparkContext.uiWebUrl
    url = f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
    with urllib.request.urlopen(url, timeout=10) as resp:
        return json.load(resp)


def main() -> int:
    spark = get_spark(
        app_name="skew-x100-probe", extra_conf={"spark.ui.enabled": "true"}
    )
    setup = dict(bench._x100_specs({}))["skew_salted_join"]
    t0 = time.time()
    builds = setup(spark)  # builds skew_x100 on first run
    if builds is None:
        print("corpora unavailable", file=sys.stderr)
        return 1
    build_s = time.time() - t0
    row = bench._x100_row(*builds)
    rec: dict = {"row": row, "corpus_build_s": round(build_s, 1)}
    try:
        big = [
            {
                "stageId": s["stageId"],
                "name": s.get("name", "")[:60],
                "numTasks": s.get("numTasks"),
                "executorRunTime_s": round(s.get("executorRunTime", 0) / 1e3, 1),
                "shuffleRead_mb": round(s.get("shuffleReadBytes", 0) / 1e6),
                "shuffleWrite_mb": round(s.get("shuffleWriteBytes", 0) / 1e6),
                "memSpill_mb": round(s.get("memoryBytesSpilled", 0) / 1e6),
                "diskSpill_mb": round(s.get("diskBytesSpilled", 0) / 1e6),
                "jvmGcTime_s": round(s.get("jvmGcTime", 0) / 1e3, 1),
            }
            for s in _stages(spark)
            if s.get("shuffleReadBytes", 0) > 50e6
            or s.get("shuffleWriteBytes", 0) > 50e6
        ]
        big.sort(key=lambda s: -s["shuffleRead_mb"])
        rec["x100_big_stages"] = big[:6]
    except Exception as exc:  # UI capture is best-effort, like repro_x100
        rec["x100_profile_error"] = str(exc)
    # Append, don't overwrite (ADVICE r09): the round-9 sizing probes
    # overwrote this fixed path, so only the final 0.145 record kept
    # committed provenance out of the cited 0.145-0.159 pair. Legacy
    # single-record files are folded into the list on first append.
    out = os.path.join(REPO, "bench_runs", "skew_x100_probe.json")
    doc: dict = {"probes": []}
    if os.path.exists(out):
        with open(out) as fh:
            prev = json.load(fh)
        doc = prev if "probes" in prev else {"probes": [prev]}
    doc["probes"].append(rec)
    with open(out, "w") as fh:
        json.dump(doc, fh, indent=1)
    print(json.dumps(rec["row"], indent=1))
    print("wrote", out)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
