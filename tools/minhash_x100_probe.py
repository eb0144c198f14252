"""Round-10 adjudication probe for the MinHash x100 band floor.

BENCH_r09's ``dedup_minhash_lsh`` slope_x100_vs_linear read 0.149 —
0.001 under the quoted floor [0.15, 0.35] and the minimum of all 21
round-9 observations (the 20 committed run records span 0.189–0.286).
The family also swung 0.277 (r8 driver) → 0.149 (r9 driver), the
widest round-over-round swing of any family, so VERDICT r09 task 3
asks for a dedicated probe BEFORE any floor move: three interleaved
fresh-JVM repetitions of the exact ``_x100_specs`` minhash entry
(disjoint-content corpora docs_dj1 / docs_dj100, bench._x100_row
protocol — warm, 3 interleaved 1x/100x pairs, min both sides), each
repetition in its own right-after-startup session, with the per-rep
load snapshot.

Appends one record per invocation into a ``probes`` list in
bench_runs/minhash_x100_probe.json (append, not overwrite — ADVICE
r09: every cited probe reading must keep committed provenance).

Usage: python tools/minhash_x100_probe.py [reps]
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")

import bench  # noqa: E402
from map_reduce_implementation_spark.session import get_spark  # noqa: E402
from map_reduce_implementation_spark.suite import all_queries  # noqa: E402

OUT = os.path.join(REPO, "bench_runs", "minhash_x100_probe.json")


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    qs = all_queries()
    setup = dict(bench._x100_specs(qs))["dedup_minhash_lsh"]
    rows = []
    for i in range(reps):
        spark = get_spark(app_name=f"minhash-x100-probe-{i}")
        try:
            builds = setup(spark)
            if builds is None:
                print("corpora unavailable", file=sys.stderr)
                return 1
            row = bench._x100_row(*builds)
            rows.append(row)
            print(f"rep {i}: {json.dumps(row)}")
        finally:
            spark.stop()
    rec = {
        "reps": rows,
        "slopes": [r["slope_x100_vs_linear"] for r in rows],
    }
    doc: dict = {"probes": []}
    if os.path.exists(OUT):
        with open(OUT) as fh:
            doc = json.load(fh)
    doc.setdefault("probes", []).append(rec)
    with open(OUT, "w") as fh:
        json.dump(doc, fh, indent=1)
    print("slopes:", rec["slopes"])
    print("wrote", OUT)
    return 0


if __name__ == "__main__":
    sys.exit(main())
