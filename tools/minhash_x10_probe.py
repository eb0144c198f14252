"""Round-12 adjudication probe for the BENCH_r11 MinHash 10x outlier.

BENCH_r11's ``dedup_minhash_lsh`` slope_vs_linear (the 10x arm) read
1.07 — far outside the frozen band [0.25, 0.6] — while all ten
round-11 in-session runs read 0.32–0.51 and the engine package had a
+9/−6 docstring-only delta. VERDICT r11 task 1 prescribes a quiet
fresh-JVM reproduction of the exact 10x arm before the artifact can
be annotated and committed: each repetition runs the identical
``bench._scale_row`` protocol (warm, 3 interleaved 1x/10x adjacent
pairs, min both sides, per-point load snapshot) on the same
disjoint-content corpora (docs_dj1 / docs_dj10 — constant duplicate
multiplicity, see bench.py SCALE_QUERIES note), each repetition in
its own right-after-startup JVM session.

Appends one record per invocation into a ``probes`` list in
bench_runs/minhash_x10_probe.json (append, not overwrite — ADVICE
r09: every cited probe reading must keep committed provenance).

Usage: python tools/minhash_x10_probe.py [reps]
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

OUT = os.path.join(REPO, "bench_runs", "minhash_x10_probe.json")


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    qs = all_queries()
    mq = qs["dedup_minhash_lsh"]
    rows = []
    for i in range(reps):
        spark = get_spark(app_name=f"minhash-x10-probe-{i}")
        try:
            dj1 = bench._ensure_docs_disjoint_xn(spark, 1, "docs_dj1")
            dj10 = bench._ensure_docs_disjoint_xn(spark, 10, "docs_dj10")
            if not (dj1 and dj10):
                print("corpora unavailable", file=sys.stderr)
                return 1
            row = bench._scale_row(
                lambda: bench._run_noop(mq.build(spark, dj1)),
                lambda: bench._run_noop(mq.build(spark, dj10)),
            )
            rows.append(row)
            print(f"rep {i}: {json.dumps(row)}")
        finally:
            spark.stop()
    rec = {
        "reps": rows,
        "slopes": [r["slope_vs_linear"] for r in rows],
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
