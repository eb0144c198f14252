"""Round-13 root-cause probe for the MinHash 10x 32-thread inflation.

BENCH_r12's ``dedup_minhash_lsh`` slope_vs_linear read **0.933** at 32
cores (t10 min-of-3 = 16.2 s) — the SECOND consecutive driver
out-of-band reading for this arm (r11: 1.07) — while the SAME driver
session's 8-core control read 0.427 (mid-band) and all six builder
runs read 0.358–0.408. VERDICT r12 item 2 demands a root cause, not a
third annotation: something about the 10x point inflates ~2.5x ONLY
in the driver's 32-thread sessions, which share the host with the
driver harness itself (the crowding the r12 untouched-query inflation
pattern already points at).

This probe reproduces the suspected regime deliberately:

- ``--load N`` spawns N busy-loop CPU burner processes for the
  duration of the measured points, oversubscribing the host the way a
  concurrent driver-harness process does;
- ``--thrash N`` spawns N memory-bandwidth burner processes (each
  continuously memcpy-ing a 512 MB buffer) — the co-tenant regime that
  TURNED OUT to be the root cause: pure CPU oversubscription inflates
  the short scheduling-bound 1x point MORE than the 10x point (slope
  goes DOWN, 0.27–0.31 measured), while memory-bandwidth contention
  selectively inflates the bandwidth-bound 10x shuffle/estimate stages
  2–3x (raw samples 8–17 s vs 6.1–7.1 quiet) and the cache-resident
  1x point barely (1.8–2.1 s vs 1.5) — reproducing the driver's exact
  signature (x1 1.74 / x10 16.25, slope 0.933);
- every repetition records the RAW interleaved samples (t1s / t10s,
  not just the min) plus per-point /proc/loadavg snapshots, so the
  record shows whether inflation is a persistent regime (all three
  samples high → min-of-3 cannot escape) or a spike;
- ``--decompose`` additionally times the signature-build sub-pipeline
  (minhash_signatures_arrow → noop) at both scales in the same
  session, attributing the inflation to the Python/Arrow signature
  stage vs the JVM banding+estimate stages.

Protocol otherwise matches bench._scale_row exactly: fresh
right-after-startup JVM per repetition, warm-up, 3 interleaved 1x/10x
adjacent pairs on the disjoint-content corpora (docs_dj1 / docs_dj10).

Appends one record per invocation into a ``probes`` list in
bench_runs/minhash_x10_probe2.json (append, not overwrite — ADVICE
r09: every cited probe reading must keep committed provenance).

Usage:
    python tools/minhash_x10_probe2.py [reps] [--load N] [--decompose]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")

import bench  # noqa: E402
from map_reduce_implementation_spark.session import get_spark  # noqa: E402
from map_reduce_implementation_spark.suite import all_queries  # noqa: E402

OUT = os.path.join(REPO, "bench_runs", "minhash_x10_probe2.json")

_BURNER = "import itertools\nfor _ in itertools.count():\n    pass\n"
_BURSTER = (
    "import time, threading\n"
    "def spin(stop):\n"
    "    while time.time() < stop:\n"
    "        pass\n"
    "while True:\n"
    "    stop = time.time() + 4.0\n"
    "    ts = [threading.Thread(target=spin, args=(stop,)) for _ in range(32)]\n"
    "    [t.start() for t in ts]; [t.join() for t in ts]\n"
    "    time.sleep(3.0)\n"
)
_THRASHER = (
    "import numpy as np\n"
    "a = np.ones(64*1024*1024, dtype=np.int64)\n"  # 512 MB
    "b = np.empty_like(a)\n"
    "while True:\n"
    "    np.copyto(b, a); np.copyto(a, b)\n"
)


class _Burners:
    """N CPU busy-loop + M memory-bandwidth processes, alive inside the
    context."""

    def __init__(self, n: int, n_thrash: int = 0, n_burst: int = 0):
        self.n = n
        self.n_thrash = n_thrash
        self.n_burst = n_burst
        self.procs: list[subprocess.Popen] = []

    def __enter__(self):
        for src, count in (
            (_BURNER, self.n),
            (_THRASHER, self.n_thrash),
            (_BURSTER, self.n_burst),
        ):
            for _ in range(count):
                self.procs.append(
                    subprocess.Popen(
                        [sys.executable, "-c", src],
                        stdout=subprocess.DEVNULL,
                        stderr=subprocess.DEVNULL,
                    )
                )
        if self.procs:
            time.sleep(3)  # let loadavg start moving before measuring
        return self

    def __exit__(self, *exc):
        for p in self.procs:
            p.kill()
        for p in self.procs:
            p.wait()
        return False


def _scale_row_raw(build1, build10, pairs: int = 3) -> dict:
    """bench._scale_row with the raw samples kept in the record."""
    load0 = bench._load_snapshot()
    build1()
    t0 = time.perf_counter()
    build10()
    t10_cold = time.perf_counter() - t0
    t1s, t10s, loads = [], [], []
    for _ in range(pairs):
        t0 = time.perf_counter()
        build1()
        t1s.append(round(time.perf_counter() - t0, 4))
        t0 = time.perf_counter()
        build10()
        t10s.append(round(time.perf_counter() - t0, 4))
        loads.append(bench._load_snapshot())
    t1, t10 = min(t1s), min(t10s)
    return {
        "sec_x1": round(t1, 4),
        "sec_x10_cold": round(t10_cold, 4),
        "sec_x10": round(t10, 4),
        "slope_vs_linear": round(t10 / (10 * t1), 3),
        "t1s_raw": t1s,
        "t10s_raw": t10s,
        "load_before": load0,
        "loads_per_pair": loads,
    }


def main() -> int:
    args = [a for a in sys.argv[1:]]
    decompose = "--decompose" in args
    if decompose:
        args.remove("--decompose")
    n_load = 0
    if "--load" in args:
        i = args.index("--load")
        n_load = int(args[i + 1])
        del args[i : i + 2]
    n_thrash = 0
    if "--thrash" in args:
        i = args.index("--thrash")
        n_thrash = int(args[i + 1])
        del args[i : i + 2]
    n_burst = 0
    if "--burst" in args:
        i = args.index("--burst")
        n_burst = int(args[i + 1])
        del args[i : i + 2]
    reps = int(args[0]) if args else 3

    qs = all_queries()
    mq = qs["dedup_minhash_lsh"]
    rows = []
    for i in range(reps):
        spark = get_spark(app_name=f"minhash-x10-probe2-{i}")
        try:
            dj1 = bench._ensure_docs_disjoint_xn(spark, 1, "docs_dj1")
            dj10 = bench._ensure_docs_disjoint_xn(spark, 10, "docs_dj10")
            if not (dj1 and dj10):
                print("corpora unavailable", file=sys.stderr)
                return 1
            with _Burners(n_load, n_thrash, n_burst):
                row = _scale_row_raw(
                    lambda: bench._run_noop(mq.build(spark, dj1)),
                    lambda: bench._run_noop(mq.build(spark, dj10)),
                )
                if decompose:
                    from map_reduce_implementation_spark.operators.dedup import (
                        minhash_signatures_arrow,
                    )
                    from map_reduce_implementation_spark.suite.dedup import _shingles

                    def sig1():
                        bench._run_noop(
                            minhash_signatures_arrow(_shingles(spark, dj1, 5), 128)
                        )

                    def sig10():
                        bench._run_noop(
                            minhash_signatures_arrow(_shingles(spark, dj10, 5), 128)
                        )

                    row["sig_only"] = _scale_row_raw(sig1, sig10)
            row["n_load"] = n_load
            row["n_thrash"] = n_thrash
            row["n_burst"] = n_burst
            rows.append(row)
            print(f"rep {i}: {json.dumps(row)}")
        finally:
            spark.stop()
    rec = {
        "n_load": n_load,
        "n_thrash": n_thrash,
        "n_burst": n_burst,
        "decompose": decompose,
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
