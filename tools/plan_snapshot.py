"""Plan-fingerprint snapshot: record scale-relevant physical-plan
properties for EVERY suite query, so a regression (a broadcast join
silently becoming sort-merge, an extra shuffle, a JVM expression falling
back to Python) fails tests even when row-level correctness still passes.

Usage:
    python tools/plan_snapshot.py            # regenerate PLAN_SNAPSHOT.json
    pytest tests/test_plan_snapshot.py       # compare current vs committed

The fingerprint counts operators, never ids/sizes, so it is stable
across runs and scale factors; plans are built (not executed) at sf0.01.
"""

from __future__ import annotations

import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SNAPSHOT_PATH = os.path.join(REPO, "PLAN_SNAPSHOT.json")
SF_DIR = os.environ.get("SPARK_GRAFT_SNAPSHOT_SF", "/root/testdata/sf0.01")

# these queries intentionally run Python kernels (Arrow-batched Pandas
# UDF / UDTF / mapInPandas / mapInArrow / applyInPandas) — anything NOT
# listed must stay JVM-only (enforced in tests/test_plan_snapshot.py)
PYTHON_OK = {
    "udaf_geomean",
    "udtf_sentences",
    "grouped_map_centroids",
    "multimodal_decode_dispatch",
    "multimodal_resize",
    "multimodal_features",
    "text_winnow_fingerprint",
    "multimodal_audio_decode",
    "multimodal_png_roundtrip",
    "multimodal_wav_roundtrip",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_semantic",
    "dedup_semantic_graded",
    "letter_counter",
    # cosine_pairs gemm candidate kernel (sketch-then-verify; exact
    # sims recomputed JVM-side — see operators/similarity.py)
    "similarity_cosine_pairs",
    "dedup_embedding_cosine",
    "similarity_threshold_sweep",
    "split_leakage_audit",
}


def fingerprint(plan_text: str) -> dict:
    def n(pat: str) -> int:
        return len(re.findall(pat, plan_text))

    return {
        "shuffles": n(r"\(\d+\) Exchange\b"),
        "broadcasts": n(r"\(\d+\) BroadcastExchange\b"),
        "sort_merge_joins": n(r"\(\d+\) SortMergeJoin\b"),
        "broadcast_joins": n(r"\(\d+\) Broadcast(?:Hash|NestedLoop)Join\b"),
        "cartesian": n(r"\(\d+\) CartesianProduct\b"),
        "python_evals": n(r"\(\d+\) (?:Batch|Arrow)EvalPython\b"),
        "map_in_arrow": n(r"MapInArrow|PythonMapInArrow"),
        "map_in_pandas": n(r"MapInPandas|FlatMapGroupsInPandas|MapInBatch"),
        "python_udtf": n(r"\(\d+\) BatchEvalPythonUDTF\b"),
        "agg_in_pandas": n(r"AggregateInPandas"),
        "scans": n(r"Scan parquet|Scan text|Scan orc|Scan ExistingRDD"),
        "take_ordered": n(r"\(\d+\) TakeOrderedAndProject\b"),
    }


def build_snapshot() -> dict[str, dict]:
    sys.path.insert(0, REPO)
    import __spark_entry__ as entry
    from map_reduce_implementation_spark.plans import explain_str
    from map_reduce_implementation_spark.session import get_spark

    spark = get_spark(app_name="plan_snapshot", master="local[4]", shuffle_partitions=8)
    snap: dict[str, dict] = {}
    for name, fn in entry.queries().items():
        try:
            df = fn(spark, SF_DIR)
            snap[name] = fingerprint(explain_str(df, "formatted"))
        except Exception as ex:  # noqa: BLE001 — record, don't abort the sweep
            snap[name] = {"error": str(ex)[:200]}
    return snap


if __name__ == "__main__":
    snap = build_snapshot()
    with open(SNAPSHOT_PATH, "w") as f:
        json.dump(snap, f, indent=1, sort_keys=True)
        f.write("\n")
    bad = {k: v for k, v in snap.items() if "error" in v}
    print(f"wrote {SNAPSHOT_PATH}: {len(snap)} queries, {len(bad)} errors")
    for k, v in bad.items():
        print("  ERROR", k, v["error"])
