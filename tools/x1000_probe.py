"""Round-11 third-decade (x1000) feasibility probe — the two cheapest
scaling arms.

VERDICT r10 optional task 7: all eleven families are priced at 10x and
100x; one probe of the two best-scaling arms at x1000 anchors the
extrapolation for the 100 TB claim. The two arms (round-11-run-1
second-decade slopes): ``similarity_two_stage_retrieval`` 0.019 and
``dedup_semantic`` 0.026.

Corpus: ``.bench_data/emb_x1000`` = 10 vec_id-shifted copies of the
existing x100 embeddings corpus (stride 1e9 — clear of the x100
corpus's own 10M-stride ids, max ~990M), i.e. 2,000,000 x 64-dim
vectors. Each copy past the first is a per-dimension SIGN-FLIP
isometry (s(i,d) = ±1 from hash parity of i·64+d): norms and all
within-copy cosines are preserved exactly, while two different flip
patterns decorrelate vectors (expected cross-copy cosine ~0), so the
corpus holds 10 x 2,000 = 20,000 DISTINCT directions, each with 100
exact duplicates — the same ~2.5 directions / 100 dups ≈ 250 rows
per cell occupancy the banded x100 arm prices (2,000 directions over
k=800). A naive 10x exact copy CANNOT satisfy the fixed-cell-size
contract at this decade: sf0.1 has only 2,000 distinct vectors, so
past k=2,000 identical copies pile 1,000-deep into one cell and the
per-cell scan (one applyInPandas gemm per cell) goes quadratic in
multiplicity — the first probe attempt OOM-killed the JVM exactly
there. Real pipelines exact-dedup first; a real 1000x corpus grows
distinct content, which is what the isometric shards model.

Protocol: bench._x100_row verbatim (fresh right-after-startup session
per family, warm both sides, 3 interleaved 1x/Nx adjacent pairs, min
over each side, per-point load snapshot) — only the slope divisor
changes (1000, recomputed here from the row's 4-decimal-rounded
seconds as _x100_row reports them; the ~1e-4 relative rounding
effect is negligible at slope magnitudes of 0.05–0.10). k and
cells scale with the corpus exactly as the banded arms do (fixed
target cell size, SemDeDup's own protocol): k = cells = 8000 at
x1000. Quantizer centroids (800 distinct-direction rows per shard —
bench._SEM_CENTS / _TS_STATE's first-k convention generalized per
shard) and the fixed 1x query batch are built OUTSIDE the timed
region.

Per the frozen-band policy, a single probe creates NO new band — the
record is extrapolation evidence only (README cites it).

Appends one record per invocation into a ``probes`` list in
bench_runs/x1000_probe.json.

Usage: python tools/x1000_probe.py
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

OUT = os.path.join(REPO, "bench_runs", "x1000_probe.json")
X1000_DIR = os.path.join(REPO, ".bench_data", "emb_x1000")
K_X1000 = 8000  # fixed target cell size: 2M rows / 8000 cells = 250/cell


def _ensure_emb_x1000(spark) -> bool:
    """10 sign-flip-isometric shards of the x100 embeddings corpus.
    The x100 corpus already uses bench._ensure_xn's 10M id stride
    (max id ~990M+1999), so the shard stride is 1e9 — identities stay
    distinct. Shard i > 0 multiplies dimension d by ±1 from the hash
    parity of i·64+d (see module docstring for why exact copies are
    structurally impossible at this decade)."""
    path = os.path.join(X1000_DIR, "embeddings.parquet")
    if os.path.exists(path):
        return True
    if not bench._ensure_embs_xn(spark, 100, "docs_x100"):
        return False
    from functools import reduce

    from pyspark.sql import functions as F

    base = spark.read.parquet(
        os.path.join(REPO, ".bench_data", "docs_x100", "embeddings.parquet")
    )
    vec_type = base.schema["embedding"].dataType
    cols = base.columns

    def shard(i: int):
        df = base.select(
            *[
                (F.col("vec_id") + F.lit(i * 1_000_000_000)).alias("vec_id")
                if c == "vec_id"
                else F.col(c)
                for c in cols
            ]
        )
        if i == 0:
            return df
        flip = F.transform(
            "embedding",
            lambda x, d: x
            * F.when(
                F.pmod(F.hash(d + F.lit(i * 64)), F.lit(2)) == 0, F.lit(1.0)
            ).otherwise(F.lit(-1.0)),
        ).cast(vec_type)
        return df.withColumn("embedding", flip)

    dfn = reduce(lambda a, b: a.unionByName(b), [shard(i) for i in range(10)])
    dfn.write.mode("overwrite").parquet(path)
    return True


def _x1000_centroids(spark, k: int) -> list[list[float]]:
    """k distinct-direction centroids: the first k/10 base vec_ids of
    each shard's first sub-copy (the x100 arm's own first-k convention,
    generalized per shard — first-8000-by-vec_id would land entirely in
    shard 0, whose 100 exact sub-copies hold only 2,000 distinct
    directions, recreating the pileup)."""
    from pyspark.sql import functions as F

    per_shard = k // 10
    emb = spark.read.parquet(os.path.join(X1000_DIR, "embeddings.parquet"))
    rows = (
        emb.filter(
            (F.pmod("vec_id", F.lit(1_000_000_000)) < per_shard)
            & (F.pmod("vec_id", F.lit(1_000_000_000)) == F.pmod("vec_id", F.lit(10_000_000)))
        )
        .orderBy("vec_id")
        .select("embedding")
        .collect()
    )
    return [[float(x) for x in r["embedding"]] for r in rows]


def _semantic_builds(spark, cents):
    from map_reduce_implementation_spark.operators.dedup import semantic_dedup

    def b1000():
        emb = spark.read.parquet(os.path.join(X1000_DIR, "embeddings.parquet"))
        bench._run_noop(
            semantic_dedup(emb, k=K_X1000, threshold=0.4, centroids=cents)
        )

    return (
        lambda: bench._run_noop(
            bench._semantic_scale_df(spark, bench.SF_DIR, bench.SEM_SCALE_K[1])
        ),
        b1000,
    )


def _retrieval_builds(spark, cents):
    from pyspark.sql import functions as F

    from map_reduce_implementation_spark.operators.similarity import _as_double
    from map_reduce_implementation_spark.suite.pipeline3 import (
        TS_QMOD,
        TS_QREM,
        two_stage_retrieval,
    )

    qs = (
        spark.read.parquet(os.path.join(bench.SF_DIR, "embeddings.parquet"))
        .filter(F.col("vec_id") % TS_QMOD == TS_QREM)
        .select(F.col("vec_id").alias("qid"), _as_double("embedding").alias("qv"))
    )

    def b1000():
        corpus = spark.read.parquet(
            os.path.join(X1000_DIR, "embeddings.parquet")
        )
        bench._run_noop(
            two_stage_retrieval(spark, corpus, qs, cents, assign_gemm_threshold=0)
        )

    return (
        lambda: bench._run_noop(
            bench._two_stage_scale_df(spark, bench.SF_DIR, bench.TS_SCALE_CELLS[1])
        ),
        b1000,
    )


def main() -> int:
    spark = get_spark(app_name="x1000-corpus-build")
    try:
        if not _ensure_emb_x1000(spark):
            print("corpus unavailable", file=sys.stderr)
            return 1
    finally:
        spark.stop()

    rec: dict = {"k_x1000": K_X1000, "families": {}}
    for fam, mk in (
        ("dedup_semantic", _semantic_builds),
        ("similarity_two_stage_retrieval", _retrieval_builds),
    ):
        # cap Arrow batches so the per-task batch x k=8000 distance
        # matrix in the assignment gemm stays ~128 MB (2000 x 8000 f8),
        # not 640 MB at the 10k default — 32 concurrent tasks.
        spark = get_spark(
            app_name=f"x1000-probe-{fam}",
            extra_conf={"spark.sql.execution.arrow.maxRecordsPerBatch": "2000"},
        )
        try:
            cents = _x1000_centroids(spark, K_X1000)
            row = bench._x100_row(*mk(spark, cents))
            # _x100_row's slope divisor is 100; the third decade is 1000.
            # Rename EVERY x100-suffixed key, not just sec_x100 —
            # leaving sec_x1_x100ses/load_x100 beside sec_x1000 misled
            # downstream readers of x1000_probe.json (ADVICE r11).
            row["sec_x1000"] = row.pop("sec_x100")
            row["sec_x1_x1000ses"] = row.pop("sec_x1_x100ses")
            if "load_x100" in row:
                row["load_x1000"] = row.pop("load_x100")
            row["slope_x1000_vs_linear"] = round(
                row["sec_x1000"] / (1000 * row["sec_x1_x1000ses"]), 4
            )
            del row["slope_x100_vs_linear"]
            rec["families"][fam] = row
            print(fam, json.dumps(row))
        finally:
            spark.stop()

    doc: dict = {"probes": []}
    if os.path.exists(OUT):
        with open(OUT) as fh:
            doc = json.load(fh)
    doc.setdefault("probes", []).append(rec)
    with open(OUT, "w") as fh:
        json.dump(doc, fh, indent=1)
    print("wrote", OUT)
    return 0


if __name__ == "__main__":
    sys.exit(main())
