"""Round-10 skew evidence, nastier regime: hot fraction 50%.

The round-9 skew family priced the salted join on a corpus where ONE
hot key owns ~25% of the fact rows (bench._ensure_skew_xn, selector
pmod(hash,4)==0). VERDICT r09 optional task 6 asks whether the
mitigation still holds at the nastier end: same corpus builder, one
knob — selector modulus 2, so the hot key owns ~50% of all facts.

Three variants on the 10x corpus (skew50_x10 lineitem joined to
rel_x10 orders, auto-broadcast off — both-sides-large regime, same as
the banded family):

  plain_skew_off — raw straggler: one reducer task owns ~half the
                   fact side; stage time ~= that task's time.
  salted_n8      — operators/skew.salted_join at the registry default.
  salted_n16     — the production response to a hotter key: double the
                   salt count, halving the per-slot share (~3.1% of
                   facts per (key,salt) slot vs ~6.25% at n8).

Per variant: warm best-of-2 wall seconds plus per-stage task-duration
quantiles (p50/p95/max) from the UI REST API — the max-vs-median split
is the straggler evidence. Appends one record per invocation into a
``probes`` list in bench_runs/skew_hot50_probe.json (append, not
overwrite — ADVICE r09).

Usage: python tools/skew_hot50_probe.py
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
from tools.skew_probe import _measure, _plain_join_df  # noqa: E402

OUT = os.path.join(REPO, "bench_runs", "skew_hot50_probe.json")


def _ensure_skew50_x10(spark) -> str | None:
    """10x skewed lineitem with the hot key owning ~50% of rows —
    bench._ensure_skew_xn's builder with the selector modulus turned
    from 4 to 2 (the 'one knob' VERDICT r09 task 6 specifies)."""
    from pyspark.sql import functions as F

    return bench._ensure_xn(
        spark,
        10,
        "skew50_x10",
        "lineitem.parquet",
        "l_orderkey",
        lambda s: s.read.parquet(
            os.path.join(bench.SF_DIR, "lineitem.parquet")
        ).select("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"),
        mutate=lambda df, i: df.withColumn(
            "l_orderkey",
            F.when(
                F.pmod(F.hash("l_orderkey", "l_linenumber"), F.lit(2)) == 0,
                F.lit(0).cast("bigint"),
            ).otherwise(F.col("l_orderkey")),
        ),
    )


def _salted_df(spark, li_dir: str, orders_dir: str, n_salts: int):
    from pyspark.sql import functions as F

    from map_reduce_implementation_spark.operators.skew import salted_join

    li = spark.read.parquet(os.path.join(li_dir, "lineitem.parquet")).select(
        F.col("l_orderkey").alias("okey"),
        "l_linenumber",
        "l_extendedprice",
        "l_discount",
    )
    orders = spark.read.parquet(
        os.path.join(orders_dir, "orders.parquet")
    ).select(F.col("o_orderkey").alias("okey"), "o_custkey", "o_orderdate")
    return salted_join(li, orders, "okey", n_salts=n_salts)


def main() -> int:
    spark = get_spark(
        app_name="skew-hot50-probe", extra_conf={"spark.ui.enabled": "true"}
    )
    rec: dict = {"load_at_start": bench._load_snapshot(), "hot_fraction": 0.5}
    skew50 = _ensure_skew50_x10(spark)
    rel10 = bench._ensure_rel_xn(spark, 10, "rel_x10")
    if not (skew50 and rel10):
        print("corpora unavailable", file=sys.stderr)
        return 1
    c = spark.conf
    try:
        with bench._no_auto_broadcast(spark):
            c.set("spark.sql.adaptive.skewJoin.enabled", "false")
            try:
                rec["plain_skew_off"] = _measure(
                    spark,
                    lambda: bench._run_noop(_plain_join_df(spark, skew50, rel10)),
                )
                rec["salted_n8"] = _measure(
                    spark, lambda: bench._run_noop(_salted_df(spark, skew50, rel10, 8))
                )
                rec["salted_n16"] = _measure(
                    spark, lambda: bench._run_noop(_salted_df(spark, skew50, rel10, 16))
                )
            finally:
                c.set("spark.sql.adaptive.skewJoin.enabled", "true")
        doc: dict = {"probes": []}
        if os.path.exists(OUT):
            with open(OUT) as fh:
                loaded = json.load(fh)
            # legacy single-record fold guard (mirrors skew_x100_probe.py):
            # an old flat record becomes probes[0] instead of being dropped.
            if isinstance(loaded, dict) and "probes" in loaded:
                doc = loaded
            elif isinstance(loaded, dict):
                doc = {"probes": [loaded]}
        doc.setdefault("probes", []).append(rec)
        with open(OUT, "w") as fh:
            json.dump(doc, fh, indent=1)
        for k in ("plain_skew_off", "salted_n8", "salted_n16"):
            print(k, rec[k]["wall_sec"], rec[k]["wall_samples"])
        print("wrote", OUT)
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
