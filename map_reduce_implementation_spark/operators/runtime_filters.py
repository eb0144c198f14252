"""Runtime (adaptive) join pruning — Spark's injected bloom-filter
semi-join. When a selective filter sits on one side of a shuffle join,
Spark can build a bloom filter of the surviving join keys and push it
into the OTHER side's scan, skipping rows (and whole row groups) before
the shuffle. At 100 TB this is the difference between shuffling the
full fact table and shuffling only the ~matching slice.

Off by default under the local-mode thresholds (the application side
must look big enough to be worth filtering); `enable_runtime_bloom`
sets the confs a big-cluster deployment would use. Plan-asserted in
tests/test_plans.py — correctness is unchanged either way, which is
exactly why only a plan test can see it.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import SparkSession

_BLOOM_CONFS = {
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    # on a real cluster leave this at its 10GB default; locally the test
    # fixtures are tiny so the injection gate must be opened explicitly
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
}


def enable_runtime_bloom(spark: SparkSession) -> None:
    for k, v in _BLOOM_CONFS.items():
        spark.conf.set(k, v)


@contextmanager
def runtime_bloom(spark: SparkSession):
    """Scoped enable: restores prior conf values on exit."""
    old = {}
    for k in _BLOOM_CONFS:
        try:
            old[k] = spark.conf.get(k)
        except Exception:  # noqa: BLE001 — unset conf
            old[k] = None
    enable_runtime_bloom(spark)
    try:
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
