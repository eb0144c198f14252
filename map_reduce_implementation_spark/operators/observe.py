"""Pipeline observability — ``df.observe`` data-quality metrics.

A 100 TB pipeline cannot afford a second pass to count rows / nulls /
ranges, and driver-side ``df.count()`` calls multiply scans. Spark's
Observation API piggybacks aggregate metrics onto the ACTION that
already runs: metrics are folded task-side and merged on the driver at
zero extra scan cost. (The reference's only observability is the wall
clock + worker PIDs in MAPREDUCE_RESULT, mapreduce.h:23-29 — EXT.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observe_quality(
    df: DataFrame, cols: list[str], name: str = "quality"
) -> tuple[DataFrame, Observation]:
    """Attach standard data-quality metrics for ``cols``: total rows plus
    per-column null counts. Returns (df, observation); read
    ``observation.get`` AFTER an action has run the returned df.
    """
    obs = Observation(name)
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        metrics.append(F.sum(F.col(c).isNull().cast("long")).alias(f"null_{c}"))
    return df.observe(obs, *metrics), obs
