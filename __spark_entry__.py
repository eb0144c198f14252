"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (the reference's letter counter,
Catalyst-planned) on sf0.001. ``queries()``/``oracle_sql()`` — the full
operator suite from map_reduce_implementation_spark.suite; every
SQL-expressible operator carries a DuckDB oracle twin. Non-SQL ops
(minhash-LSH, simhash, ANN-LSH, mapInPandas decode) are rows-only by
design and cross-checked in tests/ instead.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from map_reduce_implementation_spark.suite import all_queries

_SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: reference letter-counter over documents.text (26 rows,
    A..Z, zero-filled — SURVEY.md §2.4 A1/A2 pipeline, Spark-native)."""
    qs = all_queries()
    return qs["letter_counter"].build(spark, _SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.build for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: q.oracle for name, q in all_queries().items() if q.oracle is not None
    }
