"""Table sources over the TESTDATA star schema (TESTDATA.md).

The reference supports exactly one source — a splittable local text file
(mapreduce.c:19-30; see jobs.letter_counter.read_lines). The engine adds
the full Spark source surface: parquet (primary), csv, json, orc, text.

Scale notes (100 TB):
- Parquet scans get predicate pushdown + column pruning from Catalyst
  for free — verified in plans/audit.py (``PushedFilters``/``ReadSchema``).
- ``spark.sql.files.maxPartitionBytes`` (default 128 MB) governs scan
  parallelism; at 100 TB that is ~800k tasks — AQE coalesces after
  filters. No per-table tuning is hard-coded here on purpose.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one star-schema table (parquet, columnar, splittable)."""
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        return _events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet stores ``ts`` as INT64 TIMESTAMP(NANOS), which the
    Spark 4 parquet reader rejects outright (PARQUET_TYPE_ILLEGAL). Read
    nanos as raw long via the legacy conf, then truncate to microsecond
    timestamps — the same truncation DuckDB applies, so oracle-equal."""
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    # integer DIV, not `/`: double division loses precision at 1e18 ns
    return df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for the SQL surface."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)


def read_text(spark: SparkSession, path: str) -> DataFrame:
    """Line-oriented text source (the reference's only source, S1/S2)."""
    return spark.read.text(path)


def read_csv(spark: SparkSession, path: str, **options) -> DataFrame:
    return spark.read.options(header="true", inferSchema="true", **options).csv(path)


def read_json(spark: SparkSession, path: str, **options) -> DataFrame:
    return spark.read.options(**options).json(path)


def read_orc(spark: SparkSession, path: str, **options) -> DataFrame:
    return spark.read.options(**options).orc(path)


def write_orc(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").orc(path)


def read_xml(spark: SparkSession, path: str, row_tag: str = "row", **options) -> DataFrame:
    """Built-in XML datasource (Spark 4)."""
    return spark.read.format("xml").option("rowTag", row_tag).options(**options).load(path)


def write_xml(df: DataFrame, path: str, row_tag: str = "row", root_tag: str = "rows") -> None:
    df.write.format("xml").option("rowTag", row_tag).option(
        "rootTag", root_tag
    ).mode("overwrite").save(path)


def avro_available(spark: SparkSession) -> bool:
    """The Avro DataSource lives in the external spark-avro module
    (--packages org.apache.spark:spark-avro_2.13:<ver> on a cluster);
    the bare pyspark wheel ships only the Avro format jars, not the
    datasource, so reads/writes are gated on a cheap probe."""
    try:
        spark.read.format("avro").schema("x int").load("/nonexistent__probe__")
        return True
    except Exception as ex:  # noqa: BLE001 — classify by message
        return "Failed to find data source" not in str(ex)


def read_avro(spark: SparkSession, path: str, **options) -> DataFrame:
    return spark.read.format("avro").options(**options).load(path)


def write_avro(df: DataFrame, path: str) -> None:
    df.write.format("avro").mode("overwrite").save(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
) -> None:
    """Bucketed managed table — the co-located-join primitive.

    Two tables bucketed by the same key into the same bucket count join
    WITHOUT a shuffle exchange on either side (asserted in
    tests/test_plans.py): at 100 TB this turns every recurring
    fact-to-fact join on the bucket key into a zero-shuffle map-side
    join, the single biggest cost lever for repeated pipelines. Spark
    bucketing = hive-compatible hash partitioning persisted in the table
    metadata (the reference has no storage layer at all — EXT)."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table_name)


def write_parquet(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """Parquet sink. ``partition_by`` → hive-style partition pruning on read."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_single_text_file(df: DataFrame, path: str) -> None:
    """Reference-parity sink: ONE text file like mr.rst (mapreduce.c:153-157).

    ``coalesce(1)`` — only for small final results; never on 100 TB paths.
    """
    df.coalesce(1).write.mode("overwrite").text(path)
