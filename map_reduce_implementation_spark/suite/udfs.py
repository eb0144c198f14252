"""User-defined function surface (SURVEY.md §2.10 EXT rows): a Pandas
GROUPED_AGG UDAF, an ``applyInPandas`` grouped-map, and a Spark 4 Python
UDTF — each with a DuckDB oracle twin.

The reference's whole API is two plug-in UDFs (map/reduce function
pointers, mapreduce.h:18-19); this module is the modern equivalent
surface. All three are Arrow-batched where the API allows (GROUPED_AGG
and applyInPandas); the UDTF is row-at-a-time by API design — used for
low-volume expansion, never a 100 TB hot path (the hot-path equivalents
are ``explode``/``regexp_extract_all``, see suite/scalars2.py).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import table
from .base import Query

_SENT_RE = r"[^.!?]+[.!?]*"


def q_udaf_geomean(spark: SparkSession, sf: str) -> DataFrame:
    """Geometric mean of event value per type via a GROUPED_AGG
    pandas_udf (Arrow-batched custom aggregate). Rounded to 6 dp so the
    numpy fold and the oracle's exp(avg(ln)) agree despite summation
    order."""

    @F.pandas_udf("double")
    def geomean(v: pd.Series) -> float:
        return float(np.exp(np.log(v.to_numpy(np.float64)).mean()))

    ev = table(spark, sf, "events").filter(F.col("value") > 0)
    # NB: a GROUPED_AGG pandas UDF cannot share an agg with built-in
    # aggregate functions (INVALID_PANDAS_UDF_PLACEMENT) — single column.
    # value > 0: the geometric mean is defined on positives (sf0.1 has
    # zero-valued events; ln(0) errors in the oracle, -inf in numpy).
    return ev.groupBy("event_type").agg(
        F.round(geomean("value"), 6).alias("geomean_value")
    )


SQL_UDAF_GEOMEAN = """
SELECT event_type,
  ROUND(exp(AVG(ln(value))), 6) AS geomean_value
FROM events WHERE value > 0 GROUP BY event_type
"""


CENTROID_SCHEMA = "label long, c_first double, c_last double, c_norm double, n_vectors long"


def q_grouped_map_centroids(spark: SparkSession, sf: str) -> DataFrame:
    """Per-label embedding centroid via ``applyInPandas`` (grouped-map:
    one pandas frame per group, numpy mean over the stacked vectors).
    The custom-UDAF shape used when the aggregate is a whole ndarray,
    not a scalar. At scale: one shuffle on the group key, group state
    bounded by group size × dim. Output is scalar summaries of the
    centroid (first/last dim + L2 norm of the round-6 centroid) — the
    driver's canonicalizer requires scalar cells."""

    def centroid(pdf: pd.DataFrame) -> pd.DataFrame:
        m = np.stack(pdf["embedding"].to_numpy()).astype(np.float64).mean(axis=0)
        m = np.round(m, 6)
        return pd.DataFrame(
            {
                "label": [pdf["label"].iloc[0]],
                "c_first": [float(m[0])],
                "c_last": [float(m[-1])],
                "c_norm": [round(float(np.sqrt((m * m).sum())), 6)],
                "n_vectors": [len(pdf)],
            }
        )

    e = table(spark, sf, "embeddings")
    return e.groupBy("label").applyInPandas(centroid, CENTROID_SCHEMA)


SQL_GROUPED_MAP_CENTROIDS = """
WITH ex AS (
  SELECT label, i, CAST(embedding[i] AS DOUBLE) AS v, len(embedding) AS dim
  FROM embeddings, range(1, 100000) r(i)
  WHERE i <= len(embedding)
),
av AS (
  SELECT label, i, ROUND(AVG(v), 6) AS m, MAX(dim) AS dim FROM ex GROUP BY label, i
),
n AS (
  SELECT label, COUNT(*) AS n_vectors FROM embeddings GROUP BY label
)
SELECT av.label,
  MAX(CASE WHEN av.i = 1 THEN av.m END) AS c_first,
  MAX(CASE WHEN av.i = av.dim THEN av.m END) AS c_last,
  ROUND(sqrt(SUM(av.m * av.m)), 6) AS c_norm,
  n.n_vectors
FROM av JOIN n ON av.label = n.label
GROUP BY av.label, n.n_vectors
"""


def q_udtf_sentences(spark: SparkSession, sf: str) -> DataFrame:
    """Python UDTF (Spark 4 table function): one row per sentence with
    its position — the UDTF expansion surface, lateral-joined per doc."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, sentence string")
    class SplitSentences:
        def eval(self, text: str):
            parts = [p.strip() for p in re.findall(_SENT_RE, text or "")]
            pos = 0
            for p in parts:
                if p:
                    yield pos, p
                    pos += 1

    spark.udtf.register("split_sentences", SplitSentences)
    table(spark, sf, "documents").createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        "SELECT doc_id, s.pos, s.sentence "
        "FROM _udtf_docs, LATERAL split_sentences(text) s"
    )


SQL_UDTF_SENTENCES = f"""
WITH s AS (
  SELECT doc_id, regexp_extract_all(text, '{_SENT_RE}') AS parts FROM documents
),
x AS (
  SELECT doc_id, i, trim(parts[i]) AS sentence
  FROM s, range(1, 100000) r(i)
  WHERE i <= len(parts) AND trim(parts[i]) <> ''
)
SELECT doc_id,
  CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY i) - 1 AS INTEGER) AS pos,
  sentence
FROM x
"""


QUERIES: dict[str, Query] = {
    "udaf_geomean": Query(q_udaf_geomean, SQL_UDAF_GEOMEAN),
    "grouped_map_centroids": Query(q_grouped_map_centroids, SQL_GROUPED_MAP_CENTROIDS),
    "udtf_sentences": Query(q_udtf_sentences, SQL_UDTF_SENTENCES),
}
