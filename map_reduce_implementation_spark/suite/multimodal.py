"""Multimodal-column suite — binary payload plumbing + decode stubs
(BASELINE.json north-star; see operators/multimodal.py for the 100 TB
pattern notes)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import (
    decode_stub,
    feature_extract_stub,
    frame_sample_stub,
    resize_stub,
    with_binary_payload,
)
from ..sources import table
from .base import Query


def q_multimodal_metadata(spark: SparkSession, sf: str) -> DataFrame:
    """Binary payload + typed metadata (byte length, content sha256) —
    all JVM-side; the binary column itself is excluded from the result
    so the oracle can hash it."""
    d = with_binary_payload(table(spark, sf, "documents"))
    return d.select("doc_id", "byte_len", "content_sha256")


SQL_MULTIMODAL_METADATA = """
SELECT doc_id,
  CAST(octet_length(encode(text)) AS INTEGER) AS byte_len,
  sha256(text) AS content_sha256
FROM documents
"""


def q_multimodal_decode(spark: SparkSession, sf: str) -> DataFrame:
    """Arrow-batched decode over mapInPandas (deterministic fake kernel —
    real codecs not in container). Rows-only check."""
    return decode_stub(with_binary_payload(table(spark, sf, "documents")))


def q_multimodal_frame_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Frame-offset sampling (video-style) — posexplode of byte offsets."""
    return frame_sample_stub(with_binary_payload(table(spark, sf, "documents")), 64)


SQL_MULTIMODAL_FRAME_SAMPLE = """
WITH f AS (
  SELECT doc_id,
    unnest(range(0, CAST(ceil(octet_length(encode(text)) / 64.0) AS BIGINT))) AS idx
  FROM documents
)
SELECT doc_id, CAST(idx AS INTEGER) AS frame_idx, CAST(idx * 64 AS INTEGER) AS byte_offset
FROM f
"""


def q_multimodal_resize(spark: SparkSession, sf: str) -> DataFrame:
    """Resize stub (binary-in/binary-out mapInPandas). Rows-only; exact
    output bytes asserted deterministic in tests."""
    out = resize_stub(with_binary_payload(table(spark, sf, "documents")))
    return out.select("doc_id", "width", "height", F.octet_length("resized").alias("n_bytes"))


def q_multimodal_features(spark: SparkSession, sf: str) -> DataFrame:
    """Feature-extraction stub → array<float> embeddings ready for the
    similarity operators. Rows-only."""
    out = feature_extract_stub(with_binary_payload(table(spark, sf, "documents")))
    return out.select("doc_id", F.size("feature").alias("dim"))


QUERIES: dict[str, Query] = {
    "multimodal_metadata": Query(q_multimodal_metadata, SQL_MULTIMODAL_METADATA),
    "multimodal_decode": Query(q_multimodal_decode, None),
    "multimodal_frame_sample": Query(q_multimodal_frame_sample, SQL_MULTIMODAL_FRAME_SAMPLE),
    "multimodal_resize": Query(q_multimodal_resize, None),
    "multimodal_features": Query(q_multimodal_features, None),
}
