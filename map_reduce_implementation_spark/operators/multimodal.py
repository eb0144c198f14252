"""Multimodal column handling — opaque binary payloads + typed metadata.

The pattern for image/audio/video at 100 TB: store the payload as a
``binary`` column (or a reference to object storage) next to typed
metadata; run decode / feature-extraction as Arrow-batched Pandas UDFs
via ``mapInPandas`` so each task streams record batches without
row-at-a-time Python overhead.

The actual codec libraries (Pillow/ffmpeg/torchaudio) are NOT in this
container, so the decode kernel is a clearly-marked deterministic fake
behind ``decode_stub`` — the Spark-side plumbing (schema, batch iteration,
partitioning) is real and tested. Swap ``_fake_decode`` for a real codec
in production.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("mean_intensity", T.DoubleType()),
    ]
)


def with_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Materialize an opaque binary column (here: utf-8 payload of the
    text — a stand-in for image/audio bytes) plus typed metadata."""
    return df.select(
        "doc_id",
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.octet_length(F.col(text_col)).alias("byte_len"),
        F.sha2(F.col(text_col), 256).alias("content_sha256"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int, float]:
    """Deterministic stand-in for an image decode. A real implementation
    would call PIL.Image.open / cv2.imdecode here.

    Derives (width, height, channels, mean_intensity) purely from the
    bytes so tests are reproducible without codec libraries.
    """
    n = len(payload)
    width = 16 + n % 64
    height = 16 + (n // 64) % 64
    mean = (sum(payload[:256]) / min(n, 256)) if n else 0.0
    return width, height, 3, float(mean)


def decode_stub(df_with_payload: DataFrame) -> DataFrame:
    """Arrow-batched 'decode' over the binary column via mapInPandas.

    Real decode path: replace ``_fake_decode``. The plumbing —
    per-batch pandas iteration, explicit output schema, no driver
    collect — is the production shape.
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [_fake_decode(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "byte_len": pdf["payload"].map(len).astype("int64"),
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "n_channels": [d[2] for d in decoded],
                    "mean_intensity": [d[3] for d in decoded],
                }
            )

    return df_with_payload.mapInPandas(decode_batches, DECODED_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("resized", T.BinaryType()),
    ]
)


def resize_stub(
    df_decoded_payload: DataFrame, target_w: int = 32, target_h: int = 32
) -> DataFrame:
    """Image-resize stand-in over mapInPandas: emits a deterministic
    ``target_w*target_h``-byte payload derived by strided byte sampling.
    A real implementation calls PIL ``Image.resize`` per batch; the
    schema, batching and binary-out plumbing are identical."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        size = target_w * target_h
        for pdf in it:
            out = []
            for p in pdf["payload"]:
                if len(p) == 0:
                    out.append(b"\x00" * size)
                    continue
                step = max(1, len(p) // size)
                sampled = (p[::step] * ((size // max(1, len(p[::step]))) + 1))[:size]
                out.append(bytes(sampled))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "width": target_w,
                    "height": target_h,
                    "resized": out,
                }
            )

    return df_decoded_payload.mapInPandas(batches, RESIZED_SCHEMA)


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def feature_extract_stub(df_with_payload: DataFrame, dim: int = 16) -> DataFrame:
    """Embedding-extraction stand-in (a real one runs an ONNX/torch model
    per Arrow batch): deterministic byte-histogram features, L2-normed.
    Output matches the ``embeddings`` table shape → feeds directly into
    the similarity operators."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            for p in pdf["payload"]:
                arr = np.frombuffer(bytes(p), dtype=np.uint8)
                hist = np.bincount(arr % dim, minlength=dim).astype(np.float64)
                n = np.linalg.norm(hist)
                feats.append((hist / n if n else hist).astype(np.float32).tolist())
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].astype("int64"), "feature": feats}
            )

    return df_with_payload.mapInPandas(batches, FEATURE_SCHEMA)


MEDIA_STRUCT = T.StructType(
    [
        T.StructField("modality", T.StringType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
    ]
)


def with_media_metadata(df_with_payload: DataFrame) -> DataFrame:
    """Canonical typed media metadata as ONE struct column next to the
    opaque payload — the schema a 100 TB multimodal lake standardizes on
    (modality + mime + per-modality dims, NULL where not applicable).

    Stays entirely JVM-side (CASE/arithmetic on byte length), so it is
    exactly oracle-checkable; in production the same struct is populated
    by the decode kernel instead. Partition the lake by ``modality``
    (write_parquet(..., partition_by=["media.modality"]) after projecting
    the field out) so per-modality pipelines prune at the scan."""
    modality = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    is_img = modality == "image"
    is_aud = modality == "audio"
    bl = F.col("byte_len").cast("long")
    return df_with_payload.withColumn(
        "media",
        F.struct(
            modality.alias("modality"),
            F.concat(
                F.when(is_img, F.lit("image/")).when(is_aud, F.lit("audio/")).otherwise(F.lit("video/")),
                F.when(is_img, F.lit("png")).when(is_aud, F.lit("wav")).otherwise(F.lit("mp4")),
            ).alias("mime"),
            F.when(~is_aud, (F.lit(16) + bl % 64).cast("int")).alias("width"),
            F.when(~is_aud, (F.lit(16) + (bl / 64).cast("long") % 64).cast("int")).alias("height"),
            F.when(~is_img, bl * 10).alias("duration_ms"),
            F.when(is_aud, F.lit(16000)).alias("sample_rate"),
        ),
    )


AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("rms", T.DoubleType()),
    ]
)


def audio_decode_stub(df_with_payload: DataFrame, sample_rate: int = 16000) -> DataFrame:
    """Audio-decode stand-in (real path: soundfile/torchaudio per Arrow
    batch): treats payload bytes as int8 PCM, emits sample count + RMS
    loudness. Deterministic — no codec libs in this container."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ns, rms = [], []
            for p in pdf["payload"]:
                arr = np.frombuffer(bytes(p), dtype=np.int8).astype(np.float64)
                ns.append(len(arr))
                rms.append(float(np.sqrt(np.mean(arr * arr))) if len(arr) else 0.0)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "sample_rate": sample_rate,
                    "n_samples": ns,
                    "rms": rms,
                }
            )

    return df_with_payload.mapInPandas(batches, AUDIO_SCHEMA)


def frame_sample_stub(df_with_payload: DataFrame, every_n_bytes: int = 1024) -> DataFrame:
    """Video-style frame sampling stand-in: emit one row per sampled
    'frame' offset (posexplode of byte offsets). Real path: ffmpeg
    keyframe extraction inside mapInPandas with the same output shape."""
    return df_with_payload.select(
        "doc_id",
        F.posexplode(
            F.sequence(
                F.lit(0),
                F.greatest(F.octet_length("payload").cast("int") - 1, F.lit(0)),
                F.lit(every_n_bytes),
            )
        ).alias("frame_idx", "byte_offset"),
    )
