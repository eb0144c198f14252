"""Winnowing document fingerprints (rolling hash + window minima).

The MOSS-style local fingerprinting scheme (Schleimer, Wilkerson,
Aiken, "Winnowing: Local Algorithms for Document Fingerprinting",
SIGMOD 2003): hash every k-gram, slide a window of w hashes, keep each
window's minimum — guarantees any shared substring of length ≥ w+k−1
contributes a shared fingerprint.

Numpy inside an Arrow-batched Pandas UDF: the rolling hash is genuinely
sequential per document, so this is the sanctioned slow-path shape
(mapInPandas) — vectorized across documents in each batch, no
row-at-a-time Python. Per-doc work is O(n); the operator is an
embarrassingly parallel scan at any scale.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

FP_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("fingerprints", T.ArrayType(T.LongType())),
        T.StructField("n_fingerprints", T.IntegerType()),
    ]
)

_BASE = np.int64(1000003)
_MOD_MASK = np.int64((1 << 61) - 1)


def _kgram_hashes(text: str, k: int) -> np.ndarray:
    """Polynomial rolling hashes of all k-grams (lower-cased bytes)."""
    b = np.frombuffer(text.lower().encode("utf-8", "ignore"), dtype=np.uint8).astype(
        np.int64
    )
    n = b.size
    if n < k:
        return np.empty(0, dtype=np.int64)
    # prefix hashes: h[i] = hash of b[0:i]; int64 wraparound is fine (it
    # is a hash) — masked to 61 bits for positive longs
    with np.errstate(over="ignore"):
        powers = np.empty(n + 1, dtype=np.int64)
        powers[0] = 1
        h = np.empty(n + 1, dtype=np.int64)
        h[0] = 0
        for i in range(n):  # sequential by nature (rolling hash)
            powers[i + 1] = (powers[i] * _BASE) & _MOD_MASK
            h[i + 1] = (h[i] * _BASE + b[i]) & _MOD_MASK
        # k-gram hash = h[i+k] - h[i]*B^k  (masked arithmetic)
        return (h[k:] - ((h[:-k] * powers[k]) & _MOD_MASK)) & _MOD_MASK


def winnow(text: str, k: int = 8, w: int = 4) -> list[int]:
    """Winnowed fingerprint set (sorted, deduped) of one document."""
    hs = _kgram_hashes(text, k)
    if hs.size == 0:
        return []
    if hs.size <= w:
        return [int(hs.min())]
    # sliding-window minima via stride tricks
    win = np.lib.stride_tricks.sliding_window_view(hs, w)
    return sorted({int(x) for x in win.min(axis=1)})


def winnow_fingerprints(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 8, w: int = 4
) -> DataFrame:
    """DataFrame[doc_id, fingerprints array<long>, n_fingerprints]."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            fps = [winnow(t, k, w) for t in pdf[text_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "fingerprints": fps,
                    "n_fingerprints": [len(f) for f in fps],
                }
            )

    return df.select(id_col, text_col).mapInPandas(batches, FP_SCHEMA)
