"""Reusable text column functions (all JVM-side expressions).

The engine-native generalization of the reference's byte-level scalar
set (isalpha/toupper/isalnum/strstr — usr_functions.c:40-42,164-174).
Shared by the text-analysis and dedup suites.

Usage note: bind results to a real column (``.alias``/``withColumn``)
before referencing them from higher-order-function lambdas — lambda
references inline the expression and re-evaluate it per array element.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(col: Column | str) -> Column:
    """Lower-cased [a-z0-9]+ word tokens (empty strings filtered)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), "[^a-z0-9]+"), lambda t: t != F.lit(""))


def normalize_text(col: Column | str) -> Column:
    """Dedup-normalization: lowercase, collapse non-alphanumerics to
    single spaces, trim — the canonical form behind text_fingerprint."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), "[^a-z0-9]+", " "))


def word_ngrams(tokens_col: Column | str, n: int) -> Column:
    """Sliding word n-grams over an already-bound token-array column."""
    ts = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    return F.transform(
        F.slice(ts, 1, F.greatest(F.size(ts) - (n - 1), F.lit(0))),
        lambda _, i: F.concat_ws(" ", *[F.get(ts, i + j) for j in range(n)]),
    )
