"""Fuzzy-dedup primitives: MinHash+LSH and SimHash — pure DataFrame ops.

Everything stays JVM-side (murmur3 ``F.hash`` / ``F.xxhash64``; no Python
in the hot path). Shapes chosen for 100 TB:

- MinHash signatures are one groupBy(doc_id) carrying ``num_perm``
  MIN aggregates — partial/final two-phase, shuffling num_perm ints per
  doc per partition; no row blow-up, keyed uniformly → no skew.
- LSH banding turns the O(n²) pair space into per-bucket joins; bucket
  sizes are bounded in practice by signature entropy; ultra-hot buckets
  (near-identical boilerplate docs) are exactly the pairs we want.
- SimHash bit-aggregation is a (doc, bit) partial-SUM shuffle; pair
  generation joins on 16-bit bands of the fingerprint, then verifies
  with ``bit_count(xor) <= k`` — never a cross join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def minhash_signatures(shingles: DataFrame, num_perm: int = 128) -> DataFrame:
    """DataFrame[doc_id, sig: array<int>] — minhash signature per doc.

    ``shingles``: DataFrame[doc_id, shingle] (distinct per doc).
    Permutation p's hash is murmur3(shingle, p) — independent uniform
    hashes, the standard one-hash-per-perm construction.
    """
    mins = [
        F.min(F.hash("shingle", F.lit(p))).alias(f"m{p}") for p in range(num_perm)
    ]
    return (
        shingles.groupBy("doc_id")
        .agg(*mins)
        .select(
            "doc_id", F.array(*[F.col(f"m{p}") for p in range(num_perm)]).alias("sig")
        )
    )


def minhash_lsh_pairs(
    shingles: DataFrame,
    num_perm: int = 128,
    bands: int = 32,
    threshold: float = 0.5,
) -> DataFrame:
    """Near-dup candidate pairs via LSH banding, scored by the signature
    Jaccard estimate (fraction of agreeing minhashes).

    Returns DataFrame[d1, d2, est_jaccard] with est_jaccard >= threshold.
    With 32 bands × 4 rows the S-curve crosses ~50% capture at J≈0.42 —
    tuned for a 0.5 threshold.
    """
    if num_perm % bands:
        raise ValueError("num_perm must be divisible by bands")
    rows_per_band = num_perm // bands
    sig = minhash_signatures(shingles, num_perm).cache()

    banded = sig.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.hash(
                        F.concat_ws(
                            ",",
                            F.transform(
                                F.slice("sig", b * rows_per_band + 1, rows_per_band),
                                lambda h: h.cast("string"),
                            ),
                        )
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band", "bucket"),
    )
    cand = (
        banded.alias("x")
        .join(
            banded.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(F.col("x.doc_id").alias("d1"), F.col("y.doc_id").alias("d2"))
        .distinct()
    )
    sx = sig.alias("sx")
    sy = sig.alias("sy")
    est = (
        cand.join(sx, F.col("d1") == F.col("sx.doc_id"))
        .join(sy, F.col("d2") == F.col("sy.doc_id"))
        .select(
            "d1",
            "d2",
            (
                F.aggregate(
                    F.zip_with(
                        F.col("sx.sig"),
                        F.col("sy.sig"),
                        lambda a, b: F.when(a == b, 1).otherwise(0),
                    ),
                    F.lit(0),
                    lambda acc, x: acc + x,
                )
                / F.lit(float(len(range(num_perm))))
            ).alias("est_jaccard"),
        )
    )
    return est.filter(F.col("est_jaccard") >= threshold)


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash fingerprint per document.

    Token xxhash64 → per-bit signed votes (+1 if bit set, −1 otherwise,
    weighted by token multiplicity) → sign of each bit-sum → fingerprint.
    Returns DataFrame[id_col, simhash: bigint].
    """
    toks = df.select(
        id_col,
        F.explode(
            F.filter(F.split(F.lower(text_col), "[^a-z0-9]+"), lambda t: t != F.lit(""))
        ).alias("tok"),
    )
    counted = toks.groupBy(id_col, "tok").agg(F.count("*").alias("cnt"))
    votes = counted.select(
        id_col,
        F.posexplode(
            F.array(
                *[
                    F.when(
                        F.shiftright(F.xxhash64("tok"), i).bitwiseAND(F.lit(1)) == 1,
                        F.col("cnt"),
                    ).otherwise(-F.col("cnt"))
                    for i in range(64)
                ]
            )
        ).alias("bit", "vote"),
    )
    bit_sums = votes.groupBy(id_col, "bit").agg(F.sum("vote").alias("s"))
    return bit_sums.groupBy(id_col).agg(
        F.sum(
            F.when(
                F.col("s") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), bit)")
            ).otherwise(F.lit(0).cast("long"))
        ).alias("simhash")
    )


def simhash_near_pairs(sims: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs among SimHash fingerprints with hamming <= k.

    Join on 16-bit bands (a pair within hamming 3 must agree on ≥1 of 4
    bands — pigeonhole), verify with bit_count(xor). No cross join.
    """
    banded = sims.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("simhash"), b * 16).bitwiseAND(F.lit(0xFFFF))
                    for b in range(4)
                ]
            )
        ).alias("band", "chunk"),
    )
    return (
        banded.alias("x")
        .join(
            banded.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.chunk") == F.col("y.chunk"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("d1"),
            F.col("y.doc_id").alias("d2"),
            F.bit_count(F.col("x.simhash").bitwiseXOR(F.col("y.simhash"))).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
