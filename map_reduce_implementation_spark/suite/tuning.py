"""Index-tuning analytics (round 5): the MinHash-LSH S-curve priced
against the corpus's OWN pair-similarity distribution.

Why this exists: picking (rows-per-band, bands) for MinHash-LSH is THE
design decision of a fuzzy-dedup deployment — it fixes both the recall
on true near-dups and the candidate-verification bill. The textbook
S-curve P(candidate) = 1 − (1 − J^r)^b is usually eyeballed against a
hoped-for threshold; this entry computes it against the MEASURED
Jaccard distribution of the corpus's candidate pairs, reporting for
every (r, b) split of the 128-perm budget the expected recall on true
near-dups (J ≥ 0.5, the committed dedup threshold) and the expected
false-candidate rate below it. The committed pipeline's own geometry
(``dedup_minhash_lsh``: 128 perms) is one of the graded rows.

Determinism: J is an integer-ratio division (exact in both engines);
J^r and (1−J^r)^b are REPEATED SQUARING chains (r and b are powers of
two splitting 128) — pure IEEE multiplies, bit-identical everywhere,
never libm pow(); per-pair probabilities are ROUND(·, 9) then summed
as exact DECIMAL(18,9); displayed rates are single divisions by
integer counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .base import Query
from .dedup import SQL_SHINGLE_SIZES_CTE, _shingles

# (rows-per-band r, bands b): every power-of-two split of the 128-perm
# budget the production sketch already pays for (dedup_minhash_lsh)
BAND_CONFIGS = ((4, 32), (8, 16), (16, 8), (32, 4))
TUNE_MAX_DF = 20  # the production posting-list cap (dedup_containment's)
TUNE_TARGET_J = 0.5  # the committed near-dup threshold


def _square_chain(df: DataFrame, col: str, upto: int) -> DataFrame:
    """Add columns {col}2, {col}4, … {col}{upto} by repeated squaring."""
    k = 1
    prev = col
    while k * 2 <= upto:
        k *= 2
        df = df.withColumn(f"{col}{k}", F.col(prev) * F.col(prev))
        prev = f"{col}{k}"
    return df


def q_minhash_band_analysis(spark: SparkSession, sf: str) -> DataFrame:
    """For each (r, b) with r·b = 128: expected LSH recall on pairs
    with J ≥ {TUNE_TARGET_J} and expected false-candidate rate on
    pairs below it, from P(candidate) = 1 − (1 − J^r)^b evaluated at
    every candidate pair's TRUE Jaccard (capped posting lists at
    df ≤ {TUNE_MAX_DF}, true uncapped denominators — the
    ``dedup_ngram_jaccard_capped`` recipe with threshold 0, so the
    sub-0.5 tail is present to price false candidates).

    Scale shape: the pair scan is the capped posting-list pass the
    dedup pipeline already runs (bounded df·(df−1)/2 fan-out); the
    config grid is a 4-row broadcast over the pairs-sized frame; the
    report agg has 4 keys. Tuning costs one dedup-candidate pass,
    not one dedup run per candidate config."""
    from ..operators.dedup import jaccard_pairs

    pairs = jaccard_pairs(
        _shingles(spark, sf, 5), threshold=0.0, max_df=TUNE_MAX_DF
    ).select(F.col("jaccard").alias("j"))
    pj = _square_chain(pairs, "j", 32)
    cfg = spark.range(1).select(
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(r).alias("r"), F.lit(b).alias("bands"))
                    for r, b in BAND_CONFIGS
                ]
            )
        ).alias("c")
    ).select("c.r", "c.bands")
    jr = (
        F.when(F.col("r") == 4, F.col("j4"))
        .when(F.col("r") == 8, F.col("j8"))
        .when(F.col("r") == 16, F.col("j16"))
        .otherwise(F.col("j32"))
    )
    ex = pj.crossJoin(F.broadcast(cfg)).withColumn(
        "x", F.lit(1.0) - jr
    )
    ex = _square_chain(ex, "x", 32)
    xb = (
        F.when(F.col("bands") == 4, F.col("x4"))
        .when(F.col("bands") == 8, F.col("x8"))
        .when(F.col("bands") == 16, F.col("x16"))
        .otherwise(F.col("x32"))
    )
    p9 = F.round(F.lit(1.0) - xb, 9)
    hi = F.col("j") >= TUNE_TARGET_J
    scored = ex.select("r", "bands", "j", p9.alias("p"))
    agg = scored.groupBy("r", "bands").agg(
        F.sum(hi.cast("long")).alias("n_high"),
        F.sum((~hi).cast("long")).alias("n_low"),
        F.sum(F.when(hi, F.col("p").cast("decimal(18,9)")))
        .cast("double")
        .alias("eh"),
        F.coalesce(
            F.sum(F.when(~hi, F.col("p").cast("decimal(18,9)"))).cast("double"),
            F.lit(0.0),
        ).alias("el"),
    )
    return agg.select(
        "r",
        "bands",
        "n_high",
        "n_low",
        F.round("eh", 6).alias("exp_found_high"),
        F.round("el", 6).alias("exp_found_low"),
        F.round(F.col("eh") / F.col("n_high"), 6).alias("expected_recall"),
        F.when(
            F.col("n_low") > 0, F.round(F.col("el") / F.col("n_low"), 6)
        ).otherwise(F.lit(0.0)).alias("expected_false_rate"),
    )


def _band_oracle() -> str:
    # repeated-squaring CTE chains (never pow(): libm last-ulp risk)
    jsq = (
        "j1 AS (SELECT j, j*j AS j2 FROM pj),"
        " j2c AS (SELECT *, j2*j2 AS j4 FROM j1),"
        " j3c AS (SELECT *, j4*j4 AS j8 FROM j2c),"
        " j4c AS (SELECT *, j8*j8 AS j16 FROM j3c),"
        " jx AS (SELECT *, j16*j16 AS j32 FROM j4c)"
    )
    xsq = (
        "x1 AS (SELECT r, bands, j, 1.0 - jr AS x FROM ex),"
        " x2c AS (SELECT *, x*x AS x2 FROM x1),"
        " x3c AS (SELECT *, x2*x2 AS x4 FROM x2c),"
        " x4c AS (SELECT *, x4*x4 AS x8 FROM x3c),"
        " x5c AS (SELECT *, x8*x8 AS x16 FROM x4c),"
        " xx AS (SELECT *, x16*x16 AS x32 FROM x5c)"
    )
    values = ", ".join(f"({r}, {b})" for r, b in BAND_CONFIGS)
    return f"""
WITH {SQL_SHINGLE_SIZES_CTE},
df AS (SELECT shingle, COUNT(*) AS c FROM sh GROUP BY 1),
capped AS (
  SELECT sh.doc_id, sh.shingle FROM sh JOIN df USING (shingle)
  WHERE df.c BETWEEN 2 AND {TUNE_MAX_DF}
),
pairs AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS inter
  FROM capped a JOIN capped b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
pj AS (
  SELECT inter * 1.0 / (sa.n + sb.n - inter) AS j
  FROM pairs
  JOIN sizes sa ON sa.doc_id = d1
  JOIN sizes sb ON sb.doc_id = d2
),
{jsq},
cfg AS (SELECT * FROM (VALUES {values}) AS t(r, bands)),
ex AS (
  SELECT cfg.r, cfg.bands, jx.j,
    CASE cfg.r WHEN 4 THEN j4 WHEN 8 THEN j8 WHEN 16 THEN j16 ELSE j32 END AS jr
  FROM jx, cfg
),
{xsq},
scored AS (
  SELECT r, bands, j,
    ROUND(1.0 - CASE bands WHEN 4 THEN x4 WHEN 8 THEN x8 WHEN 16 THEN x16
                ELSE x32 END, 9) AS p
  FROM xx
),
agg AS (
  SELECT r, bands,
    CAST(SUM(CASE WHEN j >= {TUNE_TARGET_J} THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
    CAST(SUM(CASE WHEN j < {TUNE_TARGET_J} THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
    CAST(SUM(CASE WHEN j >= {TUNE_TARGET_J} THEN CAST(p AS DECIMAL(18,9)) END)
      AS DOUBLE) AS eh,
    coalesce(CAST(SUM(CASE WHEN j < {TUNE_TARGET_J}
      THEN CAST(p AS DECIMAL(18,9)) END) AS DOUBLE), 0.0) AS el
  FROM scored GROUP BY r, bands
)
SELECT CAST(r AS INTEGER) AS r, CAST(bands AS INTEGER) AS bands, n_high, n_low,
  ROUND(eh, 6) AS exp_found_high,
  ROUND(el, 6) AS exp_found_low,
  ROUND(eh / n_high, 6) AS expected_recall,
  CASE WHEN n_low > 0 THEN ROUND(el / n_low, 6) ELSE 0.0 END
    AS expected_false_rate
FROM agg
"""


SQL_MINHASH_BAND_ANALYSIS = _band_oracle()


QUERIES: dict[str, Query] = {
    "minhash_band_analysis": Query(
        q_minhash_band_analysis, SQL_MINHASH_BAND_ANALYSIS
    ),
}
