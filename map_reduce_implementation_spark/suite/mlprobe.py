"""Embedding training-loop shapes (EXT, round 4): a linear probe
trained by distributed gradient descent and a PCA top component via
power iteration — BOTH hash-graded against unrolled-CTE DuckDB oracles.

Why these exist: after dedup/similarity/clustering, the next thing a
training-data pipeline does with an embedding export is (a) train a
cheap linear probe to check the embeddings carry label signal before
spending GPU time, and (b) look at the principal spectrum for
collapsed/anisotropic dimensions. Both are ITERATIVE: they complete
the repo's iterative-idiom family (pagerank = edge propagation,
dedup_clusters = label propagation, ann_ivf = Lloyd k-means) with the
gradient-descent and power-iteration shapes.

Determinism contract (the pagerank/SemDeDup-graded recipe, taken one
step further into real training math):
- The logistic link is replaced by the ALGEBRAIC sigmoid
  s(z) = 0.5 + z / (2·(1+|z|)) — same shape, same [0,1] range, same
  0.5-at-0 — computable with only +,*,/,abs, which are IEEE-exact and
  identical in every engine. No exp(), so no libm last-ulp risk.
- Every cross-row sum is an EXACT decimal sum of quantized operands.
  RAW float32 cells quantize with the modeless floor(x·1e7 + 0.5)
  (dyadic float32 values can land exactly on decimal-cast/ROUND ties
  where engines' rounding paths disagree by 1 ulp — verified on this
  table); GENERIC full-mantissa doubles (margins, centered values,
  projections) use ROUND(·,9). Decimal products are exact and the
  sums order-independent either way.
- Every within-row reduction (dot products, norms) is a SEQUENTIAL
  left fold over a position-ordered list — Spark ``F.aggregate`` ==
  DuckDB ``list_sum`` (proven bit-equal by the SemDeDup-graded arm).
- Weight updates stay in double: identical operands + identical IEEE
  ops => identical weights each iteration, no rounding needed until
  the final display round.

100 TB design: one uniform shuffle per iteration (the 64-key
(pos)-grouped gradient with map-side partial aggregation — the
classic parameter-server allreduce as a groupBy); model state lives
in a 1-row broadcast DataFrame, never collected to the driver; the
embedding scan is the only data-sized input each pass. ITERS is fixed
and small (3), exactly like graph_pagerank's unrolled fixed point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.similarity import _as_double, dot as _fold_dot
from ..sources import table
from .base import Query

DIM = 64
LR = 0.5
ITERS = 3


def _alg_sigmoid(z: F.Column) -> F.Column:
    """Algebraic sigmoid 0.5 + z/(2*(1+|z|)): IEEE-exact, no exp()."""
    return F.lit(0.5) + z / (F.lit(2.0) * (F.lit(1.0) + F.abs(z)))


def _probe_input(spark: SparkSession, sf: str) -> DataFrame:
    """Embeddings projected to (vec_id, y = label%2, v) — the training
    view shared by the train and apply halves."""
    return table(spark, sf, "embeddings").select(
        "vec_id",
        (F.col("label") % 2).cast("double").alias("y"),
        _as_double("embedding").alias("v"),
    )


def _train_probe(e: DataFrame, n: float):
    """The {ITERS}-step full-batch GD loop from w=0 (lr={LR}); returns
    (w_df 64-row (pos, w), w_row 1-row weight list). Shared verbatim by
    ``embedding_linear_probe`` and ``quality_classifier_apply`` so the
    apply half scores with EXACTLY the weights the train half reports."""
    w_df = None  # (pos, w) — None means w == 0 (first iteration)
    w_row = None  # 1-row DataFrame with the weight list
    for _ in range(ITERS):
        if w_df is None:
            m_df = e.select(
                "y", "v", F.round(F.lit(0.5) - F.col("y"), 9).alias("m")
            )
        else:
            m_df = e.crossJoin(F.broadcast(w_row)).select(
                "y",
                "v",
                F.round(
                    _alg_sigmoid(_fold_dot(F.col("v"), F.col("wl"))) - F.col("y"), 9
                ).alias("m"),
            )
        contrib = m_df.select(
            F.col("m").cast("decimal(18,9)").alias("m9"),
            F.posexplode("v").alias("pos", "x"),
        )
        # raw float32 cells quantize via modeless floor(x*1e7+0.5) — a
        # ROUND(x,9) here would hit the same decimal-cast tie class the
        # PCA mean fix documents (dyadic float32 values); the margins m
        # are generic full-mantissa doubles, safe to ROUND
        g = contrib.groupBy("pos").agg(
            (
                F.sum(
                    F.floor(F.col("x") * F.lit(1e7) + F.lit(0.5))
                    .cast("decimal(18,0)")
                    * F.col("m9")
                ).cast("double")
                / F.lit(1e7)
            ).alias("s")
        )
        if w_df is None:
            w_df = g.select("pos", (-F.lit(LR) * F.col("s") / F.lit(n)).alias("w"))
        else:
            w_df = g.join(F.broadcast(w_df), "pos").select(
                "pos", (F.col("w") - F.lit(LR) * F.col("s") / F.lit(n)).alias("w")
            )
        # Truncate lineage at the 1-ROW weight list, not the 64-row
        # frame (round 12, guide §2.1): the next iteration's broadcast
        # previously re-ran the collect_list aggregate over the
        # checkpointed w_df per use — one extra shuffle + job per
        # iteration. Checkpointing w_row instead and deriving the
        # (pos, w) frame by posexplode keeps the SAME doubles (the
        # array is the sort-by-pos of the identical weight rows) while
        # the per-iteration state is a materialized single row.
        w_row = w_df.agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "w"))), lambda s: s["w"]
            ).alias("wl")
        ).localCheckpoint(eager=True)
        w_df = w_row.select(F.posexplode("wl").alias("pos", "w"))
    return w_df, w_row


def q_embedding_linear_probe(spark: SparkSession, sf: str) -> DataFrame:
    """Binary linear probe (target: label % 2) trained with {ITERS}
    full-batch gradient steps from w=0, lr={LR}; returns the final
    per-dimension weight and the training accuracy. Gradient step:
    w <- w - lr/n * X^T (s(Xw) - y) with the algebraic sigmoid s.

    Every iteration is: broadcast the 1-row weight array, one scan of
    the embeddings computing the per-row margin, posexplode to (pos,
    x·m) contributions, ONE 64-key groupBy (map-side combined), and a
    64-row join to form the next weights. No driver round-trip for
    model state; the one bounded scalar is n (corpus size)."""
    e = _probe_input(spark, sf)
    n = float(e.count())  # one bounded scalar (suite/text.py:361 precedent)
    w_df, w_row = _train_probe(e, n)

    acc = (
        e.crossJoin(F.broadcast(w_row))
        .select(
            (
                (_fold_dot(F.col("v"), F.col("wl")) > 0)
                == (F.col("y") == 1.0)
            )
            .cast("double")
            .alias("ok")
        )
        .agg(F.round(F.avg("ok"), 6).alias("train_accuracy"))
    )
    return w_df.crossJoin(F.broadcast(acc)).select(
        "pos", F.round("w", 9).alias("weight"), "train_accuracy"
    )


_SQL_DOT = "list_sum(list_transform(list_zip(v, wl), p -> p[1]*p[2]))"


def _gd_ctes() -> list[str]:
    """The unrolled {ITERS}-step GD CTE chain (e … w{ITERS}) — shared
    by the train and apply oracles so both score from identical
    weights, mirroring ``_train_probe`` on the Spark side."""
    dot = _SQL_DOT
    ctes = [
        "e AS (SELECT vec_id, CAST(label % 2 AS DOUBLE) AS y,"
        " CAST(embedding AS DOUBLE[]) AS v FROM embeddings)",
        "n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS c FROM e)",
        "m0 AS (SELECT y, v, ROUND(0.5 - y, 9) AS m FROM e)",
        f"g0 AS (SELECT i-1 AS pos,"
        f" CAST(SUM(CAST(floor(v[i]*1e7+0.5) AS DECIMAL(18,0))"
        f" * CAST(m AS DECIMAL(18,9))) AS DOUBLE) / 1e7 AS s"
        f" FROM m0, range(1,{DIM + 1}) r(i) GROUP BY i-1)",
        f"w1 AS (SELECT pos, 0.0 - {LR} * s / n.c AS w FROM g0, n)",
    ]
    for k in range(1, ITERS):
        ctes += [
            f"wl{k} AS (SELECT list(w ORDER BY pos) AS wl FROM w{k})",
            f"m{k} AS (SELECT y, v,"
            f" ROUND(0.5 + z/(2*(1+abs(z))) - y, 9) AS m FROM ("
            f"SELECT y, v, {dot} AS z FROM e, wl{k}))",
            f"g{k} AS (SELECT i-1 AS pos,"
            f" CAST(SUM(CAST(floor(v[i]*1e7+0.5) AS DECIMAL(18,0))"
            f" * CAST(m AS DECIMAL(18,9))) AS DOUBLE) / 1e7 AS s"
            f" FROM m{k}, range(1,{DIM + 1}) r(i) GROUP BY i-1)",
            f"w{k + 1} AS (SELECT g.pos, w.w - {LR} * g.s / n.c AS w"
            f" FROM g{k} g JOIN w{k} w USING (pos), n)",
        ]
    return ctes


def _probe_oracle() -> str:
    dot = _SQL_DOT
    ctes = _gd_ctes()
    ctes += [
        f"wlf AS (SELECT list(w ORDER BY pos) AS wl FROM w{ITERS})",
        f"acc AS (SELECT ROUND(AVG(CASE WHEN ({dot} > 0) = (y = 1.0)"
        f" THEN 1.0 ELSE 0.0 END), 6) AS train_accuracy FROM e, wlf)",
    ]
    return (
        "WITH " + ",\n".join(ctes) + f"\nSELECT CAST(pos AS INTEGER) AS pos,"
        f" ROUND(w, 9) AS weight, acc.train_accuracy FROM w{ITERS}, acc"
    )


SQL_EMBEDDING_LINEAR_PROBE = _probe_oracle()


def q_quality_classifier_apply(spark: SparkSession, sf: str) -> DataFrame:
    """The APPLY half of the linear probe — the fastText-style quality
    classifier run a curation pipeline executes after training: score
    EVERY embedding with the trained weights (p = s(w·x), the same
    algebraic sigmoid), bucket scores into deciles, and report each
    bucket's population, positive count, and mean score — the
    score-distribution table that picks the keep threshold (train on a
    labeled slice, apply to the corpus, cut where the buckets separate).
    Completes the train→apply loop the way ``tokenizer_bpe_apply``
    closes ``tokenizer_bpe_train``.

    Determinism: identical weights by construction (the loop and its
    unrolled-CTE oracle are shared with ``embedding_linear_probe``
    verbatim); p is ROUND(·, 9) of a sequential-fold dot through the
    exp-free sigmoid; the decile boundary compare is floor(p*10) on
    identical doubles (the algebraic sigmoid's open (0,1) range keeps
    floor in 0..9); the mean is an exact DECIMAL(18,9) sum divided
    once.

    Scale shape: training is the probe's {ITERS} bounded-state passes;
    scoring is ONE corpus scan against the broadcast 1-row weight
    vector; the report groupBy has <= 10 keys (map-side combined to
    nothing)."""
    e = _probe_input(spark, sf)
    n = float(e.count())  # one bounded scalar (suite/text.py:361 precedent)
    _, w_row = _train_probe(e, n)
    scored = e.crossJoin(F.broadcast(w_row)).select(
        "y",
        F.round(_alg_sigmoid(_fold_dot(F.col("v"), F.col("wl"))), 9).alias("p"),
    )
    return scored.groupBy(
        F.floor(F.col("p") * 10).cast("int").alias("bucket")
    ).agg(
        F.count("*").alias("n"),
        F.sum((F.col("y") == 1.0).cast("long")).alias("n_pos"),
        F.round(
            F.sum(F.col("p").cast("decimal(18,9)")).cast("double") / F.count("*"), 6
        ).alias("mean_score"),
    )


def _apply_oracle() -> str:
    dot = _SQL_DOT
    ctes = _gd_ctes()
    ctes += [
        f"wlf AS (SELECT list(w ORDER BY pos) AS wl FROM w{ITERS})",
        f"scored AS (SELECT y, ROUND(0.5 + z/(2*(1+abs(z))), 9) AS p FROM ("
        f"SELECT y, {dot} AS z FROM e, wlf))",
    ]
    return (
        "WITH " + ",\n".join(ctes) + "\nSELECT CAST(floor(p*10) AS INTEGER)"
        " AS bucket, COUNT(*) AS n,"
        " CAST(SUM(CASE WHEN y = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,"
        " ROUND(CAST(SUM(CAST(p AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*), 6)"
        " AS mean_score"
        " FROM scored GROUP BY 1"
    )


SQL_QUALITY_CLASSIFIER_APPLY = _apply_oracle()


def q_quality_calibration_report(spark: SparkSession, sf: str) -> DataFrame:
    """Reliability diagram + expected calibration error (ECE) for the
    trained probe — the check run BEFORE a classifier's score threshold
    is trusted: per decile bucket, mean predicted probability vs the
    EMPIRICAL positive rate, their gap, and the bucket's ECE
    contribution (|gap| weighted by bucket population / corpus). The
    summed contributions ARE the standard ECE (Guo et al. 2017's
    binned form); a well-calibrated probe has per-bucket gaps near 0.
    Shares the GD loop and scoring with ``quality_classifier_apply``
    verbatim — same weights, same buckets, one more derived table.

    Determinism: identical weights/scores by construction; predicted
    means are exact DECIMAL(18,9) sums divided once; empirical rates
    and the population weight are integer-ratio divisions; the gap is
    one subtraction of those identical doubles, rounded for display
    AFTER the |gap|·weight product.

    Scale shape: identical to the apply half (training's bounded-state
    passes + ONE scoring scan) — the report is a second aggregation
    over the same <= 10-key groupBy output."""
    e = _probe_input(spark, sf)
    n = float(e.count())  # one bounded scalar (suite/text.py:361 precedent)
    _, w_row = _train_probe(e, n)
    scored = e.crossJoin(F.broadcast(w_row)).select(
        "y",
        F.round(_alg_sigmoid(_fold_dot(F.col("v"), F.col("wl"))), 9).alias("p"),
    )
    b = scored.groupBy(
        F.floor(F.col("p") * 10).cast("int").alias("bucket")
    ).agg(
        F.count("*").alias("n"),
        F.sum((F.col("y") == 1.0).cast("long")).alias("n_pos"),
        F.sum(F.col("p").cast("decimal(18,9)")).alias("sp"),
    )
    mean_p = F.col("sp").cast("double") / F.col("n")
    frac_pos = F.col("n_pos") / F.col("n")
    gap = mean_p - frac_pos
    return b.select(
        "bucket",
        "n",
        F.round(mean_p, 6).alias("mean_predicted"),
        F.round(frac_pos, 6).alias("frac_positive"),
        F.round(gap, 6).alias("gap"),
        F.round(F.abs(gap) * (F.col("n") / F.lit(n)), 9).alias("ece_contrib"),
    )


def _calibration_oracle() -> str:
    dot = _SQL_DOT
    ctes = _gd_ctes()
    ctes += [
        f"wlf AS (SELECT list(w ORDER BY pos) AS wl FROM w{ITERS})",
        f"scored AS (SELECT y, ROUND(0.5 + z/(2*(1+abs(z))), 9) AS p FROM ("
        f"SELECT y, {dot} AS z FROM e, wlf))",
        "b AS (SELECT CAST(floor(p*10) AS INTEGER) AS bucket, COUNT(*) AS n,"
        " CAST(SUM(CASE WHEN y = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,"
        " SUM(CAST(p AS DECIMAL(18,9))) AS sp"
        " FROM scored GROUP BY 1)",
    ]
    return (
        "WITH " + ",\n".join(ctes) + "\nSELECT bucket, n,"
        " ROUND(CAST(sp AS DOUBLE) / n, 6) AS mean_predicted,"
        " ROUND(n_pos * 1.0 / n, 6) AS frac_positive,"
        " ROUND(CAST(sp AS DOUBLE) / n - n_pos * 1.0 / n, 6) AS gap,"
        " ROUND(abs(CAST(sp AS DOUBLE) / n - n_pos * 1.0 / n)"
        " * (n * 1.0 / n_all.c), 9) AS ece_contrib"
        " FROM b, (SELECT CAST(COUNT(*) AS DOUBLE) AS c FROM e) n_all"
    )


SQL_QUALITY_CALIBRATION_REPORT = _calibration_oracle()


def q_embedding_pca_power(spark: SparkSession, sf: str) -> DataFrame:
    """Top principal component of the (mean-centered) embedding matrix
    by {ITERS} power iterations from the uniform unit vector
    v0 = 1/sqrt({DIM}) (= 0.125, exactly representable): u = C^T(C v)/n,
    v <- u/||u||. Returns the component and the eigenvalue estimate
    ||u_last|| (the Rayleigh-quotient surrogate) — the anisotropy
    check run on embedding exports before ANN indexing.

    Same distributed shape as the probe: the mean vector and every
    iterate live in 1-row broadcast DataFrames (never collected), each
    iteration is one embedding scan + one 64-key map-side-combined
    groupBy. Exact-decimal sums + sequential-fold norms keep both
    engines bit-identical through all {ITERS} normalizations."""
    e = table(spark, sf, "embeddings").select(_as_double("embedding").alias("v"))
    n = float(e.count())

    # mean via the PURE-IEEE 1e-7 quantizer (embedding_dim_stats
    # recipe): raw float32 cells are dyadic and can land exactly on a
    # decimal-cast tie, where Spark's BigDecimal HALF_UP and DuckDB's
    # float path disagree by 1 ulp (verified on this table: 1 cell at
    # sf0.01, 5 at sf0.1). floor(x*1e7+0.5) has no rounding modes.
    comp = e.select(F.posexplode("v").alias("pos", "x"))
    mu_row = (
        comp.groupBy("pos")
        .agg(
            (
                F.sum(F.floor(F.col("x") * F.lit(1e7) + F.lit(0.5))).cast("double")
                / F.lit(1e7)
                / F.lit(n)
            ).alias("m")
        )
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
            ).alias("mu")
        )
        .localCheckpoint(eager=True)  # 1 row — computed once, not per iteration
    )

    v0 = 1.0 / (DIM ** 0.5)
    v_row = spark.range(1).select(
        F.array_repeat(F.lit(v0), DIM).alias("vl")
    )
    assert ITERS >= 1  # the loop must bind v_row's norm column
    for _ in range(ITERS):
        centered = e.crossJoin(F.broadcast(mu_row)).crossJoin(F.broadcast(v_row)).select(
            F.zip_with("v", "mu", lambda a, b: a - b).alias("c"), "vl"
        )
        proj = centered.select(
            "c", F.round(_fold_dot(F.col("c"), F.col("vl")), 9).alias("yv")
        )
        u = (
            proj.select(
                F.col("yv").cast("decimal(18,9)").alias("y9"),
                F.posexplode("c").alias("pos", "cx"),
            )
            .groupBy("pos")
            .agg(
                (
                    F.sum(F.round(F.col("cx"), 9).cast("decimal(18,9)") * F.col("y9"))
                    .cast("double")
                    / F.lit(n)
                ).alias("u")
            )
        )
        u_row = u.agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "u"))), lambda s: s["u"]
            ).alias("ul")
        ).select(
            "ul",
            F.sqrt(
                F.aggregate(
                    F.transform("ul", lambda x: x * x),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
            ).alias("norm"),
        )
        v_row = u_row.select(
            F.transform("ul", lambda x: x / F.col("norm")).alias("vl"), "norm"
        ).localCheckpoint(eager=True)  # 1 row — truncates the replay chain
    return v_row.select(
        F.posexplode("vl").alias("pos", "pc1_raw"), F.col("norm")
    ).select(
        "pos",
        F.round("pc1_raw", 9).alias("pc1"),
        F.round("norm", 6).alias("eigenvalue"),
    )


def _pca_oracle() -> str:
    v0 = f"1.0 / sqrt({DIM}.0)"
    ctes = [
        "e AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings)",
        "n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS cnt FROM e)",
        f"mu0 AS (SELECT i-1 AS pos,"
        f" CAST(SUM(CAST(floor(v[i] * 1e7 + 0.5) AS BIGINT)) AS DOUBLE)"
        f" / 1e7 / n.cnt AS m FROM e, n, range(1,{DIM + 1}) r(i)"
        f" GROUP BY i-1, n.cnt)",
        "mu AS (SELECT list(m ORDER BY pos) AS mu FROM mu0)",
        f"v0 AS (SELECT list_transform(range(1,{DIM + 1}), i -> {v0}) AS vl)",
    ]
    prev = "v0"
    for k in range(1, ITERS + 1):
        ctes += [
            f"c{k} AS (SELECT list_transform(list_zip(v, mu.mu), p -> p[1]-p[2]) AS c"
            f" FROM e, mu)",
            f"p{k} AS (SELECT c, ROUND(list_sum(list_transform(list_zip(c, {prev}.vl),"
            f" p -> p[1]*p[2])), 9) AS yv FROM c{k}, {prev})",
            f"u{k} AS (SELECT i-1 AS pos,"
            f" CAST(SUM(CAST(ROUND(c[i],9) AS DECIMAL(18,9))"
            f" * CAST(yv AS DECIMAL(18,9))) AS DOUBLE) / n.cnt AS u"
            f" FROM p{k}, n, range(1,{DIM + 1}) r(i) GROUP BY i-1, n.cnt)",
            f"ul{k} AS (SELECT list(u ORDER BY pos) AS ul FROM u{k})",
            f"nm{k} AS (SELECT ul, sqrt(list_sum(list_transform(ul, x -> x*x)))"
            f" AS norm FROM ul{k})",
            f"v{k} AS (SELECT list_transform(ul, x -> x / norm) AS vl, norm"
            f" FROM nm{k})",
        ]
        prev = f"v{k}"
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT CAST(i-1 AS INTEGER) AS pos, ROUND(vl[i], 9) AS pc1,"
        f" ROUND(norm, 6) AS eigenvalue FROM v{ITERS}, range(1,{DIM + 1}) r(i)"
    )


SQL_EMBEDDING_PCA_POWER = _pca_oracle()


QUERIES: dict[str, Query] = {
    "embedding_linear_probe": Query(
        q_embedding_linear_probe, SQL_EMBEDDING_LINEAR_PROBE
    ),
    "embedding_pca_power": Query(q_embedding_pca_power, SQL_EMBEDDING_PCA_POWER),
    "quality_classifier_apply": Query(
        q_quality_classifier_apply, SQL_QUALITY_CLASSIFIER_APPLY
    ),
    "quality_calibration_report": Query(
        q_quality_calibration_report, SQL_QUALITY_CALIBRATION_REPORT
    ),
}
