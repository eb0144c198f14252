"""Hash-graded twins of the remaining rows-only sketch arms (EXT;
round 4): MinHash-LSH, SimHash, winnowing fingerprints, and a
HyperLogLog distinct counter with engine-reproducible parameters and
FULL DuckDB oracles.

The production arms (``operators/dedup.py``, ``operators/text_fp.py``)
use numpy-vectorized kernels whose hash families are engine-specific,
so the driver can only rows-check them. These twins replay the
``similarity_ann_recall`` / ``dedup_semantic_graded`` recipe: derive
every random-looking quantity from ``md5`` — which both Spark and
DuckDB compute byte-identically — so bucketing, banding, collision
pairs and tie-breaks are all value-hash-verified end to end. The
SKETCH SEMANTICS are identical to the production arms (same band/row
shapes, same pair predicates); only the hash family changes.

100 TB design notes (shared with the production arms):
- MinHash: signatures are one (doc, term)-distinct shuffle + one
  doc-keyed agg; candidate generation is a band-keyed self-join —
  O(n·bands) rows move, never all-pairs.
- SimHash: bit votes are a uniform (doc, bit)-keyed agg (64-way
  fan-out of the term stream, map-side combinable); pairs come from
  8-bit band buckets, a pigeonhole guarantee for hamming ≤ bands-1.
- Winnowing: per-doc window minima — embarrassingly parallel, the
  only shuffle is the posexplode repartition; fingerprint count per
  doc is bounded by gram count / w on average (SIGMOD 2003 §4).

Reference: the reference engine has no sketches (SURVEY §2 legend —
whole family is EXT); parity target is the production arms' semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import tokens as _tokens
from ..sources import table
from .base import Query

# --- MinHash-LSH (graded): 16 md5-permutations, 4 bands x 4 rows ---
MH_PERMS = 16
MH_BANDS = 4
MH_ROWS = MH_PERMS // MH_BANDS


def _mh_hash(perm: int, term) -> F.Column:
    """60-bit md5-derived hash of (perm, term) — the 'permutation'."""
    h = F.md5(F.concat(F.lit(f"{perm}|"), term))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("long")


def q_dedup_minhash_graded(spark: SparkSession, sf: str) -> DataFrame:
    """MinHash+LSH candidate pairs, fully hash-verified: per doc the
    16-slot signature is MIN over the term set of 16 md5-derived hash
    functions (one distinct-(doc,term) shuffle, one doc-keyed agg with
    16 map-side-combinable MINs); signatures are cut into 4 bands of 4
    and docs colliding on any band's md5 become candidates. Output is
    every candidate pair with the number of colliding bands — exactly
    the production ``dedup_minhash_lsh`` shape (operators/dedup.py)
    with the numpy KM-permutation family swapped for md5 so DuckDB
    reproduces signatures, bands, pairs AND counts bit-for-bit.

    Scale: rows moved = O(docs·bands); the band self-join only meets
    rows inside a bucket. No all-pairs term anywhere."""
    d = table(spark, sf, "documents")
    dt = d.select(
        "doc_id", F.explode(F.array_distinct(_tokens(F.col("text")))).alias("term")
    )
    sig = dt.groupBy("doc_id").agg(
        *[
            F.min(_mh_hash(i, F.col("term"))).alias(f"h{i}")
            for i in range(MH_PERMS)
        ]
    ).localCheckpoint(eager=True)
    bands = sig.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.md5(
                        F.concat_ws(
                            ",",
                            *[
                                F.col(f"h{b * MH_ROWS + r}").cast("string")
                                for r in range(MH_ROWS)
                            ],
                        )
                    )
                    for b in range(MH_BANDS)
                ]
            )
        ).alias("band", "bsig"),
    )
    left = bands.alias("a")
    right = bands.alias("b")
    return (
        left.join(
            right,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bsig") == F.col("b.bsig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_bands"))
    )


def _sql_mh_hash(perm: int, term: str) -> str:
    return f"('0x' || substr(md5('{perm}|' || {term}), 1, 15))::BIGINT"


SQL_DEDUP_MINHASH_GRADED = f"""
WITH dt AS (
  SELECT DISTINCT doc_id,
    unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                       x -> x <> '')) AS term
  FROM documents
),
sig AS (
  SELECT doc_id,
    {", ".join(f"MIN({_sql_mh_hash(i, 'term')}) AS h{i}" for i in range(MH_PERMS))}
  FROM dt GROUP BY doc_id
),
bands AS (
  SELECT doc_id, b.band,
    CASE b.band
      {" ".join(
        "WHEN {b} THEN md5({expr})".format(
            b=b,
            expr=" || ',' || ".join(
                f"CAST(h{b * MH_ROWS + r} AS VARCHAR)" for r in range(MH_ROWS)
            ),
        )
        for b in range(MH_BANDS)
      )}
    END AS bsig
  FROM sig, (SELECT unnest(range({MH_BANDS})) AS band) b
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_bands
FROM bands a JOIN bands b
  ON a.band = b.band AND a.bsig = b.bsig AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
"""


# --- SimHash (graded): 32-bit md5-derived signature, 4 bands x 8 bits ---
SH_BITS = 32
SH_BANDS = 4
SH_BAND_BITS = SH_BITS // SH_BANDS
SH_MAX_HAMMING = 3  # = SH_BANDS - 1, the bound for which banding is exhaustive


def q_dedup_simhash_graded(spark: SparkSession, sf: str) -> DataFrame:
    """SimHash near-dup candidates, fully hash-verified: every term
    gets a 32-bit md5-derived hash; each signature bit is the sign of
    the term-frequency-weighted vote over that bit (+tf if set, -tf if
    clear; vote<=0 -> 0, matching the production numpy arm's strict
    sign rule). Candidate pairs collide on one of 4 byte-bands and are
    kept when bit_count(xor) <= {SH_MAX_HAMMING}. The threshold equals
    bands-1, the pigeonhole guarantee: any pair within it MUST share a
    band, so banding is exhaustive (a larger threshold would silently
    drop qualifying pairs whose differing bits spread across all
    bands). Same sound predicate as the production
    ``operators/dedup.py`` arm; md5 bit votes make signature, bands,
    xor distance and the pair set DuckDB-exact.

    Scale: the vote stream is (doc, term, tf) x 32 — a uniform fan-out
    aggregated map-side on (doc, bit); pairs never leave band buckets."""
    d = table(spark, sf, "documents")
    tf = (
        d.select("doc_id", F.explode(_tokens(F.col("text"))).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    h32 = F.conv(F.substring(F.md5(F.col("term")), 1, 8), 16, 10).cast("long")
    # all 32 bit-votes as agg columns of ONE doc-keyed groupBy: no 32x
    # fan-out of the term stream and one shuffle instead of two (the
    # (doc,bit)-keyed formulation costs an extra exchange for nothing)
    votes = tf.withColumn("h", h32).groupBy("doc_id").agg(
        *[
            F.sum(F.expr(f"tf * (2 * ((h >> {b}) & 1) - 1)")).alias(f"v{b}")
            for b in range(SH_BITS)
        ]
    )
    sig = votes.select(
        "doc_id",
        sum(
            (
                F.when(F.col(f"v{b}") > 0, F.lit(1 << b).cast("long")).otherwise(
                    F.lit(0).cast("long")
                )
                for b in range(SH_BITS)
            ),
            F.lit(0).cast("long"),
        ).alias("sig"),
    )
    bands = sig.select(
        "doc_id",
        "sig",
        F.explode(F.sequence(F.lit(0), F.lit(SH_BANDS - 1))).alias("band"),
    ).withColumn(
        "bval",
        F.expr(f"(sig >> (band * {SH_BAND_BITS})) & {(1 << SH_BAND_BITS) - 1}"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bval") == F.col("b.bval"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(F.col("a.sig").bitwiseXOR(F.col("b.sig"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= SH_MAX_HAMMING)
        .distinct()
    )
    return pairs


SQL_DEDUP_SIMHASH_GRADED = f"""
WITH tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM (
    SELECT doc_id,
      unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         x -> x <> '')) AS term
    FROM documents
  ) GROUP BY doc_id, term
),
votes AS (
  SELECT doc_id, b.bit,
    SUM(tf * (2 * ((('0x' || substr(md5(term),1,8))::BIGINT >> b.bit) & 1) - 1)) AS v
  FROM tf, (SELECT unnest(range({SH_BITS})) AS bit) b
  GROUP BY doc_id, b.bit
),
sig AS (
  SELECT doc_id,
    SUM(CASE WHEN v > 0 THEN (1::BIGINT << bit) ELSE 0 END)::BIGINT AS sig
  FROM votes GROUP BY doc_id
),
bands AS (
  SELECT doc_id, sig, b.band,
    (sig >> (b.band * {SH_BAND_BITS})) & {(1 << SH_BAND_BITS) - 1} AS bval
  FROM sig, (SELECT unnest(range({SH_BANDS})) AS band) b
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
  CAST(bit_count(xor(a.sig, b.sig)) AS INTEGER) AS hamming
FROM bands a JOIN bands b
  ON a.band = b.band AND a.bval = b.bval AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.sig, b.sig)) <= {SH_MAX_HAMMING}
"""


# --- Winnowing (graded): k-token grams, window minima, md5 hashes ---
WN_K = 3  # tokens per gram
WN_W = 4  # grams per window


def q_text_winnow_graded(spark: SparkSession, sf: str) -> DataFrame:
    """Winnowed fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD 2003)
    over token {WN_K}-grams with md5 gram hashes: slide a window of
    {WN_W} gram hashes per doc, keep each full window's minimum
    (rightmost position on ties — the paper's rule), emit the distinct
    selected (hash, position) fingerprints. Guarantees any shared
    token run of >= w+k-1 tokens contributes a shared fingerprint.
    The production ``text_winnow_fingerprint`` runs a numpy rolling
    hash per doc (rows-only); this twin is the same selection
    algorithm over an md5 gram family both engines compute.

    Scale: per-doc window minima — the tokenize posexplode feeds ONE
    doc-keyed exchange that every window below reuses (lead-grams,
    partition count, frame minima share the same partitioning); grams
    are hashed row-wise in codegen, never inside a higher-order array
    function (the array-transform formulation re-evaluated the md5
    array inside Generate: measured 22.3 s -> 1.0 s at sf0.1)."""
    d = table(spark, sf, "documents")
    pos = d.select(
        "doc_id", F.posexplode(_tokens(F.col("text"))).alias("p", "tok")
    )
    w = Window.partitionBy("doc_id").orderBy("p")
    gram = (
        pos.select(
            "doc_id",
            "p",
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            " ",
                            "tok",
                            *[F.lead("tok", j).over(w) for j in range(1, WN_K)],
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            )
            .cast("long")
            .alias("h"),
            (
                F.count(F.lit(1)).over(Window.partitionBy("doc_id")) - (WN_K - 1)
            ).alias("g"),
            F.lead("tok", WN_K - 1).over(w).alias("_full"),
        )
        # keep only positions that start a FULL k-gram (short docs and
        # the last k-1 positions yield none — the ADVICE short-doc rule)
        .filter(F.col("_full").isNotNull())
        .drop("_full")
    )
    # full windows only: starts s in [0, g-w]; frame = s..s+w-1
    win = (
        Window.partitionBy("doc_id")
        .orderBy("p")
        .rowsBetween(Window.currentRow, WN_W - 1)
    )
    sel = (
        gram.withColumn(
            "m", F.min(F.struct(F.col("h"), (-F.col("p")).alias("np"))).over(win)
        )
        .filter(F.col("p") <= F.col("g") - WN_W)
        .select(
            "doc_id",
            F.col("m.h").alias("fp"),
            (-F.col("m.np")).cast("int").alias("fp_pos"),
        )
        .distinct()
    )
    return sel


SQL_TEXT_WINNOW_GRADED = f"""
WITH toks AS (
  SELECT doc_id,
    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS t
  FROM documents
),
grams AS (
  SELECT doc_id, len(t) - {WN_K} AS maxp, i - 1 AS p,
    ('0x' || substr(md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2]), 1, 15))::BIGINT AS h
  FROM toks, range(1, 100000) r(i)
  WHERE len(t) >= {WN_K} AND i <= len(t) - {WN_K} + 1
),
sel AS (
  SELECT g.doc_id, w.h AS fp, w.p AS fp_pos,
    ROW_NUMBER() OVER (PARTITION BY g.doc_id, g.p ORDER BY w.h ASC, w.p DESC) AS rk
  FROM grams g JOIN grams w
    ON w.doc_id = g.doc_id AND w.p BETWEEN g.p AND g.p + {WN_W - 1}
  WHERE g.p <= g.maxp - {WN_W - 1}
)
SELECT DISTINCT doc_id, fp, CAST(fp_pos AS INTEGER) AS fp_pos FROM sel WHERE rk = 1
"""


# --- HyperLogLog (graded): p=8 -> 256 registers, md5-derived hash ---
HLL_P = 8
HLL_M = 1 << HLL_P  # 256 registers
# Flajolet et al. 2007 bias constant for m >= 128; computed ONCE in
# Python and inlined as the same repr-literal into both engines, so
# each side performs exactly one IEEE division on identical doubles.
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)
HLL_NUMERATOR = HLL_ALPHA * HLL_M * HLL_M


def hll_registers(df: DataFrame, group_col: str, value) -> DataFrame:
    """(group, bucket, mreg) HLL register table for ``value`` within
    each group — the mergeable sketch state: registers of a UNION of
    corpora are the bucket-wise MAX of each corpus's registers
    (asserted in tests/test_round4_ops.py). Shared by the graded query
    so the merge property is tested against the production layout."""
    h = F.md5(F.concat(F.lit("hll|"), value.cast("string")))
    x = F.conv(F.substring(h, 3, 8), 16, 10).cast("long")
    rho = F.when(x == 0, F.lit(33)).otherwise(
        F.lit(33) - F.length(F.conv(x.cast("string"), 10, 2))
    )
    return (
        df.select(
            group_col,
            F.conv(F.substring(h, 1, 2), 16, 10).cast("int").alias("bucket"),
            rho.alias("rho"),
        )
        .groupBy(group_col, "bucket")
        .agg(F.max("rho").alias("mreg"))
    )


def q_hll_distinct_graded(spark: SparkSession, sf: str) -> DataFrame:
    """HyperLogLog distinct-user count per event type, fully
    hash-verified — the graded twin of the rows-only
    ``approx_distinct_rollup`` arm, completing the sketch family
    (CMS, Bloom, GK/percentile, MinHash, SimHash, winnowing all have
    graded twins; HLL was the last rows-only-only sketch).

    Engine-reproducible layout (Flajolet et al. 2007): h = md5 of the
    user id; register index = first 8 hash bits; rho = position of the
    leftmost 1-bit of the next 32 bits (33 if all zero), computed as
    33 - bit_length via integer base-2 string conversion — NO float
    log, so both engines agree exactly. The estimate
    alpha·m²/Σ 2^-M[j] stays bit-deterministic because every addend is
    an exact power of two (1.0 / (1 << M), never libm pow): the sum of
    ≤256 multiples of 2^-33 bounded by 256 needs 41 mantissa bits < 53,
    so it is EXACT in double regardless of accumulation order — the
    one property that lets a float estimate survive the value hash.
    Small-range correction (the paper's E ≤ 2.5m branch) switches to
    linear counting m·ln(m/V) over the V zero registers; the branch
    predicate compares bit-identical doubles so both engines take the
    same arm, and the single ln follows the suite's precedent of
    trusting both libms on identical inputs (curation4 char entropy).

    Scale: NO distinct pre-aggregation — max(rho) is idempotent under
    duplicates, which is HLL's entire point. One uniform
    (type, register)-keyed shuffle with map-side combine collapses the
    raw event stream to ≤ types×256 cells; registers merge across
    corpora by MAX (mergeability is what `approx_count_distinct`
    exploits too). The exact COUNT DISTINCT column exists only to
    exhibit the error and costs one pair-distinct shuffle the sketch
    itself never needs. Reference has no sketches (SURVEY §2 — EXT).
    """
    e = table(spark, sf, "events")
    regs = hll_registers(e, "event_type", F.col("user_id"))
    agg = regs.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("observed_buckets"),
        F.sum(
            F.lit(1.0)
            / F.expr("CAST(shiftleft(CAST(1 AS BIGINT), mreg) AS DOUBLE)")
        ).alias("s_obs"),
    )
    exact = e.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_distinct")
    )
    raw = F.lit(HLL_NUMERATOR) / (
        F.col("s_obs") + (F.lit(HLL_M) - F.col("observed_buckets"))
    )
    zeros = F.lit(HLL_M) - F.col("observed_buckets")
    corrected = F.when(
        (raw <= F.lit(2.5 * HLL_M)) & (zeros > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / zeros),
    ).otherwise(raw)
    return (
        agg.join(exact, "event_type")
        .select(
            "event_type",
            "exact_distinct",
            "observed_buckets",
            F.round(corrected, 4).alias("hll_estimate"),
        )
        .orderBy("event_type")
    )


SQL_HLL_DISTINCT_GRADED = f"""
WITH h AS (
  SELECT event_type,
    ('0x' || substr(md5('hll|' || CAST(user_id AS VARCHAR)), 1, 2))::INT AS bucket,
    ('0x' || substr(md5('hll|' || CAST(user_id AS VARCHAR)), 3, 8))::BIGINT AS x
  FROM events
),
regs AS (
  SELECT event_type, bucket,
    MAX(CASE WHEN x = 0 THEN 33 ELSE 33 - length(to_base(x, 2)) END) AS mreg
  FROM h GROUP BY event_type, bucket
),
agg AS (
  SELECT event_type, COUNT(*) AS observed_buckets,
    SUM(CAST(1 AS DOUBLE) / CAST((1::BIGINT << mreg) AS DOUBLE)) AS s_obs
  FROM regs GROUP BY event_type
),
ex AS (
  SELECT event_type, COUNT(DISTINCT user_id) AS exact_distinct
  FROM events GROUP BY event_type
),
est AS (
  SELECT event_type, observed_buckets,
    {HLL_NUMERATOR!r} / (s_obs + ({HLL_M} - observed_buckets)) AS raw,
    {HLL_M} - observed_buckets AS zeros
  FROM agg
)
SELECT e.event_type, ex.exact_distinct, e.observed_buckets,
  ROUND(CASE WHEN e.raw <= {2.5 * HLL_M!r} AND e.zeros > 0
             THEN CAST({HLL_M} AS DOUBLE) * ln(CAST({HLL_M} AS DOUBLE) / e.zeros)
             ELSE e.raw END, 4) AS hll_estimate
FROM est e JOIN ex USING (event_type)
ORDER BY event_type
"""


AUDIT_DOCS = 200  # calibration sample: all docs with doc_id < 200


def q_dedup_minhash_jaccard_est(spark: SparkSession, sf: str) -> DataFrame:
    """Sketch-accuracy audit for MinHash: for every LSH candidate pair,
    the signature-agreement Jaccard estimate (matching slots / 16)
    next to the EXACT token-set Jaccard and the absolute error — the
    same evidence upgrade the ANN arms got from recall@k: the sketch
    doesn't just emit candidates, its estimation error is measured and
    hash-verified. E[matching/perms] = J is the MinHash identity
    (Broder 1997); with 16 perms the audit exhibits the +-1/sqrt(16)
    noise band the production 128-perm arm shrinks 2.8x further.

    Determinism: matching-slot count and inter/union sizes are
    integers; est = k/16 is an exact dyadic double; exact_jaccard is
    one correctly-rounded division — nothing in the output depends on
    accumulation order.

    Plan: a calibration job measures estimator error on a bounded
    deterministic sample, never on every candidate (the 4-band unigram
    twin is deliberately permissive — its candidate count is
    cluster-quadratic, 6M+ at sf0.1, which is fine for its own
    dedup purpose but not for an audit join). The sample here is the
    doc_id < AUDIT_DOCS prefix, a predicate that PUSHES DOWN to the
    parquet scan — signatures, bands, the band self-join and both
    posting-list joins all run on the 200-doc sample, so audit cost is
    O(sample), independent of corpus size. Candidate pairs within the
    sample come from the SAME band-join shape as
    ``dedup_minhash_graded``."""
    d = table(spark, sf, "documents").filter(F.col("doc_id") < AUDIT_DOCS)
    # Round-12 optimization (guide §2.4): the sample term stream (4
    # plan references), signatures (3), sizes (2) and candidate pairs
    # (2) are each sample-bounded (≤ AUDIT_DOCS docs) — materialize
    # them once instead of replaying the tokenize/signature pipeline
    # per reference (36 Exchanges / 20 parquet scans → 6 / 0)
    dt = d.select(
        "doc_id", F.explode(F.array_distinct(_tokens(F.col("text")))).alias("term")
    ).localCheckpoint(eager=True)
    sizes = (
        dt.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("sz"))
        .localCheckpoint(eager=True)
    )
    sig = dt.groupBy("doc_id").agg(
        *[
            F.min(_mh_hash(i, F.col("term"))).alias(f"h{i}")
            for i in range(MH_PERMS)
        ]
    )
    bands = sig.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.md5(
                        F.concat_ws(
                            ",",
                            *[
                                F.col(f"h{b * MH_ROWS + r}").cast("string")
                                for r in range(MH_ROWS)
                            ],
                        )
                    )
                    for b in range(MH_BANDS)
                ]
            )
        ).alias("band", "bsig"),
    )
    pairs = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bsig") == F.col("b.bsig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    sa = sig.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"h{i}").alias(f"a{i}") for i in range(MH_PERMS)],
    )
    sb = sig.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"h{i}").alias(f"b{i}") for i in range(MH_PERMS)],
    )
    matching = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
        for i in range(MH_PERMS)
    )
    est = sa.join(F.broadcast(pairs), "doc_a").join(
        sb, "doc_b"
    ).select("doc_a", "doc_b", matching.alias("k"))
    pt = dt.join(F.broadcast(pairs), dt.doc_id == pairs.doc_a).select(
        "doc_a", "doc_b", "term"
    )
    dtb = dt.select(F.col("doc_id").alias("db"), F.col("term").alias("tb"))
    inter = (
        pt.join(dtb, (pt.doc_b == dtb.db) & (pt.term == dtb.tb))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        est.join(inter, ["doc_a", "doc_b"])
        .join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sza")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("szb")), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (F.col("k").cast("double") / F.lit(float(MH_PERMS))).alias("est_jaccard"),
            F.round(
                F.col("inter").cast("double")
                / (F.col("sza") + F.col("szb") - F.col("inter")),
                9,
            ).alias("exact_jaccard"),
            F.round(
                F.abs(
                    F.col("k").cast("double") / F.lit(float(MH_PERMS))
                    - F.col("inter").cast("double")
                    / (F.col("sza") + F.col("szb") - F.col("inter"))
                ),
                9,
            ).alias("abs_err"),
        )
    )


SQL_DEDUP_MINHASH_JACCARD_EST = f"""
WITH dt AS (
  SELECT DISTINCT doc_id,
    unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                       x -> x <> '')) AS term
  FROM documents WHERE doc_id < {AUDIT_DOCS}
),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM dt GROUP BY doc_id),
sig AS (
  SELECT doc_id,
    {", ".join(f"MIN({_sql_mh_hash(i, 'term')}) AS h{i}" for i in range(MH_PERMS))}
  FROM dt GROUP BY doc_id
),
bands AS (
  SELECT doc_id, b.band,
    CASE b.band
      {" ".join(
        "WHEN {b} THEN md5({expr})".format(
            b=b,
            expr=" || ',' || ".join(
                f"CAST(h{b * MH_ROWS + r} AS VARCHAR)" for r in range(MH_ROWS)
            ),
        )
        for b in range(MH_BANDS)
      )}
    END AS bsig
  FROM sig, (SELECT unnest(range({MH_BANDS})) AS band) b
),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bsig = b.bsig AND a.doc_id < b.doc_id
),
est AS (
  SELECT p.doc_a, p.doc_b,
    {" + ".join(f"CASE WHEN sa.h{i} = sb.h{i} THEN 1 ELSE 0 END" for i in range(MH_PERMS))} AS k
  FROM pairs p
  JOIN sig sa ON sa.doc_id = p.doc_a
  JOIN sig sb ON sb.doc_id = p.doc_b
),
inter AS (
  SELECT p.doc_a, p.doc_b, COUNT(*) AS i
  FROM pairs p
  JOIN dt ta ON ta.doc_id = p.doc_a
  JOIN dt tb ON tb.doc_id = p.doc_b AND tb.term = ta.term
  GROUP BY p.doc_a, p.doc_b
)
SELECT e.doc_a, e.doc_b,
  CAST(e.k AS DOUBLE) / {float(MH_PERMS)!r} AS est_jaccard,
  ROUND(CAST(i.i AS DOUBLE) / (za.sz + zb.sz - i.i), 9) AS exact_jaccard,
  ROUND(abs(CAST(e.k AS DOUBLE) / {float(MH_PERMS)!r}
            - CAST(i.i AS DOUBLE) / (za.sz + zb.sz - i.i)), 9) AS abs_err
FROM est e
JOIN inter i ON i.doc_a = e.doc_a AND i.doc_b = e.doc_b
JOIN sizes za ON za.doc_id = e.doc_a
JOIN sizes zb ON zb.doc_id = e.doc_b
"""


QUERIES: dict[str, Query] = {
    "dedup_minhash_graded": Query(q_dedup_minhash_graded, SQL_DEDUP_MINHASH_GRADED),
    "dedup_simhash_graded": Query(q_dedup_simhash_graded, SQL_DEDUP_SIMHASH_GRADED),
    "text_winnow_graded": Query(q_text_winnow_graded, SQL_TEXT_WINNOW_GRADED),
    "hll_distinct_graded": Query(q_hll_distinct_graded, SQL_HLL_DISTINCT_GRADED),
    "dedup_minhash_jaccard_est": Query(
        q_dedup_minhash_jaccard_est, SQL_DEDUP_MINHASH_JACCARD_EST
    ),
}
