"""Training-data pipeline depth, round 4 wave 3 (EXT): BPE merge
learning, span-level cut application, and reproducible dataset splits.

- ``tokenizer_bpe_train`` — the first 3 merge steps of byte-pair
  encoding (Sennrich et al. 2016) learned DISTRIBUTED in the paper's
  dictionary formulation: one corpus-sized word-count shuffle, then
  every merge iteration runs on the (word, freq) vocabulary only.
- ``dedup_span_removal`` — applies the Lee et al. 2022 repeated-span
  signal: tokens covered by any corpus-repeated 10-token window are
  cut, and the query reports exactly how much of each document
  survives (the transform the detection query only scores).
- ``dataset_split`` — deterministic hash-bucketed train/valid/test
  assignment (90/5/5) with per-(split, language) doc and token
  accounting — the reproducible-split contract every training run
  depends on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import tokens
from ..sources import table
from .base import Query
from .curation2 import SQL_TOKS_WINDOWS_CTE

BPE_MERGES = 3


def _pair_top1(sym_df: DataFrame) -> DataFrame:
    """Most frequent adjacent symbol pair, weighted by word frequency
    (1 row: a, b, cnt).

    Pairs with a == b are excluded so every occurrence of the winning
    pair is non-overlapping and the merge can be applied as one
    position-parallel map (greedy left-to-right and simultaneous
    replacement agree exactly when the two halves differ). The pair
    count is a map-side-combinable aggregate over the VOCABULARY (not
    the corpus); top-1 is TakeOrderedAndProject. Ties break
    lexicographically on (a, b)."""
    pairs = sym_df.filter(F.size("t") >= 2).select(
        "freq",
        F.explode(
            F.zip_with(
                F.slice("t", 1, F.size("t") - 1),
                F.slice("t", 2, F.size("t") - 1),
                lambda x, y: F.struct(x.alias("a"), y.alias("b")),
            )
        ).alias("p"),
    )
    return (
        pairs.select("freq", "p.a", "p.b")
        .filter(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.sum("freq").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
        .limit(1)
    )


def _apply_merge(sym_df: DataFrame, top1: DataFrame) -> DataFrame:
    """Rewrite every word's symbol array, fusing each (a, b) adjacency
    into the concatenated symbol "ab". The 1-row winner arrives by
    broadcast crossJoin (in-plan, no collect); the rewrite itself is a
    pure map over 0-based positions using null-safe ``get``
    (out-of-bounds → NULL → condition false), so short arrays never
    error. Position i becomes the fused symbol when (t[i], t[i+1])
    matches, is dropped when (t[i-1], t[i]) matches, and passes
    through otherwise — a != b guarantees the two conditions never
    both fire."""
    j = sym_df.crossJoin(
        F.broadcast(top1.select(F.col("a").alias("pa"), F.col("b").alias("pb")))
    )
    merged = F.filter(
        F.transform(
            F.sequence(F.lit(0), F.size("t") - 1),
            lambda i: F.when(
                (F.get("t", i) == F.col("pa"))
                & (F.get("t", i + 1) == F.col("pb")),
                F.concat(F.col("pa"), F.col("pb")),
            )
            .when(
                (i > 0)
                & (F.get("t", i - 1) == F.col("pa"))
                & (F.get("t", i) == F.col("pb")),
                F.lit(None).cast("string"),
            )
            .otherwise(F.get("t", i)),
        ),
        lambda x: x.isNotNull(),
    )
    return j.select("w", "freq", merged.alias("t"))


def q_tokenizer_bpe_train(spark: SparkSession, sf: str) -> DataFrame:
    """First {BPE_MERGES} character-level BPE merges (Sennrich et al.
    2016, the dictionary formulation the reference implementation
    actually uses): the corpus is collapsed ONCE into a (word, freq)
    vocabulary, words split into character symbols, and every merge
    iteration runs entirely on that vocabulary with pair counts
    weighted by word frequency.

    This is the shape that survives 100 TB: the corpus-sized work is a
    single token-explode + word-count shuffle (map-side combined, and
    Catalyst's exchange reuse computes it once even though three
    iterations' lineages reference it); each of the thousands of merge
    steps a real trainer runs then touches only |vocab| rows (Heaps'
    law: ~n^0.5), with a 1-row TakeOrderedAndProject winner broadcast
    back in-plan and a zero-shuffle position-parallel rewrite. Nothing
    driver-side ever holds more than the winning pair. Output: the
    learned merge table (rank, left/right symbol, weighted support)."""
    d = table(spark, sf, "documents")
    words = (
        d.select(F.explode(tokens("text")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    # materialize the vocab ONCE (same localCheckpoint pattern as
    # graph_triangle_count): the three iterations' union branches each
    # re-derive their inputs from lineage, which doubles the corpus
    # scans per merge (measured 7 parquet scans for 3 merges); the
    # checkpoint truncates all of them to one corpus pass + a
    # vocab-sized cached RDD.
    words = words.localCheckpoint()
    t = words.select(
        "w",
        "freq",
        F.transform(
            F.sequence(F.lit(1), F.length("w")),
            lambda i: F.col("w").substr(i, F.lit(1)),
        ).alias("t"),
    ).filter(F.size("t") >= 2)
    out = []
    for rank in range(1, BPE_MERGES + 1):
        # Round-12 optimization (guide §2.4): each 1-row winner is
        # referenced by BOTH the output branch and the next merge's
        # rewrite, and its lineage carries every earlier merge — the
        # final 3-branch union replayed the whole pair-count chain per
        # branch (22 Exchanges). Materializing the single winner row
        # truncates that: each pair aggregate now runs exactly once.
        top1 = _pair_top1(t).localCheckpoint(eager=True)
        out.append(
            top1.select(
                F.lit(rank).alias("merge_rank"),
                F.col("a").alias("left_sym"),
                F.col("b").alias("right_sym"),
                F.col("cnt").alias("pair_count"),
            )
        )
        if rank < BPE_MERGES:
            t = _apply_merge(t, top1)
    res = out[0]
    for o in out[1:]:
        res = res.unionAll(o)
    return res


def _sql_bpe() -> str:
    head = """
WITH words AS (
  SELECT w, COUNT(*) AS freq FROM (
    SELECT unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                  x -> x <> '')) AS w
    FROM documents
  ) GROUP BY w
),
t1 AS (
  SELECT w, freq,
    list_transform(range(1, len(w) + 1), i -> substr(w, CAST(i AS INTEGER), 1)) AS ts
  FROM words WHERE len(w) >= 2
)"""
    parts = [head]
    for r in range(1, BPE_MERGES + 1):
        parts.append(f""",
p{r} AS (
  SELECT ts[i] AS a, ts[i+1] AS b, CAST(SUM(freq) AS BIGINT) AS cnt
  FROM t{r}, range(1, 10000) q(i)
  WHERE i + 1 <= len(ts) AND ts[i] <> ts[i+1]
  GROUP BY 1, 2
),
b{r} AS (SELECT a AS pa, b AS pb, cnt FROM p{r} ORDER BY cnt DESC, a ASC, b ASC LIMIT 1)""")
        if r < BPE_MERGES:
            parts.append(f""",
t{r + 1} AS (
  SELECT w, freq,
    list_filter(list_transform(range(1, len(ts) + 1), i ->
      CASE WHEN ts[i] = b{r}.pa AND ts[i+1] = b{r}.pb THEN b{r}.pa || b{r}.pb
           WHEN i > 1 AND ts[i-1] = b{r}.pa AND ts[i] = b{r}.pb THEN NULL
           ELSE ts[i] END), x -> x IS NOT NULL) AS ts
  FROM t{r}, b{r}
)""")
    sel = "\nUNION ALL\n".join(
        f"SELECT {r} AS merge_rank, pa AS left_sym, pb AS right_sym, cnt AS pair_count FROM b{r}"
        for r in range(1, BPE_MERGES + 1)
    )
    parts.append("\n" + sel)
    return "".join(parts)


SPAN_N = 10


def q_dedup_span_removal(spark: SparkSession, sf: str) -> DataFrame:
    """Span-cut accounting: a token is removed when ANY corpus-repeated
    {SPAN_N}-token window covers it (Lee et al. 2022's ExactSubstr cut
    rule — the sibling query ``dedup_repeated_substrings`` only scores
    windows; this one applies the cut and reports what survives).

    Plan: position-preserving hashed windows (longs, never text), one
    uniform window-hash aggregate for global counts, join-back, then
    covered positions explode into at most {SPAN_N} rows per repeated
    window before a doc-keyed distinct — every shuffle key is uniform
    and the covered stream is bounded by {SPAN_N}× the repeated-window
    count, not by corpus size. Short docs yield zero windows (same
    guard as the detection query) and come back whole. Window building
    is ``curation2.window_hash_frames`` — the SAME implementation the
    detection query uses, so tokenization, window size and the
    short-doc guard cannot drift between score and cut."""
    from .curation2 import window_hash_frames

    n = SPAN_N
    bound, wins = window_hash_frames(spark, sf, n)
    counts = wins.groupBy("whash").agg(F.count(F.lit(1)).alias("c"))
    covered = (
        wins.join(counts.filter(F.col("c") > 1).select("whash"), "whash")
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + (n - 1))
            ).alias("tp"),
        )
        .distinct()
    )
    removed = covered.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_removed"))
    base = bound.select("doc_id", F.size("hts").alias("n_tokens"))
    return (
        base.join(removed, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("n_removed", F.lit(0)).alias("n_removed"),
            (F.col("n_tokens") - F.coalesce("n_removed", F.lit(0))).alias(
                "kept_tokens"
            ),
            F.when(F.col("n_tokens") == 0, F.lit(0.0))
            .otherwise(
                F.round(
                    F.coalesce("n_removed", F.lit(0))
                    / F.col("n_tokens").cast("double"),
                    9,
                )
            )
            .alias("removed_frac"),
        )
    )


SQL_DEDUP_SPAN_REMOVAL = SQL_TOKS_WINDOWS_CTE + f""",
counts AS (SELECT win FROM w GROUP BY win HAVING COUNT(*) > 1),
cov AS (
  SELECT DISTINCT w.doc_id, w.pos + j AS tp
  FROM w JOIN counts USING (win), range(0, {SPAN_N}) r(j)
),
removed AS (SELECT doc_id, COUNT(*) AS n_removed FROM cov GROUP BY doc_id)
SELECT t.doc_id, len(t.ts) AS n_tokens,
  COALESCE(r.n_removed, 0) AS n_removed,
  len(t.ts) - COALESCE(r.n_removed, 0) AS kept_tokens,
  CASE WHEN len(t.ts) = 0 THEN 0.0
       ELSE ROUND(COALESCE(r.n_removed, 0) / CAST(len(t.ts) AS DOUBLE), 9)
  END AS removed_frac
FROM toks t LEFT JOIN removed r USING (doc_id)
"""


def q_dataset_split(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic 90/5/5 train/valid/test split with per-(split,
    lang) accounting — the reproducible-split contract: assignment
    depends only on doc_id (md5 bucket, the engine-reproducible hash
    recipe shared with the CMS/Bloom sketches), so re-runs, backfills
    and other engines all agree on membership with NO stored split
    table. The assignment is a zero-shuffle map; the audit is one
    (split, lang)-keyed aggregate over ~|splits|·|langs| cells, and the
    share-of-split window runs over those aggregated cells only."""
    from .pipeline2 import _md5_bucket

    d = table(spark, sf, "documents")
    b = _md5_bucket("split|", F.col("doc_id").cast("string"), 100)
    split = (
        F.when(b < 90, F.lit("train"))
        .when(b < 95, F.lit("valid"))
        .otherwise(F.lit("test"))
    )
    cells = (
        d.select(
            split.alias("split"),
            "lang",
            F.size(tokens("text")).alias("ntok"),
        )
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("ntok").alias("n_tokens"),
        )
    )
    w = Window.partitionBy("split")
    return cells.select(
        "split",
        "lang",
        "n_docs",
        "n_tokens",
        F.round(
            F.col("n_docs") / F.sum("n_docs").over(w).cast("double"), 9
        ).alias("doc_share"),
    )


SQL_DATASET_SPLIT = """
WITH assigned AS (
  SELECT
    CASE WHEN ('0x' || substr(md5('split|' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 90 THEN 'train'
         WHEN ('0x' || substr(md5('split|' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 95 THEN 'valid'
         ELSE 'test' END AS split,
    lang,
    len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS ntok
  FROM documents
),
cells AS (
  SELECT split, lang, COUNT(*) AS n_docs, CAST(SUM(ntok) AS BIGINT) AS n_tokens
  FROM assigned GROUP BY split, lang
)
SELECT split, lang, n_docs, n_tokens,
  ROUND(n_docs / CAST(SUM(n_docs) OVER (PARTITION BY split) AS DOUBLE), 9) AS doc_share
FROM cells
"""


# ln(2) as an exact double literal shared by both engines (dividing by
# an engine-evaluated ln(2) would bet on two libm's agreeing; a literal
# doesn't)
_LN2 = 0.6931471805599453


def q_text_char_entropy(spark: SparkSession, sf: str) -> DataFrame:
    """Character-level Shannon entropy per document, in bits — the
    cheap gibberish/boilerplate gate (very low entropy = repeated
    filler, very high = random noise; both are cut before tokenization
    ever runs).

    Plan: one char explode (map-side), one (doc, char)-keyed count,
    one doc-keyed sequential fold over the ≤|alphabet| per-doc terms —
    all uniform keys, nothing driver-side. The p·ln p term is computed
    per (doc, char) row with identical double ops in both engines and
    summed in char order (array_sort fold == list_sum(list ORDER BY)),
    the suite's standard deterministic-float idiom."""
    d = table(spark, sf, "documents")
    chars = d.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("text")),
                lambda i: F.lower("text").substr(i, F.lit(1)),
            )
        ).alias("ch"),
    )
    cc = chars.groupBy("doc_id", "ch").agg(F.count(F.lit(1)).alias("cnt"))
    tot = cc.groupBy("doc_id").agg(F.sum("cnt").alias("n"))
    terms = cc.join(tot, "doc_id").select(
        "doc_id",
        "ch",
        "n",
        (
            (F.col("cnt") / F.col("n"))
            * F.log(F.col("cnt") / F.col("n"))
        ).alias("term"),
    )
    return (
        terms.groupBy("doc_id")
        .agg(
            F.max("n").alias("n_chars"),
            F.count(F.lit(1)).alias("n_distinct_chars"),
            F.collect_list(F.struct("ch", "term")).alias("parts"),
        )
        .select(
            "doc_id",
            "n_chars",
            "n_distinct_chars",
            F.round(
                -F.aggregate(
                    F.array_sort("parts"),
                    F.lit(0.0),
                    lambda acc, s: acc + s["term"],
                )
                / F.lit(_LN2),
                9,
            ).alias("entropy_bits"),
        )
    )


SQL_TEXT_CHAR_ENTROPY = f"""
WITH chars AS (
  SELECT doc_id, substr(lower(text), CAST(i AS INTEGER), 1) AS ch
  FROM documents, range(1, 100000) r(i)
  WHERE i <= len(text)
),
cc AS (SELECT doc_id, ch, COUNT(*) AS cnt FROM chars GROUP BY 1, 2),
tot AS (SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n FROM cc GROUP BY 1),
terms AS (
  SELECT cc.doc_id, cc.ch, tot.n,
    (cc.cnt / CAST(tot.n AS DOUBLE)) * ln(cc.cnt / CAST(tot.n AS DOUBLE)) AS term
  FROM cc JOIN tot USING (doc_id)
)
SELECT doc_id, MAX(n) AS n_chars,
  COUNT(*) AS n_distinct_chars,
  ROUND(-list_sum(list(term ORDER BY ch)) / {_LN2!r}, 9) AS entropy_bits
FROM terms GROUP BY doc_id
"""


def q_join_skew_audit(spark: SparkSession, sf: str) -> DataFrame:
    """Key-skew profile of lineitem's supplier key — the measurement a
    pipeline takes BEFORE deciding to salt a join or rely on AQE's
    skew-join split, instead of guessing. Reports row/key counts, the
    heaviest key's share, and the exact p50/p99 of the per-key row
    distribution.

    Plan: one uniform key-count shuffle (map-side combinable), then all
    statistics reduce the |keys|-sized count table to ONE row — the
    percentile works on per-key counts, never raw rows. At 100 TB this
    is one linear scan + a keys-sized aggregate; the output feeds the
    salt-factor choice (max_key_rows / avg_key_rows)."""
    li = table(spark, sf, "lineitem")
    counts = li.groupBy("l_suppkey").agg(F.count(F.lit(1)).alias("cnt"))
    return counts.agg(
        F.sum("cnt").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("cnt").alias("max_key_rows"),
        F.round(
            F.sum("cnt") / F.count(F.lit(1)).cast("double"), 6
        ).alias("avg_key_rows"),
        F.round(
            F.max("cnt")
            / (F.sum("cnt") / F.count(F.lit(1)).cast("double")),
            6,
        ).alias("skew_ratio"),
        F.percentile("cnt", F.lit(0.5)).alias("p50_key_rows"),
        F.percentile("cnt", F.lit(0.99)).alias("p99_key_rows"),
    )


SQL_JOIN_SKEW_AUDIT = """
WITH counts AS (
  SELECT l_suppkey, COUNT(*) AS cnt FROM lineitem GROUP BY l_suppkey
)
SELECT CAST(SUM(cnt) AS BIGINT) AS n_rows,
  COUNT(*) AS n_keys,
  MAX(cnt) AS max_key_rows,
  ROUND(SUM(cnt) / CAST(COUNT(*) AS DOUBLE), 6) AS avg_key_rows,
  ROUND(MAX(cnt) / (SUM(cnt) / CAST(COUNT(*) AS DOUBLE)), 6) AS skew_ratio,
  quantile_cont(cnt, 0.5) AS p50_key_rows,
  quantile_cont(cnt, 0.99) AS p99_key_rows
FROM counts
"""


BPE_APPLY_TOPN = 20


def q_tokenizer_bpe_apply(spark: SparkSession, sf: str) -> DataFrame:
    """Apply the {BPE_MERGES} learned merges back to the vocabulary —
    the INFERENCE half of the BPE loop (``tokenizer_bpe_train`` is the
    training half; a user of the tokenizer runs train once, apply on
    every corpus). Merges are re-derived in-plan (same vocabulary CTEs,
    bit-identical winners), then applied IN RANK ORDER to every word —
    including the 1-char words the trainer's pair scan excludes — and
    the output reports the top-{BPE_APPLY_TOPN} words by frequency with
    their final segmentation (symbols joined by '|'), char vs symbol
    counts showing the compression.

    100 TB shape: identical to training — corpus collapses once to
    (word, freq); every merge application is a zero-shuffle
    position-parallel rewrite over vocab-sized rows with the 1-row
    winner broadcast in-plan; the final report is a
    TakeOrderedAndProject."""
    d = table(spark, sf, "documents")
    words = (
        d.select(F.explode(tokens("text")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    ).localCheckpoint()
    sym_all = words.select(
        "w",
        "freq",
        F.transform(
            F.sequence(F.lit(1), F.length("w")),
            lambda i: F.col("w").substr(i, F.lit(1)),
        ).alias("t"),
    )
    t_learn = sym_all.filter(F.size("t") >= 2)
    merges = []
    t = t_learn
    for rank in range(1, BPE_MERGES + 1):
        # materialize each 1-row winner (same round-12 rationale as
        # tokenizer_bpe_train): it feeds the learn chain AND the apply
        # chain, and un-truncated its lineage replays every earlier
        # merge's vocab-wide pair aggregate inside the final plan
        top1 = _pair_top1(t).localCheckpoint(eager=True)
        merges.append(top1)
        if rank < BPE_MERGES:
            t = _apply_merge(t, top1)
    ta = sym_all
    for top1 in merges:
        ta = _apply_merge(ta, top1)
    return (
        ta.select(
            "w",
            "freq",
            F.length("w").alias("n_chars"),
            F.size("t").alias("n_symbols"),
            F.array_join("t", "|").alias("segmentation"),
        )
        .orderBy(F.desc("freq"), F.asc("w"))
        .limit(BPE_APPLY_TOPN)
    )


def _sql_bpe_apply() -> str:
    """The training chain's CTEs (identical winners) + an application
    chain over ALL words + the top-N segmentation report."""
    head = """
WITH words AS (
  SELECT w, COUNT(*) AS freq FROM (
    SELECT unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                  x -> x <> '')) AS w
    FROM documents
  ) GROUP BY w
),
t1 AS (
  SELECT w, freq,
    list_transform(range(1, len(w) + 1), i -> substr(w, CAST(i AS INTEGER), 1)) AS ts
  FROM words WHERE len(w) >= 2
),
a0 AS (
  SELECT w, freq,
    list_transform(range(1, len(w) + 1), i -> substr(w, CAST(i AS INTEGER), 1)) AS ts
  FROM words
)"""
    apply_tpl = """,
{out} AS (
  SELECT w, freq,
    list_filter(list_transform(range(1, len(ts) + 1), i ->
      CASE WHEN ts[i] = {b}.pa AND ts[i+1] = {b}.pb THEN {b}.pa || {b}.pb
           WHEN i > 1 AND ts[i-1] = {b}.pa AND ts[i] = {b}.pb THEN NULL
           ELSE ts[i] END), x -> x IS NOT NULL) AS ts
  FROM {src}, {b}
)"""
    parts = [head]
    for r in range(1, BPE_MERGES + 1):
        parts.append(f""",
p{r} AS (
  SELECT ts[i] AS a, ts[i+1] AS b, CAST(SUM(freq) AS BIGINT) AS cnt
  FROM t{r}, range(1, 10000) q(i)
  WHERE i + 1 <= len(ts) AND ts[i] <> ts[i+1]
  GROUP BY 1, 2
),
b{r} AS (SELECT a AS pa, b AS pb, cnt FROM p{r} ORDER BY cnt DESC, a ASC, b ASC LIMIT 1)""")
        if r < BPE_MERGES:
            parts.append(apply_tpl.format(out=f"t{r + 1}", src=f"t{r}", b=f"b{r}"))
    for r in range(1, BPE_MERGES + 1):
        parts.append(apply_tpl.format(out=f"a{r}", src=f"a{r - 1}", b=f"b{r}"))
    parts.append(f"""
SELECT w, freq, CAST(len(w) AS INTEGER) AS n_chars,
  CAST(len(ts) AS INTEGER) AS n_symbols,
  array_to_string(ts, '|') AS segmentation
FROM a{BPE_MERGES}
ORDER BY freq DESC, w ASC LIMIT {BPE_APPLY_TOPN}""")
    return "".join(parts)


QUERIES: dict[str, Query] = {
    "tokenizer_bpe_train": Query(q_tokenizer_bpe_train, _sql_bpe()),
    "tokenizer_bpe_apply": Query(q_tokenizer_bpe_apply, _sql_bpe_apply()),
    "dedup_span_removal": Query(q_dedup_span_removal, SQL_DEDUP_SPAN_REMOVAL),
    "dataset_split": Query(q_dataset_split, SQL_DATASET_SPLIT),
    "text_char_entropy": Query(q_text_char_entropy, SQL_TEXT_CHAR_ENTROPY),
    "join_skew_audit": Query(q_join_skew_audit, SQL_JOIN_SKEW_AUDIT),
}
