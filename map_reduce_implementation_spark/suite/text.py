"""Text-analysis operator suite (BASELINE.json north-star: language-ID,
quality scoring, token counting, document fingerprinting).

All operators are pure column expressions (JVM codegen, zero Python) —
at 100 TB each is a single embarrassingly-parallel scan projection, no
shuffle. They generalize the reference's per-byte text loop
(usr_functions.c:39-44) to document granularity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import table
from .base import Query

TOKEN_RE = "[A-Za-z0-9]+"
STOPWORDS_EN = ["the", "a", "an", "of", "and", "to", "in"]
# stopword lists per language for the n-gram/stopword lang-ID heuristic
LANG_STOPWORDS = {
    "en": ["the", "a", "of", "and"],
    "de": ["der", "die", "und", "ist"],
    "es": ["el", "la", "los", "que"],
    "fr": ["le", "la", "les", "est"],
}


from ..functions import tokens as _tokens  # noqa: E402


# GPT-2-style pre-tokenizer pattern, restricted to RE2-safe constructs
# (no lookarounds) so the identical string drives Spark AND DuckDB:
# contractions | space?+letter-run | space?+digit-run | space?+punct-run |
# whitespace-run. Each match ≈ one BPE pre-token.
BPE_ISH_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"


def q_token_count(spark: SparkSession, sf: str) -> DataFrame:
    """Token counting: whitespace/punct-delimited word tokens, a real
    BPE-ish pre-tokenizer regex count (GPT-2-style pattern), and the
    chars/4 estimate LLM pipelines use for quick budgeting."""
    d = table(spark, sf, "documents")
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(TOKEN_RE), 0)).alias("n_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(BPE_ISH_RE), 0)).alias("n_bpe_ish"),
        F.length("text").alias("n_chars_text"),
        (F.length("text") / F.lit(4.0)).alias("est_bpe_tokens"),
    )


SQL_TOKEN_COUNT = f"""
SELECT doc_id,
  CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS INTEGER) AS n_tokens,
  CAST(len(regexp_extract_all(text, '{BPE_ISH_RE.replace("'", "''")}')) AS INTEGER) AS n_bpe_ish,
  CAST(length(text) AS INTEGER) AS n_chars_text,
  length(text) / 4.0 AS est_bpe_tokens
FROM documents
"""


def q_quality_score(spark: SparkSession, sf: str) -> DataFrame:
    """Quality scoring: length / punctuation / stopword ratios — the
    standard pre-training filter features (C4/Gopher-style)."""
    d = table(spark, sf, "documents")
    # bind the token array to a column — lambda references to the raw
    # split() expression would re-run the tokenizer per element
    t = d.select("doc_id", "text", _tokens(F.col("text")).alias("toks"))
    n_tok = F.size("toks")
    n_stop = F.size(F.filter(F.col("toks"), lambda x: x.isin(*STOPWORDS_EN)))
    length = F.length("text")
    alpha = F.length(F.regexp_replace("text", "[^A-Za-z]", ""))
    space = F.length(F.regexp_replace("text", "[^ ]", ""))
    return t.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        (alpha / length).alias("alpha_ratio"),
        (space / length).alias("space_ratio"),
        (n_stop / n_tok).alias("stopword_ratio"),
        (length / n_tok).alias("chars_per_token"),
    )


SQL_QUALITY_SCORE = """
WITH t AS (
  SELECT doc_id, text,
    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks
  FROM documents
)
SELECT doc_id,
  CAST(len(toks) AS INTEGER) AS n_tokens,
  length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1.0 / length(text) AS alpha_ratio,
  length(regexp_replace(text, '[^ ]', '', 'g')) * 1.0 / length(text) AS space_ratio,
  len(list_filter(toks, x -> x IN ('the','a','an','of','and','to','in'))) * 1.0
    / len(toks) AS stopword_ratio,
  length(text) * 1.0 / len(toks) AS chars_per_token
FROM t
"""


def q_lang_id(spark: SparkSession, sf: str) -> DataFrame:
    """Language-ID heuristic: count stopword hits per language, argmax
    with a fixed priority order (en > de > es > fr > unknown). A
    deterministic column-expression classifier — the Spark-native shape
    of a fastText-style scorer (the model itself would be a Pandas UDF)."""
    def _in_list(sw):
        # NB: a `sw=sw` default arg would make pyspark's lambda-signature
        # inspection treat this as a two-arg lambda — use a closure.
        return lambda t: t.isin(*sw)

    # three-stage select so toks and each score bind to real columns —
    # repeated references to raw expressions would re-evaluate them
    tokd = table(spark, sf, "documents").select(
        "doc_id", _tokens(F.col("text")).alias("toks")
    )
    scored = tokd.select(
        "doc_id",
        *[
            F.size(F.filter(F.col("toks"), _in_list(sw))).alias(f"score_{lang}")
            for lang, sw in LANG_STOPWORDS.items()
        ],
    )
    best = None
    for lang in LANG_STOPWORDS:  # priority order on ties
        cond = F.col(f"score_{lang}") > 0
        for other in LANG_STOPWORDS:
            if other != lang:
                cond = cond & (F.col(f"score_{lang}") >= F.col(f"score_{other}"))
        best = F.when(cond, F.lit(lang)) if best is None else best.when(cond, F.lit(lang))
    return scored.select(
        "doc_id",
        *[f"score_{lang}" for lang in LANG_STOPWORDS],
        best.otherwise(F.lit("unknown")).alias("predicted_lang"),
    )


def _sql_lang_scores() -> str:
    parts = []
    for lang, sw in LANG_STOPWORDS.items():
        inlist = ",".join(f"'{w}'" for w in sw)
        parts.append(
            f"CAST(len(list_filter(toks, x -> x IN ({inlist}))) AS INTEGER) AS score_{lang}"
        )
    return ",\n  ".join(parts)


def _sql_lang_case() -> str:
    langs = list(LANG_STOPWORDS)
    whens = []
    for lang in langs:
        conds = [f"score_{lang} > 0"] + [
            f"score_{lang} >= score_{o}" for o in langs if o != lang
        ]
        whens.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    return "CASE " + " ".join(whens) + " ELSE 'unknown' END"


SQL_LANG_ID = f"""
WITH t AS (
  SELECT doc_id,
    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks
  FROM documents
),
scored AS (
  SELECT doc_id,
  {_sql_lang_scores()}
  FROM t
)
SELECT doc_id, score_en, score_de, score_es, score_fr,
  {_sql_lang_case()} AS predicted_lang
FROM scored
"""


def q_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    """Document fingerprint: md5 of whitespace/punct-normalized lowercase
    text — the exact-dedup key that survives formatting changes. (A
    rolling-hash winnowing variant lives in operators/text_fp.py as a
    Pandas-UDF op, rows-only checked.)"""
    d = table(spark, sf, "documents")
    normalized = F.trim(F.regexp_replace(F.lower("text"), "[^a-z0-9]+", " "))
    return d.select("doc_id", F.md5(normalized).alias("fingerprint"))


SQL_FINGERPRINT = """
SELECT doc_id,
  md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fingerprint
FROM documents
"""


def q_winnow_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    """Winnowing (rolling-hash) fingerprints via Arrow-batched
    mapInPandas (operators/text_fp.py). Python kernel → rows-only check;
    determinism + substring-sharing property tested in
    tests/test_text_ops.py."""
    from ..operators.text_fp import winnow_fingerprints

    d = table(spark, sf, "documents")
    return winnow_fingerprints(d).select("doc_id", "n_fingerprints")


def q_pipeline_curation(spark: SparkSession, sf: str) -> DataFrame:
    """The LLM training-data curation pipeline as ONE declarative plan:
    quality gate (token count + alpha ratio) → exact dedup keep-first on
    the normalized fingerprint → deterministic 50% hash-sample → per-doc
    token accounting. Catalyst fuses the gates into the scan; the only
    shuffle is the dedup window — the whole 100 TB curation pass is one
    scan + one shuffle. Every stage reuses an operator proven above
    (quality_score / fingerprint / keep-first / deterministic sample)."""
    from pyspark.sql import Window

    d = table(spark, sf, "documents")
    t = d.select("doc_id", "text", _tokens(F.col("text")).alias("toks"))
    gated = t.filter(
        (F.size("toks") >= 10)
        & (
            F.length(F.regexp_replace("text", "[^A-Za-z]", "")) / F.length("text")
            > 0.5
        )
    )
    fp = F.md5(F.trim(F.regexp_replace(F.lower("text"), "[^a-z0-9]+", " ")))
    w = Window.partitionBy(fp).orderBy("doc_id")
    deduped = gated.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    sampled = deduped.filter(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) < "8")
    return sampled.select(
        "doc_id",
        F.size("toks").alias("n_tokens"),
        fp.alias("fingerprint"),
    )


SQL_PIPELINE_CURATION = """
WITH t AS (
  SELECT doc_id, text,
    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks,
    md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp
  FROM documents
),
gated AS (
  SELECT * FROM t
  WHERE len(toks) >= 10
    AND length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1.0 / length(text) > 0.5
),
deduped AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn FROM gated
)
SELECT doc_id, CAST(len(toks) AS INTEGER) AS n_tokens, fp AS fingerprint
FROM deduped
WHERE rn = 1 AND substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '8'
"""


def q_repetition_score(spark: SparkSession, sf: str) -> DataFrame:
    """Gopher-style repetition signal: fraction of duplicated bigrams
    per document (1 - distinct/total). High values flag boilerplate and
    degenerate generations — a standard pre-training quality gate.
    Pure array expressions (zip of shifted token slices), no explode:
    per-row work stays inside whole-stage codegen, zero shuffles."""
    from ..functions import tokens

    d = table(spark, sf, "documents")
    ts = tokens("text")
    n = F.size(ts)
    bigrams = F.zip_with(
        F.slice(ts, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(ts, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    total = F.size(bigrams)
    rep = F.when(
        total > 0,
        F.round(1.0 - F.size(F.array_distinct(bigrams)) / total, 9),
    ).otherwise(F.lit(0.0))
    return d.select("doc_id", total.alias("n_bigrams"), rep.alias("rep_frac"))


SQL_REPETITION_SCORE = """
WITH t AS (
  SELECT doc_id,
    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS ts
  FROM documents
),
b AS (
  SELECT doc_id,
    list_transform(range(1, greatest(len(ts), 1)),
                   i -> ts[i] || ' ' || ts[i + 1]) AS bg
  FROM t
)
SELECT doc_id, CAST(len(bg) AS INTEGER) AS n_bigrams,
  CASE WHEN len(bg) > 0
       THEN ROUND(1.0 - CAST(len(list_distinct(bg)) AS DOUBLE) / len(bg), 9)
       ELSE 0.0 END AS rep_frac
FROM b
"""


def q_top_bigrams(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus-level n-gram statistics: top-50 bigrams by document
    frequency — the vocabulary/contamination census of a training
    corpus. Per-doc dedup (array_distinct) happens BEFORE the explode,
    the aggregate combines map-side, and the final top-k is
    TakeOrderedAndProject — shuffle carries (bigram, partial count)
    pairs only, never raw text."""
    from ..functions import tokens

    d = table(spark, sf, "documents")
    ts = tokens("text")
    n = F.size(ts)
    bigrams = F.zip_with(
        F.slice(ts, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(ts, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return (
        d.select(F.explode(F.array_distinct(bigrams)).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("doc_freq"))
        .orderBy(F.desc("doc_freq"), F.asc("bigram"))
        .limit(50)
    )


SQL_TOP_BIGRAMS = """
WITH t AS (
  SELECT doc_id,
    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS ts
  FROM documents
),
b AS (
  SELECT doc_id,
    list_distinct(list_transform(range(1, greatest(len(ts), 1)),
                                 i -> ts[i] || ' ' || ts[i + 1])) AS bg
  FROM t
)
SELECT u.bigram AS bigram, COUNT(*) AS doc_freq
FROM b, unnest(bg) AS u(bigram)
GROUP BY u.bigram
ORDER BY doc_freq DESC, bigram ASC
LIMIT 50
"""


def q_unigram_logprob(spark: SparkSession, sf: str) -> DataFrame:
    """Unigram-LM quality score (the cheap stand-in for the CCNet /
    Gopher perplexity filter): train a corpus unigram model (term →
    corpus frequency) and score each document by its average negative
    log-likelihood. High avg-NLL = rare-token soup (gibberish, OCR
    noise); low = boilerplate.

    Plan: one tokenize pass feeds both the model build (term-keyed agg
    → vocabulary-sized table) and the scoring join; the model is
    **broadcast** back (a vocab fits in MBs even at 100 TB corpus
    scale — Heaps' law), so the token stream is shuffled once (doc-keyed
    final agg), never term-keyed on the scoring side. No OOV mass is
    needed because the model and the scored corpus are the same."""
    return unigram_avg_nll(spark, sf)


def unigram_avg_nll(spark: SparkSession, sf: str) -> DataFrame:
    """Shared unigram-LM scorer → (doc_id, n_tokens, avg_nll). ONE
    implementation (and one SQL CTE, ``SQL_UNIGRAM_NLL_CTE``) behind
    both ``text_unigram_logprob`` and
    ``curation3.q_perplexity_bucket_sample``, so the model, tokenizer
    and determinism path cannot drift between the two arms."""
    d = table(spark, sf, "documents")
    tok = d.select("doc_id", F.explode(_tokens(F.col("text"))).alias("term"))
    ctf = tok.groupBy("term").agg(F.count("*").alias("ctf"))
    total = ctf.agg(F.sum("ctf")).collect()[0][0]  # one scalar (corpus size)
    return (
        tok.join(F.broadcast(ctf), "term")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(
                -F.sum(F.log(F.col("ctf") / F.lit(total))) / F.count("*"), 6
            ).alias("avg_nll"),
        )
    )


# the matching DuckDB CTE chain ending in nll(doc_id, n_tokens, avg_nll)
SQL_UNIGRAM_NLL_CTE = """
WITH tok AS (
  SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS term
  FROM documents
),
ctf AS (SELECT term, COUNT(*) AS ctf FROM tok GROUP BY term),
total AS (SELECT CAST(SUM(ctf) AS BIGINT) AS t FROM ctf),
nll AS (
  SELECT tok.doc_id, COUNT(*) AS n_tokens,
    ROUND(-SUM(ln(ctf.ctf / total.t)) / COUNT(*), 6) AS avg_nll
  FROM tok JOIN ctf ON tok.term = ctf.term CROSS JOIN total
  GROUP BY tok.doc_id
)"""

SQL_UNIGRAM_LOGPROB = SQL_UNIGRAM_NLL_CTE + """
SELECT doc_id, n_tokens, avg_nll FROM nll
"""


def q_bigram_logprob(spark: SparkSession, sf: str) -> DataFrame:
    """Bigram-LM fluency score: average −ln P(cur|prev) per doc, the
    conditional-probability upgrade of ``text_unigram_logprob`` (the
    CCNet/Gopher perplexity-filter family). Degenerate repeated text
    scores near 0; incoherent token salads score high.

    Plan: bigrams come from ``zip_with`` of shifted token slices — pure
    array expressions, NO shuffle to build pairs (same idiom as
    q_repetition_score). The model is two bounded aggregations (bigram
    and context counts); both broadcast back, so the pair stream
    shuffles once (the doc-keyed final agg). Model size is
    distinct-bigram-bounded; a 100 TB run would add a min-count prune
    before broadcast (the standard LM-filter practice) without changing
    the plan shape.
    """
    d = table(spark, sf, "documents")
    ts = _tokens(F.col("text"))
    n = F.size(ts)
    pair_structs = F.zip_with(
        F.slice(ts, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(ts, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("prev"), b.alias("cur")),
    )
    pairs = (
        d.select("doc_id", F.explode(pair_structs).alias("b"))
        .select("doc_id", "b.prev", "b.cur")
    )
    # Round-12 optimization (guide §2.2/§2.4, the kneser_ney recipe):
    # the bigram-type table is materialized once and the context
    # counts derived from IT (sum of n2 over cur == count of pairs
    # with that prev, exact integers) — the corpus is tokenized for
    # the model once instead of twice, and the scoring join-back is
    # the only second pass.
    c2 = (
        pairs.groupBy("prev", "cur")
        .agg(F.count(F.lit(1)).alias("n2"))
        .localCheckpoint(eager=True)
    )
    c1 = c2.groupBy("prev").agg(F.sum("n2").alias("n1"))
    return (
        pairs.join(F.broadcast(c2), ["prev", "cur"])
        .join(F.broadcast(c1), ["prev"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                -F.sum(F.log(F.col("n2").cast("double") / F.col("n1")))
                / F.count(F.lit(1)),
                6,
            ).alias("avg_nll2"),
        )
    )


SQL_BIGRAM_LOGPROB = """
WITH t AS (
  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks
  FROM documents
), bg AS (
  SELECT doc_id, unnest(list_zip(toks[1:len(toks)-1], toks[2:len(toks)])) AS b
  FROM t WHERE len(toks) >= 2
), pairs AS (
  SELECT doc_id, b[1] AS prev, b[2] AS cur FROM bg
), c2 AS (SELECT prev, cur, COUNT(*) AS n2 FROM pairs GROUP BY 1,2),
c1 AS (SELECT prev, COUNT(*) AS n1 FROM pairs GROUP BY 1)
SELECT p.doc_id, COUNT(*) AS n_bigrams,
  ROUND(-SUM(ln(CAST(c2.n2 AS DOUBLE) / c1.n1)) / COUNT(*), 6) AS avg_nll2
FROM pairs p JOIN c2 ON p.prev = c2.prev AND p.cur = c2.cur JOIN c1 ON p.prev = c1.prev
GROUP BY p.doc_id
"""




def q_lang_confusion(spark: SparkSession, sf: str) -> DataFrame:
    """Classifier-eval closing of the lang-ID loop: confusion matrix of
    the stopword heuristic's prediction against the labeled ``lang``
    column, with per-true-language recall. The matrix aggregation runs
    on the |langs|x|langs| cell space, so the recall window is free at
    any scale; the only data-sized work is the one classify pass."""
    from pyspark.sql import Window

    pred = q_lang_id(spark, sf).select("doc_id", "predicted_lang")
    d = table(spark, sf, "documents").select("doc_id", "lang")
    cells = (
        d.join(pred, "doc_id")
        .groupBy(F.col("lang").alias("true_lang"), "predicted_lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("true_lang")
    return cells.select(
        "true_lang",
        "predicted_lang",
        "n",
        F.round(F.col("n") / F.sum("n").over(w), 6).alias("share_of_true"),
    )


SQL_LANG_CONFUSION = f"""
WITH pred AS ({SQL_LANG_ID}),
cells AS (
  SELECT d.lang AS true_lang, p.predicted_lang, COUNT(*) AS n
  FROM documents d JOIN pred p ON d.doc_id = p.doc_id
  GROUP BY d.lang, p.predicted_lang
)
SELECT true_lang, predicted_lang, n,
  ROUND(CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY true_lang), 6)
    AS share_of_true
FROM cells
"""

QUERIES: dict[str, Query] = {
    "text_unigram_logprob": Query(q_unigram_logprob, SQL_UNIGRAM_LOGPROB),
    "text_bigram_logprob": Query(q_bigram_logprob, SQL_BIGRAM_LOGPROB),
    "text_winnow_fingerprint": Query(q_winnow_fingerprint, None),
    "text_repetition_score": Query(q_repetition_score, SQL_REPETITION_SCORE),
    "text_top_bigrams": Query(q_top_bigrams, SQL_TOP_BIGRAMS),
    "pipeline_curation": Query(q_pipeline_curation, SQL_PIPELINE_CURATION),
    "text_token_count": Query(q_token_count, SQL_TOKEN_COUNT),
    "text_quality_score": Query(q_quality_score, SQL_QUALITY_SCORE),
    "text_lang_id": Query(q_lang_id, SQL_LANG_ID),
    "text_lang_confusion": Query(q_lang_confusion, SQL_LANG_CONFUSION),
    "text_fingerprint": Query(q_fingerprint, SQL_FINGERPRINT),
}
