"""Tests for winnowing fingerprints, salted joins, IVF ANN, and the
approx-distinct sketch accuracy."""

from __future__ import annotations

from pyspark.sql import functions as F

from map_reduce_implementation_spark.operators.similarity import cosine_topk, ivf_topk
from map_reduce_implementation_spark.operators.skew import salted_agg_count, salted_join
from map_reduce_implementation_spark.operators.text_fp import winnow, winnow_fingerprints
from map_reduce_implementation_spark.sources import table
from map_reduce_implementation_spark.suite.stats import q_approx_distinct

from .conftest import SF001


def test_winnow_shared_substring_shares_fingerprint():
    a = "the quick brown fox jumps over the lazy dog in the morning light"
    b = "yesterday the quick brown fox jumps over the lazy dog again today"
    fa, fb = set(winnow(a)), set(winnow(b))
    assert fa & fb, "documents sharing a long substring must share fingerprints"
    c = "completely different content with zero overlap whatsoever here"
    assert not (fa & set(winnow(c)))


def test_winnow_deterministic_and_distributed(spark):
    d = table(spark, SF001, "documents").limit(50)
    out1 = {r.doc_id: tuple(r.fingerprints) for r in winnow_fingerprints(d).collect()}
    out2 = {r.doc_id: tuple(r.fingerprints) for r in winnow_fingerprints(d).collect()}
    assert out1 == out2
    # local oracle
    for r in d.collect()[:10]:
        assert tuple(winnow(r.text)) == out1[r.doc_id]


def test_salted_join_equals_plain_join(spark):
    orders = table(spark, SF001, "orders").select("o_orderkey", "o_custkey")
    cust = table(spark, SF001, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_name"
    )
    plain = sorted(tuple(r) for r in orders.join(cust, "o_custkey").collect())
    salted = sorted(tuple(r) for r in salted_join(orders, cust, "o_custkey").collect())
    assert plain == salted


def test_salted_left_join_preserves_unmatched(spark):
    orders = table(spark, SF001, "orders").select("o_orderkey", "o_custkey")
    # dim missing most keys → left join must keep all fact rows
    cust = (
        table(spark, SF001, "customer")
        .filter(F.col("c_custkey") < 10)
        .select(F.col("c_custkey").alias("o_custkey"), "c_name")
    )
    plain = sorted(tuple(r) for r in orders.join(cust, "o_custkey", "left").collect())
    salted = sorted(
        tuple(r) for r in salted_join(orders, cust, "o_custkey", how="left").collect()
    )
    assert plain == salted


def test_salted_agg_count_equals_groupby(spark):
    ev = table(spark, SF001, "events")
    plain = {r.event_type: r.n for r in ev.groupBy("event_type").agg(F.count("*").alias("n")).collect()}
    salted = {r.event_type: r.cnt for r in salted_agg_count(ev, "event_type").collect()}
    assert plain == salted


def test_ivf_recall_vs_bruteforce(spark):
    emb = table(spark, SF001, "embeddings")
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 7).first()["embedding"]]
    exact = [r.vec_id for r in cosine_topk(emb, qv, k=10, exclude_id=7).collect()]
    approx = [r.vec_id for r in ivf_topk(emb, qv, k=10, n_cells=8, nprobe=3).collect()]
    # probing 3/8 cells must still find a meaningful share of true top-10
    overlap = len(set(exact) & set(approx))
    assert overlap >= 2, f"IVF recall too low: {overlap}/10"


def test_approx_distinct_within_5pct(spark):
    rows = q_approx_distinct(spark, SF001).collect()
    for r in rows:
        assert abs(r.approx_orders - r.exact_orders) / r.exact_orders < 0.05


def test_hll_rollup_within_5pct(spark):
    """Merged (union_agg) per-lang sketches must estimate within 5% of
    the exact per-lang distinct-doc count."""
    from pyspark.sql import functions as F

    from map_reduce_implementation_spark.sources import table
    from map_reduce_implementation_spark.suite.relational import (
        q_approx_distinct_rollup,
    )

    est = {r.lang: r.approx_docs for r in q_approx_distinct_rollup(spark, SF001).collect()}
    exact = {
        r.lang: r.n
        for r in table(spark, SF001, "documents")
        .groupBy("lang")
        .agg(F.count_distinct("doc_id").alias("n"))
        .collect()
    }
    assert set(est) == set(exact)
    for lang, n in exact.items():
        assert abs(est[lang] - n) / n < 0.05, (lang, est[lang], n)


def test_cms_overestimates_under_collisions(spark):
    """CMS invariant: est >= exact for every term, even when the sketch
    is squeezed (width 8 forces collisions at vocab ~40) — the suite
    query's est==exact at width 1024 must not be what the test relies on."""
    from map_reduce_implementation_spark.suite import pipeline2 as p2

    d = table(spark, SF001, "documents").limit(40)
    tok = d.select(F.explode(
        F.filter(F.split(F.lower("text"), "[^a-z0-9]+"), lambda x: x != "")
    ).alias("term"))
    cells = (
        tok.select(
            F.posexplode(
                F.array(*[p2._cms_bucket(i, F.col("term")) % 8 for i in range(4)])
            ).alias("d", "bucket")
        )
        .groupBy("d", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    exact = tok.groupBy("term").agg(F.count(F.lit(1)).alias("exact_cnt"))
    probes = exact.select(
        "term", "exact_cnt",
        F.posexplode(
            F.array(*[p2._cms_bucket(i, F.col("term")) % 8 for i in range(4)])
        ).alias("d", "bucket"),
    )
    est = (
        probes.join(F.broadcast(cells), ["d", "bucket"])
        .groupBy("term", "exact_cnt")
        .agg(F.min("cnt").alias("est_cnt"))
    ).collect()
    assert est, "no terms"
    assert all(r.est_cnt >= r.exact_cnt for r in est)
    assert any(r.est_cnt > r.exact_cnt for r in est), "width 8 must collide"


def test_chunking_covers_text_with_overlap(spark):
    """Every char of every doc is inside >=1 chunk; consecutive chunks
    overlap by size-stride; chunk reassembly reproduces the text."""
    from map_reduce_implementation_spark.suite.pipeline2 import (
        CHUNK_SIZE, CHUNK_STRIDE, q_chunk_documents)

    d = table(spark, SF001, "documents").limit(30)
    docs = {r.doc_id: r.text for r in d.collect()}
    rows = [r for r in q_chunk_documents(spark, SF001).collect() if r.doc_id in docs]
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, text in docs.items():
        chunks = sorted(by_doc[doc_id], key=lambda r: r.chunk_idx)
        assert chunks[0].start_pos == 1
        last = chunks[-1]
        assert last.start_pos + last.chunk_len - 1 == max(len(text), 1) or (
            last.chunk_len == CHUNK_SIZE
        )
        for a, b in zip(chunks, chunks[1:]):
            assert b.start_pos - a.start_pos == CHUNK_STRIDE
        # full coverage: next chunk starts before current ends (overlap) or
        # current chunk is the tail
        for a, b in zip(chunks, chunks[1:]):
            assert b.start_pos <= a.start_pos + CHUNK_SIZE
