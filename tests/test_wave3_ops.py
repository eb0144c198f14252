"""Semantic invariants for the round-4 wave-3 operators (PQ, int8
quantization, BPE training, span removal, dataset split) — properties
the oracle equality check can't express."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from map_reduce_implementation_spark.sources import table
from map_reduce_implementation_spark.suite import all_queries

from .conftest import SF0001

QS = all_queries()


def test_pq_recall_bounds_and_exactness_of_exact_arm(spark):
    """Recall@k is hits/k with 0 <= hits <= k, and a PQ built from the
    data itself must do far better than chance (> 0.2 on 500 vectors)."""
    r = QS["similarity_ann_pq_recall"].build(spark, SF0001).collect()
    assert len(r) == 1
    row = r[0]
    assert row["k"] == 10
    assert 0 <= row["hits"] <= row["k"]
    assert abs(row["recall_at_k"] - row["hits"] / row["k"]) < 1e-12
    assert row["recall_at_k"] > 0.2, "PQ no better than chance"


def test_int8_quantize_error_bounded_by_half_scale(spark):
    """Symmetric round-to-nearest int8: every dimension's max abs error
    is at most scale/2 (plus the clamp's one-code allowance at +max,
    which max-abs scaling never needs: |x| <= 127*scale by
    construction)."""
    rows = QS["embedding_quantize_int8"].build(spark, SF0001).collect()
    assert rows, "no dims"
    for r in rows:
        assert r["max_abs_err"] <= r["scale"] / 2 + 1e-9, r
        assert r["mean_abs_err"] <= r["max_abs_err"] + 1e-9, r


def test_bpe_merges_match_naive_python(spark):
    """The 3 learned merges equal a single-threaded reference BPE over
    the same word-frequency dictionary (Sennrich et al.'s formulation:
    count symbol pairs weighted by word freq, merge winner, repeat)."""
    docs = table(spark, SF0001, "documents").select("text").collect()
    import re

    vocab: Counter = Counter()
    for r in docs:
        for w in re.split(r"[^a-z0-9]+", r["text"].lower()):
            if w:
                vocab[w] += 1
    dict_syms = [
        (list(w), freq) for w, freq in vocab.items() if len(w) >= 2
    ]

    def top_pair(entries):
        c: Counter = Counter()
        for ts, freq in entries:
            for a, b in zip(ts, ts[1:]):
                if a != b:
                    c[(a, b)] += freq
        # max count, then lexicographically smallest pair
        return min(c.items(), key=lambda kv: (-kv[1], kv[0]))

    def merge(entries, pair):
        a, b = pair
        out = []
        for ts, freq in entries:
            res, i = [], 0
            while i < len(ts):
                if i + 1 < len(ts) and ts[i] == a and ts[i + 1] == b:
                    res.append(a + b)
                    i += 2
                else:
                    res.append(ts[i])
                    i += 1
            out.append((res, freq))
        return out

    expected = []
    cs = dict_syms
    for rank in range(1, 4):
        (a, b), cnt = top_pair(cs)
        expected.append((rank, a, b, cnt))
        if rank < 3:
            cs = merge(cs, (a, b))

    got = [
        (r["merge_rank"], r["left_sym"], r["right_sym"], r["pair_count"])
        for r in sorted(
            QS["tokenizer_bpe_train"].build(spark, SF0001).collect()
        )
    ]
    assert got == expected


def test_span_removal_consistent_with_detection(spark):
    """kept + removed == total per doc; a doc has removals iff the
    detection query reports repeated windows for it; removal count is
    bounded by (repeated windows + window size - 1)."""
    rem = {
        r["doc_id"]: r
        for r in QS["dedup_span_removal"].build(spark, SF0001).collect()
    }
    det = {
        r["doc_id"]: r
        for r in QS["dedup_repeated_substrings"].build(spark, SF0001).collect()
    }
    assert rem, "no docs"
    for doc_id, r in rem.items():
        assert r["kept_tokens"] + r["n_removed"] == r["n_tokens"], r
        d = det.get(doc_id)
        n_rep = d["n_repeated"] if d else 0
        assert (r["n_removed"] > 0) == (n_rep > 0), (r, d)
        if n_rep:
            # each repeated window covers 10 positions; disjoint windows
            # bound the union above, overlapping ones below
            assert r["n_removed"] <= 10 * n_rep, (r, d)
            assert r["n_removed"] >= 10, r  # at least one full window


def test_char_entropy_bounds(spark):
    """Shannon entropy over an alphabet of k symbols lies in
    [0, log2 k]; zero iff the doc uses a single distinct character."""
    import math

    rows = QS["text_char_entropy"].build(spark, SF0001).collect()
    assert rows, "no docs"
    for r in rows:
        ub = math.log2(r["n_distinct_chars"]) if r["n_distinct_chars"] else 0.0
        assert -1e-9 <= r["entropy_bits"] <= ub + 1e-9, r
        if r["n_distinct_chars"] == 1:
            assert r["entropy_bits"] == 0.0, r


def test_skew_audit_order_statistics(spark):
    """max >= p99 >= p50, avg between min-possible and max, and the
    row total equals the raw table count."""
    r = QS["join_skew_audit"].build(spark, SF0001).collect()[0]
    assert r["n_rows"] == table(spark, SF0001, "lineitem").count()
    assert r["max_key_rows"] >= r["p99_key_rows"] >= r["p50_key_rows"] > 0
    assert 1.0 <= r["skew_ratio"]
    assert abs(r["avg_key_rows"] - r["n_rows"] / r["n_keys"]) < 1e-4


def test_dataset_split_partition_and_determinism(spark):
    """Splits partition the corpus (doc counts sum to |documents|),
    shares sum to 1 within each split, and the train share is ~90%."""
    rows = QS["dataset_split"].build(spark, SF0001).collect()
    total_docs = table(spark, SF0001, "documents").count()
    assert sum(r["n_docs"] for r in rows) == total_docs
    by_split: dict[str, int] = {}
    share: dict[str, float] = {}
    for r in rows:
        by_split[r["split"]] = by_split.get(r["split"], 0) + r["n_docs"]
        share[r["split"]] = share.get(r["split"], 0.0) + r["doc_share"]
    assert set(by_split) <= {"train", "valid", "test"}
    for s, v in share.items():
        assert abs(v - 1.0) < 1e-6, (s, v)
    assert 0.8 < by_split["train"] / total_docs < 0.97
