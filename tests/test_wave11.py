"""Semantic invariants for round-5 wave 11 (prefix-filter similarity
join, greedy k-center coreset, n-gram saturation)."""

from __future__ import annotations

import hashlib
import re

import numpy as np

from map_reduce_implementation_spark.suite import all_queries

from .conftest import SF0001

QS = all_queries()


def test_prefix_filter_lossless(spark):
    """The prefix-filtered join returns EXACTLY the plain quadratic
    join's pairs and scores — the losslessness theorem, checked
    end-to-end (this is the entry's whole claim; df-capping and
    MinHash banding cannot pass this test)."""
    plain = {
        (r["d1"], r["d2"]): r["jaccard"]
        for r in QS["dedup_ngram_jaccard"].build(spark, SF0001).collect()
    }
    pf = {
        (r["d1"], r["d2"]): r["jaccard"]
        for r in QS["dedup_prefix_filter_pairs"].build(spark, SF0001).collect()
    }
    assert pf.keys() == plain.keys()
    assert plain, "corpus must contain J >= 0.5 pairs"
    for k in plain:
        assert abs(pf[k] - plain[k]) < 1e-12


def test_coreset_numpy_replay(spark):
    """A numpy greedy k-center replay (same first pick, same argmax
    tie-breaks) reproduces the selection order and 9-dp radii, and
    the radius column is non-increasing (the cover shrinks)."""
    from map_reduce_implementation_spark.sources import table
    from map_reduce_implementation_spark.suite.vector2 import CORESET_K

    rows = sorted(
        table(spark, SF0001, "embeddings").collect(),
        key=lambda r: r["vec_id"],
    )
    ids = np.asarray([r["vec_id"] for r in rows])
    X = np.asarray([r["embedding"] for r in rows], dtype=np.float64)

    sel = [0]  # lowest vec_id is first (rows sorted by vec_id)
    d = ((X - X[0]) ** 2).sum(axis=1)
    expect = [(1, int(ids[0]), None)]
    for rank in range(2, CORESET_K + 1):
        # argmax with vec_id tie-break
        best = max(range(len(ids)), key=lambda j: (d[j], -ids[j]))
        expect.append((rank, int(ids[best]), round(float(d[best]), 9)))
        sel.append(best)
        d = np.minimum(d, ((X - X[best]) ** 2).sum(axis=1))

    got = sorted(
        QS["coreset_kcenter"].build(spark, SF0001).collect(),
        key=lambda r: r["sel_rank"],
    )
    assert len(got) == CORESET_K
    prev_rad = float("inf")
    for r, (rank, vid, rad) in zip(got, expect):
        assert r["sel_rank"] == rank and r["vec_id"] == vid
        if rad is None:
            assert r["radius"] is None
        else:
            assert abs(r["radius"] - rad) < 2e-9
            assert r["radius"] <= prev_rad + 1e-12
            prev_rad = r["radius"]


def test_ngram_saturation_python_replay(spark):
    """A dict replay of batch assignment + first-seen charging
    reproduces every batch row; novelty sums to the distinct-bigram
    total and the cumulative share ends at 1."""
    from map_reduce_implementation_spark.sources import table
    from map_reduce_implementation_spark.suite.corpus3 import SAT_BATCHES

    docs = table(spark, SF0001, "documents").select("doc_id", "text").collect()
    first: dict[str, int] = {}
    instances: dict[int, int] = {}
    for r in docs:
        b = (
            int(
                hashlib.md5(f"sat|{r['doc_id']}".encode()).hexdigest()[:8], 16
            )
            % SAT_BATCHES
        )
        ts = [t for t in re.split(r"[^a-z0-9]+", r["text"].lower()) if t]
        for a, c in zip(ts, ts[1:]):
            g = f"{a} {c}"
            instances[b] = instances.get(b, 0) + 1
            # "first seen" = MIN(batch) over all occurrences
            first[g] = min(first.get(g, b), b)
    novelty: dict[int, int] = {}
    for g, b in first.items():
        novelty[b] = novelty.get(b, 0) + 1

    got = sorted(
        QS["token_ngram_saturation"].build(spark, SF0001).collect(),
        key=lambda r: r["batch"],
    )
    assert {r["batch"] for r in got} == set(instances)
    total_new = sum(novelty.values())
    cum = 0
    for r in got:
        assert r["n_instances"] == instances[r["batch"]]
        assert r["n_new_grams"] == novelty.get(r["batch"], 0)
        cum += r["n_new_grams"]
        assert abs(r["cum_vocab_share"] - round(cum / total_new, 6)) < 1e-9
    assert cum == total_new == len(first)
    assert abs(got[-1]["cum_vocab_share"] - 1.0) < 1e-9
