"""Semantic invariants for the round-5 governance wave — Python-replay
checks proving the audits compute the RIGHT thing (the oracle gate only
proves Spark == DuckDB)."""

from __future__ import annotations

import hashlib

import numpy as np

from map_reduce_implementation_spark.suite import all_queries

from .conftest import SF0001

QS = all_queries()


def _split_bucket(vec_id: int) -> int:
    return int(hashlib.md5(f"split|{vec_id}".encode()).hexdigest()[:8], 16) % 100


def _embeddings(spark):
    from map_reduce_implementation_spark.sources import table

    rows = sorted(
        table(spark, SF0001, "embeddings").collect(), key=lambda r: r["vec_id"]
    )
    ids = np.asarray([r["vec_id"] for r in rows])
    labels = np.asarray([r["label"] for r in rows])
    X = np.asarray([r["embedding"] for r in rows], dtype=np.float64)
    return ids, labels, X


def test_split_leakage_python_replay(spark):
    """A numpy all-pairs replay of the blocked cosine threshold + md5
    split reproduces every per-label leakage count."""
    from map_reduce_implementation_spark.suite.governance import (
        LEAK_THRESHOLD,
        TRAIN_PCT,
    )

    ids, labels, X = _embeddings(spark)
    Xn = X / np.sqrt((X * X).sum(axis=1))[:, None]
    is_train = np.asarray([_split_bucket(int(i)) < TRAIN_PCT for i in ids])
    want = {}
    for lab in np.unique(labels):
        sel = np.nonzero(labels == lab)[0]
        n_pairs = n_cross = 0
        leaked = set()
        for a in range(len(sel)):
            for b in range(a + 1, len(sel)):
                i, j = sel[a], sel[b]
                if float(Xn[i] @ Xn[j]) >= LEAK_THRESHOLD:
                    n_pairs += 1
                    if is_train[i] != is_train[j]:
                        n_cross += 1
                        leaked.add(int(ids[j] if is_train[i] else ids[i]))
        want[int(lab)] = (n_pairs, n_cross, len(leaked),
                          int((~is_train[sel]).sum()))

    got = QS["split_leakage_audit"].build(spark, SF0001).collect()
    assert len(got) == len(want)
    for r in got:
        n_pairs, n_cross, n_leaked, n_held = want[r["label"]]
        assert (r["n_pairs"], r["n_cross_pairs"]) == (n_pairs, n_cross)
        assert (r["n_leaked_heldout"], r["n_heldout"]) == (n_leaked, n_held)
        # leakage counts nest: leaked heldout docs <= cross pairs <= pairs
        assert r["n_leaked_heldout"] <= r["n_cross_pairs"] <= r["n_pairs"]
        if n_held:
            assert abs(r["leak_share"] - n_leaked / n_held) < 1e-9


def test_k_anonymity_monotone_and_replay(spark):
    """Risk counts are non-decreasing in k, and a pandas groupby replay
    reproduces the class-size census exactly."""
    from map_reduce_implementation_spark.sources import table
    from map_reduce_implementation_spark.suite.governance import (
        BAL_BAND,
        K_LEVELS,
    )

    pdf = table(spark, SF0001, "customer").select(
        "c_nationkey", "c_mktsegment", "c_acctbal"
    ).toPandas()
    pdf["band"] = np.floor(pdf["c_acctbal"] / BAL_BAND).astype("int64")
    sizes = pdf.groupby(
        ["c_nationkey", "c_mktsegment", "band"]
    ).size().to_numpy()

    rows = {r["k"]: r for r in
            QS["k_anonymity_audit"].build(spark, SF0001).collect()}
    assert sorted(rows) == sorted(K_LEVELS)
    prev_classes = prev_rows = -1
    for k in sorted(K_LEVELS):
        r = rows[k]
        assert r["n_classes"] == len(sizes)
        assert r["n_risky_classes"] == int((sizes < k).sum())
        assert r["n_risky_rows"] == int(sizes[sizes < k].sum())
        assert r["n_risky_classes"] >= prev_classes
        assert r["n_risky_rows"] >= prev_rows
        prev_classes, prev_rows = r["n_risky_classes"], r["n_risky_rows"]


def test_label_noise_numpy_replay(spark):
    """A numpy brute-force kNN + plurality vote reproduces every
    audited vector's verdict (9-dp rounded sims, same tie-breaks)."""
    from map_reduce_implementation_spark.suite.governance import (
        NOISE_K,
        NOISE_SAMPLE_MOD,
    )

    ids, labels, X = _embeddings(spark)
    Xn = X / np.sqrt((X * X).sum(axis=1))[:, None]
    got = {r["query_id"]: r for r in
           QS["embedding_label_noise"].build(spark, SF0001).collect()}
    qsel = np.nonzero(ids % NOISE_SAMPLE_MOD == 0)[0]
    csel = np.nonzero(ids % NOISE_SAMPLE_MOD != 0)[0]
    assert sorted(got) == sorted(int(ids[i]) for i in qsel)
    for qi in qsel:
        sims = np.round(Xn[csel] @ Xn[qi], 9)
        order = sorted(
            range(len(csel)), key=lambda j: (-sims[j], ids[csel[j]])
        )[:NOISE_K]
        votes: dict[int, int] = {}
        for j in order:
            votes[int(labels[csel[j]])] = votes.get(int(labels[csel[j]]), 0) + 1
        knn_label, n_agree = min(
            votes.items(), key=lambda kv: (-kv[1], kv[0])
        )
        r = got[int(ids[qi])]
        assert (r["knn_label"], r["n_agree"]) == (knn_label, n_agree)
        assert r["own_label"] == int(labels[qi])
        assert r["suspect"] == (knn_label != int(labels[qi]))
