"""Semantic invariants for round-5 wave 12 (gate agreement, hapax
richness, HHI concentration, Mahalanobis outliers)."""

from __future__ import annotations

import math
import re

import numpy as np

from map_reduce_implementation_spark.suite import all_queries

from .conftest import SF0001

QS = all_queries()


def test_gate_agreement_python_replay(spark):
    """Replaying the 2×2 cells from the two collected gate outputs
    reproduces every count, the kept-set Jaccard, and binary kappa."""
    from map_reduce_implementation_spark.sources import table
    from map_reduce_implementation_spark.suite.quality2 import STOP_GATE_DEN
    from map_reduce_implementation_spark.suite.text import STOPWORDS_EN

    keep_a = {
        r["doc_id"]: r["keep"]
        for r in QS["gopher_quality_gate"].build(spark, SF0001).collect()
    }
    docs = table(spark, SF0001, "documents").select("doc_id", "text").collect()
    sw = set(STOPWORDS_EN)
    keep_b = {}
    for r in docs:
        ts = [t for t in re.split(r"[^a-z0-9]+", r["text"].lower()) if t]
        ns = sum(1 for t in ts if t in sw)
        keep_b[r["doc_id"]] = len(ts) > 0 and ns * STOP_GATE_DEN >= len(ts)

    n = len(docs)
    a = sum(keep_a.values())
    b = sum(keep_b.values())
    both = sum(1 for d in keep_a if keep_a[d] and keep_b[d])
    po = (both + (n - a - b + both)) / n
    pe = (a * b + (n - a) * (n - b)) / (n * n)

    r = QS["quality_gate_agreement"].build(spark, SF0001).collect()[0]
    assert (r["n_docs"], r["n_keep_gopher"], r["n_keep_stopword"], r["n_both"]) == (
        n, a, b, both,
    )
    assert abs(r["keep_jaccard"] - both / (a + b - both)) < 1e-6
    assert abs(r["kappa"] - (po - pe) / (1 - pe)) < 1e-6


def test_hapax_ratio_python_replay(spark):
    """Dict replay per source; hapax <= vocab <= n_tokens."""
    from map_reduce_implementation_spark.sources import table

    docs = table(spark, SF0001, "documents").select("source", "text").collect()
    ctf: dict[tuple[str, str], int] = {}
    for r in docs:
        for t in re.split(r"[^a-z0-9]+", r["text"].lower()):
            if t:
                ctf[(r["source"], t)] = ctf.get((r["source"], t), 0) + 1
    got = {r["source"]: r for r in QS["text_hapax_ratio"].build(spark, SF0001).collect()}
    sources = {s for s, _ in ctf}
    assert set(got) == sources
    for s in sources:
        counts = [c for (src, _), c in ctf.items() if src == s]
        r = got[s]
        assert r["n_tokens"] == sum(counts)
        assert r["vocab"] == len(counts)
        assert r["hapax"] == sum(1 for c in counts if c == 1)
        assert r["hapax"] <= r["vocab"] <= r["n_tokens"]
        assert abs(r["hapax_ratio"] - round(r["hapax"] / r["vocab"], 6)) < 1e-9


def test_hhi_bounds_and_replay(spark):
    """Decimal-exact pandas replay per nation; 1/n <= HHI <= 1 and
    top_share^2 <= HHI <= top_share (since shares sum to 1)."""
    from decimal import Decimal

    from map_reduce_implementation_spark.sources import table

    li = table(spark, SF0001, "lineitem").select(
        "l_suppkey", "l_extendedprice", "l_discount"
    ).collect()
    sup = {
        r["s_suppkey"]: r["s_nationkey"]
        for r in table(spark, SF0001, "supplier").collect()
    }
    nations = {
        r["n_nationkey"]: r["n_name"]
        for r in table(spark, SF0001, "nation").collect()
    }
    rev: dict[tuple[int, int], Decimal] = {}
    for r in li:
        nk = sup[r["l_suppkey"]]
        d = Decimal(str(round(r["l_extendedprice"], 2))) * (
            Decimal(1) - Decimal(str(round(r["l_discount"], 2)))
        )
        rev[(nk, r["l_suppkey"])] = rev.get((nk, r["l_suppkey"]), Decimal(0)) + d

    got = {r["n_name"]: r for r in QS["market_concentration_hhi"].build(spark, SF0001).collect()}
    by_nation: dict[int, list[Decimal]] = {}
    for (nk, _), v in rev.items():
        by_nation.setdefault(nk, []).append(v)
    assert set(got) == {nations[nk] for nk in by_nation}
    for nk, revs in by_nation.items():
        r = got[nations[nk]]
        assert r["n_suppliers"] == len(revs)
        tot = float(sum(revs))
        shares = [float(v) / tot for v in revs]
        hhi = sum(s * s for s in shares)
        assert abs(r["hhi"] - hhi) < 1e-5
        assert abs(r["top_share"] - max(shares)) < 1e-5
        assert 1 / len(revs) - 1e-9 <= r["hhi"] <= 1.0 + 1e-9
        assert r["top_share"] ** 2 - 1e-6 <= r["hhi"] <= r["top_share"] + 1e-6


def test_mahalanobis_numpy_replay(spark):
    """An exact replay of the quantizer recipe (integer q-sums, the
    identical variance formula, quantized z²) reproduces the top-20
    ids, ranks, and 6-dp scores."""
    from map_reduce_implementation_spark.sources import table
    from map_reduce_implementation_spark.suite.quality2 import MAHA_TOP_K

    rows = sorted(
        table(spark, SF0001, "embeddings").collect(),
        key=lambda r: r["vec_id"],
    )
    ids = [r["vec_id"] for r in rows]
    X = np.asarray([r["embedding"] for r in rows], dtype=np.float64)
    n, dim = X.shape
    Q = np.floor(X * 1e7 + 0.5).astype(np.int64)
    scores = []
    mus, vars_ = [], []
    for j in range(dim):
        s = int(Q[:, j].sum())
        ssq = int((Q[:, j].astype(object) ** 2).sum())
        mu = s / 1e7 / n
        var = (ssq / 1e14 - s / 1e7 * (s / 1e7) / n) / n
        mus.append(mu)
        vars_.append(var)
    for i in range(n):
        sq = 0
        for j in range(dim):
            if vars_[j] > 0:
                z = (X[i, j] - mus[j]) / math.sqrt(vars_[j])
                z2 = z * z
            else:
                z2 = 0.0
            sq += int(math.floor(z2 * 1e9 + 0.5))
        scores.append((sq, ids[i]))
    expect = sorted(scores, key=lambda t: (-t[0], t[1]))[:MAHA_TOP_K]

    got = sorted(
        QS["embedding_outlier_mahalanobis"].build(spark, SF0001).collect(),
        key=lambda r: r["outlier_rank"],
    )
    assert len(got) == MAHA_TOP_K
    for rank, (r, (sq, vid)) in enumerate(zip(got, expect), start=1):
        assert r["outlier_rank"] == rank
        assert r["vec_id"] == vid
        assert abs(r["maha_sq"] - round(sq / 1e9, 6)) < 1e-9
