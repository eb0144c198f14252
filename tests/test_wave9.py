"""Semantic invariants for the round-5 corpus-health / graph / mining
wave — Python replays proving each query computes the RIGHT thing (the
oracle gate only proves Spark == DuckDB)."""

from __future__ import annotations

import math
import re

import numpy as np

from map_reduce_implementation_spark.suite import all_queries

from .conftest import SF0001

QS = all_queries()


def _doc_tokens(spark, sf):
    from map_reduce_implementation_spark.sources import table

    docs = sorted(
        table(spark, sf, "documents").select("doc_id", "text").collect(),
        key=lambda r: r["doc_id"],
    )
    return {
        r["doc_id"]: [
            t for t in re.split(r"[^a-z0-9]+", r["text"].lower()) if t
        ]
        for r in docs
    }


def test_kneser_ney_python_replay(spark):
    """A dict-based KN replay reproduces every doc's 6-dp average NLL,
    and the interpolated model is a PROPER distribution: for every
    context, total probability mass over the full vocabulary is 1."""
    from map_reduce_implementation_spark.suite.corpus2 import KN_DISCOUNT

    toks = _doc_tokens(spark, SF0001)
    c2: dict[tuple[str, str], int] = {}
    for ts in toks.values():
        for a, b in zip(ts, ts[1:]):
            c2[(a, b)] = c2.get((a, b), 0) + 1
    c1: dict[str, int] = {}
    n1fw: dict[str, int] = {}
    nprec: dict[str, int] = {}
    for (a, b), n in c2.items():
        c1[a] = c1.get(a, 0) + n
        n1fw[a] = n1fw.get(a, 0) + 1
        nprec[b] = nprec.get(b, 0) + 1
    ntypes = len(c2)

    def p_kn(a: str, b: str) -> float:
        disc = max(c2.get((a, b), 0) - KN_DISCOUNT, 0.0) / c1[a]
        backoff = KN_DISCOUNT * n1fw[a] / c1[a]
        return disc + backoff * (nprec.get(b, 0) / ntypes)

    # proper-distribution invariant: mass over the FULL successor
    # vocabulary is exactly 1 for every context (the KN telescoping)
    succ_vocab = set(nprec)
    for a in list(c1)[:20]:
        mass = sum(p_kn(a, b) for b in succ_vocab)
        assert abs(mass - 1.0) < 1e-9, (a, mass)

    expect = {}
    for did, ts in toks.items():
        pairs = list(zip(ts, ts[1:]))
        if not pairs:
            continue
        nll = -sum(math.log(p_kn(a, b)) for a, b in pairs) / len(pairs)
        expect[did] = (len(pairs), round(nll, 6))

    got = QS["text_kneser_ney_logprob"].build(spark, SF0001).collect()
    assert len(got) == len(expect)
    for r in got:
        n, nll = expect[r["doc_id"]]
        assert r["n_bigrams"] == n
        assert abs(r["avg_nll_kn"] - nll) < 1e-9


def test_zipf_fit_matches_polyfit(spark):
    """numpy lstsq on the exact (unquantized) log-log points agrees
    with the quantized closed-form fit to ~1e-5, and the corpus slope
    is negative (frequencies decay with rank)."""
    toks = _doc_tokens(spark, SF0001)
    ctf: dict[str, int] = {}
    for ts in toks.values():
        for t in ts:
            ctf[t] = ctf.get(t, 0) + 1
    ranked = sorted(ctf.items(), key=lambda kv: (-kv[1], kv[0]))[:500]
    x = np.log(np.arange(1, len(ranked) + 1, dtype=np.float64))
    y = np.log(np.array([c for _, c in ranked], dtype=np.float64))
    slope, intercept = np.polyfit(x, y, 1)
    r = np.corrcoef(x, y)[0, 1]

    row = QS["text_zipf_fit"].build(spark, SF0001).collect()[0]
    assert row["n_terms"] == len(ranked)
    assert abs(row["slope"] - slope) < 1e-5
    assert abs(row["intercept"] - intercept) < 1e-5
    assert abs(row["r2"] - r * r) < 1e-5
    assert row["slope"] < 0


def test_shortest_paths_python_bfs(spark):
    """A collections.deque BFS over the collected edge list reproduces
    the hop histogram exactly."""
    from collections import deque

    from map_reduce_implementation_spark.sources import table
    from map_reduce_implementation_spark.suite.graph import (
        _BFS_HOPS,
        _BFS_SOURCE,
    )

    li = table(spark, SF0001, "lineitem").select("l_orderkey", "l_suppkey")
    orders = table(spark, SF0001, "orders").select("o_orderkey", "o_custkey")
    pairs = {
        (r["l_suppkey"], -(r["o_custkey"] + 1))
        for r in li.join(
            orders, li["l_orderkey"] == orders["o_orderkey"]
        ).collect()
    }
    adj: dict[int, set[int]] = {}
    for s, c in pairs:
        adj.setdefault(s, set()).add(c)
        adj.setdefault(c, set()).add(s)

    dist = {_BFS_SOURCE: 0}
    dq = deque([_BFS_SOURCE])
    while dq:
        u = dq.popleft()
        if dist[u] >= _BFS_HOPS:
            continue
        for v in adj.get(u, ()):
            if v not in dist:
                dist[v] = dist[u] + 1
                dq.append(v)
    hist: dict[int, list[int]] = {}
    for node, h in dist.items():
        hist.setdefault(h, []).append(node)

    got = QS["graph_shortest_paths"].build(spark, SF0001).collect()
    assert {r["hops"] for r in got} == set(hist)
    for r in got:
        nodes = hist[r["hops"]]
        assert r["n_nodes"] == len(nodes)
        assert r["min_node"] == min(nodes)
        assert r["max_node"] == max(nodes)


def test_hard_negatives_numpy_replay(spark):
    """Brute-force numpy cosine + label filter reproduces every mined
    hard negative (ids, ranks, 9-dp sims), every negative's label
    differs from its anchor's, and each anchor's negatives beat every
    unmined different-label candidate."""
    from map_reduce_implementation_spark.sources import table
    from map_reduce_implementation_spark.suite.vector2 import (
        HN_K,
        HN_SAMPLE_MOD,
    )

    rows = sorted(
        table(spark, SF0001, "embeddings").collect(),
        key=lambda r: r["vec_id"],
    )
    ids = np.asarray([r["vec_id"] for r in rows])
    labels = np.asarray([r["label"] for r in rows])
    X = np.asarray([r["embedding"] for r in rows], dtype=np.float64)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)

    anchors = ids % HN_SAMPLE_MOD == 0
    got = QS["similarity_hard_negatives"].build(spark, SF0001).collect()
    by_anchor: dict[int, list] = {}
    for r in got:
        by_anchor.setdefault(r["query_id"], []).append(r)

    assert set(by_anchor) <= set(ids[anchors].tolist())
    for qi in np.flatnonzero(anchors):
        qid, qlab = int(ids[qi]), int(labels[qi])
        cand = np.flatnonzero((~anchors) & (labels != qlab))
        if cand.size == 0:
            assert qid not in by_anchor
            continue
        sims = np.round(Xn[cand] @ Xn[qi], 9)
        order = sorted(
            zip(sims.tolist(), ids[cand].tolist()),
            key=lambda t: (-t[0], t[1]),
        )[:HN_K]
        rs = sorted(by_anchor[qid], key=lambda r: r["neg_rank"])
        assert len(rs) == len(order)
        for r, (sim, nid) in zip(rs, order):
            assert r["neighbor_id"] == nid
            assert abs(r["sim"] - sim) < 2e-9
            assert r["neighbor_label"] != r["anchor_label"] == qlab


def test_cross_source_overlap_cap_bites(spark, tmp_path):
    """Synthetic-parquet regression (the oracle-mirror-trap pattern):
    a boilerplate shingle shared by 25 docs (df > max_df) must NOT
    create pairs, while a planted near-dup pair across two sources
    must — and Spark matches the DuckDB oracle cell-for-cell on data
    where the cap actually bites (the shipped corpus's hottest shingle
    stays under the cap)."""
    import duckdb
    import pandas as pd

    from map_reduce_implementation_spark.suite.corpus2 import (
        OVERLAP_MAX_DF,
        SQL_CROSS_SOURCE_OVERLAP,
    )

    boiler = "alpha beta gamma delta epsilon"  # one 5-gram shingle
    rows = []
    # 25 docs (> max_df) sharing ONLY the boilerplate shingle
    for i in range(OVERLAP_MAX_DF + 5):
        rows.append((i, boiler + f" tail{i} x{i} y{i} z{i} w{i}", "en", f"src{i % 3}", 0))
    # one true near-dup pair across two sources (identical long text)
    near = "one two three four five six seven eight nine ten eleven"
    rows.append((100, near, "en", "srcA", 0))
    rows.append((101, near + " twelve", "en", "srcB", 0))
    pdf = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    path = str(tmp_path / "documents.parquet")
    pdf.to_parquet(path)

    got = QS["cross_source_overlap"].build(spark, str(tmp_path)).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["source_a"], r["source_b"]) == ("srcA", "srcB")
    assert r["n_pairs"] == 1 and r["cross_source"] and r["pair_share"] == 1.0

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{path}'")
    odf = con.execute(SQL_CROSS_SOURCE_OVERLAP).df()
    assert len(odf) == 1
    o = odf.iloc[0]
    assert (o["source_a"], o["source_b"]) == ("srcA", "srcB")
    assert int(o["n_pairs"]) == 1 and bool(o["cross_source"])


def test_cross_source_overlap_shares_sum(spark):
    """pair_share is a distribution over cells (sums to 1 at 6 dp)."""
    got = QS["cross_source_overlap"].build(spark, SF0001).collect()
    assert got, "corpus must contain near-dup pairs"
    assert abs(sum(r["pair_share"] for r in got) - 1.0) < 1e-4
