"""Semantic invariants for round-5 wave 10 (TextRank, Cohen's kappa,
BLEU precision, Markov stationary distribution, l-diversity) — Python
replays proving each query computes the RIGHT thing (the oracle gate
only proves Spark == DuckDB)."""

from __future__ import annotations

import re

import numpy as np

from map_reduce_implementation_spark.suite import all_queries

from .conftest import SF0001

QS = all_queries()


def _docs(spark, sf):
    from map_reduce_implementation_spark.sources import table

    return sorted(
        table(spark, sf, "documents").select("doc_id", "lang", "text").collect(),
        key=lambda r: r["doc_id"],
    )


def _toks(text: str) -> list[str]:
    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


def test_textrank_python_replay(spark):
    """A dict-based PageRank over the co-occurrence graph reproduces
    the top-20 keywords, their ranks, and 9-dp scores."""
    from map_reduce_implementation_spark.suite.corpus3 import (
        TR_DAMPING,
        TR_ITERS,
        TR_TOP_K,
    )

    und = set()
    for r in _docs(spark, SF0001):
        ts = _toks(r["text"])
        for a, b in zip(ts, ts[1:]):
            if a != b:
                und.add((a, b))
    edges = und | {(b, a) for a, b in und}
    out: dict[str, list[str]] = {}
    for s, d in edges:
        out.setdefault(s, []).append(d)
    nodes = sorted(out)
    n = len(nodes)
    pr = {v: 1.0 / n for v in nodes}
    for _ in range(TR_ITERS):
        contrib: dict[str, float] = {}
        for s in nodes:
            share = pr[s] / len(out[s])
            for d in out[s]:
                contrib[d] = contrib.get(d, 0.0) + share
        pr = {
            v: (1.0 - TR_DAMPING) / n + TR_DAMPING * contrib.get(v, 0.0)
            for v in nodes
        }
    expect = sorted(
        ((round(p, 9), v) for v, p in pr.items()), key=lambda t: (-t[0], t[1])
    )[:TR_TOP_K]

    got = sorted(
        QS["text_textrank_keywords"].build(spark, SF0001).collect(),
        key=lambda r: r["keyword_rank"],
    )
    assert len(got) == min(TR_TOP_K, n)
    for r, (score, term) in zip(got, expect):
        assert r["term"] == term
        assert abs(r["score"] - score) < 2e-9


def test_lang_id_kappa_python_replay(spark):
    """Replaying kappa from the collected confusion cells reproduces
    p_o, p_e, and kappa; kappa is bounded by 1 and exceeds p_o − 1."""
    pred = {
        r["doc_id"]: r["predicted_lang"]
        for r in QS["text_lang_id"].build(spark, SF0001).collect()
    }
    true = {r["doc_id"]: r["lang"] for r in _docs(spark, SF0001)}
    n = len(true)
    agree = sum(1 for d in true if pred[d] == true[d])
    rows: dict[str, int] = {}
    cols: dict[str, int] = {}
    for d in true:
        rows[true[d]] = rows.get(true[d], 0) + 1
        cols[pred[d]] = cols.get(pred[d], 0) + 1
    po = agree / n
    pe = sum(rows[c] * cols.get(c, 0) for c in rows) / (n * n)
    kappa = (po - pe) / (1 - pe)

    r = QS["text_lang_id_kappa"].build(spark, SF0001).collect()[0]
    assert r["n_docs"] == n
    assert abs(r["p_observed"] - po) < 1e-6
    assert abs(r["p_expected"] - pe) < 1e-6
    assert abs(r["kappa"] - kappa) < 1e-6
    # kappa is bounded above by 1; on the synthetic small-vocab corpus
    # the stopword heuristic sits AT chance (kappa ≈ 0, slightly
    # negative at sf0.001) — exactly the diagnosis the metric exists
    # to make, so assert the bound, not performance
    assert -1.0 <= r["kappa"] <= 1.0


def test_bleu_precision_python_replay(spark):
    """Clipped-count replay reproduces every language's modified
    bigram precision; a language identical to the reference would
    score 1, and all precisions sit in [0, 1]."""
    from map_reduce_implementation_spark.suite.corpus3 import BLEU_REF_LANG

    counts: dict[str, dict[str, int]] = {}
    for r in _docs(spark, SF0001):
        ts = _toks(r["text"])
        c = counts.setdefault(r["lang"], {})
        for a, b in zip(ts, ts[1:]):
            g = f"{a} {b}"
            c[g] = c.get(g, 0) + 1
    ref = counts.get(BLEU_REF_LANG, {})
    got = {r["lang"]: r for r in QS["text_bleu_precision"].build(spark, SF0001).collect()}
    expect_langs = {l for l in counts if l != BLEU_REF_LANG and counts[l]}
    assert set(got) == expect_langs
    for lang in expect_langs:
        cand = counts[lang]
        total = sum(cand.values())
        clipped = sum(min(c, ref.get(g, 0)) for g, c in cand.items())
        r = got[lang]
        assert r["n_bigrams"] == total
        assert r["clipped_hits"] == clipped
        assert abs(r["precision"] - round(clipped / total, 6)) < 1e-9
        assert 0.0 <= r["precision"] <= 1.0


def test_markov_stationary_numpy_replay(spark):
    """A numpy power-iteration replay over the transition matrix
    reproduces every state's 9-dp stationary mass, and total mass is
    conserved (every event type occurs as a predecessor)."""
    from map_reduce_implementation_spark.sources import table
    from map_reduce_implementation_spark.suite.events import MK_ITERS

    ev = sorted(
        table(spark, SF0001, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .collect(),
        key=lambda r: (r["user_id"], r["ts"], r["event_id"]),
    )
    cells: dict[tuple[str, str], int] = {}
    prev_user, prev_type = None, None
    for r in ev:
        if r["user_id"] == prev_user:
            cells[(prev_type, r["event_type"])] = (
                cells.get((prev_type, r["event_type"]), 0) + 1
            )
        prev_user, prev_type = r["user_id"], r["event_type"]
    states = sorted({p for p, _ in cells})
    idx = {s: i for i, s in enumerate(states)}
    P = np.zeros((len(states), len(states)))
    for (p, nxt), c in cells.items():
        if nxt in idx:
            P[idx[p], idx[nxt]] = c
    rowsum = np.array(
        [sum(c for (p, _), c in cells.items() if p == s) for s in states]
    )
    P = P / rowsum[:, None]
    # mass conservation requires every successor to also be a state
    assert {nxt for _, nxt in cells} <= set(states)
    pi = np.full(len(states), 1.0 / len(states))
    for _ in range(MK_ITERS):
        pi = pi @ P
    got = {r["event_type"]: r["stationary_prob"]
           for r in QS["events_markov_stationary"].build(spark, SF0001).collect()}
    assert set(got) == set(states)
    for s in states:
        assert abs(got[s] - pi[idx[s]]) < 2e-9
    assert abs(sum(got.values()) - 1.0) < 1e-6


def test_l_diversity_monotone_and_replay(spark):
    """A pandas replay over (nation, band) classes reproduces every
    l row, and risk counts are monotone non-decreasing in l."""
    from map_reduce_implementation_spark.sources import table
    from map_reduce_implementation_spark.suite.governance import (
        BAL_BAND,
        L_LEVELS,
    )

    rows = table(spark, SF0001, "customer").select(
        "c_nationkey", "c_acctbal", "c_mktsegment"
    ).collect()
    classes: dict[tuple[int, int], tuple[int, set[str]]] = {}
    for r in rows:
        key = (r["c_nationkey"], int(np.floor(r["c_acctbal"] / BAL_BAND)))
        sz, segs = classes.get(key, (0, set()))
        segs = segs | {r["c_mktsegment"]}
        classes[key] = (sz + 1, segs)

    got = sorted(
        QS["l_diversity_audit"].build(spark, SF0001).collect(),
        key=lambda r: r["l"],
    )
    assert [r["l"] for r in got] == sorted(L_LEVELS)
    prev_classes = prev_rows = -1
    for r in got:
        risky = [
            (sz, segs) for sz, segs in classes.values() if len(segs) < r["l"]
        ]
        assert r["n_classes"] == len(classes)
        assert r["n_risky_classes"] == len(risky)
        assert r["n_risky_rows"] == sum(sz for sz, _ in risky)
        assert r["n_risky_classes"] >= prev_classes
        assert r["n_risky_rows"] >= prev_rows
        prev_classes, prev_rows = r["n_risky_classes"], r["n_risky_rows"]
