"""Semantic invariants for round-5 wave 13 (mutual information,
autocorrelation)."""

from __future__ import annotations

import math

import pandas as pd

from map_reduce_implementation_spark.suite import all_queries

from .conftest import SF0001

QS = all_queries()


def test_mutual_information_python_replay(spark):
    """A dict contingency-table replay reproduces MI and both
    entropies; information-theoretic bounds hold: 0 <= MI <= min(H),
    normalized in [0, 1]."""
    from map_reduce_implementation_spark.sources import table

    docs = table(spark, SF0001, "documents").select("lang", "source").collect()
    n = len(docs)
    cells: dict[tuple[str, str], int] = {}
    for r in docs:
        cells[(r["lang"], r["source"])] = cells.get((r["lang"], r["source"]), 0) + 1
    rows: dict[str, int] = {}
    cols: dict[str, int] = {}
    for (l, s), c in cells.items():
        rows[l] = rows.get(l, 0) + c
        cols[s] = cols.get(s, 0) + c
    mi = sum(
        (c / n) * math.log(c * n / (rows[l] * cols[s]))
        for (l, s), c in cells.items()
    )
    hl = -sum((c / n) * math.log(c / n) for c in rows.values())
    hs = -sum((c / n) * math.log(c / n) for c in cols.values())

    r = QS["corpus_mutual_information"].build(spark, SF0001).collect()[0]
    assert r["n_docs"] == n
    assert abs(r["mi_nats"] - mi) < 1e-6
    assert abs(r["h_lang"] - hl) < 1e-6
    assert abs(r["h_source"] - hs) < 1e-6
    assert -1e-9 <= r["mi_nats"] <= min(hl, hs) + 1e-9
    assert -1e-9 <= r["normalized_mi"] <= 1 + 1e-9


def test_mutual_information_extremes(spark, tmp_path):
    """A source-determines-language corpus scores normalized MI = 1;
    a perfectly independent (balanced product) corpus scores MI = 0 —
    and Spark matches the oracle on both."""
    import duckdb

    from map_reduce_implementation_spark.suite.stats2 import (
        SQL_CORPUS_MUTUAL_INFORMATION,
    )

    def run(sub, rows):
        sub.mkdir()
        pd.DataFrame(
            rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
        ).to_parquet(str(sub / "documents.parquet"))
        got = QS["corpus_mutual_information"].build(spark, str(sub)).collect()[0]
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{sub}/documents.parquet'"
        )
        o = con.execute(SQL_CORPUS_MUTUAL_INFORMATION).df().iloc[0]
        assert abs(got["mi_nats"] - o["mi_nats"]) < 1e-9
        return got

    det = run(
        tmp_path / "det",
        [(i, "x", "en" if i % 2 else "de", f"s{i % 2}", 1) for i in range(8)],
    )
    assert abs(det["normalized_mi"] - 1.0) < 1e-6

    ind = run(
        tmp_path / "ind",
        [
            (4 * i + 2 * a + b, "x", ["en", "de"][a], f"s{b}", 1)
            for i in range(4)
            for a in range(2)
            for b in range(2)
        ],
    )
    assert abs(ind["mi_nats"]) < 1e-9


def test_autocorrelation_numpy_replay(spark):
    """A numpy replay over the hourly series reproduces every lag's
    ACF; |r| <= 1."""
    from map_reduce_implementation_spark.sources import table
    from map_reduce_implementation_spark.suite.stats2 import ACF_LAGS

    ev = table(spark, SF0001, "events").select("ts").collect()
    counts: dict[pd.Timestamp, int] = {}
    for r in ev:
        h = pd.Timestamp(r["ts"]).floor("h")
        counts[h] = counts.get(h, 0) + 1
    hours = sorted(counts)
    y = {h: counts[h] for h in hours}
    ybar = sum(y.values()) / len(y)
    den = sum((v - ybar) ** 2 for v in y.values())

    got = {r["lag"]: r for r in QS["events_autocorrelation"].build(spark, SF0001).collect()}
    assert set(got) == set(ACF_LAGS)
    for k in ACF_LAGS:
        pairs = [
            (y[h], y[h + pd.Timedelta(hours=k)])
            for h in hours
            if h + pd.Timedelta(hours=k) in y
        ]
        r = got[k]
        assert r["n_pairs"] == len(pairs)
        num = sum((a - ybar) * (b - ybar) for a, b in pairs)
        assert abs(r["acf"] - num / den) < 1e-6
        assert abs(r["acf"]) <= 1 + 1e-6


def test_autocorrelation_periodic_signal(spark, tmp_path):
    """A 2-hour-periodic synthetic stream has ACF(2) near 1
    (in-phase) and ACF(1) near -1 (anti-phase)."""
    rows = []
    eid = 0
    base = pd.Timestamp("2024-01-01 00:00:00")
    for h in range(48):
        n = 5 if h % 2 == 0 else 1
        for j in range(n):
            rows.append(
                (eid, base + pd.Timedelta(hours=h, minutes=j), 1, "view", 1.0, "{}")
            )
            eid += 1
    pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).to_parquet(str(tmp_path / "events.parquet"))

    got = {r["lag"]: r for r in QS["events_autocorrelation"].build(spark, str(tmp_path)).collect()}
    # finite-series bias: exact values are +46*4/192 = 0.958 and
    # -47*4/192 = -0.979
    assert got[2]["acf"] > 0.9
    assert got[1]["acf"] < -0.9
