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


def test_cusum_python_replay(spark):
    """A prefix-sum replay over the hourly series reproduces the
    change-point hour, peak value, and both segment means."""
    from map_reduce_implementation_spark.sources import table

    ev = table(spark, SF0001, "events").select("ts").collect()
    counts: dict[pd.Timestamp, int] = {}
    for r in ev:
        h = pd.Timestamp(r["ts"]).floor("h")
        counts[h] = counts.get(h, 0) + 1
    hours = sorted(counts)
    nh, s = len(hours), sum(counts.values())
    prefix, best = 0, None
    for t, h in enumerate(hours, start=1):
        prefix += counts[h]
        dint = nh * prefix - t * s
        if best is None or abs(dint) > abs(best[0]):
            best = (dint, h)
    dint, ph = best
    before = [counts[h] for h in hours if h <= ph]
    after = [counts[h] for h in hours if h > ph]

    r = QS["events_changepoint_cusum"].build(spark, SF0001).collect()[0]
    assert r["n_hours"] == nh
    assert pd.Timestamp(r["changepoint_hour"]) == ph
    assert abs(r["cusum_peak"] - round(dint / nh, 6)) < 1e-9
    assert abs(r["mean_before"] - sum(before) / len(before)) < 1e-6
    if after:
        assert abs(r["mean_after"] - sum(after) / len(after)) < 1e-6


def test_cusum_planted_level_shift(spark, tmp_path):
    """A planted rate jump at hour 24 of 48 is localized exactly and
    the segment means recover the two true rates."""
    rows, eid = [], 0
    base = pd.Timestamp("2024-01-01 00:00:00")
    for h in range(48):
        n = 2 if h < 24 else 8
        for j in range(n):
            rows.append((eid, base + pd.Timedelta(hours=h, minutes=j), 1, "view", 1.0, "{}"))
            eid += 1
    pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).to_parquet(str(tmp_path / "events.parquet"))
    r = QS["events_changepoint_cusum"].build(spark, str(tmp_path)).collect()[0]
    assert pd.Timestamp(r["changepoint_hour"]) == base + pd.Timedelta(hours=23)
    assert abs(r["mean_before"] - 2.0) < 1e-9
    assert abs(r["mean_after"] - 8.0) < 1e-9


def test_pmi_python_replay(spark):
    """A dict replay (sum-of-logs PMI, same min-count and tie-breaks)
    reproduces the top-20 collocations."""
    import re

    from map_reduce_implementation_spark.sources import table
    from map_reduce_implementation_spark.suite.stats2 import (
        PMI_MIN_COUNT,
        PMI_TOP_K,
    )

    docs = table(spark, SF0001, "documents").select("text").collect()
    c1: dict[str, int] = {}
    c2: dict[tuple[str, str], int] = {}
    b = 0
    for r in docs:
        ts = [t for t in re.split(r"[^a-z0-9]+", r["text"].lower()) if t]
        for t in ts:
            c1[t] = c1.get(t, 0) + 1
        for x, y in zip(ts, ts[1:]):
            c2[(x, y)] = c2.get((x, y), 0) + 1
            b += 1
    u = sum(c1.values())
    scored = sorted(
        (
            (
                round(
                    math.log(c) + 2.0 * math.log(u) - math.log(b)
                    - math.log(c1[x]) - math.log(c1[y]),
                    6,
                ),
                x,
                y,
                c,
            )
            for (x, y), c in c2.items()
            if c >= PMI_MIN_COUNT
        ),
        key=lambda t: (-t[0], t[1], t[2]),
    )[:PMI_TOP_K]

    got = QS["text_collocations_pmi"].build(spark, SF0001).collect()
    assert len(got) == len(scored)
    for r, (pmi, x, y, c) in zip(got, scored):
        assert (r["prev"], r["cur"], r["n_pair"]) == (x, y, c)
        assert abs(r["pmi"] - pmi) < 2e-6
