"""Semantic invariants for the round-5 wave operators — properties the
oracle equality check can't express (it proves Spark == DuckDB, not
that both compute the RIGHT thing)."""

from __future__ import annotations

import hashlib

import numpy as np

from map_reduce_implementation_spark.suite import all_queries

from .conftest import SF0001

QS = all_queries()


def _tokens(text: str) -> list[str]:
    import re

    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


def test_line_dedup_reassembly_and_global_counts(spark):
    """C4 segment dedup: per-doc counts are consistent, the corpus-wide
    kept total equals the number of DISTINCT segments (each distinct
    segment survives exactly once), and a pure-Python keep-first
    replay reproduces every doc's kept_hash."""
    from map_reduce_implementation_spark.sources import table
    from map_reduce_implementation_spark.suite.curation5 import SEG_TOKENS

    docs = sorted(
        table(spark, SF0001, "documents").select("doc_id", "text").collect(),
        key=lambda r: r["doc_id"],
    )
    seen: set[str] = set()
    expect: dict[int, tuple[int, int, str]] = {}
    total_distinct = 0
    for r in docs:
        ts = _tokens(r["text"])
        segs = [
            " ".join(ts[i : i + SEG_TOKENS])
            for i in range(0, len(ts), SEG_TOKENS)
        ]
        kept = []
        for s in segs:
            if s not in seen:
                seen.add(s)
                kept.append(s)
        if segs:
            expect[r["doc_id"]] = (
                len(segs),
                len(kept),
                hashlib.md5(" ".join(kept).encode()).hexdigest(),
            )
        total_distinct += len(kept)
    rows = QS["dedup_line_level"].build(spark, SF0001).collect()
    assert len(rows) == len(expect)
    for r in rows:
        n_seg, n_kept, kept_hash = expect[r["doc_id"]]
        assert (r["n_segments"], r["n_kept"], r["kept_hash"]) == (
            n_seg,
            n_kept,
            kept_hash,
        ), r["doc_id"]
    assert sum(r["n_kept"] for r in rows) == len(seen) == total_distinct


def test_ngram_overlap_python_replay(spark):
    """Overlap fraction is in [0, 1]; eval docs never appear; and a pure
    Python replay of the shingle sets reproduces every training doc's
    (n_shingles, n_hits, overlap_frac, is_contaminated) exactly —
    including docs that genuinely overlap the eval slice (the corpus
    must contain contaminated docs for the query to prove anything)."""
    from map_reduce_implementation_spark.sources import table
    from map_reduce_implementation_spark.suite.curation5 import (
        EVAL_MOD,
        OVERLAP_NGRAM,
        OVERLAP_THRESHOLD,
    )

    rows = QS["decontaminate_ngram_overlap"].build(spark, SF0001).collect()
    assert rows
    docs = table(spark, SF0001, "documents").select("doc_id", "text").collect()

    def sh(text: str) -> set[str]:
        ts = _tokens(text)
        return {
            " ".join(ts[i : i + OVERLAP_NGRAM])
            for i in range(len(ts) - OVERLAP_NGRAM + 1)
        }

    ev: set[str] = set()
    for r in docs:
        if r["doc_id"] % EVAL_MOD == 0:
            ev |= sh(r["text"])
    by_id = {r["doc_id"]: r["text"] for r in docs}
    n_overlapping = 0
    for r in rows:
        assert r["doc_id"] % EVAL_MOD != 0
        assert 0.0 <= r["overlap_frac"] <= 1.0
        s = sh(by_id[r["doc_id"]])
        hits = len(s & ev)
        assert (r["n_shingles"], r["n_hits"]) == (len(s), hits), r["doc_id"]
        frac = hits / len(s) if s else 0.0
        assert abs(r["overlap_frac"] - round(frac, 9)) < 1e-12
        assert r["is_contaminated"] == (frac >= OVERLAP_THRESHOLD)
        n_overlapping += hits > 0
    assert n_overlapping > 0, "no training doc overlaps the eval slice"


def test_mattr_bounds_and_numpy_crosscheck(spark):
    """0 < mattr <= 1, mattr well-defined for every doc, and a numpy
    replay of the windowed distinct counts agrees exactly."""
    from map_reduce_implementation_spark.sources import table
    from map_reduce_implementation_spark.suite.curation5 import MATTR_W

    rows = QS["text_mattr"].build(spark, SF0001).collect()
    docs = {
        r["doc_id"]: r["text"]
        for r in table(spark, SF0001, "documents").collect()
    }
    assert rows
    for r in rows[:50]:
        ts = _tokens(docs[r["doc_id"]])
        assert r["n_tokens"] == len(ts)
        assert 0 < r["mattr"] <= 1 and 0 < r["ttr"] <= 1
        if len(ts) >= MATTR_W:
            wins = [
                len(set(ts[i : i + MATTR_W]))
                for i in range(len(ts) - MATTR_W + 1)
            ]
            expect = sum(wins) / (len(wins) * MATTR_W)
        else:
            expect = len(set(ts)) / len(ts)
        assert abs(r["mattr"] - round(expect, 9)) < 1e-12, r["doc_id"]


def test_anomaly_mad_numpy_crosscheck(spark):
    """Median/MAD and the outlier count agree with a numpy replay
    (linear-interpolation quantile == Spark percentile)."""
    from map_reduce_implementation_spark.sources import table
    from map_reduce_implementation_spark.suite.curation5 import MAD_K, MAD_SCALE

    rows = {
        r["event_type"]: r
        for r in QS["events_anomaly_mad"].build(spark, SF0001).collect()
    }
    ev = table(spark, SF0001, "events").select("event_type", "value").collect()
    by_type: dict[str, list[float]] = {}
    for r in ev:
        by_type.setdefault(r["event_type"], []).append(r["value"])
    assert set(rows) == set(by_type)
    for t, vals in by_type.items():
        a = np.asarray(vals)
        med = float(np.quantile(a, 0.5, method="linear"))
        mad = float(np.quantile(np.abs(a - med), 0.5, method="linear"))
        n_out = int((np.abs(a - med) > MAD_K * MAD_SCALE * mad).sum())
        r = rows[t]
        assert r["n_events"] == len(vals)
        assert abs(r["median_value"] - round(med, 9)) < 1e-12
        assert abs(r["mad"] - round(mad, 9)) < 1e-12
        assert r["n_outliers"] == n_out, t


def test_two_stage_ranks_and_candidate_containment(spark):
    """Per query: ranks are exactly 1..k (or fewer iff candidates run
    out), sims non-increasing, every hit lies in one of the query's
    probe cells, and stage-2 can never beat brute force (top-1 sim <=
    exact top-1 sim over the whole corpus)."""
    from map_reduce_implementation_spark.sources import table
    from map_reduce_implementation_spark.suite.pipeline3 import (
        TS_CELLS,
        TS_K,
        TS_PROBE,
        TS_QMOD,
        TS_QREM,
    )

    rows = QS["similarity_two_stage_retrieval"].build(spark, SF0001).collect()
    assert rows
    emb = {
        r["vec_id"]: np.asarray([float(x) for x in r["embedding"]])
        for r in table(spark, SF0001, "embeddings").collect()
    }
    cents = [emb[i] for i in range(TS_CELLS)]

    def cell_of(v):
        d = [float(((v - c) ** 2).sum()) for c in cents]
        return d.index(min(d))

    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, rs in by_q.items():
        assert qid % TS_QMOD == TS_QREM
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= TS_K
        sims = [r["sim"] for r in rs]
        assert sims == sorted(sims, reverse=True)
        qv = emb[qid]
        d = [float(((qv - c) ** 2).sum()) for c in cents]
        probe = set(sorted(range(TS_CELLS), key=lambda i: (d[i], i))[:TS_PROBE])
        exact_best = max(
            float(qv @ v / (np.linalg.norm(qv) * np.linalg.norm(v)))
            for i, v in emb.items()
            if i != qid
        )
        for r in rs:
            assert cell_of(emb[r["vec_id"]]) in probe, (qid, r["vec_id"])
        assert sims[0] <= round(exact_best, 9) + 1e-9


def test_whitening_standardizes(spark):
    """The whitened population must actually have ~zero mean and ~unit
    variance at the probe dimensions (the operator's entire point),
    checked by recomputing moments over the emitted columns."""
    rows = QS["embedding_whitening"].build(spark, SF0001).collect()
    assert rows
    for col in ["w0", "w5", "w10"]:
        a = np.asarray([r[col] for r in rows])
        assert abs(a.mean()) < 1e-6, col
        assert abs(a.var() - 1.0) < 1e-3, col
    norms = np.asarray([r["whitened_norm"] for r in rows])
    # E[||w||^2] == DIM by construction (sum of unit variances)
    assert abs((norms**2).mean() - 64.0) < 1.0


def test_burst_zscore_pandas_crosscheck(spark):
    """Replay the trailing-window z-score in pandas for every type and
    compare bucket/burst counts and max_z exactly."""
    import pandas as pd

    from map_reduce_implementation_spark.sources import table
    from map_reduce_implementation_spark.suite.pipeline3 import (
        BURST_MIN_K,
        BURST_WIN,
        BURST_Z,
    )

    rows = {
        r["event_type"]: r
        for r in QS["events_burst_zscore"].build(spark, SF0001).collect()
    }
    ev = table(spark, SF0001, "events").select("event_type", "ts").toPandas()
    ev["h"] = ev["ts"].dt.floor("h")
    cells = (
        ev.groupby(["event_type", "h"]).size().rename("c").reset_index()
    ).sort_values(["event_type", "h"])
    for t, g in cells.groupby("event_type"):
        c = g["c"].to_numpy(dtype=np.int64)
        n_bursts, max_z = 0, None
        for i in range(len(c)):
            lo = max(0, i - BURST_WIN)
            base = c[lo:i]
            k = len(base)
            if k < BURST_MIN_K:
                continue
            m = base.sum() / k
            var = max((base**2).sum() / k - m * m, 0.0)
            sd = var**0.5
            if sd <= 0:
                continue
            z = (c[i] - m) / sd
            if z > BURST_Z:
                n_bursts += 1
            max_z = z if max_z is None else max(max_z, z)
        r = rows[t]
        assert r["n_buckets"] == len(c)
        assert r["n_bursts"] == n_bursts, t
        if max_z is None:
            assert r["max_z"] is None
        else:
            assert abs(r["max_z"] - round(max_z, 6)) < 1e-9, t


def test_bpe_apply_segmentation_invariants(spark):
    """Every reported segmentation re-concatenates to its word, symbol
    counts are consistent, the rows are the true top-N by frequency,
    and the learned merges actually compress at least one top word."""
    from map_reduce_implementation_spark.suite.curation4 import (
        BPE_APPLY_TOPN,
    )

    rows = QS["tokenizer_bpe_apply"].build(spark, SF0001).collect()
    assert 0 < len(rows) <= BPE_APPLY_TOPN
    freqs = [r["freq"] for r in rows]
    assert freqs == sorted(freqs, reverse=True)
    compressed = 0
    for r in rows:
        syms = r["segmentation"].split("|")
        assert "".join(syms) == r["w"]
        assert r["n_symbols"] == len(syms)
        assert r["n_chars"] == len(r["w"])
        assert r["n_symbols"] <= r["n_chars"]
        compressed += r["n_symbols"] < r["n_chars"]
    assert compressed > 0, "no top word was compressed by the merges"


def test_incremental_dedup_python_replay(spark):
    """Asymmetric crawl-delta dedup: exact flags replay from old-corpus
    hashes, near_dup_of always points at an OLD doc, and the keep
    decision is exactly (not exact) AND (no near-dup)."""
    import hashlib as _h

    from map_reduce_implementation_spark.sources import table
    from map_reduce_implementation_spark.suite.curation5 import (
        NEW_MOD,
        NEW_REM,
    )

    rows = QS["dedup_incremental"].build(spark, SF0001).collect()
    docs = table(spark, SF0001, "documents").select("doc_id", "text").collect()
    old_hashes = {
        _h.md5(r["text"].encode()).hexdigest()
        for r in docs
        if r["doc_id"] % NEW_MOD != NEW_REM
    }
    by_id = {r["doc_id"]: r["text"] for r in docs}
    n_new = sum(1 for r in docs if r["doc_id"] % NEW_MOD == NEW_REM)
    assert len(rows) == n_new
    for r in rows:
        assert r["doc_id"] % NEW_MOD == NEW_REM
        expect_exact = (
            _h.md5(by_id[r["doc_id"]].encode()).hexdigest() in old_hashes
        )
        assert r["is_exact_dup"] == expect_exact, r["doc_id"]
        if r["near_dup_of"] is not None:
            assert r["near_dup_of"] % NEW_MOD != NEW_REM, r
        assert r["is_kept"] == (
            not r["is_exact_dup"] and r["near_dup_of"] is None
        ), r
