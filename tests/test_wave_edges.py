"""Synthetic-parquet edge regressions for the round-5 waves (the
oracle-mirror-trap pattern): degenerate inputs the shipped corpora
never exercise, compared Spark-vs-DuckDB cell-for-cell."""

from __future__ import annotations

import duckdb
import pandas as pd

from map_reduce_implementation_spark.suite import all_queries

QS = all_queries()


def _docs_parquet(tmp_path, rows):
    pdf = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    path = str(tmp_path / "documents.parquet")
    pdf.to_parquet(path)
    return path


def test_zipf_degenerate_corpora(spark, tmp_path):
    """Constant frequencies → slope 0 with NULL r² (deny = 0); a
    single-term corpus → all-NULL fit (den = 0). Both engines agree on
    the guarded NULLs instead of a NaN-vs-NULL 0/0 divergence."""
    from map_reduce_implementation_spark.suite.corpus2 import SQL_ZIPF_FIT

    # every term occurs exactly once -> constant y
    path = _docs_parquet(
        tmp_path, [(1, "alpha beta gamma delta", "en", "s0", 22)]
    )
    r = QS["text_zipf_fit"].build(spark, str(tmp_path)).collect()[0]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{path}'")
    o = con.execute(SQL_ZIPF_FIT).df().iloc[0]
    assert r["n_terms"] == int(o["n_terms"]) == 4
    assert r["slope"] == 0.0 and o["slope"] == 0.0
    assert r["r2"] is None and pd.isna(o["r2"])

    # single term -> den = 0 -> every fit column NULL
    sub = tmp_path / "single"
    sub.mkdir()
    p2 = _docs_parquet(sub, [(1, "word word word", "en", "s0", 14)])
    r2 = QS["text_zipf_fit"].build(spark, str(sub)).collect()[0]
    con2 = duckdb.connect()
    con2.execute(f"CREATE VIEW documents AS SELECT * FROM '{p2}'")
    o2 = con2.execute(SQL_ZIPF_FIT).df().iloc[0]
    assert r2["n_terms"] == int(o2["n_terms"]) == 1
    for col in ("slope", "intercept", "r2"):
        assert r2[col] is None and pd.isna(o2[col]), col


def test_kneser_ney_short_docs(spark, tmp_path):
    """Zero- and one-token docs yield no bigrams and drop from the
    output in BOTH engines; the surviving doc's score matches."""
    from map_reduce_implementation_spark.suite.corpus2 import (
        SQL_KNESER_NEY_LOGPROB,
    )

    path = _docs_parquet(
        tmp_path,
        [
            (1, "a b a b c", "en", "s0", 9),
            (2, "a", "en", "s0", 1),  # one token -> no bigrams
            (3, "", "en", "s0", 0),  # empty -> no tokens
            (4, "!!!", "en", "s0", 3),  # punctuation only
        ],
    )
    got = QS["text_kneser_ney_logprob"].build(spark, str(tmp_path)).collect()
    assert [r["doc_id"] for r in got] == [1]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{path}'")
    odf = con.execute(SQL_KNESER_NEY_LOGPROB).df()
    assert list(odf["doc_id"]) == [1]
    assert got[0]["n_bigrams"] == int(odf["n_bigrams"][0]) == 4
    assert abs(got[0]["avg_nll_kn"] - odf["avg_nll_kn"][0]) < 1e-12


def test_markov_sink_only_state(spark, tmp_path):
    """A type that only ever ENDS sequences is not a chain state (it
    has no outgoing row); mass flowing into it leaves the tracked
    state set — both engines agree on the resulting vector."""
    from map_reduce_implementation_spark.suite.events import (
        _markov_stationary_oracle,
    )

    rows = [
        (1, pd.Timestamp("2024-01-01 00:00:00"), 1, "view", 1.0, "{}"),
        (2, pd.Timestamp("2024-01-01 00:01:00"), 1, "buy", 1.0, "{}"),
        (3, pd.Timestamp("2024-01-01 00:00:00"), 2, "view", 1.0, "{}"),
        (4, pd.Timestamp("2024-01-01 00:01:00"), 2, "buy", 1.0, "{}"),
    ]
    pdf = pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    path = str(tmp_path / "events.parquet")
    pdf.to_parquet(path)

    got = QS["events_markov_stationary"].build(spark, str(tmp_path)).collect()
    # 'buy' never precedes anything -> the only state is 'view', and
    # all of view's mass flows to the untracked sink each step
    assert [(r["event_type"], r["stationary_prob"]) for r in got] == [
        ("view", 0.0)
    ]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{path}'")
    odf = con.execute(_markov_stationary_oracle()).df()
    assert len(odf) == 1
    assert odf["event_type"][0] == "view"
    assert odf["stationary_prob"][0] == 0.0


def test_dsir_no_target_slice(spark, tmp_path):
    """With zero target-language docs the target LM collapses to the
    uniform Laplace floor; every doc still scores (identically in
    both engines) instead of erroring or dropping rows."""
    from map_reduce_implementation_spark.suite.curation7 import (
        SQL_DSIR_IMPORTANCE_SAMPLE,
    )

    path = _docs_parquet(
        tmp_path,
        [
            (1, "uno dos tres", "es", "s0", 12),
            (2, "eins zwei drei vier", "de", "s1", 19),
        ],
    )
    got = QS["dsir_importance_sample"].build(spark, str(tmp_path)).collect()
    assert {r["doc_id"] for r in got} == {1, 2}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{path}'")
    odf = con.execute(SQL_DSIR_IMPORTANCE_SAMPLE).df()
    o = {int(r["doc_id"]): r for _, r in odf.iterrows()}
    for r in got:
        assert r["n_tokens"] == int(o[r["doc_id"]]["n_tokens"])
        assert abs(r["avg_log_ratio"] - o[r["doc_id"]]["avg_log_ratio"]) < 1e-12


def test_kappa_degenerate_guards(spark, tmp_path):
    """Constant-and-correct predictions (p_e = 1) and all-drop gates
    produce guarded NULLs in both engines instead of NaN-vs-NULL."""
    from map_reduce_implementation_spark.suite.corpus3 import _kappa_oracle
    from map_reduce_implementation_spark.suite.quality2 import (
        _gate_agreement_oracle,
    )

    # all-en corpus, every doc stuffed with en stopwords -> pred
    # constant 'en' and correct -> p_e = 1 -> kappa NULL
    path = _docs_parquet(
        tmp_path, [(i, "the and of to in a an", "en", "s0", 21) for i in range(4)]
    )
    r = QS["text_lang_id_kappa"].build(spark, str(tmp_path)).collect()[0]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{path}'")
    o = con.execute(_kappa_oracle()).df().iloc[0]
    assert r["p_expected"] == 1.0 and o["p_expected"] == 1.0
    assert r["kappa"] is None and pd.isna(o["kappa"])

    # punctuation-only corpus -> both gates drop everything ->
    # keep_jaccard and kappa both guarded NULL
    sub = tmp_path / "drop"
    sub.mkdir()
    p2 = _docs_parquet(sub, [(i, "!!! ???", "en", "s0", 7) for i in range(3)])
    r2 = QS["quality_gate_agreement"].build(spark, str(sub)).collect()[0]
    con2 = duckdb.connect()
    con2.execute(f"CREATE VIEW documents AS SELECT * FROM '{p2}'")
    o2 = con2.execute(_gate_agreement_oracle()).df().iloc[0]
    assert r2["n_keep_gopher"] == r2["n_keep_stopword"] == 0
    assert int(o2["n_keep_gopher"]) == int(o2["n_keep_stopword"]) == 0
    assert r2["keep_jaccard"] is None and pd.isna(o2["keep_jaccard"])
    assert r2["kappa"] is None and pd.isna(o2["kappa"])
