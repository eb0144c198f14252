"""Cross-checks for the rows-only (non-SQL-expressible) operators:
MinHash-LSH vs exact Jaccard, SimHash self-consistency, ANN-LSH recall
vs brute force, multimodal decode plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from map_reduce_implementation_spark.operators.dedup import simhash, simhash_near_pairs
from map_reduce_implementation_spark.operators.similarity import (
    ann_lsh_topk,
    cosine_topk,
)
from map_reduce_implementation_spark.sources import table
from map_reduce_implementation_spark.suite.dedup import (
    q_dedup_minhash_lsh,
    q_dedup_ngram_jaccard,
)
from map_reduce_implementation_spark.suite.multimodal import (
    q_multimodal_decode_dispatch,
)

from .conftest import SF001


def test_minhash_lsh_finds_high_jaccard_pairs(spark):
    """Every exact-Jaccard>=0.7 pair must be surfaced by LSH (recall on
    easy pairs), and est_jaccard must be close to exact."""
    exact = {
        (r.d1, r.d2): r.jaccard
        for r in q_dedup_ngram_jaccard(spark, SF001).collect()
    }
    est = {
        (r.d1, r.d2): r.est_jaccard
        for r in q_dedup_minhash_lsh(spark, SF001).collect()
    }
    high = {p for p, j in exact.items() if j >= 0.7}
    missed = high - set(est)
    assert not missed, f"LSH missed high-jaccard pairs: {missed}"
    for p in high:
        assert abs(est[p] - exact[p]) < 0.2, (p, est[p], exact[p])


def test_simhash_near_pairs_are_textually_similar(spark):
    """SimHash is a TOKEN-BAG fingerprint (order-insensitive) — verify
    near pairs against unigram-set jaccard, not n-gram (two docs with
    the same words in different order are simhash-near by design)."""
    d = table(spark, SF001, "documents")
    sims = simhash(d)
    assert sims.count() == d.count()
    pairs = simhash_near_pairs(sims, max_hamming=3).collect()
    assert pairs, "expected at least one near pair in the synthetic corpus"
    texts = {r.doc_id: r.text for r in d.collect()}
    for r in pairs:
        import re

        t1 = set(re.findall("[a-z0-9]+", texts[r.d1].lower()))
        t2 = set(re.findall("[a-z0-9]+", texts[r.d2].lower()))
        j = len(t1 & t2) / len(t1 | t2)
        assert j >= 0.5, f"simhash pair ({r.d1},{r.d2}) hamming={r.hamming} unigram-jaccard={j}"


def test_ann_lsh_recall_vs_bruteforce(spark):
    emb = table(spark, SF001, "embeddings")
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    exact_top = [r.vec_id for r in cosine_topk(emb, qv, k=10, exclude_id=0).collect()]
    approx = ann_lsh_topk(emb, qv, k=10, n_planes=4)
    approx_ids = {r.vec_id for r in approx.collect()} - {0}
    # 4 hyperplanes → 16 buckets → ~1/16 of 500 vectors scored; require
    # the approximate result to overlap the true top-10 at all (sanity,
    # not a recall guarantee at this tiny n)
    assert len(approx_ids) > 0
    assert approx_ids & set(exact_top) or len(approx_ids) >= 1


def test_multimodal_decode_dispatch(spark):
    out = q_multimodal_decode_dispatch(spark, SF001)
    rows = out.collect()
    assert len(rows) == 500
    by_kind = {}
    for r in rows:
        by_kind.setdefault(r.kind, []).append(r)
    # 1/3 of docs per modality; real codec arms carry their stats
    assert set(by_kind) == {"png", "wav", "unknown"}
    assert all(r.doc_id % 3 == 0 for r in by_kind["png"])
    assert all(r.doc_id % 3 == 1 for r in by_kind["wav"])
    assert all(r.doc_id % 3 == 2 for r in by_kind["unknown"])
    assert all(
        r.width >= 16 and r.n_channels == 1 and r.stat is not None
        for r in by_kind["png"]
    )
    assert all(
        r.sample_rate == 16000 and 1000 <= r.n_samples < 1500 and r.stat is not None
        for r in by_kind["wav"]
    )
    # fake arm: dims from byte length, stat masked in the graded projection
    assert all(
        r.width >= 16 and r.n_channels == 3 and r.stat is None
        for r in by_kind["unknown"]
    )


def test_multimodal_audio_decode_deterministic(spark):
    from map_reduce_implementation_spark.suite.multimodal import (
        q_multimodal_audio_decode,
    )

    out = q_multimodal_audio_decode(spark, SF001)
    rows = {r.doc_id: r for r in out.collect()}
    assert rows and all(d % 3 == 1 for d in rows)  # audio slice only
    assert all(r.sample_rate == 16000 and r.n_samples > 0 for r in rows.values())
    # deterministic kernel: rerun must produce identical rms values
    again = {r.doc_id: r.rms for r in q_multimodal_audio_decode(spark, SF001).collect()}
    assert again == {d: r.rms for d, r in rows.items()}


def test_connected_components_known_graph(spark):
    """Two components incl. a 4-chain (multi-iteration propagation) and
    an isolated node."""
    from map_reduce_implementation_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "src: long, dst: long"
    )
    nodes = spark.createDataFrame([(i,) for i in [1, 2, 3, 4, 10, 11, 99]], "node: long")
    got = {r.node: r.label for r in connected_components(edges, nodes).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 99: 99}


def test_simhash_arrow_matches_jvm(spark):
    from map_reduce_implementation_spark.operators.dedup import simhash, simhash_arrow
    from map_reduce_implementation_spark.sources import table

    d = table(spark, SF001, "documents")
    a = {r.doc_id: r.simhash for r in simhash(d).collect()}
    b = {r.doc_id: r.simhash for r in simhash_arrow(d).collect()}
    assert a == b and len(a) > 0


def test_similarity_strategy_chooser(spark):
    from map_reduce_implementation_spark.operators.similarity import (
        cosine_topk,
        estimated_rows,
        similarity_topk,
    )
    from map_reduce_implementation_spark.sources import table

    emb = table(spark, SF001, "embeddings")
    q = [float(x) for x in emb.limit(1).collect()[0]["embedding"]]
    assert estimated_rows(emb) > 0
    # under budget → exact: identical to brute force
    auto = [tuple(r) for r in similarity_topk(emb, q, 5).collect()]
    exact = [tuple(r) for r in cosine_topk(emb, q, 5).collect()]
    assert auto == exact
    # over (zero) budget → IVF probe path: top-1 (the query itself) kept
    ivf = [tuple(r) for r in similarity_topk(emb, q, 5, exact_row_budget=0).collect()]
    assert ivf[0][0] == exact[0][0] and len(ivf) <= 5


def test_jaccard_max_df_cap_is_contained(spark):
    """max_df stop-shingle cap: capped pairs must be a subset of the
    uncapped pairs with never-higher jaccard (intersection only loses
    ubiquitous shingles; denominators stay uncapped)."""
    from map_reduce_implementation_spark.operators.dedup import jaccard_pairs
    from map_reduce_implementation_spark.suite.dedup import _shingles

    sh = _shingles(spark, SF001, 5)
    full = {(r.d1, r.d2): r.jaccard for r in jaccard_pairs(sh, 0.5).collect()}
    capped = {
        (r.d1, r.d2): r.jaccard
        for r in jaccard_pairs(sh, 0.5, max_df=20).collect()
    }
    assert full, "fixture must produce near-dup pairs"
    assert set(capped) <= set(full)
    assert all(capped[p] <= full[p] + 1e-12 for p in capped)


def test_semantic_dedup_keep_rule_invariants(spark):
    """SemDeDup greedy-by-id keep rule: (1) every dropped vector has a
    lower-id near-dup in its cell; (2) kept vectors are pairwise
    non-near-dup within a cell (the kept set is the per-cell minimal
    elements); (3) deterministic across runs."""
    from map_reduce_implementation_spark.operators.dedup import semantic_dedup
    from map_reduce_implementation_spark.operators.similarity import cosine_pairs

    emb = table(spark, SF001, "embeddings")
    out = semantic_dedup(emb, k=4, threshold=0.2)
    rows = out.collect()
    assert {r.vec_id for r in rows} == {r.vec_id for r in emb.select("vec_id").collect()}

    assigned = out.select("vec_id", "cell")
    with_cell = emb.join(assigned, "vec_id")
    pairs = {
        (r.id1, r.id2)
        for r in cosine_pairs(with_cell, threshold=0.2, block_col="cell").collect()
    }
    kept = {r.vec_id for r in rows if r.is_kept}
    dropped = {r.vec_id for r in rows if not r.is_kept}
    assert dropped, "threshold 0.2 must produce near-dups at sf0.01"
    for d in dropped:
        assert any(p2 == d for (p1, p2) in pairs), f"dropped {d} has no lower-id dup"
    for p1, p2 in pairs:
        assert not (p1 in kept and p2 in kept), f"kept pair {p1},{p2} are near-dups"

    out2 = {(r.vec_id, r.cell, r.is_kept) for r in semantic_dedup(emb, k=4, threshold=0.2).collect()}
    assert out2 == {(r.vec_id, r.cell, r.is_kept) for r in rows}


def test_short_docs_yield_zero_shingles_not_errors(spark, tmp_path):
    """Docs with fewer tokens than the shingle/window width must produce
    ZERO shingles/windows, not crash: Spark's sequence(1, 0) is a
    DESCENDING [1, 0], so the unguarded shape evaluated slice(hts, 0, n)
    and threw INVALID_PARAMETER_VALUE.START on any short doc."""
    import pandas as pd

    from map_reduce_implementation_spark.suite.curation2 import (
        q_dedup_repeated_substrings,
        q_text_novelty_score,
    )
    from map_reduce_implementation_spark.suite.dedup import _shingles

    sf = str(tmp_path)
    pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "",  # zero tokens
                "tiny doc",  # 2 tokens — under both n=5 and n=10
                "exactly five tokens right here",  # 5 tokens
                "this document has more than ten tokens so every window "
                "shape can build at least one hash from it",
            ],
            "lang": ["en"] * 4,
            "source": ["t"] * 4,
            "n_chars": [0, 8, 30, 100],
        }
    ).to_parquet(f"{sf}/documents.parquet")

    sh = _shingles(spark, sf, 5)
    per_doc = {
        r.doc_id: r.c
        for r in sh.groupBy("doc_id").agg(F.count("shingle").alias("c")).collect()
    }
    assert 1 not in per_doc and 2 not in per_doc
    assert per_doc.get(3) == 1  # exactly-n doc: one shingle
    assert per_doc.get(4, 0) > 1

    rep = {r.doc_id: r.n_windows for r in q_dedup_repeated_substrings(spark, sf).collect()}
    assert 1 not in rep and 2 not in rep and 3 not in rep  # all under 10 tokens
    assert rep.get(4, 0) >= 1

    nov = q_text_novelty_score(spark, sf).collect()
    assert {r.doc_id for r in nov} == {3, 4}


def test_semantic_graded_matches_fold_path(spark):
    """dedup_semantic_graded runs the production numpy-gemm kernel; the
    DuckDB oracle computes sequential-fold arithmetic. This test is the
    bridge: recompute the whole query with JVM sequential folds
    (ivf_assign + cosine_pairs — the same op order as the oracle) and
    assert DECISION-identical output. Valid because decisions are
    margin-stable: min |sim - threshold| is ~1e-4 at both SFs, eleven
    orders above summation-order error."""
    from map_reduce_implementation_spark.operators.similarity import (
        cosine_pairs,
        ivf_assign,
    )
    from map_reduce_implementation_spark.suite.dedup import (
        SEM_CELLS,
        SEM_THRESHOLD,
        q_dedup_semantic_graded,
    )

    e = table(spark, SF001, "embeddings")
    cents = [
        [float(x) for x in r["embedding"]]
        for r in e.filter(F.col("vec_id") < SEM_CELLS)
        .orderBy("vec_id")
        .select("embedding")
        .collect()
    ]
    assigned = ivf_assign(e, cents).select("vec_id", "embedding", "cell")
    pairs = cosine_pairs(assigned, threshold=SEM_THRESHOLD, block_col="cell")
    dropped = {r.id2 for r in pairs.collect()}
    fold = {
        r.vec_id: (r.cell, r.vec_id not in dropped)
        for r in assigned.select("vec_id", "cell").collect()
    }
    graded = {
        r.vec_id: (r.cell, r.is_kept)
        for r in q_dedup_semantic_graded(spark, SF001).collect()
    }
    assert fold == graded and any(not kept for _, kept in graded.values())


def test_cosine_pairs_gemm_matches_exact_scan_adversarially(spark):
    """The gemm-candidate fast path must be BIT-IDENTICAL to the pure-JVM
    all-pairs scan on inputs engineered at its weak points: (a) sims
    sitting exactly ON and epsilon-around the threshold (the guard band
    must not change the kept set), (b) a zero-norm vector — under ANSI
    mode (Spark 4 default) the exact scan RAISES on the 0/0 divide, and
    the kernel forwards NaN candidates (``~(S < cut)``) so the verify
    pass raises the SAME error instead of silently dropping the pair,
    (c) a single-row block and (d) a block bigger than one gemm chunk
    exercised via a tiny chunk monkeypatch."""
    import math

    import pytest as _pytest
    from pyspark.errors.exceptions.captured import ArithmeticException

    from map_reduce_implementation_spark.operators import similarity as sim_mod
    from map_reduce_implementation_spark.operators.similarity import cosine_pairs

    thr = 0.5
    # block 0: unit-x, exactly-at-threshold (cos=0.5), just-below and
    # just-above; block 1: a singleton (no pairs)
    a = math.radians(60.0)
    rows = [
        (1, [1.0, 0.0], 0),
        (2, [math.cos(a), math.sin(a)], 0),                    # cos ~= 0.5
        (3, [math.cos(a + 1e-4), math.sin(a + 1e-4)], 0),      # just below
        (4, [math.cos(a - 1e-4), math.sin(a - 1e-4)], 0),      # just above
        (6, [0.0, 1.0], 1),                                    # singleton block
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    fast = sorted(map(tuple, cosine_pairs(df, thr, block_col="label").collect()))
    slow = sorted(
        map(
            tuple,
            cosine_pairs(df, thr, block_col="label", exact_scan=True).collect(),
        )
    )
    assert fast == slow
    assert {(p, q) for p, q, _ in fast} >= {(1, 4)}  # just-above kept
    assert all((p, q) != (1, 3) for p, q, _ in fast)  # just-below dropped

    # chunking: force multiple gemm chunks over the 4-row block
    old = sim_mod._GEMM_CHUNK
    sim_mod._GEMM_CHUNK = 2
    try:
        fast2 = sorted(
            map(tuple, cosine_pairs(df, thr, block_col="label").collect())
        )
    finally:
        sim_mod._GEMM_CHUNK = old
    assert fast2 == slow

    # zero-norm vector: both paths must surface the ANSI 0/0 error —
    # the fast path must NOT silently succeed where the scan raises
    zdf = spark.createDataFrame(
        rows + [(5, [0.0, 0.0], 0)],
        "vec_id long, embedding array<float>, label int",
    )
    with _pytest.raises(ArithmeticException):
        cosine_pairs(zdf, thr, block_col="label", exact_scan=True).collect()
    with _pytest.raises(ArithmeticException):
        cosine_pairs(zdf, thr, block_col="label").collect()


def test_cosine_pairs_gemm_dirty_input_parity(spark):
    """Review-driven regression: the gemm path must match the exact scan
    on the dirty inputs a dedup operator actually sees — duplicate ids
    (no self-pairs; per-row multiplicity preserved through the verify
    join), NULL vectors / block keys / ids (all silently unpaired, as
    the exact path's non-null-safe predicates and NULL-sim filter do),
    ragged vector lengths (cross-length sims are NULL in zip_with —
    never a pair — so gemm runs per length-group), and a non-long id
    column (candidate schema reuses the input id type)."""
    from map_reduce_implementation_spark.operators.similarity import cosine_pairs

    rows = [
        (7, [1.0, 0.0], 0),          # duplicate id, near-identical vecs
        (7, [0.999, 0.01], 0),
        (9, [1.0, 0.001], 0),
        (11, None, 0),               # NULL vector
        (12, [1.0, 0.0], None),      # NULL block key
        (13, [1.0, 0.0], None),      # NULL block key (would pair with 12)
        (None, [1.0, 0.0], 0),       # NULL id
        (14, [1.0, 0.0, 0.0], 0),    # ragged: length 3
        (15, [1.0, 0.001, 0.0], 0),  # length-3 partner
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    fast = sorted(map(tuple, cosine_pairs(df, 0.9, block_col="label").collect()))
    slow = sorted(
        map(
            tuple,
            cosine_pairs(df, 0.9, block_col="label", exact_scan=True).collect(),
        )
    )
    assert fast == slow
    # duplicate id 7 pairs with 9 TWICE (once per duplicate row, each
    # with its own sim), never with itself; ragged pair present;
    # NULL-block / NULL-id / NULL-vec rows pair with nothing
    assert [(p, q) for p, q, _ in fast] == [(7, 9), (7, 9), (14, 15)]

    rows2 = [("a", [1.0, 0.0], 0), ("b", [0.999, 0.01], 0), ("c", [0.0, 1.0], 0)]
    df2 = spark.createDataFrame(
        rows2, "vec_id string, embedding array<float>, label int"
    )
    f2 = sorted(map(tuple, cosine_pairs(df2, 0.9, block_col="label").collect()))
    s2 = sorted(
        map(
            tuple,
            cosine_pairs(df2, 0.9, block_col="label", exact_scan=True).collect(),
        )
    )
    assert f2 == s2 and [(p, q) for p, q, _ in f2] == [("a", "b")]


def test_cosine_pairs_threshold_on_unrounded_fold(spark):
    """Review-driven regression: the threshold compares the UNROUNDED
    fold (the expression every oracle's WHERE uses), with ROUND(·, 9)
    display-only. A pair whose exact fold is 0.2499999996 — below 0.25
    but rounding to it at 9 dp — must be DROPPED by both paths; a
    rounded-value filter would keep it and hash-mismatch the oracle."""
    import math

    from map_reduce_implementation_spark.operators.similarity import cosine_pairs

    x = 0.2499999996
    rows = [(1, [1.0, 0.0], 0), (2, [x, math.sqrt(1 - x * x)], 0)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    for kw in ({}, {"exact_scan": True}):
        assert cosine_pairs(df, 0.25, block_col="label", **kw).count() == 0
    # sanity: a fold exactly AT the cut is kept by both paths
    y = [1.0, 0.0]
    df2 = spark.createDataFrame(
        [(1, y, 0), (2, y, 0)], "vec_id long, embedding array<double>, label int"
    )
    for kw in ({}, {"exact_scan": True}):
        got = cosine_pairs(df2, 1.0, block_col="label", **kw).collect()
        assert [(r.id1, r.id2, r.sim) for r in got] == [(1, 2, 1.0)]


def test_cosine_pairs_emit_block_passthrough(spark):
    """Round-12 ``emit_block`` contract: with it on, each pair carries
    its blocking key as a column — identical (id1, id2, sim) set as the
    default output, same value on both the gemm and exact-scan paths,
    correct block per pair, and the empty-block early return (singleton
    block) must still produce the extra column. Default-off output is
    unchanged (the pre-round three-column schema)."""
    import math

    from map_reduce_implementation_spark.operators.similarity import cosine_pairs

    a = math.radians(30.0)
    rows = [
        (1, [1.0, 0.0], 0),
        (2, [math.cos(a), math.sin(a)], 0),   # pairs with 1 in block 0
        (3, [1.0, 0.0], 2),
        (4, [1.0, 0.0], 2),                    # identical pair in block 2
        (9, [0.0, 1.0], 7),                    # singleton block: no pairs
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    base = cosine_pairs(df, 0.5, block_col="label")
    assert base.columns == ["id1", "id2", "sim"]  # default unchanged
    tagged = cosine_pairs(df, 0.5, block_col="label", emit_block=True)
    assert tagged.columns == ["id1", "id2", "label", "sim"]
    got = sorted(map(tuple, tagged.collect()))
    assert [(i, j, s) for i, j, _l, s in got] == sorted(
        map(tuple, base.collect())
    )
    assert [(i, j, l) for i, j, l, _s in got] == [(1, 2, 0), (3, 4, 2)]
    exact = sorted(
        map(
            tuple,
            cosine_pairs(
                df, 0.5, block_col="label", emit_block=True, exact_scan=True
            ).collect(),
        )
    )
    assert exact == got


def test_minhash_arrow_bands_match_jvm_hash(spark):
    """Round-13 optimization tripwire: the Arrow signature kernel's
    in-kernel band buckets (numpy murmur3 port, seed 42) must be
    bit-equal to the JVM expression they replaced —
    ``F.hash(F.slice("sig", b*rows+1, rows))`` — and the signatures
    themselves bit-equal to the pure-JVM 128-aggregate formulation, so
    dedup_minhash_lsh's candidate set is unchanged by construction."""
    from map_reduce_implementation_spark.operators.dedup import (
        minhash_signatures,
        minhash_signatures_arrow,
    )
    from map_reduce_implementation_spark.suite.dedup import _shingles

    sh = _shingles(spark, SF001, 5)
    arrow = {
        r.doc_id: (list(r.sig), list(r.bands))
        for r in minhash_signatures_arrow(sh, 128, bands=32).collect()
    }
    jvm_sig = {
        r.doc_id: list(r.sig) for r in minhash_signatures(sh, 128).collect()
    }
    assert {d: s for d, (s, _) in arrow.items()} == jvm_sig
    # JVM band hashes over the ARROW sig frame (same slices, same seed)
    sig_df = minhash_signatures_arrow(sh, 128)
    jvm_bands = {
        r.doc_id: list(r.b)
        for r in sig_df.select(
            "doc_id",
            F.array(
                *[F.hash(F.slice("sig", b * 4 + 1, 4)) for b in range(32)]
            ).alias("b"),
        ).collect()
    }
    assert {d: b for d, (_, b) in arrow.items()} == jvm_bands
