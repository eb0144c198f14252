"""Property tests of the PARITY JOBS through Spark itself (FIXTURES.md §4):
random corpora on disk → counter equals a pure-Python count and is
split-invariant; finder equals the regex oracle. Few examples (Spark
round-trips are slow); the pure-Python property tests in
test_mapreduce_core.py carry the wide random coverage."""

from __future__ import annotations

import random
import re
import string

import pytest

from map_reduce_implementation_spark.jobs import letter_counter, word_finder

ALPHABET = string.ascii_letters + string.digits + " _'.,`-()"


def _random_corpus(rng: random.Random, n_lines: int) -> list[str]:
    return [
        "".join(rng.choice(ALPHABET) for _ in range(rng.randint(0, 70)))
        for _ in range(n_lines)
    ]


@pytest.mark.parametrize("seed", [1, 7, 42])
def test_counter_matches_python_and_split_invariant(spark, tmp_path, seed):
    rng = random.Random(seed)
    lines = _random_corpus(rng, 200)
    p = tmp_path / f"corpus_{seed}.txt"
    p.write_text("\n".join(lines) + "\n")
    want = {chr(65 + i): 0 for i in range(26)}
    for ch in "".join(lines):
        if ch.isascii() and ch.isalpha():
            want[ch.upper()] += 1
    for splits in (None, 3):
        got = {
            r.letter: r.cnt
            for r in letter_counter(spark, str(p), min_partitions=splits).collect()
        }
        assert got == want, f"seed={seed} splits={splits}"


@pytest.mark.parametrize("seed", [3, 11])
def test_finder_matches_regex_oracle(spark, tmp_path, seed):
    rng = random.Random(seed)
    lines = _random_corpus(rng, 300)
    p = tmp_path / f"fcorpus_{seed}.txt"
    p.write_text("\n".join(lines) + "\n")
    for word in ("a", "Q2", "the"):
        pat = re.compile(f"(^|[^0-9A-Za-z]){re.escape(word)}([^0-9A-Za-z]|$)")
        want = sorted(ln for ln in lines if pat.search(ln))
        got = sorted(r.value for r in word_finder(spark, str(p), word).collect())
        assert got == want, f"seed={seed} word={word}"


def test_approx_percentile_accuracy(spark):
    """GK sketch p50 must land within 5% relative of the exact p50."""
    from pyspark.sql import functions as F

    from map_reduce_implementation_spark.sources import table

    from .conftest import SF001

    li = table(spark, SF001, "lineitem")
    rows = (
        li.groupBy("l_returnflag")
        .agg(
            F.expr("approx_percentile(l_extendedprice, 0.5, 1000)").alias("approx"),
            F.expr("percentile(l_extendedprice, 0.5)").alias("exact"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        assert abs(r.approx - r.exact) / r.exact < 0.05
