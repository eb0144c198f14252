"""Generic MapReduce surface — the reference's embeddable API, Spark-native.

The reference's public contract (mapreduce.h:14-32) is:

    MAPREDUCE_SPEC { input_data_filepath, split_num, map_func, reduce_func,
                     usr_data }  →  mapreduce(spec, result)

where ``map_func(DATA_SPLIT*, fd_out)`` consumes one line-aligned split and
writes output lines, and ``reduce_func(fds[], n, fd_out)`` consumes ALL
intermediate outputs at once (gang reduce — grouping is the UDF's job,
mapreduce.c:165). The faithful Spark analogue:

- one split            → one RDD partition (line-aligned, built-in)
- map_func             → ``mapPartitions`` (partition-in, iterator-out)
- intermediate files   → implicit Spark shuffle (never materialized by us)
- single gang reducer  → ``coalesce(1).mapPartitions`` (numPartitions=1)
- usr_data             → closure capture

This module exists for API parity and for genuinely imperative
per-partition logic. Declarative pipelines (jobs/, operators/) are the
recommended path — Catalyst cannot see inside these Python functions, so
nothing here is optimized, and at 100 TB the single-partition reduce is a
deliberate bottleneck exactly like the reference's lone reduce worker
(mapreduce.c:159-171). ``run_mapreduce`` therefore also accepts
``reduce_parallelism > 1`` when the reduce function is key-partitionable.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterable, Iterator
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

MapFunc = Callable[[Iterator[str], object], Iterable[str]]
ReduceFunc = Callable[[Iterator[str], object], Iterable[str]]


@dataclass
class MapReduceSpec:
    """Python analogue of MAPREDUCE_SPEC (mapreduce.h:14-21)."""

    input_data_filepath: str
    split_num: int
    map_func: MapFunc
    reduce_func: ReduceFunc
    usr_data: object = None
    reduce_parallelism: int = 1
    # API parity with the reference's unlinked mapreduce2.c variant
    # (mapreduce2.c:135-196): there, map-worker 0 stays alive after its
    # map and becomes the reducer, blocking on a pipe until the parent
    # signals — an overlap/pipelining experiment whose OUTPUT contract
    # is identical to mapreduce.c. Under Spark the flag changes nothing
    # at runtime because the overlap already happens: reduce tasks
    # fetch finished map outputs while later map tasks still run, and
    # the scheduler launches stages as soon as their parents allow —
    # exactly the concurrency mapreduce2.c hand-builds with fork+pipe.
    # Accepted (and tested result-identical) so a mapreduce2 caller can
    # switch without an API delta. mapreduce2.c's fixed-up child-write
    # wart (result fields written in the child, lost to the parent,
    # patched at :197) is deliberately not reproduced.
    overlap: bool = False


@dataclass
class MapReduceResult:
    """Python analogue of MAPREDUCE_RESULT (mapreduce.h:23-29).

    PIDs are meaningless under Spark; we expose partition counts instead.
    ``processing_time_us`` mirrors the reference's gettimeofday wall clock
    (mapreduce.c:52, 189-191).
    """

    filepath: str | None
    processing_time_us: int
    map_partitions: int
    reduce_partitions: int
    lines: list[str] = field(default_factory=list)


def run_mapreduce(
    spark: SparkSession,
    spec: MapReduceSpec,
    output_path: str | None = None,
) -> MapReduceResult:
    """Execute the two-phase map/reduce lifecycle (mapreduce.c:99-191).

    Unlike the reference, map tasks run in parallel (the reference
    ``waitpid``s inside its fork loop, mapreduce.c:136 — its main
    performance defect, deliberately not reproduced).
    """
    t0 = time.monotonic_ns()
    sc = spark.sparkContext
    usr_data = spec.usr_data
    map_func, reduce_func = spec.map_func, spec.reduce_func

    rdd = sc.textFile(spec.input_data_filepath, minPartitions=spec.split_num)
    mapped = rdd.mapPartitions(lambda it: map_func(it, usr_data))
    n_map = mapped.getNumPartitions()
    reduced = mapped.coalesce(spec.reduce_parallelism).mapPartitions(
        lambda it: reduce_func(it, usr_data)
    )

    if output_path:
        # Single text file parity with mr.rst (mapreduce.c:153-157): one
        # reduce partition → one part file. Not for 100 TB paths.
        reduced.saveAsTextFile(output_path)
        lines: list[str] = []
    else:
        lines = reduced.collect()
    t1 = time.monotonic_ns()
    return MapReduceResult(
        filepath=output_path,
        processing_time_us=(t1 - t0) // 1000,
        map_partitions=n_map,
        reduce_partitions=spec.reduce_parallelism,
        lines=lines,
    )


# ---------------------------------------------------------------------------
# The reference's two built-in jobs re-expressed on the generic surface
# (proving the contract; usr_functions.c:19-109 and :119-238).
# ---------------------------------------------------------------------------


def letter_counter_map(lines: Iterator[str], usr_data: object) -> Iterator[str]:
    """Partial 26-bucket count per split (usr_functions.c:37-54), emitting
    all 26 letters including zeros, A..Z order."""
    counts = [0] * 26
    for line in lines:
        for ch in line:
            if "a" <= ch <= "z":
                counts[ord(ch) - 97] += 1
            elif "A" <= ch <= "Z":
                counts[ord(ch) - 65] += 1
    for i, c in enumerate(counts):
        yield f"{chr(65 + i)} {c}"


def letter_counter_reduce(lines: Iterator[str], usr_data: object) -> Iterator[str]:
    """Sum-merge of partial counts (usr_functions.c:73-108): parse
    ``"%c %d"``, guard A..Z, emit 26 totals in order."""
    totals = [0] * 26
    for line in lines:
        parts = line.split(" ", 1)
        if len(parts) == 2 and len(parts[0]) == 1 and "A" <= parts[0] <= "Z":
            totals[ord(parts[0]) - 65] += int(parts[1])
    for i, c in enumerate(totals):
        yield f"{chr(65 + i)} {c}"


def word_finder_map(lines: Iterator[str], usr_data: object) -> Iterator[str]:
    """Whole-word line filter (usr_functions.c:119-191): emit each line
    containing usr_data as a word under the [^0-9A-Za-z] boundary rule."""
    word = str(usr_data)
    wl = len(word)
    for line in lines:
        start, found = 0, False
        while not found:
            idx = line.find(word, start)
            if idx < 0:
                break
            left_ok = idx == 0 or not line[idx - 1].isalnum() or not line[idx - 1].isascii()
            right = idx + wl
            right_ok = right >= len(line) or not (
                line[right].isalnum() and line[right].isascii()
            )
            if left_ok and right_ok:
                found = True
            start = idx + 1
        if found:
            yield line


def identity_reduce(lines: Iterator[str], usr_data: object) -> Iterator[str]:
    """Concatenating reduce (usr_functions.c:205-238)."""
    yield from lines


def to_dataframe(spark: SparkSession, result: MapReduceResult) -> DataFrame:
    """Lift a collected result into a DataFrame[value: string]."""
    return spark.createDataFrame([(ln,) for ln in result.lines], "value: string")
