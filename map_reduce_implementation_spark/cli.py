"""CLI driver — mirrors the reference's test driver (main.c:54-108).

Usage (reference: ``run-mapreduce "counter"|"finder" file split_num [word]``):

    python -m map_reduce_implementation_spark counter INPUT [--splits N] [-o OUT]
    python -m map_reduce_implementation_spark finder INPUT WORD [--splits N] [-o OUT]

Validation parity: regular-file check (main.c:37-52), positive integer
splits (main.c:11-35), finder requires a non-empty word (main.c:84-88).
Result report parity: output path + task counts + wall time
(main.c:138-146; PIDs are meaningless under Spark → partition counts).
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="map_reduce_implementation_spark",
        description="PySpark-native engine with the reference's two jobs",
    )
    sub = p.add_subparsers(dest="job", required=True)
    for name in ("counter", "finder"):
        sp = sub.add_parser(name)
        sp.add_argument("input", help="input text file")
        if name == "finder":
            sp.add_argument("word", help="word to find (whole-word, case-sensitive)")
        sp.add_argument("--splits", type=int, default=None, help="scan parallelism hint")
        sp.add_argument("-o", "--output", default=None, help="write result as one text file")
    return p


def main(argv: list[str] | None = None) -> int:
    args = _build_parser().parse_args(argv)
    if not os.path.isfile(args.input):
        print(f"error: {args.input} is not a regular file", file=sys.stderr)
        return 2
    if args.splits is not None and args.splits <= 0:
        print("error: --splits must be a positive integer", file=sys.stderr)
        return 2
    if args.job == "finder" and not args.word:
        print("error: finder requires a non-empty word", file=sys.stderr)
        return 2

    from .jobs import letter_counter, word_finder
    from .session import get_spark
    from .sources.tables import write_single_text_file

    spark = get_spark(app_name=f"cli-{args.job}")
    t0 = time.monotonic_ns()
    if args.job == "counter":
        df = letter_counter(spark, args.input, min_partitions=args.splits)
        out = df.selectExpr("concat(letter, ' ', cnt) AS value")
    else:
        df = word_finder(spark, args.input, args.word)
        out = df
    if args.output:
        write_single_text_file(out, args.output)
        n = None
    else:
        rows = out.collect()
        n = len(rows)
        for r in rows:
            print(r.value)
    t1 = time.monotonic_ns()
    n_parts = df.rdd.getNumPartitions()
    print(
        f"# job={args.job} partitions={n_parts} "
        f"time_us={(t1 - t0) // 1000}"
        + (f" output={args.output}" if args.output else f" rows={n}"),
        file=sys.stderr,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
