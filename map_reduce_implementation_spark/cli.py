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
    sq = sub.add_parser("suite", help="run any registry query against a testdata dir")
    sq.add_argument("name", nargs="?", help="query name (omit with --list)")
    sq.add_argument("--sf", default="/root/testdata/sf0.001", help="testdata directory")
    sq.add_argument("--limit", type=int, default=20, help="rows to print (0 = count only)")
    sq.add_argument("--list", action="store_true", help="list all query names")
    sq.add_argument("--explain", action="store_true", help="print the physical plan instead")
    sql = sub.add_parser(
        "sql", help="run ad-hoc Spark SQL with the testdata tables registered as views"
    )
    sql.add_argument("query", help="ANSI SQL text (tables: region nation customer "
                     "supplier part orders lineitem events documents embeddings)")
    sql.add_argument("--sf", default="/root/testdata/sf0.001", help="testdata directory")
    sql.add_argument("--limit", type=int, default=20, help="rows to print (0 = count only)")
    sql.add_argument("--explain", action="store_true", help="print the physical plan instead")
    return p


def _run_sql(args) -> int:
    from .session import get_spark
    from .sources.tables import register_views

    if not os.path.isdir(args.sf):
        print(f"error: {args.sf} is not a directory", file=sys.stderr)
        return 2
    spark = get_spark(app_name="sql")
    register_views(spark, args.sf)
    t0 = time.monotonic_ns()
    df = spark.sql(args.query)
    if args.explain:
        df.explain("formatted")
        return 0
    rows = df.limit(args.limit).collect() if args.limit else []
    n = df.count()
    t1 = time.monotonic_ns()
    for r in rows:
        print(r)
    print(f"# rows={n} sf={args.sf} time_us={(t1 - t0) // 1000}", file=sys.stderr)
    return 0


def _run_suite(args) -> int:
    from .session import get_spark
    from .suite import all_queries

    qs = all_queries()
    if args.list or not args.name:
        for name, q in qs.items():
            print(f"{name}\t{'sql-oracle' if q.oracle else 'rows-only'}")
        return 0
    if args.name not in qs:
        print(f"error: unknown query {args.name!r} (see --list)", file=sys.stderr)
        return 2
    if not os.path.isdir(args.sf):
        print(f"error: {args.sf} is not a directory", file=sys.stderr)
        return 2
    spark = get_spark(app_name=f"suite-{args.name}")
    t0 = time.monotonic_ns()
    df = qs[args.name].build(spark, args.sf)
    if args.explain:
        df.explain("formatted")
        return 0
    rows = df.limit(args.limit).collect() if args.limit else []
    n = df.count()
    t1 = time.monotonic_ns()
    for r in rows:
        print(r)
    print(
        f"# query={args.name} rows={n} sf={args.sf} time_us={(t1 - t0) // 1000}",
        file=sys.stderr,
    )
    return 0


def main(argv: list[str] | None = None) -> int:
    args = _build_parser().parse_args(argv)
    if args.job == "suite":
        return _run_suite(args)
    if args.job == "sql":
        return _run_sql(args)
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
    sc = spark.sparkContext
    sc.setJobGroup("cli-run", f"cli {args.job}")
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

    # RESULT report — parity with the reference's MAPREDUCE_RESULT block
    # (main.c:138-146: result file, per-map-worker pids, reduce pid,
    # processing time). Spark workers are tasks, not forked processes, so
    # the per-worker ids become real per-stage task counts pulled from
    # the status tracker (first stage(s) = map side, post-shuffle stage =
    # reduce side).
    tracker = sc.statusTracker()
    stage_tasks: list[tuple[int, int]] = []
    for jid in sorted(tracker.getJobIdsForGroup("cli-run")):
        info = tracker.getJobInfo(jid)
        if info is None:
            continue
        for sid in sorted(info.stageIds):
            sinfo = tracker.getStageInfo(sid)
            if sinfo is not None and sinfo.numCompletedTasks > 0:
                stage_tasks.append((sid, sinfo.numTasks))
    n_parts = df.rdd.getNumPartitions()
    report = [
        "***** RESULT *****",
        f"Result file: {args.output if args.output else '-'}"
        + ("" if args.output else f" ({n} rows to stdout)"),
        "Stage tasks: "
        + (
            " ".join(f"stage{sid}:{nt}" for sid, nt in stage_tasks)
            if stage_tasks
            else f"partitions:{n_parts}"
        ),
        f"Total tasks: {sum(nt for _, nt in stage_tasks) or n_parts}",
        f"Processing time (us): {(t1 - t0) // 1000}",
        f"# job={args.job} partitions={n_parts} time_us={(t1 - t0) // 1000}"
        + (f" output={args.output}" if args.output else f" rows={n}"),
    ]
    print("\n".join(report), file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
