#!/usr/bin/env python
"""Round-12 plan-shape audit (guide §1.2/§2.4): for every headline query
(or any names given), count the physical-plan nodes that dominate at
100 TB — parquet scans, Exchanges, Python-boundary nodes — straight from
``explain("formatted")``. No execution: analysis+planning only, so it is
cheap enough to sweep all queries and rank them by redundant work.

A query whose plan shows N scans of the same parquet table is replaying
a subtree N times (guide §2.4 "remove shuffles outright" / §5 lineage
truncation); at sf0.1 that costs milliseconds, at 100 TB it is N-1 extra
fact-table passes.

Usage:
    python tools/scan_audit.py [--all] [query ...]   # default: HEADLINE
Output: one JSON line per query:
    {"query": ..., "scans": {"lineitem": 2, ...}, "n_scans": 4,
     "exchanges": 7, "python_nodes": 1, "subqueries": 0}
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

_TABLE_RE = re.compile(r"file:[^\]\s,]*/(\w+)\.parquet")


def formatted_plan(df) -> str:
    """``explain("formatted")`` output via the documented API (ADVICE
    r12: the previous ``df._sc._jvm.PythonSQLUtils.explainString`` call
    reached through private internals and is version-fragile)."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def audit_plan(plan: str) -> dict:
    # In formatted output the scan operator line carries no path; the
    # details section has one "Location: ... [file:...<table>.parquet]"
    # line per scan node — count those per table.
    scans: dict[str, int] = {}
    for line in plan.splitlines():
        if "Location" not in line:
            continue
        m = _TABLE_RE.search(line)
        if m:
            name = m.group(1)
            scans[name] = scans.get(name, 0) + 1
    n_scan_nodes = len(
        [l for l in plan.splitlines() if re.match(r"^\(\d+\) Scan parquet", l.strip())]
    )
    return {
        "redundant_scans": sum(v - 1 for v in scans.values() if v > 1),
        "scans": scans,
        "n_scans": n_scan_nodes or sum(scans.values()),
        "exchanges": len(re.findall(r"^\s*\(\d+\) Exchange", plan, re.M)),
        "python_nodes": len(
            re.findall(
                r"BatchEvalPython|ArrowEvalPython|MapInPandas|MapInArrow|FlatMapGroupsInPandas",
                plan,
            )
        ),
        "sorts": len(re.findall(r"^\s*\(\d+\) Sort\b", plan, re.M)),
        "joins": len(
            re.findall(r"SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin|BroadcastNestedLoopJoin|CartesianProduct", plan)
        ),
        "subqueries": plan.count("Subquery:"),
    }


def main() -> int:
    from bench import HEADLINE
    from map_reduce_implementation_spark.session import get_spark
    from map_reduce_implementation_spark.suite import all_queries

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    use_all = "--all" in sys.argv
    spark = get_spark(app_name="scan_audit")
    qs = all_queries()
    names = args or (sorted(qs) if use_all else [n for n in HEADLINE if n in qs])

    for name in names:
        q = qs.get(name)
        if q is None:
            print(json.dumps({"query": name, "error": "unknown"}))
            continue
        try:
            df = q.build(spark, SF_DIR)
            plan = formatted_plan(df)
            row = {"query": name}
            row.update(audit_plan(plan))
            print(json.dumps(row))
        except Exception as exc:  # pragma: no cover - sweep robustness
            print(json.dumps({"query": name, "error": str(exc)[:200]}))
        sys.stdout.flush()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
