"""Graph suite — PageRank over the supplier↔customer trade graph.

The graph: one undirected edge per distinct (supplier, customer) pair
that traded (lineitem ⋈ orders), emitted in both directions so every
node has out-degree ≥ 1 (no dangling-mass correction needed). Customer
nodes are offset by 1e6 to keep the id spaces disjoint.

The oracle is the SAME fixed-point iteration unrolled into one CTE per
step (standard SQL cannot aggregate inside a recursive CTE, so the
driver-side loop Spark runs is expressed as generated CTE chain here —
both engines execute the identical arithmetic, only double-summation
order differs, absorbed by ROUND 9).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.graph import pagerank
from ..sources import table
from .base import Query

_ITERS = 3
_CUST_OFFSET = 1_000_000


def _trade_edges(spark: SparkSession, sf: str) -> DataFrame:
    li = table(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")
    orders = table(spark, sf, "orders").select("o_orderkey", "o_custkey")
    pairs = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(
            F.col("l_suppkey").alias("s"),
            (F.col("o_custkey") + _CUST_OFFSET).alias("c"),
        )
        .distinct()
    )
    fwd = pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    rev = pairs.select(F.col("c").alias("src"), F.col("s").alias("dst"))
    return fwd.unionAll(rev)


def q_graph_pagerank(spark: SparkSession, sf: str) -> DataFrame:
    """3-iteration PageRank (d=0.85) on the trade graph. One edge-keyed
    shuffle join + one dst-keyed agg per iteration; the rank vector
    stays distributed (only N reaches the driver). See
    ``operators/graph.py`` for the 100 TB notes (celebrity-node salting,
    localCheckpoint cadence for long runs)."""
    pr = pagerank(_trade_edges(spark, sf), iterations=_ITERS, damping=0.85)
    return pr.select(
        F.col("node").alias("node_id"), F.round("pr", 9).alias("pagerank")
    )


def _pagerank_oracle(iters: int = _ITERS) -> str:
    steps = []
    for k in range(1, iters + 1):
        steps.append(
            f"""pr{k} AS (
  SELECT t.node, (1.0 - 0.85) / n.n_nodes + 0.85 * t.s AS pr
  FROM (
    SELECT e.dst AS node, SUM(p.pr / d.outdeg) AS s
    FROM edges e
    JOIN pr{k - 1} p ON e.src = p.node
    JOIN deg d ON e.src = d.src
    GROUP BY e.dst
  ) t CROSS JOIN n
)"""
        )
    chain = ",\n".join(steps)
    return f"""
WITH pairs AS (
  SELECT DISTINCT l.l_suppkey AS s, o.o_custkey + {_CUST_OFFSET} AS c
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
edges AS (
  SELECT s AS src, c AS dst FROM pairs
  UNION ALL
  SELECT c AS src, s AS dst FROM pairs
),
deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
n AS (SELECT COUNT(*) AS n_nodes FROM deg),
pr0 AS (SELECT src AS node, 1.0 / n.n_nodes AS pr FROM deg CROSS JOIN n),
{chain}
SELECT node AS node_id, ROUND(pr, 9) AS pagerank FROM pr{iters}
"""


QUERIES: dict[str, Query] = {
    "graph_pagerank": Query(q_graph_pagerank, _pagerank_oracle()),
}
