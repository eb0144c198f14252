"""Iterative graph algorithms on DataFrames — PageRank.

The reference engine has no graph surface; this is a north-star EXT
showing the *iterative* execution pattern on Spark (the other instance
is connected-components in ``operators/dedup.py``): a driver-side loop
over declarative join+agg steps, NOT a driver-side loop over rows.

100 TB design notes
-------------------
- Each iteration is one shuffle join (edges ⋈ ranks on ``src``) plus
  one aggregation shuffle on ``dst``. Edges dominate; ranks are
  node-sized. Both shuffles key on graph ids — uniform unless the graph
  has celebrity nodes, in which case the standard fix is to split
  high-out-degree vertices (same salting trick as ``operators/skew.py``).
- For few iterations (<10) the full lineage stays compilable and
  Catalyst sees through the loop; for long runs, truncate lineage with
  ``localCheckpoint`` every k iterations exactly as the
  connected-components loop does (``operators/dedup.py::dup_clusters``).
- The rank vector never touches the driver; only the node count N does
  (one scalar).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    checkpoint_every: int | None = None,
) -> DataFrame:
    """PageRank over a directed edge list ``DataFrame[src, dst]``.

    Every node is expected to appear as a ``src`` at least once (no
    dangling mass) — callers with undirected graphs get this for free
    by emitting both edge directions. Returns ``DataFrame[node, pr]``
    with ``sum(pr) == 1`` up to float error.
    """
    # Every iteration re-reads edges and deg; without caching, a derived
    # edge list (e.g. a join) would re-execute its whole upstream plan
    # per iteration (observed: 56 scans for 3 iterations on the trade
    # graph). At 100 TB the edge list is materialized once — here via
    # cache() (CacheManager dedupes by logical plan, so repeated suite
    # runs share one entry); on a real cluster, a parquet checkpoint.
    edges = edges.cache()
    deg = edges.groupBy("src").agg(F.count("*").alias("outdeg")).cache()
    n_nodes = deg.count()  # one scalar to the driver; rank vector never collects
    pr = deg.select(F.col("src").alias("node"), F.lit(1.0 / n_nodes).alias("pr"))
    base = (1.0 - damping) / n_nodes
    for i in range(iterations):
        contrib = (
            edges.join(pr, edges["src"] == pr["node"])
            .join(deg, "src")
            .select("dst", (F.col("pr") / F.col("outdeg")).alias("w"))
        )
        pr = contrib.groupBy("dst").agg(
            (F.lit(base) + F.lit(damping) * F.sum("w")).alias("pr")
        ).select(F.col("dst").alias("node"), "pr")
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            pr = pr.localCheckpoint(eager=False)
    return pr
