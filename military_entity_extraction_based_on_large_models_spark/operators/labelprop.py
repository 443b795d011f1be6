"""Deterministic synchronous label propagation — community detection.

Completes the graph-analytics family (connected components, k-core,
triangles, degrees, PageRank): LPA finds the DENSE clusters inside a
connected graph, which CC by construction cannot (one giant component is
the normal shape of a co-occurrence graph; its communities are the useful
structure).  Raghavan et al. 2007's algorithm, made deterministic:

* SYNCHRONOUS updates with a FIXED iteration count — classic async LPA
  is order-dependent; synchronous rounds depend only on the previous
  labeling, so the result is a pure function of (edges, n_iters).  The
  known cost is that bipartite-ish structures can oscillate instead of
  converging; with fixed iterations the output is still deterministic
  and the oracle replays it exactly (the pagerank.py fixed-iteration
  ruling).
* Tie-break: the new label is the neighbor label with the highest count,
  ties to the LEXICOGRAPHICALLY SMALLEST label — realized as one
  algebraic ``min(struct(-count, label))``, no randomness, no window.
* All counting is BIGINT; no floats anywhere, so the labeling is
  bit-identical at any parallelism and in any engine.

Scale shape: per iteration, one edge×label equi join keyed on ``dst``
(the label frame is (node, lbl) — never the edge list) and two
partial+final hash aggregates ((node, lbl) counts, then the per-node
argmin-struct).  Lineage cut with a lazy localCheckpoint every
``checkpoint_every`` iterations (the canonicalize.py loop idiom).

Feed SYMMETRIZED edges (both directions), which also defines the node
set as distinct sources — an isolated node never appears and a node
always has ≥ 1 neighbor vote.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def label_propagation(
    edges: DataFrame,
    n_iters: int = 5,
    checkpoint_every: int = 4,
) -> DataFrame:
    """Fixed-iteration synchronous LPA over directed ``edges`` (src, dst)
    → (node, community).  Initial label = the node id itself."""
    labels = edges.select(F.col("src").alias("node")).distinct().withColumn(
        "lbl", F.col("node")
    )
    for it in range(n_iters):
        votes = (
            edges.join(labels, edges.dst == labels.node)
            .select(F.col("src").alias("node"), "lbl")
            .groupBy("node", "lbl")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        labels = (
            votes.groupBy("node")
            .agg(
                F.min(
                    F.struct((-F.col("c")).alias("nc"), F.col("lbl"))
                ).alias("_m")
            )
            .select("node", F.col("_m.lbl").alias("lbl"))
        )
        if checkpoint_every and (it + 1) % checkpoint_every == 0 and it + 1 < n_iters:
            labels = labels.localCheckpoint(eager=False)
    return labels.select("node", F.col("lbl").alias("community"))


def label_propagation_sql(edges_sql: str, n_iters: int = 5) -> str:
    """DuckDB twin: the identical synchronous rounds unrolled as chained
    CTEs (the pagerank_sql idiom).  ``edges_sql`` must select (src, dst)."""
    parts = [
        f"WITH lp_edges AS ({edges_sql})",
        """lp_l0 AS (
          SELECT DISTINCT src AS node, src AS lbl FROM lp_edges
        )""",
    ]
    for it in range(n_iters):
        parts.append(f"""lp_l{it + 1} AS (
          SELECT node, m['lbl'] AS lbl FROM (
            SELECT node,
                   min(struct_pack(nc := -c, lbl := lbl)) AS m
            FROM (
              SELECT e.src AS node, l.lbl, CAST(count(*) AS BIGINT) AS c
              FROM lp_edges e JOIN lp_l{it} l ON l.node = e.dst
              GROUP BY e.src, l.lbl
            ) GROUP BY node
          )
        )""")
    final = f"""
        SELECT node, lbl AS community FROM lp_l{n_iters}
    """
    return ",\n".join(parts) + final
