"""Integer-exact node similarity / link prediction over a graph.

Completes the graph-analytics family's *pairwise* axis: PageRank ranks
nodes, LPA groups them, connected components partitions them — this
scores PAIRS.  For a knowledge graph that answers "which entities are
most alike / which links are missing": common-neighbor counting plus the
two classic neighborhood scores, computed so the score vector is
bit-identical at any parallelism and in any engine (the pagerank.py
determinism stance):

* ``common_neighbors`` — |N(a) ∩ N(b)|, plain BIGINT count;
* ``ra_micro`` — the resource-allocation index (Zhou/Lü/Zhang, EPJ B
  2009) Σ_{z ∈ N(a)∩N(b)} 1/deg(z), in fixed-point ``base`` units via
  integer division ``base DIV deg(z)`` — RA is the member of the
  Adamic-Adar family whose per-neighbor weight is EXACTLY representable
  in integer arithmetic (AA's 1/log deg needs libm, whose last ulp is
  engine-dependent);
* ``jaccard_micro`` — ``(base·|∩|) DIV (deg_a + deg_b − |∩|)``;
* ``is_edge`` — whether (a, b) is already an edge: ``false`` rows ARE
  the link-prediction candidates; ``true`` rows rank existing edges by
  neighborhood support (tie-strength).

Feed SYMMETRIZED DISTINCT edges (src, dst) — both directions, no
duplicates — the same contract as pagerank/labelprop; then deg(n) =
|N(n)| exactly and every unordered pair is scored once (a < b).

Scale shape (100 TB): the wedge self-join keyed on the CENTER z is the
whole cost — Σ_z deg(z)² pair rows — followed by one (a, b) hash
aggregate (map-side partial), two node-keyed deg joins and one edge-mark
left join (all on the aggregated pair frame, never the wedge).  Hubs
dominate Σ deg²: a 1e6-degree celebrity node alone yields 1e12 wedges,
so at scale pass ``max_degree`` — wedge centers with deg(z) >
max_degree are dropped BEFORE the self-join (the standard hub
suppression for neighborhood link prediction; scores then count only
common neighbors of bounded degree, which for RA also removes exactly
the terms with the smallest weight, ≤ base/max_degree each).  The cap
is a documented SEMANTIC (same stance as the LSH mega-bucket cap), not
a sampling trick: the oracle applies the identical cap, and results
stay deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BASE = 10**6


def node_similarity(
    edges: DataFrame,
    base: int = BASE,
    max_degree: int | None = None,
) -> DataFrame:
    """Score every unordered pair with ≥ 1 (retained) common neighbor →
    (a, b, common_neighbors, ra_micro, jaccard_micro, is_edge), a < b.

    ``jaccard_micro`` uses the FULL degrees even under ``max_degree``
    (the cap prunes wedge centers, not the endpoint neighborhoods), so a
    capped run under-counts intersections through hubs only — documented
    conservative semantics, identical in the SQL twin.
    """
    deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    centers = deg if max_degree is None else deg.where(F.col("deg") <= max_degree)
    mid = edges.join(
        centers.select(F.col("node").alias("src"), "deg"), "src"
    ).select(F.col("src").alias("z"), F.col("dst").alias("n"), "deg")
    l, r = mid.alias("l"), mid.alias("r")
    pairs = (
        l.join(r, (F.col("l.z") == F.col("r.z")) & (F.col("l.n") < F.col("r.n")))
        .select(
            F.col("l.n").alias("a"),
            F.col("r.n").alias("b"),
            F.expr(f"{base} DIV l.deg").alias("w"),
        )
        .groupBy("a", "b")
        .agg(
            F.count(F.lit(1)).alias("common_neighbors"),
            F.sum("w").alias("ra_micro"),
        )
    )
    scored = (
        pairs.join(deg.select(F.col("node").alias("a"), F.col("deg").alias("da")), "a")
        .join(deg.select(F.col("node").alias("b"), F.col("deg").alias("db")), "b")
        .select(
            "a",
            "b",
            "common_neighbors",
            "ra_micro",
            F.expr(
                f"({base} * common_neighbors) DIV (da + db - common_neighbors)"
            ).alias("jaccard_micro"),
        )
    )
    mark = edges.select(
        F.col("src").alias("a"), F.col("dst").alias("b"), F.lit(True).alias("e")
    )
    return scored.join(mark, ["a", "b"], "left").select(
        "a",
        "b",
        "common_neighbors",
        "ra_micro",
        "jaccard_micro",
        F.coalesce(F.col("e"), F.lit(False)).alias("is_edge"),
    )


def node_similarity_sql(
    edges_sql: str,
    base: int = BASE,
    max_degree: int | None = None,
) -> str:
    """DuckDB twin of :func:`node_similarity`: identical integer
    arithmetic (``//`` ≡ Spark ``DIV`` on nonnegative BIGINTs), identical
    center cap."""
    cap = "" if max_degree is None else f"WHERE deg <= {int(max_degree)}"
    return f"""
        WITH ns_edges AS ({edges_sql}),
        ns_deg AS (
          SELECT src AS node, CAST(count(*) AS BIGINT) AS deg
          FROM ns_edges GROUP BY src
        ),
        ns_mid AS (
          SELECT e.src AS z, e.dst AS n, d.deg
          FROM ns_edges e
          JOIN (SELECT * FROM ns_deg {cap}) d ON d.node = e.src
        ),
        ns_pairs AS (
          SELECT l.n AS a, r.n AS b,
                 CAST(count(*) AS BIGINT) AS common_neighbors,
                 CAST(sum({base} // l.deg) AS BIGINT) AS ra_micro
          FROM ns_mid l JOIN ns_mid r ON l.z = r.z AND l.n < r.n
          GROUP BY l.n, r.n
        )
        SELECT p.a, p.b, p.common_neighbors, p.ra_micro,
               CAST(({base} * p.common_neighbors)
                    // (da.deg + db.deg - p.common_neighbors) AS BIGINT)
                 AS jaccard_micro,
               coalesce(m.e, FALSE) AS is_edge
        FROM ns_pairs p
        JOIN ns_deg da ON da.node = p.a
        JOIN ns_deg db ON db.node = p.b
        LEFT JOIN (SELECT src AS ma, dst AS mb, TRUE AS e FROM ns_edges) m
          ON m.ma = p.a AND m.mb = p.b
    """
