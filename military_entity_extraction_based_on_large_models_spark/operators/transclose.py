"""Min-hop transitive closure — unbounded reachability to the fixpoint.

The reference materializes a KG (main.py triple writer) but answers only
single-edge questions over it; the audit query a dependency / containment
graph actually needs is "EVERYTHING x transitively reaches, and how far" —
licence contamination through a dependency DAG, location containment
rollups, ontology subsumption.  ``graph_k_hop`` (driver row) answers the
BOUNDED form with k-1 chained joins; this operator runs to the true
fixpoint with **path doubling**: after round k the result holds every pair
whose shortest path is ≤ 2^k, so a diameter-d graph converges in
⌈log2 d⌉ + 1 rounds — O(log d) shuffles where frontier expansion pays
O(d).  At 100 TB that is the difference between 6 and 40 shuffle rounds on
a deep dependency chain.

Per round: one self-equi-join on the frontier key (AQE-planned, never a
cartesian) + one (src, dst) min-hops hash aggregate, the pair
localCheckpointed with plan-stat truncation (the canonicalize.py loop
discipline).  Convergence = unchanged (count, xor-of-xxhash64) multiset
digest — one tiny aggregate per round, no change-detection join; the
min-hops update is monotone (pairs only accumulate, hops only decrease)
so an unchanged digest IS the fixpoint.

Exactness of the doubling recurrence: if R_k holds exact min-hops for all
pairs at distance ≤ 2^k, any shortest path of length L ≤ 2^{k+1} splits
into two halves of length ≤ 2^k, both exact in R_k, so
min(R_k ∪ R_k∘R_k) is exact at distance ≤ 2^{k+1}.  Cycles are safe:
the pair set is finite and self-pairs are dropped, so the fixpoint
exists and the digest detects it.

Scale note: a closure is inherently O(reachable pairs) output — right for
DAG-ish dependency / containment / ontology graphs (output ≈ V·depth),
wrong for social graphs (output → V²).  Callers on dense graphs want
``graph_k_hop``'s bounded form or connected_components instead; the
``max_rounds`` guard raises rather than silently truncating.

SQL twin (``transitive_closure_sql``): recursive CTE frontier expansion
with a hop bound + min-hops aggregate.  Unlike the Spark form (whose
``max_rounds`` budget is logarithmic — 16 rounds cover diameter 65536),
the CTE walks one hop per recursion step, so its ``max_hops`` bound must
be ≥ the graph diameter itself (default 32 = exact for diameter ≤ 32).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.parallelism import truncate_plan_stats


def transitive_closure(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 16,
) -> DataFrame:
    """Edge list → (src, dst, hops): every reachable ordered pair with its
    shortest-path hop count.  Deterministic at any parallelism (the result
    is a set; min-hops is order-independent).

    ``max_rounds`` bounds the doubling loop: round k covers diameter 2^k,
    so the default 16 is exact for any graph of diameter ≤ 65536.  If the
    digest is still moving when the budget runs out the result would be a
    silent non-fixpoint — raise instead (the k_core exhaustion stance).
    """
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    r = truncate_plan_stats(
        e.withColumn("hops", F.lit(1).cast("long")).localCheckpoint(eager=False)
    )
    prev = None
    for _ in range(max_rounds):
        mid = (
            r.alias("a")
            .join(r.alias("b"), F.col("a.dst") == F.col("b.src"))
            .select(
                F.col("a.src").alias("src"),
                F.col("b.dst").alias("dst"),
                (F.col("a.hops") + F.col("b.hops")).alias("hops"),
            )
            .where(F.col("src") != F.col("dst"))
        )
        r = truncate_plan_stats(
            r.unionByName(mid)
            .groupBy("src", "dst")
            .agg(F.min("hops").alias("hops"))
            .localCheckpoint(eager=False)
        )
        digest = tuple(
            r.agg(
                F.count(F.lit(1)).alias("n"),
                F.coalesce(
                    F.bit_xor(F.xxhash64("src", "dst", "hops")), F.lit(0)
                ).alias("h"),
            ).first()
        )
        if digest == prev:
            return r
        prev = digest
    raise RuntimeError(
        f"transitive_closure: digest still changing after {max_rounds} "
        f"doubling rounds (diameter > 2^{max_rounds}?) — result would be a "
        "non-fixpoint; raise max_rounds"
    )


def transitive_closure_sql(edges_sql: str, max_hops: int = 32) -> str:
    """DuckDB twin: recursive-CTE min-hop reachability over ``edges_sql``
    (a query yielding columns src, dst).  Exact iff ``max_hops`` ≥ the
    graph diameter (UNION-dedup plus the bound terminates cyclic graphs)."""
    return f"""
        WITH RECURSIVE tc_edges AS (
            SELECT DISTINCT src, dst FROM ({edges_sql}) tc_in
            WHERE src IS NOT NULL AND dst IS NOT NULL AND src <> dst
        ), reach(src, dst, hops) AS (
            SELECT src, dst, 1 FROM tc_edges
            UNION
            SELECT r.src, e.dst, r.hops + 1
            FROM reach r JOIN tc_edges e ON r.dst = e.src
            WHERE r.src <> e.dst AND r.hops < {max_hops}
        )
        SELECT src, dst, CAST(min(hops) AS BIGINT) AS hops
        FROM reach GROUP BY src, dst
    """
