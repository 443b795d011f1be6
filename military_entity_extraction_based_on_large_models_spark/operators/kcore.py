"""Iterative graph cores: k-core peeling and acyclic trimming.

Two bounded driver-side fixpoints in the canonicalize.py loop idiom
(lazy ``localCheckpoint`` per round, ``truncate_plan_stats`` to stop
plan/stats growth, multiset-digest convergence — one tiny agg per round,
no change-detection join):

* ``k_core(edges, k)`` — the standard density screen on the entity
  co-occurrence graph: repeatedly delete nodes of degree < k until every
  remaining node has >= k in-core neighbors (Seidman 1983).  The k-core
  separates the graph's cohesive kernel from tendrils, the usual
  pre-filter before community or importance analysis.

* ``trim_to_cycle_core(edges)`` — directed: repeatedly delete nodes
  with in-degree 0 or out-degree 0.  This is the classic "trim" step of
  distributed SCC algorithms; every deleted node is PROVABLY on no
  cycle.  NOTE THE HONEST SEMANTICS: the surviving subgraph contains
  all cycles but may also retain nodes that merely lie BETWEEN two
  cycles (A -> v -> B with A, B cyclic keeps v although v is on no
  cycle).  For dependency hygiene that superset is the right screen —
  "repos possibly involved in import cycles" — and exactness would need
  full SCC decomposition (forward-backward coloring), whose nested
  fixpoints are not worth the cost at this layer.

Scale shape (both loops):

* each round is ONE hash-aggregate (degrees / endpoint sets) plus
  semi-joins of the edge frame against the shrinking alive set — plain
  equi joins, AQE-broadcastable once the alive set is small;
* the edge frame is re-checkpointed lazily each round, so a round is a
  single job and the lineage never compounds;
* convergence = unchanged (count, bit_xor(xxhash64)) digest: the peel
  is monotone (edge sets only shrink), so an unchanged digest IS the
  fixpoint;
* iteration count is bounded by ``max_iterations``; peeling removes at
  least one node per non-converged round, and real graphs converge in a
  handful of rounds (the degeneracy ordering is shallow unless the
  graph is pathological — a planted chain is the worst case, as with
  connected components).

Determinism: on convergence the output is THE fixpoint (unique — peeling
is confluent: the set of nodes surviving is independent of deletion
order, the standard k-core/trim property), so early exit vs.
fixed-iteration replay agree.  If ``max_iterations`` is exhausted while
the digest is still changing (pathological chain-like graphs), the
result is a valid intermediate peel but NOT the fixpoint, and a
``RuntimeWarning`` is raised so the caller knows (ADVICE r5);
the DuckDB oracles unroll a pinned number of rounds and tests assert the
fixture converges within the pinned bound.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from military_entity_extraction_based_on_large_models_spark.plans.parallelism import (
    truncate_plan_stats,
)


def _digest(e: DataFrame, cols: tuple[str, str]) -> tuple:
    return tuple(
        e.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.bit_xor(F.xxhash64(*cols)), F.lit(0)).alias("h"),
        ).first()
    )


def _warn_if_not_fixpoint(
    op: str, e: DataFrame, cols: tuple[str, str], prev: tuple | None,
    max_iterations: int,
) -> None:
    """Iteration-budget exhaustion guard (ADVICE r5): if the loop ran out
    of rounds while the digest was still changing, the returned edge set
    is a valid intermediate peel but NOT the fixpoint — warn so callers
    know survivors may violate the invariant (e.g. in-core degree < k)."""
    if _digest(e, cols) != prev:
        warnings.warn(
            f"{op}: not converged after max_iterations={max_iterations}; "
            "returned edge set is a non-fixpoint intermediate (raise "
            "max_iterations for pathological chain-like graphs)",
            RuntimeWarning,
            stacklevel=3,
        )


def k_core(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 30,
) -> DataFrame:
    """Undirected k-core → (node, degree) with in-core degree >= k.

    ``edges`` may carry each undirected edge once in either orientation;
    self-loops are dropped and duplicates collapsed.  Empty result if no
    k-core exists.
    """
    if k < 1:
        raise ValueError("k_core: k must be >= 1")
    base = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .where(F.col("a").isNotNull() & F.col("b").isNotNull())
        .where(F.col("a") != F.col("b"))
    )
    # symmetrize so one groupBy("a") is the full degree count
    e = (
        base.unionByName(base.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    prev = None
    for _ in range(max_iterations):
        cur = _digest(e, ("a", "b"))
        if cur == prev or cur[0] == 0:
            break
        prev = cur
        alive = (
            e.groupBy("a")
            .agg(F.count(F.lit(1)).alias("_d"))
            .where(F.col("_d") >= k)
            .select("a")
        )
        e = truncate_plan_stats(
            e.join(alive, "a", "left_semi")
            .join(alive.withColumnRenamed("a", "b"), "b", "left_semi")
            .localCheckpoint(eager=False)
        )
    else:
        _warn_if_not_fixpoint("k_core", e, ("a", "b"), prev, max_iterations)
    return (
        e.groupBy(F.col("a").alias("node"))
        .agg(F.count(F.lit(1)).alias("degree"))
    )


def trim_to_cycle_core(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 30,
) -> DataFrame:
    """Directed trim → the surviving edge subgraph (src, dst).

    Deletes nodes with in-degree 0 or out-degree 0 to fixpoint.  Every
    deleted node is provably acyclic; survivors are the cycle-containing
    core PLUS any nodes lying between cycles (see module docstring).
    Self-loops are legitimate cycles and survive.
    """
    e = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .where(F.col("s").isNotNull() & F.col("d").isNotNull())
        .distinct()
        .localCheckpoint(eager=False)
    )
    prev = None
    for _ in range(max_iterations):
        cur = _digest(e, ("s", "d"))
        if cur == prev or cur[0] == 0:
            break
        prev = cur
        alive = (
            e.select(F.col("s").alias("n"))
            .intersect(e.select(F.col("d").alias("n")))
        )
        e = truncate_plan_stats(
            e.join(alive.withColumnRenamed("n", "s"), "s", "left_semi")
            .join(alive.withColumnRenamed("n", "d"), "d", "left_semi")
            .localCheckpoint(eager=False)
        )
    else:
        _warn_if_not_fixpoint(
            "trim_to_cycle_core", e, ("s", "d"), prev, max_iterations
        )
    return e.select(F.col("s").alias(src), F.col("d").alias(dst))
