"""Canonicalization: connected components over the co-reference edge list.

The reference canonicalizes implicitly — aliases of one entity collapse only
because the LLM emits the surface form and dedup keys on (name, label)
(reflect_workflow1.py:44-53).  At KG scale we need transitive closure: if
"F-16" and "Fighting Falcon" both link to ent_f16, and a fuzzy block pairs
"F16" with "F-16", all three surface forms belong to one component.

Algorithm: alternating large-star/small-star (the "Connected Components in
MapReduce and Beyond" two-operation algorithm — public literature), on
xxhash64 long node ids, with edge-multiset digests for convergence.  Round-2
rewrite after the 400 s / 2.1 M-edge round-1 measurement; what changed and
why:

* **true star contraction, not min-value propagation.**  Round 1 propagated
  min label VALUES with a "pointer jump" through the value — but a min value
  is not a parent pointer, so coverage grew additively (~+2 hops/round) and
  a 1000-node chain needed hundreds of rounds.  Large-star/small-star
  contract the tree structure itself and converge in O(log² n) alternations
  (~5-10 in practice).
* **long node ids.**  Nodes are xxhash64'd once up front; every shuffle and
  comparison in the loop moves 8-byte longs instead of entity-name strings.
  (A collision at realistic node counts is astronomically unlikely and
  would only MERGE two clusters, never drop a node; final labels are
  re-derived from the original strings.)
* **no manual salting.**  The per-round reduction is ``min`` — algebraic, so
  Spark's partial aggregation combines map-side and a hot hub's edges never
  land on one reducer.  (Round 1 salted a two-phase min: a full extra
  shuffle per round that partial aggregation already made redundant.
  Salting pays for holistic aggregates like collect_list, not for min.)
* **one aggregate convergence probe, no join.**  The alternation's potential
  function strictly decreases, so an unchanged (count, xor-hash) digest of
  the edge multiset IS the fixpoint; round 1 ran a change-detection
  join+count every round.
* **plan-stats pinning.**  Loop states are localCheckpointed AND re-wrapped
  with fresh statistics (plans/parallelism.truncate_plan_stats): Spark
  carries the origin plan's size estimate through localCheckpoint, and in a
  join loop that estimate compounds double-exponentially until the driver
  hangs multiplying million-digit BigIntegers inside stats estimation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.parallelism import truncate_plan_stats

DEFAULT_SALT = 16  # kept for signature compatibility; see docstring


def _pin(df: DataFrame) -> DataFrame:
    """Materialize a loop-state frame AND reset its plan statistics.

    localCheckpoint alone truncates lineage but carries the origin plan's
    size estimate forward; in this loop that estimate compounds
    double-exponentially per round until the driver hangs in BigInteger
    stats arithmetic (see plans.parallelism.truncate_plan_stats)."""
    return truncate_plan_stats(df.localCheckpoint(eager=True))


def _large_star(e: DataFrame) -> DataFrame:
    """Large-star: for each node u, connect every strictly-larger neighbor to
    the minimum of u's closed neighborhood.  Two shuffles (groupBy min +
    join-back) — deliberately NOT collect_list, so a 100M-degree hub never
    materializes its neighbor array on one reducer."""
    g = e.select(F.col("x").alias("u"), F.col("y").alias("v")).unionByName(
        e.select(F.col("y").alias("u"), F.col("x").alias("v"))
    )
    mins = g.groupBy("u").agg(F.min("v").alias("mv"))
    mins = mins.select("u", F.least("u", "mv").alias("m"))
    return (
        g.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("x"), F.col("m").alias("y"))
        .where(F.col("x") != F.col("y"))
        # no distinct here: small_star's min-agg absorbs duplicate edges
        # map-side (partial aggregation), and its own final distinct is the
        # round's set boundary — dropping this saved one shuffle per round
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Small-star: orient each edge toward its larger endpoint, then connect
    every smaller neighbor (and u itself) to the minimum neighbor."""
    g = e.select(
        F.greatest("x", "y").alias("u"), F.least("x", "y").alias("v")
    )
    mins = g.groupBy("u").agg(F.min("v").alias("m"))
    members = g.join(mins, "u").select(
        F.col("v").alias("x"), F.col("m").alias("y")
    )
    selves = mins.select(F.col("u").alias("x"), F.col("m").alias("y"))
    return (
        members.unionByName(selves)
        .where(F.col("x") != F.col("y"))
        .distinct()
    )


def _split_frozen(e: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split the round's edge set into (active, frozen).

    Loop edges always satisfy y < x (both stars orient toward the minimum),
    so grouping by ``y`` partitions the set into candidate stars.  A group is
    FROZEN iff it is an isolated star — no member node touches any other
    edge: every x appears exactly once corpus-wide and never as a root, and
    the root y never appears as a member.  An isolated star is a fixpoint of
    the large-star/small-star alternation regardless of history (large-star
    reconnects every member to the closed-neighborhood min = the root;
    small-star reproduces the selves), and the alternation never creates
    edges across components, so a frozen group can never change again —
    removing it from the loop is exact, not approximate.

    Anything weaker (per-y digest stability, per-edge checks) is UNSOUND: a
    node shared with another group can later re-route, and its full
    neighborhood must stay visible to large-star.

    Cost: one count-by-x aggregate, a distinct of roots, and two semi/anti
    joins — all on the shrinking active set."""
    xs = e.groupBy(F.col("x").alias("n")).agg(F.count(F.lit(1)).alias("cx"))
    ys = e.select(F.col("y").alias("n")).distinct().withColumn("isy", F.lit(True))
    bad_nodes = (
        xs.join(ys, "n", "full_outer")
        .where((F.col("cx") > 1) | (F.col("cx").isNotNull() & F.col("isy").isNotNull()))
        .select("n")
    )
    bad_groups = (
        e.join(bad_nodes.withColumnRenamed("n", "x"), "x", "left_semi")
        .select("y")
        .unionByName(
            e.join(bad_nodes.withColumnRenamed("n", "y"), "y", "left_semi").select("y")
        )
        .distinct()
    )
    return (
        e.join(bad_groups, "y", "left_semi"),
        e.join(bad_groups, "y", "left_anti"),
    )


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 50,
    salt_buckets: int = DEFAULT_SALT,  # noqa: ARG001 — superseded by partial agg
    checkpoint_every: int = 1,  # noqa: ARG001 — comp is checkpointed every round
    active_filter: bool = False,
) -> DataFrame:
    """Edge list (src, dst: string) → (node: string, component: string),
    component = min node id (string order) in the component.

    Driver-side bounded fixpoint (the reference's own retry loop is the same
    shape, reflect_workflow2.py:96-122: bounded driver iteration over
    unresolved work).

    ``active_filter=True`` freezes isolated-star components out of the loop
    each round (``_split_frozen`` — exact, never approximate), so tail
    rounds reprocess only the not-yet-converged subgraph instead of the full
    edge set.  Worth it when convergence is skewed (most components finish
    in 2-3 rounds, a few long chains need 10); costs ~3 extra small shuffles
    per round on the shrinking active set.  A/B-measured in BENCH.md.
    """
    str_edges = (
        edges.select(F.col(src).alias("sa"), F.col(dst).alias("sb"))
        .where(F.col("sa").isNotNull() & F.col("sb").isNotNull())
    )
    nodes = (
        str_edges.select(F.col("sa").alias("node_str"))
        .unionByName(str_edges.select(F.col("sb").alias("node_str")))
        .distinct()
        .withColumn("node_id", F.xxhash64("node_str"))
        .localCheckpoint(eager=False)
    )
    e = (
        str_edges.select(
            F.xxhash64("sa").alias("a"), F.xxhash64("sb").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    e = _pin(
        e.select(F.col("a").alias("x"), F.col("b").alias("y"))
    )

    import os as _os
    import sys as _sys
    import time as _time

    verbose = bool(_os.environ.get("SPARK_GRAFT_CC_VERBOSE"))
    prev_digest = None
    frozen_parts: list[DataFrame] = []
    for _round in range(max_iterations):
        _t0 = _time.time()
        # LAZY localCheckpoint: the digest agg below is the action that
        # materializes it, so each round runs ONE job instead of two
        # (eager-checkpoint + digest) — at 13-task stages the per-job driver/
        # AQE orchestration was ~40% of local wall time (round-2 review)
        e = truncate_plan_stats(
            _small_star(_large_star(e)).localCheckpoint(eager=False)
        )
        if active_filter:
            # frozen groups keep their lineage on this round's checkpointed
            # frame (materialized by the active side below) and rejoin at the
            # end; the loop continues on the shrinking active set only
            act, frz = _split_frozen(e)
            frozen_parts.append(frz)
            e = truncate_plan_stats(act.localCheckpoint(eager=False))
        # multiset digest of the edge set: the alternation is monotone (the
        # potential function of the large/small-star algorithm strictly
        # decreases), so an unchanged digest IS the fixpoint — one tiny agg
        # on the pinned frame, no change-detection join
        digest = tuple(
            e.agg(
                F.count(F.lit(1)).alias("n"),
                F.coalesce(F.bit_xor(F.xxhash64("x", "y")), F.lit(0)).alias("h"),
            ).first()
        )
        if verbose:
            print(
                f"[cc] round {_round} {_time.time() - _t0:.1f}s digest={digest}",
                file=_sys.stderr, flush=True,
            )
        if digest == prev_digest or digest[0] == 0:
            break
        prev_digest = digest

    for frz in frozen_parts:
        e = e.unionByName(frz)
    # fixpoint edges are stars (member -> root); attach isolated nodes back
    comp = e.groupBy(F.col("x").alias("node")).agg(
        F.min("y").alias("component")
    )
    comp = (
        nodes.select(F.col("node_id").alias("node"))
        .join(comp, "node", "left")
        .select("node", F.coalesce("component", F.col("node")).alias("component"))
    )

    # back to strings: component label = lexicographically-min original
    # surface form in the component (what the DuckDB oracle computes too)
    named = nodes.join(comp, nodes.node_id == comp.node).select(
        "node_str", F.col("component").alias("root_id")
    )
    roots = named.groupBy("root_id").agg(
        F.min("node_str").alias("component")
    )
    return named.join(roots, "root_id").select(
        F.col("node_str").alias("node"), "component"
    )


def canonical_clusters(
    linked: DataFrame,
    fuzzy_pairs: DataFrame | None = None,
) -> DataFrame:
    """Build the co-reference edge list from linked mentions and collapse it.

    Edges: (surface name ↔ canonical id) from the alias dictionary hits, plus
    optional fuzzy (name_a ↔ name_b) pairs from MinHash blocking.  Returns
    (node, component); joining mentions on name (or canonical) attaches the
    final canonical cluster id.
    """
    name_edges = linked.select(
        F.col("name").alias("src"), F.col("canonical").alias("dst")
    ).distinct()
    edges = name_edges
    if fuzzy_pairs is not None:
        edges = edges.unionByName(
            fuzzy_pairs.select(
                F.col("name_a").alias("src"), F.col("name_b").alias("dst")
            )
        )
    return connected_components(edges)


def connected_components_incremental(
    comp: DataFrame,
    new_edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Fold a NEW edge batch into an existing components labeling without
    recomputing global CC — the KG-maintenance analogue of
    ``dedup.lsh_pairs_incremental``: a daily corpus increment costs
    O(batch), never O(corpus).

    ``comp``: the stored ``(node, component)`` labeling where ``component``
    is the lexicographically-min member (exactly
    :func:`connected_components`'s output).  ``new_edges``: the incoming
    batch (string endpoints; unseen nodes allowed).

    Correctness: components of ``old ∪ batch`` are exactly the old
    components merged along batch edges.  Each old component is contracted
    to its label, the batch induces a COMPONENT graph (only pairs whose
    endpoints carry different labels), and :func:`connected_components` on
    that tiny graph yields, per merged group, the min over constituent
    labels — which, since every old label is already its component's min
    member and new nodes label themselves, IS the global min member.  So
    ``connected_components_incremental(cc(old), batch)`` equals
    ``cc(old ∪ batch)`` row-for-row (property-tested, and the driver row's
    oracle is the full-recompute recursive CTE — the equivalence itself is
    hash-gated).

    Scale shape (100 TB): one equi join of the O(batch) node set against
    the stored labeling, CC on the contracted component graph (O(batch)
    nodes — the star-alternation rounds run on a graph ~6 orders smaller
    than the corpus), then ONE scan of ``comp`` with a broadcast remap of
    the touched labels (|remap| ≤ 2·|batch|).  Nothing corpus-sized
    shuffles; store ``comp`` bucketed by ``node`` and the probe join is
    co-located too.
    """
    e = (
        new_edges.select(F.col(src).alias("sa"), F.col(dst).alias("sb"))
        .where(F.col("sa").isNotNull() & F.col("sb").isNotNull())
        .distinct()
    )
    batch_nodes = (
        e.select(F.col("sa").alias("node"))
        .unionByName(e.select(F.col("sb").alias("node")))
        .distinct()
    )
    # current label of every batch endpoint; unseen nodes label themselves.
    # _is_new rides along from THIS probe so the new-node split below needs
    # no second corpus-sized join (the one-scan incremental contract)
    lbl = batch_nodes.join(comp, "node", "left").select(
        "node",
        F.coalesce("component", F.col("node")).alias("c0"),
        F.col("component").isNull().alias("_is_new"),
    )
    la = lbl.select(F.col("node").alias("sa"), F.col("c0").alias("_ca"))
    lb = lbl.select(F.col("node").alias("sb"), F.col("c0").alias("_cb"))
    contracted = (
        e.join(la, "sa")
        .join(lb, "sb")
        .select(F.col("_ca").alias("src"), F.col("_cb").alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    remap = F.broadcast(
        connected_components(contracted).select(
            F.col("node").alias("_old_label"),
            F.col("component").alias("_new_label"),
        )
    )
    updated_old = comp.join(
        remap, comp["component"] == remap["_old_label"], "left"
    ).select(
        "node", F.coalesce("_new_label", comp["component"]).alias("component")
    )
    new_rows = (
        lbl.where(F.col("_is_new"))
        .join(remap, F.col("c0") == F.col("_old_label"), "left")
        .select("node", F.coalesce("_new_label", F.col("c0")).alias("component"))
    )
    return updated_old.unionByName(new_rows)
