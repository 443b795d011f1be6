"""Canonicalization: connected components over the co-reference edge list.

The reference canonicalizes implicitly — aliases of one entity collapse only
because the LLM emits the surface form and dedup keys on (name, label)
(reflect_workflow1.py:44-53).  At KG scale we need transitive closure: if
"F-16" and "Fighting Falcon" both link to ent_f16, and a fuzzy block pairs
"F16" with "F-16", all three surface forms belong to one component.

Algorithm: iterative min-label propagation with pointer jumping (path
doubling) — the standard hash-partitioned connected-components fixpoint from
the public MapReduce-CC literature.  Round-2 rewrite after the 400 s /
2.1 M-edge round-1 measurement; the constants changed, not the asymptotics:

* **long node ids.**  Nodes are xxhash64'd once up front; every shuffle and
  comparison in the loop moves 8-byte longs instead of entity-name strings.
  (Collision odds at 10^9 nodes ≈ 10^18 pairs / 2^64 ≈ 5%·ε — and a
  collision only ever MERGES two clusters, never drops a node; final labels
  are re-derived from the original strings.)
* **no manual salting.**  The per-round reduction is ``min`` — algebraic, so
  Spark's partial aggregation combines map-side and a hot hub's edges never
  land on one reducer.  (Round 1 salted a two-phase min: a full extra
  shuffle per round that partial aggregation already made redundant.
  Salting pays for holistic aggregates like collect_list, not for min.)
* **one aggregate convergence probe, no join.**  Labels are monotonically
  non-increasing, so the label sum strictly decreases until the fixpoint;
  comparing sums across rounds replaces round 1's change-detection
  join+count.  Sum runs over the just-checkpointed comp frame — one tiny
  job.  (decimal(38,0) accumulator: Spark 4 ANSI mode would overflow a
  bigint sum of 64-bit labels.)
* **stable partitioning.**  ``sym`` is hash-partitioned on the join key and
  localCheckpointed once; ``comp`` is re-partitioned on ``node`` and
  localCheckpointed every round, so the per-round edge join reuses the
  existing exchanges and the only full shuffle per round is the
  groupBy(node) min.

Convergence is O(log diameter) rounds via pointer jumping; each round is
one join + one partial-aggregated min + one jump join over |V| rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_SALT = 16  # kept for signature compatibility; see docstring


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 50,
    salt_buckets: int = DEFAULT_SALT,  # noqa: ARG001 — superseded by partial agg
    checkpoint_every: int = 1,  # noqa: ARG001 — comp is checkpointed every round
) -> DataFrame:
    """Edge list (src, dst: string) → (node: string, component: string),
    component = min node id (string order) in the component.

    Driver-side bounded fixpoint (the reference's own retry loop is the same
    shape, reflect_workflow2.py:96-122: bounded driver iteration over
    unresolved work).
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
    sym = (
        e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .repartition("a")
        .localCheckpoint(eager=True)
    )
    comp = (
        nodes.select(F.col("node_id").alias("node"))
        .withColumn("component", F.col("node"))
        .repartition("node")
        .localCheckpoint(eager=True)
    )

    prev_sum = None
    for _ in range(max_iterations):
        # min neighbor label per node: partial-aggregated min — hub-safe
        nbr = (
            sym.join(comp.withColumnRenamed("node", "a"), "a")
            .groupBy(F.col("b").alias("node"))
            .agg(F.min("component").alias("nbr_min"))
        )
        merged = comp.join(nbr, "node", "left").select(
            "node",
            F.least(
                F.col("component"), F.coalesce("nbr_min", F.col("component"))
            ).alias("component"),
        )
        # pointer jumping: follow component → component's component, so deep
        # chains converge in O(log diameter) rounds instead of O(diameter)
        parent = merged.select(
            F.col("node").alias("component"), F.col("component").alias("grand")
        )
        jumped = merged.join(parent, "component", "left").select(
            "node",
            F.least(
                F.col("component"), F.coalesce("grand", F.col("component"))
            ).alias("component"),
        )
        comp = jumped.repartition("node").localCheckpoint(eager=True)
        # labels only ever decrease → the sum strictly decreases until the
        # fixpoint; a single aggregate over the checkpointed frame replaces
        # a change-detection join
        cur_sum = comp.agg(
            F.sum(F.col("component").cast("decimal(38,0)"))
        ).first()[0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum

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
