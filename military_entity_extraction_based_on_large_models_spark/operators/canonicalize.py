"""Canonicalization: connected components over the co-reference edge list.

The reference canonicalizes implicitly — aliases of one entity collapse only
because the LLM emits the surface form and dedup keys on (name, label)
(reflect_workflow1.py:44-53).  At KG scale we need transitive closure: if
"F-16" and "Fighting Falcon" both link to ent_f16, and a fuzzy block pairs
"F16" with "F-16", all three surface forms belong to one component.

Algorithm: iterative min-label propagation (the standard hash-partitioned
connected-components fixpoint; cf. the small-star/large-star family from the
"Connected Components in MapReduce and Beyond" line of work — public
literature).  Each iteration is one shuffle on `node`; the driver loop is
bounded and checks convergence via an aggregate, and ``localCheckpoint()``
every few rounds cuts the growing lineage so plans stay small.

Skew (north_rule): hot components (an entity like "Eurofighter" mentioned in a
large fraction of documents) concentrate edges on one node id.  The expensive
step is the groupBy(node).min(comp); we salt it two-phase —
groupBy(node, salt) partial-min then groupBy(node) final-min — so no single
reducer receives the whole hot key.  (With AQE on, Spark also splits skewed
partitions at runtime; the salting makes the plan robust even without AQE.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_SALT = 16


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 20,
    salt_buckets: int = DEFAULT_SALT,
    checkpoint_every: int = 3,
) -> DataFrame:
    """Edge list (src, dst: string) → (node: string, component: string),
    component = min node id in the component.

    Driver-side bounded fixpoint (the reference's own retry loop is the same
    shape, reflect_workflow2.py:96-122: bounded driver iteration over
    unresolved work).
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .where(F.col("a").isNotNull() & F.col("b").isNotNull())
        .distinct()
    )
    nodes = (
        sym.select(F.col("a").alias("node"))
        .unionByName(sym.select(F.col("b").alias("node")))
        .distinct()
    )
    # comp starts as self
    comp = nodes.withColumn("component", F.col("node"))
    sym = sym.unionByName(sym.select(F.col("b").alias("a"), F.col("a").alias("b")))
    sym = sym.localCheckpoint(eager=True)
    comp = comp.localCheckpoint(eager=True)

    for it in range(max_iterations):
        # candidate labels flowing along edges: neighbor's current component
        neighbor_labels = (
            sym.join(comp.withColumnRenamed("node", "a"), "a")
            .select(F.col("b").alias("node"), "component")
        )
        candidates = comp.unionByName(neighbor_labels)
        # two-phase salted min: partial min per (node, salt), then final min.
        salted = candidates.withColumn(
            "_salt", F.pmod(F.xxhash64("component"), F.lit(salt_buckets))
        )
        partial = salted.groupBy("node", "_salt").agg(
            F.min("component").alias("component")
        )
        new_comp = partial.groupBy("node").agg(F.min("component").alias("component"))

        # pointer jumping (path doubling): follow component → component's
        # component, so convergence is O(log diameter) rounds, not O(diameter)
        parent = new_comp.select(
            F.col("node").alias("component"), F.col("component").alias("grand")
        )
        new_comp = (
            new_comp.join(parent, "component", "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("grand"), F.col("component"))
                ).alias("component"),
            )
        )

        changed = (
            new_comp.alias("n")
            .join(comp.alias("o"), "node")
            .where(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        comp = new_comp
        if (it + 1) % checkpoint_every == 0:
            comp = comp.localCheckpoint(eager=True)
        if changed == 0:
            break
    return comp


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
