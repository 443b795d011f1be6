"""Connected-components canonicalization: known component structures."""

from __future__ import annotations

from military_entity_extraction_based_on_large_models_spark.operators.canonicalize import (
    canonical_clusters,
    connected_components,
)


def _components(spark, edges):
    df = spark.createDataFrame(edges, ["src", "dst"])
    comp = connected_components(df, salt_buckets=4, checkpoint_every=2)
    out: dict[str, set[str]] = {}
    for r in comp.collect():
        out.setdefault(r["component"], set()).add(r["node"])
    return set(frozenset(v) for v in out.values())


def test_cc_two_chains_and_isolate(spark):
    comps = _components(
        spark,
        [("a", "b"), ("b", "c"), ("x", "y"), ("p", "q"), ("q", "p")],
    )
    assert comps == {
        frozenset({"a", "b", "c"}),
        frozenset({"x", "y"}),
        frozenset({"p", "q"}),
    }


def test_cc_long_path_converges(spark):
    n = 30
    edges = [(f"n{i:02d}", f"n{i + 1:02d}") for i in range(n)]
    comps = _components(spark, edges)
    assert comps == {frozenset({f"n{i:02d}" for i in range(n + 1)})}


def test_cc_star_hot_key(spark):
    # hot node: one hub connected to 50 spokes (salted agg path)
    edges = [("hub", f"s{i}") for i in range(50)]
    comps = _components(spark, edges)
    assert len(comps) == 1 and len(next(iter(comps))) == 51


def test_canonical_clusters_collapse_aliases(spark):
    linked = spark.createDataFrame(
        [
            ("F-16", "ent_f16"),
            ("Fighting Falcon", "ent_f16"),
            ("HIMARS", "ent_himars"),
        ],
        ["name", "canonical"],
    )
    fuzzy = spark.createDataFrame([("F-16", "F16")], ["name_a", "name_b"])
    comp = canonical_clusters(linked, fuzzy)
    by_comp: dict[str, set[str]] = {}
    for r in comp.collect():
        by_comp.setdefault(r["component"], set()).add(r["node"])
    comps = set(frozenset(v) for v in by_comp.values())
    assert frozenset({"F-16", "F16", "Fighting Falcon", "ent_f16"}) in comps
    assert frozenset({"HIMARS", "ent_himars"}) in comps


def test_cc_active_filter_parity(spark):
    """active_filter freezes isolated-star components exactly: same result as
    the unfiltered loop on a graph mixing quick-converging stars/triangles
    with a long chain (which stays active for many more rounds)."""
    edges = (
        [(f"n{i:02d}", f"n{i + 1:02d}") for i in range(24)]          # long chain
        + [("hub", f"s{i}") for i in range(40)]                       # star
        + [("t1", "t2"), ("t2", "t3"), ("t3", "t1")]                  # triangle
        + [("iso1", "iso2")]                                          # pair
    )
    df = spark.createDataFrame(edges, ["src", "dst"])

    def comp_sets(active_filter):
        comp = connected_components(df, active_filter=active_filter)
        out: dict[str, set[str]] = {}
        for r in comp.collect():
            out.setdefault(r["component"], set()).add(r["node"])
        return set(frozenset(v) for v in out.values())

    assert comp_sets(True) == comp_sets(False)


def _cc_inc(spark, old_edges, batch_edges):
    from military_entity_extraction_based_on_large_models_spark.operators.canonicalize import (
        connected_components,
        connected_components_incremental,
    )

    old = spark.createDataFrame(old_edges, "src string, dst string")
    batch = spark.createDataFrame(batch_edges, "src string, dst string")
    comp0 = connected_components(old)
    inc = connected_components_incremental(comp0, batch)
    full = connected_components(old.unionByName(batch))
    return (
        sorted(map(tuple, inc.collect())),
        sorted(map(tuple, full.collect())),
    )


def test_cc_incremental_merges_components(spark):
    # old: {a,b} and {c,d}; batch edge b-c merges them; e-f is a brand-new
    # component of unseen nodes; g-a attaches an unseen node to an old one
    inc, full = _cc_inc(
        spark,
        [("a", "b"), ("c", "d")],
        [("b", "c"), ("e", "f"), ("g", "a")],
    )
    assert inc == full
    as_dict = dict(inc)
    assert as_dict == {
        "a": "a", "b": "a", "c": "a", "d": "a", "g": "a",
        "e": "e", "f": "e",
    }


def test_cc_incremental_empty_batch_and_chain(spark):
    # empty batch is the identity; a batch that chains three old components
    # through two hops must relabel all of them to the global min
    inc, full = _cc_inc(spark, [("m", "n"), ("p", "q"), ("x", "y")], [])
    assert inc == full
    inc, full = _cc_inc(
        spark,
        [("m", "n"), ("p", "q"), ("x", "y")],
        [("n", "p"), ("q", "x")],
    )
    assert inc == full
    assert dict(inc)["y"] == "m"


def test_cc_incremental_property_random(spark):
    import random

    rng = random.Random(99)
    nodes = [f"n{i:02d}" for i in range(40)]
    edges = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(70)
    ]
    edges = [e for e in edges if e[0] != e[1]]
    cut = len(edges) * 2 // 3
    inc, full = _cc_inc(spark, edges[:cut], edges[cut:])
    assert inc == full


def test_cc_incremental_remap_is_broadcast(spark):
    """The stored-labeling update must be ONE scan with a broadcast remap
    join (|remap| = O(batch)) — a shuffle of the corpus-sized labeling
    would defeat the incremental contract."""
    from military_entity_extraction_based_on_large_models_spark.operators.canonicalize import (
        connected_components,
        connected_components_incremental,
    )

    comp = connected_components(
        spark.createDataFrame([("a", "b"), ("c", "d")], "src string, dst string")
    )
    batch = spark.createDataFrame([("b", "c")], "src string, dst string")
    plan = (
        connected_components_incremental(comp, batch)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
