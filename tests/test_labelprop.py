"""Synchronous label propagation: hand-walked fixture, python replay of
the identical rounds, determinism under repartition, community quality on
a planted two-cluster graph, plan gate."""

from collections import Counter

from pyspark.sql import functions as F

from military_entity_extraction_based_on_large_models_spark.operators.labelprop import (
    label_propagation,
)


def _sym(pairs):
    out = []
    for a, b in pairs:
        out += [(a, b), (b, a)]
    return out


def _edges(spark, pairs):
    return spark.createDataFrame(_sym(pairs), "src string, dst string")


def _py_lpa(pairs, n_iters):
    """Independent python replay of the synchronous rounds."""
    adj = {}
    for a, b in _sym(pairs):
        adj.setdefault(a, []).append(b)
    lbl = {v: v for v in adj}
    for _ in range(n_iters):
        new = {}
        for v, nbrs in adj.items():
            c = Counter(lbl[u] for u in nbrs)
            # max count, ties to smallest label == min((-count, label))
            new[v] = min((-n, l) for l, n in c.items())[1]
        lbl = new
    return lbl


TWO_CLUSTERS = [
    # clique a1..a4
    ("a1", "a2"), ("a1", "a3"), ("a1", "a4"),
    ("a2", "a3"), ("a2", "a4"), ("a3", "a4"),
    # clique b1..b4
    ("b1", "b2"), ("b1", "b3"), ("b1", "b4"),
    ("b2", "b3"), ("b2", "b4"), ("b3", "b4"),
    # one weak bridge
    ("a4", "b1"),
]


def _spark_lpa(spark, pairs, n_iters=5, n_parts=None):
    e = _edges(spark, pairs)
    if n_parts:
        e = e.repartition(n_parts)
    return {
        r["node"]: r["community"]
        for r in label_propagation(e, n_iters=n_iters).collect()
    }


def test_matches_python_replay(spark):
    for n_iters in (1, 3, 5):
        assert _spark_lpa(spark, TWO_CLUSTERS, n_iters) == _py_lpa(
            TWO_CLUSTERS, n_iters
        ), n_iters


def test_two_cliques_become_two_communities(spark):
    got = _spark_lpa(spark, TWO_CLUSTERS, n_iters=5)
    a = {got[f"a{i}"] for i in range(1, 5)}
    b = {got[f"b{i}"] for i in range(1, 5)}
    # each clique agrees internally, and the two differ (the weak bridge
    # does not merge them) — the structure CC cannot see (CC = 1 component)
    assert len(a) == 1 and len(b) == 1 and a != b


def test_repartition_invariance(spark):
    base = _spark_lpa(spark, TWO_CLUSTERS)
    for n in (1, 7):
        assert _spark_lpa(spark, TWO_CLUSTERS, n_parts=n) == base


def test_tie_breaks_to_smallest_label(spark):
    # star: center 'm' with leaves 'a','z' — after round 1 the center's
    # votes tie 1-1 and must pick 'a'
    got = _spark_lpa(spark, [("m", "a"), ("m", "z")], n_iters=1)
    assert got["m"] == "a"


def test_plan_no_window_no_cartesian(spark):
    plan = (
        label_propagation(_edges(spark, TWO_CLUSTERS), n_iters=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan
    assert "CartesianProduct" not in plan
