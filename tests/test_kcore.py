"""k-core peeling + acyclic trim — operators/kcore.py.

Oracle: brute-force python peels over adjacency dicts.
"""

from __future__ import annotations

import pytest

from military_entity_extraction_based_on_large_models_spark.operators.kcore import (
    k_core,
    trim_to_cycle_core,
)


def py_kcore(edges, k):
    adj = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    changed = True
    while changed:
        changed = False
        for n in [n for n, nb in adj.items() if len(nb) < k]:
            for m in adj.pop(n):
                adj[m].discard(n)
            changed = True
    return {n: len(nb) for n, nb in adj.items()}


def py_trim(edges):
    es = {(s, d) for s, d in edges}
    while True:
        srcs = {s for s, _ in es}
        dsts = {d for _, d in es}
        alive = srcs & dsts
        nxt = {(s, d) for s, d in es if s in alive and d in alive}
        if nxt == es:
            return es
        es = nxt


# K4 clique {1,2,3,4} + pendant chain 4-5-6 + separate triangle {7,8,9}
EDGES = (
    [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    + [(4, 5), (5, 6)]
    + [(7, 8), (8, 9), (7, 9)]
)


def _edf(spark, edges, schema="src int, dst int"):
    return spark.createDataFrame(edges, schema)


def test_k3_core_is_the_clique(spark):
    got = {(r.node, r.degree) for r in k_core(_edf(spark, EDGES), 3).collect()}
    assert got == {(n, 3) for n in (1, 2, 3, 4)}
    assert got == set(py_kcore(EDGES, 3).items())


def test_k2_core_keeps_triangle_drops_chain(spark):
    got = {r.node: r.degree for r in k_core(_edf(spark, EDGES), 2).collect()}
    assert got == py_kcore(EDGES, 2)
    assert 5 not in got and 6 not in got
    assert got[7] == 2


def test_k1_core_is_all_non_isolated(spark):
    got = {r.node for r in k_core(_edf(spark, EDGES), 1).collect()}
    assert got == set(range(1, 10))


def test_no_core_returns_empty(spark):
    tri = [(7, 8), (8, 9), (7, 9)]
    assert k_core(_edf(spark, tri), 3).count() == 0


def test_kcore_duplicate_and_reversed_edges_collapse(spark):
    doubled = EDGES + [(b, a) for a, b in EDGES] + EDGES[:3]
    got = {(r.node, r.degree) for r in k_core(_edf(spark, doubled), 3).collect()}
    assert got == {(n, 3) for n in (1, 2, 3, 4)}


def test_trim_removes_planted_acyclic_parts(spark):
    edges = [("a", "b"), ("b", "a"), ("x", "a"), ("b", "y"), ("y", "z")]
    got = {
        (r.src, r.dst)
        for r in trim_to_cycle_core(_edf(spark, edges, "src string, dst string")).collect()
    }
    assert got == {("a", "b"), ("b", "a")}
    assert got == py_trim(edges)


def test_trim_keeps_self_loop(spark):
    edges = [("s", "s"), ("s", "t")]
    got = {
        (r.src, r.dst)
        for r in trim_to_cycle_core(_edf(spark, edges, "src string, dst string")).collect()
    }
    assert got == {("s", "s")}


def test_trim_superset_semantics_between_cycles_node_survives(spark):
    # documented: v between two cycles survives although on no cycle
    edges = [
        ("a1", "a2"), ("a2", "a1"),
        ("b1", "b2"), ("b2", "b1"),
        ("a1", "v"), ("v", "b1"),
    ]
    got = {
        (r.src, r.dst)
        for r in trim_to_cycle_core(_edf(spark, edges, "src string, dst string")).collect()
    }
    assert got == set(edges)
    assert got == py_trim(edges)


def test_kcore_repartition_invariance(spark):
    e = _edf(spark, EDGES)
    a = sorted((r.node, r.degree) for r in k_core(e.repartition(1), 2).collect())
    b = sorted((r.node, r.degree) for r in k_core(e.repartition(13), 2).collect())
    assert a == b


def test_kcore_rejects_bad_k(spark):
    with pytest.raises(ValueError):
        k_core(_edf(spark, EDGES), 0)


def test_kcore_warns_on_iteration_exhaustion(spark):
    # a 12-node chain peels one node from each end per round: k=2 needs
    # ~6 rounds to empty, so max_iterations=2 exhausts mid-peel — the
    # result is a non-fixpoint intermediate and must carry a warning
    import warnings as _w

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "src long, dst long"
    )
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        out = k_core(chain, k=2, max_iterations=2).collect()
    assert any("not converged" in str(w.message) for w in rec)
    assert out  # intermediate peel: survivors remain (chain not yet empty)
    # converged run on the same input: no warning, empty fixpoint
    with _w.catch_warnings(record=True) as rec2:
        _w.simplefilter("always")
        assert k_core(chain, k=2, max_iterations=30).count() == 0
    assert not any("not converged" in str(w.message) for w in rec2)
