"""Node similarity / link prediction: python replay, SQL-twin parity,
parallelism invariance, hub-cap semantics, ranking sanity."""

from __future__ import annotations

from collections import defaultdict

import duckdb
import pandas as pd
import pytest

from military_entity_extraction_based_on_large_models_spark.operators.linkpred import (
    BASE,
    node_similarity,
    node_similarity_sql,
)


def _sym(pairs):
    out = []
    for a, b in pairs:
        out.append((a, b))
        out.append((b, a))
    return out


def _replay(edges, base=BASE, max_degree=None):
    """Pure-python integer replay."""
    adj: dict[str, set] = defaultdict(set)
    for s, d in edges:
        adj[s].add(d)
    deg = {n: len(adj[n]) for n in adj}
    acc: dict[tuple, list] = {}
    for z, nbrs in adj.items():
        if max_degree is not None and deg[z] > max_degree:
            continue
        for a in nbrs:
            for b in nbrs:
                if a < b:
                    rec = acc.setdefault((a, b), [0, 0])
                    rec[0] += 1
                    rec[1] += base // deg[z]
    out = {}
    for (a, b), (cn, ra) in acc.items():
        jac = (base * cn) // (deg[a] + deg[b] - cn)
        out[(a, b)] = (cn, ra, jac, b in adj[a])
    return out


def _collect(df):
    return {
        (r["a"], r["b"]): (
            r["common_neighbors"],
            r["ra_micro"],
            r["jaccard_micro"],
            r["is_edge"],
        )
        for r in df.collect()
    }


# h is a hub over a,b,c; a-b closes a triangle; c-d a tail; x-y isolated pair
PAIRS = [("h", "a"), ("h", "b"), ("h", "c"), ("a", "b"), ("c", "d"), ("x", "y")]


def test_matches_python_replay(spark):
    edges = _sym(PAIRS)
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = _collect(node_similarity(df))
    assert got == _replay(edges)
    # (a, b) is an existing edge with common neighbor h; (b, c) is a
    # link-prediction candidate (non-edge, via h); (x, y) never appears
    # (deg-1 endpoints of an isolated edge share no neighbor)
    assert got[("a", "b")][3] is True
    assert got[("b", "c")][3] is False
    assert not any("x" in p or "y" in p for p in got)


def test_ra_weighting_ranks_low_degree_witness_higher(spark):
    # two candidate pairs, each with exactly one common neighbor: one
    # through the hub h (deg 3+), one through the degree-2 node c —
    # RA scores the low-degree witness strictly higher, CN ties them
    edges = _sym(PAIRS)
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = _collect(node_similarity(df))
    bc, hd = got[("b", "c")], got[("d", "h")]
    assert bc[0] == hd[0] == 1
    assert hd[1] == BASE // 2 > bc[1] == BASE // 3


def test_sql_twin_bit_identical(spark):
    edges = _sym(PAIRS)
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = (
        node_similarity(df)
        .toPandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("e_in", pd.DataFrame(edges, columns=["src", "dst"]))
    want = (
        con.execute(
            node_similarity_sql("SELECT src, dst FROM e_in")
            + " ORDER BY a, b"
        )
        .df()
        .reset_index(drop=True)
    )
    for c in ["a", "b", "common_neighbors", "ra_micro", "jaccard_micro", "is_edge"]:
        assert list(got[c]) == list(want[c]), c


def test_parallelism_invariant(spark):
    pairs = []
    for i in range(1, 300):
        for t in {i % 7, i % 13, i - 1} - {i}:
            pairs.append((f"n{i}", f"n{t}"))
    edges = _sym(set(pairs))
    df = spark.createDataFrame(edges, ["src", "dst"])
    r1 = _collect(node_similarity(df))
    r2 = _collect(node_similarity(df.repartition(17)))
    assert r1 == r2 == _replay(edges)


@pytest.mark.parametrize("cap", [2, 3])
def test_max_degree_cap_matches_replay_and_twin(spark, cap):
    edges = _sym(PAIRS)
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = _collect(node_similarity(df, max_degree=cap))
    assert got == _replay(edges, max_degree=cap)
    # cap=2 drops the hub h (deg 3) as a wedge center: every pair whose
    # only witness was h vanishes; the survivors are the h-incident pairs
    # witnessed by the degree-2 nodes a/b/c, and jaccard still uses FULL
    # degrees — (d, h) reads 1e6 // (1 + 3 - 1) even though h was capped
    # as a center
    if cap == 2:
        assert set(got) == {("a", "h"), ("b", "h"), ("d", "h")}
        assert got[("d", "h")][2] == BASE // 3
    con = duckdb.connect()
    con.register("e_in", pd.DataFrame(edges, columns=["src", "dst"]))
    want_rows = con.execute(
        node_similarity_sql("SELECT src, dst FROM e_in", max_degree=cap)
    ).fetchall()
    want = {(a, b): (cn, ra, jac, ie) for a, b, cn, ra, jac, ie in want_rows}
    assert got == want


def test_no_cartesian_plan(spark):
    edges = _sym(PAIRS)
    df = spark.createDataFrame(edges, ["src", "dst"])
    plan = (
        node_similarity(df)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
