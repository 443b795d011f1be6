"""Deterministic fixed-point PageRank: python replay, parallelism
invariance, SQL-twin parity, ranking sanity."""

from __future__ import annotations

from collections import defaultdict

import duckdb
import pandas as pd

from military_entity_extraction_based_on_large_models_spark.operators.pagerank import (
    BASE,
    pagerank,
    pagerank_sql,
    personalized_pagerank,
    personalized_pagerank_sql,
)


def _replay(edges, n_iters, base=BASE, d_num=17, d_den=20):
    """Pure-python integer replay of the identical iterations."""
    deg: dict[str, int] = defaultdict(int)
    for s, _ in edges:
        deg[s] += 1
    r = {n: base for n in deg}
    tel = ((d_den - d_num) * base) // d_den
    for _ in range(n_iters):
        inc: dict[str, int] = defaultdict(int)
        for s, d in edges:
            inc[d] += r[s] // deg[s]
        r = {n: tel + (d_num * inc[n]) // d_den for n in deg}
    return r


def _sym(pairs):
    out = []
    for a, b in pairs:
        out.append((a, b))
        out.append((b, a))
    return out


# a hub (h) + chain + an off-path pair: asymmetric degrees everywhere
PAIRS = [("h", "a"), ("h", "b"), ("h", "c"), ("a", "b"), ("c", "d"), ("x", "y")]


def test_pagerank_matches_python_replay(spark):
    edges = _sym(PAIRS)
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["node"]: r["rank_fixed"] for r in pagerank(df, n_iters=5).collect()}
    assert got == _replay(edges, 5)
    # every node of the symmetrized graph is ranked
    assert set(got) == {"h", "a", "b", "c", "d", "x", "y"}


def test_pagerank_parallelism_invariant(spark):
    # 400-node deterministic preferential-ish graph: node i links to i%7,
    # i%13 and i-1 — hubs 0..6 get huge in-degree
    pairs = []
    for i in range(1, 400):
        for t in {i % 7, i % 13, i - 1} - {i}:
            pairs.append((f"n{i}", f"n{t}"))
    edges = _sym(pairs)
    df1 = spark.createDataFrame(edges, ["src", "dst"])
    r1 = {r["node"]: r["rank_fixed"] for r in pagerank(df1, n_iters=6).collect()}
    r2 = {
        r["node"]: r["rank_fixed"]
        for r in pagerank(df1.repartition(17), n_iters=6).collect()
    }
    assert r1 == r2 == _replay(edges, 6)  # bit-identical at any layout
    # mass conservation: total loss is bounded by the truncation envelope
    # (< E + n units per iteration: < deg per source node + 1 per damping)
    n = len(r1)
    assert 0 <= n * BASE - sum(r1.values()) < 6 * (len(edges) + n) + 1
    # the hub with max in-degree outranks every leaf
    hub = max(r1, key=r1.get)
    assert hub in {f"n{t}" for t in range(7)}


def test_pagerank_sql_twin_bit_identical(spark):
    edges = _sym(PAIRS)
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = pagerank(df, n_iters=5).toPandas().sort_values("node").reset_index(drop=True)
    con = duckdb.connect()
    con.register("e_in", pd.DataFrame(edges, columns=["src", "dst"]))
    sql = pagerank_sql("SELECT src, dst FROM e_in", n_iters=5) + " ORDER BY node"
    want = con.execute(sql).df()
    assert list(got["rank_fixed"]) == list(want["rank_fixed"])
    assert list(got["rank"]) == list(want["rank"])


def test_pagerank_small_base_headroom(spark):
    # the billion-node configuration: base=1e6 stays exact and ordered the
    # same as the full-resolution run on this graph
    edges = _sym(PAIRS)
    df = spark.createDataFrame(edges, ["src", "dst"])
    small = {r["node"]: r["rank_fixed"] for r in pagerank(df, 5, base=10**6).collect()}
    assert small == _replay(edges, 5, base=10**6)
    full = _replay(edges, 5)
    order = sorted(full, key=lambda n: (-full[n], n))
    order_small = sorted(small, key=lambda n: (-small[n], n))
    assert order == order_small


def test_pagerank_headroom_enforced(spark):
    # 3 nodes at base=1e18: 17 * 3 * 1e18 > 2^63 — must raise with the
    # safe power-of-ten base instead of silently wrapping
    import pytest

    df = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1)], "src long, dst long"
    )
    with pytest.raises(ValueError, match="overflows BIGINT.*base<="):
        pagerank(df, n_iters=1, base=10**18)
    # the suggested scale passes and stays bit-deterministic
    got = {r["node"]: r["rank_fixed"] for r in pagerank(df, 1, base=10**17).collect()}
    assert got == _replay([(1, 2), (2, 3), (3, 1)], 1, base=10**17)


# ---------------------------------------------------------------- PPR


def _replay_ppr(edges, seeds, n_iters, base=BASE, d_num=17, d_den=20):
    """Pure-python integer replay of the personalized iterations."""
    deg: dict[str, int] = defaultdict(int)
    for s, _ in edges:
        deg[s] += 1
    seed_set = set(seeds)
    r = {n: (base if n in seed_set else 0) for n in deg}
    tel = ((d_den - d_num) * base) // d_den
    for _ in range(n_iters):
        inc: dict[str, int] = defaultdict(int)
        for s, d in edges:
            inc[d] += r[s] // deg[s]
        r = {
            n: (tel if n in seed_set else 0) + (d_num * inc[n]) // d_den
            for n in deg
        }
    return r


def test_ppr_matches_python_replay(spark):
    edges = _sym(PAIRS)
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {
        r["node"]: r["rank_fixed"]
        for r in personalized_pagerank(df, ["h"], n_iters=5).collect()
    }
    assert got == _replay_ppr(edges, ["h"], 5)
    # the (x, y) component is unreachable from the seed: rank exactly 0
    assert got["x"] == 0 and got["y"] == 0
    # the seed's direct neighbors outrank the two-hop node d
    assert min(got["a"], got["b"], got["c"]) > got["d"] > 0


def test_ppr_parallelism_invariant(spark):
    pairs = []
    for i in range(1, 400):
        for t in {i % 7, i % 13, i - 1} - {i}:
            pairs.append((f"n{i}", f"n{t}"))
    edges = _sym(pairs)
    seeds = ["n3", "n250"]
    df1 = spark.createDataFrame(edges, ["src", "dst"])
    r1 = {
        r["node"]: r["rank_fixed"]
        for r in personalized_pagerank(df1, seeds, n_iters=6).collect()
    }
    r2 = {
        r["node"]: r["rank_fixed"]
        for r in personalized_pagerank(
            df1.repartition(17), seeds, n_iters=6
        ).collect()
    }
    assert r1 == r2 == _replay_ppr(edges, seeds, 6)
    # total mass bounded by |seeds|·base (truncation only loses)
    assert 0 < sum(r1.values()) <= len(seeds) * BASE


def test_ppr_sql_twin_bit_identical(spark):
    edges = _sym(PAIRS)
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = (
        personalized_pagerank(df, ["h", "x"], n_iters=5)
        .toPandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("e_in", pd.DataFrame(edges, columns=["src", "dst"]))
    sql = (
        personalized_pagerank_sql("SELECT src, dst FROM e_in", ["h", "x"], n_iters=5)
        + " ORDER BY node"
    )
    want = con.execute(sql).df()
    assert list(got["rank_fixed"]) == list(want["rank_fixed"])
    assert list(got["rank"]) == list(want["rank"])


def test_ppr_seed_quote_escaping(spark):
    # a seed value containing a single quote must round-trip the SQL twin
    edges = [("o'hare", "b"), ("b", "o'hare"), ("b", "c"), ("c", "b")]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = (
        personalized_pagerank(df, ["o'hare"], n_iters=3)
        .toPandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("e_in", pd.DataFrame(edges, columns=["src", "dst"]))
    sql = (
        personalized_pagerank_sql("SELECT src, dst FROM e_in", ["o'hare"], n_iters=3)
        + " ORDER BY node"
    )
    want = con.execute(sql).df()
    assert list(got["rank_fixed"]) == list(want["rank_fixed"])


def test_ppr_guards(spark):
    import pytest

    df = spark.createDataFrame([("a", "b"), ("b", "a")], ["src", "dst"])
    with pytest.raises(ValueError, match="non-empty"):
        personalized_pagerank(df, [])
    # headroom depends on |seeds|, not graph size: 2 seeds at base=1e18
    # overflows 2^63 and must raise BEFORE any job runs
    with pytest.raises(ValueError, match="overflows BIGINT"):
        personalized_pagerank(df, ["a", "b"], base=10**18)
