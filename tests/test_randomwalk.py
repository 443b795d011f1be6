"""Deterministic random walks: python replay, SQL-twin parity,
parallelism invariance, shape/contract guarantees."""

from __future__ import annotations

import hashlib
from collections import defaultdict

import duckdb
import pandas as pd
import pytest

from military_entity_extraction_based_on_large_models_spark.operators.randomwalk import (
    random_walks,
    random_walks_sql,
)


def _sym(pairs):
    out = []
    for a, b in pairs:
        out.append((a, b))
        out.append((b, a))
    return out


def _replay(edges, length, wpn=1, seed="rw"):
    adj = defaultdict(set)
    for s, d in edges:
        adj[s].add(d)
    out = set()
    for node in adj:
        for r in range(wpn):
            w = f"{node}#{r}"
            cur = node
            out.add((w, 0, cur))
            for t in range(1, length + 1):
                key = min(
                    hashlib.md5(f"{seed}:{w}:{t}:{u}".encode()).hexdigest()
                    + ":" + u
                    for u in adj[cur]
                )
                cur = key[33:]
                out.add((w, t, cur))
    return out


PAIRS = [("h", "a"), ("h", "b"), ("h", "c"), ("a", "b"), ("c", "d"), ("x", "y")]


def _collect(df):
    return {(r["walk"], r["step"], r["node"]) for r in df.collect()}


def test_matches_python_replay(spark):
    edges = _sym(PAIRS)
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = _collect(random_walks(df, length=4, walks_per_node=2))
    assert got == _replay(edges, 4, 2)
    # every node starts 2 walks of full length: 7 nodes * 2 walks * 5 rows
    assert len(got) == 7 * 2 * 5
    # walks never leave the (x, y) component or enter it
    xy = {n for w, t, n in got if w.startswith(("x#", "y#"))}
    assert xy <= {"x", "y"}


def test_walks_diverge_per_replica_and_step(spark):
    # the hash is keyed on (walk, step), so replicas from the same node
    # and revisits at different steps can choose different neighbors —
    # the corpus is not one frozen trajectory per node
    edges = _sym(PAIRS)
    df = spark.createDataFrame(edges, ["src", "dst"])
    rows = _collect(random_walks(df, length=6, walks_per_node=4))
    paths = defaultdict(list)
    for w, t, n in rows:
        paths[w].append((t, n))
    seqs = {
        w: tuple(n for _, n in sorted(p))
        for w, p in paths.items()
        if w.startswith("h#")
    }
    assert len(set(seqs.values())) > 1  # h's four walks are not identical


def test_sql_twin_bit_identical(spark):
    edges = _sym(PAIRS)
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = _collect(random_walks(df, length=3, walks_per_node=2, seed="s'x"))
    con = duckdb.connect()
    con.register("e_in", pd.DataFrame(edges, columns=["src", "dst"]))
    want = {
        tuple(r)
        for r in con.execute(
            random_walks_sql(
                "SELECT src, dst FROM e_in", length=3,
                walks_per_node=2, seed="s'x",
            )
        ).fetchall()
    }
    assert got == want


def test_parallelism_invariant(spark):
    pairs = [(f"n{i}", f"n{t}") for i in range(1, 120)
             for t in {i % 7, i % 11, i - 1} - {i}]
    edges = _sym(set(pairs))
    df = spark.createDataFrame(edges, ["src", "dst"])
    r1 = _collect(random_walks(df, length=5))
    r2 = _collect(random_walks(df.repartition(17), length=5))
    assert r1 == r2 == _replay(edges, 5)


def test_guards(spark):
    df = spark.createDataFrame([("a", "b"), ("b", "a")], ["src", "dst"])
    with pytest.raises(ValueError):
        random_walks(df, length=0)
    with pytest.raises(ValueError):
        random_walks(df, walks_per_node=0)
