"""Min-hop transitive closure: brute-force parity, cycle safety,
parallelism invariance, exhaustion guard."""

from __future__ import annotations

import pytest


def _brute_closure(edges):
    """Python BFS reference: {(src, dst): min_hops} over ordered pairs."""
    from collections import defaultdict, deque

    adj = defaultdict(list)
    nodes = set()
    for s, d in edges:
        if s != d:
            adj[s].append(d)
            nodes.update((s, d))
    out = {}
    for s in nodes:
        seen = {s: 0}
        q = deque([s])
        while q:
            u = q.popleft()
            for v in adj[u]:
                if v not in seen:
                    seen[v] = seen[u] + 1
                    q.append(v)
        for d, h in seen.items():
            if d != s:
                out[(s, d)] = h
    return out


EDGES = [
    # a 6-deep chain (forces 4 doubling rounds: diameters 1,2,4,8)
    ("c0", "c1"), ("c1", "c2"), ("c2", "c3"), ("c3", "c4"), ("c4", "c5"),
    ("c5", "c6"),
    # a 3-cycle feeding the chain (cycle safety + cross-component reach)
    ("x", "y"), ("y", "z"), ("z", "x"), ("z", "c0"),
    # a branch + a duplicate edge + a self-loop (both must be ignored)
    ("c1", "b1"), ("c1", "b1"), ("b1", "b1"),
]


def test_matches_brute_force(spark):
    from military_entity_extraction_based_on_large_models_spark.operators.transclose import (
        transitive_closure,
    )

    df = spark.createDataFrame(EDGES, "src string, dst string")
    got = {
        (r["src"], r["dst"]): r["hops"]
        for r in transitive_closure(df).collect()
    }
    assert got == _brute_closure(EDGES)
    # the fixture genuinely exercises depth: a 7-hop pair exists
    assert max(got.values()) >= 7


def test_parallelism_invariant(spark):
    from military_entity_extraction_based_on_large_models_spark.operators.transclose import (
        transitive_closure,
    )

    df1 = spark.createDataFrame(EDGES, "src string, dst string").repartition(1)
    df13 = spark.createDataFrame(EDGES, "src string, dst string").repartition(13)
    rows = lambda d: sorted(map(tuple, transitive_closure(d).collect()))  # noqa: E731
    assert rows(df1) == rows(df13)


def test_exhaustion_raises(spark):
    from military_entity_extraction_based_on_large_models_spark.operators.transclose import (
        transitive_closure,
    )

    df = spark.createDataFrame(EDGES, "src string, dst string")
    # diameter 7 needs rounds covering 2^3; one round only covers 2 — the
    # digest is still moving, so the guard must raise, never return a
    # silent non-fixpoint
    with pytest.raises(RuntimeError, match="non-fixpoint"):
        transitive_closure(df, max_rounds=1)


def test_sql_twin_matches(spark):
    import duckdb

    from military_entity_extraction_based_on_large_models_spark.operators.transclose import (
        transitive_closure,
        transitive_closure_sql,
    )

    duck = duckdb.connect()

    df = spark.createDataFrame(EDGES, "src string, dst string")
    got = sorted(map(tuple, transitive_closure(df).collect()))
    vals = ", ".join(f"('{s}', '{d}')" for s, d in EDGES)
    sql = transitive_closure_sql(
        f"SELECT * FROM (VALUES {vals}) AS e(src, dst)", max_hops=16
    )
    want = sorted(map(tuple, duck.execute(sql).fetchall()))
    assert got == want


def test_round_join_plan_no_cartesian(spark):
    """Each doubling round is one equi self-join + one min-hops hash
    aggregate — never a cartesian/nested-loop plan.  Drives the SHIPPED
    round (`_double_round`, the exact code the loop runs), not a replica,
    so a join-key regression in the operator fails here."""
    from pyspark.sql import functions as F

    from military_entity_extraction_based_on_large_models_spark.operators.transclose import (
        _double_round,
    )

    df = spark.createDataFrame(EDGES, "src string, dst string")
    r = df.withColumn("hops", F.lit(1).cast("long"))
    plan = (
        _double_round(r)._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


class TestPathWitness:
    def _brute_fold(self, edges, rounds):
        """Python replay of the exact per-round min-struct fold."""
        e = sorted({(s, d) for s, d in edges if s != d})
        r = {(s, d): (1, f"{s}>{d}") for s, d in e}
        for _ in range(rounds - 1):
            cand = dict(r)
            for (s, d), (h, p) in r.items():
                for (m, to) in e:
                    if m == d and to != s:
                        c = (h + 1, f"{p}>{to}")
                        if (s, to) not in cand or c < cand[(s, to)]:
                            cand[(s, to)] = min(cand.get((s, to), c), c)
            if cand == r:
                break
            r = cand
        return {(s, d, h, p) for (s, d), (h, p) in r.items()}

    def test_matches_python_fold_and_true_hops(self, spark):
        from military_entity_extraction_based_on_large_models_spark.operators.transclose import (
            shortest_path_witness,
            transitive_closure,
        )

        df = spark.createDataFrame(EDGES, "src string, dst string")
        got = {
            (r["src"], r["dst"], r["hops"], r["path"])
            for r in shortest_path_witness(df, max_hops=10).collect()
        }
        assert got == self._brute_fold(EDGES, 10)
        # hops agree with the independent closure; every path is walkable
        tc = {
            (r["src"], r["dst"]): r["hops"]
            for r in transitive_closure(df).collect()
        }
        es = {(s, d) for s, d in EDGES}
        for s, d, h, p in got:
            assert tc[(s, d)] == h
            nodes = p.split(">")
            assert nodes[0] == s and nodes[-1] == d and len(nodes) == h + 1
            assert all((a, b) in es for a, b in zip(nodes, nodes[1:]))

    def test_parallelism_invariant(self, spark):
        from military_entity_extraction_based_on_large_models_spark.operators.transclose import (
            shortest_path_witness,
        )

        rows = lambda n: sorted(  # noqa: E731
            map(tuple, shortest_path_witness(
                spark.createDataFrame(EDGES, "src string, dst string")
                .repartition(n), max_hops=10
            ).collect())
        )
        assert rows(1) == rows(13)

    def test_sql_twin_matches(self, spark):
        import duckdb

        from military_entity_extraction_based_on_large_models_spark.operators.transclose import (
            shortest_path_witness,
            shortest_path_witness_sql,
        )

        df = spark.createDataFrame(EDGES, "src string, dst string")
        got = sorted(map(tuple, shortest_path_witness(df, max_hops=10).collect()))
        vals = ", ".join(f"('{s}', '{d}')" for s, d in EDGES)
        sql = shortest_path_witness_sql(
            f"SELECT * FROM (VALUES {vals}) AS e(src, dst)", max_hops=10
        )
        want = sorted(map(tuple, duckdb.connect().execute(sql).fetchall()))
        assert got == want


def test_harmonic_centrality_matches_bfs(spark):
    from military_entity_extraction_based_on_large_models_spark.operators.transclose import (
        harmonic_centrality,
    )

    df = spark.createDataFrame(EDGES, "src string, dst string")
    got = {
        r["node"]: (r["n_reaching"], r["harmonic_micro"])
        for r in harmonic_centrality(df).collect()
    }
    closure = _brute_closure(EDGES)
    want: dict = {}
    for (s, d), h in closure.items():
        n, m = want.get(d, (0, 0))
        want[d] = (n + 1, m + 1_000_000 // h)
    assert got == want


def test_boundary_diameter_exactly_power_of_two(spark):
    """An 8-edge chain has diameter 8 = 2^3: max_rounds=3 must RETURN the
    exact closure (the confirmation round gets its own allowance), not
    spuriously raise — the review-confirmed boundary bug."""
    from military_entity_extraction_based_on_large_models_spark.operators.transclose import (
        transitive_closure,
    )

    chain = [(f"v{i}", f"v{i + 1}") for i in range(8)]
    df = spark.createDataFrame(chain, "src string, dst string")
    got = {
        (r["src"], r["dst"]): r["hops"]
        for r in transitive_closure(df, max_rounds=3).collect()
    }
    assert got == _brute_closure(chain)


class TestSCC:
    def _brute_scc(self, edges):
        closure = _brute_closure(edges)
        nodes = {n for e in edges for n in e}
        out = {}
        for v in nodes:
            mutual = [
                u for u in nodes
                if u != v and (v, u) in closure and (u, v) in closure
            ]
            out[v] = min(mutual + [v])
        return out

    def test_matches_brute_force(self, spark):
        from military_entity_extraction_based_on_large_models_spark.operators.transclose import (
            strongly_connected_components,
        )

        df = spark.createDataFrame(EDGES, "src string, dst string")
        got = {
            r["node"]: r["scc"]
            for r in strongly_connected_components(df).collect()
        }
        assert got == self._brute_scc(EDGES)
        # the 3-cycle collapses to one SCC; chain nodes stay singletons
        assert got["x"] == got["y"] == got["z"] == "x"
        assert got["c0"] == "c0" and got["c6"] == "c6"

    def test_two_cycles_bridged_stay_separate(self, spark):
        """The case trim_to_cycle_core documents as its honest superset:
        a node BETWEEN two cycles survives the trim but is its own SCC,
        and the two cycles are distinct SCCs — the exact operator must
        separate all three."""
        from military_entity_extraction_based_on_large_models_spark.operators.transclose import (
            strongly_connected_components,
        )

        edges = [
            ("a1", "a2"), ("a2", "a1"),          # cycle A
            ("a2", "mid"), ("mid", "b1"),         # bridge through mid
            ("b1", "b2"), ("b2", "b1"),          # cycle B
        ]
        got = {
            r["node"]: r["scc"]
            for r in strongly_connected_components(
                spark.createDataFrame(edges, "src string, dst string")
            ).collect()
        }
        assert got == {
            "a1": "a1", "a2": "a1", "mid": "mid", "b1": "b1", "b2": "b1"
        }

    def test_sql_twin_matches(self, spark):
        import duckdb

        from military_entity_extraction_based_on_large_models_spark.operators.transclose import (
            strongly_connected_components,
            strongly_connected_components_sql,
        )

        df = spark.createDataFrame(EDGES, "src string, dst string")
        got = sorted(
            map(tuple, strongly_connected_components(df).collect())
        )
        vals = ", ".join(f"('{s}', '{d}')" for s, d in EDGES)
        sql = strongly_connected_components_sql(
            f"SELECT * FROM (VALUES {vals}) AS e(src, dst)", max_hops=16
        )
        want = sorted(map(tuple, duckdb.connect().execute(sql).fetchall()))
        assert got == want


class TestMinPlus:
    WEDGES = [
        # direct a→c costs 10; a→b→c costs 3+4=7 — the weighted route wins
        ("a", "c", 10), ("a", "b", 3), ("b", "c", 4),
        # cycle with positive weights (termination) + a parallel edge
        ("c", "a", 5), ("a", "b", 8),  # parallel a→b folds to min 3
        ("d", "a", 2),
    ]

    def _floyd(self, edges):
        nodes = sorted({n for s, d, _ in edges for n in (s, d)})
        inf = float("inf")
        dist = {(u, v): inf for u in nodes for v in nodes}
        for s, d, w in edges:
            dist[(s, d)] = min(dist[(s, d)], w)
        for k in nodes:
            for i in nodes:
                for j in nodes:
                    if dist[(i, k)] + dist[(k, j)] < dist[(i, j)]:
                        dist[(i, j)] = dist[(i, k)] + dist[(k, j)]
        return {
            (u, v): int(c) for (u, v), c in dist.items()
            if c < inf and u != v
        }

    def test_matches_floyd_warshall(self, spark):
        from military_entity_extraction_based_on_large_models_spark.operators.transclose import (
            min_plus_closure,
        )

        df = spark.createDataFrame(
            self.WEDGES, "src string, dst string, weight long"
        )
        got = {
            (r["src"], r["dst"]): r["cost"]
            for r in min_plus_closure(df).collect()
        }
        assert got == self._floyd(self.WEDGES)
        assert got[("a", "c")] == 7  # the 2-hop route beat the direct edge

    def test_rejects_non_positive_weights(self, spark):
        import pytest as _pytest

        from military_entity_extraction_based_on_large_models_spark.operators.transclose import (
            min_plus_closure,
        )

        df = spark.createDataFrame(
            [("a", "b", 0)], "src string, dst string, weight long"
        )
        with _pytest.raises(ValueError, match="positive"):
            min_plus_closure(df)

    def test_sql_twin_matches(self, spark):
        import duckdb

        from military_entity_extraction_based_on_large_models_spark.operators.transclose import (
            min_plus_closure,
            min_plus_closure_sql,
        )

        df = spark.createDataFrame(
            self.WEDGES, "src string, dst string, weight long"
        )
        got = sorted(map(tuple, min_plus_closure(df).collect()))
        vals = ", ".join(f"('{s}', '{d}', {w})" for s, d, w in self.WEDGES)
        sql = min_plus_closure_sql(
            f"SELECT * FROM (VALUES {vals}) AS e(src, dst, weight)",
            max_hops=8,
        )
        want = sorted(map(tuple, duckdb.connect().execute(sql).fetchall()))
        assert got == want
