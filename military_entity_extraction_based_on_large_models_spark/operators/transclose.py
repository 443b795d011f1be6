"""Min-hop transitive closure — unbounded reachability to the fixpoint.

The reference materializes a KG (main.py triple writer) but answers only
single-edge questions over it; the audit query a dependency / containment
graph actually needs is "EVERYTHING x transitively reaches, and how far" —
licence contamination through a dependency DAG, location containment
rollups, ontology subsumption.  ``graph_k_hop`` (driver row) answers the
BOUNDED form with k-1 chained joins; this operator runs to the true
fixpoint with **path doubling**: after round k the result holds every pair
whose shortest path is ≤ 2^k, so a diameter-d graph converges in
⌈log2 d⌉ + 1 rounds — O(log d) shuffles where frontier expansion pays
O(d).  At 100 TB that is the difference between 6 and 40 shuffle rounds on
a deep dependency chain.

Per round: one self-equi-join on the frontier key (AQE-planned, never a
cartesian) + one (src, dst) min-hops hash aggregate, the pair
localCheckpointed with plan-stat truncation (the canonicalize.py loop
discipline).  Convergence = unchanged (count, xor-of-xxhash64) multiset
digest — one tiny aggregate per round, no change-detection join; the
min-hops update is monotone (pairs only accumulate, hops only decrease)
so an unchanged digest IS the fixpoint.

Exactness of the doubling recurrence: if R_k holds exact min-hops for all
pairs at distance ≤ 2^k, any shortest path of length L ≤ 2^{k+1} splits
into two halves of length ≤ 2^k, both exact in R_k, so
min(R_k ∪ R_k∘R_k) is exact at distance ≤ 2^{k+1}.  Cycles are safe:
the pair set is finite and self-pairs are dropped, so the fixpoint
exists and the digest detects it.

Scale note: a closure is inherently O(reachable pairs) output — right for
DAG-ish dependency / containment / ontology graphs (output ≈ V·depth),
wrong for social graphs (output → V²).  Callers on dense graphs want
``graph_k_hop``'s bounded form or connected_components instead; the
``max_rounds`` guard raises rather than silently truncating.

SQL twin (``transitive_closure_sql``): recursive CTE frontier expansion
with a hop bound + min-hops aggregate.  Unlike the Spark form (whose
``max_rounds`` budget is logarithmic — 16 rounds cover diameter 65536),
the CTE walks one hop per recursion step, so its ``max_hops`` bound must
be ≥ the graph diameter itself (default 32 = exact for diameter ≤ 32).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.parallelism import truncate_plan_stats


def transitive_closure(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 16,
) -> DataFrame:
    """Edge list → (src, dst, hops): every reachable ordered pair with its
    shortest-path hop count.  Deterministic at any parallelism (the result
    is a set; min-hops is order-independent).

    ``max_rounds`` bounds the doubling loop: round k covers diameter 2^k
    and convergence needs ONE further identical round to confirm, so the
    loop runs up to ``max_rounds + 1`` times and the default 16 is exact
    for any graph of diameter ≤ 65536 (boundary-tested: diameter exactly
    2^k converges within budget k).  If the digest is still moving when
    the budget runs out the result would be a silent non-fixpoint — raise
    instead (the k_core exhaustion stance).
    """
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    return _fixpoint_loop(
        e.withColumn("hops", F.lit(1).cast("long")),
        _double_round,
        ["src", "dst", "hops"],
        max_rounds,
        "transitive_closure",
    )


def _fixpoint_loop(start, round_fn, digest_cols, max_rounds, name):
    """The shared doubling-loop discipline (transitive_closure and
    min_plus_closure — ONE home for the checkpoint/digest/confirm/raise
    pattern so a fix to any part applies to both): apply ``round_fn``
    with lazy localCheckpoint + plan-stat truncation until the
    (count, xor-of-xxhash64 over ``digest_cols``) multiset digest repeats
    — the fold is monotone, so a stable round IS the fixpoint.  Runs up
    to ``max_rounds + 1`` times (the confirmation round gets its own
    allowance — boundary-tested at diameter exactly 2^max_rounds) and
    RAISES on exhaustion rather than return a silent non-fixpoint."""
    r = truncate_plan_stats(start.localCheckpoint(eager=False))
    prev = None
    for _ in range(max_rounds + 1):
        r = truncate_plan_stats(round_fn(r).localCheckpoint(eager=False))
        digest = tuple(
            r.agg(
                F.count(F.lit(1)).alias("n"),
                F.coalesce(
                    F.bit_xor(F.xxhash64(*digest_cols)), F.lit(0)
                ).alias("h"),
            ).first()
        )
        if digest == prev:
            return r
        prev = digest
    raise RuntimeError(
        f"{name}: digest still changing after {max_rounds + 1} doubling "
        f"rounds (diameter > 2^{max_rounds}?) — result would be a "
        "non-fixpoint; raise max_rounds"
    )


def _double_round(r: DataFrame) -> DataFrame:
    """One path-doubling round: R ∪ (R ∘ R) folded to min hops per pair —
    a single equi self-join plus one hash aggregate (plan-gated in
    tests/test_transclose.py against THIS function, the shipped round)."""
    mid = (
        r.alias("a")
        .join(r.alias("b"), F.col("a.dst") == F.col("b.src"))
        .select(
            F.col("a.src").alias("src"),
            F.col("b.dst").alias("dst"),
            (F.col("a.hops") + F.col("b.hops")).alias("hops"),
        )
        .where(F.col("src") != F.col("dst"))
    )
    return (
        r.unionByName(mid)
        .groupBy("src", "dst")
        .agg(F.min("hops").alias("hops"))
    )


def transitive_closure_sql(edges_sql: str, max_hops: int = 32) -> str:
    """DuckDB twin: recursive-CTE min-hop reachability over ``edges_sql``
    (a query yielding columns src, dst).  Exact iff ``max_hops`` ≥ the
    graph diameter (UNION-dedup plus the bound terminates cyclic graphs)."""
    return f"""
        WITH RECURSIVE tc_edges AS (
            SELECT DISTINCT src, dst FROM ({edges_sql}) tc_in
            WHERE src IS NOT NULL AND dst IS NOT NULL AND src <> dst
        ), reach(src, dst, hops) AS (
            SELECT src, dst, 1 FROM tc_edges
            UNION
            SELECT r.src, e.dst, r.hops + 1
            FROM reach r JOIN tc_edges e ON r.dst = e.src
            WHERE r.src <> e.dst AND r.hops < {max_hops}
        )
        SELECT src, dst, CAST(min(hops) AS BIGINT) AS hops
        FROM reach GROUP BY src, dst
    """


def shortest_path_witness(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_hops: int = 8,
) -> DataFrame:
    """(src, dst, hops, path) — every reachable ordered pair with its
    min-hop count AND a concrete witness path ``"a>b>c"`` — the "explain
    HOW x reaches y" query (dependency chains, containment rollups,
    entity-relatedness explanations) that :func:`transitive_closure`'s
    bare hop count cannot answer.

    Recurrence: single-step frontier fold — round k keeps, per pair, the
    minimum ``struct(hops, path)`` over round k-1's kept rows plus their
    one-edge extensions.  The struct min makes the output DETERMINISTIC
    at any parallelism: hops is the true min-hop distance; the path is a
    canonical shortest path — the fixpoint of this specific fold.  (It is
    NOT guaranteed to be the globally lexicographically-least shortest
    path: the fold extends only KEPT prefixes, and the lex-least path's
    prefix need not be the kept one.  The SQL twin replays the identical
    fold, so cross-engine equality holds exactly.)

    Early exit on an unchanged digest is sound: the fold is monotone in
    the struct order (candidates only ever lose to the kept min), so a
    stable round is THE fixpoint and further rounds are identity — the
    result equals the SQL twin's full ``max_hops``-round unroll.

    Scale: one equi join + one min aggregate per round, O(diameter)
    rounds (paths must grow edge-by-edge — the doubling trick would
    concatenate PREFIX paths and change which canonical witness wins).
    Rows are bounded by reachable pairs; paths add O(diameter·id_len)
    bytes.  For hop counts alone at scale, prefer the log-round
    :func:`transitive_closure`.
    """
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    step = e.select(
        F.col("src").alias("_m"), F.col("dst").alias("_to")
    )
    r = truncate_plan_stats(
        e.select(
            "src", "dst", F.lit(1).cast("long").alias("hops"),
            F.concat_ws(">", "src", "dst").alias("path"),
        ).localCheckpoint(eager=False)
    )
    prev = None
    for _ in range(max_hops - 1):
        ext = (
            r.join(step, r["dst"] == step["_m"])
            .where(F.col("_to") != F.col("src"))
            .select(
                "src", F.col("_to").alias("dst"),
                (F.col("hops") + 1).alias("hops"),
                F.concat_ws(">", "path", "_to").alias("path"),
            )
        )
        folded = (
            r.unionByName(ext)
            .groupBy("src", "dst")
            .agg(F.min(F.struct("hops", "path")).alias("_best"))
            .select("src", "dst", F.col("_best.hops").alias("hops"),
                    F.col("_best.path").alias("path"))
        )
        r = truncate_plan_stats(folded.localCheckpoint(eager=False))
        digest = tuple(
            r.agg(
                F.count(F.lit(1)).alias("n"),
                F.coalesce(
                    F.bit_xor(F.xxhash64("src", "dst", "hops", "path")),
                    F.lit(0),
                ).alias("h"),
            ).first()
        )
        if digest == prev:
            break
        prev = digest
    return r


def shortest_path_witness_sql(edges_sql: str, max_hops: int = 8) -> str:
    """DuckDB twin: the IDENTICAL per-round min-struct fold unrolled as
    chained CTEs (a recursive CTE cannot re-aggregate per round), so the
    canonical witness path matches the Spark fold byte-for-byte."""
    parts = [
        f"""
        WITH spw_edges AS (
            SELECT DISTINCT src, dst FROM ({edges_sql}) spw_in
            WHERE src IS NOT NULL AND dst IS NOT NULL AND src <> dst
        ), r1 AS (
            SELECT src, dst, CAST(1 AS BIGINT) AS hops,
                   src || '>' || dst AS path
            FROM spw_edges
        )"""
    ]
    for k in range(2, max_hops + 1):
        parts.append(f"""
        , r{k} AS (
            SELECT src, dst,
                   CAST((min(struct_pack(h := hops, p := path))).h AS BIGINT) AS hops,
                   (min(struct_pack(h := hops, p := path))).p AS path
            FROM (
                SELECT src, dst, hops, path FROM r{k - 1}
                UNION ALL
                SELECT p.src, e.dst, p.hops + 1 AS hops,
                       p.path || '>' || e.dst AS path
                FROM r{k - 1} p JOIN spw_edges e ON p.dst = e.src
                WHERE e.dst <> p.src
            ) cand
            GROUP BY src, dst
        )""")
    parts.append(f"\n        SELECT src, dst, hops, path FROM r{max_hops}")
    return "".join(parts)


def harmonic_centrality(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 16,
) -> DataFrame:
    """(node, n_reaching, harmonic_micro) — harmonic centrality
    H(v) = Σ_{u reaches v} 1/d(u, v) in EXACT integer micro-units
    (contribution = 1000000 div hops, floor division — identical on both
    engines, so the score is deterministic and engine-reproducible,
    unlike a float sum whose order matters).  The closeness-family
    complement to PageRank: rewards being NEAR many nodes rather than
    being linked from important ones, and handles disconnected graphs
    without PageRank's teleport (unreachable pairs simply contribute 0).
    Derived from :func:`transitive_closure` — one extra hash aggregate on
    the closure, so the cost model and the O(reachable pairs) caveat are
    the closure's.
    """
    tc = transitive_closure(edges, src=src, dst=dst, max_rounds=max_rounds)
    return tc.groupBy(F.col("dst").alias("node")).agg(
        F.count(F.lit(1)).alias("n_reaching"),
        F.sum(F.expr("1000000 div hops")).alias("harmonic_micro"),
    )


def harmonic_centrality_sql(edges_sql: str, max_hops: int = 32) -> str:
    """DuckDB twin: the closure CTE + the identical integer rollup."""
    return f"""
        SELECT dst AS node,
               count(*) AS n_reaching,
               CAST(sum(1000000 // hops) AS BIGINT) AS harmonic_micro
        FROM ({transitive_closure_sql(edges_sql, max_hops)}) hc
        GROUP BY dst
    """


def strongly_connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 16,
) -> DataFrame:
    """(node, scc) — EXACT strongly connected components: scc = the
    lexicographically-min node mutually reachable with ``node`` (itself
    if none).  Upgrades ``kcore.trim_to_cycle_core``'s documented
    honest-SUPERSET screen (nodes between two cycles survive the trim) to
    the exact partition: u, v share an SCC iff u reaches v AND v reaches
    u, read directly off the transitive closure by joining it with its
    own transpose — one equi join + one min aggregate + a left join to
    self-label acyclic nodes.

    Scale: inherits the closure's cost model and its O(reachable pairs)
    caveat — right for dependency/containment graphs, wrong for social
    graphs (use the trim screen there; it is linear).  Deterministic at
    any parallelism (set semantics + min).
    """
    tc = transitive_closure(edges, src=src, dst=dst, max_rounds=max_rounds)
    fwd = tc.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    rev = tc.select(F.col("dst").alias("a"), F.col("src").alias("b"))
    mutual = fwd.intersect(rev)
    labels = mutual.groupBy(F.col("a").alias("node")).agg(
        F.min("b").alias("_m")
    )
    nodes = (
        edges.select(F.col(src).alias("node"))
        .unionByName(edges.select(F.col(dst).alias("node")))
        .where(F.col("node").isNotNull())
        .distinct()
    )
    return nodes.join(labels, "node", "left").select(
        "node",
        F.least(
            F.coalesce("_m", F.col("node")), F.col("node")
        ).alias("scc"),
    )


def strongly_connected_components_sql(edges_sql: str, max_hops: int = 32) -> str:
    """DuckDB twin: the closure CTE joined with its transpose + the same
    min/self-label fold.  ``edges_sql`` is hoisted into ONE base CTE shared
    by the closure and the node set (inlining it per use would re-run the
    edge derivation three times); the node set keeps self-loop-only nodes,
    matching the Spark side's raw-endpoint derivation."""
    return f"""
        WITH RECURSIVE scc_base AS ({edges_sql}),
        tc_edges AS (
            SELECT DISTINCT src, dst FROM scc_base
            WHERE src IS NOT NULL AND dst IS NOT NULL AND src <> dst
        ), reach(src, dst, hops) AS (
            SELECT src, dst, 1 FROM tc_edges
            UNION
            SELECT r.src, e.dst, r.hops + 1
            FROM reach r JOIN tc_edges e ON r.dst = e.src
            WHERE r.src <> e.dst AND r.hops < {max_hops}
        ), tc AS (
            SELECT DISTINCT src, dst FROM reach
        ), scc_nodes AS (
            -- DISTINCT-wrapped UNION ALL on purpose: inside a WITH
            -- RECURSIVE block DuckDB parses a CTE whose TOP level is
            -- UNION as a recursive-union and does NOT set-dedup it
            SELECT DISTINCT node FROM (
                SELECT src AS node FROM scc_base WHERE src IS NOT NULL
                UNION ALL
                SELECT dst AS node FROM scc_base WHERE dst IS NOT NULL
            ) nn
        ), mutual AS (
            SELECT f.src AS a, f.dst AS b
            FROM tc f JOIN tc r ON f.src = r.dst AND f.dst = r.src
        ), labels AS (
            SELECT a AS node, min(b) AS m FROM mutual GROUP BY a
        )
        SELECT n.node,
               CASE WHEN l.m IS NULL OR n.node < l.m THEN n.node ELSE l.m END
                 AS scc
        FROM scc_nodes n LEFT JOIN labels l ON n.node = l.node
    """


def min_plus_closure(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str = "weight",
    max_rounds: int = 16,
) -> DataFrame:
    """(src, dst, cost) — all-pairs CHEAPEST-path cost over positive
    integer edge weights: the tropical-semiring (min, +) generalization of
    :func:`transitive_closure` (which is this with all weights 1).  The
    weighted audit question: not "can A reach B" but "how cheaply" —
    friction-weighted dependency distance, toll-weighted containment.

    Same path-doubling recurrence in the (min, +) semiring: round k holds
    the exact min cost over paths of ≤ 2^k EDGES (a cheapest path's
    halves are cheapest for their endpoints), so with positive weights
    (cheapest paths are simple, ≤ |V|−1 edges) the loop converges in
    ⌈log2(|V|−1)⌉ + 1 confirmed rounds; the digest guard raises on budget
    exhaustion exactly as the unweighted form.  Parallel edges fold to
    their min weight up front.  Deterministic: min over a set.

    Weights must be positive and non-null (zero/negative cycles would
    make the fixpoint ill-defined; a NULL cost would propagate NULL sums
    silently) — enforced against the eagerly-checkpointed edge frame, so
    the guard's count reuses the materialization the loop needs anyway
    instead of re-running the upstream edge derivation.
    """
    e = (
        edges.select(
            F.col(src).alias("src"),
            F.col(dst).alias("dst"),
            F.col(weight).cast("long").alias("cost"),
        )
        .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .where(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        # _nulls is counted INSIDE the fold: a null weight hidden behind a
        # non-null parallel edge would otherwise vanish in min() and
        # escape the guard
        .agg(
            F.min("cost").alias("cost"),
            F.sum(F.col("cost").isNull().cast("int")).alias("_nulls"),
        )
        .localCheckpoint(eager=True)
    )
    bad = e.where(
        (F.col("_nulls") > 0) | F.col("cost").isNull() | (F.col("cost") <= 0)
    ).count()
    if bad:
        raise ValueError(
            f"min_plus_closure: {bad} edge(s) with null or non-positive "
            "weight — the (min, +) fixpoint needs strictly positive costs"
        )
    e = e.drop("_nulls")

    def _round(r):
        mid = (
            r.alias("a")
            .join(r.alias("b"), F.col("a.dst") == F.col("b.src"))
            .select(
                F.col("a.src").alias("src"),
                F.col("b.dst").alias("dst"),
                (F.col("a.cost") + F.col("b.cost")).alias("cost"),
            )
            .where(F.col("src") != F.col("dst"))
        )
        return (
            r.unionByName(mid)
            .groupBy("src", "dst")
            .agg(F.min("cost").alias("cost"))
        )

    return _fixpoint_loop(
        e, _round, ["src", "dst", "cost"], max_rounds, "min_plus_closure"
    )


def min_plus_closure_sql(edges_sql: str, max_hops: int = 32) -> str:
    """DuckDB twin: recursive-CTE cheapest-path over ``edges_sql``
    (columns src, dst, weight — positive integers).  Exact iff the
    cheapest paths use ≤ ``max_hops`` edges (positive weights keep them
    simple, so |V|−1 suffices)."""
    return f"""
        WITH RECURSIVE mp_edges AS (
            SELECT src, dst, CAST(min(weight) AS BIGINT) AS cost
            FROM ({edges_sql}) mp_in
            WHERE src IS NOT NULL AND dst IS NOT NULL AND src <> dst
            GROUP BY src, dst
        ), walk(src, dst, cost, hops) AS (
            SELECT src, dst, cost, 1 FROM mp_edges
            UNION
            SELECT w.src, e.dst, w.cost + e.cost, w.hops + 1
            FROM walk w JOIN mp_edges e ON w.dst = e.src
            WHERE w.src <> e.dst AND w.hops < {max_hops}
        )
        SELECT src, dst, CAST(min(cost) AS BIGINT) AS cost
        FROM walk GROUP BY src, dst
    """
