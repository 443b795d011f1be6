"""Deterministic random walks — graph sampling for embedding / reasoning
data (DeepWalk, Perozzi et al. KDD 2014; node2vec's p=q=1 case).

A 100 TB KG pipeline samples walks to train graph embeddings and to
build path-shaped reasoning data; a float-RNG sampler is neither
reproducible across engines nor resumable.  This operator makes the
walk a PURE FUNCTION of (edges, seed): at step t, walk w standing on
node v moves to the neighbor u minimizing ``md5(seed:w:t:u)`` — an
md5-uniform choice (the weighted_sample / reflect_retry device), so the
walk set is bit-identical at any parallelism and replays exactly in SQL
(:func:`random_walks_sql`, chained CTEs — the pagerank/learn oracle
idiom).  Each occupied node's transition is independent per (walk,
step), so walks do not collapse onto shared trajectories after meeting.

Feed SYMMETRIZED edges (the pagerank contract): the node set is the
distinct sources and every reached ``dst`` is again a source, so walks
never dead-end and always have full length.

Scale shape: the frontier frame is (walk, node) — n_walks rows, NEVER
the edge list — and each step is ONE equi join frontier×edges keyed on
the current node plus ONE per-walk argmin aggregate (map-side partial
min; a walk sitting on a degree-d hub contributes d candidate rows,
reduced before the shuffle).  Lineage is cut with a lazy
localCheckpoint every ``checkpoint_every`` steps.  The argmin is
``min(md5_hex || ':' || u)`` with the node peeled off the fixed-width
prefix — portable to any engine, tie-free by construction (the hash is
keyed on u itself, so distinct candidates have distinct keys).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def random_walks(
    edges: DataFrame,
    length: int = 4,
    walks_per_node: int = 1,
    seed: str = "rw",
    checkpoint_every: int = 4,
) -> DataFrame:
    """``walks_per_node`` walks of ``length`` steps from every node →
    (walk, step, node), step 0 = the start node; n_walks·(length+1) rows."""
    if length < 1:
        raise ValueError("length must be >= 1")
    if walks_per_node < 1:
        raise ValueError("walks_per_node must be >= 1")
    reps = F.array([F.lit(str(r)) for r in range(walks_per_node)])
    cur = (
        edges.select("src").distinct()
        .select(F.col("src").alias("node"), F.explode(reps).alias("rep"))
        .select(
            F.concat_ws("#", F.col("node"), F.col("rep")).alias("walk"),
            "node",
        )
    )
    frames = [cur.select("walk", F.lit(0).alias("step"), "node")]
    for t in range(1, length + 1):
        key = F.concat(
            F.md5(
                F.concat_ws(
                    ":", F.lit(seed), F.col("walk"), F.lit(str(t)), F.col("dst")
                )
            ),
            F.lit(":"),
            F.col("dst"),
        )
        cur = (
            cur.join(edges, cur.node == edges.src)
            .select("walk", key.alias("k"))
            .groupBy("walk")
            .agg(F.min("k").alias("mk"))
            .select("walk", F.expr("substring(mk, 34)").alias("node"))
        )
        if checkpoint_every and t % checkpoint_every == 0 and t < length:
            cur = cur.localCheckpoint(eager=False)
        frames.append(cur.select("walk", F.lit(t).alias("step"), "node"))
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def random_walks_sql(
    edges_sql: str,
    length: int = 4,
    walks_per_node: int = 1,
    seed: str = "rw",
) -> str:
    """DuckDB twin: identical md5-argmin steps unrolled as chained CTEs."""
    if length < 1 or walks_per_node < 1:
        raise ValueError("length and walks_per_node must be >= 1")
    sq = seed.replace("'", "''")
    parts = [
        f"WITH rw_edges AS ({edges_sql})",
        f"""rw_w0 AS (
          SELECT concat(node, '#', rep) AS walk, node
          FROM (SELECT DISTINCT src AS node FROM rw_edges) n
          CROSS JOIN (SELECT unnest(range(0, {walks_per_node}))::VARCHAR
                      AS rep) r
        )""",
    ]
    for t in range(1, length + 1):
        parts.append(f"""rw_w{t} AS (
          SELECT walk, substring(mk, 34) AS node FROM (
            SELECT w.walk,
                   min(concat(md5(concat_ws(':', '{sq}', w.walk, '{t}',
                                            e.dst)), ':', e.dst)) AS mk
            FROM rw_w{t - 1} w JOIN rw_edges e ON e.src = w.node
            GROUP BY w.walk
          ) s
        )""")
    selects = [
        f"SELECT walk, {t} AS step, node FROM rw_w{t}"
        for t in range(0, length + 1)
    ]
    return ",\n".join(parts) + "\n" + "\nUNION ALL\n".join(selects)
