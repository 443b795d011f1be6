"""Deterministic negative sampling for KG-embedding training data.

TransE-family training (Bordes et al. NeurIPS 2013) needs corrupted
triples: for each true (subj, pred, obj), replace one side with a random
entity and FILTER out corruptions that happen to be true (the standard
"filtered" setting, Bordes 2013 §5).  A float-RNG sampler is neither
engine-reproducible nor resumable, so the draw here is the repo's
md5-uniform device end to end: the i-th corruption of a triple is the
pool entity at index ``md5int(seed:draw:s:p:o:i) mod |pool|``.

The pool: drawing uniformly from ALL entities needs a dense global
index — a one-reducer window at a billion entities, the exact
anti-pattern this repo avoids.  Instead the draw targets an md5-uniform
POOL of ``pool_size`` entities (the smallest md5 values — Spark plans
``ORDER BY hash LIMIT M`` as TakeOrderedAndProject: map-side partial
top-M, one M-row merge), which is then small enough to index with one
M-row window and broadcast into the draw join.  Shared negative pools
are standard at scale (PyTorch-BigGraph trains on batch-shared
negatives); uniformity over the pool is exact, and the pool itself is
an md5-uniform sample of the entity set.

Filtering is one anti join against the true triple set, so a drawn
entity that reconstructs a TRUE triple (including the original) drops —
per-triple negative count is therefore ≤ k, the documented filtered
semantics.  Everything replays in SQL (:func:`negative_samples_sql`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _md5long(col):
    return F.conv(F.substring(F.md5(col), 4, 13), 16, 10).cast("long")


def negative_samples(
    triples: DataFrame,
    k: int = 2,
    pool_size: int = 1024,
    seed: str = "neg",
    corrupt: str = "obj",
) -> DataFrame:
    """≤ ``k`` filtered corruptions per (subj, pred, obj) →
    (subj, pred, obj, neg_idx) where the ``corrupt`` column is replaced
    by the drawn pool entity; true triples never appear."""
    if corrupt not in ("subj", "obj"):
        raise ValueError("corrupt must be 'subj' or 'obj'")
    if k < 1 or pool_size < 1:
        raise ValueError("k and pool_size must be >= 1")
    ents = (
        triples.select(F.col("subj").alias("e"))
        .unionByName(triples.select(F.col("obj").alias("e")))
        .distinct()
    )
    pool = (
        ents.select(
            "e",
            _md5long(F.concat_ws(":", F.lit(seed), F.lit("pool"), F.col("e"))).alias("h"),
        )
        .orderBy("h", "e")
        .limit(pool_size)
    )
    pool = pool.select(
        (F.row_number().over(Window.orderBy("h", "e")) - 1).alias("idx"), "e"
    )
    n_pool = pool.groupBy().agg(F.count(F.lit(1)).alias("n_pool"))
    draws = (
        triples.select("subj", "pred", "obj")
        .distinct()
        .select(
            "*",
            F.explode(F.array([F.lit(i) for i in range(k)])).alias("neg_idx"),
        )
        .join(F.broadcast(n_pool))
        .select(
            "subj",
            "pred",
            "obj",
            "neg_idx",
            (
                _md5long(
                    F.concat_ws(
                        ":", F.lit(seed), F.lit("draw"),
                        F.col("subj"), F.col("pred"), F.col("obj"),
                        F.col("neg_idx"),
                    )
                )
                % F.col("n_pool")
            ).alias("idx"),
        )
        .join(F.broadcast(pool), "idx")
    )
    if corrupt == "obj":
        neg = draws.select("subj", "pred", F.col("e").alias("obj"), "neg_idx")
    else:
        neg = draws.select(F.col("e").alias("subj"), "pred", "obj", "neg_idx")
    return neg.join(
        triples.select("subj", "pred", "obj").distinct(),
        ["subj", "pred", "obj"],
        "left_anti",
    )


def negative_samples_sql(
    triples_sql: str,
    k: int = 2,
    pool_size: int = 1024,
    seed: str = "neg",
    corrupt: str = "obj",
) -> str:
    """DuckDB twin: identical md5 pool, identical draws, identical filter."""
    if corrupt not in ("subj", "obj"):
        raise ValueError("corrupt must be 'subj' or 'obj'")
    sq = seed.replace("'", "''")
    md5long = (
        "CAST('0x' || substring(md5({x}), 4, 13) AS BIGINT)"
    )
    pool_h = md5long.format(x=f"concat_ws(':', '{sq}', 'pool', e)")
    draw_h = md5long.format(
        x=f"concat_ws(':', '{sq}', 'draw', t.subj, t.pred, t.obj, i.neg_idx)"
    )
    out_subj = "p.e AS subj, d.pred, d.obj" if corrupt == "subj" else (
        "d.subj, d.pred, p.e AS obj"
    )
    return f"""
        WITH ns_triples AS (SELECT DISTINCT subj, pred, obj FROM ({triples_sql}) t0),
        ns_ents AS (
          SELECT subj AS e FROM ns_triples UNION SELECT obj FROM ns_triples
        ),
        ns_pool AS (
          SELECT e, row_number() OVER (ORDER BY h, e) - 1 AS idx
          FROM (SELECT e, {pool_h} AS h FROM ns_ents
                ORDER BY h, e LIMIT {int(pool_size)}) s
        ),
        ns_n AS (SELECT count(*) AS n_pool FROM ns_pool),
        ns_draws AS (
          SELECT t.subj, t.pred, t.obj, i.neg_idx,
                 ({draw_h}) % n.n_pool AS idx
          FROM ns_triples t
          CROSS JOIN (SELECT unnest(range(0, {int(k)})) AS neg_idx) i
          CROSS JOIN ns_n n
        )
        SELECT {out_subj}, d.neg_idx
        FROM ns_draws d JOIN ns_pool p ON p.idx = d.idx
        LEFT JOIN ns_triples x
          ON x.subj = {'p.e' if corrupt == 'subj' else 'd.subj'}
         AND x.pred = d.pred
         AND x.obj = {'d.obj' if corrupt == 'subj' else 'p.e'}
        WHERE x.subj IS NULL
    """
